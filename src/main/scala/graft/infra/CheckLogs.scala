package graft.infra

import java.nio.file.{Files, Path, Paths, StandardCopyOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.operators.Checker

/** Check-log artifacts and the re-check/revise replay loop — the
  * reference's persistence layer between a check task and the revise
  * task that consumes it:
  *
  *  - `CheckLog` JSON-line shape
  *    (`/root/reference/dt-connector/src/checker/check_log.rs:8-37`):
  *    `{schema, tb, id_col_values, diff_col_values}` with maps
  *    key-sorted; an empty/absent `diff_col_values` means MISS, a
  *    populated one maps column → `{src, dst}` string images.
  *  - miss.log / diff.log / summary.log artifacts (`base_checker.rs`
  *    log sinks; summary shape `check_log.rs:50-90`).
  *  - the log reader walking a directory's files in name order
  *    (`checker/log_reader.rs:1-64`).
  *  - the re-check/revise extractor that replays logged ids against the
  *    live source and emits revise rows — MISS→insert, DIFF→update
  *    (`extractor/mysql/mysql_check_extractor.rs:58-92`,
  *    `replay_diff_as_update`).
  *
  * Spark-first: log lines are built/parsed with `to_json`/`from_json`
  * (codegen'd, no UDF), the replay is an ordinary broadcast-able join of
  * parsed ids against the source scan, and only the final artifact
  * rename is driver-side (the log payload itself is written by
  * executors; mismatch artifacts are bounded by the defect count, not
  * the data size).
  */
object CheckLogs {

  /** Parse schema for a CheckLog line (reader side). */
  val logSchema: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("tb", StringType),
    StructField("id_col_values", MapType(StringType, StringType)),
    StructField("diff_col_values", MapType(StringType,
      StructType(Seq(StructField("src", StringType),
        StructField("dst", StringType)))))))

  /** Render [[Checker.diff]] output rows as CheckLog JSON lines.
    * `diff_col_values` holds only the differing columns (key-sorted, as
    * the reference's ordered_map serializer guarantees) and is omitted
    * entirely for MISS rows — `to_json` drops null fields, matching
    * serde's `skip_serializing_if`.
    */
  def logLine(schemaName: String, tb: String, keys: Seq[String],
      compareCols: Seq[String]): Column = {
    val idMap = map(keys.sorted.flatMap(k =>
      Seq(lit(k), col(k).cast(StringType))): _*)
    val diffEntries = map_from_entries(array_compact(array(
      compareCols.sorted.map { c =>
        when(array_contains(col(Checker.DiffColsCol), c),
          struct(lit(c).as("key"),
            struct(col(s"src_$c").cast(StringType).as("src"),
              col(s"dst_$c").cast(StringType).as("dst")).as("value")))
      }: _*)))
    to_json(struct(
      lit(schemaName).as("schema"), lit(tb).as("tb"),
      idMap.as("id_col_values"),
      when(col(Checker.StatusCol) === "DIFF", diffEntries)
        .as("diff_col_values")))
  }

  /** MISS/DIFF rows of a check result as (status, line). ORPHAN rows are
    * a review artifact, not a check log — the reference logs only miss
    * and diff streams.
    */
  def toLogs(checked: DataFrame, schemaName: String, tb: String,
      keys: Seq[String], compareCols: Seq[String]): DataFrame =
    checked.filter(col(Checker.StatusCol).isin("MISS", "DIFF"))
      .select(col(Checker.StatusCol).as("status"),
        logLine(schemaName, tb, keys, compareCols).as("line"))

  private def writeLines(df: DataFrame, target: Path): Path = {
    val tmp = target.getParent.resolve(s".${target.getFileName}.tmp")
    df.coalesce(1).write.mode("overwrite").text(tmp.toString)
    val part = Files.list(tmp).iterator().asScala
      .find(_.getFileName.toString.startsWith("part-"))
    part match {
      case Some(p) =>
        Files.move(p, target, StandardCopyOption.REPLACE_EXISTING)
      case None => // empty partition set: an empty artifact
        Files.deleteIfExists(target)
        Files.createFile(target)
    }
    scala.util.Using.resource(Files.walk(tmp)) { s =>
      s.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(Files.delete)
    }
    target
  }

  /** Write miss.log + diff.log artifacts under `dir` (the check task's
    * log sink). Single-file artifacts match the reference's layout; the
    * coalesce is bounded by the mismatch count.
    */
  def write(logs: DataFrame, dir: String): (Path, Path) = {
    val root = Paths.get(dir)
    Files.createDirectories(root)
    (writeLines(logs.filter(col("status") === "MISS").select("line"),
        root.resolve("miss.log")),
      writeLines(logs.filter(col("status") === "DIFF").select("line"),
        root.resolve("diff.log")))
  }

  /** Read a check-log directory back (the revise task's source): every
    * miss/diff log line parsed against [[logSchema]] — summary.log lives
    * in the same directory but is a report, not a replayable log, so the
    * glob excludes it. File-name order is irrelevant to the replay join,
    * so the directory listing can stream in any order — the reference
    * reader's name sort (`log_reader.rs:52-62`) only mattered for its
    * serial cursor.
    */
  def read(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("pathGlobFilter", "{miss,diff}*.log")
      .textFile(dir).toDF("line").select(
      from_json(col("line"), logSchema).as("log"))
      .select(col("log.schema").as("schema"), col("log.tb").as("tb"),
        col("log.id_col_values").as("id_col_values"),
        col("log.diff_col_values").as("diff_col_values"))

  /** Replay parsed logs into revise statements (placeholder mode):
    * MISS → INSERT, DIFF → UPDATE over exactly the logged diff columns
    * (`replay_diff_as_update`, mysql_check_extractor.rs:79-92). Pure
    * per-row expression over the parsed lines; the caller joins the
    * result (or the logged ids) back to the live source scan for the
    * re-select images.
    */
  def reviseFromLogs(logs: DataFrame, table: String, keys: Seq[String])
      : DataFrame = {
    val isMiss = col("diff_col_values").isNull
    val id = (k: String) => element_at(col("id_col_values"), k)
    val keyPred = concat_ws(" AND ",
      keys.map(k => concat(lit(s"$k="), id(k))): _*)
    logs.select(
      col("schema"), col("tb"), col("id_col_values"),
      when(isMiss, "insert").otherwise("update").as("op"),
      when(isMiss, lit(s"INSERT INTO $table VALUES (?)"))
        .otherwise(concat(lit(s"UPDATE $table SET "),
          concat_ws(", ", transform(map_keys(col("diff_col_values")),
            c => concat(c, lit("=?")))),
          lit(" WHERE "), keyPred)).as("sql"),
      col("diff_col_values"))
  }

  /** Per-table check summary (shape `CheckTableSummaryLog`,
    * check_log.rs:72-90): one aggregation over the full check result.
    */
  def tableSummary(checked: DataFrame, schemaName: String, tb: String)
      : DataFrame =
    checked.agg(
      count(lit(1)).as("checked_count"),
      count(when(col(Checker.StatusCol) === "MISS", 1)).as("miss_count"),
      count(when(col(Checker.StatusCol) === "DIFF", 1)).as("diff_count"),
      count(when(col(Checker.StatusCol) === "ORPHAN", 1))
        .as("orphan_count"))
    .select(lit(schemaName).as("schema"), lit(tb).as("tb"),
      col("checked_count"), col("miss_count"), col("diff_count"),
      col("orphan_count"),
      (col("miss_count") + col("diff_count") + col("orphan_count") === 0)
        .as("is_consistent"))

  /** Write summary.log (one JSON line per table + a task-level line,
    * shape `CheckSummaryLog`) — tiny by construction (one row per
    * table), so the driver-side collect is bounded.
    */
  def writeSummary(summaries: DataFrame, dir: String): Path = {
    val rows = summaries.select(to_json(struct(summaries.columns
      .map(col): _*)).as("j")).collect().map(_.getString(0))
    val total = summaries.agg(
      sum("checked_count").as("checked_count"),
      sum("miss_count").as("miss_count"),
      sum("diff_count").as("diff_count"),
      min(col("is_consistent").cast("int")).as("c")).collect()(0)
    val head =
      s"""{"is_consistent":${total.getAs[Int]("c") == 1},""" +
        s""""checked_count":${total.getAs[Long]("checked_count")},""" +
        s""""miss_count":${total.getAs[Long]("miss_count")},""" +
        s""""diff_count":${total.getAs[Long]("diff_count")}}"""
    val root = Paths.get(dir)
    Files.createDirectories(root)
    val target = root.resolve("summary.log")
    Files.write(target, (head +: rows.toSeq).mkString("\n").getBytes(
      java.nio.charset.StandardCharsets.UTF_8))
    target
  }
}
