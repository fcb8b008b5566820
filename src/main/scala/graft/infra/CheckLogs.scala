package graft.infra


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

  /** Parse schema for a CheckLog line (reader side). `src_row`/
    * `dst_row` appear only when the check ran with
    * `[checker] output_full_row=true` (checker_engine.rs:115,620) —
    * from_json yields null for absent fields, so readers of plain
    * logs are unaffected.
    */
  val logSchema: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("tb", StringType),
    StructField("id_col_values", MapType(StringType, StringType)),
    StructField("diff_col_values", MapType(StringType,
      StructType(Seq(StructField("src", StringType),
        StructField("dst", StringType))))),
    StructField("src_row", MapType(StringType, StringType)),
    StructField("dst_row", MapType(StringType, StringType))))

  /** `check_log_file_size` values ("100mb", "512kb", "1gb", bytes). */
  def parseSize(s: String): Long = {
    val t = s.trim.toLowerCase
    val digits = t.takeWhile(_.isDigit)
    require(digits.nonEmpty, s"bad size: $s")
    val n = digits.toLong
    t.drop(digits.length).trim match {
      case "" | "b" => n
      case "kb" | "k" => n * 1024L
      case "mb" | "m" => n * 1024L * 1024L
      case "gb" | "g" => n * 1024L * 1024L * 1024L
      case other => sys.error(s"bad size unit: $other")
    }
  }

  /** Render [[Checker.diff]] output rows as CheckLog JSON lines.
    * `diff_col_values` holds only the differing columns (key-sorted, as
    * the reference's ordered_map serializer guarantees) and is omitted
    * entirely for MISS rows — `to_json` drops null fields, matching
    * serde's `skip_serializing_if`.
    */
  def logLine(schemaName: String, tb: String, keys: Seq[String],
      compareCols: Seq[String], outputFullRow: Boolean = false)
      : Column = {
    val idMap = map(keys.sorted.flatMap(k =>
      Seq(lit(k), col(k).cast(StringType))): _*)
    val diffEntries = map_from_entries(array_compact(array(
      compareCols.sorted.map { c =>
        when(array_contains(col(Checker.DiffColsCol), c),
          struct(lit(c).as("key"),
            struct(col(s"src_$c").cast(StringType).as("src"),
              col(s"dst_$c").cast(StringType).as("dst")).as("value")))
      }: _*)))
    // [checker] output_full_row: the full src image rides every log
    // line, the full dst image rides DIFF lines — both absent (and
    // dropped by to_json) in the default mode
    val nullMap = lit(null).cast(MapType(StringType, StringType))
    def fullMap(side: String): Column =
      map((keys.sorted.flatMap(k =>
        Seq(lit(k), col(k).cast(StringType))) ++
        compareCols.sorted.flatMap(c =>
          Seq(lit(c), col(s"${side}_$c").cast(StringType)))): _*)
    to_json(struct(
      lit(schemaName).as("schema"), lit(tb).as("tb"),
      idMap.as("id_col_values"),
      when(col(Checker.StatusCol) === "DIFF", diffEntries)
        .as("diff_col_values"),
      (if (outputFullRow) fullMap("src") else nullMap).as("src_row"),
      (if (outputFullRow)
        when(col(Checker.StatusCol) === "DIFF", fullMap("dst"))
      else nullMap).as("dst_row")))
  }

  /** MISS/DIFF rows of a check result as (status, line). ORPHAN rows are
    * a review artifact, not a check log — the reference logs only miss
    * and diff streams.
    */
  def toLogs(checked: DataFrame, schemaName: String, tb: String,
      keys: Seq[String], compareCols: Seq[String],
      outputFullRow: Boolean = false): DataFrame =
    checked.filter(col(Checker.StatusCol).isin("MISS", "DIFF"))
      .select(col(Checker.StatusCol).as("status"),
        logLine(schemaName, tb, keys, compareCols, outputFullRow)
          .as("line"))

  private def writeLines(df: DataFrame, target: String): String = {
    // Hadoop FS throughout: check_log_dir is a TASK path (s3a/hdfs on
    // a real deployment), and the driver-side part-file move below
    // must work on the same scheme Spark just wrote to.
    val hfs = Fs.fs(target)
    val targetP = new org.apache.hadoop.fs.Path(target)
    val tmp = s"${targetP.getParent}/.${targetP.getName}.tmp"
    df.coalesce(1).write.mode("overwrite").text(tmp)
    val part = hfs.listStatus(new org.apache.hadoop.fs.Path(tmp))
      .map(_.getPath).find(_.getName.startsWith("part-"))
    part match {
      case Some(p) =>
        hfs.delete(targetP, false)
        if (!hfs.rename(p, targetP)) throw new java.io.IOException(
          s"check log: rename $p -> $target failed")
      case None => // empty partition set: an empty artifact
        Fs.write(target, Array.emptyByteArray)
    }
    hfs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    target
  }

  /** Rotate an artifact file that exceeds the row/byte caps into
    * `name.log, name.1.log, name.2.log …` ([checker]
    * check_log_max_rows / check_log_file_size — the reference's
    * rotating check-log writer). Driver-side over the already-written
    * single file: artifacts are bounded by the defect count (the same
    * argument as the coalesce(1) above).
    */
  private def rotate(target: String, maxRows: Int, maxBytes: Long)
      : Unit = {
    if (!Fs.exists(target)) return
    if (Fs.size(target) <= maxBytes) {
      val quick = Fs.readLines(target).count(_.nonEmpty)
      if (quick <= maxRows) return
    }
    val lines = Fs.readLines(target).filter(_.nonEmpty)
    val base = Fs.fileName(target).stripSuffix(".log")
    val chunks = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    val cur = scala.collection.mutable.ArrayBuffer[String]()
    var bytes = 0L
    lines.foreach { l =>
      if (cur.size >= maxRows ||
        (cur.nonEmpty && bytes + l.length + 1 > maxBytes)) {
        chunks += cur.toSeq; cur.clear(); bytes = 0L
      }
      cur += l; bytes += l.length + 1
    }
    if (cur.nonEmpty) chunks += cur.toSeq
    chunks.zipWithIndex.foreach { case (c, i) =>
      val name = if (i == 0) s"$base.log" else s"$base.$i.log"
      Fs.writeString(
        s"${new org.apache.hadoop.fs.Path(target).getParent}/$name",
        c.mkString("", "\n", "\n"))
    }
  }

  /** Write miss.log + diff.log artifacts under `dir` (the check task's
    * log sink), rotated when the [checker] caps are exceeded.
    * Single-file artifacts match the reference's layout; the coalesce
    * is bounded by the mismatch count.
    */
  def write(logs: DataFrame, dir: String,
      maxRows: Int = Int.MaxValue,
      maxBytes: Long = Long.MaxValue): (String, String) = {
    Fs.mkdirs(dir)
    val miss = writeLines(
      logs.filter(col("status") === "MISS").select("line"),
      s"$dir/miss.log")
    val diff = writeLines(
      logs.filter(col("status") === "DIFF").select("line"),
      s"$dir/diff.log")
    if (maxRows != Int.MaxValue || maxBytes != Long.MaxValue) {
      rotate(miss, maxRows, maxBytes)
      rotate(diff, maxRows, maxBytes)
    }
    (miss, diff)
  }

  /** `[checker] output_revise_sql=true`: persist the synthesized
    * revise statements alongside the logs (checker_engine.rs:31-73
    * writes a revise-sql stream when enabled). Placeholder mode — the
    * same shapes a prepared-statement applier executes. `revise.sql`
    * deliberately fails the `{miss,diff}*.log` replay glob: it is an
    * operator-facing artifact, not a replayable log.
    */
  def writeReviseSql(checked: DataFrame, table: String,
      keys: Seq[String], dir: String): String = {
    Fs.mkdirs(dir)
    val lines = checked
      .filter(col(Checker.StatusCol).isin("MISS", "DIFF", "ORPHAN"))
      .select(Checker.reviseSqlPlaceholder(table, keys,
        col(Checker.DiffColsCol), col(Checker.StatusCol)).as("line"))
    val target = s"$dir/revise.sql"
    writeLines(lines, target)
    target
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
  def writeSummary(summaries: DataFrame, dir: String): String = {
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
    Fs.mkdirs(dir)
    val target = s"$dir/summary.log"
    Fs.writeString(target, (head +: rows.toSeq).mkString("\n"))
    target
  }
}
