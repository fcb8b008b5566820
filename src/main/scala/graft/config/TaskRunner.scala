package graft.config

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.infra.{CheckLogs, Precheck}
import graft.operators.{Checker, Compaction}

/** Config → running task — the reference's TaskRunner
  * (/root/reference/dt-task/src/task_runner.rs:153-263): expand the
  * filter against the catalog, wire extractor → route → sink per table,
  * report per-table progress. Here the catalog is the parquet fixture
  * directory and the sink is a parquet directory (the applier/stream-load
  * paths are exercised by their own modules); the wiring, filtering,
  * routing, and check semantics are the product.
  */
object TaskRunner {

  final case class TableResult(schema: String, tb: String, rows: Long,
      dstTable: String)

  private def catalog(dir: String): Seq[(String, String)] =
    Tables.names.map(t => ("app", t))

  /** The tables a task's filter admits — the task's unit list. */
  def units(task: TaskConfig.Task): Seq[(String, String)] =
    task.filter.expand(catalog(task.sourceDir))

  /** One snapshot unit: read a table, apply where_conditions and
    * ignore_cols (the filter's `json:` configs — both reach the scan:
    * the WHERE becomes a pushed filter, the drop prunes the parquet
    * read schema), then the column map, then write to the routed
    * destination.
    */
  def snapshotTable(spark: SparkSession, task: TaskConfig.Task,
      schema: String, tb: String): TableResult = {
    val loaded = Tables.load(spark, task.sourceDir, tb)
    val conditioned = task.whereByTable.get((schema, tb))
      .map(c => loaded.filter(expr(c))).getOrElse(loaded)
    val df = task.ignoreColsByTable.get((schema, tb))
      .map(cols => conditioned.drop(cols: _*)).getOrElse(conditioned)
    val routed = task.router.renameColumns(schema, tb, df)
    val (toSchema, toTb) = task.router.routeTable(schema, tb)
    val out = s"${task.sinkDir}/$toSchema.$toTb"
    routed.write.mode(SaveMode.Overwrite).parquet(out)
    // count the WRITTEN output, not the source again — a parquet
    // count() is satisfied from row-group metadata, while re-counting
    // `routed` would re-run the full source scan per table
    TableResult(schema, tb, spark.read.parquet(out).count(),
      s"$toSchema.$toTb")
  }

  /** Snapshot task: every admitted table through [[snapshotTable]]. */
  def runSnapshot(spark: SparkSession, task: TaskConfig.Task)
      : Seq[TableResult] =
    units(task).map { case (schema, tb) =>
      snapshotTable(spark, task, schema, tb)
    }

  /** Curation task: the training-data extension run from the SAME
    * task-config surface as replication — `extract_type=curation` runs
    * [[graft.operators.CurationPipeline]] over the source corpus and
    * materializes verdicts + report under the sink dir. Returns the
    * per-reason counts for the progress report.
    */
  def runCuration(spark: SparkSession, task: TaskConfig.Task)
      : graft.operators.CurationPipeline.Summary =
    graft.operators.CurationPipeline.run(spark, task.sourceDir,
      task.sinkDir)

  /** Loader-layout task result: corpus size, the layouts written. */
  final case class LoaderSummary(nDocs: Long, nShards: Int,
      nWindows: Long, totalTokens: Long)

  /** Loader task (`extract_type=loader`): materialize the
    * training-loader layout for a corpus — the q115 shard-shuffle
    * manifest under `<sink>/shards` and the q111 packing-window
    * manifest under `<sink>/pack_windows`. Run it over a curation
    * task's kept output (or a raw corpus dir) to make it loader-ready
    * from the same INI surface as everything else.
    */
  def runLoader(spark: SparkSession, task: TaskConfig.Task)
      : LoaderSummary = {
    val docs = Tables.documents(spark, task.sourceDir)
    graft.operators.LoaderOps
      .shardShuffleOf(spark, docs, task.loaderShards)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/shards")
    graft.operators.PackingOps
      .packWindowsOf(spark, docs, task.loaderWindow)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/pack_windows")
    // summarize from the WRITTEN manifest (row-group metadata reads)
    val m = spark.read.parquet(s"${task.sinkDir}/pack_windows")
    val row = m.agg(count(lit(1)).as("n"),
      (max(col("last_win")) + 1).as("w"),
      sum(col("n_tokens")).as("t")).collect()(0)
    LoaderSummary(row.getLong(0), task.loaderShards,
      row.getLong(1), row.getLong(2))
  }

  /** Check task: per admitted table, compare source against the routed
    * sink output (the post-snapshot verification flow) and persist the
    * check-log artifacts (miss.log/diff.log/summary.log under
    * `<sinkDir>/checklog/<schema>.<tb>/`) that the revise task replays.
    *
    * One full-join pass per table: the non-OK subset (bounded by the
    * defect count, not the data size) is cached, artifacts and defect
    * counts both read it, and the OK count is derived as
    * `src_rows - miss - diff` instead of re-scanning the join.
    */
  def runCheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[(String, Map[String, Long])] =
    units(task).flatMap { case (schema, tb) =>
      checkTable(spark, task, schema, tb)
    }

  /** One check unit (None when the table has no key spec). */
  def checkTable(spark: SparkSession, task: TaskConfig.Task,
      schema: String, tb: String): Option[(String, Map[String, Long])] =
    task.keysByTable.get(tb).map { keys =>
        val src = task.router.renameColumns(schema, tb,
          Tables.load(spark, task.sourceDir, tb))
        val (toSchema, toTb) = task.router.routeTable(schema, tb)
        val dst = spark.read.parquet(s"${task.sinkDir}/$toSchema.$toTb")
        val compareCols = src.columns.filter(dst.columns.contains)
          .filterNot(keys.contains).toSeq
        val nonOk = Checker.diff(src, dst, keys)
          .filter(col(Checker.StatusCol) =!= "OK").persist()
        try {
          val logDir = s"${task.sinkDir}/checklog/$toSchema.$toTb"
          CheckLogs.write(
            CheckLogs.toLogs(nonOk, schema, tb, keys, compareCols),
            logDir)
          val defects = nonOk.groupBy(Checker.StatusCol).count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val miss = defects.getOrElse("MISS", 0L)
          val diff = defects.getOrElse("DIFF", 0L)
          val orphan = defects.getOrElse("ORPHAN", 0L)
          val srcRows = src.count()
          val summary = spark.createDataFrame(Seq(
            (schema, tb, srcRows + orphan, miss, diff, orphan,
              miss + diff + orphan == 0)))
            .toDF("schema", "tb", "checked_count", "miss_count",
              "diff_count", "orphan_count", "is_consistent")
          CheckLogs.writeSummary(summary, logDir)
          tb -> (defects + ("OK" -> (srcRows - miss - diff)))
        } finally { nonOk.unpersist(); () }
      }

  /** Pre-flight the task (reference dt-precheck before start_task). */
  def precheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[Precheck.CheckResult] = {
    val tables = task.filter.expand(catalog(task.sourceDir)).map(_._2)
    Precheck.runAll(spark, task.sourceDir, tables, task.keysByTable)
  }
}
