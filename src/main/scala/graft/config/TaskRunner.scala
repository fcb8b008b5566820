package graft.config

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.infra.Precheck
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

  /** Snapshot task: for every table the filter admits, read, apply the
    * column map, write to the routed destination.
    */
  def runSnapshot(spark: SparkSession, task: TaskConfig.Task)
      : Seq[TableResult] = {
    val tables = task.filter.expand(catalog(task.sourceDir))
    tables.map { case (schema, tb) =>
      val df = Tables.load(spark, task.sourceDir, tb)
      val routed = task.router.renameColumns(schema, tb, df)
      val (toSchema, toTb) = task.router.routeTable(schema, tb)
      val out = s"${task.sinkDir}/$toSchema.$toTb"
      routed.write.mode(SaveMode.Overwrite).parquet(out)
      TableResult(schema, tb, routed.count(), s"$toSchema.$toTb")
    }
  }

  /** Check task: per admitted table, compare source against the routed
    * sink output (the post-snapshot verification flow).
    */
  def runCheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[(String, Map[String, Long])] = {
    val tables = task.filter.expand(catalog(task.sourceDir))
    tables.flatMap { case (schema, tb) =>
      task.keysByTable.get(tb).map { keys =>
        val src = task.router.renameColumns(schema, tb,
          Tables.load(spark, task.sourceDir, tb))
        val (toSchema, toTb) = task.router.routeTable(schema, tb)
        val dst = spark.read.parquet(s"${task.sinkDir}/$toSchema.$toTb")
        val d = Checker.diff(src, dst, keys)
        val counts = d.groupBy(Checker.StatusCol).count()
          .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
        tb -> counts
      }
    }
  }

  /** Pre-flight the task (reference dt-precheck before start_task). */
  def precheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[Precheck.CheckResult] = {
    val tables = task.filter.expand(catalog(task.sourceDir)).map(_._2)
    Precheck.runAll(spark, task.sourceDir, tables, task.keysByTable)
  }
}
