package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.sinks.StreamLoadSink
import graft.sources.SnapshotChunker

/** Infrastructure operators exposed as oracle-checked queries: the
  * density-aware chunk splitter and the stream-load sign/version
  * annotation.
  */
object InfraQueries {

  /** q50 — chunk assignment stats: plan chunks over lineitem.l_orderkey
    * with the reference's density-aware stride, then count rows per chunk.
    * The stats aggregate runs once driver-side (exactly the reference's
    * MIN/MAX/COUNT round-trip) and the assignment itself is pure
    * arithmetic.
    */
  def chunkStats(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    val st = SnapshotChunker.stats(li, "l_orderkey")
    val plan = SnapshotChunker.plan(st)
    li.withColumn("chunk_id",
        expr(s"CAST((l_orderkey - ${plan.lower}) DIV ${plan.step} AS BIGINT)"))
      .groupBy(col("chunk_id"))
      .agg(count(lit(1)).as("n_rows"),
        min(col("l_orderkey")).as("min_key"),
        max(col("l_orderkey")).as("max_key"))
  }

  val chunkStatsSql: String =
    """WITH s AS (SELECT count(*) AS c, min(l_orderkey) AS mn,
      |    max(l_orderkey) AS mx FROM lineitem),
      |p AS (SELECT mn, CAST(greatest(1, ceil(10000 * least(1000.0,
      |    greatest(0.05, CAST(mx - mn + 1 AS DOUBLE) / c)))) AS BIGINT)
      |    AS step FROM s)
      |SELECT (l_orderkey - mn) // step AS chunk_id, count(*) AS n_rows,
      |  min(l_orderkey) AS min_key, max(l_orderkey) AS max_key
      |FROM lineitem, p GROUP BY 1""".stripMargin

  /** q51 — stream-load annotation: soft-delete sign + version columns on
    * the change stream (StarRocks/Doris/ClickHouse sink contract).
    */
  def streamLoadRows(spark: SparkSession, dir: String): DataFrame =
    StreamLoadSink.withSignColumns(
        Cdc.changes(spark, dir), col("row_type"), col("event_id"))
      .select(col("event_id"), col("user_id"), col("row_type"),
        col(StreamLoadSink.IsDeletedCol).as("is_deleted"),
        col(StreamLoadSink.VersionCol).as("version"))

  val streamLoadRowsSql: String =
    """SELECT event_id, user_id,
      |  CASE WHEN event_type = 'signup' THEN 'insert'
      |       WHEN event_type = 'error' THEN 'delete'
      |       ELSE 'update' END AS row_type,
      |  CASE WHEN event_type = 'error' THEN 1 ELSE 0 END AS is_deleted,
      |  event_id AS version
      |FROM events""".stripMargin

  /** q56 — table-parallelizer fan-out plan: the multi-table change
    * stream partitions by full table name (each table's rows stay
    * together and ordered; tables apply in parallel), and each table
    * splits into ≤batchSize sub-batches — the per-table lane + batch
    * arithmetic [[graft.sinks.Applier.applyPerTable]] executes. The
    * oracle checks rows-per-table, key spread, per-table batch count,
    * and the ordered boundaries (first/last seq) of each table lane.
    */
  def tableFanout(spark: SparkSession, dir: String): DataFrame = {
    val batchSize = 500
    Cdc.changes(spark, dir)
      .withColumn("tb",
        concat(lit("t"), pmod(col("user_id"), lit(3)).cast("string")))
      .groupBy(col("tb"))
      .agg(count(lit(1)).as("n_rows"),
        countDistinct(col("user_id")).as("n_keys"),
        min(col("event_id")).as("first_seq"),
        max(col("event_id")).as("last_seq"),
        ceil(count(lit(1)) / lit(batchSize.toDouble)).cast("long")
          .as("n_batches"))
  }

  val tableFanoutSql: String =
    """SELECT concat('t', CAST(user_id % 3 AS VARCHAR)) AS tb,
      |  count(*) AS n_rows, count(DISTINCT user_id) AS n_keys,
      |  min(event_id) AS first_seq, max(event_id) AS last_seq,
      |  CAST(ceil(count(*) / 500.0) AS BIGINT) AS n_batches
      |FROM events GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q50_chunk_stats" -> (chunkStats _),
    "q51_streamload_rows" -> (streamLoadRows _),
    "q56_table_fanout" -> (tableFanout _))

  val oracles: Map[String, String] = Map(
    "q50_chunk_stats" -> chunkStatsSql,
    "q51_streamload_rows" -> streamLoadRowsSql,
    "q56_table_fanout" -> tableFanoutSql)
}
