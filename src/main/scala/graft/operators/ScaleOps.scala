package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Operators whose point is the 100 TB plan shape: a binned interval
  * join (no cartesian, no IEJoin dependency) and bounded top-k-per-group
  * via a custom aggregate (no full-group sort).
  */
object ScaleOps {

  // ---------------------------------------------------------------- q85
  /** Interval (range) join by binning: points t ⋈ intervals [lo, hi]
    * with lo ≤ t ≤ hi. Each interval explodes into the bins it covers,
    * points join on their single bin, and the exact predicate filters
    * within the bin — an equi-join Catalyst can hash-partition, instead
    * of the broadcast-nested-loop cartesian a naive range predicate
    * plans to. Every qualifying (point, interval) pair matches exactly
    * once (a point has one bin), so no dedup pass is needed.
    *
    * Bin width tunes the explode factor vs selectivity: shuffled rows =
    * |points| + Σ(interval length / width + 1). Long-tailed interval
    * lengths at 100 TB → pick width near the median length, or split
    * oversize intervals into a broadcast side-channel.
    */
  def intervalJoinBinned(points: DataFrame, tCol: String,
      intervals: DataFrame, loCol: String, hiCol: String,
      binWidth: Long): DataFrame = {
    val lo = col(loCol); val hi = col(hiCol)
    val binned = intervals.withColumn("_bin",
      explode(sequence(expr(s"$loCol div $binWidth"),
        expr(s"$hiCol div $binWidth"))))
    points.withColumn("_bin", expr(s"$tCol div $binWidth"))
      .join(binned, "_bin")
      .filter(col(tCol) >= lo && col(tCol) <= hi)
      .drop("_bin")
  }

  /** q85 — session-concurrency census: every event joined to ALL user
    * sessions (q71's output) whose [start, end] span covers the event's
    * timestamp, aggregated per event type. A classic interval-overlap
    * workload with no equi-key — DuckDB plans its IEJoin, we bin.
    */
  def sessionConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val sessions = AdvancedOps.sessionize(spark, dir)
      .select(col("session_start"), col("session_end"))
    val ev = Tables.events(spark, dir)
      .select(col("event_id"), col("event_type"),
        unix_timestamp(col("ts")).as("epoch"))
    intervalJoinBinned(ev, "epoch", sessions,
        "session_start", "session_end", 3600L)
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_pairs"),
        countDistinct(col("event_id")).as("n_events"))
  }

  val sessionConcurrencySql: String =
    s"""WITH sessions AS (
       |  SELECT session_start, session_end FROM (
       |    ${AdvancedOps.sessionizeSql}) z),
       |ev AS (SELECT event_id, event_type,
       |    CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events)
       |SELECT ev.event_type, COUNT(*) AS n_pairs,
       |  COUNT(DISTINCT ev.event_id) AS n_events
       |FROM ev JOIN sessions
       |  ON ev.epoch >= sessions.session_start
       | AND ev.epoch <= sessions.session_end
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q86
  /** q86 — top-3 orders per priority through the bounded
    * [[graft.functions.TopKByAgg]] aggregate: map-side k-slot buffers
    * shuffle only numPartitions·k entries per group, where the q05-style
    * row_number window shuffles and sorts every order row. Same rows as
    * the window formulation (the DuckDB oracle IS the window form).
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("o_totalprice"), col("o_orderkey"), 3).as("top"))
      .select(col("o_orderpriority"), posexplode(col("top")))
      .select(col("o_orderpriority"),
        (col("pos") + 1).cast("long").as("rank"),
        col("col.id").as("o_orderkey"),
        col("col.score").as("o_totalprice"))

  val topOrdersPerPrioritySql: String =
    """SELECT o_orderpriority, rank, o_orderkey, o_totalprice FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rank
      |  FROM orders) z WHERE rank <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q85_interval_join" -> (sessionConcurrency _),
    "q86_topk_agg" -> (topOrdersPerPriority _))

  val oracles: Map[String, String] = Map(
    "q85_interval_join" -> sessionConcurrencySql,
    "q86_topk_agg" -> topOrdersPerPrioritySql)
}
