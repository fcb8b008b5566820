package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Operators Spark lacks as single nodes, built by composition (the
  * preferred tier in SURVEY §7.2 — custom LogicalPlan/Strategy only when
  * composition can't express the semantics; these can).
  */
object AdvancedOps {

  /** As-of join via the union+window trick: tag both streams, sort by
    * (key, ts, side), carry the last left-side value forward, keep right
    * rows. One shuffle on the key — same cost class as a sort-merge
    * join, no range explosion. Equal timestamps match (DuckDB ASOF
    * semantics: right.ts >= left.ts).
    */
  def asofJoin(left: DataFrame, right: DataFrame, key: String,
      ts: String, leftVals: Seq[String]): DataFrame = {
    val l = left.select((Seq(key, ts) ++ leftVals).map(col): _*)
      .withColumn("_side", lit(0))
    val keep = leftVals.map(c => s"_l_$c")
    val lTagged = leftVals.foldLeft(l)((df, c) =>
      df.withColumnRenamed(c, s"_l_$c"))
    val rTagged = keep.foldLeft(right.withColumn("_side", lit(1)))(
      (df, c) => df.withColumn(c,
        lit(null).cast(lTagged.schema(c).dataType)))
    val union = lTagged.unionByName(rTagged,
      allowMissingColumns = true)
    val w = Window.partitionBy(col(key))
      .orderBy(col(ts), col("_side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = keep.foldLeft(union)((df, c) =>
      df.withColumn(c, last(col(c), ignoreNulls = true).over(w)))
    filled.filter(col("_side") === 1).drop("_side")
  }

  /** q70 — as-of join on the event stream: for every purchase, the most
    * recent prior-or-simultaneous click by the same user.
    */
  def purchaseAsofClick(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    asofJoin(clicks, purchases, "user_id", "ts",
        Seq("click_id", "click_value"))
      .filter(col("_l_click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("_l_click_id").as("click_id"),
        col("_l_click_value").as("click_value"))
  }

  val purchaseAsofClickSql: String =
    """WITH clicks AS (SELECT user_id, ts, event_id AS click_id,
      |    value AS click_value FROM events WHERE event_type = 'click'),
      |purchases AS (SELECT user_id, ts, event_id, value FROM events
      |  WHERE event_type = 'purchase')
      |SELECT p.event_id AS purchase_id, p.user_id,
      |  c.click_id, c.click_value
      |FROM purchases p ASOF JOIN clicks c
      |  ON p.user_id = c.user_id AND p.ts >= c.ts""".stripMargin

  /** q71 — sessionization: split each user's events into sessions with a
    * 1-hour inactivity gap (gap-flag + running sum — one shuffle; the
    * streaming equivalent is session_window/flatMapGroupsWithState).
    */
  def sessionize(spark: SparkSession, dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
      .withColumn("epoch", unix_timestamp(col("ts")))
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("epoch"), col("event_id"))
    val flagged = ev
      .withColumn("prev", lag(col("epoch"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull ||
          col("epoch") - col("prev") > 3600, 1).otherwise(0))
      .withColumn("session_id",
        sum(col("new_session")).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    flagged.groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_events"),
        min(col("epoch")).as("session_start"),
        max(col("epoch")).as("session_end"),
        (sum(floor(col("value") * lit(1000000.0))).cast(DoubleType) /
          lit(1000000.0)).as("session_value"))
  }

  val sessionizeSql: String =
    """WITH e AS (SELECT user_id, event_id, value,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS epoch FROM events),
      |f AS (SELECT *,
      |    CASE WHEN lag(epoch) OVER w IS NULL
      |      OR epoch - lag(epoch) OVER w > 3600 THEN 1 ELSE 0 END
      |      AS new_session
      |  FROM e WINDOW w AS (PARTITION BY user_id
      |    ORDER BY epoch, event_id)),
      |s AS (SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY epoch, event_id
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS session_id
      |  FROM f)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(epoch) AS session_start, MAX(epoch) AS session_end,
      |  CAST(SUM(CAST(floor(value * 1000000) AS BIGINT)) AS DOUBLE)
      |    / 1000000 AS session_value
      |FROM s GROUP BY 1, 2""".stripMargin

  /** q72 — exact percentiles per group (both engines: linear
    * interpolation over the sorted set).
    */
  def priceQuantiles(spark: SparkSession, dir: String): DataFrame =
    Tables.orders(spark, dir)
      .groupBy(col("o_orderpriority"))
      .agg(
        percentile(col("o_totalprice"), lit(0.5)).as("p50"),
        percentile(col("o_totalprice"), lit(0.9)).as("p90"),
        count(lit(1)).as("n"))

  val priceQuantilesSql: String =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS p50,
      |  quantile_cont(o_totalprice, 0.9) AS p90,
      |  COUNT(*) AS n
      |FROM orders GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q104
  /** Histogram quantiles — the SCALE path next to q72's exact form:
    * q72 sorts every group member (no partial aggregation; at 100 TB
    * each group's values converge on single tasks), while this
    * operator floor-quantizes values into 0.1-unit bins (pure binary —
    * no engine seams), hash-aggregates (bin, count) with map-side
    * combine, and answers p50/p95/p99 from the ≤ few-thousand-row bin
    * table with a cumulative window. The estimate is the lower bound
    * of the first bin whose cumulative count reaches ⌈q·n⌉ — compared
    * in exact integers (cum·100 ≥ n·q100), no interpolation, so the
    * answer is deterministic and mergeable across any partitioning.
    */
  def quantileHist(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val hist = Tables.events(spark, dir)
      .select(col("event_type"),
        floor(col("value") * lit(10.0)).as("bin"))
      .groupBy(col("event_type"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val totals = hist.groupBy(col("event_type"))
      .agg(sum(col("cnt")).as("n"))
    val w = Window.partitionBy(col("event_type")).orderBy(col("bin"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    hist.withColumn("cum", sum(col("cnt")).over(w))
      .join(broadcast(totals), "event_type")
      .groupBy(col("event_type"))
      .agg(first(col("n")).as("n"),
        (min(when(col("cum") * 2 >= col("n"), col("bin"))) / lit(10.0))
          .as("p50_est"),
        (min(when(col("cum") * 100 >= col("n") * 95, col("bin"))) /
          lit(10.0)).as("p95_est"),
        (min(when(col("cum") * 100 >= col("n") * 99, col("bin"))) /
          lit(10.0)).as("p99_est"))
  }

  val quantileHistSql: String =
    """WITH hist AS (
      |  SELECT event_type, CAST(floor(value * 10) AS BIGINT) AS bin,
      |    count(*) AS cnt
      |  FROM events GROUP BY 1, 2),
      |c AS (SELECT event_type, bin, cnt,
      |    SUM(cnt) OVER (PARTITION BY event_type ORDER BY bin
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
      |    SUM(cnt) OVER (PARTITION BY event_type) AS n
      |  FROM hist)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(MIN(CASE WHEN cum * 2 >= n THEN bin END) AS DOUBLE) / 10
      |    AS p50_est,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 95 THEN bin END) AS DOUBLE)
      |    / 10 AS p95_est,
      |  CAST(MIN(CASE WHEN cum * 100 >= n * 99 THEN bin END) AS DOUBLE)
      |    / 10 AS p99_est
      |FROM c GROUP BY 1""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q70_asof_join" -> (purchaseAsofClick _),
    "q71_sessionize" -> (sessionize _),
    "q72_quantiles" -> (priceQuantiles _),
    "q104_quantile_hist" -> (quantileHist _))

  val oracles: Map[String, String] = Map(
    "q70_asof_join" -> purchaseAsofClickSql,
    "q71_sessionize" -> sessionizeSql,
    "q72_quantiles" -> priceQuantilesSql,
    "q104_quantile_hist" -> quantileHistSql)
}
