package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DecimalType, DoubleType}

/** Relational batch 3: multi-dimensional aggregation (CUBE / grouping
  * sets) and pivot — the last of the OLAP surface Spark provides natively
  * that the reference lacks (SURVEY §2.9).
  *
  * Both are single-shuffle plans: CUBE expands rows 4× map-side then
  * aggregates once; pivot is a conditional aggregation (one shuffle on the
  * group key, the pivoted dimension never shuffles).
  */
object Relational3 {

  import graft.Tables

  private def dsum(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    sum(c.cast(DecimalType(18, 4))).cast(DoubleType)

  // ---------------------------------------------------------------- q73
  /** CUBE over (l_returnflag, l_linestatus) with a grouping-set id.
    * Spark's `grouping_id()` and DuckDB's `GROUPING(a, b)` both emit the
    * MSB-first aggregated-column bitmask.
    *
    * Two-level shape on purpose: a naive `.cube` on the fact table
    * expands EVERY row ×4 (one per grouping set) before the shuffle —
    * at 100 TB that quadruples shuffle volume for a 12-row answer. The
    * fact table instead pre-aggregates to the finest grouping (with
    * map-side combine; output = |flag|×|status| ≈ 6 rows) and the CUBE
    * expansion runs on that tiny intermediate. All measures are
    * decomposable (counts sum, decimal sums re-sum exactly), so the
    * result is bit-identical to the single-level form.
    */
  def cubeSummary(spark: SparkSession, dir: String): DataFrame = {
    val base = Tables.lineitem(spark, dir)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("_n"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).as("_qty"),
        // noisy double: floor-quantized longs (see Relational.fsum)
        sum(floor(col("l_extendedprice") * lit(10000.0))).as("_price"))
    base.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(grouping_id().as("gid"),
        sum(col("_n")).as("n_rows"),
        sum(col("_qty")).cast(DoubleType).as("sum_qty"),
        (sum(col("_price")).cast(DoubleType) / lit(10000.0))
          .as("sum_price"))
  }

  val cubeSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  GROUPING(l_returnflag, l_linestatus) AS gid,
      |  count(*) AS n_rows,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(floor(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE)
      |    / 10000 AS sum_price
      |FROM lineitem
      |GROUP BY CUBE (l_returnflag, l_linestatus)""".stripMargin

  // ---------------------------------------------------------------- q74
  /** Pivot: user cohorts × event types → total value matrix. Explicit
    * pivot values keep the schema static (no extra distinct-scan job and
    * no data-dependent columns — the only safe form at 100 TB).
    */
  final val EventTypes = Seq("click", "error", "purchase", "signup", "view")

  def eventPivot(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir)
      .withColumn("cohort", pmod(col("user_id"), lit(10L)))
      .groupBy(col("cohort"))
      .pivot("event_type", EventTypes)
      .agg((sum(floor(col("value") * lit(10000.0))).cast(DoubleType) /
        lit(10000.0)))

  val eventPivotSql: String = {
    val cols = EventTypes.map(t =>
      s"CAST(SUM(CASE WHEN event_type = '$t' THEN " +
        s"CAST(floor(value * 10000) AS BIGINT) END) AS DOUBLE) " +
        s"/ 10000 AS $t")
    s"""SELECT ((user_id % 10) + 10) % 10 AS cohort, ${cols.mkString(", ")}
       |FROM events GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q75
  /** Trailing-7-day revenue via a RANGE window frame over epoch-day
    * numbers (value-based frames differ from ROWS when days are missing —
    * exactly what sparse order dates produce). Two-level shape: the big
    * shuffle is the daily pre-aggregation; the unpartitioned window then
    * runs over one bounded row-per-day series (~thousands of rows at any
    * corpus size), so the single-partition sort is never the bottleneck.
    */
  def trailingRevenue(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Tables.orders(spark, dir)
      .groupBy(to_date(col("o_orderdate")).as("day"))
      .agg(sum(floor(col("o_totalprice") * lit(10000.0))).as("rev"))
      .withColumn("dayn",
        datediff(col("day"), lit("1970-01-01").cast("date")))
    val w = Window.orderBy(col("dayn")).rangeBetween(-6, 0)
    daily.select(col("day"),
      (col("rev").cast(DoubleType) / lit(10000.0)).as("daily_rev"),
      (sum(col("rev")).over(w).cast(DoubleType) / lit(10000.0))
        .as("rev_7d"))
  }

  val trailingRevenueSql: String =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS day,
      |    SUM(CAST(floor(o_totalprice * 10000) AS BIGINT)) AS rev
      |  FROM orders GROUP BY 1)
      |SELECT day, CAST(rev AS DOUBLE) / 10000 AS daily_rev,
      |  CAST(SUM(rev) OVER (
      |    ORDER BY datediff('day', DATE '1970-01-01', day)
      |    RANGE BETWEEN 6 PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / 10000 AS rev_7d
      |FROM daily""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q73_cube" -> (cubeSummary _),
    "q74_pivot" -> (eventPivot _),
    "q75_range_window" -> (trailingRevenue _))

  val oracles: Map[String, String] = Map(
    "q73_cube" -> cubeSummarySql,
    "q74_pivot" -> eventPivotSql,
    "q75_range_window" -> trailingRevenueSql)
}
