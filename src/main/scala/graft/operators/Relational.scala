package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Relational showcase operators: aggregation, filter/projection pushdown,
  * multi-way broadcast join, window functions.
  *
  * The reference (ape-dts) has no relational algebra beyond filter/project —
  * Spark provides it natively (SURVEY.md §2.9); these queries prove the
  * engine exposes it and that the plans are scale-ready (pushdown, broadcast,
  * whole-stage codegen).
  *
  * Cross-engine determinism rule used throughout this codebase: never emit a
  * multi-row SUM over doubles (accumulation order differs between engines).
  * Quantize each row to an exact integer/decimal first, aggregate (exact,
  * associative), and cast the final value to DOUBLE. The quantizer choice
  * matters: a double→DECIMAL cast is itself an engine seam on full-noise
  * values (Spark rounds the shortest-decimal rendering, DuckDB the binary
  * expansion — divergent at scale), so decimal casts are reserved for
  * decimal-exact inputs and everything noisy goes through floor
  * quantization ([[fsum]]), which is pure binary arithmetic. Per-row double
  * arithmetic (same inputs, same op order) is IEEE-deterministic and safe.
  */
object Relational {

  /** Exact-sum helper: decimal-cast accumulate, emit double. Use ONLY
    * on decimal-exact inputs (integer-valued quantities): on full-noise
    * doubles the double→decimal cast itself is an engine seam — Spark
    * rounds the shortest-decimal rendering, DuckDB the binary
    * expansion — and at large row counts the residues reach the output
    * hash. Noisy inputs go through [[fsum]]/[[fsumWin]] instead.
    */
  private def dsum(c: Column, p: Int = 18, s: Int = 4): Column =
    sum(c.cast(DecimalType(p, s))).cast(DoubleType)

  /** Exact-sum for NOISY doubles: quantize each row by `floor(c·10^s)`
    * — floor of a double is pure binary, bit-identical in every engine
    * at every scale — accumulate the longs, emit units. The metric is
    * defined as floor-quantized at 10^-s; per-row quantization error is
    * bounded and deterministic, unlike a decimal cast's engine skew.
    */
  private[operators] def fsum(c: Column, s: Int = 4): Column = {
    val scale = math.pow(10, s)
    sum(floor(c * lit(scale))).cast(DoubleType) / lit(scale)
  }

  private[operators] def fsumSql(e: String, s: Int = 4): String = {
    val scale = "1" + "0" * s
    s"CAST(SUM(CAST(floor(($e) * $scale) AS BIGINT)) AS DOUBLE) / $scale"
  }

  /** q01 — TPC-H Q1-style pricing summary over lineitem.
    * Exercises: groupBy aggregation with map-side partial agg, filter pushed
    * to parquet scan, exact decimal accumulation.
    */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(to_date(col("l_shipdate")) <= lit("1998-09-02"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        fsum(col("l_extendedprice")).as("sum_base_price"),
        fsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("sum_disc_price"),
        count(lit(1)).as("count_order"))
  }

  val pricingSummarySql: String =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(floor(l_extendedprice * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_base_price,
      |  CAST(SUM(CAST(floor(l_extendedprice * (1.0 - l_discount) * 10000) AS BIGINT)) AS DOUBLE) / 10000 AS sum_disc_price,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-02'
      |GROUP BY l_returnflag, l_linestatus""".stripMargin

  /** q02 — filter + projection (the reference's ignore_cols + where_conditions,
    * SURVEY §2.2). Catalyst pushes both to the scan: `.explain` must show
    * PushedFilters on l_returnflag/l_discount and a 4-column ReadSchema.
    */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.filter(col("l_returnflag") === "R" && col("l_discount") > 0.05)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_discount"))
  }

  val filterProjectSql: String =
    """SELECT l_orderkey, l_linenumber, l_quantity, l_discount
      |FROM lineitem WHERE l_returnflag = 'R' AND l_discount > 0.05""".stripMargin

  /** q03 — revenue per region: orders ⋈ customer ⋈ nation ⋈ region.
    * customer/nation/region are dimension tables — explicitly broadcast so
    * the plan is three BroadcastHashJoins with zero shuffle of the fact
    * table (at 100 TB the orders side never moves).
    */
  def regionRevenue(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val c = Tables.customer(spark, dir)
    val n = Tables.nation(spark, dir)
    val r = Tables.region(spark, dir)
    o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"))
      .agg(
        count(lit(1)).as("n_orders"),
        fsum(col("o_totalprice")).as("revenue"))
  }

  val regionRevenueSql: String =
    s"""SELECT r_name, COUNT(*) AS n_orders,
      |  ${fsumSql("o_totalprice")} AS revenue
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY r_name""".stripMargin

  /** q04 — window functions: per-customer running order total + sequence
    * number. Decimal running sum keeps cross-engine accumulation exact;
    * (o_orderdate, o_orderkey) is a total order so ranks are deterministic.
    */
  def runningTotals(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    o.select(
      col("o_orderkey"), col("o_custkey"),
      row_number().over(w).as("order_seq"),
      (sum(floor(col("o_totalprice") * lit(10000.0)))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast(DoubleType) / lit(10000.0)).as("running_total"))
  }

  val runningTotalsSql: String =
    """SELECT o_orderkey, o_custkey,
      |  ROW_NUMBER() OVER w AS order_seq,
      |  CAST(SUM(CAST(floor(o_totalprice * 10000) AS BIGINT)) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    / 10000 AS running_total
      |FROM orders
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin

  /** q05 — top-N per group (largest order per priority class): the classic
    * rank-then-filter pattern the merge/dedup operators build on.
    */
  def topOrdersPerPriority(spark: SparkSession, dir: String): DataFrame = {
    val o = Tables.orders(spark, dir)
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.select(col("o_orderpriority"), col("o_orderkey"), col("o_totalprice"),
        row_number().over(w).as("rk"))
      .filter(col("rk") <= 3)
  }

  val topOrdersPerPrioritySql: String =
    """SELECT o_orderpriority, o_orderkey, o_totalprice, rk FROM (
      |  SELECT o_orderpriority, o_orderkey, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |      ORDER BY o_totalprice DESC, o_orderkey) AS rk
      |  FROM orders) WHERE rk <= 3""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q01_pricing_summary" -> (pricingSummary _),
    "q02_filter_project" -> (filterProject _),
    "q03_region_revenue" -> (regionRevenue _),
    "q04_running_totals" -> (runningTotals _),
    "q05_top_per_group" -> (topOrdersPerPriority _))

  val oracles: Map[String, String] = Map(
    "q01_pricing_summary" -> pricingSummarySql,
    "q02_filter_project" -> filterProjectSql,
    "q03_region_revenue" -> regionRevenueSql,
    "q04_running_totals" -> runningTotalsSql,
    "q05_top_per_group" -> topOrdersPerPrioritySql)
}
