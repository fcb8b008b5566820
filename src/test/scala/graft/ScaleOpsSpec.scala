package graft

import org.apache.spark.sql.functions._

import graft.operators.ScaleOps

class ScaleOpsSpec extends SparkSuite {

  test("binned interval join matches a nested-loop reference") {
    val s = spark
    import s.implicits._
    val points = Seq((1L, 0L), (2L, 99L), (3L, 100L), (4L, 250L),
      (5L, 7205L), (6L, 10000L)).toDF("pid", "t")
    val intervals = Seq((10L, 0L, 99L), (11L, 50L, 300L),
      (12L, 100L, 100L), (13L, 7200L, 7300L)).toDF("iid", "lo", "hi")
    val got = ScaleOps.intervalJoinBinned(points, "t",
        intervals, "lo", "hi", 100L)
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    val want = points.crossJoin(intervals)
      .filter(col("t") >= col("lo") && col("t") <= col("hi"))
      .select("pid", "iid").as[(Long, Long)].collect().toSet
    assert(got == want)
    assert(want.contains((3L, 12L))) // zero-length interval, bin edge
    assert(want.contains((2L, 10L)) && want.contains((2L, 11L)))
  }

  test("interval join: each qualifying pair appears exactly once") {
    val s = spark
    import s.implicits._
    // interval spanning many bins; point inside
    val points = Seq((1L, 500L)).toDF("pid", "t")
    val intervals = Seq((9L, 0L, 1000L)).toDF("iid", "lo", "hi")
    val rows = ScaleOps.intervalJoinBinned(points, "t",
      intervals, "lo", "hi", 10L).count()
    assert(rows == 1L)
  }

  test("top-k aggregate equals the window formulation") {
    val orders = Tables.orders(spark, sf)
    val viaAgg = ScaleOps.topOrdersPerPriority(spark, sf)
      .select("o_orderpriority", "rank", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = orders
      .withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 3)
      .select("o_orderpriority", "rank", "o_orderkey")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      .toSet
    assert(viaAgg == viaWindow && viaAgg.nonEmpty)
  }

  test("top-k state: insert and merge are order-independent") {
    val entries = Seq((5.0, 7L), (5.0, 3L), (9.0, 1L), (1.0, 2L),
      (5.0, 1L), (9.0, 9L))
    def run(xs: Seq[(Double, Long)]): Seq[(Double, Long)] = {
      val st = new graft.functions.TopKState(3)
      xs.foreach { case (s, i) => st.insert(s, i) }
      (0 until st.n).map(i => (st.scores(i), st.ids(i)))
    }
    val expect = Seq((9.0, 1L), (9.0, 9L), (5.0, 1L))
    assert(run(entries) == expect)
    assert(run(entries.reverse) == expect)
    // split + merge
    val a = new graft.functions.TopKState(3)
    entries.take(3).foreach { case (s, i) => a.insert(s, i) }
    val b = new graft.functions.TopKState(3)
    entries.drop(3).foreach { case (s, i) => b.insert(s, i) }
    a.mergeFrom(b)
    assert((0 until a.n).map(i => (a.scores(i), a.ids(i))) == expect)
  }

  test("top-k aggregate works from plain SQL via registration") {
    graft.functions.GraftFunctions.register(spark)
    Tables.orders(spark, sf).createOrReplaceTempView("orders_tk")
    val rows = spark.sql(
      """SELECT o_orderpriority,
        |  size(graft_top_k_by(o_totalprice, o_orderkey, 3)) AS n
        |FROM orders_tk GROUP BY 1""".stripMargin)
      .collect().map(r => r.getInt(1))
    assert(rows.nonEmpty && rows.forall(_ == 3))
  }
}
