package graft

import org.apache.spark.sql.SparkSession

import graft.functions.GraftExtensions

class ExtensionsSpec extends SparkSuite {

  test("SparkSessionExtensions injects native functions into fresh sessions") {
    spark // ensure shared context exists
    val active = SparkSession.getActiveSession
    val default = SparkSession.getDefaultSession
    try {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
      val s2 = SparkSession.builder()
        .master("local[2]")
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      val fold = s2.sql("SELECT graft_char_fold('abc') AS h")
        .collect().head.getLong(0)
      assert(fold == ((97L * 31 + 98) * 31 + 99) % 999999999999989L)
      val dot = s2.sql(
        "SELECT graft_long_dot(array(1L,2L), array(3L,4L)) AS d")
        .collect().head.getLong(0)
      assert(dot == 11L)
      assert(s2.sql("SELECT size(graft_shingle_hashes('a b c d e f'))")
        .collect().head.getInt(0) == 2)
      // planner strategy rides along with the extensions — present in
      // the fresh session's planner before any GraftPlans.install call
      val planner = s2.asInstanceOf[
        org.apache.spark.sql.classic.SparkSession]
        .sessionState.planner
      assert(planner.strategies.contains(graft.plans.GraftStrategy))
      import s2.implicits._
      val probes = Seq((1L, 10L, 100L)).toDF("k", "ts", "pid")
      val quotes = Seq((1L, 5L, 7.5)).toDF("k", "ts", "qv")
      val out = graft.plans.GraftPlans.asofJoin(
        probes, quotes, "k", "ts", Seq("qv"))
      assert(out.collect().map(r => (r.getLong(2), r.getDouble(3)))
        .toSeq == Seq((100L, 7.5)))
    } finally {
      active.foreach(SparkSession.setActiveSession)
      default.foreach(SparkSession.setDefaultSession)
    }
  }
}
