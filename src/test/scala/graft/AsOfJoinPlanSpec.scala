package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._

import graft.operators.AdvancedOps
import graft.plans.{GraftPlans, PlanQueries}

/** The native AsOfJoinExec (custom LogicalPlan + Strategy + SparkPlan)
  * against the union+window composition and hand-computed vectors.
  */
class AsOfJoinPlanSpec extends SparkSuite {

  private def ts(s: String) = Timestamp.valueOf(s)

  private lazy val quotes = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:00:00"), 100L, 1.0),
      (1L, ts("2024-01-01 10:05:00"), 101L, 2.0),
      (1L, ts("2024-01-01 10:10:00"), 102L, 3.0),
      (2L, ts("2024-01-01 09:00:00"), 200L, 9.0),
      (4L, ts("2024-01-01 12:00:00"), 400L, 4.0)
    ).toDF("user_id", "ts", "quote_id", "quote_val")
  }

  private lazy val probes = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, ts("2024-01-01 10:05:00"), 9000L), // equal ts matches (101)
      (1L, ts("2024-01-01 10:07:30"), 9001L), // between -> 101
      (1L, ts("2024-01-01 11:00:00"), 9002L), // after all -> 102
      (1L, ts("2024-01-01 09:59:59"), 9003L), // before all -> null
      (2L, ts("2024-01-01 09:00:00"), 9004L), // exact single -> 200
      (3L, ts("2024-01-01 10:00:00"), 9005L), // key only on probe side
      (4L, ts("2024-01-01 11:59:59"), 9006L)  // quote later -> null
    ).toDF("user_id", "ts", "probe_id")
  }

  test("native as-of join matches hand-computed matches") {
    val out = GraftPlans.asofJoin(probes, quotes, "user_id", "ts",
        Seq("quote_id", "quote_val"))
      .select("probe_id", "quote_id", "quote_val")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out == Map(
      9000L -> 101L, 9001L -> 101L, 9002L -> 102L, 9003L -> -1L,
      9004L -> 200L, 9005L -> -1L, 9006L -> -1L))
  }

  test("physical plan is AsOfJoinExec with one exchange per side, no window") {
    val df = GraftPlans.asofJoin(probes, quotes, "user_id", "ts",
      Seq("quote_id"))
    val phys = df.queryExecution.executedPlan.toString
    assert(phys.contains("AsOfJoin"))
    val exchanges = "Exchange".r.findAllIn(phys).size
    assert(exchanges == 2, s"expected 2 exchanges, plan:\n$phys")
    assert(!phys.contains("Window"))
  }

  test("co-partitioning holds under mismatched input partitioning") {
    val out = GraftPlans.asofJoin(
        probes.repartition(7), quotes.repartition(3),
        "user_id", "ts", Seq("quote_id"))
      .select("probe_id", "quote_id")
      .collect().map(r => (r.getLong(0),
        if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    assert(out(9002L) == 102L && out(9003L) == -1L)
    assert(out.size == 7)
  }

  test("native operator equals the union+window composition on events") {
    val ev = Tables.events(spark, sf)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    val native = PlanQueries.purchaseAsofClickNative(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    val composed = AdvancedOps.purchaseAsofClick(spark, sf)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toMap
    assert(native.nonEmpty && native == composed)
  }

  test("streaming foreachBatch enriches each micro-batch via the exec") {
    val s = spark
    import s.implicits._
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    val quotesL = Seq((1L, 100L, 101L), (4L, 999L, 400L))
      .toDF("user_id", "ts", "quote_id")
    implicit val sqlCtx = s.sqlContext
    val input = MemoryStream[(Long, Long, Long)]
    val results = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
    val query = input.toDF().toDF("user_id", "ts", "probe_id")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        val out = GraftPlans.asofJoin(batch, quotesL,
            "user_id", "ts", Seq("quote_id"))
          .select("probe_id", "quote_id").collect()
        results.synchronized {
          results ++= out.map(r => (r.getLong(0),
            if (r.isNullAt(1)) -1L else r.getLong(1)))
        }
        ()
      }
      .start()
    try {
      input.addData((1L, 200L, 7001L), (4L, 500L, 7002L))
      query.processAllAvailable()
    } finally query.stop()
    assert(results.toSet == Set((7001L, 101L), (7002L, -1L)))
  }

  test("self-join of one relation on both sides stays unambiguous") {
    val ev = Tables.events(spark, sf).select("user_id", "ts", "event_id")
    val out = GraftPlans.asofJoin(ev,
      ev.withColumnRenamed("event_id", "prior_event"),
      "user_id", "ts", Seq("prior_event"))
    // every probe row matches at least itself (ts <= ts)
    assert(out.filter(col("prior_event").isNull).count() == 0)
    assert(out.count() == ev.count())
  }
}
