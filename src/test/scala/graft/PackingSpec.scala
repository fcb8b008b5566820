package graft

import org.apache.spark.sql.functions._

import graft.operators.PackingOps

class PackingSpec extends SparkSuite {
  import spark.implicits._

  test("pack manifest: exclusive offsets, window spans, EOS counted") {
    // token counts 3,1,7,2 (+1 EOS each) → costs 4,2,8,3; window 8
    val docs = Seq(
      (0L, "a b c"),
      (1L, "x"),
      (2L, "t1 t2 t3 t4 t5 t6 t7"),
      (3L, "y z")).toDF("doc_id", "text")
    val out = PackingOps.packWindowsOf(spark, docs, 8L)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out === Array(
      // doc, n_tokens, start, first_win, last_win, n_windows
      (0L, 4L, 0L, 0L, 0L, 1L),
      (1L, 2L, 4L, 0L, 0L, 1L),
      (2L, 8L, 6L, 0L, 1L, 2L), // straddles the first cut
      (3L, 3L, 14L, 1L, 2L, 2L))) // token 15 ends win 1, 16 opens win 2
  }

  test("pack manifest is contiguous and deterministic at corpus scale") {
    val out = PackingOps.packWindows(spark, sf)
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(out.length == 500)
    // exclusive-prefix contiguity: each start is the previous end
    var expect = 0L
    out.foreach { case (id, n, start, fw, lw, nw) =>
      assert(start == expect, s"doc $id")
      assert(fw == start / PackingOps.WindowTokens)
      assert(lw == (start + n - 1) / PackingOps.WindowTokens)
      assert(nw == lw - fw + 1)
      expect = start + n
    }
    // windows must jointly cover the whole stream
    assert(out.last._3 + out.last._2 == expect)
  }

  test("pack plan: two-pass prefix sum, no Window, one range exchange") {
    val plan = PackingOps.packWindows(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // the offset table joins back as a broadcast literal, never a shuffle
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
