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

  test("bin pack: capacity invariant, truncation, determinism, " +
      "first-fit bound") {
    val cap = 10L
    val docs = Seq(
      (1L, "t1 t2 t3 t4 t5 t6 t7 t8 t9"),           // cost 10: full bin
      (2L, "a b c d e"),                            // cost 6
      (3L, "x y z"),                                // cost 4
      (4L, "only"),                                 // cost 2
      (5L, (1 to 15).map(i => s"w$i").mkString(" ")) // 16 > cap: truncated
    ).toDF("doc_id", "text")
    val out = PackingOps.binPackOf(spark, docs, cap)
      .as[(Long, Long, Boolean, Long)].collect().sortBy(_._1)
    // every doc placed exactly once
    assert(out.map(_._1).toSeq == Seq(1L, 2L, 3L, 4L, 5L))
    val byDoc = out.map(r => r._1 -> r).toMap
    // oversize doc truncated to capacity; others keep their cost
    assert(byDoc(5L)._2 == cap && byDoc(5L)._3)
    assert(byDoc(2L)._2 == 6L && !byDoc(2L)._3)
    // no bin over capacity
    out.groupBy(_._4).foreach { case (bin, rows) =>
      assert(rows.map(_._2).sum <= cap, s"bin $bin over capacity")
    }
    // deterministic across runs
    val again = PackingOps.binPackOf(spark, docs, cap)
      .as[(Long, Long, Boolean, Long)].collect().sortBy(_._1)
    assert(out.toSeq == again.toSeq)
  }

  test("bin pack at corpus scale: invariants + efficiency report") {
    val cap = PackingOps.WindowTokens
    val manifest = PackingOps.binPack(spark, sf).cache()
    try {
      val rows = manifest.as[(Long, Long, Boolean, Long)].collect()
      assert(rows.length == 500)
      rows.groupBy(_._4).foreach { case (bin, rs) =>
        assert(rs.map(_._2).sum <= cap, s"bin $bin over capacity")
      }
      val report = PackingOps.binPackReport(manifest, cap).collect()(0)
      val nBins = report.getAs[Long]("n_bins")
      val lb = report.getAs[Long]("lower_bound")
      val nParts = spark.sessionState.conf.numShufflePartitions
      // the first-fit guarantee, degraded only by the partition count
      assert(nBins <= 2 * lb + nParts, s"bins $nBins vs bound $lb")
      assert(report.getAs[Long]("fill_permille") >= 500L)
      assert(report.getAs[Long]("n_docs") == 500L)
    } finally manifest.unpersist()
  }

  test("pack plan: two-pass prefix sum, no Window, one range exchange") {
    val plan = PackingOps.packWindows(spark, sf)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // the offset table joins back as a broadcast literal, never a shuffle
    assert(!plan.contains("SortMergeJoin"), plan)
  }

  test("window loss: hand-counted truncation loss and split padding " +
      "per window size") {
    val s2 = spark
    import s2.implicits._
    // 100 tokens and 40 tokens
    val docs = Seq(
      (1L, Seq.fill(100)("tok").mkString(" ")),
      (2L, Seq.fill(40)("tok").mkString(" "))).toDF("doc_id", "text")
    val r = graft.operators.PackingOps.windowLossOf(docs).collect()
      .map(x => x.getAs[Long]("window") -> x).toMap
    // w=32: lost = (100-32)+(40-32) = 76 of 140; split windows =
    // ceil(100/32)+ceil(40/32) = 4+2 = 6 -> pad = 6*32-140 = 52
    val w32 = r(32L)
    assert(w32.getAs[Long]("n_overflow") == 2)
    assert(w32.getAs[Long]("lost_truncate") == 76)
    assert(w32.getAs[Long]("lost_permille") == 76L * 1000 / 140)
    assert(w32.getAs[Long]("n_windows_split") == 6)
    assert(w32.getAs[Long]("pad_split") == 52)
    assert(w32.getAs[Long]("pad_permille") == 52L * 1000 / (6 * 32))
    // w=256: nothing overflows, one window per doc
    val w256 = r(256L)
    assert(w256.getAs[Long]("n_overflow") == 0)
    assert(w256.getAs[Long]("lost_truncate") == 0)
    assert(w256.getAs[Long]("n_windows_split") == 2)
    assert(w256.getAs[Long]("pad_split") == 2 * 256 - 140)
  }
}
