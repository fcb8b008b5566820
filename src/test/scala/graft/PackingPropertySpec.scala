package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.PackingOps

/** Property battery for the packing operators over random corpora:
  * the concat-and-chunk manifest must BE the exclusive prefix sum of
  * token costs in doc_id order at any window size, and bin packing
  * must satisfy its three contracts (every doc placed once, no bin
  * over capacity, bins within the first-fit bound) for any size mix —
  * including adversarial ones (all-oversize, all-tiny, exact-fit).
  * Fixed seeds, raw ScalaCheck (CompactionPropertySpec discipline).
  */
class PackingPropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  // token counts weighted toward boundaries: empty-ish, window-sized,
  // oversize
  private def corpusGen(cap: Long): Gen[List[Int]] =
    Gen.choose(1, 120).flatMap(n => Gen.listOfN(n, Gen.frequency(
      4 -> Gen.choose(1, 40),
      2 -> Gen.choose((cap / 2).toInt, cap.toInt),
      1 -> Gen.choose(cap.toInt, 3 * cap.toInt))))

  private def docsOf(sizes: List[Int]) =
    sizes.zipWithIndex.map { case (n, i) =>
      (i.toLong, Seq.fill(n)("tok").mkString(" "))
    }.toDF("doc_id", "text")

  test("pack manifest is the exclusive prefix sum at any window size") {
    for (seed <- 1L to 5L) {
      val cap = sample(Gen.oneOf(8L, 64L, 512L), seed)
      val sizes = sample(corpusGen(cap), seed * 13)
      val out = PackingOps.packWindowsOf(spark, docsOf(sizes), cap)
        .orderBy("doc_id")
        .as[(Long, Long, Long, Long, Long, Long)].collect()
      assert(out.length == sizes.length)
      var off = 0L
      out.zip(sizes).foreach { case ((id, n, start, fw, lw, nw), sz) =>
        assert(n == sz + 1L, s"seed $seed doc $id") // +1 EOS
        assert(start == off, s"seed $seed doc $id")
        assert(fw == start / cap && lw == (start + n - 1) / cap &&
          nw == lw - fw + 1, s"seed $seed doc $id")
        off += n
      }
    }
  }

  test("bin packing contracts hold for any size mix") {
    for (seed <- 1L to 5L) {
      val cap = sample(Gen.oneOf(8L, 64L, 512L), seed)
      val sizes = sample(corpusGen(cap), seed * 29)
      val out = PackingOps.binPackOf(spark, docsOf(sizes), cap)
        .as[(Long, Long, Boolean, Long)].collect()
      // every doc placed exactly once
      assert(out.map(_._1).sorted.toSeq == sizes.indices.map(_.toLong))
      out.foreach { case (id, cost, trunc, _) =>
        val raw = sizes(id.toInt) + 1L
        assert(trunc == (raw > cap), s"seed $seed doc $id")
        assert(cost == math.min(raw, cap), s"seed $seed doc $id")
      }
      // capacity invariant per bin
      out.groupBy(_._4).foreach { case (bin, rows) =>
        assert(rows.map(_._2).sum <= cap, s"seed $seed bin $bin")
      }
      // first-fit bound, degraded only by the partition count
      val nBins = out.map(_._4).max + 1
      val total = out.map(_._2).sum
      val lb = (total + cap - 1) / cap
      val p = spark.sessionState.conf.numShufflePartitions
      assert(nBins <= 2 * lb + p, s"seed $seed: $nBins bins vs lb $lb")
    }
  }
}
