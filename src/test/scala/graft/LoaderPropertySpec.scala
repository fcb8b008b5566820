package graft

import scala.util.chaining._

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.{HygieneOps, LoaderOps}

/** Property battery for the loader-layout and winnowing operators over
  * random corpora. Fixed seeds, raw ScalaCheck (CompactionPropertySpec
  * discipline).
  *
  * Shard shuffle contract: a PERMUTATION — every doc exactly once,
  * dense 1-based positions per shard, shard within range, identical
  * output run-to-run — for any corpus size and shard count.
  *
  * Winnowing contract (Schleimer et al. 2003): every emitted
  * fingerprint is the minimum hash of at least one window (rightmost
  * tied position), and any two documents sharing a run of at least
  * w + n − 1 consecutive tokens share at least one fingerprint hash —
  * the paper's detection guarantee, which is exactly what makes the
  * fingerprints usable for bucketed overlap joins downstream.
  */
class LoaderPropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  test("shard shuffle is a deterministic permutation with dense " +
      "per-shard positions for any corpus size and shard count") {
    for (seed <- 1L to 4L) {
      val n = sample(Gen.choose(0, 300), seed)
      val nShards = sample(Gen.oneOf(1, 2, 7, 16, 64), seed * 7)
      val docs = (0L until n.toLong).map(i => (i, s"doc $i"))
        .toDF("doc_id", "text")
      val rows = LoaderOps.shardShuffleOf(spark, docs, nShards)
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.length == n)
      assert(rows.map(_._1).toSet == (0L until n.toLong).toSet)
      assert(rows.forall(r => r._2 >= 0 && r._2 < nShards))
      rows.groupBy(_._2).foreach { case (_, members) =>
        val poss = members.map(_._3).sorted.toSeq
        assert(poss == (1L to members.length.toLong))
        assert(members.forall(_._4 == members.length.toLong))
      }
      val again = LoaderOps.shardShuffleOf(spark, docs, nShards)
        .as[(Long, Long, Long, Long)].collect()
      assert(rows.sortBy(_._1).toSeq == again.sortBy(_._1).toSeq)
    }
  }

  private val word: Gen[String] =
    Gen.choose('a', 'j').map(_.toString)

  test("sliding chunks cover every token with stride-spaced starts " +
      "and an exact tail for any (len, stride)") {
    import graft.operators.LoaderOps
    for (seed <- 1L to 4L) {
      val len = sample(Gen.choose(2, 24), seed)
      val stride = sample(Gen.choose(1, len), seed * 3)
      val sizes = sample(Gen.listOfN(sample(Gen.choose(1, 30), seed * 5),
        Gen.choose(1, 60)), seed * 7)
      val docs = sizes.zipWithIndex.map { case (n, i) =>
        (i.toLong, Seq.fill(n)("t").mkString(" "))
      }.toDF("doc_id", "text")
      val chunks = LoaderOps.slidingChunksOf(docs, len, stride)
        .as[(Long, Long, Long, Long, Long)].collect().groupBy(_._1)
      sizes.zipWithIndex.foreach { case (n, i) =>
        val cs = chunks(i.toLong).sortBy(_._2)
        // starts advance by exactly the stride from zero
        assert(cs.map(_._3).toSeq ==
          cs.indices.map(_.toLong * stride))
        // every chunk fits, the last reaches exactly the end
        cs.foreach(c => assert(c._4 >= 1 && c._4 <= len &&
          c._3 + c._4 <= n))
        assert(cs.last._3 + cs.last._4 == n.toLong)
        // full coverage: consecutive chunks leave no gap
        cs.sliding(2).foreach {
          case Array(a, b) => assert(b._3 <= a._3 + a._4)
          case _ =>
        }
        // never an empty tail chunk: the final start is < n
        assert(cs.last._3 < n)
      }
    }
  }

  test("corpus diff recovers exactly the edit script applied to a " +
      "random version 1") {
    import graft.operators.CurationOps
    for (seed <- 1L to 4L) {
      val n = sample(Gen.choose(5, 80), seed)
      val v1 = (0L until n.toLong).map(i =>
        (i, sample(Gen.listOfN(6, word), seed * 1009 + i).mkString(" ")))
      val ids = v1.map(_._1)
      val removed = sample(Gen.someOf(ids), seed * 3).toSet
      val changed = sample(Gen.someOf(ids.filterNot(removed)), seed * 5)
        .toSet
      val added = (0L until sample(Gen.choose(0, 10), seed * 7).toLong)
        .map(i => (1000L + i, s"new doc $i"))
      val v2 = v1.filterNot(d => removed(d._1)).map { case (id, t) =>
        if (changed(id)) (id, t + " edited") else (id, t)
      } ++ added
      val r = CurationOps
        .corpusDiffOf(v1.toDF("doc_id", "text"), v2.toDF("doc_id", "text"))
        .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
      assert(r.size == n + added.length)
      ids.foreach { id =>
        val want =
          if (removed(id)) "removed"
          else if (changed(id)) "changed"
          else "unchanged"
        assert(r(id) == want, s"doc $id")
      }
      added.foreach { case (id, _) => assert(r(id) == "added") }
    }
  }

  test("winnowing: every fingerprint is a window minimum, and a " +
      "shared >= 8-token run guarantees a shared fingerprint") {
    for (seed <- 1L to 4L) {
      // two random docs plus a third carrying a shared 8..12-token run
      val run = sample(Gen.choose(8, 12), seed)
        .pipe(k => sample(Gen.listOfN(k, word), seed * 3))
      def padded(s: Long) =
        (sample(Gen.listOfN(sample(Gen.choose(0, 10), s), word), s * 5)
          ++ run ++
          sample(Gen.listOfN(sample(Gen.choose(0, 10), s + 1), word),
            s * 11)).mkString(" ")
      val docs = Seq(
        (1L, padded(seed * 17)),
        (2L, padded(seed * 29)),
        (3L, sample(Gen.listOfN(30, word), seed * 41).mkString(" ")))
        .toDF("doc_id", "text")
      val fp = HygieneOps.winnowOf(docs)
        .as[(Long, Long, Long)].collect()

      // reference selection per doc (driver-side slow form)
      val texts = docs.as[(Long, String)].collect().toMap
      val w = HygieneOps.WinnowWindow
      fp.groupBy(_._1).foreach { case (doc, rows) =>
        val toks = texts(doc).trim.split("\\s+")
        val hs = toks.sliding(5).map(g =>
          g.mkString(" ").foldLeft(0L)((acc, c) =>
            ((acc * 31 + c) % TextOpsFold.P + TextOpsFold.P)
              % TextOpsFold.P).toLong).toArray
        val ng = hs.length
        val expected = (0 to math.max(ng - w, 0)).map { wi =>
          val end = math.min(wi + w, ng)
          val mh = hs.slice(wi, end).min
          ((wi until end).filter(i => hs(i) == mh).max.toLong, mh)
        }.toSet
        assert(rows.map(r => (r._2, r._3)).toSet == expected,
          s"doc $doc")
      }
      // detection guarantee across the pair carrying the shared run
      val h1 = fp.filter(_._1 == 1L).map(_._3).toSet
      val h2 = fp.filter(_._1 == 2L).map(_._3).toSet
      assert(h1.intersect(h2).nonEmpty)
    }
  }

}

/** charFold modulus mirror for driver-side reference hashing. */
private object TextOpsFold { val P = graft.operators.TextOps.FoldP }
