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


  test("length buckets and window loss agree with brute-force models " +
      "over random corpora") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    def sample[T](g: Gen[T], seed: Long): T =
      g.apply(Gen.Parameters.default, Seed(seed))
        .getOrElse(sys.error("gen failed"))
    val corpusGen = for {
      n <- Gen.choose(5, 60)
      lens <- Gen.listOfN(n, Gen.choose(1, 120))
    } yield lens
    (1L to 8L).foreach { seed =>
      val lens = sample(corpusGen, seed)
      val docs = lens.zipWithIndex.map { case (l, i) =>
        (i.toLong, Seq.fill(l)("t").mkString(" "))
      }.toDF("doc_id", "text")

      // q139 model: sort lengths, cumulative token mass, bucket by
      // ceil(cum*4/total) over the (len -> count) census rows
      val census = lens.groupBy(identity).view
        .mapValues(_.size).toSeq.sortBy(_._1)
      val total = lens.map(_.toLong).sum
      var cum = 0L
      val model = census.map { case (len, cnt) =>
        cum += len.toLong * cnt
        val b = (cum * 4 + total - 1) / total
        (len.toLong, cnt.toLong, b)
      }
      val expected = model.groupBy(_._3).map { case (b, rows) =>
        b -> (rows.map(_._1).min, rows.map(_._1).max,
          rows.map(_._2).sum, rows.map(r => r._1 * r._2).sum)
      }
      val got = graft.operators.LoaderOps.lengthBucketsOf(docs)
        .collect().map(r => r.getLong(0) ->
          (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
        .toMap
      assert(got == expected, s"seed=$seed")

      // q146 model: straight per-doc arithmetic summed per window
      val winGot = graft.operators.PackingOps.windowLossOf(docs)
        .collect().map(r => r.getAs[Long]("window") -> r).toMap
      Seq(32L, 64L, 256L).foreach { w =>
        val lost = lens.map(l => math.max(0L, l.toLong - w)).sum
        val wins = lens.map(l => (l.toLong + w - 1) / w).sum
        val pad = wins * w - lens.map(_.toLong).sum
        val row = winGot(w)
        assert(row.getAs[Long]("lost_truncate") == lost,
          s"seed=$seed w=$w")
        assert(row.getAs[Long]("n_windows_split") == wins,
          s"seed=$seed w=$w")
        assert(row.getAs[Long]("pad_split") == pad, s"seed=$seed w=$w")
      }
    }
  }
}

/** charFold modulus mirror for driver-side reference hashing. */
private object TextOpsFold { val P = graft.operators.TextOps.FoldP }
