package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandVerdict, DocBand}

/** Streaming MinHash near-dup: cross-batch state, determinism, bucket
  * bounding.
  */
class StreamingNearDupSpec extends SparkSuite {

  private def sig(xs: Long*): Seq[Long] = xs.toSeq

  private def bandsOf(docId: Long, s: Seq[Long]): Seq[DocBand] =
    (0 until StreamingNearDup.Bands).map { b =>
      val slice = s.slice(b * 2, b * 2 + 2)
      DocBand(docId, b, slice.mkString(":"), s)
    }

  test("near-dup arriving in a later batch is flagged from state") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val s1 = sig(1, 2, 3, 4, 5, 6, 7, 8)
    val s2 = sig(10, 20, 30, 40, 50, 60, 70, 80) // unrelated
    val s3 = sig(1, 2, 3, 4, 5, 6, 9, 9) // 6/8 = 0.75 vs doc 1
    val s4 = sig(11, 21, 31, 41, 51, 61, 71, 81) // unrelated to all

    val input = MemoryStream[DocBand]
    val q = StreamingNearDup.detect(input.toDS())
      .writeStream.outputMode("append")
      .format("memory").queryName("neardup_out").start()
    try {
      input.addData(bandsOf(1L, s1) ++ bandsOf(2L, s2): _*)
      q.processAllAvailable()
      input.addData(bandsOf(3L, s3) ++ bandsOf(4L, s4): _*)
      q.processAllAvailable()
      val verdicts = spark.table("neardup_out").as[BandVerdict]
        .collect().toSeq
      // batch 1: nothing to collide with
      assert(verdicts.filter(v => v.docId <= 2).forall(_.dupOf == -1L))
      // doc 3 shares bands 0,1,2 buckets with doc 1 → flagged there,
      // with the FULL-signature estimate
      val d3 = verdicts.filter(_.docId == 3L)
      assert(d3.filter(_.band <= 2).forall(v =>
        v.dupOf == 1L && v.estJaccard == 0.75))
      assert(d3.filter(_.band == 3).forall(_.dupOf == -1L))
      // doc 4 collides nowhere
      assert(verdicts.filter(_.docId == 4L).forall(_.dupOf == -1L))
      // batch reduction: exactly doc 3, canonical peer 1
      val dups = StreamingNearDup.dupDocs(
        spark.table("neardup_out")).collect()
      assert(dups.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
        Seq((3L, 1L)))
    } finally q.stop()
  }

  test("transition is deterministic and bounds bucket membership") {
    // exercise the pure transition through a batch flatMapGroupsWithState
    val sparkSession = spark
    import sparkSession.implicits._
    // 100 distinct docs in one bucket: only MaxBucketMembers retained
    val crowd = (1L to 100L).map(i =>
      DocBand(i, 0, "b", sig(i, i, i, i, i, i, i, i)))
    val out = StreamingNearDup.detect(crowd.toDS()).collect()
    assert(out.length == 100 && out.forall(_.dupOf == -1L))
    // an exact copy of doc 1 still matches (doc 1 was retained)
    val out2 = StreamingNearDup.detect(
      (crowd :+ DocBand(200L, 0, "b", sig(1, 1, 1, 1, 1, 1, 1, 1)))
        .toDS()).collect()
    val v200 = out2.filter(_.docId == 200L)
    assert(v200.length == 1 && v200.head.dupOf == 1L &&
      v200.head.estJaccard == 1.0)
    // at-least-once redelivery: a doc re-delivered after being admitted
    // to the bucket must NOT match its earlier self
    val redelivered = (crowd :+ DocBand(1L, 0, "b",
      sig(1, 1, 1, 1, 1, 1, 1, 1))).toDS()
    val v1 = StreamingNearDup.detect(redelivered).collect()
      .filter(_.docId == 1L)
    assert(v1.forall(_.dupOf == -1L),
      "redelivered doc flagged as duplicate of itself")
  }

  test("text pipeline: identical text collides in every band, " +
      "batch and stream fingerprints agree") {
    val sparkSession = spark
    import sparkSession.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "a completely different document about spark physical plans"),
      (3L, "the quick brown fox jumps over the lazy dog again and again"))
      .toDF("docId", "text")
    val verdicts = StreamingNearDup(docs).collect()
    val d3 = verdicts.filter(_.docId == 3L)
    assert(d3.length == StreamingNearDup.Bands)
    assert(d3.forall(v => v.dupOf == 1L && v.estJaccard == 1.0))
    assert(verdicts.filter(_.docId == 2L).forall(_.dupOf == -1L))
  }
}
