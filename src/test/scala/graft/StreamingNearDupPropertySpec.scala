package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.streaming.StreamingNearDup
import graft.streaming.StreamingNearDup.{BandVerdict, BucketState,
  DocBand}

/** Pure-transition invariants of the streaming near-dup detector under
  * randomized arrival batches (fixed seeds — the scalatest-scalacheck
  * bridge isn't in the offline cache): bounded state, verdict
  * determinism regardless of within-batch arrival order, and the
  * canonical-peer rule (earliest qualifying id, never self, never a
  * later doc).
  */
class StreamingNearDupPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  // signatures drawn from a tiny alphabet so collisions are common
  private val sigGen: Gen[Seq[Long]] =
    Gen.listOfN(StreamingNearDup.Perms, Gen.choose(0L, 3L)).map(_.toSeq)

  private val batchGen: Gen[Seq[DocBand]] = for {
    n <- Gen.choose(1, 40)
    docs <- Gen.listOfN(n, sigGen)
  } yield docs.zipWithIndex.map { case (s, i) =>
    DocBand(i.toLong, 0, "bucket", s)
  }

  /** Drive the transition directly with a fake state holder. */
  private def drive(batches: Seq[Seq[DocBand]]): Seq[BandVerdict] = {
    var st: Option[BucketState] = None
    val out = Seq.newBuilder[BandVerdict]
    batches.foreach { b =>
      val state = new FakeGroupState(st)
      out ++= StreamingNearDup.transition((0, "bucket"), b.iterator,
        state)
      st = state.current
    }
    out.result()
  }

  test("verdicts are order-independent within a batch and state is " +
      "bounded") {
    for (seed <- 1L to 150L) {
      val batch = sample(batchGen, seed)
      val verdicts = drive(Seq(batch))
      val shuffled = drive(Seq(sample(
        Gen.const(scala.util.Random.javaRandomToRandom(
          new java.util.Random(seed)).shuffle(batch)), seed)))
      assert(verdicts.sortBy(_.docId) == shuffled.sortBy(_.docId),
        s"seed=$seed")
      // canonical-peer rule: a flagged doc's peer is an EARLIER doc
      verdicts.filter(_.dupOf >= 0).foreach { v =>
        assert(v.dupOf < v.docId, s"seed=$seed $v")
        assert(v.estJaccard >= StreamingNearDup.Threshold)
      }
    }
  }

  test("state never exceeds the member cap and survivors are the " +
      "earliest non-dup docs") {
    for (seed <- 200L to 280L) {
      val b1 = sample(batchGen, seed)
      val b2 = sample(batchGen, seed + 5000)
        .map(d => d.copy(docId = d.docId + 1000))
      var st: Option[BucketState] = None
      Seq(b1, b2).foreach { b =>
        val state = new FakeGroupState(st)
        StreamingNearDup.transition((0, "bucket"), b.iterator, state)
          .foreach(_ => ())
        st = state.current
        val members = st.map(_.members).getOrElse(Seq.empty)
        assert(members.size <= StreamingNearDup.MaxBucketMembers)
        // members are exactly the docs that were NOT flagged (in order)
        assert(members.map(_._1) == members.map(_._1).sorted)
      }
    }
  }

  /** Minimal GroupState for driving the transition outside a stream. */
  private class FakeGroupState(initial: Option[BucketState])
      extends org.apache.spark.sql.streaming.GroupState[BucketState] {
    var current: Option[BucketState] = initial
    override def exists: Boolean = current.isDefined
    override def get: BucketState = current.get
    override def getOption: Option[BucketState] = current
    override def update(s: BucketState): Unit = current = Some(s)
    override def remove(): Unit = current = None
    override def hasTimedOut: Boolean = false
    override def setTimeoutDuration(ms: Long): Unit = ()
    override def setTimeoutDuration(d: String): Unit = ()
    override def setTimeoutTimestamp(ts: Long): Unit = ()
    override def setTimeoutTimestamp(ts: Long, add: String): Unit = ()
    override def setTimeoutTimestamp(
        ts: java.sql.Date): Unit = ()
    override def setTimeoutTimestamp(ts: java.sql.Date,
        add: String): Unit = ()
    override def getCurrentWatermarkMs(): Long = 0L
    override def getCurrentProcessingTimeMs(): Long = 0L
  }
}
