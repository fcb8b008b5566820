package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout,
  OutputMode}

import graft.functions.GraftFunctions

/** Streaming MinHash near-dup detection — the stream-time variant of
  * q35/q45: documents arrive in micro-batches and each is judged
  * against everything seen so far, WITHOUT ever joining the stream to
  * a growing corpus table. The LSH invariant does the bounding: a
  * near-dup pair (est. Jaccard ≥ threshold) collides in at least one
  * of the signature bands with high probability, so per-band state
  * keyed by the band bucket holds only that bucket's members, and a
  * new document is compared against its ≤`MaxBucketMembers` bucket
  * peers — never the corpus.
  *
  * Scale shape: state lives in the streaming state store (RocksDB at
  * production scale), partitioned by (band, bucket) — the same keys
  * the batch LSH shuffles on — so state access is local to the task
  * that owns the bucket. Hot buckets cap at `MaxBucketMembers`
  * members (oldest kept: the earliest doc is the canonical one under
  * smallest-id election, so evicting NEWER members loses only
  * already-flagged redundancy, and the cap bounds per-key state the
  * way the reference bounds its buffers).
  *
  * Verdicts are per (doc, band); a doc is a duplicate iff ANY band
  * flags it ([[dupDocs]] reduces verdicts per micro-batch). Ties and
  * ordering are deterministic: within a batch, bucket members are
  * processed in doc-id order, and the match reported is the earliest
  * (smallest id) qualifying peer.
  */
object StreamingNearDup {

  final val Perms = 8
  final val Bands = 4
  final val RowsPerBand = 2
  final val Threshold = 0.5
  final val MaxBucketMembers = 64

  /** One band observation of one document's signature. */
  final case class DocBand(docId: Long, band: Int, bucket: String,
      sig: Seq[Long])

  final case class BucketState(members: Seq[(Long, Seq[Long])])

  /** dupOf = -1 when this band found no qualifying peer. */
  final case class BandVerdict(docId: Long, band: Int, dupOf: Long,
      estJaccard: Double)

  /** Per-bucket state transition. Visible for deterministic unit
    * tests; the estimate compares FULL signatures (all `Perms`
    * minima), the band key only routes.
    */
  def transition(key: (Int, String), events: Iterator[DocBand],
      state: GroupState[BucketState]): Iterator[BandVerdict] = {
    val evs = events.toSeq.sortBy(_.docId)
    if (evs.isEmpty) return Iterator.empty
    var members = state.getOption.map(_.members).getOrElse(Seq.empty)
    val out = evs.map { d =>
      // skip the doc's own earlier self: under at-least-once delivery a
      // redelivered document must not be flagged as its own duplicate
      val qualifying = members.iterator
        .filter { case (id, _) => id != d.docId }
        .map { case (id, sig) =>
          val n = math.min(sig.length, d.sig.length)
          var m = 0; var i = 0
          while (i < n) { if (sig(i) == d.sig(i)) m += 1; i += 1 }
          (id, m.toDouble / Perms)
        }.filter(_._2 >= Threshold).toSeq
      val verdict = if (qualifying.isEmpty) {
        if (members.size < MaxBucketMembers &&
            !members.exists(_._1 == d.docId))
          members :+= (d.docId, d.sig)
        BandVerdict(d.docId, d.band, -1L, 0.0)
      } else {
        val (id, est) = qualifying.minBy(_._1)
        BandVerdict(d.docId, d.band, id, est)
      }
      verdict
    }
    state.update(BucketState(members))
    out.iterator
  }

  /** Text → per-band signature rows: distinct word-5-gram hashes →
    * 8-permutation MinHash → 4 bands of 2, bucket = the band's minima
    * rendered as the routing key. All three stages are the native
    * codegen expressions the batch path uses, so stream and batch
    * fingerprints agree exactly.
    */
  def toBands(docs: DataFrame): Dataset[DocBand] = {
    val withSig = docs.toDF("docId", "text")
      .select(col("docId"),
        GraftFunctions.minhashSig(
          GraftFunctions.shingleHashes(col("text"))).as("sig"))
    val bands = (0 until Bands).map { b =>
      withSig.select(col("docId"), lit(b).as("band"),
        concat_ws(":",
          slice(col("sig"), b * RowsPerBand + 1, RowsPerBand))
          .as("bucket"),
        col("sig"))
    }.reduce(_ unionByName _)
    implicit val enc = Encoders.product[DocBand]
    bands.as[DocBand]
  }

  /** Wire the detector over a (possibly streaming) band set. */
  def detect(bands: Dataset[DocBand]): Dataset[BandVerdict] =
    bands.groupByKey(d => (d.band, d.bucket))(
        Encoders.tuple(Encoders.scalaInt, Encoders.STRING))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.NoTimeout)(transition)(
        Encoders.product[BucketState], Encoders.product[BandVerdict])

  def apply(docs: DataFrame): Dataset[BandVerdict] = detect(toBands(docs))

  /** Batch-side reduction: one row per flagged doc with its canonical
    * (smallest qualifying) peer.
    */
  def dupDocs(verdicts: DataFrame): DataFrame =
    verdicts.filter(col("dupOf") >= 0)
      .groupBy(col("docId"))
      .agg(min(col("dupOf")).as("dup_of"),
        max(col("estJaccard")).as("est_jaccard"))
}
