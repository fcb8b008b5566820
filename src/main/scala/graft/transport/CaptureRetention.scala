package graft.transport

import graft.infra.Fs

/** Retention sweep for live-lane capture dirs — the missing half of a
  * resident deployment: the pumps append the full replication history
  * into capture segments, and without a sweep the dir grows until the
  * disk fills (the reference keeps only its bounded in-memory queue,
  * `dt-common/src/meta/dt_queue.rs:13-117`, plus the server-side logs
  * — a file-capture design needs an explicit purge instead).
  *
  * Safety rests on two existing properties:
  *  - [[graft.sources.ChangelogSource]] offsets are segment NAMES and
  *    planning filters `name > offset` against the live listing, so
  *    deleting anything ≤ the checkpoint's committed offset skips
  *    nothing and reprocesses nothing (documented purge tolerance).
  *  - The redis/mongo landing loops record consumed segments by name;
  *    a consumed segment was landed idempotently (seg=<name> overwrite)
  *    and never re-read.
  *
  * One invariant the sweep must PRESERVE: segment-name monotonicity.
  * A restarted pump continues numbering after the highest EXISTING
  * name ([[SegmentNames.lastIndex]]); purging every segment would
  * reset the count to zero and the recycled names would sort ≤ the
  * checkpoint offset — silently never consumed. So the sweep always
  * keeps the newest segment per name prefix, bounding the dir at
  * O(unconsumed + #prefixes) instead of O(history).
  */
object CaptureRetention {

  private val Prefixed = """^(.*)\.\d+\.log$""".r

  /** The last fully-consumed segment name committed by the streaming
    * checkpoint — the purge watermark for the mysql/pg lanes. Reads
    * the newest entry in `commits/` (an offsets file alone is a batch
    * that may still be mid-flight) and parses the matching single
    * source offset. None before the first commit.
    *
    * Spark checkpoint layout: `offsets/<batchId>` = version line +
    * metadata JSON + one offset line per source; `commits/<batchId>`
    * marks the batch durable.
    */
  def committedSegment(checkpointDir: String): Option[String] = {
    val commits = s"$checkpointDir/commits"
    if (!Fs.exists(commits)) return None
    val latest = Fs.listNames(commits)
      .flatMap(_.toLongOption).maxOption
    latest.flatMap { id =>
      val f = s"$checkpointDir/offsets/$id"
      if (!Fs.exists(f)) None
      else Fs.readLines(f).filter(_.nonEmpty).lastOption.flatMap {
        case graft.sources.ChangelogOffset.SegmentJson(name) =>
          Option(name).filter(_.nonEmpty)
        case _ => None
      }
    }
  }

  /** Names the sweep must keep regardless of consumption: the newest
    * segment of each prefix family (`binlog.`/`psync.`/
    * `<nodeId>.psync.` …) — the monotone-numbering anchors.
    */
  private def anchors(names: Seq[String]): Set[String] =
    names.collect { case n @ Prefixed(p) => (p, n) }
      .groupBy(_._1).values.map(_.map(_._2).max).toSet

  /** Delete published segments with name ≤ `upto` (the mysql/pg lanes'
    * checkpoint watermark), keeping the per-prefix anchors. Returns
    * the deleted names.
    */
  def sweepUpto(captureDir: String, upto: String): Seq[String] = {
    if (upto.isEmpty) return Nil
    val names = list(captureDir)
    val keep = anchors(names)
    val victims = names.filter(n => n <= upto && !keep(n))
    victims.foreach(n => Fs.delete(s"$captureDir/$n"))
    victims
  }

  /** Delete published segments whose names are in `consumed` (the
    * redis/mongo lanes' landed set), keeping the per-prefix anchors.
    * Returns the deleted names.
    */
  def sweepConsumed(captureDir: String,
      consumed: Set[String]): Seq[String] = {
    if (consumed.isEmpty) return Nil
    val names = list(captureDir)
    val keep = anchors(names)
    val victims = names.filter(n => consumed(n) && !keep(n))
    victims.foreach(n => Fs.delete(s"$captureDir/$n"))
    victims
  }

  /** Published segments only — `.tmp` stages are in-flight publishes
    * and everything else in the dir is not a segment.
    */
  private def list(captureDir: String): Seq[String] =
    if (!Fs.exists(captureDir)) Nil
    else Fs.listNames(captureDir).filter(_.endsWith(".log")).sorted
}
