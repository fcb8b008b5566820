package graft

import java.nio.file.Files

import graft.infra.Fs
import graft.transport.CaptureRetention

/** The capture-retention sweep: checkpoint-watermark parsing, the
  * per-prefix monotonicity anchors, and the consumed-set sweep — the
  * bounded-disk half of a resident live lane (the end-to-end resident
  * drive with retention on lives in LiveCdcSpec).
  */
class CaptureRetentionSpec extends org.scalatest.funsuite.AnyFunSuite {

  private def tempDir(tag: String): String =
    Files.createTempDirectory(tag).toString

  test("committedSegment reads the NEWEST COMMITTED batch's offset — " +
      "not an uncommitted offsets file, not an older commit") {
    val cp = tempDir("ret-cp")
    Fs.writeString(s"$cp/offsets/0",
      "v1\n{\"batchWatermarkMs\":0}\n{\"segment\":\"binlog.000002.log\"}\n")
    Fs.writeString(s"$cp/offsets/1",
      "v1\n{\"batchWatermarkMs\":0}\n{\"segment\":\"binlog.000005.log\"}\n")
    // batch 1 planned but not yet durable: only batch 0 committed
    Fs.writeString(s"$cp/commits/0", "v1\n{}")
    assert(CaptureRetention.committedSegment(cp) ==
      Some("binlog.000002.log"))
    // batch 1 commits: the watermark advances
    Fs.writeString(s"$cp/commits/1", "v1\n{}")
    assert(CaptureRetention.committedSegment(cp) ==
      Some("binlog.000005.log"))
  }

  test("committedSegment is None before any commit, and for the " +
      "initial empty-name offset") {
    val cp = tempDir("ret-cp0")
    assert(CaptureRetention.committedSegment(cp).isEmpty)
    Fs.writeString(s"$cp/offsets/0",
      "v1\n{\"batchWatermarkMs\":0}\n{\"segment\":\"\"}\n")
    Fs.writeString(s"$cp/commits/0", "v1\n{}")
    assert(CaptureRetention.committedSegment(cp).isEmpty)
  }

  test("sweepUpto deletes committed-past segments but always keeps " +
      "the newest per prefix (restart numbering stays monotone)") {
    val dir = tempDir("ret-sweep")
    (1 to 5).foreach(i =>
      Fs.writeString(f"$dir/binlog.$i%06d.log", s"seg$i"))
    // everything committed: the anchor still survives
    val gone = CaptureRetention.sweepUpto(dir, "binlog.000005.log")
    assert(gone.sorted == (1 to 4).map(i => f"binlog.$i%06d.log"))
    assert(Fs.listNames(dir) == Seq("binlog.000005.log"))
    // a partially-committed dir keeps the uncommitted tail too
    (6 to 8).foreach(i =>
      Fs.writeString(f"$dir/binlog.$i%06d.log", s"seg$i"))
    CaptureRetention.sweepUpto(dir, "binlog.000006.log")
    assert(Fs.listNames(dir).sorted ==
      Seq("binlog.000007.log", "binlog.000008.log"))
  }

  test("sweepConsumed deletes only consumed names, keeps per-prefix " +
      "anchors across cluster namespaces, ignores .tmp stages") {
    val dir = tempDir("ret-cons")
    val names = Seq(
      "aaaa.psync.000001.log", "aaaa.psync.000002.log",
      "bbbb.psync.000001.log", "bbbb.psync.000002.log")
    names.foreach(n => Fs.writeString(s"$dir/$n", n))
    Fs.writeString(s"$dir/aaaa.psync.000003.log.tmp", "inflight")
    // every segment consumed: each prefix keeps its newest
    val gone = CaptureRetention.sweepConsumed(dir, names.toSet)
    assert(gone.sorted == Seq(
      "aaaa.psync.000001.log", "bbbb.psync.000001.log"))
    assert(Fs.listNames(dir).filter(_.endsWith(".log")).sorted == Seq(
      "aaaa.psync.000002.log", "bbbb.psync.000002.log"))
    // an unconsumed segment survives even when older ones are swept
    Fs.writeString(s"$dir/aaaa.psync.000003.log", "new")
    val gone2 = CaptureRetention.sweepConsumed(dir,
      Set("aaaa.psync.000002.log"))
    assert(gone2 == Seq("aaaa.psync.000002.log"))
    assert(Fs.listNames(dir).filter(_.endsWith(".log")).sorted == Seq(
      "aaaa.psync.000003.log", "bbbb.psync.000002.log"))
  }

  test("an empty watermark or empty consumed set sweeps nothing") {
    val dir = tempDir("ret-noop")
    Fs.writeString(s"$dir/binlog.000001.log", "x")
    assert(CaptureRetention.sweepUpto(dir, "").isEmpty)
    assert(CaptureRetention.sweepConsumed(dir, Set.empty).isEmpty)
    assert(Fs.listNames(dir) == Seq("binlog.000001.log"))
  }
}
