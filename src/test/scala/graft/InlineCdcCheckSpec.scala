package graft

import scala.collection.mutable

import org.scalatest.funsuite.AnyFunSuite

import graft.config.TaskConfig
import graft.sources.DbResumer
import graft.streaming.InlineCdcCheck
import graft.streaming.InlineCdcCheck._

/** Inline CDC check vectors: the config fail-fast table, deterministic
  * key-hash sampling, reconciliation of old defects by later events,
  * drop-oldest queue behavior, capped snapshots, and state persistence
  * through the resumer store (check.md + config.md contract).
  * The micro-batch wiring (write → check → reconcile through
  * CdcPipeline) is in [[InlineCdcCheckPipelineSpec]].
  */
class InlineCdcCheckSpec extends AnyFunSuite {

  private def parsed(ini: String): TaskConfig.Parsed =
    TaskConfig.parseIni(ini)

  private val okIni =
    """[extractor]
      |extract_type=cdc
      |[sinker]
      |sink_type=write
      |db_type=pg
      |[parallelizer]
      |parallel_type=rdb_merge
      |[checker]
      |enable=true
      |sample_rate=100
      |check_log_dir=/tmp/graft-inline-check
      |check_log_max_rows=2
      |max_retries=7
      |""".stripMargin

  test("config: defaults, forced zero retries, absent section disables") {
    val cfg = InlineCdcCheck.fromIni(parsed(okIni)).get
    assert(cfg.maxRetries == 0) // ini said 7 — forced, config.md
    assert(cfg.sampleRate == Some(100))
    assert(cfg.checkLogMaxRows == 2)
    assert(InlineCdcCheck.fromIni(parsed("[extractor]\na=b")).isEmpty)
    // empty check_log_dir falls back to runtime log_dir/check
    val noDir = okIni.replace("check_log_dir=/tmp/graft-inline-check",
      "") + "\n[runtime]\nlog_dir=/var/log/t1\n"
    assert(InlineCdcCheck.fromIni(parsed(noDir)).get.checkLogDir ==
      "/var/log/t1/check")
  }

  test("config: the fail-fast decision table (ConfigError rows)") {
    def fails(mutate: String => String): Unit = {
      intercept[ConfigError] {
        InlineCdcCheck.fromIni(parsed(mutate(okIni)))
      }: Unit
    }
    fails(_.replace("enable=true", "enabled=yes"))
    fails(_.replace("[checker]", "[pipeline]\npipeline_type=http\n[checker]"))
    fails(_.replace("sink_type=write", "sink_type=dummy"))
    fails(_.replace("parallel_type=rdb_merge", "parallel_type=serial"))
    fails(_.replace("db_type=pg", "db_type=starrocks"))
    fails(_.replace("[checker]", "[checker]\nurl=mysql://other"))
    fails(_.replace("sample_rate=100", "sample_rate=0"))
    fails(_.replace("sample_rate=100", "sample_rate=101"))
  }

  test("key-hash sampling is deterministic per key and respects rate") {
    assert(sampled(0L, Some(1)))          // NULL-key hash always checks
    assert(sampled(12345L, None))
    val keys = (1 to 1000).map(i => 31L + i * 7919L)
    val r25 = keys.count(h => sampled(h, Some(25)))
    assert(r25 > 150 && r25 < 350)
    keys.foreach { h =>
      assert(sampled(h, Some(25)) == sampled(h, Some(25)))
    }
    // negative hashes still land in [0, 100)
    assert(sampled(-7L, Some(100)) && !sampled(-7L, None) == false)
  }

  test("reconciliation: a later consistent event cancels an old diff") {
    val cfg = InlineCdcCheck.fromIni(parsed(okIni)).get
    val c = new Checker(cfg)
    val target = mutable.Map(
      "t1|id=1" -> Map("id" -> "1", "v" -> "WRONG"))
    def fetch(table: String, row: Map[String, String],
        ids: Seq[String]): Option[Map[String, String]] =
      target.get(s"$table|id=${row("id")}")

    // batch 0: upsert id=1 expected v=A (target has WRONG), delete id=2
    // (target correctly absent), insert id=3 (target missed it)
    c.offer(QueuedBatch(0L, "t1", Seq("id"), Seq(
      (Map("id" -> "1", "v" -> "A"), "upsert"),
      (Map("id" -> "2"), "delete"),
      (Map("id" -> "3", "v" -> "C"), "upsert"))))
    val r0 = c.drain(fetch).head
    assert(r0 == BatchReport(0L, 3L, 0L, 1L, 1L, 0L))
    assert(c.state.map(d => (d.key, d.status)).toSet ==
      Set(("id=1", "DIFF"), ("id=3", "MISS")))

    // the sink catches up: target now holds the right values
    target("t1|id=1") = Map("id" -> "1", "v" -> "B")
    target("t1|id=3") = Map("id" -> "3", "v" -> "C")
    // batch 1 re-touches both keys with the new expected state
    c.offer(QueuedBatch(1L, "t1", Seq("id"), Seq(
      (Map("id" -> "1", "v" -> "B"), "upsert"),
      (Map("id" -> "3", "v" -> "C"), "upsert"))))
    val r1 = c.drain(fetch).head
    assert(r1.reconciled == 2L && r1.newMiss == 0L && r1.newDiff == 0L)
    assert(c.state.isEmpty)
  }

  test("queue: full queue drops the OLDEST pending batch, never blocks") {
    val cfg = InlineCdcCheck.fromIni(parsed(okIni)).get
      .copy(queueSize = 2)
    val c = new Checker(cfg)
    (0 to 2).foreach(i =>
      c.offer(QueuedBatch(i.toLong, "t", Seq("id"),
        Seq((Map("id" -> i.toString), "delete")))))
    assert(c.pending == 2 && c.droppedBatches == 1L)
    assert(c.warnings.head.contains("dropped pending batch 0"))
    val reports = c.drain((_, _, _) => None)
    assert(reports.map(_.batchId) == Seq(1L, 2L))
  }

  test("snapshot caps miss.log/diff.log at the LATEST max_rows") {
    val dir = java.nio.file.Files
      .createTempDirectory("inline-check").toString
    val cfg = InlineCdcCheck.fromIni(parsed(okIni)).get
      .copy(checkLogDir = dir) // max rows 2
    val c = new Checker(cfg)
    (0 until 5).foreach { i =>
      c.offer(QueuedBatch(i.toLong, "t", Seq("id"),
        Seq((Map("id" -> i.toString, "v" -> "x"), "upsert"))))
    }
    c.drain((_, _, _) => None): Unit // all 5 MISS
    c.snapshot()
    val miss = java.nio.file.Files.readAllLines(
      java.nio.file.Paths.get(dir, "miss.log"))
    assert(miss.size == 2)
    assert(miss.get(0).contains("\"batch_id\":3") &&
      miss.get(1).contains("\"batch_id\":4"))
  }

  test("checker state persists through the resumer store and survives " +
      "restart without touching position rows") {
    val store = new DbResumer.FileStore(java.nio.file.Files
      .createTempDirectory("inline-check-store")
      .resolve("pos.log").toString)
    // a position row for the task, recorded by the resumer
    store.execute("INSERT INTO x VALUES (?, ?, ?, ?)",
      Seq("t9", "CdcDoing", "default_key", """{"lsn":"0/10"}"""))
    val cfg = InlineCdcCheck.fromIni(parsed(okIni)).get
    val c = new Checker(cfg, taskId = "t9", store = Some(store))
    c.offer(QueuedBatch(4L, "t1", Seq("id"),
      Seq((Map("id" -> "8", "v" -> "z"), "upsert"))))
    c.drain((_, _, _) => None): Unit

    // restart: a fresh checker over the same store recovers the defect
    val c2 = new Checker(cfg, taskId = "t9", store = Some(store))
    assert(c2.state == Seq(Defect("t1", "id=8", "MISS", 4L)))
    // the position row is intact under the original task id
    assert(store.query("SELECT ...", Seq("t9")) ==
      Seq(Seq("CdcDoing", "default_key", """{"lsn":"0/10"}""")))
  }
}
