package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.infra.Monitoring
import graft.infra.Monitoring._

/** Monitor-module vectors — the percentile/by-second math of the
  * reference's time_window_counter.rs pinned against hand-computed
  * values on a fake clock, task-metric derivation incl. multi-lane
  * merges, prometheus text exposition, and the loopback /metrics
  * server end-to-end.
  */
class MonitoringSpec extends AnyFunSuite {

  private final class FakeClock(var ms: Long = 0L) {
    def fn: () => Long = () => ms
    def advanceSec(s: Long): Unit = ms += s * 1000L
  }

  test("time-window statistics: sum/min/max/avg by count and by second") {
    val clk = new FakeClock
    val c = new TimeWindowCounter(10L, 1000, clk.fn)
    c.add(10, 1).add(20, 2) // second 0
    clk.advanceSec(1)
    c.add(30, 1) // second 1
    clk.advanceSec(1)
    c.add(5, 1) // second 2
    val s = c.statistics()
    // entries (value,count): (10,1),(20,2) @0s, (30,1) @1s, (5,1) @2s
    assert(s.sum == 65L && s.count == 5L)
    assert(s.max == 30L && s.min == 5L)
    assert(s.avgByCount == 65L / 5L) // integral division, as in u64
    // per-second sums: 0s→30, 1s→30, 2s→5
    assert(s.maxBySec == 30L && s.minBySec == 5L)
    assert(s.avgBySec == (30L + 30L + 5L) / 3L) // 21, truncated
  }

  test("time-window statistics: expiry, sub-window, empty") {
    val clk = new FakeClock
    val c = new TimeWindowCounter(10L, 1000, clk.fn)
    c.add(100, 1)
    clk.advanceSec(2)
    c.add(7, 1)
    // sub-window of 2s sees only the last entry
    val sub = c.statisticsInWindow(2L)
    assert(sub.sum == 7L && sub.count == 1L && sub.min == 7L)
    // advance so the first entry ages out of the 10s window
    clk.advanceSec(9) // first entry elapsed 11s, second 9s
    val s = c.statistics()
    assert(s.sum == 7L && s.count == 1L && s.maxBySec == 7L)
    assert(c.hasLiveData)
    clk.advanceSec(2) // second entry elapsed 11s
    assert(!c.hasLiveData)
    assert(c.statistics() == WindowStats.empty.copy())
    assert(new TimeWindowCounter(10L, 1000, clk.fn).statistics() ==
      WindowStats.empty)
  }

  test("time-window add evicts expired and caps sub-counters") {
    val clk = new FakeClock
    val c = new TimeWindowCounter(10L, 3, clk.fn)
    (1 to 5).foreach(i => c.add(i.toLong, 1))
    // cap 3: only the last three sub-counters survive
    val s = c.statistics()
    assert(s.sum == 3L + 4L + 5L && s.count == 3L)
    // expiry on add: after the window passes, old entries are dropped
    // by the next add, not just skipped at read time
    clk.advanceSec(11)
    c.add(9, 1)
    val s2 = c.statistics()
    assert(s2.sum == 9L && s2.count == 1L)
  }

  test("gauge counter: add, set, integral average") {
    val g = new GaugeCounter
    g.add(10, 4).add(5, 1)
    assert(g.value == 15L && g.count == 5L && g.avgByCount == 3L)
    g.set(42)
    assert(g.value == 42L && g.avgByCount == 42L)
  }

  test("monitor flush lines render the reference log format") {
    val clk = new FakeClock
    val m = new Monitor("task1", "extractor", 10L, 1000, clk.fn)
    m.addBatchCounter(ExtractedRecords, 100, 1)
    m.addCounter(RtPerQuery, 12)
    m.setCounter(SinkedRecordTotal, 400)
    val lines = m.flushLines()
    assert(lines.contains("task1 | extractor | extracted_records | " +
      "sum=100 | avg_by_sec=100 | max_by_sec=100 | min_by_sec=100"))
    assert(lines.contains("task1 | extractor | rt_per_query | " +
      "sum=12 | avg=12 | max=12 | min=12"))
    assert(lines.contains(
      "task1 | extractor | sinked_records | latest=400"))
    // setCounter on a windowed type is a no-op (reference set_counter
    // only touches no-window counters)
    m.setCounter(ExtractedRecords, 9999)
    assert(m.windowStats(ExtractedRecords).get.sum == 100L)
  }

  test("task metrics: rates from by-second stats, multi-lane merge, " +
      "totals, progress clamp") {
    val clk = new FakeClock
    def monitor(desc: String) =
      new Monitor("t", desc, 10L, 1000, clk.fn)
    val ex = monitor("extractor")
    ex.addBatchCounter(ExtractedRecords, 100, 1)
    clk.advanceSec(1)
    ex.addBatchCounter(ExtractedRecords, 300, 1)
    ex.setCounter(PlanRecordTotal, 1000)
    // two sinker lanes: min of mins, max of maxes, pairwise avg
    val s1 = monitor("sinker"); val s2 = monitor("sinker")
    s1.addCounter(RtPerQuery, 10); s2.addCounter(RtPerQuery, 30)
    s1.setCounter(SinkedRecordTotal, 400)
    s2.setCounter(SinkedRecordTotal, 600)
    val pl = monitor("pipeline")
    pl.setCounter(QueuedRecordCurrent, 7)
    pl.setCounter(TimestampCounter, 123456L)
    val ck = monitor("checker")
    ck.addBatchCounter(RecordCount, 50, 1)
    ck.addBatchCounter(CheckerMissCount, 3, 1)
    ck.addBatchCounter(CheckerDiffCount, 1, 1)
    ck.setCounter(CheckerPending, 4)

    val m = TaskMetrics.calc(Seq("extractor" -> ex, "sinker" -> s1,
      "sinker" -> s2, "pipeline" -> pl, "checker" -> ck))
    // extractor: secs 0→100, 1→300
    assert(m("extractor_rps_min") == 100L)
    assert(m("extractor_rps_max") == 300L)
    assert(m("extractor_rps_avg") == 200L)
    assert(m("extractor_plan_records") == 1000L)
    // sinker lanes merged: rt 10 vs 30
    assert(m("sinker_rt_min") == 10L && m("sinker_rt_max") == 30L)
    assert(m("sinker_rt_avg") == 20L)
    assert(m("sinker_sinked_records") == 1000L) // 400 + 600 added
    assert(m("pipeline_queue_size") == 7L && m("timestamp") == 123456L)
    assert(m("checker_rps_max") == 50L)
    assert(m("checker_miss_total") == 3L)
    assert(m("checker_diff_total") == 1L)
    assert(m("checker_queue_size") == 4L)
    // progress
    assert(TaskMetrics.progress(200, 50).contains(25L))
    assert(TaskMetrics.progress(3, 5).contains(100L)) // clamped
    assert(TaskMetrics.progress(0, 5).isEmpty)
  }

  test("prometheus exposition: help/type/sample lines, labels, " +
      "value rendering") {
    val reg = new PrometheusRegistry(Map("task" -> "t\"1", "dc" -> "a"))
      .registerStandard(Some("snapshot"))
    reg.set("extractor_rps_max", 300.0)
    reg.set("progress", 25.0)
    val text = reg.exposition
    val lines = text.linesIterator.toSeq
    assert(lines.head ==
      "# HELP extractor_rps_max the max records per second of extractor")
    assert(lines(1) == "# TYPE extractor_rps_max gauge")
    // labels sorted by name, values escaped
    assert(lines(2) ==
      """extractor_rps_max{dc="a",task="t\"1"} 300""")
    // unset gauges expose 0; snapshot kind registers progress
    assert(text.contains("""progress{dc="a",task="t\"1"} 25"""))
    assert(text.contains(
      """extractor_plan_records{dc="a",task="t\"1"} 0"""))
    // cdc-only gauges are absent for snapshot kind
    assert(!text.contains("sinker_ddl_count"))
    // fractional values render as doubles, no labels → bare name
    val plain = new PrometheusRegistry()
    plain.register("x", "d").set("x", 1.5)
    assert(plain.exposition ==
      "# HELP x d\n# TYPE x gauge\nx 1.5\n")
  }

  test("loopback metrics server serves /metrics, /healthz, 404") {
    val reg = new PrometheusRegistry(Map("task" -> "t1"))
      .registerStandard()
    reg.set("sinker_rps_avg", 12345.0)
    val server = new MetricsServer(() => reg.exposition)
    try {
      def get(path: String): (Int, String, String) = {
        val url = java.net.URI.create(
          s"http://127.0.0.1:${server.boundPort}$path").toURL
        val conn = url.openConnection()
          .asInstanceOf[java.net.HttpURLConnection]
        conn.setRequestMethod("GET")
        val code = conn.getResponseCode
        val stream =
          if (code >= 400) conn.getErrorStream else conn.getInputStream
        val body = new String(stream.readAllBytes(), "UTF-8")
        (code, conn.getContentType, body)
      }
      val (code, ctype, body) = get("/metrics")
      assert(code == 200)
      assert(ctype == "text/plain; charset=utf-8; version=0.0.4")
      assert(body == reg.exposition)
      assert(body.contains("""sinker_rps_avg{task="t1"} 12345"""))
      val (hc, hct, hb) = get("/healthz")
      assert(hc == 200 && hct == "application/json")
      assert(hb == """{"status":"ok","service":"graft"}""")
      val (nc, _, nb) = get("/nope")
      assert(nc == 404 && nb.contains("Not Found"))
    } finally server.stop()
  }

  test("metrics ini section parses host, port, labels") {
    val task = graft.config.TaskConfig.fromIni(
      """[extractor]
        |extract_type=snapshot
        |url=/tmp/src
        |[sinker]
        |url=/tmp/dst
        |[metrics]
        |http_host=127.0.0.1
        |http_port=0
        |labels=task=demo, dc =west
        |""".stripMargin)
    val mc = task.metrics.get
    assert(mc.httpHost == "127.0.0.1" && mc.httpPort == 0)
    assert(mc.labels == Map("task" -> "demo", "dc" -> "west"))
    // absent section → no metrics
    assert(graft.config.TaskConfig.fromIni(
      "[extractor]\nextract_type=snapshot\n").metrics.isEmpty)
  }

  test("counter_time_window_secs: absent AND explicit 0 both fall back " +
      "to checkpoint_interval_secs (task_config.rs:1170-1171 — a " +
      "zero-width window would evict every counter immediately)") {
    def parse(pipeline: String) = graft.config.TaskConfig.fromIni(
      s"""[extractor]
         |url=/src
         |[sinker]
         |url=/dst
         |[pipeline]
         |$pipeline
         |""".stripMargin)
    val absent = parse("checkpoint_interval_secs=7")
    assert(absent.counterTimeWindowSecs == 7)
    val zero = parse("checkpoint_interval_secs=7\n" +
      "counter_time_window_secs=0")
    assert(zero.counterTimeWindowSecs == 7)
    val explicit = parse("checkpoint_interval_secs=7\n" +
      "counter_time_window_secs=42")
    assert(explicit.counterTimeWindowSecs == 42)
  }
}
