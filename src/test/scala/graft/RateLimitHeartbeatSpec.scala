package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.infra.{Heartbeat, RateLimiter}
import graft.sinks.Applier

/** Token-bucket rate limiter (rate_limiter.rs semantics) and heartbeat
  * position writer (mysql_cdc_extractor.rs:468-576 shape), both driven
  * by fake clocks.
  */
class RateLimitHeartbeatSpec extends AnyFunSuite {

  private final class Clock(var nowNanos: Long = 0L) {
    def nanos(): Long = nowNanos
    def advanceSec(s: Double): Unit = nowNanos += (s * 1e9).toLong
  }

  test("bucket refills at rate, capped at burst capacity") {
    val c = new Clock
    val rl = new RateLimiter(100, nanoTime = c.nanos _)
    assert(rl.capacity == 100)
    assert(rl.available() == 100) // starts full
    assert(rl.tryAcquire(100))
    assert(!rl.tryAcquire(1)) // drained
    c.advanceSec(0.25)
    assert(rl.available() == 25) // 100/s × 0.25s
    c.advanceSec(10)
    assert(rl.available() == 100) // never beyond capacity
  }

  test("acquire blocks (sleeps) until tokens accrue") {
    val c = new Clock
    var sleptNs = 0L
    val rl = new RateLimiter(10, nanoTime = c.nanos _,
      sleepNanos = n => { sleptNs += n; c.advanceSec(n / 1e9) })
    assert(rl.acquire(10) == 0L) // burst available immediately
    val slept = rl.acquire(5) // needs 0.5s of refill
    assert(slept > 0 && sleptNs == slept)
    assert(math.abs(slept / 1e9 - 0.5) < 0.01)
  }

  test("zero rate means unlimited; over-capacity acquire errors") {
    val rl0 = new RateLimiter(0)
    assert(rl0.unlimited && rl0.acquire(1000000) == 0L)
    val rl = new RateLimiter(10)
    val e = intercept[IllegalArgumentException](rl.acquire(11))
    assert(e.getMessage.contains("exceeds max capacity"))
  }

  private final class BufSink extends Applier.StatementSink {
    val got = scala.collection.mutable.ArrayBuffer[Applier.StatementBatch]()
    override def execute(b: Applier.StatementBatch): Unit = got += b
  }

  test("heartbeat REPLACE carries both position pairs, keyed by server") {
    val sink = new BufSink
    val em = new Heartbeat.Emitter("db1", "hb", serverId = 7L, sink,
      intervalMs = 1000, clockMs = () => 0L)
    assert(em.maybeBeat(Heartbeat.Positions(
      "000012", 34L, "2024-01-01T00:00:00Z", "000011", 30L,
      "2024-01-01T00:00:00Z")))
    val b = sink.got.head
    assert(b.sql ==
      "REPLACE INTO `db1`.`hb` (server_id, update_timestamp, " +
        "received_segment, received_seq, received_timestamp, " +
        "flushed_segment, flushed_seq, flushed_timestamp) " +
        "VALUES (?, now(), ?, ?, ?, ?, ?, ?)")
    assert(b.rows == Seq(Seq(7L, "000012", 34L, "2024-01-01T00:00:00Z",
      "000011", 30L, "2024-01-01T00:00:00Z")))
    assert(Heartbeat.createTableSql("db1", "hb")
      .contains("PRIMARY KEY(server_id)"))
  }

  test("emitter gates on the interval: at most one beat per window") {
    val sink = new BufSink
    var now = 0L
    val em = new Heartbeat.Emitter("db", "hb", 1L, sink,
      intervalMs = 10000, clockMs = () => now)
    val p = Heartbeat.Positions("s", 1L, "t", "s", 1L, "t")
    assert(em.maybeBeat(p))
    now = 5000
    assert(!em.maybeBeat(p)) // inside the window: suppressed
    now = 10000
    assert(em.maybeBeat(p))
    assert(sink.got.size == 2)
  }
}
