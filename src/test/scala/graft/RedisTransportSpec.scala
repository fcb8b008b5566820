package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RedisPsync, RedisRdb}
import graft.transport._

/** The Redis PSYNC dial-and-pump over [[FakeWire]] — the socket phase
  * of redis_psync_extractor.rs: AUTH/PING/REPLCONF handshake, full
  * and partial PSYNC, disk-backed and diskless RDB capture, command
  * tail with REPLCONF ACK offset accounting, and
  * reconnect-with-partial-resync. The captured segments decode through
  * the EXISTING RedisPsync.decode byte-for-byte.
  */
class RedisTransportSpec extends AnyFunSuite {
  import RedisReplicationPump.cmd

  private val ReplId = "a" * 20 + "b" * 20

  private def rdbImage: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("REDIS0011".getBytes("ascii"))
    out.write(0xfe); out.write(0)
    out.write(0)
    def str(s: String): Unit = {
      out.write(s.length & 0x3f); out.write(s.getBytes("utf-8"))
    }
    str("k1"); str("v1")
    out.write(0xff)
    out.toByteArray
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("ascii")

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  private def serveHandshake(wire: FakeWire,
      withAuth: Boolean = false): Unit = {
    if (withAuth) wire.serve(ascii("+OK\r\n"))
    wire.serve(ascii("+PONG\r\n"))
    wire.serve(ascii("+OK\r\n")) // REPLCONF listening-port
  }

  test("full sync: handshake, PSYNC ? -1, disk-backed RDB + command " +
      "tail captured verbatim and decodable; ACKs at the right offsets") {
    val rdb = rdbImage
    val set = cmd("SET", "k2", "v2")
    val del = cmd("DEL", "k1")
    val wire = new FakeWire
    serveHandshake(wire, withAuth = true)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 1000\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(set)
    wire.serve(del)

    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(password = "pw",
        ackEveryBytes = 10), // ack often so the spec observes them
      store, () => wire)
    // the tail has no natural end on a live master: stop when drained
    intercept[java.io.EOFException] {
      pump.runSession()
    }

    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("AUTH"))
    assert(sentStr.contains("PING"))
    assert(sentStr.contains("listening-port"))
    assert(sentStr.contains("PSYNC"))
    assert(sentStr.contains("?")) // full sync request
    // ACK offsets: master offset + command-stream bytes
    assert(sentStr.contains("ACK"))
    assert(sentStr.contains((1000L + set.length + del.length).toString))

    // the capture decodes through the production decoder
    val capture = store.bytesOf("psync.000001.log")
    val got = RedisPsync.decode(capture)
    assert(got.replId == ReplId && got.initialOffset == 1000L)
    assert(got.snapshot == Seq(
      RedisRdb.Entry(0, "k1", "string", "", "v1", None)))
    assert(got.commands.map(_._1) == Seq(
      Seq("SET", "k2", "v2"), Seq("DEL", "k1")))
    // resume state tracked
    assert(pump.position ==
      (ReplId, 1000L + set.length + del.length))
  }

  test("diskless RDB ($EOF delimiter) captures and decodes") {
    val rdb = rdbImage
    val delim = "0123456789" * 4
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 7\r\n"))
    wire.serve(ascii(s"$$EOF:$delim\r\n"))
    wire.serve(rdb)
    wire.serve(ascii(delim))
    wire.serve(cmd("SET", "x", "1"))
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(), store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    val got = RedisPsync.decode(store.bytesOf("psync.000001.log"))
    assert(got.snapshot.map(_.key) == Seq("k1"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "x", "1")))
  }

  test("reconnect requests partial resync at the tracked offset and " +
      "the CONTINUE tail appends") {
    val set1 = cmd("SET", "a", "1")
    val wire1 = new FakeWire
    serveHandshake(wire1)
    wire1.serve(ascii(s"+FULLRESYNC $ReplId 100\r\n"))
    val rdb = rdbImage
    wire1.serve(ascii(s"$$${rdb.length}\r\n"))
    wire1.serve(rdb)
    wire1.serve(set1)

    val set2 = cmd("SET", "b", "2")
    val wire2 = new FakeWire
    serveHandshake(wire2)
    wire2.serve(ascii(s"+CONTINUE $ReplId\r\n"))
    wire2.serve(set2)

    val wires = scala.collection.mutable.Queue[FakeWire](wire1, wire2)
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(maxReconnects = 3, baseBackoffMs = 1),
      store, () => wires.dequeue())
    val target = 100L + set1.length + set2.length
    pump.run(until = () => pump.position._2 >= target, sleep = _ => ())
    assert(pump.reconnects == 1)
    // the SECOND dial asked for a partial resync at the FIRST BYTE
    // NEEDED (tracked offset + 1, the replica convention)
    val sent2 = new String(wire2.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sent2.contains(ReplId))
    assert(sent2.contains((100L + set1.length + 1).toString))
    assert(!sent2.contains("?"))
    // both tails landed in the capture (same segment, appended)
    val got = RedisPsync.decode(store.bytesOf("psync.000001.log"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "a", "1")))
    val got2 = RedisPsync.decode(store.bytesOf("psync.000002.log"))
    assert(got2.partial)
    assert(got2.commands.map(_._1) == Seq(Seq("SET", "b", "2")))
  }

  test("handshake failures surface: bad AUTH, non-PONG ping") {
    val wire = new FakeWire
    wire.serve(ascii("-ERR invalid password\r\n"))
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(password = "wrong"),
      new MemorySegmentStore, () => wire)
    val e = intercept[IllegalArgumentException](pump.runSession())
    assert(e.getMessage.contains("AUTH"))
  }
}
