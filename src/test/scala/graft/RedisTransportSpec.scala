package graft

import java.io.ByteArrayOutputStream

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{RedisClusterPsync, RedisPsync, RedisRdb}
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

  test("bare '\\n' keepalives before the RDB header (BGSAVE pending) " +
      "are consumed, not captured — the segment still decodes") {
    val rdb = rdbImage
    val set = cmd("SET", "k2", "v2")
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii("\n")) // pre-reply keepalive
    wire.serve(ascii(s"+FULLRESYNC $ReplId 1000\r\n"))
    wire.serve(ascii("\n\n\n")) // master still BGSAVE-ing
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(set)
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(), store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    // the keepalives were DISCARDED: the capture starts at the reply
    // line and decodes end to end, offsets unaffected
    val capture = store.bytesOf("psync.000001.log")
    assert(capture(0) == '+')
    val got = RedisPsync.decode(capture)
    assert(got.snapshot.map(_.key) == Seq("k1"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "k2", "v2")))
    assert(pump.position == (ReplId, 1000L + set.length))
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

  test("time-based keepalive ACKs fire on the wall clock — during " +
      "the RDB bulk and on a quiet tail — not only per tail byte") {
    // a scripted clock that advances 600 ms per observation: with a
    // 1 s keepalive interval, every other clock check crosses the line
    var now = 0L
    val clock = () => { now += 600L; now }
    val rdb = rdbImage ++ Array.fill[Byte](200000)(0x00) // padded bulk
    val set = cmd("SET", "k2", "v2")
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 1000\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(set)
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config( // ackEveryBytes never reached
        ackEveryBytes = Long.MaxValue, keepaliveIntervalSecs = 1L,
        clockMs = clock),
      new MemorySegmentStore, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    val ackCount = sentStr.sliding(3).count(_ == "ACK")
    assert(ackCount >= 2, s"want time-based acks, got $ackCount")
    // the FULLRESYNC offset is adopted only after the RDB completes
    // (a drop mid-transfer must not CONTINUE past an unlanded
    // snapshot), so RDB-phase acks carry the previous resume offset
    assert(pump.position._2 == 1000L + cmd("SET", "k2", "v2").length)
  }

  test("a wire drop mid-RDB discards the truncated segment and does " +
      "NOT adopt the resync position — the reconnect re-requests a " +
      "full sync and the retry is cleanly decodable") {
    val rdb = rdbImage
    val wire1 = new FakeWire
    serveHandshake(wire1)
    wire1.serve(ascii(s"+FULLRESYNC $ReplId 1000\r\n"))
    wire1.serve(ascii(s"$$${rdb.length}\r\n"))
    wire1.serve(rdb.take(3)) // the transfer dies 3 bytes in
    val wire2 = new FakeWire
    serveHandshake(wire2)
    wire2.serve(ascii(s"+FULLRESYNC $ReplId 1500\r\n"))
    wire2.serve(ascii(s"$$${rdb.length}\r\n"))
    wire2.serve(rdb)
    wire2.serve(cmd("SET", "x", "1"))
    val wires = scala.collection.mutable.Queue(wire1, wire2)
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(maxReconnects = 3, baseBackoffMs = 1),
      store, () => wires.dequeue())
    val target = 1500L + cmd("SET", "x", "1").length
    pump.run(until = () => pump.position._2 >= target, sleep = _ => ())
    // the truncated capture never became a segment…
    assert(store.names == Seq("psync.000002.log"))
    // …the SECOND dial asked for a FULL sync again (position was not
    // adopted mid-transfer)…
    val sent2 = new String(wire2.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sent2.contains("PSYNC") && sent2.contains("?"))
    // …and the retry decodes cleanly end to end
    val got = RedisPsync.decode(store.bytesOf("psync.000002.log"))
    assert(got.initialOffset == 1500L)
    assert(got.snapshot.map(_.key) == Seq("k1"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "x", "1")))
  }

  test("a wire drop mid-COMMAND never captures the partial frame: " +
      "the segment stays command-aligned and decodable") {
    val rdb = rdbImage
    val set1 = cmd("SET", "a", "1")
    val set2 = cmd("SET", "b", "2")
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 100\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(set1)
    wire.serve(set2.take(set2.length - 4)) // dies mid-bulk-string
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(), store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    // only the COMPLETE command was captured and offset-counted
    assert(pump.position == (ReplId, 100L + set1.length))
    val got = RedisPsync.decode(store.bytesOf("psync.000001.log"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "a", "1")))
  }

  test("max_segment_secs: a low-volume tail rotates (publishes) on " +
      "the clock, the successor segment is independently decodable " +
      "via its +CONTINUE header") {
    var now = 0L
    val clock = () => { now += 600L; now }
    val rdb = rdbImage
    val set1 = cmd("SET", "a", "1")
    val set2 = cmd("SET", "b", "2")
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 100\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(set1)
    wire.serve(set2)
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(
        ackEveryBytes = Long.MaxValue,
        keepaliveIntervalSecs = 3600L, // isolate the rotation clock
        maxSegmentSecs = 1L, clockMs = clock),
      store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    // the 600 ms/step clock crosses the 1 s window between commands:
    // segment 1 published mid-session with the RDB + first command;
    // the rotated successor starts at a +CONTINUE line and decodes on
    // its own with the second command
    val names = store.names
    assert(names.contains("psync.000001.log") &&
      names.contains("psync.000002.log"), s"segments: $names")
    val got1 = RedisPsync.decode(store.bytesOf("psync.000001.log"))
    assert(got1.snapshot.map(_.key) == Seq("k1"))
    assert(got1.commands.map(_._1) == Seq(Seq("SET", "a", "1")))
    val got2 = RedisPsync.decode(store.bytesOf("psync.000002.log"))
    assert(got2.partial)
    assert(got2.commands.map(_._1).contains(Seq("SET", "b", "2")))
    // the published position advanced to cover the rotated segment
    assert(pump.publishedPosition._2 >= 100L + set1.length)
  }

  test("SELECT context survives a mid-tail rotation AND a restart: " +
      "the rotated/resumed segment replays SELECT so db attribution " +
      "never silently resets to 0") {
    var now = 0L
    val clock = () => { now += 600L; now }
    val rdb = rdbImage
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 100\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(cmd("SELECT", "5"))
    wire.serve(cmd("SET", "a", "1"))
    wire.serve(cmd("SET", "b", "2")) // lands AFTER the rotation
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(
        ackEveryBytes = Long.MaxValue,
        keepaliveIntervalSecs = 3600L,
        maxSegmentSecs = 1L, clockMs = clock),
      store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    val names = store.names
    assert(names.size >= 2, s"segments: $names")
    // the successor segment opens with +CONTINUE then the replayed
    // SELECT — its commands decode in db 5, not db 0
    val got2 = RedisPsync.decode(store.bytesOf(names(1)))
    assert(got2.partial)
    assert(got2.commands.map(_._1).head == Seq("SELECT", "5"),
      s"segment 2 commands: ${got2.commands.map(_._1)}")
    assert(pump.publishedDb == 5L)

    // restart: a NEW pump resuming with the persisted select_db
    // replays it at the head of the +CONTINUE session segment
    val wire2 = new FakeWire
    serveHandshake(wire2)
    wire2.serve(ascii(s"+CONTINUE $ReplId\r\n"))
    wire2.serve(cmd("SET", "c", "3"))
    val store2 = new MemorySegmentStore
    val pump2 = new RedisReplicationPump(
      RedisReplicationPump.Config(
        replId = ReplId, replOffset = pump.publishedPosition._2,
        startDb = pump.publishedDb,
        ackEveryBytes = Long.MaxValue,
        keepaliveIntervalSecs = 3600L),
      store2, () => wire2)
    intercept[java.io.EOFException](pump2.runSession())
    val resumed = RedisPsync.decode(store2.bytesOf(store2.names.head))
    assert(resumed.commands.map(_._1) ==
      Seq(Seq("SELECT", "5"), Seq("SET", "c", "3")))
  }

  test("max_segment_secs never ages a PING-only segment into junk: " +
      "an idle master's keepalives are captured but never publish a " +
      "data-free segment") {
    var now = 0L
    val clock = () => { now += 1100L; now }
    val rdb = rdbImage
    val wire = new FakeWire
    serveHandshake(wire)
    wire.serve(ascii(s"+FULLRESYNC $ReplId 100\r\n"))
    wire.serve(ascii(s"$$${rdb.length}\r\n"))
    wire.serve(rdb)
    wire.serve(cmd("SET", "a", "1"))
    // the stream goes idle: replication-stream PINGs only, each one
    // past the 1 s window
    (1 to 5).foreach(_ => wire.serve(cmd("PING")))
    val store = new MemorySegmentStore
    val pump = new RedisReplicationPump(
      RedisReplicationPump.Config(
        ackEveryBytes = Long.MaxValue,
        keepaliveIntervalSecs = 3600L,
        maxSegmentSecs = 1L, clockMs = clock),
      store, () => wire)
    intercept[java.io.EOFException](pump.runSession())
    // ONE rotation (the SET aged out); the PING tail stayed in the
    // open spool instead of publishing a junk segment per interval
    assert(store.names.size <= 2, s"junk segments: ${store.names}")
    val got1 = RedisPsync.decode(store.bytesOf("psync.000001.log"))
    assert(got1.commands.map(_._1).contains(Seq("SET", "a", "1")))
    // the PINGs were still captured and offset-counted
    assert(pump.position._2 ==
      100L + cmd("SET", "a", "1").length + 5 * cmd("PING").length)
  }

  test("cluster dial: CLUSTER NODES discovery fans one PSYNC pump " +
      "per master into node-prefixed segments with slot attribution") {
    val idA = "a" * 40
    val idB = "b" * 40
    // replicas and failed nodes must be filtered out of the topology
    val topology =
      s"""$idA 10.0.0.1:6379@16379 master - 0 0 1 connected 0-8191
         |$idB 10.0.0.2:6379@16379 master - 0 0 2 connected 8192-16383
         |${"c" * 40} 10.0.0.3:6379@16379 slave $idA 0 0 1 connected
         |""".stripMargin
    val seed = new FakeWire
    seed.serve(ascii(s"$$${topology.getBytes("UTF-8").length}\r\n"))
    seed.serve(ascii(topology))
    seed.serve(ascii("\r\n"))

    // CRC16 slots: "bar" → 5061 (node A's range), "foo" → 12182 (B's)
    def nodeWire(replId: String, key: String): FakeWire = {
      val w = new FakeWire
      serveHandshake(w)
      w.serve(ascii(s"+FULLRESYNC $replId 100\r\n"))
      val rdb = rdbImage
      w.serve(ascii(s"$$${rdb.length}\r\n"))
      w.serve(rdb)
      w.serve(cmd("SET", key, "v"))
      w
    }
    val wires = Map(
      "10.0.0.1:6379" -> nodeWire(idA, "bar"),
      "10.0.0.2:6379" -> nodeWire(idB, "foo"))

    val store = new MemorySegmentStore
    val pump = new RedisClusterPump(RedisClusterPump.Config(),
      store, () => seed, addr => wires(addr))
    val positions = pump.drainAll()

    // one prefixed namespace per master, monotone inside each
    assert(store.names == Seq(
      s"$idA.psync.000001.log", s"$idB.psync.000001.log"))
    // per-node resume positions advanced past the drained tails
    val byNode = positions.map { case (n, p) => n.id -> p }.toMap
    assert(byNode(idA)._1 == idA)
    assert(byNode(idA)._2 == 100L + cmd("SET", "bar", "v").length)
    assert(byNode(idB)._2 == 100L + cmd("SET", "foo", "v").length)

    // the existing compose layer slot-tags each shard's events and
    // confirms every key landed on its owning master
    val nodes = RedisClusterPsync.parseClusterNodes(topology)
    val shards = Seq(
      (nodes.find(_.id == idA).get,
        store.bytesOf(s"$idA.psync.000001.log")),
      (nodes.find(_.id == idB).get,
        store.bytesOf(s"$idB.psync.000001.log")))
    val events = RedisClusterPsync.compose(shards)
    val sets = events.filter(_.cmd == "SET")
    assert(sets.map(e => (e.key, e.nodeId)).toSet ==
      Set(("bar", idA), ("foo", idB)))
    assert(sets.forall(_.owned))
    assert(sets.find(_.key == "bar").get.slot == 5061)
    assert(sets.find(_.key == "foo").get.slot == 12182)

    // a second discovery+drain resumes each shard with +CONTINUE at
    // its own offset (no cross-shard confusion)
    val seed2 = new FakeWire
    seed2.serve(ascii(s"$$${topology.getBytes("UTF-8").length}\r\n"))
    seed2.serve(ascii(topology))
    seed2.serve(ascii("\r\n"))
    def contWire(replId: String, key: String): FakeWire = {
      val w = new FakeWire
      serveHandshake(w)
      w.serve(ascii(s"+CONTINUE $replId\r\n"))
      w.serve(cmd("SET", key, "v2"))
      w
    }
    val wires2 = Map(
      "10.0.0.1:6379" -> contWire(idA, "bar"),
      "10.0.0.2:6379" -> contWire(idB, "foo"))
    val pump2 = new RedisClusterPump(
      RedisClusterPump.Config(resume = byNode),
      store, () => seed2, addr => wires2(addr))
    pump2.drainAll()
    val sentA = new String(wires2("10.0.0.1:6379").sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentA.contains(idA) &&
      sentA.contains((byNode(idA)._2 + 1).toString))
    assert(store.names.count(_.startsWith(s"$idA.")) == 2)
  }

  test("cluster drain persists positions PER NODE: one unreachable " +
      "master late in the walk keeps the drained shards' offsets") {
    val idA = "a" * 40
    val idB = "b" * 40
    val topology =
      s"""$idA 10.0.0.1:6379@16379 master - 0 0 1 connected 0-8191
         |$idB 10.0.0.2:6379@16379 master - 0 0 2 connected 8192-16383
         |""".stripMargin
    val seed = new FakeWire
    seed.serve(ascii(s"$$${topology.getBytes("UTF-8").length}\r\n"))
    seed.serve(ascii(topology))
    seed.serve(ascii("\r\n"))
    val wireA = {
      val w = new FakeWire
      serveHandshake(w)
      w.serve(ascii(s"+FULLRESYNC $idA 100\r\n"))
      val rdb = rdbImage
      w.serve(ascii(s"$$${rdb.length}\r\n"))
      w.serve(rdb)
      w.serve(cmd("SET", "bar", "v"))
      w
    }
    val store = new MemorySegmentStore
    val pump = new RedisClusterPump(RedisClusterPump.Config(),
      store, () => seed,
      addr =>
        if (addr == "10.0.0.1:6379") wireA
        else throw new java.io.IOException(s"refused: $addr"))
    val seen = scala.collection.mutable.ArrayBuffer[
      (String, (String, Long))]()
    intercept[java.io.IOException] {
      pump.drainAll(onNode = (n, p) => { seen += (n.id -> p); () })
    }
    // node A's drain published and its advanced position reached the
    // callback BEFORE node B's dial failure — the caller can persist
    // it, so the next start +CONTINUEs A instead of re-capturing its
    // command range (which would double-apply non-idempotent ops in
    // the state fold)
    assert(seen.map(_._1) == Seq(idA))
    assert(seen.head._2._1 == idA && seen.head._2._2 > 100L)
    assert(store.names == Seq(s"$idA.psync.000001.log"))
  }

  test("cluster RESIDENT: one supervised pump per master runs " +
      "concurrently, a mid-run master drop is re-dialed with partial " +
      "resync, and the landing composes identically to a drain") {
    val idA = "a" * 40
    val idB = "b" * 40
    val topology =
      s"""$idA 10.0.0.1:6379@16379 master - 0 0 1 connected 0-8191
         |$idB 10.0.0.2:6379@16379 master - 0 0 2 connected 8192-16383
         |""".stripMargin
    def seedWire(): FakeWire = {
      val w = new FakeWire
      w.serve(ascii(s"$$${topology.getBytes("UTF-8").length}\r\n"))
      w.serve(ascii(topology))
      w.serve(ascii("\r\n"))
      w
    }
    val rdb = rdbImage
    def fullWire(replId: String, key: String): FakeWire = {
      val w = new FakeWire
      serveHandshake(w)
      w.serve(ascii(s"+FULLRESYNC $replId 100\r\n"))
      w.serve(ascii(s"$$${rdb.length}\r\n"))
      w.serve(rdb)
      w.serve(cmd("SET", key, "v"))
      w
    }
    // master A drops after its first tail command; the RE-DIAL is
    // answered with a partial resync continuing the stream
    def contWire(replId: String, key: String): FakeWire = {
      val w = new FakeWire
      serveHandshake(w)
      w.serve(ascii(s"+CONTINUE $replId\r\n"))
      w.serve(cmd("SET", key, "v2"))
      w
    }
    // keys chosen on the owning shards: "bar" → slot 5061 (A's
    // 0-8191), "foo" → 12182 (B's 8192-16383)
    val nodeWires = Map(
      "10.0.0.1:6379" -> scala.collection.mutable.Queue(
        fullWire(idA, "bar"), contWire(idA, "bar")),
      "10.0.0.2:6379" -> scala.collection.mutable.Queue(
        fullWire(idB, "foo")))
    def dialNode(addr: String): Wire = nodeWires.synchronized {
      val q = nodeWires(addr)
      if (q.nonEmpty) q.dequeue() else new FakeWire
    }

    val captureDir = java.nio.file.Files
      .createTempDirectory("cluster-res").toString
    val positions =
      scala.collection.concurrent.TrieMap[String, (String, Long)]()
    val offA = 100L + cmd("SET", "bar", "v").length +
      cmd("SET", "bar", "v2").length
    val offB = 100L + cmd("SET", "foo", "v").length
    val stop = () => positions.get(idA).exists(_._2 >= offA) &&
      positions.get(idB).exists(_._2 >= offB)
    val pump = new RedisClusterPump(
      RedisClusterPump.Config(maxReconnects = 50, baseBackoffMs = 1,
        maxBackoffMs = 5),
      new FsSegmentStore(captureDir), () => seedWire(), dialNode)
    pump.runResident(stop, positions,
      newStore = () => new FsSegmentStore(captureDir), pollMs = 50L)

    // per-node published positions advanced past BOTH of A's sessions
    assert(positions(idA)._1 == idA && positions(idA)._2 >= offA)
    assert(positions(idB)._2 >= offB)
    // the re-dial asked for a PARTIAL resync (the CONTINUE wire was
    // consumed) — supervision resumed, not re-dumped
    assert(nodeWires("10.0.0.1:6379").isEmpty)

    // the capture composes with slot attribution identical to a
    // sequential drain of the same streams
    val nodes = graft.sources.RedisClusterPsync
      .parseClusterNodes(topology)
    val names = graft.infra.Fs.listNames(captureDir)
      .filter(_.endsWith(".log")).sorted
    assert(names.count(_.startsWith(s"$idA.")) >= 2)
    assert(names.count(_.startsWith(s"$idB.")) >= 1)
    val shards = names.map { n =>
      val node = if (n.startsWith(s"$idA.")) nodes.find(_.id == idA)
        else nodes.find(_.id == idB)
      (node.get, graft.infra.Fs.readAllBytes(s"$captureDir/$n"))
    }
    val sets = graft.sources.RedisClusterPsync.compose(shards)
      .filter(_.cmd == "SET")
    assert(sets.map(e => (e.key, e.nodeId)) ==
      Seq(("bar", idA), ("bar", idA), ("foo", idB)) ||
      sets.map(e => (e.key, e.nodeId)).sortBy(_._2) ==
      Seq(("bar", idA), ("bar", idA), ("foo", idB)))
    assert(sets.forall(_.owned))
  }

  test("cluster RESIDENT with an unreachable auth surfaces the error " +
      "when NO shard made progress") {
    val idA = "a" * 40
    val topology =
      s"$idA 10.0.0.1:6379@16379 master - 0 0 1 connected 0-16383\n"
    def seedWire(): FakeWire = {
      val w = new FakeWire
      w.serve(ascii(s"$$${topology.getBytes("UTF-8").length}\r\n"))
      w.serve(ascii(topology))
      w.serve(ascii("\r\n"))
      w
    }
    val captureDir = java.nio.file.Files
      .createTempDirectory("cluster-err").toString
    // NO stop request: the error must surface from INSIDE the poll
    // loop once each shard's reconnect ladder has been re-fanned past
    // the bound — the r13 shape only rethrew at wind-down, so a
    // misconfigured task ran forever while looking healthy. The far
    // deadline is a safety net, not the trigger.
    val deadline = System.currentTimeMillis() + 60000
    val t0 = System.currentTimeMillis()
    val e = intercept[Throwable] {
      new RedisClusterPump(
        RedisClusterPump.Config(maxReconnects = 1, baseBackoffMs = 1,
          maxBackoffMs = 2),
        new FsSegmentStore(captureDir), () => seedWire(),
        _ => new FakeWire) // every node dial dies with zero progress
        .runResident(() => System.currentTimeMillis() > deadline,
          scala.collection.concurrent.TrieMap.empty,
          newStore = () => new FsSegmentStore(captureDir),
          pollMs = 20L)
    }
    assert(e.isInstanceOf[java.io.IOException] ||
      e.isInstanceOf[java.io.EOFException])
    assert(System.currentTimeMillis() - t0 < 30000,
      "error did not surface from inside the poll loop")
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
