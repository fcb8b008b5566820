package graft

import java.io.ByteArrayOutputStream

import graft.sources.{RedisPsync, RedisRdb}

/** PSYNC capture decoding: FULLRESYNC disk-backed and diskless RDB
  * transfers, CONTINUE partial resync, and replication-offset
  * accounting over the trailing command stream.
  */
class RedisPsyncSpec extends SparkSuite {

  private val ReplId = "a" * 20 + "b" * 20

  private def rdbImage: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write("REDIS0011".getBytes("ascii"))
    out.write(0xfe); out.write(0) // SELECT 0
    out.write(0) // string type
    def str(s: String): Unit = {
      out.write(s.length & 0x3f); out.write(s.getBytes("utf-8"))
    }
    str("k1"); str("v1")
    out.write(0xff)
    out.toByteArray
  }

  private def ascii(s: String): Array[Byte] = s.getBytes("ascii")

  private def cmd(args: String*): Array[Byte] =
    args.map(a => s"$$${a.getBytes("utf-8").length}\r\n$a\r\n")
      .mkString(s"*${args.size}\r\n", "", "").getBytes("utf-8")

  private def concat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  test("full resync with disk-backed RDB and offset accounting") {
    val rdb = rdbImage
    val set = cmd("SET", "k2", "v2")
    val del = cmd("DEL", "k1")
    val capture = concat(
      ascii("+OK\r\n"), // handshake reply noise
      ascii(s"+FULLRESYNC $ReplId 1000\r\n"),
      ascii(s"$$${rdb.length}\r\n"), rdb, // no trailing CRLF
      set, del)
    val got = RedisPsync.decode(capture)
    assert(got.replId == ReplId && got.initialOffset == 1000L)
    assert(!got.partial)
    assert(got.snapshot == Seq(
      RedisRdb.Entry(0, "k1", "string", "", "v1", None)))
    assert(got.commands.map(_._1) == Seq(
      Seq("SET", "k2", "v2"), Seq("DEL", "k1")))
    // master offset advances one byte per command-stream byte
    assert(got.commands.map(_._2) == Seq(
      1000L + set.length, 1000L + set.length + del.length))
  }

  test("diskless RDB transfer via $EOF delimiter") {
    val rdb = rdbImage
    val delim = "0123456789" * 4
    val capture = concat(
      ascii(s"+FULLRESYNC $ReplId 7\r\n"),
      ascii(s"$$EOF:$delim\r\n"), rdb, ascii(delim),
      cmd("SET", "x", "1"))
    val got = RedisPsync.decode(capture)
    assert(got.snapshot.map(_.key) == Seq("k1"))
    assert(got.commands.map(_._1) == Seq(Seq("SET", "x", "1")))
  }

  test("partial resync: CONTINUE goes straight to commands") {
    val capture = concat(
      ascii("+PONG\r\n"),
      ascii(s"+CONTINUE $ReplId\r\n"),
      cmd("HSET", "h", "f", "v"))
    val got = RedisPsync.decode(capture)
    assert(got.partial && got.replId == ReplId)
    assert(got.snapshot.isEmpty)
    assert(got.commands.map(_._1) == Seq(Seq("HSET", "h", "f", "v")))
  }

  test("multi-byte UTF-8 command payloads keep the offset exact") {
    val payload = "héllo→世界"
    val c = cmd("SET", "k", payload)
    val capture = concat(
      ascii(s"+FULLRESYNC $ReplId 0\r\n"),
      ascii(s"$$${rdbImage.length}\r\n"), rdbImage, c)
    val got = RedisPsync.decode(capture)
    assert(got.commands == Seq(
      (Seq("SET", "k", payload), c.length.toLong)))
  }

  test("truncated RDB payload fails loudly") {
    val rdb = rdbImage
    val capture = concat(
      ascii(s"+FULLRESYNC $ReplId 0\r\n"),
      ascii(s"$$${rdb.length + 50}\r\n"), rdb)
    intercept[IllegalArgumentException] {
      RedisPsync.decode(capture)
    }
  }

  test("cluster nodes parse: masters with ranges, slaves/failed skipped") {
    import graft.sources.RedisClusterPsync
    val text =
      """07c37dfe 127.0.0.1:30004@31004 slave e7d1eecc 0 1 4 connected
        |67ed2db8 127.0.0.1:30002@31002 master - 0 1 2 connected 5461-10922
        |dead1234 127.0.0.1:30005@31005 master,fail - 0 1 5 connected
        |e7d1eecc 127.0.0.1:30001@31001 myself,master - 0 0 1 connected 0-5460 16000 [99->-67ed2db8]
        |""".stripMargin
    val nodes = RedisClusterPsync.parseClusterNodes(text)
    assert(nodes.map(_.id) == Seq("67ed2db8", "e7d1eecc"))
    assert(nodes.head.address == "127.0.0.1:30002")
    val self = nodes(1)
    // two owned ranges; the importing [..] marker is not ownership
    assert(self.ranges == Seq(
      graft.sinks.RedisReshard.SlotRange(0, 5460, "e7d1eecc"),
      graft.sinks.RedisReshard.SlotRange(16000, 16000, "e7d1eecc")))
  }

  test("multi-shard composition: slot tags, per-shard offsets, " +
      "resharded key flagged on the losing shard") {
    import graft.sources.RedisClusterPsync
    import graft.sources.RedisClusterPsync.Node
    import graft.sinks.RedisReshard.{slotOf, SlotRange}

    // two keys + one migrating key; build the topology AROUND their
    // actual CRC16 slots so each shard owns exactly its key
    val (kA, kB, kMoved) = ("user:1", "user:2", "cart:9")
    val (sA, sB, sM) = (slotOf(kA), slotOf(kB), slotOf(kMoved))
    assert(Set(sA, sB, sM).size == 3) // distinct slots, else repick
    // POST-reshard topology: B owns the moved key's slot
    val nodeA = Node("nodeA", "10.0.0.1:6379",
      Seq(SlotRange(sA, sA, "nodeA")))
    val nodeB = Node("nodeB", "10.0.0.2:6379",
      Seq(SlotRange(sB, sB, "nodeB"), SlotRange(sM, sM, "nodeB")))

    // shard A: snapshot holds kA; stream DELs the migrated-away key
    val capA = concat(
      ascii(s"+FULLRESYNC $ReplId 500\r\n"),
      ascii(s"$$${rdbImage.length}\r\n"), rdbImage,
      cmd("SET", kA, "v1"), cmd("DEL", kMoved))
    // shard B: partial resync; the moved key lands here
    val capB = concat(
      ascii(s"+CONTINUE $ReplId\r\n"),
      cmd("SET", kB, "v2"), cmd("SET", kMoved, "v9"))

    val events = RedisClusterPsync.compose(
      Seq(nodeA -> capA, nodeB -> capB))

    // snapshot entry rides shard A at its initial offset
    val snap = events.filter(_.cmd == "RDB")
    assert(snap.map(e => (e.nodeId, e.key, e.replOffset)) ==
      Seq(("nodeA", "k1", 500L)))
    // rdbImage's k1 is not in A's ranges → surfaces as foreign too
    assert(snap.head.owned == (slotOf("k1") == sA))

    val byKey = events.filter(_.cmd != "RDB")
      .groupBy(_.key)
    assert(byKey(kA).map(e => (e.nodeId, e.rowType, e.owned)) ==
      Seq(("nodeA", "insert", true)))
    assert(byKey(kB).map(e => (e.nodeId, e.rowType, e.owned)) ==
      Seq(("nodeB", "insert", true)))
    // the resharded key: losing shard's DEL flagged foreign against
    // the post-move topology, gaining shard's SET owned
    assert(byKey(kMoved).map(e => (e.nodeId, e.rowType, e.owned)) ==
      Seq(("nodeA", "delete", false), ("nodeB", "insert", true)))

    // per-shard replication offsets advance independently
    val pos = RedisClusterPsync.resumePositions(events)
    assert(pos(("nodeA", "10.0.0.1:6379")) ==
      500L + cmd("SET", kA, "v1").length + cmd("DEL", kMoved).length)
    assert(pos(("nodeB", "10.0.0.2:6379")) ==
      cmd("SET", kB, "v2").length + cmd("SET", kMoved, "v9").length)

    // composed frame: per-key order column (node_id, repl_offset)
    val df = RedisClusterPsync.toDF(spark,
      Seq(nodeA -> capA, nodeB -> capB))
    assert(df.columns.toSeq == Seq("node_id", "address", "slot",
      "owned", "db", "cmd", "key", "row_type", "fields", "repl_offset"))
    assert(df.count() == events.size.toLong)
    assert(df.filter("owned = false").count() ==
      events.count(!_.owned).toLong)
  }
}
