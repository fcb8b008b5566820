package graft

import java.io.ByteArrayOutputStream

import graft.operators.NameFilter
import graft.sources.{RedisRdb, RedisResp}

/** Redis source: RDB binary parsing (length/string encodings, opcodes,
  * per-type entries, LZF) and RESP command-stream mapping.
  */
class RedisSourceSpec extends SparkSuite {

  /** Minimal RDB writer mirroring the format the parser reads. */
  private final class RdbBuilder {
    private val out = new ByteArrayOutputStream()
    out.write("REDIS0011".getBytes("ascii"))
    def byte(b: Int): this.type = { out.write(b); this }
    def len6(n: Int): this.type = byte(n & 0x3f) // 6-bit length
    def len14(n: Int): this.type =
      byte(0x40 | (n >> 8)).byte(n & 0xff)
    def str(s: String): this.type = {
      len6(s.length); out.write(s.getBytes("utf-8")); this
    }
    def int16Str(v: Short): this.type = // special encoding 1, LE
      byte(0xc1).byte(v & 0xff).byte((v >> 8) & 0xff)
    def lzfStr(raw: String, compressed: Array[Byte]): this.type = {
      byte(0xc3)
      len6(compressed.length)
      len6(raw.length)
      out.write(compressed); this
    }
    def selectDb(n: Int): this.type = byte(0xfe).len6(n)
    def expireMs(ms: Long): this.type = {
      byte(0xfc)
      (0 until 8).foreach(i => byte(((ms >> (8 * i)) & 0xff).toInt))
      this
    }
    def aux(k: String, v: String): this.type = byte(0xfa).str(k).str(v)
    def eof(): Array[Byte] = { out.write(0xff); out.toByteArray }
  }

  test("rdb: opcodes, string/list/set/hash entries, expiry binding") {
    val b = new RdbBuilder()
      .aux("redis-ver", "7.2.0")
      .selectDb(0)
      .byte(0).str("k1").str("v1") // plain string
      .expireMs(1700000000123L)
      .byte(0).str("k2").int16Str(300.toShort) // int-encoded, expiring
      .byte(0).str("k3").str("after") // expiry must NOT leak here
      .selectDb(2)
      .byte(4).str("h").len6(2).str("f1").str("x").str("f2").str("y")
      .byte(1).str("l").len6(2).str("a").str("b")
      .byte(2).str("s").len6(1).str("m")
    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "k1", "string", "", "v1", None),
      RedisRdb.Entry(0, "k2", "string", "", "300",
        Some(1700000000123L)),
      RedisRdb.Entry(0, "k3", "string", "", "after", None),
      RedisRdb.Entry(2, "h", "hash", "f1", "x", None),
      RedisRdb.Entry(2, "h", "hash", "f2", "y", None),
      RedisRdb.Entry(2, "l", "list", "0", "a", None),
      RedisRdb.Entry(2, "l", "list", "1", "b", None),
      RedisRdb.Entry(2, "s", "set", "m", "", None)))
  }

  test("rdb: lzf-compressed string round-trips") {
    // 'aaaaaaaaaa' (10×a): literal 'a', then back-ref len 9 at offset 1
    // ctrl for ref: len-2=7 → ctrl=(7<<5)|0=0xe0, ext byte 0, off byte 0
    val compressed = Array[Byte](0x00, 'a'.toByte, 0xe0.toByte, 0x00,
      0x00)
    assert(new String(RedisRdb.lzfDecompress(compressed, 10)) ==
      "a" * 10)
    val b = new RdbBuilder()
      .byte(0).str("big").lzfStr("a" * 10, compressed)
    assert(RedisRdb.parse(b.eof()) == Seq(
      RedisRdb.Entry(0, "big", "string", "", "a" * 10, None)))
  }

  test("rdb: 14-bit lengths and unsupported types fail loudly") {
    // key written with a 14-bit length header
    val b = new RdbBuilder().byte(0).len14(3)
      .byte('k').byte('e').byte('y').str("val")
    assert(RedisRdb.parse(b.eof()).head.key == "key")
    val bad = new RdbBuilder().byte(26).str("x") // beyond the known set
    val e = intercept[IllegalArgumentException](RedisRdb.parse(bad.eof()))
    assert(e.getMessage.contains("unsupported rdb value type 26"))
    // module v1 is not self-delimiting: loud, named failure
    val mod1 = new RdbBuilder().byte(6).str("m")
    val e6 = intercept[IllegalArgumentException](
      RedisRdb.parse(mod1.eof()))
    assert(e6.getMessage.contains("module v1"))
  }

  test("rdb: listpack family — hash/zset/set/quicklist2 + intset") {
    // listpack payload ["a", 5, "b", -3, 300]: 6-bit strs, 7-bit uint,
    // 13-bit negative int, 16-bit int; header total(4)+count(2) LE
    def lp(count: Int)(entries: Int*): Array[Byte] =
      (Array(0, 0, 0, 0, count & 0xff, count >> 8) ++ entries :+ 0xff)
        .map(_.toByte)
    val hashLp = lp(4)(
      0x81, 'a', 0x02, // "a"
      0x05, 0x01, // 5
      0x81, 'b', 0x02, // "b"
      0xdf, 0xfd, 0x01) // -3 (13-bit: 8189)
    val zsetLp = lp(2)(
      0x81, 'm', 0x02, // member "m"
      0xf1, 0x2c, 0x01, 0x01) // score 300 (16-bit LE)
    val setLp = lp(1)(0x07, 0x01) // {7}
    val listLp = lp(2)(0x81, 'x', 0x02, 0x81, 'y', 0x02)
    val intset = Array(2, 0, 0, 0, 2, 0, 0, 0, // width=2, count=2
      5, 0, 0xff, 0xff).map(_.toByte) // [5, -1]

    val b = new RdbBuilder()
    def blob(bytes: Array[Byte]): Unit = {
      b.len6(bytes.length)
      bytes.foreach(x => b.byte(x & 0xff))
    }
    b.byte(16).str("h"); blob(hashLp)
    b.byte(17).str("z"); blob(zsetLp)
    b.byte(20).str("s"); blob(setLp)
    b.byte(11).str("is"); blob(intset)
    // quicklist2: 2 nodes — packed listpack, then a plain node
    b.byte(18).str("l").len6(2)
    b.len6(2); blob(listLp) // container=2 (packed)
    b.len6(1).str("tail") // container=1 (plain)

    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "h", "hash", "a", "5", None),
      RedisRdb.Entry(0, "h", "hash", "b", "-3", None),
      RedisRdb.Entry(0, "z", "zset", "m", "300", None),
      RedisRdb.Entry(0, "s", "set", "7", "", None),
      RedisRdb.Entry(0, "is", "set", "5", "", None),
      RedisRdb.Entry(0, "is", "set", "-1", "", None),
      RedisRdb.Entry(0, "l", "list", "0", "x", None),
      RedisRdb.Entry(0, "l", "list", "1", "y", None),
      RedisRdb.Entry(0, "l", "list", "2", "tail", None)))
  }

  test("rdb: distributed read — one task per shard file") {
    val dir = java.nio.file.Files.createTempDirectory("graft-rdb")
    val shard0 = new RdbBuilder().byte(0).str("a").str("1").eof()
    val shard1 = new RdbBuilder().selectDb(1)
      .byte(0).str("b").str("2").eof()
    java.nio.file.Files.write(dir.resolve("shard0.rdb"), shard0)
    java.nio.file.Files.write(dir.resolve("shard1.rdb"), shard1)
    val df = RedisRdb.read(spark, dir.toString)
    import spark.implicits._
    val got = df.select("db", "key", "value").as[(Long, String, String)]
      .collect().toSet
    assert(got == Set((0L, "a", "1"), (1L, "b", "2")))
  }

  test("rdb: listpack 0xFFFF count sentinel walks to the terminator") {
    // listpack.c stores 65535 when the real count >= 2^16-1; the header
    // is then untrustworthy and parsing must walk to the 0xFF byte.
    val lp = (Array(0, 0, 0, 0, 0xff, 0xff) ++ // count = sentinel
      Array(0x81, 'a'.toInt, 0x02, 0x05, 0x01, 0x81, 'b'.toInt, 0x02) :+
      0xff).map(_.toByte)
    val b = new RdbBuilder()
    b.byte(20).str("s").len6(lp.length)
    lp.foreach(x => b.byte(x & 0xff))
    assert(RedisRdb.parse(b.eof()).map(_.field) == Seq("a", "5", "b"))
  }

  test("rdb: 6.x era — ziplist list/zset/hash, zipmap, quicklist v1") {
    // ziplist ["hello", 42, -5, 1000, 12]: 6-bit str, int8 ×2,
    // int16 LE, 4-bit immediate; header zlbytes+zltail+zllen
    val zl = (Array(0, 0, 0, 0, 0, 0, 0, 0, 5, 0) ++ Array(
      0x00, 0x05, 'h'.toInt, 'e'.toInt, 'l'.toInt, 'l'.toInt, 'o'.toInt,
      0x07, 0xfe, 42,
      0x03, 0xfe, 0xfb,
      0x03, 0xc0, 0xe8, 0x03,
      0x04, 0xfd) :+ 0xff).map(_.toByte)
    // zset ziplist [("m", 3)], hash ziplist [("f","v")]
    val zsetZl = (Array(0, 0, 0, 0, 0, 0, 0, 0, 2, 0) ++ Array(
      0x00, 0x01, 'm'.toInt, 0x03, 0xfe, 3) :+ 0xff).map(_.toByte)
    val hashZl = (Array(0, 0, 0, 0, 0, 0, 0, 0, 2, 0) ++ Array(
      0x00, 0x01, 'f'.toInt, 0x03, 0x01, 'v'.toInt) :+ 0xff)
      .map(_.toByte)
    // zipmap {f1: v1, f2: xyz(+2 slack bytes)}
    val zm = (Array(2,
      2, 'f'.toInt, '1'.toInt, 2, 0, 'v'.toInt, '1'.toInt,
      2, 'f'.toInt, '2'.toInt, 3, 2, 'x'.toInt, 'y'.toInt, 'z'.toInt,
      0xaa, 0xbb) :+ 0xff).map(_.toByte)
    // quicklist v1: 2 nodes, each a ziplist string
    val node1 = (Array(0, 0, 0, 0, 0, 0, 0, 0, 2, 0) ++ Array(
      0x00, 0x02, 'q'.toInt, '1'.toInt,
      0x04, 0x02, 'q'.toInt, '2'.toInt) :+ 0xff).map(_.toByte)
    val node2 = (Array(0, 0, 0, 0, 0, 0, 0, 0, 1, 0) ++ Array(
      0x00, 0x02, 'q'.toInt, '3'.toInt) :+ 0xff).map(_.toByte)

    val b = new RdbBuilder()
    def blob(bytes: Array[Byte]): Unit = {
      b.len6(bytes.length); bytes.foreach(x => b.byte(x & 0xff))
    }
    b.byte(10).str("zl"); blob(zl)
    b.byte(12).str("zz"); blob(zsetZl)
    b.byte(13).str("zh"); blob(hashZl)
    b.byte(9).str("zm"); blob(zm)
    b.byte(14).str("ql").len6(2); blob(node1); blob(node2)
    // legacy zset scores: ASCII + inf sentinel; zset2: binary double
    b.byte(3).str("zs").len6(2)
      .str("a").byte(3).byte('1').byte('.').byte('5')
      .str("b").byte(254)
    b.byte(5).str("z2").len6(1).str("c")
    val bits = java.lang.Double.doubleToLongBits(2.5)
    (0 until 8).foreach(i => b.byte(((bits >> (8 * i)) & 0xff).toInt))

    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "zl", "list", "0", "hello", None),
      RedisRdb.Entry(0, "zl", "list", "1", "42", None),
      RedisRdb.Entry(0, "zl", "list", "2", "-5", None),
      RedisRdb.Entry(0, "zl", "list", "3", "1000", None),
      RedisRdb.Entry(0, "zl", "list", "4", "12", None),
      RedisRdb.Entry(0, "zz", "zset", "m", "3", None),
      RedisRdb.Entry(0, "zh", "hash", "f", "v", None),
      RedisRdb.Entry(0, "zm", "hash", "f1", "v1", None),
      RedisRdb.Entry(0, "zm", "hash", "f2", "xyz", None),
      RedisRdb.Entry(0, "ql", "list", "0", "q1", None),
      RedisRdb.Entry(0, "ql", "list", "1", "q2", None),
      RedisRdb.Entry(0, "ql", "list", "2", "q3", None),
      RedisRdb.Entry(0, "zs", "zset", "a", "1.5", None),
      RedisRdb.Entry(0, "zs", "zset", "b", "inf", None),
      RedisRdb.Entry(0, "z2", "zset", "c", "2.5", None)))
  }

  test("rdb: stream v2 — messages, tombstones, last id, groups walk") {
    // one listpack: master id 5-1; master entry (count=1 deleted=1
    // num_fields=2 fa fb 0); a SAMEFIELDS live message at +1-0 and a
    // deleted one at +2-0 (cursor-only)
    def lpBytes(count: Int)(entries: Int*): Array[Byte] =
      (Array(0, 0, 0, 0, count & 0xff, count >> 8) ++ entries :+ 0xff)
        .map(_.toByte)
    val lp = lpBytes(18)(
      0x01, 0x01, // count = 1
      0x01, 0x01, // deleted = 1
      0x02, 0x01, // num_fields = 2
      0x82, 'f'.toInt, 'a'.toInt, 0x03,
      0x82, 'f'.toInt, 'b'.toInt, 0x03,
      0x00, 0x01, // master entry end "0"
      0x02, 0x01, // flags = SAMEFIELDS
      0x01, 0x01, // ms diff 1
      0x00, 0x01, // seq diff 0
      0x82, 'v'.toInt, 'a'.toInt, 0x03,
      0x82, 'v'.toInt, 'b'.toInt, 0x03,
      0x04, 0x01, // lp_count
      0x03, 0x01, // flags = SAMEFIELDS | DELETED
      0x02, 0x01, // ms diff 2
      0x00, 0x01, // seq diff 0
      0x82, 'x'.toInt, 'a'.toInt, 0x03,
      0x82, 'x'.toInt, 'b'.toInt, 0x03,
      0x04, 0x01) // lp_count

    val b = new RdbBuilder()
    def blob(bytes: Array[Byte]): Unit = {
      b.len6(bytes.length); bytes.foreach(x => b.byte(x & 0xff))
    }
    b.byte(19).str("st")
    b.len6(1) // one listpack
    val id = new Array[Byte](16); id(7) = 5; id(15) = 1 // 5-1 BE
    blob(id)
    blob(lp)
    b.len6(1) // total live items
    b.len6(7).len6(1) // last id 7-1
    b.len6(6).len6(1) // first id (v2)
    b.len6(7).len6(1) // max deleted (v2)
    b.len6(2) // entries added offset (v2)
    b.len6(1) // one consumer group
    b.str("g1").len6(7).len6(1) // name + last-delivered 7-1
    b.len6(1) // entries_read (v2)
    b.len6(1) // group PEL: 1 entry
    (0 until 16).foreach(_ => b.byte(0)) // raw id
    (0 until 8).foreach(_ => b.byte(0)) // delivery time
    b.len6(1) // delivery count
    b.len6(1) // one consumer
    b.str("c1")
    (0 until 8).foreach(_ => b.byte(0)) // seen time
    b.len6(1) // consumer PEL: 1 entry
    (0 until 16).foreach(_ => b.byte(0))

    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "st", "stream", "6-1/fa", "va", None),
      RedisRdb.Entry(0, "st", "stream", "6-1/fb", "vb", None),
      RedisRdb.Entry(0, "st", "stream_meta", "last_id", "7-1", None),
      RedisRdb.Entry(0, "st", "stream_group", "g1", "7-1", None)))
  }

  test("rdb: hash TTL metadata — per-field expiries, delta and listpack") {
    val b = new RdbBuilder()
    def u64(v: Long): Unit =
      (0 until 8).foreach(i => b.byte(((v >> (8 * i)) & 0xff).toInt))
    // type 24 (GA): min-expiry + delta-coded per-field ttls; 0 = none
    b.byte(24).str("h24")
    u64(1700000000000L) // min expire
    b.len6(2)
    b.len14(1001).str("f1").str("v1") // ttl = min + 1001 - 1
    b.len6(0).str("f2").str("v2") // no ttl
    // type 22 (pre-GA): absolute per-field ttls
    b.byte(22).str("h22")
    u64(0L)
    b.len6(1)
    b.len14(12345).str("g").str("w")
    // type 25: min-expiry u64 then (field, value, ttl) listpack triplets
    val lp = (Array(0, 0, 0, 0, 3, 0) ++ Array(
      0x81, 'f'.toInt, 0x02,
      0x81, 'v'.toInt, 0x02,
      0xf3, 0x00, 0xca, 0x9a, 0x3b, 0x05) :+ 0xff) // 10^9 32-bit int
      .map(_.toByte)
    b.byte(25).str("h25")
    u64(999L)
    b.len6(lp.length); lp.foreach(x => b.byte(x & 0xff))

    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "h24", "hash", "f1", "v1",
        Some(1700000000000L + 1000L)),
      RedisRdb.Entry(0, "h24", "hash", "f2", "v2", None),
      RedisRdb.Entry(0, "h22", "hash", "g", "w", Some(12345L)),
      RedisRdb.Entry(0, "h25", "hash", "f", "v", Some(1000000000L))))
  }

  test("rdb: module v2 skips by opcode with name and version decoded") {
    val charset = "ABCDEFGHIJKLMNOPQRSTUVWXYZ" +
      "abcdefghijklmnopqrstuvwxyz0123456789-_"
    val name = "GraftMod1"
    var id = 0L
    name.foreach(c => id = (id << 6) | charset.indexOf(c).toLong)
    id = (id << 10) | 2L // encoding version 2

    val b = new RdbBuilder()
    b.byte(7).str("m")
    b.byte(0x81) // 64-bit BE length encoding
    (7 to 0 by -1).foreach(i => b.byte(((id >> (8 * i)) & 0xff).toInt))
    b.len6(2).len6(77) // opcode UINT, value
    b.len6(5).str("payload") // opcode STRING
    b.len6(3).byte(0).byte(0).byte(0).byte(0) // opcode FLOAT, 4 bytes
    b.len6(4) // opcode DOUBLE
    (0 until 8).foreach(_ => b.byte(0))
    b.len6(0) // EOF
    b.byte(0).str("after").str("ok") // parser must land exactly here
    val entries = RedisRdb.parse(b.eof())
    assert(entries == Seq(
      RedisRdb.Entry(0, "m", "module", "GraftMod1", "2", None),
      RedisRdb.Entry(0, "after", "string", "", "ok", None)))
  }

  test("resp: bulk lengths are byte counts, not char counts") {
    // "héllo" is 5 chars but 6 UTF-8 bytes; a char-count cursor would
    // desynchronize and corrupt the following command.
    val out = new ByteArrayOutputStream()
    def cmd(args: Array[Byte]*): Unit = {
      out.write(s"*${args.size}\r\n".getBytes("ascii"))
      args.foreach { a =>
        out.write(s"$$${a.length}\r\n".getBytes("ascii"))
        out.write(a)
        out.write("\r\n".getBytes("ascii"))
      }
    }
    cmd("SET".getBytes("ascii"), "k".getBytes("ascii"),
      "héllo".getBytes("utf-8"))
    cmd("DEL".getBytes("ascii"), "k".getBytes("ascii"))
    val cmds = RedisResp.parse(out.toByteArray)
    assert(cmds == Seq(Seq("SET", "k", "héllo"), Seq("DEL", "k")))
    // binary payloads round-trip losslessly through parseBytes
    val bin = Array[Byte](0, -1, 13, 10, 36) // embedded \r\n and '$'
    val out2 = new ByteArrayOutputStream()
    out2.write("*2\r\n$3\r\nSET\r\n$5\r\n".getBytes("ascii"))
    out2.write(bin)
    out2.write("\r\n".getBytes("ascii"))
    val raw = RedisResp.parseBytes(out2.toByteArray)
    assert(raw.head(1).sameElements(bin))
  }

  test("resp: encode is the byte-exact inverse of parse, binary-safe") {
    import graft.sources.RedisResp
    // multi-byte UTF-8 and raw binary arguments round-trip
    val cmds = Seq(
      Seq("SET".getBytes("UTF-8"), "k€y".getBytes("UTF-8"),
        Array[Byte](0, 1, 2, 0xff.toByte, '\r', '\n')),
      Seq("PING".getBytes("UTF-8")))
    val wire = cmds.flatMap(RedisResp.encode(_).toSeq).toArray
    val back = RedisResp.parseBytes(wire)
    assert(back.size == 2)
    assert(back(0).size == 3 &&
      back(0)(2).sameElements(cmds(0)(2)) &&
      new String(back(0)(1), "UTF-8") == "k€y")
    // the sink's rewrite commands encode and re-parse identically
    val rewritten = graft.sinks.RedisCommands.rewrite(
      graft.sinks.RedisCommands.Entry("h",
        graft.sinks.RedisCommands.RHash(Seq("f" -> "v")),
        Some(1234L)))
    val rt = RedisResp.parse(
      rewritten.flatMap(RedisResp.encodeStrings(_).toSeq).toArray)
    assert(rt == rewritten)
  }

  test("resp: command stream parses and maps to change events") {
    def cmd(args: String*): String =
      s"*${args.size}\r\n" +
        args.map(a => s"$$${a.length}\r\n$a\r\n").mkString
    val stream = cmd("SELECT", "3") + cmd("SET", "k", "v") +
      cmd("HSET", "h", "f1", "1", "f2", "2") +
      cmd("DEL", "k", "h") + cmd("FLUSHALL") +
      cmd("PING")
    val cmds = RedisResp.parse(stream)
    assert(cmds.head == Seq("SELECT", "3"))
    val events = RedisResp.toEvents(cmds,
      NameFilter(ignoreCmds = Set("FLUSHALL")))
    assert(events == Seq(
      RedisResp.CmdEvent(3, "SET", "k", "insert", Map("value" -> "v")),
      RedisResp.CmdEvent(3, "HSET", "h", "insert",
        Map("f1" -> "1", "f2" -> "2")),
      RedisResp.CmdEvent(3, "DEL", "k", "delete", Map.empty),
      RedisResp.CmdEvent(3, "DEL", "h", "delete", Map.empty),
      RedisResp.CmdEvent(3, "PING", "", "raw", Map.empty)))
  }
}
