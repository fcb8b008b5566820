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
}
