package graft.sources

import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.NameFilter

/** Redis source side — RDB snapshot parsing and the RESP command stream,
  * the two halves of the reference's PSYNC extractor
  * (`/root/reference/dt-connector/src/extractor/redis/redis_psync_extractor.rs:68+`:
  * full sync = an RDB dump, then an append-only command stream).
  *
  * The protocol client (PSYNC handshake) stays external, as with the
  * other CDC sources in this zero-egress build: snapshots arrive as RDB
  * FILES (`redis_snapshot_file_extractor.rs` reads exactly this shape),
  * the command stream arrives as RESP segments over the
  * [[ChangelogSource]] transport. At scale each cluster shard dumps its
  * own RDB — one Spark task per shard file is the natural parallel unit,
  * so [[RedisRdb.read]] parses per file inside `flatMap` and never
  * shuffles raw bytes.
  *
  * Format subset (documented): value types string(0), list(1), set(2),
  * hash(4) in raw encoding, intset(11), and the Redis-7 listpack family
  * — hash(16), zset(17), quicklist-v2 list(18, plain + packed nodes),
  * set(20); string payloads additionally in INT8/16/32 and LZF
  * encodings; opcodes AUX, RESIZEDB, EXPIRE/EXPIRE_MS, IDLE, FREQ,
  * SELECT, EOF (`rdb_parser.rs:9-20`, `reader/length.rs:8-60`,
  * `reader/string.rs:8-42`, `reader/list_pack.rs:12-150`). The
  * pre-listpack ziplist/zipmap era and modules raise with the type id
  * rather than mis-parse.
  */
object RedisRdb {

  /** One logical element: strings yield a single row with empty field;
    * hashes one row per (field, value); lists one per index; sets one
    * per member.
    */
  final case class Entry(db: Long, key: String, valueType: String,
      field: String, value: String, expireMs: Option[Long])

  private final class Reader(bytes: Array[Byte]) {
    private var pos = 0
    def u8(): Int = { val b = bytes(pos) & 0xff; pos += 1; b }
    def take(n: Int): Array[Byte] = {
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n
      out
    }
    def hasMore: Boolean = pos < bytes.length
    def peek: Int = bytes(pos) & 0xff

    /** Length encoding (reader/length.rs): 2-bit tag — 6-bit, 14-bit,
      * 0x80→u32 BE, 0x81→u64 BE, tag 3 = special string encoding.
      */
    def encodedLength(): (Long, Boolean) = {
      val first = u8()
      (first & 0xc0) >> 6 match {
        case 0 => ((first & 0x3f).toLong, false)
        case 1 => ((((first & 0x3f).toLong) << 8 | u8().toLong), false)
        case 2 => first match {
          case 0x80 =>
            (take(4).foldLeft(0L)((a, b) => (a << 8) | (b & 0xff)), false)
          case 0x81 =>
            (take(8).foldLeft(0L)((a, b) => (a << 8) | (b & 0xff)), false)
          case other => throw new IllegalArgumentException(
            f"illegal length encoding: $other%x")
        }
        case _ => ((first & 0x3f).toLong, true)
      }
    }

    def length(): Long = {
      val (len, special) = encodedLength()
      require(!special, "illegal length special=true")
      len
    }

    /** String encodings (reader/string.rs): raw, little-endian
      * INT8/16/32 rendered decimal, LZF-compressed. Raw bytes variant
      * for nested binary payloads (listpack/intset envelopes must NOT
      * round-trip through a charset).
      */
    def stringBytes(): Array[Byte] = {
      val (len, special) = encodedLength()
      if (!special) take(len.toInt)
      else len.toInt match {
        case 0 => u8().toByte.toString.getBytes(StandardCharsets.UTF_8)
        case 1 => ((u8() | (u8() << 8)).toShort).toString
          .getBytes(StandardCharsets.UTF_8)
        case 2 =>
          (u8() | (u8() << 8) | (u8() << 16) | (u8() << 24)).toString
            .getBytes(StandardCharsets.UTF_8)
        case 3 =>
          val inLen = length().toInt
          val outLen = length().toInt
          lzfDecompress(take(inLen), outLen)
        case other => throw new IllegalArgumentException(
          s"unknown string encode type $other")
      }
    }

    def string(): String =
      new String(stringBytes(), StandardCharsets.UTF_8)

    /** Listpack payload (reader/list_pack.rs, mirroring listpack.c's
      * lpGetWithSize): the envelope is an RDB string (possibly LZF);
      * inside, a 4-byte total + 2-byte count header, then entries in
      * 7-bit-uint / 6-bit-str / 13-bit-int / 12-bit-str / exact-coded
      * int / 32-bit-str encodings (each followed by its back-length),
      * terminated by 0xFF.
      */
    def listpack(): Seq[String] = {
      val r = new Reader(stringBytes())
      r.take(4) // total-bytes, unused
      // 65535 is listpack.c's "unknown count" sentinel (>= 2^16-1
      // entries): the count header is untrustworthy and the only safe
      // walk is entry-by-entry until the 0xFF terminator.
      val count = r.u8() | (r.u8() << 8)
      val walkToTerminator = count == 0xffff
      def backlen(entryLen: Int): Unit = {
        val n = if (entryLen < 128) 1
          else if (entryLen < 16384) 2
          else if (entryLen < (1 << 21)) 3
          else if (entryLen < (1 << 28)) 4 else 5
        r.take(n): Unit
      }
      def sint(uval: Long, negstart: Long, negmax: Long): String =
        (if (uval >= negstart) -(negmax - uval) - 1 else uval).toString
      val out = Seq.newBuilder[String]
      var read = 0
      while (if (walkToTerminator) r.peek != 0xff else read < count) {
        read += 1
        val b = r.u8()
        out += (if ((b & 0x80) == 0) { // 7-bit uint
          backlen(1); (b & 0x7f).toString
        } else if ((b & 0xc0) == 0x80) { // 6-bit str
          val len = b & 0x3f
          val s = new String(r.take(len), StandardCharsets.UTF_8)
          backlen(1 + len); s
        } else if ((b & 0xe0) == 0xc0) { // 13-bit int
          val uval = ((b & 0x1f).toLong << 8) | r.u8()
          backlen(2); sint(uval, 1L << 12, 8191L)
        } else if (b == 0xf1) { // 16-bit int LE
          val uval = (r.u8() | (r.u8() << 8)).toLong
          backlen(3); sint(uval, 1L << 15, 0xffffL)
        } else if (b == 0xf2) { // 24-bit int LE
          val uval = (r.u8() | (r.u8() << 8) | (r.u8() << 16)).toLong
          backlen(4); sint(uval, 1L << 23, 0xffffffL)
        } else if (b == 0xf3) { // 32-bit int LE
          val uval = (r.u8().toLong | (r.u8().toLong << 8) |
            (r.u8().toLong << 16) | (r.u8().toLong << 24))
          backlen(5); sint(uval, 1L << 31, 0xffffffffL)
        } else if (b == 0xf4) { // 64-bit int LE
          val uval = (0 until 8).foldLeft(0L)((a, i) =>
            a | (r.u8().toLong << (8 * i)))
          backlen(9); uval.toString // full 64-bit two's complement
        } else if ((b & 0xf0) == 0xe0) { // 12-bit str
          val len = ((b & 0x0f) << 8) | r.u8()
          val s = new String(r.take(len), StandardCharsets.UTF_8)
          backlen(2 + len); s
        } else if (b == 0xf0) { // 32-bit str
          val len = r.u8() | (r.u8() << 8) | (r.u8() << 16) |
            (r.u8() << 24)
          val s = new String(r.take(len), StandardCharsets.UTF_8)
          backlen(5 + len); s
        } else throw new IllegalArgumentException(
          f"bad listpack entry encoding: $b%x"))
      }
      require(r.u8() == 0xff, "read_listpack: last byte is not 0xFF")
      out.result()
    }

    /** Intset payload (reader/int_set.rs): encoding-width u32 LE
      * (2/4/8), count u32 LE, then little-endian signed ints.
      */
    def intset(): Seq[String] = {
      val r = new Reader(stringBytes())
      def u32(): Int = r.u8() | (r.u8() << 8) | (r.u8() << 16) |
        (r.u8() << 24)
      val width = u32()
      val count = u32()
      (0 until count).map { _ =>
        val uval = (0 until width).foldLeft(0L)((a, i) =>
          a | (r.u8().toLong << (8 * i)))
        // sign-extend from width bytes
        val shift = 64 - 8 * width
        ((uval << shift) >> shift).toString
      }
    }
  }

  /** LZF block decompression (reader/string.rs:44-80 — the public LZF
    * scheme Redis embeds): control < 32 = literal run, otherwise a
    * back-reference of (ctrl>>5)+2 bytes (7 extends with one byte) at
    * offset ((ctrl&0x1f)<<8 | next) + 1.
    */
  def lzfDecompress(in: Array[Byte], outLen: Int): Array[Byte] = {
    val out = new Array[Byte](outLen)
    var i = 0
    var o = 0
    while (i < in.length) {
      val ctrl = in(i) & 0xff
      i += 1
      if (ctrl < 32) {
        var x = 0
        while (x <= ctrl) { out(o) = in(i); i += 1; o += 1; x += 1 }
      } else {
        var len = ctrl >> 5
        if (len == 7) { len += in(i) & 0xff; i += 1 }
        var ref = o - ((ctrl & 0x1f) << 8) - (in(i) & 0xff) - 1
        i += 1
        var x = 0
        while (x < len + 2) { out(o) = out(ref); ref += 1; o += 1; x += 1 }
      }
    }
    out
  }

  // opcodes (rdb_parser.rs:9-20)
  private val OpIdle = 0xf8
  private val OpFreq = 0xf9
  private val OpAux = 0xfa
  private val OpResizeDb = 0xfb
  private val OpExpireMs = 0xfc
  private val OpExpireSec = 0xfd
  private val OpSelect = 0xfe
  private val OpEof = 0xff

  /** Parse one RDB image to entries. The trailing 8-byte CRC64 (if the
    * version writes one) is not validated — transport integrity belongs
    * to the object store.
    */
  def parse(bytes: Array[Byte]): Seq[Entry] = {
    val r = new Reader(bytes)
    val magic = new String(r.take(5), StandardCharsets.US_ASCII)
    require(magic == "REDIS", "invalid rdb format")
    r.take(4) // version digits
    val out = Seq.newBuilder[Entry]
    var db = 0L
    var expireMs: Option[Long] = None
    var done = false
    while (!done && r.hasMore) {
      val op = r.u8()
      op match {
        case OpEof => done = true
        case OpSelect => db = r.length()
        case OpResizeDb => r.length(); r.length(): Unit
        case OpAux => r.string(); r.string(): Unit // metadata, skipped
        case OpExpireMs =>
          expireMs = Some(r.take(8).zipWithIndex
            .foldLeft(0L)((a, bi) => a | ((bi._1 & 0xffL) << (8 * bi._2))))
        case OpExpireSec =>
          expireMs = Some(r.take(4).zipWithIndex
            .foldLeft(0L)((a, bi) =>
              a | ((bi._1 & 0xffL) << (8 * bi._2))) * 1000L)
        case OpIdle => r.length(): Unit
        case OpFreq => r.u8(): Unit
        case valueType =>
          val key = r.string()
          valueType match {
            case 0 => // string
              out += Entry(db, key, "string", "", r.string(), expireMs)
            case 1 => // list (raw quicklist-free encoding)
              val n = r.length()
              (0L until n).foreach(i =>
                out += Entry(db, key, "list", i.toString, r.string(),
                  expireMs))
            case 2 => // set
              val n = r.length()
              (0L until n).foreach(_ =>
                out += Entry(db, key, "set", r.string(), "", expireMs))
            case 4 => // hash
              val n = r.length()
              (0L until n).foreach { _ =>
                val f = r.string()
                out += Entry(db, key, "hash", f, r.string(), expireMs)
              }
            case 11 => // intset-encoded set (entry_parser RDB_TYPE 11)
              r.intset().foreach(m =>
                out += Entry(db, key, "set", m, "", expireMs))
            case 16 => // hash listpack (RDB_TYPE_HASH_LISTPACK)
              r.listpack().grouped(2).foreach {
                case Seq(f, v) =>
                  out += Entry(db, key, "hash", f, v, expireMs)
                case _ => ()
              }
            case 17 => // zset listpack (member, score pairs)
              r.listpack().grouped(2).foreach {
                case Seq(m, s) =>
                  out += Entry(db, key, "zset", m, s, expireMs)
                case _ => ()
              }
            case 18 => // quicklist v2: nodes are plain or packed
              val nodes = r.length()
              var idx = 0L
              (0L until nodes).foreach { _ =>
                val container = r.length()
                val elems =
                  if (container == 1) Seq(r.string()) // plain node
                  else r.listpack() // packed node
                elems.foreach { e =>
                  out += Entry(db, key, "list", idx.toString, e,
                    expireMs)
                  idx += 1
                }
              }
            case 20 => // set listpack (RDB_TYPE_SET_LISTPACK)
              r.listpack().foreach(m =>
                out += Entry(db, key, "set", m, "", expireMs))
            case other => throw new IllegalArgumentException(
              s"unsupported rdb value type $other for key $key " +
                "(ziplist/zipmap-era encodings are out of the " +
                "documented subset)")
          }
          expireMs = None // expiry binds to the single next entry
      }
    }
    out.result()
  }

  /** Distributed read: one task per RDB file (= per cluster shard). */
  def read(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("content").as[Array[Byte]]
      .flatMap(parse _)
      .toDF()
  }
}

/** RESP protocol parsing + command→change-event mapping — the command
  * phase of PSYNC (`redis_resp_reader.rs`, and the command filtering/
  * routing in the reference's Redis pipeline). Commands ride the
  * changelog transport as RESP arrays; `ignore_cmds` drops e.g.
  * FLUSHALL before anything reaches a sink.
  */
object RedisResp {

  /** Parse one RESP buffer into command argument arrays:
    * `*N\r\n($len\r\narg\r\n)×N`, repeated.
    *
    * RESP bulk-string $len is a BYTE count (redis protocol spec; the
    * reference's `redis_resp_reader.rs` reads raw bytes too), so the
    * cursor walks `Array[Byte]` offsets and each argument is sliced by
    * byte length FIRST — decoding to UTF-8 only happens on the final
    * slice. Counting Java String chars would desynchronize on any
    * multi-byte UTF-8 payload.
    */
  def parseBytes(bytes: Array[Byte]): Seq[Seq[Array[Byte]]] = {
    val out = Seq.newBuilder[Seq[Array[Byte]]]
    var i = 0
    def line(): String = {
      var end = i
      while (end + 1 < bytes.length &&
        !(bytes(end) == '\r' && bytes(end + 1) == '\n')) end += 1
      require(end + 1 < bytes.length, "truncated RESP line")
      val l = new String(bytes, i, end - i, StandardCharsets.US_ASCII)
      i = end + 2
      l
    }
    while (i < bytes.length) {
      val head = line()
      require(head.nonEmpty && head.charAt(0) == '*',
        s"expected RESP array, got: $head")
      val n = head.substring(1).toInt
      out += (0 until n).map { _ =>
        val h = line()
        require(h.nonEmpty && h.charAt(0) == '$',
          s"expected bulk string, got: $h")
        val len = h.substring(1).toInt
        require(i + len + 2 <= bytes.length, "truncated RESP bulk string")
        val s = java.util.Arrays.copyOfRange(bytes, i, i + len)
        i += len + 2 // payload + \r\n
        s
      }
    }
    out.result()
  }

  def parse(bytes: Array[Byte]): Seq[Seq[String]] =
    parseBytes(bytes).map(_.map(new String(_, StandardCharsets.UTF_8)))

  def parse(text: String): Seq[Seq[String]] =
    parse(text.getBytes(StandardCharsets.UTF_8))

  /** A command as a change event over the engine's schemaless envelope:
    * (db, key, row_type, fields). SELECT switches the db context; writes
    * map to upserts/deletes like the reference's Redis sink commands;
    * unmodeled commands pass through as `raw` for the command sink.
    */
  final case class CmdEvent(db: Long, cmd: String, key: String,
      rowType: String, fields: Map[String, String])

  def toEvents(commands: Seq[Seq[String]],
      filter: NameFilter = NameFilter()): Seq[CmdEvent] = {
    var db = 0L
    val out = Seq.newBuilder[CmdEvent]
    commands.foreach { args =>
      val cmd = args.head.toUpperCase
      if (filter.allowCmd(cmd)) cmd match {
        case "SELECT" => db = args(1).toLong
        case "SET" =>
          out += CmdEvent(db, cmd, args(1), "insert",
            Map("value" -> args(2)))
        case "HSET" | "HMSET" =>
          val pairs = args.drop(2).grouped(2)
            .collect { case Seq(f, v) => f -> v }.toMap
          out += CmdEvent(db, cmd, args(1), "insert", pairs)
        case "HDEL" =>
          out += CmdEvent(db, cmd, args(1), "delete",
            args.drop(2).map(_ -> "").toMap)
        case "DEL" =>
          args.drop(1).foreach(k =>
            out += CmdEvent(db, cmd, k, "delete", Map.empty))
        case "EXPIRE" | "PEXPIRE" | "EXPIREAT" | "PEXPIREAT" =>
          out += CmdEvent(db, cmd, args(1), "update",
            Map("expire" -> args(2)))
        case _ =>
          out += CmdEvent(db, cmd,
            if (args.size > 1) args(1) else "", "raw",
            Map.empty)
      }
    }
    out.result()
  }
}
