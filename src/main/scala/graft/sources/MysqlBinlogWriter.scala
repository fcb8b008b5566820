package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.CRC32

import graft.sources.MysqlBinlog.{ColType, EventType, Magic}

/** Binlog v4 **encoder** — the inverse of [[MysqlBinlog]], used to build
  * fixture binlog images for the decoder's spec battery and the
  * distributed round-trip query (encode → decode must be identity). Also
  * doubles as the fixture side of a binlog-shipping test harness: real
  * deployments decode files `mysqlbinlog`/the server wrote; tests decode
  * files this writer wrote, byte-compatible with the public layout
  * (CRC32 trailers, 8.0 optional TableMap metadata, ZSTD transaction
  * payloads).
  *
  * Values are the same String renderings [[MysqlBinlog]] emits, so
  * encode∘decode and decode∘encode are both identities over the
  * supported types.
  */
final class MysqlBinlogWriter(serverId: Long = 1L,
    checksum: Boolean = true) {

  private val out = new ByteArrayOutputStream()
  out.write(Magic, 0, 4)
  private var filePos: Long = 4L
  private val tableDefs = scala.collection.mutable.Map
    .empty[Long, (Seq[Int], Seq[Int], Seq[Boolean])]

  def bytes(): Array[Byte] = out.toByteArray

  // ---------------------------------------------------------- primitives

  private def leU(b: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = 0
    while (i < n) { b.write(((v >> (8 * i)) & 0xff).toInt); i += 1 }
  }
  private def beU(b: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { b.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
  }
  private def lenenc(b: ByteArrayOutputStream, v: Long): Unit =
    if (v < 0xfb) b.write(v.toInt)
    else if (v < 0x10000) { b.write(0xfc); leU(b, v, 2) }
    else if (v < 0x1000000) { b.write(0xfd); leU(b, v, 3) }
    else { b.write(0xfe); leU(b, v, 8) }

  private def bitmap(b: ByteArrayOutputStream, bits: Seq[Boolean]): Unit = {
    val arr = new Array[Byte]((bits.size + 7) / 8)
    bits.zipWithIndex.foreach { case (set, i) =>
      if (set) arr(i / 8) = (arr(i / 8) | (1 << (i % 8))).toByte
    }
    b.write(arr, 0, arr.length)
  }

  /** Append one event: header + body (+CRC32 when enabled). */
  def event(eventType: Int, body: Array[Byte], timestamp: Long = 0L)
      : Unit = {
    val crcLen = if (checksum) 4 else 0
    val eventLength = 19L + body.length + crcLen
    val nextPos = filePos + eventLength
    val head = new ByteArrayOutputStream(19)
    leU(head, timestamp, 4)
    head.write(eventType)
    leU(head, serverId, 4)
    leU(head, eventLength, 4)
    leU(head, nextPos, 4)
    leU(head, 0L, 2) // flags
    val headBytes = head.toByteArray
    out.write(headBytes, 0, headBytes.length)
    out.write(body, 0, body.length)
    if (checksum) {
      val crc = new CRC32
      crc.update(headBytes)
      crc.update(body)
      leU(out, crc.getValue, 4)
    }
    filePos = nextPos
  }

  // -------------------------------------------------------------- events

  /** FDE for a 5.6.1+ server: post-header-length array for 40 event
    * types, trailing checksum-alg byte (+CRC32 when on).
    */
  def fde(serverVersion: String = "8.0.36-graft",
      timestamp: Long = 0L): Unit = {
    val b = new ByteArrayOutputStream()
    leU(b, 4, 2)
    val sv = serverVersion.getBytes(StandardCharsets.UTF_8)
    b.write(sv, 0, math.min(sv.length, 50))
    var pad = 50 - math.min(sv.length, 50)
    while (pad > 0) { b.write(0); pad -= 1 }
    leU(b, 0L, 4) // create timestamp
    b.write(19) // header length
    // post-header lengths for event types 1..40 (values matter only to
    // servers; decoders size events from the header's event_length)
    val post = Array.fill(40)(0)
    post(EventType.FormatDescription - 1) = 84 + 40
    post(EventType.Rotate - 1) = 8
    post(EventType.Query - 1) = 13
    post(EventType.TableMap - 1) = 8
    post(EventType.WriteRowsV2 - 1) = 10
    post(EventType.UpdateRowsV2 - 1) = 10
    post(EventType.DeleteRowsV2 - 1) = 10
    post.foreach(b.write)
    b.write(1) // checksum alg placeholder: rewritten below when off
    val body = b.toByteArray
    if (!checksum) body(body.length - 1) = 0
    event(EventType.FormatDescription, body, timestamp)
  }

  def rotate(position: Long, nextFile: String): Unit = {
    val b = new ByteArrayOutputStream()
    leU(b, position, 8)
    val f = nextFile.getBytes(StandardCharsets.UTF_8)
    b.write(f, 0, f.length)
    event(EventType.Rotate, b.toByteArray)
  }

  def query(schema: String, sql: String, threadId: Long = 7L): Unit = {
    val b = new ByteArrayOutputStream()
    leU(b, threadId, 4)
    leU(b, 0L, 4) // exec time
    val s = schema.getBytes(StandardCharsets.UTF_8)
    b.write(s.length)
    leU(b, 0L, 2) // error code
    leU(b, 0L, 2) // status vars length
    b.write(s, 0, s.length)
    b.write(0)
    val q = sql.getBytes(StandardCharsets.UTF_8)
    b.write(q, 0, q.length)
    event(EventType.Query, b.toByteArray)
  }

  def begin(schema: String): Unit = query(schema, "BEGIN")

  def xid(id: Long): Unit = {
    val b = new ByteArrayOutputStream()
    leU(b, id, 8)
    event(EventType.Xid, b.toByteArray)
  }

  def gtid(uuid: String, gno: Long): Unit = {
    val b = new ByteArrayOutputStream()
    b.write(1) // commit flag
    val hex = uuid.replace("-", "")
    var i = 0
    while (i < 32) {
      b.write(Integer.parseInt(hex.substring(i, i + 2), 16)); i += 2
    }
    leU(b, gno, 8)
    event(EventType.Gtid, b.toByteArray)
  }

  /** TableMap; when `colNames` is non-empty the 8.0 optional metadata
    * (SIGNEDNESS + COLUMN_NAME, `binlog_row_metadata=FULL`) is written
    * so the file is self-describing.
    */
  def tableMap(tableId: Long, schema: String, table: String,
      colTypes: Seq[Int], colMeta: Seq[Int], nullable: Seq[Boolean],
      colNames: Seq[String] = Nil, signed: Seq[Boolean] = Nil): Unit = {
    tableDefs(tableId) = (colTypes, colMeta,
      if (signed.nonEmpty) signed else Seq.fill(colTypes.size)(true))
    val b = new ByteArrayOutputStream()
    leU(b, tableId, 6)
    leU(b, 1L, 2) // flags
    val s = schema.getBytes(StandardCharsets.UTF_8)
    b.write(s.length); b.write(s, 0, s.length); b.write(0)
    val t = table.getBytes(StandardCharsets.UTF_8)
    b.write(t.length); b.write(t, 0, t.length); b.write(0)
    lenenc(b, colTypes.size.toLong)
    colTypes.foreach(b.write)
    val meta = new ByteArrayOutputStream()
    colTypes.zip(colMeta).foreach { case (ct, m) =>
      writeColMeta(meta, ct, m)
    }
    val metaBytes = meta.toByteArray
    lenenc(b, metaBytes.length.toLong)
    b.write(metaBytes, 0, metaBytes.length)
    bitmap(b, nullable)
    if (signed.nonEmpty) {
      val numeric = colTypes.filter(ColType.isNumeric)
      val bits = new Array[Byte]((numeric.size + 7) / 8)
      var ni = 0
      colTypes.zipWithIndex.foreach { case (ct, i) =>
        if (ColType.isNumeric(ct)) {
          if (!signed(i)) bits(ni / 8) =
            (bits(ni / 8) | (0x80 >> (ni % 8))).toByte
          ni += 1
        }
      }
      b.write(1); lenenc(b, bits.length.toLong)
      b.write(bits, 0, bits.length)
    }
    if (colNames.nonEmpty) {
      val nb = new ByteArrayOutputStream()
      colNames.foreach { n =>
        val nbytes = n.getBytes(StandardCharsets.UTF_8)
        lenenc(nb, nbytes.length.toLong)
        nb.write(nbytes, 0, nbytes.length)
      }
      val nBytes = nb.toByteArray
      b.write(4); lenenc(b, nBytes.length.toLong)
      b.write(nBytes, 0, nBytes.length)
    }
    event(EventType.TableMap, b.toByteArray)
  }

  private def writeColMeta(b: ByteArrayOutputStream, colType: Int,
      meta: Int): Unit = {
    import ColType._
    colType match {
      case Float | Double | Blob | TinyBlob | MediumBlob | LongBlob |
        Geometry | Json | Timestamp2 | DateTime2 | Time2 => b.write(meta)
      case Varchar | VarString => leU(b, meta.toLong, 2)
      case Bit | NewDecimal | StringT | Enum | Set =>
        b.write((meta >> 8) & 0xff); b.write(meta & 0xff)
      case _ => ()
    }
  }

  def writeRows(tableId: Long, rows: Seq[Array[String]]): Unit =
    rowsEvent(EventType.WriteRowsV2, tableId, rows.map(r => (r, r)),
      twoImages = false)

  def deleteRows(tableId: Long, rows: Seq[Array[String]]): Unit =
    rowsEvent(EventType.DeleteRowsV2, tableId, rows.map(r => (r, r)),
      twoImages = false)

  def updateRows(tableId: Long,
      rows: Seq[(Array[String], Array[String])]): Unit =
    rowsEvent(EventType.UpdateRowsV2, tableId, rows, twoImages = true)

  private def rowsEvent(eventType: Int, tableId: Long,
      rows: Seq[(Array[String], Array[String])],
      twoImages: Boolean): Unit = {
    val (colTypes, colMeta, signed) = tableDefs.getOrElse(tableId,
      throw new IllegalStateException(
        s"writeRows before tableMap for table id $tableId"))
    val n = colTypes.size
    val b = new ByteArrayOutputStream()
    leU(b, tableId, 6)
    leU(b, 1L, 2) // flags
    leU(b, 2L, 2) // v2 extra-data length (just itself)
    lenenc(b, n.toLong)
    bitmap(b, Seq.fill(n)(true)) // all columns included
    if (twoImages) bitmap(b, Seq.fill(n)(true))
    rows.foreach { case (before, after) =>
      writeRowImage(b, colTypes, colMeta, signed, before)
      if (twoImages) writeRowImage(b, colTypes, colMeta, signed, after)
    }
    event(eventType, b.toByteArray)
  }

  private def writeRowImage(b: ByteArrayOutputStream, colTypes: Seq[Int],
      colMeta: Seq[Int], signed: Seq[Boolean],
      row: Array[String]): Unit = {
    require(row.length == colTypes.size,
      s"row width ${row.length} != ${colTypes.size} columns")
    bitmap(b, row.toSeq.map(_ == null))
    var i = 0
    while (i < row.length) {
      if (row(i) != null)
        encodeValue(b, colTypes(i), colMeta(i), signed(i), row(i))
      i += 1
    }
  }

  /** A transaction-payload event wrapping `build`'s events, ZSTD- or
    * un-compressed (MySQL compression codes 0 / 255).
    */
  def transactionPayload(zstd: Boolean)(
      build: MysqlBinlogWriter => Unit): Unit = {
    val inner = new MysqlBinlogWriter(serverId, checksum = false)
    inner.tableDefs ++= tableDefs
    build(inner)
    val raw = {
      val withMagic = inner.bytes()
      java.util.Arrays.copyOfRange(withMagic, 4, withMagic.length)
    }
    val payload =
      if (zstd) com.github.luben.zstd.Zstd.compress(raw) else raw
    val b = new ByteArrayOutputStream()
    b.write(2); lenenc(b, 1L); b.write(if (zstd) 0 else 255)
    b.write(3)
    val szField = new ByteArrayOutputStream()
    leU(szField, raw.length.toLong, 4)
    lenenc(b, 4L); b.write(szField.toByteArray, 0, 4)
    b.write(0) // END_MARK
    b.write(payload, 0, payload.length)
    event(EventType.TransactionPayload, b.toByteArray)
  }

  // ------------------------------------------------------ value encoding

  private def encodeValue(b: ByteArrayOutputStream, colType: Int,
      meta: Int, signed: Boolean, v: String): Unit = {
    import ColType._
    colType match {
      case Tiny => leU(b, java.lang.Long.parseLong(v) & 0xff, 1)
      case Short => leU(b, java.lang.Long.parseLong(v) & 0xffff, 2)
      case Int24 => leU(b, java.lang.Long.parseLong(v) & 0xffffff, 3)
      case Long => leU(b, java.lang.Long.parseLong(v) & 0xffffffffL, 4)
      case LongLong =>
        leU(b, if (signed) java.lang.Long.parseLong(v)
          else java.lang.Long.parseUnsignedLong(v), 8)
      case Year =>
        val y = v.toInt; b.write(if (y == 0) 0 else y - 1900)
      case Float =>
        leU(b, java.lang.Float.floatToIntBits(v.toFloat) & 0xffffffffL, 4)
      case Double => leU(b, java.lang.Double.doubleToLongBits(v.toDouble), 8)
      case Timestamp => leU(b, java.lang.Long.parseLong(v), 4)
      case Timestamp2 =>
        val (secs, micros) = splitFrac(v)
        beU(b, java.lang.Long.parseLong(secs), 4)
        writeFrac(b, micros, meta)
      case Date | NewDate =>
        val p = v.split("-")
        val packed = (p(0).toLong << 9) | (p(1).toLong << 5) | p(2).toLong
        leU(b, packed, 3)
      case Time =>
        val p = v.split(":")
        leU(b, p(0).toLong * 10000 + p(1).toLong * 100 + p(2).toLong, 3)
      case Time2 =>
        // int part + fraction are ONE offset-binary quantity: negating
        // the combined value complements the fraction bytes too
        // (my_time.c my_time_packed_to_binary), so a negative TIME with
        // fsp>0 borrows from the int part.
        val neg = v.startsWith("-")
        val (hms, micros) = splitFrac(if (neg) v.substring(1) else v)
        val p = hms.split(":")
        val packed = (p(0).toLong << 12) | (p(1).toLong << 6) | p(2).toLong
        val fb = (meta + 1) / 2
        val fracUnits = if (fb == 0) 0L else (micros / (fb match {
          case 1 => 10000; case 2 => 100; case _ => 1
        })).toLong
        val combined = (packed << (8 * fb)) | fracUnits
        beU(b, (0x800000L << (8 * fb)) + (if (neg) -combined else combined),
          3 + fb)
      case DateTime =>
        val (d, t) = splitDateTime(v)
        leU(b, (d(0) * 10000L + d(1) * 100L + d(2)) * 1000000L +
          t._1 * 10000L + t._2 * 100L + t._3, 8)
      case DateTime2 =>
        val (dm, micros) = splitFrac(v)
        val (d, t) = splitDateTime(dm)
        val ymd = (d(0) * 13L + d(1)) << 5 | d(2)
        val hms = (t._1.toLong << 12) | (t._2.toLong << 6) | t._3.toLong
        beU(b, 0x8000000000L + ((ymd << 17) | hms), 5)
        writeFrac(b, micros, meta)
      case Varchar | VarString =>
        val bytes = v.getBytes(StandardCharsets.UTF_8)
        if (meta < 256) b.write(bytes.length)
        else leU(b, bytes.length.toLong, 2)
        b.write(bytes, 0, bytes.length)
      case StringT | Enum | Set => encodeStringFamily(b, meta, v)
      case Bit =>
        val nbits = ((meta >> 8) & 0xff) * 8 + (meta & 0xff)
        beU(b, java.lang.Long.parseLong(v), (nbits + 7) / 8)
      case NewDecimal => encodeNewDecimal(b, meta >> 8, meta & 0xff, v)
      case Blob | TinyBlob | MediumBlob | LongBlob | Geometry | Json =>
        val raw = new Array[Byte](v.length / 2)
        var i = 0
        while (i < raw.length) {
          raw(i) = Integer.parseInt(v.substring(2 * i, 2 * i + 2), 16)
            .toByte
          i += 1
        }
        leU(b, raw.length.toLong, meta)
        b.write(raw, 0, raw.length)
      case other => throw new IllegalArgumentException(
        s"unsupported binlog column type $other")
    }
  }

  private def splitFrac(v: String): (String, Int) = {
    val dot = v.indexOf('.')
    if (dot < 0) (v, 0)
    else {
      val frac = v.substring(dot + 1)
      (v.substring(0, dot), (frac + "0" * (6 - frac.length)).toInt)
    }
  }

  private def splitDateTime(v: String): (Array[Int], (Int, Int, Int)) = {
    val parts = v.split(" ")
    val d = parts(0).split("-").map(_.toInt)
    val t = parts(1).split(":").map(_.toInt)
    (d, (t(0), t(1), t(2)))
  }

  private def writeFrac(b: ByteArrayOutputStream, micros: Int,
      meta: Int): Unit = {
    val n = (meta + 1) / 2
    if (n > 0)
      beU(b, (micros / (n match {
        case 1 => 10000; case 2 => 100; case _ => 1
      })).toLong, n)
  }

  private def encodeStringFamily(b: ByteArrayOutputStream, meta: Int,
      v: String): Unit = {
    val b0 = (meta >> 8) & 0xff
    val b1 = meta & 0xff
    var realType = ColType.StringT
    var length = b1
    if (b0 != 0) {
      if ((b0 & 0x30) != 0x30) {
        length = b1 | (((b0 & 0x30) ^ 0x30) << 4)
        realType = b0 | 0x30
      } else { realType = b0; length = b1 }
    }
    realType match {
      case ColType.Enum | ColType.Set =>
        leU(b, java.lang.Long.parseLong(v), length)
      case _ =>
        val bytes = v.getBytes(StandardCharsets.UTF_8)
        if (length < 256) b.write(bytes.length)
        else leU(b, bytes.length.toLong, 2)
        b.write(bytes, 0, bytes.length)
    }
  }

  private val Dig2Bytes = Array(0, 1, 1, 2, 2, 3, 3, 4, 4, 4)

  private def encodeNewDecimal(b: ByteArrayOutputStream, precision: Int,
      scale: Int, v: String): Unit = {
    val negative = v.startsWith("-")
    val unsigned = if (negative) v.substring(1) else v
    val dot = unsigned.indexOf('.')
    val intDigits = (if (dot < 0) unsigned else unsigned.substring(0, dot))
      .dropWhile(_ == '0')
    val fracDigits = if (dot < 0) "" else unsigned.substring(dot + 1)
    val intg = precision - scale
    require(intDigits.length <= intg && fracDigits.length <= scale,
      s"decimal $v does not fit DECIMAL($precision,$scale)")
    val intPadded = "0" * (intg - intDigits.length) + intDigits
    val fracPadded = fracDigits + "0" * (scale - fracDigits.length)
    val intg0 = intg / 9; val intg0x = intg - intg0 * 9
    val frac0 = scale / 9; val frac0x = scale - frac0 * 9
    val raw = new ByteArrayOutputStream()
    var idx = 0
    if (intg0x > 0) {
      beU(raw, intPadded.substring(0, intg0x).toLong, Dig2Bytes(intg0x))
      idx = intg0x
    }
    var g = 0
    while (g < intg0) {
      beU(raw, intPadded.substring(idx, idx + 9).toLong, 4)
      idx += 9; g += 1
    }
    idx = 0
    var f = 0
    while (f < frac0) {
      beU(raw, fracPadded.substring(idx, idx + 9).toLong, 4)
      idx += 9; f += 1
    }
    if (frac0x > 0)
      beU(raw, fracPadded.substring(idx, idx + frac0x).toLong,
        Dig2Bytes(frac0x))
    val arr = raw.toByteArray
    arr(0) = (arr(0) ^ 0x80).toByte
    if (negative) {
      var i = 0
      while (i < arr.length) { arr(i) = (~arr(i)).toByte; i += 1 }
    }
    b.write(arr, 0, arr.length)
  }
}
