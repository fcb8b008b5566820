package graft.transport

/** Minimal BSON codec — the slice a change-stream client needs
  * (public spec, bsonspec.org): encode command documents, decode
  * reply documents. Values map to plain Scala types so the pump and
  * its specs stay dependency-free:
  *
  *   double↔Double, string↔String, doc↔Seq[(String, Any)] (encode) /
  *   Map[String, Any] (decode), array↔Seq[Any], bool↔Boolean,
  *   int32↔Int, int64↔Long, null↔null, binary↔Array[Byte],
  *   ObjectId↔Bson.ObjectId, timestamp↔Bson.Timestamp,
  *   UTC datetime↔Bson.DateTime.
  *
  * Documents ENCODE from ordered pairs because MongoDB commands are
  * order-sensitive (the command name must be the first key).
  */
object Bson {

  final case class ObjectId(bytes: Array[Byte]) {
    require(bytes.length == 12, "ObjectId is 12 bytes")
    def hex: String = bytes.map(b => f"${b & 0xff}%02x").mkString
  }
  final case class Timestamp(t: Int, i: Int)
  final case class DateTime(millis: Long)

  // ------------------------------------------------------------ encode

  def encode(doc: Seq[(String, Any)]): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    doc.foreach { case (k, v) => writeElement(body, k, v) }
    val out = new java.io.ByteArrayOutputStream()
    writeInt(out, body.size() + 5)
    body.writeTo(out)
    out.write(0)
    out.toByteArray
  }

  private def writeInt(o: java.io.ByteArrayOutputStream, v: Int): Unit =
    (0 until 4).foreach(i => o.write((v >> (8 * i)) & 0xff))
  private def writeLong(o: java.io.ByteArrayOutputStream, v: Long): Unit =
    (0 until 8).foreach(i => o.write(((v >> (8 * i)) & 0xff).toInt))
  private def writeCstr(o: java.io.ByteArrayOutputStream,
      s: String): Unit = {
    val b = s.getBytes("UTF-8")
    require(!b.contains(0.toByte), "cstring cannot contain NUL")
    o.write(b, 0, b.length); o.write(0)
  }

  private def writeElement(o: java.io.ByteArrayOutputStream,
      key: String, v: Any): Unit = v match {
    case d: Double =>
      o.write(0x01); writeCstr(o, key)
      writeLong(o, java.lang.Double.doubleToLongBits(d))
    case s: String =>
      o.write(0x02); writeCstr(o, key)
      val b = s.getBytes("UTF-8")
      writeInt(o, b.length + 1); o.write(b, 0, b.length); o.write(0)
    case Doc(pairs) =>
      o.write(0x03); writeCstr(o, key)
      val b = encode(pairs); o.write(b, 0, b.length)
    case Arr(items) =>
      o.write(0x04); writeCstr(o, key)
      val b = encode(items.zipWithIndex.map { case (x, i) =>
        i.toString -> x })
      o.write(b, 0, b.length)
    case bytes: Array[Byte] =>
      o.write(0x05); writeCstr(o, key)
      writeInt(o, bytes.length); o.write(0) // subtype generic
      o.write(bytes, 0, bytes.length)
    case oid: ObjectId =>
      o.write(0x07); writeCstr(o, key); o.write(oid.bytes, 0, 12)
    case b: Boolean =>
      o.write(0x08); writeCstr(o, key); o.write(if (b) 1 else 0)
    case dt: DateTime =>
      o.write(0x09); writeCstr(o, key); writeLong(o, dt.millis)
    case null =>
      o.write(0x0a); writeCstr(o, key)
    case i: Int =>
      o.write(0x10); writeCstr(o, key); writeInt(o, i)
    case ts: Timestamp =>
      o.write(0x11); writeCstr(o, key)
      writeInt(o, ts.i); writeInt(o, ts.t)
    case l: Long =>
      o.write(0x12); writeCstr(o, key); writeLong(o, l)
    case other =>
      sys.error(s"bson encode: unsupported ${other.getClass}")
  }

  /** Explicit wrappers keep encode unambiguous (a Seq could be a doc
    * or an array).
    */
  final case class Doc(pairs: Seq[(String, Any)])
  final case class Arr(items: Seq[Any])

  // ------------------------------------------------------------ decode

  def decode(bytes: Array[Byte], off: Int = 0): Map[String, Any] = {
    val (doc, _) = decodeDoc(bytes, off)
    doc
  }

  private def decodeDoc(bytes: Array[Byte], off: Int)
      : (Map[String, Any], Int) = {
    val len = readInt(bytes, off)
    var p = off + 4
    val end = off + len - 1 // final NUL
    val out = Map.newBuilder[String, Any]
    while (p < end) {
      val tpe = bytes(p) & 0xff; p += 1
      val keyEnd = {
        var q = p; while (bytes(q) != 0) q += 1; q
      }
      val key = new String(bytes, p, keyEnd - p, "UTF-8")
      p = keyEnd + 1
      val (v, next) = decodeValue(tpe, bytes, p)
      out += key -> v
      p = next
    }
    (out.result(), end + 1)
  }

  private def readInt(b: Array[Byte], p: Int): Int =
    (b(p) & 0xff) | ((b(p + 1) & 0xff) << 8) |
      ((b(p + 2) & 0xff) << 16) | ((b(p + 3) & 0xff) << 24)
  private def readLong(b: Array[Byte], p: Int): Long = {
    var v = 0L
    (0 until 8).foreach(i => v |= (b(p + i) & 0xffL) << (8 * i))
    v
  }

  private def decodeValue(tpe: Int, b: Array[Byte], p: Int)
      : (Any, Int) = tpe match {
    case 0x01 =>
      (java.lang.Double.longBitsToDouble(readLong(b, p)), p + 8)
    case 0x02 =>
      val len = readInt(b, p)
      (new String(b, p + 4, len - 1, "UTF-8"), p + 4 + len)
    case 0x03 => decodeDoc(b, p)
    case 0x04 =>
      val (doc, next) = decodeDoc(b, p)
      // array doc: keys "0","1",... in order
      (doc.toSeq.sortBy(_._1.toInt).map(_._2), next)
    case 0x05 =>
      val len = readInt(b, p)
      (java.util.Arrays.copyOfRange(b, p + 5, p + 5 + len), p + 5 + len)
    case 0x07 =>
      (ObjectId(java.util.Arrays.copyOfRange(b, p, p + 12)), p + 12)
    case 0x08 => (b(p) != 0, p + 1)
    case 0x09 => (DateTime(readLong(b, p)), p + 8)
    case 0x0a => (null, p)
    case 0x10 => (readInt(b, p), p + 4)
    case 0x11 => (Timestamp(readInt(b, p + 4), readInt(b, p)), p + 8)
    case 0x12 => (readLong(b, p), p + 8)
    case other => sys.error(f"bson decode: unsupported type 0x$other%02x")
  }

  // ---------------------------------------------------- JSON rendering

  /** 2^53 — the largest magnitude whose integers a double represents
    * exactly (and whose `toLong` is therefore faithful).
    */
  private val MaxExactDouble = 9007199254740992.0

  /** Canonical-ish JSON for the capture segments — the shape
    * `spark.read.json` and the existing Mongo event machinery consume.
    */
  def toJson(v: Any): String = v match {
    case null => "null"
    case s: String => quote(s)
    case b: Boolean => b.toString
    case i: Int => i.toString
    case l: Long => l.toString
    case d: Double =>
      // integral render only inside the double's EXACT-integer range:
      // `toLong` of 1e20 silently clamps to Long.MaxValue — a wrong
      // value landed downstream. NaN/Infinity are legal BSON doubles
      // but bare tokens are invalid JSON (spark.read.json would drop
      // the whole event into _corrupt_record) — land them as quoted
      // strings, explicit and greppable.
      if (java.lang.Double.isFinite(d)) {
        if (d == d.floor && math.abs(d) <= MaxExactDouble)
          d.toLong.toString
        else d.toString
      } else quote(
        if (d.isNaN) "NaN" else if (d > 0) "Infinity" else "-Infinity")
    case m: Map[_, _] =>
      m.asInstanceOf[Map[String, Any]].toSeq
        .map { case (k, x) => s"${quote(k)}:${toJson(x)}" }
        .mkString("{", ",", "}")
    case seq: Seq[_] => seq.map(toJson).mkString("[", ",", "]")
    case oid: ObjectId => quote(oid.hex)
    case ts: Timestamp => s"""{"t":${ts.t},"i":${ts.i}}"""
    case dt: DateTime => dt.millis.toString
    case bytes: Array[Byte] =>
      quote(java.util.Base64.getEncoder.encodeToString(bytes))
    case other => sys.error(s"toJson: unsupported ${other.getClass}")
  }

  private def quote(s: String): String = {
    val out = new StringBuilder("\"")
    s.foreach {
      case '"' => out.append("\\\"")
      case '\\' => out.append("\\\\")
      case '\n' => out.append("\\n")
      case '\r' => out.append("\\r")
      case '\t' => out.append("\\t")
      case c if c < 0x20 => out.append(f"\\u${c.toInt}%04x")
      case c => out.append(c)
    }
    out.append("\"").toString
  }
}
