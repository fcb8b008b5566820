package graft.sources

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets

import graft.model.{ChangeEvent, Position, RowKind}
import graft.operators.Checker

/** PostgreSQL `pgoutput` logical-replication message decoder — the PG twin
  * of [[MysqlBinlog]]. The reference consumes these messages through
  * tokio-postgres (`/root/reference/dt-connector/src/extractor/pg/
  * pg_cdc_extractor.rs:170-226` dispatch, `pg_cdc_client.rs:219-291`
  * stream framing); here the protocol client stays external and the
  * public message layout is decoded natively:
  *
  *   - Begin / Commit (8-byte LSNs, micros-since-2000 timestamps)
  *   - Relation (column names, flags, type oids — pgoutput streams its
  *     own schema, so decode needs no external catalog)
  *   - Insert / Update / Delete with TupleData: 't' text, 'n' NULL,
  *     'u' unchanged-TOAST (rendered as [[Checker.ToastSentinel]], the
  *     same marker the tolerant diff already honors), 'b' binary
  *   - Update old-image modes: 'K' (REPLICA IDENTITY key) and 'O'
  *     (REPLICA IDENTITY FULL)
  *   - Truncate, Origin, Type, logical-decoding Message — decoded,
  *     surfaced, never mis-parsed
  *
  * Two transports: bare concatenated messages are not self-delimiting,
  * so captured streams are framed — either PG wire CopyData ('d' +
  * length) as a capture proxy writes, or the inner XLogData ('w') /
  * keepalive ('k') layer. [[decodeCopyStream]] peels both.
  *
  * Scale shape: one captured WAL segment file = one task (flatMap), the
  * same per-file parallelism as the binlog decoder; only the downstream
  * key compaction shuffles.
  */
object PgOutput {

  final case class RelColumn(name: String, keyPart: Boolean, typeOid: Int,
      typeMod: Int)

  sealed trait Message
  final case class Begin(finalLsn: Long, commitMicros: Long, xid: Long)
      extends Message
  final case class Commit(commitLsn: Long, endLsn: Long,
      commitMicros: Long) extends Message
  final case class Relation(relId: Long, namespace: String, name: String,
      replicaIdentity: Char, columns: Seq[RelColumn]) extends Message
  /** Tuple values: null = SQL NULL; unchanged TOAST renders as the
    * sentinel; binary ('b') renders as lowercase hex.
    */
  final case class Insert(relId: Long, newTuple: Array[String])
      extends Message
  final case class Update(relId: Long, oldKind: Option[Char],
      oldTuple: Option[Array[String]], newTuple: Array[String])
      extends Message
  final case class Delete(relId: Long, oldKind: Char,
      oldTuple: Array[String]) extends Message
  final case class Truncate(cascade: Boolean, restartIdentity: Boolean,
      relIds: Seq[Long]) extends Message
  final case class Origin(originLsn: Long, name: String) extends Message
  final case class TypeMsg(typeOid: Long, namespace: String, name: String)
      extends Message
  final case class LogicalMessage(transactional: Boolean, lsn: Long,
      prefix: String, content: Array[Byte]) extends Message
  final case class Keepalive(walEnd: Long, clockMicros: Long,
      replyRequested: Boolean) extends Message
  final case class UnknownMessage(tag: Char) extends Message

  /** Protocol v2 streamed in-progress transactions: large transactions
    * stream before commit in Start/Stop segments, interleaved across
    * transactions; data messages inside a segment carry the xid of the
    * (sub)transaction that produced them.
    */
  final case class StreamStart(xid: Long, firstSegment: Boolean)
      extends Message
  case object StreamStop extends Message
  final case class StreamCommit(xid: Long, commitLsn: Long,
      endLsn: Long, commitMicros: Long) extends Message
  /** `subXid == xid` aborts the whole transaction, otherwise only the
    * subtransaction's buffered changes.
    */
  final case class StreamAbort(xid: Long, subXid: Long) extends Message
  /** A data message decoded inside a Start/Stop segment, tagged with
    * its (sub)transaction xid.
    */
  final case class Streamed(xid: Long, message: Message)
      extends Message

  /** Standard PG LSN rendering: `XXXXXXXX/XXXXXXXX` (hi/lo 32 bits). */
  def renderLsn(lsn: Long): String =
    f"${(lsn >>> 32).toInt & 0xffffffffL}%X/${lsn.toInt & 0xffffffffL}%X"

  // ---------------------------------------------------------------- reader

  /** In-place cursor over `bytes`, hard-bounded by `limit`: every
    * read that would cross `limit` throws instead of silently reading
    * the NEXT frame's bytes — with in-place decoding over the whole
    * capture buffer, a truncated/corrupt message must fail at its
    * frame boundary, not mis-decode into the neighbouring XLogData.
    */
  private final class Reader(bytes: Array[Byte], var pos: Int,
      val limit: Int) {
    def this(bytes: Array[Byte], pos: Int) =
      this(bytes, pos, bytes.length)
    private def need(n: Int): Unit =
      if (pos + n > limit) throw new IllegalArgumentException(
        s"pgoutput truncated: need $n bytes at $pos, frame limit $limit")
    def hasMore: Boolean = pos < limit
    def u8(): Int = { need(1); val b = bytes(pos) & 0xff; pos += 1; b }
    def beU(n: Int): Long = {
      need(n)
      var v = 0L; var i = 0
      while (i < n) { v = (v << 8) | (bytes(pos + i) & 0xffL); i += 1 }
      pos += n; v
    }
    def take(n: Int): Array[Byte] = {
      need(n)
      val out = java.util.Arrays.copyOfRange(bytes, pos, pos + n)
      pos += n; out
    }
    def cstr(): String = {
      val start = pos
      while (pos < limit && bytes(pos) != 0) pos += 1
      need(1) // the terminator itself must be inside the frame
      val s = new String(bytes, start, pos - start, StandardCharsets.UTF_8)
      pos += 1; s
    }
  }

  /** Decode one bare pgoutput message (the payload of one XLogData).
    * Trailing bytes after the message are a framing error and raise —
    * silently ignoring them would drop data.
    */
  def decodeMessage(bytes: Array[Byte],
      inStream: Boolean = false): Message = {
    val (m, consumed) = decodeMessageConsumed(bytes, inStream)
    require(consumed == bytes.length,
      s"pgoutput message consumed $consumed of ${bytes.length} bytes — " +
        "buffer holds more than one message")
    m
  }

  /** Data-message tags that carry a leading xid inside a streamed
    * segment (protocol v2).
    */
  private val StreamableTags = "RYIUDTM"

  /** Decode one message and report how many bytes it consumed. Every
    * pgoutput message is self-delimiting except an unknown tag, which
    * consumes the whole buffer (its length is unknowable). `inStream`
    * = the decoder is between Stream Start and Stream Stop, where data
    * messages read their (sub)transaction xid first and wrap in
    * [[Streamed]].
    */
  def decodeMessageConsumed(bytes: Array[Byte],
      inStream: Boolean = false): (Message, Int) = {
    val (m, end) = decodeMessageAt(bytes, 0, bytes.length, inStream)
    (m, end)
  }

  /** In-place variant: decode ONE message starting at `off`, never
    * copying the payload out of the capture buffer — the per-message
    * copyOfRange the v2 refactor introduced showed up as the q65
    * round-trip regression (one fresh array per decoded message).
    * Returns (message, end offset); an unknown tag consumes to
    * `limit` (its length is unknowable).
    */
  def decodeMessageAt(bytes: Array[Byte], off: Int, limit: Int,
      inStream: Boolean): (Message, Int) = {
    val r = new Reader(bytes, off, limit)
    val tag = r.u8().toChar
    val streamXid: Long =
      if (inStream && StreamableTags.indexOf(tag) >= 0) r.beU(4)
      else -1L
    val msg: Message = tag match {
      case 'B' => Begin(r.beU(8), r.beU(8), r.beU(4))
      case 'C' =>
        r.u8() // flags, unused
        Commit(r.beU(8), r.beU(8), r.beU(8))
      case 'O' => Origin(r.beU(8), r.cstr())
      case 'R' =>
        val relId = r.beU(4)
        val ns = r.cstr(); val name = r.cstr()
        val identity = r.u8().toChar
        val ncols = r.beU(2).toInt
        val cols = (0 until ncols).map { _ =>
          val flags = r.u8()
          RelColumn(r.cstr(), (flags & 1) == 1, r.beU(4).toInt,
            r.beU(4).toInt)
        }
        Relation(relId, ns, name, identity, cols)
      case 'Y' => TypeMsg(r.beU(4), r.cstr(), r.cstr())
      case 'I' =>
        val relId = r.beU(4)
        val kind = r.u8().toChar
        require(kind == 'N', s"insert tuple kind $kind")
        Insert(relId, tupleData(r))
      case 'U' =>
        val relId = r.beU(4)
        val next = r.u8().toChar
        if (next == 'K' || next == 'O') {
          val old = tupleData(r)
          val n = r.u8().toChar
          require(n == 'N', s"update new-tuple kind $n")
          Update(relId, Some(next), Some(old), tupleData(r))
        } else {
          require(next == 'N', s"update tuple kind $next")
          Update(relId, None, None, tupleData(r))
        }
      case 'D' =>
        val relId = r.beU(4)
        val kind = r.u8().toChar
        require(kind == 'K' || kind == 'O', s"delete tuple kind $kind")
        Delete(relId, kind, tupleData(r))
      case 'T' =>
        val n = r.beU(4).toInt
        val flags = r.u8()
        Truncate((flags & 1) == 1, (flags & 2) == 2,
          (0 until n).map(_ => r.beU(4)))
      case 'M' =>
        val transactional = r.u8() == 1
        val lsn = r.beU(8)
        val prefix = r.cstr()
        val len = r.beU(4).toInt
        LogicalMessage(transactional, lsn, prefix, r.take(len))
      case 'S' => StreamStart(r.beU(4), r.u8() == 1)
      case 'E' => StreamStop
      case 'c' =>
        val xid = r.beU(4)
        r.u8() // flags, unused
        StreamCommit(xid, r.beU(8), r.beU(8), r.beU(8))
      case 'A' => StreamAbort(r.beU(4), r.beU(4))
      case other => UnknownMessage(other)
    }
    msg match {
      case UnknownMessage(_) => (msg, limit)
      case _ if streamXid >= 0 => (Streamed(streamXid, msg), r.pos)
      case _ => (msg, r.pos)
    }
  }

  private def tupleData(r: Reader): Array[String] = {
    val n = r.beU(2).toInt
    val out = new Array[String](n)
    var i = 0
    while (i < n) {
      r.u8().toChar match {
        case 'n' => out(i) = null
        case 'u' => out(i) = Checker.ToastSentinel
        case 't' =>
          val len = r.beU(4).toInt
          out(i) = new String(r.take(len), StandardCharsets.UTF_8)
        case 'b' =>
          val len = r.beU(4).toInt
          out(i) = r.take(len).map(b => f"${b & 0xff}%02x").mkString
        case other => throw new IllegalArgumentException(
          s"unknown tuple data kind $other")
      }
      i += 1
    }
    out
  }

  /** Peel a captured stream: CopyData ('d' + BE length incl. itself)
    * wrapping XLogData ('w' startLsn endLsn clock + message) and
    * keepalives ('k' walEnd clock reply). Bare XLogData frames (no
    * CopyData layer) also decode — the first byte disambiguates.
    * Returns (walStartLsn, message) pairs; keepalives carry their
    * walEnd as the LSN.
    */
  def decodeCopyStream(bytes: Array[Byte]): Seq[(Long, Message)] = {
    val out = Seq.newBuilder[(Long, Message)]
    var pos = 0
    // protocol v2: between Stream Start and Stream Stop, data messages
    // carry a leading xid — segment boundaries are frames themselves,
    // so the flag threads across the frame loop
    var inStream = false
    def track(m: Message): Message = {
      m match {
        case _: StreamStart => inStream = true
        case StreamStop => inStream = false
        case _ => ()
      }
      m
    }
    while (pos < bytes.length) {
      val tag = bytes(pos) & 0xff
      if (tag == 'd') {
        val r = new Reader(bytes, pos + 1)
        val len = r.beU(4).toInt // includes the length field
        val end = pos + 1 + len
        val ((lsn, msg), next) =
          decodeXLogOne(bytes, pos + 5, end, inStream)
        require(next == end,
          s"CopyData frame not fully consumed: at $next expected $end")
        out += ((lsn, track(msg)))
        pos = end
      } else if (tag == 'w' || tag == 'k') {
        // bare inner frames: XLogData payloads are self-terminating
        // messages, keepalives fixed-width
        val (res, next) = decodeXLogOne(bytes, pos, bytes.length,
          inStream)
        out += ((res._1, track(res._2)))
        pos = next
      } else throw new IllegalArgumentException(
        f"unknown replication frame tag $tag%x at $pos")
    }
    out.result()
  }

  /** One inner frame starting at `start`; returns (result, nextOffset).
    * XLogData runs to `limit` (one message per frame on the wire).
    */
  private def decodeXLogOne(bytes: Array[Byte], start: Int,
      limit: Int, inStream: Boolean = false): ((Long, Message), Int) = {
    val r = new Reader(bytes, start, limit)
    r.u8().toChar match {
      case 'w' =>
        val walStart = r.beU(8)
        r.beU(8) // walEnd
        r.beU(8) // server clock
        // decode exactly ONE message in place and advance by what it
        // consumed: a capture of concatenated bare XLogData frames
        // must not let the first frame swallow the rest of the buffer
        // (silent loss) — and no per-message payload copy.
        val (msg, endPos) = decodeMessageAt(bytes, r.pos, limit,
          inStream)
        ((walStart, msg), endPos)
      case 'k' =>
        val walEnd = r.beU(8)
        val clock = r.beU(8)
        val reply = r.u8() == 1
        ((walEnd, Keepalive(walEnd, clock, reply)), r.pos)
      case other => throw new IllegalArgumentException(
        s"unknown XLog frame tag $other")
    }
  }

  // --------------------------------------------------- ChangeEvent bridge

  /** Flatten decoded messages into [[ChangeEvent]]s. Relation messages
    * feed the rel-id cache (pgoutput is self-describing — the reference
    * instead aligns its catalog meta to the wal column order,
    * pg_cdc_extractor.rs:283-326). Begin fixes the transaction's
    * position at the PREVIOUS commit's end LSN (reference:145-152:
    * restart replays the whole open transaction); Commit advances it.
    * Update without an old image keys on the new tuple (REPLICA
    * IDENTITY DEFAULT, key unchanged); 'K'/'O' old images become the
    * before map. Truncate surfaces as a per-relation `truncate` event.
    */
  def toChangeEvents(messages: Seq[(Long, Message)],
      startLsn: String = "", markerTable: String = "",
      localNode: String = ""): Seq[ChangeEvent] =
    toChangeEventsIndexed(messages, startLsn, markerTable, localNode)
      .map(_._2)

  /** [[toChangeEvents]] plus each event's COMMIT ORDINAL — the index of
    * the Commit/Stream Commit that owns it, counting every committed
    * transaction in the stream (including row-less ones). The position
    * field alone cannot distinguish adjacent transactions when a
    * replayed stream resumes exactly at the first one's commit end
    * (both carry the resume LSN); the ordinal always can.
    */
  def toChangeEventsIndexed(messages: Seq[(Long, Message)],
      startLsn: String = "", markerTable: String = "",
      localNode: String = ""): Seq[(Int, ChangeEvent)] = {
    val rels = scala.collection.mutable.Map.empty[Long, Relation]
    val out = Seq.newBuilder[(Int, ChangeEvent)]
    var txEndLsn = startLsn
    var positionLsn = startLsn
    var commitOrdinal = 0
    // data-marker origin state machine (same semantics as the MySQL
    // decode): reset to the local node per txn, marker-relation
    // inserts set the in-flight origin, marker rows never emit
    val markerOn = markerTable.nonEmpty
    var origin = if (markerOn) localNode else ""
    def isMarker(rel: Relation): Boolean =
      markerOn && s"${rel.namespace}.${rel.name}" == markerTable

    // per-relation column-name cache: a relation decodes once per
    // stream but images build once per ROW — rebuilding the name seq
    // per row was measurable in the q65 round-trip profile
    val colNames = scala.collection.mutable.Map.empty[Long, Array[String]]
    def namesOf(rel: Relation): Array[String] =
      colNames.getOrElseUpdate(rel.relId,
        rel.columns.map(_.name).toArray)

    def img(rel: Relation, tuple: Array[String]): Map[String, String] = {
      val names = namesOf(rel)
      val b = Map.newBuilder[String, String]
      var i = 0
      while (i < names.length && i < tuple.length) {
        b += names(i) -> tuple(i); i += 1
      }
      b.result()
    }

    val posKind = Position.PgCdc("").kind
    def emit(rel: Relation, rowType: String, before: Map[String, String],
        after: Map[String, String]): Unit =
      out += ((commitOrdinal,
        ChangeEvent(rel.namespace, rel.name, 0L, rowType, before,
          after, posKind, positionLsn, originNode = origin)))

    def applyData(m: Message): Unit = m match {
      case i: Insert =>
        val rel = rels(i.relId)
        if (isMarker(rel))
          origin = img(rel, i.newTuple)
            .getOrElse("data_origin_node", origin)
        else emit(rel, RowKind.Insert, Map.empty, img(rel, i.newTuple))
      case u: Update =>
        val rel = rels(u.relId)
        if (!isMarker(rel)) {
          val before = u.oldTuple.map(img(rel, _)).getOrElse(Map.empty)
          emit(rel, RowKind.Update, before, img(rel, u.newTuple))
        }
      case d: Delete =>
        val rel = rels(d.relId)
        if (!isMarker(rel))
          emit(rel, RowKind.Delete, img(rel, d.oldTuple), Map.empty)
      case t: Truncate =>
        t.relIds.foreach { id =>
          val rel = rels(id)
          if (!isMarker(rel))
            emit(rel, "truncate", Map.empty, Map.empty)
        }
      case _ => () // Origin/Type/LogicalMessage/Keepalive: no row images
    }

    // v2 streaming: segments buffer per TOP-LEVEL xid (the Stream
    // Start xid) until Stream Commit replays them in arrival order or
    // Stream Abort drops them (whole txn when subXid == xid, else the
    // subtransaction's entries only). Relation messages inside a
    // stream update the schema cache immediately — they describe the
    // wire, not the transaction.
    val pending = scala.collection.mutable.LinkedHashMap
      .empty[Long, scala.collection.mutable.ArrayBuffer[(Long, Message)]]
    var openStream: Option[Long] = None

    messages.foreach {
      case (_, r: Relation) =>
        rels(r.relId) = r; colNames.remove(r.relId): Unit
      case (_, b: Begin) =>
        positionLsn = txEndLsn // resume point: previous tx end
        if (markerOn) origin = localNode // txn boundary reset
      case (_, c: Commit) =>
        txEndLsn = renderLsn(c.endLsn)
        positionLsn = txEndLsn
        commitOrdinal += 1
        if (markerOn) origin = localNode
      case (_, s: StreamStart) => openStream = Some(s.xid)
      case (_, StreamStop) => openStream = None
      case (_, Streamed(subXid, m)) => m match {
        case r: Relation =>
          rels(r.relId) = r; colNames.remove(r.relId): Unit
        case data =>
          val top = openStream.getOrElse(subXid)
          pending.getOrElseUpdate(top,
            scala.collection.mutable.ArrayBuffer.empty) +=
            ((subXid, data))
      }
      case (_, a: StreamAbort) =>
        if (a.subXid == a.xid) pending.remove(a.xid)
        else pending.get(a.xid)
          .foreach(_.filterInPlace(_._1 != a.subXid))
      case (_, sc: StreamCommit) =>
        // same position contract as Begin/Commit: the replayed txn
        // keys at the previous commit end, its commit advances it
        positionLsn = txEndLsn
        if (markerOn) origin = localNode // replayed txn: fresh origin
        pending.remove(sc.xid)
          .foreach(_.foreach { case (_, m) => applyData(m) })
        txEndLsn = renderLsn(sc.endLsn)
        positionLsn = txEndLsn
        commitOrdinal += 1
        if (markerOn) origin = localNode
      case (_, m) => applyData(m)
    }
    out.result()
  }

  /** Decode a captured stream file straight to ChangeEvents. */
  def decodeFile(bytes: Array[Byte], startLsn: String = "",
      markerTable: String = "", localNode: String = "")
      : Seq[ChangeEvent] =
    toChangeEvents(decodeCopyStream(bytes), startLsn, markerTable,
      localNode)
}

/** pgoutput message **encoder** — fixture builder for the decoder's spec
  * battery and the distributed round-trip, byte-compatible with the
  * public layout (CopyData + XLogData framing included).
  */
final class PgOutputWriter {
  private val out = new ByteArrayOutputStream()
  private var walPos: Long = 0x16000000L

  def bytes(): Array[Byte] = out.toByteArray

  private def beU(b: ByteArrayOutputStream, v: Long, n: Int): Unit = {
    var i = n - 1
    while (i >= 0) { b.write(((v >> (8 * i)) & 0xff).toInt); i -= 1 }
  }
  private def cstr(b: ByteArrayOutputStream, s: String): Unit = {
    val raw = s.getBytes(StandardCharsets.UTF_8)
    b.write(raw, 0, raw.length); b.write(0)
  }

  /** Wrap one message in XLogData + CopyData and append. */
  def frame(message: Array[Byte]): Unit = {
    val x = new ByteArrayOutputStream()
    x.write('w')
    beU(x, walPos, 8)
    beU(x, walPos + message.length, 8)
    beU(x, 0L, 8) // server clock
    x.write(message, 0, message.length)
    val inner = x.toByteArray
    out.write('d')
    beU(out, inner.length.toLong + 4, 4)
    out.write(inner, 0, inner.length)
    walPos += message.length
  }

  def keepalive(replyRequested: Boolean): Unit = {
    val x = new ByteArrayOutputStream()
    x.write('k')
    beU(x, walPos, 8)
    beU(x, 0L, 8)
    x.write(if (replyRequested) 1 else 0)
    val inner = x.toByteArray
    out.write('d')
    beU(out, inner.length.toLong + 4, 4)
    out.write(inner, 0, inner.length)
  }

  def begin(finalLsn: Long, commitMicros: Long, xid: Long): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('B'); beU(b, finalLsn, 8); beU(b, commitMicros, 8)
    beU(b, xid, 4)
    frame(b.toByteArray)
  }

  // ---- protocol v2 streamed transactions: between streamStart and
  // streamStop every data message carries the current (sub)txn xid
  private var streamXid: Option[Long] = None
  private def maybeXid(b: ByteArrayOutputStream): Unit =
    streamXid.foreach(x => beU(b, x, 4))

  def streamStart(xid: Long, firstSegment: Boolean): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('S'); beU(b, xid, 4)
    b.write(if (firstSegment) 1 else 0)
    frame(b.toByteArray)
    streamXid = Some(xid)
  }

  /** Tag subsequent data messages with a subtransaction xid (call
    * between streamStart and streamStop).
    */
  def streamAs(subXid: Long): Unit = streamXid = Some(subXid)

  def streamStop(): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('E')
    frame(b.toByteArray)
    streamXid = None
  }

  def streamCommit(xid: Long, commitLsn: Long, endLsn: Long,
      commitMicros: Long): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('c'); beU(b, xid, 4); b.write(0)
    beU(b, commitLsn, 8); beU(b, endLsn, 8); beU(b, commitMicros, 8)
    frame(b.toByteArray)
  }

  def streamAbort(xid: Long, subXid: Long): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('A'); beU(b, xid, 4); beU(b, subXid, 4)
    frame(b.toByteArray)
  }

  def commit(commitLsn: Long, endLsn: Long, commitMicros: Long): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('C'); b.write(0)
    beU(b, commitLsn, 8); beU(b, endLsn, 8); beU(b, commitMicros, 8)
    frame(b.toByteArray)
  }

  def relation(relId: Long, namespace: String, name: String,
      replicaIdentity: Char,
      columns: Seq[PgOutput.RelColumn]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('R'); maybeXid(b); beU(b, relId, 4)
    cstr(b, namespace); cstr(b, name)
    b.write(replicaIdentity)
    beU(b, columns.size.toLong, 2)
    columns.foreach { c =>
      b.write(if (c.keyPart) 1 else 0)
      cstr(b, c.name)
      beU(b, c.typeOid.toLong, 4)
      beU(b, c.typeMod.toLong, 4)
    }
    frame(b.toByteArray)
  }

  private def tuple(b: ByteArrayOutputStream,
      values: Array[String]): Unit = {
    beU(b, values.length.toLong, 2)
    values.foreach {
      case null => b.write('n')
      case Checker.ToastSentinel => b.write('u')
      case v =>
        b.write('t')
        val raw = v.getBytes(StandardCharsets.UTF_8)
        beU(b, raw.length.toLong, 4)
        b.write(raw, 0, raw.length)
    }
  }

  def insert(relId: Long, values: Array[String]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('I'); maybeXid(b); beU(b, relId, 4); b.write('N')
    tuple(b, values)
    frame(b.toByteArray)
  }

  def update(relId: Long, oldKind: Option[Char],
      oldValues: Option[Array[String]],
      newValues: Array[String]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('U'); maybeXid(b); beU(b, relId, 4)
    oldKind.foreach { k => b.write(k); tuple(b, oldValues.get) }
    b.write('N'); tuple(b, newValues)
    frame(b.toByteArray)
  }

  def delete(relId: Long, oldKind: Char,
      oldValues: Array[String]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('D'); maybeXid(b); beU(b, relId, 4); b.write(oldKind)
    tuple(b, oldValues)
    frame(b.toByteArray)
  }

  def truncate(cascade: Boolean, restartIdentity: Boolean,
      relIds: Seq[Long]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('T'); maybeXid(b); beU(b, relIds.size.toLong, 4)
    b.write((if (cascade) 1 else 0) | (if (restartIdentity) 2 else 0))
    relIds.foreach(id => beU(b, id, 4))
    frame(b.toByteArray)
  }

  def logicalMessage(transactional: Boolean, lsn: Long, prefix: String,
      content: Array[Byte]): Unit = {
    val b = new ByteArrayOutputStream()
    b.write('M'); maybeXid(b); b.write(if (transactional) 1 else 0)
    beU(b, lsn, 8); cstr(b, prefix)
    beU(b, content.length.toLong, 4)
    b.write(content, 0, content.length)
    frame(b.toByteArray)
  }
}
