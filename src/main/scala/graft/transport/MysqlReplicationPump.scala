package graft.transport

import graft.meta.GtidSet

/** The dial-and-pump layer between a live MySQL server and
  * [[graft.sources.ChangelogSource]]'s capture-segment contract — the
  * reference's MysqlCdcExtractor::extract_internal loop
  * (dt-connector/src/extractor/mysql/mysql_cdc_extractor.rs:141-192):
  * connect, authenticate, issue COM_BINLOG_DUMP(_GTID), then append
  * every streamed event to the current segment file, rotating files on
  * Rotate events and reconnecting with backoff from the last tracked
  * position.
  *
  * The pump stores RAW event bytes — decode happens downstream in
  * [[graft.sources.MysqlBinlog]] on executors, so the single pump
  * thread does no per-row work (the same split as the reference, whose
  * binlog client also hands row decode to the extractor). Segment
  * files start with the 4-byte binlog magic, making each one
  * independently decodable (the layout MysqlBinlog.decodeFile and the
  * scenario corpus already use).
  *
  * Start-position policy (mysql_cdc_extractor.rs:142-149): GTID set if
  * gtid_enabled and non-empty; else (file, pos) if file configured;
  * else latest.
  */
final class MysqlReplicationPump(cfg: MysqlReplicationPump.Config,
    store: SegmentStore, dial: () => Wire) extends PumpSupervision {
  import MysqlWire._
  import MysqlReplicationPump._

  /** Live stream position, updated as events stream (diagnostics). */
  private[transport] var currentFile: String = cfg.binlogFilename
  private[transport] var currentPos: Long = math.max(cfg.binlogPosition, 4L)
  /** TRANSACTION-SAFE resume position: advances only at commit
    * boundaries (Xid / COMMIT query) and file rotations. Resuming
    * from the live per-event position after a mid-transaction drop
    * would start the new segment past its TableMap — row events with
    * no map in their segment, a permanent decode wedge
    * (MysqlBinlog.parseRows throws on unmapped table ids).
    */
  private[transport] var safeFile: String = cfg.binlogFilename
  private[transport] var safePos: Long = math.max(cfg.binlogPosition, 4L)
  private[transport] val gtids: GtidSet =
    if (cfg.gtidSet.nonEmpty) GtidSet.parse(cfg.gtidSet) else new GtidSet
  /** The in-flight transaction's GTID — added to the resume set ONLY
    * at its commit boundary. Adding at the GTID_LOG_EVENT (the
    * pre-r15 behavior) made a mid-transaction reconnect EXCLUDE the
    * rest of that transaction from the new dump: silent loss of its
    * uncaptured tail (the reference tracks committed GTIDs only).
    */
  private var pendingGtid: String = null
  override protected def progress: Long = eventsAppended
  override protected def positionLabel: String =
    s"$currentFile:$currentPos"
  override protected def maxReconnects: Int = cfg.maxReconnects
  override protected def baseBackoffMs: Long = cfg.baseBackoffMs
  override protected def maxBackoffMs: Long = cfg.maxBackoffMs

  /** One full session: dial, handshake/auth, request the dump, pump
    * until the wire fails or `until` says stop. Returns the number of
    * events appended this session.
    *
    * Every session opens a FRESH segment (rotate at dial): the
    * streaming checkpoint downstream is name-based, so appending a
    * reconnected session's events to a name that may already be
    * published (and consumed) would overwrite it invisibly — the
    * never-reuse-a-published-name invariant SegmentNames documents.
    */
  override def runSession(until: () => Boolean = () => false): Long = {
    var wire = dial()
    rotate()
    try {
      wire = handshake(wire) // may upgrade to TLS mid-protocol
      configureChecksum(wire)
      requestDump(wire)
      pump(wire, until)
    } finally wire.close()
  }

  var eventsAppended = 0L

  // ---------------------------------------------------------- phases

  /** Greeting → optional STARTTLS upgrade → HandshakeResponse → the
    * auth conversation. Returns the wire to keep using (the TLS face
    * when upgraded). Sequence ids are derived from each server reply
    * (reply seq + 1) — the TLS preamble consumes one id, so hardcoded
    * numbering would desynchronize a real server.
    */
  private def handshake(wire0: Wire): Wire = {
    val (greetSeq, greeting) = readPacket(wire0)
    classify(greeting) match {
      case Err(code, msg) =>
        throw new java.io.IOException(s"mysql greeting error $code: $msg")
      case _ => ()
    }
    val hs = parseHandshake(greeting)

    // ssl-mode state machine (reference URL surface `?ssl-mode=…`,
    // docs/en/config.md:31): disabled → plaintext; preferred → TLS if
    // the server offers CLIENT_SSL else plaintext; required/verify-* →
    // TLS or fail loudly
    val mode = Tls.normalizeMode(cfg.sslMode)
    val serverSsl = (hs.capabilities & CapSsl) != 0
    var tlsActive = false
    var wire = wire0
    var seq = greetSeq + 1
    if (Tls.wanted(mode)) {
      if (serverSsl) {
        writePacket(wire, seq, sslRequest())
        wire = cfg.tlsUpgrade(wire, mode)
        tlsActive = true
        seq += 1
      } else if (mode != "preferred")
        throw new java.io.IOException(
          s"ssl-mode=$mode but the server does not offer CLIENT_SSL")
    }

    writePacket(wire, seq, handshakeResponse(cfg.user, cfg.password,
      hs.scramble, hs.authPlugin,
      extraCaps = if (tlsActive) CapSsl else 0L))
    // the auth conversation: OK | ERR | AuthSwitchRequest (0xfe — the
    // server prefers another plugin) | AuthMoreData (0x01 —
    // caching_sha2's fast/full verdict)
    var scramble = hs.scramble
    var done = false
    while (!done) {
      val (replySeq, reply) = readPacket(wire)
      (reply(0) & 0xff) match {
        case 0x00 => done = true
        case 0xff => classify(reply) match {
          case Err(code, msg) => throw new java.io.IOException(
            s"mysql auth failed $code: $msg")
          case _ => throw new java.io.IOException("unreachable")
        }
        case 0xfe => // AuthSwitchRequest: redo auth with the plugin
          val sw = parseAuthSwitch(reply)
          scramble = sw.scramble
          writePacket(wire, replySeq + 1,
            authResponse(sw.plugin, cfg.password, sw.scramble))
        case 0x01 => // AuthMoreData (caching_sha2_password)
          (reply.lift(1).map(_ & 0xff).getOrElse(-1)) match {
            case 0x03 => () // fast_auth_success: OK packet follows
            case 0x04 if tlsActive =>
              // full auth over TLS: the NUL-terminated password in
              // the clear (the channel is encrypted)
              writePacket(wire, replySeq + 1,
                cfg.password.getBytes("UTF-8") :+ 0.toByte)
            case 0x04 =>
              // full auth without TLS: request the server's RSA
              // public key (0x02), then send the scramble-obfuscated
              // password OAEP-encrypted under it
              writePacket(wire, replySeq + 1, Array[Byte](0x02))
              val (pkSeq, pkReply) = readPacket(wire)
              if ((pkReply(0) & 0xff) != 0x01)
                throw new java.io.IOException(
                  "expected AuthMoreData with the RSA public key, " +
                    s"got ${pkReply(0) & 0xff}")
              val pem = new String(pkReply, 1, pkReply.length - 1,
                "UTF-8")
              writePacket(wire, pkSeq + 1,
                rsaEncryptedPassword(cfg.password, scramble, pem))
            case other => throw new java.io.IOException(
              s"unexpected AuthMoreData payload $other")
          }
        case other =>
          throw new java.io.IOException(s"unexpected auth reply $other")
      }
    }
    wire
  }

  /** Session setup before the dump: checksums off so event bytes land
    * exactly as the decoder expects, and @master_heartbeat_period set
    * so an IDLE server keeps the wire warm — without it a quiet
    * database looks like a dead connection at read-timeout, and the
    * reconnect budget burns down on a healthy source
    * (mysql_cdc_extractor.rs sets with_master_heartbeat for the same
    * reason).
    */
  private def configureChecksum(wire: Wire): Unit = {
    def run(sql: String): Unit = {
      writePacket(wire, 0, comQuery(sql))
      val (_, reply) = readPacket(wire)
      classify(reply) match {
        case Err(code, msg) => throw new java.io.IOException(
          s"session setup failed $code: $msg")
        case _ => ()
      }
    }
    run("SET @master_binlog_checksum='NONE'")
    // nanoseconds, must be under the read timeout to be useful
    run("SET @master_heartbeat_period=" +
      s"${cfg.heartbeatPeriodSecs * 1000000000L}")
  }

  private def requestDump(wire: Wire): Unit = {
    val cmd =
      if (cfg.gtidEnabled && !gtids.isEmpty)
        comBinlogDumpGtid(cfg.serverId, gtids)
      else if (safeFile.nonEmpty)
        // the TXN-SAFE position, never the live one: a mid-txn
        // resume would strand row events without their TableMap
        comBinlogDump(cfg.serverId, safeFile, safePos)
      // no position configured: an empty filename streams from the
      // EARLIEST retained binlog (the server's oldest log) — callers
      // wanting "latest only" must name a start file or gtid set
      else comBinlogDump(cfg.serverId, "", 4L)
    writePacket(wire, 0, cmd)
  }

  /** Event packets: 0x00 OK prefix + raw binlog event bytes. */
  private def pump(wire: Wire, until: () => Boolean): Long = {
    var appended = 0L
    while (!until()) {
      val (_, payload) = readPacket(wire)
      classify(payload) match {
        case Eof() => return appended
        case Err(code, msg) =>
          throw new java.io.IOException(s"dump stream error $code: $msg")
        case _ =>
          val event = payload.drop(1) // strip the OK prefix
          handleEvent(event)
          appended += 1
          eventsAppended += 1
      }
    }
    appended
  }

  /** Event header: ts(4) type(1) server_id(4) event_len(4) log_pos(4)
    * flags(2). Rotate (0x04) switches the segment; heartbeat (0x1b) is
    * transport-only and never stored.
    */
  private[transport] def handleEvent(event: Array[Byte]): Unit = {
    def le(off: Int, n: Int): Long = {
      var v = 0L; var i = 0
      while (i < n) { v |= (event(off + i) & 0xffL) << (8 * i); i += 1 }
      v
    }
    val eventType = event(4) & 0xff
    val logPos = le(13, 4)
    // FDE carries the stream's checksum algorithm (alg byte at len-5,
    // disambiguated by CRC self-validation — the same discovery
    // MysqlBinlog.readOneEvent applies). A server honoring the
    // SET ...checksum='NONE' session var sends alg=0; the trailer
    // only matters here for parsing the Rotate file name.
    if (eventType == 0x0f && event.length >= 24 &&
        (event(event.length - 5) & 0xff) == 1) {
      val crc = new java.util.zip.CRC32
      crc.update(event, 0, event.length - 4)
      var stored = 0L
      (0 until 4).foreach(i =>
        stored |= (event(event.length - 4 + i) & 0xffL) << (8 * i))
      checksumAlg = if (crc.getValue == stored) 1 else 0
    } else if (eventType == 0x0f) checksumAlg = 0
    val crcTrail = if (checksumAlg == 1 && eventType != 0x0f) 4 else 0
    eventType match {
      case 0x04 => // Rotate: position(8) + next file name
        val nextFile = new String(event, 27,
          event.length - 27 - crcTrail, "UTF-8")
        // server file boundary = our segment boundary (publish point);
        // the segment NAME stays pump-owned and monotone — see below
        if (currentFile.nonEmpty && currentFile != nextFile &&
            segmentStarted)
          rotate()
        currentFile = nextFile
        currentPos = le(19, 8)
        // a file boundary is a transaction boundary
        safeFile = nextFile
        safePos = currentPos
        atTxnBoundary = true
      case 0x1b =>
        // server heartbeat: transport-only, never stored — but an
        // IDLE stream must still bound landing latency: an aged
        // segment rotates here (only at a txn boundary — the other
        // lanes all publish their quiet path the same way; without
        // this, committed events sat unpublished until the next
        // transaction arrived, unbounded)
        if (segmentStarted && atTxnBoundary &&
            cfg.maxSegmentSecs > 0 &&
            cfg.clockMs() - segmentStartMs >=
              cfg.maxSegmentSecs * 1000L)
          rotate()
      case _ =>
        if (currentFile.isEmpty) currentFile = "binlog.000001"
        // every segment leads with the binlog magic — and, for a
        // segment cut mid-file, a REPLAY of the stream's FDE (the
        // decoder's checksum/layout discovery rides it; the PG pump
        // re-emits cached Relation frames for the same reason) — so
        // each file is independently decodable, mid-file resumes
        // included
        if (!segmentStarted) {
          store.append(currentSegment(), Magic)
          segmentStarted = true
          segmentBytes = Magic.length.toLong
          segmentStartMs = cfg.clockMs()
          if (fdeEvent != null && eventType != 0x0f) {
            store.append(currentSegment(), fdeEvent)
            segmentBytes += fdeEvent.length
          }
        }
        if (eventType == 0x0f) fdeEvent = event
        store.append(currentSegment(), event)
        segmentBytes += event.length
        if (logPos > 0) currentPos = logPos
        if (eventType == 0x21) trackGtid(event) // GTID_LOG_EVENT
        // TRANSACTION boundaries (after Xid, or after the Query
        // COMMIT that ends a non-transactional / MyISAM statement
        // group — those workloads never emit an Xid) drive three
        // things: the pending GTID joins the resume set (only now is
        // the transaction fully captured), the txn-safe resume
        // position advances, and mid-file rotation may cut (server
        // binlog files run to gigabytes; rotating only at file
        // boundaries leaves a resident lane's events unpublished for
        // the life of the file). A txn boundary is the safe cut —
        // the server re-sends TableMaps per transaction and the FDE
        // replays above, so the successor segment is
        // self-describing. The Query statement parse runs only on
        // Query events (statement-rate, not row-rate).
        val isTxnEnd = eventType == 0x10 ||
          (eventType == 0x02 && isCommitQuery(event, crcTrail))
        if (isTxnEnd) {
          if (pendingGtid != null) {
            gtids.add(pendingGtid): Unit
            pendingGtid = null
          }
          if (logPos > 0) {
            safeFile = currentFile
            safePos = logPos
          }
          atTxnBoundary = true
        } else if (eventType != 0x0f) atTxnBoundary = false
        val rotationDue = {
          val timeUp = cfg.maxSegmentSecs > 0 &&
            cfg.clockMs() - segmentStartMs >=
              cfg.maxSegmentSecs * 1000L
          segmentBytes >= cfg.maxSegmentBytes || timeUp
        }
        if (rotationDue && isTxnEnd) rotate()
    }
  }

  /** True between transactions (the only moments a heartbeat-driven
    * rotation may cut).
    */
  private var atTxnBoundary = true

  /** Is this Query event's statement `COMMIT`? Layout after the
    * 19-byte header: thread_id(4) exec_time(4) schema_len(1)
    * error_code(2) status_len(2) status_vars schema NUL statement
    * [crc]. Mirrors MysqlBinlog's Query parse; any malformed event
    * just answers "no" (rotation then waits for the next boundary).
    */
  private def isCommitQuery(event: Array[Byte],
      crcTrail: Int): Boolean = {
    if (event.length < 33 + crcTrail) return false
    val schemaLen = event(27) & 0xff
    val statusLen = (event(30) & 0xff) | ((event(31) & 0xff) << 8)
    val stmtStart = 32 + statusLen + schemaLen + 1
    val stmtLen = event.length - crcTrail - stmtStart
    stmtLen == 6 && {
      val s = new String(event, stmtStart, stmtLen, "UTF-8")
      s.equalsIgnoreCase("COMMIT")
    }
  }

  /** The stream's FormatDescription event, replayed at the head of
    * every mid-file-cut segment (checksum/layout discovery).
    */
  private var fdeEvent: Array[Byte] = null

  private var checksumAlg = 0

  /** GTID_LOG_EVENT body (after the 19-byte header): flags(1) +
    * sid(16) + gno(8 LE) — enough to advance the resume set.
    */
  private def trackGtid(event: Array[Byte]): Unit = {
    val sid = event.slice(20, 36)
    val hex = sid.map(b => f"${b & 0xff}%02x").mkString
    val uuid = s"${hex.substring(0, 8)}-${hex.substring(8, 12)}-" +
      s"${hex.substring(12, 16)}-${hex.substring(16, 20)}-" +
      s"${hex.substring(20)}"
    var gno = 0L
    (0 until 8).foreach(i => gno |= (event(36 + i) & 0xffL) << (8 * i))
    // PENDING until the commit boundary — see the field's scaladoc
    if (gno > 0) pendingGtid = s"$uuid:$gno"
  }

  /** Segment names are pump-owned and MONOTONE (`binlog.NNNNNN.log`),
    * resuming AFTER anything already published in the store — the same
    * discipline the PG/Redis/Mongo pumps use. Deriving names from the
    * server's binlog file name (the round-11 shape) silently LOST data
    * across restarts: a restarted pump re-capturing the same server
    * file republished an already-consumed name, FsSegmentStore
    * overwrote the object, and the name-based checkpoint skipped it
    * forever. Server-file attribution lives in `position`, not names.
    * Cross-segment event ordering holds because
    * ChangelogReaderFactory.baseSeq keys on the trailing number, which
    * now increases with arrival order by construction.
    */
  private var segmentIndex = SegmentNames.lastIndex(store, "binlog")
  private var segmentStarted = false
  private var segmentBytes = 0L
  private var segmentStartMs = 0L

  private def currentSegment(): String = f"binlog.$segmentIndex%06d.log"

  private def rotate(): Unit = {
    if (segmentIndex > 0 && segmentStarted) {
      store.publish(currentSegment())
      publishedPosition = position
    }
    segmentIndex += 1
    segmentStarted = false
  }

  /** The position covered by PUBLISHED (durable) segments — the only
    * value a caller may persist while the pump is mid-segment:
    * persisting the live `position` would skip the in-flight spool on
    * a crash (same argument as PgReplicationPump.publishedLsn).
    */
  @volatile var publishedPosition: (String, Long, String) =
    (cfg.binlogFilename, math.max(cfg.binlogPosition, 4L),
      if (cfg.gtidSet.nonEmpty) cfg.gtidSet else "")

  /** Call after an external `store.publishAll()` — everything the
    * pump appended is now durable, so the full position is ackable.
    */
  def markAllPublished(): Unit = publishedPosition = position

  /** The position a restart resumes from — persisted by the caller
    * through the existing DbResumer/position-store machinery. The
    * TXN-SAFE values: a restart, like a reconnect, must never start
    * a segment mid-transaction.
    */
  def position: (String, Long, String) =
    (safeFile, safePos, gtids.render)
}

object MysqlReplicationPump {
  private val Magic = Array[Byte](0xfe.toByte, 'b', 'i', 'n')

  /** [extractor] keys, reference defaults
    * (mysql_cdc_extractor.rs:120-133 logs exactly these).
    */
  final case class Config(user: String, password: String,
      serverId: Long = 200, binlogFilename: String = "",
      binlogPosition: Long = 4L, gtidEnabled: Boolean = false,
      gtidSet: String = "", heartbeatPeriodSecs: Long = 10L,
      /** Mid-file segment rotation (transaction-boundary cuts): by
        * size, and by age when `max_segment_secs` > 0 — bounds a
        * resident lane's landing latency against multi-GB server
        * binlog files.
        */
      maxSegmentBytes: Long = 512L * 1024 * 1024,
      maxSegmentSecs: Long = 0L,
      clockMs: () => Long = () => System.currentTimeMillis(),
      maxReconnects: Int = 10,
      baseBackoffMs: Long = 500L, maxBackoffMs: Long = 60000L,
      /** `?ssl-mode=` from the connection URL (default: plaintext). */
      sslMode: String = "disabled",
      /** STARTTLS seam: production upgrades the socket via JSSE;
        * specs inject a marker to drive the state machine on FakeWire.
        */
      tlsUpgrade: (Wire, String) => Wire = Tls.upgrade)
}
