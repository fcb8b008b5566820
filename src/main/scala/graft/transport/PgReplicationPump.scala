package graft.transport

import graft.sources.PgSlotLifecycle

/** The dial-and-pump layer between a live PostgreSQL server and the
  * pgoutput capture segments [[graft.sources.ChangelogSource]] streams
  * — the reference's PgCdcClient::start_replication flow
  * (dt-connector/src/extractor/pg/pg_cdc_client.rs:219-291): connect a
  * `replication=database` session, fetch publication/slot state, run
  * the [[PgSlotLifecycle]] plan, START_REPLICATION at the decided LSN,
  * then pump CopyData frames into segment files, acking flushed LSNs
  * with StandbyStatusUpdate and reconnecting with backoff from the
  * confirmed position.
  *
  * Stored frames are the bare 'w'/'k' inner frames —
  * [[graft.sources.PgOutput.decodeCapture]]'s segment format, so
  * everything downstream (decode on executors, compaction, sinks)
  * already runs on what this writes. Session GUCs before streaming
  * match the reference exactly: `extra_float_digits=3`,
  * `TIME ZONE 'UTC'` (pg_cdc_client.rs:283-285).
  */
final class PgReplicationPump(cfg: PgReplicationPump.Config,
    store: SegmentStore, dial: () => Wire,
    clockMicros: () => Long = () =>
      // the status-update clock field is microseconds since
      // 2000-01-01 (the PG epoch), NOT Unix epoch — a raw
      // currentTimeMillis would read ~30 years in the future in
      // pg_stat_replication.reply_time
      (System.currentTimeMillis() - PgReplicationPump.PgEpochMs)
        * 1000L) extends PumpSupervision {
  import PgWire._
  import PgReplicationPump._

  var flushedLsn: Long =
    if (cfg.slot.startLsn.nonEmpty) parseLsn(cfg.slot.startLsn) else 0L
  /** The LSN covered by PUBLISHED (durable) segments — the only value
    * an ack may carry as flushed: acking the in-flight spool would let
    * the server discard WAL a crash could still lose.
    */
  private[transport] var publishedLsn: Long = flushedLsn
  // resume segment numbering AFTER anything already published — a
  // restarted pump must never reuse a name (the stream checkpoint is
  // name-based and an overwrite would be invisible to the planner)
  var segmentIndex =
    SegmentNames.lastIndex(store, "pgoutput") + 1
  private[transport] var segmentBytes = 0L
  var framesAppended = 0L
  val warnings =
    scala.collection.mutable.ArrayBuffer.empty[String]
  override protected def progress: Long = framesAppended
  override protected def positionLabel: String = renderLsn(flushedLsn)
  override protected def maxReconnects: Int = cfg.maxReconnects
  override protected def baseBackoffMs: Long = cfg.baseBackoffMs
  override protected def maxBackoffMs: Long = cfg.maxBackoffMs

  /** One full session: dial, auth, slot lifecycle, START_REPLICATION,
    * pump until the wire fails or `until` says stop.
    */
  override def runSession(until: () => Boolean = () => false): Long = {
    discardInFlight()
    var wire = dial()
    try {
      wire = negotiateTls(wire)
      connect(wire)
      val startLsn = prepareSlot(wire)
      startReplication(wire, startLsn)
      val n = pump(wire, until)
      rotate() // publish the tail before a clean session end
      n
    } finally wire.close()
  }

  /** A dead session's UNPUBLISHED spool would duplicate under the
    * reconnect's re-stream: the server resumes from
    * confirmed_flush_lsn (= publishedLsn), which precedes everything
    * still in the spool, so those frames arrive again and would
    * append after the stale copies (plus a possible Begin-without-
    * Commit partial). Discard the spool, take a fresh name (never
    * reuse — the checkpoint is name-based), and pull the receive
    * watermark back to the durable point: without the reset, an
    * early rotation in the new session would ack the DEAD session's
    * high-water as flushed — WAL the new session hasn't re-captured
    * yet, which a second crash would then lose.
    */
  private def discardInFlight(): Unit = {
    if (segmentStarted) {
      store.discard(currentSegment())
      segmentIndex += 1
      segmentBytes = 0L
      segmentStarted = false
      segmentHasData = false
    }
    openStreams.clear()
    inChunk = false
    flushedLsn = publishedLsn
  }

  /** `?sslmode=` state machine (PG SSLRequest, a STARTTLS-style
    * preamble BEFORE the startup message): disable → plaintext;
    * prefer → TLS if the server answers 'S' else plaintext;
    * require/verify-* → TLS or fail. A `hostssl`-only pg_hba rejects
    * plaintext startup, so without this the dial simply cannot reach
    * managed/TLS-required servers.
    */
  private def negotiateTls(wire: Wire): Wire = {
    val mode = Tls.normalizeMode(cfg.sslMode)
    if (!Tls.wanted(mode)) return wire
    wire.write(PgWire.sslRequest())
    (wire.read(1)(0) & 0xff).toChar match {
      case 'S' => cfg.tlsUpgrade(wire, mode)
      case 'N' if mode == "preferred" => wire
      case 'N' => throw new java.io.IOException(
        s"sslmode=$mode but the server refused SSLRequest")
      case other => throw new java.io.IOException(
        s"unexpected SSLRequest answer '$other'")
    }
  }

  // supervision from PumpSupervision; each reconnect re-reads slot
  // state so the resume LSN is the server's confirmed_flush_lsn,
  // never a stale local guess

  // ---------------------------------------------------------- phases

  private def connect(wire: Wire): Unit = {
    wire.write(startup(cfg.user, cfg.database))
    var ready = false
    var scram: Option[(Scram.Exchange, String)] = None // (ex, serverSig)
    while (!ready) {
      val (tag, body) = readMessage(wire)
      tag match {
        case 'R' =>
          val code = ((body(0) & 0xff) << 24) | ((body(1) & 0xff) << 16) |
            ((body(2) & 0xff) << 8) | (body(3) & 0xff)
          code match {
            case 0 => () // AuthenticationOk
            case 3 => wire.write(passwordMessage(cfg.password))
            case 5 => wire.write(
              md5Password(cfg.user, cfg.password, body.slice(4, 8)))
            case 10 => // AuthenticationSASL: NUL-separated mechanisms
              val mechs = new String(body.drop(4), "UTF-8")
                .split("\u0000").filter(_.nonEmpty).toSet
              require(mechs.contains("SCRAM-SHA-256"),
                s"no supported SASL mechanism in $mechs " +
                  "(SCRAM-SHA-256 is implemented; -PLUS needs TLS)")
              val ex = Scram.Exchange(cfg.user, cfg.password,
                cfg.nonce())
              scram = Some((ex, ""))
              wire.write(Scram.initialResponse("SCRAM-SHA-256",
                ex.clientFirst))
            case 11 => // AuthenticationSASLContinue: server-first
              val (ex, _) = scram.getOrElse(throw new java.io.IOException(
                "SASLContinue without SASL start"))
              val serverFirst = new String(body.drop(4), "UTF-8")
              val (clientFinal, serverSig) = ex.clientFinal(serverFirst)
              scram = Some((ex, serverSig))
              wire.write(Scram.response(clientFinal))
            case 12 => // AuthenticationSASLFinal: verify v=<sig>
              val (_, wantSig) = scram.getOrElse(
                throw new java.io.IOException(
                  "SASLFinal without SASL exchange"))
              val serverFinal = new String(body.drop(4), "UTF-8")
              if (serverFinal != s"v=$wantSig")
                throw new java.io.IOException(
                  "scram: server signature mismatch — refusing to " +
                    "stream from an unauthenticated peer")
            case other => throw new java.io.IOException(
              s"unsupported pg auth method $other " +
                "(cleartext, md5, and SCRAM-SHA-256 are implemented)")
          }
        case 'E' =>
          throw new java.io.IOException(s"pg startup: ${parseError(body)}")
        case 'Z' => ready = true
        case 'S' | 'K' | 'N' => () // parameter status / backend key
        case other =>
          throw new java.io.IOException(s"unexpected startup '$other'")
      }
    }
  }

  /** Fetch state, run the lifecycle plan, return the LSN to stream
    * from. When the plan creates the slot, the CREATE result's
    * `consistent_point` column is the start LSN (pg_cdc_client.rs:239).
    */
  private def prepareSlot(wire: Wire): String = {
    val pub = PgSlotLifecycle.publicationName(cfg.slot)
    // a FAILED status query is not "does not exist": planning CREATE
    // against an unreadable catalog dies later on "already exists"
    // and burns the reconnect ladder on a misleading error — surface
    // the real failure (usually privileges) here
    val pubRes = runQuery(wire, PgSlotLifecycle.pubExistsQuery(pub))
    if (pubRes.error.nonEmpty)
      throw new java.io.IOException(
        s"publication status query: ${pubRes.error}")
    val pubExists = pubRes.rows.nonEmpty
    val statusRes =
      runQuery(wire, PgSlotLifecycle.slotStatusQuery(cfg.slot.slotName))
    if (statusRes.error.nonEmpty)
      throw new java.io.IOException(
        s"slot status query: ${statusRes.error}")
    val status = PgSlotLifecycle.SlotStatus(
      exists = statusRes.rows.nonEmpty,
      confirmedFlushLsn = statusRes.rowMaps.headOption
        .flatMap(_.get("confirmed_flush_lsn")).map(Option(_)
          .getOrElse("")).getOrElse(""))
    val plan = PgSlotLifecycle.plan(cfg.slot, status, pubExists)
    warnings ++= plan.warnings
    var consistentPoint = ""
    plan.statements.foreach { stmt =>
      val res = runQuery(wire, stmt)
      if (res.error.nonEmpty)
        throw new java.io.IOException(s"slot lifecycle: ${res.error}")
      res.rowMaps.headOption.flatMap(_.get("consistent_point"))
        .foreach(consistentPoint = _)
    }
    val start = plan.startLsn.getOrElse {
      require(consistentPoint.nonEmpty,
        "CREATE_REPLICATION_SLOT returned no consistent_point")
      consistentPoint
    }
    flushedLsn = math.max(flushedLsn, parseLsn(start))
    start
  }

  private def startReplication(wire: Wire, startLsn: String): Unit = {
    runQuery(wire, "SET extra_float_digits=3")
    runQuery(wire, "SET TIME ZONE 'UTC'")
    val pub = PgSlotLifecycle.publicationName(cfg.slot)
    wire.write(query(PgSlotLifecycle.startReplicationSql(
      cfg.slot.slotName, startLsn, pub, cfg.slot.streaming)))
    val (tag, body) = readMessage(wire)
    tag match {
      case 'W' => () // CopyBothResponse: streaming
      case 'E' =>
        throw new java.io.IOException(
          s"START_REPLICATION: ${parseError(body)}")
      case other =>
        throw new java.io.IOException(s"expected CopyBoth, got '$other'")
    }
  }

  /** CopyData frames: XLogData ('w', stored; its end LSN advances the
    * flush watermark) and keepalive ('k', reply honored, never
    * stored durably as data).
    *
    * Rotation and acknowledgment happen ONLY at transaction
    * boundaries (after a Commit frame, outside any txn): a segment
    * must be independently decodable, so it may not split a
    * transaction, and the acked (flushed) LSN may only cover
    * PUBLISHED segments — acking the in-flight spool would let the
    * server discard WAL a crash could still lose. Relation frames are
    * cached and re-emitted at the head of every new segment (pg sends
    * Relation once per session; a rotated segment must still be
    * self-describing).
    */
  private def pump(wire: Wire, until: () => Boolean): Long = {
    var appended = 0L
    var sinceAck = 0
    var inTxn = false
    while (!until()) {
      val (tag, body) = readMessage(wire)
      tag match {
        case 'd' =>
          (body(0) & 0xff).toChar match {
            case 'w' =>
              def be(off: Int): Long = {
                var v = 0L
                (0 until 8).foreach(i =>
                  v = (v << 8) | (body(off + i) & 0xffL))
                v
              }
              val endLsn = be(9) // walEnd
              // message tag is the first payload byte after the
              // 25-byte XLogData header ('w' + 3×8)
              val msgTag = if (body.length > 25) (body(25) & 0xff).toChar
                else ' '
              def xidAt26: Long = {
                var x = 0L
                (0 until 4).foreach(i =>
                  x = (x << 8) | (body(26 + i) & 0xffL))
                x
              }
              msgTag match {
                case 'B' => inTxn = true
                case 'C' => inTxn = false
                case 'R' =>
                  // inside a stream CHUNK the relation carries a
                  // 4-byte xid prefix (protocol v2) — cache the
                  // NORMALIZED plain form: the replay lands at a new
                  // segment's head, where the decoder is outside any
                  // stream and a prefixed frame parses 4 bytes
                  // shifted (truncation/garbage columns)
                  cacheRelation(
                    if (inChunk) stripStreamXid(body) else body)
                // v2 STREAMED transactions: chunks of one xid may
                // interleave with other traffic between Stream Start
                // and Stream Commit/Abort — the decoder buffers them
                // PER SEGMENT, so a cut while any streamed xid is
                // open would strand its earlier chunks in a segment
                // whose commit never arrives (lost rows). Track the
                // open xids and gate rotation on the set draining,
                // exactly like the plain-txn inTxn guard.
                case 'S' if body.length >= 30 =>
                  inChunk = true
                  openStreams += xidAt26: Unit
                case 'E' => inChunk = false // Stream Stop: chunk ends
                case 'c' | 'A' if body.length >= 30 =>
                  openStreams -= xidAt26: Unit
                case _ => ()
              }
              appendFrame(body)
              segmentHasData = true
              if (endLsn > flushedLsn) flushedLsn = endLsn
              appended += 1; framesAppended += 1; sinceAck += 1
              if (!inTxn && openStreams.isEmpty &&
                  (sinceAck >= cfg.ackEveryFrames ||
                  segmentBytes >= cfg.maxSegmentBytes || segmentAged)) {
                rotate()
                ack(wire, replyRequested = false); sinceAck = 0
              }
            case 'k' =>
              appendFrame(body) // decoder skips it
              // max_segment_secs on the QUIET path: server keepalives
              // tick every wal_sender_timeout/2 even with no data, so
              // an aged segment publishes on a bounded cadence instead
              // of waiting for the next data frame
              if (!inTxn && openStreams.isEmpty && segmentAged) {
                rotate()
                ack(wire, replyRequested = false); sinceAck = 0
              }
              val replyRequested = body.length >= 18 && body(17) == 1
              if (replyRequested) {
                // a keepalive may arrive mid-txn: ack what is durable
                // (publishedLsn), never the in-flight spool
                ack(wire, replyRequested = false)
              }
            case other => throw new java.io.IOException(
              s"unexpected replication frame '$other'")
          }
        case 'E' =>
          throw new java.io.IOException(s"stream: ${parseError(body)}")
        case 'c' => return appended // CopyDone: server ended the stream
        case 'Z' | 'C' => ()
        case other =>
          throw new java.io.IOException(s"unexpected message '$other'")
      }
    }
    appended
  }

  /** Open v2 streamed-transaction xids (Stream Start seen, no Stream
    * Commit/Abort yet) — rotation must wait for the set to drain.
    */
  private val openStreams = scala.collection.mutable.Set[Long]()

  /** Between Stream Start and Stream Stop (inside one chunk), where
    * data messages carry a 4-byte xid prefix.
    */
  private var inChunk = false

  /** Drop the 4-byte xid prefix of an in-chunk message frame:
    * XLogData header (25) + tag (1) + xid (4) + plain payload.
    */
  private def stripStreamXid(body: Array[Byte]): Array[Byte] = {
    if (body.length < 30) return body
    val out = new Array[Byte](body.length - 4)
    System.arraycopy(body, 0, out, 0, 26)
    System.arraycopy(body, 30, out, 26, body.length - 30)
    out
  }

  /** Relation frames by relId — re-emitted into every new segment. */
  private val relationFrames =
    scala.collection.mutable.LinkedHashMap[Long, Array[Byte]]()

  private def cacheRelation(frame: Array[Byte]): Unit = {
    var relId = 0L
    (0 until 4).foreach(i =>
      relId = (relId << 8) | (frame(26 + i) & 0xffL))
    relationFrames(relId) = frame
  }

  private var segmentStarted = false
  private var segmentStartMs = 0L
  private var segmentHasData = false

  /** `max_segment_secs`: the open segment holds DATA frames and is
    * older than the knob (0 = size/frame-count rotation only).
    * Keepalive frames and replayed Relation headers don't count —
    * aging on them would publish a data-free junk segment per
    * keepalive tick on an idle stream, forever.
    */
  private def segmentAged: Boolean =
    cfg.maxSegmentSecs > 0 && segmentHasData &&
      cfg.clockMs() - segmentStartMs >= cfg.maxSegmentSecs * 1000L

  private def appendFrame(body: Array[Byte]): Unit = {
    if (!segmentStarted) {
      segmentStartMs = cfg.clockMs()
      // self-describing segments: replay the cached Relations first
      // (skip if THIS frame is one of them — it describes itself)
      relationFrames.values.foreach { rf =>
        if (!(rf eq body)) {
          store.append(currentSegment(), rf)
          segmentBytes += rf.length
        }
      }
      segmentStarted = true
    }
    store.append(currentSegment(), body)
    segmentBytes += body.length
  }

  private[transport] def ack(wire: Wire, replyRequested: Boolean): Unit =
    // written = received; flushed/applied = DURABLE (published) only
    wire.write(standbyStatusUpdate(flushedLsn, publishedLsn,
      publishedLsn, clockMicros(), replyRequested))

  /** Make the current segment durable and advance the ackable LSN. */
  private def publish(): Unit = {
    store.publish(currentSegment())
    publishedLsn = flushedLsn
  }

  private def currentSegment(): String =
    f"pgoutput.$segmentIndex%06d.log"

  /** Rotation publishes only segments holding DATA frames ('w'
    * stream content — rows, relations, txn control): a tail of
    * keepalive bytes alone is not worth a published (and planned,
    * and checkpointed) segment.
    */
  private[transport] def rotate(): Unit = {
    if (segmentHasData) {
      publish()
      segmentIndex += 1
      segmentBytes = 0L
      segmentStarted = false
      segmentHasData = false
    }
  }

  /** The resume token a restart persists: the server-confirmed flush
    * position (the pump re-reads the slot's confirmed_flush_lsn on
    * reconnect anyway — this is the monitoring/report value).
    */
  def position: String = renderLsn(flushedLsn)
}

object PgReplicationPump {
  /** 2000-01-01T00:00:00Z in Unix millis (the PG timestamp epoch). */
  final val PgEpochMs = 946684800000L

  final case class Config(user: String, password: String,
      database: String, slot: PgSlotLifecycle.SlotConfig,
      ackEveryFrames: Int = 64,
      maxSegmentBytes: Long = 64L * 1024 * 1024,
      /** `[extractor] max_segment_secs` (0 = off) — bounds a quiet
        * stream's landing latency in resident mode.
        */
      maxSegmentSecs: Long = 0L,
      /** Clock seam so specs drive the time-based rotation. */
      clockMs: () => Long = () => System.currentTimeMillis(),
      maxReconnects: Int = 10, baseBackoffMs: Long = 500L,
      maxBackoffMs: Long = 60000L,
      /** `?sslmode=` from the connection URL (default: plaintext). */
      sslMode: String = "disabled",
      /** STARTTLS seam: production upgrades via JSSE; specs inject a
        * marker to drive the state machine on FakeWire.
        */
      tlsUpgrade: (Wire, String) => Wire = Tls.upgrade,
      /** SCRAM client nonce source — injectable so the RFC 7677
        * vectors drive the exchange byte-exactly in specs.
        */
      nonce: () => String = () => {
        val b = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(b)
        java.util.Base64.getEncoder.encodeToString(b)
      })
}
