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
      System.currentTimeMillis() * 1000L) {
  import PgWire._
  import PgReplicationPump._

  var flushedLsn: Long =
    if (cfg.slot.startLsn.nonEmpty) parseLsn(cfg.slot.startLsn) else 0L
  private[transport] var segmentIndex = 0
  private[transport] var segmentBytes = 0L
  var reconnects = 0
  var framesAppended = 0L
  val warnings =
    scala.collection.mutable.ArrayBuffer.empty[String]

  /** One full session: dial, auth, slot lifecycle, START_REPLICATION,
    * pump until the wire fails or `until` says stop.
    */
  def runSession(until: () => Boolean = () => false): Long = {
    val wire = dial()
    try {
      connect(wire)
      val startLsn = prepareSlot(wire)
      startReplication(wire, startLsn)
      pump(wire, until)
    } finally wire.close()
  }

  /** Supervised loop with capped exponential backoff; each reconnect
    * re-reads slot state so the resume LSN is the server's
    * confirmed_flush_lsn, never a stale local guess.
    */
  def run(until: () => Boolean,
      sleep: Long => Unit = Thread.sleep): Unit = {
    var consecutiveFailures = 0
    while (!until() && consecutiveFailures <= cfg.maxReconnects) {
      val before = framesAppended
      try {
        runSession(until)
        consecutiveFailures = 0
      } catch {
        case _: java.io.IOException | _: java.io.EOFException =>
          if (framesAppended > before) consecutiveFailures = 0
          consecutiveFailures += 1
          reconnects += 1
          if (!until() && consecutiveFailures <= cfg.maxReconnects)
            sleep(backoffMs(consecutiveFailures))
      }
    }
    if (consecutiveFailures > cfg.maxReconnects)
      throw new java.io.IOException(
        s"pg pump: gave up after ${cfg.maxReconnects} reconnects at " +
          renderLsn(flushedLsn))
  }

  def backoffMs(attempt: Int): Long =
    math.min(cfg.maxBackoffMs,
      cfg.baseBackoffMs * (1L << math.min(attempt - 1, 16)))

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
    val pubExists =
      runQuery(wire, PgSlotLifecycle.pubExistsQuery(pub)).rows.nonEmpty
    val statusRes =
      runQuery(wire, PgSlotLifecycle.slotStatusQuery(cfg.slot.slotName))
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
    * stored). Acks go out every `ackEveryFrames` data frames and on
    * every reply-requested keepalive.
    */
  private def pump(wire: Wire, until: () => Boolean): Long = {
    var appended = 0L
    var sinceAck = 0
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
              store.append(currentSegment(), body)
              segmentBytes += body.length
              if (segmentBytes >= cfg.maxSegmentBytes) rotate()
              if (endLsn > flushedLsn) flushedLsn = endLsn
              appended += 1; framesAppended += 1; sinceAck += 1
              if (sinceAck >= cfg.ackEveryFrames) {
                ack(wire, replyRequested = false); sinceAck = 0
              }
            case 'k' =>
              store.append(currentSegment(), body) // decoder skips it
              val replyRequested = body.length >= 18 && body(17) == 1
              if (replyRequested) ack(wire, replyRequested = false)
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

  private[transport] def ack(wire: Wire, replyRequested: Boolean): Unit =
    wire.write(standbyStatusUpdate(flushedLsn, flushedLsn, flushedLsn,
      clockMicros(), replyRequested))

  private def currentSegment(): String = {
    if (segmentIndex == 0) segmentIndex = 1
    f"pgoutput.$segmentIndex%06d.log"
  }

  private[transport] def rotate(): Unit = {
    store match {
      case fsStore: FsSegmentStore => fsStore.publish(currentSegment())
      case _ => ()
    }
    segmentIndex += 1
    segmentBytes = 0L
  }

  /** The resume token a restart persists: the server-confirmed flush
    * position (the pump re-reads the slot's confirmed_flush_lsn on
    * reconnect anyway — this is the monitoring/report value).
    */
  def position: String = renderLsn(flushedLsn)
}

object PgReplicationPump {
  final case class Config(user: String, password: String,
      database: String, slot: PgSlotLifecycle.SlotConfig,
      ackEveryFrames: Int = 64,
      maxSegmentBytes: Long = 64L * 1024 * 1024,
      maxReconnects: Int = 10, baseBackoffMs: Long = 500L,
      maxBackoffMs: Long = 60000L,
      /** SCRAM client nonce source — injectable so the RFC 7677
        * vectors drive the exchange byte-exactly in specs.
        */
      nonce: () => String = () => {
        val b = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(b)
        java.util.Base64.getEncoder.encodeToString(b)
      })
}
