package graft.transport

/** The Redis PSYNC dial-and-pump — the reference's
  * RedisPsyncExtractor::start_psync/receive_rdb/receive_aof socket
  * phase (dt-connector/src/extractor/redis/redis_psync_extractor.rs:
  * 104-175): AUTH/PING, `REPLCONF listening-port`, `PSYNC ? -1` (full)
  * or `PSYNC <repl_id> <offset>` (partial resync), then copy the
  * master's reply stream VERBATIM into capture segments — the exact
  * byte format [[graft.sources.RedisSource.RedisPsync.decode]] already
  * parses (FULLRESYNC/CONTINUE reply line + disk-backed or diskless
  * RDB bulk + RESP command tail), so everything downstream (RDB
  * parse, command-to-event rewrite, filtering, routing) runs on what
  * this writes.
  *
  * Replication acking: a replica must send `REPLCONF ACK <offset>`
  * periodically or the master drops it; the pump tracks the
  * command-stream offset (master offset + bytes past the RDB — the
  * same accounting decode() applies) and acks every `ackEveryBytes`.
  */
final class RedisReplicationPump(cfg: RedisReplicationPump.Config,
    store: SegmentStore, dial: () => Wire) extends PumpSupervision {
  import RedisReplicationPump._

  private[transport] var replId: String = cfg.replId
  private[transport] var replOffset: Long = cfg.replOffset
  var bytesCaptured = 0L
  override protected def progress: Long = bytesCaptured
  override protected def positionLabel: String = s"$replId:$replOffset"
  override protected def maxReconnects: Int = cfg.maxReconnects
  override protected def baseBackoffMs: Long = cfg.baseBackoffMs
  override protected def maxBackoffMs: Long = cfg.maxBackoffMs
  // continue numbering after anything already published: the capture
  // reader's cursor is name-based, so a restart must never reuse one
  private var segmentIndex = SegmentNames.lastIndex(store, "psync")
  private var segmentBytes = 0L
  private var segmentStartMs = cfg.clockMs()

  /** One session: handshake, psync, copy the stream until the wire
    * drops or `until` says stop. Returns bytes captured this session.
    */
  override def runSession(until: () => Boolean = () => false): Long = {
    val wire = dial()
    // one capture segment per session: a segment must START with its
    // session's PSYNC reply line to be independently decodable
    rotate()
    try {
      handshake(wire)
      val fullSync = replId.isEmpty && replOffset == 0
      // partial resync asks for the FIRST BYTE NEEDED: reploff + 1
      // (replication.c slaveTryPartialResynchronization) — sending the
      // processed offset would replay one byte and mis-frame the tail
      val (id, off) =
        if (fullSync) ("?", "-1") else (replId, (replOffset + 1).toString)
      wire.write(cmd("PSYNC", id, off))
      pump(wire, fullSync, until)
    } finally wire.close()
  }

  // supervision from PumpSupervision: partial resync on reconnect via
  // the tracked (repl_id, offset) — the +CONTINUE path

  // ---------------------------------------------------------- phases

  private def handshake(wire: Wire): Unit = {
    if (cfg.password.nonEmpty) {
      wire.write(
        if (cfg.user.nonEmpty) cmd("AUTH", cfg.user, cfg.password)
        else cmd("AUTH", cfg.password))
      expectOk(wire, "AUTH")
    }
    wire.write(cmd("PING"))
    val pong = readLine(wire)
    require(pong == "+PONG", s"unexpected PING reply: $pong")
    wire.write(cmd("REPLCONF", "listening-port", cfg.replPort.toString))
    expectOk(wire, "REPLCONF listening-port")
  }

  /** Copy the reply stream into the current capture segment: the
    * reply line verbatim, the RDB bulk with framing (disk-backed
    * `$<len>` or diskless `$EOF:<delim>`), then the command tail in
    * readSome chunks with periodic REPLCONF ACKs.
    *
    * Acks are BOTH byte-driven (ackEveryBytes of tail) and TIME-driven
    * (keepaliveIntervalSecs, reference redis_psync_extractor.rs:316):
    * a replica that only acks per-byte goes silent on a quiet master
    * — and during a long RDB transfer — so the master's repl-timeout
    * disconnects it every ~60 s. Time-based acks fire between reads,
    * including while the RDB bulk streams.
    */
  private def pump(wire: Wire, fullSync: Boolean,
      until: () => Boolean): Long = {
    var captured = 0L
    def capture(bytes: Array[Byte]): Unit = {
      store.append(currentSegment(), bytes)
      captured += bytes.length
      bytesCaptured += bytes.length
      segmentBytes += bytes.length
    }
    var lastAckMs = cfg.clockMs()
    def maybeAck(): Unit =
      if (cfg.clockMs() - lastAckMs >=
          cfg.keepaliveIntervalSecs * 1000L) {
        wire.write(cmd("REPLCONF", "ACK", replOffset.toString))
        lastAckMs = cfg.clockMs()
      }

    val reply = readLine(wire, skipKeepalives = true)
    capture((reply + "\r\n").getBytes("UTF-8"))
    if (reply.startsWith("+FULLRESYNC ")) {
      val parts = reply.drop(1).split(" ")
      // a wire drop mid-RDB must NOT adopt the new resync position
      // (the snapshot never landed): the current segment is discarded
      // (a truncated RDB can never decode) and the reconnect
      // re-requests a full sync from the PREVIOUS resume state
      try {
        // the RDB bulk: $<len> disk-backed or $EOF:<delim> diskless.
        // A master with a non-instant BGSAVE sends bare '\n'
        // keepalives before the '$' header (replication.c, the
        // reference's '\n\n\n$<length>' skip loop at
        // redis_psync_extractor.rs:186-196) — consumed and DISCARDED
        // (they precede the command tail, so they count toward no
        // offset, and the capture must stay independently decodable)
        val header = readLine(wire, skipKeepalives = true)
        capture((header + "\r\n").getBytes("UTF-8"))
        if (header.startsWith("$EOF:")) {
          val delim = header.drop(5).getBytes("UTF-8")
          val window = new scala.collection.mutable.ArrayDeque[Byte]()
          var done = false
          var sinceClock = 0
          while (!done) {
            val b = wire.read(1)
            capture(b)
            window.append(b(0))
            if (window.size > delim.length) window.removeHead(): Unit
            if (window.size == delim.length &&
              window.toArray.sameElements(delim)) done = true
            sinceClock += 1
            if (sinceClock >= 8192) { maybeAck(); sinceClock = 0 }
          }
        } else {
          require(header.startsWith("$"), s"bad RDB header: $header")
          var remaining = header.drop(1).toLong
          while (remaining > 0) {
            val chunk = wire.read(math.min(remaining, 1 << 16).toInt)
            capture(chunk)
            remaining -= chunk.length
            maybeAck()
          }
        }
      } catch {
        // IOException = wire drop; IllegalArgumentException = a
        // malformed header already capture()d — either way the
        // segment can never decode, so it must not publish, and the
        // discarded bytes must not count as progress (a drain that
        // landed NOTHING must not report success, and supervision
        // must be able to exhaust its reconnect budget against a
        // master that always dies mid-RDB)
        case e @ (_: java.io.IOException
            | _: IllegalArgumentException) =>
          store.discard(currentSegment())
          captured -= segmentBytes
          bytesCaptured -= segmentBytes
          segmentBytes = 0L
          throw e
      }
      replId = parts(1)
      replOffset = parts(2).toLong
      // a full RDB replaces all stream state, SELECT context included
      selectedDb = 0L
    } else {
      require(reply.startsWith("+CONTINUE"),
        s"unexpected PSYNC reply: $reply")
      // the master continues MID-STREAM and never re-sends SELECT:
      // replay the remembered db at the segment head so the resumed
      // segment decodes with correct db attribution (the FDE-replay
      // discipline, applied to redis' one piece of stream state).
      // Synthesized bytes count toward segmentBytes only — never the
      // master offset.
      if (selectedDb != 0L)
        capture(cmd("SELECT", selectedDb.toString))
    }

    // the live command tail: FRAME-ALIGNED capture — one whole RESP
    // command at a time, so a wire drop mid-command never publishes a
    // byte-truncated (undecodable) capture and the ack/resume offset
    // only ever covers complete commands. The old verbatim-chunk copy
    // left a drain-ended segment truncated mid-value, which wedged
    // the landing forever (decode throws, markConsumed never runs).
    var sinceAck = 0L
    // the time arm ages only segments holding NON-PING commands: an
    // idle master PINGs the stream every repl-ping-replica-period
    // (10 s), and those must be captured (they advance the master
    // offset) but aging on them would publish a data-free junk
    // segment per knob interval forever
    var segmentHasData = false
    val pingCmd = cmd("PING")
    while (!until()) {
      maybeAck()
      val command = readTailCommand(wire)
      capture(command)
      trackSelect(command)
      if (!java.util.Arrays.equals(command, pingCmd))
        segmentHasData = true
      replOffset += command.length
      sinceAck += command.length
      if (sinceAck >= cfg.ackEveryBytes) {
        wire.write(cmd("REPLCONF", "ACK", replOffset.toString))
        sinceAck = 0
      }
      // size- OR time-based rotation: without the time arm, a
      // low-volume stream's events sit unpublished (hence unlanded in
      // resident mode) until 64 MB accrues. The check runs at command
      // arrival, so the publish lag is bounded by the knob plus one
      // ping period.
      val timeUp = cfg.maxSegmentSecs > 0 && segmentHasData &&
        cfg.clockMs() - segmentStartMs >= cfg.maxSegmentSecs * 1000L
      if (segmentBytes >= cfg.maxSegmentBytes || timeUp) {
        segmentHasData = false
        // a rotated mid-tail segment must still decode on its own:
        // start it with the +CONTINUE line a partial-resync session
        // would produce at exactly this offset
        rotate()
        capture(s"+CONTINUE $replId\r\n".getBytes("UTF-8"))
        if (selectedDb != 0L)
          capture(cmd("SELECT", selectedDb.toString))
      }
    }
    captured
  }

  /** Track the stream's SELECT state from the raw command bytes
    * (`*2\r\n$6\r\nSELECT\r\n$n\r\n<db>\r\n`) — the one piece of
    * replication-stream state a mid-stream segment cut would lose.
    */
  private def trackSelect(command: Array[Byte]): Unit = {
    // byte-level probe before ANY allocation — this runs once per
    // captured command on the hot path, and almost no command is a
    // SELECT: "*2\r\n$6\r\nS..." (case-insensitive on the S)
    if (command.length < 14 || command(0) != '*' ||
        command(1) != '2' || command(4) != '$' ||
        command(5) != '6' ||
        (command(8) != 'S' && command(8) != 's')) return
    val s = new String(command, java.nio.charset.StandardCharsets
      .US_ASCII)
    if (!s.regionMatches(true, 4, "$6\r\nSELECT\r\n", 0, 12)) return
    // the db argument: "$<len>\r\n<digits>\r\n"
    val dollar = s.indexOf('$', 16)
    if (dollar < 0) return
    val nl = s.indexOf("\r\n", dollar)
    if (nl < 0) return
    val end = s.indexOf("\r\n", nl + 2)
    if (end < 0) return
    s.substring(nl + 2, end).toLongOption
      .foreach(db => selectedDb = db)
  }

  /** Read ONE replication-stream command verbatim
    * (`*N\r\n($len\r\narg\r\n)×N`). Nothing is captured until the
    * whole command arrived — a drop mid-command propagates with the
    * segment still ending at the previous command boundary. Bare `\n`
    * keepalives between commands advance the master offset but are
    * not data.
    */
  private def readTailCommand(wire: Wire): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    // bare \n keepalives between commands are offset-counted by the
    // master AND captured (the decoder skips them), so landed
    // per-command offsets stay aligned with the pump's acks
    var first = wire.read(1)
    while (first(0) == '\n') {
      out.write(first(0))
      first = wire.read(1)
    }
    require(first(0) == '*',
      s"unexpected replication-stream byte ${first(0) & 0xff}")
    out.write(first(0))
    def lineInto(): String = {
      val s = new java.io.ByteArrayOutputStream()
      var done = false
      while (!done) {
        val b = wire.read(1)(0)
        out.write(b)
        if (b == '\r') {
          val n = wire.read(1)(0)
          out.write(n)
          require(n == '\n', "bare CR in RESP line")
          done = true
        } else s.write(b)
      }
      new String(s.toByteArray, "UTF-8")
    }
    val argc = lineInto().toInt
    (0 until argc).foreach { _ =>
      val h = new java.io.ByteArrayOutputStream()
      var b = wire.read(1)(0)
      out.write(b)
      require(b == '$', s"expected bulk string, got ${b & 0xff}")
      var done = false
      while (!done) {
        b = wire.read(1)(0)
        out.write(b)
        if (b == '\r') {
          val n = wire.read(1)(0)
          out.write(n)
          require(n == '\n', "bare CR in RESP line")
          done = true
        } else h.write(b)
      }
      val len = new String(h.toByteArray, "UTF-8").toInt
      out.write(wire.read(len))
      out.write(wire.read(2)) // trailing CRLF
    }
    out.toByteArray
  }

  private def expectOk(wire: Wire, what: String): Unit = {
    val reply = readLine(wire)
    require(reply == "+OK", s"$what reply is not +OK: $reply")
  }

  /** `skipKeepalives`: consume and discard bare '\n' bytes BEFORE the
    * line starts — a busy master sends them while a BGSAVE is pending,
    * and folding them into the header makes require() throw an
    * IllegalArgumentException that supervision does not retry.
    */
  private def readLine(wire: Wire,
      skipKeepalives: Boolean = false): String = {
    val out = new java.io.ByteArrayOutputStream()
    var done = false
    var leading = skipKeepalives
    while (!done) {
      val b = wire.read(1)(0) & 0xff
      if (leading && b == '\n') () // pre-line keepalive: not data
      else {
        leading = false
        if (b == '\r') {
          val n = wire.read(1)(0) & 0xff
          require(n == '\n', "bare CR in RESP line")
          done = true
        } else out.write(b)
      }
    }
    new String(out.toByteArray, "UTF-8")
  }

  private def currentSegment(): String =
    f"psync.$segmentIndex%06d.log"

  private var selectedDb: Long = cfg.startDb

  private def rotate(): Unit = {
    if (segmentIndex > 0) {
      store.publish(currentSegment())
      publishedPosition = (replId, replOffset)
      publishedDb = selectedDb
    }
    segmentIndex += 1
    segmentBytes = 0L
    segmentStartMs = cfg.clockMs()
  }

  /** The resume token a restart persists (Position::RedisPsync). */
  def position: (String, Long) = (replId, replOffset)

  /** The position covered by PUBLISHED segments — the only value a
    * caller may persist while the pump is mid-segment (persisting the
    * live offset would skip the in-flight spool on a crash).
    */
  @volatile var publishedPosition: (String, Long) =
    (cfg.replId, cfg.replOffset)

  /** The SELECTed db as of the published position — what a restart
    * passes back as `startDb`.
    */
  @volatile var publishedDb: Long = cfg.startDb

  /** Call after an external `store.publishAll()`. */
  def markAllPublished(): Unit = {
    publishedPosition = (replId, replOffset)
    publishedDb = selectedDb
  }
}

object RedisReplicationPump {
  /** `REPLCONF`/`PSYNC` knobs (redis_psync_extractor.rs:95-101 logs
    * repl_id/repl_offset/repl_port at start).
    */
  final case class Config(user: String = "", password: String = "",
      replId: String = "", replOffset: Long = 0L,
      replPort: Int = 10007, ackEveryBytes: Long = 1L << 20,
      maxSegmentBytes: Long = 64L * 1024 * 1024,
      /** `[extractor] max_segment_secs`: also rotate when the open
        * segment is this old (0 = size-only) — bounds the landing
        * latency of a low-volume stream in resident mode.
        */
      maxSegmentSecs: Long = 0L,
      maxReconnects: Int = 10, baseBackoffMs: Long = 500L,
      maxBackoffMs: Long = 60000L,
      /** Wall-clock ack cadence (reference keepalive_interval_secs,
        * redis_psync_extractor.rs:316) — keeps a quiet master from
        * repl-timeout-dropping the replica.
        */
      keepaliveIntervalSecs: Long = 1L,
      /** The SELECTed db at the persisted resume offset: a partial
        * resync resumes MID-STREAM and the master does not re-send
        * SELECT, so without this every post-restart command would
        * mis-attribute to db 0 (`select_db` in PumpPositions).
        */
      startDb: Long = 0L,
      /** Clock seam so specs drive the time-based acks. */
      clockMs: () => Long = () => System.currentTimeMillis())

  /** RESP array-of-bulk-strings command encoding. */
  def cmd(args: String*): Array[Byte] = {
    val out = new StringBuilder
    out.append('*').append(args.size).append("\r\n")
    args.foreach { a =>
      out.append('$').append(a.getBytes("UTF-8").length).append("\r\n")
      out.append(a).append("\r\n")
    }
    out.toString.getBytes("UTF-8")
  }
}
