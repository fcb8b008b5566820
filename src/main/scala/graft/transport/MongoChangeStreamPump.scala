package graft.transport

/** The MongoDB change-stream dial-and-pump — the reference's
  * MongoCdcExtractor `source=change_stream` path
  * (dt-connector/src/extractor/mongo/mongo_cdc_extractor.rs: watch()
  * over the deployment, resume token persisted per batch): hello,
  * SCRAM-SHA-256 auth over saslStart/saslContinue (the same RFC
  * machinery [[PgWire.Scram]] pins to the RFC 7677 vectors — MongoDB
  * uses it verbatim for SCRAM-SHA-256), then
  * `aggregate 1 [{$changeStream:{allChangesForCluster:true}}]` and a
  * getMore loop, appending every change document to capture segments
  * as JSON lines (the shape `spark.read.json` and the existing
  * MongoOps change-event machinery consume).
  *
  * Resume: the pump tracks `_id` of the last shipped change (the
  * resume token); reconnects re-watch with `resumeAfter`, the exact
  * semantic the reference persists in Position::MongoCdc.
  */
final class MongoChangeStreamPump(cfg: MongoChangeStreamPump.Config,
    store: SegmentStore, dial: () => Wire) extends PumpSupervision {
  import MongoWire._
  import MongoChangeStreamPump._

  private[transport] var resumeToken: Option[Map[String, Any]] =
    cfg.resumeAfterData.map(d => Map[String, Any]("_data" -> d))
  var docsCaptured = 0L
  override protected def progress: Long = docsCaptured
  override protected def positionLabel: String =
    position.getOrElse("<start>")
  override protected def maxReconnects: Int = cfg.maxReconnects
  override protected def baseBackoffMs: Long = cfg.baseBackoffMs
  override protected def maxBackoffMs: Long = cfg.maxBackoffMs
  private var requestId = 0
  // continue numbering after anything already published: the capture
  // reader's cursor is name-based, so a restart must never reuse one
  private var segmentIndex = SegmentNames.lastIndex(store, "changestream")
  private var segmentBytes = 0L
  private var segmentStartMs = cfg.clockMs()

  override def runSession(until: () => Boolean = () => false): Long = {
    val wire = dial()
    rotate() // one segment per session
    try {
      hello(wire)
      if (cfg.password.nonEmpty) auth(wire)
      var (cursorId, batch) = openStream(wire)
      var captured = 0L
      captured += ship(batch)
      while (!until() && cursorId != 0L) {
        requestId += 1
        wire.write(message(requestId, Seq(
          "getMore" -> cursorId,
          "collection" -> "$cmd.aggregate",
          "$db" -> "admin")))
        val reply = readMessage(wire)
        checkOk(reply, "getMore")
        val cursor = reply("cursor").asInstanceOf[Map[String, Any]]
        cursorId = cursor("id").asInstanceOf[Long]
        captured += ship(cursor.getOrElse("nextBatch", Seq.empty)
          .asInstanceOf[Seq[Any]])
        // the time check also runs on EMPTY getMore replies, so a
        // quiet stream's captured tail publishes within the knob's
        // window instead of waiting out 64 MB (or wind-down)
        maybeRotate()
      }
      captured
    } finally wire.close()
  }

  // supervision from PumpSupervision; reconnects re-watch with
  // resumeAfter at the tracked token

  // ---------------------------------------------------------- phases

  private def hello(wire: Wire): Unit = {
    requestId += 1
    wire.write(message(requestId, Seq(
      "hello" -> 1, "$db" -> "admin")))
    checkOk(readMessage(wire), "hello")
  }

  /** SCRAM-SHA-256 over saslStart/saslContinue (payload = the raw
    * SCRAM message bytes; conversationId threads the legs).
    */
  private def auth(wire: Wire): Unit = {
    val ex = PgWire.Scram.Exchange(cfg.user, cfg.password, cfg.nonce())
    requestId += 1
    wire.write(message(requestId, Seq(
      "saslStart" -> 1,
      "mechanism" -> "SCRAM-SHA-256",
      "payload" -> ex.clientFirst.getBytes("UTF-8"),
      "$db" -> cfg.authDb)))
    val first = readMessage(wire)
    checkOk(first, "saslStart")
    val convId = first("conversationId")
    val serverFirst = new String(
      first("payload").asInstanceOf[Array[Byte]], "UTF-8")
    val (clientFinal, wantSig) = ex.clientFinal(serverFirst)
    requestId += 1
    wire.write(message(requestId, Seq(
      "saslContinue" -> 1,
      "conversationId" -> convId,
      "payload" -> clientFinal.getBytes("UTF-8"),
      "$db" -> cfg.authDb)))
    val second = readMessage(wire)
    checkOk(second, "saslContinue")
    val serverFinal = new String(
      second("payload").asInstanceOf[Array[Byte]], "UTF-8")
    if (serverFinal != s"v=$wantSig")
      throw new java.io.IOException(
        "scram: server signature mismatch — refusing to stream from " +
          "an unauthenticated peer")
    // some servers need an empty-payload third leg to set done=true
    if (!second.get("done").contains(true)) {
      requestId += 1
      wire.write(message(requestId, Seq(
        "saslContinue" -> 1,
        "conversationId" -> convId,
        "payload" -> Array.emptyByteArray,
        "$db" -> cfg.authDb)))
      checkOk(readMessage(wire), "saslContinue(final)")
    }
  }

  private def openStream(wire: Wire): (Long, Seq[Any]) = {
    val changeStream: Seq[(String, Any)] =
      Seq("allChangesForCluster" -> true,
        // updates must carry the post-image: without updateLookup a
        // real server ships only updateDescription, and the landed
        // per-collection state face would keep the PRE-update
        // document forever (present-but-stale — the one thing the
        // state contract forbids). change_stream.rs full_document is
        // the reference's matching knob.
        "fullDocument" -> "updateLookup") ++
        resumeToken.map(t => "resumeAfter" ->
          Bson.Doc(t.toSeq.map { case (k, v) => k -> v }))
    requestId += 1
    wire.write(message(requestId, Seq(
      "aggregate" -> 1,
      "pipeline" -> Bson.Arr(Seq(
        Bson.Doc(Seq("$changeStream" -> Bson.Doc(changeStream))))),
      "cursor" -> Bson.Doc(Nil),
      "$db" -> "admin")))
    val reply = readMessage(wire)
    checkOk(reply, "aggregate($changeStream)")
    val cursor = reply("cursor").asInstanceOf[Map[String, Any]]
    (cursor("id").asInstanceOf[Long],
      cursor.getOrElse("firstBatch", Seq.empty).asInstanceOf[Seq[Any]])
  }

  /** Append change documents as JSON lines; track the resume token. */
  private def ship(batch: Seq[Any]): Long = {
    batch.foreach { doc0 =>
      val doc = doc0.asInstanceOf[Map[String, Any]]
      val bytes = (Bson.toJson(doc) + "\n").getBytes("UTF-8")
      store.append(currentSegment(), bytes)
      segmentBytes += bytes.length // UTF-8 bytes, not UTF-16 chars
      docsCaptured += 1
      doc.get("_id").foreach(t =>
        resumeToken = Some(t.asInstanceOf[Map[String, Any]]))
      maybeRotate()
    }
    batch.size.toLong
  }

  /** Size- or time-based rotation (`max_segment_secs`, 0 = size
    * only): a non-empty segment older than the knob publishes so a
    * quiet stream's events land on a bounded cadence in resident
    * mode. Empty segments never publish (and never burn an index).
    */
  private def maybeRotate(): Unit = {
    val timeUp = cfg.maxSegmentSecs > 0 && segmentBytes > 0 &&
      cfg.clockMs() - segmentStartMs >= cfg.maxSegmentSecs * 1000L
    if (segmentBytes >= cfg.maxSegmentBytes || timeUp) rotate()
  }

  private def currentSegment(): String =
    f"changestream.$segmentIndex%06d.log"

  private def rotate(): Unit = {
    if (segmentIndex > 0) {
      store.publish(currentSegment())
      publishedToken = position
    }
    segmentIndex += 1
    segmentBytes = 0L
    segmentStartMs = cfg.clockMs()
  }

  /** The resume token a restart persists (Position::MongoCdc). */
  def position: Option[String] =
    resumeToken.flatMap(_.get("_data")).map(_.toString)

  /** The token covered by PUBLISHED segments — the only value a
    * caller may persist mid-stream (a token ahead of durable capture
    * would skip the in-flight spool on a crash).
    */
  @volatile var publishedToken: Option[String] = cfg.resumeAfterData

  /** Call after an external `store.publishAll()`. */
  def markAllPublished(): Unit = publishedToken = position
}

object MongoChangeStreamPump {
  final case class Config(user: String = "", password: String = "",
      authDb: String = "admin", resumeAfterData: Option[String] = None,
      maxSegmentBytes: Long = 64L * 1024 * 1024,
      /** `[extractor] max_segment_secs`: also rotate when the open
        * segment is this old (0 = size-only) — bounds the landing
        * latency of a quiet stream in resident mode.
        */
      maxSegmentSecs: Long = 0L,
      /** Clock seam so specs drive the time-based rotation. */
      clockMs: () => Long = () => System.currentTimeMillis(),
      maxReconnects: Int = 10, baseBackoffMs: Long = 500L,
      maxBackoffMs: Long = 60000L,
      nonce: () => String = () => {
        val b = new Array[Byte](18)
        new java.security.SecureRandom().nextBytes(b)
        java.util.Base64.getEncoder.encodeToString(b)
      })
}
