package graft.sources

/** PG logical-replication slot lifecycle — the reference's
  * prepare_slot flow (/root/reference/dt-connector/src/extractor/pg/
  * pg_cdc_client.rs:174-291): ensure the publication exists, check the
  * slot's `confirmed_flush_lsn`, decide create / drop-and-recreate /
  * resume, and synthesize the exact replication-protocol statements
  * (`CREATE_REPLICATION_SLOT … LOGICAL "pgoutput"`, TEMPORARY variant,
  * `START_REPLICATION SLOT … ("proto_version" '1',
  * "publication_names" …)`).
  *
  * Pure decision table over fetched state — the same
  * fetch-then-judge split as [[graft.infra.Precheck]], so every branch
  * is spec-testable without a server. The caller executes
  * [[Plan.statements]] in order over a replication connection; when
  * the plan creates the slot, the `consistent_point` column of the
  * CREATE result becomes the start LSN ([[Plan.startLsn]] is None in
  * that case).
  */
object PgSlotLifecycle {

  /** Identifier gate: slot/publication names reach replication-command
    * SQL where quoting rules differ per statement, so only the safe
    * identifier charset is accepted at all (no injection surface).
    */
  private val Ident = "^[A-Za-z0-9_]+$".r
  private def checkIdent(name: String, what: String): String = {
    require(Ident.matches(name),
      s"$what must match [A-Za-z0-9_]+: '$name'")
    name
  }

  /** `streaming` requests protocol v2 in-progress-transaction
    * streaming at START_REPLICATION time (PG 14+).
    */
  final case class SlotConfig(slotName: String, pubName: String = "",
      startLsn: String = "", recreateIfExists: Boolean = false,
      temporary: Boolean = false, streaming: Boolean = false) {
    checkIdent(slotName, "slot_name")
    if (pubName.nonEmpty) checkIdent(pubName, "pub_name")
  }

  /** Fetched slot state (from [[slotStatusQuery]]). */
  final case class SlotStatus(exists: Boolean,
      confirmedFlushLsn: String = "")

  /** The decided lifecycle: statements to execute in order, the LSN to
    * resume from (None = read `consistent_point` from the CREATE
    * result), and the reference's log_warn lines for divergent cases.
    */
  final case class Plan(statements: Seq[String], startLsn: Option[String],
      createsSlot: Boolean, dropsSlot: Boolean, warnings: Seq[String])

  /** Default publication name — pg_cdc_client.rs:177-180. */
  def publicationName(cfg: SlotConfig): String =
    if (cfg.pubName.isEmpty) s"${cfg.slotName}_publication_for_all_tables"
    else cfg.pubName

  def pubExistsQuery(pub: String): String =
    s"SELECT * FROM pg_catalog.pg_publication WHERE pubname = " +
      s"'${checkIdent(pub, "pub_name")}'"

  def slotStatusQuery(slot: String): String =
    s"SELECT * FROM pg_catalog.pg_replication_slots WHERE slot_name = " +
      s"'${checkIdent(slot, "slot_name")}'"

  def createPublicationSql(pub: String): String =
    s"CREATE PUBLICATION ${checkIdent(pub, "pub_name")} FOR ALL TABLES"

  /** Exact reference form — pg_cdc_client.rs:223-226. */
  def dropSlotSql(slot: String): String =
    s"SELECT pg_drop_replication_slot " +
      s"('${checkIdent(slot, "slot_name")}')"

  /** TEMPORARY slots auto-drop at session end (resume-less tasks). */
  def createSlotSql(slot: String, temporary: Boolean = false): String = {
    val temp = if (temporary) "TEMPORARY " else ""
    s"""CREATE_REPLICATION_SLOT ${checkIdent(slot, "slot_name")} """ +
      s"""${temp}LOGICAL "pgoutput""""
  }

  /** Session setup before streaming — pg_cdc_client.rs:284-286. */
  val sessionSetupSql: Seq[String] =
    Seq("SET extra_float_digits=3", "SET TIME ZONE 'UTC'")

  /** `streaming = true` requests protocol v2 in-progress-transaction
    * streaming (PG 14+; the [[PgOutput]] decoder handles the
    * Stream Start/Stop/Commit/Abort segment messages it enables).
    */
  def startReplicationSql(slot: String, lsn: String, pub: String,
      streaming: Boolean = false): String = {
    val proto = if (streaming) 2 else 1
    val streamOpt = if (streaming) """, "streaming" 'on'""" else ""
    s"START_REPLICATION SLOT ${checkIdent(slot, "slot_name")} " +
      s"""LOGICAL $lsn ("proto_version" '$proto', "publication_names" """ +
      s"""'${checkIdent(pub, "pub_name")}'$streamOpt)"""
  }

  /** Parse "16/B374D848" to a comparable long (hi<<32 | lo). */
  def parseLsn(s: String): Long = s.split("/") match {
    case Array(hi, lo) =>
      (java.lang.Long.parseLong(hi, 16) << 32) |
        java.lang.Long.parseLong(lo, 16)
    case _ => throw new IllegalArgumentException(s"bad LSN: $s")
  }

  /** The prepare_slot decision table — pg_cdc_client.rs:174-254.
    * `pubExists` / `status` are the fetched answers to
    * [[pubExistsQuery]] / [[slotStatusQuery]].
    */
  def plan(cfg: SlotConfig, status: SlotStatus, pubExists: Boolean)
      : Plan = {
    val pub = publicationName(cfg)
    val warnings = scala.collection.mutable.ArrayBuffer.empty[String]
    var createSlot = !status.exists
    var startLsn = cfg.startLsn

    if (status.exists) {
      if (status.confirmedFlushLsn.isEmpty) {
        // should never happen — recreate rather than stream blind
        createSlot = true
        warnings += "slot exists but confirmed_flush_lsn is empty, " +
          "will recreate slot"
      } else if (startLsn.isEmpty) {
        warnings += "start_lsn is empty, will use confirmed_flush_lsn"
        startLsn = status.confirmedFlushLsn
      } else if (parseLsn(startLsn) <
          parseLsn(status.confirmedFlushLsn)) {
        // requested resume point already flushed past: the slot can
        // only replay from its confirmed position
        warnings += s"start_lsn: ${cfg.startLsn} is order than " +
          s"confirmed_flush_lsn: ${status.confirmedFlushLsn}, " +
          "will use confirmed_flush_lsn"
        startLsn = status.confirmedFlushLsn
      }
    }

    val recreate = createSlot || cfg.recreateIfExists
    val dropsSlot = recreate && status.exists
    val statements =
      (if (pubExists) Seq.empty
       else Seq(createPublicationSql(pub))) ++
      (if (!recreate) Seq.empty
       else (if (dropsSlot) Seq(dropSlotSql(cfg.slotName))
             else Seq.empty) :+
         createSlotSql(cfg.slotName, cfg.temporary))

    Plan(statements,
      startLsn = if (recreate) None else Some(startLsn),
      createsSlot = recreate, dropsSlot = dropsSlot,
      warnings = warnings.toSeq)
  }
}
