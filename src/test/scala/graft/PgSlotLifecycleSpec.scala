package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.infra.Precheck
import graft.sources.PgSlotLifecycle
import graft.sources.PgSlotLifecycle._

/** Slot-lifecycle decision table pinned branch by branch against the
  * reference's prepare_slot flow (pg_cdc_client.rs:174-291), plus
  * statement synthesis, LSN ordering, config surfacing and the
  * precheck admission gate.
  */
class PgSlotLifecycleSpec extends AnyFunSuite {

  private val cfg = SlotConfig("dt_slot")

  test("statement synthesis matches the replication protocol forms") {
    assert(publicationName(cfg) ==
      "dt_slot_publication_for_all_tables")
    assert(publicationName(cfg.copy(pubName = "my_pub")) == "my_pub")
    assert(pubExistsQuery("my_pub") ==
      "SELECT * FROM pg_catalog.pg_publication WHERE pubname = 'my_pub'")
    assert(slotStatusQuery("dt_slot") ==
      "SELECT * FROM pg_catalog.pg_replication_slots WHERE " +
        "slot_name = 'dt_slot'")
    assert(createPublicationSql("my_pub") ==
      "CREATE PUBLICATION my_pub FOR ALL TABLES")
    assert(dropSlotSql("dt_slot") ==
      "SELECT pg_drop_replication_slot ('dt_slot')")
    assert(createSlotSql("dt_slot") ==
      """CREATE_REPLICATION_SLOT dt_slot LOGICAL "pgoutput"""")
    assert(createSlotSql("dt_slot", temporary = true) ==
      """CREATE_REPLICATION_SLOT dt_slot TEMPORARY LOGICAL "pgoutput"""")
    assert(startReplicationSql("dt_slot", "16/B374D848", "my_pub") ==
      """START_REPLICATION SLOT dt_slot LOGICAL 16/B374D848 """ +
        """("proto_version" '1', "publication_names" 'my_pub')""")
    assert(sessionSetupSql ==
      Seq("SET extra_float_digits=3", "SET TIME ZONE 'UTC'"))
    // identifier gate: no quoting surface reaches the statements
    intercept[IllegalArgumentException](dropSlotSql("x'; DROP TABLE"))
    intercept[IllegalArgumentException](SlotConfig("bad-name"))
  }

  test("LSN parse orders hi/lo parts numerically") {
    assert(parseLsn("0/0") == 0L)
    assert(parseLsn("16/B374D848") ==
      (0x16L << 32 | 0xB374D848L))
    assert(parseLsn("1/0") > parseLsn("0/FFFFFFFF"))
    intercept[IllegalArgumentException](parseLsn("nope"))
  }

  test("decision table: create, resume, recreate, lsn fallbacks") {
    // slot absent → create (no drop), publication created when missing
    val fresh = plan(cfg, SlotStatus(exists = false), pubExists = false)
    assert(fresh.statements == Seq(
      "CREATE PUBLICATION dt_slot_publication_for_all_tables " +
        "FOR ALL TABLES",
      """CREATE_REPLICATION_SLOT dt_slot LOGICAL "pgoutput""""))
    assert(fresh.createsSlot && !fresh.dropsSlot &&
      fresh.startLsn.isEmpty && fresh.warnings.isEmpty)

    // slot present, resume point ≥ confirmed → clean resume, no DDL
    val resume = plan(cfg.copy(startLsn = "0/2000"),
      SlotStatus(exists = true, confirmedFlushLsn = "0/1000"),
      pubExists = true)
    assert(resume.statements.isEmpty && !resume.createsSlot)
    assert(resume.startLsn.contains("0/2000") && resume.warnings.isEmpty)

    // requested lsn older than confirmed → confirmed wins, with warn
    val stale = plan(cfg.copy(startLsn = "0/500"),
      SlotStatus(exists = true, confirmedFlushLsn = "0/1000"),
      pubExists = true)
    assert(stale.startLsn.contains("0/1000"))
    assert(stale.warnings.exists(_.contains("confirmed_flush_lsn")))

    // empty start lsn → confirmed, with warn
    val empty = plan(cfg, SlotStatus(exists = true,
      confirmedFlushLsn = "0/1000"), pubExists = true)
    assert(empty.startLsn.contains("0/1000"))
    assert(empty.warnings ==
      Seq("start_lsn is empty, will use confirmed_flush_lsn"))

    // slot exists but confirmed_flush_lsn missing → drop + recreate
    val broken = plan(cfg, SlotStatus(exists = true), pubExists = true)
    assert(broken.statements == Seq(
      "SELECT pg_drop_replication_slot ('dt_slot')",
      """CREATE_REPLICATION_SLOT dt_slot LOGICAL "pgoutput""""))
    assert(broken.createsSlot && broken.dropsSlot &&
      broken.startLsn.isEmpty)

    // recreate_slot_if_exists forces drop+create even on a clean slot
    val forced = plan(cfg.copy(recreateIfExists = true),
      SlotStatus(exists = true, confirmedFlushLsn = "0/1000"),
      pubExists = true)
    assert(forced.dropsSlot && forced.createsSlot)
    // temporary variant flows through
    val temp = plan(cfg.copy(temporary = true),
      SlotStatus(exists = false), pubExists = true)
    assert(temp.statements == Seq(
      """CREATE_REPLICATION_SLOT dt_slot TEMPORARY LOGICAL """ +
        """"pgoutput""""))
  }

  test("task config surfaces the slot section; precheck gates new slots") {
    val task = graft.config.TaskConfig.fromIni(
      """[extractor]
        |extract_type=cdc
        |url=/tmp/src
        |slot_name=dt_slot
        |start_lsn=0/1000
        |recreate_slot_if_exists=true
        |""".stripMargin)
    assert(task.slot.contains(SlotConfig("dt_slot", "", "0/1000",
      recreateIfExists = true)))
    assert(graft.config.TaskConfig.fromIni(
      "[extractor]\nextract_type=cdc\n").slot.isEmpty)

    // net-new slot with no free slot → inadmissible
    val newPlan = plan(cfg, SlotStatus(exists = false), pubExists = true)
    assert(!Precheck.checkSlotPlan(newPlan, usedSlots = 4,
      maxSlots = 4).ok)
    assert(Precheck.checkSlotPlan(newPlan, usedSlots = 3,
      maxSlots = 4).ok)
    // drop-and-recreate frees its own slot → admissible at the cap
    val recreated = plan(cfg.copy(recreateIfExists = true),
      SlotStatus(exists = true, confirmedFlushLsn = "0/1000"),
      pubExists = true)
    assert(Precheck.checkSlotPlan(recreated, usedSlots = 4,
      maxSlots = 4).ok)
    // resume touches nothing → always admissible, detail carries warns
    val resume = plan(cfg, SlotStatus(exists = true,
      confirmedFlushLsn = "0/1000"), pubExists = true)
    val res = Precheck.checkSlotPlan(resume, 4, 4)
    assert(res.ok && res.detail.contains("resumes slot"))
  }

  test("plan vs PgSlotLifecycle statements stay wired to PgOutput") {
    // start_replication names pgoutput proto_version 1 — the decoder
    // in sources/PgOutput.scala speaks exactly that protocol version
    assert(createSlotSql("s").contains("\"pgoutput\""))
    assert(startReplicationSql("s", "0/0",
      publicationName(SlotConfig("s"))).contains("\"proto_version\" '1'"))
    // streaming=true upgrades to protocol v2, which the decoder's
    // Stream Start/Stop/Commit/Abort handling speaks
    val v2 = startReplicationSql("s", "0/0", "p", streaming = true)
    assert(v2.contains("\"proto_version\" '2'") &&
      v2.contains("\"streaming\" 'on'"))
    val _ = PgSlotLifecycle // referenced for scaladoc linkage
  }
}
