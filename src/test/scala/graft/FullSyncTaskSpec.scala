package graft

import scala.collection.mutable

import graft.config.TaskConfig
import graft.model.Position
import graft.sinks.StreamLoadSink
import graft.sources.{DbResumer, PgOutputWriter, SnapshotResumer}
import graft.streaming.{CdcTask, FullSyncTask}

/** Snapshot-then-CDC serial migration without data loss
  * (docs/en/tutorial/snapshot_and_cdc_without_data_loss.md): the slot's
  * consistent point is captured before the snapshot copies, the
  * snapshot marks per-table finishes in the shared position store, and
  * the CDC stage drains the spool from exactly that point. A full
  * restart skips finished tables and re-ships no transaction.
  */
class FullSyncTaskSpec extends SparkSuite {

  private final class MemStore extends DbResumer.SqlExec {
    val rows = mutable.LinkedHashMap[(String, String, String), String]()
    def execute(sql: String, binds: Seq[String]): Unit =
      if (sql.startsWith("INSERT INTO")) {
        val Seq(task, tpe, key, data) = binds
        rows.update((task, tpe, key), data)
      } else if (sql.startsWith("DELETE FROM")) {
        rows.filterInPlace { case ((t, _, _), _) => t != binds.head }: Unit
      }
    def query(sql: String, binds: Seq[String]): Seq[Seq[String]] =
      rows.collect { case ((t, tpe, key), data) if t == binds.head =>
        Seq(tpe, key, data)
      }.toSeq
  }

  private def dual(store: MemStore, dir: String): DbResumer.Dual = {
    val rec = new DbResumer.Recorder("full-sync", store,
      DbResumer.PgDialect)
    rec.init(isInit = false)
    new DbResumer.Dual(new SnapshotResumer(dir), rec,
      () => new DbResumer.Recovery("full-sync", store))
  }

  /** Changes "made during the snapshot": two committed txns on orders,
    * spooled in the slot created at 0/16000080.
    */
  private def spool(): Array[Byte] = {
    val w = new PgOutputWriter()
    w.relation(7L, "public", "orders", 'd', Seq(
      graft.sources.PgOutput.RelColumn("id", keyPart = true, 20, -1),
      graft.sources.PgOutput.RelColumn("status", keyPart = false,
        25, -1)))
    w.begin(0x16000100L, 1000L, 11L)
    w.insert(7L, Array("900001", "NEW"))
    w.commit(0x16000100L, 0x16000200L, 1000L)
    w.begin(0x16000300L, 2000L, 12L)
    w.update(7L, None, None, Array("900001", "SHIPPED"))
    w.commit(0x16000300L, 0x16000400L, 2000L)
    w.bytes()
  }

  private def snapshotIni(sinkDir: String): String =
    s"""[extractor]
       |extract_type=snapshot
       |url=$sf
       |
       |[filter]
       |do_tbs=orders
       |
       |[sinker]
       |url=$sinkDir
       |""".stripMargin

  private def cdcIni(): String =
    s"""[extractor]
       |extract_type=cdc
       |slot_name=full_sync_slot
       |batch_size=10
       |id_cols=orders:id
       |
       |[filter]
       |do_dbs=public
       |
       |[sinker]
       |url=http://127.0.0.1:0
       |""".stripMargin

  test("slot before snapshot, finish marks, handoff at the " +
      "consistent point") {
    FullSyncTaskSpec.shipped.clear()
    val sinkDir = java.nio.file.Files
      .createTempDirectory("fullsync-sink").toString
    val posDir = java.nio.file.Files
      .createTempDirectory("fullsync-pos").toString
    val store = new MemStore
    val snap = TaskConfig.fromIni(snapshotIni(sinkDir))
    val cdc = TaskConfig.fromIni(cdcIni())
    val answers = CdcTask.PgAnswers(
      graft.sources.PgSlotLifecycle.SlotStatus(exists = false),
      pubExists = false, walStream = spool(),
      consistentPoint = "0/16000080")

    val r = FullSyncTask.run(spark, snap, cdc, answers,
      (_, _, _, _) => new FullSyncTaskSpec.CollectSink, dual(store, posDir))

    // stage order contract: the slot creation fence precedes the copy
    assert(r.slotPlan.createsSlot)
    assert(r.slotPlan.statements.exists(_.startsWith(
      "CREATE_REPLICATION_SLOT full_sync_slot")))
    // snapshot copied the one admitted table and recorded its finish
    assert(r.snapshot.map(_.tb) == Seq("orders"))
    assert(r.snapshot.head.rows > 0)
    assert(r.snapshotSkipped.isEmpty)
    // CDC started at the slot's consistent point, not 0/0
    assert(r.cdc.startLsn == "0/16000080")
    assert(r.cdc.rowsShipped == 2L)
    assert(r.cdc.endLsn == "0/16000400")
    // the spooled insert+update compacted to final state per batch
    val lines = FullSyncTaskSpec.shipped.mkString("\n")
    assert(lines.contains("SHIPPED"))

    // ---- full restart over the same position store
    FullSyncTaskSpec.shipped.clear()
    val r2 = FullSyncTask.run(spark, snap, cdc,
      CdcTask.PgAnswers(
        graft.sources.PgSlotLifecycle.SlotStatus(exists = true,
          confirmedFlushLsn = "0/16000080"),
        pubExists = true, walStream = spool()),
      (_, _, _, _) => new FullSyncTaskSpec.CollectSink, dual(store, posDir))
    // finished table skipped, recovered position wins, nothing re-ships
    assert(r2.snapshot.isEmpty)
    assert(r2.snapshotSkipped == Seq("app.orders"))
    assert(r2.cdc.startLsn == "0/16000400")
    assert(r2.cdc.rowsShipped == 0L)
    assert(r2.cdc.eventsSkipped == 2L)
    assert(FullSyncTaskSpec.shipped.isEmpty)
  }
}

object FullSyncTaskSpec {
  val shipped = mutable.ArrayBuffer.empty[String]

  /** Top-level sink: serializes into the foreachPartition closure
    * without dragging the suite along (local[n] shares the JVM, so the
    * companion buffer is visible to the tasks).
    */
  final class CollectSink extends StreamLoadSink.PayloadSink
      with Serializable {
    override def put(lines: Seq[String]): Unit = {
      FullSyncTaskSpec.shipped.synchronized {
        FullSyncTaskSpec.shipped ++= lines
      }
      ()
    }
  }
}
