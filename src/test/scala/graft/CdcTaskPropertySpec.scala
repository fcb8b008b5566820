package graft

import scala.collection.mutable

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.config.TaskConfig
import graft.model.Position
import graft.sinks.StreamLoadSink
import graft.sources.{DbResumer, PgOutputWriter, SnapshotResumer}
import graft.streaming.CdcTask

/** The resume property the CDC task promises: for EVERY batch-boundary
  * position it ever records, a restart seeded with that position ships
  * exactly the transactions committed after it — nothing lost, nothing
  * duplicated, at transaction granularity. Holds for arbitrary
  * transaction streams mixing plain and v2-streamed transactions.
  * (Raw ScalaCheck generators under fixed seeds — the scalatest bridge
  * isn't in the offline cache.)
  */
class CdcTaskPropertySpec extends SparkSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  // one transaction: 1-4 events over a 6-key pool, maybe v2-streamed
  private val txnGen = for {
    n <- Gen.choose(1, 4)
    events <- Gen.listOfN(n, for {
      key <- Gen.choose(1, 6)
      kind <- Gen.oneOf("insert", "update", "delete")
    } yield (key, kind))
    streamed <- Gen.oneOf(true, false)
  } yield (events, streamed)

  private val streamGen = Gen.listOfN(9, txnGen)

  private def buildWal(txns: Seq[(Seq[(Int, String)], Boolean)])
      : Array[Byte] = {
    val w = new PgOutputWriter()
    w.relation(5L, "public", "orders_cdc", 'd', Seq(
      graft.sources.PgOutput.RelColumn("id", keyPart = true, 20, -1),
      graft.sources.PgOutput.RelColumn("v", keyPart = false, 25, -1)))
    var lsn = 0x20000000L
    txns.zipWithIndex.foreach { case ((events, streamed), i) =>
      val xid = 500L + i
      def emit(): Unit = events.zipWithIndex.foreach {
        case ((key, kind), j) =>
          kind match {
            case "insert" =>
              w.insert(5L, Array(key.toString, s"v$i-$j"))
            case "update" =>
              w.update(5L, None, None, Array(key.toString, s"u$i-$j"))
            case "delete" =>
              w.delete(5L, 'K', Array(key.toString, null))
          }
      }
      if (streamed) {
        w.streamStart(xid, firstSegment = true)
        emit()
        w.streamStop()
        w.streamCommit(xid, lsn + 0x80, lsn + 0x100, 1000L * i)
      } else {
        w.begin(lsn + 0x80, 1000L * i, xid)
        emit()
        w.commit(lsn + 0x80, lsn + 0x100, 1000L * i)
      }
      lsn += 0x100
    }
    w.bytes()
  }

  private def ini(batchSize: Int): String =
    s"""[extractor]
       |extract_type=cdc
       |slot_name=prop_slot
       |batch_size=$batchSize
       |id_cols=orders_cdc:id
       |
       |[filter]
       |do_dbs=public
       |
       |[sinker]
       |url=http://127.0.0.1:0
       |""".stripMargin

  private def runFrom(task: TaskConfig.Task, wal: Array[Byte],
      seedPos: Option[String]): (CdcTask.RunReport, Long) = {
    val store = new mutable.LinkedHashMap[String, String]()
    val exec = new DbResumer.SqlExec {
      def execute(sql: String, binds: Seq[String]): Unit =
        if (sql.startsWith("INSERT INTO"))
          store(binds(2)) = binds(3)
      def query(sql: String, binds: Seq[String]): Seq[Seq[String]] =
        store.map { case (k, v) => Seq("CdcDoing", k, v) }.toSeq
    }
    seedPos.foreach(p => store("default_key") =
      DbResumer.renderPosition(Position.PgCdc(p)))
    val rec = new DbResumer.Recorder("prop", exec,
      DbResumer.MySqlDialect)
    val dual = new DbResumer.Dual(
      new SnapshotResumer(java.nio.file.Files
        .createTempDirectory("cdc-prop").toString),
      rec, () => new DbResumer.Recovery("prop", exec))
    CdcTaskPropertySpec.count.set(0L)
    val report = CdcTask.run(spark, task,
      CdcTask.PgAnswers(
        graft.sources.PgSlotLifecycle.SlotStatus(exists = false),
        pubExists = false, walStream = wal),
      (_, _, _, _) => new CdcTaskPropertySpec.CountSink, dual)
    (report, CdcTaskPropertySpec.count.get())
  }

  test("every recorded batch boundary is an exactly-once restart " +
      "point, for arbitrary txn streams and batch sizes") {
    Seq(11L, 23L, 47L).foreach { seed =>
      Seq(1, 3, 7).foreach { batchSize =>
        val txns = sample(streamGen, seed)
        val wal = buildWal(txns)
        val task = TaskConfig.fromIni(ini(batchSize))
        val total = txns.map(_._1.size.toLong).sum

        val (full, _) = runFrom(task, wal, None)
        assert(full.rowsShipped == total,
          s"seed=$seed bs=$batchSize full run")
        assert(full.eventsSkipped == 0L)
        // batch sizes respect the txn-aligned accumulation rule
        assert(full.batches.forall(b => b.rows >= 1))

        // restart from EVERY recorded boundary: the shipped suffix and
        // skipped prefix partition the stream exactly
        full.batches.foreach { b =>
          val prefix = full.batches
            .takeWhile(_.batchId <= b.batchId).map(_.rows).sum
          val (resumed, _) =
            runFrom(task, wal, Some(b.commitLsn))
          assert(resumed.startLsn == b.commitLsn)
          assert(resumed.eventsSkipped == prefix,
            s"seed=$seed bs=$batchSize from=${b.commitLsn}")
          assert(resumed.rowsShipped == total - prefix)
          // and the re-run's own boundaries continue the original's
          assert(resumed.batches.map(_.rows).sum ==
            total - prefix)
        }
      }
    }
  }
}

object CdcTaskPropertySpec {
  val count = new java.util.concurrent.atomic.AtomicLong(0L)

  final class CountSink extends StreamLoadSink.PayloadSink
      with Serializable {
    override def put(lines: Seq[String]): Unit = {
      count.addAndGet(lines.size.toLong): Unit
    }
  }
}
