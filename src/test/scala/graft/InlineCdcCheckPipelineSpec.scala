package graft

import scala.collection.mutable

import graft.config.TaskConfig
import graft.sinks.Applier
import graft.streaming.{CdcPipeline, InlineCdcCheck}

/** Inline CDC check wired into the real micro-batch write path: the
  * checker rides CdcPipeline.compactAndApply's foreachBatch — write
  * first, then check the SAME batch against the SAME target. A lost
  * write surfaces as a MISS in checker state; re-running the stream
  * with a healthy sink reconciles it away (check.md: "later events may
  * naturally cancel or reconcile older miss/diff records").
  */
class InlineCdcCheckPipelineSpec extends SparkSuite {

  private val cols = Seq("user_id", "event_id", "value", "row_type")

  private def checkerCfg: InlineCdcCheck.Config =
    InlineCdcCheck.fromIni(TaskConfig.parseIni(
      """[sinker]
        |sink_type=write
        |db_type=mysql
        |[checker]
        |enable=true
        |""".stripMargin)).get

  private def fetch(table: String, row: Map[String, String],
      ids: Seq[String]): Option[Map[String, String]] =
    InlineCdcCheckPipelineSpec.target.synchronized {
      InlineCdcCheckPipelineSpec.target.get(row("user_id")).map(seq =>
        cols.zip(seq.map(v => Option(v).map(_.toString).orNull)).toMap)
    }

  private def drive(sink: Applier.StatementSink,
      checker: InlineCdcCheck.Checker): Unit = {
    val q = CdcPipeline.compactAndApply(
      CdcPipeline.readChanges(spark, sf), "users",
      keys = Seq("user_id"), cols = cols,
      orderCols = Seq("ts", "event_id"),
      sinkFactory = () => sink,
      inlineCheck = Some((checker, fetch))).start()
    try q.processAllAvailable() finally q.stop()
  }

  test("write → inline check → reconcile through the micro-batch path") {
    val t = InlineCdcCheckPipelineSpec.target
    t.synchronized(t.clear())
    // the victim key whose writes the faulty sink silently drops
    val victim = graft.operators.Cdc.changes(spark, sf)
      .filter("row_type = 'insert'")
      .select("user_id").head().get(0).toString

    val checker = new InlineCdcCheck.Checker(checkerCfg)
    drive(InlineCdcCheckPipelineSpec.faultySink(victim), checker)

    // the lost write is in checker state as a MISS on the victim key —
    // and only defects involving the victim exist (writes the sink
    // applied check clean)
    val defects = checker.state
    assert(defects.nonEmpty)
    assert(defects.forall(_.key == s"user_id=$victim"),
      s"victim=$victim unexpected=${defects.filterNot(
        _.key == s"user_id=$victim").take(5)}")
    assert(defects.exists(_.status == "MISS") ||
      defects.exists(_.status == "DIFF"))
    assert(checker.droppedBatches == 0L)

    // operator fixes the sink; the stream re-runs (fresh checkpoint,
    // same source): the re-applied batches now land, and the checker —
    // SAME state carried over — reconciles the old defect away
    drive(InlineCdcCheckPipelineSpec.healthySink, checker)
    assert(checker.state.isEmpty)
  }
}

object InlineCdcCheckPipelineSpec {
  /** user_id -> row values in `cols` order (the write target). */
  val target: mutable.Map[String, Seq[Any]] = mutable.Map.empty

  final class TargetSink(dropKey: Option[String])
      extends Applier.StatementSink with Serializable {
    override def execute(b: Applier.StatementBatch): Unit =
      target.synchronized {
        if (b.sql.startsWith("DELETE"))
          b.rows.foreach(r => target.remove(r.head.toString): Unit)
        else
          b.rows.foreach { r =>
            val key = r.head.toString
            if (!dropKey.contains(key)) target.update(key, r)
          }
      }
  }

  def faultySink(victim: String) = new TargetSink(Some(victim))
  def healthySink = new TargetSink(None)
}
