package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Compaction}
import graft.sinks.Applier
import graft.streaming.CdcPipeline

class StreamingSpec extends SparkSuite {

  test("streaming windowed agg equals the batch plan") {
    val streamed = CdcPipeline.windowedStats(
      CdcPipeline.readChanges(spark, sf))
    val q = streamed.writeStream
      .outputMode("complete")
      .format("memory").queryName("win_out")
      .start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("win_out")
      .select("win_start", "event_type", "n", "sum_value")
      .collect().map(_.toSeq).toSet
    val want = CdcPipeline.windowedStats(Cdc.changes(spark, sf))
      .collect().map(_.toSeq).toSet
    assert(got == want)
    assert(got.nonEmpty)
  }

  test("streaming compact+apply drains the fixture through foreachBatch") {
    StreamingSpec.acc.synchronized(StreamingSpec.acc.clear())
    val changes = CdcPipeline.readChanges(spark, sf)
    val monitors = graft.infra.Monitoring.PipelineMonitors("cdc-test")
    val q = CdcPipeline.compactAndApply(changes, "users",
      keys = Seq("user_id"),
      cols = Seq("user_id", "event_id", "value", "row_type"),
      orderCols = Seq("ts", "event_id"),
      sinkFactory = () => StreamingSpec.CollectingSink,
      monitors = Some(monitors)).start()
    try q.processAllAvailable() finally q.stop()
    // the sinker monitor saw every micro-batch: one rt observation per
    // batch and the pushed row total
    val rt = monitors.sinker
      .windowStats(graft.infra.Monitoring.RtPerQuery).get
    val pushed = monitors.sinker
      .windowStats(graft.infra.Monitoring.RecordCount).get
    assert(rt.count > 0 && pushed.sum > 0)
    val sqls = StreamingSpec.acc.synchronized(
      StreamingSpec.acc.map(_.sql).toSeq)
    assert(sqls.nonEmpty)
    // idempotent upsert statements dominate; any delete batch precedes
    // the upserts it was planned with (per-partition statement order)
    assert(sqls.exists(_.startsWith("REPLACE INTO users")))
    // all 15 user keys survive at least one upsert across the run
    val upsertRows = StreamingSpec.acc.synchronized(
      StreamingSpec.acc.filter(_.sql.startsWith("REPLACE"))
        .flatMap(_.rows).map(_.head).toSet)
    assert(upsertRows.size >= 10)
  }
}

object StreamingSpec {
  val acc = new ArrayBuffer[Applier.StatementBatch]()
  object CollectingSink extends Applier.StatementSink with Serializable {
    def execute(b: Applier.StatementBatch): Unit =
      acc.synchronized { acc += b }
  }
}
