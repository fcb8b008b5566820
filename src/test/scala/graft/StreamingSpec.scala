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

  test("parallel_type=table skips compaction: per-row statements in " +
      "order, every event visible at the sink") {
    StreamingSpec.acc.synchronized(StreamingSpec.acc.clear())
    // the events table only, staged into its own dir (the streaming
    // file source wants a directory; the whole-sf form would stream
    // every table's rows and break the kind-for-kind accounting)
    val evDir = java.nio.file.Files
      .createTempDirectory("stream-events").toString
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$sf/events.parquet"),
      java.nio.file.Paths.get(s"$evDir/events.parquet"))
    val changes = CdcPipeline.readChanges(spark, evDir)
    val total = changes.isStreaming // force nothing; count from batch
    val q = CdcPipeline.compactAndApply(changes, "app.users",
      keys = Seq("user_id"),
      cols = Seq("user_id", "event_id", "value", "row_type"),
      orderCols = Seq("ts", "event_id"),
      sinkFactory = () => StreamingSpec.CollectingSink,
      parallelType = "table").start()
    try q.processAllAvailable() finally q.stop()
    val batches = StreamingSpec.acc.synchronized(StreamingSpec.acc.toSeq)
    assert(batches.nonEmpty)
    // the table lane replays the ORIGINAL statement kinds per row —
    // no merged REPLACE batches, updates stay UPDATEs
    assert(batches.forall(b => !b.sql.startsWith("REPLACE")))
    assert(batches.exists(_.sql.contains("`app`.`users`")))
    val byKind = batches.groupBy(_.sql.takeWhile(_ != ' '))
    // expected kinds from the same source mapping readChanges applies
    val ev = Tables.events(spark, sf)
    def n(t: String) = (t match {
      case "insert" => ev.filter(
        org.apache.spark.sql.functions.col("event_type") === "signup")
      case "delete" => ev.filter(
        org.apache.spark.sql.functions.col("event_type") === "error")
      case _ => ev.filter(
        org.apache.spark.sql.functions.col("event_type") =!= "signup" &&
          org.apache.spark.sql.functions.col("event_type") =!= "error")
    }).count()
    // no compaction: one statement per event, kind for kind
    assert(byKind.getOrElse("INSERT", Nil).size.toLong == n("insert"))
    assert(byKind.getOrElse("UPDATE", Nil).size.toLong == n("update"))
    assert(byKind.getOrElse("DELETE", Nil).size.toLong == n("delete"))
    assert(total)
  }
}

object StreamingSpec {
  val acc = new ArrayBuffer[Applier.StatementBatch]()
  object CollectingSink extends Applier.StatementSink with Serializable {
    def execute(b: Applier.StatementBatch): Unit =
      acc.synchronized { acc += b }
  }
}
