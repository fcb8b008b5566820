package graft

import java.nio.file.Files
import java.sql.Timestamp

import scala.collection.mutable

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

import graft.infra.Monitoring
import graft.streaming.StreamingCuration

/** Drives the two-stage streaming curation topology end to end:
  * quality gate → exact dedup → channel → near-dup verdicts, with the
  * observed-metrics monitoring bridge attached — the stream-time
  * CurationPipeline story (gate precedence: low_quality → exact_dup →
  * near_dup).
  */
class StreamingCurationSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  // ~40 words, stopword-dense → passes the q95 head; one changed word
  // leaves ~31/35 shingles shared → MinHash agreement well above 0.5
  private val textA =
    "the cat of the house is in the garden and the dog of the town " +
    "is in the park at noon while the bird of the tree is in the " +
    "nest and the fish of the pond is in the weeds"
  private val textANear1 = textA.replace("noon", "dusk")
  private val textANear2 = textA.replace("weeds", "reeds")
  private val textB =
    "a storm of great force is moving to the coast and the crew of " +
    "the ship is in the harbor at dawn while the light of the tower " +
    "is on the rocks and the sound of the bell is in the air"
  private val textC =
    "the report of the board is due in the spring and the budget of " +
    "the year is in the draft at last while the vote of the members " +
    "is on the agenda and the minutes of the meeting are in the file"
  private val junk = "!!!,,,???...;;;"

  test("gate drops low quality, exact state drops copies, near-dup " +
      "state flags rewrites, monitors account for every doc") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val base = Files.createTempDirectory("graft_curation").toString
    val paths = StreamingCuration.Paths(s"$base/channel",
      s"$base/ckpt_gate", s"$base/ckpt_neardup")
    val monitors = Monitoring.PipelineMonitors("curation-task",
      windowSecs = 300L)
    val bridge = new StreamingCuration.ObservedMetricsBridge(monitors)
    spark.streams.addListener(bridge)

    val verdictRows = mutable.Buffer.empty[(Long, Boolean, Any)]
    val input = MemoryStream[(Long, String, Timestamp)]
    val gate = StreamingCuration.gateQuery(
      input.toDF().toDF("doc_id", "text", "ts"), paths)
    var nearDup: org.apache.spark.sql.streaming.StreamingQuery = null
    try {
      input.addData(
        (1L, textA, ts(0)),
        (2L, textANear1, ts(0)), // near-dup of 1: passes A, flagged in B
        (3L, junk, ts(0)),       // quality-dropped in A
        (4L, textB, ts(0)))
      gate.processAllAvailable()

      nearDup = StreamingCuration.nearDupQuery(spark, paths,
        Some(monitors)) { (verdicts, _) =>
        verdicts.collect().foreach { r =>
          verdictRows += ((r.getAs[Long]("doc_id"),
            r.getAs[Boolean]("is_dup"), r.getAs[Any]("dup_of")))
        }
      }
      nearDup.processAllAvailable()

      input.addData(
        (5L, textA, ts(1)),      // exact copy of 1: dropped in A
        (6L, textANear2, ts(1)), // near-dup of 1: flagged in B
        (7L, textC, ts(2)))
      gate.processAllAvailable()
      nearDup.processAllAvailable()

      // channel holds exactly the gate survivors, with fingerprints
      val channel = spark.read.schema(StreamingCuration.channelSchema)
        .parquet(paths.channelDir)
      assert(channel.select("doc_id").as[Long].collect().toSet ==
        Set(1L, 2L, 4L, 6L, 7L))
      val fpOfA = Seq(textA).toDF("text")
        .select(graft.operators.TextOps.charFold(
          graft.operators.TextOps.normText(col("text"))))
        .as[Long].head()
      assert(channel.filter(col("doc_id") === 1L)
        .select("fp").as[Long].head() == fpOfA)

      // near-dup verdicts: rewrites flagged against the original,
      // originals and unique docs kept
      val byDoc = verdictRows.map(v => v._1 -> v).toMap
      assert(byDoc(1L)._2 == false)
      assert(byDoc(4L)._2 == false)
      assert(byDoc(7L)._2 == false)
      assert(byDoc(2L)._2 == true && byDoc(2L)._3 == 1L)
      assert(byDoc(6L)._2 == true && byDoc(6L)._3 == 1L)

      // monitors: listener delivery is async — poll to the deadline
      def extractedSum: Long = monitors.extractor
        .windowStats(Monitoring.ExtractedRecords).map(_.sum).getOrElse(0L)
      val deadline = System.currentTimeMillis + 20000
      while (extractedSum < 7 && System.currentTimeMillis < deadline)
        Thread.sleep(100)
      assert(extractedSum == 7) // every arriving doc counted
      assert(monitors.extractor
        .windowStats(Monitoring.ExtractedBytes).map(_.sum).getOrElse(0L)
        > 0)
      // drops: 1 quality (doc 3) + 1 exact (doc 5) + 2 near-dup (2, 6)
      assert(monitors.pipeline
        .windowStats(Monitoring.FilteredRecords).map(_.sum)
        .getOrElse(0L) == 4)
      // channel throughput: 5 survivors
      assert(monitors.pipeline
        .windowStats(Monitoring.RecordCount).map(_.sum)
        .getOrElse(0L) == 5)
      // final kept: 1, 4, 7
      assert(monitors.sinker
        .gaugeValue(Monitoring.SinkedRecordTotal).getOrElse(0L) == 3)
      assert(monitors.sinker
        .windowStats(Monitoring.RecordCount).map(_.sum)
        .getOrElse(0L) == 3)
    } finally {
      gate.stop()
      if (nearDup != null) nearDup.stop()
      spark.streams.removeListener(bridge)
    }
  }

  test("benchmark bloom gates the stream: contaminated docs drop " +
      "before dedup state, clean docs flow, the drain reports it") {
    val sparkSession = spark
    import sparkSession.implicits._

    val base = Files.createTempDirectory("graft_curation_bb").toString
    // held-out benchmark = textB; the stream carries textB verbatim
    // (contaminated), plus clean textA/textC
    val bloom = graft.operators.CurationOps.benchmarkBloomBytes(
      Seq((100L, textB)).toDF("doc_id", "text"))
    val srcDir = s"$base/src"
    Seq((1L, textA, ts(0)), (2L, textB, ts(0)), (3L, textC, ts(1)))
      .toDF("doc_id", "text", "ts")
      .write.parquet(srcDir)
    val r = StreamingCuration.drain(spark, srcDir, s"$base/work",
      benchmarkBloom = Some(bloom))
    assert(r.docsIn == 3)
    assert(r.contamDropped == 1)
    assert(r.qualityDropped == 0)
    assert(r.kept == 2)
    // the channel (dedup survivors) holds exactly the clean docs
    val channel = spark.read
      .schema(StreamingCuration.channelSchema)
      .parquet(s"$base/work/channel")
    assert(channel.select("doc_id").as[Long].collect().toSet ==
      Set(1L, 3L))
  }

  test("near-dup stage restarts from its own checkpoint without " +
      "re-running the gate stage") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val base = Files.createTempDirectory("graft_curation_rs").toString
    val paths = StreamingCuration.Paths(s"$base/channel",
      s"$base/ckpt_gate", s"$base/ckpt_neardup")

    val input = MemoryStream[(Long, String, Timestamp)]
    val gate = StreamingCuration.gateQuery(
      input.toDF().toDF("doc_id", "text", "ts"), paths)
    val seen = mutable.Buffer.empty[Long]
    try {
      input.addData((1L, textA, ts(0)), (2L, textB, ts(0)))
      gate.processAllAvailable()

      val q1 = StreamingCuration.nearDupQuery(spark, paths, None) {
        (v, _) => seen ++= v.select("doc_id").as[Long].collect() }
      q1.processAllAvailable()
      q1.stop()
      assert(seen.toSet == Set(1L, 2L))

      // more docs arrive while the detector is down
      input.addData((3L, textANear1, ts(1)))
      gate.processAllAvailable()

      // restart: replays only the unseen channel files; the rewrite is
      // still flagged against doc 1 because the STATE also recovered
      val flagged = mutable.Buffer.empty[(Long, Boolean)]
      val q2 = StreamingCuration.nearDupQuery(spark, paths, None) {
        (v, _) => v.select("doc_id", "is_dup").collect().foreach(r =>
          flagged += ((r.getLong(0), r.getBoolean(1)))) }
      try {
        q2.processAllAvailable()
        assert(flagged.toSeq == Seq((3L, true)))
      } finally q2.stop()
    } finally gate.stop()
  }
}
