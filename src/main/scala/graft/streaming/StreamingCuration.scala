package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, StreamingQueryListener}
import org.apache.spark.sql.types._

import graft.infra.Monitoring
import graft.operators.TextOps

/** End-to-end STREAMING curation topology — the stream-time
  * [[graft.operators.CurationPipeline]]: documents flow through the
  * quality gate (the q95 head), exact dedup (watermarked fingerprint
  * state) and LSH near-dup detection (bucketed state) continuously,
  * with the same gate precedence as the batch run (low_quality →
  * exact_dup → near_dup).
  *
  * Spark's UnsupportedOperationChecker forbids chaining
  * `flatMapGroupsWithState` after another stateful operator inside one
  * query — and a production deployment wants a durable replay boundary
  * between the cheap stateless gates and the stateful dup detector
  * anyway — so the topology is TWO queries around an exchange channel,
  * mirroring the reference's extractor → pipeline → sinker staging
  * (/root/reference/dt-task/src/task_runner.rs wires the same stages
  * around bounded queues):
  *
  *   stage A ([[gateQuery]]):   quality head (stateless map) → drop
  *     !keep → exact dedup (`dropDuplicatesWithinWatermark`) → channel
  *   stage B ([[nearDupQuery]]): channel → MinHash bands →
  *     `flatMapGroupsWithState` verdicts → per-batch verdict apply
  *
  * The channel is a parquet file sink here; at cluster scale the same
  * two queries run against a Kafka topic (different format string,
  * identical plan above the source). Each stage checkpoints
  * independently, so a crashed detector replays the channel from its
  * own offsets without re-running the gates — exactly why the
  * reference separates its stages with persistent queues.
  *
  * Monitoring rides on `Dataset.observe`: per micro-batch the observed
  * aggregates reach [[Monitoring.PipelineMonitors]] through a
  * [[StreamingQueryListener]], costing one extra aggregate per batch
  * and zero extra actions against the stream.
  */
object StreamingCuration {

  /** Channel row contract between the two stages: the gate's survivors
    * with their exact-dedup fingerprint (provenance: which state entry
    * admitted the doc).
    */
  val channelSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType),
    StructField("fp", LongType)))

  final case class Paths(channelDir: String, gateCheckpoint: String,
      nearDupCheckpoint: String)

  /** Stage A: stateless quality gate, then watermarked exact dedup,
    * then append the survivors to the channel. `docs` is a streaming
    * frame with (doc_id, text, ts).
    */
  def gateQuery(docs: DataFrame, paths: Paths,
      horizon: String = "10 minutes",
      // benchmark-decontamination prefilter: the held-out set's n-gram
      // Bloom bytes ([[graft.operators.CurationOps.benchmarkBloomBytes]])
      // inlined as a codegen literal — the streaming twin of q79's
      // prefilter. Bloom-only on the stream (no exact confirm pass:
      // that needs the full benchmark hash set, which is what the
      // filter exists to avoid shipping); at the configured 2^18 bits
      // / 5 hashes the false-positive over-drop is ~1e-5 per probed
      // gram for benchmarks up to ~10k grams — the standard
      // drop-side-of-caution trade for decontamination.
      benchmarkBloom: Option[Array[Byte]] = None): StreamingQuery = {
    import graft.functions.GraftFunctions.bloomContains
    val gated = TextOps.withQualitySignals(docs)
      .observe("curation_gate",
        count(lit(1)).as("docs_in"),
        coalesce(sum(length(col("text"))), lit(0L)).as("bytes_in"),
        coalesce(sum(when(!col("keep"), 1L)), lit(0L))
          .as("quality_dropped"))
      .filter(col("keep"))
      .select(col("doc_id"), col("text"), col("ts"))
    val decon = benchmarkBloom match {
      case None => gated.withColumn("contaminated", lit(false))
      case Some(b) => gated.withColumn("contaminated",
        exists(graft.operators.FuzzyDedup.shingleHashes(col("text")),
          h => bloomContains(lit(b), h)))
    }
    val cleaned = decon
      .observe("curation_decon",
        coalesce(sum(when(col("contaminated"), 1L)), lit(0L))
          .as("contam_dropped"))
      .filter(!col("contaminated"))
      .select(col("doc_id"), col("text"), col("ts"))
    StreamingExactDedup.dedup(cleaned, horizon)
      .select(col("doc_id"), col("text"), col("ts"), col("fp"))
      .observe("curation_channel", count(lit(1)).as("docs_out"))
      .writeStream
      .outputMode("append")
      .format("parquet")
      .option("path", paths.channelDir)
      .option("checkpointLocation", paths.gateCheckpoint)
      .start()
  }

  /** Stage B: read the channel, route every doc through the bucketed
    * near-dup state, and per micro-batch hand the per-doc verdict
    * frame (doc_id, is_dup, dup_of, est_jaccard) to `onVerdicts`.
    * Verdict reduction is the batch-side [[StreamingNearDup.dupDocs]]
    * rule: a doc is a duplicate iff ANY band flagged it, against its
    * earliest qualifying peer.
    */
  def nearDupQuery(spark: SparkSession, paths: Paths,
      monitors: Option[Monitoring.PipelineMonitors] = None)(
      onVerdicts: (DataFrame, Long) => Unit): StreamingQuery = {
    val channel = spark.readStream.schema(channelSchema)
      .parquet(paths.channelDir)
    val verdicts = StreamingNearDup.detect(StreamingNearDup.toBands(
      channel.select(col("doc_id"), col("text"))))
    verdicts.writeStream
      .outputMode("append")
      .option("checkpointLocation", paths.nearDupCheckpoint)
      .foreachBatch {
        (batch: Dataset[StreamingNearDup.BandVerdict], batchId: Long) =>
          val perDoc = batch.toDF()
            .groupBy(col("docId").as("doc_id"))
            .agg(max(col("dupOf") >= 0).as("is_dup"),
              min(when(col("dupOf") >= 0, col("dupOf"))).as("dup_of"),
              max(when(col("dupOf") >= 0, col("estJaccard")))
                .as("est_jaccard"))
          // one job over the small verdict frame; counters + callback
          // share it via a local pin (never re-runs the state store op)
          val pinned = perDoc.localCheckpoint(true)
          monitors.foreach { m =>
            val flagged = pinned.filter(col("is_dup")).count()
            val kept = pinned.count() - flagged
            m.pipeline.addCounter(Monitoring.FilteredRecords, flagged)
            m.sinker.addCounter(Monitoring.RecordCount, kept)
            m.sinker.addBatchCounter(Monitoring.SinkedRecordTotal, kept,
              1L)
          }
          onVerdicts(pinned, batchId)
      }
      .start()
  }

  /** Input contract for [[drain]]: parquet files of arriving docs. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("ts", TimestampType)))

  final case class DrainReport(docsIn: Long, qualityDropped: Long,
      exactDropped: Long, nearDupFlagged: Long, kept: Long,
      contamDropped: Long = 0L)

  /** Drain everything that has arrived in `sourceDir` through the full
    * topology rooted at `workDir` (channel, both checkpoints, and the
    * cumulative `verdicts` parquet live there), then stop both
    * queries. Both stages keep their checkpoints, so the next drain
    * resumes exactly after this one — the task-surface shape of a
    * bounded CDC drain, applied to curation.
    *
    * The report counts THIS drain's batches, read synchronously from
    * the gate query's own progress records (observed metrics) and the
    * verdict callback — no dependence on the async listener bus.
    */
  def drain(spark: SparkSession, sourceDir: String, workDir: String,
      horizon: String = "10 minutes",
      benchmarkBloom: Option[Array[Byte]] = None): DrainReport = {
    val paths = Paths(s"$workDir/channel", s"$workDir/ckpt_gate",
      s"$workDir/ckpt_neardup")
    val docs = spark.readStream.schema(docSchema).parquet(sourceDir)
    var flagged = 0L
    var kept = 0L
    val gate = gateQuery(docs, paths, horizon, benchmarkBloom)
    try gate.processAllAvailable() finally gate.stop()
    val nd = nearDupQuery(spark, paths, None) { (verdicts, _) =>
      val f = verdicts.filter(col("is_dup")).count()
      flagged += f
      kept += verdicts.count() - f
      verdicts.write.mode("append").parquet(s"$workDir/verdicts")
    }
    try nd.processAllAvailable() finally nd.stop()
    var docsIn = 0L; var qDropped = 0L; var out = 0L; var contam = 0L
    gate.recentProgress.foreach { p =>
      Option(p.observedMetrics.get("curation_gate")).foreach { r =>
        docsIn += r.getAs[Long]("docs_in")
        qDropped += r.getAs[Long]("quality_dropped")
      }
      Option(p.observedMetrics.get("curation_decon")).foreach { c =>
        contam += c.getAs[Long]("contam_dropped")
      }
      Option(p.observedMetrics.get("curation_channel")).foreach { c =>
        out += c.getAs[Long]("docs_out")
      }
    }
    DrainReport(docsIn, qDropped,
      exactDropped = docsIn - qDropped - contam - out, flagged, kept,
      contamDropped = contam)
  }

  /** Bridge stage A's observed metrics into the monitors: docs_in →
    * extractor records/bytes, quality_dropped → pipeline filtered,
    * channel docs_out → pipeline record_count; exact-dup drops are the
    * batch residue (in − quality_dropped − out). Attach with
    * `spark.streams.addListener`.
    */
  final class ObservedMetricsBridge(monitors: Monitoring.PipelineMonitors)
      extends StreamingQueryListener {
    override def onQueryStarted(
        e: StreamingQueryListener.QueryStartedEvent): Unit = ()
    override def onQueryTerminated(
        e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()
    override def onQueryProgress(
        e: StreamingQueryListener.QueryProgressEvent): Unit = {
      val om = e.progress.observedMetrics
      Option(om.get("curation_gate")).foreach { r =>
        val in = r.getAs[Long]("docs_in")
        val bytes = r.getAs[Long]("bytes_in")
        val qDropped = r.getAs[Long]("quality_dropped")
        if (in > 0) {
          monitors.extractor
            .addCounter(Monitoring.ExtractedRecords, in)
            .addCounter(Monitoring.ExtractedBytes, bytes)
          monitors.pipeline
            .addCounter(Monitoring.FilteredRecords, qDropped)
        }
        Option(om.get("curation_channel")).foreach { c =>
          val out = c.getAs[Long]("docs_out")
          monitors.pipeline.addCounter(Monitoring.RecordCount, out)
          val exactDropped = in - qDropped - out
          if (exactDropped > 0) monitors.pipeline
            .addCounter(Monitoring.FilteredRecords, exactDropped)
        }
      }
    }
  }
}
