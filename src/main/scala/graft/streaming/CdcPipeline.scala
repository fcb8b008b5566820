package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{DataStreamWriter, Trigger}
import org.apache.spark.sql.types._

import graft.operators.Compaction
import graft.sinks.{Applier, RdbQueryBuilder}

/** The CDC pipeline re-expressed on Structured Streaming — the reference's
  * pull loop (/root/reference/dt-pipeline/src/base_pipeline.rs:96-191):
  * source → queue → parallelizer(merge) → sinkers becomes
  * readStream → micro-batch → compact → applier, with offsets in the
  * streaming checkpoint instead of position.log.
  *
  * The stand-in source here is a file stream over the events fixture; a
  * production binlog/pgoutput source plugs in as a DataSource V2
  * MicroBatchStream with (file, pos, gtid)/LSN offsets — the pipeline
  * below is source-agnostic past `readStream`.
  */
object CdcPipeline {

  /** Event-stream schema as stored in the fixture (ts is parquet
    * TIMESTAMP(MICROS, isAdjustedToUTC=false) → TIMESTAMP_NTZ; normalized
    * to session-local TimestampType below, an epoch-identity cast under the
    * pinned UTC session timezone — see [[graft.Tables.events]]).
    */
  val eventSchema: StructType = StructType(Seq(
    StructField("event_id", LongType),
    StructField("ts", TimestampNTZType),
    StructField("user_id", LongType),
    StructField("event_type", StringType),
    StructField("value", DoubleType),
    StructField("props", StringType)))

  /** Open the change stream: file-source micro-batches over a directory of
    * parquet event files, normalized to the engine's change shape.
    */
  def readChanges(spark: SparkSession, dir: String): DataFrame = {
    spark.readStream
      .schema(eventSchema)
      .option("maxFilesPerTrigger", "1") // bounded micro-batches
      .parquet(dir)
      .withColumn("ts", col("ts").cast(TimestampType))
      .withColumn("row_type",
        when(col("event_type") === "signup", "insert")
          .when(col("event_type") === "error", "delete")
          .otherwise("update"))
  }

  /** Wire the full pipeline: per micro-batch, compact to final per-key
    * state and hand ordered batches to the applier. Exactly the
    * reference's merge parallelizer semantics per drained batch.
    *
    * `limiter`: optional rows-per-second token bucket (the reference's
    * pipeline rps limiter) — each micro-batch acquires its row count
    * before the apply, in capacity-sized slices so a large batch
    * throttles smoothly instead of erroring on one oversized acquire.
    *
    * `monitors`: optional typed counters (the reference's per-sinker
    * monitor updates): per batch, the sinker records one rt_per_query
    * observation (apply wall millis) and the pushed record count.
    */
  def compactAndApply(changes: DataFrame, table: String,
      keys: Seq[String], cols: Seq[String], orderCols: Seq[String],
      sinkFactory: () => Applier.StatementSink,
      limiter: Option[graft.infra.RateLimiter] = None,
      monitors: Option[graft.infra.Monitoring.PipelineMonitors] = None,
      inlineCheck: Option[(InlineCdcCheck.Checker,
        (String, Map[String, String], Seq[String]) =>
          Option[Map[String, String]])] = None,
      // [parallelizer] parallel_type (parallelizer_config.rs):
      // rdb_merge (default) compacts per key; table/serial skip the
      // merge and apply each table's rows IN ORDER as per-row
      // statements — the reference's table_parallelizer /
      // serial lanes, for sinks or workloads where key compaction
      // is unwanted (e.g. triggers that must see every event)
      parallelType: String = "rdb_merge",
      // [pipeline] batch_sink_interval_secs (base_pipeline.rs:127):
      // sinks that want BIG batches (foxlake) flush on a cadence
      // instead of per-arrival — as a Spark trigger, the micro-batch
      // interval; None keeps the drain-everything-now default
      batchSinkIntervalSecs: Option[Int] = None)
      : DataStreamWriter[org.apache.spark.sql.Row] =
    changes.writeStream
      .outputMode("update")
      .trigger(batchSinkIntervalSecs match {
        case Some(s) if s > 0 =>
          Trigger.ProcessingTime(s.toLong * 1000L)
        case _ => Trigger.AvailableNow()
      })
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // When throttling or monitoring, persist the micro-batch before
        // counting — otherwise count() re-executes the un-cached source
        // scan a second time just to learn the row count.
        val counted = limiter.isDefined || monitors.isDefined
        if (counted) batch.persist()
        // ONE count job per trigger, shared by the limiter drain and
        // the monitor counter — each used to call batch.count()
        // itself, re-reading the (cached) micro-batch twice. At one
        // extra job per trigger over months of streaming that is real
        // cluster time.
        lazy val batchRows: Long = batch.count()
        try {
          val perTable =
            parallelType == "table" || parallelType == "serial"
          val compacted =
            if (perTable) batch
            else Compaction.compact(batch, keys, orderCols,
              col("row_type"))
          limiter.foreach { l =>
            var remaining = batchRows
            while (remaining > 0) {
              val take = math.min(remaining, l.capacity)
              l.acquire(take)
              remaining -= take
            }
          }
          val t0 = System.nanoTime()
          if (perTable) {
            // one ordered lane per table (table_parallelizer.rs): the
            // original statement kinds replay in event order —
            // insert→INSERT, update→UPDATE…WHERE keys,
            // delete→DELETE…WHERE keys. Single-table stream ⇒ one
            // sorted partition IS the table lane.
            val d = RdbQueryBuilder.MySql
            val qt = table.split("\\.", 2) match {
              case Array(a, b) => s"${d.quote(a)}.${d.quote(b)}"
              case a => d.quote(a(0))
            }
            val dataCols = cols.filterNot(_ == "row_type")
            val setCols = dataCols.filterNot(keys.contains)
            val ks = keys
            val sf2 = sinkFactory
            batch.orderBy(orderCols.map(col): _*).coalesce(1)
              .select((dataCols :+ "row_type").distinct.map(col): _*)
              .foreachPartition {
                (it: Iterator[org.apache.spark.sql.Row]) =>
                  val sink = sf2()
                  it.foreach { r =>
                    def v(cs: Seq[String]): Seq[Any] =
                      cs.map(c => r.getAs[Any](c))
                    r.getAs[String]("row_type") match {
                      case "delete" => sink.execute(
                        Applier.StatementBatch(RdbQueryBuilder
                          .batchDelete(d, qt, ks, 1), Seq(v(ks))))
                      case "update" => sink.execute(
                        Applier.StatementBatch(RdbQueryBuilder
                          .update(d, qt, setCols, ks),
                          Seq(v(setCols) ++ v(ks))))
                      case _ => sink.execute(
                        Applier.StatementBatch(RdbQueryBuilder
                          .batchInsert(d, qt, dataCols, 1),
                          Seq(v(dataCols))))
                    }
                  }
              }
          } else {
            Applier.applyCompacted(RdbQueryBuilder.MySql, table,
              compacted, keys, cols, orderCols, sinkFactory)
          }
          monitors.foreach { m =>
            import graft.infra.Monitoring._
            m.sinker.addCounter(RtPerQuery,
              (System.nanoTime() - t0) / 1000000L)
            m.sinker.addBatchCounter(RecordCount, batchRows, 1L)
          }
          // inline CDC check (write-after-check reconciliation): gate
          // to the sampled keys EXECUTOR-SIDE first — at scale only
          // the sampled subset is ever collected — then queue for the
          // driver-side checker. Checker errors must never fail the
          // write path (config.md), hence the catch-all. Merge lane
          // only: the per-table lane has no compaction verdicts to
          // derive expected end-state rows from.
          inlineCheck.filter(_ => !perTable).foreach {
              case (checker, fetch) =>
            try {
              // the serial lane (NULL-key rows) is uncheckable by key
              // lookup — the reference's checker only covers keyed rows
              val keyed = compacted
                .filter(col(Compaction.ActionCol) =!= Compaction.Serial)
              val gated = checker.sampleRate match {
                case Some(r) => keyed.filter(
                  pmod(hash(keys.map(col): _*), lit(100)) < lit(r))
                case None => keyed
              }
              val outCols =
                (keys ++ cols :+ Compaction.ActionCol).distinct
              val expected = gated.select(outCols.map(col): _*)
                .collect().map { row =>
                  val m = outCols.zipWithIndex
                    .filter(_._1 != Compaction.ActionCol)
                    .map { case (c, i) =>
                      c -> Option(row.get(i)).map(_.toString).orNull
                    }.toMap
                  val action =
                    if (row.getAs[String](Compaction.ActionCol) ==
                      Compaction.Delete) "delete"
                    else "upsert"
                  (m, action)
                }.toSeq
              checker.offer(InlineCdcCheck.QueuedBatch(batchId, table,
                keys, expected, preSampled = true))
              checker.drain(fetch): Unit
            } catch {
              case e: Exception =>
                checker.warnings +=
                  s"inline check batch $batchId failed: ${e.getMessage}"
            }
          }
        } finally {
          if (counted) { batch.unpersist(); () }
        }
        ()
      }

  /** Watermarked tumbling-window aggregation over the change stream —
    * the streaming analytics surface (counts + exact decimal sums per
    * window × event type).
    */
  def windowedStats(changes: DataFrame): DataFrame =
    changes
      .withWatermark("ts", "1 hour")
      .groupBy(window(col("ts"), "6 hours"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        // noisy double: floor-quantized micro-units (decimal casts of
        // such values round differently per engine — Relational.fsum)
        (sum(floor(col("value") * lit(1000000.0))).cast(DoubleType) /
          lit(1000000.0)).as("sum_value"))
      .select(unix_timestamp(col("window.start")).as("win_start"),
        col("event_type"), col("n"), col("sum_value"))
}
