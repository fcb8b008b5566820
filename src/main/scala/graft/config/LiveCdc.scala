package graft.config

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.transport.{FsSegmentStore, LiveDial, MysqlReplicationPump,
  Wire}

/** The live mysql:// CDC task lane — what runs when `[extractor] url`
  * names a real server instead of a fixture: dial, pump the binlog
  * stream into capture segments under the task dir, stream them
  * through the EXISTING ChangelogSource → compaction machinery, and
  * land per-table compacted end states under the sink. The same
  * produce→consume topology the reference runs in one process
  * (extractor → pipeline → sinker), here split at the segment seam so
  * the pump is a single lightweight thread and everything after it is
  * distributed Spark.
  *
  * `dialOverride` is the test seam: a FakeWire-scripted server drives
  * the WHOLE lane — pump, publish, micro-batch stream, compaction,
  * sink — in-process (LiveCdcSpec); production leaves it None and
  * dials a [[graft.transport.SocketWire]].
  */
object LiveCdc {

  final case class Report(segments: Int, events: Long,
      tables: Seq[(String, Long)], position: (String, Long, String))

  def isLiveUrl(url: String): Boolean =
    url.startsWith("mysql://") || url.startsWith("postgres://") ||
      url.startsWith("postgresql://") || url.startsWith("redis://") ||
      url.startsWith("mongodb://")

  /** Drain-once semantics (the task-manager unit): one pump session
    * (until the server ends the dump or the wire drops), publish all
    * segments, stream-compact-land, report. A resident deployment
    * loops this under the supervisor with `pump.run`.
    */
  def run(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, dialOverride: Option[() => Wire] = None)
      : Report =
    if (task.sourceDir.startsWith("mysql://"))
      runMysql(spark, task, taskDir, dialOverride)
    else if (task.sourceDir.startsWith("redis://"))
      runRedis(spark, task, taskDir, dialOverride)
    else if (task.sourceDir.startsWith("mongodb://"))
      runMongo(spark, task, taskDir, dialOverride)
    else runPg(spark, task, taskDir, dialOverride)

  def runMysql(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, dialOverride: Option[() => Wire] = None)
      : Report = {
    val captureDir = s"$taskDir/capture"
    val store = new FsSegmentStore(captureDir)
    val pump = new MysqlReplicationPump(
      LiveDial.mysqlConfig(task.sourceDir, task.source), store,
      dialOverride.getOrElse(LiveDial.dialer(task.sourceDir,
        readTimeoutMs = task.source.binlogTimeoutSecs * 1000)))
    val events = pump.runSession()
    store.publishAll()
    consume(spark, task, taskDir, captureDir, "binlog",
      store.names.size, events, pump.position)
  }

  /** The PG twin: slot lifecycle + COPY-both through the PG pump,
    * capture in the bare-frame pgoutput segment format, same
    * downstream machinery with `format=pgoutput`.
    */
  def runPg(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, dialOverride: Option[() => Wire] = None)
      : Report = {
    val captureDir = s"$taskDir/capture"
    val store = new FsSegmentStore(captureDir)
    val slot = task.slot.getOrElse(
      graft.sources.PgSlotLifecycle.SlotConfig("graft_slot"))
    val pump = new graft.transport.PgReplicationPump(
      LiveDial.pgConfig(task.sourceDir, slot), store,
      dialOverride.getOrElse(LiveDial.dialer(task.sourceDir)))
    val frames = pump.runSession()
    store.publishAll()
    consume(spark, task, taskDir, captureDir, "pgoutput",
      store.names.size, frames,
      ("", 0L, pump.position))
  }

  /** The Redis lane: one PSYNC session into a capture segment, then
    * the EXISTING decode (RDB snapshot + command tail) lands two
    * tables under the sink — `redis.snapshot` (the RDB entries) and
    * `redis.commands` (the decoded tail with replication offsets) —
    * the same landing shapes the snapshot_file/check tasks use.
    */
  def runRedis(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, dialOverride: Option[() => Wire] = None)
      : Report = {
    val captureDir = s"$taskDir/capture"
    val store = new FsSegmentStore(captureDir)
    val ep = LiveDial.parseUrl(task.sourceDir)
    val pump = new graft.transport.RedisReplicationPump(
      graft.transport.RedisReplicationPump.Config(
        user = ep.user, password = ep.password),
      store, dialOverride.getOrElse(LiveDial.dialer(task.sourceDir)))
    // a live tail never ends on its own: one session, EOF/drop ends it
    try pump.runSession() catch {
      case _: java.io.EOFException => () // drained capture fixture
    }
    store.publishAll()
    import spark.implicits._
    var snapshotRows = 0L
    var commandRows = 0L
    store.names.foreach { seg =>
      val cap = graft.sources.RedisPsync.decode(store.bytesOf(seg))
      val snap = cap.snapshot.map(e =>
        (e.db, e.key, e.valueType, e.field, e.value, e.expireMs))
        .toDF("db", "key", "value_type", "field", "value", "expire_ms")
      snap.write.mode(SaveMode.Append)
        .parquet(s"${task.sinkDir}/redis.snapshot")
      snapshotRows += cap.snapshot.size
      val cmds = cap.commands.map { case (args, off) =>
        (args.head.toUpperCase, args.mkString(" "), off)
      }.toDF("cmd", "argv", "repl_offset")
      cmds.write.mode(SaveMode.Append)
        .parquet(s"${task.sinkDir}/redis.commands")
      commandRows += cap.commands.size
    }
    Report(store.names.size, pump.bytesCaptured,
      Seq("redis.snapshot" -> snapshotRows,
        "redis.commands" -> commandRows),
      (pump.position._1, pump.position._2, ""))
  }

  /** The Mongo lane: one change-stream session into JSON-line
    * segments, landed as a `mongo.changes` table via spark.read.json
    * — the doc shape the MongoOps change-event machinery consumes.
    */
  def runMongo(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, dialOverride: Option[() => Wire] = None)
      : Report = {
    val captureDir = s"$taskDir/capture"
    val store = new FsSegmentStore(captureDir)
    val ep = LiveDial.parseUrl(task.sourceDir)
    val pump = new graft.transport.MongoChangeStreamPump(
      graft.transport.MongoChangeStreamPump.Config(
        user = ep.user, password = ep.password),
      store, dialOverride.getOrElse(LiveDial.dialer(task.sourceDir)))
    val docs = pump.runSession()
    store.publishAll()
    val out = s"${task.sinkDir}/mongo.changes"
    if (store.names.nonEmpty) {
      val paths = store.names.map(n => s"$captureDir/$n")
      spark.read.json(paths: _*).write.mode(SaveMode.Append)
        .parquet(out)
    }
    val landed =
      if (graft.infra.Fs.exists(out))
        Seq("mongo.changes" -> spark.read.parquet(out).count())
      else Seq.empty
    Report(store.names.size, docs, landed,
      (pump.position.getOrElse(""), 0L, ""))
  }

  /** The micro-batch writer both modes share: per-table filter,
    * route, key-compact, and MERGE into the landed state — the
    * previously landed rows join the batch as seq=-∞ inserts so a
    * later batch's delete removes the key and an update replaces it
    * (plain appends would resurrect deleted keys and duplicate
    * updated ones across micro-batches). The merged frame lands via
    * write-new-then-swap so a crash mid-write never leaves a
    * half-overwritten table.
    */
  private def landBatch(task: TaskConfig.Task, outDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val tables = batch.select("schema", "tb").distinct()
      .collect().map(r => (r.getString(0), r.getString(1)))
    tables.foreach { case (db, tb) =>
      if (task.filter.allowTable(db, tb)) {
        val (toDb, toTb) = task.router.routeTable(db, tb)
        val out = s"$outDir/$toDb.$toTb"
        val slice = batch
          .filter(col("schema") === db && col("tb") === tb)
          .filter(col("row_type")
            .isin(task.filter.doEvents.toSeq: _*))
          .select(col("seq"), col("row_type"), col("key"),
            col("payload"))
        val existing =
          if (graft.infra.Fs.exists(out))
            spark.read.parquet(out)
              .select(lit(Long.MinValue).as("seq"),
                lit("insert").as("row_type"), col("key"),
                col("payload"))
          else spark.emptyDataFrame
        val all = if (existing.isEmpty) slice
          else existing.unionByName(slice)
        val compacted = graft.operators.Compaction.compact(
          all, Seq("key"), Seq("seq"), col("row_type"))
          .filter(col(graft.operators.Compaction.ActionCol) =!=
            graft.operators.Compaction.Delete)
          .select("key", "payload")
        val staged = s"$out.next-$batchId"
        compacted.write.mode(SaveMode.Overwrite).parquet(staged)
        val hfs = graft.infra.Fs.fs(out)
        hfs.delete(new org.apache.hadoop.fs.Path(out), true)
        if (!hfs.rename(new org.apache.hadoop.fs.Path(staged),
            new org.apache.hadoop.fs.Path(out)))
          throw new java.io.IOException(
            s"live cdc: rename $staged -> $out failed")
      }
    }
    ()
  }

  private def changeStream(spark: SparkSession, task: TaskConfig.Task,
      captureDir: String, format: String) =
    spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", captureDir)
      .option("format", format)
      .option("key_cols",
        task.keysByTable.values.flatten.toSeq.distinct.mkString(","))
      .load()

  /** RESIDENT mode — the deployment topology: the pump runs
    * supervised (capped-backoff reconnect) on its own thread while a
    * ProcessingTime stream continuously consumes whatever segments
    * publish; `stop` ends both cooperatively (the task manager's
    * stop flag). Returns when both halves have wound down.
    */
  def runMysqlResident(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, stop: () => Boolean,
      dialOverride: Option[() => Wire] = None,
      triggerMs: Long = 500L): Report = {
    val captureDir = s"$taskDir/capture"
    val store = new FsSegmentStore(captureDir)
    val pump = new MysqlReplicationPump(
      LiveDial.mysqlConfig(task.sourceDir, task.source), store,
      dialOverride.getOrElse(LiveDial.dialer(task.sourceDir,
        readTimeoutMs = task.source.binlogTimeoutSecs * 1000)))
    val pumpError = new java.util.concurrent.atomic.AtomicReference[
      Throwable](null)
    val pumpThread = new Thread(() => {
      try {
        pump.run(until = stop)
        store.publishAll()
      } catch {
        case t: Throwable =>
          store.publishAll()
          pumpError.set(t)
      }
    }, "graft-mysql-pump")
    pumpThread.setDaemon(true)
    pumpThread.start()

    val q = changeStream(spark, task, captureDir, "binlog")
      .writeStream
      .option("checkpointLocation", s"$taskDir/checkpoint")
      .foreachBatch(landBatch(task, task.sinkDir) _)
      .trigger(org.apache.spark.sql.streaming.Trigger
        .ProcessingTime(triggerMs))
      .start()
    try {
      while (!stop() && pumpError.get() == null)
        Thread.sleep(triggerMs)
      // the pump observes stop() between packets — a blocked read
      // clears at the socket timeout, so wait past it before draining
      // (leaving early would strand the final publishAll unread)
      val deadline = System.currentTimeMillis() +
        task.source.binlogTimeoutSecs * 2000L + 5000L
      while (pumpThread.isAlive &&
        System.currentTimeMillis() < deadline)
        pumpThread.join(500)
      // drain what the pump published before stopping the stream
      q.processAllAvailable()
    } finally q.stop()
    Option(pumpError.get()).foreach(t => throw t)

    val landed = graft.infra.Fs.listNames(task.sinkDir)
      .filter(_.contains("."))
      .sorted.map { t =>
        t -> spark.read.parquet(s"${task.sinkDir}/$t").count()
      }
    Report(store.names.size, pump.eventsAppended, landed,
      pump.position)
  }

  private def consume(spark: SparkSession, task: TaskConfig.Task,
      taskDir: String, captureDir: String, format: String,
      nSegments: Int, events: Long,
      position: (String, Long, String)): Report = {
    // the capture dir through the existing micro-batch transport:
    // decode on executors, per-table key compaction, parquet landing
    val outDir = task.sinkDir
    val q = changeStream(spark, task, captureDir, format)
      .writeStream
      .option("checkpointLocation", s"$taskDir/checkpoint")
      .foreachBatch(landBatch(task, outDir) _)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val landed = graft.infra.Fs.listNames(outDir)
      .filter(_.contains("."))
      .sorted.map { t =>
        t -> spark.read.parquet(s"$outDir/$t").count()
      }
    Report(nSegments, events, landed, position)
  }
}
