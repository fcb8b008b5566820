package graft.config

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Path, Paths, StandardOpenOption}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.SparkSession

/** Local task lifecycle manager — the dt-cli analog
  * (/root/reference/dt-cli/src/main.rs: Create/Start/List/Show/Logs/
  * Stop/Delete over per-task record directories). Each task owns
  * `<stateDir>/<name>/` holding:
  *
  *   - `task.ini` — the task config, verbatim as created
  *   - `meta.ini` — status + millisecond timestamps + last error
  *   - `task.log` — append-only run log (`logs` tails it)
  *   - `stop.requested` — cooperative stop flag (`stop` plants it)
  *
  * The reference forks a child process per task and kills it on stop;
  * on Spark the runner executes inside the driver JVM, so `start` runs
  * the task one TABLE UNIT at a time and consults the stop flag between
  * units — the status lifecycle (created → running → finished | failed
  * | stopped, restartable from any terminal state) is the same.
  */
object TaskManager {

  final val Statuses = Seq("created", "running", "finished", "failed",
    "stopped")

  final case class TaskMeta(name: String, status: String,
      createdMs: Long, startedMs: Option[Long], endedMs: Option[Long],
      error: Option[String], restarts: Int = 0)

  private def taskDir(stateDir: String, name: String): Path = {
    require(name.matches("[A-Za-z0-9_.-]+"), s"invalid task name $name")
    Paths.get(stateDir, name)
  }

  // ------------------------------------------------------------- meta io

  private def writeMeta(dir: Path, m: TaskMeta): Unit = {
    val lines = Seq(
      "[meta]",
      s"name=${m.name}",
      s"status=${m.status}",
      s"created_ms=${m.createdMs}",
      s"started_ms=${m.startedMs.getOrElse(-1L)}",
      s"ended_ms=${m.endedMs.getOrElse(-1L)}",
      s"restarts=${m.restarts}",
      s"error=${m.error.getOrElse("").replaceAll("[\r\n]+", " ")}")
    Files.write(dir.resolve("meta.ini"),
      lines.mkString("", "\n", "\n").getBytes(StandardCharsets.UTF_8))
  }

  private def readMeta(dir: Path): TaskMeta = {
    val text = new String(Files.readAllBytes(dir.resolve("meta.ini")),
      StandardCharsets.UTF_8)
    val s = TaskConfig.parseIni(text).section("meta")
    def opt(k: String): Option[Long] =
      s(k).map(_.toLong).filter(_ >= 0)
    TaskMeta(s.get("name", dir.getFileName.toString),
      s.get("status", "created"),
      s.get("created_ms", "0").toLong, opt("started_ms"), opt("ended_ms"),
      s("error").filter(_.nonEmpty),
      s.get("restarts", "0").toInt)
  }

  private def log(dir: Path, line: String): Unit =
    Files.write(dir.resolve("task.log"),
      s"[${System.currentTimeMillis()}] $line\n"
        .getBytes(StandardCharsets.UTF_8),
      StandardOpenOption.CREATE, StandardOpenOption.APPEND)

  // ---------------------------------------------------------- lifecycle

  /** Create a task record; refuses to overwrite an existing one. */
  def create(stateDir: String, name: String, iniText: String): TaskMeta = {
    val dir = taskDir(stateDir, name)
    require(!Files.exists(dir), s"task $name already exists")
    TaskConfig.fromIni(iniText) // validate before recording
    Files.createDirectories(dir)
    Files.write(dir.resolve("task.ini"),
      iniText.getBytes(StandardCharsets.UTF_8))
    val meta = TaskMeta(name, "created", System.currentTimeMillis(),
      None, None, None)
    writeMeta(dir, meta)
    log(dir, "created")
    meta
  }

  def list(stateDir: String): Seq[TaskMeta] = {
    val root = Paths.get(stateDir)
    if (!Files.isDirectory(root)) Nil
    else Files.list(root).iterator().asScala.toSeq
      .filter(p => Files.exists(p.resolve("meta.ini")))
      .map(readMeta).sortBy(_.name)
  }

  def show(stateDir: String, name: String): (TaskMeta, TaskConfig.Task) = {
    val dir = taskDir(stateDir, name)
    val ini = new String(Files.readAllBytes(dir.resolve("task.ini")),
      StandardCharsets.UTF_8)
    (readMeta(dir), TaskConfig.fromIni(ini, Some(dir)))
  }

  def logs(stateDir: String, name: String): Seq[String] = {
    val f = taskDir(stateDir, name).resolve("task.log")
    if (Files.exists(f)) Files.readAllLines(f).asScala.toSeq else Nil
  }

  /** Plant the cooperative stop flag; the runner honors it between
    * table units (a no-op unless the task is running).
    */
  def requestStop(stateDir: String, name: String): Unit = {
    val dir = taskDir(stateDir, name)
    Files.write(dir.resolve("stop.requested"), Array.emptyByteArray)
    log(dir, "stop requested")
  }

  /** Delete a task record; refuses while the task is running. */
  def delete(stateDir: String, name: String): Unit = {
    val dir = taskDir(stateDir, name)
    require(readMeta(dir).status != "running",
      s"task $name is running — stop it first")
    Files.walk(dir).iterator().asScala.toSeq.reverse
      .foreach(Files.delete)
  }

  /** Run the task in-process, one table unit at a time. `afterUnit`
    * fires after each completed unit (test hook for interleaving a
    * stop request). Any terminal-state task restarts from scratch;
    * snapshot unit writes are idempotent overwrites.
    */
  def start(spark: SparkSession, stateDir: String, name: String,
      afterUnit: Int => Unit = _ => (),
      liveDial: Option[() => graft.transport.Wire] = None,
      liveNodeDial: Option[String => graft.transport.Wire] = None)
      : TaskMeta = {
    val dir = taskDir(stateDir, name)
    val meta0 = readMeta(dir)
    require(meta0.status != "running", s"task $name is already running")
    Files.deleteIfExists(dir.resolve("stop.requested"))
    val ini = new String(Files.readAllBytes(dir.resolve("task.ini")),
      StandardCharsets.UTF_8)
    val task = TaskConfig.fromIni(ini, Some(dir))
    var meta = meta0.copy(status = "running",
      startedMs = Some(System.currentTimeMillis()), endedMs = None,
      error = None)
    writeMeta(dir, meta)
    // beacon at start: a freshly-started task must never look like a
    // crashed runner to a concurrent watch pass (the per-unit touches
    // keep it fresh from here)
    touchAlive(dir)
    log(dir, "started")
    def finish(status: String, error: Option[String]): TaskMeta = {
      meta = meta.copy(status = status,
        endedMs = Some(System.currentTimeMillis()), error = error)
      writeMeta(dir, meta)
      log(dir, status + error.fold("")(e => s": $e"))
      meta
    }
    def stopRequested = Files.exists(dir.resolve("stop.requested"))
    try {
      // live mysql:// CDC: dial-pump-stream-land through LiveCdc (the
      // url names a real server, not a fixture dir); drain-once per
      // start, positions carried by the pump + streaming checkpoint
      if (task.extractType == TaskConfig.CdcExtract &&
          LiveCdc.isLiveUrl(task.sourceDir)) {
        // beacon per pump/landing step: a live drain can outlast
        // staleAliveMs, and a demoted-but-healthy runner would race a
        // second pump onto the same capture dir + checkpoint.
        // `resident=true` keeps pump + landing running until a stop
        // request (the deployment posture); default drains once.
        // Disk-safety gate: retention now defaults ON for resident
        // tasks, so this only trips on an EXPLICIT opt-out — loud in
        // the task log, because the capture dir then grows with the
        // full replication history until the disk fills.
        val gate = graft.infra.Precheck.checkResidentRetention(
          task.source.resident, task.source.captureRetention)
        if (gate.detail.nonEmpty) log(dir, s"precheck ${gate.detail}")
        // one monitor per live run: the landers publish their
        // face-completeness gauges here, flushed into the task log
        // below (the same counters the drain report carries)
        val liveMon = new graft.infra.Monitoring.Monitor(
          "landed_face", "landed current-state face")
        val r =
          if (task.source.resident)
            LiveCdc.runResident(spark, task, dir.toString,
              stop = () => stopRequested, dialOverride = liveDial,
              onProgress = () => touchAlive(dir),
              dialNodeOverride = liveNodeDial,
              monitor = Some(liveMon))
          else LiveCdc.run(spark, task, dir.toString, liveDial,
            onProgress = () => touchAlive(dir),
            dialNodeOverride = liveNodeDial,
            monitor = Some(liveMon))
        log(dir, s"live_cdc segments=${r.segments} " +
          s"events=${r.events} position=${r.position._1}:" +
          s"${r.position._2} " +
          r.tables.map { case (t, n) => s"$t=$n" }.mkString(" "))
        liveMon.flushLines().foreach(l => log(dir, s"monitor $l"))
        return finish("finished", None)
      }
      // CDC tasks are stream-scoped, not table-unit-scoped: one
      // CdcTask drain per start, positions in the task dir's
      // file-backed store (restart-safe) — same composition as Main
      if (task.extractType == TaskConfig.CdcExtract &&
          task.walCapture.isDefined && task.slot.isDefined) {
        val capture = task.walCapture.get
        // capture is a TASK path (may be s3a/hdfs) — Hadoop FS read
        val bytes = graft.infra.Fs.readAllBytes(capture)
        // [resumer] resume_type=from_log overrides the position-store
        // location; from_db/from_target name the recorder's metadata
        // table (table_full_name) — the reference's ResumerConfig
        val posPath = task.positionStore.getOrElse(task.resumer match {
          case TaskConfig.ResumeFromLog(logDir, _) if logDir.nonEmpty =>
            java.nio.file.Paths.get(logDir)
              .resolve(s"$name.positions.log").toString
          case _ => dir.resolve("positions.log").toString
        })
        val store = new graft.sources.DbResumer.FileStore(posPath)
        val (rSchema, rTable) = task.resumer match {
          case r: TaskConfig.ResumeFromDb
              if r.tableFullName.contains(".") =>
            val Array(s, t) = r.tableFullName.split("\\.", 2)
            (s, t)
          case _ => (graft.sources.DbResumer.DefaultSchema,
            graft.sources.DbResumer.DefaultTable)
        }
        val rec = new graft.sources.DbResumer.Recorder(name, store,
          graft.sources.DbResumer.MySqlDialect, rSchema, rTable)
        rec.init(isInit = false)
        val resumer = new graft.sources.DbResumer.Dual(
          new graft.sources.SnapshotResumer(s"$posPath.d"), rec,
          () => new graft.sources.DbResumer.Recovery(name, store))
        val uri = java.net.URI.create(task.sinkDir)
        val report = graft.streaming.CdcTask.run(spark, task,
          graft.streaming.CdcTask.PgAnswers(
            graft.sources.PgSlotLifecycle.SlotStatus(exists = false),
            pubExists = false, walStream = bytes),
          (db, tb, batchId, op) =>
            new graft.sinks.StreamLoadHttp.HttpPayloadSink(
              graft.sinks.StreamLoadHttp.Config(uri.getHost,
                uri.getPort, db, tb, task.sinkUser,
                task.sinkPassword,
                hardDelete = task.sink.hardDelete), batchId, op),
          resumer,
          limiter = task.maxRps.map(r =>
            new graft.infra.RateLimiter(r)),
          byteLimiter = task.sink.maxMbps
            .orElse(task.source.maxMbps)
            .map(m => new graft.infra.RateLimiter(
              m * 1024L * 1024L)))
        log(dir, s"cdc start_lsn=${report.startLsn} " +
          s"shipped=${report.rowsShipped} " +
          s"skipped=${report.eventsSkipped} end=${report.endLsn}")
        return finish("finished", None)
      }
      // corpus-family prechecks (the dt-precheck gate applied to the
      // curation extension): fail fast before any cluster work
      val corpusKinds = Set[TaskConfig.ExtractType](
        TaskConfig.CurationExtract, TaskConfig.CurationStreamExtract,
        TaskConfig.LoaderExtract)
      if (corpusKinds(task.extractType)) {
        val isStream =
          task.extractType == TaskConfig.CurationStreamExtract
        val gates = graft.infra.Precheck.checkCorpusContract(spark,
          task.sourceDir, needTs = isStream,
          allowEmpty = isStream) ++
          task.benchmarkDir.toSeq.flatMap(bd =>
            graft.infra.Precheck.checkCorpusContract(spark, bd))
        val bad = gates.filterNot(_.ok)
        if (bad.nonEmpty) {
          val detail = bad.map(g => s"${g.item}: ${g.detail}")
            .mkString("; ")
          log(dir, s"precheck failed: $detail")
          return finish("error", Some(detail))
        }
      }
      // curation tasks are corpus-scoped, not table-unit-scoped
      if (task.extractType == TaskConfig.CurationExtract) {
        val s = TaskRunner.runCuration(spark, task)
        log(dir, s"curation docs=${s.nDocs} kept=${s.nKept} " +
          s.reasons.toSeq.sorted.map { case (k, v) => s"$k=$v" }
            .mkString(" "))
        return finish("finished", None)
      }
      // loader layout is corpus-scoped too
      if (task.extractType == TaskConfig.LoaderExtract) {
        val s = TaskRunner.runLoader(spark, task)
        log(dir, s"loader docs=${s.nDocs} shards=${s.nShards} " +
          s"windows=${s.nWindows} tokens=${s.totalTokens}")
        return finish("finished", None)
      }
      // WARC ingestion is corpus-scoped: crawl files → documents
      if (task.extractType == TaskConfig.WarcExtract) {
        val s = TaskRunner.runWarc(spark, task)
        log(dir, s"warc docs=${s.nDocs} " +
          s.records.toSeq.sorted.map { case (k, v) => s"$k=$v" }
            .mkString(" "))
        return finish("finished", None)
      }
      if (task.extractType == TaskConfig.JsonlExtract) {
        val s = TaskRunner.runJsonl(spark, task)
        log(dir, s"jsonl docs=${s.nDocs} bad_lines=${s.nBadLines} " +
          s"with_url=${s.withUrl}")
        return finish("finished", None)
      }
      // streaming curation: drain what has arrived; checkpoints under
      // the sink dir make the next start resume after this one
      if (task.extractType == TaskConfig.CurationStreamExtract) {
        // [extractor] benchmark_dir: gate the stream against the
        // held-out set's n-gram Bloom (built once here, batch-side)
        val bloom = task.benchmarkDir.map(bd =>
          graft.operators.CurationOps.benchmarkBloomFromDir(spark, bd))
        val r = graft.streaming.StreamingCuration.drain(spark,
          task.sourceDir, task.sinkDir, benchmarkBloom = bloom)
        log(dir, s"curation_stream in=${r.docsIn} " +
          s"quality_dropped=${r.qualityDropped} " +
          s"contam_dropped=${r.contamDropped} " +
          s"exact_dropped=${r.exactDropped} " +
          s"neardup_flagged=${r.nearDupFlagged} kept=${r.kept}")
        return finish("finished", None)
      }
      // the remaining reference extract types are single-shot runs
      // through their TaskRunner drivers (not table-unit loops)
      task.extractType match {
        case TaskConfig.CheckLogExtract =>
          TaskRunner.runCheckLogReplay(spark, task).foreach {
            case (tb, n) => log(dir, s"check_log $tb revise=$n")
          }
          return finish("finished", None)
        case TaskConfig.StructExtract =>
          TaskRunner.runStruct(spark, task).foreach { case (tb, st) =>
            log(dir, s"struct $tb statements=${st.size}")
          }
          return finish("finished", None)
        case TaskConfig.SnapshotFileExtract =>
          val r = TaskRunner.runSnapshotFile(spark, task)
          log(dir, s"snapshot_file ${r.dstTable} rows=${r.rows}")
          return finish("finished", None)
        case TaskConfig.ScanExtract =>
          val n = TaskRunner.runScan(spark, task).count()
          log(dir, s"scan ${task.statisticType} report_rows=$n")
          return finish("finished", None)
        case TaskConfig.ReshardExtract =>
          val n = TaskRunner.runReshard(spark, task).count()
          log(dir, s"reshard planned_moves=$n")
          return finish("finished", None)
        case TaskConfig.FoxlakeS3Extract =>
          TaskRunner.runFoxlakeS3(spark, task).foreach { r =>
            log(dir, s"foxlake_s3 ${r.schema}.${r.tb} -> " +
              s"${r.dstTable} rows=${r.rows}")
          }
          return finish("finished", None)
        case _ => () // table-unit-scoped types fall through
      }
      val units = TaskRunner.units(task)
      var i = 0
      var stopped = false
      while (i < units.length && !stopped) {
        val (schema, tb) = units(i)
        task.extractType match {
          case TaskConfig.SnapshotExtract =>
            val r = TaskRunner.snapshotTable(spark, task, schema, tb)
            log(dir, s"snapshot $schema.$tb -> ${r.dstTable} rows=${r.rows}")
          case TaskConfig.CheckExtract =>
            TaskRunner.checkTable(spark, task, schema, tb) match {
              case Some((t, counts)) =>
                log(dir, s"check $t " + counts.toSeq.sortBy(_._1)
                  .map { case (k, v) => s"$k=$v" }.mkString(" "))
              case None => log(dir, s"check $schema.$tb skipped (no keys)")
            }
          case other =>
            log(dir, s"$other unit $schema.$tb — provide the stream " +
              "inputs (wal_capture/slot) to drain from the lifecycle")
        }
        afterUnit(i)
        i += 1
        if (i < units.length && stopRequested) stopped = true
      }
      if (stopped) finish("stopped", None)
      else finish("finished", None)
    } catch {
      case e: Exception => finish("failed", Some(e.toString))
    }
  }

  // --------------------------------------------------------- supervision
  // the reference CLI's daemon posture (dt-cli/src/main.rs): persistent
  // task dirs with liveness-checked restart (reject_if_task_running /
  // restart_persistent_task), crash recovery, and log management. Tasks
  // here run in-process (Spark apps), so the supervised unit is a task
  // RUN rather than an OS child — the state machine (liveness probe,
  // capped restart budget, backoff, resume from positions) is the same.

  /** `staleAliveMs` must be comfortably larger than the longest
    * single unit (the beacon only refreshes between units) — the
    * 10-minute default trades slow takeover for never demoting a
    * live runner mid-unit.
    */
  final case class SupervisorConfig(maxRestarts: Int = 5,
      baseBackoffMs: Long = 500L, maxBackoffMs: Long = 60000L,
      staleAliveMs: Long = 600000L, logMaxBytes: Long = 1L << 20,
      logKeep: Int = 3)

  def backoffMs(cfg: SupervisorConfig, attempt: Int): Long =
    math.min(cfg.maxBackoffMs,
      cfg.baseBackoffMs * (1L << math.min(math.max(attempt - 1, 0), 16)))

  /** Liveness beacon: the runner touches this per unit; the watcher
    * treats `running` + a stale beacon as a crashed runner (the
    * in-process analogue of dt-cli's dead-pid check).
    */
  private def touchAlive(dir: Path): Unit = {
    // tmp + atomic move: the beacon is now touched from BOTH the pump
    // thread (BeaconStore) and the landing loop, and a watcher reading
    // a torn truncate-rewrite would mis-demote a healthy runner — the
    // exact double-pump race the beacon exists to prevent
    val tmp = dir.resolve(
      s"runner.alive.${Thread.currentThread().getId}.tmp")
    Files.write(tmp, System.currentTimeMillis().toString
      .getBytes(StandardCharsets.UTF_8))
    try Files.move(tmp, dir.resolve("runner.alive"),
      java.nio.file.StandardCopyOption.ATOMIC_MOVE,
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    catch { case _: java.io.IOException =>
      Files.deleteIfExists(tmp): Unit // a concurrent toucher won
    }
  }

  private def aliveAgeMs(dir: Path): Option[Long] = {
    val f = dir.resolve("runner.alive")
    if (!Files.exists(f)) None
    else scala.util.Try(System.currentTimeMillis() -
      new String(Files.readAllBytes(f), StandardCharsets.UTF_8)
        .trim.toLong).toOption
  }

  /** Run a task under supervision: start it, and while it ends
    * `failed` and the restart budget allows, back off and start again.
    * Each restart resumes from the task's own durable state —
    * positions.log for CDC (events before the recorded position skip),
    * idempotent overwrites for snapshot units. Restart count persists
    * in meta.ini so a watcher across process restarts honors the same
    * budget.
    */
  def superviseStart(spark: SparkSession, stateDir: String,
      name: String, cfg: SupervisorConfig = SupervisorConfig(),
      sleep: Long => Unit = Thread.sleep,
      afterUnit: Int => Unit = _ => ()): TaskMeta = {
    val dir = taskDir(stateDir, name)
    var meta = start(spark, stateDir, name, { i =>
      touchAlive(dir); afterUnit(i)
    })
    var attempt = readMeta(dir).restarts
    while (meta.status == "failed" && attempt < cfg.maxRestarts) {
      attempt += 1
      val delay = backoffMs(cfg, attempt)
      log(dir, s"supervised restart #$attempt in ${delay}ms " +
        s"(budget ${cfg.maxRestarts}) after: " +
        meta.error.getOrElse("?"))
      writeMeta(dir, meta.copy(restarts = attempt))
      sleep(delay)
      meta = start(spark, stateDir, name, { i =>
        touchAlive(dir); afterUnit(i)
      }).copy(restarts = attempt)
      writeMeta(dir, meta)
    }
    if (meta.status == "failed" && attempt >= cfg.maxRestarts)
      log(dir, s"restart budget exhausted ($attempt), leaving failed")
    rotateLogs(dir.toString, cfg.logMaxBytes, cfg.logKeep)
    meta
  }

  /** One watch pass over every task dir — the daemon loop body. A
    * `running` task whose liveness beacon is stale is a crashed runner
    * (this JVM or a previous one died mid-task): demote to `failed` so
    * the restart path picks it up; then restart every `failed` task
    * with remaining budget. Returns the names restarted this pass.
    */
  def superviseAll(spark: SparkSession, stateDir: String,
      cfg: SupervisorConfig = SupervisorConfig(),
      sleep: Long => Unit = Thread.sleep): Seq[String] = {
    list(stateDir).flatMap { m =>
      val dir = taskDir(stateDir, m.name)
      // staleness judged by the beacon when present; a beacon-less
      // running task (started by a pre-beacon build) falls back to
      // startedMs age — never "absent means dead"
      def runningAgeMs: Long = aliveAgeMs(dir).getOrElse(
        m.startedMs.map(System.currentTimeMillis() - _)
          .getOrElse(Long.MaxValue))
      val effective =
        if (m.status == "running" && runningAgeMs > cfg.staleAliveMs) {
          log(dir, "liveness beacon stale — demoting crashed runner")
          val demoted = m.copy(status = "failed",
            error = Some("runner crashed (stale liveness beacon)"))
          writeMeta(dir, demoted)
          demoted
        } else m
      if (effective.status == "failed" &&
          effective.restarts < cfg.maxRestarts) {
        superviseStart(spark, stateDir, m.name, cfg, sleep)
        Some(m.name)
      } else None
    }
  }

  /** Rotate `task.log` into `task.log.1 … task.log.<keep>` when it
    * exceeds `maxBytes` (dt-cli's log management for task dirs).
    */
  def rotateLogs(taskDirPath: String, maxBytes: Long,
      keep: Int): Unit = {
    val dir = Paths.get(taskDirPath)
    val live = dir.resolve("task.log")
    if (!Files.exists(live) || Files.size(live) <= maxBytes) return
    // shift task.log.k -> task.log.k+1, oldest beyond `keep` drops
    (keep to 1 by -1).foreach { k =>
      val from = dir.resolve(s"task.log.$k")
      if (Files.exists(from)) {
        if (k == keep) Files.delete(from)
        else Files.move(from, dir.resolve(s"task.log.${k + 1}"),
          java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
      }
    }
    Files.move(live, dir.resolve("task.log.1"),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING): Unit
  }
}
