package graft.streaming

import scala.collection.mutable

import graft.config.TaskConfig
import graft.sources.DbResumer

/** Inline CDC check — "continuous reconciliation"
  * (reference docs/en/snapshot/check.md §Inline cdc check and the
  * config.md inline-cdc-check constraint table): applied CDC batches are
  * re-checked against the write target; inconsistencies enter a checker
  * state store instead of a retry loop, and LATER events may naturally
  * reconcile older miss/diff records. Checker failures never affect the
  * write path.
  *
  * Contract points implemented exactly as documented:
  *  - `[checker]` present without `enable`, non-basic pipeline, non-write
  *    sinker, non-rdb_merge parallelizer, sinker db_type outside
  *    mysql/pg, or any target field under `[checker]` → fail fast
  *    (ConfigError);
  *  - `max_retries`/`retry_interval_secs` forced to 0 inline;
  *  - deterministic checker-side KEY-HASH sampling before target fetch
  *    (same key ⇒ same decision across resumes — unlike standalone
  *    snapshot check's source-side Top-N limiting);
  *  - the checker queue counts BATCHES, and when full the OLDEST
  *    pending batch drops with a warning rather than blocking writes;
  *  - periodic check snapshots write `miss.log`/`diff.log` capped at
  *    `check_log_max_rows`, keeping the LATEST records;
  *  - checker state persists through the resumer seam
  *    (`[resumer] resume_type=from_target|from_db` requirement) — here
  *    the same [[DbResumer.SqlExec]] store as positions, under a
  *    `<task>#checker` namespace so position rows are untouched.
  */
object InlineCdcCheck {

  final case class ConfigError(msg: String) extends RuntimeException(msg)

  final case class Config(
      batchSize: Int,
      queueSize: Int,
      sampleRate: Option[Int],
      checkLogDir: String,
      checkLogMaxRows: Int,
      intervalSecs: Int,
      maxRetries: Int) // always 0 inline — kept to show the forcing

  /** Parse `[checker]` with the fail-fast decision table. Returns None
    * when the section is absent (checking disabled).
    */
  def fromIni(p: TaskConfig.Parsed): Option[Config] = {
    if (!p.sections.contains("checker")) return None
    val ck = p.section("checker")
    val sk = p.section("sinker")
    val pl = p.section("pipeline")
    val pz = p.section("parallelizer")
    if (!ck("enable").exists(_.toBoolean))
      throw ConfigError("[checker] section present without enable=true")
    if (pl.get("pipeline_type", "basic") != "basic")
      throw ConfigError("inline cdc check requires pipeline_type=basic")
    if (sk.get("sink_type", "write") != "write")
      throw ConfigError("inline cdc check requires [sinker] sink_type=write")
    if (pz.get("parallel_type", "rdb_merge") != "rdb_merge")
      throw ConfigError(
        "inline cdc check requires parallel_type=rdb_merge")
    val dbType = sk.get("db_type", "mysql")
    if (dbType != "mysql" && dbType != "pg")
      throw ConfigError(
        s"inline cdc check unsupported for sinker db_type=$dbType")
    Seq("db_type", "url", "username", "password").foreach { f =>
      if (ck(f).isDefined)
        throw ConfigError(
          s"[checker] must not set $f — the checker reuses the " +
            "parsed [sinker] target")
    }
    val rate = ck("sample_rate").map(_.toInt)
    rate.foreach { r =>
      if (r < 1 || r > 100)
        throw ConfigError(s"sample_rate must be 1..=100, got $r")
    }
    val logDir = ck.get("check_log_dir", "")
    Some(Config(
      batchSize = ck.get("batch_size", "200").toInt,
      queueSize = ck.get("queue_size", "200").toInt,
      sampleRate = rate,
      checkLogDir =
        if (logDir.nonEmpty) logDir
        else s"${p.section("runtime").get("log_dir", "/tmp/graft")}/check",
      checkLogMaxRows = ck.get("check_log_max_rows", "1000").toInt,
      intervalSecs =
        ck.get("cdc_check_log_interval_secs", "30").toInt,
      // forced regardless of what the INI says (config.md)
      maxRetries = 0))
  }

  /** Deterministic key-hash sampling: floorMod keeps the decision
    * stable for the same key across resumes; None checks everything.
    */
  def sampled(keyHash: Long, rate: Option[Int]): Boolean =
    rate.forall(r => math.floorMod(keyHash, 100L) < r)

  /** One applied batch queued for checking: the compacted final state
    * the sinker wrote (key image + full row for upserts, key image for
    * deletes). `preSampled` marks rows already gated executor-side
    * (the 100 TB form — only sampled keys ever leave the executors);
    * the driver-side gate then must not re-sample them.
    */
  final case class QueuedBatch(batchId: Long, table: String,
      idCols: Seq[String],
      expected: Seq[(Map[String, String], String)], // (row, action)
      preSampled: Boolean = false)

  final case class Defect(table: String, key: String, status: String,
      batchId: Long)

  final case class BatchReport(batchId: Long, checked: Long,
      sampledOut: Long, newMiss: Long, newDiff: Long, reconciled: Long)

  private def keyOf(row: Map[String, String],
      idCols: Seq[String]): String =
    idCols.map(c => s"$c=${row.getOrElse(c, "")}").mkString("|")

  private def keyHash(row: Map[String, String],
      idCols: Seq[String]): Long = {
    var h = 1L
    idCols.foreach { c =>
      row.get(c) match {
        case Some(v) if v != null => h = 31 * h + v.hashCode.toLong
        case _ => return 0L
      }
    }
    h
  }

  private val CheckerNamespace = "#checker"

  /** The reconciliation store + bounded batch queue. `fetch` is the
    * target read (the parsed `[sinker]` connection in production;
    * `table → key → row` here): it runs only for sampled keys.
    */
  final class Checker(cfg: Config, taskId: String = "task",
      store: Option[DbResumer.SqlExec] = None) {

    private val defects =
      mutable.LinkedHashMap.empty[(String, String), Defect]
    private val queue = mutable.ArrayDeque.empty[QueuedBatch]
    private var dropped = 0L
    val warnings = mutable.ArrayBuffer.empty[String]

    // recover persisted checker state (the resumer requirement)
    store.foreach { s =>
      s.query(
        "SELECT resumer_type, position_key, position_data FROM x " +
          "WHERE task_id = ?", Seq(taskId + CheckerNamespace))
        .foreach {
          case Seq(_, key, data) =>
            val Array(table, k) = key.split("\u0001", 2)
            val Array(status, batch) = data.split("\u0001", 2)
            defects((table, k)) =
              Defect(table, k, status, batch.toLong)
          case _ => ()
        }
    }

    def droppedBatches: Long = dropped
    def pending: Int = queue.size
    def state: Seq[Defect] = defects.values.toSeq
    def sampleRate: Option[Int] = cfg.sampleRate

    /** Enqueue an applied batch; when the queue is full the OLDEST
      * pending batch drops with a warning — the write path never
      * blocks on checking (config.md queue behavior).
      */
    def offer(b: QueuedBatch): Unit = {
      if (queue.size >= cfg.queueSize) {
        val old = queue.removeHead()
        dropped += 1
        warnings += s"checker queue full: dropped pending batch " +
          s"${old.batchId} (${old.expected.size} rows)"
      }
      queue.append(b): Unit
    }

    /** Drain and check everything queued. Checker errors are recorded
      * as warnings, never rethrown (they must not affect the write
      * path).
      */
    def drain(fetch: (String, Map[String, String], Seq[String]) =>
        Option[Map[String, String]]): Seq[BatchReport] = {
      val out = Seq.newBuilder[BatchReport]
      while (queue.nonEmpty) {
        val b = queue.removeHead()
        try out += checkBatch(b, fetch)
        catch {
          case e: Exception =>
            warnings += s"batch ${b.batchId} check failed: " +
              s"${e.getMessage}"
        }
      }
      out.result()
    }

    /** Check one batch: sampling gate → target fetch → classify →
      * reconcile. A key found consistent REMOVES any older defect for
      * it (later events cancel old miss/diff records).
      */
    def checkBatch(b: QueuedBatch,
        fetch: (String, Map[String, String], Seq[String]) =>
          Option[Map[String, String]]): BatchReport = {
      var checked = 0L; var sampledOut = 0L
      var newMiss = 0L; var newDiff = 0L; var reconciled = 0L
      b.expected.foreach { case (row, action) =>
        if (!b.preSampled &&
            !sampled(keyHash(row, b.idCols), cfg.sampleRate))
          sampledOut += 1
        else {
          checked += 1
          val key = keyOf(row, b.idCols)
          val got = fetch(b.table, row, b.idCols)
          val status =
            if (action == "delete")
              if (got.isEmpty) "OK" else "DIFF"
            else got match {
              case None => "MISS"
              case Some(t) =>
                val diffCols = row.keys.filterNot(b.idCols.contains)
                  .filter(c => t.getOrElse(c, null) !=
                    row.getOrElse(c, null))
                if (diffCols.isEmpty) "OK" else "DIFF"
            }
          if (status == "OK") {
            if (defects.remove((b.table, key)).isDefined)
              reconciled += 1
          } else {
            if (status == "MISS") newMiss += 1 else newDiff += 1
            defects((b.table, key)) =
              Defect(b.table, key, status, b.batchId)
          }
        }
      }
      persist()
      BatchReport(b.batchId, checked, sampledOut, newMiss, newDiff,
        reconciled)
    }

    /** Replace the persisted checker rows under the namespace (the
      * position rows of the same store are untouched — different
      * task_id binding).
      */
    def persist(): Unit = store.foreach { s =>
      val ns = taskId + CheckerNamespace
      s.execute("DELETE FROM x WHERE task_id = ?", Seq(ns))
      defects.values.foreach { d =>
        s.execute(
          "INSERT INTO x (task_id, resumer_type, position_key, " +
            "position_data) VALUES (?, ?, ?, ?)",
          Seq(ns, "CheckerState", s"${d.table}\u0001${d.key}",
            s"${d.status}\u0001${d.batchId}"))
      }
    }

    /** Periodic CDC check snapshot: `miss.log` / `diff.log` under
      * check_log_dir, each capped at check_log_max_rows keeping the
      * LATEST records (config.md snapshot rules).
      */
    def snapshot(): Unit = {
      // check_log_dir is a task path — Hadoop FS so s3a/hdfs work
      graft.infra.Fs.mkdirs(cfg.checkLogDir)
      def dump(status: String, file: String): Unit = {
        val rows = defects.values.filter(_.status == status).toSeq
          .sortBy(_.batchId)
        val latest = rows.takeRight(cfg.checkLogMaxRows)
        val lines = latest.map(d =>
          s"""{"table":"${d.table}","key":"${d.key}",""" +
            s""""batch_id":${d.batchId}}""")
        graft.infra.Fs.writeString(s"${cfg.checkLogDir}/$file",
          lines.mkString("\n"))
      }
      dump("MISS", "miss.log")
      dump("DIFF", "diff.log")
    }
  }
}
