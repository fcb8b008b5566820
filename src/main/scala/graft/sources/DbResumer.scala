package graft.sources

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Position

/** Database-table resume recorder + recovery — the reference's
  * resumer (/root/reference/dt-connector/src/extractor/resumer/:
  * recorder/to_database.rs, recovery/from_database.rs, utils.rs).
  * Positions persist to a metadata table keyed
  * (task_id, resumer_type, position_key) with upsert-on-conflict, so a
  * restarted task on a fresh pod (no local disk) recovers exactly
  * where it stopped: finished tables skip, in-progress tables resume
  * past the recorded order key, CDC streams restart at the last
  * committed position. The file log ([[SnapshotResumer]]) stays as the
  * second recovery source; [[DbResumer.Dual]] records to both and
  * recovers from the table first.
  *
  * Scale shape: recording is one driver-side upsert per chunk/commit
  * (bounded by chunk count, not rows); recovery is one driver-side
  * scan of the task's rows at startup. Nothing executor-side.
  */
object DbResumer {

  /** Reference ResumerType spellings (resumer/mod.rs:47-66). */
  val SnapshotDoing = "SnapshotDoing"
  val SnapshotFinished = "SnapshotFinished"
  val CdcDoing = "CdcDoing"
  val NotSupported = "NotSupported"

  val DefaultSchema = "apecloud_metadata"
  val DefaultTable = "apedts_task_position"
  val DefaultPositionKey = "default_key"

  def resumerType(p: Position): String = p match {
    case _: Position.RdbSnapshot => SnapshotDoing
    case _: Position.RdbSnapshotFinished => SnapshotFinished
    case _: Position.MysqlCdc | _: Position.PgCdc |
        _: Position.MongoCdc | _: Position.RedisCdc |
        _: Position.Kafka => CdcDoing
  }

  /** utils.rs get_key_from_position: snapshot rows key per table,
    * kafka per (topic, partition); single-stream CDC shares one key.
    */
  def positionKey(p: Position): String = p match {
    case Position.RdbSnapshot(s, t, _) => s"$s-$t"
    case Position.RdbSnapshotFinished(s, t) => s"$s-$t"
    case Position.Kafka(topic, part, _) => s"$topic-$part"
    case _ => DefaultPositionKey
  }

  /** position_data — a self-describing JSON line (the reference
    * serializes Position to JSON via serde; round-trips through
    * [[parsePosition]]).
    */
  def renderPosition(p: Position): String = {
    def esc(s: String) =
      s.replace("\\", "\\\\").replace("\"", "\\\"")
    p match {
      case Position.RdbSnapshot(s, t, k) =>
        s"""{"type":"RdbSnapshot","schema":"${esc(s)}","tb":"${esc(t)}","order_key":"${esc(k)}"}"""
      case Position.RdbSnapshotFinished(s, t) =>
        s"""{"type":"RdbSnapshotFinished","schema":"${esc(s)}","tb":"${esc(t)}"}"""
      case Position.MysqlCdc(f, pos, gtid) =>
        s"""{"type":"MysqlCdc","binlog_filename":"${esc(f)}","next_event_position":$pos,"gtid_set":"${esc(gtid)}"}"""
      case Position.PgCdc(lsn) =>
        s"""{"type":"PgCdc","lsn":"${esc(lsn)}"}"""
      case Position.MongoCdc(tok) =>
        s"""{"type":"MongoCdc","resume_token":"${esc(tok)}"}"""
      case Position.RedisCdc(id, off) =>
        s"""{"type":"Redis","repl_id":"${esc(id)}","repl_offset":$off}"""
      case Position.Kafka(topic, part, off) =>
        s"""{"type":"Kafka","topic":"${esc(topic)}","partition":$part,"offset":$off}"""
    }
  }

  def parsePosition(json: String): Option[Position] = {
    val node =
      try new com.fasterxml.jackson.databind.ObjectMapper().readTree(json)
      catch { case _: Exception => return None }
    def s(f: String) = Option(node.get(f)).map(_.asText()).getOrElse("")
    def l(f: String) = Option(node.get(f)).map(_.asLong()).getOrElse(0L)
    Option(node.get("type")).map(_.asText()).collect {
      case "RdbSnapshot" =>
        Position.RdbSnapshot(s("schema"), s("tb"), s("order_key"))
      case "RdbSnapshotFinished" =>
        Position.RdbSnapshotFinished(s("schema"), s("tb"))
      case "MysqlCdc" => Position.MysqlCdc(s("binlog_filename"),
        l("next_event_position"), s("gtid_set"))
      case "PgCdc" => Position.PgCdc(s("lsn"))
      case "MongoCdc" => Position.MongoCdc(s("resume_token"))
      case "Redis" => Position.RedisCdc(s("repl_id"), l("repl_offset"))
      case "Kafka" =>
        Position.Kafka(s("topic"), l("partition").toInt, l("offset"))
    }
  }

  /** The position store connection — same seam as the sink appliers:
    * SQL synthesis is pinned here, transport is pluggable (JDBC in
    * production, an in-memory table in specs).
    */
  trait SqlExec {
    def execute(sql: String, binds: Seq[String]): Unit
    /** Rows for a SELECT; each row is the projected column values. */
    def query(sql: String, binds: Seq[String]): Seq[Seq[String]]
  }

  sealed trait Dialect { def name: String }
  case object MySqlDialect extends Dialect { val name = "mysql" }
  case object PgDialect extends Dialect { val name = "pg" }

  /** recorder/to_database.rs — creates the metadata namespace + table
    * (exact reference shapes) and upserts one row per position key.
    */
  final class Recorder(taskId: String, exec: SqlExec, dialect: Dialect,
      schema: String = DefaultSchema, table: String = DefaultTable) {

    /** initialization(): ensure namespace + table; `isInit` wipes the
      * task's previous rows (a NEW task run, not a resume).
      */
    def init(isInit: Boolean): Unit = {
      dialect match {
        case MySqlDialect =>
          exec.execute(s"CREATE DATABASE IF NOT EXISTS `$schema`", Nil)
          exec.execute(
            s"""CREATE TABLE IF NOT EXISTS `$schema`.`$table` (
               |  id bigint AUTO_INCREMENT PRIMARY KEY,
               |  task_id varchar(255) NOT NULL,
               |  resumer_type varchar(255) NOT NULL,
               |  position_key varchar(255) NOT NULL,
               |  position_data text,
               |  created_at timestamp DEFAULT CURRENT_TIMESTAMP,
               |  updated_at timestamp DEFAULT CURRENT_TIMESTAMP ON UPDATE CURRENT_TIMESTAMP,
               |  UNIQUE KEY `uk_task_id_task_type_position_key` (task_id, resumer_type, position_key)
               |)""".stripMargin, Nil)
          if (isInit)
            exec.execute(
              s"DELETE FROM `$schema`.`$table` WHERE task_id = ?",
              Seq(taskId))
        case PgDialect =>
          exec.execute(s"CREATE SCHEMA IF NOT EXISTS $schema", Nil)
          exec.execute(
            s"""CREATE TABLE IF NOT EXISTS $schema.$table (
               |  id bigserial PRIMARY KEY,
               |  task_id varchar(255) NOT NULL,
               |  resumer_type varchar(100) NOT NULL,
               |  position_key varchar(255) NOT NULL,
               |  position_data text,
               |  created_at timestamp DEFAULT CURRENT_TIMESTAMP,
               |  updated_at timestamp DEFAULT CURRENT_TIMESTAMP,
               |  CONSTRAINT uk_task_id_task_type_position_key UNIQUE (task_id, resumer_type, position_key)
               |)""".stripMargin, Nil)
          // keep the id sequence ahead of restored rows
          // (pg_sync_id_sequence_sql)
          exec.execute(
            s"""SELECT setval(
               |  pg_get_serial_sequence('$schema.$table', 'id'),
               |  COALESCE((SELECT MAX(id) FROM $schema.$table), 1),
               |  COALESCE((SELECT MAX(id) FROM $schema.$table), 0) > 0
               |)""".stripMargin, Nil)
          if (isInit)
            exec.execute(
              s"DELETE FROM $schema.$table WHERE task_id = $$1",
              Seq(taskId))
      }
    }

    /** record_position(): upsert keyed (task_id, resumer_type,
      * position_key); unsupported kinds are skipped, not errors.
      */
    def recordPosition(p: Position): Unit = {
      val tpe = resumerType(p)
      val binds =
        Seq(taskId, tpe, positionKey(p), renderPosition(p))
      dialect match {
        case MySqlDialect =>
          exec.execute(
            s"""INSERT INTO `$schema`.`$table` (task_id, resumer_type, position_key, position_data)
               |VALUES (?, ?, ?, ?)
               |ON DUPLICATE KEY UPDATE
               |  position_data = VALUES(position_data),
               |  updated_at = CURRENT_TIMESTAMP""".stripMargin, binds)
        case PgDialect =>
          exec.execute(
            s"""INSERT INTO $schema.$table (task_id, resumer_type, position_key, position_data)
               |VALUES ($$1, $$2, $$3, $$4)
               |ON CONFLICT (task_id, resumer_type, position_key)
               |DO UPDATE SET
               |  position_data = EXCLUDED.position_data,
               |  updated_at = CURRENT_TIMESTAMP""".stripMargin, binds)
      }
    }
  }

  /** recovery/from_database.rs — one startup scan of the task's rows
    * into doing/finished caches, then O(1) lookups.
    */
  final class Recovery(taskId: String, exec: SqlExec,
      schema: String = DefaultSchema, table: String = DefaultTable) {

    private val doing = scala.collection.mutable.Map[String, String]()
    private val finished = scala.collection.mutable.Set[String]()

    // initialization(): a missing table/database reads as empty
    // (start from the beginning), any other failure propagates
    locally {
      val rows = exec.query(
        s"""SELECT resumer_type, position_key, position_data
           |FROM $schema.$table
           |WHERE task_id = ?""".stripMargin, Seq(taskId))
      rows.foreach {
        case Seq(tpe, key, data) => tpe match {
          case SnapshotDoing | CdcDoing => doing(key) = data
          case SnapshotFinished => finished += key: Unit
          case _ => () // unknown types skip, like the reference
        }
        case _ => ()
      }
    }

    def checkSnapshotFinished(schema: String, tb: String): Boolean =
      finished.contains(s"$schema-$tb")

    /** Only snapshot-kind positions resume a snapshot (a CDC row under
      * the same key must not).
      */
    def snapshotResumePosition(schema: String,
        tb: String): Option[Position] =
      doing.get(s"$schema-$tb").flatMap(parsePosition).filter {
        case _: Position.RdbSnapshot => true
        case _ => false
      }

    def cdcResumePosition: Option[Position] =
      doing.get(DefaultPositionKey).flatMap(parsePosition)

    /** All recoverable positions (multi-stream CDC: kafka partitions,
      * redis nodes).
      */
    def cdcResumePositions: Seq[Position] =
      doing.values.flatMap(parsePosition(_)).toSeq
  }

  /** position.log-shaped store: the same [[SqlExec]] seam as the
    * database table, persisted as TSV lines in a local file — the
    * reference's file recorder form (resumer/recorder/to_file.rs), so a
    * task without a metadata database still survives restarts. Loaded on
    * construction; every upsert rewrites the file (position sets are
    * tiny — one row per table plus one per CDC stream).
    */
  final class FileStore(path: String) extends SqlExec {
    private val p = java.nio.file.Paths.get(path)
    private val rows = scala.collection.mutable
      .LinkedHashMap[(String, String, String), String]()
    locally {
      if (java.nio.file.Files.exists(p))
        java.nio.file.Files.readAllLines(p).forEach { line =>
          line.split("\t", 4) match {
            case Array(t, tpe, k, data) => rows((t, tpe, k)) = data
            case _ => ()
          }
        }
    }
    private def flush(): Unit = {
      Option(p.getParent)
        .foreach(java.nio.file.Files.createDirectories(_): Unit)
      val text = rows.map { case ((t, tpe, k), d) =>
        s"$t\t$tpe\t$k\t$d"
      }.mkString("\n")
      java.nio.file.Files.writeString(p, text): Unit
    }
    def execute(sql: String, binds: Seq[String]): Unit =
      if (sql.startsWith("INSERT INTO")) {
        val Seq(t, tpe, k, data) = binds
        rows((t, tpe, k)) = data
        flush()
      } else if (sql.startsWith("DELETE FROM")) {
        rows.filterInPlace { case ((t, _, _), _) => t != binds.head }
        flush()
      }
    def query(sql: String, binds: Seq[String]): Seq[Seq[String]] =
      rows.collect { case ((t, tpe, k), d) if t == binds.head =>
        Seq(tpe, k, d)
      }.toSeq
  }

  /** Dual recorder/recovery — reference behavior with BOTH sinks
    * configured: every position records to the database table AND the
    * file log; recovery prefers the table (survives pod restarts with
    * ephemeral disks) and falls back to the file log.
    */
  final class Dual(fileLog: SnapshotResumer, recorder: Recorder,
      recovery: () => Recovery) {

    private var recovered: Recovery = recovery()

    /** Re-read the table (a restart constructs a fresh Recovery). */
    def reload(): Unit = recovered = recovery()

    def record(schema: String, tb: String, orderKey: String): Unit = {
      fileLog.record(schema, tb, orderKey)
      recorder.recordPosition(
        Position.RdbSnapshot(schema, tb, orderKey))
    }

    def finish(schema: String, tb: String): Unit = {
      fileLog.finish(schema, tb)
      recorder.recordPosition(
        Position.RdbSnapshotFinished(schema, tb))
    }

    def recordCdc(p: Position): Unit = recorder.recordPosition(p)

    /** The recovered CDC stream position, if any (single-stream key). */
    def resumeCdc: Option[Position] = recovered.cdcResumePosition

    def isFinished(schema: String, tb: String): Boolean =
      recovered.checkSnapshotFinished(schema, tb) ||
        fileLog.isFinished(schema, tb)

    def resumeValue(schema: String, tb: String): Option[String] =
      recovered.snapshotResumePosition(schema, tb)
        .map { case Position.RdbSnapshot(_, _, k) => k; case _ => "" }
        .orElse(fileLog.resumeValue(schema, tb))

    /** Apply resume state to a fresh scan: None = table finished (skip
      * it), Some(filtered) = only rows past the recovered watermark.
      */
    def resume(df: DataFrame, schema: String, tb: String,
        orderCol: Column): Option[DataFrame] =
      if (isFinished(schema, tb)) None
      else Some(resumeValue(schema, tb)
        .map(v => df.filter(orderCol > lit(v)))
        .getOrElse(df))
  }
}
