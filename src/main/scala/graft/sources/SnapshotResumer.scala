package graft.sources

import java.nio.file.{Files, Path, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.Position

/** Snapshot resume bookkeeping — the reference's resumer
  * (/root/reference/dt-connector/src/extractor/resumer/: recorder +
  * recovery, positions keyed per (schema, tb)): records the max extracted
  * order-key per table; a restarted task filters `order_col > recorded`
  * and skips tables already finished.
  *
  * Store format: one JSON line per update in a per-table file (append-only
  * like position.log; last line wins). In production the same interface
  * backs a database table; streaming paths use Spark checkpoints instead.
  */
final class SnapshotResumer(dir: String) {

  private def tableFile(schema: String, tb: String): Path =
    Paths.get(dir, s"$schema.$tb.progress")

  Files.createDirectories(Paths.get(dir))

  /** Record progress: the greatest order-key value fully extracted. */
  def record(schema: String, tb: String, orderKey: String): Unit = {
    val p = Position.RdbSnapshot(schema, tb, orderKey)
    Files.writeString(tableFile(schema, tb),
      s"""{"kind":"${p.kind}","value":"$orderKey"}\n""",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)
  }

  /** Mark a table complete (RdbSnapshotFinished). */
  def finish(schema: String, tb: String): Unit =
    Files.writeString(tableFile(schema, tb),
      s"""{"kind":"rdb_snapshot_finished","value":""}\n""",
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND)

  private def lastLine(schema: String, tb: String): Option[String] = {
    val f = tableFile(schema, tb)
    if (!Files.exists(f)) None
    else Files.readAllLines(f).asScala.lastOption
  }

  def isFinished(schema: String, tb: String): Boolean =
    lastLine(schema, tb).exists(_.contains("rdb_snapshot_finished"))

  /** The recorded resume value, if any. */
  def resumeValue(schema: String, tb: String): Option[String] =
    lastLine(schema, tb).filterNot(_.contains("finished")).flatMap { l =>
      """"value":"([^"]*)"""".r.findFirstMatchIn(l).map(_.group(1))
    }

  /** Apply resume state to a fresh scan: skip finished tables entirely,
    * filter past-extracted rows otherwise.
    */
  def resume(df: DataFrame, schema: String, tb: String,
      orderCol: Column): Option[DataFrame] =
    if (isFinished(schema, tb)) None
    else Some(resumeValue(schema, tb)
      .map(v => df.filter(orderCol > lit(v))) // literal coerces to col type
      .getOrElse(df))
}
