package graft.model

/** Row-change envelope — the engine-internal event model.
  *
  * Mirrors the reference's `RowData`/`DtItem` semantics
  * (/root/reference/dt-common/src/meta/row_data.rs:21-33,
  * dt-common/src/meta/dt_data.rs:13-17) re-expressed as a Spark-friendly
  * case class: schema-less per-event column maps so MongoDB docs and
  * DDL-evolving tables fit the same shape. Typed per-table pipelines should
  * instead carry native columns and use the DataFrame-level operators in
  * [[graft.operators.Compaction]].
  */
final case class ChangeEvent(
    schema: String,
    tb: String,
    chunkId: Long,
    rowType: String, // RowKind.Insert | Update | Delete
    before: Map[String, String],
    after: Map[String, String],
    positionKind: String,
    positionValue: String,
    originNode: String) {

  import RowKind._

  /** Invert the event: insert↔delete, update swaps images.
    * (reference: row_data.rs:77-94 `reverse`)
    */
  def reverse: ChangeEvent = rowType match {
    case Insert => copy(rowType = Delete, before = after, after = Map.empty)
    case Delete => copy(rowType = Insert, before = Map.empty, after = before)
    case Update => copy(before = after, after = before)
    case _ => this
  }

  /** Update → (delete(before), insert(after)) pair.
    * (reference: row_data.rs:96-115 `split_update_row_data`)
    */
  def splitUpdate: Seq[ChangeEvent] =
    if (rowType != Update) Seq(this)
    else Seq(
      copy(rowType = Delete, after = Map.empty),
      copy(rowType = Insert, before = Map.empty))

  /** The image that identifies the row: before for delete/update, after for
    * insert.
    */
  def keyImage: Map[String, String] =
    if (rowType == Insert) after else if (before.nonEmpty) before else after

  /** Row-identity hash over `idCols` values; 0 when any key col is NULL —
    * a zero hash marks the event unmergeable so batch delete-by-key never
    * silently drops NULL-keyed rows (reference: row_data.rs:254-286 and the
    * NULL-in-batch-delete hazard comment at row_data.rs:273-281).
    */
  def keyHash(idCols: Seq[String]): Long = {
    val img = keyImage
    var h = 1L
    idCols.foreach { c =>
      img.get(c) match {
        case Some(v) if v != null => h = 31 * h + v.hashCode.toLong
        case _ => return 0L
      }
    }
    h
  }
}

object RowKind {
  val Insert = "insert"
  val Update = "update"
  val Delete = "delete"
  /** Transform hooks drop a row by blanking its type (reference:
    * dt-pipeline/src/lua_processor.rs:37-41).
    */
  val Dropped = ""
}

/** Resume token — the engine-agnostic offset model (reference:
  * dt-common/src/meta/position.rs:14-63). Serialized into streaming
  * checkpoints / a snapshot progress table.
  */
sealed trait Position { def kind: String; def render: String }
object Position {
  final case class Kafka(topic: String, partition: Int, offset: Long)
      extends Position {
    val kind = "kafka"; def render = s"$topic/$partition/$offset"
  }
  final case class RdbSnapshot(schema: String, tb: String, orderKey: String)
      extends Position {
    val kind = "rdb_snapshot"; def render = s"$schema.$tb@$orderKey"
  }
  final case class RdbSnapshotFinished(schema: String, tb: String)
      extends Position {
    val kind = "rdb_snapshot_finished"; def render = s"$schema.$tb"
  }
  final case class MysqlCdc(binlogFile: String, pos: Long, gtidSet: String)
      extends Position {
    val kind = "mysql_cdc"; def render = s"$binlogFile:$pos gtid=$gtidSet"
  }
  final case class PgCdc(lsn: String) extends Position {
    val kind = "pg_cdc"; def render = lsn
  }
  final case class MongoCdc(resumeToken: String) extends Position {
    val kind = "mongo_cdc"; def render = resumeToken
  }
  /** Redis replication stream position (reference position.rs Redis:
    * replication id + byte offset from PSYNC).
    */
  final case class RedisCdc(replId: String, offset: Long)
      extends Position {
    val kind = "redis_cdc"; def render = s"$replId:$offset"
  }
}
