package graft.transport

import graft.infra.Fs

/** Durable pump resume positions, one tiny key=value file per task dir
  * — the live-lane analogue of the reference's Position records
  * (dt-meta/src/position.rs: Position::MysqlCdc file/pos/gtid_set,
  * Position::RedisPsync repl_id/repl_offset, Position::MongoCdc resume
  * token). A supervised restart (TaskManager.superviseStart / watch)
  * constructs its pump from THESE values, not the task.ini start
  * position — without this every restart re-dumped from the configured
  * start: a full Redis resync, a Mongo re-watch from now, a MySQL
  * re-dump of already-published binlog ranges.
  *
  * PG is deliberately absent: its resume position lives server-side in
  * the replication slot's confirmed_flush_lsn, which the pump re-reads
  * on every connect (the ack protocol only advances it past PUBLISHED
  * segments, so the slot IS the durable position).
  */
object PumpPositions {

  def path(taskDir: String): String = s"$taskDir/pump.position"

  def read(taskDir: String): Map[String, String] = {
    val p = path(taskDir)
    if (!Fs.exists(p)) Map.empty
    else Fs.readLines(p).filter(_.contains("="))
      .map { l => val Array(k, v) = l.split("=", 2); k -> v }.toMap
  }

  /** Overwrite-on-advance: the file is a handful of bytes, and a torn
    * write is self-healing (an unparseable file reads as empty → the
    * pump falls back to the configured start; capture names are
    * monotone so the re-pumped range lands under NEW names and the
    * name-based checkpoint drops the duplicates).
    */
  def write(taskDir: String, kv: Map[String, String]): Unit =
    Fs.writeString(path(taskDir), kv.toSeq.sortBy(_._1)
      .map { case (k, v) => s"$k=$v" }.mkString("", "\n", "\n"))
}
