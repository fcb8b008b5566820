package graft

import org.apache.spark.sql.functions._

import graft.model.Position
import graft.sources.{DbResumer, SnapshotChunker, SnapshotResumer}
import graft.sources.DbResumer._

/** Database-table resume recorder + dual recovery
  * (resumer/recorder/to_database.rs + recovery/from_database.rs):
  * SQL shapes pinned, then a mid-snapshot kill recovered from the
  * table with only unfinished chunks re-extracted.
  */
class DbResumerSpec extends SparkSuite {

  /** In-memory position store honoring the upsert key semantics —
    * the spec's stand-in for the JDBC pool.
    */
  final class MemStore extends SqlExec {
    val executed = scala.collection.mutable.ArrayBuffer[String]()
    // (task_id, resumer_type, position_key) -> position_data
    val rows = scala.collection.mutable
      .LinkedHashMap[(String, String, String), String]()

    def execute(sql: String, binds: Seq[String]): Unit = {
      executed += sql
      if (sql.startsWith("INSERT INTO")) {
        val Seq(task, tpe, key, data) = binds
        rows.update((task, tpe, key), data)
      } else if (sql.startsWith("DELETE FROM")) {
        val task = binds.head
        rows.filterInPlace { case ((t, _, _), _) => t != task }: Unit
      }
    }

    def query(sql: String, binds: Seq[String]): Seq[Seq[String]] = {
      val task = binds.head
      rows.collect { case ((t, tpe, key), data) if t == task =>
        Seq(tpe, key, data)
      }.toSeq
    }
  }

  test("recorder SQL shapes: create/upsert per dialect " +
      "(to_database.rs verbatim)") {
    val store = new MemStore
    val rec = new Recorder("t1", store, MySqlDialect)
    rec.init(isInit = true)
    assert(store.executed.head ==
      "CREATE DATABASE IF NOT EXISTS `apecloud_metadata`")
    assert(store.executed(1).contains(
      "CREATE TABLE IF NOT EXISTS `apecloud_metadata`.`apedts_task_position`"))
    assert(store.executed(1).contains("UNIQUE KEY " +
      "`uk_task_id_task_type_position_key` " +
      "(task_id, resumer_type, position_key)"))
    assert(store.executed(2) ==
      "DELETE FROM `apecloud_metadata`.`apedts_task_position` WHERE task_id = ?")
    rec.recordPosition(Position.RdbSnapshot("app", "orders", "750"))
    assert(store.executed(3).contains("ON DUPLICATE KEY UPDATE"))

    val pgStore = new MemStore
    val pgRec = new Recorder("t1", pgStore, PgDialect,
      schema = "meta", table = "pos")
    pgRec.init(isInit = false)
    assert(pgStore.executed.head == "CREATE SCHEMA IF NOT EXISTS meta")
    assert(pgStore.executed(1).contains(
      "CREATE TABLE IF NOT EXISTS meta.pos"))
    assert(pgStore.executed(1).contains("CONSTRAINT " +
      "uk_task_id_task_type_position_key UNIQUE " +
      "(task_id, resumer_type, position_key)"))
    // id sequence re-sync (pg_sync_id_sequence_sql)
    assert(pgStore.executed(2).contains("pg_get_serial_sequence"))
    pgRec.recordPosition(Position.PgCdc("0/16B3748"))
    assert(pgStore.executed(3).contains(
      "ON CONFLICT (task_id, resumer_type, position_key)"))
  }

  test("position render/parse round-trips every kind; keys follow " +
      "get_key_from_position") {
    val ps: Seq[Position] = Seq(
      Position.RdbSnapshot("s", "t", "123"),
      Position.RdbSnapshotFinished("s", "t"),
      Position.MysqlCdc("binlog.000002", 4521L, "uuid:1-9"),
      Position.PgCdc("0/16B3748"),
      Position.MongoCdc("""{"_data":"8264"}"""),
      Position.RedisCdc("b2c3", 9912L),
      Position.Kafka("cdc.app", 3, 777L))
    ps.foreach { p =>
      assert(parsePosition(renderPosition(p)).contains(p), p.toString)
    }
    assert(positionKey(Position.RdbSnapshot("s", "t", "1")) == "s-t")
    assert(positionKey(Position.Kafka("cdc.app", 3, 1)) == "cdc.app-3")
    assert(positionKey(Position.PgCdc("0/1")) == "default_key")
    assert(resumerType(Position.RdbSnapshot("s", "t", "1")) ==
      "SnapshotDoing")
    assert(resumerType(Position.RdbSnapshotFinished("s", "t")) ==
      "SnapshotFinished")
    assert(resumerType(Position.MongoCdc("x")) == "CdcDoing")
    assert(parsePosition("not json").isEmpty)
    assert(parsePosition("""{"type":"Mystery"}""").isEmpty)
  }

  test("kill mid-snapshot → recover from the table → only " +
      "unfinished chunks re-extract") {
    val store = new MemStore
    val rec = new Recorder("task9", store, MySqlDialect)
    rec.init(isInit = true)

    val orders = Tables.orders(spark, sf).cache()
    val total = orders.count()
    val stats = SnapshotChunker.stats(orders, "o_orderkey")
    val plan = SnapshotChunker.plan(stats, batchSize = total / 4)
    assert(plan.nChunks >= 4)

    // run 1: extract chunk-by-chunk, record after each; die after 2
    val firstTwo = plan.ranges.take(2)
    var run1Rows = 0L
    firstTwo.foreach { case (lo, hi) =>
      run1Rows += orders
        .filter(col("o_orderkey") >= lo && col("o_orderkey") < hi)
        .count()
      rec.recordPosition(
        Position.RdbSnapshot("app", "orders", (hi - 1).toString))
    }
    // nation finished completely in run 1
    rec.recordPosition(Position.RdbSnapshot("app", "nation", "24"))
    rec.recordPosition(Position.RdbSnapshotFinished("app", "nation"))

    // ---- crash. restart: fresh recovery over the same table ----
    val rcv = new Recovery("task9", store)
    assert(rcv.checkSnapshotFinished("app", "nation"))
    assert(!rcv.checkSnapshotFinished("app", "orders"))
    val resumePos = rcv.snapshotResumePosition("app", "orders")
    val watermark = firstTwo.last._2 - 1
    assert(resumePos.contains(
      Position.RdbSnapshot("app", "orders", watermark.toString)))

    // run 2 re-extracts ONLY rows past the watermark — no chunk-1/2
    // row repeats, and the union is exactly the full table
    val remaining = orders
      .filter(col("o_orderkey") > lit(watermark.toString)
        .cast("long"))
    assert(run1Rows + remaining.count() == total)
    // a different task's rows are invisible
    assert(new Recovery("other", store)
      .snapshotResumePosition("app", "orders").isEmpty)
    orders.unpersist(): Unit
  }

  test("CDC position recovery: single stream + multi-partition") {
    val store = new MemStore
    val rec = new Recorder("cdc1", store, PgDialect)
    rec.init(isInit = true)
    rec.recordPosition(Position.PgCdc("0/AAA"))
    rec.recordPosition(Position.PgCdc("0/BBB")) // upsert: last wins
    rec.recordPosition(Position.Kafka("cdc.app", 0, 10L))
    rec.recordPosition(Position.Kafka("cdc.app", 1, 20L))

    val rcv = new Recovery("cdc1", store)
    assert(rcv.cdcResumePosition.contains(Position.PgCdc("0/BBB")))
    assert(rcv.cdcResumePositions.toSet == Set(
      Position.PgCdc("0/BBB"),
      Position.Kafka("cdc.app", 0, 10L),
      Position.Kafka("cdc.app", 1, 20L)))
  }

  test("dual recovery: table first, file log fallback, records to " +
      "both") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-dual").toString
    val store = new MemStore
    val fileLog = new SnapshotResumer(dir)
    val rec = new Recorder("t1", store, MySqlDialect)
    rec.init(isInit = true)
    val dual = new Dual(fileLog, rec, () => new Recovery("t1", store))

    val orders = Tables.orders(spark, sf)
    dual.record("app", "orders", "750")
    dual.reload()
    // recorded in BOTH stores
    assert(fileLog.resumeValue("app", "orders").contains("750"))
    assert(store.rows.contains(("t1", "SnapshotDoing", "app-orders")))
    assert(dual.resumeValue("app", "orders").contains("750"))
    val resumed = dual.resume(orders, "app", "orders",
      col("o_orderkey")).get
    assert(resumed.count() ==
      orders.filter(col("o_orderkey") > 750).count())

    // table wiped (fresh metadata db) → file log still recovers
    store.rows.clear()
    dual.reload()
    assert(dual.resumeValue("app", "orders").contains("750"))

    // finish marks both; resume skips the table entirely
    dual.finish("app", "orders")
    dual.reload()
    assert(dual.isFinished("app", "orders"))
    assert(dual.resume(orders, "app", "orders",
      col("o_orderkey")).isEmpty)
    // file log alone also answers finished when the table is gone
    store.rows.clear()
    dual.reload()
    assert(dual.isFinished("app", "orders"))
  }
}
