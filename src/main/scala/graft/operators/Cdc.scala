package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** CDC-shaped queries over the deterministic `events` table: the driver's
  * stand-in for a binlog stream (FIXTURES.md §4). `user_id` plays the row
  * key; event_type maps onto row kinds (signup→insert, error→delete,
  * else update); (ts, event_id) is the total event order.
  */
object Cdc {

  /** The synthesized change stream all queries below share. */
  def changes(spark: SparkSession, dir: String): DataFrame =
    Tables.events(spark, dir).withColumn("row_type",
      when(col("event_type") === "signup", "insert")
        .when(col("event_type") === "error", "delete")
        .otherwise("update"))

  private val rowTypeSql =
    """CASE WHEN event_type = 'signup' THEN 'insert'
      |     WHEN event_type = 'error' THEN 'delete'
      |     ELSE 'update' END""".stripMargin

  /** q10 — rdb_merge compaction: final state per user key. */
  def compactChanges(spark: SparkSession, dir: String): DataFrame =
    Compaction.compact(changes(spark, dir), Seq("user_id"),
        Seq("ts", "event_id"), col("row_type"))
      .select(col("user_id"), col(Compaction.ActionCol).as("action"),
        col("event_id").as("last_event_id"), col("value").as("last_value"))

  val compactChangesSql: String =
    s"""SELECT user_id,
       |  CASE WHEN event_type = 'error' THEN 'delete' ELSE 'upsert' END AS action,
       |  event_id AS last_event_id, value AS last_value
       |FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
       |        ORDER BY ts DESC, event_id DESC) AS rn FROM events)
       |WHERE rn = 1""".stripMargin

  /** q11 — event-type + time filter (reference rdb_filter do_events +
    * TimeFilter, SURVEY §2.2). Both predicates push to the parquet scan.
    */
  def eventTimeFilter(spark: SparkSession, dir: String): DataFrame =
    changes(spark, dir)
      .filter(col("row_type").isin("insert", "update"))
      .filter(col("ts") >= lit("2024-01-08 00:00:00") &&
        col("ts") < lit("2024-01-22 00:00:00"))
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("value"))

  val eventTimeFilterSql: String =
    s"""SELECT event_id, user_id, event_type, value
       |FROM events
       |WHERE ($rowTypeSql) IN ('insert', 'update')
       |  AND ts >= TIMESTAMP '2024-01-08 00:00:00'
       |  AND ts < TIMESTAMP '2024-01-22 00:00:00'""".stripMargin

  /** q12 — update splitting: update → delete(before)+insert(after) pair. */
  def splitUpdates(spark: SparkSession, dir: String): DataFrame =
    Compaction.splitUpdates(changes(spark, dir), col("row_type"))
      .select(col("event_id"), col("user_id"), col("_seq").as("seq"),
        col("_out_type").as("out_type"))

  val splitUpdatesSql: String =
    s"""WITH c AS (SELECT event_id, user_id, ($rowTypeSql) AS row_type FROM events)
       |SELECT event_id, user_id, 0 AS seq, 'delete' AS out_type
       |  FROM c WHERE row_type = 'update'
       |UNION ALL
       |SELECT event_id, user_id, 1 AS seq, 'insert' AS out_type
       |  FROM c WHERE row_type = 'update'
       |UNION ALL
       |SELECT event_id, user_id, 0 AS seq, row_type AS out_type
       |  FROM c WHERE row_type <> 'update'""".stripMargin

  /** q13 — sink partitioning (rdb_partitioner): arithmetic key-hash lane
    * assignment with NULL→serial-lane-0, plus per-lane batch stats.
    */
  def sinkPartitions(spark: SparkSession, dir: String): DataFrame =
    changes(spark, dir)
      .withColumn("lane", Compaction.sinkPartition(col("user_id"), 8))
      .groupBy(col("lane"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_keys"),
        min(col("event_id")).as("min_event"),
        max(col("event_id")).as("max_event"))

  val sinkPartitionsSql: String =
    """SELECT ((user_id * 2654435761) % 1000000007) % 8 AS lane,
      |  COUNT(*) AS n_events, COUNT(DISTINCT user_id) AS n_keys,
      |  MIN(event_id) AS min_event, MAX(event_id) AS max_event
      |FROM events GROUP BY 1""".stripMargin

  /** q55 — the user-script transform surface (the Lua-contract hook) in
    * its scale form: a runtime-supplied SQL-expression script over the
    * change envelope, compiled to pure Catalyst (no UDF, stays in
    * codegen). The script routes the table, derives a column, renames
    * one, and drops deletes — one of each statement kind.
    */
  def scriptTransform(spark: SparkSession, dir: String): DataFrame = {
    val envelope = changes(spark, dir).select(
      lit("app").as("schema"), lit("events").as("tb"), col("row_type"),
      map().cast("map<string,string>").as("before"),
      map(lit("event_id"), col("event_id").cast("string"),
        lit("user_id"), col("user_id").cast("string"),
        lit("value"), col("value").cast("string"),
        lit("event_type"), col("event_type")).as("after"))
    val script =
      """set tb = concat(tb, '_v2')
        |set after.value_cents = floor(cast(after.value as double) * 100)
        |rename after.event_type to kind
        |drop if row_type = 'delete'
        |""".stripMargin
    graft.transform.ScriptTransform.sqlScript(script)(envelope)
      .select(
        element_at(col("after"), "event_id").cast("long").as("event_id"),
        col("tb"), col("row_type"),
        element_at(col("after"), "kind").as("kind"),
        element_at(col("after"), "value_cents").cast("long")
          .as("value_cents"))
  }

  val scriptTransformSql: String =
    s"""SELECT event_id, 'events_v2' AS tb, ($rowTypeSql) AS row_type,
       |  event_type AS kind,
       |  CAST(floor(value * 100) AS BIGINT) AS value_cents
       |FROM events WHERE ($rowTypeSql) <> 'delete'""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q10_compact_changes" -> (compactChanges _),
    "q11_event_time_filter" -> (eventTimeFilter _),
    "q12_split_updates" -> (splitUpdates _),
    "q13_sink_partitions" -> (sinkPartitions _),
    "q55_script_transform" -> (scriptTransform _))

  val oracles: Map[String, String] = Map(
    "q10_compact_changes" -> compactChangesSql,
    "q11_event_time_filter" -> eventTimeFilterSql,
    "q12_split_updates" -> splitUpdatesSql,
    "q13_sink_partitions" -> sinkPartitionsSql,
    "q55_script_transform" -> scriptTransformSql)
}
