package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables
import graft.sinks.KafkaEnvelope

/** Second relational batch: semi/anti joins, rollup grouping sets,
  * distinct aggregation, having, set operators, and the Kafka envelope
  * round-trip — completing the query surface a replication+analytics user
  * expects (SURVEY §2.9: Spark provides these natively; we prove parity).
  */
object Relational2 {

  /** q06 — semi/anti joins: per market segment, customers with vs
    * without orders. Both sides are one shuffle-free broadcast pass at
    * dim scale; at fact scale they become shuffled hash joins.
    */
  def semiAnti(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val o = Tables.orders(spark, dir).select(col("o_custkey"))
    val withO = c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_with_orders"))
    val withoutO = c.join(o, c("c_custkey") === o("o_custkey"),
        "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n_without"))
    withO.join(withoutO, Seq("c_mktsegment"), "full_outer")
      .select(col("c_mktsegment"),
        coalesce(col("n_with_orders"), lit(0L)).as("n_with_orders"),
        coalesce(col("n_without"), lit(0L)).as("n_without"))
  }

  val semiAntiSql: String =
    """WITH w AS (SELECT c_mktsegment, COUNT(*) AS n_with_orders
      |  FROM customer WHERE EXISTS
      |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY 1),
      |wo AS (SELECT c_mktsegment, COUNT(*) AS n_without
      |  FROM customer WHERE NOT EXISTS
      |    (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |  GROUP BY 1)
      |SELECT c_mktsegment,
      |  COALESCE(n_with_orders, 0) AS n_with_orders,
      |  COALESCE(n_without, 0) AS n_without
      |FROM w FULL OUTER JOIN wo USING (c_mktsegment)""".stripMargin

  /** q07 — rollup grouping sets with grouping_id: subtotal rows carry the
    * standard bitmask, NULL group keys coalesced to 'ALL' for stable
    * compare.
    */
  def rollupSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.rollup(col("l_returnflag"), col("l_linestatus"))
      .agg(count(lit(1)).as("n"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("sum_qty"),
        grouping_id().as("gid"))
      .select(coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("n"), col("sum_qty"), col("gid"))
  }

  val rollupSummarySql: String =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |  COALESCE(l_linestatus, 'ALL') AS ls,
      |  COUNT(*) AS n,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  GROUPING(l_returnflag, l_linestatus) AS gid
      |FROM lineitem
      |GROUP BY ROLLUP (l_returnflag, l_linestatus)""".stripMargin

  /** q08 — distinct aggregation + HAVING: suppliers per part among
    * high-volume parts.
    */
  def distinctAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Tables.lineitem(spark, dir)
    li.groupBy(col("l_partkey"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"),
        count(lit(1)).as("n_lines"),
        sum(col("l_quantity").cast(DecimalType(18, 4))).cast(DoubleType)
          .as("qty"))
      .filter(col("n_lines") >= 20)
  }

  val distinctAggSql: String =
    """SELECT l_partkey, COUNT(DISTINCT l_suppkey) AS n_supp,
      |  COUNT(*) AS n_lines,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS qty
      |FROM lineitem GROUP BY 1 HAVING COUNT(*) >= 20""".stripMargin

  /** q09 — set operators: BUILDING∪AUTOMOBILE segments minus negative
    * balances (EXCEPT is distinct-set semantics in both engines).
    */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables.customer(spark, dir)
    val a = c.filter(col("c_mktsegment") === "BUILDING")
      .select(col("c_custkey"), col("c_name"))
    val b = c.filter(col("c_mktsegment") === "AUTOMOBILE")
      .select(col("c_custkey"), col("c_name"))
    val neg = c.filter(col("c_acctbal") < 0)
      .select(col("c_custkey"), col("c_name"))
    a.union(b).except(neg)
  }

  val setOpsSql: String =
    """SELECT c_custkey, c_name FROM customer
      |  WHERE c_mktsegment = 'BUILDING'
      |UNION
      |SELECT c_custkey, c_name FROM customer
      |  WHERE c_mktsegment = 'AUTOMOBILE'
      |EXCEPT
      |SELECT c_custkey, c_name FROM customer WHERE c_acctbal < 0""".stripMargin

  /** q16 — Kafka envelope round-trip: wrap the change stream as
    * key/value JSON messages, parse them back, prove fidelity. The
    * oracle sees only the recovered fields, so the JSON encoding itself
    * is exercised without cross-engine JSON-formatting hazards.
    */
  def kafkaRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    // the envelope codec is per-row UDF work over a single-file scan:
    // fan out so encode+decode runs at full parallelism (no-op at
    // cluster scale — Tables.fanout)
    val changes = graft.Tables.fanout(spark, Cdc.changes(spark, dir))
    val wrapped = KafkaEnvelope.wrap(changes, "app", "events",
      "cdc.app.events", col("event_id"), col("row_type"),
      beforeCols = Nil,
      afterCols = Seq("event_id", "user_id", "value"))
    KafkaEnvelope.unwrap(wrapped)
      .select(col("key").cast(LongType).as("event_id"),
        col("schema"), col("tb"), col("row_type"),
        element_at(col("after"), "user_id").cast(LongType)
          .as("user_id"))
  }

  val kafkaRoundTripSql: String =
    """SELECT event_id, 'app' AS schema, 'events' AS tb,
      |  CASE WHEN event_type = 'signup' THEN 'insert'
      |       WHEN event_type = 'error' THEN 'delete'
      |       ELSE 'update' END AS row_type,
      |  user_id
      |FROM events""".stripMargin

  /** q52 — the q16 twin through the reference's real wire format: Avro
    * binary with the fixed envelope schema (avro_converter_schema.rs),
    * encoded and decoded by avro-core datum writer/readers. Fidelity of
    * the payload AND the sorted field-descriptor array is proven by
    * recovering both from the bytes.
    */
  def avroRoundTrip(spark: SparkSession, dir: String): DataFrame = {
    val changes = graft.Tables.fanout(spark, Cdc.changes(spark, dir))
    val wrapped = graft.sinks.AvroEnvelope.wrap(changes, "app", "events",
      "cdc.app.events", col("event_id"), col("row_type"),
      beforeCols = Nil,
      afterCols = Seq("event_id", "user_id", "value"))
    graft.sinks.AvroEnvelope.unwrap(wrapped)
      .select(col("key").cast(LongType).as("event_id"),
        col("schema"), col("tb"), col("row_type"),
        element_at(col("after"), "user_id").cast(LongType)
          .as("user_id"),
        array_join(col("field_names"), ",").as("fields_csv"))
  }

  val avroRoundTripSql: String =
    """SELECT event_id, 'app' AS schema, 'events' AS tb,
      |  CASE WHEN event_type = 'signup' THEN 'insert'
      |       WHEN event_type = 'error' THEN 'delete'
      |       ELSE 'update' END AS row_type,
      |  user_id, 'event_id,user_id,value' AS fields_csv
      |FROM events""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q06_semi_anti" -> (semiAnti _),
    "q07_rollup" -> (rollupSummary _),
    "q08_distinct_agg" -> (distinctAgg _),
    "q09_set_ops" -> (setOps _),
    "q16_kafka_roundtrip" -> (kafkaRoundTrip _),
    "q52_avro_roundtrip" -> (avroRoundTrip _))

  val oracles: Map[String, String] = Map(
    "q06_semi_anti" -> semiAntiSql,
    "q07_rollup" -> rollupSummarySql,
    "q08_distinct_agg" -> distinctAggSql,
    "q09_set_ops" -> setOpsSql,
    "q16_kafka_roundtrip" -> kafkaRoundTripSql,
    "q52_avro_roundtrip" -> avroRoundTripSql)
}
