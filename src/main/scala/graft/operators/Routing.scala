package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Routing as a query: column-map rename + topic routing + sink-partition
  * assignment applied to the customer table (reference rdb_router semantics,
  * SURVEY §2.3).
  */
object Routing {

  val demoRouter: Router = Router(
    schemaMap = Map("app" -> "app_replica"),
    tbMap = Map(("app", "customer") -> ("app_replica", "clients")),
    colMap = Map(("app", "customer") -> Map(
      "c_custkey" -> "id",
      "c_name" -> "full_name",
      "c_acctbal" -> "balance")),
    topicMap = Map(("app", "customer") -> "cdc.app.clients"),
    defaultTopic = "cdc.default")

  /** q14 — route customer through the demo router: renamed columns, routed
    * address, topic, and an arithmetic kafka partition (key-hash, SQL-
    * replicable).
    */
  def routeCustomer(spark: SparkSession, dir: String): DataFrame = {
    val (schema, tb) = ("app", "customer")
    val (toSchema, toTb) = demoRouter.routeTable(schema, tb)
    val df = demoRouter.renameColumns(schema, tb,
      Tables.customer(spark, dir))
    df.select(col("id"), col("full_name"), col("balance"),
        col("c_mktsegment").as("segment"))
      .withColumn("dst_table", lit(s"$toSchema.$toTb"))
      .withColumn("topic", lit(demoRouter.routeTopic(schema, tb)))
      .withColumn("kafka_partition",
        Compaction.sinkPartition(col("id"), 16))
  }

  val routeCustomerSql: String =
    """SELECT c_custkey AS id, c_name AS full_name, c_acctbal AS balance,
      |  c_mktsegment AS segment,
      |  'app_replica.clients' AS dst_table,
      |  'cdc.app.clients' AS topic,
      |  ((c_custkey * 2654435761) % 1000000007) % 16 AS kafka_partition
      |FROM customer""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_route_rename" -> (routeCustomer _))

  val oracles: Map[String, String] = Map(
    "q14_route_rename" -> routeCustomerSql)
}
