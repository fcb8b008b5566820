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

  /** q108 — the DDL statement lane as a distributed query: every
    * supplier row deterministically generates one DDL statement (10
    * shapes spanning the schema / database / table families incl. the
    * round-9 CREATE/DROP/ALTER SCHEMA + ALTER DATABASE variants and
    * the typed ALTER TABLE RENAME / SET SCHEMA forms), and
    * each parses, classifies (reference ddl_type.rs spellings),
    * targets, and re-renders on the executors. The generator is
    * invertible, so the DuckDB oracle states the expected
    * classification closed-form. Scale: map-only over the input —
    * parse state is per-row, nothing shuffles.
    */
  def ddlParse(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    import graft.meta.DdlParser
    val src = Tables.supplier(spark, dir)
      .select(col("s_suppkey").cast("long").as("stmt_id"),
        regexp_replace(lower(col("s_name")), "[^a-z0-9]+", "_")
          .as("nm"))
      .as[(Long, String)]
    src.map { case (id, nm) =>
      val sql = (id % 10) match {
        case 0 => s"CREATE SCHEMA IF NOT EXISTS s_$nm"
        case 1 => s"DROP SCHEMA s_$nm CASCADE"
        case 2 => s"ALTER SCHEMA s_$nm RENAME TO t_$nm"
        case 3 => s"ALTER DATABASE d_$nm READ ONLY = 1"
        case 4 => s"CREATE TABLE db_$nm.t_$id (id INT)"
        case 5 => s"DROP TABLE IF EXISTS db_$nm.t_$id"
        case 6 => s"TRUNCATE TABLE db_$nm.t_$id"
        case 7 => s"RENAME TABLE db_$nm.t_$id TO db_$nm.u_$id"
        // comment-riddled surface forms on purpose: the lane strips
        case 8 => s"alter /*c*/ table db_$nm.t_$id rename as v_$id"
        case _ => s"ALTER TABLE db_$nm.t_$id SET SCHEMA arch_$nm"
      }
      val stmt = DdlParser.parse(sql).head
      val (sc, tb) = DdlParser.target(stmt, "def")
      (id, DdlParser.ddlType(stmt), sc, tb, stmt.render)
    }.toDF("stmt_id", "ddl_type", "schema_name", "tb", "rendered")
  }

  val ddlParseSql: String =
    """WITH src AS (
      |  SELECT s_suppkey AS stmt_id,
      |    regexp_replace(lower(s_name), '[^a-z0-9]+', '_', 'g') AS nm
      |  FROM supplier)
      |SELECT stmt_id,
      |  CASE stmt_id % 10
      |    WHEN 0 THEN 'create_schema' WHEN 1 THEN 'drop_schema'
      |    WHEN 2 THEN 'alter_schema' WHEN 3 THEN 'alter_database'
      |    WHEN 4 THEN 'create_table' WHEN 5 THEN 'drop_table'
      |    WHEN 6 THEN 'truncate_table' WHEN 7 THEN 'rename_table'
      |    ELSE 'alter_table'
      |  END AS ddl_type,
      |  CASE WHEN stmt_id % 10 IN (0, 1, 2) THEN 's_' || nm
      |    WHEN stmt_id % 10 = 3 THEN 'd_' || nm
      |    ELSE 'db_' || nm END AS schema_name,
      |  CASE WHEN stmt_id % 10 IN (0, 1, 2, 3) THEN ''
      |    ELSE 't_' || stmt_id END AS tb,
      |  CASE stmt_id % 10
      |    WHEN 0 THEN 'CREATE SCHEMA IF NOT EXISTS `s_' || nm || '`'
      |    WHEN 1 THEN 'DROP SCHEMA `s_' || nm || '`'
      |    WHEN 2 THEN 'ALTER SCHEMA `s_' || nm
      |      || '` RENAME TO `t_' || nm || '`'
      |    WHEN 3 THEN 'ALTER DATABASE `d_' || nm || '` READ ONLY = 1'
      |    WHEN 4 THEN 'CREATE TABLE `db_' || nm || '`.`t_'
      |      || stmt_id || '` (id INT)'
      |    WHEN 5 THEN 'DROP TABLE IF EXISTS `db_' || nm || '`.`t_'
      |      || stmt_id || '`'
      |    WHEN 6 THEN 'TRUNCATE TABLE `db_' || nm || '`.`t_'
      |      || stmt_id || '`'
      |    WHEN 7 THEN 'RENAME TABLE `db_' || nm || '`.`t_' || stmt_id
      |      || '` TO `db_' || nm || '`.`u_' || stmt_id || '`'
      |    WHEN 8 THEN 'ALTER TABLE `db_' || nm || '`.`t_' || stmt_id
      |      || '` RENAME TO `v_' || stmt_id || '`'
      |    ELSE 'ALTER TABLE `db_' || nm || '`.`t_' || stmt_id
      |      || '` SET SCHEMA `arch_' || nm || '`'
      |  END AS rendered
      |FROM src""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q14_route_rename" -> (routeCustomer _),
    "q108_ddl_parse" -> (ddlParse _))

  val oracles: Map[String, String] = Map(
    "q14_route_rename" -> routeCustomerSql,
    "q108_ddl_parse" -> ddlParseSql)
}
