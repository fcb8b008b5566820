package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Two-way sync cycle prevention — the reference's data marker
  * (/root/reference/dt-connector/src/data_marker.rs,
  * base_extractor.rs:100-127, mysql_sinker.rs:365-389): every transaction
  * a node applies starts with a marker row naming the origin node; the
  * extractor on the other side reads the marker and drops events whose
  * origin is itself, breaking the replication loop.
  *
  * Spark shape: an `originNode` column on the change stream; the filter is
  * a plain predicate (pushes to the source); the marker write belongs in
  * the applier's transaction (same-txn INSERT before the batch).
  */
object DataMarker {

  final case class Marker(topo: String, srcNode: String, dstNode: String) {
    /** The marker row the sinker writes in-transaction: identifies this
      * node as origin so the peer's extractor can drop the echo.
      */
    def markerInsertSql(markerTable: String): String =
      s"INSERT INTO $markerTable (topo, src_node, dst_node, data_origin_node)" +
        s" VALUES ('$topo', '$srcNode', '$dstNode', '$srcNode')"
  }

  /** Keep only events that did not originate from `selfNode` (events with
    * no recorded origin pass — they are locally produced).
    */
  def cycleFilter(df: DataFrame, originCol: Column,
      selfNode: String): DataFrame =
    df.filter(originCol.isNull || originCol =!= selfNode)

  /** The full reference admission rule (data_marker.rs:118-121
    * `refresh`): an event is DROPPED when its origin is in
    * `ignoreNodes`, or `doNodes` is configured and does not contain
    * it. Origin-less events are locally produced and always pass.
    */
  def admits(originCol: Column, doNodes: Seq[String],
      ignoreNodes: Seq[String]): Column = {
    val notIgnored =
      if (ignoreNodes.isEmpty) lit(true)
      else !originCol.isin(ignoreNodes: _*)
    val inDo =
      if (doNodes.isEmpty) lit(true)
      else originCol.isin(doNodes: _*)
    originCol.isNull || (notIgnored && inDo)
  }

  /** [data_marker] do_nodes / ignore_nodes over a change stream with a
    * tracked origin column — the two-way (and N-way) topology gate.
    */
  def nodeFilter(df: DataFrame, originCol: Column,
      doNodes: Seq[String], ignoreNodes: Seq[String]): DataFrame =
    df.filter(admits(originCol, doNodes, ignoreNodes))

  /** q15 — cycle filtering on the change stream with a synthesized origin
    * topology (user_id mod 3 → node): a node_a extractor must drop
    * node_a-origin events and keep the rest.
    */
  def cycleFilterQuery(spark: SparkSession, dir: String): DataFrame = {
    val withOrigin = Cdc.changes(spark, dir)
      .withColumn("origin_node",
        when(pmod(col("user_id"), lit(3)) === 0, "node_a")
          .when(pmod(col("user_id"), lit(3)) === 1, "node_b")
          .otherwise("node_c"))
    cycleFilter(withOrigin, col("origin_node"), "node_a")
      .groupBy(col("origin_node"), col("row_type"))
      .agg(count(lit(1)).as("n"),
        min(col("event_id")).as("min_event"))
  }

  val cycleFilterQuerySql: String =
    """WITH c AS (SELECT event_id,
      |    CASE WHEN event_type = 'signup' THEN 'insert'
      |         WHEN event_type = 'error' THEN 'delete'
      |         ELSE 'update' END AS row_type,
      |    CASE WHEN user_id % 3 = 0 THEN 'node_a'
      |         WHEN user_id % 3 = 1 THEN 'node_b'
      |         ELSE 'node_c' END AS origin_node
      |  FROM events)
      |SELECT origin_node, row_type, COUNT(*) AS n,
      |  MIN(event_id) AS min_event
      |FROM c WHERE origin_node <> 'node_a'
      |GROUP BY 1, 2""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q15_cycle_filter" -> (cycleFilterQuery _))

  val oracles: Map[String, String] = Map(
    "q15_cycle_filter" -> cycleFilterQuerySql)
}
