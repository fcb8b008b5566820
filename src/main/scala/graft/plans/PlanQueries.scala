package graft.plans

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.operators.AdvancedOps

/** Oracle-checked queries exercising the custom plan nodes. */
object PlanQueries {

  /** q80 — the q70 as-of join through the native [[AsOfJoinExec]]
    * operator instead of the union+window composition; same DuckDB ASOF
    * oracle, so the custom physical operator is hash-checked row-for-row
    * against an independent engine.
    */
  def purchaseAsofClickNative(spark: SparkSession,
      dir: String): DataFrame = {
    val ev = Tables.events(spark, dir)
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("user_id"), col("ts"),
        col("event_id").as("click_id"), col("value").as("click_value"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts"), col("event_id"), col("value"))
    GraftPlans.asofJoin(purchases, clicks, "user_id", "ts",
        Seq("click_id", "click_value"))
      .filter(col("click_id").isNotNull)
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("click_id"), col("click_value"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q80_asof_native" -> (purchaseAsofClickNative _))

  val oracles: Map[String, String] = Map(
    "q80_asof_native" -> AdvancedOps.purchaseAsofClickSql)
}
