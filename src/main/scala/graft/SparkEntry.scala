package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * Each operator family contributes a `queries` map (Spark DataFrame
  * implementation) and an `oracles` map (equivalent ANSI SQL the driver runs
  * in DuckDB over the same parquet tables). Column names are aliased
  * identically on both sides — the driver sorts columns by name before
  * hashing values.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * A composite of the engine's two halves: revenue per region (broadcast
    * dimension joins + exact-decimal aggregation) cross-joined with the
    * compacted change-stream summary (CDC key-dedup to final state).
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    val sf = "/root/testdata/sf0.001"
    val revenue = Relational.regionRevenue(spark, sf)
    val compacted = Cdc.compactChanges(spark, sf)
      .agg(count(lit(1)).as("live_keys"),
        sum(when(col("action") === "delete", 1).otherwise(0))
          .as("deleted_keys"))
    revenue.crossJoin(compacted)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cdc.queries ++ Routing.queries ++
      CheckQueries.queries ++ TextOps.queries ++ FuzzyDedup.queries ++
      VectorOps.queries ++ InfraQueries.queries ++
      StreamQueries.queries ++ Multimodal.queries ++ DataMarker.queries ++
      Relational2.queries ++ AdvancedOps.queries ++ CurationOps.queries ++
      Relational3.queries ++ MongoOps.queries ++ BinlogReplay.queries ++
      graft.plans.PlanQueries.queries ++ CorpusOps.queries ++
      ScaleOps.queries ++ HygieneOps.queries ++
      ChunkRebalancer.queries ++ BpeLearn.queries ++ PackingOps.queries ++
      LoaderOps.queries ++ StateFaceQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Cdc.oracles ++ Routing.oracles ++
      CheckQueries.oracles ++ TextOps.oracles ++ FuzzyDedup.oracles ++
      VectorOps.oracles ++ InfraQueries.oracles ++
      StreamQueries.oracles ++ Multimodal.oracles ++ DataMarker.oracles ++
      Relational2.oracles ++ AdvancedOps.oracles ++ CurationOps.oracles ++
      Relational3.oracles ++ MongoOps.oracles ++ BinlogReplay.oracles ++
      graft.plans.PlanQueries.oracles ++ CorpusOps.oracles ++
      ScaleOps.oracles ++ HygieneOps.oracles ++
      ChunkRebalancer.oracles ++ BpeLearn.oracles ++ PackingOps.oracles ++
      LoaderOps.oracles ++ StateFaceQueries.oracles
}
