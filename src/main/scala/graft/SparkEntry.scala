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

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.regionRevenue(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    Relational.queries ++ Cdc.queries ++ Routing.queries ++
      CheckQueries.queries ++ TextOps.queries ++ FuzzyDedup.queries ++
      VectorOps.queries ++ InfraQueries.queries ++
      StreamQueries.queries ++ Multimodal.queries ++ DataMarker.queries ++
      Relational2.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    Relational.oracles ++ Cdc.oracles ++ Routing.oracles ++
      CheckQueries.oracles ++ TextOps.oracles ++ FuzzyDedup.oracles ++
      VectorOps.oracles ++ InfraQueries.oracles ++
      StreamQueries.oracles ++ Multimodal.oracles ++ DataMarker.oracles ++
      Relational2.oracles
}
