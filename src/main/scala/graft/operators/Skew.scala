package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation — salting for hot keys (SURVEY §4: the reference's
  * chunk rebalancing; in Spark: AQE handles skewed *joins* automatically,
  * but a pathologically hot aggregation key still bottlenecks one
  * reducer — two-stage salted aggregation spreads it).
  */
object Skew {

  /** Two-stage salted sum/count aggregation: stage 1 aggregates on
    * (key, salt) — spreading one hot key over `saltBuckets` reducers —
    * stage 2 merges the partials per key. Only associative aggregates
    * compose this way; exactly the map-side-combine shape.
    */
  def saltedAgg(df: DataFrame, key: Column, saltBuckets: Int,
      sums: Map[String, Column]): DataFrame = {
    val salted = df
      .withColumn("_salt", pmod(monotonically_increasing_id(),
        lit(saltBuckets.toLong)))
    val stage1 = salted.groupBy(key.as("_key"), col("_salt"))
      .agg(count(lit(1)).as("_n"),
        sums.map { case (n, c) => sum(c).as(s"_s_$n") }.toSeq: _*)
    stage1.groupBy(col("_key"))
      .agg(sum(col("_n")).as("n"),
        sums.keys.map(n => sum(col(s"_s_$n")).as(n)).toSeq: _*)
  }
}
