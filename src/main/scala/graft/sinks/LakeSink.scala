package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File/lakehouse sink — the reference's Foxlake pusher+merger
  * (/root/reference/dt-connector/src/sinker/foxlake/foxlake_pusher.rs:
  * 96-180: buffer rows → ORC files → object store + meta file; a merger
  * task applies them with SQL).
  *
  * Spark-native: `write.orc/parquet` with `partitionBy` replaces the
  * buffering/pushing entirely; the merge step is expressed as the
  * compaction the engine already has (Compaction.compact on the staged
  * batch) followed by an overwrite of affected partitions — or MERGE INTO
  * on a Delta/Iceberg-enabled cluster.
  */
object LakeSink {

  /** Stage a change batch as ORC files partitioned by table address —
    * the pusher side. Returns the staged path.
    */
  def stageOrc(df: DataFrame, root: String, partitionCols: Seq[String])
      : String = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(root)
    root
  }

  /** Merger side: read staged files, compact per key, return final-state
    * rows (what MERGE INTO would apply).
    */
  def mergeStaged(spark: SparkSession, root: String, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    import graft.operators.Compaction
    val staged = spark.read.orc(root)
    Compaction.compact(staged, keys, orderCols, col("row_type"))
  }
}
