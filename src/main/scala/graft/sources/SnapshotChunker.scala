package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Chunked parallel snapshot scan planning — the reference's even-chunk
  * splitter (/root/reference/dt-connector/src/extractor/base_splitter.rs:
  * 70-167) as a helper for Spark's JDBC partitioned read.
  *
  * Spark's `partitionColumn/lowerBound/upperBound/numPartitions` does
  * uniform stride only; the reference computes a density-aware stride
  * (rows per key-range unit) and rejects pathological skew. This module
  * ports that computation: sample COUNT/MIN/MAX once, derive the stride,
  * emit either JDBC bounds or an explicit predicate array (the keyset
  * fallback for non-contiguous keys).
  */
object SnapshotChunker {

  /** Reference defaults (docs/en/config.md:17): extract batch 10k rows;
    * distribution factor clamped to [0.05, 1000] (base_splitter.rs:70-136).
    */
  final val DefaultBatchSize = 10000L
  final val MinDistributionFactor = 0.05
  final val MaxDistributionFactor = 1000.0

  final case class TableStats(count: Long, min: Long, max: Long)

  final case class ChunkPlan(step: Long, nChunks: Int, lower: Long,
      upper: Long) {
    /** Chunk ranges as [lo, hi) pairs. */
    def ranges: Seq[(Long, Long)] =
      (0 until nChunks).map { i =>
        val lo = lower + i * step
        (lo, math.min(lo + step, upper + 1))
      }
    /** JDBC-style predicate strings (one per partition/task). */
    def predicates(colName: String): Array[String] =
      ranges.map { case (lo, hi) =>
        s"$colName >= $lo AND $colName < $hi"
      }.toArray
  }

  /** Density-aware stride: distribution_factor = key-span / rows; chunk
    * step = batchSize × clamp(factor). A dense PK (factor ≈ 1) gives
    * step = batchSize; a sparse key widens the step so chunks still hold
    * ~batchSize rows.
    */
  def plan(stats: TableStats, batchSize: Long = DefaultBatchSize)
      : ChunkPlan = {
    require(stats.count > 0, "empty table needs no chunking")
    val span = stats.max - stats.min + 1
    val factor = span.toDouble / stats.count
    val clamped = math.min(MaxDistributionFactor,
      math.max(MinDistributionFactor, factor))
    val step = math.max(1L, math.ceil(batchSize * clamped).toLong)
    val n = math.ceil(span.toDouble / step).toInt
    ChunkPlan(step, n, stats.min, stats.max)
  }

  /** Gather stats with one aggregate (the reference's
    * information_schema / MIN/MAX sampling round-trip).
    */
  def stats(df: DataFrame, keyCol: String): TableStats = {
    val row = df.agg(count(lit(1)), min(col(keyCol)).cast("long"),
      max(col(keyCol)).cast("long")).head()
    TableStats(row.getLong(0), row.getLong(1), row.getLong(2))
  }

  /** Chunk-id assignment column for an already-loaded DataFrame (tags rows
    * the way the reference threads chunk_id through to sink partitioning).
    * Pure arithmetic — oracle-replicable.
    */
  def chunkId(keyCol: Column, lower: Long, step: Long): Column =
    floor((keyCol.cast("long") - lit(lower)) / lit(step)).cast("long")

  /** Keyset pagination predicates (reference keyset mode:
    * mysql_snapshot_extractor.rs:959-1141): WHERE k > lastSeen ORDER BY k
    * LIMIT n — for keys where range chunking is infeasible. Returns the
    * statement shape; execution belongs to a JDBC reader loop.
    */
  def keysetStatement(table: String, orderCols: Seq[String],
      lastSeen: Option[Seq[String]], batch: Long,
      extraWhere: Option[String] = None): String = {
    val keyPred = lastSeen.map { vals =>
      val tuple = orderCols.mkString("(", ",", ")")
      val vtuple = vals.mkString("(", ",", ")")
      s"$tuple > $vtuple"
    }
    val where = (keyPred.toSeq ++ extraWhere.toSeq).mkString(" AND ")
    val whereSql = if (where.isEmpty) "" else s" WHERE $where"
    s"SELECT * FROM $table$whereSql ORDER BY ${orderCols.mkString(", ")} " +
      s"LIMIT $batch"
  }
}
