package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.Tables

/** Snapshot chunk-partitioner rebalance — the reference's sink-side
  * long-tail scheduler (`dt-parallelizer/src/chunk_partitioner.rs`,
  * `docs/en/snapshot/chunk_partitioner_rebalance.md`): logical snapshot
  * chunks (schema.table.chunk_id groups) become a write-partition queue
  * that sinkers drain dynamically, with five strategies:
  *
  *  - `none`             — first-seen chunk order, no sorting/splitting
  *  - `chunk_largest_first` — cost-sorted, chunks stay whole
  *  - `auto_split`       — cost-sorted; the largest still-skewed pure-
  *                         insert partition keeps splitting (halves,
  *                         aligned to full sinker batches) until
  *                         concurrency is filled and nothing is skewed,
  *                         or the partition cap is hit
  *  - `table_min_rows`   — chunks sorted by (schema, tb, chunk_id),
  *                         contiguous same-table runs merged, each merged
  *                         run cut into `minPartitionRows`-sized slices
  *  - `table_even`       — merged runs, largest first; a run with at
  *                         least `target·minPartitionRows` rows splits
  *                         into ≤ target near-even slices aligned near
  *                         multiples of `minPartitionRows`
  *
  * Spark-first shape: the reference rebalances every drained batch on
  * one thread; here the per-chunk summary (rows, bytes, insert-purity)
  * is computed DISTRIBUTED (one aggregation — chunk count is bounded by
  * construction, like AQE's map-output stats), the plan is a pure driver
  * function over that summary, and the row→partition assignment joins
  * the broadcast plan back — so the only full-data operations are one
  * aggregation and one co-partitioned window, regardless of scale.
  *
  * Cost semantics mirror the reference exactly: `rows` uses row count;
  * `bytes` uses byte cost with row-count tie-break (`cost_key`), clamped
  * below by rows for skew math (`safe_primary_cost`); `table_*`
  * strategies ignore the bytes cost. Splitting is only ever applied to
  * pure-insert chunks (mixed DML keeps logical chunks intact), both
  * split sides must hold `minPartitionRows`, and split points align to
  * full sinker batches when alignment keeps both sides legal.
  */
object ChunkRebalancer {

  sealed trait Strategy
  case object NoRebalance extends Strategy
  case object ChunkLargestFirst extends Strategy
  case object AutoSplit extends Strategy
  case object TableMinRows extends Strategy
  case object TableEven extends Strategy

  sealed trait Cost
  case object RowsCost extends Cost
  case object BytesCost extends Cost

  final case class Config(
      strategy: Strategy,
      cost: Cost = RowsCost,
      maxPartitionsPerSinker: Int = 2,
      minPartitionRows: Int = 200,
      splitSkewRatio: Double = 1.0) {
    require(maxPartitionsPerSinker > 0, "maxPartitionsPerSinker must be > 0")
    require(minPartitionRows > 0, "minPartitionRows must be > 0")
  }

  /** Per logical chunk summary, in first-seen order. `insertOnly` gates
    * auto_split (mixed DML chunks never split); `bytes` is the estimated
    * payload size when `cost=bytes` (0 otherwise).
    */
  final case class ChunkGroup(schema: String, tb: String, chunkId: Long,
      rows: Long, bytes: Long = 0L, insertOnly: Boolean = true)

  /** One planned write partition slice: rows [start, end) of the chunk
    * run beginning at `groups(groupIndex)`. For merged-table strategies
    * the range spans several contiguous chunks of one table; resolve
    * per-chunk sub-ranges with [[chunkSlices]].
    */
  final case class Slice(partitionId: Int, groupIndexes: Seq[Int],
      start: Long, end: Long)

  /** (partitionId, schema, tb, chunkId, startInChunk, endInChunk). */
  final case class ChunkSlice(partitionId: Int, schema: String, tb: String,
      chunkId: Long, start: Long, end: Long)

  // ------------------------------------------------------------ plan

  /** The full planner: groups in FIRST-SEEN order → ordered partition
    * slices. Pure function — spec-driven against the reference's
    * documented behaviors.
    */
  def plan(groups: Seq[ChunkGroup], targetPartitions: Int,
      cfg: Config): Seq[ChunkSlice] = {
    if (targetPartitions <= 1 || groups.isEmpty)
      return groups.map(g =>
        ChunkSlice(0, g.schema, g.tb, g.chunkId, 0L, g.rows))
    val slices: Seq[Slice] = cfg.strategy match {
      case TableMinRows | TableEven =>
        val merged = mergeContiguous(groups)
        cfg.strategy match {
          case TableMinRows => cutByMinRows(merged, cfg.minPartitionRows)
          case _ => cutTableEven(merged, targetPartitions,
            cfg.minPartitionRows)
        }
      case _ =>
        val parts = groups.indices
          .map(i => Slice(0, Seq(i), 0L, groups(i).rows))
        val rebalanced = cfg.strategy match {
          case NoRebalance => parts
          case ChunkLargestFirst => sortLargestFirst(parts, groups, cfg)
          case AutoSplit => sortLargestFirst(
            autoSplit(parts, groups, targetPartitions, cfg), groups, cfg)
          case _ => parts
        }
        rebalanced
    }
    resolve(slices, groups)
  }

  /** cost_key: (bytes, rows) under bytes cost, (rows, rows) under rows
    * cost — byte cost with row tie-break, exactly the reference.
    */
  private def costKey(s: Slice, groups: Seq[ChunkGroup], cfg: Config)
      : (Long, Long) = {
    val rows = s.end - s.start
    cfg.cost match {
      case BytesCost => (sliceBytes(s, groups), rows)
      case RowsCost => (rows, rows)
    }
  }

  /** Bytes of a slice, pro-rated per row within its (single) group —
    * the reference tracks exact per-row prefix bytes; chunk summaries
    * here carry totals, so split slices estimate uniformly. Skew and
    * ordering decisions are unaffected for uniform rows; wide-row
    * outliers should use the reference default `rows` cost.
    */
  private def sliceBytes(s: Slice, groups: Seq[ChunkGroup]): Long = {
    val g = groups(s.groupIndexes.head)
    if (g.rows == 0) 0L else g.bytes * (s.end - s.start) / g.rows
  }

  private def safePrimaryCost(s: Slice, groups: Seq[ChunkGroup],
      cfg: Config): Long = {
    val rows = s.end - s.start
    cfg.cost match {
      case BytesCost => math.max(sliceBytes(s, groups), rows)
      case RowsCost => rows
    }
  }

  /** Stable sort, largest cost first (Rust `sort_by` is stable; ties
    * keep prior order).
    */
  private def sortLargestFirst(parts: Seq[Slice], groups: Seq[ChunkGroup],
      cfg: Config): Seq[Slice] =
    parts.sortBy(s => costKey(s, groups, cfg))(
      Ordering.Tuple2(Ordering.Long.reverse, Ordering.Long.reverse))

  private def autoSplit(initial: Seq[Slice], groups: Seq[ChunkGroup],
      target: Int, cfg: Config): Seq[Slice] = {
    val parts = scala.collection.mutable.ArrayBuffer(initial: _*)
    val totalRows = parts.map(s => s.end - s.start).sum
    val maxByRows = math.max(totalRows / cfg.minPartitionRows, 1L)
    val maxByConfig = target.toLong * cfg.maxPartitionsPerSinker
    val maxParts = math.max(math.min(maxByRows, maxByConfig), target.toLong)
    val totalCost = parts.map(s => safePrimaryCost(s, groups, cfg)).sum

    def canSplit(s: Slice): Boolean =
      groups(s.groupIndexes.head).insertOnly &&
        (s.end - s.start) >= cfg.minPartitionRows.toLong * 2

    var continue = true
    while (continue && parts.length < maxParts) {
      // Rust max_by_key keeps the LAST maximal element on ties; mirror
      // that by ranking (costKey, index).
      val eligible = parts.zipWithIndex.filter { case (p, _) => canSplit(p) }
      if (eligible.isEmpty) continue = false
      else {
        val (s, i) = eligible.maxBy { case (p, j) =>
          val (c1, c2) = costKey(p, groups, cfg); (c1, c2, j.toLong)
        }
        val skewed = {
          val avgPerSinker = math.max(totalCost / math.max(target, 1),
            cfg.minPartitionRows.toLong)
          safePrimaryCost(s, groups, cfg).toDouble >
            avgPerSinker.toDouble * cfg.splitSkewRatio
        }
        if (parts.length >= target && !skewed) continue = false
        else splitSlice(s, cfg) match {
          case Some((left, right)) =>
            parts(i) = left
            parts += right
          case None => continue = false
        }
      }
    }
    parts.toSeq
  }

  /** Halve at the row midpoint, then align the left side to full
    * `minPartitionRows` batches when both aligned sides stay legal.
    */
  private def splitSlice(s: Slice, cfg: Config): Option[(Slice, Slice)] = {
    val rows = s.end - s.start
    val mid = s.start + (rows + 1) / 2
    val splitAt = alignSplit(s, mid, cfg.minPartitionRows)
    val left = splitAt - s.start
    val right = s.end - splitAt
    if (left < cfg.minPartitionRows || right < cfg.minPartitionRows) None
    else Some((s.copy(end = splitAt),
      s.copy(partitionId = 0, start = splitAt)))
  }

  private def alignSplit(s: Slice, splitAt: Long, minRows: Int): Long = {
    if (minRows <= 1) return splitAt
    val rows = s.end - s.start
    val minLeft = minRows.toLong
    val maxLeft = rows - minRows
    if (minLeft > maxLeft) return splitAt
    val left = splitAt - s.start
    val lower = left / minRows * minRows
    val upper = lower + minRows
    val pick = (lower >= minLeft && lower <= maxLeft,
        upper >= minLeft && upper <= maxLeft) match {
      case (true, true) =>
        if (left - lower <= upper - left) lower else upper
      case (true, false) => lower
      case (false, true) => upper
      case (false, false) => math.min(math.max(left, minLeft), maxLeft)
    }
    s.start + pick
  }

  /** Merged contiguous same-table runs: groups sorted by (schema, tb,
    * chunk_id); a group appends to the open run only when the table
    * matches and its chunk_id strictly increases.
    */
  private final case class Merged(groupIndexes: Vector[Int], rows: Long)

  private def mergeContiguous(groups: Seq[ChunkGroup]): Seq[Merged] = {
    val sorted = groups.indices.sortBy { i =>
      val g = groups(i); (g.schema, g.tb, g.chunkId)
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[Merged]
    var lastKey: Option[(String, String, Long)] = None
    sorted.foreach { i =>
      val g = groups(i)
      val appendable = (out.nonEmpty, lastKey) match {
        case (true, Some((s, t, c))) =>
          s == g.schema && t == g.tb && c < g.chunkId
        case _ => false
      }
      if (appendable) {
        val last = out.last
        out(out.length - 1) = Merged(last.groupIndexes :+ i,
          last.rows + g.rows)
      } else out += Merged(Vector(i), g.rows)
      lastKey = Some((g.schema, g.tb, g.chunkId))
    }
    out.toSeq
  }

  private def cutByMinRows(merged: Seq[Merged], minRows: Int)
      : Seq[Slice] =
    merged.flatMap { m =>
      (0L until m.rows by minRows.toLong).map { start =>
        Slice(0, m.groupIndexes, start,
          math.min(start + minRows, m.rows))
      }
    }

  private def cutTableEven(merged: Seq[Merged], target: Int,
      minRows: Int): Seq[Slice] = {
    val order = merged.indices.sortBy(i => (-merged(i).rows, i))
    order.flatMap { mi =>
      val m = merged(mi)
      val minForEven = target.toLong * minRows
      if (m.rows < minForEven) Seq(Slice(0, m.groupIndexes, 0L, m.rows))
      else {
        var remainingRows = m.rows
        var remainingParts = math.max(math.min(target.toLong, m.rows), 1L)
        var start = 0L
        val out = scala.collection.mutable.ArrayBuffer.empty[Slice]
        while (remainingParts > 0) {
          val len = alignedLen(remainingRows, remainingParts, minRows)
          out += Slice(0, m.groupIndexes, start, start + len)
          start += len
          remainingRows -= len
          remainingParts -= 1
        }
        out.toSeq
      }
    }
  }

  /** Near-even slice length aligned near multiples of minRows — the
    * reference's `aligned_partition_len` verbatim in Long arithmetic.
    */
  private[graft] def alignedLen(remainingRows: Long,
      remainingParts: Long, minRows: Int): Long = {
    if (remainingParts <= 1) return remainingRows
    val ideal = (remainingRows + remainingParts - 1) / remainingParts
    if (minRows <= 1) return ideal
    val minLen = 1L
    val maxLen = remainingRows - (remainingParts - 1)
    val lower = ideal / minRows * minRows
    val upper = lower + minRows
    ((lower >= minLen && lower <= maxLen,
        upper >= minLen && upper <= maxLen) match {
      case (true, true) =>
        if (ideal - lower <= upper - ideal) lower else upper
      case (true, false) => lower
      case (false, true) => upper
      case (false, false) => math.min(math.max(ideal, minLen), maxLen)
    })
  }

  /** Resolve run-relative slices to per-chunk sub-ranges and assign
    * final partition ids in plan order.
    */
  private def resolve(slices: Seq[Slice], groups: Seq[ChunkGroup])
      : Seq[ChunkSlice] =
    slices.zipWithIndex.flatMap { case (s, pid) =>
      // prefix offsets of each chunk within the run
      val offsets = s.groupIndexes.scanLeft(0L)((acc, gi) =>
        acc + groups(gi).rows)
      s.groupIndexes.zipWithIndex.flatMap { case (gi, k) =>
        val g = groups(gi)
        val chunkStart = offsets(k)
        val lo = math.max(s.start, chunkStart)
        val hi = math.min(s.end, chunkStart + g.rows)
        if (lo >= hi) None
        else Some(ChunkSlice(pid, g.schema, g.tb, g.chunkId,
          lo - chunkStart, hi - chunkStart))
      }
    }

  // ------------------------------------------------------- DataFrame

  /** Distributed per-chunk summary — one aggregation, one collected row
    * per chunk (bounded by construction, like AQE map-output stats).
    * Groups return in deterministic (schema, tb, chunk_id) order.
    */
  def summarize(df: DataFrame, bytesCol: Option[Column] = None,
      insertCol: Option[Column] = None): Seq[ChunkGroup] =
    df.groupBy(col("schema"), col("tb"), col("chunk_id"))
      .agg(count(lit(1)).as("rows"),
        sum(bytesCol.getOrElse(lit(0L)).cast("long")).as("bytes"),
        min(when(insertCol.getOrElse(lit(true)), 1).otherwise(0))
          .as("ins"))
      .collect()
      .map(r => ChunkGroup(r.getString(0), r.getString(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getInt(5) == 1)).toSeq
      .sortBy(g => (g.schema, g.tb, g.chunkId))

  /** Attach `partition_id` per row from a planned slice list. `orderCol`
    * gives rows their deterministic order within a chunk (the snapshot
    * key); the slice table broadcasts.
    */
  def assignWith(df: DataFrame, slices: Seq[ChunkSlice],
      orderCol: Column): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val planDf = slices.toDF().select(
      col("partitionId").as("partition_id"),
      col("schema").as("p_schema"), col("tb").as("p_tb"),
      col("chunkId").as("p_chunk"), col("start"), col("end"))
    val w = Window.partitionBy(col("schema"), col("tb"), col("chunk_id"))
      .orderBy(orderCol)
    df.withColumn("__off", row_number().over(w).cast("long") - 1)
      .join(broadcast(planDf),
        col("schema") === col("p_schema") && col("tb") === col("p_tb") &&
          col("chunk_id") === col("p_chunk") &&
          col("__off") >= col("start") && col("__off") < col("end"))
      .drop("p_schema", "p_tb", "p_chunk", "start", "end", "__off")
  }

  /** Distributed group summary → driver plan → broadcast assignment.
    * Returns the input plus a `partition_id` column; callers
    * `.repartition(n, col("partition_id"))` before the sink write.
    */
  def assignPartitions(df: DataFrame, targetPartitions: Int, cfg: Config,
      orderCol: Column, bytesCol: Option[Column] = None,
      insertCol: Option[Column] = None): DataFrame =
    assignWith(df,
      plan(summarize(df, bytesCol, insertCol), targetPartitions, cfg),
      orderCol)

  // ------------------------------------------------------------- q93
  /** q93 — the table_min_rows rebalance PLAN over a chunked orders
    * snapshot: chunks of 1024 keys, merged per table, cut into 500-row
    * write partitions. Emits one row per (partition, chunk) sub-range —
    * deterministic, so the DuckDB oracle reproduces it with window
    * arithmetic (cumulative chunk offsets → partition indexes).
    */
  final val Q93ChunkKeys = 1024L
  final val Q93MinRows = 500L

  def rebalancePlan(spark: SparkSession, dir: String): DataFrame = {
    val chunked = Tables.orders(spark, dir).select(
      lit("tpch").as("schema"), lit("orders").as("tb"),
      (col("o_orderkey") / Q93ChunkKeys).cast("long").as("chunk_id"),
      col("o_orderkey"))
    val statRows = chunked.groupBy(col("schema"), col("tb"),
        col("chunk_id"))
      .agg(count(lit(1)).as("rows"))
      .collect()
    val groups = statRows.map(r => ChunkGroup(r.getString(0),
      r.getString(1), r.getLong(2), r.getLong(3))).toSeq
      .sortBy(g => (g.schema, g.tb, g.chunkId))
    val slices = plan(groups, targetPartitions = 8,
      Config(TableMinRows, minPartitionRows = Q93MinRows.toInt))
    import spark.implicits._
    slices.toDF()
      .select(col("partitionId").as("partition_id"), col("schema"),
        col("tb"), col("chunkId").as("chunk_id"), col("start"),
        col("end"), (col("end") - col("start")).as("n_rows"))
  }

  /** table_min_rows in closed form: with one table, chunks merge into a
    * single run ordered by chunk_id; a chunk covering run offsets
    * [off, off+n) intersects partitions floor(off/m)..floor((off+n-1)/m).
    */
  val rebalancePlanSql: String =
    s"""WITH chunks AS (
       |  SELECT 'tpch' AS schema, 'orders' AS tb,
       |    CAST(floor(o_orderkey / $Q93ChunkKeys) AS BIGINT) AS chunk_id,
       |    COUNT(*) AS n
       |  FROM orders GROUP BY 1, 2, 3),
       |offs AS (
       |  SELECT *, COALESCE(SUM(n) OVER (PARTITION BY schema, tb
       |      ORDER BY chunk_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
       |    0)::BIGINT AS off
       |  FROM chunks),
       |spans AS (
       |  SELECT schema, tb, chunk_id, n, off,
       |    unnest(range(off // $Q93MinRows,
       |      (off + n - 1) // $Q93MinRows + 1)) AS p
       |  FROM offs)
       |SELECT CAST(p AS INTEGER) AS partition_id, schema, tb, chunk_id,
       |  greatest(p * $Q93MinRows, off) - off AS start,
       |  least((p + 1) * $Q93MinRows, off + n) - off AS "end",
       |  least((p + 1) * $Q93MinRows, off + n)
       |    - greatest(p * $Q93MinRows, off) AS n_rows
       |FROM spans""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q93_chunk_rebalance" -> (rebalancePlan _))

  val oracles: Map[String, String] = Map(
    "q93_chunk_rebalance" -> rebalancePlanSql)
}
