package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Sequence packing for training-data preparation: the GPT-style
  * concat-and-chunk layout. Documents are concatenated in a
  * deterministic corpus order (doc_id), each followed by one EOS
  * token, and the resulting token stream is cut into fixed-size
  * context windows; a document whose tokens straddle a cut appears in
  * more than one window. The packing MANIFEST — each document's global
  * token offset and the window span it lands in — is what a training
  * loader needs to shard the corpus without materializing the
  * concatenated stream.
  *
  * Scale shape: the only global state is an exclusive prefix sum of
  * per-document token counts. That is computed with the repo's
  * two-pass pattern (range-repartition on doc_id, per-partition local
  * cumsum, broadcast per-partition totals — `MongoOps.idPages`), NOT a
  * single-partition `Window over (ORDER BY)`: at 10⁹ documents every
  * executor sums its own range and only a partition-count-sized offset
  * table moves. Window math is integral (`div`), no doubles — offsets
  * near 10¹⁴ tokens (100 TB of text) stay exact.
  */
object PackingOps {

  /** Fixed context-window length in tokens (EOS included). */
  val WindowTokens = 512L

  /** q111 — per-document packing manifest: token count (with EOS),
    * global start offset, first/last window index, windows spanned.
    */
  def packWindows(spark: SparkSession, dir: String): DataFrame =
    packWindowsOf(spark, Tables.documents(spark, dir), WindowTokens)

  def packWindowsOf(spark: SparkSession, docs: DataFrame,
      windowTokens: Long): DataFrame = {
    import spark.implicits._
    require(windowTokens >= 1, "window must hold at least one token")
    val toks = docs.select(col("doc_id"),
      (size(TextOps.tokens(col("text"))) + 1).cast("long").as("n_tokens"))

    val nBuckets = spark.sessionState.conf.numShufflePartitions
    // Pass 1: local exclusive cumsum per sorted range partition. The
    // checkpoint cuts lineage so the offset table and the final frame
    // can only see the same materialized range boundaries.
    val local = toks.repartitionByRange(nBuckets, col("doc_id"))
      .sortWithinPartitions(col("doc_id"))
      .as[(Long, Long)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var acc = 0L
        it.map { case (id, n) =>
          val out = (pid, id, n, acc); acc += n; out
        }
      }.toDF("pid", "doc_id", "n_tokens", "local_off")
      .localCheckpoint(true)

    // Pass 2: partition token totals -> exclusive partition offsets
    // (a partition-count-sized table, broadcast as a literal map).
    val totals = local.groupBy(col("pid"))
      .agg(sum(col("n_tokens")).as("t")).as[(Int, Long)].collect()
      .sortBy(_._1)
    var acc = 0L
    val offsets = totals.map { case (pid, t) =>
      val entry = pid -> acc; acc += t; entry
    }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), col("pid"))

    local
      .withColumn("start_off", col("local_off") + offCol)
      .withColumn("first_win", expr(s"start_off div ${windowTokens}L"))
      .withColumn("last_win",
        expr(s"(start_off + n_tokens - 1) div ${windowTokens}L"))
      .select(col("doc_id"), col("n_tokens"), col("start_off"),
        col("first_win"), col("last_win"),
        (col("last_win") - col("first_win") + 1).as("n_windows"))
  }

  val packWindowsSql: String =
    s"""WITH t AS (
       |  SELECT doc_id,
       |    CAST(len(${TextOps.tokensSql("text")}) + 1 AS BIGINT)
       |      AS n_tokens
       |  FROM documents),
       |o AS (
       |  SELECT doc_id, n_tokens,
       |    COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
       |      AS start_off
       |  FROM t)
       |SELECT doc_id, n_tokens,
       |  CAST(start_off AS BIGINT) AS start_off,
       |  CAST(start_off // ${WindowTokens} AS BIGINT) AS first_win,
       |  CAST((start_off + n_tokens - 1) // ${WindowTokens} AS BIGINT)
       |    AS last_win,
       |  CAST((start_off + n_tokens - 1) // ${WindowTokens}
       |    - start_off // ${WindowTokens} + 1 AS BIGINT) AS n_windows
       |FROM o""".stripMargin

  /** Document-boundary bin packing — the SFT-style complement of
    * [[packWindows]]: documents are NEVER split across sequences;
    * each lands whole in one fixed-capacity bin (padding fills the
    * rest), and documents longer than the capacity are truncated to
    * it and flagged. Used when examples must stay intact (instruction
    * tuning, eval sets), where concat-and-chunk would corrupt
    * example boundaries.
    *
    * Distributed first-fit-decreasing: the corpus range-partitions on
    * DESCENDING token cost (so each partition holds a contiguous size
    * class), every partition first-fit packs its own slice into local
    * bins with a bounded open-bin list, and local bin ids shift by
    * broadcast per-partition bin counts — global bin ids without any
    * single-task pass. Quality: first-fit leaves at most one bin at
    * ≤ half capacity per open-bin-list eviction plus one per
    * partition, so total bins ≤ 2·⌈total/capacity⌉ + partitions — the
    * classic bound, degraded only by the partition count (constant in
    * corpus size).
    */
  def binPack(spark: SparkSession, dir: String): DataFrame =
    binPackOf(spark, Tables.documents(spark, dir), WindowTokens)

  /** Max simultaneously-open bins per partition: packing stays O(n·K)
    * and deterministic; evicted (closed) bins are final.
    */
  val OpenBins = 256

  def binPackOf(spark: SparkSession, docs: DataFrame,
      capacity: Long): DataFrame = {
    import spark.implicits._
    require(capacity >= 1, "bin capacity must hold at least one token")
    val toks = docs.select(col("doc_id"),
      (size(TextOps.tokens(col("text"))) + 1).cast("long").as("n_tokens"))
      .select(col("doc_id"),
        least(col("n_tokens"), lit(capacity)).as("cost"),
        (col("n_tokens") > capacity).as("truncated"))

    val nBuckets = spark.sessionState.conf.numShufflePartitions
    val local = toks
      .repartitionByRange(nBuckets, col("cost").desc, col("doc_id"))
      .sortWithinPartitions(col("cost").desc, col("doc_id"))
      .as[(Long, Long, Boolean)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        // open bins: (local bin id, remaining); first-fit, oldest first
        val open = scala.collection.mutable.ArrayBuffer
          .empty[(Long, Long)]
        var nextBin = 0L
        it.map { case (id, cost, trunc) =>
          val slot = open.indexWhere(_._2 >= cost)
          val bin =
            if (slot >= 0) {
              val (b, rem) = open(slot)
              if (rem == cost) open.remove(slot)
              else open(slot) = (b, rem - cost)
              b
            } else {
              val b = nextBin
              nextBin += 1
              if (cost < capacity) {
                if (open.length == OpenBins) open.remove(0)
                open += ((b, capacity - cost))
              }
              b
            }
          (pid, id, cost, trunc, bin)
        }
      }.toDF("pid", "doc_id", "cost", "truncated", "local_bin")
      .localCheckpoint(true)

    // per-partition bin counts -> exclusive global bin offsets
    val counts = local.groupBy(col("pid"))
      .agg((max(col("local_bin")) + 1).as("n")).as[(Int, Long)]
      .collect().sortBy(_._1)
    var acc = 0L
    val offsets = counts.map { case (pid, n) =>
      val entry = pid -> acc; acc += n; entry
    }.toMap
    val offCol =
      if (offsets.isEmpty) lit(0L)
      else element_at(typedLit(offsets), col("pid"))

    local.select(col("doc_id"), col("cost").as("n_tokens"),
      col("truncated"), (col("local_bin") + offCol).as("bin"))
  }

  /** One-row packing-efficiency report over a [[binPackOf]] manifest:
    * bins used, the ⌈total/capacity⌉ lower bound, and fill rate.
    */
  def binPackReport(manifest: DataFrame, capacity: Long): DataFrame =
    manifest.agg(
      count(lit(1)).as("n_docs"),
      sum(col("n_tokens")).as("total_tokens"),
      (max(col("bin")) + 1).as("n_bins"),
      sum(when(col("truncated"), 1L).otherwise(0L)).as("n_truncated"))
      .select(col("n_docs"), col("total_tokens"), col("n_bins"),
        col("n_truncated"),
        expr(s"(total_tokens + ${capacity}L - 1) div ${capacity}L")
          .as("lower_bound"),
        expr(s"total_tokens * 1000 div (n_bins * ${capacity}L)")
          .as("fill_permille"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q111_pack_windows" -> (packWindows _),
    "q146_window_loss" -> (windowLoss _))

  // ---------------------------------------------------------------- q146
  /** Context-window loss accounting — what a fixed training window
    * costs under each long-document policy, per window size (32 /
    * 64 / 256 — the fixture corpus tops out near 100 tokens, so the
    * small windows exercise the overflow branch): TRUNCATE throws away every token past the window
    * (lost_permille of the corpus), SPLIT keeps everything but pads
    * each document's last window (pad_permille of the slot budget).
    * This is the table that decides between the two policies (and
    * q111's packing exists to beat both — its padding rides ONLY at
    * pack-window boundaries). One row per window size, exact integer
    * token accounting.
    *
    * Scale shape: per-row token counts fold into a 3-row aggregate
    * via a tiny windows-literal cross (map-side combine); nothing but
    * partial sums shuffles.
    */
  def windowLoss(spark: SparkSession, dir: String): DataFrame =
    windowLossOf(graft.Tables.documents(spark, dir))

  def windowLossOf(docs: DataFrame): DataFrame = {
    val session = docs.sparkSession
    import session.implicits._
    val n = greatest(size(TextOps.tokens(col("text"))), lit(0))
      .cast("long")
    val sizes = Seq(32L, 64L, 256L).toDF("w")
    docs.select(n.as("n"))
      .crossJoin(broadcast(sizes))
      .groupBy(col("w"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n")).as("total_tokens"),
        sum(when(col("n") > col("w"), 1L).otherwise(0L))
          .as("n_overflow"),
        sum(greatest(col("n") - col("w"), lit(0L)))
          .as("lost_truncate"),
        // split: ceil(n/w) windows of w slots each; empty docs take
        // no window
        sum(when(col("n") > 0,
          expr("(n + w - 1) div w") * col("w") - col("n"))
          .otherwise(0L)).as("pad_split"),
        sum(when(col("n") > 0, expr("(n + w - 1) div w"))
          .otherwise(0L)).as("n_windows_split"))
      .select(col("w").as("window"), col("n_docs"),
        col("total_tokens"), col("n_overflow"),
        col("lost_truncate"),
        expr("lost_truncate * 1000 div greatest(total_tokens, 1)")
          .as("lost_permille"),
        col("n_windows_split"), col("pad_split"),
        expr("pad_split * 1000 div " +
          "greatest(n_windows_split * window, 1)").as("pad_permille"))
  }

  val windowLossSql: String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH d AS (
       |  SELECT CAST(greatest(len($toks), 0) AS BIGINT) AS n
       |  FROM documents),
       |g AS (
       |  SELECT w, CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(n) AS BIGINT) AS total_tokens,
       |    CAST(sum(CASE WHEN n > w THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_overflow,
       |    CAST(sum(greatest(n - w, 0)) AS BIGINT) AS lost_truncate,
       |    CAST(sum(CASE WHEN n > 0
       |      THEN ((n + w - 1) // w) * w - n ELSE 0 END) AS BIGINT)
       |      AS pad_split,
       |    CAST(sum(CASE WHEN n > 0 THEN (n + w - 1) // w ELSE 0 END)
       |      AS BIGINT) AS n_windows_split
       |  FROM d, (SELECT unnest([32, 64, 256]) AS w) s
       |  GROUP BY 1)
       |SELECT CAST(w AS BIGINT) AS window, n_docs, total_tokens,
       |  n_overflow, lost_truncate,
       |  lost_truncate * 1000 // greatest(total_tokens, 1)
       |    AS lost_permille,
       |  n_windows_split, pad_split,
       |  pad_split * 1000 // greatest(n_windows_split * w, 1)
       |    AS pad_permille
       |FROM g""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "q111_pack_windows" -> packWindowsSql,
    "q146_window_loss" -> windowLossSql)
}
