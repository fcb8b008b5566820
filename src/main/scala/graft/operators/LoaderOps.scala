package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Training-loader preparation operators: the step AFTER curation where
  * a finished corpus is laid out for a data loader — a deterministic
  * global shuffle into shards, and the multilingual sampling-temperature
  * plan that decides how often each language is drawn.
  *
  * Both are pure arithmetic over portable builtins (md5, sqrt), so each
  * has an exact DuckDB oracle.
  */
object LoaderOps {

  /** Number of output shards for the q115 manifest (a loader would use
    * thousands; the mechanics are shard-count-independent).
    */
  val NumShards = 8

  /** Seed suffix folded into the shuffle key — changing it is a full,
    * uncorrelated reshuffle.
    */
  val ShuffleSeed = ":shuffle42"

  /** First 4 hex nibbles of the md5 hex digest in column `k` as an
    * integer 0..65535. `instr` over a hex alphabet instead of a
    * hex→int conversion builtin because BOTH engines evaluate it
    * identically (conv/from_hex differ in shape between the two).
    */
  private def hexNibbles4: Column = {
    def nib(i: Int): Column =
      expr(s"instr('0123456789abcdef', substring(k, $i, 1)) - 1")
    ((nib(1) * 16 + nib(2)) * 16 + nib(3)) * 16 + nib(4)
  }

  // ---------------------------------------------------------------- q115
  /** Deterministic global shuffle into shards — the training-data layout
    * step: every document gets a pseudo-random but reproducible shard
    * and a dense 1-based position inside its shard, ordered by the md5
    * shuffle key. Re-running with the same seed yields the identical
    * layout (resumable preprocessing); changing the seed is an
    * independent permutation (new data order per epoch strategy).
    *
    * Scale shape: the md5 key and shard are map-side; the per-shard
    * position uses the grouped two-pass rank (range-partition on
    * (shard, key), per-partition local ranks, a partitions×shards
    * count table broadcast back as offsets — `CorpusOps.ccnetBucketsOf`)
    * instead of a shard-sized window task. At 10⁹ documents each task
    * ranks only its own range; the physical layout step would then be
    * `repartitionByRange(shard, key)` + write, which this manifest
    * already ordered.
    */
  def shardShuffle(spark: SparkSession, dir: String): DataFrame =
    shardShuffleOf(spark, Tables.documents(spark, dir), NumShards)

  def shardShuffleOf(spark: SparkSession, docs: DataFrame,
      nShards: Int): DataFrame = {
    import spark.implicits._
    require(nShards >= 1 && nShards <= 65536, "shard count from 4 nibbles")
    val keyed = docs.select(col("doc_id"),
        md5(concat(col("doc_id").cast("string"), lit(ShuffleSeed)))
          .as("k"))
      .select(col("doc_id"), col("k"),
        (hexNibbles4 % nShards).cast("int").as("shard"))

    val nBuckets = spark.sessionState.conf.numShufflePartitions
    val local = keyed
      .repartitionByRange(nBuckets, col("shard"), col("k"), col("doc_id"))
      .sortWithinPartitions(col("shard"), col("k"), col("doc_id"))
      .as[(Long, String, Int)]
      .mapPartitions { it =>
        val pid = org.apache.spark.TaskContext.getPartitionId()
        var curShard = -1
        var i = 0L
        it.map { case (id, k, shard) =>
          if (shard != curShard) { curShard = shard; i = 0L }
          i += 1
          (pid, id, shard, i)
        }
      }.toDF("pid", "doc_id", "shard", "local_pos")
      .localCheckpoint(true)

    // partition×shard count table → per-shard exclusive offsets in pid
    // order plus per-shard totals; broadcast back (≤ partitions×shards
    // rows of driver state)
    val counts = local.groupBy(col("pid"), col("shard"))
      .agg(count(lit(1)).as("c")).as[(Int, Int, Long)].collect()
    val offsets = counts.sortBy(r => (r._2, r._1)).groupBy(_._2).toSeq
      .flatMap { case (shard, rows) =>
        var acc = 0L
        val n = rows.map(_._3).sum
        rows.map { case (pid, _, c) =>
          val row = (pid, shard, acc, n); acc += c; row
        }.toSeq
      }.toDF("pid", "shard", "off", "shard_n")

    local.join(broadcast(offsets), Seq("pid", "shard"))
      .select(col("doc_id"), col("shard").cast("long").as("shard"),
        (col("local_pos") + col("off")).as("pos"), col("shard_n"))
  }

  def shardShuffleSql(nShards: Int = NumShards): String =
    s"""WITH k AS (
       |  SELECT doc_id,
       |    md5(CAST(doc_id AS VARCHAR) || '$ShuffleSeed') AS k
       |  FROM documents),
       |s AS (
       |  SELECT doc_id, k,
       |    (((instr('0123456789abcdef', substring(k, 1, 1)) - 1) * 16
       |      + instr('0123456789abcdef', substring(k, 2, 1)) - 1) * 16
       |      + instr('0123456789abcdef', substring(k, 3, 1)) - 1) * 16
       |      + instr('0123456789abcdef', substring(k, 4, 1)) - 1 AS v
       |  FROM k)
       |SELECT doc_id, CAST(v % $nShards AS BIGINT) AS shard,
       |  CAST(row_number() OVER (PARTITION BY v % $nShards
       |    ORDER BY k, doc_id) AS BIGINT) AS pos,
       |  CAST(count(*) OVER (PARTITION BY v % $nShards) AS BIGINT)
       |    AS shard_n
       |FROM s""".stripMargin

  // ---------------------------------------------------------------- q117
  /** Multilingual sampling-temperature plan (the XLM-R / mT5 α-sampling
    * recipe): per-language draw weights ∝ p_lang^(α−1) so low-resource
    * languages are up-sampled relative to their corpus share. α = 0.5
    * here — weight = √(total/count) — because sqrt and IEEE division
    * are correctly rounded in both engines (an arbitrary-α pow is
    * libm territory and would break the exact oracle; integer and
    * half-integer α cover the published recipes' shapes). Output: the
    * raw weight, the weight relative to the most-boosted language, a
    * permille keep/repeat rate, and the expected document draw count.
    *
    * Scale shape: one language-sized aggregate (|langs| rows), two
    * 1-row broadcast frames for the total and the max weight. Nothing
    * else moves.
    */
  def langTemperature(spark: SparkSession, dir: String): DataFrame =
    langTemperatureOf(Tables.documents(spark, dir))

  def langTemperatureOf(docs: DataFrame): DataFrame = {
    val counts = docs.groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"))
    val total = counts.agg(sum(col("n_docs")).as("total"))
    val weighted = counts.crossJoin(broadcast(total))
      .select(col("lang"), col("n_docs"),
        sqrt(col("total").cast("double") / col("n_docs"))
          .as("samp_weight"))
    val maxw = weighted.agg(max(col("samp_weight")).as("maxw"))
    weighted.crossJoin(broadcast(maxw))
      .select(col("lang"), col("n_docs"), col("samp_weight"),
        (col("samp_weight") / col("maxw")).as("rel_weight"),
        floor(col("samp_weight") / col("maxw") * 1000)
          .cast("long").as("keep_permille"))
      .withColumn("expected_docs",
        expr("n_docs * keep_permille div 1000L"))
  }

  val langTemperatureSql: String =
    """WITH c AS (
      |  SELECT lang, CAST(count(*) AS BIGINT) AS n_docs
      |  FROM documents GROUP BY 1),
      |t AS (SELECT CAST(sum(n_docs) AS BIGINT) AS total FROM c),
      |w AS (
      |  SELECT lang, n_docs,
      |    sqrt(CAST(total AS DOUBLE) / n_docs) AS samp_weight
      |  FROM c, t),
      |m AS (SELECT max(samp_weight) AS maxw FROM w)
      |SELECT lang, n_docs, samp_weight,
      |  samp_weight / maxw AS rel_weight,
      |  CAST(floor(samp_weight / maxw * 1000) AS BIGINT)
      |    AS keep_permille,
      |  CAST(n_docs * CAST(floor(samp_weight / maxw * 1000) AS BIGINT)
      |    // 1000 AS BIGINT) AS expected_docs
      |FROM w, m""".stripMargin

  // ---------------------------------------------------------------- q119
  /** RAG-style sliding-window chunk manifest: fixed-length token
    * windows at a fixed stride (overlap = length − stride), the
    * retrieval-indexing complement of q111's training windows (which
    * concatenate ACROSS documents; retrieval chunks never cross a
    * document boundary and overlap on purpose so no answer span is
    * cut). Each chunk carries the rolling-hash fingerprint of its
    * token span, so chunk-level dedup (the q33 groupBy) composes
    * directly downstream.
    *
    * Chunk i of a doc with n tokens starts at i·stride; the chunk
    * count is 1 + ⌈(n − len)/stride⌉ when n > len else 1, so the last
    * window always reaches the document's end without ever emitting an
    * empty tail chunk.
    *
    * Scale shape: map-only — the chunk index explodes per document and
    * the fingerprint is the native codegen charFold over the sliced
    * token span; no shuffle at all. 100 TB cost is the scan plus an
    * output ≈ len/stride times the corpus.
    */
  val ChunkLen = 16
  val ChunkStride = 8

  def slidingChunks(spark: SparkSession, dir: String): DataFrame =
    slidingChunksOf(Tables.documents(spark, dir), ChunkLen, ChunkStride)

  def slidingChunksOf(docs: DataFrame, len: Int, stride: Int)
      : DataFrame = {
    require(len >= 1 && stride >= 1 && stride <= len,
      "chunks must advance and overlap at most fully")
    val toks = TextOps.tokens(col("text"))
    docs.select(col("doc_id"), toks.as("w"),
        size(toks).cast("long").as("n"))
      .withColumn("n_chunks",
        expr(s"CASE WHEN n > $len THEN (n - $len + ${stride - 1}) " +
          s"div $stride + 1 ELSE 1L END"))
      .select(col("doc_id"), col("w"), col("n"),
        explode(sequence(lit(0L), col("n_chunks") - 1)).as("chunk_idx"))
      .withColumn("start_tok", col("chunk_idx") * stride)
      .withColumn("chunk_len",
        least(lit(len.toLong), col("n") - col("start_tok")))
      .select(col("doc_id"), col("chunk_idx"), col("start_tok"),
        col("chunk_len"),
        graft.functions.GraftFunctions.charFold(
          concat_ws(" ", slice(col("w"),
            (col("start_tok") + 1).cast("int"), lit(len))))
          .as("chunk_fp"))
  }

  val slidingChunksSql: String = {
    val toks = TextOps.tokensSql("text")
    val (l, s) = (ChunkLen, ChunkStride)
    s"""WITH base AS (SELECT doc_id, $toks AS w FROM documents),
       |n AS (SELECT doc_id, w, CAST(len(w) AS BIGINT) AS n,
       |    CASE WHEN len(w) > $l
       |      THEN (len(w) - $l + ${s - 1}) // $s + 1 ELSE 1 END
       |      AS n_chunks
       |  FROM base),
       |c AS (SELECT doc_id, w, n,
       |    unnest(range(0, n_chunks)) AS chunk_idx
       |  FROM n),
       |sp AS (SELECT doc_id, CAST(chunk_idx AS BIGINT) AS chunk_idx,
       |    chunk_idx * $s AS start_tok, n, w,
       |    array_to_string(
       |      w[chunk_idx * $s + 1 : chunk_idx * $s + $l], ' ') AS chunk
       |  FROM c)
       |SELECT doc_id, chunk_idx,
       |  CAST(start_tok AS BIGINT) AS start_tok,
       |  CAST(least($l, n - start_tok) AS BIGINT) AS chunk_len,
       |  ${TextOps.charFoldSql("chunk")} AS chunk_fp
       |FROM sp""".stripMargin
  }

  // ---------------------------------------------------------------- q139
  /** Equal-token-mass length buckets — the dynamic-batching
    * preprocessing step: split the corpus into K=4 sequence-length
    * buckets carrying ~equal TOTAL TOKENS (not equal doc counts), so
    * each training bucket costs the same compute and padding waste
    * concentrates where it is cheapest. Bucket boundaries are exact
    * order statistics over the (length → doc count) census: a census
    * row with inclusive cumulative token mass `cum` lands in bucket
    * ⌈cum·4 / total⌉ — integer arithmetic, no interpolation, so the
    * split is deterministic and identical on both engines (the q104
    * histogram pattern applied to token mass).
    *
    * Scale shape: one hash aggregate to the length census (map-side
    * combine; the census is length-bounded, not corpus-bounded), a
    * cumulative window over that bounded frame, a 4-row result.
    */
  def lengthBuckets(spark: SparkSession, dir: String): DataFrame =
    lengthBucketsOf(Tables.documents(spark, dir))

  def lengthBucketsOf(docs: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val census = docs
      .select(size(TextOps.tokens(col("text"))).cast("long").as("len"))
      .groupBy(col("len")).agg(count(lit(1)).as("cnt"))
      .withColumn("mass", col("len") * col("cnt"))
    val total = census.agg(sum(col("mass")).as("total"))
    val w = Window.orderBy(col("len"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    census.withColumn("cum", sum(col("mass")).over(w))
      .crossJoin(broadcast(total))
      .withColumn("bucket",
        expr("(cum * 4 + total - 1) div total").cast("long"))
      .groupBy(col("bucket"))
      .agg(min(col("len")).as("len_lo"), max(col("len")).as("len_hi"),
        sum(col("cnt")).as("n_docs"), sum(col("mass")).as("n_tokens"))
  }

  val lengthBucketsSql: String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH census AS (
       |  SELECT CAST(len($toks) AS BIGINT) AS len,
       |    CAST(count(*) AS BIGINT) AS cnt
       |  FROM documents GROUP BY 1),
       |m AS (SELECT len, cnt, len * cnt AS mass FROM census),
       |c AS (SELECT len, cnt, mass,
       |    sum(mass) OVER (ORDER BY len
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
       |  FROM m),
       |t AS (SELECT sum(mass) AS total FROM m)
       |SELECT CAST((cum * 4 + total - 1) // total AS BIGINT) AS bucket,
       |  min(len) AS len_lo, max(len) AS len_hi,
       |  CAST(sum(cnt) AS BIGINT) AS n_docs,
       |  CAST(sum(mass) AS BIGINT) AS n_tokens
       |FROM c, t GROUP BY 1""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q139_length_buckets" -> (lengthBuckets _),
    "q115_shard_shuffle" -> (shardShuffle _),
    "q117_lang_temperature" -> (langTemperature _),
    "q119_sliding_chunks" -> (slidingChunks _))

  val oracles: Map[String, String] = Map(
    "q139_length_buckets" -> lengthBucketsSql,
    "q115_shard_shuffle" -> shardShuffleSql(),
    "q117_lang_temperature" -> langTemperatureSql,
    "q119_sliding_chunks" -> slidingChunksSql)
}
