package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Near-duplicate detection for training-data pipelines: word-shingle
  * Jaccard, MinHash + LSH banding, and SimHash — all as pure higher-order
  * column expressions with exact DuckDB oracles (every hash is explicit
  * integer arithmetic, no engine-private hash functions).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - shingling is a per-row map (no shuffle);
  *  - candidate generation shuffles only (docId, 64-bit key) pairs —
  *    explode on shingle/band key, join on the key, never on text;
  *  - verification runs only on candidate pairs, not the n² cross join.
  *  - SimHash pair scan here is a small-n cross join for the oracle; the
  *    scale path is bucketing by fingerprint prefix (same band-join shape).
  */
object FuzzyDedup {

  import TextOps.{charFold, charFoldSql, tokens, tokensSql, FoldP}

  /** Distinct word-5-gram shingle strings per document. */
  def shingles(text: Column, n: Int = 5): Column = {
    val toks = tokens(text)
    val nShingles = size(toks) - (n - 1)
    array_distinct(
      when(nShingles >= 1,
        transform(sequence(lit(1), greatest(nShingles, lit(1))),
          i => concat_ws(" ", slice(toks, i, lit(n)))))
        .otherwise(array().cast("array<string>")))
  }

  /** DuckDB mirror of [[shingles]] (slice is inclusive: toks[i:i+n-1]). */
  def shinglesSql(e: String, n: Int = 5): String = {
    val toks = tokensSql(e)
    s"list_distinct(list_transform(" +
      s"range(1, greatest(len($toks) - ${n - 1}, 0) + 1), " +
      s"i -> array_to_string(($toks)[i:i+${n - 1}], ' ')))"
  }

  /** Shingle-hash list per doc: rolling char hash of each distinct
    * shingle — the native one-pass expression; the composed form below is
    * the cross-checked reference.
    */
  def shingleHashes(text: Column): Column =
    graft.functions.GraftFunctions.shingleHashes(text)

  def shingleHashesHof(text: Column): Column =
    transform(shingles(text), s => charFold(s))

  def shingleHashesSql(e: String): String =
    s"list_transform(${shinglesSql(e)}, s -> ${charFoldSql("s")})"

  // ---------------------------------------------------------------- q34
  /** Word-5-gram Jaccard near-dup pairs: explode distinct shingles, join
    * on shingle, count intersections, compute exact |A∩B| / |A∪B| as
    * integers. Output every pair sharing ≥1 shingle.
    */
  def ngramJaccardPairs(spark: SparkSession, dir: String): DataFrame =
    ngramJaccardPairsOf(Tables.documents(spark, dir))

  /** Same operator over any (doc_id, text) DataFrame. Joins on the
    * 64-bit native shingle hash, not the shingle string — long join keys
    * shuffle a fraction of the bytes and the fold is codegen'd. The
    * oracle hashes identically, so results stay bit-equal even in the
    * (≈1e-6) event of a hash collision.
    */
  def ngramJaccardPairsOf(docs: DataFrame): DataFrame = {
    // pinned: the exploded shingle frame feeds BOTH self-join sides
    // and the size census — unpinned, the corpus tokenize+hash runs
    // three times (the q88 discipline)
    val ex = docs.select(col("doc_id"),
      explode(shingleHashes(col("text"))).as("h"))
      .localCheckpoint(false)
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val pairs = ex.as("a").join(ex.as("b"),
        col("a.h") === col("b.h") && col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    pairs
      .join(sizes.withColumnRenamed("doc_id", "doc_a")
        .withColumnRenamed("n_sh", "n_a"), "doc_a")
      .join(sizes.withColumnRenamed("doc_id", "doc_b")
        .withColumnRenamed("n_sh", "n_b"), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        (col("n_a") + col("n_b") - col("n_common")).as("n_union"),
        (col("n_common").cast("double") /
          (col("n_a") + col("n_b") - col("n_common"))).as("jaccard"))
  }

  val ngramJaccardPairsSql: String = {
    val sh = shingleHashesSql("text")
    s"""WITH d AS (SELECT doc_id, $sh AS sh FROM documents),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
       |ex AS (SELECT doc_id, unnest(sh) AS h FROM d),
       |pairs AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
       |  FROM ex a JOIN ex b ON a.h = b.h AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common,
       |  sa.n_sh + sb.n_sh - n_common AS n_union,
       |  CAST(n_common AS DOUBLE) / (sa.n_sh + sb.n_sh - n_common) AS jaccard
       |FROM pairs
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q35
  /** MinHash/LSH parameters: k signatures in b bands of r rows. The
    * per-signature permutation is (a_i * h + b_i) mod P with fixed odd
    * multipliers — explicit arithmetic, oracle-replicable.
    */
  final val MinhashA = Seq(370248451L, 668265263L, 735632797L, 868864229L,
    903678863L, 965726881L, 982451653L, 998244353L)
  final val MinhashB = Seq(12345L, 67891L, 23457L, 78913L,
    34569L, 89123L, 45678L, 91234L)
  final val MinhashP = 1000000007L
  final val BandRows = 2

  /** Per-doc MinHash signature as an array column. The shingle hash is
    * reduced mod P before the multiply — a*h with h < FoldP (1e15) would
    * overflow int64; with h < P (1e9) the product stays < 1e18.
    */
  /** Signature from an ALREADY-MATERIALIZED shingle-hash array column.
    * Callers must project [[shingleHashes]] into its own column first —
    * higher-order lambdas are interpreted (no codegen), so feeding the
    * raw expression here would re-hash every shingle once per signature
    * (8×) instead of once.
    */
  def minhashSigFromHashes(hs: Column): Column =
    graft.functions.GraftFunctions.minhashSig(hs)

  /** Composed reference implementation (8 interpreted array passes) —
    * cross-checked against the native one-pass expression in
    * GraftExpressionsSpec.
    */
  def minhashSigFromHashesHof(hs: Column): Column = {
    val sigs = MinhashA.zip(MinhashB).map { case (a, b) =>
      array_min(transform(hs,
        h => pmod(lit(a) * pmod(h, lit(MinhashP)) + lit(b), lit(MinhashP))))
    }
    array(sigs: _*)
  }

  def minhashSigSql(e: String): String = {
    val hs = shingleHashesSql(e)
    val sigs = MinhashA.zip(MinhashB).map { case (a, b) =>
      s"list_min(list_transform($hs, " +
        s"h -> ($a * (h % $MinhashP) + $b) % $MinhashP))"
    }
    s"[${sigs.mkString(", ")}]"
  }

  /** q35 — LSH candidate pairs: band the signature (b bands × r rows),
    * join docs agreeing on any full band, emit distinct candidate pairs
    * with the number of agreeing bands.
    */
  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    minhashLshOf(Tables.documents(spark, dir))

  /** The (doc_id, band_key) frame both candidate generators band over:
    * one row per document per band, the key a `band:sig…` string.
    */
  private def bandFrame(docs: DataFrame): DataFrame = {
    val nBands = MinhashA.size / BandRows
    val d = docs
      .select(col("doc_id"), shingleHashes(col("text")).as("hs"))
      .select(col("doc_id"), minhashSigFromHashes(col("hs")).as("sig"))
    val bandCols = (0 until nBands).map { j =>
      concat_ws(":", (lit(j.toString) +:
        (0 until BandRows).map(r =>
          element_at(col("sig"), j * BandRows + r + 1)
            .cast("string"))): _*)
    }
    d.select(col("doc_id"), explode(array(bandCols: _*)).as("band_key"))
  }

  def minhashLshOf(docs: DataFrame): DataFrame = {
    // pinned: the signature computation feeds both self-join sides
    val bands = bandFrame(docs).localCheckpoint(false)
    bands.as("a").join(bands.as("b"),
        col("a.band_key") === col("b.band_key") &&
          col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  def minhashLshSqlFrom(from: String): String = {
    val nBands = MinhashA.size / BandRows
    val sig = minhashSigSql("text")
    val bandKeys = (0 until nBands).map { j =>
      val parts = (0 until BandRows)
        .map(r => s"CAST(sig[${j * BandRows + r + 1}] AS VARCHAR)")
      s"concat_ws(':', '$j', ${parts.mkString(", ")})"
    }
    s"""WITH d AS (SELECT doc_id, $sig AS sig FROM $from),
       |bands AS (SELECT doc_id,
       |  unnest([${bandKeys.mkString(", ")}]) AS band_key FROM d)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_bands
       |FROM bands a JOIN bands b
       |  ON a.band_key = b.band_key AND a.doc_id < b.doc_id
       |GROUP BY 1, 2""".stripMargin
  }

  val minhashLshSql: String = minhashLshSqlFrom("documents")

  // ---------------------------------------------------------------- q149
  /** Star-edge LSH candidate generation — the 100 TB form of the q35
    * all-pairs banding, and the answer to what the sf10 sweep measured:
    * all-pairs within a band bucket is Σ|bucket|·(|bucket|−1)/2, and
    * duplicate clusters in a real corpus (shared boilerplate, template
    * pages) GROW WITH THE CORPUS, so the pair count grows quadratically
    * — measured on the synthetic corpus: 50 k docs → 322 k verified
    * pairs but 500 k docs → 34.7 M (10× docs, 108× pairs; q129 wall
    * time tracked it linearly at ~34 µs/pair).
    *
    * For duplicate-group RESOLUTION (components → canonical → purge)
    * all-pairs is wasted work: connecting every bucket member to the
    * bucket MINIMUM (a star) connects exactly the same components with
    * |bucket|−1 edges — edge count bounded by rows(bands frame) =
    * docs × n_bands, LINEAR in the corpus no matter how cluster sizes
    * are distributed. The star shape matters as much as the count: a
    * consecutive-pair CHAIN has the same edge budget but diameter
    * |bucket|−1, and min-label propagation walks one hop per round —
    * at sf10 a chained 10 k-member template cluster blew the 25-round
    * bound. Star buckets have diameter 2, exactly like all-pairs
    * buckets, so component convergence (bounded by the bucket-overlap
    * graph, not cluster size) is unchanged from q35/q46.
    * FuzzyDedupSpec asserts component-partition equality against the
    * all-pairs form; the q150 oracle proves it again cross-engine at
    * the gate sf (Spark stars vs DuckDB all-pairs).
    *
    * Scale shape: shuffles carry only (doc_id, band_key) — never
    * text. The bucket minimum is a `groupBy(band_key).agg(min)`
    * joined back, NOT a `min().over(Window.partitionBy(band_key))`:
    * WindowExec buffers each bucket group in ONE task, and a real
    * 100 TB crawl has degenerate buckets (millions of empty/
    * boilerplate docs sharing a band signature) that would serialize
    * into a single unbounded task — and AQE skew-splits joins but
    * can never split a window. The hash aggregate's map-side partial
    * min keeps any bucket size cheap, and the join back is
    * shuffle-hash (build side = one row per distinct band_key) so
    * AQE's OptimizeSkewedJoin can split a mega-bucket's probe rows
    * across tasks. DedupSpec plants a 100 k-doc identical-signature
    * bucket; ScaleShapeSpec pins the window-free plan. Output
    * `n_buckets` counts how many bands produced the same star edge.
    */
  def lshStarEdges(spark: SparkSession, dir: String): DataFrame =
    lshStarEdgesOf(Tables.documents(spark, dir))

  def lshStarEdgesOf(docs: DataFrame): DataFrame = {
    // pinned once: the minhash signature feeds both the minima
    // aggregate and the probe side (same discipline as minhashLshOf)
    val bands = bandFrame(docs).localCheckpoint(false)
    val minima = bands.groupBy(col("band_key"))
      .agg(min(col("doc_id")).as("a"))
    bands.join(minima.hint("shuffle_hash"), Seq("band_key"))
      .filter(col("doc_id") =!= col("a"))
      .groupBy(col("a"), col("doc_id").as("b"))
      .agg(count(lit(1)).as("n_buckets"))
  }

  def lshStarEdgesSqlFrom(from: String): String = {
    val nBands = MinhashA.size / BandRows
    val sig = minhashSigSql("text")
    val bandKeys = (0 until nBands).map { j =>
      val parts = (0 until BandRows)
        .map(r => s"CAST(sig[${j * BandRows + r + 1}] AS VARCHAR)")
      s"concat_ws(':', '$j', ${parts.mkString(", ")})"
    }
    s"""WITH d AS (SELECT doc_id, $sig AS sig FROM $from),
       |bands AS (SELECT doc_id,
       |  unnest([${bandKeys.mkString(", ")}]) AS band_key FROM d),
       |st AS (SELECT doc_id AS b, min(doc_id) OVER (
       |    PARTITION BY band_key) AS a FROM bands)
       |SELECT a, b, count(*) AS n_buckets FROM st
       |WHERE a <> b GROUP BY 1, 2""".stripMargin
  }

  val lshStarEdgesSql: String = lshStarEdgesSqlFrom("documents")

  // ---------------------------------------------------------------- q36
  /** 30-bit SimHash fingerprint: per token-occurrence hash, per-bit
    * majority vote. Bit extraction uses floor(h / 2^j) % 2 — exact double
    * arithmetic for h < 2^30, identical in both engines.
    */
  final val SimBits = 30

  /** Token-hash list (materialize this once per row — see
    * [[minhashSigFromHashes]] on interpreted HOF cost).
    */
  def tokenHashes(text: Column): Column =
    transform(tokens(text), t => pmod(charFold(t), lit(1L << SimBits)))

  /** Fingerprint from an already-materialized token-hash column —
    * native one-pass expression.
    */
  def simhashFromHashes(hs: Column): Column =
    graft.functions.GraftFunctions.simhash(hs)

  /** Composed reference implementation (30 interpreted aggregate passes)
    * — cross-checked against the native expression in
    * GraftExpressionsSpec.
    */
  def simhashFromHashesHof(hs: Column): Column = {
    val bitSum = (j: Int) => aggregate(hs, lit(0L), (acc, h) =>
      acc + (floor(h / pow(lit(2.0), lit(j))).cast("long") % 2) * 2 - 1)
    (0 until SimBits).map(j =>
      when(bitSum(j) > 0, lit(1L << j)).otherwise(lit(0L)))
      .reduce(_ + _)
  }

  def simhash(text: Column): Column = simhashFromHashes(tokenHashes(text))

  def simhashSql(e: String): String = {
    val hs = s"list_transform(${tokensSql(e)}, " +
      s"t -> ${charFoldSql("t")} % ${1L << SimBits})"
    val terms = (0 until SimBits).map { j =>
      val bitSum = s"list_reduce(list_prepend(0, list_transform($hs, " +
        s"h -> (CAST(floor(h / pow(2.0, $j)) AS BIGINT) % 2) * 2 - 1)), " +
        s"(acc, x) -> acc + x)"
      s"CASE WHEN $bitSum > 0 THEN ${1L << j} ELSE 0 END"
    }
    terms.mkString("(", " + ", ")")
  }

  /** q36 — SimHash fingerprints + hamming-close pairs (≤ 8 of 30 bits).
    *
    * ORACLE FIXTURE, not the production default: the O(n²) exact pair
    * scan exists as the engine-checked ground truth for the bucketed
    * path. USE [[simhashBuckets]] (q26) — pigeonhole band buckets,
    * |docs|×2 longs instead of n² pairs, equality with the exact scan
    * asserted in DedupSpec — for any real corpus.
    */
  def simhashPairs(spark: SparkSession, dir: String): DataFrame = {
    // fan out the single-file scan (tokenize+simhash would run one
    // task otherwise — Tables.fanout is a no-op at cluster scale)
    // and PIN the signature frame before the self-join (the q26/q88
    // discipline): without the checkpoint the full corpus
    // tokenize+simhash runs once PER JOIN SIDE
    val d = Tables.fanout(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"), simhashFromHashes(col("hs")).as("fp"))
      .localCheckpoint(false)
    d.as("a").join(d.as("b"), col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= 1)
  }

  val simhashPairsSql: String = {
    val fp = simhashSql("text")
    s"""WITH d AS (SELECT doc_id, $fp AS fp FROM documents)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  bit_count(xor(a.fp, b.fp)) AS hamming
       |FROM d a JOIN d b ON a.doc_id < b.doc_id
       |WHERE bit_count(xor(a.fp, b.fp)) <= 1""".stripMargin
  }

  // ---------------------------------------------------------------- q26
  /** SimHash at scale: the bucketed candidate join that replaces q36's
    * exact n² pair scan. Split each 30-bit fingerprint into two 15-bit
    * halves; by pigeonhole, any pair within hamming distance 1 agrees on
    * at least one half, so joining within half-buckets finds EXACTLY the
    * q36 pair set (asserted in DedupSpec) while joining |docs|·2 rows of
    * two longs instead of n²/2 pairs. General recipe: for hamming ≤ k,
    * use k+1 bands.
    */
  final val SimHalfBits = SimBits / 2 // 15
  final val SimHalfMod = 1L << SimHalfBits

  def simhashBuckets(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(spark, Tables.documents(spark, dir))
      .select(col("doc_id"), tokenHashes(col("text")).as("hs"))
      .select(col("doc_id"), simhashFromHashes(col("hs")).as("fp"))
    // band 0: low half; band 1: high half, offset to its own key space.
    // Pinned before the self-join (the q88 discipline): without it the
    // full corpus tokenize+simhash runs once PER JOIN SIDE.
    val b = d.select(col("doc_id"), col("fp"),
      explode(array(
        pmod(col("fp"), lit(SimHalfMod)),
        lit(SimHalfMod) + shiftrightunsigned(col("fp"), SimHalfBits)))
        .as("bucket"))
      .localCheckpoint(false)
    b.as("a").join(b.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.fp").bitwiseXOR(col("b.fp"))).as("hamming"))
      .filter(col("hamming") <= 1)
      .distinct()
  }

  val simhashBucketsSql: String = {
    val fp = simhashSql("text")
    s"""WITH d AS (SELECT doc_id, $fp AS fp FROM documents),
       |b AS (SELECT doc_id, fp, unnest([fp % $SimHalfMod,
       |    $SimHalfMod + (fp // $SimHalfMod)]) AS bucket FROM d)
       |SELECT DISTINCT a.doc_id AS doc_a, b2.doc_id AS doc_b,
       |  bit_count(xor(a.fp, b2.fp)) AS hamming
       |FROM b a JOIN b b2
       |  ON a.bucket = b2.bucket AND a.doc_id < b2.doc_id
       |WHERE bit_count(xor(a.fp, b2.fp)) <= 1""".stripMargin
  }

  // ---------------------------------------------------------------- q129
  /** Edit-distance confirmation of LSH candidates — the verify stage
    * every near-dup pipeline needs between "the bands collided" and
    * "purge the document": normalized Levenshtein similarity over the
    * candidate pairs only, never corpus×corpus. Candidates come from
    * the q35 banding over a re-ingestion fixture (every 10th document
    * union'd back with a word substitution and an appended tail —
    * doc_id + 10⁶, the q24 pattern), so the verdict column separates
    * real near-dups (the edited clones confirm at ≳95% similarity)
    * from band collisions between unrelated texts (which fail the 80%
    * gate).
    *
    * Scale shape: the expensive O(len²) Levenshtein runs once per
    * CANDIDATE (bounded by the banding), not per pair of documents;
    * text joins back to the candidate list by doc_id — two hash joins
    * keyed on a long. The similarity gate is exact integer arithmetic
    * (lev·5 ≤ max_len ⟺ similarity ≥ 80%).
    */
  final val EditCloneOffset = 1000000L

  private def editedCorpus(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"))
    base.unionByName(base.filter(col("doc_id") % 10 === 0)
      .select((col("doc_id") + lit(EditCloneOffset)).as("doc_id"),
        concat(expr("replace(text, ' the ', ' that ')"),
          lit(" trailing marker")).as("text")))
  }

  def editVerify(spark: SparkSession, dir: String): DataFrame =
    editVerifyOf(Tables.documents(spark, dir))

  def editVerifyOf(corpus: DataFrame): DataFrame = {
    val docs = editedCorpus(corpus)
    val texts = docs.select(col("doc_id"),
        TextOps.normText(col("text")).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
      .localCheckpoint()
    minhashLshOf(docs)
      .join(texts.select(col("doc_id").as("doc_a"),
        col("t").as("ta"), col("len").as("la")), Seq("doc_a"))
      .join(texts.select(col("doc_id").as("doc_b"),
        col("t").as("tb"), col("len").as("lb")), Seq("doc_b"))
      .withColumn("lev", levenshtein(col("ta"), col("tb")).cast("long"))
      .withColumn("max_len", greatest(col("la"), col("lb")))
      .select(col("doc_a"), col("doc_b"), col("n_bands"), col("lev"),
        col("max_len"),
        expr("(max_len - lev) * 1000 div max_len").as("sim_permille"))
      .withColumn("confirmed", col("lev") * 5 <= col("max_len"))
  }

  val editVerifySql: String = {
    val from = "(SELECT doc_id, text FROM documents UNION ALL " +
      s"SELECT doc_id + $EditCloneOffset, " +
      "replace(text, ' the ', ' that ') || ' trailing marker' " +
      "FROM documents WHERE doc_id % 10 = 0) udocs"
    val norm = TextOps.normTextSql("text")
    s"""WITH cand AS (${minhashLshSqlFrom(from)}),
       |t AS (SELECT doc_id, $norm AS t,
       |  CAST(length($norm) AS BIGINT) AS len FROM $from),
       |j AS (
       |  SELECT c.doc_a, c.doc_b, c.n_bands,
       |    CAST(levenshtein(a.t, b.t) AS BIGINT) AS lev,
       |    greatest(a.len, b.len) AS max_len
       |  FROM cand c
       |  JOIN t a ON c.doc_a = a.doc_id
       |  JOIN t b ON c.doc_b = b.doc_id)
       |SELECT doc_a, doc_b, n_bands, lev, max_len,
       |  (max_len - lev) * 1000 // max_len AS sim_permille,
       |  lev * 5 <= max_len AS confirmed
       |FROM j""".stripMargin
  }

  // ---------------------------------------------------------------- q136
  /** LSH S-curve calibration for the configured banding (MMDS §3.4):
    * the probability a pair at Jaccard s becomes a candidate under b
    * bands of r rows is 1 − (1 − s^r)^b — the audit run before
    * changing dedup thresholds, answering "what similarity does this
    * configuration actually catch?". Emitted for s = 25‰ … 975‰ with
    * the configured (b=4, r=2), plus the past-50% flag whose first
    * true row brackets the threshold t ≈ (1/b)^(1/r) ≈ 0.5.
    *
    * Exactness: the whole curve is integer arithmetic — q = 10^6 − s²
    * (the miss probability in ppm), q⁴ ≤ 10^24 via DECIMAL(38,0) on
    * Spark and HUGEINT on DuckDB, and hit_ppm = 10^6 − ⌊q⁴·10^6 /
    * 10^24⌋. IEEE pow never appears, so both engines agree digit for
    * digit (the same no-libm discipline as q107's bit-length log).
    *
    * Scale shape: 39 generated rows, no input table at all — the
    * audit is free at any corpus size.
    */
  def lshCurve(spark: SparkSession, dir: String): DataFrame = {
    val b = MinhashA.size / BandRows // 4
    require(BandRows == 2 && b == 4,
      "curve arithmetic is specialized to the configured b=4, r=2")
    spark.range(1, 40)
      .select((col("id") * 25).as("s_permille"))
      .withColumn("q", lit(1000000L) - col("s_permille") *
        col("s_permille"))
      .withColumn("q4",
        expr("CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))" +
          " * CAST(q AS DECIMAL(38,0)) * CAST(q AS DECIMAL(38,0))"))
      .select(col("s_permille"),
        expr("CAST(1000000 - floor((q4 * 1000000) / " +
          "CAST(1000000000000000000000000 AS DECIMAL(38,0))) " +
          "AS BIGINT)").as("hit_ppm"))
      .withColumn("past_threshold", col("hit_ppm") >= 500000L)
  }

  val lshCurveSql: String =
    s"""WITH s AS (
       |  SELECT CAST(range * 25 AS BIGINT) AS s_permille
       |  FROM range(1, 40)),
       |q AS (SELECT s_permille,
       |  CAST(1000000 - s_permille * s_permille AS HUGEINT) AS q
       |  FROM s),
       |c AS (SELECT s_permille,
       |  CAST(1000000 - (q * q * q * q * 1000000) //
       |    CAST('1000000000000000000000000' AS HUGEINT) AS BIGINT)
       |    AS hit_ppm
       |  FROM q)
       |SELECT s_permille, hit_ppm, hit_ppm >= 500000 AS past_threshold
       |FROM c""".stripMargin

  // ---------------------------------------------------------------- q141
  /** Measured LSH precision — the empirical companion to q136's
    * theoretical S-curve: group q129's edit-verified candidates by
    * how many bands agreed and report candidate count, confirmed
    * count, and precision in permille per level. This is the table
    * that justifies (or indicts) the banding configuration on the
    * ACTUAL corpus: 1-band collisions between unrelated texts drag
    * precision down exactly where the S-curve predicts the candidate
    * tail lives, while all-band agreements should confirm near 1000‰.
    *
    * Scale shape: a ≤ b-row aggregate over the already-bounded
    * candidate verdict frame — free once q129 ran.
    */
  def lshPrecision(spark: SparkSession, dir: String): DataFrame =
    editVerify(spark, dir)
      .groupBy(col("n_bands"))
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("confirmed"), 1L).otherwise(0L)).as("n_confirmed"))
      .withColumn("precision_permille",
        expr("n_confirmed * 1000 div n_pairs"))

  val lshPrecisionSql: String =
    s"""WITH v AS (${editVerifySql}),
       |g AS (
       |  SELECT n_bands, CAST(count(*) AS BIGINT) AS n_pairs,
       |    CAST(sum(CASE WHEN confirmed THEN 1 ELSE 0 END) AS BIGINT)
       |      AS n_confirmed
       |  FROM v GROUP BY 1)
       |SELECT n_bands, n_pairs, n_confirmed,
       |  n_confirmed * 1000 // n_pairs AS precision_permille
       |FROM g""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q149_lsh_star_edges" -> (lshStarEdges _),
    "q141_lsh_precision" -> (lshPrecision _),
    "q136_lsh_curve" -> (lshCurve _),
    "q129_edit_verify" -> (editVerify _),
    "q34_ngram_jaccard" -> (ngramJaccardPairs _),
    "q35_minhash_lsh" -> (minhashLsh _),
    "q36_simhash_pairs" -> (simhashPairs _),
    "q26_simhash_buckets" -> (simhashBuckets _))

  val oracles: Map[String, String] = Map(
    "q149_lsh_star_edges" -> lshStarEdgesSql,
    "q141_lsh_precision" -> lshPrecisionSql,
    "q136_lsh_curve" -> lshCurveSql,
    "q129_edit_verify" -> editVerifySql,
    "q34_ngram_jaccard" -> ngramJaccardPairsSql,
    "q35_minhash_lsh" -> minhashLshSql,
    "q36_simhash_pairs" -> simhashPairsSql,
    "q26_simhash_buckets" -> simhashBucketsSql)
}
