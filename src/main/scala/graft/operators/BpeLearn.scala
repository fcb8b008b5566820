package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Distributed BPE merge learning — the byte-pair-encoding training
  * loop (Sennrich et al., "Neural Machine Translation of Rare Words
  * with Subword Units") a tokenizer pipeline runs before it can count
  * tokens at all. q38 applies a pre-tokenizer; this learns the merge
  * table itself.
  *
  * Scale shape — the part that matters at 100 TB: BPE trains on the
  * (distinct pre-token, frequency) table, NOT the corpus. The corpus
  * is read exactly once ([[wordFreqs]]: explode + one count shuffle);
  * every merge round after that iterates over the vocabulary table —
  * bounded by language (≈1e6 rows at any corpus size) — with a
  * map-side pair explode, one small aggregation, and a map-side
  * symbol rewrite. Driver state is one chosen merge per round (the
  * same bounded-plan pattern as the k-means and chunk-rebalance
  * planners). No word-boundary marker symbol is used — merges are
  * intra-word (documented divergence from implementations that add
  * `</w>`; deterministic on both engines).
  */
object BpeLearn {

  /** Pre-token frequency table — the ONLY corpus-sized pass. Same
    * `\w+|[^\w\s]` pre-tokenizer as q38, lowercased (case-folded BPE
    * vocabularies are the common choice and keep the pair space
    * dense).
    */
  def wordFreqs(docs: DataFrame): DataFrame =
    docs.select(explode(regexp_extract_all(lower(col("text")),
        lit("\\w+|[^\\w\\s]"), lit(0))).as("word"))
      .groupBy(col("word")).agg(count(lit(1)).as("freq"))

  /** Char-level starting point of the merge loop. */
  def initialSymbols(freqs: DataFrame): DataFrame =
    freqs.select(split(col("word"), "").as("symbols"), col("freq"))

  /** Adjacent-pair counts over a (symbols, freq) vocabulary table:
    * map-side explode of len-1 pairs per word, one aggregation.
    */
  def pairCounts(words: DataFrame): DataFrame = {
    val n = size(col("symbols"))
    words.select(col("freq"),
        explode(when(n >= 2,
          transform(sequence(lit(1), greatest(n - 1, lit(1))),
            i => struct(element_at(col("symbols"), i).as("l"),
              element_at(col("symbols"), i + 1).as("r"))))
          .otherwise(array().cast(
            "array<struct<l:string,r:string>>"))).as("p"))
      .groupBy(col("p.l").as("left_sym"), col("p.r").as("right_sym"))
      .agg(sum(col("freq")).as("cnt"))
  }

  /** Rewrite symbol arrays replacing adjacent (l, r) with the merged
    * symbol, greedy left-to-right (the classic BPE application order:
    * after a merge the new symbol can immediately pair with the next
    * input symbol, and "aaa" under (a,a) yields [aa, a]).
    */
  def applyMerge(words: DataFrame, l: String, r: String): DataFrame =
    words.select(
      aggregate(col("symbols"), array().cast("array<string>"),
        (acc, x) => when(size(acc) > 0 &&
            element_at(acc, -1) === lit(l) && x === lit(r),
          concat(slice(acc, lit(1), size(acc) - 1),
            array(concat_ws("", element_at(acc, -1), x))))
          .otherwise(concat(acc, array(x)))).as("symbols"),
      col("freq"))

  final case class Merge(left: String, right: String, cnt: Long)

  /** Learn `k` merges. Ties break to the lexicographically smallest
    * (left, right) — deterministic across partitionings. Each round's
    * vocabulary is pinned (localCheckpoint) so round N+1 reads a
    * materialized table instead of replaying N rewrites.
    */
  def learnMerges(docs: DataFrame, k: Int): Seq[Merge] = {
    var words = initialSymbols(wordFreqs(docs)).localCheckpoint(true)
    val out = Seq.newBuilder[Merge]
    var done = false
    var round = 0
    while (round < k && !done) {
      val top = pairCounts(words)
        .orderBy(col("cnt").desc, col("left_sym"), col("right_sym"))
        .limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val m = Merge(top.head.getAs[String]("left_sym"),
          top.head.getAs[String]("right_sym"),
          top.head.getAs[Long]("cnt"))
        out += m
        val next = applyMerge(words, m.left, m.right)
          .localCheckpoint(true)
        words.unpersist()
        words = next
      }
      round += 1
    }
    out.result()
  }

  /** Production merge loop for large k: ONE distributed corpus census
    * ([[wordFreqs]] — the only corpus-sized pass), then the remaining
    * merge rounds run on the driver over the collected vocabulary.
    * The vocabulary is bounded by language, not corpus (≈1e6 distinct
    * pre-tokens at any scale), so the collect is a few tens of MB —
    * while a 30k-merge train through [[learnMerges]] would be 30k
    * Spark job round-trips (hours of scheduler latency for seconds of
    * compute). Pair statistics update incrementally: each round
    * touches only the words containing the chosen pair (subword-nmt's
    * index structure), not the whole vocabulary.
    *
    * Deterministically identical to [[learnMerges]]: same greedy
    * left-to-right rewrite, same (cnt desc, left asc, right asc)
    * selection with string order compared as unsigned UTF-8 bytes —
    * Spark's binary string ordering, not Java's UTF-16 compareTo.
    */
  def learnMergesLocal(docs: DataFrame, k: Int): Seq[Merge] = {
    val census = wordFreqs(docs).collect()
    learnLocalFromVocab(
      census.map(r => (r.getAs[String]("word"), r.getAs[Long]("freq"))),
      k)
  }

  /** Spark UTF8String ordering: unsigned byte-wise over UTF-8. */
  private def utf8Lt(a: String, b: String): Boolean = {
    val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var i = 0
    val n = math.min(x.length, y.length)
    while (i < n) {
      val c = (x(i) & 0xff) - (y(i) & 0xff)
      if (c != 0) return c < 0
      i += 1
    }
    x.length < y.length
  }

  /** [[applyMerge]]'s rewrite, driver-side: greedy left-to-right. */
  private def mergeWord(syms: Array[String], l: String,
      r: String): Array[String] = {
    val out = scala.collection.mutable.ArrayBuffer[String]()
    var i = 0
    while (i < syms.length) {
      val x = syms(i)
      if (out.nonEmpty && out.last == l && x == r)
        out(out.length - 1) = out.last + x
      else out += x
      i += 1
    }
    out.toArray
  }

  /** The merge loop over an in-memory (word, freq) vocabulary. */
  def learnLocalFromVocab(vocab: Array[(String, Long)],
      k: Int): Seq[Merge] = {
    import scala.collection.mutable
    val syms = vocab.map { case (w, _) => w.split("") }
    val freq = vocab.map(_._2)
    val stats = mutable.Map[(String, String), Long]()
    // pair → word ids that contained it when last indexed (lazy: a
    // stale id is harmless — its subtract/re-add cancels out)
    val index = mutable.Map[(String, String), mutable.Set[Int]]()

    def contrib(wid: Int, sign: Long): Unit = {
      val s = syms(wid)
      var i = 0
      while (i < s.length - 1) {
        val p = (s(i), s(i + 1))
        val next = stats.getOrElse(p, 0L) + sign * freq(wid)
        if (next == 0L) stats.remove(p) else stats(p) = next
        if (sign > 0)
          index.getOrElseUpdate(p, mutable.Set[Int]()) += wid
        i += 1
      }
    }
    syms.indices.foreach(contrib(_, 1L))

    val out = Seq.newBuilder[Merge]
    var round = 0
    while (round < k && stats.nonEmpty) {
      val (bl, br) = stats.foldLeft(("", ""), Long.MinValue) {
        case (best @ ((cl, cr), ccnt), (p @ (l, r), cnt)) =>
          if (cnt > ccnt || (cnt == ccnt && (utf8Lt(l, cl) ||
              (l == cl && utf8Lt(r, cr))))) (p, cnt)
          else best
      }._1
      out += Merge(bl, br, stats((bl, br)))
      val touched = index.getOrElse((bl, br), mutable.Set[Int]())
        .toArray
      touched.foreach { wid =>
        contrib(wid, -1L)
        syms(wid) = mergeWord(syms(wid), bl, br)
        contrib(wid, 1L)
      }
      index.remove((bl, br)): Unit
      round += 1
    }
    out.result()
  }

  // ---------------------------------------------------------------- q106
  /** First-round pair counts — the corpus-wide statistic the first BPE
    * merge argmaxes over. Emitting every pair (the char-pair space is
    * alphabet-bounded) keeps the output set deterministic — no
    * tie-broken top-N boundary.
    */
  def bpePairCounts(spark: SparkSession, dir: String): DataFrame =
    pairCounts(initialSymbols(wordFreqs(Tables.documents(spark, dir))))

  val bpePairCountsSql: String =
    """WITH words AS (
      |  SELECT word, count(*) AS freq FROM (
      |    SELECT unnest(regexp_extract_all(lower(text),
      |      '\w+|[^\w\s]')) AS word
      |    FROM documents) GROUP BY 1),
      |pairs AS (
      |  SELECT substring(word, i, 1) AS left_sym,
      |    substring(word, i + 1, 1) AS right_sym, freq
      |  FROM (SELECT word, freq,
      |      unnest(range(1, length(word))) AS i FROM words))
      |SELECT left_sym, right_sym, SUM(freq)::BIGINT AS cnt
      |FROM pairs GROUP BY 1, 2""".stripMargin

  /** Apply a learned merge table to the corpus: per-doc BPE token
    * count through the native [[graft.functions.BpeEncode]] expression
    * (rank-greedy merge application with a per-task word cache).
    * Spec-only — iterative merge application has no reasonable SQL
    * form; its correctness pins to hand-computed encodings and to
    * vocabulary-state conservation against [[learnMerges]].
    */
  def tokenCounts(docs: DataFrame,
      merges: Seq[(String, String)]): DataFrame =
    docs.select(col("doc_id"),
      size(graft.functions.GraftFunctions.bpeEncode(col("text"),
        merges)).cast("long").as("n_bpe_tokens"))

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q106_bpe_pairs" -> (bpePairCounts _))

  val oracles: Map[String, String] = Map(
    "q106_bpe_pairs" -> bpePairCountsSql)
}
