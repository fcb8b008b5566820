package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.Tables

/** Corpus-hygiene operators — the decision layer of a dedup pipeline.
  *
  * q35/q46 FIND near-duplicates; these operators decide what to DO with
  * them: measure asymmetric containment (a doc swallowed by a larger
  * one is a dup even when symmetric Jaccard is low), elect the canonical
  * representative of each duplicate cluster, grade the ANN index that
  * generated the candidates, compress the embedding column for the
  * 100 TB index, and report what a purge would remove.
  *
  * Cross-engine determinism: every score is derived from exact integer
  * counts (shingle-intersection cardinalities, scaled-integer vector
  * arithmetic, character counts), so the DuckDB oracle hash-compares
  * bit-for-bit — doubles appear only as final per-row ratios of those
  * integers.
  */
object HygieneOps {

  import FuzzyDedup.{shingleHashes, shingleHashesSql}

  // ---------------------------------------------------------------- q88
  /** Asymmetric containment over the LSH candidate pairs: for each
    * (doc_a, doc_b) the MinHash bands propose, the exact shingle
    * intersection size and `containment` = |A∩B| / min(|A|,|B|). A
    * short document quoted inside a long one has low Jaccard (the union
    * is dominated by the long doc) but containment ≈ 1 — the dup class
    * symmetric q34 scoring systematically under-ranks. `contained`
    * gates at ≥ 0.9 with integer arithmetic (n·10 ≥ 9·min).
    *
    * Scale shape: shingle rows join to the candidate-pair list FIRST,
    * so only shingles of docs that appear in some candidate pair ever
    * shuffle — candidate-pair × shingle rows, never the corpus × corpus
    * hash self-join of q34. All joins carry (long, long) keys.
    */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    containmentPairsOf(Tables.documents(spark, dir),
      FuzzyDedup.minhashLsh(spark, dir))

  def containmentPairsOf(docs: DataFrame, candidates: DataFrame)
      : DataFrame = {
    // pin the candidate pairs once: they feed the doc semi-join AND the
    // pair join below, and recomputing them would re-run the LSH
    val cand = candidates.select(col("doc_a"), col("doc_b"))
      .localCheckpoint(true)
    // tokenize ONCE: only docs that appear in some candidate pair are
    // exploded (side-a/side-b joins drop all others anyway), and the
    // exploded frame is pinned so both join sides and the size
    // aggregate read it instead of re-running tokenize+explode per
    // consumer — this was the heaviest stage, run twice
    val candDocs = cand.select(col("doc_a").as("doc_id"))
      .union(cand.select(col("doc_b").as("doc_id"))).distinct()
    val ex = docs.join(candDocs, Seq("doc_id"), "left_semi")
      .select(col("doc_id"),
        explode(shingleHashes(col("text"))).as("h"))
      .localCheckpoint(true)
    // shingleHashes is distinct-per-doc => count(*) = |A ∩ B|
    val sizes = ex.groupBy(col("doc_id")).agg(count(lit(1)).as("n_sh"))
    val common = cand
      .join(ex.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .join(ex.select(col("doc_id").as("doc_b"), col("h")),
        Seq("doc_b", "h"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_common"))
    common
      .join(sizes.select(col("doc_id").as("doc_a"),
        col("n_sh").as("n_a")), "doc_a")
      .join(sizes.select(col("doc_id").as("doc_b"),
        col("n_sh").as("n_b")), "doc_b")
      .select(col("doc_a"), col("doc_b"), col("n_common"),
        col("n_a"), col("n_b"),
        (col("n_common").cast("double") /
          least(col("n_a"), col("n_b"))).as("containment"),
        (col("n_common") * 10 >= least(col("n_a"), col("n_b")) * 9)
          .as("contained"))
  }

  val containmentPairsSql: String = {
    val sh = shingleHashesSql("text")
    s"""WITH cand AS (SELECT doc_a, doc_b
       |  FROM (${FuzzyDedup.minhashLshSql})),
       |d AS (SELECT doc_id, $sh AS sh FROM documents),
       |sizes AS (SELECT doc_id, len(sh) AS n_sh FROM d),
       |ex AS (SELECT doc_id, unnest(sh) AS h FROM d),
       |common AS (
       |  SELECT cand.doc_a, cand.doc_b, count(*) AS n_common
       |  FROM cand
       |  JOIN ex ea ON ea.doc_id = cand.doc_a
       |  JOIN ex eb ON eb.doc_id = cand.doc_b AND eb.h = ea.h
       |  GROUP BY 1, 2)
       |SELECT doc_a, doc_b, n_common, sa.n_sh AS n_a, sb.n_sh AS n_b,
       |  CAST(n_common AS DOUBLE) / least(sa.n_sh, sb.n_sh)
       |    AS containment,
       |  n_common * 10 >= least(sa.n_sh, sb.n_sh) * 9 AS contained
       |FROM common
       |JOIN sizes sa ON sa.doc_id = doc_a
       |JOIN sizes sb ON sb.doc_id = doc_b""".stripMargin
  }

  // ---------------------------------------------------------------- q89
  /** Canonical-representative election: every document maps to the
    * representative of its near-duplicate component (q46) — the member
    * with the MOST characters, ties toward the smaller doc_id. Keeping
    * the longest member (not the min-id label) is the standard curation
    * choice: truncated or boilerplate-stripped copies lose to the full
    * document.
    *
    * Scale shape: after label propagation, one aggregation of
    * (component, n_chars, doc_id) triples elects winners via
    * max(struct) — no window, no per-component sort — and the winner
    * table (≤ one row per component) joins back by component key.
    */
  def dupCanonical(spark: SparkSession, dir: String): DataFrame =
    dupCanonicalOf(Tables.documents(spark, dir),
      CurationOps.dedupGroups(spark, dir))

  def dupCanonicalOf(docs: DataFrame, comps: DataFrame): DataFrame = {
    val labeled = comps.join(
      docs.select(col("doc_id"), col("n_chars")), "doc_id")
    val canon = labeled.groupBy(col("component"))
      .agg(max(struct(col("n_chars").as("len"),
        (-col("doc_id")).as("neg_id"))).as("m"))
      .select(col("component"), (-col("m.neg_id")).as("canonical_id"))
    labeled.join(canon, "component")
      .select(col("doc_id"), col("component"), col("canonical_id"),
        (col("doc_id") === col("canonical_id")).as("is_canonical"))
  }

  val dupCanonicalSql: String =
    s"""WITH RECURSIVE ${CurationOps.dedupGroupsCtes},
       |labeled AS (SELECT c.doc_id, c.component, d.n_chars
       |  FROM comps c JOIN documents d USING (doc_id)),
       |canon AS (SELECT component, doc_id AS canonical_id FROM (
       |    SELECT component, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM labeled) WHERE rn = 1)
       |SELECT l.doc_id, l.component, canon.canonical_id,
       |  l.doc_id = canon.canonical_id AS is_canonical
       |FROM labeled l JOIN canon USING (component)""".stripMargin

  // ---------------------------------------------------------------- q90
  /** ANN index quality gate: recall@10 of the IVF search (q76) against
    * the exact brute-force top-10 (q40) for the same query set. A
    * pipeline that dedups via approximate neighbors must measure this
    * before trusting the index — `n_hits` counts exact neighbors the
    * IVF probe recovered, per query.
    *
    * Scale shape: both inputs are top-k results — k rows per query —
    * so the comparison join and aggregation touch k·|queries| rows no
    * matter the corpus size. (The expensive exact side runs over a
    * query SAMPLE at scale; grading a sample is the standard recall
    * protocol.)
    */
  def annRecall(spark: SparkSession, dir: String): DataFrame = {
    val exact = VectorOps.knn(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val approx = VectorOps.ivfSearch(spark, dir)
      .select(col("query_id"), col("neighbor_id"))
    val hits = exact.join(approx, Seq("query_id", "neighbor_id"))
      .groupBy(col("query_id")).agg(count(lit(1)).as("n_hits"))
    exact.groupBy(col("query_id")).agg(count(lit(1)).as("k"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"), col("k"),
        coalesce(col("n_hits"), lit(0L)).as("n_hits"),
        (coalesce(col("n_hits"), lit(0L)).cast("double") / col("k"))
          .as("recall"))
  }

  val annRecallSql: String =
    s"""WITH exact AS (SELECT query_id, neighbor_id
       |  FROM (${VectorOps.knnSql})),
       |approx AS (SELECT query_id, neighbor_id
       |  FROM (${VectorOps.ivfSearchSql})),
       |hits AS (SELECT query_id, count(*) AS n_hits
       |  FROM exact JOIN approx USING (query_id, neighbor_id)
       |  GROUP BY 1),
       |ks AS (SELECT query_id, count(*) AS k FROM exact GROUP BY 1)
       |SELECT ks.query_id, ks.k,
       |  COALESCE(hits.n_hits, 0)::BIGINT AS n_hits,
       |  CAST(COALESCE(hits.n_hits, 0) AS DOUBLE) / ks.k AS recall
       |FROM ks LEFT JOIN hits USING (query_id)""".stripMargin

  // ---------------------------------------------------------------- q91
  /** Symmetric int8 scalar quantization of the embedding column — the
    * compression step that shrinks a 100 TB float index 4× before IVF
    * sharding. Per vector: codes q_i = floor(x_i·127 / maxabs) over the
    * pre-scaled integer vector (floor-division via pmod keeps negatives
    * exact and engine-identical), plus the exact reconstruction-error
    * mass `err_sum` = Σ (x_i·127 mod maxabs) — the integer residue the
    * floor discarded, in units of scaled-input·127.
    *
    * Scale shape: pure per-row map, no shuffle; everything stays in one
    * projection. The per-element lambdas are interpreted (Spark HOFs
    * don't codegen) but allocation-free and branch-free.
    */
  def quantizeInt8(spark: SparkSession, dir: String): DataFrame =
    quantizeInt8Of(Tables.embeddings(spark, dir))

  def quantizeInt8Of(emb: DataFrame): DataFrame = {
    val xs = VectorOps.intVec(col("embedding"))
    emb.select(col("vec_id"), xs.as("xs"))
      .withColumn("maxabs",
        greatest(array_max(transform(col("xs"), x => abs(x))), lit(1L)))
      .withColumn("qs", transform(col("xs"), x => {
        val a = x * 127
        ((a - pmod(a, col("maxabs"))) / col("maxabs")).cast(LongType)
      }))
      .select(col("vec_id"), col("maxabs"),
        array_min(col("qs")).as("q_min"),
        array_max(col("qs")).as("q_max"),
        aggregate(transform(col("xs"),
            x => pmod(x * 127, col("maxabs"))),
          lit(0L), (acc, e) => acc + e).as("err_sum"))
  }

  val quantizeInt8Sql: String = {
    val xs = VectorOps.intVecSql("embedding")
    // DuckDB % is truncation-signed; ((a % m) + m) % m = Spark pmod
    def pm(a: String) = s"((($a) % maxabs + maxabs) % maxabs)"
    s"""WITH v AS (SELECT vec_id, $xs AS xs FROM embeddings),
       |m AS (SELECT vec_id, xs, greatest(
       |    list_aggregate(list_transform(xs, x -> abs(x)), 'max'),
       |    CAST(1 AS BIGINT)) AS maxabs FROM v),
       |q AS (SELECT vec_id, maxabs,
       |    list_transform(xs,
       |      x -> CAST((x*127 - ${pm("x*127")}) / maxabs AS BIGINT))
       |      AS qs,
       |    list_transform(xs, x -> ${pm("x*127")}) AS errs
       |  FROM m)
       |SELECT vec_id, maxabs,
       |  list_aggregate(qs, 'min') AS q_min,
       |  list_aggregate(qs, 'max') AS q_max,
       |  list_reduce(list_prepend(CAST(0 AS BIGINT), errs),
       |    (acc, x) -> acc + x) AS err_sum
       |FROM q""".stripMargin
  }

  // ---------------------------------------------------------------- q92
  /** The purge report — what near-dup removal (keep canonical members
    * only, q89) does to the corpus, per language: document and
    * character counts before/after. This is the end-to-end composition
    * a curation run actually ships: MinHash bands (q35) → components
    * (q46) → canonical election (q89) → purge accounting.
    *
    * Scale shape: the canonical mapping is (doc_id, bool) pairs; the
    * final aggregation groups by the low-cardinality lang key.
    */
  /** Shared per-language purge accounting: docs × canonical verdicts
    * → before/after document and character counts. One definition for
    * q92/q150/q151 so the report shape can never drift between the
    * all-pairs, star, and verified chains.
    */
  private def purgeReport(docs: DataFrame, canon: DataFrame)
      : DataFrame =
    docs.select(col("doc_id"), col("lang"), col("n_chars"))
      .join(canon.select(col("doc_id"), col("is_canonical")), "doc_id")
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("is_canonical"), 1L).otherwise(0L))
          .as("n_docs_kept"),
        sum(col("n_chars")).as("chars_total"),
        sum(when(col("is_canonical"), col("n_chars")).otherwise(0L))
          .as("chars_kept"))

  /** Components over an (a, b) edge frame → election → purge report —
    * the shared tail of the star chains (q150/q151).
    */
  private def purgeFromEdges(docs: DataFrame, edges: DataFrame)
      : DataFrame = {
    val comps = CurationOps.connectedComponents(
        docs.select(col("doc_id").as("v")),
        edges.select(col("a"), col("b")))
      .select(col("v").as("doc_id"), col("label").as("component"))
    purgeReport(docs, dupCanonicalOf(docs, comps))
  }

  def dedupPurge(spark: SparkSession, dir: String): DataFrame =
    purgeReport(Tables.documents(spark, dir),
      dupCanonical(spark, dir))

  val dedupPurgeSql: String =
    s"""WITH RECURSIVE ${CurationOps.dedupGroupsCtes},
       |labeled AS (SELECT c.doc_id, c.component, d.n_chars
       |  FROM comps c JOIN documents d USING (doc_id)),
       |canon AS (SELECT component, doc_id AS canonical_id FROM (
       |    SELECT component, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM labeled) WHERE rn = 1),
       |marked AS (SELECT l.doc_id, l.doc_id = canon.canonical_id
       |    AS is_canonical
       |  FROM labeled l JOIN canon USING (component))
       |SELECT d.lang, count(*) AS n_docs,
       |  SUM(CASE WHEN m.is_canonical THEN 1 ELSE 0 END)::BIGINT
       |    AS n_docs_kept,
       |  SUM(d.n_chars)::BIGINT AS chars_total,
       |  SUM(CASE WHEN m.is_canonical THEN d.n_chars ELSE 0 END)::BIGINT
       |    AS chars_kept
       |FROM documents d JOIN marked m USING (doc_id)
       |GROUP BY 1""".stripMargin

  // ---------------------------------------------------------------- q150
  /** q92's purge report computed from the LINEAR star-edge candidate
    * set (q149) instead of the all-pairs banding — the shape a 100 TB
    * run must use (the sf10 sweep measured the all-pairs candidate set
    * growing 108× for 10× documents; the star set is linear by
    * construction and keeps bucket diameter at 2 so label propagation
    * converges exactly as it does on all-pairs). The ORACLE is
    * deliberately the all-pairs q92 SQL, verbatim: star edges connect
    * exactly the components the full pair set does, so a value-equal
    * gate here IS the cross-engine proof of that equivalence at the
    * gate sf, on top of the DedupSpec frame-equality assertion.
    */
  def dedupPurgeScaled(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
    purgeFromEdges(docs, FuzzyDedup.lshStarEdgesOf(docs))
  }

  // ---------------------------------------------------------------- q151
  /** The full production near-dup purge pipeline at its 100 TB shape:
    * linear star edges (q149) → edit-distance confirmation on those
    * edges only (the q129 gate: lev·5 ≤ max_len ⟺ ≥80% normalized
    * similarity) → connected components over CONFIRMED edges →
    * longest-member canonical election → per-language purge
    * accounting. Everything row-scaled is linear in the corpus: the
    * Levenshtein budget is one call per star edge (≤ docs × n_bands),
    * not per banded pair — each member verifies against its bucket's
    * representative, the standard verify-against-representative
    * production choice.
    *
    * Semantics note (vs q150): a failed confirmation DETACHES a
    * member from its star where the all-pairs set might still connect
    * it through another member, so this is the stricter,
    * verification-gated clustering — the oracle mirrors the same star
    * construction, it does not claim all-pairs equivalence.
    */
  def verifiedPurgeScaled(spark: SparkSession, dir: String)
      : DataFrame = {
    val docs = Tables.documents(spark, dir)
    val texts = docs.select(col("doc_id"),
        TextOps.normText(col("text")).as("t"))
      .withColumn("len", length(col("t")).cast("long"))
      .localCheckpoint(false)
    val confirmed = FuzzyDedup.lshStarEdgesOf(docs)
      .join(texts.select(col("doc_id").as("a"), col("t").as("ta"),
        col("len").as("la")), Seq("a"))
      .join(texts.select(col("doc_id").as("b"), col("t").as("tb"),
        col("len").as("lb")), Seq("b"))
      .filter(levenshtein(col("ta"), col("tb")).cast("long") * 5 <=
        greatest(col("la"), col("lb")))
      .select(col("a"), col("b"))
    purgeFromEdges(docs, confirmed)
  }

  val verifiedPurgeScaledSql: String = {
    val norm = TextOps.normTextSql("text")
    s"""WITH RECURSIVE
       |edges AS (${FuzzyDedup.lshStarEdgesSql}),
       |t AS (SELECT doc_id, $norm AS t,
       |  CAST(length($norm) AS BIGINT) AS len FROM documents),
       |conf AS (SELECT e.a, e.b FROM edges e
       |  JOIN t ta ON e.a = ta.doc_id
       |  JOIN t tb ON e.b = tb.doc_id
       |  WHERE CAST(levenshtein(ta.t, tb.t) AS BIGINT) * 5 <=
       |    greatest(ta.len, tb.len)),
       |e2 AS (SELECT a, b FROM conf UNION SELECT b, a FROM conf),
       |reach(v, r) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e2.b, reach.r FROM e2 JOIN reach ON reach.v = e2.a),
       |comps AS (SELECT v AS doc_id, min(r) AS component
       |  FROM reach GROUP BY v),
       |labeled AS (SELECT c.doc_id, c.component, d.n_chars
       |  FROM comps c JOIN documents d USING (doc_id)),
       |canon AS (SELECT component, doc_id AS canonical_id FROM (
       |    SELECT component, doc_id, ROW_NUMBER() OVER (
       |      PARTITION BY component
       |      ORDER BY n_chars DESC, doc_id) AS rn
       |    FROM labeled) WHERE rn = 1),
       |marked AS (SELECT l.doc_id, l.doc_id = canon.canonical_id
       |    AS is_canonical
       |  FROM labeled l JOIN canon USING (component))
       |SELECT d.lang, count(*) AS n_docs,
       |  SUM(CASE WHEN m.is_canonical THEN 1 ELSE 0 END)::BIGINT
       |    AS n_docs_kept,
       |  SUM(d.n_chars)::BIGINT AS chars_total,
       |  SUM(CASE WHEN m.is_canonical THEN d.n_chars ELSE 0 END)::BIGINT
       |    AS chars_kept
       |FROM documents d JOIN marked m USING (doc_id)
       |GROUP BY 1""".stripMargin
  }

  // ---------------------------------------------------------------- q105
  /** Exact duplicated-substring spans — the exact-substring dedup form
    * (Lee et al., "Deduplicating Training Data Makes Language Models
    * Better"), re-expressed over positional word 5-grams instead of a
    * suffix array: a token position is duplicated when the 5-gram
    * starting there occurs more than once in the corpus (same doc or
    * another); overlapping or adjacent duplicated positions merge into
    * maximal spans; each document reports its span count, covered
    * token budget, and the permille of its tokens inside some
    * duplicated span (the quantity exact-substring dedup would cut).
    *
    * Scale shape: POSITIONAL gram hashes (unlike q34's distinct
    * shingle sets) explode map-side through the same codegen charFold
    * leaf as q34/q35; the duplicate set reduces to one 64-bit hash per
    * repeated gram before joining back; the span merge is a
    * gaps-and-islands window PARTITIONED BY doc_id (never global); and
    * only (long, int) pairs shuffle — gram strings never leave the
    * mapper.
    */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    dupSpansOf(Tables.documents(spark, dir))

  def dupSpansOf(docs: DataFrame, n: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(n == 5, "native positional shingle expression is 5-gram")
    // one native pass per document: element i of the array is the
    // hash of the gram starting at token i (no gram strings built,
    // no interpreted HOF chain) — cross-checked against the composed
    // transform(slice…charFold) form in GraftExpressionsSpec
    val grams = docs.select(col("doc_id"),
      posexplode(graft.functions.GraftFunctions
        .shingleHashesPos(col("text"))).as(Seq("s", "h")))
    val dup = grams.groupBy(col("h"))
      .agg(count(lit(1)).as("c")).filter(col("c") > 1).select(col("h"))
    val hits = grams.join(dup, "h")
      .select(col("doc_id"), col("s"), (col("s") + (n - 1)).as("e"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMaxE = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val isl = hits
      .withColumn("brk", when(prevMaxE.isNull ||
        col("s") > prevMaxE + 1, 1).otherwise(0))
      .withColumn("isl", sum(col("brk"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = isl.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("ee"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("ee") - col("ss") + 1).as("dup_tokens"))
    docs.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("dup_tokens"), lit(0L)).as("dup_tokens"),
        expr("coalesce(dup_tokens, 0L) * 1000 div n_tokens")
          .as("dup_permille"))
  }

  val dupSpansSql: String = {
    val toks = TextOps.tokensSql("text")
    // the gram string materializes under its own name BEFORE charFold:
    // charFoldSql's transform lambda binds `i`, which would capture the
    // positional unnest alias inside the slice otherwise
    s"""WITH base AS (SELECT doc_id, $toks AS w FROM documents),
       |g AS (SELECT doc_id,
       |    unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i, w
       |  FROM base),
       |gr AS (SELECT doc_id, i - 1 AS s, i + 3 AS e,
       |    array_to_string(w[i:i+4], ' ') AS gram
       |  FROM g),
       |grams AS (SELECT doc_id, s, e,
       |    ${TextOps.charFoldSql("gram")} AS h
       |  FROM gr),
       |dup AS (SELECT h FROM grams GROUP BY h HAVING count(*) > 1),
       |hits AS (SELECT doc_id, s, e FROM grams JOIN dup USING (h)),
       |marked AS (SELECT doc_id, s, e,
       |    MAX(e) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_e
       |  FROM hits),
       |isl AS (SELECT doc_id, s, e,
       |    SUM(CASE WHEN prev_e IS NULL OR s > prev_e + 1
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s) AS isl
       |  FROM marked),
       |spans AS (SELECT doc_id, isl, MIN(s) AS ss, MAX(e) AS ee
       |  FROM isl GROUP BY 1, 2),
       |per_doc AS (SELECT doc_id, count(*) AS n_spans,
       |    SUM(ee - ss + 1) AS dup_tokens FROM spans GROUP BY 1)
       |SELECT b.doc_id, len(b.w)::BIGINT AS n_tokens,
       |  COALESCE(p.n_spans, 0)::BIGINT AS n_spans,
       |  COALESCE(p.dup_tokens, 0)::BIGINT AS dup_tokens,
       |  (COALESCE(p.dup_tokens, 0) * 1000 // len(b.w))::BIGINT
       |    AS dup_permille
       |FROM base b LEFT JOIN per_doc p USING (doc_id)""".stripMargin
  }

  // ---------------------------------------------------------------- q114
  /** Cross-corpus exact-substring decontamination: the q105 span
    * machinery pointed at TRAIN-vs-EVAL instead of within-corpus — for
    * each training document, the merged spans of its token stream
    * whose 5-grams also occur anywhere in the held-out set (here:
    * `source == 'src0'` stands in for the eval benchmark). This is the
    * span-level "does my training data contain the test set"
    * memorization gate (GPT-3 appendix C / Lee et al. 2022): dropping
    * or masking the spans, not whole documents, preserves the
    * surrounding clean text.
    *
    * Scale shape: eval grams reduce to a DISTINCT 64-bit hash set
    * (benchmark-sized, far smaller than the corpus) and join the
    * train gram stream on the hash — gram strings never materialize,
    * and the only corpus-sized shuffle carries (hash, doc, pos)
    * longs. Span merge stays per-doc (gaps-and-islands window over
    * doc-partitioned positions).
    */
  def contamSpans(spark: SparkSession, dir: String): DataFrame =
    contamSpansOf(Tables.documents(spark, dir))

  def contamSpansOf(docs: DataFrame, evalSource: String = "src0")
      : DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val train = docs.filter(col("source") =!= evalSource)
    val evalGrams = docs.filter(col("source") === evalSource)
      .select(explode(graft.functions.GraftFunctions
        .shingleHashesPos(col("text"))).as("h"))
      .distinct()
    val tGrams = train.select(col("doc_id"),
      posexplode(graft.functions.GraftFunctions
        .shingleHashesPos(col("text"))).as(Seq("s", "h")))
    val hits = tGrams.join(evalGrams, "h")
      .select(col("doc_id"), col("s"), (col("s") + 4).as("e"))
    val byDoc = Window.partitionBy(col("doc_id")).orderBy(col("s"))
    val prevMaxE = max(col("e"))
      .over(byDoc.rowsBetween(Window.unboundedPreceding, -1))
    val isl = hits
      .withColumn("brk", when(prevMaxE.isNull ||
        col("s") > prevMaxE + 1, 1).otherwise(0))
      .withColumn("isl", sum(col("brk"))
        .over(byDoc.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = isl.groupBy(col("doc_id"), col("isl"))
      .agg(min(col("s")).as("ss"), max(col("e")).as("ee"))
    val perDoc = spans.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_spans"),
        sum(col("ee") - col("ss") + 1).as("contam_tokens"))
    train.select(col("doc_id"),
        size(TextOps.tokens(col("text"))).cast("long").as("n_tokens"))
      .join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"), col("n_tokens"),
        coalesce(col("n_spans"), lit(0L)).as("n_spans"),
        coalesce(col("contam_tokens"), lit(0L)).as("contam_tokens"),
        expr("coalesce(contam_tokens, 0L) * 1000 div n_tokens")
          .as("contam_permille"))
  }

  val contamSpansSql: String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH base AS (SELECT doc_id, source, $toks AS w FROM documents),
       |g AS (SELECT doc_id, source,
       |    unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i, w
       |  FROM base),
       |gr AS (SELECT doc_id, source, i - 1 AS s, i + 3 AS e,
       |    array_to_string(w[i:i+4], ' ') AS gram
       |  FROM g),
       |grams AS (SELECT doc_id, source, s, e,
       |    ${TextOps.charFoldSql("gram")} AS h
       |  FROM gr),
       |ev AS (SELECT DISTINCT h FROM grams WHERE source = 'src0'),
       |hits AS (SELECT doc_id, s, e FROM grams JOIN ev USING (h)
       |  WHERE source <> 'src0'),
       |marked AS (SELECT doc_id, s, e,
       |    MAX(e) OVER (PARTITION BY doc_id ORDER BY s
       |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
       |      AS prev_e
       |  FROM hits),
       |isl AS (SELECT doc_id, s, e,
       |    SUM(CASE WHEN prev_e IS NULL OR s > prev_e + 1
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY doc_id ORDER BY s) AS isl
       |  FROM marked),
       |spans AS (SELECT doc_id, isl, MIN(s) AS ss, MAX(e) AS ee
       |  FROM isl GROUP BY 1, 2),
       |per_doc AS (SELECT doc_id, count(*) AS n_spans,
       |    SUM(ee - ss + 1) AS contam_tokens FROM spans GROUP BY 1)
       |SELECT b.doc_id, len(b.w)::BIGINT AS n_tokens,
       |  COALESCE(p.n_spans, 0)::BIGINT AS n_spans,
       |  COALESCE(p.contam_tokens, 0)::BIGINT AS contam_tokens,
       |  (COALESCE(p.contam_tokens, 0) * 1000 // len(b.w))::BIGINT
       |    AS contam_permille
       |FROM base b LEFT JOIN per_doc p USING (doc_id)
       |WHERE b.source <> 'src0'""".stripMargin
  }

  // ---------------------------------------------------------------- q118
  /** Winnowing document fingerprints (Schleimer, Wilkerson & Aiken 2003
    * — the MOSS local fingerprinting algorithm): over the positional
    * 5-gram rolling hashes (the q105 leaf), every window of
    * [[WinnowWindow]] consecutive gram hashes contributes its minimum
    * hash — rightmost position on ties, the paper's robust-winnowing
    * choice — and the distinct selected (position, hash) pairs are the
    * document's fingerprints. Guarantee: any match of at least
    * w + 5 − 1 = 8 consecutive tokens between two documents shares at
    * least one fingerprint, so fingerprint equality is a LOCAL overlap
    * witness (it says where, unlike MinHash's set-level signature)
    * at a bounded ≈ 2/(w+1) fingerprint density.
    *
    * Scale shape: entirely map-side per document — the selection runs
    * in the native [[graft.functions.WinnowFingerprints]] expression
    * (one monotonic-deque pass over the gram hashes, O(grams), with
    * within-document dedup built in), so the final plan has NO shuffle
    * at all: no gram-stream explode, no window operator, no distinct
    * exchange. The composed array-HOF form below is kept as the
    * cross-checked reference implementation; the oracle is the
    * explode+group form of the same selection.
    */
  val WinnowWindow = 4

  def winnow(spark: SparkSession, dir: String): DataFrame =
    winnowOf(Tables.fanout(spark, Tables.documents(spark, dir)))

  def winnowOf(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        explode(graft.functions.GraftFunctions
          .winnowFingerprints(col("text"))).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))

  /** Reference implementation via composed built-ins (interpreted HOF
    * fold per window) — cross-checked against the native expression in
    * GraftExpressionsSpec.
    */
  def winnowOfComposed(docs: DataFrame): DataFrame = {
    val w = WinnowWindow
    val base = docs.select(col("doc_id"),
        graft.functions.GraftFunctions.shingleHashesPos(col("text"))
          .as("hs"))
      .withColumn("ng", size(col("hs")))
      .filter(col("ng") > 0)
    base.select(col("doc_id"),
        explode(transform(
          sequence(lit(0), greatest(col("ng") - w, lit(0))),
          wi => {
            val mh = array_min(slice(col("hs"), wi + 1, lit(w)))
            struct(
              aggregate(
                sequence(wi, least(wi + (w - 1), col("ng") - 1)),
                lit(-1L),
                (acc, i) => when(
                  element_at(col("hs"), (i + 1).cast("int")) === mh,
                  i.cast("long")).otherwise(acc)).as("pos"),
              mh.as("h"))
          })).as("fp"))
      .select(col("doc_id"), col("fp.pos").as("pos"), col("fp.h").as("h"))
      .distinct()
  }

  val winnowSql: String = {
    val toks = TextOps.tokensSql("text")
    s"""WITH base AS (SELECT doc_id, $toks AS w FROM documents),
       |g AS (SELECT doc_id,
       |    unnest(range(1, greatest(len(w) - 4, 0) + 1)) AS i, w
       |  FROM base),
       |gr AS (SELECT doc_id, i - 1 AS s, len(w) - 4 AS ng,
       |    array_to_string(w[i:i+4], ' ') AS gram
       |  FROM g),
       |grams AS (SELECT doc_id, s, ng,
       |    ${TextOps.charFoldSql("gram")} AS h
       |  FROM gr),
       |wnd AS (SELECT doc_id, s, h, s - d.d AS win
       |  FROM grams, (SELECT unnest(range(0, 4)) AS d) d
       |  WHERE s - d.d >= 0 AND s - d.d <= greatest(ng - 4, 0)),
       |mins AS (SELECT doc_id, win, min(h) AS mh
       |  FROM wnd GROUP BY 1, 2),
       |sel AS (SELECT w.doc_id, w.win, max(w.s) AS pos, w.h
       |  FROM wnd w JOIN mins m
       |    ON w.doc_id = m.doc_id AND w.win = m.win AND w.h = m.mh
       |  GROUP BY w.doc_id, w.win, w.h)
       |SELECT DISTINCT doc_id, CAST(pos AS BIGINT) AS pos, h
       |FROM sel""".stripMargin
  }

  // ---------------------------------------------------------------- q122
  /** Winnowing match pairs — the MOSS detection step on top of q118:
    * document pairs sharing at least [[WinnowMinShared]] fingerprints,
    * with the shared count and the leftmost matched token position on
    * each side (the span hint a review UI jumps to). Because
    * fingerprints are LOCAL (each is a specific window's minimum at a
    * specific position), a match pair here means "these two documents
    * share verbatim runs", not just similar vocabularies — the
    * localized complement of q35's MinHash candidates.
    *
    * Scale shape: the self-join is keyed by the 64-bit fingerprint
    * hash — the same bucketed-candidate discipline as q35/q45 (never
    * corpus×corpus), over a frame already thinned to ≈ 2/(w+1) of
    * token positions; the fingerprint frame is pinned with
    * localCheckpoint so both join sides consume one materialization
    * (the FuzzyDedup rule). Hub hashes are bounded by the winnowing
    * density, and the ≥2-fingerprint gate kills single-gram noise.
    */
  val WinnowMinShared = 2

  def winnowMatches(spark: SparkSession, dir: String): DataFrame =
    winnowMatchesOf(Tables.documents(spark, dir))

  def winnowMatchesOf(docs: DataFrame,
      minShared: Int = WinnowMinShared): DataFrame = {
    val fp = winnowOf(docs).localCheckpoint(true)
    val a = fp.select(col("doc_id").as("doc_a"), col("pos").as("pos_a"),
      col("h"))
    val b = fp.select(col("doc_id").as("doc_b"), col("pos").as("pos_b"),
      col("h"))
    a.join(b, Seq("h")).filter(col("doc_a") < col("doc_b"))
      .groupBy(col("doc_a"), col("doc_b"))
      .agg(countDistinct(col("h")).as("n_shared"),
        min(col("pos_a")).as("min_pos_a"),
        min(col("pos_b")).as("min_pos_b"))
      .filter(col("n_shared") >= minShared)
  }

  val winnowMatchesSql: String =
    s"""WITH fp AS ($winnowSql)
       |SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       |  CAST(count(DISTINCT a.h) AS BIGINT) AS n_shared,
       |  CAST(min(a.pos) AS BIGINT) AS min_pos_a,
       |  CAST(min(b.pos) AS BIGINT) AS min_pos_b
       |FROM fp a JOIN fp b ON a.h = b.h AND a.doc_id < b.doc_id
       |GROUP BY 1, 2
       |HAVING count(DISTINCT a.h) >= $WinnowMinShared""".stripMargin

  // -----------------------------------------------------------------
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q88_containment" -> (containmentPairs _),
    "q89_dup_canonical" -> (dupCanonical _),
    "q90_ann_recall" -> (annRecall _),
    "q91_quantize_int8" -> (quantizeInt8 _),
    "q92_dedup_purge" -> (dedupPurge _),
    "q150_star_purge" -> (dedupPurgeScaled _),
    "q151_verified_purge" -> (verifiedPurgeScaled _),
    "q105_dup_spans" -> (dupSpans _),
    "q114_contam_spans" -> (contamSpans _),
    "q118_winnowing" -> (winnow _),
    "q122_winnow_matches" -> (winnowMatches _))

  val oracles: Map[String, String] = Map(
    "q88_containment" -> containmentPairsSql,
    "q89_dup_canonical" -> dupCanonicalSql,
    "q90_ann_recall" -> annRecallSql,
    "q91_quantize_int8" -> quantizeInt8Sql,
    "q92_dedup_purge" -> dedupPurgeSql,
    // the all-pairs q92 oracle, on purpose: the value-equal gate is the
    // cross-engine proof that chain edges build identical components
    "q150_star_purge" -> dedupPurgeSql,
    "q151_verified_purge" -> verifiedPurgeScaledSql,
    "q105_dup_spans" -> dupSpansSql,
    "q114_contam_spans" -> contamSpansSql,
    "q118_winnowing" -> winnowSql,
    "q122_winnow_matches" -> winnowMatchesSql)
}
