package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Text-analysis operators for training-data pipelines: tokenization,
  * quality scoring, language ID, document fingerprinting, exact dedup.
  *
  * Everything here is pure `org.apache.spark.sql.functions` higher-order
  * expressions — whole-stage-codegen-friendly, no UDFs, no driver loops —
  * and arithmetically replicable in ANSI SQL so every operator has an exact
  * DuckDB oracle. At 100 TB these are embarrassingly parallel per-row maps:
  * no shuffle at all until a groupBy (dedup) — which shuffles only the
  * 64-bit fingerprint, not the text.
  */
object TextOps {

  /** Rolling-hash modulus: < 1e15 so acc*31+x stays well inside int64. */
  final val FoldP = 999999999999989L

  /** Whitespace tokens of trimmed text. */
  def tokens(c: Column): Column = split(trim(c), "\\s+")

  def tokensSql(e: String): String = s"string_split_regex(trim($e), '\\s+')"

  /** Polynomial rolling hash over the characters of a string:
    * fold acc = (acc*31 + codepoint) % FoldP. The document-fingerprinting
    * primitive; also the leaf hash for MinHash/SimHash. Matches
    * `charFoldSql` digit for digit.
    *
    * Evaluates through the native codegen expression
    * [[graft.functions.CharFold]] (registered by Tables.load); the
    * composed HOF form below is kept as the cross-checked reference
    * implementation.
    */
  def charFold(c: Column): Column =
    graft.functions.GraftFunctions.charFold(c)

  /** Reference implementation via composed built-ins (interpreted; O(n²)
    * through substr) — used to cross-check the native expression.
    */
  def charFoldHof(c: Column): Column =
    aggregate(
      transform(sequence(lit(1), greatest(length(c), lit(1))),
        i => ascii(substr(c, i, lit(1))).cast("long")),
      lit(0L),
      (acc, x) => pmod(acc * lit(31L) + x, lit(FoldP)))

  def charFoldSql(e: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), list_transform(" +
      s"range(1, greatest(length($e),1)+1), " +
      s"i -> ord(substring($e, i, 1)))), " +
      s"(acc, x) -> (acc*31 + x) % $FoldP)"

  /** Normalized text: lowercase, trimmed, whitespace collapsed. */
  def normText(c: Column): Column =
    regexp_replace(lower(trim(c)), "\\s+", " ")

  def normTextSql(e: String): String =
    s"regexp_replace(lower(trim($e)), '\\s+', ' ', 'g')"

  // ---------------------------------------------------------------- q30
  /** Token counting + quality scoring: length/punctuation/stopword ratios
    * (per-row double arithmetic only — deterministic across engines).
    */
  def textStats(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.fanout(spark, Tables.documents(spark, dir))
    val toks = tokens(col("text"))
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    val nTokens = size(toks)
    val nChars = length(col("text"))
    val nPunct = length(regexp_replace(col("text"), "[^.,;:!?]", ""))
    val nStop = size(filter(toks,
      t => t.isin(stop.map(s => s: Any): _*)))
    d.select(
      col("doc_id"),
      nTokens.as("n_tokens"),
      nChars.as("n_chars_txt"),
      nPunct.as("n_punct"),
      nStop.as("n_stopwords"),
      (nStop.cast("double") / nTokens).as("stop_ratio"),
      (nPunct.cast("double") / nChars).as("punct_ratio"),
      (nChars.cast("double") / nTokens).as("avg_token_span"))
  }

  val textStatsSql: String = {
    val toks = tokensSql("text")
    """SELECT doc_id,
      |  len(TOKS) AS n_tokens,
      |  length(text) AS n_chars_txt,
      |  length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS n_punct,
      |  len(list_filter(TOKS, t -> t IN ('the','a','of','to','and','in','is'))) AS n_stopwords,
      |  CAST(len(list_filter(TOKS, t -> t IN ('the','a','of','to','and','in','is'))) AS DOUBLE) / len(TOKS) AS stop_ratio,
      |  CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / length(text) AS punct_ratio,
      |  CAST(length(text) AS DOUBLE) / len(TOKS) AS avg_token_span
      |FROM documents""".stripMargin.replace("TOKS", toks)
  }

  // ---------------------------------------------------------------- q31
  /** Language ID by marker-word voting (n-gram/stopword heuristic).
    * Deterministic argmax with a fixed precedence order on ties.
    */
  private val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "and", "of", "is", "to"),
    "fr" -> Seq("le", "la", "les", "et", "de"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "es" -> Seq("el", "los", "las", "y", "es"))

  /** Plan shape: explode tokens once, then conditional sums. A per-row
    * `size(filter(toks,…))` per language looks natural but is quadratically
    * worse: Catalyst's project-collapse inlines the interpreted filter HOF
    * into every argmax comparison that references it (~16 recomputations
    * of the regex split per row — measured 30s+ on sf0.1). The explode +
    * aggregate form is a codegen barrier: tokenization runs exactly once,
    * the marker counts partial-aggregate map-side, and the shuffle carries
    * one (doc_id, 4 ints) row per doc per partition.
    */
  def langId(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val tok = d.select(col("doc_id"), col("lang").as("labeled_lang"),
      explode(tokens(lower(col("text")))).as("t"))
    val langs = langMarkers.map(_._1)
    val aggs = langMarkers.map { case (lang, words) =>
      sum(when(col("t").isin(words.map(w => w: Any): _*), 1).otherwise(0))
        .as(s"c_$lang")
    }
    val counts = tok.groupBy(col("doc_id"), col("labeled_lang"))
      .agg(aggs.head, aggs.tail: _*)
    val best = langs.foldRight(lit("und")) { (lang, elseCol) =>
      val others = langs.filterNot(_ == lang).map(o => col(s"c_$o"))
      val isMax = others.map(col(s"c_$lang") >= _).reduce(_ && _) &&
        col(s"c_$lang") > 0
      when(isMax, lit(lang)).otherwise(elseCol)
    }
    counts.select(col("doc_id"), col("labeled_lang"),
      col("c_en"), col("c_fr"), col("c_de"), col("c_es"),
      best.as("pred_lang"))
  }

  val langIdSql: String = {
    val toks = tokensSql("lower(text)")
    def cnt(words: Seq[String]) =
      s"len(list_filter($toks, t -> t IN (" +
        words.map(w => s"'$w'").mkString(",") + ")))"
    val cs = langMarkers.map { case (l, ws) => s"${cnt(ws)} AS c_$l" }
    val langs = langMarkers.map(_._1)
    val best = langs.foldRight("'und'") { (lang, acc) =>
      val others = langs.filterNot(_ == lang).map(o => s"c_$lang >= c_$o")
      s"CASE WHEN ${others.mkString(" AND ")} AND c_$lang > 0 " +
        s"THEN '$lang' ELSE $acc END"
    }
    s"""WITH c AS (SELECT doc_id, lang AS labeled_lang, ${cs.mkString(", ")}
       |FROM documents)
       |SELECT doc_id, labeled_lang, c_en, c_fr, c_de, c_es,
       |  $best AS pred_lang
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- q32
  /** Document fingerprint: rolling hash of normalized text. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      charFold(normText(col("text"))).as("fingerprint"))

  val fingerprintSql: String =
    s"""SELECT doc_id, ${charFoldSql(normTextSql("text"))} AS fingerprint
       |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q33
  /** Exact dedup: re-ingestion scenario — the corpus unioned with a
    * shifted copy of itself; group by normalized-text fingerprint, keep the
    * lowest doc_id. Only the 64-bit fingerprint shuffles, never the text.
    */
  def dedupExact(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir).select(col("doc_id"), col("text"))
    val doubled = d.unionByName(
      d.withColumn("doc_id", col("doc_id") + 10000L))
    doubled
      .withColumn("fp", charFold(normText(col("text"))))
      .groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keep_id"),
        count(lit(1)).as("n_copies"),
        max(col("doc_id")).as("max_dup_id"))
      .select(col("keep_id"), col("n_copies"), col("max_dup_id"))
  }

  val dedupExactSql: String = {
    val fp = charFoldSql(normTextSql("text"))
    s"""WITH u AS (
       |  SELECT doc_id, text FROM documents
       |  UNION ALL SELECT doc_id + 10000, text FROM documents)
       |SELECT min(doc_id) AS keep_id, count(*) AS n_copies,
       |  max(doc_id) AS max_dup_id
       |FROM (SELECT doc_id, $fp AS fp FROM u)
       |GROUP BY fp""".stripMargin
  }

  // ---------------------------------------------------------------- q37
  /** Corpus curation: keep documents passing quality thresholds (the
    * filter stage of a training-data pipeline). Thresholds on per-row
    * deterministic stats only.
    */
  def qualityFilter(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val toks = tokens(col("text"))
    val nTokens = size(toks)
    val nChars = length(col("text"))
    val avgTok = nChars.cast("double") / nTokens
    d.withColumn("n_tokens", nTokens)
      .withColumn("avg_token_span", avgTok)
      .filter(col("n_tokens") >= 20 &&
        col("avg_token_span") >= 4.0 && col("avg_token_span") <= 8.0)
      .select(col("doc_id"), col("lang"), col("n_tokens"),
        col("avg_token_span"))
  }

  val qualityFilterSql: String = {
    val toks = tokensSql("text")
    s"""SELECT doc_id, lang, len($toks) AS n_tokens,
       |  CAST(length(text) AS DOUBLE) / len($toks) AS avg_token_span
       |FROM documents
       |WHERE len($toks) >= 20
       |  AND CAST(length(text) AS DOUBLE) / len($toks) >= 4.0
       |  AND CAST(length(text) AS DOUBLE) / len($toks) <= 8.0""".stripMargin
  }

  // ---------------------------------------------------------------- q95
  /** Fixed-weight quality-classifier head over the q30 feature set —
    * the step after measuring signals (q30) and hard-gating them (q37):
    * a linear score combining stopword density, punctuation density and
    * token-span shape into one per-document quality number, bucketed
    * into deciles for mixture planning (q96 consumes per-bucket counts
    * in real pipelines). Everything stays in EXACT integer milli-units
    * — permille features, integer weights, floor division — because a
    * sigmoid would drag in libm exp, which differs across engines at
    * the ulp level and breaks hash-exact oracles; the monotone logit
    * carries the same ranking information. Per-row map, zero shuffle,
    * survives any scale-up untouched.
    */
  def qualityLogit(spark: SparkSession, dir: String): DataFrame =
    withQualitySignals(Tables.documents(spark, dir)
      .select(col("doc_id"), col("text")))
      .select(col("doc_id"), col("stop_permille"), col("punct_permille"),
        col("span_centi"), col("logit_milli"), col("quality_bucket"),
        col("keep"))

  /** Frame form of q95: append the quality-head columns to ANY frame
    * with a `text` column (batch or streaming — every expression is a
    * per-row map, so the same head gates a micro-batch in
    * [[graft.streaming.StreamingCuration]] and the q95 batch oracle).
    * Input columns ride along untouched; `text` stays available for
    * downstream stages.
    */
  def withQualitySignals(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val stop = Seq("the", "a", "of", "to", "and", "in", "is")
    docs
      .withColumn("n_tokens", size(toks).cast("long"))
      .withColumn("n_chars_txt", length(col("text")).cast("long"))
      .withColumn("n_punct",
        length(regexp_replace(col("text"), "[^.,;:!?]", "")).cast("long"))
      .withColumn("n_stop",
        size(filter(toks, t => t.isin(stop.map(s => s: Any): _*)))
          .cast("long"))
      .withColumn("stop_permille",
        when(col("n_tokens") > 0,
          expr("n_stop * 1000 div n_tokens")).otherwise(lit(0L)))
      .withColumn("punct_permille",
        when(col("n_chars_txt") > 0,
          expr("n_punct * 1000 div n_chars_txt")).otherwise(lit(0L)))
      .withColumn("span_centi",
        when(col("n_tokens") > 0,
          expr("n_chars_txt * 100 div n_tokens")).otherwise(lit(0L)))
      .withColumn("logit_milli",
        lit(800L) + lit(3L) * col("stop_permille") -
          lit(2L) * col("punct_permille") -
          abs(col("span_centi") - lit(550L)))
      // div truncates toward zero, DuckDB // floors: they differ only
      // below zero, where greatest(0, ·) clamps both to bucket 0
      .withColumn("quality_bucket",
        least(lit(9L), greatest(lit(0L), expr("logit_milli div 200"))))
      .withColumn("keep", col("quality_bucket") >= 3)
      .drop("n_tokens", "n_chars_txt", "n_punct", "n_stop")
  }

  val qualityLogitSql: String = {
    val toks = tokensSql("text")
    """WITH f AS (SELECT doc_id,
      |    CAST(len(TOKS) AS BIGINT) AS n_tokens,
      |    CAST(length(text) AS BIGINT) AS n_chars_txt,
      |    CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g'))
      |      AS BIGINT) AS n_punct,
      |    CAST(len(list_filter(TOKS,
      |      t -> t IN ('the','a','of','to','and','in','is')))
      |      AS BIGINT) AS n_stop
      |  FROM documents),
      |g AS (SELECT doc_id,
      |    CASE WHEN n_tokens > 0 THEN n_stop * 1000 // n_tokens
      |      ELSE 0 END AS stop_permille,
      |    CASE WHEN n_chars_txt > 0 THEN n_punct * 1000 // n_chars_txt
      |      ELSE 0 END AS punct_permille,
      |    CASE WHEN n_tokens > 0 THEN n_chars_txt * 100 // n_tokens
      |      ELSE 0 END AS span_centi
      |  FROM f),
      |h AS (SELECT doc_id, stop_permille, punct_permille, span_centi,
      |    800 + 3 * stop_permille - 2 * punct_permille
      |      - abs(span_centi - 550) AS logit_milli
      |  FROM g)
      |SELECT doc_id, stop_permille, punct_permille, span_centi,
      |  logit_milli,
      |  least(9, greatest(0, logit_milli // 200)) AS quality_bucket,
      |  least(9, greatest(0, logit_milli // 200)) >= 3 AS keep
      |FROM h""".stripMargin.replace("TOKS", toks)
  }

  // ---------------------------------------------------------------- q100
  /** Top-bigram mass per document — the Gopher repetition gate q59
    * doesn't cover: q59 asks "how many trigrams repeat at all", this
    * asks "how much of the document is ONE phrase" (boilerplate
    * headers, keyword stuffing, generation loops stuck on a phrase).
    * Reported as the most frequent bigram's share of all bigram slots,
    * with the 0.2 Gopher-style flag. Exact-integer counts; the share
    * is one IEEE division.
    *
    * Shape: token rows → `lead` bigrams (codegen) → per-(doc, bigram)
    * hash aggregate → per-doc argmax via one more max(struct)
    * aggregate — deterministic smallest-bigram tie-break, no window,
    * so a skewed boilerplate bigram never single-slots a sort. Docs
    * with <2 tokens survive via the left join with zero mass.
    */
  def topNgramMass(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.documents(spark, dir)
    val toks = d.select(col("doc_id"),
      posexplode(tokens(normText(col("text")))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val bigrams = toks
      .withColumn("nxt", lead(col("tok"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("nxt")).as("bigram"))
    val counts = bigrams.groupBy(col("doc_id"), col("bigram"))
      .agg(count(lit(1)).as("cnt"))
    // argmax with ties to the LEXICOGRAPHICALLY SMALLEST bigram: there
    // is no "negate a string", so rank bigrams by (cnt, reverse order)
    // via min over a struct of (-cnt, bigram)
    val top = counts.groupBy(col("doc_id"))
      .agg(min(struct((-col("cnt")).as("neg_cnt"), col("bigram")))
          .as("m"),
        sum(col("cnt")).as("n_bigrams"))
      .select(col("doc_id"), col("m.bigram").as("top_bigram"),
        (-col("m.neg_cnt")).as("top_count"), col("n_bigrams"))
    d.select(col("doc_id")).join(top, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("top_bigram"), lit("")).as("top_bigram"),
        coalesce(col("top_count"), lit(0L)).as("top_count"),
        coalesce(col("n_bigrams"), lit(0L)).as("n_bigrams"))
      .withColumn("top_frac",
        when(col("n_bigrams") > 0,
          col("top_count").cast("double") /
            col("n_bigrams").cast("double")).otherwise(lit(0.0)))
      .withColumn("flagged", col("top_frac") > 0.2)
  }

  val topNgramMassSql: String = {
    val toks = tokensSql(normTextSql("text"))
    s"""WITH d AS (SELECT doc_id, $toks AS toks FROM documents),
       |bg AS (SELECT doc_id, unnest(list_transform(
       |    range(1, greatest(len(toks) - 1, 0) + 1),
       |    i -> list_extract(toks, i) || ' ' || list_extract(toks, i + 1)))
       |    AS bigram FROM d),
       |c AS (SELECT doc_id, bigram, count(*) AS cnt FROM bg GROUP BY 1, 2),
       |t AS (SELECT doc_id,
       |    min(struct_pack(neg_cnt := -cnt, bigram := bigram)) AS m,
       |    CAST(sum(cnt) AS BIGINT) AS n_bigrams
       |  FROM c GROUP BY 1)
       |SELECT d.doc_id,
       |  coalesce(t.m.bigram, '') AS top_bigram,
       |  CAST(coalesce(-t.m.neg_cnt, 0) AS BIGINT) AS top_count,
       |  coalesce(t.n_bigrams, 0) AS n_bigrams,
       |  CASE WHEN coalesce(t.n_bigrams, 0) > 0 THEN
       |    CAST(-t.m.neg_cnt AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE)
       |  ELSE 0.0 END AS top_frac,
       |  (CASE WHEN coalesce(t.n_bigrams, 0) > 0 THEN
       |    CAST(-t.m.neg_cnt AS DOUBLE) / CAST(t.n_bigrams AS DOUBLE)
       |  ELSE 0.0 END) > 0.2 AS flagged
       |FROM d LEFT JOIN t ON d.doc_id = t.doc_id""".stripMargin
  }

  // ---------------------------------------------------------------- q38
  /** BPE-ish tokenization: word pieces vs punctuation pieces via the
    * `\w+|[^\w\s]` split every byte-pair pre-tokenizer starts from.
    */
  def bpeTokens(spark: SparkSession, dir: String): DataFrame = {
    val d = Tables.documents(spark, dir)
    val words = size(regexp_extract_all(col("text"), lit("\\w+"), lit(0)))
    val punct = size(regexp_extract_all(col("text"),
      lit("[^\\w\\s]"), lit(0)))
    d.select(col("doc_id"), words.as("n_word_tokens"),
      punct.as("n_punct_tokens"),
      (words + punct).as("n_tokens"))
  }

  val bpeTokensSql: String =
    """SELECT doc_id,
      |  len(regexp_extract_all(text, '\w+')) AS n_word_tokens,
      |  len(regexp_extract_all(text, '[^\w\s]')) AS n_punct_tokens,
      |  len(regexp_extract_all(text, '\w+')) +
      |    len(regexp_extract_all(text, '[^\w\s]')) AS n_tokens
      |FROM documents""".stripMargin

  // ---------------------------------------------------------------- q59
  /** Repetition-quality signal: the duplicate word-trigram fraction per
    * document — the standard repetition filter for web text (a high
    * ratio marks boilerplate/generated loops). The ratio is one double
    * division over exact integers, so both engines agree bitwise.
    *
    * Shape: posexplode the token array ONCE, then form trigrams with
    * `lead` windows — all codegen. The per-row HOF form (transform over
    * sequence + slice) re-evaluated the tokenize subtree per reference
    * under CollapseProject inlining and ran 19 s at sf0.1; this plan is
    * sub-second. Documents shorter than 3 tokens survive via the left
    * join (0 trigrams, ratio 0).
    */
  def repetitionStats(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = graft.Tables.fanout(spark,
      graft.Tables.documents(spark, dir))
    val toks = d.select(col("doc_id"),
      posexplode(tokens(normText(col("text")))).as(Seq("pos", "tok")))
    val w = Window.partitionBy(col("doc_id")).orderBy(col("pos"))
    val tris = toks
      .withColumn("t1", lead(col("tok"), 1).over(w))
      .withColumn("t2", lead(col("tok"), 2).over(w))
      .filter(col("t2").isNotNull)
      .select(col("doc_id"),
        concat_ws(" ", col("tok"), col("t1"), col("t2")).as("tri"))
    val stats = tris.groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_trigrams"),
        countDistinct(col("tri")).as("n_distinct"))
    d.select(col("doc_id")).join(stats, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_trigrams"), lit(0L)).as("n_trigrams"),
        coalesce(col("n_distinct"), lit(0L)).as("n_distinct"))
      .withColumn("dup_ratio",
        when(col("n_trigrams") > 0,
          (col("n_trigrams") - col("n_distinct")).cast("double") /
            col("n_trigrams").cast("double"))
          .otherwise(lit(0.0)))
      .withColumn("flagged", col("dup_ratio") > 0.2)
  }

  val repetitionStatsSql: String = {
    val toks = tokensSql(normTextSql("text"))
    s"""WITH t AS (SELECT doc_id, $toks AS toks FROM documents),
       |tr AS (SELECT doc_id,
       |    CASE WHEN len(toks) >= 3 THEN list_transform(
       |        range(1, greatest(len(toks) - 2, 1) + 1),
       |        i -> array_to_string(toks[i:i+2], ' '))
       |      ELSE [] END AS tris FROM t)
       |SELECT doc_id,
       |  CAST(len(tris) AS BIGINT) AS n_trigrams,
       |  CAST(len(list_distinct(tris)) AS BIGINT) AS n_distinct,
       |  CASE WHEN len(tris) > 0 THEN
       |    CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE) /
       |      CAST(len(tris) AS DOUBLE)
       |  ELSE 0.0 END AS dup_ratio,
       |  (CASE WHEN len(tris) > 0 THEN
       |    CAST(len(tris) - len(list_distinct(tris)) AS DOUBLE) /
       |      CAST(len(tris) AS DOUBLE)
       |  ELSE 0.0 END) > 0.2 AS flagged
       |FROM tr""".stripMargin
  }

  // ---------------------------------------------------------------- q77
  /** PII patterns shared by the redactor and its DuckDB mirror — plain
    * character-class regexes, identical semantics under Java regex and
    * RE2.
    */
  final val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  final val PiiPhone = "\\+1-555-[0-9]{4}"
  final val PiiIp = "([0-9]{1,3}\\.){3}[0-9]{1,3}"
  final val PiiSsn = "[0-9]{3}-[0-9]{2}-[0-9]{4}"

  /** Redact PII in a text column: mask emails, phone numbers, IPv4
    * addresses, and SSN-shaped ids, in that order (email first so its
    * digits can't be re-matched; phone before SSN so the longer shape
    * wins). Map-only, codegen — the standard curation pass before
    * training-data release.
    */
  def piiRedact(c: Column): Column = {
    val e = regexp_replace(c, PiiEmail, "<EMAIL>")
    val p = regexp_replace(e, PiiPhone, "<PHONE>")
    val i = regexp_replace(p, PiiIp, "<IP>")
    regexp_replace(i, PiiSsn, "<ID>")
  }

  /** q77 — PII scan + redaction over `documents`. The corpus text is
    * synthetic word salad, so a deterministic contact block derived from
    * doc_id is appended first (same expression mirrored in the oracle);
    * the engine-checked outputs are the per-kind match counts and the
    * rolling-hash digest of the redacted text.
    */
  def piiRedactQuery(spark: SparkSession, dir: String): DataFrame = {
    val d = graft.Tables.fanout(spark,
      graft.Tables.documents(spark, dir))
    def s(c: Column) = c.cast("string")
    val contact = concat(
      lit(" contact user"), s(col("doc_id")),
      lit("@mail"), s(pmod(col("doc_id"), lit(7))), lit(".org tel +1-555-"),
      lpad(s(pmod(col("doc_id"), lit(10000))), 4, "0"),
      lit(" ip 10."), s(pmod(col("doc_id"), lit(256))),
      lit("."), s(pmod(col("doc_id") * 7, lit(256))),
      lit("."), s(pmod(col("doc_id") * 13, lit(256))),
      lit(" ssn "), lpad(s(pmod(col("doc_id"), lit(1000))), 3, "0"),
      lit("-"), lpad(s(pmod(col("doc_id"), lit(100))), 2, "0"),
      lit("-"), lpad(s(pmod(col("doc_id"), lit(10000))), 4, "0"))
    d.withColumn("full", concat(col("text"), contact))
      .select(col("doc_id"),
        regexp_count(col("full"), lit(PiiEmail)).as("n_emails"),
        regexp_count(col("full"), lit(PiiPhone)).as("n_phones"),
        regexp_count(col("full"), lit(PiiIp)).as("n_ips"),
        regexp_count(col("full"), lit(PiiSsn)).as("n_ssns"),
        charFold(piiRedact(col("full"))).as("red_fp"))
  }

  val piiRedactSql: String = {
    // DuckDB single-quoted strings keep backslashes literal, so the
    // Scala pattern values embed verbatim
    val email = s"'$PiiEmail'"
    val phone = s"'$PiiPhone'"
    val ip = s"'$PiiIp'"
    val ssn = s"'$PiiSsn'"
    val red = s"regexp_replace(regexp_replace(regexp_replace(" +
      s"regexp_replace(txt, $email, '<EMAIL>', 'g'), " +
      s"$phone, '<PHONE>', 'g'), $ip, '<IP>', 'g'), $ssn, '<ID>', 'g')"
    s"""WITH d AS (SELECT doc_id, text ||
       |    ' contact user' || CAST(doc_id AS VARCHAR) ||
       |    '@mail' || CAST(doc_id % 7 AS VARCHAR) || '.org tel +1-555-' ||
       |    lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') ||
       |    ' ip 10.' || CAST(doc_id % 256 AS VARCHAR) ||
       |    '.' || CAST((doc_id * 7) % 256 AS VARCHAR) ||
       |    '.' || CAST((doc_id * 13) % 256 AS VARCHAR) ||
       |    ' ssn ' || lpad(CAST(doc_id % 1000 AS VARCHAR), 3, '0') ||
       |    '-' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') ||
       |    '-' || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS txt
       |  FROM documents),
       |r AS (SELECT doc_id,
       |    CAST(len(regexp_extract_all(txt, $email)) AS INT) AS n_emails,
       |    CAST(len(regexp_extract_all(txt, $phone)) AS INT) AS n_phones,
       |    CAST(len(regexp_extract_all(txt, $ip)) AS INT) AS n_ips,
       |    CAST(len(regexp_extract_all(txt, $ssn)) AS INT) AS n_ssns,
       |    $red AS red FROM d)
       |SELECT doc_id, n_emails, n_phones, n_ips, n_ssns,
       |  ${charFoldSql("red")} AS red_fp FROM r""".stripMargin
  }

  // ---------------------------------------------------------------- q116
  /** Encoding-hygiene (mojibake) detection: flags text carrying the
    * classic double-encoded UTF-8 artifacts — 'Ã' sequences (Latin-1
    * bytes re-decoded as UTF-8), 'â€¦'-family punctuation ghosts, and
    * the U+FFFD replacement character a lossy transcode leaves behind.
    * The synthetic corpus is clean, so corruption is synthesized
    * deterministically from doc_id inside the query (the q110/q113
    * fixture-in-query pattern, identical on both engines) and then
    * detected from the corrupted text alone — the detector never sees
    * which branch built its input.
    *
    * Scale shape: map-only per-row string arithmetic (no regex, no
    * shuffle): occurrence counts via length-after-replace.
    */
  def mojibake(spark: SparkSession, dir: String): DataFrame =
    mojibakeOf(Tables.documents(spark, dir))

  def mojibakeOf(docs: DataFrame): DataFrame = {
    val corrupted = docs.select(col("doc_id"),
      expr("""CASE doc_id % 4
        WHEN 0 THEN replace(text, 'a', 'Ã¡')
        WHEN 1 THEN concat(text, ' â€” itâ€™s')
        WHEN 2 THEN replace(text, 'e', '�')
        ELSE text END""").as("raw"))
    val n = length(col("raw")).cast("long")
    val c1 = n - length(expr("replace(raw, 'Ã', '')")).cast("long")
    val c2 = expr("(length(raw) - length(replace(raw, 'â€', ''))) div 2")
      .cast("long")
    val c3 = n - length(expr("replace(raw, '�', '')")).cast("long")
    corrupted.select(col("doc_id"), n.as("n_chars_raw"),
        (c1 + c2 + c3).cast("long").as("n_mojibake"))
      .withColumn("mojibake_permille",
        expr("n_mojibake * 1000 div n_chars_raw"))
      .withColumn("is_clean", col("n_mojibake") === 0)
  }

  val mojibakeSql: String =
    """WITH raw AS (
      |  SELECT doc_id,
      |    CASE doc_id % 4
      |      WHEN 0 THEN replace(text, 'a', 'Ã¡')
      |      WHEN 1 THEN text || ' â€” itâ€™s'
      |      WHEN 2 THEN replace(text, 'e', '�')
      |      ELSE text END AS raw
      |  FROM documents),
      |sig AS (
      |  SELECT doc_id,
      |    CAST(length(raw) AS BIGINT) AS n_chars_raw,
      |    CAST(length(raw) - length(replace(raw, 'Ã', ''))
      |      + (length(raw) - length(replace(raw, 'â€', ''))) // 2
      |      + length(raw) - length(replace(raw, '�', ''))
      |      AS BIGINT) AS n_mojibake
      |  FROM raw)
      |SELECT doc_id, n_chars_raw, n_mojibake,
      |  CAST(n_mojibake * 1000 // n_chars_raw AS BIGINT)
      |    AS mojibake_permille,
      |  n_mojibake = 0 AS is_clean
      |FROM sig""".stripMargin

  // ---------------------------------------------------------------- q120
  /** The Gopher rule battery (Rae et al. 2021, appendix A1.1) as named
    * per-document boolean gates — the published heuristic suite most
    * curation pipelines start from, kept as individual flags (not one
    * verdict) so a pipeline can tune or ablate rules independently:
    * word-count bounds, mean-word-length band, symbol-to-word ratio,
    * bullet-start / ellipsis-end line fractions, alphabetic-word
    * fraction, and minimum stop-word evidence.
    *
    * Thresholds are the paper's; arithmetic stays in exact integers
    * against scaled thresholds (ratio ≤ 0.1 becomes 10·count ≤ words)
    * so both engines agree bit-for-bit. Map-only, zero shuffle.
    */
  def gopherRules(spark: SparkSession, dir: String): DataFrame =
    gopherRulesOf(Tables.fanout(spark, Tables.documents(spark, dir)))

  private val gopherStops = Seq("the", "be", "to", "of", "and",
    "that", "have", "with")

  def gopherRulesOf(docs: DataFrame): DataFrame = {
    val toks = tokens(col("text"))
    val nWords = size(toks).cast("long")
    // sum of word lengths via the aggregate HOF (exact integers)
    val charSum = aggregate(transform(toks, t => length(t).cast("long")),
      lit(0L), (a, x) => a + x)
    val nHash = length(col("text")) -
      length(expr("replace(text, '#', '')"))
    val nEll = expr(
      "(length(text) - length(replace(text, '...', ''))) div 3")
    val lines = split(col("text"), "\n")
    val nLines = size(lines).cast("long")
    val nBullet = size(filter(lines, l =>
      substring(ltrim(l), 1, 1).isin("•", "-", "*"))).cast("long")
    val nEllEnd = size(filter(lines, l => l.endsWith("...")))
      .cast("long")
    val nAlpha = size(filter(toks, t => t.rlike("[A-Za-z]")))
      .cast("long")
    val nStop = size(filter(toks,
      t => t.isin(gopherStops.map(s => s: Any): _*))).cast("long")
    docs.select(col("doc_id"), nWords.as("n_words"),
        charSum.as("char_sum"), (nHash + nEll).cast("long").as("n_sym"),
        nLines.as("n_lines"), nBullet.as("n_bullet"),
        nEllEnd.as("n_ell_end"), nAlpha.as("n_alpha"),
        nStop.as("n_stop"))
      .select(col("doc_id"),
        (col("n_words") >= 50 && col("n_words") <= 100000)
          .as("ok_word_count"),
        // 3 ≤ mean ≤ 10 without doubles: 3n ≤ Σlen ≤ 10n
        (col("char_sum") >= col("n_words") * 3 &&
          col("char_sum") <= col("n_words") * 10)
          .as("ok_mean_word_len"),
        (col("n_sym") * 10 <= col("n_words")).as("ok_symbol_ratio"),
        (col("n_bullet") * 10 <= col("n_lines") * 9)
          .as("ok_bullet_lines"),
        (col("n_ell_end") * 10 <= col("n_lines") * 3)
          .as("ok_ellipsis_lines"),
        (col("n_alpha") * 10 >= col("n_words") * 8)
          .as("ok_alpha_words"),
        (col("n_stop") >= 2).as("ok_stop_words"))
      .withColumn("passes_gopher",
        col("ok_word_count") && col("ok_mean_word_len") &&
          col("ok_symbol_ratio") && col("ok_bullet_lines") &&
          col("ok_ellipsis_lines") && col("ok_alpha_words") &&
          col("ok_stop_words"))
  }

  val gopherRulesSql: String = {
    val toks = tokensSql("text")
    val stops = gopherStops.map(s => s"'$s'").mkString(", ")
    s"""WITH f AS (
       |  SELECT doc_id,
       |    CAST(len($toks) AS BIGINT) AS n_words,
       |    CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
       |      list_transform($toks, t -> CAST(length(t) AS BIGINT))),
       |      (a, x) -> a + x) AS BIGINT) AS char_sum,
       |    CAST(length(text) - length(replace(text, '#', ''))
       |      + (length(text) - length(replace(text, '...', ''))) // 3
       |      AS BIGINT) AS n_sym,
       |    CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,
       |    CAST(len(list_filter(string_split(text, chr(10)),
       |      l -> substring(ltrim(l), 1, 1) IN ('•', '-', '*')))
       |      AS BIGINT) AS n_bullet,
       |    CAST(len(list_filter(string_split(text, chr(10)),
       |      l -> ends_with(l, '...'))) AS BIGINT) AS n_ell_end,
       |    CAST(len(list_filter($toks,
       |      t -> regexp_matches(t, '[A-Za-z]'))) AS BIGINT) AS n_alpha,
       |    CAST(len(list_filter($toks, t -> t IN ($stops)))
       |      AS BIGINT) AS n_stop
       |  FROM documents)
       |SELECT doc_id,
       |  n_words >= 50 AND n_words <= 100000 AS ok_word_count,
       |  char_sum >= n_words * 3 AND char_sum <= n_words * 10
       |    AS ok_mean_word_len,
       |  n_sym * 10 <= n_words AS ok_symbol_ratio,
       |  n_bullet * 10 <= n_lines * 9 AS ok_bullet_lines,
       |  n_ell_end * 10 <= n_lines * 3 AS ok_ellipsis_lines,
       |  n_alpha * 10 >= n_words * 8 AS ok_alpha_words,
       |  n_stop >= 2 AS ok_stop_words,
       |  n_words >= 50 AND n_words <= 100000
       |    AND char_sum >= n_words * 3 AND char_sum <= n_words * 10
       |    AND n_sym * 10 <= n_words
       |    AND n_bullet * 10 <= n_lines * 9
       |    AND n_ell_end * 10 <= n_lines * 3
       |    AND n_alpha * 10 >= n_words * 8
       |    AND n_stop >= 2 AS passes_gopher
       |FROM f""".stripMargin
  }

  // ---------------------------------------------------------------- q123
  /** Deterministic multi-line "web page" synthesized from a document —
    * the shared fixture for the line-level operators (q123 C4 rules,
    * q124 boilerplate census). The corpus text is single-line, so page
    * structure is built in-query (the q110/q113/q116 fixture-in-query
    * pattern): a recurring header/footer drawn from a 4-line boilerplate
    * pool, the body split into lines at ' a ' tokens (which also plants
    * terminal periods), and page-level defects (a javascript notice, a
    * lorem-ipsum marker, a stray code brace) keyed off doc_id residues.
    * Identical arithmetic on both engines; the detectors never see which
    * branch built their input.
    */
  private val pagePool = Seq(
    "subscribe to our newsletter.",
    "all rights reserved.",
    "privacy policy. terms of service.",
    "share this article.")

  def pageOf(docs: DataFrame): DataFrame = {
    val pool = pagePool.map(s => s"'$s'")
    docs.select(col("doc_id"), expr(
      s"""concat(
         |  CASE doc_id % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
         |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END, chr(10),
         |  replace(text, ' a ', concat('.', chr(10))), chr(10),
         |  CASE (doc_id + 2) % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
         |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END,
         |  CASE WHEN doc_id % 6 = 0
         |    THEN concat(chr(10), 'please enable javascript to view this page')
         |    ELSE '' END,
         |  CASE WHEN doc_id % 7 = 0
         |    THEN concat(chr(10), 'lorem ipsum dolor sit amet.')
         |    ELSE '' END,
         |  CASE WHEN doc_id % 11 = 0
         |    THEN concat(chr(10), 'function() {')
         |    ELSE '' END)""".stripMargin).as("page"))
  }

  def pageSql(from: String = "documents"): String = {
    val pool = pagePool.map(s => s"'$s'")
    s"""SELECT doc_id,
       |  CASE doc_id % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
       |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END || chr(10) ||
       |  replace(text, ' a ', '.' || chr(10)) || chr(10) ||
       |  CASE (doc_id + 2) % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
       |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END ||
       |  CASE WHEN doc_id % 6 = 0
       |    THEN chr(10) || 'please enable javascript to view this page'
       |    ELSE '' END ||
       |  CASE WHEN doc_id % 7 = 0
       |    THEN chr(10) || 'lorem ipsum dolor sit amet.'
       |    ELSE '' END ||
       |  CASE WHEN doc_id % 11 = 0
       |    THEN chr(10) || 'function() {'
       |    ELSE '' END AS page
       |FROM $from""".stripMargin
  }

  /** Paragraph-structured twin of [[pageOf]] for the paragraph-level
    * operators (q132): a recurring header/footer paragraph drawn from a
    * 4-paragraph chrome pool, the body split into paragraphs at ' a '
    * tokens, blank-line (\n\n) separated — the layout RefinedWeb-style
    * paragraph dedup operates on. Identical arithmetic on both engines.
    */
  private val paraPool = Seq(
    "subscribe to our newsletter today",
    "copyright all rights reserved",
    "cookie consent is required to continue",
    "follow us on social media")

  def paraOf(docs: DataFrame): DataFrame = {
    val pool = paraPool.map(s => s"'$s'")
    docs.select(col("doc_id"), expr(
      s"""concat(
         |  CASE doc_id % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
         |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END,
         |  chr(10), chr(10),
         |  replace(text, ' a ', concat(chr(10), chr(10))),
         |  chr(10), chr(10),
         |  CASE (doc_id + 1) % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
         |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END)""".stripMargin)
      .as("page"))
  }

  def paraSql(from: String = "documents"): String = {
    val pool = paraPool.map(s => s"'$s'")
    s"""SELECT doc_id,
       |  CASE doc_id % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
       |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END ||
       |  chr(10) || chr(10) ||
       |  replace(text, ' a ', chr(10) || chr(10)) ||
       |  chr(10) || chr(10) ||
       |  CASE (doc_id + 1) % 4 WHEN 0 THEN ${pool(0)} WHEN 1 THEN ${pool(1)}
       |    WHEN 2 THEN ${pool(2)} ELSE ${pool(3)} END AS page
       |FROM $from""".stripMargin
  }

  /** The C4 cleaning battery (Raffel et al. 2020 §2.2) as per-line and
    * per-page gates over the synthesized page: a line survives when it
    * has ≥ 5 words, ends in terminal punctuation, and doesn't mention
    * javascript; the page survives when it has ≥ 3 sentences and carries
    * neither a lorem-ipsum placeholder nor a code brace. Per-rule drop
    * counts stay independent (tune/ablate per rule, the q120 convention)
    * and the kept text collapses to a charFold fingerprint so C4's
    * follow-on three-sentence dedup is a q33 groupBy downstream.
    *
    * Scale shape: map-only — split, per-line filters, integer counts;
    * one 64-bit fingerprint per page leaves the mapper, never the text.
    */
  def c4Rules(spark: SparkSession, dir: String): DataFrame =
    c4RulesOf(Tables.fanout(spark, Tables.documents(spark, dir)))

  def c4RulesOf(docs: DataFrame): DataFrame = {
    val lines = transform(split(col("page"), "\n"), l => trim(l))
    val words = (l: Column) => size(split(l, "\\s+")).cast("long")
    val endsPunct = (l: Column) =>
      substring(l, -1, 1).isin(".", "!", "?", "\"")
    val hasJs = (l: Column) => l.contains("javascript")
    val keep = (l: Column) =>
      words(l) >= 5 && endsPunct(l) && !hasJs(l)
    val kept = filter(lines, keep)
    val nSentences = (length(col("page")) -
      length(translate(col("page"), ".!?", ""))).cast("long")
    pageOf(docs).select(col("doc_id"),
        size(lines).cast("long").as("n_lines"),
        size(kept).cast("long").as("n_kept"),
        size(filter(lines, l => words(l) < 5)).cast("long")
          .as("n_short"),
        size(filter(lines, l => !endsPunct(l))).cast("long")
          .as("n_nopunct"),
        size(filter(lines, hasJs)).cast("long").as("n_js"),
        col("page").contains("lorem ipsum").as("has_lorem"),
        col("page").contains("{").as("has_brace"),
        nSentences.as("n_sentences"),
        charFold(array_join(kept, "\n")).as("clean_fp"))
      .withColumn("keep_page",
        !col("has_lorem") && !col("has_brace") &&
          col("n_sentences") >= 3)
  }

  // clean_fp is coalesced to 0: a doc whose every line is dropped folds
  // the empty string, where Spark's ascii('') is 0 but DuckDB's ord('')
  // is NULL — both engines must fingerprint the empty page as 0
  val c4RulesSql: String = {
    val words = (l: String) =>
      s"CAST(len(string_split_regex($l, '\\s+')) AS BIGINT)"
    val endsPunct = (l: String) =>
      s"right($l, 1) IN ('.', '!', '?', '\"')"
    s"""WITH page AS (${pageSql()}),
       |f AS (
       |  SELECT doc_id, page,
       |    list_transform(string_split(page, chr(10)), l -> trim(l))
       |      AS lines
       |  FROM page),
       |g AS (
       |  SELECT doc_id, page,
       |    CAST(len(lines) AS BIGINT) AS n_lines,
       |    list_filter(lines, l -> ${words("l")} >= 5
       |      AND ${endsPunct("l")}
       |      AND NOT contains(l, 'javascript')) AS kept,
       |    CAST(len(list_filter(lines, l -> ${words("l")} < 5))
       |      AS BIGINT) AS n_short,
       |    CAST(len(list_filter(lines, l -> NOT ${endsPunct("l")}))
       |      AS BIGINT) AS n_nopunct,
       |    CAST(len(list_filter(lines, l -> contains(l, 'javascript')))
       |      AS BIGINT) AS n_js,
       |    contains(page, 'lorem ipsum') AS has_lorem,
       |    contains(page, '{') AS has_brace,
       |    CAST(length(page) - length(translate(page, '.!?', ''))
       |      AS BIGINT) AS n_sentences
       |  FROM f)
       |SELECT doc_id, n_lines, CAST(len(kept) AS BIGINT) AS n_kept,
       |  n_short, n_nopunct, n_js, has_lorem, has_brace, n_sentences,
       |  coalesce(${charFoldSql("array_to_string(kept, chr(10))")}, 0)
       |    AS clean_fp,
       |  NOT has_lorem AND NOT has_brace AND n_sentences >= 3
       |    AS keep_page
       |FROM g""".stripMargin
  }

  // ---------------------------------------------------------------- q131
  /** Unicode NFC normalization audit — the canonicalization pass run
    * before any fingerprint-based dedup on mixed-provenance corpora
    * (crawls mix composed U+00E9 with decomposed e+U+0301 for the same
    * visible text, so un-normalized fingerprints silently miss
    * duplicates). Per document: code-point length before/after NFC, a
    * changed flag, and the post-NFC fingerprint that downstream q33
    * dedup should group on. Denormalized tails are synthesized in-query
    * keyed off doc_id residues (the q110/q116 fixture-in-query pattern)
    * so both verdict branches exist: décomposed café/déjà-vu and
    * Å+ring/ö+diaeresis tails compose (length shrinks), the plain-ASCII
    * tail is a fast-path no-op.
    *
    * Scale shape: map-only via the codegen [[graft.functions
    * .NfcNormalize]] expression (java.text.Normalizer — the same
    * conformant UAX #15 algorithm as the oracle's utf8proc, and its
    * isNormalized quick-check returns already-NFC text untouched, the
    * overwhelming real-corpus case); only the 64-bit post-NFC
    * fingerprint would ever leave the mapper.
    */
  def nfcAudit(spark: SparkSession, dir: String): DataFrame =
    nfcAuditOf(Tables.documents(spark, dir))

  def nfcAuditOf(docs: DataFrame): DataFrame = {
    val dec = concat(col("text"),
      when(col("doc_id") % 3 === 0,
        lit(" cafe\u0301 de\u0301ja\u0300 vu"))
        .when(col("doc_id") % 3 === 1,
          lit(" A\u030Angstro\u0308m"))
        .otherwise(lit(" plain ascii tail")))
    docs.select(col("doc_id"), dec.as("dec"))
      .select(col("doc_id"), col("dec"),
        graft.functions.GraftFunctions.nfc(col("dec")).as("nfc"))
      .select(col("doc_id"),
        length(col("dec")).cast("long").as("raw_chars"),
        length(col("nfc")).cast("long").as("nfc_chars"),
        (col("nfc") =!= col("dec")).as("changed"),
        charFold(col("nfc")).as("nfc_fp"))
  }

  val nfcAuditSql: String =
    s"""WITH d AS (
       |  SELECT doc_id, text ||
       |    CASE doc_id % 3
       |      WHEN 0 THEN ' cafe' || chr(769) || ' de' || chr(769) ||
       |        'ja' || chr(768) || ' vu'
       |      WHEN 1 THEN ' A' || chr(778) || 'ngstro' || chr(776) || 'm'
       |      ELSE ' plain ascii tail' END AS dec
       |  FROM documents),
       |n AS (SELECT doc_id, dec, nfc_normalize(dec) AS nfc FROM d)
       |SELECT doc_id, CAST(length(dec) AS BIGINT) AS raw_chars,
       |  CAST(length(nfc) AS BIGINT) AS nfc_chars,
       |  nfc <> dec AS changed,
       |  ${charFoldSql("nfc")} AS nfc_fp
       |FROM n""".stripMargin

  // ---------------------------------------------------------------- q135
  /** The WITHIN-document half of Gopher's repetition table (Rae et al.
    * 2021 A1.1): duplicate-line and duplicate-paragraph fractions, each
    * both by count and by character mass — the four fields q59 (dup
    * trigram fraction) and q100 (top-bigram mass) don't cover. A line/
    * paragraph occurrence is a duplicate when the same text occurred
    * earlier in the SAME document (cross-corpus recurrence is q124/
    * q132's census, a different operator on purpose: these gates must
    * be computable per document with no corpus pass).
    *
    * Page structure is synthesized in-query: paragraphs separated by
    * blank lines, lines within them, a tripled line planted at
    * doc_id % 5 = 0 and a repeated paragraph at doc_id % 7 = 0 so all
    * four signals have both verdict branches.
    *
    * Scale shape: pure map — split, array_distinct, two HOF length
    * sums; nothing but the stats row leaves the mapper. dup_chars =
    * total chars − chars of first occurrences (Σ over distinct), which
    * avoids any per-occurrence earlier-scan.
    */
  def gopherRep(spark: SparkSession, dir: String): DataFrame =
    gopherRepOf(Tables.documents(spark, dir))

  private def repPage: Column = expr(
    """concat(
      |  'intro line', chr(10), 'second intro line',
      |  chr(10), chr(10),
      |  replace(text, ' a ', chr(10)),
      |  chr(10), chr(10),
      |  'closing paragraph line',
      |  CASE WHEN doc_id % 5 = 0 THEN concat(
      |    chr(10), chr(10), 'repeat me', chr(10), 'repeat me',
      |    chr(10), 'repeat me') ELSE '' END,
      |  CASE WHEN doc_id % 7 = 0 THEN concat(
      |    chr(10), chr(10), 'intro line', chr(10), 'second intro line')
      |    ELSE '' END)""".stripMargin)

  private val repPageSql: String =
    """'intro line' || chr(10) || 'second intro line' ||
      |  chr(10) || chr(10) ||
      |  replace(text, ' a ', chr(10)) ||
      |  chr(10) || chr(10) ||
      |  'closing paragraph line' ||
      |  CASE WHEN doc_id % 5 = 0 THEN
      |    chr(10) || chr(10) || 'repeat me' || chr(10) ||
      |    'repeat me' || chr(10) || 'repeat me' ELSE '' END ||
      |  CASE WHEN doc_id % 7 = 0 THEN
      |    chr(10) || chr(10) || 'intro line' || chr(10) ||
      |    'second intro line' ELSE '' END""".stripMargin

  def gopherRepOf(docs: DataFrame): DataFrame = {
    def stats(arrCol: Column, prefix: String): Seq[Column] = {
      val n = size(arrCol)
      val dist = array_distinct(arrCol)
      val chars = aggregate(arrCol, lit(0L),
        (acc, x) => acc + length(x))
      val distChars = aggregate(dist, lit(0L),
        (acc, x) => acc + length(x))
      // exact integer floor division (a - pmod(a,b))/b — the division
      // is always exact because the numerator is divisible, so no IEEE
      // rounding can cross the engines (the q91/q127 discipline)
      def floorDiv(a: Column, b: Column): Column =
        ((a - pmod(a, b)) / b).cast("long")
      val dupN = (n.cast("long") - size(dist).cast("long")) * 1000
      val dupC = (chars - distChars) * 1000
      Seq(n.cast("long").as(s"n_$prefix"),
        floorDiv(dupN, greatest(n.cast("long"), lit(1L)))
          .as(s"dup_${prefix}_permille"),
        floorDiv(dupC, greatest(chars, lit(1L)))
          .as(s"dup_${prefix}_char_permille"))
    }
    val paras = filter(transform(split(col("page"), "\n\n"),
      p => trim(p)), p => p =!= "")
    val lines = filter(transform(split(col("page"), "\n"),
      l => trim(l)), l => l =!= "")
    docs.select(col("doc_id"), repPage.as("page"))
      .select(col("doc_id") +:
        (stats(lines, "lines") ++ stats(paras, "paras")): _*)
  }

  val gopherRepSql: String = {
    def stats(arr: String, prefix: String): String = {
      val n = s"len($arr)"
      val dist = s"list_distinct($arr)"
      val chars = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($arr, x -> CAST(length(x) AS BIGINT))), " +
        s"(a, b) -> a + b)"
      val distChars = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform($dist, x -> CAST(length(x) AS BIGINT))), " +
        s"(a, b) -> a + b)"
      s"""CAST($n AS BIGINT) AS n_$prefix,
         |  CAST(($n - len($dist)) * 1000 // greatest($n, 1) AS BIGINT)
         |    AS dup_${prefix}_permille,
         |  CAST(($chars - $distChars) * 1000 // greatest($chars, 1)
         |    AS BIGINT) AS dup_${prefix}_char_permille""".stripMargin
    }
    val paras = "list_filter(list_transform(string_split(page, " +
      "chr(10) || chr(10)), x -> trim(x)), x -> x <> '')"
    val lines = "list_filter(list_transform(string_split(page, " +
      "chr(10)), x -> trim(x)), x -> x <> '')"
    s"""WITH p AS (SELECT doc_id, $repPageSql AS page FROM documents),
       |a AS (SELECT doc_id, $lines AS lns, $paras AS prs FROM p)
       |SELECT doc_id, ${stats("lns", "lines")},
       |  ${stats("prs", "paras")}
       |FROM a""".stripMargin
  }

  // ---------------------------------------------------------------- q138
  /** Unicode script census — the pre-langid signal for multilingual
    * crawls: how much of each document is Latin / Cyrillic / CJK /
    * Arabic script? Script mixing (Latin text stuffed with CJK, or
    * vice versa) marks mojibake survivors, spam, and wrong-language
    * routing before any model-based language ID runs. Counts use
    * EXPLICIT codepoint ranges ([0400-04FF], [4E00-9FFF], [0600-06FF])
    * rather than \\p{Script=...} classes, so the result can never
    * drift with the engines' Unicode table versions. Script tails are
    * synthesized in-query keyed off doc_id residues (the q131
    * pattern) so every class has mass.
    *
    * Scale shape: map-only — four regex strips and integer lengths
    * per row; only the census row leaves the mapper.
    */
  def scriptCensus(spark: SparkSession, dir: String): DataFrame =
    scriptCensusOf(Tables.documents(spark, dir))

  def scriptCensusOf(docs: DataFrame): DataFrame = {
    val tail = when(col("doc_id") % 4 === 0,
      lit(" \u043C\u0438\u0440 \u0442\u0435\u043A\u0441\u0442"))
      .when(col("doc_id") % 4 === 1,
        lit(" \u4E2D\u6587\u6587\u672C"))
      .when(col("doc_id") % 4 === 2,
        lit(" \u0646\u0635 \u0639\u0631\u0628\u064A"))
      .otherwise(lit(" ascii only"))
    def stripped(c: Column, cls: String): Column =
      (length(c) - length(regexp_replace(c, cls, ""))).cast("long")
    docs.select(col("doc_id"), concat(col("text"), tail).as("page"))
      .select(col("doc_id"),
        length(col("page")).cast("long").as("n_chars"),
        stripped(col("page"), "[A-Za-z]").as("latin_n"),
        stripped(col("page"), "[\u0400-\u04FF]").as("cyrillic_n"),
        stripped(col("page"), "[\u4E00-\u9FFF]").as("cjk_n"),
        stripped(col("page"), "[\u0600-\u06FF]").as("arabic_n"))
      .withColumn("nonlatin_permille",
        expr("(cyrillic_n + cjk_n + arabic_n) * 1000 div " +
          "greatest(n_chars, 1)"))
      .withColumn("mixed_script",
        col("latin_n") > 0 &&
          (col("cyrillic_n") + col("cjk_n") + col("arabic_n")) > 0)
  }

  val scriptCensusSql: String = {
    def strip(cls: String): String =
      s"CAST(length(page) - length(regexp_replace(page, '$cls', " +
        s"'', 'g')) AS BIGINT)"
    s"""WITH p AS (
       |  SELECT doc_id, text ||
       |    CASE doc_id % 4
       |      WHEN 0 THEN ' ' || chr(1084) || chr(1080) || chr(1088) ||
       |        ' ' || chr(1090) || chr(1077) || chr(1082) ||
       |        chr(1089) || chr(1090)
       |      WHEN 1 THEN ' ' || chr(20013) || chr(25991) ||
       |        chr(25991) || chr(26412)
       |      WHEN 2 THEN ' ' || chr(1606) || chr(1589) || ' ' ||
       |        chr(1593) || chr(1585) || chr(1576) || chr(1610)
       |      ELSE ' ascii only' END AS page
       |  FROM documents),
       |c AS (
       |  SELECT doc_id, CAST(length(page) AS BIGINT) AS n_chars,
       |    ${strip("[A-Za-z]")} AS latin_n,
       |    ${strip("[\\x{0400}-\\x{04FF}]")} AS cyrillic_n,
       |    ${strip("[\\x{4E00}-\\x{9FFF}]")} AS cjk_n,
       |    ${strip("[\\x{0600}-\\x{06FF}]")} AS arabic_n
       |  FROM p)
       |SELECT doc_id, n_chars, latin_n, cyrillic_n, cjk_n, arabic_n,
       |  (cyrillic_n + cjk_n + arabic_n) * 1000 //
       |    greatest(n_chars, 1) AS nonlatin_permille,
       |  latin_n > 0 AND (cyrillic_n + cjk_n + arabic_n) > 0
       |    AS mixed_script
       |FROM c""".stripMargin
  }

  // ---------------------------------------------------------------- q145
  /** Flesch reading ease — the classic readability signal (Flesch
    * 1948; the quality heuristic predating every learned filter):
    * 206.835 − 1.015·(words/sentence) − 84.6·(syllables/word),
    * computed entirely in exact milli-integers with floor division —
    * no IEEE arithmetic crosses the engines. Syllables use the
    * standard vowel-group heuristic (runs of [aeiouy] in lowercased
    * text, at least one per word); sentences count terminal
    * punctuation with a floor of one. The grade bucket (easy ≥ 60,
    * hard < 30) is the routing decision: very-hard text is often
    * OCR noise or legalese boilerplate, very-easy often SEO spam.
    *
    * Scale shape: map-only — two regex counts and integer arithmetic
    * per row; only the stats row leaves the mapper.
    */
  def fleschEase(spark: SparkSession, dir: String): DataFrame =
    fleschEaseOf(Tables.documents(spark, dir))

  def fleschEaseOf(docs: DataFrame): DataFrame = {
    val low = lower(col("text"))
    val words = greatest(size(tokens(col("text"))), lit(1))
      .cast("long")
    val sentences = greatest(
      (length(col("text")) -
        length(translate(col("text"), ".!?", ""))).cast("long"),
      lit(1L))
    val groups = size(regexp_extract_all(low, lit("[aeiouy]+"), lit(0)))
      .cast("long")
    docs.select(col("doc_id"),
        words.as("n_words"), sentences.as("n_sentences"),
        greatest(groups, words).as("n_syllables"))
      .withColumn("fre_milli",
        lit(206835L) - expr("n_words * 1015 div n_sentences") -
          expr("n_syllables * 84600 div n_words"))
      .withColumn("bucket",
        when(col("fre_milli") >= 60000L, "easy")
          .when(col("fre_milli") >= 30000L, "medium")
          .otherwise("hard"))
  }

  val fleschEaseSql: String =
    s"""WITH c AS (
       |  SELECT doc_id,
       |    greatest(len(${tokensSql("text")}), 1) AS n_words,
       |    greatest(length(text) -
       |      length(translate(text, '.!?', '')), 1) AS n_sentences,
       |    len(regexp_extract_all(lower(text), '[aeiouy]+')) AS groups
       |  FROM documents),
       |s AS (SELECT doc_id, CAST(n_words AS BIGINT) AS n_words,
       |    CAST(n_sentences AS BIGINT) AS n_sentences,
       |    CAST(greatest(groups, n_words) AS BIGINT) AS n_syllables
       |  FROM c),
       |f AS (SELECT doc_id, n_words, n_sentences, n_syllables,
       |    206835 - n_words * 1015 // n_sentences -
       |      n_syllables * 84600 // n_words AS fre_milli
       |  FROM s)
       |SELECT doc_id, n_words, n_sentences, n_syllables,
       |  CAST(fre_milli AS BIGINT) AS fre_milli,
       |  CASE WHEN fre_milli >= 60000 THEN 'easy'
       |    WHEN fre_milli >= 30000 THEN 'medium'
       |    ELSE 'hard' END AS bucket
       |FROM f""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q145_flesch_ease" -> (fleschEase _),
    "q138_script_census" -> (scriptCensus _),
    "q135_gopher_rep" -> (gopherRep _),
    "q131_nfc_audit" -> (nfcAudit _),
    "q123_c4_rules" -> (c4Rules _),
    "q120_gopher_rules" -> (gopherRules _),
    "q116_mojibake" -> (mojibake _),
    "q77_pii_redact" -> (piiRedactQuery _),
    "q59_repetition" -> (repetitionStats _),
    "q37_quality_filter" -> (qualityFilter _),
    "q95_quality_logit" -> (qualityLogit _),
    "q100_topngram_mass" -> (topNgramMass _),
    "q38_bpe_tokens" -> (bpeTokens _),
    "q30_text_stats" -> (textStats _),
    "q31_lang_id" -> (langId _),
    "q32_fingerprint" -> (fingerprint _),
    "q33_dedup_exact" -> (dedupExact _))

  val oracles: Map[String, String] = Map(
    "q145_flesch_ease" -> fleschEaseSql,
    "q138_script_census" -> scriptCensusSql,
    "q135_gopher_rep" -> gopherRepSql,
    "q131_nfc_audit" -> nfcAuditSql,
    "q123_c4_rules" -> c4RulesSql,
    "q120_gopher_rules" -> gopherRulesSql,
    "q116_mojibake" -> mojibakeSql,
    "q77_pii_redact" -> piiRedactSql,
    "q59_repetition" -> repetitionStatsSql,
    "q37_quality_filter" -> qualityFilterSql,
    "q95_quality_logit" -> qualityLogitSql,
    "q100_topngram_mass" -> topNgramMassSql,
    "q38_bpe_tokens" -> bpeTokensSql,
    "q30_text_stats" -> textStatsSql,
    "q31_lang_id" -> langIdSql,
    "q32_fingerprint" -> fingerprintSql,
    "q33_dedup_exact" -> dedupExactSql)
}
