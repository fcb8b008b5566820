package graft

import org.apache.spark.sql.functions._

import graft.operators.CorpusOps

class CorpusOpsSpec extends SparkSuite {

  test("interdup fraction: shared shingles counted across docs only") {
    val s = spark
    import s.implicits._
    // docs 1 and 2 share their first 5-gram; doc 3 is disjoint
    val docs = Seq(
      (1L, "a b c d e x1 y1 z1 w1 v1"),
      (2L, "a b c d e x2 y2 z2 w2 v2"),
      (3L, "p q r s t u")
    ).toDF("doc_id", "text")
    val out = CorpusOps.interdupFractionOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getBoolean(3)))).toMap
    // 10 tokens -> 6 distinct shingles; exactly one shared
    assert(out(1L) == ((6L, 1L, true)))
    assert(out(2L) == ((6L, 1L, true)))
    // 6 tokens -> 2 shingles, none shared
    assert(out(3L) == ((2L, 0L, true)))
  }

  test("interdup fraction: fully duplicated doc pair is dropped") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g"),
      (2L, "a b c d e f g"),
      (3L, "n o p q r s t")
    ).toDF("doc_id", "text")
    val out = CorpusOps.interdupFractionOf(docs)
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    assert(out(1L) == false && out(2L) == false && out(3L) == true)
  }

  test("token rarity: census counts occurrences, not documents") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the the cat"),
      (2L, "the dog")
    ).toDF("doc_id", "text")
    val out = CorpusOps.tokenRarityOf(docs)
      .collect().map(r => r.getLong(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    // "the" x3, "cat" x1, "dog" x1
    assert(out(1L) == ((3L, 3L + 3L + 1L, 1L)))
    assert(out(2L) == ((2L, 3L + 1L, 1L)))
  }

  test("knn classify: one prediction per query with 5 votes total") {
    val out = CorpusOps.knnClassify(spark, sf).cache()
    val nQueries = Tables.embeddings(spark, sf)
      .filter(col("vec_id") % 23 === 7).count()
    assert(out.count() == nQueries)
    // majority vote: winner has between 1 and 5 votes
    assert(out.filter(col("votes") < 1 || col("votes") > 5).count() == 0)
    out.unpersist()
  }

  test("mad outliers: gate is strictly above 3*1.4826*mad") {
    val out = CorpusOps.madOutliers(spark, sf).cache()
    val rows = out.collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getDouble(2) >= 0.0) // mad
      assert(r.getLong(4) <= r.getLong(3)) // n_outliers <= n
    }
    out.unpersist()
  }

  test("bigram surprisal: repetitive text scores below high-entropy " +
      "transitions, exact integer units") {
    val s = spark
    import s.implicits._
    // vocab {b, the, cat, dog, pig}: V=5
    val docs = Seq(
      (1L, "b b b b b"),               // (b,b)x4: c1=c12=4
      (2L, "the cat the dog the pig")) // 'the' fans out: c1=3, c12=1
      .toDF("doc_id", "text")
    val r = graft.operators.CorpusOps.bigramSurprisalOf(docs)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_bigrams"), x.getAs[Long]("surprisal_units"),
          x.getAs[Long]("bits_per_transition_milli")))).toMap
    // doc1 per pair: bitlen(4+5)-bitlen(4+1) = 4-3 = 1  -> 4 units
    assert(r(1L) == ((4L, 4L, 1000L)))
    // doc2: (the,*) pairs give bitlen(8)-bitlen(2)=2, (cat/dog,the)
    // give bitlen(6)-bitlen(2)=1 -> 2+1+2+1+2 = 8 units over 5
    assert(r(2L) == ((5L, 8L, 1600L)))
    assert(r(2L)._3 > r(1L)._3)
  }

  test("dsir weight: target-like document outweighs off-domain one; " +
      "feature count is unigrams + bigrams") {
    val s = spark
    import s.implicits._
    // target slice (src0) speaks "alpha beta"; doc 3 echoes it from
    // the raw pool, doc 4 is off-domain vocabulary
    val docs = Seq(
      (1L, "alpha beta alpha beta", "src0"),
      (2L, "alpha beta gamma", "src0"),
      (3L, "alpha beta alpha", "src9"),
      (4L, "omega psi chi phi", "src9"))
      .toDF("doc_id", "text", "source")
    val r = graft.operators.CorpusOps.dsirWeightOf(docs)
      .collect().map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_feats"), x.getAs[Long]("dsir_units"))))
      .toMap
    // n tokens -> n unigram + (n-1) bigram features
    assert(r(1L)._1 == 7L && r(2L)._1 == 5L)
    assert(r(3L)._1 == 5L && r(4L)._1 == 7L)
    // resampling order: the doc that reads like the target scores
    // strictly above the off-domain doc
    assert(r(3L)._2 > r(4L)._2)
    // off-domain features never occur in the target model: every
    // occurrence contributes bitlen(1) - bitlen(cr+1) + const < const
    assert(r(4L)._2 < r(1L)._2)
  }

  test("q112 ccnet buckets: grouped two-pass rank equals a window " +
      "rank; tercile boundaries; no Window in the rank path") {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(spark, sf)
    val out = graft.operators.CorpusOps.ccnetBucketsOf(spark, docs)
    // reference computation: the per-lang window rank the two-pass
    // machinery must reproduce exactly
    val scored = graft.operators.CorpusOps.bigramSurprisalOf(docs)
      .join(docs.select("doc_id", "lang"), Seq("doc_id"))
    val w = Window.partitionBy(col("lang"))
      .orderBy(col("bits_per_transition_milli"), col("doc_id"))
    val naive = scored
      .withColumn("lang_rank", row_number().over(w).cast("long"))
      .withColumn("lang_n",
        count(lit(1)).over(Window.partitionBy(col("lang"))))
      .select(col("doc_id"), col("lang"),
        col("bits_per_transition_milli"), col("lang_rank"),
        col("lang_n"),
        when(col("lang_rank") * 3 <= col("lang_n"), "head")
          .when(col("lang_rank") * 3 <= col("lang_n") * 2, "middle")
          .otherwise("tail").as("ppl_bucket"))
    assert(out.collect().map(_.toSeq).toSet ==
      naive.collect().map(_.toSeq).toSet)
    // tercile sizes: per lang, head <= middle+tail and buckets cover n
    val sizes = out.groupBy("lang", "ppl_bucket").count().collect()
      .map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    out.groupBy("lang").count().collect().foreach { r =>
      val (lang, n) = (r.getString(0), r.getLong(1))
      val h = sizes.getOrElse((lang, "head"), 0L)
      val m = sizes.getOrElse((lang, "middle"), 0L)
      val t = sizes.getOrElse((lang, "tail"), 0L)
      assert(h + m + t == n)
      assert(h == n / 3, s"$lang head $h of $n")
    }
    // the production path must not fall back to a window rank (the
    // per-doc lead() window inside the surprisal score is fine — it
    // partitions by doc_id; ranking by row_number is what must stay
    // two-pass)
    val plan = out.queryExecution.executedPlan.toString
    assert(!plan.contains("row_number"), plan)
  }

  test("tokenizer fertility: exact per-language token/word/char ratios") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("en", "hello world"),     // 2 words, 0 punct, 11 chars
      ("en", "a, b c!"),         // 3 words, 2 punct, 7 chars
      ("fr", "bonjour le monde") // 3 words, 0 punct, 16 chars
    ).toDF("lang", "text")
    val r = CorpusOps.tokenizerFertilityOf(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val en = r("en")
    assert(en.getAs[Long]("n_docs") == 2)
    assert(en.getAs[Long]("n_words") == 5)
    assert(en.getAs[Long]("n_tokens") == 7)
    assert(en.getAs[Long]("n_chars") == 18)
    assert(en.getAs[Long]("fertility_permille") == 1400)
    assert(en.getAs[Long]("chars_per_token_permille") == 18000 / 7)
    val fr = r("fr")
    assert(fr.getAs[Long]("n_tokens") == 3)
    assert(fr.getAs[Long]("fertility_permille") == 1000)
  }

  test("zipf diagnostics: vocab, hapax tail and head mass per language") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      ("en", "the cat"), ("en", "the dog"), ("en", "the the bird"),
      ("fr", "un un deux")).toDF("lang", "text")
    val r = CorpusOps.zipfDiagnosticsOf(docs).collect()
      .map(x => x.getString(0) -> x).toMap
    val en = r("en")
    // census: the×4, cat, dog, bird → vocab 4, tokens 7, hapax 3
    assert(en.getAs[Long]("vocab_size") == 4)
    assert(en.getAs[Long]("n_tokens") == 7)
    assert(en.getAs[Long]("hapax_count") == 3)
    // vocab < 100 → the whole census is the head
    assert(en.getAs[Long]("head_permille") == 1000)
    assert(en.getAs[Long]("hapax_permille") == 750)
    val fr = r("fr")
    assert(fr.getAs[Long]("vocab_size") == 2)
    assert(fr.getAs[Long]("n_tokens") == 3)
    assert(fr.getAs[Long]("hapax_count") == 1)
    assert(fr.getAs[Long]("hapax_permille") == 500)
  }

  test("collocations: a planted rigid phrase tops the lift table, " +
      "free-floating fillers do not") {
    val s2 = spark
    import s2.implicits._
    // 'san marino' always co-occurs (rigid pair, c12 = c_a = c_b = 6);
    // 'the' floats freely everywhere and never forms a strong pair
    val docs = (1 to 6).map { i =>
      (i.toLong, s"the city of san marino ranks number $i in the " +
        "the list of the small states of the world")
    }.toDF("doc_id", "text")
    val r = graft.operators.CorpusOps.collocationsOf(docs).collect()
      .map(x => x.getString(0) -> x.getLong(4)).toMap
    assert(r.contains("san marino"))
    // a rigid pair's lift is ~T/c (here ~ tokens/6) — far above any
    // 'the'-pair; check it beats every pair involving 'the'
    val sanLift = r("san marino")
    r.filter(_._1.split(" ").contains("the")).values
      .foreach(l => assert(l < sanLift))
    // arithmetic self-check on the planted pair: c12=c_a=c_b=6
    val row = graft.operators.CorpusOps.collocationsOf(docs)
      .filter(org.apache.spark.sql.functions.col("bigram") ===
        "san marino").head
    assert(row.getLong(1) == 6 && row.getLong(2) == 6 &&
      row.getLong(3) == 6)
  }

  test("heldout coverage: learned split, shared bigram covered, " +
      "unique test bigrams not") {
    val s2 = spark
    import s2.implicits._
    import org.apache.spark.sql.functions._
    // learn which ids the 90/10 hash gate sends to test
    val ids = (1L to 100L).toDF("doc_id")
    val isTrain = ids.withColumn("t",
      graft.operators.CurationOps.sampleHash(col("doc_id")) % 1000 <
        900).collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val nTest = isTrain.count(!_._2)
    assert(nTest > 0 && nTest < 30) // ~10% of 100
    // train docs share one bigram; each test doc adds one unique one
    val docs = (1L to 100L).map { i =>
      val text = if (isTrain(i)) "shared pair shared pair"
        else s"shared pair unique$i"
      (i, text, "en")
    }.toDF("doc_id", "text", "lang")
    val r = graft.operators.CorpusOps.heldoutCoverageOf(docs)
      .collect().head
    // test grams: 'shared pair' (covered) + 'pair unique$i' per test
    // doc (uncovered)
    assert(r.getAs[String]("lang") == "en")
    assert(r.getAs[Long]("n_test_grams") == (1 + nTest).toLong)
    assert(r.getAs[Long]("n_covered") == 1L)
    assert(r.getAs[Long]("coverage_permille") ==
      1000L / (1 + nTest))
  }
}
