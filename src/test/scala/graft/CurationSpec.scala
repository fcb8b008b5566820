package graft

import org.apache.spark.sql.functions._
import graft.operators.{CurationOps, Relational3}

class CurationSpec extends SparkSuite {

  test("connected components labels each cluster by its min node") {
    import spark.implicits._
    // two clusters {1,2,3,4} (chain) and {10,11}, singleton 20
    val edges = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L))
      .toDF("a", "b")
    val nodes = Seq(1L, 2L, 3L, 4L, 10L, 11L, 20L).toDF("v")
    val got = CurationOps.connectedComponents(nodes, edges)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L,
      10L -> 10L, 11L -> 10L, 20L -> 20L))
  }

  test("dedup groups cover every document exactly once") {
    val docs = Tables.documents(spark, sf).count()
    val groups = CurationOps.dedupGroups(spark, sf)
    assert(groups.count() == docs)
    assert(groups.select("doc_id").distinct().count() == docs)
    // component label is a member of its own component
    val labels = groups.select(col("component").as("doc_id")).distinct()
    assert(labels.join(groups, "doc_id").count() == labels.count())
  }

  test("stratified sample respects per-type rates") {
    val s = CurationOps.stratifiedSample(spark, sf)
    val byType = s.groupBy("event_type").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(!byType.contains("error")) // rate 0
    val total = Tables.events(spark, sf)
      .filter(col("event_type") === "purchase").count()
    assert(byType.getOrElse("purchase", 0L) == total) // rate 1000 = keep all
  }

  test("dataset split is exhaustive and reproducible") {
    val agg = CurationOps.datasetSplit(spark, sf)
    val n = agg.agg(sum("n_docs")).collect()(0).getLong(0)
    assert(n == Tables.documents(spark, sf).count())
    val again = CurationOps.datasetSplit(spark, sf)
    assert(agg.exceptAll(again).isEmpty && again.exceptAll(agg).isEmpty)
  }

  test("tfidf emits at most 3 ranked terms per doc") {
    val t = CurationOps.tfidfTopTerms(spark, sf)
    val maxPerDoc = t.groupBy("doc_id").count()
      .agg(max("count")).collect()(0).getLong(0)
    assert(maxPerDoc <= 3)
    assert(t.filter(col("rank") < 1 || col("rank") > 3).isEmpty)
  }

  test("lang rebalance keeps at most ~min-share per language") {
    val r = CurationOps.langRebalance(spark, sf).collect()
      .map(x => (x.getString(0), x.getLong(1), x.getLong(2)))
    val minTotal = r.map(_._2).min
    r.foreach { case (lang, total, kept) =>
      assert(kept <= total, lang)
      // hash-thresholding tracks the target share with slack
      assert(kept <= 2 * minTotal + 5, s"$lang kept=$kept min=$minTotal")
    }
  }

  test("decontamination flags only non-benchmark docs with overlap") {
    val d = CurationOps.decontaminate(spark, sf)
    assert(d.filter(col("doc_id") % 97 === 0).isEmpty)
    assert(d.filter(col("n_contaminated_ngrams") <= 0).isEmpty)
  }

  test("passage chunks tile each document exactly") {
    import spark.implicits._
    val chunks = CurationOps.passageChunks(spark, sf)
    // per doc: chunks are contiguous, start at 1, end at n_tokens
    val bad = chunks
      .withColumn("prev_end", org.apache.spark.sql.functions.lag(
        col("end_tok"), 1, 0).over(
        org.apache.spark.sql.expressions.Window
          .partitionBy("doc_id").orderBy("chunk_idx")))
      .filter(col("start_tok") =!= col("prev_end") + 1)
    assert(bad.isEmpty)
    val docTokens = Tables.documents(spark, sf).select(col("doc_id"),
      org.apache.spark.sql.functions.size(
        operators.TextOps.tokens(operators.TextOps.normText(col("text"))))
        .as("n"))
    val lastEnd = chunks.groupBy("doc_id")
      .agg(org.apache.spark.sql.functions.max("end_tok").as("last_end"))
    assert(lastEnd.join(docTokens, "doc_id")
      .filter(col("last_end") =!= col("n")).isEmpty)
  }

  test("top bigrams is deterministic and bounded") {
    val b1 = CurationOps.topBigrams(spark, sf).collect()
    val b2 = CurationOps.topBigrams(spark, sf).collect()
    assert(b1.toSeq == b2.toSeq)
    assert(b1.length <= 20)
    // counts are non-increasing
    val counts = b1.map(_.getLong(1))
    assert(counts.sameElements(counts.sortBy(-_)))
  }

  test("cube emits all four grouping sets") {
    val c = Relational3.cubeSummary(spark, sf)
    val gids = c.select("gid").distinct().collect()
      .map(_.getLong(0)).toSet
    assert(gids == Set(0L, 1L, 2L, 3L))
    // grand total row matches table count
    val total = c.filter(col("gid") === 3).select("n_rows")
      .collect()(0).getLong(0)
    assert(total == Tables.lineitem(spark, sf).count())
  }

  test("passage dedup agrees with passage chunks and bounds sharing") {
    val chunks = CurationOps.passageChunks(spark, sf)
      .groupBy("doc_id")
      .agg(count(lit(1)).as("c_passages"),
        sum(col("end_tok") - col("start_tok") + 1).as("c_tokens"))
    val dedup = CurationOps.passageDedup(spark, sf)
    // per-doc passage/token totals must match the q48 tiling exactly
    val joined = dedup.join(chunks, "doc_id")
    assert(joined.count() == dedup.count() &&
      dedup.count() == chunks.count())
    assert(joined.filter(col("n_passages") =!= col("c_passages") ||
      col("n_tokens") =!= col("c_tokens")).isEmpty)
    // shared subsets are bounded and the fraction is consistent
    assert(dedup.filter(col("n_shared_passages") > col("n_passages") ||
      col("n_shared_tokens") > col("n_tokens")).isEmpty)
    assert(dedup.filter(col("shared_frac") < 0.0 ||
      col("shared_frac") > 1.0).isEmpty)
  }

  test("quality logit columns satisfy the published formula") {
    val q = graft.operators.TextOps.qualityLogit(spark, sf)
    assert(q.count() == Tables.documents(spark, sf).count())
    val bad = q.filter(
      col("logit_milli") =!= (lit(800L) + lit(3L) * col("stop_permille") -
        lit(2L) * col("punct_permille") -
        abs(col("span_centi") - lit(550L))) ||
      col("quality_bucket") < 0 || col("quality_bucket") > 9 ||
      col("keep") =!= (col("quality_bucket") >= 3))
    assert(bad.isEmpty)
  }

  test("mixture plan maximizes the corpus at the target proportions") {
    val rows = CurationOps.mixturePlan(spark, sf).collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getBoolean(5))).toSeq
    assert(rows.map(_._3).sum == 1000L) // targets are a full mix
    assert(rows.exists(_._6)) // some language binds
    rows.foreach { case (_, nDocs, _, nKeep, rate, _) =>
      assert(nKeep <= nDocs && rate >= 0 && rate <= 1000)
    }
    // recompute the feasible corpus size from a limiting row and check
    // every keep count realizes floor(S * w / 1000)
    val s = rows.filter(_._6).map { case (_, n, w, _, _, _) =>
      n * 1000L / w }.min
    rows.filter(_._3 > 0).foreach { case (_, nDocs, w, nKeep, _, _) =>
      assert(nKeep == s * w / 1000L)
      assert(nDocs * 1000L / w >= s) // no language over-committed
    }
  }

  test("leakage split never straddles a near-dup component") {
    val s = CurationOps.leakageSplit(spark, sf)
    assert(s.count() == Tables.documents(spark, sf).count())
    // one split per component, by construction AND by measurement
    val perComp = s.groupBy("component")
      .agg(countDistinct("split").as("n_splits"))
    assert(perComp.filter(col("n_splits") =!= 1).isEmpty)
    // deterministic across reruns
    val again = CurationOps.leakageSplit(spark, sf)
    assert(s.exceptAll(again).isEmpty && again.exceptAll(s).isEmpty)
  }

  test("top-bigram mass is bounded and counts every bigram slot") {
    import graft.operators.TextOps
    val t = TextOps.topNgramMass(spark, sf)
    assert(t.count() == Tables.documents(spark, sf).count())
    assert(t.filter(col("top_count") > col("n_bigrams") ||
      col("top_frac") < 0.0 || col("top_frac") > 1.0).isEmpty)
    // n_bigrams must equal tokenized length - 1 (0 for shorter docs)
    val direct = Tables.documents(spark, sf).select(col("doc_id"),
      greatest(size(TextOps.tokens(TextOps.normText(col("text")))) - 1,
        lit(0)).cast("long").as("expect"))
    assert(t.join(direct, "doc_id")
      .filter(col("n_bigrams") =!= col("expect")).isEmpty)
    // the flag follows the published threshold exactly
    assert(t.filter(col("flagged") =!= (col("top_frac") > 0.2)).isEmpty)
  }

  test("corpus report reconciles with the corpus and its signals") {
    import graft.operators.TextOps
    val r = CurationOps.corpusReport(spark, sf)
    val docs = Tables.documents(spark, sf)
    val agg = r.agg(sum("n_docs"), sum("total_chars"), sum("n_low_quality"),
      sum("n_repetitive")).collect()(0)
    assert(agg.getLong(0) == docs.count())
    assert(agg.getLong(1) ==
      docs.agg(sum("n_chars")).collect()(0).getLong(0))
    // cross-check the flag totals against the signal operators
    assert(agg.getLong(2) ==
      TextOps.qualityLogit(spark, sf).filter(!col("keep")).count())
    assert(agg.getLong(3) ==
      TextOps.topNgramMass(spark, sf).filter(col("flagged")).count())
    // per-cell sanity: no rate exceeds its cell count
    assert(r.filter(col("n_exact_dup") > col("n_docs") ||
      col("n_low_quality") > col("n_docs") ||
      col("n_repetitive") > col("n_docs")).isEmpty)
  }

  test("histogram quantiles bracket the exact quantile within one bin") {
    import graft.operators.AdvancedOps
    val est = AdvancedOps.quantileHist(spark, sf).collect()
      .map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3),
        r.getDouble(4))).toMap
    val values = Tables.events(spark, sf)
      .select(col("event_type"), col("value")).collect()
      .groupBy(_.getString(0))
      .view.mapValues(_.map(_.getDouble(1)).sorted).toMap
    est.foreach { case (t, (p50, p95, p99)) =>
      val v = values(t)
      // the operator answers the ceil-rank order statistic: the
      // smallest value x with #(≤ x) ≥ ⌈q·n⌉ — its estimate is EXACTLY
      // that statistic's bin floor
      def stat(q100: Long) = {
        val r = ((v.length * q100 + 99) / 100).toInt // ceil(n·q)
        math.floor(v(r - 1) * 10.0) / 10.0
      }
      assert(p50 == stat(50), s"$t p50=$p50 want=${stat(50)}")
      assert(p95 == stat(95), s"$t p95=$p95 want=${stat(95)}")
      assert(p99 == stat(99), s"$t p99=$p99 want=${stat(99)}")
    }
  }

  test("pivot matrix accounts for every event value once") {
    val p = Relational3.eventPivot(spark, sf)
    assert(p.count() == 10)
    val pivotTotal = p.select(
      Relational3.EventTypes.map(t => coalesce(col(t), lit(0.0)))
        .reduce(_ + _).as("s"))
      .agg(sum("s")).collect()(0).getDouble(0)
    val direct = Tables.events(spark, sf)
      .agg((sum(floor(col("value") * lit(10000.0))).cast("double") /
        lit(10000.0)).as("s"))
      .collect()(0).getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }

  test("mojibake: synthesized double-encoding artifacts are counted, " +
      "untouched text stays clean") {
    import graft.operators.TextOps
    val s2 = spark
    import s2.implicits._
    // doc_id % 4 selects the corruption branch inside the query:
    // 0 → 'a'→'Ã¡', 1 → appended 'â€'-ghosts, 2 → 'e'→U+FFFD, 3 → clean
    val docs = Seq(
      (0L, "a banana"), (1L, "plain words"), (2L, "tree bee"),
      (3L, "perfectly clean text")).toDF("doc_id", "text")
    val r = TextOps.mojibakeOf(docs).collect()
      .map(x => x.getLong(0) -> ((x.getLong(1), x.getLong(2),
        x.getLong(3), x.getBoolean(4)))).toMap
    // "a banana" → 'a' appears 4× → "Ã¡ bÃ¡nÃ¡nÃ¡" (12 chars, 4 'Ã')
    assert(r(0L) == ((12L, 4L, 4L * 1000 / 12, false)))
    // ' â€” itâ€™s' appends 11 chars with two 'â€' ghosts
    assert(r(1L) == ((22L, 2L, 2L * 1000 / 22, false)))
    // "tree bee" → 4 'e'→replacement chars, length unchanged
    assert(r(2L) == ((8L, 4L, 4L * 1000 / 8, false)))
    assert(r(3L) == ((20L, 0L, 0L, true)))
  }

  test("gopher rules: each published gate trips on its own violation " +
      "and a conforming doc passes all") {
    import graft.operators.TextOps
    val s2 = spark
    import s2.implicits._
    val good = (1 to 60).map(i =>
      Seq("the", "words", "have", "shape")(i % 4)).mkString(" ")
    val docs = Seq(
      (1L, good),                                   // passes everything
      (2L, (1 to 10).map(_ => "the").mkString(" ")), // too few words
      (3L, (1 to 60).map(_ => "ab").mkString(" ")),  // mean word len < 3
      (4L, good + " " + (1 to 30).map(_ => "#").mkString(" ")), // symbols
      (5L, (1 to 60).map(i => s"- the item $i line have")
        .mkString("\n")),                            // all bullet lines
      (6L, (1 to 60).map(i => s"the trailing have thing $i ...")
        .mkString("\n")),                            // all ellipsis ends
      (7L, (1 to 60).map(i => (i * 7919).toString).mkString(" ")
        + " the have"),                              // numeric words
      (8L, (1 to 60).map(i => s"word$i").mkString(" "))) // no stopwords
      .toDF("doc_id", "text")
    val r = TextOps.gopherRulesOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(1L).getAs[Boolean]("passes_gopher"))
    assert(!r(2L).getAs[Boolean]("ok_word_count"))
    assert(!r(3L).getAs[Boolean]("ok_mean_word_len"))
    assert(!r(4L).getAs[Boolean]("ok_symbol_ratio"))
    assert(!r(5L).getAs[Boolean]("ok_bullet_lines"))
    assert(!r(6L).getAs[Boolean]("ok_ellipsis_lines"))
    assert(!r(7L).getAs[Boolean]("ok_alpha_words"))
    assert(!r(8L).getAs[Boolean]("ok_stop_words"))
    // violations are independent: the bullet doc still has its words
    assert(r(5L).getAs[Boolean]("ok_word_count"))
    assert(Seq(2L, 3L, 4L, 5L, 6L, 7L, 8L)
      .forall(id => !r(id).getAs[Boolean]("passes_gopher")))
  }

  test("corpus diff classifies added/removed/changed/unchanged and " +
      "ignores a no-op rewrite of the same text") {
    val s2 = spark
    import s2.implicits._
    val v1 = Seq((1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "delta")).toDF("doc_id", "text")
    val v2 = Seq((1L, "alpha"),          // unchanged
      (2L, "beta edited"),               // changed
      (4L, "DELTA"),                     // changed (fp is case-fold-free)
      (9L, "epsilon"))                   // added; 3 removed
      .toDF("doc_id", "text")
    val r = CurationOps.corpusDiffOf(v1, v2).collect()
      .map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(r == Map(1L -> "unchanged", 2L -> "changed",
      3L -> "removed", 4L -> "changed", 9L -> "added"))
    // identical versions: everything unchanged
    val same = CurationOps.corpusDiffOf(v1, v1).collect()
    assert(same.forall(_.getString(1) == "unchanged"))
  }

  test("curriculum schedule: stage slices are minimal covers of the " +
      "30/70 percent quality ranks, monotone in the logit") {
    val r = CurationOps.curriculumSchedule(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2)))
    val n = r.length
    assert(r.forall(t => t._3 >= 0 && t._3 <= 2))
    // monotone: a higher logit never gets a later first epoch
    val byEpoch = r.groupBy(_._3).view.mapValues(_.map(_._2)).toMap
    for (e <- 0L to 1L; later <- (e + 1) to 2L)
      if (byEpoch.contains(e) && byEpoch.contains(later))
        assert(byEpoch(e).min >= byEpoch(later).max)
    // coverage: stage 0 covers >= 30%, stages 0+1 cover >= 70% —
    // and minimally so (excluding the cutoff value drops below)
    val s0 = r.filter(_._3 == 0L)
    val s01 = r.filter(_._3 <= 1L)
    assert(s0.length * 10 >= n * 3)
    assert(s01.length * 10 >= n * 7)
    val c0 = s0.map(_._2).min
    val c1 = s01.map(_._2).min
    assert(r.count(_._2 > c0) * 10 < n * 3)
    assert(r.count(_._2 > c1) * 10 < n * 7)
  }

  test("c4 rules: per-line and per-page gates fire on hand-built pages") {
    import graft.operators.TextOps
    val s2 = spark
    import s2.implicits._
    // doc 42: 42%6=0 (js notice), 42%7=0 (lorem), header pool slots
    // 42%4=2 / 44%4=0 → page is
    //   privacy policy. terms of service.      (5 words, '.')  kept
    //   one two three four five                (5 words, no '.')
    //   subscribe to our newsletter.           (4 words, short)
    //   please enable javascript to view this page   (js)
    //   lorem ipsum dolor sit amet.            (5 words, '.')  kept
    // doc 11: 11%11=0 plants 'function() {'; ' a ' splits the body at
    // the article and plants a period, leaving every line under 5 words
    // doc 1: clean page, body split once at ' a ' → two kept sentences
    val docs = Seq(
      (42L, "one two three four five"),
      (11L, "big cat runs a small dog sleeps well."),
      (1L, "one two three four five six a seven eight nine ten eleven."))
      .toDF("doc_id", "text")
    val r = TextOps.c4RulesOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d42 = r(42L)
    assert(d42.getAs[Long]("n_lines") == 5)
    assert(d42.getAs[Long]("n_kept") == 2)
    assert(d42.getAs[Long]("n_short") == 1)
    assert(d42.getAs[Long]("n_nopunct") == 2)
    assert(d42.getAs[Long]("n_js") == 1)
    assert(d42.getAs[Boolean]("has_lorem"))
    assert(!d42.getAs[Boolean]("has_brace"))
    assert(d42.getAs[Long]("n_sentences") == 4)
    assert(!d42.getAs[Boolean]("keep_page")) // lorem kills the page
    // kept text = the two surviving lines, fingerprinted
    assert(d42.getAs[Long]("clean_fp") == 815916740119967L)
    val d11 = r(11L)
    assert(d11.getAs[Long]("n_lines") == 5)
    assert(d11.getAs[Long]("n_kept") == 0)
    assert(d11.getAs[Long]("n_short") == 5)
    assert(d11.getAs[Boolean]("has_brace"))
    assert(!d11.getAs[Boolean]("keep_page"))
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_kept") == 2)
    assert(d1.getAs[Boolean]("keep_page"))
  }

  test("source scorecard: recrawl fixture drives the dup column, " +
      "accounting is exact per source") {
    val r = CurationOps.sourceScorecard(spark, sf).collect()
      .map(x => x.getAs[String]("source") -> x).toMap
    // every recrawl doc is by construction a copy
    val rec = r("recrawl")
    assert(rec.getAs[Long]("n_docs") == 50)
    assert(rec.getAs[Long]("dup_permille") == 1000)
    // the copied-from sources (doc_id%10 -> %20 in {0,10}) carry the
    // other half of each pair; untouched sources carry none
    assert(r("src0").getAs[Long]("dup_permille") == 1000)
    assert(r("src10").getAs[Long]("dup_permille") == 1000)
    assert(r("src1").getAs[Long]("dup_docs") == 0)
    // rates are permilles; every source row accounts its 25 docs
    r.values.foreach { row =>
      val kp = row.getAs[Long]("keep_permille")
      assert(kp >= 0 && kp <= 1000)
      assert(row.getAs[Long]("dup_docs") <= row.getAs[Long]("n_docs"))
    }
    assert(r.size == 21) // 20 sources + recrawl
  }

  test("flesch ease: hand-computed scores for easy and hard text, " +
      "floors guard empty inputs") {
    val s2 = spark
    import s2.implicits._
    import graft.operators.TextOps
    val docs = Seq(
      (1L, "The cat sat on the mat."),
      (2L, "extraordinarily sophisticated"),
      (3L, "")).toDF("doc_id", "text")
    val r = TextOps.fleschEaseOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 1: 6 words, 1 sentence, 6 vowel groups (e,a,a,o,e,a)
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_words") == 6)
    assert(d1.getAs[Long]("n_sentences") == 1)
    assert(d1.getAs[Long]("n_syllables") == 6)
    assert(d1.getAs[Long]("fre_milli") ==
      206835L - 6 * 1015 / 1 - 6 * 84600 / 6)
    assert(d1.getAs[String]("bucket") == "easy")
    // doc 2: 2 words, no terminal punct (floor 1 sentence),
    // 6 + 5 vowel groups
    val d2 = r(2L)
    assert(d2.getAs[Long]("n_syllables") == 11)
    assert(d2.getAs[Long]("fre_milli") ==
      206835L - 2 * 1015 - 11L * 84600 / 2)
    assert(d2.getAs[String]("bucket") == "hard")
    // doc 3: empty — floors keep everything defined
    val d3 = r(3L)
    assert(d3.getAs[Long]("n_words") == 1)
    assert(d3.getAs[Long]("n_sentences") == 1)
    assert(d3.getAs[Long]("n_syllables") == 1)
  }

  test("epoch plan: budget accounting exact, cap binds only where " +
      "demanded epochs exceed it, zero-weight slices sit out") {
    val r = CurationOps.epochPlan(spark, sf).collect()
      .map(x => x.getAs[String]("lang") -> x).toMap
    val total = r.values.map(_.getAs[Long]("n_tokens")).sum
    r.values.foreach { row =>
      val share = row.getAs[Long]("share_permille")
      val target = row.getAs[Long]("target_tokens")
      val epochs = row.getAs[Long]("epochs_milli")
      val served = row.getAs[Long]("served_tokens")
      val tokens = row.getAs[Long]("n_tokens")
      assert(target == total * CurationOps.EpochBudgetX * share / 1000)
      if (share == 0) assert(epochs == 0 && served == 0)
      else {
        val demanded = target * 1000 / tokens
        assert(epochs == math.min(CurationOps.EpochCapMilli, demanded))
        assert(row.getAs[Boolean]("cap_bound") ==
          (demanded > CurationOps.EpochCapMilli))
        assert(served == tokens * epochs / 1000)
      }
    }
    // the fixture's 2x-corpus budget makes en (share 500 >> its token
    // share) cap-bound and de (share 100 ~ its share) not
    assert(r("en").getAs[Boolean]("cap_bound"))
    assert(!r("de").getAs[Boolean]("cap_bound"))
  }

  test("cross-source dup matrix: planted recrawl/mirror copies land " +
      "in exactly the cells the id arithmetic predicts") {
    val r = CurationOps.crossSourceDups(spark, sf).collect()
      .map(x => (x.getString(0), x.getString(1)) -> x.getLong(2)).toMap
    // sf0.001: source = f(doc_id % 20), so recrawl copies (doc_id%10)
    // pair only with src0/src10 — 25 each of the 50 copies
    assert(r(("recrawl", "src0")) == 25L)
    assert(r(("recrawl", "src10")) == 25L)
    // mirror copies (doc_id%15) spread over src0/src5/src10/src15
    assert(Seq("src0", "src5", "src10", "src15")
      .map(s2 => r(("mirror", s2))).sum == 34L)
    // docs divisible by 30 appear in BOTH planted sets
    assert(r(("mirror", "recrawl")) == 17L)
    // nothing else cross-pairs in this corpus
    assert(r.keys.forall { case (a, b) =>
      a == "recrawl" || a == "mirror" || b == "recrawl" || b == "mirror"
    })
  }

  test("script census: planted script tails count by explicit " +
      "codepoint range, ascii docs stay unmixed") {
    val s2 = spark
    import s2.implicits._
    import graft.operators.TextOps
    val docs = Seq((0L, "abc"), (1L, "abc"), (2L, "abc"), (3L, "abc"))
      .toDF("doc_id", "text")
    val r = TextOps.scriptCensusOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    // doc 0: ' мир текст' = 8 cyrillic letters + 2 spaces
    assert(r(0L).getAs[Long]("cyrillic_n") == 8)
    assert(r(0L).getAs[Boolean]("mixed_script"))
    // doc 1: 4 cjk ideographs
    assert(r(1L).getAs[Long]("cjk_n") == 4)
    // doc 2: 'نص عربي' = 6 arabic letters
    assert(r(2L).getAs[Long]("arabic_n") == 6)
    // doc 3: pure ascii — latin only, nothing mixed
    assert(r(3L).getAs[Long]("latin_n") == 12) // abc + asciionly
    assert(r(3L).getAs[Long]("nonlatin_permille") == 0)
    assert(!r(3L).getAs[Boolean]("mixed_script"))
    // every doc keeps its latin base text
    assert((0L to 3L).forall(i => r(i).getAs[Long]("latin_n") >= 3))
  }

  test("gopher repetition signature: planted line/paragraph repeats " +
      "hit all four fields with hand-counted fractions") {
    val s2 = spark
    import s2.implicits._
    import graft.operators.TextOps
    // doc 1 (1%5!=0, 1%7!=0): no planted repeats, body 'alpha beta'
    //   lines: intro(10) second-intro(17) alpha-beta(10) closing(22)
    // doc 5: tripled 'repeat me' appended -> 2 dup lines of 9 chars
    // doc 7: intro paragraph repeated -> dup para + 2 dup lines
    val docs = Seq((1L, "alpha beta"), (5L, "alpha beta"),
      (7L, "alpha beta")).toDF("doc_id", "text")
    val r = TextOps.gopherRepOf(docs).collect()
      .map(x => x.getLong(0) -> x).toMap
    val d1 = r(1L)
    assert(d1.getAs[Long]("n_lines") == 4)
    assert(d1.getAs[Long]("dup_lines_permille") == 0)
    assert(d1.getAs[Long]("dup_lines_char_permille") == 0)
    assert(d1.getAs[Long]("n_paras") == 3)
    assert(d1.getAs[Long]("dup_paras_permille") == 0)
    val d5 = r(5L)
    assert(d5.getAs[Long]("n_lines") == 7) // 4 + 3 repeats
    assert(d5.getAs[Long]("dup_lines_permille") == 2000 / 7)
    // chars: 10+17+10+22 + 3*9 = 86; dup chars = 2*9 = 18
    assert(d5.getAs[Long]("dup_lines_char_permille") == 18000 / 86)
    assert(d5.getAs[Long]("dup_paras_permille") == 0)
    val d7 = r(7L)
    assert(d7.getAs[Long]("n_paras") == 4)
    assert(d7.getAs[Long]("dup_paras_permille") == 250)
    assert(d7.getAs[Long]("n_lines") == 6)
    assert(d7.getAs[Long]("dup_lines_permille") == 2000 / 6)
  }

  test("paragraph scrub: chrome paragraphs are removed, unique bodies " +
      "survive with a stable fingerprint") {
    val s2 = spark
    import s2.implicits._
    // paraOf wraps each text in a pool header + footer paragraph; with
    // 52 docs each pool paragraph recurs in ~13 docs (≥ 5%), so chrome
    // is always scrubbed. Three docs share one body (3/52 ≥ 5% → also
    // scrubbed, everything dropped); the rest keep exactly their body.
    val ids = (1 to 80).filter(i => i % 6 != 0 && i % 7 != 0 &&
      i % 11 != 0)
    val shared = Set(1, 2, 3)
    val docs = ids.map(i => (i.toLong,
      if (shared(i)) "repeated body paragraph here"
      else s"unique body number $i words")).toDF("doc_id", "text")
    val r = CurationOps.paraScrubOf(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toList
    val fps = scala.collection.mutable.ListBuffer[Long]()
    r.foreach { case (id, nParas, nDropped, cleanFp) =>
      assert(nParas == 3, s"doc $id")
      if (shared(id.toInt))
        assert(nDropped == 3 && cleanFp == 0L, s"doc $id")
      else {
        assert(nDropped == 2 && cleanFp != 0L, s"doc $id")
        fps += cleanFp
      }
    }
    // unique bodies → pairwise-distinct cleaned fingerprints
    assert(fps.distinct.size == fps.size)
  }

  test("ngram novelty: cloned docs score 0, singletons 1000, " +
      "short docs survive with no grams") {
    val s2 = spark
    import s2.implicits._
    val docs = Seq(
      (1L, "one two three four five six"),
      (2L, "one two three four five six"), // exact clone of doc 1
      (3L, "alpha beta gamma delta epsilon"),
      (4L, "hi there")) // too short to shingle
      .toDF("doc_id", "text")
    val r = CurationOps.ngramNoveltyOf(docs).collect()
      .map(x => x.getLong(0) -> (x.getLong(1), x.getLong(2),
        x.getLong(3))).toMap
    assert(r(1L) == ((2L, 0L, 0L)))    // both 5-grams shared with doc 2
    assert(r(2L) == ((2L, 0L, 0L)))
    assert(r(3L) == ((1L, 1L, 1000L))) // its one 5-gram is unique
    assert(r(4L) == ((0L, 0L, 0L)))
  }

  test("contamination verdict: planted benchmark near-copies are " +
      "dropped, organic docs are not") {
    val r = CurationOps.contamVerdict(spark, sf)
    val planted = r.filter(col("doc_id") < 0)
    val organic = r.filter(col("doc_id") >= 0)
    // every planted near-copy of a benchmark doc crosses the 70% gate
    assert(planted.count() > 0)
    assert(planted.filter(!col("drop_doc")).count() == 0)
    // organic drops exist only where the corpus genuinely near-dups a
    // benchmark doc (sf0.001 plants two such twins); the bulk survives
    val organicTotal = organic.count()
    val organicDropped = organic.filter(col("drop_doc")).count()
    assert(organicDropped * 50 < organicTotal) // < 2%
    assert(organicDropped < organicTotal) // both branches exist
  }

  test("line boilerplate: recurring lines are flagged by corpus " +
      "fraction, unique bodies are not") {
    val s2 = spark
    import s2.implicits._
    // ids 1..80 minus multiples of 6/7/11 (no injected defect lines):
    // every page is header + body + footer. Three docs share one body;
    // the rest are unique. 52 docs → threshold = appearing in ≥ 2.6
    // docs, so the 3-doc shared body is boilerplate, unique bodies not.
    val ids = (1 to 80).filter(i => i % 6 != 0 && i % 7 != 0 &&
      i % 11 != 0)
    val shared = Set(1, 2, 3)
    val docs = ids.map(i => (i.toLong,
      if (shared(i)) "repeated body line here"
      else s"unique body number $i words")).toDF("doc_id", "text")
    assert(ids.size == 52)
    val r = CurationOps.lineBoilerplateOf(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3))).toList
    r.foreach { case (id, nLines, nBoiler, permille) =>
      assert(nLines == 3, s"doc $id")
      if (shared(id.toInt))
        assert(nBoiler == 3 && permille == 1000, s"doc $id")
      else
        assert(nBoiler == 2 && permille == 666, s"doc $id")
    }
  }
}
