package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, HygieneOps}

class HygieneSpec extends SparkSuite {

  test("containment: short doc inside long doc scores ~1 " +
      "while jaccard stays low") {
    val s = spark
    import s.implicits._
    // doc 2 = doc 1's text embedded in a much longer stream: every
    // shingle of doc 2's core appears in doc 1.
    val core = "a b c d e f g h i j"
    val long = core + " k l m n o p q r s t u v w x y z " +
      "aa bb cc dd ee ff gg hh"
    val docs = Seq((1L, long), (2L, core), (3L, "zz yy xx ww vv uu"))
      .toDF("doc_id", "text")
    // force (1,2) as the only candidate pair — candidate generation is
    // q35's job, not this operator's
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    val r = HygieneOps.containmentPairsOf(docs, cand).collect()
    assert(r.length == 1)
    val row = r.head
    val (nc, na, nb) = (row.getAs[Long]("n_common"),
      row.getAs[Long]("n_a"), row.getAs[Long]("n_b"))
    assert(nb == 6)          // 10 tokens -> 6 distinct 5-gram shingles
    assert(nc == nb)         // all of the short doc's shingles re-occur
    assert(row.getAs[Boolean]("contained"))
    assert(row.getAs[Double]("containment") == 1.0)
    // symmetric jaccard would be 6 / (na + 6 - 6) — well under 0.5
    assert(nc.toDouble / (na + nb - nc) < 0.5)
  }

  test("containment: disjoint candidate pair yields no row " +
      "(zero intersection never fabricates a score)") {
    val s = spark
    import s.implicits._
    val docs = Seq((1L, "a b c d e f"), (2L, "t u v w x y"))
      .toDF("doc_id", "text")
    val cand = Seq((1L, 2L)).toDF("doc_a", "doc_b")
    assert(HygieneOps.containmentPairsOf(docs, cand).isEmpty)
  }

  test("canonical election: longest member wins, doc_id breaks ties") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "x", 10L), (2L, "x", 30L), (3L, "x", 30L), // one component
      (9L, "y", 5L)                                   // singleton
    ).toDF("doc_id", "text", "n_chars")
    val comps = Seq((1L, 1L), (2L, 1L), (3L, 1L), (9L, 9L))
      .toDF("doc_id", "component")
    val out = HygieneOps.dupCanonicalOf(docs, comps)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("canonical_id"), r.getAs[Boolean]("is_canonical"))))
      .toMap
    // 2 and 3 tie on n_chars=30 -> smaller doc_id (2) wins
    assert(out(1L) == ((2L, false)))
    assert(out(2L) == ((2L, true)))
    assert(out(3L) == ((2L, false)))
    assert(out(9L) == ((9L, true)))
  }

  test("ann recall: one row per query, n_hits bounded by k, " +
      "identical inputs give recall 1") {
    val out = HygieneOps.annRecall(spark, sf).cache()
    val rows = out.collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (k, h) = (r.getAs[Long]("k"), r.getAs[Long]("n_hits"))
      assert(h >= 0 && h <= k)
      assert(r.getAs[Double]("recall") == h.toDouble / k)
    }
    // sanity against self: exact top-k vs itself recalls everything
    val exact = graft.operators.VectorOps.knn(spark, sf)
      .select(col("query_id"), col("neighbor_id"))
    val self = exact.join(exact, Seq("query_id", "neighbor_id"))
      .groupBy("query_id").count().collect()
    assert(self.forall(_.getAs[Long]("count") == 10L))
    out.unpersist()
  }

  test("int8 quantization: floor semantics hold for negative values " +
      "and codes stay within [-127, 127]") {
    val s = spark
    import s.implicits._
    // embedding floats chosen so scaled ints are exact:
    // xs = [1000000, -500000, 250000], maxabs = 1000000
    // q = floor(x*127/1e6) = [127, -64 (floor of -63.5), 31]
    val df = Seq((1L, Seq(1.0f, -0.5f, 0.25f)))
      .toDF("vec_id", "embedding")
    val r = HygieneOps.quantizeInt8Of(df).collect().head
    assert(r.getAs[Long]("maxabs") == 1000000L)
    assert(r.getAs[Long]("q_min") == -64L)
    assert(r.getAs[Long]("q_max") == 127L)
    // residues: 0, 500000 (=-63.5 floored leaves +0.5*1e6), 750000
    assert(r.getAs[Long]("err_sum") == 0L + 500000L + 750000L)
  }

  test("int8 quantization: zero vector guarded (maxabs clamps to 1)") {
    val s = spark
    import s.implicits._
    val df = Seq((1L, Seq(0.0f, 0.0f))).toDF("vec_id", "embedding")
    val r = HygieneOps.quantizeInt8Of(df).collect().head
    assert(r.getAs[Long]("maxabs") == 1L)
    assert(r.getAs[Long]("q_min") == 0L && r.getAs[Long]("q_max") == 0L)
    assert(r.getAs[Long]("err_sum") == 0L)
  }

  test("dedup purge accounting: kept counts equal canonical members") {
    val out = HygieneOps.dedupPurge(spark, sf).collect()
    val canon = HygieneOps.dupCanonical(spark, sf)
    val docs = Tables.documents(spark, sf)
      .select(col("doc_id"), col("lang"), col("n_chars"))
    val expect = docs.join(canon.select("doc_id", "is_canonical"), "doc_id")
      .groupBy("lang")
      .agg(count(lit(1)).as("n"), sum(when(col("is_canonical"), 1L)
        .otherwise(0L)).as("kept"))
      .collect().map(r => r.getString(0) ->
        ((r.getAs[Long]("n"), r.getAs[Long]("kept")))).toMap
    out.foreach { r =>
      val (n, kept) = expect(r.getAs[String]("lang"))
      assert(r.getAs[Long]("n_docs") == n)
      assert(r.getAs[Long]("n_docs_kept") == kept)
      assert(r.getAs[Long]("chars_kept") <= r.getAs[Long]("chars_total"))
      assert(kept >= 1) // every lang keeps at least one canonical doc
    }
  }

  test("purge keeps exactly one canonical per component") {
    val canon = HygieneOps.dupCanonical(spark, sf)
    val perComp = canon.groupBy("component")
      .agg(sum(when(col("is_canonical"), 1L).otherwise(0L)).as("n_canon"))
      .collect()
    assert(perComp.nonEmpty)
    assert(perComp.forall(_.getAs[Long]("n_canon") == 1L))
  }

  test("dup spans: repeated phrase merges into one maximal span, " +
      "clean docs report zero") {
    val s = spark
    import s.implicits._
    // doc 1 repeats a 6-token phrase: grams at token 0 and 1 of both
    // copies are duplicated, covering [0,5] and [8,13]
    val phrase = "one two three four five six"
    val doc1 = s"$phrase aa bb $phrase"
    // doc 2 contains the phrase once — duplicated vs doc 1's copies
    val doc2 = s"xx $phrase yy"
    val doc3 = "p q r s t u v w" // unique text, no dup grams
    val docs = Seq((1L, doc1), (2L, doc2), (3L, doc3))
      .toDF("doc_id", "text")
    val r = HygieneOps.dupSpansOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_spans"),
          x.getAs[Long]("dup_tokens"),
          x.getAs[Long]("dup_permille")))).toMap
    // doc1: 14 tokens; dup 5-grams start at 0,1 (first copy) and 8,9
    // (second copy) -> spans [0,5] and [8,13], 12 covered tokens
    assert(r(1L) == ((14L, 2L, 12L, 857L)))
    // doc2: 8 tokens, dup grams at 1,2 -> one span [1,6], 6 tokens
    assert(r(2L) == ((8L, 1L, 6L, 750L)))
    assert(r(3L) == ((8L, 0L, 0L, 0L)))
  }

  test("dup spans: adjacent spans coalesce (s <= prev_e + 1)") {
    val s = spark
    import s.implicits._
    // doc 10 = two different duplicated 5-grams back to back: the
    // second span starts exactly at prev_e + 1 and must merge
    val a = "a1 a2 a3 a4 a5"
    val b = "b1 b2 b3 b4 b5"
    val docs = Seq(
      (10L, s"$a $b"),
      (11L, a), (12L, b)).toDF("doc_id", "text")
    val r = HygieneOps.dupSpansOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_spans"), x.getAs[Long]("dup_tokens"))))
      .toMap
    assert(r(10L) == ((1L, 10L))) // one merged span covering all 10
    assert(r(11L) == ((1L, 5L)))
    assert(r(12L) == ((1L, 5L)))
  }

  test("contam spans: train-vs-eval overlap merges; eval excluded; " +
      "clean train doc reports zero") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "the quick brown fox jumps over the lazy dog", "src0"),
      (2L, "intro words then the quick brown fox jumps over the lazy " +
        "dog tail", "src1"),
      (3L, "completely different content with no overlap at all here",
        "src1")).toDF("doc_id", "text", "source")
    val out = HygieneOps.contamSpansOf(docs).collect()
      .map(x => x.getAs[Long]("doc_id") ->
        ((x.getAs[Long]("n_tokens"), x.getAs[Long]("n_spans"),
          x.getAs[Long]("contam_tokens"),
          x.getAs[Long]("contam_permille")))).toMap
    // eval doc never appears in the report
    assert(out.keySet == Set(2L, 3L))
    // d2 tokens 3..11 ("the quick ... dog") shingle-match the eval
    // doc: hits at s=3..7 merge to one span of 9 tokens
    assert(out(2L) == ((13L, 1L, 9L, 9L * 1000 / 13)))
    assert(out(3L) == ((9L, 0L, 0L, 0L)))
  }

  test("winnowing: every fingerprint is its window's minimum with the " +
      "rightmost tied position (explode+group reference equality)") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m n o p"),
      (2L, "one two three four five six seven"),
      (3L, "x x x x x x x x x x")) // all grams identical → ties
      .toDF("doc_id", "text")
    val got = HygieneOps.winnowOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    // independent reference: explode the positional gram hashes and
    // select per-window minima the slow way
    val grams = docs.select(col("doc_id"), posexplode(
        graft.functions.GraftFunctions.shingleHashesPos(col("text")))
        .as(Seq("s", "h")))
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
      .groupBy(_._1)
    val w = HygieneOps.WinnowWindow
    val ref = grams.flatMap { case (doc, rows) =>
      val hs = rows.sortBy(_._2).map(_._3)
      val ng = hs.length
      (0 to math.max(ng - w, 0)).map { wi =>
        val sl = hs.slice(wi, math.min(wi + w, ng))
        val mh = sl.min
        val pos = (wi until math.min(wi + w, ng))
          .filter(i => hs(i) == mh).max
        (doc, pos.toLong, mh)
      }
    }.toSet
    assert(got == ref)
    // tie doc: identical hashes → rightmost of each window selected
    val tiePos = got.filter(_._1 == 3L).map(_._2)
    // 10 tokens → 6 grams (s=0..5), windows 0..2 pick s=3,4,5
    assert(tiePos == Set(3L, 4L, 5L))
  }

  test("winnowing guarantee: docs sharing >= w+n-1 consecutive tokens " +
      "share a fingerprint hash; short docs degrade gracefully") {
    val s = spark
    import s.implicits._
    val shared = "alpha beta gamma delta epsilon zeta eta theta" // 8 toks
    val docs = Seq(
      (1L, "p q r s t u " + shared + " v w x y z"),
      (2L, shared + " completely different trailing words here"),
      (3L, "tiny doc"), // < 5 tokens → no grams → no fingerprints
      (4L, "five token doc right here")) // exactly 5 → 1 gram, 1 window
      .toDF("doc_id", "text")
    val fp = HygieneOps.winnowOf(docs).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
    val h1 = fp.filter(_._1 == 1L).map(_._2).toSet
    val h2 = fp.filter(_._1 == 2L).map(_._2).toSet
    assert(h1.intersect(h2).nonEmpty)
    assert(!fp.exists(_._1 == 3L))
    assert(fp.count(_._1 == 4L) == 1)
  }

  test("winnow matches localize the shared run and gate out " +
      "single-fingerprint noise") {
    val s = spark
    import s.implicits._
    val run = "alpha beta gamma delta epsilon zeta eta theta iota " +
      "kappa lambda mu nu xi omicron pi" // 16 shared tokens
    val docs = Seq(
      (1L, "p q r s t u v w " + run),            // run at tokens 8..23
      (2L, run + " different tail words here now"), // run at tokens 0..15
      (3L, "totally unrelated content with zero overlap present"))
      .toDF("doc_id", "text")
    val m = HygieneOps.winnowMatchesOf(docs).collect()
    assert(m.length == 1)
    val row = m.head
    assert(row.getAs[Long]("doc_a") == 1L &&
      row.getAs[Long]("doc_b") == 2L)
    // 16 shared tokens → 12 shared gram hashes → several fingerprints
    assert(row.getAs[Long]("n_shared") >= 2)
    // leftmost matched positions sit inside each doc's run
    assert(row.getAs[Long]("min_pos_a") >= 8L &&
      row.getAs[Long]("min_pos_a") <= 19L)
    assert(row.getAs[Long]("min_pos_b") <= 11L)
    // raising the gate above the shared count empties the report
    assert(HygieneOps.winnowMatchesOf(docs, minShared = 100).isEmpty)
  }
}
