package graft

import org.apache.spark.sql.functions._

import graft.operators.{FuzzyDedup, TextOps}

class DedupSpec extends SparkSuite {
  import spark.implicits._

  // Planted corpus: 0/1 near-dups (one word changed), 2 identical to 0,
  // 3/4 unrelated.
  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog near the old barn"),
    (1L, "the quick brown fox jumps over the lazy cat near the old barn"),
    (2L, "the quick brown fox jumps over the lazy dog near the old barn"),
    (3L, "completely different words about spark query engines and scale"),
    (4L, "partitioning shuffles broadcast joins and adaptive execution"))
    .toDF("doc_id", "text")

  test("shingles: distinct word-5-grams, short docs safe") {
    val sh = corpus.select(col("doc_id"),
      FuzzyDedup.shingles(col("text")).as("sh"))
      .as[(Long, Seq[String])].collect().toMap
    assert(sh(0L).size == 9) // 13 tokens → 9 5-grams
    assert(sh(0L).head == "the quick brown fox jumps")
    val short = Seq((9L, "only four words here")).toDF("doc_id", "text")
      .select(FuzzyDedup.shingles(col("text"))).as[Seq[String]].head
    assert(short.isEmpty) // 4 tokens can't form a 5-gram → guard path
  }

  test("ngram jaccard finds near-dups and exact dups, not unrelated") {
    val pairs = FuzzyDedup.ngramJaccardPairsOf(corpus)
      .select("doc_a", "doc_b", "jaccard").as[(Long, Long, Double)]
      .collect().map { case (a, b, j) => ((a, b), j) }.toMap
    assert(pairs((0L, 2L)) == 1.0) // identical
    assert(pairs((0L, 1L)) > 0.2 && pairs((0L, 1L)) < 1.0) // near-dup
    assert(!pairs.contains((0L, 3L)) && !pairs.contains((3L, 4L)))
  }

  test("minhash signature identical for identical docs") {
    val sigs = corpus
      .select(col("doc_id"),
        FuzzyDedup.shingleHashes(col("text")).as("hs"))
      .select(col("doc_id"),
        FuzzyDedup.minhashSigFromHashes(col("hs")).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(sigs(0L) == sigs(2L))
    assert(sigs(0L) != sigs(3L))
    // near-dup (jaccard ≈ 0.29 → E[shared] ≈ 2.3 of 8) still collides
    // somewhere; unrelated docs share nothing
    val shared = sigs(0L).zip(sigs(1L)).count { case (a, b) => a == b }
    assert(shared >= 1, s"near-dup shared $shared of 8 minhashes")
    assert(sigs(0L).zip(sigs(3L)).count { case (a, b) => a == b } == 0)
  }

  test("simhash: identical docs equal, near-dups close, unrelated far") {
    val fps = corpus.select(col("doc_id"),
      FuzzyDedup.simhash(col("text")).as("fp"))
      .as[(Long, Long)].collect().toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(fps(0L) == fps(2L))
    assert(hamming(fps(0L), fps(1L)) <= 6)
    assert(hamming(fps(0L), fps(3L)) > 6)
  }

  test("bucketed simhash finds exactly the exact-scan pair set") {
    val exact = FuzzyDedup.simhashPairs(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    val bucketed = FuzzyDedup.simhashBuckets(spark, sf)
      .as[(Long, Long, Int)].collect().toSet
    assert(bucketed == exact)
  }

  test("charFold fingerprint: normalization collapses case/whitespace") {
    val a = Seq(("A  Quick   Fox ")).toDF("text")
      .select(TextOps.charFold(TextOps.normText(col("text")))).as[Long].head
    val b = Seq(("a quick fox")).toDF("text")
      .select(TextOps.charFold(TextOps.normText(col("text")))).as[Long].head
    assert(a == b)
  }

  test("edit verify: planted clone confirms with the exact edit " +
      "distance; the gate is the integer 80% rule") {
    // doc 10 (id % 10 == 0) gets an edited clone: each ' the ' becomes
    // ' that ' (+2 edits per occurrence) and ' trailing marker' (+16)
    // appends. The long base text keeps the clone above the 80% gate.
    val base = ("alpha beta the gamma delta epsilon zeta eta theta " +
      "iota kappa the lambda mu nu xi omicron pi rho sigma tau " +
      "upsilon phi chi psi omega one two three four five six seven")
    val docs = Seq(
      (10L, base),
      (3L, "unrelated words that share nothing with anything else"))
      .toDF("doc_id", "text")
    val r = FuzzyDedup.editVerifyOf(docs).collect()
      .map(x => (x.getLong(0), x.getLong(1)) -> x).toMap
    val clone = r((10L, 10L + FuzzyDedup.EditCloneOffset))
    val occ = " the ".r.findAllMatchIn(" " + base + " ").size
    assert(occ == 2)
    val expectedLev = 2L * occ + " trailing marker".length
    assert(clone.getAs[Long]("lev") == expectedLev)
    val maxLen = base.length + occ + " trailing marker".length
    assert(clone.getAs[Long]("max_len") == maxLen.toLong)
    assert(clone.getAs[Boolean]("confirmed") ==
      (expectedLev * 5 <= maxLen))
    assert(clone.getAs[Boolean]("confirmed"))
    assert(clone.getAs[Long]("sim_permille") ==
      (maxLen - expectedLev) * 1000L / maxLen)
    // the unrelated doc never pairs with anything
    assert(!r.keySet.exists { case (a, b) => a == 3L || b == 3L })
  }

  test("lsh s-curve: hand-computed points, monotone, threshold " +
      "brackets (1/b)^(1/r)") {
    val r = graft.operators.FuzzyDedup.lshCurve(spark, sf)
      .collect().map(x => x.getLong(0) -> x.getLong(1)).toMap
    // s=0.5: q=750000, q^4*1e6/1e24 = 316406.25 -> miss 316406,
    // hit 683594 (1-(1-0.25)^4 = 0.68359375 exactly)
    assert(r(500L) == 683594L)
    // s=0.25: 1-(1-0.0625)^4 = 0.22752- (floor arithmetic)
    assert(r(250L) == 227524L)
    // endpoints: tiny at s=0.025, saturated at s=0.975
    assert(r(25L) < 3000L)
    assert(r(975L) > 999000L)
    // strictly monotone in s
    val curve = r.toSeq.sortBy(_._1).map(_._2)
    assert(curve.zip(curve.tail).forall { case (a, b) => a < b })
    // the 50% crossing: s=0.375 gives 1-(0.859375)^4 = 0.4545 and
    // s=0.4 gives 1-(0.84)^4 = 0.50213 — first crossing at 400‰,
    // just below the MMDS inflection approximation (1/b)^(1/r) = 0.5
    val first = r.toSeq.sortBy(_._1).find(_._2 >= 500000L).get._1
    assert(first == 400L)
    assert(r(375L) < 500000L && r(400L) == 502129L)
  }

  test("lsh precision table: partitions the candidate set exactly, " +
      "arithmetic self-consistent, band domain bounded") {
    val fd = graft.operators.FuzzyDedup
    val table = fd.lshPrecision(spark, sf).collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3)))
    // bands beyond the configured 4 can never appear
    assert(table.forall(t => t._1 >= 1 && t._1 <= 4))
    // the table partitions the verified candidate frame exactly
    val verified = fd.editVerify(spark, sf)
    assert(table.map(_._2).sum == verified.count())
    assert(table.map(_._3).sum ==
      verified.filter(org.apache.spark.sql.functions.col("confirmed"))
        .count())
    table.foreach { case (b, pairs, conf, perm) =>
      assert(conf <= pairs, s"bands=$b")
      assert(perm == conf * 1000 / pairs, s"bands=$b")
    }
  }

  test("star edges connect exactly the components the all-pairs " +
      "banding does, with a linear edge budget and diameter 2") {
    val fd = graft.operators.FuzzyDedup
    val docs = Tables.documents(spark, sf)
    val nodes = docs.select(col("doc_id").as("v"))
    val stars = fd.lshStarEdgesOf(docs)
    val allPairs = fd.minhashLshOf(docs)
      .select(col("doc_a").as("a"), col("doc_b").as("b"))
    // min-label components give canonical labels (min doc_id of the
    // component), so partition equality IS frame equality
    val viaStars = graft.operators.CurationOps
      .connectedComponents(nodes, stars.select(col("a"), col("b")))
      .as[(Long, Long)].collect().sorted
    val viaPairs = graft.operators.CurationOps
      .connectedComponents(nodes, allPairs)
      .as[(Long, Long)].collect().sorted
    assert(viaStars.sameElements(viaPairs))
    // the structural bound that makes the star the 100 TB form:
    // edges ≤ band rows (docs × n_bands), regardless of cluster sizes
    val nBands = fd.MinhashA.size / fd.BandRows
    assert(stars.count() <= docs.count() * nBands)

    // planted clusters: a 4-member duplicate bucket emits 3 star
    // edges all anchored at the bucket minimum — not 6 pairs, and not
    // a diameter-3 chain (a chained sf10 cluster blew the label-
    // propagation round bound; the star keeps bucket diameter at 2)
    val clones = Seq.tabulate(4)(i =>
      (10L + i, "the quick brown fox jumps over the lazy dog near " +
        "the old barn tonight")).toDF("doc_id", "text")
    val e = fd.lshStarEdgesOf(clones).as[(Long, Long, Long)].collect()
    assert(e.map(x => (x._1, x._2)).toSet ==
      Set((10L, 11L), (10L, 12L), (10L, 13L)))
    val p = fd.minhashLshOf(clones).count()
    assert(p == 6) // all-pairs would have shipped double the edges here
  }

  test("degenerate mega-bucket: 100k docs sharing one band signature " +
      "produce linear star edges through a window-free plan") {
    // The band signature a real crawl degenerates on: boilerplate /
    // empty-template text repeated across the whole corpus. Every doc
    // hashes to the SAME band key in every band, so all 100k band rows
    // of each band land in one bucket. The old
    // min().over(Window.partitionBy(band_key)) serialized that bucket
    // into one task; the groupBy+join form keeps map-side partial
    // minima and lets AQE skew-split the join probe.
    val fd = FuzzyDedup
    val boiler = "copyright all rights reserved terms of service " +
      "privacy policy contact us about this site map home page"
    val mega = spark.range(100000L)
      .select(col("id").as("doc_id"), lit(boiler).as("text"))
    val edges = fd.lshStarEdgesOf(mega)
    val plan = edges.queryExecution.executedPlan.toString
    assert(!plan.contains("Window"), plan)
    // star shape: every member connects to the bucket minimum (doc 0),
    // once per band — LINEAR in members, where all-pairs would be
    // 100k·(100k−1)/2 ≈ 5e9 pairs
    val nBands = fd.MinhashA.size / fd.BandRows
    val rows = edges.as[(Long, Long, Long)].collect()
    assert(rows.length == 99999)
    assert(rows.forall(_._1 == 0L))
    assert(rows.forall(_._3 == nBands))
  }
}
