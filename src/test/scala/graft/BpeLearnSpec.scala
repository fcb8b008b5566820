package graft

import org.apache.spark.sql.functions._

import graft.operators.BpeLearn

class BpeLearnSpec extends SparkSuite {

  // the classic BPE teaching corpus: low×5, lower×2, newest×6, widest×3
  private def corpus = {
    val s = spark
    import s.implicits._
    Seq(
      (1L, "low low low low low"),
      (2L, "lower lower"),
      (3L, "newest newest newest newest newest newest"),
      (4L, "widest widest widest")).toDF("doc_id", "text")
  }

  test("first merges match the hand-computed classic example") {
    val merges = BpeLearn.learnMerges(corpus, 3)
    // round 1: (e,s) and (s,t) both count 9 (newest 6 + widest 3);
    // lexicographic tie-break picks (e,s)
    assert(merges(0) == BpeLearn.Merge("e", "s", 9L))
    // round 2: (es,t) now counts 9 — the merged symbol pairs on
    assert(merges(1) == BpeLearn.Merge("es", "t", 9L))
    // round 3: (l,o) and (o,w) tie at 7 (low 5 + lower 2); (l,o) wins
    assert(merges(2) == BpeLearn.Merge("l", "o", 7L))
  }

  test("merge application is greedy left-to-right") {
    val s = spark
    import s.implicits._
    val words = Seq((Seq("a", "a", "a"), 1L), (Seq("a", "b", "a", "b"), 1L))
      .toDF("symbols", "freq")
    val aa = BpeLearn.applyMerge(words, "a", "a")
      .select("symbols").as[Seq[String]].collect().toSet
    // "aaa" -> [aa, a]: the merged symbol does not re-merge backward
    assert(aa.contains(Seq("aa", "a")))
    val ab = BpeLearn.applyMerge(words, "a", "b")
      .select("symbols").as[Seq[String]].collect().toSet
    assert(ab.contains(Seq("ab", "ab")))
  }

  test("merges monotonically shrink the symbol count") {
    val freqs = BpeLearn.wordFreqs(corpus)
    val w0 = BpeLearn.initialSymbols(freqs)
    val n0 = w0.select(sum(size(col("symbols")) * col("freq")))
      .head().getLong(0)
    val w1 = BpeLearn.applyMerge(w0, "e", "s")
    val n1 = w1.select(sum(size(col("symbols")) * col("freq")))
      .head().getLong(0)
    // es occurs once in newest (6) and widest (3): 9 merges removed
    assert(n0 - n1 == 9L)
  }

  test("bpe encode: rank-greedy application matches hand encodings") {
    val s = spark
    import s.implicits._
    import graft.functions.GraftFunctions
    val merges = Seq(("e", "s"), ("es", "t"), ("l", "o"))
    val df = Seq((1L, "newest low"), (2L, "best!"), (3L, ""))
      .toDF("doc_id", "text")
    val enc = df.select(col("doc_id"),
      GraftFunctions.bpeEncode(col("text"), merges).as("toks"))
      .as[(Long, Seq[String])].collect().toMap
    // newest: n,e,w,e,s,t -> (e,s) -> n,e,w,es,t -> (es,t) -> n,e,w,est
    // low: l,o,w -> (l,o) -> lo,w
    assert(enc(1L) == Seq("n", "e", "w", "est", "lo", "w"))
    // best: b,e,s,t -> (e,s) rank 0 -> b,es,t -> (es,t) rank 1 ->
    // b,est; '!' is its own punctuation pre-token
    assert(enc(2L) == Seq("b", "est", "!"))
    assert(enc(3L) == Seq.empty)
    // uppercase folds into the trained lowercase vocabulary
    val up = Seq((9L, "NEWEST")).toDF("doc_id", "text")
      .select(GraftFunctions.bpeEncode(col("text"), merges))
      .head().getSeq[String](0)
    assert(up == Seq("n", "e", "w", "est"))
  }

  test("encode conserves the trainer's vocabulary state") {
    // after learning k merges, encoding the training corpus must give
    // exactly the symbol mass the trainer's final words table holds
    val merges = BpeLearn.learnMerges(corpus, 3)
    val words = merges.foldLeft(
      BpeLearn.initialSymbols(BpeLearn.wordFreqs(corpus))) {
      case (w, m) => BpeLearn.applyMerge(w, m.left, m.right)
    }
    val trainerMass = words
      .select(sum(size(col("symbols")) * col("freq"))).head().getLong(0)
    val encodedMass = BpeLearn.tokenCounts(corpus,
        merges.map(m => (m.left, m.right)))
      .select(sum(col("n_bpe_tokens"))).head().getLong(0)
    assert(encodedMass == trainerMass)
  }

  test("driver-local merge loop (one census, local rounds) is " +
      "identical to the per-round Spark loop") {
    // the classic fixture: every merge AND count must agree
    val sparkLoop = BpeLearn.learnMerges(corpus, 8)
    val localLoop = BpeLearn.learnMergesLocal(corpus, 8)
    assert(localLoop == sparkLoop)

    // a messier corpus: ties, punctuation, overlapping runs ("aaaa"
    // exercises greedy rewrite + incremental stats after self-merge)
    val s = spark
    import s.implicits._
    val messy = Seq(
      (1L, "aaaa aaaa aa baab"),
      (2L, "the cat, the hat; the flat cat"),
      (3L, "zz zzz z az za")).toDF("doc_id", "text")
    val sparkMessy = BpeLearn.learnMerges(messy, 10)
    val localMessy = BpeLearn.learnMergesLocal(messy, 10)
    assert(localMessy == sparkMessy)

    // real documents: first 12 merges agree on the sf fixture
    val docs = Tables.documents(spark, sf).limit(120)
      .localCheckpoint(true)
    assert(BpeLearn.learnMergesLocal(docs, 12) ==
      BpeLearn.learnMerges(docs, 12))
  }

  test("pair counts: singleton symbols contribute nothing") {
    val s = spark
    import s.implicits._
    val words = Seq((Seq("x"), 7L), (Seq("a", "b"), 2L))
      .toDF("symbols", "freq")
    val pc = BpeLearn.pairCounts(words).collect()
    assert(pc.length == 1)
    assert(pc.head.getAs[String]("left_sym") == "a" &&
      pc.head.getAs[Long]("cnt") == 2L)
  }
}
