package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions
import graft.operators.TextOps

class GraftExpressionsSpec extends SparkSuite {
  import spark.implicits._

  test("native charFold equals the composed HOF reference on real docs") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    val mismatches = d.select(
      TextOps.charFold(col("text")).as("fast"),
      TextOps.charFoldHof(col("text")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("native charFold handles empty / unicode strings like the HOF") {
    GraftFunctions.register(spark)
    val df = Seq("", "a", "abc", "héllo wörld", "日本語テキスト")
      .toDF("s")
    val rows = df.select(TextOps.charFold(col("s")),
      TextOps.charFoldHof(col("s"))).as[(Long, Long)].collect()
    rows.foreach { case (fast, ref) => assert(fast == ref) }
  }

  test("native nfc composes canonical sequences and is an identity " +
      "on already-normalized text") {
    GraftFunctions.register(spark)
    val decomposed = "cafe\u0301"            // e + combining acute
    val composed = "caf\u00e9"
    val angstromDec = "A\u030Angstro\u0308m" // ring + diaeresis
    val angstromNfc = "\u00c5ngstr\u00f6m"
    val sDots = "s\u0323\u0307"              // dot-below + dot-above
    val df = Seq(decomposed, composed, angstromDec, "plain ascii", "",
      sDots).toDF("s")
    val rows = df.select(col("s"), GraftFunctions.nfc(col("s")))
      .as[(String, String)].collect().toMap
    assert(rows(decomposed) == composed)
    assert(rows(angstromDec) == angstromNfc)
    assert(rows(composed) == composed) // already-NFC fast path
    assert(rows("plain ascii") == "plain ascii")
    assert(rows("") == "")
    // agreement vector straight from UAX #15: NFC(s+0323+0307) = U+1E69
    assert(rows(sDots) == "\u1e69")
    // null propagates
    val n = Seq[Option[String]](None).toDF("s")
      .select(GraftFunctions.nfc(col("s"))).collect()
    assert(n.head.isNullAt(0))
    // and the SQL registration form agrees
    val viaSql = spark.sql(
      s"SELECT graft_nfc('$decomposed')").as[String].head
    assert(viaSql == composed)
  }

  test("native shingleHashes equals the composed pipeline on real docs") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    val mismatches = d.select(
      graft.operators.FuzzyDedup.shingleHashes(col("text")).as("fast"),
      graft.operators.FuzzyDedup.shingleHashesHof(col("text")).as("ref"))
      .filter(expr("array_sort(fast) != array_sort(ref)")).count()
    assert(mismatches == 0)
    // edge cases: tabs survive Spark's space-only trim; short docs empty
    val edge = Seq("\ta b c d e\t", "  x y z  ", "one two",
      "a  b   c d e f").toDF("text")
    val bad = edge.select(
      graft.operators.FuzzyDedup.shingleHashes(col("text")).as("fast"),
      graft.operators.FuzzyDedup.shingleHashesHof(col("text")).as("ref"))
      .filter(expr("array_sort(fast) != array_sort(ref)")).count()
    assert(bad == 0)
  }

  test("positional shingle hashes equal the composed per-position " +
      "charFold chain on real docs") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
    // composed reference: hash of the gram STRING at every position
    val toks = org.apache.spark.sql.functions.split(
      org.apache.spark.sql.functions.trim(col("text")), "\\s+")
    val nG = size(toks) - 4
    val ref = when(nG >= 1,
      transform(sequence(lit(1), greatest(nG, lit(1))),
        i => graft.operators.TextOps.charFold(
          concat_ws(" ", slice(toks, i, lit(5))))))
      .otherwise(array().cast("array<long>"))
    val mismatches = d.select(
      GraftFunctions.shingleHashesPos(col("text")).as("fast"),
      ref.as("ref"))
      .filter(expr("fast != ref")).count() // order matters: no sort
    assert(mismatches == 0)
    // repeats must NOT dedup — element i is the gram at token i
    val rep = Seq("a b c d e a b c d e a b c d e").toDF("text")
    val arr = rep.select(GraftFunctions.shingleHashesPos(col("text")))
      .head().getSeq[Long](0)
    assert(arr.length == 11)
    assert(arr(0) == arr(5) && arr(0) == arr(10))
  }

  test("native simhash equals the composed 30-pass reference on real docs") {
    GraftFunctions.register(spark)
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.FuzzyDedup.tokenHashes(col("text")).as("hs"))
    val mismatches = d.select(
      graft.operators.FuzzyDedup.simhashFromHashes(col("hs")).as("fast"),
      graft.operators.FuzzyDedup.simhashFromHashesHof(col("hs")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
  }

  test("native minhash signature equals the composed 8-pass reference") {
    GraftFunctions.register(spark)
    // constants in the native expression must mirror the operator's
    assert(graft.functions.MinHashSig.A.toSeq ==
      graft.operators.FuzzyDedup.MinhashA)
    assert(graft.functions.MinHashSig.B.toSeq ==
      graft.operators.FuzzyDedup.MinhashB)
    val d = Tables.documents(spark, sf)
      .select(col("doc_id"),
        graft.operators.FuzzyDedup.shingleHashes(col("text")).as("hs"))
    val mismatches = d.select(
      graft.operators.FuzzyDedup.minhashSigFromHashes(col("hs")).as("fast"),
      graft.operators.FuzzyDedup.minhashSigFromHashesHof(col("hs")).as("ref"))
      .filter(col("fast") =!= col("ref")).count()
    assert(mismatches == 0)
    // empty-input edge: both produce an all-null signature
    val empty = Seq(Seq.empty[Long]).toDF("hs")
    val (f, r) = empty.select(
      graft.operators.FuzzyDedup.minhashSigFromHashes(col("hs")),
      graft.operators.FuzzyDedup.minhashSigFromHashesHof(col("hs")))
      .as[(Seq[Option[Long]], Seq[Option[Long]])].head()
    assert(f == r && f.forall(_.isEmpty) && f.size == 8)
  }

  test("KMV aggregate: k smallest distinct values, any partitioning") {
    GraftFunctions.register(spark)
    val vals = Seq(50L, 10L, 30L, 10L, 90L, 20L, 40L, 30L, 70L)
    // answer independent of partition layout (merge-order invariance)
    Seq(1, 3, 7).foreach { parts =>
      val df = spark.sparkContext.parallelize(vals, parts).toDF("v")
      val got = df.agg(GraftFunctions.kminValues(col("v"), 4))
        .as[Seq[Long]].head()
      assert(got == Seq(10L, 20L, 30L, 40L), s"parts=$parts")
    }
    // fewer distinct values than k → all of them
    val small = Seq(5L, 5L, 2L).toDF("v")
      .agg(GraftFunctions.kminValues(col("v"), 4)).as[Seq[Long]].head()
    assert(small == Seq(2L, 5L))
    // grouped + SQL surface
    Seq((1L, 4L), (1L, 2L), (2L, 9L)).toDF("g", "v")
      .createOrReplaceTempView("kmv_v")
    val sql = spark.sql(
      "SELECT g, graft_kmin_values(v, 4) FROM kmv_v GROUP BY g ORDER BY g")
      .as[(Long, Seq[Long])].collect()
    assert(sql.toSeq == Seq((1L, Seq(2L, 4L)), (2L, Seq(9L))))
  }

  test("native longDot matches manual sum and works in SQL") {
    GraftFunctions.register(spark)
    val df = Seq((Array(1L, 2L, 3L), Array(4L, 5L, 6L)))
      .toDF("a", "b")
    assert(df.select(GraftFunctions.longDot(col("a"), col("b")))
      .as[Long].head() == 32L)
    df.createOrReplaceTempView("v")
    assert(spark.sql("SELECT graft_long_dot(a, b) FROM v")
      .as[Long].head() == 32L)
  }

  test("native scaledLongs is bit-identical to the composed round/cast") {
    GraftFunctions.register(spark)
    // adversarial values: negatives, halves landing on .5 in the
    // shortest-decimal rendering, denormal-ish smalls, exact ints
    val vecs = Seq(
      Array(0.1234565f, -0.1234565f, 0.5f, -0.5f, 1.0f, -1.0f),
      Array(0.0000005f, -0.0000005f, 0.9999995f, -0.9999995f, 0f, -0f),
      Array(1.5e-6f, -1.5e-6f, 2.5e-6f, -2.5e-6f, 3.3333333f, 5.3e5f))
    val df = vecs.map(v => Tuple1(v)).toDF("v")
    val native = df.select(GraftFunctions.scaledLongs(col("v")))
      .as[Seq[Long]].collect().toSeq
    val composed = df.select(transform(col("v"),
        x => round(x.cast("double") * lit(1e6)).cast("long")))
      .as[Seq[Long]].collect().toSeq
    assert(native == composed)
    // and a broad randomized sweep (fixed seed)
    val rnd = new scala.util.Random(7)
    val many = Seq.fill(200)(Array.fill(16)(
      (rnd.nextFloat() - 0.5f) * 2f)).map(Tuple1(_)).toDF("v")
    val n2 = many.select(GraftFunctions.scaledLongs(col("v")))
      .as[Seq[Long]].collect().toSeq
    val c2 = many.select(transform(col("v"),
        x => round(x.cast("double") * lit(1e6)).cast("long")))
      .as[Seq[Long]].collect().toSeq
    assert(n2 == c2)
    // null elements propagate like the composed form (not silently 0)
    val withNulls = Seq(Tuple1(Seq[java.lang.Double](0.5, null, -1.5)))
      .toDF("v")
    val nn = withNulls.select(GraftFunctions.scaledLongs(col("v")))
      .collect().head.getSeq[Any](0)
    val nc = withNulls.select(transform(col("v"),
        x => round(x.cast("double") * lit(1e6)).cast("long")))
      .collect().head.getSeq[Any](0)
    assert(nn == nc && nn(1) == null)
  }

  test("native expressions usable inside higher-order lambdas") {
    GraftFunctions.register(spark)
    val df = Seq(Seq("ab", "cd")).toDF("xs")
    val out = df.select(transform(col("xs"),
      s => TextOps.charFold(s)).as("hs")).as[Seq[Long]].head()
    assert(out == Seq((97L * 31 + 98) % TextOps.FoldP,
      (99L * 31 + 100) % TextOps.FoldP))
  }

  test("native winnowing deque equals the composed HOF reference on " +
      "real docs (including tie and short-doc shapes)") {
    import graft.operators.HygieneOps
    val s = spark
    import s.implicits._
    val real = Tables.documents(spark, sf).limit(300)
      .select("doc_id", "text")
    val edge = Seq((100001L, "x x x x x x x x x x"),
      (100002L, "five token doc right here"),
      (100003L, "tiny"),
      (100004L, "")).toDF("doc_id", "text")
    val docs = real.unionByName(edge)
    val native = HygieneOps.winnowOf(docs)
      .as[(Long, Long, Long)].collect().toSet
    val composed = HygieneOps.winnowOfComposed(docs)
      .as[(Long, Long, Long)].collect().toSet
    assert(native == composed)
    assert(native.nonEmpty)
  }
}
