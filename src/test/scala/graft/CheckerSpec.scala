package graft

import org.apache.spark.sql.functions._

import graft.operators.Checker

class CheckerSpec extends SparkSuite {
  import spark.implicits._

  private def src = Seq(
    (1L, 10.0, "a"), // OK
    (2L, 20.0, "b"), // DIFF (v differs)
    (3L, Double.NaN, "c"), // OK — NaN == NaN must hold
    (4L, 40.0, "d")) // MISS (absent in dst)
    .toDF("k", "v", "s")

  private def dst = Seq(
    (1L, 10.0, "a"),
    (2L, 21.0, "b"),
    (3L, Double.NaN, "c"),
    (5L, 50.0, "e")) // ORPHAN
    .toDF("k", "v", "s")

  test("diff classifies MISS/ORPHAN/DIFF/OK with NaN-tolerant equality") {
    val out = Checker.diff(src, dst, Seq("k"))
      .select(col("k"), col(Checker.StatusCol)).as[(Long, String)]
      .collect().toMap
    assert(out(1L) == "OK")
    assert(out(2L) == "DIFF")
    assert(out(3L) == "OK") // NaN == NaN (reference col_value.rs:135-150)
    assert(out(4L) == "MISS")
    assert(out(5L) == "ORPHAN")
  }

  test("diff_cols lists exactly the differing columns, sorted") {
    val out = Checker.diff(src, dst, Seq("k"))
      .filter(col(Checker.StatusCol) === "DIFF")
      .select(col("k"), col(Checker.DiffColsCol)).as[(Long, Seq[String])]
      .collect().toMap
    assert(out(2L) == Seq("v"))
  }

  test("revise ops map MISS→insert DIFF→update ORPHAN→delete") {
    val out = Checker.diff(src, dst, Seq("k"))
      .filter(col(Checker.StatusCol) =!= "OK")
      .select(col("k"), Checker.reviseOp(col(Checker.StatusCol)))
      .as[(Long, String)].collect().toMap
    assert(out == Map(2L -> "update", 4L -> "insert", 5L -> "delete"))
  }

  test("placeholder revise SQL shapes") {
    val out = Checker.diff(src, dst, Seq("k"))
      .filter(col(Checker.StatusCol) =!= "OK")
      .select(col("k"), Checker.reviseSqlPlaceholder("t", Seq("k"),
        col(Checker.DiffColsCol), col(Checker.StatusCol)))
      .as[(Long, String)].collect().toMap
    assert(out(2L) == "UPDATE t SET v=? WHERE k=2")
    assert(out(4L) == "INSERT INTO t VALUES (?)")
    assert(out(5L) == "DELETE FROM t WHERE k=5")
  }

  test("TOAST sentinel compares equal regardless of target value") {
    val df = Seq(
      (Checker.ToastSentinel, "whatever"),
      ("same", "same"),
      ("a", "b")).toDF("src", "dst")
    val out = df.select(
      Checker.tolerantEqToast(col("src"), col("dst"))).as[Boolean]
      .collect().toSeq
    assert(out == Seq(true, true, false))
  }

  test("doc-level diff lists missing and differing fields, sorted") {
    val df = Seq((
      Map("a" -> "1", "b" -> "2", "c" -> "3"),
      Map("a" -> "1", "b" -> "9", "d" -> "4")))
      .toDF("src", "dst")
    val fields = df.select(
      Checker.docDiffFields(col("src"), col("dst"))).as[Seq[String]]
      .head()
    assert(fields == Seq("b", "c", "d"))
  }

  test("sampling filter keeps ~rate% deterministically") {
    val df = spark.range(10000).toDF("k1").withColumn("k2", lit(0L))
    val h = Checker.arithKeyHash(col("k1"), col("k2"))
    val n = df.filter(Checker.sampleFilter(h, 10)).count()
    assert(n > 800 && n < 1200)
    // deterministic: same filter twice, same rows
    val a = df.filter(Checker.sampleFilter(h, 10)).collect().toSet
    val b = df.filter(Checker.sampleFilter(h, 10)).collect().toSet
    assert(a == b)
  }

  private def eqVector(cmp: (org.apache.spark.sql.Column,
      org.apache.spark.sql.Column) => org.apache.spark.sql.Column,
      vectors: Seq[(String, String, Boolean)]): Unit = {
    val df = vectors.zipWithIndex
      .map { case ((a, b, want), i) => (i, a, b, want) }
      .toDF("i", "a", "b", "want")
    val got = df.withColumn("got", cmp(col("a"), col("b")))
      .filter(col("got") =!= col("want"))
      .select("a", "b", "want").collect()
    assert(got.isEmpty, s"mismatched vectors: ${got.mkString(", ")}")
  }

  test("pg network tolerance: /32 and /128 host suffixes strip") {
    // reference checker_engine.rs:269-294 vectors
    eqVector(Checker.tolerantEqPgNetwork, Seq(
      ("10.0.0.1", "10.0.0.1/32", true),
      ("10.0.0.1/32", "10.0.0.1", true),
      ("10.0.0.1/32", "10.0.0.1/32", true),
      ("::1", "::1/128", true),
      ("10.0.0.0/24", "10.0.0.0", false), // real prefix must not strip
      ("10.0.0.0/24", "10.0.0.0/24", true),
      ("10.0.0.1", "10.0.0.2/32", false),
      (null, null, true),
      ("10.0.0.1", null, false)))
  }

  test("unsigned bigint tolerance: binlog i64 wrap equals unsigned read") {
    eqVector(Checker.tolerantEqUnsigned, Seq(
      ("-1", "18446744073709551615", true),
      ("18446744073709551615", "-1", true),
      ("-9223372036854775808", "9223372036854775808", true),
      ("42", "42", true),
      ("-2", "18446744073709551615", false),
      (null, null, true),
      ("0", null, false),
      // malformed renderings must not crash (ANSI cast) nor compare
      // equal as a pair of nulls (non-ANSI cast): they fall back to the
      // strict comparison and surface as diffs
      ("garbage", "42", false),
      ("garbage", "other-garbage", false),
      ("garbage", "garbage", true)))
  }

  test("zero-date tolerance: 0000-00-00 matches NULL and itself") {
    eqVector(Checker.tolerantEqZeroDate, Seq(
      ("0000-00-00", null, true),
      (null, "0000-00-00 00:00:00", true),
      ("0000-00-00 00:00:00", "0000-00-00", true),
      ("2024-01-01", "2024-01-01", true),
      ("2024-01-01", null, false),
      ("2024-01-01", "2024-01-02", false)))
  }

  test("type-aware dispatch picks the tolerant comparator") {
    eqVector(Checker.tolerantEqFor("inet"), Seq(
      ("10.0.0.1", "10.0.0.1/32", true)))
    eqVector(Checker.tolerantEqFor("BIGINT UNSIGNED"), Seq(
      ("-1", "18446744073709551615", true)))
    eqVector(Checker.tolerantEqFor("datetime"), Seq(
      ("0000-00-00 00:00:00", null, true)))
    // default comparator stays strict
    eqVector(Checker.tolerantEqFor("text"), Seq(
      ("10.0.0.1", "10.0.0.1/32", false)))
  }
}
