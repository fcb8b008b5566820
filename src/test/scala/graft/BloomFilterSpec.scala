package graft

import org.apache.spark.sql.functions._

import graft.functions.{BloomFilter, GraftFunctions}

/** Bloom aggregate battery: no false negatives, bounded false
  * positives, partitioning-independent bytes, SQL registration, and
  * the exact-by-construction q79 equivalence.
  */
class BloomFilterSpec extends SparkSuite {
  import spark.implicits._

  private val members = (0L until 2000L).map(_ * 7919L)
  private val bits = 1 << 16
  private val k = 5

  private def bloomOf(parts: Int): Array[Byte] =
    members.toDF("v").repartition(parts)
      .agg(GraftFunctions.bloomAgg(col("v"), bits, k))
      .head.getAs[Array[Byte]](0)

  test("no false negatives; false-positive rate near theory") {
    val bytes = bloomOf(4)
    assert(members.forall(BloomFilter.mightContain(bytes, _)))
    val probes = (1L to 20000L).map(_ * 104729L + 3L)
      .filterNot(members.contains)
    val fp = probes.count(BloomFilter.mightContain(bytes, _))
    // theory: (1 - e^(-kn/m))^k with n=2000, m=65536, k=5 ≈ 2.2e-5;
    // allow two orders of slack — the point is "tiny", not the digit
    assert(fp <= probes.size / 100, s"fp=$fp of ${probes.size}")
  }

  test("bytes are a pure function of the set — merge order immaterial") {
    assert(bloomOf(1).toSeq == bloomOf(8).toSeq)
    // and insertion duplicates change nothing
    val dup = (members ++ members).toDF("v").repartition(3)
      .agg(GraftFunctions.bloomAgg(col("v"), bits, k))
      .head.getAs[Array[Byte]](0)
    assert(dup.toSeq == bloomOf(2).toSeq)
  }

  test("SQL surface: registered functions compose in plain SQL") {
    GraftFunctions.register(spark)
    members.toDF("v").createOrReplaceTempView("bloom_members")
    val got = spark.sql(
      s"""WITH b AS (SELECT graft_bloom_agg(v, $bits, $k) AS bf
         |  FROM bloom_members)
         |SELECT sum(CAST(graft_bloom_contains(b.bf, m.v) AS INT)) AS hits
         |FROM bloom_members m CROSS JOIN b""".stripMargin)
      .as[Long].head()
    assert(got == members.size)
  }

  test("q79 bloom-prefiltered decontamination equals the exact q28") {
    val exact = graft.operators.CurationOps.decontaminate(spark, sf)
      .as[(Long, Long)].collect().toSet
    val bloomed = graft.operators.CurationOps
      .decontaminateBloom(spark, sf)
      .as[(Long, Long)].collect().toSet
    assert(bloomed == exact)
    assert(exact.nonEmpty)
  }
}
