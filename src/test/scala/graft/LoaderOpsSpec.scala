package graft

import org.apache.spark.sql.functions._

import graft.operators.LoaderOps

class LoaderOpsSpec extends SparkSuite {

  test("shard shuffle: a permutation — every doc exactly once, " +
      "dense 1..shard_n positions per shard") {
    val s = spark
    import s.implicits._
    val docs = (0L until 200L).map(i => (i, s"text $i"))
      .toDF("doc_id", "text")
    val r = LoaderOps.shardShuffleOf(spark, docs, 8).cache()
    assert(r.count() == 200)
    assert(r.select("doc_id").distinct().count() == 200)
    val shards = r.select("shard").distinct().as[Long].collect().sorted
    assert(shards.forall(sh => sh >= 0 && sh < 8))
    // positions are exactly 1..shard_n inside every shard
    val bad = r.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"),
        max("pos").as("hi"), countDistinct("pos").as("d"),
        max("shard_n").as("sn"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n") ||
        col("d") =!= col("n") || col("sn") =!= col("n"))
    assert(bad.isEmpty)
    r.unpersist()
  }

  test("shard shuffle: deterministic across runs and equal to the " +
      "window-rank formulation") {
    val s = spark
    import s.implicits._
    val docs = (0L until 97L).map(i => (i, s"d$i")).toDF("doc_id", "text")
    val a = LoaderOps.shardShuffleOf(spark, docs, 5).collect().toSet
    val b = LoaderOps.shardShuffleOf(spark, docs, 5).collect().toSet
    assert(a == b)
    // independent reference: plain window row_number over the same key
    val ref = docs.selectExpr("doc_id",
        s"md5(concat(cast(doc_id as string), '${LoaderOps.ShuffleSeed}')) as k")
      .selectExpr("doc_id", "k",
        """cast(((((instr('0123456789abcdef', substring(k, 1, 1)) - 1) * 16
          | + instr('0123456789abcdef', substring(k, 2, 1)) - 1) * 16
          | + instr('0123456789abcdef', substring(k, 3, 1)) - 1) * 16
          | + instr('0123456789abcdef', substring(k, 4, 1)) - 1) % 5
          | as bigint) as shard""".stripMargin)
      .selectExpr("doc_id", "shard",
        "cast(row_number() over (partition by shard order by k, doc_id) as bigint) as pos",
        "cast(count(*) over (partition by shard) as bigint) as shard_n")
      .select("doc_id", "shard", "pos", "shard_n").collect().toSet
    assert(a.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getLong(3))) ==
      ref.map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))))
  }

  test("shard shuffle: changing the shard count re-buckets but keeps " +
      "the permutation property") {
    val s = spark
    import s.implicits._
    val docs = (0L until 64L).map(i => (i, "t")).toDF("doc_id", "text")
    val r = LoaderOps.shardShuffleOf(spark, docs, 1).collect()
    assert(r.forall(_.getLong(1) == 0L))
    assert(r.map(_.getLong(2)).sorted.toSeq == (1L to 64L))
  }

  test("lang temperature: rarest language gets the top relative " +
      "weight, weights fall with count, permille bounded") {
    val s = spark
    import s.implicits._
    val docs =
      ((1 to 80).map(i => (i.toLong, "en")) ++
        (81 to 96).map(i => (i.toLong, "fr")) ++
        (97 to 100).map(i => (i.toLong, "sw")))
        .toDF("doc_id", "lang")
    val r = LoaderOps.langTemperatureOf(docs).collect()
      .map(row => (row.getString(0), row.getLong(1), row.getDouble(2),
        row.getDouble(3), row.getLong(4), row.getLong(5)))
      .sortBy(_._2).toSeq
    assert(r.map(_._1) == Seq("sw", "fr", "en"))
    // α=0.5: weight = sqrt(total/count)
    assert(r.head._3 == math.sqrt(100.0 / 4))
    assert(r.last._3 == math.sqrt(100.0 / 80))
    // rarest is the reference point: rel 1.0 and keep 1000 permille
    assert(r.head._4 == 1.0 && r.head._5 == 1000L)
    assert(r.head._6 == 4L)
    // monotone: more docs -> smaller weight and permille
    assert(r.sliding(2).forall { case Seq(a, b) =>
      a._3 > b._3 && a._5 >= b._5 })
    assert(r.forall(x => x._5 > 0 && x._5 <= 1000))
    assert(r.forall(x => x._6 <= x._2))
  }

  test("sliding chunks: full coverage, fixed stride, exact tail, and " +
      "identical spans share fingerprints") {
    val s = spark
    import s.implicits._
    val docs = Seq(
      (1L, (1 to 40).map(i => s"w$i").mkString(" ")), // 40 toks → 4 chunks
      (2L, (1 to 16).map(i => s"w$i").mkString(" ")), // exactly one window
      (3L, "short doc here"),                          // n < len → 1 chunk
      (4L, (1 to 40).map(i => s"w$i").mkString(" "))) // clone of doc 1
      .toDF("doc_id", "text")
    val r = LoaderOps.slidingChunksOf(docs, 16, 8)
      .as[(Long, Long, Long, Long, Long)].collect()
    val byDoc = r.groupBy(_._1)
    // 40 tokens, len 16, stride 8 → 1 + ceil(24/8) = 4 chunks
    assert(byDoc(1L).length == 4)
    assert(byDoc(2L).length == 1 && byDoc(2L).head._4 == 16L)
    assert(byDoc(3L).length == 1 && byDoc(3L).head._4 == 3L)
    // starts advance by the stride; the last chunk reaches the end
    val c1 = byDoc(1L).sortBy(_._2)
    assert(c1.map(_._3).toSeq == Seq(0L, 8L, 16L, 24L))
    assert(c1.last._3 + c1.last._4 == 40L)
    assert(c1.forall(_._4 == 16L))
    // clone doc: identical spans → identical fingerprints
    val fp1 = c1.map(c => (c._2, c._5)).toSet
    val fp4 = byDoc(4L).map(c => (c._2, c._5)).toSet
    assert(fp1 == fp4)
    // distinct spans within a doc get distinct fingerprints here
    assert(c1.map(_._5).distinct.length == 4)
  }

  test("lang temperature: uniform corpus is left alone " +
      "(all weights equal, keep = 1000)") {
    val s = spark
    import s.implicits._
    val docs = (1 to 30).map(i =>
      (i.toLong, Seq("en", "fr", "de")(i % 3))).toDF("doc_id", "lang")
    val r = LoaderOps.langTemperatureOf(docs).collect()
    assert(r.length == 3)
    assert(r.forall(_.getLong(4) == 1000L))
    assert(r.forall(_.getDouble(3) == 1.0))
  }

  test("length buckets: contiguous cover, exact mass accounting, " +
      "near-equal token mass per bucket") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.LoaderOps.lengthBuckets(spark, sf)
      .orderBy("bucket").collect()
      .map(x => (x.getLong(0), x.getLong(1), x.getLong(2),
        x.getLong(3), x.getLong(4)))
    assert(r.map(_._1).toSeq == (1L to r.length).toSeq)
    // contiguous: each bucket starts right after the previous ends
    r.sliding(2).foreach { case Array(a, b) =>
      assert(b._2 == a._3 + 1, s"gap between ${a} and ${b}")
    case _ => ()
    }
    // exact accounting against the corpus
    val docs = Tables.documents(spark, sf)
      .select(size(split(trim(col("text")), "\\s+")).cast("long")
        .as("n"))
    val total = docs.agg(sum("n")).head.getLong(0)
    val nDocs = docs.count()
    assert(r.map(_._5).sum == total)
    assert(r.map(_._4).sum == nDocs)
    // each bucket's mass stays within one census-row granule of the
    // ideal quarter (the boundary row can overshoot by its own mass)
    val maxRowMass = docs.groupBy("n").count()
      .select((col("n") * col("count")).as("m"))
      .agg(max("m")).head.getLong(0)
    r.foreach { b =>
      assert(b._5 <= total / 4 + maxRowMass,
        s"bucket ${b._1} mass ${b._5}")
    }
  }
}
