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

  test("pivot matrix accounts for every event value once") {
    val p = Relational3.eventPivot(spark, sf)
    assert(p.count() == 10)
    val pivotTotal = p.select(
      Relational3.EventTypes.map(t => coalesce(col(t), lit(0.0)))
        .reduce(_ + _).as("s"))
      .agg(sum("s")).collect()(0).getDouble(0)
    val direct = Tables.events(spark, sf)
      .agg(sum(col("value").cast("decimal(18,4)")).cast("double"))
      .collect()(0).getDouble(0)
    assert(math.abs(pivotTotal - direct) < 1e-6)
  }
}
