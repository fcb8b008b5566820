package graft

import org.apache.spark.sql.functions._

import graft.operators.{CurationOps, CurationPipeline, HygieneOps, TextOps}

/** End-to-end curation run: verdict precedence, structural invariants,
  * agreement with the individually-verified operators, determinism of
  * the materialized output.
  */
class CurationPipelineSpec extends SparkSuite {

  test("pipeline verdicts agree with the component operators") {
    val v = CurationPipeline.verdicts(spark, sf).cache()
    try {
      val docs = Tables.documents(spark, sf)
      assert(v.count() == docs.count())
      // precedence stage 1: every q95 reject is low_quality, nothing else
      val lowQ = TextOps.qualityLogit(spark, sf).filter(!col("keep"))
        .select("doc_id")
      assert(v.join(lowQ, "doc_id")
        .filter(col("reason") =!= "low_quality").isEmpty)
      // kept docs pass every gate
      val kept = v.filter(col("kept"))
      assert(kept.join(lowQ, "doc_id").isEmpty)
      val rep = TextOps.topNgramMass(spark, sf).filter(col("flagged"))
        .select("doc_id")
      assert(kept.join(rep, "doc_id").isEmpty)
      val nonCanon = HygieneOps.dupCanonical(spark, sf)
        .filter(!col("is_canonical")).select("doc_id")
      assert(kept.join(nonCanon, "doc_id").isEmpty)
      // split never straddles a near-dup component
      val comps = CurationOps.dedupGroups(spark, sf)
      val straddle = v.join(comps, "doc_id")
        .groupBy("component").agg(countDistinct("split").as("n"))
        .filter(col("n") =!= 1)
      assert(straddle.isEmpty)
    } finally v.unpersist()
  }

  test("run materializes deterministic output and a reconciled summary") {
    val out1 = java.nio.file.Files
      .createTempDirectory("curation1").toString
    val out2 = java.nio.file.Files
      .createTempDirectory("curation2").toString
    val s1 = CurationPipeline.run(spark, sf, out1)
    val s2 = CurationPipeline.run(spark, sf, out2)
    assert(s1 == s2)
    assert(s1.nDocs == Tables.documents(spark, sf).count())
    assert(s1.reasons.values.sum == s1.nDocs)
    assert(s1.nKept > 0 && s1.nKept <= s1.nDocs)
    val v1 = spark.read.parquet(s"$out1/verdicts.parquet")
    val v2 = spark.read.parquet(s"$out2/verdicts.parquet")
    assert(v1.exceptAll(v2).isEmpty && v2.exceptAll(v1).isEmpty)
    // the report totals reconcile with the verdict frame
    val r = spark.read.parquet(s"$out1/report.parquet")
    assert(r.agg(sum("n_docs")).collect()(0).getLong(0) == s1.nDocs)
    assert(r.agg(sum("n_kept")).collect()(0).getLong(0) == s1.nKept)
    // the packing manifest covers exactly the kept train docs, and
    // the summary's window budget matches its span
    val p = spark.read.parquet(s"$out1/pack.parquet")
    val keptTrain = spark.read.parquet(s"$out1/verdicts.parquet")
      .filter(col("kept") && col("split") === "train")
    assert(p.count() == keptTrain.count())
    assert(p.join(keptTrain, "doc_id").count() == p.count())
    assert(s1.nTrainWindows ==
      p.agg(max("last_win")).collect()(0).getLong(0) + 1)
    assert(s1.nTrainWindows > 0)
  }
}
