package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** The end-to-end corpus curation run — the operators q95/q100/q33/q46/
  * q89/q99/q102 verify individually, executed as ONE pipeline the way a
  * production deployment runs them: per-document signal frames are
  * computed once, pinned with `localCheckpoint` (lineage cut — a lost
  * block recomputes deterministically, and downstream stages never
  * re-scan the corpus), then the verdict, split, and report stages are
  * cheap re-aggregations of those frames.
  *
  * Verdict precedence (first failing reason wins, mirroring the order a
  * pipeline applies the gates): low_quality → repetitive → exact_dup →
  * near_dup → kept. Exact-dup keeps the smallest doc_id per normalized
  * fingerprint; near-dup keeps the q89 canonical (longest, then
  * smallest id) per LSH component. Kept docs carry the q99
  * component-keyed split so near-duplicates can never straddle splits
  * even when both survive (they can't — but the invariant is structural,
  * not behavioral).
  *
  * Scale: 4 corpus-reading stages (signals ×2, fingerprint, shingles),
  * each one pass; everything after operates on narrow per-doc frames.
  * At 100 TB the localCheckpoints become parquet signal tables; the
  * stage DAG is unchanged.
  */
object CurationPipeline {

  final case class Summary(nDocs: Long, nKept: Long,
      reasons: Map[String, Long], nTrainWindows: Long = 0L)

  /** Per-doc verdict frame: (doc_id, lang, source, split, reason,
    * kept). `split` is assigned for every doc (dropped docs keep their
    * would-be split for audit).
    */
  def verdicts(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(spark, dir)
      .select(col("doc_id"), col("lang"), col("source"))
    val quality = TextOps.qualityLogit(spark, dir)
      .select(col("doc_id"), col("keep").as("q_keep"))
      .localCheckpoint(false)
    val repetition = TextOps.topNgramMass(spark, dir)
      .select(col("doc_id"), col("flagged").as("r_flag"))
      .localCheckpoint(false)
    val fp = Tables.documents(spark, dir)
      .select(col("doc_id"),
        TextOps.charFold(TextOps.normText(col("text"))).as("fp"))
      .localCheckpoint(false)
    val exactKeeper = fp.groupBy(col("fp"))
      .agg(min(col("doc_id")).as("keeper"))
    val exact = fp.join(exactKeeper, "fp")
      .select(col("doc_id"), (col("doc_id") === col("keeper"))
        .as("is_exact_keeper"))
    val comps = CurationOps.dedupGroups(spark, dir)
      .localCheckpoint(false)
    val canon = HygieneOps.dupCanonicalOf(
      Tables.documents(spark, dir), comps)
      .select(col("doc_id"), col("component"), col("is_canonical"))
    val h = CurationOps.sampleHash(col("component")) % 100
    val split = when(h < 80, "train").when(h < 90, "val")
      .otherwise("test")
    docs.join(quality, "doc_id")
      .join(repetition, "doc_id")
      .join(exact, "doc_id")
      .join(canon, "doc_id")
      .withColumn("split", split)
      .withColumn("reason",
        when(!col("q_keep"), "low_quality")
          .when(col("r_flag"), "repetitive")
          .when(!col("is_exact_keeper"), "exact_dup")
          .when(!col("is_canonical"), "near_dup")
          .otherwise("kept"))
      .withColumn("kept", col("reason") === "kept")
      .select(col("doc_id"), col("lang"), col("source"), col("split"),
        col("reason"), col("kept"))
  }

  /** Per-(lang, source, split) rollup with one column per drop reason. */
  def report(v: DataFrame): DataFrame =
    v.groupBy(col("lang"), col("source"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        sum(when(col("reason") === "low_quality", 1L).otherwise(0L))
          .as("n_low_quality"),
        sum(when(col("reason") === "repetitive", 1L).otherwise(0L))
          .as("n_repetitive"),
        sum(when(col("reason") === "exact_dup", 1L).otherwise(0L))
          .as("n_exact_dup"),
        sum(when(col("reason") === "near_dup", 1L).otherwise(0L))
          .as("n_near_dup"))

  /** Materialize verdicts + report + the training-set packing manifest
    * under outDir; return the summary. The packing stage (q111's
    * concat-and-chunk layout) runs over exactly the documents a
    * trainer will see — kept verdicts in the train split — so the
    * manifest's window count IS the corpus's optimizer-step budget.
    */
  def run(spark: SparkSession, dir: String, outDir: String): Summary = {
    val v = verdicts(spark, dir).localCheckpoint(false)
    v.write.mode("overwrite").parquet(s"$outDir/verdicts.parquet")
    report(v).write.mode("overwrite").parquet(s"$outDir/report.parquet")
    val trainDocs = Tables.documents(spark, dir)
      .join(v.filter(col("kept") && col("split") === "train")
        .select("doc_id"), "doc_id")
    val pack = PackingOps
      .packWindowsOf(spark, trainDocs, PackingOps.WindowTokens)
      .localCheckpoint(false)
    pack.write.mode("overwrite").parquet(s"$outDir/pack.parquet")
    val nWindows = pack
      .agg(max(col("last_win"))).collect()(0) match {
        case r if r.isNullAt(0) => 0L
        case r => r.getLong(0) + 1
      }
    val reasons = v.groupBy(col("reason")).count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    Summary(reasons.values.sum, reasons.getOrElse("kept", 0L), reasons,
      nWindows)
  }
}
