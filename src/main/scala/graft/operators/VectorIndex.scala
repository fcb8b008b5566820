package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.operators.VectorOps.{cosine, intDot, intVec}

/** Persisted IVF-PQ index — the "build once, query many" ANN shape a
  * 100 TB corpus actually runs (q101 composes the same read path
  * inline for the oracle; this module makes the index a durable
  * artifact). Reference capability: ape-dts has no ANN operator — this
  * is part of the training-data-pipeline surface the engine adds
  * (SURVEY §6); the layout follows the public IVF-PQ design
  * (Jégou et al., "Product Quantization for Nearest Neighbor Search",
  * IEEE TPAMI 2011).
  *
  * Build ([[build]]): coarse centroids = deterministic farthest-point
  * k-means ([[VectorOps.kmeansIterate]]) over the quantized vectors;
  * one more k-means PER SUB-SPACE trains the PQ codebooks; every
  * vector stores only its coarse cell + `subCount` codebook ids.
  * Build cost is (1 + subCount) k-means loops — each round one
  * map-side argmin plus a k×dims collect — paid once.
  *
  * Layout ([[save]]/[[load]]): codes write `partitionBy("cell")`, so
  * the on-disk corpus is physically clustered by coarse cell — the
  * IVF inverted-list layout expressed as parquet partitioning.
  *
  * Search ([[search]]): queries probe their `nProbe` nearest coarse
  * cells (broadcast centroids, bounded top-k — no window); the probed
  * cell SET (≤ nCells ids, bounded driver state) becomes a literal
  * partition filter, so the scan reads ONLY the probed cells' files —
  * `PartitionFilters` in the plan, the partition-pruning twin of the
  * inverted-list seek. Candidates are ranked by the integer ADC sum
  * of `subCount` broadcast-LUT lookups; stored vectors are never
  * read at query time.
  */
object VectorIndex {

  /** `subCount * subDim` must equal the embedding dimension;
    * `nCells`/`pqK` are the coarse and per-sub-space codebook sizes.
    */
  final case class Config(nCells: Int = 16, subCount: Int = 4,
      subDim: Int = 16, pqK: Int = 16, kmeansIters: Int = 5)

  /** centroids: (cell, xs, norm) · codebooks: (sub, pcell, sxs, norm)
    * · codes: (cell, vec_id, sub, pcell).
    */
  final case class Index(cfg: Config, centroids: DataFrame,
      codebooks: DataFrame, codes: DataFrame)

  private def quantized(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), intVec(col("embedding")).as("xs"))

  private def subSlices(e: DataFrame, cfg: Config): DataFrame =
    (0 until cfg.subCount).map { s =>
      e.select(col("vec_id"), lit(s).as("sub"),
        slice(col("xs"), s * cfg.subDim + 1, cfg.subDim).as("sxs"))
    }.reduce(_ unionByName _)

  def build(emb: DataFrame, cfg: Config = Config()): Index = {
    val spark = emb.sparkSession
    import spark.implicits._
    val e = quantized(emb).localCheckpoint(false)

    // coarse quantizer + assignments
    val coarse = VectorOps.kmeansIterate(e, cfg.nCells, cfg.kmeansIters)
    val centroids = coarse.centroids.toSeq.sortBy(_._1)
      .toDF("cell", "xs")
      .withColumn("norm", intDot(col("xs"), col("xs")))

    // per-sub-space PQ codebooks (independent k-means each)
    val subs = subSlices(e, cfg).localCheckpoint(false)
    val codebooks = (0 until cfg.subCount).map { s =>
      val sv = subs.filter(col("sub") === s)
        .select(col("vec_id"), col("sxs").as("xs"))
      VectorOps.kmeansIterate(sv, cfg.pqK, cfg.kmeansIters)
        .centroids.toSeq.sortBy(_._1)
        .map { case (pcell, sxs) => (s, pcell, sxs) }
    }.reduce(_ ++ _)
      .toDF("sub", "pcell", "sxs")
      .withColumn("norm", intDot(col("sxs"), col("sxs")))

    // codes: one [[encode]] pass against the FINAL quantizers. Not
    // `coarse.assignments` — those are relative to the centroids at
    // the start of the last k-means iteration, which differ from the
    // final centroids when the loop hits maxIter unconverged; search
    // probes by final-centroid similarity, so stored cells must be
    // nearest-final-centroid or probe containment (and the
    // append-equals-one-pass contract) silently degrades.
    val quantizers = Index(cfg, centroids, codebooks, null)
    Index(cfg, centroids, codebooks, encode(quantizers, emb))
  }

  /** Encode vectors against an EXISTING index's quantizers — no
    * retraining. This is the maintenance path at scale: a rebuild
    * re-reads the whole corpus through two k-means loops, while an
    * append encodes only the new batch (one broadcast-join argmin per
    * quantizer, map-side). A vector's codes are a pure function of
    * (centroids, codebooks, vector), so encoding batch-by-batch equals
    * encoding everything in one pass — VectorIndexSpec pins that
    * equality, which is what makes [[append]] safe.
    */
  def encode(index: Index, emb: DataFrame): DataFrame = {
    val cfg = index.cfg
    val e = quantized(emb).localCheckpoint(false)

    // coarse assignment: nearest centroid via min(struct), no window
    val cent = index.centroids.select(col("cell"),
      col("xs").as("c_xs"), col("norm").as("c_norm"))
    val assigned = e
      .withColumn("snorm", intDot(col("xs"), col("xs")))
      .join(broadcast(cent))
      .withColumn("dist", col("snorm") + col("c_norm") -
        lit(2L) * intDot(col("xs"), col("c_xs")))
      .groupBy(col("vec_id"))
      .agg(min(struct(col("dist"), col("cell"))).as("best"))
      .select(col("vec_id"), col("best.cell").as("cell"))

    // PQ codes: nearest codebook entry per (vector, sub-space)
    val cb = index.codebooks.select(col("sub"), col("pcell"),
      col("sxs").as("c_sxs"), col("norm").as("c_norm"))
    subSlices(e, cfg)
      .withColumn("snorm", intDot(col("sxs"), col("sxs")))
      .join(broadcast(cb), "sub")
      .withColumn("dist", col("snorm") + col("c_norm") -
        lit(2L) * intDot(col("sxs"), col("c_sxs")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("pcell"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.pcell").as("pcell"))
      .join(assigned, "vec_id")
      .select(col("cell"), col("vec_id"), col("sub"), col("pcell"))
  }

  /** Incremental maintenance: append `newEmb`'s codes to a saved index
    * at `path` without touching existing files. `mode("append")` +
    * `partitionBy("cell")` adds files INSIDE the existing cell
    * directories, so the inverted-list layout (and the probed-cell
    * partition pruning in [[search]]) is preserved; readers see the
    * union of old and new codes. The quantizers are frozen — recall
    * drifts only if the data distribution does, which is the same
    * contract every IVF system (FAISS `add` vs `train`) exposes; a
    * periodic rebuild re-trains.
    */
  def append(spark: SparkSession, path: String,
      newEmb: DataFrame): Unit = {
    val index = load(spark, path)
    encode(index, newEmb).repartition(col("cell"))
      .write.mode("append").partitionBy("cell")
      .parquet(s"$path/codes")
  }

  def save(index: Index, path: String): Unit = {
    val spark = index.centroids.sparkSession
    import spark.implicits._
    index.centroids.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/centroids")
    index.codebooks.coalesce(1).write.mode("overwrite")
      .parquet(s"$path/codebooks")
    // the IVF inverted-list layout: one parquet partition per cell
    index.codes.repartition(col("cell")).write.mode("overwrite")
      .partitionBy("cell").parquet(s"$path/codes")
    Seq((index.cfg.nCells, index.cfg.subCount, index.cfg.subDim,
      index.cfg.pqK, index.cfg.kmeansIters))
      .toDF("nCells", "subCount", "subDim", "pqK", "kmeansIters")
      .coalesce(1).write.mode("overwrite").parquet(s"$path/config")
  }

  def load(spark: SparkSession, path: String): Index = {
    val c = spark.read.parquet(s"$path/config").collect().head
    val cfg = Config(c.getAs[Int]("nCells"), c.getAs[Int]("subCount"),
      c.getAs[Int]("subDim"), c.getAs[Int]("pqK"),
      c.getAs[Int]("kmeansIters"))
    Index(cfg,
      spark.read.parquet(s"$path/centroids"),
      spark.read.parquet(s"$path/codebooks"),
      spark.read.parquet(s"$path/codes"))
  }

  /** ANN top-k for `queries` (query_id, embedding). Deterministic ties
    * (probe: higher sim then smaller cell; rank: smaller ADC then
    * smaller id), like q101's exactness contract.
    */
  def search(index: Index, queries: DataFrame, nProbe: Int = 4,
      k: Int = 5): DataFrame = {
    val cfg = index.cfg
    val q = queries
      .select(col("query_id"), intVec(col("embedding")).as("q_xs"))
      .withColumn("q_norm", intDot(col("q_xs"), col("q_xs")))
      .localCheckpoint(false)

    val probes = q.join(broadcast(index.centroids))
      .withColumn("sim", cosine(intDot(col("q_xs"), col("xs")),
        col("q_norm"), col("norm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(col("sim"),
        col("cell"), nProbe).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("cell"))
      .localCheckpoint(false)

    // bounded driver state (≤ nCells longs): the probed-cell set as a
    // LITERAL filter, so parquet partition pruning skips every
    // unprobed cell's files
    val probedCells = probes.select(col("cell")).distinct()
      .collect().map(_.getLong(0)).sorted
    val prunedCodes = index.codes
      .filter(col("cell").isin(probedCells.map(c => c: Any): _*))

    // per-query ADC lookup table, one row per (sub, codebook entry)
    val qsubs = (0 until cfg.subCount).map { s =>
      q.select(col("query_id"), lit(s).as("sub"),
        slice(col("q_xs"), s * cfg.subDim + 1, cfg.subDim).as("q_sxs"))
    }.reduce(_ unionByName _)
      .withColumn("qs_norm", intDot(col("q_sxs"), col("q_sxs")))
    val lut = qsubs.join(broadcast(index.codebooks), Seq("sub"))
      .select(col("query_id"), col("sub"), col("pcell"),
        (col("qs_norm") + col("norm") -
          lit(2L) * intDot(col("q_sxs"), col("sxs"))).as("part_dist"))

    prunedCodes.join(broadcast(probes), Seq("cell"))
      .select(col("query_id"), col("vec_id"), col("sub"), col("pcell"))
      .join(broadcast(lut), Seq("query_id", "sub", "pcell"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("part_dist")).as("adc_dist"),
        count(lit(1)).as("n_subs"))
      .filter(col("n_subs") === cfg.subCount)
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(
        (-col("adc_dist")).cast("double"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast("long").as("rank"),
        (-col("col.score")).cast("long").as("adc_dist"))
  }
}
