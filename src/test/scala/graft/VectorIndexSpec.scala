package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.VectorIndex

/** The persisted IVF-PQ index: build → save → load → search must be
  * exact round-trips, the on-disk layout must prune unprobed cells at
  * scan time, and results must obey the probe/rank contracts.
  */
class VectorIndexSpec extends SparkSuite {

  private lazy val emb = graft.Tables.embeddings(spark, sf)
  private lazy val cfg = VectorIndex.Config(nCells = 8, subCount = 4,
    subDim = 16, pqK = 4, kmeansIters = 3)
  private lazy val index = VectorIndex.build(emb, cfg)
  private lazy val queries = emb.filter(col("vec_id") < 10)
    .select(col("vec_id").as("query_id"), col("embedding"))

  test("built index is consistent: every vector coded in every " +
      "sub-space, one cell each") {
    val n = emb.count()
    assert(index.codes.count() == n * cfg.subCount)
    val cells = index.codes.select("vec_id", "cell").distinct()
    assert(cells.count() == n)
    assert(index.centroids.count() == cfg.nCells)
    assert(index.codebooks.count() == cfg.subCount.toLong * cfg.pqK)
  }

  test("search after save/load is row-identical to in-memory search") {
    val dir = Files.createTempDirectory("graft_vecindex").toString
    VectorIndex.save(index, dir)
    val loaded = VectorIndex.load(spark, dir)
    assert(loaded.cfg == cfg)
    val a = VectorIndex.search(index, queries, nProbe = 2, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = VectorIndex.search(loaded, queries, nProbe = 2, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
  }

  test("probed-cell literal prunes parquet partitions in the plan") {
    val dir = Files.createTempDirectory("graft_vecindex_pp").toString
    VectorIndex.save(index, dir)
    val loaded = VectorIndex.load(spark, dir)
    val result = VectorIndex.search(loaded, queries.limit(3),
      nProbe = 2, k = 5)
    val plan = result.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a cell partition filter in:\n$plan")
    // scale shape: the codes scan joins only against broadcast sides
    // (probes, LUT) — a shuffle join here would re-shuffle the corpus
    // per query batch
    assert(!plan.contains("SortMergeJoin") &&
      !plan.contains("ShuffledHashJoin"),
      s"expected broadcast-only joins in:\n$plan")
    assert(!plan.contains("Window"), "expected a window-free plan")
  }

  test("neighbors come only from probed cells; ranks are dense and " +
      "distances non-decreasing") {
    val res = VectorIndex.search(index, queries, nProbe = 2, k = 5)
      .collect()
    // rank contract
    res.groupBy(_.getAs[Long]("query_id")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("rank"))
      assert(sorted.map(_.getAs[Long]("rank")).toSeq ==
        (1L to sorted.length))
      val dists = sorted.map(_.getAs[Long]("adc_dist")).toSeq
      assert(dists == dists.sorted)
    }
    // probe containment: a neighbor's cell must be one its query probed
    val cells = index.codes.select("vec_id", "cell").distinct()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val centroidRows = index.centroids.collect()
    val qx = graft.Tables.embeddings(spark, sf)
      .filter(col("vec_id") < 10)
      .select(col("vec_id"),
        graft.operators.VectorOps.intVec(col("embedding")).as("xs"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("xs").toVector).toMap
    def dot(a: Seq[Long], b: Seq[Long]): Double =
      a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
    val probed: Map[Long, Set[Long]] = qx.map { case (qid, xs) =>
      val sims = centroidRows.map { cr =>
        val cxs = cr.getAs[scala.collection.Seq[Long]]("xs").toVector
        (dot(xs, cxs) / math.sqrt(dot(xs, xs) * dot(cxs, cxs)),
          cr.getAs[Long]("cell"))
      }
      qid -> sims.sortBy { case (s, c) => (-s, c) }.take(2)
        .map(_._2).toSet
    }
    res.foreach { r =>
      val qid = r.getAs[Long]("query_id")
      val cell = cells(r.getAs[Long]("neighbor_id"))
      assert(probed(qid).contains(cell),
        s"query $qid neighbor in unprobed cell $cell")
    }
  }

  // ------------------------------------------- incremental maintenance

  test("append: incremental encode+add equals one-pass encode of the " +
      "full corpus (search row-identical), layout still prunes") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val extra = emb.filter(col("vec_id") % 5 === 0)
    val baseIdx = VectorIndex.build(base, cfg)

    val dir = Files.createTempDirectory("graft_vecindex_app").toString
    VectorIndex.save(baseIdx, dir)
    VectorIndex.append(spark, dir, extra)
    val appended = VectorIndex.load(spark, dir)

    // every vector (old and new) coded once per sub-space
    assert(appended.codes.count() == emb.count() * cfg.subCount)
    assert(appended.codes.select("vec_id").distinct().count() ==
      emb.count())

    // reference: same frozen quantizers, whole corpus in ONE pass —
    // batch-by-batch encoding must be indistinguishable
    val onePass = baseIdx.copy(codes =
      VectorIndex.encode(baseIdx, emb))
    val a = VectorIndex.search(appended, queries, nProbe = 3, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    val b = VectorIndex.search(onePass, queries, nProbe = 3, k = 5)
      .orderBy("query_id", "rank").collect().toSeq
    assert(a == b)
    assert(a.nonEmpty)
    // appended vectors are actually findable
    assert(a.exists(_.getAs[Long]("neighbor_id") % 5 == 0),
      "expected at least one appended vector among neighbors")

    // the append preserved the partition layout: pruning still in plan
    val plan = VectorIndex.search(appended, queries.limit(3),
      nProbe = 2, k = 5).queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [cell"),
      s"expected a cell partition filter in:\n$plan")
  }

  test("append: recall vs brute-force cosine does not regress against " +
      "the rebuilt index") {
    val base = emb.filter(col("vec_id") % 5 =!= 0)
    val extra = emb.filter(col("vec_id") % 5 === 0)
    // finer PQ than the layout tests: recall is about ADC resolution,
    // and 4 sub-spaces × 4 codewords floors it; 8×16 (16^8 distinct
    // code words) is the honest shape for a recall grade — random
    // synthetic embeddings are PQ's worst case (no cluster structure
    // to exploit), so even this tops out well below real-corpus recall
    val rcfg = cfg.copy(subCount = 8, subDim = 8, pqK = 16)
    val dir = Files.createTempDirectory("graft_vecindex_rec").toString
    VectorIndex.save(VectorIndex.build(base, rcfg), dir)
    VectorIndex.append(spark, dir, extra)
    val appended = VectorIndex.load(spark, dir)
    val rebuilt = VectorIndex.build(emb, rcfg)

    val k = 10
    // brute-force ground truth in the metric ADC approximates: exact
    // integer L2 over the quantized vectors (cosine truth would grade
    // the metric choice, not the index — q90 is where that lives)
    val all = emb.select(col("vec_id"),
      graft.operators.VectorOps.intVec(col("embedding")).as("xs"))
      .collect().map(r => r.getLong(0) ->
        r.getAs[scala.collection.Seq[Long]]("xs").toVector).toMap
    def l2(a: Seq[Long], b: Seq[Long]): BigInt =
      a.zip(b).map { case (x, y) =>
        val d = BigInt(x) - BigInt(y); d * d
      }.sum
    val truth: Map[Long, Set[Long]] =
      queries.select("query_id").collect().map(_.getLong(0)).map { q =>
        val qx = all(q)
        q -> all.toSeq.map { case (id, xs) => (l2(qx, xs), id) }
          .sortBy(identity).take(k).map(_._2).toSet
      }.toMap

    def recall(idx: VectorIndex.Index): Double = {
      val res = VectorIndex.search(idx, queries, nProbe = 8, k = k)
        .collect()
        .groupBy(_.getAs[Long]("query_id"))
        .map { case (q, rows) =>
          q -> rows.map(_.getAs[Long]("neighbor_id")).toSet
        }
      val hits = truth.toSeq.map { case (q, t) =>
        t.intersect(res.getOrElse(q, Set.empty)).size
      }.sum
      hits.toDouble / (truth.size * k)
    }

    val rAppended = recall(appended)
    val rRebuilt = recall(rebuilt)
    // frozen quantizers may differ from retrained ones either way;
    // the gate is "no regression beyond noise" plus an absolute floor
    assert(rAppended >= rRebuilt - 0.1,
      s"append recall $rAppended regressed vs rebuild $rRebuilt")
    // absolute floor calibrated to the random-data ADC ceiling
    // (~0.35-0.4 measured for both appended and rebuilt at this cfg);
    // the regression gate above is the real contract
    assert(rAppended >= 0.3,
      s"append recall too low: $rAppended (rebuilt: $rRebuilt)")
  }
}
