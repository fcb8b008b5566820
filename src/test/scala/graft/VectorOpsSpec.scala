package graft

import org.apache.spark.sql.functions._

import graft.operators.VectorOps

class VectorOpsSpec extends SparkSuite {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
    (1L, Array(1.0f, 0.0f, 0.0f, 0.0f)), // identical to 0
    (2L, Array(-1.0f, 0.0f, 0.0f, 0.0f)), // opposite
    (3L, Array(0.0f, 1.0f, 0.0f, 0.0f))) // orthogonal
    .toDF("vec_id", "embedding")

  private def sims = {
    val e = vecs
      .select(col("vec_id"), VectorOps.intVec(col("embedding")).as("xs"))
      .withColumn("norm", VectorOps.intDot(col("xs"), col("xs")))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id"), col("b.vec_id"),
        VectorOps.cosine(
          VectorOps.intDot(col("a.xs"), col("b.xs")),
          col("a.norm"), col("b.norm")).as("sim"))
      .as[(Long, Long, Double)].collect()
      .map { case (a, b, s) => ((a, b), s) }.toMap
  }

  test("cosine: identical → 1, opposite → -1, orthogonal → 0") {
    assert(sims((0L, 1L)) == 1.0)
    assert(sims((0L, 2L)) == -1.0)
    assert(sims((0L, 3L)) == 0.0)
  }

  test("knn ranks real corpus deterministically, k respected") {
    val out = graft.operators.VectorOps.knn(spark, sf)
    val counts = out.groupBy("query_id").count().as[(Long, Long)]
      .collect().toMap
    assert(counts.size == 20 && counts.values.forall(_ == 10))
    // rank 1 must have max sim per query
    val top = out.filter(col("rank") === 1).select("query_id", "sim")
      .as[(Long, Double)].collect().toMap
    val best = out.groupBy("query_id").agg(max("sim")).as[(Long, Double)]
      .collect().toMap
    assert(top == best)
  }

  test("ivf search: probed-cell candidates only, ranked, useful recall") {
    val ivf = graft.operators.VectorOps.ivfSearch(spark, sf)
    val rows = ivf.select("query_id", "neighbor_id", "rank")
      .as[(Long, Long, Int)].collect()
    // contiguous ranks from 1 per query
    rows.groupBy(_._1).foreach { case (q, rs) =>
      assert(rs.map(_._3).sorted.toSeq == (1 to rs.length), s"query $q")
    }
    // recall@10 vs the brute-force oracle: IVF with nProbe=4 of 16
    // cells must beat the 25% of random cell probing by a wide margin
    val exact = graft.operators.VectorOps.knn(spark, sf)
      .select("query_id", "neighbor_id").as[(Long, Long)].collect().toSet
    val got = rows.map(r => (r._1, r._2)).toSet
    val recall = (exact & got).size.toDouble / exact.size
    assert(recall >= 0.4, s"recall@10 = $recall")
  }

  test("lsh buckets: deterministic and bounded") {
    val a = graft.operators.VectorOps.lshBuckets(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    val b = graft.operators.VectorOps.lshBuckets(spark, sf)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(a == b)
    assert(a.forall { case (bucket, _, _, _) => bucket >= 0 && bucket < 256 })
  }

  test("kmeans step: every vector in one cell, seeds in their own") {
    val rows = graft.operators.VectorOps.kmeansStep(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val dims = rows.map(_._2).distinct.sorted
    assert(dims.head == 1L && dims.length == 64)
    // membership partition: per dim, counts sum to the corpus size
    val n = Tables.embeddings(spark, sf).count()
    dims.foreach { d =>
      assert(rows.filter(_._2 == d).map(_._3).sum == n)
    }
    // a seed is its own nearest centroid (distance 0, tie-break safe)
    val cells = rows.map(_._1).distinct
    assert(cells.length <= 8 && cells.forall(c => c >= 0 && c < 8))
  }

  test("semantic dedup: cell minima kept, verdict consistent, subset " +
      "of the exact pair scan") {
    val sd = VectorOps.semanticDedup(spark, sf)
    assert(sd.count() == Tables.embeddings(spark, sf).count())
    assert(sd.filter(col("is_kept") =!= (col("n_dup_above") === 0)).isEmpty)
    // the smallest vec_id of every cell has no smaller-id neighbor
    val minKept = sd.groupBy("cell").agg(min("vec_id").as("vec_id"))
      .join(sd, Seq("vec_id"))
    assert(minKept.filter(!col("is_kept")).isEmpty)
    // cell-restricting can only REMOVE pairs vs the exact corpus scan
    val exact = VectorOps.cosineNearDups(spark, sf)
      .groupBy(col("vec_b").as("vec_id"))
      .agg(count(lit(1)).as("n_exact"))
    val over = sd.join(exact, Seq("vec_id"), "left")
      .filter(col("n_dup_above") > coalesce(col("n_exact"), lit(0L)))
    assert(over.isEmpty)
  }

  test("pq adc search: 5 ascending non-negative ranks per query, " +
      "self excluded, deterministic") {
    val r = VectorOps.pqAdcSearch(spark, sf)
    val rows = r.collect().map(x => (x.getLong(0), x.getLong(1),
      x.getLong(2), x.getLong(3)))
    assert(rows.length == 20 * 5)
    assert(rows.forall { case (q, n, _, d) => q != n && d >= 0 })
    rows.groupBy(_._1).values.foreach { g =>
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to 5L))
      assert(byRank.map(_._4).toSeq == byRank.map(_._4).sorted.toSeq)
    }
    val again = VectorOps.pqAdcSearch(spark, sf).collect().map(x =>
      (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    assert(again.toSet == rows.toSet)
  }

  test("ivf+adc composes: probing can only lose candidates vs full adc") {
    val full = VectorOps.pqAdcSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(2)) -> r.getLong(3)).toMap
    val ivf = VectorOps.ivfAdcSearch(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(ivf.length == 20 * 5)
    ivf.groupBy(_._1).foreach { case (q, g) =>
      val byRank = g.sortBy(_._3)
      assert(byRank.map(_._3).toSeq == (1L to 5L))
      // rank-1 under cell probing is never better than rank-1 of the
      // unrouted ADC scan over the whole corpus
      assert(byRank.head._4 >= full((q, 1L)))
    }
  }

  test("kmeans Lloyd loop converges on separated blobs and recovers " +
      "the true clustering from bad seeds") {
    // three tight blobs far apart on distinct axes; first-k seeding
    // would put all 3 seeds in blob A (a local optimum that merges B
    // and C), so recovery REQUIRES the farthest-point seeding to place
    // one seed per blob before Lloyd refines.
    def blob(base: Array[Float], ids: Range, eps: Float) =
      ids.map(i => (i.toLong, base.zipWithIndex.map { case (v, d) =>
        if (d == i % 4) v + eps * ((i % 3) - 1) else v
      }))
    val a = blob(Array(1f, 0f, 0f, 0f), 0 until 10, 0.01f)
    val b = blob(Array(0f, 100f, 0f, 0f), 10 until 20, 0.01f)
    val c = blob(Array(0f, 0f, -100f, 0f), 20 until 30, 0.01f)
    val vectors = (a ++ b ++ c).toSeq.toDF("vec_id", "embedding")
      .select(col("vec_id"), VectorOps.intVec(col("embedding")).as("xs"))
    val r = VectorOps.kmeansIterate(vectors, k = 3, maxIter = 15)
    assert(r.converged, s"did not converge in ${r.iters} rounds")
    val labels = r.assignments.as[(Long, Long)].collect().toMap
    assert(labels.size == 30)
    // each blob maps to exactly one cell, and the cells differ
    def cellsOf(ids: Range) = ids.map(i => labels(i.toLong)).toSet
    val (ca, cb, cc) = (cellsOf(0 until 10), cellsOf(10 until 20),
      cellsOf(20 until 30))
    assert(ca.size == 1 && cb.size == 1 && cc.size == 1)
    assert(Set(ca.head, cb.head, cc.head).size == 3)
    // centroids sit on the blob centers (within quantization noise)
    val centB = r.centroids(cb.head)
    assert(math.abs(centB(1) - 100000000L) < 100000L) // 100 * 1e6
    // determinism: a second run reproduces labels exactly
    val r2 = VectorOps.kmeansIterate(vectors, k = 3, maxIter = 15)
    assert(r2.assignments.as[(Long, Long)].collect().toMap == labels)
  }

  test("embedding outliers: far-from-centroid vector flagged at the " +
      "per-label P90; floor centroids handle negative sums") {
    val s = spark
    import s.implicits._
    // label 0: nine at the origin, one far along x → centroid at
    // (0.1, 0); the nine sit one bin away, the far one 81 bins out
    val near = (0L until 9L).map(i => (i, Array(0.0f, 0.0f), 0))
    val far = Seq((9L, Array(1.0f, 0.0f), 0))
    // label 1: sums not divisible by n and negative → floor(-7e5/3)
    val neg = Seq((10L, Array(-0.1f, 0.0f), 1),
      (11L, Array(-0.2f, 0.0f), 1), (12L, Array(-0.4f, 0.0f), 1))
    val emb = (near ++ far ++ neg).toDF("vec_id", "embedding", "label")
    val r = VectorOps.embeddingOutliersOf(emb).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(!r(0L).getAs[Boolean]("is_outlier"))
    assert(r(9L).getAs[Boolean]("is_outlier"))
    // label-0 centroid = (100000, 0): near dist² = 1e10, far = 8.1e11
    assert(r(0L).getAs[Long]("dist2") == 10000000000L)
    assert(r(9L).getAs[Long]("dist2") == 810000000000L)
    // label-1 centroid x = floor(-700000/3) = -233334 (not -233333)
    val d10 = r(10L).getAs[Long]("dist2")
    val e10 = (-100000L + 233334L) * (-100000L + 233334L)
    assert(d10 == e10, s"$d10 vs $e10")
  }

  test("hard negatives: nearest other-label neighbor within the cell, " +
      "null when the cell is label-pure") {
    val s = spark
    import s.implicits._
    // seeds (vec_id < 8) at three directions; members cluster around
    // them. Cell 0 mixes labels A/B, cell 1 mixes, cell 2 is pure A.
    val emb = Seq(
      (0L, Array(1.0f, 0.0f), 0),    // seed, cell 0, label 0
      (1L, Array(0.0f, 1.0f), 1),    // seed, cell 1, label 1
      (2L, Array(-1.0f, 0.0f), 0),   // seed, cell 2, label 0
      (10L, Array(0.9f, 0.1f), 0),
      (11L, Array(0.95f, 0.05f), 1),
      (12L, Array(0.1f, 0.9f), 0),
      (13L, Array(0.05f, 0.95f), 0),
      (20L, Array(-0.9f, -0.1f), 0)
    ).toDF("vec_id", "embedding", "label")
    val r = VectorOps.hardNegativesOf(emb).collect()
      .map(x => x.getLong(0) -> x).toMap
    assert(r(10L).getAs[Long]("hn_id") == 11L) // only B in cell 0
    assert(r(0L).getAs[Long]("hn_id") == 11L)
    // 11's best wrong-label match: seed 0 edges out 10 on cosine
    assert(r(11L).getAs[Long]("hn_id") == 0L)
    // 1's best in cell 1: 13 is closer to (0,1) than 12
    assert(r(1L).getAs[Long]("hn_id") == 13L)
    assert(r(12L).getAs[Long]("hn_id") == 1L)
    // label-pure cell → no hard negative
    assert(r(20L).isNullAt(r(20L).fieldIndex("hn_id")))
    assert(r(2L).isNullAt(r(2L).fieldIndex("hn_id")))
    // similarity is a valid cosine in [-1, 1] wherever present
    r.values.filterNot(_.isNullAt(3)).foreach { x =>
      val c = x.getAs[Double]("hn_sim")
      assert(c >= -1.0 && c <= 1.0 + 1e-9)
    }
  }

  test("label similarity: tight same-direction classes read ~1, " +
      "orthogonal classes ~0, sizes exact") {
    val s2 = spark
    import s2.implicits._
    // label 0: vectors along +x; label 1: also +x (near-dup class);
    // label 2: along +y (orthogonal)
    def vec(i: Int, v: Float): Seq[Float] =
      Seq.tabulate(64)(d => if (d == i) v else 0.0f)
    val emb = Seq(
      (1L, vec(0, 1.0f), 0), (2L, vec(0, 2.0f), 0),
      (3L, vec(0, 1.5f), 1), (4L, vec(0, 0.5f), 1),
      (5L, vec(1, 1.0f), 2), (6L, vec(1, 3.0f), 2))
      .toDF("vec_id", "embedding", "label")
    val byPair = graft.operators.VectorOps.labelSimilarityOf(emb)
      .collect().map(x => (x.getAs[Int]("label_a"),
        x.getAs[Int]("label_b")) -> (x.getAs[Long]("n_a"),
        x.getAs[Long]("n_b"), x.getAs[Double]("centroid_cos"))).toMap
    assert(byPair.keySet == Set((0, 1), (0, 2), (1, 2)))
    val (na, nb, cos01) = byPair((0, 1))
    assert(na == 2 && nb == 2)
    assert(cos01 > 0.999) // same direction
    assert(math.abs(byPair((0, 2))._3) < 1e-9) // orthogonal
    assert(math.abs(byPair((1, 2))._3) < 1e-9)
  }
}
