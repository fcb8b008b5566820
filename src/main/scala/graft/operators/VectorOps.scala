package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Similarity search over an embedding column (`Array[Float]`).
  *
  * Cross-engine determinism: dot products and norms are accumulated as
  * SCALED INTEGERS — each per-element product is computed in double
  * (float→double is exact), scaled by 1e12, rounded to a bigint, and
  * summed exactly. Cosine = intDot / sqrt(intNormA · intNormB) is then a
  * per-row double expression over identical integers, so both engines get
  * bit-identical similarities, ranks, and thresholds.
  *
  * Scale shape: brute-force top-k broadcasts the (small) query set against
  * the candidate corpus — no shuffle of the corpus, one partial top-k per
  * partition via window over query. The LSH path buckets vectors by
  * random-hyperplane signs (deterministic arithmetic hyperplanes) so
  * candidate generation joins only within buckets — the 100 TB path.
  */
object VectorOps {

  final val Scale = 1e6

  /** Scale a float vector to integers once (×1e6, rounded) — materialized
    * per row so every subsequent dot is pure integer multiply-adds.
    * Native codegen expression; the composed
    * `transform(v, x => round(cast…)·cast)` form it replaces was an
    * interpreted HOF with three per-element steps, and the native
    * rounding is bit-identical (see GraftExpressions.scaleLongs).
    */
  def intVec(v: Column): Column =
    graft.functions.GraftFunctions.scaledLongs(v)

  def intVecSql(v: String): String =
    s"list_transform($v, " +
      s"x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"

  /** Exact dot product of two pre-scaled integer vectors (result carries
    * scale 1e12; |element| ≤ 5.3e5 so 64 products stay < 2e13).
    * Native codegen expression — the interpreted zip_with/aggregate pair
    * allocated an array per evaluation and dominated the pair scans.
    */
  def intDot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.longDot(a, b)

  /** DuckDB mirror over pre-scaled vectors. */
  def intDotSql(a: String, b: String): String =
    s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
      s"list_transform(range(1, len($a)+1), " +
      s"i -> ($a)[i] * ($b)[i])), (acc, x) -> acc + x)"

  /** Cosine from scaled-integer dot/norms (per-row double math). */
  def cosine(dot: Column, na: Column, nb: Column): Column =
    dot.cast(DoubleType) /
      sqrt(na.cast(DoubleType) * nb.cast(DoubleType))

  // ---------------------------------------------------------------- q40
  /** Brute-force cosine top-k: query vectors (vec_id < 20) against the
    * whole corpus; k = 10. Query side is broadcast — the corpus never
    * moves.
    */
  def knn(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
    val q = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"),
        col("xs").as("q_xs"), col("norm").as("q_norm"))
    val pairs = e.join(broadcast(q), col("vec_id") =!= col("query_id"))
      .withColumn("dot", intDot(col("q_xs"), col("xs")))
      .withColumn("sim",
        cosine(col("dot"), col("q_norm"), col("norm")))
    // the brute-force part is the dot products, by design — but the
    // rank still uses the bounded TopKBy aggregate: each query's
    // partition is the WHOLE corpus, and a window would sort all of
    // it per query where the aggregate keeps 10 rows map-side (r9)
    pairs
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("sim"), col("vec_id"), 10).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), col("col.score").as("sim"))
  }

  val knnSql: String = {
    val dot = intDotSql("q.xs", "e.xs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs,
       |  ${intDotSql("xs", "xs")} AS norm FROM v),
       |q AS (SELECT vec_id AS query_id, xs, norm FROM e
       |  WHERE vec_id < 20),
       |p AS (
       |  SELECT q.query_id, e.vec_id AS neighbor_id,
       |    CAST($dot AS DOUBLE) /
       |      sqrt(CAST(q.norm AS DOUBLE) * CAST(e.norm AS DOUBLE)) AS sim
       |  FROM q JOIN e ON e.vec_id <> q.query_id),
       |r AS (SELECT query_id, neighbor_id, sim,
       |  ROW_NUMBER() OVER (PARTITION BY query_id
       |    ORDER BY sim DESC, neighbor_id) AS rank FROM p)
       |SELECT query_id, neighbor_id, rank, sim FROM r WHERE rank <= 10""".stripMargin
  }

  // ---------------------------------------------------------------- q41
  /** Embedding near-dup pairs: all pairs with cosine ≥ 0.3 (corpus max is
    * ≈0.39 — the threshold keeps a small discriminating set).
    *
    * ORACLE FIXTURE, not the production default: this is the O(n²)
    * exact scan kept so the bucketed path has an engine-checked ground
    * truth. USE [[bucketedNearDups]] (q45) — LSH-bucket-then-exact,
    * n²/256 candidate shrink, same results (asserted in DedupSpec) —
    * for any real corpus.
    */
  def cosineNearDups(spark: SparkSession, dir: String): DataFrame = {
    // fanout: parallelize the vector parse over the single-file scan
    // (no-op at cluster scale); pin before the self-join so the
    // parse+norm runs once, not once per join side
    val e = Tables.fanout(spark, Tables.embeddings(spark, dir))
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
      .localCheckpoint(false)
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(
        intDot(col("a.xs"), col("b.xs")),
        col("a.norm"), col("b.norm")))
      .filter(col("sim") >= 0.3)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("sim"))
  }

  val cosineNearDupsSql: String = {
    val dot = intDotSql("a.xs", "b.xs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs,
       |  ${intDotSql("xs", "xs")} AS norm FROM v)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       |  CAST($dot AS DOUBLE) /
       |    sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) AS sim
       |FROM e a JOIN e b ON a.vec_id < b.vec_id
       |WHERE CAST($dot AS DOUBLE) /
       |    sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) >= 0.3""".stripMargin
  }

  // ---------------------------------------------------------------- q42
  /** Per-label centroids: posexplode + exact integer micro-unit sums
    * per (label, dim) — the aggregation pattern for corpus statistics.
    * Accumulation uses the SAME ×1e6 quantizer as every other vector
    * operator (callers divide by 1e6·n for the float centroid): the
    * earlier decimal(27,12) form diverged at sf0.1 because a
    * double→decimal cast rounds Spark's shortest-decimal rendering but
    * DuckDB's true binary expansion — integer quantization has no such
    * seam, at any corpus size.
    */
  def labelCentroids(spark: SparkSession, dir: String): DataFrame =
    Tables.embeddings(spark, dir)
      .select(col("label"),
        posexplode(intVec(col("embedding"))).as(Seq("dim", "x_micro")))
      .groupBy(col("label"), col("dim"))
      .agg(
        count(lit(1)).as("n"),
        sum(col("x_micro")).as("sum_x_micro"))
      .filter(col("dim") < 8)

  val labelCentroidsSql: String =
    s"""SELECT label, i - 1 AS dim, COUNT(*) AS n,
      |  SUM(v.xs[i])::BIGINT AS sum_x_micro
      |FROM (SELECT label, ${intVecSql("embedding")} AS xs
      |  FROM embeddings) v, range(1, 65) t(i)
      |WHERE i - 1 < 8
      |GROUP BY label, i""".stripMargin

  // ---------------------------------------------------------------- q43
  /** Random-hyperplane LSH bucketing (the ANN scale path): 8 deterministic
    * arithmetic hyperplanes; bucket = sign-bit vector of the 8 dots.
    * Vector values are scaled to ints (×1e6) and hyperplane weights are
    * pseudo-random ints, so every dot is exact integer arithmetic.
    */
  final val Planes = 8

  private def planeWeight(j: Int): Column => Column = i =>
    pmod((i + lit(j * 64)) * lit(2654435761L), lit(1000003L)) - lit(501001L)

  def lshBuckets(spark: SparkSession, dir: String): DataFrame = {
    Tables.fanout(spark, Tables.embeddings(spark, dir))
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .select(col("vec_id"), bucketExpr.as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec"),
        max(col("vec_id")).as("max_vec"))
  }

  val lshBucketsSql: String = {
    val xs = "list_transform(embedding, " +
      "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    val bits = (0 until Planes).map { j =>
      val dot = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(1, 65), " +
        s"i -> ($xs)[i] * ((((i - 1) + ${j * 64}) * 2654435761) % 1000003 " +
        s"- 501001))), (acc, x) -> acc + x)"
      s"CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END"
    }
    s"""WITH b AS (SELECT vec_id,
       |  (${bits.mkString(" + ")}) AS bucket FROM embeddings)
       |SELECT bucket, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec,
       |  MAX(vec_id) AS max_vec
       |FROM b GROUP BY bucket""".stripMargin
  }

  /** q44 — IVF-style cell assignment (the other ANN scale path next to
    * LSH): 16 deterministic seed vectors (vec_id < 16) act as the coarse
    * codebook; every vector joins its nearest seed by exact scaled-int
    * cosine; queries then probe only their cell. Seeds broadcast; the
    * argmax shuffles one narrow (vec_id, sim, cell) row per vector —
    * the vectors themselves never move (see [[nearestCell]]).
    */
  /** Nearest-cell argmax as a hash aggregate, not a window: the
    * seed-join emits 16 rows per vector, and `max(struct(sim, -cell))`
    * partial-aggregates them back to ONE row per vector map-side —
    * all 16 candidates of a vector live in the partition that produced
    * them — so the shuffle carries n narrow rows instead of the
    * window's 16n (plus its sort). Tie-break matches
    * `ORDER BY sim DESC, cell`: equal sims pick max(-cell) = min cell.
    */
  private def nearestCell(vecs: DataFrame, seeds: DataFrame,
      keep: Seq[String]): DataFrame = {
    val firsts = keep.map(c => first(col(c)).as(c))
    vecs.join(broadcast(seeds))
      .withColumn("sim", cosine(intDot(col("xs"), col("s_xs")),
        col("norm"), col("s_norm")))
      .groupBy(col("vec_id"))
      .agg(max(struct(col("sim"), (-col("cell")).as("neg_cell"))).as("m"),
        firsts: _*)
      .withColumn("cell", -col("m.neg_cell"))
      .drop("m")
  }

  def ivfAssign(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("norm").as("s_norm"))
    nearestCell(e, seeds, keep = Nil)
      .groupBy(col("cell"))
      .agg(count(lit(1)).as("n_vectors"),
        min(col("vec_id")).as("min_vec"))
  }

  val ivfAssignSql: String = {
    val dot = intDotSql("e.xs", "s.xs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS norm FROM v),
       |s AS (SELECT vec_id AS cell, xs, norm FROM e WHERE vec_id < 16),
       |p AS (SELECT e.vec_id, s.cell,
       |    CAST($dot AS DOUBLE) /
       |      sqrt(CAST(e.norm AS DOUBLE) * CAST(s.norm AS DOUBLE)) AS sim
       |  FROM e, s),
       |r AS (SELECT vec_id, cell, ROW_NUMBER() OVER
       |  (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rk FROM p)
       |SELECT cell, COUNT(*) AS n_vectors, MIN(vec_id) AS min_vec
       |FROM r WHERE rk = 1 GROUP BY cell""".stripMargin
  }

  /** The shared bucket expression for q43/q45 (sign bits of 8
    * deterministic hyperplane dots over the scaled vector `xs`).
    */
  private def bucketExpr: Column = {
    val bits = (0 until Planes).map { j =>
      val dot = aggregate(
        zip_with(col("xs"), sequence(lit(0), lit(63)),
          (x, i) => x * planeWeight(j)(i.cast(LongType))),
        lit(0L), (acc, x) => acc + x)
      when(dot > 0, lit(1L << j)).otherwise(lit(0L))
    }
    bits.reduce(_ + _)
  }

  /** q45 — the composed ANN scale pipeline: LSH-bucket first, then
    * compute exact cosine ONLY within buckets (candidate pairs shrink
    * from n²/2 to Σ bucket²/2 ≈ n²/256 here). Join key is the bucket —
    * the full-corpus cross join never happens.
    */
  def bucketedNearDups(spark: SparkSession, dir: String): DataFrame = {
    // same fanout-and-pin shape as cosineNearDups: one parallel
    // parse pass shared by both join sides
    val e = Tables.fanout(spark, Tables.embeddings(spark, dir))
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
      .withColumn("bucket", bucketExpr)
      .localCheckpoint(false)
    e.as("a").join(e.as("b"),
        col("a.bucket") === col("b.bucket") &&
          col("a.vec_id") < col("b.vec_id"))
      .withColumn("sim", cosine(intDot(col("a.xs"), col("b.xs")),
        col("a.norm"), col("b.norm")))
      .filter(col("sim") >= 0.2)
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        col("a.bucket").as("bucket"), col("sim"))
  }

  val bucketedNearDupsSql: String = {
    val xs = "list_transform(embedding, " +
      "x -> CAST(round(CAST(x AS DOUBLE) * 1e6) AS BIGINT))"
    val bits = (0 until Planes).map { j =>
      val dot = s"list_reduce(list_prepend(CAST(0 AS BIGINT), " +
        s"list_transform(range(1, 65), " +
        s"i -> xs[i] * ((((i - 1) + ${j * 64}) * 2654435761) % 1000003 " +
        s"- 501001))), (acc, x) -> acc + x)"
      s"CASE WHEN $dot > 0 THEN ${1L << j} ELSE 0 END"
    }
    val dot = intDotSql("a.xs", "b.xs")
    s"""WITH v AS (SELECT vec_id, $xs AS xs FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS norm,
       |  (${bits.mkString(" + ")}) AS bucket FROM v)
       |SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.bucket AS bucket,
       |  CAST($dot AS DOUBLE) /
       |    sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) AS sim
       |FROM e a JOIN e b
       |  ON a.bucket = b.bucket AND a.vec_id < b.vec_id
       |WHERE CAST($dot AS DOUBLE) /
       |    sqrt(CAST(a.norm AS DOUBLE) * CAST(b.norm AS DOUBLE)) >= 0.2""".stripMargin
  }

  // ---------------------------------------------------------------- q58
  /** Product-quantization codes — the memory-side ANN compression next
    * to IVF's routing: the 64-dim vector splits into 4 subspaces of 16
    * dims; each sub-vector snaps to its nearest of 4 deterministic
    * sub-centroids (vec_id < 4, the same seeding rule as IVF); the code
    * is the 4 centroid ids — 64 floats compress to 4 small ints.
    * Distances use the exact integer identity
    * ‖a−b‖² = ‖a‖² + ‖b‖² − 2·a·b over the native LongDot expression
    * (no per-pair array allocation). The codebook broadcasts; the corpus
    * shuffles only for the per-vector code assembly (4 rows of
    * (vec_id, sub, cell) — never vectors).
    */
  def pqCodes(spark: SparkSession, dir: String): DataFrame = {
    val subCount = 4
    val subDim = 16
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
    val subs = (0 until subCount).map { s =>
      e.select(col("vec_id"), lit(s).as("sub"),
        slice(col("xs"), s * subDim + 1, subDim).as("sxs"))
    }.reduce(_ unionByName _)
      .withColumn("snorm", intDot(col("sxs"), col("sxs")))
    val cents = subs.filter(col("vec_id") < 4)
      .select(col("sub"), col("vec_id").as("cell"),
        col("sxs").as("c_sxs"), col("snorm").as("c_norm"))
    // argmin by (dist, cell) via min(struct) — the aggregate argmax
    // pattern, no per-(vec, sub) window sort (r9, matching q98/q101)
    subs.join(broadcast(cents), "sub")
      .withColumn("dist", col("snorm") + col("c_norm") -
        lit(2) * intDot(col("sxs"), col("c_sxs")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.cell").as("cell"))
      .groupBy(col("vec_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("sub"), col("cell")))),
        p => p("cell").cast(StringType)), "-").as("code"))
  }

  val pqCodesSql: String = {
    val dot = intDotSql("p.sxs", "c.c_sxs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |subs AS (SELECT vec_id, s.sub,
       |    list_slice(xs, s.sub*16 + 1, s.sub*16 + 16) AS sxs
       |  FROM v, (SELECT unnest(range(4)) AS sub) s),
       |p AS (SELECT vec_id, sub, sxs,
       |    ${intDotSql("sxs", "sxs")} AS snorm FROM subs),
       |c AS (SELECT sub, vec_id AS cell, sxs AS c_sxs, snorm AS c_norm
       |  FROM p WHERE vec_id < 4),
       |d AS (SELECT p.vec_id, p.sub, c.cell,
       |    p.snorm + c.c_norm - 2 * ($dot) AS dist
       |  FROM p JOIN c ON p.sub = c.sub),
       |r AS (SELECT vec_id, sub, cell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rk FROM d)
       |SELECT vec_id,
       |  string_agg(CAST(cell AS VARCHAR), '-' ORDER BY sub) AS code
       |FROM r WHERE rk = 1 GROUP BY vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q76
  /** q76 — the composed IVF SEARCH pipeline (q44 only routes; this
    * answers queries): base vectors are assigned to their nearest coarse
    * cell once (seeds broadcast, one argmax row per vector shuffles —
    * [[nearestCell]]); each query
    * probes its `nProbe`=4 nearest of 16 cells; exact scaled-int cosine
    * then runs ONLY against candidates in probed cells (≈ nProbe/nCells
    * of the corpus) and top-k=10 reranks exactly. The 100 TB ANN read
    * path: store the corpus partitioned BY CELL, broadcast the
    * (query, probed-cell) table, and a query scans 4/16 of the data —
    * candidate rows, never the corpus, are all that moves.
    */
  def ivfSearch(spark: SparkSession, dir: String): DataFrame = {
    val nProbe = 4
    val k = 10
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("norm").as("s_norm"))
    val assigned = nearestCell(e, seeds, keep = Seq("xs", "norm"))
      .select(col("cell"), col("vec_id"), col("xs"), col("norm"))
    val queriesDf = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("xs").as("q_xs"),
        col("norm").as("q_norm"))
    val wProbe = Window.partitionBy(col("query_id"))
      .orderBy(col("sim").desc, col("cell"))
    val probes = queriesDf.join(broadcast(seeds))
      .withColumn("sim", cosine(intDot(col("q_xs"), col("s_xs")),
        col("q_norm"), col("s_norm")))
      .withColumn("rk", row_number().over(wProbe))
      .filter(col("rk") <= nProbe)
      .select(col("cell"), col("query_id"), col("q_xs"), col("q_norm"))
    // bounded top-k via the TopKBy aggregate — the probed-cell
    // candidate set per query is corpus/cells-sized at scale, so the
    // per-query rank window becomes the one piece that wouldn't
    // survive; the aggregate keeps k rows per group map-side (r9,
    // matching q98/q101)
    assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .withColumn("sim", cosine(intDot(col("q_xs"), col("xs")),
        col("q_norm"), col("norm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(
        col("sim"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).as("rank"), // int, matching the window form
        col("col.score").as("sim"))
  }

  val ivfSearchSql: String = {
    def cos(dot: String, na: String, nb: String) =
      s"CAST($dot AS DOUBLE) / sqrt(CAST($na AS DOUBLE) * " +
        s"CAST($nb AS DOUBLE))"
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS norm FROM v),
       |s AS (SELECT vec_id AS cell, xs, norm FROM e WHERE vec_id < 16),
       |pa AS (SELECT e.vec_id, s.cell,
       |    ${cos(intDotSql("e.xs", "s.xs"), "e.norm", "s.norm")} AS sim
       |  FROM e, s),
       |ar AS (SELECT vec_id, cell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rk FROM pa),
       |a AS (SELECT vec_id, cell FROM ar WHERE rk = 1),
       |q AS (SELECT vec_id AS query_id, xs, norm FROM e
       |  WHERE vec_id < 20),
       |pq AS (SELECT q.query_id, s.cell,
       |    ${cos(intDotSql("q.xs", "s.xs"), "q.norm", "s.norm")} AS sim
       |  FROM q, s),
       |pr AS (SELECT query_id, cell, ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY sim DESC, cell) AS rk
       |  FROM pq),
       |probe AS (SELECT query_id, cell FROM pr WHERE rk <= 4),
       |cand AS (SELECT probe.query_id, a.vec_id FROM probe
       |  JOIN a ON a.cell = probe.cell WHERE a.vec_id <> probe.query_id),
       |sims AS (SELECT c.query_id, c.vec_id AS neighbor_id,
       |    ${cos(intDotSql("qe.xs", "ne.xs"), "qe.norm", "ne.norm")} AS sim
       |  FROM cand c JOIN e ne ON ne.vec_id = c.vec_id
       |  JOIN e qe ON qe.vec_id = c.query_id),
       |r AS (SELECT query_id, neighbor_id, sim, ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY sim DESC, neighbor_id) AS rank
       |  FROM sims)
       |SELECT query_id, neighbor_id, rank, sim FROM r
       |WHERE rank <= 10""".stripMargin
  }

  // ---------------------------------------------------------------- q101
  /** The composed production ANN stack — IVF routing (q76) over PQ
    * ADC ranking (q98): a query probes its 4 nearest of 16 coarse
    * cells, and candidates inside those cells are ranked by the
    * 4-int-code ADC distance, never by stored vectors. This is the
    * "IVFPQ" read path: the corpus is partitioned by coarse cell on
    * disk, each query scans nProbe/nCells of the CODES (4 longs per
    * vector), and the only per-candidate math is 4 LUT adds.
    *
    * Exactness contract: routing and ranking are both deterministic
    * (cosine probe ties to the smaller cell, integer ADC ties to the
    * smaller id), so the oracle hash-matches even though ADC itself is
    * an approximation of the true distance — q90's recall harness is
    * the place where approximation QUALITY is graded; here the oracle
    * pins the algorithm.
    */
  def ivfAdcSearch(spark: SparkSession, dir: String): DataFrame = {
    val nProbe = 4
    val k = 5
    val subCount = 4
    val subDim = 16
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 16)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("norm").as("s_norm"))
    val assigned = nearestCell(e, seeds, keep = Nil)
      .select(col("vec_id"), col("cell"))
    // PQ codebook + codes (q58/q98 scheme, sub-centroids = vec_id < 4)
    val subs = (0 until subCount).map { s =>
      e.select(col("vec_id"), lit(s).as("sub"),
        slice(col("xs"), s * subDim + 1, subDim).as("sxs"))
    }.reduce(_ unionByName _)
      .withColumn("snorm", intDot(col("sxs"), col("sxs")))
    val cents = subs.filter(col("vec_id") < 4)
      .select(col("sub"), col("vec_id").as("pcell"),
        col("sxs").as("c_sxs"), col("snorm").as("c_norm"))
    // code argmax via min(struct(dist, pcell)) — the q89 aggregate
    // pattern: partial min map-side, no per-(vec,sub) window sort
    val codes = subs.join(broadcast(cents), "sub")
      .withColumn("dist", col("snorm") + col("c_norm") -
        lit(2L) * intDot(col("sxs"), col("c_sxs")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("pcell"))).as("best"))
      .select(col("vec_id"), col("sub"), col("best.pcell").as("pcell"))
    // query-side: coarse probes (cosine) + ADC lookup table
    val queriesDf = e.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("xs").as("q_xs"),
        col("norm").as("q_norm"))
    // coarse probe top-nProbe via the bounded top-k aggregate (same
    // (sim desc, cell asc) order the window form had)
    val probes = queriesDf.join(broadcast(seeds))
      .withColumn("sim", cosine(intDot(col("q_xs"), col("s_xs")),
        col("q_norm"), col("s_norm")))
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(col("sim"),
        col("cell"), nProbe).as("top"))
      .select(col("query_id"), explode(col("top")).as("t"))
      .select(col("query_id"), col("t.id").as("cell"))
    val lut = subs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sxs").as("q_sxs"), col("snorm").as("q_norm"))
      .join(broadcast(cents), Seq("sub"))
      .select(col("query_id"), col("sub"), col("pcell"),
        (col("q_norm") + col("c_norm") -
          lit(2L) * intDot(col("q_sxs"), col("c_sxs"))).as("part_dist"))
    // candidates = vectors in probed cells; rank by summed LUT entries
    val cand = assigned.join(broadcast(probes), Seq("cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id"))
    val scored = cand.join(codes, Seq("vec_id"))
      .join(broadcast(lut), Seq("query_id", "sub", "pcell"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("part_dist")).as("adc_dist"),
        count(lit(1)).as("n_subs"))
      .filter(col("n_subs") === subCount)
    // final rank: bounded top-k on negated distance (adc_dist is an
    // integer LUT sum, exact in a double), rank from array position —
    // q101's plan is now window-free end to end
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(
        (-col("adc_dist")).cast("double"), col("vec_id"), k).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast(LongType).as("rank"),
        (-col("col.score")).cast(LongType).as("adc_dist"))
  }

  val ivfAdcSearchSql: String = {
    def cos(dot: String, na: String, nb: String) =
      s"CAST($dot AS DOUBLE) / sqrt(CAST($na AS DOUBLE) * " +
        s"CAST($nb AS DOUBLE))"
    val cdot = intDotSql("p.sxs", "c.c_sxs")
    val qdot = intDotSql("qs.sxs", "c.c_sxs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS norm FROM v),
       |s AS (SELECT vec_id AS cell, xs, norm FROM e WHERE vec_id < 16),
       |pa AS (SELECT e.vec_id, s.cell,
       |    ${cos(intDotSql("e.xs", "s.xs"), "e.norm", "s.norm")} AS sim
       |  FROM e, s),
       |ar AS (SELECT vec_id, cell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id ORDER BY sim DESC, cell) AS rk FROM pa),
       |a AS (SELECT vec_id, cell FROM ar WHERE rk = 1),
       |subs AS (SELECT vec_id, ss.sub,
       |    list_slice(xs, ss.sub*16 + 1, ss.sub*16 + 16) AS sxs
       |  FROM v, (SELECT unnest(range(4)) AS sub) ss),
       |p AS (SELECT vec_id, sub, sxs,
       |    ${intDotSql("sxs", "sxs")} AS snorm FROM subs),
       |c AS (SELECT sub, vec_id AS pcell, sxs AS c_sxs, snorm AS c_norm
       |  FROM p WHERE vec_id < 4),
       |cd AS (SELECT p.vec_id, p.sub, c.pcell,
       |    p.snorm + c.c_norm - 2 * ($cdot) AS dist
       |  FROM p JOIN c ON p.sub = c.sub),
       |cr AS (SELECT vec_id, sub, pcell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id, sub ORDER BY dist, pcell) AS rk FROM cd),
       |codes AS (SELECT vec_id, sub, pcell FROM cr WHERE rk = 1),
       |q AS (SELECT vec_id AS query_id, xs, norm FROM e
       |  WHERE vec_id < 20),
       |pq AS (SELECT q.query_id, s.cell,
       |    ${cos(intDotSql("q.xs", "s.xs"), "q.norm", "s.norm")} AS sim
       |  FROM q, s),
       |pr AS (SELECT query_id, cell, ROW_NUMBER() OVER
       |    (PARTITION BY query_id ORDER BY sim DESC, cell) AS rk
       |  FROM pq),
       |probe AS (SELECT query_id, cell FROM pr WHERE rk <= 4),
       |lut AS (SELECT qs.vec_id AS query_id, qs.sub, c.pcell,
       |    qs.snorm + c.c_norm - 2 * ($qdot) AS part_dist
       |  FROM p qs JOIN c ON qs.sub = c.sub WHERE qs.vec_id < 20),
       |cand AS (SELECT probe.query_id, a.vec_id FROM probe
       |  JOIN a ON a.cell = probe.cell WHERE a.vec_id <> probe.query_id),
       |scored AS (SELECT cand.query_id, cand.vec_id,
       |    SUM(part_dist)::BIGINT AS adc_dist
       |  FROM cand JOIN codes ON codes.vec_id = cand.vec_id
       |    JOIN lut ON lut.query_id = cand.query_id
       |    AND lut.sub = codes.sub AND lut.pcell = codes.pcell
       |  GROUP BY 1, 2 HAVING COUNT(*) = 4),
       |ranked AS (SELECT query_id, vec_id, adc_dist, ROW_NUMBER() OVER
       |  (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT)
       |  AS rank, adc_dist
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  // ---------------------------------------------------------------- q152
  /** The incremental-maintenance contract of the persisted IVF-PQ
    * index ([[VectorIndex.append]]) as an oracle-checked query:
    * quantizers come from the BASE split only (deterministic literal
    * seeds, the q101 scheme — the 16 smallest base ids as coarse
    * centroids, the 4 smallest as per-sub-space codebooks), then the
    * REAL [[VectorIndex.encode]] path runs batch-by-batch — base in
    * one pass, the `vec_id % 5 == 0` "append" batch in a second,
    * exactly what `append` does to a saved index. The DuckDB oracle
    * encodes the whole corpus in ONE pass; hash equality IS the
    * append contract (a vector's codes are a pure function of
    * (quantizers, vector), so batching cannot change them).
    */
  def indexAppendEncode(spark: SparkSession, dir: String): DataFrame = {
    val cfg = VectorIndex.Config(nCells = 16, subCount = 4,
      subDim = 16, pqK = 4)
    val emb = Tables.embeddings(spark, dir)
    val e = emb.select(col("vec_id"), intVec(col("embedding")).as("xs"))
    // base-only quantizers: smallest 16 / 4 base ids (vec_id % 5 != 0)
    val centroids = e
      .filter(col("vec_id") < 20 && col("vec_id") % 5 =!= 0)
      .select(col("vec_id").as("cell"), col("xs"))
      .withColumn("norm", intDot(col("xs"), col("xs")))
    val codebooks = (0 until cfg.subCount).map { s =>
      e.filter(col("vec_id") < 5 && col("vec_id") % 5 =!= 0)
        .select(lit(s).as("sub"), col("vec_id").as("pcell"),
          slice(col("xs"), s * cfg.subDim + 1, cfg.subDim).as("sxs"))
    }.reduce(_ unionByName _)
      .withColumn("norm", intDot(col("sxs"), col("sxs")))
    val quantizers = VectorIndex.Index(cfg, centroids, codebooks, null)
    VectorIndex.encode(quantizers, emb.filter(col("vec_id") % 5 =!= 0))
      .unionByName(
        VectorIndex.encode(quantizers, emb.filter(col("vec_id") % 5 === 0)))
  }

  val indexAppendEncodeSql: String = {
    val adot = intDotSql("e.xs", "s.xs")
    val cdot = intDotSql("p.sxs", "c.c_sxs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS norm FROM v),
       |s AS (SELECT vec_id AS cell, xs, norm FROM e
       |  WHERE vec_id < 20 AND vec_id % 5 <> 0),
       |pa AS (SELECT e.vec_id, s.cell,
       |    e.norm + s.norm - 2 * ($adot) AS dist
       |  FROM e, s),
       |ar AS (SELECT vec_id, cell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM pa),
       |a AS (SELECT vec_id, cell FROM ar WHERE rk = 1),
       |subs AS (SELECT vec_id, ss.sub,
       |    list_slice(xs, ss.sub*16 + 1, ss.sub*16 + 16) AS sxs
       |  FROM v, (SELECT unnest(range(4)) AS sub) ss),
       |p AS (SELECT vec_id, sub, sxs,
       |    ${intDotSql("sxs", "sxs")} AS snorm FROM subs),
       |c AS (SELECT sub, vec_id AS pcell, sxs AS c_sxs, snorm AS c_norm
       |  FROM p WHERE vec_id < 5 AND vec_id % 5 <> 0),
       |cd AS (SELECT p.vec_id, p.sub, c.pcell,
       |    p.snorm + c.c_norm - 2 * ($cdot) AS dist
       |  FROM p JOIN c ON p.sub = c.sub),
       |cr AS (SELECT vec_id, sub, pcell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id, sub ORDER BY dist, pcell) AS rk FROM cd),
       |codes AS (SELECT vec_id, sub, pcell FROM cr WHERE rk = 1)
       |SELECT a.cell, codes.vec_id, codes.sub, codes.pcell
       |FROM codes JOIN a ON a.vec_id = codes.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q87
  /** One exact k-means (Lloyd) step — the clustering half of semantic
    * dedup / data-mix curation: assign every vector to its nearest of
    * k=8 seed centroids by squared Euclidean distance, then emit the
    * new centroid as per-dimension integer sums plus member counts
    * (callers divide sum/n when they need the float centroid; keeping
    * sums exact is what lets the DuckDB oracle hash-match and makes
    * the merge associative).
    *
    * Distance is pure 64-bit integer arithmetic over the pre-scaled
    * vectors: ‖x−s‖² = x·x − 2·x·s + s·s (max ~2.5e14 at these dims —
    * no overflow, no float ties). Ties break toward the smaller cell.
    * Scale shape: seeds broadcast; the argmin is a map-side max(struct)
    * aggregate (no window); the re-centroid explodes to (cell, dim)
    * longs — k·dims rows out of the shuffle regardless of corpus size.
    * Driver-side iteration loops this step exactly like
    * connectedComponents loops label propagation.
    */
  def kmeansStep(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("xx", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("xx").as("ss"))
    val assigned = e.join(broadcast(seeds))
      .withColumn("dist", col("xx") -
        lit(2L) * intDot(col("xs"), col("s_xs")) + col("ss"))
      .groupBy(col("vec_id"))
      .agg(max(struct((-col("dist")).as("neg_dist"),
        (-col("cell")).as("neg_cell"))).as("m"),
        first(col("xs")).as("xs"))
      .withColumn("cell", -col("m.neg_cell"))
    assigned.select(col("cell"), posexplode(col("xs")))
      .groupBy(col("cell"), col("pos"))
      .agg(count(lit(1)).as("n_members"), sum(col("col")).as("dim_sum"))
      .select(col("cell"), (col("pos") + 1).cast(LongType).as("dim"),
        col("n_members"), col("dim_sum"))
  }

  val kmeansStepSql: String = {
    val dot = intDotSql("e.xs", "s.s_xs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS xx FROM v),
       |s AS (SELECT vec_id AS cell, xs AS s_xs, xx AS ss FROM e
       |  WHERE vec_id < 8),
       |p AS (SELECT e.vec_id, s.cell, e.xs,
       |    e.xx - 2 * $dot + s.ss AS dist FROM e, s),
       |r AS (SELECT vec_id, cell, xs, ROW_NUMBER() OVER
       |  (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM p),
       |a AS (SELECT cell, xs FROM r WHERE rk = 1),
       |x AS (SELECT cell, unnest(xs) AS elem,
       |  unnest(range(1, len(xs) + 1)) AS dim FROM a)
       |SELECT cell, CAST(dim AS BIGINT) AS dim,
       |  COUNT(*) AS n_members, SUM(elem)::BIGINT AS dim_sum
       |FROM x GROUP BY 1, 2""".stripMargin
  }

  // ---------------------------------------------------------------- q97
  /** SemDeDup-style semantic dedup: cluster first (q87's exact integer
    * Lloyd assignment to k=8 cells), then look for near-duplicate
    * cosine pairs ONLY inside each cell, and keep the smallest vec_id
    * of every duplicate neighborhood. The verdict per vector is the
    * count of smaller-id same-cell neighbors above the threshold —
    * `is_kept` iff none.
    *
    * Scale shape: this is the production answer to q41's O(n²) oracle
    * scan — the pair join is equi-keyed on `cell`, so candidates shrink
    * from n² to Σ|cell|², and the per-cell work parallelizes over the
    * cell hash partitioning. A skewed giant cell is the [[Skew]]
    * salting case; at 100 TB you'd also raise k so cells stay bounded
    * (k scales with corpus, the per-cell scan stays constant).
    */
  final val SemDedupThreshold = 0.3

  def semanticDedup(spark: SparkSession, dir: String): DataFrame = {
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
      .withColumn("xx", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("xx").as("ss"))
    val assigned = e.join(broadcast(seeds))
      .withColumn("dist", col("xx") -
        lit(2L) * intDot(col("xs"), col("s_xs")) + col("ss"))
      .groupBy(col("vec_id"))
      .agg(max(struct((-col("dist")).as("neg_dist"),
        (-col("cell")).as("neg_cell"))).as("m"),
        first(col("xs")).as("xs"), first(col("xx")).as("xx"))
      .select(col("vec_id"), (-col("m.neg_cell")).as("cell"),
        col("xs"), col("xx"))
    val dups = assigned.as("x")
      .join(assigned.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.vec_id") > col("y.vec_id"))
      .withColumn("sim", cosine(intDot(col("x.xs"), col("y.xs")),
        col("x.xx"), col("y.xx")))
      .filter(col("sim") >= SemDedupThreshold)
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(count(lit(1)).as("n_dup_above"))
    assigned.join(dups, Seq("vec_id"), "left")
      .select(col("vec_id"), col("cell"),
        coalesce(col("n_dup_above"), lit(0L)).as("n_dup_above"))
      .withColumn("is_kept", col("n_dup_above") === 0)
  }

  val semanticDedupSql: String = {
    val dot = intDotSql("e.xs", "s.s_xs")
    val pdot = intDotSql("x.xs", "y.xs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |e AS (SELECT vec_id, xs, ${intDotSql("xs", "xs")} AS xx FROM v),
       |s AS (SELECT vec_id AS cell, xs AS s_xs, xx AS ss FROM e
       |  WHERE vec_id < 8),
       |p AS (SELECT e.vec_id, s.cell, e.xs, e.xx,
       |    e.xx - 2 * $dot + s.ss AS dist FROM e, s),
       |r AS (SELECT vec_id, cell, xs, xx, ROW_NUMBER() OVER
       |  (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM p),
       |a AS (SELECT vec_id, cell, xs, xx FROM r WHERE rk = 1),
       |d AS (SELECT x.vec_id, COUNT(*) AS n_dup_above
       |  FROM a x JOIN a y ON x.cell = y.cell AND x.vec_id > y.vec_id
       |  WHERE CAST($pdot AS DOUBLE) /
       |    sqrt(CAST(x.xx AS DOUBLE) * CAST(y.xx AS DOUBLE))
       |    >= $SemDedupThreshold
       |  GROUP BY 1)
       |SELECT a.vec_id, a.cell,
       |  CAST(coalesce(d.n_dup_above, 0) AS BIGINT) AS n_dup_above,
       |  coalesce(d.n_dup_above, 0) = 0 AS is_kept
       |FROM a LEFT JOIN d ON a.vec_id = d.vec_id""".stripMargin
  }

  // ---------------------------------------------------------------- q98
  /** PQ asymmetric-distance (ADC) search over the q58 codes — the
    * memory-bound ANN scan: queries (vec_id < 20) never touch stored
    * vectors, only the 4-int codes. Per query, a lookup table of
    * ‖q_sub − c_{sub,cell}‖² (4 subs × 4 cells, exact integers) is
    * built against the broadcast codebook; a stored vector's distance
    * is the SUM of the 4 LUT entries its code selects. Top-5 per query,
    * ascending ADC distance.
    *
    * Everything stays 64-bit integer — the result column is the exact
    * scaled squared distance, so the oracle hash-matches bitwise with
    * no float rule needed. Scale shape: codes are 4 narrow rows per
    * vector; the LUT (queries × subs × cells) broadcasts; the partial
    * per-(query, vector) sums aggregate map-side. The corpus-sized
    * shuffle carries (query_id, vec_id, partial) longs — vectors move
    * only to build the codebook-side assignment, same as q58.
    */
  def pqAdcSearch(spark: SparkSession, dir: String): DataFrame = {
    val subCount = 4
    val subDim = 16
    val e = Tables.embeddings(spark, dir)
      .select(col("vec_id"), intVec(col("embedding")).as("xs"))
    val subs = (0 until subCount).map { s =>
      e.select(col("vec_id"), lit(s).as("sub"),
        slice(col("xs"), s * subDim + 1, subDim).as("sxs"))
    }.reduce(_ unionByName _)
      .withColumn("snorm", intDot(col("sxs"), col("sxs")))
    // argmin by (dist, cell) via min(struct) — the q89/q101 aggregate
    // argmax pattern, no per-(vec, sub) window sort
    val codes = subs.join(broadcast(
        subs.filter(col("vec_id") < 4).select(col("sub"),
          col("vec_id").as("cell"), col("sxs").as("c_sxs"),
          col("snorm").as("c_norm"))), "sub")
      .withColumn("dist", col("snorm") + col("c_norm") -
        lit(2L) * intDot(col("sxs"), col("c_sxs")))
      .groupBy(col("vec_id"), col("sub"))
      .agg(min(struct(col("dist"), col("cell"))).as("m"))
      .select(col("vec_id"), col("sub"), col("m.cell").as("cell"))
    val lut = subs.filter(col("vec_id") < 20)
      .select(col("vec_id").as("query_id"), col("sub"),
        col("sxs").as("q_sxs"), col("snorm").as("q_norm"))
      .join(subs.filter(col("vec_id") < 4).select(col("sub"),
        col("vec_id").as("cell"), col("sxs").as("c_sxs"),
        col("snorm").as("c_norm")), Seq("sub"))
      .select(col("query_id"), col("sub"), col("cell"),
        (col("q_norm") + col("c_norm") -
          lit(2L) * intDot(col("q_sxs"), col("c_sxs"))).as("part_dist"))
    val scored = codes.join(broadcast(lut), Seq("sub", "cell"))
      .filter(col("vec_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("vec_id"))
      .agg(sum(col("part_dist")).as("adc_dist"),
        count(lit(1)).as("n_subs"))
      .filter(col("n_subs") === subCount)
    // bounded top-5 via the TopKBy aggregate (the q101 pattern): at
    // scale every query's candidate partition is corpus-sized, so a
    // per-query window sort is the one piece that wouldn't survive —
    // the aggregate keeps 5 rows per group map-side instead
    scored
      .groupBy(col("query_id"))
      .agg(graft.functions.GraftFunctions.topKBy(
        (-col("adc_dist")).cast("double"), col("vec_id"), 5).as("top"))
      .select(col("query_id"), posexplode(col("top")))
      .select(col("query_id"), col("col.id").as("neighbor_id"),
        (col("pos") + 1).cast(LongType).as("rank"),
        (-col("col.score")).cast(LongType).as("adc_dist"))
  }

  val pqAdcSearchSql: String = {
    val cdot = intDotSql("p.sxs", "c.c_sxs")
    val qdot = intDotSql("q.sxs", "c.c_sxs")
    s"""WITH v AS (SELECT vec_id, ${intVecSql("embedding")} AS xs
       |  FROM embeddings),
       |subs AS (SELECT vec_id, s.sub,
       |    list_slice(xs, s.sub*16 + 1, s.sub*16 + 16) AS sxs
       |  FROM v, (SELECT unnest(range(4)) AS sub) s),
       |p AS (SELECT vec_id, sub, sxs,
       |    ${intDotSql("sxs", "sxs")} AS snorm FROM subs),
       |c AS (SELECT sub, vec_id AS cell, sxs AS c_sxs, snorm AS c_norm
       |  FROM p WHERE vec_id < 4),
       |d AS (SELECT p.vec_id, p.sub, c.cell,
       |    p.snorm + c.c_norm - 2 * ($cdot) AS dist
       |  FROM p JOIN c ON p.sub = c.sub),
       |r AS (SELECT vec_id, sub, cell, ROW_NUMBER() OVER
       |    (PARTITION BY vec_id, sub ORDER BY dist, cell) AS rk FROM d),
       |codes AS (SELECT vec_id, sub, cell FROM r WHERE rk = 1),
       |lut AS (SELECT q.vec_id AS query_id, q.sub, c.cell,
       |    q.snorm + c.c_norm - 2 * ($qdot) AS part_dist
       |  FROM p q JOIN c ON q.sub = c.sub WHERE q.vec_id < 20),
       |scored AS (SELECT lut.query_id, codes.vec_id,
       |    SUM(part_dist)::BIGINT AS adc_dist
       |  FROM codes JOIN lut ON codes.sub = lut.sub
       |    AND codes.cell = lut.cell
       |  WHERE codes.vec_id <> lut.query_id
       |  GROUP BY 1, 2 HAVING COUNT(*) = 4),
       |ranked AS (SELECT query_id, vec_id, adc_dist, ROW_NUMBER() OVER
       |  (PARTITION BY query_id ORDER BY adc_dist, vec_id) AS rank
       |  FROM scored)
       |SELECT query_id, vec_id AS neighbor_id, CAST(rank AS BIGINT)
       |  AS rank, adc_dist
       |FROM ranked WHERE rank <= 5""".stripMargin
  }

  /** Full Lloyd iteration driven from the driver, the way
    * [[graft.operators.CurationOps.connectedComponents]] drives label
    * propagation: per round the k×dims centroid table COLLECTS (it is
    * tiny by construction), re-broadcasts as the next seed set, and the
    * corpus is touched by exactly one map-side argmin + one (cell, dim)
    * aggregation — no window, no corpus shuffle growth across rounds.
    *
    * Centroids stay INTEGER: c_dim = floorDiv(Σx_dim, n). Quantized
    * centroids keep every round bit-deterministic across engines and
    * retries (float averaging would make iteration order observable);
    * the ≤1-unit-per-dim quantization error is noise at Scale=1e6. A
    * cell that loses all members keeps its previous centroid. Returns
    * after `maxIter` rounds or when centroids are exactly fixed.
    *
    * Seeding is deterministic farthest-point (greedy k-means++ with
    * the max- instead of sampled-probability rule): seed 0 is the
    * minimum vec_id, each next seed the vector farthest from its
    * nearest chosen seed (ties to the smaller vec_id). That costs k-1
    * extra corpus aggregations but removes the local optima that
    * arbitrary first-k seeds fall into when they land in one cluster,
    * and needs no RNG — reruns and stragglers agree bit-for-bit.
    */
  final case class KmeansResult(assignments: DataFrame,
      centroids: Map[Long, Seq[Long]], iters: Int, converged: Boolean)

  def kmeansIterate(vectors: DataFrame, k: Int, maxIter: Int = 20)
      : KmeansResult = {
    val spark = vectors.sparkSession
    import spark.implicits._
    val e = vectors.select(col("vec_id"), col("xs"))
      .withColumn("xx", intDot(col("xs"), col("xs")))
      .persist()
    try {
      def vecOf(r: org.apache.spark.sql.Row, field: String): Seq[Long] =
        r.getAs[scala.collection.Seq[Long]](field).toVector
      val first0 = e.orderBy(col("vec_id")).limit(1).collect().head
      var seedVecs = Vector(vecOf(first0, "xs"))
      while (seedVecs.size < k) {
        val chosen = broadcast(seedVecs.zipWithIndex
          .map { case (xs, i) => (i.toLong, xs) }.toDF("cell", "s_xs")
          .withColumn("ss", intDot(col("s_xs"), col("s_xs"))))
        val far = e.join(chosen)
          .withColumn("dist", col("xx") -
            lit(2L) * intDot(col("xs"), col("s_xs")) + col("ss"))
          .groupBy(col("vec_id"))
          .agg(min(col("dist")).as("d"), first(col("xs")).as("xs"))
          .agg(max(struct(col("d"), (-col("vec_id")).as("neg_id"),
            col("xs"))).as("m"))
          .select(col("m.xs")).collect().head
        seedVecs :+= vecOf(far, "xs")
      }
      var centroids: Map[Long, Seq[Long]] =
        seedVecs.zipWithIndex.map { case (xs, i) => i.toLong -> xs }.toMap
      var iters = 0
      var converged = false
      var assigned: DataFrame = null
      while (!converged && iters < maxIter) {
        val seeds = broadcast(centroids.toSeq
          .map { case (c, xs) => (c, xs) }.toDF("cell", "s_xs")
          .withColumn("ss", intDot(col("s_xs"), col("s_xs"))))
        assigned = e.join(seeds)
          .withColumn("dist", col("xx") -
            lit(2L) * intDot(col("xs"), col("s_xs")) + col("ss"))
          .groupBy(col("vec_id"))
          .agg(max(struct((-col("dist")).as("neg_dist"),
            (-col("cell")).as("neg_cell"))).as("m"),
            first(col("xs")).as("xs"))
          .select(col("vec_id"), (-col("m.neg_cell")).as("cell"),
            col("xs"))
        val sums = assigned
          .select(col("cell"), posexplode(col("xs")))
          .groupBy(col("cell"), col("pos"))
          .agg(count(lit(1)).as("n"), sum(col("col")).as("s"))
          .collect()
        val next = sums.groupBy(_.getLong(0)).map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(r =>
            Math.floorDiv(r.getLong(3), r.getLong(2))).toSeq
        }
        val updated = centroids.map { case (c, xs) =>
          c -> next.getOrElse(c, xs) // empty cell keeps its centroid
        }
        converged = updated == centroids
        centroids = updated
        iters += 1
      }
      KmeansResult(
        assignments = assigned.select(col("vec_id"), col("cell")),
        centroids, iters, converged)
    } finally e.unpersist()
  }

  // ---------------------------------------------------------------- q127
  /** Embedding outlier score: squared distance of each vector to its
    * label's centroid, with an is_outlier gate at the per-label P90 —
    * the standard embedding-space hygiene pass (mislabeled or corrupted
    * examples sit far from their class centroid). All exact integers:
    * centroids are floor(sum/count) per dimension in the ×1e6 scale
    * (the q91 pmod floor-division, identical to DuckDB's `//`), and the
    * P90 cutoff is a ceil-rank order statistic over floor-binned
    * distances (the q104 histogram-quantile pattern) — never a
    * percentile over doubles.
    *
    * Scale shape: one posexplode census keyed by (label, dim) — 64·|labels|
    * rows — broadcast back as assembled centroid arrays; distances are
    * map-side; the cutoff scan runs over the (label, bin) census, which
    * is bounded by the bin resolution, not the corpus.
    */
  def embeddingOutliers(spark: SparkSession, dir: String): DataFrame =
    embeddingOutliersOf(Tables.embeddings(spark, dir))

  final val OutlierBinWidth = 10000000000L // dist² (scale 1e12) per bin

  def embeddingOutliersOf(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
        intVec(col("embedding")).as("xs"))
      .withColumn("xx", intDot(col("xs"), col("xs")))
    val cents = e.select(col("label"),
        posexplode(col("xs")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      // floor(s/n) exactly (DuckDB `//`); Spark div truncates, so
      // subtract the pmod remainder first
      .withColumn("c", ((col("s") - pmod(col("s"), col("n"))) /
        col("n")).cast(LongType))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("c")))), s => s.getField("c")).as("cs"))
      .withColumn("cc", intDot(col("cs"), col("cs")))
    val dists = e.join(broadcast(cents), Seq("label"))
      .withColumn("dist2", col("xx") -
        lit(2L) * intDot(col("xs"), col("cs")) + col("cc"))
      .select(col("vec_id"), col("label"), col("dist2"),
        (col("dist2") / lit(OutlierBinWidth)).cast(LongType).as("bin"))
      .localCheckpoint()
    val census = dists.groupBy(col("label"), col("bin"))
      .agg(count(lit(1)).as("cnt"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("label")).orderBy(col("bin"))
    val cutoff = census
      .withColumn("cum", sum(col("cnt")).over(w))
      .withColumn("tot", sum(col("cnt")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("label"))))
      .filter(col("cum") * 10 >= col("tot") * 9)
      .groupBy(col("label")).agg(min(col("bin")).as("cutoff_bin"))
    dists.join(broadcast(cutoff), Seq("label"))
      .select(col("vec_id"), col("label"), col("dist2"), col("bin"),
        (col("bin") > col("cutoff_bin")).as("is_outlier"))
  }

  // ---------------------------------------------------------------- q143
  /** Label-pair centroid similarity — the embedding-space class-
    * overlap audit: cosine between every pair of label centroids,
    * with class sizes. High-similarity pairs flag label sets the
    * embedding can't separate (merge candidates, systematic
    * mislabeling, or a feature space too coarse for the taxonomy) —
    * the class-level companion to q127's per-vector outlier gate and
    * q128's hard negatives. Centroids use the exact q127/q91 integer
    * construction (floor(sum/n) in the ×1e6 scale); the cosine is one
    * IEEE division over exact integer dot/norms, deterministic on
    * both engines.
    *
    * Scale shape: the centroid census is 64·|labels| rows; the pair
    * matrix is |labels|² — both bounded by the label taxonomy, never
    * the corpus. One posexplode pass is the only corpus-sized work.
    */
  def labelSimilarity(spark: SparkSession, dir: String): DataFrame =
    labelSimilarityOf(Tables.embeddings(spark, dir))

  def labelSimilarityOf(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("label"),
      intVec(col("embedding")).as("xs"))
    val cents = e.select(col("label"),
        posexplode(col("xs")).as(Seq("dim", "x")))
      .groupBy(col("label"), col("dim"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
      .withColumn("c", ((col("s") - pmod(col("s"), col("n"))) /
        col("n")).cast(LongType))
      .groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("dim"),
        col("c")))), s => s.getField("c")).as("cs"),
        min(col("n")).as("n_vecs"))
      .withColumn("cc", intDot(col("cs"), col("cs")))
    cents.as("a").join(cents.as("b"),
        col("a.label") < col("b.label"))
      .select(col("a.label").as("label_a"),
        col("b.label").as("label_b"),
        col("a.n_vecs").as("n_a"), col("b.n_vecs").as("n_b"),
        cosine(intDot(col("a.cs"), col("b.cs")),
          col("a.cc"), col("b.cc")).as("centroid_cos"))
  }

  val labelSimilaritySql: String = {
    val xs = intVecSql("embedding")
    s"""WITH v AS (SELECT vec_id, label, $xs AS xs FROM embeddings),
       |sums AS (
       |  SELECT label, i AS dim, count(*) AS n,
       |    CAST(sum(xs[i]) AS BIGINT) AS s
       |  FROM v, range(1, 65) t(i) GROUP BY label, i),
       |cent AS (
       |  SELECT label,
       |    list((s - ((s % n + n) % n)) // n ORDER BY dim) AS cs,
       |    CAST(min(n) AS BIGINT) AS n_vecs
       |  FROM sums GROUP BY label),
       |c AS (SELECT label, cs, n_vecs,
       |  ${intDotSql("cs", "cs")} AS cc FROM cent)
       |SELECT a.label AS label_a, b.label AS label_b,
       |  a.n_vecs AS n_a, b.n_vecs AS n_b,
       |  CAST(${intDotSql("a.cs", "b.cs")} AS DOUBLE) /
       |    sqrt(CAST(a.cc AS DOUBLE) * CAST(b.cc AS DOUBLE))
       |    AS centroid_cos
       |FROM c a JOIN c b ON a.label < b.label""".stripMargin
  }

  val embeddingOutliersSql: String = {
    val xs = intVecSql("embedding")
    s"""WITH v AS (SELECT vec_id, label, $xs AS xs FROM embeddings),
       |e AS (SELECT vec_id, label, xs, ${intDotSql("xs", "xs")} AS xx
       |  FROM v),
       |sums AS (
       |  SELECT label, i AS dim, count(*) AS n,
       |    CAST(sum(xs[i]) AS BIGINT) AS s
       |  FROM e, range(1, 65) t(i) GROUP BY label, i),
       |cent AS (
       |  -- floor(s/n) for signed s: DuckDB integer `//` truncates
       |  -- toward zero, so strip the pmod remainder first (q91 trick)
       |  SELECT label,
       |    list((s - ((s % n + n) % n)) // n ORDER BY dim) AS cs
       |  FROM sums GROUP BY label),
       |centn AS (SELECT label, cs, ${intDotSql("cs", "cs")} AS cc
       |  FROM cent),
       |d AS (
       |  SELECT e.vec_id, e.label,
       |    e.xx - 2 * ${intDotSql("e.xs", "c.cs")} + c.cc AS dist2
       |  FROM e JOIN centn c ON e.label = c.label),
       |b AS (SELECT vec_id, label, dist2,
       |    dist2 // $OutlierBinWidth AS bin FROM d),
       |census AS (SELECT label, bin, count(*) AS cnt FROM b
       |  GROUP BY label, bin),
       |cum AS (
       |  SELECT label, bin,
       |    sum(cnt) OVER (PARTITION BY label ORDER BY bin) AS cum,
       |    sum(cnt) OVER (PARTITION BY label) AS tot
       |  FROM census),
       |cutoff AS (
       |  SELECT label, min(bin) AS cutoff_bin FROM cum
       |  WHERE cum * 10 >= tot * 9 GROUP BY label)
       |SELECT b.vec_id, b.label, b.dist2, b.bin,
       |  b.bin > c.cutoff_bin AS is_outlier
       |FROM b JOIN cutoff c ON b.label = c.label""".stripMargin
  }

  // ---------------------------------------------------------------- q128
  /** Cell-local hard-negative mining: for every vector, the most
    * cosine-similar vector of a DIFFERENT label inside the same coarse
    * cell — the contrastive-training staple (in-batch negatives are
    * easy; the informative ones are nearest-with-wrong-label). Cells
    * are the q97 broadcast seed assignment, so candidates stay
    * Σ|cell|² like SemDeDup, never corpus×corpus; at scale the same
    * IVF routing bounds every cell.
    *
    * The argmax is max(struct(sim, -vec_id)) — no per-vector window
    * sort — and ties break to the smaller neighbor id on both engines.
    */
  def hardNegatives(spark: SparkSession, dir: String): DataFrame =
    hardNegativesOf(Tables.embeddings(spark, dir))

  def hardNegativesOf(emb: DataFrame): DataFrame = {
    val e = emb
      .select(col("vec_id"), col("label"),
        intVec(col("embedding")).as("xs"))
      .withColumn("xx", intDot(col("xs"), col("xs")))
    val seeds = e.filter(col("vec_id") < 8)
      .select(col("vec_id").as("cell"), col("xs").as("s_xs"),
        col("xx").as("ss"))
    val assigned = e.join(broadcast(seeds))
      .withColumn("dist", col("xx") -
        lit(2L) * intDot(col("xs"), col("s_xs")) + col("ss"))
      .groupBy(col("vec_id"))
      .agg(max(struct((-col("dist")).as("neg_dist"),
        (-col("cell")).as("neg_cell"))).as("m"),
        first(col("label")).as("label"),
        first(col("xs")).as("xs"), first(col("xx")).as("xx"))
      .select(col("vec_id"), (-col("m.neg_cell")).as("cell"),
        col("label"), col("xs"), col("xx"))
      .localCheckpoint()
    val hn = assigned.as("x")
      .join(assigned.as("y"),
        col("x.cell") === col("y.cell") &&
          col("x.label") =!= col("y.label"))
      .withColumn("sim", cosine(intDot(col("x.xs"), col("y.xs")),
        col("x.xx"), col("y.xx")))
      .groupBy(col("x.vec_id").as("vec_id"))
      .agg(max(struct(col("sim"),
        (-col("y.vec_id")).as("neg_id"))).as("m"))
      .select(col("vec_id"), (-col("m.neg_id")).as("hn_id"),
        col("m.sim").as("hn_sim"))
    assigned.select(col("vec_id"), col("cell"), col("label"))
      .join(hn, Seq("vec_id"), "left")
  }

  val hardNegativesSql: String = {
    val dot = intDotSql("e.xs", "s.s_xs")
    val pdot = intDotSql("x.xs", "y.xs")
    s"""WITH v AS (SELECT vec_id, label,
       |    ${intVecSql("embedding")} AS xs FROM embeddings),
       |e AS (SELECT vec_id, label, xs, ${intDotSql("xs", "xs")} AS xx
       |  FROM v),
       |s AS (SELECT vec_id AS cell, xs AS s_xs, xx AS ss FROM e
       |  WHERE vec_id < 8),
       |p AS (SELECT e.vec_id, e.label, s.cell, e.xs, e.xx,
       |    e.xx - 2 * $dot + s.ss AS dist FROM e, s),
       |r AS (SELECT vec_id, label, cell, xs, xx, ROW_NUMBER() OVER
       |  (PARTITION BY vec_id ORDER BY dist, cell) AS rk FROM p),
       |a AS (SELECT vec_id, label, cell, xs, xx FROM r WHERE rk = 1),
       |cand AS (
       |  SELECT x.vec_id, y.vec_id AS hn_id,
       |    CAST($pdot AS DOUBLE) /
       |      sqrt(CAST(x.xx AS DOUBLE) * CAST(y.xx AS DOUBLE)) AS sim,
       |    ROW_NUMBER() OVER (PARTITION BY x.vec_id
       |      ORDER BY CAST($pdot AS DOUBLE) /
       |        sqrt(CAST(x.xx AS DOUBLE) * CAST(y.xx AS DOUBLE)) DESC,
       |        y.vec_id) AS rk
       |  FROM a x JOIN a y
       |    ON x.cell = y.cell AND x.label <> y.label)
       |SELECT a.vec_id, a.cell, a.label, c.hn_id, c.sim AS hn_sim
       |FROM a LEFT JOIN (SELECT * FROM cand WHERE rk = 1) c
       |  ON a.vec_id = c.vec_id""".stripMargin
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q127_embedding_outliers" -> (embeddingOutliers _),
    "q143_label_similarity" -> (labelSimilarity _),
    "q128_hard_negatives" -> (hardNegatives _),
    "q87_kmeans_step" -> (kmeansStep _),
    "q97_semantic_dedup" -> (semanticDedup _),
    "q98_pq_adc_search" -> (pqAdcSearch _),
    "q101_ivf_adc_search" -> (ivfAdcSearch _),
    "q152_index_append_encode" -> (indexAppendEncode _),
    "q76_ivf_search" -> (ivfSearch _),
    "q58_pq_codes" -> (pqCodes _),
    "q44_ivf_assign" -> (ivfAssign _),
    "q45_bucketed_neardup" -> (bucketedNearDups _),
    "q40_knn_cosine" -> (knn _),
    "q41_cosine_neardup" -> (cosineNearDups _),
    "q42_label_centroids" -> (labelCentroids _),
    "q43_lsh_buckets" -> (lshBuckets _))

  val oracles: Map[String, String] = Map(
    "q127_embedding_outliers" -> embeddingOutliersSql,
    "q143_label_similarity" -> labelSimilaritySql,
    "q128_hard_negatives" -> hardNegativesSql,
    "q87_kmeans_step" -> kmeansStepSql,
    "q97_semantic_dedup" -> semanticDedupSql,
    "q98_pq_adc_search" -> pqAdcSearchSql,
    "q101_ivf_adc_search" -> ivfAdcSearchSql,
    "q152_index_append_encode" -> indexAppendEncodeSql,
    "q76_ivf_search" -> ivfSearchSql,
    "q58_pq_codes" -> pqCodesSql,
    "q44_ivf_assign" -> ivfAssignSql,
    "q45_bucketed_neardup" -> bucketedNearDupsSql,
    "q40_knn_cosine" -> knnSql,
    "q41_cosine_neardup" -> cosineNearDupsSql,
    "q42_label_centroids" -> labelCentroidsSql,
    "q43_lsh_buckets" -> lshBucketsSql)
}
