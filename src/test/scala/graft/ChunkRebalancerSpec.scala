package graft

import org.apache.spark.sql.functions._

import graft.operators.ChunkRebalancer
import graft.operators.ChunkRebalancer._

class ChunkRebalancerSpec extends SparkSuite {

  private def g(tb: String, chunk: Long, rows: Long, bytes: Long = 0L,
      insertOnly: Boolean = true) =
    ChunkGroup("db", tb, chunk, rows, bytes, insertOnly)

  private def partRows(slices: Seq[ChunkSlice]): Map[Int, Long] =
    slices.groupBy(_.partitionId)
      .map { case (p, ss) => p -> ss.map(s => s.end - s.start).sum }

  test("none keeps first-seen chunk order, one partition per chunk") {
    val groups = Seq(g("t", 3, 10), g("t", 1, 50), g("t", 2, 30))
    val out = plan(groups, 4, Config(NoRebalance))
    assert(out.map(_.chunkId) == Seq(3L, 1L, 2L))
    assert(out.map(_.partitionId) == Seq(0, 1, 2))
    assert(out.forall(s => s.start == 0))
  }

  test("target <= 1 collapses to a single partition") {
    val groups = Seq(g("t", 1, 10), g("t", 2, 20))
    val out = plan(groups, 1, Config(AutoSplit, minPartitionRows = 1))
    assert(out.map(_.partitionId).distinct == Seq(0))
  }

  test("chunk_largest_first sorts by rows desc, stable on ties") {
    val groups = Seq(g("t", 1, 10), g("t", 2, 50), g("t", 3, 10),
      g("t", 4, 99))
    val out = plan(groups, 4, Config(ChunkLargestFirst))
    assert(out.sortBy(_.partitionId).map(_.chunkId) ==
      Seq(4L, 2L, 1L, 3L)) // ties (1,3) keep first-seen order
  }

  test("bytes cost orders by bytes with row tie-break") {
    val groups = Seq(g("t", 1, 100, bytes = 10), g("t", 2, 10, bytes = 999),
      g("t", 3, 50, bytes = 999))
    val out = plan(groups, 4, Config(ChunkLargestFirst, cost = BytesCost))
    assert(out.sortBy(_.partitionId).map(_.chunkId) == Seq(3L, 2L, 1L))
  }

  test("auto_split halves the skewed chunk, aligned to batch multiples") {
    // one 1000-row chunk, three 100-row chunks, target 4, min 100.
    // Reference trace: 1000 > avg(1300/4=325) -> halve at 500 (already
    // aligned); the LAST 500 (max_by_key keeps last max) halves at 250,
    // which aligns DOWN to 200 (tie between 200/300 picks lower) ->
    // 200+300; the first 500 likewise -> 200+300; then largest=300 is
    // not > 325 and concurrency is filled -> stop.
    val groups = Seq(g("t", 1, 1000), g("t", 2, 100), g("t", 3, 100),
      g("t", 4, 100))
    val out = plan(groups, 4,
      Config(AutoSplit, minPartitionRows = 100))
    val c1 = out.filter(_.chunkId == 1L)
    assert(c1.map(s => s.end - s.start).sorted == Seq(200L, 200L, 300L,
      300L))
    // split boundaries align to full 100-row sinker batches
    assert(c1.forall(s => s.start % 100 == 0 && s.end % 100 == 0))
    assert(out.map(_.partitionId).distinct.size == out.map(_.partitionId)
      .max + 1)
    // largest-first: partition 0 holds (a slice of) the big chunk
    assert(out.filter(_.partitionId == 0).head.chunkId == 1L)
  }

  test("auto_split never splits below 2x min rows and respects " +
      "the per-sinker partition cap") {
    val groups = Seq(g("t", 1, 399)) // can_split needs >= 2*200
    val out = plan(groups, 4, Config(AutoSplit, minPartitionRows = 200))
    assert(out.size == 1)
    // once filled (len >= target) a 2000/2000 split is NOT skewed at
    // ratio 1.0 (strict >) -> stops at exactly 2
    val big = Seq(g("t", 1, 4000))
    val even = plan(big, 2,
      Config(AutoSplit, minPartitionRows = 10, maxPartitionsPerSinker = 2))
    assert(even.map(_.partitionId).distinct.size == 2)
    // a sub-1.0 skew ratio keeps splitting to the cap:
    // min(total/min = 400, target*maxPerSinker = 4) = 4
    val capped = plan(big, 2,
      Config(AutoSplit, minPartitionRows = 10, maxPartitionsPerSinker = 2,
        splitSkewRatio = 0.5))
    assert(capped.map(_.partitionId).distinct.size == 4)
  }

  test("auto_split stops once filled and not skewed") {
    // four equal chunks, target 4: len >= target and largest == avg ->
    // not skewed at ratio 1.0, nothing splits
    val groups = (1 to 4).map(i => g("t", i.toLong, 100L))
    val out = plan(groups, 4, Config(AutoSplit, minPartitionRows = 10))
    assert(out.size == 4)
    assert(out.forall(s => s.end - s.start == 100L))
  }

  test("auto_split leaves mixed-DML chunks intact") {
    val groups = Seq(g("t", 1, 1000, insertOnly = false), g("t", 2, 100))
    val out = plan(groups, 4, Config(AutoSplit, minPartitionRows = 100))
    // the big chunk is not insert-only: only the 100-row chunk is
    // eligible but it is below 2x min, so nothing splits
    assert(out.count(_.chunkId == 1L) == 1)
    assert(out.filter(_.chunkId == 1L).head.end == 1000L)
  }

  test("table_min_rows merges contiguous runs and cuts fixed slices") {
    val groups = Seq(g("a", 2, 300), g("a", 1, 300), g("b", 1, 100))
    val out = plan(groups, 4, Config(TableMinRows, minPartitionRows = 250))
    // table a merges (chunk 1 then 2) = 600 rows -> [250, 250, 100];
    // table b -> [100]
    assert(partRows(out) == Map(0 -> 250L, 1 -> 250L, 2 -> 100L,
      3 -> 100L))
    // partition 1 spans the chunk boundary: rows 250..300 of chunk 1
    // plus rows 0..200 of chunk 2
    val p1 = out.filter(_.partitionId == 1).sortBy(_.chunkId)
    assert(p1.map(s => (s.chunkId, s.start, s.end)) ==
      Seq((1L, 250L, 300L), (2L, 0L, 200L)))
  }

  test("merged runs never cross a table boundary") {
    val groups = Seq(g("a", 1, 100), g("b", 1, 100), g("a", 2, 100))
    val out = plan(groups, 4, Config(TableMinRows, minPartitionRows = 150))
    // a's chunks 1,2 merge (200 rows -> slices 150+50); b stays alone
    assert(partRows(out).values.toSeq.sorted == Seq(50L, 100L, 150L))
    assert(out.filter(_.tb == "b").map(s => s.end - s.start) == Seq(100L))
    // no slice mixes tables
    out.groupBy(_.partitionId).foreach { case (_, ss) =>
      assert(ss.map(_.tb).distinct.size == 1)
    }
  }

  test("table_even: small merged groups stay whole, large ones split " +
      "near-even aligned to min rows") {
    val groups = Seq(g("big", 1, 1000), g("small", 1, 150))
    val out = plan(groups, 4, Config(TableEven, minPartitionRows = 100))
    // big: 1000 >= 4*100 -> 4 near-even slices of 250 + small whole
    val bigParts = out.filter(_.tb == "big")
    assert(bigParts.map(s => s.end - s.start).sum == 1000L)
    assert(bigParts.size == 4)
    // sequential aligned lengths: ideal 250 -> 200 (tie picks lower);
    // then ceil(800/3)=267 -> 300; ceil(500/2)=250 -> 200; tail 300
    assert(bigParts.sortBy(_.start).map(s => s.end - s.start) ==
      Seq(200L, 300L, 200L, 300L))
    // larger groups are processed first -> big gets partitions 0..3
    assert(bigParts.map(_.partitionId).toSet == Set(0, 1, 2, 3))
    assert(out.filter(_.tb == "small").map(_.partitionId) == Seq(4))
  }

  test("alignedLen matches the reference's corner cases") {
    // remaining 1000 over 4 parts, min 100: ideal 250 -> 200 (<=)
    assert(ChunkRebalancer.alignedLen(1000, 4, 100) == 200L)
    // last part takes the remainder
    assert(ChunkRebalancer.alignedLen(300, 1, 100) == 300L)
    // min <= 1 -> pure ceil
    assert(ChunkRebalancer.alignedLen(10, 3, 1) == 4L)
    // bounds: 5 rows, 4 parts, min 100 -> max_len = 5-3 = 2,
    // lower 0 invalid, upper 100 invalid -> clamp ideal 2 to [1,2]
    assert(ChunkRebalancer.alignedLen(5, 4, 100) == 2L)
  }

  test("assignPartitions round-trips rows and matches the plan counts") {
    val s = spark
    import s.implicits._
    val df = (1L to 900L).map(k =>
      ("db", "t", k / 300L, k)).toDF("schema", "tb", "chunk_id", "pk")
    val out = ChunkRebalancer.assignPartitions(df, 4,
      Config(TableMinRows, minPartitionRows = 250), col("pk"))
    assert(out.count() == 900)
    val per = out.groupBy("partition_id").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    assert(per.values.sum == 900L)
    assert(per.values.max <= 250L)
    // chunk interiors keep contiguous pk ranges per partition
    val ranges = out.groupBy("partition_id", "chunk_id")
      .agg(min("pk").as("lo"), max("pk").as("hi"), count(lit(1)).as("n"))
      .collect()
    ranges.foreach { r =>
      assert(r.getAs[Long]("hi") - r.getAs[Long]("lo") + 1 ==
        r.getAs[Long]("n"))
    }
  }

  test("applySnapshot drains rebalanced partitions as batched inserts, " +
      "largest first, every row exactly once") {
    val s = spark
    import s.implicits._
    import graft.sinks.{Applier, RdbQueryBuilder}
    // one skewed 800-row chunk + two 100-row chunks
    val rows = ((1L to 800L).map(k => ("db", "t", 1L, k)) ++
      (1L to 100L).map(k => ("db", "t", 2L, 1000L + k)) ++
      (1L to 100L).map(k => ("db", "u", 1L, 2000L + k)))
      .toDF("schema", "tb", "chunk_id", "pk")
    ChunkRebalancerSpec.acc.clear()
    Applier.applySnapshot(RdbQueryBuilder.MySql, rows,
      cols = Seq("pk"), orderCol = col("pk"), targetPartitions = 4,
      Config(AutoSplit, minPartitionRows = 100),
      sinkFactory = () => ChunkRebalancerSpec.CollectingSink,
      batchSize = 1000)
    val batches = ChunkRebalancerSpec.acc.toSeq
    // every row applied exactly once
    val applied = batches.flatMap(_.rows.map(_.head.asInstanceOf[Long]))
    assert(applied.sorted == ((1L to 800L) ++ (1001L to 1100L) ++
      (2001L to 2100L)).sorted)
    // all statements are multi-row inserts against the right tables
    assert(batches.forall(_.sql.startsWith("INSERT INTO")))
    assert(batches.map(_.sql).exists(_.contains("`db`.`t`")))
    assert(batches.map(_.sql).exists(_.contains("`db`.`u`")))
    // the skewed chunk split: no single batch carries all 800 rows
    assert(batches.map(_.rows.size).max < 800)
  }

  test("q93 plan slices reconstruct every chunk exactly once") {
    val out = ChunkRebalancer.rebalancePlan(spark, sf)
    val byChunk = out.groupBy("chunk_id")
      .agg(sum("n_rows").as("n")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = Tables.orders(spark, sf)
      .groupBy((col("o_orderkey") / ChunkRebalancer.Q93ChunkKeys)
        .cast("long").as("chunk_id"))
      .count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byChunk == expected)
    // every partition except per-table tails holds exactly MinRows rows
    val per = out.groupBy("partition_id").agg(sum("n_rows").as("n"))
      .collect().map(_.getAs[Long]("n"))
    assert(per.count(_ != ChunkRebalancer.Q93MinRows) <= 1)
  }
}

object ChunkRebalancerSpec {
  val acc = new scala.collection.mutable.ArrayBuffer[
    graft.sinks.Applier.StatementBatch]()
  object CollectingSink extends graft.sinks.Applier.StatementSink
      with Serializable {
    def execute(b: graft.sinks.Applier.StatementBatch): Unit =
      acc.synchronized { acc += b }
  }
}
