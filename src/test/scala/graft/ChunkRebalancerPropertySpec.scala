package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.ChunkRebalancer
import graft.operators.ChunkRebalancer._

/** Plan invariants the reference's partitioner guarantees for EVERY
  * strategy/cost/config (chunk_partitioner.rs): no row lost or
  * duplicated, slices stay inside their chunk, split sides hold
  * `minPartitionRows`, mixed-DML chunks never split, and partition ids
  * are dense from 0. Sampled over randomized group sets under fixed
  * seeds (the scalatest-scalacheck bridge isn't in the offline cache).
  */
class ChunkRebalancerPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val groupGen: Gen[Seq[ChunkGroup]] = for {
    n <- Gen.choose(1, 12)
    groups <- Gen.listOfN(n, for {
      tb <- Gen.oneOf("t1", "t2", "t3")
      rows <- Gen.choose(1L, 2000L)
      bytes <- Gen.choose(0L, 500000L)
      ins <- Gen.prob(0.8)
    } yield (tb, rows, bytes, ins))
  } yield groups.zipWithIndex.map { case ((tb, rows, bytes, ins), i) =>
    // distinct chunk ids per table (keys must be unique)
    ChunkGroup("db", tb, i.toLong, rows, bytes, ins)
  }

  private val cfgGen: Gen[(Config, Int)] = for {
    strategy <- Gen.oneOf(NoRebalance, ChunkLargestFirst, AutoSplit,
      TableMinRows, TableEven)
    cost <- Gen.oneOf(RowsCost, BytesCost)
    minRows <- Gen.choose(1, 500)
    perSinker <- Gen.choose(1, 4)
    ratio <- Gen.oneOf(0.5, 1.0, 1.5, 3.0)
    target <- Gen.choose(1, 8)
  } yield (Config(strategy, cost, perSinker, minRows, ratio), target)

  test("every strategy partitions every row exactly once, in-chunk") {
    for (seed <- 1L to 120L) {
      val groups = sample(groupGen, seed)
      val (cfg, target) = sample(cfgGen, seed + 7777)
      val slices = plan(groups, target, cfg)
      val byChunk = slices.groupBy(s => (s.schema, s.tb, s.chunkId))
      groups.foreach { gr =>
        val ss = byChunk.getOrElse((gr.schema, gr.tb, gr.chunkId), Seq())
          .sortBy(_.start)
        // slices tile [0, rows) exactly: no gap, no overlap, no spill
        assert(ss.nonEmpty, s"chunk ${gr.chunkId} lost (seed $seed $cfg)")
        assert(ss.head.start == 0 && ss.last.end == gr.rows,
          s"chunk ${gr.chunkId} not covered (seed $seed $cfg): $ss")
        ss.sliding(2).foreach {
          case Seq(a, b) => assert(a.end == b.start,
            s"gap/overlap in chunk ${gr.chunkId} (seed $seed $cfg): $ss")
          case _ =>
        }
      }
      // dense partition ids from 0
      val pids = slices.map(_.partitionId).distinct.sorted
      assert(pids == (0 until pids.size), s"sparse ids (seed $seed): $pids")
    }
  }

  test("auto_split: split sides respect min rows; mixed chunks intact") {
    for (seed <- 1L to 120L) {
      val groups = sample(groupGen, seed * 31)
      val (cfg0, target) = sample(cfgGen, seed * 31 + 13)
      val cfg = cfg0.copy(strategy = AutoSplit)
      val slices = plan(groups, target, cfg)
      val byChunk = slices.groupBy(s => (s.schema, s.tb, s.chunkId))
      groups.foreach { gr =>
        val ss = byChunk((gr.schema, gr.tb, gr.chunkId))
        if (!gr.insertOnly)
          assert(ss.size == 1,
            s"mixed-DML chunk split (seed $seed $cfg): $ss")
        if (ss.size > 1 && target > 1)
          ss.foreach(s => assert(s.end - s.start >= cfg.minPartitionRows,
            s"slice under min (seed $seed $cfg): $ss"))
      }
    }
  }

  test("table strategies: per-partition row totals never exceed the " +
      "strategy bound") {
    for (seed <- 1L to 120L) {
      val groups = sample(groupGen, seed * 97)
      val (cfg0, target) = sample(cfgGen, seed * 97 + 5)
      if (target > 1) {
        val cfg = cfg0.copy(strategy = TableMinRows)
        val slices = plan(groups, target, cfg)
        slices.groupBy(_.partitionId).values.foreach { ss =>
          val rows = ss.map(s => s.end - s.start).sum
          assert(rows <= cfg.minPartitionRows,
            s"table_min_rows slice over target (seed $seed $cfg): $ss")
        }
      }
    }
  }
}
