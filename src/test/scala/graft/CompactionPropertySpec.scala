package graft

import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

import graft.operators.Compaction

/** The property the reference's merge semantics promise (SURVEY §5 test
  * plan): applying a COMPACTED batch to prior state yields the same state
  * as REPLAYING every event in order. Holds for any event sequence with
  * non-null keys. (Raw ScalaCheck generators sampled under fixed seeds —
  * the scalatest bridge isn't in the offline cache.)
  */
class CompactionPropertySpec extends SparkSuite {
  import spark.implicits._

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val eventGen = for {
    key <- Gen.choose(0L, 6L)
    rt <- Gen.oneOf("insert", "update", "delete")
    v <- Gen.alphaStr.map(_.take(4))
  } yield (key, rt, v)

  private val seqGen = Gen.listOfN(40, eventGen)

  private def replay(events: Seq[(Long, String, String)])
      : Map[Long, String] =
    events.foldLeft(Map.empty[Long, String]) {
      case (state, (k, "delete", _)) => state - k
      case (state, (k, _, v)) => state + (k -> v)
    }

  private def applyCompacted(events: Seq[(Long, String, String)])
      : Map[Long, String] = {
    val df = events.zipWithIndex
      .map { case ((k, rt, v), i) => (k, i.toLong, rt, v) }
      .toDF("k", "seq", "row_type", "v")
    val out = Compaction.compact(df, Seq("k"), Seq("seq"),
      col("row_type"))
      .select("k", "v", Compaction.ActionCol)
      .as[(Long, String, String)].collect()
    out.foldLeft(Map.empty[Long, String]) {
      case (state, (k, _, Compaction.Delete)) => state - k
      case (state, (k, v, Compaction.Upsert)) => state + (k -> v)
      case (state, _) => state
    }
  }

  test("compaction-then-apply equals ordered replay (40 random runs)") {
    (1 to 40).foreach { i =>
      val events = sample(seqGen, i.toLong)
      // a compacted delete only clears state that existed; replay of a
      // delete with no prior insert is also a no-op — states must agree
      assert(applyCompacted(events) == replay(events),
        s"seed $i diverged")
    }
  }

  test("aggregate compaction matches the row_number window reference " +
      "(null keys and null order fields included)") {
    // compact() moved from a row_number().over(desc) window to a
    // max_by(struct, struct) aggregate for map-side partial
    // reduction; this pins the winner-for-winner equivalence,
    // including the null corners: desc is NULLS LAST, struct-max
    // ranks a null order field below any value — both prefer the
    // non-null row.
    import org.apache.spark.sql.expressions.Window
    // seq comes from zipWithIndex below, NOT a generator: compact's
    // contract requires orderCols to form a TOTAL order per key
    // (max_by and row_number pick different arbitrary winners on an
    // exact tie), so exact ties on the full (ts, seq) tuple are out
    // of contract — callers like LiveCdc uphold it with a
    // per-partition-unique seq.
    val rowsGen = Gen.listOfN(60, for {
      key <- Gen.option(Gen.choose(0L, 5L))
      ts <- Gen.option(Gen.choose(0L, 3L))
      rt <- Gen.oneOf("insert", "update", "delete")
      v <- Gen.alphaStr.map(_.take(3))
    } yield (key, ts, rt, v))
    (1 to 25).foreach { i =>
      val rows = sample(rowsGen, 1000L + i)
        .zipWithIndex // make (ts, seq) a total order per key
        .map { case ((k, ts, rt, v), ix) => (k, ts, ix.toLong, rt, v) }
      val df = rows.toDF("k", "ts", "seq", "row_type", "v")
      val got = Compaction.compact(df, Seq("k"), Seq("ts", "seq"),
        col("row_type"))
        .as[(Option[Long], Option[Long], Long, String, String, String)]
        .collect().toSet
      val nullKey = col("k").isNull
      val w = Window.partitionBy(col("k"))
        .orderBy(col("ts").desc, col("seq").desc)
      val want = df.filter(!nullKey)
        .withColumn("_rn", org.apache.spark.sql.functions
          .row_number().over(w))
        .filter(col("_rn") === 1).drop("_rn")
        .withColumn(Compaction.ActionCol,
          when(col("row_type") === "delete", Compaction.Delete)
            .otherwise(Compaction.Upsert))
        .unionByName(df.filter(nullKey)
          .withColumn(Compaction.ActionCol, lit(Compaction.Serial)))
        .as[(Option[Long], Option[Long], Long, String, String, String)]
        .collect().toSet
      assert(got == want, s"seed ${1000 + i} diverged")
    }
  }

  test("compaction is idempotent: compacted state is a replay fixpoint") {
    (100 to 110).foreach { i =>
      val events = sample(seqGen, i.toLong)
      val once = applyCompacted(events)
      // the compacted upserts replayed as inserts give the same state
      val asEvents = once.toSeq.map { case (k, v) => (k, "insert", v) }
      assert(replay(asEvents) == once, s"seed $i diverged")
    }
  }
}
