package graft

import org.apache.spark.sql.functions._

import graft.operators.Compaction

class CompactionSpec extends SparkSuite {
  import spark.implicits._

  // (key, seq, rowType, value); null key → unmergeable
  private def changes = Seq(
    (Some(1L), 1L, "insert", "a"),
    (Some(1L), 2L, "update", "b"),
    (Some(2L), 3L, "insert", "c"),
    (Some(2L), 4L, "delete", "c"),
    (Some(3L), 5L, "delete", "d"),
    (Some(3L), 6L, "insert", "e"),
    (None, 7L, "insert", "n1"),
    (None, 8L, "delete", "n2"))
    .toDF("k", "seq", "row_type", "v")

  test("last event per key wins; final delete → delete action") {
    val out = Compaction.compact(changes, Seq("k"), Seq("seq"),
      col("row_type"))
      .collect().map(r => (Option(r.getAs[java.lang.Long]("k")).map(_.toLong),
        r.getAs[String]("v"), r.getAs[String](Compaction.ActionCol)))
      .toSet
    assert(out.contains((Some(1L), "b", "upsert"))) // update folds to upsert
    assert(out.contains((Some(2L), "c", "delete"))) // delete cancels insert
    assert(out.contains((Some(3L), "e", "upsert"))) // insert after delete
    // NULL keys bypass merge, stay serial, both survive
    assert(out.count(_._3 == "serial") == 2)
    assert(out.size == 5)
  }

  test("compaction emits exactly one row per non-null key") {
    val out = Compaction.compact(changes, Seq("k"), Seq("seq"),
      col("row_type"))
    val keyed = out.filter(col(Compaction.ActionCol) =!= "serial")
    assert(keyed.groupBy("k").count().filter(col("count") > 1).count() == 0)
  }

  test("splitUpdates: update → ordered delete+insert pair, others pass") {
    val out = Compaction.splitUpdates(changes, col("row_type"))
      .select("seq", "_seq", "_out_type").as[(Long, Int, String)]
      .collect().toSet
    assert(out.contains((2L, 0, "delete")) && out.contains((2L, 1, "insert")))
    assert(out.contains((1L, 0, "insert")))
    assert(out.count(_._1 == 2L) == 2)
  }

  test("sinkPartition: NULL key → serial lane 0, stable arithmetic hash") {
    val out = changes.withColumn("lane",
      Compaction.sinkPartition(col("k"), 8)).select("k", "lane")
      .collect().map(r => (Option(r.getAs[java.lang.Long]("k")),
        r.getAs[Long]("lane"))).toMap
    assert(out(None) == 0L)
    assert(out.values.forall(l => l >= 0 && l < 8))
    // deterministic: same key same lane
    assert(out(Some(1L)) == ((1L * 2654435761L) % 1000000007L) % 8)
  }
}
