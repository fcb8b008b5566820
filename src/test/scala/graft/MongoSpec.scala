package graft

import org.apache.spark.sql.functions._

import graft.operators.MongoOps
import graft.sinks.MongoSink

/** Mongo family: `$v:2` oplog diff flattening (semantics mirrored from
  * mongo_cdc_extractor.rs:95-166), change-stream update docs, the `_id`
  * merger lane split (mongo_merger.rs:44-96), `$set`/`$unset` map
  * application, and bulk-sinker statement shapes.
  */
class MongoSpec extends SparkSuite {
  import spark.implicits._

  test("$v:2 oplog diff flattens i/u/d and recurses s-prefixed sub-docs") {
    val diff = Map(
      "i" -> Map("a" -> 1),
      "u" -> Map("b" -> 2),
      "d" -> Map("c" -> true),
      "a" -> true, // array marker at this level: skipped
      "sarr" -> Map(
        "a" -> true,
        "u" -> Map("0" -> "x"),
        "sinner" -> Map("d" -> Map("gone" -> true))))
    val (set, unset) = MongoOps.flattenOplogDiff(diff)
    assert(set == Map("a" -> 1, "b" -> 2, "arr.0" -> "x"))
    assert(unset == Seq("c", "arr.inner.gone"))
  }

  test("oplog update doc: diff key wins, else literal $set/$unset pass") {
    val viaDiff = MongoOps.oplogUpdateDoc(
      Map("diff" -> Map("u" -> Map("x" -> 9))))
    assert(viaDiff == (Map("x" -> 9), Seq()))
    val literal = MongoOps.oplogUpdateDoc(Map(
      "$set" -> Map("y" -> 1), "$unset" -> Map("z" -> "")))
    assert(literal == (Map("y" -> 1), Seq("z")))
  }

  test("change-stream update doc: updated/removed/truncated fields") {
    val full = Map("a" -> Map("b" -> Seq(1, 2)), "top" -> 7)
    val (set, unset) = MongoOps.changeStreamUpdateDoc(
      updatedFields = Map("top" -> 8),
      removedFields = Seq("dead"),
      truncatedArrays = Seq("a.b"),
      fullDocument = Some(full))
    assert(set == Map("top" -> 8, "a.b" -> Seq(1, 2)))
    assert(unset == Seq("dead"))
  }

  test("merger: updates and null ids demote the rest to serial") {
    val changes = Seq(
      // tb m1: pure insert/delete traffic — fully merged
      ("m1", Some("a"), "insert", 1L), // superseded by delete @3
      ("m1", Some("b"), "insert", 2L),
      ("m1", Some("a"), "delete", 3L),
      ("m1", Some("a"), "insert", 4L), // delete+reinsert: BOTH lanes
      ("m1", Some("c"), "delete", 5L),
      // tb m2: an update at seq 12 cuts the batch
      ("m2", Some("x"), "insert", 10L),
      ("m2", Some("y"), "delete", 11L),
      ("m2", Some("x"), "update", 12L),
      ("m2", Some("z"), "insert", 13L), // after cutoff → serial
      // tb m3: a NULL id cuts immediately
      ("m3", None: Option[String], "insert", 20L),
      ("m3", Some("q"), "insert", 21L))
      .toDF("tb", "id", "row_type", "seq")
    val lanes = MongoOps.mergeLanes(changes)
      .as[(String, Option[String], String, Long)].collect().toSet
    assert(lanes == Set(
      ("m1", Some("a"), "delete", 3L),
      ("m1", Some("a"), "insert", 4L),
      ("m1", Some("b"), "insert", 2L),
      ("m1", Some("c"), "delete", 5L),
      ("m2", Some("x"), "insert", 10L),
      ("m2", Some("y"), "delete", 11L),
      ("m2", Some("x"), "serial", 12L),
      ("m2", Some("z"), "serial", 13L),
      ("m3", None, "serial", 20L),
      ("m3", Some("q"), "serial", 21L)))
  }

  test("applyUpdate: unset removes, set overrides and adds") {
    val df = Seq(1).toDF("i").select(
      MongoOps.applyUpdate(
        map(lit("keep"), lit("1"), lit("old"), lit("2"),
          lit("gone"), lit("3")),
        map(lit("old"), lit("9"), lit("new"), lit("4")),
        array(lit("gone"))).as("m"))
    val m = df.as[Map[String, String]].head()
    assert(m == Map("keep" -> "1", "old" -> "9", "new" -> "4"))
  }

  test("snapshot sample limit: ceil(count·rate/100), bounded, opt-in") {
    assert(MongoOps.sampleLimit(Some(10), 1000L) == Some(100L))
    assert(MongoOps.sampleLimit(Some(1), 50L) == Some(1L)) // ceil + min 1
    assert(MongoOps.sampleLimit(Some(33), 100L) == Some(33L))
    assert(MongoOps.sampleLimit(Some(100), 1000L).isEmpty) // full scan
    assert(MongoOps.sampleLimit(Some(0), 1000L).isEmpty)
    assert(MongoOps.sampleLimit(None, 1000L).isEmpty)
    assert(MongoOps.sampleLimit(Some(10), 0L).isEmpty) // unknown count
  }

  test("sink statement shapes match the bulk-write surface") {
    assert(MongoSink.deleteMany("c1", Seq("a", "b")) ==
      """{"deleteMany":{"coll":"c1","filter":{"_id":{"$in":["a","b"]}}}}""")
    assert(MongoSink.insertMany("c1", Seq(Map("_id" -> "a", "v" -> "1"))) ==
      """{"insertMany":{"coll":"c1","docs":[{"_id":"a","v":"1"}]}}""")
    assert(MongoSink.updateOne("c1", "a", Map("x" -> "1"), Seq("y")) ==
      """{"updateOne":{"coll":"c1","filter":{"_id":"a"},""" +
        """"update":{"$set":{"x":"1"},"$unset":{"y":""}},"upsert":true}}""")
    assert(MongoSink.jstr("a\"b\\c\n") == "\"a\\\"b\\\\c\\u000a\"")
  }

  test("bulk planner: batches per lane, serial rows fence the buffers") {
    import org.apache.spark.sql.catalyst.expressions.GenericRowWithSchema
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("tb", StringType), StructField("id", StringType),
      StructField("lane", StringType), StructField("row_type", StringType),
      StructField("doc", MapType(StringType, StringType))))
    def row(tb: String, id: String, lane: String, rt: String)
        : org.apache.spark.sql.Row =
      new GenericRowWithSchema(
        Array[Any](tb, id, lane, rt, Map("_id" -> id)), schema)
    val rows = Iterator(
      row("c1", "a", "delete", "delete"),
      row("c1", "b", "insert", "insert"),
      row("c1", "c", "insert", "insert"),
      row("c1", "s1", "serial", "update"),
      row("c1", "d", "insert", "insert"))
    val cmds = MongoSink.planBulk(rows, batchSize = 10).toSeq
    // fence: buffered delete+inserts flush (deletes first) BEFORE the
    // serial update; the post-serial insert flushes at drain
    assert(cmds.map(_.split("\"")(1)) ==
      Seq("deleteMany", "insertMany", "updateOne", "insertMany"))
    assert(cmds(1).contains("\"_id\":\"b\"") &&
      cmds(1).contains("\"_id\":\"c\""))
    assert(cmds(3).contains("\"_id\":\"d\""))
  }
}
