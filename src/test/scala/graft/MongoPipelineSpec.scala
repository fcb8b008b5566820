package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.operators.MongoOps
import graft.sinks.MongoSink

/** Mongo CDC end to end on the real transport: change events arrive as
  * changelog segments (the DSv2 micro-batch source), each micro-batch
  * runs the `_id` merger, and the lanes render to bulk-write commands —
  * the full reference pipeline (change stream → mongo_merger →
  * mongo_sinker) as one Structured Streaming flow.
  */
class MongoPipelineSpec extends SparkSuite {

  private def writeSegment(dir: String, name: String,
      rows: Seq[String]): Unit = {
    val tmp = Paths.get(dir, s"$name.tmp")
    Files.writeString(tmp, rows.mkString("\n"))
    Files.move(tmp, Paths.get(dir, s"$name.log"))
  }

  // seq \t schema \t tb \t row_type \t key \t payload(json doc)
  private def rec(seq: Long, tb: String, rt: String, id: String,
      doc: String) = s"$seq\tappdb\t$tb\t$rt\t$id\t$doc"

  test("segments → merger lanes → bulk commands per micro-batch") {
    val dir = Files.createTempDirectory("graft-mongo-cl").toString
    writeSegment(dir, "000001", Seq(
      rec(1, "c1", "insert", "a", """{"_id":"a","v":"1"}"""),
      rec(2, "c1", "insert", "b", """{"_id":"b","v":"2"}"""),
      rec(3, "c1", "delete", "a", ""),
      rec(4, "c1", "update", "b", """{"$set":{"v":"3"}}"""),
      rec(5, "c1", "insert", "c", """{"_id":"c","v":"4"}""")))

    val acc = MongoPipelineSpec.commands
    acc.synchronized(acc.clear())

    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir).load()
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame,
          _: Long) =>
        val changes = batch.select(col("tb"),
          when(col("key") === "", null).otherwise(col("key")).as("id"),
          col("row_type"), col("seq"), col("payload"))
        val lanes = MongoOps.mergeLanes(
          changes.select("tb", "id", "row_type", "seq"))
        // re-attach the latest document image + row_type per (id, lane)
        val docs = changes.select(col("id"), col("seq").as("dseq"),
          col("row_type").as("drt"),
          from_json(col("payload"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.StringType)).as("doc"))
        val rows = lanes.join(docs,
            lanes("id") <=> docs("id") && lanes("seq") === col("dseq"),
            "left")
          .select(lanes("tb"), lanes("id"), col("lane"),
            coalesce(col("drt"), col("lane")).as("row_type"),
            col("doc"))
          // deletes first, inserts second, serial last — the caller
          // contract planBulk documents
          .sortWithinPartitions(col("tb"), col("lane"), lanes("id"))
          .coalesce(1)
        rows.foreachPartition {
          (it: Iterator[org.apache.spark.sql.Row]) =>
            val cmds = MongoSink.planBulk(it, batchSize = 100).toSeq
            // resolve the buffer statically: a closure-captured
            // reference deserializes as a copy on the executor side
            MongoPipelineSpec.commands.synchronized(
              MongoPipelineSpec.commands ++= cmds): Unit
        }
        ()
      }
      .start()
    try q.processAllAvailable() finally q.stop()

    val cmds = acc.synchronized(acc.toList)
    // one deleteMany (a), one insertMany (b? no — see below), then the
    // serial update of b after the cutoff at seq 4: b's insert@2 is in
    // the prefix with last op insert → insert lane; update@4 starts the
    // serial suffix; c's insert@5 is serial too
    assert(cmds.exists(c => c.contains("deleteMany") &&
      c.contains("\"a\"")))
    assert(cmds.exists(c => c.contains("insertMany") &&
      c.contains("\"_id\":\"b\"")))
    assert(cmds.exists(c => c.contains("updateOne") &&
      c.contains("\"_id\":\"b\"")))
    assert(cmds.exists(c => c.contains("replaceOne") &&
      c.contains("\"_id\":\"c\"")))
    // ordering: the delete lane renders before the insert lane
    assert(cmds.indexWhere(_.contains("deleteMany")) <
      cmds.indexWhere(_.contains("insertMany")))
  }
}

object MongoPipelineSpec {
  val commands: scala.collection.mutable.ArrayBuffer[String] =
    scala.collection.mutable.ArrayBuffer.empty
}
