package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.operators.{Cdc, Compaction}
import graft.sinks.{KafkaEnvelope, LakeSink, RedisCommands}

class SinksSpec extends SparkSuite {
  import spark.implicits._

  test("kafka envelope round-trips the change shape") {
    val changes = Cdc.changes(spark, sf).limit(50)
    val wrapped = KafkaEnvelope.wrap(changes, "app", "events", "t",
      col("event_id"), col("row_type"), Nil,
      Seq("event_id", "user_id", "value"))
    assert(wrapped.columns.toSeq == Seq("key", "value", "topic"))
    val back = KafkaEnvelope.unwrap(wrapped)
    val pairs = back.select(col("key").cast("long"),
      element_at(col("after"), "user_id").cast("long"))
      .as[(Long, Long)].collect().toMap
    val want = changes.select(col("event_id"), col("user_id"))
      .as[(Long, Long)].collect().toMap
    assert(pairs == want)
  }

  test("lake sink: stage ORC then merge to final state") {
    val dir = Files.createTempDirectory("lake").toString
    val changes = Cdc.changes(spark, sf)
      .select(col("user_id"), col("event_id"), col("ts"),
        col("value"), col("row_type"))
    LakeSink.stageOrc(changes, dir, partitionCols = Seq("row_type"))
    val merged = LakeSink.mergeStaged(spark, dir, Seq("user_id"),
      Seq("ts", "event_id"))
    // one final-state row per user key
    val keyed = merged.filter(col(Compaction.ActionCol) =!= "serial")
    assert(keyed.select("user_id").distinct().count() == keyed.count())
    assert(keyed.count() == 15) // sf0.001 has 15 users
  }

  test("redis rewriter: chunking, expiry, idempotent replace") {
    import RedisCommands._
    val big = Entry("k", RList((1 to 1200).map(_.toString)),
      expireMs = Some(5000))
    val cmds = rewrite(big, chunkSize = 512)
    assert(cmds.count(_.head == "RPUSH") == 3) // 512+512+176
    assert(cmds.last == Seq("PEXPIRE", "k", "5000"))
    assert(cmds.filter(_.head == "RPUSH").map(_.size).sum == 3 * 2 + 1200)
    val hash = Entry("h", RHash(Seq("f1" -> "a", "f2" -> "b")))
    assert(rewrite(hash) == Seq(Seq("HSET", "h", "f1", "a", "f2", "b")))
    assert(replace(hash).head == Seq("DEL", "h"))
    val z = Entry("z", RZSet(Seq(1.0 -> "m1", 2.5 -> "m2")))
    assert(rewrite(z) == Seq(Seq("ZADD", "z", "1", "m1", "2.5", "m2")))
  }
}
