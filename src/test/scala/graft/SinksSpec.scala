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

  test("lake meta protocol: restart merges exactly the unmerged batches") {
    val root = Files.createTempDirectory("lake-meta").toString
    def batch(ids: Range, rt: String) =
      ids.map(i => (i.toLong, i * 10L, rt)).toDF("k", "v", "row_type")

    // pusher: stage 3 sequenced batches with meta files
    val m0 = LakeSink.stageWithMeta(batch(0 until 4, "insert"), root,
      "app", "t", sequencerId = 1L, pushSequence = 0L,
      lastPosition = "binlog.000001:400")
    val m1 = LakeSink.stageWithMeta(batch(2 until 4, "update"), root,
      "app", "t", sequencerId = 1L, pushSequence = 1L)
    val m2 = LakeSink.stageWithMeta(batch(0 until 1, "delete"), root,
      "app", "t", sequencerId = 1L, pushSequence = 2L)
    assert(m0.rowCount == 4 && m0.lastPosition == "binlog.000001:400")
    assert(m0.metaFileName.startsWith("0000000001_0000000000_log_dml"))

    // meta round-trips through its JSON form
    assert(LakeSink.StageMeta.fromJson(m1.toJson) == m1)

    // merger, first run: consumes metas, merges only the FIRST TWO
    // (simulating a crash before batch 3), records its position
    val run1 = LakeSink.unmergedBatches(spark, root, "app", "t", None)
    assert(run1.metas.map(_.pushSequence) == Seq(0L, 1L, 2L))
    val mergedNow = run1.metas.take(2)
    val state1 = LakeSink.mergeBatches(spark, root, "app", "t",
      mergedNow, keys = Seq("k"), orderCols = Seq("v"))
    assert(state1.count() == 4) // 4 live keys after insert+update
    val position = mergedNow.last.metaFileName

    // restart: exactly ONE batch (the delete) is left
    val run2 = LakeSink.unmergedBatches(spark, root, "app", "t",
      Some(position))
    assert(run2.metas.map(_.pushSequence) == Seq(2L))
    assert(!run2.finished)
    val state2 = LakeSink.mergeBatches(spark, root, "app", "t",
      run2.metas, keys = Seq("k"), orderCols = Seq("v"))
    assert(state2.filter(col("row_type") === "delete").count() == 1)

    // finished marker surfaces, and nothing re-merges
    LakeSink.writeFinished(spark, root, "app", "t")
    val run3 = LakeSink.unmergedBatches(spark, root, "app", "t",
      Some(run2.newPosition.get))
    assert(run3.finished && run3.metas.isEmpty)
  }

  test("lake meta protocol: sequence gaps cut the consumable prefix") {
    // continuity over names alone (no filesystem needed)
    def name(id: Long, seq: Long) = f"$id%010d_$seq%010d_log_dml_x.orc"
    assert(LakeSink.findContinuousFiles(
      Seq(name(1, 0), name(1, 1), name(1, 3)), None) ==
      Seq(name(1, 0), name(1, 1))) // 2 is missing: stop before 3
    // pusher restart: new sequencer id must begin at sequence 0
    assert(LakeSink.findContinuousFiles(
      Seq(name(1, 0), name(2, 0), name(2, 1)), None) ==
      Seq(name(1, 0), name(2, 0), name(2, 1)))
    assert(LakeSink.findContinuousFiles(
      Seq(name(1, 0), name(2, 5)), None) == Seq(name(1, 0)))
    // id going backwards is corruption: nothing is safe to consume
    assert(LakeSink.findContinuousFiles(
      Seq(name(2, 0), name(1, 0)), None).isEmpty)
    // resume cursor: only names after it, continuing its sequence
    assert(LakeSink.findContinuousFiles(
      Seq(name(1, 2), name(1, 3)), Some(name(1, 1))) ==
      Seq(name(1, 2), name(1, 3)))
    assert(LakeSink.findContinuousFiles(
      Seq(name(1, 3)), Some(name(1, 1))).isEmpty)
  }

  test("lake source: staged batches read back in push order with " +
      "positions; resume and finished honored") {
    import graft.sources.LakeSource
    val root = Files.createTempDirectory("lake-src").toString
    def batch(ids: Range, rt: String) =
      ids.map(i => (i.toLong, i * 10L, rt)).toDF("k", "v", "row_type")

    val m0 = LakeSink.stageWithMeta(batch(0 until 4, "insert"), root,
      "app", "t", sequencerId = 1L, pushSequence = 0L)
    val m1 = LakeSink.stageWithMeta(batch(2 until 4, "update"), root,
      "app", "t", sequencerId = 1L, pushSequence = 1L)

    // first poll: both batches, rows stamped with their meta position
    val (df1, pos1, fin1) = LakeSource.pollAndRead(
      spark, root, "app", "t", None)
    assert(!fin1 && pos1.contains(m1.metaFileName))
    assert(df1.count() == 6)
    assert(df1.filter(col("position") === m0.metaFileName).count() == 4)
    assert(df1.filter(col("position") === m1.metaFileName)
      .select(col("push_sequence")).distinct().head().getLong(0) == 1L)

    // resume from m0: only m1's rows arrive
    val (df2, _, _) = LakeSource.pollAndRead(
      spark, root, "app", "t", Some(m0.metaFileName))
    assert(df2.count() == 2)

    // a gap hides the out-of-order batch until it closes
    LakeSink.stageWithMeta(batch(5 until 6, "insert"), root,
      "app", "t", sequencerId = 1L, pushSequence = 3L) // 2 missing
    val (df3, pos3, _) = LakeSource.pollAndRead(
      spark, root, "app", "t", pos1)
    assert(df3.count() == 0 && pos3 == pos1)

    // empty poll: resume cursor must NOT advance
    val (_, posEmpty, finEmpty) = LakeSource.pollAndRead(
      spark, root, "app", "t", pos1)
    assert(posEmpty == pos1 && !finEmpty)

    // gap closes: both pending batches arrive in one poll
    val m2 = LakeSink.stageWithMeta(batch(4 until 5, "insert"), root,
      "app", "t", sequencerId = 1L, pushSequence = 2L)
    val (df4, pos4, _) = LakeSource.pollAndRead(
      spark, root, "app", "t", pos1)
    assert(df4.count() == 2)
    assert(pos4.exists(_ > m2.metaFileName))

    // finished marker
    LakeSink.writeFinished(spark, root, "app", "t")
    val (_, _, fin5) = LakeSource.pollAndRead(
      spark, root, "app", "t", pos4)
    assert(fin5)
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
