package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.streaming.StreamingExactDedup

class StreamingExactDedupSpec extends SparkSuite {

  private def ts(minute: Int): Timestamp =
    Timestamp.valueOf(f"2024-01-01 10:$minute%02d:00")

  test("first occurrence passes, in-horizon copies drop, " +
      "normalization folds whitespace/case") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val input = MemoryStream[(Long, String, Timestamp)]
    val q = StreamingExactDedup.dedup(
      input.toDF().toDF("doc_id", "text", "ts"), "10 minutes")
      .writeStream.outputMode("append")
      .format("memory").queryName("exact_dedup_out").start()
    try {
      input.addData(
        (1L, "the quick brown fox", ts(0)),
        (2L, "something else", ts(0)))
      q.processAllAvailable()
      input.addData(
        (3L, "the quick brown fox", ts(1)),   // exact copy: drop
        (4L, "THE  Quick   BROWN fox", ts(1)), // normalized copy: drop
        (5L, "a third text", ts(2)))
      q.processAllAvailable()
      val kept = spark.table("exact_dedup_out")
        .select("doc_id").as[Long].collect().toSet
      assert(kept == Set(1L, 2L, 5L))
      // the emitted frame carries the batch-identical fingerprint
      val fps = spark.table("exact_dedup_out")
        .select("fp").as[Long].collect().toSet
      val batchFps = Seq("the quick brown fox", "something else",
        "a third text").toDF("text")
        .select(graft.operators.TextOps.charFold(
          graft.operators.TextOps.normText(
            org.apache.spark.sql.functions.col("text"))))
        .as[Long].collect().toSet
      assert(fps == batchFps)
    } finally q.stop()
  }
}
