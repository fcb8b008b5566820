package graft

import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming exact dedup — the stream-time variant of q33: duplicate
  * event ids arriving across micro-batches are emitted once, with state
  * bounded by the watermark (the 100 TB ingestion-dedup shape).
  */
class StreamingDedupSpec extends SparkSuite {

  test("dropDuplicatesWithinWatermark dedups across micro-batches") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val input = MemoryStream[(Long, Timestamp)]
    val deduped = input.toDF().toDF("id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("id")
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("dedup_out").start()
    def t(m: Int) = Timestamp.valueOf(f"2024-01-01 10:$m%02d:00")
    try {
      input.addData((1L, t(0)), (2L, t(1)), (1L, t(2))) // in-batch dup
      q.processAllAvailable()
      input.addData((1L, t(3)), (3L, t(4))) // cross-batch dup of 1
      q.processAllAvailable()
      val ids = spark.table("dedup_out").select("id")
        .as[Long].collect().sorted.toSeq
      assert(ids == Seq(1L, 2L, 3L)) // each id exactly once
    } finally q.stop()
  }
}
