package graft

import java.nio.file.{Files, Path}

import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Resume-from-checkpoint: a restarted streaming query must pick up at
  * the recorded offsets and not reprocess (the reference's
  * position.log / resume contract, SURVEY §2.8, carried by the streaming
  * checkpoint).
  */
class StreamingRestartSpec extends SparkSuite {

  private def writeBatch(dir: Path, ids: Range): Unit =
    spark.range(ids.head, ids.last + 1).toDF("id")
      .coalesce(1).write.mode(SaveMode.Append)
      .parquet(dir.toString)

  test("restarted query resumes from checkpoint, no reprocessing") {
    val src = Files.createTempDirectory("stream_src")
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val out = Files.createTempDirectory("stream_out").toString
    writeBatch(src, 0 until 100)

    def run(): Unit = {
      val q = spark.readStream
        .schema("id LONG")
        .parquet(src.toString)
        .writeStream
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .format("parquet")
        .option("path", out)
        .start()
      try q.processAllAvailable() finally q.stop()
    }

    run() // first run consumes file 1
    assert(spark.read.parquet(out).count() == 100)

    writeBatch(src, 100 until 150)
    run() // restart: only the new file flows
    val ids = spark.read.parquet(out)
    assert(ids.count() == 150) // no duplicates from reprocessing
    assert(ids.select(countDistinct(col("id"))).head().getLong(0) == 150)
  }
}
