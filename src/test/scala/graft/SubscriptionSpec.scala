package graft

import org.apache.spark.sql.functions._
import graft.infra.Subscription

class SubscriptionSpec extends SparkSuite {
  import spark.implicits._

  test("stage / fetch_new / ack / fetch_old round-trip") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sub").toString
    val sub = new Subscription(dir)

    sub.stage(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0L)
    sub.stage(Seq((3L, "c")).toDF("k", "v"), 1L)
    sub.stage(Seq((4L, "d")).toDF("k", "v"), 2L)

    assert(sub.info() == ((0L, 2L, -1L)))

    // fetch_new sees everything, consumer acks through 1
    val fresh = sub.fetchNew(spark).get
    assert(fresh.count() == 4)
    sub.ack(1L)
    assert(sub.acked() == 1L)

    // fetch_new now returns only batch 2
    val tail = sub.fetchNew(spark).get
    assert(tail.select("k").as[Long].collect().toSet == Set(4L))

    // fetch_old replays acked batches
    val old = sub.fetchOld(spark).get
    assert(old.select("k").as[Long].collect().toSet == Set(1L, 2L, 3L))

    // ack is monotonic — acking backwards is a no-op
    sub.ack(0L)
    assert(sub.acked() == 1L)

    // retention drops acked batches, fetch_new unaffected
    assert(sub.expireAcked() == Seq(0L, 1L))
    assert(sub.offsets() == Seq(2L))

    assert(sub.fetchNew(spark).get.count() == 1)

    // a producer crash mid-write leaves a batch dir without _SUCCESS:
    // it must be invisible to offsets/fetch until the write completes
    val partial = java.nio.file.Paths.get(dir, "batch=3")
    java.nio.file.Files.createDirectories(partial)
    java.nio.file.Files.writeString(
      partial.resolve("part-00000.parquet"), "truncated")
    assert(sub.offsets() == Seq(2L))
    sub.ack(2L)
    assert(sub.fetchNew(spark).isEmpty)
    // completing the write (overwrite with a real parquet commit, which
    // lands _SUCCESS last) makes the batch visible
    sub.stage(Seq((5L, "e")).toDF("k", "v"), 3L)
    assert(sub.offsets() == Seq(2L, 3L))
    assert(sub.fetchNew(spark).get.count() == 1)
  }

  test("subscription drains a streaming query through foreachBatch") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-sub-stream").toString
    val sub = new Subscription(dir)
    implicit val sqlCtx = spark.sqlContext
    val mem = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String)]
    mem.addData((1L, "x"), (2L, "y"))
    val q = mem.toDF().toDF("k", "v").writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, id: Long) => {
        sub.stage(batch, id): Unit
      })
      .start()
    mem.addData((3L, "z"))
    q.processAllAvailable()
    q.stop()
    assert(sub.fetchNew(spark).get.count() == 3)
  }
}
