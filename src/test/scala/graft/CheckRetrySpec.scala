package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.streaming.CheckRetry
import graft.streaming.CheckRetry.{CheckObservation, CheckOutcome}

class CheckRetrySpec extends SparkSuite {

  test("retry counter persists across micro-batches; lag resolves to OK") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext
    val input = MemoryStream[CheckObservation]
    val q = CheckRetry(input.toDS(), maxRetries = 3)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("retry_out").start()
    try {
      // batch 1: row 1 lags (inconsistent), row 2 is fine
      input.addData(CheckObservation(1, consistent = false),
        CheckObservation(2, consistent = true))
      q.processAllAvailable()
      // batch 2: row 1 still lags
      input.addData(CheckObservation(1, consistent = false))
      q.processAllAvailable()
      // batch 3: row 1 catches up (replication lag resolved)
      input.addData(CheckObservation(1, consistent = true))
      q.processAllAvailable()
      val out = spark.table("retry_out").as[CheckOutcome].collect()
      val row1 = out.filter(_.rowId == 1).map(o => (o.status, o.retries))
      assert(row1.toSeq == Seq(("RETRY", 1), ("RETRY", 2), ("OK", 2)))
      assert(out.filter(_.rowId == 2).map(_.status).toSeq == Seq("OK"))
    } finally q.stop()
  }

  test("persistently inconsistent row reports DIFF after max retries") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext
    val input = MemoryStream[CheckObservation]
    val q = CheckRetry(input.toDS(), maxRetries = 2)
      .writeStream.outputMode(OutputMode.Append)
      .format("memory").queryName("retry_diff").start()
    try {
      input.addData(CheckObservation(7, consistent = false))
      q.processAllAvailable()
      input.addData(CheckObservation(7, consistent = false))
      q.processAllAvailable()
      // state cleared after final DIFF: a new observation starts over
      input.addData(CheckObservation(7, consistent = false))
      q.processAllAvailable()
      val out = spark.table("retry_diff").as[CheckOutcome]
        .collect().map(o => (o.status, o.retries)).toSeq
      assert(out == Seq(("RETRY", 1), ("DIFF", 2), ("RETRY", 1)))
    } finally q.stop()
  }
}
