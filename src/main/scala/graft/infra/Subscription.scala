package graft.infra

import java.nio.file.{Files, Paths, StandardOpenOption}
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Data-subscription pipeline: instead of sinking, drained micro-batches
  * are staged durably and served to a pulling consumer with ack-offset
  * bookkeeping — the reference's HTTP subscription server semantics
  * (`dt-pipeline/src/http_server_pipeline.rs:117-284`: `/info`,
  * `/fetch_new`, `/fetch_old`, `/ack`) re-expressed storage-first.
  *
  * Spark-native shape: the producer is a `foreachBatch` writing each
  * micro-batch as parquet under `spool/batch=<n>/`; consumers read any
  * batch range directly with `spark.read.parquet` (scales to any number
  * of consumers — the spool is just files, no server process in the data
  * path). `ack` persists the consumer's high-water mark; `fetchNew` is
  * "batches after my ack", `fetchOld` re-reads already-acked batches
  * (replay). At 100 TB the spool is an object-store prefix and acks live
  * in any small KV/JDBC table; file layout and offset semantics are
  * identical.
  */
final class Subscription(spoolDir: String) {
  private val root = Paths.get(spoolDir)
  private val ackFile = root.resolve("ack.offset")
  Files.createDirectories(root)

  /** Producer side: stage a micro-batch under the next offset. Returns
    * the offset written. Parquet + rename-free single-writer layout; the
    * batch is visible to consumers only once `_SUCCESS` exists (Spark
    * writes it last), so a crashed write is never fetched.
    */
  def stage(batch: DataFrame, offset: Long): Long = {
    batch.write.mode("overwrite")
      .parquet(root.resolve(s"batch=$offset").toString)
    offset
  }

  /** All staged offsets, ascending. Only directories containing the
    * `_SUCCESS` marker count: a producer crash mid-write leaves a
    * partial `batch=N` dir, and listing it would hand consumers partial
    * data — the visibility gate `stage` documents is enforced here, not
    * merely assumed. The listing stream is closed eagerly.
    */
  def offsets(): Seq[Long] =
    scala.util.Using.resource(Files.list(root)) { s =>
      s.iterator().asScala
        .map(_.getFileName.toString)
        .filter(_.startsWith("batch="))
        .filter(d => Files.exists(root.resolve(d).resolve("_SUCCESS")))
        .map(_.stripPrefix("batch=").toLong)
        .toSeq.sorted
    }

  /** Consumer bookkeeping: last acked offset (-1 = nothing acked). */
  def acked(): Long =
    if (Files.exists(ackFile)) Files.readString(ackFile).trim.toLong
    else -1L

  /** Acknowledge consumption through `offset` (monotonic: acking
    * backwards is a no-op, matching the reference's ack handling).
    */
  def ack(offset: Long): Long = {
    val next = math.max(acked(), offset)
    Files.writeString(ackFile, next.toString,
      StandardOpenOption.CREATE, StandardOpenOption.TRUNCATE_EXISTING)
    next
  }

  /** `/info`: staged range + consumer position. */
  def info(): (Long, Long, Long) = {
    val off = offsets()
    (off.headOption.getOrElse(-1L), off.lastOption.getOrElse(-1L), acked())
  }

  private def read(spark: SparkSession, range: Seq[Long]): DataFrame = {
    require(range.nonEmpty, "no batches in range")
    spark.read.parquet(
      range.map(o => root.resolve(s"batch=$o").toString): _*)
  }

  /** `/fetch_new`: all batches past the ack mark (up to `max`). */
  def fetchNew(spark: SparkSession, max: Int = Int.MaxValue): Option[DataFrame] = {
    val range = offsets().filter(_ > acked()).take(max)
    if (range.isEmpty) None else Some(read(spark, range))
  }

  /** Read exactly one staged batch (None when that offset is absent) —
    * the per-batch replay unit [[SubscriptionServer]] serves.
    */
  def fetchOldExact(spark: SparkSession, offset: Long): Option[DataFrame] =
    if (offsets().contains(offset)) Some(read(spark, Seq(offset)))
    else None

  /** `/fetch_old`: replay already-acked batches. */
  def fetchOld(spark: SparkSession, from: Long = 0L): Option[DataFrame] = {
    val range = offsets().filter(o => o >= from && o <= acked())
    if (range.isEmpty) None else Some(read(spark, range))
  }

  /** Retention: drop staged batches at or below the ack mark (the
    * reference keeps acked data until expiry; here expiry = explicit
    * compaction call).
    */
  def expireAcked(): Seq[Long] = {
    val expired = offsets().filter(_ <= acked())
    expired.foreach { o =>
      val dir = root.resolve(s"batch=$o")
      scala.util.Using.resource(Files.walk(dir)) { s =>
        s.sorted(java.util.Comparator.reverseOrder())
          .iterator().asScala.foreach(Files.delete)
      }
    }
    expired
  }
}
