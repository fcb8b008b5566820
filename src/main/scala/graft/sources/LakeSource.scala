package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.sinks.LakeSink

/** Foxlake/S3 lake EXTRACTOR — the read-back side of [[LakeSink]]'s
  * meta-file protocol (`/root/reference/dt-connector/src/extractor/
  * foxlake/foxlake_s3_extractor.rs`): list the staged meta files after
  * the resume cursor, consume only the longest CONTINUOUS prefix
  * (sequences step by one within a sequencer id; an in-flight pusher
  * write that lands out of order is invisible until the gap closes),
  * read exactly the data files those metas name — never a directory
  * glob — and stop at the `finished` marker. The resume position is
  * the last consumed meta file NAME, identical to the merger's cursor,
  * so sink-side and source-side restarts share one contract.
  *
  * Scale shape: the poll is a driver-side listing of one table's meta
  * dir (bounded by staging cadence); the row read is a normal
  * distributed ORC scan over an explicit file list, one task per file
  * split; the per-row position stamp joins through a broadcast
  * (file → meta) map bounded by the poll's batch count.
  */
object LakeSource {

  /** One extractor poll — the `run_table_worker` loop body. Reuses the
    * sink-side protocol reader verbatim: continuous-prefix discovery,
    * meta JSON parse, finished marker, new resume name.
    */
  def poll(spark: SparkSession, root: String, schema: String,
      tb: String, startAfter: Option[String]): LakeSink.UnmergedBatch =
    LakeSink.unmergedBatches(spark, root, schema, tb, startAfter)

  /** Rows of the polled batches, each stamped with the meta-file name
    * it arrived under (`position` — the FoxlakeS3 position the
    * reference pushes per batch) and the batch's push order.
    */
  def read(spark: SparkSession, root: String, schema: String,
      tb: String, metas: Seq[LakeSink.StageMeta]): DataFrame = {
    if (metas.isEmpty) {
      return spark.emptyDataFrame
    }
    val paths = metas.map(m => s"$root/$schema/$tb/${m.dataFileName}")
    val lookup = spark.createDataFrame(
      metas.map(m => (m.dataFileName, m.metaFileName, m.pushSequence)))
      .toDF("data_file", "position", "push_sequence")
    spark.read.orc(paths: _*)
      .withColumn("data_file",
        element_at(split(input_file_name(), "/"), -1))
      .join(broadcast(lookup), "data_file")
      .drop("data_file")
  }

  /** Poll + read in one step; returns the frame, the advanced resume
    * cursor, and the finished flag. A production task loops this until
    * finished (sleeping between empty polls, `WAIT_FILE_SECS` in the
    * reference); tests drive single steps.
    */
  def pollAndRead(spark: SparkSession, root: String, schema: String,
      tb: String, startAfter: Option[String])
      : (DataFrame, Option[String], Boolean) = {
    val batch = poll(spark, root, schema, tb, startAfter)
    val df = read(spark, root, schema, tb, batch.metas)
    (df, batch.newPosition.orElse(startAfter), batch.finished)
  }
}
