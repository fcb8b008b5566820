package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** File/lakehouse sink — the reference's Foxlake pusher+merger
  * (/root/reference/dt-connector/src/sinker/foxlake/foxlake_pusher.rs:
  * 96-180: buffer rows → ORC files → object store + meta file; a merger
  * task applies them with SQL).
  *
  * Spark-native: `write.orc/parquet` with `partitionBy` replaces the
  * buffering/pushing entirely; the merge step is expressed as the
  * compaction the engine already has (Compaction.compact on the staged
  * batch) followed by an overwrite of affected partitions — or MERGE INTO
  * on a Delta/Iceberg-enabled cluster.
  */
object LakeSink {

  /** Stage a change batch as ORC files partitioned by table address —
    * the pusher side. Returns the staged path.
    */
  def stageOrc(df: DataFrame, root: String, partitionCols: Seq[String])
      : String = {
    val w = df.write.mode(SaveMode.Append)
    (if (partitionCols.nonEmpty) w.partitionBy(partitionCols: _*) else w)
      .orc(root)
    root
  }

  /** Merger side: read staged files, compact per key, return final-state
    * rows (what MERGE INTO would apply).
    */
  def mergeStaged(spark: SparkSession, root: String, keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    import graft.operators.Compaction
    val staged = spark.read.orc(root)
    Compaction.compact(staged, keys, orderCols, col("row_type"))
  }

  // ------------------------------------------------- meta-file protocol

  /** Per-batch meta record — the pusher writes one meta file next to
    * each staged data file and the merger consumes metas, not data
    * listings (reference S3FileMeta, s3_file_meta.rs:10-22; pushed
    * pairwise in foxlake_pusher.rs:213-225). A restart can therefore
    * tell exactly which staged batches were merged: the merge position
    * is the last consumed META file name.
    */
  final case class StageMeta(schema: String, tb: String,
      insertOnly: Boolean, metaFileName: String, dataFileName: String,
      dataSize: Long, rowCount: Long, lastPosition: String,
      sequencerId: Long, pushEpoch: Long, pushSequence: Long) {
    def toJson: String = {
      def s(v: String) = "\"" + v.replace("\\", "\\\\")
        .replace("\"", "\\\"") + "\""
      s"""{"schema":${s(schema)},"tb":${s(tb)},""" +
        s""""insert_only":$insertOnly,""" +
        s""""meta_file_name":${s(metaFileName)},""" +
        s""""data_file_name":${s(dataFileName)},""" +
        s""""data_size":$dataSize,"row_count":$rowCount,""" +
        s""""last_position":${s(lastPosition)},""" +
        s""""sequencer_id":$sequencerId,"push_epoch":$pushEpoch,""" +
        s""""push_sequence":$pushSequence}"""
    }
  }

  object StageMeta {
    private def str(json: String, field: String): String = {
      val m = java.util.regex.Pattern
        .compile(s""""$field":"((?:[^"\\\\]|\\\\.)*)"""").matcher(json)
      require(m.find(), s"meta json missing $field: $json")
      m.group(1).replace("\\\"", "\"").replace("\\\\", "\\")
    }
    private def num(json: String, field: String): Long = {
      val m = java.util.regex.Pattern
        .compile(s""""$field":(-?\\d+)""").matcher(json)
      require(m.find(), s"meta json missing $field: $json")
      m.group(1).toLong
    }
    def fromJson(json: String): StageMeta = StageMeta(
      str(json, "schema"), str(json, "tb"),
      json.contains(""""insert_only":true"""),
      str(json, "meta_file_name"), str(json, "data_file_name"),
      num(json, "data_size"), num(json, "row_count"),
      str(json, "last_position"), num(json, "sequencer_id"),
      num(json, "push_epoch"), num(json, "push_sequence"))
  }

  private def fs(spark: SparkSession, path: String)
      : org.apache.hadoop.fs.FileSystem =
    new org.apache.hadoop.fs.Path(path)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Stage one batch with its meta file. Layout (foxlake_pusher.rs:
    * 517-550): `root/schema/tb/log_dml_0_0_<uuid>.orc` + meta at
    * `root/schema/tb/meta/<id>_<seq>_log_dml_0_0_<uuid>.orc` with
    * 10-digit zero-padded sequencer id and push sequence — meta names
    * sort in push order, which is what the merger's resume cursor
    * relies on. Works over any Hadoop filesystem (file://, s3a://).
    */
  def stageWithMeta(df: DataFrame, root: String, schema: String,
      tb: String, sequencerId: Long, pushSequence: Long,
      lastPosition: String = "", insertOnly: Boolean = false)
      : StageMeta = {
    val spark = df.sparkSession
    val dir = s"$root/$schema/$tb"
    val uuid = java.util.UUID.randomUUID().toString
    val dataFileName = s"log_dml_0_0_$uuid.orc"
    val metaFileName =
      f"$sequencerId%010d_$pushSequence%010d_$dataFileName"
    val dataPath = s"$dir/$dataFileName"
    val rowCount = df.count()
    // one staged batch = one ORC object, like the pusher's buffer flush
    df.coalesce(1).write.mode(SaveMode.Overwrite).orc(s"$dataPath.tmp")
    val hfs = fs(spark, root)
    val part = hfs.listStatus(new org.apache.hadoop.fs.Path(s"$dataPath.tmp"))
      .map(_.getPath).find(_.getName.endsWith(".orc"))
      .getOrElse(throw new IllegalStateException("no orc part written"))
    // Data-plane staging: this rename happens BEFORE the commit point
    // (the meta-file create below) — readers only see batches listed
    // under meta/, so a non-atomic object-store rename (s3a = copy +
    // delete) can never expose a half-staged file. It CAN fail
    // half-way, though, and Hadoop rename reports that as `false`,
    // not an exception — check it, or a lost data file commits an
    // empty batch.
    if (!hfs.rename(part, new org.apache.hadoop.fs.Path(dataPath)))
      throw new java.io.IOException(
        s"lake stage: rename $part -> $dataPath failed")
    hfs.delete(new org.apache.hadoop.fs.Path(s"$dataPath.tmp"), true)
    val meta = StageMeta(schema, tb, insertOnly, metaFileName,
      dataFileName, dataSize = hfs.getFileStatus(
        new org.apache.hadoop.fs.Path(dataPath)).getLen,
      rowCount = rowCount, lastPosition = lastPosition,
      sequencerId = sequencerId, pushEpoch = 0L,
      pushSequence = pushSequence)
    val metaPath = new org.apache.hadoop.fs.Path(s"$dir/meta/$metaFileName")
    val out = hfs.create(metaPath, true)
    out.write(meta.toJson.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.close()
    meta
  }

  /** Mark the table's stream finished (pusher
    * get_finished_meta_info): the merger stops at this marker.
    */
  def writeFinished(spark: SparkSession, root: String, schema: String,
      tb: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(s"$root/$schema/$tb/meta/finished")
    val out = fs(spark, root).create(p, true)
    out.close()
  }

  /** Meta file names after `startAfter` (exclusive), name-sorted — the
    * S3 `list(start_after)` the extractor uses
    * (foxlake_s3_extractor.rs:201-241).
    */
  def listMetaFiles(spark: SparkSession, root: String, schema: String,
      tb: String, startAfter: Option[String]): Seq[String] = {
    val dir = new org.apache.hadoop.fs.Path(s"$root/$schema/$tb/meta")
    val hfs = fs(spark, root)
    if (!hfs.exists(dir)) return Nil
    val names = hfs.listStatus(dir).map(_.getPath.getName).toSeq.sorted
    startAfter.fold(names)(after => names.filter(_ > after))
  }

  /** (sequencerId, pushSequence) from a meta file name; (0, 0) for
    * unparseable names like the `finished` marker.
    */
  def parseMetaFileName(name: String): (Long, Long) = {
    val m = java.util.regex.Pattern.compile("""^(\d{10})_(\d{10})_""")
      .matcher(name)
    if (m.find()) (m.group(1).toLong, m.group(2).toLong) else (0L, 0L)
  }

  /** Longest continuous prefix of the listing — sequences must step by
    * one within a sequencer id; a new id (pusher restart) must begin at
    * sequence 0; an id going backwards is corruption → empty. The
    * merger only consumes this prefix, so an in-flight pusher write
    * that lands out of order is simply picked up next round
    * (foxlake_s3_extractor.rs:251-300).
    */
  def findContinuousFiles(metaFiles: Seq[String],
      startAfter: Option[String]): Seq[String] = {
    var (prevId, prevSeq) = startAfter.map(parseMetaFileName)
      .getOrElse((0L, 0L))
    val out = Seq.newBuilder[String]
    var i = 0
    while (i < metaFiles.length) {
      val name = metaFiles(i)
      if (name.endsWith("finished") && i == metaFiles.length - 1) {
        out += name
      } else {
        val (id, seq) = parseMetaFileName(name)
        if (id == 0L || id < prevId) return Seq.empty
        if (id != prevId) {
          if (prevId != 0L && seq != 0L) return out.result() // gap
          prevId = id; prevSeq = seq
          out += name
        } else if (seq != prevSeq + 1) {
          return out.result() // gap within the id
        } else {
          prevSeq = seq
          out += name
        }
      }
      i += 1
    }
    out.result()
  }

  /** Merger restart contract: given the last merged meta file name,
    * return exactly the unmerged continuous batches, metas parsed,
    * stopping (and reporting) at a `finished` marker.
    */
  final case class UnmergedBatch(metas: Seq[StageMeta],
      finished: Boolean, newPosition: Option[String])

  def unmergedBatches(spark: SparkSession, root: String, schema: String,
      tb: String, mergedThrough: Option[String]): UnmergedBatch = {
    val listed = listMetaFiles(spark, root, schema, tb, mergedThrough)
    val continuous = findContinuousFiles(listed, mergedThrough)
    val (markers, metaNames) = continuous.partition(_.endsWith("finished"))
    val hfs = fs(spark, root)
    val metas = metaNames.map { name =>
      val p = new org.apache.hadoop.fs.Path(s"$root/$schema/$tb/meta/$name")
      val in = hfs.open(p)
      try {
        val bytes = new Array[Byte](hfs.getFileStatus(p).getLen.toInt)
        in.readFully(bytes)
        StageMeta.fromJson(
          new String(bytes, java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
    UnmergedBatch(metas, markers.nonEmpty, metaNames.lastOption)
  }

  /** Merge exactly the given staged batches (by meta), the MERGE INTO
    * the reference issues with an explicit FILES=(...) list
    * (foxlake_merger.rs:78-99) — never a directory glob, so re-merge
    * after restart touches only unmerged data.
    */
  def mergeBatches(spark: SparkSession, root: String, schema: String,
      tb: String, metas: Seq[StageMeta], keys: Seq[String],
      orderCols: Seq[String]): DataFrame = {
    import graft.operators.Compaction
    require(metas.nonEmpty, "no staged batches to merge")
    val files = metas.map(m => s"$root/$schema/$tb/${m.dataFileName}")
    val staged = spark.read.orc(files: _*)
    Compaction.compact(staged, keys, orderCols, col("row_type"))
  }
}
