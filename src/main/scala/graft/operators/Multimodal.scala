package graft.operators

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.Tables

/** Multimodal column plumbing: image/audio/video as opaque `binary`
  * columns with a typed metadata struct, decoded/feature-extracted in
  * batch per partition.
  *
  * The real decode (JPEG/PNG/audio codecs) is STUBBED — those libraries
  * are not in this container — behind [[MediaDecoder]], with a
  * deterministic fake implementation. Everything Spark-side is real and
  * tested: the schema contract, binary payload handling, per-partition
  * batched UDF shape (`mapPartitions`, the JVM analog of `mapInPandas`
  * batches), and partitioning discipline (media bytes never shuffle —
  * features are extracted before any wide operation).
  */
object Multimodal {

  /** media envelope: payload + typed metadata (FIXTURES.md §5 pattern). */
  val mediaSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("media", BinaryType),
    StructField("meta", StructType(Seq(
      StructField("mime", StringType),
      StructField("source", StringType))))))

  /** Decode/feature-extraction contract — the stub boundary. */
  trait MediaDecoder extends Serializable {
    /** Returns (width, height, nFrames) for a payload. */
    def decode(mime: String, payload: Array[Byte]): (Int, Int, Int)
  }

  /** Deterministic fake: "dimensions" derived from payload bytes. A real
    * deployment swaps in an actual codec; the pipeline shape is unchanged.
    */
  object StubDecoder extends MediaDecoder {
    def decode(mime: String, payload: Array[Byte]): (Int, Int, Int) = {
      // ??? — real codec goes here; the fake is stable per payload.
      val n = payload.length
      val checksum = payload.foldLeft(0L)((a, b) => (a * 31 + (b & 0xff)) %
        1000003L)
      ((checksum % 640).toInt + 1, (checksum % 480).toInt + 1,
        (n % 30) + 1)
    }
  }

  /** Synthesize a media table from documents (text bytes stand in for an
    * image payload).
    */
  def mediaTable(spark: SparkSession, dir: String): DataFrame =
    Tables.documents(spark, dir).select(
      col("doc_id"),
      encode(col("text"), "utf-8").as("media"),
      struct(lit("text/plain").as("mime"),
        col("source").as("source")).as("meta"))

  /** Feature extraction over batches: per-partition decode keeping the
    * iterator lazy (no full-partition materialization), emitting a narrow
    * feature row — media bytes are dropped before any shuffle.
    */
  def extractFeatures(media: DataFrame,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    val outSchema = StructType(Seq(
      StructField("doc_id", LongType),
      StructField("mime", StringType),
      StructField("n_bytes", IntegerType),
      StructField("width", IntegerType),
      StructField("height", IntegerType),
      StructField("n_frames", IntegerType)))
    val enc = org.apache.spark.sql.Encoders.row(outSchema)
    media.mapPartitions { it =>
      it.map { r =>
        val payload = r.getAs[Array[Byte]]("media")
        val mime = r.getAs[Row]("meta").getAs[String]("mime")
        val (w, h, f) = decoder.decode(mime, payload)
        Row(r.getAs[Long]("doc_id"), mime, payload.length, w, h, f)
      }
    }(enc)
  }

  /** Frame sampling: every k-th frame index per media item (the
    * video-pipeline primitive before per-frame feature extraction). The
    * decode yields n_frames (narrow); `sequence` + explode generates the
    * sample plan WITHOUT touching payload bytes again — a downstream
    * per-frame decoder joins back by (doc_id, frame_idx) only for the
    * sampled set, so a 24fps corpus at 100 TB decodes 1/k of its frames.
    */
  def sampleFrames(media: DataFrame, k: Int,
      decoder: MediaDecoder = StubDecoder): DataFrame = {
    require(k >= 1, "sample stride must be >= 1")
    extractFeatures(media, decoder)
      .select(col("doc_id"), col("n_frames"),
        explode(sequence(lit(0), col("n_frames") - 1, lit(k)))
          .as("frame_idx"))
  }

  /** q62 — multimodal envelope stats through pure column ops (the
    * non-stub subset: byte length + content digest), oracle-checkable:
    * Spark md5(binary) == DuckDB md5(string bytes).
    */
  def mediaStats(spark: SparkSession, dir: String): DataFrame =
    mediaTable(spark, dir).select(
      col("doc_id"),
      col("meta.mime").as("mime"),
      octet_length(col("media")).as("n_bytes"),
      md5(col("media")).as("digest"))

  val mediaStatsSql: String =
    """SELECT doc_id, 'text/plain' AS mime,
      |  octet_length(CAST(text AS BLOB)) AS n_bytes,
      |  md5(text) AS digest
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_media_stats" -> (mediaStats _))

  val oracles: Map[String, String] = Map(
    "q62_media_stats" -> mediaStatsSql)
}
