package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
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

  /** Container-header parser for the common image formats — dimensions
    * live in the (public, stable) container header, not the compressed
    * stream, so width/height extraction needs no codec library: PNG
    * IHDR (big-endian at offset 16/20), JPEG SOF marker walk, GIF
    * logical screen (little-endian at 6/8), BMP DIB header. This is the
    * REAL half of the decode boundary; pixel decoding stays stubbed.
    */
  object ImageHeader {
    /** (mime, width, height), or None when no known signature parses. */
    def parse(p: Array[Byte]): Option[(String, Int, Int)] = {
      def u8(i: Int) = p(i) & 0xff
      def be16(i: Int) = (u8(i) << 8) | u8(i + 1)
      def be32(i: Int) =
        (u8(i) << 24) | (u8(i + 1) << 16) | (u8(i + 2) << 8) | u8(i + 3)
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int) =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      if (p.length >= 24 && u8(0) == 0x89 && u8(1) == 'P' &&
          u8(2) == 'N' && u8(3) == 'G')
        Some(("image/png", be32(16), be32(20)))
      else if (p.length >= 4 && u8(0) == 0xff && u8(1) == 0xd8) {
        // walk FF-marker segments to the first frame header (SOF0-15
        // minus DHT/JPG/DAC); standalone markers have no length field
        var i = 2
        var out: Option[(String, Int, Int)] = None
        var bad = false
        while (out.isEmpty && !bad && i + 9 < p.length) {
          if (u8(i) != 0xff) bad = true
          else {
            val m = u8(i + 1)
            if (m == 0xd8 || m == 0x01 || (m >= 0xd0 && m <= 0xd7)) i += 2
            else if (m >= 0xc0 && m <= 0xcf && m != 0xc4 && m != 0xc8 &&
                m != 0xcc)
              out = Some(("image/jpeg", be16(i + 7), be16(i + 5)))
            else i += 2 + be16(i + 2)
          }
        }
        out
      } else if (p.length >= 10 && u8(0) == 'G' && u8(1) == 'I' &&
          u8(2) == 'F')
        Some(("image/gif", le16(6), le16(8)))
      else if (p.length >= 26 && u8(0) == 'B' && u8(1) == 'M')
        Some(("image/bmp", le32(18), le32(22)))
      else None
    }
  }

  /** RIFF/WAVE container parser — like [[ImageHeader]], the audio
    * facts a pipeline needs (channels, sample rate, sample width,
    * duration) live in the PUBLIC container header, not the sample
    * stream: "RIFF" + size + "WAVE", then a chunk walk ("fmt " for
    * PCM layout, "data" for payload size). The walk is generic — any
    * chunk order, unknown chunks skipped by their declared size (odd
    * sizes pad to even, per RIFF) — so a real capture with LIST/INFO
    * chunks parses the same as the synthetic fixture.
    */
  object RiffHeader {
    final case class Wav(channels: Int, sampleRate: Int, bits: Int,
        dataBytes: Int) {
      def nSamples: Long =
        // bits < 8 (e.g. 4-bit ADPCM) would make bits/8 zero; treat any
        // sub-byte sample width as unknown rather than divide by zero
        if (channels <= 0 || bits < 8) 0L
        else dataBytes.toLong / (channels.toLong * (bits / 8))
      def durationMs: Long =
        if (sampleRate <= 0) 0L else nSamples * 1000L / sampleRate
    }

    def parse(p: Array[Byte]): Option[Wav] = {
      def u8(i: Int) = p(i) & 0xff
      def le16(i: Int) = u8(i) | (u8(i + 1) << 8)
      def le32(i: Int) =
        u8(i) | (u8(i + 1) << 8) | (u8(i + 2) << 16) | (u8(i + 3) << 24)
      def tag(i: Int) = new String(p, i, 4, "US-ASCII")
      if (p.length < 12 || tag(0) != "RIFF" || tag(8) != "WAVE")
        return None
      // Long cursor: a chunk declaring a size near Int.MaxValue must
      // walk off the end and stop, not overflow into a negative index
      var i = 12L
      var fmt: Option[(Int, Int, Int)] = None
      var dataBytes = -1
      while (i + 8 <= p.length && (fmt.isEmpty || dataBytes < 0)) {
        val at = i.toInt
        val id = tag(at)
        val size = le32(at + 4)
        if (size < 0) return None
        id match {
          case "fmt " if size >= 16 && i + 8 + size <= p.length =>
            fmt = Some((le16(at + 10), le32(at + 12), le16(at + 22)))
          case "data" =>
            // declared size; the payload itself may be truncated or
            // absent (streamed captures declare ahead of the samples)
            dataBytes = size
          case _ => ()
        }
        i += 8L + size + (size & 1) // RIFF pads odd chunks to even
      }
      fmt.collect { case (ch, rate, bits) if dataBytes >= 0 =>
        Wav(ch, rate, bits, dataBytes)
      }
    }
  }

  /** Real header parse with stub fallback for unrecognized payloads. */
  object HeaderDecoder extends MediaDecoder {
    def decode(mime: String, payload: Array[Byte]): (Int, Int, Int) =
      ImageHeader.parse(payload) match {
        case Some((_, w, h)) => (w, h, 1)
        case None => StubDecoder.decode(mime, payload)
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

  /** q78 — header-parse round-trip: VALID container bytes (PNG, JPEG
    * with an APP0 segment to skip, GIF) are synthesized per document
    * with dimensions derived from doc_id, then [[ImageHeader]] parses
    * the dims back out of the raw bytes in the per-partition batch
    * path. The oracle computes the same dims arithmetically — so a
    * hash match proves the byte-level parser inverts the encoding
    * exactly. Bytes never shuffle; only (doc_id, mime, dims) rows
    * leave the scan stage.
    */
  def imageDims(spark: SparkSession, dir: String): DataFrame = {
    val w = (pmod(col("doc_id"), lit(640)) + 1).cast("int")
    val h = (pmod(col("doc_id") * 3, lit(480)) + 1).cast("int")
    val kind = pmod(col("doc_id"), lit(3))
    val pngHex = concat(
      lit("89504E470D0A1A0A0000000D49484452"),
      lpad(hex(w), 8, "0"), lpad(hex(h), 8, "0"),
      lit("080200000000000000"))
    val jpgHex = concat(
      lit("FFD8FFE000104A46494600010100000100010000FFC0001108"),
      lpad(hex(h), 4, "0"), lpad(hex(w), 4, "0"),
      lit("03012200021101031101FFD9"))
    val gifHex = concat(
      lit("474946383961"),
      lpad(hex(pmod(w, lit(256))), 2, "0"),
      lpad(hex(shiftright(w, 8)), 2, "0"),
      lpad(hex(pmod(h, lit(256))), 2, "0"),
      lpad(hex(shiftright(h, 8)), 2, "0"),
      lit("F70000"))
    val media = Tables.documents(spark, dir).select(
      col("doc_id"),
      unhex(when(kind === 0, pngHex).when(kind === 1, jpgHex)
        .otherwise(gifHex)).as("media"),
      struct(
        when(kind === 0, "image/png").when(kind === 1, "image/jpeg")
          .otherwise("image/gif").as("mime"),
        col("source").as("source")).as("meta"))
    extractFeatures(media, HeaderDecoder)
      .select(col("doc_id"), col("mime"), col("width"), col("height"))
  }

  val imageDimsSql: String =
    """SELECT doc_id,
      |  CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'image/png'
      |    WHEN 1 THEN 'image/jpeg' ELSE 'image/gif' END AS mime,
      |  CAST(doc_id % 640 + 1 AS INT) AS width,
      |  CAST((doc_id * 3) % 480 + 1 AS INT) AS height
      |FROM documents""".stripMargin

  /** q103 — audio-metadata round-trip, the [[imageDims]] pattern for
    * sound: VALID RIFF/WAVE header bytes are synthesized from doc_id,
    * [[RiffHeader]] REALLY walks the chunks, and the oracle recomputes
    * the expected facts arithmetically — any parser bug breaks the
    * hash match. Per-row map, no shuffle; at 100 TB this is the
    * metadata-extraction pass that runs before any costly resample.
    */
  def audioMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    def le16(c: Column): Column = concat(
      lpad(hex(pmod(c, lit(256))), 2, "0"),
      lpad(hex(pmod(shiftright(c, 8), lit(256))), 2, "0"))
    def le32(c: Column): Column = concat(
      lpad(hex(pmod(c, lit(256))), 2, "0"),
      lpad(hex(pmod(shiftright(c, 8), lit(256))), 2, "0"),
      lpad(hex(pmod(shiftright(c, 16), lit(256))), 2, "0"),
      lpad(hex(pmod(shiftright(c, 24), lit(256))), 2, "0"))
    val channels = (pmod(col("doc_id"), lit(2)) + 1).cast("int")
    val rate = when(pmod(col("doc_id"), lit(3)) === 0, 8000)
      .when(pmod(col("doc_id"), lit(3)) === 1, 16000)
      .otherwise(44100).cast("int")
    val bits = lit(16)
    val nSamples = (pmod(col("doc_id"), lit(1000)) + 1).cast("int")
    val dataBytes = nSamples * channels * lit(2)
    val byteRate = rate * channels * lit(2)
    val blockAlign = channels * lit(2)
    val wavHex = concat(
      lit("52494646"), le32(dataBytes + 36), lit("57415645"),
      lit("666D7420"), le32(lit(16)), le16(lit(1)), le16(channels),
      le32(rate), le32(byteRate), le16(blockAlign), le16(bits),
      lit("64617461"), le32(dataBytes))
    Tables.documents(spark, dir)
      .select(col("doc_id"), unhex(wavHex).as("media"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.map { case (id, bytes) =>
          val w = RiffHeader.parse(bytes)
            .getOrElse(RiffHeader.Wav(0, 0, 0, 0))
          (id, w.channels, w.sampleRate, w.bits, w.nSamples,
            w.durationMs)
        }
      }
      .toDF("doc_id", "channels", "sample_rate", "bits", "n_samples",
        "duration_ms")
  }

  val audioMetaSql: String =
    """SELECT doc_id,
      |  CAST(doc_id % 2 + 1 AS INT) AS channels,
      |  CAST(CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
      |    WHEN 1 THEN 16000 ELSE 44100 END AS INT) AS sample_rate,
      |  CAST(16 AS INT) AS bits,
      |  CAST(doc_id % 1000 + 1 AS BIGINT) AS n_samples,
      |  CAST((doc_id % 1000 + 1) * 1000 //
      |    (CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 8000
      |     WHEN 1 THEN 16000 ELSE 44100 END) AS BIGINT) AS duration_ms
      |FROM documents""".stripMargin

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q62_media_stats" -> (mediaStats _),
    "q78_image_dims" -> (imageDims _),
    "q103_audio_meta" -> (audioMeta _))

  val oracles: Map[String, String] = Map(
    "q62_media_stats" -> mediaStatsSql,
    "q78_image_dims" -> imageDimsSql,
    "q103_audio_meta" -> audioMetaSql)
}
