package graft

import graft.operators.Multimodal

class MultimodalSpec extends SparkSuite {
  import spark.implicits._

  test("media table carries binary payload + typed metadata") {
    val m = Multimodal.mediaTable(spark, sf)
    assert(m.schema.fieldNames.toSeq == Seq("doc_id", "media", "meta"))
    assert(m.schema("media").dataType.typeName == "binary")
    val first = m.select("meta.mime").as[String].head()
    assert(first == "text/plain")
  }

  test("feature extraction: per-partition batched decode, bytes dropped") {
    val f = Multimodal.extractFeatures(Multimodal.mediaTable(spark, sf))
    assert(!f.columns.contains("media")) // no payload past extraction
    val rows = f.collect()
    assert(rows.length == 500)
    assert(rows.forall(_.getAs[Int]("width") > 0))
    // deterministic stub: same input → same features
    val again = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf)).collect()
    assert(rows.map(_.toSeq).toSet == again.map(_.toSeq).toSet)
  }

  test("frame sampling emits ceil(n_frames/k) indices, stride k") {
    val fixed = new Multimodal.MediaDecoder {
      def decode(mime: String, payload: Array[Byte]) = (4, 4, 10)
    }
    val s = Multimodal.sampleFrames(
      Multimodal.mediaTable(spark, sf).limit(3), k = 4, fixed)
      .collect()
    // 10 frames, stride 4 → indices 0, 4, 8 per item
    assert(s.length == 9)
    assert(s.map(_.getAs[Int]("frame_idx")).toSet == Set(0, 4, 8))
  }

  test("image headers: PNG/JPEG/GIF/BMP dims parse from raw bytes") {
    import graft.operators.Multimodal.ImageHeader
    def hx(s: String): Array[Byte] =
      s.replaceAll("\\s", "").grouped(2)
        .map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 3×2, real layout incl. CRC bytes (ignored by the parser)
    val png = hx("89504E470D0A1A0A 0000000D 49484452" +
      "00000003 00000002 08 02 00 00 00 DEADBEEF")
    assert(ImageHeader.parse(png).contains(("image/png", 3, 2)))
    // JPEG with APP0 *and* a DQT segment before SOF0 (marker walk must
    // skip variable-length segments, not just the first)
    val jpg = hx("FFD8" +
      "FFE0 0010 4A46494600 0101 00 0001 0001 00 00" +
      "FFDB 0006 00 112233" +
      "FFC0 0011 08 0140 00F0 03 012200 021101 031101" +
      "FFD9")
    assert(ImageHeader.parse(jpg).contains(("image/jpeg", 240, 320)))
    // GIF89a little-endian logical screen 320×200
    val gif = hx("474946383961 4001 C800 F7 00 00")
    assert(ImageHeader.parse(gif).contains(("image/gif", 320, 200)))
    // BMP little-endian DIB dims at 18/22
    val bmp = hx("424D 46000000 0000 0000 36000000 28000000" +
      "10000000 20000000 0100 1800")
    assert(ImageHeader.parse(bmp).contains(("image/bmp", 16, 32)))
    // garbage and truncation fall back to None
    assert(ImageHeader.parse(Array[Byte](1, 2, 3)).isEmpty)
    assert(ImageHeader.parse(hx("FFD8FFE000FF")).isEmpty)
  }

  test("q78 synthesized containers parse back to their encoded dims") {
    val out = graft.operators.Multimodal.imageDims(spark, sf)
      .select("doc_id", "mime", "width", "height")
      .as[(Long, String, Int, Int)].collect()
    assert(out.length == 500)
    out.foreach { case (id, mime, w, h) =>
      assert(w == (id % 640).toInt + 1, s"doc $id")
      assert(h == ((id * 3) % 480).toInt + 1, s"doc $id")
      val want = (id % 3) match {
        case 0 => "image/png"; case 1 => "image/jpeg"; case _ => "image/gif"
      }
      assert(mime == want, s"doc $id")
    }
  }

  test("riff/wav headers: chunk walk handles order, padding, " +
      "truncation; rejects garbage") {
    import Multimodal.RiffHeader
    def hx(s: String): Array[Byte] = s.replaceAll("\\s", "")
      .grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // canonical: fmt then data, 1ch 8000Hz 16-bit, 4 declared bytes
    val canonical = hx(
      "52494646 28000000 57415645" +
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 04000000 AAAA BBBB")
    val w = RiffHeader.parse(canonical).get
    assert((w.channels, w.sampleRate, w.bits, w.dataBytes) ==
      (1, 8000, 16, 4) && w.nSamples == 2L)
    // data chunk declared but payload truncated (streamed capture)
    val truncated = RiffHeader.parse(hx(
      "52494646 28000000 57415645" +
        "666D7420 10000000 0100 0200 80BB0000 00EE0200 0400 1000" +
        "64617461 10270000")).get
    assert(truncated.channels == 2 && truncated.sampleRate == 48000)
    assert(truncated.nSamples == 2500L &&
      truncated.durationMs == 2500L * 1000 / 48000)
    // an odd-sized unknown chunk BEFORE fmt: walk must pad to even
    val listFirst = RiffHeader.parse(hx(
      "52494646 30000000 57415645" +
        "4C495354 03000000 414243 00" + // LIST, size 3, pad byte
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 00000000")).get
    assert(listFirst.sampleRate == 8000 && listFirst.dataBytes == 0)
    // rejects: wrong magic, truncated fmt, negative size
    assert(RiffHeader.parse(hx("52494658 08000000 57415645")).isEmpty)
    assert(RiffHeader.parse(hx(
      "52494646 10000000 57415645 666D7420 10000000 0100")).isEmpty)
    assert(RiffHeader.parse(hx(
      "52494646 08000000 57415645 64617461 FFFFFFFF")).isEmpty)
    // a chunk declaring size near Int.MaxValue must walk off the end
    // and return None — not overflow the cursor into a negative index
    assert(RiffHeader.parse(hx(
      "52494646 08000000 57415645" +
        "4C495354 F7FFFF7F" + // LIST, size 0x7FFFFFF7
        "666D7420 10000000 0100 0100 401F0000 803E0000 0200 1000" +
        "64617461 00000000")).isEmpty)
    // sub-byte sample width (4-bit ADPCM): nSamples is unknown (0),
    // never a divide-by-zero
    val adpcm = RiffHeader.parse(hx(
      "52494646 28000000 57415645" +
        "666D7420 10000000 1100 0100 401F0000 D00F0000 0001 0400" +
        "64617461 00010000")).get
    assert(adpcm.bits == 4 && adpcm.nSamples == 0L &&
      adpcm.durationMs == 0L)
  }

  // spec-side ISO-BMFF builder — independent of the production parser
  private object Bmff {
    def be16(v: Int): Array[Byte] =
      Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be32(v: Long): Array[Byte] = Array(
      ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def be64(v: Long): Array[Byte] = be32(v >> 32) ++ be32(v & 0xffffffffL)
    def zeros(n: Int): Array[Byte] = new Array[Byte](n)
    def box(typ: String, body: Array[Byte]*): Array[Byte] = {
      val b = body.flatten.toArray
      be32(b.length + 8L) ++ typ.getBytes("US-ASCII") ++ b
    }
    /** size==1 largesize escape. */
    def box64(typ: String, body: Array[Byte]*): Array[Byte] = {
      val b = body.flatten.toArray
      be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(b.length + 16L) ++ b
    }
    val matrix: Array[Byte] =
      be32(0x10000L) ++ zeros(12) ++ be32(0x10000L) ++ zeros(12) ++
        be32(0x40000000L)
    def ftyp(brand: String): Array[Byte] =
      box("ftyp", brand.getBytes("US-ASCII"), be32(0x200L))
    def mvhd0(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", zeros(4), zeros(8), be32(ts), be32(dur), be32(0x10000L),
        be16(0x100), zeros(10), matrix, zeros(24), be32(99L))
    def mvhd1(ts: Long, dur: Long): Array[Byte] =
      box("mvhd", Array[Byte](1, 0, 0, 0), zeros(16), be32(ts), be64(dur),
        be32(0x10000L), be16(0x100), zeros(10), matrix, zeros(24),
        be32(99L))
    def tkhd0(tid: Long, dur: Long, w: Int, h: Int): Array[Byte] =
      box("tkhd", Array[Byte](0, 0, 0, 7), zeros(8), be32(tid), zeros(4),
        be32(dur), zeros(16), matrix, be32(w.toLong << 16),
        be32(h.toLong << 16))
    def mdhd0(mts: Long, mdur: Long, lang: Int): Array[Byte] =
      box("mdhd", zeros(4), zeros(8), be32(mts), be32(mdur), be16(lang),
        zeros(2))
    def mdhd1(mts: Long, mdur: Long, lang: Int): Array[Byte] =
      box("mdhd", Array[Byte](1, 0, 0, 0), zeros(16), be32(mts),
        be64(mdur), be16(lang), zeros(2))
    def hdlr(kind: String): Array[Byte] =
      box("hdlr", zeros(4), zeros(4), kind.getBytes("US-ASCII"),
        zeros(12), Array[Byte](0))
  }

  test("mp4 box walk: v0/v1 layouts, largesize, unknown boxes, " +
      "track selection, malformed rejection") {
    import Bmff._
    import Multimodal.Mp4Box
    // canonical v0: 600-tick timescale, 1800 ticks → 3000 ms
    val v0 = ftyp("isom") ++ box("free") ++ box("moov",
      mvhd0(600, 1800),
      box("trak", tkhd0(2, 1800, 320, 240),
        box("mdia", mdhd0(1200, 3600, 0x15C7), hdlr("vide"))))
    assert(Mp4Box.parse(v0).contains(Mp4Box.VideoMeta(
      "isom", 0, 600, 3000, 2, 1200, 320, 240, "vide", "eng")))
    // v1 mvhd + v1 mdhd, moov shipped with the size==1 largesize
    // escape, an unknown udta box inside moov the walk must skip
    val v1 = ftyp("mp42") ++ box64("moov",
      mvhd1(90000, 180000),
      box("udta", Array[Byte](1, 2, 3)),
      box("trak", tkhd0(7, 180000, 640, 480),
        box("mdia", mdhd1(48000, 96000, 0x1A41), hdlr("vide"))))
    assert(Mp4Box.parse(v1).contains(Mp4Box.VideoMeta(
      "mp42", 1, 90000, 2000, 7, 48000, 640, 480, "vide", "fra")))
    // audio trak first: selection must land on the vide trak
    val twoTrak = ftyp("avc1") ++ box("moov",
      mvhd0(1000, 5000),
      box("trak", tkhd0(1, 5000, 0, 0),
        box("mdia", mdhd0(44100, 220500, 0x55C4), hdlr("soun"))),
      box("trak", tkhd0(3, 5000, 1920, 1080),
        box("mdia", mdhd0(30000, 150000, 0x10B5), hdlr("vide"))))
    assert(Mp4Box.parse(twoTrak).contains(Mp4Box.VideoMeta(
      "avc1", 0, 1000, 5000, 3, 30000, 1920, 1080, "vide", "deu")))
    // audio-only file → no video meta
    val audioOnly = ftyp("isom") ++ box("moov", mvhd0(1000, 1000),
      box("trak", tkhd0(1, 1000, 0, 0),
        box("mdia", mdhd0(8000, 8000, 0x55C4), hdlr("soun"))))
    assert(Mp4Box.parse(audioOnly).isEmpty)
    // malformed: missing ftyp, truncation, size escaping its enclosure
    assert(Mp4Box.parse(v0.drop(16)).isEmpty)
    assert(Mp4Box.parse(v0.take(40)).isEmpty)
    val escaping = ftyp("isom") ++ box("moov", mvhd0(600, 1800)) ++
      be32(0xFFFFFFF0L) ++ "trak".getBytes("US-ASCII")
    assert(Mp4Box.parse(escaping).isEmpty)
    assert(Mp4Box.parse(Array[Byte](1, 2, 3)).isEmpty)
  }

  test("q110 synthesized mp4 parses back to its encoded facts") {
    val out = Multimodal.videoMeta(spark, sf)
      .select("doc_id", "brand", "mvhd_version", "duration_ms", "width",
        "height", "lang")
      .as[(Long, String, Int, Long, Int, Int, String)].collect()
    assert(out.length == 500)
    out.foreach { case (id, brand, v, ms, w, h, lang) =>
      val ts = 100 + id % 900
      assert(brand == Seq("isom", "mp42", "avc1")((id % 3).toInt))
      assert(v == (id % 2).toInt, s"doc $id")
      assert(ms == ((id * 7) % 100000 + ts) * 1000 / ts, s"doc $id")
      assert(w == (id % 640).toInt + 1 && h == ((id * 3) % 480).toInt + 1)
      assert(lang == Seq("und", "eng", "fra", "deu")((id % 4).toInt))
    }
  }

  test("q113 sniff dispatches a mixed binary column in one pass") {
    val out = Multimodal.mediaSniff(spark, sf)
      .as[(Long, String, Int, Int, Long)].collect()
    assert(out.length == 500)
    out.foreach { case (id, fmt, w, h, ms) =>
      val want = Seq("png", "jpeg", "gif", "wav", "mp4", "unknown")(
        (id % 6).toInt)
      assert(fmt == want, s"doc $id")
      if (Seq("png", "jpeg", "gif", "mp4").contains(fmt)) {
        assert(w == (id % 640).toInt + 1 && h == ((id * 3) % 480).toInt + 1)
      } else assert(w == 0 && h == 0)
      if (fmt == "wav")
        assert(ms == (id % 1000 + 1) * 1000 /
          Seq(8000, 16000, 44100)((id % 3).toInt))
      if (fmt == "unknown") assert(ms == 0L)
    }
    // dispatch order safety: sniff never throws on arbitrary bytes
    assert(Multimodal.sniff(Array[Byte]()) == ("unknown", 0, 0, 0L))
    assert(Multimodal.sniff("free text".getBytes("UTF-8")) ==
      ("unknown", 0, 0, 0L))
  }

  test("media metadata plans are map-only: no exchange, bytes never " +
      "shuffle") {
    for (q <- Seq(Multimodal.videoMeta(spark, sf),
        Multimodal.mediaSniff(spark, sf),
        Multimodal.imageDims(spark, sf))) {
      val plan = q.queryExecution.executedPlan.toString
      // mediaSniff fans out the unsplittable single-file scan
      // (Tables.fanout, round-robin, a no-op on many-file inputs);
      // no KEY shuffle may appear — media bytes never move by key
      val keyExchanges =
        "Exchange".r.findAllMatchIn(plan).size -
          ("Exchange RoundRobinPartitioning\\(\\d+\\), " +
            "REPARTITION_BY_NUM").r.findAllMatchIn(plan).size
      assert(keyExchanges == 0, plan)
    }
  }

  test("custom decoder plugs in at the stub boundary") {
    val fixed = new Multimodal.MediaDecoder {
      def decode(mime: String, payload: Array[Byte]) = (7, 8, 9)
    }
    val f = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), fixed)
    assert(f.select("width", "height", "n_frames").distinct().count() == 1)
  }

  test("tiff/exif: dual-endian ifd walk, LONG values, malformed " +
      "headers rejected") {
    import graft.operators.Multimodal.TiffHeader
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    // little-endian: II 42, IFD@8, 3 SHORT entries (w=640 h=480 o=6)
    val ii = bytes(
      0x49, 0x49, 0x2A, 0x00, 0x08, 0x00, 0x00, 0x00,
      0x03, 0x00,
      0x00, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00,
      0x80, 0x02, 0x00, 0x00, // 640
      0x01, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00,
      0xE0, 0x01, 0x00, 0x00, // 480
      0x12, 0x01, 0x03, 0x00, 0x01, 0x00, 0x00, 0x00,
      0x06, 0x00, 0x00, 0x00, // orientation 6
      0x00, 0x00, 0x00, 0x00)
    assert(TiffHeader.parse(ii) ==
      Some(TiffHeader.Tiff("II", 640, 480, 6)))
    // big-endian with a LONG (type 4) width — value fills the cell
    val mm = bytes(
      0x4D, 0x4D, 0x00, 0x2A, 0x00, 0x00, 0x00, 0x08,
      0x00, 0x02,
      0x01, 0x00, 0x00, 0x04, 0x00, 0x00, 0x00, 0x01,
      0x00, 0x01, 0x00, 0x00, // 65536 as LONG
      0x01, 0x01, 0x00, 0x03, 0x00, 0x00, 0x00, 0x01,
      0x01, 0x00, 0x00, 0x00, // 256 as SHORT (BE: high byte first)
      0x00, 0x00, 0x00, 0x00)
    assert(TiffHeader.parse(mm) ==
      Some(TiffHeader.Tiff("MM", 65536, 256, 1))) // orientation defaults
    // malformed: wrong order mark, wrong magic, truncated entry table
    assert(TiffHeader.parse(bytes(0x4D, 0x49, 0x00, 0x2A, 0, 0, 0, 8))
      .isEmpty)
    assert(TiffHeader.parse(bytes(0x49, 0x49, 0x2B, 0x00, 8, 0, 0, 0))
      .isEmpty)
    assert(TiffHeader.parse(ii.take(20)).isEmpty)
  }

  test("q137 synthesized tiff parses back to its encoded facts") {
    import org.apache.spark.sql.functions._
    val r = graft.operators.Multimodal.exifMeta(spark, sf)
    assert(r.filter(col("width") =!=
      (pmod(col("doc_id"), lit(640)) + 1)).count() == 0)
    assert(r.filter(col("orientation") =!=
      (pmod(col("doc_id"), lit(8)) + 1)).count() == 0)
    assert(r.select("byte_order").distinct().count() == 2)
  }
}
