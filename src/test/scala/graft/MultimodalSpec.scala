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

  test("custom decoder plugs in at the stub boundary") {
    val fixed = new Multimodal.MediaDecoder {
      def decode(mime: String, payload: Array[Byte]) = (7, 8, 9)
    }
    val f = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), fixed)
    assert(f.select("width", "height", "n_frames").distinct().count() == 1)
  }
}
