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

  test("custom decoder plugs in at the stub boundary") {
    val fixed = new Multimodal.MediaDecoder {
      def decode(mime: String, payload: Array[Byte]) = (7, 8, 9)
    }
    val f = Multimodal.extractFeatures(
      Multimodal.mediaTable(spark, sf), fixed)
    assert(f.select("width", "height", "n_frames").distinct().count() == 1)
  }
}
