package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.WarcSource

/** Property battery for the WARC framer: ANY sequence of records with
  * arbitrary binary blocks — blocks containing "WARC/1.1" headers,
  * CRLF runs, NULs — frames through a spec-conformant writer and
  * parses back record-identical, under plain, per-record-gzip, and
  * whole-stream-gzip encodings. Content-Length is the only boundary
  * authority, so adversarial block bytes are the interesting space.
  * Fixed seeds, raw ScalaCheck (CompactionPropertySpec discipline).
  */
class WarcPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val byteGen: Gen[Byte] = Gen.frequency(
    3 -> Gen.choose(0, 255).map(_.toByte),
    1 -> Gen.oneOf('\r'.toByte, '\n'.toByte, ':'.toByte, 0.toByte),
    1 -> {
      val trap = "WARC/1.1\r\nContent-Length: 4\r\n\r\nfake"
        .getBytes(StandardCharsets.US_ASCII).toSeq
      Gen.choose(0, trap.size - 1).map(trap(_))
    })

  private val blockGen: Gen[Array[Byte]] = Gen.frequency(
    5 -> Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, byteGen).map(_.toArray)),
    1 -> Gen.const(Array.emptyByteArray),
    1 -> Gen.const(
      "WARC/1.1\r\nWARC-Type: response\r\nContent-Length: 0\r\n\r\n"
        .getBytes(StandardCharsets.US_ASCII)))

  private case class Rec(tpe: String, uri: Option[String],
      block: Array[Byte])

  private val recGen: Gen[Rec] = for {
    tpe <- Gen.oneOf("warcinfo", "response", "conversion", "metadata")
    uri <- Gen.option(Gen.choose(1, 999)
      .map(n => s"http://host.example/p$n"))
    block <- blockGen
  } yield Rec(tpe, uri, block)

  private def write(r: Rec): Array[Byte] = {
    val h = new StringBuilder
    h ++= "WARC/1.1\r\n"
    h ++= s"WARC-Type: ${r.tpe}\r\n"
    r.uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= s"Content-Length: ${r.block.length}\r\n\r\n"
    val out = new ByteArrayOutputStream()
    out.write(h.toString.getBytes(StandardCharsets.US_ASCII))
    out.write(r.block)
    out.write("\r\n\r\n".getBytes(StandardCharsets.US_ASCII))
    out.toByteArray
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bo = new ByteArrayOutputStream()
    val g = new GZIPOutputStream(bo)
    g.write(b); g.close()
    bo.toByteArray
  }

  private def check(recs: Seq[Rec], bytes: Array[Byte],
      label: String): Unit = {
    val parsed = WarcSource.parseAll(bytes)
    assert(parsed.size == recs.size, s"$label: count")
    parsed.zip(recs).zipWithIndex.foreach { case ((got, want), i) =>
      assert(got.warcType == want.tpe, s"$label[$i]: type")
      assert(Option(got.targetUri) == want.uri, s"$label[$i]: uri")
      assert(got.contentLength == want.block.length,
        s"$label[$i]: length")
      assert(got.content.toSeq == want.block.toSeq, s"$label[$i]: bytes")
    }
  }

  test("any record stream round-trips plain, per-record-gzip, and " +
      "stream-gzip — blocks with embedded fake records included") {
    (1L to 40L).foreach { seed =>
      val recs = sample(
        Gen.choose(0, 8).flatMap(n => Gen.listOfN(n, recGen)), seed)
      val parts = recs.map(write)
      val cat = parts.foldLeft(Array.emptyByteArray)(_ ++ _)
      check(recs, cat, s"plain seed=$seed")
      if (recs.nonEmpty) {
        // the Common Crawl layout: one gzip member per record
        check(recs, parts.map(gz).reduce(_ ++ _), s"members seed=$seed")
        // and a whole-stream gzip
        check(recs, gz(cat), s"stream seed=$seed")
      }
    }
  }

  test("truncation anywhere inside the LAST record drops only it") {
    (1L to 20L).foreach { seed =>
      val recs = sample(Gen.listOfN(3, recGen), seed)
      val parts = recs.map(write)
      val whole = parts.reduce(_ ++ _)
      val lastStart = parts(0).length + parts(1).length
      // cut strictly inside the final record (not at its boundary)
      val cut = lastStart + 1 +
        sample(Gen.choose(0, parts(2).length - 6), seed * 7 + 1)
      val parsed = WarcSource.parseAll(whole.take(cut))
      // the two intact records always survive; the truncated tail may
      // only ever drop (never produce a phantom record)
      assert(parsed.size >= 2 && parsed.size <= 3,
        s"seed=$seed size=${parsed.size}")
      check(recs.take(2), whole.take(lastStart), s"prefix seed=$seed")
    }
  }
}
