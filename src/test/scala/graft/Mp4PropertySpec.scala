package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.Mp4Box

/** Property battery for the ISO-BMFF walk: random well-formed box
  * trees — v0/v1 FullBox layouts chosen per box, junk boxes
  * interleaved at every level, optional largesize escapes, audio
  * traks before the video trak — must parse to exactly the facts
  * encoded, and ANY prefix truncation of a valid file must return
  * None rather than throw. The spec-side builder is independent of
  * the parser (MultimodalSpec.Bmff discipline). Fixed seeds, raw
  * ScalaCheck (CompactionPropertySpec discipline).
  */
class Mp4PropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  // -- independent builder (mirrors MultimodalSpec.Bmff) -----------
  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be32(v: Long): Array[Byte] = Array(
    ((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
    ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def be64(v: Long): Array[Byte] =
    be32(v >> 32) ++ be32(v & 0xffffffffL)
  private def zeros(n: Int): Array[Byte] = new Array[Byte](n)
  private def box(typ: String, large: Boolean, body: Array[Byte]*)
      : Array[Byte] = {
    val b = body.flatten.toArray
    if (large)
      be32(1L) ++ typ.getBytes("US-ASCII") ++ be64(b.length + 16L) ++ b
    else be32(b.length + 8L) ++ typ.getBytes("US-ASCII") ++ b
  }
  private val matrix: Array[Byte] =
    be32(0x10000L) ++ zeros(12) ++ be32(0x10000L) ++ zeros(12) ++
      be32(0x40000000L)

  private final case class Facts(brand: String, v1: Boolean, ts: Long,
      dur: Long, tid: Long, mts: Long, w: Int, h: Int, lang: Int,
      mdhdV1: Boolean, large: Boolean, nJunk: Int, audioFirst: Boolean)

  private val langGen: Gen[Int] = for {
    a <- Gen.choose(1, 26); b <- Gen.choose(1, 26); c <- Gen.choose(1, 26)
  } yield (a << 10) | (b << 5) | c

  private val factsGen: Gen[Facts] = for {
    brand <- Gen.oneOf("isom", "mp42", "avc1", "qt  ")
    v1 <- Gen.oneOf(true, false)
    ts <- Gen.choose(1L, 1000000L)
    dur <- Gen.choose(0L, 10000000L)
    tid <- Gen.choose(1L, 0xffffffffL)
    mts <- Gen.choose(1L, 100000L)
    w <- Gen.choose(0, 8192)
    h <- Gen.choose(0, 8192)
    lang <- langGen
    mdhdV1 <- Gen.oneOf(true, false)
    large <- Gen.oneOf(true, false)
    nJunk <- Gen.choose(0, 3)
    audioFirst <- Gen.oneOf(true, false)
  } yield Facts(brand, v1, ts, dur, tid, mts, w, h, lang, mdhdV1,
    large, nJunk, audioFirst)

  private def junkGen(seed: Long): Array[Byte] = {
    val n = sample(Gen.choose(0, 24), seed)
    val body = sample(Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)),
      seed + 1).toArray
    val typ = sample(Gen.oneOf("free", "skip", "udta", "uuid"), seed + 2)
    box(typ, large = false, body)
  }

  private def build(f: Facts, seed: Long): Array[Byte] = {
    def mvhd = if (f.v1)
      box("mvhd", false, Array[Byte](1, 0, 0, 0), zeros(16),
        be32(f.ts), be64(f.dur), be32(0x10000L), be16(0x100), zeros(10),
        matrix, zeros(24), be32(99L))
    else
      box("mvhd", false, zeros(4), zeros(8), be32(f.ts), be32(f.dur),
        be32(0x10000L), be16(0x100), zeros(10), matrix, zeros(24),
        be32(99L))
    def tkhd(tid: Long, w: Int, h: Int) =
      box("tkhd", false, Array[Byte](0, 0, 0, 7), zeros(8), be32(tid),
        zeros(4), be32(f.dur), zeros(16), matrix, be32(w.toLong << 16),
        be32(h.toLong << 16))
    def mdhd(mts: Long, lang: Int) = if (f.mdhdV1)
      box("mdhd", false, Array[Byte](1, 0, 0, 0), zeros(16), be32(mts),
        be64(f.dur), be16(lang), zeros(2))
    else
      box("mdhd", false, zeros(4), zeros(8), be32(mts), be32(f.dur),
        be16(lang), zeros(2))
    def hdlr(kind: String) =
      box("hdlr", false, zeros(4), zeros(4), kind.getBytes("US-ASCII"),
        zeros(12), Array[Byte](0))
    val videoTrak = box("trak", false, tkhd(f.tid, f.w, f.h),
      box("mdia", false, mdhd(f.mts, f.lang), hdlr("vide")))
    val audioTrak = box("trak", false, tkhd(f.tid + 1, 0, 0),
      box("mdia", false, mdhd(8000L, 0x55C4), hdlr("soun")))
    val junk = (0 until f.nJunk).map(i => junkGen(seed * 31 + i))
    val traks =
      if (f.audioFirst) Seq(audioTrak, videoTrak) else Seq(videoTrak)
    val moovKids = (junk.take(1) ++ Seq(mvhd) ++ junk.drop(1) ++ traks)
    val moov = box("moov", f.large, moovKids: _*)
    val ftyp = box("ftyp", false, f.brand.getBytes("US-ASCII"),
      be32(0x200L))
    ftyp ++ junkGen(seed * 17) ++ moov
  }

  private def langStr(packed: Int): String = new String(Array(
    (((packed >> 10) & 0x1f) + 0x60).toChar,
    (((packed >> 5) & 0x1f) + 0x60).toChar,
    ((packed & 0x1f) + 0x60).toChar))

  test("random well-formed files parse to exactly the encoded facts") {
    for (seed <- 1L to 400L) {
      val f = sample(factsGen, seed)
      val bytes = build(f, seed)
      val got = Mp4Box.parse(bytes)
      assert(got.contains(Mp4Box.VideoMeta(f.brand, if (f.v1) 1 else 0,
        f.ts, f.dur * 1000L / f.ts, f.tid, f.mts, f.w, f.h, "vide",
        langStr(f.lang))), s"seed $seed facts $f")
    }
  }

  test("every prefix truncation of a valid file returns None or a " +
      "consistent parse — never a crash") {
    for (seed <- 1L to 20L) {
      val f = sample(factsGen, seed)
      val bytes = build(f, seed)
      // walk all truncation lengths; parse must never throw, and any
      // Some must carry the real facts (truncation can only lose data)
      for (n <- 0 until bytes.length) {
        val got = Mp4Box.parse(bytes.take(n))
        got.foreach { m =>
          assert(m.brand == f.brand && m.timescale == f.ts,
            s"seed $seed len $n")
        }
      }
    }
  }

  test("random byte soup never crashes the walk") {
    val soupGen = Gen.choose(0, 200).flatMap(n =>
      Gen.listOfN(n, Gen.choose(0, 255).map(_.toByte)).map(_.toArray))
    for (seed <- 1L to 300L) {
      val bytes = sample(soupGen, seed)
      Mp4Box.parse(bytes) // must not throw
    }
  }
}
