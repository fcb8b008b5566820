package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Multimodal.TiffHeader

/** Property battery for the dual-endian TIFF IFD walk: random valid
  * headers — either byte order, entry order shuffled, unknown tags
  * interleaved, SHORT and LONG value types mixed, IFD placed at a
  * non-minimal offset — parse to exactly the facts encoded, and ANY
  * prefix truncation of a valid file returns None rather than throws.
  * The builder is independent of the parser. Fixed seeds, raw
  * ScalaCheck (CompactionPropertySpec discipline).
  */
class TiffPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private case class Entry(tag: Int, typ: Int, value: Long)
  private case class Spec(little: Boolean, width: Long, height: Long,
      orientation: Int, extras: List[Entry], gap: Int,
      shuffleSeed: Long)

  private val entryGen: Gen[Entry] = for {
    tag <- Gen.oneOf(0x010e, 0x011a, 0x0131, 0x8769) // benign tags
    typ <- Gen.oneOf(3, 4)
    v <- Gen.choose(0L, 60000L)
  } yield Entry(tag, typ, v)

  private val specGen: Gen[Spec] = for {
    little <- Gen.oneOf(true, false)
    wTyp <- Gen.oneOf(3, 4)
    w <- if (wTyp == 3) Gen.choose(1L, 65535L)
      else Gen.choose(1L, 1000000L)
    hTyp <- Gen.oneOf(3, 4)
    h <- if (hTyp == 3) Gen.choose(1L, 65535L)
      else Gen.choose(1L, 1000000L)
    o <- Gen.choose(1, 8)
    extras <- Gen.choose(0, 5).flatMap(n => Gen.listOfN(n, entryGen))
    gap <- Gen.choose(0, 32) // junk bytes before the IFD
    ss <- Gen.choose(0L, 1000L)
  } yield Spec(little, if (wTyp == 3) w else w | 0x10000L,
    if (hTyp == 3) h else h | 0x10000L, o, extras, gap, ss)

  // -- independent builder -----------------------------------------
  private def u16(v: Int, little: Boolean): Array[Byte] =
    if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte)
    else Array(((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
  private def u32(v: Long, little: Boolean): Array[Byte] =
    if (little) Array((v & 0xff).toByte, ((v >> 8) & 0xff).toByte,
      ((v >> 16) & 0xff).toByte, ((v >> 24) & 0xff).toByte)
    else Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
      ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)

  private def entryBytes(tag: Int, typ: Int, v: Long,
      little: Boolean): Array[Byte] = {
    val cell =
      if (typ == 3) u16(v.toInt, little) ++ Array[Byte](0, 0)
      else u32(v, little)
    u16(tag, little) ++ u16(typ, little) ++ u32(1L, little) ++ cell
  }

  private def build(s: Spec): Array[Byte] = {
    val little = s.little
    val wTyp = if (s.width > 0xffffL) 4 else 3
    val hTyp = if (s.height > 0xffffL) 4 else 3
    val required = List(
      entryBytes(0x0100, wTyp, s.width & 0xffffffffL, little),
      entryBytes(0x0101, hTyp, s.height & 0xffffffffL, little),
      entryBytes(0x0112, 3, s.orientation.toLong, little))
    val all = scala.util.Random.javaRandomToRandom(
      new java.util.Random(s.shuffleSeed))
      .shuffle(required ++ s.extras.map(e =>
        entryBytes(e.tag, e.typ, e.value, little)))
    val ifdOff = 8 + s.gap
    val order = if (little) Array[Byte](0x49, 0x49)
      else Array[Byte](0x4d, 0x4d)
    val header = order ++ u16(42, little) ++ u32(ifdOff.toLong, little)
    val junk = Array.fill[Byte](s.gap)(0x5a)
    val ifd = u16(all.size, little) ++
      all.foldLeft(Array.emptyByteArray)(_ ++ _) ++ u32(0L, little)
    header ++ junk ++ ifd
  }

  test("any valid header parses to exactly the encoded facts, both " +
      "byte orders, shuffled entries, junk-padded IFD offsets") {
    (1L to 60L).foreach { seed =>
      val s = sample(specGen, seed)
      val parsed = TiffHeader.parse(build(s))
      assert(parsed.isDefined, s"seed=$seed")
      val t = parsed.get
      assert(t.byteOrder == (if (s.little) "II" else "MM"),
        s"seed=$seed")
      assert(t.width.toLong == (s.width & 0xffffffffL), s"seed=$seed")
      assert(t.height.toLong == (s.height & 0xffffffffL),
        s"seed=$seed")
      assert(t.orientation == s.orientation, s"seed=$seed")
    }
  }

  test("any prefix truncation of a valid header returns None, never " +
      "throws") {
    (1L to 25L).foreach { seed =>
      val s = sample(specGen, seed)
      val whole = build(s)
      // every strict prefix either parses to the SAME facts (cut in
      // the trailing next-IFD pointer) or cleanly refuses
      (0 until whole.length).foreach { cut =>
        val p = TiffHeader.parse(whole.take(cut))
        p.foreach { t =>
          assert(t.orientation == s.orientation &&
            t.width.toLong == (s.width & 0xffffffffL),
            s"seed=$seed cut=$cut")
        }
      }
    }
  }
}
