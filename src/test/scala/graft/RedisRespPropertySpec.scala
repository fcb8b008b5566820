package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RedisResp

/** Property battery for the RESP wire codec: ANY command stream of
  * arbitrary binary arguments — embedded CRLF, '$'/'*' bytes, NULs,
  * multi-byte UTF-8, empty args, empty commands — concatenates through
  * [[RedisResp.encode]] and parses back byte-identically, and the
  * offset-aware parser reports positions that re-slice the buffer
  * exactly (the replication-offset contract PSYNC ACKs rely on).
  * The hand vectors in RedisSourceSpec pin known shapes; this walks
  * the adversarial byte space. Fixed seeds, raw ScalaCheck
  * (CompactionPropertySpec discipline).
  */
class RedisRespPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  // adversarial bytes weighted in: protocol delimiters, NUL, high bit
  private val byteGen: Gen[Byte] = Gen.frequency(
    3 -> Gen.choose(0, 255).map(_.toByte),
    1 -> Gen.oneOf('\r'.toByte, '\n'.toByte, '$'.toByte, '*'.toByte,
      0.toByte, 0xff.toByte))

  private val argGen: Gen[Array[Byte]] =
    Gen.frequency(
      6 -> Gen.choose(0, 40).flatMap(n =>
        Gen.listOfN(n, byteGen).map(_.toArray)),
      1 -> Gen.const(Array.emptyByteArray),
      1 -> Gen.const("中文€值\r\n".getBytes("UTF-8")))

  private val cmdGen: Gen[Seq[Array[Byte]]] =
    Gen.choose(0, 6).flatMap(n => Gen.listOfN(n, argGen))

  private val streamGen: Gen[Seq[Seq[Array[Byte]]]] =
    Gen.choose(1, 12).flatMap(n => Gen.listOfN(n, cmdGen))

  test("random binary command streams round-trip byte-identically") {
    (1L to 200L).foreach { seed =>
      val cmds = sample(streamGen, seed)
      val wire = cmds.flatMap(RedisResp.encode(_).toSeq).toArray
      val parsed = RedisResp.parseBytes(wire)
      assert(parsed.size == cmds.size, s"seed=$seed")
      parsed.zip(cmds).zipWithIndex.foreach { case ((p, c), k) =>
        assert(p.size == c.size, s"seed=$seed cmd=$k")
        p.zip(c).foreach { case (pa, ca) =>
          assert(pa.sameElements(ca), s"seed=$seed cmd=$k") }
      }
    }
  }

  test("offset-aware parse positions re-slice the stream exactly") {
    (501L to 560L).foreach { seed =>
      val cmds = sample(streamGen, seed)
      val encoded = cmds.map(RedisResp.encode)
      val wire = encoded.flatMap(_.toSeq).toArray
      val withPos = RedisResp.parseBytesFrom(wire, 0)
      // each reported position is the cumulative byte offset past its
      // command — resuming there yields exactly the remaining commands
      val expectedEnds = encoded.scanLeft(0)(_ + _.length).tail
      assert(withPos.map(_._2) == expectedEnds, s"seed=$seed")
      if (withPos.size > 1) {
        val mid = withPos(withPos.size / 2 - 1)._2
        val resumed = RedisResp.parseBytesFrom(wire, mid)
        assert(resumed.size == withPos.size - withPos.size / 2,
          s"seed=$seed")
        assert(resumed.map(_._2) ==
          expectedEnds.drop(withPos.size / 2), s"seed=$seed")
      }
    }
  }
}
