package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{MysqlBinlog, MysqlBinlogWriter}
import graft.sources.MysqlBinlog.{ColType, DeleteRows, UpdateRows,
  WriteRows}

/** Property battery for the binlog v4 wire format: for ANY random table
  * shape (column types, metadata, signedness, nullability) and ANY
  * random rows in the decoder's canonical renderings,
  * decode(encode(rows)) is the identity — across write/update/delete
  * events, NULL bitmaps, and ZSTD transaction-payload wrapping. The
  * hand-built vectors in MysqlBinlogSpec pin known layouts; this spec
  * walks the combinatorial space those vectors can't cover (partial
  * decimal digit groups, fractional-second widths, string-length
  * boundaries at the 1/2-byte length switch, negative TIME2 borrow).
  *
  * Raw ScalaCheck generators sampled under fixed seeds — the scalatest
  * bridge isn't in the offline cache (CompactionPropertySpec
  * discipline).
  */
class MysqlBinlogPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  /** One column: its TableMap entry plus a generator of canonical
    * decoded value renderings.
    */
  private final case class ColSpec(colType: Int, meta: Int,
      signed: Boolean, gen: Gen[String])

  private def digits(n: Int): Gen[String] =
    Gen.listOfN(n, Gen.numChar).map(_.mkString)

  private val asciiText: Gen[String] =
    Gen.choose(0, 24).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', '€', 'ß',
        '中'))).map(_.mkString))

  private def fracGen(fsp: Int): Gen[String] =
    if (fsp == 0) Gen.const("")
    else digits(fsp).map("." + _)

  // every generator emits the decoder's canonical rendering, so
  // encode∘decode is checked as string identity
  private val colSpecGen: Gen[ColSpec] = Gen.oneOf(
    // integer family, signed and unsigned
    Gen.oneOf(true, false).flatMap { s =>
      Gen.oneOf(
        ColSpec(ColType.Tiny, 0, s,
          (if (s) Gen.choose(-128L, 127L)
           else Gen.choose(0L, 255L)).map(_.toString)),
        ColSpec(ColType.Short, 0, s,
          (if (s) Gen.choose(-32768L, 32767L)
           else Gen.choose(0L, 65535L)).map(_.toString)),
        ColSpec(ColType.Int24, 0, s,
          (if (s) Gen.choose(-8388608L, 8388607L)
           else Gen.choose(0L, 16777215L)).map(_.toString)),
        ColSpec(ColType.Long, 0, s,
          (if (s) Gen.choose(Int.MinValue.toLong, Int.MaxValue.toLong)
           else Gen.choose(0L, 4294967295L)).map(_.toString)),
        ColSpec(ColType.LongLong, 0, s,
          Gen.choose(Long.MinValue, Long.MaxValue).map(v =>
            if (s) v.toString else java.lang.Long.toUnsignedString(v))))
    },
    Gen.const(ColSpec(ColType.Year, 0, signed = true,
      Gen.oneOf(Gen.const(0), Gen.choose(1901, 2155)).map(_.toString))),
    // float/double canonical java renderings (NaN folds to the
    // canonical bit pattern, so rendering identity still holds)
    Gen.const(ColSpec(ColType.Float, 4, signed = true,
      Gen.chooseNum(-1e6f, 1e6f).map(_.toString))),
    Gen.const(ColSpec(ColType.Double, 8, signed = true,
      Gen.chooseNum(-1e12, 1e12).map(_.toString))),
    // temporal family
    Gen.const(ColSpec(ColType.Timestamp, 0, signed = true,
      Gen.choose(0L, 4294967295L).map(_.toString))),
    Gen.choose(0, 6).map(fsp => ColSpec(ColType.Timestamp2, fsp,
      signed = true,
      for { s <- Gen.choose(0L, 4294967295L); f <- fracGen(fsp) }
        yield s"$s$f")),
    Gen.const(ColSpec(ColType.Date, 0, signed = true,
      for { y <- Gen.choose(0, 9999); m <- Gen.choose(1, 12)
            d <- Gen.choose(1, 31) } yield f"$y%04d-$m%02d-$d%02d")),
    Gen.const(ColSpec(ColType.Time, 0, signed = true,
      for { h <- Gen.choose(0, 99); m <- Gen.choose(0, 59)
            s <- Gen.choose(0, 59) } yield f"$h%02d:$m%02d:$s%02d")),
    Gen.choose(0, 6).map(fsp => ColSpec(ColType.Time2, fsp,
      signed = true,
      for { neg <- Gen.oneOf("", "-"); h <- Gen.choose(0, 838)
            m <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
            f <- fracGen(fsp)
            // -00:00:00(.0) is +00:00:00 on the wire
            if !(neg == "-" && h == 0 && m == 0 && s == 0 &&
              f.forall(c => c == '.' || c == '0')) }
        yield f"$neg$h%02d:$m%02d:$s%02d$f")),
    Gen.const(ColSpec(ColType.DateTime, 0, signed = true,
      for { y <- Gen.choose(0, 9999); mo <- Gen.choose(1, 12)
            d <- Gen.choose(1, 31); h <- Gen.choose(0, 23)
            mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59) }
        yield f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d")),
    Gen.choose(0, 6).map(fsp => ColSpec(ColType.DateTime2, fsp,
      signed = true,
      for { y <- Gen.choose(0, 9999); mo <- Gen.choose(1, 12)
            d <- Gen.choose(1, 31); h <- Gen.choose(0, 23)
            mi <- Gen.choose(0, 59); s <- Gen.choose(0, 59)
            f <- fracGen(fsp) }
        yield f"$y%04d-$mo%02d-$d%02d $h%02d:$mi%02d:$s%02d$f")),
    // string family around the 1/2-byte length-prefix boundary
    Gen.oneOf(40, 255, 256, 300).map(max =>
      ColSpec(ColType.Varchar, max, signed = true, asciiText)),
    Gen.choose(1, 255).map(len =>
      ColSpec(ColType.StringT, (0xfe << 8) | len, signed = true,
        asciiText.map(_.take(len / 4)))),
    Gen.oneOf(1, 2).map(w =>
      ColSpec(ColType.Enum, (0xf7 << 8) | w, signed = true,
        Gen.choose(0L, if (w == 1) 255L else 65535L).map(_.toString))),
    // bit widths across byte boundaries
    Gen.choose(1, 63).map { nbits =>
      ColSpec(ColType.Bit, ((nbits / 8) << 8) | (nbits % 8),
        signed = true,
        Gen.choose(0L, (1L << nbits) - 1).map(_.toString))
    },
    // decimal: every partial-group size on both sides of the point
    for { p <- Gen.choose(1, 30); s <- Gen.choose(0, 9) } yield {
      val scale = math.min(p, s)
      val intg = p - scale
      val gen = for {
        ip <- if (intg == 0) Gen.const("0")
          else Gen.choose(1, intg).flatMap(n => digits(n)
            .map(_.dropWhile(_ == '0')).map(d => if (d.isEmpty) "0" else d))
        fp <- digits(scale)
        neg <- Gen.oneOf("", "-")
        if !(neg == "-" && ip == "0" && fp.forall(_ == '0'))
      } yield neg + ip + (if (scale > 0) "." + fp else "")
      ColSpec(ColType.NewDecimal, (p << 8) | scale, signed = true, gen)
    },
    // blob family: canonical lowercase hex, meta = length-field width
    Gen.oneOf(1, 2, 3, 4).map(w =>
      ColSpec(ColType.Blob, w, signed = true,
        Gen.choose(0, 16).flatMap(n =>
          Gen.listOfN(n, Gen.choose(0, 255))
            .map(_.map(b => f"$b%02x").mkString)))))

  private val tableGen: Gen[(Seq[ColSpec], Seq[Boolean])] = for {
    n <- Gen.choose(1, 9)
    cols <- Gen.listOfN(n, colSpecGen)
    nullable <- Gen.listOfN(n, Gen.oneOf(true, false))
  } yield (cols, nullable)

  private def rowGen(cols: Seq[ColSpec],
      nullable: Seq[Boolean]): Gen[Array[String]] =
    Gen.sequence[Array[String], String](cols.zip(nullable).map {
      case (c, canNull) =>
        if (canNull) Gen.frequency(4 -> c.gen, 1 -> Gen.const(null))
        else c.gen
    })

  private def roundTrip(seed: Long, zstd: Option[Boolean]): Unit = {
    val (cols, nullable) = sample(tableGen, seed)
    val rows = sample(Gen.listOfN(5, rowGen(cols, nullable)), seed + 1)
    val updates = sample(Gen.listOfN(3,
      Gen.zip(rowGen(cols, nullable), rowGen(cols, nullable))), seed + 2)
    val w = new MysqlBinlogWriter(serverId = 7L)
    w.fde()
    // the TableMap travels WITH its rows: inside the payload for
    // compressed transactions, like the server writes them
    def body(inner: MysqlBinlogWriter): Unit = {
      inner.tableMap(11L, "propdb", "proptb", cols.map(_.colType),
        cols.map(_.meta), nullable, signed = cols.map(_.signed))
      inner.writeRows(11L, rows)
      inner.updateRows(11L, updates)
      inner.deleteRows(11L, rows.take(2))
    }
    zstd match {
      case Some(z) => w.transactionPayload(z)(body)
      case None => body(w)
    }
    // payload events stay nested under their TransactionPayload —
    // flatten one level so both shapes assert identically
    val events = MysqlBinlog.readFile(w.bytes()).flatMap {
      case (h, p: MysqlBinlog.TransactionPayload) => p.events
      case other => Seq(other)
    }
    val writes = events.collect { case (_, e: WriteRows) => e }
    val ups = events.collect { case (_, e: UpdateRows) => e }
    val dels = events.collect { case (_, e: DeleteRows) => e }
    assert(writes.map(_.rows).flatten.map(_.toSeq) ==
      rows.map(_.toSeq),
      s"write rows (seed=$seed zstd=$zstd cols=${cols.map(_.colType)})")
    assert(ups.flatMap(_.rows)
        .map { case (b, a) => (b.toSeq, a.toSeq) } ==
      updates.map { case (b, a) => (b.toSeq, a.toSeq) },
      s"update rows (seed=$seed zstd=$zstd cols=${cols.map(_.colType)})")
    assert(dels.flatMap(_.rows).map(_.toSeq) ==
      rows.take(2).map(_.toSeq),
      s"delete rows (seed=$seed zstd=$zstd cols=${cols.map(_.colType)})")
  }

  test("random tables and rows round-trip: plain events") {
    (1L to 60L).foreach(roundTrip(_, None))
  }

  test("random tables and rows round-trip: transaction payload, " +
      "compressed and uncompressed") {
    (101L to 130L).foreach(roundTrip(_, Some(true)))
    (201L to 230L).foreach(roundTrip(_, Some(false)))
  }
}
