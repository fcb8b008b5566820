package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RowKind
import graft.sources.{MysqlBinlog, MysqlBinlogWriter}
import graft.sources.MysqlBinlog._

/** Binlog v4 file decoder battery — hand-built images through
  * [[MysqlBinlogWriter]], decoded by [[MysqlBinlog]]; covers the column
  * types, bitmaps, checksums, optional metadata, and transaction-payload
  * compression the reference's wire client handles
  * (mysql_cdc_extractor.rs:194-342, row decode :354-394).
  */
class MysqlBinlogSpec extends AnyFunSuite {

  private val AllTypesCols = Seq(
    ("c_tiny", ColType.Tiny, 0),
    ("c_short", ColType.Short, 0),
    ("c_int24", ColType.Int24, 0),
    ("c_long", ColType.Long, 0),
    ("c_longlong", ColType.LongLong, 0),
    ("c_year", ColType.Year, 0),
    ("c_float", ColType.Float, 4),
    ("c_double", ColType.Double, 8),
    ("c_ts", ColType.Timestamp, 0),
    ("c_ts2", ColType.Timestamp2, 3),
    ("c_date", ColType.Date, 0),
    ("c_time", ColType.Time, 0),
    ("c_time2", ColType.Time2, 2),
    ("c_dt", ColType.DateTime, 0),
    ("c_dt2", ColType.DateTime2, 6),
    ("c_varchar", ColType.Varchar, 300),
    ("c_varshort", ColType.Varchar, 40),
    ("c_bit", ColType.Bit, (1 << 8) | 4), // BIT(12): bytes=1 bits=4
    ("c_dec", ColType.NewDecimal, (14 << 8) | 4),
    ("c_char", ColType.StringT, (ColType.StringT << 8) | 12),
    ("c_enum", ColType.Enum, (ColType.Enum << 8) | 1),
    ("c_set", ColType.Set, (ColType.Set << 8) | 2),
    ("c_blob", ColType.Blob, 2),
    ("c_json", ColType.Json, 4))

  private val AllTypesRow: Array[String] = Array(
    "-128", "-32768", "-8388608", "-2147483648", "-9223372036854775808",
    "2024", "1.5", "3.141592653589793", "1700000000", "1700000000.123",
    "2024-02-29", "13:45:09", "-838:59:58.99", "9999-12-31 23:59:59",
    "2024-06-01 12:34:56.000001", "héllo wörld", "short",
    "4095", "1234567890.9999", "CHARDATA", "2", "513",
    "deadbeef00", "050700") // c_json: writer takes jsonb hex (int16 7)

  /** What the decoder renders for AllTypesRow: identical except JSON,
    * which decodes from binary to JSON text.
    */
  private val AllTypesDecoded: Seq[String] =
    AllTypesRow.toSeq.updated(23, "7")

  private def writerWithTable(colNames: Boolean = true,
      checksum: Boolean = true, signed: Seq[Boolean] = Nil)
      : MysqlBinlogWriter = {
    val w = new MysqlBinlogWriter(serverId = 42L, checksum = checksum)
    w.fde()
    w.tableMap(23L, "shop", "all_types",
      AllTypesCols.map(_._2), AllTypesCols.map(_._3),
      nullable = Seq.fill(AllTypesCols.size)(true),
      colNames = if (colNames) AllTypesCols.map(_._1) else Nil,
      signed = signed)
    w
  }

  test("all column types round-trip through write → decode") {
    val w = writerWithTable()
    w.begin("shop")
    w.writeRows(23L, Seq(AllTypesRow))
    w.xid(99L)
    val events = MysqlBinlog.readFile(w.bytes())
    val writes = events.collect { case (_, e: WriteRows) => e }
    assert(writes.size == 1)
    assert(writes.head.rows.head.toSeq == AllTypesDecoded)
  }

  test("NULL bitmap: nulls at both bitmap byte boundaries survive") {
    val w = writerWithTable()
    val row = AllTypesRow.clone()
    row(0) = null; row(7) = null; row(8) = null; row(23) = null
    w.writeRows(23L, Seq(row))
    val writes = MysqlBinlog.readFile(w.bytes())
      .collect { case (_, e: WriteRows) => e }
    assert(writes.head.rows.head.toSeq == row.toSeq)
  }

  test("SIGNEDNESS optional metadata decodes unsigned integer widths") {
    val signed = AllTypesCols.map(_ => true)
      .updated(4, false) // c_longlong unsigned
      .updated(0, false) // c_tiny unsigned
    val w = writerWithTable(signed = signed)
    val row = AllTypesRow.clone()
    row(0) = "255"
    row(4) = "18446744073709551615"
    w.writeRows(23L, Seq(row))
    val writes = MysqlBinlog.readFile(w.bytes())
      .collect { case (_, e: WriteRows) => e }
    assert(writes.head.rows.head(0) == "255")
    assert(writes.head.rows.head(4) == "18446744073709551615")
  }

  test("update and delete events carry before/after images") {
    val w = writerWithTable()
    val before = AllTypesRow.clone()
    val after = AllTypesRow.clone()
    after(15) = "renamed"
    w.updateRows(23L, Seq((before, after)))
    w.deleteRows(23L, Seq(after))
    val events = MysqlBinlog.readFile(w.bytes())
    val u = events.collect { case (_, e: UpdateRows) => e }.head
    assert(u.rows.head._1.toSeq == AllTypesDecoded)
    assert(u.rows.head._2.toSeq == AllTypesDecoded.updated(15, "renamed"))
    val d = events.collect { case (_, e: DeleteRows) => e }.head
    assert(d.rows.head.toSeq == AllTypesDecoded.updated(15, "renamed"))
  }

  test("multi-row events preserve order") {
    val w = writerWithTable()
    val rows = (1 to 50).map { i =>
      val r = AllTypesRow.clone(); r(3) = i.toString; r
    }
    w.writeRows(23L, rows)
    val writes = MysqlBinlog.readFile(w.bytes())
      .collect { case (_, e: WriteRows) => e }
    assert(writes.head.rows.map(_(3)) == (1 to 50).map(_.toString))
  }

  test("checksum off: FDE advertises alg 0 and events have no trailer") {
    val w = writerWithTable(checksum = false)
    w.writeRows(23L, Seq(AllTypesRow))
    val events = MysqlBinlog.readFile(w.bytes())
    val fde = events.collect { case (_, e: FormatDescription) => e }.head
    assert(fde.checksumAlg == 0)
    val writes = events.collect { case (_, e: WriteRows) => e }
    assert(writes.head.rows.head.toSeq == AllTypesDecoded)
  }

  test("corrupted byte fails the CRC32 check loudly") {
    val w = writerWithTable()
    w.writeRows(23L, Seq(AllTypesRow))
    val bytes = w.bytes()
    bytes(bytes.length - 20) = (bytes(bytes.length - 20) ^ 0x40).toByte
    val err = intercept[IllegalArgumentException] {
      MysqlBinlog.readFile(bytes)
    }
    assert(err.getMessage.contains("CRC32"))
  }

  test("query, xid, gtid, rotate decode") {
    val w = writerWithTable()
    w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", 23L)
    w.begin("shop")
    w.query("shop", "ALTER TABLE all_types ADD COLUMN c_new INT")
    w.xid(77L)
    w.rotate(4L, "binlog.000002")
    val events = MysqlBinlog.readFile(w.bytes())
    val g = events.collect { case (_, e: Gtid) => e }.head
    assert(g.uuid == "3e11fa47-71ca-11e1-9e33-c80aa9429562" && g.gno == 23L)
    val qs = events.collect { case (_, e: Query) => e }
    assert(qs.map(_.sql) ==
      Seq("BEGIN", "ALTER TABLE all_types ADD COLUMN c_new INT"))
    assert(qs.forall(_.schema == "shop"))
    assert(events.collect { case (_, e: Xid) => e }.head.xid == 77L)
    val r = events.collect { case (_, e: Rotate) => e }.head
    assert(r.nextFile == "binlog.000002" && r.position == 4L)
  }

  test("transaction payload: ZSTD and uncompressed both recurse") {
    for (zstd <- Seq(true, false)) {
      val w = writerWithTable()
      w.transactionPayload(zstd) { inner =>
        inner.begin("shop")
        inner.writeRows(23L, Seq(AllTypesRow))
        inner.xid(5L)
      }
      val events = MysqlBinlog.readFile(w.bytes())
      val p = events.collect { case (_, e: TransactionPayload) => e }.head
      val writes = p.events.collect { case (_, e: WriteRows) => e }
      assert(writes.head.rows.head.toSeq == AllTypesDecoded,
        s"zstd=$zstd")
    }
  }

  test("NEWDECIMAL vectors: signs, zeros, group boundaries") {
    val vectors = Seq(
      ((10, 0), Seq("0", "1", "-1", "9999999999", "-9999999999")),
      ((18, 9), Seq("0.000000000", "123456789.987654321",
        "-123456789.987654321", "0.000000001", "-0.000000001")),
      ((30, 10), Seq("99999999999999999999.9999999999",
        "-99999999999999999999.9999999999", "0.0000000001")),
      ((9, 9), Seq("0.123456789", "-0.999999999")),
      ((4, 2), Seq("12.34", "-0.05", "0.00")))
    vectors.foreach { case ((p, s), vals) =>
      val w = new MysqlBinlogWriter()
      w.fde()
      w.tableMap(1L, "d", "t", Seq(ColType.NewDecimal),
        Seq((p << 8) | s), Seq(true), Seq("v"))
      w.writeRows(1L, vals.map(v => Array(v)))
      val got = MysqlBinlog.readFile(w.bytes())
        .collect { case (_, e: WriteRows) => e }
        .head.rows.map(_(0))
      // canonical render strips redundant leading zeros, keeps scale
      val want = vals.map { v =>
        val neg = v.startsWith("-")
        val stripped = (if (neg) v.substring(1) else v) match {
          case x if x.startsWith("0.") => x
          case x => x.dropWhile(_ == '0') match {
            case y if y.isEmpty || y.startsWith(".") => "0" + y
            case y => y
          }
        }
        (if (neg) "-" else "") + stripped
      }
      assert(got == want, s"DECIMAL($p,$s)")
    }
  }

  test("NEWDECIMAL vectors: hand-built decimal2bin images, not the " +
      "symmetric writer") {
    // Hand-computed from MySQL decimal2bin: base-10^9 groups big-endian,
    // partial groups in Dig2Bytes bytes, digits XOR'd with the sign mask
    // (all-ones when negative), then the first byte's MSB flipped.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val vectors = Seq(
      // DECIMAL(4,2) 12.34: [0x0C | 0x22] -> MSB flip
      (bytes(0x8C, 0x22), 4, 2, "12.34"),
      (bytes(0x73, 0xDD), 4, 2, "-12.34"),
      // DECIMAL(14,4) -1234567890.1234: partial-int 1 byte, one full
      // int group (234567890 = 0x0DFB38D2), partial-frac 2 bytes
      (bytes(0x7E, 0xF2, 0x04, 0xC7, 0x2D, 0xFB, 0x2D), 14, 4,
        "-1234567890.1234"),
      (bytes(0x81, 0x0D, 0xFB, 0x38, 0xD2, 0x04, 0xD2), 14, 4,
        "1234567890.1234"),
      // DECIMAL(9,9) -0.999999999: single full fraction group
      (bytes(0x44, 0x65, 0x36, 0x00), 9, 9, "-0.999999999"),
      (bytes(0xBB, 0x9A, 0xC9, 0xFF), 9, 9, "0.999999999"))
    vectors.foreach { case (raw, p, s, want) =>
      assert(MysqlBinlog.decodeNewDecimalBytes(raw, p, s) == want,
        s"DECIMAL($p,$s) " +
          raw.map(b => f"${b & 0xff}%02x").mkString(" "))
    }
  }

  test("DATETIME2/TIMESTAMP2 vectors: hand-built packed images") {
    // Hand-computed from the my_time.c packed layout: 5-byte offset-
    // binary (ym*13 calendar packing, 17-bit hms) plus big-endian
    // fraction bytes in 10^(6-2*ceil(fsp/2)) units.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val dt = Seq(
      (bytes(0x99, 0xB0, 0xA4, 0xDB, 0x5E, 0x04, 0xCE), 3,
        "2023-07-18 13:45:30.123"),
      (bytes(0x80, 0x03, 0x82, 0x00, 0x00), 0, "0001-01-01 00:00:00"),
      (bytes(0xFE, 0xF3, 0xFF, 0x7E, 0xFB, 0x0F, 0x42, 0x3F), 6,
        "9999-12-31 23:59:59.999999"))
    dt.foreach { case (raw, fsp, want) =>
      assert(MysqlBinlog.decodeDateTime2Bytes(raw, fsp) == want,
        s"fsp=$fsp")
    }
    assert(MysqlBinlog.decodeTimestamp2Bytes(
      bytes(0x64, 0xB6, 0x97, 0x7A, 0x2D), 2) == "1689687930.45")
  }

  test("TIME2 vectors: negative fractional times are one complemented " +
      "quantity") {
    // Hand-computed from my_time.c storage (TIMEF_INT_OFS borrow /
    // complemented fraction) — NOT produced by the symmetric writer, so
    // a decode-side scheme error cannot hide behind a matching encoder.
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val vectors = Seq(
      (bytes(0x7F, 0x37, 0x47, 0xB2), 2, "-12:34:56.78"),
      (bytes(0x80, 0xC8, 0xB8, 0x4E), 2, "12:34:56.78"),
      (bytes(0x7F, 0xF0, 0x00), 0, "-01:00:00"),
      (bytes(0x80, 0x00, 0x00), 0, "00:00:00"),
      (bytes(0x7F, 0xFF, 0xFE, 0xFF, 0xFF), 4, "-00:00:01.0001"),
      (bytes(0x7F, 0xFF, 0xFF, 0xFF, 0xFF, 0xFF), 6, "-00:00:00.000001"))
    vectors.foreach { case (raw, meta, want) =>
      assert(MysqlBinlog.decodeTime2Bytes(raw, meta) == want,
        s"fsp=$meta ${raw.map(b => f"${b & 0xff}%02x").mkString(" ")}")
    }
    // Writer round-trip over the same values: with the decoder pinned to
    // MySQL's bytes above, a passing round-trip pins the encoder too.
    val times = vectors.map(_._3) :+ "-838:59:58.99"
    times.foreach { t =>
      val fsp = { val d = t.indexOf('.'); if (d < 0) 0 else t.length - d - 1 }
      val w = new MysqlBinlogWriter()
      w.fde()
      w.tableMap(1L, "d", "t", Seq(ColType.Time2), Seq(fsp), Seq(true),
        Seq("v"))
      w.writeRows(1L, Seq(Array(t)))
      val got = MysqlBinlog.readFile(w.bytes())
        .collect { case (_, e: WriteRows) => e }.head.rows.head(0)
      assert(got == t, s"round-trip $t")
    }
  }

  test("decodeFile emits ChangeEvents named by 8.0 optional metadata") {
    val w = writerWithTable()
    w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", 9L)
    w.begin("shop")
    w.writeRows(23L, Seq(AllTypesRow))
    val upd = AllTypesRow.clone(); upd(15) = "v2"
    w.updateRows(23L, Seq((AllTypesRow, upd)))
    w.deleteRows(23L, Seq(upd))
    w.xid(1L)
    val evts = MysqlBinlog.decodeFile(w.bytes(), "binlog.000007")
    assert(evts.map(_.rowType) ==
      Seq(RowKind.Insert, RowKind.Update, RowKind.Delete))
    assert(evts.forall(e => e.schema == "shop" && e.tb == "all_types"))
    assert(evts.head.after("c_varchar") == "héllo wörld")
    assert(evts(1).before("c_varchar") == "héllo wörld")
    assert(evts(1).after("c_varchar") == "v2")
    assert(evts(2).before("c_varchar") == "v2")
    assert(evts.forall(_.positionKind == "mysql_cdc"))
    assert(evts.forall(_.positionValue.contains("binlog.000007")))
    assert(evts.forall(_.positionValue.endsWith(
      "gtid=3e11fa47-71ca-11e1-9e33-c80aa9429562:9")))
  }

  test("decodeFile without optional metadata uses the external meta hook") {
    val w = writerWithTable(colNames = false)
    w.writeRows(23L, Seq(AllTypesRow))
    val err = intercept[IllegalArgumentException] {
      MysqlBinlog.decodeFile(w.bytes(), "f")
    }
    assert(err.getMessage.contains("binlog_row_metadata"))
    val evts = MysqlBinlog.decodeFile(w.bytes(), "f",
      (s, t) => if (s == "shop" && t == "all_types")
        AllTypesCols.map(_._1) else Nil)
    assert(evts.head.after("c_dec") == "1234567890.9999")
  }

  test("rotate mid-file switches the position's binlog filename") {
    val w = writerWithTable()
    w.writeRows(23L, Seq(AllTypesRow))
    w.rotate(4L, "binlog.000002")
    w.tableMap(23L, "shop", "all_types",
      AllTypesCols.map(_._2), AllTypesCols.map(_._3),
      Seq.fill(AllTypesCols.size)(true), AllTypesCols.map(_._1))
    w.writeRows(23L, Seq(AllTypesRow))
    val evts = MysqlBinlog.decodeFile(w.bytes(), "binlog.000001")
    assert(evts.size == 2)
    assert(evts.head.positionValue.contains("binlog.000001"))
    assert(evts(1).positionValue.contains("binlog.000002"))
  }

  test("toSegmentLines renders the ChangelogSource record format") {
    val w = writerWithTable()
    w.writeRows(23L, Seq(AllTypesRow))
    val del = AllTypesRow.clone()
    w.deleteRows(23L, Seq(del))
    val evts = MysqlBinlog.decodeFile(w.bytes(), "binlog.000001")
    val lines = MysqlBinlog.toSegmentLines(evts,
      keyCols = Seq("c_long"), startSeq = 100L)
    assert(lines.size == 2)
    val f0 = lines.head.split("\t", -1)
    assert(f0(0) == "100" && f0(1) == "shop" && f0(2) == "all_types" &&
      f0(3) == "insert" && f0(4) == "-2147483648")
    assert(f0(5).contains("c_varchar=héllo wörld"))
    val f1 = lines(1).split("\t", -1)
    assert(f1(0) == "101" && f1(3) == "delete" &&
      f1(4) == "-2147483648" && f1(5).contains("c_char=CHARDATA"))
  }

  test("binary JSON renders to JSON text") {
    import MysqlBinlog.JsonBinary
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray

    // scalars at top level
    assert(JsonBinary.render(bytes(0x04, 0x00)) == "null")
    assert(JsonBinary.render(bytes(0x04, 0x01)) == "true")
    assert(JsonBinary.render(bytes(0x05, 0xf9, 0xff)) == "-7")
    assert(JsonBinary.render(bytes(0x0a, 0xff, 0xff, 0xff, 0xff, 0xff,
      0xff, 0xff, 0xff)) == "18446744073709551615")
    assert(JsonBinary.render(bytes(0x0c, 0x03, 'h', 0xc3, 0xa9)) ==
      "\"hé\"")
    // double that is integral renders with .0 (MySQL JSON semantics)
    assert(JsonBinary.render(
      bytes(0x0b, 0, 0, 0, 0, 0, 0, 0x08, 0x40)) == "3.0")

    // small object {"a":7,"b":[true,"hi"],"c":-2.5} — nested array,
    // inlined int16, offset-addressed string and double
    val obj = bytes(0x00,
      0x03, 0x00, 0x31, 0x00, // count 3, size 49
      0x19, 0x00, 0x01, 0x00, // key "a" @25
      0x1a, 0x00, 0x01, 0x00, // key "b" @26
      0x1b, 0x00, 0x01, 0x00, // key "c" @27
      0x05, 0x07, 0x00, // a: inlined int16 7
      0x02, 0x1c, 0x00, // b: small array @28
      0x0b, 0x29, 0x00, // c: double @41
      'a', 'b', 'c',
      // array @28: [true, "hi"]
      0x02, 0x00, 0x0d, 0x00,
      0x04, 0x01, 0x00, // inlined true
      0x0c, 0x0a, 0x00, // string @ array+10
      0x02, 'h', 'i',
      // double @41: -2.5 LE
      0x00, 0x00, 0x00, 0x00, 0x00, 0x00, 0x04, 0xc0)
    assert(JsonBinary.render(obj) ==
      """{"a":7,"b":[true,"hi"],"c":-2.5}""")

    // large array inlines int32 (4-byte entries)
    val largeArr = bytes(0x03,
      0x01, 0x00, 0x00, 0x00, 0x0d, 0x00, 0x00, 0x00,
      0x07, 0xff, 0xff, 0xff, 0x7f)
    assert(JsonBinary.render(largeArr) == "[2147483647]")

    // opaque values tag their field type instead of failing the row
    assert(JsonBinary.render(bytes(0x0f, 0xf6, 0x02, 0xaa, 0xbb)) ==
      "\"opaque(246):aabb\"")

    // through a full row image: the JSON column yields text
    val w = new MysqlBinlogWriter()
    w.fde()
    w.tableMap(3L, "d", "t", Seq(ColType.Json), Seq(4), Seq(true),
      Seq("j"))
    w.writeRows(3L, Seq(Array(obj.map(b => f"${b & 0xff}%02x").mkString)))
    val evts = MysqlBinlog.decodeFile(w.bytes(), "f")
    assert(evts.head.after("j") == """{"a":7,"b":[true,"hi"],"c":-2.5}""")
  }

  test("long varchar (2-byte length) and char beyond 255 bytes") {
    val long = "x" * 280
    val w = new MysqlBinlogWriter()
    w.fde()
    // CHAR(255) utf8mb4 = 1020 bytes: STRING metadata steals the 0x30
    // bits of the type byte for length bits 8-9 → (0xce, 0xfc)
    val charMeta = (0xce << 8) | 0xfc
    w.tableMap(2L, "d", "t",
      Seq(ColType.Varchar, ColType.StringT),
      Seq(300, charMeta), Seq(true, true), Seq("a", "b"))
    w.writeRows(2L, Seq(Array(long, "y" * 260)))
    val got = MysqlBinlog.readFile(w.bytes())
      .collect { case (_, e: WriteRows) => e }.head.rows.head
    assert(got(0) == long)
    assert(got(1) == "y" * 260)
  }

  test("startFilter gates by binlog file/position and skips " +
      "gtid-contained transactions whole") {
    val w = new MysqlBinlogWriter()
    w.fde()
    w.tableMap(9L, "d", "t", Seq(ColType.Long), Seq(0), Seq(true),
      colNames = Seq("id"))
    def txn(gno: Long, id: String): Unit = {
      w.gtid("3e11fa47-71ca-11e1-9e33-c80aa9429562", gno)
      w.begin("d")
      w.writeRows(9L, Seq(Array(id)))
      w.xid(gno)
    }
    txn(1L, "1"); txn(2L, "2"); txn(3L, "3")
    val raw = MysqlBinlog.readFile(w.bytes())
    def ids(evs: Seq[(MysqlBinlog.EventHeader, MysqlBinlog.Event)])
        : Seq[String] =
      MysqlBinlog.toChangeEvents(evs, "binlog.000007")
        .map(_.after("id"))

    // no gate: everything
    assert(ids(MysqlBinlog.startFilter(raw, "binlog.000007")) ==
      Seq("1", "2", "3"))

    // file/pos gate: start after txn1's commit — its rows are gone
    val xid1Pos = raw.collect {
      case (h, _: MysqlBinlog.Xid) => h.nextPosition
    }.head
    assert(ids(MysqlBinlog.startFilter(raw, "binlog.000007",
      startFile = "binlog.000007", startPos = xid1Pos)) ==
      Seq("2", "3"))
    // an EARLIER start file gates nothing; a LATER one gates all
    assert(ids(MysqlBinlog.startFilter(raw, "binlog.000007",
      startFile = "binlog.000001", startPos = 999999L)) ==
      Seq("1", "2", "3"))
    assert(ids(MysqlBinlog.startFilter(raw, "binlog.000007",
      startFile = "binlog.000009", startPos = 0L)) == Nil)

    // gtid gate: the set already contains txns 1-2 -> only txn3 ships
    val done = graft.meta.GtidSet.parse(
      "3e11fa47-71ca-11e1-9e33-c80aa9429562:1-2")
    assert(ids(MysqlBinlog.startFilter(raw, "binlog.000007",
      doneGtids = Some(done))) == Seq("3"))
  }
}
