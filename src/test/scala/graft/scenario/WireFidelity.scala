package graft.scenario

import scala.collection.mutable

import graft.sources.{MysqlBinlog, MysqlBinlogWriter, PgOutput,
  PgOutputWriter}
import graft.sources.MysqlBinlog.ColType

import FixtureSql._

/** Wire-fidelity lane for the scenario corpus: instead of handing the
  * pipeline the synthesized row-image stream directly, mysql CDC
  * scenarios encode it into a REAL binlog v4 file ([[MysqlBinlogWriter]])
  * and re-extract it through the production decoder ([[MysqlBinlog]]);
  * pg CDC scenarios ride pgoutput the same way ([[PgOutputWriter]] →
  * [[PgOutput]]). The decoded stream is asserted EVENT-IDENTICAL to the
  * synthesized one and then replaces it downstream — so every scenario
  * exercises the byte-level extract path the reference's test runner
  * exercises against a live server (dt-tests/tests/test_runner/
  * rdb_test_runner.rs drives real binlog/wal replication; here the
  * writer stands in for the server, the decoder is the code under test).
  *
  * Canonicalization contract: fixture values are FixtureSql canonicals
  * (numbers BigDecimal-stripped, blobs `hex:<lower>`, datetimes with
  * NO trailing fractional zeros). The binlog decoder renders typed
  * values at full declared scale ("123.1200", six-digit datetime
  * fractions); [[canonical]] folds that rendering back per declared
  * type. Fixtures must keep datetime fractions trimmed or the
  * round-trip equality check fails loudly (by design).
  */
object WireFidelity {

  /** The server uuid the encoder stamps on GTID events. */
  final val EncoderUuid = "3e11fa47-71ca-11e1-9e33-c80aa9429562"

  private val Paren = "\\(([^)]*)\\)".r

  private def baseOf(declared: String): String =
    declared.trim.toLowerCase.takeWhile(_.isLetter)

  private def argsOf(declared: String): Seq[Int] =
    Paren.findFirstMatchIn(declared)
      .map(_.group(1).split(",").toSeq.map(_.trim)
        .filter(_.forall(_.isDigit)).filter(_.nonEmpty).map(_.toInt))
      .getOrElse(Nil)

  private def isBlob(declared: String): Boolean = baseOf(declared) match {
    case "blob" | "tinyblob" | "mediumblob" | "longblob" | "binary" |
      "varbinary" => true
    case _ => false
  }

  /** Declared fixture type → (binlog ColType, meta, signed) — the
    * column spec a server's TableMap would carry (table_map_event
    * metadata layout; decoded by MysqlBinlog.decodeValue).
    */
  def mysqlColSpec(declared: String): (Int, Int, Boolean) = {
    val signed = !declared.toLowerCase.contains("unsigned")
    val args = argsOf(declared)
    baseOf(declared) match {
      case "tinyint" | "bool" | "boolean" => (ColType.Tiny, 0, signed)
      case "smallint" => (ColType.Short, 0, signed)
      case "mediumint" => (ColType.Int24, 0, signed)
      case "int" | "integer" => (ColType.Long, 0, signed)
      case "bigint" => (ColType.LongLong, 0, signed)
      case "year" => (ColType.Year, 0, signed)
      case "float" => (ColType.Float, 4, signed)
      case "double" | "real" => (ColType.Double, 8, signed)
      case "decimal" | "numeric" =>
        val p = args.headOption.getOrElse(10)
        val s = if (args.size > 1) args(1) else 0
        (ColType.NewDecimal, (p << 8) | s, signed)
      case "date" => (ColType.Date, 0, signed)
      case "datetime" =>
        (ColType.DateTime2, args.headOption.getOrElse(0), signed)
      case "timestamp" =>
        (ColType.Timestamp2, args.headOption.getOrElse(0), signed)
      case "time" =>
        (ColType.Time2, args.headOption.getOrElse(0), signed)
      case "varchar" | "char" | "text" | "tinytext" | "mediumtext" |
        "longtext" =>
        // utf8mb4 byte budget: length*4 picks the 1- vs 2-byte
        // length prefix exactly like the server's metadata does
        (ColType.Varchar, args.headOption.getOrElse(255) * 4, signed)
      case _ if isBlob(declared) => (ColType.Blob, 2, signed)
      case other => sys.error(
        s"no binlog codec mapping for fixture column type: $other")
    }
  }

  /** Fixture canonical → the string rendering the writer's codecs
    * expect (MysqlBinlogWriter values are MysqlBinlog's renderings).
    */
  private def toWire(declared: String, v: Value): String =
    if (v == null) null
    else if (isBlob(declared)) v.stripPrefix("hex:")
    else v

  /** Decoder rendering → fixture canonical, per declared type. */
  def canonical(declared: String, v: String): Value =
    if (v == null) null
    else baseOf(declared) match {
      case _ if isBlob(declared) => "hex:" + v
      case "decimal" | "numeric" | "float" | "double" | "real" =>
        new java.math.BigDecimal(v).stripTrailingZeros.toPlainString
      case "datetime" | "timestamp" | "time" if v.contains('.') =>
        v.reverse.dropWhile(_ == '0').reverse.stripSuffix(".")
      case _ => v
    }

  // ---- shared def-evolution replay (both the encoder and the decoder
  // walk evolve table shapes the way SourceState did)
  private def evolve(defs: mutable.Map[(String, String), TableDef],
      db: String, tb: String, sql: String): Unit =
    graft.meta.DdlParser.parse(sql).foreach {
      case a: graft.meta.DdlParser.AlterTable =>
        defs((db, tb)) = evolveDef(defs((db, tb)),
          graft.meta.AlterParser.parse(a.alteration))
      case _: graft.meta.DdlParser.TruncateTable => ()
      case other => sys.error(s"unsupported wire-lane DDL: $other")
    }

  private def ddlTarget(defaultDb: String, sql: String)
      : (String, String) =
    graft.meta.DdlParser.parse(sql).headOption match {
      case Some(a: graft.meta.DdlParser.AlterTable) =>
        (a.db.getOrElse(defaultDb), a.tb)
      case Some(t: graft.meta.DdlParser.TruncateTable) =>
        (t.db.getOrElse(defaultDb), t.tb)
      case other => sys.error(s"unsupported wire-lane DDL shape: $other")
    }

  private def rowArr(d: TableDef, declared: Seq[String],
      img: Map[String, Value]): Array[String] =
    d.cols.zip(declared).map { case (c, t) =>
      toWire(t, img.getOrElse(c, null))
    }.toArray

  /** Encode the synthesized CDC stream as a binlog v4 file, decode it
    * with the production decoder, assert event-identity, and return
    * the decoded stream carrying the original sequence numbers.
    *
    * `gtidSet`: when the task configures `[extractor] gtid_set`, the
    * decode applies [[MysqlBinlog.startFilter]]'s GTID gate — whole
    * transactions the set contains are skipped at the wire, exactly
    * the server's auto-skip on reconnect. The encoder assigns gno =
    * the 1-based ROW-event ordinal, so the expected survivor list is
    * derivable from the synthesized stream and asserted.
    */
  /** The binlog v4 byte stream a server would emit for the
    * synthesized source — the shared encode half of the round-trip
    * and the LIVE-scenario wire body (ScenarioRunner serves these
    * bytes over a scripted dump session).
    */
  def mysqlBinlogBytes(src: SourceState): Array[Byte] =
    encodeMysql(src).bytes()

  private def encodeMysql(src: SourceState): MysqlBinlogWriter = {
    val all = src.events.toSeq
    val w = new MysqlBinlogWriter()
    w.fde()
    val defs = mutable.LinkedHashMap[(String, String), TableDef]()
    src.createdDefs.foreach { case (k, d) => defs(k) = d }
    val tableIds = mutable.LinkedHashMap[(String, String), Long]()
    var gno = 0L
    all.foreach { e =>
      if (e.rowType == "ddl") {
        // a statement-based event: the server binlogs DDL as a Query
        // event in its own transaction (mysql_cdc_extractor's
        // QueryEvent lane)
        w.query(e.db, e.ddlText)
        evolve(defs, e.db, e.tb, e.ddlText)
      } else {
        val d = defs((e.db, e.tb))
        val declared = d.typesOr
        val specs = declared.map(mysqlColSpec)
        val id = tableIds.getOrElseUpdate((e.db, e.tb),
          tableIds.size + 23L)
        gno += 1
        w.gtid(EncoderUuid, gno)
        def body(wr: MysqlBinlogWriter): Unit = {
          wr.begin(e.db)
          // a TableMap precedes every rows event in a real binlog
          // (and re-describes the table after DDL evolved it)
          wr.tableMap(id, e.db, e.tb, specs.map(_._1),
            specs.map(_._2), nullable = d.cols.map(_ => true),
            colNames = d.cols, signed = specs.map(_._3))
          e.rowType match {
            case "insert" =>
              wr.writeRows(id, Seq(rowArr(d, declared, e.after)))
            case "update" =>
              wr.updateRows(id, Seq((rowArr(d, declared, e.before),
                rowArr(d, declared, e.after))))
            case "delete" =>
              wr.deleteRows(id, Seq(rowArr(d, declared, e.before)))
            case other => sys.error(s"unexpected row type $other")
          }
          wr.xid(gno)
        }
        // every third transaction ships inside a MySQL 8.0
        // Transaction_payload envelope (ZSTD-compressed), so the
        // scenario stream also covers the compressed-txn decode path
        if (gno % 3 == 0) w.transactionPayload(zstd = true)(body)
        else body(w)
        // a server rotates binlog files mid-stream; every fifth txn a
        // Rotate event switches the decoder's file context (position
        // bookkeeping rides it — toChangeEvents tracks the filename).
        // A real server opens the NEXT file with its own FDE — and
        // the live pump cuts capture segments at rotate boundaries,
        // so the FDE is what makes a post-rotate segment
        // independently decodable
        if (gno % 5 == 0) {
          w.rotate(4L, f"binlog.${gno / 5 + 1}%06d")
          w.fde()
        }
      }
    }
    w
  }

  def mysqlRoundTrip(src: SourceState,
      gtidSet: Option[String] = None): Seq[Event] = {
    val all = src.events.toSeq
    val done = gtidSet.map(graft.meta.GtidSet.parse)
    val want =
      if (done.isEmpty) all
      else {
        // drop row events whose gno (1-based row ordinal) the set
        // contains; DDL rides Query events without a gtid and stays
        var gno = 0L
        all.filter { e =>
          if (e.rowType == "ddl") true
          else {
            gno += 1
            !done.get.contains(s"$EncoderUuid:$gno")
          }
        }
      }
    val w = encodeMysql(src)
    // ---- decode walk: the extractor loop (TableMap cache → row
    // images; Query → DDL), values folded back to fixture canonicals
    val decoded = mutable.ArrayBuffer[Event]()
    val tms = mutable.Map[Long, MysqlBinlog.TableMap]()
    val ddefs = mutable.LinkedHashMap[(String, String), TableDef]()
    src.createdDefs.foreach { case (k, d) => ddefs(k) = d }
    def imgOf(tm: MysqlBinlog.TableMap, row: Array[String])
        : Map[String, Value] = {
      val d = ddefs((tm.schema, tm.table))
      val names = if (tm.colNames.nonEmpty) tm.colNames else d.cols
      names.zip(row).zip(d.typesOr).map { case ((n, v), t) =>
        n -> canonical(t, v)
      }.toMap
    }
    def walk(ev: MysqlBinlog.Event): Unit = ev match {
      case tm: MysqlBinlog.TableMap => tms(tm.tableId) = tm
      case MysqlBinlog.Query(_, schema, sql) if sql != "BEGIN" =>
        val (db, tb) = ddlTarget(schema, sql)
        decoded += Event(db, tb, 0L, "ddl", Map.empty, Map.empty, sql)
        evolve(ddefs, db, tb, sql)
      case MysqlBinlog.WriteRows(id, _, rows) =>
        val tm = tms(id)
        rows.foreach(r => decoded += Event(tm.schema, tm.table, 0L,
          "insert", Map.empty, imgOf(tm, r)))
      case MysqlBinlog.UpdateRows(id, _, _, rows) =>
        val tm = tms(id)
        rows.foreach { case (b, a) => decoded += Event(tm.schema,
          tm.table, 0L, "update", imgOf(tm, b), imgOf(tm, a)) }
      case MysqlBinlog.DeleteRows(id, _, rows) =>
        val tm = tms(id)
        rows.foreach(r => decoded += Event(tm.schema, tm.table, 0L,
          "delete", imgOf(tm, r), Map.empty))
      case MysqlBinlog.TransactionPayload(inner) =>
        inner.foreach { case (_, ie) => walk(ie) }
      case _ => () // FDE/Gtid/Xid/BEGIN-Query: no row images
    }
    val decodedStream = done match {
      case None => MysqlBinlog.readFile(w.bytes())
      case Some(set) => MysqlBinlog.startFilter(
        MysqlBinlog.readFile(w.bytes()), "binlog.000001",
        doneGtids = Some(set))
    }
    decodedStream.foreach { case (_, ev) => walk(ev) }

    spliceAndCheck(want, decoded.toSeq, "binlog")
  }

  /** Same contract over pgoutput. DDL does not ride pgoutput (the
    * reference captures pg DDL out-of-band via event triggers), so DDL
    * events splice back at their original positions around the
    * wire-decoded row stream.
    */
  def pgRoundTrip(src: SourceState): Seq[Event] = {
    val want = src.events.toSeq
    val w = pgOutputWriterOf(src)
    val decoded = PgOutput.decodeFile(w.bytes()).map { ce =>
      Event(ce.schema, ce.tb, 0L, ce.rowType, ce.before, ce.after)
    }
    // splice DDL events back before comparing
    val it = decoded.iterator
    val merged = want.map { e =>
      if (e.rowType == "ddl") e else it.next()
    }
    require(!it.hasNext, "pgoutput round-trip yielded extra events")
    spliceAndCheck(want, merged, "pgoutput")
  }

  /** The raw pgoutput frame stream for a source history — shared by
    * the round-trip check above and the live-pg scenario harness
    * (which wraps it in a scripted walsender session).
    */
  def pgOutputBytes(src: SourceState): Array[Byte] =
    pgOutputWriterOf(src).bytes()

  private def pgOutputWriterOf(src: SourceState): PgOutputWriter = {
    val want = src.events.toSeq
    val w = new PgOutputWriter()
    val defs = mutable.LinkedHashMap[(String, String), TableDef]()
    src.createdDefs.foreach { case (k, d) => defs(k) = d }
    val relIds = mutable.LinkedHashMap[(String, String), Long]()
    var xid = 700L
    var lsn = 0x16000000L
    want.foreach { e =>
      if (e.rowType == "ddl") evolve(defs, e.db, e.tb, e.ddlText)
      else {
        val d = defs((e.db, e.tb))
        val relId = relIds.getOrElseUpdate((e.db, e.tb),
          relIds.size + 16384L)
        xid += 1; lsn += 0x100
        // every fourth transaction rides protocol v2 streaming
        // (Stream Start/Stop + Stream Commit), so the scenario also
        // covers the streamed-transaction reassembly path
        val streamed = xid % 4 == 0
        if (streamed) w.streamStart(xid, firstSegment = true)
        else w.begin(lsn, commitMicros = 0L, xid)
        // REPLICA IDENTITY FULL: relation re-described per txn (and
        // after DDL), old images ship the full before row ('O')
        w.relation(relId, e.db, e.tb, 'f',
          d.cols.map(c => PgOutput.RelColumn(c,
            keyPart = d.keyCols.contains(c), typeOid = 25,
            typeMod = -1)))
        val arr = (img: Map[String, Value]) =>
          d.cols.map(c => img.getOrElse(c, null: Value)).toArray
        e.rowType match {
          case "insert" => w.insert(relId, arr(e.after))
          case "update" =>
            w.update(relId, Some('O'), Some(arr(e.before)),
              arr(e.after))
          case "delete" => w.delete(relId, 'O', arr(e.before))
          case other => sys.error(s"unexpected row type $other")
        }
        if (streamed) {
          w.streamStop()
          w.streamCommit(xid, lsn, lsn + 0x10, 0L)
        } else w.commit(lsn, lsn + 0x10, 0L)
      }
    }
    w
  }

  /** Renumber the decoded stream with the synthesized seqs and require
    * exact event equality — any codec/canonicalization drift fails the
    * scenario here, before the pipeline ever runs.
    */
  private def spliceAndCheck(want: Seq[Event], got: Seq[Event],
      wire: String): Seq[Event] = {
    require(got.size == want.size,
      s"$wire round-trip: ${got.size} events decoded, " +
        s"${want.size} synthesized")
    want.zip(got).map { case (w0, g0) =>
      val g = g0.copy(seq = w0.seq)
      require(g == w0,
        s"$wire round-trip mismatch:\n  decoded:     $g\n" +
          s"  synthesized: $w0")
      g
    }
  }
}
