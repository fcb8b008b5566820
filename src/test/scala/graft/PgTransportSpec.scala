package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.{PgOutput, PgOutputWriter, PgSlotLifecycle}
import graft.transport._

/** The PG dial-and-pump state machine over [[FakeWire]] — the branches
  * the reference's PgCdcClient exercises against a live walsender
  * (pg_cdc_client.rs:219-291): startup + md5/cleartext auth, the
  * fetch-then-judge slot lifecycle, START_REPLICATION into COPY-both,
  * XLogData capture, standby acks, keepalive replies, and
  * reconnect-at-confirmed-LSN.
  */
class PgTransportSpec extends AnyFunSuite {
  import PgWire._

  // --------------------------------------------------- fixture helpers

  private def authOk: Array[Byte] =
    message('R', Array[Byte](0, 0, 0, 0))
  private def authCleartext: Array[Byte] =
    message('R', Array[Byte](0, 0, 0, 3))
  private def authMd5(salt: Array[Byte]): Array[Byte] =
    message('R', Array[Byte](0, 0, 0, 5) ++ salt)
  private def readyForQuery: Array[Byte] =
    message('Z', Array[Byte]('I'.toByte))
  private def commandComplete(tag: String): Array[Byte] =
    message('C', tag.getBytes("UTF-8") :+ 0.toByte)
  private def copyBoth: Array[Byte] =
    message('W', Array[Byte](0, 0, 0))

  private def rowDescription(cols: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((cols.size >> 8) & 0xff); out.write(cols.size & 0xff)
    cols.foreach { c =>
      out.write(c.getBytes("UTF-8")); out.write(0)
      out.write(new Array[Byte](18))
    }
    message('T', out.toByteArray)
  }

  private def dataRow(vals: Seq[String]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write((vals.size >> 8) & 0xff); out.write(vals.size & 0xff)
    vals.foreach { v =>
      if (v == null) out.write(Array[Byte](-1, -1, -1, -1))
      else {
        val b = v.getBytes("UTF-8")
        out.write((b.length >> 24) & 0xff); out.write((b.length >> 16) & 0xff)
        out.write((b.length >> 8) & 0xff); out.write(b.length & 0xff)
        out.write(b)
      }
    }
    message('D', out.toByteArray)
  }

  /** One simple-query cycle's reply: optional rows, complete, ready. */
  private def queryReply(cols: Seq[String],
      rows: Seq[Seq[String]]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    if (cols.nonEmpty) out.write(rowDescription(cols))
    rows.foreach(r => out.write(dataRow(r)))
    out.write(commandComplete("SELECT " + rows.size))
    out.write(readyForQuery)
    out.toByteArray
  }

  private val slotCfg = PgSlotLifecycle.SlotConfig("graft_slot")
  private def config(startLsn: String = "") =
    PgReplicationPump.Config("repl", "pw", "db",
      slotCfg.copy(startLsn = startLsn), ackEveryFrames = 2)

  test("md5Password matches the published double-md5 construction") {
    val msg = md5Password("u", "p", Array[Byte](1, 2, 3, 4))
    val s = new String(msg, java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.contains("md5facdc455923b0a58efea84a6d9ee0e76"))
  }

  test("startup message requests a replication=database session") {
    val s = new String(startup("repl", "db"),
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(s.contains("user\u0000repl\u0000"))
    assert(s.contains("database\u0000db\u0000"))
    assert(s.contains("replication\u0000database\u0000"))
  }

  test("lsn text <-> 64-bit round trip") {
    assert(parseLsn("16/B374D848") == (0x16L << 32 | 0xB374D848L))
    assert(renderLsn(parseLsn("16/B374D848")) == "16/B374D848")
    assert(parseLsn("0/0") == 0L)
  }

  test("happy path: md5 auth, existing slot resumes at " +
      "confirmed_flush_lsn, frames land and decode, acks carry the " +
      "advancing flush LSN, keepalive reply honored") {
    val w = new PgOutputWriter()
    val cols = Seq(
      PgOutput.RelColumn("id", keyPart = true, typeOid = 20, typeMod = -1),
      PgOutput.RelColumn("v", false, 25, -1))
    w.begin(0x16000100L, 0L, 1L)
    w.relation(16385L, "app", "t", 'd', cols)
    w.insert(16385L, Array("1", "a"))
    w.insert(16385L, Array("2", "b"))
    w.keepalive(replyRequested = true)
    w.commit(0x16000100L, 0x16000200L, 0L)
    val stream = w.bytes()

    val wire = new FakeWire
    wire.serve(authMd5(Array[Byte](9, 8, 7, 6)))
    wire.serve(authOk)
    wire.serve(readyForQuery)
    // pub exists (1 row), slot exists with confirmed_flush_lsn
    wire.serve(queryReply(Seq("pubname"),
      Seq(Seq("graft_slot_publication_for_all_tables"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    // no lifecycle statements (slot resumes); two SETs
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    wire.serve(stream)
    wire.serve(message('c', Array.emptyByteArray)) // CopyDone

    val store = new MemorySegmentStore
    val pump = new PgReplicationPump(config(), store, () => wire,
      clockMicros = () => 42L)
    val n = pump.runSession()
    assert(n > 0)

    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // md5 auth answered with the salted hash
    assert(sentStr.contains("md5"))
    // session GUCs exactly as the reference sets them
    assert(sentStr.contains("SET extra_float_digits=3"))
    assert(sentStr.contains("SET TIME ZONE 'UTC'"))
    // resumed at the slot's confirmed LSN with proto v1 options
    assert(sentStr.contains(
      "START_REPLICATION SLOT graft_slot LOGICAL 0/16000000 " +
        """("proto_version" '1', "publication_names" """ +
        "'graft_slot_publication_for_all_tables')"))
    // acks: 'r' status updates inside CopyData, flushed LSN past the
    // start point, clock stamped from the injected clock (42)
    val acks = {
      val sent = wire.sentBytes
      val found = scala.collection.mutable.ArrayBuffer[(Long, Long)]()
      var i = 0
      while (i + 39 <= sent.length) {
        if (sent(i) == 'd' && sent(i + 5) == 'r') {
          def be(off: Int): Long = {
            var v = 0L
            (0 until 8).foreach(j => v = (v << 8) | (sent(off + j) & 0xffL))
            v
          }
          found += ((be(i + 14), be(i + 30))) // flushedLsn, clock
        }
        i += 1
      }
      found.toSeq
    }
    assert(acks.nonEmpty)
    assert(acks.forall(_._2 == 42L))
    assert(acks.last._1 >= parseLsn("0/16000000"))
    // the captured segment decodes through the existing decoder
    assert(store.names == Seq("pgoutput.000001.log"))
    val events = PgOutput.decodeFile(store.bytesOf("pgoutput.000001.log"))
    assert(events.map(e => (e.rowType, e.after("id"))) ==
      Seq(("insert", "1"), ("insert", "2")))
    // flush watermark advanced past the start LSN
    assert(pump.flushedLsn > parseLsn("0/16000000"))
  }

  test("missing slot: lifecycle creates publication + slot and streams " +
      "from the returned consistent_point") {
    val wire = new FakeWire
    wire.serve(authCleartext)
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Nil)) // no publication
    wire.serve(queryReply(Seq("slot_name"), Nil)) // no slot
    // CREATE PUBLICATION, then CREATE_REPLICATION_SLOT returning
    // consistent_point
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(
      Seq("slot_name", "consistent_point", "snapshot_name",
        "output_plugin"),
      Seq(Seq("graft_slot", "1/AB000000", "snap", "pgoutput"))))
    wire.serve(queryReply(Nil, Nil)) // SET float digits
    wire.serve(queryReply(Nil, Nil)) // SET time zone
    wire.serve(copyBoth)
    wire.serve(message('c', Array.emptyByteArray))

    val pump = new PgReplicationPump(config(), new MemorySegmentStore,
      () => wire)
    pump.runSession()
    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("pw\u0000")) // cleartext password message
    assert(sentStr.contains("CREATE PUBLICATION " +
      "graft_slot_publication_for_all_tables FOR ALL TABLES"))
    assert(sentStr.contains(
      """CREATE_REPLICATION_SLOT graft_slot LOGICAL "pgoutput""""))
    assert(sentStr.contains("LOGICAL 1/AB000000"))
    assert(pump.flushedLsn == parseLsn("1/AB000000"))
  }

  test("slot lifecycle errors and unsupported auth surface as " +
      "IOExceptions") {
    // GSSAPI (code 7) is not implemented: fail loudly, not silently
    val wire = new FakeWire
    wire.serve(message('R', Array[Byte](0, 0, 0, 7)))
    val pump = new PgReplicationPump(config(), new MemorySegmentStore,
      () => wire)
    val e = intercept[java.io.IOException](pump.runSession())
    assert(e.getMessage.contains("unsupported pg auth method 7"))
    // a SASL offer with only unsupported mechanisms fails loudly too
    val wireS = new FakeWire
    wireS.serve(message('R', Array[Byte](0, 0, 0, 10) ++
      "SCRAM-SHA-256-PLUS\u0000\u0000".getBytes("UTF-8")))
    val pumpS = new PgReplicationPump(config(), new MemorySegmentStore,
      () => wireS)
    val eS = intercept[IllegalArgumentException](pumpS.runSession())
    assert(eS.getMessage.contains("no supported SASL mechanism"))

    val wire2 = new FakeWire
    wire2.serve(authOk)
    wire2.serve(readyForQuery)
    wire2.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire2.serve(queryReply(Seq("slot_name"), Nil))
    // CREATE_REPLICATION_SLOT fails
    val err = new java.io.ByteArrayOutputStream()
    err.write('S'); err.write("ERROR".getBytes); err.write(0)
    err.write('M'); err.write("permission denied".getBytes); err.write(0)
    err.write(0)
    wire2.serve(message('E', err.toByteArray))
    wire2.serve(readyForQuery)
    val pump2 = new PgReplicationPump(config(), new MemorySegmentStore,
      () => wire2)
    val e2 = intercept[java.io.IOException](pump2.runSession())
    assert(e2.getMessage.contains("permission denied"))
  }

  test("reconnect re-reads slot state and resumes at the server's " +
      "confirmed_flush_lsn") {
    def session(wire: FakeWire, confirmed: String,
        frames: Array[Byte], done: Boolean): Unit = {
      wire.serve(authOk)
      wire.serve(readyForQuery)
      wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
      wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
        Seq(Seq("graft_slot", confirmed))))
      wire.serve(queryReply(Nil, Nil))
      wire.serve(queryReply(Nil, Nil))
      wire.serve(copyBoth)
      wire.serve(frames)
      if (done) wire.serve(message('c', Array.emptyByteArray))
    }
    val w1 = new PgOutputWriter()
    w1.begin(0x16000100L, 0L, 1L)
    val w2 = new PgOutputWriter()
    w2.commit(0x16000100L, 0x16000200L, 0L)

    val wire1 = new FakeWire
    session(wire1, "0/16000000", w1.bytes(), done = false)
    wire1.failAfter(wire1.remaining) // dies after the begin frame
    val wire2 = new FakeWire
    session(wire2, "0/16000050", w2.bytes(), done = true)

    val wires = scala.collection.mutable.Queue[FakeWire](wire1, wire2)
    val store = new MemorySegmentStore
    val pump = new PgReplicationPump(config(), store,
      () => wires.dequeue())
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    pump.run(until = () => pump.framesAppended >= 2,
      sleep = sleeps += _)
    assert(pump.reconnects == 1)
    assert(sleeps == Seq(500L))
    val sent2 = new String(wire2.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    // the second session started at the RE-READ confirmed LSN
    assert(sent2.contains("LOGICAL 0/16000050"))
    // both frames landed across the two sessions
    assert(pump.framesAppended == 2)
  }

  test("SCRAM-SHA-256 computation matches the RFC 7677 vectors " +
      "byte-exactly") {
    // RFC 7677 §3: user=user, pass=pencil, the published exchange
    val ex = Scram.Exchange("user", "pencil", "rOprNGfwEbeRWgbNEkqO")
    assert(ex.clientFirst == "n,,n=user,r=rOprNGfwEbeRWgbNEkqO")
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)" +
      "hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val (clientFinal, serverSig) = ex.clientFinal(serverFirst)
    assert(clientFinal ==
      "c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(serverSig == "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // a server nonce that does not extend the client's is an attack
    intercept[IllegalArgumentException] {
      ex.clientFinal("r=evil,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096")
    }
  }

  test("SCRAM end-to-end: the pump completes the SASL exchange " +
      "against PG-14-default auth and rejects a forged server " +
      "signature") {
    def authSasl: Array[Byte] = message('R',
      Array[Byte](0, 0, 0, 10) ++
        "SCRAM-SHA-256\u0000\u0000".getBytes("UTF-8"))
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)" +
      "hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    def saslContinue: Array[Byte] = message('R',
      Array[Byte](0, 0, 0, 11) ++ serverFirst.getBytes("UTF-8"))
    def saslFinal(sig: String): Array[Byte] = message('R',
      Array[Byte](0, 0, 0, 12) ++ s"v=$sig".getBytes("UTF-8"))
    val goodSig = "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="

    val wire = new FakeWire
    wire.serve(authSasl)
    wire.serve(saslContinue)
    wire.serve(saslFinal(goodSig))
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    wire.serve(message('c', Array.emptyByteArray))
    val cfg = PgReplicationPump.Config("user", "pencil", "db",
      slotCfg, nonce = () => "rOprNGfwEbeRWgbNEkqO")
    val pump = new PgReplicationPump(cfg, new MemorySegmentStore,
      () => wire)
    pump.runSession()
    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("SCRAM-SHA-256"))
    assert(sentStr.contains("n,,n=user,r=rOprNGfwEbeRWgbNEkqO"))
    assert(sentStr.contains(
      "p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ="))

    // forged server signature → refuse to stream
    val wire2 = new FakeWire
    wire2.serve(authSasl)
    wire2.serve(saslContinue)
    wire2.serve(saslFinal("Zm9yZ2VkIHNpZ25hdHVyZSEhISEhISEhISEhISE="))
    val pump2 = new PgReplicationPump(cfg, new MemorySegmentStore,
      () => wire2)
    val e = intercept[java.io.IOException](pump2.runSession())
    assert(e.getMessage.contains("server signature mismatch"))
  }

  test("segment rotation is txn-aligned and size-capped: each " +
      "rotated segment is independently decodable with its relations " +
      "re-emitted") {
    val wire = new FakeWire
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    val cols = Seq(
      PgOutput.RelColumn("id", keyPart = true, typeOid = 20, typeMod = -1),
      PgOutput.RelColumn("v", false, 25, -1))
    val w = new PgOutputWriter()
    // relation arrives ONCE (session semantics); three committed txns
    w.begin(0x16000100L, 0L, 1L)
    w.relation(16385L, "app", "t", 'd', cols)
    w.insert(16385L, Array("1", "a"))
    w.commit(0x16000100L, 0x16000200L, 0L)
    (2 to 3).foreach { i =>
      w.begin(0x16000100L + i * 0x100, 0L, i.toLong)
      w.insert(16385L, Array(i.toString, "x"))
      w.commit(0x16000100L + i * 0x100, 0x16000200L + i * 0x100, 0L)
    }
    wire.serve(w.bytes())
    wire.serve(message('c', Array.emptyByteArray))

    val store = new MemorySegmentStore
    val cfg = PgReplicationPump.Config("u", "p", "db", slotCfg,
      ackEveryFrames = 1000, maxSegmentBytes = 10L) // size forces
    val pump = new PgReplicationPump(cfg, store, () => wire)
    pump.runSession()
    // one segment per committed txn (size cap trips at every commit
    // boundary, NEVER mid-txn)
    assert(store.names.size == 3)
    store.names.zipWithIndex.foreach { case (seg, i) =>
      val events = PgOutput.decodeFile(store.bytesOf(seg))
      // every segment decodes ALONE: the cached Relation was
      // re-emitted, so rows resolve their columns
      assert(events.map(_.after("id")) == Seq((i + 1).toString))
    }
  }

  test("max_segment_secs: a quiet stream's captured txn publishes on " +
      "a keepalive tick instead of waiting for the next data frame") {
    var now = 0L
    val clock = () => { now += 700L; now }
    val wire = new FakeWire
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    val cols = Seq(
      PgOutput.RelColumn("id", keyPart = true, typeOid = 20,
        typeMod = -1),
      PgOutput.RelColumn("v", false, 25, -1))
    val w = new PgOutputWriter()
    w.begin(0x16000100L, 0L, 1L)
    w.relation(16385L, "app", "t", 'd', cols)
    w.insert(16385L, Array("1", "a"))
    w.commit(0x16000100L, 0x16000200L, 0L)
    // …then the stream goes QUIET: only server keepalives arrive
    (1 to 3).foreach(_ => w.keepalive(replyRequested = false))
    wire.serve(w.bytes())
    wire.serve(message('c', Array.emptyByteArray))

    val inner = new MemorySegmentStore
    val published = scala.collection.mutable.ArrayBuffer[String]()
    val store = new SegmentStore {
      override def append(n: String, b: Array[Byte]): Unit =
        inner.append(n, b)
      override def names: Seq[String] = inner.names
      override def bytesOf(n: String): Array[Byte] = inner.bytesOf(n)
      override def publish(n: String): Unit = { published += n }
      override def discard(n: String): Unit = inner.discard(n)
    }
    // frame/size thresholds unreachable — only the time arm can fire
    val pump = new PgReplicationPump(
      PgReplicationPump.Config("u", "p", "db", slotCfg,
        ackEveryFrames = 1000, maxSegmentSecs = 1L, clockMs = clock),
      store, () => wire)
    pump.runSession()
    // the txn's segment PUBLISHED on a keepalive tick, and the
    // keepalive-only tail never published a junk segment — not per
    // tick, not at session end
    assert(published.toSeq == Seq("pgoutput.000001.log"))
    val events = PgOutput.decodeFile(inner.bytesOf(published.head))
    assert(events.map(_.after("id")) == Seq("1"))
  }

  test("a NEW pump instance over an existing capture dir continues " +
      "segment numbering — restarts never reuse a published name") {
    val dir = java.nio.file.Files
      .createTempDirectory("pg-seg-resume").toString
    val store = new FsSegmentStore(dir)
    store.append("pgoutput.000001.log", Array[Byte](1))
    store.publish("pgoutput.000001.log")
    store.append("pgoutput.000002.log", Array[Byte](2))
    store.publish("pgoutput.000002.log")
    // fresh pump (a restarted task) must start at 000003: the stream
    // checkpoint's offset is the NAME, so a reused name is invisible
    val store2 = new FsSegmentStore(dir)
    assert(SegmentNames.lastIndex(store2, "pgoutput") == 2)
    val pump = new PgReplicationPump(config(), store2,
      () => new FakeWire)
    assert(pump.segmentIndex == 3)
  }

  // ------------------------------------------------------------- TLS

  test("sslmode=require: the 8-byte SSLRequest preamble precedes " +
      "startup; a server answering 'N' fails loudly") {
    val wire = new FakeWire
    wire.serve("N".getBytes("ascii"))
    val pump = new PgReplicationPump(
      config().copy(sslMode = "require"), new MemorySegmentStore,
      () => wire)
    val e = intercept[java.io.IOException](pump.runSession())
    assert(e.getMessage.contains("refused"))
    // the preamble is the ONLY thing written — no plaintext startup
    assert(wire.sentBytes.toSeq ==
      Seq[Byte](0, 0, 0, 8, 0x04, 0xd2.toByte, 0x16, 0x2f))
  }

  test("sslmode=require: 'S' upgrades the wire, then the startup and " +
      "slot lifecycle run over the upgraded channel") {
    val wire = new FakeWire
    wire.serve("S".getBytes("ascii"))
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    wire.serve(message('c', Array.emptyByteArray)) // CopyDone
    var upgrades = 0
    val pump = new PgReplicationPump(
      config().copy(sslMode = "require",
        tlsUpgrade = (w0, mode) => {
          upgrades += 1
          assert(mode == "required")
          w0
        }),
      new MemorySegmentStore, () => wire)
    pump.runSession()
    assert(upgrades == 1)
    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("START_REPLICATION"))
  }

  test("sslmode=prefer downgrades to plaintext on 'N' and still " +
      "streams") {
    val wire = new FakeWire
    wire.serve("N".getBytes("ascii"))
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    wire.serve(message('c', Array.emptyByteArray))
    val pump = new PgReplicationPump(
      config().copy(sslMode = "prefer",
        tlsUpgrade = (_, _) => fail("must not upgrade")),
      new MemorySegmentStore, () => wire)
    pump.runSession()
    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("START_REPLICATION"))
  }

  test("a reconnect DISCARDS the dead session's unpublished spool: " +
      "the re-streamed frames land once, not appended after stale " +
      "copies") {
    val cols = Seq(
      PgOutput.RelColumn("id", keyPart = true, typeOid = 20,
        typeMod = -1),
      PgOutput.RelColumn("v", false, 25, -1))
    def serve(wire: FakeWire, frames: Array[Byte],
        done: Boolean): Unit = {
      wire.serve(authOk)
      wire.serve(readyForQuery)
      wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
      wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
        Seq(Seq("graft_slot", "0/16000000"))))
      wire.serve(queryReply(Nil, Nil))
      wire.serve(queryReply(Nil, Nil))
      wire.serve(copyBoth)
      wire.serve(frames)
      if (done) wire.serve(message('c', Array.emptyByteArray))
    }
    // session 1 captures a PARTIAL txn (begin + insert, no commit)
    // into the spool, then the wire dies
    val w1 = new PgOutputWriter()
    w1.begin(0x16000100L, 0L, 1L)
    w1.relation(16385L, "app", "t", 'd', cols)
    w1.insert(16385L, Array("1", "a"))
    // session 2: the server re-sends EVERYTHING after
    // confirmed_flush (= nothing published yet), now complete
    val w2 = new PgOutputWriter()
    w2.begin(0x16000100L, 0L, 1L)
    w2.relation(16385L, "app", "t", 'd', cols)
    w2.insert(16385L, Array("1", "a"))
    w2.commit(0x16000100L, 0x16000200L, 0L)

    val wire1 = new FakeWire
    serve(wire1, w1.bytes(), done = false)
    wire1.failAfter(wire1.remaining)
    val wire2 = new FakeWire
    serve(wire2, w2.bytes(), done = true)
    val wires = scala.collection.mutable.Queue[FakeWire](wire1, wire2)

    val inner = new MemorySegmentStore
    val published = scala.collection.mutable.ArrayBuffer[String]()
    val store = new SegmentStore {
      override def append(n: String, b: Array[Byte]): Unit =
        inner.append(n, b)
      override def names: Seq[String] = inner.names
      override def bytesOf(n: String): Array[Byte] = inner.bytesOf(n)
      override def publish(n: String): Unit = { published += n; () }
      override def discard(n: String): Unit = inner.discard(n)
    }
    val pump = new PgReplicationPump(config(), store,
      () => wires.dequeue())
    pump.run(until = () => published.nonEmpty, sleep = _ => ())
    // the dead session's spool (000001) was discarded, never
    // published; the complete re-stream landed under a FRESH name
    assert(published == Seq("pgoutput.000002.log"), published)
    assert(inner.names == Seq("pgoutput.000002.log"), inner.names)
    // and it decodes to exactly ONE insert — the pre-r15 append-
    // after-stale shape landed the begin/relation/insert twice
    val events = PgOutput.decodeFile(
      inner.bytesOf("pgoutput.000002.log"))
    assert(events.map(e => (e.rowType, e.after("id"))) ==
      Seq(("insert", "1")))
  }

  test("rotation waits for v2 STREAMED transactions to drain: " +
      "chunks of an in-progress streamed txn never split across " +
      "segments") {
    val cols = Seq(
      PgOutput.RelColumn("id", keyPart = true, typeOid = 20,
        typeMod = -1),
      PgOutput.RelColumn("v", false, 25, -1))
    val w = new PgOutputWriter()
    w.relation(16385L, "app", "t", 'd', cols)
    // chunk 1 of xid 9, then a pause, then chunk 2, then the commit
    w.streamStart(9L, firstSegment = true)
    w.streamAs(9L)
    w.insert(16385L, Array("1", "a"))
    w.streamStop()
    w.streamStart(9L, firstSegment = false)
    w.streamAs(9L)
    w.insert(16385L, Array("2", "b"))
    w.streamStop()
    w.streamCommit(9L, 0x16000100L, 0x16000200L, 0L)

    val wire = new FakeWire
    wire.serve(authOk)
    wire.serve(readyForQuery)
    wire.serve(queryReply(Seq("pubname"), Seq(Seq("p"))))
    wire.serve(queryReply(Seq("slot_name", "confirmed_flush_lsn"),
      Seq(Seq("graft_slot", "0/16000000"))))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(queryReply(Nil, Nil))
    wire.serve(copyBoth)
    wire.serve(w.bytes())
    wire.serve(message('c', Array.emptyByteArray))

    val inner = new MemorySegmentStore
    val published = scala.collection.mutable.ArrayBuffer[String]()
    val store = new SegmentStore {
      override def append(n: String, b: Array[Byte]): Unit =
        inner.append(n, b)
      override def names: Seq[String] = inner.names
      override def bytesOf(n: String): Array[Byte] = inner.bytesOf(n)
      override def publish(n: String): Unit = { published += n; () }
      override def discard(n: String): Unit = inner.discard(n)
    }
    // ackEveryFrames = 1: WITHOUT the streamed-txn guard every frame
    // between the chunks would rotate, stranding chunk 1 in a segment
    // whose Stream Commit never arrives (lost rows)
    val pump = new PgReplicationPump(
      PgReplicationPump.Config("u", "p", "db", slotCfg,
        ackEveryFrames = 1),
      store, () => wire)
    pump.runSession()
    assert(published.size >= 1 && published.distinct == published)
    // the streamed txn's frames all sit in ONE segment, and that
    // segment replays to both rows at the commit
    val withTxn = published.filter { n =>
      val evs = PgOutput.decodeFile(inner.bytesOf(n))
      evs.nonEmpty
    }
    assert(withTxn.size == 1, s"streamed txn split: $published")
    val events = PgOutput.decodeFile(inner.bytesOf(withTxn.head))
    assert(events.map(_.after("id")) == Seq("1", "2"))
  }
}
