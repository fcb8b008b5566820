package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.RowKind
import graft.operators.Checker
import graft.sources.{PgOutput, PgOutputWriter}
import graft.sources.PgOutput._

/** pgoutput message battery — hand-built framed streams through
  * [[PgOutputWriter]], decoded by [[PgOutput]]; mirrors the message set
  * the reference dispatches (pg_cdc_extractor.rs:170-226) plus the
  * framing its client peels (pg_cdc_client.rs:219-291).
  */
class PgOutputSpec extends AnyFunSuite {

  private val Cols = Seq(
    RelColumn("id", keyPart = true, typeOid = 20, typeMod = -1),
    RelColumn("name", keyPart = false, typeOid = 25, typeMod = -1),
    RelColumn("payload", keyPart = false, typeOid = 25, typeMod = -1))

  private def writerWithRel(): PgOutputWriter = {
    val w = new PgOutputWriter()
    w.begin(0x1000L, 699_000_000_000_000L, 731L)
    w.relation(16385L, "public", "users", 'd', Cols)
    w
  }

  test("relation, insert, update modes, delete decode") {
    val w = writerWithRel()
    w.insert(16385L, Array("1", "alice", "p1"))
    // REPLICA IDENTITY DEFAULT: key unchanged → no old image
    w.update(16385L, None, None, Array("1", "alice2", "p1"))
    // key change → 'K' old image (key columns only, rest NULL)
    w.update(16385L, Some('K'), Some(Array("1", null, null)),
      Array("2", "alice2", "p1"))
    // REPLICA IDENTITY FULL → 'O' old image
    w.update(16385L, Some('O'), Some(Array("2", "alice2", "p1")),
      Array("2", "alice3", "p2"))
    w.delete(16385L, 'K', Array("2", null, null))
    w.commit(0x1000L, 0x1100L, 699_000_000_000_001L)

    val msgs = PgOutput.decodeCopyStream(w.bytes()).map(_._2)
    val rel = msgs.collect { case r: Relation => r }.head
    assert(rel.namespace == "public" && rel.name == "users")
    assert(rel.columns.map(_.name) == Seq("id", "name", "payload"))
    assert(rel.columns.map(_.keyPart) == Seq(true, false, false))
    assert(rel.replicaIdentity == 'd')

    val ins = msgs.collect { case i: Insert => i }.head
    assert(ins.newTuple.toSeq == Seq("1", "alice", "p1"))

    val ups = msgs.collect { case u: Update => u }
    assert(ups(0).oldKind.isEmpty && ups(0).oldTuple.isEmpty)
    assert(ups(1).oldKind.contains('K'))
    assert(ups(1).oldTuple.get.toSeq == Seq("1", null, null))
    assert(ups(2).oldKind.contains('O'))
    assert(ups(2).oldTuple.get.toSeq == Seq("2", "alice2", "p1"))

    val del = msgs.collect { case d: Delete => d }.head
    assert(del.oldKind == 'K' && del.oldTuple.toSeq == Seq("2", null, null))

    val begin = msgs.collect { case b: Begin => b }.head
    assert(begin.xid == 731L)
    val commit = msgs.collect { case c: Commit => c }.head
    assert(commit.endLsn == 0x1100L)
  }

  test("unchanged TOAST renders the tolerant-diff sentinel") {
    val w = writerWithRel()
    w.update(16385L, None, None,
      Array("1", "alice", Checker.ToastSentinel))
    w.commit(0x1000L, 0x1100L, 0L)
    val u = PgOutput.decodeCopyStream(w.bytes())
      .collect { case (_, m: Update) => m }.head
    assert(u.newTuple(2) == Checker.ToastSentinel)
  }

  test("keepalives interleave without desync; truncate and message decode") {
    val w = writerWithRel()
    w.keepalive(replyRequested = true)
    w.insert(16385L, Array("1", "a", null))
    w.keepalive(replyRequested = false)
    w.truncate(cascade = true, restartIdentity = false, Seq(16385L))
    w.logicalMessage(transactional = true, 0x2000L, "graft",
      "hello".getBytes)
    w.commit(0x1000L, 0x1100L, 0L)
    val msgs = PgOutput.decodeCopyStream(w.bytes()).map(_._2)
    val kas = msgs.collect { case k: Keepalive => k }
    assert(kas.map(_.replyRequested) == Seq(true, false))
    val t = msgs.collect { case t: Truncate => t }.head
    assert(t.cascade && !t.restartIdentity && t.relIds == Seq(16385L))
    val m = msgs.collect { case m: LogicalMessage => m }.head
    assert(m.prefix == "graft" && new String(m.content) == "hello")
    assert(msgs.collect { case i: Insert => i }.head.newTuple(2) == null)
  }

  test("LSN renders in the standard hi/lo hex form") {
    assert(PgOutput.renderLsn(0x16B374D848L) == "16/B374D848")
    assert(PgOutput.renderLsn(0x1L) == "0/1")
    assert(PgOutput.renderLsn(0xFFFFFFFF00000000L) == "FFFFFFFF/0")
  }

  test("decodeFile: ChangeEvents carry tx-anchored PgCdc positions") {
    val w = writerWithRel()
    w.insert(16385L, Array("1", "a", "x"))
    w.commit(0x1000L, 0x1100L, 0L)
    // second transaction: events anchor at the PREVIOUS commit end
    w.begin(0x2000L, 0L, 732L)
    w.update(16385L, Some('O'), Some(Array("1", "a", "x")),
      Array("1", "b", "x"))
    w.delete(16385L, 'K', Array("1", null, null))
    w.commit(0x2000L, 0x2200L, 0L)

    val evts = PgOutput.decodeFile(w.bytes(), startLsn = "0/0")
    assert(evts.map(_.rowType) ==
      Seq(RowKind.Insert, RowKind.Update, RowKind.Delete))
    assert(evts.forall(e => e.schema == "public" && e.tb == "users"))
    assert(evts.forall(_.positionKind == "pg_cdc"))
    // tx1 events anchor at startLsn; tx2 events at tx1's end LSN
    assert(evts(0).positionValue == "0/0")
    assert(evts(1).positionValue == "0/1100")
    assert(evts(2).positionValue == "0/1100")
    assert(evts(1).before == Map("id" -> "1", "name" -> "a", "payload" -> "x"))
    assert(evts(1).after == Map("id" -> "1", "name" -> "b", "payload" -> "x"))
    assert(evts(2).before("id") == "1")
  }

  test("truncate surfaces per-relation truncate events") {
    val w = writerWithRel()
    w.relation(16400L, "public", "audit", 'n',
      Seq(RelColumn("id", keyPart = true, 20, -1)))
    w.truncate(cascade = false, restartIdentity = true,
      Seq(16385L, 16400L))
    w.commit(0x1000L, 0x1100L, 0L)
    val evts = PgOutput.decodeFile(w.bytes())
    assert(evts.map(e => (e.tb, e.rowType)) ==
      Seq(("users", "truncate"), ("audit", "truncate")))
  }

  /** Strip the CopyData layer, keeping every inner frame concatenated. */
  private def stripCopyData(bytes: Array[Byte]): Array[Byte] = {
    var pos = 0
    val stripped = new java.io.ByteArrayOutputStream()
    while (pos < bytes.length) {
      val len = ((bytes(pos + 1) & 0xff) << 24) |
        ((bytes(pos + 2) & 0xff) << 16) |
        ((bytes(pos + 3) & 0xff) << 8) | (bytes(pos + 4) & 0xff)
      stripped.write(bytes, pos + 5, len - 4)
      pos += 1 + len
    }
    stripped.toByteArray
  }

  test("concatenated bare XLogData frames all decode — none swallowed") {
    val framed = writerWithRel()
    framed.insert(16385L, Array("9", "z", null))
    framed.commit(0x1000L, 0x1100L, 0L)
    val msgs = PgOutput.decodeCopyStream(stripCopyData(framed.bytes()))
    // pgoutput messages are self-delimiting: the first bare frame must
    // consume exactly its own message, not the rest of the capture
    val kinds = msgs.map(_._2.getClass.getSimpleName)
    assert(kinds == Seq("Begin", "Relation", "Insert", "Commit"), kinds)
  }

  test("v2 streaming: interleaved transactions replay at their commits") {
    val w = new PgOutputWriter()
    w.relation(16385L, "public", "users", 'd', Cols)
    // txn 100 streams its first segment
    w.streamStart(100L, firstSegment = true)
    w.insert(16385L, Array("1", "a", "x"))
    w.streamStop()
    // txn 200 interleaves
    w.streamStart(200L, firstSegment = true)
    w.insert(16385L, Array("2", "b", "y"))
    w.streamStop()
    // txn 100 streams more
    w.streamStart(100L, firstSegment = false)
    w.insert(16385L, Array("3", "c", "z"))
    w.streamStop()
    // 200 commits FIRST, then 100
    w.streamCommit(200L, 0x2000L, 0x2100L, 0L)
    w.streamCommit(100L, 0x3000L, 0x3100L, 0L)

    val msgs = PgOutput.decodeCopyStream(w.bytes())
    // wire shape: data inside segments is Streamed-wrapped with xid
    assert(msgs.collect {
      case (_, PgOutput.Streamed(x, _: PgOutput.Insert)) => x
    } == Seq(100L, 200L, 100L))

    val evs = PgOutput.toChangeEvents(msgs, startLsn = "0/0")
    // commit order wins: 200's row first, then 100's two in stream order
    assert(evs.map(_.after("id")) == Seq("2", "1", "3"))
    // position anchoring: 200's row keys at the capture start; 100's
    // rows key at 200's commit end (whole-txn replay contract)
    assert(evs.map(_.positionValue) == Seq(
      graft.model.Position.PgCdc("0/0").render,
      graft.model.Position.PgCdc("0/2100").render,
      graft.model.Position.PgCdc("0/2100").render))
  }

  test("v2 streaming: abort drops the whole txn or just a subxact") {
    val w = new PgOutputWriter()
    w.relation(16385L, "public", "users", 'd', Cols)
    // txn 300: top-level rows plus a subtransaction 301
    w.streamStart(300L, firstSegment = true)
    w.insert(16385L, Array("10", "a", "x"))
    w.streamAs(301L)
    w.insert(16385L, Array("11", "sub", "x"))
    w.streamAs(300L)
    w.insert(16385L, Array("12", "b", "x"))
    w.streamStop()
    w.streamAbort(300L, 301L) // subxact only
    w.streamCommit(300L, 0x2000L, 0x2100L, 0L)
    // txn 400 aborts entirely
    w.streamStart(400L, firstSegment = true)
    w.insert(16385L, Array("20", "gone", "x"))
    w.streamStop()
    w.streamAbort(400L, 400L)

    val evs = PgOutput.toChangeEvents(
      PgOutput.decodeCopyStream(w.bytes()))
    assert(evs.map(_.after("id")) == Seq("10", "12"))
  }

  test("v2 streaming: stream messages round-trip standalone") {
    import PgOutput._
    def roundtrip(bytes: Array[Byte]): Message = decodeMessage(bytes)
    val s = Array[Byte]('S', 0, 0, 0, 5, 1)
    assert(roundtrip(s) == StreamStart(5L, firstSegment = true))
    assert(roundtrip(Array[Byte]('E')) == StreamStop)
    val a = Array[Byte]('A', 0, 0, 0, 5, 0, 0, 0, 9)
    assert(roundtrip(a) == StreamAbort(5L, 9L))
    // streamed insert needs the inStream flag to place the xid
    val w = new PgOutputWriter()
    w.streamStart(7L, firstSegment = true)
    w.insert(1L, Array("1"))
    val msgs = decodeCopyStream(w.bytes())
    assert(msgs.last._2 match {
      case Streamed(7L, Insert(1L, t)) => t.sameElements(Array("1"))
      case _ => false
    })
  }

  test("trailing bytes after a framed message raise instead of dropping") {
    val framed = writerWithRel()
    val bytes = framed.bytes()
    // graft junk onto the last CopyData frame's payload and patch length
    val junk = Array[Byte](1, 2, 3)
    val out = java.util.Arrays.copyOf(bytes, bytes.length + junk.length)
    System.arraycopy(junk, 0, out, bytes.length, junk.length)
    // find the last frame start to patch its BE length field
    var pos = 0; var last = 0
    while (pos < bytes.length) {
      last = pos
      val len = ((bytes(pos + 1) & 0xff) << 24) |
        ((bytes(pos + 2) & 0xff) << 16) |
        ((bytes(pos + 3) & 0xff) << 8) | (bytes(pos + 4) & 0xff)
      pos += 1 + len
    }
    val oldLen = ((out(last + 1) & 0xff) << 24) |
      ((out(last + 2) & 0xff) << 16) |
      ((out(last + 3) & 0xff) << 8) | (out(last + 4) & 0xff)
    val newLen = oldLen + junk.length
    out(last + 1) = (newLen >>> 24).toByte
    out(last + 2) = (newLen >>> 16).toByte
    out(last + 3) = (newLen >>> 8).toByte
    out(last + 4) = newLen.toByte
    val err = intercept[IllegalArgumentException] {
      PgOutput.decodeCopyStream(out)
    }
    assert(err.getMessage.contains("not fully consumed"))
  }
}
