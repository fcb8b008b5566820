package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Checker
import graft.sources.PgOutput
import graft.sources.PgOutput.RelColumn
import graft.sources.PgOutputWriter

/** Property battery for the pgoutput replay contract: for ANY random
  * mix of plain and protocol-v2 streamed transactions — arbitrary row
  * values (NULL, unchanged-TOAST, empty, unicode), interleaved stream
  * segments, subtransaction and whole-transaction aborts, sprinkled
  * keepalives — encode → decodeCopyStream → toChangeEvents emits
  * exactly the committed rows: plain transactions at their stream
  * position, streamed transactions replayed whole at their commits in
  * commit order, aborted work invisible.
  *
  * The model is built from the generated TRANSACTION SCRIPT alone
  * (never from the decoder's internals), so it checks the replay
  * semantics, not the implementation against itself. Raw ScalaCheck
  * generators under fixed seeds (CompactionPropertySpec discipline).
  */
class PgOutputPropertySpec extends AnyFunSuite {

  private def sample[T](g: Gen[T], seed: Long): T =
    g.apply(Gen.Parameters.default, Seed(seed))
      .getOrElse(sys.error("gen failed"))

  private val cellGen: Gen[String] = Gen.frequency(
    2 -> Gen.const(null),
    1 -> Gen.const(Checker.ToastSentinel),
    1 -> Gen.const(""),
    4 -> Gen.choose(0, 12).flatMap(n => Gen.listOfN(n,
      Gen.oneOf(Gen.alphaNumChar, Gen.oneOf(' ', 'é', '中', '\'')))
      .map(_.mkString)),
    2 -> Gen.choose(-1000000L, 1000000L).map(_.toString))

  private sealed trait Op
  private final case class Ins(rel: Int, values: Array[String]) extends Op
  private final case class Upd(rel: Int, oldKind: Option[Char],
      old: Option[Array[String]], nw: Array[String]) extends Op
  private final case class Del(rel: Int, oldKind: Char,
      old: Array[String]) extends Op
  private final case class Trunc(rels: Seq[Int]) extends Op

  /** subXid offset 0 = the top-level xid itself. */
  private final case class TxOp(op: Op, subOffset: Int)
  private final case class Tx(xid: Long, ops: Seq[TxOp], streamed: Boolean,
      segments: Int, abortWhole: Boolean, abortSub: Boolean)

  private val rels: Seq[(Long, String, Seq[String])] = Seq(
    (16385L, "users", Seq("id", "name", "note")),
    (16386L, "événements", Seq("k", "payload")))

  private def rowGen(rel: Int): Gen[Array[String]] =
    Gen.sequence[Array[String], String](
      rels(rel)._3.map(_ => cellGen))

  private def opGen: Gen[Op] = Gen.choose(0, rels.size - 1).flatMap { r =>
    Gen.frequency(
      5 -> rowGen(r).map(Ins(r, _)),
      3 -> (for {
        withOld <- Gen.oneOf(true, false)
        kind <- Gen.oneOf('K', 'O')
        old <- rowGen(r); nw <- rowGen(r)
      } yield Upd(r, if (withOld) Some(kind) else None,
        if (withOld) Some(old) else None, nw)),
      2 -> (for { kind <- Gen.oneOf('K', 'O'); old <- rowGen(r) }
        yield Del(r, kind, old)),
      1 -> Gen.someOf(rels.indices).suchThat(_.nonEmpty)
        .map(rs => Trunc(rs.toSeq)))
  }

  private def txGen(xid: Long): Gen[Tx] = for {
    n <- Gen.choose(1, 6)
    ops <- Gen.listOfN(n, opGen)
    subs <- Gen.listOfN(n, Gen.frequency(3 -> Gen.const(0),
      1 -> Gen.const(1)))
    streamed <- Gen.oneOf(true, false)
    segments <- Gen.choose(1, 3)
    abortWhole <- Gen.frequency(4 -> Gen.const(false),
      1 -> Gen.const(true))
    abortSub <- Gen.frequency(3 -> Gen.const(false), 1 -> Gen.const(true))
  } yield Tx(xid, ops.zip(subs).map { case (o, s) => TxOp(o, s) },
    streamed, segments, abortWhole = streamed && abortWhole,
    abortSub = streamed && abortSub)

  private val scriptGen: Gen[Seq[Tx]] = for {
    k <- Gen.choose(1, 5)
    txs <- Gen.sequence[Seq[Tx], Tx](
      (0 until k).map(i => txGen(100L + i * 10)))
  } yield txs

  private def writeOp(w: PgOutputWriter, op: Op): Unit = op match {
    case Ins(r, v) => w.insert(rels(r)._1, v)
    case Upd(r, k, o, nw) => w.update(rels(r)._1, k, o, nw)
    case Del(r, k, o) => w.delete(rels(r)._1, k, o)
    case Trunc(rs) => w.truncate(cascade = false,
      restartIdentity = false, rs.map(rels(_)._1))
  }

  /** Expected (tb, row_type, before, after) rows for one tx's
    * SURVIVING ops, in stream order.
    */
  private def expect(tx: Tx): Seq[(String, String, Map[String, String],
      Map[String, String])] = {
    val survivors =
      if (tx.abortWhole) Seq.empty
      else tx.ops.filterNot(o => tx.abortSub && o.subOffset == 1)
    def img(rel: Int, v: Array[String]): Map[String, String] =
      rels(rel)._3.zip(v).toMap
    survivors.flatMap(_.op match {
      case Ins(r, v) =>
        Seq((rels(r)._2, "insert", Map.empty[String, String], img(r, v)))
      case Upd(r, _, o, nw) =>
        Seq((rels(r)._2, "update",
          o.map(img(r, _)).getOrElse(Map.empty), img(r, nw)))
      case Del(r, _, o) =>
        Seq((rels(r)._2, "delete", img(r, o), Map.empty[String, String]))
      case Trunc(rs) => rs.map(r =>
        (rels(r)._2, "truncate", Map.empty[String, String],
          Map.empty[String, String]))
    })
  }

  private def runScript(seed: Long): Unit = {
    val txs = sample(scriptGen, seed)
    val commitOrder = sample(Gen.const(txs.filter(_.streamed))
      .flatMap(s => Gen.pick(s.size, s).map(_.toSeq)), seed + 1)

    val w = new PgOutputWriter()
    rels.foreach { case (id, name, cols) =>
      w.relation(id, "public", name, 'd',
        cols.zipWithIndex.map { case (c, i) =>
          RelColumn(c, keyPart = i == 0, 23, -1) })
    }
    var lsn = 0x1000L
    // plain txns serialize first, at their script positions
    txs.filterNot(_.streamed).foreach { tx =>
      w.begin(lsn + 0x100, 0L, tx.xid)
      tx.ops.foreach(o => writeOp(w, o.op))
      w.commit(lsn, lsn + 0x100, 0L)
      lsn += 0x200
    }
    // streamed txns interleave their segments round-robin
    val streamed = txs.filter(_.streamed)
    val chunks: Map[Long, Seq[Seq[TxOp]]] = streamed.map { tx =>
      val per = math.max(1,
        (tx.ops.size + tx.segments - 1) / tx.segments)
      tx.xid -> tx.ops.grouped(per).toSeq
    }.toMap
    val maxSeg = if (chunks.isEmpty) 0 else chunks.values.map(_.size).max
    (0 until maxSeg).foreach { seg =>
      streamed.foreach { tx =>
        chunks(tx.xid).lift(seg).foreach { ops =>
          w.streamStart(tx.xid, firstSegment = seg == 0)
          ops.foreach { o =>
            w.streamAs(tx.xid + o.subOffset)
            writeOp(w, o.op)
          }
          w.streamStop()
          if (seg == 0 && sample(Gen.oneOf(true, false), seed + tx.xid))
            w.keepalive(replyRequested = false)
        }
      }
    }
    // aborts, then commits in the drawn order
    commitOrder.foreach { tx =>
      if (tx.abortSub) w.streamAbort(tx.xid, tx.xid + 1)
      if (tx.abortWhole) w.streamAbort(tx.xid, tx.xid)
      else { w.streamCommit(tx.xid, lsn, lsn + 0x100, 0L); lsn += 0x200 }
    }

    val evs = PgOutput.toChangeEvents(
      PgOutput.decodeCopyStream(w.bytes()), startLsn = "0/0")
    val expected =
      txs.filterNot(_.streamed).flatMap(expect) ++
        commitOrder.filterNot(_.abortWhole).flatMap(expect)
    assert(evs.map(e => (e.tb, e.rowType, e.before, e.after)) == expected,
      s"seed=$seed txs=${txs.map(t =>
        (t.xid, t.streamed, t.abortWhole, t.abortSub, t.ops.size))}")
  }

  test("random transaction scripts replay to exactly the committed " +
      "rows in commit order") {
    (1L to 80L).foreach(runScript)
  }
}
