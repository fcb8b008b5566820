package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.GtidSet

class GtidSetSpec extends AnyFunSuite {

  private val U1 = "3e11fa47-71ca-11e1-9e33-c80aa9429562"
  private val U2 = "aaaaaaaa-bbbb-cccc-dddd-eeeeeeeeeeee"

  test("streaming adds extend and merge intervals") {
    val s = new GtidSet()
    s.add(s"$U1:1").add(s"$U1:2").add(s"$U1:3")
    assert(s.render == s"$U1:1-3")
    s.add(s"$U1:7")
    assert(s.render == s"$U1:1-3:7")
    s.add(s"$U1:5")
    assert(s.render == s"$U1:1-3:5:7")
    s.add(s"$U1:4") // bridges 1-3 and 5
    assert(s.render == s"$U1:1-5:7")
    s.add(s"$U1:6") // bridges everything
    assert(s.render == s"$U1:1-7")
  }

  test("multiple source ids render sorted; case normalizes") {
    val s = new GtidSet()
    s.add(s"${U2.toUpperCase}:3").add(s"$U1:1").add(s"$U2:4")
    assert(s.render == s"$U1:1,$U2:3-4")
  }

  test("parse round-trips the canonical form and merges overlaps") {
    assert(GtidSet.parse(s"$U1:1-5:7,$U2:3").render ==
      s"$U1:1-5:7,$U2:3")
    assert(GtidSet.parse(s"$U1:1-3:2-6").render == s"$U1:1-6")
    assert(GtidSet.parse("").isEmpty)
    assert(GtidSet.parse(s"$U1:1-5").contains(s"$U1:4"))
    assert(!GtidSet.parse(s"$U1:1-5").contains(s"$U1:6"))
  }

  test("resume continuation: parse committed set, keep adding") {
    val s = GtidSet.parse(s"$U1:1-100")
    s.add(s"$U1:101")
    assert(s.render == s"$U1:1-101")
  }

  test("binlog bridge accumulates the full set across transactions") {
    import graft.sources.MysqlBinlog.ColType
    val w = new graft.sources.MysqlBinlogWriter()
    w.fde()
    w.tableMap(5L, "d", "t", Seq(ColType.LongLong), Seq(0), Seq(false),
      Seq("id"))
    w.gtid(U1, 1L)
    w.writeRows(5L, Seq(Array("1")))
    w.xid(1L)
    w.gtid(U1, 2L)
    w.writeRows(5L, Seq(Array("2")))
    w.xid(2L)
    val evts = graft.sources.MysqlBinlog.decodeFile(w.bytes(), "b.1")
    assert(evts(0).positionValue.endsWith(s"gtid=$U1:1"))
    assert(evts(1).positionValue.endsWith(s"gtid=$U1:1-2"))
  }
}
