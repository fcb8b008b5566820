package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.{ChangeEvent, RowKind}

class ChangeEventSpec extends AnyFunSuite {

  private def ev(rt: String, before: Map[String, String] = Map.empty,
      after: Map[String, String] = Map.empty) =
    ChangeEvent("app", "t", 0L, rt, before, after, "none", "", "n1")

  test("reverse inverts insert to delete, swapping images") {
    val e = ev(RowKind.Insert, after = Map("k" -> "1", "v" -> "a"))
    val r = e.reverse
    assert(r.rowType == RowKind.Delete)
    assert(r.before == Map("k" -> "1", "v" -> "a"))
    assert(r.after.isEmpty)
    assert(r.reverse.rowType == RowKind.Insert)
  }

  test("reverse swaps update images") {
    val e = ev(RowKind.Update, Map("k" -> "1", "v" -> "old"),
      Map("k" -> "1", "v" -> "new"))
    val r = e.reverse
    assert(r.before("v") == "new" && r.after("v") == "old")
  }

  test("splitUpdate yields delete(before) then insert(after)") {
    val e = ev(RowKind.Update, Map("k" -> "1", "v" -> "old"),
      Map("k" -> "1", "v" -> "new"))
    val Seq(d, i) = e.splitUpdate
    assert(d.rowType == RowKind.Delete && d.before("v") == "old" &&
      d.after.isEmpty)
    assert(i.rowType == RowKind.Insert && i.after("v") == "new" &&
      i.before.isEmpty)
  }

  test("splitUpdate passes non-updates through") {
    val e = ev(RowKind.Insert, after = Map("k" -> "1"))
    assert(e.splitUpdate == Seq(e))
  }

  test("keyHash is 0 when any key col is NULL (unmergeable marker)") {
    val e = ev(RowKind.Insert, after = Map("a" -> "1"))
    assert(e.keyHash(Seq("a", "missing")) == 0L)
    assert(e.keyHash(Seq("a")) != 0L)
  }

  test("keyHash uses before image for update/delete") {
    val upd = ev(RowKind.Update, Map("k" -> "1"), Map("k" -> "2"))
    val del = ev(RowKind.Delete, Map("k" -> "1"))
    val ins = ev(RowKind.Insert, after = Map("k" -> "1"))
    assert(upd.keyHash(Seq("k")) == del.keyHash(Seq("k")))
    assert(ins.keyHash(Seq("k")) == del.keyHash(Seq("k")))
  }
}
