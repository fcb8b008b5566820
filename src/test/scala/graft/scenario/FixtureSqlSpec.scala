package graft.scenario

import org.scalatest.funsuite.AnyFunSuite

import FixtureSql._

/** The scenario harness must itself be trustworthy: the fixture-SQL
  * interpreter's parse and the full-state comparator are pinned here,
  * including the NEGATIVE paths (a harness whose comparator cannot
  * fail proves nothing).
  */
class FixtureSqlSpec extends AnyFunSuite {

  test("statement split honors quotes, backticks, and comments") {
    val stmts = splitStatements(
      """-- leading comment
        |INSERT INTO d.t VALUES ('a;b', 'it''s');
        |UPDATE d.t SET v='x' -- trailing comment
        |  WHERE id=1;
        |""".stripMargin)
    assert(stmts.size == 2)
    assert(stmts.head.contains("a;b"))
  }

  test("values canonicalize: numbers, hex, escapes, NULL") {
    assert(parseValue("NULL") == null)
    assert(parseValue("123456.1234") == "123456.1234")
    assert(parseValue("50.00") == "50")
    assert(parseValue("x'0123456789ABCDEF'") == "hex:0123456789abcdef")
    assert(parseValue("'it''s'") == "it's")
    assert(parseValue("'a\\'b'") == "a'b")
  }

  test("create table extracts cols, pk, uks incl backticked names") {
    val CreateTable(d) = parseStatement(
      "CREATE TABLE db1.t (`p:k` tinyint, f_1 smallint, f_2 int, " +
        "PRIMARY KEY(`p:k`), UNIQUE KEY uk_1 (f_1,f_2)) " +
        "ENGINE=InnoDB DEFAULT CHARSET=utf8mb4"): @unchecked
    assert(d.cols == Seq("p:k", "f_1", "f_2"))
    assert(d.pk == Seq("p:k"))
    assert(d.uks == Seq(Seq("f_1", "f_2")))
    assert(d.keyCols == Seq("p:k"))
  }

  test("keyCols falls back to the first unique key, then empty") {
    val CreateTable(uk) = parseStatement(
      "CREATE TABLE d.t (a int, b int, UNIQUE KEY u1 (b))"): @unchecked
    assert(uk.keyCols == Seq("b"))
    val CreateTable(none) = parseStatement(
      "CREATE TABLE d.t (a int, b int)"): @unchecked
    assert(none.keyCols.isEmpty)
  }

  test("interpreter end state and emitted row images agree with SQL " +
      "semantics (update images carry before AND after)") {
    val s = new SourceState
    s.applyAll(parseScript(
      """CREATE DATABASE d;
        |CREATE TABLE d.t (id int, v varchar(10), PRIMARY KEY(id));
        |INSERT INTO d.t VALUES (1,'a'),(2,'b');
        |UPDATE d.t SET v='a2' WHERE id=1;
        |DELETE FROM d.t WHERE id=2;
        |""".stripMargin))
    assert(s.rows(("d", "t")).toList ==
      List(Map("id" -> "1", "v" -> "a2")))
    val kinds = s.events.map(_.rowType).toList
    assert(kinds == List("insert", "insert", "update", "delete"))
    val upd = s.events.find(_.rowType == "update").get
    assert(upd.before("v") == "a" && upd.after("v") == "a2")
    val del = s.events.find(_.rowType == "delete").get
    assert(del.before("id") == "2" && del.after.isEmpty)
  }

  test("WHERE: `=` is never true against NULL; IS NULL and IN work") {
    val row = Map("a" -> (null: String), "b" -> "2")
    assert(!parseWhere(Some("a=1")).matches(row))
    assert(parseWhere(Some("a IS NULL AND b=2")).matches(row))
    assert(parseWhere(Some("b IN (1,2,3)")).matches(row))
    assert(!parseWhere(Some("b IN (4)")).matches(row))
  }

  test("NEGATIVE: the state comparator raises on missing, extra, and " +
      "value-differing rows — and passes order-insensitively") {
    val a = Seq(Map("id" -> "1", "v" -> "x"), Map("id" -> "2", "v" -> "y"))
    // pass: same multiset, different order
    ScenarioRunner.compareStates("t", a, a.reverse)
    // value difference
    val e1 = intercept[RuntimeException] {
      ScenarioRunner.compareStates("t", a,
        Seq(Map("id" -> "1", "v" -> "x"), Map("id" -> "2", "v" -> "z")))
    }
    assert(e1.getMessage.contains("mismatch"))
    // missing row
    intercept[RuntimeException] {
      ScenarioRunner.compareStates("t", a, a.take(1))
    }
    // extra row
    intercept[RuntimeException] {
      ScenarioRunner.compareStates("t", a,
        a :+ Map("id" -> "3", "v" -> "w"))
    }
    // NULL vs 'null' string must differ
    intercept[RuntimeException] {
      ScenarioRunner.compareStates("t",
        Seq(Map("v" -> (null: String))), Seq(Map("v" -> "null")))
    }
  }
}
