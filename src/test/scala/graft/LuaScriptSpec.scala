package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.model.ChangeEvent
import graft.transform.LuaScript

/** The embedded Lua interpreter against the reference's own scripts —
  * every docs/en/etl/lua.md example runs VERBATIM (no translation),
  * plus the dt-tests combined fixture shape
  * (dt-tests/tests/mysql_to_mysql_lua/snapshot/basic_test) and the
  * language-surface corners those scripts rely on.
  */
class LuaScriptSpec extends AnyFunSuite {

  private def ev(schema: String = "lua_test", tb: String = "t",
      rowType: String = "insert",
      before: Map[String, String] = Map.empty,
      after: Map[String, String] = Map.empty): ChangeEvent =
    ChangeEvent(schema, tb, 0L, rowType, before, after, "none", "", "")

  private def run(code: String, e: ChangeEvent): Option[ChangeEvent] =
    LuaScript.rowTransform(code)(e)

  // ---------------------------------------------------- docs examples

  test("docs: add columns (verbatim)") {
    val code =
      """if (schema == "lua_test" and tb == "add_column_test" and row_type == "insert")
        |then
        |    after["new_column"] = 1000
        |end""".stripMargin
    val hit = run(code, ev(tb = "add_column_test",
      after = Map("f_0" -> "1"))).get
    assert(hit.after == Map("f_0" -> "1", "new_column" -> "1000"))
    val miss = run(code, ev(tb = "other", after = Map("f_0" -> "2"))).get
    assert(miss.after == Map("f_0" -> "2"))
  }

  test("docs: drop columns via nil assignment (verbatim)") {
    val code =
      """if (schema == "lua_test" and tb == "drop_column_test" and row_type == "insert")
        |then
        |    after["column_1"] = nil
        |end""".stripMargin
    val hit = run(code, ev(tb = "drop_column_test",
      after = Map("f_0" -> "1", "column_1" -> "x"))).get
    assert(hit.after == Map("f_0" -> "1"))
    // row_type guard: updates keep the column
    val upd = run(code, ev(tb = "drop_column_test", rowType = "update",
      before = Map("column_1" -> "x"),
      after = Map("column_1" -> "keep"))).get
    assert(upd.after == Map("column_1" -> "keep"))
  }

  test("docs: modify column values (verbatim)") {
    val code =
      """if (schema == "lua_test" and tb == "change_column_value_test" and row_type == "insert")
        |then
        |    after["column_1"] = "new_value"
        |end""".stripMargin
    val out = run(code, ev(tb = "change_column_value_test",
      after = Map("column_1" -> "old"))).get
    assert(out.after("column_1") == "new_value")
  }

  test("docs: change column name via copy+nil (verbatim)") {
    val code =
      """if (schema == "lua_test" and tb == "change_column_name_test" and row_type == "insert")
        |then
        |    after["f_1_1"] = after.f_1
        |    after["f_1"] = nil
        |end""".stripMargin
    val out = run(code, ev(tb = "change_column_name_test",
      after = Map("f_1" -> "v", "other" -> "o"))).get
    assert(out.after == Map("other" -> "o", "f_1_1" -> "v"))
  }

  test("docs: change table name (verbatim)") {
    val code =
      """if (schema == "lua_test" and tb == "change_table_name_test")
        |then
        |    tb = "change_table_name_test_dst"
        |end""".stripMargin
    assert(run(code, ev(tb = "change_table_name_test")).get.tb ==
      "change_table_name_test_dst")
    assert(run(code, ev(tb = "x")).get.tb == "x")
  }

  test("docs: filter rows by blanking row_type, with the timestamp " +
      "comparison and nil guards (verbatim)") {
    val code =
      """if schema == "lua_test" and tb == "filter_row_test" then
        |    if (after.create_time ~= nil and after.create_time < '2024-12-01 00:00:00') or
        |       (before.create_time ~= nil and before.create_time < '2024-12-01 00:00:00') then
        |        row_type = ""
        |    end
        |end""".stripMargin
    val dropped = run(code, ev(tb = "filter_row_test",
      after = Map("create_time" -> "2024-06-15 08:00:00")))
    assert(dropped.isEmpty)
    val kept = run(code, ev(tb = "filter_row_test",
      after = Map("create_time" -> "2025-01-01 00:00:00")))
    assert(kept.isDefined)
    // delete rows carry only a before image; the nil guard routes them
    val del = run(code, ev(tb = "filter_row_test", rowType = "delete",
      before = Map("create_time" -> "2024-06-15 08:00:00")))
    assert(del.isEmpty)
  }

  test("tutorial: numeric set over every row of the do_events stream") {
    val code =
      """if (schema == "test_db" and tb == "tb_1" and row_type == "insert")
        |then
        |    after["value"] = 10000
        |end""".stripMargin
    val out = run(code, ev(schema = "test_db", tb = "tb_1",
      after = Map("id" -> "1", "value" -> "1"))).get
    assert(out.after == Map("id" -> "1", "value" -> "10000"))
  }

  // ------------------------------------------- dt-tests fixture shape

  test("dt-tests basic script: combined multi-if chunk with the " +
      "numeric-id guard and the print/pairs tail runs verbatim") {
    // the structure of mysql_to_mysql_lua/snapshot/basic_test: several
    // guarded blocks plus a print/pairs dump at the end
    val code =
      """-- add column f_2
        |if (schema == "lua_test" and tb == "add_column_test")
        |then
        |    after.f_2 = 1000
        |end
        |
        |if (schema == "lua_test" and tb == "change_string_column_value_test")
        |then
        |    if (before.id == 1 or after.id == 1)
        |    then
        |        after.f_1 = "😀中文a"
        |    end
        |end
        |
        |if (schema == "lua_test" and tb == "filter_row_test")
        |then
        |    if (before.id == 1 or after.id == 1)
        |    then
        |        row_type = ""
        |    end
        |end
        |
        |print("schema: "..schema)
        |print("tb: "..tb)
        |for k, v in pairs(after) do
        |    print(k, v)
        |end""".stripMargin
    // the numeric guard works against the wire-format string image
    val mutated = run(code, ev(tb = "change_string_column_value_test",
      after = Map("id" -> "1", "f_1" -> "x"))).get
    assert(mutated.after("f_1") == "😀中文a")
    val other = run(code, ev(tb = "change_string_column_value_test",
      after = Map("id" -> "2", "f_1" -> "x"))).get
    assert(other.after("f_1") == "x")
    assert(run(code, ev(tb = "filter_row_test",
      after = Map("id" -> "1"))).isEmpty)
    assert(run(code, ev(tb = "add_column_test",
      after = Map("id" -> "9"))).get.after("f_2") == "1000")
  }

  test("print output is observable through the emit hook, in image " +
      "column order") {
    val chunk = LuaScript.parse(
      """print("tb: "..tb)
        |print("")
        |for k, v in pairs(after) do
        |    print(k, v)
        |end""".stripMargin)
    val lines = Seq.newBuilder[String]
    LuaScript.processEvent(chunk,
      ev(tb = "t1", after = Map("id" -> "1", "v" -> "x")), lines += _)
    assert(lines.result() == Seq("tb: t1", "", "id\t1", "v\tx"))
  }

  // ------------------------------------------------- language surface

  test("elseif/else, local, while, numeric for, break, concat") {
    val code =
      """local n = tonumber(after.n)
        |local label = ""
        |if n == nil then label = "none"
        |elseif n < 10 then label = "small"
        |elseif n < 100 then label = "medium"
        |else label = "large"
        |end
        |local sum = 0
        |for i = 1, 4 do
        |    sum = sum + i
        |end
        |local j = 0
        |while true do
        |    j = j + 1
        |    if j >= 3 then break end
        |end
        |after.label = label
        |after.sum = sum .. ":" .. j""".stripMargin
    val out = run(code, ev(after = Map("n" -> "42"))).get
    assert(out.after("label") == "medium")
    assert(out.after("sum") == "10:3")
    assert(run(code, ev(after = Map("n" -> "7"))).get
      .after("label") == "small")
    assert(run(code, ev(after = Map.empty)).get
      .after("label") == "none")
  }

  test("string and math library subset") {
    val code =
      """after.up = string.upper(after.s)
        |after.sub = string.sub(after.s, 2, 4)
        |after.tail = string.sub(after.s, -3)
        |after.len = string.len(after.s)
        |after.fmt = string.format("%s=%d", "x", 42)
        |after.fl = math.floor(3.9)
        |after.mx = math.max(2, 9, 4)""".stripMargin
    val out = run(code, ev(after = Map("s" -> "hello"))).get
    assert(out.after("up") == "HELLO")
    assert(out.after("sub") == "ell")
    assert(out.after("tail") == "llo")
    assert(out.after("len") == "5")
    assert(out.after("fmt") == "x=42")
    assert(out.after("fl") == "3")
    assert(out.after("mx") == "9")
  }

  test("number rendering matches Lua: integers bare, floats trimmed") {
    val code =
      """after.a = 1000
        |after.b = 3.14
        |after.c = 10 / 4
        |after.d = 7 // 2
        |after.e = 2^10""".stripMargin
    val out = run(code, ev()).get
    assert(out.after("a") == "1000")
    assert(out.after("b") == "3.14")
    assert(out.after("c") == "2.5")
    assert(out.after("d") == "3")
    assert(out.after("e") == "1024")
  }

  test("decimal string escapes and quotes (the pg fixture uses " +
      "backslash-escaped bytea renderings)") {
    val out = run("""after.b = '\\001\\002'
                    |after.q = 'it''s not lua escape'""".stripMargin
      .replace("''", "\\'"),
      ev()).get
    assert(out.after("b") == "\\001\\002")
    assert(out.after("q") == "it's not lua escape")
  }

  test("syntax errors fail at construction (driver), not per row") {
    val bad = intercept[LuaScript.LuaError](
      LuaScript.rowTransform("if tb == then end"))
    assert(bad.getMessage.contains("unexpected token"))
    val fn = intercept[LuaScript.LuaError](
      LuaScript.rowTransform("function f() end"))
    assert(fn.getMessage.contains("not supported"))
  }

  test("the sandbox has no os/io/require escape hatches") {
    intercept[LuaScript.LuaError](
      run("""os.execute("true")""", ev()))
    intercept[LuaScript.LuaError](
      run("""require("socket")""", ev()))
  }

  test("lua patterns: find/match/gsub/gmatch with real pattern " +
      "semantics, not regex") {
    val code =
      """local a, b = string.find(after.s, "%d+")
        |after.span = a .. ":" .. b
        |after.num = string.match(after.s, "%d+")
        |after.kv = string.match(after.s, "(%a+)=(%d+)")
        |local cleaned, n = string.gsub(after.s, "%s+", "_")
        |after.cleaned = cleaned
        |after.n = n
        |local words = ""
        |for w in string.gmatch(after.s, "%a+") do
        |    words = words .. w .. ","
        |end
        |after.words = words
        |-- lazy '-' and %b: strip one tag pair
        |after.tag = string.gsub(after.tags, "<(.-)>", "[%1]")
        |after.bal = string.match(after.expr, "%b()")""".stripMargin
    val out = run(code, ev(after = Map(
      "s" -> "count=42 more text",
      "tags" -> "<b>bold</b>",
      "expr" -> "f(a(b)c) tail"))).get
    assert(out.after("span") == "7:8")
    assert(out.after("num") == "42")
    // string.match with two captures truncates to the FIRST outside
    // a multi-assignment tail — Lua semantics
    assert(out.after("kv") == "count")
    assert(out.after("cleaned") == "count=42_more_text")
    assert(out.after("n") == "2")
    assert(out.after("words") == "count,more,text,")
    assert(out.after("tag") == "[b]bold[/b]")
    assert(out.after("bal") == "(a(b)c)")
  }

  test("lua patterns: multi-capture spread, anchors, classes, " +
      "plain find, back-reference") {
    val code =
      """local k, v = string.match(after.s, "(%a+)=(%d+)")
        |after.k = k
        |after.v = v
        |after.anchored = tostring(string.match(after.s, "^count") ~= nil)
        |after.notail = tostring(string.match(after.s, "xyz$") == nil)
        |local ps, pe = string.find(after.s, "t=4", 1, true)
        |after.plain = ps .. ":" .. pe
        |after.upper2 = string.gsub(after.s, "%u", "!")
        |after.dup = string.match(after.dups, "(%a+) %1")""".stripMargin
    val out = run(code, ev(after = Map(
      "s" -> "count=42 More",
      "dups" -> "go stop stop end"))).get
    assert(out.after("k") == "count" && out.after("v") == "42")
    assert(out.after("anchored") == "true")
    assert(out.after("notail") == "true")
    assert(out.after("plain") == "5:7")
    assert(out.after("upper2") == "count=42 !ore")
    assert(out.after("dup") == "stop")
  }

  test("table library: insert/concat/remove drive the accumulate-" +
      "and-join idiom") {
    val code =
      """local parts = {}
        |for w in string.gmatch(after.s, "%a+") do
        |    table.insert(parts, string.upper(w))
        |end
        |after.joined = table.concat(parts, "-")
        |table.insert(parts, 1, "HEAD")
        |after.first = parts[1]
        |after.n = #parts
        |local last = table.remove(parts)
        |after.last = last
        |after.n2 = #parts""".stripMargin
    val out = run(code, ev(after = Map("s" -> "red green blue"))).get
    assert(out.after("joined") == "RED-GREEN-BLUE")
    assert(out.after("first") == "HEAD")
    assert(out.after("n") == "4")
    assert(out.after("last") == "BLUE")
    assert(out.after("n2") == "3")
  }

  test("multiple assignment and table constructors") {
    val code =
      """local a, b = "1", "2"
        |after.x, after.y = b, a
        |local t = {k = "v", [1] = "one"}
        |after.z = t.k .. t[1]
        |after.n = #t""".stripMargin
    val out = run(code, ev()).get
    assert(out.after("x") == "2" && out.after("y") == "1")
    assert(out.after("z") == "vone")
    assert(out.after("n") == "1")
  }
}
