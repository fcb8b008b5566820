package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.transform.ScriptTransform

/** Every scripted example in the reference's Lua ETL documentation
  * (/root/reference/docs/en/etl/lua.md "Examples" + the lua_processor
  * contract, dt-pipeline/src/lua_processor.rs:16-57), translated 1:1
  * into the ScriptTransform DSL and pinned. The README's migration
  * table points here: a reference user's Lua script ports line for
  * line — `if cond then action end` becomes `when cond: action`,
  * `after["c"] = v` becomes `set after.c = v`, `after["c"] = nil`
  * becomes `remove after.c`, and `row_type = ""` becomes `drop if`.
  */
class LuaPortabilitySpec extends SparkSuite {

  private def envelope(rows: Seq[(String, String, String,
      Map[String, String], Map[String, String])]): DataFrame = {
    val sparkSession = spark
    import sparkSession.implicits._
    rows.toDF("schema", "tb", "row_type", "before", "after")
  }

  private def one(df: DataFrame): (String, String, String,
      Map[String, String], Map[String, String]) = {
    val r = df.collect()(0)
    (r.getString(0), r.getString(1), r.getString(2),
      r.getMap[String, String](3).toMap, r.getMap[String, String](4).toMap)
  }

  // Lua:
  //   if (schema == "lua_test" and tb == "add_column_test"
  //       and row_type == "insert") then
  //       after["new_column"] = 1000
  //   end
  test("add columns: guarded set matches the Lua add_column example") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'add_column_test' " +
        "and row_type = 'insert': set after.new_column = 1000")
    val in = envelope(Seq(
      ("lua_test", "add_column_test", "insert",
        Map.empty[String, String], Map("f_0" -> "1")),
      ("lua_test", "other_tb", "insert",
        Map.empty[String, String], Map("f_0" -> "2"))))
    val out = f(in).collect()
    assert(out(0).getMap[String, String](4).toMap ==
      Map("f_0" -> "1", "new_column" -> "1000"))
    // the guard: other tables pass through untouched
    assert(out(1).getMap[String, String](4).toMap == Map("f_0" -> "2"))
  }

  // Lua: after["column_1"] = nil
  test("drop columns: remove matches the Lua nil-assignment") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'drop_column_test' " +
        "and row_type = 'insert': remove after.column_1")
    val in = envelope(Seq(
      ("lua_test", "drop_column_test", "insert",
        Map.empty[String, String],
        Map("f_0" -> "1", "column_1" -> "x")),
      ("lua_test", "drop_column_test", "update",
        Map.empty[String, String],
        Map("f_0" -> "1", "column_1" -> "keep"))))
    val out = f(in).collect()
    assert(out(0).getMap[String, String](4).toMap == Map("f_0" -> "1"))
    // row_type guard: the update keeps its column
    assert(out(1).getMap[String, String](4).toMap ==
      Map("f_0" -> "1", "column_1" -> "keep"))
  }

  // Lua: after["column_1"] = "new_value"
  test("modify column values") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'change_column_value_test' " +
        "and row_type = 'insert': set after.column_1 = 'new_value'")
    val (_, _, _, _, after) = one(f(envelope(Seq(
      ("lua_test", "change_column_value_test", "insert",
        Map.empty[String, String], Map("column_1" -> "old"))))))
    assert(after == Map("column_1" -> "new_value"))
  }

  // Lua: after["f_1_1"] = after.f_1 ; after["f_1"] = nil
  test("change column name: rename (or the two-step Lua idiom)") {
    // the idiomatic DSL form
    val renamed = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'change_column_name_test' " +
        "and row_type = 'insert': rename after.f_1 to f_1_1")
    // the literal Lua translation (copy + nil)
    val twoStep = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'change_column_name_test' " +
        "and row_type = 'insert': set after.f_1_1 = after.f_1\n" +
      "when schema = 'lua_test' and tb = 'change_column_name_test' " +
        "and row_type = 'insert': remove after.f_1")
    val in = envelope(Seq(
      ("lua_test", "change_column_name_test", "insert",
        Map.empty[String, String], Map("f_1" -> "v", "f_2" -> "w"))))
    val want = Map("f_1_1" -> "v", "f_2" -> "w")
    assert(one(renamed(in))._5 == want)
    assert(one(twoStep(in))._5 == want)
  }

  // Lua: tb = "change_table_name_test_dst"
  test("change table name") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'change_table_name_test': " +
        "set tb = 'change_table_name_test_dst'")
    val out = f(envelope(Seq(
      ("lua_test", "change_table_name_test", "insert",
        Map.empty[String, String], Map("f_0" -> "1")),
      ("lua_test", "untouched", "insert",
        Map.empty[String, String], Map("f_0" -> "2"))))).collect()
    assert(out(0).getString(1) == "change_table_name_test_dst")
    assert(out(1).getString(1) == "untouched")
  }

  // Lua:
  //   if schema == "lua_test" and tb == "filter_row_test" then
  //     if (after.create_time ~= nil and
  //          after.create_time < '2024-12-01 00:00:00') or
  //        (before.create_time ~= nil and
  //          before.create_time < '2024-12-01 00:00:00') then
  //       row_type = ""
  //     end
  //   end
  test("filter rows: row_type='' becomes drop if, time literal intact") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 'filter_row_test': drop if " +
        "(after.create_time is not null and " +
        "after.create_time < '2024-12-01 00:00:00') or " +
        "(before.create_time is not null and " +
        "before.create_time < '2024-12-01 00:00:00')")
    val out = f(envelope(Seq(
      ("lua_test", "filter_row_test", "insert",
        Map.empty[String, String],
        Map("create_time" -> "2024-11-30 23:59:59")), // dropped
      ("lua_test", "filter_row_test", "insert",
        Map.empty[String, String],
        Map("create_time" -> "2024-12-02 10:00:00")), // kept
      ("lua_test", "filter_row_test", "delete",
        Map("create_time" -> "2024-11-01 00:00:00"),
        Map.empty[String, String]), // dropped on the before image
      ("lua_test", "other_tb", "insert",
        Map.empty[String, String],
        Map("create_time" -> "2024-01-01 00:00:00"))))) // guard: kept
    assert(f(envelope(Nil)).columns.length == 5)
    val rows = out.collect()
    assert(rows.length == 2)
    assert(rows.map(_.getString(1)).toSet == Set("filter_row_test",
      "other_tb"))
  }

  // Lua contract: change update data to insert data
  test("modify row type: update becomes insert for one table") {
    val f = ScriptTransform.sqlScript(
      "when tb = 'force_insert' and row_type = 'update': " +
        "set row_type = 'insert'")
    val out = f(envelope(Seq(
      ("s", "force_insert", "update",
        Map("id" -> "1"), Map("id" -> "1", "v" -> "2")),
      ("s", "other", "update",
        Map("id" -> "1"), Map("id" -> "1", "v" -> "2"))))).collect()
    assert(out(0).getString(2) == "insert")
    assert(out(1).getString(2) == "update")
  }

  // Lua: schema rename rides the same scalar-set shape
  test("modify schema name") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test': set schema = 'lua_test_dst'")
    val (sc, _, _, _, _) = one(f(envelope(Seq(
      ("lua_test", "t", "insert",
        Map.empty[String, String], Map("a" -> "1"))))))
    assert(sc == "lua_test_dst")
  }

  test("the whole-script plan stays codegen (no UDF in the plan)") {
    val f = ScriptTransform.sqlScript(
      "when schema = 'lua_test' and tb = 't': set after.x = 1\n" +
        "when tb = 't': remove after.y\n" +
        "drop if row_type = ''")
    val plan = f(envelope(Seq(("lua_test", "t", "insert",
      Map.empty[String, String], Map("y" -> "0"))))).
      queryExecution.executedPlan.toString
    assert(!plan.contains("BatchEvalPython"))
    assert(!plan.toLowerCase.contains("scalaudf"))
  }
}
