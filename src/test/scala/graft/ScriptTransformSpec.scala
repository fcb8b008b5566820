package graft

import org.apache.spark.sql.functions._

import graft.model.ChangeEvent
import graft.transform.{RowTransform, ScriptTransform}

/** User-script surface: the SQL-expression script (Catalyst path) and a
  * real JSR-223 engine script, both honoring the 5-global Lua contract
  * (mutate schema/tb/row_type/before/after, drop by blanking row_type).
  */
class ScriptTransformSpec extends SparkSuite {
  import spark.implicits._

  private def envelope = Seq(
    ("app", "orders", "insert", Map.empty[String, String],
      Map("id" -> "1", "name" -> "ada", "v" -> "10")),
    ("app", "orders", "delete", Map("id" -> "2", "name" -> "bob"),
      Map.empty[String, String]),
    ("app", "orders", "update", Map("id" -> "3", "name" -> "eve"),
      Map("id" -> "3", "name" -> "eve", "v" -> "-5")))
    .toDF("schema", "tb", "row_type", "before", "after")

  test("sql script: set/rename/drop statements compile to Catalyst") {
    val script =
      """# route to v2 and uppercase the name
        |set tb = concat(tb, '_v2')
        |set after.name = upper(after.name)
        |rename after.v to val
        |drop if row_type = 'update' and cast(after.val as int) < 0
        |""".stripMargin
    val out = ScriptTransform.sqlScript(script)(envelope)
      .orderBy("row_type")
      .select(col("tb"), col("row_type"),
        element_at(col("after"), "name").as("name"),
        element_at(col("after"), "val").as("val"))
      .as[(String, String, Option[String], Option[String])].collect()
    assert(out.toSeq == Seq(
      ("orders_v2", "delete", None, None),
      ("orders_v2", "insert", Some("ADA"), Some("10"))))
    // and it is pure Catalyst: no UDFs/objects in the plan
    val plan = ScriptTransform.sqlScript(script)(envelope)
      .queryExecution.executedPlan.toString
    assert(!plan.toLowerCase.contains("udf"))
  }

  test("sql script: image tokens inside string literals stay literal") {
    // 'after.foo' is a string literal, not a map reference; and the ''
    // escape must keep the scanner inside the literal.
    val out = ScriptTransform.sqlScript(
      "set tb = concat('after.foo', '''', before.name)")(envelope)
      .filter(col("row_type") === "update")
      .select(col("tb")).as[String].head()
    assert(out == "after.foo'eve")
  }

  test("sql script: image refs on the right-hand side read the maps") {
    val out = ScriptTransform.sqlScript(
      "set after.tag = concat(before.name, '->', after.name)")(envelope)
      .filter(col("row_type") === "update")
      .select(element_at(col("after"), "tag")).as[String].head()
    assert(out == "eve->eve")
  }

  test("jsr223: a runtime-supplied scala script mutates and drops rows") {
    val script =
      """val rt = row_type.asInstanceOf[String]
        |if (rt == "delete") null
        |else {
        |  val a = new java.util.HashMap[String, String](
        |    after.asInstanceOf[java.util.Map[String, String]])
        |  if (a.containsKey("name")) a.put("name",
        |    a.get("name").toUpperCase)
        |  val out = new java.util.HashMap[String, Object]()
        |  out.put("tb", tb.asInstanceOf[String] + "_scripted")
        |  out.put("after", a)
        |  out
        |}""".stripMargin
    val t = ScriptTransform.jsr223("scala", script)
    def ev(rt: String, after: Map[String, String]) = ChangeEvent(
      "app", "t", 0L, rt, Map.empty, after, "pk", "pv", "n0")

    val kept = t(ev("insert", Map("id" -> "1", "name" -> "ada")))
    assert(kept.map(_.tb).contains("t_scripted"))
    assert(kept.map(_.after("name")).contains("ADA"))
    assert(t(ev("delete", Map.empty)).isEmpty) // script returns null
  }

  test("jsr223 composes with the RowTransform chain") {
    val drop = ScriptTransform.jsr223("scala",
      """if (row_type.asInstanceOf[String] == "insert") null
        |else new java.util.HashMap[String, Object]()""".stripMargin)
    val events = Seq(
      ChangeEvent("a", "t", 0, "insert", Map.empty, Map("k" -> "1"),
        "p", "v", "n"),
      ChangeEvent("a", "t", 0, "update", Map("k" -> "1"),
        Map("k" -> "2"), "p", "v", "n"))
    val out = events.flatMap(e => RowTransform.chain(Seq(drop))(e))
    assert(out.map(_.rowType) == Seq("update"))
  }
}
