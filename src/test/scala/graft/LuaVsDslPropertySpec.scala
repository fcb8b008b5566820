package graft

import scala.util.Random

import org.apache.spark.sql.DataFrame

import graft.model.ChangeEvent
import graft.transform.{LuaScript, ScriptTransform}

/** Differential property test for the README migration table: a
  * randomly generated guarded mutation, written BOTH as verbatim Lua
  * (executed by the embedded interpreter) and as its 1:1 ScriptTransform
  * DSL translation (compiled to Catalyst), must produce identical row
  * sets over random change envelopes. This is the property that makes
  * the migration table trustworthy — not just the documented examples,
  * but the whole guarded-mutation space they span.
  *
  * The one deliberate mapping asymmetry is exercised explicitly: Lua's
  * `x ~= nil`-style inequality is null-safe, SQL's `!=` is not, so the
  * generator translates `after.c ~= '<v>'` to
  * `(after.c is null or after.c != '<v>')`.
  */
class LuaVsDslPropertySpec extends SparkSuite {

  private val Cols = Seq("c1", "c2", "num")

  private final case class GenScript(lua: String, dsl: String)

  /** One random guard in both syntaxes. */
  private def genGuard(rnd: Random): (String, String) =
    rnd.nextInt(4) match {
      case 0 =>
        val v = s"v${rnd.nextInt(3)}"
        (s"""after.c1 == "$v"""", s"after.c1 = '$v'")
      case 1 =>
        val v = s"v${rnd.nextInt(3)}"
        (s"""after.c2 ~= "$v"""",
          s"(after.c2 is null or after.c2 != '$v')")
      case 2 =>
        val n = rnd.nextInt(50)
        (s"after.num ~= nil and after.num < $n",
          s"after.num is not null and after.num < $n")
      case _ =>
        val t = s"t${rnd.nextInt(2)}"
        (s"""tb == "$t" and row_type == "insert"""",
          s"tb = '$t' and row_type = 'insert'")
    }

  /** One random action in both syntaxes, under the given guard. */
  private def genAction(rnd: Random, luaG: String, dslG: String)
      : GenScript = rnd.nextInt(4) match {
    case 0 =>
      val c = Cols(rnd.nextInt(Cols.size))
      val v = rnd.nextInt(100)
      GenScript(
        s"""if ($luaG) then after["$c"] = "$v" end""",
        s"when $dslG: set after.$c = '$v'")
    case 1 =>
      val c = Cols(rnd.nextInt(Cols.size))
      GenScript(
        s"""if ($luaG) then after["$c"] = nil end""",
        s"when $dslG: remove after.$c")
    case 2 =>
      GenScript(
        s"""if ($luaG) then row_type = "" end""",
        s"drop if $dslG")
    case _ =>
      val t = s"renamed${rnd.nextInt(2)}"
      GenScript(
        s"""if ($luaG) then tb = "$t" end""",
        s"when $dslG: set tb = '$t'")
  }

  private def genScript(rnd: Random): GenScript = {
    val parts = Seq.fill(1 + rnd.nextInt(3)) {
      val (lg, dg) = genGuard(rnd)
      genAction(rnd, lg, dg)
    }
    GenScript(parts.map(_.lua).mkString("\n"),
      parts.map(_.dsl).mkString("\n"))
  }

  private def genEvents(rnd: Random, n: Int): Seq[ChangeEvent] =
    Seq.fill(n) {
      def img(): Map[String, String] = Cols.flatMap { c =>
        rnd.nextInt(4) match {
          case 0 => None // absent column
          case _ if c == "num" => Some(c -> rnd.nextInt(80).toString)
          case _ => Some(c -> s"v${rnd.nextInt(3)}")
        }
      }.toMap
      val rt = Seq("insert", "update", "delete")(rnd.nextInt(3))
      ChangeEvent(s"db${rnd.nextInt(2)}", s"t${rnd.nextInt(2)}", 0L,
        rt,
        if (rt == "insert") Map.empty else img(),
        if (rt == "delete") Map.empty else img(),
        "none", "", "")
    }

  private def envelope(evs: Seq[ChangeEvent]): DataFrame = {
    val s = spark
    import s.implicits._
    evs.map(e => (e.schema, e.tb, e.rowType, e.before, e.after))
      .toDF("schema", "tb", "row_type", "before", "after")
  }

  private def canon(rows: Seq[(String, String, String,
      Map[String, String], Map[String, String])]): Seq[String] =
    rows.map { case (s, t, rt, b, a) =>
      s"$s|$t|$rt|${b.toSeq.sorted}|${a.toSeq.sorted}"
    }.sorted

  test("random guarded mutations: verbatim Lua and the DSL " +
      "translation agree on every row, 40 trials") {
    val seed = 0xC0FFEE
    val rnd = new Random(seed)
    for (trial <- 1 to 40) {
      val script = genScript(rnd)
      val events = genEvents(rnd, 30)
      val viaLua = events.flatMap(
        LuaScript.rowTransform(script.lua)(_))
        .map(e => (e.schema, e.tb, e.rowType, e.before, e.after))
      val viaDsl = ScriptTransform.sqlScript(script.dsl)(
        envelope(events)).collect().toSeq
        .map(r => (r.getString(0), r.getString(1), r.getString(2),
          r.getMap[String, String](3).toMap,
          r.getMap[String, String](4).toMap))
      assert(canon(viaLua) == canon(viaDsl),
        s"trial $trial diverged (seed=$seed):\n--- lua\n" +
          s"${script.lua}\n--- dsl\n${script.dsl}")
    }
  }
}
