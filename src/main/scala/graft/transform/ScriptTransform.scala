package graft.transform

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.model.ChangeEvent

/** Runtime-suppliable user scripts — the reference's Lua processor
  * contract (`/root/reference/dt-pipeline/src/lua_processor.rs:16-57`):
  * a config-file script sees the five globals (schema, tb, row_type,
  * before, after), may mutate any of them, and drops the row by
  * blanking `row_type`. Two backends, one contract:
  *
  *  1. [[sqlScript]] — the SCALE path: a line-based script whose
  *     right-hand sides are Spark SQL expressions. Compiles to ordinary
  *     Catalyst expressions over the envelope DataFrame (schema, tb,
  *     row_type, before, after), so it stays inside whole-stage codegen
  *     and distributes like any other plan — this is what a 100 TB
  *     pipeline should use.
  *  2. [[jsr223]] — the GENERAL path: any `javax.script` engine present
  *     at runtime (this container ships the Scala REPL engine; a Lua or
  *     JS engine drops in by name at deploy). Row-at-a-time like the
  *     reference; the script is compiled once per executor when the
  *     engine supports it.
  *
  * Script grammar for [[sqlScript]] (one statement per line, `#`
  * comments):
  * {{{
  *   set tb = '<expr>'               # schema | tb | row_type too
  *   set after.col = <sql expr>      # before.col too; refs allowed
  *   rename after.old to new         # before.old too
  *   drop if <sql predicate>
  * }}}
  * `before.x` / `after.x` on any right-hand side read the image maps.
  */
object ScriptTransform {

  // ------------------------------------------------------------------
  // SQL-expression script (Catalyst; codegen; distributed).
  // ------------------------------------------------------------------

  private val SetRe = """(?i)^set\s+(\w+(?:\.\w+)?)\s*=\s*(.+)$""".r
  private val RenameRe =
    """(?i)^rename\s+(before|after)\.(\w+)\s+to\s+(\w+)$""".r
  private val DropRe = """(?i)^drop\s+if\s+(.+)$""".r
  private val ImgRef = """\b(before|after)\.([A-Za-z_]\w*)\b""".r

  /** Rewrite image field refs to map lookups so plain SQL reads them.
    * Substitution is quote-aware: text inside single-quoted SQL string
    * literals (with `''` escapes) passes through verbatim, so
    * `set tb = 'after.foo'` keeps the literal text instead of becoming
    * an `element_at` call.
    */
  private def rewrite(e: String): String = {
    val out = new StringBuilder
    val plain = new StringBuilder
    def flushPlain(): Unit = {
      out ++= ImgRef.replaceAllIn(plain.toString, m =>
        s"element_at(${m.group(1)}, '${m.group(2)}')")
      plain.clear()
    }
    var i = 0
    while (i < e.length) {
      if (e.charAt(i) == '\'') {
        flushPlain()
        out += '\''
        i += 1
        var closed = false
        while (!closed && i < e.length) {
          val c = e.charAt(i)
          out += c
          i += 1
          if (c == '\'') {
            if (i < e.length && e.charAt(i) == '\'') {
              out += '\''; i += 1 // '' escape stays inside the literal
            } else closed = true
          }
        }
      } else {
        plain += e.charAt(i)
        i += 1
      }
    }
    flushPlain()
    out.toString
  }

  private def setField(img: Column, field: String, value: Column): Column =
    map_concat(
      map_filter(img, (k, _) => k =!= field),
      map(lit(field), value.cast("string")))

  /** Compile the script to an envelope-DataFrame transform. Statements
    * apply top to bottom, like the reference's sequential Lua script.
    */
  def sqlScript(script: String): DataFrame => DataFrame = {
    val stmts = script.linesIterator.map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#")).toSeq
    val steps: Seq[DataFrame => DataFrame] = stmts.map {
      case SetRe(target, rhs) =>
        val value = expr(rewrite(rhs))
        target.split('.') match {
          case Array(img @ ("before" | "after"), field) =>
            df: DataFrame => df.withColumn(img,
              setField(col(img), field, value))
          case Array(scalar @ ("schema" | "tb" | "row_type")) =>
            df: DataFrame => df.withColumn(scalar, value.cast("string"))
          case _ => throw new IllegalArgumentException(
            s"bad set target: $target")
        }
      case RenameRe(img, from, to) =>
        df: DataFrame => df.withColumn(img,
          transform_keys(col(img), (k, _) =>
            when(k === from, to).otherwise(k)))
      case DropRe(pred) =>
        df: DataFrame => df.filter(!coalesce(expr(rewrite(pred)),
          lit(false)))
      case other => throw new IllegalArgumentException(
        s"unparseable script line: $other")
    }
    df => steps.foldLeft(df)((d, f) => f(d))
  }

  // ------------------------------------------------------------------
  // JSR-223 (any javax.script engine; row-at-a-time).
  // ------------------------------------------------------------------

  /** Engine-agnostic adaptation of the mutate-globals contract: the
    * script reads the five bindings and RETURNS either `null` (drop the
    * row) or a `java.util.Map` whose present keys (`schema`, `tb`,
    * `row_type`, `before`, `after`) replace the event's fields — a
    * returned empty/absent `row_type` also drops, mirroring
    * `lua_processor.rs:38-41`. (Return-a-map instead of global mutation
    * because JSR-223 engines disagree on write-back of bindings; the
    * information content is identical.)
    */
  def jsr223(engineName: String, script: String): RowTransform =
    new RowTransform {
      @transient private lazy val engineAndCompiled = {
        val mgr = new javax.script.ScriptEngineManager(
          getClass.getClassLoader)
        val eng = mgr.getEngineByName(engineName)
        require(eng != null, s"no JSR-223 engine named '$engineName'")
        // seed the five globals in the engine scope BEFORE compiling:
        // statically-compiled engines (e.g. the Scala one) resolve free
        // names against the bindings visible at compile time
        eng.put("schema", "")
        eng.put("tb", "")
        eng.put("row_type", "")
        eng.put("before", new java.util.HashMap[String, String]())
        eng.put("after", new java.util.HashMap[String, String]())
        eng match {
          case c: javax.script.Compilable => (eng, Some(c.compile(script)))
          case _ => (eng, None)
        }
      }

      private def toJava(m: Map[String, String]) = {
        val jm = new java.util.HashMap[String, String]()
        m.foreach { case (k, v) => jm.put(k, v) }
        jm
      }

      private def toScala(v: AnyRef): Map[String, String] = v match {
        case null => Map.empty
        case m: java.util.Map[_, _] =>
          val b = Map.newBuilder[String, String]
          m.forEach((k, v) => b += (String.valueOf(k) ->
            (if (v == null) null else String.valueOf(v))))
          b.result()
        case other => throw new IllegalArgumentException(
          s"script returned non-map image: $other")
      }

      override def apply(e: ChangeEvent): Option[ChangeEvent] = {
        val (eng, compiled) = engineAndCompiled
        val b = new javax.script.SimpleBindings()
        b.put("schema", e.schema)
        b.put("tb", e.tb)
        b.put("row_type", e.rowType)
        b.put("before", toJava(e.before))
        b.put("after", toJava(e.after))
        val out = compiled match {
          case Some(cs) => cs.eval(b)
          case None => eng.eval(script, b)
        }
        out match {
          case null => None
          case m: java.util.Map[_, _] =>
            val mm = m.asInstanceOf[java.util.Map[String, AnyRef]]
            def str(k: String, dflt: String): String =
              mm.getOrDefault(k, dflt) match {
                case null => null
                case s => String.valueOf(s)
              }
            val rt = str("row_type", e.rowType)
            if (rt == null || rt.isEmpty) None
            else Some(e.copy(
              schema = str("schema", e.schema),
              tb = str("tb", e.tb),
              rowType = rt,
              before = if (mm.containsKey("before"))
                toScala(mm.get("before")) else e.before,
              after = if (mm.containsKey("after"))
                toScala(mm.get("after")) else e.after))
          case other => throw new IllegalArgumentException(
            s"script must return null or a map, got: $other")
        }
      }
    }
}
