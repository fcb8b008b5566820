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
  *   remove after.col                # Lua's after["col"] = nil
  *   drop if <sql predicate>
  *   when <sql predicate>: <stmt>    # guarded form of any of the above
  * }}}
  * `before.x` / `after.x` on any right-hand side read the image maps.
  * The `when` guard is the Lua `if cond then ... end` idiom: the
  * statement applies only on rows where the predicate holds, others
  * pass through unchanged — every scripted example in the reference's
  * Lua docs (docs/en/etl/lua.md) is a guarded mutation of exactly
  * this shape (see LuaPortabilitySpec for the 1:1 translations).
  */
object ScriptTransform {

  // ------------------------------------------------------------------
  // SQL-expression script (Catalyst; codegen; distributed).
  // ------------------------------------------------------------------

  private val SetRe = """(?i)^set\s+(\w+(?:\.\w+)?)\s*=\s*(.+)$""".r
  private val RenameRe =
    """(?i)^rename\s+(before|after)\.(\w+)\s+to\s+(\w+)$""".r
  private val RemoveRe = """(?i)^remove\s+(before|after)\.(\w+)$""".r
  private val DropRe = """(?i)^drop\s+if\s+(.+)$""".r

  /** Split a `when <pred>: <stmt>` line at the first `:` OUTSIDE
    * single-quoted literals — predicates routinely contain colons in
    * time literals ('2024-12-01 00:00:00').
    */
  private def splitWhen(line: String): Option[(String, String)] = {
    if (!line.toLowerCase.startsWith("when ")) return None
    var i = 5; var inQ = false
    while (i < line.length) {
      line.charAt(i) match {
        case '\'' => inQ = !inQ
        case ':' if !inQ =>
          return Some((line.substring(5, i).trim,
            line.substring(i + 1).trim))
        case _ =>
      }
      i += 1
    }
    None
  }
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

    // `guard` = the `when <pred>:` condition; an unguarded statement
    // applies everywhere. Guarded columns keep their old value on
    // non-matching rows — one `when/otherwise` per statement, still
    // a single codegen'd projection.
    def compile(stmt: String, guard: Option[Column])
        : DataFrame => DataFrame = {
      def guarded(target: String, updated: Column): Column =
        guard match {
          case None => updated
          case Some(g) =>
            when(coalesce(g, lit(false)), updated).otherwise(col(target))
        }
      stmt match {
        case SetRe(target, rhs) =>
          val value = expr(rewrite(rhs))
          target.split('.') match {
            case Array(img @ ("before" | "after"), field) =>
              df: DataFrame => df.withColumn(img,
                guarded(img, setField(col(img), field, value)))
            case Array(scalar @ ("schema" | "tb" | "row_type")) =>
              df: DataFrame => df.withColumn(scalar,
                guarded(scalar, value.cast("string")))
            case _ => throw new IllegalArgumentException(
              s"bad set target: $target")
          }
        case RenameRe(img, from, to) =>
          df: DataFrame => df.withColumn(img,
            guarded(img, transform_keys(col(img), (k, _) =>
              when(k === from, to).otherwise(k))))
        case RemoveRe(img, field) =>
          // Lua's `after["col"] = nil`: the key leaves the image
          df: DataFrame => df.withColumn(img,
            guarded(img, map_filter(col(img), (k, _) => k =!= field)))
        case DropRe(pred) =>
          val p = coalesce(expr(rewrite(pred)), lit(false))
          val full = guard match {
            case None => p
            case Some(g) => coalesce(g, lit(false)) && p
          }
          df: DataFrame => df.filter(!full)
        case other => throw new IllegalArgumentException(
          s"unparseable script line: $other")
      }
    }

    val steps: Seq[DataFrame => DataFrame] = stmts.map { line =>
      splitWhen(line) match {
        case Some((pred, inner)) =>
          compile(inner, Some(expr(rewrite(pred))))
        case None => compile(line, None)
      }
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
