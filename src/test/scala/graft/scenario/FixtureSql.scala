package graft.scenario

import scala.collection.mutable

/** Fixture-SQL parser + source-engine interpreter for the scenario
  * corpus — the Spark-native stand-in for the reference test runner's
  * live source database (dt-tests/tests/test_runner/rdb_test_runner.rs:
  * execute_prepare_sqls / execute_test_sqls run the same files against
  * a real MySQL/PG; here the statements are interpreted driver-side and
  * the row-image change events a binlog would carry are synthesized
  * from them).
  *
  * Deliberately a fixture-grammar subset: CREATE/DROP DATABASE,
  * CREATE TABLE (columns + PRIMARY KEY/UNIQUE KEY), INSERT .. VALUES
  * (multi-tuple, optional column list), UPDATE .. SET .. WHERE,
  * DELETE FROM .. [WHERE], with literals NULL / numbers / 'strings' /
  * x'hex'. WHERE supports conjunctions of `=`, `IN (..)`, `IS NULL`.
  * That is the surface the reference's own scenario SQL uses
  * (dt-tests/tests/mysql_to_mysql/cdc/basic_test/src_test.sql).
  */
object FixtureSql {

  /** Canonical value model: null, or a String canonical form — both
    * the source-of-truth interpreter and the pipeline operate on the
    * same canonicalization, so compare is exact. Numbers normalize via
    * BigDecimal (1234.1200 == 1234.12), hex blobs to `hex:<lower>`.
    */
  type Value = String // null | canonical string

  final case class TableDef(db: String, tb: String, cols: Seq[String],
      pk: Seq[String], uks: Seq[Seq[String]],
      types: Seq[String] = Nil) {
    /** Declared type text per column (lowercased, e.g. `decimal(10,4)`)
      * — the wire-fidelity lane needs it to pick binlog codecs. Empty
      * only for defs built outside the SQL parser; `typesOr` pads so
      * those still encode (everything round-trips as text).
      */
    def typesOr: Seq[String] =
      if (types.size == cols.size) types
      else cols.map(_ => "varchar(255)")
    /** Row-identity columns: pk, else the first unique key — the
      * reference merger's id_cols resolution (rdb_merger uses the
      * tb_meta's id cols: primary before unique).
      */
    def keyCols: Seq[String] = if (pk.nonEmpty) pk else
      uks.headOption.getOrElse(Nil)
  }

  sealed trait Stmt
  final case class CreateDb(db: String) extends Stmt
  final case class DropDb(db: String) extends Stmt
  final case class CreateTable(defn: TableDef) extends Stmt
  final case class Insert(db: String, tb: String,
      cols: Option[Seq[String]], rows: Seq[Seq[Value]]) extends Stmt
  final case class Update(db: String, tb: String,
      sets: Seq[(String, Value)], where: Where) extends Stmt
  final case class Delete(db: String, tb: String, where: Where)
      extends Stmt
  /** A schema-changing statement the source would binlog as a DDL
    * event (reference ddl_test scenario dirs): the raw SQL ships in
    * the event, the interpreter evolves its defs/rows like the live
    * engine would. Supported: ALTER TABLE ADD/DROP COLUMN, TRUNCATE.
    */
  final case class DdlChange(db: String, tb: String, sql: String)
      extends Stmt
  case object Ignored extends Stmt

  /** Shared def-evolution semantics for ALTER actions — used by the
    * source interpreter AND the runner's destination side, so both
    * ends of a scenario agree on what a statement means. Added
    * columns append at the end (scenario fixtures use plain
    * ADD COLUMN without FIRST/AFTER); dropped columns leave pk/uk
    * lists too (a live engine rejects dropping a keyed column, but
    * the keyless fallback is exactly the serial-lane behavior the
    * corpus wants to reach).
    */
  def evolveDef(d: TableDef,
      actions: Seq[graft.meta.AlterParser.AlterAction]): TableDef = {
    import graft.meta.AlterParser._
    actions.foldLeft(d) {
      case (acc, a: AddColumn) => acc.copy(cols = acc.cols :+ a.name,
        types = acc.typesOr :+ a.colType.trim.toLowerCase)
      case (acc, DropColumn(n)) =>
        val keep = acc.cols.zip(acc.typesOr).filterNot(_._1 == n)
        acc.copy(
          cols = keep.map(_._1),
          pk = acc.pk.filterNot(_ == n),
          uks = acc.uks.map(_.filterNot(_ == n)).filter(_.nonEmpty),
          types = keep.map(_._2))
      case (_, other) =>
        sys.error(s"unsupported scenario alter action: $other")
    }
  }

  /** Conform a row to an evolved def: new columns null, dropped gone. */
  def conformRow(row: Map[String, Value], d: TableDef)
      : Map[String, Value] =
    d.cols.map(c => c -> row.getOrElse(c, null: Value)).toMap

  /** Conjunction of simple predicates over a row. */
  final case class Where(preds: Seq[Pred]) {
    def matches(row: Map[String, Value]): Boolean = preds.forall {
      case Eq(c, v) => row.getOrElse(c, null) != null &&
        row(c) == v // SQL `=` is never true against NULL
      case In(c, vs) => row.getOrElse(c, null) != null &&
        vs.contains(row(c))
      case IsNull(c) => row.getOrElse(c, null) == null
    }
  }
  sealed trait Pred
  final case class Eq(col: String, v: Value) extends Pred
  final case class In(col: String, vs: Seq[Value]) extends Pred
  final case class IsNull(col: String) extends Pred

  // ---------------------------------------------------------------- lex

  /** Split a script into statements at top-level `;`, honoring quotes
    * and backticks; `-- ` line comments stripped.
    */
  def splitStatements(text: String): Seq[String] = {
    val noComments = text.linesIterator
      .map { l =>
        val t = l
        // strip -- comments only when not inside a quote on that line:
        // fixture SQL never spans a literal across lines
        var i = 0; var inS = false; var inB = false; var cut = -1
        while (i < t.length && cut < 0) {
          t.charAt(i) match {
            case '\'' if !inB => inS = !inS
            case '`' if !inS => inB = !inB
            case '-' if !inS && !inB && i + 1 < t.length &&
              t.charAt(i + 1) == '-' => cut = i
            case _ =>
          }
          i += 1
        }
        if (cut >= 0) t.substring(0, cut) else t
      }.mkString("\n")
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var inS = false; var inB = false; var inD = false
    var i = 0
    while (i < noComments.length) {
      val c = noComments.charAt(i)
      c match {
        case '\'' if !inB && !inD =>
          // '' escape inside a string stays inside
          if (inS && i + 1 < noComments.length &&
            noComments.charAt(i + 1) == '\'') { cur += c; i += 1 }
          else inS = !inS
          cur += noComments.charAt(i)
        case '\\' if inS && i + 1 < noComments.length =>
          cur += c; i += 1; cur += noComments.charAt(i)
        case '`' if !inS && !inD => inB = !inB; cur += c
        case '"' if !inS && !inB => inD = !inD; cur += c
        case ';' if !inS && !inB && !inD =>
          val s = cur.toString.trim
          if (s.nonEmpty) out += s
          cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  /** Split `s` at top-level commas (outside parens/quotes). */
  private def splitTop(s: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0; var inS = false; var inB = false
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '\'' if !inB =>
          if (inS && i + 1 < s.length && s.charAt(i + 1) == '\'') {
            cur += c; i += 1
          } else inS = !inS
          cur += s.charAt(i)
        case '\\' if inS && i + 1 < s.length =>
          cur += c; i += 1; cur += s.charAt(i)
        case '`' if !inS => inB = !inB; cur += c
        case '(' if !inS && !inB => depth += 1; cur += c
        case ')' if !inS && !inB => depth -= 1; cur += c
        case ',' if depth == 0 && !inS && !inB =>
          out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
      i += 1
    }
    val last = cur.toString.trim
    if (last.nonEmpty) out += last
    out.result()
  }

  private def unquoteId(s: String): String = {
    val t = s.trim
    if (t.startsWith("`") && t.endsWith("`") && t.length >= 2)
      t.substring(1, t.length - 1).replace("``", "`")
    else t
  }

  /** `db.tb` (either part possibly backticked). */
  private def parseQualified(s: String): (String, String) = {
    // split at the first dot outside backticks
    var i = 0; var inB = false; var dot = -1
    while (i < s.length && dot < 0) {
      s.charAt(i) match {
        case '`' => inB = !inB
        case '.' if !inB => dot = i
        case _ =>
      }
      i += 1
    }
    require(dot > 0, s"expected db.tb, got: $s")
    (unquoteId(s.substring(0, dot)), unquoteId(s.substring(dot + 1)))
  }

  /** Canonicalize one SQL literal. */
  def parseValue(raw: String): Value = {
    val t = raw.trim
    if (t.equalsIgnoreCase("NULL")) null
    else if ((t.startsWith("x'") || t.startsWith("X'")) &&
      t.endsWith("'"))
      "hex:" + t.substring(2, t.length - 1).toLowerCase
    else if (t.startsWith("'") && t.endsWith("'") && t.length >= 2) {
      val body = t.substring(1, t.length - 1)
      val sb = new StringBuilder
      var i = 0
      while (i < body.length) {
        val c = body.charAt(i)
        if (c == '\\' && i + 1 < body.length) {
          sb += body.charAt(i + 1); i += 2
        } else if (c == '\'' && i + 1 < body.length &&
          body.charAt(i + 1) == '\'') { sb += '\''; i += 2 }
        else { sb += c; i += 1 }
      }
      sb.toString
    } else {
      // numeric: canonical plain form so 50 == 50.00 and .5 == 0.5
      try new java.math.BigDecimal(t).stripTrailingZeros.toPlainString
      catch { case _: NumberFormatException => t }
    }
  }

  // -------------------------------------------------------------- parse

  private val CreateDbRe =
    "(?is)^CREATE\\s+DATABASE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?(\\S+)$".r
  private val DropDbRe =
    "(?is)^DROP\\s+DATABASE\\s+(?:IF\\s+EXISTS\\s+)?(\\S+)$".r
  private val CreateTableRe =
    "(?is)^CREATE\\s+TABLE\\s+(?:IF\\s+NOT\\s+EXISTS\\s+)?([^\\s(]+)\\s*\\((.*)\\)\\s*[^)]*$".r
  private val InsertRe =
    "(?is)^INSERT\\s+INTO\\s+([^\\s(]+)\\s*(\\([^)]*\\))?\\s*VALUES\\s*(.*)$".r
  private val UpdateRe =
    "(?is)^UPDATE\\s+(\\S+)\\s+SET\\s+(.*?)(?:\\s+WHERE\\s+(.*))?$".r
  private val DeleteRe =
    "(?is)^DELETE\\s+FROM\\s+(\\S+)(?:\\s+WHERE\\s+(.*))?$".r

  def parseWhere(s: Option[String]): Where = s match {
    case None => Where(Nil)
    case Some(w) =>
      val parts = w.split("(?i)\\s+AND\\s+").map(_.trim)
        .filter(_.nonEmpty)
      Where(parts.toSeq.map { p =>
        val inM = "(?is)^(\\S+)\\s+IN\\s*\\((.*)\\)$".r
        val nullM = "(?is)^(\\S+)\\s+IS\\s+NULL$".r
        val eqM = "(?s)^([^=]+)=(.*)$".r
        p match {
          case inM(c, vs) =>
            In(unquoteId(c), splitTop(vs).map(parseValue))
          case nullM(c) => IsNull(unquoteId(c))
          case eqM(c, v) => Eq(unquoteId(c.trim), parseValue(v))
          case _ => sys.error(s"unsupported WHERE predicate: $p")
        }
      })
  }

  private def parseTableBody(db: String, tb: String, body: String)
      : TableDef = {
    val cols = Seq.newBuilder[String]
    val types = Seq.newBuilder[String]
    var pk: Seq[String] = Nil
    val uks = Seq.newBuilder[Seq[String]]
    def colsOf(paren: String): Seq[String] = {
      val inner = paren.substring(paren.indexOf('(') + 1,
        paren.lastIndexOf(')'))
      splitTop(inner).map(unquoteId)
    }
    splitTop(body).foreach { item0 =>
      val item = item0.trim
      val u = item.toUpperCase
      if (u.startsWith("PRIMARY KEY")) pk = colsOf(item)
      else if (u.startsWith("UNIQUE KEY") || u.startsWith("UNIQUE INDEX")
        || u.startsWith("UNIQUE(")) uks += colsOf(item)
      else if (u.startsWith("KEY ") || u.startsWith("KEY(") ||
        u.startsWith("INDEX ") || u.startsWith("CONSTRAINT") ||
        u.startsWith("FOREIGN KEY")) () // non-identity metadata
      else {
        // column def: first token (backtick-aware) is the name; a
        // column-level PRIMARY KEY marks the pk inline
        val name =
          if (item.startsWith("`"))
            item.substring(1, item.indexOf('`', 1))
          else item.takeWhile(!_.isWhitespace)
        cols += (if (item.startsWith("`")) name.replace("``", "`")
          else name)
        // declared type = first token after the name (with its
        // parenthesized args and an optional `unsigned`) — what the
        // wire-fidelity lane maps to a binlog column codec
        val rest = (if (item.startsWith("`"))
          item.substring(item.indexOf('`', 1) + 1)
        else item.drop(name.length)).trim
        types += "(?i)^(\\w+(?:\\([^)]*\\))?(?:\\s+unsigned)?)".r
          .findFirstIn(rest).getOrElse("varchar(255)").toLowerCase
        if (u.contains("PRIMARY KEY")) pk = Seq(unquoteId(name))
      }
    }
    TableDef(db, tb, cols.result(), pk, uks.result(), types.result())
  }

  def parseStatement(sql: String): Stmt = sql.trim match {
    case CreateDbRe(db) => CreateDb(unquoteId(db))
    case DropDbRe(db) => DropDb(unquoteId(db))
    case InsertRe(name, colsOpt, values) =>
      val (db, tb) = parseQualified(name)
      val cols = Option(colsOpt).map(c =>
        splitTop(c.trim.stripPrefix("(").stripSuffix(")"))
          .map(unquoteId))
      val rows = splitTop(values.trim).map { tuple =>
        val t = tuple.trim
        require(t.startsWith("(") && t.endsWith(")"),
          s"bad VALUES tuple: $t")
        splitTop(t.substring(1, t.length - 1)).map(parseValue)
      }
      Insert(db, tb, cols, rows)
    case UpdateRe(name, sets, whereOpt) =>
      val (db, tb) = parseQualified(name)
      val assigns = splitTop(sets).map { a =>
        val i = a.indexOf('=')
        (unquoteId(a.substring(0, i).trim),
          parseValue(a.substring(i + 1)))
      }
      Update(db, tb, assigns, parseWhere(Option(whereOpt)))
    case DeleteRe(name, whereOpt) =>
      val (db, tb) = parseQualified(name)
      Delete(db, tb, parseWhere(Option(whereOpt)))
    case s if CreateTableRe.findFirstIn(s).isDefined =>
      val m = CreateTableRe.findFirstMatchIn(s).get
      val (db, tb) = parseQualified(m.group(1))
      // body = text between the first '(' and its matching ')'
      val start = s.indexOf('(')
      var depth = 0; var end = -1; var i = start
      var inS = false; var inB = false
      while (i < s.length && end < 0) {
        s.charAt(i) match {
          case '\'' if !inB => inS = !inS
          case '`' if !inS => inB = !inB
          case '(' if !inS && !inB => depth += 1
          case ')' if !inS && !inB =>
            depth -= 1; if (depth == 0) end = i
          case _ =>
        }
        i += 1
      }
      CreateTable(parseTableBody(db, tb, s.substring(start + 1, end)))
    case s if s.toUpperCase.startsWith("ALTER TABLE") ||
        s.toUpperCase.startsWith("TRUNCATE") =>
      // parse through the REAL DDL parser — the same statement text
      // later ships in the change event and must round-trip it
      graft.meta.DdlParser.parse(s) match {
        case Seq(a: graft.meta.DdlParser.AlterTable) =>
          DdlChange(a.db.getOrElse(sys.error(
            s"fixture ALTER needs a db-qualified table: $s")), a.tb, s)
        case Seq(t: graft.meta.DdlParser.TruncateTable) =>
          DdlChange(t.db.getOrElse(sys.error(
            s"fixture TRUNCATE needs a db-qualified table: $s")),
            t.tb, s)
        case other =>
          sys.error(s"unsupported fixture DDL ($other): $s")
      }
    case s if s.toUpperCase.startsWith("SET ") || s.isEmpty => Ignored
    case other => sys.error(s"unsupported fixture statement: $other")
  }

  def parseScript(text: String): Seq[Stmt] =
    splitStatements(text).map(parseStatement)

  // -------------------------------------------- source-engine interpreter

  /** One synthesized row-image change event — what the binlog/pgoutput
    * extract of the same statement sequence would carry.
    */
  final case class Event(db: String, tb: String, seq: Long,
      rowType: String, before: Map[String, Value],
      after: Map[String, Value], ddlText: String = "")

  /** The interpreted "live source": table defs + current rows, and the
    * change events each DML produced (row images, statement order).
    */
  final class SourceState {
    val defs = mutable.LinkedHashMap[(String, String), TableDef]()
    /** Each table's def AS CREATED — the shape the destination DDL
      * was issued with, before any mid-stream ALTER evolved it. The
      * runner starts its destination registry from these and replays
      * the admitted DDL events forward.
      */
    val createdDefs = mutable.LinkedHashMap[(String, String), TableDef]()
    val rows =
      mutable.LinkedHashMap[(String, String),
        mutable.ArrayBuffer[Map[String, Value]]]()
    val events = mutable.ArrayBuffer[Event]()
    private var seq = 0L
    private def nextSeq(): Long = { seq += 1; seq }

    def apply(stmt: Stmt): Unit = stmt match {
      case CreateDb(_) | DropDb(_) | Ignored => ()
      case CreateTable(d) =>
        defs((d.db, d.tb)) = d
        createdDefs((d.db, d.tb)) = d
        rows((d.db, d.tb)) = mutable.ArrayBuffer.empty
      case DdlChange(db, tb, sql) =>
        graft.meta.DdlParser.parse(sql).foreach {
          case a: graft.meta.DdlParser.AlterTable =>
            val d1 = evolveDef(defs((db, tb)),
              graft.meta.AlterParser.parse(a.alteration))
            defs((db, tb)) = d1
            val buf = rows((db, tb))
            buf.indices.foreach(i => buf(i) = conformRow(buf(i), d1))
          case _: graft.meta.DdlParser.TruncateTable =>
            rows((db, tb)).clear()
          case other => sys.error(s"unsupported source DDL: $other")
        }
        events += Event(db, tb, nextSeq(), "ddl", Map.empty, Map.empty,
          sql)
      case Insert(db, tb, colsOpt, tuples) =>
        val d = defs((db, tb))
        val cols = colsOpt.getOrElse(d.cols)
        tuples.foreach { t =>
          require(t.size == cols.size,
            s"$db.$tb: ${t.size} values for ${cols.size} cols")
          val full = d.cols.map(c =>
            c -> cols.zip(t).toMap.getOrElse(c, null: Value)).toMap
          rows((db, tb)) += full
          events += Event(db, tb, nextSeq(), "insert", Map.empty, full)
        }
      case Update(db, tb, sets, where) =>
        val buf = rows((db, tb))
        buf.indices.foreach { i =>
          if (where.matches(buf(i))) {
            val before = buf(i)
            val after = before ++ sets.toMap
            buf(i) = after
            events += Event(db, tb, nextSeq(), "update", before, after)
          }
        }
      case Delete(db, tb, where) =>
        val buf = rows((db, tb))
        val (dead, alive) = buf.partition(where.matches)
        dead.foreach { r =>
          events += Event(db, tb, nextSeq(), "delete", r, Map.empty)
        }
        buf.clear(); buf ++= alive
    }

    def applyAll(stmts: Seq[Stmt]): Unit = stmts.foreach(apply)
  }
}
