package graft.meta

/** Structured ALTER TABLE parsing — the typed subset of the reference's
  * 26 DDL variants that drives schema evolution
  * (/root/reference/dt-common/src/meta/ddl_meta/ddl_parser.rs:402-520:
  * mysql_alter_table / pg_alter_table action grammars;
  * ddl_statement.rs:379-420). Where [[DdlParser]] keeps the ALTER body
  * as an opaque string for routing/replay, this parses the body into
  * actions a cached StructType can be EVOLVED with — so a DDL barrier
  * only invalidates metadata when an action is genuinely out of model.
  *
  * Comma-splitting respects parens and quoted identifiers (`DECIMAL(10,2)`
  * and `` `weird,name` `` must not split).
  */
object AlterParser {

  sealed trait Position
  case object DefaultPos extends Position
  case object First extends Position
  final case class After(col: String) extends Position

  sealed trait AlterAction
  /** ADD [COLUMN] name type [constraints] [FIRST | AFTER col] */
  final case class AddColumn(name: String, colType: String,
      constraints: String, position: Position) extends AlterAction
  /** DROP [COLUMN] name */
  final case class DropColumn(name: String) extends AlterAction
  /** MODIFY [COLUMN] name type — type changes in place (MySQL). */
  final case class ModifyColumn(name: String, colType: String,
      constraints: String, position: Position) extends AlterAction
  /** CHANGE [COLUMN] old new type — rename + retype (MySQL). */
  final case class ChangeColumn(oldName: String, newName: String,
      colType: String, constraints: String, position: Position)
      extends AlterAction
  /** RENAME COLUMN old TO new (MySQL 8 / PG). */
  final case class RenameColumn(oldName: String, newName: String)
      extends AlterAction
  /** ALTER TABLE … RENAME [TO|AS] new — the reference's dedicated
    * MysqlAlterTableRename/PgAlterTableRename variants.
    */
  final case class RenameTo(db: Option[String], tb: String)
      extends AlterAction
  /** ALTER COLUMN c TYPE t (PG) / SET|DROP NOT NULL et al. reduce to
    * modify where typed; anything else stays raw.
    */
  final case class RawAction(text: String) extends AlterAction

  private val id = """(?:`([^`]+)`|"([^"]+)"|([A-Za-z_][\w$]*))"""
  private def re(p: String) = java.util.regex.Pattern.compile(p,
    java.util.regex.Pattern.CASE_INSENSITIVE)

  private def unq(m: java.util.regex.Matcher, base: Int): String =
    Seq(base, base + 1, base + 2).iterator
      .map(m.group).find(_ != null).orNull

  // type spec = base word(s) + optional (args) + optional modifiers that
  // belong to the type, e.g. "double precision", "decimal(10,2) unsigned"
  private val typeSpec =
    """([A-Za-z]+(?:\s+precision|\s+varying)?(?:\s*\([^)]*\))?""" +
      """(?:\s+unsigned)?(?:\s+zerofill)?)"""

  private val posRe =
    re("""^(.*?)\s*(?:(FIRST)|AFTER\s+""" + id + """)\s*$""")

  // ADD INDEX/KEY/CONSTRAINT/… are not column adds — without the
  // lookahead, "ADD INDEX idx (c)" would parse as column INDEX of
  // type idx(c)
  private val addRe =
    re("^ADD\\s+(?:COLUMN\\s+)?(?!(?:INDEX|KEY|CONSTRAINT|PRIMARY|" +
      s"UNIQUE|FULLTEXT|SPATIAL|FOREIGN|PARTITION|CHECK)\\b)$id\\s+" +
      s"$typeSpec(.*)$$")
  private val dropRe = re(s"^DROP\\s+(?:COLUMN\\s+)?$id\\s*$$")
  private val modifyRe =
    re(s"^MODIFY\\s+(?:COLUMN\\s+)?$id\\s+$typeSpec(.*)$$")
  private val changeRe =
    re(s"^CHANGE\\s+(?:COLUMN\\s+)?$id\\s+$id\\s+$typeSpec(.*)$$")
  private val renameColRe =
    re(s"^RENAME\\s+COLUMN\\s+$id\\s+TO\\s+$id\\s*$$")
  private val renameToRe =
    re(s"^RENAME\\s+(?:TO\\s+|AS\\s+)?$id(?:\\s*\\.\\s*$id)?\\s*$$")
  private val pgTypeRe =
    re(s"^ALTER\\s+(?:COLUMN\\s+)?$id\\s+(?:SET\\s+DATA\\s+)?TYPE\\s+" +
      s"$typeSpec(.*)$$")

  /** Split an ALTER body on top-level commas (paren depth 0, outside
    * backtick/double-quoted identifiers).
    */
  def splitActions(body: String): Seq[String] = {
    val out = Seq.newBuilder[String]
    val cur = new StringBuilder
    var depth = 0
    var quote: Char = 0
    body.foreach { c =>
      if (quote != 0) { cur += c; if (c == quote) quote = 0 }
      else c match {
        case '`' | '"' | '\'' => quote = c; cur += c
        case '(' => depth += 1; cur += c
        case ')' => depth -= 1; cur += c
        case ',' if depth == 0 => out += cur.toString.trim; cur.clear()
        case _ => cur += c
      }
    }
    if (cur.toString.trim.nonEmpty) out += cur.toString.trim
    out.result()
  }

  private def stripPos(tail: String): (String, Position) = {
    val m = posRe.matcher(tail.trim)
    if (m.matches()) {
      val pos = if (m.group(2) != null) First else After(unq(m, 3))
      (m.group(1).trim, pos)
    } else (tail.trim, DefaultPos)
  }

  /** Parse one alteration action. */
  def parseAction(action: String): AlterAction = {
    val a = action.trim
    var m = addRe.matcher(a)
    if (m.matches()) {
      val (constraints, pos) = stripPos(m.group(5))
      return AddColumn(unq(m, 1), m.group(4).trim, constraints, pos)
    }
    m = dropRe.matcher(a)
    if (m.matches()) return DropColumn(unq(m, 1))
    m = modifyRe.matcher(a)
    if (m.matches()) {
      val (constraints, pos) = stripPos(m.group(5))
      return ModifyColumn(unq(m, 1), m.group(4).trim, constraints, pos)
    }
    m = changeRe.matcher(a)
    if (m.matches()) {
      val (constraints, pos) = stripPos(m.group(8))
      return ChangeColumn(unq(m, 1), unq(m, 4), m.group(7).trim,
        constraints, pos)
    }
    m = renameColRe.matcher(a)
    if (m.matches()) return RenameColumn(unq(m, 1), unq(m, 4))
    m = pgTypeRe.matcher(a)
    if (m.matches())
      return ModifyColumn(unq(m, 1), m.group(4).trim,
        m.group(5).trim, DefaultPos)
    m = renameToRe.matcher(a)
    if (m.matches()) {
      val first = unq(m, 1)
      val second = unq(m, 4)
      return if (second == null) RenameTo(None, first)
      else RenameTo(Some(first), second)
    }
    RawAction(a)
  }

  /** Parse a full ALTER body into its action list. */
  def parse(body: String): Seq[AlterAction] =
    splitActions(body).map(parseAction)
}
