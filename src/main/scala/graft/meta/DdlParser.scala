package graft.meta

import graft.operators.Router

/** DDL/DCL statement parsing, routing, and replay — the reference's
  * hand-written parser (/root/reference/dt-common/src/meta/ddl_meta/
  * ddl_parser.rs, ddl_statement.rs:6-40) reduced to the statement shapes
  * the pipeline must route and replay. Multi-object DROP/RENAME split into
  * single-object statements (the reference's `split_to_multi`) so each can
  * be routed independently.
  */
object DdlParser {

  sealed trait DdlStatement {
    def render: String
  }
  final case class CreateDatabase(db: String, ifNotExists: Boolean)
      extends DdlStatement {
    def render = s"CREATE DATABASE ${ine(ifNotExists)}${q(db)}"
  }
  final case class DropDatabase(db: String, ifExists: Boolean)
      extends DdlStatement {
    def render = s"DROP DATABASE ${ie(ifExists)}${q(db)}"
  }
  final case class AlterDatabase(db: String, alteration: String)
      extends DdlStatement {
    def render = s"ALTER DATABASE ${q(db)} $alteration"
  }
  /** PG-style schema namespace DDL — the reference types these apart
    * from database DDL by keyword (ddl_parser.rs:183-272), so `CREATE
    * SCHEMA` is `create_schema` even on engines where SCHEMA aliases
    * DATABASE.
    */
  final case class CreateSchema(schema: String, ifNotExists: Boolean,
      authorization: Boolean = false) extends DdlStatement {
    def render = s"CREATE SCHEMA ${ine(ifNotExists)}" +
      s"${if (authorization) "AUTHORIZATION " else ""}${q(schema)}"
  }
  final case class DropSchema(schema: String, ifExists: Boolean)
      extends DdlStatement {
    def render = s"DROP SCHEMA ${ie(ifExists)}${q(schema)}"
  }
  /** ALTER SCHEMA: RENAME TO is modeled (it re-namespaces every table
    * under the schema); other alterations ride along verbatim.
    */
  final case class AlterSchema(schema: String,
      newSchema: Option[String], unparsed: String = "")
      extends DdlStatement {
    def render = newSchema match {
      case Some(n) => s"ALTER SCHEMA ${q(schema)} RENAME TO ${q(n)}"
      case None => s"ALTER SCHEMA ${q(schema)} $unparsed"
    }
  }
  /** `modifier` carries table persistence qualifiers as written —
    * TEMPORARY / temp / GLOBAL TEMPORARY / UNLOGGED — the reference
    * keeps the source spelling in to_sql
    * (test_create_table_with_temporary_pg).
    */
  final case class CreateTable(db: Option[String], tb: String,
      body: String, ifNotExists: Boolean, modifier: String = "")
      extends DdlStatement {
    def render = {
      val m = if (modifier.isEmpty) "" else s"$modifier "
      s"CREATE ${m}TABLE ${ine(ifNotExists)}${qt(db, tb)} $body"
    }
  }
  final case class DropTable(db: Option[String], tb: String,
      ifExists: Boolean) extends DdlStatement {
    def render = s"DROP TABLE ${ie(ifExists)}${qt(db, tb)}"
  }
  final case class TruncateTable(db: Option[String], tb: String)
      extends DdlStatement {
    def render = s"TRUNCATE TABLE ${qt(db, tb)}"
  }
  final case class AlterTable(db: Option[String], tb: String,
      alteration: String) extends DdlStatement {
    def render = s"ALTER TABLE ${qt(db, tb)} $alteration"
  }
  /** `ALTER TABLE x RENAME [TO|AS] y` — the reference models this as a
    * dedicated statement (ddl_statement.rs MysqlAlterTableRename /
    * PgAlterTableRename) precisely so the router can rewrite BOTH
    * namespaces; folding it into the free-text alteration would leave
    * the rename target unrouted. Canonical render is the reference's
    * `RENAME TO` form regardless of the surface spelling.
    */
  final case class AlterTableRename(db: Option[String], tb: String,
      newDb: Option[String], newTb: String) extends DdlStatement {
    def render = s"ALTER TABLE ${qt(db, tb)} RENAME TO ${qt(newDb, newTb)}"
  }
  /** PG `ALTER TABLE s.t SET SCHEMA s2` (ddl_statement.rs
    * PgAlterTableSetSchema) — the new schema must route through the
    * schema map like any other namespace.
    */
  final case class AlterTableSetSchema(db: Option[String], tb: String,
      newSchema: String) extends DdlStatement {
    def render = s"ALTER TABLE ${qt(db, tb)} SET SCHEMA ${q(newSchema)}"
  }
  final case class RenameTable(fromDb: Option[String], fromTb: String,
      toDb: Option[String], toTb: String) extends DdlStatement {
    def render =
      s"RENAME TABLE ${qt(fromDb, fromTb)} TO ${qt(toDb, toTb)}"
  }
  final case class CreateIndex(index: String, db: Option[String],
      tb: String, cols: String, unique: Boolean = false,
      using: String = "") extends DdlStatement {
    def render = {
      val u = if (unique) "UNIQUE " else ""
      // the reference canonicalizes the index method to upper case
      // (test_create_index_mysql: `using  btree` → `USING BTREE`)
      val m = if (using.isEmpty) "" else s"USING ${using.toUpperCase} "
      s"CREATE ${u}INDEX ${q(index)} ${m}ON ${qt(db, tb)} ($cols)"
    }
  }
  final case class DropIndex(index: String, db: Option[String],
      tb: String, trailing: String = "") extends DdlStatement {
    def render = {
      val t = if (trailing.isEmpty) "" else s" $trailing"
      s"DROP INDEX ${q(index)} ON ${qt(db, tb)}$t"
    }
  }
  /** A MongoDB DDL carried by the change stream (showExpandedEvents) —
    * the reference's MongoCommandStatement (ddl_statement.rs:296) +
    * the command document it replays via runCommand
    * (mongo_sinker.rs run_ddl). `command` is the extended-JSON command
    * doc as extracted; `render` re-namespaces it from the (possibly
    * routed) schema/tb fields exactly like the sinker's
    * rewrite_ddl_command_namespace before execution.
    */
  final case class MongoCommand(mongoType: String, schema: String,
      tb: String, newSchema: String = "", newTb: String = "",
      command: String = "") extends DdlStatement {
    def render = MongoDdl.rewriteNamespace(this)
    def isShardDdl: Boolean = MongoDdl.shardTypes.contains(mongoType)
  }

  /** Anything we don't model structurally: kept verbatim (still routable
    * at the statement level = not at all; flagged for manual handling).
    */
  final case class RawDdl(sql: String) extends DdlStatement {
    def render = sql
  }

  private def q(id: String) = s"`$id`"
  private def qt(db: Option[String], tb: String) =
    db.fold(q(tb))(d => s"${q(d)}.${q(tb)}")
  private def ine(b: Boolean) = if (b) "IF NOT EXISTS " else ""
  private def ie(b: Boolean) = if (b) "IF EXISTS " else ""

  private val id = """(?:`([^`]+)`|"([^"]+)"|([A-Za-z_][\w$]*))"""
  private val qual = s"$id(?:\\s*\\.\\s*$id)?"

  private def unq(m: java.util.regex.Matcher, base: Int): String =
    Seq(base, base + 1, base + 2).iterator
      .map(m.group).find(_ != null).orNull

  /** (db?, tb) from a qualified-name match starting at group `base`. */
  private def qualName(m: java.util.regex.Matcher, base: Int)
      : (Option[String], String) = {
    val first = unq(m, base)
    val second = unq(m, base + 3)
    if (second == null) (None, first) else (Some(first), second)
  }

  // DOTALL: statements arrive multi-line (ddl_parser.rs
  // test_create_table_multi_lines_pg) — a table body spanning lines
  // must still reach the body capture
  private def re(p: String) =
    java.util.regex.Pattern.compile(p,
      java.util.regex.Pattern.CASE_INSENSITIVE |
        java.util.regex.Pattern.DOTALL)

  private val createDbRe =
    re(s"^\\s*CREATE\\s+DATABASE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$id\\s*$$")
  private val dropDbRe =
    re(s"^\\s*DROP\\s+DATABASE\\s+(IF\\s+EXISTS\\s+)?$id\\s*$$")
  private val alterDbRe =
    re(s"^\\s*ALTER\\s+DATABASE\\s+$id\\s+(.+)$$")
  private val createSchemaRe =
    re(s"^\\s*CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?(AUTHORIZATION\\s+)?$id\\s*$$")
  private val dropSchemaRe =
    re(s"^\\s*DROP\\s+SCHEMA\\s+(IF\\s+EXISTS\\s+)?$id\\s*(?:CASCADE|RESTRICT)?\\s*$$")
  private val alterSchemaRe =
    re(s"^\\s*ALTER\\s+SCHEMA\\s+$id\\s+(.+)$$")
  private val renameToRe = re(s"^RENAME\\s+TO\\s+$id\\s*$$")
  // table-level rename: RENAME / RENAME TO / RENAME AS <qual> — but
  // NOT `RENAME COLUMN a TO b` / `RENAME INDEX x TO y` sub-clauses
  private val alterRenameRe = re(
    s"^RENAME\\s+(?:TO\\s+|AS\\s+)?(?!COLUMN\\b|INDEX\\b|KEY\\b)" +
      s"$qual\\s*$$")
  private val alterSetSchemaRe = re(s"^SET\\s+SCHEMA\\s+$id\\s*$$")
  private val createTbRe =
    re(s"^\\s*CREATE\\s+((?:(?:GLOBAL|LOCAL)\\s+)?(?:TEMPORARY|TEMP)\\s+" +
      s"|UNLOGGED\\s+)?TABLE\\s+(IF\\s+NOT\\s+EXISTS\\s+)?$qual\\s*(\\(.*)$$")
  private val dropTbRe =
    re(s"^\\s*DROP\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?(.*)$$")
  private val truncateRe =
    re(s"^\\s*TRUNCATE\\s+(?:TABLE\\s+)?$qual\\s*$$")
  private val alterRe =
    re(s"^\\s*ALTER\\s+TABLE\\s+$qual\\s+(.*)$$")
  private val renameRe =
    re(s"^\\s*RENAME\\s+TABLE\\s+(.*)$$")
  private val renamePairRe = re(s"^\\s*$qual\\s+TO\\s+$qual\\s*$$")
  private val createIdxRe =
    re(s"^\\s*CREATE\\s+(UNIQUE\\s+)?INDEX\\s+$id\\s*" +
      s"(?:USING\\s+(\\w+)\\s+)?ON\\s+$qual\\s*\\((.*)\\)\\s*$$")
  private val dropIdxRe =
    re(s"^\\s*DROP\\s+INDEX\\s+$id\\s+ON\\s+$qual\\s*(.*)$$")
  private val qualOnlyRe = re(s"^\\s*$qual\\s*$$")

  /** Strip SQL comments outside quoted spans — the reference's nom
    * combinators skip `/*...*/` block comments (and line comments)
    * between ANY two tokens, so `create /*c*/table/*c*/ aaa.bbb`
    * parses like `create table aaa.bbb` (ddl_parser.rs test battery,
    * `test_create_table_with_schema_mysql` "comments" vectors).
    * Backtick/double-quote/single-quote spans are protected: a `#` or
    * `--` INSIDE an identifier like `` `special_#@*_table` `` is
    * identifier text, not a comment.
    */
  private[meta] def stripComments(s: String): String = {
    val out = new StringBuilder(s.length)
    var i = 0
    var quote: Char = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (quote != 0) {
        out.append(c)
        if (c == quote) quote = 0
        i += 1
      } else if (c == '`' || c == '"' || c == '\'') {
        quote = c; out.append(c); i += 1
      } else if (c == '/' && i + 1 < s.length && s.charAt(i + 1) == '*') {
        val end = s.indexOf("*/", i + 2)
        if (end < 0) { out.append(s.substring(i)); i = s.length }
        else { out.append(' '); i = end + 2 }
      } else if ((c == '#') ||
          (c == '-' && i + 1 < s.length && s.charAt(i + 1) == '-')) {
        val nl = s.indexOf('\n', i)
        if (nl < 0) i = s.length else { out.append(' '); i = nl }
      } else { out.append(c); i += 1 }
    }
    out.toString
  }

  /** Parse one statement; multi-object DROP/RENAME yield several
    * statements (reference `split_to_multi`).
    */
  def parse(sql: String): Seq[DdlStatement] = {
    val s = stripComments(sql).trim.stripSuffix(";").trim
    var m = createDbRe.matcher(s)
    if (m.matches())
      return Seq(CreateDatabase(unq(m, 2), m.group(1) != null))
    m = dropDbRe.matcher(s)
    if (m.matches())
      return Seq(DropDatabase(unq(m, 2), m.group(1) != null))
    m = alterDbRe.matcher(s)
    if (m.matches())
      return Seq(AlterDatabase(unq(m, 1), m.group(4).trim))
    m = createSchemaRe.matcher(s)
    if (m.matches())
      return Seq(CreateSchema(unq(m, 3), m.group(1) != null,
        m.group(2) != null))
    m = dropSchemaRe.matcher(s)
    if (m.matches())
      return Seq(DropSchema(unq(m, 2), m.group(1) != null))
    m = alterSchemaRe.matcher(s)
    if (m.matches()) {
      val rest = m.group(4).trim
      val rm = renameToRe.matcher(rest)
      return Seq(
        if (rm.matches()) AlterSchema(unq(m, 1), Some(unq(rm, 1)))
        else AlterSchema(unq(m, 1), None, rest))
    }
    m = createTbRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 3)
      val modifier = Option(m.group(1)).map(_.trim).getOrElse("")
      return Seq(CreateTable(db, tb, m.group(9).trim,
        m.group(2) != null, modifier))
    }
    m = dropTbRe.matcher(s)
    if (m.matches()) {
      val ifExists = m.group(1) != null
      return m.group(2).split(",").toSeq.map(_.trim).map { one =>
        val mm = qualOnlyRe.matcher(one)
        if (mm.matches()) {
          val (db, tb) = qualName(mm, 1)
          DropTable(db, tb, ifExists)
        } else RawDdl(s"DROP TABLE ${ie(ifExists)}$one")
      }
    }
    m = truncateRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 1)
      return Seq(TruncateTable(db, tb))
    }
    m = renameRe.matcher(s)
    if (m.matches()) {
      return m.group(1).split(",").toSeq.map(_.trim).map { pair =>
        val mm = renamePairRe.matcher(pair)
        if (mm.matches()) {
          val (fdb, ftb) = qualName(mm, 1)
          val (tdb, ttb) = qualName(mm, 7)
          RenameTable(fdb, ftb, tdb, ttb)
        } else RawDdl(s"RENAME TABLE $pair")
      }
    }
    m = createIdxRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 6)
      return Seq(CreateIndex(unq(m, 2), db, tb, m.group(12).trim,
        m.group(1) != null, Option(m.group(5)).getOrElse("")))
    }
    m = dropIdxRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 4)
      return Seq(DropIndex(unq(m, 1), db, tb,
        Option(m.group(10)).map(_.trim).getOrElse("")))
    }
    m = alterRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 1)
      val alteration = m.group(7).trim
      val rm = alterRenameRe.matcher(alteration)
      if (rm.matches()) {
        val (ndb, ntb) = qualName(rm, 1)
        return Seq(AlterTableRename(db, tb, ndb, ntb))
      }
      val sm = alterSetSchemaRe.matcher(alteration)
      if (sm.matches())
        return Seq(AlterTableSetSchema(db, tb, unq(sm, 1)))
      return Seq(AlterTable(db, tb, alteration))
    }
    Seq(RawDdl(s))
  }

  /** The reference's DdlType name for a statement (ddl_meta/ddl_type.rs
    * spellings) — the token `do_ddls` config lists match against.
    */
  def ddlType(stmt: DdlStatement): String = stmt match {
    case _: CreateDatabase => "create_database"
    case _: DropDatabase => "drop_database"
    case _: AlterDatabase => "alter_database"
    case _: CreateSchema => "create_schema"
    case _: DropSchema => "drop_schema"
    case _: AlterSchema => "alter_schema"
    case m: MongoCommand => m.mongoType
    case _: CreateTable => "create_table"
    case _: DropTable => "drop_table"
    case _: TruncateTable => "truncate_table"
    // the reference types both rename-via-alter and SET SCHEMA as
    // AlterTable (ddl_parser.rs test_alter_rename_table_*)
    case _: AlterTable | _: AlterTableRename |
        _: AlterTableSetSchema => "alter_table"
    case _: RenameTable => "rename_table"
    case _: CreateIndex => "create_index"
    case _: DropIndex => "drop_index"
    case _: RawDdl => "unknown"
  }

  /** The (schema, tb) a statement targets, for the DDL filter gate —
    * database-level statements report an empty tb.
    */
  def target(stmt: DdlStatement, defaultDb: String): (String, String) =
    stmt match {
      case CreateDatabase(db, _) => (db, "")
      case DropDatabase(db, _) => (db, "")
      case AlterDatabase(db, _) => (db, "")
      case CreateSchema(sc, _, _) => (sc, "")
      case DropSchema(sc, _) => (sc, "")
      case AlterSchema(sc, _, _) => (sc, "")
      case MongoCommand(_, sc, tb, _, _, _) => (sc, tb)
      case c: CreateTable => (c.db.getOrElse(defaultDb), c.tb)
      case DropTable(db, tb, _) => (db.getOrElse(defaultDb), tb)
      case TruncateTable(db, tb) => (db.getOrElse(defaultDb), tb)
      case AlterTable(db, tb, _) => (db.getOrElse(defaultDb), tb)
      case AlterTableRename(db, tb, _, _) => (db.getOrElse(defaultDb), tb)
      case AlterTableSetSchema(db, tb, _) => (db.getOrElse(defaultDb), tb)
      case RenameTable(fdb, ftb, _, _) => (fdb.getOrElse(defaultDb), ftb)
      case i: CreateIndex => (i.db.getOrElse(defaultDb), i.tb)
      case i: DropIndex => (i.db.getOrElse(defaultDb), i.tb)
      case _: RawDdl => (defaultDb, "")
    }

  /** Route a parsed statement through schema/table maps (the reference's
    * DDL routing incl. RENAME targets, rdb_router.rs:286-317).
    */
  def route(stmt: DdlStatement, router: Router,
      defaultDb: String): DdlStatement = {
    def rt(db: Option[String], tb: String): (Option[String], String) = {
      val (s, t) = router.routeTable(db.getOrElse(defaultDb), tb)
      (Some(s), t)
    }
    stmt match {
      case CreateDatabase(db, i) =>
        CreateDatabase(router.routeTable(db, "*")._1, i)
      case DropDatabase(db, i) =>
        DropDatabase(router.routeTable(db, "*")._1, i)
      case a @ AlterDatabase(db, _) =>
        a.copy(db = router.routeTable(db, "*")._1)
      case c @ CreateSchema(sc, _, _) =>
        c.copy(schema = router.routeTable(sc, "*")._1)
      case d @ DropSchema(sc, _) =>
        d.copy(schema = router.routeTable(sc, "*")._1)
      case a @ AlterSchema(sc, newSc, _) =>
        a.copy(schema = router.routeTable(sc, "*")._1,
          newSchema = newSc.map(router.routeTable(_, "*")._1))
      case mc @ MongoCommand(_, sc, tb, newSc, newTb, _) =>
        // rdb_router.rs:286-317: a rename routes BOTH namespaces; all
        // other mongo commands route (schema, tb) only
        val (s2, t2) = router.routeTable(sc, tb)
        if (newTb.nonEmpty) {
          val (ns2, nt2) = router.routeTable(newSc, newTb)
          mc.copy(schema = s2, tb = t2, newSchema = ns2, newTb = nt2)
        } else mc.copy(schema = s2, tb = t2)
      case c: CreateTable =>
        val (d2, t2) = rt(c.db, c.tb); c.copy(db = d2, tb = t2)
      case d @ DropTable(db, tb, _) =>
        val (d2, t2) = rt(db, tb); d.copy(db = d2, tb = t2)
      case t @ TruncateTable(db, tb) =>
        val (d2, t2) = rt(db, tb); t.copy(db = d2, tb = t2)
      case a @ AlterTable(db, tb, _) =>
        val (d2, t2) = rt(db, tb); a.copy(db = d2, tb = t2)
      case AlterTableRename(db, tb, ndb, ntb) =>
        // both namespaces route, like RENAME TABLE
        val (d2, t2) = rt(db, tb)
        val (nd2, nt2) = rt(ndb, ntb)
        AlterTableRename(d2, t2, nd2, nt2)
      case AlterTableSetSchema(db, tb, newSchema) =>
        val (d2, t2) = rt(db, tb)
        AlterTableSetSchema(d2, t2, router.routeTable(newSchema, "*")._1)
      case RenameTable(fdb, ftb, tdb, ttb) =>
        val (f2, ft2) = rt(fdb, ftb)
        val (t2, tt2) = rt(tdb, ttb)
        RenameTable(f2, ft2, t2, tt2)
      case i: CreateIndex =>
        val (d2, t2) = rt(i.db, i.tb); i.copy(db = d2, tb = t2)
      case i: DropIndex =>
        val (d2, t2) = rt(i.db, i.tb); i.copy(db = d2, tb = t2)
      case r: RawDdl => r
    }
  }
}
