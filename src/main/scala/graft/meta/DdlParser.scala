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

  /** Render/fold dialect — the reference's DdlParser::new(DbType)
    * (ddl_parser.rs): MySQL quotes with backticks and preserves
    * identifier case; PG quotes with double quotes and folds UNQUOTED
    * identifiers to lower case (test_create_table_with_schema_with_
    * upper_case_pg: Test_DB -> "test_db" but "Test_DB" stays).
    */
  sealed trait SqlDialect {
    def q(id: String): String
    def fold(id: String): String
  }
  case object Mysql extends SqlDialect {
    def q(id: String) = s"`$id`"
    def fold(id: String) = id
  }
  case object Pg extends SqlDialect {
    def q(id: String) = "\"" + id + "\""
    def fold(id: String) = id.toLowerCase
  }

  sealed trait DdlStatement {
    def render(d: SqlDialect): String
    final def render: String = render(Mysql)
  }
  final case class CreateDatabase(db: String, ifNotExists: Boolean)
      extends DdlStatement {
    def render(d: SqlDialect) =
      s"CREATE DATABASE ${ine(ifNotExists)}${d.q(db)}"
  }
  final case class DropDatabase(db: String, ifExists: Boolean)
      extends DdlStatement {
    def render(d: SqlDialect) =
      s"DROP DATABASE ${ie(ifExists)}${d.q(db)}"
  }
  final case class AlterDatabase(db: String, alteration: String)
      extends DdlStatement {
    def render(d: SqlDialect) = s"ALTER DATABASE ${d.q(db)} $alteration"
  }
  /** PG-style schema namespace DDL — the reference types these apart
    * from database DDL by keyword (ddl_parser.rs:183-272), so `CREATE
    * SCHEMA` is `create_schema` even on engines where SCHEMA aliases
    * DATABASE.
    */
  final case class CreateSchema(schema: String, ifNotExists: Boolean,
      authorization: Boolean = false, trailing: String = "")
      extends DdlStatement {
    // trailing carries a post-name `AUTHORIZATION owner` clause
    // verbatim (ddl_parser.rs test_create_schema_pg: "create schema if
    // not exists match authorization hehe" keeps the tail as written)
    def render(d: SqlDialect) = s"CREATE SCHEMA ${ine(ifNotExists)}" +
      s"${if (authorization) "AUTHORIZATION " else ""}${d.q(schema)}" +
      (if (trailing.isEmpty) "" else s" $trailing")
  }
  final case class DropSchema(schema: String, ifExists: Boolean)
      extends DdlStatement {
    def render(d: SqlDialect) =
      s"DROP SCHEMA ${ie(ifExists)}${d.q(schema)}"
  }
  /** ALTER SCHEMA: RENAME TO is modeled (it re-namespaces every table
    * under the schema); other alterations ride along verbatim.
    */
  final case class AlterSchema(schema: String,
      newSchema: Option[String], unparsed: String = "")
      extends DdlStatement {
    def render(d: SqlDialect) = newSchema match {
      case Some(n) =>
        s"ALTER SCHEMA ${d.q(schema)} RENAME TO ${d.q(n)}"
      case None => s"ALTER SCHEMA ${d.q(schema)} $unparsed"
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
    def render(d: SqlDialect) = {
      val m = if (modifier.isEmpty) "" else s"$modifier "
      s"CREATE ${m}TABLE ${ine(ifNotExists)}${qt(d, db, tb)} $body"
    }
  }
  final case class DropTable(db: Option[String], tb: String,
      ifExists: Boolean) extends DdlStatement {
    def render(d: SqlDialect) =
      s"DROP TABLE ${ie(ifExists)}${qt(d, db, tb)}"
  }
  final case class TruncateTable(db: Option[String], tb: String,
      only: Boolean = false) extends DdlStatement {
    // PG TRUNCATE [TABLE] [ONLY] — canonical render restores the
    // TABLE keyword and keeps ONLY (ddl_parser.rs test_truncate_table_pg)
    def render(d: SqlDialect) =
      s"TRUNCATE TABLE ${if (only) "ONLY " else ""}${qt(d, db, tb)}"
  }
  final case class AlterTable(db: Option[String], tb: String,
      alteration: String, ifExists: Boolean = false,
      only: Boolean = false) extends DdlStatement {
    def render(d: SqlDialect) =
      s"ALTER TABLE ${ie(ifExists)}${if (only) "ONLY " else ""}" +
        s"${qt(d, db, tb)} $alteration"
  }
  /** `ALTER TABLE x RENAME [TO|AS] y` — the reference models this as a
    * dedicated statement (ddl_statement.rs MysqlAlterTableRename /
    * PgAlterTableRename) precisely so the router can rewrite BOTH
    * namespaces; folding it into the free-text alteration would leave
    * the rename target unrouted. Canonical render is the reference's
    * `RENAME TO` form regardless of the surface spelling.
    */
  final case class AlterTableRename(db: Option[String], tb: String,
      newDb: Option[String], newTb: String, ifExists: Boolean = false,
      only: Boolean = false) extends DdlStatement {
    def render(d: SqlDialect) =
      s"ALTER TABLE ${ie(ifExists)}${if (only) "ONLY " else ""}" +
        s"${qt(d, db, tb)} RENAME TO ${qt(d, newDb, newTb)}"
  }
  /** PG `ALTER TABLE s.t SET SCHEMA s2` (ddl_statement.rs
    * PgAlterTableSetSchema) — the new schema must route through the
    * schema map like any other namespace.
    */
  final case class AlterTableSetSchema(db: Option[String], tb: String,
      newSchema: String, ifExists: Boolean = false,
      only: Boolean = false) extends DdlStatement {
    def render(d: SqlDialect) =
      s"ALTER TABLE ${ie(ifExists)}${if (only) "ONLY " else ""}" +
        s"${qt(d, db, tb)} SET SCHEMA ${d.q(newSchema)}"
  }
  final case class RenameTable(fromDb: Option[String], fromTb: String,
      toDb: Option[String], toTb: String) extends DdlStatement {
    def render(d: SqlDialect) =
      s"RENAME TABLE ${qt(d, fromDb, fromTb)} TO ${qt(d, toDb, toTb)}"
  }
  final case class CreateIndex(index: String, db: Option[String],
      tb: String, cols: String, unique: Boolean = false,
      using: String = "", concurrently: Boolean = false,
      ifNotExists: Boolean = false, only: Boolean = false)
      extends DdlStatement {
    // index == "" is PG's nameless form: `create index on tb(id)`
    // (ddl_parser.rs test_create_index_pg)
    def render(d: SqlDialect) = {
      val u = if (unique) "UNIQUE " else ""
      val c = if (concurrently) "CONCURRENTLY " else ""
      val n = if (index.isEmpty) "" else s"${d.q(index)} "
      // the reference canonicalizes the index method to upper case
      // (test_create_index_mysql: `using  btree` → `USING BTREE`)
      val m = if (using.isEmpty) "" else s"USING ${using.toUpperCase} "
      val o = if (only) "ONLY " else ""
      s"CREATE ${u}INDEX $c${ine(ifNotExists)}$n${m}ON " +
        s"$o${qt(d, db, tb)} ($cols)"
    }
  }
  final case class DropIndex(index: String, db: Option[String],
      tb: String, trailing: String = "") extends DdlStatement {
    def render(d: SqlDialect) = {
      val t = if (trailing.isEmpty) "" else s" $trailing"
      s"DROP INDEX ${d.q(index)} ON ${qt(d, db, tb)}$t"
    }
  }

  /** PG `DROP INDEX [CONCURRENTLY] [IF EXISTS] i1[, i2…] [RESTRICT]`
    * — no ON clause; the reference keeps the multi-index list as ONE
    * statement (ddl_parser.rs test_drop_index_pg).
    */
  /** Each index is its identifier PARTS (`Seq("public", "idx1")` for
    * `public.idx1`) so render can quote schema and name separately —
    * quoting the dotted string whole would make the sink look for an
    * index literally named "public.idx1".
    */
  final case class DropIndexPg(indexes: Seq[Seq[String]],
      concurrently: Boolean = false, ifExists: Boolean = false,
      trailing: String = "") extends DdlStatement {
    def render(d: SqlDialect) = {
      val c = if (concurrently) "CONCURRENTLY " else ""
      val t = if (trailing.isEmpty) "" else s" $trailing"
      s"DROP INDEX $c${ie(ifExists)}" +
        indexes.map(_.map(d.q).mkString(".")).mkString(", ") + t
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
    def render(d: SqlDialect) = MongoDdl.rewriteNamespace(this)
    def isShardDdl: Boolean = MongoDdl.shardTypes.contains(mongoType)
  }

  /** Anything we don't model structurally: kept verbatim (still routable
    * at the statement level = not at all; flagged for manual handling).
    */
  final case class RawDdl(sql: String) extends DdlStatement {
    def render(d: SqlDialect) = sql
  }

  private def qt(d: SqlDialect, db: Option[String], tb: String) =
    db.fold(d.q(tb))(x => s"${d.q(x)}.${d.q(tb)}")
  private def ine(b: Boolean) = if (b) "IF NOT EXISTS " else ""
  private def ie(b: Boolean) = if (b) "IF EXISTS " else ""

  private val id = """(?:`([^`]+)`|"([^"]+)"|([A-Za-z_][\w$]*))"""
  private val qual = s"$id(?:\\s*\\.\\s*$id)?"

  private def unq(m: java.util.regex.Matcher, base: Int,
      d: SqlDialect = Mysql): String = {
    // group layout per id: (backtick, dquote, bare) — only a BARE
    // identifier case-folds (PG lowercases unquoted, quoted preserved;
    // ddl_parser.rs test_create_table_with_schema_with_upper_case_pg)
    if (m.group(base) != null) m.group(base)
    else if (m.group(base + 1) != null) m.group(base + 1)
    else if (m.group(base + 2) != null) d.fold(m.group(base + 2))
    else null
  }

  /** (db?, tb) from a qualified-name match starting at group `base`. */
  private def qualName(m: java.util.regex.Matcher, base: Int,
      d: SqlDialect = Mysql): (Option[String], String) = {
    val first = unq(m, base, d)
    val second = unq(m, base + 3, d)
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
    re(s"^\\s*CREATE\\s+SCHEMA\\s+(IF\\s+NOT\\s+EXISTS\\s+)?" +
      s"(AUTHORIZATION\\s+)?$id\\s*(.*)$$")
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
    re(s"^\\s*TRUNCATE\\s+(?:TABLE\\s+)?(ONLY\\s+)?$qual\\s*$$")
  private val alterRe =
    re(s"^\\s*ALTER\\s+TABLE\\s+(IF\\s+EXISTS\\s+)?(ONLY\\s+)?" +
      s"$qual\\s+(.*)$$")
  private val renameRe =
    re(s"^\\s*RENAME\\s+TABLE\\s+(.*)$$")
  private val renamePairRe = re(s"^\\s*$qual\\s+TO\\s+$qual\\s*$$")
  private val createIdxRe =
    re(s"^\\s*CREATE\\s+(UNIQUE\\s+)?INDEX\\s+(CONCURRENTLY\\s+)?" +
      s"(IF\\s+NOT\\s+EXISTS\\s+)?(?:(?!ON\\b)$id\\s*)?" +
      s"(?:USING\\s+(\\w+)\\s+)?ON\\s+(ONLY\\s+)?" +
      s"$qual\\s*\\((.*)\\)\\s*$$")
  private val dropIdxRe =
    re(s"^\\s*DROP\\s+INDEX\\s+$id\\s+ON\\s+$qual\\s*(.*)$$")
  // PG form: no ON clause, optional CONCURRENTLY/IF EXISTS, a
  // comma-separated index list kept as ONE statement, trailing
  // RESTRICT/CASCADE verbatim (ddl_parser.rs test_drop_index_pg)
  // whitespace REQUIRED before RESTRICT/CASCADE: with the keyword
  // directly adjacent the lazy name group would surrender its own
  // tail, truncating an index named e.g. idx_cascade to "idx_"
  private val dropIdxPgRe =
    re(s"^\\s*DROP\\s+INDEX\\s+(CONCURRENTLY\\s+)?" +
      s"(IF\\s+EXISTS\\s+)?([^;]+?)(?:\\s+(RESTRICT|CASCADE))?\\s*$$")
  private val qualOnlyRe = re(s"^\\s*$qual\\s*$$")
  private val idOnlyRe = re(s"^\\s*$id\\s*$$")

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
  def parse(sql: String): Seq[DdlStatement] = parse(sql, Mysql)

  /** Quick DDL-vs-DML judgment on the leading keyword — the
    * reference's `ddl_simple_judgment` (ddl_parser.rs): DML
    * (INSERT/REPLACE/UPDATE/DELETE/SELECT…) is not DDL and must not
    * even enter the DDL parser.
    */
  def isDdlStatement(sql: String): Boolean = {
    val head = stripComments(sql).trim.takeWhile(!_.isWhitespace)
      .toUpperCase
    Set("CREATE", "DROP", "ALTER", "TRUNCATE", "RENAME")
      .contains(head)
  }

  def parse(sql: String, d: SqlDialect): Seq[DdlStatement] = {
    if (!isDdlStatement(sql)) return Seq(RawDdl(sql.trim))
    val s = stripComments(sql).trim.stripSuffix(";").trim
    var m = createDbRe.matcher(s)
    if (m.matches())
      return Seq(CreateDatabase(unq(m, 2, d), m.group(1) != null))
    m = dropDbRe.matcher(s)
    if (m.matches())
      return Seq(DropDatabase(unq(m, 2, d), m.group(1) != null))
    m = alterDbRe.matcher(s)
    if (m.matches())
      return Seq(AlterDatabase(unq(m, 1, d), m.group(4).trim))
    m = createSchemaRe.matcher(s)
    if (m.matches())
      return Seq(CreateSchema(unq(m, 3, d), m.group(1) != null,
        m.group(2) != null, m.group(6).trim))
    m = dropSchemaRe.matcher(s)
    if (m.matches())
      return Seq(DropSchema(unq(m, 2, d), m.group(1) != null))
    m = alterSchemaRe.matcher(s)
    if (m.matches()) {
      val rest = m.group(4).trim
      val rm = renameToRe.matcher(rest)
      return Seq(
        if (rm.matches()) AlterSchema(unq(m, 1, d), Some(unq(rm, 1, d)))
        else AlterSchema(unq(m, 1, d), None, rest))
    }
    m = createTbRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 3, d)
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
          val (db, tb) = qualName(mm, 1, d)
          DropTable(db, tb, ifExists)
        } else RawDdl(s"DROP TABLE ${ie(ifExists)}$one")
      }
    }
    m = truncateRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 2, d)
      return Seq(TruncateTable(db, tb, only = m.group(1) != null))
    }
    m = renameRe.matcher(s)
    if (m.matches()) {
      return m.group(1).split(",").toSeq.map(_.trim).map { pair =>
        val mm = renamePairRe.matcher(pair)
        if (mm.matches()) {
          val (fdb, ftb) = qualName(mm, 1, d)
          val (tdb, ttb) = qualName(mm, 7, d)
          RenameTable(fdb, ftb, tdb, ttb)
        } else RawDdl(s"RENAME TABLE $pair")
      }
    }
    m = createIdxRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 9, d)
      val name = Option(unq(m, 4, d)).getOrElse("")
      return Seq(CreateIndex(name, db, tb, m.group(15).trim,
        unique = m.group(1) != null,
        using = Option(m.group(7)).getOrElse(""),
        concurrently = m.group(2) != null,
        ifNotExists = m.group(3) != null,
        only = m.group(8) != null))
    }
    m = dropIdxRe.matcher(s)
    if (m.matches()) {
      val (db, tb) = qualName(m, 4, d)
      return Seq(DropIndex(unq(m, 1, d), db, tb,
        Option(m.group(10)).map(_.trim).getOrElse("")))
    }
    m = dropIdxPgRe.matcher(s)
    if (m.matches()) {
      val names = m.group(3).split(",").toSeq.map(_.trim).map { one =>
        // schema-qualified (public.idx1) splits into parts so render
        // quotes each separately; a bare id unquotes; anything odd
        // stays verbatim as a single part
        val qm = qualOnlyRe.matcher(one)
        val mm = idOnlyRe.matcher(one)
        if (qm.matches()) {
          val (sch, nm) = qualName(qm, 1, d)
          sch.map(Seq(_, nm)).getOrElse(Seq(nm))
        } else if (mm.matches()) Seq(unq(mm, 1, d))
        else Seq(one)
      }
      return Seq(DropIndexPg(names,
        concurrently = m.group(1) != null,
        ifExists = m.group(2) != null,
        trailing = Option(m.group(4)).map(_.toUpperCase)
          .getOrElse("")))
    }
    m = alterRe.matcher(s)
    if (m.matches()) {
      val ifExists = m.group(1) != null
      var only = m.group(2) != null
      val (db, tb0) = qualName(m, 3, d)
      var tb = tb0
      var alteration = m.group(9).trim
      // ONLY is not reserved in MySQL: for `ALTER TABLE only ADD
      // COLUMN …` the greedy (ONLY\s+)? steals the table name and the
      // next token lands as tb. Disambiguate by what a real
      // alteration must start with — if it doesn't, ONLY WAS the
      // table and tb+alteration shift back by one token.
      val verbs = Set("ADD", "DROP", "ALTER", "MODIFY", "CHANGE",
        "RENAME", "SET", "RESET", "OWNER", "ENABLE", "DISABLE",
        "VALIDATE", "ATTACH", "DETACH", "CLUSTER", "REPLICA",
        "INHERIT", "NO", "FORCE", "CONVERT", "DEFAULT", "CHARACTER",
        "COMMENT", "ENGINE", "AUTO_INCREMENT", "COLLATE", "ORDER",
        "DISCARD", "IMPORT", "TRUNCATE", "PARTITION", "ROW_FORMAT",
        "LOCK", "ALGORITHM", "NOT", "OF", "READ")
      if (only && db.isEmpty &&
          !verbs(alteration.split("\\s+|=", 2).head.toUpperCase)) {
        // raw source text for the stolen token (no identifier fold —
        // it becomes alteration TEXT, rendered verbatim) and the
        // dialect fold for the ONLY token that becomes the table name
        alteration =
          (s.substring(m.end(2), m.start(9)).trim + " " +
            alteration).trim
        tb = d.fold(m.group(2).trim)
        only = false
      }
      val rm = alterRenameRe.matcher(alteration)
      if (rm.matches()) {
        val (ndb, ntb) = qualName(rm, 1, d)
        return Seq(AlterTableRename(db, tb, ndb, ntb, ifExists, only))
      }
      val sm = alterSetSchemaRe.matcher(alteration)
      if (sm.matches())
        return Seq(
          AlterTableSetSchema(db, tb, unq(sm, 1, d), ifExists, only))
      return Seq(AlterTable(db, tb, alteration, ifExists, only))
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
    case _: DropIndex | _: DropIndexPg => "drop_index"
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
      case c: CreateSchema => (c.schema, "")
      case DropSchema(sc, _) => (sc, "")
      case AlterSchema(sc, _, _) => (sc, "")
      case MongoCommand(_, sc, tb, _, _, _) => (sc, tb)
      case c: CreateTable => (c.db.getOrElse(defaultDb), c.tb)
      case DropTable(db, tb, _) => (db.getOrElse(defaultDb), tb)
      case t: TruncateTable => (t.db.getOrElse(defaultDb), t.tb)
      case a: AlterTable => (a.db.getOrElse(defaultDb), a.tb)
      case a: AlterTableRename => (a.db.getOrElse(defaultDb), a.tb)
      case a: AlterTableSetSchema => (a.db.getOrElse(defaultDb), a.tb)
      case RenameTable(fdb, ftb, _, _) => (fdb.getOrElse(defaultDb), ftb)
      case i: CreateIndex => (i.db.getOrElse(defaultDb), i.tb)
      case i: DropIndex => (i.db.getOrElse(defaultDb), i.tb)
      // PG drop index names no table; the filter gate sees only the
      // default namespace (the reference's drop index carries no
      // schema/tb either)
      case _: DropIndexPg => (defaultDb, "")
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
      case c: CreateSchema =>
        c.copy(schema = router.routeTable(c.schema, "*")._1)
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
      case t: TruncateTable =>
        val (d2, t2) = rt(t.db, t.tb); t.copy(db = d2, tb = t2)
      case a: AlterTable =>
        val (d2, t2) = rt(a.db, a.tb); a.copy(db = d2, tb = t2)
      case a: AlterTableRename =>
        // both namespaces route, like RENAME TABLE
        val (d2, t2) = rt(a.db, a.tb)
        val (nd2, nt2) = rt(a.newDb, a.newTb)
        a.copy(db = d2, tb = t2, newDb = nd2, newTb = nt2)
      case a: AlterTableSetSchema =>
        val (d2, t2) = rt(a.db, a.tb)
        a.copy(db = d2, tb = t2,
          newSchema = router.routeTable(a.newSchema, "*")._1)
      case RenameTable(fdb, ftb, tdb, ttb) =>
        val (f2, ft2) = rt(fdb, ftb)
        val (t2, tt2) = rt(tdb, ttb)
        RenameTable(f2, ft2, t2, tt2)
      case i: CreateIndex =>
        val (d2, t2) = rt(i.db, i.tb); i.copy(db = d2, tb = t2)
      case i: DropIndex =>
        val (d2, t2) = rt(i.db, i.tb); i.copy(db = d2, tb = t2)
      case i: DropIndexPg => i // no namespace to route
      case r: RawDdl => r
    }
  }
}
