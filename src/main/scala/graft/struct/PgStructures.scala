package graft.struct

import graft.operators.NameFilter
import graft.struct.StructMigrator.{ColumnDef, TableDef}

/** PostgreSQL structure kinds beyond table+index: sequences (serial
  * linkage + ownership), COMMENT ON, RBAC (roles, memberships, grants),
  * and UDT/UDF pass-through — the structure surface of the reference's
  * 1,570-line pg_struct_fetcher
  * (/root/reference/dt-connector/src/meta_fetcher/pg/pg_struct_fetcher.rs)
  * with rendering per pg_create_table_statement.rs /
  * pg_create_rbac_statement.rs / pg_create_udt_statement.rs.
  *
  * Like [[StructMigrator]], this is metadata-in, DDL-strings-out — no
  * Spark execution; each (key, sql) pair executes over plain JDBC and
  * the key dedups across restarts. Statement ORDER inside a table
  * statement is load-bearing and mirrors the reference
  * (pg_create_table_statement.rs `to_sqls`): sequences before the table
  * that defaults to them, ownership after both, comments after the
  * table, constraints and indexes last.
  */
object PgStructures {

  final case class SequenceDef(schema: String, name: String,
      dataType: String = "bigint", start: Long = 1L, increment: Long = 1L,
      minValue: Long = 1L, maxValue: Long = Long.MaxValue,
      cycle: Boolean = false)

  final case class SequenceOwnerDef(schema: String, sequence: String,
      table: String, column: String)

  /** column = None → table comment. */
  final case class CommentDef(schema: String, table: String,
      column: Option[String], comment: String)

  final case class RoleDef(name: String, superuser: Boolean = false,
      createDb: Boolean = false, createRole: Boolean = false,
      inherit: Boolean = true, login: Boolean = false,
      replication: Boolean = false, bypassRls: Boolean = false,
      connLimit: Option[Long] = None, password: Option[String] = None,
      validUntil: Option[String] = None,
      configs: Seq[(String, String)] = Nil)

  final case class RoleMemberDef(role: String, member: String,
      adminOption: Boolean = false)

  /** Privileges arrive from the catalog as complete GRANT statements
    * (reference PgPrivilege {key, origin}); rendered verbatim.
    */
  final case class PrivilegeDef(key: String, grantSql: String)

  /** UDTs/UDFs arrive as complete CREATE statements assembled by the
    * catalog query (reference get_enum/compose/range/domain_udt and
    * get_udf_statements); kind tags the key for per-kind gating.
    */
  final case class UdtDef(schema: String, name: String, kind: String,
      createSql: String)
  final case class UdfDef(schema: String, name: String,
      createSql: String)

  private def q(id: String): String = s""""$id""""

  /** Parse a serial column's default — `nextval('seq'::regclass)`,
    * schema-qualified and/or quoted — into (schema, sequence); empty
    * schema when unqualified (reference
    * get_sequence_name_by_default_value, pg_struct_fetcher.rs:1442).
    */
  def sequenceNameFromDefault(defaultValue: String)
      : Option[(String, String)] = {
    val v = defaultValue.trim
    if (!v.startsWith("nextval(")) return None
    var inner = v.stripPrefix("nextval(").stripSuffix(")")
    inner = inner.stripPrefix("'")
    inner = inner.stripSuffix("::regclass")
    inner = inner.stripSuffix("'")
    // split on dots outside double quotes
    val parts = Seq.newBuilder[String]
    val sb = new StringBuilder
    var inQuote = false
    inner.foreach {
      case '"' => inQuote = !inQuote
      case '.' if !inQuote => parts += sb.toString; sb.clear()
      case c => sb += c
    }
    parts += sb.toString
    parts.result() match {
      case Seq(seq) => Some(("", seq))
      case Seq(schema, seq) => Some((schema, seq))
      case _ => None
    }
  }

  def sequenceSql(s: SequenceDef): String = {
    val cycle = if (s.cycle) "CYCLE" else "NO CYCLE"
    s"CREATE SEQUENCE IF NOT EXISTS ${q(s.schema)}.${q(s.name)} " +
      s"AS ${s.dataType} START ${s.start} INCREMENT by ${s.increment} " +
      s"MINVALUE ${s.minValue} MAXVALUE ${s.maxValue} $cycle"
  }

  def sequenceOwnerSql(o: SequenceOwnerDef): String =
    s"ALTER SEQUENCE ${q(o.schema)}.${q(o.sequence)} OWNED BY " +
      s"${q(o.schema)}.${q(o.table)}.${q(o.column)}"

  /** Escaped single-quoted literal: embedded quotes are doubled. */
  private def strLit(s: String): String = "'" + s.replace("'", "''") + "'"

  /** Dollar-quote with a tag guaranteed absent from the text — a bare
    * `$$` breaks (and is injectable) the moment the text itself
    * contains `$$`.
    */
  private def dollarQuote(text: String): String = {
    var tag = "$graft$"
    var i = 0
    while (text.contains(tag)) { tag = "$graft" + i + "$"; i += 1 }
    tag + text + tag
  }

  /** Dollar-quoted so embedded quotes survive verbatim (reference
    * comment_to_sql).
    */
  def commentSql(c: CommentDef): String = c.column match {
    case None =>
      s"COMMENT ON TABLE ${q(c.schema)}.${q(c.table)} IS " +
        dollarQuote(c.comment)
    case Some(col) =>
      s"COMMENT ON COLUMN ${q(c.schema)}.${q(c.table)}.${q(col)} IS " +
        dollarQuote(c.comment)
  }

  def roleSql(r: RoleDef): String = {
    val opts = Seq(
      if (r.superuser) Some("SUPERUSER") else None,
      if (r.createDb) Some("CREATEDB") else None,
      if (r.createRole) Some("CREATEROLE") else None,
      if (!r.inherit) Some("NOINHERIT") else None, // inherit is default
      if (r.login) Some("LOGIN") else None,
      if (r.replication) Some("REPLICATION") else None,
      if (r.bypassRls) Some("BYPASSRLS") else None,
      r.connLimit.filter(_ != -1L).map(n => s"CONNECTION LIMIT $n"),
      r.password.map(p => s"PASSWORD ${strLit(p)}"),
      r.validUntil.map(v => s"VALID UNTIL ${strLit(v)}")).flatten
    val base = s"CREATE ROLE ${q(r.name)}"
    if (opts.isEmpty) base else s"$base WITH ${opts.mkString(" ")}"
  }

  def roleConfigSqls(r: RoleDef): Seq[(String, String)] =
    r.configs.collect {
      case (param, value) if param.nonEmpty && value.nonEmpty =>
        (s"rbac.role_config.${r.name}.$param",
          s"ALTER ROLE ${q(r.name)} SET $param TO ${strLit(value)}")
    }

  def roleMemberSql(m: RoleMemberDef): String = {
    val base = s"GRANT ${q(m.role)} TO ${q(m.member)}"
    if (m.adminOption) s"$base WITH ADMIN OPTION" else base
  }

  /** The full PG table statement — the reference's
    * PgCreateTableStatement with its kind gating: sequences, table
    * body, ownership, and comments ride the `table` kind (plus
    * `sequence`/`comment` sub-gates this side adds for finer control);
    * PRIMARY KEY/UNIQUE constraints belong to the table, other
    * constraints to `constraint`, plain indexes to `index`.
    */
  final case class PgTableStatement(table: TableDef,
      sequences: Seq[SequenceDef] = Nil,
      sequenceOwners: Seq[SequenceOwnerDef] = Nil,
      comments: Seq[CommentDef] = Nil,
      columnDefaults: Map[String, String] = Map.empty,
      checkConstraints: Seq[(String, String)] = Nil) {

    /** Route to a destination schema/table (reference `route`). */
    def route(dstSchema: String, dstTb: String): PgTableStatement =
      PgTableStatement(
        table.copy(schema = dstSchema, name = dstTb),
        sequences.map(_.copy(schema = dstSchema)),
        sequenceOwners.map(_.copy(schema = dstSchema, table = dstTb)),
        comments.map(_.copy(schema = dstSchema, table = dstTb)),
        columnDefaults, checkConstraints)

    private def tableSql: String = {
      val d = StructMigrator.PostgresDialect
      val cols = table.cols.map { c =>
        val nn = if (c.nullable) "" else " NOT NULL"
        val dflt = columnDefaults.get(c.name)
          .fold("")(v => s" DEFAULT $v")
        s"  ${q(c.name)} ${d.typeName(c.dataType)}$nn$dflt"
      }
      val pk = if (table.primaryKey.isEmpty) Nil
        else Seq(s"  PRIMARY KEY (${table.primaryKey.map(q).mkString(", ")})")
      s"CREATE TABLE IF NOT EXISTS ${q(table.schema)}.${q(table.name)} (\n" +
        (cols ++ pk).mkString(",\n") + "\n)"
    }

    /** Ordered (key, sql) pairs, reference to_sqls order. */
    def toSqls(filter: NameFilter): Seq[(String, String)] = {
      val out = Seq.newBuilder[(String, String)]
      val tableKind = filter.allowStructure("table")
      if (tableKind && filter.allowStructure("sequence"))
        sequences.foreach(s =>
          out += ((s"sequence.${s.schema}.${s.name}", sequenceSql(s))))
      if (tableKind)
        out += ((s"table.${table.schema}.${table.name}", tableSql))
      if (tableKind && filter.allowStructure("sequence"))
        sequenceOwners.foreach(o =>
          out += ((s"sequence_owner.${o.schema}.${o.table}.${o.sequence}",
            sequenceOwnerSql(o))))
      if (tableKind && filter.allowStructure("comment"))
        comments.foreach { c =>
          val key = c.column match {
            case Some(col) =>
              s"column_comment.${c.schema}.${c.table}.$col"
            case None => s"table_comment.${c.schema}.${c.table}"
          }
          out += ((key, commentSql(c)))
        }
      if (filter.allowStructure("constraint"))
        checkConstraints.foreach { case (name, definition) =>
          out += ((s"constraint.${table.schema}.${table.name}.$name",
            s"ALTER TABLE ${q(table.schema)}.${q(table.name)} " +
              s"ADD CONSTRAINT ${q(name)} $definition"))
        }
      if (filter.allowStructure("index"))
        table.indexes.foreach { ix =>
          val u = if (ix.unique) "UNIQUE " else ""
          out += ((s"index.${table.schema}.${table.name}.${ix.name}",
            s"CREATE ${u}INDEX IF NOT EXISTS ${q(ix.name)} ON " +
              s"${q(table.schema)}.${q(table.name)} " +
              s"(${ix.cols.map(q).mkString(", ")})"))
        }
      out.result()
    }
  }

  object PgTableStatement {
    /** Build from a table whose columns carry catalog defaults: every
      * `nextval(...)` default becomes a sequence + ownership link (the
      * serial pattern — reference get_table_sequences /
      * get_sequence_owners, pg_struct_fetcher.rs:317,386).
      */
    def withSerialLinkage(table: TableDef,
        columnDefaults: Map[String, String],
        comments: Seq[CommentDef] = Nil): PgTableStatement = {
      val serials = table.cols.flatMap { c =>
        columnDefaults.get(c.name)
          .flatMap(sequenceNameFromDefault)
          .map { case (schema, seq) =>
            val sch = if (schema.isEmpty) table.schema else schema
            (c.name, SequenceDef(sch, seq),
              SequenceOwnerDef(sch, seq, table.name, c.name))
          }
      }
      PgTableStatement(table,
        sequences = serials.map(_._2),
        sequenceOwners = serials.map(_._3),
        comments = comments,
        columnDefaults = columnDefaults)
    }
  }

  /** RBAC statement: roles (+ per-role configs), memberships among
    * migrated roles only, grants verbatim — gated as one `rbac` kind
    * (reference pg_create_rbac_statement.rs).
    */
  final case class PgRbacStatement(roles: Seq[RoleDef] = Nil,
      members: Seq[RoleMemberDef] = Nil,
      privileges: Seq[PrivilegeDef] = Nil) {
    def toSqls(filter: NameFilter): Seq[(String, String)] = {
      if (!filter.allowStructure("rbac")) return Nil
      val roleNames = roles.map(_.name).toSet
      val out = Seq.newBuilder[(String, String)]
      roles.foreach { r =>
        out += ((s"rbac.role.${r.name}", roleSql(r)))
        out ++= roleConfigSqls(r)
      }
      members.filter(m => roleNames.contains(m.member)).foreach { m =>
        out += ((s"rbac.member.${m.role}.${m.member}.${m.adminOption}",
          roleMemberSql(m)))
      }
      privileges.filter(_.grantSql.nonEmpty).foreach(p =>
        out += ((p.key, p.grantSql)))
      out.result()
    }
  }

  def udtSqls(udts: Seq[UdtDef], filter: NameFilter)
      : Seq[(String, String)] =
    if (!filter.allowStructure("udt")) Nil
    else udts.map(u => (s"udt.${u.schema}.${u.name}", u.createSql))

  def udfSqls(udfs: Seq[UdfDef], filter: NameFilter)
      : Seq[(String, String)] =
    if (!filter.allowStructure("udf")) Nil
    else udfs.map(u => (s"udf.${u.schema}.${u.name}", u.createSql))
}
