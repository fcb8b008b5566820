package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.NameFilter
import graft.struct.PgStructures._
import graft.struct.StructMigrator
import graft.struct.StructMigrator.{ColumnDef, IndexDef, TableDef}

/** PG structure kinds battery — sequences + serial linkage, comments,
  * RBAC, UDT/UDF, per-kind gating and ordering per the reference's
  * pg_create_table_statement.rs / pg_create_rbac_statement.rs.
  */
class PgStructuresSpec extends AnyFunSuite {

  private val all = NameFilter(doStructures = Set("*"))

  private val usersTable = TableDef("app", "users",
    Seq(ColumnDef("id", LongType, nullable = false),
      ColumnDef("email", StringType, nullable = false),
      ColumnDef("note", StringType)),
    primaryKey = Seq("id"),
    indexes = Seq(IndexDef("ix_users_email", Seq("email"), unique = true)))

  private val serialStmt = PgTableStatement.withSerialLinkage(
    usersTable,
    columnDefaults = Map("id" -> "nextval('users_id_seq'::regclass)",
      "note" -> "'-'::text"),
    comments = Seq(
      CommentDef("app", "users", None, "user accounts"),
      CommentDef("app", "users", Some("email"), "it's unique")))

  test("serial pk expands to sequence + default + ownership in order") {
    val sqls = serialStmt.toSqls(all)
    val keys = sqls.map(_._1)
    assert(keys == Seq(
      "sequence.app.users_id_seq",
      "table.app.users",
      "sequence_owner.app.users.users_id_seq",
      "table_comment.app.users",
      "column_comment.app.users.email",
      "index.app.users.ix_users_email"))
    val byKey = sqls.toMap
    assert(byKey("sequence.app.users_id_seq") ==
      """CREATE SEQUENCE IF NOT EXISTS "app"."users_id_seq" AS bigint """ +
        "START 1 INCREMENT by 1 MINVALUE 1 MAXVALUE " +
        s"${Long.MaxValue} NO CYCLE")
    val tbl = byKey("table.app.users")
    assert(tbl.contains(
      """"id" BIGINT NOT NULL DEFAULT nextval('users_id_seq'::regclass)"""))
    assert(tbl.contains(""""note" TEXT DEFAULT '-'::text"""))
    assert(tbl.contains("""PRIMARY KEY ("id")"""))
    assert(byKey("sequence_owner.app.users.users_id_seq") ==
      """ALTER SEQUENCE "app"."users_id_seq" OWNED BY """ +
        """"app"."users"."id"""")
    // dollar-quoted comments survive embedded single quotes verbatim
    assert(byKey("column_comment.app.users.email") ==
      """COMMENT ON COLUMN "app"."users"."email" IS """ +
        "$graft$it's unique$graft$")
    assert(byKey("index.app.users.ix_users_email") ==
      """CREATE UNIQUE INDEX IF NOT EXISTS "ix_users_email" ON """ +
        """"app"."users" ("email")""")
  }

  test("sequence name parses from quoted and qualified defaults") {
    assert(sequenceNameFromDefault("nextval('users_id_seq'::regclass)")
      .contains(("", "users_id_seq")))
    assert(sequenceNameFromDefault(
      "nextval('public.users_id_seq'::regclass)")
      .contains(("public", "users_id_seq")))
    assert(sequenceNameFromDefault(
      """nextval('"my schema"."weird.seq"'::regclass)""")
      .contains(("my schema", "weird.seq")))
    assert(sequenceNameFromDefault("nextval('s1')")
      .contains(("", "s1"))) // ::regclass may be absent
    assert(sequenceNameFromDefault("'-'::text").isEmpty)
  }

  test("per-kind gating: sequence/comment/index drop independently") {
    def keysWith(kinds: String*) =
      serialStmt.toSqls(NameFilter(doStructures = kinds.toSet)).map(_._1)
    assert(keysWith("table") == Seq("table.app.users"))
    assert(keysWith("table", "sequence") == Seq(
      "sequence.app.users_id_seq", "table.app.users",
      "sequence_owner.app.users.users_id_seq"))
    assert(keysWith("index") == Seq("index.app.users.ix_users_email"))
    // sequence/comment kinds ride the table kind (reference nests them
    // under StructureType::Table)
    assert(keysWith("sequence", "comment") == Nil)
  }

  test("check constraints gate under constraint, not table") {
    val withCheck = serialStmt.copy(checkConstraints =
      Seq(("users_email_chk", "CHECK (email <> '')")))
    val only = withCheck.toSqls(NameFilter(doStructures = Set("constraint")))
    assert(only == Seq((
      "constraint.app.users.users_email_chk",
      """ALTER TABLE "app"."users" ADD CONSTRAINT "users_email_chk" """ +
        "CHECK (email <> '')")))
  }

  test("routing rewrites schema/table across every structure") {
    val routed = serialStmt.route("dst", "accounts")
    val keys = routed.toSqls(all).map(_._1)
    assert(keys == Seq(
      "sequence.dst.users_id_seq",
      "table.dst.accounts",
      "sequence_owner.dst.accounts.users_id_seq",
      "table_comment.dst.accounts",
      "column_comment.dst.accounts.email",
      "index.dst.accounts.ix_users_email"))
    assert(routed.toSqls(all).toMap.apply("sequence_owner.dst.accounts.users_id_seq")
      .contains(""""dst"."accounts"."id""""))
  }

  test("rbac renders roles, configs, members-among-roles, grants") {
    val rbac = PgRbacStatement(
      roles = Seq(
        RoleDef("app_rw", login = true, password = Some("secret"),
          connLimit = Some(10),
          configs = Seq(("search_path", "app"), ("", "x"))),
        RoleDef("admin", superuser = true, createDb = true,
          createRole = true, inherit = false, replication = true,
          bypassRls = true)),
      members = Seq(RoleMemberDef("admin", "app_rw", adminOption = true),
        RoleMemberDef("admin", "not_migrated")),
      privileges = Seq(PrivilegeDef("priv.app.users.app_rw",
        """GRANT SELECT ON TABLE "app"."users" TO "app_rw"""")))
    val sqls = rbac.toSqls(all)
    val byKey = sqls.toMap
    assert(byKey("rbac.role.app_rw") ==
      """CREATE ROLE "app_rw" WITH LOGIN CONNECTION LIMIT 10 """ +
        "PASSWORD 'secret'")
    assert(byKey("rbac.role.admin") ==
      """CREATE ROLE "admin" WITH SUPERUSER CREATEDB CREATEROLE """ +
        "NOINHERIT REPLICATION BYPASSRLS")
    assert(byKey("rbac.role_config.app_rw.search_path") ==
      """ALTER ROLE "app_rw" SET search_path TO 'app'""")
    assert(!byKey.keySet.exists(_.contains("role_config.app_rw.")) ||
      byKey.keySet.count(_.startsWith("rbac.role_config.")) == 1)
    // membership only among migrated roles
    assert(byKey.contains("rbac.member.admin.app_rw.true"))
    assert(byKey("rbac.member.admin.app_rw.true") ==
      """GRANT "admin" TO "app_rw" WITH ADMIN OPTION""")
    assert(!byKey.keySet.exists(_.contains("not_migrated")))
    assert(byKey("priv.app.users.app_rw").startsWith("GRANT SELECT"))
    // the rbac kind gates everything at once
    assert(rbac.toSqls(NameFilter(doStructures = Set("table"))) == Nil)
  }

  test("hostile comment and password text cannot break the DDL") {
    // a comment containing the quote tag itself forces a fresh tag
    val evil = CommentDef("app", "users", None,
      "has $graft$ and $$ inside")
    assert(commentSql(evil) ==
      """COMMENT ON TABLE "app"."users" IS """ +
        "$graft0$has $graft$ and $$ inside$graft0$")
    // single quotes in password / valid-until literals are doubled
    val role = RoleDef("evil", login = true,
      password = Some("o'brien'; DROP ROLE x; --"),
      validUntil = Some("2027-01-01'x"),
      configs = Seq(("search_path", "a'b")))
    assert(roleSql(role) ==
      """CREATE ROLE "evil" WITH LOGIN """ +
        "PASSWORD 'o''brien''; DROP ROLE x; --'" +
        " VALID UNTIL '2027-01-01''x'")
    assert(roleConfigSqls(role).head._2 ==
      """ALTER ROLE "evil" SET search_path TO 'a''b'""")
  }

  test("udt/udf pass through with per-kind gating") {
    val udts = Seq(
      UdtDef("app", "mood", "enum",
        """CREATE TYPE "app"."mood" AS ENUM ('sad', 'ok', 'happy');"""),
      UdtDef("app", "addr", "composite",
        """CREATE TYPE "app"."addr" AS (street text, city text);"""))
    val udfs = Seq(UdfDef("app", "add_one",
      "CREATE FUNCTION add_one(i int) RETURNS int AS $$ SELECT i+1 " +
        "$$ LANGUAGE sql;"))
    assert(udtSqls(udts, all).map(_._1) ==
      Seq("udt.app.mood", "udt.app.addr"))
    assert(udfSqls(udfs, all).map(_._1) == Seq("udf.app.add_one"))
    assert(udtSqls(udts, NameFilter(doStructures = Set("udf"))) == Nil)
    assert(udfSqls(udfs, NameFilter(doStructures = Set("udt"))) == Nil)
  }

  test("the four existing dialects render unchanged for the same table") {
    // regression fence: PgStructures must not disturb StructMigrator
    val mysql = StructMigrator.MySqlDialect.render(usersTable)
    assert(mysql.startsWith("CREATE TABLE IF NOT EXISTS `app`.`users`"))
    assert(mysql.contains("PRIMARY KEY (`id`)"))
    val pg = StructMigrator.PostgresDialect.render(usersTable)
    assert(pg.contains(""""email" TEXT NOT NULL"""))
    val sr = StructMigrator.StarRocksDialect.render(usersTable)
    assert(sr.contains("PRIMARY KEY (`id`) DISTRIBUTED BY HASH (`id`)"))
    val ch = StructMigrator.ClickHouseDialect.render(usersTable)
    assert(ch.contains("ENGINE = ReplacingMergeTree"))
  }
}
