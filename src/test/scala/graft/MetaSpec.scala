package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.meta.{DclParser, DdlParser, MetaManager}
import graft.operators.Routing
import graft.sources.SnapshotResumer

class MetaSpec extends SparkSuite {
  import DdlParser._

  test("ddl parse: database / table / truncate / alter") {
    assert(parse("CREATE DATABASE IF NOT EXISTS app") ==
      Seq(CreateDatabase("app", ifNotExists = true)))
    assert(parse("ALTER DATABASE app CHARACTER SET utf8mb4") ==
      Seq(AlterDatabase("app", "CHARACTER SET utf8mb4")))
    assert(parse("CREATE TABLE app.t (id INT PRIMARY KEY)") ==
      Seq(CreateTable(Some("app"), "t", "(id INT PRIMARY KEY)",
        ifNotExists = false)))
    assert(parse("TRUNCATE TABLE `app`.`t`") ==
      Seq(TruncateTable(Some("app"), "t")))
    assert(parse("ALTER TABLE t ADD COLUMN c INT") ==
      Seq(AlterTable(None, "t", "ADD COLUMN c INT")))
  }

  test("ddl parse: reference comment/spacing/special-char battery") {
    // the ddl_parser.rs test_create_table_with_schema_mysql vectors:
    // every surface form must land on the same parsed statement
    val want = Seq(CreateTable(Some("aaa"), "bbb", "(id int)",
      ifNotExists = false))
    for (sql <- Seq(
        "create table aaa.bbb (id int)",
        "create table `aaa`.`bbb` (id int)",
        "  create   table  aaa . bbb   (id int)  ",
        "  create   table  `aaa` . `bbb`   (id int)  ",
        "create /*some comments,*/table/*some comments*/ `aaa`.`bbb` " +
          "(id int)"))
      assert(parse(sql) == want, sql)
    assert(parse("create /*c,*/table/*c*/ if  not  exists  `aaa` .  " +
      "`bbb` (id int)  ") ==
      Seq(CreateTable(Some("aaa"), "bbb", "(id int)",
        ifNotExists = true)))
    // special characters stay identifier text inside quoting — `#`
    // and `--` are comment starters only OUTSIDE quotes
    assert(parse("create table `special_character_$1#@*_table` (id int)")
      == Seq(CreateTable(None, "special_character_$1#@*_table",
        "(id int)", ifNotExists = false)))
    assert(parse("CREATE TABLE IF NOT EXISTS `test_db_*.*`.bbb(id int);")
      == Seq(CreateTable(Some("test_db_*.*"), "bbb", "(id int)",
        ifNotExists = true)))
    assert(parse("CREATE TABLE IF NOT EXISTS " +
      "`中文.others*&^%$#@!+_)(&^%#`.`中文!@$#$%^&*&(_+)`(id int);") ==
      Seq(CreateTable(Some("中文.others*&^%$#@!+_)(&^%#"),
        "中文!@$#$%^&*&(_+)", "(id int)", ifNotExists = true)))
    // keyword-named identifiers parse as names (query.match)
    assert(parse("create table query.match (id int)") ==
      Seq(CreateTable(Some("query"), "match", "(id int)",
        ifNotExists = false)))
    // comments + spacing on the other statement families
    assert(parse("drop /*c*/ table /*c*/ if exists aaa.bbb") ==
      Seq(DropTable(Some("aaa"), "bbb", ifExists = true)))
    assert(parse("truncate /*c*/ table  `aaa` . `bbb` ") ==
      Seq(TruncateTable(Some("aaa"), "bbb")))
    assert(parse("alter /*c*/ table aaa.bbb add column c int -- note") ==
      Seq(AlterTable(Some("aaa"), "bbb", "add column c int")))
    assert(parse("create database /*c*/ if not exists `test_db_*.*` ;")
      == Seq(CreateDatabase("test_db_*.*", ifNotExists = true)))
    assert(parse("CREATE SCHEMA IF NOT EXISTS \"test_db_*.*\" ;") ==
      Seq(CreateSchema("test_db_*.*", ifNotExists = true)))
    // line comments: MySQL '#' and standard '--' end at the newline
    assert(parse("create table t (id int) # trailing\n") ==
      Seq(CreateTable(None, "t", "(id int)", ifNotExists = false)))
    // multi-line statements parse whole (ddl_parser.rs
    // test_create_table_multi_lines_pg): line comment mid-statement,
    // name and body on their own lines, body newlines preserved
    assert(parse("CREATE TABLE -- some comments\n  IF NOT EXISTS \n" +
      "  db_1.tb_1 \n  (id int,\n  value int);") ==
      Seq(CreateTable(Some("db_1"), "tb_1", "(id int,\n  value int)",
        ifNotExists = true)))
    // unterminated block comment stays verbatim (no silent data loss,
    // no crash) — here it rides along inside the body capture
    assert(parse("create table t (id int) /* open") ==
      Seq(CreateTable(None, "t", "(id int) /* open",
        ifNotExists = false)))
  }

  test("ddl parse: alter-rename and set-schema are typed statements " +
      "with routable targets") {
    import graft.meta.DdlParser.{AlterTableRename, AlterTableSetSchema}
    // ddl_parser.rs test_alter_rename_table_mysql: RENAME / AS / TO
    // all canonicalize to RENAME TO
    for (sql <- Seq(
        "ALTER TABLE tb_2 RENAME  tb_3",
        "alter table tb_2 rename as tb_3",
        "alter table tb_2 rename to tb_3")) {
      val Seq(r) = parse(sql)
      assert(r == AlterTableRename(None, "tb_2", None, "tb_3"), sql)
      assert(r.render == "ALTER TABLE `tb_2` RENAME TO `tb_3`")
      assert(ddlType(r) == "alter_table")
    }
    val Seq(q) = parse("alter table `db_1`.tb_2 rename to `db_2`.tb_3")
    assert(q == AlterTableRename(Some("db_1"), "tb_2",
      Some("db_2"), "tb_3"))
    assert(q.render == "ALTER TABLE `db_1`.`tb_2` RENAME TO " +
      "`db_2`.`tb_3`")
    // RENAME COLUMN / INDEX sub-clauses stay plain alterations
    assert(parse("ALTER TABLE t RENAME COLUMN a TO b") ==
      Seq(AlterTable(None, "t", "RENAME COLUMN a TO b")))
    assert(parse("ALTER TABLE t RENAME INDEX i1 TO i2") ==
      Seq(AlterTable(None, "t", "RENAME INDEX i1 TO i2")))
    // PG SET SCHEMA: the new schema is a routable namespace
    val Seq(ss) = parse("ALTER TABLE sales.orders SET SCHEMA archive")
    assert(ss == AlterTableSetSchema(Some("sales"), "orders", "archive"))
    assert(ss.render ==
      "ALTER TABLE `sales`.`orders` SET SCHEMA `archive`")
    // routing rewrites BOTH namespaces of a rename, and the SET
    // SCHEMA target through the schema map
    val router = graft.operators.Router(
      schemaMap = Map("db_1" -> "r1", "db_2" -> "r2",
        "sales" -> "s2", "archive" -> "a2"))
    assert(DdlParser.route(q, router, "def") ==
      AlterTableRename(Some("r1"), "tb_2", Some("r2"), "tb_3"))
    assert(DdlParser.route(ss, router, "def") ==
      AlterTableSetSchema(Some("s2"), "orders", "a2"))
  }

  test("ddl parse: index forms and table persistence modifiers") {
    import graft.meta.DdlParser.{CreateIndex, CreateTable, DropIndex}
    // ddl_parser.rs test_create_index_mysql: expression columns,
    // UNIQUE + USING canonicalization, keyword-named index/table
    val Seq(i1) = parse(
      "create index idx2 on t1 ((col1 + col2), (col1 - col2), col1);")
    assert(i1 == CreateIndex("idx2", None, "t1",
      "(col1 + col2), (col1 - col2), col1"))
    assert(i1.render ==
      "CREATE INDEX `idx2` ON `t1` ((col1 + col2), (col1 - col2), col1)")
    val Seq(i2) = parse("create unique index `idx2` using  btree  on " +
      "`d1`.`t1`((col1 + col2), (col1 - col2), col1);")
    assert(i2 == CreateIndex("idx2", Some("d1"), "t1",
      "(col1 + col2), (col1 - col2), col1", unique = true,
      using = "btree"))
    assert(i2.render == "CREATE UNIQUE INDEX `idx2` USING BTREE ON " +
      "`d1`.`t1` ((col1 + col2), (col1 - col2), col1)")
    val Seq(i3) = parse("create index query on db1.match(a,b);")
    assert(i3 == CreateIndex("query", Some("db1"), "match", "a,b"))
    // test_drop_index_mysql: trailing options ride along
    val Seq(d1) = parse("drop index index1 on t1 algorithm=default;")
    assert(d1 == DropIndex("index1", None, "t1", "algorithm=default"))
    assert(d1.render == "DROP INDEX `index1` ON `t1` algorithm=default")
    assert(parse("drop index `index1` on `d1`.`t1` algorithm=default;")
      == Seq(DropIndex("index1", Some("d1"), "t1", "algorithm=default")))
    // test_create_table_with_temporary_pg: persistence modifiers keep
    // their source spelling
    for ((sql, mod, tb) <- Seq(
        ("create UNLOGGED table tb_1(ts TIMESTAMP);", "UNLOGGED", "tb_1"),
        ("create TEMPORARY table tb_2(ts TIMESTAMP);", "TEMPORARY",
          "tb_2"),
        ("create temp table tb_3(ts TIMESTAMP);", "temp", "tb_3"),
        ("create GLOBAL TEMPORARY table tb_4(ts TIMESTAMP) ON COMMIT " +
          "DELETE ROWS;", "GLOBAL TEMPORARY", "tb_4"),
        ("create local temp table tb_5(ts TIMESTAMP);", "local temp",
          "tb_5"))) {
      val Seq(c) = parse(sql)
      val ct = c.asInstanceOf[CreateTable]
      assert(ct.tb == tb && ct.modifier == mod, sql)
    }
    assert(parse("create TEMPORARY table tb_2(ts TIMESTAMP);").head
      .render == "CREATE TEMPORARY TABLE `tb_2` (ts TIMESTAMP)")
  }

  test("ddl parse: multi-object drop/rename split (split_to_multi)") {
    assert(parse("DROP TABLE IF EXISTS a.t1, b.t2, t3") == Seq(
      DropTable(Some("a"), "t1", ifExists = true),
      DropTable(Some("b"), "t2", ifExists = true),
      DropTable(None, "t3", ifExists = true)))
    assert(parse("RENAME TABLE a.t1 TO a.t2, `x` TO `y`") == Seq(
      RenameTable(Some("a"), "t1", Some("a"), "t2"),
      RenameTable(None, "x", None, "y")))
  }

  test("ddl parse: schema namespace family (create/drop/alter)") {
    // keyword-typed apart from database DDL (ddl_parser.rs:183-272):
    // CREATE SCHEMA is create_schema even where SCHEMA aliases DATABASE
    assert(parse("create schema `x`;") ==
      Seq(CreateSchema("x", ifNotExists = false)))
    assert(parse("CREATE SCHEMA IF NOT EXISTS sales") ==
      Seq(CreateSchema("sales", ifNotExists = true)))
    val Seq(auth) = parse("CREATE SCHEMA AUTHORIZATION joe")
    assert(auth == CreateSchema("joe", ifNotExists = false,
      authorization = true))
    assert(auth.render == "CREATE SCHEMA AUTHORIZATION `joe`")
    assert(parse("DROP SCHEMA IF EXISTS sales CASCADE") ==
      Seq(DropSchema("sales", ifExists = true)))
    assert(parse("ALTER SCHEMA sales RENAME TO sales_old") ==
      Seq(AlterSchema("sales", Some("sales_old"))))
    assert(parse("ALTER SCHEMA sales OWNER TO joe") ==
      Seq(AlterSchema("sales", None, "OWNER TO joe")))
    assert(ddlType(parse("CREATE SCHEMA s").head) == "create_schema")
    assert(ddlType(parse("DROP SCHEMA s").head) == "drop_schema")
    assert(ddlType(parse("ALTER SCHEMA s RENAME TO t").head) ==
      "alter_schema")
    assert(ddlType(parse("ALTER DATABASE d READ ONLY = 1").head) ==
      "alter_database")
    // schema-level statements target (schema, "") for the DDL filter
    assert(target(parse("DROP SCHEMA sales").head, "def") ==
      (("sales", "")))
  }

  test("ddl routing: schema family routes through the schema map") {
    val router = Routing.demoRouter // app→app_replica
    assert(route(parse("CREATE SCHEMA app").head, router, "app").render
      == "CREATE SCHEMA `app_replica`")
    assert(route(parse("DROP SCHEMA IF EXISTS app").head, router,
      "app").render == "DROP SCHEMA IF EXISTS `app_replica`")
    // both sides of a schema rename route
    assert(route(parse("ALTER SCHEMA app RENAME TO app2").head,
      router, "app").render ==
      "ALTER SCHEMA `app_replica` RENAME TO `app2`")
    assert(route(parse("ALTER DATABASE app READ ONLY = 1").head,
      router, "app").render ==
      "ALTER DATABASE `app_replica` READ ONLY = 1")
  }

  test("ddl parse: index + unknown → raw") {
    assert(parse("CREATE UNIQUE INDEX idx ON app.t (a, b)") ==
      Seq(CreateIndex("idx", Some("app"), "t", "a, b", unique = true)))
    assert(parse("DROP INDEX idx ON t") ==
      Seq(DropIndex("idx", None, "t")))
    assert(parse("OPTIMIZE TABLE weird") ==
      Seq(RawDdl("OPTIMIZE TABLE weird")))
  }

  test("ddl routing rewrites names incl. RENAME targets") {
    val router = Routing.demoRouter // app→app_replica, customer→clients
    val Seq(stmt) = parse("DROP TABLE app.customer")
    assert(route(stmt, router, "app").render ==
      "DROP TABLE `app_replica`.`clients`")
    val Seq(ren) = parse("RENAME TABLE app.customer TO app.archive")
    assert(route(ren, router, "app").render ==
      "RENAME TABLE `app_replica`.`clients` TO `app_replica`.`archive`")
    // unqualified names resolve against the session default db
    val Seq(alt) = parse("ALTER TABLE customer ADD c INT")
    assert(route(alt, router, "app").render ==
      "ALTER TABLE `app_replica`.`clients` ADD c INT")
  }

  test("dcl parse battery") {
    import DclParser._
    assert(parse("CREATE USER 'u'@'%' IDENTIFIED BY 'p'")
      .isInstanceOf[CreateUser])
    assert(parse("GRANT SELECT, INSERT ON app.* TO 'u'@'%'") ==
      Grant("SELECT, INSERT", "app.*", "'u'@'%'"))
    assert(parse("REVOKE ALL ON *.* FROM 'u'@'%'") ==
      Revoke("ALL", "*.*", "'u'@'%'"))
    assert(parse("DROP USER 'u'@'%'") == DropUser("'u'@'%'"))
    assert(parse("FLUSH PRIVILEGES").dclType == "raw")
  }

  test("meta manager caches, refetches after DDL invalidation") {
    var fetches = 0
    val mgr = new MetaManager(new MetaManager.MetaFetcher {
      def fetch(s: String, t: String): MetaManager.TableMeta = {
        fetches += 1
        MetaManager.TableMeta(s, t,
          StructType(Seq(StructField("id", LongType))),
          idCols = Seq("id"), orderCols = Seq("id"), partitionCol = None)
      }
    })
    mgr.get("a", "t"); mgr.get("a", "t")
    assert(fetches == 1)
    mgr.invalidate("a", "t") // DDL barrier → refresh_meta
    mgr.get("a", "t")
    assert(fetches == 2)
    assert(mgr.cachedTables == Set(("a", "t")))
  }

  test("snapshot resumer: record → resume filter; finish → skip table") {
    val dir = Files.createTempDirectory("resume").toString
    val r = new SnapshotResumer(dir)
    val df = Tables.orders(spark, sf)

    // fresh table: full scan
    val full = r.resume(df, "app", "orders", col("o_orderkey"))
    assert(full.get.count() == df.count())

    // recorded progress: only rows past the watermark
    r.record("app", "orders", "750")
    val resumed = r.resume(df, "app", "orders", col("o_orderkey")).get
    assert(resumed.count() ==
      df.filter(col("o_orderkey") > 750).count())

    // restart-after-crash: a second recorder appends, last wins
    r.record("app", "orders", "900")
    assert(r.resumeValue("app", "orders").contains("900"))

    r.finish("app", "orders")
    assert(r.isFinished("app", "orders"))
    assert(r.resume(df, "app", "orders", col("o_orderkey")).isEmpty)
  }
}
