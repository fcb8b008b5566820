package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.meta.DdlParser
import graft.meta.DdlParser.{Mysql, Pg, SqlDialect}

/** The reference DDL parser's own test battery, ported vector for
  * vector (/root/reference/dt-common/src/meta/ddl_meta/ddl_parser.rs
  * `mod test_mysql` / `mod test_pg` / `mod test_common`, the test
  * section of its 2,108 lines): comments inside statements, backtick
  * and double-quote escapes, arbitrary spacing, IF [NOT] EXISTS
  * variants, PG unquoted-identifier lower-casing, IF EXISTS ONLY,
  * CONCURRENTLY, nameless indexes, multi-object splits, and the
  * DDL-vs-DML judgment.
  *
  * One documented canonicalization difference: the reference's to_sql
  * preserves a trailing `;` (nom keeps the remainder); this parser
  * strips statement terminators — the sink appends its own — so
  * expected strings here are the reference's with the trailing `;`
  * (and its ` ;` spacing artifact) removed. Multi-object RENAME
  * TABLE splits into per-pair statements (the reference's own
  * `split_to_multi` routing behavior); the joined render must equal
  * the reference's single-statement to_sql.
  */
class DdlGrammarSpec extends AnyFunSuite {

  private def check(d: SqlDialect, ddlType: String,
      vectors: Seq[(String, String)]): Unit =
    vectors.foreach { case (in, want) =>
      val stmts = DdlParser.parse(in, d)
      assert(stmts.nonEmpty, s"no parse for: $in")
      val got =
        if (ddlType == "rename_table" && stmts.size > 1)
          "RENAME TABLE " + stmts.map(_.render(d)
            .stripPrefix("RENAME TABLE ")).mkString(", ")
        else stmts.head.render(d)
      assert(got == want, s"for input: $in")
      stmts.foreach(s =>
        assert(DdlParser.ddlType(s) == ddlType, s"type of: $in"))
    }

  // ------------------------------------------------------ mysql

  test("mysql: create table with schema (escapes/spaces/INE/comments)") {
    check(Mysql, "create_table", Seq(
      "create table aaa.bbb (id int)" ->
        "CREATE TABLE `aaa`.`bbb` (id int)",
      "create table `aaa`.`bbb` (id int)" ->
        "CREATE TABLE `aaa`.`bbb` (id int)",
      "  create   table  aaa . bbb   (id int)  " ->
        "CREATE TABLE `aaa`.`bbb` (id int)",
      "  create   table  `aaa` . `bbb`   (id int)  " ->
        "CREATE TABLE `aaa`.`bbb` (id int)",
      "create table if  not  exists `aaa`.`bbb` (id int)" ->
        "CREATE TABLE IF NOT EXISTS `aaa`.`bbb` (id int)",
      "create /*some comments,*/table/*some comments*/ `aaa`.`bbb` (id int)" ->
        "CREATE TABLE `aaa`.`bbb` (id int)",
      "create /*some comments,*/table/*some comments*/ if  not  exists  `aaa` .  `bbb` (id int)  " ->
        "CREATE TABLE IF NOT EXISTS `aaa`.`bbb` (id int)",
      "create table `special_character_$1#@*_table` (id int)" ->
        "CREATE TABLE `special_character_$1#@*_table` (id int)",
      "create table query.match (id int)" ->
        "CREATE TABLE `query`.`match` (id int)"))
  }

  test("mysql: create table with special characters in names") {
    check(Mysql, "create_table", Seq(
      "CREATE TABLE IF NOT EXISTS `test_db_*.*`.bbb(id int);" ->
        "CREATE TABLE IF NOT EXISTS `test_db_*.*`.`bbb` (id int)",
      "CREATE TABLE IF NOT EXISTS `中文.others*&^%$#@!+_)(&^%#`.`中文!@$#$%^&*&(_+)`(id int);" ->
        "CREATE TABLE IF NOT EXISTS `中文.others*&^%$#@!+_)(&^%#`.`中文!@$#$%^&*&(_+)` (id int)"))
  }

  test("mysql: create table without schema") {
    check(Mysql, "create_table", Seq(
      "create table bbb (id int)" -> "CREATE TABLE `bbb` (id int)",
      "create table `bbb` (id int)" -> "CREATE TABLE `bbb` (id int)",
      "  create   table  bbb   (id int)  " ->
        "CREATE TABLE `bbb` (id int)",
      "create table if  not  exists `bbb` (id int)" ->
        "CREATE TABLE IF NOT EXISTS `bbb` (id int)",
      "create /*some comments,*/table/*some comments*/ `bbb` (id int)" ->
        "CREATE TABLE `bbb` (id int)",
      "create /*some comments,*/table/*some comments*/ if  not  exists    `bbb` (id int)  " ->
        "CREATE TABLE IF NOT EXISTS `bbb` (id int)"))
  }

  test("mysql: drop table with/without schema") {
    check(Mysql, "drop_table", Seq(
      "drop table aaa.bbb" -> "DROP TABLE `aaa`.`bbb`",
      "drop table `aaa`.`bbb`" -> "DROP TABLE `aaa`.`bbb`",
      "  drop   table  aaa . bbb  " -> "DROP TABLE `aaa`.`bbb`",
      "drop table if  exists `aaa`.`bbb`" ->
        "DROP TABLE IF EXISTS `aaa`.`bbb`",
      "drop /*some comments,*/table/*some comments*/ `aaa`.`bbb`" ->
        "DROP TABLE `aaa`.`bbb`",
      "drop /*some comments,*/table/*some comments*/ if  exists  `aaa` .  `bbb`  " ->
        "DROP TABLE IF EXISTS `aaa`.`bbb`",
      "drop table bbb" -> "DROP TABLE `bbb`",
      "drop table if  exists `bbb`" -> "DROP TABLE IF EXISTS `bbb`"))
  }

  test("mysql: alter table add column variants") {
    check(Mysql, "alter_table", Seq(
      "alter table aaa.bbb add column value int" ->
        "ALTER TABLE `aaa`.`bbb` add column value int",
      "  alter   table  aaa . bbb   add column value int" ->
        "ALTER TABLE `aaa`.`bbb` add column value int",
      "alter /*some comments,*/table/*some comments*/ `aaa`.`bbb` add column value int" ->
        "ALTER TABLE `aaa`.`bbb` add column value int",
      "alter /*some comments,*/table/*some comments*/   `aaa` .  `bbb`   add column value int" ->
        "ALTER TABLE `aaa`.`bbb` add column value int",
      "alter table bbb add column value int" ->
        "ALTER TABLE `bbb` add column value int",
      "alter /*some comments,*/table/*some comments*/    `bbb`   add column value int" ->
        "ALTER TABLE `bbb` add column value int"))
  }

  test("mysql: alter table rename (RENAME / RENAME AS / RENAME TO)") {
    check(Mysql, "alter_table", Seq(
      "ALTER TABLE tb_2 RENAME  tb_3" ->
        "ALTER TABLE `tb_2` RENAME TO `tb_3`",
      "alter table tb_2 rename as tb_3" ->
        "ALTER TABLE `tb_2` RENAME TO `tb_3`",
      "alter table tb_2 rename to tb_3" ->
        "ALTER TABLE `tb_2` RENAME TO `tb_3`",
      "ALTER TABLE `db_1`.tb_2 RENAME  `db_2`.tb_3" ->
        "ALTER TABLE `db_1`.`tb_2` RENAME TO `db_2`.`tb_3`",
      "alter table `db_1`.tb_2 rename as `db_2`.tb_3" ->
        "ALTER TABLE `db_1`.`tb_2` RENAME TO `db_2`.`tb_3`",
      "alter table `db_1`.tb_2 rename to `db_2`.tb_3" ->
        "ALTER TABLE `db_1`.`tb_2` RENAME TO `db_2`.`tb_3`"))
  }

  test("mysql: create/drop/alter database") {
    check(Mysql, "create_database", Seq(
      "create database aaa" -> "CREATE DATABASE `aaa`",
      "  create   database   `aaa`  " -> "CREATE DATABASE `aaa`",
      "create database if  not  exists `aaa`" ->
        "CREATE DATABASE IF NOT EXISTS `aaa`",
      "create /*some comments,*/database/*some comments*/ `aaa`" ->
        "CREATE DATABASE `aaa`",
      "create /*some comments,*/database/*some comments*/ if  not  exists    `aaa`  " ->
        "CREATE DATABASE IF NOT EXISTS `aaa`",
      "CREATE DATABASE IF NOT EXISTS `test_db_*.*`;" ->
        "CREATE DATABASE IF NOT EXISTS `test_db_*.*`",
      "CREATE DATABASE IF NOT EXISTS `中文.others*&^%$#@!+_)(&^%#`;" ->
        "CREATE DATABASE IF NOT EXISTS `中文.others*&^%$#@!+_)(&^%#`"))
    check(Mysql, "drop_database", Seq(
      "drop database aaa" -> "DROP DATABASE `aaa`",
      "drop database if  exists `aaa`" ->
        "DROP DATABASE IF EXISTS `aaa`",
      "drop /*some comments,*/database/*some comments*/ if  exists    `aaa`  " ->
        "DROP DATABASE IF EXISTS `aaa`"))
    check(Mysql, "alter_database", Seq(
      "alter database aaa CHARACTER SET utf8" ->
        "ALTER DATABASE `aaa` CHARACTER SET utf8",
      "  alter   database   `aaa`   CHARACTER SET utf8" ->
        "ALTER DATABASE `aaa` CHARACTER SET utf8",
      "alter /*some comments,*/database/*some comments*/    `aaa`   CHARACTER SET utf8" ->
        "ALTER DATABASE `aaa` CHARACTER SET utf8"))
  }

  test("mysql: truncate table variants") {
    check(Mysql, "truncate_table", Seq(
      "truncate table aaa.bbb" -> "TRUNCATE TABLE `aaa`.`bbb`",
      "  truncate   table  aaa . bbb  " ->
        "TRUNCATE TABLE `aaa`.`bbb`",
      "truncate /*some comments,*/table/*some comments*/ `bbb`" ->
        "TRUNCATE TABLE `bbb`",
      "truncate table bbb" -> "TRUNCATE TABLE `bbb`"))
  }

  test("mysql: rename table incl multi-object with comments across lines") {
    check(Mysql, "rename_table", Seq(
      "rename table aaa.bbb to aaa.ccc" ->
        "RENAME TABLE `aaa`.`bbb` TO `aaa`.`ccc`",
      "  rename   table  `aaa` . `bbb`   to aaa.ccc" ->
        "RENAME TABLE `aaa`.`bbb` TO `aaa`.`ccc`",
      "rename /*some comments,*/table/*some comments*/ `aaa`.`bbb` to aaa.ccc" ->
        "RENAME TABLE `aaa`.`bbb` TO `aaa`.`ccc`",
      ("rename /*some comments,*/table/*some comments*/  \n" +
        "            -- some comments2,\n" +
        "            `aaa` .  `bbb`   to aaa.ccc, \n" +
        "            /*some comments3*/\n" +
        "            bbb.ddd to eee.fff,  \n" +
        "            -- some 中文注释, \n" +
        "            `中文` .  `中文😀`   to `中文😀`.`中文`") ->
        ("RENAME TABLE `aaa`.`bbb` TO `aaa`.`ccc`, " +
          "`bbb`.`ddd` TO `eee`.`fff`, " +
          "`中文`.`中文😀` TO `中文😀`.`中文`"),
      ("rename /*some comments,*/table/*some comments*/  \n" +
        "            -- some comments2,\n" +
        "              `bbb`   to ccc, \n" +
        "            /*some comments3*/\n" +
        "            ddd to fff,  \n" +
        "            -- some 中文注释, \n" +
        "              `中文😀`   to `中文`") ->
        "RENAME TABLE `bbb` TO `ccc`, `ddd` TO `fff`, `中文😀` TO `中文`"))
  }

  test("mysql: create index (expressions, using btree, keyword names)") {
    check(Mysql, "create_index", Seq(
      "create index idx2 on t1 ((col1 + col2), (col1 - col2), col1);" ->
        "CREATE INDEX `idx2` ON `t1` ((col1 + col2), (col1 - col2), col1)",
      "create unique index `idx2` using  btree  on `d1`.`t1`((col1 + col2), (col1 - col2), col1);" ->
        "CREATE UNIQUE INDEX `idx2` USING BTREE ON `d1`.`t1` ((col1 + col2), (col1 - col2), col1)",
      "create index query on db1.match(a,b);" ->
        "CREATE INDEX `query` ON `db1`.`match` (a,b)"))
  }

  test("mysql: drop index keeps the trailing algorithm clause") {
    check(Mysql, "drop_index", Seq(
      "drop index index1 on t1 algorithm=default;" ->
        "DROP INDEX `index1` ON `t1` algorithm=default",
      "drop index `index1` on `d1`.`t1` algorithm=default;" ->
        "DROP INDEX `index1` ON `d1`.`t1` algorithm=default"))
  }

  // --------------------------------------------------------- pg

  test("pg: create table multi-line with inline comment") {
    check(Pg, "create_table", Seq(
      ("CREATE TABLE -- some comments\n" +
        "            IF NOT EXISTS \n" +
        "            db_1.tb_1 \n" +
        "            (id int,\n" +
        "            value int);") ->
        "CREATE TABLE IF NOT EXISTS \"db_1\".\"tb_1\" (id int,\n            value int)"))
  }

  test("pg: unquoted identifiers fold to lower case, quoted keep case") {
    check(Pg, "create_table", Seq(
      """CREATE TABLE IF NOT EXISTS Test_DB.Test_TB(id int, "Value" int);""" ->
        """CREATE TABLE IF NOT EXISTS "test_db"."test_tb" (id int, "Value" int)""",
      """CREATE TABLE IF NOT EXISTS "Test_DB".Test_TB(id int, "Value" int);""" ->
        """CREATE TABLE IF NOT EXISTS "Test_DB"."test_tb" (id int, "Value" int)""",
      """CREATE TABLE IF NOT EXISTS "Test_DB"."Test_TB"(id int, "Value" int);""" ->
        """CREATE TABLE IF NOT EXISTS "Test_DB"."Test_TB" (id int, "Value" int)"""))
  }

  test("pg: create table with special characters") {
    check(Pg, "create_table", Seq(
      """CREATE TABLE IF NOT EXISTS "test_db_*.*".bbb(id int);""" ->
        """CREATE TABLE IF NOT EXISTS "test_db_*.*"."bbb" (id int)""",
      """CREATE TABLE IF NOT EXISTS "中文.others*&^%$#@!+_)(&^%#"."中文!@$#$%^&*&(_+)"(id int);""" ->
        """CREATE TABLE IF NOT EXISTS "中文.others*&^%$#@!+_)(&^%#"."中文!@$#$%^&*&(_+)" (id int)""",
      "CREATE TABLE IF NOT EXISTS query.match(id int);" ->
        """CREATE TABLE IF NOT EXISTS "query"."match" (id int)"""))
  }

  test("pg: temporary/unlogged modifiers keep the source spelling") {
    check(Pg, "create_table", Seq(
      "create UNLOGGED table tb_1(ts TIMESTAMP);" ->
        """CREATE UNLOGGED TABLE "tb_1" (ts TIMESTAMP)""",
      "create TEMPORARY table tb_2(ts TIMESTAMP);" ->
        """CREATE TEMPORARY TABLE "tb_2" (ts TIMESTAMP)""",
      "create temp table tb_3(ts TIMESTAMP);" ->
        """CREATE temp TABLE "tb_3" (ts TIMESTAMP)""",
      "create GLOBAL TEMPORARY table tb_4(ts TIMESTAMP) ON COMMIT DELETE ROWS;" ->
        """CREATE GLOBAL TEMPORARY TABLE "tb_4" (ts TIMESTAMP) ON COMMIT DELETE ROWS""",
      "create local temp table tb_5(ts TIMESTAMP);" ->
        """CREATE local temp TABLE "tb_5" (ts TIMESTAMP)"""))
  }

  test("pg: alter table with IF EXISTS ONLY across lines") {
    check(Pg, "alter_table", Seq(
      """alter /*some comments,*/table/*some comments*/   "aaa" .  "bbb"   add column value int""" ->
        """ALTER TABLE "aaa"."bbb" add column value int""",
      ("alter /*some comments,*/table\n" +
        "            if exists\n" +
        "            only\n" +
        "            -- some comments\n" +
        "            \"aaa\" .  \"bbb\"  \n" +
        "            add column \n" +
        "            value int") ->
        "ALTER TABLE IF EXISTS ONLY \"aaa\".\"bbb\" add column \n            value int"))
  }

  test("pg: alter table rename to / set schema keep IF EXISTS ONLY") {
    check(Pg, "alter_table", Seq(
      "ALTER TABLE tb_1 RENAME TO tb_2" ->
        """ALTER TABLE "tb_1" RENAME TO "tb_2"""",
      """ALTER TABLE IF EXISTS ONLY "schema_1".tb_1 RENAME TO tb_2""" ->
        """ALTER TABLE IF EXISTS ONLY "schema_1"."tb_1" RENAME TO "tb_2"""",
      """alter table "schema_1".tb_1 rename to tb_2""" ->
        """ALTER TABLE "schema_1"."tb_1" RENAME TO "tb_2"""",
      """ALTER TABLE IF EXISTS ONLY "schema_1".tb_1 SET SCHEMA tb_2""" ->
        """ALTER TABLE IF EXISTS ONLY "schema_1"."tb_1" SET SCHEMA "tb_2"""",
      """alter table "schema_1".tb_1 set schema tb_2""" ->
        """ALTER TABLE "schema_1"."tb_1" SET SCHEMA "tb_2""""))
  }

  test("pg: create schema incl AUTHORIZATION forms") {
    check(Pg, "create_schema", Seq(
      "create schema aaa" -> """CREATE SCHEMA "aaa"""",
      "create schema \"aaa\"" -> """CREATE SCHEMA "aaa"""",
      "create schema if  not  exists \"aaa\"" ->
        """CREATE SCHEMA IF NOT EXISTS "aaa"""",
      "create /*some comments,*/schema/*some comments*/ \"aaa\"" ->
        """CREATE SCHEMA "aaa"""",
      "create /*some comments,*/schema/*some comments*/ if  not  exists    \"aaa\"  " ->
        """CREATE SCHEMA IF NOT EXISTS "aaa"""",
      "create schema authorization aaa" ->
        """CREATE SCHEMA AUTHORIZATION "aaa"""",
      "create schema if not exists match authorization hehe" ->
        """CREATE SCHEMA IF NOT EXISTS "match" authorization hehe""",
      "CREATE SCHEMA IF NOT EXISTS \"test_db_*.*\";" ->
        """CREATE SCHEMA IF NOT EXISTS "test_db_*.*"""",
      "CREATE SCHEMA IF NOT EXISTS \"中文.others*&^%$#@!+_)(&^%#\";" ->
        """CREATE SCHEMA IF NOT EXISTS "中文.others*&^%$#@!+_)(&^%#""""))
  }

  test("pg: drop schema and alter schema (rename to / owner to)") {
    check(Pg, "drop_schema", Seq(
      "drop schema aaa" -> """DROP SCHEMA "aaa"""",
      "drop schema if  exists \"aaa\"" ->
        """DROP SCHEMA IF EXISTS "aaa"""",
      "drop /*some comments,*/schema/*some comments*/ if  exists    \"aaa\"  " ->
        """DROP SCHEMA IF EXISTS "aaa""""))
    check(Pg, "alter_schema", Seq(
      "alter schema aaa rename to bbb" ->
        """ALTER SCHEMA "aaa" RENAME TO "bbb"""",
      "  alter   schema   \"aaa\"   rename to bbb" ->
        """ALTER SCHEMA "aaa" RENAME TO "bbb"""",
      "alter /*some comments,*/schema/*some comments*/    \"aaa\"   rename to bbb" ->
        """ALTER SCHEMA "aaa" RENAME TO "bbb"""",
      "alter schema aaa owner to bbb" ->
        """ALTER SCHEMA "aaa" owner to bbb"""))
  }

  test("pg: truncate with/without TABLE keyword and with ONLY") {
    check(Pg, "truncate_table", Seq(
      "truncate table aaa.bbb" -> """TRUNCATE TABLE "aaa"."bbb"""",
      """truncate /*some comments,*/table/*some comments*/   "aaa" .  "bbb"  """ ->
        """TRUNCATE TABLE "aaa"."bbb"""",
      """truncate /*some comments,*/   "aaa" .  "bbb"  """ ->
        """TRUNCATE TABLE "aaa"."bbb"""",
      """truncate /*some comments,*/table/*some comments*/  ONLY "aaa"."bbb"""" ->
        """TRUNCATE TABLE ONLY "aaa"."bbb"""",
      """truncate /*some comments,*/  ONLY "aaa"."bbb"""" ->
        """TRUNCATE TABLE ONLY "aaa"."bbb""""))
  }

  test("pg: create index — nameless, CONCURRENTLY, IF NOT EXISTS, ON ONLY") {
    check(Pg, "create_index", Seq(
      """create index on "tb_1"(id);""" ->
        """CREATE INDEX ON "tb_1" (id)""",
      ("create unique index\n" +
        "            concurrently -- some comments\n" +
        "            \"idx3\" on only \"tb_1\"(a);") ->
        """CREATE UNIQUE INDEX CONCURRENTLY "idx3" ON ONLY "tb_1" (a)""",
      ("create\n            unique\n            index\n" +
        "            concurrently -- some comments\n" +
        "            if not\n            exists\n" +
        "            \"idx3\"\n            on\n            only\n" +
        "            \"tb_1\"(a);") ->
        """CREATE UNIQUE INDEX CONCURRENTLY IF NOT EXISTS "idx3" ON ONLY "tb_1" (a)"""))
  }

  test("pg: drop index — multi-name list kept as one statement") {
    check(Pg, "drop_index", Seq(
      "drop index tb_1_id_idx" -> """DROP INDEX "tb_1_id_idx"""",
      "drop index if exists tb_1_id_idx,tb_1_id_idx1 RESTRICT;" ->
        """DROP INDEX IF EXISTS "tb_1_id_idx", "tb_1_id_idx1" RESTRICT""",
      "drop index CONCURRENTLY if exists tb_1_id_idx3 RESTRICT;" ->
        """DROP INDEX CONCURRENTLY IF EXISTS "tb_1_id_idx3" RESTRICT""",
      // schema-qualified: each part quoted separately — quoting the
      // dotted string whole would target an index named "public.idx1"
      "drop index public.idx1" -> """DROP INDEX "public"."idx1"""",
      "drop index if exists public.idx1, idx2 CASCADE" ->
        """DROP INDEX IF EXISTS "public"."idx1", "idx2" CASCADE""",
      // names ENDING in a trailing keyword must not be truncated by
      // the optional RESTRICT/CASCADE tail
      "drop index idx_cascade" -> """DROP INDEX "idx_cascade"""",
      "drop index idx_restrict CASCADE" ->
        """DROP INDEX "idx_restrict" CASCADE"""))
  }

  test("pg/mysql: ALTER TABLE disambiguates a table actually named " +
      "'only' from the PG ONLY keyword") {
    // ONLY is not reserved in MySQL — this is a real table name
    val named = DdlParser.parse(
      "ALTER TABLE only ADD COLUMN x int", Mysql).head
      .asInstanceOf[DdlParser.AlterTable]
    assert(named.tb == "only" && !named.only)
    assert(named.alteration == "ADD COLUMN x int")
    // the PG keyword form keeps its meaning
    val kw = DdlParser.parse(
      "ALTER TABLE ONLY users ADD COLUMN x int", Pg).head
      .asInstanceOf[DdlParser.AlterTable]
    assert(kw.tb == "users" && kw.only)
    // verb-shaped second token still reconstructs correctly
    val owner = DdlParser.parse(
      "ALTER TABLE only OWNER TO app", Pg).head
      .asInstanceOf[DdlParser.AlterTable]
    assert(owner.tb == "only" && owner.alteration == "OWNER TO app")
  }

  // ------------------------------------------------------ common

  test("common: DML is judged not-DDL and never parses as a statement") {
    val dmls = Seq(
      "INSERT INTO kubeblocks.kb_health_check VALUES(1, UNIX_TIMESTAMP()) ON DUPLICATE KEY UPDATE check_ts = UNIX_TIMESTAMP()",
      "REPLACE INTO kubeblocks.kb_health_check VALUES(1, UNIX_TIMESTAMP())",
      "UPDATE kubeblocks.kb_health_check SET check_ts = UNIX_TIMESTAMP() WHERE id = 1",
      "DELETE FROM kubeblocks.kb_health_check WHERE id = 1")
    dmls.foreach { sql =>
      assert(!DdlParser.isDdlStatement(sql), sql)
      DdlParser.parse(sql, Mysql) match {
        case Seq(DdlParser.RawDdl(_)) => // not recognized as DDL
        case other => fail(s"DML parsed as DDL: $other for $sql")
      }
    }
  }
}
