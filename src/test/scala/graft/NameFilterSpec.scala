package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{NameFilter, NamePattern, TableToken}

class NameFilterSpec extends AnyFunSuite {

  test("wildcard * and ? match like the reference") {
    assert(NamePattern.matches("test_db_*", "test_db_1"))
    assert(NamePattern.matches("test_db_?", "test_db_1"))
    assert(!NamePattern.matches("test_db_?", "test_db_12"))
    assert(!NamePattern.matches("test_db_*", "other"))
  }

  test("r#…# raw regex tokens") {
    assert(NamePattern.matches("r#tb_\\d+#", "tb_42"))
    assert(!NamePattern.matches("r#tb_\\d+#", "tb_x"))
  }

  test("backtick/quote escape makes wildcards literal") {
    assert(NamePattern.matches("`a*b`", "a*b"))
    assert(!NamePattern.matches("`a*b`", "axxb"))
    assert(NamePattern.matches("\"a?b\"", "a?b"))
  }

  test("deny wins over allow; empty allow = allow all") {
    val f = NameFilter(doSchemas = Seq("app_*"),
      ignoreSchemas = Seq("app_secret"))
    assert(f.allowSchema("app_main"))
    assert(!f.allowSchema("app_secret"))
    assert(!f.allowSchema("other"))
    assert(NameFilter().allowSchema("anything"))
  }

  test("table filter combines schema + table tokens") {
    val f = NameFilter(
      doTbs = Seq(TableToken("app", "orders_*")),
      ignoreTbs = Seq(TableToken("app", "orders_tmp")))
    assert(f.allowTable("app", "orders_2024"))
    assert(!f.allowTable("app", "orders_tmp"))
    assert(!f.allowTable("app", "users"))
  }

  test("catalog expansion prunes before any scan") {
    val f = NameFilter(doTbs = Seq(TableToken("s", "t?")))
    val cat = Seq(("s", "t1"), ("s", "t2"), ("s", "t33"), ("x", "t1"))
    assert(f.expand(cat) == Seq(("s", "t1"), ("s", "t2")))
  }

  test("event-kind filter") {
    val f = NameFilter(doEvents = Set("insert", "delete"))
    assert(f.allowEvent("insert") && !f.allowEvent("update"))
  }

  test("ddl gate: opt-in by type AND object admission") {
    // deny-by-default: no do_ddls → no DDL replicates
    assert(!NameFilter().allowDdl("alter_table", "app", "t"))
    val f = NameFilter(
      doTbs = Seq(TableToken("app", "orders")),
      doDdls = Set("alter_table", "truncate_table"))
    assert(f.allowDdl("alter_table", "app", "orders"))
    assert(!f.allowDdl("drop_table", "app", "orders")) // type not listed
    assert(!f.allowDdl("alter_table", "app", "users")) // object filtered
    // db-level statements check the schema filter; '*' admits all types
    val g = NameFilter(doSchemas = Seq("app"), doDdls = Set("*"))
    assert(g.allowDdl("create_database", "app", ""))
    assert(!g.allowDdl("create_database", "other", ""))
  }

  test("structure and command gates") {
    val f = NameFilter(doStructures = Set("table", "index"),
      ignoreCmds = Set("FLUSHALL", "DEBUG"))
    assert(f.allowStructure("table") && !f.allowStructure("constraint"))
    assert(NameFilter(doStructures = Set("*")).allowStructure("sequence"))
    assert(f.allowCmd("SET") && !f.allowCmd("FLUSHALL"))
  }
}
