package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.{AlterParser, MetaManager}
import graft.meta.AlterParser._
import graft.meta.MetaManager.TableMeta

/** Structured ALTER parsing + cached-schema evolution (the typed subset
  * of ddl_parser.rs's ALTER variants driving MetaManager.evolve).
  */
class AlterSpec extends AnyFunSuite {

  test("action grammar: add/drop/modify/change/rename variants") {
    assert(AlterParser.parse("ADD COLUMN c INT") ==
      Seq(AddColumn("c", "INT", "", DefaultPos)))
    assert(AlterParser.parse(
      "ADD `c2` DECIMAL(10,2) UNSIGNED NOT NULL AFTER `a`") ==
      Seq(AddColumn("c2", "DECIMAL(10,2) UNSIGNED", "NOT NULL",
        After("a"))))
    assert(AlterParser.parse("ADD c3 VARCHAR(20) FIRST") ==
      Seq(AddColumn("c3", "VARCHAR(20)", "", First)))
    assert(AlterParser.parse("DROP COLUMN old") ==
      Seq(DropColumn("old")))
    assert(AlterParser.parse("MODIFY COLUMN v BIGINT NOT NULL") ==
      Seq(ModifyColumn("v", "BIGINT", "NOT NULL", DefaultPos)))
    assert(AlterParser.parse("CHANGE COLUMN a b TEXT") ==
      Seq(ChangeColumn("a", "b", "TEXT", "", DefaultPos)))
    assert(AlterParser.parse("RENAME COLUMN x TO y") ==
      Seq(RenameColumn("x", "y")))
    assert(AlterParser.parse("RENAME TO t2") ==
      Seq(RenameTo(None, "t2")))
    assert(AlterParser.parse("RENAME db2.t2") ==
      Seq(RenameTo(Some("db2"), "t2")))
    // PG spelling
    assert(AlterParser.parse("ALTER COLUMN c SET DATA TYPE BIGINT") ==
      Seq(ModifyColumn("c", "BIGINT", "", DefaultPos)))
  }

  test("multi-action split respects parens and quoted identifiers") {
    assert(AlterParser.parse(
      "ADD a DECIMAL(10,2), DROP COLUMN b, ADD `x,y` INT") ==
      Seq(AddColumn("a", "DECIMAL(10,2)", "", DefaultPos),
        DropColumn("b"), AddColumn("x,y", "INT", "", DefaultPos)))
  }

  test("index/constraint actions stay raw, not mis-parsed as columns") {
    assert(AlterParser.parse("ADD INDEX idx (c)") ==
      Seq(RawAction("ADD INDEX idx (c)")))
    assert(AlterParser.parse("ADD CONSTRAINT fk FOREIGN KEY (a) " +
      "REFERENCES t2(b)") == Seq(RawAction("ADD CONSTRAINT fk FOREIGN " +
      "KEY (a) REFERENCES t2(b)")))
    assert(AlterParser.parse("DROP PRIMARY KEY") ==
      Seq(RawAction("DROP PRIMARY KEY")))
  }

  private def mkManager(): MetaManager = {
    val fetcher = new MetaManager.MetaFetcher {
      override def fetch(schema: String, tb: String): TableMeta =
        TableMeta(schema, tb,
          StructType(Seq(StructField("id", LongType, nullable = false),
            StructField("v", StringType),
            StructField("ts", TimestampType))),
          idCols = Seq("id"), orderCols = Seq("id"),
          partitionCol = Some("id"),
          originTypes = Map("id" -> "bigint", "v" -> "varchar(10)",
            "ts" -> "timestamp"))
    }
    new MetaManager(fetcher)
  }

  test("evolve: add with position, modify, drop — no refetch") {
    val m = mkManager()
    m.get("db", "t") // prime the cache
    assert(m.evolve("db", "t", AlterParser.parse(
      "ADD c DECIMAL(10,2) NOT NULL AFTER id, MODIFY v TEXT, DROP ts")))
    val meta = m.get("db", "t")
    assert(meta.structType.fieldNames.toSeq == Seq("id", "c", "v"))
    assert(meta.structType("c").dataType == DecimalType(10, 2))
    assert(!meta.structType("c").nullable)
    assert(meta.structType("v").dataType == StringType)
    assert(meta.originTypes("c") == "DECIMAL(10,2)")
    assert(!meta.originTypes.contains("ts"))
  }

  test("evolve: rename column follows through id/order/partition cols") {
    val m = mkManager()
    m.get("db", "t")
    assert(m.evolve("db", "t",
      AlterParser.parse("CHANGE COLUMN id id2 BIGINT NOT NULL")))
    val meta = m.get("db", "t")
    assert(meta.structType.fieldNames.toSeq == Seq("id2", "v", "ts"))
    assert(meta.idCols == Seq("id2") && meta.orderCols == Seq("id2"))
    assert(meta.partitionCol.contains("id2"))
    assert(m.evolve("db", "t", AlterParser.parse("RENAME COLUMN v TO w")))
    assert(m.get("db", "t").structType.fieldNames.toSeq ==
      Seq("id2", "w", "ts"))
  }

  test("evolve: table rename moves the cache entry") {
    val m = mkManager()
    m.get("db", "t")
    assert(m.evolve("db", "t", AlterParser.parse("RENAME TO db2.t2")))
    assert(m.cachedTables == Set(("db2", "t2")))
    assert(m.get("db2", "t2").tb == "t2")
  }

  test("evolve: out-of-model action invalidates instead of lying") {
    val m = mkManager()
    m.get("db", "t")
    assert(!m.evolve("db", "t",
      AlterParser.parse("ADD c INT, CONVERT TO CHARACTER SET utf8mb4")))
    assert(m.cachedTables.isEmpty)
    // modify of a nonexistent column is also out of model
    m.get("db", "t")
    assert(!m.evolve("db", "t", AlterParser.parse("MODIFY nope INT")))
    assert(m.cachedTables.isEmpty)
  }

  test("evolve with empty cache is a no-op success") {
    val m = mkManager()
    assert(m.evolve("db", "t", AlterParser.parse("ADD c INT")))
    assert(m.cachedTables.isEmpty)
  }
}
