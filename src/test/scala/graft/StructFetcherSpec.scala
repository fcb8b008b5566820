package graft

import org.apache.spark.sql.DataFrame

import graft.struct.{PgStructures, StructFetcher, StructMigrator}
import graft.struct.StructFetcher._
import graft.struct.StructMigrator.{IndexDef, MySqlDialect, PostgresDialect}

/** Catalog-SQL struct fetching driven end-to-end: the synthesized
  * information_schema / pg_catalog queries execute verbatim (Spark
  * SQL over fixture catalog tables standing in for the live engine;
  * PG's builtins shimmed as registered functions), rows parse into
  * TableDef, and StructMigrator renders the expected DDL.
  */
class StructFetcherSpec extends SparkSuite {

  /** Executes the synthesized SQL against the session catalog. */
  private def sparkExec(shim: String => String = identity): CatalogExec =
    new CatalogExec {
      def query(sql: String): Seq[Map[String, String]] = {
        val df = spark.sql(shim(sql))
        val cols = df.columns
        df.collect().toSeq.map { row =>
          cols.zipWithIndex.map { case (c, i) =>
            c -> (if (row.isNullAt(i)) "" else row.get(i).toString)
          }.toMap
        }
      }
    }

  private def save(db: String, name: String, df: DataFrame): Unit = {
    spark.sql(s"DROP TABLE IF EXISTS $db.$name")
    df.write.mode("overwrite").saveAsTable(s"$db.$name")
  }

  test("mysql: catalog rows → TableDef → rendered DDL") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    try {
      save("information_schema", "tables",
        Seq(("app", "customer", "InnoDB", "customer master",
            "utf8mb4_general_ci", "BASE TABLE"),
          ("app", "v_customer", "", "", "", "VIEW"))
          .toDF("TABLE_SCHEMA", "TABLE_NAME", "ENGINE",
            "TABLE_COMMENT", "TABLE_COLLATION", "TABLE_TYPE"))
      save("information_schema", "columns",
        Seq(
          ("app", "customer", "id", 1, null, "NO", "bigint", "PRI",
            "auto_increment", "", null, null),
          ("app", "customer", "full_name", 2, null, "YES",
            "varchar(255)", "UNI", "", "customer name", "utf8mb4",
            "utf8mb4_general_ci"),
          ("app", "customer", "balance", 3, "0.00", "NO",
            "decimal(12,2)", "", "", "", null, null),
          ("app", "customer", "segment", 4, null, "YES",
            "varchar(32)", "MUL", "", "", "utf8mb4",
            "utf8mb4_general_ci"),
          ("app", "customer", "active", 5, "1", "YES", "tinyint(1)",
            "", "", "", null, null))
          .toDF("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
            "ORDINAL_POSITION", "COLUMN_DEFAULT", "IS_NULLABLE",
            "COLUMN_TYPE", "COLUMN_KEY", "EXTRA", "COLUMN_COMMENT",
            "CHARACTER_SET_NAME", "COLLATION_NAME"))
      save("information_schema", "statistics",
        Seq(
          ("app", "customer", 0, "uk_full_name", 1, "full_name", null,
            "BTREE", ""),
          ("app", "customer", 1, "ix_segment", 1, "segment", null,
            "BTREE", ""),
          ("app", "customer", 1, "ix_segment", 2, "id", null,
            "BTREE", ""))
          .toDF("TABLE_SCHEMA", "TABLE_NAME", "NON_UNIQUE",
            "INDEX_NAME", "SEQ_IN_INDEX", "COLUMN_NAME", "SUB_PART",
            "INDEX_TYPE", "COMMENT"))
      save("information_schema", "table_constraints",
        Seq(("app", "customer", "chk_balance", "CHECK"),
          ("app", "customer", "fk_segment", "FOREIGN KEY"))
          .toDF("CONSTRAINT_SCHEMA", "TABLE_NAME", "CONSTRAINT_NAME",
            "CONSTRAINT_TYPE"))
      save("information_schema", "check_constraints",
        Seq(("app", "chk_balance", "(`balance` >= 0)"))
          .toDF("CONSTRAINT_SCHEMA", "CONSTRAINT_NAME",
            "CHECK_CLAUSE"))
      save("information_schema", "key_column_usage",
        Seq(("fk_segment", "app", "customer", "segment", "app",
            "segments", "seg_id"))
          .toDF("CONSTRAINT_NAME", "CONSTRAINT_SCHEMA", "TABLE_NAME",
            "COLUMN_NAME", "REFERENCED_TABLE_SCHEMA",
            "REFERENCED_TABLE_NAME", "REFERENCED_COLUMN_NAME"))

      val fetcher = new MySqlFetcher(sparkExec(), Set("app"))
      // out-of-scope short-circuits: no SQL at all
      assert(fetcher.tablesSql("other", "t").isEmpty)
      assert(new MySqlFetcher(sparkExec(), Set.empty)
        .tablesSql("", "").isEmpty)
      // allow-set scoping clause
      assert(fetcher.tablesSql("", "").get
        .contains("t.TABLE_SCHEMA IN ('app')"))

      val t = fetcher.fetchTable("app", "customer").get
      assert(t.cols.map(_.name) ==
        Seq("id", "full_name", "balance", "segment", "active"))
      assert(t.primaryKey == Seq("id"))
      assert(t.uniqueKeys == Seq(Seq("full_name")))
      assert(t.indexes ==
        Seq(IndexDef("ix_segment", Seq("segment", "id"))))
      assert(t.comment.contains("customer master"))
      assert(t.cols(1).comment.contains("customer name"))
      // the VIEW is excluded by TABLE_TYPE = 'BASE TABLE'
      assert(fetcher.fetchTable("app", "v_customer").isEmpty)

      // round-trip: the fetched TableDef renders the exact DDL
      assert(MySqlDialect.render(t) ==
        """CREATE TABLE IF NOT EXISTS `app`.`customer` (
          |  `id` BIGINT NOT NULL,
          |  `full_name` LONGTEXT COMMENT 'customer name',
          |  `balance` DECIMAL(12,2) NOT NULL,
          |  `segment` LONGTEXT,
          |  `active` TINYINT(1),
          |  PRIMARY KEY (`id`),
          |  UNIQUE KEY `uk_0` (`full_name`)
          |)""".stripMargin)
      assert(MySqlDialect.renderIndexes(t) == Seq(
        "CREATE INDEX `ix_segment` ON `app`.`customer` " +
          "(`segment`, `id`)"))

      // constraints: check clause + reference-format FK definition
      val cons = fetcher.fetchConstraints("app", "customer")
      assert(cons.map(c => (c.name, c.tpe)).toSet == Set(
        ("chk_balance", "CHECK"), ("fk_segment", "FOREIGN KEY")))
      assert(cons.find(_.tpe == "FOREIGN KEY").get.definition ==
        "(`segment`) REFERENCES `app`.`segments`(`seg_id`)")

      // schemata query
      save("information_schema", "schemata",
        Seq(("app", "utf8mb4", "utf8mb4_general_ci"))
          .toDF("SCHEMA_NAME", "DEFAULT_CHARACTER_SET_NAME",
            "DEFAULT_COLLATION_NAME"))
      assert(fetcher.schemataSql("").map(sparkExec().query).get
        .head("SCHEMA_NAME") == "app")
      assert(fetcher.schemataSql("other").isEmpty)
    } finally
      spark.sql("DROP DATABASE IF EXISTS information_schema CASCADE")
  }

  test("pg: catalog rows → TableDef + sequences + comments → DDL") {
    val s = spark
    import s.implicits._
    spark.sql("CREATE DATABASE IF NOT EXISTS information_schema")
    spark.sql("CREATE DATABASE IF NOT EXISTS pg_catalog")
    // PG builtins, shimmed over fixture state
    val constraintDefs = Map(
      3001L -> "PRIMARY KEY (order_id)",
      3002L -> "UNIQUE (order_ref)",
      3003L -> "CHECK ((amount >= (0)::numeric))")
    spark.udf.register("pg_get_constraintdef",
      (oid: Long) => constraintDefs.getOrElse(oid, ""))
    val colComments = Map((2001L, 2) -> "external reference")
    spark.udf.register("col_description",
      (rel: Long, att: Int) => colComments.get((rel, att)).orNull)
    spark.udf.register("format_type",
      (_: Long, _: Int) => "character varying")
    try {
      save("information_schema", "tables",
        Seq(("sales", "orders", "BASE TABLE"))
          .toDF("table_schema", "table_name", "table_type"))
      save("information_schema", "columns",
        Seq(
          ("sales", "orders", "order_id", "bigint", "int8", null,
            "NO", "nextval('sales.orders_order_id_seq'::regclass)",
            Some(64), Some(0), "NO", null, 1),
          ("sales", "orders", "order_ref", "character varying",
            "varchar", Some(64), "NO", null, None, None, "NO", null,
            2),
          ("sales", "orders", "amount", "numeric", "numeric", null,
            "YES", null, Some(12), Some(2), "NO", null, 3),
          ("sales", "orders", "placed_at",
            "timestamp without time zone", "timestamp", null, "YES",
            null, None, None, "NO", null, 4))
          .map { case (a, b, c, d, e, f, g, h, i, j, k, l, m) =>
            (a, b, c, d, e, f.asInstanceOf[Option[Int]], g,
              Option(h).map(_.toString), i, j, k,
              Option(l).map(_.toString), m)
          }
          .toDF("table_schema", "table_name", "column_name",
            "data_type", "udt_name", "character_maximum_length",
            "is_nullable", "column_default", "numeric_precision",
            "numeric_scale", "is_identity", "identity_generation",
            "ordinal_position"))
      save("pg_catalog", "pg_constraint",
        Seq((3001L, "orders_pkey", "p", 2001L, 9001L),
          (3002L, "orders_ref_key", "u", 2001L, 9001L),
          (3003L, "orders_amount_check", "c", 2001L, 9001L))
          .toDF("oid", "conname", "contype", "conrelid",
            "connamespace"))
      save("pg_catalog", "pg_class",
        Seq((2001L, "orders", 9001L, "r"),
          (2101L, "orders_order_id_seq", 9001L, "S"))
          .toDF("oid", "relname", "relnamespace", "relkind"))
      save("pg_catalog", "pg_namespace",
        Seq((9001L, "sales")).toDF("oid", "nspname"))
      // unqualified pg_* names resolve via temp views
      Seq((2001L, "orders", 9001L, "r"),
        (2101L, "orders_order_id_seq", 9001L, "S"))
        .toDF("oid", "relname", "relnamespace", "relkind")
        .createOrReplaceTempView("pg_class")
      Seq((9001L, "sales")).toDF("oid", "nspname")
        .createOrReplaceTempView("pg_namespace")
      Seq((2101L, 2001L, 1, "a"))
        .toDF("objid", "refobjid", "refobjsubid", "deptype")
        .createOrReplaceTempView("pg_depend")
      Seq((2001L, 1, "order_id", 20L, -1, true),
        (2001L, 2, "order_ref", 1043L, 68, true),
        (2001L, 3, "amount", 1700L, 786438, false),
        (2001L, 4, "placed_at", 1114L, -1, false))
        .toDF("attrelid", "attnum", "attname", "atttypid",
          "atttypmod", "attnotnull")
        .createOrReplaceTempView("pg_attribute")
      Seq((2001L, 0, "order history"))
        .toDF("objoid", "objsubid", "description")
        .createOrReplaceTempView("pg_description")
      Seq(("sales", "orders",
          "CREATE INDEX ix_placed ON sales.orders USING btree " +
            "(placed_at, order_id)", null, "ix_placed"),
        ("sales", "orders",
          "CREATE UNIQUE INDEX orders_ref_key ON sales.orders " +
            "USING btree (order_ref)", null, "orders_ref_key"))
        .toDF("schemaname", "tablename", "indexdef", "tablespace",
          "indexname")
        .createOrReplaceTempView("pg_indexes")
      Seq(("graftdb", "sales", "orders", "orders_order_id_seq",
          "bigint", "1", "1", "9223372036854775807", "1", "NO"))
        .toDF("sequence_catalog", "sequence_schema", "table_name",
          "sequence_name", "data_type", "start_value",
          "minimum_value", "maximum_value", "increment",
          "cycle_option")
        .createOrReplaceTempView("sequences_fixture")
      // information_schema.sequences must be a real (qualified) table
      save("information_schema", "sequences",
        spark.table("sequences_fixture"))

      // the one engine-ism Spark SQL can't parse: contype::text
      val shim = (sql: String) =>
        sql.replace("con.contype::text", "con.contype")
      val fetcher = new PgFetcher(sparkExec(shim), Set("sales"))

      val (t, comments) = fetcher.fetchTable("sales", "orders").get
      assert(t.cols.map(_.name) ==
        Seq("order_id", "order_ref", "amount", "placed_at"))
      assert(t.primaryKey == Seq("order_id"))
      assert(t.uniqueKeys == Seq(Seq("order_ref")))
      // constraint-backed index excluded; plain index parsed
      assert(t.indexes ==
        Seq(IndexDef("ix_placed", Seq("placed_at", "order_id"))))
      assert(t.comment.contains("order history"))
      assert(comments.toSet == Set(
        PgStructures.CommentDef("sales", "orders", None,
          "order history"),
        PgStructures.CommentDef("sales", "orders", Some("order_ref"),
          "external reference")))

      assert(PostgresDialect.render(t) ==
        """CREATE TABLE IF NOT EXISTS "sales"."orders" (
          |  "order_id" BIGINT NOT NULL,
          |  "order_ref" TEXT NOT NULL COMMENT 'external reference',
          |  "amount" NUMERIC(12,2),
          |  "placed_at" TIMESTAMP,
          |  PRIMARY KEY ("order_id")
          |)""".stripMargin)

      // sequences + owners round-trip through PgStructures SQL
      val (seqs, owners) = fetcher.fetchSequences("sales", "orders")
      assert(seqs == Seq(PgStructures.SequenceDef("sales",
        "orders_order_id_seq")))
      assert(owners == Seq(PgStructures.SequenceOwnerDef("sales",
        "orders_order_id_seq", "orders", "order_id")))
      assert(PgStructures.sequenceSql(seqs.head) ==
        "CREATE SEQUENCE IF NOT EXISTS \"sales\"." +
          "\"orders_order_id_seq\" AS bigint START 1 INCREMENT by 1 " +
          "MINVALUE 1 MAXVALUE 9223372036854775807 NO CYCLE")
      assert(PgStructures.sequenceOwnerSql(owners.head) ==
        "ALTER SEQUENCE \"sales\".\"orders_order_id_seq\" OWNED BY " +
          "\"sales\".\"orders\".\"order_id\"")

      // out-of-scope schema short-circuits
      assert(fetcher.columnsSql("public", "t").isEmpty)
    } finally {
      spark.sql("DROP DATABASE IF EXISTS information_schema CASCADE")
      spark.sql("DROP DATABASE IF EXISTS pg_catalog CASCADE")
      Seq("pg_class", "pg_namespace", "pg_depend", "pg_attribute",
        "pg_description", "pg_indexes", "sequences_fixture")
        .foreach(v => spark.catalog.dropTempView(v): Unit)
    }
  }

  test("struct task: catalog fixture dir → fetcher SQL → rendered DDL " +
      "for the sink dialect, from one INI") {
    val s = spark
    import s.implicits._
    val catalogDir = java.nio.file.Files
      .createTempDirectory("graft-catalog").toString
    def put(name: String, df: DataFrame): Unit =
      df.write.mode("overwrite")
        .parquet(s"$catalogDir/information_schema.$name.parquet")
    put("tables",
      Seq(("app", "customer", "InnoDB", "customer master",
          "utf8mb4_general_ci", "BASE TABLE"))
        .toDF("TABLE_SCHEMA", "TABLE_NAME", "ENGINE",
          "TABLE_COMMENT", "TABLE_COLLATION", "TABLE_TYPE"))
    put("columns",
      Seq(
        ("app", "customer", "id", 1, null, "NO", "bigint", "PRI",
          "auto_increment", "", null, null),
        ("app", "customer", "full_name", 2, null, "YES",
          "varchar(255)", "", "", "", "utf8mb4", "utf8mb4_general_ci"))
        .toDF("TABLE_SCHEMA", "TABLE_NAME", "COLUMN_NAME",
          "ORDINAL_POSITION", "COLUMN_DEFAULT", "IS_NULLABLE",
          "COLUMN_TYPE", "COLUMN_KEY", "EXTRA", "COLUMN_COMMENT",
          "CHARACTER_SET_NAME", "COLLATION_NAME"))
    put("statistics",
      Seq.empty[(String, String, Int, String, Int, String,
          Option[Int], String, String)]
        .toDF("TABLE_SCHEMA", "TABLE_NAME", "NON_UNIQUE",
          "INDEX_NAME", "SEQ_IN_INDEX", "COLUMN_NAME", "SUB_PART",
          "INDEX_TYPE", "COMMENT"))
    val sink = java.nio.file.Files
      .createTempDirectory("graft-structsink").toString
    val task = graft.config.TaskConfig.fromIni(
      s"""[extractor]
         |extract_type=struct
         |db_type=mysql
         |catalog_dir=$catalogDir
         |[filter]
         |do_dbs=app
         |do_tbs=customer
         |[sinker]
         |db_type=mysql
         |url=$sink
         |""".stripMargin)
    assert(task.extractType == graft.config.TaskConfig.StructExtract)
    try {
      val out = graft.config.TaskRunner.runStruct(spark, task)
      assert(out.map(_._1) == Seq("app.customer"))
      val ddl = out.head._2.mkString("\n")
      assert(ddl.contains("CREATE TABLE IF NOT EXISTS `app`.`customer`"))
      assert(ddl.contains("`full_name`"))
      assert(ddl.contains("PRIMARY KEY (`id`)"))
      // the statements were also persisted for the applier
      val written = java.nio.file.Files.readString(
        java.nio.file.Paths.get(s"$sink/structs/app.customer.sql"))
      assert(written.startsWith("CREATE TABLE"))
    } finally {
      spark.sql("DROP DATABASE IF EXISTS information_schema CASCADE")
    }
  }
}
