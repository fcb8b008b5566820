package graft

import java.nio.file.Files

import graft.config.{TaskConfig, TaskRunner}

class TaskConfigSpec extends SparkSuite {

  private val ini = s"""
    |# reference-style task config
    |[extractor]
    |extract_type=snapshot
    |url=$sf
    |batch_size=5000
    |id_cols=orders:o_orderkey,customer:c_custkey
    |
    |[filter]
    |do_tbs=app.orders,app.customer
    |ignore_tbs=app.lineitem
    |do_events=insert,update
    |do_ddls=alter_table,truncate_table
    |do_structures=table,index
    |ignore_cmds=FLUSHALL
    |
    |[router]
    |db_map=app:app_replica
    |tb_map=app.customer:app_replica.clients
    |col_map=app.customer.c_name:full_name
    |topic_map=app.orders:cdc.orders
    |default_topic=cdc.default
    |
    |[sinker]
    |url=SINKDIR
    |
    |[pipeline]
    |parallel_size=2
    |""".stripMargin

  private def task(sink: String) =
    TaskConfig.fromIni(ini.replace("SINKDIR", sink))

  test("ini parses into typed task config") {
    val t = task("/tmp/x")
    assert(t.extractType == TaskConfig.SnapshotExtract)
    assert(t.batchSize == 5000 && t.parallelism == 2)
    assert(t.filter.allowTable("app", "orders"))
    assert(!t.filter.allowTable("app", "lineitem"))
    assert(!t.filter.allowEvent("delete"))
    assert(t.filter.allowDdl("alter_table", "app", "orders"))
    assert(!t.filter.allowDdl("drop_table", "app", "orders"))
    assert(t.filter.allowStructure("index") &&
      !t.filter.allowStructure("constraint"))
    assert(!t.filter.allowCmd("FLUSHALL") && t.filter.allowCmd("SET"))
    assert(t.router.routeTable("app", "customer") ==
      ("app_replica", "clients"))
    assert(t.router.routeTable("app", "orders") ==
      ("app_replica", "orders"))
    assert(t.router.routeColumn("app", "customer", "c_name") ==
      "full_name")
    assert(t.router.routeTopic("app", "orders") == "cdc.orders")
    assert(t.keysByTable("orders") == Seq("o_orderkey"))
  }

  test("snapshot task: filter expansion, routing, rename, write") {
    val sink = Files.createTempDirectory("task").toString
    val t = task(sink)
    val results = TaskRunner.runSnapshot(spark, t)
    assert(results.map(_.tb).toSet == Set("orders", "customer"))
    assert(results.find(_.tb == "customer").get.dstTable ==
      "app_replica.clients")
    val clients = spark.read.parquet(s"$sink/app_replica.clients")
    assert(clients.columns.contains("full_name"))
    assert(!clients.columns.contains("c_name"))
    assert(clients.count() == Tables.customer(spark, sf).count())
  }

  test("snapshot task with [processor] lua_code_file: verbatim Lua " +
      "filters rows, adds a column, drops one, keeps source types") {
    val sink = Files.createTempDirectory("task").toString
    val lua = Files.createTempDirectory("lua")
      .resolve("etl.lua")
    Files.write(lua,
      """if (schema == "app" and tb == "orders")
        |then
        |    if (after.o_orderkey % 2 == 0) then row_type = "" end
        |    after["flagged"] = "yes"
        |    after["o_comment"] = nil
        |end""".stripMargin.getBytes("UTF-8"))
    val t = TaskConfig.fromIni(ini.replace("SINKDIR", sink)
      .replace("[sinker]",
        s"[processor]\nlua_code_file=$lua\n\n[sinker]"))
    TaskRunner.runSnapshot(spark, t)
    val out = spark.read.parquet(s"$sink/app_replica.orders")
    val src = Tables.orders(spark, sf)
    // every even key filtered, odd keys survive
    val odd = src.filter(org.apache.spark.sql.functions
      .pmod(org.apache.spark.sql.functions.col("o_orderkey"), org
        .apache.spark.sql.functions.lit(2)) === 1).count()
    assert(out.count() == odd)
    // the added column landed; the dropped one reads NULL everywhere
    assert(out.select("flagged").distinct().collect()
      .map(_.getString(0)).toSeq == Seq("yes"))
    assert(out.filter(org.apache.spark.sql.functions
      .col("o_comment").isNotNull).count() == 0)
    // untouched columns keep their source types and values
    assert(out.schema("o_totalprice").dataType ==
      src.schema("o_totalprice").dataType)
    assert(out.schema("o_orderkey").dataType ==
      src.schema("o_orderkey").dataType)
    val k = out.orderBy("o_orderkey").select("o_totalprice")
      .collect().head.get(0)
    val k0 = src.filter(org.apache.spark.sql.functions
        .col("o_orderkey") === out.orderBy("o_orderkey")
          .select("o_orderkey").collect().head.getLong(0))
      .select("o_totalprice").collect().head.get(0)
    assert(k == k0)
    // the customer table (unmentioned by the script) ships in full
    assert(spark.read.parquet(s"$sink/app_replica.clients").count() ==
      Tables.customer(spark, sf).count())
  }

  test("check task over the snapshot output: everything OK") {
    val sink = Files.createTempDirectory("task").toString
    val t = task(sink)
    TaskRunner.runSnapshot(spark, t)
    val check = TaskRunner.runCheck(spark, t).toMap
    assert(check("orders") == Map("OK" ->
      Tables.orders(spark, sf).count()))
    assert(check("customer").keySet == Set("OK"))
  }

  test("check task with defects writes replayable artifacts") {
    val sink = Files.createTempDirectory("task").toString
    val t = task(sink)
    TaskRunner.runSnapshot(spark, t)
    // perturb the sink: drop every 97th≡13 order (→ MISS)
    val dst = s"$sink/app_replica.orders"
    val kept = spark.read.parquet(dst)
      .filter(org.apache.spark.sql.functions
        .pmod(org.apache.spark.sql.functions.col("o_orderkey"),
          org.apache.spark.sql.functions.lit(97)) =!= 13)
    val tmp = Files.createTempDirectory("task-perturb").toString
    kept.write.parquet(s"$tmp/orders")
    spark.read.parquet(s"$tmp/orders").write
      .mode(org.apache.spark.sql.SaveMode.Overwrite).parquet(dst)

    val check = TaskRunner.runCheck(spark, t).toMap
    assert(check("orders").getOrElse("MISS", 0L) > 0)

    val logDir = java.nio.file.Paths.get(sink, "checklog",
      "app_replica.orders")
    val missLines = java.nio.file.Files
      .readAllLines(logDir.resolve("miss.log"))
    assert(missLines.size().toLong == check("orders")("MISS"))
    assert(missLines.get(0).contains("\"id_col_values\":{\"o_orderkey\""))
    val summary = java.nio.file.Files
      .readAllLines(logDir.resolve("summary.log"))
    assert(summary.get(0).contains("\"is_consistent\":false"))

    // the artifacts drive the revise task end to end
    val revise = graft.infra.CheckLogs.reviseFromLogs(
      graft.infra.CheckLogs.read(spark, logDir.toString), "orders",
      Seq("o_orderkey"))
    assert(revise.filter(org.apache.spark.sql.functions.col("op") ===
      "insert").count() == check("orders")("MISS"))
  }

  test("curation task runs the pipeline from the same ini surface") {
    val sink = java.nio.file.Files
      .createTempDirectory("curation_task").toString
    val t = TaskConfig.fromIni(
      ini.replace("SINKDIR", sink)
        .replace("extract_type=snapshot", "extract_type=curation"))
    assert(t.extractType == TaskConfig.CurationExtract)
    val s = TaskRunner.runCuration(spark, t)
    assert(s.nDocs == Tables.documents(spark, sf).count())
    assert(s.reasons.values.sum == s.nDocs)
    val v = spark.read.parquet(s"$sink/verdicts.parquet")
    assert(v.count() == s.nDocs)
  }

  test("precheck admits the configured tables") {
    val t = task("/tmp/unused")
    val res = TaskRunner.precheck(spark, t)
    assert(res.filter(_.item == "source_readable").forall(_.ok))
    assert(res.find(r => r.item == "pk_present" &&
      r.detail == "orders").exists(_.ok))
  }

  test("where_conditions + ignore_cols (json: filter configs) shape " +
      "the snapshot source read") {
    val sink = Files.createTempDirectory("task-where").toString
    val ini =
      s"""[extractor]
         |extract_type=snapshot
         |url=$sf
         |
         |[filter]
         |do_tbs=orders
         |where_conditions=json:[{"db":"app","tb":"orders","condition":"o_orderkey <= 100 AND o_totalprice > 0"}]
         |ignore_cols=json:[{"db":"app","tb":"orders","ignore_cols":["o_comment","o_clerk"]}]
         |
         |[sinker]
         |url=$sink
         |""".stripMargin
    val t = TaskConfig.fromIni(ini)
    assert(t.whereByTable(("app", "orders")) ==
      "o_orderkey <= 100 AND o_totalprice > 0")
    assert(t.ignoreColsByTable(("app", "orders")) ==
      Seq("o_comment", "o_clerk"))

    val results = TaskRunner.runSnapshot(spark, t)
    val out = spark.read.parquet(s"$sink/app.orders")
    val expected = Tables.orders(spark, sf)
      .filter("o_orderkey <= 100 AND o_totalprice > 0").count()
    assert(results.head.rows == expected && expected > 0)
    assert(!out.columns.contains("o_comment") &&
      !out.columns.contains("o_clerk"))
    assert(out.columns.contains("o_orderkey"))
    import org.apache.spark.sql.functions.max
    assert(out.agg(max("o_orderkey")).head.getLong(0) <= 100L)

    // a bare (non-json:) value is a config error, like the reference
    intercept[IllegalArgumentException] {
      TaskConfig.fromIni(ini.replace(
        "where_conditions=json:", "where_conditions="))
    }: Unit
  }

  test("loader task: ini drives the shard + packing layout and the " +
      "manifests satisfy their operator contracts") {
    import org.apache.spark.sql.functions._
    val sink = Files.createTempDirectory("graft-loader").toString
    val t = TaskConfig.fromIni(s"""
      |[extractor]
      |extract_type=loader
      |url=$sf
      |shard_count=4
      |window_tokens=64
      |
      |[sinker]
      |url=$sink
      |""".stripMargin)
    assert(t.extractType == TaskConfig.LoaderExtract)
    assert(t.loaderShards == 4 && t.loaderWindow == 64L)
    val s = TaskRunner.runLoader(spark, t)
    val nDocs = Tables.documents(spark, sf).count()
    assert(s.nDocs == nDocs && s.nShards == 4)

    val shards = spark.read.parquet(s"$sink/shards")
    assert(shards.count() == nDocs)
    assert(shards.select("doc_id").distinct().count() == nDocs)
    val bad = shards.groupBy("shard")
      .agg(count(lit(1)).as("n"), min("pos").as("lo"),
        max("pos").as("hi"))
      .filter(col("lo") =!= 1 || col("hi") =!= col("n"))
    assert(bad.isEmpty)

    val pack = spark.read.parquet(s"$sink/pack_windows")
    // the written manifest equals the operator run directly
    val direct = graft.operators.PackingOps
      .packWindowsOf(spark, Tables.documents(spark, sf), 64L)
    assert(pack.exceptAll(direct).isEmpty &&
      direct.exceptAll(pack).isEmpty)
    assert(s.totalTokens ==
      direct.agg(sum("n_tokens")).collect()(0).getLong(0))
  }

  test("struct applier: interrupt stops at the first failure, ignore " +
      "attempts every statement and records errors") {
    import graft.struct.StructApplier
    val ran = scala.collection.mutable.ListBuffer[String]()
    def exec(sql: String): Unit = {
      if (sql.contains("boom")) throw new RuntimeException("dup key")
      ran += sql
    }
    val stmts = Seq("CREATE TABLE a (id INT)",
      "CREATE INDEX boom ON a(id)", "CREATE TABLE b (id INT)")
    // interrupt: first failure propagates, later statements never run
    ran.clear()
    val e = intercept[RuntimeException] {
      StructApplier(stmts, StructApplier.Interrupt, exec)
    }
    assert(e.getMessage == "dup key")
    assert(ran.toList == Seq("CREATE TABLE a (id INT)"))
    // ignore: everything attempted, the failure surfaced as data
    ran.clear()
    val rep = StructApplier(stmts, StructApplier.Ignore, exec)
    assert(ran.toList ==
      Seq("CREATE TABLE a (id INT)", "CREATE TABLE b (id INT)"))
    assert(rep.executed == ran.toList)
    assert(rep.ignoredErrors ==
      Seq("CREATE INDEX boom ON a(id)" -> "dup key"))
    // unknown policy strings fall back to the reference default
    assert(StructApplier.parsePolicy("IGNORE") == StructApplier.Ignore)
    assert(StructApplier.parsePolicy("whatever") ==
      StructApplier.Interrupt)
  }

  test("meta_center config: dbengine type parses url + policy, basic " +
      "yields none, a shared url is rejected") {
    import graft.struct.StructApplier
    def ini(metaCenter: String) =
      s"""[extractor]
         |url=/src/dir
         |
         |[sinker]
         |url=/sink/dir
         |$metaCenter
         |""".stripMargin
    // dbengine with explicit ignore policy
    val t1 = TaskConfig.fromIni(ini(
      "\n[meta_center]\ntype=dbengine\nurl=/meta/dir\n" +
        "ddl_conflict_policy=ignore"))
    assert(t1.metaCenter ==
      Some(TaskConfig.MetaCenter("/meta/dir", StructApplier.Ignore)))
    // policy defaults to the reference default (interrupt)
    val t2 = TaskConfig.fromIni(ini(
      "\n[meta_center]\ntype=dbengine\nurl=/meta/dir"))
    assert(t2.metaCenter.get.ddlConflictPolicy ==
      StructApplier.Interrupt)
    // type=basic (or no section) -> no external meta center
    assert(TaskConfig.fromIni(ini(
      "\n[meta_center]\ntype=basic\nurl=/meta/dir")).metaCenter.isEmpty)
    assert(TaskConfig.fromIni(ini("")).metaCenter.isEmpty)
    // meta-center url must differ from extractor and sinker urls
    // (task_config.rs:1461-1466)
    intercept[IllegalArgumentException] {
      TaskConfig.fromIni(ini(
        "\n[meta_center]\ntype=dbengine\nurl=/sink/dir"))
    }
    // [sinker] conflict_policy reaches the task (task_config.rs:863)
    val t3 = TaskConfig.fromIni(
      "[extractor]\nurl=/a\n\n[sinker]\nurl=/b\nconflict_policy=ignore\n")
    assert(t3.conflictPolicy == StructApplier.Ignore)
  }
}
