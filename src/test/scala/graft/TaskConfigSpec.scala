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

  test("check task over the snapshot output: everything OK") {
    val sink = Files.createTempDirectory("task").toString
    val t = task(sink)
    TaskRunner.runSnapshot(spark, t)
    val check = TaskRunner.runCheck(spark, t).toMap
    assert(check("orders") == Map("OK" ->
      Tables.orders(spark, sf).count()))
    assert(check("customer").keySet == Set("OK"))
  }

  test("precheck admits the configured tables") {
    val t = task("/tmp/unused")
    val res = TaskRunner.precheck(spark, t)
    assert(res.filter(_.item == "source_readable").forall(_.ok))
    assert(res.find(r => r.item == "pk_present" &&
      r.detail == "orders").exists(_.ok))
  }
}
