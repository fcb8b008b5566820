package graft

import graft.model.{ChangeEvent, RowKind}
import graft.operators.{Router, Routing}
import graft.transform.RowTransform

class RouterTransformSpec extends SparkSuite {

  test("router: tb_map wins over schema_map; topic fallback chain") {
    val r = Routing.demoRouter
    assert(r.routeTable("app", "customer") == ("app_replica", "clients"))
    assert(r.routeTable("app", "other") == ("app_replica", "other"))
    assert(r.routeTable("x", "y") == ("x", "y"))
    assert(r.routeTopic("app", "customer") == "cdc.app.clients")
    assert(r.routeTopic("x", "y") == "cdc.default")
    val star = r.copy(topicMap = r.topicMap + (("app", "*") -> "cdc.app"))
    assert(star.routeTopic("app", "anything") == "cdc.app")
  }

  test("router reverse maps route back") {
    val r = Routing.demoRouter.reverse
    assert(r.routeTable("app_replica", "clients") == ("app", "customer"))
    assert(r.routeColumn("app_replica", "clients", "id") == "c_custkey")
  }

  test("renameColumns applies the col_map on a DataFrame") {
    val df = Tables.customer(spark, sf)
    val out = Routing.demoRouter.renameColumns("app", "customer", df)
    assert(out.columns.contains("id") && out.columns.contains("balance"))
    assert(!out.columns.contains("c_custkey"))
    assert(out.count() == df.count())
  }

  private val e = ChangeEvent("app", "t", 0, RowKind.Update,
    Map("k" -> "1", "v" -> "old"), Map("k" -> "1", "v" -> "new"), "none",
    "", "n1")

  test("transform hook: rename, set, drop, chain (Lua-script contract)") {
    assert(RowTransform.renameColumn("v", "val")(e).get.after
      .contains("val"))
    assert(RowTransform.setValue("v", "x")(e).get.after("v") == "x")
    assert(RowTransform.dropIf(_.tb == "t")(e).isEmpty)
    val chained = RowTransform.chain(Seq(
      RowTransform.setValue("v", "x"),
      RowTransform.dropIf(_.after("v") == "x")))
    assert(chained(e).isEmpty)
  }

  test("transform applies over a typed Dataset with drops") {
    import spark.implicits._
    val ds = spark.createDataset(Seq(
      e, e.copy(tb = "keep1"), e.copy(tb = "keep2")))
    val out = RowTransform.applyAll(ds,
      Seq(RowTransform.dropIf(_.tb == "t")))
    assert(out.collect().map(_.tb).sorted.toSeq == Seq("keep1", "keep2"))
  }
}
