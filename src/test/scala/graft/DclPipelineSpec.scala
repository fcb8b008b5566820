package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.meta.{DclParser, MetaManager}
import graft.operators.{NameFilter, Router}
import graft.streaming.DdlAwarePipeline

/** DCL apply flow — parsed DCL events ride the barrier lane and replay
  * as rendered SQL on the sink, routed and type-gated (reference
  * mysql_cdc_extractor.rs:411-424 push_dcl + mysql_sinker.rs:135-152
  * sink_dcl + rdb_filter.rs:126-128 filter_dcl).
  */
class DclPipelineSpec extends SparkSuite {

  import DclPipelineSpec._

  private val router = Router(
    schemaMap = Map("app" -> "app_replica"),
    tbMap = Map(("app", "customer") -> ("app_replica", "clients")))

  test("DCL routes GRANT/REVOKE object targets, users pass verbatim") {
    def routed(sql: String): String =
      DclParser.route(DclParser.parse(sql), router).render
    assert(routed("GRANT SELECT, INSERT ON app.customer TO 'bob'@'%'") ==
      "GRANT SELECT, INSERT ON app_replica.clients TO 'bob'@'%'")
    assert(routed("GRANT ALL ON `app`.`customer` TO 'bob'@'%'") ==
      "GRANT ALL ON `app_replica`.`clients` TO 'bob'@'%'")
    assert(routed("GRANT SELECT ON app.* TO 'bob'@'%'") ==
      "GRANT SELECT ON app_replica.* TO 'bob'@'%'")
    assert(routed("REVOKE SELECT ON app.customer FROM 'bob'@'%'") ==
      "REVOKE SELECT ON app_replica.clients FROM 'bob'@'%'")
    assert(routed("GRANT SELECT ON *.* TO 'bob'@'%'") ==
      "GRANT SELECT ON *.* TO 'bob'@'%'")
    assert(routed("CREATE USER 'bob'@'%' IDENTIFIED BY 'pw'") ==
      "CREATE USER 'bob'@'%' IDENTIFIED BY 'pw'")
  }

  test("DCL rides the barrier: applied in order, gated by type, DML flows") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    applied.synchronized(applied.clear())
    dmlRows.set(0)
    reports.synchronized(reports.clear())

    val meta = new MetaManager(Fetcher)
    val q = DdlAwarePipeline.process(
      MemoryStreamHolder.input.toDF(), router, defaultDb = "app", meta,
      ddlSink = RecordingSink,
      onBatch = (dml, _) => dmlRows.addAndGet(dml.count()),
      report = r => reports.synchronized(reports += r),
      filter = NameFilter(doDdls = Set("*"),
        doDcls = Set("create_user", "grant"))).start()
    try {
      MemoryStreamHolder.input.addData(
        Change("insert", null, 1L),
        Change("dcl", "CREATE USER 'bob'@'%' IDENTIFIED BY 'pw'", 0L),
        Change("dcl", "GRANT SELECT ON app.customer TO 'bob'@'%'", 0L),
        // revoke is NOT in do_dcls → dropped
        Change("dcl", "REVOKE SELECT ON app.customer FROM 'bob'@'%'", 0L),
        Change("ddl", "TRUNCATE TABLE customer", 0L),
        Change("update", null, 2L))
      q.processAllAvailable()
    } finally q.stop()

    assert(applied.synchronized(applied.toSeq) == Seq(
      "CREATE USER 'bob'@'%' IDENTIFIED BY 'pw'",
      "GRANT SELECT ON app_replica.clients TO 'bob'@'%'",
      "TRUNCATE TABLE `app_replica`.`clients`"))
    assert(dmlRows.get() == 2)
    val r = reports.synchronized(reports.last)
    assert(r.dclApplied == Seq(
      "CREATE USER 'bob'@'%' IDENTIFIED BY 'pw'",
      "GRANT SELECT ON app_replica.clients TO 'bob'@'%'"))
    assert(r.ddlApplied == Seq("TRUNCATE TABLE `app_replica`.`clients`"))
  }

  test("deny-by-default config drops all DCL (reference default)") {
    assert(!NameFilter().allowDcl("grant"))
    assert(NameFilter(doDcls = Set("*")).allowDcl("revoke"))
  }
}

object DclPipelineSpec {
  case class Change(row_type: String, ddl_text: String, user_id: Long)

  val dmlRows = new java.util.concurrent.atomic.AtomicLong(0)
  val applied = new ArrayBuffer[String]()
  val reports = new ArrayBuffer[DdlAwarePipeline.BatchReport]()

  object MemoryStreamHolder {
    lazy val input: MemoryStream[Change] = {
      implicit val sqlCtx = SparkSuite.session.sqlContext
      import SparkSuite.session.implicits._
      MemoryStream[Change]
    }
  }

  object Fetcher extends MetaManager.MetaFetcher with Serializable {
    def fetch(s: String, t: String): MetaManager.TableMeta =
      MetaManager.TableMeta(s, t,
        StructType(Seq(StructField("id", LongType))),
        Seq("id"), Seq("id"), None)
  }

  object RecordingSink extends DdlAwarePipeline.DdlSink {
    def execute(sql: String): Unit =
      applied.synchronized(applied += sql)
  }
}
