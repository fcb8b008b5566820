package graft

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.types._

import graft.meta.MetaManager
import graft.operators.Routing
import graft.streaming.DdlAwarePipeline

class DdlPipelineSpec extends SparkSuite {

  import DdlPipelineSpec._

  test("DDL barrier: serial apply, routed, meta invalidated, DML flows") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    fetches.set(0)
    appliedDdl.synchronized(appliedDdl.clear())
    dmlCount.set(0)

    val meta = new MetaManager(Fetcher)
    meta.get("app", "customer") // warm cache
    assert(fetches.get() == 1)

    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.process(
      input.toDF(), Routing.demoRouter, defaultDb = "app", meta,
      ddlSink = RecordingDdlSink,
      onBatch = (dml, _) => dmlCount.addAndGet(dml.count())).start()
    try {
      input.addData(
        Change("insert", null, 1L),
        Change("ddl", "ALTER TABLE customer ADD COLUMN c INT", 0L),
        Change("update", null, 2L))
      q.processAllAvailable()
    } finally q.stop()

    // DDL routed through the demo router (customer → clients)
    assert(appliedDdl.synchronized(appliedDdl.toSeq) ==
      Seq("ALTER TABLE `app_replica`.`clients` ADD COLUMN c INT"))
    // typed ALTER evolved the cached meta IN PLACE: no refetch, and the
    // cached struct already carries the new column
    val evolved = meta.get("app", "customer")
    assert(fetches.get() == 1)
    assert(evolved.structType.fieldNames.toSeq == Seq("id", "c"))
    // DML flowed without the DDL row
    assert(dmlCount.get() == 2)
  }

  test("barrier lane replays Mongo change-stream DDL: " +
      "schema-qualified rename routes both namespaces") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    fetches.set(0)
    appliedDdl.synchronized(appliedDdl.clear())
    dmlCount.set(0)

    val meta = new MetaManager(Fetcher)
    meta.get("app", "customer") // warm cache
    assert(fetches.get() == 1)

    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.process(
      input.toDF(), Routing.demoRouter, defaultDb = "app", meta,
      ddlSink = RecordingDdlSink,
      onBatch = (dml, _) => dmlCount.addAndGet(dml.count())).start()
    try {
      input.addData(
        Change("insert", null, 1L),
        // the Mongo CDC lane ships the change-stream event doc as the
        // ddl_text — a rename out of app.customer into app.archive
        Change("ddl", """{"operationType":"rename",
          "ns":{"db":"app","coll":"customer"},
          "to":{"db":"app","coll":"archive"}}""", 0L),
        Change("ddl", """{"operationType":"createIndexes",
          "ns":{"db":"app","coll":"orders"},
          "operationDescription":{"indexes":[{"name":"i1",
            "key":{"k":1}}]}}""", 0L),
        Change("update", null, 2L))
      q.processAllAvailable()
    } finally q.stop()

    // demo router: app→app_replica, (app,customer)→(app_replica,
    // clients); the replay command re-namespaces from the routed
    // fields like the reference sinker's rewrite
    assert(appliedDdl.synchronized(appliedDdl.toSeq) == Seq(
      """{"renameCollection":"app_replica.clients","to":"app_replica.archive"}""",
      """{"createIndexes":"orders","indexes":[{"name":"i1","key":{"k":1}}]}"""))
    // the renamed-away collection's meta invalidated → refetch
    meta.get("app", "customer")
    assert(fetches.get() == 2)
    assert(dmlCount.get() == 2)
  }

  test("conflict_policy=ignore: a failing sink DDL is recorded, the " +
      "cache invalidated (not evolved), and the batch keeps flowing") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    fetches.set(0)
    appliedDdl.synchronized(appliedDdl.clear())
    dmlCount.set(0)

    val meta = new MetaManager(Fetcher)
    meta.get("app", "customer") // warm cache
    assert(fetches.get() == 1)

    val reports = new ArrayBuffer[DdlAwarePipeline.BatchReport]()
    val failingSink = new DdlAwarePipeline.DdlSink {
      def execute(ddl: String): Unit = {
        if (ddl.contains("ADD COLUMN boom"))
          throw new RuntimeException("Duplicate column name 'boom'")
        appliedDdl.synchronized(appliedDdl += ddl)
      }
    }
    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.process(
      input.toDF(), Routing.demoRouter, defaultDb = "app", meta,
      ddlSink = failingSink,
      onBatch = (dml, _) => dmlCount.addAndGet(dml.count()),
      report = r => reports.synchronized(reports += r),
      conflictPolicy = graft.struct.StructApplier.Ignore).start()
    try {
      input.addData(
        Change("insert", null, 1L),
        Change("ddl", "ALTER TABLE customer ADD COLUMN boom INT", 0L),
        Change("ddl", "ALTER TABLE customer ADD COLUMN ok INT", 0L),
        Change("update", null, 2L))
      q.processAllAvailable()
    } finally q.stop()

    // the failure was swallowed: the NEXT statement still applied and
    // DML flowed
    assert(appliedDdl.synchronized(appliedDdl.toSeq) ==
      Seq("ALTER TABLE `app_replica`.`clients` ADD COLUMN ok INT"))
    assert(dmlCount.get() == 2)
    // the report carries the reference's log_error line as data
    val errs = reports.synchronized(reports.flatMap(_.ddlErrors).toSeq)
    assert(errs.map(_._1) ==
      Seq("ALTER TABLE `app_replica`.`clients` ADD COLUMN boom INT"))
    assert(errs.head._2.contains("Duplicate column name"))
    // failed DDL did NOT evolve the cache from a statement that never
    // landed: the entry was invalidated, so the next access defers to
    // the authoritative fetcher (whose stub returns the base struct)
    // instead of trusting any statement applied in between
    val got = meta.get("app", "customer")
    assert(fetches.get() == 2)
    assert(got.structType.fieldNames.toSeq == Seq("id"))
  }

  test("processForTask resolves the policy from the INI: meta_center " +
      "ddl_conflict_policy=ignore survives a failing sink DDL") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val task = graft.config.TaskConfig.fromIni(
      """[extractor]
        |url=/src
        |
        |[filter]
        |do_ddls=*
        |
        |[sinker]
        |url=/sink
        |conflict_policy=interrupt
        |
        |[meta_center]
        |type=dbengine
        |url=/meta
        |ddl_conflict_policy=ignore
        |""".stripMargin)
    // meta_center's policy must take precedence over the sinker's
    val meta = new MetaManager(Fetcher)
    val dml = new java.util.concurrent.atomic.AtomicLong(0)
    val errs = new ArrayBuffer[(String, String)]()
    val failingSink = new DdlAwarePipeline.DdlSink {
      def execute(ddl: String): Unit =
        throw new RuntimeException("already exists")
    }
    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.processForTask(task,
      input.toDF(), meta, failingSink,
      onBatch = (d, _) => dml.addAndGet(d.count()): Unit,
      report = r => errs.synchronized(errs ++= r.ddlErrors): Unit,
      defaultDb = "app").start()
    try {
      input.addData(
        Change("insert", null, 1L),
        Change("ddl", "CREATE TABLE t9 (id INT)", 0L))
      q.processAllAvailable() // ignore: must NOT fail the stream
    } finally q.stop()
    assert(dml.get() == 1)
    assert(errs.synchronized(errs.toList).exists(
      _._2.contains("already exists")))
  }

  test("processForTask keeps the reference opt-in default: a task " +
      "with no [filter] do_ddls drops all DDL (filter_config.rs — " +
      "do_ddls optional, empty set replicates nothing)") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val task = graft.config.TaskConfig.fromIni(
      """[extractor]
        |url=/src
        |
        |[sinker]
        |url=/sink
        |""".stripMargin)
    val meta = new MetaManager(Fetcher)
    val dml = new java.util.concurrent.atomic.AtomicLong(0)
    val sank = new ArrayBuffer[String]()
    val sink = new DdlAwarePipeline.DdlSink {
      def execute(ddl: String): Unit = sank.synchronized(sank += ddl)
    }
    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.processForTask(task,
      input.toDF(), meta, sink,
      onBatch = (d, _) => dml.addAndGet(d.count()): Unit,
      defaultDb = "app").start()
    try {
      input.addData(
        Change("insert", null, 1L),
        Change("ddl", "CREATE TABLE t10 (id INT)", 0L))
      q.processAllAvailable()
    } finally q.stop()
    // DML flowed; the unconfigured DDL lane replayed NOTHING
    assert(dml.get() == 1)
    assert(sank.synchronized(sank.toList).isEmpty)
  }

  test("conflict_policy=interrupt (default): a failing sink DDL " +
      "propagates and fails the stream") {
    val sparkSession = spark
    import sparkSession.implicits._
    implicit val sqlCtx = sparkSession.sqlContext

    val meta = new MetaManager(Fetcher)
    val failingSink = new DdlAwarePipeline.DdlSink {
      def execute(ddl: String): Unit =
        throw new RuntimeException("table already exists")
    }
    val input = MemoryStream[Change]
    val q = DdlAwarePipeline.process(
      input.toDF(), Routing.demoRouter, defaultDb = "app", meta,
      ddlSink = failingSink,
      onBatch = (_, _) => ()).start()
    try {
      input.addData(Change("ddl", "CREATE TABLE t2 (id INT)", 0L))
      val e = intercept[org.apache.spark.sql.streaming
        .StreamingQueryException] {
        q.processAllAvailable()
      }
      assert(e.getMessage.contains("table already exists") ||
        Option(e.getCause).exists(
          _.getMessage.contains("table already exists")))
    } finally q.stop()
  }

}

object DdlPipelineSpec {
  case class Change(row_type: String, ddl_text: String, user_id: Long)

  val fetches = new java.util.concurrent.atomic.AtomicInteger(0)
  val dmlCount = new java.util.concurrent.atomic.AtomicLong(0)
  val appliedDdl = new ArrayBuffer[String]()

  object Fetcher extends MetaManager.MetaFetcher with Serializable {
    def fetch(s: String, t: String): MetaManager.TableMeta = {
      fetches.incrementAndGet()
      MetaManager.TableMeta(s, t,
        StructType(Seq(StructField("id", LongType))),
        Seq("id"), Seq("id"), None)
    }
  }

  object RecordingDdlSink extends DdlAwarePipeline.DdlSink {
    def execute(ddl: String): Unit =
      appliedDdl.synchronized(appliedDdl += ddl)
  }
}
