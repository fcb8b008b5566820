package graft.config

import graft.transport.PumpPositions

/** Regression battery for the round-15 LiveCdc review findings: torn
  * position files self-heal instead of crash-looping, and the cadence
  * merge covers every table touched since the LAST merge, not just
  * the cadence batch's own tables.
  */
class LiveCdcHardeningSpec extends graft.SparkSuite {

  private def mysqlTask(sink: String): TaskConfig.Task =
    TaskConfig.fromIni(
      s"""[extractor]
         |db_type=mysql
         |extract_type=cdc
         |url=mysql://u:p@127.0.0.1:3306
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)

  test("a TORN pump.position value reads as absent — the documented " +
      "self-healing contract, not a supervised crash-loop") {
    val taskDir = java.nio.file.Files
      .createTempDirectory("torn-pos").toString
    val task = mysqlTask("/tmp/unused-sink")
    // a crash mid-write left `pos=` truncated (and a second variant
    // with garbage) — the resume config must fall back to the base
    // start, never throw
    graft.infra.Fs.writeString(PumpPositions.path(taskDir),
      "file=binlog.000009\npos=\ngtids=\n")
    val c1 = LiveCdc.mysqlResumeConfig(task, taskDir)
    assert(c1.binlogFilename == "binlog.000009")
    assert(c1.binlogPosition == 4L) // the base default
    graft.infra.Fs.writeString(PumpPositions.path(taskDir),
      "pos=12x34\n")
    assert(LiveCdc.mysqlResumeConfig(task, taskDir)
      .binlogPosition == 4L)
  }

  test("the cadence merge publishes every table touched since the " +
      "LAST merge: a table quiet at the cadence batch still gets its " +
      "flat face (not delta dirs hidden until finalize)") {
    val s = spark
    import s.implicits._
    val sink = java.nio.file.Files
      .createTempDirectory("cadence-sink").toString
    val task = mysqlTask(sink)
    val touched = scala.collection.mutable.Set[String]()
    def batchOf(tb: String, key: String): org.apache.spark.sql
        .DataFrame =
      Seq(("app", tb, 1L, "insert", key, s"""{"id":"$key"}"""))
        .toDF("schema", "tb", "seq", "row_type", "key", "payload")
    // batch 5 touches t1; batches 6..7 touch only t2; batch 7 is the
    // cadence (CompactEvery = 8). Pre-fix, only t2 (in the cadence
    // batch itself) merged — t1's rows sat in underscore-hidden
    // _delta dirs with an EMPTY published face for the residency.
    LiveCdc.landBatch(task, sink, touched)(batchOf("t1", "a"), 5L)
    LiveCdc.landBatch(task, sink, touched)(batchOf("t2", "b"), 6L)
    LiveCdc.landBatch(task, sink, touched)(batchOf("t2", "c"), 7L)
    val t1 = spark.read.parquet(s"$sink/app.t1")
      .collect().map(_.getString(0))
    assert(t1.toSeq == Seq("a"),
      s"quiet table t1 unpublished at the cadence: ${t1.toSeq}")
    assert(spark.read.parquet(s"$sink/app.t2").count() == 2)
    // the set drained: the next cadence won't re-copy untouched faces
    assert(touched.isEmpty)
  }
}
