package graft

import scala.jdk.CollectionConverters._

import graft.config.TaskManager

/** Task lifecycle battery — the dt-cli analog surface
  * (create/start/list/show/logs/stop/delete, reference
  * dt-cli/src/main.rs) over per-task record directories.
  */
class TaskManagerSpec extends SparkSuite {

  private def ini(sink: String) = s"""
    |[extractor]
    |extract_type=snapshot
    |url=$sf
    |
    |[filter]
    |do_tbs=app.orders,app.customer,app.nation
    |
    |[router]
    |db_map=app:app_replica
    |
    |[sinker]
    |url=$sink
    |""".stripMargin

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("create → list → show → start → finished, logs tell the story") {
    val state = tmp("graft-tm-state")
    val sink = tmp("graft-tm-sink")
    val created = TaskManager.create(state, "snap1", ini(sink))
    assert(created.status == "created")
    intercept[IllegalArgumentException] {
      TaskManager.create(state, "snap1", ini(sink))
    }
    assert(TaskManager.list(state).map(_.name) == Seq("snap1"))
    val (meta, task) = TaskManager.show(state, "snap1")
    assert(meta.status == "created" &&
      task.extractType == graft.config.TaskConfig.SnapshotExtract)
    val done = TaskManager.start(spark, state, "snap1")
    assert(done.status == "finished" && done.endedMs.nonEmpty)
    val logs = TaskManager.logs(state, "snap1")
    assert(logs.exists(_.contains("snapshot app.orders")))
    assert(logs.exists(_.contains("app_replica.customer")))
    assert(logs.count(_.contains("snapshot app.")) == 3)
    // the snapshot actually landed at the routed destination
    assert(spark.read.parquet(s"$sink/app_replica.orders").count() > 0)
  }

  test("stop between units: cooperative, restartable") {
    val state = tmp("graft-tm-state")
    val sink = tmp("graft-tm-sink")
    TaskManager.create(state, "snap2", ini(sink))
    // plant the stop flag right after the FIRST unit completes
    val stopped = TaskManager.start(spark, state, "snap2",
      afterUnit = i => if (i == 0) TaskManager.requestStop(state, "snap2"))
    assert(stopped.status == "stopped")
    assert(TaskManager.logs(state, "snap2")
      .count(_.contains("snapshot app.")) == 1)
    // a terminal task restarts from scratch; the stale flag is cleared
    val done = TaskManager.start(spark, state, "snap2")
    assert(done.status == "finished")
    assert(TaskManager.logs(state, "snap2")
      .count(_.contains("snapshot app.")) == 4) // 1 + all 3
  }

  test("failed tasks record the error and stay restartable") {
    val state = tmp("graft-tm-state")
    TaskManager.create(state, "bad", ini("/nonexistent/sink")
      .replace(s"url=$sf", "url=/nonexistent/source"))
    val failed = TaskManager.start(spark, state, "bad")
    assert(failed.status == "failed" && failed.error.nonEmpty)
    assert(TaskManager.list(state).head.status == "failed")
  }

  test("delete refuses running tasks, removes terminal ones") {
    val state = tmp("graft-tm-state")
    val sink = tmp("graft-tm-sink")
    TaskManager.create(state, "snap3", ini(sink))
    TaskManager.start(spark, state, "snap3")
    TaskManager.delete(state, "snap3")
    assert(TaskManager.list(state).isEmpty)
    intercept[java.nio.file.NoSuchFileException] {
      TaskManager.show(state, "snap3")
    }
  }

  test("cdc task through the lifecycle: drains the capture once, a " +
      "restart ships nothing (positions live in the task dir)") {
    val state = tmp("graft-tm-cdc")
    // captured stream: one committed txn, two inserts
    val w = new graft.sources.PgOutputWriter()
    w.relation(3L, "public", "t_cdc", 'd', Seq(
      graft.sources.PgOutput.RelColumn("id", keyPart = true, 20, -1),
      graft.sources.PgOutput.RelColumn("v", keyPart = false, 25, -1)))
    w.begin(0x30000100L, 1L, 77L)
    w.insert(3L, Array("1", "a"))
    w.insert(3L, Array("2", "b"))
    w.commit(0x30000100L, 0x30000200L, 1L)
    val capture = java.nio.file.Files.createTempFile("tm-cdc", ".wal")
    java.nio.file.Files.write(capture, w.bytes())

    val wh = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    wh.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        ex.getRequestBody.readAllBytes(): Unit
        puts.incrementAndGet(): Unit
        val reply = """{"Status":"Success"}"""
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(200, reply.length.toLong)
        val os = ex.getResponseBody
        try os.write(reply) finally os.close()
      } finally ex.close())
    wh.start()
    try {
      val cdcIni =
        s"""[extractor]
           |extract_type=cdc
           |slot_name=tm_slot
           |batch_size=10
           |id_cols=t_cdc:id
           |wal_capture=$capture
           |
           |[filter]
           |do_dbs=public
           |
           |[sinker]
           |url=http://127.0.0.1:${wh.getAddress.getPort}
           |""".stripMargin
      TaskManager.create(state, "cdc1", cdcIni)
      val done = TaskManager.start(spark, state, "cdc1")
      assert(done.status == "finished")
      assert(TaskManager.logs(state, "cdc1").exists(
        _.contains("shipped=2")))
      assert(puts.get() > 0)

      // restart the same task: recovered position pre-seeks the
      // whole capture away — no new PUTs
      val before = puts.get()
      val again = TaskManager.start(spark, state, "cdc1")
      assert(again.status == "finished")
      assert(TaskManager.logs(state, "cdc1").exists(
        _.contains("shipped=0 skipped=2")))
      assert(puts.get() == before)
    } finally wh.stop(0)
  }

  test("curation task runs corpus-scoped and logs the verdict counts") {
    val state = tmp("graft-tm-cur-state")
    val sink = tmp("graft-tm-cur-sink")
    val curIni = s"""
      |[extractor]
      |extract_type=curation
      |url=$sf
      |
      |[sinker]
      |url=$sink
      |""".stripMargin
    TaskManager.create(state, "cur1", curIni)
    val done = TaskManager.start(spark, state, "cur1")
    assert(done.status == "finished", done.error)
    val logs = TaskManager.logs(state, "cur1")
    assert(logs.exists(l => l.contains("curation docs=") &&
      l.contains("kept=")), logs)
  }

  test("curation_stream task drains arriving docs; a second start " +
      "resumes after the first drain") {
    val sparkSession = spark
    import sparkSession.implicits._
    val state = tmp("graft-tm-cs-state")
    val src = tmp("graft-tm-cs-src")
    val sink = tmp("graft-tm-cs-sink")
    val good =
      "the cat of the house is in the garden and the dog of the town " +
      "is in the park at noon while the bird of the tree is in the " +
      "nest and the fish of the pond is in the weeds"
    def write(name: String, rows: (Long, String)*): Unit = {
      // the file stream source lists plain files — land one per drop
      val tmpOut = tmp("graft-tm-cs-stage")
      rows.map { case (id, t) =>
        (id, t, java.sql.Timestamp.valueOf("2024-01-01 10:00:00")) }
        .toDF("doc_id", "text", "ts")
        .coalesce(1).write.mode("overwrite").parquet(tmpOut)
      val part = java.nio.file.Files.list(java.nio.file.Paths.get(tmpOut))
        .iterator().asScala.toSeq // deterministic single part file
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part,
        java.nio.file.Paths.get(s"$src/$name.parquet"))
    }
    // the source dir is a stream of parquet drops
    write("batch1", (1L, good), (2L, "!!!,,,???..."))
    val csIni = s"""
      |[extractor]
      |extract_type=curation_stream
      |url=$src
      |
      |[sinker]
      |url=$sink
      |""".stripMargin
    TaskManager.create(state, "cs1", csIni)
    val first = TaskManager.start(spark, state, "cs1")
    assert(first.status == "finished", first.error)
    assert(TaskManager.logs(state, "cs1").exists(_.contains(
      "curation_stream in=2 quality_dropped=1 contam_dropped=0 " +
      "exact_dropped=0 " +
        "neardup_flagged=0 kept=1")))

    // new files arrive while the task is down: an exact copy (dropped
    // by the recovered exact-dedup state) and a rewrite (flagged by
    // the recovered near-dup state)
    write("batch2", (3L, good), (4L, good.replace("noon", "dusk")))
    val second = TaskManager.start(spark, state, "cs1")
    assert(second.status == "finished", second.error)
    assert(TaskManager.logs(state, "cs1").exists(_.contains(
      "curation_stream in=2 quality_dropped=0 contam_dropped=0 " +
      "exact_dropped=1 " +
        "neardup_flagged=1 kept=0")))
    // cumulative verdicts: doc 1 kept, doc 4 flagged against it
    val verdicts = spark.read.parquet(s"$sink/verdicts")
    assert(verdicts.filter($"is_dup").select("doc_id").as[Long]
      .collect().toSet == Set(4L))
    assert(verdicts.filter(!$"is_dup").select("doc_id").as[Long]
      .collect().toSet == Set(1L))
  }

  test("single-shot task kinds run through the lifecycle: scan and " +
      "reshard finish with their report logs") {
    val state = tmp("graft-tm-kinds")
    val sink = tmp("graft-tm-kinds-sink")
    val fixture = java.nio.file.Files
      .createTempFile("graft-tm-keyspace", ".jsonl")
    java.nio.file.Files.writeString(fixture,
      """{"db":0,"key":"a","type":"string","freq":3,"bytes":10}
        |{"db":0,"key":"b","type":"string","freq":7,"bytes":20}
        |""".stripMargin)
    TaskManager.create(state, "scan1",
      s"""[extractor]
         |extract_type=scan
         |statistic_type=hot_key
         |keyspace_fixture=$fixture
         |[sinker]
         |url=$sink
         |""".stripMargin)
    val done = TaskManager.start(spark, state, "scan1")
    assert(done.status == "finished")
    assert(TaskManager.logs(state, "scan1")
      .exists(_.contains("scan hot_key report_rows=2")))

    TaskManager.create(state, "reshard1",
      s"""[extractor]
         |extract_type=reshard
         |slots_before=a@0-16383
         |slots_after=a@0-8191,b@8192-16383
         |[sinker]
         |url=$sink
         |""".stripMargin)
    val r = TaskManager.start(spark, state, "reshard1")
    assert(r.status == "finished")
    assert(TaskManager.logs(state, "reshard1")
      .exists(_.contains("reshard planned_moves=1")))
  }

  test("corpus contract gates: good corpus passes, wrong types and " +
      "missing columns fail, streaming kind demands ts") {
    import graft.infra.Precheck
    val s2 = spark
    import s2.implicits._
    // the standard testdata layout (documents.parquet inside) passes
    val good = Precheck.checkCorpusContract(spark, sf)
    assert(good.forall(_.ok), good.mkString("; "))
    // a bare parquet dataset passes too
    val dir = java.nio.file.Files.createTempDirectory("pc").toString
    Seq((1L, "text one"), (2L, "text two")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/bare")
    assert(Precheck.checkCorpusContract(spark, s"$dir/bare")
      .forall(_.ok))
    // streaming needs ts: the same corpus fails with needTs
    val noTs = Precheck.checkCorpusContract(spark, s"$dir/bare",
      needTs = true)
    assert(noTs.exists(g => g.item == "corpus_ts" && !g.ok))
    // wrong doc_id type fails
    Seq(("a", "text")).toDF("doc_id", "text")
      .write.mode("overwrite").parquet(s"$dir/badid")
    val badId = Precheck.checkCorpusContract(spark, s"$dir/badid")
    assert(badId.exists(g => g.item == "corpus_doc_id" && !g.ok))
    // missing text fails
    Seq((1L, 2L)).toDF("doc_id", "n")
      .write.mode("overwrite").parquet(s"$dir/notext")
    val noText = Precheck.checkCorpusContract(spark, s"$dir/notext")
    assert(noText.exists(g => g.item == "corpus_text" && !g.ok))
    // unreadable path fails at the first gate
    val unread = Precheck.checkCorpusContract(spark, s"$dir/absent")
    assert(unread.size == 1 && !unread.head.ok)
  }

  test("the corpus precheck gates the task: a loader task on a " +
      "broken corpus errors before any work") {
    val s2 = spark
    import s2.implicits._
    val base = java.nio.file.Files.createTempDirectory("pcm").toString
    Seq((1L, 2L)).toDF("doc_id", "n")
      .write.parquet(s"$base/broken/documents.parquet")
    val state = s"$base/state"
    TaskManager.create(state, "bad_loader",
      s"""[extractor]
         |extract_type=loader
         |url=$base/broken
         |
         |[sinker]
         |url=$base/out
         |""".stripMargin)
    val meta = TaskManager.start(spark, state, "bad_loader")
    assert(meta.status == "error")
    assert(meta.error.exists(_.contains("corpus_text")))
  }

  // ------------------------------------------------------- supervision
  // dt-cli daemon parity: watch, auto-restart with capped backoff,
  // resume from durable state, log rotation

  test("supervised restart: a crash mid-unit restarts with backoff " +
      "and the rerun completes the snapshot") {
    val state = tmp("graft-sup-state")
    val sink = tmp("graft-sup-sink")
    TaskManager.create(state, "sup1", ini(sink))
    var crashed = false
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val meta = TaskManager.superviseStart(spark, state, "sup1",
      TaskManager.SupervisorConfig(maxRestarts = 3, baseBackoffMs = 50),
      sleep = sleeps += _,
      afterUnit = i => if (i == 0 && !crashed) {
        crashed = true
        sys.error("runner killed mid-unit")
      })
    assert(meta.status == "finished")
    assert(meta.restarts == 1)
    assert(sleeps == Seq(50L))
    val logs = TaskManager.logs(state, "sup1")
    assert(logs.exists(_.contains("supervised restart #1")))
    // the rerun completed every unit at the routed destination
    Seq("orders", "customer", "nation").foreach { t =>
      assert(spark.read.parquet(s"$sink/app_replica.$t").count() > 0)
    }
  }

  test("restart budget caps: a permanently failing task ends failed " +
      "with the exhausted budget logged") {
    val state = tmp("graft-sup-budget")
    TaskManager.create(state, "doomed", ini("/no/sink")
      .replace(s"url=$sf", "url=/no/source"))
    val sleeps = scala.collection.mutable.ArrayBuffer[Long]()
    val meta = TaskManager.superviseStart(spark, state, "doomed",
      TaskManager.SupervisorConfig(maxRestarts = 2, baseBackoffMs = 10),
      sleep = sleeps += _)
    assert(meta.status == "failed")
    assert(meta.restarts == 2)
    assert(sleeps == Seq(10L, 20L)) // doubling ladder
    assert(TaskManager.logs(state, "doomed")
      .exists(_.contains("restart budget exhausted")))
  }

  test("watch pass demotes a stale running task (crashed JVM) and " +
      "restarts it to completion") {
    val state = tmp("graft-sup-watch")
    val sink = tmp("graft-sup-watch-sink")
    TaskManager.create(state, "stale1", ini(sink))
    // simulate a runner that died without finishing: meta says
    // running, the liveness beacon is old (a prior JVM's crash leaves
    // exactly this on disk)
    val dir = java.nio.file.Paths.get(state, "stale1")
    java.nio.file.Files.write(dir.resolve("meta.ini"),
      ("[meta]\nname=stale1\nstatus=running\ncreated_ms=1\n" +
        "started_ms=1\nended_ms=-1\nrestarts=0\nerror=\n")
        .getBytes("UTF-8"))
    java.nio.file.Files.write(dir.resolve("runner.alive"),
      "1".getBytes("UTF-8")) // epoch 1ms: ancient
    val restarted = TaskManager.superviseAll(spark, state,
      TaskManager.SupervisorConfig(maxRestarts = 2, baseBackoffMs = 1,
        staleAliveMs = 1000), sleep = _ => ())
    assert(restarted == Seq("stale1"))
    val after = TaskManager.list(state).head
    assert(after.status == "finished")
    val logs = TaskManager.logs(state, "stale1")
    assert(logs.exists(_.contains("liveness beacon stale")))
    assert(spark.read.parquet(s"$sink/app_replica.orders").count() > 0)
    // a healthy finished task is left alone on the next pass
    assert(TaskManager.superviseAll(spark, state).isEmpty)
  }

  test("supervised cdc restart resumes from recorded positions: a " +
      "sink outage fails run #1, the rerun ships, a third start " +
      "skips everything") {
    val state = tmp("graft-sup-cdc")
    val w = new graft.sources.PgOutputWriter()
    w.relation(3L, "public", "t_cdc", 'd', Seq(
      graft.sources.PgOutput.RelColumn("id", keyPart = true, 20, -1),
      graft.sources.PgOutput.RelColumn("v", keyPart = false, 25, -1)))
    w.begin(0x30000100L, 1L, 77L)
    w.insert(3L, Array("1", "a"))
    w.insert(3L, Array("2", "b"))
    w.commit(0x30000100L, 0x30000200L, 1L)
    val capture = java.nio.file.Files.createTempFile("sup-cdc", ".wal")
    java.nio.file.Files.write(capture, w.bytes())

    val healthy = new java.util.concurrent.atomic.AtomicBoolean(false)
    val puts = new java.util.concurrent.atomic.AtomicInteger(0)
    val wh = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    wh.createContext("/", (ex: com.sun.net.httpserver.HttpExchange) =>
      try {
        ex.getRequestBody.readAllBytes(): Unit
        val (code, reply) =
          if (healthy.get()) { puts.incrementAndGet(): Unit
            (200, """{"Status":"Success"}""") }
          else (500, """{"Status":"Fail"}""")
        val b = reply.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        ex.sendResponseHeaders(code, b.length.toLong)
        val os = ex.getResponseBody
        try os.write(b) finally os.close()
      } finally ex.close())
    wh.start()
    try {
      TaskManager.create(state, "supcdc",
        s"""[extractor]
           |extract_type=cdc
           |slot_name=sup_slot
           |batch_size=10
           |id_cols=t_cdc:id
           |wal_capture=$capture
           |
           |[filter]
           |do_dbs=public
           |
           |[sinker]
           |url=http://127.0.0.1:${wh.getAddress.getPort}
           |""".stripMargin)
      // the sink heals during the backoff before the restart — the
      // crash window a real outage produces
      val meta = TaskManager.superviseStart(spark, state, "supcdc",
        TaskManager.SupervisorConfig(maxRestarts = 3, baseBackoffMs = 1),
        sleep = _ => healthy.set(true))
      assert(meta.status == "finished")
      assert(meta.restarts >= 1)
      assert(puts.get() > 0)
      // positions recorded by the supervised rerun: a fresh start
      // ships nothing
      val before = puts.get()
      val again = TaskManager.start(spark, state, "supcdc")
      assert(again.status == "finished")
      assert(TaskManager.logs(state, "supcdc").exists(
        _.contains("shipped=0 skipped=2")))
      assert(puts.get() == before)
    } finally wh.stop(0)
  }

  test("log rotation shifts task.log into a capped history") {
    val dir = tmp("graft-sup-logs")
    val d = java.nio.file.Paths.get(dir)
    def write(name: String, text: String): Unit =
      java.nio.file.Files.write(d.resolve(name), text.getBytes("UTF-8"))
    write("task.log", "x" * 2048)
    write("task.log.1", "old1")
    write("task.log.2", "old2")
    write("task.log.3", "old3") // at keep cap: must drop
    TaskManager.rotateLogs(dir, maxBytes = 1024, keep = 3)
    def read(name: String): String = new String(
      java.nio.file.Files.readAllBytes(d.resolve(name)), "UTF-8")
    assert(!java.nio.file.Files.exists(d.resolve("task.log")))
    assert(read("task.log.1").startsWith("xxx"))
    assert(read("task.log.2") == "old1")
    assert(read("task.log.3") == "old2") // old3 rotated out
    // under the cap: untouched
    write("task.log", "small")
    TaskManager.rotateLogs(dir, maxBytes = 1024, keep = 3)
    assert(read("task.log") == "small")
  }
}
