package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

/** Drives the DataSource V2 micro-batch changelog source end to end:
  * incremental segment pickup, offset checkpointing across a restart
  * (no reprocessing), and compaction over the drained stream.
  */
class ChangelogSourceSpec extends SparkSuite {
  import spark.implicits._

  private def writeSegment(dir: String, name: String,
      rows: Seq[String]): Unit = {
    // stage + atomic rename so a half-written segment is never listed
    val tmp = Paths.get(dir, s"$name.tmp")
    Files.writeString(tmp, rows.mkString("\n"))
    Files.move(tmp, Paths.get(dir, s"$name.log"))
  }

  private def rec(seq: Long, rt: String, key: String, v: String) =
    s"$seq\tdb\ttb\t$rt\t$key\t$v"

  test("micro-batch source picks up segments incrementally") {
    val dir = Files.createTempDirectory("graft-changelog").toString
    writeSegment(dir, "000001", Seq(
      rec(1, "insert", "k1", "a"), rec(2, "insert", "k2", "b")))

    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir)
      .load()
      .writeStream.format("memory").queryName("cl_inc").start()
    try {
      q.processAllAvailable()
      assert(spark.table("cl_inc").count() == 2)

      writeSegment(dir, "000002", Seq(
        rec(3, "update", "k1", "a2"), rec(4, "delete", "k2", "")))
      q.processAllAvailable()
      val rows = spark.table("cl_inc").orderBy("seq")
        .select("seq", "row_type", "key", "payload")
        .as[(Long, String, String, Option[String])].collect()
      assert(rows.toSeq == Seq(
        (1L, "insert", "k1", Some("a")), (2L, "insert", "k2", Some("b")),
        (3L, "update", "k1", Some("a2")), (4L, "delete", "k2", None)))
    } finally q.stop()
  }

  test("restart resumes from the checkpointed offset, no reprocessing") {
    val dir = Files.createTempDirectory("graft-changelog-r").toString
    val ckpt = Files.createTempDirectory("graft-changelog-ckpt").toString
    writeSegment(dir, "000001", Seq(rec(1, "insert", "k1", "a")))

    // memory sink can't recover from a checkpoint — collect via
    // foreachBatch, one buffer per query generation
    def start(buf: scala.collection.mutable.ArrayBuffer[Long]) =
      spark.readStream
        .format("graft.sources.ChangelogSource")
        .option("path", dir).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) => {
          batch.select("seq").collect().foreach(r => buf += r.getLong(0))
          ()
        })
        .start()

    val got1 = scala.collection.mutable.ArrayBuffer[Long]()
    val q1 = start(got1)
    try { q1.processAllAvailable() } finally q1.stop()
    assert(got1.toSeq == Seq(1L))

    writeSegment(dir, "000002", Seq(rec(2, "insert", "k2", "b")))
    val got2 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = start(got2)
    try {
      q2.processAllAvailable()
      // only the new segment is processed after restart
      assert(got2.toSeq == Seq(2L))
    } finally q2.stop()
  }

  test("restart after retention purge: name offsets skip nothing") {
    val dir = Files.createTempDirectory("graft-changelog-p").toString
    val ckpt = Files.createTempDirectory("graft-changelog-pckpt").toString
    writeSegment(dir, "000001", Seq(rec(1, "insert", "k1", "a")))
    writeSegment(dir, "000002", Seq(rec(2, "insert", "k2", "b")))

    def start(buf: scala.collection.mutable.ArrayBuffer[Long]) =
      spark.readStream
        .format("graft.sources.ChangelogSource")
        .option("path", dir).load()
        .writeStream
        .option("checkpointLocation", ckpt)
        .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) => {
          batch.select("seq").collect().foreach(r => buf += r.getLong(0))
          ()
        })
        .start()

    val got1 = scala.collection.mutable.ArrayBuffer[Long]()
    val q1 = start(got1)
    try q1.processAllAvailable() finally q1.stop()
    assert(got1.sorted.toSeq == Seq(1L, 2L))

    // retention deletes both consumed segments; a count-based offset
    // would remap the checkpoint onto the shifted listing and reprocess
    // or skip — the name-based offset must resume exactly past 000002
    Files.delete(Paths.get(dir, "000001.log"))
    Files.delete(Paths.get(dir, "000002.log"))
    writeSegment(dir, "000003", Seq(rec(3, "insert", "k3", "c")))

    val got2 = scala.collection.mutable.ArrayBuffer[Long]()
    val q2 = start(got2)
    try {
      q2.processAllAvailable()
      assert(got2.toSeq == Seq(3L))
    } finally q2.stop()
  }

  test("compaction composes with the changelog stream per micro-batch") {
    val dir = Files.createTempDirectory("graft-changelog-c").toString
    writeSegment(dir, "000001", Seq(
      rec(1, "insert", "k1", "a"), rec(2, "insert", "k2", "b"),
      rec(3, "update", "k1", "a2"), rec(4, "delete", "k2", "")))

    val seen = scala.collection.mutable.ArrayBuffer[(String, String)]()
    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir).load()
      .writeStream
      .foreachBatch((batch: org.apache.spark.sql.DataFrame, _: Long) => {
        // final state per key within the batch: last row by seq wins
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy("key").orderBy(col("seq").desc)
        batch.withColumn("rn", row_number().over(w))
          .filter(col("rn") === 1)
          .select("key", "row_type")
          .collect()
          .foreach(r => seen += ((r.getString(0), r.getString(1))))
        ()
      })
      .start()
    try q.processAllAvailable() finally q.stop()
    assert(seen.toSet == Set("k1" -> "update", "k2" -> "delete"))
  }

  test("binlog-format segments stream through the same source") {
    import graft.sources.MysqlBinlog.ColType
    val dir = Files.createTempDirectory("graft-changelog-bl").toString

    def binlogSegment(name: String, rows: Seq[Array[String]],
        deletes: Seq[Array[String]] = Nil): Unit = {
      val w = new graft.sources.MysqlBinlogWriter()
      w.fde()
      w.begin("shop")
      w.tableMap(9L, "shop", "items",
        Seq(ColType.LongLong, ColType.Varchar), Seq(0, 40),
        nullable = Seq(false, true), colNames = Seq("id", "name"))
      w.writeRows(9L, rows)
      if (deletes.nonEmpty) w.deleteRows(9L, deletes)
      w.xid(1L)
      val tmp = Paths.get(dir, s"$name.tmp")
      Files.write(tmp, w.bytes())
      Files.move(tmp, Paths.get(dir, s"$name.log"))
    }

    binlogSegment("000001", Seq(
      Array("1", "spoon"), Array("2", "fork\twith\ttabs")))

    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir)
      .option("format", "binlog")
      .option("key_cols", "id")
      .load()
      .writeStream.format("memory").queryName("cl_bl").start()
    try {
      q.processAllAvailable()
      // second wire-format segment picked up incrementally
      binlogSegment("000002", Seq(Array("3", "knife")),
        deletes = Seq(Array("1", "spoon")))
      q.processAllAvailable()
      val rows = spark.table("cl_bl").orderBy("seq")
        .select("seq", "schema", "tb", "row_type", "key", "payload")
        .as[(Long, String, String, String, String, Option[String])]
        .collect().toSeq
      assert(rows.map(r => (r._4, r._5)) == Seq(
        ("insert", "1"), ("insert", "2"),
        ("insert", "3"), ("delete", "1")))
      assert(rows.forall(r => r._2 == "shop" && r._3 == "items"))
      // seq orders across segments via the name-derived base
      assert(rows.map(_._1) == rows.map(_._1).sorted)
      assert(rows(2)._1 > rows(1)._1)
      // tab inside a decoded value survives, escaped against framing
      assert(rows(1)._6.get.contains("name=fork\\twith\\ttabs"))
      assert(rows(3)._6.get.contains("name=spoon")) // delete: before img
    } finally q.stop()
  }

  test("pgoutput-format segments stream through the same source") {
    val dir = Files.createTempDirectory("graft-changelog-pg").toString
    val w = new graft.sources.PgOutputWriter()
    w.begin(0x1000L, 0L, 7L)
    w.relation(55L, "shop", "items", 'd', Seq(
      graft.sources.PgOutput.RelColumn("id", keyPart = true, 20, -1),
      graft.sources.PgOutput.RelColumn("name", false, 25, -1)))
    w.insert(55L, Array("1", "spoon"))
    w.update(55L, None, None, Array("1", "ladle"))
    w.commit(0x1000L, 0x1100L, 0L)
    val tmp = Paths.get(dir, "000001.tmp")
    Files.write(tmp, w.bytes())
    Files.move(tmp, Paths.get(dir, "000001.log"))

    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir)
      .option("format", "pgoutput")
      .option("key_cols", "id")
      .load()
      .writeStream.format("memory").queryName("cl_pg").start()
    try {
      q.processAllAvailable()
      val rows = spark.table("cl_pg").orderBy("seq")
        .select("row_type", "key", "payload")
        .as[(String, String, Option[String])].collect().toSeq
      assert(rows == Seq(
        ("insert", "1", Some("id=1,name=spoon")),
        ("update", "1", Some("id=1,name=ladle"))))
    } finally q.stop()
  }

  test("timestamp pre-seek skips whole segments before the start time") {
    import graft.sources.{ChangelogSource, MysqlBinlog}
    import MysqlBinlog.ColType
    val dir = Files.createTempDirectory("graft-changelog-ts").toString

    def binlogSegment(name: String, ts: Long, id: String): Unit = {
      val w = new graft.sources.MysqlBinlogWriter()
      w.fde(timestamp = ts)
      w.begin("shop")
      w.tableMap(9L, "shop", "items",
        Seq(ColType.LongLong, ColType.Varchar), Seq(0, 40),
        nullable = Seq(false, true), colNames = Seq("id", "name"))
      w.writeRows(9L, Seq(Array(id, s"row$id")))
      w.xid(1L)
      val tmp = Paths.get(dir, s"$name.tmp")
      Files.write(tmp, w.bytes())
      Files.move(tmp, Paths.get(dir, s"$name.log"))
    }
    binlogSegment("000001", 100L, "1")
    binlogSegment("000002", 200L, "2")
    binlogSegment("000003", 300L, "3")

    // header read without decode
    assert(ChangelogSource.binlogStartTimestamp(
      s"$dir/000002.log") == 200L)
    // start inside segment 2's span → stream FROM segment 2: the
    // initial offset names segment 1 (exactly one segment skipped)
    assert(ChangelogSource.preSeekOffset(dir, "binlog", 250L) ==
      "000001.log")
    // before the first segment → skip nothing; after the last → only
    // the last segment streams; tab format never pre-seeks
    assert(ChangelogSource.preSeekOffset(dir, "binlog", 50L) == "")
    assert(ChangelogSource.preSeekOffset(dir, "binlog", 400L) ==
      "000002.log")
    assert(ChangelogSource.preSeekOffset(dir, "tab", 250L) == "")

    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", dir)
      .option("format", "binlog")
      .option("key_cols", "id")
      .option("start_timestamp", "250")
      .load()
      .writeStream.format("memory").queryName("cl_ts").start()
    try {
      q.processAllAvailable()
      // identical rows to a full read of segments 2..3 — segment 1
      // never decoded
      val keys = spark.table("cl_ts").orderBy("seq")
        .select("key").as[String].collect().toSeq
      assert(keys == Seq("2", "3"))
    } finally q.stop()
  }
}
