package graft

import org.apache.spark.sql.functions._

import graft.sources.{MysqlBinlog, MysqlBinlogWriter}
import graft.transport._

/** The full produce→consume loop of the live seam: a [[FakeWire]]-fed
  * MySQL replication pump publishes capture segments into a dir, and
  * the EXISTING streaming pipeline (ChangelogSource micro-batch read
  * in `format=binlog`, production decode on executors, key compaction)
  * consumes them — proving the pump's segment layout is exactly what
  * the downstream machinery streams, with no adapter in between. This
  * is the topology a deployment runs: pump thread on an edge node (or
  * the driver), Spark structured streaming over the capture dir.
  */
class PumpToPipelineSpec extends SparkSuite {
  import spark.implicits._

  private val scramble = Array.tabulate[Byte](20)(_.toByte)
  private val Types = Seq(8, 15)
  private val Meta = Seq(0, 40)

  private def packet(seq: Int, payload: Array[Byte]): Array[Byte] =
    Array[Byte]((payload.length & 0xff).toByte,
      ((payload.length >> 8) & 0xff).toByte,
      ((payload.length >> 16) & 0xff).toByte, seq.toByte) ++ payload

  private def handshakePayload: Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(10)
    out.write("8.0.36-fake".getBytes("UTF-8")); out.write(0)
    out.write(Array[Byte](7, 0, 0, 0))
    out.write(scramble.take(8)); out.write(0)
    out.write(Array[Byte](0xff.toByte, 0xff.toByte))
    out.write(45)
    out.write(Array[Byte](2, 0))
    out.write(Array[Byte](0x08, 0x00))
    out.write(21)
    out.write(new Array[Byte](10))
    out.write(scramble.drop(8)); out.write(0)
    out.write("mysql_native_password".getBytes("UTF-8")); out.write(0)
    out.toByteArray
  }

  private def eventsOf(binlog: Array[Byte]): Seq[Array[Byte]] = {
    var p = 4
    val out = Seq.newBuilder[Array[Byte]]
    while (p < binlog.length) {
      val len = (binlog(p + 9) & 0xff) | ((binlog(p + 10) & 0xff) << 8) |
        ((binlog(p + 11) & 0xff) << 16) | ((binlog(p + 12) & 0xff) << 24)
      out += binlog.slice(p, p + len)
      p += len
    }
    out.result()
  }

  test("pump-published segments stream through ChangelogSource and " +
      "compact to the source's end state") {
    // the "server": two binlog files with inserts, an update, a
    // delete across a rotate — end state: k1=a2, k3=c
    val w1 = new MysqlBinlogWriter(serverId = 1L)
    w1.fde()
    w1.begin("app")
    w1.tableMap(11L, "app", "t", Types, Meta,
      nullable = Seq(false, true), colNames = Seq("id", "v"))
    w1.writeRows(11L, Seq(Array("1", "a"), Array("2", "b")))
    w1.xid(1L)
    w1.rotate(4L, "binlog.000002")
    val w2 = new MysqlBinlogWriter(serverId = 1L)
    w2.fde()
    w2.begin("app")
    w2.tableMap(11L, "app", "t", Types, Meta,
      nullable = Seq(false, true), colNames = Seq("id", "v"))
    w2.updateRows(11L, Seq((Array("1", "a"), Array("1", "a2"))))
    w2.deleteRows(11L, Seq(Array("2", "b")))
    w2.writeRows(11L, Seq(Array("3", "c")))
    w2.xid(2L)
    val events = eventsOf(w1.bytes()) ++ eventsOf(w2.bytes())

    val wire = new FakeWire
    wire.serve(packet(0, handshakePayload))
    wire.serve(packet(2, Array[Byte](0x00, 0, 0, 2, 0, 0, 0)))
    wire.serve(packet(1, Array[Byte](0x00, 0, 0, 2, 0, 0, 0)))
    wire.serve(packet(1, Array[Byte](0x00, 0, 0, 2, 0, 0, 0)))
    events.zipWithIndex.foreach { case (e, i) =>
      wire.serve(packet(i + 1, Array[Byte](0x00) ++ e))
    }
    wire.serve(packet(events.size + 1,
      Array[Byte](0xfe.toByte, 0, 0, 2, 0)))

    val captureDir = java.nio.file.Files
      .createTempDirectory("pump-capture").toString
    val store = new FsSegmentStore(captureDir)
    val pump = new MysqlReplicationPump(
      MysqlReplicationPump.Config("repl", "pw",
        binlogFilename = "binlog.000001"), store, () => wire)
    pump.runSession()
    store.publishAll() // shutdown flush (rotate published 000001)

    // the capture dir IS the stream the existing transport reads
    assert(graft.sources.ChangelogSource.segments(captureDir) ==
      Seq("binlog.000001.log", "binlog.000002.log"))
    val q = spark.readStream
      .format("graft.sources.ChangelogSource")
      .option("path", captureDir)
      .option("format", "binlog")
      .option("key_cols", "id")
      .load()
      .writeStream.format("memory").queryName("pump_cl").start()
    try {
      q.processAllAvailable()
      val changes = spark.table("pump_cl")
      assert(changes.count() == 5) // 2 ins + upd + del + ins
      // production key compaction lands the end state
      val payloads = changes
        .select(col("seq"), col("row_type"), col("key"),
          col("payload"))
      val compacted = graft.operators.Compaction.compact(
        payloads, Seq("key"), Seq("seq"), col("row_type"))
        .filter(col(graft.operators.Compaction.ActionCol) =!=
          graft.operators.Compaction.Delete)
        .select("key", "payload")
        .as[(String, String)].collect().toMap
      assert(compacted.keySet == Set("1", "3"))
      assert(compacted("1").contains("a2"))
      assert(compacted("3").contains("c"))
    } finally q.stop()

    // and the resume position a restart would persist
    assert(pump.position._1 == "binlog.000002")
    assert(pump.position._2 > 4L)
  }
}
