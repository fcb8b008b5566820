package graft

import org.apache.spark.sql.functions._

import graft.infra.CheckLogs
import graft.operators.Checker

/** Check-log persistence loop: miss.log/diff.log artifacts round-trip
  * through the reader into revise statements; summary.log carries the
  * per-table counts (shapes from check_log.rs / log_reader.rs).
  */
class CheckLogSpec extends SparkSuite {
  import spark.implicits._

  private def checked = {
    val src = Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "c", 30.0))
      .toDF("k", "s", "price")
    val dst = Seq((1L, "a", 10.0), (3L, "zz", 30.0), (9L, "x", 0.0))
      .toDF("k", "s", "price")
    Checker.diff(src, dst, Seq("k"), Seq("s", "price"))
  }

  test("log lines carry ids always, diff col images only for DIFF") {
    val lines = CheckLogs.toLogs(checked, "app", "t", Seq("k"),
      Seq("s", "price")).orderBy("line")
      .as[(String, String)].collect()
    assert(lines.map(_._1).toSeq == Seq("MISS", "DIFF"))
    val diffLine = lines(1)._2
    assert(diffLine ==
      """{"schema":"app","tb":"t","id_col_values":{"k":"3"},""" +
        """"diff_col_values":{"s":{"src":"c","dst":"zz"}}}""")
    val missLine = lines(0)._2
    assert(missLine ==
      """{"schema":"app","tb":"t","id_col_values":{"k":"2"}}""")
  }

  test("write/read/replay: artifacts feed the revise task") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-checklog").toString
    val logs = CheckLogs.toLogs(checked, "app", "t", Seq("k"),
      Seq("s", "price"))
    val (missLog, diffLog) = CheckLogs.write(logs, dir)
    assert(graft.infra.Fs.readLines(missLog).count(_.nonEmpty) == 1)
    assert(graft.infra.Fs.readLines(diffLog).count(_.nonEmpty) == 1)

    val replayed = CheckLogs.reviseFromLogs(
      CheckLogs.read(spark, dir), "t", Seq("k"))
      .select(element_at(col("id_col_values"), "k").as("k"),
        col("op"), col("sql"))
      .as[(String, String, String)].collect().toSet
    assert(replayed == Set(
      ("2", "insert", "INSERT INTO t VALUES (?)"),
      ("3", "update", "UPDATE t SET s=? WHERE k=3")))
  }

  test("summary.log holds task and per-table consistency counts") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-checksum").toString
    val s = CheckLogs.tableSummary(checked, "app", "t")
    val path = CheckLogs.writeSummary(s, dir)
    val lines = graft.infra.Fs.readLines(path)
    assert(lines.size == 2)
    assert(lines(0) ==
      """{"is_consistent":false,"checked_count":4,"miss_count":1,""" +
        """"diff_count":1}""")
    assert(lines(1).contains(""""orphan_count":1"""))
    assert(lines(1).contains(""""is_consistent":false"""))
  }
}
