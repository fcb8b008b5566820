package graft

import org.apache.spark.sql.SparkSession

import graft.config.{TaskConfig, TaskRunner}

/** CLI entry — the reference's dt-main
  * (/root/reference/dt-main/src/main.rs:34-68): precheck the task config,
  * then run it. Usage: runMain graft.Main <task_config.ini> [--precheck]
  */
object Main {
  def main(args: Array[String]): Unit = {
    require(args.nonEmpty, "usage: graft.Main <task_config.ini> [--precheck]")
    val configText = java.nio.file.Files.readString(
      java.nio.file.Paths.get(args(0)))
    val task = TaskConfig.fromIni(configText)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-task")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val checks = TaskRunner.precheck(spark, task)
      checks.foreach(c =>
        println(s"[precheck] ${c.item} ${if (c.ok) "OK" else "FAIL"} ${c.detail}"))
      if (args.contains("--precheck")) return
      require(checks.filter(_.item == "source_readable").forall(_.ok),
        "precheck failed: source not readable")
      task.extractType match {
        case TaskConfig.SnapshotExtract =>
          val results = TaskRunner.runSnapshot(spark, task)
          results.foreach(r =>
            println(s"[snapshot] ${r.schema}.${r.tb} -> ${r.dstTable} " +
              s"rows=${r.rows}"))
        case TaskConfig.CheckExtract =>
          val results = TaskRunner.runCheck(spark, task)
          results.foreach { case (tb, counts) =>
            println(s"[check] $tb ${counts.map { case (k, v) =>
              s"$k=$v" }.mkString(" ")}")
          }
        case TaskConfig.CurationExtract =>
          val s = TaskRunner.runCuration(spark, task)
          println(s"[curation] docs=${s.nDocs} kept=${s.nKept} " +
            s.reasons.toSeq.sortBy(_._1).map { case (k, v) =>
              s"$k=$v" }.mkString(" "))
        case TaskConfig.CdcExtract =>
          println("[cdc] wire streaming/CdcPipeline with a stream source" +
            " directory; see CdcPipeline.readChanges")
      }
      println("task finished")
    } finally spark.stop()
  }
}
