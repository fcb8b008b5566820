package graft

import org.apache.spark.scheduler.{SparkListener,
  SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

/** Stage-level profiler for one or more registered queries — the
  * "measure first" loop of the optimization guide without the UI
  * (headless sandbox): runs each named query twice (cold, then warm)
  * at Bench settings and prints per-stage wall/executor/CPU/GC time
  * plus input/shuffle volumes, so the dominant stage is a fact, not
  * a guess. Usage: runMain graft.Profile qNNN... [sfDir]
  */
object Profile {
  def main(args: Array[String]): Unit = {
    // a query selector is `qNNN` or a full query name — matched up to
    // the first underscore EXACTLY ('q15' must not select q150–q159,
    // and an sfDir whose basename starts with 'q' must not be eaten)
    val isSel = (a: String) => a.matches("q\\d+(_.*)?")
    val names = args.filter(isSel)
    val sfDir = args.find(!isSel(_))
      .getOrElse("/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder().master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      // Post-shuffle coalescing floor: AQE's default 1 MB
      // minPartitionSize sizes partitions by BYTES, but the state-fold
      // and codec stages are CPU-dense per byte — a 15 MB shuffle
      // coalesced to 11 tasks leaves 21 of 32 cores idle for the most
      // expensive stages. 256 KB lets parallelismFirst (default on)
      // actually reach the core count; at production shuffle volumes
      // every partition clears either floor, so the setting is inert
      // at scale. Overridable for experiments.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION", "256k"))
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    @volatile var enabled = false
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit =
        if (enabled) println(s"[job] ${j.jobId} stages=" +
          j.stageInfos.map(_.stageId).mkString(","))
      override def onStageCompleted(
          s: SparkListenerStageCompleted): Unit = if (enabled) {
        val si = s.stageInfo
        val m = si.taskMetrics
        val wall = (for {a <- si.completionTime; b <- si.submissionTime}
          yield a - b).getOrElse(-1L)
        println(f"[stage] ${si.stageId}%4d tasks=${si.numTasks}%3d " +
          f"wall=${wall}%5dms exec=${m.executorRunTime}%6dms " +
          f"cpu=${m.executorCpuTime / 1000000}%6dms " +
          f"gc=${m.jvmGCTime}%5dms " +
          f"in=${m.inputMetrics.bytesRead / 1e6}%8.1fMB " +
          f"sr=${m.shuffleReadMetrics.totalBytesRead / 1e6}%7.1fMB " +
          f"sw=${m.shuffleWriteMetrics.bytesWritten / 1e6}%7.1fMB " +
          f"spill=${m.diskBytesSpilled / 1e6}%6.1fMB  " +
          si.name.linesIterator.next().take(70))
      }
    })
    spark.range(2000000).selectExpr("sum(id)").collect()
    names.foreach { prefix =>
      SparkEntry.queries.filter { case (n, _) =>
        n == prefix || n.takeWhile(_ != '_') == prefix
      }.foreach {
        case (name, fn) =>
          // cold run un-instrumented: plans/caches warm
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          println(s"===== $name (warm run) =====")
          enabled = true
          val t0 = System.nanoTime()
          fn(spark, sfDir).write.format("noop").mode("overwrite").save()
          val sec = (System.nanoTime() - t0) / 1e9
          enabled = false
          // same between-queries pin drain as Bench (untimed)
          operators.RedisStateOps.Merger.release()
          println(f"===== $name total ${sec}%.2f s =====")
      }
    }
    spark.stop()
  }
}
