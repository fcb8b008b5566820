package graft

import org.apache.spark.sql.SparkSession

/** Cost-curve driver for the bench suite's ≥1 s tail — the queries
  * whose sf0.1 medians dominate the total (q92 dedup purge, q112
  * CCNet buckets, q133 n-gram novelty, q64 binlog roundtrip, q102
  * corpus report). Times each at whatever sf dir `args(0)` points at
  * (tools/gen_sf.py builds the big ones) and prints one JSON line per
  * query, so SCALE.md can record super-linearity the sf0.1 gate can't
  * see. Extra query names may follow the dir argument.
  *
  *   sbt "runMain graft.TailSweep /tmp/graft_sf10"
  */
object TailSweep {
  private val Default = Seq("q92_dedup_purge", "q112_ccnet_buckets",
    "q133_ngram_novelty", "q64_binlog_roundtrip", "q102_corpus_report")

  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = if (args.length > 1) args.drop(1).toSeq else Default
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-tail-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.autoBroadcastJoinThreshold", "64MB")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark.range(1000000).selectExpr("sum(id)").collect() // warmup
    names.foreach { name =>
      val fn = SparkEntry.queries.getOrElse(name,
        sys.error(s"unknown query $name"))
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.write.format("noop").mode("overwrite").save()
      val sec = (System.nanoTime() - t0) / 1e9
      val load1 = java.lang.management.ManagementFactory
        .getOperatingSystemMXBean.getSystemLoadAverage
      println(f"""{"sweep":"$name","sec":$sec%.1f,""" +
        f""""load1":$load1%.1f,"dir":"$dir"}""")
    }
    spark.stop()
  }
}
