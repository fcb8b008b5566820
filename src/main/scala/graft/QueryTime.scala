package graft

import org.apache.spark.sql.SparkSession

/** Ad-hoc single-query timing at Bench settings (local[32], noop
  * sink, 3 runs) — the fast iteration loop for a new query's cost
  * before it joins the full bench: `runMain graft.QueryTime qNNN...
  * [sfDir]`. Bench itself stays the round's record; this prints the
  * same [min, median, max] triple per named query.
  */
object QueryTime {
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
    spark.range(2000000).selectExpr("sum(id)").collect()
    names.foreach { prefix =>
      SparkEntry.queries.filter { case (n, _) =>
        n == prefix || n.takeWhile(_ != '_') == prefix
      }.foreach {
        case (name, fn) =>
          val times = (1 to 3).map { _ =>
            val t0 = System.nanoTime()
            fn(spark, sfDir).write.format("noop")
              .mode("overwrite").save()
            (System.nanoTime() - t0) / 1e9
          }.sorted
          // same between-queries pin drain as Bench (untimed)
          operators.RedisStateOps.Merger.release()
          println(f"[qtime] $name: min=${times(0)}%.2f " +
            f"median=${times(1)}%.2f max=${times(2)}%.2f s")
      }
    }
    spark.stop()
  }
}
