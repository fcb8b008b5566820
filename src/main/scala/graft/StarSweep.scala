package graft

import org.apache.spark.sql.SparkSession

/** Star-chain cost-curve driver — the SCALE.md evidence runner for the
  * flagship dedup path: q149 star edges vs q35 all-pairs candidates,
  * and the q150/q151 purge chains, timed at whatever sf dir `args(0)`
  * points at (tools/gen_sf.py builds the big ones). One JSON line per
  * query so sweeps are machine-comparable across scale points:
  * run with e.g.
  * `SPARK_DRIVER_MEM=96g sbt "runMain graft.StarSweep /tmp/graft_sf30"`.
  */
object StarSweep {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-star-sweep")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"""{"sweep":"$name","rows":$n,""" +
        f""""sec":${(System.nanoTime() - t0) / 1e9}%.1f}""")
    }
    timed("docs")(Tables.documents(spark, dir).count())
    timed("q149_star_edges")(
      operators.FuzzyDedup.lshStarEdges(spark, dir).count())
    // the quadratic contrast: skip with GRAFT_SWEEP_SKIP_ALLPAIRS=1
    // when the pair count is known to exceed the time budget
    if (!sys.env.contains("GRAFT_SWEEP_SKIP_ALLPAIRS"))
      timed("q35_all_pairs")(
        operators.FuzzyDedup.minhashLsh(spark, dir).count())
    timed("q150_star_purge")(
      operators.HygieneOps.dedupPurgeScaled(spark, dir).count())
    timed("q151_verified_purge")(
      operators.HygieneOps.verifiedPurgeScaled(spark, dir).count())
    spark.stop()
  }
}
