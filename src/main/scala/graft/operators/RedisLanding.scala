package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Executor-side decode of a PSYNC capture segment into the two
  * landed-table shapes the Redis live lane writes (`redis.snapshot`,
  * `redis.commands`). The driver handles only the segment PATH — the
  * parse (reference format: redis_psync_extractor.rs receive_rdb /
  * receive_aof) runs inside a Spark task via the existing
  * [[graft.sources.RedisPsync]] parser, so a capture bigger than
  * driver memory decodes fine: per-task memory is bounded by the
  * pump's segment rotation (maxSegmentBytes), not by the whole
  * capture.
  *
  * Each segment is independently decodable by construction (it starts
  * with its session's +FULLRESYNC/+CONTINUE reply line), so segments
  * of one capture decode in PARALLEL when landed together — file =
  * unit of parallelism, the same discipline as WarcSource.
  */
object RedisLanding {

  /** Open a segment stream whose close is tied to task completion —
    * the iterator feeds the writer lazily, so an explicit close point
    * inside the lambda would fire before the rows drain.
    */
  private def openForTask(path: String): java.io.InputStream = {
    val in = graft.infra.Fs.open(path)
    Option(org.apache.spark.TaskContext.get()).foreach(
      _.addTaskCompletionListener[Unit](_ => in.close()))
    in
  }

  /** (snapshot rows, command rows) for one capture segment. */
  def decodeSegment(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    // one partition per segment; the lambda captures only the path.
    // Decode is STREAMING (RedisPsync.streamSnapshot/streamCommands):
    // entries pipe straight into the parquet writer, so per-task
    // memory is O(largest single value), with no dump-size ceiling.
    val seed = spark.sparkContext.parallelize(Seq(path), 1)
    val snap = seed.flatMap { p =>
      graft.sources.RedisPsync.streamSnapshot(openForTask(p))
        .map(e =>
          (e.db, e.key, e.valueType, e.field, e.value, e.expireMs))
    }.toDF("db", "key", "value_type", "field", "value", "expire_ms")
    val cmds = seed.flatMap { p =>
      graft.sources.RedisPsync.streamCommands(openForTask(p))
        .map { case (args, off) =>
          (args.head.toUpperCase, args.mkString(" "), off)
        }
    }.toDF("cmd", "argv", "repl_offset")
    (snap, cmds)
  }
}
