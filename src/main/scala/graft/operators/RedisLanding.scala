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

  /** (snapshot rows, command rows) for one capture segment. */
  def decodeSegment(spark: SparkSession, path: String)
      : (DataFrame, DataFrame) = {
    import spark.implicits._
    // one partition per segment; the lambda captures only the path
    val seed = spark.sparkContext.parallelize(Seq(path), 1)
    val snap = seed.flatMap { p =>
      graft.sources.RedisPsync.decode(graft.infra.Fs.readAllBytes(p))
        .snapshot.map(e =>
          (e.db, e.key, e.valueType, e.field, e.value, e.expireMs))
    }.toDF("db", "key", "value_type", "field", "value", "expire_ms")
    val cmds = seed.flatMap { p =>
      graft.sources.RedisPsync.decode(graft.infra.Fs.readAllBytes(p))
        .commands.map { case (args, off) =>
          (args.head.toUpperCase, args.mkString(" "), off)
        }
    }.toDF("cmd", "argv", "repl_offset")
    (snap, cmds)
  }
}
