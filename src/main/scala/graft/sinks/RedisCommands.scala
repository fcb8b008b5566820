package graft.sinks

/** Redis entry → bounded mutation-command batches — the reference's
  * entry rewriter (/root/reference/dt-connector/src/sinker/redis/
  * entry_rewriter.rs:272-330): big structures split into chunks of at
  * most `chunkSize` members (HSET/RPUSH/SADD/ZADD), expiry re-applied
  * with PEXPIRE. Pure command synthesis — the RESP transport is a
  * per-partition side effect like every other applier here.
  */
object RedisCommands {

  sealed trait RedisValue
  final case class RString(v: String) extends RedisValue
  final case class RList(v: Seq[String]) extends RedisValue
  final case class RSet(v: Seq[String]) extends RedisValue
  final case class RHash(v: Seq[(String, String)]) extends RedisValue
  final case class RZSet(v: Seq[(Double, String)]) extends RedisValue

  final case class Entry(key: String, value: RedisValue,
      expireMs: Option[Long] = None)

  /** Rewrite one entry into ordered commands (arg-vector form). */
  def rewrite(e: Entry, chunkSize: Int = 512): Seq[Seq[String]] = {
    val base: Seq[Seq[String]] = e.value match {
      case RString(v) => Seq(Seq("SET", e.key, v))
      case RList(v) => v.grouped(chunkSize).map(c =>
        "RPUSH" +: e.key +: c).toSeq
      case RSet(v) => v.grouped(chunkSize).map(c =>
        "SADD" +: e.key +: c).toSeq
      case RHash(v) => v.grouped(chunkSize).map(c =>
        "HSET" +: e.key +: c.flatMap { case (f, x) => Seq(f, x) }).toSeq
      case RZSet(v) => v.grouped(chunkSize).map(c =>
        "ZADD" +: e.key +: c.flatMap { case (s, m) =>
          Seq(fmtScore(s), m)
        }).toSeq
    }
    base ++ e.expireMs.map(ms =>
      Seq("PEXPIRE", e.key, ms.toString)).toSeq
  }

  private def fmtScore(s: Double): String =
    if (s == s.floor && !s.isInfinite) s.toLong.toString else s.toString

  /** Delete + rewrite = idempotent full-state replace for snapshot sync. */
  def replace(e: Entry, chunkSize: Int = 512): Seq[Seq[String]] =
    Seq(Seq("DEL", e.key)) ++ rewrite(e, chunkSize)
}
