package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Redis-cluster resharding: slot computation + topology-change planning
  * (reference: `dt-connector/src/extractor/redis/redis_reshard_extractor
  * .rs:29` — computes slot→node movement and replays keys to the new
  * topology).
  *
  * Slot mapping is the public Redis cluster spec: CRC16-XMODEM of the key
  * (or of the first non-empty `{hashtag}` if present) mod 16384.
  *
  * Spark shape: the per-key slot is a plain codegen-friendly column
  * (crc16 via a small static helper), the slot→node maps are tiny
  * broadcast joins, so replaying a 100 TB keyspace into a new topology is
  * scan → slot → broadcast-join → write, with no driver involvement.
  */
object RedisReshard {

  final val Slots = 16384

  /** CRC16-XMODEM (poly 0x1021, init 0), bitwise — matches the table in
    * the Redis cluster specification.
    */
  def crc16(bytes: Array[Byte]): Int = {
    var crc = 0
    var i = 0
    while (i < bytes.length) {
      crc ^= (bytes(i) & 0xff) << 8
      var b = 0
      while (b < 8) {
        crc = if ((crc & 0x8000) != 0) ((crc << 1) ^ 0x1021) & 0xffff
              else (crc << 1) & 0xffff
        b += 1
      }
      i += 1
    }
    crc
  }

  /** Hash-tag rule: only the substring between the first '{' and the
    * next '}' counts, and only if non-empty.
    */
  def hashTag(key: String): String = {
    val open = key.indexOf('{')
    if (open >= 0) {
      val close = key.indexOf('}', open + 1)
      if (close > open + 1) return key.substring(open + 1, close)
    }
    key
  }

  def slotOf(key: String): Int =
    crc16(hashTag(key).getBytes(java.nio.charset.StandardCharsets.UTF_8)) %
      Slots

  /** One slot-range assignment, the unit of cluster topology. */
  final case class SlotRange(from: Int, to: Int, node: String)

  def nodeOf(topology: Seq[SlotRange], slot: Int): Option[String] =
    topology.find(r => slot >= r.from && slot <= r.to).map(_.node)

  /** A planned migration of one contiguous slot run between two nodes. */
  final case class Move(fromSlot: Int, toSlot: Int, fromNode: String,
    toNode: String)

  /** Diff two topologies into contiguous per-(src,dst) slot-run moves —
    * the reshard plan. Slots unassigned on either side are skipped.
    */
  def plan(before: Seq[SlotRange], after: Seq[SlotRange]): Seq[Move] = {
    val moves = Seq.newBuilder[Move]
    var run: Option[Move] = None
    (0 until Slots).foreach { s =>
      val step = for {
        b <- nodeOf(before, s)
        a <- nodeOf(after, s)
        if a != b
      } yield (b, a)
      run = (run, step) match {
        case (Some(m), Some((b, a)))
            if m.fromNode == b && m.toNode == a && m.toSlot == s - 1 =>
          Some(m.copy(toSlot = s))
        case (prev, cur) =>
          prev.foreach(moves += _)
          cur.map { case (b, a) => Move(s, s, b, a) }
      }
    }
    run.foreach(moves += _)
    moves.result()
  }

  /** Per-key slot as a column (hash-tag aware). regexp_extract pulls the
    * tag; crc16 runs in a registered native-style helper via the
    * existing charFold registration path is NOT applicable (different
    * hash), so this uses a tiny Scala UDF — acceptable here because
    * resharding is a rare administrative scan, not a hot query path.
    */
  val slotUdf: org.apache.spark.sql.expressions.UserDefinedFunction =
    udf((k: String) => slotOf(k))

  def slotCol(key: Column): Column = slotUdf(key)

  /** Tag each key row with its current/target node for a topology pair:
    * broadcast the 16k-slot assignment table and join on slot.
    */
  def keyMoves(keys: DataFrame, keyCol: String, before: Seq[SlotRange],
      after: Seq[SlotRange]): DataFrame = {
    val spark = keys.sparkSession
    import spark.implicits._
    val assignment = (0 until Slots).flatMap { s =>
      for { b <- nodeOf(before, s); a <- nodeOf(after, s) }
        yield (s, b, a)
    }.toDF("slot", "from_node", "to_node")
    keys.withColumn("slot", slotCol(col(keyCol)))
      .join(broadcast(assignment), "slot")
      .withColumn("moves", col("from_node") =!= col("to_node"))
  }
}
