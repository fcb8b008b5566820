package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.NameFilter
import graft.sinks.RedisReshard

/** Redis CLUSTER PSYNC composition — the reference's
  * redis_cluster_psync_extractor.rs: enumerate the cluster's master
  * nodes (each owning slot ranges), run one PSYNC stream per master,
  * and feed every shard's events into ONE pipeline. Re-expressed over
  * captured per-shard session bytes: each capture decodes through the
  * single-node [[RedisPsync]] decoder, every key is CRC16-slot-tagged
  * ([[RedisReshard.slotOf]], the public cluster slot rule), and the
  * shards merge into one frame.
  *
  * Ordering across shards: there is NO global replication order in a
  * Redis cluster — each master has its own stream — but a key hashes
  * to exactly one slot and a slot is owned by exactly one master, so
  * PER-KEY order is total (the owning shard's order). The composed
  * frame exposes `(node_id, repl_offset)` which downstream compaction
  * uses as the per-key order column, the same contract the reference's
  * shared queue gives its parallelizer.
  *
  * Mid-reshard captures: a key observed on a node whose slot ranges do
  * NOT cover the key's slot (topology moved underneath the capture,
  * e.g. the losing side of a MIGRATE) is flagged `owned=false` rather
  * than dropped — the composition surfaces the conflict and the
  * topology-aware consumer (e.g. [[RedisReshard.plan]]'s move table)
  * resolves which shard's events win for the moved key.
  *
  * Scale shape: decode is per-shard (one task per capture — shards are
  * independent byte streams), slot tagging is a pure per-row function,
  * and the merge is a union — no shuffle until a downstream consumer
  * compacts by key.
  */
object RedisClusterPsync {

  /** One master node and its owned slot ranges. */
  final case class Node(id: String, address: String,
      ranges: Seq[RedisReshard.SlotRange])

  /** Parse `CLUSTER NODES` output (the public format the reference's
    * RedisUtil::get_cluster_master_nodes consumes): one line per node,
    * `<id> <ip:port@cport> <flags> <master> <ping> <pong> <epoch>
    * <state> [slots…]`, keeping connected masters only. Slot tokens
    * are `N`, `N-M`, or bracketed importing/migrating markers
    * (skipped — ownership is settled, in-flight slots are not owned).
    */
  def parseClusterNodes(text: String): Seq[Node] =
    text.linesIterator.flatMap { line =>
      val f = line.trim.split("\\s+")
      if (f.length < 8) None
      else {
        val flags = f(2).split(",").toSet
        if (!flags.contains("master") || flags.contains("fail")) None
        else {
          val address = f(1).split("@")(0)
          val ranges = f.drop(8).toSeq.flatMap { tok =>
            if (tok.startsWith("[")) None // importing/migrating
            else tok.split("-") match {
              case Array(a, b) => Some(RedisReshard.SlotRange(
                a.toInt, b.toInt, f(0)))
              case Array(a) => Some(RedisReshard.SlotRange(
                a.toInt, a.toInt, f(0)))
              case _ => None
            }
          }
          Some(Node(f(0), address, ranges))
        }
      }
    }.toSeq

  /** One composed change event: shard identity + slot tag + the
    * single-node event shape + the per-shard replication offset (the
    * REPLCONF ACK position, resume point for this shard).
    */
  final case class ShardEvent(nodeId: String, address: String,
      slot: Int, owned: Boolean, db: Long, cmd: String, key: String,
      rowType: String, fields: Map[String, String], replOffset: Long)

  private def owns(node: Node, slot: Int): Boolean =
    node.ranges.exists(r => slot >= r.from && slot <= r.to)

  /** Decode every shard's capture and merge. Events keep per-shard
    * order (commands after snapshot, both in stream order); shards
    * concatenate in the caller's node order — any interleave is
    * equally valid cross-shard, per-key order comes from the owning
    * shard alone.
    */
  def compose(shards: Seq[(Node, Array[Byte])],
      filter: NameFilter = NameFilter()): Seq[ShardEvent] =
    shards.flatMap { case (node, bytes) =>
      val cap = RedisPsync.decode(bytes)
      val snapshot = cap.snapshot.map { e =>
        val slot = RedisReshard.slotOf(e.key)
        ShardEvent(node.id, node.address, slot, owns(node, slot),
          e.db, "RDB", e.key, "insert",
          Map("type" -> e.valueType, "field" -> e.field,
            "value" -> e.value) ++
            e.expireMs.map(ms => "expire_ms" -> ms.toString),
          cap.initialOffset)
      }
      val commands = cap.commands.flatMap { case (args, offset) =>
        RedisResp.toEvents(Seq(args), filter).map { ev =>
          val slot = RedisReshard.slotOf(ev.key)
          ShardEvent(node.id, node.address, slot,
            // context commands (SELECT…) carry no key: always owned
            ev.key.isEmpty || owns(node, slot),
            ev.db, ev.cmd, ev.key, ev.rowType, ev.fields, offset)
        }
      }
      snapshot ++ commands
    }

  /** The composed frame for Spark consumers: per-key compaction orders
    * by (node_id, repl_offset) — total per key since a key lives on
    * one shard.
    */
  def toDF(spark: SparkSession, shards: Seq[(Node, Array[Byte])],
      filter: NameFilter = NameFilter()): DataFrame = {
    import spark.implicits._
    compose(shards, filter).map(e => (e.nodeId, e.address, e.slot,
      e.owned, e.db, e.cmd, e.key, e.rowType,
      e.fields.toSeq.sorted.map { case (k, v) => s"$k=$v" }
        .mkString(","),
      e.replOffset))
      .toDF("node_id", "address", "slot", "owned", "db", "cmd", "key",
        "row_type", "fields", "repl_offset")
  }

  /** Per-shard resume positions after a composed batch — the
    * reference's Position::Redis { node_id, address, repl_offset }
    * list its recovery matcher consumes (matched by node id first,
    * address as fallback).
    */
  def resumePositions(events: Seq[ShardEvent])
      : Map[(String, String), Long] =
    events.groupBy(e => (e.nodeId, e.address))
      .map { case (k, es) => k -> es.map(_.replOffset).max }
}
