package graft.operators

import org.apache.spark.sql.functions._

/** The redis current-state fold: command → op mapping (pure),
  * per-key fold semantics, node-scoped resets, replay dedupe, and the
  * LandedTable merger end to end over a tiny frame.
  */
class RedisStateOpsSpec extends graft.SparkSuite {
  import RedisStateOps._

  private def key(db: Long, k: String) = RedisStateOps.stateKey(db, k)

  test("commandOps maps the supported command matrix") {
    def ops(argv: String*): Seq[Op] = commandOps(argv, 0L)._2
    assert(ops("SET", "k", "v") ==
      Seq(Op(key(0, "k"), "set", "string", "", "v", None)))
    assert(ops("SET", "k", "v", "PX", "1500").head.ex ==
      Some(1500L))
    assert(ops("SET", "k", "v", "NX").head.op == "setnx")
    assert(ops("SET", "k", "v", "KEEPTTL").head.op == "setkeep")
    assert(ops("SETEX", "k", "9", "v").head.ex == Some(9000L))
    assert(ops("DEL", "a", "b").map(_.op) == Seq("del", "del"))
    assert(ops("HSET", "h", "f1", "v1", "f2", "v2").map(_.field) ==
      Seq("f1", "f2"))
    assert(ops("SADD", "s", "m1", "m2")
      .map(o => (o.op, o.vtype, o.field)) ==
      Seq(("put", "set", "m1"), ("put", "set", "m2")))
    // plain ZADD puts; INCR folds as a score increment; conditional
    // flags (GT/LT/NX/XX) guard on the old score the server saw —
    // fold them as drops, never as possibly-refused absolute puts
    assert(ops("ZADD", "z", "CH", "1.5", "m").head ==
      Op(key(0, "z"), "put", "zset", "m", "1.5", None))
    assert(ops("ZADD", "z", "INCR", "2", "m").head.op == "zincr")
    assert(ops("ZADD", "z", "GT", "CH", "1.5", "m").head.op ==
      "unsupp")
    assert(ops("HSETNX", "h", "f", "v").head.op == "putnx")
    assert(ops("LPUSH", "l", "a", "b").map(_.op) ==
      Seq("lpush", "lpush"))
    assert(ops("INCRBY", "c", "7").head.value == "7")
    assert(ops("DECR", "c").head.value == "-1")
    assert(ops("FLUSHALL").head.op == "resetall")
    assert(ops("FLUSHDB").head.op == "reset")
    // SELECT switches the db for everything after it
    val (db, none) = commandOps(Seq("SELECT", "3"), 0L)
    assert(db == 3L && none.isEmpty)
    assert(commandOps(Seq("SET", "k", "v"), 3L)._2.head.key ==
      key(3, "k"))
    // an unsupported command drops the keys it names
    assert(ops("RENAME", "a", "b").map(o => (o.key, o.op)) ==
      Seq((key(0, "a"), "unsupp"), (key(0, "b"), "unsupp")))
    assert(ops("LREM", "l", "0", "x").head.op == "unsupp")
    // transport/transaction markers contribute nothing
    assert(ops("MULTI").isEmpty && ops("PING").isEmpty)
    // multi-key writers map every written key (never leave one stale)
    assert(ops("MSET", "a", "1", "b", "2").map(o => (o.key, o.op)) ==
      Seq((key(0, "a"), "set"), (key(0, "b"), "set")))
    assert(ops("MSETNX", "a", "1").head.op == "setnx")
    assert(ops("GETDEL", "k").head.op == "del")
    assert(ops("GETEX", "k").isEmpty) // bare GETEX is a pure read
    assert(ops("GETEX", "k", "PERSIST").head.op == "persist")
    assert(ops("GETEX", "k", "EX", "9").head.ex == Some(9000L))
    // BITOP writes only dest; LMPOP may pop from every named key
    assert(ops("BITOP", "AND", "dest", "s1", "s2")
      .map(o => (o.key, o.op)) == Seq((key(0, "dest"), "unsupp")))
    assert(ops("LMPOP", "2", "l1", "l2", "LEFT").map(_.key) ==
      Seq(key(0, "l1"), key(0, "l2")))
  }

  test("ops for one key from TWO cluster shards in one window drop " +
      "the key (slot migration caught mid-flight has no honest fold)") {
    val k = key(0, "moved")
    val ops = packed(
      (s"${"a" * 40}.psync.000003.log", 1L,
        Op(k, "set", "string", "", "from-a", None)),
      (s"${"b" * 40}.psync.000001.log", 1L,
        Op(k, "del", "", "", "", None)))
    assert(fold(k, null, ops) == null)
    // single-shard windows fold normally
    assert(fold(k, null, packed(
      (s"${"a" * 40}.psync.000003.log", 1L,
        Op(k, "set", "string", "", "solo", None)))).contains("solo"))
  }

  private val noResets = new ResetPoints(Map.empty)

  private def packed(ops: (String, Long, Op)*): Seq[String] =
    ops.map { case (sseg, rank, o) =>
      packOpF(sseg, rank, o.op, o.vtype, o.field, o.value,
        o.ex.map(Long.box).orNull)
    }.sorted

  private def fold(k: String, base: String,
      ops: Seq[String], resets: ResetPoints = noResets): String =
    foldKey(k, base, ops, resets)

  test("foldKey: set / del / hash / incr / append / list semantics") {
    val k = key(0, "k")
    def op(o: Op, rank: Long, sseg: String = "psync.000001.log") =
      (sseg, rank, o)
    // set then del -> dead
    assert(fold(k, null, packed(
      op(Op(k, "set", "string", "", "v", None), 1),
      op(Op(k, "del", "", "", "", None), 2))) == null)
    // base string + append
    val base = fold(k, null, packed(
      op(Op(k, "set", "string", "", "he", None), 1)))
    val appended = fold(k, base, packed(
      op(Op(k, "append", "string", "", "llo", None), 2)))
    assert(appended.contains("\"hello\""))
    // hash puts + hdel; deleting the last field kills the key
    val h = fold(k, null, packed(
      op(Op(k, "put", "hash", "f1", "a", None), 1),
      op(Op(k, "put", "hash", "f2", "b", None), 2),
      op(Op(k, "delf", "hash", "f1", "", None), 3)))
    assert(h.contains("\"f2\"") && !h.contains("\"f1\""))
    assert(fold(k, h, packed(
      op(Op(k, "delf", "hash", "f2", "", None), 9))) == null)
    // incr over base, non-numeric incr drops the key (never lies)
    val c5 = fold(k, null, packed(
      op(Op(k, "set", "string", "", "5", None), 1)))
    assert(fold(k, c5, packed(
      op(Op(k, "incr", "string", "", "3", None), 2)))
      .contains("\"8\""))
    val junk = fold(k, null, packed(
      op(Op(k, "set", "string", "", "abc", None), 1)))
    assert(fold(k, junk, packed(
      op(Op(k, "incr", "string", "", "1", None), 2))) == null)
    // list order: rpush a b, lpush z -> [z, a, b]; lpop drops z
    val l = fold(k, null, packed(
      op(Op(k, "rpush", "list", "", "a", None), 1),
      op(Op(k, "rpush", "list", "", "b", None), 2),
      op(Op(k, "lpush", "list", "", "z", None), 3)))
    assert(l.contains("[\"000000\",\"z\"]") &&
      l.contains("[\"000002\",\"b\"]"))
    val popped = fold(k, l, packed(
      op(Op(k, "lpop", "list", "", "1", None), 9)))
    assert(popped.contains("[\"000000\",\"a\"]"))
    // putnx (HSETNX): writes the field only when absent
    val hx = fold(k, null, packed(
      op(Op(k, "put", "hash", "f", "old", None), 1),
      op(Op(k, "putnx", "hash", "f", "new", None), 2),
      op(Op(k, "putnx", "hash", "g", "fresh", None), 3)))
    assert(hx.contains("[\"f\",\"old\"]") &&
      hx.contains("[\"g\",\"fresh\"]"))
    // setnx respects an existing key, creates a missing one
    assert(fold(k, c5, packed(
      op(Op(k, "setnx", "string", "", "9", None), 2)))
      .contains("\"5\""))
    assert(fold(k, null, packed(
      op(Op(k, "setnx", "string", "", "9", None), 2)))
      .contains("\"9\""))
    // unsupported op on a key drops it even over a live base
    assert(fold(k, c5, packed(
      op(Op(k, "unsupp", "", "", "", None), 2))) == null)
    // expire sets x; persist clears it
    val ex = fold(k, c5, packed(
      op(Op(k, "expire", "", "", "9000", Some(9000L)), 2)))
    assert(ex.contains("\"x\":9000"))
    assert(!fold(k, ex, packed(
      op(Op(k, "persist", "", "", "", None), 3))).contains("\"x\""))
    // SET clears an existing TTL; SET ... KEEPTTL preserves it
    val plain = fold(k, ex, packed(
      op(Op(k, "set", "string", "", "new", None), 4)))
    assert(!plain.contains("\"x\"") && plain.contains("new"))
    val kept = fold(k, ex, packed(
      op(Op(k, "setkeep", "string", "", "new", None), 4)))
    assert(kept.contains("\"x\":9000") && kept.contains("new"))
  }

  test("foldKey dedupes exact (sseg, rank) replays — non-idempotent " +
      "ops apply exactly once across a crash-window double landing") {
    val k = key(0, "c")
    val one = packOpF("psync.000002.log", 5L, "incr", "string", "",
      "3", null)
    val base = fold(k, null, packed(
      ("psync.000001.log", 1L, Op(k, "set", "string", "", "10",
        None))))
    // the same op landed twice (two deltas from a replayed pass)
    assert(fold(k, base, Seq(one, one)).contains("\"13\""))
  }

  test("resets are NODE-scoped: one shard's full resync never wipes " +
      "another shard's keys, but kills its own pre-reset state") {
    val nodeA = "a" * 40
    val nodeB = "b" * 40
    val resets = new ResetPoints(Map(
      (nodeA, -1L) -> (s"$nodeA.psync.000002.log", 0L)))
    val kA = key(0, "ka")
    val kB = key(0, "kb")
    // base keys carry their writer node in the payload
    val baseA = fold(kA, null, packed(
      (s"$nodeA.psync.000001.log", 1L,
        Op(kA, "set", "string", "", "old", None))))
    val baseB = fold(kB, null, packed(
      (s"$nodeB.psync.000001.log", 1L,
        Op(kB, "set", "string", "", "keep", None))))
    assert(baseA.contains(s""""n":"$nodeA""""))
    // A's base key dies at A's reset; B's survives untouched
    assert(fold(kA, baseA, null, resets) == null)
    assert(fold(kB, baseB, null, resets).contains("keep"))
    // A's op BEFORE its reset is dead; after it, alive
    assert(fold(kA, null, packed(
      (s"$nodeA.psync.000001.log", 9L,
        Op(kA, "set", "string", "", "pre", None))), resets) == null)
    assert(fold(kA, null, packed(
      (s"$nodeA.psync.000002.log", 1L,
        Op(kA, "set", "string", "", "post", None))), resets)
      .contains("post"))
  }

  test("the merger folds a delta frame over a base frame with resets " +
      "and replay dedupe (the LandedTable contract end to end)") {
    val s = spark
    import s.implicits._
    val base = Seq(
      (key(0, "stays"), """{"t":"string","e":[["","b0"]]}"""),
      (key(0, "dies"), """{"t":"string","e":[["","b1"]]}"""),
      (key(0, "hash"), """{"t":"hash","e":[["f0","x"]]}"""))
      .toDF("key", "payload")
    val deltas = Seq(
      // (sseg, rank, key, db, op, value_type, field, value, ex)
      ("psync.000002.log", 1L, key(0, "dies"), 0L, "del", "", "", "",
        Option.empty[Long]),
      ("psync.000002.log", 2L, key(0, "hash"), 0L, "put", "hash",
        "f1", "y", Option.empty[Long]),
      ("psync.000002.log", 3L, key(0, "fresh"), 0L, "set", "string",
        "", "new", Option.empty[Long]))
      .toDF("sseg", "rank", "key", "db", "op", "value_type", "field",
        "value", "expire_ms")
    val out = RedisStateOps.Merger
      .merge(spark, Some(base), deltas, 0L)
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    assert(out.keySet ==
      Set(key(0, "stays"), key(0, "hash"), key(0, "fresh")))
    assert(out(key(0, "stays")).contains("b0"))
    assert(out(key(0, "hash")).contains("\"f0\"") &&
      out(key(0, "hash")).contains("\"f1\""))
    assert(out(key(0, "fresh")).contains("new"))
  }
}
