package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

/** The Redis CURRENT-STATE face (`redis.state`): the live lane's
  * landed answer to "what does the keyspace hold right now", built by
  * FOLDING the decoded op stream (RDB entries + command tail) into a
  * key → state table — the landed-parquet twin of what the reference
  * sinker maintains inside a target Redis by rewriting entries and
  * forwarding commands (redis_sinker.rs:123-153,
  * entry_rewriter.rs:272-330).
  *
  * The face rides the SAME LSM layout as the mysql/pg landed tables
  * ([[graft.sinks.LandedTable]]): per-trigger work appends one
  * bounded op delta; the cadence merge folds ops into the committed
  * base through [[RedisStateOps.Merger]]. Because Redis commands are
  * OPERATIONS, not row images (HSET mutates a hash it doesn't carry,
  * INCR needs the old value), the fold is sequential PER KEY — a
  * distributed groupBy over the bounded delta op set joined against
  * the base, never a driver loop.
  *
  * State payload is one JSON object per key:
  * `{"t":<type>,"x":<expire_ms>,"e":[[field,value],...]}` — `x`
  * absent when no expiry; `e` ordered for lists, sorted by field for
  * hash/set/zset (set members carry value ""); strings are the single
  * element `["",value]`. Readable by `get_json_object`/DuckDB.
  *
  * Command coverage: full-key writers (SET incl. NX/KEEPTTL forms,
  * SETEX/PSETEX/SETNX/GETSET/MSET/MSETNX, DEL/UNLINK/GETDEL), string
  * mutators (APPEND, INCR/DECR/INCRBY/DECRBY), element writers
  * (HSET/HMSET/HSETNX/HDEL, SADD/SREM, ZADD incl. the INCR form/
  * ZREM/ZINCRBY, LPUSH/RPUSH/LPOP/RPOP/LSET), expiry (EXPIRE/PEXPIRE/
  * EXPIREAT/PEXPIREAT/PERSIST/GETEX), db scope (SELECT/FLUSHDB/
  * FLUSHALL). A command the fold cannot model (RENAME, LREM,
  * SINTERSTORE, BITOP dest, ZADD's score-conditional GT/LT/NX/XX
  * forms, ...) DROPS the keys it writes from the state face — the
  * face never lies about a key it lost track of, and the
  * `redis.commands` log face keeps the ground truth. Replay
  * semantics: op identity is (sseg, rank), so a crash-window double
  * landing dedupes exactly — non-idempotent ops (APPEND/INCR/pushes)
  * still fold exactly once.
  */
object RedisStateOps {

  /** Delta row schema for the `redis.state` LSM table. `key` is
    * `db \u0000 rkey`; `rank` orders ops within a segment (RDB
    * ordinals below 1<<40, command ops above); resets carry db scope
    * (-1 = all dbs) and an empty key.
    */
  val DeltaSchema: StructType = StructType(Seq(
    StructField("sseg", StringType),
    StructField("rank", LongType),
    StructField("key", StringType),
    StructField("db", LongType),
    StructField("op", StringType),
    StructField("value_type", StringType),
    StructField("field", StringType),
    StructField("value", StringType),
    StructField("expire_ms", LongType)))

  /** One state op. `ex` = expire ms (None = not set by this op). */
  final case class Op(key: String, op: String, vtype: String,
      field: String, value: String, ex: Option[Long])

  def stateKey(db: Long, rkey: String): String = s"$db\u0000$rkey"

  /** Command tail → state ops. Returns the (possibly switched)
    * current db and the ops this command contributes. Pure —
    * property-tested without Spark.
    */
  def commandOps(argv: Seq[String], db: Long): (Long, Seq[Op]) = {
    if (argv.isEmpty) return (db, Nil)
    val cmd = argv.head.toUpperCase
    def k(i: Int) = stateKey(db, argv(i))
    def pairs(from: Int): Seq[(String, String)] =
      argv.drop(from).grouped(2).collect {
        case Seq(a, b) => (a, b)
      }.toSeq
    cmd match {
      case "SELECT" =>
        (argv.lift(1).flatMap(_.toLongOption).getOrElse(db), Nil)
      case "SET" =>
        // SET key val [EX s|PX ms|EXAT s|PXAT ms|KEEPTTL|NX|XX|GET]
        if (argv.size < 3) (db, Nil)
        else {
          var ex: Option[Long] = None
          var nx = false
          var keepTtl = false
          var i = 3
          while (i < argv.size) {
            argv(i).toUpperCase match {
              case "EX" | "EXAT" =>
                ex = argv.lift(i + 1).flatMap(_.toLongOption)
                  .map(_ * 1000L); i += 2
              case "PX" | "PXAT" =>
                ex = argv.lift(i + 1).flatMap(_.toLongOption); i += 2
              case "NX" => nx = true; i += 1
              case "KEEPTTL" => keepTtl = true; i += 1
              case _ => i += 1 // XX/GET don't change the fold
            }
          }
          val base = if (nx) "setnx" else "set"
          // KEEPTTL preserves the key's existing expiry — a plain
          // SET clears it (redis semantics)
          (db, Seq(Op(k(1), if (keepTtl) base + "keep" else base,
            "string", "", argv(2), ex)))
        }
      case "SETNX" if argv.size >= 3 =>
        (db, Seq(Op(k(1), "setnx", "string", "", argv(2), None)))
      case "GETSET" if argv.size >= 3 =>
        (db, Seq(Op(k(1), "set", "string", "", argv(2), None)))
      case "SETEX" | "PSETEX" if argv.size >= 4 =>
        val ms = argv(2).toLongOption
          .map(v => if (cmd == "SETEX") v * 1000L else v)
        (db, Seq(Op(k(1), "set", "string", "", argv(3), ms)))
      case "APPEND" if argv.size >= 3 =>
        (db, Seq(Op(k(1), "append", "string", "", argv(2), None)))
      case "INCR" | "DECR" if argv.size >= 2 =>
        val d = if (cmd == "INCR") "1" else "-1"
        (db, Seq(Op(k(1), "incr", "string", "", d, None)))
      case "INCRBY" | "DECRBY" if argv.size >= 3 =>
        val sign = if (cmd == "DECRBY") -1L else 1L
        val d = argv(2).toLongOption.map(_ * sign)
        (db, d.map(v => Op(k(1), "incr", "string", "", v.toString,
          None)).toSeq)
      case "DEL" | "UNLINK" =>
        (db, argv.drop(1).map(r => Op(stateKey(db, r), "del", "", "",
          "", None)))
      case "EXPIRE" | "PEXPIRE" | "EXPIREAT" | "PEXPIREAT"
          if argv.size >= 3 =>
        // *AT forms land absolute epoch ms; relative forms land the
        // as-captured relative ms (documented: an expire HINT — the
        // landed face never evicts by wall clock)
        val raw = argv(2).toLongOption
        val ms = raw.map { v =>
          if (cmd.startsWith("P")) v else v * 1000L
        }
        (db, ms.map(v => Op(k(1), "expire", "", "", v.toString,
          Some(v))).toSeq)
      case "PERSIST" if argv.size >= 2 =>
        (db, Seq(Op(k(1), "persist", "", "", "", None)))
      case "HSET" | "HMSET" if argv.size >= 4 =>
        (db, pairs(2).map { case (f, v) =>
          Op(k(1), "put", "hash", f, v, None) })
      case "HSETNX" if argv.size >= 4 =>
        (db, Seq(Op(k(1), "putnx", "hash", argv(2), argv(3), None)))
      case "HDEL" if argv.size >= 3 =>
        (db, argv.drop(2).map(f => Op(k(1), "delf", "hash", f, "",
          None)))
      case "SADD" if argv.size >= 3 =>
        (db, argv.drop(2).map(m => Op(k(1), "put", "set", m, "",
          None)))
      case "SREM" if argv.size >= 3 =>
        (db, argv.drop(2).map(m => Op(k(1), "delf", "set", m, "",
          None)))
      case "ZADD" if argv.size >= 4 =>
        // parse the flag block: CH is cosmetic, INCR turns the pair
        // into a score increment, and the CONDITIONAL flags
        // (NX/XX/GT/LT) guard on the old score — folding those as
        // absolute puts could land a score the server refused, so
        // they conservatively DROP the member (absent-but-honest)
        val flags = argv.drop(2)
          .takeWhile(a => Set("NX", "XX", "GT", "LT", "CH", "INCR")
            .contains(a.toUpperCase)).map(_.toUpperCase).toSet
        val from = 2 + flags.size
        val conditional =
          flags.exists(Set("NX", "XX", "GT", "LT").contains)
        val op0 =
          if (conditional) "unsupp"
          else if (flags("INCR")) "zincr"
          else "put"
        (db, argv.drop(from).grouped(2).collect {
          case Seq(s, m) => Op(k(1), op0, "zset", m, s, None)
        }.toSeq)
      case "ZREM" if argv.size >= 3 =>
        (db, argv.drop(2).map(m => Op(k(1), "delf", "zset", m, "",
          None)))
      case "ZINCRBY" if argv.size >= 4 =>
        (db, Seq(Op(k(1), "zincr", "zset", argv(3), argv(2), None)))
      case "LPUSH" | "RPUSH" if argv.size >= 3 =>
        val o = if (cmd == "LPUSH") "lpush" else "rpush"
        (db, argv.drop(2).map(v => Op(k(1), o, "list", "", v, None)))
      case "LPOP" | "RPOP" if argv.size >= 2 =>
        val o = if (cmd == "LPOP") "lpop" else "rpop"
        val n = argv.lift(2).flatMap(_.toLongOption).getOrElse(1L)
        (db, Seq(Op(k(1), o, "list", "", n.toString, None)))
      case "LSET" if argv.size >= 4 =>
        (db, Seq(Op(k(1), "lset", "list", argv(2), argv(3), None)))
      case "MSET" | "MSETNX" if argv.size >= 3 =>
        val o = if (cmd == "MSETNX") "setnx" else "set"
        (db, pairs(1).map { case (k2, v) =>
          Op(stateKey(db, k2), o, "string", "", v, None) })
      case "GETDEL" if argv.size >= 2 =>
        (db, Seq(Op(k(1), "del", "", "", "", None)))
      case "GETEX" if argv.size >= 2 =>
        // propagated effect command: EX/PX/EXAT/PXAT set expiry,
        // PERSIST clears it, bare GETEX is a pure read
        argv.lift(2).map(_.toUpperCase) match {
          case Some("PERSIST") =>
            (db, Seq(Op(k(1), "persist", "", "", "", None)))
          case Some(u @ ("EX" | "PX" | "EXAT" | "PXAT")) =>
            val ms = argv.lift(3).flatMap(_.toLongOption)
              .map(v => if (u.startsWith("P")) v else v * 1000L)
            (db, ms.map(v => Op(k(1), "expire", "", "", v.toString,
              Some(v))).toSeq)
          case _ => (db, Nil)
        }
      case "BITOP" if argv.size >= 3 =>
        // BITOP <op> <dest> <src...>: only dest is written
        (db, Seq(Op(stateKey(db, argv(2)), "unsupp", "", "", "",
          None)))
      case "LMPOP" | "ZMPOP" if argv.size >= 3 =>
        // <numkeys> <key...> — every named key may have been popped
        val n = argv(1).toLongOption.map(_.toInt).getOrElse(0)
        (db, argv.slice(2, 2 + n).map(r =>
          Op(stateKey(db, r), "unsupp", "", "", "", None)))
      case "FLUSHDB" =>
        (db, Seq(Op("", "reset", "", "", "", None)))
      case "FLUSHALL" =>
        (db, Seq(Op("", "resetall", "", "", "", None)))
      case "MULTI" | "EXEC" | "DISCARD" | "PING" | "REPLCONF" |
          "PUBLISH" | "OBJECT" =>
        (db, Nil) // transaction/transport markers: no state effect
      case _ =>
        // a command the fold cannot model: conservatively DROP every
        // key it plausibly names (first operand + RENAME/COPY dest) —
        // absent-but-honest beats present-but-stale
        val touched = cmd match {
          case "RENAME" | "RENAMENX" | "COPY" | "SMOVE" |
              "RPOPLPUSH" | "LMOVE" =>
            argv.slice(1, 3)
          case _ => argv.slice(1, 2)
        }
        (db, touched.map(r => Op(stateKey(db, r), "unsupp", "", "",
          "", None)))
    }
  }

  // ---- state codec -------------------------------------------------

  /** Mutable fold state for one key. `n` is the last WRITER NODE
    * (cluster shard prefix of the segment that last touched the key;
    * "" on a single node) — full-resync resets are node-scoped, so a
    * shard's RDB replace never wipes the other shards' keys.
    */
  private final class St(var t: String, var x: Option[Long],
      var e: Vector[(String, String)], var n: String = "")

  /** Cluster shard prefix of a segment name ("" on a single node):
    * `<nodeId>.psync.NNNNNN.log` → nodeId; `psync.NNNNNN.log` → "".
    */
  private[operators] def nodeOf(sseg: String): String = {
    val i = sseg.indexOf(".psync.")
    if (i > 0) sseg.substring(0, i)
    else ""
  }

  private def jesc(sb: java.lang.StringBuilder, s: String): Unit = {
    sb.append('"')
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      c match {
        case '"' => sb.append("\\\"")
        case '\\' => sb.append("\\\\")
        case '\n' => sb.append("\\n")
        case '\r' => sb.append("\\r")
        case '\t' => sb.append("\\t")
        case _ if c < 0x20 => sb.append(f"\\u${c.toInt}%04x")
        case _ => sb.append(c)
      }
      i += 1
    }
    sb.append('"'): Unit
  }

  private def render(st: St): String = {
    val sb = new java.lang.StringBuilder("{\"t\":")
    jesc(sb, st.t)
    st.x.foreach(x => sb.append(",\"x\":").append(x))
    if (st.n.nonEmpty) { sb.append(",\"n\":"); jesc(sb, st.n) }
    sb.append(",\"e\":[")
    val elems =
      if (st.t == "list") st.e else st.e.sortBy(_._1)
    var first = true
    elems.foreach { case (f, v) =>
      if (!first) sb.append(',')
      first = false
      sb.append('[')
      jesc(sb, f); sb.append(',')
      jesc(sb, v); sb.append(']'): Unit
    }
    sb.append("]}")
    sb.toString
  }

  private def parse(payload: String): St = {
    val node = Json.mapper.readTree(payload)
    val x = Option(node.get("x")).map(_.asLong())
    val e = Vector.newBuilder[(String, String)]
    val arr = node.get("e")
    if (arr != null && arr.isArray) {
      val it = arr.elements()
      while (it.hasNext) {
        val p = it.next()
        e += ((p.get(0).asText(), p.get(1).asText()))
      }
    }
    new St(Option(node.get("t")).map(_.asText()).getOrElse("string"),
      x, e.result(),
      Option(node.get("n")).map(_.asText()).getOrElse(""))
  }

  /** Shared Jackson mapper (Spark ships jackson-databind). */
  private object Json {
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
  }

  // ---- the fold ------------------------------------------------------

  /** Packed-op separators: fields are escaped so the pack round-trips
    * arbitrary bytes (`\` -> `\\`, `\u0001` -> `\1`).
    */
  private def pesc(s: String): String = {
    if (s == null) return ""
    val sb = new java.lang.StringBuilder(s.length + 4)
    var i = 0
    while (i < s.length) {
      s.charAt(i) match {
        case '\\' => sb.append("\\\\")
        case '\u0001' => sb.append("\\1")
        case c => sb.append(c)
      }
      i += 1
    }
    sb.toString
  }

  private def punesc(s: String): String = {
    if (s.indexOf('\\') < 0) return s
    val sb = new java.lang.StringBuilder(s.length)
    var i = 0
    while (i < s.length) {
      val c = s.charAt(i)
      if (c == '\\' && i + 1 < s.length) {
        s.charAt(i + 1) match {
          case '\\' => sb.append('\\'); i += 2
          case '1' => sb.append('\u0001'); i += 2
          case o => sb.append(o); i += 2
        }
      } else { sb.append(c); i += 1 }
    }
    sb.toString
  }

  /** Pack one op row into the sortable string the per-key
    * collect_list aggregates: `sseg \u0001 rank(zero-padded) \u0001
    * op \u0001 vtype \u0001 field \u0001 value \u0001 ex`. Sorting
    * the packed strings == sorting by (sseg, rank) because both lead
    * and rank is fixed-width.
    */
  private[operators] val packOpF =
    (sseg: String, rank: Long, op: String, vtype: String,
        field: String, value: String, ex: java.lang.Long) => {
      val sb = new java.lang.StringBuilder()
      sb.append(pesc(sseg)).append('\u0001')
      sb.append(f"$rank%020d").append('\u0001')
      sb.append(op).append('\u0001')
      sb.append(pesc(vtype)).append('\u0001')
      sb.append(pesc(field)).append('\u0001')
      sb.append(pesc(value)).append('\u0001')
      sb.append(if (ex == null) "" else ex.toString)
      sb.toString
    }

  private def unpackOp(packed: String): (String, Long, Op) = {
    val parts = new Array[String](7)
    var start = 0
    var idx = 0
    var i = 0
    while (i < packed.length && idx < 6) {
      if (packed.charAt(i) == '\u0001') {
        parts(idx) = packed.substring(start, i)
        idx += 1
        start = i + 1
      }
      i += 1
    }
    parts(6) = packed.substring(start)
    val ex = if (parts(6).isEmpty) None else parts(6).toLongOption
    (punesc(parts(0)), parts(1).toLong,
      Op("", parts(2), punesc(parts(3)), punesc(parts(4)),
        punesc(parts(5)), ex))
  }

  /** Apply one op to a key's state. None = key absent/dead. */
  private def apply1(state: Option[St], op: Op): Option[St] = op.op match {
    case "set" =>
      Some(new St("string", op.ex, Vector(("", op.value))))
    case "setkeep" => // SET ... KEEPTTL: value replaces, expiry stays
      Some(new St("string", op.ex.orElse(state.flatMap(_.x)),
        Vector(("", op.value))))
    case "setnx" =>
      if (state.isDefined) state
      else Some(new St("string", op.ex, Vector(("", op.value))))
    case "setnxkeep" =>
      if (state.isDefined) state
      else Some(new St("string", op.ex, Vector(("", op.value))))
    case "append" =>
      val old = state.filter(_.t == "string")
        .flatMap(_.e.headOption).map(_._2).getOrElse("")
      Some(new St("string",
        state.filter(_.t == "string").flatMap(_.x),
        Vector(("", old + op.value))))
    case "incr" =>
      val old = state.filter(_.t == "string")
        .flatMap(_.e.headOption).map(_._2).getOrElse("0")
      (old.toLongOption, op.value.toLongOption) match {
        case (Some(o), Some(d)) =>
          Some(new St("string", state.flatMap(_.x),
            Vector(("", (o + d).toString))))
        case _ => None // non-numeric INCR: drop, never lie
      }
    case "putnx" =>
      val st = state.filter(_.t == op.vtype)
        .getOrElse(new St(op.vtype, None, Vector.empty))
      if (!st.e.exists(_._1 == op.field))
        st.e = st.e :+ ((op.field, op.value))
      Some(st)
    case "put" =>
      val st = state.filter(_.t == op.vtype)
        .getOrElse(new St(op.vtype, None, Vector.empty))
      if (op.vtype == "list")
        st.e = st.e :+ ((op.field, op.value))
      else
        st.e = st.e.filterNot(_._1 == op.field) :+
          ((op.field, op.value))
      op.ex.foreach(x => st.x = Some(x))
      Some(st)
    case "delf" =>
      state match {
        case Some(st) =>
          st.e = st.e.filterNot(_._1 == op.field)
          if (st.e.isEmpty) None else Some(st)
        case None => None
      }
    case "del" => None
    case "expire" =>
      state.map { st => st.x = op.ex; st }
    case "persist" =>
      state.map { st => st.x = None; st }
    case "lpush" =>
      val st = state.filter(_.t == "list")
        .getOrElse(new St("list", None, Vector.empty))
      st.e = (("", op.value)) +: st.e
      Some(st)
    case "rpush" =>
      val st = state.filter(_.t == "list")
        .getOrElse(new St("list", None, Vector.empty))
      st.e = st.e :+ (("", op.value))
      Some(st)
    case "lpop" | "rpop" =>
      state.filter(_.t == "list") match {
        case Some(st) =>
          val n = op.value.toLongOption.getOrElse(1L).toInt
          st.e = if (op.op == "lpop") st.e.drop(n) else st.e.dropRight(n)
          if (st.e.isEmpty) None else Some(st)
        case None => None
      }
    case "lset" =>
      state.filter(_.t == "list") match {
        case Some(st) =>
          op.field.toIntOption match {
            case Some(i) =>
              val idx = if (i < 0) st.e.size + i else i
              if (idx >= 0 && idx < st.e.size) {
                st.e = st.e.updated(idx, ("", op.value))
                Some(st)
              } else None
            case None => None
          }
        case None => None
      }
    case "zincr" =>
      val st = state.filter(_.t == "zset")
        .getOrElse(new St("zset", None, Vector.empty))
      val old = st.e.find(_._1 == op.field).map(_._2)
        .flatMap(_.toDoubleOption).getOrElse(0.0)
      val d = op.value.toDoubleOption.getOrElse(0.0)
      val s = old + d
      val rendered =
        if (s == s.floor && !s.isInfinite) s.toLong.toString
        else s.toString
      st.e = st.e.filterNot(_._1 == op.field) :+ ((op.field, rendered))
      Some(st)
    case _ => None // "unsupp" and anything unknown: drop the key
  }

  /** Fold one key: base payload (nullable) + packed ops (pre-sorted
    * by the collect) → new payload or null (dead key). Dedupes exact
    * (sseg, rank) replays so a crash-window double landing applies
    * every op exactly once.
    */
  private[operators] def foldKey(key: String, basePayload: String,
      packed: Seq[String], resets: ResetPoints): String = {
    val db = {
      val i = if (key == null) -1 else key.indexOf('\u0000')
      if (i <= 0) -2L
      else key.substring(0, i).toLongOption.getOrElse(-2L)
    }
    var st: Option[St] =
      Option(basePayload).filter(_.nonEmpty).map(parse)
    // the committed base predates every delta op, so ANY reset in the
    // range from the base key's own writer node kills it first
    st = st.filter(s => resets.point(s.n, db).isEmpty)
    if (packed != null) {
      // ops for ONE key from TWO cluster shards inside one merge
      // window = a slot migration caught mid-flight: segment-name
      // order across nodes is lexicographic, not temporal, so no
      // honest fold exists — drop the key (absent-but-honest; the
      // next owner write re-lands it)
      var seenNode: String = null
      var multiNode = false
      var lastId: (String, Long) = null
      packed.foreach { p =>
        val (sseg, rank, op) = unpackOp(p)
        val id = (sseg, rank)
        if (id != lastId) {
          lastId = id
          val node = nodeOf(sseg)
          if (seenNode == null) seenNode = node
          else if (seenNode != node) multiNode = true
          // an op that precedes its own node's latest reset is dead
          if (resets.keepOp(node, db, sseg, rank)) {
            st = apply1(st, op)
            st.foreach(_.n = node)
          }
        }
      }
      if (multiNode) st = None
    }
    // lists render with positional fields for a readable flat face
    st.map { s =>
      if (s.t == "list")
        s.e = s.e.zipWithIndex.map { case ((_, v), i) =>
          (f"$i%06d", v)
        }
      render(s)
    }.orNull
  }

  // ---- the merger ----------------------------------------------------

  /** Latest reset point per (writer node, db): db -1 = the node's
    * all-db resets (FLUSHALL / a full RDB), folded into every lookup.
    * NODE-scoped on purpose: in a cluster each shard's full resync
    * replaces only that shard's keys — a global reset would wipe the
    * other shards' state whenever any one shard re-dumps.
    */
  private[operators] final class ResetPoints(
      points: Map[(String, Long), (String, Long)])
      extends Serializable {
    def point(node: String, db: Long): Option[(String, Long)] = {
      val p = points.get((node, db))
      val all = points.get((node, -1L))
      (p, all) match {
        case (Some(a), Some(b)) => Some(if (ordGt(a, b)) a else b)
        case (a, b) => a.orElse(b)
      }
    }
    def keepOp(node: String, db: Long, sseg: String,
        rank: Long): Boolean =
      point(node, db).forall(p => ordGt((sseg, rank), p))
    private def ordGt(a: (String, Long), b: (String, Long)): Boolean =
      a._1 > b._1 || (a._1 == b._1 && a._2 > b._2)
  }

  /** The [[graft.sinks.LandedTable.Merger]] for `redis.state`. The
    * merge SHUFFLES (groupBy key over the bounded delta op set,
    * sort-merge full-outer against the base) — unlike the standard
    * merger there is no shuffle-free shape, because ops mutate state
    * they don't carry. It runs only on the CompactEvery cadence and
    * at finalize; the published flat face stays the cheap read.
    */
  object Merger extends graft.sinks.LandedTable.Merger {
    override def deltaSchema: StructType = DeltaSchema

    override def merge(spark: SparkSession, base: Option[DataFrame],
        deltas: DataFrame, deltaBytes: Long): DataFrame = {
      import spark.implicits._
      // reset points: one row per full RDB / FLUSH in the delta
      // range — a handful per residency, driver-bounded by nature
      val resets = new ResetPoints(
        deltas.filter(col("op").isin("reset", "resetall"))
          .select(
            when(col("op") === "resetall", lit(-1L))
              .otherwise(col("db")).as("db"),
            col("sseg"), col("rank"))
          .as[(Long, String, Long)].collect()
          .groupBy(r => (nodeOf(r._2), r._1))
          .map { case (k, rows) =>
            k -> rows.map(r => (r._2, r._3)).max
          })
      val packU = udf(packOpF)
      // the fold closure carries the (tiny, serializable) reset map —
      // reset scoping and replay dedupe both happen inside the fold,
      // with each op's provenance in hand
      val foldU = udf((key: String, p: String, ops: Seq[String]) =>
        foldKey(key, p, ops, resets))
      val opsByKey = deltas
        .filter(!col("op").isin("reset", "resetall"))
        .groupBy("key")
        .agg(sort_array(collect_list(packU(col("sseg"), col("rank"),
          col("op"), col("value_type"), col("field"), col("value"),
          col("expire_ms")))).as("ops"))
      val merged = base match {
        case None =>
          opsByKey.select(col("key"),
            foldU(col("key"), lit(null).cast(StringType), col("ops"))
              .as("payload"))
        case Some(b) =>
          b.join(opsByKey, Seq("key"), "full_outer")
            .select(col("key"),
              foldU(col("key"), col("payload"), col("ops"))
                .as("payload"))
      }
      merged.where(col("payload").isNotNull)
    }
  }
}
