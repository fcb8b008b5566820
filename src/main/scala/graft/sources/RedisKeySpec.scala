package graft.sources

/** Redis command key extraction — the public key-specification
  * algorithm (redis.io/docs/reference/key-specs/, surfaced by
  * `COMMAND GETKEYS`) over a curated command table. The reference
  * carries the same contract as generated metadata
  * (`/root/reference/dt-common/src/meta/redis/command/key_parser.rs`,
  * `cmd_constants.rs` — provenance note, not a translation): every
  * replicated command must yield its keys so filtering, routing, and
  * cluster slot tagging work across the whole command surface, not
  * just the handful of commands the event decoder interprets.
  *
  * Two begin-search forms: `index` (keys start at a fixed argv
  * position) and `keyword` (a literal token precedes the keys —
  * search forward from `startFrom`, or backward from `argc+startFrom`
  * when negative, e.g. MIGRATE's `KEYS` tail). Two find forms:
  * `range` (`lastKey` relative to begin when >= 0, else absolute from
  * the end; `step` between keys; `limit >= 2` caps the count at
  * `(argc-begin)/limit` — XREAD's STREAMS tail is half keys, half
  * ids) and `keynum` (a count argument at `begin+numIdx` says how
  * many keys follow from `begin+firstKey`).
  *
  * Documented divergences from the reference parser, both matching
  * redis-server's own GETKEYS behavior where the reference errors:
  * an absent optional keyword (GEORADIUS without STORE) contributes
  * no keys instead of failing the command, and MIGRATE's empty
  * placeholder key argument is dropped (only the KEYS tail names
  * keys).
  *
  * Table scope: the data-path groups a replicator meets (string,
  * bitmap, generic, hash, hll, list, set, sorted-set, stream, geo,
  * scripting, transactions) plus keyless context/admin commands the
  * stream carries (SELECT, PING, REPLCONF, MULTI/EXEC, PUBLISH,
  * FLUSH*). Container commands (XGROUP, XINFO, OBJECT) resolve as
  * `NAME-SUBCOMMAND`. Unknown commands parse to None — the caller
  * decides whether to pass through or reject.
  *
  * Scale shape: a pure per-row function over an immutable table — the
  * PSYNC sources call it map-side for slot tagging; no driver state.
  */
object RedisKeySpec {

  sealed trait Begin
  /** Keys begin at argv(`i`). */
  final case class AtIndex(i: Int) extends Begin
  /** Keys begin after the literal `kw`; search starts at `startFrom`
    * (negative = `argc+startFrom`, scanning backward).
    */
  final case class AfterKeyword(kw: String, startFrom: Int) extends Begin

  sealed trait Find
  /** Last key at `begin+lastKey` (>= 0) or `argc+lastKey` (< 0);
    * every `step`-th argument is a key; `limit >= 2` caps the key
    * count at `(argc-begin)/limit`.
    */
  final case class KeyRange(lastKey: Int, step: Int = 1,
      limit: Int = 0) extends Find
  /** argv(`begin+numIdx`) holds the key count; keys start at
    * `begin+firstKey`, every `step`-th argument.
    */
  final case class KeyNum(numIdx: Int, firstKey: Int,
      step: Int = 1) extends Find

  final case class Spec(begin: Begin, find: Find)

  /** `write` = the command mutates the keyspace (the sinker's
    * replicate-vs-skip gate for commands the decoder doesn't
    * interpret).
    */
  final case class Meta(group: String, write: Boolean,
      specs: Seq[Spec])

  final case class Parsed(name: String, group: String, write: Boolean,
      keys: Seq[String], keyIndexes: Seq[Int])

  /** Commands whose first argument is a subcommand: the table keys
    * them as `NAME-SUBCOMMAND` (only entries with key-bearing
    * subcommands are listed; the rest resolve keyless).
    */
  val ContainerCommands: Set[String] =
    Set("XGROUP", "XINFO", "OBJECT", "CONFIG", "CLIENT", "CLUSTER",
      "COMMAND", "ACL", "FUNCTION", "LATENCY", "MEMORY", "SCRIPT",
      "SLOWLOG", "PUBSUB")

  private def spec1(i: Int, find: Find) = Seq(Spec(AtIndex(i), find))
  // the four dominant shapes, named for the table's readability
  private def one(g: String, w: Boolean) =
    Meta(g, w, spec1(1, KeyRange(0)))
  private def all(g: String, w: Boolean) =
    Meta(g, w, spec1(1, KeyRange(-1)))
  private def two(g: String, w: Boolean) =
    Meta(g, w, spec1(1, KeyRange(1)))
  private def numAt(g: String, w: Boolean, begin: Int) =
    Meta(g, w, spec1(begin, KeyNum(0, 1)))
  private def at(g: String, w: Boolean, i: Int) =
    Meta(g, w, spec1(i, KeyRange(0)))
  private def keyless(g: String, w: Boolean = false) =
    Meta(g, w, Seq.empty)

  val table: Map[String, Meta] = Map(
    // strings
    "APPEND" -> one("string", true),
    "DECR" -> one("string", true),
    "DECRBY" -> one("string", true),
    "GET" -> one("string", false),
    "GETDEL" -> one("string", true),
    "GETEX" -> one("string", true),
    "GETRANGE" -> one("string", false),
    "GETSET" -> one("string", true),
    "INCR" -> one("string", true),
    "INCRBY" -> one("string", true),
    "INCRBYFLOAT" -> one("string", true),
    "LCS" -> two("string", false),
    "MGET" -> all("string", false),
    "MSET" -> Meta("string", true, spec1(1, KeyRange(-1, step = 2))),
    "MSETNX" -> Meta("string", true, spec1(1, KeyRange(-1, step = 2))),
    "PSETEX" -> one("string", true),
    "SET" -> one("string", true),
    "SETEX" -> one("string", true),
    "SETNX" -> one("string", true),
    "SETRANGE" -> one("string", true),
    "STRLEN" -> one("string", false),
    "SUBSTR" -> one("string", false),
    // bitmaps
    "BITCOUNT" -> one("bitmap", false),
    "BITFIELD" -> one("bitmap", true),
    "BITFIELD_RO" -> one("bitmap", false),
    "BITOP" -> Meta("bitmap", true,
      spec1(2, KeyRange(0)) ++ spec1(3, KeyRange(-1))),
    "BITPOS" -> one("bitmap", false),
    "GETBIT" -> one("bitmap", false),
    "SETBIT" -> one("bitmap", true),
    // keyspace
    "COPY" -> two("generic", true),
    "DEL" -> all("generic", true),
    "DUMP" -> one("generic", false),
    "EXISTS" -> all("generic", false),
    "EXPIRE" -> one("generic", true),
    "EXPIREAT" -> one("generic", true),
    "EXPIRETIME" -> one("generic", false),
    "KEYS" -> keyless("generic"),
    "MIGRATE" -> Meta("generic", true,
      spec1(3, KeyRange(0)) :+
        Spec(AfterKeyword("KEYS", -2), KeyRange(-1))),
    "MOVE" -> one("generic", true),
    "OBJECT-ENCODING" -> at("generic", false, 2),
    "OBJECT-FREQ" -> at("generic", false, 2),
    "OBJECT-IDLETIME" -> at("generic", false, 2),
    "OBJECT-REFCOUNT" -> at("generic", false, 2),
    "PERSIST" -> one("generic", true),
    "PEXPIRE" -> one("generic", true),
    "PEXPIREAT" -> one("generic", true),
    "PEXPIRETIME" -> one("generic", false),
    "PTTL" -> one("generic", false),
    "RANDOMKEY" -> keyless("generic"),
    "RENAME" -> two("generic", true),
    "RENAMENX" -> two("generic", true),
    "RESTORE" -> one("generic", true),
    "SCAN" -> keyless("generic"),
    "SORT" -> Meta("generic", true,
      spec1(1, KeyRange(0)) :+
        Spec(AfterKeyword("STORE", 1), KeyRange(0))),
    "SORT_RO" -> one("generic", false),
    "TOUCH" -> all("generic", false),
    "TTL" -> one("generic", false),
    "TYPE" -> one("generic", false),
    "UNLINK" -> all("generic", true),
    "WAIT" -> keyless("generic"),
    // hashes
    "HDEL" -> one("hash", true),
    "HEXISTS" -> one("hash", false),
    "HGET" -> one("hash", false),
    "HGETALL" -> one("hash", false),
    "HINCRBY" -> one("hash", true),
    "HINCRBYFLOAT" -> one("hash", true),
    "HKEYS" -> one("hash", false),
    "HLEN" -> one("hash", false),
    "HMGET" -> one("hash", false),
    "HMSET" -> one("hash", true),
    "HRANDFIELD" -> one("hash", false),
    "HSCAN" -> one("hash", false),
    "HSET" -> one("hash", true),
    "HSETNX" -> one("hash", true),
    "HSTRLEN" -> one("hash", false),
    "HVALS" -> one("hash", false),
    // hyperloglog
    "PFADD" -> one("hyperloglog", true),
    "PFCOUNT" -> all("hyperloglog", false),
    "PFDEBUG" -> at("hyperloglog", true, 2),
    "PFMERGE" -> all("hyperloglog", true),
    // lists
    "BLMOVE" -> two("list", true),
    "BLMPOP" -> numAt("list", true, 2),
    "BLPOP" -> Meta("list", true, spec1(1, KeyRange(-2))),
    "BRPOP" -> Meta("list", true, spec1(1, KeyRange(-2))),
    "BRPOPLPUSH" -> two("list", true),
    "LINDEX" -> one("list", false),
    "LINSERT" -> one("list", true),
    "LLEN" -> one("list", false),
    "LMOVE" -> two("list", true),
    "LMPOP" -> numAt("list", true, 1),
    "LPOP" -> one("list", true),
    "LPOS" -> one("list", false),
    "LPUSH" -> one("list", true),
    "LPUSHX" -> one("list", true),
    "LRANGE" -> one("list", false),
    "LREM" -> one("list", true),
    "LSET" -> one("list", true),
    "LTRIM" -> one("list", true),
    "RPOP" -> one("list", true),
    "RPOPLPUSH" -> two("list", true),
    "RPUSH" -> one("list", true),
    "RPUSHX" -> one("list", true),
    // sets
    "SADD" -> one("set", true),
    "SCARD" -> one("set", false),
    "SDIFF" -> all("set", false),
    "SDIFFSTORE" -> all("set", true),
    "SINTER" -> all("set", false),
    "SINTERCARD" -> numAt("set", false, 1),
    "SINTERSTORE" -> all("set", true),
    "SISMEMBER" -> one("set", false),
    "SMEMBERS" -> one("set", false),
    "SMISMEMBER" -> one("set", false),
    "SMOVE" -> two("set", true),
    "SPOP" -> one("set", true),
    "SRANDMEMBER" -> one("set", false),
    "SREM" -> one("set", true),
    "SSCAN" -> one("set", false),
    "SUNION" -> all("set", false),
    "SUNIONSTORE" -> all("set", true),
    // sorted sets
    "BZMPOP" -> numAt("sorted_set", true, 2),
    "BZPOPMAX" -> Meta("sorted_set", true, spec1(1, KeyRange(-2))),
    "BZPOPMIN" -> Meta("sorted_set", true, spec1(1, KeyRange(-2))),
    "ZADD" -> one("sorted_set", true),
    "ZCARD" -> one("sorted_set", false),
    "ZCOUNT" -> one("sorted_set", false),
    "ZDIFF" -> numAt("sorted_set", false, 1),
    "ZDIFFSTORE" -> Meta("sorted_set", true,
      spec1(1, KeyRange(0)) :+ Spec(AtIndex(2), KeyNum(0, 1))),
    "ZINCRBY" -> one("sorted_set", true),
    "ZINTER" -> numAt("sorted_set", false, 1),
    "ZINTERCARD" -> numAt("sorted_set", false, 1),
    "ZINTERSTORE" -> Meta("sorted_set", true,
      spec1(1, KeyRange(0)) :+ Spec(AtIndex(2), KeyNum(0, 1))),
    "ZLEXCOUNT" -> one("sorted_set", false),
    "ZMPOP" -> numAt("sorted_set", true, 1),
    "ZMSCORE" -> one("sorted_set", false),
    "ZPOPMAX" -> one("sorted_set", true),
    "ZPOPMIN" -> one("sorted_set", true),
    "ZRANDMEMBER" -> one("sorted_set", false),
    "ZRANGE" -> one("sorted_set", false),
    "ZRANGEBYLEX" -> one("sorted_set", false),
    "ZRANGEBYSCORE" -> one("sorted_set", false),
    "ZRANGESTORE" -> two("sorted_set", true),
    "ZRANK" -> one("sorted_set", false),
    "ZREM" -> one("sorted_set", true),
    "ZREMRANGEBYLEX" -> one("sorted_set", true),
    "ZREMRANGEBYRANK" -> one("sorted_set", true),
    "ZREMRANGEBYSCORE" -> one("sorted_set", true),
    "ZREVRANGE" -> one("sorted_set", false),
    "ZREVRANGEBYLEX" -> one("sorted_set", false),
    "ZREVRANGEBYSCORE" -> one("sorted_set", false),
    "ZREVRANK" -> one("sorted_set", false),
    "ZSCAN" -> one("sorted_set", false),
    "ZSCORE" -> one("sorted_set", false),
    "ZUNION" -> numAt("sorted_set", false, 1),
    "ZUNIONSTORE" -> Meta("sorted_set", true,
      spec1(1, KeyRange(0)) :+ Spec(AtIndex(2), KeyNum(0, 1))),
    // streams
    "XACK" -> one("stream", true),
    "XADD" -> one("stream", true),
    "XAUTOCLAIM" -> one("stream", true),
    "XCLAIM" -> one("stream", true),
    "XDEL" -> one("stream", true),
    "XGROUP-CREATE" -> at("stream", true, 2),
    "XGROUP-CREATECONSUMER" -> at("stream", true, 2),
    "XGROUP-DELCONSUMER" -> at("stream", true, 2),
    "XGROUP-DESTROY" -> at("stream", true, 2),
    "XGROUP-SETID" -> at("stream", true, 2),
    "XINFO-CONSUMERS" -> at("stream", false, 2),
    "XINFO-GROUPS" -> at("stream", false, 2),
    "XINFO-STREAM" -> at("stream", false, 2),
    "XLEN" -> one("stream", false),
    "XPENDING" -> one("stream", false),
    "XRANGE" -> one("stream", false),
    "XREAD" -> Meta("stream", false,
      Seq(Spec(AfterKeyword("STREAMS", 1), KeyRange(-1, limit = 2)))),
    "XREADGROUP" -> Meta("stream", true,
      Seq(Spec(AfterKeyword("STREAMS", 4), KeyRange(-1, limit = 2)))),
    "XREVRANGE" -> one("stream", false),
    "XSETID" -> one("stream", true),
    "XTRIM" -> one("stream", true),
    // geo
    "GEOADD" -> one("geo", true),
    "GEODIST" -> one("geo", false),
    "GEOHASH" -> one("geo", false),
    "GEOPOS" -> one("geo", false),
    "GEORADIUS" -> Meta("geo", true,
      spec1(1, KeyRange(0)) ++ Seq(
        Spec(AfterKeyword("STORE", 6), KeyRange(0)),
        Spec(AfterKeyword("STOREDIST", 6), KeyRange(0)))),
    "GEORADIUSBYMEMBER" -> Meta("geo", true,
      spec1(1, KeyRange(0)) ++ Seq(
        Spec(AfterKeyword("STORE", 5), KeyRange(0)),
        Spec(AfterKeyword("STOREDIST", 5), KeyRange(0)))),
    "GEORADIUSBYMEMBER_RO" -> one("geo", false),
    "GEORADIUS_RO" -> one("geo", false),
    "GEOSEARCH" -> one("geo", false),
    "GEOSEARCHSTORE" -> two("geo", true),
    // scripting (key args declared by the numkeys argument)
    "EVAL" -> numAt("scripting", true, 2),
    "EVALSHA" -> numAt("scripting", true, 2),
    "EVALSHA_RO" -> numAt("scripting", false, 2),
    "EVAL_RO" -> numAt("scripting", false, 2),
    "FCALL" -> numAt("scripting", true, 2),
    "FCALL_RO" -> numAt("scripting", false, 2),
    // transactions
    "DISCARD" -> keyless("transactions"),
    "EXEC" -> keyless("transactions"),
    "MULTI" -> keyless("transactions"),
    "UNWATCH" -> keyless("transactions"),
    "WATCH" -> all("transactions", false),
    // keyless context/admin commands the replication stream carries
    "AUTH" -> keyless("connection"),
    "ECHO" -> keyless("connection"),
    "HELLO" -> keyless("connection"),
    "PING" -> keyless("connection"),
    "QUIT" -> keyless("connection"),
    "RESET" -> keyless("connection"),
    "SELECT" -> keyless("connection"),
    "SWAPDB" -> keyless("connection", w = true),
    "FLUSHALL" -> keyless("server", w = true),
    "FLUSHDB" -> keyless("server", w = true),
    "REPLCONF" -> keyless("server"),
    "PUBLISH" -> keyless("pubsub"),
    "SPUBLISH" -> keyless("pubsub"),
    "SUBSCRIBE" -> keyless("pubsub"),
    "UNSUBSCRIBE" -> keyless("pubsub"))

  /** Resolve the table name for argv: container commands compose
    * `NAME-SUBCOMMAND`.
    */
  private def nameOf(argv: Seq[String]): String = {
    val head = argv.head.toUpperCase
    if (ContainerCommands(head) && argv.length > 1)
      s"$head-${argv(1).toUpperCase}"
    else head
  }

  /** Extract keys per the key-spec algorithm. None = unknown command
    * or an argv too short for a mandatory key position (an arity
    * error redis-server would reject).
    */
  def parse(argv: Seq[String]): Option[Parsed] = {
    if (argv.isEmpty) return None
    val name = nameOf(argv)
    table.get(name).flatMap { meta =>
      val argc = argv.length
      val acc = Seq.newBuilder[(String, Int)]
      var ok = true
      meta.specs.foreach { spec =>
        val begin: Int = spec.begin match {
          case AtIndex(i) => i
          case AfterKeyword(kw, startFrom) =>
            // forward from startFrom, or backward from argc+startFrom;
            // absent keyword = optional clause, contributes no keys
            val (start, step) =
              if (startFrom > 0) (startFrom, 1)
              else (argc + startFrom, -1)
            var idx = start
            var found = -1
            while (found < 0 && idx > 0 && idx < argc) {
              if (argv(idx).toUpperCase == kw) found = idx + 1
              idx += step
            }
            if (found < 0) -1 else found
        }
        if (begin >= 0) spec.find match {
          case KeyRange(lastKey, step, limit) =>
            if (begin >= argc) ok = false
            else {
              val last =
                if (lastKey >= 0) begin + lastKey else argc + lastKey
              if (last >= argc || last < begin) ok = false
              else {
                var remaining =
                  if (limit >= 2) (argc - begin) / limit else Int.MaxValue
                var i = begin
                while (i <= last && remaining > 0) {
                  acc += ((argv(i), i))
                  remaining -= 1
                  i += step
                }
              }
            }
          case KeyNum(numIdx, firstKey, step) =>
            val ni = begin + numIdx
            val n = if (ni < argc) argv(ni).toIntOption else None
            n match {
              case Some(count) if count >= 0 && (count == 0 ||
                  begin + firstKey + (count - 1) * step < argc) =>
                var i = begin + firstKey
                var left = count
                while (left > 0) {
                  acc += ((argv(i), i))
                  i += step
                  left -= 1
                }
              case _ => ok = false
            }
        }
      }
      if (!ok) None
      else {
        // MIGRATE's placeholder: an empty key argument names no key
        val found = acc.result().filter(_._1.nonEmpty)
        Some(Parsed(name, meta.group, meta.write,
          found.map(_._1), found.map(_._2)))
      }
    }
  }

  /** Just the keys; Nil for keyless and unknown commands alike. */
  def keysOf(argv: Seq[String]): Seq[String] =
    parse(argv).map(_.keys).getOrElse(Nil)
}
