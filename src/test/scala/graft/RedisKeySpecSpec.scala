package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.sources.RedisKeySpec

/** Vectors mirror redis-server's `COMMAND GETKEYS` answers for each
  * key-spec shape (redis.io/docs/reference/key-specs/).
  */
class RedisKeySpecSpec extends AnyFunSuite {

  private def keys(args: String*): Seq[String] =
    RedisKeySpec.keysOf(args)

  test("fixed-index range shapes") {
    assert(keys("SET", "k", "v") == Seq("k"))
    assert(keys("get", "k") == Seq("k")) // case-insensitive
    assert(keys("DEL", "a", "b", "c") == Seq("a", "b", "c"))
    assert(keys("MSET", "k1", "v1", "k2", "v2") == Seq("k1", "k2"))
    assert(keys("RENAME", "old", "new") == Seq("old", "new"))
    assert(keys("LCS", "a", "b") == Seq("a", "b"))
    // second key position, then all the rest
    assert(keys("BITOP", "AND", "dest", "s1", "s2") ==
      Seq("dest", "s1", "s2"))
  }

  test("trailing non-key arguments excluded") {
    // BLPOP's last arg is the timeout
    assert(keys("BLPOP", "a", "b", "0") == Seq("a", "b"))
    assert(keys("BZPOPMIN", "z1", "z2", "5") == Seq("z1", "z2"))
  }

  test("keynum shapes") {
    assert(keys("LMPOP", "2", "a", "b", "LEFT") == Seq("a", "b"))
    // blocking variant: timeout shifts the numkeys position
    assert(keys("BLMPOP", "0", "2", "a", "b", "LEFT") == Seq("a", "b"))
    assert(keys("ZUNIONSTORE", "dst", "2", "a", "b") ==
      Seq("dst", "a", "b"))
    assert(keys("ZDIFF", "2", "a", "b", "WITHSCORES") == Seq("a", "b"))
    assert(keys("EVAL", "return 1", "2", "k1", "k2", "arg") ==
      Seq("k1", "k2"))
    assert(keys("EVAL", "return 1", "0") == Seq.empty)
    // declared more keys than present args = arity error, not a crash
    assert(RedisKeySpec.parse(Seq("EVAL", "s", "3", "k1")) == None)
    assert(RedisKeySpec.parse(Seq("LMPOP", "x", "a")) == None)
  }

  test("keyword search, forward and backward") {
    // XREAD: keys are the first half of the STREAMS tail
    assert(keys("XREAD", "COUNT", "5", "STREAMS", "s1", "s2",
      "0", "0") == Seq("s1", "s2"))
    assert(keys("XREADGROUP", "GROUP", "g", "c", "STREAMS",
      "s1", "s2", ">", ">") == Seq("s1", "s2"))
    // optional STORE clause present vs absent
    assert(keys("GEORADIUS", "src", "15", "37", "200", "km",
      "STORE", "dst") == Seq("src", "dst"))
    assert(keys("GEORADIUS", "src", "15", "37", "200", "km") ==
      Seq("src"))
    assert(keys("GEORADIUSBYMEMBER", "src", "m", "100", "m",
      "STOREDIST", "dst") == Seq("src", "dst"))
    assert(keys("SORT", "mylist", "STORE", "dstlist") ==
      Seq("mylist", "dstlist"))
    assert(keys("SORT", "mylist", "LIMIT", "0", "5") == Seq("mylist"))
    // MIGRATE: backward search for KEYS; empty placeholder dropped
    assert(keys("MIGRATE", "h", "6379", "", "0", "5000",
      "KEYS", "a", "b", "c") == Seq("a", "b", "c"))
    assert(keys("MIGRATE", "h", "6379", "one", "0", "5000") ==
      Seq("one"))
  }

  test("container commands and keyless commands") {
    assert(keys("XGROUP", "CREATE", "stream", "grp", "$") ==
      Seq("stream"))
    assert(keys("OBJECT", "ENCODING", "k") == Seq("k"))
    assert(keys("XINFO", "STREAM", "s") == Seq("s"))
    assert(keys("PING") == Seq.empty)
    assert(keys("SELECT", "7") == Seq.empty)
    assert(keys("FLUSHALL") == Seq.empty)
    // unknown command: None, not a guess
    assert(RedisKeySpec.parse(Seq("FOOBAR", "x")) == None)
  }

  test("write/group classification for the sinker gate") {
    val set = RedisKeySpec.parse(Seq("SET", "k", "v")).get
    assert(set.write && set.group == "string")
    val get = RedisKeySpec.parse(Seq("GET", "k")).get
    assert(!get.write)
    val xg = RedisKeySpec.parse(Seq("XGROUP", "DESTROY", "s", "g")).get
    assert(xg.name == "XGROUP-DESTROY" && xg.write)
    assert(RedisKeySpec.parse(Seq("FLUSHDB")).get.write)
    // key argv indexes travel with the keys (the cmd rewriter's hook)
    assert(RedisKeySpec.parse(
      Seq("ZUNIONSTORE", "dst", "2", "a", "b")).get.keyIndexes ==
      Seq(1, 3, 4))
  }

  test("resp fallback events use key-spec keys") {
    import graft.sources.RedisResp
    val evs = RedisResp.toEvents(Seq(
      Seq("ZUNIONSTORE", "dst", "2", "a", "b"),
      Seq("EVAL", "return redis.call('set', KEYS[1], 'x')", "1", "ek"),
      Seq("XADD", "s", "*", "f", "v")))
    assert(evs.map(e => (e.cmd, e.key)) == Seq(
      ("ZUNIONSTORE", "dst"), ("EVAL", "ek"), ("XADD", "s")))
    assert(evs.head.fields("keys") == "dst,a,b")
  }
}
