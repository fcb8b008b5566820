package graft

import graft.sources.RedisScanStats
import graft.sources.RedisScanStats.{BigKey, HotKey, KeyStat}

class RedisScanStatsSpec extends SparkSuite {

  // a fake Redis: two dbs, SCAN pages of 2, per-key stats
  private def fakeConn(policy: String): Seq[String] => Seq[String] = {
    var db = -1L
    cmd => cmd match {
      case Seq("CONFIG", "GET", "maxmemory-policy") =>
        Seq("maxmemory-policy", policy)
      case Seq("INFO", "keyspace") =>
        Seq("# Keyspace\ndb0:keys=3,expires=0\ndb2:keys=1,expires=0")
      case Seq("SELECT", d) => db = d.toLong; Seq("OK")
      case Seq("SCAN", "0", "COUNT", _) if db == 0 =>
        Seq("7", "k1", "k2") // paged: cursor 7 continues
      case Seq("SCAN", "7", "COUNT", _) if db == 0 =>
        Seq("0", "k3")
      case Seq("SCAN", "0", "COUNT", _) if db == 2 =>
        Seq("0", "big")
      case Seq("OBJECT", "FREQ", k) =>
        k match {
          case "k1" => Seq("5")
          case "k2" => Seq("9")
          case "k3" => Seq("ERR no such key") // evicted mid-scan
          case _ => Seq("1")
        }
      case Seq("MEMORY", "USAGE", k) =>
        // k3 evicted between SCAN and MEMORY USAGE: nil reply
        if (k == "k3") Seq.empty
        else Seq(if (k == "big") "100000" else "64")
      case Seq("TYPE", k) =>
        Seq(if (k == "big") "hash" else "string")
      case other => fail(s"unexpected command: $other")
    }
  }

  test("hot-key mode: policy gate, cursor pages, evicted keys skipped") {
    val err = intercept[IllegalArgumentException] {
      RedisScanStats.drive(fakeConn("noeviction"), HotKey)
    }
    assert(err.getMessage.contains("allkeys-lfu"))

    val stats = RedisScanStats.drive(fakeConn("allkeys-lfu"), HotKey)
    // k3's FREQ reply is non-numeric (evicted): skipped, not crashed
    assert(stats.map(s => (s.db, s.key, s.freq)) == Seq(
      (0L, "k1", 5L), (0L, "k2", 9L), (2L, "big", 1L)))

    val report = RedisScanStats.hotKeyReport(spark, stats, k = 1)
      .collect().map(r => (r.getAs[Long]("db"), r.getAs[String]("key"),
        r.getAs[Long]("freq"))).toSet
    assert(report == Set((0L, "k2", 9L), (2L, "big", 1L)))
  }

  test("big-key mode: memory usage + type, no policy gate, " +
      "evicted-key nil skipped, schema filter honors ignored dbs") {
    val stats = RedisScanStats.drive(fakeConn("noeviction"), BigKey,
      schemaFilter = _ != 2L)
    // k3's MEMORY USAGE reply is nil (evicted mid-scan): skipped
    assert(stats.map(s => (s.db, s.key, s.dataSize, s.valueType)) ==
      Seq((0L, "k1", 64L, "string"), (0L, "k2", 64L, "string")))

    val all = RedisScanStats.drive(fakeConn("noeviction"), BigKey)
    val report = RedisScanStats.bigKeyReport(spark, all, k = 2)
    val biggest = report.filter("valueType = 'hash'").collect()
    assert(biggest.length == 1 &&
      biggest.head.getAs[Long]("data_size") == 100000L)
    // two surviving strings in db0 (k3 evicted), k=2 keeps both
    assert(report.filter("valueType = 'string'").count() == 2)
  }
}
