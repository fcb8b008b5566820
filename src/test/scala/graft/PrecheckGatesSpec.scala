package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.infra.Precheck
import graft.infra.Precheck.Constraint

/** The reference's per-engine precheck gates as pure-rule vectors
  * (mysql_prechecker.rs / pg_prechecker.rs / mongo_prechecker.rs /
  * redis_prechecker.rs).
  */
class PrecheckGatesSpec extends AnyFunSuite {

  test("version gates per engine") {
    assert(Precheck.checkVersion("mysql", "8.0.36").ok)
    assert(Precheck.checkVersion("mysql", "5.7.44-log").ok)
    assert(!Precheck.checkVersion("mysql", "10.11.6-MariaDB").ok)
    // unanchored find, mirroring the reference's Regex::is_match:
    // "10.5.1-MariaDB" matches "5\..*" as a substring and passes
    assert(Precheck.checkVersion("mysql", "10.5.1-MariaDB").ok)
    assert(Precheck.checkVersion("pg", "140011").ok)
    assert(Precheck.checkVersion("pg", "120000").ok)
    assert(!Precheck.checkVersion("pg", "110013").ok)
    assert(!Precheck.checkVersion("pg", "fourteen").ok)
    assert(Precheck.checkVersion("mongo", "6.0.13").ok)
    assert(Precheck.checkVersion("mongo", "4.4.29").ok)
    assert(!Precheck.checkVersion("mongo", "3.6.23").ok)
    assert(Precheck.checkVersion("redis", "7.2").ok)
    assert(Precheck.checkVersion("redis", "2.8").ok)
    assert(!Precheck.checkVersion("redis", "2.6").ok)
    assert(!Precheck.checkVersion("unknown", "1.0").ok)
  }

  test("mysql cdc gate needs row-image binlog, full rows, logging on") {
    val good = Map("log_bin" -> "ON", "binlog_format" -> "ROW",
      "binlog_row_image" -> "FULL")
    assert(Precheck.checkCdcConfigs("mysql", good).ok)
    val r1 = Precheck.checkCdcConfigs("mysql",
      good + ("binlog_format" -> "STATEMENT"))
    assert(!r1.ok && r1.detail.contains("binlog_format"))
    val r2 = Precheck.checkCdcConfigs("mysql",
      good + ("log_bin" -> "OFF") + ("binlog_row_image" -> "MINIMAL"))
    assert(!r2.ok && r2.detail.contains("log_bin") &&
      r2.detail.contains("binlog_row_image"))
    // target side skips regardless of configs
    assert(Precheck.checkCdcConfigs("mysql", Map.empty,
      isSource = false).ok)
  }

  test("pg cdc gate needs logical wal, senders, and a free slot") {
    val good = Map("wal_level" -> "logical", "max_wal_senders" -> "10",
      "max_replication_slots" -> "10")
    assert(Precheck.checkCdcConfigs("pg", good, usedSlots = 9).ok)
    val r1 = Precheck.checkCdcConfigs("pg",
      good + ("wal_level" -> "replica"))
    assert(!r1.ok && r1.detail.contains("wal_level"))
    val r2 = Precheck.checkCdcConfigs("pg", good, usedSlots = 10)
    assert(!r2.ok && r2.detail.contains("reached max_replication_slots"))
    val r3 = Precheck.checkCdcConfigs("pg",
      good + ("max_replication_slots" -> "0") + ("max_wal_senders" -> "0"))
    assert(!r3.ok && r3.detail.contains("max_replication_slots") &&
      r3.detail.contains("max_wal_senders"))
  }

  test("mongo cdc topology: mongos ok, replica primary ok, else fail") {
    assert(Precheck.checkMongoCdcTopology(ok = true, isMongos = true,
      "", "").ok)
    assert(Precheck.checkMongoCdcTopology(ok = true, isMongos = false,
      "host:27017", "host:27017").ok)
    val standalone = Precheck.checkMongoCdcTopology(ok = true,
      isMongos = false, "", "")
    assert(!standalone.ok && standalone.detail.contains("replicaSet"))
    val secondary = Precheck.checkMongoCdcTopology(ok = true,
      isMongos = false, "primary:27017", "secondary:27017")
    assert(!secondary.ok && secondary.detail.contains("not a master"))
    assert(!Precheck.checkMongoCdcTopology(ok = false, isMongos = false,
      "a", "a").ok)
  }

  test("resident-without-retention warns loudly; the INI default " +
      "flips retention ON for resident tasks") {
    import graft.infra.Precheck
    // gate: explicit opt-out surfaces the disk-growth warning
    assert(Precheck.checkResidentRetention(resident = true,
      captureRetention = false).detail.contains("WARN"))
    assert(Precheck.checkResidentRetention(resident = true,
      captureRetention = true).detail.isEmpty)
    assert(Precheck.checkResidentRetention(resident = false,
      captureRetention = false).detail.isEmpty)
    // defaults: resident=true implies capture_retention=true unless
    // explicitly opted out; drain-once stays audit-trail-by-default
    def src(extra: String) = graft.config.TaskConfig.fromIni(
      s"""[extractor]
         |db_type=redis
         |extract_type=cdc
         |url=redis://127.0.0.1:6379
         |$extra
         |
         |[sinker]
         |url=/tmp/x
         |""".stripMargin).source
    assert(src("resident=true").captureRetention)
    assert(!src("resident=true\ncapture_retention=false")
      .captureRetention)
    assert(!src("").captureRetention)
    assert(src("capture_retention=true").captureRetention)
  }

  test("table structs: out-of-scope FK is an error, no-key is a warning") {
    val tables = Seq(("db", "orders"), ("db", "lines"), ("db", "nolog"))
    val constraints = Seq(
      Constraint("db", "orders", "PRIMARY KEY"),
      Constraint("db", "lines", "UNIQUE"),
      Constraint("db", "lines", "FOREIGN KEY", "db", "orders"),
      Constraint("db", "lines", "FOREIGN KEY", "db", "customers"))
    val inScope = (s: String, t: String) =>
      tables.contains((s, t))
    val results = Precheck.checkTableStructs(tables, constraints, inScope)
    val err = results.find(_.item == "table_structs").get
    assert(!err.ok && err.detail.contains("db.customers") &&
      !err.detail.contains("db.orders"))
    val warn = results.find(_.item == "table_structs_warn").get
    assert(!warn.ok && warn.detail.contains("db.nolog") &&
      !warn.detail.contains("db.lines"))
    // all-clean battery returns a single ok row
    val clean = Precheck.checkTableStructs(
      Seq(("db", "orders")), Seq(Constraint("db", "orders", "PRIMARY KEY")),
      (_, _) => true)
    assert(clean == Seq(Precheck.CheckResult("table_structs", ok = true,
      "1 tables")))
  }
}
