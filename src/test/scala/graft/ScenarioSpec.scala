package graft

import java.nio.file.Files

import graft.scenario.{FixtureSql, ScenarioRunner}

/** The dt-tests-style scenario corpus: every dir under
  * src/test/resources/scenarios is a reference-shaped scenario
  * (task_config.ini + src_prepare.sql + src_test.sql) executed by the
  * ONE data-driven runner and checked by full end-state table
  * comparison src vs dst — the reference's
  * rdb_test_runner.rs:329-349 `compare_data_for_tbs` contract, here
  * against both a naive per-event replay oracle and (when nothing is
  * filtered) the interpreted source's own end state.
  *
  * The corpus covers the canonical pk/uk permutation tables from
  * dt-tests/tests/mysql_to_mysql/cdc/basic_test/src_prepare.sql:1-60
  * (no_pk_no_uk … one_pk_multi_uk), routing, ignore_cols, do_events
  * and do_tbs filters, key-changing updates, NULL-unique-key serial
  * lanes, both dialects, and batch-size boundaries.
  */
class ScenarioSpec extends SparkSuite {

  // one test per scenario dir — a new fixture dir IS a new test
  ScenarioRunner.scenarios().foreach { dir =>
    val name = dir.getFileName.toString
    test(s"scenario: $name") {
      val r = ScenarioRunner.run(spark, dir)
      assert(r.tablesCompared > 0, s"$name compared no tables")
    }
  }

  test("the corpus covers the five reference key-shape tables") {
    val basic = ScenarioRunner.corpusRoot.resolve("mysql_cdc_basic")
    val prepare = FixtureSql.parseScript(new String(
      Files.readAllBytes(basic.resolve("src_prepare.sql")), "UTF-8"))
    val tables = prepare.collect {
      case FixtureSql.CreateTable(d) => d.tb
    }.toSet
    val canonical = Set("no_pk_no_uk", "one_pk_no_uk", "no_pk_one_uk",
      "no_pk_multi_uk", "one_pk_multi_uk")
    assert(canonical.subsetOf(tables))
  }

  test("scenario end states are non-trivial: basic leaves rows at dst " +
      "and do_events suppresses the filtered delete") {
    val basic = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_basic"))
    assert(basic.rowsAtDst > 10)

    val filtered = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_do_events"))
    val (_, got) = filtered.perTable("test_db_1.one_pk_no_uk")
    // the delete of f_0=2 was filtered out, so the row SURVIVES at dst
    assert(got.exists(_.get("f_0").contains("2")))
    assert(got.size == 3)
  }

  test("where_conditions narrows the snapshot; unlisted tables ship " +
      "in full") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_snapshot_where"))
    val (_, events) = r.perTable("test_db_1.events_tb")
    assert(events.size == 2)
    assert(events.forall(_.get("kind").contains("keep")))
    assert(r.perTable("test_db_1.plain_tb")._2.size == 2)
  }

  test("table-parallel scenario applies per-table in order and " +
      "heterogeneous mysql->pg routes through the pg dialect") {
    val tp = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_table_parallel"))
    assert(tp.perTable("test_db_1.tb_a")._2.map(_("v")).toSet ==
      Set("a1x", "a3"))
    assert(tp.perTable("test_db_1.tb_b")._2.map(_("v")).toSet ==
      Set("b1", "b3x"))

    val hp = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_to_pg_cdc"))
    // db_map landed mysql app_db under pg public
    assert(hp.perTable.keySet ==
      Set("public.orders_tb", "public.lines_tb"))
  }

  test("lua scenario: the verbatim reference script mutates, drops " +
      "columns, and filters rows through the real pipeline") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_lua"))
    val change = r.perTable("lua_test.change_column_value_test")._2
    assert(change.map(m => (m("id"), m("f_1"))).toSet ==
      Set(("1", "1000"), ("2", "1000")))
    val str = r.perTable("lua_test.change_string_column_value_test")._2
    assert(str.map(m => (m("id"), m("f_1"))).toSet ==
      Set(("1", "😀中文a"), ("2", "y")))
    val drop = r.perTable("lua_test.drop_column_test")._2
    assert(drop.forall(_("f_2") == null))
    assert(drop.map(m => (m("id"), m("f_1"))).toSet ==
      Set(("1", "keep"), ("2", "keep2")))
    val filt = r.perTable("lua_test.filter_row_test")._2
    assert(filt.map(_("id")) == Seq("2"))
  }

  test("pg_to_pg lua scenario: guarded literal rewrites and " +
      "lexicographic row filters through the pg dialect") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("pg_to_pg_lua"))
    val dflt = r.perTable("lua_test.default_table")._2
      .map(m => m("id") -> (m("cvarchar"), m("cnumeric"), m("cbool")))
      .toMap
    // the Lua guard rewrites every image of id=1, including the
    // update's — the update's cbool='false' loses to the script
    assert(dflt("1") == (("Test", "1234.56", "true")))
    assert(dflt("2") == (("two", "2.2", "false")))
    assert(r.perTable("lua_test.filter_tail_test")._2
      .map(_("id")) == Seq("2"))
  }

  test("snapshot lua scenario: the script rewrites and filters the " +
      "copied table state") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_snapshot_lua"))
    assert(r.perTable("lua_test.change_column_value_test")._2
      .map(m => (m("id"), m("f_1"))).toSet ==
      Set(("1", "1000"), ("2", "1000")))
    assert(r.perTable("lua_test.filter_row_test")._2
      .map(_("id")) == Seq("2"))
  }

  test("ddl scenario: mid-stream ALTER/TRUNCATE barriers evolve the " +
      "destination schema and the rows around them") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_ddl"))
    val ev = r.perTable("ddl_db_1.evolving")._2
    // final shape: id, extra, tag — val was dropped mid-stream, the
    // two ADD COLUMNs landed, and every surviving row conforms
    assert(ev.forall(_.keySet == Set("id", "extra", "tag")))
    assert(ev.map(m => (m("id"), m("extra"), m("tag"))).toSet ==
      Set(("1", "10", null), ("2", null, "x"),
        ("4", "40", "t4"), ("5", "50", "t5")))
    val tr = r.perTable("ddl_db_1.truncated")._2
    assert(tr.map(_("id")) == Seq("3"))
  }

  test("ddl route scenario: the ALTER lands on the ROUTED table and " +
      "post-ddl rows carry the widened shape") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("pg_cdc_ddl_route"))
    assert(r.perTable.keySet == Set("ddl_dst.widgets"))
    val w = r.perTable("ddl_dst.widgets")._2
    assert(w.map(m => (m("id"), m("name"), m("qty"))).toSet ==
      Set(("1", "anvil", "2"), ("3", "clamp", "7")))
  }

  test("mongo scenario: merged _id lanes and serial demotion drive " +
      "the real bulk-command strings to the doc store") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mongo_cdc_merge"))
    // pure insert/delete stream: compacted lanes, last image wins
    val pm = r.perTable("app.pure_merge")._2
    assert(pm.map(m => (m("_id"), m("name"), m("qty"))).toSet ==
      Set(("2", "bolt", "20"), ("3", "clamp-v2", "31"),
        ("4", "drill", "40")))
    // first update demotes the tail to the serial lane; $set updates
    // land in order
    val wu = r.perTable("app.with_updates")._2
    // id=5 walked NULL->value (diff.i), value->NULL (diff.d), and
    // value->value (diff.u) through the $v:2 rebuild
    assert(wu.map(m => (m("_id"), m("status"), m("note"))).toSet ==
      Set(("1", "active", "first"), ("2", "done", "revised"),
        ("5", "back", null)))
  }

  test("redis scenario: replace/DEL chunks round-trip the RESP wire; " +
      "NULLed fields vanish and key-changes move the hash") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_to_redis_cdc"))
    val (_, got) = r.perTable("cache_db.sessions")
    val byKey = got.map(m => m("__key") -> m).toMap
    assert(byKey.keySet ==
      Set("cache_db.sessions:1", "cache_db.sessions:4"))
    // score was NULLed: the field is GONE, not empty (DEL+HSET
    // replace, not merge)
    assert(byKey("cache_db.sessions:1") ==
      Map("__key" -> "cache_db.sessions:1", "id" -> "1",
        "user" -> "ann"))
    assert(byKey("cache_db.sessions:4") ==
      Map("__key" -> "cache_db.sessions:4", "id" -> "4",
        "user" -> "dan", "score" -> "20"))
  }

  test("regex filter scenario: r#...# admits by pattern and " +
      "ignore_tbs subtracts from the match") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_regex_filter"))
    assert(r.perTable.keySet ==
      Set("rf_db.orders_2023", "rf_db.orders_2024"))
    assert(r.perTable("rf_db.orders_2023")._2
      .map(_("id")).toSet == Set("2"))
    assert(r.perTable("rf_db.orders_2024")._2
      .map(m => (m("id"), m("v"))) == Seq(("1", "b2")))
  }

  test("gtid scenario: transactions the configured gtid_set contains " +
      "skip at the wire; the stream resumes from gno 3") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_gtid_resume"))
    val (_, got) = r.perTable("gt_db.jobs")
    // gno 1-2 (ids 1,2) skipped whole; id 3 inserted+updated, id 4
    // inserted+deleted
    assert(got == Seq(Map("id" -> "3", "state" -> "running")))
  }

  test("sql-sink scenario: the literal statement log replays to the " +
      "source end state and the reversed log undoes to the baseline") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_to_sql_cdc"))
    // runSqlSink-shaped lane: forward replay asserted vs src inside
    // the runner (and undo vs post-prepare); pin the routed end state
    val (_, got) = r.perTable("replay_db.orders")
    assert(got.map(_("id")).toSet == Set("1", "4"))
    assert(got.find(_("id") == "1").get("state") == "paid")
    assert(got.find(_("id") == "4").get("state") == null)
  }

  test("all-types scenario: every typed codec round-trips the binlog " +
      "wire into the applied end state") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_all_types"))
    val (_, got) = r.perTable("types_db.all_types")
    assert(got.map(_("id")).toSet == Set("1", "3"))
    val one = got.find(_("id") == "1").get
    assert(one("f_big") == "9223372036854775807")
    assert(one("f_dec") == "0.5") // updated, scale-canonical
    assert(one("f_dt") == "2024-06-07 08:09:10.5")
    assert(one("f_time") == "11:22:33.4")
    assert(one("f_blob") == "hex:cafe")
    assert(one("f_float") == "0.5" && one("f_double") == "-2.25")
    val three = got.find(_("id") == "3").get
    assert(three("f_small") == null) // 42 then NULLed again
    assert(three("f_date") == "2000-02-29")
  }

  test("subscription scenario: staged micro-batches serve over real " +
      "HTTP, fetch_old re-serves, and the drained state matches src") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_subscription"))
    val (_, tickets) = r.perTable("sub_db.tickets")
    assert(tickets.map(_("id")).toSet == Set("1", "4"))
    assert(tickets.find(_("id") == "1").get("state") == "closed")
    assert(tickets.find(_("id") == "4").get("state") == null)
    val (_, alerts) = r.perTable("sub_db.alerts")
    assert(alerts == Seq(Map("id" -> "1", "state" -> "resolved")))
  }

  test("pg->starrocks scenario: the flagship route — pgoutput wire " +
      "in, routed stream-load PUTs out") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("pg_to_starrocks_cdc"))
    val (_, got) = r.perTable("dw.events")
    assert(got.map(_("id")).toSet == Set("1", "4"))
    val one = got.find(_("id") == "1").get
    assert(one("kind") == "tap" && one("score") == "1.25")
    assert(got.find(_("id") == "4").get("kind") == "click")
  }

  test("starrocks scenario: sign+version rows over real loopback " +
      "stream-load PUTs resolve to the source end state") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_to_starrocks_cdc"))
    val (_, got) = r.perTable("wh_db.metrics")
    assert(got.map(_("id")).toSet == Set("1", "4", "5"))
    assert(got.find(_("id") == "1").get("val") == "0.75")
    assert(got.find(_("id") == "4").get("name") == "disk")
    assert(got.find(_("id") == "5").get("val") == null)
  }

  test("full-sync scenario: the CDC tail overwrites, deletes, and " +
      "moves snapshot-copied rows") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_full_sync"))
    val (_, got) = r.perTable("fs_db.inventory")
    assert(got.map(_("id")).toSet == Set("1", "4", "5"))
    val one = got.find(_("id") == "1").get
    assert(one("qty") == "11" && one("sku") == "golden")
    assert(got.find(_("id") == "4").get("sku") == "plum")
    assert(got.find(_("id") == "5").get("qty") == null)
  }

  test("check scenario: MISS/DIFF/ORPHAN classify, revise converges " +
      "dst onto src, and the re-check is clean") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_check_revise"))
    val (want, got) = r.perTable("chk_db.accounts")
    // runCheck already asserted classification, diff_cols, revise
    // convergence, and the clean re-check; pin the end state here
    assert(got.map(_("id")).toSet == Set("1", "2", "3", "4"))
    assert(got.find(_("id") == "1").get("balance") == "150")
    assert(got.find(_("id") == "2").get("owner") == null)
    assert(want.toSet == got.toSet)
  }

  test("kafka scenario: envelopes land on routed topics; the consumer " +
      "rebuild honors key-change updates and null images") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_to_kafka_cdc"))
    // orders routed by exact topic_map entry; audit fell through to
    // default_topic
    assert(r.perTable.keySet ==
      Set("orders_topic/feed_db.orders", "catchall_topic/feed_db.audit"))
    val (_, orders) = r.perTable("orders_topic/feed_db.orders")
    // id=1 deleted, id=2 moved to id=3 by the key-changing update,
    // id=4 inserted with NULL fields
    assert(orders.map(_("id")).toSet == Set("3", "4"))
    assert(orders.find(_("id") == "3").get("state") == "new")
    assert(orders.find(_("id") == "4").get("state") == null)
    val (_, audit) = r.perTable("catchall_topic/feed_db.audit")
    assert(audit == Seq(Map("id" -> "1", "note" -> "touched")))
  }

  test("routing scenario lands rows under the routed names only") {
    val r = ScenarioRunner.run(spark,
      ScenarioRunner.corpusRoot.resolve("mysql_cdc_route"))
    assert(r.perTable.contains("dst_db_1.dst_one_pk_no_uk"))
    assert(r.perTable.contains("dst_db_2.plain_tb"))
    assert(!r.perTable.contains("src_db_1.one_pk_no_uk"))
    val (_, routed) = r.perTable("dst_db_1.dst_one_pk_no_uk")
    // col_map renamed f_1 -> dst_f_1, and the update through the
    // rename is visible
    assert(routed.exists(m => m.get("dst_f_1").contains("11")))
    assert(routed.forall(!_.contains("f_1")))
  }
}
