package graft.scenario

import java.nio.file.Files

import scala.util.Random

import graft.SparkSuite

/** Property coverage for the scenario pipeline: RANDOM (but
  * constraint-valid) fixture scripts over randomly-shaped tables run
  * through the full runner, whose internal three-way compare
  * (pipeline-applied dst vs naive per-event replay vs interpreted
  * source end state) must agree on every trial. The generator
  * maintains pk/uk uniqueness exactly as a live MySQL would enforce
  * it, so the synthesized binlog is always one a real source could
  * have produced — key-changing updates, NULL unique keys (serial
  * lane), multi-row updates/deletes, and batch-boundary effects all
  * arise naturally from the randomness.
  */
class ScenarioPropertySpec extends SparkSuite {

  private val Trials = 12

  /** One random scenario: table shape + valid statement script. */
  private def genScenario(rnd: Random): (String, String, String) = {
    val nCols = 3 + rnd.nextInt(3)
    val cols = (0 until nCols).map(i => s"c_$i")
    // key shape: pk on c_0 | uk on (c_1, c_2) | keyless
    val keyShape = rnd.nextInt(3)
    val keyDdl = keyShape match {
      case 0 => ", PRIMARY KEY (c_0)"
      case 1 => ", UNIQUE KEY uk (c_1, c_2)"
      case _ => ""
    }
    val prepare =
      s"""CREATE DATABASE prop_db;
         |CREATE TABLE prop_db.t (${cols.map(c => s"$c varchar(16)")
          .mkString(", ")}$keyDdl);
         |""".stripMargin

    // live mirror of the source state, enforcing key uniqueness the
    // way the engine would
    var rows = Vector.empty[Map[String, String]]
    def keyOf(r: Map[String, String]): Option[Seq[String]] =
      keyShape match {
        case 0 => Option(r("c_0")).map(Seq(_))
        case 1 =>
          val k = Seq(r.get("c_1").orNull, r.get("c_2").orNull)
          if (k.contains(null)) None else Some(k) // NULLs never clash
        case _ => None
      }
    def conflicts(r: Map[String, String],
        ignoreIdx: Int = -1): Boolean =
      keyOf(r).exists(k => rows.zipWithIndex.exists { case (o, i) =>
        i != ignoreIdx && keyOf(o).contains(k)
      })
    def lit(v: String): String =
      if (v == null) "NULL" else s"'$v'"
    def randVal(): String =
      if (rnd.nextInt(5) == 0) null else rnd.nextInt(8).toString

    val stmts = Seq.newBuilder[String]
    val nStmts = 8 + rnd.nextInt(10)
    (0 until nStmts).foreach { _ =>
      rnd.nextInt(3) match {
        case 0 => // INSERT (retry until key-valid)
          val fresh = Iterator.continually(
            cols.map(c => c -> randVal()).toMap)
            .take(20).find(r => !conflicts(r))
          fresh.foreach { r =>
            rows :+= r
            stmts += s"INSERT INTO prop_db.t VALUES (" +
              cols.map(c => lit(r(c))).mkString(",") + ");"
          }
        case 1 if rows.nonEmpty => // UPDATE by predicate on one col
          val whereCol = cols(rnd.nextInt(cols.size))
          val whereVal = randVal()
          val setCol = cols(rnd.nextInt(cols.size)) // may be a key col
          val setVal = randVal()
          if (whereVal != null) {
            val matches = rows.zipWithIndex
              .filter(_._1(whereCol) == whereVal)
            val wouldClash = matches.exists { case (r, i) =>
              conflicts(r + (setCol -> setVal), ignoreIdx = i)
            }
            // two matched rows updated to the SAME key also clash
            val innerClash = matches.size > 1 && {
              val after = matches.map(_._1 + (setCol -> setVal))
              val keys = after.flatMap(keyOf)
              keys.distinct.size != keys.size
            }
            if (matches.nonEmpty && !wouldClash && !innerClash) {
              rows = rows.map(r =>
                if (r(whereCol) == whereVal) r + (setCol -> setVal)
                else r)
              stmts += s"UPDATE prop_db.t SET $setCol = " +
                s"${lit(setVal)} WHERE $whereCol = ${lit(whereVal)};"
            }
          }
        case _ if rows.nonEmpty => // DELETE by predicate
          val whereCol = cols(rnd.nextInt(cols.size))
          val whereVal = randVal()
          if (whereVal != null &&
            rows.exists(_(whereCol) == whereVal)) {
            rows = rows.filterNot(_(whereCol) == whereVal)
            stmts += s"DELETE FROM prop_db.t WHERE $whereCol = " +
              s"${lit(whereVal)};"
          }
        case _ => ()
      }
    }

    val ini =
      s"""[extractor]
         |db_type=mysql
         |extract_type=cdc
         |url=fixture://src
         |
         |[filter]
         |do_tbs=prop_db.*
         |
         |[sinker]
         |db_type=${if (rnd.nextBoolean()) "mysql" else "pg"}
         |batch_size=${1 + rnd.nextInt(4)}
         |url=fixture://dst
         |""".stripMargin
    (ini, prepare, stmts.result().mkString("\n"))
  }

  /** Random DML+DDL interleavings: the segmented barrier pipeline and
    * the evolving naive replay are two INDEPENDENT implementations of
    * the same semantics (ScenarioRunner.run's ddl branch vs
    * naiveReplayEvolving), and the interpreted source is a third —
    * all three must agree on the end state through random ADD/DROP
    * COLUMN and TRUNCATE barriers.
    */
  private def genDdlScenario(rnd: Random,
      wireSink: Option[String] = None): (String, String, String) = {
    var cols = Vector("c_0", "c_1", "c_2")
    var nextCol = 3
    var rows = Vector.empty[Map[String, String]]
    def lit(v: String): String = if (v == null) "NULL" else s"'$v'"
    def randVal(): String =
      if (rnd.nextInt(5) == 0) null else rnd.nextInt(8).toString
    val stmts = Seq.newBuilder[String]
    val nStmts = 10 + rnd.nextInt(12)
    (0 until nStmts).foreach { _ =>
      rnd.nextInt(8) match {
        case 0 | 1 | 2 => // INSERT, pk-valid on c_0
          val fresh = Iterator.continually(
            cols.map(c => c -> randVal()).toMap)
            .take(20).find(r => r("c_0") != null &&
              !rows.exists(_("c_0") == r("c_0")))
          fresh.foreach { r =>
            rows :+= r
            stmts += s"INSERT INTO prop_db.t VALUES (" +
              cols.map(c => lit(r(c))).mkString(",") + ");"
          }
        case 3 | 4 if rows.nonEmpty => // UPDATE (may move the pk)
          val whereCol = cols(rnd.nextInt(cols.size))
          val whereVal = randVal()
          val setCol = cols(rnd.nextInt(cols.size))
          val setVal = randVal()
          if (whereVal != null) {
            val hit = (r: Map[String, String]) => r(whereCol) == whereVal
            val matches = rows.filter(hit)
            val pkSafe = setCol != "c_0" ||
              (setVal != null && matches.size <= 1 &&
                !rows.exists(r => !hit(r) && r("c_0") == setVal))
            if (matches.nonEmpty && pkSafe) {
              rows = rows.map(r => if (hit(r)) r + (setCol -> setVal)
                else r)
              stmts += s"UPDATE prop_db.t SET $setCol = " +
                s"${lit(setVal)} WHERE $whereCol = ${lit(whereVal)};"
            }
          }
        case 5 if rows.nonEmpty => // DELETE by predicate
          val whereCol = cols(rnd.nextInt(cols.size))
          val whereVal = randVal()
          if (whereVal != null && rows.exists(_(whereCol) == whereVal)) {
            rows = rows.filterNot(_(whereCol) == whereVal)
            stmts += s"DELETE FROM prop_db.t WHERE $whereCol = " +
              s"${lit(whereVal)};"
          }
        case 6 if wireSink.nonEmpty => () // wire lanes carry no DDL
        case 7 if wireSink.nonEmpty => ()
        case 6 => // DDL barrier: widen, or narrow a non-key column
          if (rnd.nextBoolean() || cols.size <= 2) {
            val c = s"c_$nextCol"; nextCol += 1
            cols :+= c
            rows = rows.map(_ + (c -> (null: String)))
            stmts += s"ALTER TABLE prop_db.t ADD COLUMN $c varchar(16);"
          } else {
            val c = cols.drop(1)(rnd.nextInt(cols.size - 1))
            cols = cols.filterNot(_ == c)
            rows = rows.map(_ - c)
            stmts += s"ALTER TABLE prop_db.t DROP COLUMN $c;"
          }
        case 7 if rnd.nextInt(3) == 0 => // occasional TRUNCATE barrier
          rows = Vector.empty
          stmts += "TRUNCATE TABLE prop_db.t;"
        case _ => ()
      }
    }
    val ini = wireSink match {
      case None =>
        s"""[extractor]
           |db_type=mysql
           |extract_type=cdc
           |url=fixture://src
           |
           |[filter]
           |do_tbs=prop_db.*
           |do_ddls=*
           |
           |[sinker]
           |db_type=${if (rnd.nextBoolean()) "mysql" else "pg"}
           |batch_size=${1 + rnd.nextInt(4)}
           |url=fixture://dst
           |""".stripMargin
      case Some("http_server") =>
        s"""[extractor]
           |db_type=mysql
           |extract_type=cdc
           |url=fixture://src
           |
           |[filter]
           |do_tbs=prop_db.*
           |do_events=insert,update,delete
           |
           |[sinker]
           |batch_size=${1 + rnd.nextInt(4)}
           |url=fixture://dst
           |
           |[pipeline]
           |pipeline_type=http_server
           |buffer_size=${1 + rnd.nextInt(4)}
           |""".stripMargin
      case Some(s) =>
        s"""[extractor]
           |db_type=mysql
           |extract_type=cdc
           |url=fixture://src
           |
           |[filter]
           |do_tbs=prop_db.*
           |do_events=insert,update,delete
           |
           |[router]
           |default_topic=prop_topic
           |
           |[sinker]
           |db_type=$s
           |batch_size=${1 + rnd.nextInt(4)}
           |url=fixture://dst
           |""".stripMargin
    }
    val prepare =
      """CREATE DATABASE prop_db;
        |CREATE TABLE prop_db.t (c_0 varchar(16), c_1 varchar(16),
        |  c_2 varchar(16), PRIMARY KEY (c_0));
        |""".stripMargin
    (ini, prepare, stmts.result().mkString("\n"))
  }

  test(s"random DML+DDL scripts: segmented pipeline == evolving " +
      s"replay == source end state over $Trials trials") {
    val rnd = new Random(0xD1CEB0A7)
    (1 to Trials).foreach { trial =>
      val (ini, prepare, test) = genDdlScenario(rnd)
      val dir = Files.createTempDirectory(s"graft-propddl-$trial")
      Files.writeString(dir.resolve("task_config.ini"), ini)
      Files.writeString(dir.resolve("src_prepare.sql"), prepare)
      Files.writeString(dir.resolve("src_test.sql"), test)
      try ScenarioRunner.run(spark, dir) // asserts the 3-way compare
      catch {
        case e: Throwable =>
          fail(s"trial $trial failed (script:\n$test\n): " +
            e.getMessage)
      }
    }
  }

  /** Random TYPED tables for the binlog wire-codec fuzz: a pk plus
    * 3-5 columns drawn from the full supported type pool, values
    * valid-and-canonical for each type (fraction seconds without
    * trailing zeros, binary-exact floats, canonical decimals), NULLs
    * mixed in. The wire lane asserts decoded ≡ synthesized per event,
    * so every trial fuzzes mysqlColSpec + the typed codecs end to end.
    */
  private def genTypedScenario(rnd: Random): (String, String, String) = {
    val pool = Vector("tinyint", "smallint", "mediumint", "int",
      "bigint", "decimal(10,4)", "float", "double", "date", "time(3)",
      "datetime(6)", "year", "varchar(32)", "char(8)", "blob")
    val exactFloats =
      Vector("0.5", "-2.75", "1024.125", "3", "-0.0625", "7.25")
    val nCols = 3 + rnd.nextInt(3)
    val colTypes = (0 until nCols)
      .map(i => s"c_$i" -> pool(rnd.nextInt(pool.size)))
    def fracDigits(max: Int): String = {
      val n = 1 + rnd.nextInt(max)
      val body = (0 until n - 1).map(_ => rnd.nextInt(10)).mkString
      body + (1 + rnd.nextInt(9)) // last digit nonzero (trim-stable)
    }
    def randValue(t: String): String = t match {
      case "tinyint" => (rnd.nextInt(256) - 128).toString
      case "smallint" => (rnd.nextInt(65536) - 32768).toString
      case "mediumint" => (rnd.nextInt(1 << 24) - (1 << 23)).toString
      case "int" => rnd.nextInt().toString
      case "bigint" => rnd.nextLong().toString
      case "decimal(10,4)" =>
        val v = new java.math.BigDecimal(
          java.math.BigInteger.valueOf(
            rnd.nextLong() % 1000000000L), 4)
        v.stripTrailingZeros.toPlainString
      case "float" | "double" =>
        exactFloats(rnd.nextInt(exactFloats.size))
      case "date" =>
        f"${2000 + rnd.nextInt(30)}%04d-${1 + rnd.nextInt(12)}%02d-" +
          f"${1 + rnd.nextInt(28)}%02d"
      case "time(3)" =>
        val base = f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:" +
          f"${rnd.nextInt(60)}%02d"
        if (rnd.nextBoolean()) base else s"$base.${fracDigits(3)}"
      case "datetime(6)" =>
        val base = f"${2000 + rnd.nextInt(30)}%04d-" +
          f"${1 + rnd.nextInt(12)}%02d-${1 + rnd.nextInt(28)}%02d " +
          f"${rnd.nextInt(24)}%02d:${rnd.nextInt(60)}%02d:" +
          f"${rnd.nextInt(60)}%02d"
        if (rnd.nextBoolean()) base else s"$base.${fracDigits(6)}"
      case "year" => (1901 + rnd.nextInt(150)).toString
      case "varchar(32)" =>
        val alphabet = "abcXYZ012 éü中λ"
        (0 until rnd.nextInt(12)).map(_ =>
          alphabet(rnd.nextInt(alphabet.length))).mkString
      case "char(8)" =>
        (0 until 1 + rnd.nextInt(7)).map(_ =>
          ('a' + rnd.nextInt(26)).toChar).mkString
      case "blob" =>
        (0 until 2 * (1 + rnd.nextInt(6))).map(_ =>
          "0123456789abcdef"(rnd.nextInt(16))).mkString
      case other => sys.error(other)
    }
    def lit(t: String, v: String): String =
      if (v == null) "NULL"
      else t match {
        case "blob" => s"x'$v'"
        case "date" | "time(3)" | "datetime(6)" | "varchar(32)" |
          "char(8)" => s"'${v.replace("'", "''")}'"
        case _ => v
      }
    val prepare =
      s"""CREATE DATABASE typed_db;
         |CREATE TABLE typed_db.t (id int${colTypes.map { case (c, t) =>
          s", $c $t DEFAULT NULL" }.mkString}, PRIMARY KEY (id));
         |""".stripMargin
    var ids = Vector.empty[Int]
    var nextId = 1
    val stmts = Seq.newBuilder[String]
    (0 until 12 + rnd.nextInt(8)).foreach { _ =>
      rnd.nextInt(4) match {
        case 0 | 1 => // INSERT with a fresh pk
          val vals = colTypes.map { case (_, t) =>
            if (rnd.nextInt(5) == 0) null else randValue(t) }
          stmts += s"INSERT INTO typed_db.t VALUES ($nextId" +
            colTypes.zip(vals).map { case ((_, t), v) =>
              s", ${lit(t, v)}" }.mkString + ");"
          ids :+= nextId; nextId += 1
        case 2 if ids.nonEmpty => // UPDATE one typed col by pk
          val id = ids(rnd.nextInt(ids.size))
          val (c, t) = colTypes(rnd.nextInt(colTypes.size))
          val v = if (rnd.nextInt(5) == 0) null else randValue(t)
          stmts += s"UPDATE typed_db.t SET $c = ${lit(t, v)} " +
            s"WHERE id = $id;"
        case _ if ids.nonEmpty => // DELETE by pk
          val i = rnd.nextInt(ids.size)
          stmts += s"DELETE FROM typed_db.t WHERE id = ${ids(i)};"
          ids = ids.patch(i, Nil, 1)
        case _ => ()
      }
    }
    val ini =
      s"""[extractor]
         |db_type=mysql
         |extract_type=cdc
         |url=fixture://src
         |
         |[filter]
         |do_tbs=typed_db.*
         |do_events=insert,update,delete
         |
         |[sinker]
         |db_type=mysql
         |batch_size=${1 + rnd.nextInt(4)}
         |url=fixture://dst
         |""".stripMargin
    (ini, prepare, stmts.result().mkString("\n"))
  }

  test(s"random TYPED tables fuzz the binlog wire codecs through the " +
      s"full pipeline over $Trials trials") {
    val rnd = new Random(0xB1601C0D)
    (1 to Trials).foreach { trial =>
      val (ini, prepare, test) = genTypedScenario(rnd)
      val dir = Files.createTempDirectory(s"graft-proptyped-$trial")
      Files.writeString(dir.resolve("task_config.ini"), ini)
      Files.writeString(dir.resolve("src_prepare.sql"), prepare)
      Files.writeString(dir.resolve("src_test.sql"), test)
      try ScenarioRunner.run(spark, dir)
      catch {
        case e: Throwable =>
          fail(s"trial $trial failed (prepare:\n$prepare\nscript:\n" +
            s"$test\n): ${e.getMessage}")
      }
    }
  }

  test(s"random keyed DML scripts through the wire-sink lanes " +
      s"(redis/kafka/starrocks/http_server) over $Trials trials") {
    val rnd = new Random(0x5EAF00D)
    val sinks = Vector("redis", "kafka", "starrocks", "http_server")
    (1 to Trials).foreach { trial =>
      val sink = sinks(trial % sinks.size)
      val (ini, prepare, test) = genDdlScenario(rnd,
        wireSink = Some(sink))
      val dir = Files.createTempDirectory(s"graft-propwire-$trial")
      Files.writeString(dir.resolve("task_config.ini"), ini)
      Files.writeString(dir.resolve("src_prepare.sql"), prepare)
      Files.writeString(dir.resolve("src_test.sql"), test)
      // each lane internally compares wire-rebuilt state vs naive
      // replay vs the interpreted source end state
      try ScenarioRunner.run(spark, dir)
      catch {
        case e: Throwable =>
          fail(s"trial $trial ($sink) failed (script:\n$test\n): " +
            e.getMessage)
      }
    }
  }

  test(s"random valid DML scripts: pipeline == replay == source end " +
      s"state over $Trials trials (keyed, uk-NULL-serial, keyless)") {
    val rnd = new Random(0xC0FFEE)
    (1 to Trials).foreach { trial =>
      val (ini, prepare, test) = genScenario(rnd)
      val dir = Files.createTempDirectory(s"graft-prop-$trial")
      Files.writeString(dir.resolve("task_config.ini"), ini)
      Files.writeString(dir.resolve("src_prepare.sql"), prepare)
      Files.writeString(dir.resolve("src_test.sql"), test)
      try ScenarioRunner.run(spark, dir) // asserts the 3-way compare
      catch {
        case e: Throwable =>
          fail(s"trial $trial failed (script:\n$test\n): " +
            e.getMessage)
      }
    }
  }

  /** Two-way property trials: random DISJOINT-key write streams at
    * node A and node B run through the data-marker loop (A→B→A→B).
    * The runner asserts, per trial: production nodeFilter agreement,
    * pipeline-vs-replay state fidelity per direction, full echo
    * suppression, loop quiescence, and convergence of both nodes to
    * baseline + A-local + B-local. Disjoint key ranges model the
    * reference's two-way posture (conflict resolution is out of
    * scope there too — last-writer-wins on a shared key is not part
    * of the contract).
    */
  private def genTwoWayScripts(rnd: Random): (String, String, String) = {
    val prepare =
      """CREATE DATABASE tw_prop;
        |CREATE TABLE tw_prop.t ( id int, v varchar(16) DEFAULT NULL, w varchar(16) DEFAULT NULL, PRIMARY KEY (id) );
        |INSERT INTO tw_prop.t VALUES (500,'baseline','x');
        |""".stripMargin
    def genSide(lo: Int, hi: Int): String = {
      var live = Set.empty[Int]
      val stmts = Seq.newBuilder[String]
      def randVal(): String =
        if (rnd.nextInt(5) == 0) "NULL" else s"'${rnd.nextInt(8)}'"
      val n = 6 + rnd.nextInt(8)
      (0 until n).foreach { _ =>
        rnd.nextInt(3) match {
          case 0 =>
            val id = lo + rnd.nextInt(hi - lo)
            if (!live(id)) {
              live += id
              stmts += s"INSERT INTO tw_prop.t VALUES ($id, ${randVal()}, ${randVal()});"
            }
          case 1 if live.nonEmpty =>
            val id = live.toSeq(rnd.nextInt(live.size))
            stmts += s"UPDATE tw_prop.t SET v = ${randVal()} WHERE id = $id;"
          case _ if live.nonEmpty =>
            val id = live.toSeq(rnd.nextInt(live.size))
            live -= id
            stmts += s"DELETE FROM tw_prop.t WHERE id = $id;"
          case _ => ()
        }
      }
      // both sides must write SOMETHING or the runner's shipped>0
      // gates trip vacuously
      if (live.isEmpty && stmts.result().isEmpty)
        stmts += s"INSERT INTO tw_prop.t VALUES ($lo, 'seed', NULL);"
      stmts.result().mkString("\n")
    }
    var a = genSide(0, 50)
    if (!a.contains("INSERT")) a = "INSERT INTO tw_prop.t VALUES (1,'a',NULL);\n" + a
    var b = genSide(50, 100)
    if (!b.contains("INSERT")) b = "INSERT INTO tw_prop.t VALUES (51,'b',NULL);\n" + b
    (prepare, a, b)
  }

  test("random two-way write streams: echo suppression, quiescence, " +
      "and convergence hold on every trial") {
    val rnd = new Random(20260815L)
    def marker(src: String, dst: String): String =
      s"""[data_marker]
         |topo_name=topo1
         |topo_nodes=node_a,node_b
         |src_node=$src
         |dst_node=$dst
         |do_nodes=$src
         |ignore_nodes=$dst
         |marker=ape_trans_mysql.topo1
         |""".stripMargin
    (1 to 8).foreach { trial =>
      val (prepare, aScript, bScript) = genTwoWayScripts(rnd)
      val dir = Files.createTempDirectory(s"twoway-prop-$trial")
      def put(name: String, text: String): Unit =
        Files.write(dir.resolve(name), text.getBytes("UTF-8")): Unit
      val base =
        s"""[extractor]
           |db_type=mysql
           |extract_type=cdc
           |url=fixture://src
           |
           |[filter]
           |do_tbs=tw_prop.*
           |
           |[sinker]
           |db_type=mysql
           |batch_size=${1 + rnd.nextInt(4)}
           |url=fixture://dst
           |
           |""".stripMargin
      put("task_config.ini", base + marker("node_a", "node_b"))
      put("task_config_back.ini", base + marker("node_b", "node_a"))
      put("src_prepare.sql", prepare)
      put("src_test.sql", aScript)
      put("dst_test.sql", bScript)
      try ScenarioRunner.run(spark, dir) // asserts everything inside
      catch {
        case e: Throwable =>
          fail(s"two-way trial $trial failed\nA:\n$aScript\nB:\n$bScript\n" +
            e.getMessage)
      }
    }
  }
}
