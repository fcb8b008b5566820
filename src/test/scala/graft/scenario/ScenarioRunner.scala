package graft.scenario

import java.nio.file.{Files, Path, Paths}
import java.util.concurrent.ConcurrentHashMap

import scala.collection.mutable
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.config.TaskConfig
import graft.operators.Compaction
import graft.sinks.{Applier, RdbQueryBuilder}

import FixtureSql._

/** Data-driven scenario runner — the repo's answer to the reference's
  * dt-tests corpus (dt-tests/tests/test_runner/rdb_test_runner.rs):
  * each scenario dir holds `task_config.ini` + `src_prepare.sql` +
  * `src_test.sql`; the runner interprets the fixtures as the live
  * source, synthesizes the row-image change stream the binlog would
  * carry, drives it through the REAL pipeline operators the task
  * surface wires (NameFilter → Router → update-split/key-change
  * safety → Compaction → Applier statement planning, honoring the
  * INI's batch_size and dialect), executes the generated SQL against
  * an in-memory destination engine, and compares FULL END-STATE
  * TABLES src vs dst per routed table — the
  * `compare_data_for_tbs` semantics (rdb_test_runner.rs:329-349).
  *
  * Two independent oracles:
  *  - a naive sequential replay of the (filtered, routed) event
  *    stream — per-event upsert/delete with none of the pipeline's
  *    batching, compaction, or lane parallelism;
  *  - the interpreted source's own end state (only when the filter
  *    admits every event — otherwise dst is legitimately a subset).
  */
object ScenarioRunner {

  final case class TableState(cols: Seq[String], keys: Seq[String],
      rows: mutable.ArrayBuffer[Seq[Value]])

  /** In-memory destination engine: interprets the exact statement
    * shapes RdbQueryBuilder/Applier emit. Shared registry because
    * foreachPartition closures run on executor threads of the same
    * local JVM (same pattern as IdempotentApplySpec.TableSink).
    */
  object MemDb {
    val stores = new ConcurrentHashMap[String, TableState]()

    def key(runId: String, quotedTable: String): String =
      s"$runId|$quotedTable"

    def register(runId: String, quotedTable: String, cols: Seq[String],
        keys: Seq[String]): Unit =
      stores.put(key(runId, quotedTable),
        TableState(cols, keys, mutable.ArrayBuffer.empty)): Unit

    final case class Sink(runId: String)
        extends Applier.StatementSink with Serializable {
      private def tableOf(sql: String): TableState = {
        // our builders render "VERB INTO|FROM <quoted> ..." with the
        // quoted name as the third whitespace token
        val tok = sql.split("\\s+")(2)
        val st = stores.get(key(runId, tok))
        require(st != null, s"unregistered dst table: $tok")
        st
      }
      override def execute(b: Applier.StatementBatch): Unit = {
        val st = tableOf(b.sql)
        st.synchronized {
          val keyIdx = st.keys.map(st.cols.indexOf)
          def keyOf(full: Seq[Any]): Seq[Any] = keyIdx.map(full(_))
          if (b.sql.startsWith("DELETE") && b.sql.contains(" IN (")) {
            // batch delete by key tuples
            val dead = b.rows.map(_.map(v => v: Any)).toSet
            st.rows.filterInPlace(r => !dead.contains(keyOf(r)))
          } else if (b.sql.startsWith("DELETE")) {
            // serial lane: full-row null-safe delete
            val dead = b.rows.map(_.map(v => v: Any)).toSet
            st.rows.filterInPlace(r => !dead.contains(r))
          } else if (b.sql.startsWith("REPLACE") ||
            b.sql.contains("ON CONFLICT") ||
            b.sql.contains("ON DUPLICATE")) {
            b.rows.foreach { r =>
              val k = keyOf(r)
              st.rows.filterInPlace(row => keyOf(row) != k)
              st.rows += r.map(v => v.asInstanceOf[Value])
            }
          } else if (b.sql.startsWith("INSERT")) {
            b.rows.foreach(r =>
              st.rows += r.map(v => v.asInstanceOf[Value]))
          } else sys.error(s"unexpected statement shape: ${b.sql}")
        }
      }
    }

    def snapshot(runId: String): Map[String, Seq[Map[String, Value]]] =
      stores.asScala.toMap.collect {
        case (k, st) if k.startsWith(s"$runId|") =>
          k.stripPrefix(s"$runId|") ->
            st.rows.toSeq.map(r => st.cols.zip(r).toMap)
      }

    def clear(runId: String): Unit =
      stores.keySet.asScala.filter(_.startsWith(s"$runId|"))
        .foreach(stores.remove(_): Unit)
  }

  final case class Result(
      tablesCompared: Int,
      rowsAtDst: Long,
      perTable: Map[String, (Seq[Map[String, Value]],
        Seq[Map[String, Value]])])

  private def dialectOf(dbType: String): RdbQueryBuilder.Dialect =
    dbType match {
      case "pg" | "postgres" | "postgresql" => RdbQueryBuilder.Postgres
      case _ => RdbQueryBuilder.MySql
    }

  /** Run one scenario dir end to end; asserts full-state equality and
    * returns the compared states for extra scenario-specific checks.
    */
  def run(spark: SparkSession, dir: Path): Result = {
    val ini = new String(
      Files.readAllBytes(dir.resolve("task_config.ini")), "UTF-8")
    // baseDir = the scenario dir, so the corpus exercises the SAME
    // relative-path resolution production uses (TaskConfig resolves
    // lua_code_file against the INI's directory)
    val task = TaskConfig.fromIni(ini, Some(dir))
    val dialect = dialectOf(task.sinkDbType)
    val runId = s"${dir.getFileName}-${System.nanoTime()}"

    val src = new SourceState
    src.applyAll(parseScript(new String(
      Files.readAllBytes(dir.resolve("src_prepare.sql")), "UTF-8")))
    src.applyAll(parseScript(new String(
      Files.readAllBytes(dir.resolve("src_test.sql")), "UTF-8")))

    // ---- event stream the extractor would hand the pipeline:
    // snapshot tasks ship the end state as inserts; cdc ships the
    // per-statement row images
    val isSnapshot = task.extractType == TaskConfig.SnapshotExtract
    val rawEvents: Seq[Event] =
      if (isSnapshot)
        src.defs.keys.toSeq.flatMap { case (db, tb) =>
          src.rows((db, tb)).zipWithIndex.map { case (r, i) =>
            Event(db, tb, i + 1L, "insert", Map.empty, r)
          }
        }
      else src.events.toSeq

    // ---- the row-level gates the task surface applies; snapshot
    // tasks additionally apply the source-side where_conditions
    // predicate (config.md [filter] where_conditions — pushed to the
    // extract statement in production, interpreted here)
    val wherePreds: Map[(String, String), Where] =
      task.whereByTable.map { case (k, sql) =>
        k -> parseWhere(Some(sql))
      }
    val gated = rawEvents.filter { e =>
      task.filter.allowTable(e.db, e.tb) &&
        task.filter.allowEvent(e.rowType) &&
        (!isSnapshot || wherePreds.get((e.db, e.tb))
          .forall(_.matches(e.after)))
    }

    // ---- [processor] lua_code_file: the user's VERBATIM Lua runs per
    // row between extract-side filtering and routing, exactly the
    // reference pipeline position (lua_processor.rs) — blanked
    // row_type drops the event
    val admitted = task.luaCodeFile match {
      case None => gated
      case Some(f) =>
        val chunk = graft.transform.LuaScript.parse(new String(
          Files.readAllBytes(Paths.get(f)), "UTF-8"))
        gated.flatMap { e =>
          graft.transform.LuaScript.processEvent(chunk,
            graft.model.ChangeEvent(e.db, e.tb, 0L, e.rowType,
              e.before.filter(_._2 != null),
              e.after.filter(_._2 != null), "none", "", ""))
            .map(ce => e.copy(db = ce.schema, tb = ce.tb,
              rowType = ce.rowType,
              before = e.before.filter(_._2 == null) ++ ce.before,
              after = e.after.filter(_._2 == null) ++ ce.after))
        }
    }

    // ---- routing + per-table column projection (ignore_cols drops
    // the columns from the sync entirely — config.md [filter])
    final case class Routed(dstDb: String, dstTb: String, seq: Long,
        sub: Int, rowType: String, before: Map[String, Value],
        after: Map[String, Value])
    def project(db: String, tb: String, img: Map[String, Value])
        : Map[String, Value] = {
      val ignored =
        task.ignoreColsByTable.getOrElse((db, tb), Nil).toSet
      img.collect { case (c, v) if !ignored.contains(c) =>
        task.router.routeColumn(db, tb, c) -> v
      }
    }
    // routed table defs for everything the filter admits
    val routedDefs: Map[(String, String), TableDef] =
      src.defs.values.toSeq
        .filter(d => task.filter.allowTable(d.db, d.tb))
        .map { d =>
          val (rdb, rtb) = task.router.routeTable(d.db, d.tb)
          val ignored =
            task.ignoreColsByTable.getOrElse((d.db, d.tb), Nil).toSet
          val cols = d.cols.filterNot(ignored)
            .map(task.router.routeColumn(d.db, d.tb, _))
          val mapCols = (cs: Seq[String]) => cs.filterNot(ignored)
            .map(task.router.routeColumn(d.db, d.tb, _))
          (rdb, rtb) -> TableDef(rdb, rtb, cols, mapCols(d.pk),
            d.uks.map(mapCols).filter(_.nonEmpty))
        }.toMap

    val routedEvents = admitted.map { e =>
      val (rdb, rtb) = task.router.routeTable(e.db, e.tb)
      Routed(rdb, rtb, e.seq, 0, e.rowType,
        project(e.db, e.tb, e.before), project(e.db, e.tb, e.after))
    }

    // ---- update normalization (the extractor/merger's key-change
    // safety, reference rdb_merger id-change handling + update split):
    // an update whose key changed, whose key carries NULL on either
    // side, or that targets a keyless table becomes
    // delete(before)+insert(after)
    def keyOf(d: TableDef, img: Map[String, Value]): Seq[Value] =
      d.keyCols.map(img.getOrElse(_, null))
    val normalized = routedEvents.flatMap { e =>
      val d = routedDefs((e.dstDb, e.dstTb))
      if (e.rowType == "update") {
        val kb = keyOf(d, e.before)
        val ka = keyOf(d, e.after)
        val unmergeable = d.keyCols.isEmpty ||
          kb.contains(null) || ka.contains(null) || kb != ka
        if (unmergeable)
          Seq(e.copy(rowType = "delete", sub = 0, after = Map.empty),
            e.copy(rowType = "insert", sub = 1, before = Map.empty))
        else Seq(e)
      } else Seq(e)
    }

    // ---- per routed table: DataFrame -> real compaction -> real
    // apply planning -> statements against the in-memory dst engine
    val byTable = normalized.groupBy(e => (e.dstDb, e.dstTb))
    // register EVERY admitted table (dst DDL exists even if no DML)
    routedDefs.foreach { case ((rdb, rtb), d) =>
      val qt = s"${dialect.quote(rdb)}.${dialect.quote(rtb)}"
      MemDb.register(runId, qt, d.cols, d.keyCols)
    }
    if (task.parallelType == "table" || task.parallelType == "serial") {
      // table parallelizer lane (table_parallelizer.rs): DML
      // partitions by full table name, each table's rows apply IN
      // ORDER as per-row statements — updates were already split to
      // delete+insert above only when unmergeable, so split the rest
      // here (the serial planner speaks insert/delete row images)
      val split = normalized.flatMap { e =>
        if (e.rowType == "update")
          Seq(e.copy(rowType = "delete", sub = 0, after = Map.empty),
            e.copy(rowType = "insert", sub = 1, before = Map.empty))
        else Seq(e)
      }
      // applyPerTable streams one homogeneous column set; the corpus
      // keeps table-mode fixtures same-shaped (union of cols asserted)
      val allCols = routedDefs.values.map(_.cols).toSeq.distinct
      require(allCols.size == 1,
        "table-parallel scenarios need same-shaped tables, got: " +
          allCols.mkString(" vs "))
      val cols = allCols.head
      val schema = StructType(
        Seq(StructField("schema", StringType),
          StructField("tb", StringType),
          StructField("seq", LongType),
          StructField("sub", IntegerType),
          StructField("row_type", StringType)) ++
          cols.map(StructField(_, StringType)))
      val rows = split.map { e =>
        val img = if (e.rowType == "delete") e.before else e.after
        Row.fromSeq(Seq(e.dstDb, e.dstTb, e.seq, e.sub, e.rowType) ++
          cols.map(img.getOrElse(_, null)))
      }
      Applier.applyPerTable(dialect,
        spark.createDataFrame(rows.asJava, schema), cols,
        Seq("seq", "sub"), () => MemDb.Sink(runId),
        batchSize = task.batchSize)
    } else byTable.foreach { case ((rdb, rtb), events) =>
      val d = routedDefs((rdb, rtb))
      val qt = s"${dialect.quote(rdb)}.${dialect.quote(rtb)}"
      val schema = StructType(
        Seq(StructField("seq", LongType),
          StructField("sub", IntegerType),
          StructField("row_type", StringType)) ++
          d.cols.map(StructField(_, StringType)))
      val rows = events.map { e =>
        val img = if (e.rowType == "delete") e.before else e.after
        Row.fromSeq(Seq(e.seq, e.sub, e.rowType) ++
          d.cols.map(img.getOrElse(_, null)))
      }
      val df = spark.createDataFrame(rows.asJava, schema)
      val compacted: DataFrame =
        if (d.keyCols.isEmpty)
          // keyless table: the whole stream is the serial lane
          df.withColumn(Compaction.ActionCol, lit(Compaction.Serial))
        else
          Compaction.compact(df, d.keyCols, Seq("seq", "sub"),
            col("row_type"))
      Applier.applyCompacted(dialect, qt, compacted, d.keyCols,
        d.cols, Seq("seq", "sub"), () => MemDb.Sink(runId),
        batchSize = task.batchSize)
    }

    // ---- full end-state compare (rdb_test_runner.rs:329-349)
    val naive = naiveReplay(routedDefs, normalized.map(e =>
      (e.dstDb, e.dstTb, e.rowType,
        if (e.rowType == "delete") e.before else e.after)))
    val dst = MemDb.snapshot(runId)
    MemDb.clear(runId)

    val perTable = routedDefs.map { case ((rdb, rtb), _) =>
      val qt = s"${dialect.quote(rdb)}.${dialect.quote(rtb)}"
      val got = dst.getOrElse(qt, Nil)
      val want = naive.getOrElse((rdb, rtb), Nil)
      compareStates(s"$rdb.$rtb", want, got)
      // the source's own end state is a second oracle whenever the
      // event gates admit everything (otherwise dst is a lawful
      // subset of src)
      val fullFidelity = !isSnapshot &&
        task.filter.doEvents == Set("insert", "update", "delete")
      // a Lua processor rewrites rows in flight, so the source state
      // stops being an oracle for the destination — the per-event
      // replay (which saw the processed stream) remains one
      if ((fullFidelity || isSnapshot) && task.luaCodeFile.isEmpty) {
        val (db, tb) = src.defs.keys
          .find(k => task.router.routeTable(k._1, k._2) == (rdb, rtb))
          .get
        val srcState = src.rows((db, tb)).toSeq
          // snapshot where_conditions narrows the src-side oracle too
          .filter(r => !isSnapshot ||
            wherePreds.get((db, tb)).forall(_.matches(r)))
          .map(project(db, tb, _))
        compareStates(s"$rdb.$rtb (vs src)", srcState, got)
      }
      s"$rdb.$rtb" -> (want, got)
    }
    Result(perTable.size, dst.values.map(_.size.toLong).sum, perTable)
  }

  /** Naive sequential oracle: per-event apply with no batching. */
  private def naiveReplay(
      defs: Map[(String, String), TableDef],
      events: Seq[(String, String, String, Map[String, Value])])
      : Map[(String, String), Seq[Map[String, Value]]] = {
    val state = mutable.Map[(String, String),
      mutable.ArrayBuffer[Map[String, Value]]]()
    defs.keys.foreach(k => state(k) = mutable.ArrayBuffer.empty)
    events.foreach { case (db, tb, rowType, rawImg) =>
      val d = defs((db, tb))
      val buf = state((db, tb))
      // an RDB insert fills unnamed columns with NULL — a processed
      // stream (Lua column drop) ships partial images, and the dst
      // engine lands them as NULL, so the oracle must too
      val img = d.cols.map(c => c -> rawImg.getOrElse(c, null)).toMap
      def keyOf(m: Map[String, Value]): Seq[Value] =
        d.keyCols.map(m.getOrElse(_, null))
      val k = keyOf(img)
      val keyed = d.keyCols.nonEmpty && !k.contains(null)
      rowType match {
        case "delete" =>
          if (keyed) buf.filterInPlace(r => keyOf(r) != k)
          else buf.filterInPlace(r => r != img)
        case _ => // insert/update -> upsert (or append when keyless)
          if (keyed) {
            buf.filterInPlace(r => keyOf(r) != k)
            buf += img
          } else buf += img
      }
    }
    state.view.mapValues(_.toSeq).toMap
  }

  private def canon(rows: Seq[Map[String, Value]]): Seq[String] =
    rows.map(r => r.toSeq.sortBy(_._1)
      .map { case (c, v) => s"$c=${if (v == null) "∅" else v}" }
      .mkString("|")).sorted

  private[scenario] def compareStates(label: String,
      want: Seq[Map[String, Value]], got: Seq[Map[String, Value]])
      : Unit = {
    val w = canon(want)
    val g = canon(got)
    if (w != g) {
      val missing = w.diff(g).take(3)
      val extra = g.diff(w).take(3)
      sys.error(s"scenario state mismatch for $label: " +
        s"want ${w.size} rows, got ${g.size}; " +
        s"missing=${missing.mkString("; ")} " +
        s"extra=${extra.mkString("; ")}")
    }
  }

  /** Scenario corpus root (repo-relative; sbt runs tests from the
    * project base directory).
    */
  def corpusRoot: Path = {
    val p = Paths.get("src/test/resources/scenarios")
    require(Files.isDirectory(p), s"scenario corpus missing at $p")
    p
  }

  def scenarios(): Seq[Path] =
    Files.list(corpusRoot).iterator().asScala.toSeq
      // a dir is a scenario iff it carries the INI — stray build
      // artifacts (an sbt launched from the wrong cwd drops target/)
      // must not enumerate as fixtures
      .filter(d => Files.isDirectory(d) &&
        Files.exists(d.resolve("task_config.ini")))
      .sortBy(_.getFileName.toString)
}
