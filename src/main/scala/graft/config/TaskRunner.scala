package graft.config

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.infra.{CheckLogs, Precheck}
import graft.operators.{Checker, Compaction}

/** Config → running task — the reference's TaskRunner
  * (/root/reference/dt-task/src/task_runner.rs:153-263): expand the
  * filter against the catalog, wire extractor → route → sink per table,
  * report per-table progress. Here the catalog is the parquet fixture
  * directory and the sink is a parquet directory (the applier/stream-load
  * paths are exercised by their own modules); the wiring, filtering,
  * routing, and check semantics are the product.
  */
object TaskRunner {

  final case class TableResult(schema: String, tb: String, rows: Long,
      dstTable: String)

  private def catalog(dir: String): Seq[(String, String)] =
    Tables.names.map(t => ("app", t))

  /** The tables a task's filter admits — the task's unit list. */
  def units(task: TaskConfig.Task): Seq[(String, String)] =
    task.filter.expand(catalog(task.sourceDir))

  /** One snapshot unit: read a table, apply where_conditions and
    * ignore_cols (the filter's `json:` configs — both reach the scan:
    * the WHERE becomes a pushed filter, the drop prunes the parquet
    * read schema), then the column map, then write to the routed
    * destination.
    */
  def snapshotTable(spark: SparkSession, task: TaskConfig.Task,
      schema: String, tb: String): TableResult = {
    val loaded = Tables.load(spark, task.sourceDir, tb)
    val conditioned = task.whereByTable.get((schema, tb))
      .map(c => loaded.filter(expr(c))).getOrElse(loaded)
    val dropped = task.ignoreColsByTable.get((schema, tb))
      .map(cols => conditioned.drop(cols: _*)).getOrElse(conditioned)
    // [processor] lua_code_file: the user's VERBATIM Lua between
    // filter and routing, the reference snapshot position
    val df = task.luaCodeFile match {
      case None => dropped
      case Some(f) => graft.transform.LuaScript.snapshotTransform(
        graft.infra.Fs.readString(f), schema, tb)(dropped)
    }
    val routed = task.router.renameColumns(schema, tb, df)
    val (toSchema, toTb) = task.router.routeTable(schema, tb)
    val out = s"${task.sinkDir}/$toSchema.$toTb"
    // [extractor] partition_cols: the snapshot splits on the
    // configured column (config.md:20) — ranges of it become the
    // write partitions, the chunked-extract shape at the output
    val partitioned = task.partitionColsByTable.get((schema, tb))
      .map(c => routed.repartitionByRange(
        math.max(1, task.parallelism),
        col(task.router.routeColumn(schema, tb, c))))
      .getOrElse(routed)
    partitioned.write.mode(SaveMode.Overwrite).parquet(out)
    // count the WRITTEN output, not the source again — a parquet
    // count() is satisfied from row-group metadata, while re-counting
    // `routed` would re-run the full source scan per table
    TableResult(schema, tb, spark.read.parquet(out).count(),
      s"$toSchema.$toTb")
  }

  /** Snapshot task: every admitted table through [[snapshotTable]]. */
  def runSnapshot(spark: SparkSession, task: TaskConfig.Task)
      : Seq[TableResult] =
    units(task).map { case (schema, tb) =>
      snapshotTable(spark, task, schema, tb)
    }

  /** `[pipeline] pipeline_type=http_server` producer side: instead of
    * sinking, each admitted table's (filtered, routed) frame is staged
    * as one spool batch under `<sink>/spool` — the reference's
    * HttpServerPipeline swap, where the sinker is replaced by the
    * served subscription. A `dst_table` column stamps each row with
    * its routed destination so a consumer can demultiplex the spool.
    */
  def stageSnapshot(spark: SparkSession, task: TaskConfig.Task)
      : (graft.infra.Subscription, Seq[TableResult]) = {
    val sub = new graft.infra.Subscription(s"${task.sinkDir}/spool")
    var offset = sub.offsets().lastOption.map(_ + 1).getOrElse(0L)
    val results = units(task).map { case (schema, tb) =>
      val loaded = Tables.load(spark, task.sourceDir, tb)
      val conditioned = task.whereByTable.get((schema, tb))
        .map(c => loaded.filter(expr(c))).getOrElse(loaded)
      val dropped = task.ignoreColsByTable.get((schema, tb))
        .map(cols => conditioned.drop(cols: _*)).getOrElse(conditioned)
      // same [processor] position as snapshotTable: the staged spool
      // serves PROCESSED rows, like the reference's pipeline swap
      val df = task.luaCodeFile match {
        case None => dropped
        case Some(f) => graft.transform.LuaScript.snapshotTransform(
          graft.infra.Fs.readString(f), schema, tb)(dropped)
      }
      val routed = task.router.renameColumns(schema, tb, df)
      val (toSchema, toTb) = task.router.routeTable(schema, tb)
      sub.stage(routed.withColumn("dst_table",
        lit(s"$toSchema.$toTb")), offset)
      val rows = spark.read
        .parquet(s"${task.sinkDir}/spool/batch=$offset").count()
      offset += 1
      TableResult(schema, tb, rows, s"$toSchema.$toTb")
    }
    (sub, results)
  }

  /** Curation task: the training-data extension run from the SAME
    * task-config surface as replication — `extract_type=curation` runs
    * [[graft.operators.CurationPipeline]] over the source corpus and
    * materializes verdicts + report under the sink dir. Returns the
    * per-reason counts for the progress report.
    */
  def runCuration(spark: SparkSession, task: TaskConfig.Task)
      : graft.operators.CurationPipeline.Summary =
    graft.operators.CurationPipeline.run(spark, task.sourceDir,
      task.sinkDir)

  /** WARC ingestion result: records framed per type (THIS run),
    * documents in the landed table, and the incremental file
    * accounting.
    */
  final case class WarcSummary(records: Map[String, Long], nDocs: Long,
      filesProcessed: Long = 0L, filesSkipped: Long = 0L)

  /** WARC/WET ingestion task (`extract_type=warc`): frame every
    * record of the crawl files under [extractor] url, land the full
    * record table under `<sink>/warc_records` and the conversion
    * records as a curation-ready `documents` parquet under the sink —
    * the Common Crawl entry point feeding the curation/loader task
    * chain on the same INI surface.
    *
    * INCREMENTAL by file: a manifest under `<sink>/ingested_files`
    * records every segment already framed (the LakeSink meta-file
    * discipline applied to crawls), so a re-run after a new crawl
    * drop parses ONLY the new segments and appends their records —
    * at 100k segments per drop, re-framing the whole history per run
    * would dominate the pipeline. The documents parquet is rebuilt
    * from the full record table each run (a derived view — cheap
    * relative to framing, and keeps ids exactly-once since they are
    * stable folds). Restart-safe ordering: records append BEFORE the
    * manifest, so a crash between the two re-processes a file into
    * duplicate records rather than silently losing one — and the
    * stable doc_ids collapse those duplicates in the derived table.
    */
  def runWarc(spark: SparkSession, task: TaskConfig.Task)
      : WarcSummary = {
    import org.apache.spark.sql.functions.{col, lit}
    val manifestDir = s"${task.sinkDir}/ingested_files"
    // probe through the Hadoop-FS layer, not java.io: a non-local
    // sink (hdfs://, s3a://) must see its manifest or every run would
    // silently re-frame and re-append the whole crawl. Absence is the
    // ONLY condition that yields None — a transient/corrupt manifest
    // read must propagate, not quietly re-frame the entire history
    // into duplicate record rows.
    def readIfExists(path: String) = {
      val p = new org.apache.hadoop.fs.Path(path)
      val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
      // a dir with no committed data files (a crash between mkdir and
      // the first commit leaves only _temporary/) is ABSENCE, not a
      // read error — without this check spark.read.parquet throws
      // "unable to infer schema" on every restart and the ingest can
      // never start again
      def hasData(dir: org.apache.hadoop.fs.Path): Boolean =
        fs.listStatus(dir).exists { st =>
          val n = st.getPath.getName
          if (n.startsWith("_") || n.startsWith(".")) false
          else !st.isDirectory || hasData(st.getPath)
        }
      if (fs.exists(p) && hasData(p)) Some(spark.read.parquet(path))
      else None
    }
    val done: Set[String] = readIfExists(manifestDir)
      .map(_.select("file").collect().map(_.getString(0)).toSet)
      .getOrElse(Set.empty)
    val allFiles = spark.read.format("binaryFile")
      .load(task.sourceDir)
      .select("path").collect().map(_.getString(0)).toSeq.sorted
    val todo = allFiles.filterNot(done)
    val byType: Map[String, Long] =
      if (todo.isEmpty) Map.empty
      else {
        val recs = graft.sources.WarcSource
          .read(spark, todo: _*)
          .localCheckpoint()
        recs.write.mode(SaveMode.Append)
          .parquet(s"${task.sinkDir}/warc_records")
        val counted = recs.groupBy("warc_type").count().collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        // manifest AFTER the records landed (see Scaladoc)
        import spark.implicits._
        todo.toDF("file").write.mode(SaveMode.Append)
          .parquet(manifestDir)
        counted
      }
    // nothing ever landed (task created before the first crawl drop):
    // report a zero summary instead of failing on the missing table
    val nDocs = readIfExists(s"${task.sinkDir}/warc_records") match {
      case None => 0L
      case Some(stored) =>
        graft.sources.WarcSource.wetDocuments(stored)
          // crash-replayed segments collapse (same doc_id AND raw_id);
          // a fold collision (same doc_id, different raw_id) keeps
          // both rows — detectable downstream rather than silently
          // discarding a legitimate document
          .dropDuplicates("doc_id", "raw_id")
          .write.mode(SaveMode.Overwrite)
          .parquet(s"${task.sinkDir}/documents.parquet")
        spark.read
          .parquet(s"${task.sinkDir}/documents.parquet").count()
    }
    WarcSummary(byType, nDocs, filesProcessed = todo.size.toLong,
      filesSkipped = (allFiles.size - todo.size).toLong)
  }

  /** JSONL ingestion result. */
  final case class JsonlSummary(nDocs: Long, nBadLines: Long,
      withUrl: Long)

  /** JSONL corpus ingestion (`extract_type=jsonl`): one JSON object
    * per line with a required `text` field — the wire format most
    * open datasets ship. Gzip (and any Hadoop-recognized codec) comes
    * free from the line reader; malformed lines land in a quarantine
    * column instead of failing the 100k-file ingest (PERMISSIVE +
    * corrupt-record accounting, the Spark-native analog of a bad-rows
    * lane). `doc_id` is a stable 64-bit fold of the record's own id
    * when present, else of the text — so re-ingestion dedups against
    * itself, same contract as [[graft.sources.WarcSource]].
    */
  def runJsonl(spark: SparkSession, task: TaskConfig.Task)
      : JsonlSummary = {
    import org.apache.spark.sql.functions._
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("id", StringType),
      StructField("url", StringType),
      StructField("text", StringType),
      StructField("lang", StringType),
      StructField("_corrupt", StringType)))
    val raw = spark.read
      .schema(schema)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_corrupt")
      .json(task.sourceDir)
    val bad = raw.filter(col("_corrupt").isNotNull ||
      col("text").isNull)
    val idSource = coalesce(col("id"), col("text"))
    val docs = raw.filter(col("_corrupt").isNull &&
        col("text").isNotNull)
      .select(
        graft.functions.GraftFunctions.charFold(idSource).as("doc_id"),
        idSource.as("raw_id"),
        col("url"), col("lang"), col("text"))
      // within-ingest dedup (same contract as the WARC path): repeated
      // lines and shared ids collapse; dedup keys on (doc_id, raw_id)
      // so a 64-bit fold collision keeps both documents (detectable)
      // instead of silently dropping one
      .dropDuplicates("doc_id", "raw_id")
    docs.write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/documents.parquet")
    bad.select(coalesce(col("_corrupt"), lit("missing text"))
        .as("bad_line"))
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/quarantine")
    val stored = spark.read
      .parquet(s"${task.sinkDir}/documents.parquet")
    JsonlSummary(stored.count(),
      spark.read.parquet(s"${task.sinkDir}/quarantine").count(),
      stored.filter(col("url").isNotNull).count())
  }

  /** Loader-layout task result: corpus size, the layouts written. */
  final case class LoaderSummary(nDocs: Long, nShards: Int,
      nWindows: Long, totalTokens: Long)

  /** Loader task (`extract_type=loader`): materialize the
    * training-loader layout for a corpus — the q115 shard-shuffle
    * manifest under `<sink>/shards` and the q111 packing-window
    * manifest under `<sink>/pack_windows`. Run it over a curation
    * task's kept output (or a raw corpus dir) to make it loader-ready
    * from the same INI surface as everything else.
    */
  def runLoader(spark: SparkSession, task: TaskConfig.Task)
      : LoaderSummary = {
    val docs = Tables.documents(spark, task.sourceDir)
    graft.operators.LoaderOps
      .shardShuffleOf(spark, docs, task.loaderShards)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/shards")
    graft.operators.PackingOps
      .packWindowsOf(spark, docs, task.loaderWindow)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/pack_windows")
    // summarize from the WRITTEN manifest (row-group metadata reads)
    val m = spark.read.parquet(s"${task.sinkDir}/pack_windows")
    val row = m.agg(count(lit(1)).as("n"),
      (max(col("last_win")) + 1).as("w"),
      sum(col("n_tokens")).as("t")).collect()(0)
    LoaderSummary(row.getLong(0), task.loaderShards,
      row.getLong(1), row.getLong(2))
  }

  /** Check task: per admitted table, compare source against the routed
    * sink output (the post-snapshot verification flow) and persist the
    * check-log artifacts (miss.log/diff.log/summary.log under
    * `<sinkDir>/checklog/<schema>.<tb>/`) that the revise task replays.
    *
    * One full-join pass per table: the non-OK subset (bounded by the
    * defect count, not the data size) is cached, artifacts and defect
    * counts both read it, and the OK count is derived as
    * `src_rows - miss - diff` instead of re-scanning the join.
    */
  def runCheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[(String, Map[String, Long])] =
    units(task).flatMap { case (schema, tb) =>
      checkTable(spark, task, schema, tb)
    }

  /** One check unit (None when the table has no key spec). */
  def checkTable(spark: SparkSession, task: TaskConfig.Task,
      schema: String, tb: String): Option[(String, Map[String, Long])] =
    task.keysByTable.get(tb).map { keys =>
        val ck = task.checker.filter(_.enable)
        val src0 = task.router.renameColumns(schema, tb,
          Tables.load(spark, task.sourceDir, tb))
        val (toSchema, toTb) = task.router.routeTable(schema, tb)
        val dst0 = spark.read.parquet(s"${task.sinkDir}/$toSchema.$toTb")
        // [checker] sample_rate: both sides gate on the same key hash
        // (checker_engine.rs:316-321 id_hash%100 < rate), so a sampled
        // key is either fully present or fully absent on both sides
        def sampled(df: org.apache.spark.sql.DataFrame)
            : org.apache.spark.sql.DataFrame =
          ck.flatMap(_.sampleRate) match {
            case Some(rate) if keys.size >= 2 =>
              df.filter(Checker.sampleFilter(
                Checker.arithKeyHash(col(keys.head), col(keys(1))),
                rate))
            case Some(rate) =>
              df.filter(Checker.sampleFilter(
                Checker.arithKeyHash(col(keys.head), lit(0)), rate))
            case None => df
          }
        val src = sampled(src0)
        val dst = sampled(dst0)
        val compareCols = src.columns.filter(dst.columns.contains)
          .filterNot(keys.contains).toSeq
        val checked = Checker.diff(src, dst, keys)
        val nonOk = checked
          .filter(col(Checker.StatusCol) =!= "OK").persist()
        try {
          val logDir = ck.map(_.checkLogDir).filter(_.nonEmpty)
            .map(d => s"$d/$toSchema.$toTb")
            .getOrElse(s"${task.sinkDir}/checklog/$toSchema.$toTb")
          CheckLogs.write(
            CheckLogs.toLogs(nonOk, schema, tb, keys, compareCols,
              outputFullRow = ck.exists(_.outputFullRow)),
            logDir,
            maxRows = ck.map(_.checkLogMaxRows)
              .getOrElse(Int.MaxValue),
            maxBytes = ck.map(c => CheckLogs.parseSize(
              c.checkLogFileSize)).getOrElse(Long.MaxValue))
          if (ck.exists(_.outputReviseSql))
            CheckLogs.writeReviseSql(nonOk,
              s"$toSchema.$toTb", keys, logDir): Unit
          val defects = nonOk.groupBy(Checker.StatusCol).count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
          val miss = defects.getOrElse("MISS", 0L)
          val diff = defects.getOrElse("DIFF", 0L)
          val orphan = defects.getOrElse("ORPHAN", 0L)
          val srcRows = src.count()
          val summary = spark.createDataFrame(Seq(
            (schema, tb, srcRows + orphan, miss, diff, orphan,
              miss + diff + orphan == 0)))
            .toDF("schema", "tb", "checked_count", "miss_count",
              "diff_count", "orphan_count", "is_consistent")
          CheckLogs.writeSummary(summary, logDir)
          tb -> (defects + ("OK" -> (srcRows - miss - diff)))
        } finally { nonOk.unpersist(); () }
      }

  /** `sink_type=sql` (sql_sinker.rs): render every admitted CDC event
    * as a literal, runnable SQL statement into `<sink>/sql.log`;
    * `[sinker] reverse=true` logs the UNDO stream instead (insert↔
    * delete, update swaps images). The capture decodes through the
    * production wire decoders (pgoutput or binlog by [extractor]
    * db_type). Returns the statement count.
    */
  def runSqlSink(spark: SparkSession, task: TaskConfig.Task): Long = {
    val capture = task.walCapture.getOrElse(task.sourceDir)
    val bytes = graft.infra.Fs.readAllBytes(capture)
    val events = task.dbType match {
      case "mysql" => graft.sources.MysqlBinlog.decodeFile(bytes,
        graft.infra.Fs.fileName(capture))
      case _ => graft.sources.PgOutput.decodeFile(bytes)
    }
    val dialect = task.sinkDbType match {
      case "pg" | "postgres" | "postgresql" =>
        graft.sinks.RdbQueryBuilder.Postgres
      case _ => graft.sinks.RdbQueryBuilder.MySql
    }
    val lines = events.iterator
      .filter(e => task.filter.allowTable(e.schema, e.tb) &&
        task.filter.allowEvent(e.rowType))
      .map(e => if (task.sink.sqlReverse) e.reverse else e)
      .map { e =>
        val (toSchema, toTb) = task.router.routeTable(e.schema, e.tb)
        def routed(img: Map[String, String]): Map[String, String] =
          img.map { case (c, v) =>
            task.router.routeColumn(e.schema, e.tb, c) -> v }
        // No configured id_cols for the table → key on the FULL
        // before-image (every column), never a single arbitrary
        // column: sql.log is documented as runnable as-is, and a
        // DELETE/UPDATE keyed on one non-unique column could touch
        // the wrong rows.
        val keys = task.keysByTable.getOrElse(e.tb,
          e.keyImage.keys.toSeq.sorted)
          .map(task.router.routeColumn(e.schema, e.tb, _))
        graft.sinks.RdbQueryBuilder.eventSql(dialect, toSchema, toTb,
          keys, e.rowType, routed(e.before), routed(e.after))
      }.toSeq
    graft.infra.Fs.mkdirs(task.sinkDir)
    graft.infra.Fs.writeString(s"${task.sinkDir}/sql.log",
      lines.mkString("", ";\n", if (lines.isEmpty) "" else ";\n"))
    lines.size.toLong
  }

  /** Pre-flight the task (reference dt-precheck before start_task). */
  def precheck(spark: SparkSession, task: TaskConfig.Task)
      : Seq[Precheck.CheckResult] = {
    val tables = task.filter.expand(catalog(task.sourceDir)).map(_._2)
    Precheck.runAll(spark, task.sourceDir, tables, task.keysByTable)
  }

  // ------------------------------------------------------------------
  // the reference's remaining ExtractType variants (config_enums.rs:
  // 42-61), each wired to its already-tested component

  /** `extract_type=check_log`: replay persisted check logs (a prior
    * check task's miss/diff artifacts under [extractor] check_log_dir)
    * into revise statements per table — the reference's
    * MysqlCheck/PgCheck extractors + `replay_diff_as_update`. Returns
    * (table, revise-statement count); statements land under
    * `<sink>/revise/<schema>.<tb>` for the applier.
    */
  def runCheckLogReplay(spark: SparkSession, task: TaskConfig.Task)
      : Seq[(String, Long)] = {
    val logRoot = task.checkLogDir.getOrElse(
      s"${task.sinkDir}/checklog")
    units(task).flatMap { case (schema, tb) =>
      val (toSchema, toTb) = task.router.routeTable(schema, tb)
      val dir = s"$logRoot/$toSchema.$toTb"
      if (!graft.infra.Fs.isDirectory(dir)) None
      else task.keysByTable.get(tb).map { keys =>
        val logs = CheckLogs.read(spark, dir)
        val revise = CheckLogs.reviseFromLogs(logs,
          s"$toSchema.$toTb", keys)
        val out = s"${task.sinkDir}/revise/$toSchema.$toTb"
        revise.write.mode(SaveMode.Overwrite).parquet(out)
        tb -> spark.read.parquet(out).count()
      }
    }
  }

  /** `extract_type=struct`: drive a structure migration from a catalog
    * fixture — parquet files under [extractor] catalog_dir standing in
    * for the live engine's information_schema/pg_catalog (a file named
    * `<db>.<table>.parquet` registers qualified, `<table>.parquet`
    * as a temp view), through the synthesized catalog SQL
    * ([[graft.struct.StructFetcher]]) into DDL rendered for the sink
    * dialect. Statements are written per table under `<sink>/structs/`.
    */
  def runStruct(spark: SparkSession, task: TaskConfig.Task)
      : Seq[(String, Seq[String])] = {
    import graft.struct.{StructFetcher, StructMigrator}
    val dir = task.catalogDir.getOrElse(task.sourceDir)
    graft.infra.Fs.listNames(dir)
      .filter(_.endsWith(".parquet")).sorted
      .foreach { name =>
        val base = name.stripSuffix(".parquet")
        val df = spark.read.parquet(s"$dir/$name")
        if (base.contains(".")) {
          val Array(db, tb) = base.split("\\.", 2)
          spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
          spark.sql(s"DROP TABLE IF EXISTS $db.$tb")
          df.write.saveAsTable(s"$db.$tb")
        } else df.createOrReplaceTempView(base)
      }
    val exec = new StructFetcher.CatalogExec {
      def query(sql: String): Seq[Map[String, String]] = {
        // the one engine-ism Spark SQL can't parse (PG's cast)
        val df = spark.sql(sql.replace("con.contype::text",
          "con.contype"))
        val cols = df.columns
        df.collect().toSeq.map { row =>
          cols.zipWithIndex.map { case (c, i) =>
            c -> (if (row.isNullAt(i)) "" else row.get(i).toString)
          }.toMap
        }
      }
    }
    val schemas = units(task).map(_._1).toSet ++
      task.filter.doSchemas.toSet
    val dialect = task.sinkDbType match {
      case "mysql" => StructMigrator.MySqlDialect
      case "pg" => StructMigrator.PostgresDialect
      case "starrocks" | "doris" => StructMigrator.StarRocksDialect
      case "clickhouse" => StructMigrator.ClickHouseDialect
      case _ => StructMigrator.MySqlDialect
    }
    val out = units(task).flatMap { case (schema, tb) =>
      val fetched: Option[StructMigrator.TableDef] =
        task.dbType match {
          case "pg" =>
            new StructFetcher.PgFetcher(exec, schemas)
              .fetchTable(schema, tb).map(_._1)
          case _ =>
            new StructFetcher.MySqlFetcher(exec, schemas)
              .fetchTable(schema, tb)
        }
      fetched.map { t =>
        // an unset do_structures means migrate everything (the
        // reference's default), not nothing
        val structFilter =
          if (task.filter.doStructures.isEmpty)
            task.filter.copy(doStructures = Set("*"))
          else task.filter
        val stmts = StructMigrator.migrate(t, dialect, structFilter)
        s"$schema.$tb" -> stmts
      }
    }
    val sqlDir = s"${task.sinkDir}/structs"
    graft.infra.Fs.mkdirs(sqlDir)
    out.foreach { case (name, stmts) =>
      graft.infra.Fs.writeString(s"$sqlDir/$name.sql",
        stmts.mkString(";\n") + ";\n")
    }
    out
  }

  /** `extract_type=snapshot_file`: parse a Redis RDB dump file
    * ([extractor] file_path) into rows and land them under the sink —
    * ExtractorConfig::RedisSnapshotFile. The binary parse is
    * inherently serial (one dump stream), exactly like the reference;
    * everything after the parse is a normal distributed frame.
    */
  def runSnapshotFile(spark: SparkSession, task: TaskConfig.Task)
      : TableResult = {
    val bytes = graft.infra.Fs.readAllBytes(task.filePath.get)
    val entries = graft.sources.RedisRdb.parse(bytes)
    import spark.implicits._
    val df = entries.map(e => (e.db, e.key, e.valueType, e.field,
        e.value, e.expireMs))
      .toDF("db", "key", "value_type", "field", "value", "expire_ms")
    val out = s"${task.sinkDir}/redis.snapshot"
    df.write.mode(SaveMode.Overwrite).parquet(out)
    TableResult("redis", "snapshot",
      spark.read.parquet(out).count(), "redis.snapshot")
  }

  /** `extract_type=scan`: keyspace statistics over a captured keyspace
    * ([extractor] keyspace_fixture; statistic_type hot_key|big_key,
    * scan_count) — ExtractorConfig::RedisScan through the exact
    * command loop, reported as the bounded top-k frame.
    */
  def runScan(spark: SparkSession, task: TaskConfig.Task,
      topK: Int = 100): DataFrame = {
    import graft.sources.RedisScanStats
    val text = graft.infra.Fs.readString(
      task.keyspaceFixture.getOrElse(task.sourceDir))
    val conn = RedisScanStats.fixtureConn(text)
    val mode = task.statisticType match {
      case "big_key" => RedisScanStats.BigKey
      case _ => RedisScanStats.HotKey
    }
    val stats0 = RedisScanStats.drive(conn, mode, task.scanCount)
    // [sinker] data_size_threshold / freq_threshold: entries below
    // the gate never reach the report (redis_statistic_sinker.rs:42,55)
    val stats = mode match {
      case RedisScanStats.BigKey =>
        stats0.filter(_.dataSize >= task.sink.dataSizeThreshold)
      case _ => stats0.filter(_.freq >= task.sink.freqThreshold)
    }
    val report = mode match {
      case RedisScanStats.BigKey =>
        RedisScanStats.bigKeyReport(spark, stats, topK)
      case _ => RedisScanStats.hotKeyReport(spark, stats, topK)
    }
    val outDir = task.sink.statisticLogDir.getOrElse(task.sinkDir)
    report.write.mode(SaveMode.Overwrite)
      .parquet(s"$outDir/scan.${task.statisticType}")
    spark.read.parquet(s"$outDir/scan.${task.statisticType}")
  }

  /** `extract_type=reshard`: the slot-move plan between [extractor]
    * slots_before and slots_after — ExtractorConfig::RedisReshard.
    * When file_path names an RDB dump, the plan is joined with the
    * dump's keys into per-key moves.
    */
  def runReshard(spark: SparkSession, task: TaskConfig.Task)
      : DataFrame = {
    import graft.sinks.RedisReshard
    val moves = RedisReshard.plan(task.slotsBefore, task.slotsAfter)
    import spark.implicits._
    val planDf = moves.map(m => (m.fromSlot, m.toSlot, m.fromNode,
      m.toNode)).toDF("from_slot", "to_slot", "from_node", "to_node")
    planDf.write.mode(SaveMode.Overwrite)
      .parquet(s"${task.sinkDir}/reshard.plan")
    task.filePath.foreach { fp =>
      val bytes = graft.infra.Fs.readAllBytes(fp)
      val keys = graft.sources.RedisRdb.parse(bytes)
        .map(_.key).distinct.toDF("key")
      RedisReshard.keyMoves(keys, "key", task.slotsBefore,
          task.slotsAfter)
        .write.mode(SaveMode.Overwrite)
        .parquet(s"${task.sinkDir}/reshard.keys")
    }
    spark.read.parquet(s"${task.sinkDir}/reshard.plan")
  }

  /** `extract_type=foxlake_s3`: read staged lake batches back through
    * the meta-file protocol ([extractor] s3_root_dir as the staging
    * root) and land them under the sink — ExtractorConfig::FoxlakeS3.
    */
  def runFoxlakeS3(spark: SparkSession, task: TaskConfig.Task)
      : Seq[TableResult] = {
    val root = task.s3RootDir.getOrElse(task.sourceDir)
    units(task).flatMap { case (schema, tb) =>
      val (df, _, _) = graft.sources.LakeSource.pollAndRead(spark,
        root, schema, tb, None)
      if (df.isEmpty) None
      else {
        val (toSchema, toTb) = task.router.routeTable(schema, tb)
        val out = s"${task.sinkDir}/$toSchema.$toTb"
        df.write.mode(SaveMode.Overwrite).parquet(out)
        Some(TableResult(schema, tb,
          spark.read.parquet(out).count(), s"$toSchema.$toTb"))
      }
    }
  }
}
