package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.meta.{AlterParser, DclParser, DdlParser, MetaManager}
import graft.operators.Router

/** DDL-aware micro-batch processing — the reference's DDL barrier
  * (/root/reference/dt-pipeline/src/base_pipeline.rs:268-305 +
  * base_extractor.rs:204-206): DDL forms its own barrier inside a batch;
  * statements apply serially on the driver, the metadata cache refreshes,
  * and only then does DML of the batch flow to the sinkers.
  *
  * Spark shape: each micro-batch is split on an `is_ddl` column; DDL rows
  * collect to the driver (a batch contains at most a handful), parse,
  * route, and execute via the pluggable DdlSink before the DML applier
  * runs. Streaming schemas are static per query, so in-flight schema
  * changes affect the NEXT query restart — the same restart-on-DDL
  * contract the reference documents for heterogeneous sinks.
  */
object DdlAwarePipeline {

  trait DdlSink extends Serializable {
    def execute(ddl: String): Unit
  }

  final case class BatchReport(batchId: Long, ddlApplied: Seq[String],
      dmlRows: Long, dclApplied: Seq[String] = Nil,
      // statements that failed under conflictPolicy=ignore, with the
      // sink's error text (the reference's log_error line as data)
      ddlErrors: Seq[(String, String)] = Nil)

  /** Task-driven form: the DDL conflict policy comes from the INI —
    * `[meta_center] ddl_conflict_policy` when a meta center is
    * configured (it governs replaying captured DDL into the external
    * meta store), else `[sinker] conflict_policy` — so wiring the
    * component into a task needs no manual policy plumbing.
    */
  def processForTask(task: graft.config.TaskConfig.Task,
      changes: DataFrame, meta: MetaManager, ddlSink: DdlSink,
      onBatch: (DataFrame, Long) => Unit,
      report: BatchReport => Unit = _ => (),
      defaultDb: String = ""): DataStreamWriter[Row] =
    // task.filter passes through UNCHANGED: the reference's DDL/DCL
    // replication is opt-in (filter_config.rs do_ddls/do_dcls are
    // optional; an empty set drops all DDL/DCL — the rdb_filter
    // default NameFilter.allowDdl documents). Rewriting empty→"*"
    // here would replay ALL DDL for unconfigured tasks and leave no
    // way to express "drop all DDL" through this entry point.
    process(changes, task.router, defaultDb, meta, ddlSink, onBatch,
      report, filter = task.filter,
      conflictPolicy = task.metaCenter
        .map(_.ddlConflictPolicy).getOrElse(task.conflictPolicy))

  /** Process a mixed DML/DDL stream. `onBatch` receives only DML rows,
    * after the batch's DDL (if any) has been applied and the meta cache
    * invalidated.
    */
  def process(changes: DataFrame, router: Router, defaultDb: String,
      meta: MetaManager, ddlSink: DdlSink,
      onBatch: (DataFrame, Long) => Unit,
      report: BatchReport => Unit = _ => (),
      // DDL/DCL gates (reference do_ddls/do_dcls, deny-by-default in
      // config; the programmatic default admits all so existing
      // pipelines that never configured a filter keep replicating)
      filter: graft.operators.NameFilter =
        graft.operators.NameFilter(doDdls = Set("*"),
          doDcls = Set("*")),
      // [meta_center] ddl_conflict_policy (meta_center_config.rs):
      // interrupt (default) fails the stream on a sink DDL error;
      // ignore records it and keeps the batch flowing. On an ignored
      // failure the cached schema is INVALIDATED, not evolved — the
      // sink didn't change, so the next meta fetch must re-read its
      // actual state rather than trust the statement.
      conflictPolicy: graft.struct.StructApplier.ConflictPolicy =
        graft.struct.StructApplier.Interrupt)
      : DataStreamWriter[Row] =
    // default micro-batch trigger: callers chain .trigger(...) as needed
    // (AvailableNow would snapshot offsets at start and miss later data)
    changes.writeStream
      .outputMode("update")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        // barrier lane: DDL + DCL rows apply serially in arrival order,
        // meta invalidates, THEN the batch's DML flows (reference
        // base_pipeline.rs barrier + mysql_sinker.rs:135-152 sink_dcl —
        // DCL rides the same serial lane and replays as rendered SQL)
        val barrierRows = batch
          .filter(col("row_type").isin("ddl", "dcl"))
          .select(col("row_type"), col("ddl_text")).collect()
          .map(r => (r.getString(0), r.getString(1))).toSeq
        val appliedDdl = Seq.newBuilder[String]
        val appliedDcl = Seq.newBuilder[String]
        val ddlErrors = Seq.newBuilder[(String, String)]
        import graft.struct.StructApplier.{Ignore, Interrupt}
        // true when the statement executed; false when it failed and
        // the policy swallowed the error (meta must NOT evolve then)
        def tryExecute(sql: String): Boolean =
          try { ddlSink.execute(sql); true }
          catch {
            case e: Exception => conflictPolicy match {
              case Interrupt => throw e
              case Ignore => ddlErrors += sql -> e.getMessage; false
            }
          }
        barrierRows.foreach {
          case ("dcl", sql) =>
            val stmt = DclParser.parse(sql)
            if (filter.allowDcl(stmt.dclType)) {
              val routed = DclParser.route(stmt, router)
              if (tryExecute(routed.render))
                appliedDcl += routed.render
            }
          case (_, sql) =>
            // Mongo change-stream DDL events arrive as the event's
            // extended-JSON doc; SQL engines send statement text
            // (reference: DdlData per db_type, routed identically)
            val stmts =
              if (sql.trim.startsWith("{"))
                graft.meta.MongoDdl.changeStreamEventToDdl(sql).toSeq
              else DdlParser.parse(sql)
            stmts.filter { stmt =>
              val (s, t) = DdlParser.target(stmt, defaultDb)
              filter.allowDdl(DdlParser.ddlType(stmt), s, t)
            }.foreach { stmt =>
              val routed = DdlParser.route(stmt, router, defaultDb)
              val landed = tryExecute(routed.render)
              if (!landed) {
                // ignored failure: the sink is unchanged, so re-read
                // its actual schema next time instead of evolving the
                // cache from a statement that never landed
                val (s, t) = DdlParser.target(stmt, defaultDb)
                if (t.nonEmpty) meta.invalidate(s, t)
                else meta.invalidateAll()
              } else stmt match {
                case a: DdlParser.AlterTable =>
                  // typed actions evolve the cached StructType in
                  // place; evolve() itself invalidates when out of
                  // model
                  meta.evolve(a.db.getOrElse(defaultDb), a.tb,
                    AlterParser.parse(a.alteration)): Unit
                case DdlParser.DropTable(db, tb, _) =>
                  meta.invalidate(db.getOrElse(defaultDb), tb)
                case DdlParser.RenameTable(fdb, ftb, _, _) =>
                  meta.invalidate(fdb.getOrElse(defaultDb), ftb)
                case a: DdlParser.AlterTableRename =>
                  meta.invalidate(a.db.getOrElse(defaultDb), a.tb)
                case a: DdlParser.AlterTableSetSchema =>
                  meta.invalidate(a.db.getOrElse(defaultDb), a.tb)
                case t: DdlParser.TruncateTable =>
                  meta.invalidate(t.db.getOrElse(defaultDb), t.tb)
                case DdlParser.MongoCommand(_, sc, tb, _, _, _)
                    if tb.nonEmpty =>
                  meta.invalidate(sc, tb)
                case _ => meta.invalidateAll()
              }
              if (landed) appliedDdl += routed.render
            }
        }
        val dml = batch.filter(!col("row_type").isin("ddl", "dcl"))
        onBatch(dml, batchId)
        report(BatchReport(batchId, appliedDdl.result(), dml.count(),
          appliedDcl.result(), ddlErrors.result()))
        ()
      }
}
