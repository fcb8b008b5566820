package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._

import graft.operators.Compaction

/** Micro-batch apply orchestration — the reference's merge_parallelizer
  * (/root/reference/dt-parallelizer/src/merge_parallelizer.rs:54-242):
  * per compacted batch, deletes sink first, then upserts, then the
  * serial (unmergeable) lane in original order; batches split to
  * ≤ batchSize rows; a failed batch falls back to row-by-row apply for
  * error isolation (mysql_sinker.rs:344-354).
  *
  * Execution is distributed: `applyCompacted` runs the planner inside
  * `foreachPartition` (each partition owns a connection), with the serial
  * lane coalesced to one ordered partition. The planner itself is pure
  * (Iterator[Row] → statement batches) so semantics are testable without
  * a database; `StatementSink` is a JDBC connection in production.
  */
object Applier {

  /** One executable unit: a statement shape + its parameter rows.
    * `sqlForRows` rebuilds the statement for a different row count —
    * the single-row retry in [[applyAll]] needs a 1-row statement, not
    * the original N-tuple VALUES/IN shape whose placeholder count no
    * longer matches. Absent (e.g. hand-built batches) the sql is
    * assumed row-count-independent.
    */
  final case class StatementBatch(sql: String, rows: Seq[Seq[Any]],
      sqlForRows: Option[Int => String] = None) {
    def forSingleRow(r: Seq[Any]): StatementBatch =
      StatementBatch(sqlForRows.fold(sql)(f => f(1)), Seq(r), sqlForRows)
  }

  /** Where statements go (a JDBC connection in production, a buffer in
    * tests). Implementations must be serializable: one instance is built
    * per partition via the factory passed to [[applyCompacted]].
    */
  trait StatementSink {
    /** Execute one batch; throw to trigger the serial fallback. */
    def execute(batch: StatementBatch): Unit
  }

  private def vals(r: Row, cs: Seq[String]): Seq[Any] =
    cs.map(c => r.getAs[Any](c))

  /** Pure streaming planner for one partition's mergeable rows: a
    * single pass over the iterator, buffering at most `batchSize` rows
    * per action lane before emitting a statement batch — never
    * materializing the partition (a fat partition at 100× scale must
    * not OOM the executor; peak held rows ≤ 2·batchSize).
    *
    * Lane ordering: a lane flushes when full; on input exhaustion
    * remaining deletes flush before remaining upserts. Compaction
    * guarantees each key appears at most once per micro-batch, so
    * cross-lane order between *different* keys is immaterial — the
    * reference's global deletes-then-inserts ordering
    * (merge_parallelizer.rs:54-242) only matters for same-key pairs,
    * which cannot occur post-compaction.
    */
  /** Wrap a sink factory so every new sink (one per connection /
    * partition) first executes the session-init statements —
    * `RdbQueryBuilder.connSettings` (FK checks off, isolation), the
    * reference's after-connect hook on its sqlx pools.
    */
  def withSessionInit(factory: () => StatementSink,
      init: Seq[String]): () => StatementSink =
    if (init.isEmpty) factory
    else () => {
      val s = factory()
      init.foreach(sql => s.execute(StatementBatch(sql, Nil)))
      s
    }

  def planMergeable(dialect: RdbQueryBuilder.Dialect, table: String,
      rows: Iterator[Row], keys: Seq[String], cols: Seq[String],
      batchSize: Int = 1000,
      // [sinker] replace=false (sinker_config.rs REPLACE): upsert
      // lanes degrade to plain INSERT — append-only flows where a
      // duplicate key should be an error, not a silent overwrite
      insertOnly: Boolean = false): Iterator[StatementBatch] = {
    val dels = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val ups = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    def flushDels(): StatementBatch = {
      val b = StatementBatch(
        RdbQueryBuilder.batchDelete(dialect, table, keys, dels.size),
        dels.toSeq,
        Some(n => RdbQueryBuilder.batchDelete(dialect, table, keys, n)))
      dels.clear(); b
    }
    def flushUps(): StatementBatch = {
      def sql(n: Int): String =
        if (insertOnly) RdbQueryBuilder.batchInsert(dialect, table,
          cols, n)
        else dialect.upsert(table, cols, keys, n)
      val b = StatementBatch(sql(ups.size), ups.toSeq, Some(sql))
      ups.clear(); b
    }
    new Iterator[StatementBatch] {
      override def hasNext: Boolean =
        rows.hasNext || dels.nonEmpty || ups.nonEmpty
      override def next(): StatementBatch = {
        while (rows.hasNext && dels.size < batchSize &&
            ups.size < batchSize) {
          val r = rows.next()
          if (r.getAs[String](Compaction.ActionCol) == Compaction.Delete)
            dels += vals(r, keys)
          else ups += vals(r, cols)
        }
        if (dels.size >= batchSize) flushDels()
        else if (ups.size >= batchSize) flushUps()
        else if (dels.nonEmpty) flushDels() // input drained: deletes first
        else flushUps()
      }
    }
  }

  /** Pure planner for the serial lane (NULL-keyed rows): one statement
    * per row, original order. Deletes match on the FULL row with
    * null-safe equality — batch delete-by-key would silently drop
    * NULL-keyed rows (reference row_data.rs:273-281).
    */
  def planSerial(dialect: RdbQueryBuilder.Dialect, table: String,
      rows: Iterator[Row], cols: Seq[String],
      rowTypeCol: String = "row_type"): Iterator[StatementBatch] =
    rows.map { r =>
      r.getAs[String](rowTypeCol) match {
        case "delete" =>
          StatementBatch(
            s"DELETE FROM $table WHERE " +
              cols.map(c => s"${dialect.quote(c)}<=>?").mkString(" AND "),
            Seq(vals(r, cols)))
        case _ =>
          StatementBatch(
            RdbQueryBuilder.batchInsert(dialect, table, cols, 1),
            Seq(vals(r, cols)))
      }
    }

  /** Distributed apply of a compacted micro-batch (carries
    * Compaction.ActionCol). Mergeable lanes apply per partition in
    * parallel; the serial lane is coalesced to a single ordered
    * partition and applied last.
    */
  def applyCompacted(dialect: RdbQueryBuilder.Dialect, table: String,
      compacted: DataFrame, keys: Seq[String], cols: Seq[String],
      orderCols: Seq[String], sinkFactory: () => StatementSink,
      batchSize: Int = 1000, insertOnly: Boolean = false): Unit = {
    val selectCols = (cols ++ Seq(Compaction.ActionCol, "row_type"))
      .distinct.map(col)
    compacted.filter(col(Compaction.ActionCol) =!= Compaction.Serial)
      .select(selectCols: _*)
      .foreachPartition { it: Iterator[Row] =>
        val sink = sinkFactory()
        applyAll(sink,
          planMergeable(dialect, table, it, keys, cols, batchSize,
            insertOnly))
        ()
      }
    compacted.filter(col(Compaction.ActionCol) === Compaction.Serial)
      .orderBy(orderCols.map(col): _*)
      .coalesce(1)
      .select(selectCols: _*)
      .foreachPartition { it: Iterator[Row] =>
        val sink = sinkFactory()
        applyAll(sink, planSerial(dialect, table, it, cols))
        ()
      }
  }

  /** Multi-table fan-out apply — the reference's table parallelizer
    * (`/root/reference/dt-parallelizer/src/table_parallelizer.rs:22-80`:
    * partition DML by full table name, sink each table's rows IN ORDER,
    * tables in parallel). Spark shape: repartition by (schema, tb) so a
    * table's rows land on one partition (tables spread across
    * executors), sort within partitions by table then event order, and
    * stream one pass per partition — consecutive same-table runs batch
    * into per-table statements, a table switch flushes. Peak held rows
    * ≤ batchSize; within-table order is exactly the input order, the
    * reference's contract.
    */
  def applyPerTable(dialect: RdbQueryBuilder.Dialect,
      changes: DataFrame, cols: Seq[String], orderCols: Seq[String],
      sinkFactory: () => StatementSink, batchSize: Int = 1000): Unit = {
    val selectCols = (Seq("schema", "tb", "row_type") ++ cols)
      .distinct.map(col)
    changes
      .repartition(col("schema"), col("tb"))
      .sortWithinPartitions(
        (Seq(col("schema"), col("tb")) ++ orderCols.map(col)): _*)
      .select(selectCols: _*)
      .foreachPartition { it: Iterator[Row] =>
        val sink = sinkFactory()
        var table: String = null
        val buf = scala.collection.mutable.ArrayBuffer[Row]()
        def flush(): Unit = if (buf.nonEmpty) {
          applyAll(sink, planSerial(dialect, table, buf.iterator, cols))
          buf.clear()
        }
        it.foreach { r =>
          val t = dialect.quote(r.getAs[String]("schema")) + "." +
            dialect.quote(r.getAs[String]("tb"))
          if (t != table) { flush(); table = t }
          buf += r
          if (buf.size >= batchSize) flush()
        }
        flush()
      }
  }

  /** Bulk snapshot apply with chunk-rebalanced write partitions — the
    * reference's snapshot parallelizer spine
    * (`/root/reference/dt-parallelizer/src/snapshot_parallelizer.rs:29-50`:
    * drain → ChunkPartitioner.partition_dml → sinkers drain the
    * partition queue). Spark shape: the per-chunk summary plans the
    * write queue on the driver ([[graft.operators.ChunkRebalancer]]),
    * rows pick their planned partition from the broadcast slice table,
    * and `repartitionByRange(partition_id)` makes task index = queue
    * position — Spark schedules tasks in index order, so largest-first
    * plans drain largest-first exactly like the reference's dynamic
    * sinker queue. Rows are snapshot inserts; each task streams
    * multi-row batched INSERTs per table run.
    */
  def applySnapshot(dialect: RdbQueryBuilder.Dialect, changes: DataFrame,
      cols: Seq[String], orderCol: org.apache.spark.sql.Column,
      targetPartitions: Int, cfg: graft.operators.ChunkRebalancer.Config,
      sinkFactory: () => StatementSink, batchSize: Int = 1000): Unit = {
    import graft.operators.ChunkRebalancer
    val groups = ChunkRebalancer.summarize(changes)
    val slices = ChunkRebalancer.plan(groups, targetPartitions, cfg)
    if (slices.isEmpty) return
    val nParts = slices.map(_.partitionId).max + 1
    val selectCols =
      (Seq("partition_id", "schema", "tb") ++ cols).distinct.map(col)
    ChunkRebalancer.assignWith(changes, slices, orderCol)
      .select(selectCols: _*)
      .repartitionByRange(nParts, col("partition_id"))
      .sortWithinPartitions(col("partition_id"), col("schema"),
        col("tb"), orderCol)
      .foreachPartition { it: Iterator[Row] =>
        val sink = sinkFactory()
        var table: String = null
        val buf = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
        def flush(): Unit = if (buf.nonEmpty) {
          applyAll(sink, Iterator(StatementBatch(
            RdbQueryBuilder.batchInsert(dialect, table, cols, buf.size),
            buf.toSeq,
            Some(n => RdbQueryBuilder.batchInsert(dialect, table, cols,
              n)))))
          buf.clear()
        }
        it.foreach { r =>
          val t = dialect.quote(r.getAs[String]("schema")) + "." +
            dialect.quote(r.getAs[String]("tb"))
          if (t != table) { flush(); table = t }
          buf += vals(r, cols)
          if (buf.size >= batchSize) flush()
        }
        flush()
      }
  }

  /** Execute with error isolation: a failing batch is retried row by row
    * so one poison row doesn't kill the batch.
    */
  def applyAll(sink: StatementSink, batches: IterableOnce[StatementBatch])
      : AppliedStats = {
    var ok = 0L
    var isolated = 0L
    var failed = 0L
    batches.iterator.foreach { b =>
      try { sink.execute(b); ok += b.rows.size }
      catch {
        case _: Exception =>
          b.rows.foreach { r =>
            try { sink.execute(b.forSingleRow(r)); isolated += 1 }
            catch { case _: Exception => failed += 1 }
          }
      }
    }
    AppliedStats(ok, isolated, failed)
  }

  final case class AppliedStats(batched: Long, isolatedOk: Long,
      failedRows: Long)
}
