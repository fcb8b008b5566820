package graft

import graft.operators.Compaction
import graft.sinks.{Applier, RdbQueryBuilder}

/** Effectively-once semantics: streaming restarts replay micro-batches
  * (at-least-once delivery), so the applier's statement mix must be
  * IDEMPOTENT — applying the same compacted batch twice leaves the sink
  * in the same state. This drives applyCompacted into a stateful
  * key-value "table" twice and asserts convergence (the reference's
  * replace/upsert + delete-by-key contract).
  */
class IdempotentApplySpec extends SparkSuite {
  import spark.implicits._

  test("replaying a compacted micro-batch converges to the same state") {
    val changes = Seq(
      (Some(1L), 1L, "insert", "a"),
      (Some(2L), 2L, "insert", "b"),
      (Some(1L), 3L, "update", "a2"),
      (Some(2L), 4L, "delete", ""),
      (Some(3L), 5L, "insert", "c"))
      .toDF("k", "seq", "row_type", "v")
    val compacted = Compaction.compact(changes, Seq("k"), Seq("seq"),
      org.apache.spark.sql.functions.col("row_type"))

    val state = IdempotentApplySpec.shared
    state.synchronized(state.clear())
    def applyOnce(): Map[String, Seq[Any]] = {
      Applier.applyCompacted(RdbQueryBuilder.MySql, "t", compacted,
        Seq("k"), Seq("k", "v"), Seq("seq"),
        () => IdempotentApplySpec.TableSink)
      state.synchronized(state.toMap)
    }

    val after1 = applyOnce()
    assert(after1.keySet == Set("1", "3")) // 2 deleted, 1 upserted
    assert(after1("1")(1) == "a2")
    val after2 = applyOnce() // the replay
    assert(after2 == after1, "replay must be a no-op on final state")
  }

  test("poison rows do not break replay idempotence") {
    val state = IdempotentApplySpec.shared
    state.synchronized(state.clear())
    val sink = new Applier.StatementSink {
      override def execute(b: Applier.StatementBatch): Unit = {
        if (b.rows.exists(_.exists(v => v != null &&
          v.toString.contains("poison"))))
          throw new RuntimeException("bad row")
        state.synchronized(
          b.rows.foreach(r => state.update(r.head.toString, r)))
      }
    }
    val batch = Applier.StatementBatch("REPLACE", Seq(
      Seq("1", "ok"), Seq("2", "poison"), Seq("3", "ok2")))
    val s1 = Applier.applyAll(sink, Seq(batch))
    val snap1 = state.synchronized(state.toMap)
    val s2 = Applier.applyAll(sink, Seq(batch))
    assert(state.synchronized(state.toMap) == snap1)
    assert(s1.isolatedOk == 2 && s1.failedRows == 1)
    assert(s2.isolatedOk == 2 && s2.failedRows == 1)
  }
  test("single-row retry rebuilds a 1-row statement shape") {
    // A shape-checking sink: placeholder count must equal rows × arity,
    // like a real JDBC prepared statement would enforce.
    val applied = scala.collection.mutable.ArrayBuffer[Seq[Any]]()
    val sink = new Applier.StatementSink {
      override def execute(b: Applier.StatementBatch): Unit = {
        val placeholders = b.sql.count(_ == '?')
        require(placeholders == b.rows.map(_.size).sum,
          s"placeholder mismatch: $placeholders vs rows ${b.rows}")
        if (b.rows.exists(_.contains("poison")))
          throw new RuntimeException("bad row")
        applied ++= b.rows
      }
    }
    val df = Seq(
      (1L, "a", "upsert", "insert"),
      (2L, "poison", "upsert", "insert"),
      (3L, "c", "upsert", "insert"))
      .toDF("k", "v", Compaction.ActionCol, "row_type")
    val batches = Applier.planMergeable(RdbQueryBuilder.MySql, "t",
      df.collect().iterator, Seq("k"), Seq("k", "v"), batchSize = 10)
    val stats = Applier.applyAll(sink, batches)
    // batch of 3 fails on the poison row; 1-row retries succeed for the
    // two clean rows BECAUSE the retry SQL is rebuilt with 1-row arity
    assert(stats.isolatedOk == 2 && stats.failedRows == 1)
    assert(applied.map(_.last).toSet == Set("a", "c"))
  }
}

object IdempotentApplySpec {
  // shared across executor threads in local mode for foreachPartition
  val shared: scala.collection.mutable.Map[String, Seq[Any]] =
    scala.collection.mutable.Map.empty

  /** Interprets the MySQL statement shapes against the shared in-memory
    * table keyed by the first projected column.
    */
  object TableSink extends Applier.StatementSink with Serializable {
    override def execute(b: Applier.StatementBatch): Unit =
      shared.synchronized {
        if (b.sql.startsWith("DELETE")) // delete by key (or full row)
          b.rows.foreach(r => shared.remove(r.head.toString): Unit)
        else // REPLACE / INSERT: upsert by key
          b.rows.foreach(r => shared.update(r.head.toString, r))
      }
  }
}
