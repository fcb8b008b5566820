package graft.sinks

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField,
  StructType}

import graft.infra.Fs

/** The live-CDC landed-table layout: an LSM-style parquet table whose
  * per-micro-batch write cost is O(batch), not O(table).
  *
  * Layout under one table dir:
  * {{{
  *   <table>/part-*.parquet        flat PUBLISHED snapshot (plain
  *                                 parquet — what external readers and
  *                                 the drain-once contract see; derived
  *                                 data, refreshed at finalize)
  *   <table>/_delta/d<NNNNNNNN>/   one compacted delta per micro-batch
  *                                 (deterministic name = batch id, so a
  *                                 checkpoint-replayed batch OVERWRITES
  *                                 instead of duplicating)
  *   <table>/_base-<NNNNNNNN>/     committed merged state up to batch N
  *                                 (commit = the _stage→_base dir
  *                                 RENAME; readers take the max N)
  * }}}
  *
  * All bookkeeping dirs are underscore-prefixed, so
  * `spark.read.parquet(<table>)` sees ONLY the published flat files —
  * the external contract stays "a plain parquet table".
  *
  * Why: the previous lander read the FULL landed state every trigger,
  * unioned the batch, and rewrote everything — per-trigger work
  * O(state), cumulative write volume quadratic in table size, and the
  * delete-then-rename swap left a no-table window a crash could
  * freeze. Here a trigger writes one bounded delta; merges run on a
  * cadence (and at finalize) through a staged dir whose RENAME is the
  * atomic commit — a crash at ANY point leaves the previous committed
  * state readable (the same stage+commit discipline as LakeSink's meta
  * protocol, reference `foxlake_pusher.rs`/`foxlake_merger.rs`).
  *
  * Row schema carried throughout: (bseq, seq, row_type, key, payload)
  * — `bseq` is the writing batch id, so (bseq, seq) totally orders
  * rows across batches even if per-segment seqs were reused; deletes
  * ride as tombstone rows until a merge folds them away.
  */
object LandedTable {

  val Schema: StructType = StructType(Seq(
    StructField("bseq", LongType),
    StructField("seq", LongType),
    StructField("row_type", StringType),
    StructField("key", StringType),
    StructField("payload", StringType)))

  private val BaseRe = """^_base-(\d{8,})$""".r
  private val DeltaRe = """^d(\d{8,})$""".r

  private def deltaRoot(table: String) = s"$table/_delta"
  private def deltaDir(table: String, batchId: Long) =
    f"${deltaRoot(table)}/d$batchId%08d"
  private def baseDir(table: String, batchId: Long) =
    f"$table/_base-$batchId%08d"

  /** Write one micro-batch's compacted rows. O(batch) — the only work
    * a steady-state trigger does.
    */
  def writeDelta(delta: DataFrame, table: String,
      batchId: Long): Unit =
    delta.write.mode(SaveMode.Overwrite)
      .parquet(deltaDir(table, batchId))

  /** (maxCommittedBatchId, path) of the newest committed base. */
  def committedBase(table: String): Option[(Long, String)] =
    Fs.listNames(table).collect {
      case n @ BaseRe(id) => (id.toLong, s"$table/$n")
    }.sortBy(_._1).lastOption

  def deltaIds(table: String): Seq[Long] =
    Fs.listNames(deltaRoot(table)).collect {
      case DeltaRe(id) => id.toLong
    }.sorted

  /** The committed state: newest base ∪ newer deltas, raw (tombstones
    * included). Uncommitted stages and already-merged deltas are
    * invisible by construction.
    */
  private def rawState(spark: SparkSession, table: String): DataFrame = {
    val base = committedBase(table)
    val newer = deltaIds(table).filter(id => base.forall(_._1 < id))
      .map(id => deltaDir(table, id))
    val paths = base.map(_._2).toSeq ++ newer
    if (paths.isEmpty)
      spark.createDataFrame(spark.sparkContext
        .emptyRDD[org.apache.spark.sql.Row], Schema)
    else spark.read.schema(Schema).parquet(paths: _*)
  }

  /** The compacted live state (what the table MEANS right now):
    * last-writer-wins per key by (bseq, seq), tombstones dropped.
    * Resident-mode monitors read this; external batch readers read the
    * published flat files instead.
    */
  def read(spark: SparkSession, table: String): DataFrame = {
    import graft.operators.Compaction
    Compaction.compact(rawState(spark, table), Seq("key"),
      Seq("bseq", "seq"), col("row_type"))
      .filter(col(Compaction.ActionCol) =!= Compaction.Delete)
      .select("key", "payload")
  }

  /** Merge base + deltas ≤ `uptoBatch` into a new committed base.
    * Commit is the stage→base dir rename; cleanup of the old base and
    * merged deltas happens after (a crash between leaves only garbage
    * that the max-N reader rule ignores and the next merge sweeps).
    */
  def compactTo(spark: SparkSession, table: String,
      uptoBatch: Long): Unit = {
    import graft.operators.Compaction
    val prev = committedBase(table)
    // sweep garbage from crashed merges before staging: uncommitted
    // stages, superseded bases (a crash between the rename commit and
    // cleanup leaves the OLD base orphaned — each one a full table
    // copy), and deltas the committed base already folded in
    Fs.listNames(table).filter(_.startsWith("_stage-"))
      .foreach(n => Fs.delete(s"$table/$n"))
    prev.foreach { case (n, _) =>
      Fs.listNames(table).foreach {
        case name @ BaseRe(id) if id.toLong < n =>
          Fs.delete(s"$table/$name")
        case _ => ()
      }
      deltaIds(table).filter(_ <= n)
        .foreach(id => Fs.delete(deltaDir(table, id)))
    }
    val ids = deltaIds(table)
      .filter(id => id <= uptoBatch && prev.forall(_._1 < id))
    if (ids.isEmpty) return
    val paths = prev.map(_._2).toSeq ++ ids.map(id => deltaDir(table, id))
    val merged = Compaction.compact(
      spark.read.schema(Schema).parquet(paths: _*), Seq("key"),
      Seq("bseq", "seq"), col("row_type"))
      .filter(col(Compaction.ActionCol) =!= Compaction.Delete)
      .select("bseq", "seq", "row_type", "key", "payload")
    val stage = f"$table/_stage-$uptoBatch%08d"
    merged.write.mode(SaveMode.Overwrite).parquet(stage)
    val committed = baseDir(table, uptoBatch)
    if (!Fs.exists(committed) && !Fs.rename(stage, committed))
      throw new java.io.IOException(
        s"landed-table commit failed: $stage -> $committed")
    // post-commit cleanup: old base, merged deltas, leftover stage
    prev.foreach { case (_, p) => Fs.delete(p) }
    ids.foreach(id => Fs.delete(deltaDir(table, id)))
    if (Fs.exists(stage)) Fs.delete(stage)
  }

  /** Refresh the flat published snapshot (the plain-parquet face of
    * the table) from the committed state. Derived data: a crash
    * mid-publish loses nothing — the committed base survives and the
    * next finalize republishes. The only visibility gap is the brief
    * delete→rename swap at FINALIZE (not per trigger), and only for
    * concurrent external readers of the flat files.
    */
  def publishFlat(spark: SparkSession, table: String): Unit = {
    if (committedBase(table).isEmpty && deltaIds(table).isEmpty) return
    val stage = s"$table/_pubstage"
    read(spark, table).write.mode(SaveMode.Overwrite).parquet(stage)
    Fs.listNames(table)
      .filter(n => !n.startsWith("_") && !n.startsWith("."))
      .foreach(n => Fs.delete(s"$table/$n"))
    Fs.listNames(stage).filter(!_.startsWith("."))
      .filter(_ != "_SUCCESS")
      .foreach { n =>
        // the old flat files are already gone — a silently-failed
        // rename would publish a snapshot with missing part files
        if (!Fs.rename(s"$stage/$n", s"$table/$n"))
          throw new java.io.IOException(
            s"flat publish rename failed: $stage/$n -> $table/$n")
      }
    Fs.delete(stage)
  }

  /** Finalize every landed table under `outDir`: fold all deltas into
    * the base and refresh the flat snapshot — the drain-once epilogue.
    */
  def finalizeAll(spark: SparkSession, outDir: String): Seq[String] = {
    val tables = Fs.listNames(outDir).filter(_.contains("."))
      .filter(n => Fs.isDirectory(s"$outDir/$n")).sorted
    tables.foreach { t =>
      val table = s"$outDir/$t"
      deltaIds(table).lastOption.foreach(compactTo(spark, table, _))
      publishFlat(spark, table)
    }
    tables
  }
}
