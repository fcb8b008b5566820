package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Micro-batch change-stream compaction — the reference's `rdb_merge`
  * (/root/reference/dt-parallelizer/src/rdb_merger.rs:17-143) re-expressed
  * as a single-shuffle window dedup.
  *
  * Semantics preserved from the reference:
  *  - per key, only the LAST event matters: a final delete wins over any
  *    earlier insert/update ("delete removes pending insert"); a final
  *    insert/update becomes an upsert (update = delete(before)+insert(after)
  *    collapses to upsert on an idempotent sink);
  *  - rows whose key columns contain NULL are *unmergeable* (reference hash
  *    code 0, rdb_merger.rs:186-191): batch delete-by-key would silently
  *    skip them, so they bypass compaction and must be applied serially in
  *    original order.
  *
  * Scale: exactly one hash shuffle on the key columns (the window), with
  * AQE skew handling; no driver-side state. At 100 TB the shuffle is
  * unavoidable — per-key final state is a global property — but partial
  * row_number pushdown + AQE keep it one pass.
  */
object Compaction {

  final val ActionCol = "_action"
  final val Upsert = "upsert"
  final val Delete = "delete"
  final val Serial = "serial"

  /** Compact `df` to final per-key state.
    *
    * @param keyCols   row-identity columns (reference `id_cols`)
    * @param orderCols event-order columns, ascending (e.g. ts, seq) — must
    *                  form a total order for determinism
    * @param rowType   column holding insert|update|delete
    * @return original columns + `_action` ∈ {upsert, delete, serial}; for
    *         upsert/delete exactly one row per key (the final state), for
    *         serial all NULL-keyed rows in original positions.
    */
  def compact(df: DataFrame, keyCols: Seq[String], orderCols: Seq[String],
      rowType: Column): DataFrame = {
    val nullKey = keyCols.map(col(_).isNull).reduce(_ || _)
    // max_by over the order tuple instead of a row_number window:
    // the same winner under the documented total-order contract
    // (window `desc` is NULLS LAST; struct comparison puts a null
    // order field below any value — both prefer the non-null), but
    // an AGGREGATE does partial map-side reduction, so each mapper
    // ships at most one row per key into the shuffle where the
    // window shipped every row, and the reduce side needs no sort
    // (optimization guide §2.3 "aggregate before you shuffle").
    // struct(orderCols) is itself never null, so no row is silently
    // skipped by max_by's null-ordering-value rule.
    val mergeable = df.filter(!nullKey)
      .groupBy(keyCols.map(col): _*)
      .agg(max_by(struct(df.columns.map(col): _*),
        struct(orderCols.map(col): _*)).as("_w"))
      .select(col("_w.*"))
      .withColumn(ActionCol,
        when(rowType === "delete", lit(Delete)).otherwise(lit(Upsert)))
    val serial = df.filter(nullKey).withColumn(ActionCol, lit(Serial))
    mergeable.unionByName(serial)
  }

  /** Update-splitting as a DataFrame op: update → (delete, insert) pair,
    * insert/delete pass through (reference: row_data.rs:96-115). Emits
    * `_seq` (ordering within the pair) and `_out_type`.
    * Implemented with explode over a literal array so it stays inside
    * whole-stage codegen — no UDF, no flatMap closure.
    */
  def splitUpdates(df: DataFrame, rowType: Column): DataFrame = {
    val pair = when(rowType === "update", array(
      struct(lit(0).as("_seq"), lit("delete").as("_out_type")),
      struct(lit(1).as("_seq"), lit("insert").as("_out_type"))))
      .otherwise(array(struct(lit(0).as("_seq"), rowType.as("_out_type"))))
    df.withColumn("_parts", pair)
      .withColumn("_part", explode(col("_parts")))
      .withColumn("_seq", col("_part._seq"))
      .withColumn("_out_type", col("_part._out_type"))
      .drop("_parts", "_part")
  }

  /** Key-hash partition assignment for parallel sink apply — the
    * reference's `rdb_partitioner` (dt-parallelizer/src/rdb_partitioner.rs).
    * Uses a pure-arithmetic Knuth multiplicative hash so oracles can
    * replicate it; NULL keys land in partition 0 (the serial lane).
    */
  def sinkPartition(key: Column, n: Int): Column =
    when(key.isNull, lit(0))
      .otherwise(pmod(pmod(key.cast("long") * lit(2654435761L),
        lit(1000000007L)), lit(n)))
}
