package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Data check / revise — the reference's checker engine
  * (/root/reference/dt-connector/src/checker/checker_engine.rs:153-294,
  * base_checker.rs:67-152) re-expressed Spark-first.
  *
  * The reference streams source rows and point-looks-up the target with
  * batched `WHERE (keys) IN (…)` selects; at Spark scale the same semantics
  * are a single full-outer join on the row identity — one shuffle each side
  * (or a broadcast when one side is small), instead of N driver-side lookup
  * round-trips.
  *
  * Classification:
  *  - MISS:   row in src, absent in dst → revise INSERT
  *  - ORPHAN: row in dst, absent in src → revise DELETE
  *  - DIFF:   both present, some compared column differs → revise UPDATE
  *  - OK:     both present, all compared columns equal
  */
object Checker {

  final val StatusCol = "_status"
  final val DiffColsCol = "_diff_cols"

  /** Tolerant column equality (reference col_value.rs:135-166): null-safe,
    * and NaN == NaN on floating columns (Spark's <=> already treats NaN as
    * equal to NaN, matching the reference's explicit NaN handling).
    */
  def tolerantEq(a: Column, b: Column): Column = a <=> b

  /** PG TOAST sentinel (reference col_value.rs UnchangedToast;
    * checker_engine.rs:259-294): a source column carrying the
    * unchanged-TOAST marker was not transmitted — it must compare as
    * equal, never as DIFF.
    */
  final val ToastSentinel = "__graft_unchanged_toast__"

  def tolerantEqToast(src: Column, dst: Column): Column =
    (src === ToastSentinel) || (src <=> dst)

  /** PG INET/CIDR tolerance (reference checker_engine.rs:269-294
    * is_same_col_value + normalize_pg_network_text): a host address
    * stored bare on one engine and with its full-length prefix on the
    * other (`10.0.0.1` vs `10.0.0.1/32`, `::1` vs `::1/128`) is the
    * same value; only the exact /32 and /128 suffixes strip.
    */
  def tolerantEqPgNetwork(a: Column, b: Column): Column = {
    def norm(c: Column) = regexp_replace(c, "/(32|128)$", "")
    norm(a) <=> norm(b)
  }

  /** MySQL BIGINT UNSIGNED tolerance: values above 2^63-1 arrive as
    * negative two's-complement i64 from the binlog row image but as
    * unsigned decimals from a snapshot or target read (reference
    * mysql_col_value_convertor.rs UnsignedLongLong vs the binlog i64).
    * Both renderings normalize by adding 2^64 to negatives in exact
    * DECIMAL arithmetic (conv() would wrap too, but clamps the
    * Long.MinValue magnitude).
    */
  def tolerantEqUnsigned(a: Column, b: Column): Column = {
    val wrap = lit(new java.math.BigDecimal("18446744073709551616"))
      .cast(org.apache.spark.sql.types.DecimalType(21, 0))
    // try_cast, not cast: under Spark 4 default ANSI mode a plain cast
    // of a non-numeric rendering THROWS and kills the whole check job
    // (and with ANSI off both sides would cast to null and two
    // different garbage values would compare EQUAL). A side that fails
    // to parse falls back to the strict comparison, so malformed
    // values surface as diffs.
    def tryDec(c: Column) =
      c.cast("string").try_cast(org.apache.spark.sql.types.DecimalType(21, 0))
    def norm(d: Column) = when(d < 0, d + wrap).otherwise(d)
    val da = tryDec(a); val db = tryDec(b)
    when(da.isNotNull && db.isNotNull, norm(da) <=> norm(db))
      .otherwise(tolerantEq(a, b))
  }

  /** MySQL zero-date tolerance: `0000-00-00[ 00:00:00]` is
    * unrepresentable on most targets and round-trips as NULL
    * (reference mysql targets insert NULL for zero dates); a zero date
    * on one side therefore matches NULL or any zero date on the other.
    */
  def tolerantEqZeroDate(a: Column, b: Column): Column = {
    def zeroish(c: Column) =
      c.isNull || c.cast("string").startsWith("0000-00-00")
    (zeroish(a) && zeroish(b)) || (a <=> b)
  }

  /** Type-aware comparator dispatch, the shape of the reference's
    * is_same_col_value: the checker's table meta names a column's
    * source type and the comparison tolerates that type's known
    * cross-engine renderings.
    */
  def tolerantEqFor(colType: String)(a: Column, b: Column): Column =
    colType.toLowerCase match {
      case "inet" | "cidr" => tolerantEqPgNetwork(a, b)
      case "bigint unsigned" | "unsigned_bigint" =>
        tolerantEqUnsigned(a, b)
      case "date" | "datetime" | "timestamp" => tolerantEqZeroDate(a, b)
      case _ => tolerantEq(a, b)
    }

  /** Document-level diff for schemaless rows (reference Mongo checker:
    * doc-level field expansion, checker_engine.rs:180-294): given two
    * MAP<STRING,STRING> images, list fields missing either side or
    * differing — a per-row expression, no shuffle.
    */
  def docDiffFields(src: Column, dst: Column): Column = {
    val allKeys = array_distinct(concat(map_keys(src), map_keys(dst)))
    array_sort(filter(allKeys, k =>
      !(element_at(src, k) <=> element_at(dst, k))))
  }

  /** Full-row check. `compareCols` defaults to all non-key columns shared
    * by both sides. Output: key columns, per-side compared columns
    * (prefixed src_/dst_), `_status`, `_diff_cols` (sorted names of
    * differing columns, empty for non-DIFF).
    */
  def diff(src: DataFrame, dst: DataFrame, keys: Seq[String],
      compareColsIn: Seq[String] = Nil): DataFrame = {
    val compareCols =
      if (compareColsIn.nonEmpty) compareColsIn
      else src.columns.filter(dst.columns.contains)
        .filterNot(keys.contains).toSeq
    val s = src.select((keys ++ compareCols).map(col): _*)
      .withColumn("_src_present", lit(1))
    val d = dst.select((keys ++ compareCols).map(col): _*)
      .withColumn("_dst_present", lit(1))
    val sren = compareCols.foldLeft(s)((df, c) =>
      df.withColumnRenamed(c, s"src_$c"))
    val dren = compareCols.foldLeft(d)((df, c) =>
      df.withColumnRenamed(c, s"dst_$c"))
    val joined = sren.join(dren, keys, "full_outer")
    val diffCols = array_compact(array(compareCols.sorted.map { c =>
      when(!tolerantEq(col(s"src_$c"), col(s"dst_$c")), lit(c))
    }: _*))
    joined
      .withColumn(StatusCol,
        when(col("_src_present").isNull, lit("ORPHAN"))
          .when(col("_dst_present").isNull, lit("MISS"))
          .when(size(diffCols) > 0, lit("DIFF"))
          .otherwise(lit("OK")))
      .withColumn(DiffColsCol,
        when(col(StatusCol) === "DIFF", diffCols)
          .otherwise(array().cast("array<string>")))
      .drop("_src_present", "_dst_present")
  }

  /** Revise operation per non-OK row (reference base_checker.rs:67-152):
    * MISS→insert, DIFF→update, ORPHAN→delete.
    */
  def reviseOp(status: Column): Column =
    when(status === "MISS", "insert")
      .when(status === "DIFF", "update")
      .when(status === "ORPHAN", "delete")

  /** Revise SQL in placeholder mode (reference rdb_query_builder.rs
    * placeholder vs literal modes): key predicate rendered with literal
    * key values, non-key values as `?` — the shape a prepared-statement
    * applier executes.
    */
  def reviseSqlPlaceholder(table: String, keys: Seq[String],
      setCols: Column, status: Column): Column = {
    val keyPred = concat_ws(" AND ",
      keys.map(k => concat(lit(s"$k="), col(k).cast("string"))): _*)
    when(status === "MISS",
      concat(lit(s"INSERT INTO $table VALUES (?)")))
      .when(status === "DIFF",
        concat(lit(s"UPDATE $table SET "),
          concat_ws(", ", transform(setCols, c => concat(c, lit("=?")))),
          lit(" WHERE "), keyPred))
      .when(status === "ORPHAN",
        concat(lit(s"DELETE FROM $table WHERE "), keyPred))
  }

  /** Sampling check (reference checker_engine.rs:316-321: id_hash%100 <
    * rate) with a pure-arithmetic key hash so oracles replicate it.
    */
  def sampleFilter(keyHash: Column, ratePercent: Int): Column =
    pmod(keyHash, lit(100)) < ratePercent

  /** Arithmetic two-column row-identity hash (SQL-replicable). */
  def arithKeyHash(k1: Column, k2: Column): Column =
    pmod(k1.cast("long") * lit(1000003L) + k2.cast("long"),
      lit(1000000007L))
}
