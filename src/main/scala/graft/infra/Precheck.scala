package graft.infra

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.types.StructType

/** Pre-flight checks — the reference's dt-precheck
  * (/root/reference/dt-precheck/src/meta/check_item.rs:4-11): source
  * reachability, struct existence, table identity (pk presence),
  * type support — evaluated driver-side before any task starts.
  */
object Precheck {

  final case class CheckResult(item: String, ok: Boolean, detail: String)

  /** Source connectivity: can the path be listed and read? */
  def checkSourceReadable(spark: SparkSession, path: String): CheckResult =
    try {
      spark.read.parquet(path).schema
      CheckResult("source_readable", ok = true, path)
    } catch {
      case e: Exception =>
        CheckResult("source_readable", ok = false,
          s"$path: ${e.getMessage.linesIterator.next()}")
    }

  /** Struct existence: every required table present. */
  def checkTablesExist(spark: SparkSession, dir: String,
      tables: Seq[String]): Seq[CheckResult] =
    tables.map { t =>
      val p = s"$dir/$t.parquet"
      val exists = new java.io.File(p).exists() ||
        (try { spark.read.parquet(p).schema; true }
        catch { case _: Exception => false })
      CheckResult("table_exists", exists, t)
    }

  /** Table identity: a declared key must exist in the schema and be
    * non-nullable-able in practice (reference: pk presence check —
    * merge/partition need id_cols).
    */
  def checkKeys(schema: StructType, keys: Seq[String],
      table: String): CheckResult = {
    val missing = keys.filterNot(k => schema.fieldNames.contains(k))
    if (keys.isEmpty)
      CheckResult("pk_present", ok = false,
        s"$table: no key declared — merge/partition degrade to serial")
    else if (missing.nonEmpty)
      CheckResult("pk_present", ok = false,
        s"$table: missing key cols ${missing.mkString(",")}")
    else CheckResult("pk_present", ok = true, table)
  }

  /** Type support: flag columns the applier can't round-trip. */
  def checkTypes(schema: StructType, table: String): CheckResult = {
    import org.apache.spark.sql.types._
    def nested(dt: DataType): Boolean = dt match {
      case _: StructType | _: MapType => true
      case ArrayType(et, _) => nested(et)
      case _ => false
    }
    val bad = schema.fields.filter(f => nested(f.dataType))
    if (bad.isEmpty) CheckResult("types_supported", ok = true, table)
    else CheckResult("types_supported", ok = false,
      s"$table: ${bad.map(f => s"${f.name}:${f.dataType.simpleString}")
        .mkString(",")}")
  }

  /** Run the standard battery for a snapshot task over parquet tables. */
  def runAll(spark: SparkSession, dir: String, tables: Seq[String],
      keysByTable: Map[String, Seq[String]]): Seq[CheckResult] = {
    val base = tables.flatMap { t =>
      val readable = checkSourceReadable(spark, s"$dir/$t.parquet")
      if (!readable.ok) Seq(readable.copy(detail = t))
      else {
        val schema = spark.read.parquet(s"$dir/$t.parquet").schema
        Seq(readable.copy(detail = t),
          checkKeys(schema, keysByTable.getOrElse(t, Nil), t),
          checkTypes(schema, t))
      }
    }
    base
  }
}
