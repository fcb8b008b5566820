package graft.meta

import org.apache.spark.sql.types._

/** Source-native type ↔ Spark type mapping — the reference's
  * MysqlColType/PgValueType tables
  * (/root/reference/dt-common/src/meta/mysql/mysql_col_type.rs:7-52,
  * pg/pg_value_type.rs:115-145) and the FIXTURES.md §1 column map.
  * The source-native string rides along (StructField metadata) so struct
  * migration and checkers can reason about the origin type
  * (col_origin_type_map).
  */
object TypeMapper {

  private val precRe = """([a-z ]+?)\s*\((\d+)\s*(?:,\s*(\d+))?\)""".r

  /** MySQL column type string → Spark type. Unsigned bigint needs
    * DECIMAL(20,0) — u64 doesn't fit a long (reference col_value.rs).
    */
  def mysqlToSpark(raw: String): DataType = {
    val t = raw.trim.toLowerCase
    val unsigned = t.contains("unsigned")
    val base = t.replace("unsigned", "").trim
    def prec: (String, Int, Int) = base match {
      case precRe(name, p, s) =>
        (name.trim, p.toInt, if (s == null) 0 else s.toInt)
      case _ => (base, -1, -1)
    }
    val (name, p, s) = prec
    name match {
      case "tinyint" =>
        if (p == 1) BooleanType
        else if (unsigned) ShortType else ByteType
      case "smallint" => if (unsigned) IntegerType else ShortType
      case "mediumint" => IntegerType
      case "int" | "integer" => if (unsigned) LongType else IntegerType
      case "bigint" =>
        if (unsigned) DecimalType(20, 0) else LongType
      case "decimal" | "numeric" =>
        if (p > 0) DecimalType(p, s) else DecimalType(38, 18)
      case "float" => FloatType
      case "double" | "real" => DoubleType
      case "bit" => LongType
      case "date" => DateType
      case "datetime" => TimestampNTZType
      case "timestamp" => TimestampType
      case "time" => StringType // no TimeType; canonical string
      case "year" => ShortType
      case "char" | "varchar" | "tinytext" | "text" | "mediumtext" |
           "longtext" | "enum" | "set" | "json" => StringType
      case "binary" | "varbinary" | "tinyblob" | "blob" | "mediumblob" |
           "longblob" => BinaryType
      case _ => StringType
    }
  }

  /** PostgreSQL type string → Spark type (arrays → ArrayType of the
    * element mapping; reference PgValueType Array* variants).
    */
  def pgToSpark(raw: String): DataType = {
    val t = raw.trim.toLowerCase
    if (t.endsWith("[]")) return ArrayType(pgToSpark(t.dropRight(2)))
    val (name, p, s) = t match {
      case precRe(n, pp, ss) =>
        (n.trim, pp.toInt, if (ss == null) 0 else ss.toInt)
      case _ => (t, -1, -1)
    }
    name match {
      case "smallint" | "int2" => ShortType
      case "integer" | "int" | "int4" | "serial" => IntegerType
      case "bigint" | "int8" | "bigserial" => LongType
      case "real" | "float4" => FloatType
      case "double precision" | "float8" => DoubleType
      case "numeric" | "decimal" =>
        if (p > 0) DecimalType(p, s) else DecimalType(38, 18)
      case "boolean" | "bool" => BooleanType
      case "date" => DateType
      case "timestamp" | "timestamp without time zone" => TimestampNTZType
      case "timestamptz" | "timestamp with time zone" => TimestampType
      case "bytea" => BinaryType
      case "uuid" | "json" | "jsonb" | "xml" | "inet" | "cidr" |
           "macaddr" | "interval" | "money" | "time" | "timetz" =>
        StringType
      case n if n.startsWith("char") || n.startsWith("varchar") ||
        n == "text" || n == "name" => StringType
      case _ => StringType
    }
  }

  /** Build a StructField keeping the origin type string (the reference's
    * col_origin_type_map) in metadata.
    */
  def field(name: String, originType: String,
      dialect: String = "mysql", nullable: Boolean = true): StructField = {
    val dt = dialect match {
      case "pg" | "postgres" => pgToSpark(originType)
      case _ => mysqlToSpark(originType)
    }
    StructField(name, dt, nullable,
      new MetadataBuilder().putString("origin_type", originType).build())
  }
}
