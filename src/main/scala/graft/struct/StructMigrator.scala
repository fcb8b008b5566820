package graft.struct

import org.apache.spark.sql.types._

/** Structure (DDL) migration — catalog model → target-dialect CREATE
  * statements (reference struct sinkers:
  * /root/reference/dt-connector/src/sinker/mysql_struct_sinker.rs,
  * starrocks_struct_sinker.rs, clickhouse_struct_sinker.rs and the
  * mysql→OLAP type LUTs therein; model from
  * dt-common/src/meta/struct_meta/).
  *
  * No Spark execution involved — structure migration is metadata-in,
  * DDL-strings-out; the strings execute over plain JDBC.
  */
object StructMigrator {

  final case class ColumnDef(name: String, dataType: DataType,
      nullable: Boolean = true, comment: Option[String] = None)

  /** Secondary index (the reference migrates these as a separate
    * structure kind — `do_structures=index`).
    */
  final case class IndexDef(name: String, cols: Seq[String],
      unique: Boolean = false)

  final case class TableDef(schema: String, name: String,
      cols: Seq[ColumnDef], primaryKey: Seq[String] = Nil,
      uniqueKeys: Seq[Seq[String]] = Nil, comment: Option[String] = None,
      indexes: Seq[IndexDef] = Nil)

  object TableDef {
    /** Derive from a Spark schema (the engine-native catalog source). */
    def fromStruct(schema: String, name: String, st: StructType,
        primaryKey: Seq[String] = Nil): TableDef =
      TableDef(schema, name,
        st.fields.toSeq.map(f => ColumnDef(f.name, f.dataType, f.nullable)),
        primaryKey)
  }

  sealed trait Dialect {
    def quote(id: String): String
    def typeName(dt: DataType): String
    def render(t: TableDef): String

    /** Secondary-index DDL, one statement per index (separate from the
      * table body so the structure filter can admit tables without
      * indexes, the reference's per-kind migration).
      */
    def renderIndexes(t: TableDef): Seq[String] =
      t.indexes.map { ix =>
        val u = if (ix.unique) "UNIQUE " else ""
        s"CREATE ${u}INDEX ${quote(ix.name)} ON " +
          s"${quote(t.schema)}.${quote(t.name)} " +
          s"(${ix.cols.map(quote).mkString(", ")})"
      }
  }

  /** The full structure-migration statement list for one table, gated
    * by the config's structure filter (`do_structures`): table body and
    * secondary indexes are independent kinds — reference
    * rdb_filter.filter_structure.
    */
  def migrate(t: TableDef, dialect: Dialect,
      filter: graft.operators.NameFilter): Seq[String] =
    (if (filter.allowStructure("table")) Seq(dialect.render(t)) else Nil) ++
      (if (filter.allowStructure("index")) dialect.renderIndexes(t)
       else Nil)

  private def baseCols(d: Dialect, t: TableDef): Seq[String] =
    t.cols.map { c =>
      val nn = if (c.nullable) "" else " NOT NULL"
      val cm = c.comment.fold("")(x => s" COMMENT '${x.replace("'", "''")}'")
      s"  ${d.quote(c.name)} ${d.typeName(c.dataType)}$nn$cm"
    }

  case object MySqlDialect extends Dialect {
    def quote(id: String): String = s"`$id`"
    def typeName(dt: DataType): String = dt match {
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BooleanType => "TINYINT(1)"
      case DateType => "DATE"
      case _: TimestampType => "DATETIME(6)"
      case TimestampNTZType => "DATETIME(6)"
      case BinaryType => "LONGBLOB"
      case StringType => "LONGTEXT"
      case _ => "LONGTEXT"
    }
    def render(t: TableDef): String = {
      val pk = if (t.primaryKey.isEmpty) Nil
        else Seq(s"  PRIMARY KEY (${t.primaryKey.map(quote).mkString(", ")})")
      val uks = t.uniqueKeys.zipWithIndex.map { case (k, i) =>
        s"  UNIQUE KEY ${quote(s"uk_$i")} (${k.map(quote).mkString(", ")})"
      }
      s"CREATE TABLE IF NOT EXISTS ${quote(t.schema)}.${quote(t.name)} (\n" +
        (baseCols(this, t) ++ pk ++ uks).mkString(",\n") + "\n)"
    }
  }

  case object PostgresDialect extends Dialect {
    def quote(id: String): String = s""""$id""""
    def typeName(dt: DataType): String = dt match {
      case ByteType | ShortType => "SMALLINT"
      case IntegerType => "INTEGER"
      case LongType => "BIGINT"
      case FloatType => "REAL"
      case DoubleType => "DOUBLE PRECISION"
      case d: DecimalType => s"NUMERIC(${d.precision},${d.scale})"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType => "TIMESTAMPTZ"
      case TimestampNTZType => "TIMESTAMP"
      case BinaryType => "BYTEA"
      case _ => "TEXT"
    }
    def render(t: TableDef): String = {
      val pk = if (t.primaryKey.isEmpty) Nil
        else Seq(s"  PRIMARY KEY (${t.primaryKey.map(quote).mkString(", ")})")
      s"CREATE TABLE IF NOT EXISTS ${quote(t.schema)}.${quote(t.name)} (\n" +
        (baseCols(this, t) ++ pk).mkString(",\n") + "\n)"
    }
  }

  /** StarRocks/Doris: PRIMARY KEY table model with the sign/version
    * columns appended (reference starrocks_struct_sinker.rs:396 LUT;
    * sign/version from starrocks_sinker.rs:28-29).
    */
  case object StarRocksDialect extends Dialect {
    def quote(id: String): String = s"`$id`"
    def typeName(dt: DataType): String = dt match {
      case ByteType => "TINYINT"
      case ShortType => "SMALLINT"
      case IntegerType => "INT"
      case LongType => "BIGINT"
      case FloatType => "FLOAT"
      case DoubleType => "DOUBLE"
      case d: DecimalType => s"DECIMAL(${d.precision},${d.scale})"
      case BooleanType => "BOOLEAN"
      case DateType => "DATE"
      case _: TimestampType | TimestampNTZType => "DATETIME"
      case _ => "STRING"
    }
    def render(t: TableDef): String = {
      require(t.primaryKey.nonEmpty,
        "StarRocks PRIMARY KEY model needs a key")
      val extra = Seq(
        s"  ${quote("_graft_is_deleted")} TINYINT",
        s"  ${quote("_graft_version")} BIGINT")
      s"CREATE TABLE IF NOT EXISTS ${quote(t.schema)}.${quote(t.name)} (\n" +
        (baseCols(this, t) ++ extra).mkString(",\n") + "\n) " +
        s"PRIMARY KEY (${t.primaryKey.map(quote).mkString(", ")}) " +
        s"DISTRIBUTED BY HASH (${t.primaryKey.map(quote).mkString(", ")})"
    }
  }

  /** ClickHouse: ReplacingMergeTree(version) with the soft-delete sign
    * (reference clickhouse_struct_sinker.rs:297, clickhouse_sinker.rs:18).
    */
  case object ClickHouseDialect extends Dialect {
    def quote(id: String): String = s"`$id`"
    def typeName(dt: DataType): String = dt match {
      case ByteType => "Int8"
      case ShortType => "Int16"
      case IntegerType => "Int32"
      case LongType => "Int64"
      case FloatType => "Float32"
      case DoubleType => "Float64"
      case d: DecimalType => s"Decimal(${d.precision},${d.scale})"
      case BooleanType => "UInt8"
      case DateType => "Date32"
      case _: TimestampType | TimestampNTZType => "DateTime64(6)"
      case _ => "String"
    }
    override def render(t: TableDef): String = {
      require(t.primaryKey.nonEmpty, "ReplacingMergeTree needs a key")
      def nullable(c: ColumnDef) = {
        val base = typeName(c.dataType)
        if (c.nullable && !t.primaryKey.contains(c.name))
          s"Nullable($base)" else base
      }
      val cols = t.cols.map(c => s"  ${quote(c.name)} ${nullable(c)}") ++
        Seq(s"  ${quote("_graft_is_deleted")} UInt8",
          s"  ${quote("_graft_version")} UInt64")
      s"CREATE TABLE IF NOT EXISTS ${quote(t.schema)}.${quote(t.name)} (\n" +
        cols.mkString(",\n") + "\n) " +
        s"ENGINE = ReplacingMergeTree(${quote("_graft_version")}) " +
        s"ORDER BY (${t.primaryKey.map(quote).mkString(", ")})"
    }
  }

  def migrate(t: TableDef, to: Dialect): String = to.render(t)
}
