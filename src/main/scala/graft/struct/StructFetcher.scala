package graft.struct

import org.apache.spark.sql.types._

import graft.struct.StructMigrator.{ColumnDef, IndexDef, TableDef}
import graft.struct.PgStructures.{CommentDef, SequenceDef, SequenceOwnerDef}

/** Catalog-SQL synthesis for structure fetching — the
  * information_schema / pg_catalog queries the reference's struct
  * fetchers run (mysql_struct_fetcher.rs, pg_struct_fetcher.rs),
  * plus the row parsing that turns their result sets into the
  * existing [[StructMigrator.TableDef]] /
  * [[PgStructures]] definitions. SQL strings keep the reference's
  * projections, joins and filter-clause synthesis (db/tb scoping
  * with the configured database allow-set; an empty scope returns
  * no query at all, not an unfiltered one).
  *
  * Transport is pluggable ([[StructFetcher.CatalogExec]]): JDBC in
  * production, fixture catalog tables in specs — so a struct
  * migration is drivable end-to-end from a real catalog shape with
  * the actual statements pinned.
  */
object StructFetcher {

  /** Runs one catalog query; rows come back as column-name → value
    * (nulls as empty string, the reference's get_str_with_null).
    */
  trait CatalogExec {
    def query(sql: String): Seq[Map[String, String]]
  }

  private def inList(names: Set[String]): String =
    names.toSeq.sorted.map(n => s"'$n'").mkString(",")

  // ------------------------------------------------------------ MySQL

  /** mysql_struct_fetcher.rs — scoped to a database allow-set like the
    * reference (`dbs` from the task filter config).
    */
  final class MySqlFetcher(exec: CatalogExec, dbs: Set[String]) {

    /** Filter synthesis: (db, tb) exact → db-scoped → allow-set; out
      * of scope → None (the reference returns empty without querying).
      */
    private def filter(db: String, tb: String,
        prefix: String): Option[String] = {
      val p = if (prefix.isEmpty) "" else s"$prefix."
      if (db.nonEmpty) {
        if (!dbs.contains(db)) None
        else if (tb.nonEmpty)
          Some(s"${p}TABLE_SCHEMA = '$db' AND ${p}TABLE_NAME = '$tb'")
        else Some(s"${p}TABLE_SCHEMA = '$db'")
      } else if (dbs.nonEmpty)
        Some(s"${p}TABLE_SCHEMA IN (${inList(dbs)})")
      else None
    }

    /** information_schema.schemata (mysql_struct_fetcher.rs:96). */
    def schemataSql(db: String): Option[String] = {
      val f =
        if (db.nonEmpty) {
          if (!dbs.contains(db)) None
          else Some(s"SCHEMA_NAME = '$db'")
        } else if (dbs.nonEmpty)
          Some(s"SCHEMA_NAME IN (${inList(dbs)})")
        else None
      f.map { filter =>
        s"""SELECT
           |  SCHEMA_NAME,
           |  DEFAULT_CHARACTER_SET_NAME,
           |  DEFAULT_COLLATION_NAME
           |FROM information_schema.schemata
           |WHERE $filter""".stripMargin
      }
    }

    /** tables ⋈ columns (mysql_struct_fetcher.rs:161). */
    def tablesSql(db: String, tb: String): Option[String] =
      filter(db, tb, "t").map { f =>
        s"""SELECT t.TABLE_SCHEMA,
           |  t.TABLE_NAME,
           |  t.ENGINE,
           |  t.TABLE_COMMENT,
           |  t.TABLE_COLLATION,
           |  c.COLUMN_NAME,
           |  c.ORDINAL_POSITION,
           |  c.COLUMN_DEFAULT,
           |  c.IS_NULLABLE,
           |  c.COLUMN_TYPE,
           |  c.COLUMN_KEY,
           |  c.EXTRA,
           |  c.COLUMN_COMMENT,
           |  c.CHARACTER_SET_NAME,
           |  c.COLLATION_NAME
           |FROM information_schema.tables t
           |LEFT JOIN information_schema.columns c
           |ON t.TABLE_SCHEMA = c.TABLE_SCHEMA AND t.TABLE_NAME = c.TABLE_NAME
           |WHERE $f
           |AND t.TABLE_TYPE = 'BASE TABLE'
           |ORDER BY t.TABLE_SCHEMA, t.TABLE_NAME, c.ORDINAL_POSITION""".stripMargin
      }

    /** information_schema.statistics minus the PRIMARY index
      * (mysql_struct_fetcher.rs:329).
      */
    def indexesSql(db: String, tb: String): Option[String] =
      filter(db, tb, "").map { f =>
        s"""SELECT TABLE_SCHEMA,
           |  TABLE_NAME,
           |  NON_UNIQUE,
           |  INDEX_NAME,
           |  SEQ_IN_INDEX,
           |  COLUMN_NAME,
           |  SUB_PART,
           |  INDEX_TYPE,
           |  COMMENT
           |FROM information_schema.statistics
           |WHERE INDEX_NAME != 'PRIMARY' AND $f
           |ORDER BY TABLE_SCHEMA, TABLE_NAME, INDEX_NAME, SEQ_IN_INDEX""".stripMargin
      }

    /** table_constraints ⋈ check_constraints
      * (mysql_struct_fetcher.rs:432; callers gate on the
      * check_constraints table existing — MySQL >= 8.0.16).
      */
    def checkConstraintsSql(db: String, tb: String): Option[String] = {
      val f =
        if (db.nonEmpty) {
          if (!dbs.contains(db)) None
          else if (tb.nonEmpty)
            Some(s"tc.CONSTRAINT_SCHEMA = '$db' AND tc.TABLE_NAME = '$tb'")
          else Some(s"tc.CONSTRAINT_SCHEMA = '$db'")
        } else if (dbs.nonEmpty)
          Some(s"tc.CONSTRAINT_SCHEMA IN (${inList(dbs)})")
        else None
      f.map { filter =>
        s"""SELECT
           |  tc.CONSTRAINT_SCHEMA,
           |  tc.TABLE_NAME,
           |  tc.CONSTRAINT_NAME,
           |  tc.CONSTRAINT_TYPE,
           |  cc.CHECK_CLAUSE
           |FROM information_schema.table_constraints tc
           |LEFT JOIN information_schema.check_constraints cc
           |ON tc.CONSTRAINT_SCHEMA = cc.CONSTRAINT_SCHEMA AND tc.CONSTRAINT_NAME = cc.CONSTRAINT_NAME
           |WHERE $filter
           |AND tc.CONSTRAINT_TYPE='CHECK'""".stripMargin
      }
    }

    /** KEY_COLUMN_USAGE ⋈ TABLE_CONSTRAINTS foreign keys
      * (mysql_struct_fetcher.rs:495).
      */
    def foreignKeysSql(db: String, tb: String): Option[String] = {
      val f =
        if (db.nonEmpty) {
          if (!dbs.contains(db)) None
          else if (tb.nonEmpty)
            Some(s"kcu.CONSTRAINT_SCHEMA = '$db' AND kcu.TABLE_NAME = '$tb'")
          else Some(s"kcu.CONSTRAINT_SCHEMA = '$db'")
        } else if (dbs.nonEmpty)
          Some(s"kcu.CONSTRAINT_SCHEMA IN (${inList(dbs)})")
        else None
      f.map { filter =>
        s"""SELECT
           |  kcu.CONSTRAINT_NAME,
           |  kcu.CONSTRAINT_SCHEMA,
           |  kcu.TABLE_NAME,
           |  kcu.COLUMN_NAME,
           |  kcu.REFERENCED_TABLE_SCHEMA,
           |  kcu.REFERENCED_TABLE_NAME,
           |  kcu.REFERENCED_COLUMN_NAME
           |FROM INFORMATION_SCHEMA.KEY_COLUMN_USAGE kcu
           |JOIN INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc
           |ON kcu.CONSTRAINT_NAME = tc.CONSTRAINT_NAME AND kcu.CONSTRAINT_SCHEMA=tc.CONSTRAINT_SCHEMA
           |WHERE $filter
           |AND kcu.REFERENCED_TABLE_SCHEMA = kcu.CONSTRAINT_SCHEMA
           |AND tc.CONSTRAINT_TYPE = 'FOREIGN KEY'""".stripMargin
      }
    }

    final case class ConstraintRow(name: String, tpe: String,
        definition: String)

    /** Build the full TableDef from the catalog: columns in ordinal
      * order, PRI → primaryKey, unique statistics → uniqueKeys,
      * non-unique → secondary indexes.
      */
    def fetchTable(db: String, tb: String): Option[TableDef] = {
      val colRows = tablesSql(db, tb).map(exec.query).getOrElse(Nil)
      if (colRows.isEmpty) return None
      val cols = colRows
        .sortBy(_.getOrElse("ORDINAL_POSITION", "0").toInt)
        .map { r =>
          ColumnDef(r("COLUMN_NAME"),
            mysqlType(r.getOrElse("COLUMN_TYPE", "")),
            nullable =
              r.getOrElse("IS_NULLABLE", "").equalsIgnoreCase("yes"),
            comment = r.get("COLUMN_COMMENT").filter(_.nonEmpty))
        }
      val pk = colRows
        .filter(_.getOrElse("COLUMN_KEY", "") == "PRI")
        .sortBy(_.getOrElse("ORDINAL_POSITION", "0").toInt)
        .map(_("COLUMN_NAME"))
      val ixRows = indexesSql(db, tb).map(exec.query).getOrElse(Nil)
      val ix = ixRows.groupBy(_("INDEX_NAME")).toSeq.sortBy(_._1)
        .map { case (name, rows) =>
          val ordered = rows
            .sortBy(_.getOrElse("SEQ_IN_INDEX", "0").toInt)
            .map(_("COLUMN_NAME"))
          val unique = rows.head.getOrElse("NON_UNIQUE", "1") == "0"
          IndexDef(name, ordered, unique)
        }
      val comment = colRows.head.get("TABLE_COMMENT").filter(_.nonEmpty)
      Some(TableDef(db, tb, cols, pk,
        uniqueKeys = ix.filter(_.unique).map(_.cols),
        comment = comment,
        indexes = ix.filterNot(_.unique)))
    }

    /** Check + FK constraints, reference definition formats (`(cols)
      * REFERENCES db.tb(col)` for FKs).
      */
    def fetchConstraints(db: String, tb: String): Seq[ConstraintRow] = {
      val checks = checkConstraintsSql(db, tb).map(exec.query)
        .getOrElse(Nil).map { r =>
          ConstraintRow(r("CONSTRAINT_NAME"), "CHECK",
            r.getOrElse("CHECK_CLAUSE", ""))
        }
      val fks = foreignKeysSql(db, tb).map(exec.query)
        .getOrElse(Nil).map { r =>
          ConstraintRow(r("CONSTRAINT_NAME"), "FOREIGN KEY",
            s"(`${r("COLUMN_NAME")}`) REFERENCES " +
              s"`${r("CONSTRAINT_SCHEMA")}`." +
              s"`${r("REFERENCED_TABLE_NAME")}`" +
              s"(`${r("REFERENCED_COLUMN_NAME")}`)")
        }
      checks ++ fks
    }
  }

  /** COLUMN_TYPE → engine-native type (the subset the fixture tables
    * exercise; unknowns land on LONGTEXT like the dialect fallback).
    */
  def mysqlType(columnType: String): DataType = {
    val t = columnType.toLowerCase.trim
    val base = t.takeWhile(c => c != '(' && c != ' ')
    def args = t.dropWhile(_ != '(') match {
      case s if s.startsWith("(") =>
        s.drop(1).takeWhile(_ != ')').split(",").map(_.trim.toInt).toSeq
      case _ => Nil
    }
    base match {
      case "tinyint" => if (args.headOption.contains(1)) BooleanType
        else ByteType
      case "smallint" => ShortType
      case "mediumint" | "int" | "integer" => IntegerType
      case "bigint" => LongType
      case "float" => FloatType
      case "double" => DoubleType
      case "decimal" | "numeric" =>
        DecimalType(args.headOption.getOrElse(10),
          args.drop(1).headOption.getOrElse(0))
      case "date" => DateType
      case "datetime" | "timestamp" => TimestampNTZType
      case "binary" | "varbinary" | "blob" | "longblob" | "mediumblob"
          | "tinyblob" => BinaryType
      case _ => StringType
    }
  }

  // --------------------------------------------------------------- PG

  /** pg_struct_fetcher.rs — scoped to a schema allow-set. */
  final class PgFetcher(exec: CatalogExec, schemas: Set[String]) {

    private def filter(sch: String, tb: String, schCol: String,
        tbCol: String): Option[String] =
      if (sch.nonEmpty) {
        if (!schemas.contains(sch)) None
        else if (tb.nonEmpty)
          Some(s"$schCol='$sch' AND $tbCol = '$tb'")
        else Some(s"$schCol = '$sch'")
      } else if (schemas.nonEmpty)
        Some(s"$schCol IN (${inList(schemas)})")
      else None

    /** information_schema.columns ⋈ tables
      * (pg_struct_fetcher.rs:472).
      */
    def columnsSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "c.table_schema", "c.table_name").map { f =>
        s"""SELECT c.table_schema,
           |  c.table_name,
           |  c.column_name,
           |  c.data_type,
           |  c.udt_name,
           |  c.character_maximum_length,
           |  c.is_nullable,
           |  c.column_default,
           |  c.numeric_precision,
           |  c.numeric_scale,
           |  c.is_identity,
           |  c.identity_generation,
           |  c.ordinal_position
           |FROM information_schema.columns c
           |JOIN information_schema.tables t
           |  ON c.table_schema = t.table_schema
           |  AND c.table_name = t.table_name
           |WHERE $f
           |  AND t.table_type = 'BASE TABLE'
           |ORDER BY c.table_schema, c.table_name, c.ordinal_position""".stripMargin
      }

    /** pg_constraint with rendered definitions
      * (pg_struct_fetcher.rs:612).
      */
    def constraintsSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "nsp.nspname", "rel.relname").map { f =>
        s"""SELECT nsp.nspname,
           |  rel.relname,
           |  con.conname AS constraint_name,
           |  con.contype::text AS constraint_type,
           |  pg_get_constraintdef(con.oid) AS constraint_definition
           |FROM pg_catalog.pg_constraint con
           |JOIN pg_catalog.pg_class rel
           |  ON rel.oid = con.conrelid
           |JOIN pg_catalog.pg_namespace nsp
           |  ON nsp.oid = connamespace
           |WHERE $f
           |ORDER BY nsp.nspname,rel.relname""".stripMargin
      }

    /** pg_indexes (pg_struct_fetcher.rs:680). */
    def indexesSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "schemaname", "tablename").map { f =>
        s"""SELECT schemaname,
           |  tablename,
           |  indexdef,
           |  COALESCE(tablespace, 'pg_default') AS tablespace, indexname
           |FROM pg_indexes
           |WHERE $f""".stripMargin
      }

    /** Table-owned sequences (pg_struct_fetcher.rs:232 — sequences ⋈
      * pg_class ⋈ pg_namespace ⋈ pg_depend ⋈ owning table, automatic
      * dependency only).
      */
    def sequencesSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "obj.sequence_schema", "tab.relname").map { f =>
        s"""SELECT obj.sequence_catalog,
           |  obj.sequence_schema,
           |  tab.relname AS table_name,
           |  obj.sequence_name,
           |  obj.data_type,
           |  obj.start_value,
           |  obj.minimum_value,
           |  obj.maximum_value,
           |  obj.increment,
           |  obj.cycle_option
           |FROM information_schema.sequences obj
           |JOIN pg_class AS seq
           |  ON (seq.relname = obj.sequence_name)
           |JOIN pg_namespace ns
           |  ON (seq.relnamespace = ns.oid)
           |JOIN pg_depend AS dep
           |  ON (seq.oid = dep.objid)
           |JOIN pg_class AS tab
           |  ON (dep.refobjid = tab.oid)
           |WHERE $f
           |AND ns.nspname = obj.sequence_schema
           |AND dep.deptype='a'""".stripMargin
      }

    /** Sequence → owning column map (pg_struct_fetcher.rs:408). */
    def sequenceOwnersSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "ns.nspname", "tab.relname").map { f =>
        s"""SELECT seq.relname,
           |  tab.relname AS table_name,
           |  attr.attname AS column_name,
           |  ns.nspname
           |FROM pg_class AS seq
           |JOIN pg_namespace ns
           |  ON (seq.relnamespace = ns.oid)
           |JOIN pg_depend AS dep
           |  ON (seq.oid = dep.objid)
           |JOIN pg_class AS tab
           |  ON (dep.refobjid = tab.oid)
           |JOIN pg_attribute AS attr
           |  ON (attr.attnum = dep.refobjsubid AND attr.attrelid = dep.refobjid)
           |WHERE dep.deptype='a'
           |  AND seq.relkind='S'
           |  AND $f""".stripMargin
      }

    /** Table comments (pg_struct_fetcher.rs:732; objsubid = 0). */
    def tableCommentsSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "n.nspname", "c.relname").map { f =>
        s"""SELECT n.nspname,
           |  c.relname,
           |  d.description
           |FROM pg_class c
           |LEFT JOIN pg_namespace n
           |  ON n.oid = c.relnamespace
           |LEFT JOIN pg_description d
           |  ON c.oid = d.objoid  AND d.objsubid = 0
           |WHERE $f
           |AND d.description IS NOT null""".stripMargin
      }

    /** Column comments (pg_struct_fetcher.rs:789 — via
      * col_description / format_type).
      */
    def columnCommentsSql(sch: String, tb: String): Option[String] =
      filter(sch, tb, "n.nspname", "c.relname").map { f =>
        s"""SELECT n.nspname,
           |  c.relname,
           |  col_description(a.attrelid, a.attnum) as comment,
           |  format_type(a.atttypid, a.atttypmod)as type,
           |  a.attname AS name,
           |  a.attnotnull AS notnull
           |FROM pg_class c
           |LEFT JOIN pg_attribute a
           |  ON a.attrelid =c.oid
           |LEFT JOIN pg_namespace n
           |  ON n.oid = c.relnamespace
           |WHERE $f
           |  AND a.attnum >0
           |  AND col_description(a.attrelid, a.attnum) is NOT null""".stripMargin
      }

    private val keyListRe =
      """(?i)(?:PRIMARY KEY|UNIQUE)\s*\(([^)]*)\)""".r

    private def keyCols(definition: String): Seq[String] =
      keyListRe.findFirstMatchIn(definition)
        .map(_.group(1).split(",").toSeq.map(_.trim.stripPrefix("\"")
          .stripSuffix("\"")))
        .getOrElse(Nil)

    private val indexDefRe =
      """(?i)CREATE\s+(UNIQUE\s+)?INDEX\s+(\S+)\s+ON\s+\S+\s+USING\s+\S+\s*\(([^)]*)\)""".r

    /** TableDef + comments from the catalog: columns in ordinal
      * order, 'p'/'u' constraints → keys, pg_indexes definitions →
      * secondary indexes (constraint-backed ones excluded).
      */
    def fetchTable(sch: String,
        tb: String): Option[(TableDef, Seq[CommentDef])] = {
      val colRows = columnsSql(sch, tb).map(exec.query).getOrElse(Nil)
      if (colRows.isEmpty) return None
      val colComments = columnCommentsSql(sch, tb).map(exec.query)
        .getOrElse(Nil)
        .map(r => r("name") -> r("comment")).toMap
      val cols = colRows
        .sortBy(_.getOrElse("ordinal_position", "0").toInt)
        .map { r =>
          ColumnDef(r("column_name"),
            pgType(r.getOrElse("data_type", ""),
              r.getOrElse("udt_name", ""),
              r.get("numeric_precision").filter(_.nonEmpty).map(_.toInt),
              r.get("numeric_scale").filter(_.nonEmpty).map(_.toInt)),
            nullable =
              r.getOrElse("is_nullable", "").equalsIgnoreCase("yes"),
            comment = colComments.get(r("column_name")))
        }
      val conRows = constraintsSql(sch, tb).map(exec.query)
        .getOrElse(Nil)
      val pk = conRows.find(_.getOrElse("constraint_type", "") == "p")
        .map(r => keyCols(r.getOrElse("constraint_definition", "")))
        .getOrElse(Nil)
      val uniques = conRows
        .filter(_.getOrElse("constraint_type", "") == "u")
        .map(r => keyCols(r.getOrElse("constraint_definition", "")))
        .filter(_.nonEmpty)
      val conNames = conRows.map(_("constraint_name")).toSet
      val ixRows = indexesSql(sch, tb).map(exec.query).getOrElse(Nil)
      val indexes = ixRows
        .filterNot(r => conNames.contains(r("indexname")))
        .flatMap { r =>
          indexDefRe.findFirstMatchIn(r.getOrElse("indexdef", ""))
            .map { m =>
              IndexDef(r("indexname"),
                m.group(3).split(",").toSeq
                  .map(_.trim.stripPrefix("\"").stripSuffix("\"")),
                unique = m.group(1) != null)
            }
        }.sortBy(_.name)
      val tableComment = tableCommentsSql(sch, tb).map(exec.query)
        .getOrElse(Nil).headOption.map(_("description"))
      val comments =
        tableComment.map(CommentDef(sch, tb, None, _)).toSeq ++
          cols.flatMap(c =>
            c.comment.map(CommentDef(sch, tb, Some(c.name), _)))
      Some((TableDef(sch, tb, cols, pk, uniqueKeys = uniques,
        comment = tableComment, indexes = indexes), comments))
    }

    /** Owned sequences + their column owners, as PgStructures defs. */
    def fetchSequences(sch: String, tb: String)
        : (Seq[SequenceDef], Seq[SequenceOwnerDef]) = {
      val seqRows = sequencesSql(sch, tb).map(exec.query)
        .getOrElse(Nil)
      val seqs = seqRows.map { r =>
        SequenceDef(r("sequence_schema"), r("sequence_name"),
          dataType = r.getOrElse("data_type", "bigint"),
          start = r.getOrElse("start_value", "1").toLong,
          increment = r.getOrElse("increment", "1").toLong,
          minValue = r.getOrElse("minimum_value", "1").toLong,
          maxValue = r.get("maximum_value").filter(_.nonEmpty)
            .map(_.toLong).getOrElse(Long.MaxValue),
          cycle =
            r.getOrElse("cycle_option", "NO").equalsIgnoreCase("yes"))
      }
      val owners = sequenceOwnersSql(sch, tb).map(exec.query)
        .getOrElse(Nil).map { r =>
          SequenceOwnerDef(r("nspname"), r("relname"),
            r("table_name"), r("column_name"))
        }
      (seqs, owners)
    }
  }

  /** information_schema.columns typing → engine-native type. */
  def pgType(dataType: String, udt: String, precision: Option[Int],
      scale: Option[Int]): DataType = dataType.toLowerCase match {
    case "smallint" => ShortType
    case "integer" => IntegerType
    case "bigint" => LongType
    case "real" => FloatType
    case "double precision" => DoubleType
    case "numeric" | "decimal" =>
      DecimalType(precision.getOrElse(38), scale.getOrElse(18))
    case "boolean" => BooleanType
    case "date" => DateType
    case "timestamp without time zone" => TimestampNTZType
    case "timestamp with time zone" => TimestampType
    case "bytea" => BinaryType
    case _ => StringType // varchar/char/text/uuid/json/USER-DEFINED
  }
}
