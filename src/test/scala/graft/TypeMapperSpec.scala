package graft

import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.meta.TypeMapper

class TypeMapperSpec extends AnyFunSuite {

  test("mysql fixture column family maps per FIXTURES.md") {
    import TypeMapper.mysqlToSpark
    assert(mysqlToSpark("tinyint") == ByteType)
    assert(mysqlToSpark("tinyint(1)") == BooleanType)
    assert(mysqlToSpark("smallint") == ShortType)
    assert(mysqlToSpark("mediumint") == IntegerType)
    assert(mysqlToSpark("int") == IntegerType)
    assert(mysqlToSpark("bigint") == LongType)
    assert(mysqlToSpark("bigint unsigned") == DecimalType(20, 0))
    assert(mysqlToSpark("int unsigned") == LongType)
    assert(mysqlToSpark("decimal(10,4)") == DecimalType(10, 4))
    assert(mysqlToSpark("float(6,2)") == FloatType)
    assert(mysqlToSpark("double(8,3)") == DoubleType)
    assert(mysqlToSpark("bit(64)") == LongType)
    assert(mysqlToSpark("datetime(6)") == TimestampNTZType)
    assert(mysqlToSpark("timestamp(6)") == TimestampType)
    assert(mysqlToSpark("time(6)") == StringType)
    assert(mysqlToSpark("date") == DateType)
    assert(mysqlToSpark("year") == ShortType)
    assert(mysqlToSpark("varchar(255)") == StringType)
    assert(mysqlToSpark("varbinary(255)") == BinaryType)
    assert(mysqlToSpark("longblob") == BinaryType)
    assert(mysqlToSpark("enum('a','b')") == StringType)
    assert(mysqlToSpark("json") == StringType)
  }

  test("pg types incl. arrays") {
    import TypeMapper.pgToSpark
    assert(pgToSpark("integer") == IntegerType)
    assert(pgToSpark("bigserial") == LongType)
    assert(pgToSpark("numeric(12,2)") == DecimalType(12, 2))
    assert(pgToSpark("double precision") == DoubleType)
    assert(pgToSpark("timestamp with time zone") == TimestampType)
    assert(pgToSpark("timestamp") == TimestampNTZType)
    assert(pgToSpark("bytea") == BinaryType)
    assert(pgToSpark("uuid") == StringType)
    assert(pgToSpark("inet") == StringType)
    assert(pgToSpark("integer[]") == ArrayType(IntegerType))
    assert(pgToSpark("text[]") == ArrayType(StringType))
  }

  test("origin type string rides in field metadata") {
    val f = TypeMapper.field("bal", "decimal(10,4)")
    assert(f.dataType == DecimalType(10, 4))
    assert(f.metadata.getString("origin_type") == "decimal(10,4)")
  }
}
