package graft

import org.apache.spark.sql.functions._

import graft.sinks.AvroEnvelope
import graft.sinks.AvroEnvelope.{Envelope, FieldDef}

/** Avro wire envelope: byte-level round-trip through the reference's
  * fixed schema (avro_converter_schema.rs), including nullable unions,
  * field descriptors, and null map values.
  */
class AvroEnvelopeSpec extends SparkSuite {
  import spark.implicits._

  test("encode/decode round-trips every envelope field") {
    val bytes = AvroEnvelope.encode(
      schemaName = "db1", tb = "t1", operation = "update",
      fields = Seq(FieldDef("id", "bigint"), FieldDef("v", "varchar(10)")),
      before = Map("id" -> "1", "v" -> "old"),
      after = Map("id" -> "1", "v" -> null),
      extra = Map("position" -> "cl:000042"))
    val e = AvroEnvelope.decode(bytes)
    assert(e == Envelope("db1", "t1", "update",
      Seq(FieldDef("id", "bigint"), FieldDef("v", "varchar(10)")),
      Map("id" -> "1", "v" -> "old"),
      Map("id" -> "1", "v" -> null),
      Map("position" -> "cl:000042")))
  }

  test("null unions stay null (insert: no before, no fields, no extra)") {
    val bytes = AvroEnvelope.encode("db", "t", "insert",
      after = Map("k" -> "x"))
    val e = AvroEnvelope.decode(bytes)
    assert(e.fields == null && e.before == null && e.extra == null)
    assert(e.after == Map("k" -> "x"))
  }

  test("schema parses as the verbatim reference envelope") {
    val s = AvroEnvelope.avroSchema
    assert(s.getName == "AvroData")
    assert(s.getFields.size() == 7)
    assert(s.getField("before").schema().getTypes.get(1).getValueType
      .getTypes.size() == 6) // null|string|long|double|bytes|boolean
  }

  test("typed value branches round-trip natively, not as strings") {
    val before = Map[String, Any]("id" -> 7L, "ok" -> false,
      "gone" -> null)
    val after = Map[String, Any]("id" -> 7L, "price" -> 1.25,
      "ok" -> true, "raw" -> Array[Byte](1, 2, 0xff.toByte),
      "name" -> "x", "gone" -> null)
    val bytes = AvroEnvelope.encodeAny("db", "t", "update",
      before, after, originTypes = Map("id" -> "bigint unsigned"))
    val e = AvroEnvelope.decodeAny(bytes)
    assert(e.before("id") == 7L && e.before("ok") == false)
    assert(e.after("price") == 1.25 && e.after("ok") == true)
    assert(e.after("raw").asInstanceOf[Array[Byte]].toSeq ==
      Seq[Byte](1, 2, -1))
    assert(e.after("name") == "x" && e.after("gone") == null)
    // field descriptors: sorted union, after's non-Null branch wins,
    // origin type from meta
    assert(e.fields.map(f => (f.name, f.avroType)) == Seq(
      ("gone", "Null"), ("id", "Long"), ("name", "String"),
      ("ok", "Boolean"), ("price", "Double"), ("raw", "Bytes")))
    assert(e.fields.find(_.name == "id").get.columnType ==
      "bigint unsigned")
  }

  test("Spark wrap/unwrap carries bytes through a DataFrame") {
    val df = Seq((1L, 10L, "insert"), (2L, 20L, "delete"))
      .toDF("id", "uid", "rt")
    val wrapped = AvroEnvelope.wrap(df, "app", "t", "topic",
      col("id"), col("rt"), beforeCols = Nil,
      afterCols = Seq("id", "uid"))
    assert(wrapped.schema("value").dataType ==
      org.apache.spark.sql.types.BinaryType)
    val back = AvroEnvelope.unwrap(wrapped)
      .select(col("key"), col("row_type"),
        element_at(col("after"), "uid").as("uid"),
        array_join(col("field_names"), ",").as("fs"))
      .as[(String, String, String, String)].collect().toSet
    assert(back == Set(("1", "insert", "10", "id,uid"),
      ("2", "delete", "20", "id,uid")))
  }
}
