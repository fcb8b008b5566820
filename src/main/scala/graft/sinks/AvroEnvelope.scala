package graft.sinks

import java.io.ByteArrayOutputStream

import scala.jdk.CollectionConverters._

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericData, GenericDatumReader,
  GenericDatumWriter, GenericRecord}
import org.apache.avro.io.{BinaryDecoder, BinaryEncoder, DecoderFactory,
  EncoderFactory}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StringType

/** The reference's Kafka wire format: Avro binary with the fixed
  * envelope schema from
  * `/root/reference/dt-common/src/meta/avro/avro_converter_schema.rs:5-129`
  * — record AvroData(schema, tb, operation, fields: union[null, array
  * of AvroFieldDef(name, column_type, avro_type)], before/after/extra:
  * union[null, map of union[null,string,long,double,bytes,boolean]]).
  * Key = first order-col value as a plain string
  * (`avro_converter.rs:57-75`); value = the encoded record
  * (`avro_converter.rs:77-130`).
  *
  * The container has avro-core (no spark-avro module), so the datum
  * writer/reader are driven directly. Spark-side the encode/decode are
  * UDFs over the same struct contract [[KafkaEnvelope]] uses — one
  * per-row library call with NO shuffle implications; the encoder,
  * writer, and scratch buffer are reused per thread (Avro's binary
  * en/decoders are not thread-safe, and allocating per row would
  * dominate the cost at scale).
  */
object AvroEnvelope {

  /** Verbatim envelope schema (avro_converter_schema.rs:5-129). */
  val SchemaJson: String =
    """{
      |  "type": "record", "name": "AvroData",
      |  "fields": [
      |    {"name": "schema", "type": "string", "default": ""},
      |    {"name": "tb", "type": "string", "default": ""},
      |    {"name": "operation", "type": "string", "default": ""},
      |    {"name": "fields", "default": null, "type": ["null",
      |      {"type": "array", "items": {
      |        "name": "AvroFieldDef", "type": "record", "fields": [
      |          {"name": "name", "type": "string"},
      |          {"name": "column_type", "type": "string",
      |           "default": "string"},
      |          {"name": "avro_type", "type": "string",
      |           "default": "String"}]}}]},
      |    {"name": "before", "default": null, "type": ["null",
      |      {"type": "map",
      |       "values": ["null", "string", "long", "double", "bytes",
      |                  "boolean"]}]},
      |    {"name": "after", "default": null, "type": ["null",
      |      {"type": "map",
      |       "values": ["null", "string", "long", "double", "bytes",
      |                  "boolean"]}]},
      |    {"name": "extra", "default": null, "type": ["null",
      |      {"type": "map",
      |       "values": ["null", "string", "long", "double", "bytes",
      |                  "boolean"]}]}
      |  ]
      |}""".stripMargin

  @transient lazy val avroSchema: Schema =
    new Schema.Parser().parse(SchemaJson)
  @transient private lazy val fieldDefSchema: Schema =
    avroSchema.getField("fields").schema().getTypes.get(1).getElementType

  /** One field descriptor (rsgen struct AvroFieldDef,
    * avro_converter_schema.rs:131-140). `avroType` is the encoded value
    * branch — always "String" here because the engine normalizes
    * schemaless images to string maps (SURVEY §1.3).
    */
  final case class FieldDef(name: String, columnType: String,
      avroType: String = "String")

  /** Decoded envelope. */
  final case class Envelope(schema: String, tb: String, operation: String,
      fields: Seq[FieldDef], before: Map[String, String],
      after: Map[String, String], extra: Map[String, String])

  // Per-thread reusable machinery: encoders/decoders are stateful and
  // not thread-safe; Spark runs many tasks per executor JVM.
  private val localOut = ThreadLocal.withInitial[ByteArrayOutputStream](
    () => new ByteArrayOutputStream(512))
  private val localEnc = new ThreadLocal[BinaryEncoder]
  private val localDec = new ThreadLocal[BinaryDecoder]
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](avroSchema)
  @transient private lazy val reader =
    new GenericDatumReader[GenericRecord](avroSchema)

  private def toAvroMap(m: Map[String, String]): AnyRef =
    if (m == null) null
    else m.map { case (k, v) => k -> (v: AnyRef) }.asJava

  // ------------------------------------------------------------------
  // Typed value branches — the union [null,string,long,double,bytes,
  // boolean] carries native scalars, not just strings; the branch per
  // engine value mirrors avro_converter.rs:299-339 (ints/bit/set/enum →
  // Long, float → Double, blob/json-bytes → Bytes, temporal/decimal →
  // String, bool → Boolean, None/UnchangedToast → Null).
  // ------------------------------------------------------------------

  private def toAvroValue(v: Any): AnyRef = v match {
    case null => null
    case b: Boolean => java.lang.Boolean.valueOf(b)
    case b: Byte => java.lang.Long.valueOf(b.toLong)
    case s: Short => java.lang.Long.valueOf(s.toLong)
    case i: Int => java.lang.Long.valueOf(i.toLong)
    case l: Long => java.lang.Long.valueOf(l)
    case f: Float => java.lang.Double.valueOf(f.toDouble)
    case d: Double => java.lang.Double.valueOf(d)
    case b: Array[Byte] => java.nio.ByteBuffer.wrap(b)
    case s: String => s
    case other => other.toString
  }

  /** The rsgen variant name for a value's union branch
    * (avro_converter.rs before/after_avro_types).
    */
  def avroTypeName(v: Any): String = v match {
    case null => "Null"
    case _: Boolean => "Boolean"
    case _: Byte | _: Short | _: Int | _: Long => "Long"
    case _: Float | _: Double => "Double"
    case _: Array[Byte] => "Bytes"
    case _ => "String"
  }

  private def toAvroMapAny(m: Map[String, Any]): AnyRef =
    if (m == null) null
    else m.map { case (k, v) => k -> toAvroValue(v) }.asJava

  /** Field descriptors for a typed row: union of image columns, sorted;
    * the after image's non-Null branch wins over before's
    * (avro_converter.rs:122-130).
    */
  def fieldDefsFor(before: Map[String, Any], after: Map[String, Any],
      originTypes: Map[String, String] = Map.empty): Seq[FieldDef] = {
    val b = Option(before).getOrElse(Map.empty)
    val a = Option(after).getOrElse(Map.empty)
    (b.keySet ++ a.keySet).toSeq.sorted.map { c =>
      val bt = b.get(c).map(avroTypeName).getOrElse("")
      val at = a.get(c).map(avroTypeName).getOrElse("")
      val t = if (at.nonEmpty && at != "Null") at
        else if (bt.nonEmpty) bt else "Null"
      FieldDef(c, originTypes.getOrElse(c, ""), t)
    }
  }

  /** Typed encode: images carry native scalars per the union. */
  def encodeAny(schemaName: String, tb: String, operation: String,
      before: Map[String, Any], after: Map[String, Any],
      originTypes: Map[String, String] = Map.empty,
      extra: Map[String, Any] = null,
      // [sinker]/[pipeline] with_field_defs=false drops the per-field
      // type list from every envelope (avro_converter.rs:122-130) —
      // smaller messages when the consumer already knows the schema
      withFieldDefs: Boolean = true): Array[Byte] = {
    val rec = new GenericData.Record(avroSchema)
    rec.put("schema", schemaName)
    rec.put("tb", tb)
    rec.put("operation", operation)
    val defs =
      if (withFieldDefs) fieldDefsFor(before, after, originTypes)
      else Nil
    rec.put("fields",
      if (defs.isEmpty) null
      else defs.map { f =>
        val fr = new GenericData.Record(fieldDefSchema)
        fr.put("name", f.name)
        fr.put("column_type", f.columnType)
        fr.put("avro_type", f.avroType)
        fr
      }.asJava)
    rec.put("before", toAvroMapAny(before))
    rec.put("after", toAvroMapAny(after))
    rec.put("extra", toAvroMapAny(extra))
    writeRecord(rec)
  }

  private def fromAvroValue(v: AnyRef): Any = v match {
    case null => null
    case l: java.lang.Long => l.longValue()
    case d: java.lang.Double => d.doubleValue()
    case b: java.lang.Boolean => b.booleanValue()
    case bb: java.nio.ByteBuffer =>
      val out = new Array[Byte](bb.remaining())
      bb.duplicate().get(out)
      out
    case other => other.toString
  }

  private def fromAvroMapAny(v: AnyRef): Map[String, Any] = v match {
    case null => null
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, vv) =>
        k.toString -> fromAvroValue(vv.asInstanceOf[AnyRef])
      }.toMap
    case other => throw new IllegalArgumentException(s"not a map: $other")
  }

  /** Typed decode mirror of [[encodeAny]]. */
  final case class TypedEnvelope(schema: String, tb: String,
      operation: String, fields: Seq[FieldDef],
      before: Map[String, Any], after: Map[String, Any],
      extra: Map[String, Any])

  def decodeAny(bytes: Array[Byte]): TypedEnvelope = {
    val rec = readRecord(bytes)
    TypedEnvelope(rec.get("schema").toString, rec.get("tb").toString,
      rec.get("operation").toString, readFieldDefs(rec),
      fromAvroMapAny(rec.get("before")),
      fromAvroMapAny(rec.get("after")),
      fromAvroMapAny(rec.get("extra")))
  }

  def encode(schemaName: String, tb: String, operation: String,
      fields: Seq[FieldDef] = null, before: Map[String, String] = null,
      after: Map[String, String] = null,
      extra: Map[String, String] = null): Array[Byte] = {
    val rec = new GenericData.Record(avroSchema)
    rec.put("schema", schemaName)
    rec.put("tb", tb)
    rec.put("operation", operation)
    rec.put("fields",
      if (fields == null) null
      else fields.map { f =>
        val fr = new GenericData.Record(fieldDefSchema)
        fr.put("name", f.name)
        fr.put("column_type", f.columnType)
        fr.put("avro_type", f.avroType)
        fr
      }.asJava)
    rec.put("before", toAvroMap(before))
    rec.put("after", toAvroMap(after))
    rec.put("extra", toAvroMap(extra))
    writeRecord(rec)
  }

  private def writeRecord(rec: GenericRecord): Array[Byte] = {
    val out = localOut.get()
    out.reset()
    val enc = EncoderFactory.get().binaryEncoder(out, localEnc.get())
    localEnc.set(enc)
    writer.write(rec, enc)
    enc.flush()
    out.toByteArray
  }

  private def readRecord(bytes: Array[Byte]): GenericRecord = {
    val dec = DecoderFactory.get().binaryDecoder(bytes, localDec.get())
    localDec.set(dec)
    reader.read(null, dec)
  }

  private def readFieldDefs(rec: GenericRecord): Seq[FieldDef] =
    rec.get("fields") match {
      case null => null
      case l: java.util.List[_] =>
        l.asScala.toSeq.map { case fr: GenericRecord =>
          FieldDef(fr.get("name").toString,
            fr.get("column_type").toString, fr.get("avro_type").toString)
        }
      case other => throw new IllegalArgumentException(
        s"bad fields: $other")
    }

  private def fromAvroMap(v: AnyRef): Map[String, String] = v match {
    case null => null
    case m: java.util.Map[_, _] =>
      m.asScala.map { case (k, v) =>
        k.toString -> (if (v == null) null else v.toString)
      }.toMap
    case other => throw new IllegalArgumentException(s"not a map: $other")
  }

  def decode(bytes: Array[Byte]): Envelope = {
    val rec = readRecord(bytes)
    Envelope(rec.get("schema").toString, rec.get("tb").toString,
      rec.get("operation").toString, readFieldDefs(rec),
      fromAvroMap(rec.get("before")), fromAvroMap(rec.get("after")),
      fromAvroMap(rec.get("extra")))
  }

  // ------------------------------------------------------------------
  // Spark wiring — same surface as KafkaEnvelope, binary value column.
  // ------------------------------------------------------------------

  private val encodeUdf = udf((schemaName: String, tb: String,
      op: String, before: Map[String, String],
      after: Map[String, String]) => {
    // field defs derive from the union of image keys, sorted — the
    // reference's merge_cols + sort (avro_converter.rs:78-89)
    val cols = ((if (before == null) Set.empty[String]
      else before.keySet) ++
      (if (after == null) Set.empty[String] else after.keySet))
      .toSeq.sorted
    val defs =
      if (cols.isEmpty) null
      else cols.map(c => FieldDef(c, columnType = "string"))
    encode(schemaName, tb, op, defs, before, after)
  })

  private val decodeUdf = udf((bytes: Array[Byte]) => {
    val e = decode(bytes)
    (e.schema, e.tb, e.operation,
      if (e.fields == null) null else e.fields.map(_.name),
      e.before, e.after)
  })

  /** Wrap a change batch as Kafka-ready (key, value: binary, topic). */
  def wrap(df: DataFrame, schemaName: String, tb: String, topic: String,
      keyCol: Column, rowType: Column, beforeCols: Seq[String],
      afterCols: Seq[String]): DataFrame = {
    def asMap(cols: Seq[String]) =
      if (cols.isEmpty)
        lit(null).cast(org.apache.spark.sql.types.MapType(StringType,
          StringType))
      else map(cols.flatMap(c => Seq(lit(c), col(c).cast(StringType))): _*)
    df.select(
      keyCol.cast(StringType).as("key"),
      encodeUdf(lit(schemaName), lit(tb), rowType,
        asMap(beforeCols), asMap(afterCols)).as("value"),
      lit(topic).as("topic"))
  }

  /** Reverse path: Avro bytes back to the change shape. */
  def unwrap(df: DataFrame): DataFrame =
    df.select(col("key"), decodeUdf(col("value")).as("v"))
      .select(col("key"), col("v._1").as("schema"), col("v._2").as("tb"),
        col("v._3").as("row_type"), col("v._4").as("field_names"),
        col("v._5").as("before"), col("v._6").as("after"))
}
