package graft.sinks

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Kafka sink/source envelope — the reference's Avro message shape
  * (/root/reference/dt-common/src/meta/avro/avro_converter.rs:58-130:
  * key = first order-col value, value = {schema, tb, operation, before,
  * after, field descriptors}) carried as JSON.
  *
  * This environment ships without the spark-avro module, so the envelope
  * is JSON end-to-end (`to_json`/`from_json` — codegen'd, schema-checked);
  * swapping in `to_avro`/`from_avro` at deploy time is a two-line change
  * because both sides speak the same struct.
  */
object KafkaEnvelope {

  /** The value payload schema (before/after as string maps — the
    * schema-less per-event shape, FIXTURES.md §2).
    */
  val valueSchema: StructType = StructType(Seq(
    StructField("schema", StringType),
    StructField("tb", StringType),
    StructField("operation", StringType),
    StructField("before", MapType(StringType, StringType)),
    StructField("after", MapType(StringType, StringType))))

  /** Wrap a change batch: key/value/topic columns ready for the Kafka
    * writer (`format("kafka")` needs exactly key+value+topic).
    */
  def wrap(df: DataFrame, schemaName: String, tb: String, topic: String,
      keyCol: Column, rowType: Column, beforeCols: Seq[String],
      afterCols: Seq[String]): DataFrame = {
    def asMap(cols: Seq[String]) =
      if (cols.isEmpty) lit(null).cast(MapType(StringType, StringType))
      else map(cols.flatMap(c =>
        Seq(lit(c), col(c).cast(StringType))): _*)
    df.select(
      keyCol.cast(StringType).as("key"),
      to_json(struct(
        lit(schemaName).as("schema"),
        lit(tb).as("tb"),
        rowType.as("operation"),
        asMap(beforeCols).as("before"),
        asMap(afterCols).as("after"))).as("value"),
      lit(topic).as("topic"))
  }

  /** Reverse path (the reference's kafka_extractor): parse the envelope
    * back into the change shape.
    */
  def unwrap(df: DataFrame): DataFrame =
    df.select(col("key"),
        from_json(col("value"), valueSchema).as("v"))
      .select(col("key"), col("v.schema").as("schema"),
        col("v.tb").as("tb"), col("v.operation").as("row_type"),
        col("v.before").as("before"), col("v.after").as("after"))
}
