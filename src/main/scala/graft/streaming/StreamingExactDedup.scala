package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.TextOps

/** Streaming exact dedup — the stream-time q33: fingerprint each
  * arriving document map-side (charFold over normalized text, the same
  * 64-bit fingerprint the batch dedup groups on) and keep only the
  * first occurrence while copies arrive within the watermark horizon.
  *
  * Spark-first: this IS Structured Streaming's
  * `dropDuplicatesWithinWatermark` — fingerprint-keyed state store
  * entries, expired by the event-time watermark, zero custom state
  * code. The watermark bounds state at any corpus rate: a fingerprint
  * older than the horizon evicts, so a copy arriving later than
  * `horizon` after its original is admitted again — the deliberate
  * trade every streaming dedup makes; the nightly batch sweep (q33 /
  * [[graft.operators.CurationOps.incrementalDedup]]) catches the
  * stragglers. Only the fingerprint keys state — text never enters
  * the state store.
  */
object StreamingExactDedup {

  /** `docs`: streaming frame with (doc_id, text, ts). Emits first
    * occurrences with their fingerprint; duplicates within the horizon
    * are dropped.
    */
  def dedup(docs: DataFrame, horizon: String = "10 minutes")
      : DataFrame =
    docs
      .withColumn("fp", TextOps.charFold(TextOps.normText(col("text"))))
      .withWatermark("ts", horizon)
      .dropDuplicatesWithinWatermark("fp")
}
