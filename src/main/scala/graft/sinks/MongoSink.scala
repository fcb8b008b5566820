package graft.sinks

import org.apache.spark.sql.Row

/** MongoDB bulk sinker — statement shapes and the streaming bulk
  * planner, mirroring
  * `/root/reference/dt-connector/src/sinker/mongo/mongo_sinker.rs`:
  * `batch_delete` = one `deleteMany {_id: {$in: [...]}}` per batch
  * (`mongo_sinker.rs:575-640`), `batch_insert` = one `insertMany`
  * (`mongo_sinker.rs:644-700`), and the serial fallback applies one
  * command per row in order (`serial_sink`) — updates become
  * `updateOne` with `$set`/`$unset` and `upsert:true`
  * (`mongo_sinker.rs:694-720`).
  *
  * Like [[RdbQueryBuilder]], the builders are pure (testable without a
  * server); commands render as MongoDB extended-JSON bulk-write ops, the
  * wire-level shape any driver accepts. The planner streams its row
  * iterator with bounded per-lane buffers — same memory contract as
  * [[Applier.planMergeable]].
  */
object MongoSink {

  /** Minimal JSON string escape (quotes + backslashes + control). */
  def jstr(s: String): String = {
    val b = new StringBuilder("\"")
    s.foreach {
      case '"' => b.append("\\\"")
      case '\\' => b.append("\\\\")
      case c if c < ' ' => b.append(f"\\u${c.toInt}%04x")
      case c => b.append(c)
    }
    b.append('"').toString
  }

  private def jdoc(doc: Map[String, String]): String =
    doc.toSeq.sortBy(_._1)
      .map { case (k, v) =>
        s"${jstr(k)}:${if (v == null) "null" else jstr(v)}"
      }
      .mkString("{", ",", "}")

  /** `deleteMany {_id: {$in: ids}}` — `mongo_sinker.rs:612-620`. */
  def deleteMany(tb: String, ids: Seq[String]): String =
    s"""{"deleteMany":{"coll":${jstr(tb)},"filter":{"_id":{"$$in":[""" +
      ids.map(jstr).mkString(",") + "]}}}}"

  /** `insertMany docs` — `mongo_sinker.rs:644-665`. */
  def insertMany(tb: String, docs: Seq[Map[String, String]]): String =
    s"""{"insertMany":{"coll":${jstr(tb)},"docs":[""" +
      docs.map(jdoc).mkString(",") + "]}}"

  /** Serial-lane single-row commands (`serial_sink`): replace-upsert for
    * inserts, `$set`/`$unset` upsert for updates, single delete.
    */
  def insertOne(tb: String, id: String, doc: Map[String, String]): String =
    s"""{"replaceOne":{"coll":${jstr(tb)},"filter":{"_id":${jstr(id)}},""" +
      s""""replacement":${jdoc(doc)},"upsert":true}}"""

  def updateOne(tb: String, id: String, set: Map[String, String],
      unset: Seq[String]): String = {
    val parts =
      (if (set.nonEmpty) Seq(s""""$$set":${jdoc(set)}""") else Nil) ++
        (if (unset.nonEmpty)
          Seq(s""""$$unset":${jdoc(unset.map(_ -> "").toMap)}""")
        else Nil)
    s"""{"updateOne":{"coll":${jstr(tb)},"filter":{"_id":${jstr(id)}},""" +
      s""""update":{${parts.mkString(",")}},"upsert":true}}"""
  }

  def deleteOne(tb: String, id: String): String =
    s"""{"deleteOne":{"coll":${jstr(tb)},"filter":{"_id":${jstr(id)}}}}"""

  /** Streaming bulk planner over one partition of merger output rows
    * (columns: tb, id, lane, doc MAP — the [[graft.operators.MongoOps
    * .mergeLanes]] shape plus the document body). Deletes and inserts
    * buffer up to `batchSize` per lane and flush as one bulk command;
    * serial rows flush BOTH lane buffers first (order fence — a serial
    * row must not overtake the merged rows it followed), then emit
    * singly. Peak held rows ≤ 2·batchSize.
    */
  def planBulk(rows: Iterator[Row], batchSize: Int = 500)
      : Iterator[String] = {
    val dels = scala.collection.mutable.ArrayBuffer[String]()
    val ups = scala.collection.mutable.ArrayBuffer[(String,
      Map[String, String])]()
    var tb: String = null
    val out = scala.collection.mutable.Queue[String]()

    def flush(): Unit = {
      if (dels.nonEmpty) { out += deleteMany(tb, dels.toSeq); dels.clear() }
      if (ups.nonEmpty) {
        out += insertMany(tb, ups.map(_._2).toSeq); ups.clear()
      }
    }

    new Iterator[String] {
      override def hasNext: Boolean = {
        while (out.isEmpty && rows.hasNext) {
          val r = rows.next()
          val rowTb = r.getAs[String]("tb")
          if (tb != null && rowTb != tb) flush() // per-collection bulks
          tb = rowTb
          val doc = Option(r.getAs[scala.collection.Map[String, String]]
            ("doc")).map(_.toMap).getOrElse(Map.empty)
          r.getAs[String]("lane") match {
            case "delete" => dels += r.getAs[String]("id")
            case "insert" => ups += ((r.getAs[String]("id"), doc))
            case _ => // serial: fence, then apply singly in order
              flush()
              val id = r.getAs[String]("id")
              out += (r.getAs[String]("row_type") match {
                case "delete" => deleteOne(tb, id)
                case "update" => updateOne(tb, id, doc, Seq.empty)
                case _ => insertOne(tb, id, doc)
              })
          }
          if (dels.size >= batchSize || ups.size >= batchSize) flush()
        }
        if (out.isEmpty && !rows.hasNext) flush()
        out.nonEmpty
      }
      override def next(): String =
        if (hasNext) out.dequeue() else Iterator.empty.next()
    }
  }
}
