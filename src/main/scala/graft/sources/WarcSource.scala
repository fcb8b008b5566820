package graft.sources

import java.io.ByteArrayInputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC / WET ingestion — the Common Crawl entry path of a training-data
  * pipeline. Implements the ISO 28500 (WARC 1.0/1.1) record framing:
  *
  * {{{
  * WARC/1.1<CRLF>
  * Header-Name: value<CRLF> ...
  * <CRLF>
  * <exactly Content-Length bytes of block>
  * <CRLF><CRLF>
  * }}}
  *
  * Notes on the format (from the public spec + Common Crawl practice):
  *  - `Content-Length` counts the BYTES of the record block — the
  *    cursor walks `Array[Byte]` offsets, decoding to UTF-8 only when
  *    a text field is extracted (same byte-first discipline as the
  *    repo's RESP/RDB/binlog parsers).
  *  - Header names are case-insensitive; values may continue over
  *    folded lines (leading SP/TAB).
  *  - Common Crawl gzips each record as its own gzip MEMBER and
  *    concatenates them; `GZIPInputStream` walks concatenated members,
  *    so one stream pass inflates the whole file.
  *  - Bare-LF line ends are tolerated (some writers emit them), CRLF
  *    is canonical.
  *
  * Scale shape: the file is the parallelism unit — a Common Crawl
  * segment is ~1 GB and one task inflates + frames it sequentially
  * (framing is inherently serial within a file: record boundaries are
  * only known after the previous Content-Length). A 100 TB crawl is
  * ~100k files → ~100k tasks, far beyond any executor count, so
  * per-file serialism costs nothing at cluster scale. Downstream of
  * the frame, `wetDocuments` is a per-row projection that feeds the
  * normal curation operators (q30-q134).
  */
object WarcSource {

  /** One framed record: the WARC named fields the pipeline routes on,
    * plus the raw block bytes.
    */
  case class WarcRecord(
      warcType: String,
      targetUri: String, // null when absent (warcinfo etc.)
      warcDate: String, // null when absent
      recordId: String, // null when absent
      contentType: String, // null when absent
      contentLength: Long,
      content: Array[Byte])

  /** Frame every record of a (possibly multi-member-gzipped) WARC
    * file. Pure bytes → records; spec-testable without Spark. Trailing
    * bytes that do not begin a well-formed record terminate the walk
    * (a truncated tail record is dropped, matching how crawl readers
    * treat an interrupted fetch), but a malformed Content-Length in an
    * otherwise well-formed header is an error — silently skipping it
    * would desynchronize every record after it.
    */
  def parseAll(bytes: Array[Byte]): Seq[WarcRecord] = {
    val raw =
      if (bytes.length >= 2 && (bytes(0) & 0xff) == 0x1f &&
        (bytes(1) & 0xff) == 0x8b) gunzipAll(bytes)
      else bytes
    val out = Seq.newBuilder[WarcRecord]
    var pos = 0
    var done = false
    while (!done && pos < raw.length) {
      pos = skipNewlines(raw, pos)
      if (pos >= raw.length || !startsWithVersion(raw, pos)) done = true
      else {
        parseOne(raw, pos) match {
          case Some((rec, next)) => out += rec; pos = next
          case None => done = true // truncated tail record
        }
      }
    }
    out.result()
  }

  /** Inflate concatenated gzip members (the Common Crawl layout). */
  def gunzipAll(bytes: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(bytes.length * 4)
    val buf = new Array[Byte](64 * 1024)
    var n = in.read(buf)
    while (n >= 0) {
      out.write(buf, 0, n)
      n = in.read(buf)
    }
    out.toByteArray
  }

  private def startsWithVersion(b: Array[Byte], pos: Int): Boolean = {
    val v = "WARC/".getBytes(StandardCharsets.US_ASCII)
    b.length >= pos + v.length &&
    v.indices.forall(i => b(pos + i) == v(i))
  }

  private def skipNewlines(b: Array[Byte], start: Int): Int = {
    var p = start
    while (p < b.length && (b(p) == '\r' || b(p) == '\n')) p += 1
    p
  }

  /** Read one header line ending at CRLF (or bare LF); returns
    * (line-without-terminator, next-pos), or None when the buffer ends
    * first.
    */
  private def readLine(b: Array[Byte], start: Int): Option[(String, Int)] = {
    var p = start
    while (p < b.length && b(p) != '\n') p += 1
    if (p >= b.length) None
    else {
      val end = if (p > start && b(p - 1) == '\r') p - 1 else p
      Some((new String(b, start, end - start,
        StandardCharsets.UTF_8), p + 1))
    }
  }

  private def parseOne(b: Array[Byte],
      start: Int): Option[(WarcRecord, Int)] = {
    // version line
    var cur = readLine(b, start) match {
      case Some((line, next)) if line.startsWith("WARC/") => next
      case _ => return None
    }
    // header block until the blank line, with folded continuations
    val headers = scala.collection.mutable.LinkedHashMap[String, String]()
    var lastKey: String = null
    var blank = false
    while (!blank) {
      readLine(b, cur) match {
        case None => return None
        case Some((line, next)) =>
          cur = next
          if (line.isEmpty) blank = true
          else if ((line.charAt(0) == ' ' || line.charAt(0) == '\t') &&
            lastKey != null)
            headers(lastKey) = headers(lastKey) + " " + line.trim
          else {
            val i = line.indexOf(':')
            if (i < 0) return None
            lastKey = line.substring(0, i).trim.toLowerCase
            headers(lastKey) = line.substring(i + 1).trim
          }
      }
    }
    val len = headers.get("content-length") match {
      case Some(v) => v.toLong // malformed length = hard error
      case None => return None
    }
    if (cur + len > b.length) return None // truncated block
    val content = java.util.Arrays.copyOfRange(b, cur, cur + len.toInt)
    val rec = WarcRecord(
      warcType = headers.getOrElse("warc-type", ""),
      targetUri = headers.get("warc-target-uri")
        .map(stripUriBrackets).orNull,
      warcDate = headers.getOrElse("warc-date", null),
      recordId = headers.getOrElse("warc-record-id", null),
      contentType = headers.getOrElse("content-type", null),
      contentLength = len,
      content = content)
    Some((rec, (cur + len).toInt))
  }

  /** WARC 1.0 wrote `WARC-Target-URI: <uri>` with literal angle
    * brackets in some writers; 1.1 forbids them. Strip when present so
    * both generations route identically.
    */
  private def stripUriBrackets(u: String): String =
    if (u.length >= 2 && u.charAt(0) == '<' &&
      u.charAt(u.length - 1) == '>') u.substring(1, u.length - 1)
    else u

  /** Distributed read: one task per WARC/WET file. Accepts one glob
    * or an explicit file list (the incremental ingest's delta).
    */
  def read(spark: SparkSession, paths: String*): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(paths: _*)
      .select(col("path"), col("content"))
      .as[(String, Array[Byte])]
      .flatMap { case (p, bytes) =>
        parseAll(bytes).map(r => (p, r.warcType, r.targetUri,
          r.warcDate, r.recordId, r.contentType, r.contentLength,
          r.content))
      }
      .toDF("file", "warc_type", "target_uri", "warc_date",
        "record_id", "content_type", "content_length", "content")
  }

  /** WET conversion records as curation-ready documents: one row per
    * `conversion` record, text decoded as UTF-8, doc_id a stable
    * 64-bit fold of the record id (falling back to uri+date), so
    * re-reading the same crawl yields the same ids. Feeds directly
    * into the q30+ operator battery.
    */
  def wetDocuments(records: DataFrame): DataFrame = {
    // id precedence: record id, then uri+date, then the content bytes
    // themselves — concat_ws of two absent fields is "" (never null),
    // so nullif keeps a metadata-stripped record from colliding every
    // such document onto charFold("")
    val idSource = coalesce(col("record_id"),
      nullif(concat_ws("|", col("target_uri"), col("warc_date")),
        lit("")),
      hex(md5(col("content"))))
    // raw_id rides alongside the 64-bit fold: a fold collision between
    // two distinct records then surfaces as two rows sharing doc_id
    // with different raw_id (detectable, auditable) instead of one
    // legitimate document silently vanishing in a doc_id-only dedup —
    // the ingest dedups on (doc_id, raw_id) so only true crash
    // replays collapse
    records.filter(col("warc_type") === "conversion")
      .select(
        graft.functions.GraftFunctions.charFold(idSource).as("doc_id"),
        idSource.as("raw_id"),
        col("target_uri").as("url"),
        col("warc_date").as("fetched_at"),
        decode(col("content"), "UTF-8").as("text"))
  }
}
