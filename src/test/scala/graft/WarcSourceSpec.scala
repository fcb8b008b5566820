package graft

import java.io.ByteArrayOutputStream
import java.nio.charset.StandardCharsets
import java.util.zip.GZIPOutputStream

import graft.sources.WarcSource

class WarcSourceSpec extends SparkSuite {

  private def ascii(s: String): Array[Byte] =
    s.getBytes(StandardCharsets.UTF_8)

  /** Build one spec-conformant record with CRLF line ends. */
  private def record(tpe: String, uri: Option[String],
      content: Array[Byte], extra: Seq[(String, String)] = Nil,
      version: String = "1.1"): Array[Byte] = {
    val h = new StringBuilder
    h ++= s"WARC/$version\r\n"
    h ++= s"WARC-Type: $tpe\r\n"
    uri.foreach(u => h ++= s"WARC-Target-URI: $u\r\n")
    h ++= "WARC-Date: 2024-01-15T10:00:00Z\r\n"
    h ++= s"WARC-Record-ID: <urn:uuid:rec-$tpe-" +
      s"${uri.getOrElse("")}-${content.length}>\r\n"
    extra.foreach { case (k, v) => h ++= s"$k: $v\r\n" }
    h ++= s"Content-Length: ${content.length}\r\n"
    h ++= "\r\n"
    val out = new ByteArrayOutputStream()
    out.write(ascii(h.toString))
    out.write(content)
    out.write(ascii("\r\n\r\n"))
    out.toByteArray
  }

  private def cat(parts: Array[Byte]*): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    parts.foreach(out.write)
    out.toByteArray
  }

  test("frames a multi-record file: types, uris, byte-exact blocks") {
    val binary = Array[Byte](0, 1, 2, -1, -2, 13, 10, 0, 65)
    val bytes = cat(
      record("warcinfo", None, ascii("software: test-crawler")),
      record("response", Some("http://example.com/a"), binary),
      record("conversion", Some("http://example.com/a"),
        ascii("extracted plain text")))
    val recs = WarcSource.parseAll(bytes)
    assert(recs.map(_.warcType) ==
      Seq("warcinfo", "response", "conversion"))
    assert(recs(0).targetUri == null)
    assert(recs(1).targetUri == "http://example.com/a")
    assert(recs(1).content.toSeq == binary.toSeq) // CRLF inside block
    assert(recs(1).contentLength == binary.length)
    assert(recs(2).warcDate == "2024-01-15T10:00:00Z")
    assert(new String(recs(2).content, StandardCharsets.UTF_8) ==
      "extracted plain text")
  }

  test("content-length frames the block even when it contains header " +
      "look-alikes") {
    // a block that CONTAINS a full fake record — only the declared
    // byte count may decide the boundary
    val trap = record("response", Some("http://inner/fake"),
      ascii("inner"))
    val bytes = cat(
      record("response", Some("http://outer/real"), trap),
      record("metadata", None, ascii("after")))
    val recs = WarcSource.parseAll(bytes)
    assert(recs.map(_.warcType) == Seq("response", "metadata"))
    assert(recs(0).content.toSeq == trap.toSeq)
  }

  test("gzip: concatenated per-record members inflate as one stream " +
      "(the Common Crawl layout)") {
    def gz(b: Array[Byte]): Array[Byte] = {
      val bo = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bo)
      g.write(b); g.close()
      bo.toByteArray
    }
    val r1 = record("response", Some("http://x/1"), ascii("one"))
    val r2 = record("conversion", Some("http://x/2"), ascii("two"))
    val gzBytes = cat(gz(r1), gz(r2))
    val recs = WarcSource.parseAll(gzBytes)
    assert(recs.map(_.warcType) == Seq("response", "conversion"))
    assert(new String(recs(1).content, StandardCharsets.UTF_8) == "two")
  }

  test("tolerates bare-LF line ends, folded headers, and WARC/1.0 " +
      "bracketed uris") {
    val content = "text"
    val rec =
      "WARC/1.0\n" +
        "WARC-Type: conversion\n" +
        "WARC-Target-URI: <http://example.com/b>\n" +
        "WARC-Date: 2024-01-15T10:00:00Z\n" +
        "X-Long: part one\n" +
        "  and part two\n" +
        s"Content-Length: ${content.length}\n" +
        "\n" + content + "\n\n"
    val recs = WarcSource.parseAll(ascii(rec))
    assert(recs.size == 1)
    assert(recs.head.targetUri == "http://example.com/b") // brackets gone
    assert(recs.head.warcType == "conversion")
    assert(new String(recs.head.content,
      StandardCharsets.UTF_8) == content)
  }

  test("a truncated tail record is dropped; preceding records survive") {
    val good = record("response", Some("http://x/ok"), ascii("ok body"))
    val truncated = record("response", Some("http://x/cut"),
      ascii("this body will be cut")).dropRight(12)
    val recs = WarcSource.parseAll(cat(good, truncated))
    assert(recs.map(_.targetUri) == Seq("http://x/ok"))
  }

  test("extract_type=warc task: crawl dir -> record table + documents " +
      "parquet under the sink") {
    val crawl = java.nio.file.Files.createTempDirectory("warc_in")
    val sink = java.nio.file.Files.createTempDirectory("warc_out")
    java.nio.file.Files.write(crawl.resolve("seg-0.warc"), cat(
      record("warcinfo", None, ascii("software: t")),
      record("conversion", Some("http://a/1"), ascii("doc one text")),
      record("response", Some("http://a/1"), ascii("<html>"))))
    java.nio.file.Files.write(crawl.resolve("seg-1.warc"), cat(
      record("conversion", Some("http://b/2"), ascii("doc two text"))))
    val task = graft.config.TaskConfig.fromIni(
      s"""[extractor]
         |extract_type=warc
         |url=$crawl
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)
    assert(task.extractType == graft.config.TaskConfig.WarcExtract)
    val s = graft.config.TaskRunner.runWarc(spark, task)
    assert(s.records == Map("warcinfo" -> 1L, "conversion" -> 2L,
      "response" -> 1L))
    assert(s.nDocs == 2)
    // the landed documents table IS the curation-chain input shape
    val docs = spark.read.parquet(s"$sink/documents.parquet")
    assert(docs.columns.toSet ==
      Set("doc_id", "raw_id", "url", "fetched_at", "text"))
    assert(docs.select("doc_id").distinct().count() == 2)
  }

  test("incremental warc ingest: a new crawl drop frames only the " +
      "new segments; already-ingested files skip") {
    val crawl = java.nio.file.Files.createTempDirectory("warc_inc")
    val sink = java.nio.file.Files.createTempDirectory("warc_inc_out")
    java.nio.file.Files.write(crawl.resolve("seg-0.warc"), cat(
      record("conversion", Some("http://a/1"), ascii("first drop"))))
    val task = graft.config.TaskConfig.fromIni(
      s"""[extractor]
         |extract_type=warc
         |url=$crawl
         |
         |[sinker]
         |url=$sink
         |""".stripMargin)
    val s1 = graft.config.TaskRunner.runWarc(spark, task)
    assert(s1.filesProcessed == 1 && s1.filesSkipped == 0)
    assert(s1.nDocs == 1)
    // second run, nothing new: no records framed, docs unchanged
    val s2 = graft.config.TaskRunner.runWarc(spark, task)
    assert(s2.filesProcessed == 0 && s2.filesSkipped == 1)
    assert(s2.records.isEmpty && s2.nDocs == 1)
    // a new segment arrives: only IT is framed, the table accumulates
    java.nio.file.Files.write(crawl.resolve("seg-1.warc"), cat(
      record("conversion", Some("http://a/2"), ascii("second drop")),
      record("response", Some("http://a/2"), ascii("<html>"))))
    val s3 = graft.config.TaskRunner.runWarc(spark, task)
    assert(s3.filesProcessed == 1 && s3.filesSkipped == 1)
    assert(s3.records == Map("conversion" -> 1L, "response" -> 1L))
    assert(s3.nDocs == 2)
    val urls = graft.sources.WarcSource.wetDocuments(
      spark.read.parquet(s"$sink/warc_records"))
      .collect().map(_.getAs[String]("url")).toSet
    assert(urls == Set("http://a/1", "http://a/2"))
  }

  test("wetDocuments: conversion records become curation-ready docs " +
      "with stable ids") {
    val s2 = spark
    import s2.implicits._
    val bytes = cat(
      record("warcinfo", None, ascii("software: t")),
      record("conversion", Some("http://site/a"), ascii("alpha text")),
      record("response", Some("http://site/a"), ascii("<html>raw")),
      record("conversion", Some("http://site/b"),
        "unicode café text".getBytes(StandardCharsets.UTF_8)))
    val dir = java.nio.file.Files.createTempDirectory("warc").toFile
    val f = new java.io.File(dir, "part-0.warc")
    java.nio.file.Files.write(f.toPath, bytes)
    try {
      val df = WarcSource.read(spark, f.getAbsolutePath)
      assert(df.count() == 4)
      val docs = WarcSource.wetDocuments(df)
        .collect().map(r => r.getAs[String]("url") ->
          (r.getAs[Long]("doc_id"), r.getAs[String]("text"))).toMap
      assert(docs.keySet == Set("http://site/a", "http://site/b"))
      assert(docs("http://site/a")._2 == "alpha text")
      assert(docs("http://site/b")._2 == "unicode café text")
      // re-read yields identical ids (stable fold of the record id)
      val again = WarcSource.wetDocuments(
        WarcSource.read(spark, f.getAbsolutePath))
        .collect().map(r => r.getAs[String]("url") ->
          r.getAs[Long]("doc_id")).toMap
      assert(again("http://site/a") == docs("http://site/a")._1)
      // and the docs frame drives a real curation operator unchanged
      val stats = graft.operators.CurationOps.ngramNoveltyOf(
        docs.map { case (u, (id, t)) => (id, t) }.toSeq
          .toDF("doc_id", "text"))
      assert(stats.count() == 2)
    } finally {
      f.delete(); dir.delete()
    }
  }
}
