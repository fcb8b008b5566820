package graft

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.sinks.{StreamLoadHttp, StreamLoadSink}
import graft.sinks.StreamLoadHttp._

/** Stream-load HTTP cycle against an in-JVM loopback warehouse stub:
  * request synthesis (headers, label, hard-delete op, array body),
  * response gating (HTTP 200 AND Status=Success), label-based retry
  * idempotency, and the end-to-end ship() path.
  */
class StreamLoadHttpSpec extends SparkSuite {

  /** Records every request; replies from a programmable queue. */
  private final class WarehouseStub {
    final case class Seen(method: String, path: String,
        headers: Map[String, String], body: String)
    val seen = mutable.ArrayBuffer.empty[Seen]
    // (status, body) per request; empty → default success
    val replies = mutable.Queue.empty[(Int, String)]
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = try {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        import scala.jdk.CollectionConverters._
        val headers = ex.getRequestHeaders.asScala.map { case (k, v) =>
          k.toLowerCase -> v.get(0)
        }.toMap
        synchronized {
          seen += Seen(ex.getRequestMethod,
            ex.getRequestURI.getPath, headers, body)
        }
        val (status, reply) = synchronized {
          if (replies.nonEmpty) replies.dequeue()
          else (200, """{"Status":"Success","NumberLoadedRows":1}""")
        }
        val bytes = reply.getBytes(StandardCharsets.UTF_8)
        ex.sendResponseHeaders(status, bytes.length.toLong)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      } finally ex.close()
    })
    server.setExecutor(null)
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def cfg(port: Int, hard: Boolean = false) =
    Config("127.0.0.1", port, "db1", "tb1", "root", "secret", hard)

  test("request synthesis: url, stream-load headers, label, op") {
    val c = cfg(8030)
    val req = buildRequest(c, batchId = 7, part = 0, chunk = 2,
      rows = Seq("""{"id":1}""", """{"id":2}"""))
    assert(req.method == "PUT")
    assert(req.url ==
      "http://127.0.0.1:8030/api/db1/tb1/_stream_load")
    assert(req.headers("format") == "json")
    assert(req.headers("strip_outer_array") == "true")
    assert(req.headers("timezone") == "UTC")
    assert(req.headers("Expect") == "100-continue")
    // basic auth of root:secret
    assert(req.headers("Authorization") == "Basic " +
      java.util.Base64.getEncoder.encodeToString(
        "root:secret".getBytes("UTF-8")))
    assert(req.headers("label") == "graft-db1-tb1-7-0-2")
    assert(!req.headers.contains("columns")) // upsert: no __op
    assert(req.body == """[{"id":1},{"id":2}]""")
    // hard delete batches carry the __op columns header
    val del = buildRequest(c, 7, 0, 0, Seq("""{"id":1}"""), op = "delete")
    assert(del.headers("columns") == "__op='delete'")
  }

  test("response gate: 200+Success only, label-exists idempotency") {
    checkResponse(200, """{"Status":"Success"}""")
    checkResponse(200,
      """{"Status":"Label Already Exists",
        |"ExistingJobStatus":"FINISHED"}""".stripMargin)
    intercept[StreamLoadError](checkResponse(500, "oops"))
    intercept[StreamLoadError](checkResponse(200,
      """{"Status":"Fail","Message":"too many filtered rows"}"""))
    intercept[StreamLoadError](checkResponse(200,
      """{"Status":"Label Already Exists",
        |"ExistingJobStatus":"RUNNING"}""".stripMargin))
  }

  test("loopback PUT: request arrives intact, rt retry reuses label") {
    val stub = new WarehouseStub
    try {
      val c = cfg(stub.port)
      val sink = new HttpPayloadSink(c, batchId = 3)
      sink.put(Seq("""{"id":10,"v":"x"}"""))
      val first = stub.seen.head
      assert(first.method == "PUT" &&
        first.path == "/api/db1/tb1/_stream_load")
      assert(first.headers("label") == "graft-db1-tb1-3-0-0")
      assert(first.headers("format") == "json")
      assert(first.body == """[{"id":10,"v":"x"}]""")

      // transient failure then label-exists-FINISHED: both attempts
      // must carry the SAME label (idempotent retry), and the second
      // is accepted
      stub.replies.enqueue((500, "backend briefly down"))
      stub.replies.enqueue((200,
        """{"Status":"Label Already Exists",""" +
          """"ExistingJobStatus":"FINISHED"}"""))
      sink.put(Seq("""{"id":11}"""))
      val attempts = stub.seen.drop(1)
      assert(attempts.length == 2)
      assert(attempts.forall(
        _.headers("label") == "graft-db1-tb1-3-0-1"))

      // persistent in-band failure: 200 + Status=Fail on every attempt
      // → batch-error surfaces (isolation hands it to the caller)
      stub.replies.enqueue((200, """{"Status":"Fail","Message":"m"}"""))
      stub.replies.enqueue((200, """{"Status":"Fail","Message":"m"}"""))
      intercept[StreamLoadError](sink.put(Seq("""{"id":12}""")))
    } finally stub.stop()
  }

  test("end-to-end ship(): sign columns + chunked array payloads") {
    val sparkSession = spark
    import sparkSession.implicits._
    val stub = new WarehouseStub
    try {
      val c = cfg(stub.port)
      val df = StreamLoadSink.withSignColumns(
        Seq((1L, "a", "insert"), (2L, "b", "delete"), (3L, "c", "update"))
          .toDF("id", "v", "rt"),
        org.apache.spark.sql.functions.col("rt"),
        org.apache.spark.sql.functions.col("id"))
        .drop("rt").coalesce(1)
      StreamLoadSink.ship(df, () => new HttpPayloadSink(c, 0),
        batchRows = 2)
      // 3 rows at 2 rows/chunk on one partition → 2 PUTs
      assert(stub.seen.length == 2)
      val mapper = new ObjectMapper()
      val rows = stub.seen.flatMap { s =>
        val arr = mapper.readTree(s.body)
        (0 until arr.size()).map(arr.get)
      }
      assert(rows.length == 3)
      val byId = rows.map(r => r.get("id").asLong() -> r).toMap
      assert(byId(2L).get(StreamLoadSink.IsDeletedCol).asInt() == 1)
      assert(byId(1L).get(StreamLoadSink.IsDeletedCol).asInt() == 0)
      assert(byId(3L).get(StreamLoadSink.VersionCol).asLong() == 3L)
      // chunk labels advance per put
      assert(stub.seen.map(_.headers("label")).toSet ==
        Set("graft-db1-tb1-0-0-0", "graft-db1-tb1-0-0-1"))
    } finally stub.stop()
  }

  test("multi-partition ship(): distinct labels per partition, " +
      "no rows lost to label dedup") {
    val sparkSession = spark
    import sparkSession.implicits._
    val stub = new WarehouseStub
    try {
      val c = cfg(stub.port)
      // 4 partitions of the same micro-batch: before the partition
      // discriminator, partitions 2..4 collided with partition 1's
      // label and the warehouse's Label-Already-Exists dedup silently
      // dropped their rows
      val df = (1L to 20L).toDF("id").repartition(4)
      StreamLoadSink.ship(df, () => new HttpPayloadSink(c, batchId = 5),
        batchRows = 100)
      val labels = stub.seen.map(_.headers("label"))
      assert(labels.distinct.length == labels.length,
        s"colliding labels: $labels")
      // every partition's first chunk is labelled with ITS partition id
      assert(labels.forall(_.matches("graft-db1-tb1-5-\\d+-0")))
      val mapper = new ObjectMapper()
      val ids = stub.seen.flatMap { s =>
        val arr = mapper.readTree(s.body)
        (0 until arr.size()).map(arr.get(_).get("id").asLong())
      }
      assert(ids.sorted == (1L to 20L).toVector)
    } finally stub.stop()
  }
}
