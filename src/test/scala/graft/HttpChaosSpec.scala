package graft

import java.net.{HttpURLConnection, InetSocketAddress, URI}
import java.nio.charset.StandardCharsets

import scala.collection.mutable

import com.fasterxml.jackson.databind.ObjectMapper
import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

import graft.infra.{Subscription, SubscriptionServer}
import graft.sinks.StreamLoadHttp

/** Fault injection for the two HTTP delivery paths — the crash windows
  * the success-path specs don't cover:
  *
  *  - stream load (starrocks_sinker.rs:98-169 semantics): the
  *    connection dies BETWEEN the PUT committing at the warehouse and
  *    the response arriving; the retry reuses the label and the
  *    warehouse's `Label Already Exists` + FINISHED dedup makes the
  *    visible state exactly-once. Also: die-before-commit (retry must
  *    land the data), in-band `Status: Fail` (retry), and a label
  *    stuck RUNNING (must surface as an error, not silent success).
  *
  *  - subscription (http_server_pipeline.rs:117-335 semantics): kill
  *    the server between page-serve and ack — a restarted server over
  *    the same spool re-serves every staged-but-unacked batch from
  *    the start (at-least-once); a client whose ack response was lost
  *    re-acks the same id idempotently; a client whose fetch response
  *    was lost replays via fetch_old.
  */
class HttpChaosSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = new ObjectMapper()

  // ------------------------------------------------------------------
  // chaos warehouse: scripted per-request behaviors, label-aware
  // ------------------------------------------------------------------

  /** Behaviors consumed one per request (last one repeats). */
  sealed trait Mode
  case object CommitThenDie extends Mode // commit rows, kill connection
  case object DieBeforeCommit extends Mode // kill connection, no commit
  case object FailInBand extends Mode // HTTP 200, Status: Fail
  case object RunningLabel extends Mode // Label Already Exists, RUNNING
  case object Normal extends Mode // commit or label-dedup, Success

  private final class ChaosWarehouse(script: Seq[Mode]) {
    // committed state: label -> rows (exactly-once means one entry)
    val committed = mutable.LinkedHashMap.empty[String, String]
    val requests = mutable.ArrayBuffer.empty[String]
    private var step = 0
    private val server =
      HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/", new HttpHandler {
      override def handle(ex: HttpExchange): Unit = {
        val body = new String(ex.getRequestBody.readAllBytes(),
          StandardCharsets.UTF_8)
        val label = ex.getRequestHeaders.getFirst("label")
        val mode = synchronized {
          requests += label
          val m = script(math.min(step, script.size - 1))
          step += 1
          m
        }
        def reply(json: String): Unit = {
          val b = json.getBytes(StandardCharsets.UTF_8)
          ex.sendResponseHeaders(200, b.length.toLong)
          val os = ex.getResponseBody
          try os.write(b) finally os.close()
          ex.close()
        }
        mode match {
          case CommitThenDie =>
            synchronized(committed(label) = body)
            ex.close() // no response: the client sees a dead socket
          case DieBeforeCommit =>
            ex.close()
          case FailInBand =>
            reply("""{"Status":"Fail","Message":"injected"}""")
          case RunningLabel =>
            reply("""{"Status":"Label Already Exists",""" +
              """"ExistingJobStatus":"RUNNING"}""")
          case Normal =>
            val already = synchronized {
              val a = committed.contains(label)
              if (!a) committed(label) = body
              a
            }
            if (already)
              reply("""{"Status":"Label Already Exists",""" +
                """"ExistingJobStatus":"FINISHED"}""")
            else reply("""{"Status":"Success","NumberLoadedRows":1}""")
        }
      }
    })
    server.setExecutor(null)
    server.start()
    def port: Int = server.getAddress.getPort
    def stop(): Unit = server.stop(0)
  }

  private def cfg(port: Int) = StreamLoadHttp.Config(
    "127.0.0.1", port, "db1", "t1")

  test("stream load: connection dies AFTER the warehouse committed — " +
      "the label retry dedups to exactly-once visible state") {
    val wh = new ChaosWarehouse(Seq(CommitThenDie, Normal))
    try {
      val sink = new StreamLoadHttp.HttpPayloadSink(cfg(wh.port), 7L)
      sink.put(Seq("""{"k":1}"""))
      // two requests, SAME label; the data committed ONCE
      assert(wh.requests.size == 2)
      assert(wh.requests.distinct.size == 1)
      assert(wh.committed.size == 1)
      assert(wh.committed.values.head == """[{"k":1}]""")
    } finally wh.stop()
  }

  test("stream load: connection dies BEFORE commit — the retry lands " +
      "the data once") {
    val wh = new ChaosWarehouse(Seq(DieBeforeCommit, Normal))
    try {
      val sink = new StreamLoadHttp.HttpPayloadSink(cfg(wh.port), 8L)
      sink.put(Seq("""{"k":2}"""))
      assert(wh.requests.size == 2)
      assert(wh.committed.size == 1)
      assert(wh.committed.values.head == """[{"k":2}]""")
    } finally wh.stop()
  }

  test("stream load: HTTP 200 with in-band Status Fail retries; a " +
      "second failure surfaces as StreamLoadError (batch isolation)") {
    val retryOk = new ChaosWarehouse(Seq(FailInBand, Normal))
    try {
      new StreamLoadHttp.HttpPayloadSink(cfg(retryOk.port), 9L)
        .put(Seq("""{"k":3}"""))
      assert(retryOk.committed.size == 1)
    } finally retryOk.stop()

    val bothFail = new ChaosWarehouse(Seq(FailInBand, FailInBand))
    try {
      val e = intercept[StreamLoadHttp.StreamLoadError] {
        new StreamLoadHttp.HttpPayloadSink(cfg(bothFail.port), 10L)
          .put(Seq("""{"k":4}"""))
      }
      assert(e.getMessage.contains("injected"))
      assert(bothFail.committed.isEmpty)
    } finally bothFail.stop()
  }

  test("stream load: Label Already Exists with RUNNING is NOT success " +
      "— it must surface, never silently drop the chunk") {
    val wh = new ChaosWarehouse(Seq(RunningLabel, RunningLabel))
    try {
      intercept[StreamLoadHttp.StreamLoadError] {
        new StreamLoadHttp.HttpPayloadSink(cfg(wh.port), 11L)
          .put(Seq("""{"k":5}"""))
      }
    } finally wh.stop()
  }

  // ------------------------------------------------------------------
  // subscription: kill/restart between page-serve and ack
  // ------------------------------------------------------------------

  private def get(port: Int, pathAndQuery: String): (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$pathAndQuery").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("GET")
      val code = conn.getResponseCode
      val s = if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, new String(s.readAllBytes(), "UTF-8"))
    } finally conn.disconnect()
  }

  private def post(port: Int, path: String, body: String)
      : (Int, String) = {
    val conn = URI.create(s"http://127.0.0.1:$port$path").toURL
      .openConnection().asInstanceOf[HttpURLConnection]
    try {
      conn.setRequestMethod("POST")
      conn.setDoOutput(true)
      val os = conn.getOutputStream
      try os.write(body.getBytes(StandardCharsets.UTF_8))
      finally os.close()
      val code = conn.getResponseCode
      val s = if (code >= 400) conn.getErrorStream else conn.getInputStream
      (code, new String(s.readAllBytes(), "UTF-8"))
    } finally conn.disconnect()
  }

  private def ks(fetchBody: String): (Long, Seq[Long]) = {
    val tree = mapper.readTree(fetchBody)
    val data = tree.get("data")
    (tree.get("batch_id").asLong(),
      (0 until data.size()).map(i => data.get(i).get("k").asLong()))
  }

  test("subscription: server killed MID-PAGE of a multi-page batch — " +
      "the restarted server re-serves the whole batch (at-least-once, " +
      "no partial loss)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chaos-sub").toString
    val sub = new Subscription(dir)
    sub.stage(Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d"))
      .toDF("k", "v"), 0L)

    val s1 = new SubscriptionServer(spark, sub)
    // first page only (2 of 4 rows), then the server dies un-acked
    val (_, body1) = get(s1.boundPort, "/fetch_new?batch_size=2")
    val (bid1, page1) = ks(body1)
    assert(page1.size == 2)
    s1.stop()

    // restart over the same spool: sent resets to the ack mark, so the
    // batch re-serves FROM ROW ONE — the client pages it fully now
    val s2 = new SubscriptionServer(spark, sub)
    try {
      val (_, r1) = get(s2.boundPort, "/fetch_new?batch_size=2")
      val (bid2, p1) = ks(r1)
      assert(bid2 == bid1)
      val (_, r2) = get(s2.boundPort, "/fetch_new?batch_size=2")
      val (_, p2) = ks(r2)
      assert((p1 ++ p2).sorted == Seq(1L, 2L, 3L, 4L))
      // final-page serve makes it ackable; ack completes the cycle
      val (code, _) = post(s2.boundPort, "/ack",
        s"""{"ack_batch_id":$bid2}""")
      assert(code == 200)
      val (_, empty) = get(s2.boundPort, "/fetch_new?batch_size=2")
      assert(ks(empty)._2.isEmpty)
    } finally s2.stop()
  }

  test("subscription: lost ack response — the client re-acks the same " +
      "id and the server accepts it (idempotent ack)") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chaos-ack").toString
    val sub = new Subscription(dir)
    sub.stage(Seq((1L, "a")).toDF("k", "v"), 0L)
    val s = new SubscriptionServer(spark, sub)
    try {
      val (_, body) = get(s.boundPort, "/fetch_new?batch_size=10")
      val (bid, _) = ks(body)
      // the ack lands; the RESPONSE is lost; the client retries
      assert(post(s.boundPort, "/ack", s"""{"ack_batch_id":$bid}""")._1
        == 200)
      assert(post(s.boundPort, "/ack", s"""{"ack_batch_id":$bid}""")._1
        == 200)
      assert(sub.acked() == bid)
    } finally s.stop()
  }

  test("subscription: lost fetch response — fetch_old replays the " +
      "same un-acked batch byte-for-byte") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-chaos-replay").toString
    val sub = new Subscription(dir)
    sub.stage(Seq((7L, "x"), (8L, "y")).toDF("k", "v"), 0L)
    val s = new SubscriptionServer(spark, sub)
    try {
      val (_, body) = get(s.boundPort, "/fetch_new?batch_size=10")
      val (bid, rows) = ks(body)
      // response "lost" — replay by id; identical rows, still ackable
      val (code, replay) = get(s.boundPort, s"/fetch_old?old_batch_id=$bid")
      assert(code == 200)
      assert(ks(replay)._2.sorted == rows.sorted)
      assert(post(s.boundPort, "/ack", s"""{"ack_batch_id":$bid}""")._1
        == 200)
    } finally s.stop()
  }
}
