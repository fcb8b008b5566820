package graft

import java.net.{HttpURLConnection, URI}
import java.nio.charset.StandardCharsets

import com.fasterxml.jackson.databind.ObjectMapper

import graft.infra.{Subscription, SubscriptionServer}

/** The subscription protocol served over real loopback HTTP: a real
  * client drives /info, /fetch_new (with piggybacked ack), /fetch_old
  * and POST /ack against the parquet spool, including the reference's
  * 400 validations and ack persistence across a server restart.
  */
class SubscriptionServerSpec extends SparkSuite {
  import spark.implicits._

  private val mapper = new ObjectMapper()

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

  private def ids(fetchBody: String): (Long, Seq[Long]) = {
    val tree = mapper.readTree(fetchBody)
    val data = tree.get("data")
    (tree.get("batch_id").asLong(),
      (0 until data.size()).map(i => data.get(i).get("k").asLong()))
  }

  test("fetch/ack protocol over HTTP with validations and restart") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-subhttp").toString
    val sub = new Subscription(dir)
    sub.stage(Seq((1L, "a"), (2L, "b")).toDF("k", "v"), 0L)
    sub.stage(Seq((3L, "c")).toDF("k", "v"), 1L)
    sub.stage(Seq((4L, "d")).toDF("k", "v"), 2L)

    val server = new SubscriptionServer(spark, sub)
    try {
      val p = server.boundPort
      // nothing served yet
      val (ic, ib) = get(p, "/info")
      assert(ic == 200 &&
        ib == """{"acked_batch_id":-1,"sent_batch_id":-1}""")

      // first fetch serves batch 0
      val (c0, b0) = get(p, "/fetch_new?batch_size=100")
      assert(c0 == 200 && ids(b0) == ((0L, Seq(1L, 2L))))

      // piggybacked ack of 0 + fetch serves batch 1
      val (c1, b1) = get(p, "/fetch_new?batch_size=100&ack_batch_id=0")
      assert(c1 == 200 && ids(b1) == ((1L, Seq(3L))))
      assert(sub.acked() == 0L)

      // explicit ack of 1
      val (ac, ab) = post(p, "/ack", """{"ack_batch_id":1}""")
      assert(ac == 200 && ab == """{"acked_batch_id":1}""")

      // validations, mirroring the reference's 400s
      val (badHigh, msgHigh) = post(p, "/ack", """{"ack_batch_id":9}""")
      assert(badHigh == 400 && msgHigh.contains("must <= sent_batch_id"))
      val (badLow, msgLow) = post(p, "/ack", """{"ack_batch_id":0}""")
      assert(badLow == 400 && msgLow.contains("must >= acked_batch_id"))
      val (foHigh, foHighMsg) = get(p, "/fetch_old?old_batch_id=2")
      assert(foHigh == 400 &&
        foHighMsg.contains("must <= sent_batch_id"))
      val (foLow, foLowMsg) = get(p, "/fetch_old?old_batch_id=1")
      assert(foLow == 400 && foLowMsg.contains("must > acked_batch_id"))

      // serve batch 2, then replay it via fetch_old
      val (c2, b2) = get(p, "/fetch_new?batch_size=100")
      assert(c2 == 200 && ids(b2) == ((2L, Seq(4L))))
      val (fo, fob) = get(p, "/fetch_old?old_batch_id=2")
      assert(fo == 200 && ids(fob) == ((2L, Seq(4L))))

      // nothing new: empty data at the CURRENT sent id (always
      // ackable — the reference stores sent_batch_id unconditionally)
      val (ce, be) = ids(get(p, "/fetch_new?batch_size=100")._2) match {
        case (bid, rows) => (bid, rows)
      }
      assert(ce == 2L && be.isEmpty && server.sent == 2L)
    } finally server.stop()

    // restart: acks persisted (ack.offset), unacked batch 2 re-serves
    val server2 = new SubscriptionServer(spark, sub)
    try {
      val p2 = server2.boundPort
      val (_, ib2) = get(p2, "/info")
      assert(ib2 == """{"acked_batch_id":1,"sent_batch_id":1}""")
      val (cr, br) = get(p2, "/fetch_new?batch_size=100")
      assert(cr == 200 && ids(br) == ((2L, Seq(4L))))
      // an empty poll's batch_id is ackable (reference parity: it
      // stores sent_batch_id unconditionally, so the id it reports is
      // always a valid ack target)
      val (ce2, be2) = ids(get(p2, "/fetch_new?batch_size=100")._2)
      assert(ce2 == 2L && be2.isEmpty)
      val (eac, eab) = post(p2, "/ack", """{"ack_batch_id":2}""")
      assert(eac == 200 && eab == """{"acked_batch_id":2}""")
    } finally server2.stop()
  }

  test("fetch_new pages a batch larger than batch_size without loss") {
    val dir = java.nio.file.Files
      .createTempDirectory("graft-subpage").toString
    val sub = new Subscription(dir)
    sub.stage((1L to 5L).map(k => (k, s"v$k")).toDF("k", "v"), 0L)
    sub.stage(Seq((9L, "z")).toDF("k", "v"), 1L)

    val server = new SubscriptionServer(spark, sub)
    try {
      val p = server.boundPort
      // 5-row batch fetched 2 rows at a time: same batch_id on every
      // page, sent advances only after the final page — a client with
      // a small batch_size loses nothing
      val (b1, r1) = ids(get(p, "/fetch_new?batch_size=2")._2)
      assert(b1 == 0L && r1.length == 2 && server.sent == -1L)
      // mid-batch the not-yet-complete batch can't be acked
      val (mid, midMsg) = post(p, "/ack", """{"ack_batch_id":0}""")
      assert(mid == 400 && midMsg.contains("must <= sent_batch_id"))
      val (b2, r2) = ids(get(p, "/fetch_new?batch_size=2")._2)
      assert(b2 == 0L && r2.length == 2 && server.sent == -1L)
      val (b3, r3) = ids(get(p, "/fetch_new?batch_size=2")._2)
      assert(b3 == 0L && r3.length == 1 && server.sent == 0L)
      assert((r1 ++ r2 ++ r3).sorted == (1L to 5L))
      // completed batch acks fine; next fetch moves on to batch 1
      assert(post(p, "/ack", """{"ack_batch_id":0}""")._1 == 200)
      val (b4, r4) = ids(get(p, "/fetch_new?batch_size=2")._2)
      assert(b4 == 1L && r4 == Seq(9L))
    } finally server.stop()
  }
}
