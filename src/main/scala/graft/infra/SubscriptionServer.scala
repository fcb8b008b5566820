package graft.infra

import java.net.InetSocketAddress
import java.nio.charset.StandardCharsets
import java.util.concurrent.atomic.AtomicLong

import com.fasterxml.jackson.databind.ObjectMapper

import org.apache.spark.sql.SparkSession

/** The subscription spool served over real HTTP — the reference's
  * actix endpoints (/root/reference/dt-pipeline/src/
  * http_server_pipeline.rs:117-335): GET `/info`, GET
  * `/fetch_new?batch_size=N[&ack_batch_id=M]`, GET
  * `/fetch_old?old_batch_id=N`, POST `/ack` `{"ack_batch_id":N}`.
  *
  * Batch identity is the spool offset ([[Subscription.stage]]'s
  * `batch=<offset>` directories), so the protocol state machine
  * (`acked_batch_id` ≤ served batches ≤ `sent_batch_id`) is durable:
  * acks persist through [[Subscription.ack]]'s offset file and the
  * data itself is the parquet spool, so a restarted server re-serves
  * every staged-but-unacked batch (at-least-once, like the reference
  * after a checkpoint resume) instead of losing its in-memory pending
  * map. `fetch_old` replays any batch in (acked, sent] straight from
  * the spool; the reference's 400 validations on ack/fetch bounds are
  * mirrored verbatim.
  *
  * Rows ship as JSON objects (`data` array) rather than the
  * reference's Avro byte arrays — the JSON envelope is this repo's
  * kafka-compatible row rendering; the Avro wire form remains
  * available via [[graft.sinks.AvroEnvelope]].
  *
  * Scale shape: the HTTP path only serves DRAINED micro-batches; a
  * spool batch wider than `batch_size` pages under the same batch id
  * (sent advances only after the final page, so a small client
  * batch_size never drops rows). Consumers needing bulk history read
  * the spool directly as files; the endpoint is the low-latency tail
  * protocol.
  */
final class SubscriptionServer(spark: SparkSession, sub: Subscription,
    host: String = "127.0.0.1", port: Int = 0) {
  import com.sun.net.httpserver.{HttpExchange, HttpHandler, HttpServer}

  // resumes at the ack mark: staged-but-unacked batches re-serve
  private val sentBatchId = new AtomicLong(sub.acked())

  // In-progress batch pagination: a spool batch larger than the
  // client's batch_size serves in pages under the SAME batch_id;
  // sentBatchId only advances once the last page ships, so no row is
  // ever dropped by a small batch_size (the reference sizes batches at
  // formation time, so its batch_size can never truncate one).
  private var pending: Option[(Long, Vector[String], Int)] = None

  private val mapper = new ObjectMapper()

  private def respond(ex: HttpExchange, code: Int, body: String,
      contentType: String = "application/json"): Unit = {
    val bytes = body.getBytes(StandardCharsets.UTF_8)
    ex.getResponseHeaders.set("Content-Type", contentType)
    ex.sendResponseHeaders(code, bytes.length.toLong)
    val os = ex.getResponseBody
    try os.write(bytes) finally os.close()
  }

  private def queryParams(ex: HttpExchange): Map[String, String] =
    Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
      .flatMap(_.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => Some(k -> v)
        case _ => None
      }).toMap

  /** Render one spool batch as the fetch response JSON. */
  private def fetchResp(batchId: Long, maxRows: Int): String = {
    val rows = sub.fetchOldExact(spark, batchId) match {
      case Some(df) => df.toJSON.take(maxRows).toSeq
      case None => Seq.empty
    }
    s"""{"batch_id":$batchId,"data":${rows.mkString("[", ",", "]")}}"""
  }

  /** Serve the next fetch_new page: resume the pending batch if one is
    * mid-flight, else stage the next spool offset. Advances sentBatchId
    * only when a batch's final page ships.
    */
  private def fetchNewPage(batchSize: Int): String = synchronized {
    val staged = pending.orElse {
      sub.offsets().find(_ > sentBatchId.get()).map { off =>
        val rows = sub.fetchOldExact(spark, off) match {
          case Some(df) => df.toJSON.collect().toVector
          case None => Vector.empty
        }
        (off, rows, 0)
      }
    }
    staged match {
      case Some((off, rows, cursor)) =>
        val page = rows.slice(cursor, cursor + math.max(batchSize, 1))
        val nextCursor = cursor + page.length
        if (nextCursor >= rows.length) {
          pending = None
          sentBatchId.set(off)
        } else pending = Some((off, rows, nextCursor))
        s"""{"batch_id":$off,"data":${page.mkString("[", ",", "]")}}"""
      case None =>
        // nothing new: report the current sent id so the returned
        // batch_id is always ackable (advancing sent here could leap
        // past a spool offset staged later, hiding that batch forever)
        s"""{"batch_id":${sentBatchId.get()},"data":[]}"""
    }
  }

  /** do_ack — http_server_pipeline.rs:293-323. Left = 400 message. */
  private def doAck(ackBatchId: Long): Either[String, Long] = {
    val acked = sub.acked()
    val sent = sentBatchId.get()
    if (ackBatchId > sent)
      Left(s"ack_batch_id: [$ackBatchId] must <= sent_batch_id: [$sent]")
    else if (ackBatchId < acked)
      Left(s"ack_batch_id: [$ackBatchId] must >= acked_batch_id : " +
        s"[$acked]")
    else Right(sub.ack(ackBatchId))
  }

  private val server =
    HttpServer.create(new InetSocketAddress(host, port), 0)

  server.createContext("/", new HttpHandler {
    override def handle(ex: HttpExchange): Unit = try {
      (ex.getRequestMethod, ex.getRequestURI.getPath) match {
        case ("GET", "/info") =>
          respond(ex, 200,
            s"""{"acked_batch_id":${sub.acked()},""" +
              s""""sent_batch_id":${sentBatchId.get()}}""")

        case ("GET", "/fetch_new") =>
          val params = queryParams(ex)
          val batchSize =
            params.get("batch_size").flatMap(_.toIntOption)
              .getOrElse(Int.MaxValue)
          // optional piggybacked ack, exactly like the reference
          params.get("ack_batch_id").flatMap(_.toLongOption) match {
            case Some(ackId) => doAck(ackId) match {
              case Left(err) => respond(ex, 400, err, "text/plain")
                return
              case Right(_) => ()
            }
            case None => ()
          }
          respond(ex, 200, fetchNewPage(batchSize))

        case ("GET", "/fetch_old") =>
          val params = queryParams(ex)
          params.get("old_batch_id").flatMap(_.toLongOption) match {
            case None =>
              respond(ex, 400, "old_batch_id required", "text/plain")
            case Some(oldId) =>
              val acked = sub.acked(); val sent = sentBatchId.get()
              if (oldId > sent)
                respond(ex, 400, s"old_batch_id: [$oldId] must <= " +
                  s"sent_batch_id: [$sent]", "text/plain")
              else if (oldId <= acked)
                respond(ex, 400, s"old_batch_id: [$oldId] must > " +
                  s"acked_batch_id: [$acked]", "text/plain")
              else respond(ex, 200, fetchResp(oldId, Int.MaxValue))
          }

        case ("POST", "/ack") =>
          val body = new String(ex.getRequestBody.readAllBytes(),
            StandardCharsets.UTF_8)
          val ackId = try {
        Option(mapper.readTree(body).get("ack_batch_id")).map(_.asLong())
          } catch { case _: Exception => None }
          ackId match {
            case None =>
              respond(ex, 400, "ack_batch_id required", "text/plain")
            case Some(id) => doAck(id) match {
              case Left(err) => respond(ex, 400, err, "text/plain")
              case Right(acked) =>
                respond(ex, 200, s"""{"acked_batch_id":$acked}""")
            }
          }

        case _ =>
          respond(ex, 404,
            """{"error":"Not Found"}""")
      }
    } finally ex.close()
  })
  server.setExecutor(null)
  server.start()

  def boundPort: Int = server.getAddress.getPort
  def sent: Long = sentBatchId.get()
  def stop(): Unit = server.stop(0)
}
