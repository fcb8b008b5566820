package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.transport._

/** The MongoDB change-stream dial-and-pump over [[FakeWire]] — the
  * OP_MSG slice the reference reaches through its driver crate:
  * hello, SCRAM-SHA-256 saslStart/saslContinue (RFC 7677 vectors),
  * the $changeStream aggregate + getMore loop, JSON-line capture,
  * resume tokens, and reconnect-with-resumeAfter. Plus the BSON codec
  * itself (round-trip and spec-fixed byte layouts).
  */
class MongoTransportSpec extends AnyFunSuite {
  import Bson.{Arr, DateTime, Doc, ObjectId, Timestamp}

  // --------------------------------------------------------------- bson

  test("bson: the spec's canonical example encodes byte-exactly") {
    // {"hello": "world"} — the worked example from bsonspec.org
    val got = Bson.encode(Seq("hello" -> "world"))
    val want = Array[Byte](
      0x16, 0x00, 0x00, 0x00, // total 22
      0x02, 'h', 'e', 'l', 'l', 'o', 0x00,
      0x06, 0x00, 0x00, 0x00, 'w', 'o', 'r', 'l', 'd', 0x00,
      0x00)
    assert(got.toSeq == want.toSeq)
  }

  test("bson: every supported type round-trips through encode/decode") {
    val oid = ObjectId(Array.tabulate[Byte](12)(_.toByte))
    val doc = Seq[(String, Any)](
      "str" -> "héllo",
      "i32" -> 42,
      "i64" -> 42L,
      "dbl" -> 2.5,
      "yes" -> true,
      "no" -> false,
      "nul" -> null,
      "bin" -> Array[Byte](1, 2, 3),
      "oid" -> oid,
      "ts" -> Timestamp(100, 7),
      "dt" -> DateTime(1723700000000L),
      "sub" -> Doc(Seq("a" -> 1, "b" -> "x")),
      "arr" -> Arr(Seq(1, "two", Doc(Seq("three" -> 3)))))
    val back = Bson.decode(Bson.encode(doc))
    assert(back("str") == "héllo")
    assert(back("i32") == 42 && back("i64") == 42L)
    assert(back("dbl") == 2.5)
    assert(back("yes") == true && back("no") == false)
    assert(back("nul") == null)
    assert(back("bin").asInstanceOf[Array[Byte]].toSeq ==
      Seq[Byte](1, 2, 3))
    assert(back("oid").asInstanceOf[ObjectId].hex == oid.hex)
    assert(back("ts") == Timestamp(100, 7))
    assert(back("dt") == DateTime(1723700000000L))
    assert(back("sub").asInstanceOf[Map[String, Any]] ==
      Map("a" -> 1, "b" -> "x"))
    val arr = back("arr").asInstanceOf[Seq[Any]]
    assert(arr(0) == 1 && arr(1) == "two")
    assert(arr(2).asInstanceOf[Map[String, Any]] == Map("three" -> 3))
  }

  // ------------------------------------------------------ opmsg fixture

  private def reply(doc: Seq[(String, Any)]): Array[Byte] =
    MongoWire.message(0, doc)

  private val okDouble: (String, Any) = "ok" -> 1.0

  private def changeDoc(dataToken: String, op: String, id: String,
      v: String): Doc =
    Doc(Seq(
      "_id" -> Doc(Seq("_data" -> dataToken)),
      "operationType" -> op,
      "ns" -> Doc(Seq("db" -> "app", "coll" -> "t")),
      "documentKey" -> Doc(Seq("_id" -> id)),
      "fullDocument" -> Doc(Seq("_id" -> id, "v" -> v))))

  private def cursorReply(id: Long, batchKey: String,
      docs: Seq[Doc]): Array[Byte] =
    reply(Seq(
      "cursor" -> Doc(Seq(
        "id" -> id,
        "ns" -> "admin.$cmd.aggregate",
        batchKey -> Arr(docs))),
      okDouble))

  test("change stream: hello, SCRAM auth, aggregate + getMore, JSON " +
      "capture with resume tokens") {
    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)" +
      "hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val wire = new FakeWire
    wire.serve(reply(Seq("isWritablePrimary" -> true, okDouble)))
    wire.serve(reply(Seq(
      "conversationId" -> 1,
      "payload" -> serverFirst.getBytes("UTF-8"),
      "done" -> false, okDouble)))
    wire.serve(reply(Seq(
      "conversationId" -> 1,
      "payload" -> "v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4="
        .getBytes("UTF-8"),
      "done" -> true, okDouble)))
    wire.serve(cursorReply(77L, "firstBatch", Seq(
      changeDoc("tok1", "insert", "1", "a"),
      changeDoc("tok2", "insert", "2", "b"))))
    wire.serve(cursorReply(77L, "nextBatch", Seq(
      changeDoc("tok3", "update", "1", "a2"))))
    wire.serve(cursorReply(0L, "nextBatch", Nil)) // cursor exhausted

    val store = new MemorySegmentStore
    val pump = new MongoChangeStreamPump(
      MongoChangeStreamPump.Config("user", "pencil",
        nonce = () => "rOprNGfwEbeRWgbNEkqO"), store, () => wire)
    val n = pump.runSession()
    assert(n == 3)
    assert(pump.position.contains("tok3"))

    val sentStr = new String(wire.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sentStr.contains("hello"))
    assert(sentStr.contains("SCRAM-SHA-256"))
    assert(sentStr.contains("n,,n=user,r=rOprNGfwEbeRWgbNEkqO"))
    assert(sentStr.contains("$changeStream"))
    assert(sentStr.contains("allChangesForCluster"))
    // updates must ship the post-image: without updateLookup a real
    // server sends only updateDescription and the landed state face
    // would keep pre-update documents forever
    assert(sentStr.contains("fullDocument"))
    assert(sentStr.contains("updateLookup"))
    assert(sentStr.contains("getMore"))

    // the capture is JSON lines the doc machinery can consume
    val lines = new String(store.bytesOf("changestream.000001.log"),
      "UTF-8").split("\n").filter(_.nonEmpty)
    assert(lines.length == 3)
    assert(lines(0).contains("\"operationType\":\"insert\""))
    assert(lines(2).contains("\"operationType\":\"update\""))
    assert(lines(2).contains("\"_data\":\"tok3\""))
  }

  test("max_segment_secs: a quiet stream's captured events publish " +
      "within the knob's window (empty getMore replies drive the " +
      "time-based rotation), and empty segments never publish") {
    var now = 0L
    val clock = () => { now += 600L; now }
    val wire = new FakeWire
    wire.serve(reply(Seq(okDouble))) // hello (no auth)
    wire.serve(cursorReply(77L, "firstBatch", Seq(
      changeDoc("tok1", "insert", "1", "a"))))
    // the stream goes QUIET: empty heartbeat batches, cursor open
    (1 to 4).foreach(_ =>
      wire.serve(cursorReply(77L, "nextBatch", Nil)))
    wire.serve(cursorReply(0L, "nextBatch", Nil)) // session end

    val inner = new MemorySegmentStore
    val published = scala.collection.mutable.ArrayBuffer[String]()
    val store = new SegmentStore {
      override def append(n: String, b: Array[Byte]): Unit =
        inner.append(n, b)
      override def names: Seq[String] = inner.names
      override def bytesOf(n: String): Array[Byte] = inner.bytesOf(n)
      override def publish(n: String): Unit = { published += n }
      override def discard(n: String): Unit = inner.discard(n)
    }
    val pump = new MongoChangeStreamPump(
      MongoChangeStreamPump.Config(
        maxSegmentSecs = 1L, clockMs = clock), store, () => wire)
    pump.runSession()
    // the lone captured doc's segment rotated out on TIME (not 64 MB,
    // not wind-down) — exactly once; the empty successor never
    // published and never burned bytes
    assert(published.toSeq == Seq("changestream.000001.log"))
    assert(pump.publishedToken.contains("tok1"))
    assert(inner.names == Seq("changestream.000001.log"))
  }

  test("reconnect re-watches with resumeAfter at the tracked token") {
    val wire1 = new FakeWire
    wire1.serve(reply(Seq(okDouble))) // hello
    wire1.serve(cursorReply(5L, "firstBatch", Seq(
      changeDoc("tokA", "insert", "1", "a"))))
    wire1.failAfter(wire1.remaining) // dies before the next getMore

    val wire2 = new FakeWire
    wire2.serve(reply(Seq(okDouble)))
    wire2.serve(cursorReply(6L, "firstBatch", Seq(
      changeDoc("tokB", "insert", "2", "b"))))
    wire2.serve(cursorReply(0L, "nextBatch", Nil))

    val wires = scala.collection.mutable.Queue[FakeWire](wire1, wire2)
    val store = new MemorySegmentStore
    val pump = new MongoChangeStreamPump(
      MongoChangeStreamPump.Config(maxReconnects = 3,
        baseBackoffMs = 1), store, () => wires.dequeue())
    pump.run(until = () => pump.docsCaptured >= 2, sleep = _ => ())
    assert(pump.reconnects == 1)
    // the SECOND aggregate carried resumeAfter with the tracked token
    val sent2 = new String(wire2.sentBytes,
      java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(sent2.contains("resumeAfter"))
    assert(sent2.contains("tokA"))
    assert(pump.position.contains("tokB"))
    // per-session segments, each a valid JSON-lines capture
    assert(store.names ==
      Seq("changestream.000001.log", "changestream.000002.log"))
  }

  test("in-band command errors and forged SCRAM signatures surface") {
    val wire = new FakeWire
    wire.serve(reply(Seq("ok" -> 0.0,
      "errmsg" -> "not authorized on admin")))
    val pump = new MongoChangeStreamPump(
      MongoChangeStreamPump.Config(), new MemorySegmentStore,
      () => wire)
    val e = intercept[java.io.IOException](pump.runSession())
    assert(e.getMessage.contains("not authorized"))

    val serverFirst = "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)" +
      "hNlF$k0,s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val wire2 = new FakeWire
    wire2.serve(reply(Seq(okDouble))) // hello
    wire2.serve(reply(Seq(
      "conversationId" -> 1,
      "payload" -> serverFirst.getBytes("UTF-8"),
      "done" -> false, okDouble)))
    wire2.serve(reply(Seq(
      "conversationId" -> 1,
      "payload" -> "v=Zm9yZ2VkIQ==".getBytes("UTF-8"),
      "done" -> true, okDouble)))
    val pump2 = new MongoChangeStreamPump(
      MongoChangeStreamPump.Config("user", "pencil",
        nonce = () => "rOprNGfwEbeRWgbNEkqO"),
      new MemorySegmentStore, () => wire2)
    val e2 = intercept[java.io.IOException](pump2.runSession())
    assert(e2.getMessage.contains("server signature mismatch"))
  }

  test("bson property: random nested documents round-trip") {
    val rnd = new scala.util.Random(20260815L)
    def randValue(depth: Int): Any = rnd.nextInt(
        if (depth < 2) 10 else 8) match {
      case 0 => rnd.nextInt()
      case 1 => rnd.nextLong()
      case 2 => rnd.nextInt(1000) / 8.0 // dyadic: exact double
      case 3 => rnd.nextBoolean()
      case 4 => null
      case 5 =>
        // strings incl. unicode + control chars (never NUL in keys,
        // but values allow anything)
        val chars = "ab\u00e9\u4e2d\n\t xyz"
        (0 until rnd.nextInt(12)).map(_ =>
          chars(rnd.nextInt(chars.length))).mkString
      case 6 => Array.fill[Byte](rnd.nextInt(16))(rnd.nextInt().toByte)
      case 7 => Timestamp(rnd.nextInt(1 << 20), rnd.nextInt(100))
      case 8 => Doc(randDoc(depth + 1))
      case _ => Arr((0 until rnd.nextInt(4))
        .map(_ => randValue(depth + 1)))
    }
    def randDoc(depth: Int): Seq[(String, Any)] =
      (0 until 1 + rnd.nextInt(6)).map(i =>
        s"k${i}_${rnd.nextInt(100)}" -> randValue(depth))
    def norm(v: Any): Any = v match {
      case b: Array[Byte] => b.toSeq
      case m: Map[_, _] =>
        m.asInstanceOf[Map[String, Any]].view.mapValues(norm).toMap
      case s: Seq[_] => s.map(norm)
      case Doc(pairs) => pairs.map { case (k, x) => k -> norm(x) }.toMap
      case Arr(items) => items.map(norm)
      case other => other
    }
    (1 to 200).foreach { trial =>
      val doc = randDoc(0).toMap.toSeq // dedup keys like a real doc
      val back = Bson.decode(Bson.encode(doc))
      assert(norm(back) == norm(Doc(doc)),
        s"trial $trial diverged: $doc")
    }
  }

  test("bson toJson: doubles past 2^53 never clamp to Long.MaxValue; " +
      "NaN/Infinity land as quoted strings, not invalid-JSON tokens") {
    // 1e20 is integral (d == d.floor) but outside the double's exact-
    // integer range — the pre-r15 toLong render clamped it to
    // 9223372036854775807, a silently WRONG value on the landed face
    assert(Bson.toJson(1e20) == "1.0E20")
    assert(Bson.toJson(9007199254740992.0) == "9007199254740992")
    assert(Bson.toJson(3.0) == "3")
    assert(Bson.toJson(3.5) == "3.5")
    // bare NaN/Infinity tokens would throw the WHOLE event into
    // spark.read.json's _corrupt_record
    assert(Bson.toJson(Double.NaN) == "\"NaN\"")
    assert(Bson.toJson(Double.PositiveInfinity) == "\"Infinity\"")
    assert(Bson.toJson(Double.NegativeInfinity) == "\"-Infinity\"")
  }
}
