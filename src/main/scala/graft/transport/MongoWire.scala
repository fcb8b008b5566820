package graft.transport

/** MongoDB wire protocol — the OP_MSG slice a change-stream client
  * needs (public protocol, mongodb.com/docs/manual/reference/
  * mongodb-wire-protocol): the 16-byte message header + OP_MSG
  * (opcode 2013) kind-0 body section carrying one BSON command or
  * reply document. The reference reaches this through the mongodb
  * driver crate; here it is direct so [[MongoChangeStreamPump]]'s
  * state machine is byte-testable.
  */
object MongoWire {

  final val OpMsg = 2013

  /** One OP_MSG with a single kind-0 section. */
  def message(requestId: Int, doc: Seq[(String, Any)]): Array[Byte] = {
    val body = Bson.encode(doc)
    val out = new java.io.ByteArrayOutputStream()
    def le(v: Int): Unit =
      (0 until 4).foreach(i => out.write((v >> (8 * i)) & 0xff))
    le(16 + 4 + 1 + body.length) // total length
    le(requestId)
    le(0) // responseTo
    le(OpMsg)
    le(0) // flagBits
    out.write(0) // section kind 0
    out.write(body)
    out.toByteArray
  }

  /** Read one OP_MSG reply; returns the kind-0 document. */
  def readMessage(wire: Wire): Map[String, Any] = {
    val head = wire.read(16)
    def le(p: Int): Int =
      (head(p) & 0xff) | ((head(p + 1) & 0xff) << 8) |
        ((head(p + 2) & 0xff) << 16) | ((head(p + 3) & 0xff) << 24)
    val total = le(0)
    val opCode = le(12)
    require(opCode == OpMsg, s"unexpected opcode $opCode")
    val rest = wire.read(total - 16)
    var p = 4 // skip flagBits
    require((rest(p) & 0xff) == 0, "expected a kind-0 section")
    p += 1
    Bson.decode(rest, p)
  }

  /** A reply's ok gate: MongoDB signals command errors in-band. */
  def checkOk(reply: Map[String, Any], what: String): Unit = {
    val ok = reply.get("ok") match {
      case Some(d: Double) => d == 1.0
      case Some(i: Int) => i == 1
      case _ => false
    }
    if (!ok) throw new java.io.IOException(
      s"$what failed: ${reply.getOrElse("errmsg", reply)}")
  }
}
