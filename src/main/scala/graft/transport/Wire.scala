package graft.transport

/** Byte-stream transport seam for the live dial-and-pump clients
  * ([[MysqlReplicationPump]], [[PgReplicationPump]]). The protocol
  * state machines are written against this trait so every branch —
  * handshake, auth, resume, keepalive ack, reconnect — is spec-driven
  * over [[FakeWire]] without a server; [[SocketWire]] is the real TCP
  * face a deployment uses (reference contract:
  * dt-connector/src/extractor/mysql/mysql_cdc_extractor.rs:141-192 and
  * extractor/pg/pg_cdc_client.rs:219-291, which dial through client
  * crates this sandbox cannot exercise).
  */
trait Wire {
  /** Exactly `n` bytes, blocking; throws java.io.EOFException when the
    * peer closes mid-read (the pump's reconnect trigger).
    */
  def read(n: Int): Array[Byte]

  /** At least 1 and at most `max` bytes — the unframed-stream read a
    * RESP replication tail needs (no length prefix to wait for).
    * Blocks for the first byte; throws EOF on close.
    */
  def readSome(max: Int): Array[Byte]

  def write(bytes: Array[Byte]): Unit

  def close(): Unit
}

/** Live TCP transport. Compiles and is exercised for construction
  * errors only — no server exists in CI; the protocol logic above it
  * is covered on [[FakeWire]].
  */
final class SocketWire(host: String, port: Int,
    connectTimeoutMs: Int = 10000, readTimeoutMs: Int = 60000)
    extends Wire {
  private val socket = new java.net.Socket()
  socket.setTcpNoDelay(true)
  socket.setKeepAlive(true)
  socket.setSoTimeout(readTimeoutMs)
  socket.connect(
    new java.net.InetSocketAddress(host, port), connectTimeoutMs)
  private val in = new java.io.DataInputStream(
    new java.io.BufferedInputStream(socket.getInputStream))
  private val out = new java.io.BufferedOutputStream(
    socket.getOutputStream)

  override def read(n: Int): Array[Byte] = {
    val buf = new Array[Byte](n)
    in.readFully(buf)
    buf
  }

  override def readSome(max: Int): Array[Byte] = {
    val buf = new Array[Byte](max)
    val n = in.read(buf, 0, max)
    if (n < 0) throw new java.io.EOFException("peer closed")
    java.util.Arrays.copyOf(buf, n)
  }

  override def write(bytes: Array[Byte]): Unit = {
    out.write(bytes); out.flush()
  }

  override def close(): Unit = socket.close()
}

/** Scripted transport for specs: the test enqueues the bytes the
  * "server" will serve (optionally with a planted failure), and
  * inspects everything the client wrote. Serving and failure order is
  * byte-exact, so framing bugs surface as EOF/garbage instead of
  * passing silently.
  */
final class FakeWire extends Wire {
  private val served = new java.io.ByteArrayOutputStream()
  private var cursor = 0
  private var failAt: Int = -1 // absolute served-byte offset
  val sent = new java.io.ByteArrayOutputStream()
  var closed = false

  /** Enqueue bytes the next reads will return. */
  def serve(bytes: Array[Byte]): Unit = served.write(bytes)

  /** Plant a connection failure once `read` crosses `atOffset` bytes
    * total — the reconnect-path trigger.
    */
  def failAfter(atOffset: Int): Unit = failAt = atOffset

  override def read(n: Int): Array[Byte] = {
    val all = served.toByteArray
    if (failAt >= 0 && cursor + n > failAt)
      throw new java.io.IOException("planted connection failure")
    if (cursor + n > all.length)
      throw new java.io.EOFException(
        s"fake wire drained: want $n at $cursor of ${all.length}")
    val out = java.util.Arrays.copyOfRange(all, cursor, cursor + n)
    cursor += n
    out
  }

  override def readSome(max: Int): Array[Byte] = {
    val all = served.toByteArray
    if (failAt >= 0 && cursor >= failAt)
      throw new java.io.IOException("planted connection failure")
    if (cursor >= all.length)
      throw new java.io.EOFException("fake wire drained")
    val take = math.min(max, all.length - cursor)
    val capped = if (failAt >= 0) math.min(take, failAt - cursor)
      else take
    read(math.max(1, capped))
  }

  override def write(bytes: Array[Byte]): Unit = sent.write(bytes)

  override def close(): Unit = closed = true

  def sentBytes: Array[Byte] = sent.toByteArray
  def remaining: Int = served.size() - cursor
}
