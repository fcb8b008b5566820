package graft.transport

/** PostgreSQL frontend/backend wire protocol — the slice a logical
  * replication client needs (public protocol v3, documented at
  * postgresql.org/docs/current/protocol.html): startup with
  * `replication=database`, cleartext/md5 auth, the simple-query cycle
  * (the slot-lifecycle statements run through it), and COPY-both
  * framing for START_REPLICATION. The reference reaches this through
  * tokio-postgres (dt-connector/src/extractor/pg/pg_cdc_client.rs);
  * here it is direct so [[PgReplicationPump]]'s state machine is
  * unit-testable byte-for-byte.
  */
object PgWire {

  // ------------------------------------------------------------ framing

  /** Backend message: 1-byte type + 4-byte BE length (incl. itself). */
  def readMessage(wire: Wire): (Char, Array[Byte]) = {
    val head = wire.read(5)
    val tag = (head(0) & 0xff).toChar
    val len = ((head(1) & 0xff) << 24) | ((head(2) & 0xff) << 16) |
      ((head(3) & 0xff) << 8) | (head(4) & 0xff)
    val body = if (len > 4) wire.read(len - 4) else Array.emptyByteArray
    (tag, body)
  }

  def message(tag: Char, body: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    out.write(tag)
    val len = body.length + 4
    out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(body)
    out.toByteArray
  }

  // ----------------------------------------------------------- startup

  /** StartupMessage (no type byte): protocol 3.0 + params. The
    * `replication=database` param is what turns the session into a
    * walsender that accepts CREATE_REPLICATION_SLOT/START_REPLICATION.
    */
  def startup(user: String, database: String,
      replication: Boolean = true): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write(Array[Byte](0, 3, 0, 0)) // protocol 196608
    def param(k: String, v: String): Unit = {
      body.write(k.getBytes("UTF-8")); body.write(0)
      body.write(v.getBytes("UTF-8")); body.write(0)
    }
    param("user", user)
    param("database", database)
    if (replication) param("replication", "database")
    param("application_name", "graft")
    body.write(0)
    val payload = body.toByteArray
    val out = new java.io.ByteArrayOutputStream()
    val len = payload.length + 4
    out.write((len >> 24) & 0xff); out.write((len >> 16) & 0xff)
    out.write((len >> 8) & 0xff); out.write(len & 0xff)
    out.write(payload)
    out.toByteArray
  }

  /** SSLRequest — the 8-byte STARTTLS preamble (length 8 + the
    * 80877103 magic). The server answers ONE raw byte: 'S' (proceed
    * with the TLS handshake on this connection) or 'N' (no TLS).
    */
  def sslRequest(): Array[Byte] =
    Array[Byte](0, 0, 0, 8, 0x04, 0xd2.toByte, 0x16, 0x2f)

  /** PasswordMessage ('p') for cleartext (auth code 3). */
  def passwordMessage(password: String): Array[Byte] =
    message('p', password.getBytes("UTF-8") :+ 0.toByte)

  /** md5 auth (code 5): "md5" + md5hex(md5hex(password+user)+salt). */
  def md5Password(user: String, password: String, salt: Array[Byte])
      : Array[Byte] = {
    def md5hex(b: Array[Byte]): String =
      java.security.MessageDigest.getInstance("MD5").digest(b)
        .map(x => f"${x & 0xff}%02x").mkString
    val inner = md5hex((password + user).getBytes("UTF-8"))
    val outer = md5hex(inner.getBytes("UTF-8") ++ salt)
    message('p', s"md5$outer".getBytes("UTF-8") :+ 0.toByte)
  }

  /** SCRAM-SHA-256 (RFC 5802/7677) — PostgreSQL's default auth since
    * v14 (`password_encryption=scram-sha-256`), so a live dial MUST
    * speak it. Pure computation over the exchanged messages; the pump
    * drives the 3-leg exchange (SASL → SASLContinue → SASLFinal).
    * Password normalization is pass-through (SASLprep's non-ASCII
    * edge cases are out of scope; ASCII passwords — the overwhelming
    * case — are unaffected).
    */
  object Scram {
    private val B64E = java.util.Base64.getEncoder
    private val B64D = java.util.Base64.getDecoder

    private def hmac(key: Array[Byte], msg: Array[Byte]): Array[Byte] = {
      val mac = javax.crypto.Mac.getInstance("HmacSHA256")
      mac.init(new javax.crypto.spec.SecretKeySpec(key, "HmacSHA256"))
      mac.doFinal(msg)
    }
    private def sha256(b: Array[Byte]): Array[Byte] =
      java.security.MessageDigest.getInstance("SHA-256").digest(b)
    private def xor(a: Array[Byte], b: Array[Byte]): Array[Byte] =
      a.indices.toArray.map(i => (a(i) ^ b(i)).toByte)

    /** Hi(password, salt, i) = PBKDF2-HMAC-SHA256, dkLen = 32. */
    def saltedPassword(password: String, salt: Array[Byte],
        iterations: Int): Array[Byte] = {
      val spec = new javax.crypto.spec.PBEKeySpec(
        password.toCharArray, salt, iterations, 256)
      javax.crypto.SecretKeyFactory
        .getInstance("PBKDF2WithHmacSHA256")
        .generateSecret(spec).getEncoded
    }

    final case class Exchange(user: String, password: String,
        clientNonce: String) {
      /** `n,,n=<user>,r=<nonce>` — PG convention sends n= empty (the
        * startup message already named the user), but the generic
        * form with the user works against PG too; RFC vectors use it.
        */
      val clientFirstBare = s"n=$user,r=$clientNonce"
      val clientFirst = s"n,,$clientFirstBare"

      /** Parse server-first, compute client-final + the expected
        * server signature. Returns (clientFinal, serverSignatureB64).
        */
      def clientFinal(serverFirst: String): (String, String) = {
        val fields = serverFirst.split(",").map { f =>
          f.splitAt(f.indexOf('=')) match {
            case (k, v) => k -> v.drop(1)
          }
        }.toMap
        val nonce = fields("r")
        require(nonce.startsWith(clientNonce),
          "scram: server nonce does not extend the client nonce")
        val salt = B64D.decode(fields("s"))
        val iterations = fields("i").toInt
        val salted = saltedPassword(password, salt, iterations)
        val clientKey = hmac(salted, "Client Key".getBytes("UTF-8"))
        val storedKey = sha256(clientKey)
        val withoutProof = s"c=biws,r=$nonce" // biws = b64("n,,")
        val authMessage =
          s"$clientFirstBare,$serverFirst,$withoutProof"
            .getBytes("UTF-8")
        val clientSig = hmac(storedKey, authMessage)
        val proof = B64E.encodeToString(xor(clientKey, clientSig))
        val serverKey = hmac(salted, "Server Key".getBytes("UTF-8"))
        val serverSig =
          B64E.encodeToString(hmac(serverKey, authMessage))
        (s"$withoutProof,p=$proof", serverSig)
      }
    }

    /** SASLInitialResponse: mechanism cstring + int32 len + body. */
    def initialResponse(mechanism: String, body: String): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(mechanism.getBytes("UTF-8")); out.write(0)
      val b = body.getBytes("UTF-8")
      out.write((b.length >> 24) & 0xff); out.write((b.length >> 16) & 0xff)
      out.write((b.length >> 8) & 0xff); out.write(b.length & 0xff)
      out.write(b)
      message('p', out.toByteArray)
    }

    def response(body: String): Array[Byte] =
      message('p', body.getBytes("UTF-8"))
  }

  /** Simple query ('Q'). */
  def query(sql: String): Array[Byte] =
    message('Q', sql.getBytes("UTF-8") :+ 0.toByte)

  def terminate: Array[Byte] = message('X', Array.emptyByteArray)

  // ------------------------------------------------- simple-query parse

  final case class QueryResult(columns: Seq[String],
      rows: Seq[Seq[String]], command: String, error: String = "") {
    def rowMaps: Seq[Map[String, String]] =
      rows.map(r => columns.zip(r).toMap)
  }

  def parseRowDescription(body: Array[Byte]): Seq[String] = {
    var p = 0
    val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    p = 2
    (0 until n).map { _ =>
      val s = p
      while (body(p) != 0) p += 1
      val name = new String(body, s, p - s, "UTF-8")
      p += 1 + 18 // NUL + tableOid(4) attnum(2) typOid(4) typlen(2)
                  //       typmod(4) format(2)
      name
    }
  }

  def parseDataRow(body: Array[Byte]): Seq[String] = {
    var p = 0
    val n = ((body(0) & 0xff) << 8) | (body(1) & 0xff)
    p = 2
    (0 until n).map { _ =>
      val len = ((body(p) & 0xff) << 24) | ((body(p + 1) & 0xff) << 16) |
        ((body(p + 2) & 0xff) << 8) | (body(p + 3) & 0xff)
      p += 4
      if (len == -1) null
      else {
        val v = new String(body, p, len, "UTF-8"); p += len; v
      }
    }
  }

  def parseError(body: Array[Byte]): String = {
    // fields: 1-byte code + cstring, terminated by a 0 byte
    var p = 0
    val fields = scala.collection.mutable.Map[Char, String]()
    while (p < body.length && body(p) != 0) {
      val code = (body(p) & 0xff).toChar; p += 1
      val s = p
      while (body(p) != 0) p += 1
      fields(code) = new String(body, s, p - s, "UTF-8")
      p += 1
    }
    s"${fields.getOrElse('S', "ERROR")}: ${fields.getOrElse('M', "?")}"
  }

  /** Drive one simple-query cycle to ReadyForQuery. */
  def runQuery(wire: Wire, sql: String): QueryResult = {
    wire.write(query(sql))
    var columns = Seq.empty[String]
    val rows = scala.collection.mutable.ArrayBuffer[Seq[String]]()
    var command = ""
    var error = ""
    var done = false
    while (!done) {
      val (tag, body) = readMessage(wire)
      tag match {
        case 'T' => columns = parseRowDescription(body)
        case 'D' => rows += parseDataRow(body)
        case 'C' => command = new String(body.dropRight(1), "UTF-8")
        case 'E' => error = parseError(body)
        case 'Z' => done = true
        case 'N' | 'S' => () // notice / parameter status
        case other =>
          throw new java.io.IOException(s"unexpected message '$other'")
      }
    }
    QueryResult(columns, rows.toSeq, command, error)
  }

  // ----------------------------------------------------- replication

  /** CopyData ('d') wrapping a StandbyStatusUpdate ('r'): written,
    * flushed, applied LSNs + client clock + reply flag. The ack that
    * moves `confirmed_flush_lsn` on the server (what the slot resume
    * logic reads back).
    */
  def standbyStatusUpdate(writtenLsn: Long, flushedLsn: Long,
      appliedLsn: Long, clockMicros: Long,
      replyRequested: Boolean = false): Array[Byte] = {
    val body = new java.io.ByteArrayOutputStream()
    body.write('r')
    def be(v: Long): Unit =
      (7 to 0 by -1).foreach(i => body.write(((v >> (8 * i)) & 0xff).toInt))
    be(writtenLsn); be(flushedLsn); be(appliedLsn); be(clockMicros)
    body.write(if (replyRequested) 1 else 0)
    message('d', body.toByteArray)
  }

  /** LSN text form `X/Y` ↔ 64-bit. */
  def parseLsn(s: String): Long = {
    val Array(hi, lo) = s.split("/", 2)
    (java.lang.Long.parseLong(hi, 16) << 32) |
      java.lang.Long.parseLong(lo, 16)
  }

  def renderLsn(v: Long): String =
    f"${(v >>> 32).toHexString.toUpperCase}%s/" +
      f"${(v & 0xffffffffL).toHexString.toUpperCase}%s"
}
