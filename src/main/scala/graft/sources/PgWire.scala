package graft.sources

import java.io.{BufferedInputStream, BufferedOutputStream, ByteArrayOutputStream, DataInputStream, DataOutputStream}
import java.net.{InetSocketAddress, Socket}
import java.nio.charset.StandardCharsets.UTF_8

/** Minimal Postgres v3 wire-protocol FRONTEND — the native client the
  * [[PgWireBackend]] speaks, mirroring the reference's own architecture:
  * it talks to Postgres directly over the wire (connection spawn
  * `/root/reference/src/sqldb/postgres/mod.rs:133-168`), not through a
  * JDBC driver. Surface: startup (trust auth), the simple-query protocol
  * with STREAMED text-format rows, the COPY OUT sub-protocol ([[Session.copyOut]]
  * — payload decode belongs to [[PgCopyDecoder]], the write-side twin to
  * [[PgCopyEncoder]]), and loud errors for everything else (auth
  * challenges).
  *
  * Protocol facts (public PG docs, "Frontend/Backend Protocol"):
  * StartupMessage has no type byte (length + protocol 196608 + key/value
  * pairs); every other message is `type:int8, length:int32(incl. itself),
  * payload`. A simple Query answers RowDescription('T') → DataRow('D')* →
  * CommandComplete('C') → ReadyForQuery('Z'), with NoticeResponse('N') /
  * ParameterStatus('S') / BackendKeyData('K') interleavable anywhere. */
object PgWire {

  /** pg_type OIDs (stable public catalog constants). */
  object Oid {
    val Bool = 16; val Bytea = 17; val Int8 = 20; val Int2 = 21
    val Int4 = 23; val Text = 25; val Float4 = 700; val Float8 = 701
    val Bpchar = 1042; val Varchar = 1043; val Date = 1082
    val Timestamp = 1114; val Timestamptz = 1184; val Numeric = 1700
    val Uuid = 2950
  }

  case class Field(name: String, typeOid: Int)

  /** Socket read deadline: bounds every blocking wire read so a stalled
    * server (network partition after connect, a lost ReadyForQuery)
    * surfaces as a SocketTimeoutException in the task instead of hanging
    * it forever. Generous default — a fused query legitimately computes
    * its whole result before the first row ships; tune per deployment. */
  def readTimeoutMs: Int =
    sys.props.getOrElse("graft.pgwire.readTimeoutMs", "300000").toInt

  /** One open connection running the simple-query protocol. NOT
    * thread-safe (one in-flight query per connection, like the protocol
    * itself); open one session per task. `password` enables
    * SCRAM-SHA-256 ([[Scram]]) when the server demands it; trust-auth
    * servers never consult it. */
  final class Session(host: String, port: Int, database: String, user: String,
      password: Option[String] = None,
      sslMode: String = PgWire.configuredSslMode,
      sslRootCert: Option[String] = PgWire.configuredSslRootCert)
      extends AutoCloseable {
    require(Set("disable", "require", "verify-ca", "verify-full")(sslMode),
      s"pgwire: unsupported sslmode '$sslMode' — disable, require, " +
        "verify-ca and verify-full are implemented (libpq's allow/prefer " +
        "opportunistic modes are not: encryption that silently downgrades " +
        "is worse than a loud policy)")
    require(!sslMode.startsWith("verify-") || sslRootCert.nonEmpty,
      s"pgwire: sslmode=$sslMode needs sslrootcert (a CA certificate to " +
        "verify against — pass one to PgWire.Session, or set " +
        "graft.pgwire.sslrootcert); refusing loudly beats silently not verifying")
    private val socket: Socket = {
      val plain = new Socket()
      plain.connect(new InetSocketAddress(host, port), 10000)
      try {
        // deadline BEFORE the TLS dance: the SSLRequest response read and
        // the handshake must not hang a task against a stalled server
        plain.setSoTimeout(readTimeoutMs)
        if (sslMode != "disable")
          PgWire.startTls(plain, host, port, sslMode, sslRootCert)
        else plain
      } catch { case e: Throwable =>
        try plain.close() catch { case _: Exception => () }; throw e
      }
    }
    // everything past the connect must not leak the socket on failure
    // (an auth-demanding server throws from the startup block; retrying
    // callers would otherwise bleed one fd per attempt)
    private val (in, out) =
      try {
        socket.setSoTimeout(readTimeoutMs)
        val i = new DataInputStream(new BufferedInputStream(socket.getInputStream))
        val o = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))
        (i, o)
      } catch { case e: Throwable => try socket.close() catch { case _: Exception => () }; throw e }

    /** BackendKeyData, captured whenever the server volunteers it — the
      * credential [[cancel]] presents on its side-channel. DECLARED
      * BEFORE the startup block: the server sends 'K' during startup,
      * i.e. while the constructor runs — a later declaration's `= None`
      * initializer would execute after the capture and wipe it. */
    @volatile private var backendKey: Option[(Int, Int)] = None

    try { // startup: no type byte
      val params = new ByteArrayOutputStream()
      def kv(k: String, v: String): Unit = {
        params.write(k.getBytes(UTF_8)); params.write(0)
        params.write(v.getBytes(UTF_8)); params.write(0)
      }
      kv("user", user); kv("database", database)
      params.write(0)
      val body = params.toByteArray
      out.writeInt(8 + body.length)
      out.writeInt(196608) // protocol 3.0
      out.write(body)
      out.flush()
      // trust auth (AuthenticationOk, code 0), md5 (code 5 — pre-v14
      // servers and password_encryption=md5 installs, still common in the
      // field), or SCRAM-SHA-256 (code 10, AuthenticationSASL — the
      // packaged Postgres default since v14); cleartext/GSS/other
      // challenges fail loudly — sending a password in the clear is a
      // refusal, not a fallback
      var ready = false
      while (!ready) readMessage() match {
        case ('R', payload) =>
          val code = ((payload(0) & 0xff) << 24) | ((payload(1) & 0xff) << 16) |
            ((payload(2) & 0xff) << 8) | (payload(3) & 0xff)
          code match {
            case 0 => () // AuthenticationOk
            case 5 => md5Auth(payload) // Ok (or ErrorResponse) follows
            case 10 => scramAuth(payload) // runs through SASLFinal; Ok follows
            case other => throw new java.io.IOException(
              s"pgwire: server requires authentication (code $other); " +
                "only trust auth, md5, and SCRAM-SHA-256 are supported")
          }
        case ('Z', _) => ready = true
        case ('E', payload) => throw new java.io.IOException(
          s"pgwire startup error: ${errorMessage(payload)}")
        case _ => () // ParameterStatus / BackendKeyData / NoticeResponse
      }
    } catch { case e: Throwable => try socket.close() catch { case _: Exception => () }; throw e }

    /** md5 password exchange (public PG docs, "Password Authentication"):
      * the server sends a 4-byte salt; the response is
      * `'md5' || hex(md5(hex(md5(password || user)) || salt))` in a
      * PasswordMessage — the double hash means neither the password nor
      * its reusable inner hash crosses the wire in the clear. */
    private def md5Auth(payload: Array[Byte]): Unit = {
      val pw = password.getOrElse(throw new java.io.IOException(
        "pgwire: server demands md5 password auth but no password is " +
          "configured (pass one to PgWire.Session, or set graft.pgwire.password)"))
      if (payload.length < 8) throw new java.io.IOException(
        "pgwire: AuthenticationMD5Password without a 4-byte salt")
      val salt = java.util.Arrays.copyOfRange(payload, 4, 8)
      def hexMd5(data: Array[Byte]): String =
        java.security.MessageDigest.getInstance("MD5").digest(data)
          .map(b => f"${b & 0xff}%02x").mkString
      val inner = hexMd5((pw + user).getBytes(UTF_8))
      val outer = "md5" + hexMd5(inner.getBytes(UTF_8) ++ salt)
      val resp = outer.getBytes(UTF_8)
      out.writeByte('p') // PasswordMessage
      out.writeInt(4 + resp.length + 1)
      out.write(resp)
      out.writeByte(0)
      out.flush()
      // the startup loop consumes AuthenticationOk / ErrorResponse
    }

    /** tls-server-end-point channel-binding data (RFC 5929 §4.1) when
      * this session runs over TLS: a hash of the server's DER certificate
      * — the one THIS socket actually handshook with, so a MITM
      * terminating TLS cannot replay the exchange to the real server
      * (its certificate hashes differently and the proof covers the
      * hash). None on plaintext sessions. */
    private def tlsChannelBinding: Option[Array[Byte]] = socket match {
      case ssl: javax.net.ssl.SSLSocket =>
        Some(PgWire.tlsServerEndPoint(ssl.getSession.getPeerCertificates.head
          .asInstanceOf[java.security.cert.X509Certificate]))
      case _ => None
    }

    /** SCRAM-SHA-256(-PLUS) exchange (RFC 5802/7677 over the PG SASL
      * framing): SASLInitialResponse → AuthenticationSASLContinue →
      * SASLResponse → AuthenticationSASLFinal, whose `v=` server
      * signature is VERIFIED — a server that cannot prove it holds the
      * credential is refused even if it would let us in.
      *
      * Mechanism + gs2 flag selection (RFC 5802 §6, libpq's rules):
      *  - TLS session and the server advertises -PLUS → bind the channel
      *    (`p=tls-server-end-point`): both proofs then cover the server
      *    certificate hash, so a TLS-terminating MITM cannot broker the
      *    exchange through to the real server.
      *  - TLS session but no -PLUS advertised → gs2 flag `y` ("I can
      *    bind; you offered no binding mechanism"): a server that DOES
      *    support -PLUS must fail the exchange on seeing it — the
      *    defense against a MITM stripping -PLUS from the mechanism list.
      *  - Plaintext → `n` as before; a server offering ONLY -PLUS is
      *    refused loudly (binding needs a channel to bind to).
      *
      * Returns with AuthenticationOk still unread (the startup loop
      * consumes it). */
    private def scramAuth(payload: Array[Byte]): Unit = {
      // AuthenticationSASL: code, then mechanism cstrings, empty-terminated
      val mechs = scala.collection.mutable.ArrayBuffer.empty[String]
      var i = 4
      while (i < payload.length && payload(i) != 0) {
        var end = payload.indexOf(0.toByte, i)
        if (end < 0) end = payload.length
        mechs += new String(payload, i, end - i, UTF_8)
        i = end + 1
      }
      val cb = tlsChannelBinding
      val (mechanism, gs2) = cb match {
        case Some(_) if mechs.contains("SCRAM-SHA-256-PLUS") =>
          ("SCRAM-SHA-256-PLUS", "p=tls-server-end-point,,")
        case Some(_) if mechs.contains("SCRAM-SHA-256") =>
          ("SCRAM-SHA-256", "y,,")
        case None if mechs.contains("SCRAM-SHA-256") =>
          ("SCRAM-SHA-256", "n,,")
        case _ => throw new java.io.IOException(
          s"pgwire: server offers SASL mechanisms [${mechs.mkString(", ")}]; " +
            (if (cb.isEmpty && mechs.contains("SCRAM-SHA-256-PLUS"))
              "SCRAM-SHA-256-PLUS needs a TLS channel to bind (sslmode=require)"
            else "only SCRAM-SHA-256 and SCRAM-SHA-256-PLUS are supported"))
      }
      val pw = password.getOrElse(throw new java.io.IOException(
        s"pgwire: server demands $mechanism but no password is configured " +
          "(pass one to PgWire.Session, or set graft.pgwire.password)"))
      val cNonce = Scram.freshNonce()
      val firstBare = s"n=,r=$cNonce" // username rides the startup packet
      val initial = (gs2 + firstBare).getBytes(UTF_8)
      val body = new ByteArrayOutputStream()
      body.write(mechanism.getBytes(UTF_8)); body.write(0)
      body.write((initial.length >>> 24) & 0xff); body.write((initial.length >>> 16) & 0xff)
      body.write((initial.length >>> 8) & 0xff); body.write(initial.length & 0xff)
      body.write(initial)
      out.writeByte('p') // SASLInitialResponse
      out.writeInt(4 + body.size())
      body.writeTo(out)
      out.flush()

      def awaitSasl(expectCode: Int, what: String): String = {
        while (true) readMessage() match {
          case ('R', p) =>
            val code = ((p(0) & 0xff) << 24) | ((p(1) & 0xff) << 16) |
              ((p(2) & 0xff) << 8) | (p(3) & 0xff)
            if (code != expectCode) throw new java.io.IOException(
              s"pgwire SCRAM: expected $what (code $expectCode), got auth code $code")
            return new String(p, 4, p.length - 4, UTF_8)
          case ('E', p) => throw new java.io.IOException(
            s"pgwire SCRAM authentication failed: ${errorMessage(p)}")
          case ('N', _) | ('S', _) | ('K', _) => ()
          case (other, _) => throw new java.io.IOException(
            s"pgwire SCRAM: unexpected message '$other'")
        }
        throw new IllegalStateException("unreachable")
      }

      val serverFirst = awaitSasl(11, "AuthenticationSASLContinue")
      val a = Scram.attrs(serverFirst)
      val fullNonce = a.getOrElse('r', throw new java.io.IOException(
        s"pgwire SCRAM: server-first-message missing r=: $serverFirst"))
      if (!fullNonce.startsWith(cNonce)) throw new java.io.IOException(
        "pgwire SCRAM: server nonce does not extend the client nonce (replay?)")
      val salt = Scram.unb64(a.getOrElse('s', throw new java.io.IOException(
        s"pgwire SCRAM: server-first-message missing s=: $serverFirst")))
      val iterations = a.getOrElse('i', throw new java.io.IOException(
        s"pgwire SCRAM: server-first-message missing i=: $serverFirst"))
        .toIntOption.getOrElse(throw new java.io.IOException(
          s"pgwire SCRAM: non-numeric i= in server-first-message: $serverFirst"))
      // c= carries base64(gs2-header ++ cb-data): under -PLUS the server
      // certificate hash is INSIDE AuthMessage, so both proofs cover it
      // ("biws" is this formula for the plain "n,," header)
      val cAttr = Scram.b64(gs2.getBytes(UTF_8) ++
        (if (mechanism.endsWith("-PLUS")) cb.get else Array.emptyByteArray))
      val withoutProof = s"c=$cAttr,r=$fullNonce"
      val authMessage = s"$firstBare,$serverFirst,$withoutProof"
      val salted = Scram.saltedPassword(pw, salt, iterations)
      val finalMsg =
        (withoutProof + ",p=" + Scram.b64(Scram.clientProof(salted, authMessage)))
          .getBytes(UTF_8)
      out.writeByte('p') // SASLResponse
      out.writeInt(4 + finalMsg.length)
      out.write(finalMsg)
      out.flush()

      val serverFinal = awaitSasl(12, "AuthenticationSASLFinal")
      val v = Scram.attrs(serverFinal).getOrElse('v', throw new java.io.IOException(
        s"pgwire SCRAM: server-final-message missing v=: $serverFinal"))
      val expect = Scram.serverSignature(salted, authMessage)
      if (!java.util.Arrays.equals(Scram.unb64(v), expect))
        throw new java.io.IOException(
          "pgwire SCRAM: server signature mismatch — the server did not " +
            "prove knowledge of the credential; refusing the session")
    }

    private def readMessage(): (Char, Array[Byte]) = {
      val t = in.readByte().toChar
      val len = in.readInt()
      val payload = new Array[Byte](len - 4)
      in.readFully(payload)
      if (t == 'K' && payload.length == 8) {
        val bb = java.nio.ByteBuffer.wrap(payload)
        backendKey = Some((bb.getInt(), bb.getInt()))
      }
      (t, payload)
    }

    /** Fire a CancelRequest on the protocol's side-channel (public PG
      * docs, "Canceling Requests in Progress"): a FRESH connection
      * carrying the BackendKeyData secret, so the server kills the
      * running query server-side — socket close alone leaves a runaway
      * fused query executing until its next write. Best-effort and
      * thread-safe by design (the protocol offers no acknowledgment);
      * callers still close the session afterwards. No-op when the server
      * never sent BackendKeyData. */
    def cancel(): Unit = backendKey.foreach { case (pid, secret) =>
      val s = new Socket()
      var wire: Socket = s
      try {
        // short connect timeout: this runs in task-CLEANUP paths, and an
        // unreachable server (the common reason streams get abandoned)
        // must not stall stage teardown 10 s per task — best-effort means
        // give up fast, the socket close remains the fallback
        s.connect(new InetSocketAddress(host, port), 2000)
        s.setSoTimeout(2000)
        // the side-channel honors the session's TLS policy: libpq runs the
        // same SSLRequest dance on cancel connections, and a require-mode
        // deployment must not leak (pid, secret) in plaintext
        if (sslMode != "disable")
          wire = PgWire.startTls(s, host, port, sslMode, sslRootCert)
        val o = new DataOutputStream(wire.getOutputStream)
        o.writeInt(16)
        o.writeInt(80877102) // the cancel request code (1234,5678)
        o.writeInt(pid)
        o.writeInt(secret)
        o.flush()
      } catch { case _: Exception => () } // fallback stays socket close
      finally { try wire.close() catch { case _: Exception => () } }
    }

    private def errorMessage(payload: Array[Byte]): String = {
      // ErrorResponse: (fieldType:int8, cstring)* 0 — surface the 'M'
      // (human message) field. Tolerant of a truncated payload (field
      // missing its NUL): the diagnostic path must not itself crash.
      var i = 0
      var msg = "unknown error"
      while (i < payload.length && payload(i) != 0) {
        val ft = payload(i).toChar
        var end = payload.indexOf(0.toByte, i + 1)
        if (end < 0) end = payload.length
        val v = new String(payload, i + 1, end - i - 1, UTF_8)
        if (ft == 'M') msg = v
        i = end + 1
      }
      msg
    }

    /** Run one simple query, streaming text-format rows: `onFields` sees
      * the RowDescription before the first row; the returned iterator
      * yields each DataRow's values (None = SQL NULL) and, once
      * exhausted, has consumed through ReadyForQuery — leaving the
      * session reusable. Abandoning the iterator mid-stream requires
      * closing the session (the socket is the cancel mechanism, as in the
      * reference's one-shot connections). */
    def queryStream(sql: String)(onFields: Seq[Field] => Unit): Iterator[Array[Option[String]]] = {
      val body = new ByteArrayOutputStream()
      body.write(sql.getBytes(UTF_8)); body.write(0)
      out.writeByte('Q')
      out.writeInt(4 + body.size())
      body.writeTo(out)
      out.flush()
      new Iterator[Array[Option[String]]] {
        private var nextRow: Array[Option[String]] = null
        private var done = false
        private var fieldsSeen = false
        private def advance(): Unit = {
          while (nextRow == null && !done) readMessage() match {
            case ('T', p) =>
              onFields(parseRowDescription(p)); fieldsSeen = true
            case ('D', p) => nextRow = parseDataRow(p)
            case ('C', _) => () // CommandComplete; 'Z' follows
            case ('Z', _) =>
              done = true
              if (!fieldsSeen) throw new java.io.IOException(
                "pgwire: statement returned no result set (not a query?)")
            case ('E', p) =>
              val msg = errorMessage(p)
              drainToReady()
              throw new java.io.IOException(s"pgwire query error: $msg")
            case ('N', _) | ('S', _) | ('K', _) => ()
            case (other, _) => throw new java.io.IOException(
              s"pgwire: unexpected message '$other' during query")
          }
        }
        override def hasNext: Boolean = { advance(); nextRow != null }
        override def next(): Array[Option[String]] = {
          advance()
          if (nextRow == null) throw new NoSuchElementException("pgwire row stream")
          val r = nextRow; nextRow = null; r
        }
      }
    }

    private def drainToReady(): Unit = {
      var z = false
      while (!z) readMessage() match {
        case ('Z', _) => z = true
        case _ => ()
      }
    }

    /** Run one RowDescription-only probe (`… LIMIT 0`) and return the
      * result fields — the wire-native analog of a JDBC Describe: the
      * caller learns each column's type OID (e.g. which text columns are
      * uuid on the wire) without fetching a row. */
    def fields(sql: String): Seq[Field] = {
      var fs: Seq[Field] = Nil
      val it = queryStream(sql)(fs = _)
      while (it.hasNext) it.next() // LIMIT 0: drains straight to ReadyForQuery
      fs
    }

    /** Run one `COPY … TO STDOUT (FORMAT binary)` statement and stream the
      * reassembled payload — the reference's core read transport
      * (`/root/reference/src/sqldb/postgres/mod.rs:133-168` issues exactly
      * this statement; `binary_reader.rs:24-209` decodes the bytes). The
      * sub-protocol (public PG docs, "COPY Operations"): the server answers
      * CopyOutResponse('H': int8 overall format, int16 ncols, int16
      * per-column formats), then the payload as CopyData('d') frames whose
      * boundaries carry NO alignment to row or field boundaries (frame
      * reassembly is the client's job), then CopyDone('c'),
      * CommandComplete('C'), ReadyForQuery('Z'). NoticeResponse /
      * ParameterStatus may interleave ANYWHERE, including between CopyData
      * frames — the real-server client_min_messages quirk.
      *
      * The returned InputStream yields payload bytes across frames; once
      * the trailer is consumed it has read through ReadyForQuery, leaving
      * the session reusable. Abandoning it mid-stream requires closing the
      * session (the socket is the cancel mechanism). ErrorResponse — before
      * the first frame or mid-stream — drains to ready and throws. */
    def copyOut(sql: String): java.io.InputStream = {
      val body = new ByteArrayOutputStream()
      body.write(sql.getBytes(UTF_8)); body.write(0)
      out.writeByte('Q')
      out.writeInt(4 + body.size())
      body.writeTo(out)
      out.flush()
      // header: CopyOutResponse, or a loud error for anything else
      var started = false
      while (!started) readMessage() match {
        case ('H', p) =>
          if (p.nonEmpty && p(0) != 1) throw new java.io.IOException(
            s"pgwire COPY: server chose format ${p(0)} but FORMAT binary was requested")
          started = true
        case ('E', p) =>
          val msg = errorMessage(p)
          drainToReady()
          throw new java.io.IOException(s"pgwire COPY error: $msg")
        case ('N', _) | ('S', _) | ('K', _) => ()
        case (other, _) => throw new java.io.IOException(
          s"pgwire: unexpected message '$other' awaiting CopyOutResponse")
      }
      new java.io.InputStream {
        private var buf: Array[Byte] = Array.emptyByteArray
        private var pos = 0
        private var done = false
        /** Ensure at least one unread payload byte, or end-of-copy. */
        private def fill(): Boolean = {
          while (pos >= buf.length && !done) readMessage() match {
            case ('d', p) => buf = p; pos = 0
            case ('c', _) => drainToReady(); done = true // CopyDone → 'C' → 'Z'
            case ('E', p) =>
              val msg = errorMessage(p)
              drainToReady()
              throw new java.io.IOException(s"pgwire COPY aborted mid-stream: $msg")
            case ('N', _) | ('S', _) | ('K', _) => () // chatter between frames
            case (other, _) => throw new java.io.IOException(
              s"pgwire: unexpected message '$other' during COPY OUT")
          }
          pos < buf.length
        }
        override def read(): Int =
          if (!fill()) -1 else { val b = buf(pos) & 0xff; pos += 1; b }
        override def read(b: Array[Byte], off: Int, len: Int): Int = {
          if (len == 0) return 0
          if (!fill()) return -1
          val n = math.min(len, buf.length - pos)
          System.arraycopy(buf, pos, b, off, n)
          pos += n
          n
        }
      }
    }

    private def parseRowDescription(p: Array[Byte]): Seq[Field] = {
      val buf = java.nio.ByteBuffer.wrap(p)
      val n = buf.getShort()
      (0 until n).map { _ =>
        val start = buf.position()
        while (buf.get() != 0) {}
        val name = new String(p, start, buf.position() - start - 1, UTF_8)
        buf.getInt() // table oid
        buf.getShort() // attnum
        val typeOid = buf.getInt()
        buf.getShort() // typlen
        buf.getInt() // typmod
        val fmt = buf.getShort() // 0 = text
        if (fmt != 0) throw new java.io.IOException(
          s"pgwire: binary result format for '$name' — simple queries are text-format")
        Field(name, typeOid)
      }
    }

    private def parseDataRow(p: Array[Byte]): Array[Option[String]] = {
      val buf = java.nio.ByteBuffer.wrap(p)
      val n = buf.getShort()
      Array.tabulate(n) { _ =>
        val len = buf.getInt()
        if (len < 0) None
        else {
          val bytes = new Array[Byte](len)
          buf.get(bytes)
          Some(new String(bytes, UTF_8))
        }
      }
    }

    /** Buffered variant of [[queryStream]]. */
    def query(sql: String): (Seq[Field], Vector[Array[Option[String]]]) = {
      var fields: Seq[Field] = Nil
      val rows = queryStream(sql)(fields = _).toVector
      (fields, rows)
    }

    override def close(): Unit = {
      try { // Terminate is a courtesy; the socket close is the contract
        out.writeByte('X'); out.writeInt(4); out.flush()
      } catch { case _: Exception => () }
      try socket.close() catch { case _: Exception => () }
    }
  }

  def withSession[A](host: String, port: Int, database: String,
      user: String = "graft", password: Option[String] = None,
      sslMode: String = PgWire.configuredSslMode,
      sslRootCert: Option[String] = PgWire.configuredSslRootCert)(
      f: Session => A): A = {
    val s = new Session(host, port, database, user, password, sslMode, sslRootCert)
    try f(s) finally s.close()
  }

  /** Deployment-wide wire credential for backends that construct their own
    * sessions: `-Dgraft.pgwire.password=…` (driver AND executors — ship it
    * via spark.executor.extraJavaOptions) or env GRAFT_PGWIRE_PASSWORD.
    * Absent = trust-auth only, SCRAM servers are refused loudly. */
  def configuredPassword: Option[String] =
    sys.props.get("graft.pgwire.password")
      .orElse(sys.env.get("GRAFT_PGWIRE_PASSWORD"))

  /** Deployment-wide TLS policy (per-JVM like the password — ship via
    * executor extraJavaOptions): `disable` (default — the reference client
    * is explicitly NoTls, `mod.rs:9,61`), `require`, `verify-ca` or
    * `verify-full` (the last two need [[configuredSslRootCert]]). */
  def configuredSslMode: String =
    sys.props.get("graft.pgwire.sslmode")
      .orElse(sys.env.get("GRAFT_PGWIRE_SSLMODE"))
      .getOrElse("disable")

  /** CA certificate path for the verify modes (libpq's sslrootcert):
    * `-Dgraft.pgwire.sslrootcert=…` or GRAFT_PGWIRE_SSLROOTCERT. PEM or
    * DER, one or more certificates. */
  def configuredSslRootCert: Option[String] =
    sys.props.get("graft.pgwire.sslrootcert")
      .orElse(sys.env.get("GRAFT_PGWIRE_SSLROOTCERT"))

  /** The PG TLS bootstrap (public docs, protocol "SSL Session Encryption"):
    * an 8-byte SSLRequest (code 80877103) on the PLAIN socket, a 1-byte
    * answer, then — on 'S' — a client-mode JSSE handshake layered over the
    * same socket. 'N' under any non-disable sslmode is a REFUSAL (never a
    * plaintext fallback). Trust policy is libpq's, mode for mode:
    *  - `require`: encrypted, certificate NOT verified;
    *  - `verify-ca`: the server chain must verify against `rootCert`
    *    (PKIX), identity unchecked;
    *  - `verify-full`: verify-ca plus RFC 6125 endpoint identification
    *    (JSSE's HTTPS algorithm — the SAN/hostname match runs INSIDE the
    *    handshake, so identity failure is a handshake failure, not a
    *    post-hoc check a code path could skip).
    * SCRAM-SHA-256-PLUS channel binding (r15) hooks the negotiated
    * session's peer certificate via [[tlsServerEndPoint]] under every
    * mode: under `require` it does not verify the certificate, but it
    * cryptographically ties the password proof to it. */
  private[graft] def startTls(plain: Socket, host: String, port: Int,
      sslMode: String = "require", rootCert: Option[String] = None): Socket = {
    val o = new DataOutputStream(plain.getOutputStream)
    o.writeInt(8)
    o.writeInt(80877103) // SSLRequest (1234, 5679)
    o.flush()
    plain.getInputStream.read() match {
      case 'S' =>
        val ctx =
          if (sslMode.startsWith("verify-")) verifyingContext(rootCert.get)
          else trustAllContext
        val ssl = ctx.getSocketFactory
          .createSocket(plain, host, port, true)
          .asInstanceOf[javax.net.ssl.SSLSocket]
        ssl.setUseClientMode(true)
        if (sslMode == "verify-full") {
          val p = ssl.getSSLParameters
          p.setEndpointIdentificationAlgorithm("HTTPS")
          ssl.setSSLParameters(p)
        }
        try ssl.startHandshake()
        catch { case e: javax.net.ssl.SSLHandshakeException =>
          throw new java.io.IOException(
            s"pgwire: TLS $sslMode verification failed against $host:$port " +
              s"— ${e.getMessage}", e)
        }
        ssl
      case 'N' => throw new java.io.IOException(
        s"pgwire: server does not support TLS but sslmode=$sslMode — " +
          "refusing to continue in plaintext")
      case -1 => throw new java.io.IOException(
        "pgwire: connection closed during SSLRequest")
      case other => throw new java.io.IOException(
        s"pgwire: unexpected SSLRequest response byte $other")
    }
  }

  /** PKIX-verifying SSLContext trusting exactly the certificates in the
    * `sslrootcert` file (PEM or DER, one or more). Cached per path: the
    * verify modes run once per task connection, and 1000 executors must
    * not re-read and re-parse the CA file per socket. */
  private val verifyingContexts =
    new java.util.concurrent.ConcurrentHashMap[String, javax.net.ssl.SSLContext]
  private[graft] def verifyingContext(path: String): javax.net.ssl.SSLContext =
    verifyingContexts.computeIfAbsent(path, p => {
      val cf = java.security.cert.CertificateFactory.getInstance("X.509")
      val in = new java.io.FileInputStream(p)
      val certs = try cf.generateCertificates(in) finally in.close()
      if (certs.isEmpty) throw new java.io.IOException(
        s"pgwire: sslrootcert $p holds no X.509 certificates")
      val ks = java.security.KeyStore.getInstance(
        java.security.KeyStore.getDefaultType)
      ks.load(null, null)
      val it = certs.iterator()
      var i = 0
      while (it.hasNext) { ks.setCertificateEntry(s"root$i", it.next()); i += 1 }
      val tmf = javax.net.ssl.TrustManagerFactory.getInstance(
        javax.net.ssl.TrustManagerFactory.getDefaultAlgorithm)
      tmf.init(ks)
      val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
      ctx.init(null, tmf.getTrustManagers, new java.security.SecureRandom)
      ctx
    })

  /** tls-server-end-point channel-binding data (RFC 5929 §4.1): a hash
    * of the server's DER-encoded certificate under the hash function of
    * the certificate's OWN signature algorithm, with MD5 and SHA-1
    * upgraded to SHA-256 (the RFC's rule, kept by RFC 9266's successors
    * and by Postgres' implementation). */
  private[graft] def tlsServerEndPoint(
      cert: java.security.cert.X509Certificate): Array[Byte] = {
    val sig = cert.getSigAlgName.toUpperCase(java.util.Locale.ROOT)
    val hash =
      if (sig.contains("SHA384")) "SHA-384"
      else if (sig.contains("SHA512")) "SHA-512"
      else "SHA-256" // SHA-256 itself, plus the MD5/SHA-1 upgrade rule
    java.security.MessageDigest.getInstance(hash).digest(cert.getEncoded)
  }

  /** Encrypt-only trust manager — the libpq `require` contract (see
    * [[startTls]]); NOT a shortcut around verification modes we claim. */
  private lazy val trustAllContext: javax.net.ssl.SSLContext = {
    val tm = new javax.net.ssl.X509TrustManager {
      override def getAcceptedIssuers: Array[java.security.cert.X509Certificate] =
        Array.empty
      override def checkClientTrusted(
          cs: Array[java.security.cert.X509Certificate], a: String): Unit = ()
      override def checkServerTrusted(
          cs: Array[java.security.cert.X509Certificate], a: String): Unit = ()
    }
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(null, Array(tm), new java.security.SecureRandom)
    ctx
  }
}
