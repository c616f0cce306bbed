package graft.pgwire

import java.io.{BufferedInputStream, BufferedOutputStream, DataInputStream, DataOutputStream, IOException}
import java.net.Socket

/** Minimal Postgres v3 frontend: startup + simple Query + both COPY
  * sub-protocols — the client half of the protocol-test pair (the server
  * half is [[MiniPgServer]]). Used by the test-scope pgjdbc stand-ins so
  * the production reflective COPY channels can be driven over a REAL
  * socket. Single-threaded per connection, like the production task model. */
final class PgWireClient(host: String, port: Int) {
  private val socket = new Socket(host, port)
  socket.setTcpNoDelay(true)
  private val in = new DataInputStream(new BufferedInputStream(socket.getInputStream))
  private val out = new DataOutputStream(new BufferedOutputStream(socket.getOutputStream))

  locally { // startup: protocol 3.0, minimal params, then drain to ReadyForQuery
    val params = "user\u0000graft\u0000database\u0000graft\u0000\u0000".getBytes("UTF-8")
    out.writeInt(8 + params.length)
    out.writeInt(196608)
    out.write(params)
    out.flush()
    awaitReady()
  }

  private def readMessage(): (Char, Array[Byte]) = {
    val t = in.readByte().toChar
    val len = in.readInt()
    val payload = new Array[Byte](len - 4)
    in.readFully(payload)
    (t, payload)
  }

  /** ErrorResponse payload → the human 'M' field. */
  private def errorText(p: Array[Byte]): String = {
    var i = 0
    var msg = "unknown server error"
    while (i < p.length && p(i) != 0) {
      val code = p(i).toChar
      val end = p.indexOf(0.toByte, i + 1)
      val v = new String(p, i + 1, end - i - 1, "UTF-8")
      if (code == 'M') msg = v
      i = end + 1
    }
    msg
  }

  /** Drain to ReadyForQuery; throw afterwards if an ErrorResponse arrived
    * (the standard client discipline: the connection stays usable). */
  private def awaitReady(): Unit = {
    var err: String = null
    var done = false
    while (!done) readMessage() match {
      case ('Z', _) => done = true
      case ('E', p) => err = errorText(p)
      case _ => () // R/S/K/C/N/…: irrelevant to the tests
    }
    if (err != null) throw new IOException(s"pgwire server error: $err")
  }

  private def sendQuery(sql: String): Unit = {
    val b = (sql + "\u0000").getBytes("UTF-8")
    out.writeByte('Q'); out.writeInt(4 + b.length); out.write(b); out.flush()
  }

  def simpleCommand(sql: String): Unit = { sendQuery(sql); awaitReady() }

  def beginCopyIn(sql: String): Unit = {
    sendQuery(sql)
    var done = false
    while (!done) readMessage() match {
      case ('G', _) => done = true // CopyInResponse
      case ('E', p) => val m = errorText(p); awaitReady(); throw new IOException(s"pgwire: $m")
      case _ => ()
    }
  }

  def copyData(bytes: Array[Byte]): Unit = {
    out.writeByte('d'); out.writeInt(4 + bytes.length); out.write(bytes); out.flush()
  }

  def endCopyIn(): Unit = {
    out.writeByte('c'); out.writeInt(4); out.flush()
    awaitReady()
  }

  def beginCopyOut(sql: String): Unit = {
    sendQuery(sql)
    var done = false
    while (!done) readMessage() match {
      case ('H', _) => done = true // CopyOutResponse
      case ('E', p) => val m = errorText(p); awaitReady(); throw new IOException(s"pgwire: $m")
      case _ => ()
    }
  }

  /** Next CopyData payload, or null after CopyDone (command tail drained). */
  def nextCopyData(): Array[Byte] = {
    while (true) readMessage() match {
      case ('d', p) => return p
      case ('c', _) => awaitReady(); return null
      case ('E', p) => val m = errorText(p); awaitReady(); throw new IOException(s"pgwire: $m")
      case _ => ()
    }
    null // unreachable
  }

  def terminate(): Unit = {
    try { out.writeByte('X'); out.writeInt(4); out.flush() }
    catch { case _: Exception => () }
    try socket.close() catch { case _: Exception => () }
  }
}

/** A real `java.sql.Driver` for `jdbc:postgresql:` URLs, backed by
  * [[PgWireClient]] — so `DriverManager.getConnection` inside the
  * production copy channels resolves to a live socket in tests. The
  * connection is a dynamic proxy implementing exactly the JDBC surface
  * those channels touch (autocommit/commit/rollback/close, the
  * null-metadata uuid probe, unwrap); anything else throws. */
class FakePgDriver extends java.sql.Driver {
  override def acceptsURL(url: String): Boolean = url.startsWith("jdbc:postgresql:")
  private val UrlRe = "jdbc:postgresql://([^/:]+)(?::(\\d+))?/.*".r
  override def connect(url: String, info: java.util.Properties): java.sql.Connection = {
    if (!acceptsURL(url)) return null
    url match {
      case UrlRe(host, port) =>
        val wire =
          try new PgWireClient(host, if (port == null) 5432 else port.toInt)
          catch { case e: Exception => throw new java.sql.SQLException(s"connect failed: $url", e) }
        FakePgDriver.connectionFor(wire)
      case _ => throw new java.sql.SQLException(s"unparseable fake pg url: $url")
    }
  }
  override def getMajorVersion: Int = 0
  override def getMinorVersion: Int = 0
  override def jdbcCompliant(): Boolean = false
  override def getPropertyInfo(u: String, p: java.util.Properties): Array[java.sql.DriverPropertyInfo] =
    Array.empty
  override def getParentLogger: java.util.logging.Logger =
    throw new java.sql.SQLFeatureNotSupportedException()
}

object FakePgDriver {
  private lazy val registered: Boolean = {
    java.sql.DriverManager.registerDriver(new FakePgDriver)
    true
  }
  def ensureRegistered(): Unit = { val _ = registered }

  private[pgwire] def connectionFor(wire: PgWireClient): java.sql.Connection = {
    var autoCommit = true
    var closed = false
    val handler = new java.lang.reflect.InvocationHandler {
      override def invoke(proxy: AnyRef, m: java.lang.reflect.Method,
          argsRaw: Array[AnyRef]): AnyRef = {
        val args = Option(argsRaw).getOrElse(Array.empty[AnyRef])
        m.getName match {
          case "graftWire" => wire
          case "setAutoCommit" =>
            val want = args(0).asInstanceOf[java.lang.Boolean].booleanValue()
            // entering autocommit=false opens the transaction the COPY
            // rides in — the ordering PgWireProtocolSpec asserts
            if (autoCommit && !want) wire.simpleCommand("BEGIN")
            autoCommit = want
            null
          case "getAutoCommit" => java.lang.Boolean.valueOf(autoCommit)
          case "commit" => wire.simpleCommand("COMMIT"); null
          case "rollback" if args.isEmpty => wire.simpleCommand("ROLLBACK"); null
          case "close" => if (!closed) { closed = true; wire.terminate() }; null
          case "isClosed" => java.lang.Boolean.valueOf(closed)
          case "unwrap" => proxy
          case "isWrapperFor" => java.lang.Boolean.TRUE
          // uuid-column probe: null metadata → documented Set.empty fallback
          case "prepareStatement" => nullMetadataStatement()
          // DDL/MERGE statements (staging create, merge publish, drops)
          case "createStatement" => simpleStatement(wire)
          case "toString" => "FakePgConnection(" + wire + ")"
          case "hashCode" => Integer.valueOf(System.identityHashCode(proxy))
          case "equals" => java.lang.Boolean.valueOf(proxy eq args(0))
          case other => throw new UnsupportedOperationException(
            s"fake pg connection does not implement: $other")
        }
      }
    }
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array(classOf[java.sql.Connection], classOf[org.postgresql.core.BaseConnection]),
      handler).asInstanceOf[java.sql.Connection]
  }

  private def simpleStatement(wire: PgWireClient): AnyRef =
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array[Class[_]](classOf[java.sql.Statement]),
      (_: AnyRef, m: java.lang.reflect.Method, args: Array[AnyRef]) => m.getName match {
        case "executeUpdate" =>
          wire.simpleCommand(args(0).asInstanceOf[String]); Integer.valueOf(0)
        case "close" => null
        case other => throw new UnsupportedOperationException(
          s"fake pg statement does not implement: $other")
      })

  private def nullMetadataStatement(): AnyRef =
    java.lang.reflect.Proxy.newProxyInstance(
      getClass.getClassLoader,
      Array[Class[_]](classOf[java.sql.PreparedStatement]),
      (_: AnyRef, m: java.lang.reflect.Method, _: Array[AnyRef]) => m.getName match {
        case "getMetaData" => null
        case "close" => null
        case other => throw new UnsupportedOperationException(
          s"fake pg statement does not implement: $other")
      })
}
