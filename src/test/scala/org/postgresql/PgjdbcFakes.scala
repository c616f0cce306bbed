// PROTOCOL-TEST DOUBLES — this is NOT pgjdbc. The production COPY channels
// (`JdbcTaskConnection.copyFetch` / `copyWrite`) reach pgjdbc's copy API
// reflectively by these exact class names; the real driver is absent in
// this sandbox, so these test-scope stand-ins implement just enough of
// the Postgres v3 COPY sub-protocol (over a real socket, against
// graft.pgwire.MiniPgServer) to exercise the production seam end-to-end:
// reflective lookup, unwrap, transaction ordering, and the encoder/decoder
// byte streams crossing actual TCP framing. See PgWireProtocolSpec.
package org.postgresql {
  trait PGConnection {
    /** Test hook: the wire client behind this fake connection. The
      * production code never calls PGConnection methods (it only passes
      * the unwrapped connection to the copy-stream constructors), so this
      * trait can carry exactly the accessor the fakes need. */
    def graftWire: graft.pgwire.PgWireClient
  }
}

package org.postgresql.core {
  trait BaseConnection extends org.postgresql.PGConnection
}

package org.postgresql.copy {

  /** `COPY … FROM STDIN` client: constructor issues the COPY query and
    * waits for CopyInResponse; writes frame into CopyData messages
    * (buffered — the encoder emits many small writes); close() sends
    * CopyDone and waits for CommandComplete + ReadyForQuery, surfacing a
    * server ErrorResponse as an IOException (same contract as pgjdbc). */
  class PGCopyOutputStream(conn: org.postgresql.PGConnection, sql: String)
      extends java.io.OutputStream {
    private val wire = conn.graftWire
    private val buf = new java.io.ByteArrayOutputStream(64 * 1024)
    wire.beginCopyIn(sql)

    override def write(b: Int): Unit = { buf.write(b); maybeFlush() }
    override def write(b: Array[Byte], off: Int, len: Int): Unit = {
      buf.write(b, off, len); maybeFlush()
    }
    private def maybeFlush(): Unit = if (buf.size >= 32 * 1024) flushFrame()
    private def flushFrame(): Unit =
      if (buf.size > 0) { wire.copyData(buf.toByteArray); buf.reset() }
    override def close(): Unit = { flushFrame(); wire.endCopyIn() }
  }

  /** `COPY … TO STDOUT` client: constructor issues the COPY query and
    * waits for CopyOutResponse; read() reassembles CopyData frames (the
    * server fragments deliberately) until CopyDone. */
  class PGCopyInputStream(conn: org.postgresql.core.BaseConnection, sql: String)
      extends java.io.InputStream {
    private val wire = conn.graftWire
    wire.beginCopyOut(sql)
    private var cur: Array[Byte] = Array.emptyByteArray
    private var pos = 0
    private var done = false

    private def fill(): Boolean = {
      while (!done && pos >= cur.length) {
        val next = wire.nextCopyData()
        if (next == null) done = true else { cur = next; pos = 0 }
      }
      pos < cur.length
    }
    override def read(): Int =
      if (!fill()) -1 else { val v = cur(pos) & 0xff; pos += 1; v }
    override def read(b: Array[Byte], off: Int, len: Int): Int =
      if (!fill()) -1
      else {
        val n = math.min(len, cur.length - pos)
        System.arraycopy(cur, pos, b, off, n); pos += n; n
      }
    // the owning connection's close() terminates the socket; an undrained
    // stream simply stops being read (the task-completion path)
    override def close(): Unit = ()
  }
}
