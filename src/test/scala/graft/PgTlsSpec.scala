package graft

import graft.pgwire.MiniPgServer
import graft.sources.PgWire
import org.scalatest.funsuite.AnyFunSuite

/** TLS on the native wire client (r15 — beyond reference parity: the
  * reference is explicitly NoTls, `mod.rs:9,61`, but sslmode=require is
  * the last client-realism residual): the SSLRequest bootstrap, queries
  * and binary COPY over the encrypted channel, the cancel side-channel
  * under the same policy, and — the point of `require` — REFUSAL when the
  * server cannot encrypt, never a plaintext fallback. */
class PgTlsSpec extends AnyFunSuite {

  private def tlsServer(): MiniPgServer = {
    val srv = new MiniPgServer
    srv.tls = Some(graft.pgwire.TlsFixture.context)
    srv.queryExecutor = _ => Some(MiniPgServer.QueryResult(
      Seq(("one", PgWire.Oid.Int4)), Seq(Seq(Some("1")))))
    srv
  }

  test("sslmode=require: handshake + query over the encrypted channel") {
    val srv = tlsServer()
    try {
      val (fields, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "require")(_.query("SELECT 1"))
      assert(fields.map(_.name) == Seq("one"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("binary COPY OUT rides the TLS channel (frame reassembly unchanged)") {
    val srv = tlsServer()
    val sql = "COPY (SELECT x) TO STDOUT (FORMAT binary)"
    val payload = Array.tabulate[Byte](64)(i => (i * 7).toByte)
    srv.copyOut.put(sql, payload)
    try {
      val got = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "require") { s =>
        val in = s.copyOut(sql)
        try in.readAllBytes() finally in.close()
      }
      assert(java.util.Arrays.equals(got, payload))
    } finally srv.stop()
  }

  test("auth still verifies THROUGH the TLS layer (md5 under require)") {
    val srv = tlsServer()
    srv.md5 = Some("s3cret-pw")
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        password = Some("s3cret-pw"), sslMode = "require")(_.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some("wrong"), sslMode = "require")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("password authentication failed"), e.getMessage)
    } finally srv.stop()
  }

  test("the cancel side-channel honors the TLS policy (no plaintext key leak)") {
    val srv = tlsServer()
    try {
      val session = new PgWire.Session("127.0.0.1", srv.port, "testdb", "graft",
        sslMode = "require")
      val before = srv.eventLog.size
      session.cancel()
      val deadline = System.nanoTime() + 5_000_000_000L
      var cancels = Seq.empty[String]
      while (cancels.isEmpty && System.nanoTime() < deadline) {
        cancels = srv.eventLog.drop(before).filter(_.startsWith("CANCEL"))
        if (cancels.isEmpty) Thread.sleep(20)
      }
      assert(cancels.nonEmpty && cancels.head.contains("MATCH"),
        s"cancel over TLS must carry the BackendKeyData: ${srv.eventLog}")
      session.close()
    } finally srv.stop()
  }

  test("sslmode=require against a server without TLS: loud refusal, never plaintext") {
    val srv = new MiniPgServer // tls = None → answers 'N'
    srv.queryExecutor = _ => Some(MiniPgServer.QueryResult(
      Seq(("one", PgWire.Oid.Int4)), Seq(Seq(Some("1")))))
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          sslMode = "require")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("does not support TLS"), e.getMessage)
      // and no startup/query ever reached the server in plaintext
      assert(srv.eventLog.isEmpty, srv.eventLog.mkString(";"))
    } finally srv.stop()
  }

  test("a TLS-armed server still serves sslmode=disable clients (answering only real requests)") {
    // the 'N'/'S' answer is the SERVER's choice; a disable-mode client
    // never sends SSLRequest, so both arms coexist on one port
    val srv = tlsServer()
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "disable")(_.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("unsupported sslmode values are refused at construction") {
    // verify-ca/verify-full graduated to real modes in r15
    // (PgTlsVerifySpec); the opportunistic downgrade family stays out
    val e = intercept[IllegalArgumentException] {
      new PgWire.Session("127.0.0.1", 5432, "db", "u", sslMode = "prefer")
    }
    assert(e.getMessage.contains("unsupported sslmode"), e.getMessage)
  }
}
