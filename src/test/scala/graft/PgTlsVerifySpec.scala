package graft

import graft.pgwire.{MiniPgServer, TlsFixture}
import graft.sources.PgWire
import org.scalatest.funsuite.AnyFunSuite

/** sslmode verify-ca / verify-full (r15, completing the libpq trust-mode
  * family the TLS arm shipped without): verify-ca pins the server chain
  * to the `sslrootcert` CA; verify-full adds RFC 6125 endpoint
  * identification inside the handshake. Negatives use a second,
  * unrelated self-signed identity naming a different host — the
  * untrusted-chain and wrong-name arms are separate failures, both
  * refused at handshake, never after data flows. */
class PgTlsVerifySpec extends AnyFunSuite {

  private def server(ctx: javax.net.ssl.SSLContext): MiniPgServer = {
    val srv = new MiniPgServer
    srv.tls = Some(ctx)
    srv.queryExecutor = _ => Some(MiniPgServer.QueryResult(
      Seq(("one", PgWire.Oid.Int4)), Seq(Seq(Some("1")))))
    srv
  }

  test("verify-ca: the server's own root verifies; queries flow") {
    val srv = server(TlsFixture.context)
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "verify-ca", sslRootCert = Some(TlsFixture.certPemPath))(
        _.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("verify-ca: an untrusted chain is refused at handshake") {
    // the server presents the ALT identity; the client trusts only the
    // primary root — the classic MITM-with-own-cert shape that bare
    // `require` cannot see
    val srv = server(TlsFixture.altContext)
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          sslMode = "verify-ca", sslRootCert = Some(TlsFixture.certPemPath))(
          _.query("SELECT 1"))
      }
      assert(e.getMessage.contains("verification failed"), e.getMessage)
      // and no startup/query crossed the broken trust boundary
      assert(srv.eventLog.isEmpty, srv.eventLog.mkString(";"))
    } finally srv.stop()
  }

  test("verify-full: SAN ip:127.0.0.1 identifies the server; queries flow") {
    val srv = server(TlsFixture.context)
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "verify-full", sslRootCert = Some(TlsFixture.certPemPath))(
        _.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("verify-full: a trusted chain naming the WRONG host is refused") {
    // trust the ALT root explicitly — the chain verifies, but its SAN
    // names otherhost.example, not 127.0.0.1: identity is the failure,
    // distinct from the untrusted-chain arm
    val srv = server(TlsFixture.altContext)
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          sslMode = "verify-full", sslRootCert = Some(TlsFixture.altCertPemPath))(
          _.query("SELECT 1"))
      }
      assert(e.getMessage.contains("verification failed"), e.getMessage)
      assert(srv.eventLog.isEmpty, srv.eventLog.mkString(";"))
    } finally srv.stop()
  }

  test("verify-ca under the SAME root still satisfies verify-full's weaker sibling") {
    // belt-and-braces: the ALT server verifies under its OWN root when
    // only the chain is checked — proving the wrong-host refusal above
    // really is the endpoint-identification step, not a chain artifact
    val srv = server(TlsFixture.altContext)
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        sslMode = "verify-ca", sslRootCert = Some(TlsFixture.altCertPemPath))(
        _.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("the verify modes demand a root certificate at construction") {
    for (mode <- Seq("verify-ca", "verify-full")) {
      val e = intercept[IllegalArgumentException] {
        new PgWire.Session("127.0.0.1", 5432, "db", "u",
          sslMode = mode, sslRootCert = None)
      }
      assert(e.getMessage.contains("sslrootcert"), e.getMessage)
    }
  }

  test("opportunistic modes stay unsupported (no silent downgrade family)") {
    for (mode <- Seq("allow", "prefer")) {
      val e = intercept[IllegalArgumentException] {
        new PgWire.Session("127.0.0.1", 5432, "db", "u", sslMode = mode)
      }
      assert(e.getMessage.contains("unsupported sslmode"), e.getMessage)
    }
  }

  test("SCRAM-SHA-256-PLUS binds under verify-full too (binding and verification compose)") {
    val srv = server(TlsFixture.context)
    srv.scram = Some(("s3cret-pw", Array[Byte](9, 9, 9, 9), 4096))
    srv.scramPlus = Some(TlsFixture.serverEndPoint)
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        password = Some("s3cret-pw"), sslMode = "verify-full",
        sslRootCert = Some(TlsFixture.certPemPath))(_.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
      assert(srv.eventLog.exists(_ == "SASL mech=SCRAM-SHA-256-PLUS gs2=p"),
        srv.eventLog.mkString(";"))
    } finally srv.stop()
  }
}
