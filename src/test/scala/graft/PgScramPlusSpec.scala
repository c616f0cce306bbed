package graft

import graft.pgwire.{MiniPgServer, TlsFixture}
import graft.sources.PgWire
import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256-PLUS channel binding (RFC 5802 §6 + RFC 5929
  * tls-server-end-point — the pairing Postgres ships): the r15 TLS arm
  * made the binding possible; this spec pins that the client actually
  * binds, that the binding data is the RIGHT hash of the RIGHT
  * certificate (the fixture computes its expectation independently from
  * the keystore), and that both downgrade defenses hold — the 'y' flag
  * against a stripped mechanism list, and a loud refusal when a
  * plaintext session meets a binding-mandatory server. */
class PgScramPlusSpec extends AnyFunSuite {

  private val Pw = "s3cret-pw"
  private val Salt = Array[Byte](1, 2, 3, 4, 5, 6, 7, 8)
  private val Iters = 4096

  private def server(): MiniPgServer = {
    val srv = new MiniPgServer
    srv.tls = Some(TlsFixture.context)
    srv.scram = Some((Pw, Salt, Iters))
    srv.scramPlus = Some(TlsFixture.serverEndPoint)
    srv.queryExecutor = _ => Some(MiniPgServer.QueryResult(
      Seq(("one", PgWire.Oid.Int4)), Seq(Seq(Some("1")))))
    srv
  }

  test("TLS session binds the channel: -PLUS chosen, certificate hash verified server-side") {
    val srv = server()
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        password = Some(Pw), sslMode = "require")(_.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
      // the server logged WHICH mechanism and gs2 flag the client used —
      // and only accepts a c= matching ITS independently computed cert
      // hash, so reaching the query at all proves the binding bytes
      assert(srv.eventLog.exists(_ == "SASL mech=SCRAM-SHA-256-PLUS gs2=p"),
        srv.eventLog.mkString(";"))
    } finally srv.stop()
  }

  test("the production binding hash equals the RFC 5929 first-principles hash") {
    // keytool emits SHA256withRSA → tls-server-end-point = SHA-256(DER);
    // the fixture side computes that directly, the production side walks
    // the signature-algorithm rule
    assert(java.util.Arrays.equals(
      PgWire.tlsServerEndPoint(TlsFixture.certificate),
      TlsFixture.serverEndPoint))
  }

  test("wrong password still fails under -PLUS (binding does not weaken the proof)") {
    val srv = server()
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some("wrong"), sslMode = "require")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("password authentication failed"), e.getMessage)
    } finally srv.stop()
  }

  test("a server bound to a DIFFERENT certificate rejects the exchange (binding is real, not framing)") {
    val srv = server()
    // the MITM shape: the client handshakes with OUR certificate, but the
    // credential-holding endpoint expects the binding of ANOTHER one
    srv.scramPlus = Some(java.security.MessageDigest.getInstance("SHA-256")
      .digest("not-this-certificate".getBytes("UTF-8")))
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some(Pw), sslMode = "require")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("channel binding mismatch"), e.getMessage)
    } finally srv.stop()
  }

  test("stripped mechanism list: client flags 'y', a -PLUS-capable server rejects (downgrade defense)") {
    val srv = server()
    srv.scramHidePlus = true // the MITM strips -PLUS from the advertisement
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some(Pw), sslMode = "require")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("downgrade"), e.getMessage)
      assert(srv.eventLog.exists(_ == "SASL mech=SCRAM-SHA-256 gs2=y"),
        srv.eventLog.mkString(";"))
    } finally srv.stop()
  }

  test("plaintext session against a binding-mandatory server: loud refusal, no partial exchange") {
    val srv = server()
    srv.tls = None // and the client connects sslmode=disable
    srv.scramOnlyPlus = true
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some(Pw), sslMode = "disable")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("needs a TLS channel"), e.getMessage)
    } finally srv.stop()
  }

  test("plaintext SCRAM still flags 'n' and frames c=biws (no behavior drift for unbound sessions)") {
    val srv = server()
    srv.tls = None
    srv.scramPlus = None
    try {
      val (_, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        password = Some(Pw), sslMode = "disable")(_.query("SELECT 1"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
      assert(srv.eventLog.exists(_ == "SASL mech=SCRAM-SHA-256 gs2=n"),
        srv.eventLog.mkString(";"))
    } finally srv.stop()
  }
}
