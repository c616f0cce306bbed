package graft

import graft.pgwire.MiniPgServer
import graft.sources.{PgWire, Scram}
import org.scalatest.funsuite.AnyFunSuite

/** SCRAM-SHA-256 for the native wire client: the RFC 7677 §3 example
  * vector pins every derivation, then the full choreography runs over a
  * real loopback socket against MiniPgServer's verifier (which recomputes
  * the proof from the configured password — a client that signs the wrong
  * AuthMessage cannot pass). */
class ScramSpec extends AnyFunSuite {

  test("RFC 7677 §3 example vector: client proof and server signature") {
    // C: n,,n=user,r=rOprNGfwEbeRWgbNEkqO
    // S: r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0,
    //    s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096
    // C: c=biws,r=…,p=dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=
    // S: v=6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=
    val serverFirst =
      "r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0," +
        "s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096"
    val authMessage =
      "n=user,r=rOprNGfwEbeRWgbNEkqO," + serverFirst +
        ",c=biws,r=rOprNGfwEbeRWgbNEkqO%hvYDpWUa2RaTCAfuxFIlj)hNlF$k0"
    val salted = Scram.saltedPassword("pencil",
      Scram.unb64("W22ZaJ0SNY7soEsUEjb6gQ=="), 4096)
    assert(Scram.b64(Scram.clientProof(salted, authMessage)) ==
      "dHzbZapWIk4jUhN+Ute9ytag9zjfMHgsqmmiz7AndVQ=")
    assert(Scram.b64(Scram.serverSignature(salted, authMessage)) ==
      "6rriTRBi23WpRR/wtup+mMhUZUn/dB5nLTJRsjl95G4=")
    // the server-side recovery direction closes the loop: proof → ClientKey
    val storedKey = Scram.storedKey(Scram.clientKey(salted))
    val recovered = Scram.recoverClientKey(storedKey, authMessage,
      Scram.clientProof(salted, authMessage))
    assert(java.util.Arrays.equals(Scram.sha256(recovered), storedKey))
  }

  private def scramServer(pw: String): MiniPgServer = {
    val srv = new MiniPgServer
    srv.scram = Some((pw, Scram.unb64("W22ZaJ0SNY7soEsUEjb6gQ=="), 4096))
    srv.queryExecutor = _ => Some(MiniPgServer.QueryResult(
      Seq(("one", PgWire.Oid.Int4)), Seq(Seq(Some("1")))))
    srv
  }

  test("loopback: correct password authenticates and queries flow") {
    val srv = scramServer("s3cret-pw")
    try {
      val (fields, rows) = PgWire.withSession("127.0.0.1", srv.port, "testdb",
        password = Some("s3cret-pw"))(_.query("SELECT 1"))
      assert(fields.map(_.name) == Seq("one"))
      assert(rows.map(_.toSeq) == Vector(Seq(Some("1"))))
    } finally srv.stop()
  }

  test("loopback: wrong password is refused loudly with the server's message") {
    val srv = scramServer("s3cret-pw")
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some("wrong"))(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("authentication failed"), e.getMessage)
    } finally srv.stop()
  }

  test("loopback: a SCRAM demand with no configured password is refused loudly, not hung") {
    val srv = scramServer("s3cret-pw")
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb")(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("no password is configured"), e.getMessage)
    } finally srv.stop()
  }

  test("malformed SCRAM attribute framing is refused loudly, not mis-parsed (r14)") {
    // a pair without '=' must not silently parse as key 'x' value ''
    val e1 = intercept[java.io.IOException](Scram.attrs("xy,r=abc"))
    assert(e1.getMessage.contains("malformed attribute"), e1.getMessage)
    val e2 = intercept[java.io.IOException](Scram.attrs("r"))
    assert(e2.getMessage.contains("malformed attribute"), e2.getMessage)
    // values may themselves contain '=' (base64 padding) — still parses
    assert(Scram.attrs("s=W22ZaJ0SNY7soEsUEjb6gQ==,i=4096") ==
      Map('s' -> "W22ZaJ0SNY7soEsUEjb6gQ==", 'i' -> "4096"))
    // a server-first message missing s= or i= gets the same loud
    // IOException style as the missing-r= case (choreography-level)
    val srv = scramServer("pw")
    srv.scramServerFirstRewrite = Some(m =>
      m.split(",").filterNot(_.startsWith("s=")).mkString(","))
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some("pw"))(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("missing s="), e.getMessage)
    } finally srv.stop()
    val srv2 = scramServer("pw")
    srv2.scramServerFirstRewrite = Some(_.replace("i=4096", "i=many"))
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv2.port, "testdb",
          password = Some("pw"))(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("non-numeric i="), e.getMessage)
    } finally srv2.stop()
  }

  test("loopback: a cleartext password demand is refused by challenge code") {
    // sending a password in the clear is never a fallback (r14: md5 IS
    // now a supported challenge, cleartext stays a refusal)
    val srv = new MiniPgServer
    srv.demandCleartext = true
    try {
      val e = intercept[java.io.IOException] {
        PgWire.withSession("127.0.0.1", srv.port, "testdb",
          password = Some("x"))(_.query("SELECT 1"))
      }
      assert(e.getMessage.contains("only trust auth, md5, and SCRAM-SHA-256"),
        e.getMessage)
    } finally srv.stop()
  }
}
