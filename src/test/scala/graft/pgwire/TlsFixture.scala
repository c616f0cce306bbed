package graft.pgwire

/** Self-signed loopback server credential, generated ONCE per test run
  * with the JDK's keytool (no bundled key material): a server-mode
  * SSLContext for MiniPgServer's TLS arm plus the certificate itself —
  * the SCRAM-SHA-256-PLUS specs hash it INDEPENDENTLY of the production
  * [[graft.sources.PgWire.tlsServerEndPoint]] path, so a client that
  * hashes the wrong bytes cannot cancel out against a fixture sharing
  * its bug. */
object TlsFixture {

  lazy val (context: javax.net.ssl.SSLContext,
      certificate: java.security.cert.X509Certificate) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = dir.resolve("server.p12").toString
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getPath
    val cmd = Array(keytool, "-genkeypair", "-alias", "minipg",
      "-keyalg", "RSA", "-keysize", "2048", "-dname", "CN=localhost",
      "-validity", "30", "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", "graftpass", "-keypass", "graftpass")
    val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
    val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
    require(p.waitFor() == 0, s"keytool failed: $log")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ks)
    try store.load(fis, "graftpass".toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "graftpass".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val cert = store.getCertificate("minipg")
      .asInstanceOf[java.security.cert.X509Certificate]
    (ctx, cert)
  }

  /** RFC 5929 tls-server-end-point of [[certificate]], computed HERE
    * from first principles (keytool emits SHA256withRSA, so the binding
    * hash is SHA-256 of the DER bytes) — deliberately NOT via the
    * production helper under test. */
  lazy val serverEndPoint: Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(certificate.getEncoded)
}
