package graft.pgwire

/** Self-signed loopback server credentials, generated ONCE per test run
  * with the JDK's keytool (no bundled key material).
  *
  * [[context]]/[[certificate]] is the primary server credential
  * (CN=localhost with dns:localhost + ip:127.0.0.1 SANs, so
  * sslmode=verify-full identifies it when connecting to either name);
  * [[certPemPath]] is its exported PEM — the client's `sslrootcert`.
  * [[altContext]]/[[altCertPemPath]] is an UNRELATED credential whose
  * SAN names a different host: serving it exercises both verify-mode
  * failure arms (untrusted chain under the primary root; hostname
  * mismatch even under its own root).
  *
  * The SCRAM-SHA-256-PLUS specs hash [[certificate]] INDEPENDENTLY of
  * the production [[graft.sources.PgWire.tlsServerEndPoint]] path, so a
  * client that hashes the wrong bytes cannot cancel out against a
  * fixture sharing its bug. */
object TlsFixture {

  private def makeCredential(alias: String, dname: String, san: String)
      : (javax.net.ssl.SSLContext, java.security.cert.X509Certificate, String) = {
    val dir = java.nio.file.Files.createTempDirectory("graft_tls")
    val ks = dir.resolve(s"$alias.p12").toString
    val pem = dir.resolve(s"$alias.pem").toString
    val keytool = new java.io.File(
      new java.io.File(System.getProperty("java.home"), "bin"), "keytool").getPath
    def run(cmd: String*): Unit = {
      val p = new ProcessBuilder(cmd: _*).redirectErrorStream(true).start()
      val log = new String(p.getInputStream.readAllBytes(), "UTF-8")
      require(p.waitFor() == 0, s"keytool failed: $log")
    }
    run(keytool, "-genkeypair", "-alias", alias,
      "-keyalg", "RSA", "-keysize", "2048", "-dname", dname,
      "-ext", s"san=$san",
      "-validity", "30", "-keystore", ks, "-storetype", "PKCS12",
      "-storepass", "graftpass", "-keypass", "graftpass")
    run(keytool, "-exportcert", "-alias", alias, "-rfc", "-file", pem,
      "-keystore", ks, "-storepass", "graftpass")
    val store = java.security.KeyStore.getInstance("PKCS12")
    val fis = new java.io.FileInputStream(ks)
    try store.load(fis, "graftpass".toCharArray) finally fis.close()
    val kmf = javax.net.ssl.KeyManagerFactory.getInstance(
      javax.net.ssl.KeyManagerFactory.getDefaultAlgorithm)
    kmf.init(store, "graftpass".toCharArray)
    val ctx = javax.net.ssl.SSLContext.getInstance("TLS")
    ctx.init(kmf.getKeyManagers, null, null)
    val cert = store.getCertificate(alias)
      .asInstanceOf[java.security.cert.X509Certificate]
    (ctx, cert, pem)
  }

  lazy val (context: javax.net.ssl.SSLContext,
      certificate: java.security.cert.X509Certificate,
      certPemPath: String) =
    makeCredential("minipg", "CN=localhost", "dns:localhost,ip:127.0.0.1")

  /** A different self-signed identity naming a different host — the
    * wrong-chain and wrong-name negative for the verify modes. */
  lazy val (altContext: javax.net.ssl.SSLContext,
      altCertificate: java.security.cert.X509Certificate,
      altCertPemPath: String) =
    makeCredential("otherpg", "CN=otherhost.example", "dns:otherhost.example")

  /** RFC 5929 tls-server-end-point of [[certificate]], computed HERE
    * from first principles (keytool emits SHA256withRSA, so the binding
    * hash is SHA-256 of the DER bytes) — deliberately NOT via the
    * production helper under test. */
  lazy val serverEndPoint: Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(certificate.getEncoded)
}
