package graft.sources

import java.nio.charset.StandardCharsets.UTF_8
import java.util.Base64
import javax.crypto.{Mac, SecretKeyFactory}
import javax.crypto.spec.{PBEKeySpec, SecretKeySpec}

/** SCRAM-SHA-256 primitives (RFC 5802 mechanics with the SHA-256
  * parameters of RFC 7677) — the authentication Postgres packages as its
  * default since v14, carried on the wire as
  * AuthenticationSASL/SASLContinue/SASLFinal (PG docs, "SASL
  * Authentication"). Pure functions over explicit inputs so the RFC 7677
  * §3 example vector pins every derivation in a unit test; the protocol
  * choreography lives in [[PgWire.Session]].
  *
  * Channel binding: the derivations are binding-agnostic — the gs2
  * header and the `c=` attribute (which carries the RFC 5929
  * tls-server-end-point data under SCRAM-SHA-256-PLUS, r15) are composed
  * by the choreography in [[PgWire.Session.scramAuth]] and flow into
  * AuthMessage here like any other bytes.
  * Password normalization: UTF-8 verbatim. SASLprep (RFC 4013) is the
  * identity on ASCII passwords; a non-ASCII password that a strict server
  * normalizes differently will fail loudly at the proof check rather than
  * silently authenticate wrong. */
object Scram {

  def hmacSha256(key: Array[Byte], data: Array[Byte]): Array[Byte] = {
    val mac = Mac.getInstance("HmacSHA256")
    mac.init(new SecretKeySpec(key, "HmacSHA256"))
    mac.doFinal(data)
  }

  def sha256(data: Array[Byte]): Array[Byte] =
    java.security.MessageDigest.getInstance("SHA-256").digest(data)

  /** Hi(password, salt, i) — PBKDF2-HMAC-SHA256, 256-bit output
    * (RFC 5802 §2.2; the JDK provider encodes the char[] as UTF-8). */
  def saltedPassword(password: String, salt: Array[Byte], iterations: Int): Array[Byte] =
    SecretKeyFactory.getInstance("PBKDF2WithHmacSHA256")
      .generateSecret(new PBEKeySpec(password.toCharArray, salt, iterations, 256))
      .getEncoded

  def clientKey(salted: Array[Byte]): Array[Byte] =
    hmacSha256(salted, "Client Key".getBytes(UTF_8))

  def storedKey(clientKey: Array[Byte]): Array[Byte] = sha256(clientKey)

  /** ClientProof = ClientKey XOR HMAC(StoredKey, AuthMessage). */
  def clientProof(salted: Array[Byte], authMessage: String): Array[Byte] = {
    val ck = clientKey(salted)
    val sig = hmacSha256(storedKey(ck), authMessage.getBytes(UTF_8))
    val out = new Array[Byte](ck.length)
    var i = 0
    while (i < out.length) { out(i) = (ck(i) ^ sig(i)).toByte; i += 1 }
    out
  }

  /** ServerSignature = HMAC(HMAC(salted, "Server Key"), AuthMessage) —
    * what the client MUST verify from SASLFinal's `v=`: it proves the
    * server actually holds the credential, not just the challenge. */
  def serverSignature(salted: Array[Byte], authMessage: String): Array[Byte] =
    hmacSha256(hmacSha256(salted, "Server Key".getBytes(UTF_8)),
      authMessage.getBytes(UTF_8))

  /** Recover ClientKey from a received proof + AuthMessage (server side:
    * ClientKey = proof XOR ClientSignature), for StoredKey comparison. */
  def recoverClientKey(storedKey: Array[Byte], authMessage: String,
      proof: Array[Byte]): Array[Byte] = {
    val sig = hmacSha256(storedKey, authMessage.getBytes(UTF_8))
    val out = new Array[Byte](proof.length)
    var i = 0
    while (i < out.length) { out(i) = (proof(i) ^ sig(i)).toByte; i += 1 }
    out
  }

  def b64(bytes: Array[Byte]): String = Base64.getEncoder.encodeToString(bytes)
  def unb64(s: String): Array[Byte] = Base64.getDecoder.decode(s)

  /** Fresh printable client nonce (18 random bytes, base64 — the size
    * common client implementations use). */
  def freshNonce(): String = {
    val b = new Array[Byte](18)
    new java.security.SecureRandom().nextBytes(b)
    b64(b)
  }

  /** Parse `k1=v1,k2=v2,…` SCRAM attribute lists (values may contain '='
    * — split each pair on the FIRST '=' only, as base64 padding demands).
    * A pair without the '=' separator (malformed framing) is refused
    * loudly rather than mis-parsed as key `pair(0)` with a clipped value. */
  def attrs(message: String): Map[Char, String] =
    message.split(",").iterator.filter(_.nonEmpty).map { kv =>
      if (kv.length < 2 || kv.charAt(1) != '=') throw new java.io.IOException(
        s"SCRAM: malformed attribute pair '$kv' in: $message")
      kv.charAt(0) -> kv.substring(2)
    }.toMap
}
