package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class UrlSpec extends AnyFunSuite {
  private def n(s: String): String =
    graft.functions.NormalizeUrl.norm(UTF8String.fromString(s)).toString

  test("each canonicalization rule, individually") {
    // 1. scheme + host case
    assert(n("HTTP://EXAMPLE.com/A/b") == "http://example.com/A/b") // path case KEPT
    // 2. default port stripped, non-default kept, scheme-matched
    assert(n("http://example.com:80/x") == "http://example.com/x")
    assert(n("https://example.com:443/x") == "https://example.com/x")
    assert(n("http://example.com:8080/x") == "http://example.com:8080/x")
    assert(n("http://example.com:443/x") == "http://example.com:443/x") // 443 is not http's default
    // 3. fragment dropped
    assert(n("http://e.com/p#sec") == "http://e.com/p")
    // 4. tracking params dropped, by prefix and by name, case-insensitive keys
    assert(n("http://e.com/p?utm_source=a&UTM_campaign=b&fbclid=1&gclid=2&msclkid=3&keep=1")
      == "http://e.com/p?keep=1")
    // 4b. `ref` is FUNCTIONAL (e.g. ?ref=branch on a code host), not a
    // click-id — it must survive normalization (r12 advice)
    assert(n("http://e.com/repo/blob?ref=main&fbclid=1") == "http://e.com/repo/blob?ref=main")
    // 5. raw-token sort; emptied query drops its '?'
    assert(n("http://e.com/p?b=2&a=10&a=1") == "http://e.com/p?a=1&a=10&b=2")
    assert(n("http://e.com/p?utm_source=x") == "http://e.com/p")
    // 6. empty path becomes /
    assert(n("http://e.com") == "http://e.com/")
    assert(n("http://e.com?a=1#f") == "http://e.com/?a=1")
  }

  test("non-URL keys pass through unchanged; value case is preserved") {
    assert(n("not a url") == "not a url")
    assert(n("http://e.com/p?k=MixedCase") == "http://e.com/p?k=MixedCase")
  }

  test("idempotent: normalizing a normalized URL is the identity") {
    val urls = Seq("HTTP://EXAMPLE.com:80/Doc/7?b=2&a=1&utm_source=s#f",
      "https://E.com:443", "http://e.com/p?gclid=9")
    urls.foreach { u => assert(n(n(u)) == n(u), u) }
  }
}
