package graft

import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

class HtmlToTextSpec extends AnyFunSuite {
  private def x(s: String): String =
    graft.functions.HtmlToText.extract(UTF8String.fromString(s)).toString

  test("blocks, comments, tags, entities, whitespace — each rule") {
    assert(x("<p>a</p><script>var x = 1 < 2;</script><p>b</p>") == "a b")
    assert(x("<style type='text/css'>p { color: red }</style>hi") == "hi")
    assert(x("a<!-- hidden <b>bold</b> -->z") == "a z")
    assert(x("<h1 class=\"t\">Title</h1><p>body</p>") == "Title body")
    assert(x("fish &amp; chips &lt;tag&gt; &quot;q&quot; &apos;a&apos; &#39;d&#39; x&nbsp;y")
      == "fish & chips <tag> \"q\" 'a' 'd' x y")
    assert(x("a\t\t b\n\nc  d") == "a b c d")
    assert(x("&#72;&#105;&#33;") == "Hi!")
  }

  test("adjacent text nodes never fuse; decoded entities never resurrect markup") {
    assert(x("<td>one</td><td>two</td>") == "one two")
    // "&lt;script&gt;evil()&lt;/script&gt;" is TEXT about a script tag —
    // decoding after stripping must keep it as prose
    assert(x("<p>&lt;script&gt;evil()&lt;/script&gt;</p>") == "<script>evil()</script>")
    // double-encoded: &amp;lt; is the TEXT "&lt;" (amp decoded last)
    assert(x("<p>&amp;lt;b&amp;gt;</p>") == "&lt;b&gt;")
  }

  test("damage tolerance: unclosed trailing fragment passes through as text") {
    assert(x("ok <p>text</p> tail<unclosed attr") == "ok text tail<unclosed attr")
    assert(x("") == "")
    assert(x("plain prose, no markup") == "plain prose, no markup")
  }

  test("bare < in prose is text, not a tag (r12 advice)") {
    // unescaped comparison prose must survive: only tag-shaped runs strip
    assert(x("a < b and c > d") == "a < b and c > d")
    assert(x("<p>i <3 you</p>") == "i <3 you")
    assert(x("if x < 10 then <b>stop</b>") == "if x < 10 then stop")
    // tag-shaped still strips: names, closers, doctype, PI
    assert(x("<!DOCTYPE html><?xml version='1.0'?><p>y</p>") == "y")
  }

  test("entity decode is one left-to-right scan (r12 advice)") {
    // &#38;amp; = the TEXT "&amp;" — the produced '&' is never re-read
    assert(x("&#38;amp;") == "&amp;")
    // 4+ digit entities hit the documented non-ASCII -> space fallback
    assert(x("it&#8217;s fine") == "it s fine")
    assert(x("&#0000039;quoted&#39;") == "'quoted'")
  }

  test("hex character entities decode (the crawl-HTML &#x27; class)") {
    assert(x("it&#x27;s &#x41;&#X42;") == "it's AB")
    // non-ASCII hex hits the same space fallback as decimal
    assert(x("dash&#x2014;here") == "dash here")
    // malformed hex (no digits / too many) passes through as text
    assert(x("&#x;, &#x1234567;") == "&#x;, &#x1234567;")
  }
}
