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
}
