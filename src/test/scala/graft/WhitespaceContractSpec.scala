package graft

import graft.ops.Tokens
import graft.functions.GraftFunctions
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The suite-wide whitespace contract (r16): every engine-side
  * split/collapse uses the explicit class `[\t\n\f\r ]` — RE2's `\s`,
  * which every DuckDB oracle mirror splits on. The three ambient
  * classes disagree OUTSIDE it (Java `\s` adds U+000B;
  * `Character.isWhitespace` adds the U+2000 range and U+3000), so this
  * spec feeds exactly those characters through each consumer and pins
  * that they are treated as TOKEN TEXT, not separators — the behavior
  * the oracles would compute. The corpus carries none of them (checked
  * at r16), so this is the only guard that keeps the class pinned. */
class WhitespaceContractSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // U+000B (VT): Java \s yes, RE2 no. U+2028/U+3000: isWhitespace yes,
  // RE2 no. U+00A0: neither, included as a control.
  private val Exotic = Seq('\u000b', ' ', '　', ' ')

  private def df(text: String) = {
    import spark.implicits._
    Seq((1L, text)).toDF("doc_id", "text")
  }

  test("Tokens.seg treats exotic whitespace as token text") {
    Exotic.foreach { c =>
      val toks = df(s"a${c}b c").select(Tokens.seg(col("text")))
        .collect()(0).getSeq[String](0)
      assert(toks == Seq(s"a${c}b", "c"),
        f"seg split on U+${c.toInt}%04X: $toks")
    }
  }

  test("segString matches seg on exotic whitespace") {
    Exotic.foreach { c =>
      val s = s"a${c}b c"
      val fromCol = df(s).select(Tokens.seg(col("text")))
        .collect()(0).getSeq[String](0)
      assert(Tokens.segString(s).toSeq == fromCol)
    }
  }

  test("WordShingleHashes segments identically to Tokens.seg on exotic whitespace") {
    // unigram hash count == seg token count: if the expression's scanner
    // used a different whitespace class, a U+000B doc would shingle a
    // different number of tokens than the oracle emulation hashes
    Exotic.foreach { c =>
      val s = s"a${c}b c d"
      val row = df(s).select(
        size(GraftFunctions.word_shingles(col("text"), 1)).as("n_sh"),
        size(Tokens.seg(col("text"))).as("n_seg")).collect()(0)
      assert(row.getInt(0) == row.getInt(1),
        f"shingle/seg token counts diverge on U+${c.toInt}%04X")
    }
  }

  test("gpt2 split classifies exotic whitespace as 'other' characters") {
    Exotic.foreach { c =>
      // exact token sequence: the exotic char is its own 'other'-run
      // token between the two letter runs — a regression to a wider
      // whitespace class would instead donate it or emit a ws token
      assert(Tokens.gpt2SegString(s"a${c}b").toSeq ==
        Seq("a", c.toString, "b"),
        f"U+${c.toInt}%04X not an 'other' token")
      // after a space, it absorbs the donated space like any other-run
      assert(Tokens.gpt2SegString(s"a ${c}b").toSeq ==
        Seq("a", s" $c", "b"),
        f"U+${c.toInt}%04X did not take the donated space")
    }
  }

  test("HtmlToText collapses ONLY the pinned class") {
    val row = df("x  \t y \u000b z").select(
      GraftFunctions.html_to_text(col("text"))).collect()(0)
    // runs of [\t ] collapse; the VT survives as text
    assert(row.getString(0) == "x y \u000b z")
  }
}
