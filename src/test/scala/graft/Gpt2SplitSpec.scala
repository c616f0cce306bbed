package graft

import graft.Tables
import graft.ops.{Bpe, Tokens}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The GPT-2 pre-tokenizer (Radford et al. 2019's public split pattern)
  * pinned three ways against an imperative reference scanner on random
  * strings: the engine's lookahead regex, the oracle's RE2-safe sentinel
  * emulation (re-run here under Java regex semantics — its DuckDB/RE2
  * twin is pinned per-corpus by the text_tokens_bpe_gpt2 gate entry),
  * and the Column form the sampling path uses. */
class Gpt2SplitSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // ---- imperative reference: the pattern's contract, no regex at all ----

  private val Contractions = Seq("'s", "'t", "'re", "'ve", "'m", "'ll", "'d")

  private def isWs(cp: Int): Boolean = // the pinned class [\t\n\f\r ]:
    // RE2's \s — NOT Java's, which also matches U+000B (r16 review)
    cp == ' ' || cp == '\t' || cp == '\n' || cp == '\f' || cp == '\r'
  private def isL(cp: Int): Boolean = Character.isLetter(cp) // \p{L}
  private def isN(cp: Int): Boolean = Character.getType(cp) match { // \p{N}
    case Character.DECIMAL_DIGIT_NUMBER | Character.LETTER_NUMBER |
        Character.OTHER_NUMBER => true
    case _ => false
  }
  private def isOther(cp: Int): Boolean = !isWs(cp) && !isL(cp) && !isN(cp)

  private def refSplit(s: String): Seq[String] = {
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    def runOf(from: Int, p: Int => Boolean): Int = {
      var j = from
      while (j < s.length && p(s.codePointAt(j))) j += Character.charCount(s.codePointAt(j))
      j
    }
    while (i < s.length) {
      val contr = Contractions.find(c => s.startsWith(c, i))
      val cp = s.codePointAt(i)
      val spaceThen: (Int => Boolean) => Boolean = p =>
        cp == ' ' && i + 1 < s.length && p(s.codePointAt(i + 1))
      if (contr.isDefined) { out += contr.get; i += contr.get.length }
      else if (isL(cp) || spaceThen(isL)) {
        val start = i; i = runOf(if (isL(cp)) i else i + 1, isL)
        out += s.substring(start, i)
      } else if (isN(cp) || spaceThen(isN)) {
        val start = i; i = runOf(if (isN(cp)) i else i + 1, isN)
        out += s.substring(start, i)
      } else if (isOther(cp) || spaceThen(isOther)) {
        val start = i; i = runOf(if (isOther(cp)) i else i + 1, isOther)
        out += s.substring(start, i)
      } else { // whitespace run: donate the final char iff followed by \S
        val start = i
        val end = runOf(i, isWs)
        val stop = if (end == s.length || end - start == 1) end else end - 1
        out += s.substring(start, stop); i = stop
      }
    }
    out.toSeq
  }

  // ---- the oracle's sentinel construction, Java-regex re-run ----

  private val CorePattern = java.util.regex.Pattern.compile(Tokens.Gpt2Core)

  private val Sentinel = Tokens.SentinelCp.toChar // U+E000 (r17)

  private def sentinelSplit(s: String): Seq[String] = {
    // mirror of the oracle's loud guard (r17): a literal sentinel
    // codepoint must REFUSE (DuckDB error()), never silently add a
    // spurious boundary
    require(!s.contains(Sentinel),
      "input carries the U+E000 sentinel - emulation refuses")
    // the ORACLE's explicit whitespace classes, not Java's \s (which
    // would smuggle U+000B back in and mask the very divergence the
    // pinned class exists to prevent)
    s.replaceAll("([\\t\\n\\f\\r ])([^\\t\\n\\f\\r ])", Sentinel.toString + "$1$2")
      .split(Sentinel.toString, -1).toSeq.flatMap { seg =>
      val m = CorePattern.matcher(seg)
      val toks = scala.collection.mutable.ArrayBuffer.empty[String]
      while (m.find()) toks += m.group()
      toks
    }
  }

  private val Fixtures = Seq(
    "", " ", "   ", "a  b", "a b", "  a", "a  ", "don't we're I'll",
    "'stop", "x   'd", "a\n\nb", "tab\there", "price: $3.50!",
    "hello world123  foo!!  学习 こん", "CamelCase under_score",
    "élève €99 한국어", "a b", // U+00A0 is NOT Java \s
    "trailing space ", " lead", "\t\t", "1 2  3   4",
    // U+000B is NOT in the pinned whitespace class (Java \s would take
    // it; RE2's would not) — it must tokenize as an "other" char
    "a\u000bb", "a \u000b b", "\u000b",
    // U+0001 was the pre-r17 sentinel's documented caveat: a literal
    // occurrence silently diverged the oracle emulation. Under the
    // U+E000 sentinel it is an ordinary "other" char on all three
    // splitters (and a literal U+E000 now REFUSES, tested below)
    "a\u0001b", "x \u0001  y", "\u0001")

  test("engine regex == imperative reference == sentinel emulation (fixtures)") {
    Fixtures.foreach { s =>
      val eng = Tokens.gpt2SegString(s).toSeq
      assert(eng == refSplit(s), s"engine vs reference on ${s.inspect}")
      assert(eng == sentinelSplit(s), s"engine vs sentinel on ${s.inspect}")
      assert(eng.mkString == s, s"tokens must partition the input: ${s.inspect}")
    }
  }

  test("property: the three splitters agree and partition on random strings") {
    // seeded — reproducible; alphabet mixes contractions, whitespace runs,
    // CJK, digits, punctuation, supplementary-plane (surrogate-pair) chars
    val rnd = new scala.util.Random(20260816L)
    val atoms = Array("a", "b", "Z", "0", "9", "'", "!", ".", ",", "-", "_",
      " ", "  ", "   ", "\t", "\n", "\r\n", "'s", "'ll", "'d", "n't",
      "\u000b", " ", // outside the pinned ws class on BOTH engines
      "\u0001", // the retired pre-r17 sentinel: now just an "other" char
      "学", "あ", "カ", "한", "é", "€",
      new String(Character.toChars(0x1F600)), // emoji: surrogate pair, \p{So}
      new String(Character.toChars(0x10400))) // Deseret: surrogate pair, \p{L}
    (1 to 2000).foreach { _ =>
      val s = Seq.fill(rnd.nextInt(24))(atoms(rnd.nextInt(atoms.length))).mkString
      val eng = Tokens.gpt2SegString(s).toSeq
      assert(eng == refSplit(s), s"engine vs reference on ${s.inspect}")
      assert(eng == sentinelSplit(s), s"engine vs sentinel on ${s.inspect}")
      assert(eng.mkString == s, s"partition on ${s.inspect}")
      assert(eng.forall(_.nonEmpty))
    }
  }

  test("the sentinel-emulation guard refuses a literal U+E000 loudly") {
    // the engine side treats U+E000 as an ordinary "other" char...
    val eng = Tokens.gpt2SegString("a" + Sentinel.toString + "b").toSeq
    assert(eng.mkString == "a" + Sentinel.toString + "b")
    // ...but the oracle emulation must REFUSE instead of silently
    // adding a boundary (mirrored here; the SQL form raises error())
    intercept[IllegalArgumentException] {
      sentinelSplit("a" + Sentinel.toString + "b")
    }
    assert(Tokens.duckGpt2Toks("text").contains("error("),
      "the generated SQL must carry the loud error() guard")
  }

  test("Column form gpt2Seg matches gpt2SegString row by row") {
    import spark.implicits._
    val rows = Fixtures.toDF("text")
      .select(col("text"), Tokens.gpt2Seg(col("text")).as("toks"))
      .collect()
    rows.foreach { r =>
      assert(r.getSeq[String](1) == Tokens.gpt2SegString(r.getString(0)).toSeq,
        s"column vs scala on ${r.getString(0).inspect}")
    }
  }

  test("gpt2 model: counts cover every pre-token and merges fire on the corpus") {
    val merges = Bpe.loadMerges(spark, Bpe.ensureModelGpt2(spark, TestSpark.Sf0001))
    assert(merges.nonEmpty, "gpt2-spec training must learn merges")
    // leading-space subwords are the WHOLE POINT of the GPT-2 split: the
    // dict must contain space-prefixed pre-tokens, so some learned merge
    // must involve the 0x20 byte
    // pair-ALIGNED check: contains("20") could match a "20" straddling
    // two hex pairs (e.g. "D2"+"0A") without any real space byte
    assert(merges.exists { case (a, b) =>
      (a + b).grouped(2).contains("20") },
      "no space byte in any merge — the split never reached training")
    val rows = Bpe.plantMultiscript(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
      .select(col("doc_id"),
        Bpe.bpe_tokens(col("text"), merges, byteLevel = true, gpt2 = true).as("n_bpe"),
        size(Tokens.gpt2Seg(col("text"))).cast("long").as("n_pre"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1))
        // every pre-token encodes to >= 1 id; merges only shrink within one
        assert(r.getLong(1) >= r.getLong(2),
          s"doc ${r.getLong(0)}: n_bpe < n_pre")
      else assert(r.isNullAt(2))
    }
  }

  test("gpt2 encode -> decode rebuilds the ORIGINAL text byte for byte") {
    // the splitter partitions the input (asserted above), bytes cover
    // every string, so the decode target is the text itself — nothing
    // weaker than identity is acceptable on this path
    val merges = Bpe.loadMerges(spark, Bpe.ensureModelGpt2(spark, TestSpark.Sf0001))
    val rows = Bpe.plantMultiscript(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
      .select(col("doc_id"), col("text"),
        Bpe.bpe_decode_ids(
          Bpe.bpe_token_ids(col("text"), merges, byteLevel = true, gpt2 = true),
          merges, byteLevel = true).as("decoded"),
        Bpe.bpe_token_ids(col("text"), merges, byteLevel = true, gpt2 = true)
          .as("ids"),
        Bpe.bpe_tokens(col("text"), merges, byteLevel = true, gpt2 = true)
          .as("n_bpe"))
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      if (!r.isNullAt(1)) {
        assert(r.getString(2) == r.getString(1),
          s"doc ${r.getLong(0)}: gpt2 decode != original text")
        assert(r.getSeq[Int](3).length.toLong == r.getLong(4),
          s"doc ${r.getLong(0)}: ids.length != n_bpe")
      } else assert(r.isNullAt(2) && r.isNullAt(3) && r.isNullAt(4))
    }
  }

  private implicit class Inspect(private val s: String) {
    def inspect: String = s.map {
      case c if c >= ' ' && c < 127 => c.toString
      case c => f"\\u${c.toInt}%04x"
    }.mkString("\"", "", "\"")
  }
}
