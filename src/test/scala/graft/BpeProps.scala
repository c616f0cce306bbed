package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.{Bpe, Tokens}

/** Property pins for the BPE tier. The fixtures in `BpeSpec` pin exact
  * merges and counts; these pin the INVARIANTS no input shape may break:
  * subwords partition their word exactly, counts stay within
  * [1, codepoints], training is insensitive to dict order, and the
  * shared tokenizer's tokens reassemble to the input's non-whitespace
  * content (so no codepoint is ever dropped or duplicated by
  * segmentation — the property that keeps every token-granular op's
  * accounting conservative). */
object BpeProps extends Properties("Bpe") {

  // words over a mixed alphabet: ASCII letters/digits/punct, BMP CJK,
  // and a supplementary-plane ideograph — no whitespace, no chr(31)
  private val wordChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("./:?=&-_#%".toSeq).map(_.toString),
    2 -> Gen.oneOf("机器学习模型训练数据".toSeq).map(_.toString),
    1 -> Gen.const(new String(Character.toChars(0x20000))))
  private val word: Gen[String] =
    Gen.nonEmptyListOf(wordChar).map(_.mkString)

  private val dict: Gen[Seq[(String, Long)]] =
    Gen.listOf(Gen.zip(word, Gen.chooseNum(1L, 50L)))
      .map(_.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq)

  property("subwords partition the word exactly") =
    forAll(word, dict) { (w, d) =>
      val merges = Bpe.train(d.sortBy(_._1), nMerges = 12)
      Bpe.encode(w, merges).mkString == w
    }

  property("subword count stays in [1, codepoints]") =
    forAll(word, dict) { (w, d) =>
      val merges = Bpe.train(d.sortBy(_._1), nMerges = 12)
      val n = Bpe.encode(w, merges).length
      n >= 1 && n <= w.codePointCount(0, w.length)
    }

  property("training is insensitive to dict order") =
    forAll(dict, Gen.long) { (d, seed) =>
      val shuffled = new scala.util.Random(seed).shuffle(d)
      Bpe.train(d.sortBy(_._1), nMerges = 12) ==
        Bpe.train(shuffled, nMerges = 12)
    }

  property("merging a learned rule never changes the reassembled word") =
    forAll(word) { w =>
      // any 2-symbol rule applied to the word's own codepoints
      val syms = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      syms.length < 2 || {
        val rule = (syms(0), syms(1))
        Bpe.mergeOnce(syms, rule).mkString == w
      }
    }

  // segmentation conservation: tokens reassemble to the input minus the
  // whitespace the rule splits on (alphabet avoids the \s-vs-isWhitespace
  // divergence chars by construction)
  private val text: Gen[String] =
    Gen.listOf(Gen.frequency(6 -> wordChar, 2 -> Gen.const(" "),
      1 -> Gen.const("\t"), 1 -> Gen.const("\n"))).map(_.mkString)

  property("segString conserves non-whitespace content in order") =
    forAll(text) { s =>
      Tokens.segString(s).mkString == s.filterNot(c =>
        c == ' ' || c == '\t' || c == '\n')
    }
}
