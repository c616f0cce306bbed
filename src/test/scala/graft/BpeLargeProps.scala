package graft

import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

import graft.ops.Bpe

/** Property pins for the PRODUCTION-scale BPE machinery (r15): the
  * incremental trainer and the rank-priority encoder must be EXTENSIONALLY
  * EQUAL to the naive reference implementations the 40-merge DuckDB oracle
  * emulates — these are the pins that extend the oracle's authority to the
  * 32k-rule regime the unrolled SQL chain cannot reach:
  *  - `trainFast` ≡ `train` (identical merge sequence, tie-breaks and
  *    early exhaustion included) on random dicts, both alphabets;
  *  - greedy training is PREFIX-STABLE: a larger merge cap never changes
  *    earlier ranks (what makes `text_bpe_vocab_large`'s 40-rank oracle a
  *    genuine pin on the 32k-capacity trainer);
  *  - `encodeFast` (lowest-rank-first over a rank map) ≡ `encode` (rank-
  *    sequential scan) on random words against randomly TRAINED tables;
  *  - byte-level symbols partition the word's UTF-8 hex exactly, so a
  *    byte-level subword count can never lose or invent octets. */
object BpeLargeProps extends Properties("BpeLarge") {

  private val wordChar: Gen[String] = Gen.frequency(
    8 -> Gen.alphaNumChar.map(_.toString),
    2 -> Gen.oneOf("./:?=&-_#%".toSeq).map(_.toString),
    2 -> Gen.oneOf("机器学习模型训练数据".toSeq).map(_.toString),
    1 -> Gen.const(new String(Character.toChars(0x20000))))
  private val word: Gen[String] =
    Gen.nonEmptyListOf(wordChar).map(_.mkString)

  private val dict: Gen[Seq[(String, Long)]] =
    Gen.listOf(Gen.zip(word, Gen.chooseNum(1L, 50L)))
      .map(_.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq
        .sortBy(_._1))

  private val nMergesGen: Gen[Int] = Gen.chooseNum(0, 64)

  property("trainFast produces the identical merge sequence (codepoints)") =
    forAll(dict, nMergesGen) { (d, n) =>
      Bpe.trainFast(d, n) == Bpe.train(d, n)
    }

  property("trainFast produces the identical merge sequence (byte-level)") =
    forAll(dict, nMergesGen) { (d, n) =>
      Bpe.trainFast(d, n, Bpe.symsOfBytes) == Bpe.train(d, n, Bpe.symsOfBytes)
    }

  property("trainFast is insensitive to dict order (byte-level)") =
    forAll(dict, nMergesGen) { (d, n) =>
      Bpe.trainFast(d, n, Bpe.symsOfBytes) ==
        Bpe.trainFast(d.reverse, n, Bpe.symsOfBytes)
    }

  property("greedy training is prefix-stable under the merge cap") =
    forAll(dict, nMergesGen, nMergesGen) { (d, a, b) =>
      val (lo, hi) = (math.min(a, b), math.max(a, b))
      Bpe.trainFast(d, hi).take(lo) == Bpe.trainFast(d, lo)
    }

  property("encodeFast ≡ encode against randomly trained tables") =
    forAll(word, dict, nMergesGen) { (w, d, n) =>
      val merges = Bpe.train(d, n)
      val ranks = Bpe.rankMap(merges)
      val syms = w.codePoints().toArray
        .map(cp => new String(Character.toChars(cp)))
      Bpe.encodeFast(syms, ranks).toSeq == Bpe.encode(w, merges)
    }

  property("encodeFast ≡ sequential merging on byte-level tables") =
    forAll(word, dict, nMergesGen) { (w, d, n) =>
      val merges = Bpe.trainFast(d, n, Bpe.symsOfBytes)
      val ranks = Bpe.rankMap(merges)
      var seq = Bpe.symsOfBytes(w)
      merges.foreach(m => seq = Bpe.mergeOnce(seq, m))
      Bpe.encodeFast(Bpe.symsOfBytes(w), ranks).toSeq == seq.toSeq
    }

  property("byte-level subwords partition the word's UTF-8 hex exactly") =
    forAll(word, dict, nMergesGen) { (w, d, n) =>
      val merges = Bpe.trainFast(d, n, Bpe.symsOfBytes)
      val out = Bpe.encodeFast(Bpe.symsOfBytes(w), Bpe.rankMap(merges))
      val hex = w.getBytes("UTF-8").map("%02X".format(_)).mkString
      // each subword spans ≥ 1 byte = 2 hex chars, so the subword count
      // is bounded by the byte count (r15 review: the old bound's * 2 on
      // BOTH sides restated the partition equality and pinned nothing)
      out.mkString == hex && out.length >= 1 && out.length * 2 <= hex.length
    }
}
