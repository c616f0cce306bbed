package graft

import graft.ops.Unigram
import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop

/** Unigram-LM tokenizer: the exact-integer log, the Viterbi decode with
  * its (sum, length) tie-break — property-pinned against brute-force
  * enumeration of ALL segmentations — EM pruning invariants, and the
  * expression's end-to-end behavior. */
class UnigramSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("ilog2q is exact on powers of two and monotone, within 2^-14 of log2") {
    for (e <- 0 to 62)
      assert(Unigram.ilog2q(1L << e) == e.toLong << 16, s"2^$e")
    var prev = Long.MinValue
    for (c <- Seq(1L, 2L, 3L, 5L, 7L, 100L, 12345L, 999999937L, Long.MaxValue)) {
      val r = Unigram.ilog2q(c)
      assert(r >= prev)
      prev = r
      assert(math.abs(r.toDouble / 65536.0 - math.log(c.toDouble) / math.log(2.0)) < 6.2e-5,
        s"c=$c r=$r")
    }
  }

  private def bruteBest(w: String, scores: Map[String, Long]): (Long, List[String]) = {
    // enumerate every segmentation; rank by (sum, then last-piece length
    // recursively) — the DP's tie-break, applied right-to-left
    def segs(s: List[Char]): List[List[String]] =
      if (s.isEmpty) List(Nil)
      else (1 to math.min(Unigram.MaxPieceLen, s.length)).toList.flatMap { l =>
        val (h, t) = s.splitAt(l)
        val p = h.mkString
        val ok = scores.contains(p) || l == 1
        if (ok) segs(t).map(p :: _) else Nil
      }
    def score(p: String): Long = scores.getOrElse(p, Unigram.UnkScore)
    val all = segs(w.toList)
    // key: (total, reversed length sequence lexicographically) — larger
    // lengths preferred from the RIGHT end first
    val best = all.maxBy(seg =>
      (seg.map(score).sum, seg.reverse.map(_.length).mkString))
    (best.map(score).sum, best)
  }

  test("unknown single characters segment per-char at UnkScore; known pieces win") {
    val scores = Map("ab" -> -100L, "a" -> -300L, "b" -> -300L)
    val get: String => java.lang.Long =
      p => scores.get(p).map(java.lang.Long.valueOf).orNull
    assert(Unigram.viterbiPieces("ab", get).toList == List("ab"))
    // CJK char outside the vocab: its own piece (codepoint-based)
    assert(Unigram.viterbiPieces("a朻b", get).toList == List("a", "朻", "b"))
    // astral char: ONE piece despite two UTF-16 units
    assert(Unigram.viterbiPieces(new String(Character.toChars(0x1F600)), get).length == 1)
  }

  test("training keeps every single char and prunes unused multis") {
    val dict = Seq("abab" -> 10L, "abc" -> 5L, "xy" -> 1L)
    val model = Unigram.train(dict)
    val pieces = model.pieces.toSet
    for (c <- "abcxy") assert(pieces.contains(c.toString), s"single $c")
    // model is sorted, ids dense
    assert(model.pieces.toSeq == model.pieces.toSeq.sorted)
    assert(model.pieces.length == model.scores.length)
    // every multi-char survivor was used by the final dict segmentation
    val sc = model.pieces.zip(model.scores).toMap
    val get: String => java.lang.Long = p => sc.get(p).map(java.lang.Long.valueOf).orNull
    val used = dict.flatMap { case (w, _) => Unigram.viterbiPieces(w, get) }.toSet
    for (p <- pieces if p.length > 1)
      assert(used.contains(p), s"vocab piece $p unused by the dict it survived on")
  }

  test("expression end-to-end: pieces concatenate to the segmented text, ids invert") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val model = Unigram.trainedModel(spark, "/root/testdata/sf0.001")
    val df = Seq((1L, "the quick brown fox"), (2L, ""), (3L, null: String))
      .toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        Unigram.unigram_pieces(col("text"), model).as("p"),
        Unigram.unigram_ids(col("text"), model).as("i"))
      .collect().sortBy(_.getLong(0))
    val r1 = got(0)
    val pieces = r1.getSeq[String](1)
    val ids = r1.getSeq[Int](2)
    assert(pieces.mkString == "thequickbrownfox")
    assert(pieces.length == ids.length)
    val idOf = model.pieces.zipWithIndex.toMap
    pieces.zip(ids).foreach { case (p, i) =>
      assert(i == idOf.getOrElse(p, Unigram.UnkIdBase + p.codePointAt(0)))
    }
    assert(got(1).getSeq[String](1).isEmpty)
    assert(got(2).isNullAt(1) && got(2).isNullAt(2))
  }
}
