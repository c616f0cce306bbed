package graft

import graft.ops.Unigram
import org.scalacheck.{Gen, Properties}
import org.scalacheck.Prop.forAll

/** Property pin: the Viterbi DP (with its (sum, length) tie-break) equals
  * brute-force enumeration of ALL segmentations on random words and
  * random piece vocabularies — the decode half of the unigram contract,
  * extensionally. */
object UnigramProps extends Properties("Unigram") {

  private def score(scores: Map[String, Long])(p: String): Long =
    scores.getOrElse(p, Unigram.UnkScore)

  /** Every segmentation of `w` into vocab pieces (single chars always
    * admissible via the UNK arm), ranked by (total score, then piece
    * lengths RIGHT-to-left lexicographically) — the DP's tie-break. */
  private def bruteBest(w: String, scores: Map[String, Long]): List[String] = {
    def segs(s: List[Char]): List[List[String]] =
      if (s.isEmpty) List(Nil)
      else (1 to math.min(Unigram.MaxPieceLen, s.length)).toList.flatMap { l =>
        val (h, t) = s.splitAt(l)
        val p = h.mkString
        if (scores.contains(p) || l == 1) segs(t).map(p :: _) else Nil
      }
    segs(w.toList).maxBy(seg =>
      (seg.map(score(scores)).sum, seg.reverse.map(_.length).mkString))
  }

  private val genWord = Gen.chooseNum(1, 7)
    .flatMap(n => Gen.stringOfN(n, Gen.oneOf('a', 'b', 'c')))
  private val genVocab: Gen[Map[String, Long]] = for {
    multis <- Gen.listOfN(8, Gen.chooseNum(2, 4)
      .flatMap(l => Gen.stringOfN(l, Gen.oneOf('a', 'b', 'c'))))
    // 'c' deliberately absent from singles half the time: exercises UNK
    singles <- Gen.someOf("a", "b", "c")
    ss <- Gen.listOfN(16, Gen.chooseNum(-300000L, -1L))
  } yield (singles ++ multis).distinct.zip(ss).toMap

  property("viterbi == brute-force over all segmentations") =
    forAll(genWord, genVocab) { (w, scores) =>
      val get: String => java.lang.Long =
        p => scores.get(p).map(java.lang.Long.valueOf).orNull
      val got = Unigram.viterbiPieces(w, get).toList
      got.mkString == w && got == bruteBest(w, scores)
    }
}
