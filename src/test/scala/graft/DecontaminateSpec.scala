package graft

import graft.ops.Bpe
import org.scalatest.funsuite.AnyFunSuite

/** The packed-ids decontamination guard: window coverage under the 32/24
  * chunk overlap, EOS isolation, and fixture non-vacuousness. */
class DecontaminateSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val d = TestSpark.Sf0001

  test("every 8-token text window lies wholly inside some 32/24 chunk") {
    // the coverage argument the entry relies on, checked exhaustively:
    // chunk starts are multiples of 24; an 8-token window starting at w
    // needs a start s with s <= w and w + 8 <= s + 32
    for (t <- 8 to 400; w <- 0 to (t - 8)) {
      val covered = (0 until t by 24).exists(s => s <= w && w + 8 <= s + 32)
      assert(covered, s"window at $w of $t uncovered")
    }
  }

  test("the guard is non-vacuous and EOS-isolated on the fixture") {
    val rows = SparkEntry.queries("chunk_decontaminate")(spark, d).collect()
    assert(rows.nonEmpty)
    val contaminated = rows.map(_.getAs[Long]("n_contaminated")).sum
    assert(contaminated > 0,
      "benchmark prefixes must reappear in the packed stream — a zero " +
        "count means the id spaces diverged and the guard is vacuous")
    // n_contaminated <= n_windows row by row; zero-window chunks present
    rows.foreach { r =>
      assert(r.getAs[Long]("n_contaminated") <= r.getAs[Long]("n_windows"))
    }
    // EOS isolation: the benchmark stream carries no EosId, so a window
    // containing the separator can never match — chunk 0 of any doc has
    // its first DecontamWindow windows covering the -1; spot-check that
    // fully-contaminated chunk-0 rows don't exist (the leading windows
    // are unmatchable)
    val chunk0 = rows.filter(r => r.getAs[Long]("chunk_id") == 0L &&
      r.getAs[Long]("n_windows") >= Bpe.DecontamWindow.toLong)
    assert(chunk0.forall(r =>
      r.getAs[Long]("n_contaminated") < r.getAs[Long]("n_windows")))
    spark.sharedState.cacheManager.clearCache()
  }
}
