package graft

import graft.ops.Sampling
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def docs = Tables.load(spark, TestSpark.Sf0001, "documents")

  test("split assignment is a pure function of the id (partitioning-independent)") {
    def assign(df: org.apache.spark.sql.DataFrame): Map[Long, String] =
      Sampling.deterministicSplit(df).select("doc_id", "split")
        .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val base = assign(docs)
    assert(assign(docs.repartition(7)) == base)
    assert(assign(docs.orderBy(org.apache.spark.sql.functions.col("n_chars"))) == base)
  }

  test("split proportions approximate the requested 80/10/10") {
    val counts = Sampling.deterministicSplit(docs)
      .groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val n = counts.values.sum.toDouble
    assert(counts("train") / n > 0.7 && counts("train") / n < 0.9, counts)
    assert(counts("val") / n > 0.04 && counts("val") / n < 0.18, counts)
    assert(counts("test") / n > 0.04 && counts("test") / n < 0.18, counts)
  }

  test("samplePerGroup: exactly k per stratum, partition-order-free, small groups whole") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val df = ((1L to 40L).map(i => (i, "big")) ++ Seq((100L, "tiny"), (101L, "tiny")))
      .toDF("doc_id", "lang")
    val got = graft.ops.Sampling.samplePerGroup(df, "lang", k = 5)
      .as[(String, Int, Long)].collect().toSeq
    assert(got.count(_._1 == "big") == 5)
    // a group smaller than k is returned whole, ranked
    assert(got.filter(_._1 == "tiny").map(r => (r._2, r._3)).toSet.size == 2)
    // per-stratum ranks are 1..n
    got.groupBy(_._1).foreach { case (g, rs) =>
      assert(rs.map(_._2).sorted == (1 to rs.size), s"ranks not dense for $g") }
    // repartitioning the input changes nothing (vs sampleBy's
    // partition-order-dependent draw)
    val re = graft.ops.Sampling.samplePerGroup(df.repartition(7), "lang", k = 5)
      .as[(String, Int, Long)].collect().toSeq
    assert(re == got)
  }

  test("temperatureSample: √-damped rates sit between equal-mass and keep-all, deterministic") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // three strata with token masses ~ 900 / 100 / 25 docs × 4 tokens
    val docs = ((1L to 900L).map(i => (i, "big", "a b c d")) ++
      (1001L to 1100L).map(i => (i, "mid", "a b c d")) ++
      (2001L to 2025L).map(i => (i, "small", "a b c d")))
      .toDF("doc_id", "lang", "text")
    val kept = graft.ops.Sampling.temperatureSample(docs)
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    // the smallest stratum keeps everything (rate 1000)
    assert(kept.count(_._2 == "small") == 25)
    // expected exact rates (mass: big 3600, mid 400, small 100 tokens):
    // big = ⌊√(1000·(10^5 div 3600))⌋ = ⌊√27000⌋ = 164‰,
    // mid = ⌊√(1000·(10^5 div 400))⌋ = ⌊√250000⌋ = 500‰ — the √ damping
    // keeps MORE of the dominant strata than equal-mass (27‰ / 250‰)
    // while still rebalancing (164 < 1000)
    val bigKept = kept.count(_._2 == "big")
    val midKept = kept.count(_._2 == "mid")
    // hash buckets are uniform, tolerate sampling noise around n·rate/1000
    assert(math.abs(bigKept - 900 * 164 / 1000) <= 40, s"big kept $bigKept")
    assert(math.abs(midKept - 100 * 500 / 1000) <= 20, s"mid kept $midKept")
    // deterministic under repartitioning
    val re = graft.ops.Sampling.temperatureSample(docs.repartition(13))
      .select("doc_id", "lang").as[(Long, String)].collect().toSeq
    assert(re.toSet == kept.toSet)
    // the kept set is exactly the two-stage hash definition (engine-mirrorable)
    val expected = docs.as[(Long, String, String)].collect().filter { case (id, lang, _) =>
      val rate = lang match { case "big" => 164L; case "mid" => 500L; case _ => 1000L }
      (((id % 1000003L) * 1597334677L) % 1000003L) * 2038074743L % 1000L < rate
    }.map(t => (t._1, t._2)).toSet
    assert(kept.toSet == expected)
    // independence regression (the round-12 review's catch): the
    // temperature bucket must not be a deterministic function of the
    // split bucket at any coarse modulus — across ids sharing one split
    // bucket, temperature buckets must spread over many residues mod 8
    val byKey = (1L to 100000L).groupBy(id =>
      ((id % 1000003L) * 2654435761L) % 1000L)
    val worst = byKey.values.map(ids => ids.map(id =>
      ((((id % 1000003L) * 1597334677L) % 1000003L) * 2038074743L % 1000L) % 8L
    ).distinct.size).min
    assert(worst == 8, s"temperature bucket collapses to $worst residues mod 8 per split bucket")
  }

  test("importanceScores: target vocabulary outranks off-target, threshold splits them") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // two disjoint vocabularies; target docs speak one, raw-only docs the
    // other, one mixed doc sits between
    val corpus = (
      (1L to 3L).map(i => (i, "t", "aa bb cc")) ++
      (11L to 13L).map(i => (i, "r", "xx yy zz")) ++
      Seq((21L, "r", "aa bb xx yy"), (31L, "r", "   "))  // mixed; whitespace-only
    ).toDF("doc_id", "lang", "text")
    val got = Sampling.importanceScores(corpus, col("lang") === "t")
      .as[(Long, Long, Boolean)].collect().toSeq
    val byId = got.map(r => r._1 -> r).toMap
    // whitespace-only doc has no features and is excluded
    assert(!byId.contains(31L), got)
    // pure-target vocabulary scores strictly above pure-off-target; the
    // mixed doc sits strictly between (robust to any single bucket
    // collision: ordering only needs the two vocabularies to differ)
    val tScore = byId(1L)._2
    val rScore = byId(11L)._2
    assert(tScore > rScore, s"target $tScore !> raw $rScore")
    assert(byId(21L)._2 < tScore && byId(21L)._2 > rScore, byId(21L))
    // target docs selected, pure off-target not: with disjoint vocabularies
    // w(target bucket) = 10⁶ and w(off bucket) = 250000 vs thr = 500000
    assert((1L to 3L).forall(byId(_)._3), got)
    assert((11L to 13L).forall(!byId(_)._3), got)
    // identical scores within each vocabulary class
    assert((1L to 3L).map(byId(_)._2).distinct.size == 1)
    // deterministic under repartitioning (driver-collected weight table is
    // an aggregate — partition-order-free)
    val re = Sampling.importanceScores(corpus.repartition(7), col("lang") === "t")
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(re == got)
  }

  test("importance model: persisted scoring equals inline; unseen vocab takes the smoothed default") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val corpus = (
      (1L to 3L).map(i => (i, "t", "aa bb cc")) ++
      (11L to 13L).map(i => (i, "r", "xx yy zz"))
    ).toDF("doc_id", "lang", "text")
    val dir = java.nio.file.Files.createTempDirectory("impmodel").toString + "/m"
    Sampling.buildImportanceModel(corpus, col("lang") === "t", dir)
    val inline = Sampling.importanceScores(corpus, col("lang") === "t")
      .as[(Long, Long, Boolean)].collect().toSeq
    val stored = Sampling.scoreWithModel(corpus, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(stored == inline)
    // a batch of vocabulary the model corpus never saw: every token falls
    // back to the smoothed (0+1)·10⁶/(0+1) weight, which clears the
    // uniform threshold (500000) — new-domain text is not silently culled
    val unseen = Seq((99L, "qq1 qq2 qq3")).toDF("doc_id", "text")
    val got = Sampling.scoreWithModel(unseen, dir)
      .as[(Long, Long, Boolean)].collect().toSeq
    assert(got == Seq((99L, 1000000L, true)), got)
  }
}
