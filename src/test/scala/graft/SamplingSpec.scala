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
}
