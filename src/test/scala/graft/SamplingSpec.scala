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
}
