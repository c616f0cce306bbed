package graft

import graft.ops.Similarity
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SemDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // ids 0/37/74 are the stride-37 centroid seeds, one per semantic ball;
  // dim-4 unit-ish vectors so per-pair cosines are hand-checkable
  private def fixture = {
    import spark.implicits._
    Seq(
      (0L, Seq(1f, 0f, 0f, 0f)),      // ball A seed
      (5L, Seq(1.02f, 0f, 0f, 0f)),   // A, scaled: quantizes identically
      (9L, Seq(1f, 0.05f, 0f, 0f)),   // A, noisy: cos ~ 0.999
      (37L, Seq(0f, 1f, 0f, 0f)),     // ball B seed
      (50L, Seq(0f, 1f, 0.1f, 0f)),   // B, noisy: cos ~ 0.995
      (74L, Seq(0f, 0f, 0f, 1f)),     // singleton
      (80L, Seq(1f, 1f, 0f, 0f))      // cos 0.707 to ball A: BELOW tau, kept
    ).toDF("vec_id", "embedding")
  }

  private def run(df: org.apache.spark.sql.DataFrame) =
    Similarity.semDedup(df, nCentroids = 4)
      .collect()
      .map(r => r.getLong(0) -> (Option(r.get(2)).map(_.asInstanceOf[Long]),
        r.getBoolean(3))).toMap

  test("within-ball later ids drop against the smallest witness; sub-threshold and singleton kept") {
    val got = run(fixture)
    assert(got(5L) == (Some(0L), false), got)
    assert(got(9L) == (Some(0L), false), got)
    assert(got(50L) == (Some(37L), false), got)
    // ball representatives, the singleton, and the 0.707-cosine neighbor
    // all survive — tau is a threshold, not a cluster-wide collapse
    assert(Seq(0L, 37L, 74L, 80L).forall(id => got(id) == (None, true)), got)
  }

  test("deterministic under repartitioning") {
    val base = run(fixture)
    assert(run(fixture.repartition(5)) == base)
  }

  test("pair stage shuffles linearly (cluster-bounded), not quadratically") {
    // budget check at BOTH spec scale factors before the PlanAudit budget
    // is trusted: per-row coefficient must not grow with the corpus
    val perRow = Seq(TestSpark.Sf0001, "/root/testdata/sf0.01").map { sf =>
      val n = spark.read.parquet(s"$sf/embeddings.parquet").count()
      val measured = PlanAudit.shuffleRecordsWritten(spark, "dedup_semantic", sf)
      info(f"$sf: $measured rows shuffled over $n input vectors (${measured.toDouble / n}%.2f/row)")
      measured.toDouble / n
    }
    assert(perRow(1) <= perRow(0) * 2.5,
      s"per-row shuffle grew superlinearly: ${perRow(0)} -> ${perRow(1)}")
  }
}
