package graft

import graft.ops.Fluency
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class FluencySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // a tiny "fluent" reference corpus: the same sentence repeated, so its
  // bigrams dominate the model
  private def refCorpus = {
    import spark.implicits._
    (1L to 5L).map(i => (i, "the cat sat on the mat")).toDF("doc_id", "text")
  }

  private def score(batch: org.apache.spark.sql.DataFrame,
      dir: String): Map[Long, (Long, Long)] =
    Fluency.scoreWithLm(batch, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

  test("in-model transitions outscore scrambled and unseen text; bounds hold") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmmodel").toString + "/m"
    Fluency.buildLmModel(refCorpus, dir)
    val batch = Seq(
      (1L, "the cat sat on the mat"),  // every bigram in-model
      (2L, "mat the on sat cat the"),  // same unigrams, unseen bigrams -> backoff
      (3L, "qq ww ee rr tt yy"),       // unseen unigrams AND bigrams
      (4L, "solo"),                    // < 2 tokens: no transitions, dropped
      (5L, "the cat")                  // single in-model transition
    ).toDF("doc_id", "text")
    val got = score(batch, dir)
    assert(!got.contains(4L), got)
    assert(got(1L)._1 == 6L && got(5L)._1 == 2L, got) // n_tok
    val fluent = got(1L)._2
    val scrambled = got(2L)._2
    val alien = got(3L)._2
    assert(fluent > scrambled, s"in-model $fluent !> scrambled $scrambled")
    // scrambled backs off to in-model unigrams, which beat unseen unigrams
    assert(scrambled > alien, s"backoff $scrambled !> alien $alien")
    assert(got.values.forall { case (_, p) => p >= 0L && p <= 1000000L }, got)
    // bi("the cat") = 5 (once per reference doc), uni("the") = 10 (twice
    // per doc), so p = min(1e6, 5·1e6 div (10+1)) = 454545 exactly —
    // unless distinct tokens/bigrams of this fixed vocabulary collide in
    // the 1k/16k bucket spaces, which they do not
    assert(got(5L)._2 == 454545L, got(5L))
  }

  test("deterministic under repartitioning; stored model equals fresh build") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("lmmodel").toString + "/m"
    Fluency.buildLmModel(refCorpus, dir)
    val batch = (1L to 20L).map(i =>
      (i, if (i % 2 == 0) "the cat sat on the mat" else "on the mat sat the cat"))
      .toDF("doc_id", "text")
    val base = score(batch, dir)
    assert(score(batch.repartition(7), dir) == base)
    val dir2 = java.nio.file.Files.createTempDirectory("lmmodel").toString + "/m"
    Fluency.buildLmModel(refCorpus.repartition(3), dir2)
    assert(score(batch, dir2) == base)
  }

  test("scoring is shuffle-free (streaming-legal) and the model table is bounded") {
    val dir = java.nio.file.Files.createTempDirectory("lmmodel").toString + "/m"
    Fluency.buildLmModel(refCorpus, dir)
    val plan = Fluency.scoreWithLmUnordered(
      Tables.load(spark, TestSpark.Sf0001, "documents"), dir)
      .queryExecution.executedPlan
    val exchanges = plan.collect {
      case e: org.apache.spark.sql.execution.exchange.ShuffleExchangeExec => e
    }
    assert(exchanges.isEmpty, s"scoring plan shuffles:\n$plan")
    val rows = spark.read.parquet(dir).count()
    assert(rows <= Fluency.UniBuckets + Fluency.BiBuckets, rows)
  }
}
