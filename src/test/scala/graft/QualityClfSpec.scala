package graft

import graft.Tables
import graft.ops.QualityClf
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The hashed-ngram quality classifier: planted spam must be separable
  * (twin-wise, not just on average), the persisted model must serve the
  * same scores the inline estimation produces, and the keep decision
  * must compose the classifier with the curation gate under Kleene
  * semantics. */
class QualityClfSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def docs = Tables.load(spark, TestSpark.Sf0001, "documents")

  test("every planted spam twin scores strictly below its clean original") {
    val dir = QualityClf.ensureModel(spark, TestSpark.Sf0001)
    val clean = QualityClf.scoreWithModel(docs, dir)
      .select(col("doc_id"), col("score").as("clean_score"))
    val planted = QualityClf.scoreWithModel(QualityClf.plantSpam(docs), dir)
      .select(col("doc_id"), col("score").as("spam_score"))
    val twins = clean.join(planted, "doc_id")
      .where(col("doc_id") % 3 === 1)
      .collect()
    assert(twins.nonEmpty, "no planted twins scored")
    twins.foreach { r =>
      assert(r.getLong(2) < r.getLong(1),
        s"doc ${r.getLong(0)}: spam twin did not score below the original")
    }
  }

  test("the classifier separates the classes it never saw in training") {
    val scored = QualityClf.trainAndScore(QualityClf.plantSpam(docs))
      .where(col("doc_id") % 2 =!= 0) // held-out half only
      .select(col("doc_id"), col("score"), col("keep"))
      .collect()
    assert(scored.nonEmpty)
    val (spam, clean) = scored.partition(_.getLong(0) % 3 == 1)
    assert(spam.nonEmpty && clean.nonEmpty)
    val spamAvg = spam.map(_.getLong(1)).sum / spam.length
    val cleanAvg = clean.map(_.getLong(1)).sum / clean.length
    assert(spamAvg < cleanAvg,
      s"held-out spam mean $spamAvg !< clean mean $cleanAvg")
    // the decision boundary does real work: both verdicts occur
    assert(scored.exists(_.getBoolean(2)) && scored.exists(!_.getBoolean(2)))
  }

  test("persisted model serves exactly the inline scores") {
    val planted = QualityClf.plantSpam(docs)
    val dir = QualityClf.ensureModel(spark, TestSpark.Sf0001)
    val inline = QualityClf.trainAndScore(planted).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    val served = QualityClf.scoreWithModel(planted, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2))).toMap
    assert(inline.nonEmpty && inline == served)
  }

  test("keep decision composes classifier and gate with Kleene AND") {
    val rows = QualityClf.keepDecision(QualityClf.plantSpam(docs)).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val clf = if (r.isNullAt(1)) None else Some(r.getBoolean(1))
      val gate = if (r.isNullAt(2)) None else Some(r.getBoolean(2))
      val keep = if (r.isNullAt(3)) None else Some(r.getBoolean(3))
      val expect = (clf, gate) match {
        case (Some(false), _) | (_, Some(false)) => Some(false)
        case (Some(true), Some(true)) => Some(true)
        case _ => None
      }
      assert(keep == expect, s"doc ${r.getLong(0)}: keep=$keep expect=$expect")
    }
    // the composition is not vacuous: some doc is dropped by the
    // classifier ALONE (gate passes, classifier refuses)
    assert(rows.exists(r => !r.isNullAt(1) && !r.getBoolean(1) &&
      !r.isNullAt(2) && r.getBoolean(2)),
      "no document was dropped by the classifier alone")
  }

  test("ngram variant separates the held-out classes too (bigram tier live)") {
    val scored = QualityClf.trainAndScoreNgram(QualityClf.plantSpam(docs))
      .where(col("doc_id") % 2 =!= 0)
      .collect()
    assert(scored.nonEmpty)
    val (spam, clean) = scored.partition(_.getLong(0) % 3 == 1)
    assert(spam.nonEmpty && clean.nonEmpty)
    val spamAvg = spam.map(_.getLong(1)).sum / spam.length
    val cleanAvg = clean.map(_.getLong(1)).sum / clean.length
    assert(spamAvg < cleanAvg,
      s"ngram held-out spam mean $spamAvg !< clean mean $cleanAvg")
    // the bigram tier genuinely contributes features: a planted spam doc
    // carries the snippet's BIGRAMS only in the ngram variant, so its
    // ngram score must differ from its unigram score (same doc, same
    // weights formula, different feature set)
    val uni = QualityClf.trainAndScore(QualityClf.plantSpam(docs))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val moved = scored.count(r => uni.get(r.getLong(0)).exists(_ != r.getLong(1)))
    assert(moved > 0, "ngram scores identical to unigram — bigrams never fired")
  }

  test("curate composition: the classifier pre-filter shrinks the accounted corpus") {
    import org.apache.spark.sql.functions.sum
    val planted = QualityClf.plantSpam(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
      .select("doc_id", "text", "lang")
    def totalDocs(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum("n_docs")).collect()(0).getLong(0)
    val unfiltered = totalDocs(graft.ops.Curation.curate(
      graft.ops.Curation.withPlantedDups(planted)))
    val composed = totalDocs(
      SparkEntry.queries("curate_clf_corpus")(spark, TestSpark.Sf0001))
    assert(composed > 0, "composed pipeline kept nothing")
    assert(composed < unfiltered,
      s"classifier pre-filter dropped nothing ($composed !< $unfiltered)")
  }
}
