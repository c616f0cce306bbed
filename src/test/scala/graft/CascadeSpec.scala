package graft.ops

import graft.{Tables, TestSpark}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The cascade cannot drift from its stages (r17): each gate's
  * STANDALONE operator, run on the cascade's own input, must agree with
  * the in-cascade vote document by document — and the composed keep /
  * first-fail attribution must be exactly the Kleene fold of the votes. */
class CascadeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private lazy val d = TestSpark.Sf0001

  private lazy val planted =
    QualityClf.plantSpam(Tables.load(spark, d, "documents"))

  private lazy val decisions =
    Curation.cascadeDecisions(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap

  private def votes(col: Int): Map[Long, Option[Boolean]] =
    decisions.view.mapValues(r =>
      if (r.isNullAt(col)) None else Some(r.getBoolean(col))).toMap

  test("clf votes == the standalone classifier's keep") {
    val standalone = QualityClf.trainAndScoreUnordered(planted)
      .select("doc_id", "keep").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val cascade = votes(1)
    assert(cascade.nonEmpty)
    cascade.foreach { case (id, v) =>
      assert(v == standalone.get(id), s"clf vote drift on doc $id")
    }
  }

  test("fluency votes == the standalone LM score against the threshold") {
    val standalone = Fluency
      .scoreWithLmUnordered(planted, Fluency.ensureLmModel(spark, d))
      .select("doc_id", "fluency_ppm").collect()
      .map(r => r.getLong(0) ->
        (r.getLong(1) >= Curation.CascadeFluencyMinPpm)).toMap
    votes(2).foreach { case (id, v) =>
      assert(v == standalone.get(id), s"fluency vote drift on doc $id")
    }
  }

  test("repetition votes == the standalone metrics at the cascade thresholds") {
    val standalone = TextAnalysis.repetitionMetricsUnordered(planted,
        topBigramPctMax = Curation.CascadeTopBigramPctMax,
        dupTokenPctMax = Curation.CascadeDupTokenPctMax)
      .select("doc_id", "is_repetitive").collect()
      .map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(!r.getBoolean(1)))).toMap
    votes(3).foreach { case (id, v) =>
      assert(v == standalone(id), s"repetition vote drift on doc $id")
    }
  }

  test("contamination votes == the standalone operator on the fixture benchmark") {
    val flagged = TextAnalysis.contaminationUnordered(planted,
        TextAnalysis.contaminationBenchmark(planted))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    votes(4).foreach { case (id, v) =>
      assert(v.contains(!flagged.contains(id)),
        s"contamination vote drift on doc $id")
    }
    assert(flagged.nonEmpty, "the contamination gate never fired — vacuous")
  }

  test("keep is the Kleene AND; drop_reason is the FIRST false gate") {
    val order = Seq(1 -> "clf", 2 -> "fluency", 3 -> "repetition",
      4 -> "contamination")
    var reasons = Set.empty[String]
    decisions.values.foreach { r =>
      val vs = order.map { case (i, n) =>
        n -> (if (r.isNullAt(i)) None else Some(r.getBoolean(i)))
      }
      val expectKeep =
        if (vs.exists(_._2.contains(false))) Some(false)
        else if (vs.exists(_._2.isEmpty)) None
        else Some(true)
      val gotKeep = if (r.isNullAt(5)) None else Some(r.getBoolean(5))
      assert(gotKeep == expectKeep, s"keep fold drift on doc ${r.getLong(0)}")
      val expectReason = vs.find(_._2.contains(false)).map(_._1)
      val gotReason = if (r.isNullAt(6)) None else Some(r.getString(6))
      assert(gotReason == expectReason,
        s"drop_reason drift on doc ${r.getLong(0)}")
      reasons ++= gotReason
    }
    // the fixture must exercise every gate, or the cascade is vacuous
    assert(reasons == Set("clf", "fluency", "repetition", "contamination"),
      s"gates that never attributed a drop: ${Set("clf", "fluency",
        "repetition", "contamination") -- reasons}")
  }

  test("the counts row is exactly the rollup of the decisions") {
    val c = Curation.cascadeCounts(spark, d).collect().head
    val rows = decisions.values
    def cnt(f: org.apache.spark.sql.Row => Boolean) = rows.count(f).toLong
    assert(c.getAs[Long]("n_docs") == rows.size.toLong)
    assert(c.getAs[Long]("n_kept") == cnt(r => !r.isNullAt(5) && r.getBoolean(5)))
    assert(c.getAs[Long]("n_undecided") == cnt(_.isNullAt(5)))
    Seq("clf" -> "drop_clf", "fluency" -> "drop_fluency",
      "repetition" -> "drop_repetition",
      "contamination" -> "drop_contamination").foreach { case (reason, colN) =>
      assert(c.getAs[Long](colN) ==
        cnt(r => !r.isNullAt(6) && r.getString(6) == reason), s"$colN drift")
    }
    Seq(1 -> "fail_clf", 2 -> "fail_fluency", 3 -> "fail_repetition",
      4 -> "fail_contamination").foreach { case (i, colN) =>
      assert(c.getAs[Long](colN) == cnt(r => !r.isNullAt(i) && !r.getBoolean(i)),
        s"$colN drift")
    }
  }

  test("fused single-pass form == the four-frame reference, vote for vote") {
    // r18: the ENTRY runs the fused one-scan plan; the four-frame join
    // stays the spec-pinned reference shape. Null-sensitive compare:
    // every vote, keep, and drop_reason cell must agree per doc,
    // including which cells are NULL (the Kleene abstentions)
    val fused = Curation.cascadeDecisionsFused(spark, d).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(fused.keySet == decisions.keySet)
    for ((id, f) <- fused; r = decisions(id); i <- 1 to 6) {
      assert(f.isNullAt(i) == r.isNullAt(i),
        s"null drift doc $id col $i: fused=${f} ref=${r}")
      if (!f.isNullAt(i))
        assert(f.get(i) == r.get(i), s"vote drift doc $id col $i")
    }
  }

  test("oversized benchmark switches to the broadcast form, vote for vote " +
      "(r18 advice #3: plan-literal ceiling)") {
    // planLiteralMax = 0 forces the broadcast-join contamination arm —
    // the form a production-sized benchmark set takes — which must be
    // vote-for-vote equal to the plan-literal form, NULLs included
    val bc = Curation.cascadeDecisionsFusedBounded(spark, d, planLiteralMax = 0)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(bc.keySet == decisions.keySet)
    for ((id, f) <- bc; r = decisions(id); i <- 1 to 6) {
      assert(f.isNullAt(i) == r.isNullAt(i),
        s"null drift doc $id col $i: broadcast=${f} ref=${r}")
      if (!f.isNullAt(i))
        assert(f.get(i) == r.get(i), s"vote drift doc $id col $i")
    }
  }

  test("the fused plan reads the corpus ONCE (4 scans -> 1, r17 verdict #3)") {
    val plan = Curation.cascadeDecisionsFused(spark, d)
      .queryExecution.executedPlan.toString
    val scans = "(?m)Scan parquet|FileScan parquet".r
      .findAllIn(plan).length
    assert(scans == 1, s"expected exactly 1 corpus scan, got $scans:\n$plan")
    // and the reference four-frame plan really does scan 4x+ (the claim
    // "fused saves scans" is only meaningful if the baseline pays them)
    val refPlan = Curation.cascadeDecisions(spark, d)
      .queryExecution.executedPlan.toString
    val refScans = "(?m)Scan parquet|FileScan parquet".r
      .findAllIn(refPlan).length
    assert(refScans >= 4, s"reference plan expected >= 4 scans, got $refScans")
  }
}
