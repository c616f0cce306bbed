package graft.ops

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Quality-classifier filtering — the standard model-based curation stage
  * (the public fastText-recipe shape: hashed n-gram features, a linear
  * model, a keep decision; GPT-3/CCNet-style "quality classifier" pass):
  * a hashed-UNIGRAM linear classifier trained on a PLANTED-label slice
  * and scored map-side in exact integer arithmetic — the
  * [[Sampling.importanceScores]] (DSIR) discipline applied to supervised
  * labels instead of a target-distribution ratio.
  *
  * Fixture: the synthetic corpus has no quality labels, so the entry
  * plants them — every `doc_id % 3 == 1` document gets a fixed spam-token
  * tail ([[SpamSnippet]]) appended, the label IS the planting rule, and
  * training sees only the `doc_id % 2 == 0` half (the labeled slice);
  * scoring covers the whole corpus, so half the scored documents were
  * never seen in training. Planted-token buckets get near-zero weights,
  * clean-corpus buckets sit near the class-prior baseline — the planted
  * spam twins score strictly below their clean counterparts
  * (QualityClfSpec pins the separation; the gate pins every integer).
  *
  * Exactness discipline (the DSIR contract): the published recipe is a
  * logistic model over log-count features — both log and sigmoid are
  * libm knife edges — so the score is the integer mean of per-bucket
  * smoothed class-likelihood ratios:
  *   w_b   = (clean_b + 1) · 10⁶ div (spam_b + 1)     (add-one smoothing)
  *   score = (Σ_tokens w_bucket(token)) div n_tokens
  *   keep  = score ≥ (clean_tot · 10³ div spam_tot) · 10³
  * — monotone in the same evidence, all Long arithmetic, bit-identical
  * in any engine. Per-bucket headroom: exact to clean_b ≈ 9.2e12 tokens
  * per bucket — past the 100 TB design point once ≥ 1024 buckets spread
  * the mass (the [[Sampling]] headroom contract).
  *
  * Scale shape, identical to DSIR: training is ONE partial+final
  * aggregate of the labeled slice's hashed-unigram stream to ≤ `buckets`
  * rows (the shuffle carries buckets·partitions rows, never the corpus),
  * a BOUNDED driver collect of that table, and scoring is a pure MAP
  * over the plan-literal weight array — no shuffle, no UDF, fused into
  * the scan. The persisted-model twin stores the ≤ `buckets`-row counts
  * table once and scores every future batch O(batch), the
  * ensure-then-serve cadence of the dedup indexes. */
object QualityClf {

  /** The planted low-quality tail — boilerplate/spam tokens appended to
    * every labeled-spam document (the [[Bpe.PlantSnippet]] fixture
    * pattern; appended, not replacing, so null text stays null). */
  private[graft] val SpamSnippet =
    " click here buy now cheap pills free winner claim your prize unsubscribe limited offer"

  /** The planting rule as a DataFrame transform (engine side) — must
    * mirror the `planted` CTE glyph for glyph. Column-PRESERVING (r16
    * review): the curate composition needs `lang` downstream, and a
    * projecting form forced a documents self-join just to re-attach it. */
  private[graft] def plantSpam(docs: DataFrame): DataFrame =
    docs.withColumn("text",
      when(col("doc_id") % 3 === 1, concat(col("text"), lit(SpamSnippet)))
        .otherwise(col("text")))

  /** The planted label: TRUE = spam. Derivable from doc_id on both
    * engines — the label never has to ride a column. */
  private def isSpam = col("doc_id") % 3 === 1
  /** The labeled training slice (half the corpus; the other half is
    * held out, so scoring covers unseen documents). */
  private def isLabeled = col("doc_id") % 2 === 0

  private val Buckets = 1024

  /** Per-document hashed-unigram feature stream — the SAME
    * WordShingleHashes chain as DSIR/dedup at n = 1 (one shared hash
    * definition, one oracle emulation). Null-text and token-free
    * documents carry no features and get no score row. */
  private def features(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.word_shingles(col("text"), 1).as("fh"))
      .where(col("fh").isNotNull)

  /** Unigram ∪ bigram hashed features — the FULL public fastText recipe
    * (word n-grams, n ≤ 2): the bigram tier carries the word-order
    * signal unigram bags lose. Same hash chains as the fluency bigram LM
    * (one oracle emulation each). A one-token document has no bigrams
    * (null → empty); a token-free document has no features at all. */
  private def ngramFeatures(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.word_shingles(col("text"), 1).as("u"),
        graft.functions.GraftFunctions.word_shingles(col("text"), 2).as("b"))
      .where(col("u").isNotNull)
      .select(col("doc_id"),
        concat(col("u"),
          coalesce(col("b"), expr("CAST(array() AS ARRAY<BIGINT>)"))).as("fh"))

  /** The bounded model table from a feature frame (doc_id, fh): per
    * bucket, token counts in clean- vs spam-labeled training documents —
    * ≤ [[Buckets]] rows from one partial+final aggregate. */
  private def countsFrom(feats: DataFrame): DataFrame =
    feats
      .select(explode(col("fh")).as("h"), isSpam.as("is_spam"))
      .groupBy(pmod(col("h"), lit(Buckets.toLong)).as("bucket"))
      .agg(sum(when(!col("is_spam"), 1L).otherwise(0L)).as("clean_n"),
        sum(when(col("is_spam"), 1L).otherwise(0L)).as("spam_n"))

  /** Unigram model table over the labeled slice. */
  def classCounts(planted: DataFrame): DataFrame =
    countsFrom(features(planted.where(isLabeled)))

  /** (bucket, clean_n, spam_n) rows → (weight array, keep threshold).
    * Unseen buckets smooth to (0+1)·10⁶/(0+1) = 10⁶ — a scored batch may
    * carry vocabulary the training slice never hashed. */
  private def weightsAndThreshold(rows: Array[org.apache.spark.sql.Row])
      : (Array[Long], Long) = {
    val w = Array.fill(Buckets)(1000000L)
    var cleanTot = 0L; var spamTot = 0L
    rows.foreach { r =>
      val clean = r.getLong(1); val spam = r.getLong(2)
      w(r.getLong(0).toInt) = (clean + 1L) * 1000000L / (spam + 1L)
      cleanTot += clean; spamTot += spam
    }
    require(cleanTot > 0 && spamTot > 0,
      "labeled slice must carry both classes")
    (w, cleanTot * 1000L / spamTot * 1000L)
  }

  /** The pure-map scoring tail over a feature frame (no sort — legal
    * inside a streaming plan, the [[Sampling.applyImportanceModel]]
    * convention). */
  private def applyModelOn(feats: DataFrame, w: Array[Long], thr: Long)
      : DataFrame = {
    val wlit = typedLit(w.toSeq)
    val bucketWeight = transform(col("fh"), h =>
      element_at(wlit, (pmod(h, lit(Buckets.toLong)) + 1L).cast("int")))
    feats
      .withColumn("wsum", aggregate(bucketWeight, lit(0L), (a, x) => a + x))
      .select(col("doc_id"), expr("wsum DIV size(fh)").as("score"))
      .withColumn("keep", col("score") >= thr)
  }

  private def applyModel(batch: DataFrame, w: Array[Long], thr: Long)
      : DataFrame = applyModelOn(features(batch), w, thr)

  /** Trained weights + threshold from a planted frame — the bounded
    * collect [[trainAndScoreUnordered]] performs, exposed for plans that
    * fuse the scoring columns instead of joining a scored frame. */
  private[ops] def trainedParams(planted: DataFrame): (Array[Long], Long) =
    weightsAndThreshold(classCounts(planted).collect())


  /** Inline train-and-score over a planted corpus: estimate weights from
    * the labeled slice (bounded collect), score EVERY document. */
  def trainAndScore(planted: DataFrame): DataFrame =
    trainAndScoreUnordered(planted).orderBy("doc_id")

  /** [[trainAndScore]] with unigram ∪ bigram features — the full
    * fastText-recipe form; same weights math, same bounded shapes. */
  def trainAndScoreNgram(planted: DataFrame): DataFrame = {
    val (w, thr) = weightsAndThreshold(
      countsFrom(ngramFeatures(planted.where(isLabeled))).collect())
    applyModelOn(ngramFeatures(planted), w, thr).orderBy("doc_id")
  }

  /** [[trainAndScore]] without the presentation sort — the form composed
    * plans embed (r16 review: a mid-plan global sort exchange whose
    * output is immediately filtered/joined is wasted unless the
    * optimizer happens to drop it). */
  def trainAndScoreUnordered(planted: DataFrame): DataFrame = {
    val (w, thr) = weightsAndThreshold(classCounts(planted).collect())
    applyModel(planted, w, thr)
  }

  /** Persist the classifier — the serving shape: the counts table is
    * ≤ [[Buckets]] rows (kilobytes), written once per snapshot. */
  def buildModel(planted: DataFrame, dir: String): Unit =
    classCounts(planted)
      .coalesce(1) // ≤ Buckets rows — one tiny file
      .write.mode("overwrite").parquet(dir)

  /** Score a new batch against a stored model: a bounded ≤ [[Buckets]]-row
    * read, then one map over the batch — zero shuffles, O(batch) work. */
  def scoreWithModel(batch: DataFrame, dir: String): DataFrame =
    scoreWithModelUnordered(batch, dir).orderBy("doc_id")

  /** [[scoreWithModel]] without the presentation sort — the form a
    * STREAMING plan embeds (sorts are illegal under Append mode; the
    * stream twin orders after its sink). */
  def scoreWithModelUnordered(batch: DataFrame, dir: String): DataFrame = {
    val rows = batch.sparkSession.read.parquet(dir)
      .select("bucket", "clean_n", "spam_n").collect() // bounded: ≤ Buckets
    val (w, thr) = weightsAndThreshold(rows)
    applyModel(batch, w, thr)
  }

  /** Fingerprint-staged model over a testdata corpus, cross-process-safe
    * and stale-proof like every ensure-* fixture. */
  def ensureModel(spark: SparkSession, sfDir: String): String = {
    val dir = Dedup.fingerprintedDir("graft-qclfmodel", "documents",
      s"$sfDir:$Buckets:$SpamSnippet", Seq(s"$sfDir/documents.parquet"))
    Dedup.stageAtomically(dir)(tmp =>
      buildModel(plantSpam(Tables.load(spark, sfDir, "documents")), tmp.getPath))
  }

  /** The keep DECISION composed into the curation pipeline: classifier
    * keep ∧ the curate() heuristic gate (token bounds + quality score —
    * the exact rule `curate_corpus` applies), per document. NULL text
    * propagates NULL decisions (Kleene AND on both engines); a token-free
    * text has no classifier features, so clf_keep is NULL while the gate
    * still votes. */
  def keepDecision(planted: DataFrame): DataFrame = {
    val scored = trainAndScoreUnordered(planted)
      .withColumnRenamed("keep", "clf_keep")
    val gated = TextAnalysis.qualityScores(planted)
      .select(col("doc_id"),
        (col("n_tokens").between(20, 2000) && col("quality_score") >= 0.5)
          .as("gate_keep"))
    gated.join(scored.select("doc_id", "clf_keep"), Seq("doc_id"), "left")
      .select(col("doc_id"), col("clf_keep"), col("gate_keep"),
        (col("clf_keep") && col("gate_keep")).as("keep"))
      .orderBy("doc_id")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // inline train-and-score: planted labels → deterministic integer
    // weights → integer dot; half the scored docs were never trained on
    "text_quality_clf" -> ((s, d) =>
      trainAndScore(plantSpam(Tables.load(s, d, "documents")))),
    // the serving path: the PERSISTED ≤1024-row model scores a new batch
    // (ids +1M, 0.9-truncated — the sample_importance_incr perturbation,
    // so unseen-bucket fallback is genuinely exercised)
    "text_quality_clf_served" -> ((s, d) => {
      val dir = ensureModel(s, d)
      val batch = plantSpam(Tables.load(s, d, "documents")).select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))")
          .as("text"))
      scoreWithModel(batch, dir)
    }),
    // the full fastText recipe: unigram + word-BIGRAM hashed features —
    // the word-order signal the unigram bag loses, same integer regime
    "text_quality_clf_ngram" -> ((s, d) =>
      trainAndScoreNgram(plantSpam(Tables.load(s, d, "documents")))),
    // the keep decision composed into the curation pipeline's gate
    "text_quality_clf_keep" -> ((s, d) =>
      keepDecision(plantSpam(Tables.load(s, d, "documents")))),
    // the FULL composition: classifier pre-filter feeding the entire
    // curate pipeline (gate → exact keep-first → near-dup removal →
    // split → per-(lang, split) accounting) as ONE declarative plan —
    // what a production corpus build actually runs. The clf stage adds
    // one bounded aggregate + a broadcast-able id semi-join in front of
    // curate's audited shape; dropped spam shifts every downstream
    // accounting row, so any drift in the classifier moves this oracle
    "curate_clf_corpus" -> ((s, d) => {
      val planted = plantSpam(Tables.load(s, d, "documents"))
      val keptIds = trainAndScoreUnordered(planted)
        .where(col("keep")).select("doc_id")
      val clfDocs = planted.join(keptIds, "doc_id")
        .select("doc_id", "text", "lang")
      Curation.curate(Curation.withPlantedDups(clfDocs))
    }))

  /** The model-estimation CTE chain all three oracles share — one
    * definition of planting, hashing, counting, weights, and threshold,
    * so the entries cannot drift in smoothing or casts. Every SUM casts
    * back to BIGINT (DuckDB sums to HUGEINT, the round-1 incident
    * class); bucket = unsigned low 10 bits == Spark's pmod on a power
    * of two. */
  private[ops] def clfModelCtes: String = clfModelCtesWith(
    s"""feat AS (
       |  SELECT doc_id, CAST(uh % $Buckets AS BIGINT) AS bucket
       |  FROM (${HashOracleSql.unigramSql("planted")}) _)""".stripMargin)

  /** The ngram variant's feature CTE: unigram ∪ bigram buckets — the
    * same two hash emulations the DSIR and fluency oracles use. */
  private def ngramFeatCte: String =
    s"""feat AS (
       |  SELECT doc_id, CAST(uh % $Buckets AS BIGINT) AS bucket
       |  FROM (${HashOracleSql.unigramSql("planted")}) _
       |  UNION ALL
       |  SELECT doc_id, CAST(bh % $Buckets AS BIGINT) AS bucket
       |  FROM (${HashOracleSql.bigramSql("planted")}) _)""".stripMargin

  private def clfModelCtesWith(featCte: String): String =
    s"""planted AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 1 THEN text || '$SpamSnippet'
       |              ELSE text END AS text
       |  FROM documents),
       |$featCte,
       |cnt AS (
       |  SELECT bucket,
       |         CAST(SUM(CASE WHEN doc_id % 3 != 1 THEN 1 ELSE 0 END) AS BIGINT) AS clean_n,
       |         CAST(SUM(CASE WHEN doc_id % 3 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS spam_n
       |  FROM feat WHERE doc_id % 2 = 0 GROUP BY bucket),
       |w AS (SELECT bucket, (clean_n + 1) * 1000000 // (spam_n + 1) AS wv FROM cnt),
       |tot AS (SELECT CAST(SUM(clean_n) AS BIGINT) AS clean_tot,
       |               CAST(SUM(spam_n) AS BIGINT) AS spam_tot FROM cnt)""".stripMargin

  private[ops] def scoreSqlFrom(featCte: String): String =
    s"""score AS (
       |  SELECT f.doc_id,
       |         CAST(CAST(SUM(COALESCE(w.wv, 1000000)) AS BIGINT) // COUNT(*) AS BIGINT) AS score
       |  FROM $featCte f LEFT JOIN w USING (bucket) GROUP BY f.doc_id)""".stripMargin

  private[ops] val thrSql = "(SELECT clean_tot * 1000 // spam_tot * 1000 FROM tot)"

  val oracle: Seq[(String, String)] = Seq(
    "text_quality_clf" ->
      s"""WITH $clfModelCtes,
         |${scoreSqlFrom("feat")}
         |SELECT s.doc_id, s.score, s.score >= $thrSql AS keep
         |FROM score s ORDER BY s.doc_id""".stripMargin,
    "text_quality_clf_served" ->
      s"""WITH $clfModelCtes,
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.9) AS INT), 1)) AS text
         |  FROM planted),
         |bfeat AS (
         |  SELECT doc_id, CAST(uh % $Buckets AS BIGINT) AS bucket
         |  FROM (${HashOracleSql.unigramSql("batch")}) _),
         |${scoreSqlFrom("bfeat")}
         |SELECT s.doc_id, s.score, s.score >= $thrSql AS keep
         |FROM score s ORDER BY s.doc_id""".stripMargin,
    "text_quality_clf_ngram" ->
      s"""WITH ${clfModelCtesWith(ngramFeatCte)},
         |${scoreSqlFrom("feat")}
         |SELECT s.doc_id, s.score, s.score >= $thrSql AS keep
         |FROM score s ORDER BY s.doc_id""".stripMargin,
    "text_quality_clf_keep" ->
      s"""WITH $clfModelCtes,
         |${scoreSqlFrom("feat")},
         |q AS (${TextAnalysis.textQualityOracleSqlFrom("planted")})
         |SELECT q.doc_id,
         |       s.score >= $thrSql AS clf_keep,
         |       (q.n_tokens BETWEEN 20 AND 2000 AND q.quality_score >= 0.5) AS gate_keep,
         |       (s.score >= $thrSql)
         |         AND (q.n_tokens BETWEEN 20 AND 2000 AND q.quality_score >= 0.5) AS keep
         |FROM q LEFT JOIN score s USING (doc_id)
         |ORDER BY q.doc_id""".stripMargin,
    // the classifier-kept slice (with lang joined back) rooted into the
    // SHARED curate preamble + accounting tail — the composed pipeline
    // under one oracle
    "curate_clf_corpus" ->
      s"""WITH $clfModelCtes,
         |${scoreSqlFrom("feat")},
         |clfkept AS (
         |  SELECT p.doc_id, p.text, d.lang
         |  FROM planted p
         |  JOIN documents d USING (doc_id)
         |  JOIN score s USING (doc_id)
         |  WHERE s.score >= $thrSql),
         |${Curation.plantedKeptCtesFrom("clfkept", withHead = false)},
         |${Curation.curateAccountingTailSql}""".stripMargin)
}
