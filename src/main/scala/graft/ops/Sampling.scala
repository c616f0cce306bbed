package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting for training pipelines — the op every
  * corpus build needs between dedup and training: stable train/val/test
  * assignment that (a) never changes when the pipeline reruns, (b) never
  * depends on row order or partitioning, and (c) is reproducible by any
  * other engine reading the same ids.
  *
  * The assignment is a Knuth multiplicative hash over the id, kept inside
  * plain integer SQL arithmetic ON PURPOSE: no engine-specific hash
  * function, so the DuckDB oracle (and any downstream system) reproduces
  * the exact split from the id alone. The id is reduced mod a prime first
  * so the multiply stays far from Long overflow at any realistic id width
  * (id % 1000003 < 2^20; × 2654435761 < 2^52).
  *
  * Scale: one map-only projection — no shuffle, no state; split
  * proportions hold per partition by the hash's uniformity, so sampling a
  * 100 TB corpus is exactly a full scan.
  */
object Sampling {

  /** Per-mille bucket for an id column (0–999), stable across engines. */
  def splitBucket(idCol: String): org.apache.spark.sql.Column =
    pmod((col(idCol) % 1000003L) * 2654435761L, lit(1000L))

  /** Assign train/val/test by per-mille thresholds (default 80/10/10). */
  def deterministicSplit(df: DataFrame, idCol: String = "doc_id",
      trainPerMille: Int = 800, valPerMille: Int = 100): DataFrame = {
    require(trainPerMille + valPerMille <= 1000, "split fractions exceed 1")
    val b = splitBucket(idCol)
    df.withColumn("split",
      when(b < trainPerMille, "train")
        .when(b < trainPerMille + valPerMille, "val")
        .otherwise("test"))
  }

  /** Per-mille bucket for stratified sampling — a DIFFERENT multiplier
    * than [[splitBucket]] (xxhash's PRIME32_2) so the sampling decision is
    * independent of the train/val/test assignment: a doc's survival must
    * not correlate with which split it lands in. Same overflow headroom:
    * id % 1000003 < 2^20, × 2246822519 < 2^52. */
  def sampleBucket(idCol: String): org.apache.spark.sql.Column =
    pmod((col(idCol) % 1000003L) * 2246822519L, lit(1000L))

  /** Stratified downsampling: keep each row iff its [[sampleBucket]] falls
    * under the per-mille target of its stratum. The canonical corpus use:
    * rebalance a source-language mix by downsampling the dominant stratum
    * hard and the tail strata lightly — deterministic (rerun-stable,
    * order-free, reproducible by any engine from the id alone), exact in
    * expectation per stratum, and a pure map-side filter: NO shuffle, no
    * per-stratum pass, no driver state. At 100 TB this is one scan with
    * the filter pushed to the row level; contrast `df.stat.sampleBy`,
    * whose Bernoulli draw is seed+partition-order dependent.
    *
    * @param perMille  stratum value → keep rate in per-mille
    * @param defaultPerMille keep rate for strata not in the map
    */
  def stratifiedSample(df: DataFrame, strataCol: String,
      perMille: Map[String, Int], defaultPerMille: Int,
      idCol: String = "doc_id"): DataFrame = {
    require((perMille.values ++ Seq(defaultPerMille)).forall(r => r >= 0 && r <= 1000),
      "per-mille rates must be in [0, 1000]")
    val rate = perMille.foldLeft(lit(defaultPerMille)) { case (acc, (k, v)) =>
      when(col(strataCol) === k, lit(v)).otherwise(acc)
    }
    df.where(sampleBucket(idCol) < rate)
  }

  /** Token-budget domain mixing: downsample every stratum (source/domain)
    * to the SMALLEST stratum's token mass — the corpus-mixing op behind
    * every "N% web, M% code, K% books" recipe, here with the equal-mass
    * target so the rates derive from the data alone. Keep rate per
    * stratum = min(1000, ⌊1000·min_total/total⌋) per-mille, applied via
    * the decorrelated [[sampleBucket]] hash — all integer arithmetic, so
    * the kept set is engine-reproducible exactly.
    *
    * Scale: one partial+final aggregate over (stratum → token total) —
    * |strata| rows — then the rate table joins back BROADCAST and the keep
    * decision is a map-side filter. The scalar min crosses as a broadcast
    * 1-row nested loop (allowlisted by name in PlanAudit, the same pattern
    * as the ANN scalar thresholds). Token mass, not doc count, is the
    * budgeted unit — doc-count balancing misallocates when domains have
    * different document lengths. */
  def tokenBudgetSample(docs: DataFrame, strataCol: String = "source",
      idCol: String = "doc_id",
      tokenCount: org.apache.spark.sql.Column = defaultTokenCount): DataFrame =
    massRateSample(docs, strataCol, sampleBucket(idCol),
      "least(1000, min_total * 1000 DIV total)", tokenCount)

  /** The scaffold [[tokenBudgetSample]] and [[temperatureSample]] share:
    * tokenize, per-stratum token totals (|strata| rows), the scalar min
    * crossing as a broadcast 1-row nested loop, integer per-mille rates
    * from `rateExpr` (over `min_total` / `total`), broadcast join-back,
    * map-side hash-bucket keep. One definition so the two mixes cannot
    * drift in tokenization or overflow headroom (`min_total * 1000`
    * stays exact to ~9.2e15 tokens — far past the 100 TB design point;
    * a rate expression must scale AFTER the division, never multiply
    * `min_total` by more than 1000, which is why temperature's √ takes
    * `1000 * (min_total * 1000 DIV total)` — the round-12 review caught
    * a draft with `min_total * 1000000`, which overflows Long at
    * ~9.2e12 tokens and silently empties the output). */
  /** The budgeted unit, pluggable (r14): whitespace+CJK words by default,
    * a BPE subword count when the training budget is tokenizer-accurate —
    * the sampler's plan is identical either way (the count is one more
    * map-side column). */
  private def defaultTokenCount: org.apache.spark.sql.Column =
    graft.functions.GraftFunctions.seg_count(col("text"))

  private def massRateSample(docs: DataFrame, strataCol: String,
      bucket: org.apache.spark.sql.Column, rateExpr: String,
      tokenCount: org.apache.spark.sql.Column = defaultTokenCount): DataFrame = {
    val withTok = docs.withColumn("n_tok", tokenCount.cast("long"))
    val totals = withTok.groupBy(strataCol).agg(sum("n_tok").as("total"))
    val rates = totals
      .crossJoin(broadcast(totals.agg(min(col("total")).as("min_total"))))
      .select(col(strataCol), expr(rateExpr).cast("long").as("rate"))
    withTok.join(broadcast(rates), strataCol)
      .where(bucket < col("rate"))
  }

  /** Per-mille bucket for temperature sampling — the SIXTH independent
    * decision, deliberately NOT another single-multiply bucket: that
    * family is closed under differences (for any two multipliers,
    * bucket₁ − bucket₂ ≡ (m₁−m₂)·y mod 1000, so the pair correlates mod
    * gcd(m₁−m₂, 1000) — at least mod 2 for odd multipliers, and the
    * round-12 review caught a draft whose constant sat exactly 8 above
    * [[splitBucket]]'s, leaking split residue into the temperature
    * decision at mod-8 granularity). A composed two-stage hash breaks
    * the linear-difference structure against EVERY single-multiply
    * bucket at once; both stage constants are fresh (unused elsewhere)
    * so no stage shares an intermediate with another pipeline decision.
    * Overflow headroom: each product < 2^20 × 2^31 = 2^51. */
  def temperatureBucket(idCol: String): org.apache.spark.sql.Column =
    pmod(pmod((col(idCol) % 1000003L) * 1597334677L, lit(1000003L))
      * 2038074743L, lit(1000L))

  /** Temperature-based domain mixing at τ = 1/2 — the standard softening
    * of equal-mass rebalancing for multilingual/multi-domain corpora
    * (public mC4/PaLM recipe): keep rate per stratum ∝ √(min_mass /
    * stratum_mass), so dominant strata are damped by the SQUARE ROOT of
    * their excess instead of fully equalized ([[tokenBudgetSample]] is
    * the τ→0 endpoint, keep-everything the τ=1 endpoint).
    *
    * Exactness discipline: a general-τ `pow` would be an engine knife
    * edge (libm pow is not correctly rounded and differs across
    * engines), but τ = 1/2 needs only IEEE-754 `sqrt` — correctly
    * rounded EVERYWHERE — over an exact integer: rate‰ =
    * ⌊√(1000 · ((1000 · min_total) div total))⌋, with the argument ≤
    * 10^6 (exact in double), the inner division keeping `min_total`'s
    * scaling at ×1000 (Long-safe to ~9.2e15 tokens, the
    * [[massRateSample]] headroom contract), and results far from
    * integer boundaries (k − 1/(2k) ≫ ulp for k ≤ 1000), so Spark and
    * DuckDB floor identically — no repair pass, no tolerance.
    *
    * Scale shape: identical to [[tokenBudgetSample]] — one |strata|-row
    * aggregate, broadcast rate join-back, map-side hash filter. */
  def temperatureSample(docs: DataFrame, strataCol: String = "lang",
      idCol: String = "doc_id"): DataFrame =
    massRateSample(docs, strataCol, temperatureBucket(idCol),
      "least(1000, floor(sqrt(CAST(1000 * (min_total * 1000 DIV total) AS DOUBLE))))")

  /** Deterministic per-group sample — eval-set construction: EXACTLY k
    * rows per stratum, chosen by a decorrelated hash order instead of
    * "first k" (which biases toward crawl order) or `rand()` (which is
    * rerun- and partition-order-unstable). The hash is a FIFTH
    * multiplicative bucket (xxhash PRIME32_5 — independent of the
    * split/sampling/shard/order buckets), so eval membership correlates
    * with nothing else the pipeline decided. Bounded partial+final TopK
    * aggregate: the shuffle carries ≤ k·partitions·strata rows, never
    * the corpus — a `ROW_NUMBER` window would exchange every row before
    * dropping any (the text_topk_quality shape). */
  def samplePerGroup(df: DataFrame, strataCol: String, k: Int = 5,
      idCol: String = "doc_id"): DataFrame = {
    require(k > 0, "k must be positive")
    val topk = udaf(new graft.functions.Aggregators.TopK(k),
      org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.Scored])
    df.withColumn("__r",
        pmod((col(idCol) % 1000003L) * 374761393L, lit(1000003L)).cast("double"))
      .groupBy(strataCol)
      .agg(topk(col("__r"), col(idCol)).as("top"))
      .select(col(strataCol), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col(strataCol), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as(idCol))
      .orderBy(strataCol, "rank")
  }

  /** DSIR-style importance scoring (Xie et al. 2023, "Data Selection for
    * Language Models via Importance Resampling" — the public hashed-n-gram
    * recipe): score every document by how target-like its token
    * distribution is, using hashed unigram features and the ratio of the
    * TARGET feature distribution to the RAW corpus distribution.
    *
    * Exactness discipline: the published form sums log-likelihood ratios,
    * but log is a libm knife edge (not correctly rounded, engine-divergent)
    * — so the score is the integer ARITHMETIC mean of per-feature
    * smoothed-ratio weights instead of the geometric one:
    *   w_b  = (tgt_b + 1) · 10⁶ div (raw_b + 1)      (add-one smoothing)
    *   score = (Σ_tokens w_bucket(token)) div n_tokens
    * — monotone in the same "target-like mass" signal, all Long
    * arithmetic, bit-identical in any engine. `selected` compares the
    * score against the uniform baseline (10³·tgt_total div raw_total)·10³
    * — the score a distribution-neutral document gets — with `tgt_total`
    * scaled by only 10³ (the [[massRateSample]] Long-headroom contract:
    * exact to ~9.2e15 tokens). Per-bucket weights stay exact to
    * tgt_b ≈ 9.2e12 tokens per bucket — past the 100 TB design point
    * once ≥ 1024 buckets spread the mass.
    *
    * Feature hash: the SAME WordShingleHashes chain as the dedup family at
    * n = 1, bucketed to `buckets` (power of two, so pmod == low bits ==
    * DuckDB's unsigned %). Scale shape: one partial+final aggregate to
    * ≤ `buckets` rows (the shuffle carries buckets·partitions rows, never
    * the corpus), a BOUNDED driver collect of that table (the Similarity
    * centroid pattern), and per-doc scoring as a pure MAP over the
    * plan-literal weight array — the corpus is scanned twice and shuffled
    * never. */
  def importanceScores(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      buckets: Int = 1024): DataFrame = {
    val (w, thr) =
      weightsAndThreshold(featureCounts(docs, isTarget, buckets).collect(), buckets)
    applyImportanceModel(docs, w, thr, buckets).orderBy("doc_id")
  }

  /** The bounded model table behind [[importanceScores]]: per feature
    * bucket, the raw-corpus and target token counts — ≤ `buckets` rows
    * from one partial+final aggregate over the hashed-unigram stream. */
  def featureCounts(docs: DataFrame, isTarget: org.apache.spark.sql.Column,
      buckets: Int = 1024): DataFrame = {
    require(buckets > 0 && (buckets & (buckets - 1)) == 0,
      "buckets must be a power of two (pmod must equal the unsigned low bits)")
    unigramFeatures(docs, isTarget)
      .select(explode(col("fh")).as("h"), col("is_target"))
      .groupBy(pmod(col("h"), lit(buckets.toLong)).as("bucket"))
      .agg(count(lit(1)).as("raw_n"),
        sum(when(col("is_target"), 1L).otherwise(0L)).as("tgt_n"))
  }

  private def unigramFeatures(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column): DataFrame =
    docs.select(col("doc_id"),
        graft.functions.GraftFunctions.word_shingles(col("text"), 1).as("fh"),
        isTarget.as("is_target"))
      .where(col("fh").isNotNull) // zero-token docs carry no features

  /** (bucket, raw_n, tgt_n) rows → (weight array, selection threshold).
    * Unseen buckets smooth to (0+1)·10⁶/(0+1) = 10⁶ — a NEW batch may
    * carry tokens the model corpus never hashed. */
  private def weightsAndThreshold(rows: Array[org.apache.spark.sql.Row],
      buckets: Int): (Array[Long], Long) = {
    val w = Array.fill(buckets)(1000000L)
    var rawTot = 0L; var tgtTot = 0L
    rows.foreach { r =>
      val raw = r.getLong(1); val tgt = r.getLong(2)
      w(r.getLong(0).toInt) = (tgt + 1L) * 1000000L / (raw + 1L)
      rawTot += raw; tgtTot += tgt
    }
    require(rawTot > 0, "model corpus has no tokens")
    (w, tgtTot * 1000L / rawTot * 1000L)
  }

  /** The pure-map scoring tail — NO sort, so it is legal inside a
    * streaming plan (the stream twin orders after the sink). */
  private def applyImportanceModel(batch: DataFrame, w: Array[Long],
      thr: Long, buckets: Int): DataFrame = {
    val wlit = typedLit(w.toSeq)
    val bucketWeight = transform(col("fh"), h =>
      element_at(wlit, (pmod(h, lit(buckets.toLong)) + 1L).cast("int")))
    unigramFeatures(batch, lit(false))
      .withColumn("wsum", aggregate(bucketWeight, lit(0L), (a, x) => a + x))
      .select(col("doc_id"), expr("wsum DIV size(fh)").as("score"))
      .withColumn("selected", col("score") >= thr)
  }

  /** Persist the importance model — the SERVING shape at 100 TB: the
    * expensive two-scan weight estimation runs once over the snapshot
    * corpus, the stored model is one ≤ `buckets`-row parquet table
    * (kilobytes), and every future crawl batch scores against it purely
    * MAP-SIDE via [[scoreWithModel]] — no per-batch corpus re-scan, the
    * same ensure-then-serve cadence as the persisted dedup indexes. The
    * single-table write is one parquet commit; cross-process readers use
    * the [[ensureImportanceModel]] wrapper, which stages through
    * [[Dedup.stageAtomically]] (build-to-temp + atomic rename). */
  def buildImportanceModel(docs: DataFrame,
      isTarget: org.apache.spark.sql.Column, dir: String,
      buckets: Int = 1024): Unit =
    featureCounts(docs, isTarget, buckets)
      .coalesce(1) // ≤ `buckets` rows — one tiny file, not |partitions|
      .write.mode("overwrite").parquet(dir)

  /** Score a new batch against a stored model: a bounded ≤ `buckets`-row
    * read, then one map over the batch — zero shuffles, O(batch) work.
    * Unseen-bucket tokens (vocabulary the snapshot never saw) fall back
    * to the smoothed 10⁶ weight, exactly as an inline build would. */
  def scoreWithModel(batch: DataFrame, dir: String,
      buckets: Int = 1024): DataFrame =
    scoreWithModelUnordered(batch, dir, buckets).orderBy("doc_id")

  /** [[scoreWithModel]] without the presentation sort — the form a
    * STREAMING plan embeds (sorts are illegal under Append mode; the
    * stream twin orders after its sink). */
  def scoreWithModelUnordered(batch: DataFrame, dir: String,
      buckets: Int = 1024): DataFrame = {
    val rows = batch.sparkSession.read.parquet(dir)
      .select("bucket", "raw_n", "tgt_n").collect() // bounded: ≤ `buckets`
    val (w, thr) = weightsAndThreshold(rows, buckets)
    applyImportanceModel(batch, w, thr, buckets)
  }

  /** Fingerprint-staged model over a testdata corpus (target = English),
    * cross-process-safe and stale-proof like the dedup ensure-* fixtures. */
  def ensureImportanceModel(spark: SparkSession, sfDir: String,
      buckets: Int = 1024): String = {
    val dir = Dedup.fingerprintedDir("graft-impmodel", "documents",
      sfDir + buckets, Seq(s"$sfDir/documents.parquet"))
    Dedup.stageAtomically(dir)(tmp =>
      buildImportanceModel(Tables.load(spark, sfDir, "documents"),
        col("lang") === "en", tmp.getPath, buckets))
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "sample_per_group" -> ((s, d) =>
      samplePerGroup(Tables.load(s, d, "documents"), strataCol = "lang")),
    "sample_token_budget" -> ((s, d) =>
      tokenBudgetSample(Tables.load(s, d, "documents"))
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")),
    "sample_split" -> ((s, d) =>
      deterministicSplit(Tables.load(s, d, "documents"))
        .select("doc_id", "split")
        .orderBy("doc_id")),
    // τ=1/2 temperature mix over the language strata: dominant langs
    // damped by the square root of their excess mass
    "sample_temperature" -> ((s, d) =>
      temperatureSample(Tables.load(s, d, "documents"))
        .select("doc_id", "lang", "n_tok")
        .orderBy("doc_id")),
    // rebalance the synthetic corpus's en-heavy mix: keep 25% of en, 90%
    // of every other language — the keep decision is the hash bucket, so
    // the oracle reproduces the exact kept set
    "sample_stratified" -> ((s, d) =>
      stratifiedSample(Tables.load(s, d, "documents"),
        strataCol = "lang", perMille = Map("en" -> 250), defaultPerMille = 900)
        .select("doc_id", "lang")
        .orderBy("doc_id")),
    // DSIR-style selection with target = the English slice: en docs must
    // score above the uniform baseline, non-en below it, purely from the
    // hashed-unigram distribution ratio
    "sample_importance" -> ((s, d) =>
      importanceScores(Tables.load(s, d, "documents"), col("lang") === "en")),
    // the serving path: score a NEW crawl batch (the standard 0.9-truncated
    // perturbation, ids +1M) against the PERSISTED model built from the
    // snapshot — model reuse, not corpus re-estimation; truncation can cut
    // a token mid-word, so the unseen-bucket fallback is genuinely
    // exercised when the fragment hashes to an untouched bucket
    "sample_importance_incr" -> ((s, d) => {
      val dir = ensureImportanceModel(s, d)
      val batch = Tables.load(s, d, "documents").select(
        (col("doc_id") + 1000000L).as("doc_id"),
        expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))")
          .as("text"))
      scoreWithModel(batch, dir)
    }),
  )

  /** The model-estimation CTE chain both importance oracles share (weights
    * + totals from the snapshot corpus, target = lang 'en'): one
    * definition so the inline and the persisted-model entries cannot
    * drift in smoothing, casts, or the threshold formula. */
  private def importanceModelCtes: String =
    s"""feat AS (
       |  SELECT doc_id, CAST(uh % 1024 AS BIGINT) AS bucket
       |  FROM (${HashOracleSql.unigramSql("documents")}) _),
       |cnt AS (
       |  SELECT f.bucket, COUNT(*) AS raw_n,
       |         CAST(SUM(CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n
       |  FROM feat f JOIN documents d USING (doc_id) GROUP BY f.bucket),
       |w AS (SELECT bucket, (tgt_n + 1) * 1000000 // (raw_n + 1) AS wv FROM cnt),
       |tot AS (SELECT CAST(SUM(raw_n) AS BIGINT) AS raw_tot,
       |               CAST(SUM(tgt_n) AS BIGINT) AS tgt_tot FROM cnt)""".stripMargin

  val oracle: Seq[(String, String)] = Seq(
    // the same fifth-bucket hash order as a window; ties cannot occur at
    // this scale (ids are distinct mod 1000003) and would tiebreak by id
    // identically in both engines anyway
    "sample_per_group" ->
      """SELECT lang, CAST(rn AS INT) AS rank, doc_id
        |FROM (SELECT lang, doc_id,
        |             ROW_NUMBER() OVER (PARTITION BY lang
        |               ORDER BY ((doc_id % 1000003) * 374761393) % 1000003 DESC,
        |                        doc_id) AS rn
        |      FROM documents) t
        |WHERE rn <= 5
        |ORDER BY lang, rank""".stripMargin,
    "sample_token_budget" ->
      ("""WITH tok AS (
        |  SELECT doc_id, source,
        |         CAST(len(""" + Tokens.duckToks("text") + """) AS BIGINT) AS n_tok
        |  FROM documents),
        |tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total
        |        FROM tok GROUP BY source),
        |r AS (SELECT source,
        |             least(1000, (SELECT MIN(total) FROM tot) * 1000 // total) AS rate
        |      FROM tot)
        |SELECT t.doc_id, t.source, t.n_tok
        |FROM tok t JOIN r USING (source)
        |WHERE ((t.doc_id % 1000003) * 2246822519) % 1000 < r.rate
        |ORDER BY t.doc_id""").stripMargin,
    // IEEE sqrt is correctly rounded in both engines and the argument is
    // an exact integer <= 1e6, so the floored rate is bit-identical —
    // the pow-free formulation is the whole point (see temperatureSample)
    "sample_temperature" ->
      ("""WITH tok AS (
        |  SELECT doc_id, lang,
        |         CAST(len(""" + Tokens.duckToks("text") + """) AS BIGINT) AS n_tok
        |  FROM documents),
        |tot AS (SELECT lang, CAST(SUM(n_tok) AS BIGINT) AS total
        |        FROM tok GROUP BY lang),
        |r AS (SELECT lang,
        |             least(1000, CAST(floor(sqrt(CAST(
        |               1000 * ((SELECT MIN(total) FROM tot) * 1000 // total)
        |               AS DOUBLE))) AS BIGINT)) AS rate
        |      FROM tot)
        |SELECT t.doc_id, t.lang, t.n_tok
        |FROM tok t JOIN r USING (lang)
        |WHERE ((((t.doc_id % 1000003) * 1597334677) % 1000003) * 2038074743) % 1000 < r.rate
        |ORDER BY t.doc_id""").stripMargin,
    "sample_split" ->
      """SELECT doc_id,
        |       CASE WHEN b < 800 THEN 'train'
        |            WHEN b < 900 THEN 'val'
        |            ELSE 'test' END AS split
        |FROM (SELECT doc_id, ((doc_id % 1000003) * 2654435761) % 1000 AS b
        |      FROM documents) t
        |ORDER BY doc_id""".stripMargin,
    "sample_stratified" ->
      """SELECT doc_id, lang
        |FROM (SELECT doc_id, lang,
        |             ((doc_id % 1000003) * 2246822519) % 1000 AS b
        |      FROM documents) t
        |WHERE b < CASE WHEN lang = 'en' THEN 250 ELSE 900 END
        |ORDER BY doc_id""".stripMargin,
    // the same unigram-hash emulation as the dedup oracles (n = 1 window),
    // bucket = unsigned low 10 bits (== Spark's pmod on a power of two);
    // every SUM casts back to BIGINT — DuckDB SUM(BIGINT) is HUGEINT and
    // would hash-mismatch Spark's Long (the differ's decimal: tag)
    "sample_importance" ->
      s"""WITH $importanceModelCtes,
         |score AS (
         |  SELECT f.doc_id, CAST(CAST(SUM(w.wv) AS BIGINT) // COUNT(*) AS BIGINT) AS score
         |  FROM feat f JOIN w USING (bucket) GROUP BY f.doc_id)
         |SELECT s.doc_id, s.score,
         |       s.score >= (SELECT tgt_tot * 1000 // raw_tot * 1000 FROM tot) AS selected
         |FROM score s ORDER BY s.doc_id""".stripMargin,
    // serving path: the SAME model CTEs, applied to the truncated batch's
    // features; unseen buckets take the smoothed default via the LEFT
    // JOIN + COALESCE (the engine's untouched-array-slot equivalent)
    "sample_importance_incr" ->
      s"""WITH $importanceModelCtes,
         |batch AS (
         |  SELECT doc_id + 1000000 AS doc_id,
         |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.9) AS INT), 1)) AS text
         |  FROM documents),
         |bfeat AS (
         |  SELECT doc_id, CAST(uh % 1024 AS BIGINT) AS bucket
         |  FROM (${HashOracleSql.unigramSql("batch")}) _),
         |score AS (
         |  SELECT f.doc_id,
         |         CAST(CAST(SUM(COALESCE(w.wv, 1000000)) AS BIGINT) // COUNT(*) AS BIGINT) AS score
         |  FROM bfeat f LEFT JOIN w USING (bucket) GROUP BY f.doc_id)
         |SELECT s.doc_id, s.score,
         |       s.score >= (SELECT tgt_tot * 1000 // raw_tot * 1000 FROM tot) AS selected
         |FROM score s ORDER BY s.doc_id""".stripMargin,
  )
}
