package graft.ops

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** End-to-end training-data curation — the COMPOSED form of the pipeline
  * the individual oracle entries pin piecewise: quality gate
  * ([[TextAnalysis.qualityScores]] thresholds) → exact dedup keep-first
  * (content-hash groupBy, [[Dedup.exact]]'s mechanics) → deterministic
  * train/val/test split ([[Sampling.deterministicSplit]]) → bounded
  * per-(lang, split) accounting. A user of the reference curating a
  * pretraining corpus runs exactly this chain; the composite entry proves
  * the pieces compose into ONE declarative plan, not four jobs.
  *
  * Scale shape: the gate is map-only and fuses into the scan; the dedup
  * is one shuffle on a 32-byte content hash (never the text) with
  * partial-aggregating `min_by`, so the keep-first decision needs no
  * second join; the split is a pure map on the kept id; the accounting
  * aggregate is bounded by |langs| × 3. Nothing is driver-side,
  * all-pairs, or text-keyed.
  *
  * The synthetic corpus has no exact duplicates (verified in
  * [[Dedup.withPlantedNearDups]]), so — as for the near-dup entries —
  * every document gets an exact planted copy under `doc_id + 1_000_000`;
  * the dedup stage must remove precisely those, visible as
  * `dups_removed`, or the entry is vacuous. */
object Curation {

  /** Exact planted copies under `doc_id + 1_000_000` — ENTRY scaffolding
    * (the production pipeline curates real data with real duplicates; the
    * synthetic corpus needs them planted to exercise the dedup stage). */
  def withPlantedExactDups(docs: DataFrame): DataFrame = {
    val base = docs.select(col("doc_id"), col("text"), col("lang"))
    base.unionAll(base.select(
      (col("doc_id") + 1000000L).as("doc_id"), col("text"), col("lang")))
  }

  def curate(docs: DataFrame, minTokens: Int = 20, maxTokens: Int = 2000,
      minQuality: Double = 0.5): DataFrame = {
    val gated = TextAnalysis.qualityScores(
      docs.select(col("doc_id"), col("text"), col("lang")),
      keep = Seq("lang", "text"))
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("quality_score") >= minQuality)
      .select(col("doc_id"), col("lang"), col("text"),
        col("n_tokens"), col("quality_score"))
    val kept = gated
      .groupBy(sha2(col("text"), 256).as("content_hash"))
      .agg(
        min_by(struct(col("doc_id"), col("lang"), col("n_tokens"),
          col("quality_score")), col("doc_id")).as("r"),
        count(lit(1)).as("n_copies"))
      .select(col("r.doc_id").as("doc_id"), col("r.lang").as("lang"),
        col("r.n_tokens").as("n_tokens"),
        col("r.quality_score").as("quality_score"), col("n_copies"))
    Sampling.deterministicSplit(kept)
      .groupBy(col("lang"), col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_copies") - 1).as("dups_removed"),
        sum(col("n_tokens")).as("sum_tokens"),
        round(avg(col("quality_score")), 6).as("avg_quality"))
      .orderBy("lang", "split")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "curate_corpus" -> ((s, d) =>
      curate(withPlantedExactDups(Tables.load(s, d, "documents")))))

  /** DuckDB mirror: quality metrics once per SOURCE document (planted
    * copies share their source's text, hence its metrics), the same gate,
    * keep-first via `arg_min` per text (the engine hashes the text first
    * — SHA-256-collision-equivalent), the same split arithmetic as the
    * `sample_split` oracle, and every SUM cast back to BIGINT (DuckDB
    * sums to HUGEINT, the round-1 incident class). */
  val oracle: Seq[(String, String)] = Seq(
    "curate_corpus" ->
      s"""WITH q AS (${TextAnalysis.textQualityOracleSql}),
         |g AS (
         |  SELECT u.doc_id, u.lang, u.text, q.n_tokens, q.quality_score
         |  FROM (SELECT doc_id, doc_id AS src_id, text, lang FROM documents
         |        UNION ALL
         |        SELECT doc_id + 1000000, doc_id, text, lang FROM documents) u
         |  JOIN q ON q.doc_id = u.src_id
         |  WHERE q.n_tokens BETWEEN 20 AND 2000 AND q.quality_score >= 0.5),
         |k AS (
         |  SELECT MIN(doc_id) AS doc_id,
         |         arg_min(lang, doc_id) AS lang,
         |         arg_min(n_tokens, doc_id) AS n_tokens,
         |         arg_min(quality_score, doc_id) AS quality_score,
         |         COUNT(*) AS n_copies
         |  FROM g GROUP BY text),
         |s AS (
         |  SELECT k.*,
         |         CASE WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 800 THEN 'train'
         |              WHEN ((doc_id % 1000003) * 2654435761) % 1000 < 900 THEN 'val'
         |              ELSE 'test' END AS split
         |  FROM k)
         |SELECT lang, split, COUNT(*) AS n_docs,
         |       CAST(SUM(n_copies - 1) AS BIGINT) AS dups_removed,
         |       CAST(SUM(n_tokens) AS BIGINT) AS sum_tokens,
         |       ROUND(AVG(quality_score), 6) AS avg_quality
         |FROM s GROUP BY lang, split ORDER BY lang, split""".stripMargin)
}
