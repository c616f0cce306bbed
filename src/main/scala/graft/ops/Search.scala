package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyword relevance search over the document corpus — the inverted-index
  * probe pattern every corpus-curation stack needs next to ANN
  * ([[Similarity]]): given a small set of query terms, rank documents by a
  * tf×rarity score and return the top k. (The reference has no text
  * surface; this is the driver-mandated training-pipeline tier.)
  *
  * Scoring is BM25-shaped but kept in EXACT integer arithmetic on
  * purpose:  score(d) = Σ_t  tf(t,d) · (1_000_000 DIV (df(t)+1)).
  * The reciprocal-df weight is the same rarity signal as log-idf (both
  * are monotone-decreasing in df); dropping the logarithm keeps every
  * intermediate a 64-bit integer, so the DuckDB oracle reproduces the
  * ranking bit-for-bit — no float summation order, no transcendental
  * last-ulp divergence (the knife-edge class earlier rounds designed out
  * of the hash/decimal oracles).
  *
  * Scale shape (the part that must survive 100 TB):
  *  - tokenization + the `term IN queryTerms` filter are MAP-SIDE on the
  *    exploded stream — only matching postings (doc_id, term) ever reach
  *    an exchange, so shuffle volume is the postings of the query terms,
  *    not the corpus token stream;
  *  - tf is a partial+final hash aggregate on (doc_id, term);
  *  - df aggregates tf further — |queryTerms| rows — and joins back
  *    BROADCAST (never a shuffle of the postings against a 5-row side);
  *  - the final per-doc score is another partial+final aggregate, and
  *    top-k plans as TakeOrderedAndProject (per-partition heaps, k-row
  *    driver merge — no global sort).
  * At 100 TB with a real inverted index the postings fetch replaces the
  * scan; everything downstream of `tf` is unchanged.
  */
object Search {

  /** Fixed-point rarity weight: 1e6 DIV (df+1), exact in long arithmetic. */
  private val WeightScale = 1000000L

  def keywordTopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    // the token stream is lowercased, so the probe set must be too — a
    // mixed-case query term would otherwise silently match nothing
    val terms = queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    val postings = docs
      .select(col(idCol), explode(split(lower(col(textCol)), "\\s+")).as("term"))
      .where(col("term").isInCollection(terms))
    val tf = postings.groupBy(idCol, "term").agg(count("*").as("tf"))
    val df = tf.groupBy("term").agg(count("*").as("df")) // docs containing term
    tf.join(broadcast(df), "term")
      .withColumn("w", col("tf") * expr(s"CAST($WeightScale AS BIGINT) DIV (df + 1)"))
      .groupBy(idCol)
      .agg(sum("w").as("score"),
        sum("tf").cast("long").as("total_tf"),
        count("*").cast("long").as("matched_terms"))
      .orderBy(desc("score"), col(idCol))
      .limit(k)
  }

  /** Query terms for the corpus entry: fixed literals so the oracle is a
    * plain SQL IN-list (drawn from the synthetic vocabulary — mid-to-high
    * document frequency, so df weighting actually discriminates). */
  private val CorpusTerms = Seq("vector", "stream", "merge", "window", "filter")

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "search_keyword_topk" -> ((s, d) =>
      keywordTopK(Tables.load(s, d, "documents"), CorpusTerms)),
  )

  val oracle: Seq[(String, String)] = Seq(
    "search_keyword_topk" ->
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(string_split_regex(lower(text), '\s+')) AS term
        |        FROM documents)
        |  WHERE term IN ('vector', 'stream', 'merge', 'window', 'filter')
        |  GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |)
        |SELECT t.doc_id,
        |       CAST(SUM(t.tf * (1000000 // (d.df + 1))) AS BIGINT) AS score,
        |       CAST(SUM(t.tf) AS BIGINT) AS total_tf,
        |       CAST(COUNT(*) AS BIGINT) AS matched_terms
        |FROM tf t JOIN df d USING (term)
        |GROUP BY t.doc_id
        |ORDER BY score DESC, t.doc_id
        |LIMIT 20""".stripMargin,
  )
}
