package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions.url_normalize

/** URL-level crawl deduplication — the FIRST dedup tier of a real crawl
  * pipeline, upstream of every content hash: the same page arrives under
  * case-mangled hosts, default ports, tracking parameters, reordered
  * queries, and fragments, and all of them must collapse to one fetch
  * identity before any text-level pass spends work on them. The key is
  * [[graft.functions.NormalizeUrl]] (codegen'd, per-row); the dedup is a
  * plain hash aggregate on the key.
  *
  * Scale shape: normalization is map-side inside whole-stage codegen;
  * the dedup is ONE partial+final aggregate keyed by the normalized URL
  * (the [[Dedup.exact]] regime — the shuffle carries one row per
  * distinct key per partition, never the fetch log); the keeper pick
  * rides the same aggregate as the count (min id), so a 100 TB fetch log
  * is one scan + one exchange of keys.
  *
  * Both entries synthesize their fetch-log fixture from `documents` with
  * the SAME concat rule the oracle uses, so the oracle derives expected
  * outputs from the planting rule in pure SQL (the WARC-ingest pattern)
  * rather than reimplementing the normalizer. */
object Urls {

  /** One messy fetch per document, variant by doc_id mod 3: tracking-only
    * query on an upper-cased host / reordered params + tracking + fragment
    * / explicit default port. */
  private def messyUrls(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), expr(
      """CASE CAST(doc_id % 3 AS INT)
        |  WHEN 0 THEN concat('HTTP://EXAMPLE.com/doc/', cast(doc_id as string), '?utm_source=feed')
        |  WHEN 1 THEN concat('http://example.com/doc/', cast(doc_id as string), '?b=2&a=1&utm_campaign=x#s')
        |  ELSE concat('http://example.com:80/doc/', cast(doc_id as string))
        |END""".stripMargin).as("url"))

  /** Two fetches of every page under DIFFERENT mess (upper-case host +
    * tracking vs default port + click-ids + fragment): both must collapse
    * to the same key, with the original id as keeper. Shared with the
    * composed crawl gate ([[Curation]] `e2e_crawl_to_chunks`). */
  private[ops] def fetchLog(docs: DataFrame): DataFrame =
    // single-pass fan-out (r20): both fetch variants of a document from ONE
    // evaluation of its row — the unionAll form re-derived the source per
    // branch (two WARC parses in the crawl composition, two scans here).
    // Tag-explode keeps column pruning intact (see Dedup.withPlantedNearDups).
    docs.select(col("doc_id"), explode(typedlit(Seq(0L, 1L))).as("__v"))
      .select(
        (col("doc_id") + col("__v") * 1000000L).as("fetch_id"),
        when(col("__v") === 0L, expr(
          "concat('HTTP://EXAMPLE.com/doc/', cast(doc_id as string), '?utm_source=feed')"))
          .otherwise(expr(
            "concat('http://example.com:80/doc/', cast(doc_id as string), '?fbclid=1&gclid=2#x')"))
          .as("url"))

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "url_normalize" -> ((s, d) =>
      messyUrls(Tables.load(s, d, "documents"))
        .select(col("doc_id"), col("url"), url_normalize(col("url")).as("url_norm"))
        .orderBy("doc_id")),
    "dedup_url" -> ((s, d) =>
      fetchLog(Tables.load(s, d, "documents"))
        .groupBy(url_normalize(col("url")).as("url_norm"))
        .agg(count(lit(1)).as("n_fetches"), min(col("fetch_id")).as("keeper"))
        .orderBy("url_norm")))

  val oracle: Seq[(String, String)] = Seq(
    // the same concat rule, with the expected normalization spelled out
    // per variant — rule 1+4 (case, tracking-only query drops its '?'),
    // rule 4+5+3 (tracking dropped, rest sorted, fragment dropped),
    // rule 2 (default port stripped)
    "url_normalize" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INT)
        |         WHEN 0 THEN 'HTTP://EXAMPLE.com/doc/' || CAST(doc_id AS VARCHAR) || '?utm_source=feed'
        |         WHEN 1 THEN 'http://example.com/doc/' || CAST(doc_id AS VARCHAR) || '?b=2&a=1&utm_campaign=x#s'
        |         ELSE 'http://example.com:80/doc/' || CAST(doc_id AS VARCHAR)
        |       END AS url,
        |       'http://example.com/doc/' || CAST(doc_id AS VARCHAR) ||
        |       CASE WHEN CAST(doc_id % 3 AS INT) = 1 THEN '?a=1&b=2' ELSE '' END AS url_norm
        |FROM documents ORDER BY doc_id""".stripMargin,
    "dedup_url" ->
      """SELECT 'http://example.com/doc/' || CAST(doc_id AS VARCHAR) AS url_norm,
        |       CAST(2 AS BIGINT) AS n_fetches, doc_id AS keeper
        |FROM documents ORDER BY url_norm""".stripMargin)
}
