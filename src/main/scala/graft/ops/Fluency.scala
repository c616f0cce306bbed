package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** CCNet-style language-model fluency scoring (Wenzek et al. 2020,
  * "CCNet: Extracting High Quality Monolingual Datasets from Web Crawl
  * Data" — the public perplexity-filter recipe): score every document by
  * how well a reference-corpus n-gram LM predicts it, so garbled /
  * boilerplate / wrong-register text can be filtered before training.
  * The classic pipeline trains a 5-gram KenLM on a trusted corpus and
  * drops documents above a perplexity percentile; this op is the
  * engine-exact analog — a hashed BIGRAM model over the reference slice,
  * served from a stored table like the DSIR importance model.
  *
  * Exactness discipline (the [[Sampling.importanceScores]] contract):
  * published perplexity is exp of a mean LOG-probability, and log/exp are
  * libm knife edges — not correctly rounded, engine-divergent. The score
  * here is the integer ARITHMETIC mean of per-transition smoothed
  * conditional probabilities in ppm, under stupid backoff
  * (Brants et al. 2007) to the unigram distribution:
  *
  *   p_i = min(10⁶, bi(prev,cur) · 10⁶ div (uni(prev) + 1))   if bi > 0
  *       = (uni(cur) + 1) · 10⁵ div (total + B)               otherwise
  *           (the 10⁵ = 10⁶ · α with the canonical α = 0.4 rounded to
  *            a power-of-ten 0.1 so the backoff stays one integer div)
  *   fluency_ppm = (Σ p_i) div (n_tok − 1)
  *
  * — monotone in the same "the model keeps predicting the next token"
  * signal perplexity filters on, all Long arithmetic, bit-identical in
  * any engine. Overflow headroom mirrors the importance model: the main
  * term is exact while any single bigram bucket holds ≤ 9.2e12
  * transitions, the backoff while the model corpus holds ≤ 9.2e13 tokens
  * — past the 100 TB design point once the buckets spread the mass.
  *
  * Feature hash: the SAME WordShingleHashes chain as the dedup and
  * importance families — n = 1 for unigrams, n = 2 for bigrams — bucketed
  * to powers of two (pmod == unsigned low bits == DuckDB's unsigned %).
  * Bigram position j covers tokens (j, j+1), so the prefix/continuation
  * unigrams are plain array slices: no positional join on the Spark side.
  *
  * Scale shape: the model build is two partial+final aggregates over the
  * hashed token stream to ≤ UniBuckets + BiBuckets rows (the shuffle
  * carries buckets·partitions rows, never the corpus); the stored model
  * is ONE tiny parquet table; scoring a batch is a pure MAP over two
  * plan-literal weight arrays — zero shuffles, zero state, legal inside a
  * streaming plan (the stream twin, [[graft.streaming.EventStreams]]
  * `stream_fluency`, embeds the unordered form). Reference corpus and
  * scored corpus are decoupled exactly as CCNet's wiki-LM vs crawl split:
  * build once per epoch snapshot, serve every crawl batch map-side.
  *
  * The reference engine stops at relational scan/filter/agg pushdown
  * (`reference/README.md:44-87`); corpus-quality scoring is part of the
  * training-data tier this library adds on top.
  */
object Fluency {

  /** Unigram bucket count — shared sizing with the importance model. */
  val UniBuckets = 1024
  /** Bigram bucket count — 16× the unigram space, still a bounded model
    * (≤ 17 408 count rows, kilobytes on disk, ~128 KiB as a plan
    * literal). Both are powers of two by the pmod == low-bits contract. */
  val BiBuckets = 16384

  private def shingles(text: Column, n: Int): Column =
    graft.functions.GraftFunctions.word_shingles(text, n)

  /** The bounded model table: (kind 'uni'|'bi', bucket, n) from two
    * partial+final aggregates over the hashed token/bigram streams.
    * explode(null) for sub-n-token docs yields no rows, so zero- and
    * one-token documents simply contribute nothing. */
  def lmCounts(docs: DataFrame): DataFrame = {
    def side(n: Int, kind: String, buckets: Int) =
      docs.select(explode(shingles(col("text"), n)).as("h"))
        .groupBy(pmod(col("h"), lit(buckets.toLong)).as("bucket"))
        .agg(count(lit(1)).as("n"))
        .select(lit(kind).as("kind"), col("bucket"), col("n"))
    side(1, "uni", UniBuckets).unionByName(side(2, "bi", BiBuckets))
  }

  /** Persist the bigram LM — the SERVING shape at 100 TB: the reference
    * corpus is scanned once per epoch, the model is one ≤ 17 408-row
    * parquet table, and every future crawl batch scores against it purely
    * map-side via [[scoreWithLm]]. Single-table write = one parquet
    * commit; cross-process readers go through [[ensureLmModel]]. */
  def buildLmModel(docs: DataFrame, dir: String): Unit =
    lmCounts(docs)
      .coalesce(1) // ≤ 17 408 rows — one tiny file, not |partitions|
      .write.mode("overwrite").parquet(dir)

  /** (uni weights, bi weights, total model tokens) from the stored rows.
    * Unseen buckets stay 0 — the +1 smoothing lives in the score formula
    * so the stored counts remain raw and auditable. */
  private def arrays(rows: Array[org.apache.spark.sql.Row]): (Array[Long], Array[Long], Long) = {
    val uni = new Array[Long](UniBuckets)
    val bi = new Array[Long](BiBuckets)
    rows.foreach { r =>
      val b = r.getLong(1).toInt
      r.getString(0) match {
        case "uni" => uni(b) = r.getLong(2)
        case _ => bi(b) = r.getLong(2)
      }
    }
    (uni, bi, uni.sum)
  }

  /** The pure-map scoring tail — NO sort, NO shuffle: per document,
    * bigram/prefix/continuation buckets come from array slices of the
    * two shingle streams, probabilities from the two literal weight
    * arrays, and the mean from one aggregate() fold. Documents with
    * fewer than two tokens carry no transitions and are dropped, as in
    * any n-gram scorer. */
  // all divisions are integral (SQL DIV), so the whole score is Long
  // arithmetic end to end — Column./ would be a fractional Divide
  private def uniN(h: String) =
    s"element_at(_uw, cast(pmod($h, $UniBuckets) + 1 as int))"
  private def biN(h: String) =
    s"element_at(_bw, cast(pmod($h, $BiBuckets) + 1 as int))"
  /** Main-path probabilities — null when the bigram bucket is empty ->
    * backoff. Parameterized by the u/b COLUMN NAMES so the standalone
    * scorer and the fused-cascade appender share one formula (exact:
    * bi_b <= 9.2e12). */
  private def mainExpr(u: String, b: String) =
    s"""zip_with($b, slice($u, 1, size($u) - 1), (bh, ph) ->
       |  CASE WHEN ${biN("bh")} > 0L
       |       THEN least(1000000L, ${biN("bh")} * 1000000L DIV (${uniN("ph")} + 1L))
       |       ELSE cast(null as long) END)""".stripMargin
  /** Backoff probabilities (exact: tot <= 9.2e13). */
  private def backoffExpr(u: String) =
    s"""transform(slice($u, 2, size($u) - 1), ch ->
       |  (${uniN("ch")} + 1L) * 100000L DIV (_tot + ${UniBuckets}L))""".stripMargin

  private def applyLm(batch: DataFrame, uni: Array[Long], bi: Array[Long],
      tot: Long): DataFrame =
    batch
      .select(col("doc_id"),
        shingles(col("text"), 1).as("u"), shingles(col("text"), 2).as("b"))
      .where(col("b").isNotNull)
      .withColumn("_uw", typedLit(uni.toSeq))
      .withColumn("_bw", typedLit(bi.toSeq))
      .withColumn("_tot", lit(tot))
      .withColumn("p", expr(s"zip_with(${mainExpr("u", "b")}, ${backoffExpr("u")}, (mn, bk) -> coalesce(mn, bk))"))
      .select(col("doc_id"), size(col("u")).cast("long").as("n_tok"),
        expr("aggregate(p, 0L, (a, x) -> a + x) DIV cast(size(u) - 1 as long)")
          .as("fluency_ppm"))

  /** The stored model's weight arrays — the bounded read
    * [[scoreWithLmUnordered]] performs, exposed for plans that fuse the
    * scoring columns instead of joining a scored frame. */
  private[ops] def lmParams(spark: SparkSession, dir: String)
      : (Array[Long], Array[Long], Long) = {
    val rows = spark.read.parquet(dir)
      .select("kind", "bucket", "n").collect() // bounded: <= 17 408 rows
    val (u, b, tot) = arrays(rows)
    require(tot > 0, "LM model corpus has no tokens")
    (u, b, tot)
  }

  /** Score a new batch against a stored model: a bounded ≤ 17 408-row
    * read, then one map over the batch — zero shuffles, O(batch) work. */
  def scoreWithLm(batch: DataFrame, dir: String): DataFrame =
    scoreWithLmUnordered(batch, dir).orderBy("doc_id")

  /** [[scoreWithLm]] without the presentation sort — the form a STREAMING
    * plan embeds (sorts are illegal under Append mode; the stream twin
    * orders after its sink). */
  def scoreWithLmUnordered(batch: DataFrame, dir: String): DataFrame = {
    val (u, b, tot) = lmParams(batch.sparkSession, dir)
    applyLm(batch, u, b, tot)
  }

  /** Fingerprint-staged model over a testdata corpus (reference slice =
    * English, the trusted-corpus stand-in), cross-process-safe and
    * stale-proof like the dedup ensure-* fixtures. */
  def ensureLmModel(spark: SparkSession, sfDir: String): String = {
    val dir = Dedup.fingerprintedDir("graft-lmmodel", "documents",
      sfDir + UniBuckets + "x" + BiBuckets, Seq(s"$sfDir/documents.parquet"))
    Dedup.stageAtomically(dir)(tmp =>
      buildLmModel(
        Tables.load(spark, sfDir, "documents").filter(col("lang") === "en"),
        tmp.getPath))
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // every doc scored against the persisted English-reference bigram LM
    // — the CCNet serving split (wiki LM, crawl batch)
    "text_fluency" -> ((s, d) =>
      scoreWithLm(Tables.load(s, d, "documents"), ensureLmModel(s, d))))

  /** The scoring emulation as spliceable CTEs, ending in
    * `flu(doc_id, n_tok, fluency_ppm)`: the same hash chains
    * ([[HashOracleSql]] unigram + bigram emulation in HUGEINT mod-2^64
    * arithmetic), the same integer score formula; HUGEINT results cast
    * to BIGINT so the strict differ sees Spark's types. Positional join
    * (si, si+1) mirrors the Spark side's array-slice alignment. The
    * model side is ALWAYS the raw English reference slice (the CCNet
    * trusted-corpus split); only the scored relation is parameterized —
    * the standalone entry scores `documents`, the curate cascade scores
    * its spam-planted input through the SAME text. */
  private[ops] def scoreCtes(scoreSrc: String): String =
    s"""mdocs AS (SELECT doc_id, text FROM documents WHERE lang = 'en'),
       |muni AS (SELECT uh % $UniBuckets AS b, CAST(COUNT(*) AS BIGINT) AS n
       |         FROM (${HashOracleSql.unigramSql("mdocs")}) GROUP BY 1),
       |mbi AS (SELECT bh % $BiBuckets AS b, CAST(COUNT(*) AS BIGINT) AS n
       |        FROM (${HashOracleSql.bigramSql("mdocs")}) GROUP BY 1),
       |mtot AS (SELECT CAST(SUM(n) AS BIGINT) AS tot FROM muni),
       |suni AS (SELECT doc_id, i, uh % $UniBuckets AS ub
       |         FROM (${HashOracleSql.unigramSql(scoreSrc)})),
       |sbi AS (SELECT doc_id, si, bh % $BiBuckets AS bb
       |        FROM (${HashOracleSql.bigramSql(scoreSrc)})),
       |p AS (
       |  SELECT s.doc_id, s.si,
       |         CASE WHEN COALESCE(mb.n, 0) > 0
       |              THEN least(1000000, mb.n * 1000000 // (COALESCE(mup.n, 0) + 1))
       |              ELSE (COALESCE(muc.n, 0) + 1) * 100000
       |                   // ((SELECT tot FROM mtot) + $UniBuckets)
       |         END AS pv
       |  FROM sbi s
       |  JOIN suni su ON su.doc_id = s.doc_id AND su.i = s.si
       |  JOIN suni cu ON cu.doc_id = s.doc_id AND cu.i = s.si + 1
       |  LEFT JOIN mbi mb ON mb.b = s.bb
       |  LEFT JOIN muni mup ON mup.b = su.ub
       |  LEFT JOIN muni muc ON muc.b = cu.ub),
       |flu AS (
       |  SELECT doc_id, CAST(MAX(si) + 1 AS BIGINT) AS n_tok,
       |         CAST(SUM(pv) // COUNT(*) AS BIGINT) AS fluency_ppm
       |  FROM p GROUP BY doc_id)""".stripMargin

  val oracle: Seq[(String, String)] = Seq(
    "text_fluency" ->
      s"""WITH ${scoreCtes("documents")}
         |SELECT doc_id, n_tok, fluency_ppm FROM flu ORDER BY doc_id""".stripMargin)
}
