package graft.ops

import graft.Tables
import graft.functions.GraftFunctions._
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

  /** Lowercased, deduplicated, validated probe set shared by every query
    * path. Blank terms are rejected rather than matched: the scan path
    * tokenizes with bare `split` (which can emit "" on leading
    * whitespace) while the index drops empties at build — a blank query
    * term is the one input that could make the two paths disagree, so it
    * is ruled out at the contract. */
  private def probeTerms(queryTerms: Seq[String]): Seq[String] = {
    require(queryTerms.nonEmpty, "queryTerms must be non-empty")
    require(queryTerms.forall(_.trim.nonEmpty),
      s"query terms must be non-blank, got ${queryTerms.mkString("[", ", ", "]")}")
    // the token stream is lowercased, so the probe set must be too — a
    // mixed-case query term would otherwise silently match nothing
    queryTerms.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
  }

  /** Per-document lexical scores — the aggregation half of
    * [[keywordTopK]], shared with the hybrid-fusion leg: (id, score,
    * total_tf, matched_terms), unordered and unlimited. */
  def keywordScores(docs: DataFrame, queryTerms: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val terms = probeTerms(queryTerms)
    val postings = docs
      .select(col(idCol), explode(split(lower(col(textCol)), Tokens.WsRun)).as("term"))
      .where(col("term").isInCollection(terms))
    val tf = postings.groupBy(idCol, "term").agg(count("*").as("tf"))
    scoreTf(tf, idCol)
  }

  /** Scoring tail shared by the corpus-scan path and the persisted-index
    * probe: tf rows (idCol, term, tf) restricted to the query terms →
    * per-doc exact integer scores. df aggregates the tf rows further
    * (|queryTerms| rows, broadcast back), so index and scan paths score
    * identically by construction. */
  private def scoreTf(tf: DataFrame, idCol: String): DataFrame = {
    val df = tf.groupBy("term").agg(count("*").as("df")) // docs containing term
    tf.join(broadcast(df), "term")
      .withColumn("w", col("tf") * expr(s"CAST($WeightScale AS BIGINT) DIV (df + 1)"))
      .groupBy(idCol)
      .agg(sum("w").as("score"),
        sum("tf").cast("long").as("total_tf"),
        count("*").cast("long").as("matched_terms"))
  }

  def keywordTopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    keywordScores(docs, queryTerms, textCol, idCol)
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** BM25-shaped relevance (Robertson/Spärck Jones's Okapi form) in EXACT
    * long arithmetic — the doc-length normalization [[keywordScores]]'s
    * plain tf×rarity lacks (a term hit in a 20-token doc should outrank
    * the same hit in a 2000-token doc). With k1 = 6/5 and b = 3/4 the
    * per-term Okapi factor tf·(k1+1) / (tf + k1(1−b) + k1·b·dl/avgdl)
    * clears to integers when multiplied through by 10·avgdl:
    *
    *   w = (idf · 22 · tf · avgdl) DIV (10·tf·avgdl + 3·avgdl + 9·dl)
    *
    * where idf = 1e6 DIV (df+1) (the suite's monotone reciprocal-df
    * rarity), dl = the doc's [[Tokens.seg]] count and avgdl = corpus mean
    * dl as integer division — every quantity a long, so the DuckDB
    * oracle reproduces the ranking bit-for-bit (libm-free, the suite's
    * exact-integer scoring regime). Overflow headroom: the numerator is
    * ≤ 1e6·22·tf·avgdl, safe while tf·avgdl < 4·10¹¹ — e.g. tf ≤ 4·10⁸
    * at avgdl 1000, far past any real document.
    *
    * Scale shape: identical to [[keywordScores]] (map-side postings
    * filter on the query terms, partial+final tf aggregate, broadcast
    * |terms|-row df) plus dl carried alongside each posting (a long per
    * row, grouped with the doc key — no extra exchange) and ONE scalar
    * avgdl aggregate crossing as a broadcast 1-row side. At 100 TB the
    * postings index supplies (term, doc, tf) and dl/avgdl come from
    * stored per-doc length metadata; the formula tail is unchanged. */
  def bm25Scores(docs: DataFrame, queryTerms: Seq[String],
      textCol: String = "text", idCol: String = "doc_id"): DataFrame = {
    val terms = probeTerms(queryTerms)
    val toks = docs.select(col(idCol),
      split(lower(col(textCol)), Tokens.WsRun).as("toks"),
      graft.functions.GraftFunctions.seg_count(col(textCol)).as("dl"))
    val avgdl = toks.agg(
      expr("CAST(sum(dl) AS BIGINT) DIV count(*)").as("avgdl"))
    val postings = toks
      .select(col(idCol), col("dl"), explode(col("toks")).as("term"))
      .where(col("term").isInCollection(terms))
    val tf = postings.groupBy(idCol, "dl", "term").agg(count("*").as("tf"))
    bm25Tail(tf, avgdl, idCol)
  }

  /** The cleared-to-integers Okapi weight — ONE definition shared by the
    * corpus-scan and index-fed paths so their rankings cannot drift. */
  private val OkapiWeightSql =
    s"((CAST($WeightScale AS BIGINT) DIV (df + 1)) * 22 * tf * avgdl)" +
      " DIV (10 * tf * avgdl + 3 * avgdl + 9 * dl)"

  /** BM25 scoring tail over tf rows (idCol, dl, term, tf): df broadcast
    * back, the scalar avgdl crossed as a broadcast 1-row side, weights
    * summed per doc — shared by [[bm25Scores]] and
    * [[bm25PostingsIndex]]. */
  private def bm25Tail(tf: DataFrame, avgdl: DataFrame,
      idCol: String): DataFrame = {
    val df = tf.groupBy("term").agg(count("*").as("df"))
    tf.join(broadcast(df), "term")
      .crossJoin(broadcast(avgdl))
      .withColumn("w", expr(OkapiWeightSql))
      .groupBy(idCol)
      .agg(sum("w").as("score"),
        sum("tf").cast("long").as("total_tf"),
        count("*").cast("long").as("matched_terms"))
  }

  def bm25TopK(docs: DataFrame, queryTerms: Seq[String], k: Int = 20,
      textCol: String = "text", idCol: String = "doc_id"): DataFrame =
    bm25Scores(docs, queryTerms, textCol, idCol)
      .orderBy(desc("score"), col(idCol))
      .limit(k)

  /** Hybrid lexical+vector retrieval fused by reciprocal-rank fusion
    * (Cormack/Clarke/Buettcher, SIGIR'09): each leg ranks independently,
    * and a document's fused score is Σ_legs 1/(K + rank). Kept in EXACT
    * integer arithmetic like the lexical score — w(rank) = 1e6 DIV
    * (K + rank) — so the DuckDB oracle reproduces the fusion ordering
    * bit-for-bit (reciprocal weights are monotone in rank, so the integer
    * form preserves RRF's ordering semantics per leg).
    *
    * Query-by-example semantics: the vector leg probes the corpus with
    * the stored embedding of `queryVecId` (the exemplar itself surfacing
    * at vector rank 1 is expected and kept — the oracle does the same).
    *
    * Scale shape: the lexical leg is [[keywordScores]] (map-side postings
    * filter, partial+final aggregates); the vector leg is one corpus scan
    * × a broadcast 1-row query vector; BOTH legs collapse through the
    * bounded [[graft.functions.Aggregators.TopK]] heap (per-task partial
    * heaps, one legK-row merge — never a global sort or a full-corpus
    * window), so the fusion join sees two ≤legK-row frames. Ranks use
    * TopK's (score DESC, id ASC) total order — the same tie rule as the
    * standalone legs. Absent-from-leg is encoded as rank 0 / weight 0
    * (not NULL), keeping the output hash-stable. */
  def hybridTopK(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
      queryVecId: Long = 0L, k: Int = 20, legK: Int = 50, rrfK: Int = 60,
      textCol: String = "text", idCol: String = "doc_id",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    hybridFromLexScores(keywordScores(docs, queryTerms, textCol, idCol),
      emb, queryVecId, k, legK, rrfK, idCol, vecIdCol, vecCol)

  /** [[hybridTopK]] with the BM25 lexical leg — the standard production
    * pairing (length-normalized lexical + dense vector under RRF): same
    * fusion tail, only the lexical scorer swaps, so the two hybrids
    * differ exactly as [[bm25Scores]] differs from [[keywordScores]].
    * Where tf×rarity ranks a long document above a short one with the
    * same hit density, the BM25 leg reverses it — fused output included
    * (spec-pinned). */
  def hybridTopKBm25(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
      queryVecId: Long = 0L, k: Int = 20, legK: Int = 50, rrfK: Int = 60,
      textCol: String = "text", idCol: String = "doc_id",
      vecIdCol: String = "vec_id", vecCol: String = "embedding"): DataFrame =
    hybridFromLexScores(bm25Scores(docs, queryTerms, textCol, idCol),
      emb, queryVecId, k, legK, rrfK, idCol, vecIdCol, vecCol)

  /** [[hybridTopK]] with the lexical leg served from a PERSISTED postings
    * index instead of a corpus scan — the composed retrieval stack at
    * 100 TB: the lexical tf rows come term-pruned from the index and the
    * fusion half is byte-identical by construction ([[scoreTf]] + the
    * shared fusion tail), so the entry shares [[hybridTopK]]'s oracle —
    * the index is a drop-in for the scan inside the composed pipeline,
    * proven at the gate, not argued. */
  def hybridTopKIndexed(spark: SparkSession, idxDir: String, emb: DataFrame,
      queryTerms: Seq[String], queryVecId: Long = 0L, k: Int = 20,
      legK: Int = 50, rrfK: Int = 60, vecIdCol: String = "vec_id",
      vecCol: String = "embedding"): DataFrame =
    hybridFromLexScores(scoreTf(probeTf(spark, idxDir, queryTerms), "doc_id"),
      emb, queryVecId, k, legK, rrfK, "doc_id", vecIdCol, vecCol)

  /** The index-probe head shared by [[queryPostingsIndex]] and the
    * hybrid's indexed lexical leg: validated terms -> term-pruned tf rows
    * from the live epochs. One definition so the standalone probe and
    * the composed leg cannot drift. */
  private def probeTf(spark: SparkSession, dir: String,
      queryTerms: Seq[String]): DataFrame = {
    val terms = probeTerms(queryTerms)
    Dedup.readEpochs(spark, dir, "postings")
      .where(col("term").isInCollection(terms))
  }

  /** [[hybridTopK]] with the APPROXIMATE vector leg — the deterministic
    * IVF probe ([[Similarity.ivfTopK]]) instead of the brute corpus
    * scan: the serving configuration at 100 TB, where the vector leg
    * touches only the probed clusters' candidates (sub-linear) and the
    * lexical leg is the postings shape. Semantics differ from the brute
    * hybrid exactly as IVF differs from brute: the exemplar itself is
    * EXCLUDED (ivfTopK's `vec_id =!= qid` contract) and recall is
    * approximate — both mirrored in the oracle, which rebuilds the same
    * deterministic IVF construction in SQL (maximin-seeded centroids,
    * top-spill assignment, nprobe cluster probe, candidate dedup). */
  def hybridTopKAnn(docs: DataFrame, emb: DataFrame, queryTerms: Seq[String],
      queryVecId: Long = 0L, k: Int = 20, legK: Int = 50, rrfK: Int = 60,
      nprobe: Int = 3, textCol: String = "text",
      idCol: String = "doc_id"): DataFrame = {
    require(queryVecId == 0L,
      "the single-exemplar IVF leg selects its query set as vec_id % every == 0; " +
        "only exemplar 0 is expressible under that contract")
    val lex = rankedLeg(keywordScores(docs, queryTerms, textCol, idCol),
      "score", idCol, idCol, "lex_rank", legK)
    // every = Long.MaxValue ⇒ the query set is exactly {vec_id 0}
    val vec = Similarity.ivfTopK(emb, k = legK, every = Long.MaxValue,
        nprobe = nprobe)
      .filter(col("qid") === queryVecId)
      .select(col("vec_id").as(idCol), col("rank").cast("long").as("vec_rank"))
    fuseLegs(lex, vec, k, rrfK, idCol)
  }

  /** One leg → (idCol, rankName): global TopK heap, ranks from the
    * heap's sorted output ((score DESC, id ASC) total order). Lexical
    * scores are longs ≤ ~5e6·terms, exact in the heap's Double
    * (< 2^53). */
  private def rankedLeg(scored: DataFrame, scoreCol: String,
      legIdCol: String, idCol: String, rankName: String,
      legK: Int): DataFrame = {
    val topk = udaf(new graft.functions.Aggregators.TopK(legK),
      org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.Scored])
    scored.filter(col(scoreCol).isNotNull)
      .groupBy()
      .agg(topk(col(scoreCol).cast("double"), col(legIdCol).cast("long")).as("top"))
      .select(posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("s.id").as(idCol), (col("pos") + 1).cast("long").as(rankName))
  }

  /** The RRF join shared by every hybrid variant: two (id, rank) legs →
    * integer reciprocal-rank fusion, absent-from-leg as rank 0. */
  private def fuseLegs(lex: DataFrame, vec: DataFrame, k: Int, rrfK: Int,
      idCol: String): DataFrame =
    lex.join(vec, Seq(idCol), "full_outer")
      .na.fill(0L, Seq("lex_rank", "vec_rank"))
      .withColumn("rrf_score",
        when(col("lex_rank") > 0,
          expr(s"$WeightScale DIV ($rrfK + lex_rank)")).otherwise(lit(0L)) +
        when(col("vec_rank") > 0,
          expr(s"$WeightScale DIV ($rrfK + vec_rank)")).otherwise(lit(0L)))
      .select(col(idCol), col("rrf_score"), col("lex_rank"), col("vec_rank"))
      .orderBy(desc("rrf_score"), col(idCol))
      .limit(k)

  /** The fusion machinery shared by the scan-fed and index-fed hybrids:
    * rank both legs through the bounded TopK heap, join the ≤legK-row
    * frames, weight with integer reciprocal ranks. */
  private def hybridFromLexScores(lexScores: DataFrame, emb: DataFrame,
      queryVecId: Long, k: Int, legK: Int, rrfK: Int, idCol: String,
      vecIdCol: String, vecCol: String): DataFrame = {
    val lex = rankedLeg(lexScores, "score", idCol, idCol, "lex_rank", legK)
    val qv = exemplar(emb, queryVecId, vecIdCol, vecCol)
    val vecScored = emb.crossJoin(broadcast(qv))
      .select(col(vecIdCol), cosine_f32(col(vecCol), col("qvec")).as("cosine"))
    val vec = rankedLeg(vecScored, "cosine", vecIdCol, idCol, "vec_rank", legK)
    fuseLegs(lex, vec, k, rrfK, idCol)
  }

  /** The validated 1-row exemplar vector. Fail fast on a missing OR
    * duplicated id (limit(2) so the count can distinguish both failure
    * shapes): a silent empty vector leg would return a plausible-looking
    * lexical-only ranking, and a duplicated vec_id would double every
    * cosine row into the heap. */
  private def exemplar(emb: DataFrame, queryVecId: Long,
      vecIdCol: String, vecCol: String): DataFrame = {
    val qv = emb.filter(col(vecIdCol) === queryVecId).select(col(vecCol).as("qvec"))
    val nExemplars = qv.limit(2).count()
    require(nExemplars == 1,
      s"queryVecId $queryVecId must match exactly one embedding row, " +
        s"found ${if (nExemplars == 0) "none" else "more than one"}")
    qv
  }

  // ---- persisted inverted postings index ---------------------------

  /** Persisted inverted postings index — the LEXICAL sibling of the
    * MinHash / embedding-LSH incremental indexes, on the same
    * epoch-commit store (crash-consistent appends, atomic
    * supersedes-compaction, snapshot-expiry reclaim — see the epoch
    * note in [[Dedup]]): `dir/postings/ep_*` = (doc_id, term, tf)
    * pre-aggregated per document, clustered by term so a probe's
    * `term IN (…)` predicate prunes parquet row groups.
    *
    * This is the 100 TB form promised in this file's header: the probe
    * reads ONLY the queried terms' postings — the corpus scan + explode
    * disappears — and everything downstream of tf ([[scoreTf]]) is
    * SHARED with the scan path, so the two paths cannot drift. Empty
    * terms are dropped at build (query terms are non-empty by the
    * lowercased-probe contract, so scoring is unaffected). */
  def buildPostingsIndex(docs: DataFrame, dir: String,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val prior = Dedup.committedEpochs(dir)
    val id = Dedup.newEpochId()
    writePostings(docs, dir, id, textCol, idCol)
    Dedup.commitEpoch(dir, id, supersedes = prior)
  }

  /** One O(batch) epoch, history untouched; crash-invisible, retry-safe
    * (the append contract shared with [[Dedup.appendToMinhashIndex]]).
    * Caller contract: doc ids disjoint from the index. */
  def appendToPostingsIndex(docs: DataFrame, dir: String,
      textCol: String = "text", idCol: String = "doc_id"): Unit = {
    val id = Dedup.newEpochId()
    writePostings(docs, dir, id, textCol, idCol)
    Dedup.commitEpoch(dir, id)
  }

  /** Idempotent per-micro-batch append for streaming maintenance: the
    * epoch id IS the batch tag (deterministic), so exactly-once holds by
    * construction against all three at-least-once failure shapes —
    * (a) a redelivered batch finds its tag in the committed-or-superseded
    * set and is skipped (the set survives compaction: the merged marker
    * carries superseded tags until reclaim, whose safety window requires
    * the redelivery horizon to have passed); (b) a zombie-driver race
    * where two drivers replay the same batch is settled atomically by
    * the marker hard-link in [[Dedup.commitEpoch]] — exactly one wins,
    * the loser lands as skipped (its data files are superseded-invisible
    * and reclaimed as garbage); (c) a crash mid-append leaves an
    * uncommitted epoch the retry overwrites. Same contract caveat as
    * [[graft.streaming.ExactlyOnceSink]]: batch ids are unique per
    * CHECKPOINT, so one index dir belongs to one logical stream.
    * Returns true when this call landed the batch. */
  def appendPostingsBatch(batch: DataFrame, dir: String, batchId: Long,
      textCol: String = "text", idCol: String = "doc_id"): Boolean = {
    val tag = f"b$batchId%06d"
    if (Dedup.committedOrSupersededEpochs(dir).contains(tag)) false
    else {
      writePostings(batch, dir, tag, textCol, idCol)
      try { Dedup.commitEpoch(dir, tag); true }
      catch { case _: IllegalStateException => false } // raced: other won
    }
  }

  /** One epoch of ALL THREE index tables (the marker in the caller
    * commits them together): `postings/ep_<id>` = (doc_id, term, tf)
    * clustered by term; `doclen/ep_<id>` = (doc_id, dl) — the per-doc
    * [[Tokens.seg]] length BM25's normalization needs, stored at build so
    * an index-fed BM25 never re-reads corpus text (16 B/row, streamed
    * map-side against a broadcast of the tiny query-term tf); and
    * `stats/ep_<id>` = ONE (n_docs, sum_dl) row, so avgdl at query time
    * is an O(epochs)-row read — at 100 TB a per-query scan of the
    * corpus-sized doclen table just to average it would dwarf the probe
    * itself. Integer sums are associative, so summing the per-epoch
    * partials before the single division yields exactly the whole-corpus
    * `sum(dl) DIV count(*)` the scan path computes. */
  private def writePostings(docs: DataFrame, dir: String, id: String,
      textCol: String, idCol: String): Unit = {
    docs.select(col(idCol).as("doc_id"),
        explode(split(lower(col(textCol)), Tokens.WsRun)).as("term"))
      .where(length(col("term")) > 0)
      .groupBy("doc_id", "term").agg(count("*").as("tf"))
      .repartition(col("term"))
      .sortWithinPartitions("term", "doc_id")
      .write.mode("overwrite").parquet(s"$dir/postings/ep_$id")
    val doclens = docs.select(col(idCol).as("doc_id"),
      graft.functions.GraftFunctions.seg_count(col(textCol)).as("dl"))
    doclens.write.mode("overwrite").parquet(s"$dir/doclen/ep_$id")
    doclens.agg(count("*").as("n_docs"),
        expr("CAST(sum(dl) AS BIGINT)").as("sum_dl"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$dir/stats/ep_$id")
  }

  /** Merge accrued crawl epochs into one, re-clustered by term (the
    * probe's pruning key); identical probe results before and after.
    * ALL tables merge under the one supersedes marker — compacting only
    * postings would make the superseded epochs' doclen/stats rows
    * invisible. Stats rows stay per-partial (k tiny rows after merging k
    * epochs — summed at read, so compaction needs no arithmetic). */
  def compactPostingsIndex(spark: SparkSession, dir: String): Int =
    Dedup.compactEpochs(spark, dir,
      Seq("postings" -> Seq("term"), "doclen" -> Seq("doc_id"),
        "stats" -> Seq("n_docs")))

  /** Top-k keyword search against the stored index ≡ [[keywordTopK]]
    * over the indexed corpus (shared scoring tail; equality is the
    * `search_incr_postings` oracle — the SAME SQL as the scan entry). */
  def queryPostingsIndex(spark: SparkSession, dir: String,
      queryTerms: Seq[String], k: Int = 20): DataFrame =
    scoreTf(probeTf(spark, dir, queryTerms), "doc_id")
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)

  /** Top-k BM25 against the stored index ≡ [[bm25TopK]] over the indexed
    * corpus: tf comes from the term-pruned postings probe, dl from the
    * stored `doclen` table (never corpus text), avgdl as one integer
    * aggregate over it. The doclen join streams the 16 B/row table
    * map-side against a BROADCAST of the tiny query-term tf frame, and
    * the weight/aggregate tail is [[bm25Tail]] — shared with the scan
    * path by construction, so the `search_bm25_indexed` oracle is the
    * scan entry's SQL verbatim and any index/scan drift hash-mismatches
    * at the gate. */
  def bm25PostingsIndex(spark: SparkSession, dir: String,
      queryTerms: Seq[String], k: Int = 20): DataFrame = {
    val doclens = Dedup.readEpochs(spark, dir, "doclen")
    // O(epochs) rows, not a corpus-sized doclen scan: per-epoch partial
    // sums re-divide to exactly the scan path's sum(dl) DIV count(*)
    val avgdl = Dedup.readEpochs(spark, dir, "stats").agg(
      expr("CAST(sum(sum_dl) AS BIGINT) DIV CAST(sum(n_docs) AS BIGINT)")
        .as("avgdl"))
    val tf = broadcast(probeTf(spark, dir, queryTerms)).join(doclens, "doc_id")
    bm25Tail(tf, avgdl, "doc_id")
      .orderBy(desc("score"), col("doc_id"))
      .limit(k)
  }

  /** Query terms for the corpus entry: fixed literals so the oracle is a
    * plain SQL IN-list (drawn from the synthetic vocabulary — mid-to-high
    * document frequency, so df weighting actually discriminates). */
  private[graft] val CorpusTerms = Seq("vector", "stream", "merge", "window", "filter")

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "search_keyword_topk" -> ((s, d) =>
      keywordTopK(Tables.load(s, d, "documents"), CorpusTerms)),
    "search_bm25_topk" -> ((s, d) =>
      bm25TopK(Tables.load(s, d, "documents"), CorpusTerms)),
    // Index-fed BM25 through the SAME maintenance loop as the keyword
    // twin (build half, append half, compact both tables, reclaim) under
    // the scan entry's oracle VERBATIM: a lost doclen row, a one-table
    // compaction, or any index/scan scoring drift hash-mismatches here.
    // Own fixture name: this entry requires doclen + stats epochs, which
    // indexes staged before round 12 don't have.
    "search_bm25_indexed" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = Dedup.fingerprintedDir("graft-postidx", "bm25s",
        d + "bm25s", Seq(s"$d/documents.parquet"))
      Dedup.ensureCommittedIndex(dir) { tmp =>
        buildPostingsIndex(docs.filter(col("doc_id") % 2 === 0), tmp.getPath)
        appendToPostingsIndex(docs.filter(col("doc_id") % 2 =!= 0), tmp.getPath)
        require(compactPostingsIndex(s, tmp.getPath) == 2, "expected a 2-epoch merge")
        Dedup.reclaimIndexGarbage(tmp.getPath)
      }
      bm25PostingsIndex(s, dir.getPath, CorpusTerms)
    }),
    // doc_id and vec_id are aligned 1:1 in the corpus, so vec_id 0's
    // embedding is "the query document's" vector leg
    "search_hybrid_rrf" -> ((s, d) =>
      hybridTopK(Tables.load(s, d, "documents"),
        Tables.load(s, d, "embeddings"), CorpusTerms)),
    "search_hybrid_bm25" -> ((s, d) =>
      hybridTopKBm25(Tables.load(s, d, "documents"),
        Tables.load(s, d, "embeddings"), CorpusTerms)),
    // The FULL postings maintenance loop under the scan entry's oracle:
    // build over half the corpus, append the other half, compact the two
    // epochs, reclaim the dead files — then probe. The result must equal
    // keywordTopK over the whole corpus (same SQL), so a lost/duplicated
    // posting or a broken epoch merge hash-mismatches at the gate.
    "search_incr_postings" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = Dedup.fingerprintedDir("graft-postidx", "loop",
        d + "postings", Seq(s"$d/documents.parquet"))
      Dedup.ensureCommittedIndex(dir) { tmp =>
        buildPostingsIndex(docs.filter(col("doc_id") % 2 === 0), tmp.getPath)
        appendToPostingsIndex(docs.filter(col("doc_id") % 2 =!= 0), tmp.getPath)
        require(compactPostingsIndex(s, tmp.getPath) == 2, "expected a 2-epoch merge")
        Dedup.reclaimIndexGarbage(tmp.getPath)
      }
      queryPostingsIndex(s, dir.getPath, CorpusTerms)
    }),
    // The composed stack: the SAME hybrid query as search_hybrid_rrf,
    // lexical leg served from a persisted full-corpus postings index —
    // shares that entry's oracle, so index-vs-scan drift in the composed
    // pipeline hash-mismatches at the gate.
    "search_hybrid_indexed" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents").select("doc_id", "text")
      val dir = Dedup.fingerprintedDir("graft-postidx", "full",
        d + "postfull", Seq(s"$d/documents.parquet"))
      Dedup.ensureCommittedIndex(dir)(tmp =>
        buildPostingsIndex(docs, tmp.getPath))
      hybridTopKIndexed(s, dir.getPath,
        Tables.load(s, d, "embeddings"), CorpusTerms)
    }),
    // The approximate-vector hybrid: IVF leg instead of the brute scan —
    // the 100 TB serving shape, with its own full generated-construction
    // oracle (deterministic centroids make IVF SQL-expressible).
    "search_hybrid_ann" -> ((s, d) =>
      hybridTopKAnn(Tables.load(s, d, "documents"),
        Tables.load(s, d, "embeddings"), CorpusTerms)),
  )

  /** The keyword-search oracle, shared verbatim by the scan entry and the
    * postings-index maintenance loop (the index must reproduce the scan
    * result bit-for-bit). */
  private[graft] val KeywordTopkSql =
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
      |LIMIT 20""".stripMargin

  /** The BM25 oracle: same tf/df construction as [[KeywordTopkSql]], dl
    * via the [[Tokens.seg]] mirror, avgdl as one integer-division scalar,
    * and the cleared-to-integers Okapi weight — every operand CAST to
    * BIGINT so DuckDB's INT32 literals can't overflow mid-product. */
  private[graft] val Bm25TopkSql =
    ("""WITH dls AS (
      |  SELECT doc_id,
      |         CAST(len(""" + Tokens.duckToks("text") + """) AS BIGINT) AS dl
      |  FROM documents
      |), avg_dl AS (
      |  SELECT CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dls
      |), tf AS (
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
      |       CAST(SUM(((1000000 // (CAST(d.df AS BIGINT) + 1)) * 22 * CAST(t.tf AS BIGINT) * a.avgdl)
      |                // (10 * CAST(t.tf AS BIGINT) * a.avgdl + 3 * a.avgdl + 9 * l.dl)) AS BIGINT) AS score,
      |       CAST(SUM(t.tf) AS BIGINT) AS total_tf,
      |       CAST(COUNT(*) AS BIGINT) AS matched_terms
      |FROM tf t
      |JOIN df d USING (term)
      |JOIN dls l USING (doc_id)
      |CROSS JOIN avg_dl a
      |GROUP BY t.doc_id
      |ORDER BY score DESC, t.doc_id
      |LIMIT 20""").stripMargin

  private[graft] val HybridRrfSql =
      """WITH tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(string_split_regex(lower(text), '\s+')) AS term
        |        FROM documents)
        |  WHERE term IN ('vector', 'stream', 'merge', 'window', 'filter')
        |  GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), lexscore AS (
        |  SELECT t.doc_id, SUM(t.tf * (1000000 // (d.df + 1))) AS score
        |  FROM tf t JOIN df d USING (term) GROUP BY t.doc_id
        |), lex AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
        |  FROM lexscore ORDER BY score DESC, doc_id LIMIT 50
        |), vecscore AS (
        |  SELECT e.vec_id AS doc_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cosine
        |  FROM embeddings e
        |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |), vec AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS vec_rank
        |  FROM vecscore ORDER BY cosine DESC, doc_id LIMIT 50
        |)
        |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |       COALESCE(CAST(1000000 AS BIGINT) // (60 + l.lex_rank), 0) +
        |       COALESCE(CAST(1000000 AS BIGINT) // (60 + v.vec_rank), 0) AS rrf_score,
        |       COALESCE(l.lex_rank, 0) AS lex_rank,
        |       COALESCE(v.vec_rank, 0) AS vec_rank
        |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        |ORDER BY rrf_score DESC, doc_id
        |LIMIT 20""".stripMargin

  /** The BM25-hybrid oracle: [[HybridRrfSql]] with the lexical CTEs
    * swapped for [[Bm25TopkSql]]'s construction — the vector leg and the
    * fusion tail are verbatim-identical, exactly mirroring the Scala
    * composition (shared [[bm25Tail]] / shared fusion machinery). */
  private[graft] val HybridBm25Sql =
      ("""WITH dls AS (
        |  SELECT doc_id,
        |         CAST(len(""" + Tokens.duckToks("text") + """) AS BIGINT) AS dl
        |  FROM documents
        |), avg_dl AS (
        |  SELECT CAST(SUM(dl) AS BIGINT) // COUNT(*) AS avgdl FROM dls
        |), tf AS (
        |  SELECT doc_id, term, COUNT(*) AS tf
        |  FROM (SELECT doc_id,
        |               unnest(string_split_regex(lower(text), '\s+')) AS term
        |        FROM documents)
        |  WHERE term IN ('vector', 'stream', 'merge', 'window', 'filter')
        |  GROUP BY doc_id, term
        |), df AS (
        |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
        |), lexscore AS (
        |  SELECT t.doc_id,
        |         SUM(((1000000 // (CAST(d.df AS BIGINT) + 1)) * 22 * CAST(t.tf AS BIGINT) * a.avgdl)
        |             // (10 * CAST(t.tf AS BIGINT) * a.avgdl + 3 * a.avgdl + 9 * l.dl)) AS score
        |  FROM tf t
        |  JOIN df d USING (term)
        |  JOIN dls l USING (doc_id)
        |  CROSS JOIN avg_dl a
        |  GROUP BY t.doc_id
        |), lex AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
        |  FROM lexscore ORDER BY score DESC, doc_id LIMIT 50
        |), vecscore AS (
        |  SELECT e.vec_id AS doc_id,
        |         list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
        |                                CAST(q.embedding AS DOUBLE[])) AS cosine
        |  FROM embeddings e
        |  CROSS JOIN (SELECT embedding FROM embeddings WHERE vec_id = 0) q
        |), vec AS (
        |  SELECT doc_id,
        |         CAST(ROW_NUMBER() OVER (ORDER BY cosine DESC, doc_id) AS BIGINT) AS vec_rank
        |  FROM vecscore ORDER BY cosine DESC, doc_id LIMIT 50
        |)
        |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
        |       COALESCE(CAST(1000000 AS BIGINT) // (60 + l.lex_rank), 0) +
        |       COALESCE(CAST(1000000 AS BIGINT) // (60 + v.vec_rank), 0) AS rrf_score,
        |       COALESCE(l.lex_rank, 0) AS lex_rank,
        |       COALESCE(v.vec_rank, 0) AS vec_rank
        |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
        |ORDER BY rrf_score DESC, doc_id
        |LIMIT 20""").stripMargin

  /** The ANN-hybrid oracle: the lexical CTEs of [[HybridRrfSql]] fused
    * with the single-query form of sim_topk_ivf's deterministic IVF
    * construction (centroids every 37th vector, nearest-centroid
    * assignment, nprobe=3 probe, exemplar excluded, rank ≤ legK=50). */
  // raw interpolation: ${} splices the seed CTEs while '\s+' stays verbatim
  private[graft] val HybridAnnSql =
    raw"""WITH tf AS (
      |  SELECT doc_id, term, COUNT(*) AS tf
      |  FROM (SELECT doc_id,
      |               unnest(string_split_regex(lower(text), '\s+')) AS term
      |        FROM documents)
      |  WHERE term IN ('vector', 'stream', 'merge', 'window', 'filter')
      |  GROUP BY doc_id, term
      |), df AS (
      |  SELECT term, COUNT(*) AS df FROM tf GROUP BY term
      |), lexscore AS (
      |  SELECT t.doc_id, SUM(t.tf * (1000000 // (d.df + 1))) AS score
      |  FROM tf t JOIN df d USING (term) GROUP BY t.doc_id
      |), lex AS (
      |  SELECT doc_id,
      |         CAST(ROW_NUMBER() OVER (ORDER BY score DESC, doc_id) AS BIGINT) AS lex_rank
      |  FROM lexscore ORDER BY score DESC, doc_id LIMIT 50
      |), ${Similarity.maximinSeedCtes(16, 512)},
      |centroids AS MATERIALIZED (
      |  SELECT vec_id AS cent_id, v AS cent_vec FROM seedsu16
      |), assign AS (
      |  SELECT vec_id, cluster FROM (
      |    SELECT e.vec_id, c.cent_id AS cluster,
      |           ROW_NUMBER() OVER (PARTITION BY e.vec_id
      |             ORDER BY list_cosine_similarity(CAST(e.embedding AS DOUBLE[]), c.cent_vec) DESC, c.cent_id) AS r
      |    FROM embeddings e CROSS JOIN centroids c) t WHERE r <= 3
      |), probes AS (
      |  SELECT qid, cluster FROM (
      |    SELECT q.vec_id AS qid, c.cent_id AS cluster,
      |           ROW_NUMBER() OVER (ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), c.cent_vec) DESC, c.cent_id) AS r
      |    FROM embeddings q CROSS JOIN centroids c WHERE q.vec_id = 0) t WHERE r <= 3
      |), cand AS (
      |  SELECT DISTINCT p.qid, a.vec_id
      |  FROM assign a JOIN probes p USING (cluster)
      |  WHERE a.vec_id <> p.qid
      |), vec AS (
      |  SELECT doc_id, vec_rank FROM (
      |    SELECT c.vec_id AS doc_id,
      |           CAST(ROW_NUMBER() OVER (
      |             ORDER BY list_cosine_similarity(CAST(q.embedding AS DOUBLE[]), CAST(e.embedding AS DOUBLE[])) DESC, c.vec_id) AS BIGINT) AS vec_rank
      |    FROM cand c
      |    JOIN embeddings q ON q.vec_id = c.qid
      |    JOIN embeddings e ON e.vec_id = c.vec_id) t
      |  WHERE vec_rank <= 50
      |)
      |SELECT COALESCE(l.doc_id, v.doc_id) AS doc_id,
      |       COALESCE(CAST(1000000 AS BIGINT) // (60 + l.lex_rank), 0) +
      |       COALESCE(CAST(1000000 AS BIGINT) // (60 + v.vec_rank), 0) AS rrf_score,
      |       COALESCE(l.lex_rank, 0) AS lex_rank,
      |       COALESCE(v.vec_rank, 0) AS vec_rank
      |FROM lex l FULL OUTER JOIN vec v ON l.doc_id = v.doc_id
      |ORDER BY rrf_score DESC, doc_id
      |LIMIT 20""".stripMargin

  val oracle: Seq[(String, String)] = Seq(
    "search_keyword_topk" -> KeywordTopkSql,
    "search_bm25_topk" -> Bm25TopkSql,
    "search_bm25_indexed" -> Bm25TopkSql,
    "search_incr_postings" -> KeywordTopkSql,
    // mirrors hybridTopK exactly: same integer lexical scores, the same
    // double-accumulated cosine as sim_topk_brute's proven oracle form,
    // per-leg ROW_NUMBER in (score DESC, id) order limited to legK=50,
    // integer RRF weights 1e6 // (60 + rank), absent legs as rank 0;
    // search_hybrid_indexed shares it verbatim -- the index-fed lexical
    // leg must reproduce the scan-fed ranking bit-for-bit
    "search_hybrid_rrf" -> HybridRrfSql,
    "search_hybrid_bm25" -> HybridBm25Sql,
    "search_hybrid_indexed" -> HybridRrfSql,
    "search_hybrid_ann" -> HybridAnnSql,
  )
}
