package graft.ops

import graft.Tables
import graft.functions.GraftFunctions._
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline: token counting,
  * quality scoring, language identification, document fingerprinting.
  * Beyond-reference surface (SURVEY.md §7.2 M5).
  *
  * Everything here is built from codegen'd `functions._` expressions (plus
  * the native winnowing expression) — per-row work with no shuffle at all
  * until an explicit aggregate, so it scales embarrassingly: 100 TB of
  * documents stream through map-only stages.
  */
object TextAnalysis {

  // whitespace = the pinned Tokens.WsClass contract (oracles split on
  // RE2's \s, which IS this class; Java's \s would also take U+000B)
  private val wsTokens: Column = split(trim(col("text")), Tokens.WsRun)

  /** Token counting: whitespace tokens and a BPE-ish segmentation
    * (runs of word chars / single punctuation marks — the pre-tokenizer
    * shape GPT-style BPE vocabularies assume). */
  def tokenCounts(docs: DataFrame): DataFrame =
    docs.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
      .select(
      col("doc_id"),
      length(col("text")).as("n_chars2"),
      size(wsTokens).as("n_ws_tokens"),
      size(expr("regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\\\\t\\\\n\\\\f\\\\r ]', 0)"))
        .as("n_bpeish_tokens"))

  private val Stopwords = Seq("the", "a", "an", "and", "or", "of", "to", "in",
    "is", "it", "that", "for", "on", "with", "as", "at", "by", "be")

  /** Quality scoring: length, mean token length, stopword ratio, punctuation
    * ratio, alpha ratio, and a blended [0,1] quality score. r19: the five
    * COUNTS come from one native single-pass kernel
    * ([[graft.functions.TextStats]] — replacing split + an interpreted
    * higher-order stopword filter + two full-string regexp_replace
    * passes); every ratio, division, and round stays the exact same
    * column expression, so scores are bit-identical to the old form
    * (differential-spec-pinned). */
  def qualityScores(docs: DataFrame, keep: Seq[String] = Nil): DataFrame = {
    // two-step projection: the kernel lands in its own Project so it is
    // evaluated ONCE per row (CollapseProject keeps non-cheap aliases
    // referenced many times in their own node)
    val withStats = docs.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
      .select(col("doc_id") +: keep.map(col) :+
        text_stats(col("text"), Stopwords).as("__st"): _*)
    val st = col("__st")
    val nToks = st.getField("n_toks")
    val nChars = st.getField("n_chars")
    val nStop = st.getField("n_stop")
    val nPunct = st.getField("n_punct")
    val nAlpha = st.getField("n_alpha")
    val meanTokLen = (nChars - (nToks - lit(1))).cast("double") / nToks
    val stopRatio = nStop.cast("double") / nToks
    val punctRatio = nPunct.cast("double") / nChars
    val alphaRatio = nAlpha.cast("double") / nChars
    // blended heuristic: reward stopword presence + alpha text, punish
    // extreme token lengths — the usual cheap pretraining-quality signal
    val lenScore = when(meanTokLen.between(3.0, 10.0), 1.0).otherwise(0.5)
    val score = least(lit(1.0),
      stopRatio * 2.0 + alphaRatio * 0.3 + lenScore * 0.3)
    withStats.select(col("doc_id") +: keep.map(col) :+ nChars.as("n_chars2") :+
      nToks.as("n_tokens") :+
      round(meanTokLen, 6).as("mean_tok_len") :+
      round(stopRatio, 6).as("stop_ratio") :+
      round(punctRatio, 6).as("punct_ratio") :+
      round(alphaRatio, 6).as("alpha_ratio") :+
      round(score, 6).as("quality_score"): _*)
  }

  /** Top-k highest-quality documents per language — the "keep the best N
    * per stratum" selection a curated pretraining mix runs. The ranking is
    * a bounded partial+final TopK AGGREGATE, not a window: each map task
    * keeps k candidates per language, so the exchange carries
    * k × partitions × languages rows — a window over language would
    * shuffle every scored document before rank() could drop any (the
    * same shuffle discipline as [[Similarity.bruteForceTopK]]'s top-k).
    * Score computation itself is map-only column expressions. */
  def topQualityPerLang(docs: DataFrame, k: Int = 3): DataFrame = {
    val topk = udaf(new graft.functions.Aggregators.TopK(k),
      org.apache.spark.sql.Encoders.product[graft.functions.Aggregators.Scored])
    qualityScores(docs, keep = Seq("lang"))
      .groupBy("lang")
      .agg(topk(col("quality_score"), col("doc_id")).as("top"))
      .select(col("lang"), posexplode(col("top")).as(Seq("pos", "s")))
      .select(col("lang"), (col("pos") + 1).cast("int").as("rank"),
        col("s.id").as("doc_id"), col("s.score").as("quality_score"))
      .orderBy("lang", "rank")
  }

  /** Stopword/character-class language-ID heuristic over
    * en/es/de/fr/ja/ko/zh. Script ratios separate the CJK family first
    * (kana → ja, hangul → ko, han → zh); otherwise the language whose
    * stopword profile hits the most tokens wins (ties → profile order).
    * Pure column expressions — `array_intersect` over a lowercased token
    * set. */
  def languageId(docs: DataFrame): DataFrame =
    languageIdCols(docs.orderBy("doc_id")) // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass

  /** [[languageId]] without the presentation sort — map-only column
    * expressions, so the streaming twin applies it unchanged inside an
    * Append-mode plan (a sort is not allowed there). */
  private[graft] def languageIdCols(docs: DataFrame): DataFrame = {
    val profiles: Seq[(String, Seq[String])] = Seq(
      "en" -> Seq("the", "and", "of", "to", "in", "is", "that", "it", "for", "with"),
      "es" -> Seq("el", "la", "de", "que", "y", "en", "un", "una", "los", "por"),
      "de" -> Seq("der", "die", "das", "und", "ist", "von", "mit", "den", "ein", "nicht"),
      "fr" -> Seq("le", "la", "les", "de", "et", "est", "un", "une", "dans", "pour"))
    val toks = array_distinct(split(lower(col("text")), Tokens.WsRun))
    def classRatio(cls: String) = (length(col("text")) -
      length(regexp_replace(col("text"), cls, ""))).cast("double") /
      greatest(length(col("text")), lit(1))
    // script ratios decide the CJK family BEFORE the Latin stopword
    // cascade (r13): kana presence is the ja-vs-zh discriminator —
    // Japanese prose is heavily hiragana/katakana while Chinese has none,
    // so even a LOW kana ratio (> 0.05) means Japanese; hangul syllables
    // identify Korean; a Han-dominated text with no kana is Chinese.
    // Pre-r13 a kanji-heavy Japanese doc labeled zh and a kana- or
    // hangul-heavy doc fell through to the Latin cascade.
    val kanaRatio = classRatio("[\\x{3040}-\\x{30ff}]")
    val hangulRatio = classRatio("[\\x{ac00}-\\x{d7af}]")
    val hanRatio = classRatio("[\\x{4e00}-\\x{9fff}]")
    // greatest(struct(hits, prio, lang)) picks max hits; the explicit
    // priority field makes earlier profiles ('en' first) win exact ties
    val hitCols = profiles.zipWithIndex.map { case ((lang, words), idx) =>
      struct(size(array_intersect(toks, typedlit(words))).as("hits"),
        lit(profiles.length - idx).as("prio"), lit(lang).as("lang"))
    }
    val best = greatest(hitCols: _*)
    docs.select(col("doc_id"), col("lang").as("labeled_lang"),
      when(kanaRatio > 0.05, lit("ja"))
        .when(hangulRatio > 0.3, lit("ko"))
        .when(hanRatio > 0.3, lit("zh"))
        .otherwise(best.getField("lang")).as("pred_lang"))
  }

  /** Winnowing fingerprints (native Catalyst expression): per-document
    * sorted fingerprint set + a single 64-bit digest for cheap equality. */
  def fingerprints(docs: DataFrame): DataFrame =
    docs.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
      .select(
      col("doc_id"),
      winnow_fp(col("text")).as("fp"))
      .select(col("doc_id"), size(col("fp")).as("fp_size"),
        xxhash64(col("fp")).as("fp_digest"))

  /** The composed filter a pretraining corpus build actually runs: keep
    * documents inside a token-length band and above a quality floor. A
    * map-only composition of the scoring expressions — one scan, no
    * shuffle, embarrassingly parallel at corpus scale. */
  def filterPipeline(docs: DataFrame, minTokens: Int = 20,
      maxTokens: Int = 2000, minQuality: Double = 0.5): DataFrame =
    qualityScores(docs)
      .filter(col("n_tokens").between(minTokens, maxTokens) &&
        col("quality_score") >= minQuality)
      .select("doc_id", "n_tokens", "quality_score")

  // PII patterns restricted to the Java↔RE2 shared-semantics subset (no
  // backreferences/lookaround; \b and bounded quantifiers agree), so the
  // engine (Java regex) and the DuckDB oracle (RE2) scrub identically —
  // the same compatibility discipline as the RLIKE pushdown gate
  private[graft] val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val Ipv4Re = "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b"
  private[graft] val LongIdRe = "\\b\\d{13,19}\\b" // card/account-like runs

  /** Canonical text normalization — the cleaning stage that runs before
    * any hashing/dedup so byte-different renderings of the same text
    * (decomposed accents, control characters, ragged whitespace) cannot
    * defeat content-hash dedup or skew token statistics. Three fixed
    * steps, in order: Unicode NFC composition (custom codegen'd
    * [[graft.functions.NfcNormalize]] with an already-normalized fast
    * path), control characters → space (explicit `[\x00-\x1f\x7f]` class
    * so Spark and any re-implementation agree byte-for-byte — `\p{Cntrl}`
    * definitions vary across regex engines), whitespace-run collapse +
    * trim. Pure map-side row work: no shuffle, 100 TB streams through. */
  def normalize(docs: DataFrame, textCol: String = "text"): DataFrame =
    docs.select(
      col("doc_id"),
      trim(regexp_replace(
        regexp_replace(nfc_normalize(col(textCol)), "[\\x00-\\x1f\\x7f]", " "),
        Tokens.WsRun, " ")).as("norm_text"))

  /** PII detection + redaction: per-document match counts (from the
    * original text) and a scrubbed copy with emails → [EMAIL],
    * IPv4s → [IP], 13–19-digit runs → [ID], applied in that fixed order.
    * Pure per-row regex work — map-only, no shuffle, 100 TB streams
    * through (the shape of every at-scale PII pass); replacements cannot
    * create new matches, so one sequential pass is a fixpoint. */
  def scrubPii(docs: DataFrame, textCol: String = "text"): DataFrame = {
    val t = col(textCol)
    docs.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
      .select(
      col("doc_id"),
      // long counts: the DuckDB oracle's len() is BIGINT
      regexp_count(t, lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(t, lit(Ipv4Re)).cast("long").as("n_ips"),
      regexp_count(t, lit(LongIdRe)).cast("long").as("n_ids"),
      regexp_replace(
        regexp_replace(
          regexp_replace(t, EmailRe, "[EMAIL]"),
          Ipv4Re, "[IP]"),
        LongIdRe, "[ID]").as("clean_text"))
  }

  /** The corpus documents carry no PII, so the oracle entry SYNTHESIZES a
    * deterministic email + IP + card-like id per document (from doc_id)
    * before scrubbing — both engines then exercise every pattern on every
    * row instead of vacuously agreeing on no-ops. */
  def piiEntry(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val withPii = docs.select(col("doc_id"), concat(col("text"),
      lit(" contact user"), col("doc_id").cast("string"),
      lit("@corp.example from 10.0."),
      (col("doc_id") % 256).cast("string"), lit("."),
      ((col("doc_id") * 7) % 256).cast("string"),
      lit(" card 4111111111111"),
      (lit(100) + col("doc_id") % 900).cast("string")).as("text"))
    scrubPii(withPii)
  }

  /** Benchmark decontamination: flag corpus documents sharing any word
    * n-gram with an evaluation set — the standard pre-training hygiene
    * step (a benchmark answer quoted inside a training document inflates
    * eval scores). Counts DISTINCT shared shingles per document.
    *
    * 100 TB shape: benchmark n-gram sets are tiny (benchmarks are 1e3–1e6
    * grams), so the benchmark side is a distinct + BROADCAST; the corpus
    * streams map-only through shingle hashing (the same native
    * WordShingleHashes expression the dedup family uses — longs end to
    * end, no token strings) into a broadcast semi-join, and the only
    * shuffle is the partial+final count over the SURVIVING (contaminated)
    * gram rows. The corpus itself never shuffles. */
  def contamination(docs: DataFrame, benchmark: DataFrame, n: Int = 3): DataFrame =
    contaminationUnordered(docs, benchmark, n).orderBy("doc_id")

  /** [[contamination]] without the presentation sort — the form composed
    * plans (the curate cascade) embed. */
  def contaminationUnordered(docs: DataFrame, benchmark: DataFrame,
      n: Int = 3): DataFrame = {
    val bench = Dedup.shingleHashes(benchmark, n)
      .select(explode(col("shingles")).as("sh")).distinct()
    Dedup.shingleHashes(docs, n)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("sh"))
      .join(broadcast(bench), Seq("sh"), "left_semi")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_contaminated"))
  }

  /** ENTRY scaffolding: the corpus is near-random text with no natural
    * benchmark overlap, so the fixture takes the first ~30% of every
    * 50th document as the "benchmark" — those source documents must come
    * back flagged (they contain their own prefix), everything else stays
    * clean modulo genuine shingle collisions. */
  private[ops] def contaminationEntry(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.load(s, d, "documents")
    contamination(docs, contaminationBenchmark(docs))
  }

  /** The contamination fixture rule — every 50th document's ~30% prefix
    * is the "benchmark" — as ONE definition shared by the standalone
    * entry, the curate cascade, and the cascade drift spec (r17 review:
    * three literal copies were the exact channel the r15 pack-builder
    * refactor retired elsewhere). */
  private[graft] def contaminationBenchmark(docs: DataFrame): DataFrame =
    docs.filter(col("doc_id") % 50 === 0).select(
      col("doc_id"),
      expr("substring(text, 1, greatest(cast(length(text) * 0.3 as int), 1))").as("text"))

  /** Repetition quality metrics (the Gopher/MassiveText filter family):
    * duplicate-token mass and most-frequent-bigram dominance per document.
    * Everything stays in EXACT integer counts — the thresholds compare
    * cross-multiplied integers (`100·top > 18·total`), never a float
    * ratio, so any engine agrees bit-for-bit.
    *
    * 100 TB shape (r17): the WHOLE metric is map-side — token/distinct
    * counts are array expressions and the bigram dominance is the
    * row-local codegen'd [[graft.functions.TopBigramCount]] over the
    * doc's own token array (a document's bigram histogram never needs
    * to leave its row). Zero shuffles; the previous formulation's
    * corpus-wide (doc, gram) partial+final exchange — the largest
    * linear shuffle in the filter cascade — is gone. Equivalence to the
    * exploded-count formulation is spec-pinned (RepetitionMapSideSpec)
    * and the DuckDB oracle is unchanged. */
  def repetitionMetrics(docs: DataFrame,
      topBigramPctMax: Int = 18, dupTokenPctMax: Int = 30): DataFrame =
    repetitionMetricsUnordered(docs.orderBy("doc_id"), // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
      topBigramPctMax, dupTokenPctMax)

  /** [[repetitionMetrics]] without the presentation sort — the form
    * composed plans (the curate cascade) embed. */
  def repetitionMetricsUnordered(docs: DataFrame,
      topBigramPctMax: Int = 18, dupTokenPctMax: Int = 30): DataFrame = {
    val toks = Tokens.seg(col("text"))  // the shared tokenizer
    docs.select(
        col("doc_id"), toks.as("t"),
        size(toks).cast("long").as("n_tokens"),
        size(array_distinct(toks)).cast("long").as("n_distinct_tokens"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        // coalesce mirrors the old join-absent-row semantics: a null
        // token array (null text) reads 0, exactly like the LEFT join
        coalesce(graft.functions.GraftFunctions.top_bigram_count(col("t")),
          lit(0L)).as("top_bigram_n"),
        coalesce(greatest(size(col("t")) - 1, lit(0)).cast("long"), lit(0L))
          .as("n_bigrams"))
      .select(
        col("doc_id"), col("n_tokens"), col("n_distinct_tokens"),
        col("top_bigram_n"), col("n_bigrams"),
        (col("n_tokens") > 0 && (
          col("top_bigram_n") * 100 > col("n_bigrams") * topBigramPctMax ||
          (col("n_tokens") - col("n_distinct_tokens")) * 100 >
            col("n_tokens") * dupTokenPctMax)).as("is_repetitive"))
  }

  /** N-gram novelty — the cross-document complement of
    * [[repetitionMetrics]] (intra-doc) and [[contamination]] (vs a
    * benchmark): per document, how many of its distinct 3-token shingles
    * exist NOWHERE else in the corpus, and that share in integer
    * per-mille. High novelty marks original content worth keeping; low
    * novelty marks boilerplate/templated text even when no single pair
    * crosses a near-dup threshold.
    *
    * 100 TB shape: distinct (doc, shingle-hash) pairs — longs, never
    * shingle text — feed a partial+final document-frequency count, then
    * join the df back and roll up per doc: the shingle stream crosses two
    * linear exchanges (the dedup_spans shape, 10×-stress-proved there),
    * with per-doc distinctness bounding any hot-shingle skew at one row
    * per (doc, shingle). Integer per-mille, engine-exact. */
  def noveltyMetrics(docs: DataFrame, n: Int = 3): DataFrame = {
    val sh = Dedup.shingleHashes(docs, n)
      .select(col("doc_id"), explode(array_distinct(col("shingles"))).as("sh"))
    val df = sh.groupBy("sh").agg(count(lit(1)).as("df"))
    sh.join(df, Seq("sh"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_shingles"),
        sum(when(col("df") === 1L, 1L).otherwise(0L)).as("n_unique"))
      .select(col("doc_id"), col("n_shingles"), col("n_unique"),
        expr("n_unique * 1000 DIV n_shingles").as("novelty_per_mille"))
      .orderBy("doc_id")
  }

  /** Sentence extraction grammar — whole-match alternation only (NO
    * lookbehind: the oracle runs RE2, which has none): a sentence is a
    * maximal run of non-ender characters followed by ≥ 1 sentence-final
    * ender (ASCII `.!?` and the CJK full-width 。！？), or the enderless
    * tail. Shared verbatim between Spark (Java regex) and the oracle
    * (RE2) — the pattern deliberately stays in their common subset, and
    * the corpus carries no newlines so Java's `$`-before-final-newline
    * quirk cannot diverge from RE2's end-of-text. */
  private[graft] val SentRe = "[^.!?。！？]*[.!?。！？]+|[^.!?。！？]+$"

  /** The word-salad corpus carries no sentence punctuation, so
    * segmentation is exercised on planted multi-sentence text (the
    * fixture pattern of the CJK/langid plants): every 4th document gains
    * four ASCII sentences (period/bang/question + an enderless tail) and
    * two CJK-punctuated ones. Mirrored glyph-for-glyph in the oracle. */
  private[graft] val SentPlant =
    " Planted first sentence. A second one! Was there a third? " +
      "文は二つ。これも文！ and a trailing tail"

  private[graft] def plantSentences(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 4 === 0, concat(col("text"), lit(SentPlant)))
        .otherwise(col("text")).as("text"))

  /** Sentence segmentation — the granularity between documents and
    * tokens that sentence-level dedup, PII windows, and parallel-corpus
    * mining operate on. Map-side: one regexp extraction + posexplode,
    * zero exchanges. `sent_pos` is the RAW extraction ordinal (stable
    * under the blank filter — renumbering kept sentences would need a
    * per-doc window); documents with no extractable sentence (null/empty
    * text) produce no rows, the [[Chunking.chunk]] convention. */
  def sentences(docs: DataFrame): DataFrame =
    docs
      .select(col("doc_id"),
        posexplode(expr(s"regexp_extract_all(text, '$SentRe', 0)"))
          .as(Seq("pos", "raw")))
      .select(col("doc_id"), col("pos").cast("long").as("sent_pos"),
        trim(col("raw")).as("sentence"))
      .where(length(col("sentence")) > 0)

  /** Cross-document duplicate sentences — the MassiveText-style
    * "repeated sentences across documents" signal (boilerplate,
    * navigation chrome, license headers). 100 TB shape: sentences are
    * counted by 256-bit HASH (map-side partial aggregation — each
    * distinct sentence crosses the exchange once per partition, and the
    * enderless word-salad docs' whole-text "sentences" never shuffle as
    * strings), then the text joins back on the REDUCED duplicate set
    * only — the dedup_exact discipline at sentence granularity. */
  def duplicateSentences(docs: DataFrame): DataFrame = {
    // both self-join sides re-derive from here: persist, or the whole
    // extraction + hash runs twice. Cache lifecycle = the Dedup.scala
    // header convention: the returned plan consumes it lazily, so this
    // op cannot unpersist it itself; per-query callers (Verify/Bench/
    // PlanAudit) clearCache() between entries.
    val sents = sentences(docs)
      .select(col("doc_id"), col("sentence"), sha2(col("sentence"), 256).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val dups = sents.groupBy("h")
      .agg(countDistinct("doc_id").as("n_docs"), count(lit(1)).as("n_occ"))
      .where(col("n_docs") >= 2)
    sents.select("h", "sentence")
      .join(dups, "h")
      .groupBy(col("h"), col("n_docs"), col("n_occ"))
      .agg(min("sentence").as("sentence"))
      .select("sentence", "n_docs", "n_occ")
  }

  /** Sentence-level dedup with document RECONSTRUCTION — the
    * boilerplate-removal form of [[duplicateSentences]] (the span-strip
    * pattern at sentence granularity): every repeated sentence keeps
    * exactly its CANONICAL first occurrence (lowest (doc_id, sent_pos))
    * and every other occurrence — cross-document or intra-document — is
    * stripped; each document's surviving sentences are rebuilt in
    * order. A document stripped to nothing disappears (the zero-chunk
    * convention).
    *
    * Scale: one partial+final aggregate per 256-bit hash carries the
    * occurrence count AND the canonical pick (a min over (doc_id,
    * sent_pos) structs — no second pass); sentence text crosses the
    * hash exchange and the per-doc rebuild exchange, both
    * sentence-sized — never the shingle explosion the passage-level
    * strip pays. */
  def stripDuplicateSentences(docs: DataFrame): DataFrame = {
    // cache lifecycle: Dedup.scala header convention (lazy consumer, so
    // no unpersist here; per-query callers clearCache() between entries)
    val sents = sentences(docs)
      .select(col("doc_id"), col("sent_pos"), col("sentence"),
        sha2(col("sentence"), 256).as("h"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // join back only the REDUCED duplicate set (the duplicateSentences
    // discipline, r15 review): unique sentences — the overwhelming bulk —
    // never meet a build side at all; a left join against the small
    // duplicated-hash stats keeps them on a null match
    val dups = sents.groupBy("h").agg(
      count(lit(1)).as("n_occ"),
      min(struct(col("doc_id"), col("sent_pos"))).as("canon"))
      .where(col("n_occ") >= 2)
    sents.join(dups, Seq("h"), "left")
      .where(col("n_occ").isNull ||
        (col("canon.doc_id") === col("doc_id") &&
          col("canon.sent_pos") === col("sent_pos")))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_kept"),
        array_join(transform(
          array_sort(collect_list(struct(col("sent_pos"), col("sentence")))),
          x => x.getField("sentence")), " ").as("text"))
  }

  /** Sentence-ALIGNED chunking — windows that never cut mid-sentence
    * (the boundary-respecting variant of [[Chunking.chunk]]'s token
    * windows, what instruction/eval corpora chunk on): each sentence is
    * assigned `chunk_id = ⌊tokens-before-it-in-doc / capacity⌋` — offset
    * packing at sentence granularity WITHIN the document, the same
    * deterministic rule a SQL window mirrors (greedy reset-at-capacity
    * is order-history-dependent; this is not). A sentence longer than
    * capacity forms its own oversized chunk rather than being split.
    *
    * Scale: ONE hash exchange on doc_id — the per-doc running sum's
    * window state is bounded by the doc's sentence count, and the
    * chunk-rebuild groupBy(doc_id, chunk_id) reuses the window's
    * partitioning (doc_id co-locates every finer key). The in-chunk
    * order rides an array_sort over (sent_pos, sentence) structs, not a
    * second sort exchange. */
  def chunkSentences(docs: DataFrame, capacity: Int = 32): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("doc_id").orderBy("sent_pos")
      .rowsBetween(Window.unboundedPreceding, -1)
    sentences(docs)
      .withColumn("n_tok", graft.functions.GraftFunctions.seg_count(col("sentence")))
      .withColumn("cb", coalesce(sum("n_tok").over(w), lit(0L)))
      // integral floor division (ADVICE r15: `/` is double division —
      // exact only below 2^53 and semantically off the oracle's `//`)
      .withColumn("chunk_id", expr(s"cb div $capacity"))
      .groupBy(col("doc_id"), col("chunk_id"))
      .agg(count(lit(1)).as("n_sents"),
        sum("n_tok").as("chunk_tokens"),
        array_join(transform(
          array_sort(collect_list(struct(col("sent_pos"), col("sentence")))),
          x => x.getField("sentence")), " ").as("chunk_text"))
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "text_sentences" -> ((s, d) =>
      // r19: input sorted by doc_id; the extractor explodes in ordinal
      // order, so (doc_id, sent_pos) order holds without a trailing sort
      // re-running the extraction in its range-sampling pass
      sentences(plantSentences(Tables.load(s, d, "documents"))
        .orderBy("doc_id"))),
    "text_chunk_sentences" -> ((s, d) =>
      chunkSentences(plantSentences(Tables.load(s, d, "documents"))
        .orderBy("doc_id"))),
    "dedup_sentences" -> ((s, d) =>
      duplicateSentences(plantSentences(Tables.load(s, d, "documents")))
        .orderBy("sentence")),
    "dedup_sentence_strip" -> ((s, d) =>
      stripDuplicateSentences(plantSentences(Tables.load(s, d, "documents")))
        .orderBy("doc_id")),
    "text_repetition" -> ((s, d) =>
      repetitionMetrics(Tables.load(s, d, "documents"))),
    "text_novelty" -> ((s, d) =>
      noveltyMetrics(Tables.load(s, d, "documents"))),
    "text_contamination" -> ((s, d) => contaminationEntry(s, d)),
    "text_pii_scrub" -> ((s, d) => piiEntry(s, d)),
    "text_tokens" -> ((s, d) => tokenCounts(Tables.load(s, d, "documents"))),
    // the corpus is ASCII, so the CJK segmentation rule is exercised on
    // planted mixed-script text: every 3rd document gains Han + Hiragana +
    // Hangul runs glued to Latin words; the shared tokenizer must split
    // each CJK codepoint to its own token while Latin words stay whole —
    // hash-checked via the count AND the tail of the actual token stream
    "text_tokens_cjk" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      val planted = docs.select(col("doc_id"),
        when(col("doc_id") % 3 === 0,
          concat(col("text"), lit(" 机器学习模型 processes こんにちは世界 and 한국어 text")))
          .otherwise(col("text")).as("text"))
      planted.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
        .select(col("doc_id"), Tokens.seg(col("text")).as("t"))
        .select(col("doc_id"),
          size(col("t")).cast("long").as("n_tokens"),
          concat_ws(" ", expr("slice(t, greatest(size(t) - 11, 1), 12)")).as("tail_toks"))
    }),
    "text_quality" -> ((s, d) => qualityScores(Tables.load(s, d, "documents"))),
    // the corpus is Latin-script, so the CJK-family arms are exercised on
    // planted REPLACEMENT paragraphs (replacement, not append: the script
    // ratios must clear their thresholds deterministically): every 17th
    // doc becomes Japanese (kana+kanji), every 19th Korean, every 23rd
    // Chinese — priority ja > ko > zh on the overlapping ids, mirrored in
    // the oracle's CASE order
    "text_langid" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      languageId(docs.select(col("doc_id"), col("lang"),
        when(col("doc_id") % 17 === 0, lit(JaSnippet))
          .when(col("doc_id") % 19 === 0, lit(KoSnippet))
          .when(col("doc_id") % 23 === 0, lit(ZhSnippet))
          .otherwise(col("text")).as("text")))
    }),
    "text_fingerprint" -> ((s, d) => fingerprints(Tables.load(s, d, "documents"))),
    "text_filter_pipeline" -> ((s, d) => filterPipeline(Tables.load(s, d, "documents"))),
    "text_topk_quality" -> ((s, d) => topQualityPerLang(Tables.load(s, d, "documents"))),
    // The corpus is clean ASCII, so normalization is exercised on planted
    // mess: every 10th document gets a tab + decomposed e-acute
    // (e + U+0301) + trailing spaces/newline appended; normalize must
    // compose it to a precomposed é and canonicalize the whitespace.
    "text_normalize" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      normalize(docs.select(col("doc_id"),
        when(col("doc_id") % 10 === 0,
          concat(col("text"), lit("\tcafe\u0301  \n")))
          .otherwise(col("text")).as("text"))
        .orderBy("doc_id")) // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
    }),
    // HTML extraction exercised on a planted page template around each
    // doc's text (title + h1 + styled/scripted head + entities + a
    // comment); the oracle derives the expected prose from the same
    // template rule, so tag stripping, block removal, entity decoding,
    // and whitespace collapse are all hash-checked
    "text_extract_html" -> ((s, d) => {
      val docs = Tables.load(s, d, "documents")
      docs.orderBy("doc_id") // r19: sort the narrow input first; a trailing sort would re-run the heavy 1:1 map in its range-sampling pass
        .select(col("doc_id"), expr(htmlPageTemplateExpr).as("html"))
        .select(col("doc_id"),
          graft.functions.GraftFunctions.html_to_text(col("html")).as("text"))
    }),
  )

  /** Planted CJK-family paragraphs for the langid entry — shared literals
    * so the entry and its oracle cannot drift. Ja mixes kanji with the
    * kana that distinguishes it from zh; ko is hangul syllables; zh is
    * pure Han. */
  private[graft] val JaSnippet =
    "機械学習のモデルはこのデータで訓練されます 品質管理がとても大切です"
  private[graft] val KoSnippet =
    "기계 학습 모델은 이 데이터로 학습됩니다 품질 관리가 매우 중요합니다"
  private[graft] val ZhSnippet =
    "机器学习模型使用这些数据进行训练 质量控制非常重要"

  /** The planted crawl-page template (a Spark SQL expression over
    * (doc_id, text)) and its expected extraction (a DuckDB expression over
    * the same columns) — shared by `text_extract_html` and the composed
    * crawl gate so the two cannot drift. */
  private[graft] val htmlPageTemplateExpr: String =
    """concat('<html><head><title>doc ', cast(doc_id as string),
      |  '</title><style>p{color:red}</style><script>var x = 1 < 2;</script>',
      |  '</head><body><h1>doc ', cast(doc_id as string), '</h1><p>',
      |  text, ' &amp;&nbsp;done</p><!-- crawler:x --></body></html>')""".stripMargin
      .replaceAll("\n\\s*", "")

  private[ops] def htmlExtractedSql(textExpr: String): String =
    "'doc ' || CAST(doc_id AS VARCHAR) || ' doc ' || CAST(doc_id AS VARCHAR)" +
      s" || ' ' || trim(regexp_replace($textExpr, '\\s+', ' ', 'g')) || ' & done'"

  /** Quality-score oracle text, shared: text_filter_pipeline wraps it so
    * the two entries cannot drift; curate_corpus runs it over its
    * planted-dup CTE via [[textQualityOracleSqlFrom]]. */
  private[ops] def textQualityOracleSqlFrom(table: String): String =
    textQualityOracleSql.replace("FROM documents ", s"FROM $table ")

  private[ops] val textQualityOracleSql: String =
      """SELECT doc_id, LENGTH(text) AS n_chars2,
        |       len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
        |       ROUND(CAST(LENGTH(text) - (len(regexp_split_to_array(trim(text), '\s+')) - 1) AS DOUBLE)
        |             / len(regexp_split_to_array(trim(text), '\s+')), 6) AS mean_tok_len,
        |       ROUND(CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                    x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be'], x))) AS DOUBLE)
        |             / len(regexp_split_to_array(trim(text), '\s+')), 6) AS stop_ratio,
        |       ROUND(CAST(LENGTH(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS punct_ratio,
        |       ROUND(CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text), 6) AS alpha_ratio,
        |       ROUND(LEAST(1.0,
        |             (CAST(len(list_filter(regexp_split_to_array(trim(text), '\s+'),
        |                     x -> list_contains(['the','a','an','and','or','of','to','in','is','it','that','for','on','with','as','at','by','be'], x))) AS DOUBLE)
        |              / len(regexp_split_to_array(trim(text), '\s+'))) * 2.0
        |             + (CAST(LENGTH(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / LENGTH(text)) * 0.3
        |             + (CASE WHEN CAST(LENGTH(text) - (len(regexp_split_to_array(trim(text), '\s+')) - 1) AS DOUBLE)
        |                          / len(regexp_split_to_array(trim(text), '\s+')) BETWEEN 3.0 AND 10.0
        |                THEN 1.0 ELSE 0.5 END) * 0.3), 6) AS quality_score
        |FROM documents ORDER BY doc_id""".stripMargin

  /** DuckDB oracles for every entry — text_fingerprint's winnowing +
    * XXH64 digest is emulated in HUGEINT arithmetic (HashOracleSql). */
  /** The sentence-plant + extraction as a CTE both sentence oracles
    * share: the same whole-match grammar via RE2, 1-based subscripts
    * mapped to the engine's 0-based raw ordinal, blanks filtered AFTER
    * position assignment (the engine's filter-after-posexplode order). */
  private def sentCte: String =
    s"""sents AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS sent_pos, trim(x[i]) AS sentence
       |  FROM (SELECT doc_id, x, unnest(generate_series(1, len(x))) AS i
       |        FROM (SELECT doc_id, regexp_extract_all(
       |                       CASE WHEN doc_id % 4 = 0
       |                            THEN text || '$SentPlant'
       |                            ELSE text END, '$SentRe') AS x
       |              FROM documents) _) _
       |  WHERE length(trim(x[i])) > 0)""".stripMargin

  /** The repetition emulation as spliceable CTEs ending in
    * `rep(doc_id, n_tokens, n_distinct_tokens, top_bigram_n, n_bigrams,
    * is_repetitive)` — ONE definition for the standalone entry and the
    * curate cascade (r17), parameterized by source relation and the two
    * cross-multiplied integer thresholds. */
  private[ops] def repetitionCtes(src: String, topBigramPctMax: Int = 18,
      dupTokenPctMax: Int = 30): String =
    s"""rbase AS (
       |  SELECT doc_id, t, len(t) AS n_tokens,
       |         len(list_distinct(t)) AS n_distinct_tokens
       |  FROM (SELECT doc_id, ${Tokens.duckToks("text")} AS t
       |        FROM $src)),
       |rbi AS (
       |  SELECT doc_id, t[i] || ' ' || t[i + 1] AS gram
       |  FROM (SELECT doc_id, t, unnest(generate_series(1, len(t) - 1)) AS i
       |        FROM rbase WHERE len(t) >= 2)),
       |rbc AS (SELECT doc_id, gram, COUNT(*) AS c FROM rbi GROUP BY doc_id, gram),
       |rtop AS (SELECT doc_id, MAX(c) AS top_bigram_n,
       |                SUM(c) AS n_bigrams FROM rbc GROUP BY doc_id),
       |rep AS (
       |  SELECT b.doc_id,
       |         CAST(b.n_tokens AS BIGINT) AS n_tokens,
       |         CAST(b.n_distinct_tokens AS BIGINT) AS n_distinct_tokens,
       |         CAST(COALESCE(rtop.top_bigram_n, 0) AS BIGINT) AS top_bigram_n,
       |         CAST(COALESCE(rtop.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |         b.n_tokens > 0 AND
       |           (COALESCE(rtop.top_bigram_n, 0) * 100 > COALESCE(rtop.n_bigrams, 0) * $topBigramPctMax
       |            OR (b.n_tokens - b.n_distinct_tokens) * 100 > b.n_tokens * $dupTokenPctMax)
       |           AS is_repetitive
       |  FROM rbase b LEFT JOIN rtop USING (doc_id))""".stripMargin

  val oracle: Seq[(String, String)] = Seq(
    "text_sentences" ->
      s"""WITH $sentCte
         |SELECT doc_id, sent_pos, sentence FROM sents
         |ORDER BY doc_id, sent_pos""".stripMargin,
    // the canonical pick as a window (rn = 1 over (doc_id, sent_pos)
    // order ≡ the engine's min-struct aggregate), keep = unique OR
    // canonical, then the per-doc ordered rebuild
    "dedup_sentence_strip" ->
      s"""WITH $sentCte,
         |k AS (
         |  SELECT doc_id, sent_pos, sentence,
         |         COUNT(*) OVER (PARTITION BY sentence) AS n_occ,
         |         ROW_NUMBER() OVER (PARTITION BY sentence
         |                            ORDER BY doc_id, sent_pos) AS rn
         |  FROM sents)
         |SELECT doc_id, COUNT(*) AS n_kept,
         |       string_agg(sentence, ' ' ORDER BY sent_pos) AS text
         |FROM k WHERE n_occ = 1 OR rn = 1
         |GROUP BY doc_id ORDER BY doc_id""".stripMargin,
    // same sentence CTE + the shared tokenizer on each sentence; the
    // window formulation of the per-doc running sum, ordered rebuild via
    // string_agg — mirrors the engine's array_sort struct trick
    "text_chunk_sentences" ->
      s"""WITH $sentCte,
         |tok AS (
         |  SELECT doc_id, sent_pos, sentence,
         |         CAST(len(${Tokens.duckToks("sentence")}) AS BIGINT) AS n_tok
         |  FROM sents),
         |w AS (
         |  SELECT doc_id, sent_pos, sentence, n_tok,
         |         COALESCE(SUM(n_tok) OVER (PARTITION BY doc_id ORDER BY sent_pos
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM tok)
         |SELECT doc_id, CAST(cb // 32 AS BIGINT) AS chunk_id,
         |       COUNT(*) AS n_sents,
         |       CAST(SUM(n_tok) AS BIGINT) AS chunk_tokens,
         |       string_agg(sentence, ' ' ORDER BY sent_pos) AS chunk_text
         |FROM w GROUP BY doc_id, chunk_id
         |ORDER BY doc_id, chunk_id""".stripMargin,
    // the oracle can afford the direct string GROUP BY the engine's
    // hash-count + reduced join-back must equal
    "dedup_sentences" ->
      s"""WITH $sentCte
         |SELECT sentence,
         |       COUNT(DISTINCT doc_id) AS n_docs,
         |       COUNT(*) AS n_occ
         |FROM sents GROUP BY sentence
         |HAVING COUNT(DISTINCT doc_id) >= 2
         |ORDER BY sentence""".stripMargin,
    // same tokenization as text_chunk's oracle; the bigram at 1-based
    // token position i is t[i] || ' ' || t[i+1], thresholds compared as
    // cross-multiplied integers exactly like the engine
    "text_repetition" ->
      s"""WITH ${repetitionCtes("documents")}
         |SELECT doc_id, n_tokens, n_distinct_tokens, top_bigram_n,
         |       n_bigrams, is_repetitive
         |FROM rep ORDER BY doc_id""".stripMargin,
    "text_contamination" -> HashOracleSql.contamination,
    "text_novelty" -> HashOracleSql.novelty,
    // DuckDB string literals do NOT process backslashes, so the Scala
    // pattern text embeds verbatim; 'g' makes regexp_replace global like
    // Spark's default
    "text_pii_scrub" -> {
      val syn = """text || ' contact user' || doc_id || '@corp.example from 10.0.' ||
                  |              (doc_id % 256) || '.' || ((doc_id * 7) % 256) ||
                  |              ' card 4111111111111' || (100 + doc_id % 900)""".stripMargin
      s"""WITH p AS (
         |  SELECT doc_id,
         |         $syn AS text
         |  FROM documents)
         |SELECT doc_id,
         |       len(regexp_extract_all(text, '$EmailRe')) AS n_emails,
         |       len(regexp_extract_all(text, '$Ipv4Re')) AS n_ips,
         |       len(regexp_extract_all(text, '$LongIdRe')) AS n_ids,
         |       regexp_replace(regexp_replace(regexp_replace(text,
         |         '$EmailRe', '[EMAIL]', 'g'),
         |         '$Ipv4Re', '[IP]', 'g'),
         |         '$LongIdRe', '[ID]', 'g') AS clean_text
         |FROM p ORDER BY doc_id""".stripMargin
    },
    "text_fingerprint" -> HashOracleSql.fingerprint,
    "text_tokens" ->
      """SELECT doc_id, LENGTH(text) AS n_chars2,
        |       len(regexp_split_to_array(trim(text), '\s+')) AS n_ws_tokens,
        |       len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS n_bpeish_tokens
        |FROM documents ORDER BY doc_id""".stripMargin,
    "text_quality" -> textQualityOracleSql,
    // the same planting rule and the duckToks tokenizer mirror (RE2 script
    // classes ≡ Java's Is-script classes on these codepoints); the tail
    // slice uses the same greatest() rule on both sides
    "text_tokens_cjk" ->
      s"""WITH planted AS (
         |  SELECT doc_id,
         |         CASE WHEN doc_id % 3 = 0
         |              THEN text || ' 机器学习模型 processes こんにちは世界 and 한국어 text'
         |              ELSE text END AS text
         |  FROM documents),
         |tok AS (SELECT doc_id, ${Tokens.duckToks("text")} AS t FROM planted)
         |SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
         |       array_to_string(t[greatest(len(t) - 11, 1):len(t)], ' ') AS tail_toks
         |FROM tok ORDER BY doc_id""".stripMargin,
    // wraps the SAME quality-score SQL (no drift) and re-ranks it with a
    // window — the oracle can afford the full-shuffle formulation the
    // engine's bounded TopK aggregate avoids; ties break (score DESC,
    // doc_id) on both sides
    "text_topk_quality" ->
      s"""SELECT lang, CAST(rn AS INT) AS rank, doc_id, quality_score FROM (
         |  SELECT d.lang, q.doc_id, q.quality_score,
         |         ROW_NUMBER() OVER (PARTITION BY d.lang
         |           ORDER BY q.quality_score DESC, q.doc_id) AS rn
         |  FROM ($textQualityOracleSql) q JOIN documents d USING (doc_id)) t
         |WHERE rn <= 3 ORDER BY lang, rank""".stripMargin,
    "text_filter_pipeline" ->
      s"""SELECT doc_id, n_tokens, quality_score FROM ($textQualityOracleSql) q
         |WHERE n_tokens BETWEEN 20 AND 2000 AND quality_score >= 0.5
         |ORDER BY doc_id""".stripMargin,
    // the same planted mess (tab + decomposed e-acute + ragged tail) and
    // the same three normalization steps; DuckDB's nfc_normalize and
    // Java's Normalizer both implement UAX#15 NFC, and the control-char
    // class is spelled out so both regex engines see identical semantics
    // the same page-template rule, with the expected prose spelled out:
    // title + h1 text survive, style/script/comment content does not,
    // " &amp;&nbsp;done" decodes to " & done", whitespace collapses
    "text_extract_html" ->
      s"""SELECT doc_id,
         |       ${htmlExtractedSql("text")} AS text
         |FROM documents ORDER BY doc_id""".stripMargin,
    "text_normalize" ->
      """WITH planted AS (
        |  SELECT doc_id,
        |         CASE WHEN doc_id % 10 = 0
        |              THEN text || chr(9) || 'cafe' || chr(769) || '  ' || chr(10)
        |              ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id,
        |       trim(regexp_replace(regexp_replace(nfc_normalize(text),
        |            '[\x00-\x1f\x7f]', ' ', 'g'), '\s+', ' ', 'g')) AS norm_text
        |FROM planted ORDER BY doc_id""".stripMargin,
    // mirror of languageId: the same planted CJK-family paragraphs, then
    // script ratios decide ja/ko/zh BEFORE the Latin stopword cascade
    // (kana > 0.05 → ja; hangul > 0.3 → ko; han > 0.3 → zh); ties break
    // in profile order (en, es, de, fr) via the CASE cascade
    "text_langid" ->
      s"""WITH planted AS (
        |  SELECT doc_id, lang,
        |         CASE WHEN doc_id % 17 = 0 THEN '$JaSnippet'
        |              WHEN doc_id % 19 = 0 THEN '$KoSnippet'
        |              WHEN doc_id % 23 = 0 THEN '$ZhSnippet'
        |              ELSE text END AS text
        |  FROM documents)
        |SELECT doc_id, lang AS labeled_lang,
        |       CASE WHEN kana_ratio > 0.05 THEN 'ja'
        |            WHEN hangul_ratio > 0.3 THEN 'ko'
        |            WHEN han_ratio > 0.3 THEN 'zh'
        |            WHEN en >= es AND en >= de AND en >= fr THEN 'en'
        |            WHEN es >= de AND es >= fr THEN 'es'
        |            WHEN de >= fr THEN 'de'
        |            ELSE 'fr' END AS pred_lang
        |FROM (
        |  SELECT doc_id, lang,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{3040}-\\x{30ff}]', '', 'g')) AS DOUBLE)
        |      / GREATEST(LENGTH(text), 1) AS kana_ratio,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{ac00}-\\x{d7af}]', '', 'g')) AS DOUBLE)
        |      / GREATEST(LENGTH(text), 1) AS hangul_ratio,
        |    CAST(LENGTH(text) - LENGTH(regexp_replace(text, '[\\x{4e00}-\\x{9fff}]', '', 'g')) AS DOUBLE)
        |      / GREATEST(LENGTH(text), 1) AS han_ratio,
        |    len(list_intersect(toks, ['the','and','of','to','in','is','that','it','for','with'])) AS en,
        |    len(list_intersect(toks, ['el','la','de','que','y','en','un','una','los','por'])) AS es,
        |    len(list_intersect(toks, ['der','die','das','und','ist','von','mit','den','ein','nicht'])) AS de,
        |    len(list_intersect(toks, ['le','la','les','de','et','est','un','une','dans','pour'])) AS fr
        |  FROM (SELECT doc_id, lang, text,
        |          list_distinct(regexp_split_to_array(lower(text), '\\s+')) AS toks
        |        FROM planted) raw ) scored
        |ORDER BY doc_id""".stripMargin,
  )
}
