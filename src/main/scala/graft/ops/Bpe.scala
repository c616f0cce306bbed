package graft.ops

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-pair-encoding subword tokenization (Sennrich et al. 2016, the
  * public merge-table algorithm) — the token-GRANULAR tier's fidelity
  * upgrade: chunking, packing, token-budget sampling and BM25 lengths all
  * measure [[Tokens.seg]] words, but real training budgets are counted in
  * BPE/SentencePiece subwords, and a whitespace proxy misbudgets code,
  * CJK, and URL-heavy text by 2–5×. This module trains a merge table
  * deterministically on the reference slice, persists it with the
  * stored-model pattern ([[Fluency.ensureLmModel]]'s fingerprint-staged
  * layout), and applies it with a native expression — no UDF, no token
  * strings crossing an exchange.
  *
  * Determinism contract (every rule mirrored by the DuckDB oracle):
  *  - training sample: docs with `doc_id % 5 = 0`, first 512 chars,
  *    [[Tokens.seg]] words that are printable ASCII (`^[!-~]+$`), top
  *    [[MaxWords]] distinct words by (count DESC, word ASC) — a BOUNDED
  *    word-frequency dict (≤ 4096 rows collected, the only driver
  *    state; at 100 TB the same rule samples the corpus instead of
  *    scanning it, which is how production tokenizers are trained);
  *  - init: a word is its codepoint sequence;
  *  - iterate [[NMerges]] times: count adjacent symbol pairs (weighted
  *    by word frequency, overlapping occurrences each count), pick the
  *    most frequent with count ≥ 2 — ties break (left ASC, right ASC) —
  *    and merge its occurrences LEFT-TO-RIGHT NON-OVERLAPPING in every
  *    word; stop early when no pair repeats;
  *  - apply: the learned rules in rank order, same scan rule. Rank order
  *    is equivalent to the classic lowest-rank-first loop because a
  *    merge can only create pairs involving its OWN new symbol, never a
  *    new occurrence of an earlier rule's pair.
  *
  * The oracle emulates both halves in SQL ([[trainCtes]]/[[applyStages]]):
  * symbols ride a `chr(31)`-wrapped string (`␟sym␟` concatenated, so a
  * merge is one `replace('␟a␟␟b␟' → '␟ab␟')` — flanking separators make
  * cross-symbol false matches impossible and SQL replace's left-to-right
  * non-overlap IS the scan rule), unrolled over NMerges materialized
  * stages — the [[HashOracleSql]] staged-emulation technique. */
object Bpe {

  /** Merge-table size. 40 keeps the unrolled oracle chain tractable while
    * the word-salad corpus converges (most late stages learn whole
    * frequent words). */
  val NMerges = 40
  /** Training dict bound: top distinct words by (freq DESC, word ASC). */
  val MaxWords = 4096
  private val SampleMod = 5
  private val SampleChars = 512

  // ---------------------------------------------------------------- train

  /** In-memory BPE training over a word-frequency dict (already bounded
    * by [[MaxWords]]); pure so the spec fixtures pin it directly. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int = NMerges): Seq[(String, String)] = {
    // per-word symbol state, keyed by the (distinct) word
    val state = scala.collection.mutable.LinkedHashMap.empty[String, (Array[String], Long)]
    wordCounts.foreach { case (w, f) => state(w) = (symsOf(w), f) }
    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    var exhausted = false
    while (k < nMerges && !exhausted) {
      val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
      state.valuesIterator.foreach { case (syms, f) =>
        var i = 0
        while (i < syms.length - 1) {
          val p = (syms(i), syms(i + 1))
          counts(p) = counts.getOrElse(p, 0L) + f
          i += 1
        }
      }
      counts.iterator.filter(_._2 >= 2L)
        .minByOption { case ((a, b), f) => (-f, a, b) } match {
        case None => exhausted = true
        case Some((pair, _)) =>
          merges += pair
          state.mapValuesInPlace { case (_, (syms, f)) => (mergeOnce(syms, pair), f) }
          k += 1
      }
    }
    merges.toSeq
  }

  /** One merge rule applied left-to-right, non-overlapping — the scan the
    * SQL `replace` on the wrapped representation performs. */
  private[graft] def mergeOnce(syms: Array[String], pair: (String, String)): Array[String] = {
    val (a, b) = pair
    val out = scala.collection.mutable.ArrayBuffer.empty[String]
    var i = 0
    while (i < syms.length) {
      if (i + 1 < syms.length && syms(i) == a && syms(i + 1) == b) {
        out += (a + b); i += 2
      } else { out += syms(i); i += 1 }
    }
    out.toArray
  }

  /** Encode one word: codepoint symbols, then the merge rules in rank
    * order. Exposed for the spec fixtures. */
  def encode(word: String, merges: Seq[(String, String)]): Seq[String] = {
    var syms = symsOf(word)
    merges.foreach(m => syms = mergeOnce(syms, m))
    syms.toSeq
  }

  /** A word's initial symbols: one per CODEPOINT (supplementary plane
    * kept whole — the same contract as the shingle tier and the oracle's
    * per-codepoint `string_split_regex(w, '')`). */
  private def symsOf(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** The bounded, SQL-mirrorable training sample of an sfDir's documents
    * table: word-frequency dict rows (word, count). */
  private def sampleWordCounts(spark: SparkSession, sfDir: String): Seq[(String, Long)] =
    Tables.load(spark, sfDir, "documents")
      .filter(col("doc_id") % SampleMod === 0)
      .select(explode(Tokens.seg(substring(col("text"), 1, SampleChars))).as("w"))
      .filter(col("w").rlike("^[!-~]+$"))
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(MaxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq // bounded: ≤ MaxWords rows

  /** Fingerprint-staged merge table for an sfDir (the stored-model
    * pattern): train once per corpus fingerprint, serve many. */
  def ensureModel(spark: SparkSession, sfDir: String): String = {
    val dir = Dedup.fingerprintedDir("graft-bpemodel", "documents",
      s"$sfDir:$NMerges:$MaxWords", Seq(s"$sfDir/documents.parquet"))
    Dedup.stageAtomically(dir) { tmp =>
      val merges = train(sampleWordCounts(spark, sfDir))
      val s = spark
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.parquet(tmp.getPath)
    }
  }

  /** Load a persisted merge table in rank order — a bounded ≤ [[NMerges]]
    * row read, the model the scoring expression embeds. */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(dir).select("rank", "left", "right")
      .collect() // bounded: <= NMerges rows
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  // ---------------------------------------------------------------- apply

  /** Native subword counter: segments with THE shared tokenizer rule
    * ([[Tokens.segString]]) and BPE-encodes each word against the
    * embedded merge table — one map-side expression, zero exchanges, no
    * token strings materialized into the plan. Returns 0 for a wordless
    * document (matching the oracle's COALESCE(…, 0)). */
  case class BpeTokenCount(child: Expression, merges: Seq[(String, String)])
      extends UnaryExpression with CodegenFallback {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_token_count"

    @transient private lazy val mergeArr: Array[(String, String)] = merges.toArray
    // per-thread word → subword-count memo: corpus vocabularies are small
    // and Zipfian, so most evals are a hash probe; ThreadLocal because a
    // local-mode plan can share one expression instance across tasks.
    // Bounded: cleared at 1 << 16 entries (≈ a few MB of short strings).
    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, java.lang.Integer]](
        () => new java.util.HashMap[String, java.lang.Integer]())

    private def countWord(w: String): Int = {
      val m = memo.get()
      val hit = m.get(w)
      if (hit != null) return hit.intValue()
      var syms = symsOf(w)
      var i = 0
      while (i < mergeArr.length && syms.length > 1) {
        syms = mergeOnce(syms, mergeArr(i)); i += 1
      }
      if (m.size >= 65536) m.clear()
      m.put(w, syms.length)
      syms.length
    }

    override def nullSafeEval(in: Any): Any = {
      val words = Tokens.segString(in.asInstanceOf[UTF8String].toString)
      var total = 0L
      var wi = 0
      while (wi < words.length) { total += countWord(words(wi)); wi += 1 }
      total
    }
    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[BpeTokenCount]]. */
  def bpe_tokens(text: Column, merges: Seq[(String, String)]): Column =
    GraftSqlBridge.column(BpeTokenCount(GraftSqlBridge.expression(text), merges))

  // --------------------------------------------------------------- oracle

  /** `chr(31)`-wrapped symbol string of a word expression. */
  private def wrap(e: String): String =
    s"list_aggregate(list_transform(string_split_regex($e, ''), " +
      "c -> chr(31)||c||chr(31)), 'string_agg', '')"

  private def mergeReplace(src: String): String =
    s"CASE WHEN b.a IS NULL THEN $src ELSE replace($src, " +
      "chr(31)||b.a||chr(31)||chr(31)||b.b||chr(31), " +
      "chr(31)||b.a||b.b||chr(31)) END"

  /** Training-emulation CTEs: `sample`, `st0..stN`, and per rank k the
    * pair counts `prk`, the chosen pair `bpk` (empty once no pair
    * repeats — later stages then no-op via the LEFT JOIN), and the
    * rewritten dict `stk`. The apply chain joins the `bpk` CTEs. */
  private def trainCtes: Seq[String] = {
    val sample =
      s"""sample AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS cnt FROM (
         |    SELECT unnest(${Tokens.duckToks(s"substring(text, 1, $SampleChars)")}) AS w
         |    FROM documents WHERE doc_id % $SampleMod = 0) _
         |  WHERE regexp_matches(w, '^[!-~]+${"$"}')
         |  GROUP BY w ORDER BY cnt DESC, w LIMIT $MaxWords)""".stripMargin
    val st0 = s"st0 AS MATERIALIZED (SELECT w, cnt, ${wrap("w")} AS repr FROM sample)"
    val stages = (1 to NMerges).flatMap { k =>
      Seq(
        s"""pr$k AS MATERIALIZED (
           |  SELECT a, b, SUM(cnt) AS f FROM (
           |    SELECT cnt, syms[i] AS a, syms[i+1] AS b FROM (
           |      SELECT cnt, syms, unnest(generate_series(1, len(syms)-1)) AS i FROM (
           |        SELECT cnt, list_transform(string_split(repr, chr(31)||chr(31)),
           |                                   s -> trim(s, chr(31))) AS syms
           |        FROM st${k - 1}) _) _) _
           |  GROUP BY a, b)""".stripMargin,
        s"bp$k AS MATERIALIZED (SELECT a, b FROM pr$k WHERE f >= 2 ORDER BY f DESC, a, b LIMIT 1)",
        s"""st$k AS MATERIALIZED (
           |  SELECT w, cnt, ${mergeReplace("repr")} AS repr
           |  FROM st${k - 1} LEFT JOIN bp$k b ON TRUE)""".stripMargin)
    }
    (sample +: st0 +: stages)
  }

  /** Apply-emulation CTEs over a word-occurrence CTE `wordsCte(keys…, w)`:
    * `aw0..awN` rewriting each occurrence through the learned rules, then
    * `bpeCounted(keys…, n_bpe)`. */
  private def applyStages(wordsCte: String, keys: String): Seq[String] = {
    val aw0 = s"aw0 AS MATERIALIZED (SELECT $keys, ${wrap("w")} AS repr FROM $wordsCte)"
    val rest = (1 to NMerges).map { k =>
      s"""aw$k AS MATERIALIZED (
         |  SELECT $keys, ${mergeReplace("repr")} AS repr
         |  FROM aw${k - 1} LEFT JOIN bp$k b ON TRUE)""".stripMargin
    }
    val counted =
      s"""bpeCounted AS MATERIALIZED (
         |  SELECT $keys, CAST(SUM((length(repr) - length(replace(repr, chr(31), ''))) // 2) AS BIGINT) AS n_bpe
         |  FROM aw$NMerges GROUP BY $keys)""".stripMargin
    rest.prepended(aw0) :+ counted
  }

  // -------------------------------------------------------------- entries

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // per-document subword budget vs the whitespace proxy — the number a
    // token-budget sampler or packer should actually be spending
    "text_tokens_bpe" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      Tables.load(s, d, "documents")
        .select(col("doc_id"),
          bpe_tokens(col("text"), merges).as("n_bpe"),
          size(Tokens.seg(col("text"))).cast("long").as("n_ws"))
        .orderBy("doc_id")
    }),
    // the packing plan parameterized by the tokenizer: same two-phase
    // prefix-sum pack ([[Chunking.packChunks]]), budgeted in SUBWORDS —
    // proof the pipeline's token accounting is pluggable end to end
    "chunk_pack_bpe" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      val ch = Chunking.chunk(Tables.load(s, d, "documents"))
        .withColumn("bpe_tokens", bpe_tokens(col("chunk_text"), merges))
      Chunking.packChunks(ch, capacity = 256, tokCol = "bpe_tokens")
        .select("doc_id", "chunk_id", "bpe_tokens", "seq_id", "seq_offset")
        .orderBy("doc_id", "chunk_id")
    }),
    // the MODEL itself under the gate: the persisted merge table must
    // equal, rank by rank, what the oracle's unrolled training stages
    // derive from the same sample — the most direct pin on the training
    // half (the counting entries pin it only through their sums)
    "text_bpe_vocab" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "left", "right")
        .orderBy("rank")
    }),
    // the budget tier under subword accounting: the SAME mass-rate
    // sampler ([[Sampling.tokenBudgetSample]]), per-stratum token masses
    // measured in BPE subwords — a source whose text is subword-dense
    // (code, URLs) now weighs what a trainer would actually spend on it
    "sample_token_budget_bpe" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      Sampling.tokenBudgetSample(Tables.load(s, d, "documents"),
        tokenCount = bpe_tokens(col("text"), merges))
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")
    }))

  val oracle: Seq[(String, String)] = {
    val tokensSql = {
      val words = s"(SELECT doc_id, unnest(${Tokens.duckToks("text")}) AS w FROM documents) _"
      val ctes = trainCtes ++ applyStages(words, "doc_id")
      // NULL text stays NULL (the expression's null-in/null-out, matching
      // n_ws's size-of-null); a wordless NON-null text counts 0
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE COALESCE(t.n_bpe, 0) END AS n_bpe,
         |       CAST(len(${Tokens.duckToks("d.text")}) AS BIGINT) AS n_ws
         |FROM documents d LEFT JOIN bpeCounted t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    val packSql = {
      // the chunk derivation of text_chunk's oracle, then each chunk's
      // words through the SAME apply chain, then chunk_pack's prefix sum
      val chunkCte =
        s"""ch AS MATERIALIZED (
           |  SELECT doc_id,
           |         CAST(s // 24 AS BIGINT) AS chunk_id,
           |         array_to_string(t[s + 1 : least(s + 32, n)], ' ') AS chunk_text
           |  FROM (SELECT doc_id, t, len(t) AS n,
           |               unnest(generate_series(0, len(t) - 1, 24)) AS s
           |        FROM (SELECT doc_id, ${Tokens.duckToks("text")} AS t FROM documents)
           |        WHERE len(t) > 0))""".stripMargin
      val words =
        s"(SELECT doc_id, chunk_id, unnest(${Tokens.duckToks("chunk_text")}) AS w FROM ch) _"
      val ctes = (trainCtes :+ chunkCte) ++ applyStages(words, "doc_id, chunk_id")
      s"""WITH ${ctes.mkString(",\n")},
         |w AS (
         |  SELECT doc_id, chunk_id, n_bpe AS bpe_tokens,
         |         COALESCE(SUM(n_bpe) OVER (
         |           ORDER BY doc_id, chunk_id
         |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
         |  FROM bpeCounted)
         |SELECT doc_id, chunk_id, bpe_tokens,
         |       CAST(cb // 256 AS BIGINT) AS seq_id,
         |       CAST(cb % 256 AS BIGINT) AS seq_offset
         |FROM w ORDER BY doc_id, chunk_id""".stripMargin
    }
    val budgetSql = {
      // the sample_token_budget oracle with its tok CTE swapped to the
      // BPE apply chain — same totals, same rate arithmetic, same bucket
      val words = s"(SELECT doc_id, unnest(${Tokens.duckToks("text")}) AS w FROM documents) _"
      val ctes = trainCtes ++ applyStages(words, "doc_id")
      s"""WITH ${ctes.mkString(",\n")},
         |tok AS (
         |  SELECT d.doc_id, d.source,
         |         CASE WHEN d.text IS NULL THEN NULL
         |              ELSE COALESCE(t.n_bpe, 0) END AS n_tok
         |  FROM documents d LEFT JOIN bpeCounted t USING (doc_id)),
         |tot AS (SELECT source, CAST(SUM(n_tok) AS BIGINT) AS total
         |        FROM tok GROUP BY source),
         |r AS (SELECT source,
         |             least(1000, (SELECT MIN(total) FROM tot) * 1000 // total) AS rate
         |      FROM tot)
         |SELECT t.doc_id, t.source, t.n_tok
         |FROM tok t JOIN r USING (source)
         |WHERE ((t.doc_id % 1000003) * 2246822519) % 1000 < r.rate
         |ORDER BY t.doc_id""".stripMargin
    }
    val vocabSql = {
      // rank k's merge is bpk's single row; empty stages (post-exhaustion)
      // contribute nothing, exactly like the engine's early stop
      val ranks = (1 to NMerges)
        .map(k => s"SELECT CAST($k AS BIGINT) AS rank, a AS \"left\", b AS \"right\" FROM bp$k")
        .mkString("\nUNION ALL\n")
      s"""WITH ${trainCtes.mkString(",\n")}
         |SELECT rank, "left", "right" FROM ($ranks) ORDER BY rank""".stripMargin
    }
    Seq("text_tokens_bpe" -> tokensSql, "chunk_pack_bpe" -> packSql,
      "sample_token_budget_bpe" -> budgetSql, "text_bpe_vocab" -> vocabSql)
  }
}
