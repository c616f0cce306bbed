package graft.ops

import graft.Tables

import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}
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
  /** Production-shape merge-table CAPACITY (r15): real tokenizers carry
    * 32k–100k merges. Training still stops early when no pair repeats —
    * on a given corpus the learned table is however many merges the dict
    * supports, up to this cap. The 40-merge oracle entries stay as the
    * semantic pin; the large table's first [[NMerges]] ranks are ALSO
    * oracle-pinned (`text_bpe_vocab_large` — greedy training is
    * prefix-stable, so cap size never changes earlier ranks), and the
    * tail is pinned by the trainFast ≡ train / encode ≡ rank-priority
    * property specs ([[graft.BpeLargeProps]]). */
  val NMergesLarge = 32768
  /** Large-model dict bound (the 100 TB sampling note on
    * [[sampleWordCounts]] applies unchanged: at corpus scale the same
    * rule samples instead of scanning). */
  val MaxWordsLarge = 65536
  private val SampleMod = 5
  private val SampleChars = 512

  /** The document-separator SENTINEL id of the packed-ids artifact
    * (`chunk_pack_ids_eos`): −1 sits outside BOTH id spaces BY
    * CONSTRUCTION (base ids are codepoints ≥ 0, merged ids ≥ the merged
    * base), so no text at any scale can collide with it — where a
    * reserved codepoint could. The serving vocab reserves its slot as
    * [[EosToken]] (the LAST vocab id, the GPT-2 convention) and
    * [[BpeDecodeIds]] renders it as that token string (r16) — a
    * separator is not corruption; corrupt ids still degrade to U+FFFD. */
  val EosId: Int = -1

  /** The document separator's surface form in the exported vocab and in
    * decode output — GPT-2's public end-of-text marker. */
  val EosToken: String = "<|endoftext|>"

  /** Id-window length of the packed-ids decontamination guard
    * (`chunk_decontaminate`): 8 consecutive token IDS — the n-gram
    * granularity production decontamination runs on the PACKED stream
    * (text-level matching misses benchmark strings that survive
    * chunking; the 32/24 chunk overlap guarantees every 8-token text
    * window lies wholly inside some chunk, and the [[EosId]] separator
    * naturally stops windows from crossing documents). */
  val DecontamWindow = 8

  // ---------------------------------------------------------------- train

  /** In-memory BPE training over a word-frequency dict (already bounded
    * by [[MaxWords]]); pure so the spec fixtures pin it directly. This is
    * the NAIVE reference implementation (full pair recount per merge) the
    * DuckDB oracle stages mirror one-to-one; [[trainFast]] is the
    * production-capacity trainer, property-pinned extensionally equal. */
  def train(wordCounts: Seq[(String, Long)], nMerges: Int = NMerges,
      syms: String => Array[String] = symsOf): Seq[(String, String)] = {
    // per-word symbol state, keyed by the (distinct) word
    val state = scala.collection.mutable.LinkedHashMap.empty[String, (Array[String], Long)]
    wordCounts.foreach { case (w, f) => state(w) = (syms(w), f) }
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

  /** [[train]] at production vocabulary size: incremental pair-count
    * maintenance (the public subword-nmt / HuggingFace-tokenizers
    * training shape) instead of the naive full recount per merge. The
    * naive loop is O(nMerges × Σ wordlen) — fine at 40 merges, ~10⁹
    * hash operations at 32k — while this keeps
    *  - `counts`: pair → summed frequency,
    *  - `where`:  pair → word indexes that contained it when last
    *    counted (stale entries tolerated, re-checked on use),
    *  - `queue`:  a TreeSet ordered by (−freq, left, right) whose head
    *    IS [[train]]'s minByOption pick,
    * and on each merge re-counts ONLY the words containing the merged
    * pair. Produces the IDENTICAL merge sequence (tie-breaks included) —
    * property-pinned against [[train]] on random dicts
    * ([[graft.BpeLargeProps]]). Pure driver-side computation over the
    * bounded dict: the corpus never participates beyond the dict
    * aggregate. */
  def trainFast(wordCounts: Seq[(String, Long)], nMerges: Int,
      syms: String => Array[String] = symsOf): Seq[(String, String)] = {
    val words = wordCounts.map { case (w, _) => syms(w) }.toArray
    val freqs = wordCounts.map(_._2).toArray
    val counts = scala.collection.mutable.HashMap.empty[(String, String), Long]
    val where = scala.collection.mutable.HashMap
      .empty[(String, String), scala.collection.mutable.Set[Int]]
    implicit val ord: Ordering[(Long, String, String)] =
      Ordering.Tuple3(Ordering.Long.reverse, Ordering.String, Ordering.String)
    val queue = scala.collection.mutable.TreeSet.empty[(Long, String, String)]

    def bump(pair: (String, String), delta: Long, wi: Int): Unit = {
      val old = counts.getOrElse(pair, 0L)
      if (old != 0L) queue.remove((old, pair._1, pair._2))
      val nw = old + delta
      if (nw != 0L) { counts(pair) = nw; queue.add((nw, pair._1, pair._2)) }
      else counts.remove(pair)
      if (delta > 0L)
        where.getOrElseUpdate(pair, scala.collection.mutable.Set.empty) += wi
    }
    def countWordPairs(wi: Int, delta: Long): Unit = {
      val s = words(wi); val f = freqs(wi)
      var i = 0
      while (i < s.length - 1) { bump((s(i), s(i + 1)), delta * f, wi); i += 1 }
    }
    words.indices.foreach(countWordPairs(_, 1L))

    val merges = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
    var k = 0
    while (k < nMerges && queue.nonEmpty && queue.head._1 >= 2L) {
      val (_, a, b) = queue.head
      val pair = (a, b)
      merges += pair
      // re-count only the words that (possibly stale) contained the pair
      val touched = where.remove(pair).getOrElse(scala.collection.mutable.Set.empty)
      touched.foreach { wi =>
        val merged = mergeOnce(words(wi), pair)
        if (!(merged sameElements words(wi))) {
          countWordPairs(wi, -1L)
          words(wi) = merged
          countWordPairs(wi, 1L)
        }
      }
      // the merged pair itself must be gone (mergeOnce eliminates every
      // occurrence in one pass — see the countWord scaladoc argument)
      assert(!counts.contains(pair),
        s"bpe trainFast invariant: pair $pair survived its own merge")
      k += 1
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

  /** Rank key for [[encodeFast]]'s lookup map: a space can never occur
    * inside a symbol — symbols concatenate codepoints of ONE
    * whitespace-split [[Tokens.segString]] word (or hex pairs), so the
    * space-joined key is collision-free. */
  private def rankKey(a: String, b: String): String = a + " " + b

  /** Rank-lookup map of a merge table (rank = position, lower = earlier). */
  def rankMap(merges: Seq[(String, String)]): java.util.HashMap[String, java.lang.Integer] = {
    // java.lang.Integer values ON PURPOSE: a [String, Int] map would make
    // Scala unbox a missing key's null to 0 — i.e. every absent pair would
    // read as the BEST rank
    val m = new java.util.HashMap[String, java.lang.Integer](merges.size * 2)
    merges.iterator.zipWithIndex.foreach { case ((a, b), i) =>
      // first (lowest) rank wins if a pair ever re-appeared in a table
      m.putIfAbsent(rankKey(a, b), i)
    }
    m
  }

  /** [[encode]] by lowest-rank-first merging — the classic BPE apply loop
    * (O(len² · probe) per word instead of O(nMerges × len), the shape a
    * 32k-rule table needs): repeatedly find the adjacent pair with the
    * LOWEST rank present and merge all its occurrences left-to-right
    * non-overlapping. Equivalent to the rank-sequential scan because
    * (a) a merge only creates pairs involving its own new symbol, and any
    * rule mentioning that symbol has a HIGHER rank (the symbol did not
    * exist at earlier training stages), so merging never re-enables an
    * earlier rule; and (b) one left-to-right non-overlapping pass
    * eliminates every occurrence of its pair (each surviving position is
    * examined; new adjacencies involve the merged symbol, not the pair).
    * Property-pinned against [[encode]] on random tables
    * ([[graft.BpeLargeProps]]). */
  def encodeFast(syms0: Array[String],
      ranks: java.util.HashMap[String, java.lang.Integer]): Array[String] = {
    var syms = syms0
    var done = false
    while (!done && syms.length > 1) {
      var best = Int.MaxValue
      var bestA: String = null
      var bestB: String = null
      var i = 0
      while (i < syms.length - 1) {
        val r = ranks.get(rankKey(syms(i), syms(i + 1)))
        if (r != null && r.intValue() < best) {
          best = r.intValue(); bestA = syms(i); bestB = syms(i + 1)
        }
        i += 1
      }
      if (best == Int.MaxValue) done = true
      else syms = mergeOnce(syms, (bestA, bestB))
    }
    syms
  }

  /** A word's initial symbols: one per CODEPOINT (supplementary plane
    * kept whole — the same contract as the shingle tier and the oracle's
    * per-codepoint `string_split_regex(w, '')`). */
  private def symsOf(word: String): Array[String] =
    word.codePoints().toArray.map(cp => new String(Character.toChars(cp)))

  /** Byte-level symbols (the GPT-2 variant, Radford et al. 2019): a
    * word's UTF-8 bytes as two-char uppercase hex — a 256-symbol base
    * alphabet that covers EVERY string, so no word is ever outside the
    * model (the codepoint variant's ASCII training filter leaves CJK and
    * accented words tokenizing as raw codepoints). Hex-pair spelling is
    * shared with the oracle (`hex(encode(w))` split into 2-char groups);
    * merged symbols concatenate to longer hex strings, and a symbol
    * count is a symbol count regardless of spelling. */
  private[graft] def symsOfBytes(word: String): Array[String] = {
    val bs = word.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    val out = new Array[String](bs.length)
    var i = 0
    while (i < bs.length) { out(i) = "%02X".format(bs(i)); i += 1 }
    out
  }

  /** A trainable model variant: the constants that define its sample,
    * dict, alphabet, and capacity — ONE definition so the fingerprint
    * salt, the era record, and the oracle emulation all derive from the
    * same values and cannot drift. */
  private[graft] final case class ModelSpec(tag: String, nMerges: Int,
      maxWords: Int, byteLevel: Boolean, plant: Boolean = false,
      gpt2: Boolean = false) {
    /** Byte-level covers every string; the codepoint variant trains on
      * printable-ASCII words only (non-ASCII tokenize as raw codepoints). */
    def asciiOnly: Boolean = !byteLevel
    def syms: String => Array[String] = if (byteLevel) symsOfBytes else symsOf
    /** Pre-tokenization rule of this spec: the shared whitespace+CJK
      * segmentation, or the GPT-2 contraction-aware split (r16). */
    def segColumn: Column => Column =
      if (gpt2) Tokens.gpt2Seg else Tokens.seg
    def duckToksOf(textExpr: String): String =
      if (gpt2) Tokens.duckGpt2Toks(textExpr) else Tokens.duckToks(textExpr)
    /** EVERY training constant rides the salt (r14 advisory: a salt that
      * omitted SampleMod/SampleChars served a stale cached table after a
      * constant change); SegV/Gpt2V version the segmentation rule itself,
      * [[HfLayoutV]] the staged dir layout (adding a file to the layout
      * must rebuild cached dirs — they are commit-immutable). */
    def salt(sfDir: String): String =
      s"$sfDir:$tag:$nMerges:$maxWords:$byteLevel:$plant:$SampleMod:$SampleChars:" +
        (if (gpt2) Tokens.Gpt2V else Tokens.SegV) + s":$HfLayoutV"
  }
  private[graft] val SpecOracle = ModelSpec("cp40", NMerges, MaxWords, byteLevel = false)
  private[graft] val SpecLarge = ModelSpec("cp32k", NMergesLarge, MaxWordsLarge, byteLevel = false)
  private[graft] val SpecBytes =
    ModelSpec("b40", NMerges, MaxWords, byteLevel = true, plant = true)
  /** Byte-level under GPT-2 pre-tokenization — the full production
    * contract (Radford et al. 2019): whitespace and space-prefixed
    * pre-tokens enter the dict, so the model learns leading-space
    * subwords the whitespace segmentation never sees. */
  private[graft] val SpecGpt2 =
    ModelSpec("g2-40", NMerges, MaxWords, byteLevel = true, plant = true,
      gpt2 = true)

  /** Planted multiscript payload for the byte-level tier (the corpus is
    * clean ASCII, so byte-level coverage is exercised on planted text —
    * the same fixture pattern as `text_tokens_cjk`/`text_langid`): every
    * 3rd document gains Han + Hiragana + Katakana + Hangul runs and a
    * mixed-script URL. 33 distinct CJK codepoints ON PURPOSE: each needs
    * 2 byte merges to compress to one symbol, so a 40-rule table cannot
    * fully merge them all and the byte-level count PROVABLY differs from
    * the codepoint-level count on every planted doc. Appended (not
    * replacing), so null text stays null — concat's null-in/null-out on
    * both engines. */
  private[graft] val PlantSnippet =
    " 机器学习模型训练数据集处理 こんにちは世界のテキスト 한국어텍스트조각 https://例え.jp/パス"

  /** The planting rule as a DataFrame transform (engine side). */
  private[graft] def plantMultiscript(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"),
      when(col("doc_id") % 3 === 0, concat(col("text"), lit(PlantSnippet)))
        .otherwise(col("text")).as("text"),
      col("source"))

  /** The planting rule as a CTE (oracle side) — must mirror
    * [[plantMultiscript]] glyph for glyph. */
  private[ops] def plantedCte: String =
    s"""planted AS MATERIALIZED (
       |  SELECT doc_id,
       |         CASE WHEN doc_id % 3 = 0 THEN text || '$PlantSnippet'
       |              ELSE text END AS text,
       |         source
       |  FROM documents)""".stripMargin

  /** The bounded, SQL-mirrorable training sample of an sfDir's documents
    * table: word-frequency dict rows (word, count). Byte-level variants
    * train on the PLANTED table so the model actually carries multi-byte
    * merges. */
  private[ops] def sampleWordCounts(spark: SparkSession, sfDir: String,
      spec: ModelSpec): Seq[(String, Long)] = {
    val docs = Tables.load(spark, sfDir, "documents")
    val words = (if (spec.plant) plantMultiscript(docs) else docs)
      .filter(col("doc_id") % SampleMod === 0)
      .select(explode(spec.segColumn(substring(col("text"), 1, SampleChars))).as("w"))
    (if (spec.asciiOnly) words.filter(col("w").rlike("^[!-~]+$")) else words)
      .groupBy("w").agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("w"))
      .limit(spec.maxWords)
      .collect().map(r => (r.getString(0), r.getLong(1))).toSeq // bounded: ≤ maxWords rows
  }

  /** Name of the era record inside a model dir: the full fingerprint salt
    * + corpus content fingerprint the table was trained under. */
  private val EraFile = "_bpe_era"

  // ------------------------------- HF-tokenizers interchange (r16)

  /** Version of the staged model-dir LAYOUT (which files it contains) —
    * rides every spec's salt so committed dirs from an older layout are
    * rebuilt rather than served missing files. */
  // hf2: vocab carries EosToken last; hf3: codepoint vocab alphabet
  // derives from the trained dict's distinct chars, not merge symbols
  private[graft] val HfLayoutV = "hf3"

  /** GPT-2's public byte→printable-unicode alphabet (encoder.py
    * `bytes_to_unicode`): printable ASCII and most of Latin-1 map to
    * themselves, the rest to U+0100+n — so byte-level tokens render as
    * space-free printable strings in `merges.txt`/`vocab.json`, the
    * HF-tokenizers interchange convention. */
  private[graft] lazy val byteToUnicode: Array[Char] = {
    val direct = ((33 to 126) ++ (161 to 172) ++ (174 to 255)).toSet
    val out = new Array[Char](256)
    var n = 0
    var b = 0
    while (b < 256) {
      if (direct(b)) out(b) = b.toChar
      else { out(b) = (256 + n).toChar; n += 1 }
      b += 1
    }
    out
  }
  private lazy val unicodeToByte: Map[Char, Int] =
    byteToUnicode.zipWithIndex.map { case (c, b) => c -> b }.toMap

  /** Internal symbol → HF interchange token: byte-level symbols (hex
    * pairs) map through [[byteToUnicode]]; codepoint symbols pass as-is
    * (the codepoint dicts are printable-ASCII words — asserted at write,
    * since a space inside a symbol would corrupt the merges.txt format). */
  private[ops] def hfToken(sym: String, byteLevel: Boolean): String =
    if (byteLevel)
      sym.grouped(2).map(h => byteToUnicode(Integer.parseInt(h, 16))).mkString
    else sym

  private[ops] def hfTokenInverse(tok: String, byteLevel: Boolean): String =
    if (byteLevel)
      tok.map(c => f"${unicodeToByte.getOrElse(c, sys.error(s"not a byte-alphabet char: $c"))}%02X").mkString
    else tok

  private def jsonEscape(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    case c if c < ' ' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** Write the model as HF-tokenizers-style `merges.txt` (rank order,
    * `#version: 0.2` header) and `vocab.json` (dense ids: the base
    * alphabet first — all 256 bytes for byte-level models, the distinct
    * characters of the TRAINED DICT for codepoint models — then one
    * token per merge in rank order, the standard BPE vocab
    * construction). `dictWords` (codepoint models only) carries the
    * training dict so the alphabet covers characters that never joined
    * a merge (r16 advisory: an alphabet derived from merge symbols
    * alone left an external HF-tokenizers consumer unable to encode
    * merge-free characters). Called inside the staged model build, so
    * the files are covered by the dir's epoch commit and [[requireEra]]
    * fingerprint. */
  private[graft] def writeHfFiles(dir: java.io.File,
      merges: Seq[(String, String)], byteLevel: Boolean,
      dictWords: Seq[String] = Nil): Unit = {
    val lines = merges.map { case (a, b) =>
      val (l, r) = (hfToken(a, byteLevel), hfToken(b, byteLevel))
      require(!l.exists(_.isWhitespace) && !r.exists(_.isWhitespace),
        s"merge symbol with whitespace cannot round-trip merges.txt: [$l] [$r]")
      s"$l $r"
    }
    java.nio.file.Files.write(new java.io.File(dir, "merges.txt").toPath,
      ("#version: 0.2" +: lines).mkString("\n").getBytes("UTF-8"))
    val alphabet: Seq[String] =
      if (byteLevel) (0 until 256).map(b => byteToUnicode(b).toString)
      else {
        val chars = (dictWords.iterator.flatten ++
          merges.iterator.flatMap { case (a, b) => a + b }).toSeq.distinct
        // the documented invariant ("codepoint dicts are printable-ASCII
        // words — asserted at write") must hold for the dictWords-derived
        // alphabet too, not just merge operands (r17 advisory): a
        // whitespace/control char here would land as a silent vocab.json
        // key an external consumer cannot reconcile with merges.txt
        chars.filterNot(c => c >= '!' && c <= '~') match {
          case Seq() => ()
          case bad => throw new IllegalArgumentException(
            s"non-printable-ASCII alphabet char(s) in codepoint vocab: " +
              bad.map(c => f"U+${c.toInt}%04X").mkString(", "))
        }
        chars.sorted.map(_.toString)
      }
    val mergedToks = merges.map { case (a, b) => hfToken(a + b, byteLevel) }
    // the document separator takes the LAST id (the GPT-2 convention:
    // <|endoftext|> = vocab size - 1) — the reserved slot [[EosId]]'s
    // dense renumbering lands on. A learned token spelling exactly the
    // marker (possible if the corpus itself carries it) would silently
    // shadow an id behind a duplicate key — refuse loudly instead (r16
    // review), the strict-loader discipline applied at write time.
    val learned = (alphabet ++ mergedToks).distinct
    require(!learned.contains(EosToken),
      s"a learned token equals the reserved marker $EosToken — " +
        "strip it from the corpus or choose a different marker")
    val vocab = (learned :+ EosToken).zipWithIndex
    val json = vocab
      .map { case (t, i) => s""""${jsonEscape(t)}": $i""" }
      .mkString("{", ", ", "}")
    java.nio.file.Files.write(new java.io.File(dir, "vocab.json").toPath,
      json.getBytes("UTF-8"))
  }

  /** Load the HF interchange files back into the engine's internal merge
    * form — the serving seam's inverse of [[writeHfFiles]]. Returns
    * (merges in rank order, vocab token → dense id). Strict: refuses a
    * malformed header, a merge line without exactly one space, or a
    * vocab missing a merge output — a silently tolerant loader would
    * serve a truncated tokenizer. */
  def loadHfTokenizer(dir: String, byteLevel: Boolean)
      : (Seq[(String, String)], Map[String, Int]) = {
    val mergesPath = new java.io.File(dir, "merges.txt").toPath
    val all = new String(java.nio.file.Files.readAllBytes(mergesPath), "UTF-8")
      .split("\n", -1).toSeq
    require(all.headOption.exists(_.startsWith("#version:")),
      s"merges.txt missing #version header at $dir")
    val merges = all.tail.filter(_.nonEmpty).map { line =>
      val parts = line.split(" ", -1)
      require(parts.length == 2, s"malformed merge line: [$line]")
      (hfTokenInverse(parts(0), byteLevel), hfTokenInverse(parts(1), byteLevel))
    }
    val vocabJson = new String(java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "vocab.json").toPath), "UTF-8")
    val vocab = parseVocabJson(vocabJson)
    merges.foreach { case (a, b) =>
      val out = hfToken(a + b, byteLevel)
      require(vocab.contains(out), s"vocab.json missing merge output [$out]")
    }
    (merges, vocab)
  }

  /** Minimal strict parser for the flat `{"tok": id, ...}` object
    * [[writeHfFiles]] emits (keys are JSON strings with `\"`, `\\`,
    * and `\ uXXXX` escapes; values are non-negative integers). */
  private[graft] def parseVocabJson(s: String): Map[String, Int] = {
    val out = scala.collection.mutable.LinkedHashMap.empty[String, Int]
    var i = 0
    def skipWs(): Unit = while (i < s.length && s(i).isWhitespace) i += 1
    def expect(c: Char): Unit = {
      skipWs()
      require(i < s.length && s(i) == c, s"vocab.json: expected '$c' at $i")
      i += 1
    }
    def parseString(): String = {
      expect('"')
      val sb = new StringBuilder
      // bounds-checked (r16 review): a TRUNCATED vocab.json must refuse
      // with the strict-parser diagnostic, not StringIndexOutOfBounds
      while ({ require(i < s.length, "vocab.json: unterminated string"); s(i) != '"' }) {
        if (s(i) == '\\') {
          i += 1
          require(i < s.length, "vocab.json: unterminated escape")
          s(i) match {
            case '"' => sb += '"'; i += 1
            case '\\' => sb += '\\'; i += 1
            case 'u' =>
              require(i + 5 <= s.length, "vocab.json: truncated \\u escape")
              val hex = s.substring(i + 1, i + 5)
              require(hex.forall(c => Character.digit(c, 16) >= 0),
                s"vocab.json: malformed \\u escape [$hex]")
              sb += Integer.parseInt(hex, 16).toChar
              i += 5
            case c => sys.error(s"vocab.json: unsupported escape \\$c")
          }
        } else { sb += s(i); i += 1 }
      }
      i += 1
      sb.toString
    }
    expect('{')
    skipWs()
    if (i < s.length && s(i) != '}') {
      var more = true
      while (more) {
        val k = parseString()
        expect(':')
        skipWs()
        val start = i
        while (i < s.length && s(i).isDigit) i += 1
        require(i > start, s"vocab.json: expected an integer id at $start")
        val id = s.substring(start, i)
        out(k) = id.toIntOption.getOrElse(
          sys.error(s"vocab.json: id out of range [$id]"))
        skipWs()
        if (i < s.length && s(i) == ',') { i += 1; skipWs() } else more = false
      }
    }
    expect('}')
    // strict to the END of the file (r16 advisory): a concatenated or
    // corrupted vocab.json must refuse with the parser's own diagnostic,
    // not silently serve the first object and ignore the rest
    skipWs()
    require(i == s.length, s"vocab.json: trailing content after '}' at $i")
    out.toMap
  }

  /** The era string a model trained NOW against this corpus would record.
    * Corpus-content-sensitive: [[graft.plans.MaterializedViews.filesFingerprint]]
    * keys on (path, length, mtime). */
  private[graft] def currentEra(sfDir: String, spec: ModelSpec): String =
    spec.salt(sfDir) + "@" + graft.plans.MaterializedViews
      .filesFingerprint(Seq(s"$sfDir/documents.parquet"))

  /** Fingerprint-staged merge table for an sfDir (the stored-model
    * pattern): train once per corpus fingerprint, serve many. Writes the
    * [[EraFile]] era record beside the table so a PINNED model dir (the
    * serving split) can be validated against the corpus it is applied to
    * ([[requireEra]]) instead of silently retraining — a retrain changes
    * every downstream token count (pack boundaries, budget samples). */
  private def ensureModelSpec(spark: SparkSession, sfDir: String,
      spec: ModelSpec): String = {
    val dir = Dedup.fingerprintedDir("graft-bpemodel", "documents",
      spec.salt(sfDir), Seq(s"$sfDir/documents.parquet"))
    Dedup.stageAtomically(dir) { tmp =>
      val wordCounts = sampleWordCounts(spark, sfDir, spec)
      val merges = trainFast(wordCounts, spec.nMerges, spec.syms)
      val s = spark
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1, a, b) }
        .toDF("rank", "left", "right")
        .coalesce(1).write.parquet(tmp.getPath)
      // codepoint models pass the dict so vocab.json covers merge-free
      // characters; byte-level models carry the full 256-byte alphabet
      writeHfFiles(tmp, merges, spec.byteLevel,
        dictWords = if (spec.byteLevel) Nil else wordCounts.map(_._1))
      java.nio.file.Files.write(new java.io.File(tmp, EraFile).toPath,
        currentEra(sfDir, spec).getBytes("UTF-8"))
    }
  }

  /** The 40-merge codepoint model (the oracle-emulated semantic pin). */
  def ensureModel(spark: SparkSession, sfDir: String): String =
    ensureModelSpec(spark, sfDir, SpecOracle)
  /** The production-capacity codepoint model (≤ [[NMergesLarge]] rules). */
  def ensureModelLarge(spark: SparkSession, sfDir: String): String =
    ensureModelSpec(spark, sfDir, SpecLarge)
  /** The byte-level (GPT-2 variant) model. */
  def ensureModelBytes(spark: SparkSession, sfDir: String): String =
    ensureModelSpec(spark, sfDir, SpecBytes)
  /** The byte-level model under GPT-2 pre-tokenization (r16). */
  def ensureModelGpt2(spark: SparkSession, sfDir: String): String =
    ensureModelSpec(spark, sfDir, SpecGpt2)

  /** Era guard for a pinned model dir: REFUSE — loudly — to apply a merge
    * table trained under a different corpus fingerprint or different
    * training constants, instead of silently serving counts that moved
    * under the pipeline (the schema-era pattern [[graft.Tables]] uses for
    * events timestamps). A model dir without an era record predates the
    * guard and is refused too. */
  private[graft] def requireEra(sfDir: String, modelDir: String,
      spec: ModelSpec): Unit = {
    val f = new java.io.File(modelDir, EraFile)
    val recorded =
      if (f.isFile) new String(java.nio.file.Files.readAllBytes(f.toPath), "UTF-8")
      else "(missing era record)"
    val expected = currentEra(sfDir, spec)
    if (recorded != expected)
      throw new IllegalStateException(
        s"BPE model era mismatch: merge table at $modelDir was trained under " +
          s"era [$recorded] but the corpus/constants now demand [$expected]. " +
          "A stale tokenizer silently changes every downstream token count " +
          "(chunk pack boundaries, budget samples) — retrain or repin.")
  }

  /** Load a persisted merge table in rank order — a bounded read (≤ the
    * variant's nMerges rows), the model the scoring expression embeds.
    * Globbed to the part files: the dir also carries the HF interchange
    * files (`merges.txt`/`vocab.json`, r16), which a bare dir read would
    * try to parse as parquet. */
  def loadMerges(spark: SparkSession, dir: String): Seq[(String, String)] =
    spark.read.parquet(s"$dir/part-*").select("rank", "left", "right")
      .collect() // bounded: <= nMerges rows
      .sortBy(_.getInt(0))
      .map(r => (r.getString(1), r.getString(2))).toSeq

  /** [[ensureModel]] + [[requireEra]] + [[loadMerges]] in one step — the
    * form the downstream-accounting entries use, so the era guard sits ON
    * the path that prices chunks and budgets. */
  def loadMergesGuarded(spark: SparkSession, sfDir: String,
      modelDir: String, spec: ModelSpec = SpecOracle): Seq[(String, String)] = {
    requireEra(sfDir, modelDir, spec)
    loadMerges(spark, modelDir)
  }

  // ---------------------------------------------------------------- apply

  /** Native subword counter: segments with THE shared tokenizer rule
    * ([[Tokens.segString]]) and BPE-encodes each word against the
    * embedded merge table — one map-side expression, zero exchanges, no
    * token strings materialized into the plan. Returns 0 for a wordless
    * document (matching the oracle's COALESCE(…, 0)).
    *
    * r15 production shape: the apply loop is [[encodeFast]]'s
    * lowest-rank-first merge over a rank map (O(len²·probe) per word —
    * independent of table size, where the r14 per-rule rescan was
    * O(nMerges × len) and wrong-shaped at 32k rules), and the expression
    * generates real code ([[doGenCode]] via nullSafeCodeGen) instead of
    * CodegenFallback — the projection stays inside one whole-stage-codegen
    * span with no InternalRow boxing per row ([[graft.BpeLargeProps]]
    * asserts the span). The merge table rides the expression (plan
    * broadcast): ≤ 32k short-string pairs ≈ a few hundred KB serialized
    * once per task, the stored-model contract every scoring expression
    * here uses. */
  case class BpeTokenCount(child: Expression, merges: Seq[(String, String)],
      byteLevel: Boolean = false, gpt2: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def prettyName: String = "bpe_token_count"

    @transient private lazy val ranks: java.util.HashMap[String, java.lang.Integer] = rankMap(merges)
    @transient private lazy val symsFn: String => Array[String] =
      if (byteLevel) symsOfBytes else symsOf
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
      val n = encodeFast(symsFn(w), ranks).length
      if (m.size >= 65536) m.clear()
      m.put(w, n)
      n
    }

    /** The whole-row count — public: generated code calls it through a
      * plan reference (one virtual call per ROW, with segmentation,
      * per-word probes, and merges all inside; the boxing-free analog of
      * the interpreted path). */
    def countAll(in: UTF8String): Long = {
      val words =
        if (gpt2) Tokens.gpt2SegString(in.toString)
        else Tokens.segString(in.toString)
      var total = 0L
      var wi = 0
      while (wi < words.length) { total += countWord(words(wi)); wi += 1 }
      total
    }

    override def nullSafeEval(in: Any): Any = countAll(in.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("bpeCounter", this, classOf[BpeTokenCount].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.countAll($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[BpeTokenCount]]. */
  def bpe_tokens(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false, gpt2: Boolean = false): Column =
    GraftSqlBridge.column(
      BpeTokenCount(GraftSqlBridge.expression(text), merges, byteLevel, gpt2))

  /** The trainer-facing output: the document's BPE token ID SEQUENCE
    * (the counting entries budget; THIS is what a training pipeline
    * actually emits). Same segmentation, same rank-priority apply, same
    * memo discipline as [[BpeTokenCount]] — plus a vocabulary id per
    * subword under a scheme chosen to be SQL-derivable so the DuckDB
    * oracle can reproduce every id from its own staged emulation:
    *
    *  - a BASE symbol (one codepoint) is its codepoint value;
    *  - a MERGED symbol is `0x110000 + rank` of the lowest-ranked merge
    *    whose output concatenates to its string (first rank wins if two
    *    rule paths ever emit the same output) — 0x110000 is one past the
    *    Unicode ceiling, so the two id spaces cannot collide.
    *
    * Dense renumbering is a presentation concern a serving layer can
    * apply with one dictionary; collision-freedom + derivability are the
    * contract pinned here.
    *
    * Byte-level twin (`byteLevel = true`, the GPT-2-shaped production
    * contract): base symbols are the 256 bytes (id = the byte value —
    * GPT-2's own base id assignment before its permutation table),
    * merged symbols are `256 + rank`. */
  case class BpeTokenIds(child: Expression, merges: Seq[(String, String)],
      byteLevel: Boolean = false, gpt2: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
    override def prettyName: String = "bpe_token_ids"

    @transient private lazy val ranks: java.util.HashMap[String, java.lang.Integer] =
      rankMap(merges)
    @transient private lazy val symsFn: String => Array[String] =
      if (byteLevel) symsOfBytes else symsOf
    private def mergedBase: Int = if (byteLevel) 256 else 0x110000
    @transient private lazy val mergedIds: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer](merges.size * 2)
      merges.iterator.zipWithIndex.foreach { case ((a, b), i) =>
        m.putIfAbsent(a + b, mergedBase + i)
      }
      m
    }
    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, Array[Int]]](
        () => new java.util.HashMap[String, Array[Int]]())

    private def baseId(sym: String): Int =
      if (byteLevel) Integer.parseInt(sym, 16) else sym.codePointAt(0)

    private def idsWord(w: String): Array[Int] = {
      val m = memo.get()
      val hit = m.get(w)
      if (hit != null) return hit
      val syms = encodeFast(symsFn(w), ranks)
      val out = new Array[Int](syms.length)
      var i = 0
      while (i < syms.length) {
        val merged = mergedIds.get(syms(i))
        out(i) = if (merged != null) merged.intValue() else baseId(syms(i))
        i += 1
      }
      if (m.size >= 65536) m.clear()
      m.put(w, out)
      out
    }

    /** Whole-row sequence — public for the generated code's plan
      * reference, like [[BpeTokenCount.countAll]]. */
    def idsAll(in: UTF8String): org.apache.spark.sql.catalyst.util.ArrayData = {
      val words =
        if (gpt2) Tokens.gpt2SegString(in.toString)
        else Tokens.segString(in.toString)
      val parts = new Array[Array[Int]](words.length)
      var total = 0
      var wi = 0
      while (wi < words.length) {
        parts(wi) = idsWord(words(wi)); total += parts(wi).length; wi += 1
      }
      val flat = new Array[Int](total)
      var o = 0
      wi = 0
      while (wi < words.length) {
        System.arraycopy(parts(wi), 0, flat, o, parts(wi).length)
        o += parts(wi).length; wi += 1
      }
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(flat)
    }

    override def nullSafeEval(in: Any): Any = idsAll(in.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("bpeIds", this, classOf[BpeTokenIds].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.idsAll($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[BpeTokenIds]]. */
  def bpe_token_ids(text: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false, gpt2: Boolean = false): Column =
    GraftSqlBridge.column(
      BpeTokenIds(GraftSqlBridge.expression(text), merges, byteLevel, gpt2))

  /** Detokenization — the inverse of [[BpeTokenIds]]'s id assignment:
    * rebuild the document's WORD STREAM (the concatenation of its
    * [[Tokens.segString]] words — inter-word separators are not
    * tokenized, so they are not recoverable) from an id sequence. The
    * pipeline op behind sample inspection, contamination spot-checks,
    * and serving-side round-trip audits; as a gate entry it pins the
    * whole encode→decode chain against an oracle that derives the
    * expected string STRAIGHT from the text (word concat) — any drift
    * in segmentation, id assignment, or this inverse mismatches.
    *
    *  - codepoint model: id < 0x110000 is the codepoint itself; else
    *    `merges(id − 0x110000)`'s concatenated output;
    *  - byte-level model: id < 256 is the byte value; else
    *    `merges(id − 256)`'s output hex string — all output bytes are
    *    buffered and decoded as ONE UTF-8 string at the end, so a
    *    multi-byte codepoint split across ids (CJK under a small table)
    *    reassembles correctly;
    *  - [[EosId]] decodes to [[EosToken]] (r16 — the separator is a
    *    documented token, not corruption);
    *  - any other id outside the ranges decodes to U+FFFD (never throws —
    *    a corrupt sequence degrades visibly, the quarantine convention).
    *
    * Map-side, zero exchanges, same plan-broadcast merge-table contract
    * as the scoring expressions. */
  case class BpeDecodeIds(child: Expression, merges: Seq[(String, String)],
      byteLevel: Boolean = false)
      extends UnaryExpression {
    override def dataType: DataType = org.apache.spark.sql.types.StringType
    override def prettyName: String = "bpe_decode_ids"

    private def mergedBase: Int = if (byteLevel) 256 else 0x110000
    @transient private lazy val mergedStr: Array[String] =
      merges.iterator.map { case (a, b) => a + b }.toArray

    /** Whole-sequence decode — public for the generated code's plan
      * reference, like [[BpeTokenIds.idsAll]]. */
    def decodeAll(in: Any): UTF8String = {
      val ids = in.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData]
      val n = ids.numElements()
      if (byteLevel) {
        val bytes = new java.io.ByteArrayOutputStream(n * 2)
        var i = 0
        while (i < n) {
          val id = ids.getInt(i)
          if (id >= 0 && id < 256) bytes.write(id)
          else if (id >= mergedBase && id - mergedBase < mergedStr.length) {
            val hx = mergedStr(id - mergedBase)
            var j = 0
            while (j < hx.length) {
              bytes.write(Integer.parseInt(hx.substring(j, j + 2), 16)); j += 2
            }
          } else if (id == EosId)
            bytes.write(EosToken.getBytes(java.nio.charset.StandardCharsets.UTF_8))
          else bytes.write("�".getBytes(java.nio.charset.StandardCharsets.UTF_8))
          i += 1
        }
        UTF8String.fromString(
          new String(bytes.toByteArray, java.nio.charset.StandardCharsets.UTF_8))
      } else {
        val sb = new java.lang.StringBuilder(n * 2)
        var i = 0
        while (i < n) {
          val id = ids.getInt(i)
          // surrogate-range ids are corrupt (an unpaired surrogate would
          // UTF-8-encode to '?', breaking the U+FFFD quarantine contract)
          if (id >= 0 && id < 0x110000 && !(id >= 0xD800 && id <= 0xDFFF))
            sb.appendCodePoint(id)
          else if (id >= mergedBase && id - mergedBase < mergedStr.length)
            sb.append(mergedStr(id - mergedBase))
          else if (id == EosId) sb.append(EosToken)
          else sb.append('�')
          i += 1
        }
        UTF8String.fromString(sb.toString)
      }
    }

    override def nullSafeEval(in: Any): Any = decodeAll(in)

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("bpeDecode", this, classOf[BpeDecodeIds].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.decodeAll($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column form of [[BpeDecodeIds]]. */
  def bpe_decode_ids(ids: Column, merges: Seq[(String, String)],
      byteLevel: Boolean = false): Column =
    GraftSqlBridge.column(
      BpeDecodeIds(GraftSqlBridge.expression(ids), merges, byteLevel))

  // --------------------------------------------------------------- oracle

  /** `chr(31)`-wrapped symbol string of a word expression — codepoint
    * symbols (one per character; DuckDB's '' split is per codepoint). */
  private def wrapCp(e: String): String =
    s"list_aggregate(list_transform(string_split_regex($e, ''), " +
      "c -> chr(31)||c||chr(31)), 'string_agg', '')"

  /** Byte-level wrap: symbols are the word's UTF-8 bytes as 2-char
    * uppercase hex (`hex(encode(w))` split into pairs — the exact
    * spelling [[symsOfBytes]] produces), each `chr(31)`-wrapped. */
  private def wrapBytes(e: String): String =
    s"list_aggregate(list_transform(regexp_extract_all(hex(encode($e)), '..'), " +
      "c -> chr(31)||c||chr(31)), 'string_agg', '')"

  private def wrapOf(spec: ModelSpec): String => String =
    if (spec.byteLevel) wrapBytes else wrapCp

  private def mergeReplace(src: String): String =
    s"CASE WHEN b.a IS NULL THEN $src ELSE replace($src, " +
      "chr(31)||b.a||chr(31)||chr(31)||b.b||chr(31), " +
      "chr(31)||b.a||b.b||chr(31)) END"

  /** Training-emulation CTEs: `sample`, `st0..stN`, and per rank k the
    * pair counts `prk`, the chosen pair `bpk` (empty once no pair
    * repeats — later stages then no-op via the LEFT JOIN), and the
    * rewritten dict `stk`. The apply chain joins the `bpk` CTEs. Always
    * [[NMerges]] unrolled stages — for the large model this emulates the
    * first-40-rank PREFIX over its dict (greedy training is
    * prefix-stable, so the cap never changes earlier ranks). */
  private def trainCtes(spec: ModelSpec): Seq[String] = {
    val wrap = wrapOf(spec)
    val src = if (spec.plant) "planted" else "documents"
    val filter =
      if (spec.asciiOnly) s"  WHERE regexp_matches(w, '^[!-~]+${"$"}')\n" else ""
    val sample =
      s"""sample AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS cnt FROM (
         |    SELECT unnest(${spec.duckToksOf(s"substring(text, 1, $SampleChars)")}) AS w
         |    FROM $src WHERE doc_id % $SampleMod = 0) _
         |$filter  GROUP BY w ORDER BY cnt DESC, w LIMIT ${spec.maxWords})""".stripMargin
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
    if (spec.plant) (plantedCte +: sample +: st0 +: stages)
    else (sample +: st0 +: stages)
  }

  /** Apply-emulation CTEs over a word-occurrence CTE `wordsCte(keys…, w)`:
    * `aw0..awN` rewriting each occurrence through the learned rules, then
    * `bpeCounted(keys…, n_bpe)`. */
  private[ops] def applyChain(wordsCte: String, keys: String,
      spec: ModelSpec = SpecOracle, pfx: String = ""): Seq[String] = {
    val wrap = wrapOf(spec)
    val aw0 = s"${pfx}aw0 AS MATERIALIZED (SELECT $keys, ${wrap("w")} AS repr FROM $wordsCte)"
    val rest = (1 to NMerges).map { k =>
      s"""${pfx}aw$k AS MATERIALIZED (
         |  SELECT $keys, ${mergeReplace("repr")} AS repr
         |  FROM ${pfx}aw${k - 1} LEFT JOIN bp$k b ON TRUE)""".stripMargin
    }
    rest.prepended(aw0)
  }

  private def applyStages(wordsCte: String, keys: String,
      spec: ModelSpec = SpecOracle): Seq[String] = {
    val counted =
      s"""bpeCounted AS MATERIALIZED (
         |  SELECT $keys, CAST(SUM((length(repr) - length(replace(repr, chr(31), ''))) // 2) AS BIGINT) AS n_bpe
         |  FROM aw$NMerges GROUP BY $keys)""".stripMargin
    applyChain(wordsCte, keys, spec) :+ counted
  }

  /** The text_chunk derivation as ONE shared CTE — `chunk_pack_bpe` and
    * `chunk_pack_ids` must chunk identically or their oracles silently
    * diverge while each still passes (r15 review: this was two literal
    * copies). */
  private def chunkTextCte: String = chunkTextCteFrom("documents")

  /** [[chunkTextCte]] rooted at an arbitrary (doc_id, text) relation —
    * the gpt2 pack entry chunks the PLANTED corpus. The window rule
    * (word seg, 32/24) is the same at any root: chunk windows stay
    * word-based; only the per-chunk id derivation is model-specific. */
  private def chunkTextCteFrom(src: String): String =
    s"""ch AS MATERIALIZED (
       |  SELECT doc_id,
       |         CAST(s // 24 AS BIGINT) AS chunk_id,
       |         array_to_string(t[s + 1 : least(s + 32, n)], ' ') AS chunk_text
       |  FROM (SELECT doc_id, t, len(t) AS n,
       |               unnest(generate_series(0, len(t) - 1, 24)) AS s
       |        FROM (SELECT doc_id, ${Tokens.duckToks("text")} AS t FROM $src)
       |        WHERE len(t) > 0))""".stripMargin

  /** The id-sequence machinery over an `aw`-chain's final stage — vocab
    * (merged symbol → base + lowest producing rank, from the bpk rows),
    * toks (per-occurrence symbol explode), and `seq(groupKeys, ids)` —
    * parameterized by the occurrence key list so the per-document
    * (`text_bpe_ids*`) and per-chunk (`chunk_pack_ids`) oracles share
    * ONE definition of the id scheme (r15 review: three near-copies).
    * `groupKeys` must be the occurrence keys minus the word ordinal
    * `wi`, which every caller's words CTE carries. */
  private def idsSeqCtes(groupKeys: String, byteLevel: Boolean,
      pfx: String = ""): Seq[String] = {
    val keys = s"$groupKeys, wi"
    val vocabRows = (1 to NMerges)
      .map(k => s"SELECT $k AS rank, a||b AS sym FROM bp$k")
      .mkString("\nUNION ALL\n")
    val base = if (byteLevel) 256 else 0x110000
    val vocab =
      s"""${pfx}vocab AS MATERIALIZED (
         |  SELECT sym, $base + MIN(rank) - 1 AS id
         |  FROM ($vocabRows) GROUP BY sym)""".stripMargin
    val baseCte =
      if (byteLevel) Seq(
        s"""${pfx}base AS MATERIALIZED (
          |  SELECT lpad(upper(to_hex(i)), 2, '0') AS sym, i AS id
          |  FROM (SELECT unnest(generate_series(0, 255)) AS i))""".stripMargin)
      else Nil
    val toks =
      s"""${pfx}toks AS (
         |  SELECT $keys, j, s[j] AS sym FROM (
         |    SELECT $keys, s, unnest(generate_series(1, len(s))) AS j FROM (
         |      SELECT $keys,
         |             list_transform(string_split(repr, chr(31)||chr(31)),
         |                            x -> trim(x, chr(31))) AS s
         |      FROM ${pfx}aw$NMerges) _) _)""".stripMargin
    val joinBase = if (byteLevel) s"\n              LEFT JOIN ${pfx}base b ON b.sym = t.sym" else ""
    val idExpr = if (byteLevel) "COALESCE(v.id, b.id)" else "COALESCE(v.id, unicode(t.sym))"
    val seq =
      s"""${pfx}seq AS (
         |  SELECT $groupKeys,
         |         list(CAST($idExpr AS INT)
         |              ORDER BY t.wi, t.j) AS ids
         |  FROM ${pfx}toks t LEFT JOIN ${pfx}vocab v ON v.sym = t.sym$joinBase
         |  GROUP BY $groupKeys)""".stripMargin
    (vocab +: baseCte) ++ Seq(toks, seq)
  }

  // -------------------------------------------------------------- entries

  /** ONE builder for the packed-ids entries — the engine mirror of the
    * oracle-side `packIdsSqlWith(eos)` (r15 review: two hand-mirrored
    * bodies are a drift channel; a capacity/era/derivation change must
    * move both artifacts or neither). `gpt2 = true` swaps in the
    * byte-level GPT-2-spec model over the planted multiscript corpus —
    * the production packing contract (r16 verdict #6): GPT-2-spec ids
    * with the `<|endoftext|>` separator materialized. The chunk WINDOWS
    * stay word-based on both engines; only the per-chunk id derivation
    * moves to the GPT-2 pre-tokenization. */
  /** The packed-ids frame with REAL id arrays — doc_id, chunk_id,
    * ids (array<int>), seq_id, seq_offset. Shared by the gate entries
    * (which scalarize at the boundary) and the packed-ids
    * decontamination guard (which windows over the arrays). */
  private[ops] def packedIdsFrame(s: SparkSession, d: String, eos: Boolean,
      gpt2: Boolean = false): DataFrame = {
    val merges =
      if (gpt2) loadMergesGuarded(s, d, ensureModelGpt2(s, d), SpecGpt2)
      else loadMergesGuarded(s, d, ensureModel(s, d))
    val src = Chunking.rangedDocs(
      if (gpt2) plantMultiscript(Tables.load(s, d, "documents"))
      else Tables.load(s, d, "documents"))
    val ch = Chunking.chunk(src)
      .withColumn("ids0",
        bpe_token_ids(col("chunk_text"), merges, byteLevel = gpt2, gpt2 = gpt2))
      .withColumn("ids",
        if (eos)
          when(col("chunk_id") === 0,
            concat(array(lit(EosId)), col("ids0"))).otherwise(col("ids0"))
        else col("ids0"))
      .withColumn("bpe_tokens", size(col("ids")).cast("long"))
    Chunking.packChunks(ch, capacity = 256, tokCol = "bpe_tokens",
      preRanged = true)
  }

  private def packIdsEntry(eos: Boolean,
      gpt2: Boolean = false): (SparkSession, String) => DataFrame =
    (s, d) =>
      packedIdsFrame(s, d, eos, gpt2)
        // gate boundary scalarizes the sequence (s33 precedent — the
        // driver's canonicalizer cannot hash array cells); pack math ran
        // on the real array above
        .select(col("doc_id"), col("chunk_id"),
          array_join(col("ids"), " ").as("ids"),
          col("seq_id"), col("seq_offset"))
        .orderBy("doc_id", "chunk_id")

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // per-document subword budget vs the whitespace proxy — the number a
    // token-budget sampler or packer should actually be spending
    "text_tokens_bpe" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_tokens(col("text"), merges).as("n_bpe"),
          graft.functions.GraftFunctions.seg_count(col("text")).as("n_ws"))
    }),
    // the packing plan parameterized by the tokenizer: same two-phase
    // prefix-sum pack ([[Chunking.packChunks]]), budgeted in SUBWORDS —
    // proof the pipeline's token accounting is pluggable end to end.
    // loadMergesGuarded: pack boundaries move if the tokenizer moves, so
    // THIS path carries the era guard (r15) — a model/corpus fingerprint
    // mismatch refuses loudly instead of recomputing
    "chunk_pack_bpe" -> ((s, d) => {
      val merges = loadMergesGuarded(s, d, ensureModel(s, d))
      val ch = Chunking.chunk(Chunking.rangedDocs(Tables.load(s, d, "documents")))
        .withColumn("bpe_tokens", bpe_tokens(col("chunk_text"), merges))
      Chunking.packChunks(ch, capacity = 256, tokCol = "bpe_tokens",
        preRanged = true)
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
      val merges = loadMergesGuarded(s, d, ensureModel(s, d))
      Sampling.tokenBudgetSample(Tables.load(s, d, "documents"),
        tokenCount = bpe_tokens(col("text"), merges))
        .select("doc_id", "source", "n_tok")
        .orderBy("doc_id")
    }),
    // the PRODUCTION-capacity model's first [[NMerges]] ranks, rank by
    // rank against the oracle emulating 40 training stages over the LARGE
    // dict — greedy training is prefix-stable, so this pins the large
    // trainer's sampling + dict + merge selection exactly; the >40-rank
    // tail is pinned by the trainFast ≡ train property on random dicts
    "text_bpe_vocab_large" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelLarge(s, d)).take(NMerges)
      import s.implicits._
      merges.zipWithIndex
        .map { case ((a, b), i) => (i + 1L, a, b) }
        .toDF("rank", "left", "right")
        .orderBy("rank")
    }),
    // counting under the FULL production table: `n_bpe_pfx` (the count
    // under the large model's first 40 rules) is oracle-exact via the
    // same staged emulation, and `ok` pins the only SQL-expressible
    // property of the 32k-rule count itself — every word is ≥ 1 subword,
    // and applying the >40-rank tail after the prefix can only merge
    // further, so n_words ≤ n_full ≤ n_prefix row by row on real data.
    // (Rule-level equivalence of the rank-priority apply is
    // property-pinned in BpeLargeProps; this is also the bench line for
    // the 32k table.)
    "text_tokens_bpe_large" -> ((s, d) => {
      val large = loadMerges(s, ensureModelLarge(s, d))
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_tokens(col("text"), large.take(NMerges)).as("n_bpe_pfx"),
          bpe_tokens(col("text"), large).as("n_full"),
          graft.functions.GraftFunctions.seg_count(col("text")).as("n_w"))
        .select(col("doc_id"), col("n_bpe_pfx"),
          (col("n_full") >= col("n_w") && col("n_full") <= col("n_bpe_pfx"))
            .as("ok"))
    }),
    // r15: the trainer-facing artifact — per doc, the BPE token ID
    // SEQUENCE itself (counts budget; sequences ship). n_bpe rides along
    // from the counting expression, so the oracle cross-pins that the
    // two expressions agree on segmentation and merge application
    "text_bpe_ids" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      // gate boundary renders the sequence as a space-joined string (the
      // s33 decimal precedent: the driver's canonicalizer cannot hash
      // array cells) — the DataFrame API (bpe_token_ids) keeps real arrays
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          array_join(bpe_token_ids(col("text"), merges), " ").as("ids"),
          bpe_tokens(col("text"), merges).as("n_bpe"))
    }),
    // r15: ids under the byte-level model over the planted multiscript
    // corpus — every UTF-8 string coverable, base id = byte value,
    // merged id = 256 + rank (the GPT-2-shaped contract)
    "text_bpe_ids_bytes" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelBytes(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          array_join(bpe_token_ids(col("text"), merges, byteLevel = true),
            " ").as("ids"),
          bpe_tokens(col("text"), merges, byteLevel = true).as("n_bpe"))
    }),
    // r15: the CAPSTONE artifact — what a training pipeline actually
    // hands the trainer: chunk windows carrying their BPE token ID
    // sequences, packed into fixed-capacity training sequences by the
    // SAME two-phase prefix sum, budgeted by the id count (== the
    // counting expression's n_bpe, so pack boundaries equal
    // chunk_pack_bpe's — cross-pinned by the shared capacity). The era
    // guard sits on this path like every downstream-accounting entry
    "chunk_pack_ids" -> packIdsEntry(eos = false),
    // r15: the capstone WITH the document separator MATERIALIZED — the
    // GPT-2-shaped artifact exactly: each document's first chunk leads
    // with the [[EosId]] sentinel INSIDE its id sequence, the pack
    // budget counts it (size(ids)), and seq_offset points AT the
    // separator (unlike chunk_pack_eos's lead-charge form, where the
    // separator is budgeted but not materialized and the offset points
    // past it — both contracts oracle-pinned, the distinction stated)
    "chunk_pack_ids_eos" -> packIdsEntry(eos = true),
    // r15: the round trip AT THE GATE — text → ids → decode must rebuild
    // the word stream exactly. The oracle derives the expected string
    // straight from the text (word concat, no BPE at all), so the two
    // engines reach the same value by COMPLETELY different routes: any
    // fault in segmentation, merge application, id assignment, or the
    // inverse mapping mismatches here
    "text_bpe_decode" -> ((s, d) => {
      val merges = loadMerges(s, ensureModel(s, d))
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_decode_ids(bpe_token_ids(col("text"), merges), merges)
            .as("decoded"))
    }),
    // r15: the byte-level round trip over the planted multiscript corpus —
    // UTF-8 losslessness at the gate: CJK codepoints split across byte ids
    // must reassemble exactly (the spec pins this in-memory; this pins it
    // on the corpus against the independent oracle derivation)
    "text_bpe_decode_bytes" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelBytes(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_decode_ids(bpe_token_ids(col("text"), merges, byteLevel = true),
            merges, byteLevel = true).as("decoded"))
    }),
    // the byte-level (GPT-2) variant: a 256-symbol base alphabet covers
    // EVERY UTF-8 string. The ASCII corpus gets the multiscript plant
    // ([[plantMultiscript]] — train AND apply see it), so the model
    // carries real multi-byte merges and the planted CJK/URL docs count
    // differently here than under the codepoint variant; n_bytes (the
    // base symbol count) pins the alphabet itself
    "text_tokens_bpe_bytes" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelBytes(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_tokens(col("text"), merges, byteLevel = true).as("n_bpe"),
          aggregate(transform(Tokens.seg(col("text")), w => octet_length(w).cast("long")),
            lit(0L), (acc, x) => acc + x).as("n_bytes"))
    }),
    // r16: the FULL production pre-tokenization contract — byte-level BPE
    // over GPT-2's contraction-aware split (Radford et al. 2019): the
    // dict carries whitespace and space-prefixed pre-tokens, so counts
    // and (downstream) pack boundaries move vs the whitespace rule on
    // real text. n_pre pins the splitter itself at the gate (the oracle's
    // RE2 sentinel emulation vs the engine's lookahead pattern), n_bpe
    // the trained model's application over those pre-tokens
    "text_tokens_bpe_gpt2" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelGpt2(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_tokens(col("text"), merges, byteLevel = true, gpt2 = true)
            .as("n_bpe"),
          size(Tokens.gpt2Seg(col("text"))).cast("long").as("n_pre"))
    }),
    // r16: the full production ids artifact — byte-level ids over GPT-2
    // pre-tokens (the gate boundary scalarizes; n_bpe cross-pins the
    // counting expression's segmentation + apply)
    "text_bpe_ids_gpt2" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelGpt2(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          array_join(bpe_token_ids(col("text"), merges, byteLevel = true,
            gpt2 = true), " ").as("ids"),
          bpe_tokens(col("text"), merges, byteLevel = true, gpt2 = true)
            .as("n_bpe"))
    }),
    // r17: the production capstone — chunk windows carrying GPT-2-spec
    // byte-level ids with the <|endoftext|> separator MATERIALIZED at
    // each document's first chunk, packed by the SAME two-phase prefix
    // sum (chunk_pack_ids_eos's contract under the production
    // tokenizer); era-guarded like every downstream-accounting entry
    "chunk_pack_ids_gpt2" -> packIdsEntry(eos = true, gpt2 = true),
    // r18 (r17 verdict #6): the PACKED-ids decontamination guard — per
    // packed chunk, how many of its [[DecontamWindow]]-id windows also
    // appear in the benchmark fixture's id stream (the same every-50th-
    // doc 30%-prefix rule text_contamination pins, run through the SAME
    // gpt2 model). Window generation is map-side array math over the
    // pack frame; the benchmark window set is bounded (a benchmark
    // suite), so the probe is one broadcast left join + a per-chunk
    // count — no corpus shuffle beyond the pack machinery's own
    "chunk_decontaminate" -> ((s, d) => {
      val n = DecontamWindow
      val merges = loadMergesGuarded(s, d, ensureModelGpt2(s, d), SpecGpt2)
      val planted = plantMultiscript(Tables.load(s, d, "documents"))
      // r19: window keys are the native 128-bit IdWindowHashes structs —
      // the window strings never appear in output (only match counts do),
      // and the string form paid an interpreted transform + a per-window
      // slice + join; collision odds are the SpanShingleHashes ~n²/2^129
      val bench = TextAnalysis.contaminationBenchmark(planted)
        .select(bpe_token_ids(col("text"), merges,
          byteLevel = true, gpt2 = true).as("bids"))
        .where(size(col("bids")) >= n)
        .select(explode(graft.functions.GraftFunctions
          .id_window_keys(col("bids"), n)).as("wn"))
        .distinct()
        .withColumn("hit", lit(1))
      packedIdsFrame(s, d, eos = true, gpt2 = true)
        .withColumn("wins",
          graft.functions.GraftFunctions.id_window_keys(col("ids"), n))
        .select(col("doc_id"), col("chunk_id"), col("seq_id"),
          explode_outer(col("wins")).as("wn"))
        .join(broadcast(bench), Seq("wn"), "left")
        .groupBy("doc_id", "chunk_id", "seq_id")
        .agg(count(col("wn")).as("n_windows"),
          count(col("hit")).as("n_contaminated"))
        .orderBy("doc_id", "chunk_id")
    }),
    // r16: the STRONGEST round trip in the suite — GPT-2 pre-tokens
    // PARTITION the input (whitespace is tokenized, nothing is dropped),
    // so encode→decode must rebuild the ORIGINAL TEXT byte for byte; the
    // oracle's expected value is simply the text column itself
    "text_bpe_decode_gpt2" -> ((s, d) => {
      val merges = loadMerges(s, ensureModelGpt2(s, d))
      plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          bpe_decode_ids(
            bpe_token_ids(col("text"), merges, byteLevel = true, gpt2 = true),
            merges, byteLevel = true).as("decoded"))
    }))

  val oracle: Seq[(String, String)] = {
    val tokensSql = {
      val words = s"(SELECT doc_id, unnest(${Tokens.duckToks("text")}) AS w FROM documents) _"
      val ctes = trainCtes(SpecOracle) ++ applyStages(words, "doc_id")
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
      // the SHARED chunk CTE ([[chunkTextCte]] — chunk_pack_ids must
      // chunk identically), then each chunk's words through the SAME
      // apply chain, then chunk_pack's prefix sum
      val words =
        s"(SELECT doc_id, chunk_id, unnest(${Tokens.duckToks("chunk_text")}) AS w FROM ch) _"
      val ctes = (trainCtes(SpecOracle) :+ chunkTextCte) ++ applyStages(words, "doc_id, chunk_id")
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
      val ctes = trainCtes(SpecOracle) ++ applyStages(words, "doc_id")
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
      s"""WITH ${trainCtes(SpecOracle).mkString(",\n")}
         |SELECT rank, "left", "right" FROM ($ranks) ORDER BY rank""".stripMargin
    }
    val vocabLargeSql = {
      // the SAME 40 unrolled training stages, over the LARGE dict: the
      // engine's production-capacity table must open with exactly these
      // ranks (greedy training is prefix-stable under the merge cap)
      val ranks = (1 to NMerges)
        .map(k => s"SELECT CAST($k AS BIGINT) AS rank, a AS \"left\", b AS \"right\" FROM bp$k")
        .mkString("\nUNION ALL\n")
      s"""WITH ${trainCtes(SpecLarge).mkString(",\n")}
         |SELECT rank, "left", "right" FROM ($ranks) ORDER BY rank""".stripMargin
    }
    val tokensLargeSql = {
      // n_bpe_pfx: exact staged emulation of the large model's first 40
      // ranks; ok: the invariant the engine must compute from real data
      // (TRUE per non-null doc, NULL per null doc) — see the entry comment
      val words = s"(SELECT doc_id, unnest(${Tokens.duckToks("text")}) AS w FROM documents) _"
      val ctes = trainCtes(SpecLarge) ++ applyStages(words, "doc_id")
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE COALESCE(t.n_bpe, 0) END AS n_bpe_pfx,
         |       CASE WHEN d.text IS NULL THEN NULL ELSE TRUE END AS ok
         |FROM documents d LEFT JOIN bpeCounted t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    val tokensBytesSql = {
      // byte-level training + application emulated on hex-pair symbols
      // over the PLANTED table (trainCtes(SpecBytes) prepends the planted
      // CTE and samples from it); n_bytes = the base alphabet's symbol
      // count (UTF-8 octets of the word stream) — octet_length needs the
      // BLOB form, hence encode(w)
      val words = s"(SELECT doc_id, unnest(${Tokens.duckToks("text")}) AS w FROM planted) _"
      val ctes = trainCtes(SpecBytes) ++ applyStages(words, "doc_id", SpecBytes)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE COALESCE(t.n_bpe, 0) END AS n_bpe,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE COALESCE((SELECT CAST(SUM(octet_length(encode(w))) AS BIGINT)
         |                           FROM unnest(${Tokens.duckToks("d.text")}) AS u(w)), 0) END AS n_bytes
         |FROM planted d LEFT JOIN bpeCounted t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    val tokensGpt2Sql = {
      // the SAME staged training + apply emulation, with the GPT-2
      // pre-token stream (sentinel-emulated lookahead — Tokens.duckGpt2Toks)
      // replacing the whitespace segmentation everywhere a word enters
      val words =
        s"(SELECT doc_id, unnest(${Tokens.duckGpt2Toks("text")}) AS w FROM planted) _"
      val ctes = trainCtes(SpecGpt2) ++ applyStages(words, "doc_id", SpecGpt2)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE COALESCE(t.n_bpe, 0) END AS n_bpe,
         |       CAST(len(${Tokens.duckGpt2Toks("d.text")}) AS BIGINT) AS n_pre
         |FROM planted d LEFT JOIN bpeCounted t USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    val idsGpt2Sql = {
      // ordinal GPT-2 pre-token occurrences through the SpecGpt2 apply
      // chain, ids via the shared byte-level id machinery
      val words =
        s"""(SELECT doc_id, wi, t[wi] AS w FROM (
           |   SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
           |   FROM (SELECT doc_id, ${Tokens.duckGpt2Toks("text")} AS t FROM planted) _) _) _""".stripMargin
      val ctes = trainCtes(SpecGpt2) ++ applyChain(words, "doc_id, wi", SpecGpt2) ++
        idsSeqCtes("doc_id", byteLevel = true)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(s.ids, CAST([] AS INT[])), ' ') END AS ids,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(s.ids), 0) AS BIGINT) END AS n_bpe
         |FROM planted d LEFT JOIN seq s USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    // GPT-2 pre-tokens partition the input, so the expected decode is
    // the text column ITSELF — the two engines share nothing but the
    // planted corpus here
    val decodeGpt2Sql =
      s"""WITH $plantedCte
         |SELECT doc_id, text AS decoded
         |FROM planted ORDER BY doc_id""".stripMargin
    val idsSql = {
      // word occurrences with ORDINALS (the sequence needs order where
      // the counts only needed sums), each through the apply chain, each
      // final symbol mapped to its id via the shared [[idsSeqCtes]]
      // machinery — exactly [[BpeTokenIds]]'s scheme
      val words =
        s"""(SELECT doc_id, wi, t[wi] AS w FROM (
           |   SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
           |   FROM (SELECT doc_id, ${Tokens.duckToks("text")} AS t FROM documents) _) _) _""".stripMargin
      val ctes = trainCtes(SpecOracle) ++ applyChain(words, "doc_id, wi") ++
        idsSeqCtes("doc_id", byteLevel = false)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(s.ids, CAST([] AS INT[])), ' ') END AS ids,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(s.ids), 0) AS BIGINT) END AS n_bpe
         |FROM documents d LEFT JOIN seq s USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    val idsBytesSql = {
      // byte-level ids: the same shared machinery on hex-pair symbols
      // over the PLANTED table (base ids from the generated 256-row byte
      // table, merged ids 256 + lowest producing rank)
      val words =
        s"""(SELECT doc_id, wi, t[wi] AS w FROM (
           |   SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
           |   FROM (SELECT doc_id, ${Tokens.duckToks("text")} AS t FROM planted) _) _) _""".stripMargin
      val ctes = trainCtes(SpecBytes) ++ applyChain(words, "doc_id, wi", SpecBytes) ++
        idsSeqCtes("doc_id", byteLevel = true)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(s.ids, CAST([] AS INT[])), ' ') END AS ids,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(s.ids), 0) AS BIGINT) END AS n_bpe
         |FROM planted d LEFT JOIN seq s USING (doc_id)
         |ORDER BY doc_id""".stripMargin
    }
    // ONE builder for the packed-ids oracles: `eos = true` materializes
    // the document separator — the sentinel id prepended to each doc's
    // first chunk — into the sequences before the SAME pack window;
    // `gpt2 = true` roots the chunk CTE at the planted corpus and swaps
    // the per-chunk word stream to the GPT-2 pre-tokenization (the
    // window rule itself is unchanged — word seg on both engines)
    // the SAME id machinery at CHUNK granularity (occurrence keys
    // (doc_id, chunk_id, wi)) over the SHARED chunk CTE, composed with
    // chunk_pack's window — every id of every packed sequence
    // reproduced from the oracle's own staged training. The chain ends
    // at `w(doc_id, chunk_id, ids, cb)`, shared by the pack oracles and
    // the packed-ids decontamination guard.
    def packIdsCtes(eos: Boolean, gpt2: Boolean): Seq[String] = {
      val spec = if (gpt2) SpecGpt2 else SpecOracle
      val chunkToks =
        if (gpt2) Tokens.duckGpt2Toks("chunk_text")
        else Tokens.duckToks("chunk_text")
      val words =
        s"""(SELECT doc_id, chunk_id, wi, t[wi] AS w FROM (
           |   SELECT doc_id, chunk_id, t, unnest(generate_series(1, len(t))) AS wi
           |   FROM (SELECT doc_id, chunk_id, $chunkToks AS t FROM ch) _) _) _""".stripMargin
      val ctes = (trainCtes(spec) :+
          chunkTextCteFrom(if (gpt2) "planted" else "documents")) ++
        applyChain(words, "doc_id, chunk_id, wi", spec) ++
        idsSeqCtes("doc_id, chunk_id", byteLevel = spec.byteLevel)
      val withEos =
        if (eos) Seq(
          s"""e AS (
             |  SELECT doc_id, chunk_id,
             |         CASE WHEN chunk_id = 0
             |              THEN CAST([$EosId] AS INT[]) || ids ELSE ids END AS ids
             |  FROM seq)""".stripMargin)
        else Nil
      val src = if (eos) "e" else "seq"
      (ctes ++ withEos) :+
        s"""w AS (
           |  SELECT doc_id, chunk_id, ids,
           |         COALESCE(SUM(len(ids)) OVER (
           |           ORDER BY doc_id, chunk_id
           |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
           |  FROM $src)""".stripMargin
    }
    def packIdsSqlWith(eos: Boolean, gpt2: Boolean = false): String =
      s"""WITH ${packIdsCtes(eos, gpt2).mkString(",\n")}
         |SELECT doc_id, chunk_id, array_to_string(ids, ' ') AS ids,
         |       CAST(cb // 256 AS BIGINT) AS seq_id,
         |       CAST(cb % 256 AS BIGINT) AS seq_offset
         |FROM w ORDER BY doc_id, chunk_id""".stripMargin
    // the packed-ids decontamination guard: the SAME packed stream, each
    // chunk's [[DecontamWindow]]-id windows probed against the id
    // windows of the benchmark fixture (every 50th planted doc's 30%
    // prefix) run through a PREFIXED copy of the apply machinery — a
    // benchmark string that survives chunking reappears as matching id
    // windows (the 32/24 chunk overlap covers every 8-token text window
    // inside some single chunk)
    val decontaminateSql = {
      val benchToks = Tokens.duckGpt2Toks("text")
      val benchDocs =
        """bdocs AS (
          |  SELECT doc_id,
          |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.3) AS INT), 1)) AS text
          |  FROM planted WHERE doc_id % 50 = 0)""".stripMargin
      val benchWords =
        s"""(SELECT doc_id, wi, t[wi] AS w FROM (
           |   SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
           |   FROM (SELECT doc_id, $benchToks AS t FROM bdocs) _) _) _""".stripMargin
      val n = DecontamWindow
      val ctes = packIdsCtes(eos = true, gpt2 = true) ++
        Seq(benchDocs) ++
        applyChain(benchWords, "doc_id, wi", SpecGpt2, pfx = "bn") ++
        idsSeqCtes("doc_id", byteLevel = true, pfx = "bn") ++ Seq(
          s"""bwin AS (
             |  SELECT DISTINCT wn FROM (
             |    SELECT unnest(list_transform(generate_series(0, len(ids) - $n),
             |                  i -> array_to_string(ids[i + 1 : i + $n], ' '))) AS wn
             |    FROM bnseq WHERE len(ids) >= $n) _)""".stripMargin,
          s"""pk AS (
             |  SELECT doc_id, chunk_id, CAST(cb // 256 AS BIGINT) AS seq_id,
             |         CASE WHEN len(ids) >= $n
             |              THEN list_transform(generate_series(0, len(ids) - $n),
             |                     i -> array_to_string(ids[i + 1 : i + $n], ' '))
             |              ELSE CAST([] AS VARCHAR[]) END AS wins
             |  FROM w)""".stripMargin,
          """cw AS (SELECT doc_id, chunk_id, unnest(wins) AS wn FROM pk)""",
          """cnt AS (
            |  SELECT cw.doc_id, cw.chunk_id, COUNT(*) AS nw, COUNT(b.wn) AS nc
            |  FROM cw LEFT JOIN bwin b ON b.wn = cw.wn
            |  GROUP BY cw.doc_id, cw.chunk_id)""".stripMargin)
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT p.doc_id, p.chunk_id, p.seq_id,
         |       CAST(COALESCE(c.nw, 0) AS BIGINT) AS n_windows,
         |       CAST(COALESCE(c.nc, 0) AS BIGINT) AS n_contaminated
         |FROM pk p LEFT JOIN cnt c ON c.doc_id = p.doc_id AND c.chunk_id = p.chunk_id
         |ORDER BY p.doc_id, p.chunk_id""".stripMargin
    }
    val packIdsSql = packIdsSqlWith(eos = false)
    val packIdsEosSql = packIdsSqlWith(eos = true)
    val packIdsGpt2Sql = packIdsSqlWith(eos = true, gpt2 = true)
    // the decode oracles derive the expected string STRAIGHT from the
    // text — the round trip's whole point: no training emulation, no
    // apply chain; the engine's encode→decode must land back on the
    // plain word concat (array_to_string of the shared segmentation)
    val decodeSql =
      s"""SELECT doc_id,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE array_to_string(${Tokens.duckToks("text")}, '') END AS decoded
         |FROM documents ORDER BY doc_id""".stripMargin
    val decodeBytesSql =
      s"""WITH $plantedCte
         |SELECT doc_id,
         |       CASE WHEN text IS NULL THEN NULL
         |            ELSE array_to_string(${Tokens.duckToks("text")}, '') END AS decoded
         |FROM planted ORDER BY doc_id""".stripMargin
    Seq("text_tokens_bpe" -> tokensSql, "chunk_pack_bpe" -> packSql,
      "sample_token_budget_bpe" -> budgetSql, "text_bpe_vocab" -> vocabSql,
      "text_bpe_vocab_large" -> vocabLargeSql,
      "text_tokens_bpe_large" -> tokensLargeSql,
      "text_tokens_bpe_bytes" -> tokensBytesSql,
      "text_tokens_bpe_gpt2" -> tokensGpt2Sql,
      "text_bpe_ids_gpt2" -> idsGpt2Sql,
      "text_bpe_decode_gpt2" -> decodeGpt2Sql,
      "text_bpe_ids" -> idsSql,
      "text_bpe_ids_bytes" -> idsBytesSql,
      "text_bpe_decode" -> decodeSql,
      "text_bpe_decode_bytes" -> decodeBytesSql,
      "chunk_pack_ids" -> packIdsSql,
      "chunk_pack_ids_eos" -> packIdsEosSql,
      "chunk_pack_ids_gpt2" -> packIdsGpt2Sql,
      "chunk_decontaminate" -> decontaminateSql)
  }
}
