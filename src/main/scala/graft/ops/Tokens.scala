package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE shared tokenizer every token-granular op uses — chunking, packing,
  * token-mass sampling, repetition metrics, span dedup, BM25 document
  * length. One definition so the ops cannot desynchronize: a document
  * chunked, sampled, and span-deduplicated must see the SAME token stream,
  * and the DuckDB oracles mirror exactly the [[duckToks]] form.
  *
  * Rule (r13): split on whitespace RUNS, with CJK codepoints first
  * segmented to per-character tokens — Han / Hiragana / Katakana / Hangul
  * script characters each become their own token (the public uniseg /
  * ICU-lite fallback for space-free scripts). Without it a CJK document —
  * which `text_langid` happily detects — degenerates to ONE giant token,
  * silently breaking chunk boundaries, pack budgets, BM25 length
  * normalization, repetition ratios, and span windows for a major slice
  * of any multilingual crawl. Per-CHARACTER segmentation is deliberately
  * language-unconditional: it is the identity on non-CJK text, so no
  * langid gate (and no gate misfire) is involved.
  *
  * Zero-length tokens are dropped by filter (rather than `trim` + split):
  * SQL `trim` strips only spaces, so a trailing tab would otherwise
  * smuggle an empty token into the stream.
  *
  * The 64-bit shingle-hash tier (minhash / simhash / n-gram Jaccard /
  * novelty / fluency) tokenizes inside the native WordShingleHashes
  * expression — which applies the SAME CJK per-character rule (and its
  * HUGEINT oracle emulation in HashOracleSql mirrors it), so the two
  * tokenizers agree on segmentation boundaries while hashing
  * differently by design. */
private[graft] object Tokens {
  /** Version of the segmentation rule itself — bump on ANY change to
    * [[seg]]/[[segString]] semantics. Folded into stored-model fingerprint
    * salts (the BPE merge tables) so a rule change retrains rather than
    * serving counts from a model trained under the old segmentation. */
  private[graft] val SegV = "seg1"

  /** Java-regex capture of one CJK codepoint (Unicode script classes). */
  private val CjkJava = "([\\p{IsHan}\\p{IsHiragana}\\p{IsKatakana}\\p{IsHangul}])"

  /** The shared token stream: array<string> of non-empty tokens. */
  def seg(text: Column): Column =
    filter(split(regexp_replace(text, CjkJava, " $1 "), "\\s+"),
      t => length(t) > 0)

  /** The DuckDB mirror of [[seg]] — oracle SQL embeds exactly this form
    * (RE2 spells the same script classes \p{Han} etc.; DuckDB string
    * literals keep backslashes verbatim). Centralized so an entry cannot
    * drift from the engine rule. */
  def duckToks(textExpr: String): String =
    s"list_filter(string_split_regex(regexp_replace($textExpr, " +
      """'([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])', ' \1 ', 'g'), """ +
      """'\s+'), t -> length(t) > 0)"""

  private val CjkPattern = java.util.regex.Pattern.compile(CjkJava)
  private val WsPattern = java.util.regex.Pattern.compile("\\s+")

  /** Plain-Scala form of [[seg]], for expressions that tokenize inside
    * their own eval (the BPE subword counter): the SAME regex rule —
    * space out CJK codepoints, split on whitespace runs, drop empties —
    * so a doc segmented in the DataFrame layer and inside an expression
    * sees one token stream. Patterns precompiled: this runs per row. */
  private[graft] def segString(s: String): Array[String] =
    WsPattern.split(CjkPattern.matcher(s).replaceAll(" $1 "))
      .filter(_.nonEmpty)
}
