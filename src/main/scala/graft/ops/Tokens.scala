package graft.ops

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** THE whitespace tokenizer every token-granular op shares — chunking,
  * token-mass sampling, repetition metrics, span dedup. One definition so
  * the ops cannot desynchronize: a document chunked, sampled, and
  * span-deduplicated must see the SAME token stream, and the DuckDB
  * oracles mirror exactly this form
  * (`list_filter(string_split_regex(text, '\s+'), t -> length(t) > 0)`).
  *
  * Split on whitespace RUNS, then drop zero-length tokens: the filter
  * (rather than `trim` + split) makes tab/newline-padded and
  * all-whitespace documents behave — SQL `trim` strips only spaces, so a
  * trailing tab would otherwise smuggle an empty token into the stream. */
private[ops] object Tokens {
  def ws(text: Column): Column =
    filter(split(text, "\\s+"), t => length(t) > 0)
}
