package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Sliding-window document chunking — the op that turns a cleaned corpus
  * into model-ready training windows. Every LLM data pipeline ends with
  * it: fixed-size token windows with overlap, stable chunk ids, and the
  * source offsets kept so a chunk can be traced back to its document.
  * (The reference has no text surface at all — this belongs to the
  * driver-mandated training-pipeline tier next to
  * [[TextAnalysis]]/[[Curation]].)
  *
  * Semantics (deterministic, engine-reproducible):
  *  - tokens are the whitespace-run-split words of the text with empty
  *    strings filtered (see [[toks]]);
  *  - window starts at token offsets 0, stride, 2·stride, … while the
  *    offset is inside the document, so consecutive chunks overlap by
  *    (chunk − stride) tokens and the final chunk may be short (tail
  *    policy: keep, never pad — short tails carry real text);
  *  - `chunk_id` is the window ordinal, `chunk_start` the token offset,
  *    `chunk_tokens` the actual window length — all plain integers, so
  *    any engine reading the same documents derives the same chunks;
  *  - zero-token documents produce no chunks (there is nothing to train
  *    on; the row count is the pipeline's own accounting signal).
  *
  * Scale: one map-side projection + `posexplode` — NO shuffle anywhere.
  * Per-document memory is O(document tokens) (the token array is
  * materialized once per row) — the bound shared by any whole-document
  * tokenizer; pathological single documents beyond executor memory need
  * a byte-range pre-split upstream, not a different chunker.
  * Output volume is Σ ceil(tokens/stride) rows ≈ (1/stride + overlap
  * factor) × corpus tokens, linear in the corpus; at 100 TB this is a
  * streaming pass whose parallelism is the scan's. The token array is
  * built once per document and sliced per window map-side; nothing
  * document-sized crosses an exchange (the orderBy in the corpus entry
  * is presentation-only for the oracle differ).
  */
object Chunking {

  /** The shared tokenizer ([[Tokens.seg]] — one definition
    * across chunking, sampling, repetition, and span dedup). */
  private def toks(text: Column): Column = Tokens.seg(text)

  /** Explode `docs` into overlapping token windows.
    *
    * @param chunkTokens window size in tokens
    * @param stride      start-to-start distance (≤ chunkTokens ⇒ overlap)
    * @param keep        extra columns carried through to every chunk row
    *                    (metadata a downstream trainer needs per window)
    */
  def chunk(docs: DataFrame, textCol: String = "text", idCol: String = "doc_id",
      chunkTokens: Int = 32, stride: Int = 24,
      keep: Seq[String] = Nil): DataFrame = {
    require(chunkTokens > 0 && stride > 0, "chunkTokens and stride must be positive")
    val carried = keep.map(col)
    docs
      .select(col(idCol) +: carried :+ toks(col(textCol)).as("toks"): _*)
      .withColumn("n", size(col("toks")))
      .where(col("n") > 0)
      .select(Seq(col(idCol)) ++ carried ++ Seq(col("n"), col("toks"),
        posexplode(sequence(lit(0), col("n") - 1, lit(stride)))
          .as(Seq("chunk_id", "chunk_start"))): _*)
      .select(Seq(col(idCol)) ++ carried ++ Seq(
        col("chunk_id").cast("long").as("chunk_id"),
        col("chunk_start").cast("long").as("chunk_start"),
        least(lit(chunkTokens), col("n") - col("chunk_start"))
          .cast("long").as("chunk_tokens"),
        array_join(slice(col("toks"), col("chunk_start") + 1, lit(chunkTokens)), " ")
          .as("chunk_text")): _*)
  }

  /** Range-partition + in-partition sort the documents by doc_id — the
    * narrow-input preamble for preRanged packing: [[chunk]]'s explode
    * preserves row order and emits chunk_id ascending per document, so
    * the chunk stream downstream is globally (doc_id, chunk_id)-ordered
    * without ever sorting the exploded rows. */
  def rangedDocs(docs: DataFrame): DataFrame =
    docs.repartitionByRange(col("doc_id")).sortWithinPartitions("doc_id")

  /** Sequence packing: assign every chunk to a fixed-capacity training
    * sequence by GLOBAL token offset — `seq_id = ⌊tokens-before/capacity⌋`
    * over the canonical (doc_id, chunk_id) order, `seq_offset` the
    * position inside its sequence. This is offset packing (each sequence
    * holds ~capacity tokens; a chunk starting near the boundary may run
    * past it), the deterministic rule a SQL window can mirror exactly —
    * greedy first-fit bin packing is order-history-dependent and
    * irreproducible across engines.
    *
    * Scale: the global running sum uses the two-phase zipWithIndex
    * pattern, NOT a single-partition window (the plan Spark gives an
    * un-partitioned `SUM OVER (ORDER BY …)` funnels the corpus through
    * one task): range-repartition + in-partition sort gives the global
    * order; pass 1 reduces each partition to ONE token subtotal
    * (collected: |partitions| longs — bounded driver state); pass 2
    * streams each partition with its broadcast prefix offset. The sorted
    * input is persisted between the passes, so the explode/sort runs
    * once. Output is invariant to where the range boundaries fall — the
    * running sum depends only on the global order, so the range
    * partitioner's sampled bounds cannot perturb results.
    *
    * `leadCol` (r15) names an optional per-row LEADING cost charged
    * before the row's own tokens — the separator-token hook: a trainer
    * that packs documents with an EOS/boundary token between them
    * budgets it here (see `chunk_pack_eos`), and the row's seq position
    * accounts for the separator preceding its text. Charged into both
    * prefix-sum passes, so sequences still hold ~capacity tokens
    * INCLUDING separators. */
  def packChunks(chunks: DataFrame, capacity: Int = 4096,
      tokCol: String = "chunk_tokens", leadCol: Option[String] = None,
      preRanged: Boolean = false): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = chunks.sparkSession
    val keys = Seq(col("doc_id"), col("chunk_id"))
    // preRanged (r19): the caller already established the global
    // (doc_id, chunk_id) range order — by range-partitioning the DOCS
    // before the chunk explode (order-preserving), so the range
    // partitioner's bounds-sampling pass ran over the narrow document
    // scan instead of re-executing the chunk+tokenize subtree. The pack
    // output is invariant to partition boundaries (only the global order
    // matters), so ranging by doc_id alone is equivalent.
    val sorted = (if (preRanged) chunks
      else chunks
        .repartitionByRange(keys: _*)
        .sortWithinPartitions(keys: _*))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val schema = sorted.schema
    // the budget column is pluggable: `chunk_tokens` (whitespace words)
    // by default, a subword count (chunk_pack_bpe) when the trainer's
    // budget is tokenizer-accurate
    val tokAt = schema.fieldIndex(tokCol)
    val leadAt = leadCol.map(schema.fieldIndex).getOrElse(-1)
    // pass 1: one subtotal per partition (row cost = lead + tokens)
    val subtotals = sorted.queryExecution.toRdd
      .mapPartitionsWithIndex { (i, it) =>
        var s = 0L
        it.foreach { r =>
          if (leadAt >= 0) s += r.getLong(leadAt)
          s += r.getLong(tokAt)
        }
        Iterator.single(i -> s)
      }.collect().sortBy(_._1).map(_._2)
    val prefixes = subtotals.scanLeft(0L)(_ + _)
    val prefixB = spark.sparkContext.broadcast(prefixes)
    val cap = capacity.toLong
    // pass 2: stream with the partition's starting offset; the leading
    // cost lands BEFORE the row's position is assigned
    val packed = sorted.queryExecution.toRdd.mapPartitionsWithIndex { (i, it) =>
      var cum = prefixB.value(i)
      it.map { r =>
        if (leadAt >= 0) cum += r.getLong(leadAt)
        val t = r.getLong(tokAt)
        val out = new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          r.copy(),
          org.apache.spark.sql.catalyst.InternalRow(cum / cap, cum % cap))
        cum += t
        out: org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields ++ Seq(
      org.apache.spark.sql.types.StructField("seq_id", org.apache.spark.sql.types.LongType, nullable = false),
      org.apache.spark.sql.types.StructField("seq_offset", org.apache.spark.sql.types.LongType, nullable = false)))
    org.apache.spark.sql.GraftSqlBridge.internalCreateDataFrame(spark, packed, outSchema)
  }

  /** Deterministic training-shard assignment — the pipeline's last hop:
    * packed sequences → numbered shards a trainer consumes in a
    * reproducible pseudo-random order. `shard` is a Knuth-style
    * multiplicative hash bucket of the sequence id mod `nShards` (a THIRD
    * multiplier — xxhash's PRIME32_3 — decorrelated from the split and
    * sampling buckets in [[Sampling]]); within-shard order is a FOURTH
    * multiplier's bucket (PRIME32_4) with the id as tiebreak, so the
    * training order is shuffled-but-replayable from ids alone by any
    * engine.
    *
    * `shard_pos` (rank within the shard) is computed WITHOUT a global
    * window: hash-repartition on shard, in-partition sort by
    * (shard, okey, id), then ONE streaming enumeration pass whose counter
    * resets at shard boundaries — each task enumerates only the shards it
    * owns, the same exchange+sort a `ROW_NUMBER() OVER (PARTITION BY
    * shard …)` would plan but with the enumeration in the stream instead
    * of a window operator buffering per partition. Production keeps
    * per-shard volume bounded by scaling nShards with the corpus (shards
    * are ~fixed-size training files, so per-task work stays constant). */
  def shardSequences(seqs: DataFrame, idCol: String = "seq_id",
      nShards: Int = 8): DataFrame = {
    require(nShards > 0, "nShards must be positive")
    val spark = seqs.sparkSession
    val sorted = seqs
      .withColumn("shard",
        pmod((col(idCol) % 1000003L) * 3266489917L, lit(nShards.toLong)))
      .withColumn("okey",
        pmod((col(idCol) % 1000003L) * 668265263L, lit(1000003L)))
      .repartition(nShards, col("shard"))
      .sortWithinPartitions(col("shard"), col("okey"), col(idCol))
    val schema = sorted.schema
    val shardAt = schema.fieldIndex("shard")
    val enumerated = sorted.queryExecution.toRdd.mapPartitions { it =>
      var cur = -1L
      var pos = -1L
      it.map { r =>
        val sh = r.getLong(shardAt)
        if (sh != cur) { cur = sh; pos = 0L } else pos += 1L
        new org.apache.spark.sql.catalyst.expressions.JoinedRow(
          r.copy(), org.apache.spark.sql.catalyst.InternalRow(pos))
          : org.apache.spark.sql.catalyst.InternalRow
      }
    }
    val outSchema = org.apache.spark.sql.types.StructType(schema.fields :+
      org.apache.spark.sql.types.StructField("shard_pos",
        org.apache.spark.sql.types.LongType, nullable = false))
    org.apache.spark.sql.GraftSqlBridge
      .internalCreateDataFrame(spark, enumerated, outSchema)
      .drop("okey")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "text_chunk" -> ((s, d) =>
      // r19: input sorted by doc_id; the window explode emits chunk_id in
      // ascending order per doc, so (doc_id, chunk_id) order holds without
      // a trailing sort re-running seg+explode in its range-sampling pass
      chunk(Tables.load(s, d, "documents").orderBy("doc_id"))),
    "chunk_pack" -> ((s, d) =>
      packChunks(chunk(rangedDocs(Tables.load(s, d, "documents"))),
        capacity = 256, preRanged = true)
        .select("doc_id", "chunk_id", "chunk_tokens", "seq_id", "seq_offset")
        .orderBy("doc_id", "chunk_id")),
    // r15: packing with a document separator — one EOS-style boundary
    // token charged at each document's FIRST chunk (the between-documents
    // separator of GPT-2-lineage packing: map-side detectable from
    // chunk_id = 0 alone, where last-chunk detection would need the doc
    // length). The separator participates in the budget, so sequences
    // hold ~capacity tokens INCLUDING boundaries, and every chunk's
    // seq_offset accounts for the separators preceding it
    "chunk_pack_eos" -> ((s, d) => {
      val ch = chunk(rangedDocs(Tables.load(s, d, "documents")))
        .withColumn("eos", when(col("chunk_id") === 0, 1L).otherwise(0L))
      packChunks(ch, capacity = 256, leadCol = Some("eos"), preRanged = true)
        .select("doc_id", "chunk_id", "chunk_tokens", "eos", "seq_id", "seq_offset")
        .orderBy("doc_id", "chunk_id")
    }),
    // the sequence manifest (seq_id, n_chunks) sharded for training
    "chunk_shards" -> ((s, d) => {
      val packed = packChunks(chunk(rangedDocs(Tables.load(s, d, "documents"))),
        capacity = 256, preRanged = true)
      val seqs = packed.groupBy("seq_id").agg(count(lit(1)).as("n_chunks"))
      shardSequences(seqs)
        .select("seq_id", "n_chunks", "shard", "shard_pos")
        .orderBy("shard", "shard_pos")
    }),
  )

  val oracle: Seq[(String, String)] = Seq(
    // same windows from the same whitespace tokens: list slicing is
    // 1-based inclusive in DuckDB, hence the +1/least bounds mirroring
    // Spark's slice(toks, start+1, chunkTokens)
    "text_chunk" ->
      ("""SELECT doc_id,
        |       CAST(s // 24 AS BIGINT) AS chunk_id,
        |       CAST(s AS BIGINT) AS chunk_start,
        |       CAST(least(32, n - s) AS BIGINT) AS chunk_tokens,
        |       array_to_string(t[s + 1 : least(s + 32, n)], ' ') AS chunk_text
        |FROM (SELECT doc_id, t, len(t) AS n,
        |             unnest(generate_series(0, len(t) - 1, 24)) AS s
        |      FROM (SELECT doc_id, """ + Tokens.duckToks("text") + """ AS t
        |            FROM documents)
        |      WHERE len(t) > 0)
        |ORDER BY doc_id, chunk_id""").stripMargin,
    // the oracle can afford the single-partition window the engine's
    // two-phase prefix-sum avoids: tokens-before over the same canonical
    // order, then the same integer div/mod
    "chunk_pack" ->
      ("""WITH ch AS (
        |  SELECT doc_id,
        |         CAST(s // 24 AS BIGINT) AS chunk_id,
        |         CAST(least(32, n - s) AS BIGINT) AS chunk_tokens
        |  FROM (SELECT doc_id, t, len(t) AS n,
        |               unnest(generate_series(0, len(t) - 1, 24)) AS s
        |        FROM (SELECT doc_id, """ + Tokens.duckToks("text") + """ AS t
        |              FROM documents)
        |        WHERE len(t) > 0)),
        |w AS (
        |  SELECT doc_id, chunk_id, chunk_tokens,
        |         COALESCE(SUM(chunk_tokens) OVER (
        |           ORDER BY doc_id, chunk_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM ch)
        |SELECT doc_id, chunk_id, chunk_tokens,
        |       CAST(cb // 256 AS BIGINT) AS seq_id,
        |       CAST(cb % 256 AS BIGINT) AS seq_offset
        |FROM w ORDER BY doc_id, chunk_id""").stripMargin,
    // same chunk derivation; the separator is SQL's CASE on chunk_id = 0,
    // the running sum charges (eos + tokens) per row, and the current
    // row's OWN eos lands before its position — mirroring pass 2's
    // cum += lead before the assignment
    "chunk_pack_eos" ->
      ("""WITH ch AS (
        |  SELECT doc_id,
        |         CAST(s // 24 AS BIGINT) AS chunk_id,
        |         CAST(least(32, n - s) AS BIGINT) AS chunk_tokens
        |  FROM (SELECT doc_id, t, len(t) AS n,
        |               unnest(generate_series(0, len(t) - 1, 24)) AS s
        |        FROM (SELECT doc_id, """ + Tokens.duckToks("text") + """ AS t
        |              FROM documents)
        |        WHERE len(t) > 0)),
        |e AS (
        |  SELECT doc_id, chunk_id, chunk_tokens,
        |         CAST(CASE WHEN chunk_id = 0 THEN 1 ELSE 0 END AS BIGINT) AS eos
        |  FROM ch),
        |w AS (
        |  SELECT doc_id, chunk_id, chunk_tokens, eos,
        |         COALESCE(SUM(chunk_tokens + eos) OVER (
        |           ORDER BY doc_id, chunk_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) + eos AS cb
        |  FROM e)
        |SELECT doc_id, chunk_id, chunk_tokens, eos,
        |       CAST(cb // 256 AS BIGINT) AS seq_id,
        |       CAST(cb % 256 AS BIGINT) AS seq_offset
        |FROM w ORDER BY doc_id, chunk_id""").stripMargin,
    // same packing chain; the shard hash and within-shard order are plain
    // integer arithmetic, and shard_pos is the window formulation the
    // engine's streaming enumeration must match exactly
    "chunk_shards" ->
      ("""WITH ch AS (
        |  SELECT doc_id,
        |         CAST(s // 24 AS BIGINT) AS chunk_id,
        |         CAST(least(32, n - s) AS BIGINT) AS chunk_tokens
        |  FROM (SELECT doc_id, t, len(t) AS n,
        |               unnest(generate_series(0, len(t) - 1, 24)) AS s
        |        FROM (SELECT doc_id, """ + Tokens.duckToks("text") + """ AS t
        |              FROM documents)
        |        WHERE len(t) > 0)),
        |w AS (
        |  SELECT chunk_tokens,
        |         COALESCE(SUM(chunk_tokens) OVER (
        |           ORDER BY doc_id, chunk_id
        |           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cb
        |  FROM ch),
        |seqs AS (SELECT CAST(cb // 256 AS BIGINT) AS seq_id,
        |                COUNT(*) AS n_chunks
        |         FROM w GROUP BY 1),
        |k AS (SELECT seq_id, n_chunks,
        |             ((seq_id % 1000003) * 3266489917) % 8 AS shard,
        |             ((seq_id % 1000003) * 668265263) % 1000003 AS okey
        |      FROM seqs)
        |SELECT seq_id, n_chunks, shard,
        |       ROW_NUMBER() OVER (PARTITION BY shard ORDER BY okey, seq_id) - 1 AS shard_pos
        |FROM k
        |ORDER BY shard, shard_pos""").stripMargin,
  )
}
