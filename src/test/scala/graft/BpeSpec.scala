package graft

import graft.Tables
import graft.ops.{Bpe, Chunking, Tokens}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** BPE subword tokenization: training pinned on a hand-computable
  * fixture, the apply scan rule's edge cases, the fidelity claim on
  * code/URL/CJK text (the whitespace proxy misbudgets exactly there),
  * and the persisted-model round trip the entries ride. */
class BpeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  /** The packed-ids gate entries render their sequences space-joined
    * (driver-canonicalizable scalar, the s33 precedent) — parse back. */
  private def parseIds(s: String): Seq[Int] =
    if (s.isEmpty) Seq.empty else s.split(" ").toSeq.map(_.toInt)

  test("training learns merges most-frequent-first with deterministic tie-breaks") {
    // pair freqs round 1: (l,o)=5 and (o,w)=5 tie — (l,o) wins on the
    // (left, right) lexicographic tie-break; then (lo,w)=5, (low,e)=2
    // (lower+lowest); after that no pair repeats → early stop at 3
    val dict = Seq("low" -> 3L, "lower" -> 1L, "lowest" -> 1L)
    val merges = Bpe.train(dict, nMerges = 10)
    assert(merges == Seq(("l", "o"), ("lo", "w"), ("low", "e")))
    assert(Bpe.encode("low", merges) == Seq("low"))
    assert(Bpe.encode("lowest", merges) == Seq("lowe", "s", "t"))
  }

  test("training stops early when no pair repeats (fixed-stage oracle no-ops match)") {
    val merges = Bpe.train(Seq("abc" -> 1L, "xyz" -> 1L), nMerges = 10)
    assert(merges.isEmpty, "no adjacent pair reaches frequency 2")
    val some = Bpe.train(Seq("aa" -> 1L, "aab" -> 1L), nMerges = 10)
    assert(some.head == ("a", "a"))
  }

  test("merge application is left-to-right non-overlapping (the SQL replace scan)") {
    // "aaa" under rule (a,a): [aa, a] — the merged symbol cannot re-merge
    // within the same rule pass
    assert(Bpe.encode("aaa", Seq(("a", "a"))) == Seq("aa", "a"))
    assert(Bpe.encode("aaaa", Seq(("a", "a"))) == Seq("aa", "aa"))
    // rank order: (a,a) then (aa,aa)
    assert(Bpe.encode("aaaa", Seq(("a", "a"), ("aa", "aa"))) == Seq("aaaa"))
    // a later rule's merged symbol never creates an EARLIER rule's pair
    assert(Bpe.encode("abab", Seq(("a", "b"), ("ab", "ab"))) == Seq("abab"))
  }

  test("the whitespace proxy misbudgets code, URL, and CJK text; BPE counts subwords") {
    // model trained on the word-salad slice: in-distribution words
    // compress toward 1 subword, out-of-distribution text does not
    val dict = Seq("table" -> 20L, "value" -> 18L, "scan" -> 15L,
      "hash" -> 12L, "row" -> 10L, "the" -> 30L)
    val merges = Bpe.train(dict)
    assert(merges.nonEmpty)
    def count(text: String): Long = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(text)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType))))
      df.select(Bpe.bpe_tokens(col("t"), merges)).collect()(0).getLong(0)
    }
    def ws(text: String): Long = {
      val df = spark.createDataFrame(
        java.util.Arrays.asList(org.apache.spark.sql.Row(text)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("t",
            org.apache.spark.sql.types.StringType))))
      df.select(size(Tokens.seg(col("t"))).cast("long"))
        .collect()(0).getLong(0)
    }
    // in-distribution: each trained word is ONE subword → counts agree
    val indist = "the table scan hash row value"
    assert(count(indist) == ws(indist),
      s"trained words must compress to 1 subword: ${count(indist)} vs ${ws(indist)}")
    // code: identifiers/punctuation are unseen → many subwords per "word"
    val code = "def f(xs): return [x*2 for x in xs if x%3==0]"
    assert(count(code) >= 3 * ws(code),
      s"code must cost ≥3× its whitespace tokens: ${count(code)} vs ${ws(code)}")
    // URL: one whitespace token, many subwords
    val url = "https://example.com/a/b?q=1&x=2"
    assert(ws(url) == 1 && count(url) > 10)
    // CJK: per-character segmentation feeds BPE one char per word — the
    // budget reflects characters, not a single giant token
    val cjk = "机器学习模型"
    assert(count(cjk) == 6 && ws(cjk) == 6)
  }

  test("persisted model round-trips and the entry chain runs at sf0.001") {
    val dir = Bpe.ensureModel(spark, TestSpark.Sf0001)
    val loaded = Bpe.loadMerges(spark, dir)
    assert(loaded.nonEmpty && loaded.size <= Bpe.NMerges)
    // determinism: re-ensure returns the same fingerprinted dir and the
    // same merge sequence; retraining from the sample agrees
    assert(Bpe.ensureModel(spark, TestSpark.Sf0001) == dir)
    assert(Bpe.loadMerges(spark, dir) == loaded)
    // the entries execute end-to-end on the small slice
    val toks = SparkEntry.queries("text_tokens_bpe")(spark, TestSpark.Sf0001)
      .collect()
    assert(toks.nonEmpty)
    // subword counts are finer or equal: n_bpe >= n_ws always (a word is
    // at least one subword), equality only when every word compresses
    assert(toks.forall(r => r.getLong(1) >= r.getLong(2)))
    val packed = SparkEntry.queries("chunk_pack_bpe")(spark, TestSpark.Sf0001)
      .collect()
    assert(packed.nonEmpty)
    // offsets stay inside their sequence capacity
    assert(packed.forall(r => r.getLong(4) >= 0 && r.getLong(4) < 256))
  }

  test("null and wordless text: null-in/null-out, empty counts zero") {
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val merges = Seq(("a", "b"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(null.asInstanceOf[String]),
        org.apache.spark.sql.Row(""),
        org.apache.spark.sql.Row("   \t "),
        org.apache.spark.sql.Row("ab")),
      StructType(Seq(StructField("t", StringType))))
    val got = df.select(Bpe.bpe_tokens(col("t"), merges)).collect()
      .map(r => if (r.isNullAt(0)) None else Some(r.getLong(0))).toSeq
    // NULL text → NULL (like size(seg(NULL))); empty/whitespace → 0;
    // "ab" merges to one subword
    assert(got == Seq(None, Some(0L), Some(0L), Some(1L)))
  }

  test("the token-budget sampler is tokenizer-parameterized end to end") {
    import org.apache.spark.sql.functions.col
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val merges = Bpe.loadMerges(spark, Bpe.ensureModel(spark, TestSpark.Sf0001))
    val byWords = graft.ops.Sampling.tokenBudgetSample(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val byBpe = graft.ops.Sampling.tokenBudgetSample(docs,
      tokenCount = Bpe.bpe_tokens(col("text"), merges))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(byBpe.nonEmpty)
    // subword masses shift the per-stratum rates, so the kept sets differ
    // (equal sets would mean the budget unit is not actually plumbed)
    assert(byWords != byBpe)
  }

  test("packChunks budget column is pluggable: bpe_tokens packing differs from word packing") {
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    val dir = Bpe.ensureModel(spark, TestSpark.Sf0001)
    val merges = Bpe.loadMerges(spark, dir)
    val ch = Chunking.chunk(docs)
      .withColumn("bpe_tokens", Bpe.bpe_tokens(col("chunk_text"), merges))
    val byWords = Chunking.packChunks(ch, capacity = 64)
      .select("doc_id", "chunk_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val byBpe = Chunking.packChunks(ch, capacity = 64, tokCol = "bpe_tokens")
      .select("doc_id", "chunk_id", "seq_id").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(byWords.keySet == byBpe.keySet)
    // same chunks, different budgets → different sequence assignment
    // (subword counts exceed word counts on this corpus's unseen words)
    assert(byWords != byBpe)
  }

  test("token ID sequences are LOSSLESS and consistent with the counts (r15)") {
    // decode = merged id → the merge's output string, base id → its
    // codepoint; per word the decoded subwords must concatenate back to
    // the word EXACTLY (the property that makes ids trainable artifacts
    // rather than summaries), and the sequence length must equal what
    // the counting expression budgets
    val dir = Bpe.ensureModel(spark, TestSpark.Sf0001)
    val merges = Bpe.loadMerges(spark, dir)
    val idsExpr = Bpe.BpeTokenIds(org.apache.spark.sql.GraftSqlBridge
      .expression(col("text")), merges)
    val outputs = merges.map { case (a, b) => a + b }
    def decode(id: Int): String =
      if (id >= 0x110000) outputs(id - 0x110000)
      else new String(Character.toChars(id))
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"),
        Bpe.bpe_token_ids(col("text"), merges).as("ids"),
        Bpe.bpe_tokens(col("text"), merges).as("n"),
        col("text"))
      .collect()
    assert(docs.nonEmpty)
    var mergedSeen = 0L
    docs.foreach { r =>
      if (!r.isNullAt(3)) {
        val ids = r.getSeq[Int](1)
        assert(ids.length.toLong == r.getLong(2),
          s"doc ${r.getLong(0)}: ids.length != n_bpe")
        mergedSeen += ids.count(_ >= 0x110000)
        // lossless: decoding the whole sequence reconstructs the text's
        // word stream (segmentation drops separators, so compare to the
        // segmented words joined)
        val rebuilt = ids.map(decode).mkString
        assert(rebuilt == graft.ops.Tokens.segString(r.getString(3)).mkString,
          s"doc ${r.getLong(0)}: decode(ids) != words")
      } else assert(r.isNullAt(1) && r.isNullAt(2))
    }
    // the model must actually FIRE on this corpus — otherwise the test
    // only proves the base-codepoint arm
    assert(mergedSeen > 0, "no merged ids on the whole corpus")
  }

  test("byte-level token IDs are lossless through UTF-8 (r15)") {
    // base id = the byte value, merged id = 256 + rank; decoding to a
    // byte stream and re-reading as UTF-8 must rebuild the word stream
    // even across the planted CJK/URL text where codepoints span bytes
    val dir = Bpe.ensureModelBytes(spark, TestSpark.Sf0001)
    val merges = Bpe.loadMerges(spark, dir)
    val outputs = merges.map { case (a, b) => a + b }
    def bytesOf(id: Int): Array[Byte] =
      if (id >= 256) outputs(id - 256).grouped(2)
        .map(h => Integer.parseInt(h, 16).toByte).toArray
      else Array(id.toByte)
    val docs = Bpe.plantMultiscript(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
      .select(col("doc_id"),
        Bpe.bpe_token_ids(col("text"), merges, byteLevel = true).as("ids"),
        col("text"))
      .collect()
    var planted = 0
    docs.foreach { r =>
      if (!r.isNullAt(2)) {
        val ids = r.getSeq[Int](1)
        val rebuilt = new String(ids.toArray.flatMap(bytesOf),
          java.nio.charset.StandardCharsets.UTF_8)
        val words = graft.ops.Tokens.segString(r.getString(2)).mkString
        assert(rebuilt == words, s"doc ${r.getLong(0)}: byte decode != words")
        if (r.getString(2).contains("学习")) planted += 1
      }
    }
    assert(planted > 0, "the multiscript plant never reached the test")
  }

  test("BpeDecodeIds inverts BpeTokenIds on both alphabets (r15)") {
    // the ENGINE-side inverse (the entries' round trip runs through it):
    // encode → decode must land on the segmented word concat for the
    // codepoint model on the raw corpus and the byte-level model on the
    // planted multiscript corpus (codepoints split across byte ids)
    val cp = Bpe.loadMerges(spark, Bpe.ensureModel(spark, TestSpark.Sf0001))
    val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
    docs.select(col("doc_id"), col("text"),
      Bpe.bpe_decode_ids(Bpe.bpe_token_ids(col("text"), cp), cp).as("dec"))
      .collect().foreach { r =>
        if (r.isNullAt(1)) assert(r.isNullAt(2), "null text must decode null")
        else assert(r.getString(2) ==
          graft.ops.Tokens.segString(r.getString(1)).mkString,
          s"doc ${r.getLong(0)}: expression decode != words")
      }
    val by = Bpe.loadMerges(spark, Bpe.ensureModelBytes(spark, TestSpark.Sf0001))
    Bpe.plantMultiscript(docs)
      .select(col("doc_id"), col("text"),
        Bpe.bpe_decode_ids(Bpe.bpe_token_ids(col("text"), by, byteLevel = true),
          by, byteLevel = true).as("dec"))
      .collect().foreach { r =>
        if (!r.isNullAt(1))
          assert(r.getString(2) ==
            graft.ops.Tokens.segString(r.getString(1)).mkString,
            s"doc ${r.getLong(0)}: byte expression decode != words")
      }
  }

  test("chunk_pack_ids cross-pins chunk_pack_bpe: same boundaries, ids sized to the budget (r15)") {
    // the capstone artifact must pack on EXACTLY the counting
    // expression's budget: every chunk's ids.length == chunk_pack_bpe's
    // bpe_tokens and the (seq_id, seq_offset) assignment is identical —
    // a drift between BpeTokenIds and BpeTokenCount would split them
    val ids = SparkEntry.queries("chunk_pack_ids")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (parseIds(r.getString(2)).length.toLong, r.getLong(3), r.getLong(4)))
      .toMap
    val counts = SparkEntry.queries("chunk_pack_bpe")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3), r.getLong(4)))
      .toMap
    assert(ids.nonEmpty && ids.keySet == counts.keySet)
    ids.foreach { case (k, v) =>
      assert(v == counts(k), s"chunk $k: ids artifact diverged from the count artifact")
    }
  }

  test("chunk_pack_ids_eos materializes the separator: sentinel leads each doc, offset AT it (r15)") {
    val rows = SparkEntry.queries("chunk_pack_ids_eos")(spark, TestSpark.Sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), parseIds(r.getString(2)), r.getLong(3), r.getLong(4)))
    assert(rows.nonEmpty)
    rows.foreach { case (d, c, ids, _, _) =>
      if (c == 0L) assert(ids.head == Bpe.EosId, s"doc $d first chunk must lead with the sentinel")
      else assert(!ids.contains(Bpe.EosId), s"doc $d chunk $c must not carry a sentinel")
    }
    // the very FIRST chunk packs at offset 0 — the materialized form's
    // offset points AT the separator, where chunk_pack_eos's lead-charge
    // form points past it (its first offset is 1)
    val first = rows.minBy { case (d, c, _, _, _) => (d, c) }
    assert(first._4 == 0L && first._5 == 0L)
    // budget conservation: exactly one sentinel per document joined the
    // token mass relative to the plain ids artifact
    val plain = SparkEntry.queries("chunk_pack_ids")(spark, TestSpark.Sf0001)
      .collect().map(r => parseIds(r.getString(2)).length.toLong).sum
    val nDocs = rows.iterator.filter(_._2 == 0L).size
    assert(rows.iterator.map(_._3.length.toLong).sum == plain + nDocs)
  }

  test("BpeDecodeIds degrades corrupt ids to U+FFFD, never throws (r15)") {
    import org.apache.spark.sql.types._
    val merges = Seq(("a", "b"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(Seq(-5, 0x110000 + 5, 0xD800, 97)),
        org.apache.spark.sql.Row(null)),
      StructType(Seq(StructField("ids", ArrayType(IntegerType)))))
    val got = df.select(Bpe.bpe_decode_ids(col("ids"), merges)).collect()
    // -5 and rank-5-of-a-1-rule-table are outside both id spaces;
    // 0xD800 is an unpaired surrogate — quarantined too (r15 advisory:
    // appendCodePoint would emit it and UTF-8 would turn it into '?')
    assert(got(0).getString(0) == "���a")
    assert(got(1).isNullAt(0), "null ids must decode null")
    val bg = df.select(Bpe.bpe_decode_ids(col("ids"), merges, byteLevel = true))
      .collect()
    assert(bg(0).getString(0) == "���a",
      "byte-level corrupt ids must degrade identically")
  }

  test("BpeDecodeIds renders the EOS sentinel as <|endoftext|>, both alphabets (r16)") {
    import org.apache.spark.sql.types._
    val merges = Seq(("a", "b"))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(
        org.apache.spark.sql.Row(Seq(Bpe.EosId, 97, Bpe.EosId))),
      StructType(Seq(StructField("ids", ArrayType(IntegerType)))))
    val cp = df.select(Bpe.bpe_decode_ids(col("ids"), merges)).collect()
    assert(cp(0).getString(0) == s"${Bpe.EosToken}a${Bpe.EosToken}")
    val by = df.select(Bpe.bpe_decode_ids(col("ids"), merges, byteLevel = true))
      .collect()
    assert(by(0).getString(0) == s"${Bpe.EosToken}a${Bpe.EosToken}",
      "the separator is a documented token, not corruption")
  }
}
