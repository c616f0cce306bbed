package graft

import graft.ops.{Chunking, Sampling, Search}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-11 pipeline additions: sliding-window chunking,
  * inverted-index keyword search, and stratified sampling. */
class ChunkSearchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*) =
    rows.toDF("doc_id", "text")

  /** Every node of the FINAL adaptive plan (unwraps AQE/stage/reuse
    * boundaries, which hide their inner plans from TreeNode.collect). */
  private def finalNodes(df: org.apache.spark.sql.DataFrame)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = {
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    import org.apache.spark.sql.execution.exchange.ReusedExchangeExec
    def flatten(p: SparkPlan): Seq[SparkPlan] = p +: (p match {
      case a: AdaptiveSparkPlanExec => flatten(a.executedPlan)
      case s: QueryStageExec => flatten(s.plan)
      case r: ReusedExchangeExec => flatten(r.child)
      case _ => p.children.flatMap(flatten)
    })
    flatten(df.queryExecution.executedPlan)
  }

  // ---- chunking -----------------------------------------------------

  test("chunk windows a known document with overlap and a short tail") {
    // 10 tokens, window 4, stride 3 → starts 0,3,6,9; tail is 1 token
    val d = docs(1L -> (0 until 10).map(i => s"t$i").mkString(" "))
    val got = Chunking.chunk(d, chunkTokens = 4, stride = 3)
      .orderBy("chunk_id")
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got === Array(
      (1L, 0L, 0L, 4L, "t0 t1 t2 t3"),
      (1L, 1L, 3L, 4L, "t3 t4 t5 t6"),
      (1L, 2L, 6L, 4L, "t6 t7 t8 t9"),
      (1L, 3L, 9L, 1L, "t9")))
  }

  test("chunk: empty and whitespace-only documents produce no chunks") {
    val d = docs(1L -> "", 2L -> "   \t  ", 3L -> "one")
    val got = Chunking.chunk(d).as[(Long, Long, Long, Long, String)].collect()
    assert(got === Array((3L, 0L, 0L, 1L, "one")))
  }

  test("chunk: a document shorter than the window is one whole chunk") {
    val d = docs(7L -> "a b c")
    val got = Chunking.chunk(d, chunkTokens = 32, stride = 24)
      .as[(Long, Long, Long, Long, String)].collect()
    assert(got === Array((7L, 0L, 0L, 3L, "a b c")))
  }

  test("chunk coverage invariants hold on the corpus") {
    // per doc: chunk count = floor((n-1)/stride)+1, the last window
    // reaches the document end, no window exceeds the declared width,
    // and no window is empty
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val n = d.select(col("doc_id"),
      size(filter(split(col("text"), "\\s+"), t => length(t) > 0))
        .cast("long").as("n"))
      .where(col("n") > 0)
    val per = Chunking.chunk(d, chunkTokens = 32, stride = 24)
      .groupBy("doc_id")
      .agg(count("*").as("chunks"),
        max(col("chunk_start") + col("chunk_tokens")).as("reach"),
        min("chunk_tokens").as("shortest"),
        max("chunk_tokens").as("widest"))
      .join(n, "doc_id")
    val bad = per.where(expr(
      "chunks != (n - 1) DIV 24 + 1 OR reach != n OR widest > 32 OR shortest < 1"))
    assert(bad.count() === 0)
    assert(per.count() > 0)
  }

  test("chunk plans with zero shuffles (map-side explode only)") {
    import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val chunked = Chunking.chunk(d)
    chunked.write.format("noop").mode("overwrite").save()
    val shuffles = finalNodes(chunked).collect { case e: ShuffleExchangeExec => e }
    assert(shuffles.isEmpty,
      s"chunking must not shuffle:\n${chunked.queryExecution.executedPlan}")
  }

  // ---- keyword search ----------------------------------------------

  test("keywordTopK scores tf × (1e6 DIV (df+1)) exactly and breaks ties by id") {
    val d = docs(1L -> "a b a", 2L -> "a c", 3L -> "b b b")
    val got = Search.keywordTopK(d, Seq("a", "b"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    // df(a)=2, df(b)=2 → w = 1e6 DIV 3 = 333333
    // doc1: (2+1)·w = 999999 matched 2; doc3: 3·w = 999999 matched 1; doc2: w
    assert(got === Array(
      (1L, 999999L, 3L, 2L),
      (3L, 999999L, 3L, 1L),
      (2L, 333333L, 1L, 1L)))
  }

  test("keywordTopK: k truncates after the (score, id) total order") {
    val d = docs(1L -> "a", 2L -> "a", 3L -> "a a")
    val got = Search.keywordTopK(d, Seq("a"), k = 2)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(3L, 1L))
  }

  test("keywordTopK: terms absent from the corpus match nothing") {
    val d = docs(1L -> "a b")
    assert(Search.keywordTopK(d, Seq("zz", "qq")).count() === 0)
  }

  test("keywordTopK is case-insensitive over the text") {
    val d = docs(1L -> "Vector VECTOR vector")
    val got = Search.keywordTopK(d, Seq("vector"))
      .as[(Long, Long, Long, Long)].collect()
    assert(got.length === 1 && got(0)._3 === 3L)
  }

  test("bm25TopK: cleared-to-integer Okapi weights, length-normalized exactly") {
    // avgdl = (2 + 10 + 2) DIV 3 = 4; df(a) = 2 → idf = 1e6 DIV 3 = 333333
    // doc1 (dl 2):  (333333·22·1·4) DIV (10·4 + 3·4 + 9·2)  = 29333304 DIV 70  = 419047
    // doc2 (dl 10): (333333·22·1·4) DIV (10·4 + 3·4 + 9·10) = 29333304 DIV 142 = 206572
    // — same single hit, the shorter doc outranks the longer (the
    // normalization tf×rarity lacks); doc3 matches nothing
    val d = docs(1L -> "a x", 2L -> "a x x x x x x x x x", 3L -> "y z")
    val got = Search.bm25TopK(d, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(got === Array(
      (1L, 419047L, 1L, 1L),
      (2L, 206572L, 1L, 1L)))
  }

  // ---- persisted postings index ------------------------------------

  test("postings index probe equals keywordTopK; compaction leaves it identical") {
    val d = docs(1L -> "a b a", 2L -> "a c", 3L -> "b b b", 4L -> "c c a")
    val dir = java.nio.file.Files.createTempDirectory("postidx").toString
    Search.buildPostingsIndex(d.filter(col("doc_id") <= 2), dir)
    Search.appendToPostingsIndex(d.filter(col("doc_id") > 2), dir)
    val scan = Search.keywordTopK(d, Seq("a", "b"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    val probe = Search.queryPostingsIndex(spark, dir, Seq("a", "b"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(probe === scan)
    assert(graft.ops.Dedup.committedEpochs(dir).size === 2)
    assert(Search.compactPostingsIndex(spark, dir) === 2)
    graft.ops.Dedup.reclaimIndexGarbage(dir)
    assert(graft.ops.Dedup.committedEpochs(dir).size === 1)
    val after = Search.queryPostingsIndex(spark, dir, Seq("a", "b"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(after === scan)
  }

  test("index-fed BM25 equals the scan path; doclen epochs survive compaction") {
    val d = docs(1L -> "a x", 2L -> "a x x x x x x x x x", 3L -> "y z", 4L -> "a y")
    val dir = java.nio.file.Files.createTempDirectory("postidx4").toString
    Search.buildPostingsIndex(d.filter(col("doc_id") <= 2), dir)
    Search.appendToPostingsIndex(d.filter(col("doc_id") > 2), dir)
    val scan = Search.bm25TopK(d, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    val probe = Search.bm25PostingsIndex(spark, dir, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(probe === scan)
    // dl comes from ALL docs' stored lengths (avgdl counts doc 3 even
    // though it matches no term) — a postings-only doclen would skew it
    assert(Search.compactPostingsIndex(spark, dir) === 2)
    graft.ops.Dedup.reclaimIndexGarbage(dir)
    val after = Search.bm25PostingsIndex(spark, dir, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(after === scan)
  }

  test("streaming postings append is redelivery-idempotent per batch id") {
    val d = docs(1L -> "a b", 2L -> "a a c")
    val dir = java.nio.file.Files.createTempDirectory("postidx3").toString
    assert(Search.appendPostingsBatch(d, dir, batchId = 0L))
    val once = Search.queryPostingsIndex(spark, dir, Seq("a"))
      .as[(Long, Long, Long, Long)].collect()
    // an at-least-once redelivery of the SAME micro-batch must not land
    // a second epoch (tf would double and the scores would drift)
    assert(!Search.appendPostingsBatch(d, dir, batchId = 0L))
    assert(graft.ops.Dedup.committedEpochs(dir).size === 1)
    val again = Search.queryPostingsIndex(spark, dir, Seq("a"))
      .as[(Long, Long, Long, Long)].collect()
    assert(again === once)
    // a genuinely new batch lands a new epoch
    assert(Search.appendPostingsBatch(docs(3L -> "a d"), dir, batchId = 1L))
    assert(graft.ops.Dedup.committedEpochs(dir).size === 2)
    assert(Search.queryPostingsIndex(spark, dir, Seq("a")).count() === 3)
    // COMPACTION must not reopen the redelivery window: the merged
    // marker carries the superseded batch tags (transitive closure), so
    // a post-maintenance redelivery is still skipped until reclaim —
    // whose contract requires the stream's redelivery horizon to have
    // passed first
    assert(Search.compactPostingsIndex(spark, dir) === 2)
    assert(!Search.appendPostingsBatch(d, dir, batchId = 0L))
    assert(!Search.appendPostingsBatch(docs(3L -> "a d"), dir, batchId = 1L))
    assert(Search.queryPostingsIndex(spark, dir, Seq("a")).count() === 3)
    // the stream-built index carries doclen + stats per micro-batch, so
    // it serves BM25 too — identical to the scan over the landed docs
    // (doc lengths span both batches, so avgdl mixes epochs' partials)
    val landed = docs(1L -> "a b", 2L -> "a a c", 3L -> "a d")
    val scanBm = Search.bm25TopK(landed, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    val idxBm = Search.bm25PostingsIndex(spark, dir, Seq("a"), k = 10)
      .as[(Long, Long, Long, Long)].collect()
    assert(idxBm === scanBm)
  }

  test("index-fed hybrid equals the scan-fed hybrid exactly") {
    val d = docs(0L -> "nothing here", 1L -> "a a a", 2L -> "a", 3L -> "zz a b")
    val e = emb(0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(1f, 0.1f), 3L -> Array(-1f, 0f))
    val dir = java.nio.file.Files.createTempDirectory("postidx4").toString
    Search.buildPostingsIndex(d, dir)
    val scan = Search.hybridTopK(d, e, Seq("a", "b"), queryVecId = 0L)
      .as[(Long, Long, Long, Long)].collect()
    val indexed = Search.hybridTopKIndexed(spark, dir, e, Seq("a", "b"),
      queryVecId = 0L).as[(Long, Long, Long, Long)].collect()
    assert(indexed === scan)
  }

  test("postings probe pushes the term IN-filter into the parquet scan") {
    val d = docs(1L -> "a b", 2L -> "c d")
    val dir = java.nio.file.Files.createTempDirectory("postidx2").toString
    Search.buildPostingsIndex(d, dir)
    val plan = Search.queryPostingsIndex(spark, dir, Seq("a", "c"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("PushedFilters") && plan.contains("In(term"),
      s"term predicate must reach the postings scan:\n$plan")
  }

  // ---- hybrid RRF fusion -------------------------------------------

  private def emb(rows: (Long, Array[Float])*) =
    rows.toDF("vec_id", "embedding")

  test("hybridTopK fuses the legs with exact integer RRF weights") {
    // q = vec 0 = [1,0]. Vec leg (legK=2): doc0 cos 1.0 → rank 1, doc2
    // cos≈0.995 → rank 2; doc1 (cos 0) and doc3 (cos −1) cut. Lex leg
    // (term "a", df=2 → w=333333): doc1 tf3 → rank 1, doc2 tf1 → rank 2.
    val d = docs(0L -> "nothing here", 1L -> "a a a", 2L -> "a", 3L -> "zz")
    val e = emb(0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(1f, 0.1f), 3L -> Array(-1f, 0f))
    val got = Search.hybridTopK(d, e, Seq("a"), queryVecId = 0L, legK = 2)
      .as[(Long, Long, Long, Long)].collect()
    // weights: rank 1 → 1e6 DIV 61 = 16393; rank 2 → 1e6 DIV 62 = 16129
    assert(got === Array(
      (2L, 32258L, 2L, 2L),   // both legs at rank 2
      (0L, 16393L, 0L, 1L),   // exemplar: vector rank 1, absent lexically
      (1L, 16393L, 1L, 0L)))  // lexical rank 1, cut from the vector leg
    // doc3 is in neither leg and must not appear at all
    assert(!got.map(_._1).contains(3L))
  }

  test("hybridTopKAnn excludes the exemplar and fuses IVF ranks") {
    // only vec 0 is a centroid (every 37th) → one cluster → the IVF leg
    // equals brute minus the exemplar: vec ranks doc2 (cos≈.995), doc1
    // (0), doc3 (−1); lex ranks doc1, doc2. doc0 is in neither leg.
    val d = docs(0L -> "nothing here", 1L -> "a a a", 2L -> "a", 3L -> "zz")
    val e = emb(0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(1f, 0.1f), 3L -> Array(-1f, 0f))
    val got = Search.hybridTopKAnn(d, e, Seq("a"))
      .as[(Long, Long, Long, Long)].collect()
    // w(1)=16393 w(2)=16129 w(3)=15873; docs 1 and 2 tie at 32522 → id order
    assert(got === Array(
      (1L, 32522L, 1L, 2L),
      (2L, 32522L, 2L, 1L),
      (3L, 15873L, 0L, 3L)))
    assert(!got.map(_._1).contains(0L), "the exemplar must be excluded")
  }

  test("hybridTopKBm25 swaps only the lexical leg — length norm flips its ranks") {
    // term "a": doc1 tf=1 in a 2-token doc, doc2 tf=2 in a 20-token doc.
    // tf×rarity ranks doc2 first (2w > 1w); BM25 (avgdl=(2+20+2) DIV 3=8)
    //   doc1: (333333·22·1·8) DIV (10·8+3·8+9·2)  = 58666608 DIV 122 = 480873
    //   doc2: (333333·22·2·8) DIV (10·16·... 10·2·8+3·8+9·20) = 117333216 DIV 364 = 322344
    // ranks doc1 first. Identical vector legs (q = vec 0) — the fused
    // outputs must differ exactly by that lex swap.
    val d = docs(0L -> "nothing here",
      1L -> "a x",
      2L -> "a a x x x x x x x x x x x x x x x x x x")
    val e = emb(0L -> Array(1f, 0f), 1L -> Array(0f, 1f), 2L -> Array(1f, 0.1f))
    val kw = Search.hybridTopK(d, e, Seq("a"), queryVecId = 0L, legK = 2)
      .select("doc_id", "lex_rank").as[(Long, Long)].collect().toMap
    val bm = Search.hybridTopKBm25(d, e, Seq("a"), queryVecId = 0L, legK = 2)
      .select("doc_id", "lex_rank").as[(Long, Long)].collect().toMap
    assert(kw(2L) == 1L && kw(1L) == 2L, s"keyword lex ranks: $kw")
    assert(bm(1L) == 1L && bm(2L) == 2L, s"bm25 lex ranks: $bm")
  }

  test("hybridTopK: k truncates after the (rrf_score, doc_id) total order") {
    val d = docs(0L -> "nothing", 1L -> "a a a", 2L -> "a", 3L -> "zz")
    val e = emb(0L -> Array(1f, 0f), 1L -> Array(0f, 1f),
      2L -> Array(1f, 0.1f), 3L -> Array(-1f, 0f))
    val got = Search.hybridTopK(d, e, Seq("a"), queryVecId = 0L,
      legK = 2, k = 2).as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._1).toSeq === Seq(2L, 0L))
  }

  test("keywordTopK plan: df joins back broadcast; top-k is TakeOrdered") {
    import org.apache.spark.sql.execution.TakeOrderedAndProjectExec
    import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val q = Search.keywordTopK(d, Seq("vector", "stream", "merge"))
    q.collect()
    val nodes = finalNodes(q)
    assert(nodes.exists(_.isInstanceOf[BroadcastExchangeExec]),
      s"df side must broadcast:\n${q.queryExecution.executedPlan}")
    assert(nodes.exists(_.isInstanceOf[TakeOrderedAndProjectExec]),
      s"top-k must plan as TakeOrderedAndProject:\n${q.queryExecution.executedPlan}")
  }

  test("chunk matches an in-memory reference on random corpora") {
    // oracle-independent guard: for seeded random corpora and several
    // (window, stride) shapes, the distributed chunker must equal a
    // straight-line Scala sliding window
    val rnd = new scala.util.Random(42)
    val vocab = Vector("a", "bb", "ccc", "dd", "e")
    val corpus = (1L to 60L).map { id =>
      id -> Seq.fill(rnd.nextInt(12))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    for ((c, s) <- Seq((4, 3), (5, 5), (3, 1), (2, 7))) {
      val got = Chunking.chunk(docs(corpus: _*), chunkTokens = c, stride = s)
        .as[(Long, Long, Long, Long, String)].collect().toSet
      val want = corpus.flatMap { case (id, text) =>
        val t = text.split("\\s+").filter(_.nonEmpty)
        (0 until t.length by s).zipWithIndex.map { case (start, ci) =>
          (id, ci.toLong, start.toLong, math.min(c, t.length - start).toLong,
            t.slice(start, start + c).mkString(" "))
        }
      }.toSet
      assert(got === want, s"chunk($c, $s) diverged from the reference")
    }
  }

  test("keywordTopK matches an in-memory reference on random corpora") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "bb", "ccc", "dd", "e", "ff")
    val corpus = (1L to 80L).map { id =>
      id -> Seq.fill(1 + rnd.nextInt(15))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val terms = Seq("a", "ccc", "ff")
    val got = Search.keywordTopK(docs(corpus: _*), terms, k = 25)
      .as[(Long, Long, Long, Long)].collect().toSeq
    val tf = corpus.map { case (id, text) =>
      id -> terms.map(t => t -> text.split("\\s+").count(_ == t).toLong)
        .filter(_._2 > 0).toMap
    }.filter(_._2.nonEmpty)
    val df_ = terms.map(t => t -> tf.count(_._2.contains(t)).toLong).toMap
    val want = tf.map { case (id, m) =>
      (id, m.map { case (t, f) => f * (1000000L / (df_(t) + 1)) }.sum,
        m.values.sum, m.size.toLong)
    }.sortBy { case (id, score, _, _) => (-score, id) }.take(25)
    assert(got === want)
  }

  test("packChunks matches the single-partition window formulation") {
    // the two-phase prefix sum must equal the window SQL the oracle runs
    // — computed here via Spark's own window over the same canonical
    // order (acceptable at test scale, the exact plan packChunks avoids)
    import org.apache.spark.sql.expressions.Window
    val chunks = Chunking.chunk(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
    val got = Chunking.packChunks(chunks, capacity = 100)
      .select("doc_id", "chunk_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = chunks
      .withColumn("cb", coalesce(sum("chunk_tokens").over(w), lit(0L)))
      .select(col("doc_id"), col("chunk_id"),
        (col("cb") / 100).cast("long").as("seq_id"),
        (col("cb") % 100).as("seq_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
  }

  test("packChunks invariants: offsets advance by tokens, sequences near capacity") {
    val chunks = Chunking.chunk(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
    val packed = Chunking.packChunks(chunks, capacity = 100)
    // every sequence except the last holds ≥ capacity − max_chunk + 1
    // tokens under offset packing (a new sequence starts only once the
    // previous crossed its boundary)
    val per = packed.groupBy("seq_id").agg(sum("chunk_tokens").as("toks"))
      .orderBy("seq_id").as[(Long, Long)].collect()
    val maxChunk = 32
    per.dropRight(1).foreach { case (sid, toks) =>
      assert(toks >= 100 - maxChunk + 1,
        s"sequence $sid underfilled with $toks tokens")
    }
    // offsets are always inside the capacity
    assert(packed.where(col("seq_offset") >= 100 or col("seq_offset") < 0)
      .count() === 0)
    // total token conservation
    val total = chunks.agg(sum("chunk_tokens")).as[Long].head()
    assert(packed.agg(sum("chunk_tokens")).as[Long].head() === total)
  }

  test("packChunks leadCol charges the separator before the row's position (r15)") {
    // EOS packing: one boundary token at each document's first chunk —
    // verify against the window formulation with cost = eos + tokens and
    // the current row's own eos landing before its assignment
    import org.apache.spark.sql.expressions.Window
    val chunks = Chunking.chunk(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
      .withColumn("eos", when(col("chunk_id") === 0, 1L).otherwise(0L))
    val got = Chunking.packChunks(chunks, capacity = 100, leadCol = Some("eos"))
      .select("doc_id", "chunk_id", "seq_id", "seq_offset")
      .as[(Long, Long, Long, Long)].collect().toSet
    val w = Window.orderBy("doc_id", "chunk_id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = chunks
      .withColumn("cb",
        coalesce(sum(col("chunk_tokens") + col("eos")).over(w), lit(0L))
          + col("eos"))
      .select(col("doc_id"), col("chunk_id"),
        (col("cb") / 100).cast("long").as("seq_id"),
        (col("cb") % 100).as("seq_offset"))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got === want && got.nonEmpty)
    // the very first chunk sits at offset 1: the corpus-leading separator
    // occupies offset 0 (the between-documents contract, charged ahead)
    val first = got.minBy { case (d, c, _, _) => (d, c) }
    assert(first._3 == 0L && first._4 == 1L,
      s"first chunk must pack at (seq 0, offset 1), got $first")
    // separators participate in the budget: totals differ from plain
    // packing by exactly the number of documents with ≥ 1 chunk
    val nDocs = chunks.select("doc_id").distinct().count()
    val plain = Chunking.packChunks(chunks, capacity = 100)
      .agg(sum("chunk_tokens")).as[Long].head()
    val eosTotal = chunks.agg(sum(col("chunk_tokens") + col("eos")))
      .as[Long].head()
    assert(eosTotal === plain + nDocs)
  }

  // ---- curated chunk output ----------------------------------------

  test("curateToChunks emits windows for exactly the kept train documents") {
    import graft.ops.Curation
    val planted = Curation.withPlantedDups(
      Tables.load(spark, TestSpark.Sf0001, "documents"))
    // the accounting entry says how many train docs survive; the chunk
    // artifact must cover exactly that many distinct documents, and every
    // one of them chunked (the gate guarantees >= minTokens tokens)
    val trainDocs = Curation.curate(planted)
      .where(col("split") === "train")
      .agg(sum("n_docs")).as[Long].collect().head
    val chunks = Curation.curateToChunks(planted)
    val chunkDocs = chunks.select("doc_id").distinct().count()
    assert(chunkDocs === trainDocs, "chunked docs != surviving train docs")
    // carried metadata is present and every window respects the width
    assert(chunks.where(col("lang").isNull).count() === 0)
    assert(chunks.where(col("chunk_tokens") > 32 or col("chunk_tokens") < 1)
      .count() === 0)
  }

  // ---- stratified sampling -----------------------------------------

  test("stratifiedSample honors per-stratum rates at the boundary values") {
    val d = Seq((1L, "en"), (2L, "en"), (3L, "fr"), (4L, "de"))
      .toDF("doc_id", "lang")
    // en → 0‰ (drop all), everything else 1000‰ (keep all)
    val got = Sampling.stratifiedSample(d, "lang", Map("en" -> 0), 1000)
      .select("doc_id").as[Long].collect().sorted
    assert(got === Array(3L, 4L))
  }

  test("stratifiedSample is deterministic across reruns and repartitioning") {
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val a = Sampling.stratifiedSample(d, "lang", Map("en" -> 250), 900)
      .select("doc_id").as[Long].collect().toSet
    val b = Sampling.stratifiedSample(d.repartition(13), "lang", Map("en" -> 250), 900)
      .select("doc_id").as[Long].collect().toSet
    assert(a === b && a.nonEmpty)
  }

  test("stratifiedSample keep decision is independent of the split assignment") {
    // same id hashed by both buckets: the pair (splitBucket, sampleBucket)
    // must not be degenerate (different multipliers → different buckets
    // for most ids); a correlated pair would bias the sampled train set
    val d = Tables.load(spark, TestSpark.Sf0001, "documents")
    val differing = d.select(
      Sampling.splitBucket("doc_id").as("s"),
      Sampling.sampleBucket("doc_id").as("k"))
      .where(col("s") =!= col("k")).count()
    assert(differing > 0)
  }

  test("repetitionMetrics counts duplicate mass and bigram dominance exactly") {
    import graft.ops.TextAnalysis
    val d = docs(
      1L -> "a b a b a b",  // bigrams: "a b"×3, "b a"×2 → top 3 of 5
      2L -> (0 until 12).map(i => s"t$i").mkString(" "), // 12 distinct
      3L -> "solo",         // one token: no bigrams
      4L -> "")             // empty: zero everything, not repetitive
    val got = TextAnalysis.repetitionMetrics(d)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got === Array(
      // 3·100 > 5·18 → repetitive; dup tokens (6−2)·100 > 6·30 too
      (1L, 6L, 2L, 3L, 5L, true),
      // 1·100 > 11·18 is false (a SHORT distinct doc would flag — 1 of 3
      // bigrams is 33% dominance; length gating is the filter pipeline's
      // job, this op reports the counts)
      (2L, 12L, 12L, 1L, 11L, false),
      // single token: 1·100 > 1·30 is false; no bigrams
      (3L, 1L, 1L, 0L, 0L, false),
      (4L, 0L, 0L, 0L, 0L, false)))
  }

  test("repetitionMetrics boundary: threshold compares are strict") {
    import graft.ops.TextAnalysis
    // exactly 18% top bigram: 100·top == 18·total must NOT flag
    // (50 bigrams, top one 9 times → 9·100 = 50·18)
    val text = ((0 until 9).map(_ => "p q") ++ (0 until 33).map(i => s"u$i"))
      .mkString(" ")
    val n = text.split(" ").length
    val got = TextAnalysis.repetitionMetrics(docs(1L -> text), dupTokenPctMax = 1000)
      .as[(Long, Long, Long, Long, Long, Boolean)].collect()
    assert(got(0)._2 === n.toLong && got(0)._5 === (n - 1).toLong)
    assert(got(0)._4 === 9L, s"top bigram miscounted: ${got(0)}")
    assert((got(0)._4 * 100 > got(0)._5 * 18) === got(0)._6)
  }

  test("tokenBudgetSample equalizes token mass across strata within quantization") {
    import graft.ops.Sampling
    // stratum A has ~4x the token mass of B → A keeps ~25%, B keeps all
    val d = (1L to 200L).map(i => (i, "t " * 20, "A")) ++
      (201L to 250L).map(i => (i, "t " * 20, "B"))
    val df = d.toDF("doc_id", "text", "source")
    val kept = Sampling.tokenBudgetSample(df)
    val mass = kept.groupBy("source").agg(sum("n_tok").as("m"))
      .as[(String, Long)].collect().toMap
    assert(mass("B") === 50L * 20)
    // A's kept mass ≈ B's total: within the per-mille quantization plus
    // hash-bucket variance at 200 docs (binomial σ ≈ 6 docs)
    assert(math.abs(mass("A") - mass("B")) <= 200L,
      s"token mass not equalized: $mass")
    // deterministic under repartitioning
    val again = Sampling.tokenBudgetSample(df.repartition(7))
      .select("doc_id").as[Long].collect().toSet
    assert(again === kept.select("doc_id").as[Long].collect().toSet)
  }

  test("profile computes exact per-column statistics in one scan") {
    import graft.ops.Profile
    import org.apache.spark.sql.execution.FileSourceScanExec
    val d = Seq((1L, "a", Some(1.5)), (2L, "b", None), (3L, "a", Some(-2.0)))
      .toDF("id", "s", "v")
    val got = Profile.profile(d, Seq("id", "s", "v"))
      .as[(String, Long, Long, Long, Long, String, String)].collect()
    assert(got === Array(
      ("id", 3L, 3L, 0L, 3L, "1", "3"),
      ("s", 3L, 3L, 0L, 2L, "a", "b"),
      ("v", 3L, 2L, 1L, 2L, "-2.0", "1.5")))
    // one scan: the profiled parquet table is read exactly once
    val p = Profile.profile(
      Tables.load(spark, TestSpark.Sf0001, "lineitem"),
      Seq("l_orderkey", "l_quantity"))
    p.collect()
    val scans = finalNodes(p).collect { case s: FileSourceScanExec => s }
    assert(scans.size === 1,
      s"profile must scan once, found ${scans.size}:\n${p.queryExecution.executedPlan}")
  }

  test("stratifiedSample rejects out-of-range rates") {
    val d = docs(1L -> "x").withColumn("lang", lit("en"))
    intercept[IllegalArgumentException] {
      Sampling.stratifiedSample(d, "lang", Map("en" -> 1001), 900)
    }
  }

  test("snapshot drift: integer shares, vanished/appeared strata coalesce to zero") {
    import spark.implicits._
    val before = Seq("en", "en", "en", "de").toDF("lang")
    val after = Seq("en", "de", "de", "fr").toDF("lang")
    val got = graft.ops.Profile.snapshotDrift(before, after, "lang")
      .as[(String, Long, Long, Long, Long, Long)].collect().toSeq
    assert(got == Seq(
      ("de", 1L, 2L, 250L, 500L, 250L),
      ("en", 3L, 1L, 750L, 250L, 500L),
      ("fr", 0L, 1L, 0L, 250L, 250L)))
  }

  test("discrete quantiles: integer rank threshold, nulls excluded, duplicates weighted") {
    import spark.implicits._
    val df = Seq[(java.lang.Long, java.lang.Double)](
      (1L, 1.0), (2L, 1.0), (3L, 2.0), (4L, null), (5L, 3.0))
      .toDF("id", "x")
    val got = graft.ops.Profile.quantiles(df, Seq("x"), Seq(500, 750, 1000))
      .as[(String, Long, Double)].collect().toSeq
    // non-null values [1, 1, 2, 3], total 4:
    //   p=500  -> cum >= 2   -> 1.0 (duplicates weight the cumulative)
    //   p=750  -> cum >= 3   -> 2.0
    //   p=1000 -> cum >= 4   -> 3.0 (max)
    assert(got == Seq(("x", 500L, 1.0), ("x", 750L, 2.0), ("x", 1000L, 3.0)))
    // 1..10 distinct: the classic check incl. a fractional threshold
    val d10 = (1 to 10).map(_.toDouble).toDF("x")
    val q10 = graft.ops.Profile.quantiles(d10, Seq("x"), Seq(500, 900, 990))
      .as[(String, Long, Double)].collect().toSeq
    assert(q10 == Seq(("x", 500L, 5.0), ("x", 900L, 9.0), ("x", 990L, 10.0)))
  }

  test("shardSequences matches the window formulation, dense positions per shard") {
    import spark.implicits._
    val seqs = (0L until 200L).toDF("seq_id")
    val got = Chunking.shardSequences(seqs, nShards = 4)
      .select("seq_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("shard").orderBy("okey", "seq_id")
    val want = seqs
      .withColumn("shard", pmod((col("seq_id") % 1000003L) * 3266489917L, lit(4L)))
      .withColumn("okey", pmod((col("seq_id") % 1000003L) * 668265263L, lit(1000003L)))
      .withColumn("shard_pos", row_number().over(w).cast("long") - 1L)
      .select("seq_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == want)
    // every shard's positions are exactly 0..n-1 (the streaming counter
    // reset at shard boundaries, not a per-partition counter)
    got.groupBy(_._2).foreach { case (sh, rows) =>
      assert(rows.map(_._3) == (0L until rows.size).toSet,
        s"shard $sh positions not dense: ${rows.map(_._3).toSeq.sorted}")
    }
    // order/partitioning of the input is irrelevant
    val re = Chunking.shardSequences(seqs.repartition(7), nShards = 4)
      .select("seq_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect().toSet
    assert(re == got)
  }
}
