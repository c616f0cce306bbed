package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-12 10× stress of the passage-level span ops — measured, not
  * argued (the Round11StressSpec pattern): 10 disjoint isomorphic copies
  * of the planted corpus (every token of copy i suffixed `xi`, so copies
  * share NO shingle while each copy's repeat geometry is identical to
  * the base) must grow span accounting and strip output EXACTLY 10× and
  * shuffle volume ~10× — a cross-copy collision or a quadratic flagged
  * blowup shows up as a large multiple instead. Fixtures are
  * builder-derived; /root/testdata is never written. */
class Round12StressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private def planted: DataFrame = graft.ops.Dedup.withPlantedNearDups(
    Tables.load(spark, "/root/testdata/sf0.01", "documents"))

  private def copyI(i: Int): DataFrame = planted.select(
    (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
    regexp_replace(col("text"), "(\\S+)", "$1x" + i).as("text"))

  test("span dedup: 10 disjoint isomorphic copies -> exactly 10x spans, ~10x shuffle") {
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    var rows1 = 0L; var mass1 = 0L
    val sh1 = PlanAudit.measureShuffle(spark) {
      val r = graft.ops.Dedup.duplicatedSpans(copyI(0))
        .agg(count(lit(1)), sum("dup_tokens")).collect().head
      rows1 = r.getLong(0); mass1 = r.getLong(1)
    }
    var rows10 = 0L; var mass10 = 0L
    val sh10 = PlanAudit.measureShuffle(spark) {
      val r = graft.ops.Dedup.duplicatedSpans(tenX)
        .agg(count(lit(1)), sum("dup_tokens")).collect().head
      rows10 = r.getLong(0); mass10 = r.getLong(1)
    }
    info(s"flagged docs: 1x=$rows1 10x=$rows10; dup tokens: 1x=$mass1 " +
      f"10x=$mass10; shuffle rows: 1x=$sh1 10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f")
    assert(rows1 >= 1000, s"planted prefix copies not flagged at 1x: $rows1")
    assert(rows10 == 10 * rows1 && mass10 == 10 * mass1,
      s"span accounting must grow exactly 10x: ($rows1,$mass1) -> ($rows10,$mass10)")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — super-linear flagging")
  }

  test("novelty: 10 disjoint isomorphic copies -> exactly 10x unique mass, ~10x shuffle") {
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    def run(docs: DataFrame): (Long, Long, Long, Long) = {
      var rows = 0L; var uniq = 0L; var shing = 0L
      val sh = PlanAudit.measureShuffle(spark) {
        val r = graft.ops.TextAnalysis.noveltyMetrics(docs)
          .agg(count(lit(1)), sum("n_unique"), sum("n_shingles")).collect().head
        rows = r.getLong(0); uniq = r.getLong(1); shing = r.getLong(2)
      }
      (rows, uniq, shing, sh)
    }
    val (r1, u1, s1, sh1) = run(copyI(0))
    val (r10, u10, s10, sh10) = run(tenX)
    info(f"docs: 1x=$r1 10x=$r10; unique: 1x=$u1 10x=$u10; " +
      f"shuffle: 1x=$sh1 10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f")
    // disjoint vocabularies -> each copy's novelty is computed against
    // itself only; the union must scale every aggregate exactly 10x
    assert(r10 == 10 * r1 && u10 == 10 * u1 && s10 == 10 * s1,
      s"novelty mass must grow exactly 10x: ($r1,$u1,$s1) -> ($r10,$u10,$s10)")
    assert(u1 > 0, "planted corpus should retain some unique shingles")
    assert(u1 < s1, "planted prefix copies should kill some uniqueness")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — super-linear df join")
  }

  test("postings index: 10x id-shifted corpus -> ~10x build shuffle, 10x postings, probe stays k") {
    // exact duplication (id-shifted copies keep the TOKENS identical so
    // the corpus query terms still match) — postings rows and build
    // shuffle must grow linearly, and the probe output stays k
    val base = planted.select(col("doc_id"), col("text"))
    def copies(n: Int) = (0 until n).map(i => base.select(
      (col("doc_id") + lit(i * 100000000L)).as("doc_id"), col("text")))
      .reduce(_ unionByName _)
    def buildAndCount(docs: org.apache.spark.sql.DataFrame): (Long, Long, Long) = {
      val dir = java.nio.file.Files.createTempDirectory("postidx10x").toString
      var rows = 0L
      val sh = PlanAudit.measureShuffle(spark) {
        graft.ops.Search.buildPostingsIndex(docs, dir)
        rows = spark.read.parquet(s"$dir/postings/ep_*").count()
      }
      val probeRows = graft.ops.Search.queryPostingsIndex(spark, dir,
        Seq("vector", "stream", "merge", "window", "filter")).count()
      (sh, rows, probeRows)
    }
    val (sh1, rows1, k1) = buildAndCount(copies(1))
    val (sh10, rows10, k10) = buildAndCount(copies(10))
    info(s"postings rows: 1x=$rows1 10x=$rows10; build shuffle: 1x=$sh1 " +
      f"10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f; probe rows: $k1/$k10")
    assert(rows10 == 10 * rows1, s"postings must grow exactly 10x: $rows1 -> $rows10")
    assert(k1 == 20 && k10 == 20, "the probe output must stay k")
    assert(sh10.toDouble / sh1 <= 13.0,
      f"build shuffle grew ${sh10.toDouble / sh1}%.1fx at 10x data")
  }

  test("canonical groups: 10 disjoint chain corpora -> exactly 10x groups, ~10x shuffle") {
    // the dedup_canonical construction (3-member truncation chains with
    // chain pairs) replicated as id-disjoint copies: groups never cross
    // copies by construction, so output rows and keep counts must grow
    // EXACTLY 10x while the policy shuffle (member labels + quality
    // structs + argmax) stays edge-linear
    val base = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select("doc_id", "text")
    def corpus(i: Int): (DataFrame, DataFrame) = {
      val b = base.select((col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        col("text"))
      def truncated(frac: String, off: Long) = b.select(
        (col("doc_id") + off).as("doc_id"),
        expr(s"substring(text, 1, greatest(cast(length(text) * $frac as int), 1))")
          .as("text"))
      val docs = b.unionByName(truncated("0.9", 1000000L))
        .unionByName(truncated("0.8", 2000000L))
      val pairs = b
        .select(col("doc_id").as("doc_a"), (col("doc_id") + 1000000L).as("doc_b"))
        .unionByName(b.select((col("doc_id") + 1000000L).as("doc_a"),
          (col("doc_id") + 2000000L).as("doc_b")))
      (docs, pairs)
    }
    def run(n: Int): (Long, Long, Long) = {
      val (docs, pairs) = (0 until n).map(corpus)
        .reduce((a, b) => (a._1 unionByName b._1, a._2 unionByName b._2))
      var rows = 0L; var keeps = 0L
      val sh = PlanAudit.measureShuffle(spark) {
        val r = graft.ops.Dedup.keepBestPerGroup(docs, pairs)
          .agg(count(lit(1)), sum(when(col("is_keep"), 1L).otherwise(0L)))
          .collect().head
        rows = r.getLong(0); keeps = r.getLong(1)
      }
      (rows, keeps, sh)
    }
    val (rows1, keeps1, sh1) = run(1)
    val (rows10, keeps10, sh10) = run(10)
    info(s"rows: 1x=$rows1 10x=$rows10; keeps: 1x=$keeps1 10x=$keeps10; " +
      f"shuffle rows: 1x=$sh1 10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f")
    assert(rows1 == 3 * 500 && keeps1 == 500,
      s"1x: expected 1500 rows / 500 keeps, got $rows1 / $keeps1")
    assert(rows10 == 10 * rows1 && keeps10 == 10 * keeps1,
      s"groups must grow exactly 10x: ($rows1,$keeps1) -> ($rows10,$keeps10)")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — super-linear grouping")
  }

  test("span strip: 10 disjoint isomorphic copies -> exactly 10x kept/removed mass") {
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    def massOf(docs: DataFrame): (Long, Long) = {
      val r = graft.ops.Dedup.stripDuplicatedSpans(docs)
        .agg(sum("kept_tokens"), sum("total_tokens")).collect().head
      (r.getLong(0), r.getLong(1))
    }
    val (kept1, tot1) = massOf(copyI(0))
    val (kept10, tot10) = massOf(tenX)
    info(s"kept/total tokens: 1x=$kept1/$tot1 10x=$kept10/$tot10")
    assert(kept1 < tot1, "the planted copies must lose tokens at 1x")
    assert(kept10 == 10 * kept1 && tot10 == 10 * tot1,
      s"strip mass must grow exactly 10x: ($kept1,$tot1) -> ($kept10,$tot10)")
  }

  test("semantic dedup: 10x synthetic twin corpus -> exactly 10x drops, ~linear shuffle") {
    // deterministic ±1 vectors (quantize to ±127, so a 1.02-scaled twin is
    // quantization-IDENTICAL to its base: same cluster by construction,
    // cosine exactly 1); base-base cosine >= 0.9 needs 61 of 64 random
    // dims to agree (~2e-15/pair) — drops therefore equal the twin count
    def corpus(n: Long): DataFrame = {
      val base = spark.range(1, n + 1).select(col("id").as("vec_id"),
        expr("transform(sequence(0, 63), d -> cast(if(pmod(hash(id * 64 + d), 2) = 0, -1.0, 1.0) as float))")
          .as("embedding"))
      base.unionByName(base.select((col("vec_id") + 10000000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x * 1.02 as float))").as("embedding")))
    }
    def run(n: Long): (Long, Long) = {
      var drops = 0L
      val sh = PlanAudit.measureShuffle(spark) {
        drops = graft.ops.Similarity.semDedup(corpus(n))
          .filter(!col("kept")).count()
      }
      (drops, sh)
    }
    val (d1, sh1) = run(500)
    val (d10, sh10) = run(5000)
    info(f"drops: 1x=$d1 10x=$d10; shuffle rows: 1x=$sh1 10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f")
    assert(d1 == 500L && d10 == 5000L,
      s"every twin (and nothing else) must drop: got $d1 / $d10")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — the cluster bound is not scaling (k should grow with n)")
  }

  test("fluency: 10x corpus -> 10x scored rows, model-build shuffle bounded by buckets x partitions") {
    // the LM build's shuffle carries partial-aggregate rows — at most
    // (UniBuckets + BiBuckets) per PARTITION, never the token stream:
    // with a 10x-partition union the row bound scales with partitions,
    // so the assertable invariants are (a) <= buckets x partitions and
    // (b) a small fraction of the corpus's tokens. Scoring itself is
    // literal-array map-side (zero-exchange, FluencySpec).
    def corpus(n: Int): DataFrame = (0 until n).map(copyI).reduce(_ unionByName _)
    def run(n: Int): (Long, Long, Long, Int) = {
      val c = corpus(n)
      val parts = c.rdd.getNumPartitions
      val toks = c.select(org.apache.spark.sql.functions.expr(
        "sum(size(split(text, '\\\\s+')))")).collect().head.getLong(0)
      val dir = java.nio.file.Files.createTempDirectory("lmstress").toString + "/m"
      val sh = PlanAudit.measureShuffle(spark) {
        graft.ops.Fluency.buildLmModel(c, dir)
      }
      (graft.ops.Fluency.scoreWithLm(c, dir).count(), sh, toks, parts)
    }
    val (r1, sh1, tok1, p1) = run(1)
    val (r10, sh10, tok10, p10) = run(10)
    info(f"scored rows: 1x=$r1 10x=$r10; build shuffle: 1x=$sh1 ($p1 parts, $tok1 toks) " +
      f"10x=$sh10 ($p10 parts, $tok10 toks, ${100.0 * sh10 / tok10}%.1f%% of tokens)")
    assert(r10 == 10 * r1, s"scored rows must grow exactly 10x: $r1 -> $r10")
    val bound10 = p10.toLong * (graft.ops.Fluency.UniBuckets + graft.ops.Fluency.BiBuckets)
    assert(sh10 <= bound10, s"shuffle $sh10 exceeds buckets x partitions bound $bound10")
    assert(sh10 * 10 <= tok10,
      f"model-build shuffled ${100.0 * sh10 / tok10}%.1f%% of the token stream — partial aggregation lost")
  }
}
