package graft

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Round-11 10× stress of the round-10 additions (r10 verdict task 2):
  * the PPJoin candidate pipeline, the curation pipeline, and the binary
  * COPY encoder — measured, not argued. Each test compares a 1× run
  * against a 10× fixture built from the same base corpus and asserts the
  * growth is linear (shuffle-row and output ratios ≈ 10×, never the
  * ~100× a quadratic stage would show). Fixtures are builder-derived
  * (shifted-id copies — /root/testdata itself is never written), matching
  * the r7 StressGuardsSpec pattern. */
class Round11StressSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private def baseDocs: DataFrame =
    Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("doc_id"), col("text"), col("lang"))

  test("PPJoin n-gram Jaccard: 10 disjoint isomorphic copies -> exactly 10x pairs, ~10x shuffle") {
    // Every token of copy i gets suffix `xi`, so the copies' shingle sets
    // are pairwise disjoint while each copy's document-frequency profile
    // is IDENTICAL to the base (isomorphic under token renaming). The
    // prefix/positional/length filters therefore see the same geometry
    // per copy, and candidates + verified pairs must grow EXACTLY 10x —
    // any cross-copy candidate or super-linear index blowup is a bug.
    val planted = graft.ops.Dedup.withPlantedNearDups(
      Tables.load(spark, "/root/testdata/sf0.01", "documents"))
    def copyI(i: Int): DataFrame = planted.select(
      (col("doc_id") + lit(i * 100000000L)).as("doc_id"),
      regexp_replace(col("text"), "(\\S+)", "$1x" + i).as("text"),
      col("lang"))
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)

    var pairs1 = 0L
    val sh1 = PlanAudit.measureShuffle(spark) {
      pairs1 = graft.ops.Dedup.ngramJaccardPairs(copyI(0)).count()
    }
    var pairs10 = 0L
    val sh10 = PlanAudit.measureShuffle(spark) {
      pairs10 = graft.ops.Dedup.ngramJaccardPairs(tenX).count()
    }
    info(s"pairs: 1x=$pairs1 10x=$pairs10; shuffle rows: 1x=$sh1 10x=$sh10 " +
      f"ratio=${sh10.toDouble / sh1}%.2f")
    assert(pairs1 >= 500, s"planted near-dups not found at 1x: $pairs1")
    assert(pairs10 == 10 * pairs1,
      s"pairs must grow exactly 10x (disjoint isomorphic copies): $pairs1 -> $pairs10")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — super-linear candidate generation")
  }

  test("curation pipeline: 10x exact-duplicated corpus -> same curated set, ~10x shuffle") {
    // The crawl-duplication shape: ten id-shifted EXACT copies of every
    // document. The quality gate passes 10x rows, the content-hash
    // dedup collapses each text to one keeper (keep-first = globally
    // minimal doc_id, which lives in copy 0), and the near-dup stage
    // then works on a 1x-sized kept set — so output rows must match the
    // 1x run and shuffle volume must grow ~10x (the gate+hash stages),
    // never ~100x.
    def tenXdocs = (0 until 10).map(i => baseDocs.select(
      (col("doc_id") + lit(i * 10000000L)).as("doc_id"),
      col("text"), col("lang"))).reduce(_ unionByName _)
    def run(docs: DataFrame): (Array[Row], Long) = {
      var out: Array[Row] = Array.empty
      val sh = PlanAudit.measureShuffle(spark) {
        out = graft.ops.Curation.curate(
          graft.ops.Curation.withPlantedDups(docs)).collect()
      }
      graft.ops.Curation.releaseCache()
      (out, sh)
    }
    val (out1, sh1) = run(baseDocs)
    val (out10, sh10) = run(tenXdocs)
    info(s"accounting rows: 1x=${out1.length} 10x=${out10.length}; " +
      f"shuffle rows: 1x=$sh1 10x=$sh10 ratio=${sh10.toDouble / sh1}%.2f")
    // same (lang, split) partitions and the same KEPT doc counts: every
    // extra copy is removed by the exact stage, nothing new survives
    def keptCounts(rows: Array[Row]) =
      rows.map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    assert(keptCounts(out10) == keptCounts(out1),
      "curated keep-set changed under 10x exact duplication")
    val ratio = sh10.toDouble / sh1
    assert(ratio <= 13.0,
      f"shuffle volume grew $ratio%.1fx at 10x data — super-linear curation stage")
  }

  test("binary COPY encoder: 10x rows stream at constant per-row cost, executor-side") {
    // The write channel's hot path: PgCopyEncoder.write consumes a row
    // iterator per PARTITION on the executor, streaming framed wire bytes
    // — nothing accumulates per row anywhere. Encode sf0.01 lineitem
    // (60k rows) and sf0.1 (600k; the true 10x) into counting sinks and
    // assert per-row wire bytes are identical (same schema, same value
    // distribution) — i.e. cost is exactly linear in rows.
    val df1 = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    assert(graft.sources.PgCopyEncoder.supports(df1.schema),
      s"lineitem schema not wire-encodable: ${df1.schema.simpleString}")
    val (rows1, bytes1) = Round11StressSpec.countWireBytes(df1)
    val (rows10, bytes10) = Round11StressSpec.countWireBytes(
      Tables.load(spark, "/root/testdata/sf0.1", "lineitem"))
    info(f"1x: $rows1 rows, $bytes1 bytes (${bytes1.toDouble / rows1}%.1f B/row); " +
      f"10x: $rows10 rows, $bytes10 bytes (${bytes10.toDouble / rows10}%.1f B/row)")
    assert(rows10 == 10 * rows1, s"fixture rows: $rows1 vs $rows10")
    val perRow1 = bytes1.toDouble / rows1
    val perRow10 = bytes10.toDouble / rows10
    // identical schema + generator -> per-row wire size within 5%
    assert(math.abs(perRow10 - perRow1) / perRow1 < 0.05,
      f"per-row wire bytes drifted: $perRow1%.2f -> $perRow10%.2f")
  }

  test("chunking: 10x id-shifted corpus -> exactly 10x chunks, still zero shuffle") {
    // chunking is per-document, so ten id-shifted exact copies must emit
    // exactly ten times the windows — and the plan must stay shuffle-free
    // at any scale (the whole op is a map-side explode)
    def copyI(i: Int): DataFrame = baseDocs.select(
      (col("doc_id") + lit(i * 100000000L)).as("doc_id"), col("text"))
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    // shuffle is measured over a full noop-sink materialization: a count()
    // would charge the chunker for count's own partial-agg exchange
    val sh1 = PlanAudit.measureShuffle(spark) {
      graft.ops.Chunking.chunk(copyI(0))
        .write.format("noop").mode("overwrite").save()
    }
    val sh10 = PlanAudit.measureShuffle(spark) {
      graft.ops.Chunking.chunk(tenX)
        .write.format("noop").mode("overwrite").save()
    }
    val chunks1 = graft.ops.Chunking.chunk(copyI(0)).count()
    val chunks10 = graft.ops.Chunking.chunk(tenX).count()
    info(s"chunks: 1x=$chunks1 10x=$chunks10; shuffle rows: 1x=$sh1 10x=$sh10")
    assert(chunks1 > 0 && chunks10 == 10 * chunks1,
      s"chunk output must grow exactly 10x: $chunks1 -> $chunks10")
    assert(sh1 == 0 && sh10 == 0,
      s"chunking shuffled rows ($sh1 / $sh10) — the map-side-only plan regressed")
  }

  test("repetition metrics: 10x id-shifted corpus -> exactly 10x rows, ~10x gram shuffle") {
    // metrics are per-document, so id-shifted exact copies must yield
    // identical per-copy results; the only shuffle is the (doc, gram)
    // partial+final count — linear in the token stream
    def copyI(i: Int): DataFrame = baseDocs.select(
      (col("doc_id") + lit(i * 100000000L)).as("doc_id"), col("text"))
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    val sh1 = PlanAudit.measureShuffle(spark) {
      graft.ops.TextAnalysis.repetitionMetrics(copyI(0))
        .write.format("noop").mode("overwrite").save()
    }
    val sh10 = PlanAudit.measureShuffle(spark) {
      graft.ops.TextAnalysis.repetitionMetrics(tenX)
        .write.format("noop").mode("overwrite").save()
    }
    val rows1 = graft.ops.TextAnalysis.repetitionMetrics(copyI(0)).count()
    val rows10 = graft.ops.TextAnalysis.repetitionMetrics(tenX).count()
    val ratio = sh10.toDouble / sh1
    info(f"rows: 1x=$rows1 10x=$rows10; shuffle rows: 1x=$sh1 10x=$sh10 ratio=$ratio%.2f")
    assert(rows10 == 10 * rows1, s"per-doc metrics must grow exactly 10x: $rows1 -> $rows10")
    assert(ratio <= 13.0,
      f"repetition shuffle grew $ratio%.1fx at 10x data — gram counting went super-linear")
  }

  test("table profile: shuffle carries per-partition distincts, a fraction of the row stream") {
    // the profile shuffle carries each partition's DISTINCT (column,
    // value) combos — duplicated partitions each re-ship their own
    // distinct set (ratio tracks partition count, i.e. linear), but the
    // volume must stay a small fraction of the exploded row stream
    // (cols × rows) at every scale, or partial aggregation stopped
    // collapsing repeats
    val cols = Seq("l_orderkey", "l_quantity", "l_returnflag", "l_shipdate")
    val base = Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
    val tenX = (0 until 10).map(_ => base).reduce(_ unionByName _)
    val rows1 = base.count()
    val sh1 = PlanAudit.measureShuffle(spark) {
      graft.ops.Profile.profile(base, cols)
        .write.format("noop").mode("overwrite").save()
    }
    val sh10 = PlanAudit.measureShuffle(spark) {
      graft.ops.Profile.profile(tenX, cols)
        .write.format("noop").mode("overwrite").save()
    }
    val outRows = graft.ops.Profile.profile(tenX, cols).count()
    val ratio = sh10.toDouble / sh1
    info(f"shuffle rows: 1x=$sh1 10x=$sh10 ratio=$ratio%.2f " +
      f"(exploded stream 10x = ${10 * rows1 * cols.size})")
    assert(outRows === cols.size.toLong)
    assert(ratio <= 13.0, f"profile shuffle grew $ratio%.1fx — super-linear")
    assert(sh10 <= (10 * rows1 * cols.size) / 5,
      s"shuffle $sh10 is not a small fraction of the exploded stream — " +
        "map-side partial aggregation stopped collapsing repeats")
  }

  test("token-budget sampling: shuffle is partials x strata, never document rows") {
    // the only exchanges carry per-partition per-stratum partial totals
    // and the scalar min — bounded by partitions × |strata|, independent
    // of how many documents each partition holds
    def copyI(i: Int): DataFrame = Tables.load(
      spark, "/root/testdata/sf0.01", "documents")
      .select((col("doc_id") + lit(i * 100000000L)).as("doc_id"),
        col("text"), col("source"))
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    val docs10 = tenX.count()
    val parts10 = tenX.rdd.getNumPartitions.toLong
    val sh1 = PlanAudit.measureShuffle(spark) {
      graft.ops.Sampling.tokenBudgetSample(copyI(0))
        .write.format("noop").mode("overwrite").save()
    }
    val sh10 = PlanAudit.measureShuffle(spark) {
      graft.ops.Sampling.tokenBudgetSample(tenX)
        .write.format("noop").mode("overwrite").save()
    }
    info(s"shuffle rows: 1x=$sh1 10x=$sh10 (docs=$docs10, partitions=$parts10)")
    // measured ~41 partial/agg rows per input partition (strata partials
    // across the two aggregates) — the bound is per-PARTITION, with slack
    assert(sh10 <= parts10 * 60 + 100,
      s"token-budget shuffle $sh10 exceeds the per-partition partials bound")
    assert(sh10 < docs10 / 10,
      s"token-budget shuffle $sh10 tracks document rows ($docs10) — keep filter not map-side")
  }

  test("keyword search: 10x corpus -> ~10x postings shuffle, output stays k") {
    // the exploded token stream is filtered to query-term postings before
    // any exchange, so shuffle volume tracks matching postings (linear),
    // and the result is always the k-row top slice
    def copyI(i: Int): DataFrame = baseDocs.select(
      (col("doc_id") + lit(i * 100000000L)).as("doc_id"), col("text"))
    val terms = Seq("vector", "stream", "merge", "window", "filter")
    val tenX = (0 until 10).map(copyI).reduce(_ unionByName _)
    var rows1 = 0L
    val sh1 = PlanAudit.measureShuffle(spark) {
      rows1 = graft.ops.Search.keywordTopK(copyI(0), terms).count()
    }
    var rows10 = 0L
    val sh10 = PlanAudit.measureShuffle(spark) {
      rows10 = graft.ops.Search.keywordTopK(tenX, terms).count()
    }
    val ratio = sh10.toDouble / sh1
    info(f"shuffle rows: 1x=$sh1 10x=$sh10 ratio=$ratio%.2f")
    assert(rows1 == 20 && rows10 == 20, s"top-k must stay k rows: $rows1 / $rows10")
    assert(ratio <= 13.0,
      f"search shuffle grew $ratio%.1fx at 10x data — postings filter not map-side")
  }

  test("incremental dedup: suspects-only anti-join, bypass rows never reach an exchange") {
    // Ten crawl batches against ONE snapshot: each batch re-crawls every
    // third snapshot doc verbatim (a dup to drop) and brings the rest as
    // genuinely-new text (distinct suffix per batch). The bloom bypass
    // means the confirm anti-join's left side carries only the suspects
    // (re-crawls + fp sliver), so against the plain anti-join — whose
    // left side is the WHOLE batch — the incremental plan must shuffle
    // strictly less at any scale, and grow ~linearly batch-to-10-batches.
    val snap = baseDocs.select("doc_id", "text")
    def batchI(i: Int): DataFrame = {
      val off = (i + 1) * 100000000L
      val recrawl = snap.filter(col("doc_id") % 3 === 0)
        .select((col("doc_id") + off).as("doc_id"), col("text"))
      val fresh = snap.filter(col("doc_id") % 3 =!= 0)
        .select((col("doc_id") + off + 50000000L).as("doc_id"),
          concat(col("text"), lit(s" fresh-$i")).as("text"))
      recrawl.unionByName(fresh)
    }
    val b1 = batchI(0)
    val b10 = (0 until 10).map(batchI).reduce(_ unionByName _)
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      var n1 = 0L; var n10 = 0L; var nPlain = 0L
      val sh1 = PlanAudit.measureShuffle(spark) {
        n1 = graft.ops.Dedup.incremental(b1, snap).count()
      }
      val sh10 = PlanAudit.measureShuffle(spark) {
        n10 = graft.ops.Dedup.incremental(b10, snap).count()
      }
      val shPlain = PlanAudit.measureShuffle(spark) {
        nPlain = b10.join(snap.select("text"), Seq("text"), "left_anti").count()
      }
      val ratio = sh10.toDouble / sh1
      info(f"kept: 1x=$n1 10x=$n10; shuffle rows: 1x=$sh1 10x=$sh10 " +
        f"ratio=$ratio%.2f; plain anti-join 10x=$shPlain")
      assert(n10 == 10 * n1, s"each batch's fresh rows must survive: $n1 -> $n10")
      assert(n10 == nPlain, "bloom+confirm must equal the plain anti-join")
      assert(ratio <= 13.0,
        f"incremental shuffle grew $ratio%.1fx at 10x batches — bypass lost")
      assert(sh10 < shPlain,
        s"suspects-only left side ($sh10) must shuffle less than the full batch ($shPlain)")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("minhash index probe: 10x probe batches -> exactly 10x hits, probe-side-linear shuffle") {
    // One stored index, ten identical-modulo-id probe batches (the planted
    // 90%-prefix perturbation, so every batch doc near-matches its source).
    // The index side is fixed; only the probe side grows — hits and
    // shuffle must scale with the PROBE, not the index.
    val snap = baseDocs.select("doc_id", "text")
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_stress").toString
    graft.ops.Dedup.buildMinhashIndex(snap, dir)
    def probeI(i: Int): DataFrame = snap.select(
      (col("doc_id") + lit((i + 1) * 100000000L)).as("doc_id"),
      expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))").as("text"))
    var h1 = 0L; var h10 = 0L
    val sh1 = PlanAudit.measureShuffle(spark) {
      h1 = graft.ops.Dedup.probeMinhashIndex(probeI(0), dir).count()
    }
    val p10 = (0 until 10).map(probeI).reduce(_ unionByName _)
    val sh10 = PlanAudit.measureShuffle(spark) {
      h10 = graft.ops.Dedup.probeMinhashIndex(p10, dir).count()
    }
    val ratio = sh10.toDouble / sh1
    info(f"hits: 1x=$h1 10x=$h10; shuffle rows: 1x=$sh1 10x=$sh10 ratio=$ratio%.2f")
    assert(h1 >= 400, s"planted perturbations must match their sources: $h1")
    assert(h10 == 10 * h1,
      s"identical-modulo-id batches must hit exactly 10x: $h1 -> $h10")
    assert(ratio <= 13.0,
      f"probe shuffle grew $ratio%.1fx at 10x probes — index side leaked into the shuffle")
  }
}

/** Closure home for the executor-side encode (a suite-member lambda would
  * drag the non-serializable ScalaTest engine into the task). */
object Round11StressSpec {
  def countWireBytes(df: DataFrame): (Long, Long) = {
    val schema = df.schema
    val counts = df.rdd.mapPartitions { it =>
      val counting = new java.io.OutputStream {
        var n = 0L
        override def write(b: Int): Unit = n += 1
        override def write(b: Array[Byte], off: Int, len: Int): Unit = n += len
      }
      var rows = 0L
      val counted = it.map { r => rows += 1; r }
      graft.sources.PgCopyEncoder.write(counted, schema, counting)
      Iterator.single((rows, counting.n))
    }.collect()
    (counts.map(_._1).sum, counts.map(_._2).sum)
  }
}
