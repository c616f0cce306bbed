package graft

import graft.ops.Dedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Maintenance + durability contracts of the persisted incremental
  * indexes (round-11 verdict task 5 and advisories 1/3/4):
  *
  *  - epoch compaction: probe results are IDENTICAL before/after, the
  *    epoch count drops to 1, and the parquet file count shrinks — the
  *    small-file accrual of a daily-crawl append loop is reclaimable
  *    without a rebuild.
  *  - crash consistency: an append that dies between its two table
  *    writes (simulated by omitting the commit marker) is INVISIBLE to
  *    probes — no sigs-without-bands silent-miss state — and the retried
  *    append does not double-count.
  *  - atomic staging: two racing ensure-builders publish exactly one
  *    complete index; a reader never sees a half-written dir.
  *  - threshold knife edge: the planted incr-embedding fixture has no
  *    candidate pair whose cosine straddles the 0.9 threshold between
  *    float32 (engine) and float64 (DuckDB oracle) arithmetic.
  */
class IndexMaintenanceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def corpus(n: Int) = {
    val words = Vector("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (1 to n).map { i =>
      val rnd = new scala.util.Random(i * 7919L)
      i.toLong -> Seq.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
    }.toDF("doc_id", "text")
  }

  private def parquetFiles(dir: String): Seq[String] =
    java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).toArray
      .map(_.toString).toSeq.filter(_.endsWith(".parquet"))

  test("minhash compaction: identical probe results, one epoch, fewer files") {
    val snap = corpus(30)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_compact").toString
    Dedup.buildMinhashIndex(snap, dir)
    // five daily crawls, each appending two accepted docs
    (0 until 5).foreach { day =>
      val base = 5000L + day * 10
      val accepted = Seq(
        base -> s"quux corge grault garply waldo fred plugh day$day alpha beta gamma delta",
        base + 1 -> s"lorem ipsum dolor sit amet consectetur day$day epsilon zeta eta theta")
        .toDF("doc_id", "text")
      Dedup.appendToMinhashIndex(accepted, dir)
    }
    assert(Dedup.committedEpochs(dir).size == 6)
    val probe = corpus(30).filter(col("doc_id") % 3 === 0).select(
      (col("doc_id") + 9000L).as("doc_id"),
      expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))").as("text"))
      .unionAll(Seq(9501L ->
        "quux corge grault garply waldo fred plugh day3 alpha beta gamma").toDF("doc_id", "text"))
    val before = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(before.nonEmpty && before.exists(_._1 >= 5000L),
      s"probe must hit both built and appended docs: $before")
    val filesBefore = parquetFiles(dir).size
    assert(Dedup.compactMinhashIndex(spark, dir) == 6)
    assert(Dedup.committedEpochs(dir).size == 1)
    // the merge is visible but old data is NOT yet deleted (probes
    // planned against the previous epoch set must finish their scans)
    val afterMerge = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(afterMerge == before, "compaction must not change probe results")
    assert(parquetFiles(dir).size > filesBefore,
      "merge alone must leave old data in place")
    // the reclaim pass shrinks the file count; probes still identical
    assert(Dedup.reclaimIndexGarbage(dir) == 12) // 6 epochs x 2 tables
    val filesAfter = parquetFiles(dir).size
    assert(filesAfter < filesBefore,
      s"reclaim must shrink the file count ($filesBefore -> $filesAfter)")
    val after = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(after == before, "reclaim must not change probe results")
    // idempotent: a single-epoch index is a no-op for both passes
    assert(Dedup.compactMinhashIndex(spark, dir) == 0)
    assert(Dedup.reclaimIndexGarbage(dir) == 0)
    // resurrection safety: even if a superseded MARKER somehow survives
    // while others are reclaimed, closure semantics keep it dead — here,
    // deleting nothing further, the live set stays exactly the merged one
    assert(Dedup.committedEpochs(dir).size == 1)
    spark.sharedState.cacheManager.clearCache()
  }

  test("a crash between merge-commit and reclaim never doubles probe rows") {
    // the round-12 review's scenario: compaction commits the merged
    // epoch, then dies before any cleanup. The supersedes marker makes
    // the old epochs dead at the SAME atomic rename, so the probe sees
    // exactly one generation; a later reclaim (the 'repair') finds only
    // dead data and markers to drop.
    val snap = corpus(20)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_crash2").toString
    Dedup.buildMinhashIndex(snap, dir)
    Dedup.appendToMinhashIndex(
      Seq(5001L -> "quux corge grault garply waldo fred plugh xyzzy thud quux corge grault")
        .toDF("doc_id", "text"), dir)
    val probe = Seq(6001L ->
      "quux corge grault garply waldo fred plugh xyzzy thud quux corge").toDF("doc_id", "text")
    val before = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(Dedup.compactMinhashIndex(spark, dir) == 2)
    // "crashed" here: no reclaim ran — old epoch files AND markers remain
    val dirty = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(dirty == before, s"merged + unreclaimed state must not double rows: $dirty")
    // second compaction over the dirty state is a no-op (one live epoch),
    // NOT a bake-in of duplicates
    assert(Dedup.compactMinhashIndex(spark, dir) == 0)
    assert(Dedup.reclaimIndexGarbage(dir) > 0)
    assert(Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq == before)
    spark.sharedState.cacheManager.clearCache()
  }

  test("a rebuild's predecessor data reclaims even with a single live epoch") {
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_rebuild").toString
    Dedup.buildMinhashIndex(corpus(15), dir)
    val firstFiles = parquetFiles(dir).size
    Dedup.buildMinhashIndex(corpus(25), dir) // rebuild over the same dir
    assert(Dedup.committedEpochs(dir).size == 1)
    assert(parquetFiles(dir).size > firstFiles, "old data still on disk pre-reclaim")
    assert(Dedup.reclaimIndexGarbage(dir) == 2, // 1 epoch x 2 tables
      "reclaim must work below the compaction threshold")
    val probe = corpus(25).filter(col("doc_id") === 21L).select(
      (col("doc_id") + 9000L).as("doc_id"),
      expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))").as("text"))
    assert(Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().exists(_._1 == 21L),
      "rebuilt index must serve docs beyond the first build")
    spark.sharedState.cacheManager.clearCache()
  }

  test("embedding compaction: identical probe results, one epoch") {
    val snap = spark.read.parquet(s"${TestSpark.Sf0001}/embeddings.parquet").limit(60)
    val dir = java.nio.file.Files.createTempDirectory("graft_embidx_compact").toString
    Dedup.buildEmbeddingIndex(snap.filter(col("vec_id") % 2 === 0), dir)
    Dedup.appendToEmbeddingIndex(snap.filter(col("vec_id") % 2 === 1), dir)
    assert(Dedup.committedEpochs(dir).size == 2)
    val probe = snap.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, x -> cast(x * 1.02 + 0.001 as float))").as("embedding"))
    val before = Dedup.probeEmbeddingIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    // appended vectors must be probe-visible (odd ids came from the append)
    assert(before.exists(_._1 % 2 == 1), s"append not visible: $before")
    assert(Dedup.compactEmbeddingIndex(spark, dir) == 2)
    assert(Dedup.committedEpochs(dir).size == 1)
    assert(Dedup.reclaimIndexGarbage(dir) == 4) // 2 epochs x 2 tables
    val after = Dedup.probeEmbeddingIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(after == before, "compaction must not change probe results")
    spark.sharedState.cacheManager.clearCache()
  }

  test("a crashed append (no commit marker) is invisible; the retry does not double-count") {
    val snap = corpus(20)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_crash").toString
    Dedup.buildMinhashIndex(snap, dir)
    val accepted = Seq(
      5001L -> "quux corge grault garply waldo fred plugh xyzzy thud quux corge grault")
      .toDF("doc_id", "text")
    // simulate the crash the round-11 advisory describes: both table
    // writes may have landed (or only one) but the marker never did —
    // modeled by appending normally and then RETRACTING the marker, which
    // leaves strictly more orphaned state than any real crash point
    Dedup.appendToMinhashIndex(accepted, dir)
    // same-JVM epoch ids sort in commit order, so max = the append
    val marker = Dedup.committedEpochs(dir).max
    new java.io.File(s"$dir/_committed/$marker").delete()
    val probe = Seq(6001L ->
      "quux corge grault garply waldo fred plugh xyzzy thud quux corge").toDF("doc_id", "text")
    val crashed = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(!crashed.exists(_._1 == 5001L),
      "an uncommitted epoch must be invisible to probes")
    // the retry lands a fresh epoch; the probe sees doc 5001 exactly once
    Dedup.appendToMinhashIndex(accepted, dir)
    val retried = Dedup.probeMinhashIndex(probe, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(retried.count(_._1 == 5001L) == 1,
      s"retried append must not double-count: $retried")
    // compact + reclaim drops the orphaned uncommitted epoch's files too
    Dedup.appendToMinhashIndex(
      Seq(5002L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed")
        .toDF("doc_id", "text"), dir)
    Dedup.compactMinhashIndex(spark, dir)
    Dedup.reclaimIndexGarbage(dir)
    val epochDirs = Option(new java.io.File(s"$dir/sigs").listFiles())
      .getOrElse(Array.empty).map(_.getName).toSeq
    assert(epochDirs.size == 1, s"orphans must be reclaimed: $epochDirs")
    spark.sharedState.cacheManager.clearCache()
  }

  test("stageAtomically: concurrent builders publish exactly one complete fixture") {
    val parent = java.nio.file.Files.createTempDirectory("graft_stage_race").toFile
    val target = new java.io.File(parent, "fixture")
    val builds = new java.util.concurrent.atomic.AtomicInteger(0)
    val results = new java.util.concurrent.CopyOnWriteArrayList[String]()
    val threads = (0 until 4).map { i =>
      new Thread(() => results.add(
        Dedup.stageAtomically(target) { tmp =>
          builds.incrementAndGet()
          tmp.mkdirs()
          java.nio.file.Files.writeString(
            new java.io.File(tmp, "data").toPath, s"builder-$i payload")
          java.nio.file.Files.writeString(
            new java.io.File(tmp, "done").toPath, "marker")
        }))
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    import scala.jdk.CollectionConverters._
    assert(results.asScala.forall(_ == target.getPath) && results.size == 4)
    // the published dir is COMPLETE (both files from one builder) and no
    // temp dirs are left behind
    assert(new java.io.File(target, "data").exists())
    assert(new java.io.File(target, "done").exists())
    val leftovers = parent.list().toSeq.filter(_.startsWith("fixture.tmp-"))
    assert(leftovers.isEmpty, s"staging leftovers: $leftovers")
    // later calls short-circuit without rebuilding
    val n = builds.get()
    Dedup.stageAtomically(target)(_ => fail("must not rebuild an existing fixture"))
    assert(builds.get() == n)
  }

  test("eval leakage: empty on a clean split, surfaces a planted leak, index-probe equivalent") {
    val docs = spark.read.parquet(s"${TestSpark.Sf0001}/documents.parquet")
      .select("doc_id", "text", "lang")
    val evalIds = graft.ops.Sampling.samplePerGroup(docs, "lang").select("doc_id")
    val train = docs.join(evalIds, Seq("doc_id"), "left_anti").select("doc_id", "text")
    val evalNat = docs.join(evalIds, Seq("doc_id"), "left_semi")
      .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))
    // clean split: a corpus of DISTINCT random texts reports nothing
    // (the real sf corpus below may legitimately carry a few exact-dup
    // texts across the split — the guard surfacing those is the point)
    val clean = corpus(40)
    assert(Dedup.evalLeakage(
      clean.filter(col("doc_id") % 4 =!= 0),
      clean.filter(col("doc_id") % 4 === 0)
        .select((col("doc_id") + 3000000L).as("doc_id"), col("text"))).count() == 0,
      "clean split must report no leakage")
    // any natural cross-pair on the real corpus must be a true text-level
    // near-dup (est_jaccard from identical/near-identical text), not a
    // banding artifact
    val natural = Dedup.evalLeakage(train, evalNat)
      .as[(Long, Long, Double)].collect().toSeq
    natural.foreach { case (t, e, j) =>
      assert(j >= 0.5, s"sub-threshold pair leaked through: ($t, $e, $j)")
    }
    // planted leak: a perturbed copy of the smallest train doc
    val leak = train.orderBy("doc_id").limit(1)
      .select((col("doc_id") + 4000000L).as("doc_id"),
        expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))").as("text"))
    val leakSrc = train.orderBy("doc_id").limit(1)
      .select("doc_id").as[Long].head()
    val found = Dedup.evalLeakage(train, evalNat.unionAll(leak))
      .as[(Long, Long, Double)].collect().toSeq
    assert(found.exists(p => p._1 == leakSrc && p._2 == leakSrc + 4000000L),
      s"planted leak must surface: $found")
    // 100 TB path: probing the eval set against a PERSISTED train index
    // returns the same pairs without re-signaturing train
    val dir = java.nio.file.Files.createTempDirectory("graft_leak_idx").toString
    Dedup.buildMinhashIndex(train, dir)
    val probed = Dedup.probeMinhashIndex(evalNat.unionAll(leak), dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(probed == found, "index probe must equal the inline guard")
    spark.sharedState.cacheManager.clearCache()
  }

  test("incr-embedding fixture has no cosine within 1e-4 of the 0.9 threshold (f32 vs f64 agreement)") {
    // the advisory's knife edge: the engine filters at cosine_f32 >= 0.9,
    // the DuckDB oracle at float64 >= 0.9 — a candidate pair NEAR 0.9
    // could be admitted by exactly one engine. Verify the planted fixture
    // keeps every candidate a safe margin away in BOTH precisions, so the
    // row sets provably agree. Runs on the per-round regenerated corpus,
    // so a regeneration that lands a pair on the edge fails loudly here
    // instead of flaking the correctness gate.
    for (sf <- Seq(TestSpark.Sf0001, "/root/testdata/sf0.01")) {
      val emb = spark.read.parquet(s"$sf/embeddings.parquet")
      val dir = Dedup.ensureEmbeddingIndex(spark, sf)
      val newBatch = emb.select(
        (col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, x -> cast(x * 1.02 + 0.001 as float))").as("embedding"))
      // all CANDIDATE pairs (threshold -1 disables the filter), scored in
      // both precisions
      val scored = Dedup.probeEmbeddingIndex(newBatch, dir, threshold = -1.0)
        .join(emb.select(col("vec_id").as("snap_id"), col("embedding").as("va")), Seq("snap_id"))
        .join(newBatch.select(col("vec_id").as("new_id"), col("embedding").as("vb")), Seq("new_id"))
        .withColumn("cos64", expr(
          """aggregate(zip_with(va, vb, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)), 0D, (a, v) -> a + v)
            | / (sqrt(aggregate(va, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE)))
            |  * sqrt(aggregate(vb, 0D, (a, x) -> a + CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))""".stripMargin))
        .select(col("cosine"), col("cos64"))
        .collect()
      assert(scored.nonEmpty)
      scored.foreach { r =>
        val (c32, c64) = (r.getDouble(0), r.getDouble(1))
        assert(math.abs(c32 - 0.9) > 1e-4 && math.abs(c64 - 0.9) > 1e-4,
          f"$sf: candidate cosine on the knife edge: f32=$c32%.8f f64=$c64%.8f")
        assert((c32 >= 0.9) == (c64 >= 0.9),
          f"$sf: precision flip: f32=$c32%.8f f64=$c64%.8f")
      }
      spark.sharedState.cacheManager.clearCache()
    }
  }
}
