package graft

import graft.ops.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Incremental ingestion dedup — the ops that dedupe a NEW batch against a
  * prior corpus snapshot without reshuffling the snapshot:
  *  - `Dedup.incremental` (exact; distributed bloom prefilter + exact
  *    anti-join confirm),
  *  - `Dedup.buildMinhashIndex`/`probeMinhashIndex` (near-dup; persisted
  *    LSH band index, probe-side shuffle only).
  */
class IncrementalDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private val snapshot = docs(
    1L -> "alpha beta gamma delta", 2L -> "epsilon zeta eta theta",
    3L -> "iota kappa lambda mu", 4L -> "nu xi omicron pi")

  // 10 re-crawls of snapshot content + 10 genuinely new rows
  private val batch = docs(
    (101L to 110L).map(i => i -> s"alpha beta gamma delta") ++
      (201L to 210L).map(i => i -> s"new content number $i"): _*)

  test("incremental == plain exact anti-join (bloom is semantics-free)") {
    val got = Dedup.incremental(batch, snapshot)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val want = batch.join(snapshot.select("text"), Seq("text"), "left_anti")
      .select("doc_id", "text").orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(got == want)
    assert(got.map(_._1) == (201L to 210L))
  }

  test("an undersized bloom (high fp rate) changes nothing — exact confirm restores") {
    // 64 bits for 20+ items: most probes come back positive, so nearly the
    // whole batch takes the exact-confirm path; result must be identical
    val tiny = Dedup.incremental(batch, snapshot,
      expectedSnapshotItems = 1L, fpp = 0.5)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val sized = Dedup.incremental(batch, snapshot)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(tiny == sized)
  }

  test("the probe is a bloom filter in the plan and bloom-negatives skip the anti-join") {
    val plan = Dedup.incremental(batch, snapshot).queryExecution.executedPlan.toString
    assert(plan.contains("might_contain"),
      s"expected a bloom probe in the physical plan:\n$plan")
    // shuffle volume: the confirm anti-join's batch side must carry only
    // suspects (the 10 re-crawls + fp sliver), not the full batch. Compare
    // against the plain anti-join, with auto-broadcast off so both plans
    // actually shuffle (at 100 TB neither side broadcasts).
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val all = PlanAudit.measureShuffle(spark) {
        batch.withColumn("__h", sha2(col("text"), 256))
          .join(snapshot.select(sha2(col("text"), 256).as("__h")), Seq("__h"), "left_anti")
          .write.format("noop").mode("overwrite").save()
      }
      val inc = PlanAudit.measureShuffle(spark) {
        Dedup.incremental(batch, snapshot)
          .write.format("noop").mode("overwrite").save()
      }
      // both shuffle the 4 snapshot hashes; the anti-join left side is 20
      // rows in the plain join vs ~10 suspects in the incremental one. The
      // bloom partials add |tasks| sketch rows — still strictly less.
      assert(inc < all, s"incremental shuffled $inc rows, plain anti-join $all")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("empty snapshot and NULL text: unknown probes route to the exact confirm") {
    // an empty snapshot yields a NULL bloom sketch -> every probe is
    // unknown; the whole batch must survive (== the plain anti-join),
    // not silently vanish through two null-dropping filters
    val empty = snapshot.filter(lit(false))
    val keptAll = Dedup.incremental(batch, empty)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(keptAll == batch.orderBy("doc_id").as[(Long, String)].collect().toSeq)
    // a NULL-text row hashes to a NULL probe; it must survive as new
    // (NULL never matches an anti-join key) — never be dropped
    val withNull = batch.unionByName(
      Seq((999L, Option.empty[String])).toDF("doc_id", "text"))
    val kept = Dedup.incremental(withNull, snapshot)
      .select("doc_id").as[Long].collect().toSet
    assert(kept.contains(999L))
  }

  test("deterministic under repartitioning") {
    val a = Dedup.incremental(batch.repartition(7), snapshot.repartition(3))
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    val b = Dedup.incremental(batch, snapshot)
      .orderBy("doc_id").as[(Long, String)].collect().toSeq
    assert(a == b)
  }

  test("streaming incremental dedup equals the batch entry (oracle-independent)") {
    // exact non-double fields only — row-set equality is the right compare
    val batch = SparkEntry.queries("dedup_incremental")(spark, TestSpark.Sf0001)
      .as[(Long, String)].collect().toSet
    val stream = SparkEntry.queries("stream_incr_dedup")(spark, TestSpark.Sf0001)
      .as[(Long, String)].collect().toSet
    assert(stream == batch)
    assert(batch.nonEmpty)
    spark.sharedState.cacheManager.clearCache()
  }

  // ---- minhash index ----

  private def corpus(n: Int): DataFrame = {
    val words = Array("alpha", "beta", "gamma", "delta", "epsilon", "zeta",
      "eta", "theta", "iota", "kappa", "lambda", "mu")
    (1 to n).map { i =>
      val rnd = new scala.util.Random(i * 7919L)
      i.toLong -> Seq.fill(30)(words(rnd.nextInt(words.length))).mkString(" ")
    }.toDF("doc_id", "text")
  }

  test("probe against a stored index == cross slice of the full pair pipeline") {
    val snap = corpus(40)
    // near-dup of every even doc (drop ~10% of chars), distinct range
    val newBatch = snap.filter(col("doc_id") % 2 === 0).select(
      (col("doc_id") + 1000L).as("doc_id"),
      expr("substring(text, 1, greatest(cast(length(text) * 0.9 as int), 1))").as("text"))
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_spec").toString
    Dedup.buildMinhashIndex(snap, dir)
    val probed = Dedup.probeMinhashIndex(newBatch, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val full = Dedup.minHashPairs(
      snap.select("doc_id", "text").unionAll(newBatch))
      .filter(col("doc_a") < 1000L && col("doc_b") >= 1000L)
      .select(col("doc_a").as("snap_id"), col("doc_b").as("new_id"), col("est_jaccard"))
      .orderBy("snap_id", "new_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(probed == full)
    // every planted near-dup is found against its source
    val found = probed.map(p => (p._1, p._2)).toSet
    val expectedSelfPairs = (2 to 40 by 2).map(i => (i.toLong, i + 1000L)).toSet
    assert(expectedSelfPairs.subsetOf(found),
      s"missing planted pairs: ${expectedSelfPairs -- found}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("embedding-index probe == cross slice of the full embedding pair pipeline") {
    val snap = TestSpark.spark.read
      .parquet(s"${TestSpark.Sf0001}/embeddings.parquet")
      .limit(100)
    val newBatch = snap.select(
      (col("vec_id") + 1000000L).as("vec_id"),
      expr("transform(embedding, x -> cast(x * 1.02 + 0.001 as float))").as("embedding"))
    val dir = java.nio.file.Files.createTempDirectory("graft_embidx_spec").toString
    graft.ops.Dedup.buildEmbeddingIndex(snap, dir)
    val probed = graft.ops.Dedup.probeEmbeddingIndex(newBatch, dir)
      .as[(Long, Long, Double)].collect().toSeq
    val full = graft.ops.Dedup.embeddingNearDupPairs(
      snap.select("vec_id", "embedding")
        .unionAll(newBatch.select("vec_id", "embedding"))
        .withColumn("label", lit(0)))
      .filter(col("id_a") < 1000000L && col("id_b") >= 1000000L)
      .select(col("id_a").as("snap_id"), col("id_b").as("new_id"), col("cosine"))
      .orderBy("snap_id", "new_id")
      .as[(Long, Long, Double)].collect().toSeq
    assert(probed == full)
    // every planted perturbed vector is found against its source
    val found = probed.map(p => (p._1, p._2)).toSet
    val ids = snap.select("vec_id").as[Long].collect()
    val expected = ids.map(i => (i, i + 1000000L)).toSet
    assert(expected.subsetOf(found), s"missing planted pairs: ${expected -- found}")
    spark.sharedState.cacheManager.clearCache()
  }

  test("append extends the index O(batch): next probe sees appended docs, history untouched") {
    val snap = corpus(20)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_append").toString
    Dedup.buildMinhashIndex(snap, dir)
    val history = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).toArray
      .map(_.toString).toSet
    // crawl 1: near-dups of even docs (accepted: none of them — they match);
    // plus two genuinely new docs that get ACCEPTED and appended
    val accepted = docs(
      5001L -> "quux corge grault garply waldo fred plugh xyzzy thud quux corge grault",
      5002L -> "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod")
    Dedup.appendToMinhashIndex(accepted, dir)
    // history files are byte-untouched (append wrote only new files)
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).toArray
      .map(_.toString).toSet
    assert(history.subsetOf(after) && after.size > history.size)
    // crawl 2: a near-dup of an APPENDED doc must now be caught
    val crawl2 = docs(
      6001L -> "quux corge grault garply waldo fred plugh xyzzy thud quux corge")
    val hits = Dedup.probeMinhashIndex(crawl2, dir)
      .as[(Long, Long, Double)].collect().toSeq
    assert(hits.exists(h => h._1 == 5001L && h._2 == 6001L),
      s"appended doc not probed: $hits")
    spark.sharedState.cacheManager.clearCache()
  }

  test("a second probe reuses the stored index without rewriting it") {
    val snap = corpus(10)
    val dir = java.nio.file.Files.createTempDirectory("graft_mhidx_reuse").toString
    Dedup.buildMinhashIndex(snap, dir)
    val mtimes = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).toArray
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(
          p.asInstanceOf[java.nio.file.Path]).toMillis).toMap
    val newBatch = docs(5001L -> "alpha beta gamma delta epsilon zeta eta theta iota kappa")
    val r1 = Dedup.probeMinhashIndex(newBatch, dir).collect().toSeq
    val r2 = Dedup.probeMinhashIndex(newBatch, dir).collect().toSeq
    assert(r1 == r2)
    val after = java.nio.file.Files.walk(java.nio.file.Paths.get(dir))
      .filter(java.nio.file.Files.isRegularFile(_)).toArray
      .map(p => p.toString ->
        java.nio.file.Files.getLastModifiedTime(
          p.asInstanceOf[java.nio.file.Path]).toMillis).toMap
    assert(after == mtimes, "probe must not touch the stored index")
    spark.sharedState.cacheManager.clearCache()
  }
}
