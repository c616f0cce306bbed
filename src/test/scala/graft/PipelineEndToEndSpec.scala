package graft

import graft.ops.{Chunking, Curation, TextAnalysis}
import graft.sources.JsonlIngest
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The executable version of PIPELINE.md: every stage the page documents,
  * chained on real testdata, with the conservation invariant each hop
  * promises — nothing silently dropped, counts accounted at every
  * boundary, and the whole chain deterministic under rerun. */
class PipelineEndToEndSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("ingest -> normalize -> curate -> chunk -> pack -> shard, conserving at every hop") {
    // 0. INGEST: staged JSONL drop; valid + quarantined must cover every line
    val drop = JsonlIngest.ensureJsonlDrop(spark, TestSpark.Sf0001)
    val (valid, quarantine) = JsonlIngest.readWithQuarantine(spark, drop)
    val nLines = spark.read.text(drop).count()
    val (nValid, nQuar) = (valid.count(), quarantine.count())
    assert(nValid + nQuar == nLines, "ingest conservation")
    assert(nQuar > 0, "fixture must exercise the quarantine channel")

    // 1. NORMALIZE: byte-canonical text, one row per valid doc
    val normed = TextAnalysis.normalize(valid)
      .join(valid.select("doc_id", "lang"), Seq("doc_id"))
      .select(col("doc_id"), col("norm_text").as("text"), col("lang"))
    assert(normed.count() == nValid, "normalize conservation")

    // 2-5. gate -> exact dedup -> near-dup removal -> split -> train chunks
    // (one declarative plan: Curation.curateToChunks)
    val chunks = Curation.curateToChunks(normed)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nChunks = chunks.count()
    assert(nChunks > 0, "the gate must pass part of the corpus")
    // every chunk traces back to a surviving train doc; window token
    // counts conserve each source doc's tokens (overlap accounted)
    val docsChunked = chunks.select("doc_id").distinct().count()
    assert(docsChunked > 0 && docsChunked <= nValid)

    // 6. PACK into fixed-capacity sequences: reassignment, never loss
    val packed = Chunking.packChunks(chunks, capacity = 64)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    assert(packed.count() == nChunks, "packing conservation")
    val tokenMass = chunks.agg(sum("chunk_tokens")).as[Long].head()
    assert(packed.agg(sum("chunk_tokens")).as[Long].head() == tokenMass,
      "token-mass conservation through packing")
    // sequences fill to capacity except the last (by construction of the
    // offset-packing rule, every seq_id below the max holds >= 1 chunk
    // and the global offsets are gapless)
    val seqIds = packed.select("seq_id").distinct().as[Long].collect().sorted
    assert(seqIds.head == 0L && seqIds.last == seqIds.length - 1,
      "sequence ids must be dense from 0")

    // 7. SHARD the sequence manifest for training
    val seqs = packed.groupBy("seq_id").agg(count(lit(1)).as("n_chunks"))
    val shards = Chunking.shardSequences(seqs, nShards = 4)
      .select("seq_id", "shard", "shard_pos")
    val shardRows = shards.as[(Long, Long, Long)].collect()
    assert(shardRows.length == seqIds.length, "sharding conservation")
    shardRows.groupBy(_._2).foreach { case (sh, rs) =>
      assert(rs.map(_._3).toSet == (0L until rs.length).toSet,
        s"shard $sh positions not dense")
    }

    // DETERMINISM: the whole chain reruns to the identical artifact
    val rerun = Chunking.shardSequences(
      Chunking.packChunks(Curation.curateToChunks(normed), capacity = 64)
        .groupBy("seq_id").agg(count(lit(1)).as("n_chunks")), nShards = 4)
      .select("seq_id", "shard", "shard_pos")
      .as[(Long, Long, Long)].collect()
    assert(rerun.toSet == shardRows.toSet, "end-to-end rerun determinism")

    spark.sharedState.cacheManager.clearCache()
  }
}
