package graft

import graft.Tables
import graft.ops.Bpe
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The r15 production-shape BPE additions: whole-stage codegen on the
  * counting expression, the 32k-capacity trainer's end-to-end path, the
  * byte-level variant's coverage claim, and the merge-table era guard. */
class BpeLargeSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("BpeTokenCount generates code: the projection stays in one whole-stage span") {
    val merges = Seq(("a", "b"), ("ab", "c"))
    // not CodegenFallback anymore — the r14 watch item
    val expr = Bpe.BpeTokenCount(
      org.apache.spark.sql.catalyst.expressions.Literal("abc"), merges)
    assert(!expr.isInstanceOf[
      org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback])
    // and the generated path computes the same counts as interpreted eval
    val df = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), Bpe.bpe_tokens(col("text"), merges).as("n"))
    df.collect() // force execution (finalizes any adaptive plan)
    val plan = df.queryExecution.executedPlan.toString
    val line = plan.linesIterator.find(_.contains("bpe_token_count"))
      .getOrElse(fail(s"no bpe_token_count line in plan:\n$plan"))
    assert(line.trim.matches("""^[+\-:* (]*\*\(\d+\).*""") ||
      line.trim.startsWith("*("),
      s"bpe_token_count must sit inside a WholeStageCodegen span: $line\n$plan")
    // generated ≡ interpreted, row by row
    val gen = df.orderBy("doc_id").collect()
    val interp = Tables.load(spark, TestSpark.Sf0001, "documents")
      .select(col("doc_id"), col("text")).collect().map { r =>
        if (r.isNullAt(1)) null
        else expr.copy(child = org.apache.spark.sql.catalyst.expressions
          .Literal(r.getString(1))).eval(null)
      }
    assert(gen.map(r => if (r.isNullAt(1)) null else r.getLong(1)).toSeq ==
      interp.toSeq)
  }

  test("the large model learns beyond the 40-merge pin and its prefix is stable") {
    val large = Bpe.loadMerges(spark, Bpe.ensureModelLarge(spark, TestSpark.Sf0001))
    assert(large.size > Bpe.NMerges,
      s"the sf0.001 dict must support more than ${Bpe.NMerges} merges, got ${large.size}")
    assert(large.size <= Bpe.NMergesLarge)
    // prefix stability against the naive reference on the SAME large dict
    // is property-pinned (BpeLargeProps); here pin the persisted artifact:
    // re-ensuring returns the same table
    assert(Bpe.loadMerges(spark,
      Bpe.ensureModelLarge(spark, TestSpark.Sf0001)) == large)
  }

  test("large + byte entries run end-to-end at sf0.001 with their invariants") {
    val vocab = SparkEntry.queries("text_bpe_vocab_large")(spark, TestSpark.Sf0001)
      .collect()
    assert(vocab.length == Bpe.NMerges) // the corpus supports ≥ 40 merges
    val toks = SparkEntry.queries("text_tokens_bpe_large")(spark, TestSpark.Sf0001)
      .collect()
    assert(toks.nonEmpty)
    // every non-null doc satisfies the bound chain; null docs are null
    assert(toks.forall(r => r.isNullAt(2) || r.getBoolean(2)),
      toks.filterNot(r => r.isNullAt(2) || r.getBoolean(2)).take(3).mkString(";"))
    val bytes = SparkEntry.queries("text_tokens_bpe_bytes")(spark, TestSpark.Sf0001)
      .collect()
    assert(bytes.nonEmpty)
    // byte-level counts live in [words, octets]: n_bpe ≤ n_bytes always
    assert(bytes.forall(r => r.isNullAt(1) || r.getLong(1) <= r.getLong(2)))
    // the variant's point: on the SAME planted text, the byte-level count
    // differs from the codepoint-level count on every planted doc — 33
    // distinct CJK codepoints need 66 byte merges to fully compress, a
    // 40-rule table can't, so some chars stay at >1 byte-symbol while the
    // codepoint model counts each as exactly 1
    val cpMerges = Bpe.loadMerges(spark, Bpe.ensureModel(spark, TestSpark.Sf0001))
    val cpOverPlanted = Bpe.plantMultiscript(
        Tables.load(spark, TestSpark.Sf0001, "documents"))
      .select(col("doc_id"), Bpe.bpe_tokens(col("text"), cpMerges).as("n"))
      .collect().map(r => r.getLong(0) -> (if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val differing = bytes.count(r => !r.isNullAt(1) &&
      r.getLong(0) % 3 == 0 && cpOverPlanted(r.getLong(0)) != r.getLong(1))
    assert(differing > 0,
      "byte-level and codepoint-level counts must differ on the planted docs")
  }

  test("32k-capacity training is tractable on a production-sized dict") {
    // synthetic Zipf-ish dict: 20k distinct words over a small alphabet so
    // pairs repeat heavily and thousands of merges are learnable
    val rnd = new scala.util.Random(42)
    val alphabet = "abcdefgh"
    val dict = (0 until 20000).map { i =>
      val len = 3 + rnd.nextInt(10)
      val w = (0 until len).map(_ => alphabet(rnd.nextInt(alphabet.length))).mkString
      (w, (20000L / (i + 1)) + 1L)
    }.groupBy(_._1).map { case (w, fs) => (w, fs.map(_._2).sum) }.toSeq.sortBy(_._1)
    val t0 = System.nanoTime()
    val merges = Bpe.trainFast(dict, Bpe.NMergesLarge)
    val secs = (System.nanoTime() - t0) / 1e9
    assert(merges.size > 1000, s"expected thousands of learnable merges, got ${merges.size}")
    assert(secs < 60.0, f"32k-capacity training took $secs%.1f s — wrong shape")
    // spot-pin the head against the naive reference (full-table equality
    // on random dicts is BpeLargeProps' job; the naive trainer at this
    // dict size is only tractable for a short prefix)
    assert(merges.take(25) == Bpe.train(dict, 25))
    info(f"learned ${merges.size} merges in $secs%.2f s on a ${dict.size}-word dict")
  }

  test("a stale pinned merge table is refused loudly (era guard)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_bpe_era").toFile
    val sfDir = tmp.getPath
    import spark.implicits._
    def writeCorpus(tag: String): Unit =
      (0L until 60L).map(i => (i, s"$tag word$i some shared words here", "web"))
        .toDF("doc_id", "text", "source")
        .coalesce(1).write.mode("overwrite")
        .parquet(s"$sfDir/documents.parquet")
    writeCorpus("alpha")
    val modelDir = Bpe.ensureModel(spark, sfDir)
    // fresh model against its own corpus: guard passes
    Bpe.loadMergesGuarded(spark, sfDir, modelDir)
    // corpus moves on (a regenerated epoch): the PINNED model dir must be
    // refused — silently retraining would move every downstream count
    // (no sleep needed: part-file names are unique per write, so the
    // content fingerprint always moves)
    writeCorpus("beta")
    val e = intercept[IllegalStateException] {
      Bpe.loadMergesGuarded(spark, sfDir, modelDir)
    }
    assert(e.getMessage.contains("era mismatch"), e.getMessage)
    // and the entry path itself carries the guard: ensureModel on the NEW
    // corpus trains a fresh table whose guard passes again
    val fresh = Bpe.ensureModel(spark, sfDir)
    assert(fresh != modelDir)
    Bpe.loadMergesGuarded(spark, sfDir, fresh)
  }
}
