package graft

import graft.Tables
import graft.ops.{Bpe, Tokens}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The tokenizer serving seam: every trained model dir also carries
  * HF-tokenizers-style `vocab.json`/`merges.txt` (written inside the
  * same staged commit, so the existing era guard fingerprints them), and
  * `loadHfTokenizer` round-trips the files back to the engine's internal
  * merge form — write → load → apply must equal the in-memory model on
  * the corpus. */
class HfTokenizerSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  private def modelDirs: Seq[(String, Boolean)] = Seq(
    (Bpe.ensureModel(spark, TestSpark.Sf0001), false),
    (Bpe.ensureModelLarge(spark, TestSpark.Sf0001), false), // the 32k table
    (Bpe.ensureModelBytes(spark, TestSpark.Sf0001), true),
    (Bpe.ensureModelGpt2(spark, TestSpark.Sf0001), true))

  test("every staged model dir carries the interchange files") {
    modelDirs.foreach { case (dir, _) =>
      assert(new java.io.File(dir, "merges.txt").isFile, s"merges.txt in $dir")
      assert(new java.io.File(dir, "vocab.json").isFile, s"vocab.json in $dir")
      // and the parquet model still loads despite the extra files
      assert(Bpe.loadMerges(spark, dir).nonEmpty)
    }
  }

  test("merges.txt round-trips to the exact in-memory merge table") {
    modelDirs.foreach { case (dir, byteLevel) =>
      val inMem = Bpe.loadMerges(spark, dir)
      val (loaded, vocab) = Bpe.loadHfTokenizer(dir, byteLevel)
      assert(loaded == inMem, s"loaded merges != in-memory for $dir")
      // dense ids 0..n-1, alphabet before merged tokens
      assert(vocab.values.toSeq.sorted == (0 until vocab.size),
        s"vocab ids not dense for $dir")
    }
  }

  test("write -> load -> apply equals the in-memory model on the corpus") {
    modelDirs.foreach { case (dir, byteLevel) =>
      val inMem = Bpe.loadMerges(spark, dir)
      val (loaded, _) = Bpe.loadHfTokenizer(dir, byteLevel)
      val docs = Tables.load(spark, TestSpark.Sf0001, "documents")
      val rows = docs.select(col("doc_id"),
        Bpe.bpe_tokens(col("text"), inMem, byteLevel).as("a"),
        Bpe.bpe_tokens(col("text"), loaded, byteLevel).as("b"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        assert(r.isNullAt(1) == r.isNullAt(2))
        if (!r.isNullAt(1))
          assert(r.getLong(1) == r.getLong(2),
            s"doc ${r.getLong(0)}: served tokenizer diverged ($dir)")
      }
    }
  }

  test("byte-level vocab carries the full 256-byte alphabet (GPT-2 convention)") {
    val dir = Bpe.ensureModelBytes(spark, TestSpark.Sf0001)
    val (_, vocab) = Bpe.loadHfTokenizer(dir, byteLevel = true)
    (0 until 256).foreach { b =>
      val tok = Bpe.byteToUnicode(b).toString
      assert(vocab.contains(tok), f"byte 0x$b%02x missing from vocab")
    }
    // the byte alphabet itself is a bijection (space-free, printable)
    assert(Bpe.byteToUnicode.distinct.length == 256)
    assert(!Bpe.byteToUnicode.exists(_.isWhitespace))
  }

  test("the vocab reserves <|endoftext|> as the LAST id (GPT-2 convention)") {
    modelDirs.foreach { case (dir, byteLevel) =>
      val (_, vocab) = Bpe.loadHfTokenizer(dir, byteLevel)
      assert(vocab.get(Bpe.EosToken).contains(vocab.size - 1),
        s"EOS slot wrong in $dir: ${vocab.get(Bpe.EosToken)} of ${vocab.size}")
    }
  }

  test("the loader is strict: tampered files refuse loudly") {
    val tmp = java.nio.file.Files.createTempDirectory("graft-hf-tamper").toFile
    java.nio.file.Files.write(new java.io.File(tmp, "merges.txt").toPath,
      "a b\n".getBytes("UTF-8")) // missing #version header
    java.nio.file.Files.write(new java.io.File(tmp, "vocab.json").toPath,
      "{}".getBytes("UTF-8"))
    intercept[IllegalArgumentException] {
      Bpe.loadHfTokenizer(tmp.getPath, byteLevel = false)
    }
    java.nio.file.Files.write(new java.io.File(tmp, "merges.txt").toPath,
      "#version: 0.2\na b\n".getBytes("UTF-8"))
    // vocab missing the merge output "ab"
    intercept[IllegalArgumentException] {
      Bpe.loadHfTokenizer(tmp.getPath, byteLevel = false)
    }
  }

  test("vocab.json parser handles the escapes the writer emits") {
    val m = Bpe.parseVocabJson("""{"a": 0, "\"q\"": 1, "b\\c": 2, "x": 3}""")
    assert(m == Map("a" -> 0, "\"q\"" -> 1, "b\\c" -> 2, "x" -> 3))
    assert(Bpe.parseVocabJson("{}") == Map.empty[String, Int])
  }

  test("vocab.json parser refuses truncation/corruption with its own diagnostics") {
    // r16 review: raw StringIndexOutOfBounds/NumberFormat exceptions
    // would break the loudly-refusing loader contract
    Seq("{\"a", "{\"a\\", "{\"a\": }", "{\"a\": 1", "{\"a\\u00",
        "{\"a\\u00zz\": 1}", "{\"a\": 99999999999}",
        // r17: trailing garbage after the closing brace — a concatenated
        // or corrupted file must refuse, not silently serve the first
        // object (the strict-to-EOF half of the loader contract)
        "{\"a\": 0}{\"b\": 1}", "{\"a\": 0} x", "{} null")
      .foreach { bad =>
        val e = intercept[Exception](Bpe.parseVocabJson(bad))
        assert(e.getMessage != null && e.getMessage.contains("vocab.json"),
          s"input [$bad] threw ${e.getClass.getSimpleName}: ${e.getMessage}")
      }
    // trailing whitespace alone is NOT garbage
    assert(Bpe.parseVocabJson("{\"a\": 0}\n") == Map("a" -> 0))
  }

  test("codepoint vocab covers dict characters that never joined a merge (r17)") {
    // r16 advisory: an alphabet derived from merge symbols alone left an
    // external HF-tokenizers consumer unable to encode merge-free chars.
    // Synthetic model: one merge (a,b); dict words carry x/y/z which
    // appear in NO merge — they must still land in vocab.json.
    val tmp = java.nio.file.Files.createTempDirectory("graft-hf-alpha").toFile
    Bpe.writeHfFiles(tmp, Seq(("a", "b")), byteLevel = false,
      dictWords = Seq("ab", "xyz"))
    val (loaded, vocab) = Bpe.loadHfTokenizer(tmp.getPath, byteLevel = false)
    assert(loaded == Seq(("a", "b")))
    Seq("a", "b", "x", "y", "z", "ab").foreach(t =>
      assert(vocab.contains(t), s"token [$t] missing from codepoint vocab"))
    // dense ids and the reserved-last EOS convention still hold
    assert(vocab.values.toSeq.sorted == (0 until vocab.size))
    assert(vocab(Bpe.EosToken) == vocab.size - 1)
  }

  test("the STAGED codepoint model's vocab is dict-complete (r17)") {
    // end-to-end form of the advisory fix: on the real staged oracle
    // model, the vocab must strictly extend the merge-symbol alphabet
    // (the corpus dict always carries characters that never merge)
    val dir = Bpe.ensureModel(spark, TestSpark.Sf0001)
    val (merges, vocab) = Bpe.loadHfTokenizer(dir, byteLevel = false)
    val mergeChars = merges.flatMap { case (a, b) => a + b }.toSet
    val alphabetKeys = vocab.keySet.filter(_.length == 1).map(_.head)
    assert(mergeChars.subsetOf(alphabetKeys))
    assert(alphabetKeys.size > mergeChars.size,
      "vocab alphabet == merge chars: the dict-derived extension is missing")
  }
}
