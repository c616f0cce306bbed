package graft.ops

import graft.TestSpark
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Inbound-interop pins: the FOREIGN fixture files load through the
  * strict loader, the alphabet inversion reconstructs the authored
  * ranks, and a hand-computed GPT-2-layout encoding comes out of the
  * engine's apply path id for id — in the FILE's id space, not the
  * engine's dense one. (In package graft.ops for the private[ops]
  * fixture internals.) */
class HfInteropSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("the foreign fixture loads and inverts to the authored ranks") {
    val dir = HfInterop.ensureForeignDir()
    val (merges, vocab) = Bpe.loadHfTokenizer(dir, byteLevel = true)
    // internal spelling of ("Ġ","t") is the hex pair ("20","74")
    assert(merges.length == HfInterop.ForeignMerges.length)
    assert(merges(2) == (("20", "74")))
    assert(merges.head == (("74", "68")))
    // the file's id layout: codepoint-sorted alphabet, merges, EOS last
    assert(vocab("!") == 0)      // lowest printable
    assert(vocab("~") == 93)
    assert(vocab("Ġ") == 220) // Ġ: 33rd mapped char after 188 directs
    assert(vocab("th") == 256 && vocab("Ġthe") == 265)
    assert(vocab(Bpe.EosToken) == 266)
    assert(vocab.values.toSeq.sorted == (0 until vocab.size))
  }

  test("a vocab.json the engine's own writer would never emit still parses") {
    // multi-line, \uXXXX-escaped non-ASCII, trailing newline
    val json = HfInterop.foreignVocabJson
    assert(json.contains("\n  \""))
    assert(json.contains("\\u0120"))
    assert(Bpe.parseVocabJson(json).size == 267)
  }

  test("hand-computed GPT-2-layout encoding, id for id") {
    // "the theory" -> pre-tokens ["the", " theory"]:
    //   "the"     -> th(r1) -> the(r6)                  -> [the=261]
    //   " theory" -> th(r1) -> the(r6); (Ġ,the)/(Ġt..) never fire
    //             -> [Ġ=220, the=261, o=78, r=81, y=88]
    val (merges, vocab) = Bpe.loadHfTokenizer(HfInterop.ensureForeignDir(),
      byteLevel = true)
    val remap = HfInterop.remapToForeign(merges, vocab)
    assert(remap.length == 256 + merges.length)
    val rlit = typedLit(remap.toSeq)
    import spark.implicits._
    val got = Seq((1L, "the theory")).toDF("doc_id", "text")
      .select(array_join(
        transform(Bpe.bpe_token_ids(col("text"), merges, byteLevel = true,
          gpt2 = true), i => element_at(rlit, i + 1)), " ").as("ids"))
      .head().getString(0)
    assert(got == "261 220 261 78 81 88")
  }

  test("the seam is idempotent in merge space: import -> export -> import") {
    // engine file conventions differ from the foreign dialect BY DESIGN
    // (raw-byte alphabet order vs codepoint order) — but the merge
    // TABLE, the thing that defines the tokenizer's behavior, must
    // survive a full import -> engine-export -> import cycle bit-exactly
    val (merges, _) = Bpe.loadHfTokenizer(HfInterop.ensureForeignDir(),
      byteLevel = true)
    val tmp = java.nio.file.Files.createTempDirectory("graft-hf-reexport").toFile
    Bpe.writeHfFiles(tmp, merges, byteLevel = true)
    val (again, vocab2) = Bpe.loadHfTokenizer(tmp.getPath, byteLevel = true)
    assert(again == merges)
    assert(vocab2(Bpe.EosToken) == vocab2.size - 1)
  }

  test("every id the apply path can emit is covered by the file's vocab") {
    val (merges, vocab) = Bpe.loadHfTokenizer(HfInterop.ensureForeignDir(),
      byteLevel = true)
    val remap = HfInterop.remapToForeign(merges, vocab) // sys.errors if not
    assert(remap.distinct.length == remap.length,
      "foreign ids must be injective over reachable tokens")
    // and the fixture is genuinely foreign: the engine's writer orders
    // the alphabet by RAW BYTE, the file by mapped codepoint — byte 0
    // (U+0100) sits at file id 188, not 0
    assert(vocab("Ā") == 188)
  }
}
