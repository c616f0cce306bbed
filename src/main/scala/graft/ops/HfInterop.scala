package graft.ops

import graft.Tables

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Inbound HF-tokenizers interop — the serving seam driven from the
  * OTHER side (r16 verdict #3): [[Bpe.writeHfFiles]]/[[Bpe.loadHfTokenizer]]
  * prove the engine round-trips its OWN interchange files; this entry
  * proves a FOREIGN-authored `vocab.json`/`merges.txt` pair — written in
  * the published GPT-2 file conventions the engine's writer does NOT use
  * — drives the engine's apply path bit-exactly, ids served in the
  * file's own id space.
  *
  * The fixture is authored ONCE as Scala data ([[ForeignMerges]] +
  * the GPT-2 id-layout rule in [[foreignVocab]]); the FILE bytes are
  * generated from it by [[writeForeignFixture]] (a deliberately foreign
  * dialect: codepoint-sorted alphabet ids, `\\uXXXX`-escaped non-ASCII
  * keys, multi-line layout, trailing newline — none of which
  * `writeHfFiles` emits), and the ORACLE is generated from the same
  * data directly. The entry's path therefore exercises the full inbound
  * chain — file → [[Bpe.loadHfTokenizer]] (strict parse, alphabet
  * inversion) → rank-priority apply → the file's id assignment — and
  * any parse/inversion/apply fault diverges from the data-derived
  * oracle instead of cancelling out.
  *
  * Foreign-format conventions mirrored from the public GPT-2 artifacts
  * (Radford et al. 2019 `encoder.py` + HF tokenizers' `merges.txt`
  * layout; reference stops at relational pushdown — `parser.rs` has no
  * tokenizer surface — this is the training-data tier on top):
  *  - byte-level tokens in the `bytes_to_unicode` printable alphabet
  *    (space = U+0120 'Ġ', so space-prefixed merges are first-class);
  *  - vocab ids: the 256-char byte alphabet sorted by MAPPED CODEPOINT
  *    (ids 0..255 — GPT-2's published layout, NOT the engine writer's
  *    raw-byte order), then one id per merge in rank order, then
  *    `<|endoftext|>` last.
  *
  * Scale shape: the model is a plan literal (10 merges + a 266-entry
  * remap array); scoring is the same codegen'd [[Bpe.BpeTokenIds]]
  * map-side expression as every ids entry, followed by a per-element
  * `transform` over the literal remap — zero additional shuffles. */
object HfInterop {

  /** The foreign merge table, in HF-interchange token space: GPT-2-style
    * English merges incl. space-prefixed ('Ġ' = byte 0x20) rules, each
    * operand producible from earlier ranks or the base alphabet. */
  private[ops] val ForeignMerges: Seq[(String, String)] = Seq(
    ("t", "h"),            // rank 1: th
    ("i", "n"),            // rank 2: in
    ("Ġ", "t"),       // rank 3: Ġt  (space-prefixed — the GPT-2 point)
    ("e", "r"),            // rank 4: er
    ("Ġt", "h"),      // rank 5: Ġth
    ("th", "e"),           // rank 6: the
    ("o", "n"),            // rank 7: on
    ("a", "n"),            // rank 8: an
    ("r", "e"),            // rank 9: re
    ("Ġth", "e"))     // rank 10: Ġthe

  /** The fixture's id assignment — GPT-2's published vocab layout,
    * derived from the authored data by the documented rule (sorted
    * mapped-codepoint alphabet, merge outputs in rank order, EOS last),
    * NOT by the engine's writer. */
  private[ops] lazy val foreignVocab: Seq[(String, Int)] = {
    val alphabet = Bpe.byteToUnicode.map(_.toString).sorted
    val merged = ForeignMerges.map { case (a, b) => a + b }
    ((alphabet ++ merged) :+ Bpe.EosToken).zipWithIndex
  }

  private def jsonEscapeAscii(s: String): String = s.flatMap {
    case '"'  => "\\\""
    case '\\' => "\\\\"
    // foreign dialect: EVERYTHING non-printable-ASCII as \uXXXX — the
    // engine writer only escapes controls, so this exercises the
    // parser's escape path on every non-ASCII alphabet key
    case c if c < ' ' || c > '~' => f"\\u${c.toInt}%04x"
    case c => c.toString
  }

  /** The literal file bytes — generated from the authored data in the
    * foreign dialect (multi-line vocab, trailing newlines). */
  private[ops] def foreignMergesTxt: String =
    "#version: 0.2\n" +
      ForeignMerges.map { case (a, b) => s"$a $b" }.mkString("\n") + "\n"

  private[ops] def foreignVocabJson: String =
    foreignVocab
      .map { case (t, i) => s"""  "${jsonEscapeAscii(t)}": $i""" }
      .mkString("{\n", ",\n", "\n}\n")

  /** Stage the fixture files once per content hash (the ensure-then-
    * serve cadence; a fixture edit re-keys the dir). */
  def ensureForeignDir(): String = {
    val bytes = (foreignMergesTxt + "\n" + foreignVocabJson).getBytes("UTF-8")
    val fp = java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).take(8).map(b => f"$b%02x").mkString
    val dir = new java.io.File(new java.io.File(
      sys.props("java.io.tmpdir"), "graft-hfforeign"), s"fixture_$fp")
    Dedup.stageAtomically(dir) { tmp =>
      tmp.mkdirs() // plain-file staging: no Spark writer to create it
      java.nio.file.Files.write(new java.io.File(tmp, "merges.txt").toPath,
        foreignMergesTxt.getBytes("UTF-8"))
      java.nio.file.Files.write(new java.io.File(tmp, "vocab.json").toPath,
        foreignVocabJson.getBytes("UTF-8"))
    }
  }

  /** Engine-dense id → the FILE's id, as one plan-literal array: slots
    * 0..255 are the base bytes, slot 256+i is merge i's output token.
    * Total by construction — every symbol the apply path can emit is a
    * base byte or a merge output — and REQUIRED total at build time so
    * a vocab missing a token refuses loudly here, not as -1 ids. */
  private[ops] def remapToForeign(merges: Seq[(String, String)],
      vocab: Map[String, Int]): Array[Int] = {
    val out = new Array[Int](256 + merges.length)
    (0 until 256).foreach { b =>
      out(b) = vocab.getOrElse(Bpe.byteToUnicode(b).toString,
        sys.error(f"foreign vocab missing base byte 0x$b%02x"))
    }
    merges.zipWithIndex.foreach { case ((a, b), i) =>
      val tok = Bpe.hfToken(a + b, byteLevel = true)
      out(256 + i) = vocab.getOrElse(tok,
        sys.error(s"foreign vocab missing merge output [$tok]"))
    }
    out
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // ids over GPT-2 pre-tokens under the FOREIGN model: the merge table
    // and the id space both come from the loaded interchange files; the
    // gate boundary scalarizes (s33 precedent), n_bpe cross-pins the
    // counting expression's segmentation + apply on the same model
    "text_bpe_ids_hf" -> ((s, d) => {
      val (merges, vocab) = Bpe.loadHfTokenizer(ensureForeignDir(), byteLevel = true)
      val rlit = typedLit(remapToForeign(merges, vocab).toSeq)
      Bpe.plantMultiscript(Tables.load(s, d, "documents"))
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"),
          array_join(
            transform(
              Bpe.bpe_token_ids(col("text"), merges, byteLevel = true, gpt2 = true),
              i => element_at(rlit, i + 1)),
            " ").as("ids"),
          Bpe.bpe_tokens(col("text"), merges, byteLevel = true, gpt2 = true)
            .as("n_bpe"))
    }))

  /** The oracle: literal `bp1..bpN` merge CTEs from the authored data
    * (internal hex-pair spelling — the SAME spelling the engine's
    * loader must reconstruct through the alphabet inversion), the
    * shared GPT-2 apply chain, then the file's id map as a literal
    * `fvocab` relation. Empty bp CTEs beyond the fixture's ranks keep
    * [[Bpe.applyChain]]'s fixed 40-stage unroll a no-op there. */
  val oracle: Seq[(String, String)] = {
    val bpCtes = (1 to Bpe.NMerges).map { k =>
      if (k <= ForeignMerges.length) {
        val (a, b) = ForeignMerges(k - 1)
        val (ia, ib) = (Bpe.hfTokenInverse(a, byteLevel = true),
          Bpe.hfTokenInverse(b, byteLevel = true))
        s"bp$k AS (SELECT '$ia' AS a, '$ib' AS b)"
      } else
        s"bp$k AS (SELECT CAST(NULL AS VARCHAR) AS a, CAST(NULL AS VARCHAR) AS b WHERE 1=0)"
    }
    val vocabById = foreignVocab.toMap
    val fvocabRows = (
      (0 until 256).map(b =>
        s"('${f"$b%02X"}', ${vocabById(Bpe.byteToUnicode(b).toString)})") ++
      ForeignMerges.map { case (a, b) =>
        val sym = Bpe.hfTokenInverse(a + b, byteLevel = true)
        s"('$sym', ${vocabById(a + b)})"
      }).mkString(",\n    ")
    val fvocab =
      s"""fvocab AS MATERIALIZED (
         |  SELECT * FROM (VALUES
         |    $fvocabRows) v(sym, id))""".stripMargin
    val words =
      s"""(SELECT doc_id, wi, t[wi] AS w FROM (
         |   SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
         |   FROM (SELECT doc_id, ${Tokens.duckGpt2Toks("text")} AS t FROM planted) _) _) _""".stripMargin
    val toks =
      s"""toks AS (
         |  SELECT doc_id, wi, j, s[j] AS sym FROM (
         |    SELECT doc_id, wi, s, unnest(generate_series(1, len(s))) AS j FROM (
         |      SELECT doc_id, wi,
         |             list_transform(string_split(repr, chr(31)||chr(31)),
         |                            x -> trim(x, chr(31))) AS s
         |      FROM aw${Bpe.NMerges}) _) _)""".stripMargin
    val seq =
      s"""seq AS (
         |  SELECT doc_id,
         |         list(CAST(COALESCE(f.id, -1) AS INT)
         |              ORDER BY t.wi, t.j) AS ids
         |  FROM toks t LEFT JOIN fvocab f ON f.sym = t.sym
         |  GROUP BY doc_id)""".stripMargin
    val ctes = (Bpe.plantedCte +: bpCtes) ++
      Bpe.applyChain(words, "doc_id, wi", Bpe.SpecGpt2) ++
      Seq(fvocab, toks, seq)
    Seq("text_bpe_ids_hf" ->
      s"""WITH ${ctes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(s.ids, CAST([] AS INT[])), ' ') END AS ids,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(s.ids), 0) AS BIGINT) END AS n_bpe
         |FROM planted d LEFT JOIN seq s USING (doc_id)
         |ORDER BY doc_id""".stripMargin)
  }
}
