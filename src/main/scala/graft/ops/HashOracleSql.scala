package graft.ops

import graft.functions.Mix64

/** DuckDB oracle SQL for the hash-sketch entries (dedup_minhash,
  * dedup_simhash, text_fingerprint, mm_features) — the four entries that
  * were previously `no_oracle` because DuckDB has no wrapping 64-bit
  * integer arithmetic.
  *
  * The generator emulates the engine's exact hash chain — FNV-1a 64
  * (`TextExprs.scala` WordShingleHashes/WinnowingFingerprint), the
  * splitmix64 finalizer (`Mix64.mix`), and Spark's `XXH64.hashLong`
  * (verified against the spark-catalyst 4.1.2 bytecode) — in HUGEINT
  * (int128) arithmetic mod 2^64:
  *
  *  - A wrapping 64-bit multiply splits the constant into 32-bit halves
  *    (`mul`), since a full 64×64 product overflows int128.
  *  - Each mix/hash STEP is materialized as a real column via one nested
  *    SELECT per step (`stages`). Writing the whole mix64 as one textual
  *    expression would duplicate the input subtree ~128× (DuckDB does not
  *    CSE within a projection) — measured 332× slower.
  *  - Sequential folds over variable-length sequences (the XXH64 digest
  *    fold, the per-byte media digest) use a recursive CTE: one iteration
  *    per element index, vectorized across all documents, with the staged
  *    steps nested inside the recursive term. Source CTEs are
  *    MATERIALIZED so recursion iterations don't re-run the hash chain.
  *  - Java comparisons are SIGNED: values convert to BIGINT (`toSigned`)
  *    before any min/sort, and back to the unsigned HUGEINT domain
  *    (`elemsUnsigned`) before re-entering multiply/xor arithmetic.
  *
  * Candidate generation diverges from the engine in one deliberate way:
  * the engine buckets minhash bands by `xxhash64(slice)` while the oracle
  * joins on the slice values themselves — equivalent output unless two
  * distinct slices collide in xxhash64 AND the resulting spurious pair
  * clears the 32-of-64 signature-agreement threshold.
  */
object HashOracleSql {

  private val M = "18446744073709551616" // 2^64
  private val S63 = "9223372036854775808" // 2^63

  // FNV-1a 64
  private val FnvOffset = 0xCBF29CE484222325L
  private val FnvPrime = 0x100000001B3L
  // splitmix64 finalizer constants (Mix64.mix)
  private val MixC1 = 0xBF58476D1CE4E5B9L
  private val MixC2 = 0x94D049BB133111EBL
  // Spark XXH64 primes (spark-catalyst XXH64.java)
  private val P1 = 0x9E3779B185EBCA87L
  private val P2 = 0xC2B2AE3D27D4EB4FL
  private val P3 = 0x165667B19E3779F9L
  private val P4 = 0x85EBCA77C2B2AE63L
  private val P5 = 0x27D4EB2F165667C5L

  private[ops] def u64(l: Long): String = java.lang.Long.toUnsignedString(l)

  /** Wrapping 64-bit multiply of column ref `a` (HUGEINT in [0, 2^64)) by
    * constant c. `a` must be a plain column reference — it is referenced
    * four times. */
  private[ops] def mul(a: String, c: Long): String = {
    val bl = u64(c & 0xFFFFFFFFL)
    val bh = u64(c >>> 32)
    s"((($a % 4294967296) * $bl + ((($a % 4294967296) * $bh " +
      s"+ ($a // 4294967296) * $bl) % 4294967296) * 4294967296) % $M)"
  }

  /** Wrap `base` in one SELECT per (outCol, expr) step so every
    * intermediate is a real column (single evaluation, no tree blowup). */
  private[ops] def stages(base: String, steps: Seq[(String, String)]): String =
    steps.foldLeft(base) { case (q, (col, e)) =>
      s"SELECT *, $e AS $col FROM ($q)"
    }

  /** Staged splitmix64 of column `x` into column `out`. */
  private[ops] def mixSteps(x: String, out: String, tag: String): Seq[(String, String)] = Seq(
    s"_${tag}a" -> s"xor($x, $x >> 30)",
    s"_${tag}b" -> mul(s"_${tag}a", MixC1),
    s"_${tag}c" -> s"xor(_${tag}b, _${tag}b >> 27)",
    s"_${tag}d" -> mul(s"_${tag}c", MixC2),
    out -> s"xor(_${tag}d, _${tag}d >> 31)")

  /** Staged XXH64.hashLong(elem, acc) -> out. rotl(x, r) decomposes into
    * shift-high + shift-low (the two halves cannot overlap). */
  private def xxh64Steps(acc: String, elem: String, out: String, tag: String): Seq[(String, String)] = Seq(
    s"_${tag}h0" -> s"(($acc + ${u64(P5)} + 8) % $M)",
    s"_${tag}k1" -> mul(elem, P2),
    s"_${tag}k2" -> s"(((_${tag}k1 * 2147483648) % $M) + (_${tag}k1 // 8589934592))", // rotl 31
    s"_${tag}k3" -> mul(s"_${tag}k2", P1),
    s"_${tag}h1" -> s"xor(_${tag}h0, _${tag}k3)",
    s"_${tag}h2" -> s"(((_${tag}h1 * 134217728) % $M) + (_${tag}h1 // 137438953472))", // rotl 27
    s"_${tag}h3" -> s"((${mul(s"_${tag}h2", P1)} + ${u64(P4)}) % $M)",
    s"_${tag}f1" -> s"xor(_${tag}h3, _${tag}h3 >> 33)",
    s"_${tag}f2" -> mul(s"_${tag}f1", P2),
    s"_${tag}f3" -> s"xor(_${tag}f2, _${tag}f2 >> 29)",
    s"_${tag}f4" -> mul(s"_${tag}f3", P3),
    out -> s"xor(_${tag}f4, _${tag}f4 >> 32)")

  /** Unsigned HUGEINT in [0, 2^64) -> signed 64-bit BIGINT. */
  private[ops] def toSigned(u: String): String =
    s"CAST($u - (CASE WHEN $u >= $S63 THEN CAST('$M' AS HUGEINT) ELSE 0 END) AS BIGINT)"

  /** The planted-near-dup corpus (mirrors Dedup.withPlantedNearDups;
    * Spark's cast(double as int) truncates -> trunc). */
  private val planted: String =
    """SELECT doc_id, text FROM documents
      |  UNION ALL
      |  SELECT doc_id + 1000000 AS doc_id,
      |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.9) AS INT), 1)) AS text
      |  FROM documents""".stripMargin

  /** docs CTE -> (doc_id, i, th): unsigned per-token hashes (mirrors
    * WordShingleHashes step 1: FNV-1a 64 over each lowercased token's
    * chars, then the splitmix64 finalizer). Tokenization mirrors the
    * expression's rule: whitespace runs split, and every
    * Han/Hiragana/Katakana/Hangul codepoint is its own token. The
    * expression iterates CODEPOINTS (r14) exactly as this mirror's
    * `unicode(ch)` fold does, so segmentation and per-token folds agree
    * on all planes; the corpus is lowercase ASCII-plus-BMP-CJK where
    * lower() == Character.toLowerCase.
    * Shared by the n-gram shingle chain and the unigram feature chain. */
  private def tokenHashSql(docsCte: String): String = {
    val tokFold =
      s"list_reduce(list_prepend(CAST('${u64(FnvOffset)}' AS HUGEINT), " +
        "list_transform(string_split_regex(t.tok, ''), " +
        "ch -> CAST(unicode(ch) AS HUGEINT))), " +
        s"(h, c) -> ${mul("xor(h, c)", FnvPrime)})"
    val cjkSplit =
      """string_split_regex(regexp_replace(lower(text), """ +
        """'([\p{Han}\p{Hiragana}\p{Katakana}\p{Hangul}])', ' \1 ', 'g'), '\s+')"""
    val toks =
      s"""SELECT doc_id, i, $tokFold AS fnv
         |FROM (
         |  SELECT doc_id, unnest(toks) AS tok,
         |         unnest(generate_series(1, len(toks))) AS i
         |  FROM (SELECT doc_id, list_filter($cjkSplit, x -> x <> '') AS toks
         |        FROM $docsCte) _
         |) t""".stripMargin
    stages(toks, mixSteps("fnv", "th", "tm"))
  }

  /** docs CTE -> (doc_id, i, uh): unsigned word-UNIGRAM hashes — the
    * n = 1 window of WordShingleHashes (token hash + Golden, mixed), the
    * feature hash the importance-weighting op buckets. */
  private[ops] def unigramSql(docsCte: String): String = {
    val g = Mix64.Golden
    val combine =
      Seq("x1" -> s"((th + ${u64(g)}) % $M)") ++ mixSteps("x1", "uh", "u1")
    s"SELECT doc_id, i, uh FROM (${stages(tokenHashSql(docsCte), combine)})"
  }

  /** docs CTE -> (doc_id, si, bh): unsigned word-BIGRAM hashes — the
    * n = 2 window of WordShingleHashes (the positioned-mix combine of
    * each adjacent token pair), position si = the 1-based index of the
    * pair's FIRST token, so bigram si aligns with unigram rows i = si
    * (prefix) and i = si + 1 (continuation). Feeds the bigram-LM fluency
    * oracle ([[Fluency]]). */
  private[ops] def bigramSql(docsCte: String): String = {
    val tokMixed = tokenHashSql(docsCte)
    val leads =
      s"""SELECT doc_id, i AS si, th AS t0,
         |       lead(th, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1
         |FROM ($tokMixed) QUALIFY t1 IS NOT NULL""".stripMargin
    val g = Mix64.Golden
    val combine =
      Seq("x1" -> s"((t0 + ${u64(g)}) % $M)") ++
        mixSteps("x1", "h1", "g1") ++
        Seq("x2" -> s"xor(h1, (t1 + ${u64(2 * g)}) % $M)") ++
        mixSteps("x2", "bh", "g2")
    s"SELECT doc_id, si, bh FROM (${stages(leads, combine)})"
  }

  /** docs CTE -> (doc_id, si, sh): unsigned word-shingle hashes, n=3
    * (mirrors WordShingleHashes: per-token FNV-1a over lowercased chars +
    * mix, then a positioned-mix combine of each 3-token window). */
  private def shingleSql(docsCte: String): String = {
    val tokMixed = tokenHashSql(docsCte)
    val leads =
      s"""SELECT doc_id, i AS si, th AS t0,
         |       lead(th, 1) OVER (PARTITION BY doc_id ORDER BY i) AS t1,
         |       lead(th, 2) OVER (PARTITION BY doc_id ORDER BY i) AS t2
         |FROM ($tokMixed) QUALIFY t2 IS NOT NULL""".stripMargin
    val g = Mix64.Golden
    val combine =
      Seq("x1" -> s"((t0 + ${u64(g)}) % $M)") ++
        mixSteps("x1", "h1", "s1") ++
        Seq("x2" -> s"xor(h1, (t1 + ${u64(2 * g)}) % $M)") ++
        mixSteps("x2", "h2", "s2") ++
        Seq("x3" -> s"xor(h2, (t2 + ${u64(3 * g)}) % $M)") ++
        mixSteps("x3", "sh", "s3")
    s"SELECT doc_id, si, sh FROM (${stages(leads, combine)})"
  }

  /** The minhash CTE chain from a (doc_id, text) CTE to a `pairs` CTE of
    * (doc_a < doc_b, est_jaccard ≥ 0.5): 64-slot signatures via a seeds
    * cross join (one staged mix chain over shingle×seed rows), signed min
    * per slot, 16 bands of 4 joined on the slice values, signature
    * agreement / 64. Splices after a `WITH` — shared by the standalone
    * [[minhash]] oracle and the composed curate_corpus oracle
    * (`Curation.oracle`), which runs the SAME chain over its kept docs. */
  private[ops] def minhashPairCtes(docsCte: String): String = {
    val seeds = (0 until 64)
      .map(j => s"($j, CAST('${u64(42L + (j + 1) * Mix64.Golden)}' AS HUGEINT))")
      .mkString(",")
    val expanded =
      s"""SELECT s.doc_id, s.si, sd.j, xor(s.sh, sd.seed) AS xj
         |FROM shing s CROSS JOIN (SELECT * FROM (VALUES $seeds) v(j, seed)) sd""".stripMargin
    val mixed = stages(expanded, mixSteps("xj", "hj", "mh"))
    // CAST: DuckDB types bare `x / 64.0` as DECIMAL, Spark as DOUBLE
    val agree = "CAST(len(list_filter(generate_series(1, 64), i -> sa.sig[i] = sb.sig[i])) AS DOUBLE)"
    s"""shing AS (${shingleSql(docsCte)}),
       |slot AS (SELECT doc_id, j, min(${toSigned("hj")}) AS m
       |         FROM ($mixed) GROUP BY doc_id, j),
       |sig AS (SELECT doc_id, list(m ORDER BY j) AS sig FROM slot GROUP BY doc_id),
       |band AS (SELECT doc_id, j // 4 AS band, list(m ORDER BY j) AS slice
       |         FROM slot GROUP BY doc_id, j // 4),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |         FROM band a JOIN band b ON a.band = b.band AND a.slice = b.slice
       |         WHERE a.doc_id < b.doc_id),
       |pairs AS (
       |  SELECT doc_a, doc_b, $agree / 64.0 AS est_jaccard
       |  FROM cand JOIN sig sa ON sa.doc_id = doc_a JOIN sig sb ON sb.doc_id = doc_b
       |  WHERE $agree / 64.0 >= 0.5)""".stripMargin
  }

  /** The planted corpus CTE body, for oracles that compose the pair chain
    * with other per-document CTEs (keep-best policy). */
  private[ops] def plantedDocs: String = planted

  /** dedup_minhash: the pair chain over the planted-near-dup corpus. */
  lazy val minhash: String =
    s"""WITH docs2 AS ($planted),
       |${minhashPairCtes("docs2")}
       |SELECT doc_a, doc_b, est_jaccard FROM pairs
       |ORDER BY doc_a, doc_b""".stripMargin

  /** dedup_incr_minhash: probing the perturbed re-crawl (ids +1M) against
    * a stored index over the snapshot ≡ the cross-(snapshot, new) slice
    * of the SAME pair chain over snapshot ∪ new — snapshot ids sit below
    * 1M and new ids at/above it, so the slice is an id-range filter. */
  lazy val incrMinhash: String =
    s"""WITH docs2 AS ($planted),
       |${minhashPairCtes("docs2")}
       |SELECT doc_a AS snap_id, doc_b AS new_id, est_jaccard FROM pairs
       |WHERE doc_a < 1000000 AND doc_b >= 1000000
       |ORDER BY snap_id, new_id""".stripMargin

  /** eval_leakage: the cross-(train, eval) slice of the pair chain over
    * the split the entry constructs — eval membership is the
    * sample_per_group window (k=5 per lang, fifth-bucket hash order),
    * eval ids remap +3M, and the planted leak is the standard
    * perturbation of the smallest train doc at +4M. The guard's output
    * is exactly the pairs crossing the id ranges. */
  lazy val evalLeakage: String =
    s"""WITH eval_ids AS (
       |  SELECT doc_id FROM (
       |    SELECT doc_id, ROW_NUMBER() OVER (PARTITION BY lang
       |      ORDER BY ((doc_id % 1000003) * 374761393) % 1000003 DESC, doc_id) AS rn
       |    FROM documents) _ WHERE rn <= 5),
       |train AS (SELECT doc_id, text FROM documents
       |          WHERE doc_id NOT IN (SELECT doc_id FROM eval_ids)),
       |docs2 AS (
       |  SELECT doc_id, text FROM train
       |  UNION ALL
       |  SELECT doc_id + 3000000 AS doc_id, text FROM documents
       |  WHERE doc_id IN (SELECT doc_id FROM eval_ids)
       |  UNION ALL
       |  SELECT doc_id + 4000000 AS doc_id,
       |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.9) AS INT), 1)) AS text
       |  FROM train WHERE doc_id = (SELECT MIN(doc_id) FROM train)),
       |${minhashPairCtes("docs2")}
       |SELECT doc_a AS train_id, doc_b AS eval_id, est_jaccard FROM pairs
       |WHERE doc_a < 3000000 AND doc_b >= 3000000
       |ORDER BY train_id, eval_id""".stripMargin

  /** text_contamination: the same n=3 shingle-hash emulation over both
    * the corpus and the fixture benchmark (30% prefixes of every 50th
    * document), then distinct-shared-shingle counts per document — the
    * DuckDB mirror of [[TextAnalysis.contamination]]'s broadcast
    * semi-join + count. */
  lazy val contamination: String =
    s"""WITH ${contaminationCtes("documents")}
       |SELECT doc_id, n_contaminated FROM cont ORDER BY doc_id""".stripMargin

  /** The contamination emulation as spliceable CTEs ending in
    * `cont(doc_id, n_contaminated)` — ONE definition for the standalone
    * entry and the curate cascade (r17), rooted at an arbitrary
    * (doc_id, text) relation (the cascade contaminates against the
    * spam-planted corpus's own prefixes, the same fixture rule). */
  private[ops] def contaminationCtes(src: String): String =
    s"""cbench AS (
       |  SELECT doc_id,
       |         substring(text, 1, greatest(CAST(trunc(length(text) * 0.3) AS INT), 1)) AS text
       |  FROM $src WHERE doc_id % 50 = 0),
       |ccorpus AS (SELECT doc_id, text FROM $src),
       |bsh AS (SELECT DISTINCT sh FROM (${shingleSql("cbench")}) _),
       |csh AS (SELECT DISTINCT doc_id, sh FROM (${shingleSql("ccorpus")}) _),
       |cont AS (
       |  SELECT doc_id, count(*) AS n_contaminated
       |  FROM csh WHERE sh IN (SELECT sh FROM bsh)
       |  GROUP BY doc_id)""".stripMargin

  /** text_novelty: distinct-shingle document frequency over the corpus —
    * per document, how many of its distinct 3-token shingles no other
    * document contains (df = 1), with the share in integer per-mille.
    * Same n=3 shingle-hash emulation as the dedup oracles. */
  lazy val novelty: String =
    s"""WITH s AS (SELECT DISTINCT doc_id, sh FROM (${shingleSql("documents")}) _),
       |dfc AS (SELECT sh, COUNT(*) AS df FROM s GROUP BY sh)
       |SELECT s.doc_id, COUNT(*) AS n_shingles,
       |       CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_unique,
       |       CAST(SUM(CASE WHEN dfc.df = 1 THEN 1 ELSE 0 END) AS BIGINT) * 1000
       |         // COUNT(*) AS novelty_per_mille
       |FROM s JOIN dfc USING (sh)
       |GROUP BY s.doc_id ORDER BY s.doc_id""".stripMargin

  /** dedup_simhash: one more mix per shingle, 64 per-bit vote sums,
    * signature reconstruction, pigeonhole 16-bit chunk join, Hamming <= 3.
    * Arithmetic >> then & 65535 == unsigned (u >> k) % 65536 for the
    * masked low bits. */
  lazy val simhash: String = {
    val mixed = stages("SELECT doc_id, si, sh AS x0 FROM shing",
      mixSteps("x0", "mx", "sm"))
    val votes = (0 until 64)
      .map(b => s"sum(CASE WHEN (mx >> $b) % 2 = 1 THEN 1 ELSE -1 END) AS v$b")
      .mkString(", ")
    val recon = (0 until 64)
      .map(b => s"(CASE WHEN v$b > 0 THEN CAST('${u64(1L << b)}' AS HUGEINT) ELSE 0 END)")
      .mkString(" + ")
    s"""WITH docs2 AS ($planted),
       |shing AS (${shingleSql("docs2")}),
       |votes AS (SELECT doc_id, $votes FROM ($mixed) GROUP BY doc_id),
       |sig AS (SELECT doc_id, ($recon) AS u FROM votes),
       |chunked AS (SELECT doc_id, u, ci, (u >> (ci * 16)) % 65536 AS cv
       |            FROM (SELECT doc_id, u, unnest([0,1,2,3]) AS ci FROM sig) _),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.u AS ua, b.doc_id AS doc_b, b.u AS ub
       |         FROM chunked a JOIN chunked b ON a.ci = b.ci AND a.cv = b.cv
       |         WHERE a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ua, ub)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ua, ub)) <= 3
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  /** text_fingerprint: winnowing (k=8, w=4) — char 8-grams via 7 lead()
    * columns + 8 staged FNV steps + mix; per-start window min (the pick
    * VALUE is tie-rule-independent); sorted distinct picks; then the
    * XXH64(seed=42) array fold as a recursive CTE over pick index. */
  lazy val fingerprint: String = {
    val chars =
      """SELECT doc_id, unnest(generate_series(1, len(cs))) AS ci,
        |       unnest(list_transform(cs, ch -> CAST(unicode(ch) AS HUGEINT))) AS c
        |FROM (SELECT doc_id, string_split(text, '') AS cs FROM documents) _""".stripMargin
    val leads = (1 until 8)
      .map(k => s"lead(c, $k) OVER (PARTITION BY doc_id ORDER BY ci) AS c$k")
      .mkString(", ")
    val grams =
      s"""SELECT doc_id, ci AS gi, c AS c0, $leads
         |FROM ($chars) QUALIFY c7 IS NOT NULL""".stripMargin
    val fnv = Seq("g0" -> s"CAST('${u64(FnvOffset)}' AS HUGEINT)") ++
      (0 until 8).flatMap(k => Seq(
        s"gx$k" -> s"xor(g$k, c$k)",
        s"g${k + 1}" -> mul(s"gx$k", FnvPrime))) ++
      mixSteps("g8", "gh", "gm")
    val gramHashed = stages(grams, fnv)
    val foldStep = stages(
      """SELECT f.doc_id, e.k, f.acc AS acc0, e.u AS elem
        |    FROM fold f JOIN elems e ON e.doc_id = f.doc_id AND e.k = f.k + 1""".stripMargin,
      xxh64Steps("acc0", "elem", "dig", "xx"))
    s"""WITH RECURSIVE grams AS MATERIALIZED (SELECT doc_id, gi, ${toSigned("gh")} AS g FROM ($gramHashed)),
       |nwin AS MATERIALIZED (SELECT doc_id, greatest(max(gi) - 3, 1) AS last_start FROM grams GROUP BY doc_id),
       |wmins AS (SELECT g.doc_id, g.gi,
       |                 min(g.g) OVER (PARTITION BY g.doc_id ORDER BY g.gi
       |                                ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wmin
       |          FROM grams g),
       |picks AS (SELECT DISTINCT w.doc_id, w.wmin FROM wmins w
       |          JOIN nwin n ON n.doc_id = w.doc_id AND w.gi <= n.last_start),
       |fps AS MATERIALIZED (SELECT doc_id, list(wmin ORDER BY wmin) AS fp FROM picks GROUP BY doc_id),
       |elems AS MATERIALIZED (SELECT doc_id, unnest(generate_series(1, len(fp))) AS k,
       |               unnest(list_transform(fp, s -> CAST(s AS HUGEINT) + (CASE WHEN s < 0 THEN CAST('$M' AS HUGEINT) ELSE 0 END))) AS u
       |        FROM fps),
       |fold AS (
       |  SELECT doc_id, 0 AS k, CAST(42 AS HUGEINT) AS acc FROM fps
       |  UNION ALL
       |  SELECT doc_id, k, dig AS acc FROM ($foldStep)
       |),
       |digest AS (SELECT doc_id, acc FROM fold
       |           QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY k DESC) = 1)
       |SELECT f.doc_id, CAST(len(f.fp) AS INT) AS fp_size, ${toSigned("d.acc")} AS fp_digest
       |FROM fps f JOIN digest d ON d.doc_id = f.doc_id
       |ORDER BY f.doc_id""".stripMargin
  }

  /** mm_features: the media digest is a per-byte splitmix fold (recursive
    * CTE; the corpus is ASCII so bytes == codepoints), then 8 feature
    * floats f_j = float32(signed(mix(h + j)) / 2^63-1) and the running
    * double sum of their float32 squares (matches Spark's
    * `aggregate(features, 0.0D, (a, x) -> a + x * x)` left fold where
    * x * x is FLOAT arithmetic). */
  lazy val mmFeatures: String = {
    val feats = (0 until 8).flatMap { j =>
      Seq(s"fx$j" -> s"((acc + $j) % $M)") ++
        mixSteps(s"fx$j", s"fh$j", s"ff$j") ++
        Seq(s"f$j" -> s"CAST(CAST(${toSigned(s"fh$j")} AS DOUBLE) / 9223372036854775807 AS REAL)")
    }
    val sq = (0 until 8).map(j => s"CAST(f$j * f$j AS DOUBLE)").mkString(" + ")
    val foldStep = stages(
      """SELECT f.doc_id, e.i, xor(f.acc, e.c) AS x0
        |    FROM fold f JOIN elems e ON e.doc_id = f.doc_id AND e.i = f.i + 1""".stripMargin,
      mixSteps("x0", "h", "bf"))
    s"""WITH RECURSIVE base AS MATERIALIZED (
       |  SELECT doc_id, string_split(text, '') AS cs, length(text) AS n FROM documents
       |),
       |elems AS MATERIALIZED (SELECT doc_id, unnest(generate_series(1, len(cs))) AS i,
       |               unnest(list_transform(cs, ch -> CAST(unicode(ch) AS HUGEINT))) AS c
       |        FROM base),
       |fold AS (
       |  SELECT doc_id, 0 AS i, CAST(n AS HUGEINT) * ${u64(Mix64.Golden)} % $M AS acc FROM base
       |  UNION ALL
       |  SELECT doc_id, i, h AS acc FROM ($foldStep)
       |),
       |final AS (SELECT doc_id, acc FROM fold
       |          QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY i DESC) = 1),
       |featured AS (${stages("SELECT doc_id, acc FROM final", feats)})
       |SELECT d.doc_id,
       |       CAST(64 + (d.doc_id % 16) * 32 AS INT) AS width,
       |       CAST(64 + (d.doc_id % 9) * 32 AS INT) AS height,
       |       CASE d.doc_id % 3 WHEN 0 THEN 'jpeg' WHEN 1 THEN 'png' ELSE 'webp' END AS format,
       |       ROUND($sq, 6) AS feature_sq_norm
       |FROM featured f JOIN documents d ON d.doc_id = f.doc_id
       |ORDER BY d.doc_id""".stripMargin
  }
}
