package graft.ops

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, GraftSqlBridge, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unigram-LM subword tokenization (Kudo 2018, the SentencePiece family)
  * — the OTHER production tokenizer arm beside BPE (r17 verdict #2): a
  * piece VOCABULARY with per-piece log-probabilities, Viterbi maximum-
  * likelihood segmentation as the apply path, and prune-style hard-EM
  * (Viterbi-E, count-M) training rounds. Where BPE builds tokens
  * bottom-up by merge rank, unigram starts from a substring seed vocab
  * and keeps the pieces the corpus actually uses.
  *
  * Determinism contract (every rule mirrored by the DuckDB oracle):
  *  - training dict: THE BPE sample rule ([[Bpe.sampleWordCounts]] with
  *    the codepoint spec — docs `doc_id % 5 = 0`, first 512 chars,
  *    [[Tokens.seg]] words, printable ASCII, top 4096 by (cnt DESC,
  *    w ASC)), so the two tokenizer families train on ONE dict;
  *  - seed vocab: every single character of the dict (never pruned —
  *    coverage), plus the top [[SeedMulti]] substrings of length
  *    2..[[MaxPieceLen]] by (occurrence-count DESC, piece ASC) with
  *    count ≥ 2 (occurrences weighted by word frequency, overlapping
  *    positions each count);
  *  - piece scores are INTEGER fixed-point log-probabilities:
  *    s(p) = ilog2q(c_p) − ilog2q(T) in Q16.16 — [[ilog2q]] is an exact
  *    integer square-and-shift algorithm (no floats anywhere, so DuckDB
  *    and the JVM cannot disagree in an ulp);
  *  - Viterbi: maximize Σ s(piece); an unknown SINGLE character scores
  *    [[UnkScore]] (multi-char pieces must be in vocab); tie-break =
  *    larger final-piece length, applied at every DP position;
  *  - [[Rounds]] hard-EM rounds: Viterbi-segment the dict, count piece
  *    usage (weighted), keep multi-char pieces with usage ≥ [[MinUsage]]
  *    (new count = usage) and ALL single chars (new count = usage + 1,
  *    the +1 keeping unused-coverage pieces scoreable), rescore;
  *  - ids: rank of the piece in the final vocab ordered by piece ASC
  *    (pieces are printable ASCII, so JVM and SQL orderings agree);
  *    unknown characters map to 1_000_000 + codepoint (disjoint: the
  *    vocab is ≤ [[SeedMulti]] + 95 pieces).
  *
  * The oracle unrolls ALL of it in SQL ([[trainApplyCtes]]): substring
  * seeding as a positions×lengths unnest, the ilog2q chains as staged
  * selects over a powers-of-two table (the [[HashOracleSql]] technique),
  * each Viterbi round as a recursive CTE carrying a 4-slot sliding
  * window of DP bests (the recursive term can only see the previous
  * iteration, so best(j−1..j−4) ride the row), and backtracking as a
  * second recursive CTE walking the recorded choices.
  *
  * 100 TB shape: training is ONE bounded aggregate (the ≤ 4096-row dict
  * collect — at corpus scale the same rule samples, as production
  * tokenizer training does) plus driver-side EM over the dict; apply is
  * a single codegen'd map-side expression with the model riding the plan
  * (≤ ~500 short pieces), per-word memoized — zero shuffles, no token
  * strings crossing an exchange. */
object Unigram {

  /** Longest candidate piece, in codepoints. */
  val MaxPieceLen = 4
  /** Seed-vocab bound on multi-character pieces. */
  val SeedMulti = 384
  /** EM keep threshold for multi-character pieces. */
  val MinUsage = 2
  /** Hard-EM prune rounds. */
  val Rounds = 2
  /** Fixed-point fractional bits of the integer log2. */
  val Q = 16
  private val F = 30
  /** Score of an out-of-vocab single character — worse than any real
    * piece score (|s| ≤ ilog2q(T) < 41 << 16 for any T < 2^41). */
  val UnkScore: Long = -(60L << 16)
  /** Id base for out-of-vocab characters: 1e6 + codepoint (the vocab's
    * dense ids stop far below 1e6, the codepoint ceiling is 0x10FFFF). */
  val UnkIdBase = 1000000

  // ------------------------------------------------------- integer log2

  /** floor-truncated fixed-point log2: returns r with r/2^Q ≈ log2(c),
    * computed by the classic integer square-and-shift — normalize c to a
    * 31-bit mantissa (truncating division by 2^n, deterministic), then Q
    * rounds of mantissa squaring emit one fraction bit each. Pure Long
    * arithmetic end to end; the oracle stages the identical iterations
    * in HUGEINT. */
  private[graft] def ilog2q(c: Long): Long = {
    require(c > 0, s"ilog2q of non-positive $c")
    val n = 63 - java.lang.Long.numberOfLeadingZeros(c)
    var m = if (n <= F) c << (F - n) else c >> (n - F)
    var r = n.toLong
    var i = 0
    while (i < Q) {
      val m2 = (m * m) >> F
      if (m2 >= (1L << (F + 1))) { m = m2 >> 1; r = r * 2 + 1 }
      else { m = m2; r = r * 2 }
      i += 1
    }
    r
  }

  // ------------------------------------------------------------ training

  /** Substring seed vocabulary over the dict: piece → weighted count. */
  private[graft] def seedVocab(dict: Seq[(String, Long)]): Map[String, Long] = {
    val subs = scala.collection.mutable.HashMap.empty[String, Long]
    dict.foreach { case (w, f) =>
      val n = w.length // dict is printable ASCII: chars == codepoints
      var i = 0
      while (i < n) {
        var l = 1
        while (l <= MaxPieceLen && i + l <= n) {
          val p = w.substring(i, i + l)
          subs(p) = subs.getOrElse(p, 0L) + f
          l += 1
        }
        i += 1
      }
    }
    val singles = subs.iterator.filter(_._1.length == 1).toMap
    val multis = subs.iterator
      .filter { case (p, c) => p.length > 1 && c >= 2 }
      .toSeq.sortBy { case (p, c) => (-c, p) }
      .take(SeedMulti)
    singles ++ multis
  }

  /** Counts → integer scores: s(p) = ilog2q(c_p) − ilog2q(Σc). */
  private[graft] def scoresOf(vocab: Map[String, Long]): Map[String, Long] = {
    val lgT = ilog2q(vocab.valuesIterator.sum)
    vocab.map { case (p, c) => p -> (ilog2q(c) - lgT) }
  }

  /** Viterbi segmentation of one word (CODEPOINT positions — the oracle's
    * substring() counts codepoints, and per r14 every engine-side
    * tokenizer iterates codepoints). `score(piece)` returns null for
    * out-of-vocab; an unknown single character falls back to
    * [[UnkScore]]. Tie-break: among equal sums, the larger piece length
    * wins at every position (the selection key `cand·8 + L` — exactly
    * the oracle's greatest() key, whose +2^31 offset only shifts, never
    * reorders; sums stay far inside the key's headroom for any word
    * under ~10^8 codepoints). */
  private[graft] def viterbiPieces(w: String,
      score: String => java.lang.Long): Array[String] = {
    val cps = w.codePoints.toArray
    val n = cps.length
    if (n == 0) return Array.empty
    val best = new Array[Long](n + 1)
    val choice = new Array[Int](n + 1)
    var j = 1
    while (j <= n) {
      var bestKey = Long.MinValue
      var bl = 0
      var bc = 0L
      val maxL = math.min(MaxPieceLen, j)
      var l = 1
      while (l <= maxL) {
        val piece = new String(cps, j - l, l)
        val s0 = score(piece)
        val s: Long =
          if (s0 != null) s0.longValue
          else if (l == 1) UnkScore
          else Long.MinValue
        if (s != Long.MinValue) {
          val cand = best(j - l) + s
          val key = cand * 8 + l
          if (key > bestKey) { bestKey = key; bl = l; bc = cand }
        }
        l += 1
      }
      best(j) = bc
      choice(j) = bl
      j += 1
    }
    val out = new Array[String](n) // ≤ n pieces
    var k = n
    var m = 0
    while (k > 0) {
      val l = choice(k)
      out(m) = new String(cps, k - l, l)
      m += 1
      k -= l
    }
    val res = new Array[String](m)
    var i = 0
    while (i < m) { res(i) = out(m - 1 - i); i += 1 }
    res
  }

  /** One hard-EM round: Viterbi-segment the dict under `scores`, count
    * weighted piece usage, prune/resmooth per the contract. */
  private[graft] def emRound(dict: Seq[(String, Long)],
      scores: Map[String, Long], prev: Map[String, Long]): Map[String, Long] = {
    val usage = scala.collection.mutable.HashMap.empty[String, Long]
    val get: String => java.lang.Long =
      p => scores.get(p).map(java.lang.Long.valueOf).orNull
    dict.foreach { case (w, f) =>
      viterbiPieces(w, get).foreach(p => usage(p) = usage.getOrElse(p, 0L) + f)
    }
    prev.flatMap { case (p, _) =>
      if (p.length == 1) Some(p -> (usage.getOrElse(p, 0L) + 1L))
      else usage.get(p).filter(_ >= MinUsage).map(u => p -> u)
    }
  }

  /** The trained model: pieces sorted ascending (ids = index) with their
    * final-round scores. */
  final case class Model(pieces: Array[String], scores: Array[Long])

  private[graft] def train(dict: Seq[(String, Long)]): Model = {
    var v = seedVocab(dict)
    var sc = scoresOf(v)
    var r = 0
    while (r < Rounds) {
      v = emRound(dict, sc, v)
      sc = scoresOf(v)
      r += 1
    }
    val ps = v.keysIterator.toArray.sorted
    Model(ps, ps.map(sc))
  }

  /** Sample the dict (THE BPE rule, bounded collect) and train — one
    * bounded aggregate + driver-side EM, the [[QualityClf]] inline-train
    * shape. */
  def trainedModel(spark: SparkSession, sfDir: String): Model =
    train(Bpe.sampleWordCounts(spark, sfDir, Bpe.SpecOracle))

  // ---------------------------------------------------------- expression

  /** Native Viterbi segmenter: segments with THE shared tokenizer rule
    * and ML-decodes each word against the embedded model — one map-side
    * codegen'd expression, per-word memoized like [[Bpe.BpeTokenCount]].
    * `emitIds = false` → array<string> of pieces; true → array<int> of
    * vocab ids (unknown chars at [[UnkIdBase]] + codepoint). */
  case class UnigramSegment(child: Expression, model: Model,
      emitIds: Boolean) extends UnaryExpression {
    override def dataType: DataType =
      if (emitIds) ArrayType(IntegerType, containsNull = false)
      else ArrayType(StringType, containsNull = false)
    override def prettyName: String = "unigram_segment"

    @transient private lazy val scoreMap: java.util.HashMap[String, java.lang.Long] = {
      val m = new java.util.HashMap[String, java.lang.Long](model.pieces.length * 2)
      var i = 0
      while (i < model.pieces.length) {
        m.put(model.pieces(i), model.scores(i)); i += 1
      }
      m
    }
    @transient private lazy val idMap: java.util.HashMap[String, java.lang.Integer] = {
      val m = new java.util.HashMap[String, java.lang.Integer](model.pieces.length * 2)
      var i = 0
      while (i < model.pieces.length) { m.put(model.pieces(i), i); i += 1 }
      m
    }
    // per-thread word → pieces memo (the BpeTokenCount discipline):
    // Zipfian vocabularies make most evals a hash probe; bounded clear
    @transient private lazy val memo =
      ThreadLocal.withInitial[java.util.HashMap[String, Array[String]]](
        () => new java.util.HashMap[String, Array[String]]())

    private def segWord(w: String): Array[String] = {
      val m = memo.get()
      val hit = m.get(w)
      if (hit != null) return hit
      val ps = viterbiPieces(w, scoreMap.get)
      if (m.size >= 65536) m.clear()
      m.put(w, ps)
      ps
    }

    /** Whole-row segmentation — public: generated code calls it through
      * a plan reference. */
    def segAll(in: UTF8String): GenericArrayData = {
      val words = Tokens.segString(in.toString)
      val buf = scala.collection.mutable.ArrayBuffer.empty[String]
      var wi = 0
      while (wi < words.length) { buf ++= segWord(words(wi)); wi += 1 }
      if (emitIds) {
        val ids = new Array[Any](buf.length)
        var i = 0
        while (i < buf.length) {
          val p = buf(i)
          val id = idMap.get(p)
          ids(i) = if (id != null) id.intValue else UnkIdBase + p.codePointAt(0)
          i += 1
        }
        new GenericArrayData(ids)
      } else {
        val arr = new Array[Any](buf.length)
        var i = 0
        while (i < buf.length) { arr(i) = UTF8String.fromString(buf(i)); i += 1 }
        new GenericArrayData(arr)
      }
    }

    override def nullSafeEval(in: Any): Any = segAll(in.asInstanceOf[UTF8String])

    override protected def doGenCode(
        ctx: org.apache.spark.sql.catalyst.expressions.codegen.CodegenContext,
        ev: org.apache.spark.sql.catalyst.expressions.codegen.ExprCode)
        : org.apache.spark.sql.catalyst.expressions.codegen.ExprCode = {
      val ref = ctx.addReferenceObj("unigramSeg", this, classOf[UnigramSegment].getName)
      nullSafeCodeGen(ctx, ev, c => s"${ev.value} = $ref.segAll($c);")
    }

    override protected def withNewChildInternal(c: Expression): Expression = copy(child = c)
  }

  /** Column forms. */
  def unigram_pieces(text: Column, model: Model): Column =
    GraftSqlBridge.column(UnigramSegment(GraftSqlBridge.expression(text), model, emitIds = false))
  def unigram_ids(text: Column, model: Model): Column =
    GraftSqlBridge.column(UnigramSegment(GraftSqlBridge.expression(text), model, emitIds = true))

  // -------------------------------------------------------------- entries

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    // the full segmentation under the gate: every piece of every word in
    // order (joined at the gate boundary — the s33 scalarization rule),
    // plus the count a budget sampler would spend
    "text_tokens_unigram" -> ((s, d) => {
      val model = trainedModel(s, d)
      // ONE expression evaluation per row: the count derives from the
      // same array the gate scalarizes (unlike the BPE entries, where
      // ids + count come from two INDEPENDENT expressions on purpose —
      // the oracle cross-pins their agreement; here it would just be
      // the same Viterbi run twice)
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"), unigram_pieces(col("text"), model).as("arr"))
        .select(col("doc_id"),
          array_join(col("arr"), " ").as("pieces"),
          size(col("arr")).cast("long").as("n_unigram"))
    }),
    // the trainer-facing artifact: the id sequence per document
    "text_unigram_ids" -> ((s, d) => {
      val model = trainedModel(s, d)
      Tables.load(s, d, "documents")
        .orderBy("doc_id") // r19: sort the NARROW input, then map 1:1 -- a trailing sort
        // re-executes the heavy per-row expressions in its range-sampling pass
        .select(col("doc_id"), unigram_ids(col("text"), model).as("arr"))
        .select(col("doc_id"),
          array_join(col("arr"), " ").as("ids"),
          size(col("arr")).cast("long").as("n_unigram"))
    }))

  // --------------------------------------------------------- oracle SQL

  /** The ilog2q chains for a vocab CTE `v(piece, c)` → `ugsc{tag}
    * (piece, s)`: normalize via a powers-of-two table join (n = the
    * largest e with 2^e ≤ c), then [[Q]] staged square-and-shift
    * iterations — every intermediate a real column ([[HashOracleSql]]'s
    * staging rule). One parallel 1-row chain computes ilog2q(T). */
  private def scoreCtes(vcte: String, tag: String): Seq[String] = {
    def chain(prefix: String, cexpr: String, src: String): (String, String) = {
      val nOf = s"(SELECT MAX(e) FROM ugpow WHERE p <= $cexpr)"
      var q = s"SELECT *, $nOf AS ${prefix}n, " +
        s"(CAST($cexpr AS HUGEINT) * ${1L << F}) // (SELECT p FROM ugpow WHERE e = $nOf) AS ${prefix}m0, " +
        s"CAST($nOf AS HUGEINT) AS ${prefix}r0 FROM ($src)"
      for (i <- 1 to Q) {
        q = s"SELECT *, (${prefix}m${i - 1} * ${prefix}m${i - 1}) // ${1L << F} AS ${prefix}a$i FROM ($q)"
        q = s"SELECT *, CASE WHEN ${prefix}a$i >= ${1L << (F + 1)} THEN ${prefix}a$i // 2 ELSE ${prefix}a$i END AS ${prefix}m$i, " +
          s"${prefix}r${i - 1} * 2 + CASE WHEN ${prefix}a$i >= ${1L << (F + 1)} THEN 1 ELSE 0 END AS ${prefix}r$i FROM ($q)"
      }
      (q, s"${prefix}r$Q")
    }
    val (inner, lgcol) = chain("pl", "c", s"SELECT piece, c FROM $vcte")
    val (tot, tlg) = chain("tl", "tc", s"SELECT SUM(c) AS tc FROM $vcte")
    Seq(
      s"ugt$tag AS (SELECT $tlg AS lgt FROM ($tot))",
      s"ugsc$tag AS (SELECT piece, CAST($lgcol - (SELECT lgt FROM ugt$tag) AS BIGINT) AS s FROM ($inner))")
  }

  /** One Viterbi pass over a word CTE `wcte(w, cnt, n)` with score table
    * `ugsc{sctag}` → `ugvit{tag}` (forward DP, the b0..b3 sliding window
    * of bests + the recorded choice) and `ugpath{tag}` (backtrack rows
    * (w, cnt, j, piece)). The selection key (cand + 2^31)·8 + L realizes
    * the (sum, length) tie-break in one integer max. */
  private def viterbiCtes(tag: String, wcte: String, sctag: String,
      unkOk: Boolean): Seq[String] = {
    val big = 2147483648L
    val cands = (1 to MaxPieceLen).map { l =>
      val b = s"v.b${l - 1}"
      val sexpr = if (l == 1 && unkOk) s"COALESCE(p$l.s, $UnkScore)" else s"p$l.s"
      s"COALESCE(CASE WHEN v.i + 1 >= $l AND $b IS NOT NULL AND $sexpr IS NOT NULL " +
        s"THEN ($b + $sexpr + $big) * 8 + $l END, -1)"
    }
    val key = cands.mkString("greatest(", ", ", ")")
    val joins = (1 to MaxPieceLen).map(l =>
      s"      LEFT JOIN ugsc$sctag p$l ON v.i + 1 >= $l AND p$l.piece = substring(v.w, v.i + 2 - $l, $l)")
      .mkString("\n")
    Seq(
      s"""ugvit$tag AS (
         |  SELECT w, cnt, n, 0 AS i, CAST(0 AS BIGINT) AS b0,
         |         CAST(NULL AS BIGINT) AS b1, CAST(NULL AS BIGINT) AS b2,
         |         CAST(NULL AS BIGINT) AS b3, 0 AS chl
         |  FROM $wcte
         |  UNION ALL
         |  SELECT v.w, v.cnt, v.n, v.i + 1,
         |         CAST($key // 8 - $big AS BIGINT) AS b0,
         |         v.b0 AS b1, v.b1 AS b2, v.b2 AS b3,
         |         CAST($key % 8 AS INT) AS chl
         |  FROM ugvit$tag v
         |$joins
         |  WHERE v.i < v.n)""".stripMargin,
      s"""ugpath$tag AS (
         |  SELECT w, cnt, n AS j, CAST(NULL AS VARCHAR) AS piece FROM $wcte WHERE n > 0
         |  UNION ALL
         |  SELECT p.w, p.cnt, p.j - v.chl AS j,
         |         substring(p.w, p.j - v.chl + 1, v.chl) AS piece
         |  FROM ugpath$tag p JOIN ugvit$tag v ON v.w = p.w AND v.i = p.j
         |  WHERE p.j > 0)""".stripMargin)
  }

  /** The whole train+apply emulation: seed → scores → [[Rounds]] EM
    * rounds (each a Viterbi pass + usage recount + prune + rescore) →
    * Viterbi over DISTINCT corpus words with the final scores → join
    * back to per-document word occurrences. Ends at
    * `ugdocp(doc_id, pieces)` (+ `ugid` for the ids entry). */
  private def trainApplyCtes: Seq[String] = {
    val toksSample = Tokens.duckToks("substring(text, 1, 512)")
    val toksFull = Tokens.duckToks("text")
    val head = Seq(
      "ugpow AS (SELECT e, CAST(2 AS HUGEINT) ** e AS p FROM (SELECT unnest(generate_series(0, 62)) AS e))",
      s"""ugsample AS MATERIALIZED (
         |  SELECT w, COUNT(*) AS cnt FROM (
         |    SELECT unnest($toksSample) AS w
         |    FROM documents WHERE doc_id % 5 = 0) _
         |  WHERE regexp_matches(w, '^[!-~]+${"$"}')
         |  GROUP BY w ORDER BY cnt DESC, w LIMIT 4096)""".stripMargin,
      s"""ugsubs AS MATERIALIZED (
         |  SELECT piece, SUM(cnt) AS c FROM (
         |    SELECT substring(w, i, L) AS piece, cnt
         |    FROM (SELECT w, cnt, length(w) AS n,
         |                 unnest(generate_series(1, length(w))) AS i FROM ugsample) _,
         |         (SELECT unnest(generate_series(1, $MaxPieceLen)) AS L) ll
         |    WHERE i + L - 1 <= n) _
         |  GROUP BY piece)""".stripMargin,
      s"""ugv0 AS MATERIALIZED (
         |  SELECT piece, c FROM ugsubs WHERE length(piece) = 1
         |  UNION ALL
         |  SELECT piece, c FROM (
         |    SELECT piece, c FROM ugsubs WHERE length(piece) > 1 AND c >= 2
         |    ORDER BY c DESC, piece LIMIT $SeedMulti) _)""".stripMargin) ++
      scoreCtes("ugv0", "0") :+
      "ugwd AS MATERIALIZED (SELECT w, cnt, length(w) AS n FROM ugsample)"
    val rounds = (1 to Rounds).flatMap { r =>
      viterbiCtes(s"r$r", "ugwd", s"${r - 1}", unkOk = false) ++ Seq(
        s"""uguse$r AS MATERIALIZED (
           |  SELECT piece, CAST(SUM(cnt) AS BIGINT) AS u FROM ugpathr$r
           |  WHERE piece IS NOT NULL GROUP BY piece)""".stripMargin,
        s"""ugv$r AS MATERIALIZED (
           |  SELECT v.piece, COALESCE(u.u, 0) + 1 AS c
           |  FROM ugv${r - 1} v LEFT JOIN uguse$r u USING (piece) WHERE length(v.piece) = 1
           |  UNION ALL
           |  SELECT v.piece, u.u AS c
           |  FROM ugv${r - 1} v JOIN uguse$r u USING (piece)
           |  WHERE length(v.piece) > 1 AND u.u >= $MinUsage)""".stripMargin) ++
        scoreCtes(s"ugv$r", s"$r")
    }
    val apply = Seq(
      s"""ugcw AS MATERIALIZED (
         |  SELECT w, CAST(1 AS BIGINT) AS cnt, length(w) AS n FROM (
         |    SELECT DISTINCT unnest($toksFull) AS w FROM documents WHERE text IS NOT NULL) _)""".stripMargin) ++
      viterbiCtes("ap", "ugcw", s"$Rounds", unkOk = true) ++ Seq(
        """ugseg AS MATERIALIZED (
          |  SELECT w, list(piece ORDER BY j) AS pieces
          |  FROM ugpathap WHERE piece IS NOT NULL GROUP BY w)""".stripMargin,
        s"ugid AS (SELECT piece, CAST(ROW_NUMBER() OVER (ORDER BY piece) - 1 AS INT) AS id FROM ugv$Rounds)",
        s"""ugwords AS (
           |  SELECT doc_id, wi, t[wi] AS w FROM (
           |    SELECT doc_id, t, unnest(generate_series(1, len(t))) AS wi
           |    FROM (SELECT doc_id, $toksFull AS t FROM documents) _) _)""".stripMargin,
        """ugdocp AS (
          |  SELECT o.doc_id, flatten(list(s.pieces ORDER BY o.wi)) AS pieces
          |  FROM ugwords o JOIN ugseg s ON s.w = o.w
          |  GROUP BY o.doc_id)""".stripMargin)
    head ++ rounds ++ apply
  }

  val oracle: Seq[(String, String)] = Seq(
    "text_tokens_unigram" ->
      s"""WITH RECURSIVE
         |${trainApplyCtes.mkString(",\n")}
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(p.pieces, CAST([] AS VARCHAR[])), ' ') END AS pieces,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(p.pieces), 0) AS BIGINT) END AS n_unigram
         |FROM documents d LEFT JOIN ugdocp p USING (doc_id)
         |ORDER BY doc_id""".stripMargin,
    "text_unigram_ids" ->
      s"""WITH RECURSIVE
         |${trainApplyCtes.mkString(",\n")},
         |ugdoci AS (
         |  SELECT x.doc_id,
         |         list(COALESCE(g.id, $UnkIdBase + unicode(x.pc)) ORDER BY x.k) AS ids
         |  FROM (SELECT doc_id, unnest(pieces) AS pc,
         |               unnest(generate_series(1, len(pieces))) AS k FROM ugdocp) x
         |  LEFT JOIN ugid g ON g.piece = x.pc
         |  GROUP BY x.doc_id)
         |SELECT d.doc_id,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE array_to_string(COALESCE(i.ids, CAST([] AS INT[])), ' ') END AS ids,
         |       CASE WHEN d.text IS NULL THEN NULL
         |            ELSE CAST(COALESCE(len(i.ids), 0) AS BIGINT) END AS n_unigram
         |FROM documents d LEFT JOIN ugdoci i USING (doc_id)
         |ORDER BY doc_id""".stripMargin)
}
