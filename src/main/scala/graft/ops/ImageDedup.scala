package graft.ops

import graft.Tables
import graft.functions.Mix64
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Perceptual-hash image near-duplicate detection — the dedup modality a
  * multimodal training pipeline needs that text dedup cannot cover (r17
  * verdict #1; the LAION/DataComp pipelines run exactly this pass).
  * Beyond-reference surface (SURVEY.md §7.2 M5; the reference engine has
  * no binary/media processing at all).
  *
  * Method: dHash (difference hash) — decode the payload with the REAL
  * codec ([[Multimodal.decodeImage]]: `javax.imageio`, guarded), box-filter
  * the pixels to a 9×8 BT.709 grayscale grid, and emit 64 bits, bit
  * (y·8+x) set iff cell (x+1, y) is brighter than cell (x, y). Horizontal
  * gradients survive resizing/re-encoding, which is what makes dHash the
  * standard cheap near-dup signature for images.
  *
  * 100 TB shape: decode+hash is a pure map over the binary column (bytes
  * never shuffle); candidates come from the SAME 4×16-bit pigeonhole
  * banding the text SimHash uses ([[Dedup.hamming64Pairs]] — any pair
  * within Hamming distance 3 agrees on ≥ 1 whole chunk, so a bucket join
  * finds all of them, never all-pairs); exact bit_count verifies
  * candidates only. Undecodable payloads degrade to no signature (and so
  * no pairs), never an exception — one corrupt image must not abort the
  * pass.
  *
  * Fixture discipline (the [[Multimodal]] planting pattern): the corpus
  * carries no images, so the entry plants REAL, fully-decodable 24-bit
  * BMPs whose pixel gradients encode a rule-derived 64-bit pattern —
  * groups of four documents share a base pattern with members at planted
  * Hamming distances 2, 3 (near-dups) and ∞ (an unrelated pattern). The
  * oracle computes the rule's bits directly in HUGEINT arithmetic
  * ([[HashOracleSql]]'s splitmix emulation); the ENGINE must recover the
  * same bits from the BMP bytes through the real codec + downsample +
  * dHash chain. Every 29th document carries non-image text bytes so the
  * degradation arm is exercised AT the gate, not only in specs.
  */
object ImageDedup {

  /** dHash grid: 9 columns × 8 rows → 8 horizontal differences per row =
    * 64 bits (the published dHash shape). */
  val HashW = 9
  val HashH = 8

  /** Default pair threshold — ≤ 3 differing bits of 64. Matches the
    * 4-chunk pigeonhole recall guarantee in [[Dedup.hamming64Pairs]]. */
  val MaxHamming = 3

  // ------------------------------------------------------- real dHash

  /** Box-filter the decoded image to a [[HashW]]×[[HashH]] grid of mean
    * BT.709 luminances (row-major, top-left origin). Integer box edges
    * `cx·w/9` partition the pixel rectangle exactly for any source size;
    * a source dimension smaller than the grid degenerates to repeated
    * single-pixel boxes (never out of bounds: x0 < w and x1 ≤ w hold for
    * all w ≥ 1). */
  private[graft] def grayGrid(img: java.awt.image.BufferedImage): Array[Double] = {
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Double](HashW * HashH)
    val row = new Array[Int](w)
    // accumulate per-row (one bulk getRGB per scanline — the
    // [[Multimodal.imageFeatures]] discipline): sums(cx) collects the
    // luminance mass of the current CELL ROW band
    val sums = new Array[Double](HashW)
    val cnts = new Array[Long](HashW)
    var cy = 0
    while (cy < HashH) {
      java.util.Arrays.fill(sums, 0.0)
      java.util.Arrays.fill(cnts, 0L)
      val y0 = cy * h / HashH
      val y1 = math.max((cy + 1) * h / HashH, y0 + 1)
      var y = y0
      while (y < y1) {
        img.getRGB(0, y, w, 1, row, 0, w)
        var cx = 0
        while (cx < HashW) {
          val x0 = cx * w / HashW
          val x1 = math.max((cx + 1) * w / HashW, x0 + 1)
          var x = x0
          while (x < x1) {
            val px = row(x)
            sums(cx) += 0.2126 * ((px >> 16) & 0xFF) +
              0.7152 * ((px >> 8) & 0xFF) + 0.0722 * (px & 0xFF)
            cnts(cx) += 1
            x += 1
          }
          cx += 1
        }
        y += 1
      }
      var cx = 0
      while (cx < HashW) {
        out(cy * HashW + cx) = sums(cx) / cnts(cx)
        cx += 1
      }
      cy += 1
    }
    out
  }

  /** dHash of one payload: None when the codec rejects the bytes (the
    * degradation arm — non-images produce no signature and so no pairs). */
  private[graft] def dHash64(media: Array[Byte]): Option[Long] = {
    val img = Multimodal.decodeImage(media)
    if (img == null) None
    else {
      val g = grayGrid(img)
      var bits = 0L
      var y = 0
      while (y < HashH) {
        var x = 0
        while (x < HashW - 1) {
          if (g(y * HashW + x + 1) > g(y * HashW + x))
            bits |= 1L << (y * (HashW - 1) + x)
          x += 1
        }
        y += 1
      }
      Some(bits)
    }
  }

  /** (doc_id, media) → (doc_id, sh): the dHash signature frame — a pure
    * map (binary payloads never leave their partition). */
  def imageSigs(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.flatMap { case (id, b) => dHash64(b).map(h => (id, h)) })
      .toDF("doc_id", "sh")
  }

  /** Near-duplicate image pairs: dHash signatures, then the shared
    * pigeonhole Hamming band join. Output: doc_a < doc_b, hamming. */
  def imagePairs(media: DataFrame, maxHamming: Int = MaxHamming): DataFrame = {
    val sigs = imageSigs(media)
      // both self-join sides re-derive from here: persist two longs per
      // doc instead of decoding every image twice
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    Dedup.hamming64Pairs(sigs, maxHamming)
  }

  // ------------------------------------------- planted fixture (the rule)

  /** The planted 64-bit dHash pattern per doc_id. Groups of 4 consecutive
    * ids share a base pattern `mix((gid+1)·Golden)`; members are planted
    * at exact Hamming distances via flips in DISJOINT bit ranges (so the
    * distances cannot collapse by position collision):
    *  - m = 0: the base pattern;
    *  - m = 1: base with 2 flips in [0,21) and [21,42)  → distance 2 ✓
    *  - m = 2: base with 3 flips in [42,49), [49,56), [56,64) → distance 3 ✓
    *    (m=1 vs m=2 differ in all 5 flipped bits → distance 5, NOT a pair)
    *  - m = 3: an unrelated pattern (distance ~32, not a pair).
    * Every arithmetic step is splitmix64/wrapping-multiply — exactly the
    * chain [[HashOracleSql]] emulates in HUGEINT, so the oracle derives
    * these bits in SQL while the engine recovers them from BMP pixels. */
  private[graft] def ruleHash64(docId: Long): Long = {
    val s0 = (docId / 4 + 1) * Mix64.Golden
    val h0 = Mix64.mix(s0)
    def pos(k: Long, m: Int): Int =
      java.lang.Long.remainderUnsigned(Mix64.mix(s0 + k), m).toInt
    (docId % 4) match {
      case 0 => h0
      case 1 => h0 ^ (1L << pos(1, 21)) ^ (1L << (21 + pos(2, 21)))
      case 2 => h0 ^ (1L << (42 + pos(3, 7))) ^ (1L << (49 + pos(4, 7))) ^
        (1L << (56 + pos(5, 8)))
      case _ => Mix64.mix(s0 + 7777)
    }
  }

  /** 9×8 grayscale values realizing a 64-bit dHash pattern exactly: each
    * row starts at 128 and steps ±1 per difference bit, so cell (x+1) is
    * brighter than cell (x) iff bit (y·8+x) is set. Values stay in
    * [120, 136] — comfortably inside 8-bit range. */
  private[graft] def pixelsFromBits(bits: Long): Array[Int] = {
    val v = new Array[Int](HashW * HashH)
    var y = 0
    while (y < HashH) {
      v(y * HashW) = 128
      var x = 0
      while (x < HashW - 1) {
        val up = ((bits >>> (y * (HashW - 1) + x)) & 1L) == 1L
        v(y * HashW + x + 1) = v(y * HashW + x) + (if (up) 1 else -1)
        x += 1
      }
      y += 1
    }
    v
  }

  /** A REAL, fully-decodable 24-bit BMP (the one JDK-decodable format
    * that needs no compression stage): 14-byte file header + 40-byte
    * BITMAPINFOHEADER + bottom-up BGR rows padded to 4 bytes, grayscale
    * pixels from `gray` (row-major, top-left origin). */
  private[graft] def bmp24(w: Int, h: Int, gray: Array[Int]): Array[Byte] = {
    require(gray.length == w * h, s"gray grid must be $w x $h")
    val stride = (w * 3 + 3) & ~3
    val size = 54 + stride * h
    val bb = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put('B'.toByte).put('M'.toByte).putInt(size).putInt(0).putInt(54)
    bb.putInt(40).putInt(w).putInt(h) // positive height = bottom-up rows
    bb.putShort(1).putShort(24).putInt(0).putInt(stride * h)
    bb.putInt(2835).putInt(2835).putInt(0).putInt(0)
    var y = h - 1 // bottom-up: last image row is stored first
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = gray(y * w + x).toByte
        bb.put(v).put(v).put(v) // B, G, R — equal, so luminance == v
        x += 1
      }
      var p = w * 3
      while (p < stride) { bb.put(0.toByte); p += 1 }
      y -= 1
    }
    bb.array()
  }

  private[graft] def plantedBmpBytes(docId: Long): Array[Byte] =
    bmp24(HashW, HashH, pixelsFromBits(ruleHash64(docId)))

  /** Attach planted image payloads: every 29th doc gets the corpus's text
    * bytes (no image magic → the no-signature degradation arm at the
    * gate), everything else a real BMP encoding the rule's bits. */
  def asDhashMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes =
          if (id % 29 == 0) Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
          else plantedBmpBytes(id)
        (id, bytes)
      }
      .toDF("doc_id", "media")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "dedup_image" -> ((s, d) =>
      imagePairs(asDhashMedia(Tables.load(s, d, "documents")))))

  // --------------------------------------------------- DuckDB oracle

  private val M = "18446744073709551616" // 2^64

  /** The planting rule in HUGEINT arithmetic: seven staged splitmix
    * chains per document (base + five flip positions + the unrelated
    * pattern), bit flips via HUGEINT shifts, then the SAME pigeonhole
    * chunk join + bit_count the simhash oracle uses. The engine must
    * recover identical bits through ImageIO decode + box filter + dHash. */
  private def dedupImageSql: String = {
    import HashOracleSql.{mixSteps, mul, stages}
    val base =
      """SELECT doc_id, CAST(doc_id // 4 + 1 AS HUGEINT) AS gp,
        |       CAST(doc_id % 4 AS INT) AS m
        |FROM documents WHERE doc_id % 29 <> 0""".stripMargin
    val steps =
      Seq("s0" -> mul("gp", Mix64.Golden)) ++
        mixSteps("s0", "h0", "i0") ++
        (1 to 5).flatMap(k =>
          Seq(s"t$k" -> s"((s0 + $k) % $M)") ++ mixSteps(s"t$k", s"h$k", s"i$k")) ++
        Seq("t7" -> s"((s0 + 7777) % $M)") ++ mixSteps("t7", "h7", "i7")
    def bit(e: String) = s"(CAST(1 AS HUGEINT) << CAST($e AS INT))"
    s"""WITH seeded AS (${stages(base, steps)}),
       |sig AS (
       |  SELECT doc_id,
       |         CASE m
       |           WHEN 0 THEN h0
       |           WHEN 1 THEN xor(xor(h0, ${bit("h1 % 21")}), ${bit("21 + h2 % 21")})
       |           WHEN 2 THEN xor(xor(xor(h0, ${bit("42 + h3 % 7")}),
       |                               ${bit("49 + h4 % 7")}), ${bit("56 + h5 % 8")})
       |           ELSE h7 END AS u
       |  FROM seeded),
       |chunked AS (SELECT doc_id, u, ci, (u >> (ci * 16)) % 65536 AS cv
       |            FROM (SELECT doc_id, u, unnest([0,1,2,3]) AS ci FROM sig) _),
       |cand AS (SELECT DISTINCT a.doc_id AS doc_a, a.u AS ua, b.doc_id AS doc_b, b.u AS ub
       |         FROM chunked a JOIN chunked b ON a.ci = b.ci AND a.cv = b.cv
       |         WHERE a.doc_id < b.doc_id)
       |SELECT doc_a, doc_b, CAST(bit_count(xor(ua, ub)) AS INT) AS hamming
       |FROM cand WHERE bit_count(xor(ua, ub)) <= $MaxHamming
       |ORDER BY doc_a, doc_b""".stripMargin
  }

  val oracle: Seq[(String, String)] = Seq(
    "dedup_image" -> dedupImageSql)
}
