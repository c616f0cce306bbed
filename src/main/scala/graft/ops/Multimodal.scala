package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** One media item with opaque binary payload + typed metadata. */
case class MediaRecord(doc_id: Long, media: Array[Byte], width: Int,
    height: Int, format: String)

/** Decoded per-item features (fixed-width embedding from the decoder).
  * `decoded` = the real codec produced them (width/height are then the
  * image's actual dimensions, not the metadata's). */
case class MediaFeatures(doc_id: Long, width: Int, height: Int,
    format: String, features: Array[Float], decoded: Boolean = false)

/** Multimodal-column plumbing: image/audio/video as opaque `binary` columns
  * with typed metadata, decoded batch-wise. Beyond-reference surface
  * (SURVEY.md §7.2 M5).
  *
  * The decode step is REAL for images: `javax.imageio` (ships with the
  * JDK) decodes PNG/JPEG/GIF/BMP payloads to actual dimensions and an
  * 8-dim content feature vector (quadrant luminance + RGB means + aspect).
  * Payloads no registered reader recognizes — including the synthetic
  * corpus's stand-in bytes — fall back to the deterministic digest stub
  * (`fakeDecode`, kept as the non-image fallback and the corpus's
  * oracle-checked path). The surrounding plumbing is what matters at
  * 100 TB:
  *  - binary payloads stay columnar (parquet BYTE_ARRAY) and are never
  *    collected to the driver;
  *  - decoding runs in `mapPartitions` over batches of rows (the Scala
  *    analog of `mapInPandas` batch shape) so codec/model init amortizes
  *    once per batch, not once per row;
  *  - outputs are typed `Dataset[MediaFeatures]` with a fixed schema, so
  *    downstream similarity/dedup ops compose directly.
  */
object Multimodal {

  /** Batch size for the per-partition decode loop — the knob a real decoder
    * would tune to its codec/model (mirrors Arrow batch sizing). */
  val DecodeBatchSize = 64

  // in-memory ImageInputStream cache: ImageIO's default FileCache writes a
  // temp file per decode — pure overhead for byte-array payloads (runs once
  // per JVM at object init, i.e. once per executor)
  javax.imageio.ImageIO.setUseCache(false)

  /** Attach synthetic binary payloads + metadata to the documents table:
    * media bytes are the UTF-8 text (a deterministic stand-in for image
    * bytes); width/height/format derive from doc_id. */
  def asMedia(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id"),
      encode(col("text"), "UTF-8").as("media"),
      (lit(64) + (col("doc_id") % 16) * 32).cast("int").as("width"),
      (lit(64) + (col("doc_id") % 9) * 32).cast("int").as("height"),
      element_at(typedlit(Seq("jpeg", "png", "webp")),
        (col("doc_id") % 3 + 1).cast("int")).as("format"))

  /** Fallback for payloads that are not decodable images (the synthetic
    * corpus's UTF-8 stand-in bytes take this path): a splitmix64 digest of
    * the bytes shaped like an 8-dim feature vector — deterministic, so the
    * corpus entries stay oracle-checked (HashOracleSql emulates the chain). */
  private def fakeDecode(r: MediaRecord): MediaFeatures = {
    import graft.functions.Mix64.mix
    var h = r.media.length.toLong * 0x9E3779B97F4A7C15L
    var i = 0
    while (i < r.media.length) { h = mix(h ^ r.media(i)); i += 1 }
    val feats = Array.tabulate(8) { j =>
      (mix(h + j).toDouble / Long.MaxValue.toDouble).toFloat
    }
    MediaFeatures(r.doc_id, r.width, r.height, r.format, feats)
  }

  /** Content features of a decoded image: quadrant mean luminances (BT.709
    * weights), mean R/G/B, and aspect ratio — all in [0,1], deterministic
    * for identical pixels. The fixed 8-dim shape matches the fallback's,
    * so mixed corpora produce one uniform schema. */
  private[ops] def imageFeatures(img: java.awt.image.BufferedImage): Array[Float] = {
    val w = img.getWidth
    val h = img.getHeight
    val lum = new Array[Double](4)
    val cnt = new Array[Long](4)
    var rSum = 0.0; var gSum = 0.0; var bSum = 0.0
    // bulk row reads: per-pixel getRGB(x, y) pays a SampleModel dispatch +
    // ColorModel conversion per call — one row per conversion pass instead
    val row = new Array[Int](w)
    var y = 0
    while (y < h) {
      img.getRGB(0, y, w, 1, row, 0, w)
      var x = 0
      while (x < w) {
        val px = row(x)
        val r = (px >> 16) & 0xFF
        val g = (px >> 8) & 0xFF
        val b = px & 0xFF
        val q = (if (y * 2 >= h) 2 else 0) + (if (x * 2 >= w) 1 else 0)
        lum(q) += 0.2126 * r + 0.7152 * g + 0.0722 * b
        cnt(q) += 1
        rSum += r; gSum += g; bSum += b
        x += 1
      }
      y += 1
    }
    val n = w.toLong * h.toLong
    Array(
      (lum(0) / math.max(cnt(0), 1L) / 255.0).toFloat,
      (lum(1) / math.max(cnt(1), 1L) / 255.0).toFloat,
      (lum(2) / math.max(cnt(2), 1L) / 255.0).toFloat,
      (lum(3) / math.max(cnt(3), 1L) / 255.0).toFloat,
      (rSum / n / 255.0).toFloat,
      (gSum / n / 255.0).toFloat,
      (bSum / n / 255.0).toFloat,
      (math.min(w, h).toDouble / math.max(w, h)).toFloat)
  }

  /** Magic-byte sniff for the formats the JDK's ImageIO decodes — checked
    * BEFORE handing bytes to the codec. Probing ImageIO per record costs
    * ~30µs even for a miss (reader registry scan + stream wrapping); a
    * 4-byte signature check is free, and at 100 TB the non-image rows of a
    * mixed corpus must not pay codec-probe tax. */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 4 && (
      (b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G') || // PNG
      (b(0) == 0xFF.toByte && b(1) == 0xD8.toByte && b(2) == 0xFF.toByte) || // JPEG
      (b(0) == 'G' && b(1) == 'I' && b(2) == 'F' && b(3) == '8') ||          // GIF
      (b(0) == 'B' && b(1) == 'M'))                                          // BMP

  /** Ceiling on decoded pixel count (≈256 MB of ARGB): a tiny payload
    * whose header declares absurd dimensions must not OOM the executor at
    * BufferedImage allocation (decompression-bomb guard). */
  val MaxDecodePixels: Long = 64L * 1024 * 1024

  /** Real-codec-first decode of one record: `javax.imageio` (PNG/JPEG/
    * GIF/BMP readers ship with the JDK) yields actual dimensions +
    * content features; payloads without an image signature — or that the
    * codec rejects in ANY way — fall back to the digest. The JDK readers
    * throw more than IOException on corrupt bytes (CMMException on broken
    * ICC profiles, IndexOutOfBounds on truncated GIFs), and one bad record
    * must degrade, not abort a 100 TB job: the catch is NonFatal-wide.
    * Dimensions are read from the header BEFORE pixel allocation. */
  private[ops] def decodeOne(r: MediaRecord): MediaFeatures = {
    val img = decodeImage(r.media)
    if (img == null) fakeDecode(r)
    else MediaFeatures(r.doc_id, img.getWidth, img.getHeight, r.format,
      imageFeatures(img), decoded = true)
  }

  /** The raw guarded decode shared by the feature extractor above and the
    * perceptual-hash dedup ([[ImageDedup]]): signature sniff, header-first
    * dimension check against [[MaxDecodePixels]], NonFatal-wide catch —
    * null on anything undecodable, never an exception. */
  private[ops] def decodeImage(media: Array[Byte]): java.awt.image.BufferedImage =
    if (!looksLikeImage(media)) null
    else try {
      // the stream must close explicitly — reader.dispose() does not
      // close it, and a leaked ImageInputStream pins a file descriptor
      // per record
      val iis = javax.imageio.ImageIO.createImageInputStream(
        new java.io.ByteArrayInputStream(media))
      try {
        val readers = javax.imageio.ImageIO.getImageReaders(iis)
        if (!readers.hasNext) null
        else {
          val reader = readers.next()
          try {
            reader.setInput(iis)
            val (w, h) = (reader.getWidth(0), reader.getHeight(0))
            if (w.toLong * h > MaxDecodePixels) null else reader.read(0)
          } finally reader.dispose()
        }
      } finally iis.close()
    } catch { case scala.util.control.NonFatal(_) => null }

  /** Decode media to features, batch-wise per partition. */
  def decodeFeatures(media: DataFrame): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.as[MediaRecord].mapPartitions { it =>
      it.grouped(DecodeBatchSize).flatMap { batch =>
        // a model-based featurizer would init once here for the batch;
        // ImageIO's readers are stateless statics
        batch.map(decodeOne)
      }
    }
  }

  /** Metadata-only resize: recompute target dims preserving aspect ratio.
    * (A real pipeline would also re-encode `media` in the decode stage.) */
  def resizeMeta(media: DataFrame, maxSide: Int = 256): DataFrame = {
    val scale = least(lit(1.0),
      lit(maxSide) / greatest(col("width"), col("height")).cast("double"))
    media.withColumn("out_width", ceil(col("width") * scale).cast("int"))
      .withColumn("out_height", ceil(col("height") * scale).cast("int"))
  }

  /** Frame sampling for video-like payloads: every `stride`-th frame index
    * of a synthetic frame count — pure `sequence`/`explode`, no UDF. */
  def frameSample(media: DataFrame, stride: Int = 10): DataFrame =
    media
      .withColumn("n_frames", (col("doc_id") % 100 + 20).cast("int"))
      .withColumn("frame_idx",
        explode(expr(s"sequence(0, n_frames - 1, $stride)")))
      .select("doc_id", "n_frames", "frame_idx")

  // ------------------------------------------------------- audio/video arm

  /** Parsed container metadata for an opaque audio/video payload —
    * the multimodal-column analog of `mm_resize_meta` for the two
    * container families a crawl actually carries: `wav` (RIFF, public
    * WAVE spec), `mp4` (ISO BMFF boxes), or `unknown` (anything the
    * sniffers reject — metadata nulls, never an exception). */
  case class MediaMeta(doc_id: Long, media_kind: String,
      duration_ms: Option[Long], sample_rate: Option[Int],
      channels: Option[Int], track_count: Option[Int])

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def be32(b: Array[Byte], o: Int): Long =
    ((b(o) & 0xffL) << 24) | ((b(o + 1) & 0xffL) << 16) |
      ((b(o + 2) & 0xffL) << 8) | (b(o + 3) & 0xffL)
  private def tag(b: Array[Byte], o: Int): String =
    if (o + 4 > b.length) "" else new String(b, o, 4, java.nio.charset.StandardCharsets.US_ASCII)

  /** Header-scan of a RIFF/WAVE payload: walk chunks for `fmt ` (channels,
    * sample rate, byte rate) and `data` (declared payload size — the
    * header's own claim, which is what a metadata pass reports without
    * reading samples). duration = dataBytes · 1000 / byteRate. Any bounds
    * violation or a zero byte rate degrades to None fields. */
  private def parseWav(docId: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || tag(b, 0) != "RIFF" || tag(b, 8) != "WAVE") return None
    // Long offsets: le32 chunk sizes are unsigned, and two ~2 GB declared
    // chunks must not overflow the cursor into a negative array index —
    // the walk degrades IN-FUNCTION, never by luck of a caller's catch
    var o = 12L
    var sampleRate = -1L; var channels = -1; var byteRate = -1L; var dataSize = -1L
    while (o + 8 <= b.length && (sampleRate < 0 || dataSize < 0)) {
      val oi = o.toInt // safe: o + 8 <= b.length ≤ Int.MaxValue
      val id = tag(b, oi)
      val size = le32(b, oi + 4)
      // the chunk's OWN declared size must cover the 16 PCM-header bytes:
      // an undersized fmt chunk would otherwise read the next chunk's
      // bytes as channels/rate and could pass range validation (r14
      // advisory) — malformed fmt degrades like every other malformation
      if (id == "fmt " && size >= 16 && o + 8 + 16 <= b.length) {
        channels = le16(b, oi + 8 + 2)
        sampleRate = le32(b, oi + 8 + 4)
        byteRate = le32(b, oi + 8 + 8)
      } else if (id == "data") {
        dataSize = size // declared — the final chunk may be truncated on disk
      }
      o += 8L + size + (size & 1L) // RIFF chunks pad to even
    }
    // range-validate before narrowing: a malformed fmt chunk must yield
    // the unknown degradation, never a 'wav' row with wrapped negatives
    if (sampleRate <= 0 || sampleRate > Int.MaxValue ||
      channels <= 0 || byteRate <= 0 || dataSize < 0) None
    else Some(MediaMeta(docId, "wav", Some(dataSize * 1000L / byteRate),
      Some(sampleRate.toInt), Some(channels), None))
  }

  /** Header-scan of an ISO BMFF (MP4) payload: top-level boxes for `moov`,
    * inside it `mvhd` (version-0 layout: timescale at +20, duration at
    * +24 from the box start) and the `trak` count. Top-level boxes honor
    * the two ISO 14496-12 size escapes — `size == 1` reads the 64-bit
    * largesize that real >4 GB files use, `size == 0` means
    * box-extends-to-EOF (r14 advisory: both are VALID framings, not
    * malformations) — while a size < 8 without an escape, or a box
    * running past the buffer, stops the walk: the classic infinite-loop
    * and over-read guards for attacker-supplied containers. */
  private def parseMp4(docId: Long, b: Array[Byte]): Option[MediaMeta] = {
    if (b.length < 12 || tag(b, 4) != "ftyp") return None
    var o = 0
    var timescale = -1L; var duration = -1L; var traks = 0
    while (o + 8 <= b.length) {
      val size: Long = be32(b, o) match {
        case 1L => // largesize escape: 64-bit size follows the box type
          if (o + 16 > b.length) -1L
          else (be32(b, o + 8) << 32) | be32(b, o + 12)
        case 0L => (b.length - o).toLong // box extends to end of file
        case s => s
      }
      if (size < 16 && be32(b, o) == 1L)
        return packMp4(docId, timescale, duration, traks) // largesize must cover its own 16-byte header
      if (size < 8 || o + size > b.length) return packMp4(docId, timescale, duration, traks)
      if (tag(b, o + 4) == "moov") {
        // payload starts after the 8-byte header, +8 more when the 64-bit
        // largesize escape was used (size field 1 pushed the payload out)
        var i = o + (if (be32(b, o) == 1L) 16 else 8)
        val end = o + size.toInt
        while (i + 8 <= end) {
          val cs = be32(b, i)
          if (cs < 8 || i + cs > end) { i = end } // malformed child: stop
          else {
            tag(b, i + 4) match {
              case "mvhd" if i + 28 <= end && b(i + 8) == 0 =>
                timescale = be32(b, i + 20)
                duration = be32(b, i + 24)
              case "trak" => traks += 1
              case _ => ()
            }
            i += cs.toInt
          }
        }
      }
      o += size.toInt
    }
    packMp4(docId, timescale, duration, traks)
  }

  private def packMp4(docId: Long, timescale: Long, duration: Long,
      traks: Int): Option[MediaMeta] =
    if (timescale <= 0 || duration < 0) None
    else Some(MediaMeta(docId, "mp4", Some(duration * 1000L / timescale),
      None, None, Some(traks)))

  // ------------------------------------------------------------ image arm

  /** Parsed image-header metadata — the image twin of [[MediaMeta]]: a
    * metadata pass over an image corpus reads dimensions from the first
    * kilobyte of each payload, never the pixel data (a full ImageIO
    * decode for dimensions alone pays codec setup + IDAT inflation per
    * record — at 100 TB that is the difference between a header scan and
    * a decode job). `png` (IHDR, public PNG spec), `jpeg` (SOF marker
    * walk, ITU T.81), `gif` (logical screen descriptor, GIF87a/89a),
    * `webp` (RIFF container, all three VP8/VP8L/VP8X framings), or
    * `unknown`. */
  case class ImageMeta(doc_id: Long, image_kind: String,
      width: Option[Int], height: Option[Int], bit_depth: Option[Int],
      n_components: Option[Int])

  private def be16(b: Array[Byte], o: Int): Int =
    ((b(o) & 0xff) << 8) | (b(o + 1) & 0xff)

  /** PNG channel count per color type (spec §11.2.2): greyscale 1,
    * truecolor 3, palette 1 (indices), grey+alpha 2, truecolor+alpha 4. */
  private def pngComponents(colorType: Int): Option[Int] = colorType match {
    case 0 | 3 => Some(1)
    case 2 => Some(3)
    case 4 => Some(2)
    case 6 => Some(4)
    case _ => None
  }

  /** Header-scan of a PNG payload: the 8-byte signature, then the IHDR
    * chunk the spec requires FIRST — width/height (4-byte BE each), bit
    * depth, color type. Out-of-spec values (zero/negative dims, a depth
    * outside {1,2,4,8,16}, an unknown color type) degrade to None rather
    * than emitting a plausible-but-wrong row. */
  private def parsePng(docId: Long, b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 33) return None // signature + complete IHDR chunk
    if (!(b(0) == 0x89.toByte && b(1) == 'P' && b(2) == 'N' && b(3) == 'G' &&
        b(4) == 0x0D && b(5) == 0x0A && b(6) == 0x1A && b(7) == 0x0A)) return None
    if (be32(b, 8) != 13L || tag(b, 12) != "IHDR") return None
    val w = be32(b, 16); val h = be32(b, 20)
    val depth = b(24) & 0xff; val colorType = b(25) & 0xff
    if (w <= 0 || w > Int.MaxValue || h <= 0 || h > Int.MaxValue) return None
    if (!Set(1, 2, 4, 8, 16).contains(depth)) return None
    pngComponents(colorType).map(nc =>
      ImageMeta(docId, "png", Some(w.toInt), Some(h.toInt), Some(depth), Some(nc)))
  }

  /** SOF markers carrying frame dimensions: C0–CF except DHT (C4), the
    * reserved JPG extension (C8) and DAC (CC) — the full baseline +
    * progressive + lossless family, the same set every header sniffer
    * (libjpeg, exiftool) treats as frame headers. */
  private def isSofMarker(m: Int): Boolean =
    m >= 0xC0 && m <= 0xCF && m != 0xC4 && m != 0xC8 && m != 0xCC

  /** Header-scan of a JPEG payload: SOI, then the marker-segment walk
    * (skipping APPn/COM/quant tables — EXIF payloads ride APP1 and are
    * skipped by declared length, never parsed) until a SOF frame header
    * yields precision, height, width, component count. Fill bytes (0xFF
    * padding before a marker) are consumed per T.81 §B.1.1.2; EOI or SOS
    * before any SOF (a frame with no header) degrades to None, as does
    * any length running past the buffer. */
  private def parseJpeg(docId: Long, b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 4 || b(0) != 0xFF.toByte || b(1) != 0xD8.toByte) return None
    var o = 2
    while (o + 2 <= b.length) {
      if (b(o) != 0xFF.toByte) return None // marker desync: malformed
      var m = b(o + 1) & 0xff
      while (m == 0xFF && o + 2 < b.length) { o += 1; m = b(o + 1) & 0xff } // fill bytes
      if (m == 0xD9 || m == 0xDA) return None // EOI / scan start: no SOF seen
      if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { o += 2 } // standalone markers
      else {
        if (o + 4 > b.length) return None
        val len = be16(b, o + 2)
        if (len < 2) return None
        if (isSofMarker(m)) {
          if (o + 10 > b.length) return None // precision + h + w + ncomp
          val precision = b(o + 4) & 0xff
          val h = be16(b, o + 5); val w = be16(b, o + 7)
          val nc = b(o + 9) & 0xff
          return if (w <= 0 || h <= 0 || nc <= 0 || nc > 4) None
          else Some(ImageMeta(docId, "jpeg", Some(w), Some(h),
            Some(precision), Some(nc)))
        }
        o += 2 + len
      }
    }
    None
  }

  /** Header-scan of a GIF payload (GIF87a/GIF89a): dimensions live in the
    * logical screen descriptor right after the 6-byte signature (both
    * little-endian u16); bit depth is the LSD's color-resolution field
    * (bits 4–6 of the flags byte, value + 1 — the spec's "number of bits
    * per primary color"); components is 1 (palette indices). */
  private def parseGif(docId: Long, b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 13) return None // signature + complete LSD
    val sig = new String(b, 0, 6, java.nio.charset.StandardCharsets.US_ASCII)
    if (sig != "GIF87a" && sig != "GIF89a") return None
    val w = le16(b, 6); val h = le16(b, 8)
    if (w <= 0 || h <= 0) return None
    val colorRes = ((b(10) & 0x70) >> 4) + 1
    Some(ImageMeta(docId, "gif", Some(w), Some(h), Some(colorRes), Some(1)))
  }

  /** Header-scan of a WebP payload: the RIFF/WEBP container, then the
    * first chunk in all three public framings —
    *  - `VP8 ` (lossy, RFC 6386): 3-byte frame tag, the 9D 01 2A start
    *    code, then 14-bit LE width/height;
    *  - `VP8L` (lossless): the 2F signature byte, then width-1/height-1
    *    as consecutive 14-bit fields with an alpha flag at bit 28;
    *  - `VP8X` (extended): canvas width-1/height-1 as 24-bit LE with an
    *    alpha flag in the feature byte.
    * Depth is 8 for all (VP8 is 8-bit YUV/ARGB); components 3, or 4 when
    * the framing carries alpha. */
  private def parseWebp(docId: Long, b: Array[Byte]): Option[ImageMeta] = {
    if (b.length < 30 || tag(b, 0) != "RIFF" || tag(b, 8) != "WEBP") return None
    def meta(w: Long, h: Long, alpha: Boolean): Option[ImageMeta] =
      if (w <= 0 || h <= 0) None
      else Some(ImageMeta(docId, "webp", Some(w.toInt), Some(h.toInt),
        Some(8), Some(if (alpha) 4 else 3)))
    tag(b, 12) match {
      // chunk DATA starts at 20 (12-byte RIFF header + fourcc + size)
      case "VP8 " => // lossy: frame tag (3) + start code (3) + dims
        if (b(23) != 0x9D.toByte || b(24) != 0x01.toByte ||
          b(25) != 0x2A.toByte) None
        else meta(le16(b, 26) & 0x3FFF, le16(b, 28) & 0x3FFF, alpha = false)
      case "VP8L" =>
        if (b(20) != 0x2F.toByte) return None
        val bits = le32(b, 21)
        meta((bits & 0x3FFF) + 1, ((bits >> 14) & 0x3FFF) + 1,
          alpha = ((bits >> 28) & 1L) == 1L)
      case "VP8X" =>
        val alpha = (b(20) & 0x10) != 0
        val w = (le16(b, 24) | ((b(26) & 0xff) << 16)) + 1L
        val h = (le16(b, 27) | ((b(29) & 0xff) << 16)) + 1L
        meta(w, h, alpha)
      case _ => None
    }
  }

  /** Parse one image payload: PNG, JPEG, GIF, WebP, then the unknown
    * degradation — same contract as [[parseMediaMetaOne]]. */
  private[graft] def parseImageMetaOne(docId: Long, b: Array[Byte]): ImageMeta =
    (try parsePng(docId, b).orElse(parseJpeg(docId, b))
      .orElse(parseGif(docId, b)).orElse(parseWebp(docId, b))
     catch { case scala.util.control.NonFatal(_) => None })
      .getOrElse(ImageMeta(docId, "unknown", None, None, None, None))

  /** Image-header metadata over a (doc_id, media) frame — map-side,
    * zero shuffles, like [[mediaMeta]]. */
  def imageMeta(media: DataFrame): Dataset[ImageMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parseImageMetaOne(id, b) })
  }

  /** Deterministic planted PNG: the real signature + an IHDR chunk with
    * a CORRECT CRC32 (the framing a spec-compliant writer emits),
    * truncated before IDAT — metadata passes read headers, not pixels.
    * Dimensions/depth/color type derive from doc_id by rule. */
  private[graft] def plantedPngBytes(docId: Long): Array[Byte] = {
    val w = (16 + (docId % 32) * 8).toInt
    val h = (16 + (docId % 21) * 8).toInt
    val depth = if (docId % 2 == 0) 8 else 16
    val colorType = ((docId / 5) % 3) match {
      case 0 => 0 // greyscale
      case 1 => 2 // truecolor
      case _ => 6 // truecolor + alpha
    }
    val bb = java.nio.ByteBuffer.allocate(8 + 25) // sig + len+IHDR+13+crc
    bb.put(Array(0x89.toByte, 'P'.toByte, 'N'.toByte, 'G'.toByte,
      0x0D.toByte, 0x0A.toByte, 0x1A.toByte, 0x0A.toByte))
    bb.putInt(13); bb.put("IHDR".getBytes)
    bb.putInt(w); bb.putInt(h)
    bb.put(depth.toByte); bb.put(colorType.toByte)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte) // deflate/none/none
    val crc = new java.util.zip.CRC32()
    crc.update(bb.array(), 12, 4 + 13) // type + data, per spec
    bb.putInt(crc.getValue.toInt)
    bb.array()
  }

  /** Deterministic planted JPEG: SOI + a real APP0/JFIF segment + an
    * APP1 "EXIF" blob the walk must SKIP by declared length + SOF0 with
    * the rule's dimensions, truncated before any scan data. */
  private[graft] def plantedJpegBytes(docId: Long): Array[Byte] = {
    val w = (16 + (docId % 32) * 8).toInt
    val h = (16 + (docId % 21) * 8).toInt
    val nc = if ((docId / 5) % 2 == 0) 1 else 3
    val exifLen = 2 + 6 + (docId % 7).toInt // varies: skipping is by length
    val bb = java.nio.ByteBuffer.allocate(2 + 18 + 2 + exifLen + 10 + 3 * nc)
    bb.putShort(0xFFD8.toShort) // SOI
    bb.putShort(0xFFE0.toShort); bb.putShort(16) // APP0, len incl. itself
    bb.put("JFIF".getBytes); bb.put(0.toByte)
    bb.put(1.toByte); bb.put(1.toByte) // version 1.1
    bb.put(0.toByte); bb.putShort(72); bb.putShort(72); bb.put(0.toByte); bb.put(0.toByte)
    bb.putShort(0xFFE1.toShort); bb.putShort(exifLen.toShort) // APP1 (EXIF)
    bb.put("Exif".getBytes); bb.put(0.toByte); bb.put(0.toByte)
    bb.position(bb.position() + (exifLen - 2 - 6)) // zero filler
    bb.putShort(0xFFC0.toShort); bb.putShort((8 + 3 * nc).toShort) // SOF0
    bb.put(8.toByte) // precision
    bb.putShort(h.toShort); bb.putShort(w.toShort)
    bb.put(nc.toByte)
    var c = 0
    while (c < nc) { // component specs: id, sampling 1x1, quant table 0
      bb.put((c + 1).toByte); bb.put(0x11.toByte); bb.put(0.toByte); c += 1
    }
    bb.array()
  }

  /** Deterministic planted GIF: real GIF89a signature + logical screen
    * descriptor carrying the rule's dimensions, color resolution 8
    * (flags bits 4–6 = 7), truncated before any image descriptor. */
  private[graft] def plantedGifBytes(docId: Long): Array[Byte] = {
    val w = (16 + (docId % 32) * 8).toInt
    val h = (16 + (docId % 21) * 8).toInt
    val bb = java.nio.ByteBuffer.allocate(13).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("GIF89a".getBytes)
    bb.putShort(w.toShort); bb.putShort(h.toShort)
    bb.put(0x70.toByte) // no GCT, color resolution bits = 7 → depth 8
    bb.put(0.toByte); bb.put(0.toByte) // background, aspect
    bb.array()
  }

  /** Deterministic planted WebP: the VP8L (lossless) framing — RIFF +
    * WEBP + a VP8L chunk whose 14-bit dimension fields and alpha flag
    * carry the rule; truncated before any huffman stream. */
  private[graft] def plantedWebpBytes(docId: Long): Array[Byte] = {
    val w = (16 + (docId % 32) * 8).toInt
    val h = (16 + (docId % 21) * 8).toInt
    val alpha = (docId / 5) % 2 == 1
    val bits = (w - 1).toLong | ((h - 1).toLong << 14) |
      (if (alpha) 1L << 28 else 0L)
    val bb = java.nio.ByteBuffer.allocate(30).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(22); bb.put("WEBP".getBytes)
    bb.put("VP8L".getBytes); bb.putInt(10)
    bb.put(0x2F.toByte); bb.putInt(bits.toInt)
    bb.put(0.toByte); bb.put(0.toByte); bb.put(0.toByte);
    bb.put(0.toByte); bb.put(0.toByte)
    bb.array()
  }

  /** Attach planted image payloads: the doc_id % 5 rule walks PNG, JPEG,
    * GIF, WebP, then the corpus's text bytes (no image magic → the
    * unknown arm at the gate). */
  def asImageMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = (id % 5) match {
          case 0 => plantedPngBytes(id)
          case 1 => plantedJpegBytes(id)
          case 2 => plantedGifBytes(id)
          case 3 => plantedWebpBytes(id)
          case _ => Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, bytes)
      }
      .toDF("doc_id", "media")
  }

  /** Parse one payload: WAV, then MP4, then the unknown degradation —
    * one bad record must never abort a 100 TB metadata pass. */
  private[graft] def parseMediaMetaOne(docId: Long, b: Array[Byte]): MediaMeta =
    (try parseWav(docId, b).orElse(parseMp4(docId, b))
     catch { case scala.util.control.NonFatal(_) => None })
      .getOrElse(MediaMeta(docId, "unknown", None, None, None, None))

  /** Container metadata over a (doc_id, media) frame — map-side, batch
    * loops like [[decodeFeatures]], zero shuffles. */
  def mediaMeta(media: DataFrame): Dataset[MediaMeta] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select("doc_id", "media").as[(Long, Array[Byte])]
      .mapPartitions(_.map { case (id, b) => parseMediaMetaOne(id, b) })
  }

  // --- planted audio/video payload rule (the oracle mirrors the RULE in
  // --- SQL; the engine must recover the same numbers from the BYTES)

  /** Deterministic planted WAV: real RIFF framing carrying the rule's
    * sample rate / channels / data size; payload truncated after the
    * data header (metadata passes read headers, not samples). */
  private[graft] def plantedWavBytes(docId: Long): Array[Byte] = {
    val channels = (1 + docId % 2).toInt
    val sampleRate = (8000 * (1 + docId % 5)).toInt
    val byteRate = sampleRate * channels * 2
    val dataSize = ((docId % 50 + 1) * 1024).toInt
    val bb = java.nio.ByteBuffer.allocate(52).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(4 + 24 + 8 + dataSize); bb.put("WAVE".getBytes)
    bb.put("fmt ".getBytes); bb.putInt(16)
    bb.putShort(1); bb.putShort(channels.toShort)
    bb.putInt(sampleRate); bb.putInt(byteRate)
    bb.putShort((channels * 2).toShort); bb.putShort(16)
    bb.put("data".getBytes); bb.putInt(dataSize)
    bb.putInt(0) // first 4 sample bytes only — deliberately truncated
    bb.array()
  }

  /** Deterministic planted MP4: ftyp + moov(mvhd v0 + empty trak boxes)
    * carrying the rule's timescale/duration/track count. */
  private[graft] def plantedMp4Bytes(docId: Long): Array[Byte] = {
    val timescale = 600
    val duration = ((docId % 240) + 1) * 60
    val traks = (1 + (docId / 3) % 3).toInt
    val mvhdSize = 108 // the real v0 box size; fields past duration are zero
    val moovSize = 8 + mvhdSize + 8 * traks
    val bb = java.nio.ByteBuffer.allocate(16 + moovSize) // big-endian default
    bb.putInt(16); bb.put("ftyp".getBytes); bb.put("isom".getBytes); bb.putInt(0)
    bb.putInt(moovSize); bb.put("moov".getBytes)
    bb.putInt(mvhdSize); bb.put("mvhd".getBytes)
    bb.putInt(0) // version 0 + flags
    bb.putInt(0); bb.putInt(0) // ctime, mtime
    bb.putInt(timescale); bb.putInt(duration.toInt)
    bb.position(bb.position() + (mvhdSize - 8 - 4 - 8 - 8)) // zero remainder
    var t = 0
    while (t < traks) { bb.putInt(8); bb.put("trak".getBytes); t += 1 }
    bb.array()
  }

  /** Attach planted audio/video payloads: every third doc a WAV, every
    * third an MP4, the rest the corpus's text bytes (no container magic →
    * the unknown arm, exercised AT the gate, not only in specs). */
  def asAvMedia(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select("doc_id", "text").as[(Long, String)]
      .map { case (id, text) =>
        val bytes = (id % 3) match {
          case 0 => plantedWavBytes(id)
          case 1 => plantedMp4Bytes(id)
          // null-safe: a null text is an empty payload (still the
          // unknown arm), not a task-aborting NPE
          case _ => Option(text).getOrElse("")
            .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        }
        (id, bytes)
      }
      .toDF("doc_id", "media")
  }

  val entries: Seq[(String, (SparkSession, String) => DataFrame)] = Seq(
    "mm_features" -> ((s, d) => {
      val feats = decodeFeatures(asMedia(Tables.load(s, d, "documents")))
      feats.toDF()
        .select(col("doc_id"), col("width"), col("height"), col("format"),
          round(expr("aggregate(features, cast(0.0 as double), (a, x) -> a + x * x)"), 6)
            .as("feature_sq_norm"))
        .orderBy("doc_id")
    }),
    "mm_resize_meta" -> ((s, d) =>
      resizeMeta(asMedia(Tables.load(s, d, "documents")))
        .select("doc_id", "width", "height", "out_width", "out_height")
        .orderBy("doc_id")),
    "mm_frame_sample" -> ((s, d) =>
      frameSample(asMedia(Tables.load(s, d, "documents")))
        .orderBy("doc_id", "frame_idx")),
    // REAL container parses over planted WAV/MP4/unknown payloads: the
    // oracle knows only the planting RULE; the engine must recover the
    // same numbers from the bytes it is handed
    "mm_media_meta" -> ((s, d) =>
      mediaMeta(asAvMedia(Tables.load(s, d, "documents"))).toDF()
        .orderBy("doc_id")),
    // r15: the image twin — REAL header parses (PNG IHDR, JPEG SOF
    // marker walk incl. an APP1/EXIF skip, GIF screen descriptor,
    // WebP RIFF/VP8L) over planted payloads
    "mm_image_meta" -> ((s, d) =>
      imageMeta(asImageMedia(Tables.load(s, d, "documents"))).toDF()
        .orderBy("doc_id")),
  )

  /** Metadata derivations are plain arithmetic on doc_id; the stub
    * decoder's splitmix digest chain is emulated in HUGEINT arithmetic
    * (HashOracleSql), so even the fake-decode path is oracle-checked. */
  val oracle: Seq[(String, String)] = Seq(
    "mm_features" -> HashOracleSql.mmFeatures,
    "mm_resize_meta" ->
      """SELECT doc_id,
        |       CAST(64 + (doc_id % 16) * 32 AS INT) AS width,
        |       CAST(64 + (doc_id % 9) * 32 AS INT) AS height,
        |       CAST(CEIL((64 + (doc_id % 16) * 32) * LEAST(1.0, 256.0 / GREATEST(64 + (doc_id % 16) * 32, 64 + (doc_id % 9) * 32))) AS INT) AS out_width,
        |       CAST(CEIL((64 + (doc_id % 9) * 32) * LEAST(1.0, 256.0 / GREATEST(64 + (doc_id % 16) * 32, 64 + (doc_id % 9) * 32))) AS INT) AS out_height
        |FROM documents ORDER BY doc_id""".stripMargin,
    "mm_frame_sample" ->
      """SELECT doc_id, CAST(doc_id % 100 + 20 AS INT) AS n_frames, CAST(f AS INT) AS frame_idx
        |FROM documents, UNNEST(range(0, CAST(doc_id % 100 + 20 AS BIGINT), 10)) AS t(f)
        |ORDER BY doc_id, frame_idx""".stripMargin,
    // the planting rule in pure arithmetic — wav duration is
    // dataBytes·1000 / (rate·channels·2), mp4 duration is units·1000 /
    // timescale, both integer division exactly as the parser computes
    "mm_media_meta" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'wav' WHEN 1 THEN 'mp4'
        |            ELSE 'unknown' END AS media_kind,
        |       CASE WHEN doc_id % 3 = 0 THEN
        |              CAST(((doc_id % 50 + 1) * 1024 * 1000)
        |                   // (8000 * (1 + doc_id % 5) * (1 + doc_id % 2) * 2) AS BIGINT)
        |            WHEN doc_id % 3 = 1 THEN
        |              CAST((((doc_id % 240) + 1) * 60 * 1000) // 600 AS BIGINT)
        |       END AS duration_ms,
        |       CASE WHEN doc_id % 3 = 0
        |            THEN CAST(8000 * (1 + doc_id % 5) AS INT) END AS sample_rate,
        |       CASE WHEN doc_id % 3 = 0
        |            THEN CAST(1 + doc_id % 2 AS INT) END AS channels,
        |       CASE WHEN doc_id % 3 = 1
        |            THEN CAST(1 + (doc_id // 3) % 3 AS INT) END AS track_count
        |FROM documents ORDER BY doc_id""".stripMargin,
    // the image planting rule in pure arithmetic: the parser must
    // recover these numbers from real PNG/JPEG header BYTES
    "mm_image_meta" ->
      """SELECT doc_id,
        |       CASE CAST(doc_id % 5 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg'
        |            WHEN 2 THEN 'gif' WHEN 3 THEN 'webp'
        |            ELSE 'unknown' END AS image_kind,
        |       CASE WHEN doc_id % 5 IN (0, 1, 2, 3)
        |            THEN CAST(16 + (doc_id % 32) * 8 AS INT) END AS width,
        |       CASE WHEN doc_id % 5 IN (0, 1, 2, 3)
        |            THEN CAST(16 + (doc_id % 21) * 8 AS INT) END AS height,
        |       CASE WHEN doc_id % 5 = 0
        |            THEN CAST(CASE WHEN doc_id % 2 = 0 THEN 8 ELSE 16 END AS INT)
        |            WHEN doc_id % 5 IN (1, 2, 3) THEN CAST(8 AS INT)
        |       END AS bit_depth,
        |       CASE WHEN doc_id % 5 = 0 THEN
        |              CAST(CASE CAST((doc_id // 5) % 3 AS INT)
        |                   WHEN 0 THEN 1 WHEN 1 THEN 3 ELSE 4 END AS INT)
        |            WHEN doc_id % 5 = 1 THEN
        |              CAST(CASE WHEN (doc_id // 5) % 2 = 0 THEN 1 ELSE 3 END AS INT)
        |            WHEN doc_id % 5 = 2 THEN CAST(1 AS INT)
        |            WHEN doc_id % 5 = 3 THEN
        |              CAST(CASE WHEN (doc_id // 5) % 2 = 0 THEN 3 ELSE 4 END AS INT)
        |       END AS n_components
        |FROM documents ORDER BY doc_id""".stripMargin,
  )
}
