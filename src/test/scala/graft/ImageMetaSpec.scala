package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The image-header arm (r15): planted PNG/JPEG payloads parse to the
  * rule's numbers, REAL JDK-encoded images parse to the codec's own
  * dimensions (an independent reference implementation, not our planted
  * bytes), and every corruption class degrades to the unknown row — one
  * bad record must never abort a corpus-scale metadata pass. */
class ImageMetaSpec extends AnyFunSuite {

  test("planted PNG bytes round-trip the rule through a real IHDR parse") {
    // doc 10: w 16+(10%32)*8=96, h 16+(10%21)*8=96, depth 8 (even), color
    // type (10/5)%3=2 → truecolor+alpha → 4 components
    val m = Multimodal.parseImageMetaOne(10L, Multimodal.plantedPngBytes(10L))
    assert(m == Multimodal.ImageMeta(10L, "png", Some(96), Some(96),
      Some(8), Some(4)))
  }

  test("planted JPEG bytes round-trip the rule through a real marker walk") {
    // doc 6: w 16+6*8=64, h 16+6*8=64, precision 8, (6/5)%2=1 → 3 components
    val m = Multimodal.parseImageMetaOne(6L, Multimodal.plantedJpegBytes(6L))
    assert(m == Multimodal.ImageMeta(6L, "jpeg", Some(64), Some(64),
      Some(8), Some(3)))
  }

  test("planted GIF bytes round-trip the rule through a real LSD parse") {
    // doc 7: w 72, h 72, color resolution 7+1=8, palette → 1 component
    val m = Multimodal.parseImageMetaOne(7L, Multimodal.plantedGifBytes(7L))
    assert(m == Multimodal.ImageMeta(7L, "gif", Some(72), Some(72),
      Some(8), Some(1)))
  }

  test("planted WebP bytes round-trip the rule through a real VP8L parse") {
    // doc 8: w 80, h 80, (8/5)%2=1 → alpha → 4 components
    val m = Multimodal.parseImageMetaOne(8L, Multimodal.plantedWebpBytes(8L))
    assert(m == Multimodal.ImageMeta(8L, "webp", Some(80), Some(80),
      Some(8), Some(4)))
    // doc 3: (3/5)%2=0 → no alpha → 3 components
    val n = Multimodal.parseImageMetaOne(3L, Multimodal.plantedWebpBytes(3L))
    assert(n.n_components == Some(3), n)
  }

  test("the VP8 (lossy) and VP8X (extended) WebP framings parse too") {
    // hand-built vectors for the two framings the planting rule doesn't
    // use — real crawls carry all three
    def riff(fourcc: String, data: Array[Byte]): Array[Byte] = {
      val bb = java.nio.ByteBuffer.allocate(20 + data.length)
        .order(java.nio.ByteOrder.LITTLE_ENDIAN)
      bb.put("RIFF".getBytes); bb.putInt(12 + data.length); bb.put("WEBP".getBytes)
      bb.put(fourcc.getBytes); bb.putInt(data.length); bb.put(data)
      bb.array()
    }
    // VP8 lossy: 3-byte frame tag, 9D 01 2A start code, 14-bit LE dims
    val vp8 = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8.put(0.toByte); vp8.put(0.toByte); vp8.put(0.toByte)
    vp8.put(0x9D.toByte); vp8.put(0x01.toByte); vp8.put(0x2A.toByte)
    vp8.putShort(123.toShort); vp8.putShort(77.toShort)
    val m1 = Multimodal.parseImageMetaOne(0L, riff("VP8 ", vp8.array()))
    assert(m1 == Multimodal.ImageMeta(0L, "webp", Some(123), Some(77),
      Some(8), Some(3)))
    // VP8X: feature flags (alpha = 0x10), 3 reserved, 24-bit LE dims - 1
    val vp8x = java.nio.ByteBuffer.allocate(10).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    vp8x.put(0x10.toByte); vp8x.put(0.toByte); vp8x.put(0.toByte); vp8x.put(0.toByte)
    vp8x.put(199.toByte); vp8x.put(0.toByte); vp8x.put(0.toByte) // w-1 = 199
    vp8x.put(99.toByte); vp8x.put(0.toByte); vp8x.put(0.toByte)  // h-1 = 99
    val m2 = Multimodal.parseImageMetaOne(0L, riff("VP8X", vp8x.array()))
    assert(m2 == Multimodal.ImageMeta(0L, "webp", Some(200), Some(100),
      Some(8), Some(4)))
  }

  test("REAL codec output parses: ImageIO-encoded PNG and JPEG headers match the codec's dims") {
    // the JDK encoder is the independent reference implementation — its
    // output exercises real chunk/segment layouts our planted bytes
    // don't (IDAT, huffman/quant tables, restart-free scans)
    val img = new java.awt.image.BufferedImage(37, 21,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    val g = img.createGraphics()
    g.setColor(java.awt.Color.ORANGE); g.fillRect(0, 0, 37, 21)
    g.dispose()
    for (fmt <- Seq("png", "jpg", "gif")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
      val m = Multimodal.parseImageMetaOne(1L, bos.toByteArray)
      val kind = fmt match { case "jpg" => "jpeg"; case f => f }
      assert(m.image_kind == kind, m)
      assert(m.width == Some(37) && m.height == Some(21), m)
      if (fmt != "gif") { // GIF depth/components are palette semantics
        assert(m.bit_depth == Some(8), m)
        assert(m.n_components == Some(3), m)
      }
    }
  }

  test("corruption degrades, never throws") {
    def kind(b: Array[Byte]): String =
      Multimodal.parseImageMetaOne(0L, b).image_kind
    assert(kind(Array.empty) == "unknown")
    assert(kind("just some text".getBytes) == "unknown")
    // PNG signature but IHDR truncated mid-chunk
    assert(kind(Multimodal.plantedPngBytes(6L).take(20)) == "unknown")
    // PNG whose first chunk is not IHDR (spec violation)
    val notIhdr = Multimodal.plantedPngBytes(6L).clone()
    notIhdr(12) = 'i'.toByte
    assert(kind(notIhdr) == "unknown")
    // PNG with a zero width must not emit a plausible row
    val zeroW = Multimodal.plantedPngBytes(6L).clone()
    zeroW(16) = 0; zeroW(17) = 0; zeroW(18) = 0; zeroW(19) = 0
    assert(kind(zeroW) == "unknown")
    // PNG with an out-of-spec bit depth
    val badDepth = Multimodal.plantedPngBytes(6L).clone()
    badDepth(24) = 3
    assert(kind(badDepth) == "unknown")
    // JPEG: SOI then EOI — no frame header anywhere
    assert(kind(Array(0xFF, 0xD8, 0xFF, 0xD9).map(_.toByte)) == "unknown")
    // JPEG: scan starts before any SOF
    assert(kind(Array(0xFF, 0xD8, 0xFF, 0xDA, 0x00, 0x04, 0, 0)
      .map(_.toByte)) == "unknown")
    // JPEG whose APP1 length runs past the buffer: the walk must stop,
    // not index out of bounds
    val overrun = Multimodal.plantedJpegBytes(7L).clone()
    overrun(22) = 0x7F // APP1 declared length far past the payload
    assert(kind(overrun) == "unknown")
    // JPEG marker desync (a non-0xFF byte where a marker must start)
    val desync = Multimodal.plantedJpegBytes(7L).clone()
    desync(20) = 0x12 // clobber the APP1 marker prefix
    assert(kind(desync) == "unknown")
    // GIF signature but the LSD truncated
    assert(kind("GIF89a".getBytes) == "unknown")
    // GIF with zero width
    val zeroGif = Multimodal.plantedGifBytes(7L).clone()
    zeroGif(6) = 0; zeroGif(7) = 0
    assert(kind(zeroGif) == "unknown")
    // WebP container with an unknown first chunk
    val oddChunk = Multimodal.plantedWebpBytes(8L).clone()
    oddChunk(12) = 'X'
    assert(kind(oddChunk) == "unknown")
    // WebP VP8L without its signature byte
    val noSig = Multimodal.plantedWebpBytes(8L).clone()
    noSig(20) = 0x00
    assert(kind(noSig) == "unknown")
    // WebP VP8 lossy with a corrupt start code
    val vp8bad = new Array[Byte](30)
    System.arraycopy("RIFF".getBytes, 0, vp8bad, 0, 4)
    System.arraycopy("WEBP".getBytes, 0, vp8bad, 8, 4)
    System.arraycopy("VP8 ".getBytes, 0, vp8bad, 12, 4)
    assert(kind(vp8bad) == "unknown")
  }

  test("fill bytes before a marker are consumed per T.81 (real-writer quirk)") {
    // some encoders pad with 0xFF before the next marker; the walk must
    // treat runs of 0xFF as fill, not desync
    val base = Multimodal.plantedJpegBytes(7L)
    val padded = base.take(2) ++ Array(0xFF.toByte, 0xFF.toByte) ++ base.drop(3)
    // (insert two fill bytes between SOI and APP0's 0xFF prefix)
    val m = Multimodal.parseImageMetaOne(7L, padded)
    assert(m.image_kind == "jpeg" && m.width == Some(72), m)
  }

  test("the gate entry's planted corpus parses to the oracle rule for every arm") {
    // every residue class of the planting rule, including the unknown arm
    for (id <- 0L until 20L) {
      val bytes = (id % 5) match {
        case 0 => Multimodal.plantedPngBytes(id)
        case 1 => Multimodal.plantedJpegBytes(id)
        case 2 => Multimodal.plantedGifBytes(id)
        case 3 => Multimodal.plantedWebpBytes(id)
        case _ => s"doc text $id".getBytes("UTF-8")
      }
      val m = Multimodal.parseImageMetaOne(id, bytes)
      val expectKind = (id % 5) match {
        case 0 => "png"; case 1 => "jpeg"; case 2 => "gif"; case 3 => "webp"
        case _ => "unknown"
      }
      assert(m.image_kind == expectKind, s"doc $id: $m")
      if (id % 5 != 4) {
        assert(m.width == Some((16 + (id % 32) * 8).toInt), s"doc $id: $m")
        assert(m.height == Some((16 + (id % 21) * 8).toInt), s"doc $id: $m")
      }
    }
  }
}
