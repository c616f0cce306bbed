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
    // doc 6: w 16+(6%32)*8=64, h 16+(6%21)*8=64, depth 8 (even), color
    // type (6/3)%3=2 → truecolor+alpha → 4 components
    val m = Multimodal.parseImageMetaOne(6L, Multimodal.plantedPngBytes(6L))
    assert(m == Multimodal.ImageMeta(6L, "png", Some(64), Some(64),
      Some(8), Some(4)))
  }

  test("planted JPEG bytes round-trip the rule through a real marker walk") {
    // doc 7: w 16+7*8=72, h 16+7*8=72, precision 8, (7/3)%2=0 → 1 component
    val m = Multimodal.parseImageMetaOne(7L, Multimodal.plantedJpegBytes(7L))
    assert(m == Multimodal.ImageMeta(7L, "jpeg", Some(72), Some(72),
      Some(8), Some(1)))
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
    for (fmt <- Seq("png", "jpg")) {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt encoder")
      val m = Multimodal.parseImageMetaOne(1L, bos.toByteArray)
      assert(m.image_kind == (if (fmt == "png") "png" else "jpeg"), m)
      assert(m.width == Some(37) && m.height == Some(21), m)
      assert(m.bit_depth == Some(8), m)
      assert(m.n_components == Some(3), m)
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
    for (id <- 0L until 12L) {
      val bytes = (id % 3) match {
        case 0 => Multimodal.plantedPngBytes(id)
        case 1 => Multimodal.plantedJpegBytes(id)
        case _ => s"doc text $id".getBytes("UTF-8")
      }
      val m = Multimodal.parseImageMetaOne(id, bytes)
      val expectKind = (id % 3) match {
        case 0 => "png"; case 1 => "jpeg"; case _ => "unknown"
      }
      assert(m.image_kind == expectKind, s"doc $id: $m")
      if (id % 3 != 2) {
        assert(m.width == Some((16 + (id % 32) * 8).toInt), s"doc $id: $m")
        assert(m.height == Some((16 + (id % 21) * 8).toInt), s"doc $id: $m")
      }
    }
  }
}
