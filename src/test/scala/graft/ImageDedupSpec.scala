package graft

import graft.ops.ImageDedup
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Perceptual-hash image near-dedup: the REAL decode chain (ImageIO BMP
  * codec → box-filter grayscale → dHash) must recover exactly the
  * rule-planted bits, the downsample must be scale-invariant on
  * block-constant images, corruption must degrade to no signature, and
  * the pair pipeline must find exactly the planted Hamming-≤3 pairs. */
class ImageDedupSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("dHash of a planted BMP recovers the rule bits through the real codec") {
    for (id <- 0L to 40L) {
      val got = ImageDedup.dHash64(ImageDedup.plantedBmpBytes(id))
      assert(got.contains(ImageDedup.ruleHash64(id)), s"doc $id")
    }
  }

  test("planted members sit at the designed Hamming distances") {
    for (gid <- 0L to 20L) {
      val h = (0 to 3).map(m => ImageDedup.ruleHash64(gid * 4 + m))
      assert(java.lang.Long.bitCount(h(0) ^ h(1)) == 2, s"gid $gid m0-m1")
      assert(java.lang.Long.bitCount(h(0) ^ h(2)) == 3, s"gid $gid m0-m2")
      assert(java.lang.Long.bitCount(h(1) ^ h(2)) == 5, s"gid $gid m1-m2")
    }
  }

  test("box-filter downsample is exact on a 2x-scaled block image") {
    // an 18×16 BMP whose 2×2 blocks repeat the 9×8 planted values must
    // hash identically to the 9×8 original — the resize-survival property
    // dHash exists for
    val bits = ImageDedup.ruleHash64(5L)
    val small = ImageDedup.pixelsFromBits(bits)
    val big = Array.tabulate(18 * 16) { i =>
      val x = i % 18; val y = i / 18
      small((y / 2) * 9 + (x / 2))
    }
    val bmp = ImageDedup.bmp24(18, 16, big)
    assert(ImageDedup.dHash64(bmp).contains(bits))
  }

  test("undecodable payloads degrade to no signature, never an exception") {
    assert(ImageDedup.dHash64("not an image".getBytes("UTF-8")).isEmpty)
    assert(ImageDedup.dHash64(Array.emptyByteArray).isEmpty)
    // a truncated BMP: real signature, body cut mid-pixel-data
    val cut = ImageDedup.plantedBmpBytes(3L).take(60)
    assert(ImageDedup.dHash64(cut).isEmpty)
    // header declaring absurd dimensions must hit the pixel-count guard
    val bomb = ImageDedup.plantedBmpBytes(3L).clone()
    val bb = java.nio.ByteBuffer.wrap(bomb).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.putInt(18, 1 << 30); bb.putInt(22, 1 << 30) // width, height
    assert(ImageDedup.dHash64(bomb).isEmpty)
  }

  test("imagePairs finds exactly the planted near-dup pairs on a small corpus") {
    import spark.implicits._
    // 3 full groups (ids 0..11) + the text arm (id 0 % 29 == 0 is TEXT,
    // so group 0 loses its m=0 pairs) — expectation derived from the rule
    val docs = (0L to 11L).map(id => (id, s"text body $id")).toDF("doc_id", "text")
    val got = ImageDedup.imagePairs(ImageDedup.asDhashMedia(docs))
      .as[(Long, Long, Int)].collect().toSet
    val expected = Set(
      // group 0: m=0 (id 0) is the text arm → only its (1,2) distance-5
      // non-pair remains absent; groups 1 and 2 keep both planted pairs
      (4L, 5L, 2), (4L, 6L, 3),
      (8L, 9L, 2), (8L, 10L, 3))
    assert(got == expected)
    spark.sharedState.cacheManager.clearCache()
  }

  test("engine and oracle agree on the sf0.001 corpus") {
    val d = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("dedup_image")(spark, d)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    // the oracle side is exercised by the driver; here pin the ENGINE
    // result against the rule computed directly in Scala (same chain the
    // HUGEINT SQL mirrors): all planted pairs, nothing else
    val n = spark.read.parquet(s"$d/documents.parquet").count()
    val ids = (0L until n).filter(_ % 29 != 0)
    val sigs = ids.map(id => id -> ImageDedup.ruleHash64(id)).toMap
    val expected = (for {
      a <- ids; b <- ids if a < b
      h = java.lang.Long.bitCount(sigs(a) ^ sigs(b)) if h <= 3
    } yield (a, b, h)).toSeq
    assert(got.sorted == expected.sorted)
    spark.sharedState.cacheManager.clearCache()
  }
}
