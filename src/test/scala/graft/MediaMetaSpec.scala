package graft

import graft.ops.Multimodal
import org.scalatest.funsuite.AnyFunSuite

/** The audio/video container arm: planted payloads parse to the rule's
  * numbers, and EVERY corruption class degrades to the unknown row (or
  * drops the malformed fields) instead of throwing — one bad record must
  * never abort a corpus-scale metadata pass. */
class MediaMetaSpec extends AnyFunSuite {

  test("planted WAV bytes round-trip the rule through a real RIFF parse") {
    val m = Multimodal.parseMediaMetaOne(6L, Multimodal.plantedWavBytes(6L))
    // doc 6: channels 1, rate 8000·(1+1)=16000, data (6%50+1)·1024=7168,
    // byteRate 32000 → 7168·1000/32000 = 224 ms
    assert(m == Multimodal.MediaMeta(6L, "wav", Some(224L), Some(16000),
      Some(1), None))
  }

  test("planted MP4 bytes round-trip the rule through a real box walk") {
    val m = Multimodal.parseMediaMetaOne(7L, Multimodal.plantedMp4Bytes(7L))
    // doc 7: duration units (7%240+1)·60 = 480 at timescale 600 → 800 ms;
    // traks 1 + (7/3)%3 = 3
    assert(m == Multimodal.MediaMeta(7L, "mp4", Some(800L), None, None,
      Some(3)))
  }

  test("corruption degrades, never throws") {
    def kind(b: Array[Byte]): String = Multimodal.parseMediaMetaOne(0L, b).media_kind
    // empty / tiny / text payloads
    assert(kind(Array.empty) == "unknown")
    assert(kind(Array[Byte](1, 2, 3)) == "unknown")
    assert(kind("just some text".getBytes) == "unknown")
    // truncated WAV: magic present, fmt chunk cut off mid-header
    assert(kind(Multimodal.plantedWavBytes(6L).take(20)) == "unknown")
    // RIFF with an absurd chunk size must not walk out of bounds
    val bad = Multimodal.plantedWavBytes(6L).clone()
    bad(16) = 0xFF.toByte; bad(17) = 0xFF.toByte
    bad(18) = 0xFF.toByte; bad(19) = 0x7F.toByte // fmt size = Int.MaxValue-ish
    assert(Multimodal.parseMediaMetaOne(0L, bad).media_kind != null) // no throw
    // undersized fmt chunk (declared size 8 < the 16 PCM-header bytes):
    // the old walk read the NEXT chunk's bytes as channels/rate — must
    // degrade to unknown, never a plausible-but-wrong 'wav' row
    val shortFmt = Multimodal.plantedWavBytes(6L).clone()
    shortFmt(16) = 8; shortFmt(17) = 0; shortFmt(18) = 0; shortFmt(19) = 0
    assert(kind(shortFmt) == "unknown")
    // MP4 whose moov claims to extend past the buffer: fields recovered so
    // far are kept, the walk stops at the boundary
    val over = Multimodal.plantedMp4Bytes(7L).take(40) // mvhd cut mid-box
    assert(Multimodal.parseMediaMetaOne(0L, over).media_kind == "unknown")
  }

  test("ISO BMFF size escapes: largesize (size==1) and to-EOF (size==0) are valid framings") {
    // size==0: the box extends to end-of-file (ISO 14496-12) — the planted
    // moov IS the last top-level box, so zeroing its size field must parse
    // to the SAME metadata, not degrade (and must not loop forever)
    val toEof = Multimodal.plantedMp4Bytes(7L).clone()
    toEof(16) = 0; toEof(17) = 0; toEof(18) = 0; toEof(19) = 0
    assert(Multimodal.parseMediaMetaOne(7L, toEof) ==
      Multimodal.MediaMeta(7L, "mp4", Some(800L), None, None, Some(3)))
    // size==1: the 64-bit largesize escape real >4 GB files use — rebuild
    // the planted moov under it (size field 1, type, then the 64-bit size;
    // children shift out by 8) and expect the same metadata
    val planted = Multimodal.plantedMp4Bytes(7L)
    val moov = planted.drop(16) // the moov box: size(4) type(4) children…
    val bb = java.nio.ByteBuffer.allocate(16 + 8 + moov.length)
    bb.put(planted.take(16)) // ftyp unchanged
    bb.putInt(1); bb.put("moov".getBytes)
    bb.putLong(moov.length + 8L) // largesize covers its own 16-byte header
    bb.put(moov.drop(8)) // children verbatim
    assert(Multimodal.parseMediaMetaOne(7L, bb.array()) ==
      Multimodal.MediaMeta(7L, "mp4", Some(800L), None, None, Some(3)))
    // a largesize escape whose 64-bit size can't fit its own header, or a
    // buffer too short to even hold the largesize field: stop, degrade
    val shortLarge = bb.array().take(20) // cut mid-largesize
    assert(Multimodal.parseMediaMetaOne(0L, shortLarge).media_kind == "unknown")
    val tinyLarge = bb.array().clone()
    tinyLarge(24) = 0; tinyLarge(25) = 0; tinyLarge(26) = 0; tinyLarge(27) = 0
    tinyLarge(28) = 0; tinyLarge(29) = 0; tinyLarge(30) = 0; tinyLarge(31) = 8
    assert(Multimodal.parseMediaMetaOne(0L, tinyLarge).media_kind == "unknown")
  }

  test("header fields are range-validated before narrowing; the chunk walk never overflows") {
    // fmt declares sampleRate 0x80000000 (2^31, unsigned LE) — passes a
    // Long > 0 check but wraps negative as Int: must degrade to unknown,
    // never emit a 'wav' row with sample_rate = -2147483648
    val wrapped = Multimodal.plantedWavBytes(6L).clone()
    wrapped(24) = 0; wrapped(25) = 0; wrapped(26) = 0; wrapped(27) = 0x80.toByte
    val m = Multimodal.parseMediaMetaOne(6L, wrapped)
    assert(m.media_kind == "unknown" && m.sample_rate.isEmpty, m.toString)
    // two chunks each declaring ~1.2e9 bytes: the cumulative cursor must
    // not wrap negative (Long offsets), the walk just runs off the buffer
    // and degrades — no exception even when parseWav is called directly
    val bb = java.nio.ByteBuffer.allocate(44).order(java.nio.ByteOrder.LITTLE_ENDIAN)
    bb.put("RIFF".getBytes); bb.putInt(36); bb.put("WAVE".getBytes)
    bb.put("junk".getBytes); bb.putInt(1200000000)
    bb.put(new Array[Byte](20))
    val big = Multimodal.parseMediaMetaOne(0L, bb.array())
    assert(big.media_kind == "unknown")
  }

  test("the planted corpus parses end-to-end with all three arms live") {
    val spark = TestSpark.spark
    val docs = graft.Tables.load(spark, TestSpark.Sf0001, "documents")
    val metas = Multimodal.mediaMeta(Multimodal.asAvMedia(docs)).collect()
    val byKind = metas.groupBy(_.media_kind).view.mapValues(_.length).toMap
    assert(byKind.keySet == Set("wav", "mp4", "unknown"),
      s"all three arms must be exercised at the gate: $byKind")
    // wav rows carry audio fields only; mp4 rows track_count only
    assert(metas.filter(_.media_kind == "wav")
      .forall(m => m.sample_rate.isDefined && m.channels.isDefined &&
        m.duration_ms.isDefined && m.track_count.isEmpty))
    assert(metas.filter(_.media_kind == "mp4")
      .forall(m => m.track_count.isDefined && m.duration_ms.isDefined &&
        m.sample_rate.isEmpty))
    assert(metas.filter(_.media_kind == "unknown")
      .forall(m => m.duration_ms.isEmpty && m.sample_rate.isEmpty &&
        m.channels.isEmpty && m.track_count.isEmpty))
  }
}
