package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.pipeline.GenData

/** Perceptual-hash gates: the two EXACT invariances the pipeline plants
  * (uniform brightness shift, lossless container re-encode), sensitivity to
  * genuinely different scenes, and the constant-plane fixed point.
  */
class PhashSpec extends AnyFunSuite {

  private def seededLuma(w: Int, h: Int, seed: Long): Array[Byte] = {
    val rng = SplitMix64.forKey(seed, s"phash-test:$w:$h")
    Array.fill(w * h)((rng.nextInt(200) + 10).toByte)
  }

  test("uniform brightness shift leaves the hash bit-identical (integer centering)") {
    // +k for several k, on a non-multiple-of-32 plane too: the block means
    // shift by exactly k and centering cancels it before any float touches it
    for ((w, h) <- Seq((64, 96), (100, 70)); k <- Seq(1, 3, 7)) {
      val base = seededLuma(w, h, 11L)
      val shifted = base.map(b => ((b & 0xff) + k).toByte)
      assert(Phash.hash(base, w, h) == Phash.hash(shifted, w, h),
        s"shift +$k changed the hash at ${w}x$h")
    }
  }

  test("constant plane hashes to 0 (all AC coefficients zero)") {
    val flat = Array.fill(64 * 64)(77.toByte)
    assert(Phash.hash(flat, 64, 64) == 0L)
  }

  test("different scenes produce different hashes") {
    val a = Phash.hash(seededLuma(128, 128, 1L), 128, 128)
    val b = Phash.hash(seededLuma(128, 128, 2L), 128, 128)
    assert(a != b)
    assert(Phash.hex(a).length == 16)
  }

  test("near-dup payload variants (PGM / +1 PNG / BMP) collide on phash, differ in bytes") {
    // group 4 = refs 12,13,14; group 5 = refs 15,16,17
    def hashOf(id: Long): (Long, Int) = {
      val bytes = GenData.nearDupImagePayload(GenData.DefaultSeed, s"pdup-doc-$id")
      val px = Image.decode(bytes)
      val luma = Image.gray(if (px.channels == 1) Image.grayToRgb(px) else px)
      (Phash.hash(luma, px.width, px.height), bytes.length)
    }
    val g4 = (12L to 14L).map(hashOf)
    val g5 = (15L to 17L).map(hashOf)
    assert(g4.map(_._1).distinct.size == 1, s"group 4 split: ${g4.map(_._1)}")
    assert(g5.map(_._1).distinct.size == 1, s"group 5 split: ${g5.map(_._1)}")
    assert(g4.head._1 != g5.head._1, "distinct scenes collided")
    // the colliding variants are NOT byte-dups (different containers)
    assert(g4.map(_._2).distinct.size == 3, "variants should differ in encoded size")
  }

  test("JPEG round-trip variant lands within the mm7 banding radius, never exactly") {
    def hashOf(id: Long): Long = {
      val bytes = GenData.hammingDupImagePayload(GenData.DefaultSeed, s"hdup-doc-$id")
      val px = Image.decode(bytes)
      val luma = Image.gray(if (px.channels == 1) Image.grayToRgb(px) else px)
      Phash.hash(luma, px.width, px.height)
    }
    val dists = (0 until 100).map { g =>
      val base = hashOf(g * 4L) // PGM variant: the group's exact phash
      val jpeg = hashOf(g * 4L + 3)
      java.lang.Long.bitCount(base ^ jpeg)
    }
    info(s"jpeg-vs-group hamming histogram: ${dists.groupBy(identity).view.mapValues(_.size).toMap.toSeq.sorted}")
    assert(dists.max <= graft.operators.MultimodalOps.MaxImageHamming,
      s"JPEG drift exceeds the banding radius: max=${dists.max}")
    assert(dists.exists(_ > 0), "JPEG variant should NOT be an exact phash dup")
  }
}
