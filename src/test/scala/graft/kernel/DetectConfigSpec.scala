package graft.kernel

import org.scalatest.funsuite.AnyFunSuite
import graft.schema.DetectConfig

/** Fixtures for the round-3 DetectConfig surface: PP `use_dilation`
  * (db_postprocess.py:52-53,182-187), `use_angle_clf` (cn_std.py:190-199),
  * and the `cropped_img` render analog (cn_std.py:148-169).
  */
class DetectConfigSpec extends AnyFunSuite {

  /** Solid-255 rectangles on a zero map. */
  private def mapWith(w: Int, h: Int)(rects: (Int, Int, Int, Int)*): Array[Byte] = {
    val cells = new Array[Byte](w * h)
    rects.foreach { case (x0, y0, x1, y1) =>
      for (y <- y0 to y1; x <- x0 to x1) cells(y * w + x) = 255.toByte
    }
    cells
  }

  test("use_dilation bridges a 1px gap into one component; off-path keeps two") {
    val (w, h) = (64, 32)
    // two 10x12 rects separated by the single empty column x=20
    val cells = mapWith(w, h)((10, 10, 19, 21), (21, 10, 30, 21))
    val off = Detect.std(cells, 0, w, h, DetectConfig())
    assert(off.length == 2, s"expected two regions without dilation, got $off")
    val on = Detect.std(cells, 0, w, h, DetectConfig(useDilation = true))
    assert(on.length == 1, s"dilation must bridge the 1px gap, got $on")
    // the bridged box spans both rects
    assert(on.head.x0 <= off.map(_.x0).min && on.head.x1 >= off.map(_.x1).max)
  }

  test("dilateBits frozen anchor: OR of self, left, up, up-left") {
    val (w, h) = (8, 8)
    val cells = mapWith(w, h)((3, 3, 3, 3)) // single pixel at (3,3)
    val bits = Bitmap.thresholdBits(cells, 0, w * h, 0.3)
    val d = Bitmap.dilateBits(bits, w, h)
    def isSet(x: Int, y: Int): Boolean = (d((y * w + x) >>> 6) >> ((y * w + x) & 63) & 1L) == 1L
    val set = for (y <- 0 until h; x <- 0 until w if isSet(x, y)) yield (x, y)
    assert(set.toSet == Set((3, 3), (4, 3), (3, 4), (4, 4)))
  }

  test("renderCrops appends the crop digest; useAngleClf flips a bottom-heavy crop") {
    val (w, h) = (64, 32)
    // blob hugging the bottom border; unclip ratio 6 stretches the box far
    // above it, so the crop's top half is all zeros -> prob(180) = 1 > 0.9
    val cells = mapWith(w, h)((10, 24, 29, 31))
    val payload = Payload.encodeProbMap(w, h, cells)
    val base = DetectConfig(renderCrops = true, unclipRatioOverride = Some(6.0))
    val plain = Detect.extractRendered(payload, base)
    assert(plain.nonEmpty && plain.forall(_._2.contains(";crop=")), s"no digest in $plain")
    val flipped = Detect.extractRendered(payload, base.copy(useAngleClf = true))
    assert(plain.map(_._2) != flipped.map(_._2),
      "angle-clf must rotate the bottom-heavy crop and change its digest")
    // dims are unchanged by the in-place 180 rotation
    def dims(s: String) = s.split(";crop=")(1).split(":")(0)
    assert(plain.map(t => dims(t._2)) == flipped.map(t => dims(t._2)))
    // coordinates (the prefix before the crop suffix) are clf-invariant
    def prefix(s: String) = s.split(";crop=")(0)
    assert(plain.map(t => prefix(t._2)) == flipped.map(t => prefix(t._2)))
  }

  test("useAngleClf leaves an upright (top-heavy) crop untouched") {
    val (w, h) = (64, 32)
    val cells = mapWith(w, h)((10, 0, 29, 7)) // blob hugging the TOP border
    val payload = Payload.encodeProbMap(w, h, cells)
    val base = DetectConfig(renderCrops = true, unclipRatioOverride = Some(6.0))
    val plain = Detect.extractRendered(payload, base)
    val clf = Detect.extractRendered(payload, base.copy(useAngleClf = true))
    assert(plain.nonEmpty && plain == clf, "upright crops must not be rotated")
  }

  test("rotated path renders crop digests through extract_rcrops") {
    val (w, h) = (64, 32)
    val cells = mapWith(w, h)((12, 10, 35, 21))
    val payload = Payload.encodeProbMap(w, h, cells)
    val cfg = DetectConfig(rotatedBbox = true, renderCrops = true)
    val out = Detect.extractRendered(payload, cfg)
    assert(out.nonEmpty && out.forall(_._2.contains(";crop=")), s"no rotated digest in $out")
    // without renderCrops the rotated render is the plain 5-field rbbox text
    val bare = Detect.extractRendered(payload, DetectConfig(rotatedBbox = true))
    assert(bare.forall(!_._2.contains(";crop=")))
    assert(bare.map(t => t._2) == out.map(t => t._2.split(";crop=")(0)))
  }
}
