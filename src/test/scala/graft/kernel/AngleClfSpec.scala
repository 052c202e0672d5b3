package graft.kernel

import org.scalatest.funsuite.AnyFunSuite

/** Angle-classifier tail fixtures
  * (/root/reference/cnstd/ppocr/angle_classifier.py:52,166-168,
  * /root/reference/cnstd/ppocr/postprocess/cls_postprocess.py:29-32).
  */
class AngleClfSpec extends AnyFunSuite {

  private def crop(w: Int, h: Int)(f: (Int, Int) => Int): Array[Byte] =
    Array.tabulate(w * h)(i => f(i % w, i / w).toByte)

  test("argmax decode with first-index tie-break and the >thresh rotate rule") {
    assert(AngleClf.decide(Array(0.7, 0.3)) == AngleClf.Decision("0", 0.7, rotate = false))
    // '180' above threshold -> rotate
    assert(AngleClf.decide(Array(0.05, 0.95)) == AngleClf.Decision("180", 0.95, rotate = true))
    // '180' at exactly the threshold does NOT rotate (strict >)
    assert(!AngleClf.decide(Array(0.1, 0.9)).rotate)
    // tie -> first label (numpy argmax)
    assert(AngleClf.decide(Array(0.5, 0.5)).label == "0")
  }

  test("byte-mass classify + rotate180 round-trip") {
    val (w, h) = (8, 6)
    // top-heavy crop: upright
    val up = crop(w, h)((_, y) => if (y < h / 2) 200 else 10)
    val pUp = AngleClf.classify(up, w, h)
    assert(pUp(0) > 0.9 && !AngleClf.decide(pUp).rotate)
    // its 180-rotation is bottom-heavy: classified 180, rotated back to upright
    val down = AngleClf.rotate180(up, w, h)
    val pDown = AngleClf.classify(down, w, h)
    assert(pDown(1) > 0.9 && AngleClf.decide(pDown).rotate)
    val Seq((fixed, d)) = AngleClf.apply(Seq((down, w, h)))
    assert(d.rotate && fixed.sameElements(up), "rotate180 must be an involution")
    // zero crop reads upright
    assert(AngleClf.classify(new Array[Byte](w * h), w, h).sameElements(Array(1.0, 0.0)))
  }
}
