package graft.kernel

import graft.kernel.Resize.Img
import graft.kernel.Rotated.RBox

/** Crop-extraction kernels: straight slices (P10,
  * /root/reference/cnstd/utils/_utils.py:30-56 `extract_crops`) and rotated
  * crops via min-area-rect → affine warp to horizontal (P11,
  * _utils.py:59-159 `extract_rcrops` with its vertical-box special case).
  * The warp is an exact 3-point affine solve + inverse-mapped bilinear
  * sampling (cv2.getAffineTransform + warpAffine(INTER_LINEAR) analog,
  * zero-filled outside the source).
  */
object Crop {

  /** P10: absolute-pixel axis-aligned crop `img[y0:y1, x0:x1]`, clamped. */
  def extractCrop(img: Img, x0: Int, y0: Int, x1: Int, y1: Int): Img = {
    val cx0 = math.max(0, math.min(img.w, x0))
    val cx1 = math.max(cx0, math.min(img.w, x1))
    val cy0 = math.max(0, math.min(img.h, y0))
    val cy1 = math.max(cy0, math.min(img.h, y1))
    val w = cx1 - cx0
    val h = cy1 - cy0
    val out = new Array[Byte](w * h)
    var y = 0
    while (y < h) {
      System.arraycopy(img.cells, (cy0 + y) * img.w + cx0, out, y * w, w)
      y += 1
    }
    Img(out, w, h)
  }

  /** 2x3 affine M mapping three (src -> dst) point pairs —
    * cv2.getAffineTransform analog (exact linear solve via Cramer).
    */
  def affineFrom3(src: Array[(Double, Double)], dst: Array[(Double, Double)]): Array[Double] = {
    require(src.length == 3 && dst.length == 3)
    val (x0, y0) = src(0); val (x1, y1) = src(1); val (x2, y2) = src(2)
    val det = x0 * (y1 - y2) - y0 * (x1 - x2) + (x1 * y2 - x2 * y1)
    require(math.abs(det) > 1e-12, "degenerate source triangle")
    def solve(u0: Double, u1: Double, u2: Double): (Double, Double, Double) = {
      // solve a*x + b*y + c = u at the three points
      val a = (u0 * (y1 - y2) - y0 * (u1 - u2) + (u1 * y2 - u2 * y1)) / det
      val b = (x0 * (u1 - u2) - u0 * (x1 - x2) + (x1 * u2 - x2 * u1)) / det
      val c = (x0 * (y1 * u2 - y2 * u1) - y0 * (x1 * u2 - x2 * u1) + u0 * (x1 * y2 - x2 * y1)) / det
      (a, b, c)
    }
    val (a00, a01, a02) = solve(dst(0)._1, dst(1)._1, dst(2)._1)
    val (a10, a11, a12) = solve(dst(0)._2, dst(1)._2, dst(2)._2)
    Array(a00, a01, a02, a10, a11, a12)
  }

  /** warpAffine(INTER_LINEAR) analog: invert the forward 2x3 matrix and
    * bilinear-sample the source at each destination pixel; 0 outside.
    */
  def warpAffine(img: Img, m: Array[Double], outW: Int, outH: Int): Img = {
    val det = m(0) * m(4) - m(1) * m(3)
    require(math.abs(det) > 1e-12, "non-invertible affine")
    val i00 = m(4) / det; val i01 = -m(1) / det
    val i10 = -m(3) / det; val i11 = m(0) / det
    val i02 = -(i00 * m(2) + i01 * m(5))
    val i12 = -(i10 * m(2) + i11 * m(5))
    val out = new Array[Byte](outW * outH)
    var y = 0
    while (y < outH) {
      var x = 0
      while (x < outW) {
        val sx = i00 * x + i01 * y + i02
        val sy = i10 * x + i11 * y + i12
        val x0 = math.floor(sx).toInt
        val y0 = math.floor(sy).toInt
        if (x0 >= -1 && x0 < img.w && y0 >= -1 && y0 < img.h) {
          val wx = sx - x0
          val wy = sy - y0
          def at(xx: Int, yy: Int): Double =
            if (xx < 0 || xx >= img.w || yy < 0 || yy >= img.h) 0.0
            else (img.cells(yy * img.w + xx) & 0xff).toDouble
          val v = (at(x0, y0) * (1 - wx) + at(x0 + 1, y0) * wx) * (1 - wy) +
            (at(x0, y0 + 1) * (1 - wx) + at(x0 + 1, y0 + 1) * wx) * wy
          out(y * outW + x) = math.rint(v).toInt.toByte
        }
        x += 1
      }
      y += 1
    }
    Img(out, outW, outH)
  }

  /** P11: rotated crop — warp the min-area rect to a patch, mirroring
    * `extract_rcrops`'s two handlers exactly (_utils.py:59-160):
    *
    *  - vertical-box routing (_utils.py:84-86): near-axis angles with a 1.3x
    *    elongated short side go to `_process_vertical_box`, the rest to
    *    `_process_horizontal_box`;
    *  - inside EACH handler the dst triangle and output dims are chosen by
    *    `clockwise = w > h` (_utils.py:101-103,133-135): clockwise-horizontal
    *    and nonclockwise-vertical emit an untransposed w x h patch,
    *    the other two branches emit the 90-degree-rotated h x w patch;
    *  - the horizontal handler first normalizes `alpha > 80 and w < h`
    *    (_utils.py:98-100, the opencv>=4.5.2 convention): alpha -= 90 with a
    *    w/h swap — on cv2.boxPoints that rotates the corner labels by one
    *    position, i.e. the (tl,tr,br) triangle becomes (bl,tl,tr) of the
    *    ORIGINAL box.
    *
    * The reference takes src points `cv2.boxPoints(...)[1:]`; cv2's order is
    * (bl, tl, tr, br), so src = (tl, tr, br) = indices (0, 1, 2) of
    * Rotated.boxPoints' frozen (tl, tr, br, bl) order.
    */
  def extractRCrop(img: Img, box: RBox): Img = {
    val vertical =
      (math.abs(box.alpha) < 3 && box.w * 1.3 < box.h) ||
        (90 - math.abs(box.alpha) < 3 && box.w > box.h * 1.3)
    val pts = Rotated.boxPoints(box) // (tl, tr, br, bl) in the box's own frame
    if (!vertical) {
      // _process_horizontal_box: normalize alpha>80 & w<h (labels rotate one
      // position: (tl,tr,br) of the relabeled box = (bl,tl,tr) of the original)
      val (src, w, h) =
        if (box.alpha > 80 && box.w < box.h) (Array(pts(3), pts(0), pts(1)), box.h, box.w)
        else (Array(pts(0), pts(1), pts(2)), box.w, box.h)
      warpBranch(img, src, w, h, clockwise = w > h)
    } else {
      // _process_vertical_box: no normalization; branch sense is inverted
      // relative to the horizontal handler (clockwise -> transposed patch)
      warpBranch(img, Array(pts(0), pts(1), pts(2)), box.w, box.h, clockwise = !(box.w > box.h))
    }
  }

  /** Shared warp tail of the two handlers: `clockwise = true` maps
    * (tl, tr, br) -> (0,0), (w-1,0), (w-1,h-1) into a w x h patch
    * (_utils.py:104-109,124); `false` maps onto the rotated triangle
    * (0,w-1), (0,0), (h-1,0) into an h x w patch (_utils.py:110-120,126).
    */
  private def warpBranch(img: Img, src: Array[(Double, Double)],
                         w: Double, h: Double, clockwise: Boolean): Img =
    if (clockwise) {
      val m = affineFrom3(src, Array((0.0, 0.0), (w - 1, 0.0), (w - 1, h - 1)))
      warpAffine(img, m, math.max(1, w.toInt), math.max(1, h.toInt))
    } else {
      val m = affineFrom3(src, Array((0.0, w - 1), (0.0, 0.0), (h - 1, 0.0)))
      warpAffine(img, m, math.max(1, h.toInt), math.max(1, w.toInt))
    }
}
