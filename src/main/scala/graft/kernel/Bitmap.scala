package graft.kernel

/** Per-image bitmap kernels: binarization, morphological opening, connected
  * components. All within-row compute over one payload — never a distributed
  * structure (one image is one row; H*W is bounded by the payload codec).
  */
object Bitmap {

  /** `proba_map > bin_thresh` (/root/reference/cnstd/model/core.py:121).
    * Compared in float32, as numpy does when broadcasting a scalar threshold
    * against a float32 map.
    */
  def threshold(probs: Array[Float], thresh: Double): Array[Boolean] = {
    val t = thresh.toFloat
    val out = new Array[Boolean](probs.length)
    var i = 0
    while (i < probs.length) { out(i) = probs(i) > t; i += 1 }
    out
  }

  /** Morphological opening (erosion then dilation) with a k x k all-ones kernel
    * anchored at (k/2, k/2), zero-padded borders — the semantics of
    * `cv2.morphologyEx(MORPH_OPEN, ones(k,k))` (/root/reference/cnstd/model/core.py:124-130,
    * k = 1 + H/512). k == 1 is the identity.
    */
  def morphOpen(bm: Array[Boolean], w: Int, h: Int, k: Int): Array[Boolean] = {
    if (k <= 1) return bm
    val a = k / 2
    val eroded = window(bm, w, h, k, a, and = true)
    window(eroded, w, h, k, a, and = false)
  }

  private def window(bm: Array[Boolean], w: Int, h: Int, k: Int, a: Int, and: Boolean): Array[Boolean] = {
    val out = new Array[Boolean](bm.length)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        var acc = and
        var dy = -a
        while (dy < k - a) {
          var dx = -a
          while (dx < k - a) {
            val yy = y + dy
            val xx = x + dx
            // out-of-bounds reads as false (zero padding)
            val v = yy >= 0 && yy < h && xx >= 0 && xx < w && bm(yy * w + xx)
            acc = if (and) acc && v else acc || v
            dx += 1
          }
          dy += 1
        }
        out(y * w + x) = acc
        x += 1
      }
      y += 1
    }
    out
  }

  /** A connected component's inclusive pixel-bounding box. */
  final case class Component(xMin: Int, yMin: Int, xMax: Int, yMax: Int)

  /** 8-connected component labeling via BFS flood fill, components emitted in
    * row-major first-pixel order. Replaces `cv2.findContours(RETR_EXTERNAL)` +
    * `cv2.boundingRect` (/root/reference/cnstd/model/base.py:115-117): we only
    * need each component's bounding box, not its contour polygon, on the
    * axis-aligned path. Capped at `max` components
    * (/root/reference/cnstd/ppocr/postprocess/db_postprocess.py:37,71).
    */
  def connectedComponents(bm: Array[Boolean], w: Int, h: Int, max: Int): Seq[Component] = {
    val visited = new Array[Boolean](bm.length)
    val out = scala.collection.mutable.ArrayBuffer.empty[Component]
    val stack = new java.util.ArrayDeque[Integer]()
    var start = 0
    while (start < bm.length && out.length < max) {
      if (bm(start) && !visited(start)) {
        var xMin = Int.MaxValue; var yMin = Int.MaxValue
        var xMax = Int.MinValue; var yMax = Int.MinValue
        visited(start) = true
        stack.push(start)
        while (!stack.isEmpty) {
          val p = stack.pop().intValue()
          val px = p % w
          val py = p / w
          if (px < xMin) xMin = px
          if (px > xMax) xMax = px
          if (py < yMin) yMin = py
          if (py > yMax) yMax = py
          var dy = -1
          while (dy <= 1) {
            var dx = -1
            while (dx <= 1) {
              val ny = py + dy
              val nx = px + dx
              if (ny >= 0 && ny < h && nx >= 0 && nx < w) {
                val np = ny * w + nx
                if (bm(np) && !visited(np)) {
                  visited(np) = true
                  stack.push(np)
                }
              }
              dx += 1
            }
            dy += 1
          }
        }
        out += Component(xMin, yMin, xMax, yMax)
      }
      start += 1
    }
    out.toSeq
  }

  /** Mean probability over the inclusive rect [x0..x1] x [y0..y1], clipped to
    * bounds — `box_score` fast path (/root/reference/cnstd/model/core.py:92-99).
    */
  def rectMean(probs: Array[Float], w: Int, h: Int, x0: Int, y0: Int, x1: Int, y1: Int): Double = {
    val cx0 = math.min(math.max(x0, 0), w - 1)
    val cx1 = math.min(math.max(x1, 0), w - 1)
    val cy0 = math.min(math.max(y0, 0), h - 1)
    val cy1 = math.min(math.max(y1, 0), h - 1)
    var sum = 0.0
    var n = 0
    var y = cy0
    while (y <= cy1) {
      var x = cx0
      while (x <= cx1) {
        sum += probs(y * w + x)
        n += 1
        x += 1
      }
      y += 1
    }
    if (n == 0) 0.0 else sum / n
  }
}
