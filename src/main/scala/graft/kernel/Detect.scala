package graft.kernel

import graft.schema.{Params, RRegion, Region, Vocab}

/** The three detection stages, re-expressed as pure JVM kernels over decoded
  * payloads. Each returns the stage's region list after its own filters and
  * the shared sort+dedup tail (Order.finalize).
  */
object Detect {

  /** Full extraction for one media payload. */
  def extract(payload: Array[Byte]): Seq[Region] = Payload.decode(payload) match {
    case Payload.ProbMap(w, h, cells, off)      => Order.finalize(std(cells, off, w, h))
    case Payload.Candidates(stage, w, h, cands) => Order.finalize(yolo(stage, w, h, cands))
  }

  /** Production wrapper: a missing (null) or corrupt payload yields zero
    * regions instead of failing the task — at 10^12 docs corrupt rows are a
    * certainty and must not kill a range. Callers count drops via the
    * returned flag.
    */
  def extractSafe(payload: Array[Byte]): (Seq[Region], Boolean) =
    if (payload == null) (Nil, true)
    else try (extract(payload), false)
    catch { case scala.util.control.NonFatal(_) => (Nil, true) }

  /** Scene-text detection tail of the DBNet path:
    * binarize > bin_thresh (/root/reference/cnstd/model/core.py:121) →
    * morphological open, k = 1 + H/512 (core.py:124-130) →
    * connected components (/root/reference/cnstd/model/base.py:115-117) →
    * min-extent filter (base.py:112-122) → rect-mean score + box_thresh
    * (core.py:92-99, base.py:124-132) → unclip ratio 1.5 (base.py:61,74-98) →
    * post-unclip min-size (base.py:141-144) → clip → final score/size filters
    * (core.py:222-225) → REVERSED emission order (core.py:234).
    */
  def std(cells: Array[Byte], off: Int, w: Int, h: Int): Seq[Region] =
    std(cells, off, w, h, scoreSlow = false)

  /** @param scoreSlow the `score_mode` toggle
    *   (/root/reference/cnstd/ppocr/postprocess/db_postprocess.py:47-50):
    *   'fast' (default) scores the bounding rect mean; 'slow' scores the mean
    *   over the filled component polygon (db_postprocess.py:151-170) —
    *   tighter for non-rectangular components whose bounding rect is mostly
    *   background.
    */
  def std(cells: Array[Byte], off: Int, w: Int, h: Int, scoreSlow: Boolean): Seq[Region] = {
    val bitmap = Bitmap.thresholdBits(cells, off, w * h, Params.BinThresh)
    val k = 1 + h / 512
    val opened = Bitmap.morphOpenBits(bitmap, w, h, k)
    val minSizeBox = 1 + h / 512
    val comps =
      if (scoreSlow) Bitmap.connectedComponentsPixels(opened, w, h, Params.MaxCandidates)
        .map(c => (Bitmap.Component(c.xMin, c.yMin, c.xMax, c.yMax), c.pixels))
      else Bitmap.connectedComponents(opened, w, h, Params.MaxCandidates).map(c => (c, null))
    val out = comps.flatMap { case (c, pixels) =>
      // contour max-min per axis (inclusive extent) must reach min_size_box
      if (c.xMax - c.xMin < minSizeBox || c.yMax - c.yMin < minSizeBox) None
      else {
        // boundingRect semantics: x,y,w,h with w = xMax-xMin+1
        val bx = c.xMin; val by = c.yMin
        val bw = c.xMax - c.xMin + 1; val bh = c.yMax - c.yMin + 1
        // fast: score over points [[x,y],[x,y+h],[x+w,y+h],[x+w,y]] → inclusive
        // rect [x .. x+w] x [y .. y+h], clipped (core.py:92-99)
        val score =
          if (scoreSlow) Rotated.scoreSlow(cells, off, pixels)
          else Bitmap.rectMean(cells, off, w, h, bx, by, bx + bw, by + bh)
        if (score < Params.BoxThresh) None
        else {
          val (ux0, uy0, ux1, uy1) = Geom.unclipRect(bx, by, bx + bw, by + bh, Params.UnclipRatio)
          if (ux1 - ux0 < minSizeBox || uy1 - uy0 < minSizeBox) None
          else {
            val (cx0, cy0, cx1, cy1) = Geom.clip(ux0, uy0, ux1, uy1, w, h)
            // final filters (core.py:222-225): score >= 0.3 (implied by 0.6
            // above) and min side >= min_box_size
            if (math.min(cx1 - cx0, cy1 - cy0) < Params.MinBoxSize) None
            else Some(Region(Vocab.StdKind, cx0, cy0, cx1, cy1, score))
          }
        }
      }
    }
    out.reverse
  }

  /** Rotated-path STD tail (`rotated_bbox=True`, the reference DEFAULT —
    * /root/reference/cnstd/cn_std.py:49):
    * same binarize → open → CCL → min-extent front as std, then per component
    * (/root/reference/cnstd/model/base.py:100-173 rotated branches):
    * rotated objectness over the filled component (core.py:100-105) →
    * box_thresh filter → min-area rect (`fit_rbbox`, geometry.py:39-41) →
    * closed-form round-joint unclip at ratio 2.2 (base.py:61,74-98) →
    * post-unclip min-size filter on (w, h) (base.py:141-144) →
    * coordinate clip (base.py:166-168: np.clip of x,y,w,h; alpha kept) →
    * REVERSED emission (core.py:234).
    */
  def stdRotated(cells: Array[Byte], off: Int, w: Int, h: Int): Seq[RRegion] = {
    val bitmap = Bitmap.thresholdBits(cells, off, w * h, Params.BinThresh)
    val k = 1 + h / 512
    val opened = Bitmap.morphOpenBits(bitmap, w, h, k)
    val minSizeBox = 1 + h / 512
    val comps = Bitmap.connectedComponentsPixels(opened, w, h, Params.MaxCandidates)
    val out = comps.flatMap { c =>
      if (c.xMax - c.xMin < minSizeBox || c.yMax - c.yMin < minSizeBox) None
      else {
        val score = Rotated.scoreRotated(cells, off, c.pixels)
        if (score < Params.BoxThresh) None
        else {
          val (hx, hy) = Rotated.convexHull(c.pixels, w)
          val r = Rotated.minAreaRect(hx, hy)
          val d = Rotated.offsetDistance(hx, hy, Params.UnclipRatioRotated)
          val gw = r.w + 2 * d
          val gh = r.h + 2 * d
          if (gw < minSizeBox || gh < minSizeBox) None
          else {
            def clampD(v: Double, hi: Double) = math.min(math.max(v, 0.0), hi)
            Some(RRegion(Vocab.StdKind,
              clampD(r.cx, w), clampD(r.cy, h), clampD(gw, w), clampD(gh, h),
              r.alpha, score))
          }
        }
      }
    }
    out.reverse
  }

  /** YOLO-style tail shared by MFD and layout:
    * conf filter (/root/reference/cnstd/yolov7/general.py:597-614) →
    * cxcywh → xyxy (general.py:636-641) → per-class greedy NMS at IoU 0.45
    * with the class-offset trick replaced by an explicit class check
    * (general.py:660-667) → max_det cap (general.py:666-667) →
    * reversed iteration (/root/reference/cnstd/yolov7/layout_analyzer.py:315) →
    * round + margin expand + clip (layout_analyzer.py:313,332-338).
    */
  def yolo(stage: Int, w: Int, h: Int, cands: Seq[Payload.Candidate]): Seq[Region] = {
    val categories = Vocab.categories(stage)
    val passed = cands.filter(_.conf > Params.ConfThresh)
    if (passed.isEmpty) return Nil
    // stable sort by confidence desc (ties keep input order), cap max_nms
    val sorted = passed.zipWithIndex
      .sortBy { case (c, i) => (-c.conf, i) }
      .map(_._1)
      .take(Params.MaxNms)
    val boxes = sorted.map { c =>
      (c.cls,
        c.cx - c.w / 2.0, c.cy - c.h / 2.0,
        c.cx + c.w / 2.0, c.cy + c.h / 2.0,
        c.conf.toDouble)
    }
    val keep = Array.fill(boxes.length)(true)
    val kept = scala.collection.mutable.ArrayBuffer.empty[Int]
    var i = 0
    while (i < boxes.length && kept.length < Params.MaxDet) {
      if (keep(i)) {
        kept += i
        val (ci, ax0, ay0, ax1, ay1, _) = boxes(i)
        var j = i + 1
        while (j < boxes.length) {
          if (keep(j)) {
            val (cj, bx0, by0, bx1, by1, _) = boxes(j)
            if (ci == cj && iouD(ax0, ay0, ax1, ay1, bx0, by0, bx1, by1) > Params.NmsIouThresh)
              keep(j) = false
          }
          j += 1
        }
      }
      i += 1
    }
    // reversed(det): emit in ascending-confidence order (layout_analyzer.py:315)
    kept.toSeq.reverse.map { idx =>
      val (cls, x0, y0, x1, y1, conf) = boxes(idx)
      // scale_coords(...).round() uses round-half-even (torch.round)
      val rx0 = math.rint(x0).toInt; val ry0 = math.rint(y0).toInt
      val rx1 = math.rint(x1).toInt; val ry1 = math.rint(y1).toInt
      val (ex0, ey0, ex1, ey1) = Geom.clip(
        rx0 - Params.BoxMargin, ry0 - Params.BoxMargin,
        rx1 + Params.BoxMargin, ry1 + Params.BoxMargin, w, h)
      val kind = if (cls >= 0 && cls < categories.length) categories(cls) else s"cls_$cls"
      Region(kind, ex0, ey0, ex1, ey1, conf)
    }
  }

  private def iouD(ax0: Double, ay0: Double, ax1: Double, ay1: Double,
                   bx0: Double, by0: Double, bx1: Double, by1: Double): Double = {
    val iw = math.min(ax1, bx1) - math.max(ax0, bx0)
    val ih = math.min(ay1, by1) - math.max(ay0, by0)
    if (iw <= 0 || ih <= 0) 0.0
    else {
      val inter = iw * ih
      val union = (ax1 - ax0) * (ay1 - ay0) + (bx1 - bx0) * (by1 - by0) - inter
      if (union <= 0) 0.0 else inter / union
    }
  }
}
