package graft.kernel

/** Angle-classifier tail (`use_angle_clf=True`, opt-in public API —
  * /root/reference/cnstd/cn_std.py:190-199): each detected crop is
  * classified between labels ['0', '180']
  * (/root/reference/cnstd/ppocr/angle_classifier.py:53) and rotated
  * in-place by 180 degrees when the label contains '180' AND the score
  * beats clf_thresh = 0.9 (angle_classifier.py:52,166-168). The decode is
  * argmax over the 2-class probabilities
  * (/root/reference/cnstd/ppocr/postprocess/cls_postprocess.py:29-32).
  *
  * The neural classifier itself is replaced (north rule) by a deterministic
  * byte-mass probe: upright synthetic crops carry more mass in the top half,
  * so prob(180) = bottomMass / totalMass. The decision tail — argmax,
  * threshold, '180'-in-label rotate rule — is the reference's, bit for bit.
  */
object AngleClf {
  final val Labels: IndexedSeq[String] = IndexedSeq("0", "180")
  final val ClfThresh = 0.9

  /** One classified crop: label, score, whether the rotate rule fired. */
  final case class Decision(label: String, score: Double, rotate: Boolean)

  /** ClsPostProcess.__call__ (cls_postprocess.py:29-32): argmax, first index
    * wins ties (numpy argmax), plus the rotate rule (angle_classifier.py:166-168).
    */
  def decide(probs: Array[Double], thresh: Double = ClfThresh): Decision = {
    var best = 0
    var i = 1
    while (i < probs.length) { if (probs(i) > probs(best)) best = i; i += 1 }
    val label = Labels(best)
    val score = probs(best)
    Decision(label, score, label.contains("180") && score > thresh)
  }

  /** Deterministic 2-class probabilities from crop bytes (stand-in for the
    * ONNX forward pass): [topMass, bottomMass] / total. Empty or zero crops
    * read as upright with probability 1.
    */
  def classify(crop: Array[Byte], w: Int, h: Int): Array[Double] = {
    var top = 0L
    var bottom = 0L
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val v = (crop(y * w + x) & 0xff).toLong
        if (y < h / 2) top += v else bottom += v
        x += 1
      }
      y += 1
    }
    val total = top + bottom
    if (total == 0) Array(1.0, 0.0)
    else Array(top.toDouble / total, bottom.toDouble / total)
  }

  /** cv2.rotate(img, ROTATE_180) analog: reverse both axes in place-free copy. */
  def rotate180(crop: Array[Byte], w: Int, h: Int): Array[Byte] = {
    val out = new Array[Byte](crop.length)
    var i = 0
    val n = w * h
    while (i < n) { out(n - 1 - i) = crop(i); i += 1 }
    out
  }

  /** Full pass over a list of crops (angle_classifier.py:120-172, minus the
    * aspect-ratio batching trick, which only reorders NN batches and cannot
    * change results here): classify, rotate the ones the rule fires on.
    */
  def apply(crops: Seq[(Array[Byte], Int, Int)]): Seq[(Array[Byte], Decision)] =
    crops.map { case (c, w, h) =>
      val d = decide(classify(c, w, h))
      (if (d.rotate) rotate180(c, w, h) else c, d)
    }
}
