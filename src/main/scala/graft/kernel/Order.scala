package graft.kernel

import graft.schema.{Params, Region}

/** Reading-order sort and overlap dedup — the shared tail of all three
  * detection stages (/root/reference/cnstd/yolov7/layout_analyzer.py:329-330).
  */
object Order {

  /** The reference comparator (/root/reference/cnstd/utils/utils.py:415-434):
    * if the y-overlap ratio `inter_h / max(1, min(h1, h2))` exceeds 0.5 the
    * boxes are "on the same line" and order by x0, else by y0.
    */
  def compare(a: Region, b: Region): Int = {
    val yIou: Double =
      if (a.y1 <= b.y0 || b.y1 <= a.y0) 0.0
      else {
        val yMin = math.max(a.y0, b.y0)
        val yMax = math.min(a.y1, b.y1)
        (yMax - yMin).toDouble / math.max(1, math.min(a.y1 - a.y0, b.y1 - b.y0))
      }
    if (yIou > 0.5) Integer.compare(a.x0, b.x0) else Integer.compare(a.y0, b.y0)
  }

  /** Stable binary-insertion sort with the comparator above. The reference
    * sorts with CPython Timsort over a comparator that is non-transitive on
    * chains of partial y-overlaps (SURVEY.md §7.5); our frozen deterministic
    * spec is stable binary insertion (identical to Timsort's small-array path
    * and to any stable sort whenever the comparator is consistent), which
    * never throws on inconsistent comparators and is partition-count
    * invariant. Region lists per media span are small (<= MaxDet).
    */
  def sortBoxes(rs: Seq[Region]): Seq[Region] = {
    val arr = rs.toArray
    var i = 1
    while (i < arr.length) {
      val pivot = arr(i)
      // binary search for the leftmost position where compare(pivot, arr(pos)) < 0
      var lo = 0
      var hi = i
      while (lo < hi) {
        val mid = (lo + hi) >>> 1
        if (compare(pivot, arr(mid)) < 0) hi = mid else lo = mid + 1
      }
      var j = i
      while (j > lo) { arr(j) = arr(j - 1); j -= 1 }
      arr(lo) = pivot
      i += 1
    }
    arr.toSeq
  }

  /** Exact re-statement of `dedup_boxes` (/root/reference/cnstd/utils/utils.py:452-475):
    * pairwise intersection-over-candidate-area; when the earlier box covers the
    * later at least as much as vice versa (v1 >= v2) the later is dropped if
    * v1 >= threshold, otherwise the earlier is dropped if v2 >= threshold.
    * Index-order sensitive by design — must run after sortBoxes.
    */
  def dedupBoxes(rs: Seq[Region], threshold: Double = Params.DedupThresh): Seq[Region] = {
    val arr = rs.toIndexedSeq
    val keep = Array.fill(arr.length)(true)
    var idx = 0
    while (idx < arr.length) {
      if (keep(idx)) {
        var l = idx + 1
        var broke = false
        while (l < arr.length && !broke) {
          if (keep(l)) {
            val v1 = Geom.partialOverlap(arr(idx), arr(l))
            val v2 = Geom.partialOverlap(arr(l), arr(idx))
            if (v1 >= v2) {
              if (v1 >= threshold) keep(l) = false
            } else if (v2 >= threshold) {
              keep(idx) = false
              broke = true
            }
          }
          l += 1
        }
      }
      idx += 1
    }
    arr.indices.collect { case i if keep(i) => arr(i) }
  }

  /** sort + dedup tail shared by every stage
    * (/root/reference/cnstd/yolov7/layout_analyzer.py:329-330).
    */
  def finalize(rs: Seq[Region]): Seq[Region] = dedupBoxes(sortBoxes(rs))
}
