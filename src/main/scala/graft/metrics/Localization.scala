package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.kernel.Geom
import graft.schema.Region

/** Dataset-level localization metrics — the Spark restatement of the
  * reference's `LocalizationConfusion.update/summary`
  * (/root/reference/cnstd/utils/metrics.py:307-440): per document, predictions
  * are matched to ground truth by the exact optimal assignment over the full
  * IoU matrix (`linear_sum_assignment(-iou_mat)`, metrics.py:389-392); an
  * assigned pair counts as a match when IoU >= iouThresh (0.5,
  * metrics.py:391-393). The typed Aggregator gives partial+final merge for
  * free (partial on executors, final on the driver), exactly the accumulate /
  * summary split of the reference.
  */
object Localization {

  final case class Buf(var matches: Long, var nGt: Long, var nPred: Long, var iouSum: Double)
  final case class Metrics(matches: Long, n_gt: Long, n_pred: Long,
                           precision: Double, recall: Double, mean_iou: Double)

  /** Exact rectangular linear-sum assignment (minimize total cost) — the
    * `scipy.optimize.linear_sum_assignment` analog the reference calls, via
    * the Jonker-Volgenant shortest-augmenting-path scheme with potentials.
    * Requires rows <= cols (callers transpose); O(rows^2 * cols) — documents
    * carry at most hundreds of boxes, so cubic is fine and runs per-row
    * inside the Aggregator, never on the driver for the whole dataset.
    * Returns the assigned column for each row.
    */
  def solveAssignment(cost: Array[Array[Double]]): Array[Int] = {
    val n = cost.length
    val m = cost(0).length
    require(n <= m, s"assignment needs rows <= cols, got $n x $m")
    val Inf = Double.MaxValue / 4
    val u = new Array[Double](n + 1)
    val v = new Array[Double](m + 1)
    val p = new Array[Int](m + 1) // p(j) = row matched to col j, 1-based, 0 = free
    val way = new Array[Int](m + 1)
    var i = 1
    while (i <= n) {
      p(0) = i
      var j0 = 0
      val minv = Array.fill(m + 1)(Inf)
      val used = new Array[Boolean](m + 1)
      var augmenting = true
      while (augmenting) {
        used(j0) = true
        val i0 = p(j0)
        var delta = Inf
        var j1 = 0
        var j = 1
        while (j <= m) {
          if (!used(j)) {
            val cur = cost(i0 - 1)(j - 1) - u(i0) - v(j)
            if (cur < minv(j)) { minv(j) = cur; way(j) = j0 }
            if (minv(j) < delta) { delta = minv(j); j1 = j }
          }
          j += 1
        }
        j = 0
        while (j <= m) {
          if (used(j)) { u(p(j)) += delta; v(j) -= delta }
          else minv(j) -= delta
          j += 1
        }
        j0 = j1
        augmenting = p(j0) != 0
      }
      while (j0 != 0) { val j1 = way(j0); p(j0) = p(j1); j0 = j1 }
      i += 1
    }
    val ans = new Array[Int](n)
    var j = 1
    while (j <= m) { if (p(j) != 0) ans(p(j) - 1) = j - 1; j += 1 }
    ans
  }

  /** Optimal matching for one document (the reference's semantics):
    * maximize total IoU over ALL pairs — sub-threshold pairs participate in
    * the assignment exactly like scipy's dense solve — then count/sum only
    * assigned pairs with IoU >= iouThresh. Returns (matchCount, iouSum).
    */
  def matchOne(gt: Seq[Region], pred: Seq[Region], iouThresh: Double): (Int, Double) = {
    if (gt.isEmpty || pred.isEmpty) return (0, 0.0)
    val iou = Array.tabulate(gt.length, pred.length)((gi, pi) => Geom.iou(gt(gi), pred(pi)))
    val assigned: Seq[(Int, Int)] =
      if (gt.length <= pred.length)
        solveAssignment(Array.tabulate(gt.length, pred.length)((a, b) => -iou(a)(b)))
          .zipWithIndex.map { case (pi, gi) => (gi, pi) }.toSeq
      else
        solveAssignment(Array.tabulate(pred.length, gt.length)((a, b) => -iou(b)(a)))
          .zipWithIndex.map { case (gi, pi) => (gi, pi) }.toSeq
    var count = 0
    var sum = 0.0
    assigned.foreach { case (gi, pi) =>
      val x = iou(gi)(pi)
      if (x >= iouThresh) { count += 1; sum += x }
    }
    (count, sum)
  }

  /** The round-2 greedy max-IoU matcher, kept as the cheap upper-bound-free
    * heuristic and as the divergence witness in MetricsSpec (greedy differs
    * from the optimal assignment on contested matchings).
    */
  def matchOneGreedy(gt: Seq[Region], pred: Seq[Region], iouThresh: Double): (Int, Double) = {
    val pairs = for {
      (g, gi) <- gt.zipWithIndex
      (p, pi) <- pred.zipWithIndex
      iou = Geom.iou(g, p)
      if iou >= iouThresh
    } yield (iou, gi, pi)
    val usedG = new Array[Boolean](gt.length)
    val usedP = new Array[Boolean](pred.length)
    var count = 0
    var sum = 0.0
    pairs.sortBy { case (iou, gi, pi) => (-iou, gi, pi) }.foreach { case (iou, gi, pi) =>
      if (!usedG(gi) && !usedP(pi)) {
        usedG(gi) = true
        usedP(pi) = true
        count += 1
        sum += iou
      }
    }
    (count, sum)
  }

  final class Agg(iouThresh: Double) extends Aggregator[(Seq[Region], Seq[Region]), Buf, Metrics] {
    def zero: Buf = Buf(0, 0, 0, 0.0)
    def reduce(b: Buf, in: (Seq[Region], Seq[Region])): Buf = {
      val (gt, pred) = in
      val (m, s) = matchOne(gt, pred, iouThresh)
      b.matches += m
      b.nGt += gt.length
      b.nPred += pred.length
      b.iouSum += s
      b
    }
    def merge(a: Buf, b: Buf): Buf =
      Buf(a.matches + b.matches, a.nGt + b.nGt, a.nPred + b.nPred, a.iouSum + b.iouSum)
    def finish(b: Buf): Metrics = Metrics(
      b.matches, b.nGt, b.nPred,
      if (b.nPred == 0) 0.0 else b.matches.toDouble / b.nPred,
      if (b.nGt == 0) 0.0 else b.matches.toDouble / b.nGt,
      if (b.matches == 0) 0.0 else b.iouSum / b.matches)
    def bufferEncoder: Encoder[Buf] = Encoders.product[Buf]
    def outputEncoder: Encoder[Metrics] = Encoders.product[Metrics]
  }

  def agg(iouThresh: Double = 0.5): Agg = new Agg(iouThresh)
}
