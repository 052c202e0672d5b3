package graft.metrics

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import graft.kernel.Geom
import graft.schema.Region

/** Dataset-level localization metrics — the Spark restatement of the
  * reference's `LocalizationConfusion.update/summary`
  * (/root/reference/cnstd/utils/metrics.py:307-440): per document, predictions
  * are matched to ground truth greedily by descending IoU (the small-n stand-in
  * for `linear_sum_assignment`, metrics.py:389-392); a pair matches when
  * IoU >= iouThresh (0.5). The typed Aggregator gives partial+final merge for
  * free (partial on executors, final on the driver), exactly the accumulate /
  * summary split of the reference.
  */
object Localization {

  final case class Buf(var matches: Long, var nGt: Long, var nPred: Long, var iouSum: Double)
  final case class Metrics(matches: Long, n_gt: Long, n_pred: Long,
                           precision: Double, recall: Double, mean_iou: Double)

  /** Greedy max-IoU matching for one document. Returns (matchCount, iouSum). */
  def matchOne(gt: Seq[Region], pred: Seq[Region], iouThresh: Double): (Int, Double) = {
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
