package graft.metrics

import graft.SparkSpec
import graft.schema.Region
import graft.pipeline.{Extract, GenData, Oracle}
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  private def r(x0: Int, y0: Int, x1: Int, y1: Int) = Region("t", x0, y0, x1, y1, 0.9)

  test("matching counts IoU>=0.5 pairs once each") {
    val gt = Seq(r(0, 0, 10, 10), r(20, 20, 30, 30))
    val pred = Seq(r(0, 0, 10, 9), r(100, 100, 110, 110))
    val (m, s) = Localization.matchOne(gt, pred, 0.5)
    assert(m == 1)
    assert(math.abs(s - 0.9) < 1e-9)
    assert(Localization.matchOneGreedy(gt, pred, 0.5) == ((m, s)))
  }

  test("optimal assignment beats greedy on a contested matching (reference semantics)") {
    // gt A/B vs pred P/Q engineered so greedy's best-first pick is globally
    // suboptimal: iou(A,P)=0.6, iou(A,Q)=0.5, iou(B,P)=0.5, iou(B,Q)=0.375.
    // Greedy: A-P (0.6) leaves B with only Q (0.375 < thresh) -> 1 match.
    // linear_sum_assignment(-iou): {A-Q, B-P} totals 1.0 > 0.975 -> 2 matches.
    val gtA = r(0, 0, 100, 100)
    val gtB = r(0, 20, 100, 80)
    val predP = r(0, 0, 100, 60)
    val predQ = r(0, 0, 50, 100)
    import graft.kernel.Geom
    assert(math.abs(Geom.iou(gtA, predP) - 0.6) < 1e-12)
    assert(math.abs(Geom.iou(gtA, predQ) - 0.5) < 1e-12)
    assert(math.abs(Geom.iou(gtB, predP) - 0.5) < 1e-12)
    assert(math.abs(Geom.iou(gtB, predQ) - 0.375) < 1e-12)
    val (mg, sg) = Localization.matchOneGreedy(Seq(gtA, gtB), Seq(predP, predQ), 0.5)
    assert(mg == 1 && math.abs(sg - 0.6) < 1e-12)
    val (mo, so) = Localization.matchOne(Seq(gtA, gtB), Seq(predP, predQ), 0.5)
    assert(mo == 2, "optimal assignment must recover both matches")
    assert(math.abs(so - 1.0) < 1e-12)
  }

  test("rectangular assignment handles more preds than gts and vice versa") {
    // 1 gt, 3 preds: optimal picks the best column
    val gt = Seq(r(0, 0, 10, 10))
    val preds = Seq(r(5, 0, 15, 10), r(0, 0, 10, 9), r(50, 50, 60, 60))
    val (m1, s1) = Localization.matchOne(gt, preds, 0.5)
    assert(m1 == 1 && math.abs(s1 - 0.9) < 1e-12)
    // transposed shape: 3 gts, 1 pred
    val (m2, s2) = Localization.matchOne(preds, gt, 0.5)
    assert(m2 == 1 && math.abs(s2 - 0.9) < 1e-12)
    // brute-force differential on random rectangles, n x m up to 5 x 6
    val rng = new scala.util.Random(11)
    def rb() = { val x = rng.nextInt(30); val y = rng.nextInt(30)
      Region("t", x, y, x + 5 + rng.nextInt(20), y + 5 + rng.nextInt(20), 1.0) }
    (1 to 50).foreach { _ =>
      val g = Seq.fill(1 + rng.nextInt(5))(rb())
      val p = Seq.fill(1 + rng.nextInt(6))(rb())
      val (gs, ps) = if (g.length <= p.length) (g, p) else (p, g)
      val iou2 = Array.tabulate(gs.length, ps.length)((a, b) => graft.kernel.Geom.iou(gs(a), ps(b)))
      def bestTotal(rows: List[Int], free: List[Int]): Double = rows match {
        case Nil => 0.0
        case ri :: rest => free.map(c => iou2(ri)(c) + bestTotal(rest, free.filterNot(_ == c))).max
      }
      val exhaustive = bestTotal(gs.indices.toList, ps.indices.toList)
      val assignedCols = Localization.solveAssignment(
        Array.tabulate(gs.length, ps.length)((a, b) => -iou2(a)(b)))
      val jv = assignedCols.zipWithIndex.map { case (c, rIdx) => iou2(rIdx)(c) }.sum
      assert(math.abs(jv - exhaustive) < 1e-9, s"JV $jv != exhaustive $exhaustive")
    }
  }

  test("localization aggregator over extraction vs oracle is a perfect score") {
    implicit val sp = spark
    import sp.implicits._
    val n = 100L
    val pred = Extract.runGenerated(n).collect().map(d => d.doc_id -> d.spans).toMap
    // reconstruct region boxes from the span text rendering for both sides
    def boxes(spans: Seq[graft.schema.OutSpan]): Seq[Region] = spans.collect {
      case s if s.media_ref.nonEmpty =>
        val m = """\[(\d+),(\d+),(\d+),(\d+)\]""".r.findFirstMatchIn(s.text).get
        Region(s.kind, m.group(1).toInt, m.group(2).toInt, m.group(3).toInt, m.group(4).toInt, 1.0)
    }
    val pairs = (0L until n).map { i =>
      val gold = Oracle.extractGenerated(GenData.DefaultSeed, i)
      (boxes(gold.spans), boxes(pred(gold.doc_id)))
    }
    val ds = pairs.toDS()
    val m = ds.select(Localization.agg(0.5).toColumn).head()
    assert(m.n_gt == m.n_pred && m.matches == m.n_gt)
    assert(m.precision == 1.0 && m.recall == 1.0)
    assert(math.abs(m.mean_iou - 1.0) < 1e-9)
    assert(m.n_gt > 0)
  }

  test("text match rates distinguish raw/caseless/folded") {
    implicit val sp = spark
    import sp.implicits._
    val df = Seq(
      ("abc", "abc"),     // raw match
      ("Abc", "abc"),     // caseless only
      ("café", "cafe"),   // folded only
      ("CAFÉ", "cafe"),   // caseless+folded only
      ("xyz", "qqq"))     // no match
      .toDF("gt", "pred")
    val row = TextMatch.summary(df, col("gt"), col("pred")).head()
    assert(row.getAs[Double]("raw") == 0.2)
    assert(row.getAs[Double]("caseless") == 0.4)
    assert(row.getAs[Double]("folded") == 0.4)
    assert(row.getAs[Double]("caseless_folded") == 0.8)
    assert(row.getAs[Long]("n") == 5)
  }
}
