package graft.metrics

import graft.SparkSpec
import graft.schema.Region
import graft.pipeline.{Extract, GenData, Oracle}
import org.apache.spark.sql.functions._

class MetricsSpec extends SparkSpec {
  private def r(x0: Int, y0: Int, x1: Int, y1: Int) = Region("t", x0, y0, x1, y1, 0.9)

  test("greedy matching counts IoU>=0.5 pairs once each") {
    val gt = Seq(r(0, 0, 10, 10), r(20, 20, 30, 30))
    val pred = Seq(r(0, 0, 10, 9), r(100, 100, 110, 110))
    val (m, s) = Localization.matchOne(gt, pred, 0.5)
    assert(m == 1)
    assert(math.abs(s - 0.9) < 1e-9)
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
