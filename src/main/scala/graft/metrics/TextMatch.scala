package graft.metrics

import java.text.Normalizer
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text match metrics — the Spark restatement of the reference's `TextMatch`
  * (/root/reference/cnstd/utils/metrics.py:60-137): word accuracy in raw,
  * caseless, ASCII-folded ("unidecode" analog via NFD + combining-mark strip),
  * and caseless+folded variants, as plain codegen'd aggregates.
  */
object TextMatch {

  /** ASCII folding: NFD normalize then drop combining marks (the public
    * java.text analog of the reference's `unidecode` call, metrics.py:39-57).
    */
  def fold(s: String): String =
    Normalizer.normalize(s, Normalizer.Form.NFD).replaceAll("\\p{M}+", "")

  private val foldUdf = udf((s: String) => if (s == null) null else fold(s))

  /** Match-rate summary over (gt, pred) string column pairs. */
  def summary(df: DataFrame, gt: Column, pred: Column): DataFrame = {
    def rate(c: Column): Column = round(avg(when(c, 1.0).otherwise(0.0)), 4)
    df.agg(
      rate(gt === pred).as("raw"),
      rate(lower(gt) === lower(pred)).as("caseless"),
      rate(foldUdf(gt) === foldUdf(pred)).as("folded"),
      rate(lower(foldUdf(gt)) === lower(foldUdf(pred))).as("caseless_folded"),
      count(lit(1)).as("n"))
  }
}
