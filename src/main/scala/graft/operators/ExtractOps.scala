package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.pipeline.Extract

/** Driver-facing wrappers around the extraction pipeline. The interleaved doc
  * table is synthesized deterministically at a size matched to the scale
  * factor of `dir` (no external data; BASELINE.json input_hint shape).
  */
object ExtractOps {

  /** Doc count per driver scale factor. */
  def nDocsFor(dir: String): Long =
    if (dir.contains("sf0.1")) 8000L
    else if (dir.contains("sf0.01")) 2000L
    else 300L

  /** Full pipeline, flattened to one row per output span (deterministic order). */
  def extractSpans(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    Extract.runGenerated(nDocsFor(dir))
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.order").as("span_order"))
      .orderBy("doc_id", "span_order")
  }

  /** The reference-default flow (`rotated_bbox=True`, cn_std.py:49) through
    * the distributed pipeline: rotated min-area-rect regions rendered as
    * "[cx,cy,w,h,alpha];score" spans. Gated by the rotated-oracle E2E
    * equality (ExtractE2ESpec); driver sees rows>0 + determinism.
    */
  def extractSpansRotated(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val (docs, media) = Extract.generate(nDocsFor(dir))
    Extract.runConfigured(docs, media, graft.schema.DetectConfig.ReferenceDefault)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.text").as("text"),
        col("s.media_ref").as("media_ref"), col("s.order").as("span_order"))
      .orderBy("doc_id", "span_order")
  }

  /** Fixed side-table path for the exploded extraction spans at size n: the
    * driver's DuckDB oracle re-aggregates the SAME rows (the extraction
    * content itself is gated by the Spark-vs-single-threaded-oracle E2E
    * equality; what the oracle value-checks here is the metrics aggregation).
    */
  def sideTable(n: Long): String = s"/root/repo/target/oracle_side/x2_spans_$n"

  /** Extraction metrics table (north rule: per-partition/per-kind counts). */
  def extractMetrics(spark: SparkSession, dir: String): DataFrame = {
    implicit val s: SparkSession = spark
    val n = nDocsFor(dir)
    val spans = Extract.runGenerated(n)
      .select(col("doc_id"), explode(col("spans")).as("s"))
      .select(col("doc_id"), col("s.kind").as("kind"), col("s.media_ref").as("media_ref"))
    spans.coalesce(1).write.mode("overwrite").parquet(sideTable(n))
    spark.read.parquet(sideTable(n))
      .groupBy("kind")
      .agg(count(lit(1)).as("n_spans"), countDistinct(col("media_ref")).as("n_media"))
      .orderBy("kind")
  }
}
