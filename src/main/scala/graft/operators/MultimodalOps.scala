package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{concat, lit}
import graft.kernel.{Detect, Payload}
import graft.pipeline.GenData

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata. The decode step is a deterministic fake (no image/audio libs in
  * this container — clearly marked), but the Spark-side machinery — binary
  * column, typed Dataset, batched mapPartitions, metadata schema — is real
  * and mirrors exactly how a Pandas-UDF/`mapInPandas` decode stage would sit
  * in this plan on a cluster with the codec libs installed.
  */
object MultimodalOps {

  final case class MediaRow(media_ref: String, payload: Array[Byte])
  final case class MediaMeta(media_ref: String, stage: Int, width: Int, height: Int,
                             n_bytes: Int, n_regions: Int)

  /** STUB decode: real image decode (cv2.imdecode analog,
    * /root/reference/cnstd/ppocr/img_operators.py:27-59) is replaced by the
    * deterministic payload codec. Swap this function for a real codec on a
    * cluster with native libs.
    */
  private def decodeMeta(r: MediaRow): MediaMeta = {
    val d = Payload.decode(r.payload)
    MediaMeta(r.media_ref, d.stage, d.width, d.height, r.payload.length,
      Detect.extract(r.payload).length)
  }

  /** Side parquet holding the sequential (driver-computed) metadata oracle. */
  def oracleTable(dir: String, n: Long): String = OracleSide.path("mm1_oracle_meta", dir, n)

  /** Attach a synthetic binary payload to every document row and extract
    * typed metadata + region counts inside batched mapPartitions.
    *
    * Driver-visible value check (round-3): the same rows are ALSO computed
    * sequentially on the driver — plain Scala loop, no mapPartitions/batching
    * machinery — and written as a side parquet for the DuckDB compare. The
    * collect is bounded: one short string per document at sf scale (the check
    * corpus), never the production path.
    */
  def mediaMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val refs = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("m-doc-"), $"doc_id").as("media_ref"))
      .as[String]
    val side = oracleTable(dir, refs.count())
    if (!OracleSide.exists(side)) {
      val seq = refs.collect().sorted.toSeq
        .map(ref => decodeMeta(MediaRow(ref, GenData.payload(GenData.DefaultSeed, ref))))
      spark.createDataFrame(seq).write.mode("overwrite").parquet(side)
    }
    val media = refs.map(ref => MediaRow(ref, GenData.payload(GenData.DefaultSeed, ref)))
    media
      .mapPartitions(_.grouped(graft.schema.Params.BatchSize).flatMap(_.map(decodeMeta)))
      .toDF()
      .orderBy("media_ref")
  }
}
