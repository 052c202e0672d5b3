package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{concat, lit}
import graft.kernel.{Detect, Image, Order, Payload}
import graft.pipeline.GenData

/** Multimodal-column plumbing: media as opaque `binary` columns with typed
  * metadata, decoded inside batched mapPartitions — exactly how a
  * Pandas-UDF/`mapInPandas` decode stage sits in this plan on a cluster.
  *
  * Two decode paths, both real:
  *  - mm1 decodes the ENGINE's tensor payload codec (graft.kernel.Payload —
  *    the serialized neural-stage output this engine's whole extraction
  *    pipeline runs on);
  *  - mm2 decodes actual IMAGE FILE FORMATS byte-by-byte (24-bit BMP,
  *    binary PGM/PPM — graft.kernel.Image, pure JVM, no codec libs needed),
  *    mirroring the reference's decode surface (`cv2.imdecode` +
  *    GRAY→3-channel + channel flip, /root/reference/cnstd/ppocr/
  *    img_operators.py:27-59), then runs the STD detection kernel over the
  *    decoded luma. Compressed formats (JPEG/PNG) stay format-pluggable
  *    behind Image.decode's magic dispatch.
  */
object MultimodalOps {

  final case class MediaRow(media_ref: String, payload: Array[Byte])
  final case class MediaMeta(media_ref: String, stage: Int, width: Int, height: Int,
                             n_bytes: Int, n_regions: Int)
  final case class ImageMeta(media_ref: String, format: String, width: Int, height: Int,
                             channels: Int, n_bytes: Int, pix_hash: Long, n_regions: Int)

  /** Decode the engine's tensor payload codec
    * (/root/reference/cnstd/model/core.py:110-121's prob-map / candidate
    * tensors as bytes) and count extracted regions.
    */
  private def decodeMeta(r: MediaRow): MediaMeta = {
    val d = Payload.decode(r.payload)
    MediaMeta(r.media_ref, d.stage, d.width, d.height, r.payload.length,
      Detect.extract(r.payload).length)
  }

  /** Portable polynomial rolling hash over the decoded luma plane (same
    * B1/M1 family as the text fingerprints): a value check that the PIXELS —
    * not just the dimensions — survived the format round trip.
    */
  private def pixHash(gray: Array[Byte]): Long = {
    var acc = 0L
    var i = 0
    while (i < gray.length) {
      acc = (acc * DedupOps.HashB1 + (gray(i) & 0xff)) % DedupOps.HashM1
      i += 1
    }
    acc
  }

  /** Parse a real raster file (BMP/PGM/PPM), expand gray to 3 channels
    * (the reference's GRAY2BGR branch), take the luma back out, and run the
    * STD detection kernel over it as a probability map — the full
    * bytes→pixels→regions path on genuinely decoded data.
    */
  private def decodeImageMeta(r: MediaRow): ImageMeta = {
    val px = Image.decode(r.payload)
    val expanded = if (px.channels == 1) Image.grayToRgb(px) else px
    val luma = Image.gray(expanded)
    // the full STD tail including the sort+dedup finalize — identical to what
    // extract() runs on a tensor payload of the same cells (ImageSpec parity)
    val regions = Order.finalize(Detect.std(luma, 0, px.width, px.height))
    ImageMeta(r.media_ref, px.format, px.width, px.height, px.channels,
      r.payload.length, pixHash(luma), regions.length)
  }

  /** Side parquet holding the sequential (driver-computed) metadata oracle. */
  def oracleTable(dir: String, n: Long): String = OracleSide.path("mm1_oracle_meta", dir, n)

  def imageOracleTable(dir: String, n: Long): String = OracleSide.path("mm2_oracle_img", dir, n)

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

  /** mm2: the same plumbing over REAL image-format payloads (BMP/PGM/PPM
    * bytes generated per ref), decoded by the pure-JVM parser and value-
    * checked — dimensions, channel count, a luma-plane hash, and the region
    * count the detection kernel finds on the decoded pixels — against a
    * sequential driver-side oracle, like mm1.
    */
  def imageMeta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val refs = spark.read.parquet(s"$dir/documents.parquet")
      .select(concat(lit("img-doc-"), $"doc_id").as("media_ref"))
      .as[String]
    val side = imageOracleTable(dir, refs.count())
    if (!OracleSide.exists(side)) {
      val seq = refs.collect().sorted.toSeq
        .map(ref => decodeImageMeta(MediaRow(ref, GenData.imagePayload(GenData.DefaultSeed, ref))))
      spark.createDataFrame(seq).write.mode("overwrite").parquet(side)
    }
    val media = refs.map(ref => MediaRow(ref, GenData.imagePayload(GenData.DefaultSeed, ref)))
    media
      .mapPartitions(_.grouped(graft.schema.Params.BatchSize).flatMap(_.map(decodeImageMeta)))
      .toDF()
      .orderBy("media_ref")
  }
}
