package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.kernel.{Assemble, Detect}
import graft.pipeline.GenData
import graft.schema.{Doc, ExtractedDoc}

/** Optional Structured-Streaming ingestion mode. The reference is batch-only
  * (SURVEY §2.9), so this is the "bolt-on" noted there: documents arrive as
  * parquet files in a directory, each micro-batch extracts them map-only
  * (media payloads resolved inside the partition via a MediaStore — no
  * shuffle, no stateful operators, so no watermark is needed), and the append
  * sink plus checkpointLocation give exactly-once file-source semantics:
  * a restarted query skips files recorded in the checkpoint's source log.
  *
  * Trigger.AvailableNow drains the current backlog and stops — the
  * micro-batch analog of one batch spark-submit run.
  */
object StreamingExtract {

  /** Resolves a media payload by reference inside a task. Implementations
    * must be cheap per lookup (local KV/object store at scale).
    */
  trait MediaStore extends Serializable {
    def fetch(mediaRef: String): Array[Byte]
  }

  /** Deterministic store for the generated corpus (payloads are a pure
    * function of (seed, media_ref) — FIXTURES.md §4).
    */
  final case class GeneratedMediaStore(seed: Long) extends MediaStore {
    def fetch(mediaRef: String): Array[Byte] = GenData.payload(seed, mediaRef)
  }

  /** One doc through the kernels. Matches the batch pipeline's robustness
    * contract (Extract.piecesOf): a corrupt payload or a failed/missing fetch
    * degrades to zero regions for that span instead of failing the query.
    */
  def extractOne(doc: Doc, store: MediaStore): ExtractedDoc = {
    val byOffset = doc.spans.collect {
      case s if s.kind == "media" =>
        val payload = try store.fetch(s.media_ref) catch { case _: Exception => null }
        s.offset -> Detect.extractSafe(payload)._1
    }.toMap
    ExtractedDoc(doc.doc_id, Assemble.assemble(doc.spans, byOffset))
  }

  /** Config-driven variant of extractOne — the streaming analog of
    * Extract.runConfigured / Oracle.extractConfigured (same rendered-kernel
    * contract, same degrade-don't-fail, empty docs kept). The frozen Default
    * config routes through extractOne's columnar-identical path.
    */
  def extractOneConfigured(doc: Doc, store: MediaStore,
                           cfg: graft.schema.DetectConfig): ExtractedDoc = {
    if (cfg == graft.schema.DetectConfig.Default) return extractOne(doc, store)
    val flat = doc.spans.sortBy(_.offset).flatMap { s =>
      if (s.kind == "media") {
        val payload = try store.fetch(s.media_ref) catch { case _: Exception => null }
        Detect.extractRenderedSafe(payload, cfg)._1.map { case (k, t) => (k, t, s.media_ref) }
      } else Seq((s.kind, s.text, ""))
    }
    ExtractedDoc(doc.doc_id,
      flat.zipWithIndex.map { case ((k, t, m), i) => graft.schema.OutSpan(k, t, m, i) })
  }

  /** Start the streaming extraction: docsDir (parquet files, Doc schema) →
    * outDir (append parquet), exactly-once via checkpointDir. `cfg` exposes
    * the full DetectConfig surface (rotated path, angle-clf, crops, dilation)
    * in streaming mode, mirroring ExtractJob's batch flags.
    */
  def start(docsDir: String, outDir: String, checkpointDir: String, store: MediaStore,
            availableNow: Boolean = true,
            cfg: graft.schema.DetectConfig = graft.schema.DetectConfig.Default)(
      implicit spark: SparkSession): StreamingQuery = {
    import spark.implicits._
    val docs: Dataset[Doc] = spark.readStream
      .schema(org.apache.spark.sql.Encoders.product[Doc].schema)
      .parquet(docsDir)
      .as[Doc]
    val out = docs.mapPartitions(_.map(d => extractOneConfigured(d, store, cfg)))
    val writer = out.writeStream
      .format("parquet")
      .option("path", outDir)
      .option("checkpointLocation", checkpointDir)
      .outputMode("append")
    (if (availableNow) writer.trigger(Trigger.AvailableNow()) else writer).start()
  }
}
