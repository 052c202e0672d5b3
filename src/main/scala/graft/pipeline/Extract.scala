package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{Assemble, Detect}
import graft.schema._

/** One media-extraction task after the media join. */
final case class MediaTask(doc_id: String, offset: Int, media_ref: String, payload: Array[Byte])

/** One assembled-input piece: either a text span (regions == null) or the
  * region list extracted from a media span. Unioning both shapes lets the
  * final assembly run off a single doc_id shuffle.
  */
final case class SpanPiece(doc_id: String, offset: Int, kind: String, text: String,
                           media_ref: String, regions: Seq[Region])

/** The distributed extraction pipeline (SURVEY.md §7.3 step 3):
  *
  *   docs ─ explode media spans ─ join(media) ─ mapPartitions(Detect.extract) ─┐
  *   docs ─ explode text spans ──────────────────────────────────────── union ─┴─
  *     groupByKey(doc_id) ─ assemble → ExtractedDoc
  *
  * Exactly two shuffles: the media-payload join and the final doc_id group.
  * (A first cut re-joined the docs table after extraction — a third shuffle
  * moving every text span twice; unioning typed pieces removes it.)
  *
  * Scale design: docs and media are both written doc_id-range-partitioned
  * (media_ref embeds its doc_id), so on a real cluster the join co-locates
  * after AQE; media-heavy docs are naturally split across tasks because the
  * unit of kernel work is one media span, not one doc — skew in media count
  * per doc therefore never concentrates in one task before the (cheap,
  * regions-only) final group. The kernel is within-row pure compute —
  * parallelism comes from partitions only, exactly replacing the reference's
  * driver-side batch loop (/root/reference/cnstd/detector.py:232-245).
  */
object Extract {

  def run(docs: Dataset[Doc], media: Dataset[Media])(implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._

    val spans = docs.select(col("doc_id"), explode(col("spans")).as("s"))

    val mediaTasks = spans
      .where(col("s.kind") === "media")
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.media_ref").as("media_ref"))
      .join(media, Seq("media_ref"))
      .select(col("doc_id"), col("offset"), col("media_ref"), col("payload"))
      .as[MediaTask]

    // Batched kernel invocation inside the partition iterator — the analog of
    // the reference's batch_size=20 inference loop. grouped() keeps the
    // iterator lazy; one payload batch is in memory at a time per task.
    val mediaPieces: Dataset[SpanPiece] = mediaTasks.mapPartitions { it =>
      it.grouped(Params.BatchSize).flatMap { batch =>
        batch.map { t =>
          SpanPiece(t.doc_id, t.offset, "media", "", t.media_ref, Detect.extract(t.payload))
        }
      }
    }

    val textPieces: Dataset[SpanPiece] = spans
      .where(col("s.kind") =!= "media")
      .select(col("doc_id"), col("s.offset").as("offset"), col("s.kind").as("kind"),
        col("s.text").as("text"), col("s.media_ref").as("media_ref"),
        lit(null).cast("array<struct<kind:string,x0:int,y0:int,x1:int,y1:int,score:double>>")
          .as("regions"))
      .as[SpanPiece]

    mediaPieces
      .unionByName(textPieces)
      .groupByKey(_.doc_id)
      .mapGroups { (id, it) => assembleFromPieces(id, it) }
  }

  private[pipeline] def assembleFromPieces(id: String, it: Iterator[SpanPiece]): ExtractedDoc = {
    val pieces = it.toArray
    val raw = pieces.map(p => RawSpan(p.kind, p.text, p.media_ref, p.offset))
    val regions = pieces.collect {
      case p if p.regions != null => p.offset -> p.regions
    }.toMap
    ExtractedDoc(id, Assemble.assemble(raw.toSeq, regions))
  }

  /** Generate `nDocs` docs + media payloads as distributed Datasets. */
  def generate(nDocs: Long, seed: Long = GenData.DefaultSeed)(
      implicit spark: SparkSession): (Dataset[Doc], Dataset[Media]) = {
    import spark.implicits._
    val ids = spark.range(nDocs)
    val docs = ids.map(i => GenData.doc(seed, i))
    val media = ids.flatMap(i => GenData.media(seed, GenData.doc(seed, i)))
    (docs, media)
  }

  /** End-to-end over generated data. */
  def runGenerated(nDocs: Long, seed: Long = GenData.DefaultSeed)(
      implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    val (docs, media) = generate(nDocs, seed)
    run(docs, media)
  }
}
