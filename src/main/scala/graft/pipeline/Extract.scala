package graft.pipeline

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.kernel.{Assemble, Detect}
import graft.schema._

/** One media-extraction task after the media join. */
final case class MediaTask(doc_id: String, offset: Int, payload: Array[Byte])

/** Regions detected for one media span. */
final case class MediaRegions(doc_id: String, offset: Int, regions: Seq[Region])

/** All regions of a document, keyed by span offset. */
final case class DocRegions(doc_id: String, byOffset: Map[Int, Seq[Region]])

/** The distributed extraction pipeline (SURVEY.md §7.3 step 3):
  *
  *   docs ─ explode media spans ─┐
  *                               ├─ join(media_ref) ─ mapPartitions(Detect.extract)
  *   media ─────────────────────-┘        │
  *                               groupByKey(doc_id) ─┐
  *   docs ──────────────────────────────── joinWith ─┴─ Assemble → ExtractedDoc
  *
  * Scale design: docs and media are both range-partitioned by doc_id at ingest
  * (media_ref embeds its doc_id), so on a real cluster the media join and the
  * doc_id group/join co-locate; here AQE handles post-shuffle sizing. The kernel
  * is within-row pure compute — parallelism comes from partitions only, exactly
  * replacing the reference's driver-side batch loop
  * (/root/reference/cnstd/detector.py:232-245).
  */
object Extract {

  def run(docs: Dataset[Doc], media: Dataset[Media])(implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    import spark.implicits._

    val tasks = docs
      .select($"doc_id", explode($"spans").as("s"))
      .where($"s.kind" === "media")
      .select($"doc_id", $"s.offset".as("offset"), $"s.media_ref".as("media_ref"))

    val joined = tasks
      .join(media, Seq("media_ref"))
      .select($"doc_id", $"offset", $"payload")
      .as[MediaTask]

    // Batched kernel invocation inside the partition iterator — the analog of
    // the reference's batch_size=20 inference loop. grouped() keeps the
    // iterator lazy; one payload is in memory at a time per task thread.
    val regions: Dataset[MediaRegions] = joined.mapPartitions { it =>
      it.grouped(Params.BatchSize).flatMap { batch =>
        batch.map(t => MediaRegions(t.doc_id, t.offset, Detect.extract(t.payload)))
      }
    }

    val perDoc: Dataset[DocRegions] = regions
      .groupByKey(_.doc_id)
      .mapGroups { (id, it) =>
        DocRegions(id, it.map(r => r.offset -> r.regions).toMap)
      }

    docs
      .joinWith(perDoc, docs("doc_id") === perDoc("doc_id"), "left_outer")
      .map { case (doc, dr) =>
        val byOffset = Option(dr).map(_.byOffset).getOrElse(Map.empty[Int, Seq[Region]])
        ExtractedDoc(doc.doc_id, Assemble.assemble(doc.spans, byOffset))
      }
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

  /** End-to-end over generated data, result sorted for deterministic output. */
  def runGenerated(nDocs: Long, seed: Long = GenData.DefaultSeed)(
      implicit spark: SparkSession): Dataset[ExtractedDoc] = {
    val (docs, media) = generate(nDocs, seed)
    run(docs, media)
  }
}
