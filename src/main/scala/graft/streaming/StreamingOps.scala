package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming operators for the training-data pipeline (§2.9 beyond
  * the reference's batch-only surface): streaming ingestion needs exactly the
  * dedup/aggregation ops the batch side has, expressed with Structured
  * Streaming state so they hold across micro-batches and restarts (state
  * lives in the checkpoint).
  */
object StreamingOps {

  /** One incoming document on the stream. */
  final case class StreamDoc(doc_id: String, text_hash: String, ts: java.sql.Timestamp)

  /** Streaming exact dedup, first-seen-wins: the streaming form of the batch
    * md5-groupBy dedup (TextOps.dedupExact) — emits a document only the first
    * time its text_hash is seen, ever, across micro-batches and restarts.
    * `flatMapGroupsWithState` keeps one boolean per hash in the state store;
    * at 100 TB/day the state is bounded by distinct-hash count and sharded by
    * the groupBy shuffle, and a TTL (ProcessingTimeTimeout + timeout duration)
    * can bound it further when the dedup horizon is finite.
    */
  def dedupFirstSeen(docs: Dataset[StreamDoc]): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    docs
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState[Boolean, StreamDoc](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_: String, rows: Iterator[StreamDoc], state: GroupState[Boolean]) =>
          if (state.exists) Iterator.empty
          else {
            state.update(true)
            // deterministic winner within the batch: smallest doc_id
            var best: StreamDoc = null
            rows.foreach(d => if (best == null || d.doc_id < best.doc_id) best = d)
            Iterator.single(best)
          }
      }
  }

  /** Watermarked tumbling-window counts per source — the streaming form of
    * ev1's hourly rollup: 1-hour windows, 10-minute allowed lateness; rows
    * later than the watermark are dropped, windows emit once finalized
    * (append mode). State per open window is one count — bounded by
    * (windows in flight) x (sources).
    */
  def hourlyCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour").as("w"), col("source"))
      .agg(count(lit(1)).as("n"))
      .select(col("w.start").as("hour"), col("source"), col("n"))
}
