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

  /** One incoming user event on the stream. */
  final case class StreamEvent(event_id: Long, user_id: Long,
                               ts: java.sql.Timestamp, event_type: String)

  /** (user_id, depth reached so far) emitted whenever a user's funnel depth
    * advances. */
  final case class FunnelUpdate(user_id: Long, funnel_depth: Int)

  /** Funnel progress per user: view=1, click after view=2, purchase after
    * valid click=3. */
  final case class FunnelState(sawView: Boolean, sawClick: Boolean, sawPurchase: Boolean) {
    def depth: Int = if (sawPurchase) 3 else if (sawClick) 2 else if (sawView) 1 else 0
  }

  /** Streaming form of the batch ev4 funnel (RelationalOps.eventFunnel): a
    * per-user state machine over view→click→purchase, held in the state store
    * across micro-batches and restarts. Within a batch, a user's events are
    * folded in (ts, event_id) order (the iterator order is not guaranteed, so
    * the fold sorts its batch slice first); across batches, arrival order
    * stands in for event order — the documented streaming approximation of
    * the batch query's strict global ordering (a late click arriving after
    * its purchase was already counted cannot retroactively re-qualify it;
    * the batch query remains the exact form). Emits a row whenever a user's
    * depth advances, so downstream sees monotone per-user progress. State is
    * three booleans per user — bounded by the active-user count and
    * TTL-able exactly like dedupFirstSeen.
    */
  def funnelDepth(events: Dataset[StreamEvent]): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[FunnelState]) =>
          val before = state.getOption.getOrElse(FunnelState(false, false, false))
          val after = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .foldLeft(before) { (st, e) =>
              e.event_type match {
                case "view"                      => st.copy(sawView = true)
                case "click" if st.sawView       => st.copy(sawClick = true)
                case "purchase" if st.sawClick   => st.copy(sawPurchase = true)
                case _                           => st
              }
            }
          state.update(after)
          if (after.depth > before.depth) Iterator.single(FunnelUpdate(user, after.depth))
          else Iterator.empty
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
