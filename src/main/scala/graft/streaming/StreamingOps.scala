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
    * time its text_hash is seen across micro-batches and restarts.
    * `flatMapGroupsWithState` keeps one boolean per hash in the state store;
    * at 100 TB/day the state is bounded by distinct-hash count and sharded by
    * the groupBy shuffle.
    *
    * `retention`: optional event-time TTL bounding state for UNBOUNDED hash
    * cardinality — without it a long-running stream accretes one entry per
    * distinct hash forever. With `Some(horizon)` the op uses
    * `EventTimeTimeout`: each hash's entry expires once the stream's
    * watermark passes `last-seen ts + horizon`, after which the same hash is
    * admitted again (the documented semantics of a FINITE dedup horizon —
    * re-emission beyond the horizon is the intended trade for bounded state).
    * The caller must put `withWatermark("ts", ...)` on the input, which also
    * sets how much event-time disorder the horizon tolerates.
    */
  def dedupFirstSeen(docs: Dataset[StreamDoc],
                     retention: Option[java.time.Duration] = None): Dataset[StreamDoc] = {
    import docs.sparkSession.implicits._
    val timeoutConf = retention match {
      case Some(_) => GroupStateTimeout.EventTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    docs
      .groupByKey(_.text_hash)
      .flatMapGroupsWithState[Long, StreamDoc](OutputMode.Append, timeoutConf) {
        (_: String, rows: Iterator[StreamDoc], state: GroupState[Long]) =>
          if (state.hasTimedOut) {
            // horizon passed with no re-arrival: drop the entry entirely so
            // the key costs nothing until (and unless) it is seen again
            state.remove()
            Iterator.empty
          } else {
            // deterministic winner within the batch: smallest doc_id. The
            // state stores the RUNNING max event ts across batches: a late
            // out-of-order duplicate (older ts, still above the watermark)
            // must not move the timeout EARLIER and evict a live hash inside
            // its horizon — the TTL anchors at the newest sighting ever seen
            var best: StreamDoc = null
            var maxTs = Long.MinValue
            rows.foreach { d =>
              if (best == null || d.doc_id < best.doc_id) best = d
              if (d.ts.getTime > maxTs) maxTs = d.ts.getTime
            }
            val first = !state.exists
            val anchor = if (first) maxTs else math.max(state.get, maxTs)
            state.update(anchor)
            retention.foreach(h => state.setTimeoutTimestamp(anchor + h.toMillis))
            if (first) Iterator.single(best) else Iterator.empty
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
    * across micro-batches and restarts. Within a batch, the result is the
    * same as folding the user's events in (ts, event_id) order, but computed
    * WITHOUT materializing+sorting the batch slice: an order-insensitive
    * chained-min pass — a click qualifies iff its key exceeds the minimal
    * view key, a purchase iff its key exceeds the minimal qualifying click
    * key — which is exactly the sorted fold's fixpoint (keys are unique, so
    * "processed after" = "key greater"). One streamed pass tracks the min
    * view key and retains only click/purchase keys (views, the bulk of a
    * funnel stream, are never buffered); two scans over those small buffers
    * finish the chain. Across batches, arrival order stands in for event
    * order — the documented streaming approximation of the batch query's
    * strict global ordering (a late click arriving after its purchase was
    * already counted cannot retroactively re-qualify it; the batch query
    * remains the exact form). Emits a row whenever a user's depth advances,
    * so downstream sees monotone per-user progress.
    *
    * State is three booleans per user. `retention`: optional processing-time
    * TTL — with `Some(horizon)` a user idle longer than the horizon is
    * evicted (ProcessingTimeTimeout), bounding state for unbounded user
    * cardinality; a returning user restarts from depth 0.
    */
  def funnelDepth(events: Dataset[StreamEvent],
                  retention: Option[java.time.Duration] = None): Dataset[FunnelUpdate] = {
    import events.sparkSession.implicits._
    val timeoutConf = retention match {
      case Some(_) => GroupStateTimeout.ProcessingTimeTimeout
      case None    => GroupStateTimeout.NoTimeout
    }
    // sentinel smaller than any real (ts, event_id) key: a stage already
    // reached in a PREVIOUS batch gates every in-batch successor
    val Reached = (Long.MinValue, Long.MinValue)
    val ord = Ordering.Tuple2[Long, Long]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[FunnelState, FunnelUpdate](OutputMode.Append, timeoutConf) {
        (user: Long, rows: Iterator[StreamEvent], state: GroupState[FunnelState]) =>
          if (state.hasTimedOut) {
            state.remove()
            Iterator.empty
          } else {
            val before = state.getOption.getOrElse(FunnelState(false, false, false))
            var vKey: (Long, Long) = if (before.sawView) Reached else null
            var clicks = List.empty[(Long, Long)]
            var purchases = List.empty[(Long, Long)]
            rows.foreach { e =>
              val k = (e.ts.getTime, e.event_id)
              e.event_type match {
                case "view" =>
                  if (vKey == null || ord.lt(k, vKey)) vKey = k
                case "click"    => if (!before.sawClick) clicks ::= k
                case "purchase" => if (!before.sawPurchase) purchases ::= k
                case _          => ()
              }
            }
            val cKey: (Long, Long) =
              if (before.sawClick) Reached
              else if (vKey == null) null
              else clicks.filter(k => ord.gt(k, vKey)) match {
                case Nil => null
                case qs  => qs.min(ord)
              }
            val pKey: (Long, Long) =
              if (before.sawPurchase) Reached
              else if (cKey == null) null
              else if (purchases.exists(k => ord.gt(k, cKey))) Reached
              else null
            val after = FunnelState(
              sawView = vKey != null, sawClick = cKey != null, sawPurchase = pKey != null)
            state.update(after)
            retention.foreach(h => state.setTimeoutDuration(h.toMillis))
            if (after.depth > before.depth) Iterator.single(FunnelUpdate(user, after.depth))
            else Iterator.empty
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
