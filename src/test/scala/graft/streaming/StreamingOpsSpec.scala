package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import java.sql.Timestamp

/** Stateful streaming gates: first-seen dedup state persists across
  * micro-batches; watermarked windows finalize exactly once and drop
  * too-late rows.
  */
class StreamingOpsSpec extends SparkSpec {

  private def ts(minute: Int) = new Timestamp(minute * 60000L)

  test("streaming first-seen dedup holds state across micro-batches") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.StreamDoc]
    val q = StreamingOps.dedupFirstSeen(in.toDS())
      .writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1: two docs with the same hash → smallest doc_id wins
      in.addData(
        StreamingOps.StreamDoc("doc-b", "h1", ts(0)),
        StreamingOps.StreamDoc("doc-a", "h1", ts(1)),
        StreamingOps.StreamDoc("doc-c", "h2", ts(2)))
      q.processAllAvailable()
      // batch 2: h1/h2 reappear (must be suppressed by state), h3 is new
      in.addData(
        StreamingOps.StreamDoc("doc-d", "h1", ts(3)),
        StreamingOps.StreamDoc("doc-e", "h2", ts(4)),
        StreamingOps.StreamDoc("doc-f", "h3", ts(5)))
      q.processAllAvailable()
      val out = spark.table("dedup_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == Set(("doc-a", "h1"), ("doc-c", "h2"), ("doc-f", "h3")), s"got $out")
    } finally q.stop()
  }

  test("streaming dedup TTL: an expired hash re-admits a doc after the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.StreamDoc]
    // event-time TTL of 10 minutes, zero-delay watermark: a hash whose last
    // sighting is > 10 event-minutes behind the watermark is evicted and the
    // next arrival of the same hash is admitted again (bounded-state
    // semantics of a finite dedup horizon)
    val q = StreamingOps.dedupFirstSeen(
        in.toDS().withWatermark("ts", "0 seconds"),
        retention = Some(java.time.Duration.ofMinutes(10)))
      .writeStream.format("memory").queryName("dedup_ttl_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // timeline starts above the initial watermark (epoch 0): a row AT the
      // watermark is dropped as late before reaching the state function
      in.addData(StreamingOps.StreamDoc("doc-a", "h1", ts(60)))
      q.processAllAvailable()
      // still inside the horizon (watermark 60 < 60+10): suppressed, and the
      // TTL re-anchors at the LAST sighting (ts 65)
      in.addData(StreamingOps.StreamDoc("doc-b", "h1", ts(65)))
      q.processAllAvailable()
      // push the watermark past 65+10: h1's state expires
      in.addData(StreamingOps.StreamDoc("doc-c", "h2", ts(90)))
      q.processAllAvailable()
      in.addData(StreamingOps.StreamDoc("doc-d", "h3", ts(91)))
      q.processAllAvailable()
      // beyond the horizon: the SAME hash is admitted again
      in.addData(StreamingOps.StreamDoc("doc-e", "h1", ts(92)))
      q.processAllAvailable()
      val out = spark.table("dedup_ttl_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == Set(("doc-a", "h1"), ("doc-c", "h2"), ("doc-d", "h3"), ("doc-e", "h1")),
        s"got $out")
    } finally q.stop()
  }

  test("streaming dedup TTL: a late out-of-order duplicate cannot SHORTEN the horizon") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[StreamingOps.StreamDoc]
    // 10-minute watermark delay admits disorder; horizon 10 minutes. The TTL
    // must anchor at the NEWEST sighting ever seen: re-anchoring at a late
    // duplicate's OLDER ts would evict a live hash inside its horizon
    val q = StreamingOps.dedupFirstSeen(
        in.toDS().withWatermark("ts", "10 minutes"),
        retention = Some(java.time.Duration.ofMinutes(10)))
      .writeStream.format("memory").queryName("dedup_ttl_late_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      in.addData(StreamingOps.StreamDoc("doc-a", "h1", ts(60))) // emit; timeout 70
      q.processAllAvailable()
      // late dup (ts 53 > watermark 50): suppressed; must NOT move timeout to 63
      in.addData(StreamingOps.StreamDoc("doc-b", "h1", ts(53)))
      q.processAllAvailable()
      in.addData(StreamingOps.StreamDoc("doc-c", "h2", ts(75))) // watermark -> 65
      q.processAllAvailable()
      // under the old re-anchor-at-53 bug, h1 expires here (65 > 63)
      in.addData(StreamingOps.StreamDoc("doc-d", "h3", ts(76)))
      q.processAllAvailable()
      // still inside the true horizon (watermark 66 < 70): must stay suppressed
      in.addData(StreamingOps.StreamDoc("doc-e", "h1", ts(67)))
      q.processAllAvailable()
      val out = spark.table("dedup_ttl_late_out").collect()
        .map(r => (r.getString(0), r.getString(1))).toSet
      assert(out == Set(("doc-a", "h1"), ("doc-c", "h2"), ("doc-d", "h3")),
        s"late duplicate shortened the horizon: $out")
    } finally q.stop()
  }

  test("streaming funnel: state machine advances across micro-batches, strict order within") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    import StreamingOps.StreamEvent
    val in = MemoryStream[StreamEvent]
    val q = StreamingOps.funnelDepth(in.toDS())
      .writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // batch 1 — user 1: view only; user 2: click BEFORE view (in-batch
      // (ts, event_id) order must gate it out); user 3: purchase with no view
      in.addData(
        StreamEvent(1L, 1L, ts(1), "view"),
        StreamEvent(3L, 2L, ts(3), "click"), StreamEvent(4L, 2L, ts(4), "view"),
        StreamEvent(5L, 3L, ts(5), "purchase"))
      q.processAllAvailable()
      // batch 2 — user 1 completes click+purchase (state carried over);
      // user 2's click now follows its view (cross-batch arrival order);
      // user 3 stays depth 0 (purchase without click never re-qualifies)
      in.addData(
        StreamEvent(6L, 1L, ts(6), "click"), StreamEvent(7L, 1L, ts(7), "purchase"),
        StreamEvent(8L, 2L, ts(8), "click"))
      q.processAllAvailable()
      val rows = spark.table("funnel_out").collect()
        .map(r => (r.getLong(0), r.getInt(1)))
      val perUser = rows.groupBy(_._1).view.mapValues(_.map(_._2).toList).toMap
      assert(perUser(1L) == List(1, 3), s"user 1 monotone updates: $perUser")
      assert(perUser(2L) == List(1, 2), s"user 2 click-before-view gated in batch 1: $perUser")
      assert(!perUser.contains(3L), s"user 3 never entered the funnel: $perUser")
    } finally q.stop()
  }

  test("watermarked hourly windows finalize once and drop too-late rows") {
    val s = spark
    import s.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String)]
    val q = StreamingOps.hourlyCounts(in.toDS().toDF().toDF("ts", "source"))
      .writeStream.format("memory").queryName("hourly_out")
      .outputMode("append").trigger(Trigger.ProcessingTime(0)).start()
    try {
      // three rows in hour 0 for src-a, one in hour 0 for src-b
      in.addData((ts(5), "src-a"), (ts(10), "src-a"), (ts(50), "src-a"), (ts(20), "src-b"))
      q.processAllAvailable()
      // advance event time past hour0 + 10min lateness → hour-0 windows close
      in.addData((ts(75), "src-a"))
      q.processAllAvailable()
      // this row is for hour 0 but arrives after the watermark → dropped
      in.addData((ts(30), "src-b"))
      q.processAllAvailable()
      // close hour 1 as well
      in.addData((ts(200), "src-a"))
      q.processAllAvailable()
      val out = spark.table("hourly_out").collect()
        .map(r => (r.getTimestamp(0).getTime / 60000, r.getString(1), r.getLong(2))).toSet
      assert(out.contains((0L, "src-a", 3L)), s"got $out")
      assert(out.contains((0L, "src-b", 1L)), s"late row must not bump the closed window: $out")
      assert(out.contains((60L, "src-a", 1L)), s"got $out")
    } finally q.stop()
  }
}
