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
