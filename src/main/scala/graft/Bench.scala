package graft

import org.apache.spark.sql.SparkSession
import graft.pipeline.Extract

/** Per-round benchmark: measures end-to-end extraction throughput (the
  * BASELINE.json metric) and times the headline queries on
  * SPARK_GRAFT_SF_DIR. Emits ONE JSON line as the final stdout line AND
  * writes it to BENCH/last.json (the round-1 bench was unparseable because
  * sbt's log decoration wrapped stdout; build.sbt now sets
  * `run / outputStrategy := StdoutOutput` and the file is the fallback).
  *
  * Protocol notes:
  *  - extraction is measured FIRST, before any query runs, so query-phase
  *    debris (cached blocks, GC pressure, codegen fallbacks) cannot
  *    contaminate the headline number (round-1 driver bench recorded 4.4k
  *    docs/s for code that sustains ~60-100k in isolation);
  *  - queries are fully materialized through the `noop` sink — `.count()`
  *    let Catalyst prune projections and drop final sorts, timing little
  *    more than a parquet row count for map-only queries;
  *  - a query failure is recorded in `"failed"` instead of silently
  *    contributing a normal-looking elapsed time.
  *
  * dd3_dedup_minhash is excluded from the headline set: on this synthetic
  * corpus ~29% of ALL doc pairs are true near-duplicates (tiny shared
  * vocabulary), so its output — and any correct near-dup finder's — is
  * O(n^2) in rows; its runtime measures the corpus, not the engine. It stays
  * in Verify (sf0.01) and its own tests.
  */
object Bench {
  /** Public: CodegenGuardSpec replays this exact set under fail-fast codegen.
    * dd3 appears as its 0.9-gate variant: the 0.6 run's output is O(n^2) on
    * this degenerate corpus (see scaladoc above) and would measure the
    * corpus; at 0.9 the output is small and the LSH path's runtime is
    * driver-visible (round-2 verdict item 9).
    */
  val headline = Seq(
    "x1_extract_spans", "x2_extract_metrics", "x3_extract_rotated", "x4_extract_full",
    "q1_pricing_agg", "q2_market_revenue", "q3_nation_top_customers",
    "q4_shipdate_filter", "q5_priority_heavy_orders", "q6_brand_stats", "q7_shipping_priority",
    "ev1_hourly_events", "ev2_user_sessions", "ev3_props_agg", "ev4_funnel", "ev5_retention",
    "src1_gt_summary",
    "txt1_token_count", "txt2_quality_score", "txt3_langid", "txt4_fingerprints",
    "txt5_repetition", "qf1_quality_filter",
    "dd1_dedup_exact", "dd2_ngram_jaccard", "dd3_dedup_minhash09",
    "dd4_dedup_simhash", "dd5_dedup_embedding", "dd6_dup_ngrams", "dd7_dup_clusters",
    "sim1_cosine_topk", "sim2_ann_ivf", "sim3_srp_lsh", "sim4_srp_banded",
    "mm1_media_meta", "mm2_image_meta")

  /** Fixed single-thread spin (800M xorshift steps), timed: a load-independent
    * unit of work whose wall time exposes the host's CURRENT deliverable CPU.
    * This box's VM throttles ~4x between minutes (BENCH/BASELINE.md); the
    * round-2 driver bench burned its headline on such a window. A reader can
    * now normalize: spin_secs 2x a clean run's means every CPU-bound number
    * in this emission is ~2x inflated.
    */
  def spinSecs(): Double = {
    var x = 0x9e3779b97f4a7c15L
    val t0 = System.nanoTime()
    var i = 0
    while (i < 800000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
    val dt = (System.nanoTime() - t0) / 1e9
    if (x == 42L) System.err.println("") // defeat dead-code elimination
    dt
  }

  /** The same fixed spin on ALL cores at once (wall of the slowest thread):
    * this VM's throttle can cut deliverable MULTI-core capacity while
    * single-thread speed stays normal (observed: extraction 6x slower with
    * the 1-thread spin unchanged), so both spins are emitted — 1-thread for
    * per-core speed, N-thread for core capacity. On a clean host the two are
    * within ~1.3x of each other.
    */
  def spinSecsParallel(n: Int): Double = {
    val t0 = System.nanoTime()
    val threads = (0 until n).map { t =>
      new Thread(() => {
        var x = 0x9e3779b97f4a7c15L + t
        var i = 0
        while (i < 800000000) { x ^= x << 13; x ^= x >>> 7; x ^= x << 17; i += 1 }
        if (x == 42L) System.err.println("")
      })
    }
    threads.foreach(_.start())
    threads.foreach(_.join())
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = Sessions.local(cpus.toInt, "graft-bench")
    implicit val s: SparkSession = spark
    spark.sparkContext.setLogLevel("ERROR")
    // Burst-credit guard: a heavy run launched right after another heavy run
    // (the driver runs Bench straight after Verify) STARTS throttled and
    // recovers minutes in — observed extraction attempts [146, 94, 38]s with
    // spinN 3.9s at start and 1.9s (clean) at the end of the same process.
    // Wait out a throttled start, bounded: up to 3 x 75s while the N-thread
    // spin reads > 1.35x the clean baseline (~1.9s on this box).
    var spin32Before = spinSecsParallel(cpus.toInt)
    var waitedSecs = 0
    while (spin32Before > 2.6 && waitedSecs < 225) {
      Thread.sleep(75000)
      waitedSecs += 75
      spin32Before = spinSecsParallel(cpus.toInt)
    }
    val spinBefore = spinSecs()

    // ---- phase 1: extraction throughput, in a clean JVM/session ----
    // docs/sec end to end over a pre-written input table (generation and
    // input write are NOT part of the measured job, matching the
    // ScalingBench protocol): read parquet -> extract -> write parquet.
    // x50 puts the sf0.1 corpus at 400k docs (~4-6s of extraction at
    // local[32]): large enough that per-job fixed overhead (~0.5s) is noise,
    // small enough to generate once and reuse across rounds
    val nDocs = graft.operators.ExtractOps.nDocsFor(sfDir) * 50
    // cache key carries doc count, seed, and the generator fingerprint — a
    // generator change can't silently reuse a stale corpus (round-2 ADVICE)
    val benchBase =
      s"/tmp/graft_bench_input_${nDocs}_s${graft.pipeline.GenData.DefaultSeed}_${graft.pipeline.GenData.Fingerprint}"
    if (!new java.io.File(s"$benchBase/docs2/_SUCCESS").exists()) {
      val (docs, media) = Extract.generate(nDocs)
      // doc_id/media_ref range layout — the engine's documented input
      // contract (Extract scaladoc; ScalingBench prep writes the same).
      // Measured: the raw generator write costs ~3x wall on the same data.
      docs.repartitionByRange(64, docs("doc_id"))
        .write.mode("overwrite").parquet(s"$benchBase/docs2")
      media.repartitionByRange(64, media("media_ref"))
        .write.mode("overwrite").parquet(s"$benchBase/media2")
    }
    import spark.implicits._
    val bd = spark.read.parquet(s"$benchBase/docs2").as[graft.schema.Doc]
    val bm = spark.read.parquet(s"$benchBase/media2").as[graft.schema.Media]
    // warm the exact plan (Janino + C2 compilation dominates cold runs), then best of 2
    Extract.run(bd, bm).write.mode("overwrite").parquet(s"$benchBase/warm")
    // best of 3: this box's deliverable CPU swings up to 4x between minutes;
    // the per-attempt list is emitted so a throttle window INSIDE this run is
    // visible in the artifact (observed same-corpus swings: 4.8s .. 31.6s)
    val extractAttempts = (1 to 3).map { _ =>
      val t0 = System.nanoTime()
      Extract.run(bd, bm).write.mode("overwrite").parquet(s"$benchBase/out")
      (System.nanoTime() - t0) / 1e9
    }
    val extractSecs = extractAttempts.min
    val docsPerSec = nDocs / extractSecs

    // ---- phase 2: headline queries, fully materialized ----
    // Warm EVERY query once at the smallest sf first: plan shapes are
    // sf-independent, so this pays each query's one-time Catalyst + Janino +
    // C2 compilation outside the timed run (measured: 8-30x of a 500-row
    // query's steady-state time, under VM cpu throttle up to 190s once).
    headline.foreach { name =>
      try SparkEntry.queries(name)(spark, "/root/testdata/sf0.001")
        .write.format("noop").mode("overwrite").save()
      catch { case scala.util.control.NonFatal(_) => () }
    }
    // best-of-2 per query after the warm pass: a single host-throttle window
    // (this VM swings ~4x between minutes) can no longer fake a regression
    // on whichever query it happened to land on — it must hit the SAME query
    // in both passes. Pass order is whole-set round-robin so the two timings
    // of one query land minutes apart, outside one throttle window.
    def timeOnce(name: String): (Double, Boolean) = {
      val t0 = System.nanoTime()
      val ok =
        try {
          SparkEntry.queries(name)(spark, sfDir).write.format("noop").mode("overwrite").save()
          true
        } catch { case scala.util.control.NonFatal(_) => false }
      ((System.nanoTime() - t0) / 1e9, ok)
    }
    val pass1 = headline.map(n => n -> timeOnce(n)).toMap
    val pass2 = headline.map(n => n -> timeOnce(n)).toMap
    val results = headline.map { n =>
      val (t1, ok1) = pass1(n)
      val (t2, ok2) = pass2(n)
      (n, math.min(t1, t2), ok1 || ok2)
    }
    val spinAfter = spinSecs()
    val spin32After = spinSecsParallel(cpus.toInt)

    val qs = results.map { case (k, v, _) => "\"" + k + f"\":$v%.3f" }.mkString("{", ",", "}")
    val failed = results.collect { case (k, _, false) => "\"" + k + "\"" }.mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir","cpus":$cpus,"extract_docs":$nDocs,"extract_secs":$extractSecs%.3f,"extract_docs_per_sec":$docsPerSec%.1f,"extract_attempt_secs":${extractAttempts.map(t => f"$t%.3f").mkString("[", ",", "]")},"host_spin_secs_before":$spinBefore%.3f,"host_spin_secs_after":$spinAfter%.3f,"host_spin_nthread_secs_before":$spin32Before%.3f,"host_spin_nthread_secs_after":$spin32After%.3f,"throttle_wait_secs":$waitedSecs}"""
    new java.io.File("BENCH").mkdirs()
    java.nio.file.Files.writeString(java.nio.file.Paths.get("BENCH/last.json"), json + "\n")
    spark.stop()
    // guaranteed-last stdout line (after spark.stop so no executor logs follow)
    println(json)
  }
}
