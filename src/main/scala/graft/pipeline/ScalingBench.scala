package graft.pipeline

import org.apache.spark.sql.{SaveMode, SparkSession}

/** Sandbox protocol for the north rule's two-cluster-size scaling gate
  * (BASELINE.md §"Sandbox measurement protocol"): the same extraction job on
  * the same pre-written input, submitted once per parallelism level (separate
  * JVMs — the local analog of two spark-submit runs at N and 4N executors):
  *
  *   ScalingBench prep <nDocs> <base>          — write input tables once
  *   ScalingBench measure <cpus> <base>        — warm, then best-of-2 timed runs
  *   ScalingBench compare <base> <c1> <c2>     — outputs byte-equal across levels
  *
  * efficiency = (tp_4N / tp_N) / 4, gate >= 0.8.
  */
object ScalingBench {

  private def session(cpus: Int): SparkSession =
    graft.Sessions.local(cpus, s"graft-scaling-$cpus")

  def main(args: Array[String]): Unit = args.toList match {
    case "prep" :: nDocsS :: base :: Nil =>
      val nDocs = nDocsS.toLong
      val spark = session(32)
      implicit val s: SparkSession = spark
      val (docs, media) = Extract.generate(nDocs)
      docs.repartitionByRange(64, docs("doc_id")).write.mode(SaveMode.Overwrite).parquet(s"$base/docs")
      media.repartitionByRange(64, media("media_ref")).write.mode(SaveMode.Overwrite).parquet(s"$base/media")
      println(s"""{"prep":$nDocs,"base":"$base"}""")
      spark.stop()

    case "measure" :: cpusS :: base :: Nil =>
      val cpus = cpusS.toInt
      // Burst-credit guard on BOTH axes before the leg starts (round-3
      // lesson: every 8-thread leg of the instrumented series ran with
      // drained DISK credits that the CPU spin could not see, producing an
      // unphysical raw pair). Bounded wait, then ALWAYS emit the probes so a
      // still-dirty leg self-flags numerically. Wait budget via
      // GRAFT_PROBE_WAIT_SECS (default 450; disk credits refill on idle).
      val waitBudget = sys.env.getOrElse("GRAFT_PROBE_WAIT_SECS", "450").toInt
      var spinN = graft.Bench.spinSecsParallel(cpus)
      var disk = graft.Bench.diskMbps("/tmp")
      var waited = 0
      while ((spinN > graft.Bench.SpinDirtySecs || disk < graft.Bench.DiskDirtyMbps)
             && waited < waitBudget) {
        Thread.sleep(75000)
        waited += 75
        spinN = graft.Bench.spinSecsParallel(cpus)
        disk = graft.Bench.diskMbps("/tmp")
      }
      val spark = session(cpus)
      implicit val s: SparkSession = spark
      import spark.implicits._
      val docs = spark.read.parquet(s"$base/docs").as[graft.schema.Doc]
      val media = spark.read.parquet(s"$base/media").as[graft.schema.Media]
      val nDocs = docs.count()
      // Warm this session's codegen/JIT on the full plan before timing: the
      // first execution pays Janino compilation + C2 JIT once per session
      // (and contends across task threads); production amortizes it over
      // hours, so the measured run should too.
      Extract.run(docs, media).write.mode(SaveMode.Overwrite).parquet(s"$base/warmup_$cpus")
      val attempts = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        Extract.run(docs, media).write.mode(SaveMode.Overwrite).parquet(s"$base/out_$cpus")
        (System.nanoTime() - t0) / 1e9
      }
      val secs = attempts.min
      val spinAfter = graft.Bench.spinSecsParallel(cpus)
      val diskAfter = graft.Bench.diskMbps("/tmp")
      val att = attempts.map(t => f"$t%.2f").mkString("[", ",", "]")
      println(f"""{"cpus":$cpus,"docs":$nDocs,"secs":$secs%.2f,"docs_per_sec":${nDocs / secs}%.1f,"attempt_secs":$att,"spin_nthread_before":$spinN%.2f,"spin_nthread_after":$spinAfter%.2f,"disk_mbps_before":$disk%.1f,"disk_mbps_after":$diskAfter%.1f,"probe_wait_secs":$waited}""")
      spark.stop()

    case "compare" :: base :: c1 :: c2 :: Nil =>
      val spark = session(8)
      val a = spark.read.parquet(s"$base/out_$c1").selectExpr("doc_id", "to_json(spans) js")
      val b = spark.read.parquet(s"$base/out_$c2").selectExpr("doc_id", "to_json(spans) js")
      val diff = a.exceptAll(b).count() + b.exceptAll(a).count()
      println(s"""{"compare":"$c1 vs $c2","diff_rows":$diff,"identical":${diff == 0}}""")
      spark.stop()
      if (diff != 0) sys.exit(1)

    case other =>
      System.err.println(s"usage: ScalingBench prep <nDocs> <base> | measure <cpus> <base> | compare <base> <c1> <c2> (got $other)")
      sys.exit(2)
  }
}
