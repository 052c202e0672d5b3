package graft

import org.apache.spark.sql.SparkSession

/** Shared session factory so every entry point (jobs, bench, verify, tests)
  * runs with the same tuned configuration.
  */
object Sessions {

  /** Standard tuned builder.
    *
    * `spark.file.transferTo=false` matters a lot on this box: the bypass-merge
    * shuffle writer concatenates per-partition files with
    * FileChannel.transferTo, which mmaps/munmaps each chunk; at 32 task
    * threads the munmap TLB shootdowns serialize the whole process (observed
    * 20x task-CPU inflation under local[32], threads stuck in
    * FileChannelImpl.map0/unmap0). A plain streamed copy avoids the mmap
    * churn entirely and costs nothing at these block sizes.
    */
  def builder(master: String, shufflePartitions: Int): SparkSession.Builder =
    SparkSession.builder()
      .master(master)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      // AQE's coalesce floor stays at its 1 MB default. A 64 KB floor was
      // measured both ways this round: it parallelized CPU-dense
      // post-shuffle stages that byte-based coalescing had serialized
      // (dd3's interpreted per-pair verify, ~2.4 s), but taxed the
      // many-tiny-job iterative queries ~3-5x more tasks per sub-second
      // stage (sim5 +2 s, reproducibly). The CPU-dense stages were instead
      // fixed structurally — native expressions + map-side partials — so no
      // config knob has to trade one query against another.
      .config("spark.sql.session.timeZone", "UTC")
      // unfiltered count()/min/max over parquet read row-group METADATA
      // instead of scanning rows (off by default). Several operators pay a
      // sizing count per invocation (the mm* oracle-side keys, sim2/sim5's
      // nRows, ctn3's bloom sizing feed): value-identical, and at 100 TB a
      // metadata count is the difference between a footer read and a full
      // corpus scan.
      .config("spark.sql.parquet.aggregatePushdown", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.file.transferTo", "false")

  def local(cpus: Int, app: String = "graft"): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).appName(app).getOrCreate()
    // engine-native Catalyst expressions (graft_dot): idempotent per session
    graft.expr.GraftFunctions.register(spark)
    spark
  }
}
