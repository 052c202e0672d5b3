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
      // AQE's coalesce floor (default 1 MB) binds ONLY when a shuffle's total
      // bytes are under cores x 1 MB — i.e. never on a production corpus,
      // where post-shuffle partitions sit near the 64 MB advisory size. At
      // probe scale, however, the floor collapsed CPU-dense post-shuffle
      // stages (dd3's 64 xxhash64 min-aggs, band-join probes) onto ONE task:
      // a ~1 MB compressed shuffle of 300k rows carries seconds of aggregate
      // CPU. 64 KB keeps those stages parallel while still coalescing truly
      // empty partitions; override via spark.sql config if a deployment wants
      // the stock floor back.
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize",
        sys.env.getOrElse("SPARK_GRAFT_MIN_PARTITION_SIZE", "64k"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.file.transferTo", "false")

  def local(cpus: Int, app: String = "graft"): SparkSession = {
    val spark = builder(s"local[$cpus]", cpus).appName(app).getOrCreate()
    // engine-native Catalyst expressions (graft_dot): idempotent per session
    graft.expr.GraftFunctions.register(spark)
    spark
  }
}
