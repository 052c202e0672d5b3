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
