package graft.operators

import org.apache.spark.sql.Dataset

/** Parallelism guard for CPU-dense per-row stages (image decode, winnowing
  * fingerprints, HTML/PDF render+parse): when the upstream scan supplies
  * fewer input splits than the session has cores — the synthetic corpora
  * here are single small parquet files, hence ONE split — the whole stage
  * inherits single-task execution and 31 of 32 cores idle (measured: txt4
  * 31.4 s → 1.6 s, mm3 17.4 s → 1.1 s at sf0.1).
  *
  * `spread` repartitions to `defaultParallelism` ONLY in that case. At
  * production scale the guard is a no-op: a 100 TB input arrives in
  * thousands of splits, so no shuffle is ever added to a large scan —
  * exactly the property that makes an unconditional `repartition(n)` wrong
  * at 100× and a files.minPartitionNum hint useless here (a one-row-group
  * parquet file yields one non-empty task no matter how it is range-split).
  */
object Par {
  def spread[T](ds: Dataset[T]): Dataset[T] = {
    val cores = ds.sparkSession.sparkContext.defaultParallelism
    if (ds.rdd.getNumPartitions < cores) ds.repartition(cores) else ds
  }
}
