package graft

import graft.pipeline.GenData
import graft.kernel.Detect

/** Dev tool: single-threaded kernel throughput (payloads/sec by stage). */
object KernelBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(5000)
    val payloads = (0 until n).map(i => GenData.payload(42L, s"kb-$i")).toArray
    // warmup
    payloads.take(500).foreach(Detect.extract)
    val t0 = System.nanoTime()
    var regions = 0L
    payloads.foreach(p => regions += Detect.extract(p).length)
    val secs = (System.nanoTime() - t0) / 1e9
    println(f"[kernel-bench] n=$n regions=$regions wall=$secs%.2f s rate=${n / secs}%.0f payloads/s/core")
    // per-stage breakdown
    val byStage = payloads.groupBy(p => p(2).toInt)
    byStage.toSeq.sortBy(_._1).foreach { case (stage, ps) =>
      val t1 = System.nanoTime()
      ps.foreach(Detect.extract)
      val s1 = (System.nanoTime() - t1) / 1e9
      println(f"[kernel-bench] stage=$stage n=${ps.length} rate=${ps.length / s1}%.0f payloads/s/core")
    }
    // rotated path (rotated_bbox=True, the reference default): hull +
    // rotating calipers + rotated scoring instead of the bitset rect tail
    val cfg = graft.schema.DetectConfig.ReferenceDefault
    payloads.take(500).foreach(p => Detect.extractRendered(p, cfg))
    val t2 = System.nanoTime()
    var rspans = 0L
    payloads.foreach(p => rspans += Detect.extractRendered(p, cfg).length)
    val s2 = (System.nanoTime() - t2) / 1e9
    println(f"[kernel-bench] rotated n=$n spans=$rspans rate=${n / s2}%.0f payloads/s/core")
  }
}
