package graft

/** Standalone host-capacity probe: prints the 1-thread and N-thread fixed
  * spins (see Bench.spinSecs/spinSecsParallel) plus the implied effective
  * core count `n * spin1 / spinN`. Run beside ScalingBench measurements so
  * each reading carries the host weather it was taken in — this VM's
  * deliverable multi-core capacity swings independently of per-core speed,
  * and the N-vs-4N efficiency gate is only meaningful against the cores the
  * host actually delivered in that minute.
  */
object SpinProbe {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toInt).getOrElse(32)
    val s1 = Bench.spinSecs()
    val sn = Bench.spinSecsParallel(n)
    println(f"""{"spin1_secs":$s1%.3f,"spin${n}_secs":$sn%.3f,"effective_cores":${n * s1 / sn}%.1f}""")
  }
}
