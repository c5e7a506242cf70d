package graft.tools

/** ~15 s host-health probe: prints the machine's pure-CPU 4->16-thread
  * scaling ceiling and the 1-thread probe time (ScalingBench.calibrate),
  * no Spark. Used to pick a HEALTHY window for north-rule scaling samples —
  * this sandbox's effective parallel capacity swings 0.4-0.95 within hours
  * (steal/overcommit), and a sample taken in a bad window measures the
  * host, not the engine (the round-3 lesson). */
object HostProbe {
  def main(args: Array[String]): Unit = {
    import ScalingBench.calibrate
    // Mirror ScalingBench's in-run estimator (64 units after JIT warm): a
    // 32-unit single-shot probe reads systematically LOW vs the ceiling the
    // scaling run itself will record (same-minute observations: probe 0.48
    // vs in-run 0.80) — tiny 0.05s windows are dominated by scheduler
    // noise. Best-of-2 per level de-noises downward spikes; a false
    // positive only costs one bounded scaling run.
    calibrate(16) // JIT warm
    val c1 = calibrate(1, units = 8)
    val c4 = (1 to 2).map(_ => calibrate(4)).min
    val c16 = (1 to 2).map(_ => calibrate(16)).min
    val ceiling = (c4 / c16) / 4.0
    println(f"""{"metric":"host_probe","ceiling_4_16":$ceiling%.3f,""" +
      f""""busy_1x_sec":${c1 / 8.0 * 32.0}%.3f,"t4":$c4%.2f,"t16":$c16%.2f}""")
  }
}
