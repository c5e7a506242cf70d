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
    calibrate(16, units = 32) // JIT warm
    val c1 = calibrate(1, units = 8)
    val c4 = calibrate(4, units = 32)
    val c16 = calibrate(16, units = 32)
    val ceiling = (c4 / c16) / 4.0
    println(f"""{"metric":"host_probe","ceiling_4_16":$ceiling%.3f,""" +
      f""""busy_1x_sec":${c1 / 8.0 * 32.0}%.3f,"t4":$c4%.2f,"t16":$c16%.2f}""")
  }
}
