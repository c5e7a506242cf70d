package graft.tools

import java.nio.file.{Files, Paths}

/** Phase profile of one CDC replay leg: replays the standard deterministic
  * event log at a single parallelism level and prints the engine's
  * per-epoch phase metrics (lineage / merge+write / manifest / commit /
  * maintenance) plus the residual the metrics do NOT cover (batch-to-batch
  * runner overhead). The point is Amdahl attribution: phases whose cost
  * does not shrink local[4] -> local[16] are the serial fraction that caps
  * the north rule's scaling efficiency.
  *
  * Run: sbt "runMain graft.tools.ReplayProfile [nEvents] [nBatches] [cores]
  * [configs] [trials]" — `configs` is a comma list of shuffle tunings, each
  * `<partsPerCore>` with an optional `a` suffix enabling AQE (e.g.
  * "1,2,4a"); all configs replay the same generated input, interleaved
  * config-by-config per trial so a host swing cannot masquerade as a
  * config difference.
  */
object ReplayProfile {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(16000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(4)
    val cores = args.lift(2).map(_.toInt).getOrElse(16)
    val configs = args.lift(3).getOrElse("1").split(",").map(_.trim).toSeq
    val trials = args.lift(4).map(_.toInt).getOrElse(1)
    val work = ScalingBench.workRoot()
    ScalingBench.generate(work, n, k)

    for (t <- 1 to trials; cfg <- configs) {
      val aqe = cfg.endsWith("a")
      val ppc = cfg.stripSuffix("a").toInt
      val tableDir = s"$work/table-$cfg-$t"
      val s = ScalingBench.session(cores, s"$work/tmp-$cfg-$t", ppc, aqe)
      ScalingBench.replay(s, s"$work/warmevents", s"$work/warm-$cfg-$t", 1)
      val wall = ScalingBench.replay(s, s"$work/events", tableDir, k)
      s.stop()
      val lines = Files.readAllLines(Paths.get(s"$tableDir/metrics.jsonl"))
      lines.forEach(l => println(l))
      // residual = wall - sum(per-epoch totals): session/runner overhead
      val totals = lines.toArray.map(_.toString)
        .flatMap("\"millis\":(\\d+)".r.findFirstMatchIn(_)).map(_.group(1).toLong)
      println(f"""{"metric":"replay_profile","cores":$cores,"events":$n,""" +
        f""""config":"$cfg","trial":$t,""" +
        f""""wall_sec":$wall%.2f,"eps":${n / wall}%.0f,""" +
        f""""epoch_total_sec":${totals.sum / 1e3}%.2f,""" +
        f""""runner_residual_sec":${wall - totals.sum / 1e3}%.2f}""")
    }
    ScalingBench.deleteRecursivelyPublic(Paths.get(work))
  }
}
