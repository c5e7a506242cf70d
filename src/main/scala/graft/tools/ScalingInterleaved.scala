package graft.tools

import java.nio.file.{Files, Paths}

/** Drift-proof variant of [[ScalingBench]]: the sequential protocol (all
  * local[N] trials, then all local[4N]) is structurally vulnerable to this
  * sandbox's host swings — if the machine's effective capacity changes
  * between the two phases, the ratio measures the HOST's drift, not the
  * engine's scaling (observed both directions: a 0.26 "efficiency" from a
  * degraded 4N phase, and a meaningless 1.33 super-linear one from a
  * degraded N phase). Here each ROUND runs calibrate(N), calibrate(4N),
  * replay(N), replay(4N) back-to-back (~3-5 min of adjacency instead of
  * ~15), emits its own JSON line with its own machine ceiling, and the
  * summary reports the round with the highest ceiling — the sample taken
  * in the healthiest, most self-consistent window.
  *
  * Run: sbt "runMain graft.tools.ScalingInterleaved [nEvents] [nBatches]
  * [rounds] [out.md]". Defaults: 16M, 4, 3 rounds, BENCH.md appended.
  * SPARK_GRAFT_LEVELS as in ScalingBench.
  */
object ScalingInterleaved {

  case class Round(idx: Int, ceiling: Double, ceilingValid: Boolean,
      smallSec: Double, bigSec: Double) {
    def speedup: Double = smallSec / bigSec
  }

  /** Per-round machine ceiling, made robust the way HostProbe is: the
    * single-shot ScalingBench.calibrate legs are 0.1-0.5 s — far too short
    * to be stable on this VM (observed per-round readings of 0.41 and 4.46
    * bracketing replay legs that were themselves rock-steady). Each level
    * here runs ~2-5 s of busy work, best-of-2 (min = fastest observed, robust
    * to one-sided stalls), and the result is validity-checked: a pure-CPU
    * N→4N efficiency above 1.05 is physically impossible and one below 0.05
    * means a leg stalled outright — retry once, then mark the round's
    * ceiling invalid rather than let a glitched 100 ms measurement pick (or
    * veto) the reporting round. */
  def robustCeiling(nc: Int, bc: Int, factor: Double): (Double, Boolean) = {
    def leg(thr: Int): Double =
      (1 to 2).map(_ => ScalingBench.calibrate(thr, units = 256)).min
    def once(): Double = (leg(nc) / leg(bc)) / factor
    def plausible(c: Double): Boolean = c > 0.05 && c <= 1.05
    val first = once()
    if (plausible(first)) (first, true)
    else { val second = once(); (second, plausible(second)) }
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(16000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(4)
    val rounds = args.lift(2).map(_.toInt).getOrElse(3)
    val outMd = args.lift(3).getOrElse("BENCH.md")
    val levels = sys.env.getOrElse("SPARK_GRAFT_LEVELS", "4,16")
      .split(",").map(_.trim.toInt).toSeq
    val (nc, bc) = (levels.head, levels.last)
    val factor = bc.toDouble / nc
    val work = ScalingBench.workRoot()
    ScalingBench.generate(work, n, k)
    ScalingBench.calibrate(bc) // JIT warm

    val results = (1 to rounds).map { r =>
      val (ceil, ceilValid) = robustCeiling(nc, bc, factor)
      val sSmall = {
        val s = ScalingBench.session(nc, s"$work/tmp-$nc-$r")
        ScalingBench.replay(s, s"$work/warmevents", s"$work/warm-$nc-$r", 1)
        val t = ScalingBench.replay(s, s"$work/events", s"$work/table-$nc-$r", k)
        s.stop(); t
      }
      val sBig = {
        val s = ScalingBench.session(bc, s"$work/tmp-$bc-$r")
        ScalingBench.replay(s, s"$work/warmevents", s"$work/warm-$bc-$r", 1)
        val t = ScalingBench.replay(s, s"$work/events", s"$work/table-$bc-$r", k)
        s.stop(); t
      }
      // sweep this round's tables off tmpfs (RAM!) immediately: letting
      // 2 legs x N rounds of parquet pile up in /dev/shm puts later rounds
      // under memory pressure earlier rounds didn't have — the exact
      // measurement confound the ReplayProfile harness taught us about
      for (c <- Seq(nc, bc); d <- Seq("tmp", "warm", "table"))
        ScalingBench.deleteRecursivelyPublic(Paths.get(s"$work/$d-$c-$r"))
      val round = Round(r, ceil, ceilValid, sSmall, sBig)
      println(f"""{"metric":"cdc_scaling_round","round":$r,"ceiling":$ceil%.3f,""" +
        f""""ceiling_valid":$ceilValid,""" +
        f""""local${nc}_sec":$sSmall%.2f,"local${bc}_sec":$sBig%.2f,""" +
        f""""local${bc}_eps":${n / sBig}%.0f,"efficiency":${round.speedup / factor}%.3f}""")
      round
    }

    // The healthiest self-consistent window = the round with the highest
    // same-round VALID ceiling AMONG consistent rounds. A round whose
    // efficiency exceeds its own ceiling by >25% is inconsistent:
    // super-linear scaling is impossible, so the host moved WITHIN the
    // round. That rule is one-sided — it cannot see a 4N leg that COLLAPSED
    // mid-round (under-scaling is always "possible"), observed as a 70.9 s
    // local[16] leg bracketed by 24-26 s readings of the same input while
    // the round's own local[4] leg ran at record speed. The LEG-BALANCE
    // check is the symmetric complement: score each leg against the run's
    // best observation of THAT leg; a round whose two legs sit at very
    // different health (ratio > 1.67, i.e. one leg >40% further from its
    // best than the other) had the host move between its legs, whichever
    // direction, and cannot report a meaningful ratio. Rounds whose ceiling
    // measurement failed validity can neither win nor veto — fall back
    // progressively rather than crash.
    val bestSmall = results.map(_.smallSec).min
    val bestBig = results.map(_.bigSec).min
    def legBalance(r: Round): Double = {
      val smallHealth = bestSmall / r.smallSec // 1.0 = this run's best leg
      val bigHealth = bestBig / r.bigSec
      math.max(smallHealth, bigHealth) / math.min(smallHealth, bigHealth)
    }
    def isConsistent(r: Round): Boolean =
      r.ceilingValid && r.speedup / factor <= r.ceiling * 1.25 &&
        legBalance(r) <= 1.67
    val pool = results.filter(isConsistent) match {
      case Seq() => results.filter(_.ceilingValid) match {
        case Seq() => results
        case valid => valid
      }
      case ok => ok
    }
    val best = pool.maxBy(_.ceiling)
    val bestEff = best.speedup / factor
    val consistent = isConsistent(best)
    // The CONSERVATIVE sample: the lowest-efficiency consistent round. Host
    // drift mostly stretches the long local[N] leg, which can only FLATTER
    // the ratio — so the minimum over consistent rounds is the defensible
    // lower bound on the engine's true scaling.
    val cons = pool.minBy(_.speedup)
    val consEff = cons.speedup / factor
    val json =
      f"""{"metric":"cdc_scaling_interleaved","events":$n,"batches":$k,"rounds":$rounds,""" +
        f""""best_round":${best.idx},"best_ceiling":${best.ceiling}%.3f,""" +
        f""""local${nc}_sec":${best.smallSec}%.2f,"local${bc}_sec":${best.bigSec}%.2f,""" +
        f""""local${nc}_eps":${n / best.smallSec}%.0f,"local${bc}_eps":${n / best.bigSec}%.0f,""" +
        f""""speedup":${best.speedup}%.3f,"efficiency":$bestEff%.3f,""" +
        f""""conservative_round":${cons.idx},"conservative_efficiency":$consEff%.3f,""" +
        f""""conservative_ceiling":${cons.ceiling}%.3f,""" +
        s""""within_round_consistent":$consistent,""" +
        s""""round_leg_balance":[${results.map(r => f"${legBalance(r)}%.2f").mkString(",")}]}"""
    println(json)
    val md =
      s"""
         !## CDC replay scaling, INTERLEAVED protocol — measured ${java.time.LocalDate.now()}
         !
         !Same 16M-event replay as ScalingBench, but each round runs
         !calibrate($nc), calibrate($bc), replay($nc), replay($bc) back-to-back and
         !carries its own machine ceiling — immune to the host drifting between
         !the N and 4N phases (which produced both a spurious 0.26 and a
         !spurious 1.33 under the sequential protocol on this VM).
         !
         !| round | ceiling | local[$nc] s | local[$bc] s | efficiency |
         !|---|---|---|---|---|
         !${results.map(r => f"| ${r.idx} | ${r.ceiling}%.2f${if (r.ceilingValid) "" else " (invalid)"} | ${r.smallSec}%.1f | ${r.bigSec}%.1f | ${r.speedup / factor}%.2f |").mkString("\n")}
         !
         !Best-ceiling consistent round: **efficiency ${f"$bestEff%.2f"} at ceiling
         !${f"${best.ceiling}%.2f"}** (${f"${n / best.bigSec}%,.0f"} ev/s at local[$bc]).
         !Conservative bound (lowest-efficiency consistent round ${cons.idx}):
         !**efficiency ${f"$consEff%.2f"} at ceiling ${f"${cons.ceiling}%.2f"}**
         !(${f"${n / cons.bigSec}%,.0f"} ev/s at local[$bc]).
         !""".stripMargin('!')
    Files.writeString(Paths.get(outMd), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    ScalingBench.deleteRecursivelyPublic(Paths.get(work))
  }
}
