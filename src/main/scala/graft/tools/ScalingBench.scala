package graft.tools

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

import graft.engine.{CdcEngine, EngineConf, MicroBatchRunner}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** North-rule scaling evidence (BASELINE.json): the same CDC replay run at two
  * parallelism levels on identical input, reporting sustained change-events/sec
  * at both plus scaling efficiency = (T_small / T_big) / (big/small cores).
  *
  * No real cluster exists in this sandbox, so "N vs 4N executors" is evidenced
  * as `local[8]` vs `local[32]` (the driver-sanctioned substitution): each
  * level gets a fresh SparkSession (the previous one stopped), shuffle
  * partitions scaled with cores, and replays the SAME pre-written parquet
  * event log into a fresh icelite table.
  *
  * Run: sbt "runMain graft.tools.ScalingBench [nEvents] [nBatches] [out.md]"
  * Defaults: 4,000,000 events, 8 batches, BENCH.md appended.
  */
object ScalingBench {

  case class Level(cores: Int, seconds: Double, eventsPerSec: Double)

  def session(cores: Int): SparkSession = {
    val s = SparkSession.builder()
      .master(s"local[$cores]")
      .appName(s"cdc-scaling-$cores")
      .config("spark.sql.shuffle.partitions", cores.toString)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.driver.memory", sys.env.getOrElse("SPARK_DRIVER_MEM", "8g"))
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  /** Replay the event log at `inputDir` (already on disk) in `k` lsn-range
    * batches into a fresh table; returns wall seconds for the apply loop only
    * (read+merge+write+commit — generation excluded). */
  def replay(spark: SparkSession, inputDir: String, tableDir: String,
      n: Long, k: Int, cores: Int): Double = {
    val table = IceliteTable.create(tableDir, Seq("repo", "path"), buckets = 64)
    val engine = new CdcEngine(spark, table, EngineConf(buckets = 64))
    val ev = spark.read.parquet(inputDir)
    val per = (n + k - 1) / k
    val batches = (0 until k).map { i =>
      (i.toLong, ev.filter(ev("commit_lsn") >= i * per && ev("commit_lsn") < (i + 1) * per))
    }
    val t0 = System.nanoTime()
    new MicroBatchRunner(engine).run(batches)
    (System.nanoTime() - t0) / 1e9
  }

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(8)
    val outMd = args.lift(2).getOrElse("BENCH.md")
    val work = Files.createTempDirectory("scaling").toString
    val input = s"$work/events"

    // Generate ONCE (deterministic, seed=42) and write to parquet so both
    // levels replay byte-identical input.
    {
      val s = session(32)
      Synth.events(s, n, seed = 42, repos = 200, pathsPerRepo = 2000, hotPct = 30, parts = 64)
        .write.parquet(input)
      s.stop()
    }

    val levels = Seq(8, 32).map { cores =>
      val s = session(cores)
      // warmup: tiny replay to JIT/codegen-compile the pipeline
      replay(s, input, s"$work/warm-$cores", n = math.min(n, 50000L), k = 1, cores = cores)
      val secs = replay(s, input, s"$work/table-$cores", n, k, cores)
      s.stop()
      Level(cores, secs, n / secs)
    }
    val small = levels.head; val big = levels.last
    val speedup = small.seconds / big.seconds
    val eff = speedup / (big.cores.toDouble / small.cores)
    val json =
      s"""{"metric":"cdc_scaling","events":$n,"batches":$k,""" +
        levels.map(l => s""""local${l.cores}_sec":${f"${l.seconds}%.2f"},"local${l.cores}_eps":${f"${l.eventsPerSec}%.0f"}""").mkString(",") +
        s""","speedup":${f"$speedup%.3f"},"efficiency":${f"$eff%.3f"}}"""
    println(json)
    val md =
      s"""
         |## CDC replay scaling (north rule) — measured ${java.time.LocalDate.now()}
         |
         |Same deterministic event log (seed=42, ${n / 1000000.0}M events, $k micro-batches,
         |30% hot-repo skew) replayed into a fresh icelite table at two parallelism
         |levels, fresh SparkSession each, shuffle partitions = cores:
         |
         || level | wall s | events/sec |
         ||---|---|---|
         || local[${small.cores}] | ${f"${small.seconds}%.1f"} | ${f"${small.eventsPerSec}%,.0f"} |
         || local[${big.cores}] | ${f"${big.seconds}%.1f"} | ${f"${big.eventsPerSec}%,.0f"} |
         |
         |Speedup ${f"$speedup%.2f"}x over a ${big.cores / small.cores}x core increase ⇒
         |**scaling efficiency ${f"$eff%.2f"}** (north-rule target ≥ 0.8).
         |""".stripMargin
    Files.writeString(Paths.get(outMd), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
  }
}
