package graft.tools

import java.nio.file.{Files, Paths}

import graft.engine.EngineConf
import graft.synth.Synth

/** Hot-key skew evidence (north rule: "salted-key repartition for hot-repo
  * skew"). Replays two 4M-event logs at local[16] on tmpfs:
  *
  *   - uniform-ish: 30% of events on repo-0 spread over 2000 paths
  *   - extreme:     95% of events on repo-0 spread over only 50 paths
  *                  (~76k updates per hot key)
  *
  * and the extreme log again with two-phase salted aggregation + salted
  * bucket writes. The engine's skew defense is structural: the per-key LWW
  * MERGE is an associative aggregation, so map-side partial aggregation
  * collapses a hot key to one row per map task BEFORE the shuffle — a hot
  * key never concentrates rows on one reducer. The salt configs cover the
  * residual cases (hot BUCKET writes; aggregation trees where partial
  * collapse is weak). Appends results to BENCH.md.
  *
  * Run: sbt "runMain graft.tools.SkewBench [nEvents] [out.md]"
  */
object SkewBench {

  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val outMd = args.lift(1).getOrElse("BENCH.md")
    val work = ScalingBench.workRoot()
    val k = 4
    val per = (n + k - 1) / k

    val cases = Seq(
      ("uniform (hot 30% / 2000 paths)", "u", 30, 2000, EngineConf(buckets = 64)),
      ("extreme (hot 95% / 50 paths)", "x", 95, 50, EngineConf(buckets = 64)),
      ("extreme + salted agg/writes", "x", 95, 50,
        EngineConf(buckets = 64, saltBuckets = 8, writeSaltPerBucket = 4)))

    // generate both logs once
    locally {
      val s = ScalingBench.session(32, s"$work/tmp-gen")
      import org.apache.spark.sql.functions.{col, floor}
      for ((tag, hot, paths) <- Seq(("u", 30, 2000), ("x", 95, 50)))
        Synth.events(s, n, seed = 42, repos = 200, pathsPerRepo = paths,
          hotPct = hot, parts = 64)
          .withColumn("__batch", floor(col("commit_lsn") / per))
          .repartition(64, col("__batch"), col("commit_lsn"))
          .write.partitionBy("__batch").parquet(s"$work/ev-$tag")
      s.stop()
    }

    val spark = ScalingBench.session(16, s"$work/tmp-run")
    // warmup
    locally {
      val wEv = s"$work/warm"
      import org.apache.spark.sql.functions.{col, floor}
      Synth.events(spark, 100000, seed = 7, repos = 200, pathsPerRepo = 50,
        hotPct = 95, parts = 16)
        .withColumn("__batch", floor(col("commit_lsn") / 100000))
        .write.partitionBy("__batch").parquet(wEv)
      replayWith(spark, wEv, s"$work/warmtable", 1, EngineConf(buckets = 64))
    }
    val results = cases.zipWithIndex.map { case ((label, tag, _, _, conf), i) =>
      val sec = Seq(1, 2).map(t =>
        replayWith(spark, s"$work/ev-$tag", s"$work/t-$i-$t", k, conf)).min
      println(f"  $label: $sec%.1f s, ${n / sec}%.0f events/s")
      (label, sec, n / sec)
    }
    spark.stop()

    val md =
      s"""
         |## Hot-key skew robustness — measured ${java.time.LocalDate.now()}
         |
         |${n / 1000000}M-event replays at local[16], tmpfs, best-of-2. The LWW MERGE is an
         |associative aggregation, so map-side partial aggregation collapses a hot key
         |to one row per map task before the shuffle — skew is defused structurally,
         |and the salt configs (two-phase agg, salted bucket writes) cover residual
         |hot-bucket write skew:
         |
         || scenario | wall s | events/sec |
         ||---|---|---|
         |${results.map(r => f"| ${r._1} | ${r._2}%.1f | ${r._3}%,.0f |").mkString("\n|")}
         |""".stripMargin // rows joined with "\n|": stripMargin eats one leading | per line
    Files.writeString(Paths.get(outMd), md,
      java.nio.file.StandardOpenOption.CREATE, java.nio.file.StandardOpenOption.APPEND)
    // tmpfs is RAM — sweep
    val stream = Files.walk(Paths.get(work))
    try stream.sorted(java.util.Comparator.reverseOrder[java.nio.file.Path]())
      .forEach(f => Files.deleteIfExists(f))
    finally stream.close()
  }

  private def replayWith(spark: org.apache.spark.sql.SparkSession, inputDir: String,
      tableDir: String, k: Int, conf: EngineConf): Double = {
    val table = graft.icelite.IceliteTable.create(tableDir, Seq("repo", "path"), conf.buckets)
    val engine = new graft.engine.CdcEngine(spark, table, conf)
    val batches = (0 until k).map { i =>
      (i.toLong, spark.read.schema(graft.model.ChangeEvent.schema)
        .parquet(s"$inputDir/__batch=$i"))
    }
    val t0 = System.nanoTime()
    new graft.engine.MicroBatchRunner(engine).run(batches)
    (System.nanoTime() - t0) / 1e9
  }
}
