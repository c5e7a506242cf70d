package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Measures what column-stats file skipping buys on a table big enough
  * for I/O to matter: replay N events copy-on-write with `statsCols`,
  * sort-order-rewrite by `lang` into split files, then time the same
  * selective aggregation through (a) the plain state read + filter and
  * (b) `scanRange` — identical results, different file sets. Also prints
  * the manifest-level plan (files total/skipped) so the wall-clock delta
  * is attributable. Best-of-2 per leg, interleaved a/b/a/b so a host
  * swing hits both legs alike.
  *
  * Run: sbt "runMain graft.tools.StatsBench [nEvents] [outMd]"
  */
object StatsBench {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(4000000L)
    val out = args.lift(1)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("stats-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = java.nio.file.Files.createTempDirectory("statsbench")
    val table = IceliteTable.create(s"$work/t", Seq("repo", "path"), 64)
    val engine = new CdcEngine(spark, table,
      EngineConf(buckets = 64, statsCols = Seq("lang")))

    // wide key domain so state row count ~ events (a fact-table shape)
    val ev = Synth.events(spark, n, seed = 99, repos = 2000,
      pathsPerRepo = 2000, hotPct = 5, parts = 32)
    val t0 = System.nanoTime()
    engine.applyBatch(0, ev)
    val rows = engine.currentState().count()
    println(f"ingested $n%d events -> $rows%d state rows in " +
      f"${(System.nanoTime() - t0) / 1e9}%.1f s")

    // the sort-order rewrite that makes the bounds a skip index
    val c0 = System.nanoTime()
    engine.compact(sortBy = Seq("lang"), maxFileRows = math.max(4000L, rows / 640))
    val compactSec = (System.nanoTime() - c0) / 1e9
    val filesTotal = table.currentFiles().size
    val plan = engine.scanRangePlan("lang", Some("py"), Some("py"))
    println(f"sort-rewrite: $compactSec%.1f s, $filesTotal%d files; " +
      s"plan for lang='py': $plan")

    def time(f: => Long): (Double, Long) = {
      val s = System.nanoTime(); val r = f
      ((System.nanoTime() - s) / 1e9, r)
    }
    // the selective aggregation both paths must answer identically
    def aggOf(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(sum(length(col("content")))).head().getLong(0)

    var full = Double.MaxValue
    var pruned = Double.MaxValue
    var a1 = -1L; var a2 = -2L
    (1 to 2).foreach { _ =>
      val (tf, rf) = time(aggOf(
        engine.currentState().filter(col("lang") === "py")))
      val (tp, rp) = time(aggOf(
        engine.scanRange("lang", Some("py"), Some("py"))))
      full = math.min(full, tf); pruned = math.min(pruned, tp)
      a1 = rf; a2 = rp
    }
    val check = if (a1 == a2) "results identical" else s"MISMATCH $a1 != $a2 (BUG!)"
    val line = f"| $n%d | $rows%d | $filesTotal%d | ${plan.filesSkipped}%d | " +
      f"$full%.2f | $pruned%.2f | ${full / pruned}%.2f× |"
    println(s"full-scan filter ${f"$full%.2f"} s vs pruned scan " +
      f"$pruned%.2f s (${full / pruned}%.2f× faster) — $check")
    // what does WRITE-TIME clustering cost on the ingest hot path? Same
    // events replayed into two fresh tables — plain vs writeSortCols +
    // writeMaxFileRows — interleaved best-of-2 per leg; then show the
    // clustered table prunes with no compaction at all.
    val wN = math.min(n, 2000000L)
    val wEv = Synth.events(spark, wN, seed = 77, repos = 1000,
      pathsPerRepo = 1000, hotPct = 5, parts = 32)
    def ingest(e2: CdcEngine, epoch: Long): Double = {
      val s = System.nanoTime(); e2.applyBatch(epoch, wEv)
      (System.nanoTime() - s) / 1e9
    }
    var plain = Double.MaxValue
    var sorted = Double.MaxValue
    var freshPlan: CdcEngine#ScanPlan = null
    (1 to 2).foreach { i =>
      val pT = IceliteTable.create(s"$work/p$i", Seq("repo", "path"), 64)
      val pE = new CdcEngine(spark, pT, EngineConf(buckets = 64))
      plain = math.min(plain, ingest(pE, 0))
      val sT = IceliteTable.create(s"$work/s$i", Seq("repo", "path"), 64)
      val sE = new CdcEngine(spark, sT, EngineConf(buckets = 64,
        statsCols = Seq("lang"), writeSortCols = Seq("lang"),
        writeMaxFileRows = math.max(4000L, wN / 640)))
      sorted = math.min(sorted, ingest(sE, 0))
      freshPlan = sE.scanRangePlan("lang", Some("py"), Some("py"))
    }
    val overheadPct = (sorted / plain - 1.0) * 100.0
    println(f"write-time clustering: plain ingest $plain%.1f s vs sorted+split " +
      f"$sorted%.1f s (${overheadPct}%+.1f%% hot-path cost); fresh-file plan " +
      s"for lang='py': $freshPlan (prunes with zero compactions)")
    val wLine = f"| $wN%d | $plain%.1f | $sorted%.1f | ${overheadPct}%+.1f%% | " +
      s"${freshPlan.filesSkipped}/${freshPlan.filesTotal} |"

    out.foreach { p =>
      val md =
        s"""
           |### Column-stats pruning bench (StatsBench, ${java.time.LocalDate.now})
           |
           || events | state rows | files | skipped | full-filter s | pruned s | speedup |
           ||---|---|---|---|---|---|---|
           |$line
           |
           || events | plain ingest s | clustered ingest s | overhead | fresh-file skip |
           ||---|---|---|---|---|
           |$wLine
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), md,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    ScalingBench.deleteRecursivelyPublic(work)
    spark.stop()
  }
}
