package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Measures what MINOR compaction (`compactDeltas`) buys over the full
  * rewrite on the regime it exists for: a merge-on-read table whose BASE
  * dwarfs its churn window. One big base batch + full compaction, then
  * `k` sparse delta batches with maintenance every `every` batches —
  * regime A folds the whole bucket each time (`compact()`), regime B
  * folds only the delta pile (`compactDeltas()`). Reported: rows written
  * by maintenance (the write-amplification axis — full rewrites re-write
  * the base every cycle, minor writes only the churn), maintenance wall,
  * ingest wall, and a final state-read wall + equality check against a
  * naive control (both regimes must read identically and equal the
  * control). At 10^10 events with a bounded churn window this gap IS the
  * difference between maintenance that scales with the table and
  * maintenance that scales with the change volume.
  *
  * Run: sbt "runMain graft.tools.MinorBench [baseEvents] [deltaBatches]
  *           [deltaEvents] [every] [outMd]"
  */
object MinorBench {
  def main(args: Array[String]): Unit = {
    val baseN = args.headOption.map(_.toLong).getOrElse(4000000L)
    val k = args.lift(1).map(_.toInt).getOrElse(40)
    val deltaN = args.lift(2).map(_.toLong).getOrElse(25000L)
    val every = args.lift(3).map(_.toInt).getOrElse(8)
    val out = args.lift(4)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("minor-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("minorbench")

    def time[A](f: => A): (Double, A) = {
      val s = System.nanoTime(); val r = f
      ((System.nanoTime() - s) / 1e9, r)
    }
    // deterministic batch inputs, shared by both regimes and the control:
    // a wide-keyed base plus sparse churn batches over the same key domain
    val base = Synth.events(spark, baseN, seed = 11, repos = 2000,
      pathsPerRepo = 2000, hotPct = 5, parts = 32)
    def delta(i: Int) = Synth.events(spark, deltaN, seed = 100 + i,
      repos = 2000, pathsPerRepo = 2000, hotPct = 5, parts = 8)

    case class Run(maintRows: Long, maintSec: Double, ingestSec: Double,
        readSec: Double, rows: Long, sha: Long)
    def run(minor: Boolean): Run = {
      val label = if (minor) "minor" else "full"
      val t = IceliteTable.create(s"$work/$label/t", Seq("repo", "path"), 32,
        mergeOnRead = true)
      val e = new CdcEngine(spark, t, EngineConf(buckets = 32))
      e.applyBatch(0, base)
      e.compact() // the big merged base both regimes start from
      var maintRows = 0L
      var maintSec = 0.0
      var ingestSec = 0.0
      (1 to k).foreach { i =>
        ingestSec += time(e.applyBatch(i, delta(i)))._1
        if (i % every == 0) {
          // relative paths, matching DataFile.path below
          val beforeFiles = t.currentSnapshot.map(t.bucketFilesOf)
            .getOrElse(Map.empty).values.flatten.map(_.path).toSet
          val (s, _) = time(if (minor) e.compactDeltas() else e.compact())
          maintSec += s
          // rows WRITTEN by this maintenance = rows of files new in the
          // head snapshot (manifest math, no data read)
          maintRows += t.currentSnapshot.map(t.bucketFilesOf).getOrElse(Map.empty)
            .values.flatten.filterNot(f => beforeFiles.contains(f.path))
            .map(_.rows).sum
        }
      }
      val (readSec, stateRows) = time {
        // bit_xor: order-independent row checksum with no ANSI overflow
        val df = e.currentState().select(xxhash64(col("repo"), col("path"),
            coalesce(col("content"), lit("-"))).as("h"))
          .agg(count(lit(1)), expr("bit_xor(h)"))
        val r = df.head(); (r.getLong(0), r.getLong(1))
      }
      Run(maintRows, maintSec, ingestSec, readSec, stateRows._1, stateRows._2)
    }

    val full = run(minor = false)
    val minor = run(minor = true)
    val same = full.rows == minor.rows && full.sha == minor.sha
    val check = if (same) "states identical" else "STATE MISMATCH (BUG!)"
    println(f"base $baseN%d + $k%d x $deltaN%d churn, maintenance every $every: " +
      f"FULL rewrite wrote ${full.maintRows}%d rows in ${full.maintSec}%.1f s; " +
      f"MINOR wrote ${minor.maintRows}%d rows in ${minor.maintSec}%.1f s " +
      f"(${full.maintRows.toDouble / math.max(1, minor.maintRows)}%.1f× less write amplification); " +
      f"ingest ${full.ingestSec}%.1f vs ${minor.ingestSec}%.1f s; " +
      f"state read ${full.readSec}%.1f vs ${minor.readSec}%.1f s — $check")
    out.foreach { p =>
      val md =
        s"""
           |### Minor vs full compaction on a churned MOR table (MinorBench, ${java.time.LocalDate.now})
           |
           || regime | maint rows written | maint s | ingest s | state read s |
           ||---|---|---|---|---|
           || full rewrite every $every | ${full.maintRows} | ${f"${full.maintSec}%.1f"} | ${f"${full.ingestSec}%.1f"} | ${f"${full.readSec}%.1f"} |
           || minor (binpack) every $every | ${minor.maintRows} | ${f"${minor.maintSec}%.1f"} | ${f"${minor.ingestSec}%.1f"} | ${f"${minor.readSec}%.1f"} |
           |
           |base $baseN events, $k × $deltaN churn batches; $check.
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), md,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    ScalingBench.deleteRecursivelyPublic(work)
    spark.stop()
  }
}
