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
      .withExtensions(new graft.sql.IceliteSqlExtensions)
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
      EngineConf(buckets = 64, statsCols = Seq("lang", "commit")))

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

    def time[A](f: => A): (Double, A) = {
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

    // Z-ORDER: the multi-column counterpart. Under the lexicographic
    // lang-sort above, a predicate on the INDEPENDENT `commit` column can
    // skip nothing (its per-file bounds are full-width); rewrite the same
    // table on the Morton key of (lang, commit) and BOTH dims prune —
    // each at ~sqrt tightness instead of one at full tightness.
    val sortCommitPlan =
      engine.scanRangePlan("commit", Some("c05"), Some("c06"))
    val z0 = System.nanoTime()
    engine.compact(zorderBy = Seq("lang", "commit"),
      maxFileRows = math.max(4000L, rows / 640))
    val zCompactSec = (System.nanoTime() - z0) / 1e9
    val zLang = engine.scanRangePlan("lang", Some("py"), Some("py"))
    val zCommit = engine.scanRangePlan("commit", Some("c05"), Some("c06"))
    var zFullC = Double.MaxValue; var zPrunedC = Double.MaxValue
    var zc1 = -1L; var zc2 = -2L
    (1 to 2).foreach { _ =>
      val (tf, rf) = time(aggOf(engine.currentState()
        .filter(col("commit").between("c05", "c06"))))
      val (tp, rp) = time(aggOf(
        engine.scanRange("commit", Some("c05"), Some("c06"))))
      zFullC = math.min(zFullC, tf); zPrunedC = math.min(zPrunedC, tp)
      zc1 = rf; zc2 = rp
    }
    val zCheck = if (zc1 == zc2) "results identical"
      else s"MISMATCH $zc1 != $zc2 (BUG!)"
    println(f"z-order rewrite (lang, commit): $zCompactSec%.1f s; " +
      s"lang='py' plan $zLang, commit in [c05,c06] plan $zCommit " +
      s"(was $sortCommitPlan under the lang sort); commit-range agg " +
      f"full $zFullC%.2f s vs pruned $zPrunedC%.2f s " +
      f"(${zFullC / zPrunedC}%.2f× faster) — $zCheck")
    val zLine = f"| ${sortCommitPlan.filesSkipped}/${sortCommitPlan.filesTotal} " +
      f"| ${zLang.filesSkipped}/${zLang.filesTotal} " +
      f"| ${zCommit.filesSkipped}/${zCommit.filesTotal} " +
      f"| $zFullC%.2f | $zPrunedC%.2f | ${zFullC / zPrunedC}%.2f× |"
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

    // metadata-only aggregates: what answering a global count(*) from the
    // manifest saves vs scanning, on a delete-free table (tombstones make
    // the manifest undecidable by design — the main table above proves the
    // fallback leg; this one proves the shortcut). The scan leg goes
    // through a tautological WHERE, which blocks the rewrite rule.
    // The SQL leg's floor is PLAN CONSTRUCTION (the resolution rule still
    // builds the substituted scan relation — file listing — before the
    // post-hoc rewrite discards it), so the honest claim is not one ratio
    // but the growth curves: the scan leg grows with the data, both
    // metadata legs stay flat. Measured at two table sizes to show it.
    // count(*) alone is footer-cheap even for the scan (parquet prunes to
    // an empty schema), so the aggregate includes min/max over a real
    // string column — the scan leg must READ it, the metadata legs never
    // open a file. Engine-API legs (metaCount/metaBounds) are pure
    // driver-side manifest math: no Spark job, no plan.
    val mT = IceliteTable.create(s"$work/meta", Seq("repo", "path"), 64)
    val mE = new CdcEngine(spark, mT, EngineConf(buckets = 64,
      statsCols = Seq("lang", "commit")))
    graft.sql.IceliteSql.register(spark, "statsbench_meta", mE)
    val mLines = new scala.collection.mutable.ListBuffer[String]
    Seq(0L -> wEv, 1L -> Synth.events(spark, wN, seed = 78, repos = 1000,
      pathsPerRepo = 1000, hotPct = 5, parts = 32)).foreach { case (ep, e2) =>
      mE.applyBatch(ep, e2.filter(col("op") =!= "D"))
      var scanS = Double.MaxValue
      var sqlS = Double.MaxValue
      var apiS = Double.MaxValue
      var r1: Seq[Any] = Nil; var r2: Seq[Any] = Nil; var r3: Seq[Any] = Nil
      (1 to 2).foreach { _ =>
        val (ts2, rs2) = time(mE.currentState().where(lit(true))
          .agg(count(lit(1)), min("commit"), max("commit")).head().toSeq)
        val (tq, rq) = time(spark.sql(
          "SELECT count(*) AS n, min(commit) AS mn, max(commit) AS mx " +
            "FROM ice.statsbench_meta").head().toSeq)
        val (ta, ra) = time {
          val b = mE.metaBounds("commit").get
          Seq(mE.metaCount().get, b._1.orNull, b._2.orNull)
        }
        scanS = math.min(scanS, ts2); sqlS = math.min(sqlS, tq)
        apiS = math.min(apiS, ta)
        r1 = rs2; r2 = rq; r3 = ra
      }
      val metaCheck = if (r1 == r2 && r2 == r3) "results identical"
        else s"MISMATCH $r1 / $r2 / $r3 (BUG!)"
      println(f"metadata-only count+min+max @ ${r1.head}%s rows: " +
        f"scan $scanS%.2f s, SQL-over-manifest $sqlS%.3f s " +
        f"(plan-construction floor), engine API $apiS%.4f s — $metaCheck")
      mLines += f"| ${r1.head}%s | $scanS%.2f | $sqlS%.3f | $apiS%.4f |"
    }
    // joined with an extra margin char: stripMargin eats one leading `|`
    // from every embedded line
    val mLine = mLines.mkString("\n|")

    out.foreach { p =>
      val md =
        s"""
           |### Column-stats pruning bench (StatsBench, ${java.time.LocalDate.now})
           |
           || events | state rows | files | skipped | full-filter s | pruned s | speedup |
           ||---|---|---|---|---|---|---|
           |$line
           |
           || commit-skip under lang-sort | lang-skip under z-order | commit-skip under z-order | commit full s | commit pruned s | speedup |
           ||---|---|---|---|---|---|
           |$zLine
           |
           || events | plain ingest s | clustered ingest s | overhead | fresh-file skip |
           ||---|---|---|---|---|
           |$wLine
           |
           || state rows | scan agg s | SQL manifest agg s | engine API s |
           ||---|---|---|---|
           |$mLine
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), md,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    ScalingBench.deleteRecursivelyPublic(work)
    spark.stop()
  }
}
