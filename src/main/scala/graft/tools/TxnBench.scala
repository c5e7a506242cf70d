package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{AtomicTxn, CdcEngine, EngineConf}
import graft.icelite.{IceliteCatalog, IceliteTable}
import graft.synth.Synth

/** Measures the ATOMICITY TAX of multi-table catalog transactions: the
  * same k-epoch dual-table replay (a files table keyed (repo, path) plus
  * a per-repo rollup) run two ways —
  *
  *   A. INDEPENDENT: `applyBatch` on each table, no cross-table atomicity
  *      (the state of the art without a catalog: a reader between the two
  *      commits sees a torn pair);
  *   B. ATOMIC: `AtomicTxn.commit` through an IceliteCatalog (stage both,
  *      one catalog version, publish both).
  *
  * The data work is identical — a staged MERGE is the same shuffle and
  * the same files as a direct one — so the measured gap is the protocol's
  * metadata overhead: one extra pointer move per table (stage + publish
  * instead of commit) plus one catalog version write per epoch, all
  * O(tables), none O(rows). That is the scale claim: at 10^10 events the
  * tax is constant per epoch while the batch work grows, so atomicity
  * costs asymptotically nothing. Final states are checksum-compared
  * between regimes (they must match bit-for-bit).
  *
  * Run: sbt "runMain graft.tools.TxnBench [epochs] [eventsPerEpoch] [outMd]"
  */
object TxnBench {
  def main(args: Array[String]): Unit = {
    val k = args.headOption.map(_.toInt).getOrElse(24)
    val n = args.lift(1).map(_.toLong).getOrElse(250000L)
    val out = args.lift(2)
    val spark = SparkSession.builder()
      .master("local[16]")
      .appName("txn-bench")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = java.nio.file.Files.createTempDirectory("txnbench")

    def time[A](f: => A): (Double, A) = {
      val s = System.nanoTime(); val r = f
      ((System.nanoTime() - s) / 1e9, r)
    }
    def batch(i: Int): DataFrame = Synth.events(spark, n, seed = 500 + i,
      repos = 1000, pathsPerRepo = 500, hotPct = 10, parts = 16)
      .withColumn("commit_lsn", col("commit_lsn") + i.toLong * n)
    def rollup(b: DataFrame): DataFrame = Synth.repoRollup(b)

    def sha(e: CdcEngine): (Long, Long) = {
      val r = e.currentState().select(xxhash64(col("repo"), col("path"),
          coalesce(col("content"), lit("-"))).as("h"))
        .agg(count(lit(1)), expr("bit_xor(h)")).head()
      (r.getLong(0), r.getLong(1))
    }
    def mkEngines(label: String): (CdcEngine, CdcEngine) = (
      new CdcEngine(spark, IceliteTable.create(s"$work/$label/files",
        Seq("repo", "path"), 32), EngineConf(buckets = 32)),
      new CdcEngine(spark, IceliteTable.create(s"$work/$label/repos",
        Seq("repo"), 8), EngineConf(buckets = 8)))

    // regime A: two independent applyBatch per epoch (no atomicity);
    // regime B: one catalog transaction per epoch. Alternating A B A B
    // repetitions (fresh tables each) with best-of-per-regime cancels the
    // first-run warmup bias that otherwise dominates this host.
    def runIndep(label: String): (Double, (CdcEngine, CdcEngine)) = {
      val (f, r) = mkEngines(label)
      (time((0 until k).foreach { i =>
        val b = batch(i)
        f.applyBatch(i, b); r.applyBatch(i, rollup(b))
      })._1, (f, r))
    }
    def runAtomic(label: String): (Double, (CdcEngine, CdcEngine), Long) = {
      val (f, r) = mkEngines(label)
      val cat = IceliteCatalog.create(s"$work/$label/cat")
      cat.registerTable("files", s"$work/$label/files")
      cat.registerTable("repos", s"$work/$label/repos")
      (time((0 until k).foreach { i =>
        val b = batch(i)
        AtomicTxn.commit(cat, i, Seq(("files", f, b), ("repos", r, rollup(b))))
      })._1, (f, r), cat.version)
    }
    val reps = 2
    val runs = (0 until reps).map(j =>
      (runIndep(s"indep$j"), runAtomic(s"atomic$j"))) // A B A B order
    val (secA, (fA, rA)) = runs.map(_._1).minBy(_._1)
    val (secB, (fB, rB), catVersion) = runs.map(_._2).minBy(_._1)

    val same = sha(fA) == sha(fB) && sha(rA) == sha(rB)
    val check = if (same) "states identical" else "STATE MISMATCH (BUG!)"
    val evs = k.toLong * n
    val tax = (secB - secA) / secA * 100
    println(f"$k%d epochs x $n%d events, 2 tables (best of $reps%d alternating): " +
      f"INDEPENDENT ${secA}%.1f s (${evs / secA}%.0f ev/s), " +
      f"ATOMIC txn ${secB}%.1f s (${evs / secB}%.0f ev/s) " +
      f"— atomicity tax ${tax}%+.1f%% — $check; catalog at version $catVersion%d " +
      f"(${k + 2}%d expected)")
    out.foreach { p =>
      val md =
        s"""
           |### Multi-table atomicity tax (TxnBench, ${java.time.LocalDate.now})
           |
           || regime | total s | ev/s |
           ||---|---|---|
           || independent applyBatch x2 | ${f"$secA%.1f"} | ${f"${evs / secA}%.0f"} |
           || AtomicTxn (stage + catalog version + publish) | ${f"$secB%.1f"} | ${f"${evs / secB}%.0f"} |
           |
           |$k epochs × $n events into (files, per-repo rollup); tax
           |${f"$tax%+.1f"}% of wall — the protocol adds one pointer move per
           |table plus one catalog version write per epoch, O(tables) metadata
           |regardless of batch size; $check.
           |""".stripMargin
      java.nio.file.Files.writeString(java.nio.file.Paths.get(p), md,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    ScalingBench.deleteRecursivelyPublic(work)
    spark.stop()
  }
}
