package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf, IncrementalView}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Measures the IncrementalView claim: refresh cost tracks the CHANGE SET,
  * not table state.
  *
  * Workload: state grows by a broad 500k-event batch per round; after each,
  * a bucket-local sparse batch (a few thousand events whose keys land in 8
  * of the table's 256 buckets — the "one repo's commit touches one
  * partition" shape a production table is bucketed FOR) updates existing
  * state. Per round we time
  *
  *   full    = aggregate(currentState) written to parquet (the naive
  *             recompute a scheduled rollup job would run), and
  *   sparse  = view.refresh() over just the sparse batch (changesSince +
  *             bucket-pruned pre-image + O(groups) merge).
  *
  * Expected: `full` grows with state; `sparse` stays flat. 256 buckets is
  * the scale stand-in — at 100 TB the table has thousands of buckets and
  * the pruning ratio is the same buckets-touched / buckets-total.
  *
  * Run: sbt "runMain graft.tools.IncViewBench [rounds] [outMd]"
  */
object IncViewBench {
  def main(args: Array[String]): Unit = {
    val rounds = args.headOption.map(_.toInt).getOrElse(5)
    val outMd = args.lift(1)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "16")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("incview-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.objectHashAggregate.sortBased.fallbackThreshold", "2000000")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val work = Files.createTempDirectory("incviewbench").toString
    val BUCKETS = 256
    val GROW = 500000L
    val table = IceliteTable.create(s"$work/t", Seq("repo", "path"), BUCKETS)
    val engine = new CdcEngine(spark, table, EngineConf(buckets = BUCKETS))
    val view = new IncrementalView(engine, Paths.get(s"$work/view"),
      Seq("lang"), Seq("bytes" -> octet_length(col("content"))))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f; (a, (System.nanoTime() - t0) / 1e9)
    }
    val rows = Seq.newBuilder[(Long, Double, Long, Double, Double)]
    var epoch = 0L
    for (r <- 0 until rounds) {
      // broad growth batch: new keys across all buckets
      engine.applyBatch(epoch, Synth.events(spark, GROW, seed = 100 + r)
        .withColumn("commit_lsn", col("commit_lsn") + lit(r * 2 * GROW)))
      epoch += 1
      view.refresh() // absorb the broad batch; not the measured quantity
      // bucket-local sparse batch: keys confined to 8 of 256 buckets
      val sparse = Synth.events(spark, 64000, seed = 500 + r)
        .filter(pmod(xxhash64(col("repo"), col("path")), lit(BUCKETS)) < lit(8))
        .withColumn("commit_lsn", col("commit_lsn") + lit((r * 2 + 1) * GROW))
        .localCheckpoint() // pin: keep synth codegen out of the timed path
      val nSparse = sparse.count()
      engine.applyBatch(epoch, sparse)
      epoch += 1
      val (_, tSparse) = timed(view.refresh())
      val stateRows = engine.currentState().count()
      val (_, tFull) = timed {
        view.aggregate(engine.currentState())
          .write.mode("overwrite").parquet(s"$work/full")
      }
      rows += ((stateRows, tFull, nSparse, tSparse, tFull / tSparse))
      println(f"round $r: state=$stateRows%,d full=$tFull%.2fs " +
        f"sparse(n=$nSparse)=$tSparse%.2fs ratio=${tFull / tSparse}%.1fx")
    }
    val md = new StringBuilder
    md ++= s"\n## IncrementalView refresh vs full recompute (local[$cpus], " +
      s"$BUCKETS buckets, ${java.time.LocalDate.now()})\n\n"
    md ++= "Per round: +500k-event broad batch grows state, then a " +
      "bucket-local sparse batch\n(keys in 8/256 buckets) is the measured " +
      "refresh. Full = naive rollup recompute+write.\n\n"
    md ++= "| state rows | full recompute s | sparse refresh s (events) | speedup |\n"
    md ++= "|---|---|---|---|\n"
    rows.result().foreach { case (n, tf, ns, ts, ratio) =>
      md ++= f"| $n%,d | $tf%.2f | $ts%.2f ($ns%,d) | ${ratio}%.1fx |\n"
    }
    print(md)
    outMd.foreach { p =>
      Files.writeString(Paths.get(p), md.toString,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.APPEND)
    }
    spark.stop()
    if (!sys.env.contains("SPARK_GRAFT_KEEP_WORK"))
      ScalingBench.deleteRecursivelyPublic(Paths.get(work))
  }
}
