package graft.tools

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.{col, when, floor, lit}

import graft.engine.{CdcEngine, EngineConf, MicroBatchRunner}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Copy-on-write vs merge-on-read under a SPARSE-batch replay — the
  * write-amplification measurement behind the merge-on-read design:
  *
  *   - seed phase: one large batch builds a table of `seedEvents` rows;
  *   - sparse phase: `sparseBatches` micro-batches of `perBatch` events each
  *     (every batch touches ~every bucket but only ~perBatch rows).
  *
  * COW rewrites every affected bucket per batch, so sparse-phase bytes ~
  * batches x table size. MOR appends per-batch delta files (bytes ~ batches
  * x batch size) with periodic compaction folding the deltas.
  *
  * The long sparse phase doubles as the commit-overhead flatness probe for
  * the incremental committed-epoch cache: per-batch commit time must NOT
  * grow with chain length (pre-cache it was O(chain) manifest reads per
  * commit). Prints ONE JSON line.
  *
  * Env knobs: SPARK_GRAFT_CPUS, SPARK_GRAFT_MOR_SEED_EVENTS,
  * SPARK_GRAFT_MOR_BATCHES, SPARK_GRAFT_MOR_PER_BATCH.
  */
object MorBench {

  private def duBytes(p: Path): Long = {
    if (!Files.exists(p)) return 0L
    val s = Files.walk(p)
    try s.iterator().asScala.filter(Files.isRegularFile(_)).map(Files.size).sum
    finally s.close()
  }

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "8")
    val seedEvents = sys.env.getOrElse("SPARK_GRAFT_MOR_SEED_EVENTS", "200000").toLong
    val sparseBatches = sys.env.getOrElse("SPARK_GRAFT_MOR_BATCHES", "200").toInt
    val perBatch = sys.env.getOrElse("SPARK_GRAFT_MOR_PER_BATCH", "1000").toLong
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "false") // per-batch re-planning is serial driver work
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val n = seedEvents + sparseBatches * perBatch
    val work = Files.createTempDirectory("morbench").toString
    // pre-split into per-batch DIRECTORIES (identical plan per batch -> the
    // codegen cache hits; a per-batch lsn filter would recompile every stage)
    Synth.events(spark, n, seed = 42, repos = 200, pathsPerRepo = 2000,
      hotPct = 30, parts = cpus.toInt * 2)
      .withColumn("__batch",
        when(col("commit_lsn") < seedEvents, 0L)
          .otherwise(floor((col("commit_lsn") - seedEvents) / perBatch) + 1))
      .write.partitionBy("__batch").parquet(s"$work/events")
    val batchDirs = (0 to sparseBatches).map(i => s"$work/events/__batch=$i")

    // SPARK_GRAFT_MOR_RETAIN=N: auto-expire to N snapshots and vacuum after
    // each expiry — the long-replay configuration (without it superseded
    // compaction copies accumulate ~linearly in batches; see BENCH.md)
    val retain = sys.env.get("SPARK_GRAFT_MOR_RETAIN").map(_.toInt).getOrElse(0)
    def run(mor: Boolean, dirs: Seq[String], tag: String): (Double, Long, Seq[Long]) = {
      val dir = s"$work/$tag"
      val table = IceliteTable.create(dir, Seq("repo", "path"), 64, mergeOnRead = mor)
      val engine = new CdcEngine(spark, table,
        EngineConf(buckets = 64, morCompactThreshold = if (mor) 16 else 0,
          retainSnapshots = retain, vacuumAfterExpire = retain > 0,
          vacuumGraceMillis = 0L))
      val batches = dirs.zipWithIndex.map { case (d, i) =>
        (i.toLong, spark.read.schema(graft.model.ChangeEvent.schema).parquet(d))
      }
      val t0 = System.nanoTime()
      val results = new MicroBatchRunner(engine).run(batches)
      val sec = (System.nanoTime() - t0) / 1e9
      // bytes of every data file ever written (superseded files are still on
      // disk — older snapshots reference them until expire+vacuum)
      (sec, duBytes(table.root.resolve("data")), results.drop(1).map(_.millis))
    }

    run(mor = false, batchDirs.take(2), "warmup") // JIT/codegen warmup, discarded
    // SPARK_GRAFT_MOR_SKIP_COW=1 skips the copy-on-write leg: at high batch
    // counts COW is quadratic by construction (see BENCH.md sustained-ingest)
    // and the long-replay run only needs the MOR commit-flatness curve
    val skipCow = sys.env.contains("SPARK_GRAFT_MOR_SKIP_COW")
    val (cowSec, cowBytes, cowMs) =
      if (skipCow) (0.0, 1L, Seq.empty[Long]) else run(mor = false, batchDirs, "cow")
    val (morSec, morBytes, morMs) = run(mor = true, batchDirs, "mor")

    def mean(xs: Seq[Long]): Double = if (xs.isEmpty) 0 else xs.sum.toDouble / xs.size
    def median(xs: Seq[Long]): Double =
      if (xs.isEmpty) 0 else { val s = xs.sorted; s(s.size / 2).toDouble }
    val q = sparseBatches / 4
    val morEarly = mean(morMs.slice(0, q))
    val morLate = mean(morMs.takeRight(q))
    // SEGMENT flatness (the sustained-ingest claim, assertable): split the
    // sparse phase into 8 segments and compare per-batch commit MEDIANS
    // (medians de-noise compaction spikes and host stalls). "flat" = the
    // last segment's median within 1.5x of the first's — a quadratic curve
    // (COW's shape: state grows every batch) fails this immediately, host
    // noise does not.
    val nSeg = 8
    val segSize = math.max(1, morMs.size / nSeg)
    val segMedians = morMs.grouped(segSize).filter(_.size >= segSize / 2)
      .map(median).toSeq
    val flat = segMedians.size >= 2 && segMedians.last <= segMedians.head * 1.5
    val json =
      s"""{"metric":"mor_write_amp","seed_events":$seedEvents,"sparse_batches":$sparseBatches,""" +
      s""""per_batch":$perBatch,"cow_sec":${f"$cowSec%.1f"},"mor_sec":${f"$morSec%.1f"},""" +
      s""""cow_bytes":$cowBytes,"mor_bytes":$morBytes,""" +
      s""""bytes_ratio":${f"${cowBytes.toDouble / morBytes}%.1f"},""" +
      s""""mor_commit_ms_first_quarter":${f"$morEarly%.0f"},""" +
      s""""mor_commit_ms_last_quarter":${f"$morLate%.0f"},""" +
      s""""cow_commit_ms_first_quarter":${f"${mean(cowMs.slice(0, q))}%.0f"},""" +
      s""""cow_commit_ms_last_quarter":${f"${mean(cowMs.takeRight(q))}%.0f"},""" +
      s""""mor_segment_medians_ms":${segMedians.map(m => f"$m%.0f").mkString("[", ",", "]")},""" +
      s""""mor_flat":$flat}"""
    println(json)
    spark.stop()
    // sweep the work dir (bench artifacts measurably skew later disk-bound
    // runs — see BENCH.md round-2 disk-pressure caveat); SPARK_GRAFT_KEEP_WORK
    // keeps it for per-batch metrics forensics
    if (sys.env.contains("SPARK_GRAFT_KEEP_WORK")) println(s"work dir kept: $work")
    else {
      val s = Files.walk(java.nio.file.Paths.get(work))
      try s.sorted(java.util.Comparator.reverseOrder[Path]())
        .forEach(f => Files.deleteIfExists(f))
      finally s.close()
    }
  }
}
