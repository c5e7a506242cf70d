package graft.tools

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable

/** Measures what tombstone GC buys on the workload that needs it: CHURN.
  * Every batch inserts a fresh key range and deletes the range inserted two
  * batches ago (the short-lived-row pattern a CDC tail sees from source-side
  * TTL/retention deletes), so the LIVE set stays constant while the deleted
  * keyspace grows linearly. Without GC every deleted key leaves a revocable
  * tombstone row that every future compaction rewrites — state grows without
  * bound at constant live data. With `tombstonePurgeLagLsn` the auto-
  * compactions drop sub-line tombstones and retained state tracks the live
  * set.
  *
  * Both runs use the same merge-on-read + auto-compaction + retention
  * discipline (the sustained-ingest path); the ONLY difference is the purge
  * lag. Reported: retained cell rows / tombstones / live bytes at quarter
  * points, and total ingest wall.
  *
  * Run: sbt "runMain graft.tools.ChurnBench [batches] [perBatch] [out.md]"
  * Defaults: 40 batches x 50k keys.
  */
object ChurnBench {
  def main(args: Array[String]): Unit = {
    val batches = args.headOption.map(_.toInt).getOrElse(40)
    val perBatch = args.lift(1).map(_.toLong).getOrElse(50000L)
    val out = args.lift(2)
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("churn-bench")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val work = Files.createTempDirectory("churnbench")

    // key k: inserted at lsn 2k (batch k/perBatch), deleted at lsn 2k+1
    // (two batches later) — per-key order is all LWW needs
    def insBatch(i: Int): DataFrame =
      spark.range(i * perBatch, (i + 1) * perBatch, 1, 8).select(
        concat(lit("r"), pmod(col("id"), lit(512))).as("repo"),
        concat(lit("p"), col("id")).as("path"),
        concat(lit("c"), col("id")).as("commit"),
        lit("scala").as("lang"),
        concat(lit("v"), col("id")).as("content"),
        lit("U").as("op"),
        (col("id") * 2).as("commit_lsn"),
        lit(0).as("seq"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("ts"))
    def delBatch(i: Int): DataFrame =
      spark.range((i - 2) * perBatch, (i - 1) * perBatch, 1, 8).select(
        concat(lit("r"), pmod(col("id"), lit(512))).as("repo"),
        concat(lit("p"), col("id")).as("path"),
        lit(null).cast("string").as("commit"),
        lit(null).cast("string").as("lang"),
        lit(null).cast("string").as("content"),
        lit("D").as("op"),
        (col("id") * 2 + 1).as("commit_lsn"),
        lit(0).as("seq"),
        timestamp_seconds(lit(1700000000L) + col("id")).as("ts"))

    case class Point(batch: Int, cells: Long, tombs: Long, mb: Double)
    def run(tag: String, purgeLag: Long): (Seq[Point], Double) = {
      val t = IceliteTable.create(s"$work/$tag", Seq("repo", "path"), 32,
        mergeOnRead = true)
      val e = new CdcEngine(spark, t, EngineConf(buckets = 32,
        morCompactThreshold = 8, retainSnapshots = 16,
        vacuumAfterExpire = true, vacuumGraceMillis = 0L,
        // lag = 5 batches of LSN space: tombstones survive ~2.5 batches
        // past their delete, far above any realistic replay lower bound
        // for a stream this ordered, then purge
        tombstonePurgeLagLsn = purgeLag))
      val points = scala.collection.mutable.ListBuffer.empty[Point]
      val t0 = System.nanoTime()
      (0 until batches).foreach { i =>
        val ev = if (i >= 2) insBatch(i).unionAll(delBatch(i)) else insBatch(i)
        e.applyBatch(i, ev)
        if ((i + 1) % math.max(1, batches / 4) == 0 || i == batches - 1) {
          val cells = e.currentCells().count()
          val tombs = e.currentCells().filter(col("_op.v") === "D").count()
          val bytes = t.currentFiles().map(p =>
            try Files.size(Paths.get(p)) catch { case _: Exception => 0L }).sum
          points += Point(i + 1, cells, tombs, bytes / 1e6)
        }
      }
      val wall = (System.nanoTime() - t0) / 1e9
      println(f"$tag%-8s wall $wall%.1f s; " + points.map(p =>
        f"b${p.batch}%d: ${p.cells}%d cells/${p.tombs}%d tombs/${p.mb}%.0f MB")
        .mkString(" | "))
      (points.toList, wall)
    }

    val (keep, wallKeep) = run("keep", -1L)
    val (purge, wallPurge) = run("purge", 10L * perBatch) // 5 batches of lsn space
    val live = 2L * perBatch
    val md =
      s"""
         |### Tombstone GC under churn (ChurnBench, ${java.time.LocalDate.now})
         |
         |$batches batches x $perBatch fresh keys, each batch deleting the range
         |inserted two batches earlier — constant ${live} live rows, linearly
         |growing deleted keyspace. Merge-on-read + auto-compact@8 + retention;
         |identical runs except `tombstonePurgeLagLsn` (5 batches of LSN space).
         |
         || batch | kept: cells (tombs) | kept MB | purged: cells (tombs) | purged MB |
         ||---|---|---|---|---|
         |${keep.zip(purge).map { case (k, p) =>
             f"| ${k.batch}%d | ${k.cells}%,d (${k.tombs}%,d) | ${k.mb}%.0f | " +
               f"${p.cells}%,d (${p.tombs}%,d) | ${p.mb}%.0f |" }.mkString("\n|")}
         |
         |Ingest wall: keep ${f"$wallKeep%.1f"} s vs purge ${f"$wallPurge%.1f"} s.
         |Without GC, retained rows grow linearly at CONSTANT live data — the
         |curve that never ends at 10^10 events; with the purge lag they track
         |the live set (${live} rows) plus the in-lag window.
         |""".stripMargin
    out.foreach(p => Files.writeString(Paths.get(p), md,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.APPEND))
    ScalingBench.deleteRecursivelyPublic(work)
    spark.stop()
  }
}
