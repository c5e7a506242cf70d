package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.{AtomicTxn, CdcEngine, EngineConf}
import graft.icelite.{Icelite, IceliteCatalog, IceliteTable}
import graft.synth.Synth

/** One OS process of a cross-process writer race — forked (≥2 at a time)
  * by CrossProcessSpec via ProcessBuilder to prove the claims the in-JVM
  * concurrency suite cannot: the commit pointer CAS, exclusive snapshot-id
  * allocation, the catalog version CAS and exactly-once are enforced by
  * the FILESYSTEM protocol (exclusive hard-link creates), not by any
  * shared JVM lock. The reference gets the equivalent guarantee from
  * Postgres serializing concurrent `ingestion.py` runs
  * (`/root/reference/README.md:253-258`); here the table format itself
  * must provide it.
  *
  * Modes (args):
  *   raw <tableDir> <writerId> <nCommits>
  *     Tight-loop RAW icelite commits (no Spark) with the engine's retry
  *     discipline — maximal pointer contention, every loser must re-read
  *     and land on the new head. Epochs are writerId*100000 + i.
  *   cow|mor <tableDir> <writerId> <epochsCsv> <redeliverCsv> <nEvents> <nEpochs>
  *     Full Spark applyBatch MERGEs on a shared copy-on-write /
  *     merge-on-read table: applies the (deterministic, Synth-derived)
  *     batch of each epoch in epochsCsv, then re-delivers redeliverCsv
  *     (typically the OTHER writer's epochs — cross-process exactly-once
  *     must skip them whether or not the first application has finished).
  *   txn <workDir> <writerId> <epochsCsv> <nEvents> <nEpochs>
  *     Two-table AtomicTxn coordinator race on a shared catalog
  *     (workDir/{cat,files,repos} pre-created by the spec): each epoch
  *     MERGEs the files table and its per-repo rollup in one catalog
  *     transaction; CAS losers re-stage and retry via AtomicTxn's loop.
  *
  * Prints `RACE_OK <writerId> conflicts=<n>` on success; any uncaught
  * failure exits nonzero (the spec asserts on both).
  */
object RaceWriter {

  def main(args: Array[String]): Unit = {
    args(0) match {
      case "raw" => raw(args(1), args(2).toInt, args(3).toInt)
      case m @ ("cow" | "mor") =>
        spark(args(1), args(2).toInt, args(3), args(4), args(5).toLong,
          args(6).toInt, mor = m == "mor")
      case "txn" => txn(args(1), args(2).toInt, args(3), args(4).toLong, args(5).toInt)
      case other => sys.error(s"unknown RaceWriter mode '$other'")
    }
  }

  /** The deterministic epoch slice every process derives identically —
    * contiguous LSN ranges over one Synth stream, so the sequential-replay
    * oracle in the spec sees byte-identical inputs. */
  def epochBatch(s: SparkSession, epoch: Int, nEvents: Long, nEpochs: Int): DataFrame = {
    val per = (nEvents + nEpochs - 1) / nEpochs
    Synth.events(s, nEvents, repos = 20, pathsPerRepo = 40, parts = 4)
      .filter(s"commit_lsn >= ${epoch * per} AND commit_lsn < ${(epoch + 1) * per}")
  }

  private def raw(tableDir: String, writerId: Int, nCommits: Int): Unit = {
    val t = IceliteTable.load(tableDir)
    val sid = 0 // pre-registered by the spec
    // start barrier: JVM startup skew would otherwise let the first writer
    // drain its whole loop before the second exists — no contention proven
    val ready = java.nio.file.Paths.get(tableDir, s"ready-$writerId")
    java.nio.file.Files.writeString(ready, "1")
    val deadline = System.nanoTime() + 30L * 1000000000L
    def peers(): Long = {
      val s = java.nio.file.Files.list(java.nio.file.Paths.get(tableDir))
      try s.filter(_.getFileName.toString.startsWith("ready-")).count()
      finally s.close()
    }
    while (peers() < 2 && System.nanoTime() < deadline) Thread.sleep(5)
    var conflicts = 0
    var i = 0
    while (i < nCommits) {
      val epoch = writerId * 100000L + i
      try {
        t.commit(epoch, sid,
          Map((i % 4) -> List(Icelite.DataFile(s"w$writerId-c$i.parquet", sid, 1))),
          List(Icelite.BucketLineage(i % 4, epoch, epoch, 1, 1)), rowDelta = 1)
        i += 1
      } catch {
        case _: Icelite.CommitConflictException => conflicts += 1 // re-read, retry
      }
    }
    println(s"RACE_OK $writerId conflicts=$conflicts")
  }

  private def session(): SparkSession = {
    val s = SparkSession.builder()
      .appName("graft-race").master("local[4]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }

  private def spark(tableDir: String, writerId: Int, epochsCsv: String,
      redeliverCsv: String, nEvents: Long, nEpochs: Int, mor: Boolean): Unit = {
    val s = session()
    try {
      val t = IceliteTable.load(tableDir)
      val engine = new CdcEngine(s, t, EngineConf(buckets = t.currentBuckets))
      def csv(c: String): Seq[Int] =
        if (c.isEmpty || c == "-") Nil else c.split(',').toSeq.map(_.toInt)
      csv(epochsCsv).foreach(e => engine.applyBatch(e, epochBatch(s, e, nEvents, nEpochs)))
      // cross-process exactly-once: these epochs belong to (or race with)
      // the OTHER writer; each application must either be the first or a
      // clean skip — never a double-merge
      csv(redeliverCsv).foreach(e => engine.applyBatch(e, epochBatch(s, e, nEvents, nEpochs)))
      println(s"RACE_OK $writerId conflicts=-1")
    } finally s.stop()
  }

  private def txn(workDir: String, writerId: Int, epochsCsv: String,
      nEvents: Long, nEpochs: Int): Unit = {
    val s = session()
    try {
      val cat = IceliteCatalog.load(s"$workDir/cat")
      val files = new CdcEngine(s, IceliteTable.load(s"$workDir/files"),
        EngineConf(buckets = 8))
      val repos = new CdcEngine(s, IceliteTable.load(s"$workDir/repos"),
        EngineConf(buckets = 4))
      epochsCsv.split(',').map(_.toInt).foreach { e =>
        val b = epochBatch(s, e, nEvents, nEpochs)
        AtomicTxn.commit(cat, e,
          Seq(("files", files, b), ("repos", repos, Synth.repoRollup(b))),
          maxRetries = 50)
      }
      println(s"RACE_OK $writerId conflicts=-1")
    } finally s.stop()
  }
}
