package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf, FeedConsumer}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** End-to-end change-feed consumption: a mirror table built ONLY from
  * `changesSince` feeds must reproduce the source's visible state — the
  * downstream-warehouse contract. Covered: copy-on-write and merge-on-read
  * sources, multi-sync incremental pulls, late (below-watermark) batch
  * delivery, tombstones, idempotent re-sync, and bootstrap (-1) sync. */
class FeedConsumerSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def mkPair(name: String, mor: Boolean): (CdcEngine, CdcEngine, FeedConsumer) = {
    val dir = SparkTestBase.tmpDir(name)
    val src = new CdcEngine(spark,
      IceliteTable.create(s"$dir/src", Seq("repo", "path"), 8, mergeOnRead = mor),
      EngineConf(buckets = 8))
    val mir = new CdcEngine(spark,
      IceliteTable.create(s"$dir/mirror", Seq("repo", "path"), 8),
      EngineConf(buckets = 8))
    (src, mir, new FeedConsumer(src, mir))
  }

  /** Visible-state equality: everything except the per-column lsn/seq
    * provenance the feed intentionally re-stamps (see FeedConsumer doc). */
  private def visible(e: CdcEngine): Seq[String] = {
    val df = e.currentState()
    val cols = df.columns.filterNot(c => c == "_lsn" || c == "_seq").sorted
    df.select(cols.map(col): _*).collect().map(_.toString).sorted.toSeq
  }

  private def assertMirrored(src: CdcEngine, mir: CdcEngine): Unit =
    assert(visible(mir) === visible(src), "mirror diverged from source")

  for (mor <- Seq(false, true)) {
    val label = if (mor) "merge-on-read" else "copy-on-write"

    test(s"$label source: incremental feed replication equals direct replay") {
      val (src, mir, consumer) = mkPair(s"feed-$mor", mor)
      val ev = Synth.events(spark, 3000, seed = 31)
      val bs = Synth.batches(ev, 3, 3000)
      // batch 0 then sync (bootstrap from -1), then 1..2 with a sync each
      bs.zipWithIndex.foreach { case (b, i) =>
        src.applyBatch(i, b)
        assert(consumer.sync() >= 0)
        assertMirrored(src, mir)
      }
      // tombstones exist in the stream and are invisible in both states
      assert(ev.filter(col("op") === "D").count() > 0)
      // idempotent re-sync: no changes -> no rows, no new mirror snapshot
      val snapBefore = mir.table.currentSnapshotId
      assert(consumer.sync() === 0L)
      assert(mir.table.currentSnapshotId === snapBefore)
    }

    test(s"$label source: late below-watermark batch flows through the feed") {
      val (src, mir, consumer) = mkPair(s"feedlate-$mor", mor)
      val ev = Synth.events(spark, 2000, seed = 32)
      val late = ev.filter(col("commit_lsn") < 500)
      val early = ev.filter(col("commit_lsn") >= 500)
      src.applyBatch(0, early)
      consumer.sync()
      assertMirrored(src, mir)
      // late delivery: all LSNs precede the applied watermark; some keys
      // change VALUE without raising their visible _lsn — the per-sync
      // stamp must still overwrite the mirror's previous cells
      src.applyBatch(1, late)
      consumer.sync()
      assertMirrored(src, mir)
    }
  }

  // PROPERTY: for ANY partition of the log into batches, ANY delivery order
  // (including below-watermark late batches) and ANY sync schedule (sync
  // after random subsets of commits, including doubled syncs), the mirror's
  // visible state equals the source's at every sync point. Scenarios are
  // drawn from a seeded RNG so failures replay deterministically.
  for (scenario <- 0 until 3) {
    val mor = scenario % 2 == 1
    test(s"property: random batching x random sync schedule keeps the mirror " +
        s"in sync (scenario $scenario, ${if (mor) "merge-on-read" else "copy-on-write"})") {
      val rnd = new scala.util.Random(4000 + scenario)
      val n = 1200L
      val ev = Synth.events(spark, n, seed = 40 + scenario, repos = 8, pathsPerRepo = 20)
      val k = 3 + rnd.nextInt(3)
      val batches = Synth.batches(ev, k, n)
      val (src, mir, consumer) = mkPair(s"feedprop-$scenario", mor)
      val order = rnd.shuffle(batches.indices.toList)
      order.zipWithIndex.foreach { case (i, epoch) =>
        src.applyBatch(epoch.toLong, batches(i))
        if (rnd.nextBoolean()) {
          consumer.sync()
          if (rnd.nextInt(4) == 0) consumer.sync() // doubled sync: must no-op
          assertMirrored(src, mir)
        }
      }
      consumer.sync()
      assertMirrored(src, mir)
    }
  }

  test("syncBacklog drains a deep backlog in bounded, checkpointed steps") {
    val (src, mir, consumer) = mkPair("feed-backlog", mor = true)
    val bs = Synth.batches(Synth.events(spark, 6000, seed = 55), 6, 6000,
      shuffleDelivery = true)
    bs.zipWithIndex.foreach { case (b, i) => src.applyBatch(i.toLong, b) }
    // 6+ source snapshots behind; drain 2 snapshots per step
    val backlog = src.table.currentSnapshotId - consumer.lastSynced
    assert(backlog >= 6)
    val applied = consumer.syncBacklog(2)
    assert(applied > 0)
    assertMirrored(src, mir)
    assert(consumer.lastSynced === src.table.currentSnapshotId)
    // each step committed its own mirror epoch: more than one sync applied
    assert(mir.table.snapshotChain.count(_.batchEpoch >= 0) >= 3,
      "backlog should have drained in multiple bounded steps")
    // in-sync backlog drain is a no-op; new commits drain one step at a time
    assert(consumer.syncBacklog(1) === 0L)
    src.applyBatch(100L, Synth.events(spark, 500, seed = 56))
    consumer.syncBacklog(1)
    assertMirrored(src, mir)
  }

  test("syncBacklog walks the source chain once: O(backlog) walk reads at any step size") {
    val (src, mir, consumer) = mkPair("feed-backlog-linear", mor = true)
    val bs = Synth.batches(Synth.events(spark, 6000, seed = 57), 12, 6000)
    bs.zipWithIndex.foreach { case (b, i) => src.applyBatch(i.toLong, b) }
    val backlog = src.table.currentSnapshotId - math.max(consumer.lastSynced, -1L)
    assert(backlog >= 12)
    // drain one snapshot per step — the worst case for a re-walking
    // implementation (O(backlog²) walk reads); the single-walk drain reads
    // each backlog manifest exactly once
    consumer.syncBacklog(1)
    assertMirrored(src, mir)
    assert(consumer.backlogWalkReads === backlog,
      s"backlog walk should read each of the $backlog backlog manifests exactly once, " +
        s"read ${consumer.backlogWalkReads}")
    // a head advancing mid-history only extends the walk by the new suffix
    src.applyBatch(100L, Synth.events(spark, 500, seed = 58))
    src.applyBatch(101L, Synth.events(spark, 500, seed = 59))
    val before = consumer.backlogWalkReads
    consumer.syncBacklog(1)
    assertMirrored(src, mir)
    assert(consumer.backlogWalkReads - before <= 3,
      "re-drain after head advance must walk only the new suffix")
  }

  test("streaming pipeline: file tail -> MERGE -> feed -> mirror, per trigger") {
    val dir = SparkTestBase.tmpDir("streammirror")
    val input = s"$dir/in"
    val ev = Synth.events(spark, 2000, seed = 34, repos = 20, pathsPerRepo = 50)
    ev.filter(col("commit_lsn") < 1000).coalesce(1).write.mode("append").parquet(input)
    ev.filter(col("commit_lsn") >= 1000).coalesce(1).write.mode("append").parquet(input)
    val src = new CdcEngine(spark,
      IceliteTable.create(s"$dir/src", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    val mir = new CdcEngine(spark,
      IceliteTable.create(s"$dir/mirror", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    val consumer = new FeedConsumer(src, mir)
    graft.streaming.CdcStream.runAvailableNow(spark, src, input, s"$dir/ckpt",
      maxFilesPerTrigger = 1, mirror = Some(consumer))
    assertMirrored(src, mir)
    // the mirror advanced once per micro-batch, not once at the end
    assert(mir.table.snapshotChain.count(_.batchEpoch >= 0) >= 2)
    // empty re-run: neither table moves (exactly-once through the chain)
    val (s0, m0) = (src.table.currentSnapshotId, mir.table.currentSnapshotId)
    graft.streaming.CdcStream.runAvailableNow(spark, src, input, s"$dir/ckpt",
      mirror = Some(consumer))
    assert(src.table.currentSnapshotId === s0 && mir.table.currentSnapshotId === m0)
  }

  test("mid-stream schema evolution flows through the feed into the mirror") {
    val (src, mir, consumer) = mkPair("feedevo", mor = false)
    val ev = Synth.events(spark, 1000, seed = 35)
    src.applyBatch(0, ev.filter(col("commit_lsn") < 500))
    consumer.sync()
    assertMirrored(src, mir)
    // source evolves: later batch adds a `size` column (new payload field)
    val evolved = ev.filter(col("commit_lsn") >= 500)
      .withColumn("size", pmod(xxhash64(col("commit_lsn")), lit(1000)).cast("long"))
    src.applyBatch(1, evolved)
    consumer.sync()
    // the mirror's applyBatch reconciles the widened feed schema itself
    assert(mir.currentState().columns.contains("size"),
      "mirror did not pick up the evolved column")
    assertMirrored(src, mir)
    // pre-evolution keys carry null size on both sides (checked by
    // assertMirrored); spot-check a post-evolution key has a value
    assert(mir.currentState().filter(col("size").isNotNull).count() > 0)
  }

  test("multi-batch sync in one pull + sha invariant carried to the mirror") {
    val (src, mir, consumer) = mkPair("feedmulti", mor = false)
    val ev = Synth.events(spark, 2000, seed = 33)
    val bs = Synth.batches(ev, 4, 2000)
    bs.zipWithIndex.foreach { case (b, i) => src.applyBatch(i, b) } // no sync between
    consumer.sync() // one pull covering 4 source snapshots
    assertMirrored(src, mir)
    // the north-rule invariant holds on the mirror: sha256(content) matches
    val bad = mir.currentState()
      .filter(col("content").isNotNull &&
        col("content_sha256") =!= sha2(col("content"), 256))
      .count()
    assert(bad === 0)
  }
}
