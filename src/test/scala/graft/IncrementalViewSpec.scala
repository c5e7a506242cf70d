package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf, IncrementalView}
import graft.engine.IncrementalView.Extreme
import graft.icelite.IceliteTable
import graft.synth.Synth

/** The incremental view's contract: after every refresh the materialized
  * aggregate equals the full recompute over the source's visible state —
  * under ordered and out-of-order delivery, deletes, crash re-delivery and
  * snapshot expiry. */
class IncrementalViewSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def newEngine(mor: Boolean = false): CdcEngine = {
    val dir = SparkTestBase.tmpDir("ivtbl")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = mor)
    new CdcEngine(spark, t, EngineConf(buckets = 8))
  }

  /** Rollup: rows + content bytes per language (lang is nullable in the
    * synth stream, so the null group exercises the null-safe group merge). */
  def newView(engine: CdcEngine): IncrementalView =
    new IncrementalView(engine, Paths.get(SparkTestBase.tmpDir("iv")),
      Seq("lang"), Seq("bytes" -> octet_length(col("content"))))

  def canon(df: DataFrame): Set[Seq[Any]] = df.collect().map(_.toSeq).toSet

  def assertMatches(v: IncrementalView, engine: CdcEngine): Unit =
    assert(canon(v.view()) === canon(v.aggregate(engine.currentState())))

  test("incremental refresh tracks full recompute across ordered batches (COW)") {
    val engine = newEngine()
    val v = newView(engine)
    val bs = Synth.batches(Synth.events(spark, 4000, seed = 11), 5, 4000)
    for ((b, i) <- bs.zipWithIndex) {
      engine.applyBatch(i.toLong, b)
      v.refresh()
      assertMatches(v, engine)
    }
    assert(v.refresh() === 0L) // in sync: no-op
  }

  test("out-of-order batches and deletes are maintained correctly (MOR)") {
    val engine = newEngine(mor = true)
    val v = newView(engine)
    val bs = Synth.batches(Synth.events(spark, 4000, seed = 12), 6, 4000,
      shuffleDelivery = true)
    for ((b, i) <- bs.zipWithIndex) {
      engine.applyBatch(i.toLong, b)
      v.refresh()
      assertMatches(v, engine)
    }
  }

  test("re-delivered refresh (crash replay) converges to the same view") {
    val engine = newEngine()
    val v = newView(engine)
    val bs = Synth.batches(Synth.events(spark, 3000, seed = 13), 3, 3000)
    engine.applyBatch(0, bs(0)); v.refresh()
    val before = v.lastRefreshed
    engine.applyBatch(1, bs(1)); v.refresh()
    val after = canon(v.view())
    // crash simulation: the checkpoint rewinds to the pre-refresh snapshot
    // and the whole window re-applies — the pinned-window delta math must
    // land on the identical view, not double-apply
    Files.writeString(v.root.resolve("view-checkpoint.txt"), before.toString)
    assert(v.refresh() >= 0L)
    assert(canon(v.view()) === after)
    assertMatches(v, engine)
  }

  def newExtremesView(engine: CdcEngine): IncrementalView =
    new IncrementalView(engine, Paths.get(SparkTestBase.tmpDir("ivx")),
      Seq("lang"), Seq("bytes" -> octet_length(col("content"))),
      extremes = Seq(
        Extreme("max_bytes", octet_length(col("content")), isMax = true),
        Extreme("min_lsn", col("_lsn"), isMax = false)))

  test("min/max extremes track full recompute under out-of-order deletes (MOR)") {
    val engine = newEngine(mor = true)
    val v = newExtremesView(engine)
    val bs = Synth.batches(Synth.events(spark, 4000, seed = 13), 6, 4000,
      shuffleDelivery = true)
    for ((b, i) <- bs.zipWithIndex) {
      engine.applyBatch(i.toLong, b)
      v.refresh()
      assertMatches(v, engine)
    }
    assert(v.refresh() === 0L)
  }

  test("retracting the stored maximum itself forces the exact per-group recompute") {
    import spark.implicits._
    val engine = newEngine()
    val v = newExtremesView(engine)
    def ev(path: String, content: String, lsn: Long, op: String) =
      ("r1", path, "c1", "en", content, op, lsn, 1, new java.sql.Timestamp(lsn * 1000))
    def df(rows: Seq[(String, String, String, String, String, String, Long, Int, java.sql.Timestamp)]) =
      rows.toDF("repo", "path", "commit", "lang", "content", "op", "commit_lsn", "seq", "ts")
    // three docs; p3 holds the max content length
    engine.applyBatch(0, df(Seq(
      ev("p1", "aa", 1, "I"), ev("p2", "bbbb", 2, "I"), ev("p3", "cccccccc", 3, "I"))))
    v.refresh(); assertMatches(v, engine)
    // delete the maximum: the runner-up (p2, 4 bytes) must surface — only a
    // recompute can know that
    engine.applyBatch(1, df(Seq(ev("p3", null, 10, "D"))))
    v.refresh(); assertMatches(v, engine)
    val row = v.view().filter(col("lang") === "en").collect()(0)
    assert(row.getInt(row.fieldIndex("max_bytes")) === 4)
    // and shrink the min side: a new lower _lsn cannot arrive (lsn grows),
    // so retract the CURRENT min row and check the min advances
    engine.applyBatch(2, df(Seq(ev("p1", null, 11, "D"))))
    v.refresh(); assertMatches(v, engine)
    val r2 = v.view().filter(col("lang") === "en").collect()(0)
    assert(r2.getLong(r2.fieldIndex("n_rows")) === 1L)
    assert(r2.getInt(r2.fieldIndex("max_bytes")) === 4)
  }

  test("a tombstone-GC purge between refreshes is a view no-op (delta path)") {
    val engine = newEngine()
    val v = newView(engine)
    val ev = Synth.events(spark, 3000, seed = 17) // ~5% deletes
    engine.applyBatch(0, ev.filter(col("commit_lsn") < 1500))
    v.refresh()
    engine.applyBatch(1, ev.filter(col("commit_lsn") >= 1500))
    // purge INSIDE the refresh window: the feed synthesizes deletes for the
    // GC'd keys, but those keys were invisible at `since`, so the delta
    // math must net them to zero — no phantom retraction
    engine.compact(purgeTombstonesBelowLsn =
      engine.highWatermark(engine.table.currentSnapshotId) + 1)
    assert(engine.currentCells().filter(col("_op.v") === "D").count() === 0L)
    v.refresh()
    assertMatches(v, engine)
    // and a refresh window that is PURELY a purge nets to zero rows applied
    engine.applyBatch(2, Synth.events(spark, 500, seed = 18)
      .withColumn("commit_lsn", col("commit_lsn") + 10000))
    v.refresh()
    engine.compact(purgeTombstonesBelowLsn =
      engine.highWatermark(engine.table.currentSnapshotId) + 1)
    v.refresh()
    assertMatches(v, engine)
  }

  test("expired `since` falls back to a full recompute") {
    val engine = newEngine()
    val v = newView(engine)
    val bs = Synth.batches(Synth.events(spark, 3000, seed = 14), 4, 3000)
    engine.applyBatch(0, bs(0)); v.refresh()
    engine.applyBatch(1, bs(1)); engine.applyBatch(2, bs(2)); engine.applyBatch(3, bs(3))
    engine.table.expireSnapshots(keepLast = 1) // the refreshed-from snapshot is gone
    assert(!engine.table.isAncestor(v.lastRefreshed))
    v.refresh()
    assertMatches(v, engine)
  }
}
