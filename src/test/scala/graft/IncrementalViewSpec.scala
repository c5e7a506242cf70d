package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf, IncrementalView}
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
