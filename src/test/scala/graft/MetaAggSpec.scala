package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.catalyst.plans.logical.LocalRelation

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.sql.IceliteSql
import graft.synth.Synth

/** Metadata-only aggregate pushdown (IceliteMetaAggRule + CdcEngine.metaCount
  * / metaBounds): a filterless global count/min/max over an ice table must
  * collapse to a one-row LocalRelation — no scan — whenever the manifest
  * answers exactly, must FALL BACK to the scan whenever it can't (pending
  * MOR deltas, tombstones interleaved into row groups), and must agree with
  * the scan's answer in every case. Ground truth is always computed through
  * a rewrite-proof plan (a Filter blocks the rule by design). */
class MetaAggSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def engine(mor: Boolean, name: String): CdcEngine = {
    val dir = SparkTestBase.tmpDir("metaagg")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = mor)
    val e = new CdcEngine(spark, t,
      EngineConf(buckets = 8, statsCols = Seq("lang", "content")))
    IceliteSql.register(spark, name, e)
    e
  }

  /** Does this query read ONLY precomputed local rows (no file scan)? */
  private def metaOnly(df: DataFrame): Boolean = {
    val leaves = df.queryExecution.optimizedPlan.collectLeaves()
    leaves.nonEmpty && leaves.forall(_.isInstanceOf[LocalRelation])
  }

  /** Rewrite-proof twin: the Filter (even a tautology) blocks the rule. */
  private def slowAgg(e: CdcEngine, expr: String*): Seq[Any] =
    e.currentState().where(lit(true)).selectExpr(expr: _*).head().toSeq

  test("COW, delete-free: count/min/max answer from the manifest alone") {
    val e = engine(mor = false, "ma1")
    val ev = Synth.events(spark, 3000, seed = 91).filter(col("op") =!= "D")
    e.applyBatch(0, ev.filter(col("commit_lsn") < 1500))
    e.applyBatch(1, ev.filter(col("commit_lsn") >= 1500))

    val df = spark.sql(
      "SELECT count(*) AS n, min(lang) AS mn, max(lang) AS mx FROM ice.ma1")
    assert(metaOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head().toSeq === slowAgg(e, "count(*)", "min(lang)", "max(lang)"))

    // engine-API paths take the same shortcut
    assert(e.metaCount() === Some(slowAgg(e, "count(*)").head))
    val viaDs = e.currentState().groupBy().count()
    assert(metaOnly(viaDs))
    assert(viaDs.head().getLong(0) === e.metaCount().get)
  }

  test("tombstones interleaved in row groups: metadata undecidable, scan fallback agrees") {
    val e = engine(mor = false, "ma2")
    e.applyBatch(0, Synth.events(spark, 3000, seed = 92)) // ~5% D ops
    // merged rewrites hash-mix D and U rows into shared row groups
    assert(e.metaCount() === None)
    val df = spark.sql("SELECT count(*) AS n FROM ice.ma2")
    assert(!metaOnly(df))
    assert(df.head().getLong(0) === slowAgg(e, "count(*)").head)
    // a tombstone's preimage must not poison min/max either: unanswerable
    assert(e.metaBounds("lang") === None)
  }

  test("MOR: pending deltas force the scan; compaction restores the shortcut") {
    val e = engine(mor = true, "ma3")
    val ev = Synth.events(spark, 2500, seed = 93).filter(col("op") =!= "D")
    e.applyBatch(0, ev.filter(col("commit_lsn") < 1000))
    e.applyBatch(1, ev.filter(col("commit_lsn") >= 1000))
    assert(e.metaCount() === None) // delta files are not merged state
    val before = spark.sql("SELECT count(*) AS n FROM ice.ma3")
    assert(!metaOnly(before))
    val truth = slowAgg(e, "count(*)").head
    assert(before.head().getLong(0) === truth)

    e.compact()
    val after = spark.sql("SELECT count(*) AS n, max(content) AS mx FROM ice.ma3")
    assert(metaOnly(after), after.queryExecution.optimizedPlan.toString)
    assert(after.head().toSeq === slowAgg(e, "count(*)", "max(content)"))
    assert(e.metaCount() === Some(truth))
  }

  test("time travel pins the snapshot; empty table answers zero") {
    val e = engine(mor = false, "ma4")
    assert(e.metaCount() === Some(0L))
    assert(spark.sql("SELECT count(*) AS n FROM ice.ma4").head().getLong(0) === 0L)

    val ev = Synth.events(spark, 2000, seed = 94).filter(col("op") =!= "D")
    e.applyBatch(0, ev.filter(col("commit_lsn") < 800))
    val v1 = e.table.currentSnapshotId
    e.applyBatch(1, ev.filter(col("commit_lsn") >= 800))

    val tt = spark.sql(s"SELECT count(*) AS n FROM ice.ma4 VERSION AS OF $v1")
    assert(metaOnly(tt))
    assert(tt.head().getLong(0) ===
      e.stateAt(v1).where(lit(true)).count())
    assert(e.metaCount(v1) === Some(tt.head().getLong(0)))
    // head read is unaffected by the pinned one
    assert(spark.sql("SELECT count(*) AS n FROM ice.ma4").head().getLong(0) ===
      slowAgg(e, "count(*)").head)
  }

  test("filters, grouping, and non-stats columns leave the plan untouched") {
    val e = engine(mor = false, "ma5")
    e.applyBatch(0, Synth.events(spark, 1500, seed = 95).filter(col("op") =!= "D"))
    // WHERE blocks the rewrite (the answer isn't a manifest sum)
    assert(!metaOnly(spark.sql(
      "SELECT count(*) AS n FROM ice.ma5 WHERE lang = 'py'")))
    // grouped aggregates are never metadata-only
    assert(!metaOnly(spark.sql(
      "SELECT lang, count(*) AS n FROM ice.ma5 GROUP BY lang")))
    // a column without harvested stats (not in statsCols) falls back
    assert(!metaOnly(spark.sql("SELECT min(commit) AS mn FROM ice.ma5")))
    assert(e.metaBounds("commit") === None)
    // count(DISTINCT …) is not a manifest sum
    assert(!metaOnly(spark.sql(
      "SELECT count(DISTINCT lang) AS n FROM ice.ma5")))
  }

  test("min/max fold bounds across file generations with disjoint value ranges") {
    val e = engine(mor = false, "ma6")
    val ev = Synth.events(spark, 2000, seed = 96).filter(col("op") =!= "D")
    e.applyBatch(0, ev.filter(col("commit_lsn") < 1000))
    // second generation writes a disjoint (uppercase) lang range, so the
    // global min comes from new files and the global max from old ones —
    // the answer must fold bounds across generations, not trust one file
    e.applyBatch(1, ev.filter(col("commit_lsn") >= 1000)
      .withColumn("lang", upper(col("lang"))))
    val df = spark.sql("SELECT min(lang) AS mn, max(lang) AS mx FROM ice.ma6")
    assert(metaOnly(df), df.queryExecution.optimizedPlan.toString)
    assert(df.head().toSeq === slowAgg(e, "min(lang)", "max(lang)"))
  }
}
