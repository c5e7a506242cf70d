package graft

import java.nio.file.{Files, Paths}

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Dead-letter quarantine: malformed change events (null key/op/lsn/seq)
  * must be VISIBLE — written to the DLQ with a reason and counted on the
  * commit — never silently dropped, and never applied. */
class DlqSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def newEngine(dlq: String): CdcEngine = {
    val dir = SparkTestBase.tmpDir("dlq")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8)
    new CdcEngine(spark, t, EngineConf(buckets = 8, dlqDir = dlq))
  }

  test("malformed rows land in the DLQ with reasons; valid rows apply; counts add up") {
    val dlq = SparkTestBase.tmpDir("dlqout") + "/q"
    val engine = newEngine(dlq)
    val good = Synth.events(spark, 500, seed = 31)
    // poison a deterministic slice: ids 0-9 null repo, 10-19 null op,
    // 20-29 null lsn, 30-39 null seq
    val bad = good
      .withColumn("repo", when(col("commit_lsn") < 10, lit(null: String)).otherwise(col("repo")))
      .withColumn("op", when(col("commit_lsn").between(10, 19), lit(null: String)).otherwise(col("op")))
      .withColumn("seq", when(col("commit_lsn").between(30, 39), lit(null).cast("int")).otherwise(col("seq")))
      .withColumn("commit_lsn", when(col("commit_lsn").between(20, 29), lit(null).cast("long")).otherwise(col("commit_lsn")))

    val r = engine.applyBatch(0, bad)
    assert(r.rejected === 40L)
    assert(r.events === 460L)
    assert(engine.currentState().count() ===
      engine.currentState().filter(col("repo").isNotNull).count())

    val q = spark.read.parquet(s"$dlq/epoch=0")
    assert(q.count() === 40)
    val reasons = q.groupBy(col("_reason")).count().collect()
      .map(x => x.getString(0) -> x.getLong(1)).toMap
    assert(reasons === Map(
      "null_key" -> 10L, "null_op" -> 10L, "null_lsn" -> 10L, "null_seq" -> 10L))
    // quarantined rows keep their full original payload for replay-after-fix
    assert(q.columns.toSet === bad.columns.toSet + "_reason")
  }

  test("clean batch writes an empty quarantine; disabled DLQ writes nothing") {
    val dlq = SparkTestBase.tmpDir("dlqout2") + "/q"
    val engine = newEngine(dlq)
    val r = engine.applyBatch(0, Synth.events(spark, 200, seed = 32))
    assert(r.rejected === 0L)

    val off = newEngine("")
    val allBad = Synth.events(spark, 50, seed = 33)
      .withColumn("op", lit(null: String))
    val r2 = off.applyBatch(0, allBad)
    // disabled: dropped silently (legacy behavior), epoch still committed
    assert(r2.rejected === 0L && r2.events === 0L)
    assert(off.table.lastEpoch === 0L)
    assert(off.applyBatch(0, allBad).skipped)
  }

  test("an all-malformed batch quarantines everything and commits an empty epoch") {
    val dlq = SparkTestBase.tmpDir("dlqout3") + "/q"
    val engine = newEngine(dlq)
    val allBad = Synth.events(spark, 50, seed = 34)
      .withColumn("commit_lsn", lit(null).cast("long"))
    val r = engine.applyBatch(7, allBad)
    assert(r.rejected === 50L && r.events === 0L)
    assert(spark.read.parquet(s"$dlq/epoch=7").count() === 50)
    assert(engine.table.lastEpoch === 7L)
    assert(engine.currentState().count() === 0)
  }
}
