package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Property: for ANY partition of the event log into batches, ANY delivery
  * order of those batches, and ANY duplicated batch, the final table state
  * equals the naive sequential fold — the merge is ACI (associative,
  * commutative, idempotent), so batching cannot be observed.
  * (north-rule replay equivalence, generalized; scenarios drawn from a
  * seeded RNG so failures replay deterministically) */
class EnginePropertySpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  val N = 800L
  lazy val events = Synth.events(spark, N, seed = 11, repos = 10, pathsPerRepo = 30).cache()
  lazy val oracle = TestOracle.finalState(events.collect().toSeq, Seq("commit", "lang", "content"))

  for (scenario <- 0 until 5)
    test(s"replay equivalence under random batching/order/duplication (scenario $scenario)") {
      val rnd = new scala.util.Random(1000 + scenario)
      val k = 1 + rnd.nextInt(5)
      val assignSeed = rnd.nextLong()
      val order = rnd.shuffle((0 until k).toList)
      val dupIdx = if (rnd.nextBoolean()) Some(rnd.nextInt(k)) else None

      val dir = SparkTestBase.tmpDir("prop")
      val engine = new CdcEngine(spark,
        IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
      val batches = (0 until k).map(i =>
        events.filter(pmod(xxhash64(lit(assignSeed), col("commit_lsn")), lit(k)) === lit(i)))
      var epoch = 0L
      for (i <- order) { engine.applyBatch(epoch, batches(i)); epoch += 1 }
      for (d <- dupIdx) { engine.applyBatch(epoch, batches(d)); epoch += 1 }

      val got = engine.currentState().collect().map { r =>
        (r.getString(r.fieldIndex("repo")), r.getString(r.fieldIndex("path"))) ->
          ((r.getLong(r.fieldIndex("_lsn")),
            Option(r.getString(r.fieldIndex("content"))).orNull))
      }.toMap
      assert(got.keySet === oracle.keySet,
        s"key set mismatch (k=$k order=$order dup=$dupIdx seed=$assignSeed)")
      for ((key, ks) <- oracle) {
        assert(got(key)._1 === ks.lsn, s"lsn at $key (k=$k order=$order dup=$dupIdx)")
        assert(got(key)._2 === ks.cols.getOrElse("content", null), s"content at $key")
      }
    }
}
