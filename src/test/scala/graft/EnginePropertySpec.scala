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

  for (scenario <- 0 until 3; morEvo <- Seq(false, true))
    test(s"replay equivalence under random schema evolution + random order " +
        s"(scenario $scenario, ${if (morEvo) "merge-on-read" else "copy-on-write"})") {
      import org.apache.spark.sql.functions._
      val rnd = new scala.util.Random(2000 + scenario)
      val n = 600L
      val base = Synth.events(spark, n, seed = 20 + scenario, repos = 8, pathsPerRepo = 20)
      val k = 3 + rnd.nextInt(3)
      // lsn-range batches; each independently may carry an extra `size`
      // column as int or long (legal widening in either direction)
      val batches = Synth.batches(base, k, n).map { b =>
        rnd.nextInt(3) match {
          case 0 => b
          case 1 => b.withColumn("size",
            pmod(xxhash64(col("commit_lsn"), lit("sz")), lit(1000)).cast("int"))
          case 2 => b.withColumn("size",
            pmod(xxhash64(col("commit_lsn"), lit("sz")), lit(1000000)).cast("long"))
        }
      }
      val dir = SparkTestBase.tmpDir("prop-evo")
      val engine = new CdcEngine(spark,
        IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = morEvo),
        EngineConf(buckets = 8))
      val order = rnd.shuffle(batches.indices.toList)
      order.zipWithIndex.foreach { case (i, epoch) => engine.applyBatch(epoch.toLong, batches(i)) }

      val payload = Seq("commit", "lang", "content", "size")
      val oracle = TestOracle.finalState(batches.flatMap(_.collect().toSeq), payload)
      val got = engine.currentState().collect().map { r =>
        (r.getString(r.fieldIndex("repo")), r.getString(r.fieldIndex("path"))) -> r
      }.toMap
      assert(got.keySet === oracle.keySet, s"k=$k order=$order")
      for ((key, ks) <- oracle) {
        val r = got(key)
        assert(r.getLong(r.fieldIndex("_lsn")) === ks.lsn, s"lsn at $key (order=$order)")
        for (c <- payload) {
          val gv = if (!r.schema.fieldNames.contains(c) || r.isNullAt(r.fieldIndex(c))) null
            else r.get(r.fieldIndex(c)).toString
          val ev = Option(ks.cols.getOrElse(c, null)).map(_.toString).orNull
          assert(gv === ev, s"column $c at $key (order=$order)") // int/long compare via toString
        }
      }
    }

  // Property: the change feed equals the brute-force snapshot diff — for ANY
  // random batching and delivery order (including late batches whose LSNs
  // precede the cut's watermark), changesSince(cut) must return exactly the
  // keys whose folded state differs between the cut and the end, with the
  // final merged values. Runs in both write modes.
  for (scenario <- 0 until 3)
    test(s"changesSince equals the brute-force snapshot diff (scenario $scenario)") {
      val rnd = new scala.util.Random(3000 + scenario)
      val k = 2 + rnd.nextInt(4)
      val assignSeed = rnd.nextLong()
      val order = rnd.shuffle((0 until k).toList)
      val cut = 1 + rnd.nextInt(k - 1) // snapshot after `cut` applied batches
      val mor = scenario % 2 == 1
      val dir = SparkTestBase.tmpDir("prop-feed")
      val engine = new CdcEngine(spark,
        IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = mor),
        EngineConf(buckets = 8))
      val batches = (0 until k).map(i =>
        events.filter(pmod(xxhash64(lit(assignSeed), col("commit_lsn")), lit(k)) === lit(i)))
      order.take(cut).zipWithIndex.foreach { case (i, e) => engine.applyBatch(e.toLong, batches(i)) }
      val snapId = engine.table.currentSnapshotId
      order.drop(cut).zipWithIndex.foreach { case (i, e) =>
        engine.applyBatch((cut + e).toLong, batches(i)) }

      val payload = Seq("commit", "lang", "content")
      val atCut = TestOracle.fold(
        order.take(cut).flatMap(i => batches(i).collect().toSeq), payload)
      val atEnd = TestOracle.fold(
        order.flatMap(i => batches(i).collect().toSeq), payload)
      val expected = atEnd.filter { case (key, ks) => !atCut.get(key).contains(ks) }
      val feed = engine.changesSince(snapId).collect().map { r =>
        (r.getString(r.fieldIndex("repo")), r.getString(r.fieldIndex("path"))) ->
          ((r.getString(r.fieldIndex("_op")), r.getLong(r.fieldIndex("_lsn"))))
      }.toMap
      assert(feed.keySet === expected.keySet,
        s"k=$k cut=$cut order=$order mor=$mor")
      for ((key, ks) <- expected)
        assert(feed(key) === ((ks.op, ks.lsn)), s"at $key (order=$order mor=$mor)")
    }

  // the property must hold under BOTH write disciplines: copy-on-write
  // (merge at write) and merge-on-read (per-batch deltas, merge at read) —
  // same ACI reduction, applied at different times
  for (scenario <- 0 until 5; mor <- Seq(false, true))
    test(s"replay equivalence under random batching/order/duplication " +
        s"(scenario $scenario, ${if (mor) "merge-on-read" else "copy-on-write"})") {
      val rnd = new scala.util.Random(1000 + scenario)
      val k = 1 + rnd.nextInt(5)
      val assignSeed = rnd.nextLong()
      val order = rnd.shuffle((0 until k).toList)
      val dupIdx = if (rnd.nextBoolean()) Some(rnd.nextInt(k)) else None

      val dir = SparkTestBase.tmpDir("prop")
      val engine = new CdcEngine(spark,
        IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = mor),
        EngineConf(buckets = 8))
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
