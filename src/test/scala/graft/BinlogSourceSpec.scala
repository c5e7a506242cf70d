package graft

import org.apache.spark.sql.functions.{col, struct, to_json}
import org.scalatest.funsuite.AnyFunSuite

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.streaming.CdcStream
import graft.streaming.binlog.{BinlogClient, BinlogServer}
import graft.synth.Synth

/** The network (Kafka-shaped) source end-to-end: a [[BinlogServer]] on
  * loopback TCP, tailed through the `cdc-binlog` DataSource V2
  * MicroBatchStream into the engine's MERGE. Every record crosses a real
  * socket; the server counts records served, so the specs can assert each
  * offset range was fetched exactly once (replayable source + checkpointed
  * offsets + idempotent sink = exactly-once, measured, not argued). */
class BinlogSourceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private val PARTS = 3

  /** Publish events to the server partitioned by key hash (a producer's
    * partitioner), in (commit_lsn, seq) order within the publishing loop. */
  private def publish(server: BinlogServer, jsonByKeyHash: Seq[(Int, String)]): Unit =
    jsonByKeyHash.foreach { case (p, j) => server.append(p, j) }

  private def eventsAsJson(n: Long): Seq[(Int, String)] = {
    import spark.implicits._
    val ev = Synth.events(spark, n, seed = 33, repos = 15, pathsPerRepo = 40)
    ev.select(
        (org.apache.spark.sql.functions.abs(
          org.apache.spark.sql.functions.hash(col("repo"), col("path"))) % PARTS).as("p"),
        to_json(struct(ev.columns.map(col): _*)).as("j"))
      .orderBy(col("j")) // deterministic publish order; LWW is order-insensitive
      .as[(Int, String)].collect().toSeq
  }

  test("network tail equals naive fold; admission control batches; resume fetches only the delta") {
    val work = SparkTestBase.tmpDir("binlog")
    val server = new BinlogServer(PARTS)
    try {
      val N = 3000L
      val all = eventsAsJson(N)
      val (w1, w2) = (all.take(2000), all.drop(2000))

      publish(server, w1)
      val table = IceliteTable.create(s"$work/t", Seq("repo", "path"), 8)
      val engine = new CdcEngine(spark, table, EngineConf(buckets = 8))

      // Admission control: 700 records/trigger over 2000 published -> >= 3
      // micro-batches, each its own epoch-keyed snapshot commit.
      CdcStream.runBinlogAvailableNow(spark, engine, server.address, server.port,
        s"$work/ckpt", maxRecordsPerTrigger = 700)
      assert(table.currentSnapshotId >= 2, "admission control should split the drain")
      assert(server.recordsServed === w1.size.toLong,
        "each wave-1 record must cross the wire exactly once")

      // Publish the delta; resume from the same checkpoint: the source must
      // fetch ONLY the new offsets (recordsServed grows by exactly |w2|).
      publish(server, w2)
      CdcStream.runBinlogAvailableNow(spark, engine, server.address, server.port, s"$work/ckpt")
      assert(server.recordsServed === all.size.toLong,
        "resume must fetch only the published delta")

      // Replay equivalence vs the independent sequential fold.
      val oracle = TestOracle.finalState(
        Synth.events(spark, N, seed = 33, repos = 15, pathsPerRepo = 40).collect().toSeq,
        Seq("commit", "lang", "content"))
      val got = engine.currentState().collect().map { r =>
        (r.getString(r.fieldIndex("repo")), r.getString(r.fieldIndex("path"))) -> r
      }.toMap
      assert(got.keySet === oracle.keySet)
      for ((k, ks) <- oracle) {
        val r = got(k)
        assert(r.getLong(r.fieldIndex("_lsn")) === ks.lsn, s"lsn at $k")
        val c = if (r.isNullAt(r.fieldIndex("content"))) null
        else r.getString(r.fieldIndex("content"))
        assert(c === ks.cols.getOrElse("content", null).asInstanceOf[String], s"content at $k")
      }

      // Clean re-run with no new input: no fetch, no snapshot.
      val (snapBefore, servedBefore) = (table.currentSnapshotId, server.recordsServed)
      CdcStream.runBinlogAvailableNow(spark, engine, server.address, server.port, s"$work/ckpt")
      assert(table.currentSnapshotId === snapBefore, "empty re-run must not commit")
      assert(server.recordsServed === servedBefore, "empty re-run must not fetch")
    } finally server.stop()
  }

  test("batch read snapshots the log; payloads survive the wire byte-exact") {
    val server = new BinlogServer(2)
    try {
      val payloads = Seq(
        (0, "plain"),
        (0, "multi\nline\twith\ttabs"),
        (1, "unicode é中文 😀 and \"quotes\""),
        (1, ""))
      payloads.foreach { case (p, s) => server.append(p, s) }

      val df = spark.read.format("cdc-binlog")
        .option("host", server.address).option("port", server.port).load()
      val rows = df.collect().map(r => (r.getInt(0), r.getLong(1), r.getString(2))).toSet
      assert(rows === Set((0, 0L, "plain"), (0, 1L, "multi\nline\twith\ttabs"),
        (1, 0L, "unicode é中文 😀 and \"quotes\""), (1, 1L, "")))

      // remote producer path: PUBLISH over the socket assigns the next offset
      val client = new BinlogClient(server.address, server.port)
      try {
        assert(client.publish(0, "via-socket") === 2L)
        assert(client.latest().toSeq === Seq(3L, 2L))
      } finally client.close()
    } finally server.stop()
  }
}
