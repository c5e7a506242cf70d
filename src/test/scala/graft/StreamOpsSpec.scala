package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.ChangeEvent
import graft.streaming.StreamOps

/** Top-level so Spark can derive an Encoder (inner classes can't). */
case class Mark(m_repo: String, m_ts: java.sql.Timestamp, mark: String)

class StreamOpsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def ev(repo: String, lsn: Long, tsSec: Long): ChangeEvent =
    ChangeEvent(repo, s"f$lsn.scala", s"c$lsn", "scala", s"body$lsn", "U", lsn,
      0, new java.sql.Timestamp(tsSec * 1000))

  test("windowed op counts with watermark over a memory stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.windowedOpCounts(in.toDF(), "1 minute", "2 minutes")
      .writeStream.format("memory").queryName("wincounts")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(ev("r1", 1, 60), ev("r1", 2, 70), ev("r2", 3, 130))
      q.processAllAvailable()
      val rows = spark.table("wincounts").collect()
      assert(rows.map(_.getLong(rows.head.fieldIndex("n"))).sum === 3)
      // two distinct 1-minute windows (t=60..120 and t=120..180)
      assert(rows.map(_.get(rows.head.fieldIndex("w_start"))).distinct.length === 2)
    } finally q.stop()
  }

  test("session windows: a gap of event-time silence closes the session") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.sessionCounts(in.toDF(), gap = "1 minute", lateness = "1 minute")
      .writeStream.format("memory").queryName("sessions")
      .outputMode(OutputMode.Complete()).start()
    try {
      // r1: two events 30s apart (one session), then one 10 min later (new
      // session); r2: a single event
      in.addData(ev("r1", 1, 600), ev("r1", 2, 630), ev("r1", 3, 1230), ev("r2", 4, 600))
      q.processAllAvailable()
      val rows = spark.table("sessions").collect()
        .map(r => (r.getString(r.fieldIndex("repo")),
          r.getLong(r.fieldIndex("n")))).toSeq.sorted
      assert(rows === Seq(("r1", 1L), ("r1", 2L), ("r2", 1L)))
    } finally q.stop()
  }

  test("dropDuplicatesWithinWatermark suppresses re-delivered events across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.dedupWithinWatermark(in.toDF(), "10 minutes")
      .writeStream.format("memory").queryName("dedupstream")
      .outputMode(OutputMode.Append()).start()
    try {
      in.addData(ev("r1", 1, 60), ev("r1", 1, 60), ev("r1", 2, 70)) // in-batch dup
      q.processAllAvailable()
      in.addData(ev("r1", 1, 60), ev("r2", 3, 80)) // cross-batch re-delivery
      q.processAllAvailable()
      val lsns = spark.table("dedupstream").collect()
        .map(r => r.getLong(r.fieldIndex("commit_lsn"))).sorted
      assert(lsns.toSeq === Seq(1L, 2L, 3L), "each (lsn, seq) delivered exactly once")
    } finally q.stop()
  }

  test("stream-stream interval join: only marks inside the horizon before the event match") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val evIn = MemoryStream[ChangeEvent]
    val mkIn = MemoryStream[Mark]
    def mk(repo: String, tsSec: Long, label: String): Mark =
      Mark(repo, new java.sql.Timestamp(tsSec * 1000), label)
    val q = StreamOps.enrichWithinInterval(evIn.toDF(), mkIn.toDF(), horizon = "10 minutes")
      .writeStream.format("memory").queryName("enriched")
      .outputMode(OutputMode.Append()).start()
    try {
      mkIn.addData(mk("r1", 600, "deploy-a"), mk("r1", 2000, "deploy-b"), mk("r2", 600, "deploy-c"))
      // lsn1 @900: r1 mark @600 is within [300, 900] -> enriched with deploy-a
      //            (the @2000 mark is AFTER the event -> excluded)
      // lsn2 @60:  no r1 mark in [-540, 60] -> dropped (inner join)
      // lsn3 @2000: r2 mark @600 is outside [1400, 2000] -> dropped
      evIn.addData(ev("r1", 1, 900), ev("r1", 2, 60), ev("r2", 3, 2000))
      q.processAllAvailable()
      val rows = spark.table("enriched").collect()
        .map(r => (r.getLong(r.fieldIndex("commit_lsn")), r.getString(r.fieldIndex("mark"))))
      assert(rows.toSet === Set((1L, "deploy-a")))
      // a second r1 event inside deploy-b's horizon still matches across batches
      evIn.addData(ev("r1", 4, 2300))
      q.processAllAvailable()
      val rows2 = spark.table("enriched").collect()
        .map(r => (r.getLong(r.fieldIndex("commit_lsn")), r.getString(r.fieldIndex("mark"))))
      assert(rows2.toSet === Set((1L, "deploy-a"), (4L, "deploy-b")))
    } finally q.stop()
  }

  test("mapGroupsWithState keeps running per-repo stats across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[ChangeEvent]
    val q = StreamOps.repoStats(in.toDS())
      .writeStream.format("memory").queryName("repostats")
      .outputMode(OutputMode.Update()).start()
    try {
      in.addData(ev("r1", 1, 10), ev("r1", 2, 20))
      q.processAllAvailable()
      in.addData(ev("r1", 5, 30), ev("r2", 4, 40))
      q.processAllAvailable()
      val latest = spark.table("repostats").collect()
        .groupBy(_.getString(0)).map { case (k, rs) => k -> rs.maxBy(_.getLong(1)) }
      assert(latest("r1").getLong(1) === 3) // state carried across batches
      assert(latest("r1").getLong(2) === 5) // high-water lsn
      assert(latest("r2").getLong(1) === 1)
    } finally q.stop()
  }
}
