package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.model.ChangeEvent
import graft.streaming.StreamOps

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
