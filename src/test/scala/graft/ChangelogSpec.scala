package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** The CDF-style changelog (`changelogSince`): the snapshot diff classified
  * into insert / update_preimage / update_postimage / delete rows, the shape
  * Delta CDF and Iceberg's changelog view give downstream consumers. */
class ChangelogSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  private def newEngine(mor: Boolean = false): CdcEngine = {
    val dir = SparkTestBase.tmpDir("changelog")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = mor)
    new CdcEngine(spark, t, EngineConf(buckets = 8))
  }

  private def ev(path: String, content: String, lsn: Long, op: String) =
    ("r1", path, s"c$lsn", "en", content, op, lsn, 1,
      new java.sql.Timestamp(lsn * 1000))

  private def df(rows: Seq[(String, String, String, String, String, String, Long, Int, java.sql.Timestamp)]) =
    rows.toDF("repo", "path", "commit", "lang", "content", "op", "commit_lsn", "seq", "ts")

  /** (path, change_type) -> (content, change_lsn) for compact assertions. */
  private def byType(rows: Array[Row]): Map[(String, String), (String, Long)] =
    rows.map { r =>
      (r.getString(r.fieldIndex("path")), r.getString(r.fieldIndex("_change_type"))) ->
        ((if (r.isNullAt(r.fieldIndex("content"))) null
          else r.getString(r.fieldIndex("content"))),
          r.getLong(r.fieldIndex("_change_lsn")))
    }.toMap

  private def classify(mor: Boolean): Unit = {
    val e = newEngine(mor)
    e.applyBatch(0, df(Seq(
      ev("keep", "same", 1, "I"),     // untouched after snap0 -> no changelog row
      ev("upd", "v1", 2, "I"),        // updated in the window
      ev("gone", "bye", 3, "I"),      // deleted in the window
      ev("revive", null, 4, "D"))))   // tombstone at since; revived later -> insert
    val since = e.table.currentSnapshotId
    e.applyBatch(1, df(Seq(
      ev("upd", "v2", 10, "U"),
      ev("gone", null, 11, "D"),
      ev("new", "hello", 12, "I"),
      ev("revive", "back", 13, "I"),
      ev("blip", "flash", 14, "I"))))
    e.applyBatch(2, df(Seq(
      ev("blip", null, 20, "D"))))    // created AND deleted inside the window

    val log = e.changelogSince(since).collect()
    val m = byType(log)
    assert(log.length === 5, s"expected 5 changelog rows, got:\n${log.mkString("\n")}")
    assert(m(("new", "insert")) === (("hello", 12L)))
    // a key whose `since` image was a TOMBSTONE is an insert, not an update
    assert(m(("revive", "insert")) === (("back", 13L)))
    // the update pair shares _change_lsn and carries both images
    assert(m(("upd", "update_preimage")) === (("v1", 10L)))
    assert(m(("upd", "update_postimage")) === (("v2", 10L)))
    // the delete row carries the preimage payload and the tombstone's lsn
    assert(m(("gone", "delete")) === (("bye", 11L)))
    // carry-forward: the D event had null payload, the preimage rides along
    // on the postimage side of the engine too — check via the delete's _ts
    val delTs = log.find(r => r.getString(r.fieldIndex("path")) == "gone").get
    assert(delTs.getTimestamp(delTs.fieldIndex("_ts")).getTime === 11000L)
    // net no-ops emit nothing: untouched key, and create+delete in-window
    assert(!m.keySet.exists(_._1 == "keep"))
    assert(!m.keySet.exists(_._1 == "blip"))
  }

  test("classifies insert / update pair / delete; net no-ops vanish (copy-on-write)") {
    classify(mor = false)
  }

  test("classifies insert / update pair / delete; net no-ops vanish (merge-on-read)") {
    classify(mor = true)
  }

  test("bootstrap (since < 0) is all-insert redelivery of visible state") {
    val e = newEngine()
    e.applyBatch(0, df(Seq(ev("a", "x", 1, "I"), ev("b", "y", 2, "I"),
      ev("b", null, 3, "D"))))
    val log = e.changelogSince(-1L).collect()
    assert(log.map(_.getString(2)).toSet === Set("c1")) // only a's commit visible
    assert(log.map(r => r.getString(r.fieldIndex("_change_type"))).toSeq === Seq("insert"))
  }

  test("changelog applied to the since-state reproduces the to-state (mirror contract)") {
    val e = newEngine(mor = true)
    val all = Synth.events(spark, 4000, seed = 91)
    val bs = Synth.batches(all, 4, 4000)
    e.applyBatch(0, bs(0))
    val since = e.table.currentSnapshotId
    bs.drop(1).zipWithIndex.foreach { case (b, i) => e.applyBatch(i + 1L, b) }
    val toId = e.table.currentSnapshotId

    val log = e.changelogSince(since, toSnapshotId = toId)
    // fold the changelog over the since-state exactly as a mirror would:
    // drop deleted keys, overwrite updated keys with the postimage, add
    // inserts — the result must equal the visible to-state
    val keyC = Seq("repo", "path")
    val valCols = Seq("repo", "path", "commit", "lang", "content")
    val base = e.stateAt(since).select(valCols.map(col): _*)
    val touchedKeys = log.select("repo", "path").distinct()
    val applied = base.join(touchedKeys, keyC, "left_anti")
      .unionByName(log.filter(col("_change_type").isin("insert", "update_postimage"))
        .select(valCols.map(col): _*))
    val want = e.stateAt(toId).select(valCols.map(col): _*)
    assert(applied.collect().map(_.toString).sorted.toSeq ===
      want.collect().map(_.toString).sorted.toSeq)
    // and the pair invariant holds globally: every update_preimage has
    // exactly one postimage partner at the same (key, _change_lsn)
    val pre = log.filter(col("_change_type") === "update_preimage")
      .select("repo", "path", "_change_lsn")
    val post = log.filter(col("_change_type") === "update_postimage")
      .select("repo", "path", "_change_lsn")
    assert(pre.exceptAll(post).count() === 0L)
    assert(post.exceptAll(pre).count() === 0L)
  }

  test("schema evolution in the window: preimage of a later column is null") {
    val e = newEngine()
    e.applyBatch(0, df(Seq(ev("p", "v1", 1, "I"))))
    val since = e.table.currentSnapshotId
    // evolve: a batch with an extra payload column
    val wide = Seq(("r1", "p", "c9", "en", "v2", "stars", "U", 9L, 1,
      new java.sql.Timestamp(9000)))
      .toDF("repo", "path", "commit", "lang", "content", "extra",
        "op", "commit_lsn", "seq", "ts")
    e.applyBatch(1, wide)
    val log = e.changelogSince(since).collect()
    val m = log.map(r => r.getString(r.fieldIndex("_change_type")) ->
      (if (r.isNullAt(r.fieldIndex("extra"))) null
       else r.getString(r.fieldIndex("extra")))).toMap
    assert(m === Map("update_preimage" -> null, "update_postimage" -> "stars"))
  }
}
