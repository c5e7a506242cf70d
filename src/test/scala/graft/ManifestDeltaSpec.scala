package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types.{LongType, StructField, StructType}

import graft.icelite.{Icelite, IceliteTable}

/** Delta manifests: each snapshot serializes ONLY the buckets its commit
  * touched (per-commit metadata O(changed buckets), not O(table files));
  * readers resolve the full mapping by the cached parent walk, and an
  * expireSnapshots re-root re-materializes one full manifest. */
class ManifestDeltaSpec extends AnyFunSuite {

  private val schemaA = StructType(Seq(StructField("x", LongType)))
  private def f(p: String) = Icelite.DataFile(p, 0, 1)
  private def mkTable(buckets: Int = 64): IceliteTable =
    IceliteTable.create(SparkTestBase.tmpDir("mdelta") + "/t", Seq("repo", "path"), buckets)
  private def rawSnapJson(t: IceliteTable, id: Long): String =
    java.nio.file.Files.readString(t.root.resolve("metadata").resolve(s"snap-$id.json"))

  test("a sparse commit's manifest lists only its touched buckets") {
    val t = mkTable()
    val sid = t.ensureSchema(schemaA)
    // seed: fill 64 buckets (first commit is trivially full)
    t.commit(0, sid, (0 until 64).map(b => b -> List(f(s"seed-$b.parquet"))).toMap,
      Nil, 64)
    t.commit(1, sid, Map(7 -> List(f("only7.parquet"))), Nil, 1)
    val raw = rawSnapJson(t, 1)
    assert(raw.contains("only7.parquet"))
    assert(!raw.contains("seed-12.parquet"), "delta manifest re-listed an untouched bucket")
    // resolution is still complete
    val full = t.bucketFilesOf(t.currentSnapshot.get)
    assert(full.size === 64)
    assert(full("7").map(_.path) === List("only7.parquet"))
    assert(full("12").map(_.path) === List("seed-12.parquet"))
  }

  test("per-commit metadata stays O(touched), not O(table)") {
    val t = mkTable()
    val sid = t.ensureSchema(schemaA)
    t.commit(0, sid, (0 until 64).map(b => b -> List(f(s"seed-$b.parquet"))).toMap,
      Nil, 64)
    val rootBytes = rawSnapJson(t, 0).length
    (1 to 50).foreach { e =>
      t.commit(e, sid, Map((e % 4) -> List(f(s"d$e.parquet"))), Nil, 1, append = true)
    }
    // append-mode deltas re-list the touched bucket's (growing) full list,
    // but never the other 63 buckets — each delta manifest stays far under
    // the full-map size
    val deltaBytes = (1 to 50).map(id => rawSnapJson(t, id.toLong).length)
    assert(deltaBytes.max < rootBytes / 4,
      s"delta manifest (${deltaBytes.max} B) should be far under the full map ($rootBytes B)")
    // and the resolution has every file
    val full = t.bucketFilesOf(t.currentSnapshot.get)
    assert(full.valuesIterator.flatten.size === 64 + 50)
    assert(full("1").map(_.path) ===
      "seed-1.parquet" :: (1 to 50).filter(_ % 4 == 1).map(e => s"d$e.parquet").toList)
  }

  test("resolver equals a brute-force fold under replace/append/rollback") {
    val t = mkTable(buckets = 8)
    val sid = t.ensureSchema(schemaA)
    var oracle = Map.empty[String, List[String]]
    def applyOracle(bs: Map[Int, List[String]], append: Boolean): Unit =
      bs.foreach { case (b, ps) =>
        val k = b.toString
        oracle += k -> (if (append) oracle.getOrElse(k, Nil) ++ ps else ps)
      }
    var epoch = 0L
    def commit(bs: Map[Int, List[String]], append: Boolean): Unit = {
      t.commit(epoch, sid, bs.map { case (b, ps) => b -> ps.map(f) }, Nil, 0, append = append)
      applyOracle(bs, append); epoch += 1
    }
    commit(Map(0 -> List("a0"), 1 -> List("b0"), 2 -> List("c0")), append = false)
    commit(Map(1 -> List("b1")), append = true)
    commit(Map(0 -> List("a1")), append = false) // replace (compaction-like)
    commit(Map(2 -> List("c1"), 3 -> List("e0")), append = true)
    val beforeRollback = t.currentSnapshotId
    commit(Map(1 -> List("b2")), append = true)
    def resolved: Map[String, List[String]] =
      t.bucketFilesOf(t.currentSnapshot.get).map { case (k, v) => k -> v.map(_.path) }
    assert(resolved === oracle)
    // rollback re-lists only changed buckets; resolution follows
    t.rollbackTo(beforeRollback)
    assert(resolved ===
      t.bucketFilesOf(t.snapshot(beforeRollback)).map { case (k, v) => k -> v.map(_.path) })
    // time travel still resolves historic snapshots exactly
    assert(t.fileGroupsAt(1).values.flatten.toSeq.map(_.split('/').last).sorted ===
      Seq("a0", "b0", "b1", "c0"))
  }

  test("expire re-roots onto a FULL manifest readable without ancestors") {
    val t = mkTable(buckets = 8)
    val sid = t.ensureSchema(schemaA)
    t.commit(0, sid, Map(0 -> List(f("a0")), 1 -> List(f("b0"))), Nil, 2)
    t.commit(1, sid, Map(2 -> List(f("c0"))), Nil, 1, append = true)
    t.commit(2, sid, Map(0 -> List(f("a1"))), Nil, 0)
    t.expireSnapshots(keepLast = 1)
    val root = t.currentSnapshot.get
    assert(root.parentId === -1L && root.full)
    // the re-rooted manifest stands alone: ancestors are deleted, yet the
    // whole mapping (incl. buckets last touched by expired commits) resolves
    assert(t.bucketFilesOf(root).view.mapValues(_.map(_.path)).toMap ===
      Map("0" -> List("a1"), "1" -> List("b0"), "2" -> List("c0")))
  }
}
