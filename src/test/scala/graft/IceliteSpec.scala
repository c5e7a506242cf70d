package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.types._
import graft.icelite.{Icelite, IceliteTable}
import graft.engine.SchemaEvolve

class IceliteSpec extends AnyFunSuite {

  def mkTable(): IceliteTable =
    IceliteTable.create(SparkTestBase.tmpDir("ice") + "/t", Seq("repo", "path"), 8)

  val schemaA = StructType(Seq(StructField("x", LongType)))

  test("empty table, create/load, pointer starts absent") {
    val t = mkTable()
    assert(t.currentSnapshotId === -1L)
    assert(t.currentSnapshot.isEmpty)
    assert(t.currentFiles() === Seq.empty)
    val t2 = IceliteTable.load(t.root.toString)
    assert(t2.meta.buckets === 8)
    assert(t2.meta.keyCols === List("repo", "path"))
  }

  test("commit chain, bucket inheritance, manifest pruning") {
    val t = mkTable()
    val sid = t.ensureSchema(schemaA)
    t.commit(0, sid, Map(1 -> List("f1.parquet"), 2 -> List("f2.parquet")),
      List(Icelite.BucketLineage(1, 0, 10, 5, 5)), 5)
    t.commit(1, sid, Map(2 -> List("f2b.parquet")), Nil, 3)
    val s = t.currentSnapshot.get
    assert(s.snapshotId === 1)
    assert(s.parentId === 0)
    // bucket 1 inherited, bucket 2 replaced
    assert(s.bucketFiles("1") === List("f1.parquet"))
    assert(s.bucketFiles("2") === List("f2b.parquet"))
    // manifest-level pruning returns only requested buckets
    assert(t.currentFiles(Some(Set(1))).map(_.split('/').last) === Seq("f1.parquet"))
    assert(t.committedEpochs === Set(0L, 1L))
    assert(t.lastEpoch === 1L)
  }

  test("epoch idempotency: re-commit of a seen epoch is a no-op") {
    val t = mkTable()
    val sid = t.ensureSchema(schemaA)
    val s1 = t.commit(5, sid, Map(0 -> List("a.parquet")), Nil, 1)
    val s2 = t.commit(5, sid, Map(0 -> List("b.parquet")), Nil, 1)
    assert(s2.snapshotId === s1.snapshotId)
    assert(t.currentSnapshot.get.bucketFiles("0") === List("a.parquet"))
  }

  test("crash between manifest write and pointer move: next commit recovers") {
    val t = mkTable()
    val sid = t.ensureSchema(schemaA)
    t.commit(0, sid, Map(0 -> List("a.parquet")), Nil, 1)
    // simulate a writer that died after writing snap-1.json but BEFORE the
    // pointer rename: the orphan manifest must be invisible and recoverable
    val orphan = t.root.resolve("metadata").resolve("snap-1.json")
    java.nio.file.Files.writeString(orphan, """{"snapshotId":1,"parentId":0,
      "batchEpoch":99,"schemaId":0,"bucketFiles":{},"bucketSchemaIds":{},
      "lineage":[],"totalRows":0,"commitMillis":0}""")
    assert(t.currentSnapshotId === 0) // pointer untouched -> old state visible
    assert(!t.committedEpochs.contains(99L)) // orphan epoch not committed
    // next commit takes snapshot id 1, overwriting the orphan atomically
    val s = t.commit(1, sid, Map(0 -> List("b.parquet")), Nil, 1)
    assert(s.snapshotId === 1 && s.batchEpoch === 1)
    assert(t.currentSnapshot.get.bucketFiles("0") === List("b.parquet"))
    assert(t.committedEpochs === Set(0L, 1L))
  }

  test("schema registry is append-only and deduplicating") {
    val t = mkTable()
    val a = t.ensureSchema(schemaA)
    val wide = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    t.commit(0, a, Map(0 -> List("a.parquet")), Nil, 1)
    val b = t.ensureSchema(wide)
    assert(b !== a)
    t.commit(1, b, Map(0 -> List("b.parquet")), Nil, 0)
    assert(t.ensureSchema(schemaA) === a) // identical schema reused
    assert(t.schema(a) === schemaA)
    assert(t.schema(b) === wide)
    assert(t.currentSnapshot.get.schemaId === b)
  }

  test("bucketSchemaIds track the writer schema per bucket") {
    val t = mkTable()
    val a = t.ensureSchema(schemaA)
    t.commit(0, a, Map(0 -> List("a.parquet"), 1 -> List("b.parquet")), Nil, 2)
    val wide = StructType(Seq(StructField("x", LongType), StructField("y", StringType)))
    val b = t.ensureSchema(wide)
    t.commit(1, b, Map(1 -> List("c.parquet")), Nil, 0)
    val groups = t.currentFileGroups(None)
    assert(groups(a).map(_.split('/').last) === Seq("a.parquet"))
    assert(groups(b).map(_.split('/').last) === Seq("c.parquet"))
  }
}

class SchemaEvolveSpec extends AnyFunSuite {
  val base = StructType(Seq(
    StructField("commit", StringType), StructField("size", IntegerType)))

  test("identical schema is unchanged") {
    assert(SchemaEvolve.reconcile(base, base).fieldNames.toSeq === Seq("commit", "size"))
  }

  test("add column appends") {
    val b = StructType(base.fields :+ StructField("branch", StringType))
    val r = SchemaEvolve.reconcile(base, b)
    assert(r.fieldNames.toSeq === Seq("commit", "size", "branch"))
  }

  test("widening int->long and float->double; narrow batch readable") {
    val b = StructType(Seq(StructField("size", LongType)))
    val r = SchemaEvolve.reconcile(base, b)
    assert(r("size").dataType === LongType)
    // table already wide, batch narrow -> stays wide
    val r2 = SchemaEvolve.reconcile(r, StructType(Seq(StructField("size", IntegerType))))
    assert(r2("size").dataType === LongType)
    assert(SchemaEvolve.widen(FloatType, DoubleType) === Some(DoubleType))
    assert(SchemaEvolve.widen(ByteType, ShortType) === Some(ShortType))
  }

  test("incompatible change rejected") {
    val b = StructType(Seq(StructField("size", StringType)))
    assertThrows[IllegalArgumentException](SchemaEvolve.reconcile(base, b))
    assert(SchemaEvolve.widen(IntegerType, DoubleType) === None)
  }
}
