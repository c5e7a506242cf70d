package graft

import java.nio.file.{Files, Path}
import scala.jdk.CollectionConverters._

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.synth.Synth

/** Read-path scale properties of the TABLE layout itself: compaction output
  * is key-clustered (Iceberg sort-compaction — the long-lived files get
  * tight page stats and dictionary runs; the hot ingest path stays
  * sort-free), and a projected state read prunes unread payload columns all
  * the way down to the parquet scan (each cell is its own parquet column,
  * so Catalyst's nested-schema pruning makes narrow reads proportional to
  * the columns asked for, not the table width). */
class ClusteredReadSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  def newEngine(mor: Boolean): CdcEngine = {
    val dir = SparkTestBase.tmpDir("clustered")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 4, mergeOnRead = mor)
    new CdcEngine(spark, t, EngineConf(buckets = 4))
  }

  def parquetFiles(root: Path): Seq[Path] = {
    val s = Files.walk(root.resolve("data"))
    try s.iterator().asScala
      .filter(p => p.toString.endsWith(".parquet") && Files.isRegularFile(p)).toList
    finally s.close()
  }

  test("compaction rewrites every bucket key-sorted; ingest files stay unsorted-cheap") {
    val engine = newEngine(mor = true)
    val ev = Synth.events(spark, 4000, seed = 41)
    Synth.batches(ev, 3, 4000).zipWithIndex.foreach { case (b, i) =>
      engine.applyBatch(i, b)
    }
    engine.compact()
    val compacted = parquetFiles(engine.table.root)
      .filter(_.toString.contains("compact-"))
    assert(compacted.nonEmpty)
    for (f <- compacted) {
      val keys = spark.read.parquet(f.toString)
        .select(col("repo"), col("path")).collect()
        .map(r => (r.getString(0), r.getString(1))).toSeq
      assert(keys === keys.sorted, s"compacted file $f is not key-clustered")
      assert(keys.nonEmpty)
    }
    // and the merge semantics are untouched by the sort
    val st = engine.currentState()
    assert(st.count() === st.select(col("repo"), col("path")).distinct().count())
  }

  test("projected state reads prune unread payload cells down to the parquet scan") {
    val engine = newEngine(mor = false)
    engine.applyBatch(0, Synth.events(spark, 3000, seed = 42))
    val narrow = engine.currentState().select("repo", "path", "lang")
    narrow.collect()
    val p = narrow.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(p.contains("ReadSchema"))
    // the content cell (the WIDE column of the repo-content table) must not
    // be read for a (repo, path, lang) projection; the _op cell must (the
    // tombstone filter needs it)
    assert(!p.contains("content"), s"narrow read scans the content cell:\n$p")
    assert(p.contains("_op"))
  }
}
