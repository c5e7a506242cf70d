package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{AnalysisException, DataFrame}

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.sql.IceliteSql
import graft.synth.Synth

/** The SQL read surface (graft.sql.IceliteSql): `ice.<name>` relations,
  * VERSION/TIMESTAMP AS OF time travel, ref reads, metadata tables, reader
  * options, and read-only enforcement — all against the DataFrame API the
  * engine already proves correct. */
class SqlSurfaceSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def sameRows(sql: String, df: DataFrame): Unit =
    assert(rowsOf(spark.sql(sql)) === rowsOf(df), s"mismatch for: $sql")

  // one shared COW table: two batches, a tag at the first, a branch lane
  private lazy val fixture: (CdcEngine, Long, Long) = {
    val dir = SparkTestBase.tmpDir("sqlspec")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    engine.applyBatch(0, Synth.events(spark, 1500, seed = 31))
    val sid1 = engine.table.currentSnapshotId
    engine.tagSnapshot("v1")
    Thread.sleep(10) // distinct commitMillis so TIMESTAMP AS OF can split them
    engine.applyBatch(1, Synth.events(spark, 1500, seed = 32)
      .withColumn("commit_lsn", org.apache.spark.sql.functions.col("commit_lsn") + 1500))
    val sid2 = engine.table.currentSnapshotId
    IceliteSql.register(spark, "t", engine)
    (engine, sid1, sid2)
  }

  test("SELECT from ice.t is the current visible state") {
    val (engine, _, _) = fixture
    sameRows("SELECT * FROM ice.t", engine.currentState())
    // and through the reader API
    assert(rowsOf(spark.read.table("ice.t")) === rowsOf(engine.currentState()))
  }

  test("VERSION AS OF: snapshot id, tag, and branch all resolve") {
    val (engine, sid1, _) = fixture
    sameRows(s"SELECT * FROM ice.t VERSION AS OF $sid1", engine.stateAt(sid1))
    sameRows("SELECT * FROM ice.t VERSION AS OF 'v1'", engine.stateAt(sid1))
    engine.createBranch("lane")
    engine.applyBatchToBranch(7, Synth.events(spark, 300, seed = 33)
      .withColumn("commit_lsn", org.apache.spark.sql.functions.col("commit_lsn") + 9000),
      "lane")
    sameRows("SELECT * FROM ice.t VERSION AS OF 'lane'", engine.stateAtBranch("lane"))
    // the branch write stayed off main
    sameRows("SELECT * FROM ice.t", engine.currentState())
  }

  test("TIMESTAMP AS OF picks the latest snapshot at or before the timestamp") {
    val (engine, sid1, sid2) = fixture
    val s1 = engine.table.snapshot(sid1)
    val s2 = engine.table.snapshot(sid2)
    assume(s1.commitMillis < s2.commitMillis)
    def fmt(ms: Long): String =
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSS")
        .withZone(java.time.ZoneOffset.UTC)
        .format(java.time.Instant.ofEpochMilli(ms))
    sameRows(s"SELECT * FROM ice.t TIMESTAMP AS OF '${fmt(s1.commitMillis)}'",
      engine.stateAt(sid1))
    sameRows(s"SELECT * FROM ice.t TIMESTAMP AS OF '${fmt(s2.commitMillis + 60000)}'",
      engine.currentState())
    val before = intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM ice.t TIMESTAMP AS OF '${fmt(s1.commitMillis - 60000)}'")
    }
    assert(before.getMessage.contains("no snapshot committed at or before"))
  }

  test("self-join and joins against other relations resolve with fresh attributes") {
    val (engine, _, _) = fixture
    val n = engine.currentState().count()
    val selfJoined = spark.sql(
      "SELECT a.repo, a.path FROM ice.t a JOIN ice.t b ON a.repo = b.repo AND a.path = b.path")
    assert(selfJoined.count() === n)
    spark.sql("SELECT 'repo-0' AS repo").createOrReplaceTempView("hotrepo")
    val joined = spark.sql(
      "SELECT count(*) AS n FROM ice.t t JOIN hotrepo h ON t.repo = h.repo")
    assert(joined.collect()(0).getLong(0) ===
      engine.currentState().filter("repo = 'repo-0'").count())
  }

  test("metadata tables: snapshots, refs, files (with time travel), lineage") {
    val (engine, sid1, _) = fixture
    assert(rowsOf(spark.sql("SELECT * FROM ice.t.snapshots")) ===
      rowsOf(engine.inspect.snapshots))
    assert(spark.sql("SELECT * FROM ice.t.refs WHERE name = 'v1'").count() === 1)
    assert(rowsOf(spark.sql(s"SELECT * FROM ice.t.files VERSION AS OF $sid1")) ===
      rowsOf(engine.inspect.files(sid1)))
    assert(spark.sql("SELECT * FROM ice.t.lineage").count() > 0)
    val noTravel = intercept[AnalysisException] {
      spark.sql(s"SELECT * FROM ice.t.snapshots VERSION AS OF $sid1")
    }
    assert(noTravel.getMessage.contains("does not support time travel"))
  }

  test("reader options: versionAsOf / timestampAsOf, and the change feeds") {
    val (engine, sid1, sid2) = fixture
    assert(rowsOf(spark.read.option("versionAsOf", "v1").table("ice.t")) ===
      rowsOf(engine.stateAt(sid1)))
    assert(rowsOf(spark.read.option("sinceSnapshot", sid1).table("ice.t.changes")) ===
      rowsOf(engine.changesSince(sid1)))
    // versionAsOf pins the window END of a feed read
    assert(rowsOf(spark.read.option("sinceSnapshot", sid1)
        .option("versionAsOf", sid2).table("ice.t.changelog")) ===
      rowsOf(engine.changelogSince(sid1, toSnapshotId = sid2)))
    val missing = intercept[AnalysisException] {
      spark.read.table("ice.t.changes").collect()
    }
    assert(missing.getMessage.contains("sinceSnapshot"))
  }

  test("DESCRIBE [EXTENDED] and SHOW TABLES answer from table metadata") {
    val (engine, _, _) = fixture
    val desc = spark.sql("DESCRIBE ice.t").collect()
    assert(desc.map(_.getString(0)).take(2).toSeq === Seq("repo", "path"))
    assert(desc.count(_.getString(2).contains("key column")) === 2)
    assert(desc.exists(r => r.getString(0) == "content" && r.getString(2).contains("payload")))
    val ext = spark.sql("DESCRIBE EXTENDED ice.t").collect()
      .map(r => r.getString(0) -> r.getString(1)).toMap
    assert(ext("Buckets") === "8")
    assert(ext("Write Mode") === "copy-on-write")
    assert(ext("Current Snapshot") === engine.table.currentSnapshotId.toString)
    assert(spark.sql("SHOW TABLES IN ice").collect().map(_.getString(1)).contains("t"))
  }

  test("malformed writes fail loudly; unregistered names stay unresolved") {
    val (_, _, _) = fixture
    // DML is supported (SqlDmlSpec), but a positional INSERT must cover the
    // full column list — a 2-column VALUES row is a user error, not a write
    val ins = intercept[AnalysisException] {
      spark.sql("INSERT INTO ice.t VALUES ('r', 'p')")
    }
    assert(ins.getMessage.contains("expects 5 columns"), s"got: ${ins.getMessage}")
    val unknown = intercept[AnalysisException] {
      spark.sql("SELECT * FROM ice.never_registered")
    }
    assert(unknown.getMessage.toLowerCase.contains("cannot be found") ||
      unknown.getMessage.toLowerCase.contains("not found"), s"got: ${unknown.getMessage}")
  }

  test("a rebucket after registration is adopted, not crashed on") {
    val dir = SparkTestBase.tmpDir("sqlspec-rebucket")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8), EngineConf(buckets = 8))
    engine.applyBatch(0, Synth.events(spark, 800, seed = 51))
    IceliteSql.register(spark, "rb", engine)
    assert(rowsOf(spark.sql("SELECT * FROM ice.rb")) === rowsOf(engine.currentState()))
    val engine16 = engine.rebucket(16) // the OLD registration must still resolve
    engine16.applyBatch(1, Synth.events(spark, 400, seed = 52)
      .withColumn("commit_lsn", org.apache.spark.sql.functions.col("commit_lsn") + 800))
    assert(rowsOf(spark.sql("SELECT * FROM ice.rb")) === rowsOf(engine16.currentState()))
  }

  test("merge-on-read tables read identically through SQL (read-time LWW merge)") {
    val dir = SparkTestBase.tmpDir("sqlspec-mor")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8, mergeOnRead = true),
      EngineConf(buckets = 8))
    engine.applyBatch(0, Synth.events(spark, 1200, seed = 41))
    engine.applyBatch(1, Synth.events(spark, 1200, seed = 42)
      .withColumn("commit_lsn", org.apache.spark.sql.functions.col("commit_lsn") + 1200))
    IceliteSql.register(spark, "mor", engine)
    sameRows("SELECT * FROM ice.mor", engine.currentState())
    val agg = spark.sql(
      "SELECT lang, count(*) AS n FROM ice.mor GROUP BY lang ORDER BY lang")
    assert(rowsOf(agg) ===
      rowsOf(engine.currentState().groupBy("lang").count()
        .withColumnRenamed("count", "n").orderBy("lang")))
  }
}
