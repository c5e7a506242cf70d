package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.{AnalysisException, DataFrame, Row}
import org.apache.spark.sql.functions.col

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable
import graft.sql.IceliteSql
import graft.synth.Synth

/** The SQL maintenance surface (graft.sql.IceliteProcedures):
  * `CALL ice.system.<proc>(...)` stored procedures over registered tables,
  * each proven equivalent to the engine/table API it fronts. */
class SqlProcedureSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  private def rowsOf(df: DataFrame): Seq[String] =
    df.collect().map(_.toString).sorted.toSeq

  private def shifted(n: Int, seed: Long, lsnBase: Long) =
    Synth.events(spark, n, seed = seed).withColumn("commit_lsn", col("commit_lsn") + lsnBase)

  private def freshEngine(name: String, buckets: Int = 8,
      conf: EngineConf = EngineConf(buckets = 8)): CdcEngine = {
    val dir = SparkTestBase.tmpDir(s"sqlproc-$name")
    val engine = new CdcEngine(spark,
      IceliteTable.create(s"$dir/t", Seq("repo", "path"), buckets),
      conf.copy(buckets = buckets))
    IceliteSql.register(spark, name, engine)
    engine
  }

  test("tags and rollback: create_tag / drop_tag / rollback_to_snapshot") {
    val engine = freshEngine("pt")
    engine.applyBatch(0, shifted(800, 41, 0))
    val sid1 = engine.table.currentSnapshotId
    engine.applyBatch(1, shifted(400, 42, 800))
    val sid2 = engine.table.currentSnapshotId

    // named-argument invocation, explicit snapshot
    val tagged = spark.sql(s"CALL ice.system.create_tag('pt', 'keep', snapshot_id => $sid1)")
    assert(tagged.collect() === Array(Row("keep", sid1)))
    assert(engine.table.tags === Map("keep" -> sid1))

    // rollback is an append-only RESTORE commit (time travel over the
    // rollback itself keeps working), so current advances past sid2
    val rb = spark.sql(s"CALL ice.system.rollback_to_snapshot('pt', $sid1)").collect().head
    assert(rb.getLong(0) === sid2)
    assert(rb.getLong(1) === engine.table.currentSnapshotId)
    assert(rb.getLong(1) > sid2)
    assert(rowsOf(spark.sql("SELECT * FROM ice.pt")) === rowsOf(engine.stateAt(sid1)))

    assert(spark.sql("CALL ice.system.drop_tag('pt', 'keep')").collect() === Array(Row(true)))
    assert(engine.table.tags.isEmpty)
  }

  test("expire_snapshots: retain_last keeps N, exactly one selector required") {
    val engine = freshEngine("pe")
    (0 to 3).foreach(e => engine.applyBatch(e, shifted(300, 50 + e, 300L * e)))
    val chainBefore = engine.table.snapshotChain.map(_.snapshotId)
    val expired = spark.sql("CALL ice.system.expire_snapshots('pe', retain_last => 2)")
      .collect().map(_.getLong(0)).toSeq
    assert(expired === chainBefore.dropRight(2),
      "expired ids must be exactly the chain minus the retained tail")
    assert(engine.table.snapshotChain.size === 2)
    // state is untouched by expiry
    assert(rowsOf(spark.sql("SELECT * FROM ice.pe")) === rowsOf(engine.currentState()))

    val both = intercept[AnalysisException] {
      spark.sql("CALL ice.system.expire_snapshots('pe', 123, 2)")
    }
    assert(both.getMessage.contains("exactly one"))
    val neither = intercept[AnalysisException] {
      spark.sql("CALL ice.system.expire_snapshots('pe')")
    }
    assert(neither.getMessage.contains("exactly one"))
  }

  test("remove_orphan_files: dry_run lists what vacuum then reclaims") {
    val engine = freshEngine("pv")
    engine.applyBatch(0, shifted(600, 61, 0))
    engine.applyBatch(1, shifted(600, 62, 600))
    // expire the superseded snapshot so its COW-rewritten files orphan
    engine.table.expireSnapshots(1)
    val dry = spark.sql(
      "CALL ice.system.remove_orphan_files('pv', grace_millis => 0, dry_run => true)")
    val dryRows = dry.collect()
    assert(dryRows.nonEmpty, "expired COW rewrite must leave reclaimable files")
    assert(dryRows.forall(_.getString(1).nonEmpty), "dry-run rows carry a reason")
    val deleted = spark.sql("CALL ice.system.remove_orphan_files('pv', 0, false)").collect()
    assert(deleted.map(_.getString(0)).sorted === dryRows.map(_.getString(0)).sorted,
      "vacuum must reclaim exactly the dry-run set")
    assert(deleted.forall(_.getString(1) == "deleted"))
    // reads still green after the vacuum
    assert(rowsOf(spark.sql("SELECT * FROM ice.pv")) === rowsOf(engine.currentState()))
  }

  test("rewrite_data_files compacts salted multi-file buckets to one file each") {
    val engine = freshEngine("pc", conf = EngineConf(buckets = 8, writeSaltPerBucket = 2))
    engine.applyBatch(0, shifted(900, 71, 0))
    val before = engine.table.currentFiles().size
    assert(before > 8, "salted writes must have left >1 file per bucket")
    val r = spark.sql("CALL ice.system.rewrite_data_files('pc')").collect().head
    assert(r.getInt(1) === before)
    assert(r.getInt(2) === engine.table.currentFiles().size)
    assert(r.getInt(2) < before)
    assert(r.getLong(0) === engine.table.currentSnapshotId)
    assert(rowsOf(spark.sql("SELECT * FROM ice.pc")) === rowsOf(engine.currentState()))
  }

  test("branch lane lifecycle: create_branch / fast_forward / drop_branch") {
    val engine = freshEngine("pb")
    engine.applyBatch(0, shifted(500, 81, 0))
    val fork = engine.table.currentSnapshotId
    val created = spark.sql("CALL ice.system.create_branch('pb', 'lane')").collect().head
    assert(created === Row("lane", fork))
    engine.applyBatchToBranch(1, shifted(300, 82, 9000), "lane")
    val laneHead = engine.table.branchHead("lane")
    // main still at the fork; publish moves it atomically
    assert(engine.table.currentSnapshotId === fork)
    val ff = spark.sql("CALL ice.system.fast_forward('pb', 'lane')").collect().head
    assert(ff.getLong(0) === fork)
    assert(ff.getLong(1) === laneHead)
    assert(rowsOf(spark.sql("SELECT * FROM ice.pb")) === rowsOf(engine.currentState()))
    // publishing CONSUMES the lane ref
    assert(engine.table.branches.isEmpty)
    // an unpublished branch drops through SQL
    spark.sql("CALL ice.system.create_branch('pb', 'scratch')")
    assert(spark.sql("CALL ice.system.drop_branch('pb', 'scratch')").collect() === Array(Row(true)))
    assert(engine.table.branches.isEmpty)
  }

  test("cherrypick_snapshot publishes a staged (WAP) snapshot") {
    val engine = freshEngine("pw")
    engine.applyBatch(0, shifted(500, 91, 0))
    val main = engine.table.currentSnapshotId
    val staged = engine.stageBatch(1, shifted(300, 92, 5000)).snapshotId
    assert(engine.table.currentSnapshotId === main, "staging must not move main")
    val r = spark.sql(s"CALL ice.system.cherrypick_snapshot('pw', $staged)").collect().head
    assert(r === Row(staged, engine.table.currentSnapshotId))
    assert(engine.table.currentSnapshotId !== main)
    assert(rowsOf(spark.sql("SELECT * FROM ice.pw")) === rowsOf(engine.currentState()))
  }

  test("rebucket evolves the layout and re-registers the SQL name") {
    val engine = freshEngine("pr")
    engine.applyBatch(0, shifted(700, 95, 0))
    val stateBefore = rowsOf(engine.currentState())
    val r = spark.sql("CALL ice.system.rebucket('pr', 16)").collect().head
    assert(r.getInt(1) === 16)
    assert(engine.table.currentBuckets === 16)
    assert(rowsOf(spark.sql("SELECT * FROM ice.pr")) === stateBefore)
    // the re-registered engine keeps ingesting under the new layout
    val again = IceliteSql.lookup(spark, "pr").get
    again.applyBatch(1, shifted(200, 96, 700))
    assert(rowsOf(spark.sql("SELECT * FROM ice.pr")) === rowsOf(again.currentState()))
  }

  test("table lifecycle is SQL-complete: create_table with a declared schema, DML, drop, re-register") {
    graft.sql.IceliteSql.ensureCatalog(spark) // no register() has to precede DDL
    val dir = SparkTestBase.tmpDir("proc-ddl")
    spark.sql(s"CALL ice.system.create_table('pddl', '$dir/t', " +
      "buckets => 8, stats_cols => 'lang', " +
      "columns => 'commit STRING, lang STRING, content STRING')").collect()
    // the genesis commit pinned the schema: DML works before any batch
    spark.sql("INSERT INTO ice.pddl (repo, path, lang, content) " +
      "VALUES ('r1', 'a', 'py', 'v1'), ('r2', 'b', 'go', 'v2')")
    assert(spark.sql("SELECT repo, path, lang FROM ice.pddl ORDER BY repo")
      .collect().map(_.toString).toSeq ===
      Seq("[r1,a,py]", "[r2,b,go]"))
    // metadata aggregate works over the SQL-created table too
    assert(spark.sql("SELECT count(*) AS n FROM ice.pddl").head().getLong(0) === 2L)

    // drop WITHOUT purge: unregistered, files intact, re-attachable
    spark.sql("CALL ice.system.drop_table('pddl')").collect()
    assert(intercept[AnalysisException] {
      spark.sql("SELECT * FROM ice.pddl").collect()
    }.getMessage.nonEmpty)
    spark.sql(s"CALL ice.system.register_table('pddl2', '$dir/t')").collect()
    assert(spark.sql("SELECT count(*) AS n FROM ice.pddl2").head().getLong(0) === 2L)

    // duplicate registrations fail loudly
    assert(intercept[AnalysisException] {
      spark.sql(s"CALL ice.system.register_table('pddl2', '$dir/t')").collect()
    }.getMessage.contains("already registered"))

    // drop WITH purge deletes the directory
    spark.sql("CALL ice.system.drop_table('pddl2', purge => true)").collect()
    assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$dir/t")))
  }

  test("create_table without a declared schema: first batch defines it") {
    graft.sql.IceliteSql.ensureCatalog(spark)
    val dir = SparkTestBase.tmpDir("proc-ddl2")
    spark.sql(s"CALL ice.system.create_table('pddl3', '$dir/t', buckets => 8)").collect()
    val engine = graft.sql.IceliteSql.lookup(spark, "pddl3").get
    engine.applyBatch(0, shifted(50, 99, 0))
    assert(spark.sql("SELECT count(*) AS n FROM ice.pddl3").head().getLong(0) > 0L)
    spark.sql("CALL ice.system.drop_table('pddl3', purge => true)").collect()
  }

  test("unknown procedure, unknown table, and wrong namespace fail loudly") {
    freshEngine("px").applyBatch(0, shifted(100, 97, 0))
    val unknownProc = intercept[AnalysisException] {
      spark.sql("CALL ice.system.frobnicate('px')")
    }
    assert(unknownProc.getMessage.contains("unknown procedure"))
    val unknownTable = intercept[AnalysisException] {
      spark.sql("CALL ice.system.rewrite_data_files('nope')")
    }
    assert(unknownTable.getMessage.contains("not a registered"))
    val badNs = intercept[AnalysisException] {
      spark.sql("CALL ice.admin.rewrite_data_files('px')")
    }
    assert(badNs.getMessage.contains("system"))
  }

  test("SHOW PROCEDURES and DESCRIBE PROCEDURE surface the catalog") {
    freshEngine("ps")
    val listed = spark.sql("SHOW PROCEDURES IN ice.system")
      .select("procedure_name").collect().map(_.getString(0)).toSet
    assert(listed.contains("expire_snapshots") && listed.contains("rebucket")
      && listed.contains("remove_orphan_files"))
    val desc = spark.sql("DESCRIBE PROCEDURE ice.system.expire_snapshots")
      .collect().map(_.toString).mkString("\n")
    assert(desc.contains("expire_snapshots"))
  }
}
