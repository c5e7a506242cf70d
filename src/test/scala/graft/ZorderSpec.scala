package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.engine.{CdcEngine, EngineConf}
import graft.icelite.IceliteTable

/** Z-order clustering (`compact(zorderBy = ...)`, `EngineConf.zorderCols`,
  * `CALL ice.system.rewrite_data_files(zorder_by => ...)`): the multi-
  * dimensional file-skip claim — after a Z-curve rewrite, a predicate on
  * ANY named column prunes files — plus the baseline it beats (a
  * lexicographic sortBy leaves the trailing column unprunable), visible-
  * state invariance, string-column grids, and declared-order maintenance
  * on merge-on-read. */
class ZorderSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  /** Unique-key events with two INDEPENDENT uniform int payload dims
    * (x, y in [0, 128)) — independence is what makes the lexicographic
    * baseline fail on y and Z-order succeed on both. */
  private def ev2d(n: Int, seed: Int): DataFrame =
    spark.range(n).selectExpr(
      s"concat('r', pmod(xxhash64('k$seed', id), 64)) AS repo",
      "concat('p', CAST(id AS STRING)) AS path",
      "id AS commit_lsn",
      "0 AS seq",
      "'U' AS op",
      "timestamp_seconds(1700000000 + id) AS ts",
      s"CAST(pmod(xxhash64('x$seed', id), 128) AS INT) AS x",
      s"CAST(pmod(xxhash64('y$seed', id), 128) AS INT) AS y")

  private def engine(statsCols: Seq[String], mor: Boolean = false,
      conf: EngineConf => EngineConf = identity): CdcEngine = {
    val dir = SparkTestBase.tmpDir("zorder")
    val t = IceliteTable.create(s"$dir/t", Seq("repo", "path"), 8,
      mergeOnRead = mor)
    new CdcEngine(spark, t,
      conf(EngineConf(buckets = 8, statsCols = statsCols)))
  }

  private def sortedRows(df: DataFrame): Seq[String] =
    df.collect().map(_.mkString("|")).sorted.toSeq

  test("Z-order prunes on BOTH dimensions where lexicographic sort prunes one") {
    val ev = ev2d(8192, seed = 1)
    val ze = engine(Seq("x", "y"))
    ze.applyBatch(0, ev)
    val before = sortedRows(ze.currentState())
    // 64-row splits -> ~16 files/bucket -> 4 interleaved bits: both dims
    // resolve to quarters, so a ~9% range predicate must skip >half the
    // files on EITHER dim (8 files/bucket would leave y at half-resolution)
    ze.compact(zorderBy = Seq("x", "y"), maxFileRows = 64)
    // visible state is bit-unchanged by the rewrite
    assert(sortedRows(ze.currentState()) === before)

    val se = engine(Seq("x", "y"))
    se.applyBatch(0, ev)
    se.compact(sortBy = Seq("x"), maxFileRows = 64)

    // ~9% selective range on each dim
    val (lo, hi) = (40, 51)
    val zx = ze.scanRangePlan("x", Some(lo), Some(hi))
    val zy = ze.scanRangePlan("y", Some(lo), Some(hi))
    val sx = se.scanRangePlan("x", Some(lo), Some(hi))
    val sy = se.scanRangePlan("y", Some(lo), Some(hi))
    assert(zx.filesSkipped > zx.filesTotal / 2, s"z-order x: $zx")
    assert(zy.filesSkipped > zy.filesTotal / 2, s"z-order y: $zy")
    assert(sx.filesSkipped > sx.filesTotal / 2, s"sortBy x: $sx")
    // the lexicographic baseline: y bounds are full-width in every file
    assert(sy.filesSkipped === 0, s"sortBy(x) should not prune y: $sy")
    assert(zy.filesSkipped > sy.filesSkipped)

    // pruned results equal the unpruned filter on both engines/dims
    for (e <- Seq(ze, se); c <- Seq("x", "y")) {
      assert(sortedRows(e.scanRange(c, Some(lo), Some(hi))) ===
        sortedRows(e.currentState()
          .filter(col(c) >= lo && col(c) <= hi)), s"$c rows")
    }
  }

  test("conjunction on both z dims opens no more files than either alone") {
    val ev = ev2d(8192, seed = 2)
    val e = engine(Seq("x", "y"))
    e.applyBatch(0, ev)
    e.compact(zorderBy = Seq("x", "y"), maxFileRows = 128)
    val (lo, hi) = (30, 49)
    val px = e.scanRangePlan("x", Some(lo), Some(hi))
    val py = e.scanRangePlan("y", Some(lo), Some(hi))
    val pxy = e.scanWherePlan(
      Seq(("x", Some(lo), Some(hi)), ("y", Some(lo), Some(hi))))
    val openedX = px.filesTotal - px.filesSkipped
    val openedY = py.filesTotal - py.filesSkipped
    val openedXY = pxy.filesTotal - pxy.filesSkipped
    assert(openedXY <= math.min(openedX, openedY),
      s"x: $px, y: $py, x AND y: $pxy")
    assert(sortedRows(e.scanWhere(
      Seq(("x", Some(lo), Some(hi)), ("y", Some(lo), Some(hi))))) ===
      sortedRows(e.currentState()
        .filter(col("x").between(lo, hi) && col("y").between(lo, hi))))
  }

  test("string grid dimension: prefix-coded z-order prunes a string predicate") {
    val ev = ev2d(6000, seed = 3).withColumn("s",
      concat(lit("v"), pmod(xxhash64(lit("s"), col("commit_lsn")), lit(40))))
    val e = engine(Seq("s", "x"))
    e.applyBatch(0, ev)
    e.compact(zorderBy = Seq("s", "x"), maxFileRows = 128)
    val ps = e.scanRangePlan("s", Some("v30"), Some("v30"))
    val px = e.scanRangePlan("x", Some(10), Some(21))
    assert(ps.filesSkipped > 0, s"string dim must prune: $ps")
    assert(px.filesSkipped > 0, s"numeric dim must prune: $px")
    assert(sortedRows(e.scanRange("s", Some("v30"), Some("v30"))) ===
      sortedRows(e.currentState().filter(col("s") === "v30")))
  }

  test("declared zorderCols: MOR threshold auto-compaction z-clusters with zero explicit compactions") {
    val ev = ev2d(6000, seed = 4)
    val e = engine(Seq("x", "y"), mor = true,
      conf = _.copy(zorderCols = Seq("x", "y"), writeMaxFileRows = 128,
        morCompactThreshold = 3))
    (0 until 4).foreach(i =>
      e.applyBatch(i, ev.filter(col("commit_lsn") % 4 === i)))
    val px = e.scanRangePlan("x", Some(40), Some(51))
    val py = e.scanRangePlan("y", Some(40), Some(51))
    assert(px.filesSkipped > 0, s"auto-compacted x must prune: $px")
    assert(py.filesSkipped > 0, s"auto-compacted y must prune: $py")
    for (c <- Seq("x", "y"))
      assert(sortedRows(e.scanRange(c, Some(40), Some(51))) ===
        sortedRows(e.currentState()
          .filter(col(c) >= 40 && col(c) <= 51)), s"$c rows")
  }

  test("CALL ice.system.rewrite_data_files(zorder_by => ...) is the same rewrite") {
    val ev = ev2d(4096, seed = 5)
    val e = engine(Seq("x", "y"))
    e.applyBatch(0, ev)
    graft.sql.IceliteSql.register(spark, "zproc", e)
    val r = spark.sql("CALL ice.system.rewrite_data_files('zproc', " +
      "max_file_rows => 128, zorder_by => 'x,y')").collect()(0)
    assert(r.getInt(2) > r.getInt(1), "split rewrite must multiply files")
    assert(e.scanRangePlan("x", Some(40), Some(51)).filesSkipped > 0)
    assert(e.scanRangePlan("y", Some(40), Some(51)).filesSkipped > 0)
  }

  test("sortBy and zorderBy together are rejected; unknown z columns are rejected") {
    val e = engine(Seq("x", "y"))
    e.applyBatch(0, ev2d(256, seed = 6))
    assertThrows[IllegalArgumentException](
      e.compact(sortBy = Seq("x"), zorderBy = Seq("x", "y")))
    assertThrows[IllegalArgumentException](
      e.compact(zorderBy = Seq("x", "nope")))
  }
}
