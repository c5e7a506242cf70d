package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.functions.VecOps

class FunctionsSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  import spark.implicits._

  test("vec_dot equals the interpreted HOF fold bit-for-bit (float arrays)") {
    VecOps.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select($"vec_id", $"embedding".as("v"))
    val both = df.select(
      VecOps.dot($"v", $"v").as("native"),
      aggregate(zip_with(transform($"v", _.cast("double")), transform($"v", _.cast("double")),
        (x, y) => x * y), lit(0.0), (acc, x) => acc + x).as("hof"))
    assert(both.filter($"native" =!= $"hof").count() === 0)
  }

  test("vec_dot is callable from SQL and mixes float/double arrays") {
    VecOps.register(spark)
    val r = spark.sql(
      "SELECT vec_dot(array(cast(1.0 as float), cast(2.0 as float)), array(3.0d, 4.0d)) v")
      .head().getDouble(0)
    assert(r === 11.0)
  }

  test("vec_dot rejects non-array arguments at analysis") {
    VecOps.register(spark)
    assertThrows[Exception](spark.sql("SELECT vec_dot(1, 2)").collect())
  }

  test("two vec_dots in one codegen context compile (no interpreter fallback)") {
    // Regression: the generated loop variable was a literal `i`, so two
    // vec_dots fused into one Janino class failed compilation ("Redefinition
    // of local variable i") and SILENTLY fell back to interpreted eval —
    // exactly the norm+pair-dot shape of q26-q28. CODEGEN_ONLY turns the
    // silent fallback into a hard failure so this test proves compilation.
    VecOps.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        .select($"vec_id", $"embedding".as("v"))
      val e = df.select(
        VecOps.dot($"v", $"v").as("nrm2"),
        (VecOps.dot($"v", $"v") / VecOps.dot($"v", $"v")).as("unit"))
      val rows = e.collect()
      assert(rows.nonEmpty && rows.forall(r => math.abs(r.getDouble(1) - 1.0) < 1e-12))
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("vec_dot yields NULL on length mismatch and on null elements") {
    VecOps.register(spark)
    val r = spark.sql(
      """SELECT vec_dot(array(1.0d, 2.0d), array(3.0d)) mismatched,
          vec_dot(array(1.0d, cast(null as double)), array(3.0d, 4.0d)) nullelem,
          vec_dot(cast(null as array<double>), array(1.0d)) nullarg""").head()
    assert(r.isNullAt(0) && r.isNullAt(1) && r.isNullAt(2))
  }

  /** Reference Morton interleave for the tests — independent loop shape
    * from the expression's (MSB-first fold vs the expression's shift-or). */
  private def morton(vals: Int*): Long =
    (15 to 0 by -1).foldLeft(0L)((acc, b) =>
      vals.foldLeft(acc)((a, v) => (a << 1) | ((v >>> b) & 1)))

  test("interleave_bits matches the reference Morton fold (2, 3 and 4 args)") {
    VecOps.register(spark)
    assert(spark.sql("SELECT interleave_bits(65535, 0)").head().getLong(0)
      === 0xAAAAAAAAL)
    assert(spark.sql("SELECT interleave_bits(0, 65535)").head().getLong(0)
      === 0x55555555L)
    val cases = Seq(Seq(40000, 123), Seq(7, 65535, 0), Seq(1, 2, 3, 4))
    for (c <- cases) {
      val got = spark.sql(s"SELECT interleave_bits(${c.mkString(",")})")
        .head().getLong(0)
      assert(got === morton(c: _*), s"args $c")
    }
  }

  test("interleave_bits: null in, null out; arity and type checked at analysis") {
    VecOps.register(spark)
    assert(spark.sql("SELECT interleave_bits(1, cast(null as int))")
      .head().isNullAt(0))
    assertThrows[Exception](spark.sql("SELECT interleave_bits(1)").collect())
    assertThrows[Exception](
      spark.sql("SELECT interleave_bits(1,2,3,4,5)").collect())
    assertThrows[Exception](
      spark.sql("SELECT interleave_bits(1.5, 2.5)").collect())
  }

  test("interleave_bits codegen equals interpreted eval over a distributed column") {
    // CODEGEN_ONLY turns any silent interpreter fallback into a hard fail;
    // two fused interleaves exercise the freshName discipline (the VecDot
    // Janino-redefinition regression class).
    VecOps.register(spark)
    val prev = spark.conf.getOption("spark.sql.codegen.factoryMode")
    spark.conf.set("spark.sql.codegen.factoryMode", "CODEGEN_ONLY")
    try {
      val rows = spark.range(4096).selectExpr(
        "CAST(pmod(xxhash64('a', id), 65536) AS INT) AS a",
        "CAST(pmod(xxhash64('b', id), 65536) AS INT) AS b")
        .selectExpr("a", "b", "interleave_bits(a, b) AS z",
          "interleave_bits(b, a) AS zr")
        .collect()
      assert(rows.nonEmpty && rows.forall { r =>
        r.getLong(2) === morton(r.getInt(0), r.getInt(1)) &&
        r.getLong(3) === morton(r.getInt(1), r.getInt(0))
      })
    } finally {
      prev match {
        case Some(v) => spark.conf.set("spark.sql.codegen.factoryMode", v)
        case None => spark.conf.unset("spark.sql.codegen.factoryMode")
      }
    }
  }

  test("vec_dot participates in whole-stage codegen (no HOF lambda nodes)") {
    VecOps.register(spark)
    val df = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .select(VecOps.dot($"embedding", $"embedding").as("d"))
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("vec_dot") && (p.contains("*(") || p.contains("WholeStageCodegen")),
      s"expected codegen'd vec_dot in:\n$p")
  }
}
