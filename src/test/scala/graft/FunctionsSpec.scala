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
