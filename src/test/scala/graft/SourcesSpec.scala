package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** S3 of SURVEY §2.1: multiline JSON with nested structs/arrays (the
  * reference's station_data.json shape: result[] -> evaNumbers[] ->
  * isMain + coordinates), read + explode + higher-order filter. */
class SourcesSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark

  test("multiline nested JSON: read, explode, higher-order filter, nested field access") {
    val dir = SparkTestBase.tmpDir("json")
    val json =
      """{
        |  "result": [
        |    {"name": "Alpha", "evaNumbers": [
        |       {"number": 8011160, "isMain": true,  "geographicCoordinates": {"coordinates": [13.369, 52.525]}},
        |       {"number": 8098160, "isMain": false, "geographicCoordinates": {"coordinates": [13.368, 52.524]}}]},
        |    {"name": "Beta", "evaNumbers": [
        |       {"number": 8010255, "isMain": true,  "geographicCoordinates": {"coordinates": [13.42, 52.53]}}]}
        |  ]
        |}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/stations.json"), json)

    val df = spark.read.option("multiLine", true).json(s"$dir/stations.json")
      .select(explode(col("result")).as("st"))
      .select(col("st.name").as("name"),
        // higher-order filter: the main EVA number (reference F12)
        element_at(filter(col("st.evaNumbers"), e => e.getField("isMain")), 1).as("main"))
      .select(col("name"), col("main.number").as("eva"),
        element_at(col("main.geographicCoordinates.coordinates"), 1).as("lon"),
        element_at(col("main.geographicCoordinates.coordinates"), 2).as("lat"))
    val rows = df.orderBy("name").collect()
    assert(rows.length === 2)
    assert(rows(0).getString(0) === "Alpha" && rows(0).getLong(1) === 8011160L)
    assert(rows(0).getDouble(2) === 13.369 && rows(0).getDouble(3) === 52.525)
    assert(rows(1).getLong(1) === 8010255L)
  }
}
