package graft.queries

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media (image/audio/video) travels as an
  * opaque `binary` column with typed metadata alongside. The decode /
  * feature-extract step is the Scala analog of a pandas-batch UDF: a typed
  * `mapPartitions` that processes rows in batches so a real decoder could
  * amortize model/codec setup per partition (exactly how mapInPandas batches
  * arrow record-batches).
  *
  * THE DECODER IS A STUB: no image/audio libraries exist in this sandbox.
  * `decodeStub` is a deterministic fake that derives "features" from the
  * bytes; swap `decodeStub` for a real codec (e.g. TwelveMonkeys/JavaCV) in
  * production — the Spark-side plumbing (schema, batching, partitioning)
  * does not change.
  */
object Multimodal {

  case class MediaRow(doc_id: Long, media: Array[Byte], media_type: String)
  case class MediaFeatures(
      doc_id: Long,
      media_type: String,
      n_bytes: Int,
      // stand-ins for decoded width/height/duration — deterministic fakes
      feat_a: Int,
      feat_b: Int,
      checksum: Long)

  /** Deterministic fake decode: a real implementation would parse the codec
    * header and run feature extraction; the fake derives stable values from
    * the payload so tests can assert exact results. */
  def decodeStub(bytes: Array[Byte]): (Int, Int, Long) = {
    var h = 1125899906842597L // FNV-ish rolling checksum
    var i = 0
    while (i < bytes.length) { h = h * 31 + (bytes(i) & 0xff); i += 1 }
    val a = math.abs((h % 1920).toInt)
    val b = math.abs(((h >> 16) % 1080).toInt)
    (a, b, h)
  }

  /** documents -> opaque media blobs (text bytes stand in for media bytes). */
  def asMedia(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("text").cast("binary").as("media"),
        concat(lit("image/fake-"), col("source")).as("media_type"))
      .as[MediaRow]
  }

  /** Batched per-partition feature extraction — the mapInPandas analog.
    * Keeps the iterator lazy (no partition-wide materialization) so a
    * 100 TB scan streams batch-by-batch through the decoder. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { it =>
      // per-partition setup would open the codec/model ONCE here
      it.map { r =>
        val (a, b, h) = decodeStub(r.media)
        MediaFeatures(r.doc_id, r.media_type, r.media.length, a, b, h)
      }
    }
  }

  /** Whole pipeline as a DataFrame op for ad-hoc use. */
  def features(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(asMedia(spark, dir)).toDF()
}
