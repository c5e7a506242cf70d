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

  // ------------------------------------------------------ REAL decode path
  //
  // The stub above stands in for COMPRESSED codecs (JPEG/MP3 need external
  // libraries this sandbox lacks). Uncompressed containers need none: the
  // q69/q70 pipelines below synthesize genuine BMP / RIFF-WAVE files
  // deterministically from `documents` rows, carry them as an opaque
  // `binary` column, and run a REAL parser (magic validation, little-endian
  // header walk, BMP row padding + bottom-up order, WAV chunk skipping) in
  // the batched per-partition decode stage — see MediaCodec.scala. Because
  // every synthesized container is a closed-form function of (doc_id,
  // n_chars), the DuckDB oracle can compute the expected DECODED features
  // directly: a hash match proves the encode→opaque-bytes→decode round trip
  // end-to-end, not just the plumbing.

  /** doc_id + a real media container, media kept opaque downstream. */
  case class MediaBlob(doc_id: Long, media: Array[Byte])

  case class ImageFeatures(doc_id: Long, width: Long, height: Long,
      n_bytes: Long, mean_gray: Long, thumb_mean: Long)

  case class AudioFeatures(doc_id: Long, sample_rate: Long, channels: Long,
      n_frames: Long, duration_us: Long, rms_amp: Double)

  /** Synthesize one BMP per document: dims and the (constant) gray level
    * derive from (doc_id, n_chars) so the oracle knows the ground truth.
    * Stands in for "media bytes arrive alongside the text". */
  def bmpBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val w = (8 + id % 56).toInt
        val h = (8 + (id * 7) % 40).toInt
        val g = (nChars % 256).toInt
        MediaBlob(id, MediaCodec.encodeBmp(w, h, (_, _) => g))
      })
  }

  /** Decode stage: sees ONLY the opaque bytes. Header-parsed dims, the
    * pixel-walk mean, and a 4×4 nearest-neighbor thumbnail mean. */
  def decodeImages(blobs: Dataset[MediaBlob]): Dataset[ImageFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { r =>
      val img = MediaCodec.decodeBmp(r.media)
      val thumb = MediaCodec.resizeNearest(img, 4, 4)
      ImageFeatures(r.doc_id, img.width.toLong, img.height.toLong,
        r.media.length.toLong, MediaCodec.meanGray(img), MediaCodec.meanGray(thumb))
    })
  }

  /** Synthesize one PCM-16 WAV per document: rate/channels/length/amplitude
    * all closed-form in (doc_id, n_chars). Constant amplitude makes the RMS
    * integer-exact (IEEE sqrt of a perfect square), so the oracle's double
    * compares bit-identically. */
  def wavBlobs(spark: SparkSession, dir: String): Dataset[MediaBlob] = {
    import spark.implicits._
    spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"), col("n_chars")).as[(Long, Long)]
      .mapPartitions(_.map { case (id, nChars) =>
        val rate = (8000 + (id % 8) * 1000).toInt
        val ch = (1 + id % 2).toInt
        val n = (200 + nChars % 300).toInt // frames
        val amp = ((id * 37) % 2000 - 1000).toShort
        MediaBlob(id, MediaCodec.encodeWavPcm16(rate, ch, Array.fill(n * ch)(amp)))
      })
  }

  /** Decode stage over opaque WAV bytes: chunk-walked format fields plus
    * duration (integer microseconds — no float rounding to disagree on)
    * and RMS amplitude. */
  def decodeAudio(blobs: Dataset[MediaBlob]): Dataset[AudioFeatures] = {
    import blobs.sparkSession.implicits._
    blobs.mapPartitions(_.map { r =>
      val a = MediaCodec.decodeWav(r.media)
      val frames = a.samples.length / a.channels
      AudioFeatures(r.doc_id, a.sampleRate.toLong, a.channels.toLong,
        frames.toLong, frames.toLong * 1000000L / a.sampleRate, MediaCodec.rms(a))
    })
  }

  /** Oracle-gated query entries (concatenated into SparkEntry). */
  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q69_media_image" -> ((s, dir) => decodeImages(bmpBlobs(s, dir)).toDF()),
    "q70_media_audio" -> ((s, dir) => decodeAudio(wavBlobs(s, dir)).toDF()))

  /** Closed-form expected features: a hash match against the real decoder's
    * output proves the container round trip (incl. BMP's padded-row size
    * arithmetic, which the oracle reproduces symbolically). */
  val oracles: Map[String, String] = Map(
    "q69_media_image" ->
      """SELECT doc_id,
                8 + doc_id % 56 AS width,
                8 + (doc_id * 7) % 40 AS height,
                54 + (8 + (doc_id * 7) % 40) * (((3 * (8 + doc_id % 56)) + 3) // 4 * 4) AS n_bytes,
                n_chars % 256 AS mean_gray,
                n_chars % 256 AS thumb_mean
         FROM documents""",
    "q70_media_audio" ->
      """SELECT doc_id,
                8000 + (doc_id % 8) * 1000 AS sample_rate,
                1 + doc_id % 2 AS channels,
                200 + n_chars % 300 AS n_frames,
                (200 + n_chars % 300) * 1000000 // (8000 + (doc_id % 8) * 1000) AS duration_us,
                CAST(abs((doc_id * 37) % 2000 - 1000) AS DOUBLE) AS rms_amp
         FROM documents""")
}
