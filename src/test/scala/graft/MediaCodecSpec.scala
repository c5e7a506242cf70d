package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries.{MediaCodec, Multimodal}
import graft.queries.MediaCodec.{Image, decodeBmp, encodeBmp, decodeWav, encodeWavPcm16}

/** The real (pure-JVM, uncompressed-container) media decoders: byte-level
  * round trips with varied pixels/samples so padding, row order, endianness
  * and chunk walking are all load-bearing; malformed-input rejection; and
  * the q69/q70 pipelines against hand-computed features. */
class MediaCodecSpec extends AnyFunSuite {
  lazy val spark = SparkTestBase.spark
  val sf = "/root/testdata/sf0.001"

  // ---- BMP ----

  test("BMP round trip is pixel-exact across padding widths") {
    // widths 3,4,5,6 exercise every 24bpp row-padding residue (1..3 + none)
    for (w <- 3 to 6; h <- Seq(2, 5)) {
      val pix = (x: Int, y: Int) => (x * 31 + y * 97 + w) % 256
      val img = decodeBmp(encodeBmp(w, h, pix))
      assert(img.width == w && img.height == h)
      for (y <- 0 until h; x <- 0 until w)
        assert(img.gray(y * w + x) == pix(x, y), s"pixel ($x,$y) at ${w}x$h")
    }
  }

  test("BMP decoder honors top-down row order (negative height)") {
    val w = 4; val h = 3
    val pix = (x: Int, y: Int) => x + 10 * y
    val b = encodeBmp(w, h, pix)
    // flip the height sign; stored rows are unchanged, so the decoder must
    // now read them top-down — yielding the vertical mirror of `pix`
    val neg = -h
    b(22) = (neg & 0xff).toByte; b(23) = ((neg >> 8) & 0xff).toByte
    b(24) = ((neg >> 16) & 0xff).toByte; b(25) = ((neg >> 24) & 0xff).toByte
    val img = decodeBmp(b)
    for (y <- 0 until h; x <- 0 until w)
      assert(img.gray(y * w + x) == pix(x, h - 1 - y), s"flipped pixel ($x,$y)")
  }

  test("BMP decoder rejects malformed input") {
    val good = encodeBmp(4, 4, (_, _) => 7)
    intercept[IllegalArgumentException](decodeBmp("not a bitmap".getBytes))
    val badMagic = good.clone(); badMagic(0) = 'X'
    intercept[IllegalArgumentException](decodeBmp(badMagic))
    val badBpp = good.clone(); badBpp(28) = 32
    intercept[IllegalArgumentException](decodeBmp(badBpp))
    intercept[IllegalArgumentException](decodeBmp(good.take(60))) // truncated pixels
  }

  test("adversarial headers fail as IllegalArgumentException, never as overflow escapes") {
    // every size a hostile header can inflate must die in a require (the
    // DLQ-routing contract), not escape as AIOOBE/NegativeArraySize/OOM
    // from Int overflow in the bounds math
    def le32(b: Array[Byte], off: Int, v: Int): Unit = {
      b(off) = (v & 0xff).toByte; b(off + 1) = ((v >> 8) & 0xff).toByte
      b(off + 2) = ((v >> 16) & 0xff).toByte; b(off + 3) = ((v >> 24) & 0xff).toByte
    }
    val bmp = encodeBmp(4, 4, (_, _) => 7)
    // 2^20 x 2^20 passes the per-dimension cap but its pixel size (3.3e12)
    // overflows Int — the Long-math truncation check must reject it
    val huge = bmp.clone(); le32(huge, 18, 1 << 20); le32(huge, 22, 1 << 20)
    intercept[IllegalArgumentException](decodeBmp(huge))
    val negOff = bmp.clone(); le32(negOff, 10, -8)
    intercept[IllegalArgumentException](decodeBmp(negOff))
    val farOff = bmp.clone(); le32(farOff, 10, bmp.length + 100)
    intercept[IllegalArgumentException](decodeBmp(farOff))

    val wav = encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    // LIST chunk length near Int.MaxValue would wrap off+8+len negative
    val wrapLen = wav.clone(); le32(wrapLen, 40, Int.MaxValue - 2)
    intercept[IllegalArgumentException](decodeWav(wrapLen))
    val zeroCh = wav.clone(); zeroCh(22) = 0; zeroCh(23) = 0
    intercept[IllegalArgumentException](decodeWav(zeroCh))

    // GRV1 with 65536x65536: w*h overflows Int to exactly 0, which the old
    // bounds check accepted (silently returning empty frames)
    val grv = new Array[Byte](32)
    grv(0) = 'G'; grv(1) = 'R'; grv(2) = 'V'; grv(3) = '1'
    le32(grv, 4, 65536); le32(grv, 8, 65536); le32(grv, 12, 1)
    intercept[IllegalArgumentException](MediaCodec.sampleFrames(grv, 1))

    // zero-length data chunk is VALID WAV; rms must be 0.0, not NaN
    assert(MediaCodec.rms(decodeWav(encodeWavPcm16(8000, 1, Array.empty[Short]))) == 0.0)
  }

  test("nearest-neighbor resize uses the standard sample grid") {
    // 4x4 ramp downsampled to 2x2 picks pixels (0,0),(2,0),(0,2),(2,2)
    val src = Image(4, 4, Array.tabulate(16)(identity))
    val out = MediaCodec.resizeNearest(src, 2, 2)
    assert(out.gray.toSeq == Seq(0, 2, 8, 10))
    // upscale: every source pixel appears in a 2x2 block
    val up = MediaCodec.resizeNearest(Image(2, 2, Array(1, 2, 3, 4)), 4, 4)
    assert(up.gray.toSeq == Seq(1, 1, 2, 2, 1, 1, 2, 2, 3, 3, 4, 4, 3, 3, 4, 4))
  }

  // ---- WAV ----

  test("WAV PCM-16 round trip is sample-exact (incl. negatives) and skips unknown chunks") {
    val samples = Array[Short](0, 1, -1, 32767, -32768, 12345, -12345)
    val a = decodeWav(encodeWavPcm16(44100, 1, samples))
    assert(a.sampleRate == 44100 && a.channels == 1)
    assert(a.samples.toSeq == samples.toSeq) // encoder interposes a LIST chunk
  }

  test("WAV decoder rejects malformed input") {
    intercept[IllegalArgumentException](decodeWav(Array.fill[Byte](10)(0)))
    val good = encodeWavPcm16(8000, 1, Array[Short](1, 2, 3))
    val nonPcm = good.clone(); nonPcm(20) = 3 // IEEE-float format tag
    intercept[IllegalArgumentException](decodeWav(nonPcm))
    val badMagic = good.clone(); badMagic(9) = 'X'
    intercept[IllegalArgumentException](decodeWav(badMagic))
  }

  test("RMS of a known signal") {
    // samples (3,4) -> mean square 12.5 -> rms 3.536 at 3dp
    val a = decodeWav(encodeWavPcm16(8000, 1, Array[Short](3, 4)))
    assert(MediaCodec.rms(a) == 3.536)
  }

  // ---- raw-video frame sampling ----

  test("frame sampling decodes only the strided frames") {
    val w = 3; val h = 2
    val frames = (0 until 6).map(f => Array.tabulate(w * h)(i => (f * 40 + i) % 256))
    val bytes = MediaCodec.encodeRawVideo(w, h, frames)
    val sampled = MediaCodec.sampleFrames(bytes, 2)
    assert(sampled.map(_._1) == Seq(0, 2, 4))
    for (((idx, img), k) <- sampled.zipWithIndex) {
      assert(idx == k * 2 && img.width == w && img.height == h)
      assert(img.gray.toSeq == frames(idx).toSeq)
    }
    intercept[IllegalArgumentException](MediaCodec.sampleFrames(bytes.take(10), 1))
  }

  // ---- randomized round trips (seeded, so failures replay) ----

  test("property: BMP encode->decode is identity for random dims and pixels") {
    val rnd = new scala.util.Random(4711)
    for (_ <- 0 until 50) {
      val w = 1 + rnd.nextInt(40); val h = 1 + rnd.nextInt(40)
      val px = Array.fill(w * h)(rnd.nextInt(256))
      val img = decodeBmp(encodeBmp(w, h, (x, y) => px(y * w + x)))
      assert(img.width == w && img.height == h && img.gray.toSeq == px.toSeq,
        s"mismatch at ${w}x$h")
    }
  }

  test("property: WAV encode->decode is identity for random rates/channels/samples") {
    val rnd = new scala.util.Random(1337)
    for (_ <- 0 until 50) {
      val rate = 1 + rnd.nextInt(96000)
      val ch = 1 + rnd.nextInt(4)
      val samples = Array.fill(ch * (1 + rnd.nextInt(500)))(rnd.nextInt().toShort)
      val a = decodeWav(encodeWavPcm16(rate, ch, samples))
      assert(a.sampleRate == rate && a.channels == ch &&
        a.samples.toSeq == samples.toSeq)
    }
  }

  // ---- Spark pipelines (q69/q70) ----

  test("q69 image pipeline: decoded features match the closed form") {
    val rows = Multimodal.queries("q69_media_image")(spark, sf)
      .collect().map(r => r.getLong(0) -> r).toMap
    assert(rows.nonEmpty)
    val meta = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "n_chars").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    for ((id, r) <- rows) {
      val (w, h) = (8 + id % 56, 8 + (id * 7) % 40)
      assert(r.getLong(r.fieldIndex("width")) == w)
      assert(r.getLong(r.fieldIndex("height")) == h)
      assert(r.getLong(r.fieldIndex("n_bytes")) ==
        MediaCodec.bmpSize(w.toInt, h.toInt).toLong)
      assert(r.getLong(r.fieldIndex("mean_gray")) == meta(id) % 256)
      assert(r.getLong(r.fieldIndex("thumb_mean")) == meta(id) % 256)
    }
  }

  test("q70 audio pipeline: decoded features match the closed form") {
    val rows = Multimodal.queries("q70_media_audio")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val id = r.getLong(r.fieldIndex("doc_id"))
      val rate = 8000 + (id % 8) * 1000
      val frames = r.getLong(r.fieldIndex("n_frames"))
      assert(r.getLong(r.fieldIndex("sample_rate")) == rate)
      assert(r.getLong(r.fieldIndex("channels")) == 1 + id % 2)
      assert(r.getLong(r.fieldIndex("duration_us")) == frames * 1000000L / rate)
      assert(r.getDouble(r.fieldIndex("rms_amp")) ==
        math.abs((id * 37) % 2000 - 1000).toDouble)
    }
  }
}
