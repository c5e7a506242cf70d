package graft.queries

/** Pure-JVM codecs for genuinely uncompressed media containers — BMP
  * (24-bit, BITMAPINFOHEADER) images, RIFF/WAVE PCM-16 audio, and a raw
  * grayscale frame-sequence "video" container. These are REAL decoders:
  * they validate magic bytes, walk chunk/header structures byte-by-byte
  * (little-endian, row padding, bottom-up pixel order, unknown-chunk
  * skipping), and reject malformed input — no codec library required
  * because the formats carry no compression. Compressed formats (JPEG,
  * MP3, H.264) still need an external codec and remain stubbed in
  * [[Multimodal.decodeStub]]; the pipeline shape (opaque binary column →
  * batched per-partition decode → typed features) is identical either way,
  * so swapping this decoder for a JPEG one changes no Spark plumbing.
  *
  * Reference analog: the reference treats media as opaque payload columns
  * and decodes at the edge (dia-berlin-transit-etl/pipeline keeps all
  * payloads schemaless until a typed extract step); here the typed extract
  * step actually parses the container.
  */
object MediaCodec {

  // ----------------------------------------------------------------- BMP

  /** Decoded image: grayscale-as-bytes is enough for feature work; the
    * decoder records the original channel values' mean per pixel. */
  final case class Image(width: Int, height: Int, gray: Array[Int])

  private def wr32(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
    b(off + 2) = ((v >> 16) & 0xff).toByte
    b(off + 3) = ((v >> 24) & 0xff).toByte
  }
  private def wr16(b: Array[Byte], off: Int, v: Int): Unit = {
    b(off) = (v & 0xff).toByte
    b(off + 1) = ((v >> 8) & 0xff).toByte
  }
  private def rd32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def rd16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Bytes per padded BMP row: 24bpp rows pad to a 4-byte boundary. */
  def bmpRowBytes(width: Int): Int = ((3 * width) + 3) / 4 * 4

  /** Total encoded size for a w×h 24-bit BMP (54-byte headers + pixels). */
  def bmpSize(width: Int, height: Int): Int = 54 + height * bmpRowBytes(width)

  /** Encode a 24-bit bottom-up BMP; `pix(x, y)` returns gray 0-255 written
    * to all three channels. (x=0,y=0) is the TOP-left in caller space —
    * the encoder does the bottom-up flip the format requires. */
  def encodeBmp(width: Int, height: Int, pix: (Int, Int) => Int): Array[Byte] = {
    require(width > 0 && height > 0, s"bad dims ${width}x$height")
    val rowBytes = bmpRowBytes(width)
    val size = bmpSize(width, height)
    val b = new Array[Byte](size)
    b(0) = 'B'; b(1) = 'M'
    wr32(b, 2, size) // file size
    wr32(b, 10, 54) // pixel-data offset
    wr32(b, 14, 40) // BITMAPINFOHEADER size
    wr32(b, 18, width)
    wr32(b, 22, height) // positive = bottom-up
    wr16(b, 26, 1) // planes
    wr16(b, 28, 24) // bpp
    wr32(b, 30, 0) // BI_RGB (uncompressed)
    wr32(b, 34, height * rowBytes) // image size
    var y = 0
    while (y < height) {
      val rowOff = 54 + (height - 1 - y) * rowBytes // bottom-up storage
      var x = 0
      while (x < width) {
        val g = (pix(x, y) & 0xff).toByte
        val o = rowOff + 3 * x
        b(o) = g; b(o + 1) = g; b(o + 2) = g // B, G, R
        x += 1
      }
      y += 1
    }
    b
  }

  /** Parse a 24-bit uncompressed BMP. Validates magic, header size, bpp,
    * compression, and bounds; honors the header's pixel-data offset (not a
    * hardcoded 54) and both bottom-up (height>0) and top-down (height<0)
    * row orders. Throws IllegalArgumentException on malformed input — the
    * caller routes that to the DLQ, same as a cast error. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      "not a BMP: bad magic/size")
    val dataOff = rd32(bytes, 10)
    // hostile-header safety: every size derived from the header is checked
    // in LONG arithmetic against the actual byte count BEFORE any indexing,
    // so an adversarial width/height/offset (e.g. 2^20 x 2^20, whose pixel
    // size overflows Int to a small/negative number) fails the require —
    // the IllegalArgumentException contract the DLQ routing depends on —
    // instead of escaping as AIOOBE/NegativeArraySize from the pixel loop
    require(dataOff >= 54 && dataOff <= bytes.length, s"bad pixel offset $dataOff")
    require(rd32(bytes, 14) >= 40, "unsupported DIB header")
    val width = rd32(bytes, 18)
    val rawH = rd32(bytes, 22)
    val topDown = rawH < 0
    val height = math.abs(rawH)
    require(width > 0 && height > 0 && width <= (1 << 20) && height <= (1 << 20),
      s"bad dims ${width}x$rawH")
    require(rd16(bytes, 28) == 24, s"unsupported bpp ${rd16(bytes, 28)}")
    require(rd32(bytes, 30) == 0, "compressed BMP unsupported")
    val rowBytes = bmpRowBytes(width)
    require(bytes.length.toLong >= dataOff.toLong + height.toLong * rowBytes,
      "truncated pixel data")
    val gray = new Array[Int](width * height)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val rowOff = dataOff + srcRow * rowBytes
      var x = 0
      while (x < width) {
        val o = rowOff + 3 * x
        // mean of B,G,R — exact for the gray images we write, and the
        // standard luma stand-in for color ones
        gray(y * width + x) =
          ((bytes(o) & 0xff) + (bytes(o + 1) & 0xff) + (bytes(o + 2) & 0xff)) / 3
        x += 1
      }
      y += 1
    }
    Image(width, height, gray)
  }

  /** Nearest-neighbor resize — the classic sample-grid mapping
    * src = (dst * srcDim) / dstDim. */
  def resizeNearest(img: Image, w2: Int, h2: Int): Image = {
    require(w2 > 0 && h2 > 0)
    val out = new Array[Int](w2 * h2)
    var y = 0
    while (y < h2) {
      val sy = (y * img.height) / h2
      var x = 0
      while (x < w2) {
        out(y * w2 + x) = img.gray(sy * img.width + (x * img.width) / w2)
        x += 1
      }
      y += 1
    }
    Image(w2, h2, out)
  }

  /** Integer mean gray over all pixels (floor division, exact). */
  def meanGray(img: Image): Long = {
    var s = 0L
    var i = 0
    while (i < img.gray.length) { s += img.gray(i); i += 1 }
    s / img.gray.length
  }

  // ----------------------------------------------------------------- WAV

  final case class Audio(sampleRate: Int, channels: Int, samples: Array[Short])

  /** Encode mono/stereo PCM-16 RIFF/WAVE. Writes a junk `LIST` chunk
    * between `fmt ` and `data` so round-trip tests prove the decoder walks
    * chunks instead of assuming a fixed layout. */
  def encodeWavPcm16(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(sampleRate > 0 && channels >= 1)
    val listPayload = 6 // arbitrary skippable chunk
    val dataBytes = samples.length * 2
    val riffLen = 4 + (8 + 16) + (8 + listPayload) + (8 + dataBytes)
    val b = new Array[Byte](8 + riffLen)
    def tag(off: Int, s: String): Unit = { var i = 0; while (i < 4) { b(off + i) = s.charAt(i).toByte; i += 1 } }
    tag(0, "RIFF"); wr32(b, 4, riffLen); tag(8, "WAVE")
    tag(12, "fmt "); wr32(b, 16, 16)
    wr16(b, 20, 1) // PCM
    wr16(b, 22, channels)
    wr32(b, 24, sampleRate)
    wr32(b, 28, sampleRate * channels * 2) // byte rate
    wr16(b, 32, channels * 2) // block align
    wr16(b, 34, 16) // bits/sample
    tag(36, "LIST"); wr32(b, 40, listPayload) // decoder must skip this
    val dataOff = 44 + listPayload
    tag(dataOff, "data"); wr32(b, dataOff + 4, dataBytes)
    var i = 0
    while (i < samples.length) {
      wr16(b, dataOff + 8 + 2 * i, samples(i) & 0xffff)
      i += 1
    }
    b
  }

  /** Parse RIFF/WAVE PCM-16: validates RIFF/WAVE magic, walks the chunk
    * list (word-aligned, unknown chunks skipped), requires a PCM `fmt `
    * before `data`. Throws on malformed input. */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(bytes.length >= 44, "not a WAV: too short")
    def tagAt(off: Int): String = new String(bytes.slice(off, off + 4), "US-ASCII")
    require(tagAt(0) == "RIFF" && tagAt(8) == "WAVE", "not a WAV: bad magic")
    var off = 12
    var sampleRate = -1
    var channels = -1
    var samples: Array[Short] = null
    while (off + 8 <= bytes.length && samples == null) {
      val tag = tagAt(off)
      val len = rd32(bytes, off + 4)
      // LONG arithmetic: a chunk length near Int.MaxValue would wrap
      // off + 8 + len negative and sail past an Int bounds check
      require(len >= 0 && off + 8L + len <= bytes.length, s"truncated chunk $tag")
      tag match {
        case "fmt " =>
          require(len >= 16, "short fmt chunk")
          require(rd16(bytes, off + 8) == 1, "non-PCM WAV unsupported")
          channels = rd16(bytes, off + 10)
          sampleRate = rd32(bytes, off + 12)
          require(channels >= 1, s"bad channel count $channels")
          require(sampleRate > 0, s"bad sample rate $sampleRate")
          require(rd16(bytes, off + 22) == 16, "only PCM-16 supported")
        case "data" =>
          require(sampleRate > 0, "data chunk before fmt")
          val n = len / 2
          val out = new Array[Short](n)
          var i = 0
          while (i < n) { out(i) = rd16(bytes, off + 8 + 2 * i).toShort; i += 1 }
          samples = out
        case _ => // skip unknown chunk (LIST, fact, cue, ...)
      }
      off += 8 + len + (len & 1) // chunks are word-aligned
    }
    require(samples != null, "no data chunk")
    Audio(sampleRate, channels, samples)
  }

  /** RMS amplitude, rounded to 3dp (double math is exact enough at the
    * test amplitudes; rounding pins the cross-engine hash). */
  def rms(a: Audio): Double = {
    if (a.samples.isEmpty) return 0.0 // a zero-length data chunk is valid WAV
    var s = 0.0
    var i = 0
    while (i < a.samples.length) { val v = a.samples(i).toDouble; s += v * v; i += 1 }
    math.rint(math.sqrt(s / a.samples.length) * 1000) / 1000
  }

  // ------------------------------------------------- raw frame container

  /** Minimal raw "video": GRV1 magic, w, h, nFrames (LE int32 each), then
    * nFrames w×h grayscale frames. The realistic stand-in for frame
    * sampling: a fixed-size header plus addressable uncompressed frames,
    * so sampling frame k is an O(1) offset computation — the property a
    * frame-sampling operator exploits at scale (seek, don't scan). */
  def encodeRawVideo(width: Int, height: Int, frames: Seq[Array[Int]]): Array[Byte] = {
    require(frames.nonEmpty && frames.forall(_.length == width * height))
    val fb = width * height
    val b = new Array[Byte](16 + fb * frames.length)
    b(0) = 'G'; b(1) = 'R'; b(2) = 'V'; b(3) = '1'
    wr32(b, 4, width); wr32(b, 8, height); wr32(b, 12, frames.length)
    var f = 0
    while (f < frames.length) {
      var i = 0
      while (i < fb) { b(16 + f * fb + i) = (frames(f)(i) & 0xff).toByte; i += 1 }
      f += 1
    }
    b
  }

  /** Decode every `stride`-th frame (0, stride, 2·stride, …) WITHOUT
    * touching the skipped frames' bytes — returns (frameIndex, Image). */
  def sampleFrames(bytes: Array[Byte], stride: Int): Seq[(Int, Image)] = {
    require(stride >= 1)
    require(bytes.length >= 16 && bytes(0) == 'G' && bytes(1) == 'R' &&
      bytes(2) == 'V' && bytes(3) == '1', "not a GRV1 container")
    val w = rd32(bytes, 4); val h = rd32(bytes, 8); val n = rd32(bytes, 12)
    // dims validated BEFORE w*h: 65536x65536 would overflow fb to 0 and
    // silently return empty frames instead of rejecting the container
    require(w > 0 && h > 0 && w <= (1 << 20) && h <= (1 << 20), s"bad dims ${w}x$h")
    val fbL = w.toLong * h
    require(n > 0 && bytes.length >= 16 + fbL * n, "truncated GRV1")
    val fb = fbL.toInt // fits: fbL * n <= bytes.length <= Int.MaxValue
    (0 until n by stride).map { f =>
      val off = 16 + f * fb
      val gray = new Array[Int](fb)
      var i = 0
      while (i < fb) { gray(i) = bytes(off + i) & 0xff; i += 1 }
      (f, Image(w, h, gray))
    }
  }
}
