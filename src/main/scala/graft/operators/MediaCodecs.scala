package graft.operators

/** REAL pure-JVM media codecs — no external codec library:
  *   - PCM WAV (RIFF) audio and binary PPM (P6) images decode with byte
  *     arithmetic alone (sample rate, duration, RMS, zero-crossings;
  *     dimensions, channel means, luminance; nearest-neighbour resize).
  *   - PNG and JPEG decode/encode/resize through the JDK's own
  *     `javax.imageio` (headless-safe, ships in the standard library) —
  *     real pixel rasters, real interpolation, not fakes.
  * Only MP4 demux still needs a codec absent from the JDK and remains a
  * clearly-marked stub in [[Multimodal]].
  *
  * All functions are pure byte→value: safe inside `mapPartitions`,
  * deterministic on any partitioning, no shared codec state (ImageIO's
  * disk-backed stream cache is disabled — a decode must never do
  * temp-file I/O inside a task). Malformed payloads return None — a
  * corrupt-asset row becomes a quarantine row, never a task failure (the
  * petabyte-media-corpus requirement).
  */
object MediaCodecs {

  // ImageIO defaults to spilling image streams through temp FILES; in a
  // mapPartitions decode loop that is a hidden disk write per record.
  // Memory-cached streams keep decode pure CPU.
  javax.imageio.ImageIO.setUseCache(false)

  /** Decoded PCM WAV summary — real signal statistics, not fakes. */
  case class WavInfo(
      sampleRate: Int, channels: Int, bitsPerSample: Int, nSamples: Long,
      durationMs: Long, rms: Double, peak: Double, zeroCrossRate: Double)

  /** Decoded P6 PPM summary. */
  case class PpmInfo(
      width: Int, height: Int, meanR: Double, meanG: Double, meanB: Double,
      meanLuma: Double)

  private def le16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def le32(b: Array[Byte], o: Int): Long =
    (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
      ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
  private def tag(b: Array[Byte], o: Int): String =
    new String(b, o, 4, "US-ASCII")

  /** Encode 16-bit mono PCM samples as a canonical 44-byte-header WAV. */
  def encodeWavPcm16(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    val dataSize = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataSize)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataSize)
      .put("WAVE".getBytes("US-ASCII"))
      .put("fmt ".getBytes("US-ASCII")).putInt(16)
      .putShort(1).putShort(1) // PCM, mono
      .putInt(sampleRate).putInt(sampleRate * 2)
      .putShort(2).putShort(16) // block align, bits
      .put("data".getBytes("US-ASCII")).putInt(dataSize)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a PCM WAV: walks the RIFF chunk list (any chunk order, unknown
    * chunks skipped — real files carry LIST/INFO chunks), then one pass
    * over the int16 samples for RMS (of full-scale-normalized amplitude),
    * peak, and zero-crossing rate. None for non-RIFF, non-PCM, or
    * truncated payloads.
    */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (bytes.length < 44 || tag(bytes, 0) != "RIFF" || tag(bytes, 8) != "WAVE") return None
    var off = 12L
    var sampleRate = 0; var channels = 0; var bits = 0; var fmtOk = false
    var dataOff = -1; var dataLen = 0L
    while (off + 8 <= bytes.length) {
      val o = off.toInt
      val id = tag(bytes, o); val size = le32(bytes, o + 4)
      if (id == "fmt " && off + 8 + 16 <= bytes.length) {
        val audioFormat = le16(bytes, o + 8)
        channels = le16(bytes, o + 10)
        sampleRate = le32(bytes, o + 12).toInt
        bits = le16(bytes, o + 22)
        fmtOk = audioFormat == 1 && bits == 16 && channels >= 1 && sampleRate > 0
      } else if (id == "data") {
        dataOff = o + 8
        dataLen = math.min(size, (bytes.length - dataOff).toLong)
      }
      // long arithmetic: a corrupt 32-bit size must only END the walk —
      // never wrap the offset negative (quarantine, not a task failure)
      off += 8L + size + (size & 1L)
    }
    if (!fmtOk || dataOff < 0 || dataLen < 2) return None
    val nFrames = dataLen / 2 / channels
    var i = dataOff
    val end = dataOff + (dataLen - (dataLen % 2)).toInt
    var sumSq = 0.0; var peak = 0.0; var crossings = 0L; var prev = 0; var n = 0L
    while (i + 1 < end) {
      val s = le16(bytes, i).toShort.toInt
      val a = s / 32768.0
      sumSq += a * a
      if (math.abs(a) > peak) peak = math.abs(a)
      if (n > 0 && ((s >= 0 && prev < 0) || (s < 0 && prev >= 0))) crossings += 1
      prev = s; n += 1; i += 2
    }
    Some(WavInfo(sampleRate, channels, bits, nFrames,
      nFrames * 1000L / sampleRate,
      math.sqrt(sumSq / n), peak,
      if (n > 1) crossings.toDouble / (n - 1) else 0.0))
  }

  /** Encode interleaved RGB bytes as a binary P6 PPM. */
  def encodePpm(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width x $height x 3")
    val header = s"P6\n$width $height\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(rgb, 0, out, header.length, rgb.length)
    out
  }

  /** (width, height, pixel offset) of a P6 payload, honoring PPM's
    * whitespace/comment grammar. None unless the full raster is present.
    */
  private def ppmHeader(bytes: Array[Byte]): Option[(Int, Int, Int)] = {
    if (bytes.length < 2 || bytes(0) != 'P' || bytes(1) != '6') return None
    var off = 2
    def nextInt(): Option[Int] = {
      while (off < bytes.length &&
        (bytes(off) == ' ' || bytes(off) == '\n' || bytes(off) == '\r' ||
          bytes(off) == '\t' || bytes(off) == '#')) {
        if (bytes(off) == '#') { while (off < bytes.length && bytes(off) != '\n') off += 1 }
        else off += 1
      }
      val start = off
      while (off < bytes.length && bytes(off) >= '0' && bytes(off) <= '9') off += 1
      // >9 digits cannot be a sane dimension/maxval and would overflow
      // toInt — malformed headers must quarantine, never throw
      if (off == start || off - start > 9) None
      else Some(new String(bytes, start, off - start, "US-ASCII").toInt)
    }
    for {
      w <- nextInt(); h <- nextInt(); maxV <- nextInt()
      if maxV == 255 && w > 0 && h > 0 && off + 1 + w * h * 3 <= bytes.length
    } yield (w, h, off + 1) // single whitespace byte after maxval
  }

  /** Decode a P6 PPM: real per-channel means and Rec.601 luminance. */
  def decodePpm(bytes: Array[Byte]): Option[PpmInfo] =
    ppmHeader(bytes).map { case (w, h, px) =>
      var r = 0.0; var g = 0.0; var b = 0.0
      var i = px
      val n = w * h
      var k = 0
      while (k < n) {
        r += (bytes(i) & 0xff); g += (bytes(i + 1) & 0xff); b += (bytes(i + 2) & 0xff)
        i += 3; k += 1
      }
      val (mr, mg, mb) = (r / n, g / n, b / n)
      PpmInfo(w, h, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb)
    }

  /** REAL nearest-neighbour resize of a P6 payload — source pixel
    * (⌊x·w/W⌋, ⌊y·h/H⌋) for each target pixel, re-encoded as a valid P6.
    */
  def resizePpmNearest(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    ppmHeader(bytes).map { case (w, h, px) =>
      val out = new Array[Byte](newW * newH * 3)
      var y = 0
      while (y < newH) {
        val sy = y.toLong * h / newH
        var x = 0
        while (x < newW) {
          val sx = x.toLong * w / newW
          val src = px + 3 * (sy.toInt * w + sx.toInt)
          val dst = 3 * (y * newW + x)
          out(dst) = bytes(src); out(dst + 1) = bytes(src + 1); out(dst + 2) = bytes(src + 2)
          x += 1
        }
        y += 1
      }
      encodePpm(newW, newH, out)
    }
  }

  /** Deterministic REAL WAV synthesis for the testdata corpus: a sine tone
    * whose frequency/length derive from the seed — a genuine decodable
    * asset with analytically known RMS (amp/√2) and zero-cross rate
    * (2f/rate).
    */
  def syntheticWav(seed: Long, nSamples: Int, sampleRate: Int = 16000): Array[Byte] = {
    val freq = 200.0 + (math.abs(seed) % 20) * 40.0 // 200..960 Hz
    val amp = 0.5
    val samples = Array.tabulate(nSamples) { i =>
      (amp * math.sin(2 * math.Pi * freq * i / sampleRate) * 32767).toShort
    }
    encodeWavPcm16(samples, sampleRate)
  }

  /** Deterministic REAL PPM synthesis: pixels derived from the seed bytes
    * (repeating), a genuine decodable raster with knowable channel means.
    */
  def syntheticPpm(seedBytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val n = width * height * 3
    val rgb = new Array[Byte](n)
    val m = math.max(seedBytes.length, 1)
    var i = 0
    while (i < n) {
      rgb(i) = if (seedBytes.isEmpty) 0 else seedBytes(i % m)
      i += 1
    }
    encodePpm(width, height, rgb)
  }

  // ---- PNG / JPEG via the JDK's javax.imageio (REAL compressed codecs) ----

  /** Container sniff by magic bytes: Some("png") / Some("jpeg") / None.
    * Dispatch must come from the BYTES, not the claimed mime type — a
    * mislabeled asset decodes by what it is.
    */
  def sniffImageFormat(bytes: Array[Byte]): Option[String] =
    if (bytes.length >= 8 && (bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' &&
      bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xff) == 0xff &&
      (bytes(1) & 0xff) == 0xd8 && (bytes(2) & 0xff) == 0xff) Some("jpeg")
    else None

  private def readImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
    catch { case _: Exception => None } // corrupt stream → quarantine

  private def writeImage(img: java.awt.image.BufferedImage, format: String): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(img, format, out)
    out.toByteArray
  }

  /** Decode a PNG or JPEG payload into the same raster summary as
    * [[decodePpm]]: real dimensions, per-channel means, Rec.601 luminance,
    * computed from the decoded pixels. One bulk `getRGB` fetch, one pass.
    * None for non-PNG/JPEG magic or a corrupt stream.
    */
  def decodeCompressedImage(bytes: Array[Byte]): Option[PpmInfo] =
    sniffImageFormat(bytes).flatMap(_ => readImage(bytes)).flatMap { img =>
      val (w, h) = (img.getWidth, img.getHeight)
      if (w <= 0 || h <= 0) None
      else {
        val px = img.getRGB(0, 0, w, h, null, 0, w)
        var r = 0.0; var g = 0.0; var b = 0.0
        var i = 0
        while (i < px.length) {
          val p = px(i)
          r += (p >> 16) & 0xff; g += (p >> 8) & 0xff; b += p & 0xff
          i += 1
        }
        val n = px.length.toDouble
        val (mr, mg, mb) = (r / n, g / n, b / n)
        Some(PpmInfo(w, h, mr, mg, mb, 0.299 * mr + 0.587 * mg + 0.114 * mb))
      }
    }

  /** REAL resize of a PNG/JPEG payload: decode, nearest-neighbour resample
    * (deterministic — no antialias filter kernels), re-encode in the SAME
    * sniffed container. Java2D nearest samples at destination pixel
    * CENTERS (2x2→1x1 picks source (1,1)), a different-but-standard
    * convention from [[resizePpmNearest]]'s floor map. None for
    * undecodable payloads.
    */
  def resizeCompressedImage(bytes: Array[Byte], newW: Int, newH: Int): Option[Array[Byte]] = {
    require(newW > 0 && newH > 0, "target dimensions must be positive")
    for {
      fmt <- sniffImageFormat(bytes)
      img <- readImage(bytes)
    } yield {
      val out = new java.awt.image.BufferedImage(newW, newH,
        java.awt.image.BufferedImage.TYPE_INT_RGB)
      val g2 = out.createGraphics()
      g2.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
        java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR)
      g2.drawImage(img, 0, 0, newW, newH, null)
      g2.dispose()
      writeImage(out, fmt)
    }
  }

  /** Encode interleaved RGB bytes as PNG ("png", lossless) or JPEG
    * ("jpeg"). The PNG roundtrip through [[decodeCompressedImage]] is
    * bit-exact on pixel values; JPEG is lossy by design.
    */
  def encodeImage(width: Int, height: Int, rgb: Array[Byte], format: String): Array[Byte] = {
    require(rgb.length == width * height * 3,
      s"rgb length ${rgb.length} != $width x $height x 3")
    require(format == "png" || format == "jpeg", s"unsupported format $format")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        val i = 3 * (y * width + x)
        img.setRGB(x, y,
          ((rgb(i) & 0xff) << 16) | ((rgb(i + 1) & 0xff) << 8) | (rgb(i + 2) & 0xff))
        x += 1
      }
      y += 1
    }
    writeImage(img, format)
  }

  /** Deterministic REAL PNG synthesis — the [[syntheticPpm]] pattern
    * through the PNG codec, so every scale factor gets genuinely
    * ImageIO-decodable compressed assets.
    */
  def syntheticPng(seedBytes: Array[Byte], width: Int, height: Int): Array[Byte] = {
    val n = width * height * 3
    val rgb = new Array[Byte](n)
    val m = math.max(seedBytes.length, 1)
    var i = 0
    while (i < n) {
      rgb(i) = if (seedBytes.isEmpty) 0 else seedBytes(i % m)
      i += 1
    }
    encodeImage(width, height, rgb, "png")
  }
}
