package graft.operators

/** REAL pure-JVM media codecs — no external codec library:
  *   - PCM WAV (RIFF) audio and binary PPM (P6) images decode with byte
  *     arithmetic alone (sample rate, duration, RMS, zero-crossings;
  *     dimensions, channel means, luminance; nearest-neighbour resize).
  *   - PNG and JPEG decode/encode/resize through the JDK's own
  *     `javax.imageio` (headless-safe, ships in the standard library) —
  *     real pixel rasters, real interpolation, not fakes.
  *   - MP4 CONTAINER demux is a byte-walk over the ISO BMFF box tree
  *     (ISO/IEC 14496-12): mvhd timescale/duration, tkhd dimensions,
  *     track count — real metadata from real parsing. FRAME decode (the
  *     codec payload inside mdat) genuinely needs H.264/H.265 codecs the
  *     JDK lacks and stays honestly out of scope: [[Multimodal]]'s frame
  *     sampler remains a stub.
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

  // ---- MP4 / ISO BMFF container demux (metadata; frame decode needs codecs) ----

  /** Parsed MP4 container metadata — real box-tree facts, not fakes. */
  case class Mp4Info(durationMs: Long, timescale: Long, width: Int, height: Int,
                     nTracks: Int)

  private def be32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def be64(b: Array[Byte], off: Int): Long =
    (be32(b, off) << 32) | be32(b, off + 4)

  private def boxType(b: Array[Byte], off: Int): String =
    new String(b, off + 4, 4, "US-ASCII")

  /** Walk the sibling boxes of [start, end), invoking `visit(type, payloadStart,
    * payloadEnd)` per box. Bounds-checked and iteration-capped: a hostile
    * size field (0, negative-looking, beyond the buffer, or a loop) makes
    * the walk STOP, never spin or read out of bounds — a corrupt asset is
    * a quarantine row, not a hung task (the adversarial-header rule).
    */
  private def walkBoxes(b: Array[Byte], start: Int, end: Int)
                       (visit: (String, Int, Int) => Unit): Unit = {
    var off = start
    var steps = 0
    while (off + 8 <= end && steps < 10000) {
      val size32 = be32(b, off)
      val (payload, next) =
        if (size32 == 1L && off + 16 <= end) {
          val size64 = be64(b, off + 8)
          if (size64 < 16 || size64 > (end - off).toLong) (-1, end)
          else (off + 16, off + size64.toInt)
        } else if (size32 == 0L) (off + 8, end) // box extends to the end
        else if (size32 < 8 || size32 > (end - off).toLong) (-1, end)
        else (off + 8, off + size32.toInt)
      if (payload >= 0) visit(boxType(b, off), payload, next)
      off = next
      steps += 1
    }
  }

  /** Demux an MP4/ISO-BMFF payload's container metadata: duration via
    * mvhd's timescale (version 0 and 1 layouts), presentation dimensions
    * from the largest tkhd (16.16 fixed point), and the track count. None
    * for non-BMFF bytes (no top-level ftyp/moov) or a malformed tree.
    */
  def decodeMp4Meta(bytes: Array[Byte]): Option[Mp4Info] = {
    if (bytes.length < 16) return None
    var sawBmff = false
    var timescale = 0L; var duration = -1L
    var width = 0; var height = 0; var nTracks = 0
    walkBoxes(bytes, 0, bytes.length) { (t, s, e) =>
      if (t == "ftyp") sawBmff = true
      else if (t == "moov") {
        sawBmff = true
        walkBoxes(bytes, s, e) { (t2, s2, e2) =>
          if (t2 == "mvhd" && e2 - s2 >= 4) {
            val v = bytes(s2) & 0xff
            if (v == 1 && e2 - s2 >= 32) {
              timescale = be32(bytes, s2 + 20); duration = be64(bytes, s2 + 24)
            } else if (v == 0 && e2 - s2 >= 20) {
              timescale = be32(bytes, s2 + 12); duration = be32(bytes, s2 + 16)
            }
          } else if (t2 == "trak") {
            nTracks += 1
            walkBoxes(bytes, s2, e2) { (t3, s3, e3) =>
              if (t3 == "tkhd" && e3 - s3 >= 4) {
                val v = bytes(s3) & 0xff
                // width/height are the LAST 8 payload bytes in both versions
                if (e3 - s3 >= (if (v == 1) 92 else 80)) {
                  val w = (be32(bytes, e3 - 8) >> 16).toInt
                  val h = (be32(bytes, e3 - 4) >> 16).toInt
                  if (w * h > width * height) { width = w; height = h }
                }
              }
            }
          }
        }
      }
    }
    if (!sawBmff || timescale <= 0 || duration < 0) None
    else Some(Mp4Info(duration * 1000L / timescale, timescale, width, height, nTracks))
  }

  private def putBe32(b: Array[Byte], off: Int, v: Long): Unit = {
    b(off) = ((v >> 24) & 0xff).toByte; b(off + 1) = ((v >> 16) & 0xff).toByte
    b(off + 2) = ((v >> 8) & 0xff).toByte; b(off + 3) = (v & 0xff).toByte
  }

  private def putType(b: Array[Byte], off: Int, t: String): Unit = {
    val a = t.getBytes("US-ASCII")
    System.arraycopy(a, 0, b, off + 4, 4)
  }

  /** Minimal REAL MP4 synthesis: ftyp + moov{mvhd(v0, timescale 1000,
    * duration ms), trak{tkhd(v0, width, height)}} — a genuinely
    * demuxable ISO BMFF tree so every scale factor exercises the real
    * box walk (frame payloads would need an encoder; none are written).
    */
  def syntheticMp4(durationMs: Long, width: Int, height: Int): Array[Byte] = {
    require(durationMs >= 0 && width >= 0 && height >= 0, "non-negative args required")
    val mvhdSize = 8 + 4 + 96          // header + version/flags + v0 body
    val tkhdSize = 8 + 4 + 80          // header + version/flags + v0 body
    val trakSize = 8 + tkhdSize
    val moovSize = 8 + mvhdSize + trakSize
    val out = new Array[Byte](16 + moovSize)
    // ftyp: brand isom, minor 0
    putBe32(out, 0, 16); putType(out, 0, "ftyp")
    System.arraycopy("isom".getBytes("US-ASCII"), 0, out, 8, 4)
    // moov
    val moov = 16
    putBe32(out, moov, moovSize); putType(out, moov, "moov")
    // mvhd v0: creation(4) modification(4) timescale(4) duration(4) ...
    val mvhd = moov + 8
    putBe32(out, mvhd, mvhdSize); putType(out, mvhd, "mvhd")
    putBe32(out, mvhd + 8 + 12, 1000L)        // timescale = 1000 -> duration in ms
    putBe32(out, mvhd + 8 + 16, durationMs)
    // trak > tkhd v0: ... width/height as 16.16 in the last 8 bytes
    val trak = mvhd + mvhdSize
    putBe32(out, trak, trakSize); putType(out, trak, "trak")
    val tkhd = trak + 8
    putBe32(out, tkhd, tkhdSize); putType(out, tkhd, "tkhd")
    putBe32(out, tkhd + tkhdSize - 8, width.toLong << 16)
    putBe32(out, tkhd + tkhdSize - 4, height.toLong << 16)
    out
  }
}
