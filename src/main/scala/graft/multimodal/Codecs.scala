package graft.multimodal

/** Pure-JVM media codecs, no external libraries: PPM (P6) and uncompressed
  * 24-bit BMP are hand-decoded; PNG / JPEG / GIF decode (and PNG/JPEG
  * encode) go through the JDK's own ImageIO readers (java.desktop ships
  * with the JRE, headless-safe); PCM WAV is hand-decoded. These make the
  * multimodal pipeline REAL end-to-end — decode, feature extraction,
  * nearest-neighbor resize, re-encode — for every mainstream image
  * container. Only formats with no JDK codec at all (MP3/H.264) keep the
  * documented stub path in [[Multimodal]].
  *
  * All functions are allocation-bounded per row and executor-side only;
  * nothing here touches Spark.
  */
object Codecs {

  // ---- sniffing -----------------------------------------------------------

  /** Magic-byte container detection (the real-world replacement for
    * trusting a `mime` column). */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 12) None
    else if (bytes(0) == 'P' && bytes(1) == '6') Some("image/x-portable-pixmap")
    else if (bytes(0) == 'B' && bytes(1) == 'M') Some("image/bmp")
    else if (bytes(0) == 'R' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == 'F' && bytes(8) == 'W' && bytes(9) == 'A' &&
      bytes(10) == 'V' && bytes(11) == 'E') Some("audio/wav")
    else if ((bytes(0) & 0xff) == 0xff && (bytes(1) & 0xff) == 0xd8)
      Some("image/jpeg") // decoded via the JDK's ImageIO (no external lib)
    else if ((bytes(0) & 0xff) == 0x89 && bytes(1) == 'P' && bytes(2) == 'N' &&
      bytes(3) == 'G') Some("image/png") // decoded via ImageIO
    else if (bytes(0) == 'G' && bytes(1) == 'I' && bytes(2) == 'F' &&
      bytes(3) == '8') Some("image/gif") // decoded via ImageIO
    else None
  }

  // ---- images -------------------------------------------------------------

  /** Packed interleaved RGB, row-major from the top-left. */
  final case class ImagePixels(width: Int, height: Int, rgb: Array[Byte])

  def decodeImage(bytes: Array[Byte]): Option[ImagePixels] = sniff(bytes) match {
    case Some("image/x-portable-pixmap") => decodePpm(bytes)
    case Some("image/bmp") => decodeBmp(bytes)
    case Some("image/png") | Some("image/jpeg") | Some("image/gif") =>
      decodeImageIo(bytes)
    case _ => None
  }

  /** PNG / JPEG / GIF via the JDK's own ImageIO readers (the java.desktop
    * module ships with every JRE — no external codec library, and raster
    * decode needs no display, so it is headless-executor-safe). Alpha is
    * dropped: the pipeline's pixel model is packed 24-bit RGB. */
  def decodeImageIo(bytes: Array[Byte]): Option[ImagePixels] =
    try {
      val bi = javax.imageio.ImageIO.read(
        new java.io.ByteArrayInputStream(bytes))
      if (bi == null) None
      else {
        val w = bi.getWidth; val h = bi.getHeight
        val rgb = new Array[Byte](w * h * 3)
        var y = 0; var i = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val p = bi.getRGB(x, y)
            rgb(i) = ((p >> 16) & 0xff).toByte
            rgb(i + 1) = ((p >> 8) & 0xff).toByte
            rgb(i + 2) = (p & 0xff).toByte
            i += 3; x += 1
          }
          y += 1
        }
        Some(ImagePixels(w, h, rgb))
      }
    } catch { case _: Exception => None }

  private def toBuffered(img: ImagePixels): java.awt.image.BufferedImage = {
    val bi = new java.awt.image.BufferedImage(img.width, img.height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var y = 0; var i = 0
    while (y < img.height) {
      var x = 0
      while (x < img.width) {
        bi.setRGB(x, y,
          ((img.rgb(i) & 0xff) << 16) | ((img.rgb(i + 1) & 0xff) << 8) |
            (img.rgb(i + 2) & 0xff))
        i += 3; x += 1
      }
      y += 1
    }
    bi
  }

  /** Lossless PNG encode via ImageIO — decode(encodePng(img)) == img
    * pixel-for-pixel (the roundtrip gate asserts it). */
  def encodePng(img: ImagePixels): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(toBuffered(img), "png", out)
    out.toByteArray
  }

  /** JPEG encode at an explicit quality (lossy — roundtrip is judged by
    * mean pixel error, not equality). */
  def encodeJpeg(img: ImagePixels, quality: Float = 0.9f): Array[Byte] = {
    val writer = javax.imageio.ImageIO
      .getImageWritersByFormatName("jpg").next()
    val params = writer.getDefaultWriteParam
    params.setCompressionMode(javax.imageio.ImageWriteParam.MODE_EXPLICIT)
    params.setCompressionQuality(quality)
    val out = new java.io.ByteArrayOutputStream()
    val ios = javax.imageio.ImageIO.createImageOutputStream(out)
    try {
      writer.setOutput(ios)
      writer.write(null, new javax.imageio.IIOImage(toBuffered(img),
        null, null), params)
    } finally { ios.close(); writer.dispose() }
    out.toByteArray
  }

  /** PPM P6: `P6 <ws> <width> <ws> <height> <ws> <maxval> <single-ws>` then
    * raw RGB triplets. Comments (`#`) allowed in the header per spec. */
  def decodePpm(bytes: Array[Byte]): Option[ImagePixels] = {
    var i = 2 // past "P6"
    def skipWs(): Unit = {
      var done = false
      while (!done && i < bytes.length) {
        val c = bytes(i).toChar
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c.isWhitespace) i += 1
        else done = true
      }
    }
    def int(): Int = {
      skipWs(); var v = 0
      while (i < bytes.length && bytes(i).toChar.isDigit) {
        v = v * 10 + (bytes(i) - '0'); i += 1
      }
      v
    }
    try {
      val w = int(); val h = int(); val maxv = int()
      i += 1 // the single whitespace after maxval
      if (w <= 0 || h <= 0 || maxv != 255 ||
        bytes.length - i < w * h * 3) None
      else Some(ImagePixels(w, h,
        java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3)))
    } catch { case _: Throwable => None }
  }

  def encodePpm(img: ImagePixels): Array[Byte] = {
    val header = s"P6\n${img.width} ${img.height}\n255\n"
      .getBytes(java.nio.charset.StandardCharsets.US_ASCII)
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  private def le32(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8) |
      ((b(off + 2) & 0xff) << 16) | ((b(off + 3) & 0xff) << 24)
  private def le16(b: Array[Byte], off: Int): Int =
    (b(off) & 0xff) | ((b(off + 1) & 0xff) << 8)

  /** Uncompressed 24-bit BMP (BITMAPINFOHEADER): pixel data bottom-up in
    * BGR order with rows padded to 4 bytes. */
  def decodeBmp(bytes: Array[Byte]): Option[ImagePixels] = {
    try {
      val dataOff = le32(bytes, 10)
      val w = le32(bytes, 18)
      val rawH = le32(bytes, 22)
      val bpp = le16(bytes, 28)
      val compression = le32(bytes, 30)
      if (w <= 0 || rawH == 0 || bpp != 24 || compression != 0) return None
      val h = math.abs(rawH)
      val topDown = rawH < 0
      val rowSize = (w * 3 + 3) / 4 * 4
      if (bytes.length < dataOff + rowSize * h) return None
      val rgb = new Array[Byte](w * h * 3)
      var y = 0
      while (y < h) {
        val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowSize
        var x = 0
        while (x < w) {
          val s = srcRow + x * 3
          val d = (y * w + x) * 3
          rgb(d) = bytes(s + 2) // R  (BMP stores BGR)
          rgb(d + 1) = bytes(s + 1)
          rgb(d + 2) = bytes(s)
          x += 1
        }
        y += 1
      }
      Some(ImagePixels(w, h, rgb))
    } catch { case _: Throwable => None }
  }

  def encodeBmp(img: ImagePixels): Array[Byte] = {
    val rowSize = (img.width * 3 + 3) / 4 * 4
    val dataSize = rowSize * img.height
    val out = new Array[Byte](54 + dataSize)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    out(0) = 'B'; out(1) = 'M'
    putLe32(2, 54 + dataSize); putLe32(10, 54)
    putLe32(14, 40); putLe32(18, img.width); putLe32(22, img.height)
    putLe16(26, 1); putLe16(28, 24); putLe32(34, dataSize)
    var y = 0
    while (y < img.height) {
      val dstRow = 54 + (img.height - 1 - y) * rowSize
      var x = 0
      while (x < img.width) {
        val s = (y * img.width + x) * 3
        val d = dstRow + x * 3
        out(d) = img.rgb(s + 2) // BGR
        out(d + 1) = img.rgb(s + 1)
        out(d + 2) = img.rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  /** Nearest-neighbor resize — exact, deterministic, no filtering deps. */
  def resizeNearest(img: ImagePixels, newW: Int, newH: Int): ImagePixels = {
    val out = new Array[Byte](newW * newH * 3)
    var y = 0
    while (y < newH) {
      val sy = math.min(img.height - 1, y * img.height / newH)
      var x = 0
      while (x < newW) {
        val sx = math.min(img.width - 1, x * img.width / newW)
        val s = (sy * img.width + sx) * 3
        val d = (y * newW + x) * 3
        out(d) = img.rgb(s); out(d + 1) = img.rgb(s + 1); out(d + 2) = img.rgb(s + 2)
        x += 1
      }
      y += 1
    }
    ImagePixels(newW, newH, out)
  }

  /** Average-hash perceptual fingerprint: nearest-resize to 8×8, integer
    * grayscale (r+g+b)/3, one bit per cell = gray > mean. Near-identical
    * images differ in a few bits; unrelated images land ~32 apart — feed
    * the result to `SimHash.sigPairs` for blocked near-dup search. All
    * integer arithmetic except the final mean compare (exact: sum/64.0 is
    * a double with ≤ 6 fractional bits), so the hash is deterministic
    * across JVMs and platforms. */
  def aHash(img: ImagePixels): Long = {
    val small = resizeNearest(img, 8, 8)
    val gray = new Array[Int](64)
    var sum = 0L
    var i = 0
    while (i < 64) {
      val r = small.rgb(i * 3) & 0xff
      val g = small.rgb(i * 3 + 1) & 0xff
      val b = small.rgb(i * 3 + 2) & 0xff
      gray(i) = (r + g + b) / 3
      sum += gray(i)
      i += 1
    }
    val mean = sum.toDouble / 64.0
    var h = 0L
    i = 0
    while (i < 64) {
      if (gray(i) > mean) h |= (1L << i)
      i += 1
    }
    h
  }

  /** Aspect-preserving fit into maxW×maxH, never upscaling. */
  def fitWithin(w: Int, h: Int, maxW: Int, maxH: Int): (Int, Int) = {
    val scale = math.min(1.0, math.min(maxW.toDouble / w, maxH.toDouble / h))
    (math.max(1, math.floor(w * scale).toInt),
      math.max(1, math.floor(h * scale).toInt))
  }

  /** Mean R/G/B and a luma-contrast summary — the feature head. */
  def imageStats(img: ImagePixels): (Double, Double, Double, Double) = {
    val n = img.width * img.height
    var r = 0.0; var g = 0.0; var b = 0.0
    var lumaSum = 0.0; var lumaSq = 0.0
    var i = 0
    while (i < n) {
      val rr = img.rgb(i * 3) & 0xff
      val gg = img.rgb(i * 3 + 1) & 0xff
      val bb = img.rgb(i * 3 + 2) & 0xff
      r += rr; g += gg; b += bb
      val luma = 0.299 * rr + 0.587 * gg + 0.114 * bb
      lumaSum += luma; lumaSq += luma * luma
      i += 1
    }
    val meanLuma = lumaSum / n
    (r / n, g / n, b / n,
      math.sqrt(math.max(0.0, lumaSq / n - meanLuma * meanLuma)))
  }

  // ---- audio --------------------------------------------------------------

  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
      nFrames: Long, durationMs: Long, rms: Double, peak: Double,
      zeroCrossRate: Double)

  /** RIFF/WAVE with PCM 16-bit data: walk chunks to `fmt ` and `data`,
    * compute duration + signal stats in one pass. */
  def decodeWav(bytes: Array[Byte]): Option[WavInfo] = {
    if (!sniff(bytes).contains("audio/wav")) return None
    try {
      var pos = 12
      var channels = 0; var rate = 0; var bits = 0
      var dataOff = -1; var dataLen = 0
      var malformed = false
      while (!malformed && pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4, java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bytes, pos + 4)
        if (size < 0) malformed = true // negative chunk size must not loop
        else {
          if (id == "fmt ") {
            channels = le16(bytes, pos + 10)
            rate = le32(bytes, pos + 12)
            bits = le16(bytes, pos + 22)
          } else if (id == "data") { dataOff = pos + 8; dataLen = size }
          pos += 8 + size + (size & 1) // chunks are word-aligned
        }
      }
      if (malformed) return None
      if (channels <= 0 || rate <= 0 || bits != 16 || dataOff < 0) return None
      val dl = math.min(dataLen, bytes.length - dataOff)
      val nSamples = dl / 2
      val nFrames = nSamples / channels
      var sumSq = 0.0; var peak = 0.0; var crossings = 0L
      var prevSign = 0
      var i = 0
      while (i < nSamples) {
        val s = le16(bytes, dataOff + i * 2).toShort / 32768.0
        sumSq += s * s
        if (math.abs(s) > peak) peak = math.abs(s)
        val sign = if (s > 0) 1 else if (s < 0) -1 else 0
        if (sign != 0 && prevSign != 0 && sign != prevSign) crossings += 1
        if (sign != 0) prevSign = sign
        i += 1
      }
      Some(WavInfo(channels, rate, bits, nFrames,
        nFrames * 1000L / rate,
        math.sqrt(sumSq / math.max(1, nSamples)), peak,
        if (nSamples > 1) crossings.toDouble / (nSamples - 1) else 0.0))
    } catch { case _: Throwable => None }
  }

  /** Raw PCM samples (all channels interleaved) of a 16-bit WAV — the
    * sample-level twin of [[decodeWav]]'s stats pass. */
  def decodeWavSamples(bytes: Array[Byte]): Option[Array[Short]] = {
    if (!sniff(bytes).contains("audio/wav")) return None
    try {
      var pos = 12
      var bits = 0; var dataOff = -1; var dataLen = 0
      var malformed = false
      while (!malformed && pos + 8 <= bytes.length) {
        val id = new String(bytes, pos, 4,
          java.nio.charset.StandardCharsets.US_ASCII)
        val size = le32(bytes, pos + 4)
        if (size < 0) malformed = true
        else {
          if (id == "fmt ") bits = le16(bytes, pos + 22)
          else if (id == "data") { dataOff = pos + 8; dataLen = size }
          pos += 8 + size + (size & 1)
        }
      }
      if (malformed || bits != 16 || dataOff < 0) return None
      val dl = math.min(dataLen, bytes.length - dataOff)
      val out = new Array[Short](dl / 2)
      var i = 0
      while (i < out.length) {
        out(i) = le16(bytes, dataOff + i * 2).toShort
        i += 1
      }
      Some(out)
    } catch { case _: Throwable => None }
  }

  /** Energy-profile audio fingerprint, the aHash analog: 64 equal frames,
    * one bit per frame = mean |sample| above the across-frame mean. Robust
    * to tiny sample perturbations, far apart for unrelated envelopes; all
    * integer/double arithmetic deterministic across platforms. Returns
    * None for audio shorter than 64 samples. */
  def audioFingerprint(samples: Array[Short]): Option[Long] = {
    val n = samples.length
    if (n < 64) return None
    val energy = new Array[Double](64)
    var f = 0
    while (f < 64) {
      val from = f * n / 64
      val until = (f + 1) * n / 64
      var s = 0.0
      var i = from
      while (i < until) { s += math.abs(samples(i).toDouble); i += 1 }
      energy(f) = s / math.max(1, until - from)
      f += 1
    }
    val mean = energy.sum / 64.0
    var h = 0L
    f = 0
    while (f < 64) {
      if (energy(f) > mean) h |= (1L << f)
      f += 1
    }
    Some(h)
  }

  /** Mono PCM16 resample by exact-rational linear interpolation: output
    * sample j sits at source position j·(srcRate/dstRate), interpolated
    * between its two neighbors in PURE INTEGER arithmetic
    * (s0 + (s1−s0)·frac·…/den, floored) — deterministic on every engine
    * and replayable without float drift. Output length is
    * floor((n−1)·dst/src) + 1 (last source sample reachable exactly). */
  def resampleLinear(samples: Array[Short], srcRate: Int,
      dstRate: Int): Array[Short] = {
    require(srcRate > 0 && dstRate > 0, "rates must be positive")
    if (srcRate == dstRate || samples.length < 2) return samples.clone()
    val n = samples.length
    val outLen = ((n - 1).toLong * dstRate / srcRate).toInt + 1
    val out = new Array[Short](outLen)
    var j = 0
    while (j < outLen) {
      // source position = j * src / dst, as (whole, num/den)
      val num = j.toLong * srcRate
      val i0 = (num / dstRate).toInt
      val rem = num % dstRate
      val s0 = samples(i0).toLong
      val s1 = samples(math.min(i0 + 1, n - 1)).toLong
      out(j) = (s0 + (s1 - s0) * rem / dstRate).toShort
      j += 1
    }
    out
  }

  def encodeWavPcm16(samples: Array[Short], sampleRate: Int,
      channels: Int = 1): Array[Byte] = {
    val dataLen = samples.length * 2
    val out = new Array[Byte](44 + dataLen)
    def putLe32(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
      out(off + 2) = (v >> 16).toByte; out(off + 3) = (v >> 24).toByte
    }
    def putLe16(off: Int, v: Int): Unit = {
      out(off) = v.toByte; out(off + 1) = (v >> 8).toByte
    }
    def putAscii(off: Int, s: String): Unit = {
      var i = 0; while (i < s.length) { out(off + i) = s.charAt(i).toByte; i += 1 }
    }
    putAscii(0, "RIFF"); putLe32(4, 36 + dataLen); putAscii(8, "WAVE")
    putAscii(12, "fmt "); putLe32(16, 16); putLe16(20, 1) // PCM
    putLe16(22, channels); putLe32(24, sampleRate)
    putLe32(28, sampleRate * channels * 2); putLe16(32, channels * 2)
    putLe16(34, 16)
    putAscii(36, "data"); putLe32(40, dataLen)
    var i = 0
    while (i < samples.length) {
      putLe16(44 + i * 2, samples(i).toInt & 0xffff); i += 1
    }
    out
  }
}
