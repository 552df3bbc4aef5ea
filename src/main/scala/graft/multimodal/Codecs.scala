package graft.multimodal

/** Pure-JVM decoders (and fixture encoders) for the container formats
  * that need no native codec libraries: BMP (24/32-bit uncompressed),
  * binary PPM/PGM (P6/P5, maxval ≤ 255), and WAV (PCM 8/16-bit). These
  * are the REAL decode step behind [[Multimodal.decodeMedia]] — byte
  * layout parsed from the published format specs (BMP: Windows
  * BITMAPINFOHEADER; PPM/PGM: netpbm; WAV: RIFF/WAVE PCM), with
  * deterministic output (golden-pixel/golden-sample pinned in
  * MultimodalSpec). Formats outside this set still take the documented
  * stub path — sniffing is by magic bytes, never by metadata.
  *
  * Everything is plain byte/array math on a driver- or executor-local
  * payload: decoders run inside `mapPartitions` batches, so the Spark
  * plumbing around them is exactly the shape a vectorized native codec
  * would use.
  */
object Codecs {

  /** A decoded raster: `pixels` is row-major, interleaved by channel
    * (RGB for 3 channels, gray for 1), top-down regardless of the
    * container's row order. */
  final case class Image(width: Int, height: Int, channels: Int,
      pixels: Array[Byte])

  /** Decoded PCM audio: samples normalized to [-1, 1], channels
    * interleaved in frame order. */
  final case class Audio(channels: Int, sampleRate: Int,
      samples: Array[Double])

  // ImageIO must never try to touch a display — executors are headless.
  // Harmless if something already initialized AWT; decisive otherwise.
  System.setProperty("java.awt.headless", "true")

  /** Container sniff by magic bytes: Some("bmp" | "ppm" | "pgm" | "png" |
    * "jpeg" | "wav" | "mp3" | "h264") or None for anything this module
    * cannot parse. mp3/h264 are METADATA routes ([[Bitstreams]]): frame/
    * NAL structure parses exactly; sample/pixel decode has no pure-JVM
    * implementation. */
  def sniff(bytes: Array[Byte]): Option[String] = {
    if (bytes.length >= 2 && bytes(0) == 'B' && bytes(1) == 'M') Some("bmp")
    else if (bytes.length >= 4 && bytes(0) == 0 && bytes(1) == 0 &&
      (bytes(2) == 1 || (bytes(2) == 0 && bytes(3) == 1))) Some("h264")
    else if (bytes.length >= 3 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') Some("mp3")
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xE0) == 0xE0 && (bytes(1) & 0xFF) != 0xD8 &&
      ((bytes(1) >> 1) & 3) == 1) Some("mp3") // MPEG sync, Layer III
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '6') Some("ppm")
    else if (bytes.length >= 2 && bytes(0) == 'P' && bytes(1) == '5') Some("pgm")
    else if (bytes.length >= 8 && (bytes(0) & 0xFF) == 0x89 &&
      bytes(1) == 'P' && bytes(2) == 'N' && bytes(3) == 'G') Some("png")
    else if (bytes.length >= 3 && (bytes(0) & 0xFF) == 0xFF &&
      (bytes(1) & 0xFF) == 0xD8 && (bytes(2) & 0xFF) == 0xFF) Some("jpeg")
    else if (bytes.length >= 12 && bytes(0) == 'R' && bytes(1) == 'I' &&
      bytes(2) == 'F' && bytes(3) == 'F' &&
      bytes(8) == 'W' && bytes(9) == 'A' && bytes(10) == 'V' &&
      bytes(11) == 'E') Some("wav")
    else None
  }

  // ----------------------------------------------------- PNG / JPEG
  // Via the JDK's OWN ImageIO readers (java.desktop): PNG's inflate is
  // java.util.zip, JPEG baseline is the JDK's bundled pure-Java decoder —
  // no native codec libraries, headless-safe. The hand-rolled BMP/PNM
  // parsers above stay as the from-first-principles reference pair
  // (golden-pinned against each other in MultimodalSpec).

  /** Decode PNG or JPEG to top-down interleaved RGB via ImageIO. */
  def decodeJdkImage(bytes: Array[Byte]): Image = {
    val img = javax.imageio.ImageIO.read(
      new java.io.ByteArrayInputStream(bytes))
    require(img != null, "ImageIO could not decode the payload")
    val w = img.getWidth
    val h = img.getHeight
    val out = new Array[Byte](w * h * 3)
    var i = 0
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val rgb = img.getRGB(x, y)
        out(i) = ((rgb >> 16) & 0xFF).toByte
        out(i + 1) = ((rgb >> 8) & 0xFF).toByte
        out(i + 2) = (rgb & 0xFF).toByte
        i += 3
        x += 1
      }
      y += 1
    }
    Image(w, h, 3, out)
  }

  private def toBufferedImage(width: Int, height: Int,
      rgb: Array[Byte]): java.awt.image.BufferedImage = {
    require(rgb.length == width * height * 3,
      s"need ${width * height * 3} RGB bytes, got ${rgb.length}")
    val img = new java.awt.image.BufferedImage(width, height,
      java.awt.image.BufferedImage.TYPE_INT_RGB)
    var i = 0
    var y = 0
    while (y < height) {
      var x = 0
      while (x < width) {
        img.setRGB(x, y, ((rgb(i) & 0xFF) << 16) |
          ((rgb(i + 1) & 0xFF) << 8) | (rgb(i + 2) & 0xFF))
        i += 3
        x += 1
      }
      y += 1
    }
    img
  }

  private def writeJdkImage(format: String, width: Int, height: Int,
      rgb: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    require(javax.imageio.ImageIO.write(
      toBufferedImage(width, height, rgb), format, bos),
      s"no ImageIO writer for $format")
    bos.toByteArray
  }

  /** Encode top-down interleaved RGB as PNG (lossless). */
  def encodePng(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    writeJdkImage("png", width, height, rgb)

  /** Encode top-down interleaved RGB as baseline JPEG (lossy). */
  def encodeJpeg(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] =
    writeJdkImage("jpg", width, height, rgb)

  // ------------------------------------------------------------- BMP

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8)
  private def i32(b: Array[Byte], i: Int): Int =
    (b(i) & 0xFF) | ((b(i + 1) & 0xFF) << 8) |
      ((b(i + 2) & 0xFF) << 16) | ((b(i + 3) & 0xFF) << 24)

  /** Decode an uncompressed 24- or 32-bit BMP (BITMAPINFOHEADER,
    * BI_RGB). Handles bottom-up (positive height, the common case) and
    * top-down (negative height) row order and the 4-byte row padding.
    * Output is top-down interleaved RGB (the alpha byte of 32-bit input
    * is dropped). Truncated or unsupported payloads fail loudly. */
  def decodeBmp(bytes: Array[Byte]): Image = {
    require(bytes.length >= 54 && bytes(0) == 'B' && bytes(1) == 'M',
      s"not a BMP payload (${bytes.length} bytes)")
    val dataOffset = i32(bytes, 10)
    val headerSize = i32(bytes, 14)
    require(headerSize >= 40, s"unsupported BMP header size $headerSize")
    val width = i32(bytes, 18)
    val rawHeight = i32(bytes, 22)
    val topDown = rawHeight < 0
    val height = math.abs(rawHeight)
    val planes = u16(bytes, 26)
    val bpp = u16(bytes, 28)
    val compression = i32(bytes, 30)
    require(planes == 1, s"BMP planes=$planes unsupported")
    require(bpp == 24 || bpp == 32, s"BMP bpp=$bpp unsupported (24/32 only)")
    require(compression == 0, s"compressed BMP (method $compression) unsupported")
    require(width > 0 && height > 0, s"degenerate BMP ${width}x$rawHeight")
    val bytesPerPx = bpp / 8
    val rowSize = ((width * bytesPerPx + 3) / 4) * 4
    require(bytes.length >= dataOffset + rowSize.toLong * height,
      s"truncated BMP: need ${dataOffset + rowSize.toLong * height} bytes, " +
        s"have ${bytes.length}")
    val out = new Array[Byte](width * height * 3)
    var y = 0
    while (y < height) {
      val srcRow = if (topDown) y else height - 1 - y
      val base = dataOffset + srcRow * rowSize
      var x = 0
      while (x < width) {
        val p = base + x * bytesPerPx // stored BGR(A)
        val o = (y * width + x) * 3
        out(o) = bytes(p + 2)     // R
        out(o + 1) = bytes(p + 1) // G
        out(o + 2) = bytes(p)     // B
        x += 1
      }
      y += 1
    }
    Image(width, height, 3, out)
  }

  /** Encode top-down interleaved RGB as a bottom-up 24-bit BMP — the
    * fixture-side inverse of [[decodeBmp]] (round-trip pinned in
    * MultimodalSpec). */
  def encodeBmp24(width: Int, height: Int, rgb: Array[Byte]): Array[Byte] = {
    require(rgb.length == width * height * 3, "rgb must be w*h*3 bytes")
    val rowSize = ((width * 3 + 3) / 4) * 4
    val dataSize = rowSize * height
    val out = new Array[Byte](54 + dataSize)
    def w16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      w16(i, v & 0xFFFF); w16(i + 2, (v >>> 16) & 0xFFFF)
    }
    out(0) = 'B'; out(1) = 'M'
    w32(2, 54 + dataSize); w32(10, 54)
    w32(14, 40); w32(18, width); w32(22, height)
    w16(26, 1); w16(28, 24); w32(30, 0); w32(34, dataSize)
    var y = 0
    while (y < height) {
      val dstRow = 54 + (height - 1 - y) * rowSize
      var x = 0
      while (x < width) {
        val s = (y * width + x) * 3
        val d = dstRow + x * 3
        out(d) = rgb(s + 2); out(d + 1) = rgb(s + 1); out(d + 2) = rgb(s)
        x += 1
      }
      y += 1
    }
    out
  }

  // --------------------------------------------------------- PPM/PGM

  /** Decode binary netpbm: P6 (RGB) or P5 (gray), maxval ≤ 255.
    * Header is whitespace-separated with `#` comments; pixel data is
    * already top-down row-major. */
  def decodePnm(bytes: Array[Byte]): Image = {
    require(bytes.length >= 2 && bytes(0) == 'P' &&
      (bytes(1) == '6' || bytes(1) == '5'),
      "not a binary PPM/PGM payload")
    val channels = if (bytes(1) == '6') 3 else 1
    var i = 2
    def skipWs(): Unit = {
      var going = true
      while (going && i < bytes.length) {
        val c = bytes(i)
        if (c == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (c == ' ' || c == '\t' || c == '\r' || c == '\n') i += 1
        else going = false
      }
    }
    def readInt(): Int = {
      skipWs()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      require(any, s"malformed PNM header at byte $i")
      v
    }
    val width = readInt()
    val height = readInt()
    val maxval = readInt()
    require(maxval > 0 && maxval <= 255, s"PNM maxval $maxval unsupported")
    i += 1 // single whitespace after maxval
    val need = width.toLong * height * channels
    require(bytes.length - i >= need,
      s"truncated PNM: need $need pixel bytes, have ${bytes.length - i}")
    Image(width, height, channels,
      java.util.Arrays.copyOfRange(bytes, i, i + need.toInt))
  }

  /** Encode top-down RGB (channels=3 → P6) or gray (1 → P5). */
  def encodePnm(width: Int, height: Int, channels: Int,
      pixels: Array[Byte]): Array[Byte] = {
    require(channels == 1 || channels == 3, "channels must be 1 or 3")
    require(pixels.length == width * height * channels)
    val header = s"P${if (channels == 3) 6 else 5}\n$width $height\n255\n"
      .getBytes("US-ASCII")
    val out = new Array[Byte](header.length + pixels.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(pixels, 0, out, header.length, pixels.length)
    out
  }

  // ------------------------------------------------------------- WAV

  /** Decode RIFF/WAVE PCM (format 1), 8- or 16-bit. Chunks are walked
    * properly (fmt may be followed by LIST/fact before data). 16-bit
    * samples normalize by 32768, 8-bit are unsigned offset-128 by 128.
    */
  def decodeWav(bytes: Array[Byte]): Audio = {
    require(sniff(bytes).contains("wav"), "not a RIFF/WAVE payload")
    var i = 12
    var channels = 0
    var sampleRate = 0
    var bits = 0
    var data: Array[Byte] = null
    while (i + 8 <= bytes.length && (data == null || channels == 0)) {
      val id = new String(bytes, i, 4, "US-ASCII")
      val size = i32(bytes, i + 4)
      require(size >= 0 && i + 8 + size <= bytes.length,
        s"truncated WAV chunk $id at byte $i")
      id match {
        case "fmt " =>
          val fmt = u16(bytes, i + 8)
          require(fmt == 1, s"WAV format $fmt unsupported (PCM only)")
          channels = u16(bytes, i + 10)
          sampleRate = i32(bytes, i + 12)
          bits = u16(bytes, i + 22)
          require(bits == 8 || bits == 16, s"WAV bits=$bits unsupported")
        case "data" =>
          data = java.util.Arrays.copyOfRange(bytes, i + 8, i + 8 + size)
        case _ => // LIST/fact/...: skip
      }
      i += 8 + size + (size & 1) // chunks are word-aligned
    }
    require(channels > 0 && sampleRate > 0, "WAV fmt chunk missing")
    require(data != null, "WAV data chunk missing")
    val samples =
      if (bits == 16) {
        val n = data.length / 2
        val out = new Array[Double](n)
        var j = 0
        while (j < n) {
          out(j) = ((data(2 * j) & 0xFF) |
            (data(2 * j + 1) << 8)).toShort / 32768.0
          j += 1
        }
        out
      } else {
        val out = new Array[Double](data.length)
        var j = 0
        while (j < data.length) {
          out(j) = ((data(j) & 0xFF) - 128) / 128.0; j += 1
        }
        out
      }
    Audio(channels, sampleRate, samples)
  }

  /** Encode interleaved [-1, 1] samples as 16-bit PCM WAV. */
  def encodeWavPcm16(sampleRate: Int, channels: Int,
      samples: Array[Double]): Array[Byte] = {
    val dataSize = samples.length * 2
    val out = new Array[Byte](44 + dataSize)
    def w16(i: Int, v: Int): Unit = {
      out(i) = v.toByte; out(i + 1) = (v >> 8).toByte
    }
    def w32(i: Int, v: Int): Unit = {
      w16(i, v & 0xFFFF); w16(i + 2, (v >>> 16) & 0xFFFF)
    }
    def tag(i: Int, s: String): Unit =
      s.getBytes("US-ASCII").zipWithIndex.foreach { case (b, j) => out(i + j) = b }
    tag(0, "RIFF"); w32(4, 36 + dataSize); tag(8, "WAVE")
    tag(12, "fmt "); w32(16, 16); w16(20, 1); w16(22, channels)
    w32(24, sampleRate); w32(28, sampleRate * channels * 2)
    w16(32, channels * 2); w16(34, 16)
    tag(36, "data"); w32(40, dataSize)
    var j = 0
    while (j < samples.length) {
      val clamped = math.max(-1.0, math.min(1.0, samples(j)))
      val v = math.round(clamped * 32767.0).toInt
      w16(44 + 2 * j, v & 0xFFFF)
      j += 1
    }
    out
  }
}
