package graft.multimodal

/** Pure-JVM MPEG audio (MP3) and H.264 bitstream METADATA parsers —
  * the round-11 shrink of the last multimodal stub. No JVM library
  * decodes MP3 PCM or H.264 pixels, so full decode stays out of scope
  * (the honest floor, SCALE.md round-10 part 3) — but the container
  * STRUCTURE is plain bit syntax, and the metadata a pipeline actually
  * filters on (duration, bitrate, sample rate, channels; width,
  * height, profile, frame count) parses exactly from it:
  *
  *  - MP3: walk the MPEG frame headers (11-bit sync, version/layer/
  *    bitrate/samplerate/padding fields, ID3v2 skip) — frame count,
  *    exact duration, CBR/VBR detection, average bitrate. ISO/IEC
  *    11172-3 frame math: len = 144·bitrate/sampleRate + padding
  *    (MPEG-1 L3; 72· for MPEG-2/2.5).
  *  - H.264: find NAL units in an Annex-B stream, strip emulation-
  *    prevention bytes, exp-Golomb-parse the SPS (ITU-T H.264 §7.3.2.1,
  *    high-profile chroma/scaling-list sections included) — profile,
  *    level, exact cropped width/height — and count slice NALs as
  *    frames.
  *
  * Both sides of each format are implemented (a synthetic encoder and
  * the parser), so the specs pin exact round-trips, not just
  * smoke-parses. Everything is per-row scalar work — embarrassingly
  * parallel inside mapPartitions at any corpus size. */
object Bitstreams {

  // ------------------------------------------------------------- MP3

  final case class Mp3Info(
      frames: Int, durationMs: Double, sampleRate: Int, channels: Int,
      avgBitrateKbps: Double, vbr: Boolean)

  private val BitrateV1L3 =
    Array(0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320)
  private val BitrateV2L3 =
    Array(0, 8, 16, 24, 32, 40, 48, 56, 64, 80, 96, 112, 128, 144, 160)
  private val RateV1 = Array(44100, 48000, 32000)
  private val RateV2 = Array(22050, 24000, 16000)
  private val RateV25 = Array(11025, 12000, 8000)

  /** Parse an MPEG-1/2/2.5 Layer III stream: ID3v2 tag skipped, every
    * frame header validated and stepped exactly. Returns None when no
    * valid frame sequence exists (not an MP3). */
  def parseMp3(bytes: Array[Byte]): Option[Mp3Info] = {
    var i = 0
    // ID3v2: "ID3" + version(2) + flags(1) + synchsafe size(4)
    if (bytes.length >= 10 && bytes(0) == 'I' && bytes(1) == 'D' &&
      bytes(2) == '3') {
      val size = ((bytes(6) & 0x7F) << 21) | ((bytes(7) & 0x7F) << 14) |
        ((bytes(8) & 0x7F) << 7) | (bytes(9) & 0x7F)
      i = 10 + size
    }
    var frames = 0
    var durationMs = 0.0
    var sr = 0
    var ch = 0
    var brSum = 0L
    var brFirst = -1
    var vbr = false
    while (i + 4 <= bytes.length) {
      val b1 = bytes(i) & 0xFF; val b2 = bytes(i + 1) & 0xFF
      val b3 = bytes(i + 2) & 0xFF; val b4 = bytes(i + 3) & 0xFF
      if (b1 != 0xFF || (b2 & 0xE0) != 0xE0) {
        // past the last frame (tag padding) or not a frame — stop
        i = bytes.length
      } else {
        val version = (b2 >> 3) & 3 // 0=2.5, 2=MPEG2, 3=MPEG1
        val layer = (b2 >> 1) & 3 // 1 = Layer III
        val brIdx = (b3 >> 4) & 15
        val srIdx = (b3 >> 2) & 3
        val padding = (b3 >> 1) & 1
        val mode = (b4 >> 6) & 3
        if (version == 1 || layer != 1 || brIdx == 0 || brIdx == 15 ||
          srIdx == 3) return None // reserved/invalid header mid-stream
        val mpeg1 = version == 3
        val kbps = (if (mpeg1) BitrateV1L3 else BitrateV2L3)(brIdx)
        val rate = (version match {
          case 3 => RateV1
          case 2 => RateV2
          case _ => RateV25
        })(srIdx)
        val samples = if (mpeg1) 1152 else 576
        val len = samples / 8 * kbps * 1000 / rate + padding
        if (len <= 4 || i + len > bytes.length)
          return (if (frames > 0) Some(Mp3Info(frames, durationMs, sr, ch,
            brSum.toDouble / frames, vbr)) else None)
        frames += 1
        durationMs += samples * 1000.0 / rate
        sr = rate
        ch = if (mode == 3) 1 else 2
        if (brFirst < 0) brFirst = kbps else if (kbps != brFirst) vbr = true
        brSum += kbps
        i += len
      }
    }
    if (frames == 0) None
    else Some(Mp3Info(frames, durationMs, sr, ch,
      brSum.toDouble / frames, vbr))
  }

  /** Synthetic CBR MPEG-1 Layer III stream: `frames` frames of valid
    * headers + zero payload (a decoder renders silence; the FRAME
    * SYNTAX is genuine 11172-3). brIdx/srIdx choose bitrate/rate. */
  def encodeMp3(frames: Int, brIdx: Int = 9, srIdx: Int = 0,
      mono: Boolean = false, id3Pad: Int = 0): Array[Byte] = {
    require(brIdx >= 1 && brIdx <= 14 && srIdx >= 0 && srIdx <= 2)
    val kbps = BitrateV1L3(brIdx); val rate = RateV1(srIdx)
    val len = 144 * kbps * 1000 / rate // no padding bit
    val out = new java.io.ByteArrayOutputStream()
    if (id3Pad > 0) {
      out.write(Array[Byte]('I', 'D', '3', 4, 0, 0)) // v2.4, no flags
      out.write(Array[Byte](((id3Pad >> 21) & 0x7F).toByte,
        ((id3Pad >> 14) & 0x7F).toByte, ((id3Pad >> 7) & 0x7F).toByte,
        (id3Pad & 0x7F).toByte))
      out.write(new Array[Byte](id3Pad))
    }
    val frame = new Array[Byte](len)
    frame(0) = 0xFF.toByte
    frame(1) = 0xFB.toByte // MPEG1, Layer III, no CRC
    frame(2) = ((brIdx << 4) | (srIdx << 2)).toByte // no padding
    frame(3) = (if (mono) 0xC0 else 0x00).toByte
    (0 until frames).foreach(_ => out.write(frame))
    out.toByteArray
  }

  // ----------------------------------------------------------- H.264

  final case class H264Info(
      profile: Int, level: Int, width: Int, height: Int, frames: Int)

  private final class BitReader(bytes: Array[Byte]) {
    private var pos = 0
    def u(n: Int): Int = {
      var v = 0
      var k = n
      while (k > 0) {
        v = (v << 1) | ((bytes(pos >> 3) >> (7 - (pos & 7))) & 1)
        pos += 1; k -= 1
      }
      v
    }
    def ue(): Int = {
      var zeros = 0
      while (u(1) == 0 && zeros < 32) zeros += 1
      if (zeros == 0) 0 else ((1 << zeros) - 1) + u(zeros)
    }
    def se(): Int = {
      val k = ue()
      if (k % 2 == 0) -(k / 2) else (k + 1) / 2
    }
  }

  /** Strip H.264 emulation-prevention bytes (00 00 03 xx → 00 00 xx). */
  private[multimodal] def unescapeRbsp(nal: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(nal.length)
    var i = 0
    var zeros = 0
    while (i < nal.length) {
      val b = nal(i)
      if (zeros >= 2 && b == 3) zeros = 0 // drop the EP byte
      else {
        out.write(b)
        zeros = if (b == 0) zeros + 1 else 0
      }
      i += 1
    }
    out.toByteArray
  }

  private def skipScalingList(r: BitReader, size: Int): Unit = {
    var lastScale = 8; var nextScale = 8
    var j = 0
    while (j < size) {
      if (nextScale != 0) nextScale = (lastScale + r.se() + 256) % 256
      lastScale = if (nextScale == 0) lastScale else nextScale
      j += 1
    }
  }

  /** Parse the SPS (+ count slice NALs as frames) of an Annex-B H.264
    * byte stream. Handles baseline through high profiles including the
    * chroma/bit-depth/scaling-list section and frame cropping. */
  def parseH264(bytes: Array[Byte]): Option[H264Info] = {
    // split on start codes (00 00 01 / 00 00 00 01)
    val nals = scala.collection.mutable.ArrayBuffer[Array[Byte]]()
    var i = 0
    var start = -1
    while (i + 3 <= bytes.length) {
      if (bytes(i) == 0 && bytes(i + 1) == 0 && bytes(i + 2) == 1) {
        if (start >= 0) {
          val end = if (i > 0 && bytes(i - 1) == 0) i - 1 else i
          nals += bytes.slice(start, end)
        }
        start = i + 3
        i += 3
      } else i += 1
    }
    if (start >= 0 && start < bytes.length)
      nals += bytes.slice(start, bytes.length)
    if (nals.isEmpty) return None
    var info: Option[H264Info] = None
    var frames = 0
    nals.foreach { nal =>
      if (nal.nonEmpty) (nal(0) & 0x1F) match {
        case 7 => // SPS
          val r = new BitReader(unescapeRbsp(nal.drop(1)))
          val profile = r.u(8)
          r.u(8) // constraint flags + reserved
          val level = r.u(8)
          r.ue() // sps id
          var chroma = 1 // default 4:2:0
          var separate = 0
          if (Set(100, 110, 122, 244, 44, 83, 86, 118, 128, 138, 139,
            134, 135).contains(profile)) {
            chroma = r.ue()
            if (chroma == 3) separate = r.u(1)
            r.ue(); r.ue() // bit depths
            r.u(1) // qpprime
            if (r.u(1) == 1) { // scaling matrix
              val n = if (chroma != 3) 8 else 12
              (0 until n).foreach { k =>
                if (r.u(1) == 1) skipScalingList(r, if (k < 6) 16 else 64)
              }
            }
          }
          r.ue() // log2_max_frame_num_minus4
          r.ue() match { // pic_order_cnt_type
            case 0 => r.ue()
            case 1 =>
              r.u(1); r.se(); r.se()
              (0 until r.ue()).foreach(_ => r.se())
            case _ =>
          }
          r.ue() // max_num_ref_frames
          r.u(1) // gaps allowed
          val mbW = r.ue() + 1
          val mapH = r.ue() + 1
          val frameMbsOnly = r.u(1)
          if (frameMbsOnly == 0) r.u(1) // mb_adaptive
          r.u(1) // direct_8x8
          var (cl, cr, ct, cb) = (0, 0, 0, 0)
          if (r.u(1) == 1) { // frame cropping
            cl = r.ue(); cr = r.ue(); ct = r.ue(); cb = r.ue()
          }
          val chromaArray = if (separate == 1) 0 else chroma
          val cropX = if (chromaArray == 0 || chromaArray == 3) 1 else 2
          val cropY = (if (chromaArray == 1) 2 else 1) * (2 - frameMbsOnly)
          val w = mbW * 16 - cropX * (cl + cr)
          val h = (2 - frameMbsOnly) * mapH * 16 - cropY * (ct + cb)
          info = Some(H264Info(profile, level, w, h, 0))
        case 1 | 5 => frames += 1 // coded slice (non-IDR | IDR)
        case _ =>
      }
    }
    info.map(_.copy(frames = frames))
  }

  private final class BitWriter {
    private val out = scala.collection.mutable.ArrayBuffer[Byte]()
    private var cur = 0
    private var nbits = 0
    def u(n: Int, v: Int): Unit = {
      var k = n - 1
      while (k >= 0) {
        cur = (cur << 1) | ((v >> k) & 1)
        nbits += 1
        if (nbits == 8) { out += cur.toByte; cur = 0; nbits = 0 }
        k -= 1
      }
    }
    def ue(v: Int): Unit = {
      val code = v + 1
      val bits = 32 - Integer.numberOfLeadingZeros(code)
      u(bits - 1, 0)
      u(bits, code)
    }
    def rbspTrailing(): Array[Byte] = {
      u(1, 1)
      if (nbits != 0) u(8 - nbits, 0)
      out.toArray
    }
  }

  /** Apply H.264 emulation prevention: 00 00 {00,01,02,03} → escape. */
  private[multimodal] def escapeRbsp(rbsp: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(rbsp.length)
    var zeros = 0
    rbsp.foreach { b =>
      if (zeros >= 2 && (b & 0xFF) <= 3) { out.write(3); zeros = 0 }
      out.write(b)
      zeros = if (b == 0) zeros + 1 else 0
    }
    out.toByteArray
  }

  /** Synthetic Annex-B H.264 stream: a genuine constrained-baseline SPS
    * encoding exactly (width, height) — cropping emitted when not
    * MB-aligned; even dims required by 4:2:0 crop units — plus `frames`
    * stub IDR NALs. Decoders can parse the SPS; there are no real
    * coded pixels (the honest boundary). */
  def encodeH264(width: Int, height: Int, frames: Int = 1): Array[Byte] = {
    require(width > 0 && height > 0 && width % 2 == 0 && height % 2 == 0,
      "encodeH264 needs positive even dimensions (4:2:0 crop units)")
    val mbW = (width + 15) / 16
    val mapH = (height + 15) / 16
    val w = new BitWriter
    w.u(8, 66) // profile_idc: constrained baseline
    w.u(8, 0xC0) // constraint_set0/1
    w.u(8, 30) // level 3.0
    w.ue(0) // sps id
    w.ue(0) // log2_max_frame_num_minus4
    w.ue(0) // pic_order_cnt_type = 0
    w.ue(0) // log2_max_pic_order_cnt_lsb_minus4
    w.ue(1) // max_num_ref_frames
    w.u(1, 0) // gaps
    w.ue(mbW - 1)
    w.ue(mapH - 1)
    w.u(1, 1) // frame_mbs_only
    w.u(1, 1) // direct_8x8
    val cropR = (mbW * 16 - width) / 2
    val cropB = (mapH * 16 - height) / 2
    if (cropR > 0 || cropB > 0) {
      w.u(1, 1); w.ue(0); w.ue(cropR); w.ue(0); w.ue(cropB)
    } else w.u(1, 0)
    w.u(1, 0) // no VUI
    val sps = escapeRbsp(w.rbspTrailing())
    val out = new java.io.ByteArrayOutputStream()
    val start = Array[Byte](0, 0, 0, 1)
    out.write(start); out.write(0x67); out.write(sps)
    (0 until frames).foreach { f =>
      out.write(start)
      out.write(0x65) // IDR slice NAL header
      out.write(Array[Byte]((0x88 + (f % 8)).toByte, 0x84.toByte, 0x21))
    }
    out.toByteArray
  }
}
