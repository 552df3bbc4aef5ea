package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

/** [[Bitstreams]]: MP3 frame-walk and H.264 SPS parsing pinned by exact
  * ROUND TRIPS against the in-repo encoders — frame counts, durations,
  * bitrates, dimensions (cropped and MB-aligned), emulation-prevention
  * escaping — plus loud None on non-media bytes. */
class BitstreamsSpec extends AnyFunSuite {

  test("MP3 CBR round trip: frames, duration, rate, channels, bitrate") {
    val bytes = Bitstreams.encodeMp3(frames = 50, brIdx = 9, srIdx = 0)
    val info = Bitstreams.parseMp3(bytes).get
    assert(info.frames == 50)
    assert(info.sampleRate == 44100)
    assert(info.channels == 2)
    assert(!info.vbr)
    assert(info.avgBitrateKbps == 128.0)
    // 50 frames × 1152 samples at 44.1 kHz, exactly
    assert(math.abs(info.durationMs - 50 * 1152 * 1000.0 / 44100) < 1e-9)
  }

  test("MP3: ID3v2 tag skipped; mono flag honored; other rates") {
    val tagged = Bitstreams.encodeMp3(frames = 7, brIdx = 4, srIdx = 2,
      mono = true, id3Pad = 133)
    val info = Bitstreams.parseMp3(tagged).get
    assert(info.frames == 7 && info.channels == 1 &&
      info.sampleRate == 32000 && info.avgBitrateKbps == 56.0)
  }

  test("MP3: VBR detected across bitrate changes; frame counts add") {
    val a = Bitstreams.encodeMp3(frames = 3, brIdx = 9)
    val b = Bitstreams.encodeMp3(frames = 2, brIdx = 14)
    val info = Bitstreams.parseMp3(a ++ b).get
    assert(info.frames == 5 && info.vbr)
    assert(math.abs(info.avgBitrateKbps - (3 * 128 + 2 * 320) / 5.0) < 1e-9)
  }

  test("MP3: non-MP3 bytes parse to None") {
    assert(Bitstreams.parseMp3("not audio at all".getBytes).isEmpty)
    assert(Bitstreams.parseMp3(Array[Byte]()).isEmpty)
    assert(Bitstreams.parseMp3(
      Codecs.encodeWavPcm16(8000, 1, Array(0.1, -0.1))).isEmpty)
  }

  test("H.264 SPS round trip: MB-aligned dimensions") {
    val info = Bitstreams.parseH264(
      Bitstreams.encodeH264(1280, 720, frames = 3)).get
    assert(info.profile == 66 && info.level == 30)
    assert(info.width == 1280 && info.height == 720 && info.frames == 3)
  }

  test("H.264 SPS round trip: cropped (non-multiple-of-16) dimensions") {
    Seq((640, 360), (100, 58), (1920, 1080), (2, 2)).foreach {
      case (w, h) =>
        val info = Bitstreams.parseH264(Bitstreams.encodeH264(w, h)).get
        assert(info.width == w && info.height == h, s"dims $w x $h")
    }
    intercept[IllegalArgumentException] {
      Bitstreams.encodeH264(101, 58) // odd width: no 4:2:0 crop unit
    }
  }

  test("H.264 emulation prevention: escape/unescape round-trips the " +
    "sequences a raw RBSP must not contain") {
    val rbsp = Array[Byte](0, 0, 0, 0, 1, 0, 0, 2, 0, 0, 3, 7, 0, 0)
    val escaped = Bitstreams.escapeRbsp(rbsp)
    // no 00 00 0x left unescaped
    (0 until escaped.length - 2).foreach { i =>
      assert(!(escaped(i) == 0 && escaped(i + 1) == 0 &&
        (escaped(i + 2) & 0xFF) <= 2), s"naked start-code-ish at $i")
    }
    assert(Bitstreams.unescapeRbsp(escaped).toSeq == rbsp.toSeq)
  }

  test("H.264: non-streams parse to None") {
    assert(Bitstreams.parseH264("plain text".getBytes).isEmpty)
    assert(Bitstreams.parseH264(Bitstreams.encodeMp3(2)).isEmpty)
  }
}
