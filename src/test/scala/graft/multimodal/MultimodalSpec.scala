package graft.multimodal

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

class MultimodalSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def docs = Seq(
    (0L, "an image-ish payload with enough bytes to histogram"),
    (1L, "an audio-ish payload"),
    (2L, "a video-ish payload that is a bit longer than the audio one"))
    .toDF("doc_id", "text")

  test("packDocsAsMedia: kinds cycle, metadata typed and populated") {
    val media = Multimodal.packDocsAsMedia(docs).collect().sortBy(_.media_id)
    assert(media.map(_.meta.kind).toSeq == Seq("image", "audio", "video"))
    assert(media(0).meta.channels == 3 && media(0).meta.sampleRate == 0)
    assert(media(1).meta.sampleRate == 16000 && media(1).meta.durationMs > 0)
    assert(media.forall(_.payload.nonEmpty))
  }

  test("decodeStub: deterministic 8-dim normalized features") {
    val media = Multimodal.packDocsAsMedia(docs)
    val f1 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    val f2 = Multimodal.decodeStub(media).collect().sortBy(_.media_id)
    assert(f1.map(_.features.toSeq).toSeq == f2.map(_.features.toSeq).toSeq)
    f1.foreach { f =>
      assert(f.features.length == 8)
      assert(math.abs(f.features.sum - 1.0) < 1e-9) // histogram normalized
    }
  }

  test("frameSample: n evenly spaced windows per payload") {
    val media = Multimodal.packDocsAsMedia(docs)
    val frames = Multimodal.frameSample(media, n = 4, window = 8)
    assert(frames.count() == 12)
    val sizes = frames.select("frame_bytes").as[Array[Byte]].collect()
    assert(sizes.forall(b => b.length > 0 && b.length <= 8))
    val perDoc = frames.groupBy("media_id").count()
      .select("count").as[Long].collect().toSet
    assert(perDoc == Set(4L))
  }

  test("resizeStub: target dims, updated metadata, audio passes through") {
    val media = Multimodal.packDocsAsMedia(docs)
    val original = media.collect().map(m => m.media_id -> m).toMap
    val resized = Multimodal.resizeStub(media, tw = 8, th = 8).collect()
    assert(resized.nonEmpty)
    assert(resized.exists(_.meta.kind != "audio"))
    resized.foreach { m =>
      if (m.meta.kind == "audio") {
        // no pixel grid — resizing would destroy the payload
        assert(java.util.Arrays.equals(m.payload, original(m.media_id).payload))
        assert(m.meta == original(m.media_id).meta)
      } else {
        assert(m.payload.length == 64)
        assert(m.meta.width == 8 && m.meta.height == 8)
      }
    }
    // area-averaging a constant grid yields the constant
    import spark.implicits._
    val const = Seq(Multimodal.MediaRow(7L,
      Multimodal.MediaMeta("image", 16, 16, 1, 0, 0L),
      Array.fill(256)(42.toByte))).toDS()
    val out = Multimodal.resizeStub(const, 4, 4).collect().head
    assert(out.payload.forall(_ == 42.toByte))
    // deterministic: same input → same bytes
    val again = Multimodal.resizeStub(const, 4, 4).collect().head
    assert(java.util.Arrays.equals(out.payload, again.payload))
  }

  // ------------------------------------------------- real codecs

  test("BMP golden pixels: encode → decode round-trips exactly, " +
      "padding rows handled") {
    // 3×2 so each 24-bit row (9 bytes) needs 3 padding bytes
    val rgb = Array[Byte](
      255.toByte, 0, 0,   0, 255.toByte, 0,   0, 0, 255.toByte,
      10, 20, 30,         40, 50, 60,         70, 80, 90)
    val bmp = Codecs.encodeBmp24(3, 2, rgb)
    assert(bmp(0) == 'B' && bmp(1) == 'M')
    assert(Codecs.sniff(bmp).contains("bmp"))
    val img = Codecs.decodeBmp(bmp)
    assert(img.width == 3 && img.height == 2 && img.channels == 3)
    assert(java.util.Arrays.equals(img.pixels, rgb),
      "decoded pixels must equal the golden RGB grid")
    // a hand-built TOP-DOWN (negative height) BMP decodes to the same
    val neg = bmp.clone()
    // height field at offset 22: 2 → -2, and reorder the two pixel rows
    neg(22) = (-2).toByte; neg(23) = 0xFF.toByte
    neg(24) = 0xFF.toByte; neg(25) = 0xFF.toByte
    val rowSize = 12
    val r0 = java.util.Arrays.copyOfRange(bmp, 54, 54 + rowSize)
    val r1 = java.util.Arrays.copyOfRange(bmp, 54 + rowSize, 54 + 2 * rowSize)
    System.arraycopy(r1, 0, neg, 54, rowSize)
    System.arraycopy(r0, 0, neg, 54 + rowSize, rowSize)
    assert(java.util.Arrays.equals(Codecs.decodeBmp(neg).pixels, rgb))
    // truncated payload fails loudly
    val e = intercept[IllegalArgumentException] {
      Codecs.decodeBmp(java.util.Arrays.copyOfRange(bmp, 0, 60))
    }
    assert(e.getMessage.contains("truncated"))
  }

  test("PPM/PGM golden pixels incl. header comments") {
    val rgb = Array[Byte](1, 2, 3, 4, 5, 6)
    val ppm = Codecs.encodePnm(2, 1, 3, rgb)
    assert(Codecs.sniff(ppm).contains("ppm"))
    val img = Codecs.decodePnm(ppm)
    assert(img.width == 2 && img.height == 1 && img.channels == 3)
    assert(java.util.Arrays.equals(img.pixels, rgb))
    // a commented header, as real netpbm tools emit
    val commented = ("P5\n# made by hand\n2 2\n255\n").getBytes("US-ASCII") ++
      Array[Byte](9, 8, 7, 6)
    val gray = Codecs.decodePnm(commented)
    assert(gray.channels == 1 && gray.width == 2 && gray.height == 2)
    assert(gray.pixels.toSeq == Seq[Byte](9, 8, 7, 6))
  }

  test("WAV golden samples: 16-bit PCM round-trip, chunk walking") {
    val samples = Array(-1.0, -0.5, 0.0, 0.5, 1.0, 0.25)
    val wav = Codecs.encodeWavPcm16(8000, 2, samples)
    assert(Codecs.sniff(wav).contains("wav"))
    val audio = Codecs.decodeWav(wav)
    assert(audio.channels == 2 && audio.sampleRate == 8000)
    assert(audio.samples.length == samples.length)
    // 16-bit quantization: exact to 1/32768
    samples.zip(audio.samples).foreach { case (want, got) =>
      assert(math.abs(want - got) <= 1.0 / 32768.0, s"$want vs $got")
    }
    // golden: -1.0 clamps to -32767 (encoder clamp), 0.0 is exactly 0
    assert(audio.samples(2) == 0.0)
    // non-PCM payload fails loudly
    val bad = wav.clone(); bad(20) = 3 // format = IEEE float
    val e = intercept[IllegalArgumentException] { Codecs.decodeWav(bad) }
    assert(e.getMessage.contains("PCM"))
  }

  private def encDocs = Seq(
    (0L, "an image-ish payload with enough bytes to histogram"),
    (1L, "an audio-ish payload"),
    (2L, "a png payload — lossless, golden-pinned below"),
    (3L, "a jpeg payload — lossy, dimensions + histogram shape pinned"),
    (4L, "an mp3 payload — frame-walked metadata route"),
    (5L, "an h264 payload — SPS-parsed metadata route"),
    (6L, "an opaque payload that takes the documented stub"))
    .toDF("doc_id", "text")

  test("decodeMedia: real decode routes for BMP, WAV, PNG, JPEG; stub " +
      "fallback for opaque payloads") {
    val media = Multimodal.packDocsAsEncodedMedia(encDocs)
    val feats = Multimodal.decodeMedia(media).collect().sortBy(_.media_id)
    assert(feats.map(_.kind).toSeq ==
      Seq("image/bmp", "audio/wav", "image/png", "image/jpeg",
        "audio/mp3", "video/h264", "video/stub"))
    // sample-level routes: the features vector is a normalized 8-bin
    // histogram; metadata routes carry exact parsed fields instead
    feats.foreach { f =>
      assert(f.features.length == 8)
      if (f.kind != "audio/mp3" && f.kind != "video/h264")
        assert(math.abs(f.features.sum - 1.0) < 1e-9,
          s"${f.kind}: histogram must sum to 1, got ${f.features.sum}")
    }
    // mp3 metadata: id=4 packs 6 frames at bitrate index 5 (64 kbps),
    // 44.1 kHz stereo — duration and bitrate parse EXACTLY
    val mp3 = feats(4).features
    assert(math.abs(mp3(0) - 6 * 1152 * 1000.0 / 44100 / 60000.0) < 1e-12)
    assert(mp3(1) == 44100 / 48000.0 && mp3(2) == 1.0)
    assert(mp3(3) == 64 / 320.0 && mp3(5) == 0.0, "CBR, 64 kbps")
    // h264 metadata: id=5 packs a 138x72 SPS with 3 IDR frames
    val h264 = feats(5).features
    assert(h264(0) == 138 / 4096.0 && h264(1) == 72 / 4096.0,
      s"SPS dims must parse exactly: ${h264.toSeq}")
    assert(h264(2) == 66 / 255.0 && h264(3) == 30 / 255.0)
    assert(h264(4) == 3 / 10000.0)
    // the image routes really parsed the bytes: each histogram is the
    // luma histogram of the decoded pixels, recomputed independently
    def lumaHist(img: Codecs.Image): Seq[Double] = {
      val hist = new Array[Long](8)
      img.pixels.grouped(3).foreach { p =>
        val luma = (299 * (p(0) & 0xFF) + 587 * (p(1) & 0xFF) +
          114 * (p(2) & 0xFF)) / 1000
        hist(luma >> 5) += 1
      }
      hist.map(_.toDouble / (img.width * img.height)).toSeq
    }
    val rows = Multimodal.packDocsAsEncodedMedia(encDocs)
      .collect().sortBy(_.media_id)
    assert(feats(0).features.toSeq == lumaHist(Codecs.decodeBmp(rows(0).payload)))
    // PNG is lossless: the decoded pixels ARE the source pixels — the
    // route's histogram must match the BMP of the same source bytes
    val png = Codecs.decodeJdkImage(rows(2).payload)
    assert(png.width == 8 && png.height == 8 && png.channels == 3)
    assert(feats(2).features.toSeq == lumaHist(png))
    // JPEG is lossy: pin dimensions + the recomputed decoded histogram
    val jpg = Codecs.decodeJdkImage(rows(3).payload)
    assert(jpg.width == 8 && jpg.height == 8)
    assert(feats(3).features.toSeq == lumaHist(jpg))
  }

  test("PNG round-trips losslessly through encode + ImageIO decode") {
    val rgb = Array.tabulate(8 * 8 * 3)(i => ((i * 31) % 251).toByte)
    val back = Codecs.decodeJdkImage(Codecs.encodePng(8, 8, rgb))
    assert(back.pixels.toSeq == rgb.toSeq, "PNG must be bit-lossless")
    // and the sniffer routes both new formats
    assert(Codecs.sniff(Codecs.encodePng(8, 8, rgb)).contains("png"))
    assert(Codecs.sniff(Codecs.encodeJpeg(8, 8, rgb)).contains("jpeg"))
  }
}
