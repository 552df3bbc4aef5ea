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
}
