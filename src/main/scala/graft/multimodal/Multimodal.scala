package graft.multimodal

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column handling: image/audio/video as opaque binary columns
  * with typed metadata, plus batch-shaped decode/feature plumbing.
  *
  * The decode step is REAL for the container formats a pure JVM can
  * parse: BMP/PPM/PGM via the from-first-principles parsers in
  * [[Codecs]], PNG and baseline JPEG via the JDK's own ImageIO readers
  * (java.desktop — PNG's inflate is java.util.zip, no native codec
  * libraries, headless-safe), and PCM WAV audio — all magic-byte
  * sniffed and golden-pinned in MultimodalSpec — via [[decodeMedia]]
  * over [[packDocsAsEncodedMedia]]'s genuinely-encoded corpus. Only
  * formats with no JVM decoder at all (MP3/H.264 video…) take
  * [[decodeStub]], the documented deterministic stand-in, which
  * [[decodeMedia]] falls back to for unrecognized payloads ("video" in
  * the fixture corpus).
  * Everything around either step — the schema, the per-partition batch
  * iteration (the Scala analogue of mapInPandas), the partitioning
  * story, the downstream aggregations — is identical and tested.
  */
object Multimodal {

  final case class MediaMeta(
      kind: String,          // image | audio | video
      width: Int,            // pixels (image/video) — 0 for audio
      height: Int,
      channels: Int,         // color channels / audio channels
      sampleRate: Int,       // Hz — 0 for image
      durationMs: Long)      // 0 for image

  final case class MediaRow(media_id: Long, meta: MediaMeta, payload: Array[Byte])

  final case class MediaFeatures(
      media_id: Long,
      kind: String,
      n_bytes: Long,
      features: Array[Double])

  /** Wrap the documents table as a deterministic media corpus: payload =
    * UTF-8 bytes standing in for encoded media, kind cycling by id, and
    * metadata derived from the payload size. Gives the multimodal path a
    * reproducible corpus at every scale factor. */
  def packDocsAsMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      val kind = (id % 3) match {
        case 0 => "image"
        case 1 => "audio"
        case _ => "video"
      }
      val meta = kind match {
        case "image" => MediaMeta(kind, 64 + (bytes.length % 64), 64, 3, 0, 0L)
        case "audio" => MediaMeta(kind, 0, 0, 2, 16000, bytes.length.toLong * 10)
        case _       => MediaMeta(kind, 128, 72, 3, 0, bytes.length.toLong * 5)
      }
      MediaRow(id, meta, bytes)
    }
  }

  /** Wrap the documents table as a corpus of GENUINELY ENCODED media:
    * image rows carry a real 24-bit BMP, PNG, or baseline JPEG whose
    * 8×8 RGB pixels derive deterministically from the text bytes, audio
    * rows a real 16-bit PCM WAV (samples from the text) or a real
    * MPEG-1 Layer III frame stream ([[Bitstreams.encodeMp3]] — genuine
    * frame syntax, silent payload), video rows a real Annex-B H.264
    * stream whose SPS encodes text-derived dimensions, and one route
    * keeps an opaque payload so [[decodeMedia]]'s honest fallback stays
    * exercised. The decode is then an actual byte-format parse — same
    * corpus determinism at every scale factor. */
  def packDocsAsEncodedMedia(docs: DataFrame): Dataset[MediaRow] = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select(col("doc_id"), col("text")).as[(Long, String)].map { case (id, text) =>
      val bytes = text.getBytes("UTF-8")
      def b(i: Int): Byte =
        if (bytes.isEmpty) (i * 37).toByte else bytes(i % bytes.length)
      def rgb = Array.tabulate(8 * 8 * 3)(b)
      (id % 7) match {
        case 0 =>
          MediaRow(id, MediaMeta("image", 8, 8, 3, 0, 0L),
            Codecs.encodeBmp24(8, 8, rgb))
        case 1 =>
          val n = math.min(math.max(bytes.length, 16), 256)
          val samples = Array.tabulate(n)(i => ((b(i) & 0xFF) - 128) / 128.0)
          MediaRow(id,
            MediaMeta("audio", 0, 0, 1, 8000, n.toLong * 1000 / 8000),
            Codecs.encodeWavPcm16(8000, 1, samples))
        case 2 =>
          MediaRow(id, MediaMeta("image", 8, 8, 3, 0, 0L),
            Codecs.encodePng(8, 8, rgb))
        case 3 =>
          MediaRow(id, MediaMeta("image", 8, 8, 3, 0, 0L),
            Codecs.encodeJpeg(8, 8, rgb))
        case 4 =>
          val frames = 2 + (id % 5).toInt
          MediaRow(id, MediaMeta("audio", 0, 0, 2, 44100,
            (frames * 1152 * 1000L) / 44100),
            Bitstreams.encodeMp3(frames, brIdx = 1 + (id % 14).toInt))
        case 5 =>
          val w = 128 + 2 * (id % 9).toInt // even: 4:2:0 crop units
          val h = 72 + 2 * (id % 5).toInt
          MediaRow(id, MediaMeta("video", w, h, 3, 0, 0L),
            Bitstreams.encodeH264(w, h, frames = 1 + (id % 3).toInt))
        case _ =>
          MediaRow(id, MediaMeta("video", 128, 72, 3, 0,
            bytes.length.toLong * 5), bytes)
      }
    }
  }

  /** REAL decode: sniff each payload's magic bytes and parse the
    * container ([[Codecs]]); fall back to the byte-histogram stub for
    * formats this environment cannot decode. Features are a normalized
    * 8-bin histogram in the sample-level modalities — luminance bins
    * for images (integer BT.601 luma), amplitude bins over [-1, 1] for
    * audio — so downstream consumers see one shape regardless of
    * modality or fallback. MP3 and H.264 are METADATA routes
    * ([[Bitstreams]]): the frame/NAL structure parses exactly (duration,
    * bitrate, rate, channels; profile, level, width, height, frames)
    * and lands in the same 8-slot feature vector, normalized to [0, 1]
    * scales — the pixels/samples themselves have no pure-JVM decoder
    * (the honest boundary). The output kind records the decode route:
    * `image/bmp`, `image/ppm`, `image/png`, `image/jpeg`, `audio/wav`,
    * `audio/mp3`, `video/h264`, or `<kind>/stub`. */
  def decodeMedia(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        val bs = m.payload
        Codecs.sniff(bs) match {
          case Some(fmt @ ("bmp" | "ppm" | "pgm" | "png" | "jpeg")) =>
            val img = fmt match {
              case "bmp" => Codecs.decodeBmp(bs)
              case "png" | "jpeg" => Codecs.decodeJdkImage(bs)
              case _ => Codecs.decodePnm(bs)
            }
            val hist = new Array[Long](8)
            val px = img.pixels
            var i = 0
            if (img.channels == 3) {
              while (i < px.length) {
                val luma = (299 * (px(i) & 0xFF) + 587 * (px(i + 1) & 0xFF) +
                  114 * (px(i + 2) & 0xFF)) / 1000
                hist(luma >> 5) += 1
                i += 3
              }
            } else {
              while (i < px.length) { hist((px(i) & 0xFF) >> 5) += 1; i += 1 }
            }
            val n = math.max(1, img.width * img.height)
            MediaFeatures(m.media_id, s"image/$fmt", bs.length.toLong,
              hist.map(_.toDouble / n))
          case Some("mp3") =>
            Bitstreams.parseMp3(bs) match {
              case Some(a) => MediaFeatures(m.media_id, "audio/mp3",
                bs.length.toLong, Array(
                  a.durationMs / 60000.0, a.sampleRate / 48000.0,
                  a.channels / 2.0, a.avgBitrateKbps / 320.0,
                  math.min(1.0, a.frames / 10000.0),
                  if (a.vbr) 1.0 else 0.0, 0.0, 0.0))
              case None => MediaFeatures(m.media_id, s"${m.meta.kind}/stub",
                bs.length.toLong, stubFeatures(bs))
            }
          case Some("h264") =>
            Bitstreams.parseH264(bs) match {
              case Some(v) => MediaFeatures(m.media_id, "video/h264",
                bs.length.toLong, Array(
                  v.width / 4096.0, v.height / 4096.0,
                  v.profile / 255.0, v.level / 255.0,
                  math.min(1.0, v.frames / 10000.0),
                  v.width.toDouble / math.max(1, v.height) / 4.0, 0.0, 0.0))
              case None => MediaFeatures(m.media_id, s"${m.meta.kind}/stub",
                bs.length.toLong, stubFeatures(bs))
            }
          case Some("wav") =>
            val audio = Codecs.decodeWav(bs)
            val hist = new Array[Long](8)
            var i = 0
            while (i < audio.samples.length) {
              val bin = math.min(7,
                math.max(0, ((audio.samples(i) + 1.0) * 4.0).toInt))
              hist(bin) += 1
              i += 1
            }
            val n = math.max(1, audio.samples.length)
            MediaFeatures(m.media_id, "audio/wav", bs.length.toLong,
              hist.map(_.toDouble / n))
          case _ =>
            val f = stubFeatures(bs)
            MediaFeatures(m.media_id, s"${m.meta.kind}/stub",
              bs.length.toLong, f)
        }
      }
    }
  }

  private def stubFeatures(bs: Array[Byte]): Array[Double] = {
    val n = bs.length.max(1)
    val hist = new Array[Long](8)
    var i = 0
    while (i < bs.length) { hist((bs(i) & 0xFF) >> 5) += 1; i += 1 }
    hist.map(_.toDouble / n)
  }

  /** STUB decoder — stands in for image decode / audio feature extraction.
    * Deterministic 8-dim feature: byte-histogram moments. Runs
    * per-partition over an iterator (the batch shape a vectorized decode
    * would use); replace the body with a real codec to productionize. */
  def decodeStub(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      // per-batch (partition) setup would open the codec once here
      rows.map { m =>
        MediaFeatures(m.media_id, m.meta.kind, m.payload.length.toLong,
          stubFeatures(m.payload))
      }
    }
  }

  /** STUB resize — stands in for image resampling. Treats the payload as a
    * meta.width × meta.height single-channel grid (padding with zeros when
    * the fake payload is short) and area-averages it down to tw × th;
    * emits the resized payload with corrected metadata. Rows WITHOUT a
    * pixel grid (audio: width = height = 0) pass through untouched —
    * clamping them to a 1×1 grid would replace the whole payload with
    * copies of its first byte and stamp image dimensions onto audio
    * metadata. Same per-partition batch shape as [[decodeStub]]; a real
    * implementation swaps only the pixel math for a codec +
    * interpolation kernel. */
  def resizeStub(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { m =>
        if (m.meta.width <= 0 || m.meta.height <= 0) m
        else resizeOne(m, tw, th)
      }
    }
  }

  private def resizeOne(m: MediaRow, tw: Int, th: Int): MediaRow = {
    val (w, h) = (m.meta.width, m.meta.height)
        def px(x: Int, y: Int): Int = {
          val idx = y * w + x
          if (idx < m.payload.length) m.payload(idx) & 0xFF else 0
        }
        val out = new Array[Byte](tw * th)
        var ty = 0
        while (ty < th) {
          var tx = 0
          while (tx < tw) {
            // area average over the source cell [x0,x1) × [y0,y1)
            val x0 = x0Of(tx, tw, w); val x1 = math.max(x0Of(tx + 1, tw, w), x0 + 1)
            val y0 = x0Of(ty, th, h); val y1 = math.max(x0Of(ty + 1, th, h), y0 + 1)
            var sum = 0L; var cnt = 0
            var y = y0
            while (y < y1) {
              var x = x0
              while (x < x1) { sum += px(x, y); cnt += 1; x += 1 }
              y += 1
            }
            out(ty * tw + tx) = (sum / cnt).toByte
            tx += 1
          }
          ty += 1
        }
        MediaRow(m.media_id, m.meta.copy(width = tw, height = th), out)
  }

  private def x0Of(t: Int, tDim: Int, sDim: Int): Int =
    ((t.toLong * sDim) / tDim).toInt

  /** Deterministic "frame sampling": take `n` evenly spaced byte windows of
    * `window` bytes from the payload (what real frame extraction would do
    * to a video stream, minus the codec). */
  def frameSample(media: Dataset[MediaRow], n: Int, window: Int): DataFrame = {
    val spark = media.sparkSession
    import spark.implicits._
    media.flatMap { m =>
      val len = m.payload.length
      if (len == 0) Seq.empty
      else (0 until n).map { f =>
        val start = (len.toLong * f / n).toInt
        val end = math.min(start + window, len)
        (m.media_id, f, java.util.Arrays.copyOfRange(m.payload, start, end))
      }
    }.toDF("media_id", "frame_no", "frame_bytes")
  }
}
