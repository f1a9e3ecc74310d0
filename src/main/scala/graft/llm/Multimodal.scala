package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north_star).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run as partition-wise
  * batch transforms (`mapPartitions` over a typed Dataset — the Scala
  * analogue of `mapInPandas` batches). The actual codec calls are
  * STUBBED with a deterministic fake (image/audio libraries are not in
  * this environment); everything Spark-side — schema, batching,
  * partitioning, output shape — is real and tested, so a real decoder
  * drops into [[decodeStub]] without touching the plan.
  *
  * Scale notes: payload bytes never enter a shuffle — features are
  * extracted in the same stage as the scan and only the (small) feature
  * vectors flow downstream; media tables should be size-partitioned
  * (`maxPartitionBytes`) rather than row-count partitioned.
  */
object Multimodal {

  final case class MediaMeta(kind: String, width: Int, height: Int, sampleRate: Int)
  final case class MediaRow(media_id: Long, payload: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(media_id: Long, kind: String, byte_len: Long,
      features: Array[Float])

  /** Deterministic fake media table derived from the documents fixture:
    * payload = UTF-8 bytes of the text (stands in for encoded media),
    * metadata derived from stable columns. */
  def mediaTable(docs: DataFrame): DataFrame =
    docs.select(
      col("doc_id").as("media_id"),
      col("text").cast("binary").as("payload"),
      struct(
        when(col("doc_id") % 3 === 0, "image")
          .when(col("doc_id") % 3 === 1, "audio")
          .otherwise("video").as("kind"),
        (col("n_chars") % 640).cast("int").as("width"),
        (col("n_chars") % 480).cast("int").as("height"),
        lit(16000).as("sampleRate")).as("meta"))

  /** ??? real decoder goes here for AUDIO/VIDEO — STUB: a
    * deterministic 8-bin byte histogram normalized to [0,1], shaped
    * exactly like a feature extractor (batch in → fixed-width
    * Array[Float] out). IMAGES are no longer stubbed: PNG/JPEG payloads
    * take the real [[decodePixels]] path (JDK javax.imageio — no
    * external codec libs needed). */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    if (payload == null || payload.isEmpty) return bins
    payload.foreach(b => bins((b & 0xFF) / 32) += 1f)
    bins.map(_ / payload.length)
  }

  // ------------------------------------------------------- real images

  /** PNG magic (8 bytes) / JPEG SOI — payload sniffing so mixed media
    * tables route image rows to the real decoder. */
  def looksLikeImage(payload: Array[Byte]): Boolean =
    payload != null && payload.length > 8 &&
      ((payload(0) == 0x89.toByte && payload(1) == 'P' && payload(2) == 'N'
        && payload(3) == 'G') ||
       (payload(0) == 0xFF.toByte && payload(1) == 0xD8.toByte))

  /** REAL image decode: payload bytes → (width, height, 8-bin luminance
    * histogram counts). Runs per-partition inside the scan stage; only
    * these few dozen bytes of features flow downstream, never pixels. */
  def decodePixels(payload: Array[Byte]): (Int, Int, Array[Long]) = {
    val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(payload))
    require(img != null, "undecodable image payload")
    val hist = new Array[Long](8)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        // low byte of the packed pixel; for the grayscale fixtures this
        // IS the luminance. 256/8 = 32 values per bin.
        hist((img.getRGB(x, y) & 0xFF) / 32) += 1
        x += 1
      }
      y += 1
    }
    (img.getWidth, img.getHeight, hist)
  }

  /** Image feature vector off the real decode: normalized luminance
    * histogram (same 8-float shape as the audio/video stub, so mixed
    * tables keep one schema). */
  def imageFeatures(payload: Array[Byte]): Array[Float] = {
    val (w, h, hist) = decodePixels(payload)
    val n = (w.toLong * h).toFloat
    hist.map(_ / n)
  }

  /** Partition-wise decode/feature-extract over typed batches. Image
    * payloads (sniffed by magic bytes) take the REAL javax.imageio
    * decode; audio/video fall back to the documented stub. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would open the real audio/video codecs once here
      rows.map { r =>
        val feats =
          if (looksLikeImage(r.payload)) imageFeatures(r.payload)
          else if (looksLikeWav(r.payload)) audioFeatures(r.payload)
          else fakeDecodeFeatures(r.payload)
        MediaFeatures(r.media_id, r.meta.kind,
          if (r.payload == null) 0L else r.payload.length.toLong, feats)
      }
    }
  }

  /** RIFF/WAVE magic — route audio rows to the real PCM decoder. */
  def looksLikeWav(payload: Array[Byte]): Boolean =
    payload != null && payload.length > 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'W' && payload(9) == 'A'

  /** REAL audio decode (JDK javax.sound.sampled — WAV/PCM needs no
    * external codec): payload bytes → (sampleRate, frames, 8-bin
    * amplitude histogram over signed 16-bit samples). */
  def decodeSamples(payload: Array[Byte]): (Int, Long, Array[Long]) = {
    val in = javax.sound.sampled.AudioSystem.getAudioInputStream(
      new java.io.ByteArrayInputStream(payload))
    val fmt = in.getFormat
    require(fmt.getSampleSizeInBits == 16, "expect 16-bit PCM")
    val bytes = in.readAllBytes()
    val hist = new Array[Long](8)
    var i = 0
    while (i + 1 < bytes.length) {
      // little-endian signed 16-bit; bin width 65536/8 = 8192
      val s = ((bytes(i) & 0xFF) | (bytes(i + 1) << 8)).toShort.toInt
      hist((s + 32768) / 8192) += 1
      i += 2
    }
    (fmt.getSampleRate.toInt, in.getFrameLength, hist)
  }

  /** Audio feature vector off the real decode: normalized amplitude
    * histogram (same 8-float shape as the other extractors). */
  def audioFeatures(payload: Array[Byte]): Array[Float] = {
    val (_, frames, hist) = decodeSamples(payload)
    hist.map(_ / math.max(frames, 1L).toFloat)
  }

  final case class AudioRow(media_id: Long, payload: Array[Byte])
  final case class AudioFeatures(media_id: Long, sample_rate: Int,
      n_frames: Long, hist: Array[Long])

  /** Deterministic WAV corpus: one mono 16-bit PCM clip per document,
    * sample s(id, t) = ((id·31 + t·7) mod 65536) − 32768, length
    * 400 + id mod 100 frames at 8 kHz — encoded with the JDK's real
    * WAV writer, so decoding is a true codec round-trip while every
    * sample is SQL-recomputable arithmetic (PCM is lossless). */
  def wavAudioTable(docs: DataFrame): Dataset[AudioRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val n = 400 + (id % 100).toInt
        val pcm = new Array[Byte](n * 2)
        var t = 0
        while (t < n) {
          val s = (((id * 31 + t * 7) % 65536) - 32768).toInt
          pcm(2 * t) = (s & 0xFF).toByte
          pcm(2 * t + 1) = ((s >> 8) & 0xFF).toByte
          t += 1
        }
        val fmt = new javax.sound.sampled.AudioFormat(8000f, 16, 1, true, false)
        val ais = new javax.sound.sampled.AudioInputStream(
          new java.io.ByteArrayInputStream(pcm), fmt, n.toLong)
        val bos = new java.io.ByteArrayOutputStream()
        javax.sound.sampled.AudioSystem.write(ais,
          javax.sound.sampled.AudioFileFormat.Type.WAVE, bos)
        AudioRow(id, bos.toByteArray)
      }
    }
  }

  /** Real decode over the audio table — sampleRate/frames/histogram
    * come from AudioSystem reading the WAV BYTES, not the formula. */
  def decodeAudioFeatures(audio: Dataset[AudioRow]): Dataset[AudioFeatures] = {
    import audio.sparkSession.implicits._
    audio.mapPartitions { rows =>
      rows.map { r =>
        val (rate, frames, hist) = decodeSamples(r.payload)
        AudioFeatures(r.media_id, rate, frames, hist)
      }
    }
  }

  final case class ImageRow(media_id: Long, payload: Array[Byte])
  final case class ImageFeatures(media_id: Long, width: Int, height: Int,
      hist: Array[Long])

  /** Deterministic PNG corpus: one grayscale image per document, pixel
    * gray(id, x, y) = (id·31 + x·7 + y·13) mod 256, size 8+id%9 ×
    * 8+id%7. Encoded with the JDK's real PNG writer — so decoding it
    * back is a REAL codec round-trip, while every pixel is pure integer
    * arithmetic a SQL oracle can recompute without any image library
    * (PNG is lossless; the equality is exact). */
  def pngImageTable(docs: DataFrame): Dataset[ImageRow] = {
    import docs.sparkSession.implicits._
    docs.select(col("doc_id")).as[Long].mapPartitions { ids =>
      ids.map { id =>
        val w = 8 + (id % 9).toInt
        val h = 8 + (id % 7).toInt
        val img = new java.awt.image.BufferedImage(w, h,
          java.awt.image.BufferedImage.TYPE_INT_RGB)
        var y = 0
        while (y < h) {
          var x = 0
          while (x < w) {
            val g = ((id * 31 + x * 7 + y * 13) % 256).toInt
            img.setRGB(x, y, (g << 16) | (g << 8) | g)
            x += 1
          }
          y += 1
        }
        val bos = new java.io.ByteArrayOutputStream()
        javax.imageio.ImageIO.write(img, "png", bos)
        ImageRow(id, bos.toByteArray)
      }
    }
  }

  /** Real decode over the image table: width/height/histogram come
    * from ImageIO reading the PNG bytes, NOT from the generator
    * formula — the oracle recomputes the formula in SQL and the
    * hash-compare proves the decode. */
  def decodeImageFeatures(imgs: Dataset[ImageRow]): Dataset[ImageFeatures] = {
    import imgs.sparkSession.implicits._
    imgs.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, hist) = decodePixels(r.payload)
        ImageFeatures(r.media_id, w, h, hist)
      }
    }
  }

  /** Frame sampling: every `stride`-th byte-offset marks a fake frame
    * boundary (a real impl samples keyframes); pure Column ops. */
  def frameOffsets(payload: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        greatest(floor((length(payload) - 1) / stride).cast("int"), lit(0))),
      i => i * stride)

  /** ??? real resampler goes here — STUB: nearest-neighbor byte
    * selection to exactly targetW·targetH bytes (deterministic), shaped
    * like an image resize (payload in → fixed-size payload out, meta
    * dimensions rewritten). The Spark plumbing is the real part:
    * partition-wise typed batches, one codec init per partition, output
    * schema identical to the input table so resize composes with every
    * other media op. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val n = targetW * targetH
    media.mapPartitions { rows =>
      // per-partition init would configure the real resampler once here
      rows.map { r =>
        val src = if (r.payload == null) Array.emptyByteArray else r.payload
        val out = new Array[Byte](n)
        if (src.nonEmpty) {
          var i = 0
          while (i < n) { out(i) = src((i.toLong * src.length / n).toInt); i += 1 }
        }
        MediaRow(r.media_id, out,
          r.meta.copy(width = targetW, height = targetH))
      }
    }
  }
}
