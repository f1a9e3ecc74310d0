package graft.llm

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing (BASELINE.json north_star).
  *
  * Media payloads are opaque `binary` columns with a typed metadata
  * struct; decode / feature-extract / frame-sample run as partition-wise
  * batch transforms (`mapPartitions` over a typed Dataset — the Scala
  * analogue of `mapInPandas` batches). All three media kinds decode for
  * real with zero external deps: images via the JDK's javax.imageio
  * (PNG/JPEG), audio via javax.sound (WAV/PCM), video via a RIFF/AVI
  * demuxer over uncompressed DIB frames built from the public AVI spec
  * (the JDK has no video codec). Unrecognized payloads fall back to a
  * deterministic byte-histogram fake so mixed tables never throw.
  *
  * Scale notes: payload bytes never enter a shuffle — features are
  * extracted in the same stage as the scan and only the (small) feature
  * vectors flow downstream; media tables should be size-partitioned
  * (`maxPartitionBytes`) rather than row-count partitioned.
  */
object Multimodal {

  /** ImageIO's default stream cache is a TEMP FILE per read/write —
    * with 32 concurrent decode tasks over thousands of images that is
    * thousands of create/delete syscalls on shared /tmp per query,
    * and was measured as multi-second run-to-run jitter on the image
    * gate query. All our payloads are in-memory byte arrays, so the
    * disk cache buys nothing: force memory-backed streams, once per
    * JVM (executors run this via the static initializer of whichever
    * task touches the object first). */
  javax.imageio.ImageIO.setUseCache(false)

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

  /** Fallback for payloads in no recognized container — a
    * deterministic 8-bin byte histogram normalized to [0,1], shaped
    * exactly like a feature extractor (batch in → fixed-width
    * Array[Float] out). All three media kinds now have REAL paths:
    * PNG/JPEG via [[decodePixels]] (javax.imageio), WAV/PCM via
    * [[decodeSamples]] (javax.sound), AVI/DIB via [[decodeAviFrames]]
    * (RIFF demuxer built from the public AVI spec). */
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
          else if (looksLikeAvi(r.payload)) videoFeatures(r.payload)
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
    // Deliberately NO parallelism-floor repartition here (the image
    // and video builders have one): AudioSystem's per-call provider
    // lookup is lock-bound, so widening from the scan's natural
    // partitioning to 32 tasks made the audio gate query 3× SLOWER
    // (0.49s → 1.5s measured at sf0.1) — more threads just queue on
    // the registry lock. The scan's row-group splits already give
    // enough parallelism for the cheap PCM arithmetic.
    docs.select(col("doc_id")).as[Long]
      .mapPartitions { ids =>
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
    // parallelism floor: the corpus is typically one unsplittable
    // parquet file (a 1-partition scan), and the codec work below is
    // compute-dense per row — a round-robin exchange of the bare ids
    // costs ~nothing and buys full-width encode/decode parallelism
    docs.select(col("doc_id")).as[Long]
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
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

  // ------------------------------------------------------- real video

  final case class VideoRow(media_id: Long, payload: Array[Byte])
  final case class VideoFeatures(media_id: Long, width: Int, height: Int,
      n_frames: Int, fps: Int, hist: Array[Long])

  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, ((v >> 24) & 0xFF).toByte)
  private def fccBytes(s: String): Array[Byte] = s.getBytes("US-ASCII")
  private def chunk(fcc: String, body: Array[Byte]): Array[Byte] =
    fccBytes(fcc) ++ le32(body.length) ++ body ++
      (if (body.length % 2 == 1) Array(0.toByte) else Array.emptyByteArray)
  private def riffList(listType: String, body: Array[Byte]): Array[Byte] =
    chunk("LIST", fccBytes(listType) ++ body)

  /** REAL AVI muxer (RIFF container, uncompressed bottom-up BGR24 DIB
    * frames — fourcc 'DIB ', biCompression BI_RGB). No JDK video codec
    * exists, so the container layer is built here from the public AVI
    * spec; uncompressed DIB is lossless, which is what makes the decode
    * oracle-exact. Frames are row-major top-down gray arrays (w·h). */
  def writeAviGray(frames: Seq[Array[Byte]], w: Int, h: Int, fps: Int): Array[Byte] = {
    val stride = ((w * 3 + 3) / 4) * 4
    val frameBytes = stride * h
    def dib(gray: Array[Byte]): Array[Byte] = {
      val out = new Array[Byte](frameBytes)
      var y = 0
      while (y < h) {
        val srcRow = h - 1 - y // DIB rows are stored bottom-up
        var x = 0
        while (x < w) {
          val g = gray(srcRow * w + x)
          val o = y * stride + x * 3
          out(o) = g; out(o + 1) = g; out(o + 2) = g // B,G,R equal = gray
          x += 1
        }
        y += 1
      }
      out
    }
    val avih = chunk("avih",
      le32(1000000 / fps) ++ le32(frameBytes * fps) ++ le32(0) ++ le32(0x10) ++
      le32(frames.length) ++ le32(0) ++ le32(1) ++ le32(frameBytes) ++
      le32(w) ++ le32(h) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val strh = chunk("strh",
      fccBytes("vids") ++ fccBytes("DIB ") ++ le32(0) ++ le16(0) ++ le16(0) ++
      le32(0) ++ le32(1) ++ le32(fps) ++ le32(0) ++ le32(frames.length) ++
      le32(frameBytes) ++ le32(-1) ++ le32(0) ++
      le16(0) ++ le16(0) ++ le16(w) ++ le16(h))
    val strf = chunk("strf", // BITMAPINFOHEADER; biHeight>0 = bottom-up
      le32(40) ++ le32(w) ++ le32(h) ++ le16(1) ++ le16(24) ++ le32(0) ++
      le32(frameBytes) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0))
    val hdrl = riffList("hdrl", avih ++ riffList("strl", strh ++ strf))
    val movi = riffList("movi",
      frames.toArray.flatMap(f => chunk("00db", dib(f))))
    val idx1 = chunk("idx1",
      frames.indices.toArray.flatMap(i =>
        fccBytes("00db") ++ le32(0x10) ++
        le32(4 + i * (8 + frameBytes)) ++ le32(frameBytes)))
    chunk("RIFF", fccBytes("AVI ") ++ hdrl ++ movi ++ idx1)
  }

  /** RIFF/AVI magic — route video rows to the real demuxer. */
  def looksLikeAvi(payload: Array[Byte]): Boolean =
    payload != null && payload.length > 12 &&
      payload(0) == 'R' && payload(1) == 'I' && payload(2) == 'F' &&
      payload(3) == 'F' && payload(8) == 'A' && payload(9) == 'V' &&
      payload(10) == 'I'

  /** REAL AVI demux + frame decode: walks the RIFF chunk tree (hdrl →
    * strh/strf for fps and dimensions, movi → per-frame DIB chunks),
    * un-flips the bottom-up padded BGR rows, and accumulates an 8-bin
    * luminance histogram over every pixel of every frame. Width/height/
    * fps come from the container HEADERS and pixels from the frame
    * BYTES — never from the generator formula. */
  def decodeAviFrames(payload: Array[Byte]): (Int, Int, Int, Int, Array[Long]) = {
    def u32(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8) |
      ((payload(o + 2) & 0xFF) << 16) | ((payload(o + 3) & 0xFF) << 24)
    def u16(o: Int): Int = (payload(o) & 0xFF) | ((payload(o + 1) & 0xFF) << 8)
    def fcc(o: Int): String = new String(payload, o, 4, "US-ASCII")
    require(looksLikeAvi(payload), "not an AVI payload")
    var w = 0; var h = 0; var scale = 1; var rate = 0
    var nFrames = 0
    val hist = new Array[Long](8)
    def walk(start: Int, end: Int): Unit = {
      var o = start
      while (o + 8 <= end) {
        val id = fcc(o); val sz = u32(o + 4); val data = o + 8
        id match {
          case "LIST" => walk(data + 4, data + sz)
          case "strh" if fcc(data) == "vids" =>
            scale = u32(data + 20); rate = u32(data + 24)
          case "strf" =>
            w = u32(data + 4); h = u32(data + 8)
            require(u16(data + 14) == 24 && u32(data + 16) == 0,
              "expect uncompressed BGR24 DIB frames")
          case "00db" | "00dc" =>
            val stride = ((w * 3 + 3) / 4) * 4
            var y = 0
            while (y < h) {
              val rowOff = data + (h - 1 - y) * stride
              var x = 0
              while (x < w) {
                hist((payload(rowOff + x * 3) & 0xFF) / 32) += 1
                x += 1
              }
              y += 1
            }
            nFrames += 1
          case _ => ()
        }
        o = data + sz + (sz & 1) // chunks are word-aligned
      }
    }
    walk(12, 8 + u32(4))
    (w, h, nFrames, rate / math.max(scale, 1), hist)
  }

  /** Video feature vector off the real demux: normalized luminance
    * histogram over all frames (same 8-float shape as the others). */
  def videoFeatures(payload: Array[Byte]): Array[Float] = {
    val (w, h, nf, _, hist) = decodeAviFrames(payload)
    val n = math.max(w.toLong * h * nf, 1L).toFloat
    hist.map(_ / n)
  }

  /** Deterministic AVI corpus: one clip per document, 2 + id mod 4
    * frames of 8 + id mod 5 × 6 + id mod 3 gray pixels at 10 fps,
    * gray(id, f, x, y) = (id·31 + f·17 + x·7 + y·13) mod 256 — muxed
    * into a REAL RIFF/AVI container with uncompressed DIB frames, so
    * demuxing is a true container round-trip while every pixel is
    * SQL-recomputable arithmetic (uncompressed = lossless = exact). */
  def aviVideoTable(docs: DataFrame): Dataset[VideoRow] = {
    import docs.sparkSession.implicits._
    // parallelism floor: the corpus is typically one unsplittable
    // parquet file (a 1-partition scan), and the codec work below is
    // compute-dense per row — a round-robin exchange of the bare ids
    // costs ~nothing and buys full-width encode/decode parallelism
    docs.select(col("doc_id")).as[Long]
      .repartition(docs.sparkSession.sparkContext.defaultParallelism)
      .mapPartitions { ids =>
      ids.map { id =>
        val w = 8 + (id % 5).toInt
        val h = 6 + (id % 3).toInt
        val nf = 2 + (id % 4).toInt
        val frames = (0 until nf).map { f =>
          val px = new Array[Byte](w * h)
          var y = 0
          while (y < h) {
            var x = 0
            while (x < w) {
              px(y * w + x) = ((id * 31 + f * 17 + x * 7 + y * 13) % 256).toByte
              x += 1
            }
            y += 1
          }
          px
        }
        VideoRow(id, writeAviGray(frames, w, h, 10))
      }
    }
  }

  /** Real demux over the video table — dimensions/fps/frame count come
    * from the RIFF headers and the histogram from frame BYTES. */
  def decodeVideoFeatures(vids: Dataset[VideoRow]): Dataset[VideoFeatures] = {
    import vids.sparkSession.implicits._
    vids.mapPartitions { rows =>
      rows.map { r =>
        val (w, h, nf, fps, hist) = decodeAviFrames(r.payload)
        VideoFeatures(r.media_id, w, h, nf, fps, hist)
      }
    }
  }

  /** MULTIMODAL near-dup screen — the SemDeDup composition over a
    * DECODED media corpus: decode every image payload with the real
    * codec kernel, keep images whose pixel area clears `minPixels`
    * (sub-thumbnail rasters pair spuriously on any embedding — a
    * 64-px icon matches half the corpus at cosine 0.9), join the
    * survivors to their embedding vectors by shared id, and run the
    * SRP-bucketed cosine near-dup screen over exactly those vectors.
    * This is the image-side twin of the text SemDeDup family
    * (q56/q134): the decode leg contributes the media-validity gate a
    * multimodal pipeline needs before any vector math.
    *
    * Scale shape: the decode pass is narrow per-row work inside the
    * scan stage (the same batch-decode contract a mapInPandas
    * deployment uses) and emits ONLY (id, pixel-area) — payload bytes
    * never reach a shuffle; the media→embedding join keys on the id
    * both tables share; the pair screen is
    * [[Similarity.nearDupPairs]] — Σ bucket² candidates via the
    * deterministic SRP planes, never corpus². */
  def imageNearDupScreen(docs: DataFrame, embeddings: DataFrame,
      idCol: String, embCol: String, threshold: Double,
      bits: Int = 8, minPixels: Long = 100L): DataFrame = {
    val kept = decodeImageFeatures(pngImageTable(docs)).toDF()
      .filter(col("width").cast("long") * col("height").cast("long")
        >= minPixels)
      .select(col("media_id").as(idCol))
    Similarity.nearDupPairs(
      embeddings.join(kept, Seq(idCol)), idCol, embCol, threshold, bits)
  }

  /** Frame sampling: every `stride`-th byte-offset marks a fake frame
    * boundary (a real impl samples keyframes); pure Column ops. */
  def frameOffsets(payload: org.apache.spark.sql.Column, stride: Int): org.apache.spark.sql.Column =
    transform(
      sequence(lit(0),
        greatest(floor((length(payload) - 1) / stride).cast("int"), lit(0))),
      i => i * stride)

  /** REAL image resize: decode with javax.imageio, rescale on the JDK's
    * Java2D raster pipeline (`Graphics2D.drawImage` with an explicit
    * interpolation hint — "nearest" or "bilinear"), re-encode as PNG.
    * Pixels never leave the task: decode → scale → encode happen
    * per-row inside the scan stage, and only the re-encoded payload
    * flows on. Output schema is identical to the input table so resize
    * composes with every other media op.
    *
    * Non-image payloads (no PNG/JPEG magic) fall back to deterministic
    * nearest-neighbor BYTE subsampling to targetW·targetH bytes — the
    * same "mixed tables never throw" contract as
    * [[fakeDecodeFeatures]]. */
  def resize(media: Dataset[MediaRow], targetW: Int, targetH: Int,
      interpolation: String = "bilinear"): Dataset[MediaRow] =
    resizeWith(media, (_, _) => (targetW, targetH), interpolation,
      targetW, targetH)

  /** Integer-factor resize (each source pixel becomes a `factor`×
    * `factor` block under "nearest" — exactly SQL-replicable, which is
    * how the resize gate query oracle-checks the whole decode → scale
    * → encode round-trip). */
  def resizeBy(media: Dataset[MediaRow], factor: Int,
      interpolation: String = "nearest"): Dataset[MediaRow] = {
    require(factor >= 1, s"factor must be >= 1: $factor")
    resizeWith(media, (w, h) => (w * factor, h * factor), interpolation,
      factor, factor)
  }

  private def interpHint(interpolation: String): Object = interpolation match {
    case "nearest"  => java.awt.RenderingHints.VALUE_INTERPOLATION_NEAREST_NEIGHBOR
    case "bilinear" => java.awt.RenderingHints.VALUE_INTERPOLATION_BILINEAR
    case other => throw new IllegalArgumentException(
      s"interpolation must be nearest|bilinear: $other")
  }

  private def resizeWith(media: Dataset[MediaRow],
      target: (Int, Int) => (Int, Int), interpolation: String,
      fallbackW: Int, fallbackH: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    val hint = interpolation // validate eagerly on the driver
    interpHint(hint)
    media.mapPartitions { rows =>
      rows.map { r =>
        val src = if (r.payload == null) Array.emptyByteArray else r.payload
        if (looksLikeImage(src)) {
          val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(src))
          require(img != null, "undecodable image payload")
          val (tw, th) = target(img.getWidth, img.getHeight)
          val out = new java.awt.image.BufferedImage(tw, th,
            java.awt.image.BufferedImage.TYPE_INT_RGB)
          val g = out.createGraphics()
          try {
            g.setRenderingHint(java.awt.RenderingHints.KEY_INTERPOLATION,
              interpHint(hint))
            g.drawImage(img, 0, 0, tw, th, null)
          } finally g.dispose()
          val bos = new java.io.ByteArrayOutputStream()
          javax.imageio.ImageIO.write(out, "png", bos)
          MediaRow(r.media_id, bos.toByteArray,
            r.meta.copy(kind = "image", width = tw, height = th))
        } else {
          val n = fallbackW * fallbackH
          val out = new Array[Byte](n)
          if (src.nonEmpty) {
            var i = 0
            while (i < n) { out(i) = src((i.toLong * src.length / n).toInt); i += 1 }
          }
          MediaRow(r.media_id, out,
            r.meta.copy(width = fallbackW, height = fallbackH))
        }
      }
    }
  }
}
