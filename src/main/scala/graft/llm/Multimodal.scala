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

  /** ??? real decoder goes here — STUB: a deterministic 8-bin byte
    * histogram normalized to [0,1], shaped exactly like an image/audio
    * feature extractor (batch in → fixed-width Array[Float] out). */
  def fakeDecodeFeatures(payload: Array[Byte]): Array[Float] = {
    val bins = new Array[Float](8)
    if (payload == null || payload.isEmpty) return bins
    payload.foreach(b => bins((b & 0xFF) / 32) += 1f)
    bins.map(_ / payload.length)
  }

  /** Partition-wise decode/feature-extract over typed batches. */
  def extractFeatures(media: Dataset[MediaRow]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { rows =>
      // per-partition init would open the real codec once here
      rows.map { r =>
        MediaFeatures(r.media_id, r.meta.kind,
          if (r.payload == null) 0L else r.payload.length.toLong,
          fakeDecodeFeatures(r.payload))
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
