package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing (SURVEY §2.9): image/audio/video travel as
  * opaque `binary` payloads with typed metadata, and feature extraction
  * runs batched per partition — the Spark-side shape (schema,
  * partitioning, batch iteration) is real; only the codec call is a
  * deterministic stub, since no media libraries ship in this
  * environment.
  *
  * Scale notes: payloads never shuffle for metadata-only queries (column
  * pruning drops them at the scan); feature extraction is `mapPartitions`
  * so a real decoder would amortize model/codec init per partition, the
  * same shape as a Pandas-UDF batch pipeline.
  */
object Multimodal {

  /** A media row: payload plus typed metadata. */
  case class MediaRecord(media_id: Long, kind: String, payload: Array[Byte])

  /** Extracted features: fixed-width vector + provenance metadata.
    * `slot_sums` are the exact per-slot byte sums the float features
    * derive from — integer, so an external oracle can reproduce them
    * bit-for-bit where float accumulation could not be compared. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           sha256: String, features: Array[Float],
                           slot_sums: Array[Long])

  /** A sampled frame: every `stride`-th fixed-size chunk of the payload
    * (the video-frame-sampling shape: one input row → few output rows,
    * payload chunked positionally). */
  case class MediaFrame(media_id: Long, frame_idx: Int, frame: Array[Byte])

  /** Exact per-slot byte sums: slot j accumulates payload bytes at
    * positions ≡ j (mod 8). Integer arithmetic — oracle-reproducible. */
  def byteSlotSums(payload: Array[Byte]): Array[Long] = {
    val out = new Array[Long](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff)
      i += 1
    }
    out
  }

  /** STUB — stands in for an image/audio decode + model embed. Produces a
    * deterministic 8-dim feature from the payload bytes so tests can
    * assert end-to-end plumbing. A real deployment swaps only this
    * function. */
  def stubDecodeAndEmbed(payload: Array[Byte]): Array[Float] = {
    val out = new Array[Float](8)
    var i = 0
    while (i < payload.length) {
      out(i % 8) += (payload(i) & 0xff) / 255.0f
      i += 1
    }
    out
  }

  /** STUB resize — nearest-neighbor decimation of the payload to
    * `outBytes` samples (byte k of the output is input byte
    * (k·len) / outBytes, integer division). Stands in for an image
    * thumbnail/resample; the positional-selection shape and the
    * binary→binary signature are what a real codec plugs into. Payloads
    * shorter than `outBytes` pass through unchanged. */
  def resizeStub(payload: Array[Byte], outBytes: Int = 32): Array[Byte] = {
    if (payload.length <= outBytes) return payload
    val out = new Array[Byte](outBytes)
    var k = 0
    while (k < outBytes) {
      out(k) = payload((k.toLong * payload.length / outBytes).toInt)
      k += 1
    }
    out
  }

  /** Frame sampling: chunk the payload into `frameBytes` frames and keep
    * every `stride`-th one (frame_idx keeps the original frame number).
    * The last frame may be short. One row in → ceil(nframes/stride) rows
    * out, flatMap-shaped like real video keyframe extraction. */
  def sampleFrames(media: Dataset[MediaRecord], frameBytes: Int = 64,
                   stride: Int = 4)
                  (implicit spark: SparkSession): Dataset[MediaFrame] = {
    import spark.implicits._
    media.flatMap { m =>
      m.payload.grouped(frameBytes).zipWithIndex.collect {
        case (chunk, idx) if idx % stride == 0 =>
          MediaFrame(m.media_id, idx, chunk)
      }
    }
  }

  /** documents → media records, treating the text bytes as an opaque
    * payload (the testdata carries no true binary column; the plumbing
    * is payload-agnostic). */
  def asMedia(documents: DataFrame)(implicit spark: SparkSession): Dataset[MediaRecord] = {
    import spark.implicits._
    documents
      .select(col("doc_id").as("media_id"), lit("text").as("kind"),
        col("text").cast("binary").as("payload"))
      .as[MediaRecord]
  }

  /** Batched per-partition feature extraction: one codec/digest instance
    * per partition, streaming over records. */
  def extractFeatures(media: Dataset[MediaRecord])
                     (implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { it =>
      val digest = java.security.MessageDigest.getInstance("SHA-256")
      it.map { m =>
        digest.reset()
        val sha = digest.digest(m.payload).map("%02x".format(_)).mkString
        MediaFeatures(m.media_id, m.kind, m.payload.length, sha,
          stubDecodeAndEmbed(m.payload), byteSlotSums(m.payload))
      }
    }
  }
}
