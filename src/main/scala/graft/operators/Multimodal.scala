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

  /** Extracted features: fixed-width vector + provenance metadata. */
  case class MediaFeatures(media_id: Long, kind: String, n_bytes: Int,
                           sha256: String, features: Array[Float])

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
          stubDecodeAndEmbed(m.payload))
      }
    }
  }
}
