package graft.functions

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: opaque binary payloads + typed
  * metadata, processed in partition-sized batches.
  *
  * Pattern (builder brief): media (image/audio/video) rides through
  * the engine as a `binary` column with a typed metadata struct;
  * decode / feature-extraction runs as a batch function over
  * partitions — in PySpark that is `mapInPandas`; the Scala-native
  * equivalent used here is a typed `mapPartitions`, which gives the
  * same batch shape (one iterator per partition, codec state amortized
  * across the batch) without per-row UDF overhead.
  *
  * The actual codec is STUBBED (no image/audio libraries in this
  * build): `decodeStub` derives deterministic fake dimensions from the
  * payload bytes. The Spark-side contract — schema, encoders,
  * partitioning, batch iteration — is real and tested; swapping
  * `decodeStub` for a real codec changes no plumbing.
  */
object Media {

  /** One media row: payload + metadata (metadata travels as plain
    * columns; `nest`-style struct packing is applied at the query
    * layer when wanted).
    */
  final case class MediaRecord(
      doc_id: Long,
      bytes: Array[Byte],
      source: String,
      lang: String,
      n_chars: Long
  )

  /** Extracted features. */
  final case class MediaFeatures(
      doc_id: Long,
      source: String,
      byte_len: Long,
      width: Int,
      height: Int,
      n_frames: Int,
      format: String
  )

  /** STUB codec: a real implementation would parse the container
    * header and decode frames here (javax.imageio / ffmpeg bindings —
    * not available in this build). Deterministic fake: dimensions from
    * the byte length, format from a length modulus. Everything
    * downstream of this function is production plumbing.
    */
  def decodeStub(r: MediaRecord): MediaFeatures = {
    val len = r.bytes.length.toLong
    MediaFeatures(
      doc_id = r.doc_id,
      source = r.source,
      byte_len = len,
      width = (len % 640).toInt,
      height = ((len * 7) % 480).toInt,
      n_frames = (1 + r.n_chars % 16).toInt,
      format = (len % 3) match {
        case 0 => "png"
        case 1 => "jpeg"
        case _ => "webp"
      }
    )
  }

  /** Batch feature extraction over partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // Per-partition codec init would go here (amortized like
      // mapInPandas batch state).
      batch.map(decodeStub)
    }
  }

  /** Build the media dataset from the documents table: text payload
    * encoded to UTF-8 bytes stands in for an image/audio blob.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("bytes"),
        col("source"),
        col("lang"),
        col("n_chars")
      )
      .as[MediaRecord]
  }
}
