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
  * The container-header DECODE is real: `parseHeader` reads PNG /
  * JPEG / GIF dimensions from the raw bytes (pure JVM, no native
  * deps) and works on genuine files. Since no real image corpus
  * ships with the testdata, `fromDocuments` manufactures payloads by
  * wrapping each document's UTF-8 bytes in a genuine container header
  * (valid PNG signature+IHDR or JPEG SOI+SOF0) with deterministic
  * dimensions — so the oracle can recompute what the parser must
  * find. Full pixel/frame decode stays out of scope (no codec libs in
  * this build); `n_frames` is the documented stand-in for video
  * frame sampling.
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

  /** Parsed container header. */
  final case class MediaHeader(format: String, width: Int, height: Int)

  private def be16(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)

  private def be32(b: Array[Byte], i: Int): Int =
    ((b(i) & 0xff) << 24) | ((b(i + 1) & 0xff) << 16) |
      ((b(i + 2) & 0xff) << 8) | (b(i + 3) & 0xff)

  private def le16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  private val PngSig: Array[Byte] =
    Array(0x89, 0x50, 0x4e, 0x47, 0x0d, 0x0a, 0x1a, 0x0a).map(_.toByte)

  /** Real container-header parser: PNG (signature + IHDR), JPEG (SOI +
    * marker scan to SOF0/1/2), GIF (87a/89a logical screen). Returns
    * None for unrecognized/truncated payloads instead of throwing —
    * at 100 TB a corrupt blob must not kill the stage.
    */
  def parseHeader(b: Array[Byte]): Option[MediaHeader] = {
    if (b.length >= 24 && b.take(8).sameElements(PngSig) &&
      new String(b.slice(12, 16), "US-ASCII") == "IHDR") {
      // PNG: IHDR is the first chunk; width/height are big-endian at
      // byte offsets 16/20.
      Some(MediaHeader("png", be32(b, 16), be32(b, 20)))
    } else if (b.length >= 4 && (b(0) & 0xff) == 0xff && (b(1) & 0xff) == 0xd8) {
      // JPEG: scan marker segments after SOI until a start-of-frame
      // (SOF0/SOF1/SOF2) which carries height@+3, width@+5.
      var i = 2
      var out: Option[MediaHeader] = None
      var ok = true
      while (ok && out.isEmpty && i + 3 < b.length) {
        if ((b(i) & 0xff) != 0xff) ok = false
        else {
          val marker = b(i + 1) & 0xff
          if (marker == 0xc0 || marker == 0xc1 || marker == 0xc2) {
            if (i + 8 < b.length)
              out = Some(MediaHeader("jpeg", be16(b, i + 7), be16(b, i + 5)))
            ok = false
          } else if (marker == 0xd8 || (marker >= 0xd0 && marker <= 0xd9)) {
            i += 2 // standalone marker, no length field
          } else {
            i += 2 + be16(b, i + 2)
          }
        }
      }
      out
    } else if (b.length >= 10 && b(0) == 'G' && b(1) == 'I' && b(2) == 'F') {
      // GIF: logical screen width/height little-endian at 6/8.
      Some(MediaHeader("gif", le16(b, 6), le16(b, 8)))
    } else None
  }

  /** Deterministic fixture dimensions embedded by the encoder (and
    * therefore recomputable by the DuckDB oracle from `n_chars`).
    */
  def fixtureWidth(nChars: Long): Int = (nChars % 640 + 1).toInt
  def fixtureHeight(nChars: Long): Int = (nChars * 7 % 480 + 1).toInt

  /** Wrap a payload in a genuine PNG header (signature + well-formed
    * IHDR chunk). The CRC is not computed (the parser — any header
    * parser — reads dimensions before validating CRCs).
    */
  def pngContainer(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(33 + payload.length)
    out.put(PngSig)
    out.putInt(13) // IHDR data length
    out.put("IHDR".getBytes("US-ASCII"))
    out.putInt(w).putInt(h)
    out.put(8.toByte).put(2.toByte) // bit depth, truecolor
    out.put(0.toByte).put(0.toByte).put(0.toByte) // compression/filter/interlace
    out.putInt(0) // CRC placeholder
    out.put(payload)
    out.array()
  }

  /** Wrap a payload in a genuine JPEG SOI + SOF0 frame header. */
  def jpegContainer(w: Int, h: Int, payload: Array[Byte]): Array[Byte] = {
    val out = java.nio.ByteBuffer.allocate(15 + payload.length)
    out.put(0xff.toByte).put(0xd8.toByte) // SOI
    out.put(0xff.toByte).put(0xc0.toByte) // SOF0
    out.putShort(11.toShort) // segment length: 8 + 3*1 component
    out.put(8.toByte) // precision
    out.putShort(h.toShort).putShort(w.toShort)
    out.put(1.toByte) // 1 component
    out.put(1.toByte).put(0x11.toByte).put(0.toByte)
    out.put(payload)
    out.array()
  }

  /** Decode: parse the real container header; n_frames is the
    * documented stand-in for video frame sampling (no video container
    * in the fixture corpus).
    */
  def decode(r: MediaRecord): MediaFeatures = {
    val hdr = parseHeader(r.bytes).getOrElse(MediaHeader("unknown", 0, 0))
    MediaFeatures(
      doc_id = r.doc_id,
      source = r.source,
      byte_len = r.bytes.length.toLong,
      width = hdr.width,
      height = hdr.height,
      n_frames = (1 + r.n_chars % 16).toInt,
      format = hdr.format
    )
  }

  /** Batch feature extraction over partitions. */
  def extractFeatures(media: Dataset[MediaRecord]): Dataset[MediaFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions { batch =>
      // Per-partition codec init would go here (amortized like
      // mapInPandas batch state).
      batch.map(decode)
    }
  }

  /** Build the media dataset from the documents table: each
    * document's UTF-8 bytes wrapped in a real container (PNG for even
    * doc_ids, JPEG for odd) with deterministic fixture dimensions.
    */
  def fromDocuments(spark: SparkSession, docs: DataFrame): Dataset[MediaRecord] = {
    import spark.implicits._
    docs
      .select(
        col("doc_id"),
        encode(col("text"), "UTF-8").as("payload"),
        col("source"),
        col("lang"),
        col("n_chars")
      )
      .as[(Long, Array[Byte], String, String, Long)]
      .map { case (id, payload, source, lang, nChars) =>
        val w = fixtureWidth(nChars)
        val h = fixtureHeight(nChars)
        val bytes =
          if (id % 2 == 0) pngContainer(w, h, payload)
          else jpegContainer(w, h, payload)
        MediaRecord(id, bytes, source, lang, nChars)
      }
  }
}
