package graft.queries

import org.apache.spark.sql.functions._

import graft.functions.Media

/** Multimodal-column slices: binary payload + typed metadata +
  * batch decode (see graft.functions.Media for the pattern; the codec
  * is a deterministic stub, the plumbing is real).
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_multimodal_features",
      (s, dir) => {
        // documents -> binary media records -> mapPartitions batch
        // "decode" -> per-source feature aggregate. The decode output
        // is a deterministic function of payload length, so DuckDB can
        // recompute it from octet_length.
        val media = Media.fromDocuments(s, Tables(s, dir, "documents"))
        Media.extractFeatures(media)
          .toDF()
          .groupBy(col("source"), col("format"))
          .agg(
            count(lit(1)).as("n_media"),
            sum(col("byte_len")).as("total_bytes"),
            max(col("width")).as("max_width"),
            max(col("height")).as("max_height"),
            sum(col("n_frames")).as("total_frames")
          )
          .orderBy("source", "format")
      },
      Some("""WITH f AS (
          SELECT doc_id, source,
                 octet_length(CAST(text AS BLOB)) AS byte_len,
                 octet_length(CAST(text AS BLOB)) % 640 AS width,
                 (octet_length(CAST(text AS BLOB)) * 7) % 480 AS height,
                 1 + n_chars % 16 AS n_frames,
                 CASE octet_length(CAST(text AS BLOB)) % 3
                   WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'webp' END AS format
          FROM documents)
        SELECT source, format, COUNT(*) AS n_media,
               CAST(SUM(byte_len) AS BIGINT) AS total_bytes,
               CAST(MAX(width) AS INTEGER) AS max_width,
               CAST(MAX(height) AS INTEGER) AS max_height,
               CAST(SUM(n_frames) AS BIGINT) AS total_frames
        FROM f GROUP BY 1, 2 ORDER BY 1, 2""")
    )
  )
}
