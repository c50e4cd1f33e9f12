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
        // documents -> payloads wrapped in REAL container headers (PNG
        // for even doc_ids, JPEG for odd, deterministic fixture
        // dimensions) -> mapPartitions batch decode that PARSES the
        // headers back (Media.parseHeader is a genuine PNG/JPEG/GIF
        // header reader) -> per-source feature aggregate. DuckDB
        // recomputes the fixture dims/format/byte overheads from the
        // documents metadata.
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
                 octet_length(CAST(text AS BLOB))
                   + CASE WHEN doc_id % 2 = 0 THEN 33 ELSE 15 END AS byte_len,
                 n_chars % 640 + 1 AS width,
                 n_chars * 7 % 480 + 1 AS height,
                 1 + n_chars % 16 AS n_frames,
                 CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'jpeg' END AS format
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
