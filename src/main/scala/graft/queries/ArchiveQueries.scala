package graft.queries

import org.apache.spark.sql.functions._

import graft.sources.Archive

/** Archive-ingest rungs: the unit-of-distribution formats a
  * large-scale text pipeline actually reads — POSIX ustar tarballs
  * and WARC/1.0 (the CommonCrawl format). The fixture side GROUPS the
  * documents table into per-bucket archives with the real writers
  * (checksummed tar headers, Content-Length-framed WARC records); the
  * product side is the PARSE: each archive is walked by the real
  * codec inside a distributed flatMap and its entries stream back out
  * as rows. The oracle replays every per-entry fact (name/URI
  * arithmetic, UTF-8 byte length, an md5 over the payload BYTES that
  * round-tripped through the container) from the documents table —
  * one flipped bit anywhere in header handling, checksum math,
  * padding, or Content-Length framing breaks the md5 or drops a row,
  * loudly.
  *
  * Scale shape: the archive is the parallelism unit (exactly how WARC
  * ingest runs at 100 TB — one task per archive file, entries
  * streamed, never a whole-corpus driver pass); bucket count here is
  * fixture-sized, in production it tracks corpus size so archives
  * stay ~1 GB.
  */
object ArchiveQueries {

  /** documents -> (bucket, sorted entries) -> one archive per bucket
    * via `build`, then parsed back to per-entry rows by `explode`.
    */
  private def roundTrip(
      s: org.apache.spark.sql.SparkSession,
      dir: String,
      build: Seq[(Long, Array[Byte])] => Array[Byte],
      explode: (Long, Array[Byte]) => Seq[(Long, String, Array[Byte])]
  ): org.apache.spark.sql.DataFrame = {
    import s.implicits._
    val archives = Tables(s, dir, "documents")
      .na.drop(Seq("doc_id", "text"))
      .select((col("doc_id") % 16).as("bucket"),
        struct(col("doc_id").as("_1"), col("text").as("_2")).as("entry"))
      .groupBy(col("bucket"))
      .agg(sort_array(collect_list(col("entry"))).as("entries"))
      .select(col("bucket").as("_1"), col("entries").as("_2"))
      .as[(Long, Seq[(Long, String)])]
      .map { case (bucket, entries) =>
        (bucket, build(entries.map { case (id, text) => (id, text.getBytes("UTF-8")) }))
      }
    archives
      .flatMap { case (bucket, bytes) =>
        explode(bucket, bytes).map { case (docId, name, payload) =>
          (docId, bucket, name, payload.length.toLong, payload)
        }
      }
      .toDF("doc_id", "bucket", "entry_name", "byte_len", "payload")
      // md5 over the round-tripped BYTES, via the codegen'd function
      .select(col("doc_id"), col("bucket"), col("entry_name"), col("byte_len"),
        md5(col("payload")).as("payload_md5"))
      .orderBy("doc_id", "payload_md5")
  }

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_source_tar_roundtrip",
      (s, dir) => roundTrip(s, dir,
        build = entries => Archive.tarArchive(
          entries.map { case (id, data) => (s"doc-$id.txt", data) }),
        // regular files only: real tarballs carry directory/symlink
        // entries too, which are structure, not payload
        explode = (_, bytes) => Archive.parseTar(bytes).filter(_.isFile).map { e =>
          (e.name.stripPrefix("doc-").stripSuffix(".txt").toLong, e.name,
            java.util.Arrays.copyOfRange(bytes, e.offset, e.offset + e.length))
        }),
      Some("""SELECT doc_id,
               CAST(doc_id % 16 AS BIGINT) AS bucket,
               'doc-' || doc_id || '.txt' AS entry_name,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               md5(text) AS payload_md5
             FROM documents
             WHERE doc_id IS NOT NULL AND text IS NOT NULL
             ORDER BY doc_id, payload_md5""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_source_warc_ingest",
      (s, dir) => roundTrip(s, dir,
        build = entries => Archive.warcArchive(
          entries.map { case (id, data) => (s"https://example.org/doc/$id", data) }),
        explode = (_, bytes) => Archive.parseWarc(bytes)
          .filter(_.warcType == "response")
          .map { r =>
            (r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong, r.targetUri,
              java.util.Arrays.copyOfRange(bytes, r.offset, r.offset + r.length))
          }),
      Some("""SELECT doc_id,
               CAST(doc_id % 16 AS BIGINT) AS bucket,
               'https://example.org/doc/' || doc_id AS entry_name,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               md5(text) AS payload_md5
             FROM documents
             WHERE doc_id IS NOT NULL AND text IS NOT NULL
             ORDER BY doc_id, payload_md5""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_source_warc_gz",
      (s, dir) => roundTrip(s, dir,
        // the layout CommonCrawl actually ships: one gzip MEMBER per
        // record, members concatenated (record-seekable); the parse
        // side inflates the member chain (JDK Inflater — the PNG
        // rung's codec, reused) and walks the same WARC framing
        build = entries => Archive.warcArchiveGz(
          entries.map { case (id, data) => (s"https://example.org/doc/$id", data) }),
        explode = (_, bytes) => Archive.parseWarcGz(bytes).toSeq.flatMap {
          case (inflated, recs) =>
            recs.filter(_.warcType == "response").map { r =>
              (r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong, r.targetUri,
                java.util.Arrays.copyOfRange(inflated, r.offset, r.offset + r.length))
            }
        }),
      Some("""SELECT doc_id,
               CAST(doc_id % 16 AS BIGINT) AS bucket,
               'https://example.org/doc/' || doc_id AS entry_name,
               CAST(strlen(text) AS BIGINT) AS byte_len,
               md5(text) AS payload_md5
             FROM documents
             WHERE doc_id IS NOT NULL AND text IS NOT NULL
             ORDER BY doc_id, payload_md5""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_text_html_extract",
      (s, dir) => {
        // HTML main-content extraction — the boilerplate-stripping
        // step between the WARC walk and quality scoring (the
        // CCNet/RefinedWeb chain). Each document is embedded (escaped)
        // in a REAL page carrying every boilerplate class: a raw-text
        // script whose body contains markup-looking strings and a '>'
        // comparison, a style block, a comment hiding markup, a
        // quote-aware attribute (a '>' inside a quoted value), nav
        // links (one carrying a named entity), and a footer with a
        // decimal character reference. functions.Html.extract strips
        // it all in one quote-aware state-machine pass and decodes the
        // references, so the expected text is a pure string formula —
        // the oracle rebuilds it with one concat + whitespace-collapse
        // regexp and compares the md5 and the code-point length. One
        // leaked script token, un-decoded entity, or swallowed text
        // node breaks the hash.
        import s.implicits._
        Tables(s, dir, "documents")
          .na.drop(Seq("doc_id", "text"))
          .select(col("doc_id"), col("text"), col("source"))
          .as[(Long, String, String)]
          .map { case (id, text, source) =>
            val ext = graft.functions.Html.extract(
              graft.functions.Html.fixturePage(id, text))
            (id, source, ext.nLinks, ext.nScriptBlocks, ext.nStyleBlocks,
              ext.nCommentBlocks, ext.text.codePointCount(0, ext.text.length),
              ext.text.getBytes("UTF-8"))
          }
          .toDF("doc_id", "source", "n_links", "n_script_blocks", "n_style_blocks",
            "n_comment_blocks", "n_chars_extracted", "payload")
          .select(col("doc_id"), col("source"), col("n_links"), col("n_script_blocks"),
            col("n_style_blocks"), col("n_comment_blocks"), col("n_chars_extracted"),
            md5(col("payload")).as("extracted_md5"))
          .orderBy("doc_id", "extracted_md5")
      },
      Some("""WITH f AS (
          SELECT doc_id, source,
                 trim(regexp_replace(
                   'Doc ' || doc_id || ' Home About Q&A ' || text ||
                     ' (c) example.org''s corpus',
                   '[ \t\r\n]+', ' ', 'g')) AS ex
          FROM documents
          WHERE doc_id IS NOT NULL AND text IS NOT NULL)
        SELECT doc_id, source,
               3 AS n_links, 1 AS n_script_blocks, 1 AS n_style_blocks,
               1 AS n_comment_blocks,
               CAST(length(ex) AS INTEGER) AS n_chars_extracted,
               md5(ex) AS extracted_md5
        FROM f ORDER BY doc_id, extracted_md5""")
    )
  )
}
