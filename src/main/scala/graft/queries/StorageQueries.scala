package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** The persisted-storage protocol UNDER THE DuckDB GATE: where
  * SwapRecoverySpec/SnapshotIsolationSpec pin the crash windows and
  * race behavior, this rung pins the protocol's VALUE-LEVEL semantics
  * against an independent engine — a table is built through the real
  * mutation verbs (latest-wins upsert, shard-scoped update commit,
  * keyed retraction) on scratch disk, read back PINNED to its
  * committed manifest AND time-traveled to generation 1, and the
  * whole lifecycle is replayed by the oracle as pure SQL over the
  * source table. A wrong merge, a lost shard, a leaked tombstone, a
  * stale manifest, or a time-travel read that slips a generation all
  * break the hash.
  */
object StorageQueries {

  /** Scratch root swept at JVM exit (the returned plan reads the
    * committed files lazily — the shared graft.core.Scratch registry).
    */
  private def scratchDir(prefix: String): java.nio.file.Path =
    graft.core.Scratch.dir(prefix)

  val defs: Seq[QueryDef] = Seq(
    QueryDef(
      "q_storage_upsert_lifecycle",
      (s, dir) => {
        // Lifecycle: commit 1 ingests every canonical document
        // (payload = md5(text), version 1); commit 2 latest-wins
        // UPDATES the doc_id % 10 == 0 slice (payload suffixed,
        // version 2 — only their shards rewrite); commit 3 RETRACTS
        // the doc_id % 20 == 5 slice (deleteFromPartitioned). The
        // result joins the PINNED final read with the TIME-TRAVELED
        // generation-1 read, so the output carries both the live value
        // and the version-1 value per surviving key — the oracle
        // replays both in closed form. Stage-0 canonicalization
        // (latest-wins over duplicate ids, the q_corpus_curation
        // recipe) keeps the upsert's unique-key-per-batch contract
        // under the chaos fixture's duplicate ids.
        import s.implicits._
        val wId = Window.partitionBy(col("doc_id")).orderBy(
          col("n_chars").desc_nulls_last,
          md5(col("text").cast("binary")).desc_nulls_last,
          col("lang").desc_nulls_last,
          col("source").desc_nulls_last)
        val canon = Tables(s, dir, "documents")
          .na.drop(Seq("doc_id"))
          .withColumn("__rn", row_number().over(wId))
          .filter(col("__rn") === 1)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("p1"),
            col("doc_id").mod(16).cast("int").as("shard"))
          .localCheckpoint()
        val outSchema = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("payload",
              org.apache.spark.sql.types.StringType),
            org.apache.spark.sql.types.StructField("batch_id",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("shard",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("payload_v1",
              org.apache.spark.sql.types.StringType))))
        if (canon.isEmpty) outSchema
        else {
          val target = scratchDir("graft-storage-rung").toString + "/t"
          Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
            canon.select(col("doc_id"), col("p1").as("payload"),
              lit(1).as("batch_id"), col("shard")),
            1L)
          Streaming.upsertPartitionedBatch(target, "doc_id", "batch_id", "shard")(
            canon.filter(col("doc_id") % 10 === 0)
              .select(col("doc_id"), concat(col("p1"), lit("-v2")).as("payload"),
                lit(2).as("batch_id"), col("shard")),
            2L)
          Streaming.deleteFromPartitioned(target, "doc_id", "shard")(
            canon.filter(col("doc_id") % 20 === 5)
              .select(col("doc_id"), col("shard")))
          val fs = new org.apache.hadoop.fs.Path(target)
            .getFileSystem(s.sparkContext.hadoopConfiguration)
          val gen1 = Streaming.manifestGenerations(fs, target).head
          Streaming.readCommitted(s, target)
            .join(
              Streaming.readGeneration(s, target, gen1)
                .select(col("doc_id"), col("payload").as("payload_v1")),
              Seq("doc_id"))
            .select(col("doc_id"), col("payload"), col("batch_id"),
              col("shard"), col("payload_v1"))
            .orderBy("doc_id")
        }
      },
      Some("""WITH canon AS (SELECT doc_id, md5(text) AS p1 FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY n_chars DESC NULLS LAST, md5(text) DESC NULLS LAST,
                            lang DESC NULLS LAST, source DESC NULLS LAST) AS rn
                 FROM documents WHERE doc_id IS NOT NULL) WHERE rn = 1)
        SELECT doc_id,
          CASE WHEN doc_id % 10 = 0 THEN p1 || '-v2' ELSE p1 END AS payload,
          CASE WHEN doc_id % 10 = 0 THEN 2 ELSE 1 END AS batch_id,
          CAST(doc_id % 16 AS INTEGER) AS shard,
          p1 AS payload_v1
        FROM canon
        WHERE doc_id % 20 != 5
        ORDER BY doc_id""")
    ),
    // ------------------------------------------------------------------
    QueryDef(
      "q_storage_cdc_follow",
      (s, dir) => {
        // The table-to-table CDC FOLLOWER under the gate: a source
        // table advances through three commits (ingest, a %7 update
        // slice, a fresh-keys append) while a DERIVED table — per-doc
        // payload length — is maintained ONLY by followTable polls
        // (commit-delta reads + a durable cursor, never a source
        // rescan). The derived table is the output; the oracle derives
        // it directly from the documents table in closed form, so a
        // follower that missed a commit, double-applied a delta
        // non-idempotently, or read a stale generation breaks the
        // hash. Polls run after every commit AND once redundantly at
        // the end (the caught-up poll must deliver nothing).
        import s.implicits._
        val wId = Window.partitionBy(col("doc_id")).orderBy(
          col("n_chars").desc_nulls_last,
          md5(col("text").cast("binary")).desc_nulls_last,
          col("lang").desc_nulls_last,
          col("source").desc_nulls_last)
        val canon = Tables(s, dir, "documents")
          .na.drop(Seq("doc_id"))
          .withColumn("__rn", row_number().over(wId))
          .filter(col("__rn") === 1)
          .select(col("doc_id"), md5(col("text").cast("binary")).as("p1"),
            col("doc_id").mod(16).cast("int").as("shard"))
          .localCheckpoint()
        val outSchema = s.createDataFrame(
          java.util.Collections.emptyList[org.apache.spark.sql.Row](),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField("doc_id",
              org.apache.spark.sql.types.LongType),
            org.apache.spark.sql.types.StructField("payload_len",
              org.apache.spark.sql.types.IntegerType),
            org.apache.spark.sql.types.StructField("shard",
              org.apache.spark.sql.types.IntegerType))))
        if (canon.isEmpty) outSchema
        else {
          val root = scratchDir("graft-storage-cdc").toString
          val source = s"$root/source"
          val derived = s"$root/derived"
          val cursor = s"$root/cursor"
          def applyDelta(delta: org.apache.spark.sql.DataFrame): Unit =
            Streaming.upsertPartitionedBatch(derived, "doc_id", "batch_id", "shard")(
              delta.select(col("doc_id"),
                org.apache.spark.sql.functions.length(col("payload")).as("payload_len"),
                col("batch_id"), col("shard")),
              0L)
          def poll(): Long = Streaming.followTable(s, source, cursor)(applyDelta)
          Streaming.upsertPartitionedBatch(source, "doc_id", "batch_id", "shard")(
            canon.select(col("doc_id"), col("p1").as("payload"),
              lit(1).as("batch_id"), col("shard")), 1L)
          poll()
          Streaming.upsertPartitionedBatch(source, "doc_id", "batch_id", "shard")(
            canon.filter(col("doc_id") % 7 === 0)
              .select(col("doc_id"), concat(col("p1"), lit("-v2")).as("payload"),
                lit(2).as("batch_id"), col("shard")), 2L)
          poll()
          // fresh keys at doc_id + 1_000_000, minted from the %9 slice
          // of the ORIGINAL ids; an anti-join guards the (hostile-
          // fixture) case where an offset key collides with an
          // existing id — the oracle carries the same NOT IN guard
          Streaming.upsertPartitionedBatch(source, "doc_id", "batch_id", "shard")(
            canon.filter(col("doc_id") % 9 === 0)
              .select((col("doc_id") + 1000000L).as("doc_id"),
                concat(col("p1"), lit("-new")).as("payload"),
                lit(3).as("batch_id"))
              .join(canon.select(col("doc_id")), Seq("doc_id"), "left_anti")
              .withColumn("shard", (col("doc_id") % 16).cast("int")), 3L)
          poll()
          poll() // caught up: must be a no-op
          Streaming.readCommitted(s, derived)
            .select(col("doc_id"), col("payload_len"), col("shard"))
            .orderBy("doc_id")
        }
      },
      Some("""WITH canon AS (SELECT doc_id, md5(text) AS p1 FROM (
                 SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY n_chars DESC NULLS LAST, md5(text) DESC NULLS LAST,
                            lang DESC NULLS LAST, source DESC NULLS LAST) AS rn
                 FROM documents WHERE doc_id IS NOT NULL) WHERE rn = 1),
        live AS (
          SELECT doc_id,
            CASE WHEN doc_id % 7 = 0 THEN strlen(p1) + 3 ELSE strlen(p1) END AS payload_len,
            CAST(doc_id % 16 AS INTEGER) AS shard
          FROM canon
          UNION ALL
          SELECT doc_id + 1000000,
            strlen(p1) + 4 AS payload_len,
            CAST((doc_id + 1000000) % 16 AS INTEGER) AS shard
          FROM canon WHERE doc_id % 9 = 0
            AND doc_id + 1000000 NOT IN (SELECT doc_id FROM canon))
        SELECT doc_id, CAST(payload_len AS INTEGER) AS payload_len, shard
        FROM live ORDER BY doc_id""")
    )
  )
}
