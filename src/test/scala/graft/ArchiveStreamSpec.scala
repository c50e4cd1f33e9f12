package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.MinHashLsh
import graft.sources.Archive
import graft.streaming.Streaming

/** The production ingest front door, end to end: `.warc.gz` archives
  * arrive on a STREAM (exactly how a crawl lands — the archive is the
  * event), each micro-batch walks its archives with the real codecs
  * (multi-member gunzip + Content-Length-framed WARC), and the
  * recovered documents run the incremental-dedup ingest against the
  * PERSISTED MinHash index (candidates vs stored rows only, then the
  * shard-scoped crash-atomic upsert). Composes the archive rung, the
  * streaming rung, and the persisted-state rung into the one pipeline
  * shape the brief describes.
  */
class ArchiveStreamSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  /** The CdcMaintenanceSpec token fixture: 40 tokens from `cid`, one
    * swapped position makes a ~0.854-Jaccard near-copy.
    */
  private def doc(id: Long, cid: Long, variantAt: Option[Int] = None): (Long, String) =
    id -> (0 until 40).map { j =>
      if (variantAt.contains(j)) s"v$id-$j"
      else s"t${math.abs((cid * 2654435761L + j * 40503L) % 10000)}"
    }.mkString(" ")

  private def warcGz(docs: Seq[(Long, String)]): Array[Byte] =
    Archive.warcArchiveGz(docs.map { case (id, text) =>
      s"https://example.org/doc/$id" -> text.getBytes("UTF-8")
    })

  test("a stream of warc.gz archives feeds incremental dedup against the persisted index") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val idxPath = Files.createTempDirectory("graft-warc-stream").toString + "/index"
    val tau = 0.8
    val shardSize = 10L
    val matches = scala.collection.mutable.ArrayBuffer.empty[(Long, Long)]

    def ingest(batch: DataFrame, batchId: Long): Unit = {
      // 1. walk every archive in the batch with the REAL codecs; the
      //    archive is the parallelism unit
      val docsDf = batch.as[(Long, Array[Byte])]
        .flatMap { case (_, bytes) =>
          Archive.parseWarcGz(bytes).toSeq.flatMap { case (inflated, recs) =>
            recs.filter(_.warcType == "response").map { r =>
              val id = r.targetUri.substring(r.targetUri.lastIndexOf('/') + 1).toLong
              val text = new String(inflated, r.offset, r.length, "UTF-8")
              (id, text.split(" ").toSeq)
            }
          }
        }
        .toDF("doc_id", "w")
        .localCheckpoint()
      if (docsDf.isEmpty) return
      val prepared = MinHashLsh.prepare(docsDf, "doc_id", "w").localCheckpoint()
      // 2. dedup against the PERSISTED index (stored rows only — no
      //    prior trigger's text exists in this plan)
      val fs = new org.apache.hadoop.fs.Path(idxPath)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(idxPath))) {
        val idx = Streaming.readCommitted(spark, idxPath)
        val hits = MinHashLsh.verifyAgainst(prepared, idx,
          MinHashLsh.candidatesAgainst(prepared, idx, "doc_id"), "doc_id", tau)
        matches ++= hits.select(col("d_new"), col("d_old"))
          .collect().map(r => (r.getLong(0), r.getLong(1)))
      }
      // 3. admit the batch: shard-scoped crash-atomic upsert
      Streaming.upsertPartitionedBatch(idxPath, "doc_id", "batch_id", "shard")(
        MinHashLsh.withShard(
          MinHashLsh.index(prepared, "doc_id").withColumn("batch_id", lit(batchId)),
          "doc_id", shardSize),
        batchId)
    }

    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, Array[Byte])]
    val stream = input.toDF().toDF("archive_id", "bytes")
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => ingest(b, id + 1) }
      .start()
    try {
      // trigger 1: two archives, four distinct docs
      input.addData(
        (100L, warcGz(Seq(doc(1L, 100L), doc(2L, 200L)))),
        (101L, warcGz(Seq(doc(3L, 300L), doc(4L, 400L)))))
      stream.processAllAvailable()
      matches shouldBe empty
      Streaming.readCommitted(spark, idxPath).select("doc_id").as[Long].collect().sorted shouldBe
        Array(1L, 2L, 3L, 4L)

      // trigger 2: one archive; doc 5 near-dups doc 1 FROM THE PRIOR
      // TRIGGER (found via the persisted index, not any in-memory
      // text), doc 6 is fresh
      input.addData((102L, warcGz(Seq(doc(5L, 100L, Some(7)), doc(6L, 600L)))))
      stream.processAllAvailable()
      matches.toSeq shouldBe Seq((5L, 1L))
      Streaming.readCommitted(spark, idxPath).count() shouldBe 6L

      // trigger 3: a DAMAGED archive (truncated mid-member) alongside a
      // good one — the good archive's docs land, the damage costs only
      // its own tail, the stream does not die
      val good = warcGz(Seq(doc(7L, 700L)))
      val damaged = {
        val whole = warcGz(Seq(doc(8L, 800L), doc(9L, 900L)))
        java.util.Arrays.copyOfRange(whole, 0, whole.length / 2)
      }
      input.addData((103L, good), (104L, damaged))
      stream.processAllAvailable()
      val ids = Streaming.readCommitted(spark, idxPath).select("doc_id").as[Long].collect().sorted
      ids should contain(7L)
      ids should not contain 9L // the truncated tail, lost loudly-by-absence
    } finally stream.stop()
  }
}
