package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{ConnectedComponents, IncrementalClusters, MinHashLsh}
import graft.streaming.Streaming

/** The FULL dedup-state lifecycle under Structured Streaming: one CDC
  * stream of (upsert | delete) document events maintains the persisted
  * MinHash index AND the cluster map across micro-batch triggers,
  * composing every lifecycle verb the r13 round added —
  * `IncrementalClusters.remove` for retractions, the remove-then-add
  * `edit` path for changed docs (an upserted id already in the map),
  * `maintain` for fresh ingest, `Streaming.deleteFromPartitioned` +
  * `upsertPartitionedBatch` for the shard-scoped crash-atomic
  * persistence — with batch-sized work per trigger and the map equal
  * to a from-scratch clustering of the LIVE corpus at every trigger
  * boundary (the equality theorem, now including deletes and edits).
  *
  * The within-trigger policy is spec-pinned too: the LAST event per
  * doc_id in a trigger wins (a delete followed by an upsert of the
  * same id inside one batch is an upsert), mirroring the latest-wins
  * semantics of the reference's per-load dedup
  * (literature/PreProcessing.scala:8-27) lifted to event streams.
  */
class CdcMaintenanceSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def doc(id: Long, cid: Long, variantAt: Option[Int] = None): (Long, Seq[String]) =
    id -> (0 until 40).map { j =>
      if (variantAt.contains(j)) s"v$id-$j"
      else s"t${math.abs((cid * 2654435761L + j * 40503L) % 10000)}"
    }

  private val shardSize = 10L
  private val tau = 0.8

  test("a CDC stream of upserts, deletes, and edits maintains index + map; map equals from-scratch each trigger") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import spark.implicits._
    val root = Files.createTempDirectory("graft-cdc").toString
    val idxPath = root + "/index"
    val mapPath = root + "/clusters"

    def readOrEmpty(path: String, empty: => DataFrame): DataFrame = {
      val fs = new org.apache.hadoop.fs.Path(path)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(new org.apache.hadoop.fs.Path(path)))
        try graft.streaming.Streaming.readCommitted(spark, path)
        catch { case _: Throwable => empty }
      else empty
    }
    def emptyMap = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("doc_id", "cluster")
    def emptyEdges = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("d1", "d2")
    def upsertSharded(path: String, version: Long)(rows: DataFrame): Unit =
      Streaming.upsertPartitionedBatch(path, "doc_id", "batch_id", "shard")(
        MinHashLsh.withShard(rows.withColumn("batch_id", lit(version)), "doc_id", shardSize),
        version)
    def deleteSharded(path: String)(ids: DataFrame): Long =
      Streaming.deleteFromPartitioned(path, "doc_id", "shard")(
        MinHashLsh.withShard(ids, "doc_id", shardSize))

    /** One CDC trigger: resolve last-event-per-id, retract (deletes +
      * the old content of edits), re-admit upserts — all against the
      * PERSISTED tables only; no prior trigger's text exists in this
      * plan.
      */
    def applyCdc(batch: DataFrame, version: Long): Unit = {
      val last = batch
        .withColumn("rn", row_number().over(
          Window.partitionBy(col("doc_id")).orderBy(col("seq").desc)))
        .filter(col("rn") === 1).drop("rn", "seq")
        .localCheckpoint()
      val dels = last.filter(col("op") === "delete").select(col("doc_id"))
      val ups = last.filter(col("op") === "upsert").select(col("doc_id"), col("w"))
      val map = readOrEmpty(mapPath, emptyMap).select(col("doc_id"), col("cluster"))
        .localCheckpoint()
      val idx0 = readOrEmpty(idxPath, emptyMap).localCheckpoint()

      // RETRACT phase: deleted ids plus edited ids (upserts already in
      // the map) leave their clusters; survivors recluster over their
      // STORED index rows (component-sized work)
      val retract = dels.unionByName(ups.select(col("doc_id")))
        .join(map, Seq("doc_id"), "left_semi").distinct().localCheckpoint()
      val touched = map.join(retract, Seq("doc_id"), "left_semi")
        .select(col("cluster")).distinct()
      val survivorIds = map.join(touched, Seq("cluster"), "left_semi")
        .join(retract, Seq("doc_id"), "left_anti").select(col("doc_id"))
      val survEdges =
        if (idx0.isEmpty) emptyEdges
        else {
          val survRows = idx0.join(survivorIds, Seq("doc_id"), "left_semi").localCheckpoint()
          MinHashLsh.verify(survRows,
            MinHashLsh.candidates(survRows, "doc_id"), "doc_id", tau)
            .select(col("d1"), col("d2"))
        }
      val repairs = IncrementalClusters.remove(map, retract, survEdges).localCheckpoint()
      val mapAfter = map
        .join(retract, Seq("doc_id"), "left_anti")
        .join(repairs.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(repairs)

      // INDEX phase: drop deleted rows; latest-wins replace/insert the
      // upserted docs' stored sets
      if (!dels.isEmpty) deleteSharded(idxPath)(dels)
      val newPrep = MinHashLsh.prepare(ups, "doc_id", "w").localCheckpoint()
      if (!ups.isEmpty) upsertSharded(idxPath, version)(MinHashLsh.index(newPrep, "doc_id"))

      // ADMIT phase: the upserted docs join the post-retraction map by
      // their NEW content's edges (index minus themselves — an edited
      // doc must not match its own stored row)
      val idxRest = readOrEmpty(idxPath, emptyMap)
        .join(ups.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .localCheckpoint()
      val cross =
        if (idxRest.isEmpty) emptyEdges.toDF("d_new", "d_old")
        else MinHashLsh.verifyAgainst(newPrep, idxRest,
          MinHashLsh.candidatesAgainst(newPrep, idxRest, "doc_id"), "doc_id", tau)
          .select(col("d_new"), col("d_old"))
      val inBatch = MinHashLsh.verify(newPrep,
        MinHashLsh.candidates(newPrep, "doc_id"), "doc_id", tau)
        .select(col("d1"), col("d2"))
      val added = IncrementalClusters.maintain(
        mapAfter, ups.select(col("doc_id")), cross, inBatch).localCheckpoint()

      // MAP persistence: deletes out, repairs + admissions in (the
      // admit phase's row wins where both touch one doc)
      if (!dels.isEmpty) deleteSharded(mapPath)(dels)
      val delta = repairs
        .join(added.select(col("doc_id")), Seq("doc_id"), "left_anti")
        .unionByName(added)
      if (!delta.isEmpty) upsertSharded(mapPath, version)(delta)
    }

    implicit val sq = spark.sqlContext
    val input = MemoryStream[(Long, String, Long, Seq[String])]
    val stream = input.toDF().toDF("seq", "op", "doc_id", "w")
      .writeStream
      .foreachBatch { (b: DataFrame, id: Long) => applyCdc(b, id + 1) }
      .start()

    var live = Map.empty[Long, Seq[String]]
    def trigger(events: Seq[(Long, String, Long, Seq[String])]): Unit = {
      input.addData(events: _*)
      stream.processAllAvailable()
      events.sortBy(_._1).foreach {
        case (_, "upsert", id, w) => live += id -> w
        case (_, "delete", id, _) => live -= id
        case _ => fail("unknown op")
      }
    }
    def mapNow(): Map[Long, Long] = readOrEmpty(mapPath, emptyMap)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def scratch(): Map[Long, Long] = {
      val p = MinHashLsh.prepare(
        live.toSeq.map { case (id, w) => (id, w) }.toDF("doc_id", "w"),
        "doc_id", "w").localCheckpoint()
      val pairs = MinHashLsh.verify(p, MinHashLsh.candidates(p, "doc_id"), "doc_id", tau)
      live.keys.toSeq.toDF("doc_id")
        .join(ConnectedComponents.labels(pairs.select(col("d1"), col("d2")))
          .withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }

    try {
      // trigger 1 — ingest: {1,2} near-dups (cid 100), {3,4} near-dups
      // (cid 200)
      trigger(Seq(
        (1L, "upsert", 1L, doc(1L, 100L)._2),
        (2L, "upsert", 2L, doc(2L, 100L, Some(7))._2),
        (3L, "upsert", 3L, doc(3L, 200L)._2),
        (4L, "upsert", 4L, doc(4L, 200L, Some(7))._2)))
      val m1 = mapNow()
      m1 shouldBe Map(1L -> 1L, 2L -> 1L, 3L -> 3L, 4L -> 3L)
      m1 shouldBe scratch()

      // trigger 2 — a DELETE of a cluster min (1: partner 2 re-mints)
      // and an EDIT (4 re-crawled as fresh content 300: leaves {3,4})
      trigger(Seq(
        (5L, "delete", 1L, Seq.empty),
        (6L, "upsert", 4L, doc(4L, 300L)._2)))
      val m2 = mapNow()
      m2 shouldBe Map(2L -> 2L, 3L -> 3L, 4L -> 4L)
      m2 shouldBe scratch()
      // the delete retracted the index row too: no resurrection channel
      readOrEmpty(idxPath, emptyMap).filter(col("doc_id") === 1L).count() shouldBe 0L

      // trigger 3 — ingest matches EDITED and POST-DELETE state only:
      // 5 near-dups 4's NEW content (so {4,5}); 6 carries the DELETED
      // doc-1 content verbatim and must cluster with surviving 2, not
      // with the ghost of 1
      trigger(Seq(
        (7L, "upsert", 5L, doc(5L, 300L, Some(7))._2),
        (8L, "upsert", 6L, doc(6L, 100L)._2)))
      val m3 = mapNow()
      m3 shouldBe Map(2L -> 2L, 3L -> 3L, 4L -> 4L, 5L -> 4L, 6L -> 2L)
      m3 shouldBe scratch()

      // trigger 4 — within-trigger last-event-wins: delete 3 then
      // re-upsert 3 with content that joins {2,6}; and a pure
      // delete+re-add of 5 in event order upsert-then-delete = delete
      trigger(Seq(
        (9L, "delete", 3L, Seq.empty),
        (10L, "upsert", 3L, doc(3L, 100L, Some(20))._2),
        (11L, "upsert", 5L, doc(5L, 300L, Some(7))._2),
        (12L, "delete", 5L, Seq.empty)))
      val m4 = mapNow()
      m4 shouldBe Map(2L -> 2L, 3L -> 2L, 4L -> 4L, 6L -> 2L)
      m4 shouldBe scratch()
    } finally stream.stop()
  }
}
