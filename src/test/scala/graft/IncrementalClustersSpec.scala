package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.{ConnectedComponents, IncrementalClusters, MinHashLsh}
import graft.streaming.Streaming

/** Incremental cluster maintenance: the persisted (doc_id, cluster)
  * map stays equal to a from-scratch clustering of the whole corpus at
  * every batch boundary, while each batch only does batch-sized work
  * and only rewrites the shards it touches.
  *
  * The merge case is the hard one, built from real Jaccard geometry:
  * one-token variants of a common base at positions 7 and 20 each
  * clear tau against the base (35/41 ≈ 0.854) but sit BELOW tau of
  * each other (32/44 ≈ 0.727) — so when the base itself arrives LAST,
  * it bridges two existing clusters and both must relabel to the
  * smaller id.
  */
class IncrementalClustersSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private def doc(id: Long, cid: Long, variantAt: Option[Int] = None): (Long, Seq[String]) =
    id -> (0 until 40).map { j =>
      if (variantAt.contains(j)) s"v$id-$j"
      else s"t${math.abs((cid * 2654435761L + j * 40503L) % 10000)}"
    }

  private def prep(rows: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    MinHashLsh.prepare(rows.toDF("doc_id", "w"), "doc_id", "w")
  }

  test("maintain: assignment, isolated docs, and a two-cluster merge relabel") {
    import spark.implicits._
    val map = Seq((1L, 1L), (2L, 2L), (5L, 5L), (6L, 5L)).toDF("doc_id", "cluster")
    val newDocs = Seq(10L, 11L).toDF("doc_id")
    // doc 10 bridges clusters 1 and 2; doc 11 is isolated
    val cross = Seq((10L, 1L), (10L, 2L)).toDF("d_new", "d_old")
    val inBatch = spark.emptyDataFrame
      .sparkSession.createDataFrame(Seq.empty[(Long, Long)]).toDF("d1", "d2")
    val rows = IncrementalClusters.maintain(map, newDocs, cross, inBatch)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // 10 joins the merged component (min = 1); 11 is its own cluster;
    // cluster 2's member relabels to 1. Cluster 5 is untouched: no row.
    rows shouldBe Set((10L, 1L), (11L, 11L), (2L, 1L))
  }

  test("maintain: edge-free batch is all singletons") {
    import spark.implicits._
    val map = Seq((1L, 1L)).toDF("doc_id", "cluster")
    val empty = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("a", "b")
    val rows = IncrementalClusters
      .maintain(map, Seq(7L, 8L).toDF("doc_id"), empty.toDF("d_new", "d_old"), empty)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows shouldBe Set((7L, 7L), (8L, 8L))
  }

  test("remove: min-removal mints a new id, bridge-removal splits, untouched clusters emit no rows") {
    import spark.implicits._
    // cluster 1 = {1,2,3} held together by bridge 2 (edges 1-2, 2-3);
    // cluster 5 = {5,6}; cluster 8 = {8,9} untouched
    val map = Seq((1L, 1L), (2L, 1L), (3L, 1L), (5L, 5L), (6L, 5L), (8L, 8L), (9L, 8L))
      .toDF("doc_id", "cluster")
    // remove the bridge 2 AND the min 5: component {1,3} loses its
    // connectivity (no surviving edge), component {6} loses its id
    val removed = Seq(2L, 5L).toDF("doc_id")
    val survEdges = spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("d1", "d2")
    val rows = IncrementalClusters.remove(map, removed, survEdges)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows shouldBe Set((1L, 1L), (3L, 3L), (6L, 6L))

    // surviving connectivity holds a component together: removing 3
    // from {1,2,3} with edge 1-2 intact keeps cluster 1 whole
    val rows2 = IncrementalClusters.remove(
        map, Seq(3L).toDF("doc_id"), Seq((1L, 2L)).toDF("d1", "d2"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    rows2 shouldBe Set((1L, 1L), (2L, 1L))
  }

  test("persisted cycle: batches maintain the map shard-scoped and equal the from-scratch clustering") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-inc-clusters").toString
    val idxPath = root + "/index"
    val mapPath = root + "/clusters"
    val shardSize = 10L

    def upsertSharded(path: String)(rows: DataFrame, version: Long): Unit =
      Streaming.upsertPartitionedBatch(path, "doc_id", "batch_id", "shard")(
        MinHashLsh.withShard(rows.withColumn("batch_id", lit(version)), "doc_id", shardSize),
        version)

    var allDocs = Seq.empty[(Long, Seq[String])]
    def ingest(batch: Seq[(Long, Seq[String])], version: Long): Unit = {
      val prepared = prep(batch).localCheckpoint()
      val (cross, inBatch) =
        if (version == 1L) {
          // first batch: no index yet
          val e = spark.createDataFrame(Seq.empty[(Long, Long)])
          (e.toDF("d_new", "d_old"),
            MinHashLsh.verify(prepared, MinHashLsh.candidates(prepared, "doc_id"), "doc_id", 0.8)
              .select(col("d1"), col("d2")))
        } else {
          val idx = Streaming.readCommitted(spark, idxPath)
          (MinHashLsh.verifyAgainst(prepared, idx,
            MinHashLsh.candidatesAgainst(prepared, idx, "doc_id"), "doc_id", 0.8)
            .select(col("d_new"), col("d_old")),
            MinHashLsh.verify(prepared, MinHashLsh.candidates(prepared, "doc_id"), "doc_id", 0.8)
              .select(col("d1"), col("d2")))
        }
      val map =
        if (version == 1L)
          spark.createDataFrame(Seq.empty[(Long, Long)]).toDF("doc_id", "cluster")
        else Streaming.readCommitted(spark, mapPath).select(col("doc_id"), col("cluster"))
      val rows = IncrementalClusters.maintain(
        map, prepared.select(col("doc_id")), cross, inBatch)
      upsertSharded(mapPath)(rows, version)
      // the index holds EVERY doc (clustering state, not admission):
      // future batches must link transitively through duplicates too
      upsertSharded(idxPath)(MinHashLsh.index(prepared, "doc_id"), version)
      allDocs ++= batch
    }

    // batch 1: six distinct docs -> six singletons
    ingest((1L to 6L).map(i => doc(i, cid = i)), 1L)
    // batch 2: 11 ~ indexed 1 (variant@7); 12 fresh; 14 = variant@7 of
    // an UNSEEN base content (cid 99) -> isolated for now
    ingest(Seq(doc(11L, 1L, Some(7)), doc(12L, 12L), doc(14L, 99L, Some(7))), 2L)
    // batch 3: 23 = variant@20 of cid 99 — BELOW tau vs 14 (0.727), so
    // it forms its own cluster; 21 ~ indexed 1 via variant@20 (0.854
    // vs base 1; 21 vs 11 is 0.727 but both link through 1)
    ingest(Seq(doc(21L, 1L, Some(20)), doc(23L, 99L, Some(20))), 3L)
    locally {
      val m = Streaming.readCommitted(spark, mapPath)
        .select(col("doc_id"), col("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      m(11L) shouldBe 1L
      m(21L) shouldBe 1L
      m(14L) shouldBe 14L
      m(23L) shouldBe 23L // NOT merged with 14 yet — the geometry says so
    }
    def shardFiles(path: String, shard: Int): Set[String] = {
      val it = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$path/shard=$shard"))
      try it.filter(_.toString.endsWith(".parquet")).toArray.map(_.toString).toSet
      finally it.close()
    }
    val mapShard0Before = shardFiles(mapPath, 0)
    val mapShard1Before = shardFiles(mapPath, 1)

    // batch 4: the BASE of cid 99 arrives (id 31) — it bridges the two
    // variant clusters {14} and {23}: everything relabels to 14, and
    // the rewrite touches only the shards holding 23 and 31
    ingest(Seq(doc(31L, 99L)), 4L)
    val finalMap = Streaming.readCommitted(spark, mapPath)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    finalMap(14L) shouldBe 14L
    finalMap(23L) shouldBe 14L // the merge loser relabeled
    finalMap(31L) shouldBe 14L
    finalMap(12L) shouldBe 12L
    withClue("merge rewrite must not touch shards without affected docs: ") {
      shardFiles(mapPath, 0) shouldBe mapShard0Before
      shardFiles(mapPath, 1) shouldBe mapShard1Before
    }

    // THE COMPOSITION THEOREM: the incrementally-maintained map equals
    // the from-scratch clustering of the full corpus (same tau, same
    // pipeline, cluster = min reachable id; singletons included)
    val all = prep(allDocs).localCheckpoint()
    val pairs = MinHashLsh.verify(all, MinHashLsh.candidates(all, "doc_id"), "doc_id", 0.8)
    val lbl = ConnectedComponents.labels(pairs.select(col("d1"), col("d2")))
    val scratch = all.select(col("doc_id"))
      .join(lbl.withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    finalMap shouldBe scratch

    // ------------------------------------------------------------------
    // THE DECREMENTAL HALF, against the same persisted state: retract
    // id 1 (the min AND sole bridge of {1,11,21} — 11~1 and 21~1 hold
    // but 11~21 is 0.727 < tau) and id 31 (the bridge of {14,23,31},
    // same geometry). Both clusters must SPLIT into singletons with
    // fresh min ids, the index and map rows must disappear through the
    // shard-scoped delete, and the repaired map must equal a
    // from-scratch clustering of the corpus minus the removed docs —
    // the equality theorem, decremental direction.
    val removedIds = Seq(1L, 31L).toDF("doc_id")
    def shardedKeys(ids: DataFrame): DataFrame =
      MinHashLsh.withShard(ids, "doc_id", shardSize)
    Streaming.deleteFromPartitioned(idxPath, "doc_id", "shard")(
      shardedKeys(removedIds)) shouldBe 2L
    val idxAfter = Streaming.readCommitted(spark, idxPath)
    idxAfter.filter(col("doc_id").isin(1L, 31L)).count() shouldBe 0L

    val mapNow = Streaming.readCommitted(spark, mapPath).select(col("doc_id"), col("cluster"))
    // survivors of the touched clusters, reclustered over their STORED
    // index rows (component-sized: semi-join, then candidates+verify
    // among the survivors only — the corpus text is never rescanned)
    val touched = mapNow.join(removedIds, Seq("doc_id"), "left_semi")
      .select(col("cluster")).distinct()
    val survivorIds = mapNow.join(touched, Seq("cluster"), "left_semi")
      .join(removedIds, Seq("doc_id"), "left_anti").select(col("doc_id"))
    val survRows = idxAfter.join(survivorIds, Seq("doc_id"), "left_semi").localCheckpoint()
    val survEdges = MinHashLsh
      .verify(survRows, MinHashLsh.candidates(survRows, "doc_id"), "doc_id", 0.8)
      .select(col("d1"), col("d2"))
    val repairs = IncrementalClusters.remove(mapNow, removedIds, survEdges)
      .localCheckpoint()
    Streaming.deleteFromPartitioned(mapPath, "doc_id", "shard")(
      shardedKeys(removedIds)) shouldBe 2L
    upsertSharded(mapPath)(repairs, 5L)

    val afterMap = Streaming.readCommitted(spark, mapPath)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    afterMap.contains(1L) shouldBe false
    afterMap.contains(31L) shouldBe false
    afterMap(11L) shouldBe 11L // lost its min 1: fresh id
    afterMap(21L) shouldBe 21L // lost its bridge 1: split
    afterMap(14L) shouldBe 14L
    afterMap(23L) shouldBe 23L // lost its bridge 31: split

    val remaining = allDocs.filterNot(d => d._1 == 1L || d._1 == 31L)
    val all2 = prep(remaining).localCheckpoint()
    val pairs2 = MinHashLsh.verify(all2, MinHashLsh.candidates(all2, "doc_id"), "doc_id", 0.8)
    val scratch2 = all2.select(col("doc_id"))
      .join(ConnectedComponents.labels(pairs2.select(col("d1"), col("d2")))
        .withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
      .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    afterMap shouldBe scratch2
  }

  test("edit: a changed doc leaves its old cluster, joins its new neighborhood, and can become its min") {
    import spark.implicits._
    val root = Files.createTempDirectory("graft-inc-edit").toString
    val idxPath = root + "/index"
    val mapPath = root + "/clusters"
    val shardSize = 10L
    def upsertSharded(path: String)(rows: DataFrame, version: Long): Unit =
      Streaming.upsertPartitionedBatch(path, "doc_id", "batch_id", "shard")(
        MinHashLsh.withShard(rows.withColumn("batch_id", lit(version)), "doc_id", shardSize),
        version)

    // corpus: 1(c1) 2(c2) 3(c3) 5(c2@7) -> map {2,5}=2, singletons 1,3
    var corpus = Map(
      1L -> doc(1L, 1L), 2L -> doc(2L, 2L), 3L -> doc(3L, 3L),
      5L -> doc(5L, 2L, Some(7)))
    locally {
      val p = prep(corpus.values.toSeq).localCheckpoint()
      upsertSharded(idxPath)(MinHashLsh.index(p, "doc_id"), 1L)
      val pairs = MinHashLsh.verify(p, MinHashLsh.candidates(p, "doc_id"), "doc_id", 0.8)
      val map = p.select(col("doc_id"))
        .join(ConnectedComponents.labels(pairs.select(col("d1"), col("d2")))
          .withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
      upsertSharded(mapPath)(map, 1L)
    }
    Streaming.readCommitted(spark, mapPath).filter(col("doc_id") === 5L)
      .select("cluster").head.getLong(0) shouldBe 2L

    /** Re-ingest `edited` (changed content) end to end: latest-wins
      * index replace, old-neighborhood repair edges from the STORED
      * survivor rows, new-content cross edges vs the index minus the
      * edited ids, IncrementalClusters.edit, map upsert.
      */
    def reingest(edited: Seq[(Long, Seq[String])], version: Long): Unit = {
      val editedIds = edited.map(_._1).toDF("doc_id")
      val newPrep = prep(edited).localCheckpoint()
      val map = Streaming.readCommitted(spark, mapPath).select(col("doc_id"), col("cluster"))
      // old-cluster survivors' edges, from the index BEFORE replacement
      val idx0 = Streaming.readCommitted(spark, idxPath)
      val touched = map.join(editedIds, Seq("doc_id"), "left_semi")
        .select(col("cluster")).distinct()
      val survivorIds = map.join(touched, Seq("cluster"), "left_semi")
        .join(editedIds, Seq("doc_id"), "left_anti").select(col("doc_id"))
      val survRows = idx0.join(survivorIds, Seq("doc_id"), "left_semi").localCheckpoint()
      val survEdges = MinHashLsh
        .verify(survRows, MinHashLsh.candidates(survRows, "doc_id"), "doc_id", 0.8)
        .select(col("d1"), col("d2"))
      // latest-wins index replacement, then cross edges vs the REST
      upsertSharded(idxPath)(MinHashLsh.index(newPrep, "doc_id"), version)
      val idxRest = Streaming.readCommitted(spark, idxPath)
        .join(editedIds, Seq("doc_id"), "left_anti")
      val cross = MinHashLsh.verifyAgainst(newPrep, idxRest,
        MinHashLsh.candidatesAgainst(newPrep, idxRest, "doc_id"), "doc_id", 0.8)
        .select(col("d_new"), col("d_old"))
      val inBatch = MinHashLsh
        .verify(newPrep, MinHashLsh.candidates(newPrep, "doc_id"), "doc_id", 0.8)
        .select(col("d1"), col("d2"))
      val delta = IncrementalClusters.edit(map, editedIds, survEdges, cross, inBatch)
      upsertSharded(mapPath)(delta, version)
      corpus ++= edited.map(d => d._1 -> d)
    }
    def mapNow(): Map[Long, Long] = Streaming.readCommitted(spark, mapPath)
      .select(col("doc_id"), col("cluster"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    def scratchNow(): Map[Long, Long] = {
      val p = prep(corpus.values.map(d => d).toSeq).localCheckpoint()
      val pairs = MinHashLsh.verify(p, MinHashLsh.candidates(p, "doc_id"), "doc_id", 0.8)
      p.select(col("doc_id"))
        .join(ConnectedComponents.labels(pairs.select(col("d1"), col("d2")))
          .withColumnRenamed("node", "doc_id"), Seq("doc_id"), "left_outer")
        .select(col("doc_id"), coalesce(col("cluster"), col("doc_id")).as("cluster"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    }

    // edit 1 — neighborhood SHRINK + SWITCH: doc 5 re-crawled as a
    // near-copy of doc 3's content. Its old cluster {2,5} must NOT
    // retain it; it must land in doc 3's cluster.
    reingest(Seq(doc(5L, 3L, Some(7))), 2L)
    val m1 = mapNow()
    m1(2L) shouldBe 2L // old partner repaired to a singleton
    m1(5L) shouldBe 3L // joined the new neighborhood
    m1 shouldBe scratchNow()

    // edit 2 — the re-used id becomes the NEW MIN of the component it
    // joins: doc 1 re-crawled as a variant@20 of content 3 (links to 3;
    // 1-vs-5 is the 0.727 two-variant geometry, below tau). The whole
    // {3,5} cluster must relabel to 1 through maintain's loser path.
    reingest(Seq(doc(1L, 3L, Some(20))), 3L)
    val m2 = mapNow()
    m2(1L) shouldBe 1L
    m2(3L) shouldBe 1L
    m2(5L) shouldBe 1L
    m2(2L) shouldBe 2L
    m2 shouldBe scratchNow()
  }
}
