package graft.tools

import org.apache.spark.sql.functions._

/** 1M-vector scale proof for the HNSW graph tier (the family
  * convention: every ANN tier carries a million-row recall point —
  * AnnScale, IvfSqScale): build SHARDED per-partition graphs over 1M
  * deterministic synthetic 64-dim vectors, serve a query panel
  * through every shard, and score recall@10 against the exact
  * brute-force top-10.
  *
  * The claims under measurement:
  *  1. BUILD is per-shard local work with no driver state — 16 shards
  *     of ~62.5k vectors build in parallel inside one mapPartitions
  *     pass (wall = slowest shard, not the sum);
  *  2. SERVE is O(shards · ef · log n) dots per query, not a corpus
  *     scan — the panel fans over the shard graphs and a global
  *     top-10 merge wins;
  *  3. RECALL holds at corpus scale: served@10 ⊆ exact top-10 with
  *     high overlap (printed; the gate rung asserts the stricter
  *     top-3 ⊆ top-10 contract at its fixture sizes).
  *
  * Usage: runMain graft.tools.HnswScale [rows] [queries] [shards]
  *                                        [m] [efConstruction] [efSearch]
  *
  * MEASURED (64 dims, local[32], r18) — uniform-random unit vectors,
  * the WORST regime for graph ANN (no cluster structure, cosine
  * margins ~1/sqrt(dim)); the parameter ladder is the finding:
  *
  *  - 62.5k, 1 shard: m=8/efC=64/ef=96 -> recall@10 0.544;
  *    m=16/efC=128/ef=128 -> 0.913; m=16/efC=200/ef=256 -> 0.975.
  *    (The first point is what exposed the need for the paper's
  *    select-neighbors diversity heuristic — closest-M selection had
  *    collapsed to 0.35 at 1M before it.)
  *  - 1M, 16 shards, m=16/efC=128 (the tool defaults): ef=192 ->
  *    0.819, ef=384 -> **0.934 (299/320), every query >=1 exact hit,
  *    PASS** — build+serve 296 s wall (per-shard builds dominate, 16
  *    in parallel), exact panel 3.7 s.
  *
  * Real embedding corpora (clustered) sit well above this curve; the
  * gate rung keeps the light fixture regime (m=8/efC=64/ef=96 — its
  * top-3-in-top-10 contract held 10/10 at both sf points), and a
  * serving deployment picks from this ladder by recall target.
  *
  * PERSISTED-TIER legs (r19, 1M × 64 dims, m=16/efC=128/ef=384):
  * in-pass build+serve 320 s at recall@10 0.934; HnswIndex.save
  * (per-SHARD graphs as a graft table) 715 s — the tool pays a
  * second build here, production calls save() once; serve from the
  * PERSISTED rows 17-44 s for the 32-query panel (deserialize floor;
  * no rebuild) at recall@10 **0.978** — HIGHER than the in-pass
  * point because save() builds one true graph per shard while the
  * in-pass leg's hash partitioning merges colliding shards into
  * fewer, larger graphs; incremental insert of 1k appended vectors
  * 120 s (all 16 shards extend + rewrite), post-insert recall
  * unchanged at 0.978 and every inserted vector is its own nearest
  * neighbor.
  */
object HnswScale {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toLong).getOrElse(1000000L)
    val nQueries = args.drop(1).headOption.map(_.toInt).getOrElse(32)
    val nShards = args.drop(2).headOption.map(_.toInt).getOrElse(16)
    val mParam = args.drop(3).headOption.map(_.toInt).getOrElse(16)
    val efC = args.drop(4).headOption.map(_.toInt).getOrElse(128)
    val efS = args.drop(5).headOption.map(_.toInt).getOrElse(384)
    val dim = 64
    val spark = graft.core.Session.driverLocal("32", "graft-hnsw-scale")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](name: String)(f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[hnsw-scale] $name%-42s sec=$dt%.1f")
      (a, dt)
    }

    // deterministic synthetic unit vectors: per-coordinate splitmix of
    // (id, d) — same recipe as HnswSpec, scaled up
    val unitVec = udf { (id: Long) =>
      val v = Array.tabulate(dim) { d =>
        var z = (id * 31 + d) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) % 2000L).toDouble / 1000.0
      }
      val n = math.sqrt(v.map(x => x * x).sum)
      v.map(_ / n).toSeq
    }
    val corpus = spark.range(rows)
      .select(col("id").as("vec_id"), unitVec(col("id")).as("u"))
      .localCheckpoint()

    val qRows: Array[(Long, Array[Double])] = corpus
      .filter(col("vec_id") % (rows / nQueries) === 0L)
      .limit(nQueries)
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
      .map { case (i, v) => (i, v.toArray) }
    val qB = spark.sparkContext.broadcast(qRows)

    // build per-shard graphs AND serve the panel in one pass: wall =
    // slowest shard's (build + nQueries searches)
    val (served, _) = time(
      s"build $nShards shard graphs (m=$mParam efC=$efC) + serve $nQueries (ef=$efS)") {
      corpus.withColumn("sh", pmod(col("vec_id"), lit(nShards)))
        .repartition(nShards, col("sh"))
        .select(col("vec_id"), col("u")).as[(Long, Seq[Double])]
        .mapPartitions { it =>
          val pts = it.map { case (id, v) => (id, v.toArray) }
            .toIndexedSeq.sortBy(_._1)
          if (pts.isEmpty) Iterator.empty
          else {
            val g = graft.operators.Hnsw.build(pts, m = mParam, efConstruction = efC)
            qB.value.iterator.flatMap { case (qid, qv) =>
              graft.operators.Hnsw.search(g, qv, k = 11, ef = efS).iterator
                .filter(_._1 != qid)
                .map { case (nid, cos) => (qid, nid, cos) }
            }
          }
        }.toDF("qid", "nid", "cos")
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("nid"))
        .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    }

    val (exact, _) = time("exact brute-force top-10 panel") {
      val qDf = qRows.toSeq.map { case (i, v) => (i, v.toSeq) }.toDF("qid", "qe")
      corpus.join(broadcast(qDf), col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id").as("nid"),
          graft.plans.GraftExtensions.dotProduct(col("u"), col("qe")).as("cos"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("nid"))
        .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    }

    def recallOf(got: Map[Long, Set[Long]], label: String): Double = {
      var hit = 0; var tot = 0; var top1 = 0
      qRows.foreach { case (q, _) =>
        val s = got.getOrElse(q, Set.empty)
        val e = exact.getOrElse(q, Set.empty)
        hit += s.intersect(e).size
        tot += e.size
        if (s.nonEmpty && e.nonEmpty && s.intersect(e).nonEmpty) top1 += 1
      }
      println(f"[hnsw-scale] $label recall@10 = ${hit.toDouble / tot}%.3f " +
        s"($hit/$tot), queries with >=1 exact hit: $top1/${qRows.length}")
      hit.toDouble / tot
    }
    val buildRecall = recallOf(served, "build-time")
    require(buildRecall >= 0.85, s"HNSW recall@10 collapsed at scale: $buildRecall")

    // --- PERSISTED TIER (r19): save through the manifest machinery,
    // serve WITHOUT rebuild, extend incrementally ---
    val root = java.nio.file.Files
      .createTempDirectory("graft-hnsw-scale-idx").toString + "/idx"
    time(s"persist index: $nShards shard graphs as a graft table") {
      graft.operators.HnswIndex.save(spark, corpus, root, nShards,
        m = mParam, efConstruction = efC, batchId = 1L)
    }
    def servePersisted(label: String): Map[Long, Set[Long]] = time(label) {
      graft.operators.HnswIndex.serve(spark, root, qRows, k = 11, ef = efS)
        .filter(col("qid") =!= col("nid"))
        .withColumn("rk", row_number().over(
          org.apache.spark.sql.expressions.Window
            .partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)))
        .filter(col("rk") <= 10)
        .select(col("qid"), col("nid"))
        .collect().groupBy(_.getLong(0)).map { case (q, rs) =>
          q -> rs.map(_.getLong(1)).toSet
        }
    }._1
    val servedPersisted = servePersisted(
      s"serve $nQueries from PERSISTED graphs (no rebuild, ef=$efS)")
    val persistedRecall = recallOf(servedPersisted, "persisted-serve")
    require(persistedRecall >= buildRecall - 0.02,
      f"persisted serve lost recall: $persistedRecall%.3f vs build $buildRecall%.3f")

    // incremental insert: 1k appended vectors, one commit, then the
    // panel still answers and the new ids are searchable
    val lateDf = spark.range(rows, rows + 1000L)
      .select(col("id").as("vec_id"), unitVec(col("id")).as("u"))
    time("incremental insert of 1k appended vectors") {
      graft.operators.HnswIndex.insert(spark, root, lateDf, batchId = 2L)
    }
    val afterInsert = servePersisted(s"serve $nQueries after the insert")
    val afterRecall = recallOf(afterInsert, "post-insert")
    require(afterRecall >= buildRecall - 0.05,
      f"insert degraded recall: $afterRecall%.3f vs build $buildRecall%.3f")
    val lateQ: Array[(Long, Array[Double])] = lateDf.limit(4)
      .as[(Long, Seq[Double])].collect().map { case (i, v) => (i, v.toArray) }
    val self = graft.operators.HnswIndex.serve(spark, root, lateQ, k = 1, ef = efS)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    lateQ.foreach { case (qid, _) => require(self(qid) == qid,
      s"inserted vector $qid is not its own nearest neighbor (${self(qid)})") }
    println("[hnsw-scale] PASS")
    spark.stop()
  }
}
