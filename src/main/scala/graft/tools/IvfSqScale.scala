package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.VectorKit

/** Scale demonstration for the IVF x SQ8 composition (the shape of
  * q_similarity_ivf_sq8 at a 1M-vector corpus): coarse k-means cells
  * bound WHICH vectors a query touches, int8 quantization bounds the
  * BYTES per touch, exact re-rank restores full precision at the top.
  *
  * Corpus: the AnnScale generator verbatim (1M deterministic 64-dim
  * vectors; every id % 20000 == 1 is a 0.999-cosine near-copy of
  * id-1). The demo measures the two claims the composition makes:
  *  - CANDIDATE WORK <= IVF's: per query, only the nprobe probed
  *    cells' members are scored (printed as a fraction of the corpus);
  *  - SQ8's FOOTPRINT: the scored representation is the int8 corpus
  *    (8x smaller than float64 at rest; the exact vectors are touched
  *    only for the candidateK re-rank rows).
  * Recall bar: a 0.999-cosine planted pair survives int8 rounding by
  * ~3 orders of magnitude (SqScale), so the only loss channel is the
  * coarse quantizer mis-celling a neighbor — the same channel IVF-flat
  * has, bounded here by demanding >= 0.95 top-1 recall of planted
  * neighbors over the 50-query panel.
  *
  * Usage: runMain graft.tools.IvfSqScale [nVecs]
  *
  * MEASURED (1M vectors, k=32 cells, nprobe=2, local[32], load1 ~6-9
  * co-tenant): k-means train 17.3 s; assign+quantize+checkpoint
  * 1.3 s; probe+score+rerank+recall 28.5 s over the 50-query panel;
  * candidates/query ~63k = 6.3% of the corpus (the IVF pruning,
  * 2/32 cells), scored on int8 values; top-1 recall 50/50. Candidate
  * work per query is ~16x below the un-pruned SQ8 brute-force scan
  * (SqScale) — the training cost amortizes over every future query,
  * which is the IVF trade.
  */
object IvfSqScale {
  def main(args: Array[String]): Unit = {
    val nVecs = args.headOption.map(_.toLong).getOrElse(1000000L)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect, one source of truth
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[ivfsq-scale] $name%-28s sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      v
    }

    val dim = 64
    val k = 32
    val nprobe = 2
    val candidateK = 20
    val cid = when(col("vec_id") % 20000 === 1, col("vec_id") - 1).otherwise(col("vec_id"))
    val vec = transform(sequence(lit(0), lit(dim - 1)), j => {
      val h = pmod(xxhash64(cid * dim + j), lit(2000001L))
      val base = (h - 1000000L).cast(DoubleType) / 1000000.0
      base + when(col("vec_id") % 20000 === 1 && j === 3, lit(0.2)).otherwise(lit(0.0))
    })

    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val emb0 = spark.range(nVecs).select(col("id").as("vec_id"))
      .select(col("vec_id"), vec.as("e"))
      .withColumn("nrm", VectorKit.norm(col("e")))
      .withColumn("fv", array_to_vector(col("e")))
      .persist()
    val model = time("kmeans train") {
      val m = new KMeans().setK(k).setSeed(42L).setFeaturesCol("fv").fit(emb0)
      m
    }
    val assigned = time("assign+quantize+checkpoint") {
      val a = model.transform(emb0)
        .withColumnRenamed("prediction", "cell")
        .withColumn("q8", VectorKit.quantize8(col("e"), col("nrm")))
        .select(col("vec_id"), col("cell"), col("e"), col("nrm"), col("q8"))
        .localCheckpoint()
      emb0.unpersist()
      a
    }
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")

    val queries = assigned.filter(col("vec_id") % 20000 === 1)
      .select(col("vec_id").as("qid"), col("e").as("qe"),
        col("nrm").as("qn"), col("q8").as("qq"))
      .localCheckpoint()

    time("probe+score+rerank+recall") {
      val wProbe = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
      val probeDf = queries
        .select(col("qid"), col("qe"))
        .crossJoin(broadcast(centroids))
        .withColumn("d2",
          aggregate(zip_with(col("qe"), col("centroid"), (x, y) => (x - y) * (x - y)),
            lit(0.0), (acc, x) => acc + x))
        .withColumn("pr", row_number().over(wProbe))
        .filter(col("pr") <= nprobe)
        .select(col("qid"), col("cell"))
      val wC = Window.partitionBy(col("qid")).orderBy(col("iscore").desc, col("nid").asc)
      val candAll = assigned
        .select(col("cell"), col("vec_id"), col("q8"))
        .join(broadcast(probeDf), Seq("cell"))
        .join(broadcast(queries.select(col("qid"), col("qq"))), Seq("qid"))
        .filter(col("vec_id") =!= col("qid"))
        .localCheckpoint()
      val nQueries = queries.count()
      val nCand = candAll.count()
      println(f"[ivfsq-scale] candidates/query=${nCand / math.max(1, nQueries)}%d " +
        f"(${100.0 * nCand / math.max(1, nQueries) / nVecs}%.1f%% of corpus)")
      val cand = candAll
        .select(col("qid"), col("vec_id").as("nid"),
          VectorKit.dot(col("qq"), col("q8")).as("iscore"))
        .withColumn("crk", row_number().over(wC))
        .filter(col("crk") <= candidateK)
        .select(col("qid"), col("nid"))
      val wE = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid").asc)
      val top1 = assigned
        .select(col("vec_id").as("nid"), col("e"), col("nrm"))
        .join(broadcast(cand), Seq("nid"))
        .join(broadcast(queries.select(col("qid"), col("qe"), col("qn"))), Seq("qid"))
        .select(col("qid"), col("nid"),
          (VectorKit.dot(col("qe"), col("e")) / (col("qn") * col("nrm"))).as("cos"))
        .withColumn("rk", row_number().over(wE))
        .filter(col("rk") === 1)
        .select(col("qid"), col("nid"))
      val hits = top1.filter(col("nid") === col("qid") - 1).count()
      val recall = hits.toDouble / nQueries
      println(f"[ivfsq-scale] queries=$nQueries top1-recall=$hits/$nQueries " +
        f"(${recall * 100}%.1f%%) k=$k nprobe=$nprobe candidateK=$candidateK")
      require(recall >= 0.95, f"IVF-SQ8 top-1 recall $recall%.4f below the 0.95 floor")
    }
    spark.stop()
  }
}
