package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ByteType, DoubleType}

import graft.functions.VectorKit

/** PERSISTED ANN index — the serve-side completion of the IVF x SQ8
  * composition (q_similarity_ivf_sq8 runs the same math in-plan; this
  * operator splits it into the production train-once / serve-many
  * lifecycle):
  *
  *  - [[build]] trains the coarse quantizer ONCE and emits the two
  *    index tables a serving fleet reads forever after: `centroids`
  *    (k rows — broadcastable at any corpus size by construction) and
  *    `corpus` (one row per vector: cell id + the int8-quantized
  *    vector stored as array<tinyint> — ACTUALLY 8x smaller than
  *    float64 at rest, not just in principle);
  *  - [[search]] answers a query batch against those tables with NO
  *    training and NO full-precision corpus access: probe assignment
  *    via the broadcast centroid cross-join (the q_similarity_ivf
  *    pattern), exact-integer quantized scoring inside the probed
  *    cells only, top-k per query. Only ids and the integer score
  *    cross the exchange.
  *
  * Scale shape: `corpus` shards by cell (a production table is
  * partitioned on it, so probes prune partitions); the per-query cost
  * is nprobe/k of the corpus at int8 bandwidth. Degenerate vectors
  * (zero norm, NaN/Inf, NULL, null element, wrong dimension) are
  * dropped at build per the VectorKit.normalizable policy — an index
  * stores directions, and they have none.
  *
  * AnnIndexSpec drives the full persisted cycle (build -> parquet ->
  * fresh read -> search) and pins the tinyint storage schema.
  */
object AnnIndex {

  /** Train the k-cell coarse quantizer on `emb` (idCol + vecCol:
    * array<double>) and return (centroids, corpus). `k` is clamped to
    * the distinct-point count by the caller if the corpus may be
    * tiny/degenerate (q_similarity_ivf's early-exit sampler); here the
    * index is assumed built from a real corpus.
    */
  def build(
      emb: DataFrame,
      k: Int,
      idCol: String = "vec_id",
      vecCol: String = "e",
      dim: Int = VectorKit.EmbeddingDim
  ): (DataFrame, DataFrame) = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = emb.sparkSession
    import spark.implicits._
    val base = emb
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), VectorKit.toDouble(col(vecCol), dim).as("e"))
      .withColumn("nrm", VectorKit.norm(col("e")))
      .filter(VectorKit.normalizable(col("nrm")))
      .withColumn("fv", array_to_vector(col("e")))
      .persist()
    val model = new KMeans().setK(k).setSeed(42L).setFeaturesCol("fv").fit(base)
    val corpus = model.transform(base)
      .withColumnRenamed("prediction", "cell")
      .select(
        col(idCol),
        col("cell"),
        // tinyint carrier: the actual 8x at-rest footprint. quantize8
        // proves int8-representability (PropertySpec), so the cast is
        // lossless.
        transform(VectorKit.quantize8(col("e"), col("nrm")), x => x.cast(ByteType))
          .as("q8"))
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
    // materialize corpus before unpersisting the lineage it reads
    val out = corpus.localCheckpoint()
    base.unpersist()
    (centroids, out)
  }

  /** Serve a query batch against the persisted tables. `queries` is
    * (qidCol, qvecCol: array<double>); un-normalizable queries are
    * dropped (they have no direction to search for). Returns
    * (qid, rk, nid, iscore) — iscore is the exact-integer quantized
    * dot, deterministic on any partitioning.
    */
  def search(
      centroids: DataFrame,
      corpus: DataFrame,
      queries: DataFrame,
      nprobe: Int,
      topK: Int,
      qidCol: String = "qid",
      qvecCol: String = "qe",
      dim: Int = VectorKit.EmbeddingDim
  ): DataFrame = {
    val q = queries
      .select(col(qidCol).as("qid"), VectorKit.toDouble(col(qvecCol), dim).as("qe"))
      .withColumn("qn", VectorKit.norm(col("qe")))
      .filter(VectorKit.normalizable(col("qn")))
      .withColumn("qq", VectorKit.quantize8(col("qe"), col("qn")))
      .select(col("qid"), col("qe"), col("qq"))
    val wProbe = Window.partitionBy(col("qid")).orderBy(col("d2").asc, col("cell").asc)
    val probes = q
      .select(col("qid"), col("qe"))
      .crossJoin(broadcast(centroids))
      .withColumn(
        "d2",
        aggregate(
          zip_with(col("qe"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("pr", row_number().over(wProbe))
      .filter(col("pr") <= nprobe)
      .select(col("qid"), col("cell"))
    val w = Window.partitionBy(col("qid")).orderBy(col("iscore").desc, col("nid").asc)
    corpus
      .join(broadcast(probes), Seq("cell"))
      .join(broadcast(q.select(col("qid"), col("qq"))), Seq("qid"))
      .filter(col("vec_id") =!= col("qid"))
      .select(
        col("qid"),
        col("vec_id").as("nid"),
        VectorKit.dot(col("qq"), transform(col("q8"), _.cast(DoubleType))).as("iscore"))
      .withColumn("rk", row_number().over(w))
      .filter(col("rk") <= topK)
      .select(col("qid"), col("rk"), col("nid"), col("iscore"))
  }
}
