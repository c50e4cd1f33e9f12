package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
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
  *    (k rows — broadcastable at any corpus size by construction,
  *    carrying the build-time cell populations for [[drift]]) and
  *    `corpus` (one row per vector: cell id + the int8-quantized
  *    vector stored as array<tinyint> — ACTUALLY 8x smaller than
  *    float64 at rest, not just in principle);
  *  - [[writeIndex]] persists them with the corpus HIVE-PARTITIONED BY
  *    CELL — the write-side layout that makes serve-side partition
  *    pruning real (the reference's own partitionBy-write /
  *    pruned-read pattern, IoHelpers.scala:106-109);
  *  - [[search]] answers a query batch against those tables with NO
  *    training and NO full-precision corpus access: probe assignment
  *    via the broadcast centroid cross-join, a LITERAL cell IN-list
  *    pushed into the corpus scan (the probed-cell set is <= k —
  *    metadata-sized — so collecting it to the driver is free and
  *    turns the partitioned layout into file skipping), exact-integer
  *    quantized scoring inside the probed cells only, top-k per
  *    query. Only ids and the integer score cross the exchange.
  *  - [[upsert]] ingests new vectors WITHOUT retraining: assign to the
  *    existing centroids (the same probe math, nprobe = 1), quantize,
  *    and APPEND — with the partitioned layout, only the touched cell
  *    directories receive new files; untouched cells are never
  *    rewritten. [[drift]] reports per-cell growth vs build time so a
  *    pipeline knows when assignment quality has decayed enough to
  *    retrain.
  *
  * Scale shape: serving cost is nprobe/k of the corpus at int8
  * bandwidth AND nprobe/k of the corpus FILES (partition pruning);
  * ingest cost is proportional to the batch. Degenerate vectors (zero
  * norm, NaN/Inf, NULL, null element, wrong dimension) are dropped at
  * build, upsert, and query time per the VectorKit.normalizable
  * policy — an index stores directions, and they have none.
  *
  * AnnIndexSpec drives the full persisted cycle (build -> partitioned
  * parquet -> fresh-read serve with an asserted pruned scan -> upsert
  * -> post-build vectors found -> drift), pinning the tinyint storage
  * schema; tools/IvfSqScale measures the 1M-vector lifecycle.
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
          .as("q8"),
        // one float per row: q8 stores the DIRECTION (unit x 127); the
        // norm makes the raw vector reconstructible (q8/127 x nrm, int8
        // rounding the only loss) — what [[splitCell]]'s local retrain
        // needs to stay in the same space as the probe centroids
        col("nrm").cast("float").as("nrm"))
    // materialize corpus before unpersisting the lineage it reads
    val out = corpus.localCheckpoint()
    base.unpersist()
    // build-time cell populations ride in the k-row centroid table —
    // the baseline [[drift]] compares against (left join: a cell the
    // k-means left empty still has a defined baseline of 0)
    val centroids = model.clusterCenters.toSeq.zipWithIndex
      .map { case (c, i) => (i, c.toArray.toSeq) }
      .toDF("cell", "centroid")
      .join(out.groupBy(col("cell")).agg(count(lit(1)).as("n_build")), Seq("cell"), "left")
      .na.fill(0L, Seq("n_build"))
    (centroids, out)
  }

  /** Persist the index: centroids plain, corpus partitioned by cell —
    * the layout [[search]]'s IN-list prunes and [[upsert]]'s append
    * extends without rewriting untouched cells.
    */
  def writeIndex(centroids: DataFrame, corpus: DataFrame, root: String): Unit = {
    centroids.write.mode("overwrite").parquet(s"$root/centroids")
    corpus.write.mode("overwrite").partitionBy("cell").parquet(s"$root/corpus")
  }

  /** Open a persisted index for serving: (centroids, corpus). */
  def openIndex(spark: SparkSession, root: String): (DataFrame, DataFrame) =
    (spark.read.parquet(s"$root/centroids"), spark.read.parquet(s"$root/corpus"))

  /** Nearest-`nprobe` cell assignment of `vecs` ((id, e) with e
    * already validated/normalized-length) against the broadcast k-row
    * centroid table: (id, cell). The one math shared by query probing
    * and [[upsert]] ingest (nprobe = 1) — so a vector ingested today
    * is probed tomorrow by the same rule.
    */
  private def assignCells(centroids: DataFrame, vecs: DataFrame, nprobe: Int): DataFrame = {
    val Seq(idC, vecC) = vecs.columns.toSeq
    val w = Window.partitionBy(col("__aid")).orderBy(col("d2").asc, col("cell").asc)
    vecs
      .select(col(idC).as("__aid"), col(vecC).as("__ae"))
      .crossJoin(broadcast(centroids.select(col("cell"), col("centroid"))))
      .withColumn(
        "d2",
        aggregate(
          zip_with(col("__ae"), col("centroid"), (x, y) => (x - y) * (x - y)),
          lit(0.0), (acc, x) => acc + x))
      .withColumn("pr", row_number().over(w))
      .filter(col("pr") <= nprobe)
      .select(col("__aid"), col("cell"))
  }

  /** Serve a query batch against the persisted tables. `queries` is
    * (qidCol, qvecCol: array<double>); un-normalizable queries are
    * dropped (they have no direction to search for). Returns
    * (qid, rk, nid, iscore) — iscore is the exact-integer quantized
    * dot, deterministic on any partitioning.
    *
    * Serving is EAGER about probe assignment: the probe table is
    * materialized once (localCheckpoint — reused by the cell collect
    * and the routing join), and the distinct probed-cell set (<= k by
    * construction, metadata-sized at any query-batch size) is
    * collected to the driver and pushed into the corpus scan as a
    * literal IN-list — on a [[writeIndex]] layout that is partition
    * pruning (only the probed cell directories are read; AnnIndexSpec
    * asserts it on the physical scan), on any other corpus it is still
    * a pushed data filter.
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
    val probes = assignCells(centroids, q.select(col("qid"), col("qe")), nprobe)
      .select(col("__aid").as("qid"), col("cell"))
      .localCheckpoint()
    val cells: Array[Any] = probes.select(col("cell")).distinct().collect().map(_.get(0))
    val w = Window.partitionBy(col("qid")).orderBy(col("iscore").desc, col("nid").asc)
    corpus
      .filter(col("cell").isin(cells.toIndexedSeq: _*))
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

  /** Ingest new vectors into a persisted index WITHOUT retraining:
    * validate/drop degenerates (the build policy), assign each to its
    * nearest EXISTING centroid (the [[assignCells]] math the serve
    * side probes with), quantize to the tinyint carrier, and append to
    * the partitioned corpus — only the touched cell directories gain
    * files; untouched cells keep their bytes. Caller contract: ids are
    * new (the corpus is append-only vector storage; identity dedup is
    * the dedup family's job upstream).
    *
    * Returns the number of vectors admitted. Assignment quality decays
    * as the ingested distribution drifts from the trained one —
    * [[drift]] is the alarm.
    */
  def upsert(
      root: String,
      newVectors: DataFrame,
      idCol: String = "vec_id",
      vecCol: String = "e",
      dim: Int = VectorKit.EmbeddingDim
  ): Long = {
    val spark = newVectors.sparkSession
    val centroids = spark.read.parquet(s"$root/centroids")
    val base = newVectors
      .filter(col(vecCol).isNotNull)
      .select(col(idCol), VectorKit.toDouble(col(vecCol), dim).as("e"))
      .withColumn("nrm", VectorKit.norm(col("e")))
      .filter(VectorKit.normalizable(col("nrm")))
      .select(
        col(idCol),
        col("e"),
        transform(VectorKit.quantize8(col("e"), col("nrm")), x => x.cast(ByteType))
          .as("q8"),
        col("nrm").cast("float").as("nrm"))
      .localCheckpoint()
    val rows = base
      .join(
        assignCells(centroids, base.select(col(idCol), col("e")), nprobe = 1)
          .select(col("__aid").as(idCol), col("cell")),
        Seq(idCol))
      .select(col(idCol), col("q8"), col("nrm"), col("cell"))
    rows.write.mode("append").partitionBy("cell").parquet(s"$root/corpus")
    base.count()
  }

  /** Split ONE oversized cell in place — the partition-scoped answer
    * to a [[drift]] alarm, so absorbing skew never costs a whole-index
    * retrain: a local 2-means runs on ONLY that cell's members (a
    * partition-PRUNED read of one directory; the int8 vectors carry
    * the directions, which is all a coarse quantizer needs), each
    * member is reassigned to the nearer sub-centroid, the cell's
    * partition directory is swapped for the two sub-cell directories
    * (same two-rename crash discipline as the shard upsert —
    * Streaming.recoverPartitionSwap heals an interruption on the next
    * call), and the k-row centroid table is rewritten with the old
    * row replaced and one row appended (new cell id = max + 1, so
    * probes of other cells never move). Serving needs no change:
    * [[search]] probes whatever centroid table it reads. Order is
    * corpus-first, centroids-second: between the two, probes of the
    * old centroid still route to the retained sub-cell (reduced
    * recall on the moved half for that instant, nothing lost), and a
    * crash there is healed by re-running the split's centroid step.
    * Cells with fewer than 2 members are left alone (nothing to
    * split). Returns the new cell id, or -1 for the no-op case.
    */
  def splitCell(
      root: String,
      cell: Int,
      dim: Int = VectorKit.EmbeddingDim
  ): Int = {
    import org.apache.spark.ml.clustering.KMeans
    import org.apache.spark.ml.functions.array_to_vector
    val spark = org.apache.spark.sql.SparkSession.active
    val corpusPath = s"$root/corpus"
    val fs = new org.apache.hadoop.fs.Path(corpusPath)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    graft.streaming.Streaming.recoverPartitionSwap(fs, corpusPath)
    val centroids = spark.read.parquet(s"$root/centroids")
    // partition-pruned: one directory read, however large the index.
    // The 2-means runs in RAW space — q8/127 x nrm reconstructs each
    // member up to int8 rounding — so the sub-centroids are
    // commensurable with the existing probe centroids (a q8-space fit
    // would put them on the unit-x-127 sphere and corrupt routing).
    val members = spark.read.parquet(corpusPath)
      .filter(col("cell") === cell)
      .withColumn("fv", array_to_vector(
        transform(col("q8"), x => x.cast(DoubleType) / lit(127.0) * col("nrm"))))
      .persist()
    try {
      if (members.count() < 2) return -1
      val model = new KMeans().setK(2).setSeed(42L).setFeaturesCol("fv").fit(members)
      val newCell = centroids.agg(max(col("cell"))).head.getInt(0) + 1
      val reassigned = model.transform(members)
        .select(
          col("vec_id"), col("q8"), col("nrm"),
          when(col("prediction") === 0, lit(cell)).otherwise(lit(newCell)).as("cell"))
      // stage both sub-cells, then swap the old directory out and the
      // new ones in (per-directory two-rename; recover heals a crash)
      val stage = new org.apache.hadoop.fs.Path(corpusPath + ".__stage")
      val oldRoot = new org.apache.hadoop.fs.Path(corpusPath + ".__oldparts")
      fs.delete(stage, true); fs.delete(oldRoot, true); fs.mkdirs(oldRoot)
      reassigned.write.mode("overwrite").partitionBy("cell").parquet(stage.toString)
      val curDir = new org.apache.hadoop.fs.Path(corpusPath, s"cell=$cell")
      val stageCur = new org.apache.hadoop.fs.Path(stage, s"cell=$cell")
      val stageNew = new org.apache.hadoop.fs.Path(stage, s"cell=$newCell")
      if (fs.exists(stageCur) || fs.exists(stageNew)) {
        fs.rename(curDir, new org.apache.hadoop.fs.Path(oldRoot, s"cell=$cell"))
        if (fs.exists(stageCur)) fs.rename(stageCur, curDir)
        if (fs.exists(stageNew))
          fs.rename(stageNew, new org.apache.hadoop.fs.Path(corpusPath, s"cell=$newCell"))
      }
      fs.delete(oldRoot, true); fs.delete(stage, true)
      // centroid table: replace the split row, append the new one; the
      // sub-cell populations become the new drift baselines
      val counts = spark.read.parquet(corpusPath)
        .filter(col("cell").isin(cell, newCell))
        .groupBy(col("cell")).agg(count(lit(1)).as("n_build"))
      val subCentroids = spark.createDataFrame(
        java.util.Arrays.asList(
          org.apache.spark.sql.Row(cell, model.clusterCenters(0).toArray.toSeq),
          org.apache.spark.sql.Row(newCell, model.clusterCenters(1).toArray.toSeq)),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("cell",
            org.apache.spark.sql.types.IntegerType),
          org.apache.spark.sql.types.StructField("centroid",
            org.apache.spark.sql.types.ArrayType(DoubleType)))))
        .join(counts, Seq("cell"), "left").na.fill(0L, Seq("n_build"))
      val updated = centroids.filter(col("cell") =!= cell)
        .unionByName(subCentroids.select(centroids.columns.map(col).toIndexedSeq: _*))
        .localCheckpoint()
      updated.write.mode("overwrite").parquet(s"$root/centroids")
      newCell
    } finally members.unpersist()
  }

  /** Per-cell drift report for a persisted index: (cell, n_build,
    * n_now, growth) where growth = (n_now - n_build) / max(n_build, 1).
    * A cell whose population has grown far past its build-time share
    * means the coarse quantizer no longer describes the corpus — the
    * retrain signal. k rows out; the only corpus-sized work is a
    * partial-agg'd count.
    */
  def drift(spark: SparkSession, root: String): DataFrame = {
    val (centroids, corpus) = openIndex(spark, root)
    centroids
      .select(col("cell"), col("n_build"))
      .join(corpus.groupBy(col("cell")).agg(count(lit(1)).as("n_now")), Seq("cell"), "left")
      .na.fill(0L, Seq("n_now"))
      .withColumn(
        "growth",
        (col("n_now") - col("n_build")).cast(DoubleType) / greatest(col("n_build"), lit(1L)))
  }
}
