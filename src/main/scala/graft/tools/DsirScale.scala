package graft.tools

import org.apache.spark.sql.functions._

/** Scale demonstration for DSIR importance resampling: run the
  * REGISTERED q_corpus_dsir query over millions of synthetic documents
  * with PLANTED domain classes and assert the selection separates them
  * completely:
  *
  *  - target-domain docs (id % 2 == 0, lang='en'): 24 tokens walking
  *    the shared 24-word vocabulary with stride 1 â their bigrams are
  *    the 24 adjacent pairs of the cycle, which only 'en' docs
  *    produce, so those buckets have ct ~ cr and per-position weight
  *    ln((nr+B)/(nt+B)) > 0;
  *  - out-of-domain docs (id % 2 == 1, lang='xx'): the SAME unigrams
  *    (so unigram features pull every weight toward zero â the honest
  *    hard case) but walking the cycle with stride 5 (gcd(5,24)=1, a
  *    full cycle), so their bigrams are the 24 (k, k+5) pairs, ct=0
  *    buckets with strongly negative weight.
  *
  * Assertion is distribution-free and total: every 'en' doc has
  * log_weight > 0 and selected=true, every 'xx' doc < 0 and
  * selected=false â computed as aggregates, no driver row loops.
  *
  * Usage: runMain graft.tools.DsirScale [nDocs]
  *
  * Measured (local[32], 2026-08-13): docs=2,000,000 rows=2,000,000
  * en log_weight +0.321935, xx -5.877338, misclassified=0, 27.7 s end
  * to end (feats ~ 94M hashed positions; the bucket LUT stays 1024
  * rows â the B-bounded broadcast path at any corpus size).
  */
object DsirScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    require(n > 0 && n % 2 == 0, s"nDocs must be a positive multiple of 2 (got $n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Seq(
      "the", "a", "of", "and", "is",
      "row", "scan", "table", "part", "key", "hash", "join", "merge",
      "batch", "data", "value", "line", "sort", "window", "group",
      "filter", "query", "spark", "column")
    require(vocab.size == 24 && vocab.distinct.size == 24)
    val vocabLit = typedLit(vocab)

    val dir = java.nio.file.Files.createTempDirectory("dsir-scale").toString
    val target = col("id") % 2 === 0
    def walk(stride: Int) = array_join(
      transform(sequence(lit(0), lit(23)),
        k => element_at(vocabLit, ((col("id") + k * stride) % 24).cast("int") + 1)),
      " ")
    val t0 = System.nanoTime()
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        when(target, walk(1)).otherwise(walk(5)).as("text"),
        when(target, lit("en")).otherwise(lit("xx")).as("lang"),
        lit("src0").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val out = graft.SparkEntry.queries("q_corpus_dsir")(spark, dir)
    val stats = out
      .agg(
        count(lit(1)).as("rows"),
        min(when(col("doc_id") % 2 === 0, col("log_weight"))).as("en_min"),
        max(when(col("doc_id") % 2 === 0, col("log_weight"))).as("en_max"),
        min(when(col("doc_id") % 2 =!= 0, col("log_weight"))).as("xx_min"),
        max(when(col("doc_id") % 2 =!= 0, col("log_weight"))).as("xx_max"),
        sum(when(
          (col("doc_id") % 2 === 0) =!= col("selected"), 1L).otherwise(0L))
          .as("misclassified"))
      .first()
    val tRun = (System.nanoTime() - t1) / 1e9

    val rows = stats.getLong(0)
    val misclassified = stats.getLong(5)
    println(f"docs=$n%d rows=$rows%d gen=$tGen%.1fs run=$tRun%.1fs")
    println(f"en log_weight in [${stats.getDouble(1)}%.6f, ${stats.getDouble(2)}%.6f]  " +
      f"xx in [${stats.getDouble(3)}%.6f, ${stats.getDouble(4)}%.6f]  " +
      f"misclassified=$misclassified%d")
    require(rows == n, s"expected one output row per doc: $rows != $n")
    require(misclassified == 0,
      s"selection must match the planted domain exactly: $misclassified wrong")
    require(stats.getDouble(1) > 0 && stats.getDouble(4) < 0,
      "weights must separate: en strictly positive, xx strictly negative")
    println("separation OK")
    spark.stop()
  }
}
