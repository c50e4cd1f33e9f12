package graft.tools

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Scale demonstration for substring-granular dedup: run the
  * REGISTERED q_dedup_substring_extents query (the same definition the
  * oracle gate checks) over millions of synthetic documents with a
  * PLANTED boilerplate span, and assert position-exact recovery:
  *
  *  - every doc is doc-unique filler ("d<id>x<k>" tokens), so filler
  *    5-grams have corpus count 1 and can never mark a position;
  *  - planted docs (id % 10 == 0) carry one SHARED 12-token span at a
  *    doc-dependent offset a = 10 + id%3. The span's 8 interior
  *    5-grams each occur n/10 times corpus-wide; every boundary gram
  *    mixes in a doc-unique token and stays count-1. The query must
  *    therefore report EXACTLY one extent per planted doc, at
  *    start_pos = a+1, with n_grams = 8 and extent_tokens = 12 â and
  *    nothing anywhere else.
  *
  * All assertions are aggregates (no driver-side row loops): row count
  * equals n/10, per-row shape deviations sum to zero.
  *
  * Usage: runMain graft.tools.SubstrScale [nDocs]
  *
  * Measured (local[32], 2026-08-14): docs=2,000,000 (200,000 planted)
  * extents=200,000, 0 shape deviations, gen=29.8s run=77.2s. The
  * dominant cost is the gram-key exchange â it shards with the corpus
  * (shuffle_hash pinned; no broadcast of the corpus-proportional count
  * table), which is the shape that survives 1000 executors.
  */
object SubstrScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    require(n > 0 && n % 10 == 0, s"nDocs must be a positive multiple of 10 (got $n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    val shared = Seq(
      "terms", "of", "service", "all", "rights", "reserved",
      "click", "here", "to", "accept", "the", "cookies")
    require(shared.size == 12 && shared.distinct.size == 12)

    val dir = java.nio.file.Files.createTempDirectory("substr-scale").toString
    val planted = col("id") % 10 === 0
    val a = (lit(10) + col("id") % 3).cast("int") // leading filler length
    def filler(fromIdx: Column, len: Column) = array_join(
      transform(sequence(lit(0), len - 1),
        k => concat(lit("d"), col("id"), lit("x"), fromIdx + k)),
      " ")
    val sharedTxt = lit(shared.mkString(" "))
    val plantedTxt = concat_ws(" ", filler(lit(0), a), sharedTxt, filler(a, lit(8)))
    val normalTxt = filler(lit(0), lit(30))
    val t0 = System.nanoTime()
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        when(planted, plantedTxt).otherwise(normalTxt).as("text"),
        lit("en").as("lang"),
        lit("src0").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val out = graft.SparkEntry.queries("q_dedup_substring_extents")(spark, dir)
    val expA = (lit(10) + col("doc_id") % 3).cast("int")
    val stats = out
      .agg(
        count(lit(1)).as("rows"),
        sum(when(col("doc_id") % 10 =!= 0, 1L).otherwise(0L)).as("unplanted_rows"),
        sum(abs(col("start_pos") - (expA + 1))).as("start_dev"),
        sum(abs(col("n_grams") - 8)).as("gram_dev"),
        sum(abs(col("extent_tokens") - 12)).as("len_dev"))
      .first()
    val tRun = (System.nanoTime() - t1) / 1e9

    val rows = stats.getLong(0)
    println(f"docs=$n%d extents=$rows%d gen=$tGen%.1fs run=$tRun%.1fs")
    require(rows == n / 10, s"expected one extent per planted doc: $rows != ${n / 10}")
    require(stats.getLong(1) == 0, s"extents leaked into unplanted docs: ${stats.getLong(1)}")
    val devs = (2 to 4).map(stats.getLong)
    require(devs.forall(_ == 0L),
      s"position/shape deviations (start, grams, tokens): $devs")
    println("planted span recovered position-exactly in every planted doc OK")
    spark.stop()
  }
}
