package graft.tools

import org.apache.spark.sql.functions._

/** Scale demonstration for the bigram-LM perplexity filter: run the
  * REGISTERED q_quality_lm_perplexity query (the SAME definition the
  * oracle gate checks, not a copy) over millions of synthetic
  * documents with PLANTED perplexity classes, and assert the classes
  * separate completely:
  *
  *  - normal docs (id % 10 != 0): 24 tokens rotating a fixed 24-word
  *    vocabulary starting at id % 24 â every bigram is one of the 24
  *    adjacent pairs of the shared cycle, each appearing ~n*23/24/24
  *    times corpus-wide, so P(w2|w1) is large and perplexity is LOW
  *    (the corpus-calibrated "fluent" class);
  *  - planted noise docs (id % 10 == 0): 8 doc-unique tokens
  *    "d<id>x<k>" â every bigram has count 1 in a vocabulary of ~1.6M
  *    types, so each logp ~ ln(2/V) and perplexity is ORDERS OF
  *    MAGNITUDE higher (the "rare-transition gibberish" class CCNet
  *    filtering exists to drop).
  *
  * The assertion is distribution-free and total: max(ppl) over ALL
  * normal docs < min(ppl) over ALL planted docs, plus exactly one
  * output row per input doc. Both sides are computed as aggregates â
  * no driver-side row loops.
  *
  * Usage: runMain graft.tools.LmScale [nDocs]
  *
  * Measured (local[32], 2026-08-13): docs=2,000,000 rows=2,000,000
  * normal ppl 1.93, planted ppl 800013 (separation x414,996), 33.4 s
  * end to end. The first 2M run also caught a real 100-TB hazard: AQE
  * converted the corpus-proportional count-table join to broadcast
  * (compressed shuffle bytes sat under the 10MB threshold while the
  * in-memory hash relation did not fit the driver) and OOMed at
  * blockify â the query now pins shuffle_hash on both
  * corpus-proportional joins.
  */
object LmScale {
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

    val vocab = Seq(
      "the", "a", "of", "and", "is",
      "row", "scan", "table", "part", "key", "hash", "join", "merge",
      "batch", "data", "value", "line", "sort", "window", "group",
      "filter", "query", "spark", "column")
    require(vocab.size == 24 && vocab.distinct.size == 24)
    val vocabLit = typedLit(vocab)

    val dir = java.nio.file.Files.createTempDirectory("lm-scale").toString
    val planted = col("id") % 10 === 0
    val rotated = array_join(
      transform(sequence(lit(0), lit(23)),
        k => element_at(vocabLit, ((col("id") + k) % 24).cast("int") + 1)),
      " ")
    val gibberish = array_join(
      transform(sequence(lit(0), lit(7)),
        k => concat(lit("d"), col("id"), lit("x"), k)),
      " ")
    val t0 = System.nanoTime()
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        when(planted, gibberish).otherwise(rotated).as("text"),
        lit("en").as("lang"),
        lit("src0").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val out = graft.SparkEntry.queries("q_quality_lm_perplexity")(spark, dir)
    val stats = out
      .agg(
        count(lit(1)).as("rows"),
        max(when(col("doc_id") % 10 =!= 0, col("ppl"))).as("normal_max"),
        min(when(col("doc_id") % 10 =!= 0, col("ppl"))).as("normal_min"),
        min(when(col("doc_id") % 10 === 0, col("ppl"))).as("planted_min"),
        max(when(col("doc_id") % 10 === 0, col("ppl"))).as("planted_max"),
        sum(when(col("ppl").isNull, 1L).otherwise(0L)).as("null_ppl"))
      .first()
    val tRun = (System.nanoTime() - t1) / 1e9

    val rows = stats.getLong(0)
    val normalMax = stats.getDouble(1)
    val normalMin = stats.getDouble(2)
    val plantedMin = stats.getDouble(3)
    val plantedMax = stats.getDouble(4)
    val nullPpl = stats.getLong(5)
    println(f"docs=$n%d rows=$rows%d gen=$tGen%.1fs run=$tRun%.1fs")
    println(f"normal ppl in [$normalMin%.2f, $normalMax%.2f]  " +
      f"planted ppl in [$plantedMin%.0f, $plantedMax%.0f]  null_ppl=$nullPpl%d")
    require(rows == n, s"expected one output row per doc: $rows != $n")
    require(nullPpl == 0, s"every doc has >= 2 tokens, none may score NULL: $nullPpl")
    require(normalMax < plantedMin,
      f"classes must separate completely: normal max $normalMax%.4f !< planted min $plantedMin%.4f")
    println(f"separation x${plantedMin / normalMax}%.0f OK")
    spark.stop()
  }
}
