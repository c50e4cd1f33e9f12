package graft.tools

import org.apache.spark.sql.functions._

/** Scale demonstration for the PII scrub: run the REGISTERED
  * q_text_pii_scrub query over a million documents of which 1% are
  * regex-HOSTILE (a 50,000-char class-character run with no '@' â the
  * exact bait the unbounded email pattern was measured quadratic on,
  * 20 s for one 80 KB doc single-threaded), and assert both halves of
  * the round-10 hardening:
  *
  *  - LINEARITY AT SCALE: 10,000 hostile docs carry ~5e8 bait chars;
  *    with the RFC-bounded patterns the whole corpus scrubs inside a
  *    bound that the quadratic pattern would miss by >100x (its cost
  *    on this fixture is ~10,000 docs x 2.5e9 char-ops â days, not
  *    seconds);
  *  - EXACTNESS: the query injects doc_id%3 synthetic emails and
  *    doc_id%2 phones per doc, so corpus totals are closed-form;
  *    hostile text must contribute ZERO extra matches (the bait
  *    never completes an email or phone), and every doc reports
  *    exactly one row.
  *
  * Usage: runMain graft.tools.PiiScale [nDocs]
  *
  * MEASURED (1M docs / 10k hostile, local[32]): gen 6.6 s,
  * scrub+verify 53.5 s end to end; totals exact (999,999 emails /
  * 500,000 phones, zero contributed by 5.1e8 chars of bait).
  */
object PiiScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    require(n > 0 && n % 100 == 0, s"nDocs must be a positive multiple of 100 (got $n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    val dir = java.nio.file.Files.createTempDirectory("pii-scale").toString
    val hostile = col("id") % 100 === 0
    // hostile: one unbroken run of email-class chars, no '@' â the
    // backtracking bait; normal: short benign prose
    val baitTxt = concat_ws("", transform(sequence(lit(1), lit(500)),
      _ => lit("a.b_c9" * 17))) // 102 chars x 500 = 51,000-char run
    val normalTxt = concat(lit("plain document body number "), col("id"))
    val t0 = System.nanoTime()
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        when(hostile, baitTxt).otherwise(normalTxt).as("text"),
        lit("en").as("lang"),
        lit("src0").as("source"))
      .withColumn("n_chars", length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val tGen = (System.nanoTime() - t0) / 1e9

    val t1 = System.nanoTime()
    val out = graft.SparkEntry.queries("q_text_pii_scrub")(spark, dir)
    val stats = out.agg(
      count(lit(1)).as("rows"),
      sum(col("n_emails")).as("emails"),
      sum(col("n_phones")).as("phones"),
      sum(when(col("scrubbed_md5").isNull, 1L).otherwise(0L)).as("null_md5"))
      .first()
    val tRun = (System.nanoTime() - t1) / 1e9

    // closed-form totals of the query's own doc_id%3 / doc_id%2
    // injection (n is a multiple of 6 whenever it is of 100? no â
    // compute the exact modular sums instead of assuming divisibility)
    val expEmails = (0L until 3L).map(r => ((n - 1 - r) / 3 + 1) * r).sum
    val expPhones = (0L until 2L).map(r => ((n - 1 - r) / 2 + 1) * r).sum
    println(f"docs=$n%d rows=${stats.getLong(0)}%d gen=$tGen%.1fs run=$tRun%.1fs")
    println(f"emails=${stats.getLong(1)}%d (expect $expEmails%d) " +
      f"phones=${stats.getLong(2)}%d (expect $expPhones%d) null_md5=${stats.getLong(3)}%d")
    require(stats.getLong(0) == n, s"one row per doc: ${stats.getLong(0)} != $n")
    require(stats.getLong(1) == expEmails, "hostile text contributed phantom email matches")
    require(stats.getLong(2) == expPhones, "hostile text contributed phantom phone matches")
    require(stats.getLong(3) == 0L, "every doc must hash its scrubbed text")
    // the linearity gate: generous for co-tenancy, impossible for the
    // quadratic pattern (estimated >100x over)
    require(tRun < 300.0, f"scrub took $tRun%.0f s â backtracking blowup territory")
    println("bounded-pattern scrub stayed linear on 1%-hostile corpus OK")
    spark.stop()
  }
}
