package graft.tools

import org.apache.spark.sql.functions._

/** Scale demonstration for the curation funnel: run the REGISTERED
  * q_corpus_curation query (the SAME definition the oracle gate
  * checks, not a copy) over millions of synthetic documents with
  * PLANTED outcomes, and assert every planted document lands at
  * exactly its expected stage:
  *
  *  - id % 100 == 99  -> text duplicates doc id-1        => 'dup'
  *  - id % 17  == 0   -> declared lang 'fr', text 'en'   => 'lang'
  *  - id % 13  == 0   -> one token repeated 30x          => 'quality'
  *  - id % 5   == 0   -> source src0 (permille 1000), so every normal
  *                       src0 doc must come out 'kept' (hash-free
  *                       assertion: 1000 > any hmod)
  *  - everything else -> 'mixture' or 'kept' (hash-dependent split)
  *
  * Precedence in the expectations mirrors the funnel contract
  * (dup < lang < quality < mixture). Normal docs rotate a 24-word
  * vocabulary (the 5 'en' markers + 19 fillers) plus a unique
  * "d<id>" token, so they pass every gate by construction and no two
  * non-planted docs collide. Quality plants keep the 5 markers so
  * they fail at 'quality', not 'lang'.
  *
  * Usage: runMain graft.tools.CurationScale [nDocs]
  *
  * Measured (local[32], r12 — the funnel now leads with the
  * latest-wins id-canonicalization stage): docs=2,000,000
  * mismatches=0 dup=20,000 kept=902,084 lang=116,471 mixture=818,096
  * quality=143,349 in 69.1 s end to end — histogram IDENTICAL to the
  * pre-canonicalization run (ids here are unique, so stage 0 must be
  * and is a semantic no-op; its cost is the extra doc_id window +
  * the one-time materialization both funnel branches then share).
  */
object CurationScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    require(n % 100 == 0 && n > 0, s"nDocs must be a positive multiple of 100 (got $n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect (ANSI off, UTC,
    // nanosAsLong — core/Session.defaultConf), so scale demos measure
    // the SAME semantics Verify/Bench run (advisor r10: raw builders
    // inherited Spark 4 ANSI-on here).
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    val vocab = Seq(
      "the", "a", "of", "and", "is", // en markers: h_en = 5 on every doc
      "row", "scan", "table", "part", "key", "hash", "join", "merge",
      "batch", "data", "value", "line", "sort", "window", "group",
      "filter", "query", "spark", "column")
    require(vocab.size == 24 && vocab.distinct.size == 24)
    val vocabLit = typedLit(vocab)

    val dir = java.nio.file.Files.createTempDirectory("curation-scale").toString
    // tid: the doc whose text this doc carries (dup plants copy id-1)
    val tid = when(col("id") % 100 === 99, col("id") - 1).otherwise(col("id"))
    val rotated = array_join(
      transform(sequence(lit(0), lit(23)),
        k => element_at(vocabLit, ((tid + k) % 24).cast("int") + 1)),
      " ")
    val repetitive = concat(
      lit("the a of and is "), // keep langid at 'en' so the QUALITY gate trips
      array_join(array_repeat(lit("spam"), 30), " "))
    val text = concat(
      when(tid % 13 === 0, repetitive).otherwise(rotated),
      lit(" d"), tid.cast("string")) // unique token: no accidental dups
    spark.range(n)
      .select(
        col("id").as("doc_id"),
        text.as("text"),
        when(col("id") % 17 === 0, "fr").otherwise("en").as("lang"),
        concat(lit("src"), (col("id") % 5).cast("string")).as("source"),
        length(text).as("n_chars"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val t0 = System.nanoTime()
    val out = graft.SparkEntry.queries("q_corpus_curation")(spark, dir)
      .select(col("doc_id"), col("stage"))
      .withColumn(
        "expected",
        when(col("doc_id") % 100 === 99, "dup")
          .when(col("doc_id") % 17 === 0, "lang")
          .when(col("doc_id") % 13 === 0, "quality")
          .when(col("doc_id") % 5 === 0, "kept") // src0: permille 1000
          .otherwise("mixture-or-kept"))
    val bad = out.filter(
      (col("expected") =!= lit("mixture-or-kept") && col("stage") =!= col("expected")) ||
        (col("expected") === lit("mixture-or-kept") &&
          !col("stage").isin("mixture", "kept"))).count()
    val hist = out.groupBy("stage").count().orderBy("stage").collect()
      .map(r => s"${r.getString(0)}=${r.getLong(1)}").mkString(" ")
    val sec = (System.nanoTime() - t0) / 1e9
    println(f"[curation-scale] docs=$n%d mismatches=$bad%d $hist sec=$sec%.1f")
    require(bad == 0, "curation funnel mis-staged planted documents")
    spark.stop()
    // clean up the multi-hundred-MB synthetic corpus (repeated runs
    // would otherwise fill /tmp)
    import scala.jdk.CollectionConverters._
    val root = java.nio.file.Paths.get(dir)
    java.nio.file.Files.walk(root).iterator().asScala.toSeq.reverse
      .foreach(java.nio.file.Files.deleteIfExists(_))
  }
}
