package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke: every registered query runs on sf0.001 and returns a sane
  * result. Value-level correctness is covered by the DuckDB oracle
  * (driver gate + tools/check.py).
  */
class QueriesSmokeSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  test("entry returns rows") {
    SparkEntry.entry(spark).count() should be > 0L
  }

  test("every oracle key has a matching query") {
    SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet) shouldBe empty
  }

  test("registry invariants: full oracle coverage, naming, monotone size") {
    // round 7 closed with 102 queries, EVERY one DuckDB-oracled — a
    // future refactor must not silently drop queries or regress a
    // query to rows-only (the weaker driver check)
    SparkEntry.queries.size should be >= 102
    SparkEntry.queries.keySet.diff(SparkEntry.oracleSql.keySet) shouldBe empty
    all(SparkEntry.queries.keys) should startWith("q_")
    all(SparkEntry.oracleSql.values.map(_.trim)) should not be empty
  }

  SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
    test(s"$name runs on sf0.001") {
      val df = fn(spark, sfDir)
      df.columns.length should be > 0
      noException should be thrownBy df.count()
    }
  }

  test("q_text_bm25 returns an empty frame on an empty corpus") {
    // The corpus scalars (N, avgdl) cross the driver as an O(1) fold;
    // on an empty documents table that fold used to NPE on the null
    // SUM and divide by zero — the contract is an empty result with
    // the normal schema instead.
    import org.apache.spark.sql.types._
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("lang", StringType), StructField("source", StringType),
      StructField("n_chars", LongType)))
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), schema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_bm25")(spark, dir)
    out.columns shouldBe Array("doc_id", "term", "tf", "bm25_micros")
    out.count() shouldBe 0L
  }

  test("gopher/repetition/curation report one row per doc, incl. degenerate docs") {
    // Empty and 1-token docs produce no bigram/5-gram rows; the
    // per-doc reports must still carry them (left-join + zero-fill)
    // rather than silently dropping them, and the funnel must stage
    // them 'quality' (nb=0 fails the keep rule), not lose them.
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-sf").toString
    Seq(
      (1L, "", "de", "src0"), // zero tokens; all-zero marker hits -> pred 'de'
      (2L, "hello", "de", "src0"), // one token: no bigrams
      (3L, "the a of and is " + (1 to 20).map(i => s"tok$i").mkString(" "), "en", "src0"))
      .toDF("doc_id", "text", "lang", "source")
      .withColumn("n_chars", org.apache.spark.sql.functions.length(col("text")).cast("long"))
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")

    val gopher = SparkEntry.queries("q_quality_gopher")(spark, dir)
      .select("doc_id", "n_tokens", "keep").as[(Long, Int, Boolean)].collect().sortBy(_._1)
    gopher shouldBe Array((1L, 0, false), (2L, 1, false), (3L, 25, true))

    val rep = SparkEntry.queries("q_corpus_repeated_ngrams")(spark, dir)
      .select("doc_id", "n_ngrams").as[(Long, Int)].collect().sortBy(_._1)
    rep shouldBe Array((1L, 0), (2L, 0), (3L, 21))

    val stages = SparkEntry.queries("q_corpus_curation")(spark, dir)
      .select("doc_id", "stage").as[(Long, String)].collect().sortBy(_._1)
    stages shouldBe Array((1L, "quality"), (2L, "quality"), (3L, "kept"))
  }
}
