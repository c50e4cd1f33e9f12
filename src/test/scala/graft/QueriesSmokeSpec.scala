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
    // round 7 closed with 101 queries, EVERY one DuckDB-oracled — a
    // future refactor must not silently drop queries or regress a
    // query to rows-only (the weaker driver check)
    SparkEntry.queries.size should be >= 101
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
}
