package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Degenerate-vector smoke sweep: the VectorKit.normalizable policy,
  * exercised end-to-end through every similarity/dedup query against a
  * fixture that actually CONTAINS zero-norm, NaN-component,
  * Inf-component, and NULL embeddings (the production fixture has
  * none, so without this sweep the policy is dead code).
  *
  * Every query runs twice — non-ANSI (the shared core/Session default)
  * and ANSI (the Spark 4 default that Verify/Bench sessions inherit) —
  * because the failure modes differ by mode: non-ANSI silently ranks a
  * NaN cosine above every real similarity (NaN is the ordering's
  * largest double), ANSI throws DIVIDE_BY_ZERO on the zero-norm
  * division before the comparison even runs.
  */
class DegenerateVectorSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  import org.apache.spark.sql.Row
  import org.apache.spark.sql.types._

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  // Normal vectors: ids 0..3, one-hot on distinct axes except v1 == v0,
  // so the ONLY >=tau pair among real vectors is (0,1) with cosine 1.0.
  private def oneHot(axis: Int): Seq[Float] =
    (0 until 64).map(i => if (i == axis) 1.0f else 0.0f)

  private val degenerateIds = Set(10L, 11L, 12L, 13L, 14L, 15L)

  private lazy val fixtureDir: String = {
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-vec").toString
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(0L, oneHot(0), 0))
    rows.add(Row(1L, oneHot(0), 0)) // exact dup of 0
    rows.add(Row(2L, oneHot(1), 0))
    rows.add(Row(3L, oneHot(2), 0))
    rows.add(Row(10L, (0 until 64).map(_ => 0.0f), 0)) // zero norm
    rows.add(Row(11L, Seq(Float.NaN) ++ oneHot(0).tail, 0)) // NaN component
    rows.add(Row(12L, Seq(Float.PositiveInfinity) ++ oneHot(0).tail, 0)) // Inf
    rows.add(Row(13L, null, 0)) // NULL embedding
    // NULL element: DotProduct would read the slot as 0.0 while
    // DuckDB's list functions throw — VectorKit.toDouble maps the
    // whole vector to NULL so both engines treat it as un-normalizable
    rows.add(Row(14L, Seq[Any](0.5f, null) ++ Seq.fill[Any](62)(0.0f), 0))
    // wrong dimension (truncated write): DotProduct would fold over
    // the shorter length (silently-wrong cosine) while DuckDB's
    // distance functions throw on the length mismatch — same
    // shape-guard NULL mapping
    rows.add(Row(15L, (0 until 32).map(i => if (i == 0) 1.0f else 0.0f), 0))
    spark.createDataFrame(rows, embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  private val similarityQueries = Seq(
    "q_similarity_cosine_topk", "q_dedup_embedding_cosine",
    "q_similarity_ann_lsh", "q_similarity_ivf", "q_dedup_semantic",
    "q_similarity_sq8")

  /** Run `body` with ANSI mode forced to `on`, restoring the session
    * conf afterwards (the shared session serves every suite).
    */
  private def withAnsi[A](on: Boolean)(body: => A): A = {
    val prev = spark.conf.get("spark.sql.ansi.enabled")
    spark.conf.set("spark.sql.ansi.enabled", on.toString)
    try body finally spark.conf.set("spark.sql.ansi.enabled", prev)
  }

  test("engine premise: NaN compares greater than any real double") {
    // The whole normalizable policy rests on this ordering fact; if a
    // future Spark changed it, the filters would still be correct but
    // the documented rationale wouldn't — fail loudly here.
    val r = spark.sql(
      "SELECT double('NaN') >= 0.4, double('NaN') > 0, sqrt(-1.0) >= 0.35").first()
    r.getBoolean(0) shouldBe true
    r.getBoolean(1) shouldBe true
    r.getBoolean(2) shouldBe true
  }

  for (ansi <- Seq(false, true)) {
    val mode = if (ansi) "ANSI" else "non-ANSI"

    test(s"[$mode] ranking queries drop degenerate vectors and keep exact results") {
      withAnsi(ansi) {
        for (name <- Seq("q_similarity_cosine_topk", "q_similarity_ann_lsh",
          "q_similarity_sq8")) {
          withClue(s"$name: ") {
            val out = SparkEntry.queries(name)(spark, fixtureDir).collect()
            out should not be empty
            // no degenerate id may appear as query or neighbor
            out.map(_.getLong(0)).toSet.intersect(degenerateIds) shouldBe empty
            out.map(r => r.getLong(2)).toSet.intersect(degenerateIds) shouldBe empty
            // no NaN cosine may survive to the output
            out.foreach(r => r.getDouble(3).isNaN shouldBe false)
            // v0's nearest neighbor must be its exact dup v1 at cos 1.0
            val top = out.filter(r => r.getLong(0) == 0L && r.getInt(1) == 1).head
            top.getLong(2) shouldBe 1L
            top.getDouble(3) shouldBe 1.0
          }
        }
      }
    }

    test(s"[$mode] q_similarity_ivf indexes only normalizable vectors") {
      withAnsi(ansi) {
        val out = SparkEntry.queries("q_similarity_ivf")(spark, fixtureDir).collect()
        // one verdict row per normalizable query, none for degenerates
        out.map(_.getLong(0)).sorted shouldBe Array(0L, 1L, 2L, 3L)
        // recall contract holds even with degenerate rows in the table
        out.foreach(r => r.getBoolean(1) shouldBe true)
        out.foreach(r => r.getDouble(2).isNaN shouldBe false)
      }
    }

    test(s"[$mode] q_dedup_embedding_cosine reports only real near-dup pairs") {
      withAnsi(ansi) {
        val pairs = SparkEntry.queries("q_dedup_embedding_cosine")(spark, fixtureDir)
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
        // without the scan filter, Spark's NaN >= 0.4 being TRUE would
        // pair ids 10/11/12 with every same-label row (and ANSI would
        // throw on the zero norm before that)
        pairs.map(_._1).toSet.intersect(degenerateIds) shouldBe empty
        pairs.map(_._2).toSet.intersect(degenerateIds) shouldBe empty
        pairs shouldBe Array((0L, 1L, 1.0))
      }
    }

    test(s"[$mode] q_dedup_semantic carries degenerate vectors with kept=true") {
      withAnsi(ansi) {
        val out = SparkEntry.queries("q_dedup_semantic")(spark, fixtureDir)
          .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
        // every input row appears exactly once — degenerate rows are
        // carried, not dropped
        out.keySet shouldBe Set(0L, 1L, 2L, 3L, 10L, 11L, 12L, 13L, 14L, 15L)
        // the exact dup is dropped; everything else (incl. all four
        // degenerate rows) is kept
        out(1L) shouldBe false
        (out - 1L).values.toSet shouldBe Set(true)
      }
    }
  }

  test("queries tolerate an ALL-degenerate embeddings table") {
    // A partition where every vector is bad must yield sane output,
    // not a failed stage: ranking queries go empty, semantic dedup
    // carries every row kept=true.
    val dir = java.nio.file.Files.createTempDirectory("graft-degen-only").toString
    val rows = new java.util.ArrayList[Row]()
    rows.add(Row(0L, (0 until 64).map(_ => 0.0f), 0))
    rows.add(Row(1L, Seq(Float.NaN) ++ (1 until 64).map(_ => 0.0f), 0))
    rows.add(Row(2L, null, 0))
    spark.createDataFrame(rows, embSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    withAnsi(true) {
      for (name <- Seq("q_similarity_cosine_topk", "q_similarity_ann_lsh",
        "q_similarity_ivf", "q_dedup_embedding_cosine", "q_similarity_sq8")) {
        withClue(s"$name: ") {
          SparkEntry.queries(name)(spark, dir).count() shouldBe 0L
        }
      }
      val sem = SparkEntry.queries("q_dedup_semantic")(spark, dir)
        .collect().map(r => r.getLong(0) -> r.getBoolean(2)).toMap
      sem shouldBe Map(0L -> true, 1L -> true, 2L -> true)
    }
  }

  test("all similarity queries are registered and oracled") {
    // the sweep above hard-codes the five names; a rename must break
    // HERE rather than silently shrink the sweep's coverage
    similarityQueries.foreach { n =>
      SparkEntry.queries.keySet should contain(n)
      SparkEntry.oracleSql.keySet should contain(n)
    }
  }
}
