package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

/** Smoke: every registered query runs on sf0.001 and returns a sane
  * result. Value-level correctness is covered by the DuckDB oracle
  * (driver gate + tools/check.py).
  */
class QueriesSmokeSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  import org.apache.spark.sql.types._

  // production schemas + the doc/emb-driven query list are SHARED by
  // the empty-tables and null-rows sweeps: one hand-maintained copy,
  // so the two cannot drift (a name missing from the list silently
  // skips coverage — exactly how the q_embedding_* gap survived the
  // first sweep). The all-empty sweep below iterates the FULL
  // registry, so a query missing here still gets the empty-input
  // check there.
  private val docTableSchema = StructType(Seq(
    StructField("doc_id", LongType), StructField("text", StringType),
    StructField("lang", StringType), StructField("source", StringType),
    StructField("n_chars", LongType)))
  private val embTableSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))
  private val docEmbQueries = Seq(
    "q_chunk_packing", "q_contamination_bloom", "q_contamination_ngram",
    "q_corpus_curation", "q_corpus_dsir", "q_corpus_mixture", "q_corpus_repeated_ngrams",
    "q_corpus_shuffle", "q_corpus_split", "q_dedup_clusters", "q_dedup_clusters_deep",
    "q_dedup_embedding_cosine", "q_dedup_exact", "q_dedup_jaccard_ngram",
    "q_dedup_jaccard_ppjoin", "q_dedup_minhash_lsh", "q_dedup_semantic",
    "q_dedup_simhash", "q_dedup_substring_cut", "q_dedup_substring_extents",
    "q_embedding_synonyms", "q_embedding_vector_table",
    "q_flatfile_parse", "q_multimodal_audio", "q_multimodal_features",
    "q_multimodal_framesample", "q_quality_gopher", "q_quality_lm_perplexity",
    "q_similarity_ann_lsh",
    "q_similarity_cosine_topk", "q_similarity_ivf", "q_similarity_sq8",
    "q_text_bm25",
    "q_text_bpe_tokenize", "q_text_chunking", "q_text_fingerprint",
    "q_text_langid", "q_text_pii_scrub", "q_text_stats")

  test("q_corpus_split proportions track 90/5/5 and assignments are stable") {
    import org.apache.spark.sql.functions.col
    val out = SparkEntry.queries("q_corpus_split")(spark, sfDir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val n = out.length
    n should be > 0
    val counts = out.groupBy(_._2).view.mapValues(_.size).toMap
    // binomial slack on a 500-doc fixture: train 90% +- 5pp, holdouts
    // 5% +- 4pp — loose enough to never flake, tight enough to catch a
    // wrong modulus or an inverted CASE
    counts.getOrElse("train", 0).toDouble / n shouldBe 0.90 +- 0.05
    counts.getOrElse("val", 0).toDouble / n shouldBe 0.05 +- 0.04
    counts.getOrElse("test", 0).toDouble / n shouldBe 0.05 +- 0.04
    // identity-keyed: a second evaluation (fresh plan) assigns every
    // doc identically
    val again = SparkEntry.queries("q_corpus_split")(spark, sfDir)
      .select(col("doc_id"), col("split")).collect()
      .map(r => r.getLong(0) -> r.getString(1))
    again.toMap shouldBe out.toMap
  }

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
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-sf").toString
    spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](), docTableSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val out = SparkEntry.queries("q_text_bm25")(spark, dir)
    out.columns shouldBe Array("doc_id", "term", "tf", "bm25_micros")
    out.count() shouldBe 0L
  }

  test("every documents/embeddings-driven query tolerates EMPTY tables") {
    // At 100 TB empty inputs are routine (an empty source, a filtered
    // partition, a fresh date); a per-source pipeline step must return
    // an empty frame, not NPE in a driver fold or head() an empty
    // Dataset (the q_text_bm25 bug class, caught by the round-6
    // ADVICE). Every query that reads only documents/embeddings runs
    // here against empty tables with the production schemas.
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-all").toString
    val empty = new java.util.ArrayList[org.apache.spark.sql.Row]()
    spark.createDataFrame(empty, docTableSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    spark.createDataFrame(empty, embTableSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    docEmbQueries.foreach { n =>
      withClue(s"$n on empty tables: ") {
        SparkEntry.queries(n)(spark, dir).count() shouldBe 0L
      }
    }
  }

  test("every registered query tolerates an ALL-EMPTY dataset") {
    // The strongest form of the empty-input property: all ten tables
    // present with production schemas and zero rows. Every query must
    // return an empty frame — no NPE in a scalar fold, no ML fit on
    // an empty dataset, no head() of an empty plan.
    val dir = java.nio.file.Files.createTempDirectory("graft-empty-ds").toString
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      spark.read.parquet(s"$sfDir/$t.parquet").limit(0)
        .write.mode("overwrite").parquet(s"$dir/$t.parquet")
    }
    // audit-style queries REPORT on an empty table rather than
    // returning nothing (a global aggregate always yields one row;
    // q_quality_audit's row_count check correctly reports failed)
    val reportRows = Map("q_quality_audit" -> 6L)
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      withClue(s"$name on all-empty dataset: ") {
        fn(spark, dir).count() shouldBe reportRows.getOrElse(name, 0L)
      }
    }
  }

  test("documents/embeddings queries tolerate NULL text/metadata/vector rows") {
    // Bad rows are routine at 100 TB (a failed upstream extract, a
    // partial write): a NULL text, NULL metadata, or NULL embedding
    // must never kill a stage. Policy: null rows may be dropped or
    // carried with null outputs, but the query must run.
    import org.apache.spark.sql.Row
    val dir = java.nio.file.Files.createTempDirectory("graft-null-rows").toString
    val docs = new java.util.ArrayList[Row]()
    docs.add(Row(1L, null, null, null, null))
    docs.add(Row(2L, "the a of and is " + (1 to 20).map(i => s"tok$i").mkString(" "),
      "en", "src0", 100L))
    spark.createDataFrame(docs, docTableSchema)
      .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    val embs = new java.util.ArrayList[Row]()
    embs.add(Row(1L, null, null))
    embs.add(Row(2L, (0 until 64).map(i => (i % 7).toFloat / 7.0f), 0))
    embs.add(Row(3L, (0 until 64).map(i => ((i + 1) % 5).toFloat / 5.0f), 1))
    spark.createDataFrame(embs, embTableSchema)
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    docEmbQueries.foreach { n =>
      withClue(s"$n on null rows: ") {
        noException should be thrownBy SparkEntry.queries(n)(spark, dir).count()
      }
    }
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
