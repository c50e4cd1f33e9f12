package graft.tools

import org.apache.spark.sql.functions._

import graft.functions.TextKit

/** Scale demonstration for the trained quality-classifier rung, both
  * halves:
  *
  *  1. the REGISTERED q_quality_classifier (closed-form Naive Bayes —
  *     the exactly-oracle-replayable model) over 1M synthetic docs
  *     with two planted vocabulary classes, asserting complete
  *     separation (every doc classified correctly);
  *  2. the gradient-trained variant the query's docs point here for:
  *     MLlib LogisticRegression over the SAME B=1024 hashed unigram
  *     count features (the fastText shape — sparse linear model on
  *     hashed n-grams). LBFGS float iteration is engine-specific, so
  *     this one can never be hash-oracled; instead the demo verifies
  *     it AGREES with the closed-form model on effectively every doc
  *     (>= 99.9% accuracy) — evidence the NB rung is not a toy
  *     stand-in but the same decision surface.
  *
  * Corpus: 24-token docs rotating one of two 24-word vocabularies
  * (the LmScale recipe, two classes). The query's training label is
  * the langid rule's verdict, so the classes are built to split under
  * that rule: ids % 2 == 0 draw from vocabulary A (contains the five
  * en marker words), the rest from vocabulary B (contains the five de
  * markers); 8 non-marker words are shared between them, so the
  * classes overlap lexically and the models must weight, not
  * memorize. The lang COLUMN is 'en' on every row — proving the rung
  * learns from content, not from copying a metadata column.
  *
  * Usage: runMain graft.tools.ClassifierScale [nDocs]
  *
  * MEASURED (1M docs, local[32]): NB query end-to-end 13.4 s,
  * 1,000,000/1,000,000 correct with complete margin separation
  * (min en score +323.6 vs max other score -320.9); feature build +
  * LR train (10 iter) + score 18.7 s, LR accuracy 1.000000, NB/LR
  * agreement 1.000000.
  */
object ClassifierScale {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(1000000L)
    require(n > 0 && n % 2 == 0, s"nDocs must be a positive multiple of 2 (got $n)")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect, one source of truth
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    def time[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val v = f
      println(f"[clf-scale] $name%-26s sec=${(System.nanoTime() - t0) / 1e9}%.1f")
      v
    }

    val shared = Seq("data", "row", "table", "key", "value", "line", "sort", "group")
    val vocabA = shared ++ Seq("the", "a", "of", "and", "is") ++ Seq(
      "scan", "part", "hash", "join", "merge", "batch",
      "filter", "query", "spark", "column", "window")
    val vocabB = shared ++ Seq("der", "die", "das", "und", "nicht") ++ Seq(
      "tree", "leaf", "node", "root", "branch", "graph",
      "path", "edge", "walk", "cycle", "depth")
    require(vocabA.size == 24 && vocabB.size == 24)

    val dir = java.nio.file.Files.createTempDirectory("clf-scale").toString
    val isEn = col("id") % 2 === 0
    def rotated(v: Seq[String]) = array_join(
      transform(sequence(lit(0), lit(23)),
        k => element_at(typedLit(v), ((col("id") + k) % 24).cast("int") + 1)),
      " ")
    time("generate+write") {
      spark.range(n)
        .select(
          col("id").as("doc_id"),
          when(isEn, rotated(vocabA)).otherwise(rotated(vocabB)).as("text"),
          lit("en").as("lang"),
          lit("src0").as("source"))
        .withColumn("n_chars", length(col("text")).cast("long"))
        .write.mode("overwrite").parquet(s"$dir/documents.parquet")
    }

    // ---- half 1: the registered closed-form NB query ----------------
    val nb = time("NB query (registered)") {
      val out = graft.SparkEntry.queries("q_quality_classifier")(spark, dir)
        .localCheckpoint()
      val st = out.agg(
        count(lit(1)).as("rows"),
        sum(when(col("correct"), 1L).otherwise(0L)).as("ok"),
        min(when(col("actual"), col("score"))).as("en_min"),
        max(when(!col("actual"), col("score"))).as("other_max"),
        // the langid-verdict label must coincide with the planted
        // class on this corpus (vocab A carries the en markers, B the
        // de markers) — guards the generator, not the model
        sum(when(col("actual") === (col("doc_id") % 2 === 0), 1L).otherwise(0L))
          .as("label_ok")).first()
      require(st.getLong(4) == n,
        s"planted classes must match the labeler verdict: ${st.getLong(4)} of $n")
      println(f"[clf-scale]   rows=${st.getLong(0)}%d correct=${st.getLong(1)}%d " +
        f"en_score_min=${st.getDouble(2)}%.2f other_score_max=${st.getDouble(3)}%.2f")
      require(st.getLong(0) == n && st.getLong(1) == n,
        s"NB must classify every planted doc correctly: ${st.getLong(1)} of $n")
      out
    }

    // ---- half 2: MLlib LogisticRegression on the same features ------
    import org.apache.spark.ml.classification.LogisticRegression
    import org.apache.spark.ml.linalg.Vectors
    import spark.implicits._
    val B = 1024
    time("LR features+train+score") {
      // LR trains on the same labeler verdict the NB rung used (equal
      // to the planted class by construction, asserted above)
      val feats = spark.read.parquet(s"$dir/documents.parquet")
        .select(col("doc_id"), (col("doc_id") % 2 === 0).cast("double").as("label"),
          TextKit.tokens(col("text")).as("w"))
        .select(col("doc_id"), col("label"), explode(col("w")).as("g"))
        .select(col("doc_id"), col("label"), (TextKit.charHash(col("g")) % B).as("b"))
        .groupBy(col("doc_id"), col("label"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"), col("label"))
        .agg(collect_list(struct(col("b"), col("c"))).as("bc"))
        .as[(Long, Double, Seq[(Long, Long)])]
        .map { case (id, label, bc) =>
          val sorted = bc.sortBy(_._1)
          (id, label, Vectors.sparse(B,
            sorted.map(_._1.toInt).toArray, sorted.map(_._2.toDouble).toArray))
        }
        .toDF("doc_id", "label", "features")
        .localCheckpoint()
      val lr = new LogisticRegression().setMaxIter(10).setRegParam(0.01)
      val model = lr.fit(feats)
      val scored = model.transform(feats)
        .select(col("doc_id"), col("label"), col("prediction"))
      val joined = scored.join(nb.select(col("doc_id"), col("predicted")), Seq("doc_id"))
      val st = joined.agg(
        count(lit(1)).as("rows"),
        sum(when(col("prediction") === col("label"), 1L).otherwise(0L)).as("lr_ok"),
        sum(when((col("prediction") === 1.0) === col("predicted"), 1L).otherwise(0L))
          .as("agree")).first()
      val acc = st.getLong(1).toDouble / st.getLong(0)
      val agree = st.getLong(2).toDouble / st.getLong(0)
      println(f"[clf-scale]   LR accuracy=$acc%.6f NB/LR agreement=$agree%.6f")
      require(acc >= 0.999, f"LR accuracy $acc%.6f below 0.999")
      require(agree >= 0.999, f"NB/LR agreement $agree%.6f below 0.999")
    }
    spark.stop()
  }
}
