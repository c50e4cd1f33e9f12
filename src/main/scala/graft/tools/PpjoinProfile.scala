package graft.tools

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

import graft.functions.TextKit
import graft.queries.Tables

/** Scratch profiler for q_dedup_jaccard_ppjoin: times each stage of
  * the prefix-filtered join separately at sf0.1 to locate where the
  * wall-clock goes, and A/Bs the candidate-join condition with and
  * without the PPJoin positional filter.
  */
object PpjoinProfile {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // Session.driverLocal: the production dialect, one source of truth
    val spark = graft.core.Session.driverLocal(cpus, "graft-scale-tool")
    spark.sparkContext.setLogLevel("WARN")

    def timed[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[ppjoin-profile] $label%-28s ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    // warmup identical to Bench
    locally {
      val r = spark.range(100000).select(col("id"), (col("id") % 97).as("k"))
      r.groupBy(col("k")).agg(sum(col("id")), count(lit(1)))
        .join(r.limit(100).withColumnRenamed("id", "id2"), "k")
        .write.mode("overwrite").format("noop").save()
    }

    val tau = 0.5
    val w = TextKit.tokens(col("text"))
    val docs = timed("docs shingle+checkpoint") {
      Tables(spark, dir, "documents")
        .select(col("doc_id"), w.as("w"))
        .filter(size(col("w")) >= 3)
        .select(col("doc_id"), TextKit.shinglesKernel(3)(col("w")).as("ss"))
        .localCheckpoint()
    }
    val ex = docs.select(col("doc_id"), size(col("ss")).as("n"), explode(col("ss")).as("s"))
    val df = ex.groupBy(col("s")).agg(count(lit(1)).as("df"))
    timed("df groupBy") { df.write.mode("overwrite").format("noop").save() }
    val wDoc = Window.partitionBy(col("doc_id")).orderBy(col("df").asc, col("s").asc)
    val prefixes = ex
      .join(df, "s")
      .withColumn("pos", row_number().over(wDoc))
      .filter(col("pos") <= col("n") - ceil(lit(tau) * col("n")) + 1)
      .select(col("doc_id"), col("n"), col("pos"), col("s"))
    timed("prefixes join+window") { prefixes.write.mode("overwrite").format("noop").save() }
    def candWith(positional: Boolean) = {
      val base = col("x.s") === col("y.s") && col("x.doc_id") < col("y.doc_id") &&
        greatest(col("x.n"), col("y.n")) * tau <= least(col("x.n"), col("y.n"))
      val cond =
        if (!positional) base
        else base &&
          (least(col("x.n") - col("x.pos"), col("y.n") - col("y.pos")) + 1) * (1 + tau) >=
            lit(tau) * (col("x.n") + col("y.n"))
      prefixes.as("x").join(prefixes.as("y"), cond)
        .select(col("x.doc_id").as("d1"), col("y.doc_id").as("d2"))
        .distinct()
    }
    val nPlain = timed("cand join (prefix only)") { candWith(false).count() }
    val nPos = timed("cand join (+positional)") { candWith(true).count() }
    println(s"[ppjoin-profile] candidates: prefix-only=$nPlain positional=$nPos")
    val sets = docs.select(col("doc_id"), sort_array(col("ss")).as("ss"))
    def verify(cand: org.apache.spark.sql.DataFrame) = cand
      .join(sets.as("s1"), col("d1") === col("s1.doc_id"))
      .join(sets.as("s2"), col("d2") === col("s2.doc_id"))
      .withColumn("inter",
        graft.plans.GraftExtensions.sortedIntersectCount(col("s1.ss"), col("s2.ss")))
      .select(col("d1"), col("d2"),
        (col("inter").cast(DoubleType) /
          (size(col("s1.ss")) + size(col("s2.ss")) - col("inter"))).as("j"))
      .filter(col("j") >= tau)
    timed("verify (prefix only)") {
      verify(candWith(false)).write.mode("overwrite").format("noop").save()
    }
    timed("verify (+positional)") {
      verify(candWith(true)).write.mode("overwrite").format("noop").save()
    }
    spark.stop()
  }
}
