package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, ByteType}
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.AnnIndex

/** The persisted ANN-index lifecycle (train once / serve many), which
  * the oracled q_similarity_ivf_sq8 — one plan, trains per run —
  * cannot show: build the IVF-SQ8 index tables, write them to
  * parquet, and answer queries from a FRESH READ with no training and
  * no full-precision corpus anywhere in the serving plan.
  */
class AnnIndexSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  private val dim = 16

  /** Deterministic corpus: 400 vectors in 8 well-separated direction
    * families (id % 8 picks a dominant axis pair), every id % 50 == 1
    * a near-copy of id-1 with one component nudged — the planted
    * neighbor search() must return.
    */
  private def corpusDf(n: Int) = {
    val cid = when(col("id") % 50 === 1, col("id") - 1).otherwise(col("id"))
    val vec = transform(sequence(lit(0), lit(dim - 1)), j => {
      val h = pmod(xxhash64(cid * dim + j), lit(2001L))
      val base = (h - 1000L).cast("double") / 1000.0
      val axisBoost = when(pmod(cid, lit(8)) === pmod(j, lit(8)), lit(4.0)).otherwise(lit(0.0))
      base + axisBoost + when(col("id") % 50 === 1 && j === 3, lit(0.1)).otherwise(lit(0.0))
    })
    spark.range(n).select(col("id").as("vec_id"), vec.as("e"))
  }

  test("build -> parquet -> fresh read -> search finds planted neighbors; storage is tinyint") {
    val root = Files.createTempDirectory("graft-ann-idx").toString
    val (centroids, corpus) = AnnIndex.build(corpusDf(400), k = 8, vecCol = "e", dim = dim)
    centroids.write.mode("overwrite").parquet(s"$root/centroids")
    corpus.write.mode("overwrite").parquet(s"$root/corpus")

    // the serving side: ONLY the two persisted tables
    val cIdx = spark.read.parquet(s"$root/centroids")
    val vIdx = spark.read.parquet(s"$root/corpus")
    // the 8x at-rest claim is a SCHEMA property, not a comment:
    vIdx.schema("q8").dataType shouldBe ArrayType(ByteType, containsNull = true)
    cIdx.count() shouldBe 8

    val queries = corpusDf(400).filter(col("vec_id") % 50 === 1)
      .select(col("vec_id").as("qid"), col("e").as("qe"))
    val top1 = AnnIndex.search(cIdx, vIdx, queries, nprobe = 2, topK = 1, dim = dim)
    val hits = top1.filter(col("nid") === col("qid") - 1).count()
    val nQ = queries.count()
    assert(hits == nQ, s"planted top-1 recall through the persisted index: $hits of $nQ")

    // serving is deterministic: two runs, byte-identical results
    val a = AnnIndex.search(cIdx, vIdx, queries, nprobe = 2, topK = 5, dim = dim).collect().toSeq
    val b = AnnIndex.search(cIdx, vIdx, queries, nprobe = 2, topK = 5, dim = dim).collect().toSeq
    a.map(_.toString).sorted shouldBe b.map(_.toString).sorted
  }

  test("degenerate vectors are excluded at build and at query time") {
    import spark.implicits._
    val good = corpusDf(100)
    val bad = Seq(
      (1000L, Seq.fill(dim)(0.0)),                       // zero norm
      (1001L, (Double.NaN +: Seq.fill(dim - 1)(1.0)).toSeq), // NaN component
      (1002L, null.asInstanceOf[Seq[Double]])            // NULL vector
    ).toDF("vec_id", "e")
    val (c, v) = AnnIndex.build(good.unionByName(bad), k = 4, dim = dim)
    v.filter(col("vec_id") >= 1000L).count() shouldBe 0
    // a degenerate QUERY has no direction to search for: dropped, not
    // a crash and not a NaN-topped ranking
    val q = Seq((2000L, Seq.fill(dim)(0.0))).toDF("qid", "qe")
    AnnIndex.search(c, v, q, nprobe = 2, topK = 3, dim = dim).count() shouldBe 0
  }
}
