package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.operators.Hnsw

/** The HNSW graph tier: determinism (hashed levels + ordered ties =
  * the same graph and the same answers on every build), recall
  * against brute force, and the small-input edges.
  */
class HnswSpec extends AnyFunSuite with Matchers {

  private def unit(v: Array[Double]): Array[Double] = {
    val n = math.sqrt(v.map(x => x * x).sum)
    v.map(_ / n)
  }

  /** Deterministic pseudo-random corpus: splitmix-ish per-coordinate
    * hash values in [-1, 1], 16 dims.
    */
  private def corpus(n: Int, dim: Int = 16): IndexedSeq[(Long, Array[Double])] =
    (0 until n).map { i =>
      val v = Array.tabulate(dim) { d =>
        var z = (i.toLong * 31 + d) + 0x9e3779b97f4a7c15L
        z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
        z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
        ((z ^ (z >>> 31)) % 2000L).toDouble / 1000.0
      }
      (i.toLong, unit(v))
    }

  private def bruteTop(
      pts: IndexedSeq[(Long, Array[Double])],
      q: Array[Double],
      k: Int): Seq[Long] =
    pts.map { case (id, v) =>
      (id, v.zip(q).map { case (a, b) => a * b }.sum)
    }.sortBy { case (id, s) => (-s, id) }.take(k).map(_._1)

  test("build is deterministic: two graphs over the same points answer " +
      "identically for every query") {
    val pts = corpus(500)
    val g1 = Hnsw.build(pts)
    val g2 = Hnsw.build(pts)
    for (qi <- 0 until 20) {
      val q = pts(qi * 7)._2
      Hnsw.search(g1, q, k = 5) shouldBe Hnsw.search(g2, q, k = 5)
    }
  }

  test("recall: with ef well above k, served top-3 sits inside the exact " +
      "top-10 for every query on a 2k corpus") {
    val pts = corpus(2000)
    val g = Hnsw.build(pts, m = 8, efConstruction = 64)
    var misses = 0
    for (qi <- 0 until 50) {
      val (qid, q) = pts(qi * 37)
      val exact10 = bruteTop(pts.filterNot(_._1 == qid), q, 10).toSet
      val served = Hnsw.search(g, q, k = 11, ef = 96)
        .filter(_._1 != qid).take(3).map(_._1)
      misses += served.count(!exact10.contains(_))
    }
    misses shouldBe 0
  }

  test("scores are exact cosine (the stored vectors are full precision)") {
    val pts = corpus(300)
    val g = Hnsw.build(pts)
    val (_, q) = pts(42)
    Hnsw.search(g, q, k = 5).foreach { case (id, s) =>
      val v = pts(id.toInt)._2
      s shouldBe v.zip(q).map { case (a, b) => a * b }.sum
    }
  }

  test("PERSISTENCE round trip: toRows -> parquet -> fromRows answers " +
      "bit-identically to the freshly built graph") {
    val pts = corpus(800)
    val g = Hnsw.build(pts)
    val rows = Hnsw.toRows(g)
    // in-memory round trip, rows shuffled (any table order must do)
    val g2 = Hnsw.fromRows(scala.util.Random.shuffle(rows))
    for (qi <- 0 until 25) {
      val q = pts(qi * 13)._2
      Hnsw.search(g2, q, k = 7) shouldBe Hnsw.search(g, q, k = 7)
    }
    // through parquet (the actual persistence carrier)
    val dir = java.nio.file.Files.createTempDirectory("graft-hnsw-rt").toString
    val spark = SparkSessionSetup.shared
    import spark.implicits._
    rows.toDF("id", "vec", "level", "neighbors").write.mode("overwrite").parquet(dir)
    val back = spark.read.parquet(dir)
      .as[(Long, Seq[Double], Int, Seq[Seq[Long]])].collect().toSeq
    val g3 = Hnsw.fromRows(back)
    for (qi <- 0 until 25) {
      val q = pts(qi * 13)._2
      Hnsw.search(g3, q, k = 7) shouldBe Hnsw.search(g, q, k = 7)
    }
    // a corrupt row refuses loudly
    intercept[IllegalArgumentException] {
      Hnsw.fromRows(Seq((1L, Seq(1.0), 2, Seq(Seq.empty[Long]))))
    }
  }

  test("extend: appended points are searchable with build-grade recall; the " +
      "base graph is untouched; duplicate ids refuse") {
    val pts = corpus(600)
    val (base, late) = pts.splitAt(500)
    val g0 = Hnsw.build(base, m = 8, efConstruction = 64)
    val g0Answers = (0 until 5).map(i => Hnsw.search(g0, pts(i)._2, 10, ef = 96))
    val g = Hnsw.extend(g0, late, m = 8, efConstruction = 64)
    // the base graph still answers exactly as before (extend is pure)
    (0 until 5).foreach { i =>
      Hnsw.search(g0, pts(i)._2, 10, ef = 96) shouldBe g0Answers(i)
    }
    // recall over the UNION: served top-3 inside exact top-10, and an
    // appended vector is findable as a query target
    (0 until 20).foreach { i =>
      val q = pts(i * 29 % 600)._2
      val exact = bruteTop(pts, q, 10).toSet
      Hnsw.search(g, q, 3, ef = 128).foreach { case (id, _) =>
        exact should contain(id)
      }
    }
    // an appended point's own vector returns itself first
    val lateQ = late(7)
    Hnsw.search(g, lateQ._2, 1, ef = 96).head._1 shouldBe lateQ._1
    // duplicate insert refuses
    intercept[IllegalArgumentException] {
      Hnsw.extend(g, IndexedSeq(base.head), m = 8, efConstruction = 64)
    }
    // extend round-trips through rows like any graph
    val g2 = Hnsw.fromRows(Hnsw.toRows(g))
    (0 until 5).foreach { i =>
      Hnsw.search(g2, pts(i)._2, 10, ef = 96) shouldBe
        Hnsw.search(g, pts(i)._2, 10, ef = 96)
    }
  }

  test("small inputs: singleton and two-point graphs answer; empty refuses") {
    val one = corpus(1)
    val g1 = Hnsw.build(one)
    Hnsw.search(g1, one(0)._2, k = 3).map(_._1) shouldBe Seq(0L)
    val two = corpus(2)
    val g2 = Hnsw.build(two)
    Hnsw.search(g2, two(0)._2, k = 3).map(_._1).toSet shouldBe Set(0L, 1L)
    intercept[IllegalArgumentException] {
      Hnsw.build(IndexedSeq.empty)
    }
  }
}
