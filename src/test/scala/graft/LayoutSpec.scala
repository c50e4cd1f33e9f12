package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.matchers.should.Matchers

import graft.functions.Layout

class LayoutSpec extends AnyFunSuite with Matchers with SparkSessionSetup {

  test("zorder2 interleaves bits (known values)") {
    import spark.implicits._
    // x=0b101 (5), y=0b011 (3) -> z bits: x at even, y at odd:
    // x0=1->b0, y0=1->b1, x1=0->b2, y1=1->b3, x2=1->b4, y2=0->b5
    // = 0b011011 = 27
    val got = Seq((5, 3)).toDF("x", "y")
      .select(Layout.zorder2($"x", $"y", bits = 3).as("z"))
      .as[Int].head()
    got shouldBe 27
  }

  test("zorder2 round-trips every 6-bit pair distinctly (bijective)") {
    import spark.implicits._
    val pairs = for { x <- 0 until 8; y <- 0 until 8 } yield (x, y)
    val zs = pairs.toDF("x", "y")
      .select(Layout.zorder2($"x", $"y", bits = 3).as("z"))
      .as[Int].collect()
    zs.distinct.length shouldBe 64
    zs.min shouldBe 0
    zs.max shouldBe 63
  }

  test("z-ordered layout tightens per-file min-max ranges on BOTH dimensions") {
    import spark.implicits._
    // Uniform 32x32 grid split into 32 contiguous "files" of 32 rows.
    // What min-max file skipping sees is each file's (max-min) spread
    // per column: in z order every file covers a compact ~sqrt(32)
    // tile, so BOTH spreads stay small; in x-major order a file is one
    // x column — x spread 0 but y spread 31, so predicates on y prune
    // nothing. The worst of the two spreads is the pruning-relevant
    // number for a predicate on an arbitrary interleaved column.
    val grid = (for { x <- 0 until 32; y <- 0 until 32 } yield (x, y)).toDF("x", "y")
      .withColumn("z", Layout.zorder2($"x", $"y", bits = 5))
    def meanWorstSpread(ordered: Seq[(Int, Int)]): Double =
      ordered.grouped(32).map { chunk =>
        val xs = chunk.map(_._1)
        val ys = chunk.map(_._2)
        math.max(xs.max - xs.min, ys.max - ys.min).toDouble
      }.sum / (ordered.size / 32)
    val zOrder = grid.orderBy("z").select("x", "y").as[(Int, Int)].collect().toSeq
    val xMajor = grid.orderBy("x", "y").select("x", "y").as[(Int, Int)].collect().toSeq
    val zSpread = meanWorstSpread(zOrder)    // 32-cell z tiles: 8x4 blocks
    val xSpread = meanWorstSpread(xMajor)    // one column: y spans 0..31
    zSpread should be <= 8.0
    xSpread shouldBe 31.0
  }

  test("zorder2Sql replays the interleave in DuckDB-compatible arithmetic (same values)") {
    import spark.implicits._
    // evaluate the generated SQL arithmetic via Spark SQL (operator
    // semantics >> << & | are shared), proving expression and SQL agree
    val sqlExpr = Layout.zorder2Sql("x", "y", bits = 4)
    val df = (for { x <- 0 until 16; y <- 0 until 16 } yield (x, y)).toDF("x", "y")
    val both = df.select(
      Layout.zorder2($"x", $"y", bits = 4).as("a"),
      expr(sqlExpr).as("b")
    )
    both.filter($"a" =!= $"b").count() shouldBe 0L
  }
}
