package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DoubleType

/** Vector math over Array[Float]/Array[Double] embedding columns,
  * built from codegen'd higher-order functions (zip_with/aggregate) —
  * no UDF, no MLlib Vector boxing on the hot path.
  *
  * Reference analogue: literature/Vectors.scala:29-36 computes an L2
  * norm with a UDF over MLlib vectors; here the same math stays inside
  * whole-stage codegen.
  *
  * Determinism: aggregate() folds left in element order, so dot
  * products are sequential double sums — bit-identical on any
  * partitioning and reproducible by any engine that folds in order
  * (DuckDB's list_cosine_similarity over DOUBLE[] matches exactly).
  */
object VectorKit {

  /** Exact float->double widening of an embedding column. */
  def toDouble(v: Column): Column = transform(v, x => x.cast(DoubleType))

  /** Sequential-fold dot product — the native codegen'd expression
    * (graft.plans.DotProduct), bit-identical to the HOF fold
    * `aggregate(zip_with(a, b, _*_), 0.0, _+_)` it replaces (same
    * left-to-right double accumulation) but generated as a primitive
    * loop inside whole-stage codegen instead of interpreted
    * per-element closures.
    */
  def dot(a: Column, b: Column): Column =
    graft.plans.GraftExtensions.dotProduct(a, b)

  /** L2 norm. */
  def norm(a: Column): Column = sqrt(dot(a, a))

  /** Cosine similarity; denominator is sqrt(na)*sqrt(nb) (not
    * sqrt(na*nb)) to match the conventional engine implementations
    * bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Random-hyperplane LSH signature: bit j = [dot(v, plane_j) > 0],
    * packed into a Long. Planes are ±1-valued and fixed (seeded), so
    * the bucketing is deterministic across runs and executors.
    */
  def hyperplaneBucket(v: Column, planes: Array[Array[Double]]): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      val proj = dot(v, typedLit(plane.toSeq))
      when(proj > 0, lit(1L << j)).otherwise(lit(0L))
    }.reduce(_ + _)

  /** Deterministic ±1 hyperplanes (seeded PRNG; seed is part of the
    * operator definition, not runtime state).
    */
  def randomSignPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }
}
