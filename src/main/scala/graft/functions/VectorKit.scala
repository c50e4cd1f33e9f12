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

  /** The embeddings table's vector dimension — the single source for
    * the shape guards, the seeded plane tables, and the oracle's
    * zero-vector literal.
    */
  val EmbeddingDim = 64

  /** Exact float->double widening of an embedding column, with the
    * SHAPE guard of the degenerate-vector policy.
    *
    * A vector containing NULL ELEMENTS (legal in the parquet schema:
    * the list element is nullable) or with the WRONG DIMENSION (a
    * truncated upstream write) maps to a NULL vector, so it joins the
    * NULL-embedding policy class everywhere downstream (dropped from
    * rankings, carried kept=true by SemDeDup). Without this, the
    * engines would diverge in the worst way: the native DotProduct
    * reads a null slot as 0.0 and folds over the shorter length on a
    * dimension mismatch (finite norm, silently-wrong cosine) while
    * DuckDB's list distance functions THROW on null elements and
    * length mismatches — not a hash mismatch but a crashed oracle
    * run. exists() is an interpreted HOF like the transform it
    * guards; the native codegen'd math (dot/norm) stays downstream of
    * the projection.
    */
  def toDouble(v: Column, dim: Int = EmbeddingDim): Column =
    when(
      size(v) === dim && !exists(v, x => x.isNull),
      transform(v, x => x.cast(DoubleType)))
      .otherwise(lit(null).cast("array<double>"))

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

  /** TRUE iff a vector with the given precomputed [[norm]] can
    * participate in cosine math: the norm is finite and strictly
    * positive. Zero vectors (no direction), NaN/Inf components, and
    * magnitudes whose self-dot overflows to Inf all fail.
    *
    * Policy (the degenerate-vector rung of the robustness sweeps,
    * pinned by DegenerateVectorSpec in BOTH ANSI modes): EVERY cosine
    * consumer must keep un-normalizable vectors out of the cosine
    * math, because the failure is loud or wrong in every direction —
    * (a) NaN compares GREATER than any real double in Spark AND DuckDB
    * (NaN >= tau is TRUE; NaN is the ordering's largest value), so an
    * unfiltered NaN cosine both claims the top rank of every ranking
    * query and marks everything a near-duplicate in the threshold
    * queries; (b) DuckDB's list_cosine_similarity returns -1.0 (not
    * NaN) for zero/NaN vectors, so the two engines diverge exactly
    * where the comparison semantics would need to agree; (c) under
    * ANSI mode (the Spark 4 default, active in Verify/Bench sessions)
    * dividing by a zero norm throws DIVIDE_BY_ZERO outright. RANKING
    * queries (cosine top-k, ANN, IVF) therefore DROP un-normalizable
    * vectors at the scan; DEDUP queries exclude them from the pairwise
    * join and CARRY them in the output with kept=true — a vector with
    * no direction duplicates nothing.
    * A NULL embedding yields a NULL norm, which also fails the filter.
    */
  def normalizable(nrm: Column): Column =
    !isnan(nrm) && nrm > 0 && nrm < lit(Double.PositiveInfinity)

  /** DuckDB mirror of [[normalizable]] over a DOUBLE[] expression.
    * Equivalent by monotonicity of sqrt: norm=sqrt(dot(e,e)) is finite
    * and positive iff dot(e,e) is (NaN sqrt is NaN, Inf sqrt is Inf),
    * and isfinite() rejects both NaN and Inf.
    *
    * REQUIRES a [[sanitizedSql]] input, in WHERE context only. DuckDB
    * 1.0's list_inner_product THROWS on a NULL list and on a list
    * with NULL ELEMENTS (it does not return NULL when the input comes
    * from a real column). Only the leading `IS NOT NULL` reliably
    * guards it: null-mask conjuncts narrow the selection before
    * expression conjuncts run, but expression-vs-expression conjunct
    * order is NOT guaranteed (probed: a `len(list_filter(..))=0`
    * conjunct placed before the inner_product did not prevent the
    * throw — tools/degen_check.py caught exactly that), and CASE /
    * COALESCE wrappers in projections evaluate the function on every
    * row anyway. Hence the two-step contract: [[sanitizedSql]] first
    * maps bad-SHAPE vectors (NULL, null element) to NULL inside a
    * MATERIALIZED CTE, then this fragment's null-mask + norm checks
    * drop bad-VALUE vectors (zero norm, NaN/Inf).
    */
  def normalizableSql(e: String): String =
    s"($e IS NOT NULL AND isfinite(list_inner_product($e, $e))" +
      s" AND list_inner_product($e, $e) > 0)"

  /** Shape sanitizer for oracle SQL: maps a raw DOUBLE[] expression to
    * itself when well-shaped, NULL when the list is NULL, has the
    * wrong dimension, or contains NULL elements — mirroring
    * [[toDouble]]'s shape guard on the Spark side. list_filter/len
    * tolerate NULL lists (only the distance functions throw), so this
    * expression is safe in any context; wrap it in an
    * `AS MATERIALIZED` CTE so downstream list_inner_product consumers
    * read a flat, already-sanitized vector (see [[normalizableSql]]
    * for why that matters).
    */
  def sanitizedSql(raw: String, dim: Int = EmbeddingDim): String =
    s"(CASE WHEN $raw IS NOT NULL AND len($raw) = $dim" +
      s" AND len(list_filter($raw, x -> x IS NULL)) = 0 THEN $raw END)"

  /** A 64-dim all-zeros DOUBLE[] literal: the COALESCE stand-in for a
    * NULL embedding in oracle SQL projection contexts. A zero vector is
    * in the same policy class as the NULL it replaces (un-normalizable,
    * cluster 0), so substituting it changes no output.
    */
  def zerosSql(dim: Int): String =
    "CAST([" + Seq.fill(dim)("0.0").mkString(",") + "] AS DOUBLE[])"

  /** Cosine similarity; denominator is sqrt(na)*sqrt(nb) (not
    * sqrt(na*nb)) to match the conventional engine implementations
    * bit-for-bit.
    */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (norm(a) * norm(b))

  /** Unit-scale int8 scalar quantization (the SQ8 ANN rung): divide by
    * the vector's own L2 norm (direction only — cosine search never
    * needs the magnitude) and round each coordinate to the nearest
    * integer in [-127, 127]:  q_i = floor(x_i/nrm * 127 + 0.5).
    *
    * Every value is int8-representable (|x_i| <= nrm, and the 1-ulp
    * division slack cannot push |q_i| past 127 — that would need a
    * ratio >= 1.004); the carrier stays DOUBLE so the quantized dot
    * product runs through the codegen'd [[dot]] and is EXACT integer
    * arithmetic in both engines (sums of products of ints <= 127^2*64
    * sit far inside the 2^53 exact-integer range, so fold order is
    * irrelevant — the one float-determinism-free stage in the
    * similarity family). A production table persists
    * `transform(q8, _.cast("tinyint"))` — 8x smaller than float32,
    * the memory-bandwidth win SQ exists for; the values here are
    * bit-identical to that storage.
    */
  def quantize8(e: Column, nrm: Column): Column =
    transform(e, x => floor(x / nrm * lit(127.0) + lit(0.5)).cast(DoubleType))

  /** DuckDB mirror of [[quantize8]]: same expression tree, same IEEE
    * grouping ((x / nrm) * 127 + 0.5), over a DOUBLE[] `e` and a
    * DOUBLE `nrm` column in scope.
    */
  def quantize8Sql(e: String, nrm: String): String =
    s"list_transform($e, x -> floor(x / $nrm * 127 + 0.5))"

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
    *
    * Prefix property (relied on by the corpus-scaled SemDeDup
    * signature, asserted by OperatorsSpec): the PRNG fills plane 0
    * completely before plane 1, so `randomSignPlanes(k, d)` equals the
    * first k planes of `randomSignPlanes(m, d)` for any m >= k —
    * growing the plane budget only APPENDS planes, it never reshuffles
    * the ones already in use.
    */
  def randomSignPlanes(numPlanes: Int, dim: Int, seed: Long = 42L): Array[Array[Double]] = {
    val rng = new scala.util.Random(seed)
    Array.fill(numPlanes, dim)(if (rng.nextBoolean()) 1.0 else -1.0)
  }

  // ------------------------------------------------------------------
  // Corpus-scaled LSH cluster sizing (SemDeDup): the plane count grows
  // with the corpus so per-cluster membership stays ~targetClusterSize
  // no matter how large the input — the same sizing rule MinHash LSH
  // bands use. The ladder is INTEGER arithmetic only (n <= target<<p),
  // never floating log2: both engines replay identical comparisons, so
  // an n that lands exactly on a power-of-two boundary cannot diverge
  // between Spark and the DuckDB oracle on libm rounding.
  // ------------------------------------------------------------------

  /** SemDeDup sizing constants: ~64 vectors per cluster; plane count
    * clamped to [4, 24]. The floor matches the fixture-era 4-plane
    * signature (small corpora keep their historical clustering); the
    * ceiling bounds signature cost and covers 64*2^24 ≈ 1.1e9 vectors
    * at the target density before per-cluster growth resumes.
    */
  val SemDedupTarget = 64L
  val SemDedupMinPlanes = 4
  val SemDedupMaxPlanes = 24

  /** The (planeCount, maxCorpusSize) ladder steps below the clamp
    * ceiling: plane count p serves corpora up to target * 2^p.
    */
  def planeLadder(target: Long, minPlanes: Int, maxPlanes: Int): Seq[(Int, Long)] =
    (minPlanes until maxPlanes).map(p => (p, target << p))

  /** Spark-side ladder: smallest p in [minPlanes, maxPlanes] with
    * n <= target * 2^p.
    */
  def planeCount(n: Column, target: Long, minPlanes: Int, maxPlanes: Int): Column =
    planeLadder(target, minPlanes, maxPlanes).foldRight(lit(maxPlanes): Column) {
      case ((p, cap), acc) => when(n <= cap, lit(p)).otherwise(acc)
    }

  /** DuckDB mirror of [[planeCount]], generated from the SAME ladder
    * definition (never restated by hand).
    */
  def planeCountSql(nExpr: String, target: Long, minPlanes: Int, maxPlanes: Int): String =
    "CASE " + planeLadder(target, minPlanes, maxPlanes)
      .map { case (p, cap) => s"WHEN $nExpr <= $cap THEN $p" }
      .mkString(" ") + s" ELSE $maxPlanes END"

  /** Prefix-gated hyperplane signature: bit j participates iff j < np
    * (np a runtime column from [[planeCount]]). Projections beyond np
    * are short-circuited by the CASE, so the per-row cost is np dot
    * products, not maxPlanes. With the prefix property of
    * [[randomSignPlanes]], a corpus small enough for np = k produces
    * bit-identical clusters to a fixed k-plane signature.
    */
  def hyperplaneBucketScaled(v: Column, planes: Array[Array[Double]], np: Column): Column =
    planes.zipWithIndex.map { case (plane, j) =>
      when(lit(j) < np && (dot(v, typedLit(plane.toSeq)) > 0), lit(1L << j))
        .otherwise(lit(0L))
    }.reduce(_ + _)

  /** DETERMINISTIC driver-side Lloyd k-means over a bounded sample —
    * the PQ sub-codebook trainer (q_similarity_ivf_pq). Codebooks are
    * driver-side metadata exactly like a broadcast centroid table, and
    * a sub-space fit is milliseconds of math; routing it through MLlib
    * cost ~10 scheduler round-trips PER ITERATION per sub-space
    * (measured: the 8 sub-fits dominated the rung's 12-13 s).
    * Deterministic under ANY partitioning: the points are deduped and
    * SORTED before the evenly-spaced initialization, so the trained
    * codebook is a pure function of the sample SET. Empty clusters
    * keep their previous centroid. k clamps to the distinct-point
    * count (the degenerate-input guard the MLlib path needed
    * externally).
    */
  def localKMeans(points: Seq[Seq[Double]], k: Int, iters: Int = 10): Seq[Seq[Double]] = {
    import scala.math.Ordering.Implicits._
    val pts = points.distinct.sorted
    if (pts.isEmpty) return Seq.empty
    val kk = math.min(k, pts.size)
    val dim = pts.head.size
    var centroids: IndexedSeq[Array[Double]] =
      (0 until kk).map(i => pts((i.toLong * pts.size / kk).toInt).toArray)
    def d2(a: Seq[Double], b: Array[Double]): Double = {
      var s = 0.0; var i = 0
      while (i < dim) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    for (_ <- 1 to iters) {
      val sums = Array.fill(kk)(new Array[Double](dim))
      val counts = new Array[Long](kk)
      pts.foreach { p =>
        var best = 0; var bd = Double.MaxValue; var c = 0
        while (c < kk) { val d = d2(p, centroids(c)); if (d < bd) { bd = d; best = c }; c += 1 }
        counts(best) += 1
        var i = 0
        while (i < dim) { sums(best)(i) += p(i); i += 1 }
      }
      centroids = (0 until kk).map { c =>
        if (counts(c) == 0) centroids(c)
        else { val a = new Array[Double](dim); var i = 0
          while (i < dim) { a(i) = sums(c)(i) / counts(c); i += 1 }; a }
      }
    }
    centroids.map(_.toSeq)
  }
}
