package graft.functions

import org.apache.commons.math3.random.Well19937c

/** Seeded Monte-Carlo critical values for LLR significance filtering.
  *
  * Re-expresses the reference's openfda significance test
  * (etl/backend/openfda/stage/MonteCarloSampling.scala:22-50,
  * openfda/utils/MathUtils.scala:9-79) with commons-math3 (bundled
  * with Spark) instead of breeze, and with a *per-group* seed so the
  * result is deterministic regardless of task scheduling — the
  * reference shares one global seeded RandBasis, which makes its
  * output depend on row order within a partition.
  *
  * Semantics: for one target group (a drug in the reference; a
  * supplier in our testdata analogue) with per-reaction report counts
  * `n_i`, total group reports `n_j`, and `total` reports overall,
  * simulate `permutations` multinomial draws of n_j reports across
  * reactions with probabilities n_i/total, compute each draw's maximum
  * LLR over reactions, and return the requested percentile of those
  * maxima. An observed LLR above this critical value is significant.
  */
object MonteCarlo {

  /** Multinomial draw via the conditional-binomial method: component j
    * is Binomial(remaining, p_j / remaining_prob). This is the standard
    * construction (same contract as R's rmultinom, which the reference
    * mirrors via breeze at MathUtils.scala:46-79).
    */
  private def multinomialDraw(rng: Well19937c, size: Int, probs: Array[Double]): Array[Int] = {
    val out = new Array[Int](probs.length)
    var remaining = size
    var remainingProb = 1.0
    var j = 0
    while (j < probs.length && remaining > 0) {
      val p = if (remainingProb <= 0) 0.0 else math.min(1.0, probs(j) / remainingProb)
      val draw =
        if (p >= 1.0) remaining
        else if (p <= 0.0) 0
        else binomialDraw(rng, remaining, p)
      out(j) = draw
      remaining -= draw
      remainingProb -= probs(j)
      j += 1
    }
    out
  }

  /** One Binomial(n, p) draw by inversion of a single uniform. Exact
    * quantile walk below the normal regime; normal approximation
    * with continuity correction (clamped to [0, n]) when npq is large
    * — the standard speed/accuracy trade for Monte-Carlo permutation
    * counts, and deterministic because the only randomness is the
    * seeded uniform.
    */
  private def binomialDraw(rng: Well19937c, n: Int, p: Double): Int = {
    val u = rng.nextDouble()
    val npq = n * p * (1 - p)
    if (npq > 9.0) {
      val z = org.apache.commons.math3.special.Erf.erfInv(2 * u - 1) * math.sqrt(2.0)
      val x = math.rint(n * p + z * math.sqrt(npq))
      math.max(0, math.min(n, x.toInt))
    } else {
      binomialInv(n, p, u)
    }
  }

  /** Exact binomial quantile (smallest k with CDF(k) >= u) by a direct
    * inverse-CDF walk on the pmf-ratio recurrence
    * pmf(k) = pmf(k-1) * (n-k+1)/k * p/q — O(np) expected steps with
    * no allocation, replacing commons-math's per-draw
    * BinomialDistribution + bisection (a regularized-incomplete-beta
    * evaluation per probe), which dominated the sampler's profile.
    * Only reached when npq <= 9; the p > 0.5 mirror keeps pow(q, n)
    * well above underflow there (np <= 18 after mirroring). Boundary
    * rounding can differ from the bisection by one count on
    * measure-zero u — irrelevant to a sampler whose contract is
    * "deterministic in the seed, correct distribution".
    */
  private def binomialInv(n: Int, p: Double, u: Double): Int = {
    if (p <= 0.0) return 0
    if (p >= 1.0) return n
    if (p > 0.5) return n - binomialInv(n, 1.0 - p, 1.0 - u)
    val q = 1.0 - p
    val ratio = p / q
    var k = 0
    var pmf = math.pow(q, n.toDouble)
    var cdf = pmf
    while (cdf < u && k < n) {
      k += 1
      pmf = pmf * (n - k + 1) / k * ratio
      cdf += pmf
    }
    k
  }

  /** LLR of observing x of n_j group reports on a reaction with y of
    * `total` overall reports (the per-cell formula from
    * MathUtils.scala:29-41, algebraically identical).
    */
  private def cellLlr(x: Double, y: Double, nj: Double, total: Double): Double = {
    if (x <= 0 || y <= 0 || nj - x < 0) return 0.0
    val t1 = x * (math.log(x) - math.log(y))
    val t2 =
      if (nj - x == 0) 0.0
      else (nj - x) * (math.log(nj - x) - math.log(total - y))
    val v = t1 + t2 - nj * math.log(nj) + nj * math.log(total)
    if (v.isNaN || v.isInfinite) 0.0 else v
  }

  /** Critical value for one group. Deterministic: the RNG is seeded
    * from `seed` only.
    */
  def criticalValue(
      permutations: Int,
      nJ: Int,
      nI: Seq[Long],
      total: Int,
      percentile: Double,
      seed: Long
  ): Double = {
    if (nI.isEmpty || nJ <= 0 || total <= 0) return 0.0
    val rng = new Well19937c(seed)
    val probs = nI.map(_.toDouble / total).toArray
    // primitive copy OUTSIDE the permutation loop: nI(c) inside it is a
    // boxed Seq apply paid permutations x cells times per group
    val nIDouble: Array[Double] = nI.iterator.map(_.toDouble).toArray
    val maxima = new Array[Double](permutations)
    var it = 0
    while (it < permutations) {
      val draw = multinomialDraw(rng, nJ, probs)
      var best = 0.0
      var c = 0
      while (c < draw.length) {
        val v = cellLlr(draw(c).toDouble, nIDouble(c), nJ.toDouble, total.toDouble)
        if (v > best) best = v
        c += 1
      }
      maxima(it) = best
      it += 1
    }
    java.util.Arrays.sort(maxima)
    // Linear-interpolated percentile (type-7, the R/numpy default the
    // reference gets from breeze DescriptiveStats.percentile).
    val h = (maxima.length - 1) * percentile
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    maxima(lo) + (h - lo) * (maxima(hi) - maxima(lo))
  }
}
