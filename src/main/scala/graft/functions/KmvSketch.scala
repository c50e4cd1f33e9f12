package graft.functions

import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.{Encoder, Encoders}

/** KMV (k minimum values) distinct-count sketch as a typed
  * `Aggregator` — the UDAF rung of the extension ladder (SURVEY §2.10:
  * the reference has no UDAF; scalar-UDF-over-collect_list was its
  * workaround, `openfda/stage/MonteCarloSampling.scala:22-25`).
  *
  * Estimator: hash every value with the engine-portable polynomial
  * hash into [0, P); keep the k smallest DISTINCT hashes per group.
  * If fewer than k distinct hashes exist the sketch IS the exact
  * count; otherwise the k-th smallest hash u estimates the distinct
  * count as (k-1) * P / u (the order-statistics estimator: the k-th
  * of n uniform draws sits near k/n of the range).
  *
  * Why this next to approx_count_distinct (HLL, `q_agg_approx_
  * distinct_bounded`): the buffer is a tiny sorted array, MERGEABLE
  * by a sorted-merge-take-k — partial aggregation and AQE-split
  * partials compose exactly, which the spec proves by comparing 1- vs
  * 8-partition runs bit-for-bit. And unlike HLL's engine-specific
  * register layout, every step is replayable in ANSI SQL, so the
  * driver gate hash-checks the ESTIMATE itself (q_agg_kmv_distinct),
  * not a tolerance contract.
  *
  * The buffer stays a sorted immutable Seq: k is small (64 here), and
  * per-row work is an O(log k) binary search + O(k) copy only when the
  * hash actually enters the prefix — rows hashing above the current
  * k-th are rejected in O(log k) with no allocation.
  */
case class KmvBuffer(values: Seq[Long])

class KmvSketch(k: Int, p: Long) extends Aggregator[Long, KmvBuffer, Double] {

  override def zero: KmvBuffer = KmvBuffer(Vector.empty)

  override def reduce(b: KmvBuffer, h: Long): KmvBuffer = {
    val v = b.values
    val i = searchInsert(v, h)
    if (i < v.size && v(i) == h) b // already present
    else if (v.size >= k && i >= k) b // above the k-th smallest: reject
    else KmvBuffer(((v.take(i) :+ h) ++ v.drop(i)).take(k))
  }

  override def merge(a: KmvBuffer, b: KmvBuffer): KmvBuffer = {
    // sorted merge, distinct, keep k smallest
    val out = Vector.newBuilder[Long]
    var i = 0; var j = 0; var n = 0; var last = Long.MinValue
    val x = a.values; val y = b.values
    while (n < k && (i < x.size || j < y.size)) {
      val next =
        if (j >= y.size || (i < x.size && x(i) <= y(j))) { val v = x(i); i += 1; v }
        else { val v = y(j); j += 1; v }
      if (n == 0 || next != last) { out += next; last = next; n += 1 }
    }
    KmvBuffer(out.result())
  }

  override def finish(b: KmvBuffer): Double =
    if (b.values.size < k) b.values.size.toDouble // exact below k
    else (k - 1).toDouble * p / b.values.last

  override def bufferEncoder: Encoder[KmvBuffer] = Encoders.product[KmvBuffer]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble

  /** first index i with values(i) >= h (binary search) */
  private def searchInsert(v: Seq[Long], h: Long): Int = {
    var lo = 0; var hi = v.size
    while (lo < hi) {
      val mid = (lo + hi) >>> 1
      if (v(mid) < h) lo = mid + 1 else hi = mid
    }
    lo
  }
}
