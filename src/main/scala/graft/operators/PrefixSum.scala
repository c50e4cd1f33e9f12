package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Distributed exact global running sum: the catalog-scale cutover for
  * a partition-less `sum().over(Window.orderBy(...))`, which funnels
  * the whole input through ONE task exactly like a global rank (see
  * GlobalRank's scaladoc for the outage math).
  *
  * Classic two-pass shape over ONE range shuffle:
  *
  *  1. range-repartition on the sort key and sort within partitions —
  *     partitions now hold contiguous, ordered key ranges;
  *  2. first job: per-partition totals — an O(#partitions) driver fold
  *     whose exclusive cumulative sums become per-partition offsets;
  *  3. second job: local running sum + the partition's offset = the
  *     exact global prefix sum.
  *
  * Both jobs walk the SAME RDD lineage (`Dataset.rdd` is a lazy val),
  * so the range shuffle's map stage runs once, mirroring GlobalRank's
  * persist-free reuse. The driver sees only #partitions longs, never
  * rows.
  *
  * The running value is a Long: token counts, byte sizes, and row
  * counts — the things a training pipeline accumulates — are integral,
  * and integer addition is associative so the distributed sum is
  * EXACTLY the sequential one (no float reassociation caveat).
  *
  * Output column semantics are INCLUSIVE (the row's own value is
  * counted, SQL's `ROWS UNBOUNDED PRECEDING` frame); subtract the
  * value column for the exclusive prefix.
  *
  * Like GlobalRank, the sort key must be a TOTAL order (unique): with
  * duplicate keys the per-row running value at tie rows depends on the
  * arbitrary order within the tie (the end-of-tie-group total is still
  * deterministic). Callers add a unique tie-breaker column when the
  * natural key can repeat — every registry consumer does
  * ((doc_id, chunk_id), (skey, doc_id)).
  *
  * MEASURED (tools.GlobalOrderCompare, 50M rows, local[32],
  * checksum-verified equal): two-pass 5.7 s vs partition-less window
  * 47 s — 8x, and local mode understates it (the window's single task
  * cannot use a cluster at all).
  */
object PrefixSum {

  def runningSum(
      df: DataFrame,
      sortCols: Seq[Column],
      valueCol: String,
      out: String,
      numPartitions: Int = 0
  ): DataFrame = {
    // The per-partition fold reads the value with getLong, so anything
    // but LongType would surface as a ClassCastException deep inside a
    // task. Fail fast at the API boundary instead: integral widths are
    // the documented semantics (see scaladoc) — callers with Int
    // counts cast explicitly, keeping the overflow decision visible.
    val dt = df.schema(valueCol).dataType
    require(
      dt == org.apache.spark.sql.types.LongType,
      s"PrefixSum.runningSum: value column '$valueCol' must be LongType (BIGINT), " +
        s"got ${dt.simpleString} — cast it explicitly (col.cast(\"long\"))")
    val valueIdx = df.schema.fieldIndex(valueCol)
    RangeTwoPass.appendLong(df, sortCols, out, numPartitions) { rdd =>
      // job 1: per-partition totals -> exclusive offsets
      // (O(#partitions) driver state, the same boundary GlobalRank's
      // count pass crosses)
      val partials = rdd
        .mapPartitionsWithIndex { (i, it) =>
          var s = 0L
          it.foreach(r => s += r.getLong(valueIdx))
          Iterator((i, s))
        }
        .collect()
        .sortBy(_._1)
        .map(_._2)
      val offsets = partials.scanLeft(0L)(_ + _) // offsets(i) = sum of partitions < i
      // job 2: local running sum + offset (map stage of the range
      // shuffle is already computed; only the reduce side re-runs)
      rdd.mapPartitionsWithIndex { (i, it) =>
        var acc = offsets(i)
        it.map { r =>
          acc += r.getLong(valueIdx)
          Row.fromSeq(r.toSeq :+ acc)
        }
      }
    }
  }
}
