package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row}

/** Distributed global row-number: the catalog-scale cutover for a
  * partition-less rank window.
  *
  * `Window.orderBy(...)` with no partition key funnels the whole input
  * through ONE task — fine on a dimension-sized relation, an outage at
  * catalog scale (the reference's global study rank,
  * Search.scala:600-605, would hit this at ~20M entities). The classic
  * two-pass shape keeps the total order but distributes the work:
  *
  *  1. range-repartition on the sort key (Spark samples split points,
  *     so partitions are balanced) and sort within partitions;
  *  2. count rows per partition — an O(#partitions) driver fold whose
  *     cumulative sums become per-partition offsets;
  *  3. local position + offset = the exact global number.
  *
  * Steps 2-3 are `RDD.zipWithIndex` verbatim: both jobs share ONE RDD
  * lineage, so the range shuffle's map stage is computed once and the
  * second job reuses its outputs — no persist, nothing pinned in cache
  * after the query. (The previous DataFrame-window formulation needed
  * an explicit persist to get the same reuse, and leaked it.) The cost
  * of this shape is one InternalRow->Row->InternalRow conversion
  * confined to this operator; downstream plans codegen normally.
  *
  * The count pass is the same "tiny scalar fold crosses the driver"
  * boundary the reference's max-rank fold uses — it is O(#partitions),
  * never O(rows).
  *
  * The output column is LONG: a global row number is exactly the
  * operator you reach for past 2^31 rows, so an Int would overflow in
  * precisely its target regime.
  *
  * Note this is row_number semantics: ranks are exact and gap-free
  * when the sort key is a total order (unique). With duplicate keys,
  * equal rows get distinct consecutive numbers (arbitrary within the
  * tie) rather than rank()'s shared value — callers needing rank() on
  * non-unique keys must add a unique tie-breaker column first.
  *
  * MEASURED (tools.GlobalOrderCompare, 50M rows, local[32],
  * checksum-verified equal): two-pass 16-21 s vs partition-less
  * window 47-49 s. local mode UNDERSTATES the win — all 32 threads
  * share the window's one task's machine; on a real cluster the
  * window still runs on one executor core while the two-pass uses
  * them all.
  */
object GlobalRank {

  def rowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String,
      numPartitions: Int = 0
  ): DataFrame =
    // zipWithIndex's internal count job and the final compute job walk
    // the same lineage (see RangeTwoPass), so the range shuffle runs
    // once (second job skips the finished map stage).
    RangeTwoPass.appendLong(df, sortCols, out, numPartitions) { rdd =>
      rdd.zipWithIndex().map { case (r, i) => Row.fromSeq(r.toSeq :+ (i + 1L)) }
    }
}
