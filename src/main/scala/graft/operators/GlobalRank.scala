package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

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
  *  2. count rows per partition — a #partitions-sized aggregate whose
  *     result is broadcast back as cumulative offsets;
  *  3. per-partition row_number + offset = the exact global number.
  *
  * The per-partition counts pass is the same "tiny scalar fold crosses
  * the driver" boundary the reference's max-rank fold uses — it is
  * O(#partitions), never O(rows).
  *
  * Note this is row_number semantics: ranks are exact and gap-free
  * when the sort key is a total order (unique). With duplicate keys,
  * equal rows get distinct consecutive numbers (arbitrary within the
  * tie) rather than rank()'s shared value — callers needing rank() on
  * non-unique keys should add a tie-breaker column first.
  */
object GlobalRank {

  def rowNumber(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String,
      numPartitions: Int = 0
  ): DataFrame = {
    val n = if (numPartitions > 0) numPartitions
            else df.sparkSession.conf.get("spark.sql.shuffle.partitions").toInt
    // One shuffle, consumed twice (counts + numbering): persist so the
    // sampled range boundaries are computed once and both passes see
    // the identical partitioning.
    val parts = df
      .repartitionByRange(n, sortCols: _*)
      .withColumn("__pid", spark_partition_id())
      .persist()
    val counts = parts
      .groupBy(col("__pid"))
      .agg(count(lit(1)).as("__cnt"))
      .orderBy(col("__pid"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .toSeq
    var acc = 0L
    val offsets = counts.map { case (pid, cnt) =>
      val o = (pid, acc); acc += cnt; o
    }
    import df.sparkSession.implicits._
    val offsetDf = offsets.toDF("__pid", "__offset")
    val wLocal = Window.partitionBy(col("__pid")).orderBy(sortCols: _*)
    parts
      .withColumn("__local", row_number().over(wLocal))
      .join(broadcast(offsetDf), Seq("__pid"))
      .withColumn(out, (col("__local") + col("__offset")).cast("int"))
      .drop("__pid", "__local", "__offset")
  }
}
