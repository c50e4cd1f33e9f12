package graft.operators

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Shared scaffolding for the two-pass global-order operators
  * (GlobalRank, PrefixSum): range-repartition on the sort key, sort
  * within partitions, append one LongType output column computed by
  * the operator-specific numbering function over the sorted RDD.
  *
  * `Dataset.rdd` is a lazy val, so when `number` runs one job to fold
  * per-partition state (a count or a sum) and a second to emit rows,
  * both walk the SAME lineage and the range shuffle's MAP stage runs
  * once. The reuse stops there: the reduce-side per-partition sort
  * re-runs in each job (the price of not persisting anything) — an
  * explicit tradeoff vs a persisted formulation, which would sort
  * once but leak cache blocks past the operator.
  */
private[operators] object RangeTwoPass {

  def appendLong(
      df: DataFrame,
      sortCols: Seq[Column],
      out: String,
      numPartitions: Int
  )(number: RDD[Row] => RDD[Row]): DataFrame = {
    val spark = df.sparkSession
    val n = if (numPartitions > 0) numPartitions
            else spark.conf.get("spark.sql.shuffle.partitions").toInt
    val sorted = df.repartitionByRange(n, sortCols: _*).sortWithinPartitions(sortCols: _*)
    val schema = StructType(sorted.schema.fields :+ StructField(out, LongType, nullable = false))
    spark.createDataFrame(number(sorted.rdd), schema)
  }
}
