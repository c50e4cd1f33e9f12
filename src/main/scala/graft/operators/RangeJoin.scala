package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Range (interval-containment) join: pair each point with every
  * interval [start, end) that contains it.
  *
  * Spark's only native plan for `p >= s AND p < e` is a broadcast
  * nested-loop / cartesian join (SURVEY.md §2.3 lists range joins as
  * absent from the reference too). This operator turns the range
  * condition into an equi-join by time-binning: an interval registers
  * in every bin it overlaps (intervals are short relative to the bin
  * width, so the fan-out is small and bounded), points join on their
  * single bin, and the exact predicate filters residually.
  *
  * Scale: one shuffle on the bin key; fan-out = ceil(interval_len /
  * bin) + 1 per interval. Choose `binSeconds` near the typical
  * interval length.
  */
object RangeJoin {

  /** @param points table with a timestamp column `pointCol`
    * @param intervals table with timestamp columns `startCol`/`endCol`
    *                  (end exclusive)
    * @return rows of (interval columns ++ point columns) for every
    *         containment pair.
    */
  def pointInInterval(
      points: DataFrame,
      pointCol: String,
      intervals: DataFrame,
      startCol: String,
      endCol: String,
      binSeconds: Long
  ): DataFrame = {
    val p = points.withColumn("__bin", floor(unix_timestamp(col(pointCol)) / binSeconds))
    val iv = intervals
      .withColumn(
        "__bin",
        explode(
          sequence(
            floor(unix_timestamp(col(startCol)) / binSeconds),
            // end is exclusive, but the boundary bin must still register
            floor(unix_timestamp(col(endCol)) / binSeconds)
          )
        )
      )
    iv.join(p, Seq("__bin"))
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__bin")
  }
}
