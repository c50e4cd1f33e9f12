package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of join: for each left row, the latest right row with the same
  * key and right.time <= left.time.
  *
  * Spark has no built-in as-of join (SURVEY.md §2.3 notes the gap; the
  * builder brief names it a required custom operator). This
  * implementation uses the union + running-last trick instead of a
  * range join: tag both inputs, union them, and take
  * `last(right_payload, ignoreNulls)` over a running window ordered by
  * (time, tag) within the key — right rows at the same instant sort
  * before left rows, so the match is inclusive.
  *
  * Scale: ONE shuffle on the key (the window partition), no range-join
  * row explosion, no broadcast requirement — the same plan shape works
  * when both sides are fact-sized, which is exactly where naive
  * range-condition joins blow up.
  */
object AsOfJoin {

  /** @param left/right inputs
    * @param keyCols equality key column names (present on both sides)
    * @param leftTime/rightTime event-time columns
    * @return left rows + `matched` struct of the right row (null when
    *         no right row at-or-before), right payload columns nested
    *         under `matched`.
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTime: String,
      rightTime: String
  ): DataFrame = {
    val rightPayload = right.columns.filterNot(keyCols.contains)
    val leftCols = left.columns

    val taggedRight = right
      .withColumn("__t", col(rightTime))
      .withColumn("__tag", lit(0))
      .withColumn("__payload", struct(rightPayload.map(col): _*))
      .select((keyCols.map(col) :+ col("__t") :+ col("__tag") :+ col("__payload")): _*)

    val taggedLeft = left
      .withColumn("__t", col(leftTime))
      .withColumn("__tag", lit(1))
      .withColumn("__left", struct(leftCols.map(col): _*))
      .select((keyCols.map(col) :+ col("__t") :+ col("__tag") :+ col("__left")): _*)

    val unioned = graft.functions.ColumnKit.unionDifferentSchema(taggedRight, taggedLeft)

    // Ordering: (__t, __tag) puts right rows before left rows at the
    // same instant (inclusive match); __payload breaks ties among right
    // rows sharing (key, time) — struct comparison is field-by-field,
    // so the winning payload is the field-wise greatest, deterministic
    // under any partitioning/scheduling. Left rows all carry a null
    // payload, so their relative order within a tie cannot change
    // last(ignoreNulls).
    val w = Window
      .partitionBy(keyCols.map(col): _*)
      .orderBy(col("__t").asc, col("__tag").asc, col("__payload").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)

    unioned
      .withColumn("matched", last(col("__payload"), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select((leftCols.map(c => col("__left").getField(c).as(c)) :+ col("matched")): _*)
  }
}
