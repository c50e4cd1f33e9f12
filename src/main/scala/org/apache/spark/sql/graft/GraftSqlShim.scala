package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.types.StructType

/** The one `private[sql]` hook a DSv1 streaming Source needs:
  * `MicroBatchExecution` asserts that the DataFrame a Source's
  * `getBatch` returns carries `isStreaming = true`, and the only
  * constructor for such a frame is
  * `SparkSession.internalCreateDataFrame(rdd, schema, isStreaming)`.
  * Third-party DSv1 sources conventionally reach it from a shim
  * object inside the `org.apache.spark.sql` package tree (the same
  * pattern the Kafka connector used before DSv2); this object is that
  * shim and nothing else — no other internal API is touched.
  */
object GraftSqlShim {

  def internalCreateStreamingDataFrame(
      spark: SparkSession,
      rdd: RDD[InternalRow],
      schema: StructType): DataFrame =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
      .internalCreateDataFrame(rdd, schema, isStreaming = true)

  /** An already-ANALYZED logical plan as a DataFrame — what the SQL
    * DML rules hand the library verbs as the MERGE source side
    * (`Dataset.ofRows`, the same `private[sql]` constructor every
    * RunnableCommand in Spark itself uses).
    */
  def ofRows(
      spark: SparkSession,
      plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
