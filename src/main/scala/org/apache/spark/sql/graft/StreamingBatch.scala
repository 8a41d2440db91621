package org.apache.spark.sql.graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{DataFrame => ClassicDataFrame, SparkSession => ClassicSparkSession}

/** The one Spark-internal bridge the V1 streaming [[org.apache.spark.sql
  * .execution.streaming.Source]] API requires: `getBatch` must return a
  * DataFrame with `isStreaming = true` (MicroBatchExecution asserts it),
  * and the only way to tag one is `SparkSession.internalCreateDataFrame`
  * — which is `private[sql]`, hence this file's package. This is the
  * same pattern Spark's own `FileStreamSource` and every out-of-tree V1
  * source use; no other internals are touched. */
object StreamingBatch {

  /** Re-tag an already-planned batch `df` as a streaming micro-batch:
    * same rows, same schema, `isStreaming = true`. The underlying RDD is
    * lazy — each micro-batch (re)computes from the table snapshot its
    * offsets pin, so replay after recovery is deterministic. */
  def asStreaming(df: DataFrame): DataFrame = {
    val classic = df.asInstanceOf[ClassicDataFrame]
    val spark = classic.sparkSession.asInstanceOf[ClassicSparkSession]
    spark.internalCreateDataFrame(
      classic.queryExecution.toRdd, classic.schema, isStreaming = true)
  }
}
