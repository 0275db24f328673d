package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The one Spark-internal bridge a V1 streaming `Source` needs: micro-batch
  * planning asserts every `getBatch` result has `isStreaming=true`, and the
  * only constructor for such a frame (`internalCreateDataFrame`) is
  * `private[sql]` — so this shim lives under `org.apache.spark.sql`, exactly
  * as Delta Lake's streaming source does it (`org.apache.spark.sql.delta.
  * sources.DeltaSource#getBatch` → `deltaLog.createDataFrame(...,
  * isStreaming = true)`). Everything else in graft uses public API only. */
object StreamShim {
  /** Re-brand a batch frame as a streaming micro-batch: same schema, same
    * physical plan (`toRdd` is the frame's own compiled pipeline — lazy,
    * distributed, nothing is collected here). */
  def asStreamingFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = true)
  }
}
