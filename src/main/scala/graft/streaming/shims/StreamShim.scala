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

  /** The inverse bridge a V1 streaming `Sink` needs: the frame handed to
    * `Sink.addBatch` carries the micro-batch's `IncrementalExecution`, and
    * calling writer actions on it directly would RE-PLAN the batch as a new
    * query (wrong for stateful operators, which advance their stores per
    * execution). Wrapping the already-planned `toRdd` in a fresh batch frame
    * executes the incremental plan exactly once, inside the sink's own write
    * job — the same move Delta's `DeltaSink.addBatch` makes before handing
    * the data to its transaction log. */
  def asBatchFrame(spark: SparkSession, df: DataFrame): DataFrame = {
    val classic = spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession]
    classic.internalCreateDataFrame(
      df.queryExecution.toRdd, df.schema, isStreaming = false)
  }
}
