package org.apache.spark.sql.graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** The one Spark-internal bridge the SQL row-level command path needs:
  * turning the ALREADY-ANALYZED source plan of a `MERGE INTO ... USING ...`
  * statement back into a DataFrame for the merge kernel. `Dataset.ofRows` is
  * `private[sql]`, so this shim lives under `org.apache.spark.sql` — the
  * same move Delta Lake's command layer makes (`org.apache.spark.sql.delta.
  * commands.MergeIntoCommand` building Datasets from analyzed plans).
  * Everything else in graft.catalog uses public connector API only. */
object PlanShim {
  def ofRows(spark: SparkSession, plan: LogicalPlan): DataFrame =
    org.apache.spark.sql.classic.Dataset.ofRows(
      spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession], plan)
}
