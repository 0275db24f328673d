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

  /** An identical twin of `spark` (same SparkContext and shared state, a
    * COPY of the session conf/state) — `SparkSession.cloneSession()` is
    * `private[sql]`, hence surfaced from this shim. Used to give by-field-id
    * parquet scans a session with the read flag on WITHOUT mutating the
    * user's session (the flag is only honored from the session conf, not
    * per-relation options — verified against Spark 4.1's read path). */
  def cloneSession(spark: SparkSession): SparkSession =
    spark.asInstanceOf[org.apache.spark.sql.classic.SparkSession].cloneSession()

  /** Column ⇄ catalyst-Expression bridge (`ExpressionUtils` is
    * `private[sql]`): lets the library wrap its native codegen
    * expressions as Columns without round-tripping through SQL text or
    * requiring function registration on the session. */
  def column(e: org.apache.spark.sql.catalyst.expressions.Expression): org.apache.spark.sql.Column =
    org.apache.spark.sql.classic.ExpressionUtils.column(e)
  def expression(c: org.apache.spark.sql.Column): org.apache.spark.sql.catalyst.expressions.Expression =
    org.apache.spark.sql.classic.ExpressionUtils.expression(c)
}
