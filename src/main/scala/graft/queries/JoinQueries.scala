package graft.queries

import graft.functions.JoinOps
import org.apache.spark.sql.functions._

/** Scale-path join operators through the correctness gate: each query runs
  * the [[graft.functions.JoinOps]] rewrite (Bloom-prefiltered semi join,
  * bucket-equi-ized interval join) and is checked exactly against the naive
  * formulation in DuckDB — the rewrites must be row-identical, just cheaper
  * at scale. */
object JoinQueries {

  /** q72: Bloom-prefiltered semi join — orders restricted to customers in
    * one market segment. The Spark side prefilters the fact scan with a
    * broadcast Bloom filter of the dim keys (shuffle shrinks to ~matches,
    * the runtime-filter pattern made explicit), then removes false positives
    * with the exact semi join; the oracle is the plain IN-subquery. */
  val q72BloomSemiJoin: Q = Q(
    "q72_bloom_semi_join",
    (spark, dir) => {
      val orders = Tables.table(spark, dir, "orders")
      val dim = Tables.table(spark, dir, "customer")
        .filter(col("c_mktsegment") === "AUTOMOBILE")
      JoinOps.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey")
        .agg(count(lit(1)).as("n"),
          expr("CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)").as("total"))
    },
    Some(
      """SELECT count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
        |FROM orders
        |WHERE o_custkey IN
        |  (SELECT c_custkey FROM customer WHERE c_mktsegment = 'AUTOMOBILE')""".stripMargin))

  /** q73: batch interval join — for every purchase, how many views by the
    * same user landed in the preceding 30 minutes. The Spark side runs the
    * bucket-equi-ized rewrite ([[JoinOps.intervalJoin]]: hash join on
    * (user, time-bucket) + residual range, cost O(matches)); the oracle is
    * the naive theta join, which DuckDB can afford at oracle scale. */
  val q73IntervalJoin: Q = Q(
    "q73_interval_join",
    (spark, dir) => {
      val ev = Tables.table(spark, dir, "events")
      val purchases = ev.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      val views = ev.filter(col("event_type") === "view")
        .select(col("user_id"), col("ts").as("v_ts"))
      val joined = JoinOps.intervalJoin(
        purchases.withColumnRenamed("ts", "p_ts"), views,
        "user_id", "p_ts", "v_ts", beforeSec = 1800L, afterSec = 0L)
      val counts = joined.groupBy("event_id").agg(count(lit(1)).as("n_views"))
      purchases.join(counts, Seq("event_id"), "left")
        .select(col("event_id"), col("user_id"), col("ts").as("purchase_ts"),
          coalesce(col("n_views"), lit(0L)).as("n_views"))
    },
    Some(
      """SELECT b.event_id, b.user_id, b.ts::TIMESTAMP AS purchase_ts,
        |  count(v.ts) AS n_views
        |FROM events b LEFT JOIN events v
        |  ON b.user_id = v.user_id AND v.event_type = 'view'
        | AND v.ts::TIMESTAMP >= b.ts::TIMESTAMP - INTERVAL 30 MINUTE
        | AND v.ts::TIMESTAMP <= b.ts::TIMESTAMP
        |WHERE b.event_type = 'purchase'
        |GROUP BY b.event_id, b.user_id, b.ts::TIMESTAMP""".stripMargin))

  val all: Seq[Q] = Seq(q72BloomSemiJoin, q73IntervalJoin)
}
