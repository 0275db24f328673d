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
      val filtered = JoinOps.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey")
      // the probe must be the native codegen'd expression: a Scala UDF (or
      // worse, a Python eval) would put a serialization boundary on every
      // fact row — the exact cost this operator exists to avoid at 100 TB
      val plan = filtered.queryExecution.executedPlan.toString
      require(!plan.contains("ScalaUDF") && !plan.contains("BatchEvalPython"),
        s"bloom probe fell off the codegen path:\n$plan")
      require(plan.contains("might_contain"),
        s"expected the native bloom_might_contain probe in the plan:\n$plan")
      filtered
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

  /** q86: bucketed co-located join through the gate — both fact tables are
    * written `bucketBy(8, key)` + in-bucket sorted, so the equi-join plans
    * as a SortMergeJoin with ZERO shuffle exchange (asserted on the physical
    * plan): the bucketing shuffle is paid ONCE at write and amortized over
    * every later join on that key. At 100 TB this is the difference between
    * re-shuffling the fact table per query and never shuffling it again.
    * The result aggregate must match the plain-join oracle. */
  val q86BucketedJoin: Q = Q(
    "q86_bucketed_join",
    (spark, dir) => {
      import org.apache.spark.sql.functions._
      Tables.registerAll(spark, dir)
      // EXTERNAL bucketed tables at a fresh location: the in-memory catalog
      // dies with the session but the warehouse dir does not, so a managed
      // table here would collide with a previous JVM's leftovers
      val tmp = java.nio.file.Files.createTempDirectory("graft-bkt-").toString
      spark.sql("DROP TABLE IF EXISTS graft_b_orders")
      spark.sql("DROP TABLE IF EXISTS graft_b_lineitem")
      spark.table("orders").select("o_orderkey", "o_orderstatus")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .option("path", s"$tmp/orders").mode("overwrite").saveAsTable("graft_b_orders")
      spark.table("lineitem").select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .option("path", s"$tmp/lineitem").mode("overwrite").saveAsTable("graft_b_lineitem")
      // the merge hint forces the SortMergeJoin path (at gate scale the
      // optimizer would otherwise broadcast the small side and the bucketing
      // would go untested); with both sides bucketed on the key, the SMJ
      // plans with zero shuffle exchange — the 100 TB claim this gate proves
      val joined = spark.table("graft_b_lineitem").hint("merge").join(
        spark.table("graft_b_orders"), col("l_orderkey") === col("o_orderkey"))
      val joinPlan = joined.queryExecution.executedPlan.toString
      require(joinPlan.contains("SortMergeJoin"),
        s"expected the bucketed sort-merge path, got:\n$joinPlan")
      require(!joinPlan.contains("Exchange"),
        s"bucketed join must be shuffle-free, got:\n$joinPlan")
      joined.groupBy("o_orderstatus")
        .agg(count(lit(1)).as("n"), sum("l_quantity").as("sum_qty"),
          sum(col("l_extendedprice").cast("decimal(12,2)")).cast("double")
            .as("sum_price"))
    },
    Some(
      """SELECT o_orderstatus, count(*) AS n, sum(l_quantity) AS sum_qty,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY o_orderstatus""".stripMargin))

  val all: Seq[Q] = Seq(q72BloomSemiJoin, q73IntervalJoin, q86BucketedJoin)
}
