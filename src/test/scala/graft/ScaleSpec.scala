package graft

import graft.etl.{FileLoad, JobSpec, SQLTransform}
import graft.functions.JoinOps
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics evidence: partition pruning on partitioned sinks, salted
  * joins matching plain joins, and bucketed co-located joins planning without
  * a shuffle — the three levers the 100 TB design leans on. */
class ScaleSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("FileLoad partitionBy enables partition pruning on read") {
    val loc = tmpDir("part-")
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    JobSpec(Seq(
      SQLTransform("sel", "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders", "o_sel"),
      FileLoad("load", "o_sel", s"$loc/orders_part", partitionBy = Seq("o_orderpriority"))))
      .run(spark, Map.empty)
    val back = spark.read.parquet(s"$loc/orders_part")
      .filter($"o_orderpriority" === "1-URGENT")
    // the predicate must land in the PARTITION filter list (directory
    // pruning) — if partitionBy were dropped, the literal would move to the
    // PushedFilters/DataFilters lines and this line-scoped assert would fail
    val plan = back.queryExecution.executedPlan.toString
    val pf = plan.linesIterator.find(_.contains("PartitionFilters")).getOrElse("")
    assert(pf.contains("1-URGENT"), s"predicate not a partition filter:\n$plan")
    val expected = spark.read.parquet(s"$loc/orders_part")
      .collect().count(_.getAs[String]("o_orderpriority") == "1-URGENT")
    assert(back.count() === expected)
  }

  test("salted join is row-identical to the plain join") {
    val orders = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val customer = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .select($"c_custkey".as("o_custkey"), $"c_mktsegment")
    val plain = orders.join(customer, "o_custkey")
    val salted = JoinOps.saltedInnerJoin(orders, customer, "o_custkey", salts = 8)
    assert(salted.count() === plain.count())
    assert(salted.exceptAll(plain).count() === 0)
    assert(plain.exceptAll(salted).count() === 0)
  }

  test("bucketed tables join without a shuffle exchange") {
    spark.sql("DROP TABLE IF EXISTS b_orders")
    spark.sql("DROP TABLE IF EXISTS b_lineitem")
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_totalprice")
      .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .mode("overwrite").saveAsTable("b_orders")
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "lineitem")
      .select("l_orderkey", "l_quantity")
      .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .mode("overwrite").saveAsTable("b_lineitem")
    val joined = spark.table("b_lineitem").join(
      spark.table("b_orders"), $"l_orderkey" === $"o_orderkey")
    // both sides pre-bucketed on the join key → SortMergeJoin with zero
    // ShuffleExchange (the co-location carries the partitioning)
    val plan = joined.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange hashpartitioning"),
      s"expected shuffle-free bucketed join, got:\n$plan")
    assert(joined.count() ===
      graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "lineitem").count())
  }
}
