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

  test("AQE splits a skewed join partition at runtime (skew=true)") {
    // manual salting (previous test) is the fallback; AQE's skew join is the
    // first line of defense at scale — prove it actually engages: a hot key
    // carrying half the fact table must be split into subpartitions by the
    // runtime re-plan, with row counts unaffected.
    val confs = Map(
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "65536",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "32768",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2.0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false")
    val prior = confs.keys.map(k => k -> spark.conf.getOption(k)).toMap
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import org.apache.spark.sql.functions._
      val facts = spark.range(0, 400000)
        .select(when($"id" % 2 === 0, lit(0L)).otherwise($"id").as("k"), $"id".as("v"))
      val dim = spark.range(0, 1000).select($"id".as("k"), ($"id" * 2).as("w"))
      val joined = facts.join(dim, "k")
      val n = joined.count()
      assert(n === 200000L + 500L) // even ids -> k=0; odd ids < 1000 match k=id
      joined.collect() // finalize joined's own adaptive plan
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"expected AQE to mark the skewed join split:\n$plan")
    } finally prior.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("bloom semi join is row-identical to the exact semi join") {
    val orders = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "orders")
    val dim = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "customer")
      .filter($"c_mktsegment" === "BUILDING")
    val exact = orders.join(dim, orders("o_custkey") === dim("c_custkey"), "left_semi")
    val bloomed = JoinOps.bloomSemiJoin(orders, dim, "o_custkey", "c_custkey")
    assert(bloomed.count() === exact.count())
    assert(bloomed.exceptAll(exact).count() === 0)
    assert(exact.exceptAll(bloomed).count() === 0)
  }

  test("d16 plan is window-free: partial aggregate absorbs hot-gram skew") {
    // the occurrence accounting must be a map-side-combinable groupBy, not
    // `row_number()/count(*) OVER (PARTITION BY gram)` — a window shuffles
    // and SORTS the full gram stream into one task per gram, so a corpus-hot
    // gram is a straggler; the partial aggregate contributes one row per
    // (task, gram) instead
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val qe = spark.sql(graft.queries.DedupQueries.d16SparkSql).queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Window"), s"d16 regressed to a window plan:\n$plan")
    assert(plan.contains("partial_min") || plan.contains("partial_count"),
      s"expected a partial (map-side) aggregate over gram:\n$plan")
  }

  test("d16 hot gram: one 8-gram duplicated across 10k docs completes skew-free") {
    // the adversarial shape the window plan would straggle on: every doc is
    // the SAME 8 tokens, so a single gram carries the whole corpus. First
    // corpus occurrence (doc 0) keeps its text; every other doc excises fully.
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val docs = spark.range(0, 10000)
      .selectExpr("id AS doc_id", "'t0 t1 t2 t3 t4 t5 t6 t7' AS text")
    docs.createOrReplaceTempView("documents")
    try {
      val out = spark.sql(graft.queries.DedupQueries.d16SparkSql).collect()
      assert(out.length === 10000)
      val byId = out.map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getString(3)))).toMap
      assert(byId(0L) === ((8L, 0L, "t0 t1 t2 t3 t4 t5 t6 t7")))
      assert(byId(1L) === ((0L, 8L, "")))
      assert(out.count(r => r.getLong(2) == 8L) === 9999)
    } finally graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
  }

  test("m7 perceptual near-dup plans as a banded equi-join — never a cross product") {
    // the pair search must be the 4×16-bit band self-join (hash/sort-merge
    // on (b, k)); a cross/nested-loop product would be the O(n²) shape
    // banding exists to avoid
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val qe = graft.queries.MultimodalQueries.m7PerceptualNearDup
      .run(spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"m7 pair search regressed to a product plan:\n$plan")
    assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin") ||
      plan.contains("BroadcastHashJoin"),
      s"expected an equi-join over the band keys:\n$plan")
  }

  test("t24 bpe encode is one shuffle-free codegen projection over the scan") {
    // the corpus-scale half of t24 (the 100 TB part) must be ONE map pass:
    // a codegen'd Project carrying bpe_encode directly over the documents
    // scan — no Exchange, no join, no second scan of the corpus. (The
    // working-set aggregation is a separate bounded pre-pass by design.)
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val qe = graft.queries.TextQueries.t24BpeEncodeNative
      .run(spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"t24 encode must be shuffle-free:\n$plan")
    assert(plan.contains("bpe_encode"), s"native expression missing:\n$plan")
    assert(plan.contains("*(1)"), s"encode projection not codegen'd:\n$plan")
    // exactly one scan feeds the projection
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan") && l.contains("parquet"))
    assert(scans === 1, s"expected one corpus scan, found $scans:\n$plan")
  }

  test("manifest statistics drive broadcast joins on both catalog faces") {
    // A graft relation's logical stats default to Long.MaxValue (the DSv2
    // V1ScanWrapper drops SupportsReportStatistics), so without the manifest
    // estimates a dimension table can never auto-broadcast. The probe side
    // here is a 3M-row range (~24 MB > the 10 MB threshold), so a
    // BroadcastHashJoin can ONLY appear if the graft side's estimate landed
    // (GraftJoinStatsRule's hint on the DSv2 face; TableRelation.sizeInBytes
    // on the V1 face).
    val dim = s"graft.default.stats_dim_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $dim (id BIGINT, label STRING)")
    spark.sql(s"INSERT INTO $dim SELECT id, concat('l', id) FROM range(50)")
    val fact = spark.range(3000000L).toDF("id")
    // DSv2 face: the manifest estimate arrives as a BROADCAST join hint
    val v2 = fact.join(spark.table(dim), "id")
    assert(v2.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"DSv2 dim join must broadcast:\n${v2.queryExecution.executedPlan}")
    val hinted = v2.queryExecution.optimizedPlan.collect {
      case j: org.apache.spark.sql.catalyst.plans.logical.Join => j.hint
    }
    assert(hinted.exists(h => h.leftHint.orElse(h.rightHint)
        .exists(_.strategy.contains(org.apache.spark.sql.catalyst.plans.logical.BROADCAST))),
      s"expected a manifest-stats BROADCAST hint, got $hinted")
    // V1 face (graft-table relation)
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val root = s"$wh/default/${dim.split('.').last}"
    val v1df = spark.read.format("graft-table").load(root)
    val v1 = fact.join(v1df, "id")
    assert(v1.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"V1 dim join must broadcast:\n${v1.queryExecution.executedPlan}")
    spark.sql(s"DROP TABLE $dim")
  }

  test("an AGGREGATED graft dim side still broadcasts (row bound walks through)") {
    // Aggregate output rows ≤ input rows, priced at the aggregate's own
    // width — the GROUP-BY-then-join dim shape must hint like the raw dim
    val dim = s"graft.default.stats_agg_dim_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $dim (id BIGINT, label STRING)")
    spark.sql(s"INSERT INTO $dim SELECT id % 40, concat('l', id % 7) FROM range(400)")
    val fact = spark.range(3000000L).toDF("id")
    val agg = spark.table(dim).groupBy("id")
      .agg(org.apache.spark.sql.functions.countDistinct("label").as("n_labels"))
    val joined = fact.join(agg, "id")
    assert(joined.queryExecution.executedPlan.toString.contains("BroadcastHashJoin"),
      s"aggregated dim join must broadcast:\n${joined.queryExecution.executedPlan}")
    spark.sql(s"DROP TABLE $dim")
  }

  test("estimateLiveRows refines by pushed bounds over per-commit files") {
    val root = tmpDir("stats-est-")
    val vt = graft.table.VersionedTable(root)
    vt.commit(spark.range(0L, 100L).toDF("id"))
    vt.append(spark.range(1000L, 1050L).toDF("id"))
    val v = vt.resolve()
    assert(vt.estimateLiveRows(v) === Some(150L))
    // a bound past the first commit's max skips its files entirely
    assert(vt.estimateLiveRows(v,
      bounds = Seq(("id", Some("1000"), None))) === Some(50L))
    assert(vt.estimateLiveRows(v,
      bounds = Seq(("id", Some("5000"), None))) === Some(0L))
  }

  test("t25 byte-level bpe encode is one shuffle-free codegen projection") {
    // same bar as t24 for the byte-level sibling: the corpus-scale encode is
    // a single codegen'd Project over one documents scan — the byte remap
    // and the greedy loop both live inside the expression
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val qe = graft.queries.TextQueries.t25BpeEncodeBytes
      .run(spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert(!plan.contains("Exchange"),
      s"t25 encode must be shuffle-free:\n$plan")
    assert(plan.contains("bpe_encode_bytes"), s"native expression missing:\n$plan")
    assert(plan.contains("*(1)"), s"encode projection not codegen'd:\n$plan")
    val scans = plan.linesIterator.count(l =>
      l.contains("Scan") && l.contains("parquet"))
    assert(scans === 1, s"expected one corpus scan, found $scans:\n$plan")
  }

  test("t26 token pack is one encode projection feeding one window shuffle") {
    // the tokenizer must add ZERO passes to the packing job: the encode +
    // size ride the scan's projection, and the only exchange is the pack
    // window's per-source repartition
    graft.queries.Tables.registerAll(spark, "/root/testdata/sf0.001")
    val qe = graft.queries.TextQueries.t26TokenPack
      .run(spark, "/root/testdata/sf0.001").queryExecution
    val plan = qe.executedPlan.toString
    assert(plan.contains("bpe_encode"), s"native expression missing:\n$plan")
    val exchanges = plan.linesIterator.count(_.contains("Exchange"))
    assert(exchanges === 1, s"expected exactly the window exchange, found $exchanges:\n$plan")
    val scans = plan.linesIterator.count(l => l.contains("Scan") && l.contains("parquet"))
    assert(scans === 1, s"expected one corpus scan, found $scans:\n$plan")
  }

  test("interval join matches the naive theta join, including window edges") {
    import java.sql.Timestamp
    def t(ms: Long) = new Timestamp(ms)
    // right rows sit exactly ON both window edges (inclusive), just outside
    // both edges, in a different key, and mid-window
    val left = Seq((1L, t(100000L), "p1"), (2L, t(100000L), "p2"))
      .toDF("k", "lts", "ltag")
    val right = Seq(
      (1L, t(100000L - 30000L), "on-lo"), (1L, t(100000L + 10000L), "on-hi"),
      (1L, t(100000L - 30001L), "lo-1"), (1L, t(100000L + 10001L), "hi+1"),
      (1L, t(100000L), "mid"), (3L, t(100000L), "other-key"))
      .toDF("k", "rts", "rtag")
    val got = JoinOps.intervalJoin(left, right, "k", "lts", "rts",
      beforeSec = 30L, afterSec = 10L)
    val naive = left.join(right, Seq("k"))
      .filter($"rts" >= expr("lts - INTERVAL 30 SECOND") &&
              $"rts" <= expr("lts + INTERVAL 10 SECOND"))
    assert(got.select("k", "ltag", "rtag").exceptAll(
      naive.select("k", "ltag", "rtag")).count() === 0)
    assert(naive.select("k", "ltag", "rtag").exceptAll(
      got.select("k", "ltag", "rtag")).count() === 0)
    assert(got.count() === 3) // p1 × {on-lo, on-hi, mid}
  }
}
