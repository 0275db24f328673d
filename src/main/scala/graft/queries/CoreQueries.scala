package graft.queries

import org.apache.spark.sql.functions._

/** Reference-surface queries (SURVEY.md §2.2-§2.8): projections, filters,
  * scalar functions, joins, aggregations, set ops, windows, sorts/limits.
  *
  * Most entries share one SQL text between the Spark run and the DuckDB oracle
  * — the engine's surface IS Spark SQL (the reference's transformation
  * language, `example/notebook/scd2-job.ipynb:141-145`), so shared text is the
  * honest formulation; Catalyst does the planning.
  */
object CoreQueries {

  // exact-2dp money columns → decimal-exact aggregation (see Q scaladoc)
  private val price = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val disc = "CAST((1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(4,2))"
  private val tax = "CAST((1 + CAST(l_tax AS DECIMAL(4,2))) AS DECIMAL(4,2))"

  /** TPC-H Q1-style pricing summary (reference-surface agg per SURVEY.md §2.5;
    * P1/P3/F4 expression coverage). Map-side partial agg + 6-group final: the
    * plan at any scale is scan → partial hash agg → tiny shuffle → final agg. */
  val q1PricingSummary: Q = Q.sharedSql("q1_pricing_summary",
    s"""SELECT l_returnflag, l_linestatus,
       |  sum(l_quantity) AS sum_qty,
       |  CAST(sum($price) AS DOUBLE) AS sum_base_price,
       |  CAST(sum($price * $disc) AS DOUBLE) AS sum_disc_price,
       |  CAST(sum($price * $disc * $tax) AS DOUBLE) AS sum_charge,
       |  count(*) AS count_order,
       |  sum(l_quantity) / count(*) AS avg_qty
       |FROM lineitem
       |GROUP BY l_returnflag, l_linestatus""".stripMargin)

  /** Scan + filter + projection (P1/P6/P8/P9): predicates push to the parquet
    * scan (PushedFilters), projection prunes the read schema. */
  val q2FilterProject: Q = Q.sharedSql("q2_filter_project",
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1995-06-01 00:00:00'
      |  AND l_discount BETWEEN 0.02 AND 0.08
      |  AND l_returnflag IN ('A', 'R')""".stripMargin)

  /** Inner equi-join + residual predicate + agg (J1/J2). */
  val q3JoinAgg: Q = Q.sharedSql("q3_join_agg",
    """SELECT c_mktsegment, count(*) AS n_orders,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE o_orderstatus <> 'F' AND c_acctbal > 0
      |GROUP BY c_mktsegment""".stripMargin)

  /** 5-table star join, revenue rollup by region/nation. DataFrame-API
    * formulation with explicit broadcast of the dimension chain — at 100 TB
    * the fact table never shuffles for the dims (broadcast-hash all the way);
    * only the lineitem⋈orders join is a real (equi, AQE-planned) shuffle. */
  val q4StarJoin: Q = Q(
    "q4_star_join",
    (spark, dir) => {
      val li = Tables.table(spark, dir, "lineitem")
      val o = Tables.table(spark, dir, "orders")
      val c = Tables.table(spark, dir, "customer")
      val n = Tables.table(spark, dir, "nation")
      val r = Tables.table(spark, dir, "region")
      li.join(o, li("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy(r("r_name"), n("n_name"))
        .agg(
          expr(s"CAST(sum($price * $disc) AS DOUBLE)").as("revenue"),
          count(lit(1)).as("n_rows"))
    },
    Some(s"""SELECT r_name, n_name,
            |  CAST(sum($price * $disc) AS DOUBLE) AS revenue,
            |  count(*) AS n_rows
            |FROM lineitem
            |JOIN orders ON l_orderkey = o_orderkey
            |JOIN customer ON o_custkey = c_custkey
            |JOIN nation ON c_nationkey = n_nationkey
            |JOIN region ON n_regionkey = r_regionkey
            |GROUP BY r_name, n_name""".stripMargin))

  /** UNION (distinct) across heterogeneous sources (U1 — the reference's bare
    * UNION at scd2-job.ipynb:316 is UNION DISTINCT). */
  val q5Union: Q = Q.sharedSql("q5_union",
    """SELECT c_nationkey AS nationkey, c_name AS name FROM customer WHERE c_acctbal > 9000
      |UNION
      |SELECT s_nationkey AS nationkey, s_name AS name FROM supplier""".stripMargin)

  /** EXCEPT/set-difference (set-op surface beyond the reference, §2.6). */
  val q5Except: Q = Q.sharedSql("q5_except",
    """SELECT c_custkey % 1000 AS key_bucket FROM customer
      |EXCEPT
      |SELECT s_suppkey % 1000 AS key_bucket FROM supplier""".stripMargin)

  /** Word count — the reference's one native-Spark job
    * (`example/native-spark-job-scheduler.yaml:4,12`): split → explode →
    * groupBy count. Pure map-side explode + hash agg; scales with input. */
  val q6WordCount: Q = Q.dualSql("q6_wordcount",
    sparkSql = """SELECT word, count(*) AS cnt
                 |FROM (SELECT explode(split(text, ' ')) AS word FROM documents) t
                 |WHERE word <> ''
                 |GROUP BY word""".stripMargin,
    duckSql = """SELECT word, count(*) AS cnt
                |FROM (SELECT unnest(string_split(text, ' ')) AS word FROM documents) t
                |WHERE word <> ''
                |GROUP BY word""".stripMargin)

  /** Window top-N per group (§2.8) — also the independent oracle formulation
    * for SCD2 "latest row per key". */
  val q7WindowTopN: Q = Q.sharedSql("q7_window_topn",
    """SELECT o_custkey, o_orderkey, o_totalprice, rn
      |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
      |        row_number() OVER (PARTITION BY o_custkey
      |                           ORDER BY o_totalprice DESC, o_orderkey) AS rn
      |      FROM orders) t
      |WHERE rn <= 3""".stripMargin)

  /** q90: time-series gap fill — daily event counts per type with missing
    * (type, day) buckets resampled to 0 over the observed span. The dense
    * day axis is GENERATED (sequence + explode over one min/max row), never
    * materialized from the fact table, and the fill is a left join against
    * the tiny dense axis — at 100 TB the cost stays the one groupBy of the
    * raw events; the axis side is broadcast-sized by construction. */
  val q90GapFill: Q = Q.dualSql("q90_gap_fill",
    sparkSql =
      """WITH d AS (SELECT event_type, CAST(date_trunc('DAY', ts) AS DATE) AS day,
        |             count(*) AS n
        |           FROM events GROUP BY event_type, date_trunc('DAY', ts)),
        |span AS (SELECT explode(sequence(mn, mx, INTERVAL 1 DAY)) AS day
        |         FROM (SELECT min(day) AS mn, max(day) AS mx FROM d)),
        |types AS (SELECT DISTINCT event_type FROM d)
        |SELECT t.event_type, s.day, COALESCE(d.n, 0) AS n
        |FROM span s CROSS JOIN types t
        |LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day""".stripMargin,
    duckSql =
      """WITH d AS (SELECT event_type, CAST(date_trunc('day', ts) AS DATE) AS day,
        |             count(*) AS n
        |           FROM events GROUP BY event_type, date_trunc('day', ts)),
        |span AS (SELECT CAST(unnest(generate_series(mn::TIMESTAMP, mx::TIMESTAMP,
        |                     INTERVAL '1 day')) AS DATE) AS day
        |         FROM (SELECT min(day) AS mn, max(day) AS mx FROM d)),
        |types AS (SELECT DISTINCT event_type FROM d)
        |SELECT t.event_type, s.day, COALESCE(d.n, 0) AS n
        |FROM span s CROSS JOIN types t
        |LEFT JOIN d ON d.event_type = t.event_type AND d.day = s.day""".stripMargin)

  /** q91: three-step conversion funnel (view → click → purchase, strictly
    * ordered per user via each step's FIRST qualifying timestamp) — the
    * product-analytics shape: three self-aggregations of the fact table,
    * each a hash join + min-agg on user_id; no window over the full event
    * stream, so the plan is shuffle-bounded by distinct users, not events. */
  val q91Funnel: Q = Q.sharedSql("q91_funnel",
    """WITH v AS (SELECT user_id, min(ts) AS t1 FROM events
      |           WHERE event_type = 'view' GROUP BY user_id),
      |c AS (SELECT e.user_id, min(e.ts) AS t2 FROM events e
      |      JOIN v ON v.user_id = e.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.t1 GROUP BY e.user_id),
      |p AS (SELECT e.user_id, min(e.ts) AS t3 FROM events e
      |      JOIN c ON c.user_id = e.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.t2 GROUP BY e.user_id)
      |SELECT (SELECT count(*) FROM v) AS n_viewed,
      |       (SELECT count(*) FROM c) AS n_clicked_after,
      |       (SELECT count(*) FROM p) AS n_purchased_after""".stripMargin)

  /** Distinct aggregation (COUNT(DISTINCT) expands to two-phase agg). */
  val q11AggDistinct: Q = Q.sharedSql("q11_agg_distinct",
    """SELECT o_orderpriority, count(DISTINCT o_custkey) AS n_cust, count(*) AS n
      |FROM orders GROUP BY o_orderpriority""".stripMargin)

  /** Tumbling-hour window aggregation over the events stream table (micro-batch
    * CDC shape, SURVEY.md §2.9; the same groupBy works under Structured
    * Streaming with a watermark — see graft.streaming). */
  val q12EventsWindow: Q = Q.dualSql("q12_events_window",
    sparkSql = """SELECT date_trunc('hour', ts) AS hour_start, event_type,
                 |  count(*) AS n,
                 |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
                 |FROM events GROUP BY date_trunc('hour', ts), event_type""".stripMargin,
    duckSql = """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start, event_type,
                |  count(*) AS n,
                |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
                |FROM events GROUP BY 1, 2""".stripMargin)

  /** JSON extraction from a string props column (extension surface exercised by
    * the testdata's `events.props`, FIXTURES.md). */
  val q13EventsJson: Q = Q.dualSql("q13_events_json",
    sparkSql = """SELECT event_id, CAST(get_json_object(props, '$.k') AS BIGINT) AS k
                 |FROM events""".stripMargin,
    duckSql = """SELECT event_id, CAST(regexp_extract(props, '"k": (-?[0-9]+)', 1) AS BIGINT) AS k
                |FROM events""".stripMargin)

  /** Left-semi join (EXISTS). */
  val q14Semi: Q = Q.sharedSql("q14_semi",
    """SELECT c_mktsegment, count(*) AS n
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
      |GROUP BY c_mktsegment""".stripMargin)

  /** Left-anti join (NOT EXISTS): parts never ordered, by brand. */
  val q15Anti: Q = Q.sharedSql("q15_anti",
    """SELECT p_brand, count(*) AS n
      |FROM part
      |WHERE NOT EXISTS (SELECT 1 FROM lineitem
      |                  WHERE l_partkey = p_partkey AND l_quantity >= 49)
      |GROUP BY p_brand""".stripMargin)

  /** ROLLUP grouping sets. */
  val q16Rollup: Q = Q.sharedSql("q16_rollup",
    """SELECT r_name, n_name, count(*) AS n
      |FROM nation JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP(r_name, n_name)""".stripMargin)

  /** Global sort + limit (top-k — Spark plans TakeOrderedAndProject, no full
    * sort shuffle). Deterministic via the orderkey tiebreaker. */
  val q17SortLimit: Q = Q.sharedSql("q17_sort_limit",
    """SELECT o_orderkey, o_totalprice FROM orders
      |ORDER BY o_totalprice DESC, o_orderkey LIMIT 10""".stripMargin)

  /** Sessionization by inactivity gap (30 min) via LAG — batch formulation of
    * the session-window operator. */
  val q18Sessions: Q = {
    def sql(us: String) =
      s"""SELECT user_id, count(*) AS n_sessions
         |FROM (
         |  SELECT user_id,
         |    CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END AS is_start
         |  FROM (
         |    SELECT user_id, $us AS us,
         |      lag($us) OVER (PARTITION BY user_id ORDER BY $us, event_id) AS prev_us
         |    FROM events) t1) t2
         |WHERE is_start = 1
         |GROUP BY user_id""".stripMargin
    Q.dualSql("q18_sessions", sql("unix_micros(ts)"), sql("epoch_us(ts::TIMESTAMP)"))
  }

  /** q94: Spark's NATIVE session_window operator (batch face of the
    * streaming session aggregation): one groupBy plans a SessionWindow
    * aggregate — no self-join, no window-function pass; Spark merges
    * per-key sorted runs in one shuffle. Semantics differ from the q18
    * lag-formulation at the boundary: session_window starts a NEW session
    * when the inter-event gap is >= the 30-minute gap (merge condition is
    * strict <), and session_end is last event + gap — the oracle mirrors
    * both exactly. */
  val q94SessionWindow: Q = Q(
    "q94_session_window",
    (spark, dir) => {
      import org.apache.spark.sql.functions.{col, count, lit, session_window}
      Tables.table(spark, dir, "events")
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n_events"))
        .select(col("user_id"),
          col("session_window.start").as("session_start"),
          col("session_window.end").as("session_end"),
          col("n_events"))
    },
    Some(
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN prev IS NULL
        |           OR epoch_us(ts::TIMESTAMP) - epoch_us(prev::TIMESTAMP) >= 1800000000
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM (SELECT user_id, ts,
        |          lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev
        |        FROM events) t),
        |s AS (SELECT user_id, ts,
        |        sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
        |                            ROWS UNBOUNDED PRECEDING) AS sid
        |      FROM g)
        |SELECT user_id, min(ts) AS session_start,
        |  max(ts) + INTERVAL 30 MINUTE AS session_end, count(*) AS n_events
        |FROM s GROUP BY user_id, sid""".stripMargin))

  /** Running total per key (window frame aggregation). */
  val q19Running: Q = Q.sharedSql("q19_running_total",
    """SELECT o_custkey, o_orderkey,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2)))
      |       OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE) AS running
      |FROM orders""".stripMargin)

  /** TPC-H Q3-shaped shipping-priority query: segment filter on the customer
    * dim (broadcast), date range on both fact-side tables (pushed to scans),
    * revenue top-10 (TakeOrderedAndProject). */
  val q22ShippingPriority: Q = Q.sharedSql("q22_shipping_priority",
    s"""SELECT o_orderkey, o_orderdate,
       |  CAST(sum($price * $disc) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |WHERE c_mktsegment = 'BUILDING'
       |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
       |  AND l_shipdate > TIMESTAMP '1998-01-01 00:00:00'
       |GROUP BY o_orderkey, o_orderdate
       |ORDER BY revenue DESC, o_orderkey
       |LIMIT 10""".stripMargin)

  /** TPC-H Q5-shaped local-supplier revenue: 6-way join with the
    * customer-nation = supplier-nation co-location predicate. */
  val q23LocalSupplier: Q = Q.sharedSql("q23_local_supplier",
    s"""SELECT n_name,
       |  CAST(sum($price * $disc) AS DOUBLE) AS revenue,
       |  count(*) AS n_rows
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
       |JOIN nation ON s_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |WHERE r_name IN ('ASIA', 'EUROPE')
       |GROUP BY n_name""".stripMargin)

  /** Date/time function surface: extraction, truncation, conditional agg. */
  val q24DateFunctions: Q = Q.sharedSql("q24_date_functions",
    """SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS INT) AS yr,
      |  date_trunc('month', o_orderdate) AS month_start,
      |  count(*) AS n,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |                THEN CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE) AS urgent_rev
      |FROM orders
      |GROUP BY 1, 2""".stripMargin)

  /** Statistical aggregates: interpolated median (identical definition both
    * engines) + deterministic mode via ranked counts (tiebreak by value, so
    * the result is engine-independent even on count ties). */
  val q25Median: Q = Q.sharedSql("q25_median_mode",
    """SELECT t.o_orderpriority, t.med, m.mode_status
      |FROM (SELECT o_orderpriority, median(o_totalprice) AS med
      |      FROM orders GROUP BY o_orderpriority) t
      |JOIN (SELECT o_orderpriority, o_orderstatus AS mode_status FROM (
      |        SELECT o_orderpriority, o_orderstatus,
      |          row_number() OVER (PARTITION BY o_orderpriority
      |                             ORDER BY count(*) DESC, o_orderstatus) AS rk
      |        FROM orders GROUP BY o_orderpriority, o_orderstatus) x
      |      WHERE rk = 1) m
      |ON t.o_orderpriority = m.o_orderpriority""".stripMargin)

  val all: Seq[Q] = Seq(
    q1PricingSummary, q2FilterProject, q3JoinAgg, q4StarJoin, q5Union, q5Except,
    q6WordCount, q7WindowTopN, q11AggDistinct, q12EventsWindow, q13EventsJson,
    q14Semi, q15Anti, q16Rollup, q17SortLimit, q18Sessions, q19Running,
    q22ShippingPriority, q23LocalSupplier, q24DateFunctions, q25Median,
    q90GapFill, q91Funnel, q94SessionWindow)
}
