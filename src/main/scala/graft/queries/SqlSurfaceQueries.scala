package graft.queries

import org.apache.spark.sql.functions._

/** Additional ANSI-SQL surface breadth (all free through Catalyst; each row
  * here is one more "a reference user could run this" guarantee). */
object SqlSurfaceQueries {

  /** q28: outer-join family — LEFT (preserving unmatched parts) and the null
    * handling that comes with it. */
  val q28OuterJoin: Q = Q.sharedSql("q28_outer_join",
    """SELECT p_brand,
      |  count(*) AS n_rows,
      |  count(l_orderkey) AS n_matched,
      |  CAST(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_unmatched
      |FROM part
      |LEFT JOIN lineitem ON l_partkey = p_partkey AND l_quantity >= 49
      |GROUP BY p_brand""".stripMargin)

  /** q28b: FULL OUTER join with COALESCE key folding. */
  val q28bFullOuter: Q = Q.sharedSql("q28b_full_outer",
    """SELECT COALESCE(c.k, s.k) AS nationkey,
      |  COALESCE(c.n, 0) AS n_customers,
      |  COALESCE(s.n, 0) AS n_suppliers
      |FROM (SELECT c_nationkey AS k, count(*) AS n FROM customer
      |      WHERE c_acctbal > 9900 GROUP BY c_nationkey) c
      |FULL OUTER JOIN (SELECT s_nationkey AS k, count(*) AS n FROM supplier
      |                 GROUP BY s_nationkey) s
      |ON c.k = s.k""".stripMargin)

  /** q29: string function surface — case, trim/pad, substring, replace,
    * position, LIKE. */
  val q29StringFunctions: Q = Q.sharedSql("q29_string_functions",
    """SELECT c_custkey,
      |  upper(c_mktsegment) AS seg_upper,
      |  lower(c_name) AS name_lower,
      |  substr(c_name, 10, 8) AS name_mid,
      |  replace(c_name, 'Customer', 'Cust') AS name_repl,
      |  length(trim(c_name)) AS name_len,
      |  lpad(CAST(c_nationkey AS STRING), 4, '0') AS nation_padded,
      |  CASE WHEN c_name LIKE '%00001%' THEN 1 ELSE 0 END AS has_00001
      |FROM customer
      |WHERE c_custkey <= 500""".stripMargin)

  /** q30: pivot — Spark's DataFrame pivot on one side, conditional
    * aggregation (the portable formulation) as the oracle. */
  val q30Pivot: Q = Q(
    "q30_pivot",
    (spark, dir) => {
      Tables.table(spark, dir, "orders")
        .groupBy(col("o_orderpriority"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(
          col("o_orderpriority"),
          coalesce(col("F"), lit(0L)).as("n_f"),
          coalesce(col("O"), lit(0L)).as("n_o"),
          coalesce(col("P"), lit(0L)).as("n_p"))
    },
    Some(
      """SELECT o_orderpriority,
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS n_f,
        |  CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS n_o,
        |  CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS n_p
        |FROM orders GROUP BY o_orderpriority""".stripMargin))

  /** q31: custom typed aggregate (graft.functions.GeometricMean, an
    * Aggregator[Double,(Double,Long),Double]) vs the closed-form oracle
    * exp(avg(ln x)) — rounded because libm/fold-order differ in final ulps. */
  val q31CustomAgg: Q = Q(
    "q31_custom_agg",
    (spark, dir) => {
      val geoMean = udaf(graft.functions.GeometricMean)
      Tables.table(spark, dir, "orders")
        .filter(col("o_totalprice") > 0) // mirror the oracle: geo-mean over positives
        .groupBy(col("o_orderpriority"))
        .agg(round(geoMean(col("o_totalprice")), 4).as("geo_mean_price"),
          count(lit(1)).as("n"))
    },
    Some(
      """SELECT o_orderpriority,
        |  round(exp(avg(ln(o_totalprice))), 4) AS geo_mean_price,
        |  count(*) AS n
        |FROM orders WHERE o_totalprice > 0
        |GROUP BY o_orderpriority""".stripMargin))

  /** q32: CUBE grouping sets (completes q16's ROLLUP). */
  val q32Cube: Q = Q.sharedSql("q32_cube",
    """SELECT o_orderstatus, o_orderpriority, count(*) AS n
      |FROM orders
      |GROUP BY CUBE(o_orderstatus, o_orderpriority)""".stripMargin)

  /** q33: INTERSECT (completes the set-op family). */
  val q33Intersect: Q = Q.sharedSql("q33_intersect",
    """SELECT c_nationkey AS nationkey FROM customer
      |INTERSECT
      |SELECT s_nationkey AS nationkey FROM supplier""".stripMargin)

  /** q34: correlated scalar subquery (decorrelated by Catalyst into a join —
    * the plan to check at scale is an aggregated left join, not N+1 scans). */
  val q34CorrelatedScalar: Q = Q.sharedSql("q34_correlated_scalar",
    """SELECT c_custkey, c_mktsegment,
      |  (SELECT count(*) FROM orders WHERE o_custkey = c_custkey) AS n_orders,
      |  (SELECT CAST(max(o_totalprice) AS DOUBLE) FROM orders
      |   WHERE o_custkey = c_custkey) AS max_price
      |FROM customer
      |WHERE c_custkey <= 300""".stripMargin)

  /** q35: IN / NOT IN subqueries (semi/anti join decorrelation). */
  val q35InSubquery: Q = Q.sharedSql("q35_in_subquery",
    """SELECT o_orderpriority, count(*) AS n
      |FROM orders
      |WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_acctbal > 9000)
      |  AND o_orderkey NOT IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 50)
      |GROUP BY o_orderpriority""".stripMargin)

  /** q36: ordered array aggregation — collect per-group sorted arrays. The
    * array is built with collect_list/sort_array (list(ORDER BY) in DuckDB)
    * and then serialized to a joined string for the gate: the driver's
    * pandas-based compare sorts rows lexicographically and cannot hash raw
    * list cells, so the deterministic string projection IS the array check
    * (same elements, same order ⇒ same string). */
  val q36ArrayAgg: Q = Q.dualSql("q36_array_agg",
    sparkSql =
      """SELECT n_nationkey,
        |  array_join(sort_array(collect_list(s_name)), '|') AS suppliers,
        |  CAST(size(collect_list(s_name)) AS BIGINT) AS n
        |FROM nation JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey""".stripMargin,
    duckSql =
      """SELECT n_nationkey,
        |  list_aggregate(list(s_name ORDER BY s_name), 'string_agg', '|') AS suppliers,
        |  CAST(count(*) AS BIGINT) AS n
        |FROM nation JOIN supplier ON s_nationkey = n_nationkey
        |GROUP BY n_nationkey""".stripMargin)

  /** q37: as-of (validity-interval) join — each event matched to the
    * dimension version valid at its timestamp: the SCD2 read path. Catalyst
    * plans the user_id equality as the join key with the range predicate as
    * a residual, so the physical plan is a plain equi-join (broadcast/SMJ),
    * not a nested loop — the shape that survives 100 TB. Dimension history
    * is derived deterministically: version 1 until 2024-01-15, version 2
    * after, for users ≡ 0 (mod 7); single eternal version otherwise. */
  val q37AsOfJoin: Q = {
    val dimSql =
      """SELECT c_custkey AS user_id, concat('v1-', c_mktsegment) AS segment,
        |  TIMESTAMP '2023-01-01 00:00:00' AS valid_from,
        |  CASE WHEN c_custkey % 7 = 0 THEN TIMESTAMP '2024-01-15 00:00:00' END AS valid_to
        |FROM customer
        |UNION ALL
        |SELECT c_custkey, concat('v2-', c_mktsegment),
        |  TIMESTAMP '2024-01-15 00:00:00', CAST(NULL AS TIMESTAMP)
        |FROM customer WHERE c_custkey % 7 = 0""".stripMargin
    def sql(ts: String) =
      s"""WITH dim AS ($dimSql)
         |SELECT e.event_id, e.user_id, d.segment, e.event_type
         |FROM (SELECT event_id, user_id, event_type, $ts AS ts2 FROM events) e
         |JOIN dim d
         |  ON d.user_id = e.user_id
         | AND d.valid_from <= e.ts2
         | AND (d.valid_to IS NULL OR e.ts2 < d.valid_to)""".stripMargin
    Q.dualSql("q37_asof_join", sql("ts"), sql("ts::TIMESTAMP"))
  }

  /** q39: date formatting / parsing parity (pattern dialects differ —
    * Spark uses DateTimeFormatter patterns, DuckDB strftime). */
  val q39DateFormat: Q = Q.dualSql("q39_date_format",
    sparkSql =
      """SELECT date_format(o_orderdate, 'yyyy-MM') AS ym,
        |  count(*) AS n,
        |  min(date_format(o_orderdate, 'yyyy-MM-dd')) AS first_day
        |FROM orders GROUP BY date_format(o_orderdate, 'yyyy-MM')""".stripMargin,
    duckSql =
      """SELECT strftime(o_orderdate, '%Y-%m') AS ym,
        |  count(*) AS n,
        |  min(strftime(o_orderdate, '%Y-%m-%d')) AS first_day
        |FROM orders GROUP BY strftime(o_orderdate, '%Y-%m')""".stripMargin)

  /** q41: null-safe equality (IS NOT DISTINCT FROM) — join over a nullable
    * derived key where NULL must match NULL. */
  val q41NullSafeJoin: Q = Q.sharedSql("q41_null_safe_join",
    """WITH a AS (SELECT c_custkey,
      |    CASE WHEN c_custkey % 3 = 0 THEN NULL ELSE c_nationkey END AS k
      |  FROM customer WHERE c_custkey <= 200),
      |b AS (SELECT n_nationkey,
      |    CASE WHEN n_nationkey % 5 = 0 THEN NULL ELSE n_nationkey END AS k
      |  FROM nation)
      |SELECT a.c_custkey, b.n_nationkey
      |FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k""".stripMargin)

  /** q43: window-frame completeness — RANGE frames, first/last_value with
    * frame bounds, ntile, lead with default. */
  val q43WindowFrames: Q = Q.sharedSql("q43_window_frames",
    """SELECT o_orderkey, o_custkey,
      |  CAST(first_value(o_totalprice) OVER w AS DOUBLE) AS first_price,
      |  CAST(last_value(o_totalprice) OVER
      |    (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS DOUBLE) AS last_price,
      |  ntile(4) OVER w AS quartile,
      |  CAST(lead(o_totalprice, 1, -1e0) OVER w AS DOUBLE) AS next_price
      |FROM orders
      |WHERE o_custkey <= 100
      |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)""".stripMargin)

  /** q44: recursive CTE (Spark 4 gained WITH RECURSIVE) — decimal-digit
    * ancestor chains over part keys (p → p/10 → … while ≥ 10): iterative
    * self-reference with aggregation over the closure. */
  val q44RecursiveCte: Q = Q.sharedSql("q44_recursive_cte",
    """WITH RECURSIVE anc(pk, a) AS (
      |  SELECT p_partkey, CAST(floor(p_partkey / 10) AS BIGINT)
      |  FROM part WHERE p_partkey >= 10
      |  UNION ALL
      |  SELECT pk, CAST(floor(a / 10) AS BIGINT) FROM anc WHERE a >= 10
      |)
      |SELECT pk, count(*) AS n_ancestors, min(a) AS top
      |FROM anc GROUP BY pk""".stripMargin)

  /** q45: explicit GROUPING SETS with the grouping() marker function. */
  val q45GroupingSets: Q = Q.sharedSql("q45_grouping_sets",
    """SELECT o_orderstatus, o_orderpriority,
      |  CAST(grouping(o_orderstatus) AS INT) AS g_status,
      |  CAST(grouping(o_orderpriority) AS INT) AS g_priority,
      |  count(*) AS n
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())""".stripMargin)

  /** q46: bag-semantics set ops (EXCEPT ALL / INTERSECT ALL). */
  val q46BagSetOps: Q = Q.sharedSql("q46_bag_set_ops",
    """SELECT nationkey, count(*) AS n FROM (
      |  SELECT c_nationkey AS nationkey FROM customer
      |  EXCEPT ALL
      |  SELECT s_nationkey AS nationkey FROM supplier) t
      |GROUP BY nationkey""".stripMargin)

  /** q47: MapType surface — build a status→count map per group with
    * map_from_entries, extract by key (missing keys → 0). Spark map access
    * is scalar; DuckDB's returns a single-element list, hence [1]. */
  val q47MapFunctions: Q = Q.dualSql("q47_map_functions",
    sparkSql =
      """SELECT o_orderpriority,
        |  coalesce(m['F'], 0) AS n_f,
        |  coalesce(m['P'], 0) AS n_p
        |FROM (
        |  SELECT o_orderpriority,
        |    map_from_entries(collect_list(struct(o_orderstatus, cnt))) AS m
        |  FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |        FROM orders GROUP BY 1, 2) t
        |  GROUP BY o_orderpriority) x""".stripMargin,
    duckSql =
      """SELECT o_orderpriority,
        |  coalesce(m['F'][1], 0) AS n_f,
        |  coalesce(m['P'][1], 0) AS n_p
        |FROM (
        |  SELECT o_orderpriority,
        |    map_from_entries(list({'k': o_orderstatus, 'v': cnt})) AS m
        |  FROM (SELECT o_orderpriority, o_orderstatus, count(*) AS cnt
        |        FROM orders GROUP BY 1, 2) t
        |  GROUP BY o_orderpriority) x""".stripMargin)

  /** q54: UNPIVOT (wide → long, the inverse of q30's pivot) — both engines
    * accept the standard `UNPIVOT (v FOR metric IN (...))` clause, so the
    * SQL is shared verbatim. Money stays decimal-exact through the cast
    * discipline (see Q.scala). */
  val q54Unpivot: Q = Q.sharedSql("q54_unpivot",
    """SELECT o_orderkey, metric, v
      |FROM (
      |  SELECT o_orderkey, o_totalprice AS price,
      |    o_totalprice * 2 AS twice
      |  FROM orders WHERE o_orderkey % 100 = 0) w
      |UNPIVOT (v FOR metric IN (price, twice))""".stripMargin)

  /** q57: statistical aggregates — stddev/variance/correlation/covariance.
    * Both engines use numerically stable one-pass algorithms; round(6) on
    * these magnitudes absorbs the last-ulp divergence (verified exact on the
    * testdata). */
  val q57StatAggs: Q = Q.sharedSql("q57_stat_aggs",
    """SELECT l_returnflag,
      |  round(stddev_samp(l_extendedprice), 6) AS sd_price,
      |  round(var_samp(l_discount), 6) AS var_disc,
      |  round(corr(l_extendedprice, l_quantity), 6) AS corr_pq,
      |  round(covar_samp(l_extendedprice, l_quantity), 6) AS covar_pq
      |FROM lineitem GROUP BY l_returnflag""".stripMargin)

  /** q58: ranking-window family — ntile, percent_rank, cume_dist over a
    * deterministic (value, key) order. */
  val q58RankingWindows: Q = Q.sharedSql("q58_ranking_windows",
    """SELECT o_orderkey, o_orderpriority,
      |  ntile(4) OVER w AS quartile,
      |  round(percent_rank() OVER w, 6) AS pct_rank,
      |  round(cume_dist() OVER w, 6) AS cdist
      |FROM orders
      |WHERE o_orderkey % 20 = 0
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)""".stripMargin)

  /** q68: banded range join — every lineitem row lands in the price band
    * whose [lo, hi) range contains it (inline VALUES dimension). The band
    * table is tiny, so Catalyst broadcasts it and the range predicate
    * evaluates as a broadcast nested-loop join: no shuffle of the fact side
    * at any scale. */
  val q68RangeJoin: Q = Q.sharedSql("q68_range_join",
    """SELECT b.bname, count(*) AS n,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS total
      |FROM lineitem
      |JOIN (VALUES (0.0, 1000.0, 'low'), (1000.0, 10000.0, 'mid'),
      |             (10000.0, 1000000.0, 'high')) AS b(lo, hi, bname)
      |  ON l_extendedprice >= b.lo AND l_extendedprice < b.hi
      |GROUP BY b.bname""".stripMargin)

  /** q69: skew-resistant two-phase (salted) aggregation — phase 1 groups by
    * (key, salt) so a hot key spreads over 16 reducers, phase 2 folds the
    * partials. Equal to the direct GROUP BY (the oracle) because SUM and
    * COUNT decompose over partials; quantities are integer-valued doubles,
    * so re-association changes no bits. This is the manual fallback when a
    * key is hot enough that AQE's skew handling (which only splits JOIN
    * partitions) can't help an aggregation. */
  val q69SaltedAgg: Q = Q(
    "q69_salted_agg",
    (spark, dir) => {
      val li = Tables.table(spark, dir, "lineitem")
      li.groupBy(col("l_returnflag"), pmod(col("l_orderkey"), lit(16)).as("__salt"))
        .agg(sum("l_quantity").as("s"), count(lit(1)).as("c"))
        .groupBy("l_returnflag")
        .agg(sum(col("s")).as("sum_qty"), sum(col("c")).as("n_rows"))
    },
    Some(
      """SELECT l_returnflag, sum(l_quantity) AS sum_qty,
        |  count(*) AS n_rows
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  /** q71: CROSS JOIN — the one join type the inventory listed as a trivial
    * widening (SURVEY.md §2.4 note). Both sides are tiny dims, so the plan
    * is a broadcast nested loop; a cross join with a LARGE right side would
    * be the classic scale bug, which is why Spark demands the explicit
    * keyword. */
  val q71CrossJoin: Q = Q.sharedSql("q71_cross_join",
    "SELECT r_name, n_name FROM region CROSS JOIN nation")

  /** q74: lateral generator (UDTF surface, SURVEY.md §2.10) — posexplode
    * flattens each document's first five tokens with their positions. A
    * generator is Spark's UDTF shape: one input row → N output rows inside
    * whole-stage codegen, where a row-at-a-time UDF returning arrays would
    * materialize every array on the heap first. */
  val q74LateralExplode: Q = Q.dualSql("q74_lateral_explode",
    sparkSql = """SELECT doc_id, t.pos, t.word
                 |FROM documents
                 |LATERAL VIEW posexplode(slice(split(text, ' '), 1, 5)) t AS pos, word""".stripMargin,
    duckSql = """SELECT doc_id, i - 1 AS pos, l[i] AS word
                |FROM (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
                |     generate_series(1, 5) g(i)
                |WHERE i <= len(l)""".stripMargin)

  /** q87: navigation window functions — nth_value plus first/last_value
    * with IGNORE NULLS over a per-customer order timeline (nulls injected
    * via nullif on the low-price band). Frame: full partition, so every row
    * of a customer carries the same navigation values. Spark spells
    * null-skipping `first(x, true)`; DuckDB `first_value(x IGNORE NULLS)` —
    * dialect split, same semantics. */
  val q87NavWindows: Q = Q.dualSql("q87_nav_windows",
    sparkSql =
      """SELECT o_orderkey, o_custkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_order,
        |  first(nullif(o_totalprice, 0e0), true) OVER w AS first_price,
        |  last(CASE WHEN o_totalprice > 150000 THEN o_orderkey END, true) OVER w
        |    AS last_big_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin,
    duckSql =
      """SELECT o_orderkey, o_custkey,
        |  nth_value(o_orderkey, 2) OVER w AS second_order,
        |  first_value(nullif(o_totalprice, 0) IGNORE NULLS) OVER w AS first_price,
        |  last_value(CASE WHEN o_totalprice > 150000 THEN o_orderkey END IGNORE NULLS)
        |    OVER w AS last_big_order
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
        |             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)""".stripMargin)

  /** q93: RANGE frame with a calendar-interval boundary — a trailing-7-day
    * moving sum per customer, ordered by event time. RANGE (value-based)
    * frames differ from q43's ROWS frames on ties and gaps: all peer rows
    * at the same date join the frame, and the window widens by TIME, not by
    * row count — the rolling-metric shape time-series pipelines need.
    * Decimal-exact sum so the frame-fold order is invisible. */
  val q93RangeFrame: Q = Q.sharedSql("q93_range_frame",
    """SELECT o_orderkey, o_custkey, o_orderdate,
      |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) OVER (
      |    PARTITION BY o_custkey ORDER BY o_orderdate
      |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS sum_7d
      |FROM orders""".stripMargin)

  /** q144: PERSISTENT VIEWS through the graft catalog (round 15) — CREATE
    * VIEW persists the definition TEXT under the catalog warehouse
    * (`_views/<ns>/<name>.view.json`, GraftCatalog's ViewCatalog face +
    * the hint-batch DDL rule, since Spark 4.1 ships no V2-view SQL path of
    * its own), reads re-analyze the text (SQL-standard expansion: the view
    * tracks the base table's head), and a view over VERSION AS OF pins its
    * snapshot forever — all three exercised here, against a DuckDB
    * recompute of what the final view text must serve. */
  val q144PersistentView: Q = Q(
    "q144_persistent_view",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val sfx = math.abs(dir.hashCode).toString
      val t = s"graft.default.pv_base_$sfx"
      val v = s"graft.default.pv_view_$sfx"
      val vp = s"graft.default.pv_pinned_$sfx"
      spark.sql(s"DROP VIEW IF EXISTS $v")
      spark.sql(s"DROP VIEW IF EXISTS $vp")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (okey BIGINT, prio STRING, price DOUBLE)")
      spark.sql(s"""INSERT INTO $t
        |SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin)         // v1
      spark.sql(s"""CREATE VIEW $v AS
        |SELECT prio, count(*) AS n,
        |  CAST(sum(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM $t GROUP BY prio""".stripMargin)
      spark.sql(s"CREATE VIEW $vp AS SELECT * FROM $t VERSION AS OF 1")
      spark.sql(s"""INSERT INTO $t
        |SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin)         // v2
      // the live view tracks the head; the pinned view still serves v1
      spark.sql(
        s"""SELECT 'live' AS face, prio, n, revenue FROM $v
           |UNION ALL
           |SELECT 'pinned' AS face, prio, CAST(count(*) AS BIGINT) AS n,
           |  CAST(sum(CAST(price AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           |FROM $vp GROUP BY prio""".stripMargin)
        .localCheckpoint(true)
    },
    Some(
      """SELECT 'live' AS face, o_orderpriority AS prio,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders GROUP BY o_orderpriority
        |UNION ALL
        |SELECT 'pinned' AS face, o_orderpriority AS prio,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM orders WHERE o_orderkey % 2 = 0 GROUP BY o_orderpriority""".stripMargin))

  /** q145: VIEW SCHEMA-DRIFT POLICY faces (round-15 session 2) — the
    * `graft.schemaMode` property under a real base-table drift: the table
    * is REPLACED with a widened shape (okey narrowed to INT, a `tag`
    * column gained), and the SAME stored view text serves
    *  - `evolution` (the default): the fresh body's shape — tag present;
    *  - `compensation`: the STORED (creation-time) schema — tag ignored,
    *    okey cast back to BIGINT.
    * `binding`'s refusal face can't emit rows and stays spec-gated
    * (GraftCatalogSpec). Both faces replay relationally from orders. */
  val q145ViewSchemaModes: Q = Q(
    "q145_view_schema_modes",
    (spark, dir) => {
      import org.apache.spark.sql.functions.{col, lit}
      Tables.registerAll(spark, dir)
      val sfx = math.abs(dir.hashCode).toString
      val t = s"graft.default.vm_base_$sfx"
      val v = s"graft.default.vm_view_$sfx"
      spark.sql(s"DROP VIEW IF EXISTS $v")
      spark.sql(s"DROP TABLE IF EXISTS $t")
      spark.sql(s"CREATE TABLE $t (okey BIGINT, prio STRING, price DOUBLE)")
      spark.sql(s"""INSERT INTO $t
        |SELECT o_orderkey, o_orderpriority, o_totalprice
        |FROM orders WHERE o_orderkey % 3 = 0""".stripMargin)
      spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t WHERE okey % 2 = 0")
      // the drift: okey narrows to INT, tag is gained, contents swap
      spark.sql(s"CREATE OR REPLACE TABLE $t (okey INT, prio STRING, price DOUBLE, tag STRING)")
      spark.sql(s"""INSERT INTO $t
        |SELECT CAST(o_orderkey AS INT), o_orderpriority, o_totalprice, 'x'
        |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin)
      val evolution = spark.table(v)
        .select(lit("evolution").as("face"), col("okey").cast("bigint").as("okey"),
          col("prio"), col("price"), col("tag"))
        .localCheckpoint(true)
      spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'compensation')")
      val compensation = spark.table(v)
        .select(lit("compensation").as("face"), col("okey"),
          col("prio"), col("price"), lit(null).cast("string").as("tag"))
        .localCheckpoint(true)
      evolution.unionAll(compensation)
    },
    Some(
      """SELECT 'evolution' AS face, CAST(o_orderkey AS BIGINT) AS okey,
        |  o_orderpriority AS prio, o_totalprice AS price, 'x' AS tag
        |FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 2 = 0
        |UNION ALL
        |SELECT 'compensation' AS face, CAST(o_orderkey AS BIGINT) AS okey,
        |  o_orderpriority AS prio, o_totalprice AS price, CAST(NULL AS VARCHAR) AS tag
        |FROM orders WHERE o_orderkey % 3 = 1 AND o_orderkey % 2 = 0""".stripMargin))

  /** q146: DIM-FACT JOIN THROUGH THE GRAFT CATALOG — correctness coverage
    * for the manifest-stats broadcast path (GraftJoinStatsRule +
    * TableRelation.sizeInBytes): a small graft-resident dimension joins a
    * parquet fact, exactly the plan the hint rule rewrites, and the result
    * must stay byte-identical to the relational replay. The plan-shape
    * assertions (BroadcastHashJoin, the BROADCAST hint) live in ScaleSpec;
    * this entry keeps the REWRITTEN plan's answers under the oracle every
    * round. */
  val q146DimBroadcastJoin: Q = Q(
    "q146_dim_broadcast_join",
    (spark, dir) => {
      import org.apache.spark.sql.functions.col
      Tables.registerAll(spark, dir)
      val sfx = math.abs(dir.hashCode).toString
      val d = s"graft.default.bj_dim_$sfx"
      spark.sql(s"DROP TABLE IF EXISTS $d")
      spark.sql(s"CREATE TABLE $d (nkey BIGINT, nname STRING)")
      spark.sql(s"INSERT INTO $d SELECT n_nationkey, n_name FROM nation")
      Tables.table(spark, dir, "customer")
        .join(spark.table(d), col("c_nationkey") === col("nkey"))
        .groupBy("nname")
        .agg(org.apache.spark.sql.functions.expr(
          "CAST(count(*) AS BIGINT) AS n_customers"),
          org.apache.spark.sql.functions.expr(
            "CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acct_mass"))
    },
    Some(
      """SELECT n_name AS nname, CAST(count(*) AS BIGINT) AS n_customers,
        |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS acct_mass
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin))

  val all: Seq[Q] = Seq(q144PersistentView, q145ViewSchemaModes, q146DimBroadcastJoin,
    q28OuterJoin, q28bFullOuter, q29StringFunctions, q30Pivot, q31CustomAgg,
    q32Cube, q33Intersect, q34CorrelatedScalar, q35InSubquery, q36ArrayAgg,
    q37AsOfJoin, q39DateFormat, q41NullSafeJoin, q43WindowFrames, q44RecursiveCte,
    q45GroupingSets, q46BagSetOps, q47MapFunctions, q54Unpivot, q57StatAggs,
    q58RankingWindows, q68RangeJoin, q69SaltedAgg, q71CrossJoin, q74LateralExplode,
    q87NavWindows, q93RangeFrame)
}
