package graft.queries

/** TPC-H-shaped analytic queries widening the SQL operator surface beyond
  * the reference's own stages (SURVEY.md §2.4 "trivial extensions" + §2.5):
  * each entry exercises a subquery/join/aggregation SHAPE the gate did not
  * yet cover — EXISTS, null-aware NOT IN, a correlated aggregate in WHERE, a
  * HAVING-gated IN subquery, disjunctive multi-column pushdown, a CTE
  * consumed twice (once through a scalar subquery), conditional market-share
  * aggregation, and max_by/min_by ordered-tuple selection.
  *
  * Exactness follows the Q scaladoc discipline: 2dp money → DECIMAL sums →
  * one final CAST to DOUBLE; quantities are integer-valued doubles whose
  * sums stay exact in binary at any row count that fits 2^53.
  */
object TpchQueries {

  private val price = "CAST(l_extendedprice AS DECIMAL(12,2))"
  private val disc = "CAST((1 - CAST(l_discount AS DECIMAL(4,2))) AS DECIMAL(4,2))"

  /** q59: market share (TPC-H Q8 shape) — 6-table join, per-year conditional
    * share of one supplier nation inside one customer region. At scale the
    * dimension chain broadcasts; the only real shuffles are lineitem⋈orders
    * and the final 7-group agg. */
  val q59MarketShare: Q = Q.sharedSql("q59_market_share",
    s"""SELECT CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |  CAST(sum(CASE WHEN n2.n_name = 'NATION_3' THEN vp END) AS DOUBLE)
       |    AS nation_volume,
       |  CAST(sum(vp) AS DOUBLE) AS total_volume
       |FROM (
       |  SELECT o_orderdate, $price * $disc AS vp, s_nationkey
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN customer ON o_custkey = c_custkey
       |  JOIN nation n1 ON c_nationkey = n1.n_nationkey
       |  JOIN region ON n1.n_regionkey = r_regionkey
       |  JOIN supplier ON l_suppkey = s_suppkey
       |  WHERE r_name = 'ASIA'
       |) v JOIN nation n2 ON v.s_nationkey = n2.n_nationkey
       |GROUP BY o_year""".stripMargin)

  /** q60: top supplier (TPC-H Q15 shape) — a revenue CTE consumed twice:
    * once joined to supplier, once through a scalar MAX subquery. The CTE's
    * decimal sums make the MAX comparison exact in both engines. */
  val q60TopSupplier: Q = Q.sharedSql("q60_top_supplier",
    s"""WITH revenue AS (
       |  SELECT l_suppkey AS supplier_no,
       |    sum($price * $disc) AS total_revenue
       |  FROM lineitem
       |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |    AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
       |  GROUP BY l_suppkey)
       |SELECT s_suppkey, s_name,
       |  CAST(total_revenue AS DOUBLE) AS total_revenue
       |FROM supplier JOIN revenue ON s_suppkey = supplier_no
       |WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)""".stripMargin)

  /** q61: parts/supplier relationship (TPC-H Q16 shape) — DISTINCT
    * aggregation under a null-aware NOT IN anti-join on the supplier
    * blocklist. Catalyst plans the NOT IN as a null-aware anti join; the
    * blocklist side broadcasts. */
  val q61PartsSuppliers: Q = Q.sharedSql("q61_parts_suppliers",
    """SELECT p_brand, p_type, count(DISTINCT l_suppkey) AS supplier_cnt
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE p_size <= 10
      |  AND l_suppkey NOT IN (
      |    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
      |GROUP BY p_brand, p_type""".stripMargin)

  /** q62: small-quantity-order revenue (TPC-H Q17 shape) — a CORRELATED
    * aggregate subquery in WHERE (per-part average quantity). The 0.5 factor
    * is a power of two, so the threshold comparison is bit-exact in both
    * engines; Catalyst de-correlates into an aggregate + join rather than a
    * per-row re-scan. */
  val q62SmallQtyRevenue: Q = Q.sharedSql("q62_small_qty_revenue",
    s"""SELECT CAST(sum($price) AS DOUBLE) / 7.0 AS avg_yearly
       |FROM lineitem l JOIN part ON p_partkey = l_partkey
       |WHERE p_brand = 'Brand#13'
       |  AND l_quantity < (
       |    SELECT 0.5 * avg(l2.l_quantity) FROM lineitem l2
       |    WHERE l2.l_partkey = l.l_partkey)""".stripMargin)

  /** q63: large-volume customer (TPC-H Q18 shape) — GROUP BY + HAVING inside
    * an IN subquery gating the outer 3-table join. The subquery is the same
    * fact table re-aggregated: at scale AQE reuses the shuffle. */
  val q63LargeVolumeCustomer: Q = Q.sharedSql("q63_large_volume_customer",
    """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
      |  sum(l_quantity) AS sum_qty
      |FROM customer
      |JOIN orders ON c_custkey = o_custkey
      |JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE o_orderkey IN (
      |  SELECT l_orderkey FROM lineitem
      |  GROUP BY l_orderkey HAVING sum(l_quantity) > 250)
      |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice""".stripMargin)

  /** q64: discounted revenue (TPC-H Q19 shape) — an OR of conjunct bands
    * over both join sides. The planner must keep the disjunction as a
    * post-join filter while still pushing the common join key; per-branch
    * min/max bounds still prune parquet row groups. */
  val q64DisjunctiveRevenue: Q = Q.sharedSql("q64_disjunctive_revenue",
    s"""SELECT CAST(sum($price * $disc) AS DOUBLE) AS revenue
       |FROM lineitem JOIN part ON p_partkey = l_partkey
       |WHERE (p_brand = 'Brand#12' AND l_quantity BETWEEN 1 AND 11
       |       AND p_size BETWEEN 1 AND 5)
       |   OR (p_brand = 'Brand#23' AND l_quantity BETWEEN 10 AND 20
       |       AND p_size BETWEEN 1 AND 10)
       |   OR (p_brand = 'Brand#34' AND l_quantity BETWEEN 20 AND 30
       |       AND p_size BETWEEN 1 AND 15)""".stripMargin)

  /** q65: order-priority checking (TPC-H Q4 shape) — correlated EXISTS,
    * planned as a left semi join (the gate's q14 semi join is the DataFrame
    * formulation; this is the subquery path through the same physical
    * operator). */
  val q65OrderPriority: Q = Q.sharedSql("q65_order_priority",
    """SELECT o_orderpriority, count(*) AS order_count
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      |  AND EXISTS (
      |    SELECT 1 FROM lineitem
      |    WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority""".stripMargin)

  /** q66: ordered-tuple selection — max_by/min_by (Spark) vs the window
    * formulation (DuckDB oracle). Ties broken by the second struct field so
    * both engines pick one deterministic row. One shuffle on the 3-value
    * group key; no window state on the Spark side. */
  val q66MinMaxBy: Q = Q.dualSql("q66_minmax_by",
    """SELECT l_returnflag,
      |  max_by(l_orderkey, struct(l_extendedprice, l_orderkey)) AS top_order,
      |  min_by(l_orderkey, struct(l_extendedprice, l_orderkey)) AS bottom_order,
      |  max(l_extendedprice) AS top_price
      |FROM lineitem
      |GROUP BY l_returnflag""".stripMargin,
    """SELECT l_returnflag,
      |  max(CASE WHEN rn_hi = 1 THEN l_orderkey END) AS top_order,
      |  max(CASE WHEN rn_lo = 1 THEN l_orderkey END) AS bottom_order,
      |  max(l_extendedprice) AS top_price
      |FROM (
      |  SELECT l_returnflag, l_orderkey, l_extendedprice,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice DESC, l_orderkey DESC) AS rn_hi,
      |    row_number() OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice ASC, l_orderkey ASC) AS rn_lo
      |  FROM lineitem)
      |GROUP BY l_returnflag""".stripMargin)

  /** q79: important-part identification (TPC-H Q11 shape) — a scalar
    * subquery inside HAVING, i.e. a group filter against a whole-table
    * aggregate. The threshold comparison stays in DECIMAL on both sides
    * (the share factor 1/5000 is applied as an integer multiply on the
    * group sum, never as a double), so group membership is bit-exact
    * cross-engine. At scale this is two aggregations over one scan — AQE
    * reuses the exchange — plus a broadcast of the 1-row global sum. */
  val q79ValueShare: Q = Q.sharedSql("q79_value_share",
    s"""SELECT l_partkey,
       |  CAST(sum($price * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
       |    AS part_value
       |FROM lineitem
       |GROUP BY l_partkey
       |HAVING sum($price * CAST(l_quantity AS DECIMAL(12,2))) * 5000 >
       |  (SELECT sum($price * CAST(l_quantity AS DECIMAL(12,2)))
       |   FROM lineitem)""".stripMargin)

  /** q80: customer order-count distribution (TPC-H Q13 shape) — a LEFT
    * OUTER join whose ON clause carries a build-side filter (customers with
    * zero matching orders must survive with count 0), re-aggregated by the
    * count itself. Two shuffles: the outer join and the tiny second
    * aggregation keyed on c_count. */
  val q80Custdist: Q = Q.sharedSql("q80_custdist",
    """SELECT c_count, count(*) AS custdist
      |FROM (
      |  SELECT c.c_custkey, count(o.o_orderkey) AS c_count
      |  FROM customer c LEFT JOIN orders o
      |    ON o.o_custkey = c.c_custkey AND o.o_orderpriority <> '1-URGENT'
      |  GROUP BY c.c_custkey) per_cust
      |GROUP BY c_count""".stripMargin)

  /** q81: idle rich customers (TPC-H Q22 shape) — a WHERE gated by BOTH a
    * global-average scalar subquery and a NOT EXISTS anti join, then a
    * segment rollup. Catalyst broadcasts the 1-row average and plans the
    * NOT EXISTS as a left-anti hash join; the money sum follows the DECIMAL
    * discipline. */
  val q81IdleCustomers: Q = Q.sharedSql("q81_idle_customers",
    """SELECT c_mktsegment, count(*) AS numcust,
      |  CAST(sum(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
      |FROM customer
      |WHERE c_acctbal > (
      |    SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      |  AND NOT EXISTS (
      |    SELECT 1 FROM orders
      |    WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT')
      |GROUP BY c_mktsegment""".stripMargin)

  /** q82: lagging-supplier detection (TPC-H Q21 shape) — the fact table
    * self-joined twice under correlated EXISTS and NOT EXISTS: count line
    * items where some OTHER supplier in the order shipped earlier and none
    * shipped later. Both correlated subqueries decorrelate to semi/anti
    * joins on l_orderkey — three passes over one table, shuffled once each
    * on the same key, which AQE collapses onto a shared exchange at scale.
    *
    * The oracle is a provably-equivalent manual join (per-(order, supplier)
    * min/max of the OTHER suppliers' ship dates): DuckDB 1.0 mis-decorrelates
    * the twin correlated subqueries on the same table (24 rows where the
    * window-function ground truth says 13.6k), so the subquery text cannot
    * serve as its own oracle. EXISTS(earlier other) ⟺ min_other < own;
    * NOT EXISTS(later other) ⟺ max_other <= own; rows with no other-supplier
    * lines drop out of both forms. */
  val q82WaitingSupplier: Q = Q.dualSql("q82_waiting_supplier",
    sparkSql =
      """SELECT l1.l_suppkey AS s_suppkey, count(*) AS numwait
        |FROM lineitem l1
        |WHERE EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey
        |      AND l2.l_suppkey <> l1.l_suppkey
        |      AND l2.l_shipdate < l1.l_shipdate)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    WHERE l3.l_orderkey = l1.l_orderkey
        |      AND l3.l_suppkey <> l1.l_suppkey
        |      AND l3.l_shipdate > l1.l_shipdate)
        |GROUP BY l1.l_suppkey""".stripMargin,
    duckSql =
      """WITH pairs AS (SELECT DISTINCT l_orderkey, l_suppkey FROM lineitem),
        |others AS (
        |  SELECT p.l_orderkey, p.l_suppkey,
        |         max(b.l_shipdate) AS mx_other, min(b.l_shipdate) AS mn_other
        |  FROM pairs p JOIN lineitem b
        |    ON b.l_orderkey = p.l_orderkey AND b.l_suppkey <> p.l_suppkey
        |  GROUP BY p.l_orderkey, p.l_suppkey)
        |SELECT l1.l_suppkey AS s_suppkey, count(*) AS numwait
        |FROM lineitem l1 JOIN others o
        |  ON o.l_orderkey = l1.l_orderkey AND o.l_suppkey = l1.l_suppkey
        |WHERE o.mn_other < l1.l_shipdate AND o.mx_other <= l1.l_shipdate
        |GROUP BY l1.l_suppkey""".stripMargin)

  // ---- The remaining TPC-H query numbers (h<N> = TPC-H Q<N> adapted to the
  // testdata star schema, which has no partsupp/shipmode/commitdate columns:
  // supply cost becomes the min observed lineitem price per (part, supplier),
  // availability becomes shipped quantity — the SHAPES are preserved exactly).

  /** h2: min-cost supplier (TPC-H Q2) — a CTE consumed twice, once through a
    * CORRELATED scalar MIN subquery that itself carries a 3-table join chain
    * (supplier→nation→region) plus the outer part correlation. Catalyst
    * decorrelates into an aggregate-join; the dimension chain broadcasts both
    * times, so the only real shuffle is the offers aggregation — which AQE
    * reuses across the two consumers. min over doubles is order-insensitive,
    * hence bit-exact cross-engine. */
  val h2MinCostSupplier: Q = Q.sharedSql("h2_min_cost_supplier",
    """WITH offers AS (
      |  SELECT l_partkey, l_suppkey, min(l_extendedprice) AS supply_cost
      |  FROM lineitem GROUP BY l_partkey, l_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_name,
      |  o.supply_cost
      |FROM part
      |JOIN offers o ON p_partkey = o.l_partkey
      |JOIN supplier ON s_suppkey = o.l_suppkey
      |JOIN nation ON s_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE p_size BETWEEN 1 AND 8 AND r_name = 'EUROPE'
      |  AND o.supply_cost = (
      |    SELECT min(o2.supply_cost)
      |    FROM offers o2
      |    JOIN supplier s2 ON s2.s_suppkey = o2.l_suppkey
      |    JOIN nation n2 ON s2.s_nationkey = n2.n_nationkey
      |    JOIN region r2 ON n2.n_regionkey = r2.r_regionkey
      |    WHERE o2.l_partkey = p_partkey AND r2.r_name = 'EUROPE')""".stripMargin)

  /** h6: forecast revenue change (TPC-H Q6) — the canonical scan-only
    * aggregate: one predicate-pushed pass, zero joins, one 1-row result. At
    * scale this is the query that proves pushdown works: every predicate
    * (date range, discount band, quantity cap) reaches the parquet reader. */
  val h6ForecastRevenue: Q = Q.sharedSql("h6_forecast_revenue",
    s"""SELECT CAST(sum($price * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
       |  AS revenue
       |FROM lineitem
       |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
       |  AND l_discount BETWEEN 0.03 AND 0.07
       |  AND l_quantity < 24""".stripMargin)

  /** h7: volume shipping (TPC-H Q7) — bidirectional nation-pair filter over a
    * 6-table join, grouped by the pair and the ship year. The nation table
    * joins TWICE (supplier side and customer side) under a symmetric OR; the
    * dimensions broadcast, leaving lineitem⋈orders as the one real shuffle. */
  val h7VolumeShipping: Q = Q.sharedSql("h7_volume_shipping",
    s"""SELECT supp_nation, cust_nation, l_year,
       |  CAST(sum(volume) AS DOUBLE) AS revenue
       |FROM (
       |  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
       |    CAST(EXTRACT(YEAR FROM l_shipdate) AS BIGINT) AS l_year,
       |    $price * $disc AS volume
       |  FROM supplier
       |  JOIN lineitem ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN customer ON c_custkey = o_custkey
       |  JOIN nation n1 ON s_nationkey = n1.n_nationkey
       |  JOIN nation n2 ON c_nationkey = n2.n_nationkey
       |  WHERE (n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
       |     OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1')
       |) shipping
       |GROUP BY supp_nation, cust_nation, l_year""".stripMargin)

  /** h9: product-type profit (TPC-H Q9) — profit = revenue minus a cost
    * proxy (retail price × quantity; the schema has no ps_supplycost),
    * grouped by supplier nation and order year, part filter via LIKE on
    * p_name. Both decimal products stay exact and the mixed-scale subtraction
    * is exact in DECIMAL, so the nation-year sums hash identically. */
  val h9ProductProfit: Q = Q.sharedSql("h9_product_profit",
    s"""SELECT nation, o_year, CAST(sum(amount) AS DOUBLE) AS sum_profit
       |FROM (
       |  SELECT n_name AS nation,
       |    CAST(EXTRACT(YEAR FROM o_orderdate) AS BIGINT) AS o_year,
       |    $price * $disc
       |      - CAST(p_retailprice AS DECIMAL(12,2))
       |        * CAST(l_quantity AS DECIMAL(12,2)) AS amount
       |  FROM lineitem
       |  JOIN part ON p_partkey = l_partkey
       |  JOIN supplier ON s_suppkey = l_suppkey
       |  JOIN orders ON o_orderkey = l_orderkey
       |  JOIN nation ON s_nationkey = n_nationkey
       |  WHERE p_name LIKE '%gear%'
       |) profit
       |GROUP BY nation, o_year""".stripMargin)

  /** h10: returned-item reporting (TPC-H Q10) — revenue lost to returns per
    * customer over a quarter, top 20. The LIMIT rides a fully deterministic
    * ORDER BY (revenue is an exact decimal rendered to double; ties broken by
    * the unique customer key), so both engines truncate identically. */
  val h10ReturnedItems: Q = Q.sharedSql("h10_returned_items",
    s"""SELECT c_custkey, c_name, n_name,
       |  CAST(sum($price * $disc) AS DOUBLE) AS revenue
       |FROM customer
       |JOIN orders ON c_custkey = o_custkey
       |JOIN lineitem ON l_orderkey = o_orderkey
       |JOIN nation ON c_nationkey = n_nationkey
       |WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
       |  AND o_orderdate < TIMESTAMP '1996-07-01 00:00:00'
       |  AND l_returnflag = 'R'
       |GROUP BY c_custkey, c_name, n_name
       |ORDER BY revenue DESC, c_custkey
       |LIMIT 20""".stripMargin)

  /** h12: shipping-priority classes (TPC-H Q12 shape; the schema has no
    * shipmode, so the low-cardinality group key is l_linestatus) — dual
    * conditional counts of urgent vs non-urgent orders among lines shipped
    * late (> 30 days after the order date), one join + one tiny agg. */
  val h12PriorityLines: Q = Q.sharedSql("h12_priority_lines",
    """SELECT l_linestatus,
      |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
      |                 OR o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END)
      |       AS BIGINT) AS high_line_count,
      |  CAST(sum(CASE WHEN o_orderpriority <> '1-URGENT'
      |                AND o_orderpriority <> '2-HIGH' THEN 1 ELSE 0 END)
      |       AS BIGINT) AS low_line_count
      |FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |WHERE l_shipdate > o_orderdate + INTERVAL 30 DAY
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY l_linestatus""".stripMargin)

  /** h14: promotion effect (TPC-H Q14) — the share of one month's revenue
    * from PROMO parts: two conditional sums over one join, combined in a
    * single-row double division (exact: both operands are exact decimals
    * rendered to double, and one IEEE division is bit-deterministic). */
  val h14PromoEffect: Q = Q.sharedSql("h14_promo_effect",
    s"""SELECT 100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
       |                        THEN $price * $disc END) AS DOUBLE)
       |     / CAST(sum($price * $disc) AS DOUBLE) AS promo_revenue
       |FROM lineitem JOIN part ON l_partkey = p_partkey
       |WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
       |  AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'""".stripMargin)

  /** h20: potential part promotion (TPC-H Q20) — nested IN subqueries: the
    * supplier list is gated by an aggregated HAVING subquery that is itself
    * gated by a part-name IN subquery ("suppliers who shipped an
    * above-average volume of the promoted parts this year"); the HAVING
    * threshold is itself a scalar subquery over the same aggregation, so the
    * query stays ~50% selective at ANY scale factor. Decorrelates to two
    * hash semi-joins over one lineitem aggregation (AQE reuses the exchange
    * for the scalar threshold); the part list broadcasts. Exact cross-engine:
    * quantity sums are integer-valued doubles, avg = one IEEE division. */
  val h20ExcessSuppliers: Q = Q.sharedSql("h20_excess_suppliers",
    """WITH shipped AS (
      |  SELECT l_suppkey, sum(l_quantity) AS qty
      |  FROM lineitem
      |  WHERE l_partkey IN (
      |      SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
      |    AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      |  GROUP BY l_suppkey)
      |SELECT s_name, s_acctbal, n_name
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |WHERE s_suppkey IN (
      |  SELECT l_suppkey FROM shipped
      |  WHERE qty > (SELECT avg(qty) FROM shipped))""".stripMargin)

  val all: Seq[Q] = Seq(q59MarketShare, q60TopSupplier, q61PartsSuppliers,
    q62SmallQtyRevenue, q63LargeVolumeCustomer, q64DisjunctiveRevenue,
    q65OrderPriority, q66MinMaxBy, q79ValueShare, q80Custdist,
    q81IdleCustomers, q82WaitingSupplier,
    h2MinCostSupplier, h6ForecastRevenue, h7VolumeShipping, h9ProductProfit,
    h10ReturnedItems, h12PriorityLines, h14PromoEffect, h20ExcessSuppliers)
}
