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

  val all: Seq[Q] = Seq(q59MarketShare, q60TopSupplier, q61PartsSuppliers,
    q62SmallQtyRevenue, q63LargeVolumeCustomer, q64DisjunctiveRevenue,
    q65OrderPriority, q66MinMaxBy, q79ValueShare, q80Custdist,
    q81IdleCustomers, q82WaitingSupplier)
}
