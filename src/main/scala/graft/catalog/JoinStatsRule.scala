package graft.catalog

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, BROADCAST, Deduplicate, Distinct, Filter, GlobalLimit, HintInfo, Join, JoinHint, LocalLimit, LogicalPlan, Project, Sort, SubqueryAlias, Window}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation

/** Manifest-stats join hints for graft DSv2 relations.
  *
  * Spark's broadcast decision reads the join sides' logical statistics, but
  * a DSv2 V1Scan relation can never surface them: `V2ScanRelationPushDown`
  * wraps every V1Scan in a `V1ScanWrapper` that drops
  * `SupportsReportStatistics` (so the post-pushdown ScanRelation reports
  * `defaultSizeInBytes` = Long.MaxValue), and no extension point runs
  * between that batch and physical planning to re-wrap it. A 100-row graft
  * dimension table would therefore NEVER auto-broadcast and every dim-fact
  * join would pay a full shuffle of the fact side.
  *
  * So the decision moves one layer up, through the documented hint
  * mechanism: this operator-optimization rule (runs BEFORE pushdown, where
  * the relation still exposes its [[GraftTable]]) computes the manifest row
  * estimate ([[graft.table.VersionedTable.estimateLiveRows]] — in-memory
  * metadata, no I/O) and sets `JoinHint(BROADCAST)` on a join side whose
  * UPPER-BOUND size (head rows, no DV subtraction, × the side's own output
  * row width) fits under `autoBroadcastJoinThreshold`. Exactly what
  * `EliminateResolvedHint` produces for a user's `/*+ BROADCAST */`;
  * JoinSelection still enforces build-side legality per join type, user
  * hints take precedence (`orElse`), and a user who disabled broadcasting
  * (threshold < 0) disables this rule too.
  *
  * Row estimates walk only through row-preserving-or-reducing shapes
  * (Project/Filter/SubqueryAlias) down to a single graft relation; width
  * comes from the SIDE's own output schema, so a widening projection is
  * priced at its widened width. Anything else (aggregates, generators,
  * unions, other sources) abstains. */
case class GraftJoinStatsRule(session: SparkSession) extends Rule[LogicalPlan] {

  /** Row UPPER BOUND of a join side: the manifest head-row count of a
    * single underlying graft relation, walked down through shapes that
    * PRESERVE OR REDUCE row count (projections, filters, aliases,
    * aggregates — grouped output ≤ input — sorts, limits, distincts,
    * windows). The side's own output schema prices the width, so a
    * widening Project or Aggregate is charged at its widened shape.
    * Memoized per apply() — the rule runs in a fixed-point batch and a
    * many-join query would otherwise re-resolve the same head repeatedly. */
  private def estimatedRows(p: LogicalPlan,
      memo: scala.collection.mutable.Map[(String, Option[Long]), Option[Long]])
      : Option[Long] = p match {
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable =>
        memo.getOrElseUpdate((g.table.root, g.versionAsOf),
          // a hint is advisory — a planning-time estimate must never fail
          // the query it decorates (e.g. a concurrently vacuumed table)
          try g.table.estimateLiveRows(g.table.resolve(None, g.versionAsOf))
          catch { case _: Exception => None })
      case _ => None
    }
    case p @ (_: Project | _: Filter | _: SubqueryAlias | _: Aggregate |
              _: Sort | _: GlobalLimit | _: LocalLimit | _: Distinct |
              _: Deduplicate | _: Window) =>
      estimatedRows(p.children.head, memo)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    val threshold = conf.autoBroadcastJoinThreshold
    if (threshold <= 0) return plan
    val memo = scala.collection.mutable.Map.empty[(String, Option[Long]), Option[Long]]
    def estimatedBytes(side: LogicalPlan): Option[Long] =
      estimatedRows(side, memo).map { rows =>
        val width = 8L + side.schema.fields.map(_.dataType.defaultSize.toLong).sum
        math.max(1L, rows * width)
      }
    plan.transformUp {
      case j: Join =>
        def hintFor(side: LogicalPlan, existing: Option[HintInfo]): Option[HintInfo] =
          existing.orElse(estimatedBytes(side).filter(_ <= threshold)
            .map(_ => HintInfo(strategy = Some(BROADCAST))))
        val lh = hintFor(j.left, j.hint.leftHint)
        val rh = hintFor(j.right, j.hint.rightHint)
        if (lh == j.hint.leftHint && rh == j.hint.rightHint) j
        else j.copy(hint = JoinHint(lh, rh))
    }
  }
}
