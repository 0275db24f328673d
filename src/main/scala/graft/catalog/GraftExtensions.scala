package graft.catalog

import graft.table.{Merge, VersionedTable}
import org.apache.spark.sql.{Row, SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.analysis.UnresolvedException
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.execution.datasources.LogicalRelation
import org.apache.spark.sql.execution.datasources.v2.DataSourceV2Relation
import org.apache.spark.sql.graft.PlanShim
import org.apache.spark.sql.types.DataType

/** Session extensions completing the SQL row-level surface over graft
  * tables: `UPDATE`, arbitrary-predicate `DELETE`, and full `MERGE INTO` as
  * SQL TEXT — the reference's whole idiom (its SCD2 merge is declarative
  * config compiled to Delta's SQL MERGE, `scd2-job.ipynb:338-353`).
  *
  * Register with `spark.sql.extensions=graft.catalog.GraftExtensions`
  * (alongside the [[GraftCatalog]]). The injected post-hoc resolution rule
  * fires AFTER the analyzer fully resolves the statement — conditions,
  * aligned assignments, star expansion — and swaps the standard
  * `MergeIntoTable`/`UpdateTable`/`DeleteFromTable` nodes for commands that
  * execute through the versioned kernel: the SAME file-pruned COW/MOR
  * merge, COW update, and COW/MOR delete paths the Scala API uses (Delta
  * takes exactly this shape: `DeltaAnalysis` rewriting the analyzed nodes
  * into its own commands). Expressions are re-rendered to the kernel's
  * `source.`/`target.`-aliased SQL via their resolved trees, so user
  * aliases, quoting, and implicit casts all survive. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(extensions: SparkSessionExtensions): Unit = {
    extensions.injectPostHocResolutionRule(session => GraftRowLevelRule(session))
    // persistent-view DDL must be intercepted BEFORE ResolveSessionCatalog
    // (which hard-throws for any non-session catalog view statement — Spark
    // 4.1 has no ViewCatalog SQL dispatch); the hint-resolution batch is
    // the one extension point that runs ahead of it
    extensions.injectHintResolutionRule(session => GraftViewDdlRule(session))
    // V1ScanWrapper drops the inner scan's SupportsReportStatistics and no
    // extension point runs between push-down and join selection — so
    // manifest row counts reach the broadcast decision as JoinHints set by
    // this operator-optimization rule instead (see GraftJoinStatsRule)
    extensions.injectOptimizerRule(session => GraftJoinStatsRule(session))
    // the engine's native SQL functions ride the same front door, so one
    // `spark.sql.extensions=graft.catalog.GraftExtensions` line yields the
    // full surface (row-level SQL + vec_dot/minhash/top_k_by/...)
    new graft.functions.GraftExtensions()(extensions)
    ()
  }
}

/** Matches a fully-analyzed row-level statement whose target is a graft
  * table — through either front door: the DSv2 catalog
  * (`DataSourceV2Relation` over [[GraftTable]]) or the session-catalog V1
  * format (`LogicalRelation` over [[graft.streaming.TableRelation]]). */
private object GraftTarget {
  def unapply(plan: LogicalPlan): Option[(VersionedTable, Seq[Attribute])] = plan match {
    case SubqueryAlias(_, child) => unapply(child)
    case r: DataSourceV2Relation => r.table match {
      case g: GraftTable => Some((g.table, r.output))
      case _ => None
    }
    case l: LogicalRelation => l.relation match {
      case t: graft.streaming.TableRelation => Some((t.table, l.output))
      case _ => None
    }
    case _ => None
  }
}

/** A resolved attribute re-rendered as a plain (optionally qualified) SQL
  * identifier — the bridge between the analyzed tree's exprId-bound
  * references and the kernel's `source.`/`target.`-aliased SQL text. */
private case class SqlIdent(parts: Seq[String], dataType: DataType,
    nullable: Boolean) extends LeafExpression with Unevaluable {
  override def sql: String = parts.map(PredicateSql.quote).mkString(".")
  override def toString: String = sql
}

case class GraftRowLevelRule(session: SparkSession) extends Rule[LogicalPlan] {

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    case d @ DeleteFromTable(GraftTarget(t, tout), condition) if d.resolved =>
      inKeyRewrite(condition, tout) match {
        case Some((keys, src, residual, negated)) =>
          // the compliance DELETE (`WHERE id IN (SELECT ...)` / EXISTS /
          // guarded NOT IN) translated to the kernel's keyed merge: the
          // subquery runs ONCE as the merge source and the join is the
          // file/Bloom-pruned equi-merge — never a driver-side
          // materialization of the id list. NOT EXISTS / NOT IN are the
          // NOT-MATCHED-BY-SOURCE clause (its residual gates that clause,
          // since those rows never join).
          val pp = prunePair(t, keys)
          GraftMergeCommand(t, src,
            mergeOn(keys, if (negated) None else residual),
            pp._1, pp._2,
            whenMatchedUpdate = None,
            whenMatchedDelete =
              if (negated) None else Some(Merge.MatchedDelete(None)),
            whenNotMatchedInsert = None,
            whenNotMatchedBySourceUpdate = None,
            whenNotMatchedBySourceDelete =
              if (negated) Some(Merge.NotMatchedBySourceDelete(residual))
              else None,
            schemaEvolution = false)
        case None => GraftDeleteCommand(t, bare(condition, tout))
      }

    case u @ UpdateTable(GraftTarget(t, tout), assignments, condition) if u.resolved =>
      condition.flatMap(inKeyRewrite(_, tout)) match {
        case Some((keys, src, residual, negated)) =>
          val set = assignments.map(a =>
            keyName(a.key) -> targetPref(a.value, tout)).toMap
          val pp = prunePair(t, keys)
          GraftMergeCommand(t, src,
            mergeOn(keys, if (negated) None else residual),
            pp._1, pp._2,
            whenMatchedUpdate =
              if (negated) None else Some(Merge.MatchedUpdate(None, set)),
            whenMatchedDelete = None,
            whenNotMatchedInsert = None,
            whenNotMatchedBySourceUpdate =
              if (negated) Some(Merge.NotMatchedBySourceUpdate(residual, set))
              else None,
            whenNotMatchedBySourceDelete = None,
            schemaEvolution = false)
        case None =>
          GraftUpdateCommand(t, condition.map(bare(_, tout)).getOrElse("TRUE"),
            assignments.map(a => keyName(a.key) -> bare(a.value, tout)).toMap)
      }

    case m @ MergeIntoTable(GraftTarget(t, tout), source, cond,
        matched, notMatched, nmbs, withSchemaEvolution) if m.resolved =>
      toMergeCommand(t, tout, source, cond, matched, notMatched, nmbs,
        withSchemaEvolution)

    case _ => plan
  }

  // ---- IN-subquery DELETE/UPDATE → keyed merge -----------------------------

  /** The merge source's projected key alias (collision-proof with user
    * columns by the dunder prefix the write funnel already reserves). */
  private val SubqueryKey = "__gk"

  private def mergeOn(keys: Seq[(String, String)], residual: Option[String]): String =
    keys.map { case (tk, sk) => s"source.`$sk` = target.${PredicateSql.quote(tk)}" }
      .mkString(" AND ") + residual.map(r => s" AND ($r)").getOrElse("")

  /** The (target column, source alias) pair the kernel prunes files/Blooms
    * on. The merge's ON evaluates the FULL key conjunction regardless, so
    * this choice affects only how much of the table the rewrite scans: the
    * first pair whose target column carries recorded min/max stats in the
    * head manifest wins (a stats-less column — beyond the stats cap, or an
    * unsupported type — can never skip a file), falling back to the
    * user-written first pair. Among several stats-backed keys the ordering
    * sensitivity remains (round-14 ADVICE): a low-selectivity first key
    * (e.g. a flag) prunes worse than a later high-distinctness one, and the
    * manifest records no distinctness to rank them by. */
  private def prunePair(t: VersionedTable,
      keys: Seq[(String, String)]): (String, String) = {
    val statsCols: Set[String] =
      try t.latestVersion() match {
        case Some(v) => t.statsOf(v).valuesIterator.flatMap(_.keysIterator).toSet
        case None => Set.empty
      } catch { case scala.util.control.NonFatal(_) => Set.empty }
    keys.find(k => statsCols.contains(k._1)).getOrElse(keys.head)
  }

  /** Subquery shapes of a DELETE/UPDATE condition that translate to the
    * kernel's keyed merge — ((target column, source alias) key pairs,
    * DISTINCT-projected source plan, residual SQL rendered with the merge
    * kernel's `target.` prefix, negated):
    *  - `col IN (<uncorrelated subquery>)`, single-column or tuple
    *    (`(a, b) IN (SELECT x, y ...)`) → matched clause over the
    *    multi-key equi-merge;
    *  - `EXISTS (... WHERE inner = outer [AND ...])` with one or MORE
    *    equi-correlations (composite-key compliance deletes) → the same
    *    semi shape, every correlation a merge-ON equality; the subquery's
    *    own residual conjuncts stay inside the source plan's filter;
    *  - `NOT EXISTS (same shape)` → the NOT-MATCHED-BY-SOURCE clause
    *    (negated = true) — clean NULL semantics: a NULL target key never
    *    equals, so it is not-matched and the verbs agree;
    *  - `col NOT IN (<uncorrelated single-column subquery>)` → the same
    *    NOT-MATCHED-BY-SOURCE clause, but ONLY when three-valued logic is
    *    statically off the table: the probe column must be non-nullable
    *    (a NULL probe row deletes under NOT IN exactly when the subquery
    *    is empty — runtime-dependent, no static clause expresses it) AND
    *    the subquery output must be provably non-nullable — by schema, or
    *    through an `IS NOT NULL` conjunct the user wrote in the subquery
    *    (one NULL in the list makes NOT IN delete nothing, which a merge
    *    cannot express). Nullable shapes refuse loudly with the rationale.
    * Plain conjuncts AND'ed next to the subquery become the merge residual.
    * Anything else — non-equi correlations, casts around the probe column,
    * several subqueries — returns None and the statement falls through to
    * the existing loud refusal, never a silently-wrong translation. */
  private def inKeyRewrite(condition: Expression, tout: Seq[Attribute])
      : Option[(Seq[(String, String)], LogicalPlan, Option[String], Boolean)] = {
    val tset = AttributeSet(tout)
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def hasSubquery(e: Expression): Boolean =
      e.find(_.isInstanceOf[SubqueryExpression]).isDefined
    val (subq, rest) = conjuncts(condition).partition(hasSubquery)
    def residualOf: Option[String] =
      if (rest.isEmpty) None
      else Some(rest.map(r => s"(${targetPref(r, tout)})").mkString(" AND "))
    def srcAlias(i: Int): String = if (i == 0) SubqueryKey else s"$SubqueryKey$i"
    // EXISTS source: strip projections above the correlated filter (EXISTS
    // only checks row existence), pull the equi-correlations out of the
    // filter, keep the subquery's own residual conjuncts inside it
    def existsSource(e: Exists): Option[(Seq[(String, String)], LogicalPlan)] = {
      if (e.outerAttrs.isEmpty ||
          !e.outerAttrs.forall { case x: AttributeReference => tset.contains(x)
                                 case _ => false }) return None
      if (e.joinCond.nonEmpty) return None
      def unwrapTop(p: LogicalPlan): LogicalPlan = p match {
        case Project(_, child) => unwrapTop(child)
        case other => other
      }
      unwrapTop(e.plan) match {
        case f: Filter =>
          val cs = conjuncts(f.condition)
          val (corr, keep) = cs.partition(
            _.find(_.isInstanceOf[OuterReference]).isDefined)
          // EVERY correlated conjunct must be inner-column = outer-column
          // (any other correlated shape refuses); N correlations feed the
          // merge's multi-column ON — the kernel prunes on [[prunePair]]'s
          // stats-preferred pair and the join evaluates the full conjunction
          val pairs: Seq[(Attribute, Attribute)] = corr.map {
            case EqualTo(i: AttributeReference, OuterReference(o: AttributeReference))
                if tset.contains(o) && f.child.outputSet.contains(i) => (o, i)
            case EqualTo(OuterReference(o: AttributeReference), i: AttributeReference)
                if tset.contains(o) && f.child.outputSet.contains(i) => (o, i)
            case _ => return None
          }
          if (pairs.isEmpty) return None
          val src0 =
            if (keep.isEmpty) f.child
            else Filter(keep.reduce(And(_, _)), f.child)
          val proj = pairs.zipWithIndex.map { case ((_, inner), i) =>
            Alias(inner, srcAlias(i))()
          }
          Some((pairs.zipWithIndex.map { case ((o, _), i) => (o.name, srcAlias(i)) },
            Distinct(Project(proj, src0))))
        case _ => None
      }
    }
    // provable non-nullability of a single-column subquery plan: either the
    // output attribute is non-nullable by schema, or an IS NOT NULL
    // conjunct on (the lineage of) the output column sits in a Filter on
    // the Project/Filter spine — the guard a careful compliance user writes
    def provedNonNull(p: LogicalPlan): Boolean = {
      def go(plan: LogicalPlan, e: Expression): Boolean = {
        if (!e.nullable) return true
        plan match {
          case Project(pl, child) => e match {
            case a: Attribute =>
              pl.collectFirst {
                case al: Alias if al.exprId == a.exprId => al.child
                case at: AttributeReference if at.exprId == a.exprId => at
              } match {
                case Some(e2) => go(child, e2)
                case None => false
              }
            case other => go(child, other)
          }
          case f: Filter =>
            conjuncts(f.condition).exists {
              case IsNotNull(x) => x.semanticEquals(e)
              case _ => false
            } || go(f.child, e)
          case s: SubqueryAlias => go(s.child, e)
          case v: View => go(v.child, e)
          case d: Distinct => go(d.child, e)
          case _ => false
        }
      }
      go(p, p.output.head)
    }
    subq match {
      // single- OR multi-column IN: `(a, b) IN (SELECT x, y ...)` is TRUE
      // exactly when some list row equals the tuple component-wise, which
      // is exactly the multi-key equi-merge's matched set (a NULL
      // component never equals → not matched → untouched, agreeing with
      // IN's 3VL where a NULL-component tuple is never TRUE)
      case Seq(InSubquery(vals, l: ListQuery))
          if vals.nonEmpty && l.outerAttrs.isEmpty &&
            l.plan.output.size == vals.size &&
            vals.forall {
              case a: AttributeReference => tset.contains(a)
              case _ => false
            } =>
        val attrs = vals.map(_.asInstanceOf[AttributeReference])
        val src = Distinct(Project(
          l.plan.output.zipWithIndex.map { case (o, i) =>
            Alias(o, srcAlias(i))()
          }, l.plan))
        Some((attrs.zipWithIndex.map { case (a, i) => (a.name, srcAlias(i)) },
          src, residualOf, false))
      case Seq(Not(InSubquery(Seq(a: AttributeReference), l: ListQuery)))
          if tset.contains(a) && l.outerAttrs.isEmpty &&
            l.plan.output.size == 1 =>
        if (a.nullable) throw new UnsupportedOperationException(
          s"NOT IN translates to a merge only when the probe column is " +
            s"non-nullable: `${a.name}` is nullable, and a NULL probe row " +
            "deletes under NOT IN exactly when the subquery is empty — a " +
            "runtime-dependent outcome no static merge clause expresses")
        if (!provedNonNull(l.plan)) throw new UnsupportedOperationException(
          "NOT IN translates to a merge only when the subquery output is " +
            "provably non-nullable (by schema, or an explicit IS NOT NULL " +
            "in the subquery): one NULL in the list makes NOT IN match " +
            "nothing, which no merge clause expresses")
        val out = l.plan.output.head
        // the IS NOT NULL filter is a no-op by the proof above; it keeps
        // the physical source honest if stats ever disagree with schema
        val src = Distinct(Project(Seq(Alias(out, SubqueryKey)()),
          Filter(IsNotNull(out), l.plan)))
        Some((Seq((a.name, SubqueryKey)), src, residualOf, true))
      case Seq(e: Exists) =>
        existsSource(e).map { case (keys, src) => (keys, src, residualOf, false) }
      case Seq(Not(e: Exists)) =>
        existsSource(e).map { case (keys, src) => (keys, src, residualOf, true) }
      case _ => None
    }
  }

  /** Render over the TARGET frame with the merge kernel's `target.` prefix
    * (the residual conjuncts and UPDATE SET values of a subquery rewrite
    * evaluate in the merge's joined frame, where bare names are ambiguous). */
  private def targetPref(e: Expression, tout: Seq[Attribute]): String = {
    val tset = AttributeSet(tout)
    rendered(e, a =>
      if (tset.contains(a)) Seq("target", a.name)
      else throw new UnsupportedOperationException(
        s"reference ${a.name} is not a column of the target table"))
  }

  // ---- expression → kernel SQL rendering ----------------------------------

  private def rendered(e: Expression, name: AttributeReference => Seq[String]): String = {
    e.foreach {
      case s: SubqueryExpression => throw new UnsupportedOperationException(
        s"graft row-level statements do not support subqueries in conditions: ${s.sql}")
      case _ => ()
    }
    e.transform {
      case a: AttributeReference => SqlIdent(name(a), a.dataType, a.nullable)
    }.sql
  }

  /** Render against the TARGET frame alone (UPDATE/DELETE): bare names. */
  private def bare(e: Expression, tout: Seq[Attribute]): String = {
    val tset = AttributeSet(tout)
    rendered(e, a =>
      if (tset.contains(a)) Seq(a.name)
      else throw new UnsupportedOperationException(
        s"reference ${a.name} is not a column of the target table"))
  }

  private def keyName(key: Expression): String = key match {
    case a: AttributeReference => a.name
    case other => throw new UnsupportedOperationException(
      s"graft UPDATE/MERGE SET supports top-level columns only, got ${other.sql}")
  }

  // ---- MERGE --------------------------------------------------------------

  private def toMergeCommand(t: VersionedTable, tout: Seq[Attribute],
      source: LogicalPlan, cond: Expression,
      matched: Seq[MergeAction], notMatched: Seq[MergeAction],
      nmbs: Seq[MergeAction], withSchemaEvolution: Boolean): LogicalPlan = {
    val tset = AttributeSet(tout)
    val sset = AttributeSet(source.output)
    // star-expansion name matching follows the session's resolution rules
    // (case-insensitive unless spark.sql.caseSensitive), keyed to the
    // TARGET column's recorded name
    val caseSensitive = session.sessionState.conf.caseSensitiveAnalysis
    def sourceColFor(targetName: String): Option[String] =
      if (caseSensitive) source.output.map(_.name).find(_ == targetName)
      else source.output.map(_.name).find(_.equalsIgnoreCase(targetName))
    def pref(e: Expression): String = rendered(e, a =>
      if (tset.contains(a)) Seq("target", a.name)
      else if (sset.contains(a)) Seq("source", a.name)
      else throw new UnsupportedOperationException(
        s"reference ${a.name} resolves to neither the merge target nor its source"))

    // SQL clause order is first-match-wins; the kernel hard-codes
    // update-before-delete precedence. The two reconcile by weakening a
    // LATER update with the negation of every EARLIER delete's condition:
    //   [DELETE d, UPDATE u]  →  upd = u ∧ ¬d, del = d   (kernel: del wins
    //   whenever d holds — exactly SQL's order)
    // An earlier unconditional DELETE makes the update unreachable (¬TRUE).
    def fold(actions: Seq[MergeAction], family: String)
        : (Option[(Option[String], Map[String, String])], Option[Option[String]]) = {
      var upd: Option[(Option[String], Map[String, String])] = None
      var del: Option[Option[String]] = None
      var earlierDeletes: Seq[String] = Nil
      // Weaken null-safely: a NULL earlier-delete condition must not veto
      // the update (SQL 3VL would turn the whole conjunction NULL, which
      // Merge.cond coalesces to false). `IS NOT TRUE` keeps NULL → true.
      def effective(own: Option[String]): Option[String] = {
        val parts = own.map(c => s"($c)").toSeq ++
          earlierDeletes.map(c => s"(($c) IS NOT TRUE)")
        if (parts.isEmpty) None else Some(parts.mkString(" AND "))
      }
      actions.foreach {
        case UpdateAction(c, assignments, _) =>
          require(upd.isEmpty,
            s"graft MERGE supports at most one $family UPDATE clause")
          upd = Some((effective(c.map(pref)),
            assignments.map(a => keyName(a.key) -> pref(a.value)).toMap))
        case UpdateStarAction(c) =>
          require(upd.isEmpty,
            s"graft MERGE supports at most one $family UPDATE clause")
          upd = Some((effective(c.map(pref)),
            tout.map(_.name).flatMap(n => sourceColFor(n)
              .map(sn => n -> s"source.${PredicateSql.quote(sn)}")).toMap))
        case DeleteAction(c) =>
          require(del.isEmpty,
            s"graft MERGE supports at most one $family DELETE clause")
          del = Some(c.map(pref))
          earlierDeletes ++= Seq(c.map(pref).getOrElse("TRUE"))
        case other => throw new UnsupportedOperationException(
          s"unsupported $family clause: $other")
      }
      (upd, del)
    }

    val (mUpd, mDel) = fold(matched, "WHEN MATCHED")
    val (nmsUpd, nmsDel) = fold(nmbs, "WHEN NOT MATCHED BY SOURCE")

    val insert: Option[Merge.NotMatchedInsert] = notMatched match {
      case Nil => None
      case Seq(InsertAction(c, assignments)) =>
        Some(Merge.NotMatchedInsert(c.map(pref),
          assignments.map(a => keyName(a.key) -> pref(a.value)).toMap))
      case Seq(InsertStarAction(c)) =>
        Some(Merge.NotMatchedInsert(c.map(pref), Map.empty))
      case other => throw new UnsupportedOperationException(
        s"graft MERGE supports at most one WHEN NOT MATCHED INSERT clause, got $other")
    }

    // the file-pruning equi key: a bare target.col = source.col conjunct.
    // The analyzer inserts implicit casts when the key types differ (e.g. a
    // VALUES source yields INT against a BIGINT target) — an UP-cast
    // preserves equality, so strip it for key extraction; the full ON
    // condition (cast included) is still what the join evaluates.
    def conjuncts(e: Expression): Seq[Expression] = e match {
      case And(l, r) => conjuncts(l) ++ conjuncts(r)
      case x => Seq(x)
    }
    def stripUpCast(e: Expression): Expression = e match {
      case c: Cast if Cast.canUpCast(c.child.dataType, c.dataType) =>
        stripUpCast(c.child)
      case other => other
    }
    val keys = conjuncts(cond).map {
      case EqualTo(l, r) => EqualTo(stripUpCast(l), stripUpCast(r))
      case other => other
    }.collectFirst {
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if tset.contains(a) && sset.contains(b) => (a.name, b.name)
      case EqualTo(a: AttributeReference, b: AttributeReference)
          if sset.contains(a) && tset.contains(b) => (b.name, a.name)
    }.getOrElse(throw new UnsupportedOperationException(
      "graft MERGE requires a top-level equality conjunct between a target " +
        s"column and a source column in the ON condition (file pruning), got: ${cond.sql}"))

    GraftMergeCommand(t, source, pref(cond), keys._1, keys._2,
      mUpd.map { case (c, vs) => Merge.MatchedUpdate(c, vs) },
      mDel.map(Merge.MatchedDelete(_)),
      insert,
      nmsUpd.map { case (c, vs) => Merge.NotMatchedBySourceUpdate(c, vs) },
      nmsDel.map(Merge.NotMatchedBySourceDelete(_)),
      schemaEvolution = withSchemaEvolution)
  }
}

/** `DELETE FROM <graft table> WHERE <any condition>` — COW rewrite or MOR
  * deletion vectors per the `enableDeletionVectors` table property. */
case class GraftDeleteCommand(table: VersionedTable, condition: String)
    extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    if (table.properties.get("enableDeletionVectors").contains("true"))
      table.deleteMor(spark, condition)
    else table.delete(spark, condition)
    Seq.empty
  }
}

/** `UPDATE <graft table> SET ... WHERE ...` — COW rewrite of the touched
  * files only (the kernel's predicate-pushed touched-file detection). */
case class GraftUpdateCommand(table: VersionedTable, condition: String,
    set: Map[String, String]) extends LeafRunnableCommand {
  override def run(spark: SparkSession): Seq[Row] = {
    table.update(spark, condition, set)
    Seq.empty
  }
}

/** `MERGE INTO <graft table> USING <source> ON ...` — the file-pruned
  * COW/MOR merge kernel (`enableDeletionVectors` picks MOR), full Delta
  * clause semantics including NOT MATCHED BY SOURCE. The analyzed source
  * plan re-enters execution via [[PlanShim.ofRows]] — it is optimized and
  * executed exactly once, inside the merge's own join. */
case class GraftMergeCommand(table: VersionedTable, source: LogicalPlan,
    condition: String, targetKey: String, sourceKey: String,
    whenMatchedUpdate: Option[Merge.MatchedUpdate],
    whenMatchedDelete: Option[Merge.MatchedDelete],
    whenNotMatchedInsert: Option[Merge.NotMatchedInsert],
    whenNotMatchedBySourceUpdate: Option[Merge.NotMatchedBySourceUpdate],
    whenNotMatchedBySourceDelete: Option[Merge.NotMatchedBySourceDelete],
    schemaEvolution: Boolean) extends LeafRunnableCommand {
  override def innerChildren: Seq[LogicalPlan] = Seq(source)
  override def run(spark: SparkSession): Seq[Row] = {
    val src = PlanShim.ofRows(spark, source)
    if (table.properties.get("enableDeletionVectors").contains("true"))
      table.mergeMor(spark, src, condition, targetKey, sourceKey,
        whenMatchedUpdate, whenMatchedDelete, whenNotMatchedInsert,
        whenNotMatchedBySourceUpdate, whenNotMatchedBySourceDelete,
        schemaEvolution = schemaEvolution)
    else
      table.mergeCow(spark, src, condition, targetKey, sourceKey,
        whenMatchedUpdate, whenMatchedDelete, whenNotMatchedInsert,
        whenNotMatchedBySourceUpdate, whenNotMatchedBySourceDelete,
        schemaEvolution = schemaEvolution)
    Seq.empty
  }
}
