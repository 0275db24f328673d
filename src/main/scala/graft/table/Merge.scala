package graft.table

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join-based `MERGE INTO` kernel with Delta-style clause semantics.
  *
  * Reproduces the reference's `DeltaLakeMergeLoad`
  * (`example/notebook/scd2-job.ipynb:338-353`): a join `condition` over aliases
  * `source`/`target` (`:344` `source.mergeKey = target.id`), an optional
  * matched-UPDATE clause with an extra condition and per-column SET expressions
  * (`:345-350`), an optional matched-DELETE, and a not-matched-by-target INSERT
  * whose empty value map means "INSERT * by column name" (`:353` `{}`).
  *
  * Physical shape: one full-outer equi-join (Catalyst plans broadcast-hash or
  * sort-merge on the equi part of `condition`; residual predicates stay on the
  * join) followed by per-row column rewriting — all expressions, fully
  * whole-stage-codegen'd, no driver-side row handling. At 100 TB the cost is
  * exactly one shuffle of each side on the merge key (or zero for the target if
  * the versioned table is written bucket-partitioned by key and re-read with
  * the same partitioning), which matches Delta's own join-based merge plan.
  * NULL source merge keys never equi-match, so the reference's dual-row SCD2
  * staging trick (`scd2-job.ipynb:298,309-319` — `NULL AS mergeKey` forcing an
  * INSERT) works unchanged.
  *
  * Row accounting (exactly-once per input row):
  *   - matched ∧ updateCond          → updated target row
  *   - matched ∧ deleteCond          → dropped
  *   - matched ∧ neither             → unchanged target row
  *   - source-only ∧ insert clause   → inserted row
  *   - source-only ∧ no insert       → dropped
  *   - target-only ∧ bySourceUpdate  → updated target row (Delta's
  *     WHEN NOT MATCHED BY SOURCE UPDATE)
  *   - target-only ∧ bySourceDelete  → dropped
  *   - target-only ∧ neither         → unchanged target row
  */
object Merge {

  final case class MatchedUpdate(condition: Option[String], values: Map[String, String])
  final case class MatchedDelete(condition: Option[String])
  /** Empty `values` = INSERT * (source columns mapped to target columns by name). */
  final case class NotMatchedInsert(condition: Option[String], values: Map[String, String])
  /** Delta-parity WHEN NOT MATCHED BY SOURCE clauses: act on target rows with
    * no source match (only `target.` references are valid in conditions). */
  final case class NotMatchedBySourceUpdate(condition: Option[String], values: Map[String, String])
  final case class NotMatchedBySourceDelete(condition: Option[String])

  /** With `emitChanges`, the output additionally carries two hidden columns
    * and KEEPS deleted target rows (marked) instead of dropping them:
    *  - `__change_kind`: 'update' / 'delete' / 'insert', null for rows the
    *    merge left untouched;
    *  - `__pre`: the target row's PREIMAGE as a struct (null for inserts).
    * This is the single-pass change capture a write-time CDF needs — the
    * caller splits result rows from change rows with two filters over the
    * SAME join, instead of re-deriving changes with bag-diff shuffles. */
  def merge(
      target: DataFrame,
      source: DataFrame,
      condition: String,
      whenMatchedUpdate: Option[MatchedUpdate] = None,
      whenMatchedDelete: Option[MatchedDelete] = None,
      whenNotMatchedInsert: Option[NotMatchedInsert] = None,
      whenNotMatchedBySourceUpdate: Option[NotMatchedBySourceUpdate] = None,
      whenNotMatchedBySourceDelete: Option[NotMatchedBySourceDelete] = None,
      validateCardinality: Boolean = true,
      emitChanges: Boolean = false): DataFrame = {

    val targetCols = target.columns.toSeq
    val sourceCols = source.columns.toSet

    // presence markers survive the outer join where data columns may be
    // legitimately null; the marker being null means "no row on that side"
    // (__t_id identifies target rows for the cardinality check)
    val t = target.withColumn("__t_present", lit(true))
      .withColumn("__t_id", monotonically_increasing_id()).alias("target")
    val s = source.withColumn("__s_present", lit(true))
      .withColumn("__s_id", monotonically_increasing_id()).alias("source")
    val joined = t.join(s, expr(condition), "full_outer")

    val matched = col("target.__t_present").isNotNull && col("source.__s_present").isNotNull
    val sourceOnly = col("target.__t_present").isNull && col("source.__s_present").isNotNull
    val targetOnly = col("source.__s_present").isNull

    // SQL three-valued logic: a clause condition evaluating to NULL means the
    // clause does NOT apply (the row is kept unchanged, not dropped) — so
    // every user condition is coalesced to false before combining
    def cond(c: Option[String]): Column =
      c.map(x => coalesce(expr(x), lit(false))).getOrElse(lit(true))

    val updCond = whenMatchedUpdate.map(u => matched && cond(u.condition))
    val delCond = whenMatchedDelete.map(d =>
      matched && cond(d.condition) &&
        updCond.map(!_).getOrElse(lit(true))) // update clause takes precedence
    val insCond = whenNotMatchedInsert.map(i => sourceOnly && cond(i.condition))
    val nmsUpdCond = whenNotMatchedBySourceUpdate.map(u => targetOnly && cond(u.condition))
    val nmsDelCond = whenNotMatchedBySourceDelete.map(d =>
      targetOnly && cond(d.condition) &&
        nmsUpdCond.map(!_).getOrElse(lit(true))) // update precedence, as matched side

    // rows that survive the merge
    val keep =
      (matched && delCond.map(!_).getOrElse(lit(true))) ||
        insCond.getOrElse(lit(false)) ||
        (targetOnly && nmsDelCond.map(!_).getOrElse(lit(true)))

    // change accounting (emitChanges): which clause actually fired on a row.
    // Deleted rows additionally survive the filter below, marked, so the
    // caller can capture their preimages from the same join execution.
    val isDelete = Seq(delCond, nmsDelCond).flatten.reduceOption(_ || _).getOrElse(lit(false))
    val changeKind = {
      val upd = Seq(updCond, nmsUpdCond).flatten.reduceOption(_ || _).getOrElse(lit(false))
      when(isDelete, lit("delete"))
        .when(upd, lit("update"))
        .when(insCond.getOrElse(lit(false)), lit("insert"))
        .otherwise(lit(null).cast("string"))
    }
    val preimage = when(col("target.__t_present").isNotNull,
      struct(targetCols.map(c => col(s"target.$c").as(c)): _*))
    val retain = if (emitChanges) keep || isDelete else keep

    val outCols = targetCols.map { c =>
      val base = col(s"target.$c")
      val updated = whenMatchedUpdate match {
        case Some(u) =>
          val v = u.values.get(c).map(expr).getOrElse(base)
          when(updCond.get, v).otherwise(base)
        case None => base
      }
      val nmsUpdated = whenNotMatchedBySourceUpdate match {
        case Some(u) =>
          val v = u.values.get(c).map(expr).getOrElse(base)
          when(nmsUpdCond.get, v).otherwise(updated)
        case None => updated
      }
      val inserted = whenNotMatchedInsert match {
        case Some(i) =>
          val v = i.values.get(c).map(expr).orElse(
            if (i.values.isEmpty && sourceCols.contains(c)) Some(col(s"source.$c")) else None)
          v.map(ic => when(sourceOnly, ic).otherwise(nmsUpdated)).getOrElse(nmsUpdated)
        case None => nmsUpdated
      }
      inserted.as(c)
    }

    // Delta-parity multi-match handling, folded into the ONE join execution
    // (no second pass): a target row matched by several source rows is
    //   - an ERROR only if MORE THAN ONE of those matches would actually
    //     modify it (its update/delete clause condition holds — Delta's
    //     "multiple source rows matched and attempted to modify" semantics);
    //   - otherwise resolved to a single output row (the modifying match if
    //     there is one, else one unchanged copy).
    // Mechanism: a window keyed by row identity — (true, __t_id) for
    // target-backed rows, (false, __s_id) for inserts, so source-only rows
    // get singleton partitions instead of one giant NULL-key partition —
    // counting modifying matches and ranking the modifying copy first. The
    // cardinality check rides the same window as a raise_error conjunct, so
    // the whole merge stays a single join → window → filter plan: one
    // shuffle on the merge key + one on row identity, versus the doubled
    // join the old driver-side guard executed.
    val matchedClauses = whenMatchedUpdate.isDefined || whenMatchedDelete.isDefined
    val kept =
      if (matchedClauses && validateCardinality) {
        import org.apache.spark.sql.expressions.Window
        val modifying = Seq(updCond, delCond).flatten.reduce(_ || _)
        val rowKey = when(col("target.__t_present").isNotNull,
          struct(lit(true).as("tgt"), col("target.__t_id").as("rid")))
          .otherwise(struct(lit(false).as("tgt"), col("source.__s_id").as("rid")))
        val w = Window.partitionBy(col("__row_key"))
        val wOrd = w.orderBy(col("__mod").desc, col("source.__s_id").asc_nulls_last)
        joined
          .withColumn("__row_key", rowKey)
          .withColumn("__mod", modifying.cast("int"))
          .withColumn("__nmod", sum(col("__mod")).over(w))
          .withColumn("__rn", row_number().over(wOrd))
          .filter(
            (col("__nmod") <= 1 ||
              raise_error(lit("MERGE cardinality violation: multiple source rows " +
                "attempted to modify the same target row")).cast("boolean"))
              && col("__rn") === 1 && retain)
      } else if (whenMatchedUpdate.isEmpty && whenMatchedDelete.isEmpty) {
        // Insert-only / no-matched-clause merges: a multiply-matched target
        // row still appears exactly once (its emitted copies are
        // bit-identical — output = target columns only), so a hash
        // dropDuplicates on row identity suffices; inserts (null __t_id)
        // are keyed by their source row id.
        joined.filter(retain)
      } else joined.filter(retain) // validateCardinality=false escape hatch: raw join semantics
    val marker =
      if (emitChanges) Seq(changeKind.as("__change_kind"), preimage.as("__pre"))
      else Nil
    val result =
      if (whenMatchedUpdate.isEmpty && whenMatchedDelete.isEmpty) {
        kept.select(outCols ++ marker :+ col("target.__t_id").as("__t_id")
          :+ when(col("target.__t_id").isNull, col("source.__s_id")).as("__row_key"): _*)
          .dropDuplicates("__t_id", "__row_key")
          .drop("__t_id", "__row_key")
      } else kept.select(outCols ++ marker: _*)
    result
  }
}
