package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally maintained materialized aggregate over an append-only
  * [[VersionedTable]] — the "pre-aggregated view" a reporting/serving layer
  * keeps next to a raw 100 TB fact table.
  *
  * The view is `SELECT keys, count(*) AS n, sum(expr) AS name... GROUP BY
  * keys`, itself stored as a VersionedTable. `refresh()` reads ONLY the
  * changes since the last refresh — the write-time change feed
  * ([[VersionedTable.changeFeed]]): appends arrive as their fresh files,
  * deletes/updates/merges as the cdf/ batches their writers persisted —
  * partially aggregates them SIGNED (inserts +, deletes −), and folds the
  * partials into the view: cost O(changes + |groups|) per refresh, never
  * O(base table), through ANY mix of appends and rewrites. A group whose
  * row count folds to zero leaves the view. Count/sum are the associative,
  * invertible aggregates this signed folding is exact for; callers needing
  * avg derive it as s/n at read time; min/max are NOT invertible and do not
  * belong here. Exactness across refresh schedules relies on the caller
  * summing decimal-cast expressions (see queries/Q.scala). Only an
  * overwrite/restore base commit (no write-time capture possible) degrades
  * the delta to that step's snapshot re-diff — still correct, just not
  * O(changes) for that one step.
  *
  * The base-table high-water mark rides the view's own commit as an
  * idempotent-writer txn stamp (`matview:<base>` → base version), so the
  * refresh cursor survives view compaction/vacuum and a replayed refresh of
  * the same base version is a no-op rather than a double-count — the same
  * exactly-once protocol the streaming sink uses.
  *
  * At 1000-executor scale the fold is a shuffle of |groups| + |delta groups|
  * rows on the group key — the view table stays small relative to the base;
  * a view whose key cardinality approaches the base row count is not a
  * useful materialization and should be a plain query instead.
  */
final class MaterializedAgg(
    val base: VersionedTable,
    val root: String,
    keys: Seq[String],
    sums: Seq[(String, String)]) {
  require(keys.nonEmpty, "materialized aggregate needs at least one group key")

  private val view = VersionedTable(root)
  private def appId = s"matview:${base.root}"

  /** The view's base-table cursor: the base version the last refresh folded. */
  def lastBaseVersion: Option[Long] = view.lastTxn(appId)

  /** Fold appended-since-last-refresh base rows into the view. Returns the
    * base version now reflected. No-op (no commit) when already current.
    *
    * Every read AND the publish are pinned to the ONE view head captured up
    * front: a refresh is a read-modify-write whose output depends on the
    * view state it read, so a concurrent refresh (or any other view writer)
    * landing in between raises [[ConcurrentCommitException]] — re-run on
    * the new head — instead of silently double-folding the delta (the
    * cursor and the view content would otherwise be read at two different
    * instants and could disagree). The base side is pinned the same way:
    * delta = appends in (cursor, baseV], never "whatever the head is now". */
  def refresh(spark: SparkSession): Long = {
    val baseV = base.resolve()
    val viewHead = view.latestVersion()
    val cursor = lastBaseVersion
    if (cursor.contains(baseV)) return baseV // already current: no new version
    // the sign column rides the delta frame under the feed's column name —
    // a base column with that name would be silently clobbered
    base.schemaOf(baseV).foreach(s => require(!s.fieldNames.contains("_change_type"),
      s"base table ${base.root} has a _change_type column, which the change " +
        "feed reserves"))
    // signed delta: +row for an insert, −row for a delete (an update is its
    // delete+insert pair, so only its NET effect folds in)
    val delta = cursor match {
      case None => base.read(spark, versionAsOf = Some(baseV))
        .withColumn("_change_type", lit("insert")) // first refresh: full load
      case Some(v) => base.changeFeed(spark, v, baseV).drop("_commit_version")
    }
    val isInsert = col("_change_type") === "insert"
    val aggCols = sum(when(isInsert, 1L).otherwise(-1L)).as("n") +:
      sums.map { case (nm, e) =>
        sum(when(isInsert, expr(e)).otherwise(-expr(e))).as(nm) }
    val partial = delta.groupBy(keys.map(col): _*).agg(aggCols.head, aggCols.tail: _*)
    val folded0 = (cursor, viewHead) match {
      case (None, _) | (_, None) => partial
      case (Some(_), Some(hv)) =>
        val reAgg = sum(col("n")).as("n") +: sums.map { case (nm, _) => sum(col(nm)).as(nm) }
        view.read(spark, versionAsOf = Some(hv)).unionByName(partial)
          .groupBy(keys.map(col): _*).agg(reAgg.head, reAgg.tail: _*)
    }
    // a fully-deleted group folds to n=0 (its sums cancel exactly — the
    // change feed is bag-balanced): it must LEAVE the view, not linger as a
    // zero row the one-shot aggregate would never produce
    val folded = folded0.filter(col("n") =!= 0L)
    view.commitPinnedAt(folded, viewHead, txn = Some(appId -> baseV))
    baseV
  }

  def read(spark: SparkSession): DataFrame = view.read(spark)
}
