package graft.catalog

import graft.table.VersionedTable
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Delta's `table_changes` SQL spelling for the change feed — the
  * table-valued function a CDC consumer queries with plain SQL instead of
  * the Scala [[VersionedTable.changeFeed]] API:
  *
  * {{{
  *   SELECT * FROM table_changes('/path/to/t', 2)        -- commits 2..head
  *   SELECT * FROM table_changes('/path/to/t', 0, 4)     -- commits 0..4
  *   SELECT * FROM table_changes('graft.default.t', 1, 3)
  * }}}
  *
  * Version bounds are INCLUSIVE on both ends, Delta's convention (the
  * Scala API's `(from, to]` convention is documented there); `startVersion
  * = 0` includes the initial commit's rows as inserts — commit 0's change
  * set IS what it wrote. Rows carry the feed's `_change_type`
  * (insert/delete; updates are delete+insert pairs) and `_commit_version`.
  * The table argument is a quoted path when it contains '/', else a dotted
  * identifier whose head must name a registered [[GraftCatalog]] — the
  * same addressing rule as the SQL maintenance verbs. All arguments must
  * be literals (the plan is built at analysis time). Serving cost is the
  * feed's own: write-time-captured versions read their capture files,
  * appends read their fresh files, uncaptured rewrites fall back to the
  * snapshot re-diff — correct either way. */
object TableChanges {

  val Name = "table_changes"

  def builder(exprs: Seq[Expression]): LogicalPlan = {
    def value(e: Expression, what: String): Any = {
      require(e.foldable, s"$Name: $what must be a literal")
      e.eval()
    }
    def str(e: Expression, what: String): String = value(e, what) match {
      case u: org.apache.spark.unsafe.types.UTF8String => u.toString
      case s: String => s
      case other => throw new IllegalArgumentException(
        s"$Name: $what must be a string literal, got $other")
    }
    def long(e: Expression, what: String): Long = value(e, what) match {
      case n: java.lang.Number => n.longValue()
      case other => throw new IllegalArgumentException(
        s"$Name: $what must be an integer literal, got $other")
    }
    exprs match {
      case Seq(t, f) =>
        plan(str(t, "table"), long(f, "startVersion"), None)
      case Seq(t, f, u) =>
        plan(str(t, "table"), long(f, "startVersion"),
          Some(long(u, "endVersion")))
      case other => throw new IllegalArgumentException(
        s"$Name expects (table, startVersion[, endVersion]), got " +
          s"${other.size} arguments")
    }
  }

  private def resolvePath(spark: SparkSession, name: String): String =
    if (name.contains('/')) name
    else {
      val parts = name.split('.').toSeq
      scala.util.Try(spark.sessionState.catalogManager.catalog(parts.head))
        .toOption
        .collect { case g: GraftCatalog =>
          g.pathOf(org.apache.spark.sql.connector.catalog.Identifier.of(
            parts.slice(1, parts.length - 1).toArray, parts.last))
        }
        .getOrElse(throw new IllegalArgumentException(
          s"$Name: '$name' does not name a graft-catalog table — address " +
            "tables as <catalog>.[<namespace>.]<table> or pass a filesystem path"))
    }

  private def plan(name: String, start: Long,
      endOpt: Option[Long]): LogicalPlan = {
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val t = VersionedTable(resolvePath(spark, name))
    val end = endOpt.getOrElse(t.resolve())
    require(start >= 0 && end >= start,
      s"$Name: invalid version range [$start, $end]")
    // inclusive bounds over the exclusive-start Scala feed: [start, end] =
    // (start-1, end], plus the initial commit's rows as inserts when
    // start = 0 (there is no version -1 to diff against). The (start-1)
    // anchor means the feed needs one version OLDER than the requested
    // range to still be retained; when vacuum has dropped it, rethrow in
    // the TVF's own vocabulary — the raw changeFeed error names version
    // start-1, which the user never asked for (round-14 ADVICE).
    def feedOr(from: Long, to: Long): org.apache.spark.sql.DataFrame =
      try t.changeFeed(spark, from, to)
      catch {
        case e: IllegalArgumentException
            if e.getMessage != null && e.getMessage.contains("retained") =>
          throw new IllegalArgumentException(
            s"$Name('$name', $start, $end): computing changes at version " +
              s"$start requires diffing from version ${start - 1}, which " +
              "is no longer retained (vacuumed) — re-request from a " +
              "retained start version, or rebuild downstream state from a " +
              "full snapshot read", e)
      }
    val feed =
      if (start == 0) {
        val v0 = t.read(spark, versionAsOf = Some(0L))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(0L))
        if (end == 0) v0
        else v0.unionByName(feedOr(0L, end), allowMissingColumns = true)
      } else feedOr(start - 1, end)
    feed.queryExecution.analyzed
  }
}
