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
  *   SELECT * FROM table_changes('graft.default.t', '2026-08-16 12:00:00')
  * }}}
  *
  * A STRING bound is a TIMESTAMP (Delta's startingTimestamp /
  * endingTimestamp forms; version and timestamp bounds mix freely): a
  * start timestamp means the FIRST commit at or after it — one past the
  * head refuses, there are no changes to serve yet — and an end timestamp
  * means the LAST commit at or before it. Parsed in the session zone via
  * Spark's own cast.
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
    // a STRING / TIMESTAMP / DATE bound is a timestamp (Delta's
    // startingTimestamp / endingTimestamp forms); an INTEGER bound is a
    // version. Typed temporal literals must NOT fall through to the
    // version arm — a TIMESTAMP literal evals to epoch-MICROS, which would
    // silently read as a nonsense huge version number.
    def bound(e: Expression, what: String, start: Boolean)
        (implicit t: VersionedTable): Long = e.dataType match {
      case org.apache.spark.sql.types.StringType =>
        tsVersion(t, str(e, what), start)
      case org.apache.spark.sql.types.TimestampType =>
        tsVersionMs(t, long(e, what) / 1000L, s"$what (timestamp)", start)
      case org.apache.spark.sql.types.DateType =>
        // DATE literal = days since epoch; the bound is the session-zone
        // midnight of that date (what a DATE means in the session's queries)
        tsVersionMs(t, java.time.LocalDate.ofEpochDay(long(e, what))
          .atStartOfDay(java.time.ZoneId.of(SparkSession.active
            .sessionState.conf.sessionLocalTimeZone))
          .toInstant.toEpochMilli, s"$what (date)", start)
      case org.apache.spark.sql.types.ByteType | org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.IntegerType | org.apache.spark.sql.types.LongType =>
        long(e, what)
      case other => throw new IllegalArgumentException(
        s"$Name: $what must be an integer version or a string/timestamp/" +
          s"date bound, got ${other.sql}")
    }
    exprs match {
      case Seq(t, f) =>
        implicit val vt: VersionedTable = resolved(t, str(t, "table"))
        plan(vt, bound(f, "start", start = true), None)
      case Seq(t, f, u) =>
        implicit val vt: VersionedTable = resolved(t, str(t, "table"))
        plan(vt, bound(f, "start", start = true),
          Some(bound(u, "end", start = false)))
      case other => throw new IllegalArgumentException(
        s"$Name expects (table, start[, end]) with version or timestamp " +
          s"bounds, got ${other.size} arguments")
    }
  }

  private def resolved(e: Expression, name: String): VersionedTable =
    VersionedTable(resolvePath(SparkSession.active, name))

  /** Timestamp bound → version, Delta's conventions: a START timestamp
    * means "the FIRST commit at or after it" (a timestamp past the head
    * refuses — there are no changes to serve yet), an END timestamp means
    * "the LAST commit at or before it". Parsed in the session zone via
    * Spark's own cast, so `'2026-08-16 12:00:00'` means what a query's
    * TIMESTAMP literal means. */
  private def tsVersion(t: VersionedTable, ts: String, start: Boolean): Long = {
    val spark = SparkSession.active
    val micros = org.apache.spark.sql.catalyst.expressions.Cast(
      org.apache.spark.sql.catalyst.expressions.Literal(
        org.apache.spark.unsafe.types.UTF8String.fromString(ts),
        org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.TimestampType,
      Some(spark.sessionState.conf.sessionLocalTimeZone)).eval()
    require(micros != null,
      s"$Name: '$ts' does not parse as a timestamp")
    tsVersionMs(t, micros.asInstanceOf[Long] / 1000L, s"'$ts'", start)
  }

  private def tsVersionMs(t: VersionedTable, ms: Long, label: String,
      start: Boolean): Long =
    if (start) {
      val vs = t.versions()
      require(vs.nonEmpty, s"$Name: no committed version at ${t.root}")
      vs.find(v => t.commitTimeOf(v) >= ms).getOrElse(
        throw new IllegalArgumentException(
          s"$Name: start bound $label is after the latest commit of " +
            s"${t.root} — no changes at or after it yet"))
    } else t.resolveAsOfTimestamp(ms)

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

  private def plan(t: VersionedTable, start: Long,
      endOpt: Option[Long]): LogicalPlan = {
    import org.apache.spark.sql.functions.lit
    val spark = SparkSession.active
    val name = t.root
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
