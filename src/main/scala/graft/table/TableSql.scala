package graft.table

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Maintenance-DDL surface for [[VersionedTable]] — the Delta-SQL verbs a
  * reference user drives their lake with (`scd2-job.ipynb` runs its table
  * maintenance through SQL stages), mapped onto the table API:
  *
  * {{{
  *   OPTIMIZE '<path>' [ZORDER BY (c1[, c2...]) | WHERE <partition predicate>]
  *   VACUUM '<path>' [RETAIN <n> VERSIONS | RETAIN <n> HOURS [FORCE]] [DRY RUN]
  *   DESCRIBE HISTORY '<path>'
  *   DESCRIBE DETAIL '<path>'
  *   SHOW PARTITIONS '<path>'
  *   RESTORE '<path>' TO VERSION AS OF <v>
  *   RESTORE '<path>' TO TIMESTAMP AS OF '<ts>'
  *   CREATE TABLE '<dst>' [SHALLOW | DEEP] CLONE '<src>' [VERSION AS OF <v>]
  *   CREATE OR REPLACE TABLE '<dst>' [SHALLOW | DEEP] CLONE '<src>'
  *   REORG TABLE '<path>' APPLY (PURGE)
  *   FSCK REPAIR TABLE '<path>' [DRY RUN]
  *   GENERATE symlink_format_manifest FOR TABLE '<path>'
  *   CONVERT TO GRAFT '<path>'
  *   ANALYZE TABLE '<path>' COMPUTE STATISTICS
  *   COPY INTO '<path>' FROM '<srcDir>' [FILEFORMAT = <fmt>]
  *   ALTER TABLE '<path>' ALTER COLUMN <c> SET NOT NULL
  *   ALTER TABLE '<path>' SET PARTITIONED BY (c1[, c2...])
  *   CHECKPOINT '<path>'
  * }}}
  *
  * Parsing is a small anchored-regex dispatcher, NOT a SQL engine: data
  * queries belong to Spark SQL (`CREATE TABLE ... USING graft-table` and
  * everything after it); this surface exists so the five maintenance verbs,
  * which Spark's parser cannot route to a V1 relation, still have a SQL
  * spelling. Every verb returns a DataFrame: `DESCRIBE HISTORY` the real
  * history, the others a one-row status frame (verb, path, result version).
  *
  * Tables address by QUOTED PATH (`'/lake/t'`) or by CATALOG NAME
  * (`graft.default.t` — any dotted identifier whose leading part names a
  * registered [[graft.catalog.GraftCatalog]]), matching Delta's verb
  * spellings; `CONVERT` and `COPY INTO ... FROM` directory operands are
  * paths by nature and stay quoted.
  */
object TableSql {

  // path-or-name: a quoted path literal ('' = an embedded quote), or a
  // dotted catalog identifier (`graft.default.t`) resolved to its
  // filesystem root through the session's registered GraftCatalog —
  // Delta's verbs address tables by NAME, so ours do too
  private val P = """('(?:[^']|'')+'|[A-Za-z_][A-Za-z0-9_]*(?:\.[A-Za-z_][A-Za-z0-9_]*)+)"""
  // strictly a quoted string literal (timestamp operands)
  private val L = """'((?:[^']|'')+)'"""
  private val Optimize =
    s"""(?is)\\s*OPTIMIZE\\s+$P(?:\\s+ZORDER\\s+BY\\s+\\(([^)]+)\\))?(?:\\s+WHERE\\s+(.+?))?\\s*""".r
  private val Vacuum =
    s"""(?is)\\s*VACUUM\\s+$P(?:\\s+RETAIN\\s+(\\d+)\\s+(VERSIONS|HOURS))?(\\s+FORCE)?(\\s+DRY\\s+RUN)?\\s*""".r
  private val History =
    s"""(?is)\\s*DESCRIBE\\s+HISTORY\\s+$P\\s*""".r
  private val Detail =
    s"""(?is)\\s*DESCRIBE\\s+DETAIL\\s+$P\\s*""".r
  private val ShowParts =
    s"""(?is)\\s*SHOW\\s+PARTITIONS\\s+$P\\s*""".r
  private val Restore =
    s"""(?is)\\s*RESTORE\\s+$P\\s+TO\\s+VERSION\\s+AS\\s+OF\\s+(\\d+)\\s*""".r
  private val RestoreTs =
    s"""(?is)\\s*RESTORE\\s+$P\\s+TO\\s+TIMESTAMP\\s+AS\\s+OF\\s+$L\\s*""".r
  private val Clone =
    s"""(?is)\\s*CREATE\\s+TABLE\\s+$P\\s+(SHALLOW|DEEP)\\s+CLONE\\s+$P(?:\\s+VERSION\\s+AS\\s+OF\\s+(\\d+))?\\s*""".r
  // Delta's scheduled-backup spelling: re-running it refreshes the clone
  // incrementally (cloneSync — only the files the target lacks transfer)
  private val CloneSync =
    s"""(?is)\\s*CREATE\\s+OR\\s+REPLACE\\s+TABLE\\s+$P\\s+(?:(SHALLOW|DEEP)\\s+)?CLONE\\s+$P\\s*""".r
  private val Reorg =
    s"""(?is)\\s*REORG\\s+TABLE\\s+$P\\s+APPLY\\s*\\(\\s*PURGE\\s*\\)\\s*""".r
  private val Fsck =
    s"""(?is)\\s*FSCK\\s+REPAIR\\s+TABLE\\s+$P(\\s+DRY\\s+RUN)?\\s*""".r
  private val Generate =
    s"""(?is)\\s*GENERATE\\s+symlink_format_manifest\\s+FOR\\s+TABLE\\s+$P\\s*""".r
  private val Analyze =
    s"""(?is)\\s*ANALYZE\\s+TABLE\\s+$P\\s+COMPUTE\\s+STATISTICS\\s*""".r
  private val Convert =
    s"""(?is)\\s*CONVERT\\s+TO\\s+GRAFT\\s+$P\\s*""".r
  // manifest checkpointing as a schedulable maintenance verb — the
  // operational cadence Delta automates is a DAG task in the reference's
  // model (one more scheduled job, scd2-job-scheduler.yaml's shape)
  private val Checkpoint =
    s"""(?is)\\s*CHECKPOINT\\s+$P\\s*""".r
  // Spark's analyzer refuses nullable->non-nullable through the standard V2
  // ALTER path (it cannot know the data is null-free); the kernel CAN know
  // (it scans), so SET NOT NULL gets a maintenance spelling here, exactly
  // as Delta ships it via its own SQL extension. DROP NOT NULL works
  // through plain ALTER TABLE and needs no verb.
  private val CopyInto =
    s"""(?is)\\s*COPY\\s+INTO\\s+$P\\s+FROM\\s+$P(?:\\s+FILEFORMAT\\s*=\\s*([A-Za-z]+))?\\s*""".r
  private val SetNotNull =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+ALTER\\s+COLUMN\\s+`?([A-Za-z0-9_]+)`?\\s+SET\\s+NOT\\s+NULL\\s*""".r
  // partition evolution (metadata-only; NOT Spark grammar, so no fallback):
  // ALTER TABLE '<p>' SET PARTITIONED BY (c1[, c2...]) — () = unpartitioned
  private val SetPartitioning =
    s"""(?is)\\s*ALTER\\s+TABLE\\s+$P\\s+SET\\s+PARTITIONED\\s+BY\\s*\\(([^)]*)\\)\\s*""".r

  private def unq(s: String): String = s.replace("''", "'")

  /** Resolve a P-matched token: a quoted literal is a filesystem path; a
    * dotted identifier whose leading part names a registered
    * [[graft.catalog.GraftCatalog]] resolves to that table's root (works
    * for not-yet-existing tables too — the CLONE destination is a pure
    * path computation). None = an identifier that is NOT ours (unknown
    * catalog, or a non-graft catalog): verbs that collide with Spark
    * grammar (SET NOT NULL) fall back to `spark.sql` on None, while
    * graft-only verbs raise a clear addressing error via [[ref]]. */
  private def refOpt(spark: SparkSession, tok: String): Option[String] =
    if (tok.startsWith("'")) Some(unq(tok.substring(1, tok.length - 1)))
    else {
      val parts = tok.split('.').toSeq
      scala.util.Try(spark.sessionState.catalogManager.catalog(parts.head))
        .toOption.collect {
          case g: graft.catalog.GraftCatalog =>
            g.pathOf(org.apache.spark.sql.connector.catalog.Identifier.of(
              parts.slice(1, parts.length - 1).toArray, parts.last))
        }
    }

  private def ref(spark: SparkSession, tok: String): String =
    refOpt(spark, tok).getOrElse(throw new IllegalArgumentException(
      s"'$tok' does not name a graft-catalog table - address graft tables " +
        "as <catalog>.[<namespace>.]<table> or quote a filesystem path"))

  /** A raw-directory operand (COPY INTO ... FROM, CONVERT): paths by
    * nature, so identifier form is REFUSED rather than resolved — a graft
    * identifier would resolve to a table ROOT, and walking a root as a
    * source directory silently ingests the data files of superseded
    * versions (duplicate rows). */
  private def dir(tok: String): String =
    if (tok.startsWith("'")) unq(tok.substring(1, tok.length - 1))
    else throw new IllegalArgumentException(
      s"'$tok' is a table identifier, but this operand is a raw source " +
        "directory - quote the filesystem path ('/landing/dir'); a table " +
        "root contains files of superseded versions and cannot be ingested " +
        "as a directory")

  private def status(spark: SparkSession, verb: String, path: String,
      version: Long): DataFrame = {
    import spark.implicits._
    Seq((verb, path, version)).toDF("operation", "path", "version")
  }

  /** [[run]] that reports "not a maintenance statement" as None instead of
    * throwing — the dispatcher for SQL entry points that must fall back to
    * `spark.sql` for everything else (the reference's whole idiom is SQL
    * text inside stages, so COPY INTO / OPTIMIZE / DESCRIBE HISTORY need a
    * spelling THROUGH those stages, not only the Scala API). A statement
    * whose verb matched but whose form is invalid still throws: a malformed
    * OPTIMIZE must surface its own error, not Spark's parser's. */
  def runOpt(spark: SparkSession, sql: String): Option[DataFrame] =
    dispatch(spark, sql)

  def run(spark: SparkSession, sql: String): DataFrame =
    dispatch(spark, sql).getOrElse(throw new IllegalArgumentException(
      s"unrecognized graft maintenance statement: '$sql' — supported: OPTIMIZE, " +
        "VACUUM, DESCRIBE HISTORY, RESTORE ... TO VERSION AS OF, " +
        "CREATE TABLE ... [SHALLOW|DEEP] CLONE, REORG TABLE ... APPLY (PURGE), " +
        "FSCK REPAIR TABLE ... [DRY RUN]"))

  private def dispatch(spark: SparkSession, sql: String): Option[DataFrame] = Some(sql match {
    case Optimize(p, null, null) =>
      val path = ref(spark, p)
      status(spark, "OPTIMIZE", path, VersionedTable(path).compact(spark))
    case Optimize(p, null, where) =>
      // partition-scoped compaction: only matching partitions rewrite
      val path = ref(spark, p)
      status(spark, "OPTIMIZE WHERE", path,
        VersionedTable(path).compactWhere(spark, where.trim))
    case Optimize(p, cols, where) =>
      require(where == null,
        "OPTIMIZE ZORDER BY ... WHERE is not supported: z-order is a " +
          "whole-table layout — scope with a partitioned table + plain " +
          "OPTIMIZE ... WHERE instead")
      val path = ref(spark, p)
      status(spark, "OPTIMIZE ZORDER", path, VersionedTable(path).compact(spark,
        zOrderBy = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
          .filter(_.nonEmpty).toSeq))
    case Vacuum(p, retain, unit, force, dry) =>
      val path = ref(spark, p)
      val t = VersionedTable(path)
      import spark.implicits._
      def retainVersions: Int =
        if (unit != null && unit.equalsIgnoreCase("HOURS"))
          // hours-based retention (Delta's spelling); FORCE overrides the
          // 168 h safety floor the kernel enforces (dry run included — a
          // preview under an unsafe retention would mislead)
          t.retainCountForHours(retain.toDouble, force = force != null)
        else Option(retain).map(_.toInt).getOrElse(2)
      if (dry != null)
        // DRY RUN: one row per file the sweep WOULD delete, nothing touched
        t.vacuumDryRun(retainVersions).toDF("path")
      else {
        val n =
          if (unit != null && unit.equalsIgnoreCase("HOURS"))
            t.vacuumHours(retain.toDouble, force = force != null)
          else t.vacuum(retainVersions = retainVersions)
        // a sweep has no resulting version — report the swept count under
        // its own name instead of overloading `version`
        Seq(("VACUUM", path, n.toLong)).toDF("operation", "path", "swept")
      }
    case History(p) => VersionedTable(ref(spark, p)).history(spark)
    case Detail(p) => VersionedTable(ref(spark, p)).detail(spark)
    case ShowParts(p) =>
      // SHOW PARTITIONS is also Spark grammar: a non-graft table identifier
      // falls through to spark.sql instead of erroring here (as SET NOT NULL)
      refOpt(spark, p) match {
        case Some(path) => VersionedTable(path).showPartitions(spark)
        case None => return None
      }
    case Restore(p, v) =>
      val path = ref(spark, p)
      status(spark, "RESTORE", path, VersionedTable(path).restore(v.toLong))
    case RestoreTs(p, ts0) =>
      // same literal forms as the reader's timestampAsOf option: epoch
      // millis, SQL timestamp, or ISO-8601 instant
      val path = ref(spark, p)
      val s = unq(ts0)
      val millis = scala.util.Try(s.toLong).getOrElse(
        scala.util.Try(java.sql.Timestamp.valueOf(s).getTime).getOrElse(
          java.time.Instant.parse(s).toEpochMilli))
      val t = VersionedTable(path)
      status(spark, "RESTORE", path, t.restore(t.resolveAsOfTimestamp(millis)))
    case Clone(dst, kind, src, ver) =>
      // optional VERSION AS OF pins the cloned snapshot (Delta parity):
      // reproduce a historical state as a NEW table
      val srcT = VersionedTable(ref(spark, src))
      val v = Option(ver).map(_.toLong)
      if (kind.equalsIgnoreCase("deep")) srcT.cloneDeep(ref(spark, dst), v)
      else srcT.cloneShallow(ref(spark, dst), v)
      status(spark, s"${kind.toUpperCase} CLONE", ref(spark, dst), 0L)
    case CloneSync(dst, kind, src) =>
      // first run = full clone; re-runs = incremental refresh (only the
      // files the target lacks move, one target version per refresh)
      val deep = kind == null || kind.equalsIgnoreCase("deep")
      val srcT = VersionedTable(ref(spark, src))
      val d = ref(spark, dst)
      val tgt = VersionedTable(d)
      if (tgt.latestVersion().isEmpty) {
        if (deep) srcT.cloneDeep(d) else srcT.cloneShallow(d)
        status(spark, "CLONE SYNC (seed)", d, 0L)
      } else {
        srcT.cloneSync(d, deep)
        status(spark, "CLONE SYNC", d, tgt.resolve())
      }
    case Reorg(p) =>
      val path = ref(spark, p)
      status(spark, "REORG PURGE", path, VersionedTable(path).reorgPurge(spark))
    case Fsck(p, dry) =>
      // Delta's FSCK REPAIR TABLE spelling; DRY RUN reports, never commits
      val path = ref(spark, p)
      val (missing, nv) = VersionedTable(path).fsck(dryRun = dry != null)
      import spark.implicits._
      missing.map(f => (f, nv)).toDF("missing_file", "repaired_version")
    case Generate(p) =>
      // Delta's GENERATE spelling (`scd2-job.ipynb:382` is this artifact):
      // (re)write the Athena-interop manifest tree for the latest version
      val path = ref(spark, p)
      val t = VersionedTable(path)
      t.writeSymlinkManifest()
      status(spark, "GENERATE", path, t.resolve())
    case CopyInto(p, src, fmt) =>
      val path = ref(spark, p)
      import spark.implicits._
      val (ver, n) = VersionedTable(path).copyInto(spark, dir(src),
        Option(fmt).map(_.toLowerCase).getOrElse("parquet"))
      Seq(("COPY INTO", path, ver, n)).toDF("operation", "path", "version", "files_ingested")
    case SetNotNull(p, colName) =>
      // the ONE verb riding Spark's own ALTER grammar: a non-graft table
      // identifier falls through to spark.sql instead of erroring here
      refOpt(spark, p) match {
        case Some(path) => status(spark, "SET NOT NULL", path,
          VersionedTable(path).setColumnNullability(spark, colName, nullable = false))
        case None => return None
      }
    case Checkpoint(p) =>
      val path = ref(spark, p)
      status(spark, "CHECKPOINT", path, VersionedTable(path).checkpoint(spark))
    case SetPartitioning(p, cols) =>
      val path = ref(spark, p)
      val pb = cols.split(",").map(_.trim.stripPrefix("`").stripSuffix("`"))
        .filter(_.nonEmpty).toSeq
      status(spark, "SET PARTITIONED BY", path,
        VersionedTable(path).alterPartitioning(pb))
    case Analyze(p) =>
      // ANALYZE TABLE ... COMPUTE STATISTICS is also vanilla Spark grammar:
      // a non-graft table identifier falls through to spark.sql instead of
      // erroring here (as SHOW PARTITIONS / SET NOT NULL)
      refOpt(spark, p) match {
        case Some(path) => status(spark, "ANALYZE", path,
          VersionedTable(path).analyzeStats(spark))
        case None => return None
      }
    case Convert(p) =>
      // Delta's CONVERT TO DELTA: in-place adoption of a plain parquet
      // directory — version 0 references the existing files, zero rewrite.
      // The operand is a raw directory, not a table: quoted path only.
      val path = dir(p)
      VersionedTable.convert(spark, path)
      status(spark, "CONVERT", path, 0L)
    case _ => return None
  })
}
