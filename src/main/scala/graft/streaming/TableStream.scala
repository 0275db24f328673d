package graft.streaming

import graft.table.VersionedTable
import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, Row, SQLContext, SaveMode, SparkSession}
import org.apache.spark.sql.execution.streaming.{Offset, Source}
import org.apache.spark.sql.execution.streaming.runtime.LongOffset
import org.apache.spark.sql.graft.StreamShim
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types.{LongType, StringType, StructType}

/** Structured-Streaming SOURCE over a [[VersionedTable]] — the table-as-
  * stream face of the commit log (Delta's streaming source analogue; the
  * reference's Delta-role table at scd2-job.ipynb:163-172 is consumed the
  * same way downstream). Offsets ARE table versions, so exactly-once
  * resumption costs one number in the checkpoint and a micro-batch is
  * planned from the manifests alone — never a snapshot diff:
  *
  * {{{
  *   spark.readStream.format("graft-table")
  *     .option("path", root)                // required
  *     .option("readChangeFeed", "true")    // CDF rows (+_change_type,
  *                                          //   +_commit_version)
  *     .option("startingVersion", "0")      // cursor: changes AFTER v0
  *     .option("startingTimestamp", "...")  // cursor by commit time
  *     .option("skipChangeCommits", "true") // append-mode: drop rewrites
  *     .load()
  * }}}
  *
  * Modes:
  *  - default (append mode): first batch is the snapshot at the stream's
  *    start (or the appends after `startingVersion` when set); each later
  *    batch is exactly the fresh files of the new append commits — cost
  *    O(new data). A rewrite commit (merge/delete/update) REFUSES the
  *    batch unless `skipChangeCommits=true` (Delta's semantics: silently
  *    treating a rewrite as appends would double-deliver rows).
  *    Compaction / metadata commits (`cdfKind="none"`) are always skipped —
  *    they change no rows.
  *  - `readChangeFeed=true`: batches carry the per-commit change rows
  *    (insert/delete pairs) served from write-time capture — enable
  *    `enableChangeDataFeed` on the table; uncaptured versions fall back
  *    to a snapshot re-diff.
  *
  * At 100 TB the scale story is the manifest protocol's: planning reads
  * JSON manifests (bounded by the checkpointed log), batches scan only
  * fresh/cdf files, and the source never lists data directories. */
final class TableStreamProvider extends StreamSourceProvider with StreamSinkProvider
    with RelationProvider with CreatableRelationProvider with DataSourceRegister {
  override def shortName(): String = "graft-table"

  /** Streaming SINK: `df.writeStream.format("graft-table").option("path", root)`.
    * Exactly-once via the table's txn marks ([[VersionedTable.lastTxn]]):
    * every commit records `(txnAppId, batchId)` ATOMICALLY with the data, so
    * a replayed micro-batch (restart after a crash between commit and
    * checkpoint advance) is detected and skipped — Delta's idempotent-sink
    * protocol. `txnAppId` defaults to the query's checkpoint location, the
    * stable identity of the retrying writer. Append mode appends; Complete
    * snapshots the table per batch; Update is refused (a keyed upsert needs
    * merge keys — use foreachBatch + mergeCow, the q75 pattern). */
  override def createSink(
      sqlContext: SQLContext,
      parameters: Map[String, String],
      partitionColumns: Seq[String],
      outputMode: org.apache.spark.sql.streaming.OutputMode): org.apache.spark.sql.execution.streaming.Sink = {
    import org.apache.spark.sql.streaming.OutputMode
    if (outputMode == OutputMode.Update) throw new IllegalArgumentException(
      "graft-table sink supports Append and Complete; for Update-as-upsert " +
        "use foreachBatch with mergeCow (merge keys are per-query, not sink options)")
    val appId = parameters.getOrElse("txnAppId", parameters.getOrElse("checkpointLocation",
      throw new IllegalArgumentException(
        "graft-table sink needs option 'txnAppId' (or a checkpointLocation to default to)")))
    new TableStreamSink(sqlContext.sparkSession, table(parameters), appId,
      complete = outputMode == OutputMode.Complete,
      partitionBy = partitionColumns,
      numPartitions = parameters.get("numPartitions").map(_.toInt),
      sortBy = parameters.get("sortBy").toSeq
        .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty))
  }

  private def table(parameters: Map[String, String]): VersionedTable = {
    val p = parameters.getOrElse("path",
      throw new IllegalArgumentException("graft-table source needs option 'path'"))
    // the SQL path (CREATE TABLE ... OPTIONS (path ...)) arrives qualified
    // with a file: scheme; the table layer speaks local paths
    VersionedTable(if (p.startsWith("file:")) new java.net.URI(p).getPath else p)
  }

  /** Batch read: `spark.read.format("graft-table").option("path", root)`
    * (+ `versionAsOf` / `relativeVersion` / `timestampAsOf` time travel;
    * the timestamp accepts epoch millis, `yyyy-MM-dd HH:mm:ss`, or ISO-8601
    * instants, Delta-style). Also what SQL
    * `CREATE TABLE ... USING `graft-table`` resolves to.
    *
    * `readChangeFeed=true` (Delta batch-CDF parity) returns the stored
    * change rows of `(startingVersion, endingVersion]` instead of the
    * snapshot — `_change_type` + `_commit_version` attached, insert-only
    * commits served from their fresh files, uncaptured versions re-diffed;
    * `endingVersion` defaults to the head. */
  override def createRelation(
      sqlContext: SQLContext,
      parameters: Map[String, String]): BaseRelation = {
    val t = table(parameters)
    if (parameters.get("readChangeFeed").exists(_.toBoolean)) {
      val start = parameters.get("startingVersion").map(_.toLong).getOrElse(0L)
      val end = parameters.get("endingVersion").map(_.toLong)
        .getOrElse(t.resolve())
      val df = t.changeFeed(sqlContext.sparkSession, start, end)
      val outer = sqlContext
      return new BaseRelation with org.apache.spark.sql.sources.TableScan {
        override def sqlContext: SQLContext = outer
        override def schema: org.apache.spark.sql.types.StructType = df.schema
        override def buildScan(): org.apache.spark.rdd.RDD[org.apache.spark.sql.Row] =
          df.rdd // change-sized, not table-sized: the conversion cost is the batch's
      }
    }
    val tsVersion = parameters.get("timestampAsOf").map { s =>
      val millis = scala.util.Try(s.toLong).getOrElse(
        scala.util.Try(java.sql.Timestamp.valueOf(s).getTime).getOrElse(
          java.time.Instant.parse(s).toEpochMilli))
      t.resolveAsOfTimestamp(millis)
    }
    new TableRelation(sqlContext.sparkSession, t,
      versionAsOf = parameters.get("versionAsOf").map(_.toLong).orElse(tsVersion),
      relativeVersion = parameters.get("relativeVersion").map(_.toInt))
  }

  /** Batch write: `df.write.format("graft-table").mode(...)` — Overwrite is
    * a snapshot commit, Append an incremental append (first write creates);
    * `option("partitionBy", "a,b")` lays out a NEW table hive-partitioned. */
  override def createRelation(
      sqlContext: SQLContext,
      mode: SaveMode,
      parameters: Map[String, String],
      data: DataFrame): BaseRelation = {
    val t = table(parameters)
    val pb = parameters.get("partitionBy").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    // numPartitions/sortBy shape the data files: range-sorted commits get
    // tight per-file min/max stats, which is what makes the read side's
    // manifest skipping bite (same knobs as the TableLoad stage)
    val np = parameters.get("numPartitions").map(_.toInt)
    val sb = parameters.get("sortBy").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)
    val exists = t.latestVersion().isDefined
    def create(): Unit = { t.commit(data, np, sb, partitionBy = pb); () }
    mode match {
      case SaveMode.Overwrite => create()
      case SaveMode.Append => if (exists) { t.append(data, np, sb); () } else create()
      case SaveMode.ErrorIfExists =>
        if (exists) throw new IllegalStateException(
          s"graft-table at ${t.root} already exists (SaveMode.ErrorIfExists)")
        create()
      case SaveMode.Ignore => if (!exists) create()
    }
    createRelation(sqlContext, parameters)
  }

  private def feedSchema(t: VersionedTable, cdf: Boolean): StructType = {
    val base = t.schemaOf(t.resolve()).getOrElse(throw new IllegalStateException(
      s"table ${t.root} has no recorded schema — commit before streaming"))
    if (cdf) base.add("_change_type", StringType).add("_commit_version", LongType)
    else base
  }

  override def sourceSchema(
      sqlContext: SQLContext,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): (String, StructType) =
    (shortName(), feedSchema(table(parameters),
      parameters.get("readChangeFeed").exists(_.toBoolean)))

  override def createSource(
      sqlContext: SQLContext,
      metadataPath: String,
      schema: Option[StructType],
      providerName: String,
      parameters: Map[String, String]): Source =
    {
    val t = table(parameters)
    // startingTimestamp (Delta parity): INCLUSIVE — every commit stamped at
    // or after the literal is read. The cursor (which emits strictly AFTER
    // itself) is therefore the newest version committed strictly BEFORE the
    // timestamp, i.e. resolveAsOfTimestamp(millis - 1): a commit stamped
    // exactly at the literal is included, matching Delta. Same literal
    // forms as the reader's timestampAsOf. A timestamp at or before the
    // FIRST commit's stamp: when version 0 is still retained nothing can
    // have been vacuumed, so "from table creation time" reads every
    // retained change INCLUDING version 0's (cursor -1 — an exclusive
    // cursor BEFORE the first commit, matching Delta, which starts from
    // the earliest version inclusively); the loud failure stays for
    // oldest-retained > 0, where earlier commits may actually be gone and
    // replaying an incomplete history as if complete would be silent data
    // loss.
    val tsStart = parameters.get("startingTimestamp").map { s0 =>
      val millis = scala.util.Try(s0.toLong).getOrElse(
        scala.util.Try(java.sql.Timestamp.valueOf(s0).getTime).getOrElse(
          java.time.Instant.parse(s0).toEpochMilli))
      if (t.versions().headOption.contains(0L) && millis - 1 < t.commitTimeOf(0L)) -1L
      else t.resolveAsOfTimestamp(millis - 1)
    }
    require(tsStart.isEmpty || !parameters.contains("startingVersion"),
      "startingVersion and startingTimestamp are exclusive")
    parameters.get("startingVersion").foreach(sv => require(sv.toLong >= 0,
      s"startingVersion must be a committed version (>= 0), got $sv"))
    new TableStreamSource(sqlContext.sparkSession, t,
      readChangeFeed = parameters.get("readChangeFeed").exists(_.toBoolean),
      startingVersion = parameters.get("startingVersion").map(_.toLong).orElse(tsStart),
      skipChangeCommits = parameters.get("skipChangeCommits").exists(_.toBoolean),
      maxVersionsPerBatch = parameters.get("maxVersionsPerBatch").map(_.toLong))
    }
}

final class TableStreamSource(
    spark: SparkSession,
    table: VersionedTable,
    readChangeFeed: Boolean,
    startingVersion: Option[Long],
    skipChangeCommits: Boolean,
    maxVersionsPerBatch: Option[Long] = None) extends Source {

  maxVersionsPerBatch.foreach(m => require(m >= 1,
    s"maxVersionsPerBatch must be >= 1, got $m"))

  /** Admission control (Delta's maxFilesPerTrigger analogue, by commit
    * count): with `maxVersionsPerBatch=m`, [[getOffset]] advertises at most
    * `m` versions past the last batch end this source has PLANNED — pacing
    * a stream that falls far behind a hot table into bounded micro-batches
    * instead of one giant catch-up batch. V1-source honesty: the planned
    * end is tracked here (the checkpoint replays it through [[getBatch]] on
    * restart, re-seeding the cursor before the first new [[getOffset]]), so
    * pacing survives restarts; the FIRST batch of a fresh stream without a
    * `startingVersion` has no cursor yet and is the full snapshot, exactly
    * like Delta's initial snapshot batch (a snapshot cannot be split in
    * append mode); with a `startingVersion` the cursor seeds there and the
    * cap applies from batch one. */
  private var plannedEnd: Option[Long] = startingVersion

  override val schema: StructType = {
    val base = table.schemaOf(table.resolve()).getOrElse(throw new IllegalStateException(
      s"table ${table.root} has no recorded schema — commit before streaming"))
    if (readChangeFeed) base.add("_change_type", StringType).add("_commit_version", LongType)
    else base
  }

  override def getOffset: Option[Offset] =
    table.latestVersion().map { latest =>
      val capped = (maxVersionsPerBatch, plannedEnd) match {
        case (Some(m), Some(c)) => math.min(latest, c + m)
        case _ => latest
      }
      LongOffset(capped)
    }

  /** Offsets round-trip through the checkpoint as JSON — accept both live
    * [[LongOffset]]s and replayed serialized ones. */
  private def ver(o: Offset): Long = o.json.trim.toLong

  private def emptyBatch(s: StructType): DataFrame =
    spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)

  /** Append-mode incremental batch over `(s, e]`: per retained commit, an
    * append contributes exactly its fresh files; `cdfKind="none"` commits
    * (compaction, metadata) contribute nothing; a rewrite refuses the batch
    * unless `skipChangeCommits` drops it. */
  private def appendBatch(s: Long, e: Long): DataFrame = {
    val vs = table.versions()
    val steps = vs.filter(v => v > s && v <= e)
    // the checkpointed cursor must itself still be retained: if vacuum
    // dropped version s, pairing steps against the surviving list would
    // misalign (prev == v for the first step) and SILENTLY skip that
    // commit's appended rows — fail loudly instead, like changeFeed does
    // for a vacuumed endpoint
    if (steps.nonEmpty && !vs.contains(s))
      throw new IllegalStateException(
        s"stream offset version $s of ${table.root} is no longer retained " +
          "(vacuumed); restart from a fresh checkpoint or a retained startingVersion")
    val frames = steps.zip(s +: steps).flatMap { case (v, prev) =>
      table.cdfKindOf(v) match {
        case Some("append") => Some(table.appendsSince(spark, prev, Some(v)))
        case Some("none") => None
        case _ if skipChangeCommits => None
        case k => throw new IllegalStateException(
          s"version $v of ${table.root} is not an append (cdfKind=$k): a stream " +
            "over an updated table needs readChangeFeed=true (row-level changes) " +
            "or skipChangeCommits=true (drop rewrites)")
      }
    }
    frames.reduceOption(_.unionByName(_, allowMissingColumns = true))
      .getOrElse(emptyBatch(table.schemaOf(e).getOrElse(schema)))
  }

  override def getBatch(start: Option[Offset], end: Offset): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val e = ver(end)
    plannedEnd = Some(e)
    val batch = (start.map(ver), readChangeFeed) match {
      // first batch, CDF: the starting snapshot plays the seed inserts
      // (startingVersion, when set, is a CURSOR — emit changes after it;
      // the -1 sentinel from a pre-creation startingTimestamp means "from
      // version 0 INCLUSIVE": v0's snapshot IS its change feed — the
      // creation commit's rows are all inserts at _commit_version 0)
      case (None, true) => startingVersion match {
        case Some(-1L) =>
          val v0 = table.read(spark, versionAsOf = Some(0L))
            .withColumn("_change_type", lit("insert"))
            .withColumn("_commit_version", lit(0L))
          if (e > 0L) v0.unionByName(table.changeFeed(spark, 0L, e),
            allowMissingColumns = true)
          else v0
        case Some(sv) => table.changeFeed(spark, sv, e)
        case None => table.read(spark, versionAsOf = Some(e))
          .withColumn("_change_type", lit("insert"))
          .withColumn("_commit_version", lit(e))
      }
      case (Some(s), true) => table.changeFeed(spark, s, e)
      // first batch, append mode: the snapshot (or the appends after the
      // cursor, or — at the -1 sentinel — v0's rows plus the appends after
      // v0); later batches: fresh files only
      case (None, false) => startingVersion match {
        case Some(-1L) =>
          val v0 = table.read(spark, versionAsOf = Some(0L))
          if (e > 0L) v0.unionByName(appendBatch(0L, e), allowMissingColumns = true)
          else v0
        case Some(sv) => appendBatch(sv, e)
        case None => table.read(spark, versionAsOf = Some(e))
      }
      case (Some(s), false) => appendBatch(s, e)
    }
    StreamShim.asStreamingFrame(spark, batch)
  }

  override def stop(): Unit = ()

  override def toString: String = s"TableStreamSource[${table.root}]"
}

/** Micro-batch sink writing a [[VersionedTable]] — see
  * [[TableStreamProvider.createSink]] for the contract. The replay check and
  * the commit are not atomic with EACH OTHER, but they don't need to be: the
  * txn protocol assumes one live writer per `appId` (Spark guarantees one
  * active run per checkpoint), and the mark is atomic WITH THE DATA, so the
  * crash-replay window — the only race that exists — always sees the mark. */
final class TableStreamSink(
    spark: SparkSession,
    t: VersionedTable,
    appId: String,
    complete: Boolean,
    partitionBy: Seq[String],
    numPartitions: Option[Int],
    sortBy: Seq[String]) extends org.apache.spark.sql.execution.streaming.Sink {

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    if (t.lastTxn(appId).exists(_ >= batchId)) return // replayed batch: already durable
    // re-brand the incremental plan as a one-shot batch frame (see StreamShim)
    val batch = StreamShim.asBatchFrame(spark, data)
    val txn = Some(appId -> batchId)
    if (complete) { t.commit(batch, numPartitions, sortBy, txn = txn, partitionBy = partitionBy); () }
    else if (t.latestVersion().isDefined) { t.append(batch, numPartitions, sortBy, txn = txn); () }
    else { t.commit(batch, numPartitions, sortBy, txn = txn, partitionBy = partitionBy); () }
  }

  override def toString: String = s"TableStreamSink[${t.root}, appId=$appId]"
}

/** V1 batch relation over a [[VersionedTable]] snapshot. The scan is the
  * standard versioned read (manifest file list, DV anti-join, partition
  * values) with one scale-critical addition: pushed-down conjunctive
  * range/equality filters prune the FILE LIST via manifest stats
  * ([[VersionedTable.readBounded]]) before any I/O — so a selective SQL
  * WHERE over a 100 TB table opens only the files whose recorded [min,max]
  * can match. Every filter is also left in `unhandledFilters`, so Spark
  * re-applies them row-level above the scan: pruning is advisory,
  * correctness never depends on it. SQL `INSERT INTO` / `INSERT OVERWRITE`
  * map to append / snapshot commit via [[InsertableRelation]]. */
final class TableRelation(
    spark: SparkSession,
    val table: VersionedTable,
    versionAsOf: Option[Long],
    relativeVersion: Option[Int]) extends BaseRelation
    with PrunedFilteredScan with InsertableRelation {

  private def t: VersionedTable = table

  override def sqlContext: SQLContext = spark.sqlContext

  override val schema: StructType = {
    val v = t.resolve(relativeVersion, versionAsOf)
    t.schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of ${t.root} has no recorded schema"))
  }

  /** Pushed-filter → stats-bounds translation (exact value rendering and
    * type-aware IN ordering) lives in [[graft.table.StatsBounds]], shared
    * with the DSv2 catalog scan. */
  private def bounds(filters: Array[Filter]): Seq[(String, Option[String], Option[String])] =
    // rendered in the manifest's recorded stats zone, not the read
    // session's — see VersionedTable.statsRenderZone
    graft.table.StatsBounds.bounds(filters,
      t.statsRenderZone(spark, relativeVersion, versionAsOf))

  /** All filters stay unhandled: the scan only SKIPS FILES on them, it does
    * not evaluate them row-level. */
  override def unhandledFilters(filters: Array[Filter]): Array[Filter] = filters

  /** Manifest-derived size estimate (rows × Spark's row-width convention) —
    * BaseRelation's default is `defaultSizeInBytes` = Long.MaxValue, under
    * which a small `graft-table` dimension can never broadcast in a join.
    * Upper-bounds the live size (DV tombstones not subtracted — that would
    * cost a job at plan time); stats-less snapshots keep the conservative
    * default. Same estimate the DSv2 face reports via
    * SupportsReportStatistics. */
  override def sizeInBytes: Long =
    // an estimate must never fail planning — fall to Spark's conservative
    // default on any snapshot race (concurrent vacuum/drop)
    (try t.estimateLiveRows(t.resolve(relativeVersion, versionAsOf))
     catch { case _: Exception => None }) match {
      case Some(rows) =>
        val rowBytes = 8L + schema.fields.map(_.dataType.defaultSize.toLong).sum
        math.max(1L, rows * rowBytes)
      case None => spark.sessionState.conf.defaultSizeInBytes
    }

  /** The scan hands Spark the inner plan's OWN compiled rows (`toRdd`, cast
    * per the `needConversion=false` contract) instead of `.rdd` — skipping a
    * full InternalRow→Row→InternalRow round trip per row at the source
    * boundary. The projection keeps column pruning inside the inner plan, so
    * the parquet reader still reads only `requiredColumns`. */
  override def needConversion: Boolean = false

  override def buildScan(requiredColumns: Array[String], filters: Array[Filter]): RDD[Row] = {
    val (df, _, _) = t.readBounded(spark, bounds(filters), relativeVersion, versionAsOf,
      exactValues = graft.table.StatsBounds.exactValues(filters,
        t.statsRenderZone(spark, relativeVersion, versionAsOf)),
      nullness = graft.table.StatsBounds.nullness(filters))
    import org.apache.spark.sql.functions.col
    df.select(requiredColumns.toSeq.map(col): _*)
      .queryExecution.toRdd.asInstanceOf[RDD[Row]]
  }

  override def insert(data: DataFrame, overwrite: Boolean): Unit = {
    if (overwrite) t.commit(data, partitionBy = t.latestVersion()
      .map(t.partitionByOf).getOrElse(Nil))
    else if (t.latestVersion().isDefined) t.append(data)
    else t.commit(data)
    ()
  }
}
