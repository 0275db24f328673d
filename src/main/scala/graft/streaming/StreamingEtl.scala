package graft.streaming

import graft.table.{Merge, VersionedTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

/** Structured-Streaming face of the engine (SURVEY.md §2.9 extension).
  *
  * The reference models incremental processing as micro-batch CDC: a delta CSV
  * merged on a schedule (`example/notebook/scd2-job.ipynb:211-212`, Argo DAG
  * `example/scd2-job-scheduler.yaml:32-48`). Structured Streaming is the same
  * design with the scheduler inside Spark: `readStream` over the landing
  * directory → `foreachBatch` running the SAME merge kernel into the SAME
  * versioned table. Each micro-batch commit is one table version — so time
  * travel and snapshot isolation carry over unchanged, and the batch and
  * streaming paths cannot drift (one kernel).
  *
  * At scale: foreachBatch merge cost is one equi-join per micro-batch;
  * watermarked windowed aggregation keeps state bounded by the lateness
  * horizon, with state in the HDFS/RocksDB store — both standard Spark
  * mechanics, nothing engine-custom beyond the commit protocol.
  */
final case class UserEvent(user_id: Long, value: Double)
final case class UserTotal(user_id: Long, n: Long, sum_value: Double)
/** Open-session state for [[StreamingEtl.sessionWindows]] (micros). */
final case class SessionState(start: Long, last: Long, n: Long)

/** One closed session: contiguous events of a user with < `gap` between
  * neighbours. */
final case class ClosedSession(
    user_id: Long, session_start: java.sql.Timestamp,
    session_end: java.sql.Timestamp, n_events: Long)

/** StatefulProcessor for [[StreamingEtl.statefulUserTotalsTws]]: one typed
  * ValueState slot per user holding the running (count, sum). `init` runs
  * once per partition at query (re)start — the handle hands out state bound
  * to the current grouping key at call time. No TTL: totals are forever
  * (a bounded-retention variant would pass TTLConfig(duration)). */
final class RunningTotalsProcessor
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserTotal] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var state: ValueState[UserTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserTotal]("totals",
      org.apache.spark.sql.Encoders.product[UserTotal], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserTotal] = {
    val prev = if (state.exists()) state.get() else UserTotal(userId, 0L, 0.0)
    var n = prev.n
    var sum = prev.sum_value
    rows.foreach { e => n += 1; sum += e.value }
    val next = UserTotal(userId, n, sum)
    state.update(next)
    Iterator.single(next)
  }
}

/** [[RunningTotalsProcessor]] with state TTL: a key's running total is
  * EVICTED after `ttlMs` of processing time without an update — the
  * bounded-retention variant a production pipeline runs so state size
  * tracks the ACTIVE key set, not every key ever seen (at 100 TB of
  * events, unbounded per-key state is the thing that kills the job weeks
  * in). TTL is enforced by the state store itself (RocksDB TTL column
  * semantics): an expired value is simply absent at the next read, across
  * query restarts too, because the expiry rides the checkpointed state. */
final class RunningTotalsTtlProcessor(ttlMs: Long)
    extends org.apache.spark.sql.streaming.StatefulProcessor[Long, UserEvent, UserTotal] {
  import org.apache.spark.sql.streaming.{OutputMode, TimeMode, TimerValues, TTLConfig, ValueState}
  @transient private var state: ValueState[UserTotal] = _

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[UserTotal]("totals",
      org.apache.spark.sql.Encoders.product[UserTotal],
      TTLConfig(java.time.Duration.ofMillis(ttlMs)))

  override def handleInputRows(userId: Long, rows: Iterator[UserEvent],
      timerValues: TimerValues): Iterator[UserTotal] = {
    // an expired slot reads as absent — the total restarts, by design
    val prev = if (state.exists()) state.get() else UserTotal(userId, 0L, 0.0)
    var n = prev.n
    var sum = prev.sum_value
    rows.foreach { e => n += 1; sum += e.value }
    val next = UserTotal(userId, n, sum)
    state.update(next) // update refreshes the TTL clock
    Iterator.single(next)
  }
}

/** Timer-driven event-time sessionization via `transformWithState` — the
  * capability [[StreamingEtl.sessionWindows]]'s flatMapGroupsWithState
  * variant lacks: an IDLE user's final session is emitted when the
  * WATERMARK passes `session_end + gap` (an event-time timer the processor
  * re-arms on every update), instead of waiting forever for a next event
  * that may never come. In-batch closures (an event arriving past the gap)
  * emit immediately, exactly like the fmgws variant; the timer only covers
  * the idle tail. One ValueState slot + at most one live timer per user —
  * O(1) state per key, the sessionization shape that holds at 100 TB.
  *
  * Times: state tracks event-time MICROS (full precision); timers are
  * registered in epoch MILLIS (the timer API's unit) at
  * `floor(last/1000) + gapMs`. */
final class SessionTimerProcessor(gapMinutes: Int)
    extends org.apache.spark.sql.streaming.StatefulProcessor[
      Long, (Long, java.sql.Timestamp), ClosedSession] {
  import org.apache.spark.sql.streaming.{ExpiredTimerInfo, OutputMode, TimeMode,
    TimerValues, TTLConfig, ValueState}

  private val gapMicros = gapMinutes * 60L * 1000000L
  @transient private var state: ValueState[SessionState] = _

  private def micros(t: java.sql.Timestamp): Long =
    t.getTime * 1000L + t.getNanos / 1000 % 1000
  private def ts(m: Long): java.sql.Timestamp = {
    val t = new java.sql.Timestamp(m / 1000)
    t.setNanos((m % 1000000L).toInt * 1000)
    t
  }

  override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
    state = getHandle.getValueState[SessionState]("open_session",
      org.apache.spark.sql.Encoders.product[SessionState], TTLConfig.NONE)

  override def handleInputRows(userId: Long, rows: Iterator[(Long, java.sql.Timestamp)],
      timerValues: TimerValues): Iterator[ClosedSession] = {
    val sorted = rows.map(r => micros(r._2)).toArray.sorted
    var closed = List.empty[ClosedSession]
    var cur = if (state.exists()) Option(state.get()) else None
    sorted.foreach { m =>
      cur match {
        // same late-event semantics as sessionWindows: a cross-batch
        // straggler inside the open span folds in; one older than the span
        // minus the gap is unattributable and drops
        case Some(s) if m < s.start - gapMicros => ()
        case Some(s) if m <= s.last =>
          cur = Some(s.copy(start = math.min(s.start, m), n = s.n + 1))
        case Some(s) if m - s.last <= gapMicros =>
          cur = Some(s.copy(last = m, n = s.n + 1))
        case Some(s) =>
          closed ::= ClosedSession(userId, ts(s.start), ts(s.last), s.n)
          cur = Some(SessionState(m, m, 1))
        case None =>
          cur = Some(SessionState(m, m, 1))
      }
    }
    cur.foreach { s =>
      state.update(s)
      // re-arm THE timer: at most one live per key — the previous expiry is
      // obsolete the moment the session extends
      getHandle.listTimers().foreach(getHandle.deleteTimer)
      getHandle.registerTimer(s.last / 1000L + gapMinutes * 60L * 1000L)
    }
    closed.reverseIterator
  }

  override def handleExpiredTimer(userId: Long, timerValues: TimerValues,
      expiredTimerInfo: ExpiredTimerInfo): Iterator[ClosedSession] = {
    // the watermark passed session_end + gap with no extending event: the
    // session is definitively closed — emit and free the state
    if (state.exists()) {
      val s = state.get()
      state.clear()
      Iterator.single(ClosedSession(userId, ts(s.start), ts(s.last), s.n))
    } else Iterator.empty
  }
}

object StreamingEtl {

  /** Shared exactly-once micro-batch scaffold: parquet landing-dir stream,
    * AvailableNow, and the manifest txn guard — the batchId is recorded in
    * the manifest (Delta's txnAppId/txnVersion pattern) and a replayed batch
    * (crash after commit but before the checkpoint advanced) is skipped.
    * The txn identity is the checkpoint dir: stable across restarts, unique
    * per query (Spark's checkpoint lock prevents two live copies of one
    * query; vacuum preserves txn marks via the manifest sidecar). `act`
    * MUST commit with `txn = Some(checkpointDir -> batchId)`. */
  private def exactlyOnceStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      tableRoot: String,
      checkpointDir: String)(
      act: (VersionedTable, DataFrame, Long) => Unit): StreamingQuery = {
    spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val table = VersionedTable(tableRoot)
          if (!table.lastTxn(checkpointDir).exists(_ >= batchId))
            act(table, batch, batchId)
        }
      }
      .start()
  }

  /** Test-only fault injection for [[expectationsStream]]: throw between
    * the two sink appends, simulating the crash window the per-sink txn
    * guards exist for. */
  @volatile private[graft] var expectationsFailpoint: Boolean = false

  /** Streaming data quality — [[graft.etl.ExpectTransform]]'s quarantine
    * policy in the continuous funnel: each arriving micro-batch splits on
    * the named expectations (NULL = violation, the same 3VL rule); passing
    * rows APPEND to the clean table, failing rows — tagged with the broken
    * expectation names — to the quarantine table. EXACTLY-ONCE on BOTH
    * sinks with one txn identity: each table records (checkpoint, batchId)
    * with its own append and checks it independently, so a crash BETWEEN
    * the two appends replays the batch into ONLY the sink that missed it —
    * no duplicate on the one that committed, no loss on the other. The
    * file-source batch is deterministic under replay (same files, same
    * rows), so the recomputed split is identical on the retry. Cost per
    * batch: the two filtered writes, batch-sized. */
  def expectationsStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      cleanRoot: String,
      quarantineRoot: String,
      expectations: Seq[(String, String)],
      checkpointDir: String,
      maxFilesPerTrigger: Option[Int] = None): StreamingQuery = {
    import org.apache.spark.sql.functions.{array, array_compact, coalesce,
      col, concat_ws, expr, lit, not, size, when}
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    reader.parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val vio = array(expectations.map { case (en, cond) =>
            when(not(coalesce(expr(cond).cast("boolean"), lit(false))), lit(en))
          }: _*)
          val tagged = batch.withColumn("_violations", array_compact(vio))
          // an empty slice is SKIPPED, not appended: a clean steady-state
          // stream must not burn a quarantine version per batch (and vice
          // versa). Skipping leaves no txn mark, which is still replay-safe:
          // the retry recomputes the same deterministic empty slice and
          // skips again; the mark ratchet only ever carries batches that
          // actually wrote.
          val clean = VersionedTable(cleanRoot)
          if (!clean.lastTxn(checkpointDir).exists(_ >= batchId)) {
            val keep = tagged.filter(size(col("_violations")) === 0)
              .drop("_violations")
            if (!keep.isEmpty) {
              clean.append(keep, txn = Some(checkpointDir -> batchId))
              ()
            }
          }
          if (expectationsFailpoint)
            throw new IllegalStateException(
              "injected failure between the clean and quarantine appends")
          val quarantine = VersionedTable(quarantineRoot)
          if (!quarantine.lastTxn(checkpointDir).exists(_ >= batchId)) {
            val failed = tagged.filter(size(col("_violations")) > 0)
              .withColumn("_violations", concat_ws(",", col("_violations")))
            if (!failed.isEmpty) {
              quarantine.append(failed, txn = Some(checkpointDir -> batchId))
              ()
            }
          }
        }
      }
      .start()
  }

  /** Continuous SCD2: merge every arriving CDC micro-batch into the versioned
    * table. `stage` maps a raw batch to the staged merge source (the dual-row
    * trick, scd2-job.ipynb:298) given the current table snapshot. */
  def scd2MergeStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      tableRoot: String,
      stage: (DataFrame, DataFrame) => DataFrame,
      condition: String,
      whenMatchedUpdate: Option[Merge.MatchedUpdate],
      whenNotMatchedInsert: Option[Merge.NotMatchedInsert],
      checkpointDir: String): StreamingQuery =
    exactlyOnceStream(spark, landingDir, schema, tableRoot, checkpointDir) {
      (table, batch, batchId) =>
        val target = table.read(batch.sparkSession)
        val staged = stage(batch, target)
        table.commit(Merge.merge(target, staged, condition,
          whenMatchedUpdate = whenMatchedUpdate,
          whenNotMatchedInsert = whenNotMatchedInsert),
          txn = Some(checkpointDir -> batchId))
        ()
    }

  /** Continuous ingest: append every arriving micro-batch to the versioned
    * table — the streaming face of the batch-ingest path (commit cost ∝
    * batch; the manifest carries prior files forward). Exactly-once via the
    * same txn protocol as [[scd2MergeStream]]: the batchId is stamped into
    * the manifest and a replayed batch (crash between commit and checkpoint
    * advance) is skipped, so restarts cannot duplicate rows. */
  def appendStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      tableRoot: String,
      checkpointDir: String): StreamingQuery =
    exactlyOnceStream(spark, landingDir, schema, tableRoot, checkpointDir) {
      (table, batch, batchId) =>
        table.append(batch, txn = Some(checkpointDir -> batchId))
        ()
    }

  /** Continuous incremental dedup: admit every arriving document
    * micro-batch against the lake-resident signature store
    * ([[graft.dedup.SignatureStore]]) and append the per-document
    * decisions to a versioned `decisions` table. Exactly-once decisions
    * via the same manifest txn stamp as [[appendStream]]; the STORE
    * appends need no stamp — they are naturally idempotent: a replayed
    * batch's documents reject as exact duplicates of their own committed
    * signatures (checksum match → empty admitted set → no second append),
    * and if the crash preceded the store commit, re-admitting is simply
    * the first admission. The decisions table must exist (schema-bearing
    * v0); the store must be built. */
  def dedupAdmitStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      storeRoot: String,
      decisionsRoot: String,
      checkpointDir: String): StreamingQuery =
    exactlyOnceStream(spark, landingDir, schema, decisionsRoot, checkpointDir) {
      (decisionsT, batch, batchId) =>
        val d = graft.dedup.SignatureStore.admit(batch.sparkSession, storeRoot, batch)
        decisionsT.append(d, txn = Some(checkpointDir -> batchId))
        ()
    }

  /** Continuous incremental EMBEDDING dedup — [[dedupAdmitStream]]'s
    * vector-space sibling: each arriving embedding micro-batch admits
    * against the lake-resident IVF vector store
    * ([[graft.dedup.VectorStore]]), decisions append exactly-once to a
    * versioned table via the manifest txn stamp (a stamped replay skips
    * the whole batch, admit included). The unstamped-crash window (store
    * append committed, decisions stamp not) replays to the same
    * no-duplicate store state: the vector finds ITSELF at cosine 1 and
    * rejects — the same at-least-once caveat [[dedupAdmitStream]]
    * documents, with the decision row then naming its own id. */
  def vectorAdmitStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      storeRoot: String,
      decisionsRoot: String,
      checkpointDir: String): StreamingQuery =
    exactlyOnceStream(spark, landingDir, schema, decisionsRoot, checkpointDir) {
      (decisionsT, batch, batchId) =>
        val d = graft.dedup.VectorStore.admit(batch.sparkSession, storeRoot, batch)
        decisionsT.append(d, txn = Some(checkpointDir -> batchId))
        ()
    }

  /** Continuous BM25 index maintenance — the lexical sibling of
    * [[vectorAdmitStream]]: each landed micro-batch of documents admits
    * into the lake-resident inverted index
    * ([[graft.dedup.TextIndexStore.admit]]), stamped `(checkpointDir,
    * batchId)` on the postings append. Exactly-once lives INSIDE admit
    * here (not in the funnel): a replayed batch is recognized via the
    * postings table's idempotent-writer marks and skipped — after any torn
    * prior admit is rolled forward — so a crash at any point between the
    * admit's three commits restarts cleanly. `fingerprint` is the corpus
    * fingerprint the store should record once the batch is in. */
  def textAdmitStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      storeRoot: String,
      fingerprint: String,
      checkpointDir: String): StreamingQuery =
    spark.readStream.schema(schema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          graft.dedup.TextIndexStore.admit(batch.sparkSession, storeRoot,
            batch, fingerprint, txn = Some(checkpointDir -> batchId))
          ()
        }
      }
      .start()

  /** Continuous SCD1 upsert (CDC "latest state per key"): each micro-batch
    * is reduced to its newest row per `key` (descending `orderCols`,
    * lexicographic, so include a unique tiebreaker column), then merged into
    * the versioned table through the file-pruned copy-on-write path —
    * matched rows are replaced only when the batch row is STRICTLY newer,
    * unmatched rows insert. Newest-wins makes the final state independent
    * of micro-batch arrival order: a late-replayed old batch cannot regress
    * a key. Exactly-once via the manifest txn stamp, like [[appendStream]];
    * cost per batch is the pruned merge (overlapping files, not the table).
    * The table must exist (commit an empty, schema-bearing v0 first). */
  def cdcUpsertStream(
      spark: SparkSession,
      landingDir: String,
      schema: StructType,
      tableRoot: String,
      key: String,
      orderCols: Seq[String],
      checkpointDir: String,
      mor: Boolean = false): StreamingQuery = {
    require(orderCols.nonEmpty, "orderCols must name at least one ordering column")
    exactlyOnceStream(spark, landingDir, schema, tableRoot, checkpointDir) {
      (table, batch, batchId) =>
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy(col(key)).orderBy(orderCols.map(col(_).desc): _*)
        val latest = batch.withColumn("__rn", row_number().over(w))
          .filter(col("__rn") === 1).drop("__rn")
        // strictly-newer in lexicographic (orderCols) order
        val newer = orderCols.indices.map { i =>
          val eqs = (0 until i).map(j => s"source.${orderCols(j)} = target.${orderCols(j)}")
          (eqs :+ s"source.${orderCols(i)} > target.${orderCols(i)}")
            .mkString("(", " AND ", ")")
        }.mkString(" OR ")
        val setAll = schema.fieldNames.map(c => c -> s"source.$c").toMap
        val cond = s"source.$key = target.$key"
        val upd = Some(Merge.MatchedUpdate(Some(newer), setAll))
        val ins = Some(Merge.NotMatchedInsert(None, Map.empty))
        // mor: each micro-batch writes DV tombstones + the batch itself
        // (O(changed rows)) instead of rewriting the touched files — the
        // steady-state shape for continuous CDC into a wide 100 TB table,
        // with compaction amortizing the read-side DV tax off-path
        if (mor) table.mergeMor(spark, latest, cond, key, key, upd, None, ins,
          txn = Some(checkpointDir -> batchId))
        else table.mergeCow(spark, latest, cond, key, key, upd, None, ins,
          txn = Some(checkpointDir -> batchId))
        ()
    }
  }

  /** Downstream REPLICA maintenance from a row-tracked source's change
    * feed: `readChangeFeed` over the `graft-table` stream source → per
    * micro-batch, each row id's changes collapse to their LAST state
    * (newest commit wins; within one commit the insert post-image beats
    * its delete pre-image) → one MERGE keyed on the ROW ID applies
    * upserts and deletes to the replica. This replicates a table with NO
    * natural key — the consumer capability row tracking
    * ([[graft.table.VersionedTable.enableRowTracking]]) exists for: without
    * stable ids a CDF delete+insert pair is indistinguishable from an
    * unrelated delete and insert. Exactly-once: the merge's txn mark
    * commits atomically with the replica data, so a replayed batch is
    * skipped. Per-batch cost is O(changed rows) + the merge's file-pruned
    * rewrite — never the replica's size. */
  def cdcReplicaStream(
      spark: SparkSession,
      sourceRoot: String,
      replicaRoot: String,
      idCol: String,
      checkpointDir: String): StreamingQuery = {
    import org.apache.spark.sql.expressions.Window
    spark.readStream.format("graft-table")
      .option("path", sourceRoot)
      .option("readChangeFeed", "true")
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          val replica = VersionedTable(replicaRoot)
          if (!replica.lastTxn(checkpointDir).exists(_ >= batchId)) {
            val w = Window.partitionBy(col(idCol))
              .orderBy(col("_commit_version").desc,
                expr("CASE WHEN _change_type = 'insert' THEN 1 ELSE 0 END").desc)
            val latest = batch.withColumn("__rn", row_number().over(w))
              .filter(col("__rn") === 1).drop("__rn")
            val dataCols = batch.columns
              .filterNot(Set("_change_type", "_commit_version").contains)
            val setAll = dataCols.map(c => c -> s"source.$c").toMap
            replica.mergeCow(spark, latest,
              s"source.$idCol = target.$idCol", idCol, idCol,
              whenMatchedUpdate = Some(Merge.MatchedUpdate(
                Some("source._change_type = 'insert'"), setAll)),
              whenMatchedDelete = Some(Merge.MatchedDelete(
                Some("source._change_type = 'delete'"))),
              whenNotMatchedInsert = Some(Merge.NotMatchedInsert(
                Some("source._change_type = 'insert'"), setAll)),
              txn = Some(checkpointDir -> batchId))
            ()
          }
        }
      }
      .start()
  }

  /** CONTINUOUS index-follows-table maintenance — the streaming composition
    * of [[cdcReplicaStream]]'s trigger with the store's own batch sync verb
    * ([[graft.dedup.TextIndexStore.syncFromTable]]): `readChangeFeed` over
    * the `graft-table` stream source fires a micro-batch whenever the base
    * table commits; each non-empty batch drives ONE sync — evict the
    * changed ids' stale postings, re-admit their current rows, advance the
    * store's `syncedVersion` cursor — stamped `(checkpoint, batchId)` on
    * the admit's postings append.
    *
    * Exactly-once is the CURSOR's, deliberately (the q130 proof, unchanged
    * by streaming): a batch replayed after a completed sync finds
    * `head <= syncedVersion` and no-ops; a batch replayed after an
    * INTERRUPTED sync converges (evict removes exactly what the interrupted
    * pass admitted, the re-admit restores it, the torn-commit markers roll
    * the verb-level crashes forward). The `lastTxn` guard in front is a
    * fast-skip, not the safety. Note the sync targets the table HEAD at
    * fire time, not the batch's end version — a sync can run AHEAD of its
    * batch, and the cursor makes the later batches loud no-ops; the batch
    * CONTENT is only the trigger (the verb re-reads the feed range itself,
    * change-sized either way).
    *
    * This is the production shape for "search index tracks a mutating
    * table" — the reference's CDC-merge idiom (scd2-job.ipynb:298-353)
    * extended to derived state: at 100 TB the feed batches are
    * change-sized, the evict/admit touch only changed buckets, and the
    * checkpoint restarts resume with zero re-work. */
  def textIndexSyncStream(
      spark: SparkSession,
      sourceRoot: String,
      storeRoot: String,
      fingerprint: String,
      checkpointDir: String): StreamingQuery =
    changeFeedTrigger(spark, sourceRoot, checkpointDir,
      s"$storeRoot/postings") { batchId =>
      graft.dedup.TextIndexStore.syncFromTable(spark, storeRoot,
        VersionedTable(sourceRoot), fingerprint,
        txn = Some(checkpointDir -> batchId))
      ()
    }

  /** The ANN twin of [[textIndexSyncStream]]: continuous
    * [[graft.dedup.VectorStore.syncFromTable]] off the embedding table's
    * change feed. Same cursor-owned exactly-once; the vector store's admit
    * is replay-idempotent by stored-id recognition, so no txn stamp is
    * needed on its appends. */
  def vectorSyncStream(
      spark: SparkSession,
      sourceRoot: String,
      storeRoot: String,
      checkpointDir: String): StreamingQuery =
    changeFeedTrigger(spark, sourceRoot, checkpointDir,
      s"$storeRoot/cents") { _ =>
      graft.dedup.VectorStore.syncFromTable(spark, storeRoot,
        VersionedTable(sourceRoot))
      ()
    }

  /** CONTINUOUS RTBF drain — the streaming face of
    * [[graft.etl.ForgetBatch]]: forget requests appended to the request
    * table fire micro-batches (its own change feed is the trigger), and
    * each batch runs one cursor-guarded batched drain — every pending id
    * erased from every configured store in ONE evict per store. The same
    * convergence argument as the batch stage: the `forgetCursor` advances
    * after the evicts, replayed ids erase nothing, so crash/replay at any
    * point converges; requests arriving DURING a drain are past the
    * cursor and fire the next batch. */
  def forgetDrainStream(
      spark: SparkSession,
      requestsRoot: String,
      idColumn: String,
      textStoreURI: Option[String] = None,
      vectorStoreURI: Option[String] = None,
      dedupStoreURI: Option[String] = None,
      fingerprint: String = "forget",
      checkpointDir: String): StreamingQuery =
    changeFeedTrigger(spark, requestsRoot, checkpointDir, requestsRoot) { _ =>
      graft.etl.ForgetBatch("forget-drain", requestsRoot, idColumn,
        textStoreURI, vectorStoreURI, dedupStoreURI, fingerprint, None)
        .execute(spark, Map.empty)
      ()
    }

  /** Shared scaffold for the sync streams: CDF-triggered micro-batches,
    * AvailableNow, a `lastTxn` fast-skip keyed on the store's anchor table. */
  private def changeFeedTrigger(
      spark: SparkSession,
      sourceRoot: String,
      checkpointDir: String,
      anchorRoot: String)(act: Long => Unit): StreamingQuery =
    spark.readStream.format("graft-table")
      .option("path", sourceRoot)
      .option("readChangeFeed", "true")
      .load()
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .trigger(Trigger.AvailableNow())
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty &&
            !VersionedTable(anchorRoot).lastTxn(checkpointDir).exists(_ >= batchId)) {
          act(batchId)
        }
      }
      .start()

  /** Watermarked tumbling-window aggregation over an event stream — the
    * streaming formulation of q12_events_window. */
  def windowedEventCounts(
      events: DataFrame,
      tsCol: String = "ts",
      lateness: String = "1 hour",
      windowLen: String = "1 hour"): DataFrame =
    events
      .withWatermark(tsCol, lateness)
      .groupBy(window(col(tsCol), windowLen), col("event_type"))
      // decimal-exact sum: state-store accumulation order must not leak into
      // the result (the 2dp testdata values sum exactly as DECIMAL)
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast("decimal(14,2)")).as("sum_value"))

  /** Streaming exact dedup: drop rows whose dedup key was already seen,
    * across micro-batches, with state bounded by the watermark horizon
    * (`dropDuplicatesWithinWatermark` — duplicates in a training-data feed
    * cluster in time, so the horizon is the honest state bound; unbounded
    * `dropDuplicates` state would grow with the corpus). The key is
    * typically a content checksum (d1's md5) computed upstream. */
  def streamingDedup(
      stream: DataFrame,
      keyCols: Seq[String],
      tsCol: String = "ts",
      horizon: String = "1 hour"): DataFrame =
    stream
      .withWatermark(tsCol, horizon)
      .dropDuplicatesWithinWatermark(keyCols.head, keyCols.tail: _*)

  /** Stateful streaming per-user event counting via `mapGroupsWithState` —
    * the custom-state tier of SURVEY.md §2.9: arbitrary per-key state kept in
    * the state store across micro-batches (here: a running (count, sum)
    * pair; real pipelines keep session windows, dedup sets, ML features).
    * Update-mode output emits the refreshed state per key per batch. */
  def statefulUserTotals(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.GroupStateTimeout
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[UserTotal, UserTotal](GroupStateTimeout.NoTimeout) {
        (userId, rows, state) =>
          val prev = state.getOption.getOrElse(UserTotal(userId, 0L, 0.0))
          var n = prev.n
          var sum = prev.sum_value
          rows.foreach { e => n += 1; sum += e.value }
          val next = UserTotal(userId, n, sum)
          state.update(next)
          next
      }
  }

  /** Per-user running totals via `transformWithState` — Spark 4's
    * arbitrary-state v2 API (typed `ValueState` handles in the RocksDB
    * store, optional per-state TTL, timers): the successor to
    * `mapGroupsWithState` and the API a new pipeline should target. Same
    * semantics as [[statefulUserTotals]] (update-mode refreshed totals per
    * key per batch), kept side-by-side so both state APIs stay covered.
    * Requires the RocksDB state-store provider (the v2 operator does not
    * run on the default HDFS-backed store). */
  def statefulUserTotalsTws(events: org.apache.spark.sql.Dataset[UserEvent])
      : org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsProcessor,
        TimeMode.None(), OutputMode.Update())
  }

  /** Timer-driven session windows via `transformWithState` (see
    * [[SessionTimerProcessor]]): event-time mode with a `delay` watermark;
    * idle sessions are emitted by their event-time timer when the watermark
    * passes `session_end + gap` — the half of Spark 4's streaming-state
    * story (timers) that [[sessionWindows]] cannot express. Requires the
    * RocksDB state-store provider like every v2-state operator. */
  def sessionWindowsTws(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
      gapMinutes: Int = 30, delay: String = "1 minute")
      : org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events.toDF("user_id", "ts")
      .withWatermark("ts", delay)
      .as[(Long, java.sql.Timestamp)]
      .groupByKey(_._1)
      .transformWithState(new SessionTimerProcessor(gapMinutes),
        TimeMode.EventTime(), OutputMode.Append())
  }

  /** [[statefulUserTotalsTws]] with bounded state retention: totals whose
    * key stays idle past `ttlMs` of processing time are evicted by the
    * state store (see [[RunningTotalsTtlProcessor]]). */
  def statefulUserTotalsTwsTtl(events: org.apache.spark.sql.Dataset[UserEvent],
      ttlMs: Long): org.apache.spark.sql.Dataset[UserTotal] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    events
      .groupByKey(_.user_id)
      .transformWithState(new RunningTotalsTtlProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Update())
  }

  /** Session windows via `flatMapGroupsWithState` — the most general custom
    * -state tier of Structured Streaming (SURVEY.md §2.9): per-user state
    * carries the open session across micro-batches; when an event arrives
    * past the gap, the closed session is EMITTED and the state restarts.
    * `ProcessingTimeTimeout` + an explicit flush key is avoided here by
    * closing sessions on the next event; a production pipeline would add
    * `GroupStateTimeout.EventTimeTimeout` to flush idle sessions at the
    * watermark. Emitted rows are append-mode friendly (only closed sessions
    * leave the operator). Within a batch the iterator is NOT time-ordered by
    * contract, so events are sorted in-memory per (user, batch) — bounded by
    * a user's per-batch volume, the honest per-key cost of custom state. */
  def sessionWindows(events: org.apache.spark.sql.Dataset[(Long, java.sql.Timestamp)],
      gapMinutes: Int = 30): org.apache.spark.sql.Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    val gapMicros = gapMinutes * 60L * 1000000L
    def micros(t: java.sql.Timestamp): Long = t.getTime * 1000L + t.getNanos / 1000 % 1000
    def ts(m: Long): java.sql.Timestamp = {
      val t = new java.sql.Timestamp(m / 1000)
      t.setNanos((m % 1000000L).toInt * 1000)
      t
    }
    events.groupByKey(_._1)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (userId, rows, state) =>
          val sorted = rows.map(r => micros(r._2)).toArray.sorted
          var closed = List.empty[ClosedSession]
          var cur = state.getOption
          sorted.foreach { m =>
            cur match {
              // late arrival from a PREVIOUS micro-batch (in-batch events are
              // sorted, so only cross-batch events can precede s.last): an
              // event within the open session's span folds in, widening the
              // start if needed — without this guard the negative gap would
              // satisfy `m - s.last <= gap` and leave session_end earlier
              // than absorbed events
              case Some(s) if m < s.start - gapMicros =>
                () // too late to attribute to any open session: drop
              case Some(s) if m <= s.last =>
                cur = Some(s.copy(start = math.min(s.start, m), n = s.n + 1))
              case Some(s) if m - s.last <= gapMicros =>
                cur = Some(s.copy(last = m, n = s.n + 1))
              case Some(s) =>
                closed ::= ClosedSession(userId, ts(s.start), ts(s.last), s.n)
                cur = Some(SessionState(m, m, 1))
              case None =>
                cur = Some(SessionState(m, m, 1))
            }
          }
          cur.foreach(state.update)
          closed.reverseIterator
      }
  }

  /** Stateful per-key session counting via mapGroupsWithState-style gap logic
    * — batch-testable streaming sessionization (gap > 30 min starts a new
    * session), kept as a composable transform. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
    events
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_start",
        when(col("prev_ts").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev_ts")) > gapMinutes * 60L * 1000000L, 1)
          .otherwise(0))
      .withColumn("session_id",
        sum(col("is_start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
  }
}
