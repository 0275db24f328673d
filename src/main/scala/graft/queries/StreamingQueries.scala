package graft.queries

import org.apache.spark.sql.functions._

/** Streaming-path queries surfaced through the Verify gate: the streaming
  * result must equal the batch formulation of the same logical query
  * (micro-batch CDC model, SURVEY.md §2.9). */
object StreamingQueries {

  /** q26: watermarked tumbling-window aggregation executed AS A STREAM
    * (readStream → AvailableNow → memory sink), returned as a plain
    * DataFrame. The DuckDB oracle is the batch formulation — passing means
    * the streaming and batch paths agree bit-for-bit. */
  val q26StreamingWindow: Q = Q(
    "q26_streaming_window",
    (spark, dir) => {
      // land the events as parquet (micro-batch CDC landing dir shape)
      val landing = java.nio.file.Files.createTempDirectory("graft-stream-").toString
      val ev = Tables.table(spark, dir, "events")
      ev.write.mode("overwrite").parquet(landing)
      val stream = spark.readStream.schema(ev.schema).parquet(landing)
      val agg = graft.streaming.StreamingEtl.windowedEventCounts(
        stream, lateness = "1 hour", windowLen = "1 hour")
      val qname = s"q26_sink_${System.nanoTime()}"
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      q.processAllAvailable()
      q.stop()
      spark.table(qname).select(
        col("window.start").as("hour_start"),
        col("event_type"),
        col("n"),
        expr("CAST(sum_value AS DOUBLE)").as("sum_value"))
    },
    Some(
      """SELECT date_trunc('hour', ts::TIMESTAMP) AS hour_start, event_type,
        |  count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY 1, 2""".stripMargin))

  /** q27: sketch aggregates — HyperLogLog++ distinct estimation run NEXT TO
    * the exact counts it approximates. The sketch's raw estimate differs
    * between engines (HLL++ internals are not portable SQL), so the gate
    * contract is: RETURN the exact counts (hash-matchable by DuckDB) plus
    * an in-query assertion that every group's estimate landed within ±15 %
    * of its exact count (3× the default 5 % rsd) — a drifting sketch flips
    * `approx_within_bound` to false and the hash check fails loudly. At
    * scale the sketch is the point: constant memory per group vs the exact
    * count's shuffle of every distinct value. */
  val q27SketchDistinct: Q = Q(
    "q27_sketch_distinct",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql(
        """SELECT l_returnflag,
          |  count(DISTINCT l_partkey) AS exact_parts,
          |  count(DISTINCT l_orderkey) AS exact_orders,
          |  (abs(approx_count_distinct(l_partkey) - count(DISTINCT l_partkey))
          |     <= 0.15 * count(DISTINCT l_partkey)
          |   AND abs(approx_count_distinct(l_orderkey) - count(DISTINCT l_orderkey))
          |     <= 0.15 * count(DISTINCT l_orderkey)) AS approx_within_bound
          |FROM lineitem GROUP BY l_returnflag""".stripMargin)
    },
    Some(
      """SELECT l_returnflag,
        |  count(DISTINCT l_partkey) AS exact_parts,
        |  count(DISTINCT l_orderkey) AS exact_orders,
        |  TRUE AS approx_within_bound
        |FROM lineitem GROUP BY l_returnflag""".stripMargin))

  /** q38: KMV distinct sketch (`graft.functions.KmvDistinct`) — unlike
    * q27's HLL, the k-minimum-values estimate is DETERMINISTIC and
    * reproducible in ANSI SQL, so this sketch gets a full exact DuckDB
    * oracle: the oracle recomputes the k-th smallest md5 and applies the
    * identical (k-1)/h_k arithmetic (generated from the same Scala code,
    * [[graft.functions.KmvDistinct.oracleEstimateSql]]). The scale story is
    * the same as any sketch: 32k bytes of state per group, map-side
    * partials, no shuffle of distinct values. */
  val q38KmvSketch: Q = {
    val k = 256
    val est = graft.functions.KmvDistinct.oracleEstimateSql(k, "hx")
    Q(
      "q38_kmv_sketch",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        graft.functions.GraftFunctions.registerAll(spark)
        spark.sql(
          s"""SELECT l_returnflag,
             |  kmv_distinct(CAST(l_partkey AS STRING), $k) AS approx_parts,
             |  count(DISTINCT l_partkey) AS exact_parts
             |FROM lineitem GROUP BY l_returnflag""".stripMargin)
      },
      Some(
        s"""WITH h AS (
           |  SELECT DISTINCT l_returnflag, md5(CAST(l_partkey AS STRING)) AS hx
           |  FROM lineitem),
           |r AS (
           |  SELECT l_returnflag, hx,
           |    row_number() OVER (PARTITION BY l_returnflag ORDER BY hx) AS rn,
           |    count(*) OVER (PARTITION BY l_returnflag) AS nd
           |  FROM h),
           |kth AS (
           |  SELECT l_returnflag,
           |    CASE WHEN nd < $k THEN CAST(nd AS BIGINT) ELSE $est END AS approx_parts
           |  FROM r WHERE rn = least(nd, $k)),
           |ex AS (
           |  SELECT l_returnflag, count(DISTINCT l_partkey) AS exact_parts
           |  FROM lineitem GROUP BY l_returnflag)
           |SELECT kth.l_returnflag, kth.approx_parts, ex.exact_parts
           |FROM kth JOIN ex ON kth.l_returnflag = ex.l_returnflag""".stripMargin))
  }

  /** q51: streaming exact dedup through the gate — the events table doubled
    * (every row an exact duplicate) lands as one micro-batch;
    * `dropDuplicatesWithinWatermark` on the full row key must recover the
    * original rows exactly (StreamingEtl.streamingDedup — state bounded by
    * the watermark horizon, the honest bound when duplicates cluster in
    * time). One AvailableNow batch keeps the result deterministic: no
    * cross-batch watermark eviction can race the duplicates. */
  val q51StreamingDedup: Q = Q(
    "q51_streaming_dedup",
    (spark, dir) => {
      val landing = java.nio.file.Files.createTempDirectory("graft-sdedup-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.union(ev).repartition(4).write.mode("overwrite").parquet(landing)
      val stream = spark.readStream.schema(ev.schema).parquet(landing)
      val deduped = graft.streaming.StreamingEtl.streamingDedup(
        stream, keyCols = Seq("event_id", "user_id", "event_type"),
        tsCol = "ts", horizon = "1 hour")
      val qname = s"q51_sink_${System.nanoTime()}"
      val q = deduped.writeStream.outputMode("append")
        .format("memory").queryName(qname).start()
      q.processAllAvailable()
      q.stop()
      spark.table(qname).select("event_id", "ts", "user_id", "event_type", "value")
    },
    Some(
      """SELECT event_id, ts, user_id, event_type, value
        |FROM events""".stripMargin))

  /** q52: watermarked stream-stream inner join — view events join purchase
    * events for the same user within the next 30 minutes (the
    * impression→conversion shape). Both sides are real streams with
    * watermarks and a time-range join condition, so Spark bounds the join
    * state by the event-time constraint — the mechanism that keeps
    * stream-stream joins feasible at scale. Oracle: the identical batch
    * join. */
  val q52StreamStreamJoin: Q = Q(
    "q52_stream_stream_join",
    (spark, dir) => {
      val landing = java.nio.file.Files.createTempDirectory("graft-ssj-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.write.mode("overwrite").parquet(landing)
      def stream = spark.readStream.schema(ev.schema).parquet(landing)
      val views = stream.filter(col("event_type") === "view")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      val buys = stream.filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"),
          col("user_id").as("buy_user"), col("value"))
      val joined = views.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"))
      val qname = s"q52_sink_${System.nanoTime()}"
      // AvailableNow, not processAllAvailable: the post-data watermark
      // batch (pure state eviction — ~3s of state-store commits across
      // 32 partitions × 4 join stores, measured at sf0.1) is then ALWAYS
      // planned before termination instead of racing processAllAvailable's
      // idle check. The race made the benched time bimodal ({1,2}-batch
      // runs — the r10→r12 "regression" was the mode flipping, not code).
      val q = joined.writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("memory").queryName(qname).start()
      q.awaitTermination()
      q.stop()
      spark.table(qname)
        .select("view_id", "buy_id", "user_id", "view_ts", "buy_ts", "value")
    },
    Some(
      """SELECT v.event_id AS view_id, b.event_id AS buy_id, v.user_id,
        |  v.ts AS view_ts, b.ts AS buy_ts, b.value
        |FROM events v JOIN events b
        |  ON b.user_id = v.user_id
        | AND b.event_type = 'purchase' AND v.event_type = 'view'
        | AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE""".stripMargin))

  /** q67: flatMapGroupsWithState session windows through the gate — the
    * custom-state tier of Structured Streaming (SURVEY.md §2.9) gated by an
    * ANSI-SQL oracle (gap-based sessionization via window functions). One
    * AvailableNow-style batch: every user's LAST session stays open in state
    * and is never emitted, so the oracle anti-joins each user's final
    * session away. State is per-user O(1) — the scale story for
    * sessionization over unbounded streams. */
  val q67StreamSessions: Q = Q(
    "q67_stream_sessions",
    (spark, dir) => {
      import spark.implicits._
      val landing = java.nio.file.Files.createTempDirectory("graft-sess-").toString
      val ev = Tables.table(spark, dir, "events").select("user_id", "ts")
      ev.write.mode("overwrite").parquet(landing)
      val stream = spark.readStream.schema(ev.schema).parquet(landing)
        .as[(Long, java.sql.Timestamp)]
      val qname = s"q67_sink_${System.nanoTime()}"
      val q = graft.streaming.StreamingEtl.sessionWindows(stream).writeStream
        .outputMode("append").format("memory").queryName(qname).start()
      q.processAllAvailable()
      q.stop()
      spark.table(qname)
        .select("user_id", "session_start", "session_end", "n_events")
    },
    Some(
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |agg AS (
        |  SELECT user_id, sid, min(ts) AS session_start,
        |    max(ts) AS session_end, count(*) AS n_events
        |  FROM s GROUP BY user_id, sid),
        |last AS (SELECT user_id, max(sid) AS sid FROM agg GROUP BY user_id)
        |SELECT a.user_id, a.session_start, a.session_end, a.n_events
        |FROM agg a
        |WHERE NOT EXISTS (
        |  SELECT 1 FROM last l WHERE l.user_id = a.user_id AND l.sid = a.sid)""".stripMargin))

  /** q75: continuous CDC upsert — the events table arrives as three
    * micro-batches (one stream restart each, same checkpoint) and
    * [[graft.streaming.StreamingEtl.cdcUpsertStream]] folds every batch into
    * a versioned table keyed by user, newest event winning (strictly-newer
    * merge condition ⇒ batch arrival order cannot change the final state).
    * The oracle is the batch formulation: latest row per user over ALL
    * events. Exercises streaming + file-pruned copy-on-write merge + the
    * exactly-once txn stamp end-to-end through the correctness gate. */
  val q75StreamCdcUpsert: Q = Q(
    "q75_stream_cdc_upsert",
    (spark, dir) => {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-cdc-").toString
      val landing = s"$base/landing"
      val tableRoot = s"$base/table"
      val ckpt = s"$base/ckpt"
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
      // empty v0 pins the table schema so the first merge has a target
      graft.table.VersionedTable(tableRoot).commit(ev.limit(0))
      Seq(0, 1, 2).foreach { i =>
        ev.filter(pmod($"event_id", lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(landing)
        val q = graft.streaming.StreamingEtl.cdcUpsertStream(spark, landing,
          ev.schema, tableRoot, "user_id", Seq("ts", "event_id"), ckpt)
        // a timed-out batch must fail loudly here — proceeding would read a
        // partially-updated table and report a confusing oracle mismatch
        require(q.awaitTermination(300000), s"CDC batch $i timed out")
      }
      graft.table.VersionedTable(tableRoot).read(spark)
        .select($"user_id", $"ts".as("last_ts"),
          $"event_type".as("last_type"), $"value".as("last_value"))
    },
    Some(
      """SELECT user_id, ts::TIMESTAMP AS last_ts, event_type AS last_type,
        |  value AS last_value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin))

  /** q88: watermarked stream-stream LEFT OUTER join — views that did NOT
    * convert within 30 minutes surface with null purchase columns. The
    * null-padded row for an unmatched view can only be emitted once the
    * watermark proves no matching purchase can still arrive (state eviction
    * — the mechanism that bounds outer-join state at scale); views too near
    * the stream's end are still held open, so BOTH the streaming result and
    * the batch oracle restrict to views at least 2 hours before max(ts) — a
    * margin safely past the 1h-watermark + 30min-window decision boundary,
    * making the gate deterministic. */
  val q88StreamOuterJoin: Q = Q(
    "q88_stream_outer_join",
    (spark, dir) => {
      val landing = java.nio.file.Files.createTempDirectory("graft-soj-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.write.mode("overwrite").parquet(landing)
      val cutoff = ev.agg(org.apache.spark.sql.functions.max("ts")).head.getTimestamp(0)
      def stream = spark.readStream.schema(ev.schema).parquet(landing)
      val views = stream.filter(col("event_type") === "view")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("view_id"), col("ts").as("view_ts"),
          col("user_id"))
      val buys = stream.filter(col("event_type") === "purchase")
        .withWatermark("ts", "1 hour")
        .select(col("event_id").as("buy_id"), col("ts").as("buy_ts"),
          col("user_id").as("buy_user"), col("value"))
      val joined = views.join(buys,
        col("user_id") === col("buy_user") &&
          col("buy_ts") >= col("view_ts") &&
          col("buy_ts") <= col("view_ts") + expr("INTERVAL 30 MINUTES"),
        "left_outer")
      val qname = s"q88_sink_${System.nanoTime()}"
      // AvailableNow is CORRECTNESS here, not just determinism: the
      // null-padded outer rows are emitted by the post-data watermark
      // batch (state eviction), which processAllAvailable only awaited by
      // luck of its idle-check timing — a latent oracle flake. AvailableNow
      // terminates only after that batch is planned and run.
      val q = joined.writeStream.outputMode("append")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .format("memory").queryName(qname).start()
      q.awaitTermination()
      q.stop()
      spark.table(qname)
        .filter(col("view_ts") < lit(cutoff) - expr("INTERVAL 2 HOURS"))
        .select("view_id", "user_id", "view_ts", "buy_id", "buy_ts", "value")
    },
    Some(
      """SELECT v.event_id AS view_id, v.user_id, v.ts AS view_ts,
        |  b.event_id AS buy_id, b.ts AS buy_ts, b.value
        |FROM (SELECT * FROM events WHERE event_type = 'view') v
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') b
        |  ON b.user_id = v.user_id
        | AND b.ts >= v.ts AND b.ts <= v.ts + INTERVAL 30 MINUTE
        |WHERE v.ts < (SELECT max(ts) FROM events) - INTERVAL 2 HOUR""".stripMargin))

  /** q92: per-user running totals via transformWithState — Spark 4's
    * arbitrary-state v2 API (typed ValueState in the RocksDB store) through
    * the gate: update-mode totals after draining the stream must equal the
    * batch GROUP BY. Decimal-exact sums so state-fold order is invisible to
    * the hash compare. The RocksDB provider is required by the v2 operator
    * and restored afterwards (other streaming gates run on the default
    * store). */
  val q92StreamTws: Q = Q(
    "q92_stream_tws",
    (spark, dir) => {
      import spark.implicits._
      val landing = java.nio.file.Files.createTempDirectory("graft-tws-").toString
      // land CENTS (integer-valued doubles): the processor folds doubles in
      // arrival order, and only integer addition is order-invariant at the
      // bit level — the oracle's decimal sum then matches exactly
      Tables.table(spark, dir, "events")
        .selectExpr("user_id",
          "CAST(round(CAST(value AS DECIMAL(14,2)) * 100) AS DOUBLE) AS value")
        .write.mode("overwrite").parquet(landing)
      val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(landing).schema
        val stream = spark.readStream.schema(schema).parquet(landing)
          .as[graft.streaming.UserEvent]
        val qname = s"q92_sink_${System.nanoTime()}"
        val q = graft.streaming.StreamingEtl.statefulUserTotalsTws(stream)
          .writeStream.outputMode("update").format("memory").queryName(qname).start()
        q.processAllAvailable()
        q.stop()
        // single AvailableNow-style batch: the last update per key IS the
        // total. n is strictly increasing per key, so max_by picks the final
        // update even if values are negative (a plain max(sum_value) would
        // pick a mid-stream snapshot for non-monotone running sums); cents
        // back to currency with one exact-rounding division
        spark.table(qname).groupBy("user_id")
          .agg(max("n").as("n"),
            (max_by(col("sum_value"), col("n")) / lit(100.0)).as("sum_value"))
      } finally {
        prior match {
          case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    },
    Some(
      """SELECT user_id, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events GROUP BY user_id""".stripMargin))

  /** q98: TIMER-driven session windows via transformWithState — the
    * capability gap between q67's flatMapGroupsWithState variant and Spark
    * 4's v2 state API: each user's final session is emitted by its
    * EVENT-TIME TIMER once the stream's watermark passes `session_end +
    * gap`, instead of staying open forever waiting for a next event. The
    * oracle therefore includes every non-final session (in-batch closures,
    * q67 semantics) PLUS the final sessions whose expiry precedes the final
    * watermark (`max(ts)` at zero delay) — the timer-fired tail q67 had to
    * anti-join away. RocksDB provider required/restored as in q92. */
  val q98TwsSessionTimers: Q = Q(
    "q98_tws_session_timers",
    (spark, dir) => {
      import spark.implicits._
      val landing = java.nio.file.Files.createTempDirectory("graft-twt-").toString
      val ev = Tables.table(spark, dir, "events").select("user_id", "ts")
      ev.write.mode("overwrite").parquet(landing)
      val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      try {
        val schema = spark.read.parquet(landing).schema
        val stream = spark.readStream.schema(schema).parquet(landing)
          .as[(Long, java.sql.Timestamp)]
        val qname = s"q98_sink_${System.nanoTime()}"
        val q = graft.streaming.StreamingEtl
          .sessionWindowsTws(stream, gapMinutes = 30, delay = "0 seconds")
          .writeStream.outputMode("append").format("memory").queryName(qname).start()
        q.processAllAvailable()
        q.stop()
        spark.table(qname)
          .select("user_id", "session_start", "session_end", "n_events")
      } finally {
        prior match {
          case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
          case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
        }
      }
    },
    Some(
      """WITH g AS (
        |  SELECT user_id, ts,
        |    CASE WHEN lag(ts) OVER (PARTITION BY user_id ORDER BY ts) IS NULL
        |           OR ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
        |              > INTERVAL 30 MINUTE
        |         THEN 1 ELSE 0 END AS is_start
        |  FROM events),
        |s AS (
        |  SELECT user_id, ts,
        |    sum(is_start) OVER (PARTITION BY user_id ORDER BY ts
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        |  FROM g),
        |agg AS (
        |  SELECT user_id, sid, min(ts) AS session_start,
        |    max(ts) AS session_end, count(*) AS n_events
        |  FROM s GROUP BY user_id, sid),
        |last AS (SELECT user_id, max(sid) AS sid FROM agg GROUP BY user_id),
        |wm AS (SELECT max(ts) AS w FROM events)
        |SELECT a.user_id, a.session_start, a.session_end, a.n_events
        |FROM agg a, wm
        |WHERE NOT EXISTS (
        |    SELECT 1 FROM last l WHERE l.user_id = a.user_id AND l.sid = a.sid)
        |   OR a.session_end + INTERVAL 30 MINUTE < wm.w""".stripMargin))

  /** q100: the versioned table AS a streaming source ([[graft.streaming
    * .TableStreamProvider]], Delta streaming-source parity; the reference's
    * Delta-role table scd2-job.ipynb:163-172 feeds downstream consumers the
    * same way). A CDC timeline (seed commit → append → COW delete) streams
    * its CHANGE FEED from cursor v0 through `format("graft-table")` with
    * one AvailableNow drain into a parquet sink; the per-(commit,
    * change-type) aggregate of what ARRIVED must match DuckDB reconstructing
    * the same timeline from raw orders. Offsets are table versions (exactly-
    * once resume = one number in the checkpoint); batch planning reads
    * manifests only — the 100 TB CDC-consumer shape. */
  val q100StreamTableSource: Q = Q(
    "q100_stream_table_source",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-tsrc-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_t")
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      val orders = spark.table("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      // data-derived split so BOTH halves are non-empty at every scale factor
      val thr = orders.agg(floor(max(col("o_orderkey")) / 2)).head.getLong(0)
      t.commit(orders.filter(s"o_orderkey <= $thr"))       // v0 (cursor)
      t.append(orders.filter(s"o_orderkey > $thr"))        // v1: inserts
      t.delete(spark, "o_orderstatus = 'F'")               // v2: deletes
      val q = spark.readStream.format("graft-table")
        .option("path", s"$tmp/orders_t")
        .option("readChangeFeed", "true").option("startingVersion", "0")
        .load()
        .writeStream.format("parquet").option("path", s"$tmp/out")
        .option("checkpointLocation", s"$tmp/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
      q.awaitTermination(120000)
      spark.read.parquet(s"$tmp/out")
        .groupBy("_commit_version", "_change_type")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price"))
    },
    Some(
      """SELECT 1 AS _commit_version, 'insert' AS _change_type, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderkey > (SELECT CAST(floor(max(o_orderkey) / 2) AS BIGINT) FROM orders)
        |UNION ALL
        |SELECT 2, 'delete', count(*),
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE)
        |FROM orders WHERE o_orderstatus = 'F'""".stripMargin))

  /** q102: the versioned table as a streaming SINK
    * (`writeStream.format("graft-table")`), closing the source/sink pair —
    * the reference's landing-zone→Delta ingestion leg (scd2-job.ipynb
    * DeltaLakeLoad) as a continuous pipeline. Three micro-batches (file
    * source, 2 files/trigger) append three table versions, each commit
    * carrying its `(txnAppId, batchId)` mark atomically with the data; a
    * RESTART from the same checkpoint then proves idempotence — no new
    * versions, no duplicated rows (the crash-replay guarantee a 100 TB
    * continuous ingest lives on). Oracle: the batch formulation over the
    * same events, read back through the relation surface. */
  val q102StreamTableSink: Q = Q(
    "q102_stream_table_sink",
    (spark, dir) => {
      val tmp = java.nio.file.Files.createTempDirectory("graft-tsink-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.repartition(6).write.mode("overwrite").parquet(s"$tmp/landing")
      def run(): Unit = {
        val q = spark.readStream.schema(ev.schema)
          .option("maxFilesPerTrigger", "2").parquet(s"$tmp/landing")
          .filter(col("value") >= 0)
          .writeStream.format("graft-table")
          .option("path", s"$tmp/t").option("txnAppId", "q102")
          .option("checkpointLocation", s"$tmp/ckpt")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow()).start()
        q.awaitTermination(120000)
      }
      run()
      val t = graft.table.VersionedTable(s"$tmp/t")
      val v = t.latestVersion()
      require(v.exists(_ >= 1), s"expected multiple micro-batch commits, got $v")
      run() // restart, same checkpoint, no new data: must commit NOTHING
      require(t.latestVersion() == v,
        s"restart re-committed a replayed batch: $v -> ${t.latestVersion()}")
      spark.read.format("graft-table").option("path", s"$tmp/t").load()
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum(col("value").cast("decimal(14,2)")).cast("double").as("sum_value"))
    },
    Some(
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS sum_value
        |FROM events WHERE value >= 0 GROUP BY event_type""".stripMargin))

  /** q105: q75's continuous CDC upsert with the MERGE-ON-READ path — every
    * micro-batch lands as DV tombstones + appended post-images
    * (O(changed rows) write cost) instead of COW file rewrites, then one
    * final [[graft.table.VersionedTable.compact]] materializes the
    * tombstones (asserted: DVs cleared). The steady-state 100 TB CDC shape:
    * cheap continuous writes, amortized off-path compaction. Same
    * latest-per-key oracle as q75. */
  val q105StreamCdcMor: Q = Q(
    "q105_stream_cdc_mor",
    (spark, dir) => {
      import spark.implicits._
      val base = java.nio.file.Files.createTempDirectory("graft-cdcm-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "user_id", "ts", "event_type", "value")
      graft.table.VersionedTable(s"$base/table").commit(ev.limit(0))
      Seq(0, 1, 2).foreach { i =>
        ev.filter(pmod($"event_id", lit(3)) === i)
          .coalesce(1).write.mode("append").parquet(s"$base/landing")
        val q = graft.streaming.StreamingEtl.cdcUpsertStream(spark, s"$base/landing",
          ev.schema, s"$base/table", "user_id", Seq("ts", "event_id"),
          s"$base/ckpt", mor = true)
        require(q.awaitTermination(300000), s"CDC batch $i timed out")
      }
      val t = graft.table.VersionedTable(s"$base/table")
      require(t.dvFileCount() > 0, "expected MOR batches to leave DV tombstones")
      t.compact(spark)
      // compaction materialized the tombstones: the head carries no DVs
      // (delete-free reads from here on — the amortization actually landed)
      require(t.dvFileCount() == 0, "compact did not clear the deletion vectors")
      // CDC drains + compaction above; the delete-free latest-state read below
      PhaseClock.markServe("q105_stream_cdc_mor")
      t.read(spark)
        .select($"user_id", $"ts".as("last_ts"),
          $"event_type".as("last_type"), $"value".as("last_value"))
    },
    Some(
      """SELECT user_id, ts::TIMESTAMP AS last_ts, event_type AS last_type,
        |  value AS last_value
        |FROM (SELECT *, row_number() OVER
        |        (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
        |      FROM events)
        |WHERE rn = 1""".stripMargin))

  /** q115: STREAM-STATIC join — the enrichment shape every production
    * stream runs (events joined to a slowly-changing dimension): the
    * streaming side joins a BATCH customer dimension re-read per
    * micro-batch, aggregated per market segment in complete mode. At scale
    * the static side broadcasts (dimension ≪ stream) so each micro-batch
    * pays one hashed lookup per event and the stream never shuffles on the
    * join key; state is bounded by the segment cardinality, not the
    * stream. */
  val q115StreamStaticJoin: Q = Q(
    "q115_stream_static_join",
    (spark, dir) => {
      val landing = java.nio.file.Files.createTempDirectory("graft-sst-").toString
      val ev = Tables.table(spark, dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
      ev.write.mode("overwrite").parquet(landing)
      val dim = Tables.table(spark, dir, "customer")
        .select(col("c_custkey"), col("c_mktsegment"))
      val stream = spark.readStream.schema(ev.schema).parquet(landing)
        .filter(col("event_type") === "purchase")
      val joined = stream
        .join(broadcast(dim), col("user_id") === col("c_custkey"))
        .groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n_purchases"),
          expr("CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE)").as("revenue"))
      val qname = s"q115_sink_${System.nanoTime()}"
      val q = joined.writeStream.outputMode("complete")
        .format("memory").queryName(qname).start()
      q.processAllAvailable()
      q.stop()
      spark.table(qname).select("c_mktsegment", "n_purchases", "revenue")
    },
    Some(
      """SELECT c_mktsegment, count(*) AS n_purchases,
        |  CAST(sum(CAST(value AS DECIMAL(14,2))) AS DOUBLE) AS revenue
        |FROM events e JOIN customer c ON e.user_id = c.c_custkey
        |WHERE e.event_type = 'purchase'
        |GROUP BY c_mktsegment""".stripMargin))

  /** q119: CONTINUOUS incremental embedding dedup through the gate — the
    * streaming funnel over the d13 store ([[graft.streaming.StreamingEtl
    * .vectorAdmitStream]]): the corpus half builds the lake-resident IVF
    * vector store, the batch half lands as one file and streams through
    * exactly-once admission into a versioned decisions table. The gate
    * asserts the restart contract in-query: re-running the stream on the
    * SAME checkpoint reprocesses nothing (the decisions table's version
    * and rows are unchanged — source-side file memory + the manifest txn
    * stamp behind it). Oracle: identical decisions to d13's batch replay
    * — the streaming and batch funnels must agree row for row. */
  val q119StreamVectorAdmit: Q = Q(
    "q119_stream_vector_admit",
    (spark, dir) => {
      import spark.implicits._
      val emb = Tables.table(spark, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft-q119-").toString
      graft.dedup.VectorStore.build(spark, s"$tmp/vx", emb.filter("vec_id % 2 = 0"))
      val landing = s"$tmp/landing"
      emb.filter("vec_id % 2 = 1").coalesce(1).write.parquet(landing)
      val decisionsT = graft.table.VersionedTable(s"$tmp/decisions")
      decisionsT.commit(Seq.empty[(Long, String, Option[Long])]
        .toDF("vec_id", "verdict", "dup_of"))
      // store build + landing above; the streaming admission itself below
      PhaseClock.markServe("q119_stream_vector_admit")
      val q = graft.streaming.StreamingEtl.vectorAdmitStream(spark, landing,
        emb.schema, s"$tmp/vx", s"$tmp/decisions", s"$tmp/ckpt")
      q.processAllAvailable(); q.stop()
      val v1 = decisionsT.resolve()
      val n1 = decisionsT.read(spark).count()
      // restart on the same checkpoint: nothing reprocesses, nothing doubles
      val q2 = graft.streaming.StreamingEtl.vectorAdmitStream(spark, landing,
        emb.schema, s"$tmp/vx", s"$tmp/decisions", s"$tmp/ckpt")
      q2.processAllAvailable(); q2.stop()
      require(decisionsT.resolve() == v1 && decisionsT.read(spark).count() == n1,
        "a restarted stream on the same checkpoint must admit nothing twice")
      decisionsT.read(spark).select("vec_id", "verdict", "dup_of")
    },
    Some(
      s"""WITH ${SimilarityQueries.duckAssignedFor("WHERE vec_id % 2 = 0")},
         |b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |      WHERE vec_id % 2 = 1),
         |b_probed AS (
         |  SELECT vec_id, v, c_id FROM (
         |    SELECT b.vec_id, b.v, c.c_id,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY round(${SimilarityQueries.duckCos("b.v", "c.cv")}, 6) DESC,
         |                 c.c_id) AS rk
         |    FROM b, cents c) t
         |  WHERE rk <= 2),
         |near AS (
         |  SELECT ba.vec_id, min(a.vec_id) AS near_of
         |  FROM b_probed ba JOIN assigned a ON a.c_id = ba.c_id
         |  WHERE round(${SimilarityQueries.duckCos("ba.v", "a.v")}, 6) >= 0.45
         |  GROUP BY ba.vec_id)
         |SELECT b.vec_id,
         |  CASE WHEN n.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'admitted' END AS verdict,
         |  n.near_of AS dup_of
         |FROM b
         |LEFT JOIN near n ON n.vec_id = b.vec_id""".stripMargin))

  /** q125: KEYLESS CDC replication — a downstream replica maintained from
    * a row-tracked source's streaming change feed, merged by ROW ID (the
    * table has no natural key; without row tracking a CDF delete+insert
    * pair cannot be stitched into an update). Lifecycle: snapshot seed →
    * source UPDATE + DELETE + identity-allocating append → one catch-up
    * drain applies all three commits in one collapsed merge → replica ≡
    * source row-for-row INCLUDING ids (asserted in-query, both excepts
    * empty); a re-drain on the same checkpoint changes nothing. */
  val q125CdcReplica: Q = Q(
    "q125_cdc_replica",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-q125-").toString
      val src = graft.table.VersionedTable(s"$tmp/src")
      src.setProperties(Map("enableChangeDataFeed" -> "true"))
      src.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 0"),
        numPartitions = Some(1), sortBy = Seq("o_orderkey"))
      src.enableRowTracking(spark)
      val replica = graft.table.VersionedTable(s"$tmp/replica")
      replica.commit(src.read(spark).limit(0))
      def drain(): Unit = {
        val q = graft.streaming.StreamingEtl.cdcReplicaStream(spark,
          s"$tmp/src", s"$tmp/replica", "_row_id", s"$tmp/ckpt")
        q.processAllAvailable(); q.stop()
      }
      drain() // batch 0: the snapshot seeds the replica
      src.update(spark, "o_orderkey % 25 = 0",
        Map("o_totalprice" -> "o_totalprice * 2"))
      src.delete(spark, "o_orderkey % 35 = 0")
      src.appendIdentity(spark, spark.sql(
        """SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
          |FROM orders WHERE o_orderkey % 500 = 0""".stripMargin))
      // seed + source mutations above; the steady-state replication cost
      // (catch-up drain applying three commits in one merge) below
      PhaseClock.markServe("q125_cdc_replica")
      drain() // catch-up: all three commits collapse into one merge
      val s = src.read(spark)
      val r = replica.read(spark)
      require(s.except(r).isEmpty && r.except(s).isEmpty,
        "the replica must equal the source row-for-row, ids included")
      val v = replica.resolve()
      drain() // nothing new: the checkpointed cursor advances nothing
      require(replica.resolve() == v,
        "a drained stream must not re-apply or burn versions")
      replica.read(spark).select("o_orderkey", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 25 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice
        |FROM orders WHERE o_orderkey % 5 = 0 AND o_orderkey % 35 <> 0
        |UNION ALL
        |SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice
        |FROM orders WHERE o_orderkey % 500 = 0""".stripMargin))

  /** q137: STREAMING data quality — [[graft.etl.ExpectTransform]]'s
    * quarantine policy in the continuous funnel
    * ([[graft.streaming.StreamingEtl.expectationsStream]]): each
    * micro-batch splits on two named expectations; passing rows append to
    * the clean table, failing rows (tagged with the broken expectation
    * names) to the quarantine table, BOTH exactly-once under one txn
    * identity checked per sink — the design point a single-sink guard
    * misses, because a crash between the two appends must replay into only
    * the sink that missed the batch. Asserted in-query: multi-batch run,
    * clean + quarantined partitions the input, and a full restart over the
    * same checkpoint burns no version on either table. Oracle: the passing
    * rows (q135's relational predicate). */
  val q137StreamExpectations: Q = Q(
    "q137_stream_expectations",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sdq-").toString
      val src = spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders")
      src.repartition(6).write.mode("overwrite").parquet(s"$tmp/landing")
      val exps = Seq(
        "priority_specified" -> "o_orderpriority <> '4-NOT SPECIFIED'",
        "price_cap" -> "o_totalprice < 300000")
      def run(): Unit = {
        graft.streaming.StreamingEtl.expectationsStream(spark, s"$tmp/landing",
          src.schema, s"$tmp/clean", s"$tmp/quarantine", exps, s"$tmp/ckpt",
          maxFilesPerTrigger = Some(2)).awaitTermination(120000)
        ()
      }
      run()
      val clean = graft.table.VersionedTable(s"$tmp/clean")
      val quar = graft.table.VersionedTable(s"$tmp/quarantine")
      require(clean.latestVersion().exists(_ >= 1),
        s"expected multiple micro-batch commits, got ${clean.latestVersion()}")
      require(clean.read(spark).count() + quar.read(spark).count() == src.count(),
        "clean + quarantined must partition the stream")
      val (cv, qv) = (clean.latestVersion(), quar.latestVersion())
      run() // restart over the same checkpoint: no new data, no new version
      require(clean.latestVersion() == cv && quar.latestVersion() == qv,
        "a restart replayed a committed batch into a sink")
      PhaseClock.markServe("q137_stream_expectations")
      clean.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderpriority <> '4-NOT SPECIFIED'
        |  AND o_totalprice < 300000""".stripMargin))

  val all: Seq[Q] = Seq(q26StreamingWindow, q27SketchDistinct, q38KmvSketch,
    q51StreamingDedup, q52StreamStreamJoin, q67StreamSessions, q75StreamCdcUpsert,
    q88StreamOuterJoin, q92StreamTws, q98TwsSessionTimers, q100StreamTableSource,
    q102StreamTableSink, q105StreamCdcMor, q115StreamStaticJoin,
    q119StreamVectorAdmit, q125CdcReplica, q137StreamExpectations)
}
