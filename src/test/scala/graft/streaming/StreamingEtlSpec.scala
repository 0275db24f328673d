package graft.streaming

import graft.SparkSpec
import graft.table.{Merge, VersionedTable}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class StreamingEtlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("foreachBatch CDC stream merges each micro-batch into the versioned table") {
    val landing = tmpDir("landing-")
    val tableRoot = tmpDir("table-") + "/t"
    val ckpt = tmpDir("ckpt-")

    // v0: initial snapshot
    val initial = Seq((1L, "a", true), (2L, "b", true))
      .toDF("id", "val", "iscurrent")
    VersionedTable(tableRoot).commit(initial)

    // two CDC files land: change id=2, add id=3
    Seq((2L, "b2"), (3L, "c"))
      .toDF("id", "val")
      .write.mode("overwrite").parquet(landing)

    val stage: (DataFrame, DataFrame) => DataFrame = (batch, target) => {
      batch.createOrReplaceTempView("s_cdc")
      target.createOrReplaceTempView("s_target")
      batch.sparkSession.sql(
        """SELECT CAST(NULL AS BIGINT) AS mergeKey, new.id, new.val, true AS iscurrent
          |FROM s_target old INNER JOIN s_cdc new ON old.id = new.id
          |WHERE old.iscurrent = true AND old.val <> new.val
          |UNION
          |SELECT id AS mergeKey, id, val, true AS iscurrent FROM s_cdc""".stripMargin)
    }

    val q = StreamingEtl.scd2MergeStream(
      spark, landing, initial.select("id", "val").schema, tableRoot,
      stage,
      condition = "source.mergeKey = target.id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(
        Some("target.iscurrent = true AND target.val <> source.val"),
        Map("iscurrent" -> "false"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty)),
      checkpointDir = ckpt)
    assert(q.awaitTermination(120000), "CDC stream did not terminate in time")

    val t = VersionedTable(tableRoot)
    assert(t.latestVersion().contains(1L))
    val current = t.read(spark).filter($"iscurrent" === true)
      .select("id", "val").as[(Long, String)].collect().toSet
    assert(current === Set((1L, "a"), (2L, "b2"), (3L, "c")))
    val expired = t.read(spark).filter($"iscurrent" === false)
      .select("id", "val").as[(Long, String)].collect().toSet
    assert(expired === Set((2L, "b")))
  }

  test("cdcUpsertStream keeps the newest row per key regardless of batch order") {
    import java.sql.Timestamp
    val landing = tmpDir("cdcu-")
    val tableRoot = tmpDir("cdcu-t-") + "/t"
    val ckpt = tmpDir("cdcu-c-")
    def t(ms: Long) = new Timestamp(ms)
    val empty = Seq.empty[(Long, Timestamp, String)].toDF("id", "ts", "v")
    VersionedTable(tableRoot).commit(empty)
    // batch 1 arrives first but carries the NEWER state for id=1
    Seq((1L, t(2000L), "new"), (2L, t(1000L), "x"))
      .toDF("id", "ts", "v").coalesce(1).write.mode("append").parquet(landing)
    val q1 = StreamingEtl.cdcUpsertStream(spark, landing, empty.schema, tableRoot,
      "id", Seq("ts"), ckpt)
    assert(q1.awaitTermination(120000))
    // batch 2 is a LATE replay of older data: id=1 must not regress
    Seq((1L, t(1000L), "old"), (3L, t(500L), "y"))
      .toDF("id", "ts", "v").coalesce(1).write.mode("append").parquet(landing)
    val q2 = StreamingEtl.cdcUpsertStream(spark, landing, empty.schema, tableRoot,
      "id", Seq("ts"), ckpt)
    assert(q2.awaitTermination(120000))
    val got = VersionedTable(tableRoot).read(spark)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "new"), (2L, "x"), (3L, "y")))
    // restart with nothing new: no batch runs, no version burns
    val vBefore = VersionedTable(tableRoot).versions().size
    val q3 = StreamingEtl.cdcUpsertStream(spark, landing, empty.schema, tableRoot,
      "id", Seq("ts"), ckpt)
    assert(q3.awaitTermination(120000))
    assert(VersionedTable(tableRoot).versions().size === vBefore)
  }

  test("appendStream ingests micro-batches exactly-once across restarts") {
    val landing = tmpDir("as-")
    val tableRoot = tmpDir("as-t-") + "/t"
    val ckpt = tmpDir("as-c-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    val q1 = StreamingEtl.appendStream(spark, landing, schema, tableRoot, ckpt)
    assert(q1.awaitTermination(120000))
    // second file lands; a NEW run (same checkpoint) must pick up only it
    Seq((3L, "c")).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(landing)
    val q2 = StreamingEtl.appendStream(spark, landing, schema, tableRoot, ckpt)
    assert(q2.awaitTermination(120000))
    val t = VersionedTable(tableRoot)
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // version count = number of committed batches, each txn-stamped
    assert(t.versions().size === 2)
    assert(t.lastTxn(ckpt).isDefined)
  }

  test("expectationsStream: a crash between the two sink appends replays " +
      "into only the sink that missed the batch") {
    val landing = tmpDir("eq-")
    val base = tmpDir("eq-t-")
    val ckpt = tmpDir("eq-c-")
    Seq((1L, 5L), (2L, -1L), (3L, 9L), (4L, -7L)).toDF("id", "v")
      .coalesce(1).write.mode("overwrite").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    val exps = Seq("positive" -> "v > 0")
    // injected crash AFTER the clean append, BEFORE the quarantine append
    StreamingEtl.expectationsFailpoint = true
    try {
      val q = StreamingEtl.expectationsStream(spark, landing, schema,
        s"$base/clean", s"$base/quar", exps, ckpt)
      intercept[Exception] { q.awaitTermination(120000); q.stop() }
    } finally StreamingEtl.expectationsFailpoint = false
    val clean = VersionedTable(s"$base/clean")
    val quar = VersionedTable(s"$base/quar")
    assert(clean.read(spark).count() === 2) // committed before the crash
    assert(quar.latestVersion().isEmpty)    // missed the batch
    // the restart replays the batch: quarantine catches up, clean does NOT
    // double-append (its per-sink txn guard sees the committed batchId)
    val q2 = StreamingEtl.expectationsStream(spark, landing, schema,
      s"$base/clean", s"$base/quar", exps, ckpt)
    assert(q2.awaitTermination(120000))
    assert(clean.read(spark).as[(Long, Long)].collect().sorted.toSeq
      === Seq((1L, 5L), (3L, 9L)))
    assert(quar.read(spark).select("id", "_violations").as[(Long, String)]
      .collect().sorted.toSeq === Seq((2L, "positive"), (4L, "positive")))
    assert(clean.versions().size === 1 && quar.versions().size === 1)
    // an all-clean batch appends to the CLEAN table only — no quarantine
    // version burned for an empty slice
    Seq((10L, 1L), (11L, 2L)).toDF("id", "v")
      .coalesce(1).write.mode("append").parquet(landing)
    val q3 = StreamingEtl.expectationsStream(spark, landing, schema,
      s"$base/clean", s"$base/quar", exps, ckpt)
    assert(q3.awaitTermination(120000))
    assert(clean.read(spark).count() === 4 && quar.versions().size === 1)
  }

  test("watermarked windowed aggregation over a parquet-backed stream") {
    val dir = tmpDir("ev-")
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
    val agg = StreamingEtl.windowedEventCounts(stream)
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("winagg").start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table("winagg")
    // must equal the batch formulation
    val batch = spark.read.parquet(dir)
      .groupBy(window($"ts", "1 hour"), $"event_type")
      .agg(count(lit(1)).as("n"),
        sum($"value".cast("decimal(14,2)")).as("sum_value"))
    assert(got.count() === batch.count())
    assert(got.exceptAll(batch).count() === 0)
  }

  test("streaming dedup drops repeated keys across micro-batches") {
    val landing = tmpDir("dedup-")
    // batch 1: three events, one duplicated checksum; batch 2 repeats one
    Seq((1L, "h1", "2024-01-01 00:00:00"), (2L, "h2", "2024-01-01 00:01:00"),
        (3L, "h1", "2024-01-01 00:02:00"))
      .toDF("id", "checksum", "ts_s")
      .selectExpr("id", "checksum", "CAST(ts_s AS TIMESTAMP) AS ts")
      .write.mode("overwrite").parquet(landing)
    Seq((4L, "h2", "2024-01-01 00:03:00"), (5L, "h3", "2024-01-01 00:04:00"))
      .toDF("id", "checksum", "ts_s")
      .selectExpr("id", "checksum", "CAST(ts_s AS TIMESTAMP) AS ts")
      .write.mode("append").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1) // force multiple micro-batches
      .parquet(landing)
    val deduped = StreamingEtl.streamingDedup(stream, Seq("checksum"))
    val qn = s"dedup_sink_${System.nanoTime()}"
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    val kept = spark.table(qn).select("checksum").as[String].collect().toSeq
    assert(kept.sorted === Seq("h1", "h2", "h3"))
  }

  test("mapGroupsWithState keeps per-key running totals across the stream") {
    val dir = tmpDir("st-")
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "value")
      .write.mode("overwrite").parquet(dir)
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir).as[UserEvent]
    val totals = StreamingEtl.statefulUserTotals(stream)
    val qn = s"st_sink_${System.nanoTime()}"
    val q = totals.writeStream.outputMode("update")
      .format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    // last emitted state per key must equal the batch aggregate
    val got = spark.table(qn)
      .groupBy("user_id").agg(max("n").as("n"))
      .as[(Long, Long)].collect().toMap
    val expect = spark.read.parquet(dir)
      .groupBy("user_id").count().as[(Long, Long)].collect().toMap
    assert(got === expect)
  }

  test("transformWithState running totals match mapGroupsWithState and the batch aggregate") {
    val dir = tmpDir("tws-")
    graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "value")
      .write.mode("overwrite").parquet(dir)
    // the v2 state API only runs on the RocksDB store
    val prior = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val schema = spark.read.parquet(dir).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1) // force state to carry across batches
        .parquet(dir).as[UserEvent]
      val totals = StreamingEtl.statefulUserTotalsTws(stream)
      val qn = s"tws_sink_${System.nanoTime()}"
      val q = totals.writeStream.outputMode("update")
        .format("memory").queryName(qn).start()
      q.processAllAvailable()
      q.stop()
      val got = spark.table(qn)
        .groupBy("user_id").agg(max("n").as("n"),
          max_by(col("sum_value"), col("n")).as("s"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      val expect = spark.read.parquet(dir)
        .groupBy("user_id").agg(count(lit(1)).as("n"), sum("value").as("s"))
        .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
      assert(got.view.mapValues(_._1).toMap === expect.view.mapValues(_._1).toMap)
      // sums: same additions in per-batch order; compare with a tolerance
      got.foreach { case (k, (_, s)) =>
        assert(math.abs(s - expect(k)._2) < 1e-6, s"user $k sum drifted")
      }
    } finally {
      prior match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("HLL++ sketch estimate stays within its error bound of the exact count") {
    // the bound check now lives IN the query (default rsd 5 %, 3 sigma →
    // ±15 %): every group must report approx_within_bound = true, which is
    // exactly what the DuckDB oracle hash-matches against a TRUE literal
    val out = graft.queries.StreamingQueries.q27SketchDistinct
      .run(spark, "/root/testdata/sf0.01").collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      assert(r.getAs[Long]("exact_parts") > 0L)
      assert(r.getAs[Boolean]("approx_within_bound"),
        s"HLL estimate drifted outside ±15 % for ${r.getAs[String]("l_returnflag")}")
    }
  }

  test("flatMapGroupsWithState session windows match the batch sessionize") {
    val dir = tmpDir("fs-")
    val ev = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
      .select("user_id", "ts")
    ev.write.mode("overwrite").parquet(dir)
    // one micro-batch: gap sessionization assumes per-key event-time order
    // across batches (what a watermark-disciplined landing gives); arbitrary
    // file splits would replay a user's history out of order
    val schema = spark.read.parquet(dir).schema
    val stream = spark.readStream.schema(schema).parquet(dir)
      .as[(Long, java.sql.Timestamp)]
    val qn = s"fs_sink_${System.nanoTime()}"
    val q = StreamingEtl.sessionWindows(stream).writeStream
      .outputMode("append").format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    val got = spark.table(qn)
      .select("user_id", "session_start", "session_end", "n_events")
    // batch oracle: sessionize's window formulation, dropping each user's
    // LAST session (still open in the stream — never emitted)
    val batch = StreamingEtl.sessionize(
      graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events"))
      .groupBy($"user_id", $"session_id")
      .agg(min($"ts").as("session_start"), max($"ts").as("session_end"),
        count(lit(1)).as("n_events"))
    val lastPerUser = batch.groupBy("user_id")
      .agg(max("session_id").as("session_id"))
    val closedBatch = batch.join(lastPerUser, Seq("user_id", "session_id"),
      "left_anti").select("user_id", "session_start", "session_end", "n_events")
    assert(got.exceptAll(closedBatch).count() === 0)
    assert(closedBatch.exceptAll(got).count() === 0)
    assert(got.count() > 0, "expected at least one closed session")
  }

  test("flatMapGroupsWithState carries an open session across micro-batches") {
    val landing = tmpDir("fs2-")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: two events 10 min apart (one open session)
    Seq((7L, ts("2024-01-01 00:00:00")), (7L, ts("2024-01-01 00:10:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("overwrite").parquet(landing)
    // batch 2: an event 2h later — must CLOSE the batch-1 session
    Seq((7L, ts("2024-01-01 02:10:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing).as[(Long, java.sql.Timestamp)]
    val qn = s"fs2_sink_${System.nanoTime()}"
    val q = StreamingEtl.sessionWindows(stream).writeStream
      .outputMode("append").format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table(qn)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
    assert(closed === Seq(
      (7L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 2L)))
  }

  test("session windows absorb cross-batch late events without corrupting bounds") {
    val landing = tmpDir("fs3-")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // batch 1: open session [00:00, 00:10]
    Seq((7L, ts("2024-01-01 00:00:00")), (7L, ts("2024-01-01 00:10:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("overwrite").parquet(landing)
    Thread.sleep(1100) // distinct mtimes so maxFilesPerTrigger=1 replays in order
    // batch 2: a LATE event inside the open span (00:05 — pre-fix this
    // "extended" the session with session_end stuck before absorbed events),
    // a hopelessly late event (previous evening — dropped), and a fresh
    // event 2h later that closes the session
    Seq((7L, ts("2023-12-31 20:00:00")), (7L, ts("2024-01-01 00:05:00")),
        (7L, ts("2024-01-01 02:10:00")))
      .toDF("user_id", "ts").coalesce(1).write.mode("append").parquet(landing)
    val schema = spark.read.parquet(landing).schema
    val stream = spark.readStream.schema(schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(landing).as[(Long, java.sql.Timestamp)]
    val qn = s"fs3_sink_${System.nanoTime()}"
    val q = StreamingEtl.sessionWindows(stream).writeStream
      .outputMode("append").format("memory").queryName(qn).start()
    q.processAllAvailable()
    q.stop()
    val closed = spark.table(qn)
      .select("user_id", "session_start", "session_end", "n_events")
      .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
    // the late 00:05 folds in (n=3) without dragging session_end backwards;
    // the 20:00 straggler is dropped, not fused into a 6-hour mega-session
    assert(closed === Seq(
      (7L, ts("2024-01-01 00:00:00"), ts("2024-01-01 00:10:00"), 3L)))
  }

  test("sessionize assigns gap-based session ids consistent with q18") {
    val ev = graft.queries.Tables.table(spark, "/root/testdata/sf0.001", "events")
    val sessions = StreamingEtl.sessionize(ev)
      .groupBy("user_id").agg(max("session_id").as("n_sessions"))
    val oracle = graft.queries.CoreQueries.q18Sessions
      .run(spark, "/root/testdata/sf0.001")
    assert(sessions.exceptAll(oracle).count() === 0)
    assert(oracle.exceptAll(sessions).count() === 0)
  }

  /** Deterministic synthetic embeddings (VectorStoreSpec's generator). */
  private def svecs(rows: (Long, Long)*) =
    rows.toSeq.toDF("vec_id", "seed")
      .selectExpr("vec_id", "concat('l', seed) AS label",
        "transform(sequence(1, 64), j -> CAST(sin(seed * j) AS FLOAT)) AS embedding")

  test("vectorSyncStream mirrors the table continuously through one checkpoint") {
    val base = tmpDir("vsync-")
    val t = VersionedTable(s"$base/emb")
    t.commit(svecs((0L until 24L).map(i => i -> (i % 3 + 1)): _*))
    graft.dedup.VectorStore.build(spark, s"$base/vx", t.read(spark))
    graft.dedup.VectorStore.markSynced(s"$base/vx", t.resolve())
    val assignedT = VersionedTable(s"$base/vx/assigned")

    // round 1: append + delete, drained by the stream
    t.append(svecs((100L until 106L).map(i => i -> 2L): _*))
    t.delete(spark, "vec_id % 6 = 5")
    assert(StreamingEtl.vectorSyncStream(spark, s"$base/emb", s"$base/vx",
      s"$base/ckpt").awaitTermination(120000))
    assert(assignedT.read(spark).count() === t.read(spark).count(),
      "the synced store must mirror the table row for row")

    // checkpointed restart with nothing new: drains without moving the store
    val v1 = assignedT.latestVersion().get
    assert(StreamingEtl.vectorSyncStream(spark, s"$base/emb", s"$base/vx",
      s"$base/ckpt").awaitTermination(120000))
    assert(assignedT.latestVersion().get === v1,
      "an idle restart must not move the assigned table")

    // round 2 through the SAME checkpoint: only the new commits stream
    t.update(spark, "vec_id % 6 = 1",
      Map("embedding" -> "transform(embedding, x -> -x)"))
    assert(StreamingEtl.vectorSyncStream(spark, s"$base/emb", s"$base/vx",
      s"$base/ckpt").awaitTermination(120000))
    assert(assignedT.read(spark).count() === t.read(spark).count())
    assert(VersionedTable(s"$base/vx/cents").properties
      .get("syncedVersion").contains(t.resolve().toString),
      "the cursor must track the head across resumed rounds")
  }

  test("textIndexSyncStream resumes incrementally through one checkpoint") {
    import org.apache.spark.sql.functions.col
    val base = tmpDir("tsync-")
    val t = VersionedTable(s"$base/corpus")
    val docs = graft.queries.Tables
      .table(spark, "/root/testdata/sf0.001", "documents")
      .select("doc_id", "text")
    t.commit(docs.filter(col("doc_id") % 3 =!= 0))
    graft.dedup.TextIndexStore.build(spark, s"$base/ix", t.read(spark), "fp0")
    graft.dedup.TextIndexStore.markSynced(s"$base/ix", t.resolve())
    val postT = VersionedTable(s"$base/ix/postings")

    t.append(docs.filter(col("doc_id") % 3 === 0))
    assert(StreamingEtl.textIndexSyncStream(spark, s"$base/corpus", s"$base/ix",
      "fp1", s"$base/ckpt").awaitTermination(120000))
    assert(graft.dedup.TextIndexStore.stats(s"$base/ix")._1 ===
      t.read(spark).count())
    // the admit carries the stream's (checkpoint, batchId) txn stamp
    assert(postT.lastTxn(s"$base/ckpt").isDefined,
      "the streamed admit must stamp its (checkpoint, batchId) identity")

    // round 2 resumes from the checkpoint: delete + update only
    t.delete(spark, "doc_id % 9 = 4")
    t.update(spark, "doc_id % 9 = 7",
      Map("text" -> "concat(text, ' resumed resumed')"))
    assert(StreamingEtl.textIndexSyncStream(spark, s"$base/corpus", s"$base/ix",
      "fp2", s"$base/ckpt").awaitTermination(120000))
    assert(graft.dedup.TextIndexStore.stats(s"$base/ix")._1 ===
      t.read(spark).count())
    assert(postT.properties.get("syncedVersion")
      .contains(t.resolve().toString))
  }
}
