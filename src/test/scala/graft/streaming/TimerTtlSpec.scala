package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** transformWithState timers + state TTL — the Spark-4 streaming-state
  * features beyond plain ValueState: event-time timers emit an IDLE key's
  * result when the watermark passes (no closing event required), and TTL
  * bounds state to the active key set. Both proven across query restarts
  * (the state store checkpoints timers and expirations). */
class TimerTtlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def withRocksDb[A](f: => A): A = {
    val key = "spark.sql.streaming.stateStore.providerClass"
    val prior = spark.conf.getOption(key)
    spark.conf.set(key,
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try f finally prior match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  private def ts(s: String): java.sql.Timestamp = java.sql.Timestamp.valueOf(s)

  test("an idle user's session is emitted by its event-time timer") {
    withRocksDb {
      val landing = tmpDir("twt-")
      Seq((1L, ts("2024-01-01 10:00:00")), (1L, ts("2024-01-01 10:05:00")))
        .toDF("user_id", "ts").write.mode("append").parquet(landing)
      val schema = spark.read.parquet(landing).schema
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(landing)
        .as[(Long, java.sql.Timestamp)]
      val out = StreamingEtl.sessionWindowsTws(stream, gapMinutes = 30, delay = "1 minute")
      val qn = s"twt_sink_${System.nanoTime()}"
      val q = out.writeStream.outputMode("append").format("memory").queryName(qn).start()
      q.processAllAvailable()
      // watermark (10:04) has not reached the timer (10:35): nothing emitted
      assert(spark.table(qn).isEmpty,
        "the open session must not emit before its timer expires")
      // a LATER event from a DIFFERENT user advances the watermark past
      // user 1's expiry — the fmgws variant would keep user 1 open forever
      Seq((2L, ts("2024-01-01 20:00:00")))
        .toDF("user_id", "ts").write.mode("append").parquet(landing)
      q.processAllAvailable()
      q.stop()
      val rows = spark.table(qn)
        .select("user_id", "session_start", "session_end", "n_events")
        .as[(Long, java.sql.Timestamp, java.sql.Timestamp, Long)].collect().toSeq
      assert(rows === Seq((1L, ts("2024-01-01 10:00:00"), ts("2024-01-01 10:05:00"), 2L)),
        s"expected exactly user 1's idle session via timer, got $rows")
    }
  }

  test("a registered timer fires after a query restart from the checkpoint") {
    withRocksDb {
      val base = tmpDir("twt-")
      val landing = s"$base/landing"
      val ckpt = s"$base/ckpt"
      Seq((1L, ts("2024-01-01 10:00:00")))
        .toDF("user_id", "ts").write.mode("append").parquet(landing)
      val schema = spark.read.parquet(landing).schema
      val emitted = new scala.collection.mutable.ListBuffer[(Long, Long)]
      def run(): Unit = {
        val stream = spark.readStream.schema(schema)
          .option("maxFilesPerTrigger", 1).parquet(landing)
          .as[(Long, java.sql.Timestamp)]
        val q = StreamingEtl.sessionWindowsTws(stream, 30, "1 minute")
          .writeStream.outputMode("append")
          .option("checkpointLocation", ckpt)
          .foreachBatch { (batch: org.apache.spark.sql.Dataset[ClosedSession], _: Long) =>
            emitted.synchronized {
              emitted ++= batch.collect().map(c => (c.user_id, c.n_events))
            }
            ()
          }.start()
        q.processAllAvailable()
        q.stop()
      }
      run()
      assert(emitted.isEmpty, "no emission before the watermark moves")
      // the timer must survive the restart: the advancing event arrives in a
      // NEW query resuming the same checkpoint
      Seq((2L, ts("2024-01-01 20:00:00")))
        .toDF("user_id", "ts").write.mode("append").parquet(landing)
      run()
      assert(emitted.synchronized(emitted.toList).contains((1L, 1L)),
        s"user 1's timer must fire after restart, got $emitted")
    }
  }

  /** One Trigger.Once run over the landing dir, appending emissions to
    * `emitted`. The ProcessingTime time mode TTL requires makes the operator
    * request follow-up batches forever (AvailableNow never terminates,
    * processAllAvailable never quiesces), so the ONLY deterministic harness
    * is exactly-one-batch-then-stop, chained through a checkpoint. */
  private def runOnceTtl(landing: String, ckpt: String, ttlMs: Long,
      emitted: scala.collection.mutable.ListBuffer[UserTotal]): Unit = {
    val schema = spark.read.parquet(landing).schema
    val stream = spark.readStream.schema(schema).parquet(landing).as[UserEvent]
    @annotation.nowarn("cat=deprecation")
    val q = StreamingEtl.statefulUserTotalsTwsTtl(stream, ttlMs)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.Once())
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[UserTotal], _: Long) =>
        emitted.synchronized { emitted ++= batch.collect() }
        ()
      }.start()
    assert(q.awaitTermination(180000), "Trigger.Once query must self-terminate")
  }

  test("TTL keeps totals within the window and refreshes on update") {
    withRocksDb {
      val base = tmpDir("ttl-")
      val landing = s"$base/landing"
      val ckpt = s"$base/ckpt"
      val emitted = new scala.collection.mutable.ListBuffer[UserTotal]
      Seq(UserEvent(1L, 1.0)).toDF().write.mode("append").parquet(landing)
      runOnceTtl(landing, ckpt, ttlMs = 10 * 60 * 1000L, emitted)
      Seq(UserEvent(1L, 2.0)).toDF().write.mode("append").parquet(landing)
      runOnceTtl(landing, ckpt, ttlMs = 10 * 60 * 1000L, emitted)
      val last = emitted.synchronized(emitted.toList).last
      assert((last.n, last.sum_value) === ((2L, 3.0)),
        s"within the TTL the total must accumulate, got $last")
    }
  }

  test("TTL evicts idle state across a query restart") {
    withRocksDb {
      val base = tmpDir("ttl-")
      val landing = s"$base/landing"
      val ckpt = s"$base/ckpt"
      val emitted = new scala.collection.mutable.ListBuffer[UserTotal]
      Seq(UserEvent(1L, 1.0), UserEvent(1L, 2.0))
        .toDF().write.mode("append").parquet(landing)
      runOnceTtl(landing, ckpt, ttlMs = 1000L, emitted)
      assert(emitted.synchronized(emitted.toList).map(t => (t.n, t.sum_value))
        === List((2L, 3.0)))
      // idle past the TTL, then a restart: the expiry checkpointed with the
      // state must still apply — the key starts OVER, not from (2, 3.0)
      Thread.sleep(2500)
      Seq(UserEvent(1L, 5.0)).toDF().write.mode("append").parquet(landing)
      runOnceTtl(landing, ckpt, ttlMs = 1000L, emitted)
      val after = emitted.synchronized(emitted.toList).last
      assert((after.n, after.sum_value) === ((1L, 5.0)),
        s"expired state must not resurrect, got $after")
    }
  }
}
