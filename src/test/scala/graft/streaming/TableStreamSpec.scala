package graft.streaming

import graft.SparkSpec
import graft.table.VersionedTable
import org.apache.spark.sql.streaming.Trigger
import org.scalatest.funsuite.AnyFunSuite

/** [[TableStreamProvider]]: a VersionedTable as a Structured-Streaming
  * source. Offsets are table versions; batches are planned from manifests
  * (appends → fresh files, CDF mode → stored change rows). Runs use
  * Trigger.AvailableNow — drain-and-stop, so each assertion sees a
  * quiesced stream; restart tests sink to parquet (memory sinks cannot
  * recover from a checkpoint). */
class TableStreamSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def drain(q: org.apache.spark.sql.streaming.StreamingQuery): Unit = {
    q.awaitTermination(60000); ()
  }

  test("append mode: snapshot first, then exactly the fresh appends, resumable") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    val ckpt = tmpDir("ts-ckpt-")

    val out = tmpDir("ts-out-")

    // memory sinks cannot recover from a checkpoint — a parquet sink is the
    // restart-capable shape
    def runOnce(): Unit = drain(spark.readStream.format("graft-table")
      .option("path", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow()).start())
    def sunk(): Seq[(Long, String)] =
      spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq

    runOnce() // batch 0: the full snapshot
    assert(sunk() === Seq((1L, "a"), (2L, "b")))

    t.append(Seq((3L, "c")).toDF("id", "k"))
    t.compact(spark) // cdfKind="none": contributes no rows, breaks nothing
    t.append(Seq((4L, "d")).toDF("id", "k"))
    runOnce() // resumed from the checkpointed version offset
    assert(sunk() === Seq((1L, "a"), (2L, "b"), (3L, "c"), (4L, "d")))

    // replay with nothing new: no duplicate delivery
    runOnce()
    assert(sunk().size === 4)
  }

  test("startingTimestamp seeds the cursor by commit time (Delta parity)") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))           // v0
    t.append(Seq((2L, "b")).toDF("id", "k"))           // v1
    t.append(Seq((3L, "c")).toDF("id", "k"))           // v2
    // Delta parity: startingTimestamp is INCLUSIVE — a commit stamped
    // exactly at the literal is read. v1's own stamp → v1 AND v2 emit.
    val ts = t.history(spark).filter("version = 1")
      .select("committed_at").head.getTimestamp(0).getTime
    drain(spark.readStream.format("graft-table").option("path", root)
      .option("startingTimestamp", ts.toString).load()
      .writeStream.format("memory").queryName("ts_fromts")
      .option("checkpointLocation", tmpDir("ts-ckpt-"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("ts_fromts").as[(Long, String)].collect().sorted.toSeq
      === Seq((2L, "b"), (3L, "c")))
    // v2's own stamp → exactly v2 (the boundary commit, nothing earlier)
    val ts2 = t.history(spark).filter("version = 2")
      .select("committed_at").head.getTimestamp(0).getTime
    drain(spark.readStream.format("graft-table").option("path", root)
      .option("startingTimestamp", ts2.toString).load()
      .writeStream.format("memory").queryName("ts_fromts2")
      .option("checkpointLocation", tmpDir("ts-ckpt2-"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("ts_fromts2").as[(Long, String)].collect().toSeq
      === Seq((3L, "c")))
    // exclusive with startingVersion; a pre-history timestamp fails loudly
    intercept[Exception] {
      spark.readStream.format("graft-table").option("path", root)
        .option("startingTimestamp", ts.toString)
        .option("startingVersion", "0").load()
        .writeStream.format("memory").queryName("ts_x")
        .option("checkpointLocation", tmpDir("ts-ckpt-"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination(60000)
    }
    // a timestamp at or before the FIRST commit while version 0 is still
    // retained means nothing was vacuumed: "from table creation" reads
    // every retained change INCLUDING version 0's rows (Delta starts from
    // the earliest version INCLUSIVELY — cursor-0 semantics would silently
    // drop the creation commit)
    drain(spark.readStream.format("graft-table").option("path", root)
      .option("startingTimestamp", "1").load()
      .writeStream.format("memory").queryName("ts_creation")
      .option("checkpointLocation", tmpDir("ts-ckpt3-"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("ts_creation").as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // same pre-creation timestamp under CDF: v0's rows surface as inserts
    // at _commit_version 0, then the later commits' changes follow
    drain(spark.readStream.format("graft-table").option("path", root)
      .option("startingTimestamp", "1").option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("ts_creation_cdf")
      .option("checkpointLocation", tmpDir("ts-ckpt4-"))
      .trigger(Trigger.AvailableNow()).start())
    assert(spark.table("ts_creation_cdf")
      .selectExpr("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq
      === Seq((1L, "insert", 0L), (2L, "insert", 1L), (3L, "insert", 2L)))
    // once vacuum has dropped version 0, the same spelling fails loudly —
    // earlier commits really may be gone, and replaying an incomplete
    // history as if complete would be silent data loss
    t.vacuum(retainVersions = 2)
    assert(t.versions().head > 0L)
    val e = intercept[Exception] {
      spark.readStream.format("graft-table").option("path", root)
        .option("startingTimestamp", "1").load()
        .writeStream.format("memory").queryName("ts_y")
        .option("checkpointLocation", tmpDir("ts-ckpt-"))
        .trigger(Trigger.AvailableNow()).start().awaitTermination(60000)
    }
    assert(e.getMessage.contains("precedes the oldest retained version")
      || Option(e.getCause).exists(_.getMessage.contains("precedes the oldest retained version")))
  }

  test("streaming reads span a RENAME COLUMN: old files resolve by field id") {
    val root = tmpDir("ts-ren-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt"))
    t.renameColumn("amt", "amount")
    t.append(Seq((3L, 30.0)).toDF("id", "amount"))
    val out = tmpDir("ts-ren-out-")
    drain(spark.readStream.format("graft-table").option("path", root).load()
      .writeStream.format("parquet").option("path", out)
      .option("checkpointLocation", tmpDir("ts-ren-ckpt-"))
      .trigger(Trigger.AvailableNow()).start())
    // the snapshot batch carries pre-rename files (physical name `amt`)
    // AND the post-rename append in one schema — values intact
    assert(spark.read.parquet(out).columns.toSeq === Seq("id", "amount"))
    assert(spark.read.parquet(out).as[(Long, Double)].collect().sorted.toSeq
      === Seq((1L, 10.0), (2L, 20.0), (3L, 30.0)))
  }

  test("append mode refuses a rewrite commit unless skipChangeCommits") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    val ckpt = tmpDir("ts-ckpt-")
    val out = tmpDir("ts-out-")
    def runOnce(extra: Map[String, String]): Unit =
      drain(spark.readStream.format("graft-table").option("path", root)
        .options(extra).load()
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow()).start())
    runOnce(Map.empty)
    t.delete(spark, "id = 1")
    t.append(Seq((3L, "c")).toDF("id", "k"))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      runOnce(Map.empty)
    }
    assert(e.getMessage.contains("not an append"))
    // same offsets, rewrites dropped: only the append flows
    runOnce(Map("skipChangeCommits" -> "true"))
    assert(spark.read.parquet(out).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("readChangeFeed streams per-commit change rows from write-time capture") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("enableChangeDataFeed" -> "true"))
    t.commit(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "amt"))
    t.append(Seq((3L, "c", 30.0)).toDF("id", "k", "amt"))     // v1
    t.delete(spark, "k = 'b'")                                 // v2
    t.update(spark, "k = 'a'", Map("amt" -> "amt + 5"))        // v3
    val got = {
      drain(spark.readStream.format("graft-table").option("path", root)
        .option("readChangeFeed", "true").option("startingVersion", "0").load()
        .writeStream.format("memory").queryName("ts_cdf")
        .option("checkpointLocation", tmpDir("ts-ckpt-"))
        .trigger(Trigger.AvailableNow()).start())
      spark.table("ts_cdf")
        .select("id", "k", "amt", "_change_type", "_commit_version")
        .as[(Long, String, Double, String, Long)].collect().sorted.toSeq
    }
    val want = t.changeFeed(spark, 0L, 3L)
      .select("id", "k", "amt", "_change_type", "_commit_version")
      .as[(Long, String, Double, String, Long)].collect().sorted.toSeq
    assert(got === want)
    assert(got.map(_._4).groupBy(identity).view.mapValues(_.size).toMap
      === Map("insert" -> 2, "delete" -> 2)) // +c, -b, a→a+5 as delete+insert
  }

  test("first CDF batch without a cursor is the snapshot as seed inserts") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("enableChangeDataFeed" -> "true"))
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    t.append(Seq((3L, "c")).toDF("id", "k"))
    drain(spark.readStream.format("graft-table").option("path", root)
      .option("readChangeFeed", "true").load()
      .writeStream.format("memory").queryName("ts_seed")
      .option("checkpointLocation", tmpDir("ts-ckpt-"))
      .trigger(Trigger.AvailableNow()).start())
    val rows = spark.table("ts_seed")
      .as[(Long, String, String, Long)].collect().sorted.toSeq
    assert(rows === Seq((1L, "a", "insert", 1L), (2L, "b", "insert", 1L),
      (3L, "c", "insert", 1L)))
  }

  test("a vacuumed stream offset fails loudly instead of skipping commits") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((0L, "s")).toDF("id", "k"))
    (1 to 4).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "k")))
    t.vacuum(retainVersions = 2, orphanRetentionMs = 0) // retained: {3, 4}
    // a cursor at vacuumed version 0 cannot know which of versions 1-2's
    // rows it already delivered — the batch must refuse, not misalign the
    // step pairing and silently drop version 3's append
    val q = spark.readStream.format("graft-table").option("path", root)
      .option("startingVersion", "0").load()
      .writeStream.format("memory").queryName("ts_vac")
      .option("checkpointLocation", tmpDir("ts-ckpt-"))
      .trigger(Trigger.AvailableNow()).start()
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q.awaitTermination(60000)
    }
    def causes(t: Throwable): Seq[Throwable] =
      if (t == null) Nil else t +: causes(t.getCause)
    assert(causes(e).exists(c => c.getMessage != null &&
      c.getMessage.contains("no longer retained")), s"unexpected failure: $e")
  }

  test("maxVersionsPerBatch paces catch-up into bounded micro-batches") {
    val root = tmpDir("ts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((0L, "s")).toDF("id", "k"))
    (1 to 6).foreach(i => t.append(Seq((i.toLong, s"v$i")).toDF("id", "k")))
    // a ProcessingTime stream over the 6-versions-behind table: with the
    // cap at 2, catch-up needs ceil(6/2)=3 incremental batches after the
    // snapshot batch, each spanning at most 2 versions
    val q = spark.readStream.format("graft-table").option("path", root)
      .option("startingVersion", "0").option("maxVersionsPerBatch", "2").load()
      .writeStream.format("memory").queryName("ts_paced")
      .option("checkpointLocation", tmpDir("ts-ckpt-"))
      .trigger(Trigger.ProcessingTime(50)).start()
    val deadline = System.currentTimeMillis() + 60000
    while (spark.table("ts_paced").count() < 6 && System.currentTimeMillis() < deadline)
      Thread.sleep(100)
    q.stop()
    assert(spark.table("ts_paced").count() === 6) // every appended row, once
    // the progress log proves the pacing: no batch carried more than 2
    // versions' worth of rows (one row per version here)
    val sizes = q.recentProgress.map(_.numInputRows).filter(_ > 0)
    assert(sizes.nonEmpty && sizes.forall(_ <= 2),
      s"batch sizes ${sizes.mkString(",")} exceeded the 2-version cap")
  }
}
