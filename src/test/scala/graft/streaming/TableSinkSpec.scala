package graft.streaming

import graft.SparkSpec
import graft.table.VersionedTable
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Streaming-sink face of the graft-table format ([[TableStreamSink]]):
  * addBatch-level exactly-once via txn marks, Complete-mode snapshots,
  * Update-mode refusal. The end-to-end restart (real writeStream +
  * checkpoint) is exercised by the q102 gate entry. */
class TableSinkSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sink(root: String, mode: OutputMode, opts: Map[String, String] = Map.empty) =
    new TableStreamProvider().createSink(spark.sqlContext,
      Map("path" -> root, "txnAppId" -> "spec") ++ opts, Nil, mode)

  test("append-mode addBatch commits once per batchId, replays are skipped") {
    val root = tmpDir("tsink-") + "/t"
    val s = sink(root, OutputMode.Append)
    s.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    s.addBatch(0, Seq((1L, "a"), (2L, "b")).toDF("id", "k")) // crash-replay
    val t = VersionedTable(root)
    assert(t.latestVersion().contains(0L))
    s.addBatch(1, Seq((3L, "c")).toDF("id", "k"))
    assert(t.latestVersion().contains(1L))
    // a STALE batchId after a newer one is also a replay (mark is a high-water)
    s.addBatch(0, Seq((9L, "x")).toDF("id", "k"))
    assert(t.latestVersion().contains(1L))
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("append-mode sink evolves the schema when a later stream adds columns") {
    // the Delta mergeSchema-for-streaming shape: a producer redeploy adds a
    // column mid-stream (new sink instance, same table + txnAppId); the
    // table widens nullable and every older row reads the new column null
    val root = tmpDir("tsink-") + "/t"
    sink(root, OutputMode.Append).addBatch(0, Seq((1L, "a")).toDF("id", "k"))
    sink(root, OutputMode.Append)
      .addBatch(1, Seq((2L, "b", 0.5)).toDF("id", "k", "score"))
    val t = VersionedTable(root)
    val rows = t.read(spark).select("id", "k", "score")
      .as[(Long, String, Option[Double])].collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", Some(0.5))))
    assert(t.read(spark).schema("score").nullable,
      "the evolved column must be recorded nullable")
    // the reverse — a batch MISSING a table column — refuses loudly
    // (silent null-filling would hide a broken producer)
    val e = intercept[Exception] {
      sink(root, OutputMode.Append).addBatch(2, Seq((3L, "c")).toDF("id", "k"))
    }
    assert(e.getMessage.contains("missing table column"))
  }

  test("complete-mode addBatch snapshots the table per batch") {
    val root = tmpDir("tsink-") + "/t"
    val s = sink(root, OutputMode.Complete)
    s.addBatch(0, Seq((1L, 10.0)).toDF("k", "v"))
    s.addBatch(1, Seq((1L, 10.0), (2L, 20.0)).toDF("k", "v"))
    s.addBatch(1, Seq((9L, 99.0)).toDF("k", "v")) // replay: ignored
    val t = VersionedTable(root)
    assert(t.read(spark).as[(Long, Double)].collect().sorted.toSeq
      === Seq((1L, 10.0), (2L, 20.0)))
    // each non-replayed batch is one full snapshot version
    assert(t.latestVersion().contains(1L))
  }

  test("update mode and missing txn identity are refused") {
    val root = tmpDir("tsink-") + "/t"
    intercept[IllegalArgumentException] { sink(root, OutputMode.Update) }
    intercept[IllegalArgumentException] {
      new TableStreamProvider().createSink(spark.sqlContext,
        Map("path" -> root), Nil, OutputMode.Append)
    }
    // checkpointLocation is an accepted identity fallback
    new TableStreamProvider().createSink(spark.sqlContext,
      Map("path" -> root, "checkpointLocation" -> (root + "/ckpt")),
      Nil, OutputMode.Append)
  }

  test("sink options shape the files: sortBy yields skippable stats") {
    val root = tmpDir("tsink-") + "/t"
    val s = sink(root, OutputMode.Append,
      Map("numPartitions" -> "4", "sortBy" -> "id"))
    s.addBatch(0, spark.range(0, 1000).selectExpr("id", "id % 3 AS v"))
    val (_, kept, total) = VersionedTable(root).readBounded(spark,
      Seq(("id", Some("0"), Some("100"))))
    assert(total === 4 && kept === 1)
  }
}
