package graft.table

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Write-time change-data-feed coverage: every rewrite op persists its
  * change rows at commit time and [[VersionedTable.changeFeed]] serves them
  * WITHOUT re-diffing snapshots — the property that makes continuous CDC
  * viable at 100 TB (the legacy [[VersionedTable.changes]] re-diff is
  * O(two snapshots) per call). */
class ChangeFeedSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def bag(df: DataFrame): Seq[String] =
    df.collect().map(_.toSeq.map(String.valueOf).mkString("|")).sorted.toSeq

  /** Write-time capture is opt-in (Delta `delta.enableChangeDataFeed`
    * parity) — every table in this suite asserts the stored path, so
    * enable it at creation. */
  private def cdfOn(t: VersionedTable): VersionedTable = {
    t.setProperties(Map("enableChangeDataFeed" -> "true")); t
  }

  private def base = Seq(
    (1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0), (4L, "c", 40.0))
    .toDF("id", "k", "amount")

  test("each op records its capture kind in the manifest") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)                                    // v0: overwrite, no capture
    t.append(Seq((5L, "d", 50.0)).toDF("id", "k", "amount")) // v1
    t.delete(spark, "k = 'c'")                        // v2
    t.update(spark, "k = 'a'", Map("amount" -> "amount + 1")) // v3
    t.deleteMor(spark, "id = 5")                      // v4
    t.compact(spark)                                  // v5
    assert(t.cdfKindOf(0L).isEmpty)
    assert(t.cdfKindOf(1L).contains("append"))
    assert(t.cdfKindOf(2L).contains("files"))
    assert(t.cdfKindOf(3L).contains("files"))
    assert(t.cdfKindOf(4L).contains("files"))
    assert(t.cdfKindOf(5L).contains("none"))
    assert(t.cdfFilesOf(2L).nonEmpty && t.cdfFilesOf(2L).forall(_.startsWith("cdf/")))
  }

  test("stored CDF equals the computed snapshot diff for every rewrite kind") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.append(Seq((5L, "d", 50.0)).toDF("id", "k", "amount"))          // v1
    t.delete(spark, "k = 'c'")                                        // v2
    t.update(spark, "k = 'a'", Map("amount" -> "amount * 2"))         // v3
    val src = Seq((1L, "a", 99.0), (9L, "z", 9.0)).toDF("id", "k", "amount")
    t.mergeCow(spark, src, "source.id = target.id", "id", "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("amount" -> "source.amount"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
        Map("id" -> "source.id", "k" -> "source.k", "amount" -> "source.amount")))) // v4
    t.deleteMor(spark, "id = 2")                                      // v5
    (1L to 5L).foreach { v =>
      val stored = bag(t.changeFeed(spark, v - 1, v).drop("_commit_version"))
      val computed = bag(t.changes(spark, v - 1, v))
      assert(stored === computed, s"stored CDF of v$v diverges from the snapshot diff")
    }
  }

  test("the stored path reads only cdf/fresh files, never the snapshots") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.append(Seq((5L, "d", 50.0)).toDF("id", "k", "amount")) // v1
    t.delete(spark, "k = 'a'")                               // v2
    val appendStep = t.changeFeed(spark, 0L, 1L)
    assert(appendStep.inputFiles.nonEmpty)
    val v0Files = t.read(spark, versionAsOf = Some(0L)).inputFiles.toSet
    assert(appendStep.inputFiles.forall(f => !v0Files.contains(f)),
      "an append step must read only the fresh files, not the base snapshot")
    val deleteStep = t.changeFeed(spark, 1L, 2L)
    assert(deleteStep.inputFiles.nonEmpty &&
      deleteStep.inputFiles.forall(_.contains("/cdf/")),
      s"a rewrite step must be served from cdf/ storage, got " +
        deleteStep.inputFiles.mkString(", "))
  }

  test("per-commit semantics: churn inside the range stays visible") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.append(Seq((7L, "x", 70.0)).toDF("id", "k", "amount")) // v1: insert 7
    t.delete(spark, "id = 7")                                // v2: delete 7
    val feed = t.changeFeed(spark, 0L, 2L)
    val seven = feed.filter("id = 7").select("_change_type", "_commit_version")
      .as[(String, Long)].collect().sorted.toSeq
    assert(seven === Seq(("delete", 2L), ("insert", 1L)),
      "per-commit feed must show the insert AND the delete")
    // the endpoint snapshot diff cancels them — different contract, both right
    assert(t.changes(spark, 0L, 2L).filter("id = 7").isEmpty)
  }

  test("compaction and constraint commits contribute nothing and scan nothing") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.compact(spark)                       // v1
    t.addConstraint(spark, "amt", "amount > 0") // v2
    val feed = t.changeFeed(spark, 0L, 2L)
    assert(feed.isEmpty)
    assert(feed.inputFiles.isEmpty, "a none-kind step must not read any file")
  }

  test("legacy/overwrite steps fall back to the snapshot re-diff per step") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.commit(base.filter("id <= 2"))       // v1: overwrite — no capture possible
    t.append(Seq((8L, "y", 80.0)).toDF("id", "k", "amount")) // v2: captured
    val feed = t.changeFeed(spark, 0L, 2L)
    val v1 = bag(feed.filter("_commit_version = 1").drop("_commit_version"))
    assert(v1 === bag(t.changes(spark, 0L, 1L)))
    assert(feed.filter("_commit_version = 2").count() === 1L)
  }

  test("vacuum drops dropped versions' cdf files and keeps retained ones") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base)
    t.delete(spark, "id = 1")   // v1 — cdf batch A
    t.delete(spark, "id = 2")   // v2 — cdf batch B
    t.delete(spark, "id = 3")   // v3 — cdf batch C
    val keepCdf = t.cdfFilesOf(3L)
    t.vacuum(retainVersions = 1)
    assert(keepCdf.forall(f =>
      java.nio.file.Files.exists(java.nio.file.Paths.get(t.root).resolve(f))),
      "the retained version's cdf files must survive vacuum")
    val gone = t.cdfFilesOf(3L) // v3 is the only retained manifest
    assert(t.versions() === Seq(3L))
    // batches A/B belonged to dropped manifests only — physically gone
    val cdfRoot = java.nio.file.Paths.get(t.root).resolve("cdf")
    val remaining = java.nio.file.Files.walk(cdfRoot).filter(p =>
      p.toString.endsWith(".parquet")).count()
    assert(remaining === gone.size.toLong,
      s"expected only the retained cdf batch on disk, found $remaining files")
  }

  test("partitioned tables serve CDF with partition columns attached") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(base, partitionBy = Seq("k"))
    t.delete(spark, "k = 'a'") // v1
    val feed = t.changeFeed(spark, 0L, 1L)
    assert(feed.columns.contains("k"))
    assert(feed.select("k").as[String].collect().toSet === Set("a"))
    assert(feed.count() === 2L)
    t.append(Seq((6L, "q", 60.0)).toDF("id", "k", "amount")) // v2
    val appendFeed = t.changeFeed(spark, 1L, 2L)
    assert(appendFeed.select("id", "k").as[(Long, String)].collect().toSeq
      === Seq((6L, "q")))
  }

  test("additive schema evolution aligns by name across the feed") {
    val t = cdfOn(VersionedTable(tmpDir("cdf-")))
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.append(Seq((2L, "b", 5.0)).toDF("id", "k", "extra")) // v1 widens
    val feed = t.changeFeed(spark, 0L, 1L)
    assert(feed.columns.toSet === Set("id", "k", "extra", "_change_type", "_commit_version"))
    val rows = feed.select("id", "extra").as[(Long, Option[Double])].collect().toSeq
    assert(rows === Seq((2L, Some(5.0))))
  }
}
