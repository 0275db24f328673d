package graft.table

import graft.SparkSpec
import graft.table.Merge.{MatchedDelete, MatchedUpdate, NotMatchedInsert}
import org.scalatest.funsuite.AnyFunSuite

/** Merge-on-read MERGE ([[VersionedTable.mergeMor]]): DV tombstones +
  * appended row images instead of file rewrites. Result parity with the
  * COW merge kernel, no-rewrite proof via vacuum survival, identity-update
  * write-freedom, and CDF capture parity. */
class MergeMorSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val update = Some(MatchedUpdate(None, Map("v" -> "source.v")))
  private val insert = Some(NotMatchedInsert(None, Map.empty))

  private def seed(root: String): VersionedTable = {
    val t = VersionedTable(root)
    t.commit(spark.range(0, 1000).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v"),
      numPartitions = Some(8), sortBy = Seq("k"))
    t
  }

  test("mergeMor equals mergeCow on the same inputs, rewriting nothing") {
    val base = tmpDir("mor-")
    val src = Seq((10L, -1.0), (500L, -2.0), (2000L, 9.0)).toDF("k", "v")
    val cow = seed(base + "/cow")
    cow.mergeCow(spark, src, "source.k = target.k", "k", "k", update, None, insert)
    val mor = seed(base + "/mor")
    val (v1, tombs) = mor.mergeMor(spark, src, "source.k = target.k", "k", "k",
      update, None, insert)
    assert(v1 === 1L && tombs === 2L) // two matched updates tombstoned
    assert(mor.read(spark).as[(Long, Double)].collect().sorted.toSeq
      === cow.read(spark).as[(Long, Double)].collect().sorted.toSeq)
    // no-rewrite proof: vacuum at head deletes unreferenced files; every
    // original data file must survive because the head still references it
    val before = java.nio.file.Files.list(java.nio.file.Paths.get(base + "/mor"))
      .toArray.length
    mor.vacuum(retainVersions = 1)
    assert(java.nio.file.Files.list(java.nio.file.Paths.get(base + "/mor"))
      .toArray.length >= before - 1) // only manifest-age cleanup, data intact
    assert(mor.read(spark).count() === 1001)
  }

  test("matched-delete clause tombstones without appending") {
    val t = seed(tmpDir("mor-") + "/t")
    val src = Seq((10L, 0.0), (999L, 0.0)).toDF("k", "v")
    val (v1, tombs) = t.mergeMor(spark, src, "source.k = target.k", "k", "k",
      whenMatchedDelete = Some(MatchedDelete(None)))
    assert(v1 === 1L && tombs === 2L)
    assert(t.read(spark).count() === 998)
    assert(t.read(spark).filter("k IN (10, 999)").count() === 0)
  }

  test("a re-delivered batch is write-free: identity updates commit nothing") {
    val t = seed(tmpDir("mor-") + "/t")
    val src = Seq((10L, -1.0), (2000L, 9.0)).toDF("k", "v")
    val (v1, _) = t.mergeMor(spark, src, "source.k = target.k", "k", "k", update, None, insert)
    assert(v1 === 1L)
    // same batch again: the update half is now identity, the insert half
    // now matches identically — nothing changes, no version burned
    val (v2, tombs2) = t.mergeMor(spark, src, "source.k = target.k", "k", "k",
      update, None, insert)
    assert(v2 === 1L && tombs2 === 0L)
    assert(t.read(spark).count() === 1001)
  }

  test("schemaEvolution on the MOR path: DVs + appends under the widened schema") {
    val t = seed(tmpDir("mor-evo-") + "/t")
    val src = Seq((10L, -1.0, "x"), (2000L, 9.0, "y")).toDF("k", "v", "tag")
    val (v1, tombs) = t.mergeMor(spark, src, "source.k = target.k", "k", "k",
      Some(MatchedUpdate(None, Map("v" -> "source.v", "tag" -> "source.tag"))),
      None, insert, schemaEvolution = true)
    assert(v1 === 1L && tombs === 1L)
    val out = t.read(spark)
    assert(out.columns.toSeq === Seq("k", "v", "tag"))
    assert(out.count() === 1001)
    assert(out.filter("k = 10").head.getString(2) === "x")
    assert(out.filter("k = 2000").head.getString(2) === "y")
    assert(out.filter("tag IS NULL").count() === 999) // old files: null back-fill
  }

  test("CDF capture parity with the COW merge") {
    val base = tmpDir("mor-")
    val src = Seq((10L, -1.0), (500L, 500.0), (2000L, 9.0)).toDF("k", "v")
    def changed(t: VersionedTable): Seq[(String, Long, Double)] = {
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      t.mergeMor(spark, src, "source.k = target.k", "k", "k", update, None, insert)
      t.changeFeed(spark, 0, t.latestVersion().get)
        .select("_change_type", "k", "v").as[(String, Long, Double)]
        .collect().sorted.toSeq
    }
    val mor = seed(base + "/mor")
    val got = changed(mor)
    // k=500 is an identity update (v was already 500.0): no CDF pair, no
    // tombstone; k=10 emits delete+insert; k=2000 emits insert
    assert(got === Seq(("delete", 10L, 10.0), ("insert", 10L, -1.0),
      ("insert", 2000L, 9.0)))
  }

  test("later compact materializes the tombstones and clears the DVs") {
    val t = seed(tmpDir("mor-") + "/t")
    val src = Seq((10L, -1.0)).toDF("k", "v")
    t.mergeMor(spark, src, "source.k = target.k", "k", "k", update, None, insert)
    t.compact(spark)
    assert(t.read(spark).filter("k = 10").as[(Long, Double)].collect().toSeq
      === Seq((10L, -1.0)))
    assert(t.read(spark).count() === 1000)
  }

  test("prune-key not implied by the condition is refused") {
    val t = seed(tmpDir("mor-") + "/t")
    intercept[IllegalArgumentException] {
      t.mergeMor(spark, Seq((1L, 0.0)).toDF("k", "v"),
        "source.k = target.k OR source.v = target.v", "k", "k", update)
    }
  }
}
