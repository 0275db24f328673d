package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class VersionedTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("commit assigns consecutive versions; reads resolve latest / relative / absolute") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    assert(t.latestVersion().isEmpty)
    assert(t.commit(Seq(1, 2, 3).toDF("x")) === 0L)
    assert(t.commit(Seq(4, 5).toDF("x")) === 1L)
    assert(t.commit(Seq(6).toDF("x")) === 2L)
    assert(t.versions() === Seq(0L, 1L, 2L))
    assert(t.read(spark).as[Int].collect().sorted.toSeq === Seq(6))
    assert(t.read(spark, relativeVersion = Some(-1)).as[Int].collect().sorted.toSeq === Seq(4, 5))
    assert(t.read(spark, relativeVersion = Some(-2)).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(t.read(spark, versionAsOf = Some(0L)).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("old versions are immutable across later commits (snapshot isolation)") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq("a").toDF("s"))
    val v0 = t.read(spark, versionAsOf = Some(0L)).as[String].collect().toSeq
    t.commit(Seq("b", "c").toDF("s"))
    assert(t.read(spark, versionAsOf = Some(0L)).as[String].collect().toSeq === v0)
  }

  test("relativeVersion past version 0 and positive values are rejected") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1).toDF("x"))
    assertThrows[IllegalArgumentException](t.resolve(relativeVersion = Some(-1)))
    assertThrows[IllegalArgumentException](t.resolve(relativeVersion = Some(1)))
    assertThrows[IllegalArgumentException](t.resolve(versionAsOf = Some(7L)))
  }

  test("a vacuumed version fails relativeVersion resolve with a clear error") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    (1 to 4).foreach(i => t.commit(Seq(i).toDF("x")))
    t.vacuum(retainVersions = 2)
    val e = intercept[IllegalArgumentException](t.resolve(relativeVersion = Some(-3)))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("txn-stamped commits make micro-batch replay idempotent") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    val app = "chk://query-1"
    assert(t.lastTxn(app).isEmpty)
    t.commit(Seq(1).toDF("x"), txn = Some(app -> 0L))
    t.commit(Seq(2).toDF("x"), txn = Some(app -> 1L))
    // a different writer's commit in between must not mask this app's txn
    t.commit(Seq(3).toDF("x"))
    assert(t.lastTxn(app) === Some(1L))
    assert(t.lastTxn("chk://other").isEmpty)
    // the foreachBatch replay guard: batch 1 re-delivered after a crash
    // between commit and checkpoint advance → caller sees it as committed
    assert(t.lastTxn(app).exists(_ >= 1L))
  }

  test("stats-based file skipping prunes range-sorted commits") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    val (hit, scanned, total) = t.readPruned(spark, "id", "0", "100")
    assert(total === 4)
    assert(scanned < total, "range-sorted files must allow skipping")
    // pruning is whole-file: the kept file(s) superset the range, and the
    // residual row filter recovers exactly the requested rows
    assert(hit.filter(col("id") <= 100).count() === 101)
    // out-of-range predicate prunes everything but keeps the schema
    val (none, s2, _) = t.readPruned(spark, "id", "5000", "6000")
    assert(s2 === 0 && none.count() === 0 && none.columns.toSeq === Seq("id", "v"))
  }

  test("compaction rewrites as a new version; vacuum drops old files") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).toDF("x"), numPartitions = Some(8))
    t.commit(spark.range(100, 200).toDF("x"), numPartitions = Some(8))
    val before = t.read(spark).as[Long].collect().sorted.toSeq
    val v = t.compact(spark, numFiles = 1)
    assert(v === 2L)
    assert(t.read(spark).as[Long].collect().sorted.toSeq === before)
    // old versions still time-travelable pre-vacuum
    assert(t.read(spark, versionAsOf = Some(0L)).count() === 100)
    val deleted = t.vacuum(retainVersions = 1)
    assert(deleted === 16) // both pre-compaction versions' 8-file sets, none shared
    assert(t.versions() === Seq(2L))
    assert(t.read(spark).as[Long].collect().sorted.toSeq === before)
  }

  test("a fully-deleted snapshot (empty version) stays readable with its schema") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.commit(Seq((1L, "a")).toDF("id", "v").limit(0)) // delete-everything merge
    val empty = t.read(spark)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "v"))
    assert(t.read(spark, relativeVersion = Some(-1)).count() === 1)
  }

  test("a foreign manifest landing between commits never gets clobbered") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1).toDF("x"))
    // a racing writer claimed version 1 (empty snapshot) out-of-band
    val log = java.nio.file.Paths.get(root, "_graft_log")
    java.nio.file.Files.write(log.resolve("v00000001.json"),
      """{"version":1,"files":[]}""".getBytes("UTF-8"))
    // our next commit observes it and takes version 2; v1 is untouched
    assert(t.commit(Seq(2).toDF("x")) === 2L)
    assert(t.versions() === Seq(0L, 1L, 2L))
    assert(t.read(spark).as[Int].collect().toSeq === Seq(2))
  }

  test("numPartitions controls written file count") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(1000).toDF(), numPartitions = Some(3))
    val files = new java.io.File(s"$root/data").listFiles().head.listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 3)
  }
}
