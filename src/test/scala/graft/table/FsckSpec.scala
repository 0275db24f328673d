package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** [[VersionedTable.fsck]] — manifest/storage reconciliation after data
  * files are lost out from under the log. The gate query (q136_fsck) covers
  * the happy repair path; this spec pins the refusal and edge semantics. */
class FsckSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("a missing deletion vector refuses repair (rows would resurrect)") {
    val base = tmpDir("fsck-dv-")
    val t = VersionedTable(base + "/t")
    t.commit(spark.range(0, 100).selectExpr("id AS k", "id % 3 AS v"),
      numPartitions = Some(2))
    t.deleteMor(spark, "k = 7") // a DV sidecar now guards the base file
    val dv = Files.walk(Paths.get(base + "/t/dv")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet"))
    assert(dv.nonEmpty)
    dv.foreach(Files.delete)
    val e = intercept[IllegalArgumentException] { t.fsck() }
    assert(e.getMessage.toLowerCase.contains("resurrect"))
  }

  test("fsck keeps surviving DVs in force — repaired reads stay delete-exact") {
    val base = tmpDir("fsck-keep-")
    val t = VersionedTable(base + "/t")
    // two files laid by key range so the loss is one whole file
    t.commit(spark.range(0, 100).selectExpr("id AS k", "id % 3 AS v"),
      numPartitions = Some(2), sortBy = Seq("k"))
    t.deleteMor(spark, "k = 7") // DV on the low file
    val low = t.partitionValuesOf(t.resolve()) // unpartitioned: empty map
    // lose the HIGH file (no DV rows reference it) — selected via the
    // manifest's recorded min-k stat: content-addressed file NAMES carry
    // no key-order guarantee, so a path maxBy could flake onto the
    // DV-covered low file instead
    val stats = t.statsOf(t.resolve())
    assert(low.isEmpty && stats.size === 2)
    val highRel = stats.maxBy { case (_, s) => s("k")._1.toLong }._1
    Files.delete(Paths.get(base + "/t").resolve(highRel))
    val (missing, nv) = t.fsck()
    assert(missing.length === 1 && nv.isDefined)
    val rows = t.read(spark).select("k").as[Long].collect().sorted
    // the low file's rows survive MINUS the DV-deleted row 7
    assert(rows.length < 100 && !rows.contains(7L) && rows.contains(0L))
  }

  test("history before the repair stays intact; the repair is pinned") {
    val base = tmpDir("fsck-hist-")
    val t = VersionedTable(base + "/t")
    t.commit(spark.range(0, 50).selectExpr("id AS k"), numPartitions = Some(2),
      sortBy = Seq("k"))
    t.append(spark.range(50, 100).selectExpr("id AS k"), numPartitions = Some(1))
    val v = t.resolve()
    val appended = Files.walk(Paths.get(base + "/t/data")).toArray
      .map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet")).maxBy(Files.getLastModifiedTime(_))
    Files.delete(appended)
    val (missing, nv) = t.fsck()
    assert(missing.length === 1 && nv.contains(v + 1))
    // v0 predates the loss and still reads
    assert(t.read(spark, versionAsOf = Some(0L)).count() === 50)
    // the repaired head reads, with the appended batch's file dropped
    assert(t.read(spark).count() === 50)
    // FSCK is visible in the operation history
    assert(t.fsck() === ((Nil, None))) // repaired head is clean
  }
}
