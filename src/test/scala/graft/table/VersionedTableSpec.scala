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

  test("numPartitions controls written file count") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(1000).toDF(), numPartitions = Some(3))
    val files = new java.io.File(s"$root/data").listFiles().head.listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 3)
  }
}
