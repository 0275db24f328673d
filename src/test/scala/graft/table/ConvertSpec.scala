package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** In-place conversion of plain parquet directories into versioned tables
  * ([[VersionedTable.convert]] — Delta's `CONVERT TO DELTA` shape): version
  * 0 references the existing files where they lie, with stats, hive
  * partition discovery, and full verb support afterwards. */
class ConvertSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("flat directory converts in place; reads, appends, and time travel work") {
    val root = tmpDir("cv-") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k")
      .repartition(2).write.parquet(root)
    val t = VersionedTable.convert(spark, root)
    assert(t.latestVersion().contains(0L))
    assert(!Files.exists(Paths.get(root, "data")), "no data files may move")
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    t.append(Seq((4L, "d")).toDF("id", "k"))
    assert(t.read(spark).count() === 4)
    assert(t.read(spark, versionAsOf = Some(0L)).count() === 3)
    assert(t.history(spark).filter("version = 0").head()
      .getAs[String]("operation") === "CONVERT")
  }

  test("hive-partitioned directory: partition columns, values, and pruning") {
    val root = tmpDir("cv-part-") + "/t"
    Seq((1L, "x", 10.0), (2L, "y", 20.0), (3L, "x", 30.0), (4L, "z", 40.0))
      .toDF("id", "k", "amt")
      .write.partitionBy("k").parquet(root)
    val t = VersionedTable.convert(spark, root)
    assert(t.read(spark).columns.sorted.toSeq === Seq("amt", "id", "k"))
    assert(t.read(spark).as[(Long, Double, String)].collect().length === 4)
    // manifest partition pruning: only the k=x files are listed for the read
    val (df, kept, total) = t.readPartitioned(spark, "k = 'x'")
    assert(kept < total, "partition pruning must drop non-matching files")
    assert(df.select("id").as[Long].collect().sorted.toSeq === Seq(1L, 3L))
    // a rewrite verb works and leaves the untouched partitions' ORIGINAL
    // files referenced (in-place files and rewritten files coexist)
    t.delete(spark, "k = 'y'")
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 3L, 4L))
  }

  test("null partition value round-trips through __HIVE_DEFAULT_PARTITION__") {
    val root = tmpDir("cv-null-") + "/t"
    Seq((1L, Some("x")), (2L, None)).toDF("id", "k")
      .write.partitionBy("k").parquet(root)
    val t = VersionedTable.convert(spark, root)
    val rows = t.read(spark).select("id", "k").as[(Long, Option[String])]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, Some("x")), (2L, None)))
  }

  test("stats collected at conversion drive file skipping") {
    val root = tmpDir("cv-stats-") + "/t"
    // two files with disjoint id ranges, written by the plain writer
    spark.range(0, 100).toDF("id").coalesce(1).write.parquet(root)
    spark.range(1000, 1100).toDF("id").coalesce(1)
      .write.mode("append").parquet(root)
    val t = VersionedTable.convert(spark, root)
    // a delete targeting only the high range must not touch the low file
    val (_, touched) = t.delete(spark, "id >= 1000")
    assert(touched === 1, s"stats must confine the rewrite to one file, got $touched")
    assert(t.read(spark).count() === 100)
  }

  test("a literal '+' in a partition value survives conversion (hive %XX " +
      "escaping has no '+'-for-space)") {
    val root = tmpDir("cv-plus-") + "/t"
    Seq((1L, "a+b"), (2L, "c d")).toDF("id", "k")
      .write.partitionBy("k").parquet(root)
    val t = VersionedTable.convert(spark, root)
    val rows = t.read(spark).select("id", "k").as[(Long, String)]
      .collect().sortBy(_._1).toSeq
    assert(rows === Seq((1L, "a+b"), (2L, "c d")),
      "URLDecoder form-decoding would have corrupted 'a+b' to 'a b'")
    // partition pruning keys on the recorded value — must match the literal
    val (df, kept, total) = t.readPartitioned(spark, "k = 'a+b'")
    assert(kept < total && df.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("converting an existing table or an empty directory is refused") {
    val root = tmpDir("cv-bad-") + "/t"
    Seq(1).toDF("x").write.parquet(root)
    VersionedTable.convert(spark, root)
    intercept[IllegalArgumentException](VersionedTable.convert(spark, root))
    val empty = tmpDir("cv-empty-")
    intercept[IllegalArgumentException](VersionedTable.convert(spark, empty))
  }

  test("converted tables stay by-name: no fabricated field ids") {
    val root = tmpDir("cv-ids-") + "/t"
    Seq((1L, "a")).toDF("id", "k").write.parquet(root)
    val t = VersionedTable.convert(spark, root)
    val node = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(root, "_graft_log", "v00000000.json")))
    assert(!node.has("columnIds"),
      "conversion must not fabricate field ids for bytes it did not write")
    // and later commits keep the table id-less (the legacy rule)
    t.append(Seq((2L, "b")).toDF("id", "k"))
    val n1 = new com.fasterxml.jackson.databind.ObjectMapper()
      .readTree(Files.readAllBytes(Paths.get(root, "_graft_log", "v00000001.json")))
    assert(!n1.has("columnIds"))
  }
}
