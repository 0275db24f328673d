package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import scala.jdk.CollectionConverters._

/** Partition evolution ([[VersionedTable.alterPartitioning]]): the spec
  * changes metadata-only, files keep their own layout epoch, reads union
  * the epochs, pruned reads stay correct (conservative keep + row filter),
  * rewrites migrate touched rows into the current spec, and
  * partition-directed verbs refuse while layouts are mixed. */
class PartitionEvolutionSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def mkTable(root: String): VersionedTable = {
    val t = VersionedTable(root)
    // epoch 0: partitioned by region — files physically LACK region
    t.commit(Seq((1L, "eu", "a", 10.0), (2L, "us", "a", 20.0), (3L, "eu", "b", 30.0))
      .toDF("id", "region", "cat", "amt"), numPartitions = Some(1),
      partitionBy = Seq("region")) // exactly one file per region value
    t
  }

  test("evolution is metadata-only and reads union the layout epochs") {
    val root = tmpDir("pe-")
    val t = mkTable(root)
    def dataFiles(): Seq[String] = {
      val d = java.nio.file.Paths.get(root, "data")
      val s = java.nio.file.Files.walk(d)
      try s.iterator().asInstanceOf[java.util.Iterator[java.nio.file.Path]]
        .asScala.filter(p => p.toString.endsWith(".parquet")).map(_.toString).toSeq.sorted
      finally s.close()
    }
    val filesBefore = dataFiles()
    t.alterPartitioning(Seq("cat"))
    assert(dataFiles() === filesBefore, "evolution must rewrite nothing")
    assert(t.partitionByOf(t.resolve()) === Seq("cat"))
    assert(t.history(spark).filter("operation = 'SET PARTITIONING'").count() === 1)
    assert(t.mixedLayoutOf(t.resolve()), "pre-evolution files are a legacy epoch")
    // epoch 1: partitioned by cat — files physically LACK cat, CONTAIN region
    t.append(Seq((4L, "ap", "b", 40.0)).toDF("id", "region", "cat", "amt"))
    val got = t.read(spark).as[(Long, String, String, Double)].collect().sortBy(_._1).toSeq
    assert(got === Seq((1L, "eu", "a", 10.0), (2L, "us", "a", 20.0),
      (3L, "eu", "b", 30.0), (4L, "ap", "b", 40.0)),
      s"mixed-epoch read lost or mangled rows: $got")
  }

  test("pruned reads: new-spec predicates prune the new epoch, keep the old conservatively") {
    val root = tmpDir("pe-prune-")
    val t = mkTable(root) // 2 region-files (eu, us)
    t.alterPartitioning(Seq("cat"))
    t.append(Seq((4L, "ap", "a", 40.0), (5L, "ap", "b", 50.0))
      .toDF("id", "region", "cat", "amt"),
      numPartitions = Some(1)) // exactly 2 cat-files (a, b)
    val (df, kept, total) = t.readPartitioned(spark, "cat = 'b'")
    assert(total === 4)
    // both legacy files kept conservatively + exactly the cat=b new file
    assert(kept === 3, s"expected 2 legacy + 1 matching new file, kept $kept")
    // ...but the ROWS are exactly the predicate's (the row filter works)
    assert(df.select("id").as[Long].collect().sorted.toSeq === Seq(3L, 5L))
  }

  test("rewrites migrate touched rows into the current spec; OPTIMIZE un-mixes") {
    val root = tmpDir("pe-mig-")
    val t = mkTable(root)
    t.alterPartitioning(Seq("cat"))
    // a row-level delete touches a legacy file: its survivors re-land in
    // the CURRENT layout
    t.delete(spark, "id = 1")
    assert(t.read(spark).count() === 2)
    // full OPTIMIZE rewrites every epoch into the current spec
    t.compact(spark)
    assert(!t.mixedLayoutOf(t.resolve()), "OPTIMIZE must migrate all epochs")
    // partition-directed verbs work again
    val parts = t.showPartitions(spark).select("cat").as[String].collect().sorted
    assert(parts.toSeq === Seq("a", "b"))
    val got = t.read(spark).as[(Long, String, String, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq === Seq(2L, 3L))
  }

  test("partition-directed verbs refuse on mixed layouts; validation refuses bad specs") {
    val root = tmpDir("pe-ref-")
    val t = mkTable(root)
    t.alterPartitioning(Seq("cat"))
    val e1 = intercept[IllegalArgumentException](
      t.overwritePartitions(Seq((9L, "eu", "a", 9.0)).toDF("id", "region", "cat", "amt")))
    assert(e1.getMessage.contains("mixes partition layouts"))
    val e2 = intercept[IllegalArgumentException](t.showPartitions(spark))
    assert(e2.getMessage.contains("mixes partition layouts"))
    val e3 = intercept[IllegalArgumentException](t.writeSymlinkManifest())
    assert(e3.getMessage.contains("mixes partition layouts"))
    // spec validation
    intercept[IllegalArgumentException](t.alterPartitioning(Seq("cat"))) // unchanged
    intercept[IllegalArgumentException](t.alterPartitioning(Seq("nope")))
    intercept[IllegalArgumentException](t.alterPartitioning(Seq("cat", "cat")))
  }

  test("evolving to unpartitioned and deletion vectors across epochs") {
    val root = tmpDir("pe-unp-")
    val t = mkTable(root)
    t.setProperties(Map("enableDeletionVectors" -> "true"))
    t.alterPartitioning(Nil) // unpartitioned spec
    assert(t.partitionByOf(t.resolve()).isEmpty)
    t.append(Seq((4L, "ap", "b", 40.0)).toDF("id", "region", "cat", "amt"))
    // MOR delete tombstones a legacy-epoch row without rewriting it — id 1
    // shares the eu file with id 3, so the delete stays PARTIAL (deleting
    // the us file's only row would correctly drop the file, no DV)
    t.deleteMor(spark, "id = 1")
    assert(t.dvFileCount() >= 1)
    val got = t.read(spark).select("id").as[Long].collect().sorted.toSeq
    assert(got === Seq(2L, 3L, 4L), s"DV must apply inside the legacy epoch scan: $got")
  }

  test("DSv2 catalog reads span layout epochs; count(*) pushdown stays exact") {
    val root = tmpDir("pe-dsv2-")
    val t = mkTable(root)
    t.alterPartitioning(Seq("cat"))
    t.append(Seq((4L, "ap", "b", 40.0)).toDF("id", "region", "cat", "amt"),
      numPartitions = Some(1))
    val got = spark.sql("SELECT id, region FROM graft.`" + root + "` ORDER BY id")
      .as[(Long, String)].collect().toSeq
    assert(got === Seq((1L, "eu"), (2L, "us"), (3L, "eu"), (4L, "ap")),
      "legacy-epoch partition values must inject through the catalog scan too")
    val c = spark.sql("SELECT count(*) FROM graft.`" + root + "`")
    assert(c.head.getLong(0) === 4L)
    assert(c.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      "per-file row counts are epoch-independent — the metadata path holds")
  }

  test("the SQL spelling routes to the kernel") {
    val root = tmpDir("pe-sql-")
    val t = mkTable(root)
    val r = TableSql.run(spark, s"ALTER TABLE '$root' SET PARTITIONED BY (cat)")
    assert(r.head.getString(0) === "SET PARTITIONED BY")
    assert(t.partitionByOf(t.resolve()) === Seq("cat"))
    TableSql.run(spark, s"ALTER TABLE '$root' SET PARTITIONED BY ()")
    assert(t.partitionByOf(t.resolve()).isEmpty)
    // DPP-style join pruning keeps legacy files conservatively
    t.alterPartitioning(Seq("region"))
    t.append(Seq((6L, "eu", "c", 60.0)).toDF("id", "region", "cat", "amt"))
    val dim = Seq("us").toDF("r")
    val (df, kept, total) = t.readPrunedByJoinKeys(spark, dim, "r", "region")
    assert(kept < total || total == kept, "sanity") // legacy kept, non-matching new pruned
    assert(df.filter("region = 'us'").count() === 1)
  }
}
