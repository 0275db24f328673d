package graft.table

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout coverage for [[VersionedTable]]: hive-partitioned
  * commits, manifest partition pruning (static + join-driven), and every
  * rewrite op preserving the layout. The reference's Delta-role table writes
  * to a partitioned S3 lake (`scd2-job.ipynb:163-172`); at 100 TB partition
  * pruning is the first lever anyone reaches for. */
class PartitionedTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "F", 10.0), (2L, "F", 20.0), (3L, "O", 30.0),
    (4L, "O", 40.0), (5L, "P", 50.0)).toDF("id", "status", "amount")

  test("partitioned commit lays out hive dirs, records values, reads back exactly") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    assert(t.partitionByOf(0L) === Seq("status"))
    val vals = t.partitionValuesOf(0L)
    assert(vals.nonEmpty)
    assert(vals.keys.forall(_.contains("status=")))
    assert(vals.values.flatMap(_.get("status")).flatten.toSet === Set("F", "O", "P"))
    val back = t.read(spark)
    // recorded column order and types survive the layout round trip
    assert(back.columns.toSeq === Seq("id", "status", "amount"))
    assert(back.schema("status").dataType.typeName === "string")
    assert(back.as[(Long, String, Double)].collect().sorted.toSeq ===
      sample.as[(Long, String, Double)].collect().sorted.toSeq)
  }

  test("readPartitioned scans only the surviving partitions' files") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val (df, scanned, total) = t.readPartitioned(spark, "status = 'F'")
    assert(scanned < total, s"expected pruning, scanned $scanned of $total")
    // the file-list proof: every scanned file sits in the surviving partition
    assert(df.inputFiles.nonEmpty && df.inputFiles.forall(_.contains("status=F")))
    assert(df.as[(Long, String, Double)].collect().sorted.toSeq ===
      Seq((1L, "F", 10.0), (2L, "F", 20.0)))
    // a predicate matching nothing returns an empty, correctly-typed frame
    val (none, s0, _) = t.readPartitioned(spark, "status = 'ZZZ'")
    assert(s0 === 0 && none.isEmpty && none.columns.toSeq === Seq("id", "status", "amount"))
  }

  test("readPrunedByJoinKeys prunes the fact file list from the dim side") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val dim = Seq(("F", "final"), ("P", "pending")).toDF("code", "label")
    val (df, scanned, total) = t.readPrunedByJoinKeys(spark, dim, "code", "status")
    assert(scanned < total)
    assert(df.inputFiles.forall(f => f.contains("status=F") || f.contains("status=P")))
    assert(df.join(dim, col("status") === col("code")).count() === 3L)
  }

  test("readPrunedByJoinKeys refuses a large dim side with a clear message") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    // the dim side's distinct keys collect to the driver (the DPP "small
    // side" assumption): a mis-aimed large dim must fail with a clear error,
    // not a driver OOM
    val bigDim = spark.range(0, 1000001).selectExpr("CAST(id AS STRING) AS code")
    val e = intercept[IllegalArgumentException] {
      t.readPrunedByJoinKeys(spark, bigDim, "code", "status")
    }
    assert(e.getMessage.contains("SMALL side"))
  }

  test("append inherits the table partitioning; appendsSince re-attaches values") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    t.append(Seq((6L, "F", 60.0), (7L, "X", 70.0)).toDF("id", "status", "amount"))
    assert(t.partitionByOf(1L) === Seq("status"))
    assert(t.read(spark).count() === 7L)
    val fresh = t.appendsSince(spark, 0L)
    assert(fresh.columns.toSeq === Seq("id", "status", "amount"))
    assert(fresh.as[(Long, String, Double)].collect().sorted.toSeq ===
      Seq((6L, "F", 60.0), (7L, "X", 70.0)))
    // pruning sees the new partition too
    val (_, scanned, total) = t.readPartitioned(spark, "status = 'X'")
    assert(scanned === 1 && total > 1)
  }

  test("COW delete and update preserve the layout and only touch matching partitions") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val (v1, _) = t.delete(spark, "status = 'P'")
    assert(v1 === 1L)
    assert(t.partitionByOf(v1) === Seq("status"))
    assert(t.read(spark).count() === 4L)
    // untouched partitions' values carried in the manifest
    assert(t.partitionValuesOf(v1).values.flatMap(_.get("status")).flatten.toSet
      === Set("F", "O"))
    val (v2, touched) = t.update(spark, "status = 'O'", Map("amount" -> "amount + 1"))
    assert(v2 === 2L && touched >= 1)
    assert(t.read(spark).filter("status = 'O'").agg(sum("amount")).head.getDouble(0) === 72.0)
    // partition values unchanged by an amount update
    assert(t.partitionValuesOf(v2).values.flatMap(_.get("status")).flatten.toSet
      === Set("F", "O"))
  }

  test("mergeCow on a partitioned table keeps layout and merges correctly") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val source = Seq((1L, "F", 99.0), (9L, "Q", 9.0)).toDF("id", "status", "amount")
    val (v1, _) = t.mergeCow(spark, source,
      "source.id = target.id", targetKey = "id", sourceKey = "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None,
        Map("amount" -> "source.amount"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
        Map("id" -> "source.id", "status" -> "source.status",
          "amount" -> "source.amount"))))
    assert(v1 === 1L)
    assert(t.partitionByOf(v1) === Seq("status"))
    val rows = t.read(spark).as[(Long, String, Double)].collect().toMap2
    assert(rows(1L) === ("F", 99.0))
    assert(rows(9L) === ("Q", 9.0))
    assert(t.read(spark).count() === 6L)
  }

  test("MOR delete tombstones partitioned rel paths; compact materializes them") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val (v1, n) = t.deleteMor(spark, "id = 3")
    assert(v1 === 1L && n === 1L)
    assert(t.read(spark).count() === 4L)
    assert(t.partitionByOf(v1) === Seq("status"))
    val v2 = t.compact(spark, numFiles = 2)
    assert(t.partitionByOf(v2) === Seq("status"))
    assert(t.read(spark).count() === 4L)
    assert(t.read(spark).filter("id = 3").isEmpty)
    // pruning still works on the compacted layout
    val (df, scanned, total) = t.readPartitioned(spark, "status = 'O'")
    assert(scanned < total && df.count() === 1L)
  }

  test("null partition values round-trip through the hive default marker") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(Seq((1L, Some("a")), (2L, None), (3L, Some("b")))
      .toDF("id", "k"), partitionBy = Seq("k"))
    val back = t.read(spark).as[(Long, Option[String])].collect().sorted.toSeq
    assert(back === Seq((1L, Some("a")), (2L, None), (3L, Some("b"))))
    val (nulls, scanned, total) = t.readPartitioned(spark, "k IS NULL")
    assert(scanned === 1 && total === 3)
    assert(nulls.as[(Long, Option[String])].collect().toSeq === Seq((2L, None)))
  }

  test("numeric partition columns prune numerically and get exact stats") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(Seq((1L, 2), (2L, 10), (3L, 7)).toDF("id", "bucket"),
      partitionBy = Seq("bucket"))
    // manifest stats skipping works on the injected partition stats: the
    // numeric compare must not treat 10 < 7 lexicographically
    val (_, scanned, total) = t.readPruned(spark, "bucket", "8", "11")
    assert(total === 3 && scanned === 1)
    val (df, s2, _) = t.readPartitioned(spark, "bucket >= 7")
    assert(s2 === 2)
    assert(df.schema("bucket").dataType.typeName === "integer")
    assert(df.as[(Long, Int)].collect().map(_._2).sorted.toSeq === Seq(7, 10))
  }

  test("restore and constraint publishes carry partition metadata") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    t.addConstraint(spark, "amount_pos", "amount > 0")
    assert(t.partitionByOf(1L) === Seq("status"))
    t.delete(spark, "status = 'F'")
    val v3 = t.restore(0L)
    assert(t.partitionByOf(v3) === Seq("status"))
    assert(t.read(spark).count() === 5L)
    val (_, scanned, total) = t.readPartitioned(spark, "status = 'F'")
    assert(scanned < total)
  }

  test("zOrder compaction refuses a partitioned table with a clear message") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(Seq((1L, 1, 2), (2L, 3, 4)).toDF("id", "a", "b"),
      partitionBy = Seq("id"))
    val e = intercept[IllegalArgumentException](
      t.compact(spark, zOrderBy = Seq("a", "b")))
    assert(e.getMessage.contains("partitioned"))
  }

  test("partition values with URI-hostile characters round-trip exactly") {
    // a space stays raw on disk but renders %20 in the scan's file_path URI;
    // ':' is Hive-escaped to %3A on disk and double-encodes to %253A; '+'
    // stays raw in both but form-decoding would read it as a space. The
    // partition-value re-attach and DV joins compare scan paths against
    // manifest names, so any rendering mismatch SILENTLY drops whole files.
    val t = VersionedTable(tmpDir("pt-"))
    // the escaped partition holds TWO rows so the MOR delete below is a
    // partial one — a sole-row file would (correctly) drop whole with no DV
    val rows = Seq((1L, "a b"), (2L, "a:b"), (3L, "a+b"), (4L, "a%b"),
      (5L, "plain"), (6L, "a:b"))
    t.commit(rows.toDF("id", "status").coalesce(1), partitionBy = Seq("status"))
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq === rows)
    // DV tombstones key by the same decoded path: delete inside an escaped
    // partition removes exactly that row (id 6 keeps the file partial)
    t.deleteMor(spark, "id = 2")
    assert(t.dvFileCount() >= 1, "a partial MOR delete must write a DV")
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq ===
      rows.filterNot(_._1 == 2L))
    // manifest partition pruning keys off the recorded (unescaped) value
    val (pr, scanned, total) = t.readPartitioned(spark, "status = 'a b'")
    assert(scanned === 1 && total === 5)
    assert(pr.as[(Long, String)].collect().toSeq === Seq((1L, "a b")))
  }

  test("symlink manifest writes one per-partition file listing exactly the live files") {
    val t = VersionedTable(tmpDir("pt-"))
    t.commit(sample, partitionBy = Seq("status"))
    val dir = t.writeSymlinkManifest()
    assert(dir.getFileName.toString === "_symlink_format_manifest")
    def listed(part: String): Seq[String] = {
      val m = dir.resolve(part).resolve("manifest")
      assert(java.nio.file.Files.exists(m), s"missing manifest for $part")
      new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
        .split("\n").toSeq.filter(_.nonEmpty)
    }
    // every partition's manifest lists that partition's data files as URIs
    val vals = t.partitionValuesOf(0L)
    Seq("F", "O", "P").foreach { s =>
      val expected = vals.collect {
        case (f, v) if v.get("status").contains(Some(s)) => f }.toSet
      val got = listed(s"status=$s")
      assert(got.nonEmpty && got.forall(_.startsWith("file:")))
      assert(got.map(_.split("/data/").last).map("data/" + _).toSet === expected)
    }
    // a delete empties nothing here but rewrites partition F's file; the
    // regenerated tree must list only the LIVE files (no stale entries)
    t.delete(spark, "id = 1")
    val dir2 = t.writeSymlinkManifest()
    val f2 = listed("status=F")
    val liveF = t.partitionValuesOf(t.latestVersion().get).collect {
      case (f, v) if v.get("status").contains(Some("F")) => f }.toSet
    assert(f2.map(_.split("/data/").last).map("data/" + _).toSet === liveF)
    assert(dir2 === dir)
  }

  test("dynamic partition overwrite replaces exactly the batch's partitions") {
    val t = VersionedTable(tmpDir("pt-dpo-"))
    t.commit(sample, partitionBy = Seq("status"))
    val fFilesBefore = t.partitionValuesOf(0L)
      .filter(_._2.get("status").flatten.contains("F")).keySet
    // batch recomputes partition O and introduces partition X
    val batch = Seq((3L, "O", 300.0), (9L, "X", 90.0)).toDF("id", "status", "amount")
    val (v1, replaced) = t.overwritePartitions(batch)
    assert(replaced >= 1)
    assert(t.read(spark).as[(Long, String, Double)].collect().sorted.toSeq ===
      Seq((1L, "F", 10.0), (2L, "F", 20.0), (3L, "O", 300.0),
        (5L, "P", 50.0), (9L, "X", 90.0)))
    // untouched partitions carry forward FILE-identical
    val fFilesAfter = t.partitionValuesOf(v1)
      .filter(_._2.get("status").flatten.contains("F")).keySet
    assert(fFilesAfter === fFilesBefore)
  }

  test("dynamic partition overwrite refusals: unpartitioned, appendOnly") {
    val flat = VersionedTable(tmpDir("pt-dpo-flat-"))
    flat.commit(Seq((1L, "a")).toDF("id", "k"))
    intercept[IllegalArgumentException](
      flat.overwritePartitions(Seq((2L, "b")).toDF("id", "k")))
    val ro = VersionedTable(tmpDir("pt-dpo-ro-"))
    ro.commit(sample, partitionBy = Seq("status"))
    ro.setProperties(Map("appendOnly" -> "true"))
    intercept[IllegalArgumentException](
      ro.overwritePartitions(Seq((3L, "O", 300.0)).toDF("id", "status", "amount")))
  }

  test("dynamic partition overwrite folds an append OUTSIDE the replaced " +
      "partitions and raises on one inside") {
    // outside: fold (serial result)
    val r1 = tmpDir("pt-dpo-rb1-") + "/t"
    VersionedTable(r1).commit(sample, partitionBy = Seq("status"))
    val t1 = new VersionedTable(r1, new InterposingStore(() =>
      VersionedTable(r1).append(Seq((6L, "P", 60.0)).toDF("id", "status", "amount"))))
    t1.overwritePartitions(Seq((3L, "O", 300.0)).toDF("id", "status", "amount"))
    assert(VersionedTable(r1).read(spark).as[(Long, String, Double)]
      .collect().sorted.toSeq ===
      Seq((1L, "F", 10.0), (2L, "F", 20.0), (3L, "O", 300.0),
        (5L, "P", 50.0), (6L, "P", 60.0)))
    // inside the replaced partition: the two serial orders diverge — raise
    val r2 = tmpDir("pt-dpo-rb2-") + "/t"
    VersionedTable(r2).commit(sample, partitionBy = Seq("status"))
    val t2 = new VersionedTable(r2, new InterposingStore(() =>
      VersionedTable(r2).append(Seq((7L, "O", 70.0)).toDF("id", "status", "amount"))))
    intercept[ConcurrentCommitException](
      t2.overwritePartitions(Seq((3L, "O", 300.0)).toDF("id", "status", "amount")))
  }

  /** Delegates to [[LinkCommitStore]], firing `interlope` once before the
    * first manifest put (the RebaseSpec pattern). */
  private final class InterposingStore(interlope: () => Unit) extends CommitStore {
    private val fired = new java.util.concurrent.atomic.AtomicBoolean(false)
    override def putIfAbsent(target: java.nio.file.Path,
        bytes: Array[Byte]): Boolean = {
      if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
          fired.compareAndSet(false, true)) interlope()
      LinkCommitStore.putIfAbsent(target, bytes)
    }
  }

  private implicit class ToMap2(rows: Array[(Long, String, Double)]) {
    def toMap2: Map[Long, (String, Double)] =
      rows.map { case (id, s, a) => id -> (s, a) }.toMap
  }
}
