package graft.table

import graft.SparkSpec
import graft.table.Merge.{MatchedUpdate, NotMatchedInsert}
import org.apache.spark.sql.streaming.OutputMode
import org.scalatest.funsuite.AnyFunSuite

/** Partition-layout interplay with this round's new surfaces: shallow
  * clone, merge-on-read merge, and the streaming sink must all preserve
  * (and prune through) a hive-partitioned table. */
class PartitionedInteropSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def sample = Seq(
    (1L, "F", 10.0), (2L, "F", 20.0), (3L, "O", 30.0),
    (4L, "O", 40.0), (5L, "P", 50.0)).toDF("id", "status", "amount")

  test("cloneShallow of a partitioned table keeps layout and pruning") {
    val base = tmpDir("pi-")
    val src = VersionedTable(base + "/src")
    src.commit(sample, partitionBy = Seq("status"))
    val clone = src.cloneShallow(base + "/dst")
    assert(clone.partitionByOf(0L) === Seq("status"))
    val (df, scanned, total) = clone.readPartitioned(spark, "status = 'F'")
    assert(scanned < total)
    assert(df.as[(Long, String, Double)].collect().sorted.toSeq
      === Seq((1L, "F", 10.0), (2L, "F", 20.0)))
    // divergence on the clone's partitions leaves the source intact
    clone.delete(spark, "status = 'O'")
    assert(src.read(spark).count() === 5)
  }

  test("mergeMor on a partitioned table preserves layout and prunes reads") {
    val t = VersionedTable(tmpDir("pi-") + "/t")
    t.commit(sample, partitionBy = Seq("status"))
    val src = Seq((1L, "F", -1.0), (9L, "Z", 90.0)).toDF("id", "status", "amount")
    val (v1, tombs) = t.mergeMor(spark, src, "source.id = target.id", "id", "id",
      whenMatchedUpdate = Some(MatchedUpdate(None,
        Map("amount" -> "source.amount", "status" -> "source.status"))),
      whenNotMatchedInsert = Some(NotMatchedInsert(None, Map.empty)))
    assert(v1 === 1L && tombs === 1L)
    assert(t.partitionByOf(v1) === Seq("status"))
    assert(t.read(spark).as[(Long, String, Double)].collect().sorted.toSeq
      === Seq((1L, "F", -1.0), (2L, "F", 20.0), (3L, "O", 30.0),
        (4L, "O", 40.0), (5L, "P", 50.0), (9L, "Z", 90.0)))
    // the appended post-image/insert files carry partition values too
    val (df, scanned, total) = t.readPartitioned(spark, "status = 'Z'")
    assert(scanned < total)
    assert(df.count() === 1)
  }

  test("streaming sink with partition columns creates a partitioned table") {
    val root = tmpDir("pi-") + "/t"
    val s = new graft.streaming.TableStreamProvider().createSink(spark.sqlContext,
      Map("path" -> root, "txnAppId" -> "spec"), Seq("status"), OutputMode.Append)
    s.addBatch(0, sample)
    s.addBatch(1, Seq((6L, "F", 60.0)).toDF("id", "status", "amount"))
    val t = VersionedTable(root)
    assert(t.partitionByOf(t.resolve()) === Seq("status"))
    val (df, scanned, total) = t.readPartitioned(spark, "status = 'F'")
    assert(scanned < total)
    assert(df.count() === 3)
  }
}
