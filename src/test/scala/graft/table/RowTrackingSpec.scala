package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Row tracking ([[VersionedTable.enableRowTracking]]): stable per-row ids
  * that survive every rewrite verb, allocated for new rows, and joinable
  * across CDF delete+insert pairs to reconstruct updates. */
class RowTrackingSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def idMap(t: VersionedTable): Map[Long, String] =
    t.read(spark).select("_row_id", "k").as[(Long, String)].collect().toMap

  test("ids are stable through UPDATE, DELETE, and OPTIMIZE; appends allocate fresh") {
    val root = tmpDir("rt-")
    val t = VersionedTable(root)
    t.commit(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "qty"),
      numPartitions = Some(2))
    t.enableRowTracking(spark)
    val before = idMap(t)
    assert(before.keySet === Set(1L, 2L, 3L), s"contiguous backfill ids: $before")
    // a COW update rewrites the touched file; ids must carry
    t.update(spark, "k = 'b'", Map("qty" -> "20"))
    assert(idMap(t) === before, "UPDATE must not change any row's id")
    // OPTIMIZE rewrites everything; ids must carry
    t.compact(spark)
    assert(idMap(t) === before, "OPTIMIZE must not change any row's id")
    // a delete retires an id forever (never re-minted)
    t.delete(spark, "k = 'a'")
    val deletedId = before.collectFirst { case (id, "a") => id }.get
    // new rows allocate ABOVE the water — the deleted id never returns
    val (_, first, _) = t.appendIdentity(spark, Seq(("d", 4)).toDF("k", "qty"))
    assert(first > before.keys.max,
      s"fresh allocation $first must clear every ever-minted id")
    assert(!idMap(t).contains(deletedId), "a deleted row's id must stay retired")
  }

  test("targeted writes of the row-id column refuse; double enable refuses") {
    val root = tmpDir("rt-ref-")
    val t = VersionedTable(root)
    t.commit(Seq(("a", 1)).toDF("k", "qty"))
    t.enableRowTracking(spark)
    intercept[IllegalArgumentException](
      t.update(spark, "k = 'a'", Map("_row_id" -> "99")))
    intercept[IllegalArgumentException](t.enableRowTracking(spark))
    intercept[IllegalArgumentException](
      t.appendIdentity(spark, Seq((50L, "x", 9)).toDF("_row_id", "k", "qty")))
  }

  test("CDF delete+insert pairs stitch into updates by row id") {
    val root = tmpDir("rt-cdf-")
    val t = VersionedTable(root)
    t.setProperties(Map("enableChangeDataFeed" -> "true"))
    t.commit(Seq(("a", 1), ("b", 2)).toDF("k", "qty"), numPartitions = Some(1))
    t.enableRowTracking(spark)
    val v0 = t.resolve()
    t.update(spark, "k = 'a'", Map("qty" -> "10"))
    val cdf = t.changeFeed(spark, v0, t.resolve())
    // without row ids, a consumer cannot tell "a changed" from "a deleted,
    // something else inserted" — the join below is the feature's point
    val pre = cdf.filter("_change_type = 'delete'").select($"_row_id", $"qty".as("old_qty"))
    val post = cdf.filter("_change_type = 'insert'").select($"_row_id", $"qty".as("new_qty"))
    val stitched = pre.join(post, "_row_id")
      .select("old_qty", "new_qty").as[(Int, Int)].collect().toSeq
    assert(stitched === Seq((1, 10)), s"stitched updates: $stitched")
  }

  test("rows tombstoned by deletion vectors get no backfill id") {
    val root = tmpDir("rt-dv-")
    val t = VersionedTable(root)
    t.setProperties(Map("enableDeletionVectors" -> "true"))
    t.commit(Seq(("a", 1), ("b", 2), ("c", 3)).toDF("k", "qty"))
    t.deleteMor(spark, "k = 'b'")
    t.enableRowTracking(spark)
    val ids = idMap(t)
    assert(ids.keySet === Set(1L, 2L) && !ids.values.toSet.contains("b"),
      s"live rows only: $ids")
    assert(t.dvFileCount() === 0, "the backfill rewrite must materialize DVs")
  }
}
