package graft.queries

import graft.SparkSpec
import graft.dedup.VectorStore
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** The lake-resident IVF vector store ([[graft.dedup.VectorStore]]):
  * centroids train once at build, batches admit by probing only their own
  * centroid partitions, admitted vectors append so later batches dedup
  * against them, and a second session serves the store from disk without
  * re-reading the corpus. */
class VectorStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Deterministic synthetic embeddings: vec i = unit-ish direction from
    * sin(seed·j) — vectors with the same seed are exact duplicates
    * (cosine 1), different seeds are far apart in 64-dim. */
  private def vecs(rows: (Long, Long)*) = // (vec_id, seed)
    rows.toSeq.toDF("vec_id", "seed")
      .selectExpr("vec_id", "concat('l', seed) AS label",
        "transform(sequence(1, 64), j -> CAST(sin(seed * j) AS FLOAT)) AS embedding")

  test("admit: same-direction vectors reject, novel ones append; store probes " +
      "only matching partitions") {
    val root = tmpDir("vx-") + "/vx"
    // corpus: 30 vectors over 3 directions (ids 0,3,6,... so seeds repeat)
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    assert(VersionedTable.exists(s"$root/cents") &&
      VersionedTable.exists(s"$root/assigned"))
    val assignedT = VersionedTable(s"$root/assigned")
    assert(assignedT.read(spark).count() === 30)
    val d = VectorStore.admit(spark, root, vecs(100L -> 1L, 101L -> 77L))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(d(100L)._1 === "near_dup" && d(100L)._2.isDefined,
      s"a same-direction vector must reject, got ${d(100L)}")
    assert(d(101L) === (("admitted", None)))
    assert(assignedT.read(spark).count() === 31)
    // the NEXT batch dedups against the admitted vector too
    val d2 = VectorStore.admit(spark, root, vecs(200L -> 77L)).collect()
    assert(d2.head.getString(1) === "near_dup" && d2.head.getLong(2) === 101L,
      "a duplicate of an ADMITTED vector must reject against the appended store")
  }

  test("a second session admits from the stored index; incompatible format refuses") {
    val root = tmpDir("vx2-") + "/vx"
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    val v0 = VersionedTable(s"$root/assigned").resolve()
    val second = org.apache.spark.sql.graft.PlanShim.cloneSession(spark)
    val d = VectorStore.admit(second, root, vecs(300L -> 2L, 301L -> 99L))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(300L -> "near_dup", 301L -> "admitted"))
    assert(VersionedTable(s"$root/assigned").resolve() === v0 + 1,
      "exactly one append on top of the build — no rebuild commits")
    VersionedTable(s"$root/cents").setProperties(Map("indexFormat" -> "99"))
    intercept[IllegalArgumentException](
      VectorStore.admit(spark, root, vecs(400L -> 1L)))
  }
}
