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

  test("declarative job + streaming admission round-trip") {
    val base = tmpDir("vx3-")
    vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*)
      .createOrReplaceTempView("vx_corpus")
    vecs(100L -> 2L, 101L -> 55L).createOrReplaceTempView("vx_batch")
    graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "VectorIndexBuild", "name": "b", "inputView": "vx_corpus",
         |   "storeURI": "$base/vx"},
         |  {"type": "VectorIndexAdmit", "name": "a", "inputView": "vx_batch",
         |   "storeURI": "$base/vx", "outputView": "vx_decisions"}
         |]}""".stripMargin).run(spark, Map.empty)
    val d = spark.table("vx_decisions").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(100L -> "near_dup", 101L -> "admitted"))
    // streaming leg: a landed batch admits against the SAME store (which
    // now contains the job-admitted vector 101)
    val landing = s"$base/land"
    vecs(200L -> 55L, 201L -> 88L).coalesce(1).write.parquet(landing)
    val decisionsT = VersionedTable(s"$base/decisions")
    decisionsT.commit(Seq.empty[(Long, String, Option[Long])]
      .toDF("vec_id", "verdict", "dup_of"))
    val q = graft.streaming.StreamingEtl.vectorAdmitStream(spark, landing,
      vecs(0L -> 1L).schema, s"$base/vx", s"$base/decisions", s"$base/ckpt")
    q.processAllAvailable(); q.stop()
    val sd = decisionsT.read(spark).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(sd(200L) === (("near_dup", Some(101L))),
      "the streamed batch must reject against the job-admitted vector")
    assert(sd(201L) === (("admitted", None)))
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
