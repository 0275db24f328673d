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

  test("multi-probe catches a near-dup straddling a centroid boundary that " +
      "single-probe misses") {
    // 2-D unit vectors by angle: two clear clusters near 0° and 90°. The
    // corpus member at 50° assigns to the 90°-ish centroid; a batch vector
    // at 35° assigns top-1 to the 0°-ish centroid (30° away vs ~40°), so a
    // single-probe read never compares the straddling pair — cos(15°) =
    // 0.966 ≥ 0.93 while every same-partition stored vector is < 0.93.
    def angleVecs(rows: (Long, Double)*) =
      rows.toSeq.toDF("vec_id", "deg")
        .selectExpr("vec_id", "'x' AS label",
          "array(CAST(cos(radians(deg)) AS FLOAT), " +
            "CAST(sin(radians(deg)) AS FLOAT)) AS embedding")
    val root = tmpDir("vx4-") + "/vx"
    // ids 0 and 25 seed the two centroids (seedModulus = 25 at this size)
    VectorStore.build(spark, root, angleVecs(
      0L -> 0.0, 1L -> 5.0, 2L -> 10.0, 25L -> 90.0, 26L -> 85.0, 27L -> 50.0))
    val assigned = VersionedTable(s"$root/assigned").read(spark)
      .select("vec_id", "c_id").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(assigned(27L) === assigned(25L) && assigned(27L) != assigned(0L),
      s"the 50° vector must store in the 90°-side partition, got $assigned")
    // probes = 2 (default): the runner-up partition holds the near-dup
    val d2 = VectorStore.admit(spark, root, angleVecs(101L -> 35.0),
      threshold = 0.93).collect().head
    assert(d2.getString(1) === "near_dup" && d2.getLong(2) === 27L,
      s"multi-probe must find the boundary-straddling dup, got $d2")
    // probes = 1: same direction, only the top-1 partition is compared —
    // the dup is invisible and the vector admits
    val d1 = VectorStore.admit(spark, root, angleVecs(103L -> 35.0),
      threshold = 0.93, probes = 1).collect().head
    assert(d1.getString(1) === "admitted",
      s"single-probe cannot see the cross-partition dup, got $d1")
  }

  test("admission still correct after partition-scoped OPTIMIZE of the " +
      "assigned table (append-only growth has a maintenance story)") {
    val root = tmpDir("vx5-") + "/vx"
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    // several admission batches land small appended files in the same
    // centroid partitions
    VectorStore.admit(spark, root, vecs(100L -> 41L))
    VectorStore.admit(spark, root, vecs(101L -> 42L))
    VectorStore.admit(spark, root, vecs(102L -> 43L))
    val assignedT = VersionedTable(s"$root/assigned")
    assert(assignedT.read(spark).count() === 33)
    // binpack ONE hot partition (the scale-honest verb: the other
    // partitions' files carry verbatim); stats stay opted out
    val hot = assignedT.read(spark).filter($"vec_id" === 100L)
      .select("c_id").head().getLong(0)
    assignedT.compactWhere(spark, s"c_id = $hot")
    // verdicts unchanged: dup of a pre-compaction admit, dup of a corpus
    // vector, and a novel direction — and the store still appends
    val d = VectorStore.admit(spark, root,
        vecs(200L -> 41L, 201L -> 2L, 202L -> 99L))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(d(200L) === (("near_dup", Some(100L))))
    assert(d(201L)._1 === "near_dup")
    assert(d(202L) === (("admitted", None)))
    assert(assignedT.read(spark).count() === 34)
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
