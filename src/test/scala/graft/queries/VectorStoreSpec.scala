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

  test("evict erases vectors: probes no longer see them, load decrements, " +
      "re-evicting is a no-op") {
    val root = tmpDir("vx-ev-") + "/vx"
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    // a duplicate of vector 7 (seed 2) rejects against the full store; a
    // novel direction admits and becomes part of what must be forgettable
    assert(VectorStore.admit(spark, root, vecs(100L -> 2L))
      .collect().head.getString(1) === "near_dup")
    assert(VectorStore.admit(spark, root, vecs(101L -> 40L))
      .collect().head.getString(1) === "admitted")
    val loadBefore = VectorStore.load(root).values.sum
    // forget every seed-2 vector (ids ≡ 1 mod 3) plus the admitted 101
    val victims = (0L until 30L).filter(_ % 3 == 1) :+ 101L
    assert(VectorStore.evict(spark, root,
      victims.toDF("vec_id")) === victims.size.toLong)
    assert(VectorStore.load(root).values.sum === loadBefore - victims.size)
    assert(VersionedTable(s"$root/assigned").read(spark)
      .filter($"vec_id".isin(victims: _*)).isEmpty,
      "no surviving assigned row may carry a forgotten vec_id")
    // the direction is genuinely forgotten: its duplicate now ADMITS
    assert(VectorStore.admit(spark, root, vecs(200L -> 2L))
      .collect().head.getString(1) === "admitted")
    assert(VectorStore.evict(spark, root, victims.toDF("vec_id")) === 0L)
  }

  test("the MOR evict flavor (physical=false) erases from serving exactly " +
      "like COW — tombstones, no rewrite") {
    val root = tmpDir("vx-mor-") + "/vx"
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    val victims = (0L until 30L).filter(_ % 3 == 1)
    assert(VectorStore.evict(spark, root, victims.toDF("vec_id"),
      physical = false) === victims.size.toLong)
    val assigned = VersionedTable(s"$root/assigned")
    assert(assigned.detail(spark).select("num_deletion_vectors")
      .collect().head.getLong(0) > 0L,
      "the MOR evict must have produced deletion vectors")
    assert(assigned.read(spark)
      .filter($"vec_id".isin(victims: _*)).isEmpty,
      "no surviving assigned row may carry an evicted vec_id")
    // serving equivalence: the direction admits again, the re-evict no-ops
    assert(VectorStore.admit(spark, root, vecs(200L -> 2L))
      .collect().head.getString(1) === "admitted")
    assert(VectorStore.evict(spark, root, victims.toDF("vec_id"),
      physical = false) === 0L)
  }

  test("rebalance: an admit-skewed store re-trains into better-balanced " +
      "partitions, keeps every vector, and recall does not regress") {
    def angleVecs(rows: (Long, Double)*) =
      rows.toSeq.toDF("vec_id", "deg")
        .selectExpr("vec_id", "'x' AS label",
          "array(CAST(cos(radians(deg)) AS FLOAT), " +
            "CAST(sin(radians(deg)) AS FLOAT)) AS embedding")
    val root = tmpDir("vx-rb-") + "/vx"
    // three seeded centroids (ids 0/25/50 with seedModulus 25) at 0°/90°/180°
    VectorStore.build(spark, root, angleVecs(
      0L -> 0.0, 25L -> 90.0, 50L -> 180.0))
    // 30 novel directions crowd the 0° centroid's partition (threshold
    // 0.9999: distinct angles admit instead of near-dup-rejecting)
    val batch = (0 until 30).map(i => (100L + i) -> (10.0 + i))
    VectorStore.admit(spark, root, angleVecs(batch: _*), threshold = 0.9999)
    val skewBefore = VectorStore.imbalance(root)
    assert(skewBefore > 2.0, s"the admit pattern must skew the store, got $skewBefore")
    val assignedT = VersionedTable(s"$root/assigned")
    val idsBefore = assignedT.read(spark).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    // recall@5 for a mid-cluster query, via a 2-probe read (s9's shape)
    def recall5(): Double = {
      val all = assignedT.read(spark)
      val q = all.filter($"vec_id" === 115L)
        .select($"v".as("qv"), $"nv".as("nqv"))
      import org.apache.spark.sql.functions.{broadcast, col}
      def top5(df: org.apache.spark.sql.DataFrame): Set[Long] =
        df.crossJoin(broadcast(q))
          .withColumn("sim", graft.functions.VectorFunctions.cosineWithNorms6(
            col("v"), col("nv"), col("qv"), col("nqv")))
          .filter($"vec_id" =!= 115L)
          .orderBy($"sim".desc, $"vec_id").limit(5)
          .select("vec_id").collect().map(_.getLong(0)).toSet
      val exact = top5(all)
      val cents = VersionedTable(s"$root/cents").read(spark)
      val probes = cents.crossJoin(broadcast(q))
        .withColumn("qsim", graft.functions.VectorFunctions.cosineWithNorms6(
          col("cv"), col("ncv"), col("qv"), col("nqv")))
        .orderBy($"qsim".desc, $"c_id").limit(2)
        .select("c_id").collect().map(_.getLong(0))
      val probed = assignedT.readPartitioned(spark,
        s"c_id IN (${probes.mkString(", ")})")._1
      (top5(probed) & exact).size / 5.0
    }
    val recallBefore = recall5()
    // below the bound: a guarded rebalance is a no-op
    assert(!VectorStore.rebalance(spark, root, ifSkewAbove = Some(100.0)))
    assert(VectorStore.rebalance(spark, root, ifSkewAbove = Some(2.0)))
    val skewAfter = VectorStore.imbalance(root)
    assert(skewAfter < skewBefore,
      s"retraining on the drifted corpus must reduce skew: $skewBefore -> $skewAfter")
    val idsAfter = assignedT.read(spark).select("vec_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(idsAfter === idsBefore, "rebalance must keep every stored vector")
    assert(recall5() >= recallBefore,
      "recall@5 must not regress after rebalance")
    // serving still works end to end: an exact dup of a stored vector rejects
    assert(VectorStore.admit(spark, root, angleVecs(300L -> 25.0))
      .collect().head.getString(1) === "near_dup")
  }

  private def angleVecs2(rows: (Long, Double)*) =
    rows.toSeq.toDF("vec_id", "deg")
      .selectExpr("vec_id", "'x' AS label",
        "array(CAST(cos(radians(deg)) AS FLOAT), " +
          "CAST(sin(radians(deg)) AS FLOAT)) AS embedding")

  /** A skewed store ready to rebalance: 3 seeded centroids, 30 admits
    * crowding the 0° partition (the rebalance test's shape). */
  private def skewedStore(): String = {
    val root = tmpDir("vx-trb-") + "/vx"
    VectorStore.build(spark, root, angleVecs2(
      0L -> 0.0, 25L -> 90.0, 50L -> 180.0))
    VectorStore.admit(spark, root,
      angleVecs2((0 until 30).map(i => (100L + i) -> (10.0 + i)): _*),
      threshold = 0.9999)
    root
  }

  test("a torn REBALANCE (crash after the retrained centroids commit) is " +
      "repaired before the next admit probes — no mixed-generation serving") {
    val root = skewedStore()
    val centsT = VersionedTable(s"$root/cents")
    val assignedT = VersionedTable(s"$root/assigned")
    val (vc0, va0) = (centsT.resolve(), assignedT.resolve())
    VectorStore.failpoint = Some("rebalanceAfterCents")
    try intercept[IllegalStateException] { VectorStore.rebalance(spark, root) }
    finally VectorStore.failpoint = None
    // the tear is DETECTED, not silently served: NEW centroids sit over the
    // OLD partition layout and the marker says so
    assert(centsT.resolve() === vc0 + 1 && assignedT.resolve() === va0)
    assert(centsT.properties.get("rebalancePending").contains("1"))
    // the next admit repairs first (re-lays the partitions under the new
    // centroids), then serves correctly: an exact dup of a stored vector
    // must reject — under the mixed layout its probe would read the wrong
    // partition and wrongly admit
    val d = VectorStore.admit(spark, root, angleVecs2(300L -> 25.0)).collect()
    assert(d.head.getString(1) === "near_dup")
    assert(!centsT.properties.contains("rebalancePending"))
    // generation agreement: every stored vector's partition IS its top-1
    // assignment under the CURRENT centroids
    val stored = assignedT.read(spark)
    val relaid = graft.queries.SimilarityQueries.assignTo(
      stored.select("vec_id", "label", "v", "nv"), centsT.read(spark))
      .select($"vec_id", $"c_id".as("want"))
    assert(stored.select("vec_id", "c_id").join(relaid, "vec_id")
      .filter($"c_id" =!= $"want").count() === 0,
      "assigned partitions must agree with the current centroid generation")
  }

  test("a torn REBALANCE (crash after the re-lay, load/modulus commit " +
      "missing) completes via explicit repairRebalance") {
    val root = skewedStore()
    val centsT = VersionedTable(s"$root/cents")
    val loadBefore = VectorStore.load(root)
    VectorStore.failpoint = Some("rebalanceAfterAssigned")
    try intercept[IllegalStateException] { VectorStore.rebalance(spark, root) }
    finally VectorStore.failpoint = None
    assert(centsT.properties.get("rebalancePending").contains("1"))
    // the re-lay landed but the load cache still shows the pre-rebalance
    // skew — repair must finish the tail, not replay the re-lay
    val assignedT = VersionedTable(s"$root/assigned")
    val vAfterTear = assignedT.resolve()
    assert(VectorStore.repairRebalance(spark, root) === true)
    assert(VectorStore.repairRebalance(spark, root) === false, "repair is idempotent")
    assert(assignedT.resolve() === vAfterTear, "repair must not re-lay again")
    assert(!centsT.properties.contains("rebalancePending"))
    val loadAfter = VectorStore.load(root)
    assert(loadAfter !== loadBefore, "the load cache must have reconciled")
    // the reconciled cache equals the exact per-partition counts
    val exact = assignedT.read(spark).groupBy("c_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(loadAfter === exact)
    assert(VectorStore.imbalance(root) < 5.0)
  }

  test("VectorIndexSync keeps the store mirroring its table through " +
      "append/delete/update — declarative, idempotent, serving-correct") {
    val base = tmpDir("vx-sync-")
    val t = VersionedTable(s"$base/emb")
    t.commit(vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    VectorStore.build(spark, s"$base/vx", t.read(spark))
    VectorStore.markSynced(s"$base/vx", t.resolve())
    // the table moves on: 10 inserts of a NEW direction, delete every
    // seed-2 vector, rewrite one vector to a negated direction
    t.append(vecs((100L until 110L).map(i => i -> 77L): _*))
    t.delete(spark, "label = 'l2'")
    t.update(spark, "vec_id = 0",
      Map("embedding" -> "transform(embedding, x -> -x)"))
    graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "VectorIndexSync", "name": "sync",
         |   "tableURI": "$base/emb", "storeURI": "$base/vx",
         |   "outputView": "vx_sync_audit"}]}""".stripMargin)
      .run(spark, Map.empty)
    val (a, e) = spark.table("vx_sync_audit").as[(Long, Long)].collect().head
    assert(a > 0 && e > 0, s"sync must admit and evict ($a/$e)")
    // mirror invariant + idempotence
    assert(VersionedTable(s"$base/vx/assigned").read(spark).count() ===
      t.read(spark).count())
    assert(VectorStore.syncFromTable(spark, s"$base/vx", t) === ((0L, 0L)))
    // serving: a dup of the DELETED direction now admits (nothing left to
    // match), a dup of the surviving/inserted directions rejects, and a
    // dup of vector 0's OLD direction admits while its NEW one rejects
    val d = VectorStore.admit(spark, s"$base/vx", vecs(
        200L -> 2L,  // deleted direction
        201L -> 1L,  // surviving direction
        202L -> 77L) // inserted direction
        .union(vecs(203L -> 1L).selectExpr("vec_id", "label",
          "transform(embedding, x -> CAST(-x AS FLOAT)) AS embedding")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d(200L) === "admitted", "the deleted direction must stop matching")
    assert(d(201L) === "near_dup" && d(202L) === "near_dup")
    // 203 = negated seed-1 direction = vector 0's rewritten embedding
    assert(d(203L) === "near_dup", "the UPDATED embedding must be servable")
  }

  test("a replayed admission batch returns the FIRST run's decisions byte " +
      "for byte and appends nothing (strong idempotency)") {
    val root = tmpDir("vx-replay-") + "/vx"
    VectorStore.build(spark, root,
      vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*))
    val batch = vecs(400L -> 2L, 401L -> 91L)
    def run() = VectorStore.admit(spark, root, batch).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    val first = run()
    assert(first.map(x => (x._1, x._2)) ===
      Seq((400L, "near_dup"), (401L, "admitted")))
    val v = VersionedTable(s"$root/assigned").resolve()
    val load = VectorStore.load(root)
    // the crash-replay shape (q119's decisions append failed after the
    // store append landed): verdicts must not flip to near_dup-of-itself,
    // and the store must not grow a duplicate row
    assert(run() === first,
      "a replayed batch must verdict exactly as the first run")
    assert(VersionedTable(s"$root/assigned").resolve() === v,
      "a replayed batch must not commit")
    assert(VectorStore.load(root) === load)
    assert(VersionedTable(s"$root/assigned").read(spark)
      .filter($"vec_id" === 401L).count() === 1)
  }

  test("a torn BUILD (crash before the assigned layout) refuses to admit " +
      "and re-runs cleanly; only a completed store refuses a rebuild") {
    val root = tmpDir("vx-tb-") + "/vx"
    val corpus = vecs((0L until 30L).map(i => i -> (i % 3 + 1)): _*)
    VectorStore.failpoint = Some("buildAfterCents")
    try intercept[IllegalStateException](VectorStore.build(spark, root, corpus))
    finally VectorStore.failpoint = None
    intercept[IllegalArgumentException](
      VectorStore.admit(spark, root, vecs(500L -> 9L)))
    VectorStore.build(spark, root, corpus) // re-run overwrites the torn half
    val d = VectorStore.admit(spark, root, vecs(500L -> 2L)).collect().head
    assert(d.getString(1) === "near_dup")
    intercept[IllegalArgumentException](VectorStore.build(spark, root, corpus))
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
