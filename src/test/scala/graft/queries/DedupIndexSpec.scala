package graft.queries

import graft.SparkSpec
import graft.dedup.SignatureStore
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** The lake-resident MinHash/checksum signature store
  * ([[graft.dedup.SignatureStore]]): the corpus is fingerprinted ONCE at
  * build, each batch is admitted by joining the STORE (never re-reading
  * the corpus), admitted docs append so later batches dedup against them
  * too, and a second session serves the store from disk with zero
  * recomputation of corpus signatures. */
class DedupIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docs(rows: (Long, String)*) = rows.toSeq.toDF("doc_id", "text")

  private val corpus = docs(
    2L -> "the quick brown fox jumps over the lazy dog near the river bank today",
    4L -> "completely different content about distributed query engines and storage",
    6L -> "a third unrelated corpus document mentioning neither foxes nor engines at all")

  test("admit: exact, near, and fresh documents verdict correctly; store appends") {
    val root = tmpDir("dix-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    assert(VersionedTable.exists(s"$root/sigs") && VersionedTable.exists(s"$root/bands"))
    val sigsT = VersionedTable(s"$root/sigs")
    assert(sigsT.read(spark).count() === 3)
    val batch = docs(
      // exact duplicate of doc 2
      11L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      // near duplicate of doc 2 (one word changed)
      13L -> "the quick brown fox jumps over the lazy dog near the river bank tonight",
      // fresh
      15L -> "entirely novel text that matches nothing stored in the signature index")
    val d = SignatureStore.admit(spark, root, batch)
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(d(11L) === ("exact_dup", Some(2L)))
    assert(d(13L)._1 === "near_dup" && d(13L)._2.contains(2L))
    assert(d(15L) === ("admitted", None))
    // only the admitted doc appended, via APPEND (no corpus rewrite)
    assert(sigsT.read(spark).count() === 4)
    assert(sigsT.history(spark).filter("version = " + sigsT.resolve())
      .head.getAs[String]("operation") === "APPEND")
    // the NEXT batch dedups against the batch-1 admission too
    val d2 = SignatureStore.admit(spark, root, docs(
      21L -> "entirely novel text that matches nothing stored in the signature index"))
      .collect()
    assert(d2.length === 1 && d2.head.getString(1) === "exact_dup" &&
      d2.head.getLong(2) === 15L,
      "a duplicate of an ADMITTED batch-1 doc must reject against the appended store")
  }

  test("a second session admits from the stored index without recomputing " +
      "corpus signatures (corpus text never supplied)") {
    val root = tmpDir("dix2-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    val sigsT = VersionedTable(s"$root/sigs")
    val builtVersion = sigsT.resolve()
    // a "second driver": fresh session; admit() takes ONLY the store root
    // and the batch — there is no argument through which the corpus could
    // be re-read, and the store tables must not be rebuilt
    val second = org.apache.spark.sql.graft.PlanShim.cloneSession(spark)
    val d = SignatureStore.admit(second, root, docs(
        31L -> "the quick brown fox jumps over the lazy dog near the river bank today",
        33L -> "some brand new content admitted by the second driver process"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(31L -> "exact_dup", 33L -> "admitted"))
    // exactly one append on top of the build — no rebuild commits
    assert(sigsT.resolve() === builtVersion + 1)
    assert(sigsT.history(second).filter(s"version <= $builtVersion")
      .select("operation").collect().map(_.getString(0)).toSet === Set("OVERWRITE"),
      "the corpus fingerprint pass happened once, at build")
  }

  test("streaming admission: arriving micro-batches admit against the " +
      "store, decisions land exactly-once in a versioned table") {
    val base = tmpDir("dix-s-")
    val root = s"$base/ix"
    SignatureStore.build(spark, root, corpus)
    val decisionsT = VersionedTable(s"$base/decisions")
    decisionsT.commit(Seq.empty[(Long, String, Option[Long])]
      .toDF("doc_id", "verdict", "dup_of"))
    val landing = s"$base/land"
    docs(51L -> "the quick brown fox jumps over the lazy dog near the river bank today",
         53L -> "genuinely new streaming document with unseen content")
      .coalesce(1).write.parquet(landing)
    val schema = docs(0L -> "x").schema
    val q1 = graft.streaming.StreamingEtl.dedupAdmitStream(spark, landing,
      schema, root, s"$base/decisions", s"$base/ckpt")
    q1.processAllAvailable(); q1.stop()
    val d1 = decisionsT.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d1 === Map(51L -> "exact_dup", 53L -> "admitted"))
    // a later landing: only it processes (checkpoint), and it dedups
    // against the STREAM-admitted doc 53
    docs(55L -> "genuinely new streaming document with unseen content")
      .coalesce(1).write.mode("append").parquet(landing)
    val q2 = graft.streaming.StreamingEtl.dedupAdmitStream(spark, landing,
      schema, root, s"$base/decisions", s"$base/ckpt")
    q2.processAllAvailable(); q2.stop()
    val d2 = decisionsT.read(spark).collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d2 === Map(51L -> "exact_dup", 53L -> "admitted", 55L -> "exact_dup"),
      s"the second batch must reject against the stream-admitted doc, got $d2")
    assert(VersionedTable(s"$root/sigs").read(spark).count() === 4,
      "store = 3 corpus + 1 stream-admitted")
  }

  test("admission still correct after the store is OPTIMIZE-compacted " +
      "(append-only growth has a maintenance story)") {
    val root = tmpDir("dix4-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    // several admission batches -> several small append commits
    SignatureStore.admit(spark, root, docs(61L -> "first extra batch text one"))
    SignatureStore.admit(spark, root, docs(63L -> "second extra batch text two"))
    val sigsT = VersionedTable(s"$root/sigs")
    val bandsT = VersionedTable(s"$root/bands")
    sigsT.compact(spark)
    bandsT.compact(spark)
    // the compaction commit rebuilds Bloom sidecars for the rewritten
    // files (writeDataFiles reads bloomIndexColumns from the persisted
    // table properties), so admission probes keep pruning after OPTIMIZE
    val d = SignatureStore.admit(spark, root, docs(
        71L -> "first extra batch text one", // dup of a pre-compact admit
        73L -> "the quick brown fox jumps over the lazy dog near the river bank today",
        75L -> "wholly new post-compaction content"))
      .collect().map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).toMap
    assert(d(71L) === (("exact_dup", Some(61L))))
    assert(d(73L) === (("exact_dup", Some(2L))))
    assert(d(75L) === (("admitted", None)))
    assert(sigsT.read(spark).count() === 6) // 3 corpus + 61, 63, 75
  }

  test("a torn admit (crash between the bands and sigs appends) self-heals " +
      "on the batch's replay — no permanent band gap, no double sigs") {
    val root = tmpDir("dix-torn-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    val batch = docs(
      21L -> "entirely novel text that matches nothing stored in the signature index",
      23L -> "another fresh document with its own unique words and no duplicates")
    SignatureStore.failpoint = Some("afterBandsAppend")
    try intercept[IllegalStateException](SignatureStore.admit(spark, root, batch))
    finally SignatureStore.failpoint = None
    // torn state: bands landed, sigs did not — the doc must NOT reject its
    // own replay (that would make the missing sig row permanent)
    assert(VersionedTable(s"$root/sigs").read(spark)
      .filter("doc_id >= 20").isEmpty)
    val d = SignatureStore.admit(spark, root, batch)
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(21L -> "admitted", 23L -> "admitted"),
      s"a replayed torn batch must re-admit, got $d")
    assert(VersionedTable(s"$root/sigs").read(spark)
      .filter("doc_id >= 20").count() === 2)
    // the duplicated band rows are harmless: a near-dup of 21 still
    // verdicts against exactly one stored signature
    val d2 = SignatureStore.admit(spark, root, docs(
      31L -> "entirely novel text that matches nothing stored in the signature index"))
      .collect().head
    assert(d2.getString(1) === "exact_dup" && d2.getLong(2) === 21L)
  }

  test("a torn evict (crash between the bands and sigs deletes) completes " +
      "on the retry — no orphaned band rows survive") {
    val root = tmpDir("dix-tornev-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    val victims = Seq(2L).toDF("doc_id")
    SignatureStore.failpoint = Some("afterBandsDelete")
    try intercept[IllegalStateException](SignatureStore.evict(spark, root, victims))
    finally SignatureStore.failpoint = None
    // torn state: bands gone, sig row still present — present > 0 keeps
    // the retry from early-returning, so the erasure completes
    assert(VersionedTable(s"$root/bands").read(spark).filter("doc_id = 2").isEmpty)
    assert(VersionedTable(s"$root/sigs").read(spark).filter("doc_id = 2").count() === 1)
    assert(SignatureStore.evict(spark, root, victims) === 1L)
    assert(VersionedTable(s"$root/sigs").read(spark).filter("doc_id = 2").isEmpty)
    assert(VersionedTable(s"$root/bands").read(spark).filter("doc_id = 2").isEmpty)
  }

  test("a replayed admission batch returns the FIRST run's decisions byte " +
      "for byte and re-stores nothing (strong idempotency)") {
    val root = tmpDir("dix-replay-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    val batch = docs(
      41L -> "the quick brown fox jumps over the lazy dog near the river bank today",
      43L -> "entirely novel text that matches nothing stored in the signature index")
    def run() = SignatureStore.admit(spark, root, batch).collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) None else Some(r.getLong(2)))).sortBy(_._1).toSeq
    val first = run()
    assert(first === Seq((41L, "exact_dup", Some(2L)), (43L, "admitted", None)))
    val sigsV = VersionedTable(s"$root/sigs").resolve()
    val bandsV = VersionedTable(s"$root/bands").resolve()
    // the crash-replay shape: the same batch runs again (e.g. a decisions
    // append failed after the store append landed) — verdicts must NOT
    // flip to dup-of-self, and nothing may double-store
    assert(run() === first,
      "a replayed batch must verdict exactly as the first run")
    assert(VersionedTable(s"$root/sigs").resolve() === sigsV &&
      VersionedTable(s"$root/bands").resolve() === bandsV,
      "a replayed batch must not commit")
    assert(VersionedTable(s"$root/sigs").read(spark)
      .filter("doc_id = 43").count() === 1)
  }

  test("a torn BUILD (crash before the bands) refuses to admit and " +
      "re-runs cleanly; only a completed store refuses a rebuild") {
    val root = tmpDir("dix-tb-") + "/ix"
    SignatureStore.failpoint = Some("buildAfterSigs")
    try intercept[IllegalStateException](SignatureStore.build(spark, root, corpus))
    finally SignatureStore.failpoint = None
    // no completion stamp: admission refuses a half-built store
    intercept[IllegalArgumentException](
      SignatureStore.admit(spark, root, docs(99L -> "anything at all here")))
    SignatureStore.build(spark, root, corpus) // re-run overwrites the torn half
    val d = SignatureStore.admit(spark, root, docs(
      51L -> "the quick brown fox jumps over the lazy dog near the river bank today"))
      .collect().head
    assert(d.getString(1) === "exact_dup" && d.getLong(2) === 2L)
    intercept[IllegalArgumentException](SignatureStore.build(spark, root, corpus))
  }

  test("a store built by an incompatible format refuses to serve") {
    val root = tmpDir("dix3-") + "/ix"
    SignatureStore.build(spark, root, corpus)
    VersionedTable(s"$root/sigs").setProperties(Map("indexFormat" -> "99"))
    intercept[IllegalArgumentException](
      SignatureStore.admit(spark, root, docs(41L -> "x y z")))
    intercept[IllegalArgumentException](
      SignatureStore.build(spark, root, corpus))
  }
}
