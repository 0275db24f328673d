package graft.queries

import graft.SparkSpec
import graft.dedup.{SignatureStore, TextIndexStore, VectorStore}
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** Right-to-be-forgotten through the index stores (the q127 gate's
  * compliance half): after evict + vacuum, the forgotten ids are PHYSICALLY
  * absent from every surviving data file of every store — not just
  * filtered from the current version. The reference's own challenge flow
  * deletes and proves deletion for the base table (scd2-job.ipynb:443-483);
  * this extends the proof to the derived index state, where a forgotten
  * document's bag-of-words (TextIndexStore postings) would otherwise
  * remain reconstructable content. */
class ForgetSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDf(n: Int) =
    spark.range(0, n.toLong).selectExpr("id AS doc_id",
      "concat('spark merge sort dup w', id % 17, ' window etl x', id % 5) AS text")

  private def vecsDf(n: Int) =
    spark.range(0, n.toLong).selectExpr("id AS vec_id", "concat('l', id % 7) AS label",
      "transform(sequence(1, 64), j -> CAST(sin((id % 7 + 1) * j) AS FLOAT)) AS embedding")

  /** Every row of every SURVIVING parquet data file under the store,
    * read RAW (recursive file listing, no manifest, no partition
    * discovery) — what a disk forensics pass would see. */
  private def rawIds(storeRoot: String, idCol: String): Seq[Long] =
    spark.read.option("recursiveFileLookup", "true")
      .parquet(s"$storeRoot/data")
      .select(idCol).collect().map(_.getLong(0)).toSeq

  test("evict + vacuum physically erases forgotten ids from every " +
      "surviving file of all three index stores") {
    val base = tmpDir("forget-")
    val docs = docsDf(80)
    val emb = vecsDf(60)
    TextIndexStore.build(spark, s"$base/text", docs, "fp0")
    SignatureStore.build(spark, s"$base/sig", docs)
    VectorStore.build(spark, s"$base/vec", emb)
    val docVictims = docs.filter("doc_id % 10 = 0").select("doc_id")
    val vecVictims = emb.filter("vec_id % 10 = 0").select("vec_id")

    // pre-erasure: the stores genuinely hold the victims (the assertions
    // below have teeth)
    assert(rawIds(s"$base/text/postings", "doc_id").exists(_ % 10 == 0))
    assert(rawIds(s"$base/sig/sigs", "doc_id").exists(_ % 10 == 0))
    assert(rawIds(s"$base/vec/assigned", "vec_id").exists(_ % 10 == 0))

    assert(TextIndexStore.evict(spark, s"$base/text", docVictims, "fp1") === 8L)
    assert(SignatureStore.evict(spark, s"$base/sig", docVictims) === 8L)
    assert(VectorStore.evict(spark, s"$base/vec", vecVictims) === 6L)

    // logical erasure: the CURRENT version of every store serves no victim
    for ((t, c) <- Seq(s"$base/text/postings" -> "doc_id",
        s"$base/sig/sigs" -> "doc_id", s"$base/sig/bands" -> "doc_id",
        s"$base/vec/assigned" -> "vec_id"))
      assert(VersionedTable(t).read(spark).filter(s"$c % 10 = 0").isEmpty,
        s"current version of $t still serves forgotten ids")

    // ...but time travel still can (erasure is not complete until vacuum) —
    // the COW delete kept the pre-evict snapshot readable by design
    assert(rawIds(s"$base/sig/sigs", "doc_id").exists(_ % 10 == 0),
      "pre-vacuum, old versions' files must still exist (time travel intact)")

    // compliance-grade: vacuum every store table past the evict commits,
    // then prove absence on the RAW surviving files
    for (t <- Seq(s"$base/text/postings", s"$base/text/lexicon",
        s"$base/sig/sigs", s"$base/sig/bands", s"$base/vec/assigned"))
      VersionedTable(t).vacuum(retainVersions = 1, orphanRetentionMs = 0L)
    for ((s, c) <- Seq(s"$base/text/postings" -> "doc_id",
        s"$base/sig/sigs" -> "doc_id", s"$base/sig/bands" -> "doc_id",
        s"$base/vec/assigned" -> "vec_id")) {
      val ids = rawIds(s, c)
      assert(ids.nonEmpty, s"$s must still hold the surviving corpus")
      assert(!ids.exists(_ % 10 == 0),
        s"$s: a forgotten $c survives in a physical file post-vacuum")
    }

    // the erased stores still SERVE correctly: a text probe of the evicted
    // index equals a never-contained rebuild (exactness spot check)
    val minus = tmpDir("forget-minus-") + "/text"
    TextIndexStore.build(spark, minus, docs.filter("doc_id % 10 != 0"), "fpM")
    assert(TextIndexStore.stats(s"$base/text") === TextIndexStore.stats(minus))
  }

  test("erasure and maintenance verbs are reachable from the declarative " +
      "job surface (build → admit → evict → guarded rebalance)") {
    val base = tmpDir("forget-job-")
    docsDf(60).createOrReplaceTempView("fj_docs")
    docsDf(60).filter("doc_id < 40").createOrReplaceTempView("fj_docs_base")
    docsDf(60).filter("doc_id >= 40").createOrReplaceTempView("fj_docs_batch")
    vecsDf(40).createOrReplaceTempView("fj_vecs")
    docsDf(60).filter("doc_id % 10 = 0").select("doc_id")
      .createOrReplaceTempView("fj_victims")
    vecsDf(40).filter("vec_id % 10 = 0").select("vec_id")
      .createOrReplaceTempView("fj_vvictims")
    graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TextIndexBuild", "name": "tb", "inputView": "fj_docs_base",
         |   "storeURI": "$base/text", "fingerprint": "fp0"},
         |  {"type": "TextIndexAdmit", "name": "ta", "inputView": "fj_docs_batch",
         |   "storeURI": "$base/text", "fingerprint": "fp1",
         |   "outputView": "text_admissions"},
         |  {"type": "TextIndexEvict", "name": "te", "inputView": "fj_victims",
         |   "storeURI": "$base/text", "fingerprint": "fp2",
         |   "outputView": "text_evictions"},
         |  {"type": "DedupIndexBuild", "name": "sb", "inputView": "fj_docs",
         |   "storeURI": "$base/sig"},
         |  {"type": "DedupIndexEvict", "name": "se", "inputView": "fj_victims",
         |   "storeURI": "$base/sig", "outputView": "sig_evictions"},
         |  {"type": "VectorIndexBuild", "name": "vb", "inputView": "fj_vecs",
         |   "storeURI": "$base/vec"},
         |  {"type": "VectorIndexEvict", "name": "ve", "inputView": "fj_vvictims",
         |   "storeURI": "$base/vec", "outputView": "vec_evictions"},
         |  {"type": "VectorIndexRebalance", "name": "vr",
         |   "storeURI": "$base/vec", "ifSkewAbove": "1000.0"}
         |]}""".stripMargin).run(spark, Map.empty)
    // audit views: 20 docs admitted; 6 doc victims (0,10..50), 4 vec (0..30)
    assert(spark.table("text_admissions").head.getLong(0) === 20L)
    assert(spark.table("text_evictions").head.getLong(0) === 6L)
    assert(spark.table("sig_evictions").head.getLong(0) === 6L)
    assert(spark.table("vec_evictions").head.getLong(0) === 4L)
    // nothing forgotten survives in any store's current version
    for ((t, c) <- Seq(s"$base/text/postings" -> "doc_id",
        s"$base/sig/sigs" -> "doc_id", s"$base/vec/assigned" -> "vec_id"))
      assert(VersionedTable(t).read(spark).filter(s"$c % 10 = 0").isEmpty)
    // the guarded rebalance sat below its bound: a no-op, no burnt version
    // (evict committed the last assigned version; rebalance added none)
    assert(VersionedTable(s"$base/vec/cents").resolve() === 0L,
      "a below-bound rebalance must not retrain the centroids")
    // erasure stats exact: the evicted text store equals a minus-build
    val minus = tmpDir("forget-job-minus-") + "/text"
    TextIndexStore.build(spark, minus, docsDf(60).filter("doc_id % 10 != 0"), "fpM")
    assert(TextIndexStore.stats(s"$base/text") === TextIndexStore.stats(minus))
  }

  test("TextIndexSync stage keeps a derived index following its table " +
      "through append/delete/update — idempotent from the declarative surface") {
    val base = tmpDir("sync-job-")
    val t = VersionedTable(s"$base/corpus")
    t.commit(docsDf(100).filter("doc_id % 5 <> 0"), numPartitions = Some(2))
    TextIndexStore.build(spark, s"$base/ix", t.read(spark), "fp0")
    TextIndexStore.markSynced(s"$base/ix", t.resolve())
    t.append(docsDf(100).filter("doc_id % 5 = 0"))
    t.delete(spark, "doc_id % 10 = 3")
    t.update(spark, "doc_id % 10 = 7",
      Map("text" -> "concat(text, ' synced synced')"))
    val job = graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TextIndexSync", "name": "sync",
         |   "tableURI": "$base/corpus", "storeURI": "$base/ix",
         |   "fingerprint": "fp1", "outputView": "sync_audit"}]}""".stripMargin)
    job.run(spark, Map.empty)
    val (a, e) = spark.table("sync_audit").as[(Long, Long)].collect().head
    assert(a > 0 && e > 0, s"sync must admit and evict ($a/$e)")
    assert(TextIndexStore.stats(s"$base/ix")._1 === t.read(spark).count())
    // the synced store is EXACTLY a build on the current table contents
    val fresh = tmpDir("sync-job-fresh-") + "/ix"
    TextIndexStore.build(spark, fresh, t.read(spark), "fpF")
    assert(TextIndexStore.stats(s"$base/ix") === TextIndexStore.stats(fresh))
    // re-running the same job is a no-op: cursor already at head
    job.run(spark, Map.empty)
    assert(spark.table("sync_audit").as[(Long, Long)].collect().head === ((0L, 0L)))
  }
}
