package graft.etl

import graft.SparkSpec
import graft.dedup.{SignatureStore, TextIndexStore, VectorStore}
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** The batched RTBF stage ([[ForgetBatch]]): N accumulated forget requests
  * drain in ONE evict call per store, and the result is BIT-IDENTICAL to N
  * serial evicts — while paying a single postings pin scan / merge / lexicon
  * decrement (observable as the postings table advancing by one evict's
  * commit count instead of N of them). */
class ForgetBatchSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def docsDf(n: Int) =
    spark.range(0, n.toLong).selectExpr("id AS doc_id",
      "concat('spark merge sort dup w', id % 17, ' window etl x', id % 5) AS text")

  private def vecsDf(n: Int) =
    spark.range(0, n.toLong).selectExpr("id AS vec_id", "concat('l', id % 7) AS label",
      "transform(sequence(1, 64), j -> CAST(sin((id % 7 + 1) * j) AS FLOAT)) AS embedding")

  /** Full observable state of a store trio, canonically ordered. */
  private def stateOf(base: String): (Seq[String], Seq[String], Seq[String],
      Seq[String], Option[String], Option[String]) = {
    def rows(t: String, order: String): Seq[String] =
      VersionedTable(s"$base/$t").read(spark)
        .orderBy(order.split(",").map(org.apache.spark.sql.functions.col).toSeq: _*)
        .collect().map(_.toString).toSeq
    val postP = VersionedTable(s"$base/text/postings").properties
    (rows("text/postings", "doc_id,word"), rows("text/lexicon", "word"),
      rows("sig/sigs", "doc_id"), rows("vec/assigned", "vec_id"),
      postP.get("nd"), postP.get("totalLen"))
  }

  test("one batched drain == N serial evicts, with one postings rewrite") {
    val serial = tmpDir("fb-serial-")
    val batched = tmpDir("fb-batched-")
    val docs = docsDf(90)
    val emb = vecsDf(90)
    for (base <- Seq(serial, batched)) {
      TextIndexStore.build(spark, s"$base/text", docs, "fp0")
      SignatureStore.build(spark, s"$base/sig", docs)
      VectorStore.build(spark, s"$base/vec", emb)
    }
    // three request waves, disjoint ids
    val waves = Seq("id % 9 = 0", "id % 9 = 3", "id % 9 = 6")
      .map(w => spark.range(0, 90).filter(w).selectExpr("id"))

    // SERIAL: each wave erased the moment it arrives — 3 evicts per store
    val serialPostT = VersionedTable(s"$serial/text/postings")
    val serialV0 = serialPostT.latestVersion().get
    waves.foreach { w =>
      TextIndexStore.evict(spark, s"$serial/text",
        w.withColumnRenamed("id", "doc_id"), "fpS")
      SignatureStore.evict(spark, s"$serial/sig",
        w.withColumnRenamed("id", "doc_id"))
      VectorStore.evict(spark, s"$serial/vec",
        w.withColumnRenamed("id", "vec_id"))
      ()
    }
    val serialDelta = serialPostT.latestVersion().get - serialV0

    // BATCHED: the three waves ACCUMULATE in a request table, then one
    // stage run drains them all
    val reqRoot = tmpDir("fb-req-") + "/req"
    val reqT = VersionedTable(reqRoot)
    reqT.commit(waves.head.selectExpr("id AS forget_id"))
    waves.tail.foreach(w => reqT.append(w.selectExpr("id AS forget_id")))
    val batchedPostT = VersionedTable(s"$batched/text/postings")
    val batchedV0 = batchedPostT.latestVersion().get
    val stage = ForgetBatch("fb", reqRoot, "forget_id",
      textStoreURI = Some(s"$batched/text"),
      vectorStoreURI = Some(s"$batched/vec"),
      dedupStoreURI = Some(s"$batched/sig"),
      fingerprint = "fpB", outputView = Some("fb_audit"))
    stage.execute(spark, Map.empty)
    val batchedDelta = batchedPostT.latestVersion().get - batchedV0

    val audit = spark.table("fb_audit")
      .as[(Long, Long, Long)].collect().head
    assert(audit === ((30L, 30L, 30L)),
      s"30 ids per store must erase in one drain, got $audit")

    // bit-identical end states (fingerprint properties differ by design —
    // they name the pass — so state compares rows + nd/totalLen)
    val (p1, l1, s1, a1, nd1, tl1) = stateOf(serial)
    val (p2, l2, s2, a2, nd2, tl2) = stateOf(batched)
    assert(p1 === p2, "postings diverge between serial and batched erasure")
    assert(l1 === l2, "lexicon diverges")
    assert(s1 === s2, "signature store diverges")
    assert(a1 === a2, "vector store diverges")
    assert(nd1 === nd2 && tl1 === tl2, "postings stats diverge")

    // ONE postings pin scan/rewrite: the batched drain advanced the
    // postings table by a third of the serial path's commits
    assert(serialDelta === 3 * batchedDelta,
      s"batched drain must pay one evict's commits (serial=$serialDelta, " +
        s"batched=$batchedDelta)")

    // the cursor makes a re-run a loud no-op...
    val vBefore = batchedPostT.latestVersion().get
    stage.execute(spark, Map.empty)
    assert(batchedPostT.latestVersion().get === vBefore)
    assert(spark.table("fb_audit").as[(Long, Long, Long)].collect().head
      === ((0L, 0L, 0L)))

    // ...and NEW requests drain incrementally from the advanced cursor
    reqT.append(spark.range(0, 90).filter("id % 9 = 1").selectExpr("id AS forget_id"))
    stage.execute(spark, Map.empty)
    assert(spark.table("fb_audit").as[(Long, Long, Long)].collect().head
      === ((10L, 10L, 10L)))
    assert(VersionedTable(s"$batched/text/postings").read(spark)
      .filter("doc_id % 9 = 1").isEmpty)
  }

  test("forgetDrainStream: requests stream in, stores converge to serial erasure") {
    val base = tmpDir("fbs-")
    val docs = docsDf(60)
    TextIndexStore.build(spark, s"$base/text", docs, "fp0")
    SignatureStore.build(spark, s"$base/sig", docs)
    val reqRoot = s"$base/req"
    val reqT = VersionedTable(reqRoot)
    reqT.commit(spark.range(0, 60).filter("id % 6 = 0").selectExpr("id AS doc_id"))
    // tick 1 drains the first wave
    assert(graft.streaming.StreamingEtl.forgetDrainStream(spark, reqRoot,
      "doc_id", textStoreURI = Some(s"$base/text"),
      dedupStoreURI = Some(s"$base/sig"),
      checkpointDir = s"$base/ckpt").awaitTermination(120000))
    assert(VersionedTable(s"$base/text/postings").read(spark)
      .filter("doc_id % 6 = 0").isEmpty)
    // new requests arrive; tick 2 resumes from the checkpoint and drains
    // ONLY them (the cursor makes replays no-ops either way)
    reqT.append(spark.range(0, 60).filter("id % 6 = 3").selectExpr("id AS doc_id"))
    assert(graft.streaming.StreamingEtl.forgetDrainStream(spark, reqRoot,
      "doc_id", textStoreURI = Some(s"$base/text"),
      dedupStoreURI = Some(s"$base/sig"),
      checkpointDir = s"$base/ckpt").awaitTermination(120000))
    for (t <- Seq(s"$base/text/postings", s"$base/sig/sigs"))
      assert(VersionedTable(t).read(spark).filter("doc_id % 3 = 0").isEmpty,
        s"$t still serves drained ids")
    // stats shrank exactly: nd equals the surviving doc count
    assert(TextIndexStore.stats(s"$base/text")._1 === 40L)
  }

  test("StreamIndexSync stage drains a tick from declarative JSON") {
    val base = tmpDir("sis-")
    val t = VersionedTable(s"$base/corpus")
    val docs = docsDf(50)
    t.commit(docs.filter("doc_id % 2 = 0"))
    TextIndexStore.build(spark, s"$base/ix", t.read(spark), "fp0")
    TextIndexStore.markSynced(s"$base/ix", t.resolve())
    t.append(docs.filter("doc_id % 2 = 1"))
    JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "StreamIndexSync", "name": "s", "tableURI": "$base/corpus",
         |   "storeURI": "$base/ix", "kind": "text", "fingerprint": "fp1",
         |   "checkpointURI": "$base/ckpt", "outputView": "sis_audit"}
         |]}""".stripMargin).run(spark, Map.empty)
    assert(TextIndexStore.stats(s"$base/ix")._1 === 50L)
    import spark.implicits._
    assert(spark.table("sis_audit").as[Long].collect().head === t.resolve())
  }

  test("ForgetBatch parses and runs from declarative JSON") {
    val base = tmpDir("fbj-")
    val docs = docsDf(40)
    TextIndexStore.build(spark, s"$base/text", docs, "fp0")
    val reqRoot = s"$base/req"
    VersionedTable(reqRoot).commit(
      spark.range(0, 40).filter("id % 8 = 0").selectExpr("id AS doc_id"))
    JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "ForgetBatch", "name": "f", "requestsURI": "$reqRoot",
         |   "idColumn": "doc_id", "textStoreURI": "$base/text",
         |   "outputView": "fbj_audit"}
         |]}""".stripMargin).run(spark, Map.empty)
    assert(spark.table("fbj_audit").as[(Long, Long, Long)].collect().head
      === ((5L, 0L, 0L)))
    assert(VersionedTable(s"$base/text/postings").read(spark)
      .filter("doc_id % 8 = 0").isEmpty)
  }
}
