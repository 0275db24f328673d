package graft.queries

import graft.dedup.TextIndexStore
import graft.table.VersionedTable
import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Paths

/** Incremental BM25 index maintenance ([[TextIndexStore]], SURVEY.md §2.12
  * / the s15 gate entry): a store grown by `admit` must be EXACTLY the
  * full-corpus build — postings append to their buckets, lexicon df merges
  * in place, nd/totalLen advance — and a second session must serve the
  * grown store without any rebuild. */
class TextIndexStoreSpec extends AnyFunSuite with SparkSpec {

  private def writeDocs(dir: String, n: Int): Unit =
    spark.range(0, n).selectExpr("id AS doc_id",
        "concat('spark merge sort dup w', id % 17, ' window etl x', id % 5) AS text")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/documents.parquet")

  private def indexRootFor(dir: String): String = {
    val base = spark.conf.get("spark.graft.index.root")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(Paths.get(dir).toAbsolutePath.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    s"$base/$key"
  }

  test("admit grows the index exactly: postings append, lexicon df merges, " +
      "stats match a full-corpus build") {
    val dir = tmpDir("txt-corpus-")
    writeDocs(dir, 200)
    val docs = Tables.table(spark, dir, "documents")
    val root = tmpDir("txt-store-") + "/s"
    TextIndexStore.build(spark, root, docs.filter("doc_id < 150"), "fp0")
    val posts = VersionedTable(s"$root/postings")
    val vPosts0 = posts.resolve()
    assert(TextIndexStore.admit(spark, root,
      docs.filter("doc_id >= 150"), "fp1") === 50L)
    // growth is one APPEND on postings — never an overwrite/rebuild
    assert(posts.resolve() === vPosts0 + 1)
    val op = posts.history(spark).filter(s"version = ${vPosts0 + 1}")
      .select("operation").head.getString(0)
    assert(op === "APPEND", s"admit must append, got $op")
    assert(posts.properties.get("corpusFingerprint").contains("fp1"),
      "the fingerprint must advance with the admitted batch")
    // the grown store's corpus stats, lexicon and postings equal the
    // full-corpus build bit for bit (BM25 maintenance is exact)
    val full = tmpDir("txt-full-") + "/s"
    TextIndexStore.build(spark, full, docs, "fpF")
    assert(TextIndexStore.stats(root) === TextIndexStore.stats(full))
    def lexRows(r: String): Seq[(String, Long)] =
      VersionedTable(s"$r/lexicon").read(spark)
        .selectExpr("word", "CAST(df AS BIGINT)").collect()
        .map(x => (x.getString(0), x.getLong(1))).toSeq.sorted
    assert(lexRows(root) === lexRows(full))
    def postRows(r: String): Seq[(Long, String, Long, Long)] =
      VersionedTable(s"$r/postings").read(spark)
        .selectExpr("doc_id", "word", "tf", "len").collect()
        .map(x => (x.getLong(0), x.getString(1), x.getLong(2), x.getLong(3)))
        .toSeq.sorted
    assert(postRows(root) === postRows(full))
    // a batch with only already-known words still merges df correctly (no
    // inserts) and an empty batch is a no-op
    val v1 = posts.resolve()
    assert(TextIndexStore.admit(spark, root,
      docs.filter("doc_id < 0"), "fp2") === 0L)
    assert(posts.resolve() === v1, "an empty admit must commit nothing")
  }

  test("the s15 gate store serves from disk in a second session — growth " +
      "never triggers a rebuild") {
    val dir = tmpDir("txt-gate-")
    val lake = tmpDir("txt-lake-")
    spark.conf.set("spark.graft.index.root", lake)
    try {
      writeDocs(dir, 120)
      val out1 = SimilarityQueries.s15Bm25Admit.run(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4))
      assert(out1.nonEmpty)
      val gateRoot = indexRootFor(dir) + "/text_admit"
      val posts = VersionedTable(s"$gateRoot/postings")
      val v = posts.resolve()
      // build(v0) + admit(v1): the held-out slice arrived by append
      assert(v >= 1L)
      // "second driver": fresh verification memo — must verify the stored
      // fingerprint and serve, committing nothing
      SimilarityQueries.resetIndexCache()
      val out2 = SimilarityQueries.s15Bm25Admit.run(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getInt(3)))
        .sortBy(x => (x._1, x._4))
      assert(posts.resolve() === v,
        "a second session over an unchanged corpus must serve, not rebuild")
      assert(out1.toSeq === out2.toSeq)
    } finally spark.conf.unset("spark.graft.index.root")
  }
}
