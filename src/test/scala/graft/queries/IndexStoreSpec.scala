package graft.queries

import graft.SparkSpec
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The lake-resident versioned ANN/SRP index (SimilarityQueries.indexRoot):
  * the offline build commits `cents`/`assigned`/`srp` as VersionedTables
  * under a per-corpus root, records the corpus fingerprint in properties,
  * and every consumer verifies freshness — a second driver process serves
  * the stored index WITHOUT retraining, and a corpus update is DETECTED
  * and rebuilt, never silently served stale. */
class IndexStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** A tiny synthetic corpus in the testdata shape (vec_id, label,
    * embedding float[64]) under its own directory. */
  private def writeCorpus(dir: String, n: Int, shift: Double = 0.0): Unit =
    spark.range(0, n)
      .selectExpr("id AS vec_id", "concat('l', id % 5) AS label",
        s"transform(sequence(1, 64), j -> CAST(sin(id * j + $shift) AS FLOAT)) AS embedding")
      .coalesce(1).write.mode("overwrite").parquet(s"$dir/embeddings.parquet")

  private def indexRootFor(dir: String): String = {
    val base = spark.conf.get("spark.graft.index.root")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(Paths.get(dir).toAbsolutePath.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    s"$base/$key"
  }

  test("the stored index is versioned, fingerprinted, and served without " +
      "retraining by a second session") {
    val corpus = tmpDir("idx-corpus-")
    val lake = tmpDir("idx-lake-")
    spark.conf.set("spark.graft.index.root", lake)
    try {
      writeCorpus(corpus, 100)
      SimilarityQueries.buildIndex(spark, corpus)
      val root = indexRootFor(corpus)
      val cents = VersionedTable(s"$root/cents")
      assert(VersionedTable.exists(s"$root/cents"), "cents must be a lake table")
      assert(VersionedTable.exists(s"$root/assigned"))
      assert(VersionedTable.exists(s"$root/srp"))
      val v0 = cents.latestVersion().get
      assert(cents.properties.contains("corpusFingerprint"))
      assert(cents.properties.get("corpusRows").contains("100"))
      assert(cents.properties.get("seedModulus").contains("25"))
      // the assigned store is PARTITIONED by centroid (inverted-file layout)
      val at = VersionedTable(s"$root/assigned")
      assert(at.read(spark).count() === 100)

      // a "second driver": fresh session, fresh JVM verification state —
      // it must verify against the STORED properties and serve, committing
      // nothing (same versions = no retrain)
      SimilarityQueries.resetIndexCache()
      val second = org.apache.spark.sql.graft.PlanShim.cloneSession(spark)
      val secs = SimilarityQueries.buildIndex(second, corpus)
      assert(cents.latestVersion().get === v0,
        "a fresh process over a fresh corpus must serve, not retrain")
      assert(secs < 5.0, s"verification is metadata-plane, took $secs s")
    } finally spark.conf.unset("spark.graft.index.root")
  }

  test("a corpus update is detected by fingerprint and rebuilds new versions") {
    val corpus = tmpDir("idx-corpus2-")
    val lake = tmpDir("idx-lake2-")
    spark.conf.set("spark.graft.index.root", lake)
    try {
      writeCorpus(corpus, 100)
      SimilarityQueries.buildIndex(spark, corpus)
      val root = indexRootFor(corpus)
      val cents = VersionedTable(s"$root/cents")
      val v0 = cents.latestVersion().get
      val fp0 = cents.properties("corpusFingerprint")

      // grow the corpus in place (names/sizes/mtimes change)
      writeCorpus(corpus, 150, shift = 0.5)
      // even WITHOUT clearing the JVM cache the fingerprint mismatch must
      // trigger a rebuild: staleness is detected per call, not per process
      SimilarityQueries.buildIndex(spark, corpus)
      assert(cents.latestVersion().get > v0, "stale index must rebuild")
      assert(cents.properties("corpusFingerprint") !== fp0)
      assert(cents.properties.get("corpusRows").contains("150"))
      assert(VersionedTable(s"$root/assigned").read(spark).count() === 150)
      // the PRE-update index remains time-travelable, like any lake table
      assert(VersionedTable(s"$root/assigned")
        .read(spark, versionAsOf = Some(0L)).count() === 100)
    } finally spark.conf.unset("spark.graft.index.root")
  }

  test("queries serve from the stored layout (partition-pruned probes)") {
    val corpus = tmpDir("idx-corpus3-")
    val lake = tmpDir("idx-lake3-")
    spark.conf.set("spark.graft.index.root", lake)
    try {
      writeCorpus(corpus, 200)
      // end-to-end through the real query entry points
      val s2 = SimilarityQueries.s2AnnIvf.run(spark, corpus)
      assert(s2.count() === 10)
      val s3 = SimilarityQueries.s3SrpLsh.run(spark, corpus)
      assert(s3.count() === 10)
      val s7 = SimilarityQueries.s7KmeansTrain.run(spark, corpus)
      val clusters = s7.count()
      assert(clusters >= 1 && clusters <= 8, // 200 ids, modulus 25 → ≤ 8 seeds
        s"expected ≤ 8 trained clusters, got $clusters")
    } finally spark.conf.unset("spark.graft.index.root")
  }
}
