package graft.dedup

import graft.table.{Merge, VersionedTable}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-resident BM25 inverted-index store with INCREMENTAL maintenance —
  * the lexical sibling of [[VectorStore]] (SURVEY.md §2.12): the corpus is
  * tokenized ONCE into hash-bucketed postings, and every later document
  * batch APPENDS its postings to the buckets it touches while the lexicon's
  * document frequencies MERGE in place — the corpus text is never
  * re-tokenized and the index never rebuilds wholesale on growth.
  *
  * Store layout (each a [[VersionedTable]], PARTITIONED BY `bucket` =
  * `pmod(xxhash64(word), Buckets)`):
  *  - `<root>/postings`: (doc_id, word, tf, len, bucket) — a keyword probe
  *    reads only its terms' bucket partitions (manifest partition pruning);
  *  - `<root>/lexicon`:  (word, df, bucket) — per-term document frequency.
  * Corpus-level stats ride in the postings table's properties: `nd` (doc
  * count) and `totalLen` (summed token count, a BIGINT so the running sum
  * is exact) — `avglen = totalLen / nd` is derived at serve time.
  *
  * Maintenance contract — EXACT, unlike [[VectorStore]]'s fixed-centroid
  * drift: BM25's corpus statistics are all additive (tf/len are per-doc,
  * df and nd and totalLen are sums), so a store grown by [[admit]] is
  * bit-identical in serving behavior to one rebuilt from the full corpus —
  * there is no recall decay to bound and no retrain verb to schedule. The
  * bucket count is the one fixed layout choice (a probe's I/O unit); it is
  * query-side invisible and can only change via rebuild.
  *
  * Caller contract: a batch must contain only NEW doc_ids (re-admitting a
  * document would double-count its df/len contributions — dedup upstream,
  * e.g. by [[SignatureStore]] admission, exactly the training-pipeline
  * order: dedup first, index what survives).
  *
  * Scale per batch: one tokenize pass over the BATCH, one map-side-combined
  * tf/df aggregation, one partitioned append, one bucket-pruned lexicon
  * merge — nothing touches the stored corpus outside the batch's buckets. */
object TextIndexStore {

  /** Term-hash partition count — the probe I/O granularity. */
  val Buckets = 64

  /** Store format stamp: "2" = incremental (nd/totalLen properties). */
  val Format = "2"

  private def postingsTable(root: String) = VersionedTable(s"$root/postings")
  private def lexiconTable(root: String) = VersionedTable(s"$root/lexicon")

  private def bucketCol = expr(s"pmod(xxhash64(word), $Buckets)")

  /** Tokenize (doc_id, text) on single spaces — the corpus' own shape. */
  private def tokenized(docs: DataFrame): DataFrame =
    docs.selectExpr("doc_id", "explode(split(text, ' ')) AS word")

  /** (nd, totalLen) recorded at `root`. */
  def stats(root: String): (Long, Long) = {
    val p = postingsTable(root).properties
    (p("nd").toLong, p("totalLen").toLong)
  }

  /** Exact serving average document length, derived (not stored — a stored
    * double would drift from the exact integer accumulators). */
  def avgLen(root: String): Double = {
    val (nd, totalLen) = stats(root)
    totalLen.toDouble / nd
  }

  /** Bootstrap: tokenize the corpus once, lay out postings + lexicon by
    * term bucket, record the corpus stats and fingerprint. */
  def build(spark: SparkSession, root: String, docs: DataFrame,
      fingerprint: String): Unit = {
    val postT = postingsTable(root)
    require(postT.latestVersion().isEmpty, s"$root already holds a text index store")
    val tok = tokenized(docs)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val doclen = tok.groupBy("doc_id")
        .agg(expr("CAST(count(*) AS BIGINT)").as("len"))
      val s = doclen.agg(expr("CAST(count(*) AS BIGINT)").as("nd"),
        expr("CAST(coalesce(sum(len), 0) AS BIGINT)").as("tl")).head()
      val (nd, totalLen) = (s.getLong(0), s.getLong(1))
      require(nd > 0, s"cannot build a text index at $root from an empty corpus")
      val tf = tok.groupBy("doc_id", "word")
        .agg(expr("CAST(count(*) AS BIGINT)").as("tf"))
      // co-locate per bucket before the partitioned commit; stats ON — the
      // lexicon merge's file pruning keys on the bucket column's min/max
      postT.commit(
        tf.join(doclen, "doc_id").withColumn("bucket", bucketCol)
          .repartition(col("bucket")),
        partitionBy = Seq("bucket"), collectStats = false)
      lexiconTable(root).commit(
        tok.groupBy("word")
          .agg(expr("CAST(count(DISTINCT doc_id) AS BIGINT)").as("df"))
          .withColumn("bucket", bucketCol)
          .repartition(col("bucket")),
        partitionBy = Seq("bucket"), collectStats = true)
      postT.setProperties(Map(
        "corpusFingerprint" -> fingerprint,
        "nd" -> nd.toString,
        "totalLen" -> totalLen.toString,
        "indexFormat" -> Format))
    } finally { tok.unpersist(); () }
  }

  /** Admit a batch of NEW documents: postings append to their buckets, the
    * lexicon's df counters merge in place, the corpus stats advance, and
    * the recorded fingerprint moves to `fingerprint` — the store stays
    * serving-exact for (build corpus ∪ every admitted batch) with no
    * rebuild. Returns the number of documents admitted. */
  def admit(spark: SparkSession, root: String, batch: DataFrame,
      fingerprint: String): Long = {
    val postT = postingsTable(root)
    require(postT.latestVersion().isDefined,
      s"$root holds no text index store — build(corpus) first")
    require(postT.properties.get("indexFormat").contains(Format),
      s"$root was built by an incompatible text-index format — rebuild")
    val tok = tokenized(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val doclen = tok.groupBy("doc_id")
        .agg(expr("CAST(count(*) AS BIGINT)").as("len"))
      val s = doclen.agg(expr("CAST(count(*) AS BIGINT)").as("nd"),
        expr("CAST(coalesce(sum(len), 0) AS BIGINT)").as("tl")).head()
      val (bd, blen) = (s.getLong(0), s.getLong(1))
      if (bd == 0) return 0L
      val tf = tok.groupBy("doc_id", "word")
        .agg(expr("CAST(count(*) AS BIGINT)").as("tf"))
      postT.append(
        tf.join(doclen, "doc_id").withColumn("bucket", bucketCol)
          .repartition(col("bucket")),
        collectStats = false)
      // df counters merge at bucket granularity: the condition's bucket
      // equi-conjunct is the prune key, so only the batch's own term
      // buckets are read or rewritten
      lexiconTable(root).mergeCow(spark,
        tok.groupBy("word")
          .agg(expr("CAST(count(DISTINCT doc_id) AS BIGINT)").as("df"))
          .withColumn("bucket", bucketCol),
        "source.bucket = target.bucket AND source.word = target.word",
        targetKey = "bucket", sourceKey = "bucket",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(None,
          Map("df" -> "target.df + source.df"))),
        whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
          Map("word" -> "source.word", "df" -> "source.df",
            "bucket" -> "source.bucket"))))
      val (nd, totalLen) = stats(root)
      postT.setProperties(Map(
        "corpusFingerprint" -> fingerprint,
        "nd" -> (nd + bd).toString,
        "totalLen" -> (totalLen + blen).toString))
      bd
    } finally { tok.unpersist(); () }
  }
}
