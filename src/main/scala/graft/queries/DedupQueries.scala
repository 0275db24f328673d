package graft.queries

import org.apache.spark.sql.functions._

/** Deduplication operators over `documents` (north-star extensions,
  * SURVEY.md §2.12): exact, n-gram Jaccard, MinHash+LSH (Broder, "On the
  * resemblance and containment of documents", 1997), SimHash (Charikar,
  * "Similarity estimation techniques from rounding algorithms", STOC 2002).
  *
  * Scale design notes (the 100 TB story):
  *  - exact dedup: one hash-shuffle on the checksum — optimal.
  *  - MinHash signatures and SimHash values are computed PER ROW with
  *    higher-order expressions (md5-based permutation hashes) — zero shuffle,
  *    zero UDF, whole-stage codegen; only the tiny (doc_id, band-key) pairs
  *    shuffle for bucketing. This is the standard shingle→minhash→band→bucket
  *    pipeline: candidate generation is linear, never all-pairs.
  *  - exact n-gram Jaccard uses the inverted-index self-join (pairs sharing a
  *    shingle), which is quadratic only within a shingle bucket — the honest
  *    exact baseline the LSH path approximates.
  *
  * Cross-engine determinism: the 16 permutation hashes of shingle s are the
  * 8-hex lanes of `md5('0:'||s) || md5('1:'||s) || md5('2:'||s) || md5('3:'||s)`
  * compared lexicographically (fixed-width hex ⇒ string min = numeric min), so
  * Spark and DuckDB compute bit-identical signatures with no platform hash
  * dependence, at 4 md5 calls per shingle.
  */
object DedupQueries {

  /** Word 3-gram shingles of the space-separated text, as a Spark
    * higher-order expression (per-row, codegen'd). The split array is
    * let-bound via a singleton transform: referencing `split(text, ' ')`
    * inside the per-index lambda re-evaluates the split for EVERY index —
    * O(tokens²) per document, measured 4× slower end-to-end. ONE canonical
    * spelling, owned by the incremental store — a drifted copy would
    * silently diverge store verdicts from the d2/d3 gates and oracles. */
  private val shinglesExpr = graft.dedup.SignatureStore.ShinglesExpr

  /** Same shingle set in DuckDB. */
  private val duckShingles =
    """SELECT doc_id, unnest(list_transform(
      |    range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
      |    i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingle
      |FROM documents""".stripMargin

  /** d1: exact dedup — keep the min-doc_id representative per md5(text).
    * Shared SQL; one shuffle on the checksum. */
  val d1Exact: Q = Q.sharedSql("d1_dedup_exact",
    """SELECT doc_id, lang, source FROM (
      |  SELECT doc_id, lang, source,
      |    row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
      |  FROM documents) t
      |WHERE rn = 1""".stripMargin)

  /** d2's inverted-index bucket cap: a shingle shared by more than this
    * many documents contributes only stop-shingle pairs (quadratic in the
    * bucket) and is dropped BEFORE pair explosion. 1000 bounds a worst-case
    * bucket at ~500k pairs — one task's work — and sits far above any
    * bucket the test corpora produce (25 docs at sf0.1), so the gate
    * result is identical with or without the cap. */
  private val MaxShingleBucket = 1000

  /** d2: exact n-gram Jaccard near-dup pairs (threshold 0.5) via the
    * inverted-index formulation. */
  val d2NgramJaccard: Q = Q(
    "d2_ngram_jaccard",
    (spark, dir) => {
      // Inverted-index pair counting WITHOUT the self-join, in exactly TWO
      // shuffles: (1) group exploded (shingle, doc) rows by shingle,
      // deduplicating inside the bucket (array_distinct after collect_list
      // — same set as a pre-distinct, one shuffle cheaper) and keeping
      // only buckets of >= 2 docs (singleton shingles — the vast majority
      // at scale — produce no pair); (2) explode each bucket's ordered doc
      // pairs and count occurrences = |intersection|. Per-doc distinct
      // shingle counts need NO shuffle at all — size(array_distinct(...))
      // per row — and join the pair table as an auto-broadcast. At 100 TB
      // this formulation is the honest exact baseline; pathological
      // stop-shingle buckets HAVE a size cap (`MaxShingleBucket` below):
      // a shingle shared by more than B documents is stop-shingle noise
      // whose pair explosion is quadratic in B — dropping the bucket
      // bounds per-bucket work at B²/2 while every genuinely near-dup
      // pair still meets through its rarer shingles (the LSH path d3 is
      // the real scale route). The DuckDB oracle applies the SAME cap, so
      // the gate compares identical semantics; at the test scales the cap
      // never binds (max observed bucket: 25 docs at sf0.1).
      val docs = Tables.table(spark, dir, "documents")
      val out = docs
        .select(col("doc_id"), expr(s"array_distinct($shinglesExpr)").as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("shingle"))
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .filter(size(col("ds")) > 1 && size(col("ds")) <= MaxShingleBucket)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)), y ->
            |    struct(x.doc_id AS a_id, y.doc_id AS b_id, x.n AS na, y.n AS nb))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
          col("p.na").as("na"), col("p.nb").as("nb"))
        .agg(count(lit(1)).as("inter"))
        .filter(expr("CAST(inter AS DOUBLE) / (na + nb - inter) >= 0.5"))
        .select(col("a_id"), col("b_id"),
          expr("round(CAST(inter AS DOUBLE) / (na + nb - inter), 6)").as("jaccard"))
      out
    },
    Some(
      s"""WITH shingles AS (SELECT DISTINCT doc_id, shingle FROM ($duckShingles) t),
         |counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
         |-- same stop-shingle bucket cap as the Spark side (MaxShingleBucket)
         |kept AS (SELECT shingle FROM shingles
         |         GROUP BY shingle HAVING count(*) BETWEEN 2 AND 1000),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  JOIN kept k ON k.shingle = a.shingle
         |  GROUP BY a.doc_id, b.doc_id)
         |SELECT a_id, b_id,
         |  round(CAST(inter AS DOUBLE) / (ca.n + cb.n - inter), 6) AS jaccard
         |FROM pairs
         |JOIN counts ca ON ca.doc_id = a_id
         |JOIN counts cb ON cb.doc_id = b_id
         |WHERE CAST(inter AS DOUBLE) / (ca.n + cb.n - inter) >= 0.5""".stripMargin))

  /** 16-permutation MinHash signature as ONE per-row fold. Cost-shaped for
    * scale: 4 md5 calls per shingle (each 32-hex digest is split into four
    * 8-hex lanes → 16 independent 32-bit permutations), and the whole
    * signature is a single `aggregate` so Catalyst's CollapseProject cannot
    * duplicate the hash material per lane (a naive two-projection version
    * inlines the md5s 16× — measured 4× slower). The inner single-element
    * `aggregate` is a let-binding for the per-shingle digest; `least` on
    * fixed-width hex strings is numeric min. 'g' > any hex char, so
    * array_repeat('g', 16) is the fold's +infinity. */
  private val sigExpr =
    """aggregate(sh, array_repeat('g', 16), (acc, s) ->
      |  aggregate(array(concat(md5(concat('0:', s)), md5(concat('1:', s)),
      |                         md5(concat('2:', s)), md5(concat('3:', s)))), acc,
      |    (a2, h) -> zip_with(a2, sequence(0, 15),
      |      (m, i) -> least(m, substr(h, CAST(1 + i * 8 AS INT), 8)))))""".stripMargin

  /** LSH-verified near-dup pairs (a_id, b_id, jaccard) — shared by d3
    * (pair output) and d6 (cluster edges): 16 perms, 8 bands × 2 rows;
    * signature per row (no shuffle), explode 8 band keys, bucket self-join,
    * exact-Jaccard verification ≥ 0.5 on distinct shingle arrays. */
  private[queries] def lshVerifiedPairs(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      val docs = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), expr(shinglesExpr).as("sh"))
      // native one-pass signature expression (graft.functions.MinHashSignature
      // — bit-identical to the SQL fold in sigExpr, ~no intermediate allocs)
      graft.functions.GraftFunctions.registerAll(spark)
      // the tiny (doc_id, signature) table is materialized ONCE (persist +
      // count): it is both a CollapseProject barrier (band keys below would
      // otherwise inline the md5-heavy signature expression 8×) and the reason
      // the self-join doesn't recompute signatures per side — at scale this is
      // the standard "write signatures" stage of the LSH pipeline
      val sigDf = docs.select(col("doc_id"), expr("minhash_sig(sh)").as("sig")).persist()
      sigDf.count()
      // band keys: the store-owned canonical spelling (d12 parity)
      val bandRows = sigDf
        .select(col("doc_id"),
          explode(expr(graft.dedup.SignatureStore.BandKeysExpr)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
      val cand = bandRows.toDF("a_id", "band", "bkey")
        .join(bandRows.toDF("b_id", "band2", "bkey2"),
          col("band") === col("band2") && col("bkey") === col("bkey2") &&
            col("a_id") < col("b_id"))
        .select("a_id", "b_id").distinct()
      // verification joins the compact candidate pairs back to per-doc
      // distinct-shingle sets (arrays shuffle only for candidates, not for
      // every band row)
      val docSets = docs.select(col("doc_id"), expr("array_distinct(sh)").as("ds"))
      val out = cand
        .join(docSets.toDF("a_id", "da"), "a_id")
        .join(docSets.toDF("b_id", "db"), "b_id")
        .withColumn("inter", expr("size(array_intersect(da, db))"))
        .withColumn("jaccard", expr(
          "round(CAST(inter AS DOUBLE) / (size(da) + size(db) - inter), 6)"))
        .filter(expr("CAST(inter AS DOUBLE) / (size(da) + size(db) - inter) >= 0.5"))
        .select("a_id", "b_id", "jaccard")
        // pin the small verified-pair list eagerly so the signature cache
        // can release before return (it would otherwise outlive the query)
        .localCheckpoint(true)
      sigDf.unpersist()
      out
  }

  /** d3's relational replay, factored so the split-leakage audit (d17) can
    * reuse the verified-pair construction verbatim. */
  private val d3OracleSql: String =
      s"""WITH sh_all AS ($duckShingles),
         |hm AS (
         |  SELECT doc_id, shingle,
         |    md5('0:' || shingle) || md5('1:' || shingle) ||
         |    md5('2:' || shingle) || md5('3:' || shingle) AS h
         |  FROM sh_all),
         |sig AS (
         |  SELECT doc_id, i, min(substr(h, 1 + i * 8, 8)) AS mh
         |  FROM hm, (SELECT unnest(range(0, 16)) AS i) perms
         |  GROUP BY doc_id, i),
         |sigs AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM sig GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b * 2 + 1:b * 2 + 2], ',')) AS bkey
         |  FROM sigs, (SELECT unnest(range(0, 8)) AS b) bs),
         |cand AS (
         |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
         |  FROM bands a JOIN bands b
         |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
         |shingles AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
         |counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
         |inter AS (
         |  SELECT c.a_id, c.b_id, count(*) AS i
         |  FROM cand c
         |  JOIN shingles sa ON sa.doc_id = c.a_id
         |  JOIN shingles sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
         |  GROUP BY c.a_id, c.b_id)
         |SELECT a_id, b_id,
         |  round(CAST(i AS DOUBLE) / (ca.n + cb.n - i), 6) AS jaccard
         |FROM inter
         |JOIN counts ca ON ca.doc_id = a_id
         |JOIN counts cb ON cb.doc_id = b_id
         |WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5""".stripMargin

  val d3MinHashLsh: Q = Q(
    "d3_minhash_lsh",
    (spark, dir) => lshVerifiedPairs(spark, dir),
    Some(d3OracleSql))

  /** d4: 16-bit SimHash over distinct words (md5-bit voting), with the
    * bucket size as the dedup signal. Per-row nested higher-order folds on
    * the Spark side — no shuffle for the hash itself. The fold is shaped
    * token-major: ONE md5 per distinct token, all 16 bit-votes taken from
    * that digest via zip_with (the bit-major formulation recomputes the
    * md5 16× per token — measured ~2× slower end-to-end), with the inner
    * single-element aggregate as the digest's let-binding and the vote→bit
    * collapse in the aggregate's finish lambda. */
  val d4SimHash: Q = Q.dualSql("d4_simhash",
    sparkSql =
      """SELECT doc_id, simhash,
        |  count(*) OVER (PARTITION BY simhash) AS bucket_size
        |FROM (
        |  SELECT doc_id,
        |    aggregate(array_distinct(split(text, ' ')), array_repeat(0L, 16),
        |      (acc, t) -> aggregate(array(md5(t)), acc, (a2, h) ->
        |        zip_with(a2, sequence(0, 15), (v, j) -> v +
        |          (((instr('0123456789abcdef', substr(h, CAST(1 + j div 4 AS INT), 1)) - 1)
        |            div CAST(pow(2, 3 - j % 4) AS INT)) % 2) * 2 - 1)),
        |      votes -> aggregate(
        |        zip_with(votes, sequence(0, 15),
        |          (s, j) -> IF(s > 0, CAST(pow(2, j) AS BIGINT), 0L)),
        |        0L, (x, y) -> x + y)) AS simhash
        |  FROM documents) t""".stripMargin,
    duckSql =
      """WITH toks AS (
        |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents),
        |bits AS (
        |  SELECT doc_id, j,
        |    sum((((instr('0123456789abcdef', substr(md5(tok), 1 + j // 4, 1)) - 1)
        |          // CAST(pow(2, 3 - j % 4) AS INT)) % 2) * 2 - 1) AS s
        |  FROM toks, (SELECT unnest(range(0, 16)) AS j) js
        |  GROUP BY doc_id, j),
        |sh AS (
        |  SELECT doc_id,
        |    CAST(sum(CASE WHEN s > 0 THEN CAST(pow(2, j) AS BIGINT) ELSE 0 END) AS BIGINT) AS simhash
        |  FROM bits GROUP BY doc_id)
        |SELECT doc_id, simhash,
        |  count(*) OVER (PARTITION BY simhash) AS bucket_size
        |FROM sh""".stripMargin)

  /** d6: near-dup CLUSTERING — connected components over the LSH-verified
    * ≥ 0.5 edge list (the scale path: candidate edges come from the linear
    * shingle→minhash→band pipeline, not the quadratic inverted-index join),
    * labeling every document with its cluster's min doc_id and flagging the
    * canonical representative (what a dedup pipeline keeps).
    *
    * Spark side: distributed min-label propagation to fixpoint (the Pregel
    * pattern as plain DataFrame joins — each iteration is one join + one
    * min-aggregation, converging in O(cluster diameter) rounds; near-dup
    * clusters are shallow, so 2-4 rounds; switch to large-star/small-star
    * doubling if diameters grow). Two shapes that matter at 100 TB:
    * propagation runs ONLY over edge-touched nodes (the corpus-sized
    * complement can never change label — it joins back in one final pass as
    * singleton components), and change-detection rides the same aggregation
    * as the label update (old label carried through the union), so each
    * round is exactly one join + one groupBy + one count action. The driver
    * loop only steers; all data stays distributed. Oracle: DuckDB
    * recursive-CTE reachability over the identical LSH edge pipeline. */
  /** d6's DuckDB-side CTE chain up to `comp` (doc_id, component) — the
    * recursive-reachability replay of the label propagation, factored so
    * d19's oracle composes on the identical clustering. */
  private val d6CompCtes: String =
    s"""sh_all AS ($duckShingles),
       |hm AS (
       |  SELECT doc_id, shingle,
       |    md5('0:' || shingle) || md5('1:' || shingle) ||
       |    md5('2:' || shingle) || md5('3:' || shingle) AS h
       |  FROM sh_all),
       |sig AS (
       |  SELECT doc_id, i, min(substr(h, 1 + i * 8, 8)) AS mh
       |  FROM hm, (SELECT unnest(range(0, 16)) AS i) perms
       |  GROUP BY doc_id, i),
       |sigs AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM sig GROUP BY doc_id),
       |bands AS (
       |  SELECT doc_id, b, md5(array_to_string(sig[b * 2 + 1:b * 2 + 2], ',')) AS bkey
       |  FROM sigs, (SELECT unnest(range(0, 8)) AS b) bs),
       |cand AS (
       |  SELECT DISTINCT a.doc_id AS a_id, b.doc_id AS b_id
       |  FROM bands a JOIN bands b
       |    ON a.b = b.b AND a.bkey = b.bkey AND a.doc_id < b.doc_id),
       |shingles AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
       |counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
       |inter AS (
       |  SELECT c.a_id, c.b_id, count(*) AS i
       |  FROM cand c
       |  JOIN shingles sa ON sa.doc_id = c.a_id
       |  JOIN shingles sb ON sb.doc_id = c.b_id AND sb.shingle = sa.shingle
       |  GROUP BY c.a_id, c.b_id),
       |edges AS (
       |  SELECT a_id, b_id FROM inter
       |  JOIN counts ca ON ca.doc_id = a_id
       |  JOIN counts cb ON cb.doc_id = b_id
       |  WHERE CAST(i AS DOUBLE) / (ca.n + cb.n - i) >= 0.5),
       |edges2 AS (SELECT a_id AS src, b_id AS dst FROM edges
       |           UNION SELECT b_id, a_id FROM edges),
       |walk(n, lbl) AS (
       |  SELECT doc_id, doc_id FROM documents
       |  UNION
       |  SELECT e.dst, w.lbl FROM walk w JOIN edges2 e ON e.src = w.n),
       |comp AS (SELECT n AS doc_id, min(lbl) AS component FROM walk GROUP BY n)"""
      .stripMargin

  /** Near-dup connected components (d6's label propagation), shared with
    * d19's exemplar selection: (doc_id, component) for EVERY document —
    * singletons are their own component. */
  private[queries] def components(spark: org.apache.spark.sql.SparkSession,
      dir: String): org.apache.spark.sql.DataFrame = {
      Tables.registerAll(spark, dir)
      val edges = lshVerifiedPairs(spark, dir).select("a_id", "b_id").persist()
      val sym = edges.union(edges.select(col("b_id").as("a_id"), col("a_id").as("b_id")))
        .toDF("src", "dst").persist()
      sym.count()
      edges.unpersist()
      // persist (NOT localCheckpoint): at the 2-4 rounds shallow near-dup
      // clusters need, the logical-plan growth that wedges long iterative
      // loops (see GraphOps) is negligible, and persist+count is measurably
      // cheaper per round than eager checkpointing; a deep-graph workload
      // should use GraphOps.connectedComponents, which checkpoints
      var lbl = sym.select(col("src").as("doc_id")).distinct()
        .select(col("doc_id"), col("doc_id").as("lbl")).persist()
      var changed = 1L
      var iter = 0
      while (changed > 0 && iter < 32) {
        val prop = sym.join(lbl, sym("src") === lbl("doc_id"))
          .select(col("dst").as("doc_id"), col("lbl"))
        // each node occurs exactly once in lbl, so max(old) recovers its
        // previous label inside the min-aggregation — no second join
        val next = lbl.select(col("doc_id"), col("lbl"), col("lbl").as("old"))
          .union(prop.select(col("doc_id"), col("lbl"), lit(null).cast("long").as("old")))
          .groupBy("doc_id").agg(min("lbl").as("lbl"), max("old").as("old")).persist()
        changed = next.filter(col("lbl") < col("old")).count()
        lbl.unpersist()
        lbl = next
        iter += 1
      }
      // fail loudly rather than return split components: the iteration cap
      // exists for adversarial chain-shaped clusters, and silently stopping
      // early would diverge from the oracle's full reachability
      if (changed > 0) throw new IllegalStateException(
        s"label propagation did not converge within $iter iterations")
      sym.unpersist()
      // pin the small per-doc result eagerly so the final label cache can
      // release before return (cache entries outlive the query otherwise;
      // checkpoint blocks are GC-freed with the frame)
      val comp = Tables.table(spark, dir, "documents").select("doc_id")
        .join(lbl.select(col("doc_id"), col("lbl")), Seq("doc_id"), "left")
        .select(col("doc_id"), coalesce(col("lbl"), col("doc_id")).as("component"))
        .localCheckpoint(true)
      lbl.unpersist()
      comp
  }

  val d6DedupClusters: Q = Q(
    "d6_dedup_clusters",
    (spark, dir) => {
      components(spark, dir).select(
        col("doc_id"), col("component"),
        count(lit(1)).over(org.apache.spark.sql.expressions.Window
          .partitionBy(col("component"))).as("cluster_size"),
        (col("doc_id") === col("component")).as("is_canonical"))
    },
    Some(
      s"""WITH RECURSIVE
         |$d6CompCtes
         |SELECT doc_id, component,
         |  count(*) OVER (PARTITION BY component) AS cluster_size,
         |  doc_id = component AS is_canonical
         |FROM comp""".stripMargin))

  /** d7: collection-level MinHash — the TypedImperativeAggregate tier
    * (graft.functions.MinHashAgg): one 16-lane signature PER SOURCE unions
    * every document's shingles (map-side partial agg, 128-byte merge state),
    * then pairwise source similarity is estimated as matching-lanes/16.
    * At 100 TB this compares whole collections with a shuffle of 16 values
    * per group — the sketch shape that exact pairwise comparison can't
    * approach. Oracle: the same per-lane min over the group in DuckDB SQL. */
  val d7CollectionMinHash: Q = Q(
    "d7_collection_minhash",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      Tables.table(spark, dir, "documents")
        .select(col("source"), expr(shinglesExpr).as("sh"))
        .createOrReplaceTempView("d7_shingled")
      spark.sql(
        """WITH sigs AS (
          |  SELECT source, minhash_agg(sh) AS sig
          |  FROM d7_shingled GROUP BY source)
          |SELECT a.source AS a_source, b.source AS b_source,
          |  CAST(size(filter(zip_with(a.sig, b.sig, (x, y) -> x = y), m -> m)) AS DOUBLE) / 16
          |    AS est_sim
          |FROM sigs a JOIN sigs b ON a.source < b.source""".stripMargin)
    },
    Some(
      """WITH sh AS (
        |  SELECT source, unnest(list_transform(
        |      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
        |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingle
        |  FROM documents),
        |hm AS (
        |  SELECT source,
        |    md5('0:' || shingle) || md5('1:' || shingle) ||
        |    md5('2:' || shingle) || md5('3:' || shingle) AS h
        |  FROM sh),
        |lane AS (
        |  SELECT source, i, min(substr(h, 1 + i * 8, 8)) AS mh
        |  FROM hm, (SELECT unnest(range(0, 16)) AS i) perms
        |  GROUP BY source, i),
        |sigs AS (SELECT source, list(mh ORDER BY i) AS sig FROM lane GROUP BY source)
        |SELECT a.source AS a_source, b.source AS b_source,
        |  CAST(len(list_filter(list_transform(range(1, 17),
        |         i -> a.sig[i] = b.sig[i]), m -> m)) AS DOUBLE) / 16 AS est_sim
        |FROM sigs a JOIN sigs b ON a.source < b.source""".stripMargin))

  /** d8: cross-document passage dedup — the corpus-level boilerplate-removal
    * pass of an LLM data pipeline: chunk every document into fixed 4-word
    * passages, keep each distinct passage only in its lowest-doc_id
    * occurrence, drop it everywhere else, and reassemble the surviving text
    * in original order.
    *
    * Scale design: passages are cut by SLICING the split array per row
    * (codegen'd, order-safe — no per-word explode of the corpus), so the
    * only shuffles are (1) the hash partition on the passage string for the
    * min-owner window and (2) the reassembly aggregation keyed on doc_id.
    * Both are linear in passage count; nothing is quadratic and no driver
    * state exists. At 100 TB the passage column would be dictionary-heavy —
    * hashing a 64-bit fingerprint of the passage instead of the string
    * halves the shuffle bytes (t4's rolling hash does exactly that), kept as
    * the plain string here so the oracle is byte-identical. */
  val d8PassageDedup: Q = Q.dualSql("d8_passage_dedup",
    sparkSql =
      """WITH passages AS (
        |  SELECT doc_id, pid,
        |    array_join(slice(split(text, ' '), pid * 4 + 1, 4), ' ') AS passage
        |  FROM documents
        |  LATERAL VIEW explode(sequence(0,
        |    CAST((size(split(text, ' ')) - 1) / 4 AS INT))) s AS pid
        |),
        |marked AS (
        |  SELECT doc_id, pid, passage,
        |    MIN(doc_id) OVER (PARTITION BY passage) AS keeper
        |  FROM passages
        |)
        |SELECT doc_id,
        |  count(CASE WHEN doc_id = keeper THEN 1 END) AS kept,
        |  count(CASE WHEN doc_id <> keeper THEN 1 END) AS dropped,
        |  COALESCE(array_join(transform(array_sort(
        |    collect_list(CASE WHEN doc_id = keeper THEN struct(pid, passage) END)),
        |    p -> p.passage), ' '), '') AS text_clean
        |FROM marked
        |GROUP BY doc_id""".stripMargin,
    duckSql =
      """WITH passages AS (
        |  SELECT doc_id, i - 1 AS pid,
        |    array_to_string(list_slice(string_split(text, ' '),
        |      (i - 1) * 4 + 1, (i - 1) * 4 + 4), ' ') AS passage
        |  FROM documents, generate_series(1, 128) g(i)
        |  WHERE i <= CAST(floor((len(string_split(text, ' ')) - 1) / 4) AS INT) + 1
        |),
        |marked AS (
        |  SELECT doc_id, pid, passage,
        |    MIN(doc_id) OVER (PARTITION BY passage) AS keeper
        |  FROM passages
        |)
        |SELECT doc_id,
        |  count(CASE WHEN doc_id = keeper THEN 1 END) AS kept,
        |  count(CASE WHEN doc_id <> keeper THEN 1 END) AS dropped,
        |  COALESCE(string_agg(CASE WHEN doc_id = keeper THEN passage END,
        |    ' ' ORDER BY pid), '') AS text_clean
        |FROM marked
        |GROUP BY doc_id""".stripMargin)

  /** d9: training-set decontamination — drop every training document
    * (source ≠ src0) sharing ANY 8-word shingle with the evaluation corpus
    * (source = src0). This is the n-gram-containment decontamination step a
    * training pipeline runs against its eval suites. Shape at scale: the
    * shingle explode is linear in corpus tokens; the containment test is a
    * semi join on the shingle hash — at 100 TB the eval side is tiny and
    * broadcasts, so the whole pass stays scan-bound with no large shuffle. */
  val d9Decontaminate: Q = Q.dualSql("d9_decontaminate",
    sparkSql =
      """WITH tok AS (SELECT doc_id, source, split(text, ' ') AS ws FROM documents),
        |sh AS (SELECT doc_id, source,
        |         explode(transform(sequence(1, greatest(size(ws) - 7, 1)),
        |                 i -> array_join(slice(ws, i, 8), ' '))) AS shingle
        |       FROM tok),
        |eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
        |dirty AS (SELECT DISTINCT s.doc_id
        |          FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
        |          WHERE s.source <> 'src0')
        |SELECT doc_id, source FROM documents
        |WHERE source <> 'src0'
        |  AND doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin,
    duckSql =
      """WITH tok AS (SELECT doc_id, source, string_split(text, ' ') AS ws
        |             FROM documents),
        |sh AS (SELECT doc_id, source,
        |         unnest(list_transform(range(1, greatest(len(ws) - 7, 1) + 1),
        |                i -> array_to_string(ws[i:i+7], ' '))) AS shingle
        |       FROM tok),
        |eval_sh AS (SELECT DISTINCT shingle FROM sh WHERE source = 'src0'),
        |dirty AS (SELECT DISTINCT s.doc_id
        |          FROM sh s JOIN eval_sh e ON s.shingle = e.shingle
        |          WHERE s.source <> 'src0')
        |SELECT doc_id, source FROM documents
        |WHERE source <> 'src0'
        |  AND doc_id NOT IN (SELECT doc_id FROM dirty)""".stripMargin)

  /** d10: edit-distance-verified near-dup pairs — candidates are generated
    * by a cheap equality bucket (24-char prefix: near-identical docs almost
    * always share their head) plus the |len(a)-len(b)| ≤ k lower bound,
    * then VERIFIED with levenshtein ≤ 5. The blocking-then-verify shape is
    * the classic fuzzy-dedup pipeline: the quadratic distance only ever
    * runs on surviving candidate pairs, never corpus-wide. The Spark side
    * pins that staging with a row-preserving optimizer barrier
    * (mapPartitions identity → SerializeFromObject, which predicates cannot
    * cross): without it Catalyst folds the levenshtein predicate INTO the
    * join condition, where it runs on every hash-bucket probe ahead of the
    * cheap guards (measured 7.4s → 1.1s at sf0.1). A LIMIT would also
    * barrier but silently truncates past its cap — this cannot drop rows.
    * Both engines implement unit-cost Levenshtein, so the distances
    * hash-match exactly. */
  val d10EditDistance: Q = Q("d10_edit_distance",
    (s, dir) => {
      Tables.registerAll(s, dir)
      val cand = s.sql(
        """SELECT a.doc_id AS a_id, c.doc_id AS b_id, a.text AS ta, c.text AS tb
          |FROM (SELECT doc_id, text, substring(text, 1, 24) AS pfx FROM documents) a
          |JOIN (SELECT doc_id, text, substring(text, 1, 24) AS pfx FROM documents) c
          |  ON a.pfx = c.pfx AND a.doc_id < c.doc_id
          | AND abs(length(a.text) - length(c.text)) <= 5""".stripMargin)
      // identity mapPartitions: a serialization fence on the (small,
      // blocking-pruned) candidate set only — the corpus-wide join above it
      // keeps whole-stage codegen
      val fenced = cand.mapPartitions(it => it)(
        org.apache.spark.sql.Encoders.row(cand.schema))
      fenced.createOrReplaceTempView("d10_cand")
      s.sql(
        """SELECT a_id, b_id, levenshtein(ta, tb) AS lev
          |FROM d10_cand WHERE levenshtein(ta, tb) <= 5""".stripMargin)
    },
    Some(
      """WITH b AS (SELECT doc_id, text, substring(text, 1, 24) AS pfx FROM documents),
        |cand AS (
        |  SELECT a.doc_id AS a_id, c.doc_id AS b_id, a.text AS ta, c.text AS tb
        |  FROM b a JOIN b c
        |    ON a.pfx = c.pfx AND a.doc_id < c.doc_id
        |   AND abs(length(a.text) - length(c.text)) <= 5)
        |SELECT a_id, b_id, levenshtein(ta, tb) AS lev
        |FROM cand
        |WHERE levenshtein(ta, tb) <= 5""".stripMargin))

  /** d12: INCREMENTAL dedup against a lake-resident signature index
    * ([[graft.dedup.SignatureStore]]) — the production path: the corpus
    * (even doc_ids) is fingerprinted ONCE into versioned `sigs` + `bands`
    * tables, then the new batch (odd doc_ids) is admitted/rejected purely
    * by joining the STORE — exact on checksum, near-dup on d3's 8-band LSH
    * with ≥8/16 signature-lane agreement (estimated Jaccard ≥ 0.5); the
    * corpus text is never re-read. Admitted docs append to the store, so
    * the next batch dedups against them too (second-session proof:
    * DedupIndexSpec). Oracle: DuckDB replays store+batch relationally with
    * the same md5-lane signatures as d3. */
  val d12IncrementalDedup: Q = Q(
    "d12_incremental_dedup",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val docs = Tables.table(spark, dir, "documents")
      val tmp = java.nio.file.Files.createTempDirectory("graft-d12-").toString
      graft.dedup.SignatureStore.build(spark, s"$tmp/ix",
        docs.filter("doc_id % 2 = 0"))
      PhaseClock.markServe("d12_incremental_dedup") // build above, per-batch admit below
      graft.dedup.SignatureStore.admit(spark, s"$tmp/ix",
        docs.filter("doc_id % 2 = 1"))
    },
    Some(
      s"""WITH sh_all AS ($duckShingles),
         |hm AS (
         |  SELECT doc_id, shingle,
         |    md5('0:' || shingle) || md5('1:' || shingle) ||
         |    md5('2:' || shingle) || md5('3:' || shingle) AS h
         |  FROM sh_all),
         |sigl AS (
         |  SELECT doc_id, i, min(substr(h, 1 + i * 8, 8)) AS mh
         |  FROM hm, (SELECT unnest(range(0, 16)) AS i) perms
         |  GROUP BY doc_id, i),
         |sigs AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM sigl GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b * 2 + 1:b * 2 + 2], ',')) AS bkey
         |  FROM sigs, (SELECT unnest(range(0, 8)) AS b) bs),
         |batch AS (SELECT doc_id, md5(text) AS checksum FROM documents WHERE doc_id % 2 = 1),
         |corpus AS (SELECT doc_id, md5(text) AS checksum FROM documents WHERE doc_id % 2 = 0),
         |exact AS (
         |  SELECT b.doc_id, min(c.doc_id) AS exact_of
         |  FROM batch b JOIN corpus c ON b.checksum = c.checksum
         |  GROUP BY b.doc_id),
         |cand AS (
         |  SELECT DISTINCT bb.doc_id AS doc_id, cb.doc_id AS s_id
         |  FROM bands bb JOIN bands cb ON bb.b = cb.b AND bb.bkey = cb.bkey
         |  WHERE bb.doc_id % 2 = 1 AND cb.doc_id % 2 = 0),
         |near AS (
         |  SELECT c.doc_id, min(c.s_id) AS near_of
         |  FROM cand c
         |  JOIN sigs sa ON sa.doc_id = c.doc_id
         |  JOIN sigs sb ON sb.doc_id = c.s_id
         |  WHERE list_sum(list_transform(range(1, 17),
         |          i -> CASE WHEN sa.sig[i] = sb.sig[i] THEN 1 ELSE 0 END)) >= 8
         |  GROUP BY c.doc_id)
         |SELECT b.doc_id,
         |  CASE WHEN e.exact_of IS NOT NULL THEN 'exact_dup'
         |       WHEN n.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'admitted' END AS verdict,
         |  coalesce(e.exact_of, n.near_of) AS dup_of
         |FROM batch b
         |LEFT JOIN exact e ON e.doc_id = b.doc_id
         |LEFT JOIN near n ON n.doc_id = b.doc_id""".stripMargin))

  /** d13: INCREMENTAL embedding near-dup admission against a lake-resident
    * IVF vector store ([[graft.dedup.VectorStore]]) — the vector-space
    * sibling of d12: centroids train ONCE on the corpus half (even
    * vec_ids, the deterministic seeded k-means the ANN index uses), the
    * corpus is stored partitioned by centroid, and the batch half (odd
    * vec_ids) is admitted by MULTI-PROBING its top-2 centroid partitions
    * (the FAISS nprobe dial — the runner-up probe catches near-dup pairs
    * straddling a centroid boundary, which a single-probe read never
    * compares) — near-dup iff a stored probed-bucket vector has rounded
    * cosine ≥ 0.45 (d5's verification rule), `dup_of` = the minimum such
    * stored id. Admitted vectors append to their top-1 partitions, so
    * later batches dedup against them too. Oracle: DuckDB replays the
    * training (exact integer Lloyd steps), the corpus assignment, and the
    * rank ≤ 2 probe relationally. */
  val d13IncrementalVecDedup: Q = Q(
    "d13_incremental_embedding_dedup",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val emb = Tables.table(spark, dir, "embeddings")
      val tmp = java.nio.file.Files.createTempDirectory("graft-d13-").toString
      graft.dedup.VectorStore.build(spark, s"$tmp/vx",
        emb.filter("vec_id % 2 = 0"))
      PhaseClock.markServe("d13_incremental_embedding_dedup") // build / admit split
      graft.dedup.VectorStore.admit(spark, s"$tmp/vx",
        emb.filter("vec_id % 2 = 1"))
    },
    Some(
      s"""WITH ${SimilarityQueries.duckAssignedFor("WHERE vec_id % 2 = 0")},
         |b AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
         |      WHERE vec_id % 2 = 1),
         |b_probed AS (
         |  SELECT vec_id, v, c_id FROM (
         |    SELECT b.vec_id, b.v, c.c_id,
         |      row_number() OVER (PARTITION BY b.vec_id
         |        ORDER BY round(${SimilarityQueries.duckCos("b.v", "c.cv")}, 6) DESC,
         |                 c.c_id) AS rk
         |    FROM b, cents c) t
         |  WHERE rk <= 2),
         |near AS (
         |  SELECT ba.vec_id, min(a.vec_id) AS near_of
         |  FROM b_probed ba JOIN assigned a ON a.c_id = ba.c_id
         |  WHERE round(${SimilarityQueries.duckCos("ba.v", "a.v")}, 6) >= 0.45
         |  GROUP BY ba.vec_id)
         |SELECT b.vec_id,
         |  CASE WHEN n.near_of IS NOT NULL THEN 'near_dup'
         |       ELSE 'admitted' END AS verdict,
         |  n.near_of AS dup_of
         |FROM b
         |LEFT JOIN near n ON n.vec_id = b.vec_id""".stripMargin))

  /** d14: shingle-CONTAINMENT dedup — the asymmetric signal Jaccard
    * cannot express: C(A→B) = |A∩B| / |A| fires when document A's shingle
    * set sits (almost) inside B's, catching quote-extraction and
    * doc-inside-doc duplication where the symmetric ratio is diluted by
    * the container's extra content (Broder's containment, the resemblance
    * paper's second measure). One directed row per (contained, container)
    * at C ≥ 0.9. Same two-shuffle inverted-index candidate machinery as
    * d2 (capped stop-shingle buckets, oracle-mirrored); the direction
    * split is a per-pair projection, free. (This corpus holds no proper
    * subset docs — every emitted pair is also a d2 near-dup — but the
    * operator's semantics are pinned by the oracle either way.) */
  val d14ContainmentDedup: Q = Q(
    "d14_containment_dedup",
    (spark, dir) => {
      val docs = Tables.table(spark, dir, "documents")
      val pairs = docs
        .select(col("doc_id"), expr(s"array_distinct($shinglesExpr)").as("sh"))
        .select(col("doc_id"), size(col("sh")).as("n"), explode(col("sh")).as("shingle"))
        .groupBy("shingle")
        .agg(sort_array(collect_list(struct(col("doc_id"), col("n")))).as("ds"))
        .filter(size(col("ds")) > 1 && size(col("ds")) <= MaxShingleBucket)
        .select(explode(expr(
          """flatten(transform(ds, (x, i) ->
            |  transform(slice(ds, i + 2, size(ds)), y ->
            |    struct(x.doc_id AS a_id, y.doc_id AS b_id, x.n AS na, y.n AS nb))))""".stripMargin))
          .as("p"))
        .groupBy(col("p.a_id").as("a_id"), col("p.b_id").as("b_id"),
          col("p.na").as("na"), col("p.nb").as("nb"))
        .agg(count(lit(1)).as("inter"))
      val aInB = pairs.filter(expr("CAST(inter AS DOUBLE) / na >= 0.9"))
        .select(col("a_id").as("contained_id"), col("b_id").as("container_id"),
          expr("round(CAST(inter AS DOUBLE) / na, 6)").as("containment"))
      val bInA = pairs.filter(expr("CAST(inter AS DOUBLE) / nb >= 0.9"))
        .select(col("b_id").as("contained_id"), col("a_id").as("container_id"),
          expr("round(CAST(inter AS DOUBLE) / nb, 6)").as("containment"))
      aInB.unionAll(bInA)
    },
    Some(
      s"""WITH shingles AS (SELECT DISTINCT doc_id, shingle FROM ($duckShingles) t),
         |counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
         |kept AS (SELECT shingle FROM shingles
         |         GROUP BY shingle HAVING count(*) BETWEEN 2 AND 1000),
         |pairs AS (
         |  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS inter
         |  FROM shingles a JOIN shingles b
         |    ON a.shingle = b.shingle AND a.doc_id < b.doc_id
         |  JOIN kept k ON k.shingle = a.shingle
         |  GROUP BY a.doc_id, b.doc_id),
         |sized AS (
         |  SELECT p.a_id, p.b_id, p.inter, ca.n AS na, cb.n AS nb
         |  FROM pairs p JOIN counts ca ON ca.doc_id = p.a_id
         |               JOIN counts cb ON cb.doc_id = p.b_id)
         |SELECT a_id AS contained_id, b_id AS container_id,
         |  round(CAST(inter AS DOUBLE) / na, 6) AS containment
         |FROM sized WHERE CAST(inter AS DOUBLE) / na >= 0.9
         |UNION ALL
         |SELECT b_id AS contained_id, a_id AS container_id,
         |  round(CAST(inter AS DOUBLE) / nb, 6) AS containment
         |FROM sized WHERE CAST(inter AS DOUBLE) / nb >= 0.9""".stripMargin))

  /** d15: FUZZY eval-set decontamination — d9 catches verbatim leakage
    * (exact 8-word shingle containment); this catches the paraphrased /
    * lightly-edited leakage exact matching misses: train docs whose
    * MinHash-LSH-bucketed candidates against the EVAL slice verify at
    * shingle-Jaccard ≥ 0.5. Scale shape: signatures computed ONCE over the
    * whole corpus (the d3 "write signatures" stage), candidates from a
    * band-bucket join where the eval side is tiny and BROADCAST (an eval
    * benchmark is thousands of docs; the corpus is the big side, never
    * self-joined), exact verification only on surviving candidates. Output
    * = (train_id, eval_id, jaccard) — the audit trail a decontamination
    * run must produce before dropping the train docs. */
  val d15FuzzyDecontamination: Q = Q(
    "d15_fuzzy_decontamination",
    (spark, dir) => {
      import org.apache.spark.sql.functions.broadcast
      val docs = Tables.table(spark, dir, "documents")
        .select(col("doc_id"), expr(shinglesExpr).as("sh"))
      graft.functions.GraftFunctions.registerAll(spark)
      val sigDf = docs.select(col("doc_id"), expr("minhash_sig(sh)").as("sig")).persist()
      sigDf.count()
      val bandRows = sigDf
        .select(col("doc_id"),
          explode(expr(graft.dedup.SignatureStore.BandKeysExpr)).as("bb"))
        .select(col("doc_id"), col("bb.band"), col("bb.bkey"))
      val evalBands = bandRows.filter("doc_id % 40 = 0")
        .toDF("eval_id", "band2", "bkey2")
      val cand = bandRows.filter("doc_id % 40 <> 0").toDF("train_id", "band", "bkey")
        .join(broadcast(evalBands),
          col("band") === col("band2") && col("bkey") === col("bkey2"))
        .select("train_id", "eval_id").distinct()
      val docSets = docs.select(col("doc_id"), expr("array_distinct(sh)").as("ds"))
      val out = cand
        .join(docSets.toDF("train_id", "dt"), "train_id")
        .join(broadcast(docSets.toDF("eval_id", "de").filter("eval_id % 40 = 0")), "eval_id")
        .withColumn("inter", expr("size(array_intersect(dt, de))"))
        .withColumn("jaccard", expr(
          "round(CAST(inter AS DOUBLE) / (size(dt) + size(de) - inter), 6)"))
        .filter(expr("CAST(inter AS DOUBLE) / (size(dt) + size(de) - inter) >= 0.5"))
        .select("train_id", "eval_id", "jaccard")
        .localCheckpoint(true)
      sigDf.unpersist()
      out
    },
    Some(
      s"""WITH sh_all AS ($duckShingles),
         |hm AS (
         |  SELECT doc_id, shingle,
         |    md5('0:' || shingle) || md5('1:' || shingle) ||
         |    md5('2:' || shingle) || md5('3:' || shingle) AS h
         |  FROM sh_all),
         |sig AS (
         |  SELECT doc_id, i, min(substr(h, 1 + i * 8, 8)) AS mh
         |  FROM hm, (SELECT unnest(range(0, 16)) AS i) perms
         |  GROUP BY doc_id, i),
         |sigs AS (SELECT doc_id, list(mh ORDER BY i) AS sig FROM sig GROUP BY doc_id),
         |bands AS (
         |  SELECT doc_id, b, md5(array_to_string(sig[b * 2 + 1:b * 2 + 2], ',')) AS bkey
         |  FROM sigs, (SELECT unnest(range(0, 8)) AS b) bs),
         |cand AS (
         |  SELECT DISTINCT t.doc_id AS train_id, e.doc_id AS eval_id
         |  FROM bands t JOIN bands e
         |    ON t.b = e.b AND t.bkey = e.bkey
         |   AND t.doc_id % 40 <> 0 AND e.doc_id % 40 = 0),
         |shingles AS (SELECT DISTINCT doc_id, shingle FROM sh_all),
         |counts AS (SELECT doc_id, count(*) AS n FROM shingles GROUP BY doc_id),
         |inter AS (
         |  SELECT c.train_id, c.eval_id, count(*) AS i
         |  FROM cand c
         |  JOIN shingles st ON st.doc_id = c.train_id
         |  JOIN shingles se ON se.doc_id = c.eval_id AND se.shingle = st.shingle
         |  GROUP BY c.train_id, c.eval_id)
         |SELECT train_id, eval_id,
         |  round(CAST(i AS DOUBLE) / (ct.n + ce.n - i), 6) AS jaccard
         |FROM inter
         |JOIN counts ct ON ct.doc_id = train_id
         |JOIN counts ce ON ce.doc_id = eval_id
         |WHERE CAST(i AS DOUBLE) / (ct.n + ce.n - i) >= 0.5""".stripMargin))

  /** d16: EXACT-SUBSTRING excision — the alignment-free complement of d8
    * (Lee et al. 2022's ExactSubstr dedup, the heavyweight pass of the
    * "Deduplicating Training Data" pipeline): a duplicated span of ≥ 8
    * words at ANY offset is kept only at its first corpus occurrence
    * (ordered by doc_id, then position — within-document repeats excise
    * too) and cut everywhere else; overlapping duplicated grams excise as
    * the UNION of their token positions, so a long shared span disappears
    * as one piece without any grid alignment (d8's fixed windows miss a
    * duplicated span that straddles passage boundaries).
    *
    * Scale shape: the overlapping 8-gram stream is O(total tokens) rows.
    * The occurrence accounting is a map-side-combinable
    * `GROUP BY gram → (count, min(first_key))` — NOT a window: a window
    * `PARTITION BY gram` must shuffle and SORT the full gram stream, so a
    * corpus-hot gram (a boilerplate header duplicated across millions of
    * docs) becomes one straggler task. The partial aggregate absorbs that
    * skew on the map side (each task contributes one row per local gram),
    * and the join back to the gram stream is a streaming hash join — no
    * per-partition sort, no window state. `(doc_id, pos)` is encoded as
    * one BIGINT `doc_id * 2^32 + pos` so `min()` picks the first corpus
    * occurrence identically in both engines (pos < 2^32 by construction).
    * Then one bounded explode of 8 positions per EXCISED occurrence
    * (duplication mass, not corpus mass), one join back on
    * (doc_id, position), one reassembly aggregation. Nothing quadratic,
    * no driver state. At 100 TB the gram column is the shuffle payload —
    * hash it to a 64-bit rolling fingerprint (t4's machinery) to cut the
    * bytes ~8×; kept as the plain string here so the oracle is
    * byte-identical (d8's same note). */
  private[graft] val d16SparkSql: String =
    """WITH toks AS (SELECT doc_id, split(text, ' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, pos, array_join(slice(w, pos, 8), ' ') AS gram
      |  FROM toks
      |  LATERAL VIEW explode(sequence(1, size(w) - 7)) s AS pos
      |  WHERE size(w) >= 8),
      |gstats AS (
      |  SELECT gram, count(*) AS cnt,
      |    min(doc_id * 4294967296 + pos) AS first_key
      |  FROM grams GROUP BY gram),
      |excised AS (
      |  SELECT g.doc_id, g.pos
      |  FROM grams g JOIN gstats s ON g.gram = s.gram
      |  WHERE s.cnt > 1 AND g.doc_id * 4294967296 + g.pos <> s.first_key),
      |covered AS (
      |  SELECT DISTINCT doc_id, p
      |  FROM excised
      |  LATERAL VIEW explode(sequence(pos, pos + 7)) e AS p),
      |tokpos AS (
      |  SELECT doc_id, p, element_at(w, p) AS tok
      |  FROM toks
      |  LATERAL VIEW explode(sequence(1, size(w))) t AS p)
      |SELECT t.doc_id,
      |  count(CASE WHEN c.p IS NULL THEN 1 END) AS kept,
      |  count(CASE WHEN c.p IS NOT NULL THEN 1 END) AS dropped,
      |  COALESCE(array_join(transform(array_sort(
      |    collect_list(CASE WHEN c.p IS NULL THEN struct(t.p, t.tok) END)),
      |    x -> x.tok), ' '), '') AS text_clean
      |FROM tokpos t
      |LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
      |GROUP BY t.doc_id""".stripMargin

  val d16ExactSubstring: Q = Q.dualSql("d16_exact_substring",
    sparkSql = d16SparkSql,
    duckSql =
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |grams AS (
        |  SELECT doc_id, i AS pos,
        |    array_to_string(list_slice(w, i, i + 7), ' ') AS gram
        |  FROM toks, LATERAL unnest(range(1, len(w) - 7 + 1)) s(i)
        |  WHERE len(w) >= 8),
        |gstats AS (
        |  SELECT gram, count(*) AS cnt,
        |    min(doc_id * 4294967296 + pos) AS first_key
        |  FROM grams GROUP BY gram),
        |excised AS (
        |  SELECT g.doc_id, g.pos
        |  FROM grams g JOIN gstats s ON g.gram = s.gram
        |  WHERE s.cnt > 1 AND g.doc_id * 4294967296 + g.pos <> s.first_key),
        |covered AS (
        |  SELECT DISTINCT doc_id, pos + j AS p
        |  FROM excised, LATERAL unnest(range(0, 8)) e(j)),
        |tokpos AS (
        |  SELECT doc_id, i AS p, w[i] AS tok
        |  FROM toks, LATERAL unnest(range(1, len(w) + 1)) t(i))
        |SELECT t.doc_id,
        |  count(CASE WHEN c.p IS NULL THEN 1 END) AS kept,
        |  count(CASE WHEN c.p IS NOT NULL THEN 1 END) AS dropped,
        |  COALESCE(string_agg(CASE WHEN c.p IS NULL THEN t.tok END,
        |    ' ' ORDER BY t.p), '') AS text_clean
        |FROM tokpos t
        |LEFT JOIN covered c ON t.doc_id = c.doc_id AND t.p = c.p
        |GROUP BY t.doc_id""".stripMargin)

  /** d17: SPLIT-LEAKAGE audit — near-duplicate pairs that straddle t14's
    * deterministic train/val/test split: the eval-integrity check every
    * training pipeline must run (a test document whose near-dup sits in
    * train inflates eval scores exactly like decontamination misses do;
    * Lee et al. 2022 measure this leakage directly). Pure composition of
    * two gated operators — d3's LSH-verified pairs × t14's hash split —
    * so the audit inherits both of their scale shapes: banded candidate
    * generation, one broadcast-sized split column join per side. */
  val d17SplitLeakage: Q = {
    val splitExprSpark =
      """CASE WHEN substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1)
        |          BETWEEN '0' AND 'b' THEN 'train'
        |     WHEN substring(md5(CAST(CAST(doc_id AS STRING) AS BINARY)), 1, 1)
        |          BETWEEN 'c' AND 'd' THEN 'val'
        |     ELSE 'test' END""".stripMargin
    Q(
      "d17_split_leakage",
      (spark, dir) => {
        val pairs = lshVerifiedPairs(spark, dir)
        val splits = Tables.table(spark, dir, "documents")
          .selectExpr("doc_id", s"$splitExprSpark AS split")
        pairs
          .join(splits.toDF("a_id", "split_a"), "a_id")
          .join(splits.toDF("b_id", "split_b"), "b_id")
          .filter(col("split_a") =!= col("split_b"))
          .select("a_id", "b_id", "split_a", "split_b", "jaccard")
      },
      Some(
        s"""WITH pairs AS (SELECT * FROM ($d3OracleSql) z),
           |splits AS (
           |  SELECT doc_id,
           |    CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           |              BETWEEN '0' AND 'b' THEN 'train'
           |         WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 1)
           |              BETWEEN 'c' AND 'd' THEN 'val'
           |         ELSE 'test' END AS split
           |  FROM documents)
           |SELECT p.a_id, p.b_id, sa.split AS split_a, sb.split AS split_b,
           |  p.jaccard
           |FROM pairs p
           |JOIN splits sa ON sa.doc_id = p.a_id
           |JOIN splits sb ON sb.doc_id = p.b_id
           |WHERE sa.split <> sb.split""".stripMargin))
  }

  /** d18: SEQUENCE PACKING — assign documents to fixed-token-budget packs
    * (256 tokens) by the greedy first-fit-by-arrival rule, the batch-prep
    * step every LLM pretraining pipeline runs (short documents concatenate
    * into one training sequence; padding waste is the metric). Exact
    * global first-fit is inherently serial, so this is the standard
    * distributed shape: hash documents into buckets, pack greedily WITHIN
    * each bucket (ordered by doc_id — arrival order), packs never cross
    * buckets. A document longer than the budget opens its own pack (the
    * greedy rule handles it with no special case).
    *
    * Scale: one shuffle (groupBy bucket), then a per-bucket O(bucket-size)
    * fold via the `aggregate` higher-order function — no window, no
    * iteration, no driver state; the assignment list stays inside the
    * bucket's row. Bucket count is the parallelism knob (fixed at 16 here
    * so the DuckDB oracle's recursive-CTE replay of the same greedy fold
    * stays shallow; at 100 TB it scales with corpus / target-pack-count).
    * The oracle replays the fold row by row per bucket — hash-exact. */
  val d18SequencePack: Q = Q.dualSql("d18_sequence_pack",
    sparkSql =
      """WITH toks AS (
        |  SELECT doc_id, CAST(size(split(text, ' ')) AS INT) AS n FROM documents),
        |b AS (SELECT doc_id, n, pmod(doc_id, 16) AS bucket FROM toks),
        |lists AS (
        |  SELECT bucket, array_sort(collect_list(struct(doc_id, n))) AS docs
        |  FROM b GROUP BY bucket),
        |packed AS (
        |  SELECT bucket,
        |    aggregate(docs,
        |      struct(CAST(0 AS INT) AS pack, CAST(0 AS INT) AS fill,
        |             CAST(array() AS ARRAY<STRUCT<doc_id: BIGINT, n: INT, pack: INT>>) AS out),
        |      (acc, d) -> IF(acc.fill + d.n > 256 AND acc.fill > 0,
        |        CAST(named_struct('pack', acc.pack + 1, 'fill', d.n,
        |               'out', concat(acc.out, array(named_struct(
        |                 'doc_id', d.doc_id, 'n', d.n, 'pack', acc.pack + 1))))
        |          AS STRUCT<pack: INT, fill: INT,
        |                    out: ARRAY<STRUCT<doc_id: BIGINT, n: INT, pack: INT>>>),
        |        CAST(named_struct('pack', acc.pack, 'fill', acc.fill + d.n,
        |               'out', concat(acc.out, array(named_struct(
        |                 'doc_id', d.doc_id, 'n', d.n, 'pack', acc.pack))))
        |          AS STRUCT<pack: INT, fill: INT,
        |                    out: ARRAY<STRUCT<doc_id: BIGINT, n: INT, pack: INT>>>)),
        |      acc -> acc.out) AS assigns
        |  FROM lists)
        |SELECT CAST(bucket AS BIGINT) AS bucket, a.doc_id,
        |  CAST(a.n AS BIGINT) AS n, CAST(a.pack AS BIGINT) AS pack
        |FROM packed LATERAL VIEW explode(assigns) e AS a""".stripMargin,
    duckSql =
      """WITH RECURSIVE toks AS (
        |  SELECT doc_id, len(string_split(text, ' ')) AS n FROM documents),
        |ord AS (
        |  SELECT doc_id % 16 AS bucket, doc_id, n,
        |    row_number() OVER (PARTITION BY doc_id % 16 ORDER BY doc_id) AS i
        |  FROM toks),
        |packrec AS (
        |  SELECT bucket, i, doc_id, n, 0 AS pack, n AS fill
        |  FROM ord WHERE i = 1
        |  UNION ALL
        |  SELECT o.bucket, o.i, o.doc_id, o.n,
        |    CASE WHEN p.fill + o.n > 256 THEN p.pack + 1 ELSE p.pack END,
        |    CASE WHEN p.fill + o.n > 256 THEN o.n ELSE p.fill + o.n END
        |  FROM packrec p JOIN ord o ON o.bucket = p.bucket AND o.i = p.i + 1)
        |SELECT CAST(bucket AS BIGINT) AS bucket, doc_id,
        |  CAST(n AS BIGINT) AS n, CAST(pack AS BIGINT) AS pack
        |FROM packrec""".stripMargin)

  /** d19: EXEMPLAR SELECTION — the retention decision after clustering:
    * within each near-dup cluster keep the HIGHEST-QUALITY document (t2's
    * quality score; doc_id breaks ties), not d6's min-id canonical — the
    * policy real pipelines want, since near-dup clusters usually contain
    * one clean original and several degraded copies, and keeping the
    * min-id one throws away quality for determinism. Output is the full
    * per-document decision list (doc_id, component, quality_score, kept) —
    * the artifact a downstream filter joins against.
    *
    * Pure composition of two gated operators (d6's components × t2's
    * quality), inheriting both scale shapes; the argmax adds one window
    * over the component key — bounded by cluster sizes, which LSH-verified
    * near-dup clusters keep small by construction (a giant cluster means
    * boilerplate, which d16/t19 handle upstream). */
  val d19ExemplarSelection: Q = {
    val qualityExpr =
      """round(least(size(split(text, ' ')) / 1e2, 1e0) * 4e-1
        |  + (1e0 - round(CAST(size(filter(split(text, ' '),
        |        w -> w IN ('the','a','of','is','to','in'))) AS DOUBLE)
        |      / size(split(text, ' ')), 6)) * 3e-1
        |  + least(round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
        |      / size(split(text, ' ')), 6) / 1e1, 1e0) * 3e-1, 6)"""
        .stripMargin.replace("\n", " ")
    Q(
      "d19_exemplar_selection",
      (spark, dir) => {
        val comp = components(spark, dir)
        val quality = Tables.table(spark, dir, "documents")
          .selectExpr("doc_id", s"$qualityExpr AS quality_score")
        import org.apache.spark.sql.expressions.Window
        comp.join(quality, "doc_id")
          .select(col("doc_id"), col("component"), col("quality_score"),
            (org.apache.spark.sql.functions.row_number().over(
              Window.partitionBy(col("component"))
                .orderBy(col("quality_score").desc, col("doc_id"))) === 1)
              .as("kept"))
      },
      Some(
        s"""WITH RECURSIVE
           |$d6CompCtes,
           |quality AS (
           |  SELECT doc_id,
           |    round(least(len(string_split(text, ' ')) / 1e2, 1e0) * 4e-1
           |      + (1e0 - round(CAST(len(list_filter(string_split(text, ' '),
           |            w -> w IN ('the','a','of','is','to','in'))) AS DOUBLE)
           |          / len(string_split(text, ' ')), 6)) * 3e-1
           |      + least(round(CAST(length(replace(text, ' ', '')) AS DOUBLE)
           |          / len(string_split(text, ' ')), 6) / 1e1, 1e0) * 3e-1, 6)
           |      AS quality_score
           |  FROM documents)
           |SELECT c.doc_id, c.component, q.quality_score,
           |  row_number() OVER (PARTITION BY c.component
           |    ORDER BY q.quality_score DESC, c.doc_id) = 1 AS kept
           |FROM comp c JOIN quality q ON q.doc_id = c.doc_id""".stripMargin))
  }

  val all: Seq[Q] = Seq(d1Exact, d2NgramJaccard, d3MinHashLsh, d4SimHash,
    d6DedupClusters, d7CollectionMinHash, d8PassageDedup, d9Decontaminate,
    d10EditDistance, d12IncrementalDedup, d13IncrementalVecDedup,
    d14ContainmentDedup, d15FuzzyDecontamination, d16ExactSubstring,
    d17SplitLeakage, d18SequencePack, d19ExemplarSelection)
}
