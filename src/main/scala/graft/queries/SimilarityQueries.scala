package graft.queries

import graft.functions.VectorFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity search + embedding-space dedup over the `embeddings` table
  * (`Array[Float]`, dim=64 — north-star extensions, SURVEY.md §2.12).
  *
  * s1 is the brute-force cosine top-k baseline: broadcast the query vector,
  * one map pass computing the dot product with a sequential higher-order fold
  * (graft.functions.VectorFunctions — codegen'd, no UDF), then
  * TakeOrderedAndProject for the top-k (no global sort shuffle). At 100 TB
  * this is the scan-bound exact path.
  *
  * s2 is the IVF (inverted-file) scale path: partition vectors by nearest
  * centroid (trained by deterministic seeded k-means — see `trainedCents`),
  * store bucketed by centroid, probe only the nearest `n_probe` centroid
  * buckets at query time — turning top-k from a full scan into a pruned
  * partition read. The bucketing shuffle happens once at write.
  *
  * d5 is embedding-cosine near-dup detection on the same IVF buckets:
  * candidate pairs are generated only WITHIN a centroid bucket (linear-ish,
  * never global all-pairs), then verified by exact cosine ≥ 0.45 — the
  * vector-space sibling of the MinHash-LSH pipeline in DedupQueries.
  *
  * Cross-engine exactness: dot products are double-precision sums over 64
  * terms ordered identically (sequential fold both engines), and every
  * similarity that is compared/ordered is first `round(..., 6)` so the two
  * engines rank identically.
  */
object SimilarityQueries {

  /** cosine in DuckDB (list_sum over in-order transform = same fold). */
  private[queries] def duckCos(a: String, b: String): String =
    s"""list_sum(list_transform(range(1, 65), i -> $a[i] * $b[i]))
       | / (sqrt(list_sum(list_transform(range(1, 65), i -> $a[i] * $a[i])))
       |    * sqrt(list_sum(list_transform(range(1, 65), i -> $b[i] * $b[i]))))""".stripMargin

  private[graft] def vectors(spark: SparkSession, dir: String): DataFrame =
    Tables.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("label"), col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", l2Norm(col("v"))) // norm once per vector, reused per pair

  /** Assign every vector to its nearest centroid, rounded-sim ranking with
    * centroid-id tiebreak.
    *
    * Shuffle shape (the 100 TB concern): the winner is picked with a
    * map-side-combinable `max_by` over the SLIM (vec_id, c_id, csim)
    * projection — the vector arrays do NOT ride through the ×#centroids
    * cross-join into a shuffle (the previous window formulation shuffled
    * every 64-double array once per centroid). The arrays are re-attached by
    * one equi-join against the winners table, so they cross the wire exactly
    * once. `max_by` on struct(csim, -c_id) = highest similarity, then lowest
    * centroid id — identical to the window's (csim DESC, c_id ASC). */
  private[graft] def assignTo(e: DataFrame, cents: DataFrame): DataFrame = {
    val best = e.crossJoin(broadcast(cents))
      .withColumn("csim", cosineWithNorms6(col("v"), col("nv"), col("cv"), col("ncv")))
      .select(col("vec_id").as("b_vec"), col("c_id"), col("csim"))
      .groupBy(col("b_vec"))
      .agg(expr("max_by(c_id, struct(csim, -c_id))").as("c_id"))
    e.join(best, col("vec_id") === col("b_vec"))
      .select(col("vec_id"), col("label"), col("v"), col("nv"), col("c_id"))
  }

  /** Lloyd centroid update in EXACT integer space: per (cluster, dimension),
    * sum `round(x·10⁶)` as BIGINT — order-independent (so map-side
    * combinable and identical across engines, unlike a float mean whose
    * value depends on partial-aggregation order) — then re-assemble the 64
    * sums into the centroid array. The sum is NOT divided by the member
    * count: cosine similarity is scale-invariant, so the un-normalized sum
    * points exactly where the mean does, and skipping the division keeps
    * the arithmetic closed over integers. The explode is a slim
    * (c_id, i, x) stream — vectors never shuffle whole. */
  private def centUpdate(a: DataFrame): DataFrame =
    // ONE map-side-combinable shuffle of one dim-slot row per centroid via
    // the vec_sum_u6 aggregate (identical Σ round(x·10⁶) BIGINT math) —
    // the previous posexplode spelling shuffled dim × N exploded rows
    // through two aggregations and a collect_list re-assembly
    a.groupBy(col("c_id"))
      .agg(expr("vec_sum_u6(v)").as("ss"))
      .select(col("c_id"), expr("transform(ss, s -> CAST(s AS DOUBLE))").as("cv"))
      .withColumn("ncv", l2Norm(col("cv")))

  private val KmeansIters = 2

  /** Target rows per IVF cluster: the seed modulus is
    * `max(25, N / TargetClusterRows)`, so the CLUSTER COUNT is
    * `N / modulus = min(N / 25, TargetClusterRows)` — it grows linearly
    * with the corpus up to a ceiling of 100k clusters (the SemDeDup
    * operating range), then cluster SIZE absorbs further growth.
    *
    * Bucket cost model (d5/d11): the within-cluster pair join costs
    * O(N × clusterSize) comparisons. Below the ceiling clusterSize ≈ 25 →
    * linear in N; above it clusterSize = N/100k, so a 10^10-vector corpus
    * pays 10^10 × 10^5 pairwise cosines spread over 100k independent
    * buckets — parallel and bounded per task, where a single global
    * all-pairs join (10^20) is not runnable at all. The broadcast of the
    * centroid table in [[assignTo]] stays ≤ 100k × 64 doubles ≈ 50 MB —
    * broadcastable, which an unbounded N/25 cluster count is not. */
  private val TargetClusterRows = 100000L

  private[graft] def seedModulus(n: Long): Long = math.max(25L, n / TargetClusterRows)

  /** Deterministic seeded k-means: init from the `vec_id % m = 0` subset
    * (m = [[seedModulus]] of the corpus count), then [[KmeansIters]] Lloyd
    * iterations (assign by rounded cosine, update via [[centUpdate]]'s
    * exact integer sums). Called ONLY from the one-time offline build in
    * [[indexRoot]]; consumers read the stored artifact. Cluster identity
    * is the seed vector's id. */
  private[graft] def trainedCents(spark: SparkSession, e: DataFrame, m: Long): DataFrame = {
    var c = e.filter(col("vec_id") % m === 0)
      .select(col("vec_id").as("c_id"), col("v").as("cv"), col("nv").as("ncv"))
    // checkpoint each iteration, not just the last: every Lloyd step's
    // plan embeds the previous step's plan several times (the centroids
    // feed the assignment cross-join AND the winner join-back), so the
    // logical tree — and with it analysis, cache-lookup canonicalization,
    // and codegen — grows geometrically with the iteration count. The
    // centroid frame is tiny (≤ corpus/seedModulus rows), so cutting
    // lineage eagerly costs one small job per step and keeps planning
    // O(step). Measured: m6's build dropped 15.3 s → per-step-bounded.
    for (_ <- 1 to KmeansIters) c = centUpdate(assignTo(e, c)).localCheckpoint(true)
    c
  }

  /** The stored ANN index — LAKE-RESIDENT and VERSIONED: three
    * [[graft.table.VersionedTable]]s under one per-corpus root — `cents`
    * (c_id, cv, ncv), `assigned` (the corpus PARTITIONED BY nearest
    * centroid: the physical inverted-file layout, so a probe of n_probe
    * centroids is a partition-pruned read), and `srp` (the corpus
    * partitioned by 8-bit SRP signature for s3's multi-probe reads).
    *
    * This is the reference's "state lives in the lake" idiom
    * (scd2-job.ipynb:163-172 — write once, later jobs consume the table):
    * a SECOND driver process finds the committed tables, verifies them
    * against the corpus, and serves WITHOUT retraining. Staleness is
    * DETECTED, never silently served: the build records the corpus
    * fingerprint (file names + sizes + mtimes of the embeddings source) in
    * the cents table's properties; every consumer re-fingerprints the
    * corpus (one directory stat — metadata-plane) and a mismatch triggers
    * a rebuild, which commits NEW VERSIONS of the three tables (the old
    * index stays time-travelable, exactly like any other lake table).
    *
    * The root defaults to a stable per-corpus directory under the JVM temp
    * root and is overridable with `spark.graft.index.root` — on a real
    * deployment that points into the lake next to the corpus. */
  private def indexLakeRoot(spark: SparkSession, dir: String): String = {
    val base = spark.conf.getOption("spark.graft.index.root")
      .getOrElse(System.getProperty("java.io.tmpdir") + "/graft-index")
    val key = java.security.MessageDigest.getInstance("MD5")
      .digest(java.nio.file.Paths.get(dir).toAbsolutePath.toString.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.take(16)
    s"$base/$key"
  }

  /** Fingerprint of the embeddings source: (name, size, mtime) of the
    * parquet file — or every file of the parquet directory — hashed.
    * Metadata-plane only; no data read. */
  private def corpusFingerprint(dir: String): String =
    fileFingerprint(java.nio.file.Paths.get(dir, "embeddings.parquet"))

  /** Fingerprint of the documents source — gates the BM25 text index the
    * same way [[corpusFingerprint]] gates the vector index. */
  private def docsFingerprint(dir: String): String =
    fileFingerprint(java.nio.file.Paths.get(dir, "documents.parquet"))

  private def fileFingerprint(p: java.nio.file.Path): String = {
    import scala.jdk.CollectionConverters._
    val entries: Seq[String] =
      if (java.nio.file.Files.isDirectory(p)) {
        val s = java.nio.file.Files.list(p)
        try s.iterator().asScala
          .filter(java.nio.file.Files.isRegularFile(_))
          .map(f => s"${f.getFileName}:${java.nio.file.Files.size(f)}:" +
            java.nio.file.Files.getLastModifiedTime(f).toMillis)
          .toSeq.sorted
        finally s.close()
      } else Seq(s"${p.getFileName}:${java.nio.file.Files.size(p)}:" +
        java.nio.file.Files.getLastModifiedTime(p).toMillis)
    java.security.MessageDigest.getInstance("MD5")
      .digest(entries.mkString("|").getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
  }

  /** JVM fast path only: corpus roots whose stored index this process has
    * already VERIFIED fresh (root -> fingerprint at verification). Never a
    * source of truth — the fingerprint is recomputed per call, so an
    * in-place corpus update is still detected; a fresh process verifies
    * against the stored properties and serves without retraining. */
  private val verifiedFresh =
    new java.util.concurrent.ConcurrentHashMap[String, String]()

  /** Test hook: forget JVM verifications, forcing the next consumer down
    * the stored-properties verification path (what a new process does). */
  private[graft] def resetIndexCache(): Unit = verifiedFresh.clear()

  private def indexRoot(spark: SparkSession, dir: String): String = {
    val root = indexLakeRoot(spark, dir)
    val fp = corpusFingerprint(dir)
    if (verifiedFresh.get(root) == fp) return root
    this.synchronized {
      if (verifiedFresh.get(root) == fp) return root
      val cents = graft.table.VersionedTable(s"$root/cents")
      // indexFormat gates layout revisions: an index built by an older
      // engine (no PQ stores) re-builds once instead of serving a shape
      // this code no longer expects
      val fresh = graft.table.VersionedTable.exists(s"$root/cents") &&
        cents.properties.get("corpusFingerprint").contains(fp) &&
        cents.properties.get("indexFormat").contains("2")
      if (!fresh) {
        // the SRP signature expression needs the engine's SQL functions on
        // the session (vec_dot); idempotent when the extensions already
        // injected them
        graft.functions.GraftFunctions.registerAll(spark)
        // the build legitimately re-reads the corpus (count + each Lloyd
        // iteration + both store writes): cache the normalized vectors for
        // the build's scope so the parquet decode + per-row norm fold run
        // once. MEMORY_AND_DISK — a corpus bigger than executor memory
        // spills instead of recomputing five times.
        val vecs = vectors(spark, dir)
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        // label the build segments (guide §1.5) so a cold-build profile
        // attributes its jobs; thread-local, cleared at the end
        def phase[T](name: String)(body: => T): T = {
          spark.sparkContext.setJobDescription(s"ivf-build: $name")
          try body finally spark.sparkContext.setJobDescription(null)
        }
        try {
          val n = phase("count")(vecs.count())
          val m = seedModulus(n)
          // co-locate each partition value in one task before the partitioned
          // commits: the default layout would emit (tasks × values) tiny files
          phase("kmeans+cents")(graft.table.VersionedTable(s"$root/cents")
            .commit(trainedCents(spark, vecs, m).coalesce(1)))
          val centsDf = graft.table.VersionedTable(s"$root/cents").read(spark)
          // collectStats = false: both stores are read ONLY through manifest
          // partition pruning (probed centroid / signature values), never by
          // per-file min/max skipping — the stats pass would re-scan the full
          // corpus per store for bounds nothing consumes
          // pin the assignment once: the assigned commit AND the codes
          // commit below both consume it — reading the assigned TABLE back
          // for the codes join re-paid a listing + scan for rows this
          // build just computed (localCheckpoint = one small job; the
          // frame is (corpus × 5 slim columns))
          val assignedDf = phase("assign")(
            assignTo(vecs, centsDf).localCheckpoint(true))
          phase("assigned")(graft.table.VersionedTable(s"$root/assigned").commit(
            assignedDf.repartition(col("c_id")),
            partitionBy = Seq("c_id"), collectStats = false))
          phase("srp")(graft.table.VersionedTable(s"$root/srp").commit(
            vecs.withColumn("bucket", expr(srpBucketSpark))
              .repartition(col("bucket")),
            partitionBy = Seq("bucket"), collectStats = false))
          // the PQ half of the index: 128-row per-subspace codebooks plus
          // the 8-codes-per-vector encoding, stored in the SAME inverted
          // IVF layout as `assigned` so an s8 probe reads only the probed
          // centroids' CODES (8 ints/vector — 32× less I/O than the floats)
          val pqCents = phase("pq-train")(trainPqCents(spark, vecs))
          phase("pq-cents")(
            graft.table.VersionedTable(s"$root/pq_cents").commit(pqCents.coalesce(1)))
          phase("codes")(graft.table.VersionedTable(s"$root/codes").commit(
            pqEncode(pqSubvectors(vecs), pqCents)
              .join(assignedDf.select("vec_id", "label", "c_id"), "vec_id")
              .repartition(col("c_id")),
            partitionBy = Seq("c_id"), collectStats = false))
          // properties last: a half-built index is never marked fresh
          cents.setProperties(Map(
            "corpusFingerprint" -> fp,
            "corpusPath" -> java.nio.file.Paths.get(dir).toAbsolutePath.toString,
            "corpusRows" -> n.toString,
            "seedModulus" -> m.toString,
            "indexFormat" -> "2"))
        } finally vecs.unpersist()
      }
      verifiedFresh.put(root, fp)
      root
    }
  }

  /** Product-quantization geometry: 64 dims split into [[PqSubs]] contiguous
    * 8-dim subspaces, each quantized against its own [[PqK]]-centroid
    * codebook (trained below). 8 one-byte codes per vector — 32× smaller
    * than float64, the standard 100 TB ANN storage layout (Jégou et al.,
    * "Product Quantization for Nearest Neighbor Search", TPAMI 2011). */
  private val PqSubs = 8
  private val PqDim = 8
  private val PqK = 16

  /** (vec_id, sub, sv): the corpus split into per-subspace 8-dim slices —
    * a slim posexplode stream, vectors never duplicated whole. */
  private def pqSubvectors(e: DataFrame): DataFrame =
    e.select(col("vec_id"),
        posexplode(expr(s"transform(sequence(0, ${PqSubs - 1}), s -> slice(v, s * $PqDim + 1, $PqDim))"))
          .as(Seq("sub", "sv")))

  /** Squared L2 distance between two [[PqDim]]-arrays as an identically
    * ordered sequential fold (cross-engine exact), rounded to 6dp. */
  private def pqD2(a: String, b: String): String =
    s"round(aggregate(zip_with($a, $b, (x, y) -> (x - y) * (x - y)), 0D, (s, t) -> s + t), 6)"

  /** One Lloyd step per subspace, all [[PqSubs]] trained in the SAME two
    * shuffles: assign every subvector to its nearest codebook centroid
    * (min_by on (d2, c_id) — lowest distance, then lowest id), then update
    * each centroid as the exact-integer dimension means (`Σ round(x·10⁶)`
    * BIGINT / n / 10⁶ — IEEE double division of identical integers is
    * identical across engines). */
  private def pqAssign(sv: DataFrame, cents: DataFrame): DataFrame =
    sv.join(broadcast(cents.select(col("sub").as("c_sub"), col("c_id"), col("cv"))),
        col("sub") === col("c_sub"))
      // native vec_l2sq — bit-identical to [[pqD2]]'s fold, codegen'd
      .withColumn("d2", round(graft.functions.VectorFunctions.l2sq(col("sv"), col("cv")), 6))
      .groupBy(col("vec_id"), col("sub"))
      .agg(expr("min_by(c_id, struct(d2, c_id))").as("c_id"),
        first(col("sv")).as("sv"))

  private def pqCentUpdate(a: DataFrame): DataFrame =
    a.select(col("sub"), col("c_id"), posexplode(col("sv")).as(Seq("i", "x")))
      .groupBy(col("sub"), col("c_id"), col("i"))
      .agg(sum(expr("CAST(round(x * 1000000) AS BIGINT)")).as("s"),
        count(lit(1)).as("n"))
      .groupBy(col("sub"), col("c_id"))
      .agg(sort_array(collect_list(struct(col("i"), col("s"), col("n")))).as("ps"))
      .select(col("sub"), col("c_id"),
        expr("transform(ps, p -> CAST(p.s AS DOUBLE) / p.n / 1000000)").as("cv"))

  /** Deterministic per-subspace codebooks: seeds are the subvectors of
    * `vec_id < PqK` (every corpus holds ≥ 16 vectors), then [[KmeansIters]]
    * Lloyd steps. 128 rows total — driver-light, broadcast everywhere. */
  private def trainPqCents(spark: SparkSession, e: DataFrame): DataFrame = {
    val sv = pqSubvectors(e)
    var c = sv.filter(col("vec_id") < PqK)
      .select(col("sub"), col("vec_id").as("c_id"), col("sv").as("cv"))
    for (_ <- 1 to KmeansIters) c = pqCentUpdate(pqAssign(sv, c))
    c.localCheckpoint(true)
  }

  /** PQ-encode the corpus against trained codebooks: final nearest-centroid
    * assignment per subspace, folded to one `codes` array (code of sub s at
    * position s+1). Only the 8 small codes ride per vector. */
  private def pqEncode(sv: DataFrame, cents: DataFrame): DataFrame =
    pqAssign(sv, cents)
      .groupBy(col("vec_id"))
      .agg(sort_array(collect_list(struct(col("sub"), col("c_id")))).as("ps"))
      .select(col("vec_id"), expr("transform(ps, p -> CAST(p.c_id AS INT))").as("codes"))

  /** Force the offline index build/verification; returns seconds spent
    * (near 0 if the stored index is fresh). Bench calls this in warmup so
    * per-query timings measure serving. */
  def buildIndex(spark: SparkSession, dir: String): Double = {
    val t0 = System.nanoTime()
    indexRoot(spark, dir)
    (System.nanoTime() - t0) / 1e9
  }

  /** Delete the stored index and rebuild from scratch, returning seconds —
    * the one-time training cost as its own TRACKED number. Persistence
    * across processes means a later warm [[buildIndex]] is ~0.03 s, which
    * is the point of the lake-resident index — but if only the warm number
    * were ever recorded, a regression in the build itself would be
    * invisible (Bench emits both `ivf_build_cold` and `ivf_build`). */
  def buildIndexCold(spark: SparkSession, dir: String): Double = {
    val root = java.nio.file.Paths.get(indexLakeRoot(spark, dir))
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally s.close()
    }
    resetIndexCache()
    buildIndex(spark, dir)
  }

  /** Bench hooks for the BM25 text index — the same cold/warm recording
    * discipline as [[buildIndexCold]]/[[buildIndex]]: the one-time
    * tokenize-and-layout cost stays a tracked number, the warm
    * fingerprint-verify is what every later process pays. (The ivf cold
    * wipe clears the shared lake root including `/text`, so Bench rebuilds
    * and records the text index right after it.) */
  def buildTextIndex(spark: SparkSession, dir: String): Double = {
    val t0 = System.nanoTime()
    textIndexRoot(spark, dir)
    (System.nanoTime() - t0) / 1e9
  }

  def buildTextIndexCold(spark: SparkSession, dir: String): Double = {
    val root = java.nio.file.Paths.get(indexLakeRoot(spark, dir) + "/text")
    if (java.nio.file.Files.isDirectory(root)) {
      val s = java.nio.file.Files.walk(root)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(p => { java.nio.file.Files.deleteIfExists(p); () })
      finally s.close()
    }
    verifiedFresh.remove(indexLakeRoot(spark, dir) + "/text")
    buildTextIndex(spark, dir)
  }

  private def storedCents(spark: SparkSession, dir: String): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/cents").read(spark)

  /** The stored corpus in IVF layout (manifest-recorded schema: `c_id`
    * keeps its committed BIGINT type — no partition-dir inference). */
  private def storedAssigned(spark: SparkSession, dir: String): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/assigned").read(spark)
      .select("vec_id", "label", "v", "nv", "c_id")

  /** Partition-pruned probe of the IVF store: only the probed centroids'
    * files are listed or read (manifest partition pruning). */
  private def storedAssignedProbed(spark: SparkSession, dir: String,
      probes: Seq[Long]): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/assigned")
      .readPartitioned(spark, s"c_id IN (${probes.mkString(", ")})")._1
      .select("vec_id", "label", "v", "nv", "c_id")

  private def storedPqCents(spark: SparkSession, dir: String): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/pq_cents").read(spark)

  /** The stored PQ codes in IVF layout, partition-pruned to the probed
    * centroids — the ONLY per-vector payload an s8 probe scans. */
  private def storedCodesProbed(spark: SparkSession, dir: String,
      probes: Seq[Long]): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/codes")
      .readPartitioned(spark, s"c_id IN (${probes.mkString(", ")})")._1
      .select("vec_id", "label", "codes", "c_id")

  /** The stored SRP-bucketed corpus, partition-pruned to `buckets`. */
  private def storedSrpProbed(spark: SparkSession, dir: String,
      buckets: Seq[Long]): DataFrame =
    graft.table.VersionedTable(s"${indexRoot(spark, dir)}/srp")
      .readPartitioned(spark, s"bucket IN (${buckets.mkString(", ")})")._1
      .select("vec_id", "label", "v", "nv", "bucket")

  /** The 4 probe-centroid ids nearest the query vector. Collecting them is
    * a BOUNDED driver fetch (n_probe rows of one BIGINT — the serving path
    * of every real IVF index does exactly this) and turns the probe into a
    * static `c_id IN (...)` filter, i.e. partition pruning on the store:
    * only the probed directories are read at all. */
  private def probeIds(spark: SparkSession, dir: String, queryVecId: Long,
                       nProbe: Int): Seq[Long] = {
    val e = vectors(spark, dir)
    val q = e.filter(col("vec_id") === queryVecId)
      .select(col("v").as("qv"), col("nv").as("nqv"))
    storedCents(spark, dir).crossJoin(broadcast(q))
      .withColumn("qsim", cosineWithNorms6(col("cv"), col("ncv"), col("qv"), col("nqv")))
      .orderBy(col("qsim").desc, col("c_id")).limit(nProbe)
      .select("c_id").collect().map(_.getLong(0)).toSeq
  }

  /** DuckDB CTEs mirroring the k-means training + final assignment: `c0` is
    * the seed subset, `a{t}`/`c{t}` the Lloyd iterations (same round-6
    * cosine ranking, same exact BIGINT dimension sums), `cents`/`assigned`
    * the trained index every consumer query reads. The seed modulus is
    * derived IN-QUERY from the corpus count — `GREATEST(25, COUNT(*) //
    * 100000)`, the exact SQL image of [[seedModulus]] — so the oracle
    * tracks the engine at every scale factor with a static query text. */
  /** Training + assignment replay over a filtered embeddings slice —
    * parameterized so the d13 incremental-admission oracle can train on
    * the corpus half only (`vec_id % 2 = 0`). */
  private[graft] def duckAssignedFor(where: String): String =
    duckAssignedFromE(
      s"e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings $where)")

  /** Training + assignment replay over an ARBITRARY corpus CTE: `eDef`
    * must define `e(vec_id, label, v DOUBLE[64])` — the m6 oracle feeds
    * derived media embeddings through the same k-means replay the d13
    * oracle runs over the embeddings table. `assignFrom` lets the FINAL
    * assignment run over a DIFFERENT corpus CTE (also defined inside
    * `eDef`) than the one that trained the centroids — the shape a synced
    * store has: centroids from the build snapshot, rows from the current
    * table (q131). */
  private[graft] def duckAssignedFromE(eDef: String,
      assignFrom: String = "e"): String = {
    val init =
      s"""$eDef,
         |params AS (SELECT GREATEST(25, COUNT(*) // $TargetClusterRows) AS m FROM e),
         |c0 AS (SELECT vec_id AS c_id, v AS cv FROM e
         |       WHERE vec_id % (SELECT m FROM params) = 0)""".stripMargin
    val iters = (1 to KmeansIters).map { t =>
      s"""a$t AS (
         |  SELECT vec_id, v, c_id FROM (
         |    SELECT e.vec_id, e.v, c.c_id,
         |      row_number() OVER (
         |        PARTITION BY e.vec_id
         |        ORDER BY round(${duckCos("e.v", "c.cv")}, 6) DESC, c.c_id) AS rk
         |    FROM e, c${t - 1} c) t
         |  WHERE rk = 1),
         |c$t AS (
         |  SELECT c_id, list(CAST(s AS DOUBLE) ORDER BY i) AS cv FROM (
         |    SELECT a.c_id, r.i, SUM(CAST(round(a.v[r.i] * 1000000) AS BIGINT)) AS s
         |    FROM a$t a, range(1, 65) r(i)
         |    GROUP BY a.c_id, r.i) u
         |  GROUP BY c_id)""".stripMargin
    }
    val fin =
      s"""cents AS (SELECT c_id, cv FROM c$KmeansIters),
         |assigned AS (
         |  SELECT vec_id, label, v, c_id FROM (
         |    SELECT e.vec_id, e.label, e.v, c.c_id,
         |      row_number() OVER (
         |        PARTITION BY e.vec_id
         |        ORDER BY round(${duckCos("e.v", "c.cv")}, 6) DESC, c.c_id) AS rk
         |    FROM $assignFrom e, cents c) t
         |  WHERE rk = 1)""".stripMargin
    (Seq(init) ++ iters ++ Seq(fin)).mkString(",\n")
  }

  private val duckAssigned: String = duckAssignedFor("")

  /** s1: brute-force cosine top-10 neighbours of the vec_id=0 vector. */
  val s1CosineTopK: Q = Q(
    "s1_cosine_topk",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 0).select(col("v").as("qv"), col("nv").as("nqv"))
      e.crossJoin(broadcast(q))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "sim")
    },
    Some(
      s"""WITH q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 0),
         |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings)
         |SELECT vec_id, label, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM e, q
         |ORDER BY sim DESC, vec_id
         |LIMIT 10""".stripMargin))

  /** s2: IVF-style ANN — probe the 4 centroids nearest the query (vec_id=1),
    * exact top-10 within the probed buckets. */
  val s2AnnIvf: Q = Q(
    "s2_ann_ivf",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 1).select(col("v").as("qv"), col("nv").as("nqv"))
      val probes = probeIds(spark, dir, queryVecId = 1, nProbe = 4)
      storedAssignedProbed(spark, dir, probes)
        .crossJoin(broadcast(q))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "c_id", "sim")
    },
    Some(
      s"""WITH $duckAssigned,
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 1),
         |probed AS (
         |  SELECT c_id AS probe_c
         |  FROM cents, q
         |  ORDER BY round(${duckCos("cv", "qv")}, 6) DESC, c_id
         |  LIMIT 4)
         |SELECT vec_id, label, c_id, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM assigned JOIN probed ON c_id = probe_c, q
         |ORDER BY sim DESC, vec_id
         |LIMIT 10""".stripMargin))

  /** d5: embedding-cosine near-dup pairs — candidates within IVF buckets,
    * verified at cosine ≥ 0.45 (rounded). */
  val d5EmbeddingNearDup: Q = Q(
    "d5_embedding_neardup",
    (spark, dir) => {
      val a = storedAssigned(spark, dir)
      val left = a.select(col("c_id"), col("vec_id").as("a_id"),
        col("v").as("va"), col("nv").as("na"))
      val right = a.select(col("c_id").as("c_id2"), col("vec_id").as("b_id"),
        col("v").as("vb"), col("nv").as("nb"))
      left.join(right, col("c_id") === col("c_id2") && col("a_id") < col("b_id"))
        .withColumn("sim", cosineWithNorms6(col("va"), col("na"), col("vb"), col("nb")))
        .filter(col("sim") >= 0.45)
        .select("a_id", "b_id", "c_id", "sim")
    },
    Some(
      s"""WITH $duckAssigned
         |SELECT a.vec_id AS a_id, b.vec_id AS b_id, a.c_id,
         |  round(${duckCos("a.v", "b.v")}, 6) AS sim
         |FROM assigned a JOIN assigned b
         |  ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         |WHERE round(${duckCos("a.v", "b.v")}, 6) >= 0.45""".stripMargin))

  /** Deterministic ±1 signed-random-projection hyperplanes (Charikar SRP):
    * sign(p, j) from the parity of the first hex digit of md5("p:j") — a
    * shared constant both engines embed as a literal, so bucket assignment
    * is bit-identical with zero per-row hashing cost. */
  private val srpPlanes: Seq[Seq[Int]] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Seq.tabulate(8, 64) { (p, j) =>
      val d = md.digest(s"$p:$j".getBytes("UTF-8"))
      if (((d(0) >> 4) & 0x1) == 0) 1 else -1
    }
  }
  private val srpSparkLit =
    srpPlanes.map(r => s"array(${r.map(v => s"${v}D").mkString(",")})")
      .mkString("array(", ",", ")")
  private val srpDuckLit =
    srpPlanes.map(_.mkString("[", ",", "]")).mkString("[", ",", "]")

  /** 8-bit SRP bucket of vector column `v` (Spark): bit p set iff the dot
    * product with plane p is >= 0 — identical fold order to the oracle.
    * The inner dot is the native `vec_dot` (bit-identical to the zip_with
    * fold it replaced; the per-plane work is where the signature cost
    * lives) — callers must have the graft functions on the session
    * ([[graft.functions.GraftFunctions.registerAll]] or the extensions). */
  private val srpBucketSpark =
    s"""aggregate(sequence(0, 7), 0L, (acc, p) ->
       |  acc + IF(vec_dot(v, element_at($srpSparkLit, p + 1)) >= 0,
       |           shiftleft(1L, p), 0L))""".stripMargin

  private val srpBucketDuck =
    s"""CAST(list_sum(list_transform(range(0, 8), p ->
       |  CASE WHEN list_sum(list_transform(range(1, 65),
       |         j -> v[j] * ($srpDuckLit)[p + 1][j])) >= 0
       |       THEN CAST(pow(2, p) AS BIGINT) ELSE 0 END)) AS BIGINT)""".stripMargin

  /** s3: SRP-LSH bucketed ANN — the hash-bucket scale path next to s2's IVF:
    * every vector gets an 8-bit signed-random-projection signature (pure
    * per-row map, no shuffle, no training step unlike IVF); at query time
    * only buckets within Hamming distance 2 of the query's bucket are
    * scanned (multi-probe LSH), then exact cosine ranks the candidates.
    * Served from the STORED signature-partitioned layout (`indexRoot`'s
    * `srp/` store): the query's bucket is one collected BIGINT, the 37
    * buckets within Hamming distance 2 enumerate statically (8-bit space),
    * and the probe is a partition-pruned read of ~14% of the store instead
    * of the full scan s1 needs. (At toy corpus sizes the 37 small
    * partition reads cost slightly more than computing signatures in-query
    * — the layout pays off once the corpus dwarfs the directory overhead,
    * which is the regime this store exists for.) */
  val s3SrpLsh: Q = Q(
    "s3_srp_lsh",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 2)
        .withColumn("qb", expr(srpBucketSpark))
        .select(col("v").as("qv"), col("nv").as("nqv"), col("qb"))
      // the query's own bucket: ONE bounded value, then the multi-probe
      // bucket list is a static 8-bit enumeration → partition pruning
      val qbVal = q.select("qb").head.getLong(0)
      val probeBuckets = (0L until 256L)
        .filter(b => java.lang.Long.bitCount(b ^ qbVal) <= 2)
      storedSrpProbed(spark, dir, probeBuckets)
        .crossJoin(broadcast(q.select(col("qv"), col("nqv"))))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "bucket", "sim")
    },
    Some(
      s"""WITH e AS (
         |  SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |b AS (SELECT vec_id, label, v, $srpBucketDuck AS bucket FROM e),
         |q AS (SELECT v AS qv, bucket AS qb FROM b WHERE vec_id = 2)
         |SELECT vec_id, label, bucket, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM b, q
         |WHERE bit_count(CAST(xor(bucket, qb) AS BIGINT)) <= 2
         |ORDER BY sim DESC, vec_id
         |LIMIT 10""".stripMargin))

  /** s4: symmetric int8 quantization of the embedding column — per-vector
    * scale = max|v|/127, q_i = round(v_i/scale) — plus the reconstruction
    * RMSE, all as per-row higher-order expressions (the compression pass a
    * 100 TB embedding store runs before serving; 4× smaller than float32).
    * Exactness: same fold order both engines, outputs rounded to 6dp. */
  val s4QuantizeInt8: Q = Q(
    "s4_quantize_int8",
    (spark, dir) => {
      // the per-vector scale is LET-BOUND via a singleton aggregate (the
      // same CollapseProject barrier the MinHash pipeline uses): inlining it
      // into the per-element lambdas would recompute the max-abs fold once
      // per element — O(d²) folds instead of O(d)
      val sc = "aggregate(v, 0D, (m, y) -> greatest(m, abs(y))) / 127"
      val e = vectors(spark, dir)
      e.selectExpr(
        "vec_id",
        s"round($sc, 6) AS scale6",
        s"""aggregate(array($sc), 0, (s0, sc) ->
           |  aggregate(transform(v, x -> CAST(round(x / sc) AS INT)),
           |    s0, (s, q) -> s + q)) AS sum_q""".stripMargin,
        s"""round(sqrt(aggregate(array($sc), 0D, (a0, sc) ->
           |  aggregate(transform(v,
           |      x -> pow(CAST(round(x / sc) AS INT) * sc - x, 2)),
           |    a0, (s, d) -> s + d)) / 64), 6) AS rmse""".stripMargin)
    },
    Some(
      """WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
        |s AS (SELECT vec_id, v,
        |        list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127 AS sc
        |      FROM e)
        |SELECT vec_id,
        |  round(sc, 6) AS scale6,
        |  CAST(list_sum(list_transform(v, x -> CAST(round(x / sc) AS INT))) AS INT) AS sum_q,
        |  round(sqrt(list_sum(list_transform(v,
        |    x -> pow(CAST(round(x / sc) AS INT) * sc - x, 2))) / 64), 6) AS rmse
        |FROM s""".stripMargin))

  /** s5: k-NN JOIN — top-5 neighbours for EVERY query in a batch (each
    * corpus shard joins the broadcast query set once; the candidate stream
    * then shuffles only the slim (q_id, vec_id, label, sim) projection — no
    * vector arrays — to rank per query). This is the batch face of
    * similarity search a training pipeline runs (link every new document to
    * its nearest existing ones), where s1 is the single-query face. Exact
    * kNN is scan-bound by design; the IVF/LSH variants (s2/s3) are the
    * recall-trading scale path. Self-matches are excluded. */
  val s5KnnJoin: Q = Q(
    "s5_knn_join",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nqv"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(col("sim").desc, col("vec_id"))
      e.join(broadcast(q), col("vec_id") =!= col("q_id"))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .select("q_id", "vec_id", "label", "sim")
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 5)
    },
    Some(
      s"""WITH e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |q AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |pairs AS (
         |  SELECT q.q_id, e.vec_id, e.label, round(${duckCos("e.v", "q.qv")}, 6) AS sim
         |  FROM e, q WHERE e.vec_id <> q.q_id)
         |SELECT q_id, vec_id, label, sim, rk FROM (
         |  SELECT *, row_number() OVER (PARTITION BY q_id
         |                               ORDER BY sim DESC, vec_id) AS rk
         |  FROM pairs) t
         |WHERE rk <= 5""".stripMargin))

  /** s6: IVF+PQ serving shape — the standard 100 TB ANN layout that s2 and
    * s4 each covered half of: vectors are stored BUCKETED by IVF centroid
    * (s2's layout) and QUANTIZED to int8 (s4's compression), so the probe
    * phase scans 4-byte-per-dim codes in the probed buckets only (4× less
    * I/O than float32, ~an order less than the full scan); the top-50
    * candidates by approximate (dequantized) similarity are then re-ranked
    * EXACTLY by fetching just those 50 full vectors — the recall knob is the
    * candidate depth, not the storage format. Approximate and exact
    * similarities both ride the output so the gate proves the two-phase
    * ranking, not just the final order.
    *
    * Exactness: scale and quantized codes use the same sequential folds as
    * s4 (bit-identical cross-engine); dequantized cosine is an
    * identically-ordered fold of exact int×double products; both sims are
    * rounded to 6dp before ranking with a vec_id tiebreak. */
  val s6IvfPq: Q = Q(
    "s6_ivf_pq",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 3)
        .select(col("v").as("qv"), col("nv").as("nqv"))
      val probes = probeIds(spark, dir, queryVecId = 3, nProbe = 4)
      // the quantized store: (vec_id, c_id, scale, int8 codes) — what the
      // probe scans instead of the float vectors; quantization runs only
      // over the partition-pruned probed buckets. The scale is let-bound
      // through a singleton-aggregate barrier (s4's trick) so the max-abs
      // fold runs once per vector, not once per element.
      val sc = "aggregate(v, 0D, (m, y) -> greatest(m, abs(y))) / 127"
      val quant = storedAssignedProbed(spark, dir, probes).selectExpr(
        "vec_id", "label", "c_id",
        s"round($sc, 6) AS sc6",
        s"""aggregate(array($sc), CAST(array() AS ARRAY<INT>), (z, sc) ->
           |  transform(v, x -> CAST(round(x / sc) AS INT))) AS codes""".stripMargin,
        s"$sc AS sc")
      // probe phase: approximate similarity from DEQUANTIZED codes only
      val cand = quant
        .crossJoin(broadcast(q))
        .selectExpr("vec_id", "label", "c_id", "sc6",
          """round(
            |  aggregate(zip_with(transform(codes, qi -> qi * sc), qv,
            |                     (x, y) -> x * y), 0D, (s, t) -> s + t)
            |  / (sqrt(aggregate(transform(codes, qi -> qi * sc * qi * sc),
            |                    0D, (s, t) -> s + t)) * nqv), 6) AS approx_sim""".stripMargin)
        .orderBy(col("approx_sim").desc, col("vec_id"))
        .limit(50)
      // re-rank phase: fetch the 50 candidates' EXACT vectors and re-score
      cand.join(e.select(col("vec_id").as("e_id"), col("v"), col("nv")),
          col("vec_id") === col("e_id"))
        .crossJoin(broadcast(q))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "c_id", "approx_sim", "sim")
    },
    Some(
      s"""WITH $duckAssigned,
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 3),
         |probed AS (
         |  SELECT c_id AS probe_c
         |  FROM cents, q
         |  ORDER BY round(${duckCos("cv", "qv")}, 6) DESC, c_id
         |  LIMIT 4),
         |quant AS (
         |  SELECT vec_id, label, c_id, round(sc, 6) AS sc6,
         |    list_transform(v, x -> CAST(round(x / sc) AS INT)) AS codes, sc
         |  FROM (SELECT a.*,
         |          list_aggregate(list_transform(v, x -> abs(x)), 'max') / 127 AS sc
         |        FROM assigned a)),
         |cand AS (
         |  SELECT vec_id, label, c_id, sc6,
         |    round(
         |      list_sum(list_transform(range(1, 65),
         |        j -> codes[j] * sc * qv[j]))
         |      / (sqrt(list_sum(list_transform(codes, qi -> qi * sc * qi * sc)))
         |         * sqrt(list_sum(list_transform(qv, y -> y * y)))), 6) AS approx_sim
         |  FROM quant JOIN probed ON c_id = probe_c, q
         |  ORDER BY approx_sim DESC, vec_id
         |  LIMIT 50)
         |SELECT c.vec_id, c.label, c.c_id, c.approx_sim,
         |  round(${duckCos("e.v", "q.qv")}, 6) AS sim
         |FROM cand c JOIN e ON e.vec_id = c.vec_id, q
         |ORDER BY sim DESC, c.vec_id
         |LIMIT 10""".stripMargin))

  /** Squared L2 over 8-dim DuckDB lists, same fold order as [[pqD2]]. */
  private def duckPqD2(a: String, b: String): String =
    s"round(list_sum(list_transform(range(1, 9), j -> ($a[j] - $b[j]) * ($a[j] - $b[j]))), 6)"

  /** DuckDB CTEs mirroring the PQ training (continues [[duckAssigned]]'s
    * CTE list — expects `e`, `cents`, `assigned` in scope): per-subspace
    * slices, seed codebooks from `vec_id < 16`, [[KmeansIters]] Lloyd steps
    * with the same rounded-L2 ranking and exact integer-mean updates, and
    * the final per-subspace assignment `paf` (the relational image of the
    * stored `codes` array). */
  private val duckPq: String = {
    val init =
      s"""psv AS (SELECT vec_id, r.sub, list_transform(range(1, ${PqDim + 1}),
         |          j -> v[r.sub * $PqDim + j]) AS sv
         |        FROM e, range(0, $PqSubs) r(sub)),
         |pc0 AS (SELECT sub, vec_id AS c_id, sv AS cv FROM psv WHERE vec_id < $PqK)""".stripMargin
    val iters = (1 to KmeansIters).map { t =>
      s"""pa$t AS (
         |  SELECT vec_id, sub, sv, c_id FROM (
         |    SELECT s.vec_id, s.sub, s.sv, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY ${duckPqD2("s.sv", "c.cv")}, c.c_id) AS rk
         |    FROM psv s JOIN pc${t - 1} c ON c.sub = s.sub) t
         |  WHERE rk = 1),
         |pc$t AS (
         |  SELECT sub, c_id, list(CAST(s AS DOUBLE) / n / 1000000 ORDER BY i) AS cv FROM (
         |    SELECT a.sub, a.c_id, r.i,
         |      SUM(CAST(round(a.sv[r.i] * 1000000) AS BIGINT)) AS s, COUNT(*) AS n
         |    FROM pa$t a, range(1, ${PqDim + 1}) r(i)
         |    GROUP BY 1, 2, 3) u
         |  GROUP BY 1, 2)""".stripMargin
    }
    val fin =
      s"""paf AS (
         |  SELECT vec_id, sub, c_id FROM (
         |    SELECT s.vec_id, s.sub, c.c_id,
         |      row_number() OVER (PARTITION BY s.vec_id, s.sub
         |        ORDER BY ${duckPqD2("s.sv", "c.cv")}, c.c_id) AS rk
         |    FROM psv s JOIN pc$KmeansIters c ON c.sub = s.sub) t
         |  WHERE rk = 1)""".stripMargin
    (Seq(init) ++ iters ++ Seq(fin)).mkString(",\n")
  }

  /** s8: IVF + TRUE PRODUCT QUANTIZATION with ADC serving — the canonical
    * billion-scale ANN layout (Jégou et al. 2011), completing the stack
    * next to s2 (IVF over floats) and s6 (IVF + scalar int8): the probe
    * phase reads ONLY the stored 8-codes-per-vector arrays of the probed
    * IVF buckets (32× less I/O than the float vectors), ranks candidates by
    * an asymmetric-distance-computation lookup — the query's 128-entry
    * distance table, one integer add per (vector, subspace) — and re-ranks
    * the top 50 exactly from just those vectors' floats. Both the per-
    * subspace distances and their sum are exact scaled BIGINTs, so the
    * candidate ranking has zero float-summation ambiguity cross-engine. */
  val s8PqAdc: Q = Q(
    "s8_pq_adc",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 4)
        .select(col("v").as("qv"), col("nv").as("nqv"))
      val probes = probeIds(spark, dir, queryVecId = 4, nProbe = 4)
      // the query's ADC distance table: 128 codebook rows × 8 query slices
      val qsv = pqSubvectors(e.filter(col("vec_id") === 4))
        .select(col("sub").as("q_sub"), col("sv").as("qsv"))
      val dt = storedPqCents(spark, dir)
        .join(broadcast(qsv), col("sub") === col("q_sub"))
        .select(col("sub").as("d_sub"), col("c_id").as("d_code"),
          expr(s"CAST(round(${pqD2("cv", "qsv")} * 1000000) AS BIGINT)").as("d2p"))
      // probe phase: partition-pruned CODES scan, 128-row broadcast lookup,
      // integer sum per vector (map-side combinable)
      val cand = storedCodesProbed(spark, dir, probes)
        .select(col("vec_id"), col("label"), col("c_id"),
          posexplode(col("codes")).as(Seq("sub", "code")))
        .join(broadcast(dt),
          col("sub") === col("d_sub") && col("code").cast("bigint") === col("d_code"))
        .groupBy(col("vec_id"), col("label"), col("c_id"))
        .agg(sum(col("d2p")).as("approx_d"))
        .orderBy(col("approx_d"), col("vec_id"))
        .limit(50)
      // re-rank phase: exact L2 on just the 50 candidates' float vectors
      cand.join(e.select(col("vec_id").as("e_id"), col("v")),
          col("vec_id") === col("e_id"))
        .crossJoin(broadcast(q))
        .withColumn("d2",
          expr("round(aggregate(zip_with(v, qv, (x, y) -> (x - y) * (x - y)), 0D, (s, t) -> s + t), 6)"))
        .orderBy(col("d2"), col("vec_id"))
        .limit(10)
        .select("vec_id", "label", "c_id", "approx_d", "d2")
    },
    Some(
      s"""WITH $duckAssigned,
         |$duckPq,
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 4),
         |probed AS (
         |  SELECT c_id AS probe_c
         |  FROM cents, q
         |  ORDER BY round(${duckCos("cv", "qv")}, 6) DESC, c_id
         |  LIMIT 4),
         |dt AS (
         |  SELECT c.sub, c.c_id AS code,
         |    CAST(round(${duckPqD2("c.cv", "s.sv")} * 1000000) AS BIGINT) AS d2p
         |  FROM pc$KmeansIters c JOIN psv s ON s.sub = c.sub AND s.vec_id = 4),
         |cand AS (
         |  SELECT p.vec_id, a.label, a.c_id, CAST(SUM(dt.d2p) AS BIGINT) AS approx_d
         |  FROM paf p
         |  JOIN dt ON dt.sub = p.sub AND dt.code = p.c_id
         |  JOIN assigned a ON a.vec_id = p.vec_id
         |  JOIN probed ON a.c_id = probe_c
         |  GROUP BY 1, 2, 3
         |  ORDER BY approx_d, p.vec_id
         |  LIMIT 50)
         |SELECT c.vec_id, c.label, c.c_id, c.approx_d,
         |  round(list_sum(list_transform(range(1, 65),
         |    j -> (e.v[j] - q.qv[j]) * (e.v[j] - q.qv[j]))), 6) AS d2
         |FROM cand c JOIN e ON e.vec_id = c.vec_id, q
         |ORDER BY d2, c.vec_id
         |LIMIT 10""".stripMargin))

  /** d11: SemDeDup-style SEMANTIC deduplication — the embedding-space
    * analogue of MinHash dedup (Abbas et al. 2023): cluster every vector to
    * its nearest centroid (the same broadcast assignment as d5/s2), then
    * within each cluster DROP every item that has a lower-id near-duplicate
    * (cosine ≥ τ). The keep rule is id-ordered dominance — the deterministic,
    * join-expressible form of SemDeDup's greedy keep-one (equal to it
    * whenever near-duplicate sets are cliques, the common case at tight τ).
    * Scale: pairs form ONLY within clusters (the d5 bucketing argument —
    * no all-pairs join), the drop set is a distinct projection of the edge
    * list, and the final anti join is broadcastable (drop set ≪ corpus). */
  val d11SemanticDedup: Q = Q(
    "d11_semantic_dedup",
    (spark, dir) => {
      val a = storedAssigned(spark, dir)
      val left = a.select(col("c_id"), col("vec_id").as("a_id"),
        col("v").as("va"), col("nv").as("na"))
      val right = a.select(col("c_id").as("c_id2"), col("vec_id").as("b_id"),
        col("v").as("vb"), col("nv").as("nb"))
      val dropped = left
        .join(right, col("c_id") === col("c_id2") && col("a_id") < col("b_id"))
        .withColumn("sim", cosineWithNorms6(col("va"), col("na"), col("vb"), col("nb")))
        .filter(col("sim") >= 0.45)
        .select(col("b_id")).distinct()
      a.select(col("vec_id"), col("label"), col("c_id"))
        .join(broadcast(dropped), col("vec_id") === col("b_id"), "left_anti")
    },
    Some(
      s"""WITH $duckAssigned,
         |dropped AS (
         |  SELECT DISTINCT b.vec_id FROM assigned a JOIN assigned b
         |    ON a.c_id = b.c_id AND a.vec_id < b.vec_id
         |  WHERE round(${duckCos("a.v", "b.v")}, 6) >= 0.45)
         |SELECT vec_id, label, c_id FROM assigned
         |WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""".stripMargin))

  /** s7: the k-means TRAINING itself as a gate — per trained cluster, the
    * membership census (count, id range) and an exact integer checksum of
    * the members' similarity to their centroid (`Σ round(sim₆·10⁶)` as
    * BIGINT — order-independent, so no float-summation ambiguity). A wrong
    * Lloyd iteration (bad assignment tiebreak, wrong dimension order in the
    * update, a lost cluster) shifts memberships and fails the hash; this is
    * the direct oracle over the index that s2/s6/d5/d11 serve from. */
  val s7KmeansTrain: Q = Q(
    "s7_kmeans_train",
    (spark, dir) => {
      val cents = storedCents(spark, dir)
      storedAssigned(spark, dir)
        .join(broadcast(cents), "c_id")
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("cv"), col("ncv")))
        .groupBy(col("c_id"))
        .agg(count(lit(1)).as("n_members"),
          min("vec_id").as("min_vec"), max("vec_id").as("max_vec"),
          sum(expr("CAST(round(sim * 1000000) AS BIGINT)")).as("sim_sum_u"))
    },
    Some(
      s"""WITH $duckAssigned
         |SELECT a.c_id, COUNT(*) AS n_members,
         |  MIN(a.vec_id) AS min_vec, MAX(a.vec_id) AS max_vec,
         |  CAST(SUM(CAST(round(round(${duckCos("a.v", "c.cv")}, 6) * 1000000)
         |           AS BIGINT)) AS BIGINT) AS sim_sum_u
         |FROM assigned a JOIN cents c ON a.c_id = c.c_id
         |GROUP BY a.c_id""".stripMargin))

  /** s9: ANN RECALL measurement — for every query in a batch, recall@10 of
    * the IVF 4-probe result against the exact brute-force top-10: the
    * quality metric every real ANN deployment tracks when tuning n_probe /
    * cluster count (the recall-vs-I/O dial s2's scaladoc describes). Both
    * rankings compute distributively: the exact side is s5's broadcast
    * kNN-join shape; the probe side ranks each query's centroids with a
    * window (no per-query driver collect — the BATCH face of s2's serving
    * path) and joins the stored inverted layout on the probed centroid
    * ids. Deterministic: rounded sims + vec_id tiebreaks on both sides. */
  val s9AnnRecall: Q = Q(
    "s9_ann_recall",
    (spark, dir) => {
      val e = vectors(spark, dir)
      val qs = e.filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nqv"))
      // exact top-10 per query (self included — symmetric with the probe side)
      val wx = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      val exact = e.crossJoin(broadcast(qs))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .select(col("q_id"), col("vec_id"), col("sim"))
        .withColumn("rk", row_number().over(wx)).filter(col("rk") <= 10)
        .select(col("q_id"), col("vec_id"))
      // 4 probed centroids per query, ranked distributively
      val wc = Window.partitionBy(col("q_id")).orderBy(col("csim").desc, col("c_id"))
      val probes = storedCents(spark, dir).crossJoin(broadcast(qs))
        .withColumn("csim", cosineWithNorms6(col("cv"), col("ncv"), col("qv"), col("nqv")))
        .select(col("q_id"), col("c_id"), col("csim"))
        .withColumn("rk", row_number().over(wc)).filter(col("rk") <= 4)
        .select(col("q_id").as("p_qid"), col("c_id").as("probe_c"))
      val a = storedAssigned(spark, dir)
      val wp = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      val probed = a.join(broadcast(probes), col("c_id") === col("probe_c"))
        .join(broadcast(qs), col("q_id") === col("p_qid"))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .select(col("q_id"), col("vec_id"), col("sim"))
        .withColumn("rk", row_number().over(wp)).filter(col("rk") <= 10)
        .select(col("q_id").as("pr_qid"), col("vec_id").as("pr_vid"))
      exact.join(probed,
          col("q_id") === col("pr_qid") && col("vec_id") === col("pr_vid"),
          "left_outer")
        .groupBy(col("q_id"))
        .agg(count(col("pr_vid")).as("n_hit"))
        .select(col("q_id"), col("n_hit"),
          round(col("n_hit") / 10.0, 6).as("recall_at_10"))
    },
    Some(
      s"""WITH $duckAssigned,
         |qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |exact AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, e.vec_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("e.v", "q.qv")}, 6) DESC, e.vec_id) AS rk
         |    FROM e, qs q) t WHERE rk <= 10),
         |probes AS (
         |  SELECT q_id, c_id FROM (
         |    SELECT q.q_id, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("c.cv", "q.qv")}, 6) DESC, c.c_id) AS rk
         |    FROM cents c, qs q) t WHERE rk <= 4),
         |probed AS (
         |  SELECT q_id, vec_id FROM (
         |    SELECT q.q_id, a.vec_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("a.v", "q.qv")}, 6) DESC, a.vec_id) AS rk
         |    FROM assigned a
         |    JOIN probes p ON a.c_id = p.c_id
         |    JOIN qs q ON q.q_id = p.q_id) t WHERE rk <= 10)
         |SELECT x.q_id, CAST(count(p.vec_id) AS BIGINT) AS n_hit,
         |  round(count(p.vec_id) / 10.0, 6) AS recall_at_10
         |FROM exact x LEFT JOIN probed p
         |  ON p.q_id = x.q_id AND p.vec_id = x.vec_id
         |GROUP BY x.q_id""".stripMargin))

  /** s10: batch ANN SERVING from the stored IVF index — top-10 neighbours
    * for EVERY query in a batch, reading ONLY the probed store slices.
    * This is the plan a production retrieval tier runs (s2 is the
    * single-query face with a driver-collected probe list; s9 reads the
    * FULL store to measure recall): (a) each query ranks the broadcast
    * centroids and keeps its 4 probe ids MAP-SIDE via the bounded
    * `top_k_by` aggregate — one 4-slot row per query crosses the wire,
    * never the query × centroids candidate stream a window rank would
    * shuffle (at 100 TB an IVF index carries 10⁵–10⁶ centroids, so that
    * stream is 10⁵× the query batch); (b) the union of probe ids prunes
    * the store read to the probed centroid partitions via the manifest
    * (`readPrunedByJoinKeys` — zero I/O for the rest of the corpus);
    * (c) candidates score against the BROADCAST query batch and rank
    * per query over the slim (q_id, vec_id, label, sim) projection.
    * Self-matches are excluded, as in s5. Deterministic: rounded sims
    * with id tiebreaks at both ranking steps, top_k_by's tie rule =
    * the oracle's `ORDER BY csim DESC, c_id`. */
  val s10AnnBatchServe: Q = Q(
    "s10_ann_batch_serve",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      val root = indexRoot(spark, dir)
      val qs = vectors(spark, dir).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nqv"))
      val ranked = qs.crossJoin(broadcast(storedCents(spark, dir)))
        .withColumn("csim", cosineWithNorms6(col("qv"), col("nqv"), col("cv"), col("ncv")))
        .select(col("q_id").as("r_qid"), col("c_id"), col("csim"))
        .groupBy(col("r_qid"))
        .agg(expr("top_k_by(c_id, csim, 4)").as("probe_cs"))
      // eager pin: the probe rows feed the pruned-read key collect AND the
      // scoring join — without it the ranking pass runs twice
      val probes = qs.join(ranked, col("q_id") === col("r_qid"))
        .select(col("q_id"), col("qv"), col("nqv"),
          explode(col("probe_cs")).as("c_id"))
        .localCheckpoint(true)
      val (stored, _, _) = graft.table.VersionedTable(s"$root/assigned")
        .readPrunedByJoinKeys(spark, probes.select("c_id"), "c_id", "c_id")
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      broadcast(probes)
        .join(stored.select(col("c_id"), col("vec_id"), col("label"),
          col("v"), col("nv")), "c_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .select(col("q_id"), col("vec_id"), col("label"), col("sim"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
    },
    Some(
      s"""WITH $duckAssigned,
         |qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, qv, c_id FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("c.cv", "q.qv")}, 6) DESC, c.c_id) AS rk
         |    FROM cents c, qs q) t WHERE rk <= 4)
         |SELECT q_id, vec_id, label, sim, rk FROM (
         |  SELECT p.q_id, a.vec_id, a.label,
         |    round(${duckCos("a.v", "p.qv")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY round(${duckCos("a.v", "p.qv")}, 6) DESC, a.vec_id) AS rk
         |  FROM assigned a JOIN probes p ON a.c_id = p.c_id
         |  WHERE a.vec_id <> p.q_id) t
         |WHERE rk <= 10""".stripMargin))

  /** s11: HYBRID retrieval — BM25 lexical ranking fused with embedding
    * cosine ranking by reciprocal-rank fusion (RRF, Cormack et al. 2009:
    * score = Σ 1/(60+rank)), query-by-example over the documents corpus.
    * This is the retrieval shape modern RAG/training-data curation runs:
    * two independent rankers (sparse lexical + dense vector), each
    * producing a bounded top-50 list, fused WITHOUT score calibration —
    * RRF only consumes ranks, which is why it composes rankers whose raw
    * scores live on incomparable scales.
    *
    * Scale shape: tf/df/doclen are vocabulary- and corpus-bounded slim
    * shuffles computed once; the query side (5 query docs' term sets +
    * vectors) broadcasts; both rankings window over slim (q_id, doc_id,
    * score) streams and are CUT AT 50 before the fusion outer join, so the
    * fuse step is rank-bounded regardless of corpus size. At 100 TB the
    * candidate generators are the indexed paths (an inverted index for
    * BM25, s10's pruned IVF serve for the dense leg) feeding the same
    * bounded fusion.
    *
    * The lexical leg prunes COMMON terms — a term in more than half the
    * corpus is skipped (`df·2 ≤ N`, part of the operator spec, mirrored
    * in the oracle): its idf is near zero so it barely moves the score,
    * but its postings are by definition O(corpus) and dominate the join
    * (measured here: 4.5 M of 4.5 M candidate rows came from >N/2 terms;
    * 1.5 k remained) — the maxscore/WAND family's observation that
    * low-idf postings cost everything and decide nothing.
    *
    * Exactness: BM25 (k1 = 1.2, b = 0.75) sums per-term contributions
    * rounded to 6dp as DECIMAL(18,6) — order-invariant, no float-sum
    * ambiguity (t5/t15's ln-at-6dp discipline); cosine is the sequential
    * fold both engines share, rounded to 6dp; ranks tiebreak on doc_id;
    * RRF is exact rational arithmetic on ranks rounded once. */
  val s11HybridRrf: Q = {
    def text(tokSel: String, cosQE: String): String =
      s"""WITH tok AS ($tokSel),
         |doclen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |           FROM tok GROUP BY doc_id),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |                 CAST(sum(len) AS DOUBLE) / count(*) AS avglen
         |          FROM doclen),
         |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY doc_id, word),
         |df AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM tok GROUP BY word),
         |q AS (SELECT doc_id AS q_id FROM documents WHERE doc_id % 100 = 0),
         |qterm AS (SELECT DISTINCT q.q_id, t.word
         |          FROM q JOIN tok t ON t.doc_id = q.q_id),
         |contrib AS (
         |  SELECT qt.q_id, f.doc_id,
         |    CAST(round(
         |      CAST(CAST(round(ln(1e0 + (s.nd - d.df + 0.5e0) / (d.df + 0.5e0)), 6)
         |           AS DECIMAL(18,6)) AS DOUBLE)
         |      * (f.tf * 2.2e0)
         |      / (f.tf + 1.2e0 * (0.25e0 + 0.75e0 * l.len / s.avglen)), 6)
         |    AS DECIMAL(18,6)) AS c6
         |  FROM qterm qt
         |  JOIN tf f ON f.word = qt.word AND f.doc_id <> qt.q_id
         |  JOIN df d ON d.word = qt.word
         |  JOIN doclen l ON l.doc_id = f.doc_id
         |  CROSS JOIN stats s
         |  WHERE d.df * 2 <= s.nd),
         |bm25 AS (SELECT q_id, doc_id, SUM(c6) AS score
         |         FROM contrib GROUP BY q_id, doc_id),
         |lex AS (SELECT q_id, doc_id, rk AS lex_rk FROM (
         |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |        ORDER BY score DESC, doc_id) AS rk
         |    FROM bm25) t
         |  WHERE rk <= 50),
         |vsim AS (
         |  SELECT q.q_id, l.doc_id, $cosQE AS sim
         |  FROM q JOIN embeddings qe ON qe.vec_id = q.q_id
         |  JOIN embeddings e ON e.vec_id <> q.q_id
         |  JOIN doclen l ON l.doc_id = e.vec_id),
         |vec AS (SELECT q_id, doc_id, rk AS vec_rk FROM (
         |    SELECT q_id, doc_id, row_number() OVER (PARTITION BY q_id
         |        ORDER BY sim DESC, doc_id) AS rk
         |    FROM vsim) t
         |  WHERE rk <= 50),
         |fused AS (
         |  SELECT coalesce(l.q_id, v.q_id) AS q_id,
         |    coalesce(l.doc_id, v.doc_id) AS doc_id,
         |    l.lex_rk, v.vec_rk,
         |    round(coalesce(1e0 / (60 + l.lex_rk), 0e0)
         |        + coalesce(1e0 / (60 + v.vec_rk), 0e0), 6) AS rrf
         |  FROM lex l FULL OUTER JOIN vec v
         |    ON v.q_id = l.q_id AND v.doc_id = l.doc_id)
         |SELECT q_id, doc_id, lex_rk, vec_rk, rrf, rk FROM (
         |  SELECT f.q_id, f.doc_id, f.lex_rk, f.vec_rk, f.rrf,
         |    row_number() OVER (PARTITION BY f.q_id
         |      ORDER BY f.rrf DESC, f.doc_id) AS rk
         |  FROM fused f) t
         |WHERE rk <= 10""".stripMargin
    // native vec_dot — the same left-to-right fold the oracle's list_sum
    // runs (VectorExprSpec proves bit-equality with the HOF spelling)
    val sparkCos = {
      val (a, b) = ("CAST(qe.embedding AS ARRAY<DOUBLE>)", "CAST(e.embedding AS ARRAY<DOUBLE>)")
      s"round(vec_dot($a, $b) / (sqrt(vec_dot($a, $a)) * sqrt(vec_dot($b, $b))), 6)"
    }
    val sparkSql = text(
      "SELECT doc_id, explode(split(text, ' ')) AS word FROM documents",
      sparkCos)
    Q("s11_hybrid_rrf",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        graft.functions.GraftFunctions.registerAll(spark)
        spark.sql(sparkSql)
      },
      Some(text(
        "SELECT doc_id, unnest(string_split(text, ' ')) AS word FROM documents",
        s"round(${duckCos("(qe.embedding::DOUBLE[])", "(e.embedding::DOUBLE[])")}, 6)")))
  }

  /** s12: FILTERED vector search — s10's pruned batch serving under a
    * metadata predicate (`label = 3`, ~10% of the corpus): top-10 among
    * the MATCHING vectors only, served from the stored IVF layout. This
    * is the serving mode every production vector store ships (search
    * within a tenant / language / license class), and it changes the
    * recall geometry: the predicate thins each probed partition ~10×, so
    * a top-10 needs a WIDER probe set than unfiltered search — the probe
    * width doubles to 8 (the filtered-search analogue of raising nprobe;
    * post-filtering a narrow probe list would starve the result set
    * instead). The filter applies IN the pruned scan — candidates stream
    * pre-thinned out of the probed partitions; nothing outside them is
    * read. Probe sets still reduce map-side via `top_k_by`. */
  val s12AnnFiltered: Q = Q(
    "s12_ann_filtered",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      val root = indexRoot(spark, dir)
      val qs = vectors(spark, dir).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nqv"))
      val ranked = qs.crossJoin(broadcast(storedCents(spark, dir)))
        .withColumn("csim", cosineWithNorms6(col("qv"), col("nqv"), col("cv"), col("ncv")))
        .select(col("q_id").as("r_qid"), col("c_id"), col("csim"))
        .groupBy(col("r_qid"))
        .agg(expr("top_k_by(c_id, csim, 8)").as("probe_cs"))
      val probes = qs.join(ranked, col("q_id") === col("r_qid"))
        .select(col("q_id"), col("qv"), col("nqv"),
          explode(col("probe_cs")).as("c_id"))
        .localCheckpoint(true)
      val (stored, _, _) = graft.table.VersionedTable(s"$root/assigned")
        .readPrunedByJoinKeys(spark, probes.select("c_id"), "c_id", "c_id")
      val w = Window.partitionBy(col("q_id")).orderBy(col("sim").desc, col("vec_id"))
      broadcast(probes)
        .join(stored.select(col("c_id"), col("vec_id"), col("label"),
            col("v"), col("nv"))
          .filter(col("label") === 3), "c_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .select(col("q_id"), col("vec_id"), col("label"), col("sim"))
        .withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
    },
    Some(
      s"""WITH $duckAssigned,
         |qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, qv, c_id FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("c.cv", "q.qv")}, 6) DESC, c.c_id) AS rk
         |    FROM cents c, qs q) t WHERE rk <= 8)
         |SELECT q_id, vec_id, label, sim, rk FROM (
         |  SELECT p.q_id, a.vec_id, a.label,
         |    round(${duckCos("a.v", "p.qv")}, 6) AS sim,
         |    row_number() OVER (PARTITION BY p.q_id
         |      ORDER BY round(${duckCos("a.v", "p.qv")}, 6) DESC, a.vec_id) AS rk
         |  FROM assigned a JOIN probes p ON a.c_id = p.c_id
         |  WHERE a.vec_id <> p.q_id AND a.label = 3) t
         |WHERE rk <= 10""".stripMargin))

  /** s13: RANGE search from the stored IVF index (FAISS `range_search`):
    * every stored vector within cosine ≥ τ of each query — the "find all
    * my near-neighbors" call dedup sweeps and recall audits make, where a
    * fixed top-k either truncates a dense neighborhood or pads a sparse
    * one. Same probe discipline as s12 (top-8 centroid partitions per
    * query, picked map-side via top_k_by; store read partition-pruned to
    * the probed slices), but the result is threshold-cut, not rank-cut —
    * result size is data-driven, so the shuffle carries only the
    * ≥ τ survivors. The oracle replays the identical probe set. */
  val s13RangeSearch: Q = Q(
    "s13_range_search",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      val root = indexRoot(spark, dir)
      val qs = vectors(spark, dir).filter(col("vec_id") % 100 === 0)
        .select(col("vec_id").as("q_id"), col("v").as("qv"), col("nv").as("nqv"))
      val ranked = qs.crossJoin(broadcast(storedCents(spark, dir)))
        .withColumn("csim", cosineWithNorms6(col("qv"), col("nqv"), col("cv"), col("ncv")))
        .select(col("q_id").as("r_qid"), col("c_id"), col("csim"))
        .groupBy(col("r_qid"))
        .agg(expr("top_k_by(c_id, csim, 8)").as("probe_cs"))
      val probes = qs.join(ranked, col("q_id") === col("r_qid"))
        .select(col("q_id"), col("qv"), col("nqv"),
          explode(col("probe_cs")).as("c_id"))
        .localCheckpoint(true)
      val (stored, _, _) = graft.table.VersionedTable(s"$root/assigned")
        .readPrunedByJoinKeys(spark, probes.select("c_id"), "c_id", "c_id")
      broadcast(probes)
        .join(stored.select(col("c_id"), col("vec_id"), col("v"), col("nv")), "c_id")
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .filter(col("sim") >= 0.2)
        .select(col("q_id"), col("vec_id"), col("sim"))
    },
    Some(
      s"""WITH $duckAssigned,
         |qs AS (SELECT vec_id AS q_id, v AS qv FROM e WHERE vec_id % 100 = 0),
         |probes AS (
         |  SELECT q_id, qv, c_id FROM (
         |    SELECT q.q_id, q.qv, c.c_id,
         |      row_number() OVER (PARTITION BY q.q_id
         |        ORDER BY round(${duckCos("c.cv", "q.qv")}, 6) DESC, c.c_id) AS rk
         |    FROM cents c, qs q) t WHERE rk <= 8)
         |SELECT p.q_id, a.vec_id,
         |  round(${duckCos("a.v", "p.qv")}, 6) AS sim
         |FROM assigned a JOIN probes p ON a.c_id = p.c_id
         |WHERE a.vec_id <> p.q_id
         |  AND round(${duckCos("a.v", "p.qv")}, 6) >= 0.2""".stripMargin))

  /** BM25 inverted-index store: postings `(bucket, word, doc_id, tf, len)`
    * and lexicon `(bucket, word, df)` committed as VersionedTables
    * PARTITIONED BY the term's hash bucket, with the corpus stats (nd,
    * avglen) and fingerprint in table properties — the lexical twin of the
    * IVF vector store. Built ONCE per corpus; a keyword query reads only
    * its terms' buckets via manifest partition pruning. At 100 TB the
    * alternative — re-tokenizing the corpus per query, which is what s11's
    * query-by-example formulation does — is not a serving plan. */
  private val TextBuckets = graft.dedup.TextIndexStore.Buckets

  private def wipeDir(root: String): Unit = {
    val p = java.nio.file.Paths.get(root)
    if (java.nio.file.Files.isDirectory(p)) {
      val s = java.nio.file.Files.walk(p)
      try s.sorted(java.util.Comparator.reverseOrder())
        .forEach(x => { java.nio.file.Files.deleteIfExists(x); () })
      finally s.close()
    }
  }

  private def textIndexRoot(spark: SparkSession, dir: String): String = {
    val root = indexLakeRoot(spark, dir) + "/text"
    val fp = docsFingerprint(dir)
    if (verifiedFresh.get(root) == fp) return root
    this.synchronized {
      if (verifiedFresh.get(root) == fp) return root
      val postings = graft.table.VersionedTable(s"$root/postings")
      val fresh = graft.table.VersionedTable.exists(s"$root/postings") &&
        postings.properties.get("corpusFingerprint").contains(fp) &&
        postings.properties.get("indexFormat")
          .contains(graft.dedup.TextIndexStore.Format)
      if (!fresh) {
        wipeDir(root)
        graft.dedup.TextIndexStore.build(spark, root,
          Tables.table(spark, dir, "documents"), fp)
      }
      verifiedFresh.put(root, fp)
      root
    }
  }

  /** The s15 store: built from the corpus MINUS a held-out slice, then the
    * slice ADMITTED incrementally ([[graft.dedup.TextIndexStore.admit]]) —
    * the resulting index must serve bit-identically to a full-corpus build
    * (the oracle recomputes over ALL documents). A store already carrying
    * the corpus fingerprint is served as-is: growth never triggers a
    * rebuild, which is the maintenance contract under test. */
  private def textAdmitRoot(spark: SparkSession, dir: String): String = {
    val root = indexLakeRoot(spark, dir) + "/text_admit"
    val fp = docsFingerprint(dir)
    if (verifiedFresh.get(root) == fp) return root
    this.synchronized {
      if (verifiedFresh.get(root) == fp) return root
      val postings = graft.table.VersionedTable(s"$root/postings")
      val fresh = graft.table.VersionedTable.exists(s"$root/postings") &&
        postings.properties.get("corpusFingerprint").contains(fp) &&
        postings.properties.get("indexFormat")
          .contains(graft.dedup.TextIndexStore.Format)
      if (!fresh) {
        wipeDir(root)
        val docs = Tables.table(spark, dir, "documents")
        graft.dedup.TextIndexStore.build(spark, root,
          docs.filter("doc_id % 7 != 0"), fp + ":base")
        graft.dedup.TextIndexStore.admit(spark, root,
          docs.filter("doc_id % 7 = 0"), fp)
      }
      verifiedFresh.put(root, fp)
      root
    }
  }

  /** Fixed keyword queries over the corpus vocabulary (deterministic,
    * present at every scale factor). */
  private val Bm25Queries: Seq[(Long, Seq[String])] =
    Seq(1L -> Seq("dup", "merge"), 2L -> Seq("spark", "window", "sort"))

  /** s14: keyword BM25 served from the STORED inverted index — the probe
    * reads only the query terms' hash-bucket partitions (≤ 5 of 64 here,
    * asserted in-query), never the corpus; scores use s11's exact decimal
    * discipline so the oracle (which recomputes the index relationally
    * from the raw documents) hash-matches. No common-term pruning: with
    * explicit keyword queries the idf weighting handles frequent terms,
    * and dropping them would change the contract. */
  /** Serve BM25 top-`k` from a stored index at `root`: bucket-pruned probe
    * (strict subset asserted in-query), s11's exact decimal discipline, nd
    * and avglen derived from the store's exact integer accumulators. */
  private def bm25TopK(spark: SparkSession, root: String,
      queries: Seq[(Long, Seq[String])], k: Int,
      conjunctive: Boolean = false): org.apache.spark.sql.DataFrame = {
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    val (nd, totalLen) = graft.dedup.TextIndexStore.stats(root)
    val avglen = java.lang.Double.toString(totalLen.toDouble / nd)
    val qterm = queries.flatMap { case (q, ws) => ws.map(q -> _) }
      .toDF("q_id", "qword")
      .withColumn("qb", expr(s"pmod(xxhash64(qword), $TextBuckets)"))
    val buckets = qterm.select(col("qb").as("b")).distinct()
    val (lex, _, _) = graft.table.VersionedTable(s"$root/lexicon")
      .readPrunedByJoinKeys(spark, buckets, "b", "bucket")
    val (posts, keptP, totalP) = graft.table.VersionedTable(s"$root/postings")
      .readPrunedByJoinKeys(spark, buckets, "b", "bucket")
    require(keptP < totalP,
      s"a keyword probe must read a strict bucket subset ($keptP/$totalP)")
    val contrib = broadcast(qterm)
      .join(lex.select(col("word").as("lw"), col("df")), col("qword") === col("lw"))
      .join(posts.select(col("word"), col("doc_id"), col("tf"), col("len")),
        col("qword") === col("word"))
      .withColumn("c6", expr(
        s"""CAST(round(
           |  CAST(CAST(round(ln(1e0 + ($nd - df + 0.5e0) / (df + 0.5e0)), 6)
           |       AS DECIMAL(18,6)) AS DOUBLE)
           |  * (tf * 2.2e0)
           |  / (tf + 1.2e0 * (0.25e0 + 0.75e0 * len / ${avglen}D)), 6)
           |AS DECIMAL(18,6))""".stripMargin))
    val w = Window.partitionBy(col("q_id"))
      .orderBy(col("score").desc, col("doc_id"))
    val grouped = contrib.groupBy("q_id", "doc_id")
      .agg(expr("SUM(c6)").as("score"),
        expr("count(DISTINCT qword)").as("n_matched"))
    // conjunctive (boolean AND) mode: a document scores only when it
    // matched EVERY query term — the count rides the same aggregation,
    // so the filter is free on top of the pruned probe
    val qcounts = queries.map { case (q, ws) => (q, ws.distinct.size.toLong) }
      .toDF("q_id", "n_terms")
    val filtered =
      if (conjunctive)
        grouped.join(broadcast(qcounts), "q_id")
          .filter(col("n_matched") === col("n_terms"))
      else grouped
    filtered
      .withColumn("rk", row_number().over(w)).filter(col("rk") <= k)
      .select(col("q_id"), col("doc_id"),
        expr("CAST(score AS DOUBLE)").as("score"), col("rk"))
  }

  /** The DuckDB oracle: BM25 recomputed RELATIONALLY from the raw
    * documents table with the identical decimal discipline — shared by the
    * build-once (s14) and build-then-admit (s15) stores, because an
    * exactly-maintained index must serve exactly the full-corpus result. */
  private def bm25OracleSql(queries: Seq[(Long, Seq[String])], k: Int,
      where: String = "", corpusSql: String = "documents",
      conjunctive: Boolean = false): String = {
    val qvals = queries.flatMap { case (q, ws) =>
      ws.map(wd => s"($q, '$wd')") }.mkString(", ")
    val qcvals = queries.map { case (q, ws) =>
      s"($q, ${ws.distinct.size})" }.mkString(", ")
    val conjCtes =
      if (conjunctive)
        s""",qcount(q_id, n_terms) AS (VALUES $qcvals),
           |matched AS (
           |  SELECT qt.q_id, f.doc_id, count(DISTINCT qt.qword) AS n_matched
           |  FROM qterm qt JOIN tf f ON f.word = qt.qword
           |  GROUP BY qt.q_id, f.doc_id)""".stripMargin
      else ""
    val conjJoin =
      if (conjunctive)
        """ JOIN matched m ON m.q_id = bm25.q_id AND m.doc_id = bm25.doc_id
          | JOIN qcount qc ON qc.q_id = bm25.q_id AND m.n_matched = qc.n_terms"""
          .stripMargin.replace("\n", "")
      else ""
    s"""WITH tok AS (SELECT doc_id, unnest(string_split(text, ' ')) AS word
         |             FROM $corpusSql $where),
         |doclen AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS len
         |           FROM tok GROUP BY doc_id),
         |stats AS (SELECT CAST(count(*) AS BIGINT) AS nd,
         |                 CAST(sum(len) AS DOUBLE) / count(*) AS avglen
         |          FROM doclen),
         |tf AS (SELECT doc_id, word, CAST(count(*) AS BIGINT) AS tf
         |       FROM tok GROUP BY doc_id, word),
         |df AS (SELECT word, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
         |       FROM tok GROUP BY word),
         |qterm(q_id, qword) AS (VALUES $qvals),
         |contrib AS (
         |  SELECT qt.q_id, f.doc_id,
         |    CAST(round(
         |      CAST(CAST(round(ln(1e0 + (s.nd - d.df + 0.5e0) / (d.df + 0.5e0)), 6)
         |           AS DECIMAL(18,6)) AS DOUBLE)
         |      * (f.tf * 2.2e0)
         |      / (f.tf + 1.2e0 * (0.25e0 + 0.75e0 * l.len / s.avglen)), 6)
         |    AS DECIMAL(18,6)) AS c6
         |  FROM qterm qt
         |  JOIN df d ON d.word = qt.qword
         |  JOIN tf f ON f.word = qt.qword
         |  JOIN doclen l ON l.doc_id = f.doc_id
         |  CROSS JOIN stats s),
         |bm25 AS (SELECT q_id, doc_id, SUM(c6) AS score
         |         FROM contrib GROUP BY q_id, doc_id)$conjCtes
         |SELECT q_id, doc_id, CAST(score AS DOUBLE) AS score, rk FROM (
         |  SELECT bm25.q_id, bm25.doc_id, score,
         |    row_number() OVER (PARTITION BY bm25.q_id
         |      ORDER BY score DESC, bm25.doc_id) AS rk
         |  FROM bm25$conjJoin) t
         |WHERE rk <= $k""".stripMargin
  }

  val s14Bm25Stored: Q = Q(
    "s14_bm25_stored",
    (spark, dir) => bm25TopK(spark, textIndexRoot(spark, dir), Bm25Queries, 10),
    Some(bm25OracleSql(Bm25Queries, 10)))

  /** Keyword queries for the admit-grown store — a different term set from
    * s14 so the two entries cannot accidentally share cached results. */
  private val Bm25AdmitQueries: Seq[(Long, Seq[String])] =
    Seq(1L -> Seq("merge", "sort"), 2L -> Seq("spark", "dup"))

  /** s15: BM25 served from a store GROWN INCREMENTALLY — built on ~6/7 of
    * the corpus, the rest admitted via [[graft.dedup.TextIndexStore.admit]]
    * (postings appended to their buckets, lexicon df merged in place,
    * nd/totalLen advanced; NO rebuild). The oracle recomputes BM25 over the
    * FULL corpus: hash-equality proves the incremental maintenance is
    * EXACT, the property that makes the index viable under continuous
    * ingest at 100 TB (re-tokenizing the corpus per append is not a plan). */
  val s15Bm25Admit: Q = Q(
    "s15_bm25_admit",
    (spark, dir) => bm25TopK(spark, textAdmitRoot(spark, dir), Bm25AdmitQueries, 10),
    Some(bm25OracleSql(Bm25AdmitQueries, 10)))

  /** Keyword queries for the stream-admitted store — a third distinct term
    * set so s14/s15/s16 cannot accidentally share cached results. */
  private val Bm25StreamQueries: Seq[(Long, Seq[String])] =
    Seq(1L -> Seq("window", "spark"), 2L -> Seq("dup", "sort"))

  /** The s16 store: s15's build-then-admit split, but the admitted slice
    * arrives through the STREAMING funnel
    * ([[graft.streaming.StreamingEtl.textAdmitStream]]) — landed as a file,
    * admitted exactly-once under the (checkpoint, batchId) txn mark the
    * postings append carries. The restart contract is asserted in-build:
    * re-running the stream on the SAME checkpoint admits nothing (postings
    * version and nd/totalLen unchanged — a replayed batch is recognized
    * inside admit, after any torn tail is rolled forward). */
  private def textStreamRoot(spark: SparkSession, dir: String): String = {
    val root = indexLakeRoot(spark, dir) + "/text_stream"
    val fp = docsFingerprint(dir)
    if (verifiedFresh.get(root) == fp) return root
    this.synchronized {
      if (verifiedFresh.get(root) == fp) return root
      val postings = graft.table.VersionedTable(s"$root/postings")
      val fresh = graft.table.VersionedTable.exists(s"$root/postings") &&
        postings.properties.get("corpusFingerprint").contains(fp) &&
        postings.properties.get("indexFormat")
          .contains(graft.dedup.TextIndexStore.Format)
      if (!fresh) {
        wipeDir(root)
        val docs = Tables.table(spark, dir, "documents")
        graft.dedup.TextIndexStore.build(spark, root,
          docs.filter("doc_id % 7 != 0"), fp + ":base")
        val tmp = java.nio.file.Files.createTempDirectory("graft-s16-").toString
        docs.filter("doc_id % 7 = 0").coalesce(1).write.parquet(s"$tmp/landing")
        def drain(): Unit = {
          val q = graft.streaming.StreamingEtl.textAdmitStream(spark,
            s"$tmp/landing", docs.schema, root, fp, s"$tmp/ckpt")
          q.processAllAvailable(); q.stop()
        }
        drain()
        val v1 = postings.resolve()
        val stats1 = graft.dedup.TextIndexStore.stats(root)
        drain() // same checkpoint: the replayed batch must admit NOTHING
        require(postings.resolve() == v1 &&
          graft.dedup.TextIndexStore.stats(root) == stats1,
          "a restarted admission stream on the same checkpoint must be a no-op")
      }
      verifiedFresh.put(root, fp)
      root
    }
  }

  /** s16: BM25 served from a store grown by STREAMING admission — s15's
    * exactness contract (the oracle recomputes over the FULL corpus) plus
    * the streaming funnel's exactly-once restart, asserted in-build. */
  val s16StreamBm25Admit: Q = Q(
    "s16_stream_bm25_admit",
    (spark, dir) => {
      val root = textStreamRoot(spark, dir)
      // build + streamed admission above (once per corpus); probe below
      PhaseClock.markServe("s16_stream_bm25_admit")
      bm25TopK(spark, root, Bm25StreamQueries, 10)
    },
    Some(bm25OracleSql(Bm25StreamQueries, 10)))

  // ------------------------------------------------------------- q127

  /** Forgotten-id modulus for q127: doc_id/vec_id % 13 = 0 are erased. */
  private val ForgetMod = 13

  private val ForgetBm25Queries: Seq[(Long, Seq[String])] =
    Seq(1L -> Seq("sort", "dup"), 2L -> Seq("window", "merge"))

  /** The q127 store trio: signature + vector + text index stores built on
    * the FULL corpus, then the `% ForgetMod = 0` ids ERASED through each
    * store's evict verb — the serving queries read the post-erasure stores
    * while the oracle recomputes every result on corpus-minus-forgotten,
    * so hash equality proves right-to-be-forgotten actually reached the
    * indexes (the reference's own delete-and-prove flow,
    * scd2-job.ipynb:443-483, extended from the base table to its derived
    * index state). */
  private def forgetRoot(spark: SparkSession, dir: String): String = {
    val root = indexLakeRoot(spark, dir) + "/forget"
    val fp = docsFingerprint(dir) + ":" + corpusFingerprint(dir)
    if (verifiedFresh.get(root) == fp) return root
    this.synchronized {
      if (verifiedFresh.get(root) == fp) return root
      val textPost = graft.table.VersionedTable(s"$root/text/postings")
      val sigsT = graft.table.VersionedTable(s"$root/sig/sigs")
      val centsT = graft.table.VersionedTable(s"$root/vec/cents")
      val fresh = graft.table.VersionedTable.exists(s"$root/text/postings") &&
        textPost.properties.get("corpusFingerprint").contains(fp) &&
        graft.table.VersionedTable.exists(s"$root/sig/sigs") &&
        sigsT.properties.get("forgetFingerprint").contains(fp) &&
        graft.table.VersionedTable.exists(s"$root/vec/cents") &&
        centsT.properties.get("forgetFingerprint").contains(fp)
      if (!fresh) {
        wipeDir(root)
        val docs = Tables.table(spark, dir, "documents")
        val emb = Tables.table(spark, dir, "embeddings")
        val docVictims = docs.filter(s"doc_id % $ForgetMod = 0").select("doc_id")
        val vecVictims = emb.filter(s"vec_id % $ForgetMod = 0").select("vec_id")
        graft.dedup.TextIndexStore.build(spark, s"$root/text", docs, fp + ":full")
        graft.dedup.TextIndexStore.evict(spark, s"$root/text", docVictims, fp)
        graft.dedup.SignatureStore.build(spark, s"$root/sig", docs)
        graft.dedup.SignatureStore.evict(spark, s"$root/sig", docVictims)
        sigsT.setProperties(Map("forgetFingerprint" -> fp))
        graft.dedup.VectorStore.build(spark, s"$root/vec", emb)
        graft.dedup.VectorStore.evict(spark, s"$root/vec", vecVictims)
        centsT.setProperties(Map("forgetFingerprint" -> fp))
      }
      verifiedFresh.put(root, fp)
      root
    }
  }

  /** q127: right-to-be-forgotten THROUGH THE INDEXES — the base-table
    * delete lifecycle (q121) extended to the derived stores. All three
    * serving surfaces are read post-erasure and unified into one
    * (part, a, b, score) frame:
    *  - `bm25`: keyword top-10 from the evicted inverted index (per-term
    *    df decrements, lexicon deletions, nd/totalLen shrink — the
    *    aggregate-maintenance erasure);
    *  - `sig`:  every document probed against the evicted signature store
    *    (band-key candidates, ≥8 of 16 MinHash lanes verify, self
    *    excluded) — min surviving partner + partner count per doc;
    *  - `vec`:  IVF top-10 for the vec_id=2 query from the evicted vector
    *    store (centroids intentionally NOT retrained — they are corpus
    *    statistics; the forgotten embedding itself is gone).
    * The oracle recomputes each surface relationally on
    * corpus-minus-forgotten: hash equality = the erasure is serving-exact. */
  val q127ForgetIndexed: Q = Q(
    "q127_forget_indexed",
    (spark, dir) => {
      graft.functions.GraftFunctions.registerAll(spark)
      val root = forgetRoot(spark, dir)
      // store trio build + erasure above (once per corpus); serving below
      PhaseClock.markServe("q127_forget_indexed")
      // bm25 face — the evicted text index
      val bm = bm25TopK(spark, s"$root/text", ForgetBm25Queries, 10)
        .select(lit("bm25").as("part"), col("q_id").as("a"),
          col("doc_id").as("b"), col("score"))
      // sig face — probe ALL documents against the evicted store
      val docs = Tables.table(spark, dir, "documents")
      val probeSigs = docs.select(col("doc_id"),
        expr(s"minhash_sig(${graft.dedup.SignatureStore.ShinglesExpr})").as("sig"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      probeSigs.count()
      val probeBands = probeSigs.select(col("doc_id"),
          explode(expr(graft.dedup.SignatureStore.BandKeysExpr)).as("bb"))
        .select(col("doc_id"), col("bb.band").as("band"), col("bb.bkey").as("bkey"))
      val storedBands = graft.table.VersionedTable(s"$root/sig/bands").read(spark)
      val cand = probeBands
        .join(storedBands.toDF("s_id", "band2", "bkey2"),
          col("band") === col("band2") && col("bkey") === col("bkey2") &&
            col("doc_id") =!= col("s_id"))
        .select("doc_id", "s_id").distinct()
      val storedSigs = graft.table.VersionedTable(s"$root/sig/sigs").read(spark)
        .select(col("doc_id").as("s_id"), col("sig").as("sb"))
      val sigPart = cand
        .join(probeSigs.select(col("doc_id"), col("sig").as("sa")), "doc_id")
        .join(storedSigs, "s_id")
        .filter(expr("lane_agree(sa, sb) >= " +
          s"${graft.dedup.SignatureStore.MinAgreeingLanes}"))
        .groupBy("doc_id")
        .agg(min(col("s_id")).as("b"),
          expr("CAST(count(DISTINCT s_id) AS DOUBLE)").as("score"))
        .select(lit("sig").as("part"), col("doc_id").as("a"), col("b"), col("score"))
        .localCheckpoint(true) // pin before releasing the signature cache
      probeSigs.unpersist()
      // vec face — IVF probe of the evicted vector store
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 2)
        .select(col("v").as("qv"), col("nv").as("nqv"))
      val cents = graft.table.VersionedTable(s"$root/vec/cents").read(spark)
      val probes = cents.crossJoin(broadcast(q))
        .withColumn("qsim", cosineWithNorms6(col("cv"), col("ncv"), col("qv"), col("nqv")))
        .orderBy(col("qsim").desc, col("c_id")).limit(4)
        .select("c_id").collect().map(_.getLong(0)).toSeq
      val assigned = graft.table.VersionedTable(s"$root/vec/assigned")
        .readPartitioned(spark, s"c_id IN (${probes.mkString(", ")})")._1
      val vecPart = assigned.crossJoin(broadcast(q))
        .withColumn("sim", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("sim").desc, col("vec_id")).limit(10)
        .select(lit("vec").as("part"), lit(2L).as("a"),
          col("vec_id").as("b"), col("sim").as("score"))
      bm.unionByName(sigPart).unionByName(vecPart)
    },
    Some {
      val lanes16 = "list_sum(list_transform(range(1, 17), " +
        "i -> CASE WHEN pa.sig[i] = pb.sig[i] THEN 1 ELSE 0 END))"
      s"""SELECT 'bm25' AS part, q_id AS a, doc_id AS b, score FROM (
         |${bm25OracleSql(ForgetBm25Queries, 10, s"WHERE doc_id % $ForgetMod != 0")}
         |) bmq
         |UNION ALL
         |SELECT 'sig' AS part, a, b, score FROM (
         |WITH sh_all AS (
         |  SELECT doc_id, unnest(list_transform(
         |      range(1, greatest(len(string_split(text, ' ')) - 2, 1) + 1),
         |      i -> array_to_string((string_split(text, ' '))[i:i+2], ' '))) AS shingle
         |  FROM documents),
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
         |  SELECT DISTINCT p.doc_id AS a_id, s.doc_id AS s_id
         |  FROM bands p JOIN bands s
         |    ON p.b = s.b AND p.bkey = s.bkey
         |   AND s.doc_id % $ForgetMod != 0 AND p.doc_id != s.doc_id),
         |lanes AS (
         |  SELECT c.a_id, c.s_id
         |  FROM cand c
         |  JOIN sigs pa ON pa.doc_id = c.a_id
         |  JOIN sigs pb ON pb.doc_id = c.s_id
         |  WHERE $lanes16 >= ${graft.dedup.SignatureStore.MinAgreeingLanes})
         |SELECT a_id AS a, min(s_id) AS b, CAST(count(DISTINCT s_id) AS DOUBLE) AS score
         |FROM lanes GROUP BY a_id
         |) sq
         |UNION ALL
         |SELECT 'vec' AS part, CAST(2 AS BIGINT) AS a, vec_id AS b, sim AS score FROM (
         |WITH ${duckAssignedFor("")},
         |q AS (SELECT v AS qv FROM e WHERE vec_id = 2),
         |probed AS (
         |  SELECT c_id AS probe_c
         |  FROM cents, q
         |  ORDER BY round(${duckCos("cv", "qv")}, 6) DESC, c_id
         |  LIMIT 4)
         |SELECT vec_id, round(${duckCos("v", "qv")}, 6) AS sim
         |FROM assigned JOIN probed ON c_id = probe_c, q
         |WHERE vec_id % $ForgetMod != 0
         |ORDER BY sim DESC, vec_id
         |LIMIT 10
         |) vq""".stripMargin
    })

  /** Shortest-decimal-repr HALF_UP rounding to 6dp — the exact driver-side
    * image of both engines' `round(x, 6)` (java BigDecimal.valueOf goes
    * through Double.toString, the same shortest representation). */
  private def round6(x: Double): Double =
    java.math.BigDecimal.valueOf(x).setScale(6, java.math.RoundingMode.HALF_UP)
      .doubleValue()

  /** Sequential-fold dot product — the same strictly left-to-right order
    * as vec_dot / DuckDB's list_sum(list_transform(...)). */
  private def dotSeq(a: Array[Double], b: Array[Double]): Double = {
    var s = 0.0; var i = 0
    while (i < a.length) { s += a(i) * b(i); i += 1 }
    s
  }

  /** s17: MMR diversity re-ranking (Carbonell & Goldstein 1998 maximal
    * marginal relevance) — the serving op that keeps a near-dup-heavy
    * corpus from returning ten copies of the same document: greedily pick
    * k=10 of a top-30 relevance pool, each step maximizing
    * `round(0.7·rel − 0.3·max-sim-to-already-picked, 6)` (ties → lowest
    * vec_id). Scale shape: the candidate pool is generated DISTRIBUTED
    * (one broadcast-query scan, TakeOrderedAndProject top-30); the greedy
    * rerank is O(k·pool·dim) on the BOUNDED pool and runs driver-side —
    * the standard in-memory reranker stage, same boundedness class as the
    * probe-id collect every IVF serve does. Exactness: every similarity is
    * the engines' shared sequential fold rounded 6dp, and the MMR
    * combination uses identical double literals, so the greedy argmax
    * sequence is bit-deterministic; the oracle replays the selection with
    * a recursive CTE carrying the picked list. */
  val s17MmrRerank: Q = Q(
    "s17_mmr_rerank",
    (spark, dir) => {
      import spark.implicits._
      val e = vectors(spark, dir)
      val q = e.filter(col("vec_id") === 3)
        .select(col("v").as("qv"), col("nv").as("nqv"))
      val pool = e.filter(col("vec_id") =!= 3)
        .crossJoin(broadcast(q))
        .withColumn("rel", cosineWithNorms6(col("v"), col("nv"), col("qv"), col("nqv")))
        .orderBy(col("rel").desc, col("vec_id"))
        .limit(30)
        .select(col("vec_id"), col("label"), col("v"), col("nv"), col("rel"))
        .collect()
        .map(r => (r.getLong(0), r.getInt(1),
          r.getSeq[Double](2).toArray, r.getDouble(3), r.getDouble(4)))
      val sim6 = scala.collection.mutable.Map.empty[(Long, Long), Double]
      def simOf(a: (Long, Int, Array[Double], Double, Double),
          b: (Long, Int, Array[Double], Double, Double)): Double =
        sim6.getOrElseUpdate((a._1, b._1),
          round6(dotSeq(a._3, b._3) / (a._4 * b._4)))
      val picked = scala.collection.mutable.ArrayBuffer.empty[
        (Long, Int, Array[Double], Double, Double)]
      while (picked.size < 10) {
        val remaining = pool.filterNot(c => picked.exists(_._1 == c._1))
        val best = remaining.maxBy { c =>
          val mmr =
            if (picked.isEmpty) c._5
            else round6(0.7 * c._5 - 0.3 * picked.map(simOf(c, _)).max)
          (mmr, -c._1) // ties → lowest vec_id
        }
        picked += best
      }
      picked.toSeq.zipWithIndex
        .map { case ((id, label, _, _, rel), i) => (i + 1L, id, label, rel) }
        .toDF("rank", "vec_id", "label", "rel")
    },
    Some(
      s"""WITH RECURSIVE
         |q AS (SELECT embedding::DOUBLE[] AS qv FROM embeddings WHERE vec_id = 3),
         |e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v FROM embeddings),
         |cands AS (
         |  SELECT vec_id, label, v, round(${duckCos("v", "qv")}, 6) AS rel
         |  FROM e, q WHERE vec_id <> 3
         |  ORDER BY rel DESC, vec_id LIMIT 30),
         |sims AS (
         |  SELECT a.vec_id AS a, b.vec_id AS b,
         |    round(${duckCos("a.v", "b.v")}, 6) AS sim
         |  FROM cands a JOIN cands b ON a.vec_id <> b.vec_id),
         |sel AS (
         |  SELECT 1 AS step,
         |    [(SELECT vec_id FROM cands ORDER BY rel DESC, vec_id LIMIT 1)] AS picked
         |  UNION ALL
         |  SELECT step + 1, list_append(picked, (
         |    SELECT c.vec_id FROM cands c
         |    WHERE NOT list_contains(s.picked, c.vec_id)
         |    ORDER BY round(0.7 * c.rel - 0.3 * (
         |        SELECT max(sm.sim) FROM sims sm
         |        WHERE sm.a = c.vec_id AND list_contains(s.picked, sm.b)), 6)
         |      DESC, c.vec_id
         |    LIMIT 1))
         |  FROM sel s WHERE step < 10)
         |SELECT CAST(r.i AS BIGINT) AS rank, s.picked[r.i] AS vec_id,
         |  c.label, c.rel
         |FROM sel s, LATERAL unnest(range(1, 11)) r(i)
         |JOIN cands c ON c.vec_id = s.picked[r.i]
         |WHERE s.step = 10""".stripMargin))

  /** s18: CONJUNCTIVE (boolean AND) retrieval from the stored BM25 index —
    * a document ranks only when it matched EVERY query term, the classic
    * boolean-retrieval serving mode next to s14's disjunctive BM25 (an
    * explicit multi-term query like "spark window sort" usually MEANS the
    * conjunction; disjunctive scoring surfaces strong single-term matches
    * the user didn't ask for). The matched-term count rides the SAME
    * pruned-probe aggregation that sums the scores, so the AND filter is
    * free on top of s14's bucket-pruned read — no second pass, no
    * intersection join; at 100 TB the probe I/O is identical to the
    * disjunctive query's. */
  val s18BooleanRetrieval: Q = {
    val queries = Seq(1L -> Seq("dup", "merge", "window"),
      2L -> Seq("spark", "sort"))
    Q(
      "s18_boolean_retrieval",
      (spark, dir) => bm25TopK(spark, textIndexRoot(spark, dir), queries, 10,
        conjunctive = true),
      Some(bm25OracleSql(queries, 10, conjunctive = true)))
  }

  /** s19: PHRASE retrieval — documents rank by how often the query terms
    * appear CONSECUTIVELY in order (token-slide count over the corpus'
    * single-space tokenization), the "exact phrase" serving mode the
    * doc-level index alone cannot answer (its postings carry tf, not
    * positions). Two-stage plan instead of a positional index: (1) the
    * stored index's bucket-pruned conjunctive probe (s18's shape — probe
    * I/O is the query terms' buckets, asserted a strict subset) yields the
    * candidate docs that contain every term ANYWHERE; (2) only candidates
    * are fetched and verified positionally with a codegen'd
    * filter/slice scan of the token array — no positional postings, so the
    * index stays tf-sized (a positional index is ~5-10× larger and
    * complicates every admit/evict/compact verb). At production vocabulary
    * the AND-candidates of a multi-term phrase are rare and the fetch is a
    * [[graft.table.VersionedTable.readByKeys]] point read; on this
    * synthetic ~30-word corpus candidates are dense (~60 %), so the entry
    * broadcasts the candidate ids against one corpus scan — the verify
    * cost is then ONE pass over candidate rows either way. Phrase ≠ AND is
    * the teeth: q2's three terms co-occur in ~270 docs but are adjacent in
    * ~1. Oracle replays the same slide count with DuckDB list lambdas. */
  val s19PhraseRetrieval: Q = {
    val phrases: Seq[(Long, Seq[String])] =
      Seq(1L -> Seq("spark", "window"), 2L -> Seq("merge", "sort", "table"))
    Q(
      "s19_phrase_retrieval",
      (spark, dir) => {
        import spark.implicits._
        Tables.registerAll(spark, dir)
        graft.functions.GraftFunctions.registerAll(spark)
        val root = textIndexRoot(spark, dir)
        val qterm = phrases.flatMap { case (q, ws) => ws.distinct.map(q -> _) }
          .toDF("q_id", "qword")
          .withColumn("qb", expr(s"pmod(xxhash64(qword), $TextBuckets)"))
        val buckets = qterm.select(col("qb").as("b")).distinct()
        val (posts, keptP, totalP) = graft.table.VersionedTable(s"$root/postings")
          .readPrunedByJoinKeys(spark, buckets, "b", "bucket")
        require(keptP < totalP,
          s"the candidate probe must read a strict bucket subset ($keptP/$totalP)")
        val qcounts = phrases.map { case (q, ws) => (q, ws.distinct.size.toLong) }
          .toDF("q_id", "n_terms")
        val cand = broadcast(qterm)
          .join(posts.select(col("word"), col("doc_id")), col("qword") === col("word"))
          .groupBy("q_id", "doc_id")
          .agg(expr("count(DISTINCT qword)").as("n_matched"))
          .join(broadcast(qcounts), "q_id")
          .filter(col("n_matched") === col("n_terms"))
          .select("q_id", "doc_id")
        val ptoks = phrases.toDF("q_id", "ptoks")
        val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
        val verified = docs.join(broadcast(cand), "doc_id")
          .join(broadcast(ptoks), "q_id")
          .withColumn("toks", split(col("text"), " "))
          // native codegen slide-count ([[graft.functions.PhraseCount]],
          // bit-equal to the filter/sequence/slice HOF it replaced — pinned
          // by PhraseCountSpec): the HOF was CodegenFallback, allocating
          // the position sequence plus a slice copy per surviving position
          // and evaluating the lambda interpreted, and was the bench's
          // most expensive serving fold; the expression keeps the
          // first-token short-circuit inside one codegen'd loop
          .withColumn("tf", expr("phrase_count(toks, ptoks)"))
          .filter(col("tf") > 0)
        val w = Window.partitionBy(col("q_id"))
          .orderBy(col("tf").desc, col("doc_id"))
        verified.withColumn("rk", row_number().over(w)).filter(col("rk") <= 10)
          .select("q_id", "doc_id", "tf", "rk")
      },
      Some {
        val qvals = phrases.map { case (q, ws) =>
          s"($q, [${ws.map(w => s"'$w'").mkString(", ")}])" }.mkString(", ")
        s"""WITH q(q_id, ptoks) AS (VALUES $qvals),
           |tok AS (SELECT doc_id, string_split(text, ' ') AS toks FROM documents),
           |tf AS (SELECT q.q_id, t.doc_id,
           |    CAST(len(list_filter(range(1, len(t.toks) - len(q.ptoks) + 2),
           |        i -> t.toks[i:i + len(q.ptoks) - 1] = q.ptoks)) AS BIGINT) AS tf
           |    FROM q CROSS JOIN tok t)
           |SELECT q_id, doc_id, tf, rk FROM (
           |  SELECT q_id, doc_id, tf,
           |    row_number() OVER (PARTITION BY q_id ORDER BY tf DESC, doc_id) AS rk
           |  FROM tf WHERE tf > 0) z
           |WHERE rk <= 10""".stripMargin
      })
  }

  /** q130: derived-index maintenance from the base table's CHANGE FEED —
    * the index follows the table. A corpus VersionedTable takes an append
    * (inserts), a SQL-shaped DELETE, and an UPDATE rewriting text; one
    * [[graft.dedup.TextIndexStore.syncFromTable]] call drives the store's
    * evict/admit verbs from the feed's changed ids and advances the synced
    * cursor, after which BM25 serving equals a relational recompute on the
    * table's CURRENT contents (updates included — the updated text scores,
    * the stale postings are gone). Re-sync asserted a loud (0,0) no-op
    * in-query. At 100 TB this is how a derived index stays fresh: the feed
    * is change-sized, the evict/admit touch only the changed ids' buckets
    * — a day that touched 0.1 % of the corpus syncs 0.1 % of the index. */
  val q130IndexTableSync: Q = {
    val queries = Seq(1L -> Seq("dup", "merge"), 2L -> Seq("spark", "window"))
    Q(
      "q130_index_table_sync",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q130-").toString
        val t = graft.table.VersionedTable(s"$tmp/corpus")
        val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
        t.commit(docs.filter("doc_id % 5 <> 0"), numPartitions = Some(4))
        graft.dedup.TextIndexStore.build(spark, s"$tmp/ix", t.read(spark), "fp0")
        graft.dedup.TextIndexStore.markSynced(s"$tmp/ix", t.resolve())
        // the table moves on: inserts, deletes, and a text-rewriting update
        t.append(docs.filter("doc_id % 5 = 0"))
        t.delete(spark, "doc_id % 10 = 3")
        t.update(spark, "doc_id % 10 = 7",
          Map("text" -> "concat(text, ' graftsync graftsync')"))
        // corpus build + table mutations above; the sync + probe below IS
        // the maintenance verb under measurement
        PhaseClock.markServe("q130_index_table_sync")
        val (admitted, evicted) =
          graft.dedup.TextIndexStore.syncFromTable(spark, s"$tmp/ix", t, "fp1")
        require(admitted > 0 && evicted > 0,
          s"the sync must both admit and evict ($admitted/$evicted)")
        // the synced store must be exactly a build on the CURRENT table
        require(graft.dedup.TextIndexStore.stats(s"$tmp/ix")._1 ==
          t.read(spark).count(), "nd must equal the table's current row count")
        // a replayed sync past the cursor is a loud no-op
        require(graft.dedup.TextIndexStore.syncFromTable(
          spark, s"$tmp/ix", t, "fp2") == ((0L, 0L)), "re-sync must no-op")
        bm25TopK(spark, s"$tmp/ix", queries, 10)
      },
      Some(bm25OracleSql(queries, 10,
        corpusSql = """(SELECT doc_id,
          |  CASE WHEN doc_id % 10 = 7 THEN text || ' graftsync graftsync'
          |       ELSE text END AS text
          |FROM documents WHERE doc_id % 10 <> 3)""".stripMargin)))
  }

  /** q142: q130's STREAMING twin — the index follows the table
    * CONTINUOUSLY. The same corpus mutations (append + DELETE + UPDATE),
    * but the sync is driven by
    * [[graft.streaming.StreamingEtl.textIndexSyncStream]]: `readChangeFeed`
    * over the `graft-table` stream source fires micro-batches, each
    * non-empty batch runs one cursor-guarded syncFromTable stamped
    * `(checkpoint, batchId)` on its postings append. Asserted in-query:
    * (a) the streamed store ends bit-identical to what a FULL REBUILD on
    * the current table serves (the oracle recomputes BM25 relationally —
    * q130's equivalence, now reached through the stream); (b) a
    * CHECKPOINTED RESTART is a no-op — the re-started stream drains
    * without moving the postings table or the cursor (the q130
    * replay-convergence spec's streaming face). */
  val q142StreamIndexSync: Q = {
    val queries = Seq(1L -> Seq("dup", "merge"), 2L -> Seq("spark", "window"))
    Q(
      "q142_stream_index_sync",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q142-").toString
        val t = graft.table.VersionedTable(s"$tmp/corpus")
        val docs = Tables.table(spark, dir, "documents").select("doc_id", "text")
        t.commit(docs.filter("doc_id % 4 <> 0"), numPartitions = Some(4))
        graft.dedup.TextIndexStore.build(spark, s"$tmp/ix", t.read(spark), "fp0")
        graft.dedup.TextIndexStore.markSynced(s"$tmp/ix", t.resolve())
        // the table moves on across THREE commits the stream will drain
        t.append(docs.filter("doc_id % 4 = 0"))
        t.delete(spark, "doc_id % 10 = 6")
        t.update(spark, "doc_id % 10 = 1",
          Map("text" -> "concat(text, ' streamsync streamsync')"))
        PhaseClock.markServe("q142_stream_index_sync")
        graft.streaming.StreamingEtl.textIndexSyncStream(spark,
          s"$tmp/corpus", s"$tmp/ix", "fp1", s"$tmp/ckpt").awaitTermination()
        val postT = graft.table.VersionedTable(s"$tmp/ix/postings")
        require(graft.dedup.TextIndexStore.stats(s"$tmp/ix")._1 ==
          t.read(spark).count(), "nd must equal the table's current row count")
        require(postT.properties.get("syncedVersion").contains(t.resolve().toString),
          "the cursor must sit at the table head after the drain")
        // checkpointed restart: drains instantly, moves NOTHING
        val vBefore = postT.latestVersion().get
        graft.streaming.StreamingEtl.textIndexSyncStream(spark,
          s"$tmp/corpus", s"$tmp/ix", "fp2", s"$tmp/ckpt").awaitTermination()
        require(postT.latestVersion().get == vBefore,
          "a checkpointed restart must not move the postings table")
        bm25TopK(spark, s"$tmp/ix", queries, 10)
      },
      Some(bm25OracleSql(queries, 10,
        corpusSql = """(SELECT doc_id,
          |  CASE WHEN doc_id % 10 = 1 THEN text || ' streamsync streamsync'
          |       ELSE text END AS text
          |FROM documents WHERE doc_id % 10 <> 6)""".stripMargin)))
  }

  /** q131: the VECTOR store follows its base table — the ANN-serving twin
    * of q130's BM25 sync. The store MIRRORS the table (mirror-mode
    * re-admission: nothing near-dup-rejects during sync), so after an
    * append + DELETE + embedding-rewriting UPDATE one
    * [[graft.dedup.VectorStore.syncFromTable]] call leaves the assigned
    * layout exactly "every current row at its top-1 centroid under the
    * BUILD-snapshot centroids" — which the oracle replays with the k-means
    * trained on the build corpus and the assignment run over the CURRENT
    * corpus (the split duckAssignedFromE). Serving proof: a fresh probe
    * batch's admit decisions against the synced store hash-match the
    * relational replay — deleted duplicates stop rejecting probes, negated
    * (updated) vectors reject only probes near their NEW direction. */
  val q131VectorTableSync: Q = {
    val eDef =
      """e AS (SELECT vec_id, label, embedding::DOUBLE[] AS v
        |      FROM embeddings WHERE vec_id % 5 <> 1),
        |cur AS (SELECT vec_id, label,
        |      CASE WHEN vec_id % 10 = 7
        |           THEN list_transform(embedding::DOUBLE[], x -> -x)
        |           ELSE embedding::DOUBLE[] END AS v
        |      FROM embeddings WHERE vec_id % 10 <> 3)""".stripMargin
    Q(
      "q131_vector_table_sync",
      (spark, dir) => {
        Tables.registerAll(spark, dir)
        val tmp = java.nio.file.Files.createTempDirectory("graft-q131-").toString
        val t = graft.table.VersionedTable(s"$tmp/emb")
        val emb = Tables.table(spark, dir, "embeddings")
          .select("vec_id", "label", "embedding")
        // v0 keeps the % 25 = 0 seed ids (a % 5 <> 0 split would exclude
        // every seed and trip the tiny-corpus every-vector fallback, which
        // the oracle's k-means replay does not model)
        t.commit(emb.filter("vec_id % 5 <> 1"), numPartitions = Some(4))
        graft.dedup.VectorStore.build(spark, s"$tmp/vx", t.read(spark))
        graft.dedup.VectorStore.markSynced(s"$tmp/vx", t.resolve())
        t.append(emb.filter("vec_id % 5 = 1"))
        t.delete(spark, "vec_id % 10 = 3")
        t.update(spark, "vec_id % 10 = 7",
          Map("embedding" -> "transform(embedding, x -> -x)"))
        PhaseClock.markServe("q131_vector_table_sync")
        val (a, e) = graft.dedup.VectorStore.syncFromTable(spark, s"$tmp/vx", t)
        require(a > 0 && e > 0, s"the sync must both admit and evict ($a/$e)")
        // mirror invariant: the store holds exactly the table's current rows
        require(graft.table.VersionedTable(s"$tmp/vx/assigned")
          .read(spark).count() == t.read(spark).count(),
          "the synced store must mirror the table row for row")
        require(graft.dedup.VectorStore.syncFromTable(spark, s"$tmp/vx", t)
          == ((0L, 0L)), "re-sync past the cursor must no-op")
        val probe = emb.filter("vec_id % 7 = 1")
          .selectExpr("vec_id + 1000000 AS vec_id", "label", "embedding")
        graft.dedup.VectorStore.admit(spark, s"$tmp/vx", probe)
      },
      Some(
        s"""WITH ${duckAssignedFromE(eDef, assignFrom = "cur")},
           |b AS (SELECT vec_id + 1000000 AS vec_id, embedding::DOUBLE[] AS v
           |      FROM embeddings WHERE vec_id % 7 = 1),
           |b_probed AS (
           |  SELECT vec_id, v, c_id FROM (
           |    SELECT b.vec_id, b.v, c.c_id,
           |      row_number() OVER (PARTITION BY b.vec_id
           |        ORDER BY round(${duckCos("b.v", "c.cv")}, 6) DESC,
           |                 c.c_id) AS rk
           |    FROM b, cents c) t
           |  WHERE rk <= 2),
           |near AS (
           |  SELECT ba.vec_id, min(a.vec_id) AS near_of
           |  FROM b_probed ba JOIN assigned a ON a.c_id = ba.c_id
           |  WHERE round(${duckCos("ba.v", "a.v")}, 6) >= 0.45
           |  GROUP BY ba.vec_id)
           |SELECT b.vec_id,
           |  CASE WHEN n.near_of IS NOT NULL THEN 'near_dup'
           |       ELSE 'admitted' END AS verdict,
           |  n.near_of AS dup_of
           |FROM b
           |LEFT JOIN near n ON n.vec_id = b.vec_id""".stripMargin))
  }

  val all: Seq[Q] = Seq(s1CosineTopK, s2AnnIvf, d5EmbeddingNearDup, s3SrpLsh,
    s4QuantizeInt8, s5KnnJoin, s6IvfPq, d11SemanticDedup, s7KmeansTrain,
    s8PqAdc, s9AnnRecall, s10AnnBatchServe, s11HybridRrf, s12AnnFiltered,
    s13RangeSearch, s14Bm25Stored, s15Bm25Admit, s16StreamBm25Admit,
    q127ForgetIndexed, s17MmrRerank, s18BooleanRetrieval, s19PhraseRetrieval,
    q130IndexTableSync, q131VectorTableSync, q142StreamIndexSync)
}
