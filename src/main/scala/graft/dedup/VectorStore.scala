package graft.dedup

import graft.table.VersionedTable
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Lake-resident IVF vector store for INCREMENTAL embedding near-dup
  * admission — the vector-space sibling of [[SignatureStore]] (SURVEY.md
  * §2.12): the corpus is assigned ONCE to deterministically trained
  * centroids and stored partitioned by centroid; every later batch is
  * admitted or rejected by probing ONLY its own centroid partitions of the
  * store — the corpus embeddings are never re-scanned whole.
  *
  * Store layout (each a [[VersionedTable]]):
  *  - `<root>/cents`:    (c_id, cv, ncv) — the centroids, trained once on
  *    the build corpus ([[graft.queries.SimilarityQueries.trainedCents]]:
  *    seeded init at `vec_id % m = 0`, Lloyd steps in exact integer space
  *    — deterministic and oracle-replayable);
  *  - `<root>/assigned`: (vec_id, label, v, nv, c_id) PARTITIONED BY c_id
  *    — the physical inverted-file layout, so admission reads only the
  *    batch's own centroid partitions (manifest pruning, zero I/O for the
  *    rest of the corpus).
  *
  * Admission semantics (MULTI-PROBE): a batch vector is a near-dup iff a
  * STORED vector in any of its top-`probes` centroid partitions (default
  * 2) has rounded cosine ≥ `threshold`; verdict `near_dup` with `dup_of`
  * = the minimum such stored vec_id, else `admitted` and the vector
  * appends to its TOP-1 partition. Probing the runner-up centroid closes
  * the classic single-probe IVF gap — a near-dup pair straddling a
  * centroid boundary lands in two different partitions and a one-probe
  * read never compares them; at `probes` = p the miss requires the dup to
  * sit outside ALL p closest partitions. `probes` is a serving knob (the
  * FAISS nprobe dial): recall rises and probe I/O grows linearly with it;
  * the store layout is identical for every setting. Centroids stay FIXED
  * after build (the standard IVF serving contract — retrain = rebuild):
  * assignment drift is bounded by the build corpus' coverage, exactly as
  * for the ANN index.
  *
  * Scale: per batch — ONE broadcast-centroid ranking pass over the batch
  * (the top-p winners reduce map-side via the bounded `top_k_by`
  * aggregate: one k-slot row per vector crosses the wire, never the
  * batch × centroids candidate stream), one partition-pruned read of the
  * probed store slices, one within-partition join; append-only growth. */
object VectorStore {

  /** d5's near-dup verification threshold (rounded cosine). */
  val DefaultThreshold = 0.45

  /** Default probe width: the assigned partition plus the runner-up —
    * the cheapest setting that catches boundary-straddling near-dups. */
  val DefaultProbes = 2

  private def centsTable(root: String) = VersionedTable(s"$root/cents")
  private def assignedTable(root: String) = VersionedTable(s"$root/assigned")

  /** Normalize a raw (vec_id, label, embedding float[]) frame to the
    * store's (vec_id, label, v double[], nv) shape. */
  private def normalized(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", graft.functions.VectorFunctions.l2Norm(col("v")))

  /** Bootstrap: train centroids on the corpus (the ONE full pass), store
    * corpus vectors partitioned by centroid. */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val centsT = centsTable(root)
    require(centsT.latestVersion().isEmpty, s"$root already holds a vector store")
    // the training path's aggregates (vec_sum_u6) resolve by name;
    // idempotent when the session extensions already injected them
    graft.functions.GraftFunctions.registerAll(spark)
    val vecs = normalized(corpus)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      require(n > 0, s"cannot build a vector store at $root from an empty " +
        "corpus — no centroids could be trained, and later batches would " +
        "assign nowhere (admit-without-store)")
      val m = graft.queries.SimilarityQueries.seedModulus(n)
      centsT.setProperties(Map("indexFormat" -> "1", "seedModulus" -> m.toString))
      val cents0 = graft.queries.SimilarityQueries.trainedCents(spark, vecs, m)
      // a corpus with no vec_id divisible by m would seed ZERO centroids —
      // a store that admits everything and appends nothing. Tiny corpora
      // fall back to every-vector-seeds; at scale (where m-divisible ids
      // are statistically guaranteed) an empty seed set means pathological
      // ids and the build refuses rather than degrading silently.
      val cents =
        if (!cents0.isEmpty) cents0
        else {
          require(n <= 10000, s"no corpus vec_id is divisible by the seed " +
            s"modulus $m — centroids cannot train; renumber the ids or " +
            "rebuild with a corpus containing m-divisible ids")
          graft.queries.SimilarityQueries.trainedCents(spark, vecs, 1L)
        }
      centsT.commit(cents.coalesce(1))
      val centsDf = centsT.read(spark)
      // co-locate per partition value before the partitioned commit (the
      // default layout would emit tasks × values tiny files); stats off —
      // reads prune by PARTITION value only
      assignedTable(root).commit(
        graft.queries.SimilarityQueries.assignTo(vecs, centsDf)
          .repartition(col("c_id")),
        partitionBy = Seq("c_id"), collectStats = false)
    } finally { vecs.unpersist(); () }
  }

  /** Admit `batch` (vec_id, label, embedding) against the store: one
    * decision row per batch vector — (vec_id, verdict, dup_of) — and the
    * admitted vectors append to their top-1 centroid partitions. */
  def admit(spark: SparkSession, root: String, batch: DataFrame,
      threshold: Double = DefaultThreshold,
      probes: Int = DefaultProbes): DataFrame = {
    require(probes > 0, s"probes must be positive, got $probes")
    val centsT = centsTable(root)
    require(centsT.latestVersion().isDefined,
      s"$root holds no vector store — build(corpus) first")
    require(centsT.properties.get("indexFormat").contains("1"),
      s"$root was built by an incompatible vector-store format — rebuild")
    graft.functions.GraftFunctions.registerAll(spark)
    val vecs = normalized(batch)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      vecs.count()
      // ONE centroid-ranking pass: rank every broadcast centroid per batch
      // vector, keep the top-`probes` ids best-first via the bounded
      // top_k_by aggregate (map-side combined — the candidate stream never
      // shuffles), re-attach the arrays by equi-join. cids(0) is the
      // assignment partition; the full list is the probe set.
      // Eager pin: this feeds the probe-key read, the near-dup join, AND
      // the admitted append — without it the pass runs three times.
      val ranked = vecs.crossJoin(broadcast(centsT.read(spark)))
        .withColumn("csim", graft.functions.VectorFunctions.cosineWithNorms6(
          col("v"), col("nv"), col("cv"), col("ncv")))
        .select(col("vec_id").as("b_vec"), col("c_id"), col("csim"))
        .groupBy(col("b_vec"))
        .agg(expr(s"top_k_by(c_id, csim, $probes)").as("cids"))
      val withProbes = vecs.join(ranked, col("vec_id") === col("b_vec"))
        .select(col("vec_id"), col("label"), col("v"), col("nv"), col("cids"))
        .localCheckpoint(true)
      val assignedBatch = withProbes.select(col("vec_id"), col("label"),
        col("v"), col("nv"), element_at(col("cids"), 1).as("c_id"))
      val probeRows = withProbes.select(col("vec_id"), col("v"), col("nv"),
        explode(col("cids")).as("c_id"))
      // partition-pruned probe: ONLY the batch's own probed centroid
      // partitions of the store are listed and read
      val (stored, _, _) = assignedTable(root).readPrunedByJoinKeys(
        spark, probeRows.select("c_id"), "c_id", "c_id")
      val near = probeRows
        .join(stored.select(col("c_id"), col("vec_id").as("s_id"),
            col("v").as("sv"), col("nv").as("snv")), "c_id")
        .withColumn("sim", graft.functions.VectorFunctions.cosineWithNorms6(
          col("v"), col("nv"), col("sv"), col("snv")))
        .filter(col("sim") >= threshold)
        .groupBy("vec_id").agg(min(col("s_id")).as("near_of"))
      val decisions = vecs.select(col("vec_id"))
        .join(near, Seq("vec_id"), "left")
        .select(col("vec_id"),
          when(col("near_of").isNotNull, lit("near_dup"))
            .otherwise(lit("admitted")).as("verdict"),
          col("near_of").as("dup_of"))
        .localCheckpoint(true)
      val admitted = assignedBatch.join(
        decisions.filter(col("verdict") === "admitted").select("vec_id"), "vec_id")
      if (!admitted.isEmpty)
        assignedTable(root).append(admitted.repartition(col("c_id")),
          collectStats = false)
      decisions
    } finally { vecs.unpersist(); () }
  }
}
