package graft.dedup

import graft.table.{Merge, VersionedTable}
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
  * between [[rebalance]] runs (the standard IVF serving contract), and the
  * store TRACKS its own drift: [[admit]] bumps per-centroid load counters
  * in the cents table's properties (bounded — the centroid count caps at
  * 100k by the seed-modulus design, so the counter doc stays a
  * driver-side metadata read), [[imbalance]] reports the max/mean skew,
  * and [[rebalance]] re-trains centroids on the CURRENT store contents
  * and re-lays the partitions, riding the build path and committing as
  * new versions of the same lake-resident tables — a maintenance verb a
  * scheduled DAG runs when the skew bound trips, not a from-scratch
  * rebuild of anything outside the store.
  *
  * Scale: per batch — ONE broadcast-centroid ranking pass over the batch
  * (the top-p winners reduce map-side via the bounded `top_k_by`
  * aggregate: one k-slot row per vector crosses the wire, never the
  * batch × centroids candidate stream), one partition-pruned read of the
  * probed store slices, one within-partition join; append-only growth
  * between rebalances, plus an O(store) re-lay when one runs. */
object VectorStore {

  /** d5's near-dup verification threshold (rounded cosine). */
  val DefaultThreshold = 0.45

  /** Default probe width: the assigned partition plus the runner-up —
    * the cheapest setting that catches boundary-straddling near-dups. */
  val DefaultProbes = 2

  private def centsTable(root: String) = VersionedTable(s"$root/cents")
  private def assignedTable(root: String) = VersionedTable(s"$root/assigned")

  /** Per-centroid row counts from the cents table's `centroidLoad` property
    * (compact `cid:n,cid:n` encoding; bounded by the ≤100k centroid cap). */
  def load(root: String): Map[Long, Long] =
    centsTable(root).properties.get("centroidLoad").filter(_.nonEmpty)
      .map(_.split(',').map { kv =>
        val Array(c, n) = kv.split(':'); c.toLong -> n.toLong
      }.toMap).getOrElse(Map.empty)

  private def encodeLoad(m: Map[Long, Long]): String =
    m.toSeq.sortBy(_._1).map { case (c, n) => s"$c:$n" }.mkString(",")

  private def writeLoad(root: String, m: Map[Long, Long]): Unit =
    centsTable(root).setProperties(Map("centroidLoad" -> encodeLoad(m)))

  /** Max/mean partition skew of the tracked load — the rebalance trigger.
    * 1.0 is perfectly even; a store whose hot centroid holds 10× the mean
    * reports 10. Empty/untracked load reports 1.0 (nothing to skew).
    *
    * The tracked load is a monitoring CACHE: admit/evict bump it in a
    * property commit AFTER their data commit, so a crash between the two
    * leaves it skewed. Every reading that GATES an action re-derives the
    * exact counts from the assigned table first ([[rebalance]]'s
    * ifSkewAbove) and writes the reconciled counts back — the cache
    * self-heals at every gate, so a torn counter update can delay a
    * dashboard but never mis-gate a rebalance. */
  def imbalance(root: String): Double = imbalanceOf(load(root))

  private def imbalanceOf(counts: Map[Long, Long]): Double = {
    val m = counts.values.filter(_ > 0)
    if (m.isEmpty) 1.0
    else m.max.toDouble / (m.sum.toDouble / m.size)
  }

  private def countsOf(assigned: DataFrame): Map[Long, Long] =
    assigned.groupBy("c_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap

  /** Test-only fault injection: [[build]]/[[rebalance]] throw at the named
    * point — simulating the torn-operation crashes the completion stamp and
    * the rebalance pending marker exist for. Points: "buildAfterCents"
    * (centroids committed, assigned/stamp not), "rebalanceAfterCents"
    * (retrained centroids committed over the OLD partition layout),
    * "rebalanceAfterAssigned" (re-lay landed, load/modulus/marker commit
    * missing). */
  @volatile private[graft] var failpoint: Option[String] = None
  private def trip(p: String): Unit =
    if (failpoint.contains(p))
      throw new IllegalStateException(s"injected failure at $p")

  /** The torn-rebalance marker's property keys (cleared atomically with the
    * final load/modulus commit — marker present ⟺ a rebalance's tail is
    * missing and the store may be serving NEW centroids over the OLD
    * partition layout, the silently-wrong-probes tear). */
  private val RebalanceKeys = Seq("rebalancePending",
    "rebalancePendingCentsBase", "rebalancePendingAssignedBase",
    "rebalancePendingModulus")

  private def clearedRebalance = RebalanceKeys.map(_ -> "").toMap

  /** Roll a torn [[rebalance]] FORWARD (returns whether there was one).
    * Every post-retrain step is deterministic from the committed centroids
    * (the re-lay is assignTo over the store's own rows — row-preserving),
    * so the store returns to layout-consistent serving without retraining:
    *  - marker set, centroids unmoved → clear the marker (the retrain never
    *    committed; the store still serves the old generation consistently);
    *  - centroids committed, assigned unmoved → the MIXED-GENERATION tear:
    *    re-lay the partitions under the new centroids, then the final
    *    commit;
    *  - re-lay landed, load/modulus missing → the final commit alone. */
  def repairRebalance(spark: SparkSession, root: String): Boolean = {
    val centsT = centsTable(root)
    val assignedT = assignedTable(root)
    val props = centsT.properties
    if (!props.get("rebalancePending").contains("1")) return false
    val centsBase = props("rebalancePendingCentsBase").toLong
    val assignedBase = props("rebalancePendingAssignedBase").toLong
    if (centsT.latestVersion().contains(centsBase)) {
      centsT.setProperties(clearedRebalance)
      return true
    }
    if (assignedT.latestVersion().contains(assignedBase)) {
      graft.functions.GraftFunctions.registerAll(spark)
      val vecs = assignedT.read(spark).select("vec_id", "label", "v", "nv")
      assignedT.commit(
        graft.queries.SimilarityQueries.assignTo(vecs, centsT.read(spark))
          .repartition(col("c_id")),
        partitionBy = Seq("c_id"), collectStats = false)
    }
    centsT.setProperties(Map(
      "seedModulus" -> props("rebalancePendingModulus"),
      "centroidLoad" -> encodeLoad(countsOf(assignedT.read(spark))))
      ++ clearedRebalance)
    true
  }

  /** Normalize a raw (vec_id, label, embedding float[]) frame to the
    * store's (vec_id, label, v double[], nv) shape. */
  private def normalized(df: DataFrame): DataFrame =
    df.select(col("vec_id"), col("label"),
        col("embedding").cast("array<double>").as("v"))
      .withColumn("nv", graft.functions.VectorFunctions.l2Norm(col("v")))

  /** Bootstrap: train centroids on the corpus (the ONE full pass), store
    * corpus vectors partitioned by centroid. The final property commit
    * (carrying `indexFormat`) is the COMPLETION STAMP: a build that
    * crashed between its commits left no stamp, refuses to admit or
    * rebalance (both require the format), and is simply re-run — the
    * snapshot commits overwrite the torn halves. Only a COMPLETED store
    * refuses a rebuild. */
  def build(spark: SparkSession, root: String, corpus: DataFrame): Unit = {
    val centsT = centsTable(root)
    require(centsT.properties.get("indexFormat").isEmpty,
      s"$root already holds a completed vector store")
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
      trip("buildAfterCents")
      val centsDf = centsT.read(spark)
      // co-locate per partition value before the partitioned commit (the
      // default layout would emit tasks × values tiny files); stats off —
      // reads prune by PARTITION value only
      // pin the assignment once: the commit and the drift-tracker seed
      // both consume it — re-reading the just-committed table for the
      // counts paid a listing + scan for rows this build just computed
      val assignedDf = graft.queries.SimilarityQueries.assignTo(vecs, centsDf)
        .localCheckpoint(true)
      assignedTable(root).commit(
        assignedDf.repartition(col("c_id")),
        partitionBy = Seq("c_id"), collectStats = false)
      // seed the drift tracker from the pinned layout (one slim c_id
      // aggregation — the counts are exact, not an estimate to reconcile
      // later, and identical to a read-back of the commit it just fed)
      writeLoad(root, countsOf(assignedDf))
      // the completion stamp: only now is the store serveable/admittable
      centsT.setProperties(Map("indexFormat" -> "1", "seedModulus" -> m.toString))
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
    // a torn rebalance (new centroids over the old layout) repairs before
    // any probe reads — otherwise this admit would rank the new cents but
    // read mismatched c_id partitions and serve wrong verdicts
    repairRebalance(spark, root)
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
      // a stored row with the batch vector's OWN id is the vector itself
      // (a crash-replayed batch — ids are unique by contract): it is not a
      // duplicate, and treating it as one would flip the replay's verdict
      // to near_dup-of-itself, corrupting any persisted decisions log. The
      // self-exclusion plus the replay-append skip below make admit
      // IDEMPOTENT: a replayed batch returns the first run's decisions
      // byte for byte and appends nothing.
      val near = probeRows
        .join(stored.select(col("c_id"), col("vec_id").as("s_id"),
            col("v").as("sv"), col("nv").as("snv")), "c_id")
        .filter(col("s_id") =!= col("vec_id"))
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
      // batch ids already stored (the replayed vector sits in its own
      // top-1 partition, which the probe read): verdict stays "admitted",
      // the append skips them
      val existing = stored.select("vec_id")
        .join(vecs.select("vec_id"), Seq("vec_id"), "left_semi").distinct()
      val admitted = assignedBatch.join(
        decisions.filter(col("verdict") === "admitted").select("vec_id"), "vec_id")
        .join(existing, Seq("vec_id"), "left_anti")
      if (!admitted.isEmpty) {
        assignedTable(root).append(admitted.repartition(col("c_id")),
          collectStats = false)
        // drift tracking: bump the admitted mass per centroid (a collect of
        // ≤ #centroids rows — the same bound as the broadcast above)
        val prior = load(root)
        val deltas = countsOf(admitted)
        writeLoad(root, prior ++ deltas.map { case (c, n) =>
          c -> (prior.getOrElse(c, 0L) + n) })
      }
      decisions
    } finally { vecs.unpersist(); () }
  }

  /** Derived-index maintenance from the BASE TABLE's change feed — the
    * ANN-serving twin of [[graft.dedup.TextIndexStore.syncFromTable]]: the
    * store MIRRORS the table (every current row is stored), so sync evicts
    * the changed ids' stale rows and re-admits their CURRENT rows in
    * mirror mode (threshold 2.0 — rounded cosine can never reach it, so
    * nothing near-dup-rejects; the dedup-gate semantics stay available
    * through the ordinary [[admit]]). Inserts evict nothing, deletes admit
    * nothing, updates (changed embeddings) re-assign to their new top-1
    * centroid — centroids stay FIXED between [[rebalance]] runs, the
    * standard IVF serving contract, so a drifting table eventually trips
    * the skew gate like any admission stream. The synced cursor rides in
    * the cents properties; interrupted syncs converge on replay and a call
    * past the cursor is a loud no-op. Returns (admitted, evicted). */
  def syncFromTable(spark: SparkSession, root: String,
      table: graft.table.VersionedTable): (Long, Long) = {
    val centsT = centsTable(root)
    require(centsT.properties.get("indexFormat").contains("1"),
      s"$root was built by an incompatible vector-store format — rebuild")
    repairRebalance(spark, root)
    val head = table.resolve()
    val from = centsT.properties.get("syncedVersion").map(_.toLong)
      .getOrElse(throw new IllegalStateException(
        s"$root carries no syncedVersion cursor — markSynced(buildVersion) " +
          "after building the store from a table snapshot"))
    if (head <= from) return (0L, 0L)
    val changed = table.changeFeed(spark, from, head)
      .select("vec_id").distinct().localCheckpoint(true)
    // churn evict KEEPS the COW flavor — the MOR variant lost the sf0.1
    // A/B here too (serve 11.3 → 19.9 s); see TextIndexStore.syncFromTable
    val evicted = evict(spark, root, changed)
    val current = table.read(spark)
      .join(changed, Seq("vec_id")).select("vec_id", "label", "embedding")
    // Mirror-mode admission, specialized: at threshold 2.0 the rounded
    // cosine can never near-dup-reject, and the evict above just removed
    // every changed id — so the general admit's probe read, near-dup join,
    // and already-stored exclusion are all provably no-ops. What remains is
    // exactly the BUILD's own assign kernel (assignTo = the same top-1 the
    // general admit evaluates at cids(0)) plus the append and the drift
    // counters: identical rows, a store-partition read and three join jobs
    // fewer per sync.
    graft.functions.GraftFunctions.registerAll(spark)
    val vecs = normalized(current)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val admitted = try {
      val n = vecs.count()
      if (n > 0) {
        val assignedBatch = graft.queries.SimilarityQueries
          .assignTo(vecs, centsT.read(spark)).localCheckpoint(true)
        assignedTable(root).append(assignedBatch.repartition(col("c_id")),
          collectStats = false)
        val prior = load(root)
        val deltas = countsOf(assignedBatch)
        writeLoad(root, prior ++ deltas.map { case (c, cn) =>
          c -> (prior.getOrElse(c, 0L) + cn) })
      }
      n
    } finally { vecs.unpersist(); () }
    centsT.setProperties(Map("syncedVersion" -> head.toString))
    (admitted, evicted)
  }

  /** Record the table version a just-built store reflects — the cursor
    * [[syncFromTable]] advances from. */
  def markSynced(root: String, version: Long): Unit =
    centsTable(root).setProperties(Map("syncedVersion" -> version.toString))

  /** Erase vectors from the store — the right-to-be-forgotten verb
    * (SURVEY §2.12): after evict, no surviving assigned row carries a
    * forgotten vec_id, so probes and near-dup admission serve exactly as
    * if the store were built without those vectors (stored rows are
    * independent — nothing aggregates). The trained centroids are NOT
    * retrained (they are statistics of the historical corpus, not content
    * — the forgotten embedding itself leaves); old versions still
    * reference the rows until the store tables are vacuumed past the
    * evict commit. Cost: one slim scan locating the ids' partitions (the
    * store is partitioned by c_id, which a forget request doesn't know),
    * then a delete touching only the ids' files — a COW rewrite under the
    * PHYSICAL default (erasure-grade), MOR deletion vectors under
    * `physical = false` (the large-file trade; measured slower at gate
    * scale — see the body comment). Returns the number of vectors
    * erased. */
  def evict(spark: SparkSession, root: String, vecIds: DataFrame,
      physical: Boolean = true): Long = {
    val centsT = centsTable(root)
    require(centsT.latestVersion().isDefined,
      s"$root holds no vector store — build(corpus) first")
    repairRebalance(spark, root)
    val ids = vecIds.select("vec_id").distinct().localCheckpoint(true)
    // locate the victims' (vec_id, c_id) rows BEFORE the delete — one pinned
    // slim scan that feeds all three consumers: the load decrements, the
    // erasure count, and the delete merge itself. Keying the merge on c_id
    // (the PARTITION column) confines the COW rewrite to the victims' own
    // partitions: the assigned store commits stats-off, so a vec_id-keyed
    // merge found every file statless and rewrote the WHOLE store per evict
    // (at 100 TB: a full-store rewrite where only the victims' partitions
    // should move).
    val located = assignedTable(root).read(spark)
      .join(ids, Seq("vec_id"), "left_semi")
      .select("vec_id", "c_id").localCheckpoint(true)
    val victims = located.groupBy("c_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val erased = victims.values.sum
    if (erased == 0) return 0L
    // PHYSICAL (the RTBF default) = COW rewrite, so evict + vacuum removes
    // the embeddings' bytes; physical=false = MOR tombstones, skipping the
    // rewrite of every untouched row in the touched partitions — the
    // large-file trade only (it measured SLOWER at gate scale, sf0.1 A/B
    // serve 11.3 → 19.9 s; see TextIndexStore.evict). compact() is the DV
    // escape hatch when tombstones accumulate.
    // (vec_id, c_id) pairs match exactly the same rows a vec_id-only join
    // would (stored vec_ids are unique and located carries each victim's own
    // partition), and the c_id equi-conjunct is what lets the merge prune by
    // partition value
    val deleteOn = "source.c_id = target.c_id AND source.vec_id = target.vec_id"
    if (physical)
      assignedTable(root).mergeCow(spark, located, deleteOn,
        targetKey = "c_id", sourceKey = "c_id",
        whenMatchedDelete = Some(Merge.MatchedDelete(None)))
    else
      assignedTable(root).mergeMor(spark, located, deleteOn,
        targetKey = "c_id", sourceKey = "c_id",
        whenMatchedDelete = Some(Merge.MatchedDelete(None)))
    val prior = load(root)
    writeLoad(root, prior ++ victims.map { case (c, n) =>
      c -> math.max(0L, prior.getOrElse(c, 0L) - n) })
    erased
  }

  /** REINDEX — re-train centroids on the CURRENT store contents and re-lay
    * the partitions, as new versions of the same lake-resident tables (the
    * build path over the store's own rows; readers time-travel across it
    * like any commit). With `ifSkewAbove` set, runs only when
    * [[imbalance]] exceeds the bound — the shape a scheduled maintenance
    * DAG wants ("rebalance when the hot partition passes 4× the mean") —
    * and returns whether it ran. Serving semantics: probes after a
    * rebalance see the same vectors under better-balanced partitions;
    * recall changes only through centroid QUALITY, which retraining on the
    * drifted corpus improves over centroids trained on the original build
    * corpus alone. */
  def rebalance(spark: SparkSession, root: String,
      ifSkewAbove: Option[Double] = None): Boolean = {
    val centsT = centsTable(root)
    require(centsT.latestVersion().isDefined,
      s"$root holds no vector store — build(corpus) first")
    require(centsT.properties.get("indexFormat").contains("1"),
      s"$root was built by an incompatible vector-store format — rebuild")
    // a torn prior rebalance completes before anything is gated or retrained
    repairRebalance(spark, root)
    val assignedT = assignedTable(root)
    // the gate decides from EXACT counts re-derived off the assigned table,
    // never the cached property (a torn admit/evict counter update could
    // otherwise mis-gate forever); the fresh counts reconcile the cache
    if (ifSkewAbove.isDefined) {
      val fresh = countsOf(assignedT.read(spark))
      writeLoad(root, fresh)
      if (imbalanceOf(fresh) <= ifSkewAbove.get) return false
    }
    graft.functions.GraftFunctions.registerAll(spark)
    val vecs = assignedT.read(spark).select("vec_id", "label", "v", "nv")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try {
      val n = vecs.count()
      require(n > 0, s"cannot rebalance an empty vector store at $root")
      val m = graft.queries.SimilarityQueries.seedModulus(n)
      val cents0 = graft.queries.SimilarityQueries.trainedCents(spark, vecs, m)
      val cents =
        if (!cents0.isEmpty) cents0
        else {
          require(n <= 10000, s"no stored vec_id is divisible by the seed " +
            s"modulus $m — centroids cannot retrain; rebalance aborted")
          graft.queries.SimilarityQueries.trainedCents(spark, vecs, 1L)
        }
      // the torn-rebalance marker: one atomic property commit BEFORE the
      // retrain commit records the pre-rebalance versions — a crash leaving
      // new centroids over the old partition layout (probes would rank the
      // new cents but read mismatched c_id partitions: silently wrong
      // serving) is detected and rolled forward by the next verb
      centsT.setProperties(Map(
        "rebalancePending" -> "1",
        "rebalancePendingCentsBase" -> centsT.latestVersion().get.toString,
        "rebalancePendingAssignedBase" -> assignedT.latestVersion().get.toString,
        "rebalancePendingModulus" -> m.toString))
      centsT.commit(cents.coalesce(1))
      trip("rebalanceAfterCents")
      val centsDf = centsT.read(spark)
      assignedT.commit(
        graft.queries.SimilarityQueries.assignTo(vecs, centsDf)
          .repartition(col("c_id")),
        partitionBy = Seq("c_id"), collectStats = false)
      trip("rebalanceAfterAssigned")
      // load, modulus and the marker clear in ONE property commit — the
      // rebalance is atomic-or-repairable end to end
      centsT.setProperties(Map(
        "seedModulus" -> m.toString,
        "centroidLoad" -> encodeLoad(countsOf(assignedT.read(spark))))
        ++ clearedRebalance)
      true
    } finally { vecs.unpersist(); () }
  }
}
