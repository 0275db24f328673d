package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Minimal versioned-parquet table format: snapshot isolation via per-version
  * manifest files over immutable parquet data files.
  *
  * Plays the role Delta Lake plays in the reference — full-snapshot load
  * (`DeltaLakeLoad`, `example/notebook/scd2-job.ipynb:163-172`), versioned read
  * with time travel (`DeltaLakeExtract` + `"relativeVersion": -1`,
  * `scd2-job.ipynb:419-426,462-471`) and the ACID/time-travel story the
  * notebook motivates (`scd2-job.ipynb:153`). The reference's Athena interop
  * via `_symlink_format_manifest` (`scd2-job.ipynb:382`) is literally "a
  * version is a file list" — which is exactly this format.
  *
  * Layout:
  * {{{
  *   <root>/data/<uuid>/part-*.parquet   -- immutable data files, one dir per commit
  *   <root>/dv/<uuid>/part-*.parquet     -- deletion-vector tombstones (file, row_index)
  *   <root>/_graft_log/v00000042.json    -- manifest: {"version":42,"files":[...],"dvs":[...]}
  * }}}
  *
  * Commit protocol (single-writer): write data files to a fresh uuid dir, write
  * the next manifest to a temp name, atomic-rename into place. Readers list the
  * log dir and resolve max version (or latest+relativeVersion) — they only ever
  * see fully committed versions, giving snapshot isolation. At cluster scale
  * the same protocol works on any store with atomic rename (HDFS) — for S3 the
  * commit would become a conditional PUT of the manifest; data files are
  * immutable either way, so reads never require list-after-write consistency
  * beyond the log dir.
  *
  * An empty `files` list is a valid version (empty table). Version 0 is created
  * by the first commit.
  */
final class VersionedTable(val root: String,
    store: CommitStore = LinkCommitStore) {
  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(root, "_graft_log")
  private def dataDir: Path = Paths.get(root, "data")
  private def dvDir: Path = Paths.get(root, "dv")
  private def cdfDir: Path = Paths.get(root, "cdf")
  private def bloomDir: Path = Paths.get(root, "bloom")

  private def manifestPath(v: Long): Path = logDir.resolve(f"v$v%08d.json")

  /** List a directory's entry names without leaking the stream's fd. */
  private def listNames(dir: Path): Seq[String] =
    Option(dir.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)

  /** All committed versions, ascending. */
  def versions(): Seq[Long] = {
    if (!Files.isDirectory(logDir)) return Seq.empty
    listNames(logDir)
      .collect { case s if s.matches("v\\d{8}\\.json") => s.substring(1, 9).toLong }
      .sorted
  }

  def latestVersion(): Option[Long] = versions().lastOption

  /** Resolve `relativeVersion` (0 or negative, relative to latest — the
    * reference's `options.relativeVersion: -1`, scd2-job.ipynb:471) or an
    * absolute `versionAsOf`. */
  /** Highest manifest format this reader understands. Every commit stamps
    * its format version; a manifest written by a NEWER engine raises a
    * clear error at resolve time instead of silently misreading fields
    * this build doesn't know exist (the Delta `minReaderVersion` shape,
    * collapsed to one linear number — pre-stamping manifests read as
    * version 1, which is exactly what they are). Format 1 is a
    * self-contained snapshot (full `files`/`stats`/`partitions`/`dvs`);
    * format 2 is a per-commit DELTA (`add`/`remove`/`dvAdd`/`dvRemove`
    * against the previous version) replayed from the nearest anchor —
    * Delta's actual log protocol, what keeps commit cost O(batch) instead
    * of O(live files) on a million-file table. */
  private val SupportedFormatVersion = 2L
  private val ManifestFormatFull = 1L
  private val ManifestFormatDelta = 2L

  private def checkFormatReadable(v: Long): Unit = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (node.has("formatVersion") &&
        node.get("formatVersion").asLong() > SupportedFormatVersion)
      throw new IllegalStateException(
        s"version $v of $root uses table format " +
          s"${node.get("formatVersion").asLong()}, newer than this engine's " +
          s"$SupportedFormatVersion — upgrade the engine to read this table")
  }

  def resolve(relativeVersion: Option[Int] = None, versionAsOf: Option[Long] = None): Long = {
    val vs = versions()
    val latest = vs.lastOption.getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    val resolved = (relativeVersion, versionAsOf) match {
      case (Some(r), _) =>
        require(r <= 0, s"relativeVersion must be <= 0, got $r")
        val v = latest + r
        require(v >= 0, s"relativeVersion $r reaches before version 0 (latest=$latest)")
        // the manifest may have been vacuumed: fail with the real story, not
        // a NoSuchFileException out of filesOf
        require(vs.contains(v),
          s"version $v (relativeVersion $r) is no longer retained at $root (vacuumed)")
        v
      case (_, Some(v)) =>
        require(vs.contains(v), s"version $v not committed at $root")
        v
      case _ => latest
    }
    checkFormatReadable(resolved)
    resolved
  }

  /** Number of deletion-vector sidecar files the head (or `v`) references —
    * the observable MOR debt: 0 means every read is DV-join-free. The
    * DESCRIBE DETAIL-style health probe a compaction scheduler keys on. */
  def dvFileCount(v: Option[Long] = None): Int =
    dvsOf(v.getOrElse(resolve())).size

  /** SHALLOW CLONE (Delta `CLONE` parity): a new independent table at
    * `targetRoot` whose version 0 is this table's current snapshot — data
    * files, stats, deletion vectors, partition layout, constraints, and
    * table properties — created WITHOUT copying data: every referenced file
    * is hard-linked (same-filesystem, O(files) metadata ops, zero bytes;
    * cross-device falls back to a copy per file). Hard links keep names
    * table-relative, so every existing mechanism — DV keys, touched-file
    * detection, stats skipping, vacuum — works on the clone unchanged, and
    * divergence is free: writes to either side rewrite/append their OWN
    * manifest chain, and vacuum unlinks only a root's own links (the inode
    * survives while any table references it). On object stores the analogue
    * is server-side copy or absolute-path references (the CommitStore
    * conditional-PUT discussion); hard links are the local/HDFS-native form
    * of the same zero-copy contract. Txn marks and the CDF history do NOT
    * carry (Delta semantics: the clone is a new table with a fresh history).
    * `versionAsOf` pins the cloned snapshot (Delta's `CLONE ... VERSION AS
    * OF` — reproduce a historical state as a NEW table for debugging or
    * experiment pinning); constraints, partition spec, identity state, and
    * stats all come from THAT version's manifest. Returns the clone. */
  def cloneShallow(targetRoot: String,
      versionAsOf: Option[Long] = None): VersionedTable =
    cloneTo(targetRoot, deep = false, versionAsOf)

  /** DEEP CLONE: same manifest-level copy as [[cloneShallow]] but every
    * data and DV file is BYTE-COPIED, never hard-linked — the clone shares
    * no storage with the source, so it survives anything that mutates the
    * source's file bytes in place and its storage bills independently (the
    * backup / environment-promotion verb, vs the shallow clone's instant
    * dev-copy). On stores without hard links the two verbs converge —
    * shallow's link attempt already falls back to a copy. */
  def cloneDeep(targetRoot: String,
      versionAsOf: Option[Long] = None): VersionedTable =
    cloneTo(targetRoot, deep = true, versionAsOf)

  private def cloneTo(targetRoot: String, deep: Boolean,
      versionAsOf: Option[Long] = None): VersionedTable = {
    val v = resolve(None, versionAsOf)
    val tgt = VersionedTable(targetRoot)
    require(tgt.latestVersion().isEmpty,
      s"clone target $targetRoot already has a committed version")
    val refs = filesOf(v) ++ dvsOf(v)
    refs.foreach { f =>
      val src = Paths.get(root).resolve(f)
      val dst = Paths.get(targetRoot).resolve(f)
      Files.createDirectories(dst.getParent)
      if (deep) { Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
      else {
        try { Files.createLink(dst, src); () }
        catch { case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
          Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
        }
      }
    }
    // column ids must be COPIED, not re-derived: the hard-linked files
    // carry the SOURCE's parquet field ids, and after a source rename/drop
    // those are not ordinals — freshly minted ids would make the clone's
    // by-id reads resolve the wrong columns. An id-less source clones
    // id-less (Some(empty) suppresses derivation), staying by-name.
    tgt.publish(filesOf(v), schemaOf(v).map(_.json).getOrElse(
        throw new IllegalStateException(s"version $v of $root has no recorded schema")),
      statsOf(v), txn = None, base = None, constraints = constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v),
      columnIdsOverride = Some(columnIdsOf(v)),
      maxColumnIdFloor = maxColumnIdOf(v),
      operation = Some("CLONE"),
      // the identity declaration + high water carry: ids already handed
      // out on the source must stay closed on the clone too (a clone that
      // re-opened the range would mint duplicates of cloned rows' ids);
      // the ALWAYS/BY DEFAULT mode must carry explicitly — base=None here,
      // so the publish-side base fallback cannot supply it
      identity = identityOf(v),
      identityAllowExplicit = Some(identityAllowsExplicit(v)))
    val props = properties
    if (props.nonEmpty) tgt.setProperties(props)
    // provenance stamp (AFTER the source-property copy, which may carry a
    // cloneSource of the source's own ancestor): [[cloneSync]] refuses to
    // publish over a target this table did not create
    tgt.setProperties(Map("cloneSource" -> Paths.get(root).toAbsolutePath.toString))
    tgt
  }

  /** Incremental clone refresh — the re-runnable face of CLONE (Delta's
    * `CREATE OR REPLACE ... CLONE src` run nightly as a backup): bring an
    * existing clone up to this table's CURRENT snapshot by transferring
    * ONLY the referenced data/DV files the target does not already hold
    * (files are immutable under content-addressed commit dirs, so presence
    * IS identity) and publishing ONE new target version with the source
    * snapshot's manifest metadata. At 100 TB a nightly re-clone costs
    * O(day's churn), not O(table); the target's own version chain becomes
    * the backup's restore-point history (old sync points stay
    * time-travelable until the TARGET is vacuumed). Refuses a target this
    * table did not create (`cloneSource` provenance property). A target
    * already at the source snapshot is a no-op — no version burned. A
    * crash mid-copy leaves unreferenced files on the target (storage, not
    * correctness); the re-run skips what landed and converges. Returns
    * (filesTransferred, filesReferenced). */
  def cloneSync(targetRoot: String, deep: Boolean = true): (Int, Int) = {
    val v = resolve()
    val tgt = VersionedTable(targetRoot)
    require(tgt.latestVersion().isDefined,
      s"clone-sync target $targetRoot holds no table — cloneShallow/cloneDeep first")
    val srcId = Paths.get(root).toAbsolutePath.toString
    require(tgt.properties.get("cloneSource").contains(srcId),
      s"$targetRoot is not a clone of $root (cloneSource mismatch) — " +
        "refusing to publish over an unrelated table's history")
    val files = filesOf(v)
    val dvs = dvsOf(v)
    val refs = files ++ dvs
    val tgtHead = tgt.resolve()
    // AUTHORITATIVE property mirror, not a merge: a property the source
    // removed (bloomIndexColumns, appendOnly, ...) must leave the backup
    // too, or nightly syncs accumulate stale flags forever. The source set
    // (plus the target-only cloneSource provenance) replaces the target's
    // document; removals ride setProperties' empty-value convention.
    def mirrorProps(): Unit = {
      val src = properties
      val stale = (tgt.properties.keySet -- src.keySet - "cloneSource")
        .map(_ -> "").toMap
      tgt.setProperties(src ++ stale + ("cloneSource" -> srcId))
    }
    // the no-op proof covers EVERY manifest-metadata face a restore serves,
    // not just data: constraints, partition spec, and identity can change
    // with the file set, DVs, and schema all equal — a sync that skipped
    // publishing then would hand a restore a backup missing the source's
    // CHECK constraint or partition evolution until the next data churn
    if (tgt.filesOf(tgtHead).toSet == files.toSet &&
        tgt.dvsOf(tgtHead).toSet == dvs.toSet &&
        tgt.schemaOf(tgtHead).map(_.json) == schemaOf(v).map(_.json) &&
        tgt.constraintsOf(tgtHead) == constraintsOf(v) &&
        tgt.partitionByOf(tgtHead) == partitionByOf(v) &&
        tgt.identityOf(tgtHead) == identityOf(v) &&
        tgt.identityAllowsExplicit(tgtHead) == identityAllowsExplicit(v)) {
      // data and metadata are current, but a prior sync may have crashed
      // between its publish and its property commit — re-assert the
      // mirrored props (a no-op commit when they already match)
      mirrorProps()
      return (0, refs.size)
    }
    var copied = 0
    refs.foreach { f =>
      val src = Paths.get(root).resolve(f)
      val dst = Paths.get(targetRoot).resolve(f)
      if (!Files.exists(dst)) {
        copied += 1
        Files.createDirectories(dst.getParent)
        if (deep) { Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING); () }
        else {
          try { Files.createLink(dst, src); () }
          catch { case _: UnsupportedOperationException | _: java.nio.file.FileSystemException =>
            Files.copy(src, dst, java.nio.file.StandardCopyOption.REPLACE_EXISTING); ()
          }
        }
      }
    }
    tgt.publish(files, schemaOf(v).map(_.json).getOrElse(
        throw new IllegalStateException(s"version $v of $root has no recorded schema")),
      statsOf(v), txn = None, base = Some(tgtHead), constraints = constraintsOf(v),
      dvs = dvs, partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v),
      columnIdsOverride = Some(columnIdsOf(v)),
      maxColumnIdFloor = maxColumnIdOf(v),
      operation = Some("CLONE"),
      identity = identityOf(v),
      identityAllowExplicit = Some(identityAllowsExplicit(v)),
      // the sync MIRRORS the source: a source that dropped its identity
      // must not leave the target's carried declaration re-minting ids
      identityClear = identityOf(v).isEmpty)
    mirrorProps()
    (copied, refs.size)
  }

  /** Version `v`'s commit wall-clock in ms: the manifest's IN-COMMIT
    * `commitTimeMs` stamp when present (written by [[publish]] since this
    * format revision, strictly monotonic across versions), else the
    * manifest file's mtime (legacy manifests — immutable once linked, so
    * the mtime was the publish time IF nothing has since touched the file).
    * The in-commit stamp is what makes timestamp time travel, RESTORE TO
    * TIMESTAMP, history, and hours-based vacuum survive backup/restore,
    * cross-store copies, and object stores whose metadata ops rewrite
    * mtimes — Delta's in-commit-timestamps feature, collapsed to one field. */
  def commitTimeOf(v: Long): Long = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (node.has("commitTimeMs")) node.get("commitTimeMs").asLong()
    else Files.getLastModifiedTime(manifestPath(v)).toMillis
  }

  /** Timestamp time travel (Delta's `timestampAsOf`): the newest version
    * committed at or before `ts` per [[commitTimeOf]] (in-commit stamp,
    * mtime for legacy manifests). Millisecond input; refuses a timestamp
    * that precedes the oldest RETAINED version (vacuum may have dropped
    * earlier ones — resolving to a wrong-but-plausible version would be a
    * silent correctness hole). */
  def resolveAsOfTimestamp(ts: Long): Long = {
    val vs = versions()
    require(vs.nonEmpty, s"no committed version at $root")
    val stamped = vs.map(v => v -> commitTimeOf(v))
    val at = stamped.filter(_._2 <= ts).map(_._1).maxOption
    at.getOrElse(throw new IllegalArgumentException(
      s"timestamp $ts precedes the oldest retained version of $root " +
        s"(earliest commit at ${stamped.head._2}); earlier versions may have been vacuumed"))
  }

  // ---- file-level state reconstruction (delta-manifest replay) ----------
  //
  // A version's live file set is no longer guaranteed to sit in its own
  // manifest: format-2 manifests record only the commit's add/remove delta.
  // State is materialized by replaying the delta tail forward from the
  // nearest ANCHOR at or below the requested version, where an anchor is
  //  - a snapshot already reconstructed in this JVM (fingerprint-validated
  //    LRU cache — manifests are immutable in place, but a table dropped
  //    and recreated at the same path, or a vacuum materializing the
  //    retention floor, replaces the file and the fingerprint catches it),
  //  - a checkpoint's full-state JSON sidecar ([[checkpoint]]), or
  //  - a self-contained (format-1) manifest: version 0 always, overwrites
  //    (their delta would be bigger than the snapshot), every
  //    [[VersionedTable.SnapshotEvery]]-th commit past the last anchor on
  //    checkpoint-less tables, and the retention floor after a vacuum.
  // The walk therefore terminates inside the retained tail, and per-commit
  // manifest bytes stay proportional to the BATCH, not the table.

  private lazy val canonicalRoot: String =
    Paths.get(root).toAbsolutePath.normalize.toString

  private def readManifestNode(v: Long): com.fasterxml.jackson.databind.JsonNode =
    mapper.readTree(Files.readAllBytes(manifestPath(v)))

  private def isFullManifest(node: com.fasterxml.jackson.databind.JsonNode): Boolean =
    node.has("files")

  private def manifestFpOpt(v: Long): Option[VersionedTable.ManifestFp] =
    try {
      val a = Files.readAttributes(manifestPath(v),
        classOf[java.nio.file.attribute.BasicFileAttributes])
      Some(VersionedTable.ManifestFp(a.size(), a.lastModifiedTime(), a.fileKey()))
    } catch { case _: java.io.IOException => None }

  private def parseFileStats(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, (String, String, String)] =
    node.properties().asScala.map { c =>
      val arr = c.getValue
      val kind = if (arr.size() > 2) arr.get(2).asText() else "str"
      c.getKey -> (arr.get(0).asText(), arr.get(1).asText(), kind)
    }.toMap

  private def parseFileParts(node: com.fasterxml.jackson.databind.JsonNode)
      : Map[String, Option[String]] =
    node.properties().asScala.map { c =>
      c.getKey -> (if (c.getValue.isNull) None else Some(c.getValue.asText()))
    }.toMap

  private def parseFullState(node: com.fasterxml.jackson.databind.JsonNode)
      : VersionedTable.TableState = {
    val files = node.get("files").elements().asScala.map(_.asText()).toVector.sorted
    val stats =
      if (!node.has("stats")) Map.empty[String, Map[String, (String, String, String)]]
      else node.get("stats").properties().asScala
        .map(e => e.getKey -> parseFileStats(e.getValue)).toMap
    val parts =
      if (!node.has("partitions")) Map.empty[String, Map[String, Option[String]]]
      else node.get("partitions").properties().asScala
        .map(e => e.getKey -> parseFileParts(e.getValue)).toMap
    val dvs =
      if (!node.has("dvs")) Vector.empty[String]
      else node.get("dvs").elements().asScala.map(_.asText()).toVector.sorted
    VersionedTable.TableState(files, stats, parts, dvs)
  }

  /** Apply one delta manifest to its predecessor's state. `add` entries are
    * UPSERTS (a carried file whose stats/partition values were restated —
    * e.g. a zone-mismatch stats drop — re-records under its path). */
  private def applyDelta(prev: VersionedTable.TableState,
      node: com.fasterxml.jackson.databind.JsonNode): VersionedTable.TableState = {
    val removed: Set[String] =
      if (!node.has("remove")) Set.empty
      else node.get("remove").elements().asScala.map(_.asText()).toSet
    var stats = if (removed.isEmpty) prev.stats else prev.stats -- removed
    var parts = if (removed.isEmpty) prev.parts else prev.parts -- removed
    val addB = Vector.newBuilder[String]
    if (node.has("add")) node.get("add").properties().asScala.foreach { e =>
      val f = e.getKey
      addB += f
      val ent = e.getValue
      if (ent.has("stats")) stats += f -> parseFileStats(ent.get("stats"))
      else stats -= f
      if (ent.has("partitions")) parts += f -> parseFileParts(ent.get("partitions"))
      else parts -= f
    }
    val adds = addB.result()
    val addSet = adds.toSet
    val files = (prev.files.filterNot(f => removed(f) || addSet(f)) ++ adds).sorted
    val dvRemoved: Set[String] =
      if (!node.has("dvRemove")) Set.empty
      else node.get("dvRemove").elements().asScala.map(_.asText()).toSet
    val dvAdds =
      if (!node.has("dvAdd")) Vector.empty[String]
      else node.get("dvAdd").elements().asScala.map(_.asText()).toVector
    val dvAddSet = dvAdds.toSet
    val dvs = (prev.dvs.filterNot(d => dvRemoved(d) || dvAddSet(d)) ++ dvAdds).sorted
    VersionedTable.TableState(files, stats, parts, dvs)
  }

  /** Version of the newest SELF-CONTAINED manifest at or below `v` (itself
    * when full, else the anchor its delta recorded). Heuristic input to the
    * snapshot-cadence decision only — reads discover anchors dynamically. */
  private def anchorVersionOf(v: Long): Long = {
    val node = readManifestNode(v)
    if (isFullManifest(node)) v
    else if (node.has("anchor")) node.get("anchor").asLong()
    else v
  }

  /** Reconstructed file-level state of version `v`. One retry absorbs a
    * racing vacuum deleting/materializing manifests mid-walk. */
  private[table] def stateOf(v: Long): VersionedTable.TableState =
    try stateOfAttempt(v)
    catch { case _: java.nio.file.NoSuchFileException => stateOfAttempt(v) }

  private def stateOfAttempt(v: Long): VersionedTable.TableState = {
    val lru = VersionedTable.lruFor(canonicalRoot)
    def cached(w: Long): Option[VersionedTable.TableState] =
      lru.get(w).filter { case (fp, _) => manifestFpOpt(w).contains(fp) }.map(_._2)
    cached(v).getOrElse {
      // walk back to the nearest anchor, collecting the delta tail
      var tail = List.empty[(Long, com.fasterxml.jackson.databind.JsonNode)]
      var w = v
      var base: Option[(Long, VersionedTable.TableState)] = None
      while (base.isEmpty) {
        base = checkpointStateAt(w).map(w -> _)
        if (base.isEmpty) {
          val node = readManifestNode(w)
          if (isFullManifest(node)) base = Some(w -> parseFullState(node))
          else {
            tail = (w, node) :: tail
            require(w > 0, s"delta manifest chain of $root reaches below version 0")
            w -= 1
            base = cached(w).map(w -> _)
          }
        }
      }
      var st = base.get._2
      if (tail.isEmpty) manifestFpOpt(v).foreach(fp => lru.put(v, fp, st))
      tail.foreach { case (x, node) =>
        st = applyDelta(st, node)
        manifestFpOpt(x).foreach(fp => lru.put(x, fp, st))
      }
      st
    }
  }

  private[graft] def filesOf(v: Long): Seq[String] = stateOf(v).files

  /** Deletion-vector sidecar files of a version (table-relative paths).
    * Each DV parquet holds (file STRING, row_index BIGINT) tombstones — the
    * row positions MERGE-ON-READ deletes marked dead without rewriting the
    * data file (see [[deleteMor]]). The manifest lists every DV file in
    * force; reads anti-join their union. */
  private def dvsOf(v: Long): Seq[String] = stateOf(v).dvs

  /** How version `v`'s row-level changes were captured at write time:
    *  - `Some("files")`  — change rows stored under `cdf/` ([[cdfFilesOf]])
    *  - `Some("append")` — the inserts ARE the fresh data files (file-list
    *    diff against the previous version; nothing stored twice)
    *  - `Some("none")`   — provably no row changes (compaction, metadata-only)
    *  - `None`           — unknown (overwrite/restore/legacy): [[changeFeed]]
    *    falls back to a stepwise snapshot re-diff for this version. */
  def cdfKindOf(v: Long): Option[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("cdfKind")) None else Some(node.get("cdfKind").asText())
  }

  /** Table-relative parquet files holding version `v`'s stored change rows
    * (full row + `_change_type` 'insert'/'delete'), present iff
    * `cdfKindOf(v) == Some("files")`. */
  def cdfFilesOf(v: Long): Seq[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("cdf")) Seq.empty
    else node.get("cdf").elements().asScala.map(_.asText()).toSeq
  }

  /** Per-file column stats recorded at commit: file → col → (min, max) as
    * strings (numeric-comparable via the original type at prune time). */
  private[graft] def statsOf(v: Long): Map[String, Map[String, (String, String, String)]] =
    stateOf(v).stats

  /** The session time zone the manifest's stats strings were RENDERED in
    * (absent in manifests predating zone recording). Temporal stats are
    * zone-dependent (`cast(ts AS STRING)` renders the instant in the writer
    * session's zone); the prune-time comparison is lexicographic, so filter
    * values must be rendered in the SAME zone or live files can be silently
    * dropped. */
  def statsZoneOf(v: Long): Option[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (node.has("statsZone")) Some(node.get("statsZone").asText()) else None
  }

  /** The zone to render pushed temporal filter values in when pruning
    * version `v` (or the resolved head): the manifest's recorded stats zone
    * when present, else the read session's zone (the pre-recording
    * assumption — correct whenever writer and reader share a zone, which
    * legacy manifests cannot distinguish). */
  def statsRenderZone(spark: SparkSession, relativeVersion: Option[Int] = None,
      versionAsOf: Option[Long] = None): String =
    statsZoneOf(resolve(relativeVersion, versionAsOf))
      .getOrElse(spark.sessionState.conf.sessionLocalTimeZone)

  /** The identity column and its allocation high water, if this version's
    * manifest declares one ([[enableIdentity]]): every id ever handed out
    * is ≤ highWater, and [[appendIdentity]] allocates strictly above it.
    * Carried forward by every publish, so rewrites, restores, and time
    * travel never re-open an allocated range (Delta's identity contract:
    * unique and increasing, gaps allowed). */
  def identityOf(v: Long): Option[(String, Long)] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("identity")) None
    else Some((node.get("identity").get("col").asText(),
      node.get("identity").get("highWater").asLong()))
  }

  /** Whether the identity declaration is GENERATED BY DEFAULT (explicit
    * values accepted; the watermark advances past them at publish) rather
    * than GENERATED ALWAYS (explicit writes refused). Both are Delta's
    * variants; BY DEFAULT is what migration backfills need — insert
    * historical ids as-is, allocate for new rows. */
  def identityAllowsExplicit(v: Long): Boolean = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    node.has("identity") && node.get("identity").has("allowExplicit") &&
      node.get("identity").get("allowExplicit").asBoolean()
  }

  /** CHECK constraints recorded in a version's manifest: name → SQL
    * expression every row of the table must satisfy (see [[addConstraint]]).
    * Constraints are version-pinned metadata like the schema — RESTORE rolls
    * them back, time travel sees the constraints of the version read. */
  def constraintsOf(v: Long): Map[String, String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("constraints")) return Map.empty
    node.get("constraints").properties().asScala
      .map(e => e.getKey -> e.getValue.asText()).toMap
  }

  /** Stable column ids of a version's logical schema (name → id), the
    * identity that survives RENAME COLUMN: data files carry the id in
    * their parquet field metadata, so reads resolve by id and a rename is
    * one manifest write — no file is touched. Absent (empty) for manifests
    * predating id tracking: those tables read by name exactly as before
    * and cannot rename without a rewrite. */
  def columnIdsOf(v: Long): Map[String, Long] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("columnIds")) return Map.empty
    node.get("columnIds").properties().asScala
      .map(e => e.getKey -> e.getValue.asLong()).toMap
  }

  /** High-water column id (never reused): a column dropped and re-added
    * under the same name gets a FRESH id, so by-id reads correctly resolve
    * the old files' same-named column to null — re-adding does not
    * resurrect dropped data. */
  def maxColumnIdOf(v: Long): Long = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (node.has("maxColumnId")) node.get("maxColumnId").asLong()
    else columnIdsOf(v).values.maxOption.getOrElse(0L)
  }

  /** The schema recorded in a version's manifest (every commit records it).
    * When the version tracks column ids, each top-level field carries its
    * stable id as `parquet.field.id` metadata — the read funnel's parquet
    * resolution then matches files BY ID, which is what makes RENAME
    * COLUMN metadata-only. */
  def schemaOf(v: Long): Option[org.apache.spark.sql.types.StructType] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("schema")) None
    else {
      val s = org.apache.spark.sql.types.DataType.fromJson(
        node.get("schema").asText()).asInstanceOf[org.apache.spark.sql.types.StructType]
      val ids = columnIdsOf(v)
      if (ids.isEmpty) Some(s)
      else Some(org.apache.spark.sql.types.StructType(s.fields.map { f =>
        ids.get(f.name).fold(f) { id =>
          f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
            .withMetadata(f.metadata).putLong(VersionedTable.FieldIdKey, id).build())
        }
      }))
    }
  }

  /** Partition columns recorded in a version's manifest (Delta-style
    * partition layout: [[commit]]'s `partitionBy`). Empty = unpartitioned. */
  def partitionByOf(v: Long): Seq[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("partitionBy")) Seq.empty
    else node.get("partitionBy").elements().asScala.map(_.asText()).toSeq
  }

  /** Per-file partition values recorded at commit: file → col → value
    * (None = the hive null partition). The manifest is the partition index —
    * [[readPartitioned]] prunes the file list against these values with NO
    * data or directory I/O, the Delta partition-pruning shape. */
  def partitionValuesOf(v: Long): Map[String, Map[String, Option[String]]] =
    stateOf(v).parts

  /** Whether any live file of version `v` was written under a partition
    * layout other than the CURRENT spec — i.e. an [[alterPartitioning]]
    * happened and the table has not been fully rewritten since. Reads and
    * row-level rewrites handle the mix transparently; partition-DIRECTED
    * verbs (dynamic overwrite, SHOW PARTITIONS, symlink manifests) refuse
    * on it and point at OPTIMIZE. */
  def mixedLayoutOf(v: Long): Boolean = {
    val pbSet = partitionByOf(v).toSet
    val vals = partitionValuesOf(v)
    filesOf(v).exists(f => vals.getOrElse(f, Map.empty).keySet != pbSet)
  }

  /** Partition evolution (Iceberg's layout verb, METADATA-ONLY): change the
    * table's partition spec for future writes without rewriting a single
    * file. Existing files keep the layout of the epoch they were written
    * under — the manifest already records partition values PER FILE, reads
    * union one scan per layout epoch ([[scanLive]]), partition-pruned reads
    * keep pre-evolution files conservatively and re-apply the predicate as
    * a row filter, and every rewrite (OPTIMIZE, DELETE, UPDATE, MERGE,
    * REPLACE WHERE) lays touched rows out in the CURRENT spec — so a plain
    * OPTIMIZE migrates the whole table when wanted. At 100 TB this is the
    * only affordable way to change partitioning: rewriting a petabyte of
    * history to re-bucket it is not a plan. `newPartitionBy = Nil` evolves
    * to unpartitioned. SQL spelling:
    * `ALTER TABLE '<path>' SET PARTITIONED BY (c1[, c2...])` /
    * `... SET PARTITIONED BY ()`. */
  def alterPartitioning(newPartitionBy: Seq[String]): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    require(newPartitionBy.distinct == newPartitionBy,
      s"duplicate partition column in (${newPartitionBy.mkString(", ")})")
    newPartitionBy.foreach(c => require(schema.fieldNames.contains(c),
      s"partition column $c does not exist in $root"))
    require(newPartitionBy != partitionByOf(v),
      s"$root is already partitioned by (${newPartitionBy.mkString(", ")})")
    publish(filesOf(v), schema.json, statsOf(v), None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = newPartitionBy,
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      operation = Some("SET PARTITIONING"),
      identity = identityOf(v),
      identityAllowExplicit = Some(identityAllowsExplicit(v)))
  }

  /** Matches the trailing `data/<commit>[/<part>=<val>...]/<file>` of a
    * parquet scan's `_metadata.file_path` URI — the table-relative name the
    * manifest (and a DV's `file` column) uses. The commit id and file name
    * are generated URI-safe names and hive partition segments always carry
    * `=`, so segment matching is exact. */
  /** Everything after the table root in a scan path — the manifest's
    * table-relative name. A prefix strip, not a `data/`-anchored regex:
    * converted-in-place files ([[VersionedTable.convert]]) live at
    * arbitrary relative paths outside `data/`. */
  private def relOfPathCol(dec: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.functions.substring_index(
      dec, Paths.get(root).toAbsolutePath.toString + "/", -1)

  /** Decode the percent-escapes a Path→URI rendering adds (space → `%20`,
    * the literal '%' of a Hive-escaped dir name → `%25`…), recovering the
    * ON-DISK name the manifest records. URI semantics, not form-decoding: a
    * literal '+' is a legal raw path char and must survive, so it is
    * protected before URLDecoder (which would read it as a space). Scan
    * paths (`_metadata.file_path`, `input_file_name`) are URI renderings;
    * manifest/DV/partition-frame names are on-disk — every comparison
    * between the two goes through this decode or its column form below. */
  private def uriDecode(s: String): String =
    java.net.URLDecoder.decode(s.replace("+", "%2B"),
      java.nio.charset.StandardCharsets.UTF_8)

  /** Column form of [[uriDecode]] (codegen'd, no UDF). */
  private def uriDecodeCol(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions.{lit, replace => strReplace, url_decode}
    url_decode(strReplace(c, lit("+"), lit("%2B")))
  }

  /** Column names claimed by scanLive's position bookkeeping. */
  private val Reserved = Set("__rel", "__ri")

  /** Union frame of deletion-vector files: (file, row_index) tombstones. */
  private def dvFrame(spark: SparkSession, dvs: Seq[String]): DataFrame =
    spark.read.parquet(dvs.map(f => Paths.get(root).resolve(f).toString): _*)

  /** Scan `files` with deletion vectors `dvs` applied: rows whose
    * (table-relative file, row index) appear in a DV are filtered out by a
    * BROADCAST anti join on the parquet reader's `_metadata` row positions —
    * shuffle-free, cost one hashed lookup per scanned row. `keepPos` retains
    * the `__rel`/`__ri` position columns for callers (COW rewrites) that
    * reason about row locations.
    *
    * Partitioned tables (`partitionBy` non-empty): data files are hive-laid
    *-out and do NOT store the partition columns; their values come from the
    * manifest (`partValues`) and are re-attached by a BROADCAST inner join
    * on the scan's `_metadata` file path — one hashed lookup per row against
    * a metadata-sized map, no directory listing or partition inference, and
    * every row of a file shares one value so the join never widens. The
    * values ride as strings in the manifest and are cast to the recorded
    * column types here. */
  private def scanLive(spark: SparkSession, files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType], dvs: Seq[String],
      keepPos: Boolean, partitionBy: Seq[String] = Nil,
      partValues: Map[String, Map[String, Option[String]]] = Map.empty): DataFrame = {
    import org.apache.spark.sql.functions.{broadcast, regexp_extract}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    // partition evolution ([[alterPartitioning]]): files written under an
    // older layout physically lack a DIFFERENT column set than the current
    // spec — group by each file's OWN recorded layout and union the
    // per-epoch scans (one scan per layout epoch, never per file).
    // Homogeneous tables — the overwhelmingly common case — fall through
    // to the single-scan path below with zero extra work.
    val layoutOf = (f: String) => partValues.getOrElse(f, Map.empty).keySet
    val epochs = files.map(layoutOf).distinct
    if (epochs.size > 1)
      return files.groupBy(layoutOf).toSeq
        .sortBy(_._1.toSeq.sorted.mkString(","))
        .map { case (_, fs) =>
          scanLive(spark, fs, schema, dvs, keepPos, partitionBy, partValues) }
        .reduce(_.unionByName(_))
    // the files' own layout decides which columns are physically absent
    // and must be injected from the manifest — after an evolution that is
    // the epoch they were written under, not the current spec
    val filePb: Seq[String] = epochs.headOption.filter(_.nonEmpty).map { s =>
      schema.map(_.fieldNames.toSeq.filter(s.contains))
        .getOrElse(partitionBy.filter(s.contains))
    }.getOrElse(Nil)
    val paths = files.map(f => Paths.get(root).resolve(f).toString)
    val dataSchema = schema.map(s =>
      if (filePb.isEmpty) s
      else StructType(s.fields.filterNot(f => filePb.contains(f.name))))
    // id-tracked tables resolve parquet columns BY FIELD ID (the schema
    // from schemaOf carries `parquet.field.id` metadata) — the mechanism
    // that lets RENAME COLUMN be metadata-only: old files keep the old
    // physical name but the id matches. The flag is scoped to THIS relation
    // via [[GraftParquetFileFormat]] (it is only honored from the session
    // conf, which merely reading a table must not mutate).
    val byId = dataSchema.exists(_.fields.exists(
      _.metadata.contains(VersionedTable.FieldIdKey)))
    val base = dataSchema.map { s =>
      val r = spark.read.schema(s)
      if (byId) r.format(classOf[GraftParquetFileFormat].getName).load(paths: _*)
      else r.parquet(paths: _*)
    }.getOrElse(spark.read.parquet(paths: _*))
    if (dvs.isEmpty && !keepPos && filePb.isEmpty) return base
    val withPos = base.select(col("*"),
      relOfPathCol(uriDecodeCol(col("_metadata.file_path"))).as("__rel"),
      col("_metadata.row_index").as("__ri"))
    val live =
      if (dvs.isEmpty) withPos
      else {
        val dv = dvFrame(spark, dvs)
        withPos.join(broadcast(dv),
          withPos("__rel") === dv("file") && withPos("__ri") === dv("row_index"),
          "left_anti")
      }
    val withParts =
      if (filePb.isEmpty) live
      else {
        val full = schema.getOrElse(throw new IllegalStateException(
          s"partitioned table $root has no recorded schema"))
        val typeOf = full.fields.map(f => f.name -> f.dataType).toMap
        val rows = files.map { f =>
          val vals = partValues.getOrElse(f, Map.empty)
          org.apache.spark.sql.Row.fromSeq(
            f +: filePb.map(c => vals.get(c).flatten.orNull))
        }
        val partSchema = StructType(StructField("__pfile", StringType) +:
          filePb.map(c => StructField(s"__pv_$c", StringType)))
        // LOCAL relation, not an RDD: the manifest rows live on the driver,
        // and a LocalRelation broadcast/fold needs NO Spark job where the
        // one-partition RDD paid a fixed-cost job per scan
        val pframe = spark.createDataFrame(rows.asJava, partSchema)
        val joined = live.join(broadcast(pframe), live("__rel") === pframe("__pfile"))
        // reproduce the recorded column ORDER and types exactly
        joined.select((full.fields.map { f =>
          if (filePb.contains(f.name))
            col(s"__pv_${f.name}").cast(f.dataType).as(f.name)
          else col(f.name)
        } ++ (if (keepPos || dvs.nonEmpty) Seq(col("__rel"), col("__ri")) else Nil)).toSeq: _*)
      }
    if (keepPos) withParts else withParts.drop("__rel", "__ri")
  }

  /** Read a specific version as a DataFrame. The scan is schema'd from the
    * manifest, not inferred — zero footer reads before the scan starts, and
    * files written before an additive schema evolution resolve their missing
    * columns to null (the parquet reader's missing-column semantics). Empty
    * -file-list versions (a fully-deleted snapshot) return an empty frame
    * with the recorded schema. Deletion vectors of the version, if any, are
    * applied (merge-on-read: see [[deleteMor]]). */
  def read(spark: SparkSession, relativeVersion: Option[Int] = None,
           versionAsOf: Option[Long] = None): DataFrame = {
    val v = resolve(relativeVersion, versionAsOf)
    (filesOf(v), schemaOf(v)) match {
      case (Nil, Some(schema)) =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      case (Nil, None) =>
        throw new IllegalStateException(s"version $v of $root is empty and schemaless")
      case (fs, schema) => scanLive(spark, fs, schema, dvsOf(v), keepPos = false,
        partitionByOf(v), partitionValuesOf(v))
    }
  }

  /** Partition-pruned read (Delta-style static partition pruning): evaluate
    * `predicate` — any SQL boolean over the partition columns — against each
    * file's manifest-recorded partition values and scan ONLY the surviving
    * files. The pruning is pure manifest metadata: no directory listing, no
    * footer reads, no data I/O for eliminated partitions — at 100 TB a
    * one-partition read lists exactly that partition's files. Rows of a
    * NULL-evaluating predicate are pruned (SQL filter semantics). Returns
    * (df, scannedFiles, totalFiles) so callers can observe the skipping. */
  def readPartitioned(spark: SparkSession, predicate: String,
      relativeVersion: Option[Int] = None,
      versionAsOf: Option[Long] = None): (DataFrame, Int, Int) = {
    import org.apache.spark.sql.functions.expr
    val v = resolve(relativeVersion, versionAsOf)
    val kept = prunePartitions(spark, v, predicate)
    val all = filesOf(v)
    val df =
      if (kept.nonEmpty)
        // the row filter is a no-op on files kept by their metadata (every
        // row of such a file shares the partition value) but load-bearing
        // on files of a PRE-EVOLUTION layout epoch kept conservatively:
        // there the predicate columns live in the data and must filter rows
        scanLive(spark, kept, schemaOf(v), dvsOf(v), keepPos = false,
          partitionByOf(v), partitionValuesOf(v))
          .filter(expr(predicate))
      else {
        val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
          s"version $v of $root has no recorded schema"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    (df, kept.size, all.size)
  }

  /** Dynamic partition pruning for a versioned-table join: prune the FACT
    * side's file list to partitions whose `partCol` value appears in
    * `dim`'s `dimKey` column, then return the pruned scan for the caller to
    * join. This is DPP's broadcast-reuse shape made explicit over the
    * manifest: the dim side is evaluated first (it must be the SMALL side —
    * the same assumption Spark's DPP makes before reusing a broadcast), its
    * distinct keys prune partitions driver-side, and eliminated partitions
    * are never listed or read. Returns (df, scannedFiles, totalFiles). */
  def readPrunedByJoinKeys(spark: SparkSession, dim: DataFrame, dimKey: String,
      partCol: String): (DataFrame, Int, Int) = {
    val v = resolve()
    val pb = partitionByOf(v)
    require(pb.contains(partCol), s"$partCol is not a partition column of $root ($pb)")
    // the dim side's distinct keys come to the driver (the same move Spark's
    // DPP makes before reusing a broadcast) — guard the "small side"
    // assumption with a hard ceiling so a mis-aimed large dim fails with a
    // clear message instead of a driver OOM
    val maxKeys = 1000000
    val collected = dim.select(col(dimKey).cast("string")).distinct()
      .limit(maxKeys + 1).collect()
    require(collected.length <= maxKeys,
      s"readPrunedByJoinKeys: dim side has more than $maxKeys distinct " +
        s"$dimKey values — it must be the SMALL side of the join (prune by " +
        "partition predicate or a broadcast join instead)")
    val keys = collected.map(r => Option(r.getString(0))).toSet
    val all = filesOf(v)
    val vals = partitionValuesOf(v)
    // pre-evolution files lack partCol in their metadata (the value lives
    // in their data): keep them conservatively — the caller's subsequent
    // join filters the rows, so the cost is legacy-epoch I/O, not wrong rows
    val kept = all.filter { f =>
      val m = vals.getOrElse(f, Map.empty)
      !m.contains(partCol) || keys.contains(m(partCol))
    }
    val df =
      if (kept.nonEmpty)
        scanLive(spark, kept, schemaOf(v), dvsOf(v), keepPos = false, pb, vals)
      else {
        val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
          s"version $v of $root has no recorded schema"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      }
    (df, kept.size, all.size)
  }

  /** Files of version `v` whose partition values satisfy `predicate`,
    * evaluated by Catalyst over a LOCAL frame of the manifest's partition
    * values (one row per file, typed from the table schema) — full SQL
    * expression semantics without data I/O. */
  private def prunePartitions(spark: SparkSession, v: Long, predicate: String): Seq[String] = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val pb = partitionByOf(v)
    require(pb.nonEmpty, s"$root version $v is not partitioned; " +
      "use readPruned (stats skipping) for unpartitioned tables")
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    val vals = partitionValuesOf(v)
    // partition evolution: a file written under an OLDER layout may lack a
    // referenced column in its metadata while physically containing it in
    // its data — such files can never be pruned by metadata and are kept
    // conservatively (Iceberg's evolution contract). Callers that return
    // rows re-apply the predicate as a row filter, so the conservative
    // keep costs I/O on the legacy epoch only, never correctness.
    val referenced: Set[String] =
      scala.util.Try(spark.sessionState.sqlParser.parseExpression(predicate)
        .references.map(_.name).toSet).getOrElse(pb.toSet)
    val needed = referenced.intersect(pb.toSet)
    val (evaluable, conservative) = filesOf(v).partition { f =>
      needed.forall(vals.getOrElse(f, Map.empty).contains)
    }
    val rows = evaluable.map { f =>
      val m = vals.getOrElse(f, Map.empty)
      org.apache.spark.sql.Row.fromSeq(f +: pb.map(c => m.getOrElse(c, None).orNull))
    }
    // LocalRelation: Catalyst's ConvertToLocalRelation folds the typed
    // filter below driver-side — the collect() runs zero Spark jobs
    val local = spark.createDataFrame(rows.asJava,
      StructType(StructField("__pfile", StringType) +:
        pb.map(c => StructField(c, StringType))))
    val kept = local.select(col("__pfile") +: pb.map(c => col(c).cast(typeOf(c)).as(c)): _*)
      .filter(expr(predicate))
      .select("__pfile").collect().map(_.getString(0)).toSet
    val cons = conservative.toSet
    filesOf(v).filter(f => kept.contains(f) || cons.contains(f))
  }

  /** Write the reference's Athena-interop `_symlink_format_manifest` for a
    * version (default latest): text file(s) listing that version's data
    * files as absolute URIs (`scd2-job.ipynb:382` — external engines query
    * the table by reading this manifest over the parquet files).
    *
    * Unpartitioned tables get the single `_symlink_format_manifest/manifest`
    * (returned); a hive-partitioned table gets one
    * `_symlink_format_manifest/<k>=<v>/.../manifest` PER PARTITION — the
    * shape Delta's `GENERATE symlink_format_manifest` produces, which is
    * what lets the external catalog register each partition's location and
    * partition-prune. The manifest tree is regenerated from scratch so a
    * partition emptied since the last generate doesn't leave a stale file
    * list behind. Generation is driver-side and O(partitions) tiny text
    * writes from the in-memory manifest — no data I/O; thousands of
    * partitions cost seconds, bounded by partition count, never table
    * size. Returns the manifest root dir for partitioned tables. */
  def writeSymlinkManifest(version: Option[Long] = None): Path = {
    val v = version.getOrElse(resolve())
    // a symlink manifest is a bare file list: an external engine reading it
    // cannot apply deletion vectors and would see deleted rows resurrected —
    // refuse, like Delta does for DV tables (compact first to materialize)
    require(dvsOf(v).isEmpty,
      s"version $v of $root carries deletion vectors; an external engine reading " +
        "the symlink manifest would see deleted rows — run compact() first")
    // a symlink manifest hands raw parquet to an external engine, which
    // recovers partition values from the hive dir segments — files of a
    // pre-evolution layout carry the WRONG segments (and physically lack
    // the injected columns), so a mixed table cannot be exported honestly
    require(!mixedLayoutOf(v),
      s"version $v of $root mixes partition layouts after an ALTER ... SET " +
        "PARTITIONED BY; run compact()/OPTIMIZE to rewrite into the current " +
        "layout before generating a symlink manifest")
    val dir = Paths.get(root, "_symlink_format_manifest")
    if (Files.exists(dir)) // wipe: stale per-partition manifests must not linger
      Files.walk(dir).sorted(java.util.Comparator.reverseOrder())
        .forEach(p => Files.delete(p))
    Files.createDirectories(dir)
    def writeList(out: Path, fs: Seq[String]): Unit =
      Files.write(out,
        fs.sorted.map(f => Paths.get(root).resolve(f).toUri.toString)
          .mkString("\n").getBytes("UTF-8"))
    if (partitionByOf(v).isEmpty) {
      val out = dir.resolve("manifest")
      writeList(out, filesOf(v))
      out
    } else {
      // a data file's table-relative path is data/<commit>/<k>=<v>.../<file>
      // — reuse its own (already hive-escaped) partition segments as the
      // manifest subdir, so the manifest tree matches the data layout
      // byte-for-byte regardless of escaping rules
      filesOf(v).groupBy(_.split('/').drop(2).dropRight(1).toSeq)
        .toSeq.sortBy(_._1.mkString("/")).foreach { case (segs, fs) =>
          val pdir = segs.foldLeft(dir)(_.resolve(_))
          Files.createDirectories(pdir)
          writeList(pdir.resolve("manifest"), fs)
        }
      dir
    }
  }

  /** Commit `df` as the next version (full snapshot — `DeltaLakeLoad` with
    * `saveMode Overwrite`, scd2-job.ipynb:169). `numPartitions` mirrors the
    * reference's pre-write repartition knob (scd2-job.ipynb:168).
    *
    * Scale levers (the Delta-style data-layout story):
    *  - `sortBy`: range-repartition + sort-within-partitions before the
    *    write, so files cover disjoint key ranges — the layout that makes
    *    stats-based file skipping effective.
    *  - `collectStats`: record per-file min/max for leaf scalar columns in
    *    the manifest (one small distributed job over the written files);
    *    [[readPruned]] skips files whose range can't match.
    */
  /** Sidecar carrying the txn high-water marks of VACUUMED manifests —
    * without it, vacuum would erase an idempotent writer's memory and a
    * replayed micro-batch could re-commit (the Delta txn-retention hazard,
    * solved here by never forgetting: marks only ratchet upward). */
  private def legacySidecarPath: Path = logDir.resolve("_txns.json")
  private def sidecarPath(v: Long): Path = logDir.resolve(f"_txns-v$v%08d.json")

  private def sidecarVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_txns-v\\d{8}\\.json") => s.substring(7, 15).toLong }
      .sorted

  private def readTxnsFile(p: Path): Map[String, Long] = {
    if (!Files.exists(p)) return Map.empty
    val node = mapper.readTree(Files.readAllBytes(p))
    node.properties().asScala.map(e => e.getKey -> e.getValue.asLong()).toMap
  }

  /** Ratchet-merge: marks only ever move upward, so merging two sidecar
    * states is a per-key max — this is what makes the CAS retry loop below
    * trivially convergent. */
  private def ratchet(a: Map[String, Long], b: Map[String, Long]): Map[String, Long] =
    (a.toSeq ++ b.toSeq).groupBy(_._1).view.mapValues(_.map(_._2).max).toMap

  private def sidecarTxns(): Map[String, Long] = {
    val latest = sidecarVersions().lastOption.map(v => readTxnsFile(sidecarPath(v)))
      .getOrElse(Map.empty[String, Long])
    // pre-CAS layout compatibility: fold in the unversioned sidecar if present
    ratchet(latest, readTxnsFile(legacySidecarPath))
  }

  /** Fold `marks` into the sidecar with a createLink-based CAS (the same
    * publish protocol as manifests): read the latest sidecar version, merge,
    * link the next version; on a collision another vacuum published first —
    * re-read and retry. The non-atomic read-modify-write this replaces could
    * lose a high-water mark between two racing vacuums, re-opening the
    * replayed-micro-batch double-commit hazard the sidecar exists to close. */
  private def mergeSidecarTxns(marks: Map[String, Long]): Unit = {
    while (true) {
      val cur = sidecarVersions().lastOption
      val base = sidecarTxns()
      val merged = ratchet(base, marks)
      if (merged == base) return // already at or above every mark
      val json = mapper.createObjectNode()
      merged.toSeq.sortBy(_._1).foreach { case (k, v) => json.put(k, v) }
      val next = cur.map(_ + 1L).getOrElse(0L)
      val won = store.putIfAbsent(sidecarPath(next),
        mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))
      if (won) {
        // the legacy file is subsumed by the versioned sidecar now
        Files.deleteIfExists(legacySidecarPath)
        // retire old sidecar versions, keeping a small tail so a reader that
        // listed just before this publish can still open what it saw
        sidecarVersions().dropRight(3).foreach(v => Files.deleteIfExists(sidecarPath(v)))
        return
      }
    }
  }

  private def propsPath(v: Long): Path = logDir.resolve(f"_props-v$v%08d.json")
  private def propsVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_props-v\\d{8}\\.json") => s.substring(8, 16).toLong }
      .sorted

  /** Table properties (Delta `TBLPROPERTIES` analogue). Stored as their own
    * CAS-versioned document in the log dir, NOT per data version: properties
    * steer WRITE-time behavior (e.g. `enableChangeDataFeed` — does a rewrite
    * capture its row changes?), while what a version actually did is
    * recorded version-pinned in its manifest (`cdfKind`), which is all a
    * reader consults. */
  def properties: Map[String, String] =
    propsVersions().lastOption.map { v =>
      mapper.readTree(Files.readAllBytes(propsPath(v))).properties().asScala
        .map(e => e.getKey -> e.getValue.asText()).toMap
    }.getOrElse(Map.empty)

  /** Merge `kv` into the table properties (a `null`/empty value removes the
    * key) via the same CAS-retry protocol as the txn sidecar — racing
    * setters serialize, neither's keys are lost. */
  def setProperties(kv: Map[String, String]): Unit = {
    Files.createDirectories(logDir) // properties may precede the first commit
    while (true) {
      val cur = propsVersions().lastOption
      val base = properties
      val merged = (base ++ kv).filter { case (_, v) => v != null && v.nonEmpty }
      if (merged == base) return
      val json = mapper.createObjectNode()
      merged.toSeq.sortBy(_._1).foreach { case (k, v) => json.put(k, v) }
      val next = cur.map(_ + 1L).getOrElse(0L)
      if (store.putIfAbsent(propsPath(next),
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))) {
        propsVersions().dropRight(3).foreach(v => Files.deleteIfExists(propsPath(v)))
        return
      }
    }
  }

  /** Whether rewrites (delete/update/merge) capture their row-level changes
    * as stored CDF at write time (Delta `delta.enableChangeDataFeed`
    * analogue, same default: OFF — a 100 TB merge should not pay a second
    * pass for a feed nobody consumes). Appends always record
    * `cdfKind="append"` (the fresh files ARE the change set, free), and
    * [[changeFeed]] falls back to a snapshot re-diff for uncaptured
    * versions, so the feed stays CORRECT either way — the property only
    * buys the cheap read path. */
  def cdfEnabled: Boolean = properties.get("enableChangeDataFeed").contains("true")

  /** Delta's `appendOnly` table property: when "true", every operation that
    * deletes or updates EXISTING rows refuses up front — the contract audit
    * and raw-ingest tables rely on (a compliance log that silently lost
    * rows to a fat-fingered DELETE is a post-mortem, not a bug). Appends,
    * row-preserving compaction, and insert-only merges stay allowed;
    * unsetting the property (an audited act of its own) re-enables
    * rewrites. */
  private def requireNotAppendOnly(op: String): Unit =
    require(!properties.get("appendOnly").contains("true"),
      s"$op on $root refused: table property appendOnly=true forbids " +
        "deleting or updating existing rows (unset the property first)")

  /** Latest transaction version committed by `appId` — the newest mark in
    * the post-checkpoint manifests, the latest checkpoint's accumulated
    * marks, or the vacuum sidecar's high-water mark for marks whose
    * manifests were dropped (the Delta `txnVersion`/`txnAppId`
    * idempotent-writer protocol: a replaying writer asks "did my batch N
    * already commit?"). The checkpoint FLOOR is what bounds this at scale:
    * without it a missing appId scans every retained manifest — O(versions)
    * driver JSON reads; with it, only the tail since the last checkpoint. */
  def lastTxn(appId: String): Option[Long] = {
    val ckpt = latestCheckpointMeta()
    val floor = ckpt.map(_._1).getOrElse(-1L)
    val live = versions().reverseIterator.takeWhile(_ > floor).map { v =>
      val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
      if (node.has("txnApp") && node.get("txnApp").asText() == appId)
        Some(node.get("txnVersion").asLong())
      else None
    }.collectFirst { case Some(t) => t }
    (live.toSeq ++ ckpt.flatMap(_._2.get(appId)).toSeq ++
      sidecarTxns().get(appId).toSeq).maxOption
  }

  // ---- Manifest checkpointing -------------------------------------------
  //
  // A manifest is one self-contained JSON parsed on the DRIVER. That is the
  // right shape for head resolution (read exactly one document), but two
  // costs grow with the table:
  //  - the FILE LIST inside the head manifest (millions of files at 100 TB)
  //    is driver-parsed JSON — a distributed consumer should be able to
  //    read it as columnar data instead;
  //  - lastTxn for an absent appId walks EVERY retained manifest.
  // A checkpoint is the Delta-checkpoint analogue: the head state written
  // once as parquet (distributed-readable, splittable) plus a small meta
  // document carrying the schema and the RATCHETED txn marks of everything
  // up to it, so later reads and txn lookups never open the older JSONs.

  private def ckptMetaPath(v: Long): Path = logDir.resolve(f"_ckpt-v$v%08d.meta.json")
  private def ckptDataDir(v: Long): Path = logDir.resolve(f"_ckpt-v$v%08d.parquet")
  private def ckptStatePath(v: Long): Path = logDir.resolve(f"_ckpt-v$v%08d.state.json")

  /** Versions with a completed checkpoint that ALSO wrote the driver-side
    * full-state sidecar — the anchors delta-manifest replay can start from
    * (legacy checkpoints predate the sidecar and only serve the parquet/txn
    * roles). */
  private def checkpointStateVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_ckpt-v\\d{8}\\.state\\.json") =>
        s.substring(7, 15).toLong }
      .filter(w => Files.exists(ckptMetaPath(w)))
      .sorted

  /** The full state a checkpoint recorded at exactly version `v`, if one
    * exists (meta present = checkpoint completed; a racing retirement
    * mid-read degrades to None and the replay walk continues past it). */
  private def checkpointStateAt(v: Long): Option[VersionedTable.TableState] =
    if (!Files.exists(ckptStatePath(v)) || !Files.exists(ckptMetaPath(v))) None
    else scala.util.Try(
      parseFullState(mapper.readTree(Files.readAllBytes(ckptStatePath(v))))).toOption

  /** Versions with a completed checkpoint (meta present), ascending. */
  def checkpointVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_ckpt-v\\d{8}\\.meta\\.json") =>
        s.substring(7, 15).toLong }
      .sorted

  /** (version, accumulated txn marks) of the newest checkpoint, if any. */
  private def latestCheckpointMeta(): Option[(Long, Map[String, Long])] =
    checkpointVersions().lastOption.map { v =>
      val node = mapper.readTree(Files.readAllBytes(ckptMetaPath(v)))
      val marks =
        if (!node.has("txns")) Map.empty[String, Long]
        else node.get("txns").properties().asScala
          .map(e => e.getKey -> e.getValue.asLong()).toMap
      (v, marks)
    }

  /** Write a checkpoint of the CURRENT head: one parquet dataset under the
    * log dir holding every live reference (data/dv/cdf) with its partition
    * values and stats — splittable, schema'd, readable by any executor —
    * plus a meta document with the schema and the txn marks accumulated
    * from the previous checkpoint through the head. Publishing the meta is
    * a [[CommitStore.putIfAbsent]], so racing checkpointers resolve to one
    * winner; the call is idempotent at an already-checkpointed head. Old
    * checkpoints beyond a small tail are retired. Returns the checkpointed
    * version. */
  /** Auto-checkpointing (`checkpointInterval=<n>` table property, Delta's
    * every-10-commits cadence): after a successful publish on the
    * HIGH-COMMIT-RATE funnels — append, appendIdentity, COPY INTO, and the
    * streaming sink riding them — a head that has advanced ≥ n versions
    * past the last checkpoint writes one. Rewrite verbs stay
    * operator-driven (they are scheduled maintenance already; the
    * CHECKPOINT verb covers them). Never load-bearing: a checkpoint
    * failure warns and the committed write stands. */
  private def maybeAutoCheckpoint(spark: SparkSession): Unit =
    properties.get("checkpointInterval")
      .flatMap(s => scala.util.Try(s.toInt).toOption).filter(_ > 0).foreach { n =>
        val v = resolve()
        val last = checkpointVersions().lastOption.getOrElse(-1L)
        if (v - last >= n)
          try { checkpoint(spark); () }
          catch { case e: Exception =>
            System.err.println(s"[graft] auto-checkpoint of $root at v$v failed " +
              s"(write committed fine): ${e.getMessage}")
          }
      }

  def checkpoint(spark: SparkSession): Long = {
    import spark.implicits._
    val v = resolve()
    if (checkpointVersions().contains(v)) return v
    val prev = latestCheckpointMeta()
    val floor = prev.map(_._1).getOrElse(-1L)
    // ratchet every txn mark between the previous checkpoint and the head
    val tailMarks = versions().filter(x => x > floor && x <= v).flatMap { x =>
      val node = mapper.readTree(Files.readAllBytes(manifestPath(x)))
      if (node.has("txnApp"))
        Some(node.get("txnApp").asText() -> node.get("txnVersion").asLong())
      else None
    }
    val marks = ratchet(prev.map(_._2).getOrElse(Map.empty),
      tailMarks.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap)
    val st = stateOf(v)
    val rows =
      st.files.map { f => (f, "data",
        st.parts.getOrElse(f, Map.empty).collect { case (c, Some(x)) => c -> x },
        st.stats.getOrElse(f, Map.empty).map { case (c, (mn, mx, k)) => c -> Seq(mn, mx, k) }) } ++
      st.dvs.map(f => (f, "dv", Map.empty[String, String], Map.empty[String, Seq[String]])) ++
      cdfFilesOf(v).map(f => (f, "cdf", Map.empty[String, String], Map.empty[String, Seq[String]]))
    // accumulated COPY INTO memory rides in the checkpoint parquet as
    // kind='ingest' rows (the set can be millions of ids at 100 TB —
    // distributed parquet, never a driver JSON): previous checkpoint's
    // rows ∪ the tail manifests' ingest fields ∪ the vacuum sidecar
    val tailIngest = versions().filter(x => x > floor && x <= v)
      .flatMap(ingestOf) ++ sidecarIngest()
    val prevIngest = prev.map(p =>
        spark.read.parquet(ckptDataDir(p._1).toString)
          .filter(col("kind") === "ingest").select(col("path")))
      .getOrElse(spark.emptyDataset[String].toDF("path"))
    val ingestRows = prevIngest.union(tailIngest.toDF("path")).distinct()
      .select(col("path"), org.apache.spark.sql.functions.lit("ingest").as("kind"),
        org.apache.spark.sql.functions.typedLit(Map.empty[String, String]).as("partitions"),
        org.apache.spark.sql.functions.typedLit(Map.empty[String, Seq[String]]).as("stats"))
    rows.toDF("path", "kind", "partitions", "stats")
      .unionByName(ingestRows)
      .repartition(1).write.mode("overwrite").parquet(ckptDataDir(v).toString)
    val json = mapper.createObjectNode()
    json.put("version", v)
    schemaOf(v).foreach(s => json.put("schema", s.json))
    if (marks.nonEmpty) {
      val tNode = json.putObject("txns")
      marks.toSeq.sortBy(_._1).foreach { case (k, x) => tNode.put(k, x) }
    }
    // driver-readable full-state sidecar: the anchor delta-manifest replay
    // starts from (the JSON face of the parquet rows above). Written BEFORE
    // the meta CAS — the meta is the checkpoint's commit point, so readers
    // only consult a state sidecar whose meta exists; racing checkpointers
    // write identical bytes.
    val stateJson = mapper.createObjectNode()
    stateJson.put("version", v)
    writeStateFields(stateJson, st)
    Files.write(ckptStatePath(v),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(stateJson))
    store.putIfAbsent(ckptMetaPath(v),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))
    // retire old checkpoints, keeping a short tail for in-flight readers
    checkpointVersions().dropRight(2).foreach { old =>
      Files.deleteIfExists(ckptMetaPath(old))
      Files.deleteIfExists(ckptStatePath(old))
      val d = ckptDataDir(old)
      if (Files.isDirectory(d)) {
        Files.walk(d).sorted(java.util.Comparator.reverseOrder())
          .forEach(p => { Files.deleteIfExists(p); () })
      }
    }
    v
  }

  /** The latest checkpoint's reference list as a DataFrame — the
    * distributed-readable face of the manifest: (path, kind, partitions,
    * stats) per live file. A 1000-executor consumer plans file work from
    * this WITHOUT the driver parsing a multi-million-entry JSON. */
  def checkpointFiles(spark: SparkSession): DataFrame = {
    val v = checkpointVersions().lastOption.getOrElse(
      throw new IllegalStateException(s"no checkpoint at $root"))
    spark.read.parquet(ckptDataDir(v).toString)
  }

  /** Stamp every top-level column of an outgoing frame with its stable
    * column id as parquet field-id metadata (written into the files —
    * `spark.sql.parquet.fieldId.write.enabled` is on by default), so by-id
    * reads keep resolving the column across renames. Known names take the
    * recorded id; new names take maxColumnId+1… in FRAME ORDER — the same
    * order [[publish]] mints ids for new schema names, so file ids and the
    * manifest always agree. Legacy tables (no recorded ids) pass through
    * untouched. Returns the stamped frame AND the exact (name -> id) map
    * written into the files: [[publish]] must record THESE ids, not re-mint
    * against a possibly-moved head — a retry/rebase that re-derived ids
    * would let two concurrent schema-evolving writers stamp the same fresh
    * id into different columns, silently corrupting by-id reads. */
  private def stampFieldIds(df: DataFrame): (DataFrame, Option[Map[String, Long]]) = {
    val base = latestVersion()
    val ids = base.map(columnIdsOf).getOrElse(Map.empty)
    if (base.isDefined && ids.isEmpty) return (df, None) // legacy: stays by-name
    var next = base.map(maxColumnIdOf).getOrElse(0L)
    val assigned = df.schema.fields.map { f =>
      f.name -> ids.getOrElse(f.name, { next += 1; next })
    }
    val byName = assigned.toMap
    val cols = df.schema.fields.map { f =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .withMetadata(f.metadata).putLong(VersionedTable.FieldIdKey, byName(f.name)).build()
      col(f.name).as(f.name, md)
    }
    (df.select(cols.toIndexedSeq: _*), Some(byName))
  }

  /** Write `df` as immutable parquet under a fresh commit dir; returns the
    * commit id, the written files' table-relative paths, and (for
    * partitioned writes) each file's partition values parsed back from the
    * hive layout the writer produced (URL-unescaped; the hive null marker →
    * None). Partitioned writes store only the DATA columns in the files —
    * the partition values live in the directory names and the manifest. */
  private def writeDataFiles(df: DataFrame, numPartitions: Option[Int],
      sortBy: Seq[String], partitionBy: Seq[String] = Nil)
      : (String, Seq[String], Map[String, Map[String, Option[String]]],
         Option[Map[String, Long]]) = {
    // __rel/__ri are scanLive's row-position helper columns; a user column
    // with either name would collide in the DV anti-join frame and then be
    // dropped, corrupting DV reads and COW touched-file detection. Reserve
    // them at the single write funnel, as Delta reserves _metadata.
    val reserved = df.columns.filter(c =>
      Reserved.contains(c) || c == VersionedTable.RowCountStat ||
        c.startsWith(VersionedTable.NullCountPrefix))
    require(reserved.isEmpty,
      s"column name(s) ${reserved.mkString(", ")} are reserved by $root " +
        "(internal row-position/row-count bookkeeping); rename before committing")
    partitionBy.foreach(c => require(df.columns.contains(c),
      s"partition column $c not in the frame being written"))
    Files.createDirectories(dataDir)
    val commitId = java.util.UUID.randomUUID().toString
    val outDir = dataDir.resolve(commitId)
    val (stamped, stampedIds) = stampFieldIds(df)
    val out = (numPartitions, sortBy) match {
      case (Some(n), s) if s.nonEmpty =>
        stamped.repartitionByRange(n, s.map(col): _*).sortWithinPartitions(s.map(col): _*)
      case (None, s) if s.nonEmpty =>
        stamped.repartitionByRange(s.map(col): _*).sortWithinPartitions(s.map(col): _*)
      // co-locate rows of one partition value in one task, so a partitioned
      // write of n tasks yields ~one file per (task, value) instead of
      // n × values small files
      case (Some(n), _) if partitionBy.nonEmpty => stamped.repartition(n, partitionBy.map(col): _*)
      case (Some(n), _) => stamped.repartition(n)
      case _ => stamped
    }
    val writer = out.write.mode("overwrite")
    // TIMESTAMP_MICROS, not Spark's INT96 default: INT96 is deprecated,
    // 50% fatter per value, and carries NO footer statistics — with it a
    // timestamp column can never range-prune under the footer stats mode.
    // Session-conf set/restore because parquet ignores the per-write option
    // (probed); the funnel is the engine's single write path and commits
    // are single-writer by protocol.
    val sqlConf = out.sparkSession.sessionState.conf
    val tsKey = "spark.sql.parquet.outputTimestampType"
    val tsPrev = sqlConf.getConfString(tsKey, "INT96")
    // The engine's own session builders (Bench/Verify/Profile/SparkSpec/
    // JobChild) now set TIMESTAMP_MICROS at session build, so the common
    // case mutates NOTHING — the set/restore below is only the fallback for
    // foreign sessions, where two concurrent commits to DIFFERENT tables
    // could otherwise race the restore and emit an INT96 file (consequence:
    // lost timestamp footer stats — conservative no-prune, never wrong
    // rows; single-writer-per-TABLE is the protocol, cross-table isn't).
    if (tsPrev == "TIMESTAMP_MICROS") {
      (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(outDir.toString)
    } else {
      sqlConf.setConfString(tsKey, "TIMESTAMP_MICROS")
      try (if (partitionBy.nonEmpty) writer.partitionBy(partitionBy: _*) else writer)
        .parquet(outDir.toString)
      finally sqlConf.setConfString(tsKey, tsPrev)
    }
    def isData(n: String) =
      n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith(".")
    if (partitionBy.isEmpty) {
      val files = listNames(outDir).filter(isData).map(n => s"data/$commitId/$n").sorted
      buildBloomSidecar(df.sparkSession, commitId, files)
      (commitId, files, Map.empty, stampedIds)
    } else {
      // walk the hive layout: every leaf parquet sits under one k=v segment
      // per partition column, in partitionBy order. Hive escaping is plain
      // %XX (no '+'-for-space), so decode only percent sequences.
      def unescape(s: String): String = {
        val sb = new StringBuilder
        var i = 0
        while (i < s.length) {
          val c = s.charAt(i)
          if (c == '%' && i + 2 < s.length) {
            sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar); i += 3
          } else { sb.append(c); i += 1 }
        }
        sb.toString
      }
      val found = scala.collection.mutable.ArrayBuffer.empty[(String, Map[String, Option[String]])]
      def walk(dir: Path, relSegs: List[String], vals: Map[String, Option[String]]): Unit =
        listNames(dir).sorted.foreach { n =>
          val p = dir.resolve(n)
          if (Files.isDirectory(p)) {
            val eq = n.indexOf('=')
            if (eq > 0) {
              val c = unescape(n.substring(0, eq))
              val raw = n.substring(eq + 1)
              val v = if (raw == "__HIVE_DEFAULT_PARTITION__") None
                      else Some(unescape(raw))
              walk(p, n :: relSegs, vals + (c -> v))
            }
          } else if (isData(n)) {
            found += ((s"data/$commitId/" + (n :: relSegs).reverse.mkString("/"), vals))
          }
        }
      walk(outDir, Nil, Map.empty)
      val files = found.map(_._1).sorted
      buildBloomSidecar(df.sparkSession, commitId, files.toSeq)
      (commitId, files.toSeq, found.map { case (f, v) => f -> v }.toMap, stampedIds)
    }
  }

  /** Columns carrying a per-file Bloom sidecar (table property
    * `bloomIndexColumns`, comma-separated). Min-max ranges cannot prune
    * point lookups on a high-cardinality key whose values are uniform
    * across files (every file's [min, max] spans the domain); the Bloom
    * sidecar is exactly that gap — the role Delta's/Iceberg's Bloom
    * indexes fill. */
  private def bloomIndexColumns: Seq[String] =
    properties.get("bloomIndexColumns").toSeq
      .flatMap(_.split(",")).map(_.trim).filter(_.nonEmpty)

  /** One sidecar parquet dataset per commit, addressed BY COMMIT ID
    * (`bloom/<commitId>.parquet`) — data files are immutable and so are
    * their filters, so deterministic pathing needs no manifest threading;
    * a candidate file's sidecar is found from its own path, and [[vacuum]]
    * retires a sidecar with its commit. Rows are (path, column, bloom). */
  private def bloomSidecarPath(commitId: String): Path =
    bloomDir.resolve(s"$commitId.parquet")

  /** Build the Bloom sidecar for a freshly written commit: one filter per
    * (file, indexed column) over `xxhash64(col)` — pre-hashed so build and
    * probe agree on the rendering of any column type. Runs as ONE
    * distributed grouped aggregation over the new batch (map-side
    * combinable; the vectors never leave the executors — only
    * filter bytes land in the sidecar). Partition columns don't live in
    * the data files and are served by partition pruning, so only
    * file-resident columns index. */
  private def buildBloomSidecar(spark: SparkSession, commitId: String,
      files: Seq[String]): Unit = {
    import org.apache.spark.sql.functions.{expr, input_file_name, xxhash64}
    if (bloomIndexColumns.isEmpty || files.isEmpty) return
    val written = spark.read.parquet(
      files.map(f => Paths.get(root).resolve(f).toString): _*)
    // an indexed name resolves like a stats key (leafType's collision rule:
    // exact top-level first, then the dotted struct walk — so a nested
    // id-like leaf such as `meta.media_id` indexes under exactly the name
    // a pushed nested predicate carries); arrays/maps/missing → skipped
    def quotedTop(c: String) = col(s"`${c.replace("`", "``")}`")
    def columnFor(c: String): Option[org.apache.spark.sql.Column] =
      if (written.columns.contains(c)) Some(quotedTop(c))
      else VersionedTable.leafType(written.schema, c).map { _ =>
        val parts = c.split('.')
        parts.tail.foldLeft(quotedTop(parts.head))(_.getField(_))
      }
    val cols = bloomIndexColumns.flatMap(c => columnFor(c).map(c -> _))
    if (cols.isEmpty) return
    graft.functions.GraftFunctions.registerAll(spark)
    val items = properties.get("bloomIndexExpectedItems").map(_.toLong).getOrElse(100000L)
    val fpp = properties.get("bloomIndexFpp").map(_.toDouble).getOrElse(0.01)
    // pre-hash under index-based aliases (dotted names don't ride SQL text)
    val hashed = written.select(input_file_name().as("__f") +:
      cols.zipWithIndex.map { case ((_, cx), i) => xxhash64(cx).as(s"__h_$i") }: _*)
    val aggs = cols.indices.map(i =>
      expr(s"bloom_build_agg(__h_$i, ${items}L, ${fpp}D)").as(s"__b_$i"))
    val perFile = hashed.groupBy(col("__f"))
      .agg(aggs.head, aggs.tail: _*)
    val stackArgs = cols.zipWithIndex
      .map { case ((c, _), i) => s"'${c.replace("'", "''")}', __b_$i" }.mkString(", ")
    // normalize to the manifest's table-relative on-disk names (same
    // uriDecode + commit-dir anchoring as collectFileStats, kept
    // distributed — only filter bytes land in the sidecar)
    perFile.select(uriDecodeCol(col("__f")).as("__fd"),
        expr(s"stack(${cols.size}, $stackArgs)").as(Seq("column", "bloom")))
      .filter(expr(s"instr(__fd, 'data/$commitId/') > 0"))
      .select(expr(s"substring(__fd, instr(__fd, 'data/$commitId/'))").as("path"),
        col("column"), col("bloom"))
      .write.mode("overwrite").parquet(bloomSidecarPath(commitId).toString)
  }

  /** Bloom pass over a range-pruned candidate file list: drop every
    * candidate whose sidecar filter says NONE of `hashedKeys` (a one-column
    * `__h` BIGINT frame of `xxhash64` key hashes) can be present in
    * `column`. Files without a sidecar entry (unindexed commits, missing
    * column) always survive — the index can only prune, never resurrect.
    * The probe is a distributed join of the candidate list against the
    * per-commit sidecar datasets with the (batch-bounded) key-hash array
    * broadcast; only the surviving paths come back to the driver. */
  private def bloomPruneCandidates(spark: SparkSession, candidates: Seq[String],
      column: String, hashedKeys: DataFrame): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, collect_list, expr}
    if (candidates.isEmpty || !bloomIndexColumns.contains(column)) return candidates
    val cids = candidates.flatMap(_.split('/') match {
      case Array("data", cid, _*) => Some(cid)
      case _ => None
    }).distinct
    val sidecars = cids.map(bloomSidecarPath).filter(Files.isDirectory(_))
    if (sidecars.isEmpty) return candidates
    import spark.implicits._
    graft.functions.GraftFunctions.registerAll(spark)
    // merge sources are UNBOUNDED: collecting every key hash into one driver
    // array (broadcast into every task) is only sane for batch-sized key
    // sets — a 100 M-key merge would materialize ~800 MB on the driver and
    // per task. Collect at most cap+1 hashes in one bounded pass; above the
    // cap the Bloom pass is skipped outright (range + checkpoint pruning
    // still bound the candidates), mirroring how Delta caps its
    // file-skipping key collection. Callers pass deduplicated key frames,
    // so the raw count is the distinct count. Tunable per table
    // (`bloomProbeMaxKeys`) for deployments with bigger driver headroom.
    val cap = properties.get("bloomProbeMaxKeys").map(_.toInt)
      .getOrElse(VersionedTable.BloomProbeMaxKeys)
    val capped = hashedKeys.limit(cap + 1)
      .agg(collect_list(col("__h")).as("__ks")).head.getSeq[Long](0)
    if (capped.length > cap) return candidates
    val keyArr = Seq(Tuple1(capped)).toDF("__ks")
    val sc = spark.read.parquet(sidecars.map(_.toString): _*)
      .filter(col("column") === column)
    candidates.toDF("path")
      .join(sc, Seq("path"), "left")
      .crossJoin(broadcast(keyArr))
      .filter(col("bloom").isNull || expr("bloom_any_contain(bloom, __ks)"))
      .select("path").as[String].collect().toSeq
  }

  /** Write a deletion-vector batch — (file, row_index) tombstones — as
    * parquet under a fresh `dv/<uuid>` dir; returns table-relative paths.
    * Coalesced to one file: a DV batch is metadata-sized (positions, not
    * rows), and reads union every DV file in force. */
  private def writeDvFiles(df: DataFrame): Seq[String] = {
    Files.createDirectories(dvDir)
    val dvId = java.util.UUID.randomUUID().toString
    val outDir = dvDir.resolve(dvId)
    // repartition, NOT coalesce: coalesce(1) would collapse the upstream
    // predicate scan into one task; repartition shuffles only the matched
    // positions (metadata-sized) and the scan stays parallel
    df.repartition(1).write.mode("overwrite").parquet(outDir.toString)
    listNames(outDir)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"dv/$dvId/$n").sorted
  }

  /** Write a change-data batch (full rows + `_change_type`) as parquet under
    * a fresh `cdf/<uuid>` dir; returns table-relative paths. Like DV files,
    * a CDF batch is change-sized, not table-sized — one file suffices and
    * the upstream diff stays parallel (repartition, not coalesce). */
  private def writeCdfFiles(df: DataFrame): Seq[String] = {
    Files.createDirectories(cdfDir)
    val cdfId = java.util.UUID.randomUUID().toString
    val outDir = cdfDir.resolve(cdfId)
    df.repartition(1).write.mode("overwrite").parquet(outDir.toString)
    listNames(outDir)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"cdf/$cdfId/$n").sorted
  }

  /** Per-file min/max for leaf scalar columns of freshly written files (one
    * small distributed job over the new files only — carried-over files keep
    * their previously recorded stats). Partitioned commits scan the leaf
    * files directly (no partition inference) and inject each file's
    * partition values as exact min=max=value stats, typed from the table
    * schema — so [[readPruned]] skips on partition columns for free. */
  /** Per-file min/max/nullCount/rowCount for a batch of freshly written (or
    * adopted) files. Two modes, `spark.graft.stats.mode`:
    *
    *  - `footer` (default): read the values the parquet writer ALREADY
    *    recorded in each file's footer — metadata-plane, no second pass over
    *    the data (guide §6: shuffle/scan metadata instead of payloads). At
    *    100 TB the legacy mode re-reads every committed byte once per commit
    *    just to re-derive numbers the footer carries; at gate scale it is a
    *    fixed extra Spark job per commit. Columns whose footer stats are
    *    untrustworthy contribute nothing for that file (absent stats can
    *    never skip a file — conservative by the prune contract): INT96
    *    timestamps (no footer stats; the write funnel now emits
    *    TIMESTAMP_MICROS precisely so timestamp bounds survive), oversize
    *    binary values (parquet drops stats > 4 KB), and NTZ/exotic logical
    *    types. FLOAT/DOUBLE bounds are NaN-poisoned in footers (the same
    *    reason Spark's parquet MIN/MAX aggregate pushdown refuses floating
    *    types), so they come from a RESIDUAL scan over just the floating
    *    leaves — column-pruned, skipped entirely on float-free tables —
    *    keeping them bit-identical to scan mode. Values are rendered
    *    through the SAME Cast-to-string Spark applies in scan mode, so
    *    recorded stats are bit-identical for every covered type
    *    (FooterStatsSpec pins scan ≡ footer on a mixed-type table).
    *  - `scan`: the legacy distributed aggregation over the written files —
    *    the escape hatch for deployments that must range-prune floating
    *    columns or adopt footers the writer cannot vouch for.
    */
  private[table] def collectFileStats(spark: SparkSession, commitId: String,
      files: Seq[String],
      partValues: Map[String, Map[String, Option[String]]] = Map.empty,
      partTypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty)
      : Map[String, Map[String, (String, String, String)]] = {
    if (files.isEmpty) return Map.empty
    if (spark.conf.getOption("spark.graft.stats.mode").forall(_ == "footer")) {
      val partStats: Map[String, Map[String, (String, String, String)]] =
        files.map { f =>
          f -> partValues.getOrElse(f, Map.empty).flatMap { case (c, v) =>
            for { value <- v; kind <- partTypes.get(c).flatMap(
              VersionedTable.statKindOf) }
              yield c -> (value, value, kind)
          }
        }.toMap
      val tz = spark.sessionState.conf.sessionLocalTimeZone
      val maxDriver = spark.conf.getOption("spark.graft.stats.footerDriverMaxFiles")
        .map(_.toInt).getOrElse(256)
      val rootAbs = Paths.get(root).toAbsolutePath.toString
      // one footer visit per file yields BOTH the trustworthy stats and the
      // file's OWN float-leaf set (per-file, not files.head's: a mixed-
      // schema CONVERT adoption batch can carry float leaves the head file
      // lacks, and head-only discovery would silently drop their bounds)
      type FileMeta = (Map[String, (String, String, String)],
        (Set[String], org.apache.spark.sql.types.StructType))
      def metaOf(f: String): FileMeta =
        (VersionedTable.footerStats(rootAbs, f, tz),
          VersionedTable.floatingLeaves(rootAbs, f))
      val perFile: Map[String, FileMeta] =
        if (files.size <= maxDriver) {
          // parallel driver-side footer reads: each is an independent
          // ~ms metadata read, and a CONVERT adopting dozens of external
          // files would otherwise serialize them (q113 regressed +1.3 s
          // on the serial loop)
          val pool = java.util.concurrent.Executors.newFixedThreadPool(
            math.max(1, math.min(8, files.size)))
          try {
            val futs = files.map { f =>
              pool.submit(new java.util.concurrent.Callable[(String, FileMeta)] {
                def call() = f -> metaOf(f)
              })
            }
            futs.map(_.get()).toMap
          } finally { pool.shutdown(); () }
        } else {
          val slices = math.max(1, files.size / 64)
          spark.sparkContext.parallelize(files, slices)
            .map(f => f -> ((VersionedTable.footerStats(rootAbs, f, tz),
              VersionedTable.floatingLeaves(rootAbs, f))))
            .collect().toMap
        }
      val dataStats: Map[String, Map[String, (String, String, String)]] =
        perFile.view.mapValues(_._1).toMap
      // FLOAT/DOUBLE bounds cannot be trusted from footers (NaN-poisoned;
      // see footerStats), but consumers legitimately need them — the
      // metadata-answered MIN/MAX rewrite serves unfiltered aggregates from
      // the manifest. A RESIDUAL scan over ONLY the floating leaves keeps
      // their stats bit-identical to scan mode (Spark's NaN-as-greatest
      // semantics included) while parquet's columnar layout makes the pass
      // read just those columns. Files group by their float-leaf schema and
      // each group scans once — engine-written batches are schema-uniform
      // (one group), float-free tables (most derived stores) scan nothing.
      val residual: Map[String, Map[String, (String, String, String)]] =
        files.groupBy(f => perFile(f)._2).toSeq.flatMap {
          case ((floating, _), _) if floating.isEmpty => Nil
          case ((floating, floatSchema), fs) =>
            scanFileStats(spark, commitId, fs, only = Some(floating),
              readSchema = Some(floatSchema)).toSeq
        }.toMap
      return files.map { f =>
        f -> (dataStats.getOrElse(f, Map.empty) ++
          residual.getOrElse(f, Map.empty) ++ partStats.getOrElse(f, Map.empty))
      }.toMap
    }
    scanFileStats(spark, commitId, files, partValues, partTypes)
  }

  private def scanFileStats(spark: SparkSession, commitId: String,
      files: Seq[String],
      partValues: Map[String, Map[String, Option[String]]] = Map.empty,
      partTypes: Map[String, org.apache.spark.sql.types.DataType] = Map.empty,
      only: Option[Set[String]] = None,
      readSchema: Option[org.apache.spark.sql.types.StructType] = None)
      : Map[String, Map[String, (String, String, String)]] = {
    import org.apache.spark.sql.functions.{input_file_name, max => fmax, min => fmin}
    import org.apache.spark.sql.types._
    if (files.isEmpty) return Map.empty
    // an explicit schema (footer mode's residual float pass) spares the
    // reader its footer-inference job AND column-prunes the scan
    val written = readSchema.foldLeft(spark.read)((r, s) => r.schema(s)).parquet(
      files.map(f => Paths.get(root).resolve(f).toString): _*)
    // kind drives the prune-time comparison: "num" compares numerically,
    // everything else lexicographically (ISO-rendered timestamps/dates sort
    // correctly as strings)
    def kindOf(dt: DataType): Option[String] = dt match {
      case _: NumericType => Some("num")
      case StringType | TimestampType | DateType => Some("str")
      case _ => None
    }
    // stat columns: every top-level scalar leaf PLUS nested struct leaves,
    // keyed by DOTTED path (Delta's nested-stats convention) — the repo's
    // own multimodal metadata shape (m1's `meta.format`) filters on struct
    // leaves, and a leaf without stats can never skip a file. The dotted
    // key is exactly the name a pushed nested predicate carries (DSv2
    // translation renders field paths dot-joined), so the prune passes need
    // no mapping. A nested path colliding with a literal top-level name is
    // skipped (top level wins — one key, one meaning); arrays/maps carry no
    // ordered scalar bound and contribute nothing.
    val topCols = written.schema.fields
      .flatMap(f => kindOf(f.dataType).map(f.name -> _)).toSeq
    def nestedLeaves(prefix: String, parent: org.apache.spark.sql.Column,
        st: StructType): Seq[(String, org.apache.spark.sql.Column, String)] =
      st.fields.flatMap { f =>
        val name = s"$prefix.${f.name}"
        val c = parent.getField(f.name)
        f.dataType match {
          case s: StructType => nestedLeaves(name, c, s)
          case dt => kindOf(dt).map(k => (name, c, k)).toSeq
        }
      }.toSeq
    val topNames = written.schema.fieldNames.toSet
    // top-level references are backtick-quoted: bare col(name) PARSES dots,
    // so a literal top-level name like `meta.x` would mis-resolve into the
    // struct walk (and the stats scan would request the wrong parquet type)
    def quoted(c: String) = col(s"`${c.replace("`", "``")}`")
    val nestedCols = written.schema.fields.flatMap { f =>
      f.dataType match {
        case s: StructType => nestedLeaves(f.name, quoted(f.name), s)
        case _ => Nil
      }
    }.filterNot { case (n, _, _) => topNames.contains(n) }.toSeq
    val statCols = (topCols.map { case (c, k) => (c, quoted(c), k) } ++ nestedCols)
      .filter { case (c, _, _) => only.forall(_.contains(c)) }
    val partStats: Map[String, Map[String, (String, String, String)]] =
      files.map { f =>
        f -> partValues.getOrElse(f, Map.empty).flatMap { case (c, v) =>
          for { value <- v; kind <- partTypes.get(c).flatMap(kindOf) }
            yield c -> (value, value, kind)
        }
      }.toMap
    if (statCols.isEmpty) return partStats
    // per-file ROW COUNT rides the same one-pass aggregation under the
    // reserved pseudo-column "__rows" (kind "rows"): no predicate can ever
    // reference it (double underscore is write-reserved), so the pruning
    // machinery ignores it — but [[rowCountOf]]/DESCRIBE DETAIL can answer
    // count(*) from the manifest, zero data I/O at any table size
    // null counts ride the SAME one-pass aggregation (count(c) counts the
    // non-nulls; rows − that = nulls, computed below from __nrows) — Delta/
    // Iceberg-style nullCount for IS NULL / IS NOT NULL file skipping
    val aggs = statCols.flatMap { case (c, cc, _) =>
      Seq(fmin(cc).cast("string").as(s"min_$c"),
        fmax(cc).cast("string").as(s"max_$c"),
        org.apache.spark.sql.functions.count(cc).as(s"nn_$c")) } :+
      org.apache.spark.sql.functions.count(org.apache.spark.sql.functions.lit(1))
        .cast("string").as("__nrows")
    val dataStats = written.groupBy(input_file_name().as("__file")).agg(aggs.head, aggs.tail: _*)
      .collect().map { row =>
        // input_file_name is a URI rendering; the manifest records on-disk
        // names — decode so stats key by the SAME string (a %20-encoded
        // partition dir would otherwise silently lose its data-column stats)
        val fname = uriDecode(row.getString(0))
        // table-relative path: everything from the commit dir onward (works
        // for hive-partitioned sub-paths, unlike basename splicing).
        // Converted-in-place files ([[VersionedTable.convert]]) live outside
        // data/ — relativize those against the table root instead.
        val idx = fname.indexOf(s"data/$commitId/")
        val rel =
          if (idx >= 0) fname.substring(idx)
          else {
            val abs = Paths.get(root).toAbsolutePath.toString + "/"
            val j = fname.indexOf(abs)
            require(j >= 0,
              s"scanned file $fname is neither under commit $commitId nor under $root")
            fname.substring(j + abs.length)
          }
        val n = row.getAs[String]("__nrows")
        val nullStats = statCols.map { case (c, _, _) =>
          val nc = (n.toLong - row.getAs[Long](s"nn_$c")).toString
          s"${VersionedTable.NullCountPrefix}$c" -> ((nc, nc, "nulls"))
        }.toMap
        rel -> (statCols.flatMap { case (c, _, kind) =>
          val mn = row.getAs[String](s"min_$c")
          val mx = row.getAs[String](s"max_$c")
          if (mn != null && mx != null) Some(c -> (mn, mx, kind)) else None
        }.toMap ++ nullStats
          + (VersionedTable.RowCountStat -> (n, n, "rows")))
      }.toMap
    files.map { f =>
      // a file absent from the grouped aggregation produced no rows (an
      // empty seed/partition file): its row count is zero BY CONSTRUCTION
      // — without this, one empty file would disable the metadata count
      // for the whole table
      val ds = dataStats.getOrElse(f,
        Map(VersionedTable.RowCountStat -> (("0", "0", "rows"))))
      f -> (ds ++ partStats.getOrElse(f, Map.empty))
    }.toMap
  }

  /** Count rows of `files` violating each of `constraints` in ONE scan of
    * exactly those files (the freshly written batch, never the table) and
    * raise [[ConstraintViolationException]] naming every violated constraint
    * if any row fails. Delta's CHECK semantics: a row passes only when the
    * expression evaluates to TRUE — NULL is a violation (a quality gate that
    * waves nulls through is a hole, not a gate). Called between data-file
    * write and manifest publish, so a rejected batch is never visible; its
    * orphaned files are swept by [[vacuum]]. */
  /** Implicit write-gate checks from schema nullability (Delta's NOT NULL
    * enforcement): one `IS NOT NULL` per non-nullable field, validated
    * through the same gate CHECK constraints use but NEVER persisted to
    * the manifest — nullability lives in the schema, the manifest's
    * `constraints` stay user-declared CHECKs only. */
  private def notNullChecks(
      schema: Option[org.apache.spark.sql.types.StructType]): Map[String, String] =
    schema.toSeq.flatMap(_.fields.filterNot(_.nullable).map(f =>
      s"NOT NULL `${f.name}`" -> s"`${f.name}` IS NOT NULL")).toMap

  private def validateWritten(spark: SparkSession, files: Seq[String],
      schema: Option[org.apache.spark.sql.types.StructType],
      constraints: Map[String, String]): Unit = {
    if (constraints.isEmpty || files.isEmpty) return
    val paths = files.map(f => Paths.get(root).resolve(f).toString)
    val df = schema.map(s => spark.read.schema(s).parquet(paths: _*))
      .getOrElse(spark.read.parquet(paths: _*))
    validateFrame(df, constraints)
  }

  /** Frame-variant of [[validateWritten]] for callers whose live rows are
    * not a plain file scan (a DV-carrying snapshot in [[addConstraint]]:
    * already-deleted rows must not be able to reject an ALTER). */
  private def validateFrame(df: DataFrame, constraints: Map[String, String]): Unit = {
    if (constraints.isEmpty) return
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    val ordered = constraints.toSeq.sortBy(_._1)
    val aggs = ordered.map { case (n, e) =>
      sum(when(coalesce(expr(e), lit(false)), 0L).otherwise(1L)).as(n) }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val violated = ordered.zipWithIndex.collect {
      case ((n, e), i) if !row.isNullAt(i) && row.getLong(i) > 0 =>
        s"$n ('$e'): ${row.getLong(i)} row(s)"
    }
    if (violated.nonEmpty) throw new ConstraintViolationException(
      s"CHECK constraint violation writing to $root — ${violated.mkString("; ")}")
  }

  /** Serialize + atomically publish manifest version `base`+1 (or v0 on an
    * empty table). The [[CommitStore.putIfAbsent]] is the commit point: two
    * writers racing to the same version number cannot both win (hard-link
    * CAS on POSIX/HDFS, conditional PUT on object stores — the pluggable
    * seam), and readers only ever see a complete manifest (create is
    * atomic).
    *
    * `base` is the snapshot version the CALLER's computation read — pinning
    * `next` to it turns the link into an optimistic-concurrency check: if
    * any other writer committed after the caller's read, the link collides
    * and [[ConcurrentCommitException]] is raised instead of silently
    * publishing a manifest that drops the concurrent commit's changes. */
  private def publish(files: Seq[String],
      schemaJson: String,
      stats: Map[String, Map[String, (String, String, String)]],
      txn: Option[(String, Long)],
      base: Option[Long],
      constraints: Map[String, String] = Map.empty,
      dvs: Seq[String] = Nil,
      partitionBy: Seq[String] = Nil,
      partitions: Map[String, Map[String, Option[String]]] = Map.empty,
      cdfKind: Option[String] = None,
      cdf: Seq[String] = Nil,
      columnIdsOverride: Option[Map[String, Long]] = None,
      maxColumnIdFloor: Long = 0L,
      stampedIds: Option[Map[String, Long]] = None,
      operation: Option[String] = None,
      identity: Option[(String, Long)] = None,
      identityAllowExplicit: Option[Boolean] = None,
      identityClear: Boolean = false,
      ingest: Seq[String] = Nil): Long = {
    Files.createDirectories(logDir)
    val next = base.map(_ + 1L).getOrElse(0L)
    val json = mapper.createObjectNode()
    json.put("version", next)
    // formatVersion is stamped by the snapshot/delta encoding choice below
    // in-commit timestamp, clamped strictly above the parent's so the
    // version order IS the time order even under clock skew or a
    // backwards-stepping wall clock (Delta's in-commit timestamps);
    // consumers read it via commitTimeOf with an mtime fallback for
    // manifests that predate the stamp
    json.put("commitTimeMs",
      math.max(System.currentTimeMillis(), base.map(commitTimeOf(_) + 1).getOrElse(0L)))
    json.put("schema", schemaJson) // keeps empty versions readable
    // the verb that produced this commit (DESCRIBE HISTORY's `operation`
    // column, Delta parity) — observability metadata, never load-bearing
    operation.foreach(op => json.put("operation", op))
    // stable column ids: carry the base's id for every surviving name,
    // mint fresh ids (maxColumnId+1...) for new names IN SCHEMA ORDER —
    // the same order writeDataFiles stamps unknown columns, so the ids in
    // freshly written parquet always agree with the manifest. A rename
    // passes columnIdsOverride to keep the old id under the new name.
    val schemaNames =
      org.apache.spark.sql.types.DataType.fromJson(schemaJson) match {
        case s: org.apache.spark.sql.types.StructType => s.fieldNames.toSeq
        case _ => Seq.empty
      }
    val baseIds = base.map(columnIdsOf).getOrElse(Map.empty)
    val baseMax = base.map(maxColumnIdOf).getOrElse(0L)
    // legacy guard: a table whose existing versions track NO ids has
    // id-less parquet on disk — by-id reads would break on those files, so
    // such tables stay by-name forever (rename needs a rewrite there).
    // Only a BRAND-NEW table (no base) starts id tracking.
    val legacy = base.isDefined && baseIds.isEmpty
    val colIds =
      if (legacy) Map.empty[String, Long]
      else columnIdsOverride.getOrElse {
        // the ids stamped into this commit's parquet (threaded from
        // writeDataFiles) are authoritative for new names: re-minting
        // against a head that moved during retry/rebase would disagree
        // with the bytes already on disk. If the new base conflicts with
        // the stamped ids — a racing schema-evolving writer claimed the
        // same fresh id for a different column, or re-recorded a stamped
        // name under another id — the files themselves are unusable for
        // by-id reads, so fail hard (no silent re-derive); the caller
        // must re-run the write against the new head.
        stampedIds.foreach(_.foreach { case (n, id) =>
          baseIds.get(n).filter(_ != id).foreach { bid =>
            throw new IllegalStateException(
              s"concurrent schema change at $root: column $n was stamped " +
                s"field id $id but the committed head records $bid; re-run the write")
          }
          baseIds.find { case (bn, bid) => bn != n && bid == id }.foreach {
            case (bn, _) => throw new IllegalStateException(
              s"concurrent schema change at $root: column $n was stamped " +
                s"field id $id, already held by column $bn at the committed " +
                "head; re-run the write")
          }
        })
        var nextId = math.max(baseMax,
          stampedIds.map(_.values.maxOption.getOrElse(0L)).getOrElse(0L))
        schemaNames.map { n =>
          n -> baseIds.getOrElse(n,
            stampedIds.flatMap(_.get(n)).getOrElse { nextId += 1; nextId })
        }.toMap
      }
    if (colIds.nonEmpty && schemaNames.nonEmpty) {
      val idNode = json.putObject("columnIds")
      schemaNames.filter(colIds.contains)
        .foreach(n => idNode.put(n, colIds(n)))
      json.put("maxColumnId",
        Seq(baseMax, maxColumnIdFloor, colIds.values.maxOption.getOrElse(0L)).max)
    }
    txn.foreach { case (app, v) => json.put("txnApp", app); json.put("txnVersion", v) }
    // identity declaration + high water: explicit from an allocating
    // append, else carried from the base so NO commit path can lower or
    // lose the watermark (monotonic by construction — the max below guards
    // a rebased append racing another allocator). Additionally raise the
    // water past every id this manifest's files RECORD: explicit identity
    // values can enter through full-frame funnels (overwrite commit,
    // replaceWhere, merge insert, the connector's INSERT OVERWRITE), and a
    // carried-forward watermark below a written id would let a later
    // appendIdentity re-mint it. Stats-plane arithmetic only — the per-file
    // max already collected for pruning, no scan.
    // identityClear (staged REPLACE TABLE with no identity in the new
    // definition): the replaced table's declaration and high water must NOT
    // survive into the new definition — REPLACE is a new table identity
    (if (identityClear) None
     else identity.orElse(base.flatMap(identityOf))).foreach { case (c, hw) =>
      val floor = base.flatMap(identityOf).collect { case (bc, bhw) if bc == c => bhw }
        .getOrElse(0L)
      val writtenMax = stats.valuesIterator
        .flatMap(_.get(c))
        .flatMap { case (_, mx, _) => scala.util.Try(mx.toLong).toOption }
        .foldLeft(0L)(math.max)
      val idn = json.putObject("identity")
      idn.put("col", c)
      idn.put("highWater", Seq(hw, floor, writtenMax).max)
      // BY DEFAULT vs ALWAYS: declared once, carried forever
      if (identityAllowExplicit.orElse(base.map(identityAllowsExplicit))
          .getOrElse(false)) idn.put("allowExplicit", true)
    }
    cdfKind.foreach(k => json.put("cdfKind", k))
    // source-file identities COPY INTO ingested in THIS commit — the same
    // manifest that adds their rows, so ingestion memory and data are atomic
    if (ingest.nonEmpty) {
      val iArr = json.putArray("ingest")
      ingest.sorted.foreach(iArr.add)
    }
    if (cdf.nonEmpty) {
      val cdfArr = json.putArray("cdf")
      cdf.sorted.foreach(cdfArr.add)
    }
    if (partitionBy.nonEmpty) {
      val pbArr = json.putArray("partitionBy")
      partitionBy.foreach(pbArr.add)
    }
    if (constraints.nonEmpty) {
      val cNode = json.putObject("constraints")
      constraints.toSeq.sortBy(_._1).foreach { case (n, e) => cNode.put(n, e) }
    }
    // temporal stats are rendered in the writer session's zone; record it
    // so prune-time filter rendering can match it exactly. A table state
    // holds ONE zone — if the base was recorded under a different zone,
    // the carried-forward timestamp stats would mix renderings, so those
    // columns' entries are dropped (they stop pruning; never wrong; the
    // delta diff below then restates the affected carried files).
    // DATE renders zone-free and is kept.
    val zone = org.apache.spark.sql.SparkSession.getActiveSession
      .map(_.sessionState.conf.sessionLocalTimeZone)
    val zoneSafe = if (stats.isEmpty) stats else {
      val baseZone = base.flatMap(statsZoneOf)
      val tsCols: Set[String] =
        org.apache.spark.sql.types.DataType.fromJson(schemaJson) match {
          case s: org.apache.spark.sql.types.StructType =>
            s.fields.collect {
              case f if f.dataType == org.apache.spark.sql.types.TimestampType => f.name
            }.toSet
          case _ => Set.empty
        }
      // a base manifest that predates statsZone recording is as unsafe as a
      // known mismatch: its carried timestamp stats were rendered under an
      // UNKNOWN zone, and stamping the current zone over them would let
      // readers wrongly prune live files — drop them too (they stop
      // pruning; never wrong; new commits re-record with a zone)
      if (zone.isEmpty || (baseZone == zone) ||
          (base.isEmpty && baseZone.isEmpty)) stats
      else stats.view.mapValues(_.filterNot { case (c, _) => tsCols(c) }).toMap
    }
    if (stats.nonEmpty) zone.foreach(z => json.put("statsZone", z))
    // ---- file-level state: encode as a DELTA against the base when that
    // is smaller, a self-contained snapshot otherwise. The snapshot cases:
    // a first commit, a rewrite churning most of the table (an overwrite's
    // delta lists every old file removed AND every new file added — the
    // snapshot is strictly smaller), and the SnapshotEvery cadence that
    // bounds cold-start replay on checkpoint-less tables.
    val baseState = base.map(stateOf).getOrElse(VersionedTable.TableState.empty)
    val nextFiles = files.distinct.sorted.toVector
    val fileSet = nextFiles.toSet
    val nextDvs = dvs.distinct.sorted.toVector
    val nextState = VersionedTable.TableState(nextFiles,
      zoneSafe.view.filterKeys(fileSet).toMap,
      partitions.view.filterKeys(fileSet).toMap, nextDvs)
    val removed = baseState.files.filterNot(fileSet)
    val baseSet = baseState.files.toSet
    // upserts: genuinely new files plus carried files whose recorded
    // stats/partition values changed (rename remaps, zone drops)
    val upserts = nextFiles.filter { f =>
      !baseSet(f) || baseState.stats.get(f) != nextState.stats.get(f) ||
        baseState.parts.get(f) != nextState.parts.get(f)
    }
    val dvAdd = nextDvs.filterNot(baseState.dvs.toSet)
    val dvRemove = baseState.dvs.filterNot(nextDvs.toSet)
    val fullAnchor = base.map(anchorVersionOf)
    val ckptAnchor = base.flatMap(b => checkpointStateVersions().filter(_ <= b).lastOption)
    val anchorDist = next - (fullAnchor.toSeq ++ ckptAnchor.toSeq).maxOption.getOrElse(next)
    val writeFull = base.isEmpty ||
      removed.size + upserts.size >= nextFiles.size ||
      anchorDist >= VersionedTable.SnapshotEvery
    if (writeFull) {
      json.put("formatVersion", ManifestFormatFull)
      writeStateFields(json, nextState)
    } else {
      json.put("formatVersion", ManifestFormatDelta)
      json.put("delta", true)
      fullAnchor.foreach(a => json.put("anchor", a))
      if (removed.nonEmpty) {
        val rArr = json.putArray("remove")
        removed.foreach(rArr.add)
      }
      if (upserts.nonEmpty) {
        val aNode = json.putObject("add")
        upserts.foreach { f =>
          val ent = aNode.putObject(f)
          nextState.parts.get(f).foreach(v => putPartValues(ent.putObject("partitions"), v))
          nextState.stats.get(f).foreach(v => putStatValues(ent.putObject("stats"), v))
        }
      }
      if (dvAdd.nonEmpty) { val a = json.putArray("dvAdd"); dvAdd.foreach(a.add) }
      if (dvRemove.nonEmpty) { val a = json.putArray("dvRemove"); dvRemove.foreach(a.add) }
    }
    val won = store.putIfAbsent(manifestPath(next),
      mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))
    if (!won) throw new ConcurrentCommitException(
      s"concurrent commit of version $next at $root")
    // seed the snapshot cache so the NEXT commit's base lookup is a hit
    manifestFpOpt(next).foreach(fp =>
      VersionedTable.lruFor(canonicalRoot).put(next, fp, nextState))
    next
  }

  /** Render a full state's `files`/`dvs`/`partitions`/`stats` fields into
    * `json` — shared by snapshot manifests, checkpoint state sidecars, and
    * the vacuum-time floor materialization. */
  private def writeStateFields(json: com.fasterxml.jackson.databind.node.ObjectNode,
      st: VersionedTable.TableState): Unit = {
    if (st.dvs.nonEmpty) {
      val dvArr = json.putArray("dvs")
      st.dvs.foreach(dvArr.add)
    }
    val arr = json.putArray("files")
    st.files.foreach(arr.add)
    // per-file partition values are recorded VERBATIM under each file's own
    // layout epoch: after alterPartitioning the current spec and a carried
    // file's layout legitimately differ, and normalizing values to the spec
    // would null-out or drop the legacy epoch's values
    if (st.parts.nonEmpty) {
      val pNode = json.putObject("partitions")
      st.parts.toSeq.sortBy(_._1).foreach { case (f, vals) =>
        putPartValues(pNode.putObject(f), vals)
      }
    }
    if (st.stats.nonEmpty) {
      val statsNode = json.putObject("stats")
      st.stats.toSeq.sortBy(_._1).foreach { case (f, cols) =>
        putStatValues(statsNode.putObject(f), cols)
      }
    }
  }

  private def putPartValues(fNode: com.fasterxml.jackson.databind.node.ObjectNode,
      vals: Map[String, Option[String]]): Unit =
    vals.toSeq.sortBy(_._1).foreach {
      case (c, Some(value)) => fNode.put(c, value); ()
      case (c, None) => fNode.putNull(c); ()
    }

  private def putStatValues(fNode: com.fasterxml.jackson.databind.node.ObjectNode,
      cols: Map[String, (String, String, String)]): Unit =
    cols.toSeq.sortBy(_._1).foreach { case (c, (mn, mx, kind)) =>
      val a = fNode.putArray(c); a.add(mn); a.add(mx); a.add(kind); ()
    }

  /** Publish a rewrite (delete/update/merge/MOR-delete) computed against
    * snapshot `scannedV`, resolving commit races the way Delta's
    * WriteSerializable level does: a collision with commits that are PURE
    * APPENDS with stable metadata (no dropped files, unchanged DVs/schema/
    * partitioning/constraints) whose fresh files provably cannot interact
    * with this rewrite (`freshSafe` — a predicate/key-range scan of JUST
    * those files, cost O(interloper batch)) is resolved by REBASING: the
    * same new/cdf files republish at the new head with the appended files
    * carried forward, which equals the serial append-then-rewrite result.
    * A colliding REWRITE folds in at FILE granularity (Delta's conflict
    * unit): it commutes with this one when the files it removed intersect
    * neither this rewrite's removed set (`touched`) nor the files its
    * fresh DVs tombstone (`dvGuard`), AND its added files pass the same
    * `freshSafe` row-interaction scan appends do — then carrying its
    * file-list delta forward equals the serial theirs-then-ours result
    * (this rewrite, re-run on the post-interloper snapshot, would have
    * touched exactly the same files: untouched files provably hold no
    * matching rows, and freshSafe proves the interloper's additions hold
    * none either). This subsumes the earlier partition-disjointness rule —
    * same-partition and unpartitioned-table rewrites now commute whenever
    * their file footprints and row sets do, which is what the reference's
    * parallel scheduler DAG (`scd2-job-scheduler.yaml:47-48`) needs when
    * two jobs maintain different key ranges of one table. A PURE DV
    * ADDITION (a racing MOR delete/merge) folds when its tombstones target
    * files this rewrite neither removes nor tombstones itself: the
    * interloper's added DV files are carried into the republished list, the
    * serial ours-then-theirs result. Any other interloper (a rewrite of a
    * file we touch/tombstone, a DV removal, tombstones on our files, a
    * metadata change, fresh files whose rows interact) rethrows
    * [[ConcurrentCommitException]] — the caller re-runs against the new
    * head for full serializability. At 100 TB this is the difference
    * between a big merge surviving the steady drip of small ingest and
    * maintenance commits and re-running per collision. */
  private def publishRewrite(
      scannedV: Long,
      touched: Set[String],
      newFiles: Seq[String],
      newStats: Map[String, Map[String, (String, String, String)]],
      schemaJson: String,
      dvsCarried: Seq[String],
      newPartVals: Map[String, Map[String, Option[String]]],
      cdfKind: Option[String],
      cdfFiles: Seq[String],
      txn: Option[(String, Long)],
      freshSafe: (Long, Seq[String]) => Boolean,
      maxRebases: Int = 10,
      stampedIds: Option[Map[String, Long]] = None,
      dvGuard: Set[String] = Set.empty,
      operation: Option[String] = None): Long = {
    val pb = partitionByOf(scannedV)
    val cs = constraintsOf(scannedV)
    var base = scannedV
    var rebases = 0
    // DV files added by folded-in interlopers, carried into the republish
    var extraDvs: Seq[String] = Nil
    while (true) {
      try {
        return publish(
          filesOf(base).filterNot(touched) ++ newFiles,
          schemaJson, statsOf(base).view.filterKeys(f => !touched(f)).toMap ++ newStats,
          txn, Some(base), cs, dvs = dvsCarried ++ extraDvs, partitionBy = pb,
          partitions = partitionValuesOf(base).view.filterKeys(f => !touched(f)).toMap
            ++ newPartVals,
          cdfKind = cdfKind, cdf = cdfFiles, stampedIds = stampedIds,
          operation = operation)
      } catch { case e: ConcurrentCommitException =>
        rebases += 1
        if (rebases > maxRebases) throw e
        val h = resolve()
        val vs = versions()
        val steps = vs.filter(x => x > base && x <= h)
        // An interloper commit folds in safely when, versus its predecessor,
        // it is (a) a PURE APPEND with stable metadata, (b) a REWRITE whose
        // removed files intersect neither our removed set nor the files our
        // fresh DVs tombstone (file-granular commutation — its ADDED files
        // are part of `fresh` below and must additionally pass the caller's
        // freshSafe row-interaction scan, exactly like appended files), or
        // (c) a PURE DV ADDITION whose tombstones target none of our
        // files — established by READING the added DV parquet (cost: one
        // tombstone-batch-sized scan), since the manifest alone can't name
        // a DV's covered files. DV removals stay a hard conflict.
        def stepSafe(prev: Long, x: Long): Boolean = {
          val stableMeta = partitionByOf(x) == pb &&
            constraintsOf(x) == cs &&
            schemaOf(x).map(_.json).contains(schemaJson)
          if (!stableMeta) return false
          val dvPrev = dvsOf(prev).toSet
          val dvX = dvsOf(x).toSet
          if (!dvPrev.subsetOf(dvX)) return false // a DV was removed/rewritten
          val dvAdded = (dvX -- dvPrev).toSeq.sorted
          if (dvAdded.nonEmpty) {
            val spark = org.apache.spark.sql.SparkSession.getActiveSession
              .getOrElse(return false)
            val covered = spark.read.parquet(
                dvAdded.map(f => Paths.get(root).resolve(f).toString): _*)
              .select("file").distinct().collect().map(_.getString(0)).toSet
            // their tombstones on a file we remove would be lost by our
            // rewrite; on a file we tombstone too, the serial orders
            // diverge (counts/CDF) — both refuse
            if (covered.exists(f => touched(f) || dvGuard(f))) return false
          }
          val prevFiles = filesOf(prev).toSet
          val xFiles = filesOf(x).toSet
          if (prevFiles.subsetOf(xFiles)) return true // pure append / DV-only
          val removed = prevFiles -- xFiles
          // they rewrote a file we remove — or one our fresh DVs tombstone
          // (our tombstones would silently vanish against their rewrite)
          !removed.exists(f => touched(f) || dvGuard(f))
        }
        // base must itself still be retained: a vacuumed base would misalign
        // the (step, prev) pairing below and could misclassify a rewrite as
        // a pure append — refuse the rebase instead (rethrow)
        val safe = vs.contains(base) &&
          steps.zip(base +: steps).forall { case (x, prev) => stepSafe(prev, x) }
        if (!safe) throw e
        val fresh = filesOf(h).filterNot(filesOf(base).toSet)
        if (!freshSafe(h, fresh)) throw e
        extraDvs = extraDvs ++ dvsOf(h).filterNot(dvsOf(base).toSet)
        base = h
      }
    }
    -1L // unreachable
  }

  /** Full-snapshot commit (Overwrite semantics). A racing writer is resolved
    * by optimistic retry: the data files are already immutable on disk, so a
    * collision only re-targets the manifest at the new head (last-writer-wins,
    * as a blind overwrite means). */
  /** Columns whose generation expressions are recorded in `schema`'s field
    * metadata ([[VersionedTable.GenerationExprKey]]) — Delta's generated
    * columns, stored the same way (in-schema metadata rides every publish
    * with zero extra plumbing). */
  private def generatedExprsOf(
      schema: org.apache.spark.sql.types.StructType): Seq[(String, String)] =
    schema.fields.toSeq.flatMap(f =>
      if (f.metadata.contains(VersionedTable.GenerationExprKey))
        Some(f.name -> f.metadata.getString(VersionedTable.GenerationExprKey))
      else None)

  /** (Re)compute every generated column of `schema` on the incoming batch:
    * a batch may omit them (the normal shape), and a supplied value is
    * OVERWRITTEN by the expression — stronger than validate-and-refuse,
    * and what makes partition values provably consistent with their source
    * columns. */
  private def applyGenerated(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    generatedExprsOf(schema).foldLeft(df) { case (d, (n, g)) =>
      d.withColumn(n, org.apache.spark.sql.functions.expr(g))
    }

  /** Columns of `schema` carrying a CURRENT_DEFAULT that `df` OMITS get the
    * default computed at write time — the SQL-standard half of column
    * DEFAULTs ([[setColumnDefault]]). Reads never backfill (no existence
    * defaults: old files still read an evolution-added column as null,
    * Delta's contract). A column the batch supplies is untouched. */
  private def applyDefaults(df: DataFrame,
      schema: org.apache.spark.sql.types.StructType): DataFrame =
    schema.fields
      .filter(f => f.metadata.contains(VersionedTable.CurrentDefaultKey) &&
        !df.columns.exists(_.equalsIgnoreCase(f.name)))
      .foldLeft(df) { (d, f) =>
        d.withColumn(f.name, org.apache.spark.sql.functions
          .expr(f.metadata.getString(VersionedTable.CurrentDefaultKey))
          .cast(f.dataType))
      }

  /** Refuse write targets that would DESYNCHRONIZE a generated column: the
    * generated column itself (it is ALWAYS computed, never written), or
    * any column its expression references (an in-place SET would leave the
    * stored generated value stale — and for partition columns, rows
    * stranded in the wrong partition). Delta enforces the same rule. */
  private def requireNoGeneratedDesync(spark: SparkSession,
      schema: org.apache.spark.sql.types.StructType,
      targets: Seq[String], what: String): Unit = {
    val gens = generatedExprsOf(schema)
    if (gens.isEmpty || targets.isEmpty) return
    val genCols = gens.map(_._1).toSet
    val sources: Map[String, Seq[String]] = gens.map { case (n, g) =>
      n -> spark.sessionState.sqlParser.parseExpression(g).collect {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          ua.nameParts.last
      }
    }.toMap
    targets.foreach { c =>
      require(!genCols.contains(c),
        s"$what cannot write $c: it is a GENERATED column of $root " +
          "(always computed from its expression)")
      sources.collectFirst { case (n, ss) if ss.exists(_.equalsIgnoreCase(c)) => n }
        .foreach(n => throw new IllegalArgumentException(
          s"$what on $c would desynchronize generated column $n of $root " +
            "(its expression reads the column); rewrite the rows through " +
            "overwritePartitions/replaceWhere instead"))
    }
  }

  /** GENERATED ALWAYS AS IDENTITY columns are engine-assigned: refuse
    * targeted writes (UPDATE SET / MERGE SET), as Delta does. Full-frame
    * funnels (overwrite commit, replaceWhere, merge INSERT) unavoidably
    * carry the column; those are kept safe by the publish-side watermark
    * raise over the written files' max-id stats. */
  private def requireNoIdentityWrite(v: Long, targets: Seq[String], what: String): Unit =
    identityOf(v).foreach { case (c, _) =>
      require(!targets.exists(_.equalsIgnoreCase(c)),
        s"$what cannot write $c: it is GENERATED ALWAYS AS IDENTITY on " +
          s"$root (ids are engine-assigned; the watermark guards uniqueness)")
    }

  /** The watermark raise in publish reads per-file max-id STATS: a
    * stats-less commit on an identity table could slip explicit ids past
    * the high water and let appendIdentity re-mint them — refuse up front
    * (here, where the flag is known — a publish-side file check cannot
    * tell "stats off" from a harmless zero-row part file). */
  private def requireStatsForIdentity(collectStats: Boolean, what: String): Unit =
    if (!collectStats)
      latestVersion().flatMap(identityOf).foreach { case (c, _) =>
        throw new IllegalArgumentException(
          s"$what with collectStats = false is not allowed on $root: $c is " +
            "an identity column and the publish-side watermark raise reads " +
            "per-file max-id stats")
      }

  def commit(df: DataFrame, numPartitions: Option[Int] = None,
             sortBy: Seq[String] = Nil, collectStats: Boolean = true,
             txn: Option[(String, Long)] = None,
             partitionBy: Seq[String] = Nil,
             generatedColumns: Map[String, String] = Map.empty,
             resetIdentity: Boolean = false): Long = {
    // overwriting an existing snapshot drops its rows (first commit is fine)
    if (latestVersion().isDefined) requireNotAppendOnly("Overwrite commit")
    requireStatsForIdentity(collectStats, "Overwrite commit")
    // generated columns (Delta parity, most often the PARTITION column
    // derived from a data column, e.g. day = CAST(ts AS DATE)): computed
    // here and recorded as in-schema metadata so every later write funnel
    // recomputes them — writers never supply them by hand. Reads need no
    // transform-derivation pass: per-file min/max stats on the SOURCE
    // column subsume it (a day-partition's files carry tight ts bounds),
    // and explicit partition predicates still prune via readPartitioned.
    val df0 = generatedColumns.foldLeft(df) { case (d, (n, g)) =>
      val md = new org.apache.spark.sql.types.MetadataBuilder()
        .putString(VersionedTable.GenerationExprKey, g).build()
      val computed = d.withColumn(n, org.apache.spark.sql.functions.expr(g))
      computed.select(computed.schema.fieldNames.map { fn =>
        if (fn == n) col(fn).as(fn, md) else col(fn)
      }.toSeq: _*)
    }
    val (commitId, files, partVals, stamped) = writeDataFiles(df0, numPartitions, sortBy, partitionBy)
    val partTypes = df0.schema.fields.map(f => f.name -> f.dataType).toMap
    val stats =
      if (collectStats && files.nonEmpty)
        collectFileStats(df0.sparkSession, commitId, files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    // CHECK constraints survive an overwrite (they describe the table, not a
    // snapshot) and gate the incoming batch; validated per attempt so a retry
    // against a head whose constraints just changed re-checks honestly
    retryPublish { base =>
      val cs = base.map(constraintsOf).getOrElse(Map.empty)
      // partitioned files don't store the partition columns, so a constraint
      // referencing one would see nulls in a file scan — validate the input
      // frame instead (same rows, pre-layout)
      val gate = cs ++ notNullChecks(Some(df0.schema))
      if (partitionBy.isEmpty) validateWritten(df0.sparkSession, files, Some(df0.schema), gate)
      else validateFrame(df0, gate)
      publish(files, df0.schema.json, stats, txn, base, cs,
        partitionBy = partitionBy, partitions = partVals, stampedIds = stamped,
        operation = Some("OVERWRITE"), identityClear = resetIdentity)
    }
  }

  /** Full-snapshot commit PINNED to the head the caller read (`base` = that
    * version, None = the caller saw an empty table and expects to create
    * version 0): any concurrent commit makes the publish raise
    * [[ConcurrentCommitException]] instead of last-writer-wins. This is the
    * right commit for read-modify-write maintainers — a writer whose OUTPUT
    * depends on the snapshot it read (e.g. [[MaterializedAgg.refresh]]
    * folding a delta into the view it just read) must not blindly republish
    * over a commit it never saw. */
  def commitPinnedAt(df: DataFrame, base: Option[Long],
      numPartitions: Option[Int] = None, sortBy: Seq[String] = Nil,
      collectStats: Boolean = true, txn: Option[(String, Long)] = None,
      partitionBy: Seq[String] = Nil): Long = {
    requireStatsForIdentity(collectStats, "Pinned commit")
    val (commitId, files, partVals, stamped) = writeDataFiles(df, numPartitions, sortBy, partitionBy)
    val partTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val stats =
      if (collectStats && files.nonEmpty)
        collectFileStats(df.sparkSession, commitId, files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    val cs = base.map(constraintsOf).getOrElse(Map.empty)
    val gate = cs ++ notNullChecks(Some(df.schema))
    if (partitionBy.isEmpty) validateWritten(df.sparkSession, files, Some(df.schema), gate)
    else validateFrame(df, gate)
    publish(files, df.schema.json, stats, txn, base, cs,
      partitionBy = partitionBy, partitions = partVals, stampedIds = stamped,
      operation = Some("OVERWRITE"))
  }

  /** Run `attempt` against the current head, retrying on a commit collision
    * with the refreshed head (bounded; commit contention at a given version
    * resolves in one winner per round, so progress is guaranteed). */
  private def retryPublish(attempt: Option[Long] => Long, maxRetries: Int = 10): Long = {
    var tries = 0
    while (true) {
      try return attempt(latestVersion())
      catch { case e: ConcurrentCommitException =>
        tries += 1
        if (tries > maxRetries) throw e
      }
    }
    -1L // unreachable
  }

  /** Append `df`'s rows as the next version WITHOUT rewriting existing data
    * — the ingest path at scale (a 100 TB table cannot re-snapshot per
    * batch): the new manifest carries every prior file forward plus the
    * freshly written ones, so commit cost is proportional to the batch, not
    * the table. Additive schema evolution is supported: new columns extend
    * the recorded union schema, and older files resolve them to null at read
    * (manifest-schema'd scan); a type change or a batch MISSING one of the
    * table's columns is refused (Delta-style schema enforcement — silently
    * null-filling an absent column is a data-quality hole, not evolution). */
  def append(df0: DataFrame, numPartitions: Option[Int] = None,
             sortBy: Seq[String] = Nil, collectStats: Boolean = true,
             txn: Option[(String, Long)] = None): Long = {
    requireStatsForIdentity(collectStats, "Append")
    // the batch is laid out with the TABLE's partitioning (read from the
    // head manifest): partition layout is a table property, not a per-batch
    // choice — a mixed layout would break partition pruning silently.
    // A benign race: if the head changes between this read and the publish,
    // the retry below re-validates against the new head; the layout check
    // there refuses a partitioning mismatch.
    val tablePb = latestVersion().map(partitionByOf).getOrElse(Nil)
    // generated columns recompute from the recorded schema: the batch may
    // omit them, a supplied value is overwritten (provable consistency);
    // omitted DEFAULT columns fill first (a default never feeds a
    // generated expression's source, but the symmetric order is harmless)
    val df = latestVersion().flatMap(schemaOf)
      .map(s => applyGenerated(applyDefaults(df0, s), s)).getOrElse(df0)
    val (commitId, files, partVals, stamped) = writeDataFiles(df, numPartitions, sortBy, tablePb)
    val partTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    val stats =
      if (collectStats && files.nonEmpty)
        collectFileStats(df.sparkSession, commitId, files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    // appends never conflict semantically: on a commit collision the carried
    // file set is simply rebased onto the new head and re-published (the
    // batch's own data files are written exactly once, above)
    val published = retryPublish {
      case None => publish(files, df.schema.json, stats, txn, None,
        partitionBy = tablePb, partitions = partVals, cdfKind = Some("append"),
        stampedIds = stamped, operation = Some("APPEND"))
      case Some(v) =>
        require(partitionByOf(v) == tablePb,
          s"table partitioning changed concurrently (${partitionByOf(v)} vs $tablePb); " +
            "re-run the append against the new head")
        val prior = schemaOf(v).getOrElse(
          throw new IllegalStateException(s"version $v of $root has no recorded schema"))
        val priorByName = prior.fields.map(f => f.name -> f).toMap
        val dfByName = df.schema.fields.map(f => f.name -> f).toMap
        // fully-nullable rendering of a type (recursive): used to accept a
        // batch that is strictly STRICTER in nested nullability than the
        // recorded type — non-null elements flowing into a nullable-element
        // column is always safe; the reverse stays refused (nulls against
        // a non-null contract)
        def laxed(dt: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
          import org.apache.spark.sql.types._
          dt match {
            case s: StructType => StructType(s.fields.map(f =>
              f.copy(dataType = laxed(f.dataType), nullable = true)))
            case a: ArrayType => ArrayType(laxed(a.elementType), containsNull = true)
            case m: MapType => MapType(laxed(m.keyType), laxed(m.valueType),
              valueContainsNull = true)
            case other => other
          }
        }
        // NESTED additive evolution (Delta mergeSchema parity): a batch
        // whose struct column carries EXTRA nested fields widens the
        // recorded type — the new fields append after the prior ones,
        // forced nullable (older files resolve them to null by name inside
        // the struct, the parquet reader's missing-nested-field rule; on
        // id-tracked tables nested names never carry ids, so top-level
        // RENAME stays unaffected). The rest of the contract is the
        // top-level one: a batch MISSING a prior nested field refuses
        // (silent null-fill is a data hole, not evolution), a changed leaf
        // type refuses, relaxed nullability refuses.
        def mergeType(path: String, p: org.apache.spark.sql.types.DataType,
            i: org.apache.spark.sql.types.DataType): org.apache.spark.sql.types.DataType = {
          import org.apache.spark.sql.types._
          (p, i) match {
            case (ps: StructType, is: StructType) =>
              val iByName = is.fields.map(f => f.name -> f).toMap
              val missingNested = ps.fields.map(_.name).filterNot(iByName.contains)
              require(missingNested.isEmpty,
                s"append batch is missing nested field(s) of $path: " +
                  missingNested.mkString(", "))
              val kept = ps.fields.map { pf =>
                val inf = iByName(pf.name)
                require(pf.nullable || !inf.nullable,
                  s"append cannot relax nullability of $path.${pf.name}")
                pf.copy(dataType =
                  mergeType(s"$path.${pf.name}", pf.dataType, inf.dataType))
              }
              val addedNested = is.fields
                .filterNot(f => ps.fieldNames.contains(f.name))
                .map(f => f.copy(dataType = laxed(f.dataType), nullable = true))
              StructType(kept ++ addedNested)
            case (ArrayType(pe, pn), ArrayType(ie, in)) =>
              require(pn || !in,
                s"append cannot relax element nullability of $path")
              ArrayType(mergeType(s"$path.element", pe, ie), pn)
            case (MapType(pk, pv, pn), MapType(ik, iv, in)) if pk == ik =>
              require(pn || !in,
                s"append cannot relax value nullability of $path")
              MapType(pk, mergeType(s"$path.value", pv, iv), pn)
            case _ =>
              require(p == i || laxed(i) == p,
                s"append cannot change column $path: $p -> $i")
              p
          }
        }
        val mergedByName = df.schema.fields.flatMap { f =>
          priorByName.get(f.name).map(p =>
            f.name -> mergeType(f.name, p.dataType, f.dataType))
        }.toMap
        val missing = prior.fields.map(_.name).filterNot(dfByName.contains)
        require(missing.isEmpty,
          s"append batch is missing table column(s): ${missing.mkString(", ")}")
        // evolution-added columns are forced nullable in the recorded
        // union: every OLDER file reads them as null, so a non-nullable
        // addition would be unsatisfiable by construction
        val added = df.schema.fields.filterNot(f => priorByName.contains(f.name))
          .map(_.copy(nullable = true))
        val union = org.apache.spark.sql.types.StructType(
          prior.fields.map(p => p.copy(dataType =
            mergedByName.getOrElse(p.name, p.dataType))) ++ added)
        val cs = constraintsOf(v)
        // only the incoming batch is scanned: carried-forward files already
        // passed their own write-time gate (and addConstraint re-proved them);
        // NOT NULL gates come from the TABLE's recorded nullability
        val gate = cs ++ notNullChecks(Some(prior))
        if (tablePb.isEmpty) validateWritten(df.sparkSession, files, Some(df.schema), gate)
        else validateFrame(df, gate)
        // deletion vectors ride along unchanged: an append touches no
        // existing file, so no tombstone can be affected
        publish(filesOf(v) ++ files, union.json, statsOf(v) ++ stats, txn, Some(v), cs,
          dvs = dvsOf(v), partitionBy = tablePb,
          partitions = partitionValuesOf(v) ++ partVals, cdfKind = Some("append"),
          stampedIds = stamped, operation = Some("APPEND"))
    }
    maybeAutoCheckpoint(df.sparkSession)
    published
  }

  /** Rewrite-predicate candidate files planned from the checkpoint parquet
    * — the delete/update/replaceWhere analogue of
    * [[filesOverlappingSourceKeys]]'s checkpointed branch. Bounds derive
    * from the predicate's top-level equality/range conjuncts on numeric,
    * string, and temporal columns (temporal literals render in the
    * manifest's recorded stats zone — see [[temporalBound]]) and are
    * evaluated DISTRIBUTED against the per-file stats rows; a file with no
    * stats for a bounded column or an uncastable bound survives — the pass
    * is a prepass to the row-level touched scan, so a surviving false
    * candidate costs I/O,
    * never correctness. None when the head isn't checkpointed or no bound
    * is derivable (callers then scan the full manifest list). */
  /** Top-level AND conjuncts of a parsed predicate. */
  private def conjunctsOf(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Seq[org.apache.spark.sql.catalyst.expressions.Expression] = e match {
    case org.apache.spark.sql.catalyst.expressions.And(l, r) =>
      conjunctsOf(l) ++ conjunctsOf(r)
    case x => Seq(x)
  }

  /** A bare single-part column reference, if that's what `e` is. */
  private def bareAttr(e: org.apache.spark.sql.catalyst.expressions.Expression)
      : Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
        if a.nameParts.length == 1 => Some(a.nameParts.head)
    case _ => None
  }

  /** A literal's external (driver-side) value for the types our stats and
    * hashes handle; None disables the conjunct. */
  private def literalValue(l: org.apache.spark.sql.catalyst.expressions.Literal)
      : Option[Any] = l.value match {
    case null => None
    case u: org.apache.spark.unsafe.types.UTF8String => Some(u.toString)
    case d: org.apache.spark.sql.types.Decimal => Some(d.toBigDecimal)
    case n: java.lang.Number => Some(n)
    case _ => None
  }

  /** A stats bound or Bloom probe is only sound when the literal's value
    * category matches the column's type: SQL coerces `strCol > 20` to a
    * DOUBLE comparison, but the recorded min/max are strings — comparing
    * the numeric literal against them lexicographically ('100' < '20')
    * would prune files that hold matching rows. Cross-category conjuncts
    * are dropped so those files conservatively survive to the row scan. */
  private def literalMatchesType(dt: org.apache.spark.sql.types.DataType,
      v: Any): Boolean = dt match {
    case _: org.apache.spark.sql.types.NumericType =>
      v.isInstanceOf[java.lang.Number] || v.isInstanceOf[scala.math.BigDecimal]
    case org.apache.spark.sql.types.StringType => v.isInstanceOf[String]
    case _ => false
  }

  /** A temporal literal rendered EXACTLY as version `v`'s stats strings
    * were (the [[StatsBounds.render]] convention in the manifest's recorded
    * stats zone): string literals parse with Spark's own cast semantics in
    * the SESSION zone (what row-level evaluation will do), then the instant
    * re-renders in the STATS zone — so a checkpoint-planned rewrite keyed
    * on a time column prunes from the same lexicographic comparison the
    * read path uses, instead of scanning the full file list. None for an
    * unparseable value: the conjunct contributes no bound, always safe. */
  private def temporalBound(spark: SparkSession, statsZone: String,
      dt: org.apache.spark.sql.types.DataType,
      l: org.apache.spark.sql.catalyst.expressions.Literal): Option[String] = {
    import org.apache.spark.sql.catalyst.util.DateTimeUtils
    val sessionZone = java.time.ZoneId.of(
      spark.sessionState.conf.sessionLocalTimeZone)
    dt match {
      case org.apache.spark.sql.types.TimestampType =>
        val micros: Option[Long] = (l.dataType, l.value) match {
          case (org.apache.spark.sql.types.TimestampType, m: java.lang.Long) =>
            Some(m)
          case (org.apache.spark.sql.types.StringType,
                u: org.apache.spark.unsafe.types.UTF8String) =>
            DateTimeUtils.stringToTimestamp(u, sessionZone)
          case _ => None
        }
        micros.flatMap(m =>
          StatsBounds.render(DateTimeUtils.microsToInstant(m), statsZone))
      case org.apache.spark.sql.types.DateType =>
        val days: Option[Int] = (l.dataType, l.value) match {
          case (org.apache.spark.sql.types.DateType, d: java.lang.Integer) =>
            Some(d)
          case (org.apache.spark.sql.types.StringType,
                u: org.apache.spark.unsafe.types.UTF8String) =>
            DateTimeUtils.stringToDate(u)
          case _ => None
        }
        days.map(d => java.time.LocalDate.ofEpochDay(d.toLong).toString)
      case _ => None
    }
  }

  private[table] def checkpointPlanCandidates(spark: SparkSession, v: Long,
      condition: String): Option[Seq[String]] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    import org.apache.spark.sql.functions.{coalesce, element_at, lit}
    import org.apache.spark.sql.types.{DateType, NumericType, StringType, TimestampType}
    import spark.implicits._
    if (!checkpointVersions().lastOption.contains(v)) return None
    val schema = schemaOf(v).getOrElse(return None)
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(condition)
      catch { case _: Exception => return None }
    def conj(e: ce.Expression): Seq[ce.Expression] = conjunctsOf(e)
    // unlike the Bloom probes (bareAttr: top-level only — sidecars are
    // registered by top-level name), the stats pass also accepts DOTTED
    // struct-leaf references: collectFileStats keys nested leaves by
    // dotted path, and leafTypeOf below resolves the path against the
    // schema (an unresolvable multi-part name — e.g. an alias
    // qualification — finds no type and contributes nothing, safely)
    def attr(e: ce.Expression): Option[String] = e match {
      case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
          if a.nameParts.nonEmpty => Some(a.nameParts.mkString("."))
      case _ => None
    }
    def leafTypeOf(c: String): Option[org.apache.spark.sql.types.DataType] =
      VersionedTable.leafType(schema, c)
    type L = Option[ce.Literal]
    val raw: Seq[(String, L, L)] = conj(parsed).flatMap {
      case ce.EqualTo(a, l: ce.Literal) =>
        attr(a).map(c => (c, Some(l): L, Some(l): L))
      case ce.EqualTo(l: ce.Literal, a) =>
        attr(a).map(c => (c, Some(l): L, Some(l): L))
      case ce.GreaterThan(a, l: ce.Literal) =>
        attr(a).map(c => (c, Some(l): L, None: L))
      case ce.GreaterThanOrEqual(a, l: ce.Literal) =>
        attr(a).map(c => (c, Some(l): L, None: L))
      case ce.LessThan(a, l: ce.Literal) =>
        attr(a).map(c => (c, None: L, Some(l): L))
      case ce.LessThanOrEqual(a, l: ce.Literal) =>
        attr(a).map(c => (c, None: L, Some(l): L))
      case ce.GreaterThan(l: ce.Literal, a) =>
        attr(a).map(c => (c, None: L, Some(l): L))
      case ce.GreaterThanOrEqual(l: ce.Literal, a) =>
        attr(a).map(c => (c, None: L, Some(l): L))
      case ce.LessThan(l: ce.Literal, a) =>
        attr(a).map(c => (c, Some(l): L, None: L))
      case ce.LessThanOrEqual(l: ce.Literal, a) =>
        attr(a).map(c => (c, Some(l): L, None: L))
      case _ => Nil
    }
    // IS NULL / IS NOT NULL conjuncts prune on the nullCount pseudo-stat
    // (same skip rules as readBounded's nullness pass); only columns the
    // schema actually has qualify — an unknown name contributes nothing
    val nullConjuncts: Seq[(String, Boolean)] = conj(parsed).flatMap {
      case ce.IsNull(a) => attr(a).map((_, true))
      case ce.IsNotNull(a) => attr(a).map((_, false))
      case _ => Nil
    }.filter { case (c, _) => leafTypeOf(c).isDefined }
    val statsZone = statsZoneOf(v)
      .getOrElse(spark.sessionState.conf.sessionLocalTimeZone)
    // a bound survives only when the literal converts soundly for the
    // column's type: numeric literal on a numeric column (cast compare),
    // string literal on a string column (lexicographic, the stats' own
    // order), and temporal literal/castable-string on a temporal column
    // (rendered in the STATS zone, compared lexicographically — the exact
    // comparison the read path's [[StatsBounds]] pruning performs). A
    // cross-category conjunct contributes nothing and its files survive.
    // `lex` = compare raw stats strings; false = cast both sides to `dt`.
    def bound(dt: org.apache.spark.sql.types.DataType,
        l: ce.Literal): Option[(Any, Boolean)] = dt match {
      case _: NumericType => literalValue(l).collect {
        case n: java.lang.Number => (n, false)
        case d: scala.math.BigDecimal => (d, false)
      }
      case StringType => literalValue(l).collect { case s: String => (s, true) }
      case TimestampType | DateType =>
        temporalBound(spark, statsZone, dt, l).map((_, true))
      case _ => None
    }
    val usable: Seq[(String, org.apache.spark.sql.types.DataType,
        Option[(Any, Boolean)], Option[(Any, Boolean)])] =
      raw.flatMap { case (c, lo, hi) =>
        leafTypeOf(c).flatMap { dt =>
          val loB = lo.map(bound(dt, _))
          val hiB = hi.map(bound(dt, _))
          // Some(None) = a literal that did NOT convert soundly: drop the
          // whole conjunct rather than half of an equality
          if (loB.contains(None) || hiB.contains(None)) None
          else if (loB.isEmpty && hiB.isEmpty) None
          else Some((c, dt, loB.flatten, hiB.flatten))
        }
      }
    if (usable.isEmpty && nullConjuncts.isEmpty) return None
    var cf = spark.read.parquet(ckptDataDir(v).toString)
      .filter(col("kind") === "data")
    usable.foreach { case (c, dt, lo, hi) =>
      val st = element_at(col("stats"), lit(c))
      def side(raw: org.apache.spark.sql.Column, lex: Boolean) =
        if (lex) raw else raw.cast(dt)
      def boundLit(x: Any, lex: Boolean) =
        if (lex) lit(x) else lit(x).cast(dt)
      val loOk = lo.map { case (x, lex) =>
        coalesce(side(element_at(st, 2), lex) >= boundLit(x, lex), lit(true))
      }.getOrElse(lit(true))
      val hiOk = hi.map { case (x, lex) =>
        coalesce(side(element_at(st, 1), lex) <= boundLit(x, lex), lit(true))
      }.getOrElse(lit(true))
      cf = cf.filter(st.isNull || (loOk && hiOk))
    }
    nullConjuncts.foreach { case (c, wantNull) =>
      val nc = element_at(element_at(col("stats"),
        lit(s"${VersionedTable.NullCountPrefix}$c")), 1).cast("long")
      val rows = element_at(element_at(col("stats"),
        lit(VersionedTable.RowCountStat)), 1).cast("long")
      val ok =
        if (wantNull) nc > 0L // IS NULL: a zero-null file cannot match
        else nc < rows        // IS NOT NULL: an all-null file cannot match
      cf = cf.filter(coalesce(ok, lit(true))) // no stat → survive
    }
    Some(cf.select("path").as[String].collect().toSeq)
  }

  /** Bloom pass for an arbitrary rewrite predicate: equality and IN
    * conjuncts on Bloom-indexed, non-temporal columns probe the per-file
    * sidecars (typed hash of each literal), dropping candidate files that
    * provably hold none of the probed values — the point-lookup prune the
    * stats range pass cannot make on a high-cardinality uniform key.
    * Anything unparseable or un-probeable passes through unchanged. */
  private[table] def bloomPruneForPredicate(spark: SparkSession, v: Long,
      candidates: Seq[String], condition: String): Seq[String] = {
    import org.apache.spark.sql.catalyst.{expressions => ce}
    if (candidates.isEmpty || bloomIndexColumns.isEmpty) return candidates
    val schema = schemaOf(v).getOrElse(return candidates)
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(condition)
      catch { case _: Exception => return candidates }
    val probes: Seq[(String, Seq[Any])] = conjunctsOf(parsed).flatMap {
      case ce.EqualTo(a, l: ce.Literal) =>
        for (c <- bareAttr(a); x <- literalValue(l)) yield (c, Seq(x))
      case ce.EqualTo(l: ce.Literal, a) =>
        for (c <- bareAttr(a); x <- literalValue(l)) yield (c, Seq(x))
      case ce.In(a, ls) if ls.nonEmpty && ls.forall(_.isInstanceOf[ce.Literal]) =>
        val vals = ls.map(l => literalValue(l.asInstanceOf[ce.Literal]))
        for (c <- bareAttr(a); if vals.forall(_.isDefined)) yield (c, vals.flatten)
      case _ => Nil
    }
    probes.foldLeft(candidates) {
      case (cand, (c, vals)) if bloomIndexColumns.contains(c) =>
        // same category rule as the stats pass: hashing the canonical
        // rendering CAST('20' AS STRING) of a numeric literal would miss
        // numerically-equal string values like '20.0', so cross-category
        // probes are skipped and those candidates survive
        schema.fields.find(f => f.name == c &&
            vals.forall(literalMatchesType(f.dataType, _))).fold(cand) { f =>
          import org.apache.spark.sql.functions.expr
          val lits = vals.map(x =>
            "'" + x.toString.replace("\\", "\\\\").replace("'", "\\'") + "'").mkString(", ")
          bloomPruneCandidates(spark, cand, c,
            spark.range(1).select(expr(s"explode(array($lits))").as("__s"))
              .select(expr(s"xxhash64(CAST(__s AS ${f.dataType.sql}))").as("__h")))
        }
      case (cand, _) => cand
    }
  }

  /** Partition-metadata classification for whole-file DELETE: when the
    * predicate references ONLY partition columns (and is deterministic
    * after analysis), every metadata-evaluable file is decidable without
    * reading it — its rows all share the partition tuple, so the file
    * either fully matches (drop it whole) or is untouched. Returns
    * Some((fullMatches, unevaluable)) in that case — `unevaluable` being
    * pre-evolution files whose metadata lacks a referenced column, which
    * must fall back to the scan path — or None when the predicate involves
    * data columns at all. */
  /** DELETE refuses nondeterministic predicates outright (Delta's rule):
    * both delete verbs evaluate the condition in SEPARATE jobs —
    * tier-2 classification, CDF capture, and the keep-rewrite — and a
    * `rand() < 0.1` that disagrees between them can whole-drop a file a
    * re-evaluation would have kept rows of. Only the ANALYZED condition
    * can prove determinism (an unresolved function's flag is unknown);
    * the probe resolves against the version's schema without reading data.
    * Tables with no recorded schema (never-committed) pass — there is
    * nothing to delete anyway. */
  private def requireDeterministicPredicate(spark: SparkSession, v: Long,
      condition: String, op: String): Unit =
    schemaOf(v).foreach { st =>
      import org.apache.spark.sql.functions.expr
      val analyzed = spark.createDataFrame(
          spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], st)
        .filter(expr(condition))
        .queryExecution.analyzed
      val det = analyzed.collectFirst {
        case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
          f.condition.deterministic
      }.getOrElse(true)
      require(det, s"$op on $root refused: predicate `$condition` is " +
        "nondeterministic — it would be re-evaluated per job " +
        "(classification, change capture, rewrite) with no guarantee the " +
        "evaluations agree")
    }

  private[table] def partitionWholeFileDrops(spark: SparkSession, v: Long,
      condition: String): Option[(Seq[String], Seq[String])] = {
    import org.apache.spark.sql.functions.{element_at, expr, lit}
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val pb = partitionByOf(v)
    if (pb.isEmpty) return None
    val parsed =
      try spark.sessionState.sqlParser.parseExpression(condition)
      catch { case _: Exception => return None }
    val refs = parsed.references.map(_.name).toSet
    if (refs.isEmpty || !refs.subsetOf(pb.toSet)) return None
    val schema = schemaOf(v).getOrElse(return None)
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    // checkpointed head: plan the classification as a DISTRIBUTED scan of
    // the checkpoint parquet's (path, partitions) rows — the same
    // discipline as [[filesOverlappingSourceKeys]] — instead of the driver
    // materializing a row per live file (at 1 M files that was the last
    // O(files)-on-driver planning step in a rewrite verb). The checkpoint
    // records only non-null partition values, so a hive-null partition
    // value reads as "unrecorded" here and the file conservatively falls
    // to the row-level scan pool — more I/O for that file, never a wrong
    // whole-drop.
    val planned: Option[(DataFrame, org.apache.spark.sql.Column)] =
      if (checkpointVersions().lastOption.contains(v)) {
        val typed = spark.read.parquet(ckptDataDir(v).toString)
          .filter(col("kind") === "data")
          .select(col("path").as("__pfile") +:
            refs.toSeq.sorted.map(c => element_at(col("partitions"), lit(c))
              .isNotNull).reduce(_ && _).as("__eval") +:
            pb.map(c =>
              element_at(col("partitions"), lit(c)).cast(typeOf(c)).as(c)): _*)
        Some((typed, col("__eval")))
      } else None
    val (frame, evalCol) = planned.getOrElse {
      // manifest fallback (uncheckpointed heads): driver rows, as before
      val vals = partitionValuesOf(v)
      val rows = filesOf(v).map { f =>
        val m = vals.getOrElse(f, Map.empty)
        org.apache.spark.sql.Row.fromSeq(f +:
          java.lang.Boolean.valueOf(refs.forall(m.contains)) +:
          pb.map(c => m.getOrElse(c, None).orNull))
      }
      val df = spark.createDataFrame(rows.asJava,
          StructType(StructField("__pfile", StringType) +:
            StructField("__eval", org.apache.spark.sql.types.BooleanType) +:
            pb.map(c => StructField(c, StringType))))
        .select(col("__pfile") +: col("__eval") +:
          pb.map(c => col(c).cast(typeOf(c)).as(c)): _*)
      (df, col("__eval"))
    }
    val filtered = frame.filter(evalCol).filter(expr(condition))
    // a nondeterministic predicate (rand() < 0.5) evaluates per ROW, not
    // per file — only the analyzed condition can prove determinism
    val det = filtered.queryExecution.analyzed.collectFirst {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter =>
        f.condition.deterministic
    }.getOrElse(false)
    if (!det) return None
    Some((filtered.select("__pfile").collect().map(_.getString(0)).toSeq,
      frame.filter(!evalCol).select("__pfile")
        .collect().map(_.getString(0)).toSeq))
  }

  /** Copy-on-write DELETE: rewrite ONLY the files where matching AND
    * non-matching rows coexist; untouched files carry over into the new
    * manifest unchanged, stats included, and FULLY-matching files are
    * dropped whole — no scan, no rewrite. Two proof tiers:
    *  - a predicate over partition columns alone decides every
    *    metadata-evaluable file without data I/O (all rows share the
    *    tuple), so the retention delete (`WHERE day < cutoff` on a
    *    day-partitioned 100 TB table) is METADATA-ONLY — unless CDF is on,
    *    which must read the dropped rows to capture them;
    *  - any other predicate classifies per file from one candidate scan's
    *    matched/kept counts — a file whose every live row matches drops
    *    without the keep-rewrite it would otherwise pay.
    * Deleting one key from a 100 TB table rewrites kilobytes, not the
    * table; deleting a whole partition rewrites nothing. Returns
    * (newVersion, removedFileCount). */
  def delete(spark: SparkSession, condition: String): (Long, Int) = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    requireNotAppendOnly("DELETE")
    val v = resolve()
    requireDeterministicPredicate(spark, v, condition, "DELETE")
    val all = filesOf(v)
    val schema = schemaOf(v)
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    val pred = expr(condition)
    if (all.isEmpty) return (v, 0) // nothing to delete from an empty snapshot
    val allSet = all.toSet
    // tier 1: partition-metadata proof — a partition-column predicate
    // decides every metadata-evaluable file without data I/O; only
    // legacy-epoch files lacking a referenced value fall to the scan
    val (proven, scanPool) = partitionWholeFileDrops(spark, v, condition) match {
      case Some((full, unevaluable)) => (full.filter(allSet.contains), unevaluable)
      case None =>
        // checkpointed head: the touched scan reads only stat-surviving
        // candidates (planned distributed from the checkpoint parquet),
        // not the whole snapshot
        (Seq.empty[String], bloomPruneForPredicate(spark, v,
          checkpointPlanCandidates(spark, v, condition).getOrElse(all), condition))
    }
    // tier 2: ONE aggregation over the candidates classifies each file.
    // DV-applied scan: a row already merge-on-read-deleted cannot make its
    // file "touched" (and could otherwise resurrect through the rewrite).
    // SQL three-valued logic throughout: a NULL-evaluating row did NOT
    // match and must be KEPT (it counts as kept, not matched).
    val perFile: Array[(String, Long, Long)] =
      if (scanPool.isEmpty) Array.empty
      else scanLive(spark, scanPool, schema, dvs, keepPos = true, pb, pVals)
        .groupBy(col("__rel"))
        .agg(
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(coalesce(pred, lit(false)), 1L)
              .otherwise(0L)).as("__m"),
          org.apache.spark.sql.functions.sum(
            org.apache.spark.sql.functions.when(not(coalesce(pred, lit(false))), 1L)
              .otherwise(0L)).as("__k"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
        .filter(t => allSet.contains(t._1))
    // a file whose every live row matches drops WHOLE — no keep-rewrite
    val scanDrops = perFile.collect { case (f, m, k) if m > 0 && k == 0 => f }.toSeq
    val rewrites = perFile.collect { case (f, m, k) if m > 0 && k > 0 => f }.toSeq
    val touched = proven ++ scanDrops ++ rewrites
    if (touched.isEmpty) return (v, 0) // nothing matched: no new version needed
    val untouched = all.filterNot(touched.toSet)
    // write-time CDF (iff enabled): the deleted rows, captured from the
    // touched slice only (old slice = keep ⊎ deleted, so this equals the
    // snapshot bag-diff the legacy changes() path computes — without ever
    // re-scanning the table). This is the one path that must READ
    // whole-dropped files.
    val cdfFiles =
      if (!cdfEnabled) Nil
      else writeCdfFiles(
        scanLive(spark, touched, schema, dvs, keepPos = false, pb, pVals)
          .filter(coalesce(pred, lit(false)))
          .withColumn("_change_type", lit("delete")))
    val (commitId, newFiles, newPartVals, stamped) =
      if (rewrites.isEmpty)
        ("", Seq.empty[String],
          Map.empty[String, Map[String, Option[String]]],
          Option.empty[Map[String, Long]])
      else writeDataFiles(
        scanLive(spark, rewrites, schema, dvs, keepPos = false, pb, pVals)
          .filter(not(coalesce(pred, lit(false)))),
        None, Nil, pb)
    val stats = if (newFiles.nonEmpty) {
      val partTypes = schema.getOrElse(throw new IllegalStateException(
        s"version $v of $root has no recorded schema"))
        .fields.map(f => f.name -> f.dataType).toMap
      collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
    } else Map.empty[String, Map[String, (String, String, String)]]
    // snapshot-pinned with append rebase: pure-append interlopers whose
    // fresh files hold NO predicate-matching rows fold in (serial
    // equivalence is exact — the delete would not have touched them); any
    // other collision raises and the caller re-runs the delete.
    // Constraints carry through unvalidated: a delete keeps a subset of rows
    // that already passed the table's gate.
    (publishRewrite(v, touched.toSet, newFiles, stats,
      schema.map(_.json).getOrElse(throw new IllegalStateException(
        s"version $v of $root has no recorded schema")),
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = None,
      freshSafe = (h, fresh) => fresh.isEmpty ||
        scanLive(spark, fresh, schema, Nil, keepPos = false, pb, partitionValuesOf(h))
          .filter(coalesce(pred, lit(false))).isEmpty,
      stampedIds = stamped, operation = Some("DELETE")),
      touched.size)
  }

  /** `prior` plus `source`-only columns (forced nullable), matched
    * case-insensitively by name — the widened schema a `schemaEvolution`
    * merge commits. Existing columns keep their recorded type: the merge
    * kernel's type pinning casts source values to them, never the reverse. */
  private def widenWith(prior: org.apache.spark.sql.types.StructType,
      source: DataFrame): org.apache.spark.sql.types.StructType = {
    val existing = prior.fieldNames.map(_.toLowerCase).toSet
    val added = source.schema.fields
      .filterNot(f => existing.contains(f.name.toLowerCase))
      .map(f => org.apache.spark.sql.types.StructField(f.name, f.dataType, nullable = true))
    org.apache.spark.sql.types.StructType(prior.fields ++ added)
  }

  /** Metadata-only ADDITIVE schema evolution: publish a new version with
    * the SAME files and `added` columns appended (forced nullable) to the
    * recorded schema. Old files resolve the new columns to null at read —
    * the schema'd-scan semantics every reader already has — so the commit
    * costs one manifest write, zero data I/O, at any table size. This is
    * the primitive behind ALTER TABLE ADD COLUMNS through the catalog and
    * the alterTable hook `MERGE WITH SCHEMA EVOLUTION` drives. */
  def evolveSchema(added: Seq[org.apache.spark.sql.types.StructField]): Long = {
    require(added.nonEmpty, "no columns to add")
    val v = resolve()
    val prior = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val lower = prior.fieldNames.map(_.toLowerCase).toSet
    added.foreach(f => require(!lower.contains(f.name.toLowerCase),
      s"column ${f.name} already exists in $root — only additive evolution is supported"))
    val widened = org.apache.spark.sql.types.StructType(
      prior.fields ++ added.map(_.copy(nullable = true)))
    publish(filesOf(v), widened.json, statsOf(v), None, Some(v),
      constraintsOf(v), dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      operation = Some("ADD COLUMNS"))
  }

  /** Predicate-scoped overwrite (Delta's `replaceWhere` / DataFrameWriterV2
    * `.overwrite(condition)`): ONE atomic commit that deletes every row
    * matching `condition` and lands `data` in its place. Files with no
    * matching row — proven by the same predicate-pushed scan COW [[delete]]
    * uses, so partition values and parquet stats prune most of them before
    * any row is read — carry over untouched, stats included: overwriting one
    * partition's slice of a 100 TB table rewrites that partition's files,
    * nothing else.
    *
    * Delta's replaceWhere constraint is enforced: every inserted row must
    * itself satisfy `condition` (the verb means "replace that slice"; a row
    * outside the slice would silently leak into territory the predicate
    * promised not to touch). 3VL as in [[delete]]: rows where the predicate
    * is NULL are kept. Returns (newVersion, rewrittenFileCount). */
  def replaceWhere(data: DataFrame, condition: String,
      numPartitions: Option[Int] = None, sortBy: Seq[String] = Nil): (Long, Int) = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, not}
    requireNotAppendOnly("replaceWhere")
    val spark = data.sparkSession
    val v = resolve()
    val all = filesOf(v)
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema — replaceWhere needs one"))
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    val pred = expr(condition)
    // type-pin the incoming batch to the table schema by name, as every
    // write funnel does (a widened column would poison the manifest-schema'd
    // read of the mixed keep∪data files)
    val pinned = data.select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    require(pinned.filter(not(coalesce(pred, lit(false)))).isEmpty,
      s"replaceWhere($condition): the incoming batch contains rows that do NOT " +
        "match the predicate — they would leak outside the replaced slice")
    val allSet = all.toSet
    val cand =
      if (all.isEmpty) Seq.empty[String]
      else bloomPruneForPredicate(spark, v,
        checkpointPlanCandidates(spark, v, condition).getOrElse(all), condition)
    val touched =
      if (cand.isEmpty) Seq.empty[String]
      else scanLive(spark, cand, Some(schema), dvs, keepPos = true, pb, pVals)
        .filter(pred)
        .select(col("__rel")).distinct()
        .collect().map(_.getString(0))
        .filter(allSet.contains).toSeq
    val untouched = all.filterNot(touched.toSet)
    val keep =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
        .filter(not(coalesce(pred, lit(false))))
    val merged = keep.unionByName(pinned)
    val cdfFiles =
      if (!cdfEnabled) Nil
      else {
        val deleted =
          if (touched.isEmpty) spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
            .filter(coalesce(pred, lit(false)))
        writeCdfFiles(deleted.withColumn("_change_type", lit("delete"))
          .unionByName(pinned.withColumn("_change_type", lit("insert"))))
      }
    val (commitId, newFiles, newPartVals, stamped) = writeDataFiles(merged, numPartitions, sortBy, pb)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats = if (newFiles.nonEmpty)
                  collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
                else Map.empty[String, Map[String, (String, String, String)]]
    // only the incoming batch needs the constraint gate: kept rows already
    // passed their own write-time check
    validateFrame(pinned, constraintsOf(v) ++ notNullChecks(Some(schema)))
    // append rebase exactly as delete: a concurrent pure append whose fresh
    // files hold no predicate-matching rows folds in (serial equivalence —
    // the replace would not have touched them); anything else raises
    (publishRewrite(v, touched.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = None,
      freshSafe = (h, fresh) => fresh.isEmpty ||
        scanLive(spark, fresh, Some(schema), Nil, keepPos = false, pb, partitionValuesOf(h))
          .filter(coalesce(pred, lit(false))).isEmpty,
      stampedIds = stamped, operation = Some("REPLACE WHERE")),
      touched.size)
  }

  /** Dynamic partition overwrite (Delta's `partitionOverwriteMode=dynamic`,
    * Hive's INSERT OVERWRITE semantics): replace EXACTLY the partitions
    * present in the incoming batch — untouched partitions carry forward
    * file-identical, partitions new to the table appear. Unlike
    * [[replaceWhere]] nothing is scanned to find the replaced set: it is
    * the batch's own partition values resolved against the manifest's
    * partition index (pure metadata), so re-running one day of a
    * partitioned pipeline on a 100 TB table costs the batch write plus
    * O(files in the replaced partitions) manifest work. Returns
    * (version, replaced file count). Concurrency: an interloper landing
    * only OUTSIDE the replaced partitions folds in; anything touching them
    * raises (append-then-overwrite and overwrite-then-append diverge
    * there, so no silent fold is sound). */
  def overwritePartitions(data: DataFrame, numPartitions: Option[Int] = None,
      sortBy: Seq[String] = Nil): (Long, Int) = {
    import org.apache.spark.sql.functions.lit
    requireNotAppendOnly("dynamic partition overwrite")
    val spark = data.sparkSession
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema — overwritePartitions needs one"))
    val pb = partitionByOf(v)
    require(pb.nonEmpty, "dynamic partition overwrite needs a partitioned " +
      "table; overwrite an unpartitioned table with commit()")
    // partition-DIRECTED verb: "the batch's partitions" is ill-defined for
    // files of a pre-evolution layout epoch (their rows may belong to the
    // replaced partitions without any metadata saying so) — refuse rather
    // than silently leak stale rows
    require(!mixedLayoutOf(v),
      s"$root mixes partition layouts after an ALTER ... SET PARTITIONED BY; " +
        "run OPTIMIZE to rewrite into the current layout before a dynamic " +
        "partition overwrite")
    val dvs = dvsOf(v)
    val pVals = partitionValuesOf(v)
    // type-pin the batch to the table schema by name (every write funnel's
    // rule) — also refuses a batch missing a table column; generated
    // columns recompute first, so the batch may omit them
    val pinned = applyGenerated(data, schema).select(schema.fields.map(f =>
      col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val (commitId, newFiles, newPartVals, stamped) =
      writeDataFiles(pinned, numPartitions, sortBy, pb)
    val replaced: Set[Map[String, Option[String]]] =
      newFiles.flatMap(newPartVals.get).toSet
    val all = filesOf(v)
    val touched = all.filter(f => pVals.get(f).exists(replaced.contains))
    val untouched = all.filterNot(touched.toSet)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats = if (newFiles.nonEmpty)
                  collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
                else Map.empty[String, Map[String, (String, String, String)]]
    val cdfFiles =
      if (!cdfEnabled) Nil
      else {
        val deleted =
          if (touched.isEmpty) spark.createDataFrame(
            spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
          else scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
        writeCdfFiles(deleted.withColumn("_change_type", lit("delete"))
          .unionByName(pinned.withColumn("_change_type", lit("insert"))))
      }
    validateFrame(pinned, constraintsOf(v) ++ notNullChecks(Some(schema)))
    (publishRewrite(v, touched.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = None,
      freshSafe = (h, fresh) => {
        val hVals = partitionValuesOf(h)
        fresh.forall(f => hVals.get(f).exists(p => !replaced.contains(p)))
      },
      stampedIds = stamped, operation = Some("OVERWRITE PARTITIONS")),
      touched.size)
  }

  /** Deletion vectors carried into a rewrite's new version: tombstones of
    * files that survive unchanged, consolidated into one fresh DV file;
    * tombstones of rewritten files drop (their live rows were re-written
    * without the dead ones). */
  private def carryDvs(spark: SparkSession, dvs: Seq[String],
      untouched: Seq[String]): Seq[String] = {
    import org.apache.spark.sql.functions.broadcast
    if (dvs.isEmpty || untouched.isEmpty) return Nil
    import spark.implicits._
    val untouchedDf = untouched.toDF("file")
    val kept = dvFrame(spark, dvs)
      .join(broadcast(untouchedDf), Seq("file"), "left_semi")
    if (kept.isEmpty) Nil else writeDvFiles(kept)
  }

  /** MERGE-ON-READ delete: mark matching rows dead in a deletion-vector
    * sidecar instead of rewriting their files — the write is O(matched row
    * positions), not O(touched files); deleting a handful of rows from a
    * 100 TB table writes kilobytes where copy-on-write [[delete]] would
    * rewrite every touched file. Reads apply the tombstones with a broadcast
    * anti join on the scan's `_metadata` row positions (shuffle-free); the
    * read-side tax is repaid when [[compact]] or any COW rewrite of the file
    * materializes the deletes and clears its tombstones. 3VL as in
    * [[delete]]: a NULL condition keeps the row. Snapshot-pinned publish
    * like every rewrite. Returns (newVersion, rowsDeleted). */
  def deleteMor(spark: SparkSession, condition: String): (Long, Long) = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, sum, when}
    requireNotAppendOnly("DELETE (merge-on-read)")
    val v = resolve()
    requireDeterministicPredicate(spark, v, condition, "DELETE (merge-on-read)")
    val all = filesOf(v)
    if (all.isEmpty) return (v, 0L)
    val allSet = all.toSet
    val schema = schemaOf(v)
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    val pred = expr(condition)
    // FULLY-matching files drop WHOLE here too — the MOR retention delete
    // would otherwise write a tombstone PER ROW of each such file, O(rows)
    // where removing the manifest entry is O(1). Same two proof tiers as
    // [[delete]]: partition-metadata (zero data I/O), then per-file
    // matched/kept classification from one candidate-scan aggregation.
    val (proven, scanPool) = partitionWholeFileDrops(spark, v, condition) match {
      case Some((full, unevaluable)) => (full.filter(allSet.contains), unevaluable)
      case None =>
        (Seq.empty[String], bloomPruneForPredicate(spark, v,
          checkpointPlanCandidates(spark, v, condition).getOrElse(all), condition))
    }
    if (proven.isEmpty && scanPool.isEmpty) return (v, 0L)
    // per-file LIVE row counts from metadata alone: write-time __rows minus
    // the file's existing DV rows (exact — a DV only removes live rows).
    // None for stats-less files, which then conservatively never whole-drop.
    val dvPerFile: Map[String, Long] =
      if (dvs.isEmpty) Map.empty
      else dvFrame(spark, dvs).groupBy("file").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val statsV = statsOf(v)
    def liveOf(f: String): Option[Long] =
      statsV.get(f).flatMap(_.get(VersionedTable.RowCountStat))
        .flatMap(s => scala.util.Try(s._1.toLong).toOption)
        .map(_ - dvPerFile.getOrElse(f, 0L))
    // ONE scan over the candidates, with existing DVs applied (an
    // already-dead row must not be tombstoned twice): the matched positions
    // become the tombstones, exactly as before — whole-file detection rides
    // the tiny DV read-back (matched count == metadata live count), so the
    // common partial-delete pays NO extra pass for the drop optimization
    val (allDv, matchedPerFile) =
      if (scanPool.isEmpty) (Seq.empty[String], Map.empty[String, Long])
      else {
        val files = writeDvFiles(
          scanLive(spark, scanPool, schema, dvs, keepPos = true, pb, pVals)
            .filter(coalesce(pred, lit(false)))
            .select(col("__rel").as("file"), col("__ri").as("row_index")))
        val counts =
          if (files.isEmpty) Map.empty[String, Long]
          else spark.read.parquet(
              files.map(f => Paths.get(root).resolve(f).toString): _*)
            .groupBy("file").count()
            .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
            .filter { case (f, _) => allSet.contains(f) }
        (files, counts)
      }
    val scanDrops = matchedPerFile.collect {
      case (f, m) if liveOf(f).contains(m) => f }.toSeq
    val partialCovered = matchedPerFile.keySet -- scanDrops
    val drops = proven ++ scanDrops
    if (drops.isEmpty && matchedPerFile.isEmpty)
      return (v, 0L) // no match anywhere: the empty DV dir falls to vacuum
    // tombstones for whole-dropped files are dead weight in the manifest —
    // re-lay the fresh DV without them (positions only, change-sized)
    val newDv =
      if (scanDrops.isEmpty || allDv.isEmpty) allDv
      else {
        val rd = spark.read.parquet(
          allDv.map(f => Paths.get(root).resolve(f).toString): _*)
        val kept = rd.filter(org.apache.spark.sql.functions.not(
          col("file").isin(scanDrops: _*)))
        if (kept.isEmpty) Nil else writeDvFiles(kept)
      }
    val nPartial = matchedPerFile.collect {
      case (f, m) if partialCovered.contains(f) => m }.sum
    val nScanDrops = matchedPerFile.collect {
      case (f, m) if scanDrops.contains(f) => m }.sum
    val dvCovered = partialCovered
    // deleted-row count for tier-1 files: metadata live counts, one count
    // scan only for stats-less files
    val nProven: Long =
      if (proven.isEmpty) 0L
      else {
        val counted = proven.map(f => f -> liveOf(f))
        val statless = counted.collect { case (f, None) => f }
        counted.flatMap(_._2).sum + (if (statless.isEmpty) 0L
          else scanLive(spark, statless, schema, dvs, keepPos = false, pb, pVals)
            .count())
      }
    val partial = partialCovered.toSeq
    // write-time CDF (iff enabled): the deleted rows in full — the one
    // path that must READ whole-dropped files (the DV stores positions,
    // the manifest drop stores nothing)
    val cdfFiles =
      if (!cdfEnabled) Nil
      else writeCdfFiles(
        scanLive(spark, drops ++ partial, schema, dvs, keepPos = false, pb, pVals)
          .filter(coalesce(pred, lit(false)))
          .withColumn("_change_type", lit("delete")))
    val schemaJson = schema.map(_.json).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    // surviving data files and their stats carry verbatim (stats stay
    // sound: a DV only narrows the live rows, min/max remain valid bounds);
    // append rebase as in delete — fresh files with no matching rows fold in
    // DV sidecars re-lay only when a drop actually retires some of their
    // rows — otherwise they carry verbatim (zero DV churn on the common
    // path where the dropped partition had no tombstones)
    val dvsCarried = {
      val needPrune = drops.nonEmpty && dvs.nonEmpty && {
        import spark.implicits._
        import org.apache.spark.sql.functions.broadcast
        !dvFrame(spark, dvs)
          .join(broadcast(drops.toDF("file")), Seq("file"), "left_semi")
          .isEmpty
      }
      (if (needPrune) carryDvs(spark, dvs, all.filterNot(drops.toSet))
       else dvs) ++ newDv
    }
    (publishRewrite(v, drops.toSet, Nil, Map.empty, schemaJson,
      dvsCarried = dvsCarried,
      newPartVals = Map.empty,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = None,
      freshSafe = (h, fresh) => fresh.isEmpty ||
        scanLive(spark, fresh, schema, Nil, keepPos = false,
          pb, partitionValuesOf(h))
          .filter(coalesce(pred, lit(false))).isEmpty,
      dvGuard = dvCovered, operation = Some("DELETE")), nPartial + nScanDrops + nProven)
  }

  /** Copy-on-write UPDATE: `SET col = expr` on rows matching `condition`,
    * rewriting only the files that contain a match (same touched-file scan
    * as [[delete]]; 3VL: a NULL condition means the row is untouched). Set
    * expressions are pinned to each column's recorded type, as in
    * [[mergeCow]]. Returns (newVersion, rewrittenFileCount). */
  def update(spark: SparkSession, condition: String,
             set: Map[String, String]): (Long, Int) = {
    import org.apache.spark.sql.functions.{coalesce, expr, lit, when}
    requireNotAppendOnly("UPDATE")
    require(set.nonEmpty,
      "update with an empty SET would rewrite files unchanged — likely a misspelled config key")
    val v = resolve()
    // same hazard class as DELETE: the condition is evaluated once to
    // classify touched files and again in the rewrite — a nondeterministic
    // predicate could disagree between the two
    requireDeterministicPredicate(spark, v, condition, "UPDATE")
    val all = filesOf(v)
    val schema = schemaOf(v).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    set.keys.foreach(c => require(schema.fieldNames.contains(c),
      s"update SET references unknown column $c"))
    requireNoGeneratedDesync(spark, schema, set.keys.toSeq, "UPDATE SET")
    requireNoIdentityWrite(v, set.keys.toSeq, "UPDATE SET")
    val pred = expr(condition)
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    if (all.isEmpty) return (v, 0)
    val allSet = all.toSet
    val cand = bloomPruneForPredicate(spark, v,
      checkpointPlanCandidates(spark, v, condition).getOrElse(all), condition)
    val touched =
      if (cand.isEmpty) Seq.empty[String]
      else scanLive(spark, cand, Some(schema), dvs, keepPos = true, pb, pVals)
        .filter(pred)
        .select(col("__rel")).distinct()
        .collect().map(_.getString(0))
        .filter(allSet.contains).toSeq
    if (touched.isEmpty) return (v, 0)
    val untouched = all.filterNot(touched.toSet)
    val applies = coalesce(pred, lit(false))
    val rewritten = scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
      .select(schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) => when(applies, expr(e).cast(f.dataType))
            .otherwise(col(f.name)).cast(f.dataType).as(f.name)
          case None => col(f.name)
        }
      }.toSeq: _*)
    val (commitId, newFiles, newPartVals, stamped) = writeDataFiles(rewritten, None, Nil, pb)
    // write-time CDF (iff enabled): per-row preimage+postimage pairs from
    // ONE more predicate-pushed scan of the matching rows (no bag-diff
    // shuffles — the exceptAll formulation hashed the whole touched slice
    // twice). Identity SETs (post <=> pre) drop, matching the snapshot-diff
    // view.
    val cdfFiles = if (!cdfEnabled) Nil else {
      import org.apache.spark.sql.functions.{array, explode, struct}
      val matchedOld = scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
        .filter(applies)
      val preS = struct(schema.fields.map(f => col(f.name).as(f.name)).toSeq: _*)
      val postS = struct(schema.fields.map { f =>
        set.get(f.name) match {
          case Some(e) => expr(e).cast(f.dataType).as(f.name)
          case None => col(f.name).as(f.name)
        }
      }.toSeq: _*)
      val pairs = matchedOld
        .withColumn("__pre_s", preS).withColumn("__post_s", postS)
        .filter(!(col("__pre_s") <=> col("__post_s")))
        .select(explode(array(
          struct(col("__pre_s").as("row"), lit("delete").as("_change_type")),
          struct(col("__post_s").as("row"), lit("insert").as("_change_type")))).as("c"))
        .select(col("c.row.*"), col("c._change_type"))
      writeCdfFiles(pairs)
    }
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats = if (newFiles.nonEmpty)
                  collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
                else Map.empty[String, Map[String, (String, String, String)]]
    val cs = constraintsOf(v) ++ notNullChecks(Some(schema))
    // SET expressions can push a row out of bounds: gate the rewritten files
    if (pb.isEmpty) validateWritten(spark, newFiles, Some(schema), cs)
    else validateFrame(rewritten, cs)
    // append rebase as in delete: fresh files with no predicate-matching
    // rows fold in (a serial update would have left them untouched)
    (publishRewrite(v, touched.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = None,
      freshSafe = (h, fresh) => fresh.isEmpty ||
        scanLive(spark, fresh, Some(schema), Nil, keepPos = false, pb, partitionValuesOf(h))
          .filter(coalesce(pred, lit(false))).isEmpty,
      stampedIds = stamped, operation = Some("UPDATE")),
      touched.size)
  }

  /** Copy-on-write MERGE: run the join-based kernel ONLY over the target
    * files whose recorded [min, max] range for `targetKey` contains at least
    * one source merge key; every other file carries into the new manifest
    * unchanged, stats included. Touched files are found distributively — the
    * source's distinct keys join a broadcast table of per-file ranges — so
    * the cost is one pass over the source batch plus the kernel over the
    * touched slice: merging a narrow CDC batch into a 100 TB table rewrites
    * the overlapping files, not the table (Delta's file-pruned merge shape).
    *
    * Correctness requirements (validated where possible):
    *  - `condition` must imply `source.<sourceKey> = target.<targetKey>`
    *    (the equi-key the pruning reasons about) — rows in a file whose
    *    range excludes every source key can then never match;
    *  - a NOT MATCHED BY SOURCE clause (Delta's "make target equal source"
    *    face) can modify ANY target row, so its presence disables key
    *    pruning — every file is treated as touched — and disables append
    *    rebase (a concurrently appended row is by definition not matched by
    *    source, so serial execution would have acted on it);
    *  - files lacking stats for `targetKey` are always treated as touched.
    *
    * Returns (newVersion, rewrittenFileCount). */
  def mergeCow(spark: SparkSession, source: DataFrame, condition: String,
      targetKey: String, sourceKey: String,
      whenMatchedUpdate: Option[Merge.MatchedUpdate] = None,
      whenMatchedDelete: Option[Merge.MatchedDelete] = None,
      whenNotMatchedInsert: Option[Merge.NotMatchedInsert] = None,
      whenNotMatchedBySourceUpdate: Option[Merge.NotMatchedBySourceUpdate] = None,
      whenNotMatchedBySourceDelete: Option[Merge.NotMatchedBySourceDelete] = None,
      schemaEvolution: Boolean = false,
      numPartitions: Option[Int] = None, sortBy: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): (Long, Int) = {
    import org.apache.spark.sql.functions.{array, broadcast, explode, expr, lit, struct, when}
    if (whenMatchedUpdate.isDefined || whenMatchedDelete.isDefined ||
        whenNotMatchedBySourceUpdate.isDefined || whenNotMatchedBySourceDelete.isDefined)
      requireNotAppendOnly("MERGE with update/delete clauses")
    val v = resolve()
    val all = filesOf(v)
    val schema0 = schemaOf(v).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    // opt-in additive evolution (Delta's autoMerge): source-only columns
    // append to the schema (nullable); the widened schema'd scan back-fills
    // them with null on every existing file, touched or carried
    val schema = if (!schemaEvolution) schema0 else widenWith(schema0, source)
    val keyType = schema.find(_.name == targetKey).getOrElse(
      throw new IllegalArgumentException(s"target key $targetKey not in table schema")).dataType
    // The file pruning is only sound if `condition` implies
    // source.<sourceKey> = target.<targetKey>; the pair arrives separately
    // (declarative pruneKeys config), so a typo would silently skip matching
    // rows in "untouched" files and insert duplicates. Fail fast unless the
    // condition carries that exact equi-conjunct at its top level.
    require(conditionHasEquiConjunct(condition, sourceKey, targetKey,
        sourceType = source.schema.fields
          .find(_.name.equalsIgnoreCase(sourceKey)).map(_.dataType),
        targetType = Some(keyType)),
      s"mergeCow prune keys ($sourceKey, $targetKey) are not implied by the merge " +
        s"condition '$condition': it must contain a top-level conjunct " +
        s"source.$sourceKey = target.$targetKey, with at most a WIDENING cast " +
        "on either side (file pruning would otherwise be unsound)")
    requireNoGeneratedDesync(spark, schema,
      (whenMatchedUpdate.toSeq.flatMap(_.values.keys) ++
        whenNotMatchedBySourceUpdate.toSeq.flatMap(_.values.keys)).distinct,
      "MERGE SET")
    requireNoIdentityWrite(v,
      (whenMatchedUpdate.toSeq.flatMap(_.values.keys) ++
        whenNotMatchedBySourceUpdate.toSeq.flatMap(_.values.keys)).distinct,
      "MERGE SET")
    val nms = whenNotMatchedBySourceUpdate.isDefined || whenNotMatchedBySourceDelete.isDefined
    val touched =
      if (nms) all // a by-source clause can modify any row: pruning is unsound
      else filesOverlappingSourceKeys(spark, v, source, sourceKey, targetKey, keyType)
    // no file overlaps a source key and no insert clause can add rows:
    // nothing can change — don't burn a version on a no-op
    if (touched.isEmpty && whenNotMatchedInsert.isEmpty) return (v, 0)
    val untouched = all.filterNot(touched.toSet)
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    val slice =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      else scanLive(spark, touched, Some(schema), dvs, keepPos = false, pb, pVals)
    val captureCdf = cdfEnabled
    val marked0 = Merge.merge(slice, source, condition,
      whenMatchedUpdate, whenMatchedDelete, whenNotMatchedInsert,
      whenNotMatchedBySourceUpdate, whenNotMatchedBySourceDelete,
      emitChanges = captureCdf)
    // pin the output columns to the TABLE's types: merge expressions can
    // silently widen (e.g. an int column SET from a long source) and the
    // manifest-schema'd read would then choke on the widened files — Delta
    // likewise casts SET/INSERT values to the target column type. A type
    // differing ONLY in nullability is written as-is: the full-outer merge
    // join relaxes containsNull on untouched array columns, and Cast
    // refuses the (semantically no-op) nullable→non-null direction
    val outTypes = marked0.schema.fields.map(f => f.name -> f.dataType).toMap
    val marked = marked0.select(schema.fields.map(f =>
      if (outTypes.get(f.name).exists(_.catalogString == f.dataType.catalogString)) col(f.name)
      else col(f.name).cast(f.dataType).as(f.name)) ++
      (if (captureCdf) Seq(col("__change_kind"), col("__pre")) else Nil): _*)
    val merged =
      if (!captureCdf) marked
      else marked
        .filter(col("__change_kind").isNull || col("__change_kind") =!= "delete")
        .drop("__change_kind", "__pre")
    val (commitId, newFiles, newPartVals, stamped) = writeDataFiles(merged, numPartitions, sortBy, pb)
    // write-time CDF (iff enabled) from the kernel's OWN change markers —
    // one more execution of the merge join, zero bag-diff shuffles (the
    // exceptAll formulation hashed the whole touched slice twice): updates
    // emit their preimage+postimage pair (identity SETs drop), deletes
    // their preimage, inserts their row — Delta CDF's per-row semantics
    val cdfFiles = if (!captureCdf) Nil else captureMergeCdf(marked, schema)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val newStats = if (newFiles.nonEmpty)
                     collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
                   else Map.empty[String, Map[String, (String, String, String)]]
    val cs = constraintsOf(v) ++ notNullChecks(Some(schema))
    // inserted + updated rows land in the new files: gate exactly those
    if (pb.isEmpty) validateWritten(spark, newFiles, Some(schema), cs)
    else validateFrame(merged, cs)
    // append rebase: fresh files whose targetKey range is disjoint from the
    // source's key range cannot match any merge clause, so serial
    // merge-after-append would have carried them verbatim — fold them in;
    // anything else raises. With a NOT-MATCHED-BY-SOURCE face every fresh
    // row WOULD have been acted on, so only an empty fresh set is safe.
    (publishRewrite(v, touched.toSet, newFiles, newStats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = txn,
      freshSafe = (h, fresh) => fresh.isEmpty || (!nms && {
        val bounds = source.agg(
          org.apache.spark.sql.functions.min(expr(sourceKey).cast(keyType)),
          org.apache.spark.sql.functions.max(expr(sourceKey).cast(keyType))).head()
        bounds.isNullAt(0) || // empty/all-null source: no clause can match
          scanLive(spark, fresh, Some(schema), Nil, keepPos = false, pb, partitionValuesOf(h))
            .filter(col(targetKey).cast(keyType) >= bounds.get(0) &&
              col(targetKey).cast(keyType) <= bounds.get(1)).isEmpty
      }),
      stampedIds = stamped, operation = Some("MERGE")),
      touched.size)
  }

  /** Files of version `v` whose recorded `[min, max]` for `targetKey` can
    * contain at least one source merge key — the shared pruning primitive of
    * [[mergeCow]] and [[mergeMor]]. Files lacking stats for the key are
    * conservatively treated as touched.
    *
    * Two plans, picked by what the log offers:
    *  - **checkpointed head**: the per-file range table is read from the
    *    checkpoint PARQUET ([[checkpointFiles]]) — a distributed scan, so
    *    planning a merge against a million-file table never materializes
    *    the file list on the driver; the (CDC-batch-bounded) distinct
    *    source keys broadcast to the range scan, and only the PRUNED hit
    *    list comes back.
    *  - **no checkpoint at `v`**: the manifest's driver-parsed stats build
    *    a broadcast range table — fine at thousands of files, and the only
    *    option when the head moved past the last checkpoint. */
  private def filesOverlappingSourceKeys(spark: SparkSession, v: Long,
      source: DataFrame, sourceKey: String, targetKey: String,
      keyType: org.apache.spark.sql.types.DataType): Seq[String] = {
    import org.apache.spark.sql.functions.{broadcast, element_at, expr, lit}
    import spark.implicits._
    val keys = source.select(expr(sourceKey).cast(keyType).as("__k"))
      .filter(col("__k").isNotNull).distinct()
    // A file's recorded PARTITION VALUE is an exact min=max bound when the
    // merge key IS a partition column — so stats-off commits (the derived
    // stores' bucket/c_id layouts) still range-prune instead of degrading
    // to "statless ⇒ touched", which rewrote the WHOLE store on every
    // bucket-confined merge (at scale: a full-store rewrite per sync where
    // only the changed buckets should move). Manifest-resident, zero I/O.
    val pvBound: String => Option[String] =
      if (!partitionByOf(v).contains(targetKey)) _ => None
      else {
        val vals = partitionValuesOf(v)
        f => vals.get(f).flatMap(_.get(targetKey)).flatten
      }
    if (checkpointVersions().lastOption.contains(v)) {
      // read the PINNED version's checkpoint directly — going through
      // checkpointFiles() would re-resolve the latest checkpoint, and a
      // concurrent commit+checkpoint between the guard and the read would
      // make the merge plan its touched set from a different version's
      // file list (an appended statless file could then be both rewritten
      // into the merge output and folded back by the rebase)
      val cf = spark.read.parquet(ckptDataDir(v).toString)
        .filter(col("kind") === "data")
        .select(col("path"), element_at(col("stats"), lit(targetKey)).as("__st"))
      val statless0 = cf.filter(col("__st").isNull)
        .select("path").as[String].collect().toSeq
      // checkpoint-statless files whose partition value bounds the key move
      // into the range probe (as a LOCAL frame unioned below); a value that
      // does not survive the cast stays conservatively touched
      val (pvRanged, statless) = statless0.partition(f => pvBound(f).isDefined)
      val pvFrame = pvRanged.map(f => (f, pvBound(f).get, pvBound(f).get))
        .toDF("__file", "__lo", "__hi")
        .select(col("__file"),
          col("__lo").cast(keyType).as("__lo"), col("__hi").cast(keyType).as("__hi"))
      val pvBad = pvFrame.filter(col("__lo").isNull || col("__hi").isNull)
        .select("__file").as[String].collect().toSeq
      val ranges = cf.filter(col("__st").isNotNull)
        .select(col("path").as("__file"),
          element_at(col("__st"), 1).cast(keyType).as("__lo"),
          element_at(col("__st"), 2).cast(keyType).as("__hi"))
        .unionByName(pvFrame.filter(col("__lo").isNotNull && col("__hi").isNotNull))
      val hit = ranges
        .join(broadcast(keys),
          col("__k") >= col("__lo") && col("__k") <= col("__hi"), "leftsemi")
        .select("__file").as[String].collect().toSeq
      bloomPruneCandidates(spark, statless ++ pvBad ++ hit, targetKey,
        keys.select(expr("xxhash64(__k)").as("__h")))
    } else {
      val all = filesOf(v)
      val stats = statsOf(v)
      // recorded stats first, partition-value bound as the fallback
      val boundsOf: String => Option[(String, String)] = f =>
        stats.get(f).flatMap(_.get(targetKey)).map { case (mn, mx, _) => (mn, mx) }
          .orElse(pvBound(f).map(x => (x, x)))
      val (ranged, statless) = all.partition(f => boundsOf(f).isDefined)
      if (ranged.isEmpty)
        // no ranges to pass — the Bloom sidecar (if any) is the only prune
        bloomPruneCandidates(spark, all, targetKey,
          keys.select(expr("xxhash64(__k)").as("__h")))
      else {
        val ranges0 = ranged.map { f =>
          val (mn, mx) = boundsOf(f).get; (f, mn, mx)
        }.toDF("__file", "__lo", "__hi")
          .select(col("__file"),
            col("__lo").cast(keyType).as("__lo"), col("__hi").cast(keyType).as("__hi"))
        // a bound that does not survive the cast cannot prune soundly: keep
        // the file conservatively touched instead of silently skipping it
        val bad = ranges0.filter(col("__lo").isNull || col("__hi").isNull)
          .select("__file").as[String].collect().toSeq
        val ranges = ranges0.filter(col("__lo").isNotNull && col("__hi").isNotNull)
        val hit = keys
          .join(broadcast(ranges), col("__k") >= col("__lo") && col("__k") <= col("__hi"))
          .select("__file").distinct().as[String].collect().toSeq
        bloomPruneCandidates(spark, statless ++ bad ++ hit, targetKey,
          keys.select(expr("xxhash64(__k)").as("__h")))
      }
    }
  }

  /** Write-time CDF rows from the merge kernel's own change markers (shared
    * by [[mergeCow]] and [[mergeMor]]): updates emit their preimage+postimage
    * pair (identity SETs drop), deletes their preimage, inserts their row —
    * Delta CDF's per-row semantics, zero bag-diff shuffles. `marked` carries
    * the table's columns (type-pinned) plus `__change_kind`/`__pre`. */
  private def captureMergeCdf(marked: DataFrame,
      schema: org.apache.spark.sql.types.StructType): Seq[String] = {
    import org.apache.spark.sql.functions.{array, explode, lit, struct, when}
    val postS = struct(schema.fields.map(f => col(f.name).as(f.name)).toSeq: _*)
    val preS = struct(schema.fields.map(f =>
      col(s"__pre.${f.name}").cast(f.dataType).as(f.name)).toSeq: _*)
    val changed = marked.filter(col("__change_kind").isNotNull)
      .withColumn("__post_s", postS).withColumn("__pre_s", preS)
      .filter(col("__change_kind") =!= "update" || !(col("__pre_s") <=> col("__post_s")))
    val cdfRows = changed.select(explode(
      when(col("__change_kind") === "insert",
        array(struct(col("__post_s").as("row"), lit("insert").as("_change_type"))))
      .when(col("__change_kind") === "delete",
        array(struct(col("__pre_s").as("row"), lit("delete").as("_change_type"))))
      .otherwise(array(
        struct(col("__pre_s").as("row"), lit("delete").as("_change_type")),
        struct(col("__post_s").as("row"), lit("insert").as("_change_type"))))).as("c"))
      .select(col("c.row.*"), col("c._change_type"))
    writeCdfFiles(cdfRows)
  }

  /** MERGE-ON-READ merge: same clause surface and file pruning as
    * [[mergeCow]], but matched rows are tombstoned in a deletion-vector
    * sidecar and their post-images (plus inserts) land in APPENDED files —
    * no data file is rewritten. The write cost is O(changed rows), not
    * O(touched files): merging a narrow CDC batch whose keys scatter across
    * thousands of wide 100 TB-table files writes kilobytes of DV positions
    * plus the batch itself, where COW would rewrite every touched file.
    * The read-side tax (DV anti-join) is repaid at the next [[compact]],
    * which materializes the tombstones. Identity updates (post <=> pre) are
    * detected and skipped outright — no DV entry, no appended row, no CDF
    * pair — so a re-delivered CDC batch is write-free, not write-doubling.
    *
    * Physical shape: the merge kernel runs over the position-tagged touched
    * slice; one slim execution projects `(file, row_index)` tombstones, one
    * projects the appended row images (and one more the CDF pairs iff
    * enabled) — multiple executions of the same pruned join, each writing a
    * narrow projection, the MOR trade Delta's own DV-merge makes.
    *
    * Returns (newVersion, tombstonedRowCount). */
  def mergeMor(spark: SparkSession, source: DataFrame, condition: String,
      targetKey: String, sourceKey: String,
      whenMatchedUpdate: Option[Merge.MatchedUpdate] = None,
      whenMatchedDelete: Option[Merge.MatchedDelete] = None,
      whenNotMatchedInsert: Option[Merge.NotMatchedInsert] = None,
      whenNotMatchedBySourceUpdate: Option[Merge.NotMatchedBySourceUpdate] = None,
      whenNotMatchedBySourceDelete: Option[Merge.NotMatchedBySourceDelete] = None,
      schemaEvolution: Boolean = false,
      numPartitions: Option[Int] = None, sortBy: Seq[String] = Nil,
      txn: Option[(String, Long)] = None): (Long, Long) = {
    import org.apache.spark.sql.functions.{expr, struct}
    if (whenMatchedUpdate.isDefined || whenMatchedDelete.isDefined ||
        whenNotMatchedBySourceUpdate.isDefined || whenNotMatchedBySourceDelete.isDefined)
      requireNotAppendOnly("MERGE with update/delete clauses")
    val v = resolve()
    val schema0 = schemaOf(v).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    val schema = if (!schemaEvolution) schema0 else widenWith(schema0, source)
    val keyType = schema.find(_.name == targetKey).getOrElse(
      throw new IllegalArgumentException(s"target key $targetKey not in table schema")).dataType
    require(conditionHasEquiConjunct(condition, sourceKey, targetKey,
        sourceType = source.schema.fields
          .find(_.name.equalsIgnoreCase(sourceKey)).map(_.dataType),
        targetType = Some(keyType)),
      s"mergeMor prune keys ($sourceKey, $targetKey) are not implied by the merge " +
        s"condition '$condition': it must contain a top-level conjunct " +
        s"source.$sourceKey = target.$targetKey, with at most a WIDENING cast " +
        "on either side (file pruning would otherwise be unsound)")
    requireNoGeneratedDesync(spark, schema,
      (whenMatchedUpdate.toSeq.flatMap(_.values.keys) ++
        whenNotMatchedBySourceUpdate.toSeq.flatMap(_.values.keys)).distinct,
      "MERGE SET")
    requireNoIdentityWrite(v,
      (whenMatchedUpdate.toSeq.flatMap(_.values.keys) ++
        whenNotMatchedBySourceUpdate.toSeq.flatMap(_.values.keys)).distinct,
      "MERGE SET")
    val nms = whenNotMatchedBySourceUpdate.isDefined || whenNotMatchedBySourceDelete.isDefined
    val touched =
      if (nms) filesOf(v) // a by-source clause can modify any row: no pruning
      else filesOverlappingSourceKeys(spark, v, source, sourceKey, targetKey, keyType)
    if (touched.isEmpty && whenNotMatchedInsert.isEmpty) return (v, 0L)
    val dvs = dvsOf(v)
    val pb = partitionByOf(v)
    val pVals = partitionValuesOf(v)
    // position-tagged slice: __rel/__ri ride through the kernel as plain
    // target columns (null on inserted rows), pointing each matched row at
    // the file position its tombstone must name
    val slice =
      if (touched.isEmpty)
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          schema.add("__rel", org.apache.spark.sql.types.StringType)
            .add("__ri", org.apache.spark.sql.types.LongType))
      else scanLive(spark, touched, Some(schema), dvs, keepPos = true, pb, pVals)
    val marked0 = Merge.merge(slice, source, condition,
      whenMatchedUpdate, whenMatchedDelete, whenNotMatchedInsert,
      whenNotMatchedBySourceUpdate, whenNotMatchedBySourceDelete,
      emitChanges = true)
    // identity detection: an update whose type-pinned post-image equals its
    // preimage changes nothing — treat as untouched everywhere
    val postS = struct(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    val preS = struct(schema.fields.map(f =>
      col(s"__pre.${f.name}").cast(f.dataType).as(f.name)).toSeq: _*)
    val effective = marked0.filter(col("__change_kind").isNotNull)
      .filter(col("__change_kind") =!= "update" || !(preS <=> postS))
    val newDv = writeDvFiles(effective
      .filter(col("__change_kind").isin("update", "delete") && col("__rel").isNotNull)
      .select(col("__rel").as("file"), col("__ri").as("row_index")))
    val morDvRead =
      if (newDv.isEmpty) None
      else Some(spark.read.parquet(
        newDv.map(f => Paths.get(root).resolve(f).toString): _*))
    val nTomb = morDvRead.fold(0L)(_.count())
    val morDvCovered = morDvRead.filter(_ => nTomb > 0L).fold(Set.empty[String])(
      _.select("file").distinct().collect().map(_.getString(0)).toSet)
    val appendRows = effective.filter(col("__change_kind").isin("update", "insert"))
      .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)
    // the appended-row count rides the write itself as an Observation — no
    // post-hoc footer re-read to decide the no-op below
    val obs = org.apache.spark.sql.Observation()
    val (commitId, newFiles, newPartVals, stamped) = writeDataFiles(
      appendRows.observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n")),
      numPartitions, sortBy, pb)
    val nAppended = if (newFiles.isEmpty) 0L else obs.get("n").asInstanceOf[Long]
    // provable no-op (e.g. a re-delivered batch: all identity updates, all
    // inserts already present): don't burn a version. The writer may have
    // emitted empty part files — left unreferenced, vacuum's orphan sweep
    // collects them.
    if (nTomb == 0L && nAppended == 0L)
      return (v, 0L)
    val cdfFiles = if (!cdfEnabled) Nil else captureMergeCdf(
      marked0.filter(col("__change_kind").isNotNull)
        .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)) ++
          Seq(col("__change_kind"), col("__pre")): _*), schema)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val newStats = if (newFiles.nonEmpty)
                     collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
                   else Map.empty[String, Map[String, (String, String, String)]]
    val cs = constraintsOf(v) ++ notNullChecks(Some(schema))
    if (pb.isEmpty) validateWritten(spark, newFiles, Some(schema), cs)
    else validateFrame(appendRows, cs)
    // no file is dropped (touched = empty set): carried stats stay sound —
    // a DV only narrows live rows, min/max remain valid skip bounds
    (publishRewrite(v, Set.empty, newFiles, newStats, schema.json,
      dvsCarried = dvs ++ newDv, newPartVals,
      cdfKind = if (cdfFiles.nonEmpty) Some("files") else None, cdfFiles = cdfFiles,
      txn = txn,
      freshSafe = (h, fresh) => fresh.isEmpty || (!nms && {
        val bounds = source.agg(
          org.apache.spark.sql.functions.min(expr(sourceKey).cast(keyType)),
          org.apache.spark.sql.functions.max(expr(sourceKey).cast(keyType))).head()
        bounds.isNullAt(0) ||
          scanLive(spark, fresh, Some(schema), Nil, keepPos = false, pb, partitionValuesOf(h))
            .filter(col(targetKey).cast(keyType) >= bounds.get(0) &&
              col(targetKey).cast(keyType) <= bounds.get(1)).isEmpty
      }), stampedIds = stamped, dvGuard = morDvCovered,
      operation = Some("MERGE")), nTomb)
  }

  /** True iff `condition` contains a top-level AND-conjunct of the exact
    * shape `source.<sourceKey> = target.<targetKey>` (either side order,
    * optional backticks/parens, case-insensitive identifiers). Conjuncts are
    * split on AND only outside parentheses, so an OR buried in one conjunct
    * cannot smuggle the equi-clause into a disjunction where it no longer
    * holds for every matching row. A CAST wrapping either key side is
    * accepted ONLY when it provably widens that key column's type
    * (`Cast.canUpCast` against the passed column types — mirroring the
    * stripUpCast check in GraftExtensions): this path receives raw user SQL,
    * and a user-written NARROWING cast (e.g. `target.id = CAST(source.k AS
    * INT)` with a BIGINT `source.k`) wraps values, so treating it as an
    * equi-key would make the range/Bloom file pruning unsound. */
  private def conditionHasEquiConjunct(condition: String, sourceKey: String,
      targetKey: String,
      sourceType: Option[org.apache.spark.sql.types.DataType] = None,
      targetType: Option[org.apache.spark.sql.types.DataType] = None): Boolean = {
    def splitTopLevelAnd(s: String): Seq[String] = {
      val parts = scala.collection.mutable.ArrayBuffer.empty[String]
      val cur = new StringBuilder
      var depth = 0
      var i = 0
      val up = s.toUpperCase
      while (i < s.length) {
        s.charAt(i) match {
          case '(' => depth += 1; cur += s.charAt(i); i += 1
          case ')' => depth -= 1; cur += s.charAt(i); i += 1
          case _ if depth == 0 && up.startsWith("AND", i) &&
              (i == 0 || !Character.isLetterOrDigit(s.charAt(i - 1))) &&
              (i + 3 >= s.length || !Character.isLetterOrDigit(s.charAt(i + 3))) =>
            parts += cur.toString; cur.clear(); i += 3
          case ch => cur += ch; i += 1
        }
      }
      parts += cur.toString
      parts.toSeq
    }
    def norm(id: String): String = id.replace("`", "").trim.toLowerCase
    val sk = norm(sourceKey)
    val tk = norm(targetKey)
    // Either side may carry a cast (the analyzer inserts WIDENING ones for
    // implicit coercion, e.g. `target.id = CAST(source.ID AS BIGINT)` when a
    // VALUES source yields INT against a BIGINT key) — captured and verified
    // to widen below; a narrowing user cast rejects the conjunct.
    val side = """(?:CAST\s*\(\s*)?`?(\w+)`?\s*\.\s*`?(\w+)`?(?:\s+AS\s+(\w+(?:\(\s*\d+(?:\s*,\s*\d+)?\s*\))?)\s*\))?"""
    val Eq = s"""(?i)\\s*$side\\s*=\\s*$side\\s*""".r
    def castWidens(castType: String,
        colType: Option[org.apache.spark.sql.types.DataType]): Boolean =
      castType == null || colType.exists { from =>
        scala.util.Try(org.apache.spark.sql.catalyst.parser.CatalystSqlParser
          .parseDataType(castType)).toOption
          .exists(to => org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(from, to))
      }
    splitTopLevelAnd(condition).exists { conj =>
      // a fully parenthesized conjunct is still the same conjunct
      var c = conj.trim
      while (c.startsWith("(") && c.endsWith(")") &&
          splitTopLevelAnd(c.substring(1, c.length - 1)).size == 1)
        c = c.substring(1, c.length - 1).trim
      c match {
        case Eq(q1, c1, t1, q2, c2, t2) =>
          val l = (norm(q1), norm(c1)); val r = (norm(q2), norm(c2))
          def sideOk(s: (String, String), t: String): Boolean =
            if (s == ("source", sk)) castWidens(t, sourceType)
            else if (s == ("target", tk)) castWidens(t, targetType)
            else true // wrong pair: the pair check below rejects anyway
          ((l == ("source", sk) && r == ("target", tk)) ||
            (l == ("target", tk) && r == ("source", sk))) &&
            sideOk(l, t1) && sideOk(r, t2)
        case _ => false
      }
    }
  }

  /** Stats-pruned read: only files whose recorded [min, max] for `column`
    * intersects [lo, hi] are scanned (Delta-style data skipping — the
    * manifest is the index, no footer reads needed). Falls back to all files
    * when stats are absent. Values compare numerically when both sides parse
    * as numbers, lexicographically otherwise. Returns (df, scannedFiles,
    * totalFiles) so callers can observe the skipping. */
  /** Version-pinned scan with manifest-stats file skipping driven by
    * per-column `[lo, hi]` bounds (either side optional; a file survives
    * only if its recorded stats overlap EVERY bound). This is the batch
    * relation's filter-pushdown hook ([[graft.streaming.TableStreamProvider]]):
    * a `WHERE o_orderkey <= 100` on `spark.read.format("graft-table")`
    * prunes at the FILE LIST, before any I/O — the manifest-stat analogue
    * of parquet predicate pushdown, decisive at 100 TB. Returns the frame
    * plus (kept, total) file counts for plan assertions. */
  /** The min/max + nullCount prune passes over version `v`'s IN-MEMORY
    * manifest stats — shared by [[readBounded]]'s read path and
    * [[estimateLiveRows]]' planning-time estimate. Pure metadata (no file
    * or sidecar I/O), conservative on any missing or unparseable stat.
    *
    * nullCount soundness: an IS NULL conjunct skips files with ZERO nulls
    * in the column, IS NOT NULL skips all-null files. Deletes (DVs) only
    * remove rows — they can neither add nulls to a zero-null file nor
    * non-nulls to an all-null one — so the write-time counts stay sound
    * prune evidence for any live subset of the file. */
  private[table] def statsSurvivors(v: Long,
      bounds: Seq[(String, Option[String], Option[String])],
      nullness: Seq[(String, Boolean)]): Seq[String] = {
    val all = filesOf(v)
    val stats = statsOf(v)
    def num(s: String): Option[BigDecimal] = scala.util.Try(BigDecimal(s)).toOption
    def overlaps(mn: String, mx: String, kind: String,
                 lo: Option[String], hi: Option[String]): Boolean = {
      val aboveLo = lo.forall { l =>
        if (kind == "num") (num(mx), num(l)) match {
          case (Some(b), Some(x)) => b >= x
          case _ => true // unparseable → cannot skip safely
        } else mx >= l
      }
      val belowHi = hi.forall { h =>
        if (kind == "num") (num(mn), num(h)) match {
          case (Some(a), Some(x)) => a <= x
          case _ => true
        } else mn <= h
      }
      aboveLo && belowHi
    }
    val rangedMinMax = all.filter { f =>
      bounds.forall { case (c, lo, hi) =>
        stats.get(f).flatMap(_.get(c)) match {
          case Some((mn, mx, kind)) => overlaps(mn, mx, kind, lo, hi)
          case None => true // no stats → cannot skip
        }
      }
    }
    rangedMinMax.filter { f =>
      nullness.forall { case (c, wantNull) =>
        stats.get(f).flatMap(
            _.get(s"${VersionedTable.NullCountPrefix}$c")) match {
          case Some((nc, _, _)) =>
            scala.util.Try(nc.toLong).toOption match {
              case Some(nulls) if wantNull => nulls > 0
              case Some(nulls) =>
                stats.get(f).flatMap(_.get(VersionedTable.RowCountStat))
                  .flatMap(r => scala.util.Try(r._1.toLong).toOption)
                  .forall(rows => nulls < rows)
              case None => true // unparseable → cannot skip safely
            }
          case None => true // no nullCount recorded → cannot skip
        }
      }
    }
  }

  /** Planning-time row ESTIMATE of version `v` under pushed bounds: the sum
    * of write-time `__rows` over the stats-surviving files. None when any
    * surviving file predates row-count stats (callers fall back to Spark's
    * conservative default). DV tombstones are deliberately NOT subtracted —
    * that would cost a Spark job at plan time — so the estimate upper-bounds
    * the live count, the safe direction for a broadcast decision. Pure
    * in-memory manifest metadata: O(live files) driver work with no I/O,
    * the same budget every planner pays to list a snapshot. */
  def estimateLiveRows(v: Long,
      bounds: Seq[(String, Option[String], Option[String])] = Nil,
      nullness: Seq[(String, Boolean)] = Nil): Option[Long] = {
    val stats = statsOf(v)
    val counts = statsSurvivors(v, bounds, nullness).map(f =>
      stats.get(f).flatMap(_.get(VersionedTable.RowCountStat))
        .flatMap { case (n, _, _) => scala.util.Try(n.toLong).toOption })
    if (counts.exists(_.isEmpty)) None else Some(counts.flatten.sum)
  }

  def readBounded(spark: SparkSession,
      bounds: Seq[(String, Option[String], Option[String])],
      relativeVersion: Option[Int] = None,
      versionAsOf: Option[Long] = None,
      exactValues: Seq[(String, Seq[String])] = Nil,
      nullness: Seq[(String, Boolean)] = Nil): (DataFrame, Int, Int) = {
    val v = resolve(relativeVersion, versionAsOf)
    val all = filesOf(v)
    val ranged = statsSurvivors(v, bounds, nullness)
    // Bloom pass for EQUALITY bounds on indexed columns: hash the typed
    // value exactly as the build side hashed the column (cast the rendered
    // string back through the schema type, then xxhash64) and drop files
    // whose sidecar filter excludes it — the point-lookup prune min-max
    // ranges cannot do on a high-cardinality uniform key
    // IN-list pushdowns probe per VALUE (the range [min, max] the bounds
    // carry cannot use the sidecar; each member can): same typed-hash
    // convention as the equality probe below
    // the probed name resolves through leafType (top-level exact first,
    // then the dotted struct walk) — a Bloom-indexed NESTED leaf probes
    // exactly like a top-level one, since build and probe hash the same
    // typed value; only the leaf TYPE matters here (the value side casts
    // the rendered literal)
    def probeType(c: String): Option[org.apache.spark.sql.types.DataType] =
      schemaOf(v).flatMap(s => VersionedTable.leafType(s, c))
        .filter(_ != org.apache.spark.sql.types.TimestampType)
    val inProbed = exactValues.foldLeft(ranged) {
      case (cand, (c, vals)) if vals.nonEmpty && bloomIndexColumns.contains(c) =>
        probeType(c).fold(cand) { dt =>
          import org.apache.spark.sql.functions.expr
          val lits = vals.map(x =>
            "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'").mkString(", ")
          bloomPruneCandidates(spark, cand, c,
            spark.range(1).select(expr(
              s"explode(array($lits))").as("__s"))
              .select(expr(s"xxhash64(CAST(__s AS ${dt.sql}))").as("__h")))
        }
      case (cand, _) => cand
    }
    val kept = bounds.foldLeft(inProbed) {
      case (cand, (c, Some(lo), Some(hi))) if lo == hi && bloomIndexColumns.contains(c) =>
        // timestamps are excluded: the rendered bound would re-parse in
        // the SESSION zone, which may differ from the stats zone the value
        // was rendered in — a mismatched instant hashes differently and
        // would wrongly prune live files
        probeType(c).fold(cand) { dt =>
          import org.apache.spark.sql.functions.expr
          val esc = lo.replace("\\", "\\\\").replace("'", "\\'")
          bloomPruneCandidates(spark, cand, c, spark.range(1).select(
            expr(s"xxhash64(CAST('$esc' AS ${dt.sql}))").as("__h")))
        }
      case (cand, _) => cand
    }
    val df =
      if (kept.nonEmpty) scanLive(spark, kept, schemaOf(v), dvsOf(v), keepPos = false,
        partitionByOf(v), partitionValuesOf(v))
      else schemaOf(v) match {
        case Some(s) =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        case None =>
          spark.read.parquet(all.map(f => Paths.get(root).resolve(f).toString): _*).limit(0)
      }
    (df, kept.size, all.size)
  }

  def readPruned(spark: SparkSession, column: String, lo: String, hi: String,
                 relativeVersion: Option[Int] = None): (DataFrame, Int, Int) =
    readBounded(spark, Seq((column, Some(lo), Some(hi))), relativeVersion)

  /** Point-lookup read: serve `column IN keys` scanning only the files that
    * can hold SOME key — the record-level-index serving shape (Delta Bloom
    * index / Hudi RLI). Two metadata passes, no data I/O for skipped files:
    *  - per-KEY min-max stats (a sorted layout probed at two distant points
    *    keeps ~2 files — tighter than the range-hull check [[readBounded]]
    *    runs, whose hull would span the table);
    *  - Bloom sidecars when `column` is indexed (the uniform round-robin
    *    layout min-max cannot prune; timestamps excluded — the rendered key
    *    would re-parse in the session zone, not the stats zone).
    * Both passes are conservative: unparseable/missing stats keep the file,
    * rows still need the caller's residual `IN` filter. At 100 TB a 2-key
    * probe of a million-file table reads kilobytes of manifest + sidecar
    * and a handful of files, never the table. Returns (df, kept, total). */
  def readByKeys(spark: SparkSession, column: String, keys: Seq[String],
      relativeVersion: Option[Int] = None,
      versionAsOf: Option[Long] = None): (DataFrame, Int, Int) = {
    require(keys.nonEmpty, "readByKeys needs at least one key")
    val v = resolve(relativeVersion, versionAsOf)
    val all = filesOf(v)
    val stats = statsOf(v)
    def num(s: String): Option[BigDecimal] = scala.util.Try(BigDecimal(s)).toOption
    val ranged = all.filter { f =>
      stats.get(f).flatMap(_.get(column)) match {
        case Some((mn, mx, kind)) =>
          keys.exists { k =>
            if (kind == "num") (num(mn), num(mx), num(k)) match {
              case (Some(a), Some(b), Some(x)) => a <= x && x <= b
              case _ => true // unparseable → cannot skip safely
            } else mn <= k && k <= mx
          }
        case None => true // no stats → cannot skip
      }
    }
    val kept =
      if (!bloomIndexColumns.contains(column)) ranged
      else schemaOf(v).flatMap(s => VersionedTable.leafType(s, column))
          .filter(_ != org.apache.spark.sql.types.TimestampType).fold(ranged) { dt =>
        import org.apache.spark.sql.functions.expr
        val lits = keys.map(x =>
          "'" + x.replace("\\", "\\\\").replace("'", "\\'") + "'").mkString(", ")
        bloomPruneCandidates(spark, ranged, column,
          spark.range(1).select(expr(s"explode(array($lits))").as("__s"))
            .select(expr(s"xxhash64(CAST(__s AS ${dt.sql}))").as("__h")))
      }
    val df =
      if (kept.nonEmpty) scanLive(spark, kept, schemaOf(v), dvsOf(v),
        keepPos = false, partitionByOf(v), partitionValuesOf(v))
      else schemaOf(v) match {
        case Some(s) =>
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], s)
        case None => throw new IllegalStateException(
          s"version $v of $root has no recorded schema")
      }
    (df, kept.size, all.size)
  }

  /** Publish a rewrite of snapshot `base` as version `base`+1, pinned: if
    * any other writer committed after `base` was read, the link collides and
    * [[ConcurrentCommitException]] surfaces instead of silently republishing
    * a manifest that drops that commit's changes. */
  private def commitPinned(df: DataFrame, base: Long,
      numPartitions: Option[Int] = None, sortBy: Seq[String] = Nil,
      forceStats: Boolean = false): Long = {
    // a rewrite of the snapshot keeps the TABLE's partition layout
    val pb = partitionByOf(base)
    val (commitId, files, partVals, stamped) = writeDataFiles(df, numPartitions, sortBy, pb)
    val partTypes = df.schema.fields.map(f => f.name -> f.dataType).toMap
    // honor the producer's stats opt-out (collectStats = false commits, e.g.
    // Bloom-only signature stores whose hash columns never range-prune): a
    // base version with NO recorded stats skips the extra aggregation pass —
    // at scale that pass doubles OPTIMIZE's read cost for zero pruning.
    // Z-ORDER forces stats regardless: stats-based skipping is its point.
    // Identity tables always keep stats (the allocation guard reads them).
    val wantStats = forceStats || statsOf(base).nonEmpty || identityOf(base).isDefined
    val stats =
      if (files.nonEmpty && wantStats)
        collectFileStats(df.sparkSession, commitId, files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    // compaction rewrites the same rows: constraints carry, nothing re-gates;
    // CDF kind "none" records that the transition changed NO rows, so a
    // change-feed consumer skips it without any diffing. The RECORDED
    // schema carries verbatim: the scan re-derives nullability from
    // parquet (array containsNull widens to true), and publishing that
    // drift would make the original producer's appends refuse a "changed"
    // column type after every OPTIMIZE
    publish(files, schemaOf(base).map(_.json).getOrElse(df.schema.json),
      stats, None, Some(base), constraintsOf(base),
      partitionBy = pb, partitions = partVals, cdfKind = Some("none"),
      stampedIds = stamped, operation = Some("OPTIMIZE"))
  }

  /** Compaction (OPTIMIZE): rewrite the latest snapshot into `numFiles`
    * files as a NEW version — readers keep snapshot isolation, old versions
    * stay time-travelable, and the small-file problem goes away without a
    * write lock (single-writer protocol as for any commit).
    *
    * Snapshot-pinned like [[delete]]/[[mergeCow]]: an append or merge
    * committed by another writer between this compaction's read and its
    * publish raises [[ConcurrentCommitException]] (re-run OPTIMIZE on the new
    * head) rather than silently vanishing from the compacted manifest — the
    * lost-commit hazard of publishing a stale full snapshot at whatever the
    * head happens to be at publish time.
    *
    * `zOrderBy` (OPTIMIZE ZORDER parity, exclusive with `sortBy`): files are
    * laid out along a Z-curve over 2-4 numeric columns — each column is
    * min/max-scaled to 16 bits and the bits interleaved — so the per-file
    * stats ranges stay narrow in EVERY listed dimension and [[readPruned]]
    * skips files for predicates on any of them. A single-column range sort
    * can only ever prune its one leading column; multi-dimensional skipping
    * is what makes selective reads on a second key feasible at 100 TB. */
  /** Partition-scoped OPTIMIZE (`OPTIMIZE ... WHERE <partition predicate>`):
    * compact ONLY the files of matching partitions into ≤`numFiles` tasks'
    * worth of output; every other partition's files (and their stats)
    * carry verbatim. At 100 TB this is how compaction actually runs —
    * yesterday's hot partition gets binpacked, the other 3000 partitions
    * cost nothing. The rewritten slice materializes its deletion-vector
    * tombstones (like full OPTIMIZE); untouched files keep theirs. Racing
    * pure appends rebase (a compaction preserves rows, an append adds
    * disjoint files — serial equivalence is exact); any other interloper
    * raises [[ConcurrentCommitException]]. */
  def compactWhere(spark: SparkSession, predicate: String, numFiles: Int = 1,
                   sortBy: Seq[String] = Nil): Long = {
    val pinned = resolve()
    val matching = prunePartitions(spark, pinned, predicate)
    if (matching.isEmpty) return pinned // no partition matches: no-op, no version burned
    val schema = schemaOf(pinned).getOrElse(throw new IllegalStateException(
      s"version $pinned of $root has no recorded schema"))
    val dvs = dvsOf(pinned)
    val pb = partitionByOf(pinned)
    val pVals = partitionValuesOf(pinned)
    val untouched = filesOf(pinned).filterNot(matching.toSet)
    val slice = scanLive(spark, matching, Some(schema), dvs, keepPos = false, pb, pVals)
    val (commitId, newFiles, newPartVals, stamped) =
      writeDataFiles(slice, Some(numFiles), sortBy, pb)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    // same stats opt-out inference as commitPinned: a base version with no
    // recorded stats (producer committed collectStats = false) skips the pass
    val stats =
      if (newFiles.nonEmpty && (statsOf(pinned).nonEmpty || identityOf(pinned).isDefined))
        collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    publishRewrite(pinned, matching.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = Some("none"), cdfFiles = Nil, txn = None,
      freshSafe = (_, _) => true, stampedIds = stamped,
      operation = Some("OPTIMIZE"))
  }

  /** `REORG TABLE ... APPLY (PURGE)` parity: rewrite ONLY the files
    * carrying deletion-vector tombstones, materializing their deletes;
    * every clean file (and its stats) carries verbatim. The targeted
    * sibling of [[compact]] for MOR tables that delete continuously — at
    * 100 TB a purge touches the O(deleted-from) file subset where a full
    * OPTIMIZE would rewrite everything. The tombstoned-file set comes from
    * the DV sidecars themselves (one bounded distinct over (file) — DV
    * sidecars are O(deletes), metadata-plane by construction). Output file
    * count defaults to the rewritten-file count (purge preserves layout;
    * binpacking is OPTIMIZE's job). Returns the committed version (the
    * pinned head unchanged when there is nothing to purge). */
  def reorgPurge(spark: SparkSession, numFiles: Option[Int] = None): Long = {
    val pinned = resolve()
    val dvs = dvsOf(pinned)
    if (dvs.isEmpty) return pinned
    import spark.implicits._
    val tombstoned = dvFrame(spark, dvs).select("file").distinct()
      .as[String].collect().toSet
    val matching = filesOf(pinned).filter(tombstoned)
    if (matching.isEmpty) return pinned
    val schema = schemaOf(pinned).getOrElse(throw new IllegalStateException(
      s"version $pinned of $root has no recorded schema"))
    val pb = partitionByOf(pinned)
    val pVals = partitionValuesOf(pinned)
    val untouched = filesOf(pinned).filterNot(matching.toSet)
    val slice = scanLive(spark, matching, Some(schema), dvs, keepPos = false, pb, pVals)
    val (commitId, newFiles, newPartVals, stamped) =
      writeDataFiles(slice, Some(numFiles.getOrElse(matching.size)), Nil, pb)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats =
      if (newFiles.nonEmpty && (statsOf(pinned).nonEmpty || identityOf(pinned).isDefined))
        collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    publishRewrite(pinned, matching.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = Some("none"), cdfFiles = Nil, txn = None,
      freshSafe = (_, _) => true, stampedIds = stamped,
      operation = Some("REORG"))
  }

  /** `ANALYZE TABLE ... COMPUTE STATISTICS` parity: (re)collect per-file
    * min/max column stats for the CURRENT snapshot's files and publish
    * them in a METADATA-ONLY commit — zero data files move. The backfill
    * verb for tables whose stats were skipped at write time and whose
    * read pattern later turned selective: a CONVERT adopted with
    * `collectStats = false`, a store committed stats-off for Bloom-only
    * point lookups, or a table whose stats predate an engine stats-shape
    * revision. One distributed scan over the snapshot (the same pass a
    * stats-on commit runs); partition values re-inject as exact
    * min=max=value stats so partition-column pruning works too. After the
    * commit, maintenance rewrites infer stats-ON and keep them current.
    * No-op (no version burned) on an empty table. */
  def analyzeStats(spark: SparkSession): Long = {
    val v = resolve()
    val files = filesOf(v)
    if (files.isEmpty) return v
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats = collectFileStats(spark, commitId = "", files,
      partitionValuesOf(v), partTypes)
    publish(files, schema.json, stats, None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      maxColumnIdFloor = maxColumnIdOf(v),
      operation = Some("ANALYZE"))
  }

  def compact(spark: SparkSession, numFiles: Int = 1,
              sortBy: Seq[String] = Nil, zOrderBy: Seq[String] = Nil,
              targetFileSizeBytes: Option[Long] = None): Long = {
    require(sortBy.isEmpty || zOrderBy.isEmpty, "sortBy and zOrderBy are exclusive")
    val pinned = resolve()
    // size-targeted binpacking: derive the output file count from the
    // snapshot's ON-DISK bytes (manifest file list, no data read) — the
    // operational OPTIMIZE knob: "keep files near 1 GB" holds as the table
    // grows, where a fixed numFiles silently drifts toward giant files
    val numFiles0 = targetFileSizeBytes match {
      case Some(target) =>
        require(target > 0, "targetFileSizeBytes must be positive")
        val bytes = filesOf(pinned)
          .map(f => scala.util.Try(Files.size(Paths.get(root).resolve(f))).getOrElse(0L)).sum
        math.max(1, math.ceil(bytes.toDouble / target).toInt)
      case None => numFiles
    }
    if (zOrderBy.isEmpty)
      commitPinned(read(spark, versionAsOf = Some(pinned)), pinned,
        numPartitions = Some(numFiles0), sortBy = sortBy)
    else {
      require(partitionByOf(pinned).isEmpty,
        "zOrderBy on a partitioned table is not supported: the z-curve layout " +
          "would fight the hive partition dirs — compact with sortBy instead " +
          "(files are already partition-pruned before stats skipping applies)")
      val df = read(spark, versionAsOf = Some(pinned))
      zOrderValidate(df.schema, zOrderBy)
      val bounds = zBounds(df, zOrderBy, pinned, filesOf(pinned))
      commitPinned(zLayout(df, zOrderBy, bounds, numFiles0), pinned, forceStats = true)
    }
  }

  /** Validate a Z-order column list: 2-4 numeric columns present in `schema`. */
  private def zOrderValidate(schema: org.apache.spark.sql.types.StructType,
      zOrderBy: Seq[String]): Unit = {
    require(zOrderBy.size >= 2 && zOrderBy.size <= 4,
      "zOrderBy takes 2-4 columns (16 bits each in a 64-bit z-value)")
    zOrderBy.foreach { c =>
      val f = schema.fields.find(_.name == c).getOrElse(
        throw new IllegalArgumentException(s"zOrderBy column $c not in table"))
      require(f.dataType.isInstanceOf[org.apache.spark.sql.types.NumericType],
        s"zOrderBy needs numeric columns; $c is ${f.dataType.simpleString}")
    }
  }

  /** Per-column global (min, max) for the z-scaling. Bounds come from the
    * manifest's per-file stats when every file in `over` carries them (zero
    * extra I/O); only a stats-less legacy table pays the pre-scan over `df`. */
  private def zBounds(df: DataFrame, zOrderBy: Seq[String], v: Long,
      over: Seq[String]): Map[String, (Double, Double)] = {
    import org.apache.spark.sql.functions.{max => fmax, min => fmin}
    val fileStats = statsOf(v)
    val fromManifest: Option[Map[String, (Double, Double)]] =
      if (over.nonEmpty && zOrderBy.forall(c =>
            over.forall(f => fileStats.get(f).exists(_.contains(c)))))
        Some(zOrderBy.map { c =>
          val ranges = over.map(f => fileStats(f)(c))
          c -> (ranges.map(_._1.toDouble).min, ranges.map(_._2.toDouble).max)
        }.toMap)
      else None
    fromManifest.getOrElse {
      val aggs = zOrderBy.flatMap(c => Seq(
        fmin(col(c)).cast("double").as(s"mn_$c"), fmax(col(c)).cast("double").as(s"mx_$c")))
      val row = df.agg(aggs.head, aggs.tail: _*).head()
      zOrderBy.map(c => c -> (row.getAs[Double](s"mn_$c"), row.getAs[Double](s"mx_$c"))).toMap
    }
  }

  /** Lay `df` out along a Z-curve over `zOrderBy`: each column min/max-scaled
    * to 16 bits against `bounds`, the bits interleaved into one 64-bit
    * z-value, rows range-partitioned into `numFiles` tasks and sorted by it —
    * per-file stats ranges stay narrow in EVERY listed dimension, so
    * [[readPruned]] skips files for predicates on any of them. */
  private def zLayout(df: DataFrame, zOrderBy: Seq[String],
      bounds: Map[String, (Double, Double)], numFiles: Int): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val k = zOrderBy.size
    var ranked = df
    zOrderBy.zipWithIndex.foreach { case (c, j) =>
      val (mn, mx) = bounds(c)
      val span = if (mx > mn) mx - mn else 1.0
      ranked = ranked.withColumn(s"__zr$j", expr(
        s"least(65535L, greatest(0L, CAST((CAST($c AS DOUBLE) - ${mn}D) / ${span}D * 65535D AS BIGINT)))"))
    }
    val terms = for (i <- 0 until 16; j <- 0 until k)
      yield s"shiftleft(shiftright(__zr$j, $i) & 1L, ${i * k + j})"
    ranked.withColumn("__z", expr(terms.mkString(" + ")))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop((0 until k).map(j => s"__zr$j") :+ "__z": _*)
  }

  // ---- Incremental clustering (ZCube-shaped OPTIMIZE) --------------------
  //
  // Full OPTIMIZE ZORDER re-sorts the WHOLE snapshot: at 100 TB with daily
  // appends that is a petabyte rewrite per run for data that was already
  // laid out last time. The incremental verb clusters ONLY the live files
  // no previous cluster run produced — each run adds one Z-ordered "cube"
  // of the new data and every prior cube (files + stats) carries verbatim,
  // so the steady-state cost is O(appended-since-last-run), not O(table).
  // Reads prune from per-file min/max stats regardless of which cube a
  // file sits in; more cubes only means proportionally more files per
  // z-region (bounded by run count, reset any time by a full compact).
  //
  // Bookkeeping is a CAS-versioned `_cluster-v*.json` sidecar in the log
  // dir (the properties-document protocol) recording the clustering spec
  // and the file set the last run left clustered. The sidecar is a CACHE,
  // never load-bearing for correctness: intersecting it with the live
  // file list drops files later rewrites removed, a spec change empties
  // it (full recluster), and a crash between the data commit and the
  // sidecar write only makes the next run re-cluster files that were
  // already clustered — idempotent wasted work, not a wrong answer
  // (unlike a serving-path tear, no marker/repair machinery is owed).

  private def clusterPath(v: Long): Path = logDir.resolve(f"_cluster-v$v%08d.json")

  private def clusterSidecarVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_cluster-v\\d{8}\\.json") => s.substring(10, 18).toLong }
      .sorted

  /** Latest recorded clustering state: (spec, files the run left clustered). */
  private[table] def clusterState(): Option[(Seq[String], Set[String])] =
    clusterSidecarVersions().lastOption.map { v =>
      val node = mapper.readTree(Files.readAllBytes(clusterPath(v)))
      val spec = node.get("spec").elements().asScala.map(_.asText()).toSeq
      val fs = node.get("files").elements().asScala.map(_.asText()).toSet
      (spec, fs)
    }

  private def recordClusterState(spec: Seq[String], files: Set[String]): Unit = {
    val json = mapper.createObjectNode()
    val sn = json.putArray("spec"); spec.foreach(sn.add)
    val fn = json.putArray("files"); files.toSeq.sorted.foreach(fn.add)
    val bytes = mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json)
    while (true) {
      val next = clusterSidecarVersions().lastOption.map(_ + 1L).getOrElse(0L)
      if (store.putIfAbsent(clusterPath(next), bytes)) {
        clusterSidecarVersions().dropRight(3).foreach(v => Files.deleteIfExists(clusterPath(v)))
        return
      }
    }
  }

  /** Incremental OPTIMIZE ZORDER: Z-order ONLY the live files not produced
    * by a previous `clusterIncremental(zOrderBy)` run; previously clustered
    * files and their stats carry verbatim into the new version. A run with
    * nothing new to cluster is a no-op (no version burned). A different
    * `zOrderBy` than the recorded spec reclusters the whole snapshot (the
    * old layout serves the old spec, not the new one). Deletion-vector
    * tombstones on the rewritten slice materialize (as in [[compact]]);
    * untouched files keep theirs. Racing pure appends rebase (the appended
    * files simply stay unclustered until the next run); any interloper that
    * touched the files being clustered raises [[ConcurrentCommitException]].
    * Returns the committed version (the pinned head when nothing ran). */
  def clusterIncremental(spark: SparkSession, zOrderBy: Seq[String],
      targetFileSizeBytes: Long = 128L << 20,
      numFiles: Option[Int] = None): Long = {
    require(targetFileSizeBytes > 0, "targetFileSizeBytes must be positive")
    val pinned = resolve()
    require(partitionByOf(pinned).isEmpty,
      "clusterIncremental on a partitioned table is not supported: the " +
        "z-curve layout would fight the hive partition dirs")
    val live = filesOf(pinned)
    if (live.isEmpty) return pinned
    val schema = schemaOf(pinned).getOrElse(throw new IllegalStateException(
      s"version $pinned of $root has no recorded schema"))
    zOrderValidate(schema, zOrderBy)
    val clusteredPrior: Set[String] = clusterState() match {
      case Some((spec, fs)) if spec == zOrderBy => fs.intersect(live.toSet)
      case _ => Set.empty
    }
    val candidates = live.filterNot(clusteredPrior)
    if (candidates.isEmpty) return pinned
    val dvs = dvsOf(pinned)
    val pVals = partitionValuesOf(pinned)
    val slice = scanLive(spark, candidates, Some(schema), dvs, keepPos = false, Nil, pVals)
    // scale against the WHOLE snapshot's bounds (manifest stats, zero I/O
    // when present): every cube maps the same value to the same z-region,
    // so cross-cube file ranges stay comparable as the table grows
    val bounds = zBounds(slice, zOrderBy, pinned, live)
    val numFiles0 = numFiles.getOrElse {
      val bytes = candidates
        .map(f => scala.util.Try(Files.size(Paths.get(root).resolve(f))).getOrElse(0L)).sum
      math.max(1, math.ceil(bytes.toDouble / targetFileSizeBytes).toInt)
    }
    val laidOut = zLayout(slice, zOrderBy, bounds, numFiles0)
    val (commitId, newFiles, newPartVals, stamped) = writeDataFiles(laidOut, None, Nil, Nil)
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    // stats are the point of clustering: force-collect for the new cube
    val stats =
      if (newFiles.nonEmpty)
        collectFileStats(spark, commitId, newFiles, newPartVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    val untouched = live.filterNot(candidates.toSet)
    val committed = publishRewrite(pinned, candidates.toSet, newFiles, stats, schema.json,
      carryDvs(spark, dvs, untouched), newPartVals,
      cdfKind = Some("none"), cdfFiles = Nil, txn = None,
      freshSafe = (_, _) => true, stampedIds = stamped,
      operation = Some("CLUSTER"))
    recordClusterState(zOrderBy, clusteredPrior ++ newFiles)
    committed
  }

  /** DESCRIBE HISTORY parity: one row per retained version — version number,
    * file count, the idempotent-writer txn stamp if the commit carried one,
    * and the commit wall-clock ([[commitTimeOf]]: in-commit stamp, mtime
    * for legacy manifests). Reads only the manifests: O(retained versions),
    * no data I/O. */
  def history(spark: SparkSession): DataFrame = {
    import spark.implicits._
    // per-commit operation metrics (Delta's operationMetrics shape) are
    // DERIVED at read time from consecutive manifests — file-list diff vs
    // the direct parent plus the per-file `__rows` counts the stats
    // already carry; nothing extra is stored. After a vacuum drops the
    // parent, the diff has no baseline and the metrics read null.
    val retained = versions().toSet
    def fileRows(st: VersionedTable.TableState): Map[String, Option[Long]] =
      st.files.map { name =>
        name -> st.stats.get(name)
          .flatMap(_.get(VersionedTable.RowCountStat))
          .flatMap { case (n, _, _) => scala.util.Try(n.toLong).toOption }
      }.toMap
    versions().map { v =>
      val node = readManifestNode(v)
      val st = stateOf(v)
      val nFiles = st.files.size
      val op = if (node.has("operation")) Some(node.get("operation").asText()) else None
      val txnApp = if (node.has("txnApp")) Some(node.get("txnApp").asText()) else None
      val txnVersion = if (node.has("txnVersion")) Some(node.get("txnVersion").asLong()) else None
      val ts = new java.sql.Timestamp(
        if (node.has("commitTimeMs")) node.get("commitTimeMs").asLong()
        else Files.getLastModifiedTime(manifestPath(v)).toMillis)
      val parent: Option[Map[String, Option[Long]]] =
        if (v == 0) Some(Map.empty)
        else if (retained.contains(v - 1)) Some(fileRows(stateOf(v - 1)))
        else None
      val own = fileRows(st)
      def sumRows(m: Map[String, Option[Long]]): Option[Long] =
        if (m.valuesIterator.exists(_.isEmpty)) None else Some(m.valuesIterator.flatten.sum)
      val added = parent.map(p => own.view.filterKeys(f => !p.contains(f)).toMap)
      val removed = parent.map(p => p.view.filterKeys(f => !own.contains(f)).toMap)
      (v, op, nFiles,
        added.map(_.size.toLong), removed.map(_.size.toLong),
        added.flatMap(sumRows), removed.flatMap(sumRows),
        txnApp, txnVersion, ts)
    }.toDF("version", "operation", "n_files", "files_added", "files_removed",
      "rows_added", "rows_removed", "txn_app", "txn_version", "committed_at")
  }

  /** `DESCRIBE DETAIL` parity: one row of head-snapshot metadata — version,
    * counts and on-disk bytes of the live files, partition columns,
    * deletion-vector and constraint counts, properties, and the timestamps
    * the history derives from. Pure manifest metadata (plus `Files.size`
    * per live file): no data I/O at any table size. */
  def detail(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val v = resolve()
    val fs = filesOf(v)
    val bytes = fs.map(f =>
      scala.util.Try(Files.size(Paths.get(root).resolve(f))).getOrElse(0L)).sum
    val created = versions().headOption
      .map(x => new java.sql.Timestamp(commitTimeOf(x)))
    val modified = new java.sql.Timestamp(commitTimeOf(v))
    Seq((root, v, fs.size.toLong, bytes, rowCountOf(spark, v), partitionByOf(v),
      dvsOf(v).size.toLong, constraintsOf(v).size.toLong,
      properties.toSeq.sorted.map { case (k, x) => s"$k=$x" },
      created, modified))
      .toDF("location", "version", "num_files", "size_bytes", "num_rows",
        "partition_columns", "num_deletion_vectors", "num_constraints",
        "properties", "created_at", "last_modified")
  }

  /** Exact LIVE row count of version `v` (default head) from MANIFEST
    * metadata alone: every file records its `__rows` count in the stats it
    * already carries, and deletion-vector tombstones (tiny sidecars)
    * subtract. None when any live file predates row-count stats or the
    * producer opted stats off — callers fall back to a scan. At 100 TB
    * this answers count(*) in milliseconds instead of a full-table scan
    * (Iceberg's record_count; Delta's numRecords). */
  /** MIN/MAX of `column` answered from manifest stats alone, when SOUND:
    * requires a DV-free snapshot (a deletion-vector tombstone may hide the
    * extreme row — the reason the aggregate pushdown historically served
    * only count(*)) and the stat recorded in EVERY live file (a stats-less
    * commit or an all-null file could hide it just as silently). Returns
    * the rendered (min, max) stat strings for the caller to convert with
    * the column's type; None whenever any precondition fails — the caller
    * then scans, never serves a guess. The common case this unlocks is the
    * append-only analytics table: no DVs ever, stats on every commit, and
    * `SELECT max(event_time)` (the freshness probe run constantly at
    * 100 TB) becomes one manifest read. */
  def metaMinMax(version: Long, column: String): Option[(String, String)] = {
    val v = if (version < 0) resolve() else version
    if (dvsOf(v).nonEmpty) return None
    val fs = filesOf(v)
    if (fs.isEmpty) return None
    val stats = statsOf(v)
    val per = fs.map(f => stats.get(f).flatMap(_.get(column)))
    if (per.exists(_.isEmpty)) return None
    val triples = per.flatten
    if (triples.map(_._3).distinct.length != 1) return None // mixed kinds
    if (triples.head._3 == "num") {
      val keys = triples.map { case (mn, mx, _) =>
        (scala.util.Try(BigDecimal(mn)).toOption,
         scala.util.Try(BigDecimal(mx)).toOption) }
      if (keys.exists(k => k._1.isEmpty || k._2.isEmpty)) None // NaN etc.
      else Some((triples.minBy(t => BigDecimal(t._1))._1,
                 triples.maxBy(t => BigDecimal(t._2))._2))
    } else Some((triples.map(_._1).min, triples.map(_._2).max))
  }

  /** count(col) — the NON-NULL row count — answered from the per-file
    * `__nulls_<col>` pseudo-stats: Σ(rows) − Σ(nulls), when the snapshot is
    * DV-free (a tombstone could hide either a null or a non-null row) and
    * BOTH stats are recorded in every live file. None otherwise — the
    * caller scans, never serves a guess. */
  def metaNonNullCount(version: Long, column: String): Option[Long] = {
    val v = if (version < 0) resolve() else version
    if (dvsOf(v).nonEmpty) return None
    val fs = filesOf(v)
    if (fs.isEmpty) return Some(0L)
    val stats = statsOf(v)
    val per = fs.map { f =>
      for {
        m <- stats.get(f)
        (rows, _, _) <- m.get(VersionedTable.RowCountStat)
        (nulls, _, _) <- m.get(s"${VersionedTable.NullCountPrefix}$column")
        r <- scala.util.Try(rows.toLong).toOption
        n <- scala.util.Try(nulls.toLong).toOption
      } yield r - n
    }
    if (per.exists(_.isEmpty)) None else Some(per.flatten.sum)
  }

  def rowCountOf(spark: SparkSession, version: Long = -1L): Option[Long] = {
    val v = if (version < 0) resolve() else version
    val stats = statsOf(v)
    val counts = filesOf(v).map(f =>
      stats.get(f).flatMap(_.get(VersionedTable.RowCountStat))
        .flatMap { case (n, _, _) => scala.util.Try(n.toLong).toOption })
    if (counts.exists(_.isEmpty)) None
    else {
      val live = counts.flatten.sum
      val dvs = dvsOf(v)
      val tomb = if (dvs.isEmpty) 0L else dvFrame(spark, dvs).count()
      Some(live - tomb)
    }
  }

  /** `.files` metadata relation (Iceberg's files table, Delta's
    * snapshot.allFiles): one row per LIVE data file of the head snapshot —
    * path, physical size, write-time row count (null where stats were
    * skipped), DV-deleted row count (so `row_count - dv_rows` is the live
    * count), and the hive-rendered partition tuple. Pure manifest + DV
    * sidecar metadata: no data I/O; the DV counts aggregate the sidecars,
    * which are change-sized. */
  def filesMeta(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val v = resolve()
    val stats = statsOf(v)
    val vals = partitionValuesOf(v)
    val dvCounts: Map[String, Long] = dvsOf(v) match {
      case Nil => Map.empty
      case dvs => dvFrame(spark, dvs).groupBy("file").count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    val rows = filesOf(v).map { f =>
      val sz = scala.util.Try(Files.size(Paths.get(root).resolve(f))).getOrElse(0L)
      val rc: java.lang.Long = stats.get(f)
        .flatMap(_.get(VersionedTable.RowCountStat))
        .flatMap(s => scala.util.Try(java.lang.Long.valueOf(s._1)).toOption).orNull
      val part = {
        val m = vals.getOrElse(f, Map.empty)
        if (m.isEmpty) null
        else m.toSeq.sortBy(_._1)
          .map { case (k, ov) => s"$k=${ov.getOrElse("__HIVE_DEFAULT_PARTITION__")}" }
          .mkString("/")
      }
      org.apache.spark.sql.Row(f, sz, rc, dvCounts.getOrElse(f, 0L), part)
    }
    spark.createDataFrame(rows.asJava,
      StructType(Seq(
        StructField("path", StringType, nullable = false),
        StructField("size_bytes", LongType, nullable = false),
        StructField("row_count", LongType),
        StructField("dv_rows", LongType, nullable = false),
        StructField("partition", StringType))))
  }

  /** `.partitions` metadata relation (Iceberg's partitions table):
    * [[showPartitions]]' per-partition file/byte counts plus LIVE row
    * counts — write-time `__rows` minus the partition's DV-deleted rows,
    * and NULL (never a guess) for a partition holding any stats-less
    * file. Same manifest-only cost as showPartitions. */
  def partitionsMeta(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.expr
    val v = resolve()
    val pb = partitionByOf(v)
    require(pb.nonEmpty, s"$root is not partitioned")
    // same refusal as showPartitions: a pre-evolution file has no values
    // for the current spec, and the hive null partition would be a lie
    require(!mixedLayoutOf(v),
      s"$root mixes partition layouts after an ALTER ... SET PARTITIONED BY; " +
        "run OPTIMIZE to rewrite into the current layout first")
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    val vals = partitionValuesOf(v)
    val fm = filesMeta(spark)
    val perFile = fm.withColumn("live_rows",
      expr("row_count - dv_rows"))
    // re-attach the TYPED partition columns from the manifest values
    val withParts = {
      import org.apache.spark.sql.types.{StringType, StructField, StructType}
      val rows = filesOf(v).map { f =>
        val m = vals.getOrElse(f, Map.empty)
        org.apache.spark.sql.Row.fromSeq(f +: pb.map(c => m.getOrElse(c, None).orNull))
      }
      val pdf = spark.createDataFrame(rows.asJava,
        StructType(StructField("__pf", StringType, nullable = false) +:
          pb.map(c => StructField(s"__p_$c", StringType))))
      perFile.join(pdf, perFile("path") === pdf("__pf"))
    }
    withParts
      .groupBy(pb.map(c => col(s"__p_$c").cast(typeOf(c)).as(c)): _*)
      .agg(expr("count(*)").as("num_files"),
        expr("CASE WHEN count(live_rows) = count(*) THEN sum(live_rows) END")
          .as("num_rows"),
        expr("sum(size_bytes)").as("size_bytes"))
      .orderBy(pb.map(col): _*)
  }

  /** `SHOW PARTITIONS` parity: the head snapshot's distinct partition
    * value tuples with live file and row-less byte counts — pure manifest
    * metadata (the partition index IS the manifest), no directory listing
    * or data I/O. Hive's null marker reads back as SQL NULL. */
  def showPartitions(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions.expr
    import org.apache.spark.sql.types.{StringType, StructField, StructType}
    val v = resolve()
    val pb = partitionByOf(v)
    require(pb.nonEmpty, s"$root is not partitioned")
    // a pre-evolution file has no values for the current spec — reporting
    // it under the hive null partition would be a lie; refuse until the
    // table is rewritten into one layout
    require(!mixedLayoutOf(v),
      s"$root mixes partition layouts after an ALTER ... SET PARTITIONED BY; " +
        "run OPTIMIZE to rewrite into the current layout before SHOW PARTITIONS")
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val typeOf = schema.fields.map(f => f.name -> f.dataType).toMap
    val vals = partitionValuesOf(v)
    val rows = filesOf(v).map { f =>
      val m = vals.getOrElse(f, Map.empty)
      val bytes = scala.util.Try(Files.size(Paths.get(root).resolve(f))).getOrElse(0L)
      org.apache.spark.sql.Row.fromSeq(
        pb.map(c => m.getOrElse(c, None).orNull) ++ Seq(1L, bytes))
    }
    val raw = spark.createDataFrame(rows.asJava,
      StructType(pb.map(c => StructField(c, StringType)) ++
        Seq(StructField("__nf", org.apache.spark.sql.types.LongType, nullable = false),
          StructField("__sz", org.apache.spark.sql.types.LongType, nullable = false))))
    raw.groupBy(pb.map(c => col(c).cast(typeOf(c)).as(c)): _*)
      .agg(expr("sum(__nf)").as("num_files"), expr("sum(__sz)").as("size_bytes"))
      .orderBy(pb.map(col): _*)
  }

  /** Incremental consumption of an append-only table: the rows in data files
    * added after `sinceVersion`, found by a manifest file-list diff — zero
    * data I/O to locate them, cost proportional to the NEW data only (unlike
    * [[changes]], which diffs whole snapshots). This is the batch face of a
    * streaming-table source: a consumer remembers the last version it saw
    * and reads forward from there. Only sound when intervening commits were
    * appends; a rewrite (delete/update/merge/compact) re-adds surviving rows
    * in fresh files, so this raises unless every intervening manifest grew
    * strictly (append commits carry every prior file forward). */
  def appendsSince(spark: SparkSession, sinceVersion: Long,
                   toVersion: Option[Long] = None): DataFrame = {
    val head = toVersion.map(v => resolve(None, Some(v))).getOrElse(resolve())
    require(head >= sinceVersion,
      s"toVersion $head precedes sinceVersion $sinceVersion for $root; " +
        "a reversed range would skip the append validation fold entirely")
    val base = filesOf(resolve(None, Some(sinceVersion))).toSet
    val baseDvs = dvsOf(sinceVersion).toSet
    versions().filter(v => v > sinceVersion && v <= head).foldLeft(base) { (prev, v) =>
      val cur = filesOf(v).toSet
      require(prev.subsetOf(cur),
        s"version $v of $root is not an append (it drops files of version ${v - 1}); " +
          "use changes() for row-level diffs across rewrites")
      // a merge-on-read delete keeps every file yet removes rows — the file
      // -list diff would silently miss it, so refuse like any rewrite
      require(dvsOf(v).toSet == baseDvs,
        s"version $v of $root is not an append (its deletion vectors changed); " +
          "use changes() for row-level diffs across rewrites")
      cur
    }
    val fresh = filesOf(head).filterNot(base)
    val schema = schemaOf(head).getOrElse(
      throw new IllegalStateException(s"version $head of $root has no recorded schema"))
    if (fresh.isEmpty)
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      // scanLive re-attaches partition values on a partitioned table (the
      // fresh files don't store those columns); unpartitioned it reduces to
      // the plain manifest-schema'd scan
      scanLive(spark, fresh, Some(schema), Nil, keepPos = false,
        partitionByOf(head), partitionValuesOf(head))
  }

  /** Change data feed between two committed versions (Delta CDF parity,
    * computed rather than stored): the row-level diff of the two snapshots —
    * rows only in `toVersion` are `insert`s, rows only in `fromVersion` are
    * `delete`s, and an update surfaces as its delete+insert pair. Bag
    * semantics via exceptAll, so duplicate rows diff by multiplicity.
    * Columns are aligned by name across additive schema evolution (absent
    * columns read as null). Cost is one anti-diff each way — two shuffles
    * over the two snapshots, right for audit/backfill use; a pipeline that
    * needs per-commit changes continuously at 100 TB should capture them at
    * write time (the touched-file sets delete/update/mergeCow already
    * compute) instead of re-diffing snapshots. */
  def changes(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val from = read(spark, versionAsOf = Some(fromVersion))
    val to = read(spark, versionAsOf = Some(toVersion))
    val cols = (from.columns ++ to.columns.filterNot(from.columns.contains)).toSeq
    // a column may exist on either side only (additive evolution diffed in
    // either direction) — type the null fill from whichever side has it
    val typeOf = (from.schema.fields ++ to.schema.fields).map(f => f.name -> f.dataType).toMap
    def aligned(df: DataFrame): DataFrame = {
      val have = df.columns.toSet
      df.select(cols.map(c =>
        if (have(c)) col(c)
        else lit(null).cast(typeOf(c)).as(c)): _*)
    }
    val a = aligned(from); val b = aligned(to)
    b.exceptAll(a).withColumn("_change_type", lit("insert"))
      .unionByName(a.exceptAll(b).withColumn("_change_type", lit("delete")))
  }

  /** Per-commit change feed over `(fromVersion, toVersion]` (Delta
    * `table_changes` parity, SERVED FROM WRITE-TIME CAPTURE): each step's
    * rows carry `_change_type` ('insert'/'delete'; an update is its
    * delete+insert pair) and `_commit_version`. The cost model is what makes
    * continuous CDC viable at 100 TB:
    *  - rewrites (delete/update/merge/MOR-delete) read the CHANGE ROWS the
    *    writer persisted under `cdf/` — O(changes), zero table I/O;
    *  - appends read exactly the fresh data files (manifest file-list diff)
    *    — O(batch), nothing stored twice;
    *  - compactions and metadata-only commits are skipped outright
    *    (`cdfKind` "none");
    *  - only legacy/overwrite/restore versions (no capture possible) fall
    *    back to the [[changes]] snapshot re-diff, per STEP, so one such
    *    version never forces re-diffing the whole range.
    * Columns align by name across additive schema evolution (absent columns
    * null). Unlike the [[changes]] endpoint diff, intermediate churn is
    * VISIBLE: a row inserted then deleted inside the range appears twice —
    * per-commit semantics, the contract CDC consumers (and Delta CDF) use. */
  def changeFeed(spark: SparkSession, fromVersion: Long, toVersion: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val vs = versions()
    require(vs.contains(fromVersion) && vs.contains(toVersion),
      s"versions $fromVersion/$toVersion not both retained at $root")
    require(toVersion >= fromVersion,
      s"changeFeed range is reversed: ($fromVersion, $toVersion]")
    val steps = vs.filter(v => v > fromVersion && v <= toVersion)
    val headSchema = schemaOf(toVersion).getOrElse(
      throw new IllegalStateException(s"version $toVersion of $root has no recorded schema"))
    val empty = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      headSchema.add("_change_type", org.apache.spark.sql.types.StringType)
        .add("_commit_version", org.apache.spark.sql.types.LongType))
    steps.zip(vs.filter(_ >= fromVersion)).map { case (v, prev) =>
      stepChanges(spark, prev, v).withColumn("_commit_version", lit(v))
    }.foldLeft(empty)((acc, df) => acc.unionByName(df, allowMissingColumns = true))
  }

  /** One version transition's changes, from the cheapest sound source (see
    * [[changeFeed]]). `prev` is the retained version directly before `v`. */
  private def stepChanges(spark: SparkSession, prev: Long, v: Long): DataFrame = {
    import org.apache.spark.sql.functions.lit
    cdfKindOf(v) match {
      case Some("none") =>
        val s = schemaOf(v).getOrElse(throw new IllegalStateException(
          s"version $v of $root has no recorded schema"))
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
          s.add("_change_type", org.apache.spark.sql.types.StringType))
      case Some("append") =>
        val fresh = filesOf(v).filterNot(filesOf(prev).toSet)
        val s = schemaOf(v).getOrElse(throw new IllegalStateException(
          s"version $v of $root has no recorded schema"))
        if (fresh.isEmpty)
          spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
            s.add("_change_type", org.apache.spark.sql.types.StringType))
        else scanLive(spark, fresh, Some(s), Nil, keepPos = false,
          partitionByOf(v), partitionValuesOf(v))
          .withColumn("_change_type", lit("insert"))
      case Some("files") =>
        val fs = cdfFilesOf(v)
        if (fs.isEmpty)
          throw new IllegalStateException(
            s"version $v of $root claims stored CDF but lists no cdf files")
        spark.read.parquet(fs.map(f => Paths.get(root).resolve(f).toString): _*)
      case _ => changes(spark, prev, v)
    }
  }

  /** RESTORE parity: republish `versionAsOf`'s file list (and schema/stats)
    * as a NEW head version — a manifest-level operation, zero data copied,
    * because data files are immutable; the rolled-back-over versions stay
    * time-travelable until vacuumed. Blind-overwrite intent, so a racing
    * commit is resolved by retry at the new head like [[commit]]. */
  def restore(versionAsOf: Long): Long = {
    requireNotAppendOnly("RESTORE") // rolling back erases later rows
    val v = resolve(None, Some(versionAsOf))
    val schemaJson = schemaOf(v).map(_.json).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    // constraints are version-pinned metadata: RESTORE rolls them back with
    // the data (a constraint added after v does not survive the rollback);
    // deletion vectors likewise — the restored head sees v's live rows
    // column ids are pinned to the RESTORED version: auto-derivation would
    // mint a fresh id for a pre-rename name whose files carry the original
    retryPublish(publish(filesOf(v), schemaJson, statsOf(v), None, _,
      constraintsOf(v), dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v),
      columnIdsOverride = Some(columnIdsOf(v)).filter(_.nonEmpty),
      operation = Some("RESTORE")))
  }

  /** `ALTER TABLE RENAME COLUMN` as a metadata-only commit: the logical
    * name changes, the stable column id does not, and by-id reads keep
    * resolving every existing file's physically-old-named column — zero
    * data I/O at any table size. Refused on legacy (id-less) tables, on
    * partition columns (their name lives in hive directory layout and the
    * manifest partition index), and on columns a CHECK constraint
    * references (the stored expression text would silently stop matching).
    * Older files' stats stay keyed by the old name, so stat-pruning on the
    * renamed column skips them conservatively until they are rewritten. */
  def renameColumn(oldName: String, newName: String): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val ids = columnIdsOf(v)
    require(ids.nonEmpty,
      s"$root predates column-id tracking — RENAME COLUMN needs a rewrite here")
    val field = schema.fields.find(_.name == oldName).getOrElse(
      throw new IllegalArgumentException(s"column $oldName does not exist in $root"))
    require(!schema.fieldNames.exists(_.equalsIgnoreCase(newName)),
      s"column $newName already exists in $root")
    require(!partitionByOf(v).contains(oldName),
      s"cannot rename partition column $oldName (hive layout + partition index key)")
    constraintReferencing(v, oldName).foreach(n => throw new IllegalArgumentException(
      s"cannot rename $oldName: CHECK constraint $n references it — drop it first"))
    val renamed = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name == oldName) field.copy(name = newName) else f))
    // renaming the identity column re-points the carried declaration —
    // otherwise every later appendIdentity would look up the stale name
    // and crash, leaving the table un-insertable
    val identityCarry = identityOf(v).map { case (c, hw) =>
      (if (c == oldName) newName else c, hw)
    }
    publish(filesOf(v), renamed.json, statsOf(v), None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(ids - oldName + (newName -> ids(oldName))),
      operation = Some("RENAME COLUMN"), identity = identityCarry)
  }

  /** Declare `colName` (BIGINT) as the table's GENERATED ALWAYS AS
    * IDENTITY column (Delta parity): a metadata commit recording the
    * current max of the column as the allocation high water (one
    * column-pruned scan; 0 on an empty or all-null column). Every
    * subsequent [[appendIdentity]] allocates strictly above the water;
    * explicit writes of the column are refused there. With
    * `allowExplicit = true` the declaration is GENERATED BY DEFAULT
    * instead: explicit values are accepted (per-row — null means
    * "allocate for me") and every publish advances the water past them,
    * so allocation never re-mints a backfilled id. */
  def enableIdentity(spark: SparkSession, colName: String,
      allowExplicit: Boolean = false): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val field = schema.fields.find(_.name == colName).getOrElse(
      throw new IllegalArgumentException(s"column $colName does not exist in $root"))
    require(field.dataType == org.apache.spark.sql.types.LongType,
      s"identity column $colName must be BIGINT, got ${field.dataType.simpleString}")
    val hw: Long = Option(read(spark, versionAsOf = Some(v))
        .agg(org.apache.spark.sql.functions.max(col(colName))).head().get(0))
      .map(_.asInstanceOf[Long]).getOrElse(0L)
    publish(filesOf(v), schema.json, statsOf(v), None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      operation = Some("SET IDENTITY"), identity = Some((colName, hw)),
      identityAllowExplicit = Some(allowExplicit))
  }

  /** Row tracking (Delta's feature by the same name): give every row a
    * STABLE id that survives rewrites, so change-feed consumers can stitch
    * a delete+insert CDF pair back into "this row changed" and downstream
    * incremental jobs can key their state by row, not by value. One
    * backfill rewrite stamps `colName` (default `_row_id`) with contiguous
    * ids in snapshot order, then the column becomes GENERATED ALWAYS AS
    * IDENTITY: later batches allocate through [[appendIdentity]], targeted
    * writes of the column refuse, and every rewrite verb carries the ids
    * as ordinary column data — stability through OPTIMIZE / DELETE /
    * UPDATE / MERGE is the format's existing rewrite contract, not new
    * machinery. The backfill is the one unavoidable O(table) cost (Delta
    * pays the same on `ALTER TABLE ... SET TBLPROPERTIES
    * ('delta.enableRowTracking'='true')` for materialized ids); everything
    * after is O(batch). */
  def enableRowTracking(spark: SparkSession, colName: String = "_row_id"): Long = {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    requireNotAppendOnly("enableRowTracking backfill")
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    require(!schema.fieldNames.contains(colName),
      s"column $colName already exists in $root — pick another row-id name")
    require(identityOf(v).isEmpty,
      s"$root already has an identity column — it IS a row id; " +
        "a second allocated column is not supported")
    val snap = read(spark, versionAsOf = Some(v))
    // deletion vectors are applied by the read, so the backfill rewrite
    // also materializes them — ids are minted for LIVE rows only
    val rdd = snap.rdd.zipWithIndex().map { case (r, i) =>
      org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (i + 1L)) }
    val withIds = spark.createDataFrame(rdd,
      StructType(schema.fields :+ StructField(colName, LongType, nullable = false)))
    commitPinnedAt(withIds, Some(v), partitionBy = partitionByOf(v))
    enableIdentity(spark, colName)
  }

  /** Append with server-side identity allocation: the batch must NOT carry
    * the identity column (GENERATED ALWAYS semantics); ids are assigned as
    * per-partition contiguous ranges starting at highWater+1 — or, for a
    * BY DEFAULT batch carrying explicit ids, above the batch's own maximum
    * too (one count pass + one zip pass — the distributed allocation, no
    * global sort) and
    * the commit records the new water IN THE SAME manifest, so the
    * allocation and its publication are atomic. A racing allocator makes
    * the pinned publish raise; this funnel then re-resolves, re-assigns
    * above the NEW water, and retries — two concurrent appendIdentity
    * calls can never hand out the same id (the spec races them
    * deterministically). Returns (version, firstId, lastId). */
  def appendIdentity(spark: SparkSession, df: DataFrame,
      maxRetries: Int = 10): (Long, Long, Long) = {
    import org.apache.spark.sql.types.StructType
    var attempts = 0
    while (true) {
      val v = resolve()
      val (cName, hw) = identityOf(v).getOrElse(throw new IllegalStateException(
        s"$root has no identity column — call enableIdentity first"))
      val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
        s"version $v of $root has no recorded schema"))
      val suppliedCol = df.columns.find(_.equalsIgnoreCase(cName))
      require(suppliedCol.isEmpty || identityAllowsExplicit(v),
        s"$cName is GENERATED ALWAYS AS IDENTITY on $root and cannot be " +
          "written explicitly — omit it from the batch")
      val others = schema.fields.filterNot(_.name == cName)
      val idField = schema.fields.find(_.name == cName).get
      // persist the batch BEFORE counting/zipping: a non-deterministic
      // source (rand-filtered, stream-fed) must evaluate exactly once so
      // the row/id pairing, the count behind highWater, and the written
      // bytes all describe the SAME rows — and the triple evaluation
      // (zip offsets + count + write) collapses to one source pass.
      // BY DEFAULT tables may carry the column: null = "allocate for me",
      // non-null = backfilled as-is (the publish-side watermark raise
      // keeps later allocation above every backfilled id).
      val pinned = applyGenerated(applyDefaults(df,
          org.apache.spark.sql.types.StructType(others)),
          org.apache.spark.sql.types.StructType(others))
        .select((others.map(f =>
          col(f.name).cast(f.dataType).as(f.name)) :+
          suppliedCol.map(c => col(c))
            .getOrElse(org.apache.spark.sql.functions.lit(null))
            .cast(org.apache.spark.sql.types.LongType).as(cName)).toSeq: _*)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      try {
        // an empty batch is a no-op, not a version (and its zero-row file
        // would carry no identity stats for the publish-side raise to read)
        if (pinned.isEmpty) return (v, hw + 1, hw)
        // BY DEFAULT mixed batches: an explicit id in THIS batch may sit
        // inside hw+1..hw+n, and the publish-side watermark raise only
        // protects LATER batches — allocate above max(hw, batch explicit
        // max) so one call can never mint a duplicate against its own
        // rows. One agg over the already-persisted batch.
        val base: Long =
          if (suppliedCol.isEmpty) hw
          else math.max(hw, Option(pinned
              .agg(org.apache.spark.sql.functions.max(col(cName))).head().get(0))
            .map(_.asInstanceOf[Long]).getOrElse(Long.MinValue))
        val needsAlloc = pinned.filter(col(cName).isNull)
        val n = needsAlloc.count() // materializes the cache before the zip pass
        val rdd = needsAlloc.drop(cName).rdd.zipWithIndex().map { case (r, i) =>
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ (base + 1 + i)) }
        val allocated = spark.createDataFrame(rdd, StructType(others :+ idField))
          .select(schema.fields.map(f => col(f.name)).toSeq: _*)
        val withId = allocated.unionByName(
          pinned.filter(col(cName).isNotNull)
            .select(schema.fields.map(f => col(f.name)).toSeq: _*))
        val pb = partitionByOf(v)
        val (commitId, files, partVals, stamped) = writeDataFiles(withId, None, Nil, pb)
        val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
        val stats = if (files.nonEmpty)
          collectFileStats(spark, commitId, files, partVals, partTypes)
        else Map.empty[String, Map[String, (String, String, String)]]
        val gate = constraintsOf(v) ++ notNullChecks(Some(schema))
        if (pb.isEmpty) validateWritten(spark, files, Some(schema), gate)
        else validateFrame(withId, gate)
        try {
          val published = publish(filesOf(v) ++ files, schema.json, statsOf(v) ++ stats,
            None, Some(v), constraintsOf(v), dvs = dvsOf(v), partitionBy = pb,
            partitions = partitionValuesOf(v) ++ partVals, cdfKind = Some("append"),
            stampedIds = stamped, operation = Some("APPEND"),
            identity = Some((cName, base + n)))
          maybeAutoCheckpoint(spark)
          return (published, base + 1, base + n)
        } catch { case e: ConcurrentCommitException =>
          // a racing commit may have raised the water: re-resolve and
          // re-assign — the already-written files are orphans for vacuum
          attempts += 1
          if (attempts > maxRetries) throw e
        }
      } finally pinned.unpersist()
    }
    throw new IllegalStateException("unreachable")
  }

  /** Source-file identities version `v`'s commit ingested (COPY INTO). */
  def ingestOf(v: Long): Seq[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    if (!node.has("ingest")) Seq.empty
    else node.get("ingest").elements().asScala.map(_.asText()).toSeq
  }

  private def ingestSidecarPath(v: Long): Path =
    logDir.resolve(f"_ingest-v$v%08d.json")
  private def ingestSidecarVersions(): Seq[Long] =
    listNames(logDir)
      .collect { case s if s.matches("_ingest-v\\d{8}\\.json") =>
        s.substring(9, 17).toLong }
      .sorted
  private def sidecarIngest(): Set[String] =
    ingestSidecarVersions().lastOption.map { v =>
      mapper.readTree(Files.readAllBytes(ingestSidecarPath(v)))
        .elements().asScala.map(_.asText()).toSet
    }.getOrElse(Set.empty)

  /** Fold ingest ids of about-to-drop manifests into the CAS-versioned
    * ingest sidecar (same protocol as the txn sidecar): only needed when a
    * vacuum drops manifests NEWER than the latest checkpoint, since a
    * checkpoint already accumulates everything at or below it. */
  private def mergeSidecarIngest(ids: Set[String]): Unit = {
    while (true) {
      val cur = ingestSidecarVersions().lastOption
      val base = sidecarIngest()
      val merged = base ++ ids
      if (merged == base) return
      val arr = mapper.createArrayNode()
      merged.toSeq.sorted.foreach(arr.add)
      val next = cur.map(_ + 1L).getOrElse(0L)
      if (store.putIfAbsent(ingestSidecarPath(next),
          mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(arr))) {
        ingestSidecarVersions().dropRight(3)
          .foreach(v => Files.deleteIfExists(ingestSidecarPath(v)))
        return
      }
    }
  }

  /** Every source-file identity ever ingested, as a one-column DataFrame
    * (`ingest_id`) — the anti-join side of [[copyInto]]. Composition
    * mirrors [[lastTxn]]: the latest checkpoint's accumulated `ingest`
    * rows (distributed parquet, the floor that bounds manifest walking),
    * the post-floor manifests' `ingest` fields, and the vacuum sidecar.
    * At 100 TB the set is millions of ids living in checkpoint parquet —
    * it is never collected; candidates anti-join against it and only the
    * (batch-sized) FRESH list reaches the driver. */
  private def ingestedFrame(spark: SparkSession): DataFrame = {
    import spark.implicits._
    val floorCkpt = checkpointVersions().lastOption
    val floor = floorCkpt.getOrElse(-1L)
    val tail = versions().filter(_ > floor).flatMap(ingestOf) ++ sidecarIngest()
    val tailDf = tail.toDF("ingest_id")
    floorCkpt match {
      case Some(cv) =>
        spark.read.parquet(ckptDataDir(cv).toString)
          .filter(col("kind") === "ingest").select(col("path").as("ingest_id"))
          .union(tailDf)
      case None => tailDf
    }
  }

  /** COPY INTO (Delta/Databricks shape): idempotent, restartable file
    * ingestion — load every file under `srcDir` whose identity
    * (relative name + size + mtime) has NOT been ingested before, as ONE
    * append whose manifest records those identities; re-running after any
    * crash or scheduler retry ingests nothing twice because the memory and
    * the rows commit atomically. A concurrently racing COPY INTO of the
    * same directory makes the pinned publish raise; the funnel re-resolves,
    * re-filters against the winner's freshly recorded identities, and
    * retries — the reference's scheduled-ingestion idiom
    * (`scd2-job-scheduler.yaml` re-runs jobs on a DAG with retries) made
    * exactly-once. A MODIFIED file (same name, new size/mtime) is a new
    * identity and re-ingests. Returns (version, filesIngested). */
  /** Width threshold for distributing the COPY INTO listing: below this
    * many first-level subtrees the driver walk wins (task-launch overhead
    * ~ms/dir dominates small trees; the crossover sits around 10⁵ files —
    * a 32-subtree × ~3k-file zone walks in well under a second either
    * way, while a 10⁶-file zone is ~8× faster listed in parallel tasks and
    * never holds the full identity list on the driver). */
  private val ParallelListMinDirs = 8

  /** (ingest_id, src) for every candidate file under `srcRoot` — the
    * identity is `relPath:size:mtimeMillis`, the same string the ingest
    * memory records. Wide trees (≥ [[ParallelListMinDirs]] first-level
    * dirs) list each subtree in its own task and the frame STAYS
    * distributed; the driver only ever lists the first level. */
  private def copyCandidateFrame(spark: SparkSession,
      srcRoot: Path): DataFrame = {
    import scala.jdk.CollectionConverters._
    import spark.implicits._
    def keep(p: Path): Boolean = {
      val n = p.getFileName.toString
      Files.isRegularFile(p) && !n.startsWith("_") && !n.startsWith(".")
    }
    def walkLocal(p: Path): Seq[(String, String)] = {
      val s = Files.walk(p)
      try s.iterator().asScala.filter(keep).map { q =>
        val rel = srcRoot.relativize(q).toString
        (s"$rel:${Files.size(q)}:${Files.getLastModifiedTime(q).toMillis}",
          q.toString)
      }.toSeq
      finally s.close()
    }
    val first = Files.list(srcRoot)
    val (dirs, topFiles) =
      try first.iterator().asScala.toSeq.partition(Files.isDirectory(_))
      finally first.close()
    if (dirs.length < ParallelListMinDirs)
      walkLocal(srcRoot).toDF("ingest_id", "src")
    else {
      val rootStr = srcRoot.toString
      val topRows = topFiles.filter(keep).map { q =>
        val rel = srcRoot.relativize(q).toString
        (s"$rel:${Files.size(q)}:${Files.getLastModifiedTime(q).toMillis}",
          q.toString)
      }
      val sub = spark.sparkContext
        .parallelize(dirs.map(_.toString),
          math.min(dirs.length, spark.sparkContext.defaultParallelism))
        .flatMap { d =>
          // executor-side: rebuild paths from strings (Path is not
          // serializable); identities relativize against the SAME root
          val root = java.nio.file.Paths.get(rootStr)
          val s = java.nio.file.Files.walk(java.nio.file.Paths.get(d))
          try s.iterator().asScala.filter { q =>
            val n = q.getFileName.toString
            java.nio.file.Files.isRegularFile(q) &&
              !n.startsWith("_") && !n.startsWith(".")
          }.map { q =>
            val rel = root.relativize(q).toString
            (s"$rel:${java.nio.file.Files.size(q)}:" +
              java.nio.file.Files.getLastModifiedTime(q).toMillis,
              q.toString)
          }.toList
          finally s.close()
        }
      sub.toDF("ingest_id", "src")
        .union(topRows.toDF("ingest_id", "src"))
    }
  }

  def copyInto(spark: SparkSession, srcDir: String,
      format: String = "parquet", maxRetries: Int = 10): (Long, Long) = {
    import scala.jdk.CollectionConverters._
    val srcRoot = Paths.get(srcDir).toAbsolutePath
    require(Files.isDirectory(srcRoot), s"COPY INTO source $srcDir is not a directory")
    var attempts = 0
    while (true) {
      val v = resolve()
      val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
        s"version $v of $root has no recorded schema — COPY INTO needs one"))
      // a GENERATED ALWAYS identity table's ids are allocated at the commit
      // point; a blind file load would land nulls (or worse, the source's
      // own ids) in the column. BY DEFAULT tables accept the files' ids
      // as-is (the publish watermark raise keeps allocation above them).
      identityOf(v).filterNot(_ => identityAllowsExplicit(v)).foreach {
        case (c, _) => throw new IllegalStateException(
          s"COPY INTO $root is not supported: $c is GENERATED ALWAYS AS " +
            "IDENTITY — read the files and appendIdentity instead") }
      // candidate identities as a FRAME: only the driver lists the FIRST
      // level; when the landing zone is wide (≥ parallelListMinDirs
      // subtrees), each subtree lists in its own task, so a multi-million-
      // file tree never funnels through one driver thread or materializes
      // its full identity list in driver memory — only the FRESH batch
      // (post anti-join, bounded by what actually landed since the last
      // run) is ever collected
      val candDf = copyCandidateFrame(spark, srcRoot)
      val fresh = candDf
        .join(ingestedFrame(spark), Seq("ingest_id"), "left_anti")
        .collect().map(r => (r.getString(0), r.getString(1))).sortBy(_._1)
      if (fresh.isEmpty) return (v, 0L)
      // type-pin to the table schema by name — a source missing a table
      // column fails here, extra source columns are dropped. The recorded
      // schema's field-id metadata must NOT reach the source read: external
      // files carry no graft ids and the parquet reader would demand them.
      val readSchema = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
        f.copy(metadata = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata).remove(VersionedTable.FieldIdKey).build())))
      // column DEFAULTs (insert-funnel parity): a defaulted table column
      // ABSENT from the source files' own merged schema is an OMISSION and
      // fills with its default; a column the files carry keeps its values
      // (explicit nulls are data, not omissions — the schema'd read above
      // cannot tell the two apart, so the files' real schema decides).
      // Omission is decided from the BATCH-WIDE merged schema: in a mixed
      // batch where only some files carry the column, the carrying files
      // win and the others' rows read null (per-batch granularity — split
      // mixed landings into separate COPY INTO runs for per-file fill).
      // Named-column formats only: CSV columns are positional. An inference
      // failure FAILS the copy rather than silently skipping the fill —
      // "defaults quietly became null" is a data hole, not a fallback.
      val defaultFills: Seq[org.apache.spark.sql.types.StructField] =
        if (!schema.fields.exists(_.metadata.contains(VersionedTable.CurrentDefaultKey)) ||
            !Set("parquet", "orc", "json").contains(format.toLowerCase)) Nil
        else {
          val srcCols =
            try spark.read.format(format).option("mergeSchema", "true")
              .load(fresh.map(_._2): _*).schema.fieldNames.map(_.toLowerCase).toSet
            catch { case e: Exception => throw new IllegalStateException(
              s"COPY INTO $root: could not infer the source files' own " +
                "schema to decide DEFAULT-column omission (the table " +
                "declares column defaults); fix or exclude the unreadable " +
                s"files — proceeding would silently null-fill: ${e.getMessage}", e)
            }
          schema.fields.toSeq.filter(f =>
            f.metadata.contains(VersionedTable.CurrentDefaultKey) &&
              !srcCols.contains(f.name.toLowerCase))
        }
      val batch = defaultFills.foldLeft(applyGenerated(
          spark.read.format(format).schema(readSchema).load(fresh.map(_._2): _*),
          schema)
        .select(schema.fields.map(f => col(f.name).cast(f.dataType).as(f.name)).toSeq: _*)) {
        (d, f) => d.withColumn(f.name, org.apache.spark.sql.functions
          .expr(f.metadata.getString(VersionedTable.CurrentDefaultKey))
          .cast(f.dataType))
      }
      // BY DEFAULT identity: the files must SUPPLY every id — a missing
      // column reads as all-null here, and unlike the insert funnel
      // (appendIdentity: null = allocate) nothing in this path allocates,
      // so silent NULL ids would land permanently
      identityOf(v).filter(_ => identityAllowsExplicit(v)).foreach { case (c, _) =>
        require(batch.filter(col(c).isNull).isEmpty,
          s"COPY INTO $root: the source files must supply $c (GENERATED BY " +
            "DEFAULT identity) for every row — null or missing ids are " +
            "never allocated on this path; read the files and " +
            "appendIdentity for allocation")
      }
      val pb = partitionByOf(v)
      val (commitId, files, partVals, stamped) = writeDataFiles(batch, None, Nil, pb)
      val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
      val stats = if (files.nonEmpty)
        collectFileStats(spark, commitId, files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
      val gate = constraintsOf(v) ++ notNullChecks(Some(schema))
      if (pb.isEmpty) validateWritten(spark, files, Some(schema), gate)
      else validateFrame(batch, gate)
      try {
        val published = publish(filesOf(v) ++ files, schema.json, statsOf(v) ++ stats,
          None, Some(v), constraintsOf(v), dvs = dvsOf(v), partitionBy = pb,
          partitions = partitionValuesOf(v) ++ partVals, cdfKind = Some("append"),
          stampedIds = stamped, operation = Some("COPY INTO"),
          ingest = fresh.map(_._1).toSeq)
        maybeAutoCheckpoint(spark)
        return (published, fresh.length.toLong)
      } catch { case e: ConcurrentCommitException =>
        // a racing COPY INTO may have ingested part of this batch: re-filter
        // against the new head (orphaned files go to vacuum)
        attempts += 1
        if (attempts > maxRetries) throw e
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** `ALTER TABLE ALTER COLUMN ... TYPE <wider>` as a METADATA-ONLY commit
    * (Delta's type-widening feature): the recorded schema changes, no file
    * rewrites — Spark 4's parquet reader materializes the stored narrower
    * physical type into the wider read schema (TypeWideningSpec proves each
    * transition against real files). Only provably lossless widenings are
    * accepted: byte→short→int→long, float→double, int→double, and
    * decimal precision growth at equal scale. Stats survive: numeric
    * min/max strings compare identically under the wider type. Anything
    * else (narrowing, string↔numeric, scale changes) refuses — that is a
    * rewrite, not an ALTER. */
  def alterColumnType(name: String,
      newType: org.apache.spark.sql.types.DataType): Long = {
    import org.apache.spark.sql.types._
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val field = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name does not exist in $root"))
    def widens(from: DataType, to: DataType): Boolean = (from, to) match {
      case (a, b) if a == b => true
      case (ByteType, ShortType | IntegerType | LongType) => true
      case (ShortType, IntegerType | LongType) => true
      case (IntegerType, LongType | DoubleType) => true
      case (FloatType, DoubleType) => true
      case (a: DecimalType, b: DecimalType) =>
        b.scale == a.scale && b.precision >= a.precision
      case _ => false
    }
    require(widens(field.dataType, newType),
      s"ALTER COLUMN $name TYPE ${newType.simpleString}: only lossless " +
        s"widenings are metadata-only (from ${field.dataType.simpleString}); " +
        "anything else needs a rewrite")
    require(!partitionByOf(v).contains(name),
      s"cannot change the type of partition column $name")
    constraintReferencing(v, name).foreach(n => throw new IllegalArgumentException(
      s"cannot retype $name: CHECK constraint $n references it — drop it first"))
    // Bloom sidecars are probed with xxhash64 over the SCHEMA type, and
    // Spark's hash of (say) 5 as INT differs from 5 as BIGINT — probes
    // against pre-widen sidecars would wrongly report "absent" and prune
    // live files. Dropping the column from bloomIndexColumns makes every
    // probe AND build path skip it (conservative: range/checkpoint pruning
    // remain); re-enabling needs a rewrite so all sidecars hash one type.
    if (bloomIndexColumns.contains(name)) {
      val remaining = bloomIndexColumns.filterNot(_ == name)
      setProperties(Map("bloomIndexColumns" ->
        (if (remaining.isEmpty) null else remaining.mkString(","))))
    }
    val updated = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name == name) f.copy(dataType = newType) else f))
    // float→double: stored min/max strings were rendered FROM floats, and
    // their double-parse can sit below the exact widened value
    // (double("0.1") = 0.1 < (double)0.1f ≈ 0.10000000149) — a predicate
    // falling in that gap would wrongly prune a file containing matches.
    // Parse each stat back as float (float→string round-trips), widen to
    // double EXACTLY (monotonic, so per-file min/max carry over), re-render.
    val carriedStats =
      if (field.dataType == FloatType && newType == DoubleType)
        statsOf(v).map { case (f, cols) =>
          f -> cols.map { case (c, (mn, mx, kind)) =>
            if (c == name) {
              def rewiden(s: String): String =
                scala.util.Try(s.toFloat.toDouble.toString).getOrElse(s)
              c -> (rewiden(mn), rewiden(mx), kind)
            } else c -> (mn, mx, kind)
          }
        }
      else statsOf(v)
    publish(filesOf(v), updated.json, carriedStats, None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      operation = Some("ALTER COLUMN TYPE"))
  }

  /** `ALTER TABLE ALTER COLUMN ... SET / DROP NOT NULL` (Delta parity).
    * DROP NOT NULL is metadata-only: the field republishes nullable.
    * SET NOT NULL first proves the LIVE rows (one null-count scan of the
    * current snapshot, DVs applied) contain no null — the same
    * validate-then-tighten contract [[addConstraint]] follows — then
    * republishes the field non-nullable; every later write is gated by
    * the implicit NOT NULL check. */
  def setColumnNullability(spark: SparkSession, name: String,
      nullable: Boolean): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    require(schema.fields.exists(_.name == name),
      s"column $name does not exist in $root")
    if (!nullable)
      validateFrame(read(spark, versionAsOf = Some(v)),
        Map(s"NOT NULL `$name`" -> s"`$name` IS NOT NULL"))
    val updated = org.apache.spark.sql.types.StructType(schema.fields.map(f =>
      if (f.name == name) f.copy(nullable = nullable) else f))
    publish(filesOf(v), updated.json, statsOf(v), None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      operation = Some(if (nullable) "DROP NOT NULL" else "SET NOT NULL"))
  }

  /** Column DEFAULT values (`ALTER TABLE ... ALTER COLUMN c SET DEFAULT
    * expr`, Delta's `allowColumnDefaults` feature): a writer that OMITS
    * the column gets `expr` computed at write time; a supplied value wins;
    * existing rows are untouched — no existence-default backfill, old
    * files still read an evolution-added column as null (Delta's exact
    * contract, which refuses `ADD COLUMN ... DEFAULT` for that reason).
    * The expression is recorded under Spark's own `CURRENT_DEFAULT`
    * schema-metadata key, so the DSv2 face reports it to DESCRIBE and the
    * INSERT analyzer resolves `DEFAULT`/omitted columns natively.
    * `sqlText = None` is DROP DEFAULT. Metadata-only commit. */
  def setColumnDefault(spark: SparkSession, name: String,
      sqlText: Option[String]): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val field = schema.fields.find(_.name == name).getOrElse(
      throw new IllegalArgumentException(s"column $name does not exist in $root"))
    require(!generatedExprsOf(schema).exists(_._1 == name),
      s"$name is a GENERATED column of $root — always computed, a DEFAULT " +
        "could never apply")
    require(!identityOf(v).exists(_._1 == name),
      s"$name is the IDENTITY column of $root — allocation is its default")
    sqlText.foreach { g =>
      // a DEFAULT is a constant expression of the column's type: no column
      // references (SQL standard), and it must evaluate + cast — proven
      // once here against a unit relation so a bad DDL fails at ALTER
      // time, not at the first insert
      val cols = spark.sessionState.sqlParser.parseExpression(g).collect {
        case ua: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          ua.nameParts.mkString(".")
      }
      require(cols.isEmpty,
        s"DEFAULT for $name must not reference columns, got: ${cols.mkString(", ")}")
      spark.range(1)
        .select(org.apache.spark.sql.functions.expr(g).cast(field.dataType))
        .head()
    }
    val updated = org.apache.spark.sql.types.StructType(schema.fields.map { f =>
      if (f.name != name) f
      else {
        val mb = new org.apache.spark.sql.types.MetadataBuilder()
          .withMetadata(f.metadata)
        sqlText match {
          case Some(g) => f.copy(metadata =
            mb.putString(VersionedTable.CurrentDefaultKey, g).build())
          case None => f.copy(metadata =
            mb.remove(VersionedTable.CurrentDefaultKey).build())
        }
      }
    })
    publish(filesOf(v), updated.json, statsOf(v), None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(columnIdsOf(v)),
      operation = Some(if (sqlText.isDefined) "SET DEFAULT" else "DROP DEFAULT"))
  }

  /** `ALTER TABLE DROP COLUMN` as a metadata-only commit: the column
    * leaves the logical schema; existing files keep the physical bytes as
    * dead weight until a rewrite (Delta's shape). The id is retired and
    * NEVER reused — re-adding the same name mints a fresh id, so by-id
    * reads resolve the re-added column to null on old files instead of
    * resurrecting dropped data. Same refusals as [[renameColumn]]. */
  def dropColumn(name: String): Long = {
    val v = resolve()
    val schema = schemaOf(v).getOrElse(throw new IllegalStateException(
      s"version $v of $root has no recorded schema"))
    val ids = columnIdsOf(v)
    require(ids.nonEmpty,
      s"$root predates column-id tracking — DROP COLUMN needs a rewrite here")
    require(schema.fieldNames.contains(name),
      s"column $name does not exist in $root")
    require(schema.fields.length > 1, s"cannot drop the only column of $root")
    require(!partitionByOf(v).contains(name),
      s"cannot drop partition column $name (hive layout + partition index key)")
    require(!identityOf(v).exists(_._1 == name),
      s"cannot drop $name: it is the GENERATED ALWAYS AS IDENTITY column " +
        s"of $root — the carried declaration would dangle and every later " +
        "insert would crash")
    constraintReferencing(v, name).foreach(n => throw new IllegalArgumentException(
      s"cannot drop $name: CHECK constraint $n references it — drop it first"))
    val remaining = org.apache.spark.sql.types.StructType(
      schema.fields.filterNot(_.name == name))
    publish(filesOf(v), remaining.json, statsOf(v).map { case (f, cols) =>
      f -> (cols - name) }, None, Some(v), constraintsOf(v),
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      columnIdsOverride = Some(ids - name),
      operation = Some("DROP COLUMN"))
  }

  /** Name of a CHECK constraint whose expression mentions `column` as a
    * word (conservative textual check — a false positive merely asks the
    * user to drop/re-add the constraint). */
  private def constraintReferencing(v: Long, column: String): Option[String] = {
    val p = java.util.regex.Pattern.compile(
      "(?i)\\b" + java.util.regex.Pattern.quote(column) + "\\b")
    constraintsOf(v).collectFirst { case (n, e) if p.matcher(e).find() => n }
  }

  /** ALTER TABLE ADD CONSTRAINT parity: register a named CHECK expression
    * every row must satisfy (Delta semantics: NULL violates — see
    * [[validateWritten]]). The EXISTING snapshot is proven against the new
    * constraint first (one scan; any violating row rejects the ALTER with a
    * per-constraint count), so "all live data satisfies all live
    * constraints" is an invariant every later write can rely on — appends,
    * merges and updates then only ever scan their own batch. Publishes a
    * metadata-only version pinned to the snapshot proven: a concurrent
    * write raises [[ConcurrentCommitException]] rather than slipping
    * unvalidated rows past the ALTER. */
  def addConstraint(spark: SparkSession, name: String, expression: String): Long = {
    require(name.nonEmpty && expression.trim.nonEmpty,
      "constraint needs a name and a non-empty expression")
    val v = resolve()
    val existing = constraintsOf(v)
    require(!existing.contains(name), s"constraint $name already exists at $root")
    val schemaJson = schemaOf(v).map(_.json).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    // prove the constraint against LIVE rows: a violating row that a DV
    // already deleted must not reject the ALTER
    validateFrame(read(spark, versionAsOf = Some(v)), Map(name -> expression))
    publish(filesOf(v), schemaJson, statsOf(v), None, Some(v),
      existing + (name -> expression), dvs = dvsOf(v),
      partitionBy = partitionByOf(v), partitions = partitionValuesOf(v),
      cdfKind = Some("none"), operation = Some("ADD CONSTRAINT"))
  }

  /** ALTER TABLE DROP CONSTRAINT parity: metadata-only version without the
    * named constraint (idempotent error if absent — a typo should not
    * silently "succeed"). */
  def dropConstraint(name: String): Long = {
    val v = resolve()
    val existing = constraintsOf(v)
    require(existing.contains(name), s"constraint $name does not exist at $root")
    val schemaJson = schemaOf(v).map(_.json).getOrElse(
      throw new IllegalStateException(s"version $v of $root has no recorded schema"))
    publish(filesOf(v), schemaJson, statsOf(v), None, Some(v), existing - name,
      dvs = dvsOf(v), partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v), cdfKind = Some("none"),
      operation = Some("DROP CONSTRAINT"))
  }

  /** Vacuum: physically delete data files not referenced by the newest
    * `retainVersions` manifests, and drop the older manifests. Time travel
    * before the retention window stops working (as with any lakehouse
    * vacuum); the retained window is untouched. Returns deleted file count.
    *
    * Also sweeps ORPHANS: files referenced by NO manifest at all — the
    * residue of a rejected batch (constraint violation) or a lost publish
    * race, whose writer never linked a manifest. Orphans are only removed
    * once older than `orphanRetentionMs` (default 7 days), so a concurrent
    * writer's freshly written, not-yet-published files are never swept out
    * from under its commit — the same age-guard Delta's VACUUM uses. */
  /** Hours-based VACUUM (the lake-operations idiom, and Delta's default
    * spelling): sweep versions whose manifest is older than `retainHours`,
    * keeping AT LEAST the head — the current snapshot is never swept no
    * matter how small the window. Retention below the 168-hour safety
    * floor (Delta's default) is refused unless `force` — a `RETAIN 0
    * HOURS` typo would otherwise destroy every reader's time travel and
    * any in-flight query's snapshot. Granularity is the version: a version
    * inside the window keeps all its files. */
  /** Hours-based retention → version count, with the 168 h safety floor
    * (`force` overrides). Commit order is time order (the in-commit stamp
    * is monotonic by construction), so the retained set is a suffix; an
    * unreadable commit time counts as recent (never sweep on missing
    * evidence). */
  private[table] def retainCountForHours(retainHours: Double,
      force: Boolean): Int = {
    require(retainHours >= 0, "retention hours must be non-negative")
    require(force || retainHours >= 168,
      s"retaining $retainHours h is below the 168 h safety floor; " +
        "pass force=true (SQL: VACUUM ... FORCE) to override")
    val vs = versions()
    val cutoff = System.currentTimeMillis() - (retainHours * 3600 * 1000).toLong
    math.max(1, vs.count { v =>
      scala.util.Try(commitTimeOf(v)).toOption.forall(_ >= cutoff)
    })
  }

  /** FSCK: reconcile the head manifest with PHYSICAL storage (Delta's
    * `FSCK REPAIR TABLE`) — the verb for the day an ops incident deleted
    * data files out from under the log. Lists the head's referenced files
    * that no longer exist; unless `dryRun`, publishes one new version
    * referencing only the surviving files (their stats, partition values,
    * column ids, identity state carried verbatim) so reads stop failing —
    * the lost rows are gone either way, FSCK makes the loss EXPLICIT and
    * bounded instead of a scan-time crash. A missing DELETION VECTOR
    * refuses outright: its content (which rows of which files were
    * deleted) is unrecoverable, so dropping it would RESURRECT deleted
    * rows — restore to an intact version instead. Earlier versions are
    * untouched (still time-travelable until vacuum, still broken if they
    * reference the lost file — FSCK repairs the head, not history).
    * CDF of the repair is the conservative "unknown" kind (a file loss is
    * not a row-level change the feed can represent; readers re-diff).
    * Metadata-plane only: one existence check per referenced file, no data
    * I/O. Pinned publish — a concurrent writer surfaces as a commit
    * conflict, never a lost update. Returns (missingFiles, newVersion). */
  def fsck(dryRun: Boolean = false): (Seq[String], Option[Long]) = {
    val v = resolve()
    val missingDvs = dvsOf(v).filterNot(d => Files.exists(Paths.get(root).resolve(d)))
    require(missingDvs.isEmpty,
      s"deletion vector(s) ${missingDvs.mkString(", ")} are missing: their " +
        "row-level content is unrecoverable and dropping them would " +
        "RESURRECT deleted rows — RESTORE to an intact version instead")
    val missing = filesOf(v).filterNot(f => Files.exists(Paths.get(root).resolve(f)))
    if (missing.isEmpty || dryRun) return (missing, None)
    val gone = missing.toSet
    val kept = filesOf(v).filterNot(gone)
    val nv = publish(kept,
      schemaOf(v).map(_.json).getOrElse(throw new IllegalStateException(
        s"version $v of $root has no recorded schema")),
      statsOf(v).view.filterKeys(!gone(_)).toMap, txn = None, base = Some(v),
      constraints = constraintsOf(v), dvs = dvsOf(v),
      partitionBy = partitionByOf(v),
      partitions = partitionValuesOf(v).view.filterKeys(!gone(_)).toMap,
      columnIdsOverride = Some(columnIdsOf(v)),
      maxColumnIdFloor = maxColumnIdOf(v),
      operation = Some("FSCK"),
      identity = identityOf(v),
      identityAllowExplicit = Some(identityAllowsExplicit(v)))
    (missing, Some(nv))
  }

  def vacuumHours(retainHours: Double, force: Boolean = false,
                  orphanRetentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    if (versions().isEmpty) {
      retainCountForHours(retainHours, force) // still validate the args
      return 0
    }
    vacuum(retainVersions = retainCountForHours(retainHours, force),
      orphanRetentionMs = orphanRetentionMs)
  }

  /** What [[vacuum]] would delete right now — the dropped manifests'
    * no-longer-referenced data/DV/CDF files plus age-expired orphans —
    * WITHOUT deleting anything (Delta's `VACUUM ... DRY RUN`): the
    * operational "how much am I about to reclaim, and is anything
    * unexpected in the list" check before an irreversible sweep. */
  def vacuumDryRun(retainVersions: Int = 2,
      orphanRetentionMs: Long = 7L * 24 * 3600 * 1000): Seq[String] = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val vs = versions()
    if (vs.isEmpty) return Nil
    val retained = vs.takeRight(retainVersions)
    val dropped = vs.dropRight(retainVersions)
    val keep = retained.flatMap(retainedStateRefs).toSet
    val fromDropped = dropped.flatMap(v => tryStateRefs(v).getOrElse(Nil))
      .distinct.filterNot(keep)
    // orphans: on disk, referenced by NO manifest, past the age guard —
    // retained refs are strict here too (a lenient Nil would report live
    // files as deletable orphans)
    val live = dropped.flatMap(v => tryStateRefs(v).getOrElse(Nil)).toSet ++ keep
    val cutoff = System.currentTimeMillis() - orphanRetentionMs
    val orphans = scala.collection.mutable.ArrayBuffer.empty[String]
    def walk(prefix: String, dir: Path): Unit =
      listNames(dir).foreach { n =>
        val p = dir.resolve(n)
        val rel = s"$prefix/$n"
        if (Files.isDirectory(p)) walk(rel, p)
        else {
          val old = scala.util.Try(Files.getLastModifiedTime(p).toMillis)
            .toOption.exists(_ < cutoff)
          if (!live.contains(rel) && old) orphans += rel
        }
      }
    Seq("data" -> dataDir, "dv" -> dvDir, "cdf" -> cdfDir).foreach {
      case (prefix, base) => if (Files.isDirectory(base)) walk(prefix, base)
    }
    (fromDropped ++ orphans).sorted
  }

  /** A manifest can vanish mid-run when another vacuum races this one;
    * that is safe to skip — the racing vacuum folded its txn marks into
    * the sidecar before deleting it, and already handled its files. */
  private def tryManifest(v: Long): Option[com.fasterxml.jackson.databind.JsonNode] =
    try Some(mapper.readTree(Files.readAllBytes(manifestPath(v))))
    catch { case _: java.nio.file.NoSuchFileException => None }

  /** Every table-relative file version `v` references: its reconstructed
    * live data + DV state plus its own commit's CDF payload. None when a
    * racing vacuum removed the manifests mid-walk (safe to skip: the racing
    * vacuum already handled that version's files). */
  private def tryStateRefs(v: Long): Option[Seq[String]] =
    try {
      val st = stateOf(v)
      Some(st.files ++ st.dvs ++ cdfFilesOf(v))
    } catch { case _: java.nio.file.NoSuchFileException => None }

  /** [[tryStateRefs]] for a RETAINED version, where the lenient Nil would
    * be catastrophic: a retained version whose state cannot be
    * reconstructed (delta-chain anchor lost to a racing deeper-retention
    * vacuum, a missing materialization) would contribute an EMPTY
    * protection set, making its live data files deletable by the
    * dropped-refs loop and the orphan sweep — silent data loss inside a
    * destructive operation. Abort the vacuum instead; the Nil leniency is
    * reserved for DROPPED versions, whose files a racing vacuum already
    * handled. */
  private def retainedStateRefs(v: Long): Seq[String] =
    tryStateRefs(v).getOrElse(throw new IllegalStateException(
      s"vacuum aborted: retained version $v of $root could not be " +
        "reconstructed (its manifest or a delta-chain anchor is missing — " +
        "e.g. a racing vacuum with a smaller retention); nothing in the " +
        "keep-set phase was deleted — retry once the race settles"))

  /** Rewrite version `v`'s manifest as a SELF-CONTAINED snapshot (same
    * state, same metadata, full file lists instead of the delta) — run on
    * the retention floor before a vacuum drops the older manifests the
    * delta would otherwise replay through. Content-preserving, so a reader
    * racing the swap sees identical state either way; the cache fingerprint
    * notices the replaced file and re-parses. */
  private def materializeManifest(v: Long): Unit = {
    val nodeOpt = tryManifest(v)
    if (nodeOpt.isEmpty || isFullManifest(nodeOpt.get)) return
    val st = try stateOf(v)
      catch { case _: java.nio.file.NoSuchFileException => return }
    val node = nodeOpt.get.asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    Seq("delta", "anchor", "remove", "add", "dvAdd", "dvRemove").foreach(node.remove)
    node.put("formatVersion", ManifestFormatFull)
    writeStateFields(node, st)
    val tmp = logDir.resolve(
      s".tmp-materialize-v$v-${java.util.UUID.randomUUID().toString}")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    Files.move(tmp, manifestPath(v),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  def vacuum(retainVersions: Int = 2,
             orphanRetentionMs: Long = 7L * 24 * 3600 * 1000): Int = {
    require(retainVersions >= 1, "must retain at least the latest version")
    val vs = versions()
    if (vs.isEmpty) return 0
    val retained = vs.takeRight(retainVersions)
    val dropped = vs.dropRight(retainVersions)
    // the retention floor must stay reconstructable after the manifests
    // below it vanish: materialize it into a self-contained snapshot first
    if (dropped.nonEmpty) materializeManifest(retained.head)
    // reference lists are reconstructed BEFORE any manifest is deleted (a
    // dropped delta's state replays through manifests this loop removes)
    val droppedRefs: Seq[(Long, Seq[String])] =
      dropped.map(v => v -> tryStateRefs(v).getOrElse(Nil))
    // preserve idempotent-writer memory: fold the dropped manifests' txn
    // marks into the sidecar BEFORE deleting them, so lastTxn never forgets
    val droppedTxns = dropped.flatMap(tryManifest).flatMap { node =>
      if (node.has("txnApp")) Some(node.get("txnApp").asText() -> node.get("txnVersion").asLong())
      else None
    }
    if (droppedTxns.nonEmpty)
      mergeSidecarTxns(droppedTxns.groupBy(_._1).view.mapValues(_.map(_._2).max).toMap)
    // COPY INTO memory: ingest ids recorded only in manifests ABOVE the
    // latest checkpoint would be forgotten by dropping them — fold those
    // into the ingest sidecar first (ids at or below a checkpoint are
    // already accumulated in its parquet)
    val ckptFloor = checkpointVersions().lastOption.getOrElse(-1L)
    val droppedIngest = dropped.filter(_ > ckptFloor)
      .flatMap(v => tryManifest(v).toSeq.flatMap { node =>
        if (node.has("ingest"))
          node.get("ingest").elements().asScala.map(_.asText()).toSeq
        else Seq.empty
      }).toSet
    if (droppedIngest.nonEmpty) mergeSidecarIngest(droppedIngest)
    // data files AND deletion-vector files referenced by any retained
    // manifest stay; everything else the dropped manifests reference goes.
    // Strict for retained versions — a reconstruction failure here ABORTS
    // before anything is deleted (see retainedStateRefs); up to this point
    // the vacuum has only materialized the floor (content-preserving) and
    // folded sidecar memory (idempotent), both safe to leave behind.
    val keep = retained.flatMap(retainedStateRefs).toSet
    var deleted = 0
    droppedRefs.foreach { case (v, refs) =>
      refs.foreach { f =>
        if (!keep.contains(f)) {
          if (Files.deleteIfExists(Paths.get(root).resolve(f))) deleted += 1
        }
      }
      Files.deleteIfExists(manifestPath(v))
    }
    // orphan sweep: on-disk files referenced by NO remaining manifest (a
    // rejected batch or lost publish race) go once past the age guard.
    // Strict again: every surviving version is retained, and a lenient Nil
    // would expose a live-but-old data file to the sweep below; aborting
    // here merely skips the orphan sweep — the retention drop above is done
    val live = versions().flatMap(retainedStateRefs).toSet
    val cutoff = System.currentTimeMillis() - orphanRetentionMs
    // recursive: hive-partitioned commits nest k=v dirs under the commit dir
    def sweepOrphans(prefix: String, dir: Path): Unit =
      listNames(dir).foreach { n =>
        val p = dir.resolve(n)
        val rel = s"$prefix/$n"
        if (Files.isDirectory(p)) sweepOrphans(rel, p)
        else {
          // a racing vacuum may delete p between listNames and the mtime
          // read — tolerate the vanish like tryManifest does
          val old = scala.util.Try(Files.getLastModifiedTime(p).toMillis)
            .toOption.exists(_ < cutoff)
          if (!live.contains(rel) && old) {
            if (Files.deleteIfExists(p)) deleted += 1
          }
        }
      }
    Seq("data" -> dataDir, "dv" -> dvDir, "cdf" -> cdfDir).foreach { case (prefix, base) =>
      if (Files.isDirectory(base)) sweepOrphans(prefix, base)
    }
    // sweep now-empty dirs bottom-up (partition subdirs before commit dirs).
    // Same age guard as the orphan sweep: a CONCURRENT writer's in-progress
    // commit dir (created empty — e.g. the committer's _temporary staging
    // dir — moments before its tasks write into it) must not be swept out
    // from under the write; only dirs old enough that no live writer can
    // still be filling them go.
    def sweepEmpty(dir: Path): Unit = {
      listNames(dir).foreach { n =>
        val p = dir.resolve(n)
        if (Files.isDirectory(p)) {
          sweepEmpty(p)
          val old = scala.util.Try(Files.getLastModifiedTime(p).toMillis)
            .toOption.exists(_ < cutoff)
          if (old && listNames(p).isEmpty) Files.deleteIfExists(p)
        }
      }
    }
    Seq(dataDir, dvDir, cdfDir).filter(Files.isDirectory(_)).foreach(sweepEmpty)
    // Bloom sidecars are per-commit (deterministic pathing, no manifest
    // refs): a sidecar whose commit has no live data file left is dead
    if (Files.isDirectory(bloomDir)) {
      val liveCids = live.flatMap(_.split('/') match {
        case Array("data", cid, _*) => Some(cid)
        case _ => None
      })
      listNames(bloomDir).filter(_.endsWith(".parquet")).foreach { n =>
        if (!liveCids.contains(n.stripSuffix(".parquet"))) {
          val d = bloomDir.resolve(n)
          Files.walk(d).sorted(java.util.Comparator.reverseOrder())
            .forEach(p => { Files.deleteIfExists(p); () })
        }
      }
      if (listNames(bloomDir).isEmpty) Files.deleteIfExists(bloomDir)
    }
    deleted
  }
}

/** A writer observed another commit land at the version it was publishing
  * (the Delta ConcurrentModificationException shape). Snapshot-replacing
  * operations (commit) and appends auto-retry; snapshot-derived rewrites
  * (delete, mergeCow) surface it so the caller re-runs on the new head. */
final class ConcurrentCommitException(msg: String) extends RuntimeException(msg)

/** A write carried rows failing a table CHECK constraint; the batch was
  * rejected before its manifest published (no partial state is visible —
  * the orphaned data files fall to vacuum). */
final class ConstraintViolationException(msg: String) extends RuntimeException(msg)

object VersionedTable {
  /** Schema-field metadata key holding a generated column's SQL expression
    * (Delta's `delta.generationExpression` shape): riding in the schema
    * JSON means every publish path carries it with zero plumbing. */
  val GenerationExprKey = "graft.generationExpression"
  /** Spark's own `ResolveDefaultColumns.CURRENT_DEFAULT_COLUMN_METADATA_KEY`
    * — recording column defaults under the analyzer's key means DESCRIBE
    * and native `INSERT ... DEFAULT` resolution see them with no shim. */
  val CurrentDefaultKey = "CURRENT_DEFAULT"
  /** Reserved stats pseudo-column carrying each file's row count (kind
    * "rows"); never a real column (double underscore is write-reserved),
    * never consulted by pruning. */
  val RowCountStat = "__rows"

  /** Reserved stats pseudo-column prefix: `__nulls_<col>` carries the
    * file's NULL count for `<col>` (kind "nulls", min=max=count — riding
    * the existing (min, max, kind) triple so the manifest format is
    * unchanged). Delta and Iceberg both record nullCount; it is what lets
    * `IS NULL` skip every fully-populated file and `IS NOT NULL` skip
    * all-null files — a frequent real-user predicate the min/max range
    * machinery cannot see (an all-null column records NO min/max at all). */
  val NullCountPrefix = "__nulls_"

  /** Spark's parquet field-id metadata key (`ParquetUtils.FIELD_ID_METADATA_KEY`):
    * writers populate parquet field ids from it, and with
    * `spark.sql.parquet.fieldId.read.enabled` readers resolve requested
    * columns by id instead of name. */
  val FieldIdKey = "parquet.field.id"

  /** Resolve a (possibly dotted) stats key against a schema: an EXACT
    * top-level field name wins first (one key, one meaning —
    * collectFileStats applies the same collision rule when recording), then
    * the dotted path walks struct leaves. A path through an array/map or
    * off the schema resolves to None — the conjunct contributes nothing
    * and pruning stays safe. */
  private[graft] def leafType(schema: org.apache.spark.sql.types.StructType,
      name: String): Option[org.apache.spark.sql.types.DataType] = {
    import org.apache.spark.sql.types.{DataType, StructType}
    def walk(dt: DataType, rest: List[String]): Option[DataType] = (dt, rest) match {
      case (d, Nil) => Some(d)
      case (s: StructType, h :: t) =>
        s.fields.find(_.name == h).map(_.dataType).flatMap(walk(_, t))
      case _ => None
    }
    schema.fields.find(_.name == name).map(_.dataType).orElse {
      name.split('.').toList match {
        case head :: rest if rest.nonEmpty =>
          schema.fields.find(_.name == head).map(_.dataType).flatMap(walk(_, rest))
        case _ => None
      }
    }
  }

  /** Hard ceiling on the per-probe Bloom key broadcast (hashes collected to
    * the driver and shipped to every task): above this, the sidecar pass is
    * skipped and range/checkpoint pruning alone bound the candidate list.
    * 1 M longs ≈ 8 MB — batch-sized; a 100 M-key merge stays off the driver. */
  val BloomProbeMaxKeys = 1000000

  /** Stats "kind" of a Spark type — drives the prune-time comparison
    * (numeric vs lexicographic; ISO-rendered timestamps/dates sort
    * correctly as strings). Shared by the scan and footer stats modes and
    * the partition-value re-injection. */
  private[table] def statKindOf(
      dt: org.apache.spark.sql.types.DataType): Option[String] = {
    import org.apache.spark.sql.types._
    dt match {
      case _: NumericType => Some("num")
      case StringType | TimestampType | DateType => Some("str")
      case _ => None
    }
  }

  /** The FLOAT/DOUBLE leaves of one file's parquet schema (struct-only
    * walk, same eligibility as [[footerStats]]): their dotted names plus a
    * minimal Spark read schema containing ONLY those branches — the columns
    * whose bounds the footer mode must source from the residual scan, with
    * the explicit schema sparing that scan its own footer-inference job. */
  private[table] def floatingLeaves(rootAbs: String, relFile: String)
      : (Set[String], org.apache.spark.sql.types.StructType) = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.{GroupType, Type}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName.{DOUBLE, FLOAT}
    import org.apache.spark.sql.types.{DoubleType, FloatType, StructField, StructType}
    val path = new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(rootAbs).resolve(relFile).toString)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      path, new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      def walk(t: GroupType, prefix: String): (Seq[String], Seq[StructField]) = {
        val per = t.getFields.asScala.toSeq.map { f =>
          val name = if (prefix.isEmpty) f.getName else s"$prefix.${f.getName}"
          if (f.getRepetition == Type.Repetition.REPEATED) (Nil, Nil)
          else if (f.isPrimitive) f.asPrimitiveType().getPrimitiveTypeName match {
            case FLOAT => (Seq(name), Seq(StructField(f.getName, FloatType)))
            case DOUBLE => (Seq(name), Seq(StructField(f.getName, DoubleType)))
            case _ => (Nil, Nil)
          } else if (f.getLogicalTypeAnnotation != null) (Nil, Nil)
          else {
            val (names, fields) = walk(f.asGroupType(), name)
            if (fields.isEmpty) (Nil, Nil)
            else (names, Seq(StructField(f.getName, StructType(fields))))
          }
        }
        (per.flatMap(_._1), per.flatMap(_._2))
      }
      val (names, fields) =
        walk(reader.getFooter.getFileMetaData.getSchema.asGroupType(), "")
      (names.toSet, StructType(fields))
    } finally reader.close()
  }

  /** Footer-mode stats for ONE written file: min/max/nullCount per eligible
    * column plus the row count, extracted from the parquet footer the
    * writer already produced — no data read. Static and self-contained so
    * the >footerDriverMaxFiles path can run it on executors.
    *
    * Eligibility mirrors the scan mode's stat-column menu (top-level scalar
    * leaves + struct leaves under dotted names; nothing under arrays/maps),
    * with the footer-trust rules the scaladoc on collectFileStats states:
    * floating bounds skipped (NaN-poisoned), INT96/NTZ skipped, dropped
    * (oversize) stats skipped — every skip is conservative because absent
    * stats never skip a file. Values render through the same Cast Spark's
    * scan-mode aggregation applies, so both modes record identical strings
    * for every covered type. */
  private[table] def footerStats(rootAbs: String, relFile: String,
      tz: String): Map[String, (String, String, String)] = {
    import scala.jdk.CollectionConverters._
    import org.apache.parquet.schema.{GroupType, LogicalTypeAnnotation, PrimitiveType, Type}
    import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._
    import org.apache.parquet.column.statistics.Statistics
    import org.apache.spark.sql.catalyst.expressions.{Cast, Literal}
    import org.apache.spark.sql.types._
    val path = new org.apache.hadoop.fs.Path(
      java.nio.file.Paths.get(rootAbs).resolve(relFile).toString)
    val in = org.apache.parquet.hadoop.util.HadoopInputFile.fromPath(
      path, new org.apache.hadoop.conf.Configuration())
    val reader = org.apache.parquet.hadoop.ParquetFileReader.open(in)
    try {
      val footer = reader.getFooter
      val blocks = footer.getBlocks.asScala.toSeq
      val rows = blocks.map(_.getRowCount).sum
      val out = scala.collection.mutable.Map[String, (String, String, String)](
        RowCountStat -> ((rows.toString, rows.toString, "rows")))
      if (blocks.isEmpty) return out.toMap
      // struct-only leaf walk (LIST/MAP groups carry logical annotations and
      // REPEATED repetition — both stop the descent, exactly like the scan
      // mode's schema walk ignoring arrays/maps)
      def leaves(t: GroupType, prefix: String): Seq[(String, PrimitiveType)] =
        t.getFields.asScala.toSeq.flatMap { f =>
          val name = if (prefix.isEmpty) f.getName else s"$prefix.${f.getName}"
          if (f.getRepetition == Type.Repetition.REPEATED) Nil
          else if (f.isPrimitive) Seq(name -> f.asPrimitiveType())
          else if (f.getLogicalTypeAnnotation != null) Nil
          else leaves(f.asGroupType(), name)
        }
      val eligible = leaves(footer.getFileMetaData.getSchema.asGroupType(), "")
      // one merged Statistics per column, unusable if ANY block's chunk
      // stats are missing/dropped (parquet omits stats > 4 KB)
      val byName: Map[String, Seq[org.apache.parquet.hadoop.metadata.ColumnChunkMetaData]] =
        blocks.flatMap(_.getColumns.asScala).groupBy(_.getPath.toDotString)
      def render(lit: Literal): String =
        Cast(lit, StringType, Some(tz)).eval(null).toString
      eligible.foreach { case (name, pt) =>
        byName.get(name).filter(_.size == blocks.size).foreach { chunks =>
          val sts = chunks.map(_.getStatistics)
          if (sts.forall(s => s != null && !s.isEmpty)) {
            // erased-cast merge: the chunks of one column share one concrete
            // Statistics subclass; the nominal Binary parameter only
            // satisfies the Java bound (erased at runtime)
            type B = org.apache.parquet.io.api.Binary
            val merged: Statistics[_] = sts.head.copy()
            sts.tail.foreach(s => merged.asInstanceOf[Statistics[B]]
              .mergeStatistics(s.asInstanceOf[Statistics[B]]))
            if (merged.isNumNullsSet) {
              val nc = merged.getNumNulls.toString
              out(s"$NullCountPrefix$name") = ((nc, nc, "nulls"))
            }
            if (merged.hasNonNullValue) {
              val ann = pt.getLogicalTypeAnnotation
              // (rendered min, rendered max, kind) — or None when the
              // footer cannot be trusted for this physical/logical shape
              val bounds: Option[(String, String, String)] =
                (pt.getPrimitiveTypeName, ann) match {
                  case (INT32 | INT64, d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
                    def dec(v: Long) = new java.math.BigDecimal(
                      java.math.BigInteger.valueOf(v), d.getScale).toString
                    merged match {
                      case s: org.apache.parquet.column.statistics.IntStatistics =>
                        Some((dec(s.getMin.toLong), dec(s.getMax.toLong), "num"))
                      case s: org.apache.parquet.column.statistics.LongStatistics =>
                        Some((dec(s.getMin), dec(s.getMax), "num"))
                      case _ => None
                    }
                  case (INT32, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if !i.isSigned => None // unsigned: Spark widens; skip
                  case (INT32, _: LogicalTypeAnnotation.DateLogicalTypeAnnotation) =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
                    Some((render(Literal(s.getMin, DateType)),
                      render(Literal(s.getMax, DateType)), "str"))
                  case (INT32, _) =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.IntStatistics]
                    Some((s.getMin.toString, s.getMax.toString, "num"))
                  case (INT64, i: LogicalTypeAnnotation.IntLogicalTypeAnnotation)
                      if !i.isSigned => None
                  case (INT64, t: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation)
                      if t.isAdjustedToUTC &&
                        (t.getUnit == LogicalTypeAnnotation.TimeUnit.MICROS ||
                         t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS) =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
                    val scale = if (t.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS) 1000L else 1L
                    Some((render(Literal(s.getMin * scale, TimestampType)),
                      render(Literal(s.getMax * scale, TimestampType)), "str"))
                  case (INT64, _: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation) =>
                    None // NTZ or nanos: rendering semantics differ — skip
                  case (INT64, _: LogicalTypeAnnotation.TimeLogicalTypeAnnotation) => None
                  case (INT64, _) =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.LongStatistics]
                    Some((s.getMin.toString, s.getMax.toString, "num"))
                  case (BINARY, a) if a.isInstanceOf[LogicalTypeAnnotation.StringLogicalTypeAnnotation] ||
                      a.isInstanceOf[LogicalTypeAnnotation.EnumLogicalTypeAnnotation] =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
                    Some((new String(s.genericGetMin.getBytes, java.nio.charset.StandardCharsets.UTF_8),
                      new String(s.genericGetMax.getBytes, java.nio.charset.StandardCharsets.UTF_8), "str"))
                  case (BINARY | FIXED_LEN_BYTE_ARRAY,
                      d: LogicalTypeAnnotation.DecimalLogicalTypeAnnotation) =>
                    val s = merged.asInstanceOf[org.apache.parquet.column.statistics.BinaryStatistics]
                    def dec(b: org.apache.parquet.io.api.Binary) = new java.math.BigDecimal(
                      new java.math.BigInteger(b.getBytes), d.getScale).toString
                    Some((dec(s.genericGetMin), dec(s.genericGetMax), "num"))
                  // FLOAT/DOUBLE: parquet-mr footer min/max are unreliable in
                  // the presence of NaN (probed: {1.5, NaN, -0.0} records
                  // min=max=0.0) — the same reason Spark refuses parquet
                  // MIN/MAX pushdown for floating types. NullCount above is
                  // still exact; bounds come from the caller's residual scan.
                  case _ => None
                }
              bounds.foreach(b => out(name) = b)
            }
          }
        }
      }
      out.toMap
    } finally reader.close()
  }

  /** Reconstructed file-level state of one version: live data files
    * (sorted), their per-file stats and partition values, and the deletion-
    * vector sidecars in force. */
  private[table] final case class TableState(
      files: Vector[String],
      stats: Map[String, Map[String, (String, String, String)]],
      parts: Map[String, Map[String, Option[String]]],
      dvs: Vector[String])

  private[table] object TableState {
    val empty: TableState = TableState(Vector.empty, Map.empty, Map.empty, Vector.empty)
  }

  /** (size, mtime, fileKey) fingerprint of the manifest a cached state was
    * parsed from. Manifests are immutable IN PLACE, but the file itself can
    * be replaced — a table dropped and recreated at the same path, or a
    * vacuum materializing the retention floor — and the fingerprint (inode
    * on POSIX) catches that, so a stale cache entry can never serve a
    * different table's state. */
  private[table] final case class ManifestFp(size: Long,
      mtime: java.nio.file.attribute.FileTime, key: AnyRef)

  /** Per-table LRU of reconstructed snapshots. Eight versions covers the
    * hot shapes — head reads, publish-base lookups, sequential history /
    * changeFeed walks — while bounding memory per root. */
  private[table] final class StateLru {
    private val entries =
      new java.util.LinkedHashMap[Long, (ManifestFp, TableState)](16, 0.75f, true) {
        override def removeEldestEntry(
            e: java.util.Map.Entry[Long, (ManifestFp, TableState)]): Boolean = size > 8
      }
    def get(v: Long): Option[(ManifestFp, TableState)] =
      synchronized(Option(entries.get(v)))
    def put(v: Long, fp: ManifestFp, s: TableState): Unit =
      synchronized { entries.put(v, (fp, s)); () }
  }

  private val stateCache =
    new java.util.concurrent.ConcurrentHashMap[String, StateLru]()

  private[table] def lruFor(root: String): StateLru = {
    // crude global bound: a long-lived session touching hundreds of tables
    // drops the whole cache rather than growing without limit (pure cache —
    // correctness never depends on a hit)
    if (stateCache.size > 512) stateCache.clear()
    stateCache.computeIfAbsent(root, _ => new StateLru)
  }

  /** Test hook: forget every cached snapshot (simulates a cold JVM, forcing
    * the next read to replay from on-disk anchors). */
  private[table] def clearStateCache(): Unit = stateCache.clear()

  /** Snapshot cadence for checkpoint-less tables: a commit landing ≥ this
    * many versions past the last anchor writes a self-contained manifest,
    * bounding cold-start replay. Tables with `checkpointInterval` set never
    * reach it — their checkpoints anchor the tail first (the Delta shape). */
  private[table] val SnapshotEvery = 32

  def apply(root: String): VersionedTable = new VersionedTable(root)
  def apply(root: String, store: CommitStore): VersionedTable =
    new VersionedTable(root, store)
  def exists(root: String): Boolean =
    Files.isDirectory(Paths.get(root, "_graft_log")) &&
      new VersionedTable(root).latestVersion().isDefined

  /** CONVERT a plain parquet directory (flat or hive-partitioned) into a
    * versioned table IN PLACE — Delta's `CONVERT TO DELTA parquet.\`p\``,
    * the migration path that matters at 100 TB: version 0 is a manifest
    * REFERENCING the existing files where they lie; zero bytes move, zero
    * rewrite. Work done: one `Files.walk` of the directory (metadata), one
    * footer-only schema discovery, and — with `collectStats` — one
    * column-pruned scan collecting per-file min/max so converted tables
    * prune like natively written ones from day one.
    *
    * Hive layout: `c=v` path segments become the table's partition columns
    * (every file must agree on the column sequence); values are
    * %-unescaped, `__HIVE_DEFAULT_PARTITION__` reads back as null, and
    * partition column TYPES come from Spark's standard partition-discovery
    * inference. Converted files carry no parquet field ids, so the table
    * stays by-name forever (the same legacy rule an id-less history
    * triggers) — RENAME COLUMN on it requires a rewrite, exactly as Delta
    * treats converted tables. After conversion every verb — append, MERGE,
    * DELETE, OPTIMIZE, time travel, CDF — works unchanged; the original
    * files are vacuumed like any other once rewrites supersede them. */
  def convert(spark: SparkSession, root: String,
      collectStats: Boolean = true): VersionedTable = {
    val t = new VersionedTable(root)
    require(t.latestVersion().isEmpty, s"$root is already a versioned table")
    val rootPath = Paths.get(root).toAbsolutePath
    require(Files.isDirectory(rootPath), s"$root is not a directory")
    val stream = Files.walk(rootPath)
    val files =
      try stream.iterator().asScala.filter { p =>
        val n = p.getFileName.toString
        Files.isRegularFile(p) && n.endsWith(".parquet") &&
          !n.startsWith("_") && !n.startsWith(".")
      }.map(p => rootPath.relativize(p).toString).toSeq.sorted
      finally stream.close()
    require(files.nonEmpty, s"no parquet files under $root to convert")
    def colsOf(f: String): Seq[String] = f.split('/').toSeq.dropRight(1)
      .filter(_.contains('=')).map(_.takeWhile(_ != '='))
    val partCols = colsOf(files.head)
    files.foreach(f => require(colsOf(f) == partCols,
      s"inconsistent hive partitioning under $root: $f has ${colsOf(f)}, " +
        s"expected $partCols"))
    val partVals: Map[String, Map[String, Option[String]]] = files.map { f =>
      f -> f.split('/').toSeq.dropRight(1).filter(_.contains('=')).map { seg =>
        val c = seg.takeWhile(_ != '=')
        // hive escaping is plain %XX with no '+'-for-space (same rule as
        // writeDataFiles' walk) — protect literal '+' from form-decoding
        val raw = java.net.URLDecoder.decode(
          seg.drop(c.length + 1).replace("+", "%2B"), "UTF-8")
        c -> (if (raw == "__HIVE_DEFAULT_PARTITION__") None
              else Some(raw))
      }.toMap
    }.toMap
    // schema including partition columns and their inferred types — the
    // exact frame a native partitioned commit would have recorded
    val schema = spark.read.option("basePath", rootPath.toString)
      .parquet(rootPath.toString).schema
    val partTypes = schema.fields.map(f => f.name -> f.dataType).toMap
    val stats =
      if (collectStats)
        t.collectFileStats(spark, commitId = "", files, partVals, partTypes)
      else Map.empty[String, Map[String, (String, String, String)]]
    // Some(empty) pins the table by-name (no fabricated field ids for
    // bytes we did not write) — the clone rule, applied at conversion
    t.publish(files, schema.json, stats, txn = None, base = None,
      partitionBy = partCols, partitions = partVals,
      columnIdsOverride = Some(Map.empty), operation = Some("CONVERT"))
    t
  }
}
