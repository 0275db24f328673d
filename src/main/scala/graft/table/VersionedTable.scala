package graft.table

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.{DataFrame, SparkSession}

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
  *   <root>/_graft_log/v00000042.json    -- manifest: {"version":42,"files":[...relative...]}
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
final class VersionedTable(val root: String) {
  private val mapper = new ObjectMapper()
  private def logDir: Path = Paths.get(root, "_graft_log")
  private def dataDir: Path = Paths.get(root, "data")

  private def manifestPath(v: Long): Path = logDir.resolve(f"v$v%08d.json")

  /** All committed versions, ascending. */
  def versions(): Seq[Long] = {
    if (!Files.isDirectory(logDir)) return Seq.empty
    Files.list(logDir).iterator().asScala
      .map(_.getFileName.toString)
      .collect { case s if s.matches("v\\d{8}\\.json") => s.substring(1, 9).toLong }
      .toSeq.sorted
  }

  def latestVersion(): Option[Long] = versions().lastOption

  /** Resolve `relativeVersion` (0 or negative, relative to latest — the
    * reference's `options.relativeVersion: -1`, scd2-job.ipynb:471) or an
    * absolute `versionAsOf`. */
  def resolve(relativeVersion: Option[Int] = None, versionAsOf: Option[Long] = None): Long = {
    val latest = latestVersion().getOrElse(
      throw new IllegalStateException(s"no committed version at $root"))
    (relativeVersion, versionAsOf) match {
      case (Some(r), _) =>
        require(r <= 0, s"relativeVersion must be <= 0, got $r")
        val v = latest + r
        require(v >= 0, s"relativeVersion $r reaches before version 0 (latest=$latest)")
        v
      case (_, Some(v)) =>
        require(versions().contains(v), s"version $v not committed at $root")
        v
      case _ => latest
    }
  }

  private def filesOf(v: Long): Seq[String] = {
    val node = mapper.readTree(Files.readAllBytes(manifestPath(v)))
    node.get("files").elements().asScala.map(_.asText()).toSeq
  }

  /** Read a specific version as a DataFrame (empty-file-list versions need a
    * caller-supplied schema only if read; we return an empty DF via the
    * latest non-empty schema in that case is not needed for our surface). */
  def read(spark: SparkSession, relativeVersion: Option[Int] = None,
           versionAsOf: Option[Long] = None): DataFrame = {
    val v = resolve(relativeVersion, versionAsOf)
    val files = filesOf(v).map(f => Paths.get(root).resolve(f).toString)
    require(files.nonEmpty, s"version $v of $root has no data files")
    spark.read.parquet(files: _*)
  }

  /** Write the reference's Athena-interop `_symlink_format_manifest` for a
    * version (default latest): a text file listing that version's data files
    * as absolute URIs (`scd2-job.ipynb:382` — external engines query the
    * table by reading this manifest over the parquet files). */
  def writeSymlinkManifest(version: Option[Long] = None): Path = {
    val v = version.getOrElse(resolve())
    val dir = Paths.get(root, "_symlink_format_manifest")
    Files.createDirectories(dir)
    val uris = filesOf(v).map(f => Paths.get(root).resolve(f).toUri.toString)
    val out = dir.resolve("manifest")
    Files.write(out, uris.mkString("\n").getBytes("UTF-8"))
    out
  }

  /** Commit `df` as the next version (full snapshot — `DeltaLakeLoad` with
    * `saveMode Overwrite`, scd2-job.ipynb:169). `numPartitions` mirrors the
    * reference's pre-write repartition knob (scd2-job.ipynb:168). */
  def commit(df: DataFrame, numPartitions: Option[Int] = None): Long = {
    Files.createDirectories(logDir)
    Files.createDirectories(dataDir)
    val commitId = java.util.UUID.randomUUID().toString
    val outDir = dataDir.resolve(commitId)
    val out = numPartitions.map(df.repartition(_)).getOrElse(df)
    out.write.mode("overwrite").parquet(outDir.toString)
    val files = Files.list(outDir).iterator().asScala
      .map(_.getFileName.toString)
      .filter(n => n.endsWith(".parquet") && !n.startsWith("_") && !n.startsWith("."))
      .map(n => s"data/$commitId/$n").toSeq.sorted
    val next = latestVersion().map(_ + 1).getOrElse(0L)
    val json = mapper.createObjectNode()
    json.put("version", next)
    val arr = json.putArray("files")
    files.foreach(arr.add)
    val tmp = logDir.resolve(s".tmp-$commitId.json")
    Files.write(tmp, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(json))
    // atomic rename = the commit point; a concurrent reader either sees the
    // old latest or the new one, never a partial manifest
    try Files.move(tmp, manifestPath(next), StandardCopyOption.ATOMIC_MOVE)
    catch { case _: java.nio.file.FileAlreadyExistsException =>
      Files.deleteIfExists(tmp)
      throw new IllegalStateException(s"concurrent commit of version $next at $root")
    }
    next
  }
}

object VersionedTable {
  def apply(root: String): VersionedTable = new VersionedTable(root)
  def exists(root: String): Boolean =
    Files.isDirectory(Paths.get(root, "_graft_log")) &&
      new VersionedTable(root).latestVersion().isDefined
}
