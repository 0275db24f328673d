package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr
import org.apache.spark.sql.types.StructType

/** Test-table access + temp-view registration over the driver testdata
  * (`TESTDATA.md`: TPC-H-ish star schema + events/documents/embeddings). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  /** Schema cache for the immutable testdata parquet: `spark.read.parquet`
    * without an explicit schema runs a footer-inference JOB per call, and
    * the gate calls [[table]]/[[registerAll]] once per query — ~10 × 40 ms
    * of pure metadata re-derivation per entry, per the Profile census
    * (OPTIMIZATION_r15.md §tables). A real engine resolves table schemas
    * from a catalog, not by re-reading footers per query; this map is that
    * catalog. Keyed by (path, mtime, size) so an in-place regeneration of
    * the testdata is detected and re-inferred — METADATA only, never rows:
    * every query still computes from the parquet files. */
  private val schemaCache =
    new java.util.concurrent.ConcurrentHashMap[(String, Long, Long), StructType]()

  private def fingerprint(path: String): (String, Long, Long) = {
    val p = java.nio.file.Paths.get(path)
    // a parquet "file" in the testdata is a single file; a directory (not
    // used by the driver layout) falls back to the dir's own mtime — still
    // change-detecting for atomic regenerations, and the conservative miss
    // just re-infers
    val (mtime, size) =
      try (java.nio.file.Files.getLastModifiedTime(p).toMillis,
        java.nio.file.Files.size(p))
      catch { case _: Exception => (-1L, -1L) }
    (path, mtime, size)
  }

  private def readCached(spark: SparkSession, path: String): DataFrame = {
    val key = fingerprint(path)
    val cached = schemaCache.get(key)
    if (cached != null) spark.read.schema(cached).parquet(path)
    else {
      val df = spark.read.parquet(path)
      schemaCache.put(key, df.schema)
      df
    }
  }

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    // The driver writes timestamps without an isAdjustedToUTC flag; Spark 4
    // would infer TIMESTAMP_NTZ, which breaks streaming watermarks and
    // time functions that expect TIMESTAMP. Session zone is UTC, so reading
    // them as LTZ preserves the exact instants DuckDB's oracle sees.
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    if (name == "events") {
      // Some testdata generations write events.ts as parquet INT64
      // TIMESTAMP(NANOS), which Spark's reader rejects; others write plain
      // micros. Read nanos as raw longs and truncate to micros (identical
      // to DuckDB's ts::TIMESTAMP truncation) ONLY when the file actually
      // carries nanos — a micros file arrives as a timestamp already.
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      val df = readCached(spark, s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else readCached(spark, s"$sfDir/$name.parquet")
  }

  /** Register every test table as a temp view named after itself, so SQL
    * stages and `spark.sql` queries resolve them like the reference's named
    * views (SURVEY.md §1.1). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
