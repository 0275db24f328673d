package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.expr

/** Test-table access + temp-view registration over the driver testdata
  * (`TESTDATA.md`: TPC-H-ish star schema + events/documents/embeddings). */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

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
      val df = spark.read.parquet(s"$sfDir/$name.parquet")
      if (df.schema("ts").dataType == org.apache.spark.sql.types.LongType)
        df.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      else df
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every test table as a temp view named after itself, so SQL
    * stages and `spark.sql` queries resolve them like the reference's named
    * views (SURVEY.md §1.1). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
