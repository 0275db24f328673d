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
    if (name == "events") {
      // events.ts is parquet INT64 TIMESTAMP(NANOS) which Spark's reader
      // rejects; read it as raw nanos and truncate to micros (identical to
      // DuckDB's ts::TIMESTAMP truncation, verified on the testdata)
      spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
      spark.read.parquet(s"$sfDir/$name.parquet")
        .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
    } else spark.read.parquet(s"$sfDir/$name.parquet")
  }

  /** Register every test table as a temp view named after itself, so SQL
    * stages and `spark.sql` queries resolve them like the reference's named
    * views (SURVEY.md §1.1). Idempotent. */
  def registerAll(spark: SparkSession, sfDir: String): Unit =
    names.foreach(n => table(spark, sfDir, n).createOrReplaceTempView(n))
}
