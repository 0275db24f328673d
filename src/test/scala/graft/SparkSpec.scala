package graft

import org.apache.spark.sql.SparkSession

/** Shared test session (one JVM-wide session across suites via getOrCreate).
  * Config mirrors graft.Verify: UTC, reference-parity ANSI-off, nanos-as-long
  * for the events testdata. */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      // q44-style recursive CTEs materialize one row per (row, ancestor);
      // the 1M default cap is a scale cliff the DuckDB oracle does not share
      .config("spark.sql.cteRecursionRowLimit", "100000000")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
    .getOrCreate()

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}
