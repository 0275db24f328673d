package graft

import org.apache.spark.sql.SparkSession

/** Shared test session (constructed exactly once JVM-wide — suites share it,
  * so the configs and the warehouse temp dir exist once). Config mirrors
  * graft.Verify: UTC, reference-parity ANSI-off, nanos-as-long for the
  * events testdata. */
trait SparkSpec {
  lazy val spark: SparkSession = SparkSpec.session

  def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString
}

object SparkSpec {
  /** Canonical word-3-gram shingle SQL used across function-pinning suites —
    * one literal so the cross-pins cannot drift apart. */
  val ShingleSql: String =
    """flatten(transform(array(split(text, ' ')), w ->
      |  transform(sequence(1, greatest(size(w) - 2, 1)),
      |    i -> concat_ws(' ', slice(w, i, 3)))))""".stripMargin

  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.ansi.enabled", "false")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
    .config("spark.sql.cteRecursionRowLimit", "100000000")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse-").toString)
    // the SQL row-level surface, exactly as graft.Verify configures it
    .config("spark.sql.catalog.graft",
      classOf[graft.catalog.GraftCatalog].getName)
    .config("spark.sql.catalog.graft.warehouse",
      java.nio.file.Files.createTempDirectory("graft-cat-wh-").toString)
    .withExtensions(new graft.catalog.GraftExtensions()(_))
    .getOrCreate()
}
