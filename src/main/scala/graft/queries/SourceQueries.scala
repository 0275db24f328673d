package graft.queries

import graft.etl._
import org.apache.spark.sql.functions._

/** Source/sink roundtrip queries — the extract side of SURVEY.md §2.1 driven
  * through the REAL engine stages and gated by the DuckDB oracle. */
object SourceQueries {

  /** q21: headerless-CSV extract + schema-doc typing (the reference's
    * DelimitedExtract→TypingTransform flow, scd2-job.ipynb:39-50,88-96):
    * dump customer columns to CSV, re-ingest through DelimitedExtract with
    * positional `_c*` names, type via TypingTransform — must reproduce the
    * original values exactly (double roundtrip through CSV text is lossless
    * via shortest-repr formatting). */
  val q21CsvExtract: Q = Q(
    "q21_csv_extract",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-csv-").toString
      spark.sql("SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer")
        .write.mode("overwrite").option("header", "false").csv(s"$tmp/contacts")
      val doc =
        """[{"name": "c_custkey", "type": "long", "nullable": false},
          | {"name": "c_name", "type": "string"},
          | {"name": "c_nationkey", "type": "integer"},
          | {"name": "c_acctbal", "type": "double"}]""".stripMargin
      JobSpec(Seq(
        DelimitedExtract("extract csv", s"$tmp/contacts", "csv_raw",
          delimiter = "Comma", header = false, quote = "DoubleQuote"),
        TypingTransform("type csv", "csv_raw", "csv_typed",
          schema = Some(doc), positional = true)))
        .run(spark, Map.empty)
      spark.table("csv_typed")
        .select("c_custkey", "c_name", "c_nationkey", "c_acctbal")
    },
    Some("SELECT c_custkey, c_name, c_nationkey, c_acctbal FROM customer"))

  /** q40: stats-pruned versioned read, gated end-to-end — commit orders
    * range-sorted by o_orderkey with per-file stats, read back via the
    * manifest-index file skipping plus the residual row filter; the result
    * must equal a plain range select. Pruning must lose no rows. */
  val q40PrunedRead: Q = Q(
    "q40_pruned_read",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-prune-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(
        spark.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val (pruned, scanned, total) = t.readPruned(spark, "o_orderkey", "1000", "2999")
      require(scanned < total,
        s"expected file skipping on a range-sorted table ($scanned/$total)")
      pruned.filter(col("o_orderkey").between(1000, 2999))
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey BETWEEN 1000 AND 2999""".stripMargin))

  val all: Seq[Q] = Seq(q21CsvExtract, q40PrunedRead)
}
