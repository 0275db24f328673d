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

  /** q48: JSON + ORC source/sink roundtrip through the real stages (the
    * extension formats of SURVEY.md §2.1 — FileLoad json/orc, JsonExtract,
    * OrcExtract): orders → json → orc → back must reproduce the original
    * values exactly (doubles survive JSON text via shortest-repr formatting,
    * ORC is binary-exact). */
  val q48JsonOrcRoundtrip: Q = Q(
    "q48_json_orc_roundtrip",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-fmt-").toString
      JobSpec(Seq(
        SQLTransform("project orders",
          "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders", "orders_proj"),
        FileLoad("to json", "orders_proj", s"$tmp/orders_json", format = "json"),
        JsonExtract("from json", s"$tmp/orders_json", "orders_from_json"),
        FileLoad("to orc", "orders_from_json", s"$tmp/orders_orc", format = "orc"),
        OrcExtract("from orc", s"$tmp/orders_orc", "orders_from_orc")))
        .run(spark, Map.empty)
      spark.table("orders_from_orc")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },
    Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"))

  /** q70: XML source/sink roundtrip through the real stages (FileLoad xml +
    * XmlExtract — Spark 4's built-in XML source): orders → XML → back must
    * reproduce the original values exactly. The read pins the schema by DDL
    * (no inference pass — at scale inference re-reads every file) and the
    * write sets rowTag through the generic FileLoad writer options. */
  val q70XmlRoundtrip: Q = Q(
    "q70_xml_roundtrip",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-xml-").toString
      JobSpec(Seq(
        SQLTransform("project orders",
          "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders", "orders_for_xml"),
        FileLoad("to xml", "orders_for_xml", s"$tmp/orders_xml", format = "xml",
          options = Map("rowTag" -> "order", "rootTag" -> "orders")),
        XmlExtract("from xml", s"$tmp/orders_xml", "orders_from_xml",
          rowTag = "order",
          schemaDDL = Some(
            "o_orderkey BIGINT, o_orderstatus STRING, o_totalprice DOUBLE"))))
        .run(spark, Map.empty)
      spark.table("orders_from_xml")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
    },
    Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"))

  /** q49: incremental versioned table — append-only ingest (manifest carries
    * prior files forward; commit cost ∝ batch, not table) followed by a
    * copy-on-write DELETE (only files containing matches are rewritten),
    * all through the declarative stages. The read-back must equal the plain
    * SQL formulation. */
  val q49IncrementalTable: Q = Q(
    "q49_incremental_table",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-incr-").toString
      JobSpec(Seq(
        SQLTransform("even batch",
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
            |FROM orders WHERE o_orderkey % 2 = 0""".stripMargin, "orders_even"),
        SQLTransform("odd batch",
          """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
            |FROM orders WHERE o_orderkey % 2 = 1""".stripMargin, "orders_odd"),
        TableAppend("ingest even", "orders_even", "${lake}/orders_v",
          numPartitions = Some(4), sortBy = Seq("o_orderkey")),
        TableAppend("ingest odd", "orders_odd", "${lake}/orders_v",
          numPartitions = Some(4), sortBy = Seq("o_orderkey")),
        TableDelete("gdpr-style delete", "${lake}/orders_v", "o_orderkey % 10 = 3"),
        TableExtract("read back", "${lake}/orders_v", "orders_incr")))
        .run(spark, Map("lake" -> tmp))
      spark.table("orders_incr")
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderdate")
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice, o_orderdate
        |FROM orders WHERE o_orderkey % 10 <> 3""".stripMargin))

  /** q50: additive schema evolution — a later append introduces a column;
    * the manifest records the union schema and pre-evolution files read the
    * new column as null (manifest-schema'd scan, no footer merging). */
  val q50SchemaEvolution: Q = Q(
    "q50_schema_evolution",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-evo-").toString
      val t = graft.table.VersionedTable(s"$tmp/customer_v")
      t.commit(spark.sql(
        "SELECT c_custkey, c_name FROM customer WHERE c_custkey % 2 = 0"))
      t.append(spark.sql(
        "SELECT c_custkey, c_name, c_acctbal FROM customer WHERE c_custkey % 2 = 1"))
      t.read(spark).select("c_custkey", "c_name", "c_acctbal")
    },
    Some(
      """SELECT c_custkey, c_name,
        |  CASE WHEN c_custkey % 2 = 1 THEN c_acctbal END AS c_acctbal
        |FROM customer""".stripMargin))

  /** q53: copy-on-write file-pruned MERGE — a CDC batch that doubles prices
    * in a narrow key range and inserts a few far-away keys merges into a
    * range-sorted versioned table; only the files whose key range contains a
    * source key are rewritten (VersionedTable.mergeCow), asserted via the
    * rewritten-file count. The read-back must equal the plain SQL merge. */
  val q53CowMerge: Q = Q(
    "q53_cow_merge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-cow-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(
        spark.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val src = spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
          |UNION ALL
          |SELECT o_orderkey + 10000000, o_custkey, 1.0
          |FROM orders WHERE o_orderkey % 1000 = 0""".stripMargin)
      val (_, rewritten) = t.mergeCow(spark, src,
        condition = "source.o_orderkey = target.o_orderkey",
        targetKey = "o_orderkey", sourceKey = "o_orderkey",
        whenMatchedUpdate = Some(graft.table.Merge.MatchedUpdate(
          None, Map("o_totalprice" -> "source.o_totalprice"))),
        whenNotMatchedInsert = Some(graft.table.Merge.NotMatchedInsert(None, Map.empty)))
      require(rewritten < 8,
        s"expected the narrow CDC batch to leave files untouched ($rewritten/8 rewritten)")
      t.read(spark).select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some(
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 1.0
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey, b.o_custkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice
        |FROM orders b LEFT JOIN src s ON s.o_orderkey = b.o_orderkey
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
        |FROM src s
        |WHERE NOT EXISTS (SELECT 1 FROM orders b WHERE b.o_orderkey = s.o_orderkey)""".stripMargin))

  /** q55: Z-order compaction — OPTIMIZE ZORDER over (o_custkey, o_orderkey)
    * then a stats-pruned read on o_custkey, the SECOND dimension a plain
    * range sort could never skip on. The gate asserts real file skipping on
    * both columns and result equality with the plain SQL range select. */
  val q55ZOrder: Q = Q(
    "q55_zorder",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-zo-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      JobSpec(Seq(
        SQLTransform("project orders",
          "SELECT o_orderkey, o_custkey, o_totalprice FROM orders", "orders_zo"),
        TableLoad("load", "orders_zo", "${lake}/orders_v", numPartitions = Some(1)),
        TableCompact("optimize zorder", "${lake}/orders_v", numFiles = 8,
          zOrderBy = Seq("o_custkey", "o_orderkey"))))
        .run(spark, Map("lake" -> tmp))
      val (pruned, sCust, total) = t.readPruned(spark, "o_custkey", "100", "499")
      val (_, sKey, _) = t.readPruned(spark, "o_orderkey", "100", "4999")
      require(sCust < total,
        s"z-order must allow skipping on o_custkey ($sCust of $total)")
      // the o_orderkey probe [100, 4999] only leaves room to skip when the
      // key domain extends well past it (sf0.01+: max key 15k+); at sf0.001
      // the whole 1.5k-key table fits inside the probe and no file can skip
      val maxKey = spark.table("orders")
        .agg(org.apache.spark.sql.functions.max("o_orderkey")).head.getLong(0)
      if (maxKey >= 10000) require(sKey < total,
        s"z-order must allow skipping on o_orderkey ($sKey of $total)")
      pruned.filter(col("o_custkey").between(100, 499))
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey BETWEEN 100 AND 499""".stripMargin))

  /** q56: copy-on-write UPDATE through the declarative stage — a price
    * correction on a narrow key range; only overlapping files rewrite
    * (spec-asserted in VersionedTableSpec; here the gate checks the VALUES
    * against the plain SQL CASE formulation). */
  val q56CowUpdate: Q = Q(
    "q56_cow_update",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-upd-").toString
      JobSpec(Seq(
        SQLTransform("project orders",
          "SELECT o_orderkey, o_custkey, o_totalprice FROM orders", "orders_u"),
        TableLoad("load", "orders_u", "${lake}/orders_v",
          numPartitions = Some(8)),
        TableUpdate("price correction", "${lake}/orders_v",
          condition = "o_orderkey BETWEEN 2000 AND 3999",
          set = Map("o_totalprice" -> "o_totalprice * 2"))))
        .run(spark, Map("lake" -> tmp))
      graft.table.VersionedTable(s"$tmp/orders_v").read(spark)
        .select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey BETWEEN 2000 AND 3999
        |       THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin))

  /** q76: RESTORE + DESCRIBE HISTORY parity — commit the full snapshot (v0),
    * copy-on-write delete a slice (v1), then restore v0 as a new head (v2,
    * manifest-only: zero data copied because data files are immutable, and
    * v1 stays time-travelable). The read of the restored head must equal the
    * original table exactly; history() is asserted inline (3 versions, the
    * restored head carrying v0's file list). Runs through the declarative
    * TableRestore stage so the JSON/notebook job surface is exercised too. */
  val q76Restore: Q = Q(
    "q76_restore",
    (spark, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-restore-").toString + "/t"
      val t = graft.table.VersionedTable(root)
      val orders = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.commit(orders)                        // v0: full snapshot
      t.delete(spark, "o_orderstatus = 'F'")  // v1: COW delete of a slice
      JobSpec(Seq(TableRestore("back to v0", root, versionAsOf = 0L)))
        .run(spark, Map.empty)                // v2: manifest-level rollback
      val h = t.history(spark).collect()
      require(h.length == 3, s"expected 3 history rows, got ${h.length}")
      require(h.head.getLong(0) == 0L && h.last.getLong(0) == 2L)
      require(h.head.getAs[Int]("n_files") == h.last.getAs[Int]("n_files"),
        "restored head must carry v0's file list")
      t.read(spark)
    },
    Some("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"))

  /** q77: change data feed — commit the snapshot (v0), copy-on-write delete
    * the F orders (v1), copy-on-write update the O orders (v2), then ask the
    * table what changed between v0 and v2: the F rows as deletes plus each
    * updated O row as its delete+insert pair. The oracle reconstructs the
    * same diff from the raw data. `+ 1` on a double is IEEE-exact in both
    * engines at these magnitudes, so the hash compare holds bit-for-bit. */
  val q77ChangeFeed: Q = Q(
    "q77_change_feed",
    (spark, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-cdf-").toString + "/t"
      val t = graft.table.VersionedTable(root)
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      t.commit(Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice"))
      t.delete(spark, "o_orderstatus = 'F'")
      t.update(spark, "o_orderstatus = 'O'",
        Map("o_totalprice" -> "o_totalprice + 1"))
      t.changes(spark, 0L, 2L)
    },
    Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice, 'delete' AS _change_type
        |FROM orders WHERE o_orderstatus IN ('F', 'O')
        |UNION ALL
        |SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice + 1 AS DOUBLE), 'insert'
        |FROM orders WHERE o_orderstatus = 'O'""".stripMargin))

  /** q78: incremental consumption — three append batches land in the table
    * and a consumer that saw v0 asks for everything since: the manifest
    * file-list diff locates exactly the two newer batches' files (zero data
    * I/O to find them, cost ∝ new data). The batch face of a streaming-table
    * source; the oracle recomputes the two batches from the raw data. */
  val q78AppendsSince: Q = Q(
    "q78_appends_since",
    (spark, dir) => {
      val root = java.nio.file.Files.createTempDirectory("graft-tail-").toString + "/t"
      val t = graft.table.VersionedTable(root)
      val orders = Tables.table(spark, dir, "orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.commit(orders.filter("o_orderkey % 3 = 0"))  // v0: what the consumer saw
      t.append(orders.filter("o_orderkey % 3 = 1"))  // v1
      t.append(orders.filter("o_orderkey % 3 = 2"))  // v2
      t.appendsSince(spark, 0L)
    },
    Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey % 3 <> 0""".stripMargin))

  /** q83: ANALYZE-style column profiling through the real ProfileTransform
    * stage — one pass over orders produces a long-format stats row per
    * column (counts, exact NDV, numeric range + decimal-exact mean, string
    * and fixed-format timestamp ranges). The oracle is the hand-unrolled
    * per-column UNION ALL the operator replaces. */
  val q83Profile: Q = Q(
    "q83_profile",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      JobSpec(Seq(ProfileTransform("profile orders", "orders", "orders_profile")))
        .run(spark, Map.empty)
      spark.table("orders_profile")
    },
    Some {
      def num(c: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(min($c) AS DOUBLE) AS min_num, CAST(max($c) AS DOUBLE) AS max_num,
           |  CAST(sum(CAST($c AS DECIMAL(30,6))) AS DOUBLE) / count($c) AS mean,
           |  CAST(NULL AS VARCHAR) AS min_str, CAST(NULL AS VARCHAR) AS max_str
           |FROM orders""".stripMargin
      def str(c: String, expr: String) =
        s"""SELECT '$c' AS col_name, count(*) AS n_rows, count($c) AS n_nonnull,
           |  count(DISTINCT $c) AS n_distinct,
           |  CAST(NULL AS DOUBLE) AS min_num, CAST(NULL AS DOUBLE) AS max_num,
           |  CAST(NULL AS DOUBLE) AS mean,
           |  min($expr) AS min_str, max($expr) AS max_str
           |FROM orders""".stripMargin
      Seq(
        num("o_orderkey"), num("o_custkey"),
        str("o_orderstatus", "o_orderstatus"), num("o_totalprice"),
        str("o_orderdate", "strftime(o_orderdate, '%Y-%m-%d %H:%M:%S.%f')"),
        str("o_orderpriority", "o_orderpriority")
      ).mkString("\nUNION ALL\n")
    })

  /** q84: MERGE-ON-READ delete via deletion vectors — two MOR deletes mark
    * rows dead in (file, row_index) tombstone sidecars WITHOUT rewriting any
    * data file (asserted: every version carries the identical file list; at
    * 100 TB that is the difference between writing kilobytes of positions
    * and rewriting every touched file), then the read applies the tombstones
    * with a broadcast anti join on the scan's `_metadata` row positions.
    * Time travel to v0 still sees the pre-delete snapshot. Runs through the
    * declarative TableDelete(mor=true) stage. */
  val q84MorDelete: Q = Q(
    "q84_mor_delete",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-mor-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      JobSpec(Seq(
        SQLTransform("project orders",
          "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders",
          "orders_mor"),
        TableLoad("load", "orders_mor", "${lake}/orders_v", numPartitions = Some(8)),
        TableDelete("expire finished", "${lake}/orders_v",
          condition = "o_orderstatus = 'F'", mor = true),
        TableDelete("drop a key range", "${lake}/orders_v",
          condition = "o_orderkey BETWEEN 1000 AND 1999", mor = true)))
        .run(spark, Map("lake" -> tmp))
      val h = t.history(spark).orderBy("version").collect()
      require(h.length == 3, s"expected 3 versions, got ${h.length}")
      require(h.map(_.getAs[Int]("n_files")).distinct.length == 1,
        "merge-on-read delete must not rewrite or add data files")
      val v0 = t.read(spark, versionAsOf = Some(0L)).count()
      val orig = spark.table("orders").count()
      require(v0 == orig, s"time travel to v0 must see all $orig rows, got $v0")
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderstatus <> 'F'
        |  AND o_orderkey NOT BETWEEN 1000 AND 1999""".stripMargin))

  /** q85: incrementally maintained materialized aggregate — the base table
    * is built as three appended batches; after each append, refresh() folds
    * ONLY the appended delta (located by manifest file-list diff) into the
    * pre-aggregated view: per-refresh cost O(delta + groups), never a
    * re-scan of the base table. The final view must equal the one-shot
    * GROUP BY over everything (decimal-exact partial sums make the fold
    * order invisible), and a replayed refresh at the same base version must
    * be a no-op (txn-stamped cursor, exactly-once). */
  val q85IncrementalAgg: Q = Q(
    "q85_incremental_agg",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-mv-").toString
      val base = graft.table.VersionedTable(s"$tmp/orders_base")
      base.setProperties(Map("enableChangeDataFeed" -> "true"))
      val proj = spark.sql(
        """SELECT o_orderkey, o_orderstatus, o_orderpriority,
          |  CAST(o_totalprice AS DECIMAL(12,2)) AS price FROM orders""".stripMargin)
      val mv = new graft.table.MaterializedAgg(base, s"$tmp/orders_mv",
        keys = Seq("o_orderstatus", "o_orderpriority"),
        sums = Seq("sum_price" -> "price"))
      base.commit(proj.filter("o_orderkey % 3 = 0"), numPartitions = Some(4))
      mv.refresh(spark)
      base.append(proj.filter("o_orderkey % 3 = 1"), numPartitions = Some(4))
      mv.refresh(spark)
      base.append(proj.filter("o_orderkey % 3 = 2"), numPartitions = Some(4))
      mv.refresh(spark)
      require(mv.lastBaseVersion.contains(2L), "cursor must sit at the base head")
      val headBefore = graft.table.VersionedTable(s"$tmp/orders_mv").latestVersion()
      mv.refresh(spark) // replay at the same base version
      require(graft.table.VersionedTable(s"$tmp/orders_mv").latestVersion() == headBefore,
        "a no-op refresh must not commit a new view version")
      // rewrites maintain the view too (signed change-feed fold, round 5):
      // a COW delete drops whole groups, a COW update shifts sums — each
      // refresh folds only the stored change rows, never re-scans the base
      base.delete(spark, "o_orderstatus = 'P'")
      base.update(spark, "o_orderpriority = '1-URGENT'",
        Map("price" -> "price + 1"))
      mv.refresh(spark)
      // lifecycle above (commits + incremental refreshes), serving read below
      PhaseClock.markServe("q85_incremental_agg")
      mv.read(spark).select(col("o_orderstatus"), col("o_orderpriority"), col("n"),
        col("sum_price").cast("double").as("sum_price"))
    },
    Some(
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
        |  CAST(sum(CASE WHEN o_orderpriority = '1-URGENT'
        |           THEN CAST(o_totalprice AS DECIMAL(12,2)) + 1
        |           ELSE CAST(o_totalprice AS DECIMAL(12,2)) END) AS DOUBLE)
        |    AS sum_price
        |FROM orders
        |WHERE o_orderstatus <> 'P'
        |GROUP BY o_orderstatus, o_orderpriority""".stripMargin))

  /** q95: dynamic partition pruning — the fact table is laid out
    * hive-partitioned on the join key; joining a SELECTIVE small dim makes
    * Spark inject a runtime `dynamicpruning` subquery into the fact scan's
    * partition filters, so only the dim-surviving partitions are READ at
    * all. This is the partition-layout complement of the manifest
    * stats-skipping path (q40/q55): at 100 TB it is the difference between
    * scanning two priority partitions and scanning five. Asserted on the
    * plan, gated on the values. */
  val q95DynamicPartitionPruning: Q = Q(
    "q95_dpp",
    (spark, dir) => {
      import spark.implicits._
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-dpp-").toString
      spark.table("orders")
        .select("o_orderkey", "o_totalprice", "o_orderpriority")
        .write.partitionBy("o_orderpriority").parquet(s"$tmp/orders_part")
      val fact = spark.read.parquet(s"$tmp/orders_part")
      // the dim must be a SOURCE with a surviving filter: an in-memory
      // LocalRelation constant-folds the predicate away and the DPP rule
      // sees no selective side to prune with
      Seq(("1-URGENT", "hot"), ("2-HIGH", "hot"), ("3-MEDIUM", "warm"),
        ("4-NOT SPECIFIED", "cold"), ("5-LOW", "cold"))
        .toDF("o_orderpriority", "tier")
        .write.parquet(s"$tmp/priority_dim")
      val dim = spark.read.parquet(s"$tmp/priority_dim")
        .filter(col("tier") === "hot")
      val joined = fact.join(dim, "o_orderpriority")
      val plan = joined.queryExecution.executedPlan.toString
      require(plan.contains("dynamicpruning"),
        s"expected a dynamic partition pruning subquery in the fact scan:\n$plan")
      joined.groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
    },
    Some(
      """SELECT o_orderpriority, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')
        |GROUP BY o_orderpriority""".stripMargin))

  /** q96: partition-aware versioned table — the orders snapshot is committed
    * hive-partitioned on `o_orderstatus` into the versioned format (partition
    * values recorded in the manifest), then read back twice:
    *  - statically pruned (`readPartitioned "o_orderstatus = 'F'"`), asserting
    *    the scan lists ONLY the surviving partition's files (the
    *    manifest-level mirror of q95's dynamicpruning plan proof);
    *  - join-pruned (`readPrunedByJoinKeys` from a 2-row dim), the DPP shape
    *    where the dim side prunes the fact file list before any fact I/O.
    * At 100 TB this is the difference between listing one partition and
    * stats-skipping through every file of an unpartitioned table. The final
    * aggregate hash-matches DuckDB over the raw orders table. */
  val q96PartitionedTable: Q = Q(
    "q96_partitioned_table",
    (spark, dir) => {
      import spark.implicits._
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ptab-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_pt")
      t.commit(spark.table("orders"), partitionBy = Seq("o_orderstatus"))
      // static partition pruning: file-list proof, not just a row filter
      val (fOnly, scanned, total) = t.readPartitioned(spark, "o_orderstatus = 'F'")
      require(scanned < total,
        s"partition filter must prune the file list ($scanned of $total)")
      require(fOnly.inputFiles.nonEmpty &&
        fOnly.inputFiles.forall(_.contains("o_orderstatus=F")),
        "a partition-filtered read must list only the surviving partition's files")
      // DPP shape: the dim side prunes the fact's file list driver-side
      val dim = Seq(("F", "closed"), ("P", "pending")).toDF("code", "label")
      val (fact, scanned2, total2) = t.readPrunedByJoinKeys(spark, dim, "code", "o_orderstatus")
      require(scanned2 < total2,
        s"join keys must prune the fact file list ($scanned2 of $total2)")
      require(fact.inputFiles.forall(f =>
        f.contains("o_orderstatus=F") || f.contains("o_orderstatus=P")),
        "the join-pruned read must list only dim-surviving partitions' files")
      fact.join(dim, col("o_orderstatus") === col("code"))
        .groupBy("o_orderstatus", "label")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(12,2)")).cast("double").as("sum_price"))
    },
    Some(
      """SELECT o_orderstatus,
        |  CASE o_orderstatus WHEN 'F' THEN 'closed' ELSE 'pending' END AS label,
        |  count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
        |FROM orders
        |WHERE o_orderstatus IN ('F', 'P')
        |GROUP BY o_orderstatus""".stripMargin))

  /** q97: write-time change-data-feed — a five-version CDC scenario (seed
    * commit, append, COW delete, COW update, file-pruned merge) whose
    * per-commit changes are served ENTIRELY from write-time capture:
    * `changeFeed` reads the cdf/ batches the rewrites persisted and the
    * append's fresh files, never re-diffing snapshots (asserted via
    * `cdfKindOf` on every step — the 100 TB property: CDC cost is O(changes)
    * per commit, not O(two snapshots)). The per-(version, change-type)
    * counts and exact decimal sums hash-match a DuckDB reconstruction of the
    * same timeline from the raw orders table. */
  val q97ChangeFeedStored: Q = Q(
    "q97_change_feed_stored",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-cdc-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_cdc")
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      val orders = spark.table("orders")
      t.commit(orders.filter("o_orderkey <= 1000"))                       // v0
      t.append(orders.filter("o_orderkey > 1000"))                        // v1
      t.delete(spark, "o_orderstatus = 'P'")                              // v2
      t.update(spark, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice + 1"))                        // v3
      val src = orders.filter("o_orderkey <= 100")
        .withColumn("o_totalprice", col("o_totalprice") * 2)
      t.mergeCow(spark, src, "source.o_orderkey = target.o_orderkey",
        targetKey = "o_orderkey", sourceKey = "o_orderkey",
        whenMatchedUpdate = Some(graft.table.Merge.MatchedUpdate(None,
          Map("o_totalprice" -> "source.o_totalprice"))),
        whenNotMatchedInsert = Some(graft.table.Merge.NotMatchedInsert(None,
          Map("o_orderkey" -> "source.o_orderkey", "o_custkey" -> "source.o_custkey",
            "o_orderstatus" -> "source.o_orderstatus",
            "o_totalprice" -> "source.o_totalprice",
            "o_orderdate" -> "source.o_orderdate",
            "o_orderpriority" -> "source.o_orderpriority"))))              // v4
      // the serving path must be write-time capture on EVERY step — a
      // fallback re-diff would silently reintroduce the O(snapshot) cost
      (1L to 4L).foreach(v => require(
        t.cdfKindOf(v).exists(k => k == "append" || k == "files"),
        s"version $v lacks write-time capture (kind=${t.cdfKindOf(v)})"))
      // the five-commit CDC timeline above is setup; the feed read below
      // is what a downstream consumer pays per drain
      PhaseClock.markServe("q97_change_feed_stored")
      t.changeFeed(spark, 0L, 4L)
        .groupBy("_commit_version", "_change_type")
        .agg(count(lit(1)).as("n"),
          sum(col("o_totalprice").cast("decimal(14,2)")).cast("double").as("sum_price"))
    },
    Some(
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(14,2)) AS p FROM orders)
        |SELECT CAST(1 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
        |  count(*) AS n, CAST(sum(p) AS DOUBLE) AS sum_price
        |FROM o WHERE o_orderkey > 1000
        |UNION ALL
        |SELECT 2, 'delete', count(*), CAST(sum(p) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT 3, 'delete', count(*), CAST(sum(p) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 3, 'insert', count(*), CAST(sum(p + 1) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 4, 'delete', count(*),
        |  CAST(sum(CASE WHEN o_orderstatus = 'F' THEN p + 1 ELSE p END) AS DOUBLE)
        |FROM o WHERE o_orderkey <= 100 AND o_orderstatus <> 'P'
        |UNION ALL
        |SELECT 4, 'insert', count(*), CAST(sum(p * 2) AS DOUBLE)
        |FROM o WHERE o_orderkey <= 100""".stripMargin))

  /** q99: real-JDBC roundtrip through embedded Derby — [[JDBCLoad]] ships a
    * supplier projection into the RDBMS from executors, [[JDBCExecute]]
    * runs endpoint-side DML driver-side (the reference's Athena-DDL shape,
    * scd2-job.ipynb:373-384), [[JDBCExtract]] reads it back as FOUR
    * range-partitioned queries with auto-probed bounds (no driver funnel —
    * the 1000-executor drain shape), and the aggregate over the extracted
    * view must match DuckDB computing the same filter+group directly.
    * Decimal-exact sum (s_acctbal is 2dp) keeps the hash compare exact. */
  val q99JdbcRoundtrip: Q = Q(
    "q99_jdbc_roundtrip",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      System.setProperty("derby.system.home",
        java.nio.file.Files.createTempDirectory("graft-derby-").toString)
      val db = "g" + java.util.UUID.randomUUID().toString.replace("-", "")
      val url = s"jdbc:derby:memory:$db;create=true"
      spark.sql(
        """SELECT s_suppkey, s_nationkey, CAST(s_acctbal AS DOUBLE) AS s_acctbal
          |FROM supplier""".stripMargin)
        .createOrReplaceTempView("supplier_jdbc_in")
      try {
        JobSpec(Seq(
          JDBCLoad("ship", "supplier_jdbc_in", url, "s", numPartitions = Some(2)),
          // Spark's JDBC writer creates columns QUOTED (case-preserved) —
          // endpoint-side DML must quote them too
          JDBCExecute("trim", url, "DELETE FROM s WHERE \"s_acctbal\" < 0"),
          JDBCExtract("drain", url, "s", "supplier_back",
            partitionColumn = Some("s_suppkey"), numPartitions = Some(4))))
          .run(spark, Map.empty)
        spark.table("supplier_back")
          .groupBy("s_nationkey")
          .agg(count(lit(1)).as("n"),
            sum(col("s_acctbal").cast("decimal(12,2)")).cast("double").as("bal"))
          // materialized before the in-memory db drops below
          .localCheckpoint(true)
      } finally {
        // free the in-memory database (Derby signals a successful drop by
        // refusing the connection)
        try Jdbc.withConnection(s"jdbc:derby:memory:$db;drop=true")(_ => ())
        catch { case _: java.sql.SQLException => }
      }
    },
    Some(
      """SELECT s_nationkey, count(*) AS n,
        |  CAST(sum(CAST(s_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal
        |FROM supplier WHERE s_acctbal >= 0
        |GROUP BY s_nationkey""".stripMargin))

  /** q101: the versioned table through the STANDARD DataFrame/SQL surface —
    * writer save() (range-sorted via the sortBy option), SQL
    * `CREATE TABLE USING graft-table`, and a predicated aggregate whose
    * pushed filter prunes the manifest file list before any I/O (asserted:
    * the bound machinery the scan uses keeps 1 of 8 files). The Delta-
    * parity integration face — a reference user's existing
    * `spark.read`/`spark.sql` code runs unchanged against this format. */
  val q101TableRelationSql: Q = Q(
    "q101_table_relation_sql",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val root = java.nio.file.Files.createTempDirectory("graft-rel-").toString + "/t"
      spark.sql(
        """SELECT l_orderkey, l_returnflag,
          |  CAST(l_extendedprice AS DECIMAL(12,2)) AS price FROM lineitem""".stripMargin)
        .write.format("graft-table").option("path", root)
        .option("numPartitions", "8").option("sortBy", "l_orderkey")
        .mode("overwrite").save()
      // the pushed range must skip files at the manifest (1 of 8 survives)
      val (_, kept, total) = graft.table.VersionedTable(root)
        .readBounded(spark, Seq(("l_orderkey", Some("1"), Some("400"))))
      require(kept < total, s"stats skipping did not engage ($kept/$total files)")
      val tbl = s"rel_li_${math.abs(root.hashCode)}"
      spark.sql(s"CREATE TABLE $tbl USING `graft-table` OPTIONS (path '$root')")
      try
        spark.sql(
          s"""SELECT l_returnflag, count(*) AS n,
             |  CAST(sum(price) AS DOUBLE) AS revenue
             |FROM $tbl WHERE l_orderkey BETWEEN 1 AND 400
             |GROUP BY l_returnflag""".stripMargin)
          .localCheckpoint(true)
      finally spark.sql(s"DROP TABLE $tbl")
    },
    Some(
      """SELECT l_returnflag, count(*) AS n,
        |  CAST(sum(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM lineitem WHERE l_orderkey BETWEEN 1 AND 400
        |GROUP BY l_returnflag""".stripMargin))

  /** q103: MERGE-ON-READ merge — q53's CDC batch (doubled prices + shifted
    * inserts) applied via [[graft.table.VersionedTable.mergeMor]] plus a
    * matched-DELETE clause: matched rows are tombstoned in a DV sidecar and
    * post-images/inserts APPEND — zero data files rewritten (asserted: the
    * new version carries every base file). At 100 TB this is the
    * write-optimal merge for narrow batches into wide tables: kilobytes of
    * positions + the batch itself, where COW rewrites every touched file. */
  val q103MorMerge: Q = Q(
    "q103_mor_merge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-mor-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(
        spark.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val baseFiles = t.history(spark).filter("version = 0")
        .head.getAs[Int]("n_files")
      val src = spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
          |UNION ALL
          |SELECT o_orderkey + 10000000, o_custkey, 1.0
          |FROM orders WHERE o_orderkey % 1000 = 0""".stripMargin)
      val (v1, tombs) = t.mergeMor(spark, src,
        condition = "source.o_orderkey = target.o_orderkey",
        targetKey = "o_orderkey", sourceKey = "o_orderkey",
        whenMatchedUpdate = Some(graft.table.Merge.MatchedUpdate(
          Some("source.o_orderkey < 2000"), Map("o_totalprice" -> "source.o_totalprice"))),
        whenMatchedDelete = Some(graft.table.Merge.MatchedDelete(
          Some("source.o_orderkey >= 2000"))),
        whenNotMatchedInsert = Some(graft.table.Merge.NotMatchedInsert(None, Map.empty)))
      require(tombs > 0, "expected matched rows to be tombstoned")
      // the MOR proof: no base data file was dropped — the head manifest
      // still references all of them (plus the appended batch files)
      val headFiles = t.history(spark).filter(s"version = $v1").head.getAs[Int]("n_files")
      require(headFiles > baseFiles,
        s"expected appends on top of all $baseFiles base files, got $headFiles")
      t.read(spark).select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some(
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 1.0
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey, b.o_custkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL AND s.o_orderkey < 2000
        |       THEN s.o_totalprice ELSE b.o_totalprice END AS o_totalprice
        |FROM orders b LEFT JOIN src s ON s.o_orderkey = b.o_orderkey
        |WHERE s.o_orderkey IS NULL OR s.o_orderkey < 2000
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
        |FROM src s
        |WHERE NOT EXISTS (SELECT 1 FROM orders b WHERE b.o_orderkey = s.o_orderkey)""".stripMargin))

  /** q104: SHALLOW CLONE — a zero-copy branch of the versioned table
    * (hard-linked data files, asserted via inode link counts) that then
    * DIVERGES: a COW delete on the clone must leave the source snapshot
    * byte-identical (asserted in-query). The branch-for-experimentation
    * workflow Delta CLONE serves; at 100 TB the clone costs O(files)
    * metadata operations and zero data movement. */
  val q104ShallowClone: Q = Q(
    "q104_shallow_clone",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-clone-").toString
      val src = graft.table.VersionedTable(s"$tmp/src")
      src.commit(
        spark.sql("SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val total = src.read(spark).count()
      val clone = src.cloneShallow(s"$tmp/dst")
      // zero-copy proof: cloned parquet files share their source inodes
      val files = java.nio.file.Files.walk(java.nio.file.Paths.get(s"$tmp/dst/data"))
        .toArray.map(_.asInstanceOf[java.nio.file.Path])
        .filter(_.toString.endsWith(".parquet"))
      require(files.nonEmpty && files.forall(p =>
        java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] >= 2),
        "clone data files are not hard links")
      clone.delete(spark, "o_orderstatus = 'F'")
      require(src.read(spark).count() == total,
        "a delete on the clone mutated the source table")
      clone.read(spark).select("o_orderkey", "o_orderstatus", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderstatus <> 'F'""".stripMargin))

  /** q106: MERGE INTO issued as SQL TEXT — the reference's whole idiom (its
    * SCD2 merge is declarative config compiled to Delta's SQL MERGE,
    * scd2-job.ipynb:338-353). The statement goes through the real analyzer —
    * user aliases, implicit casts, clause conditions — and
    * [[graft.catalog.GraftExtensions]] routes the analyzed plan to the SAME
    * file-pruned COW merge kernel the Scala API uses; the `graft` catalog
    * resolves the table by path identifier. Update + delete + insert
    * clauses in one statement, hash-matched against the join-based oracle. */
  val q106SqlMerge: Q = Q(
    "q106_sql_merge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sqlmerge-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(
        spark.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
          |UNION ALL
          |SELECT o_orderkey + 10000000, o_custkey, 1.0
          |FROM orders WHERE o_orderkey % 1000 = 0""".stripMargin)
        .createOrReplaceTempView("q106_src")
      spark.sql(
        s"""MERGE INTO graft.`$tmp/orders_v` AS tgt USING q106_src AS src
           |ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED AND src.o_orderkey >= 2000 THEN DELETE
           |WHEN MATCHED THEN UPDATE SET o_totalprice = src.o_totalprice
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      require(t.latestVersion().contains(1L), "SQL MERGE did not commit")
      spark.sql(s"SELECT o_orderkey, o_custkey, o_totalprice FROM graft.`$tmp/orders_v`")
        .localCheckpoint(true)
    },
    Some(
      """WITH src AS (
        |  SELECT o_orderkey, o_custkey, o_totalprice * 2 AS o_totalprice
        |  FROM orders WHERE o_orderkey BETWEEN 1000 AND 2999
        |  UNION ALL
        |  SELECT o_orderkey + 10000000, o_custkey, 1.0
        |  FROM orders WHERE o_orderkey % 1000 = 0)
        |SELECT b.o_orderkey, b.o_custkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL AND s.o_orderkey < 2000
        |       THEN s.o_totalprice ELSE b.o_totalprice END AS o_totalprice
        |FROM orders b LEFT JOIN src s ON s.o_orderkey = b.o_orderkey
        |WHERE s.o_orderkey IS NULL OR s.o_orderkey < 2000
        |UNION ALL
        |SELECT s.o_orderkey, s.o_custkey, s.o_totalprice
        |FROM src s
        |WHERE NOT EXISTS (SELECT 1 FROM orders b WHERE b.o_orderkey = s.o_orderkey)""".stripMargin))

  /** q107: predicate-scoped overwrite (Delta's replaceWhere): one atomic
    * commit deletes the 'F'-status slice of a partitioned table and lands a
    * replacement batch; the OTHER partitions' manifest files are asserted
    * IDENTICAL (the file-list proof that only the matching slice was
    * rewritten — at 100 TB, replacing one partition must cost that
    * partition, not the table). The replaceWhere constraint (every inserted
    * row satisfies the predicate) is exercised by construction. */
  val q107ReplaceWhere: Q = Q(
    "q107_replace_where",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-rw-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(
        spark.sql("SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"),
        partitionBy = Seq("o_orderstatus"))
      def files(): Set[String] =
        t.read(spark).inputFiles.filter(_.contains("/data/")).toSet
      val untouchedBefore = files().filterNot(_.contains("o_orderstatus=F"))
      val replacement = spark.sql(
        """SELECT o_orderkey, o_totalprice * 10 AS o_totalprice,
          |       'F' AS o_orderstatus
          |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey < 5000""".stripMargin)
      val (v1, rewritten) = t.replaceWhere(replacement, "o_orderstatus = 'F'")
      require(rewritten > 0, "replaceWhere touched no files")
      require(t.latestVersion().contains(v1))
      val untouchedAfter = files().filterNot(_.contains("o_orderstatus=F"))
      require(untouchedAfter == untouchedBefore,
        "replaceWhere rewrote files outside the predicate's partitions")
      t.read(spark).select("o_orderkey", "o_totalprice", "o_orderstatus")
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus <> 'F'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice * 10 AS o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'F' AND o_orderkey < 5000""".stripMargin))

  /** q108: MERGE WITH SCHEMA EVOLUTION as SQL — the source carries a column
    * the target lacks; Spark computes the additive change, drives it through
    * the catalog's alterTable (→ metadata-only
    * [[graft.table.VersionedTable.evolveSchema]] — zero data I/O at any
    * table size), re-resolves the widened target, and the merge kernel runs
    * under the widened schema: matched rows take the new column's value,
    * every untouched row back-fills null through the schema'd scan. */
  val q108MergeEvolution: Q = Q(
    "q108_merge_evolution",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-evo-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(spark.sql("SELECT o_orderkey, o_totalprice FROM orders"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 'hot' AS flag
          |FROM orders WHERE o_orderkey < 1000""".stripMargin)
        .createOrReplaceTempView("q108_src")
      spark.sql(
        s"""MERGE WITH SCHEMA EVOLUTION INTO graft.`$tmp/orders_v` AS tgt
           |USING q108_src AS src ON tgt.o_orderkey = src.o_orderkey
           |WHEN MATCHED THEN UPDATE SET *
           |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
      val out = spark.sql(
        s"SELECT o_orderkey, o_totalprice, flag FROM graft.`$tmp/orders_v`")
      require(out.schema.fieldNames.contains("flag"), "schema did not widen")
      out.localCheckpoint(true)
    },
    Some(
      """WITH src AS (
        |  SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, 'hot' AS flag
        |  FROM orders WHERE o_orderkey < 1000)
        |SELECT b.o_orderkey,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN s.o_totalprice
        |       ELSE b.o_totalprice END AS o_totalprice,
        |  CASE WHEN s.o_orderkey IS NOT NULL THEN 'hot' END AS flag
        |FROM orders b LEFT JOIN src s ON b.o_orderkey = s.o_orderkey""".stripMargin))

  /** q109: Bloom-sidecar point-lookup merge — the file-skip case min-max
    * stats cannot serve. The table is committed ROUND-ROBIN (no sort), so
    * every file's [o_orderkey min, max] spans the whole key domain and
    * range pruning keeps all 8 files; the per-file Bloom sidecar
    * (`bloomIndexColumns` property, built at the write funnel) knows which
    * files actually hold the two probed keys, and the merge plans ≤ half
    * the files (asserted in-query — the 100 TB point: a 2-row CDC upsert
    * against a million-file table must not rewrite-scan every file whose
    * range happens to cover the key). Result equality is the oracle's. */
  val q109BloomMerge: Q = Q(
    "q109_bloom_merge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-bloom-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.setProperties(Map("bloomIndexColumns" -> "o_orderkey"))
      // round-robin layout: uniform keys per file defeat min-max pruning
      t.commit(spark.sql("SELECT o_orderkey, o_custkey, o_totalprice FROM orders"),
        numPartitions = Some(8))
      val src = spark.sql(
        """SELECT o_orderkey, o_custkey, o_totalprice * 0.5 AS o_totalprice
          |FROM orders
          |WHERE o_orderkey IN (SELECT MIN(o_orderkey) FROM orders
          |                     UNION ALL SELECT MAX(o_orderkey) FROM orders)""".stripMargin)
      val (_, touched) = t.mergeCow(spark, src,
        condition = "source.o_orderkey = target.o_orderkey",
        targetKey = "o_orderkey", sourceKey = "o_orderkey",
        whenMatchedUpdate = Some(graft.table.Merge.MatchedUpdate(
          None, Map("o_totalprice" -> "source.o_totalprice"))))
      require(touched <= 4,
        s"bloom sidecar should prune most of the 8 range-unprunable files, touched $touched")
      t.read(spark).select("o_orderkey", "o_custkey", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey, o_custkey,
        |  CASE WHEN o_orderkey IN (SELECT MIN(o_orderkey) FROM orders
        |                           UNION ALL SELECT MAX(o_orderkey) FROM orders)
        |       THEN o_totalprice * 0.5 ELSE o_totalprice END AS o_totalprice
        |FROM orders""".stripMargin))

  /** q110: metadata-only RENAME COLUMN via stable column ids — half the
    * corpus is written under the OLD name, the column is renamed (asserted
    * in-query: zero files rewritten), the other half lands under the NEW
    * name, and one read resolves both generations by parquet field id.
    * At 100 TB this is the difference between an ALTER costing one
    * manifest write and a full-table rewrite. */
  val q110ColumnRename: Q = Q(
    "q110_column_rename",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-rename-").toString
      val t = graft.table.VersionedTable(s"$tmp/ord")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders WHERE o_orderkey % 2 = 0"),
        numPartitions = Some(4))
      val before = t.read(spark).inputFiles.toSet
      t.renameColumn("o_totalprice", "price")
      require(t.read(spark).inputFiles.toSet == before,
        "RENAME COLUMN must not rewrite any data file")
      t.append(spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice AS price FROM orders WHERE o_orderkey % 2 = 1"))
      t.read(spark).select("o_orderkey", "o_custkey", "price")
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice AS price FROM orders"""))

  /** q111: timestamp-keyed DELETE on a CHECKPOINTED time-sorted table —
    * the checkpoint-planned temporal-bounds path end to end. The commit
    * range-sorts on `ts` so per-file stats cover disjoint time slices; the
    * head is checkpointed, so the delete plans its candidates from the
    * checkpoint parquet with the literal rendered in the recorded stats
    * zone, and the time-confined predicate touches only the leading files
    * (asserted in-query). At 100 TB this is the retention-delete shape:
    * "drop everything before T" must plan from stats, not scan the
    * manifest's million files. */
  val q111TemporalDelete: Q = Q(
    "q111_temporal_delete",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-tsdel-").toString
      val t = graft.table.VersionedTable(s"$tmp/ev")
      t.commit(spark.sql("SELECT event_id, ts, user_id, value FROM events"),
        numPartitions = Some(8), sortBy = Seq("ts"))
      t.checkpoint(spark)
      val (_, touched) = t.delete(spark, "ts < TIMESTAMP '2024-01-08 00:00:00'")
      require(touched <= 3,
        s"time-sorted layout must confine the retention delete, touched $touched of 8")
      t.read(spark).select("event_id", "ts", "user_id", "value")
    },
    Some(
      """SELECT event_id, ts, user_id, value FROM events
        |WHERE ts >= TIMESTAMP '2024-01-08 00:00:00'""".stripMargin))

  /** q112: per-partition symlink manifests as the external-engine view —
    * the reference's Athena interop artifact (`scd2-job.ipynb:382`)
    * generated through the SQL verb on a hive-partitioned table. The query
    * re-reads the table EXACTLY as an external engine would (each
    * partition's URI list from its manifest file, no graft code on the
    * read path) and returns the partition values parsed from the manifest
    * tree; row-count equality with the versioned read is asserted
    * in-query. */
  val q112SymlinkManifest: Q = Q(
    "q112_symlink_manifest",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-symlink-").toString
      val t = graft.table.VersionedTable(s"$tmp/docs")
      t.commit(spark.sql("SELECT doc_id, lang, n_chars FROM documents"),
        numPartitions = Some(2), partitionBy = Seq("lang"))
      graft.table.TableSql.run(spark,
        s"GENERATE symlink_format_manifest FOR TABLE '$tmp/docs'")
      val mroot = java.nio.file.Paths.get(s"$tmp/docs", "_symlink_format_manifest")
      import scala.jdk.CollectionConverters._
      val parts = java.nio.file.Files.list(mroot).iterator().asScala
        .filter(p => java.nio.file.Files.isDirectory(p))
        .map(_.getFileName.toString).toSeq
      val uris = parts.flatMap { p =>
        java.nio.file.Files.readAllLines(mroot.resolve(p).resolve("manifest"))
          .asScala.filter(_.nonEmpty) }
      val back = spark.read.parquet(uris.map(u =>
        java.nio.file.Paths.get(java.net.URI.create(u)).toString): _*)
      require(back.count() == t.read(spark).count(),
        "the manifest tree must list exactly the live files")
      import spark.implicits._
      parts.map(s => s.split("=", 2)(1)).sorted.toDF("lang")
    },
    Some("SELECT DISTINCT lang FROM documents"))

  /** q113: CONVERT TO GRAFT in place — a hive-partitioned parquet directory
    * written by a PLAIN (non-graft) Spark writer becomes a versioned table
    * without moving a byte: version 0 is a manifest referencing the files
    * where they lie (asserted in-query: no `data/` commit dir exists after
    * conversion). The converted table must then be a full citizen — a COW
    * DELETE lands as version 1, planned from the stats the conversion
    * collected — and the final read hash-matches the SQL oracle. At 100 TB
    * this is the adoption path: one metadata walk + one stats scan instead
    * of rewriting the corpus. */
  val q113ConvertInPlace: Q = Q(
    "q113_convert_in_place",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-convert-").toString
      spark.sql("SELECT s_suppkey, s_name, s_acctbal, s_nationkey FROM supplier")
        .repartition(4)
        .write.partitionBy("s_nationkey").parquet(s"$tmp/t")
      graft.table.TableSql.run(spark, s"CONVERT TO GRAFT '$tmp/t'")
      val t = graft.table.VersionedTable(s"$tmp/t")
      require(!java.nio.file.Files.exists(java.nio.file.Paths.get(s"$tmp/t/data")),
        "convert must not rewrite or relocate data files")
      t.delete(spark, "s_acctbal < 0.0")
      t.read(spark).select("s_suppkey", "s_name", "s_acctbal", "s_nationkey")
    },
    Some(
      """SELECT s_suppkey, s_name, s_acctbal, s_nationkey
        |FROM supplier WHERE s_acctbal >= 0.0""".stripMargin))

  /** q114: DYNAMIC PARTITION OVERWRITE — replace exactly the partitions
    * present in the batch (one recomputed, one brand-new), carry every
    * other partition forward FILE-IDENTICAL (asserted in-query via the
    * manifest file lists: untouched partitions keep their original file
    * names). The re-run-one-day idiom of partitioned pipelines: the
    * replaced set comes from the manifest's partition index, no predicate
    * scan, so a 100 TB table pays only the batch write. */
  val q114DynamicOverwrite: Q = Q(
    "q114_dynamic_overwrite",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-dpo-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(
        spark.sql("SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"),
        numPartitions = Some(4), partitionBy = Seq("o_orderstatus"))
      val before = t.showPartitions(spark)
        .select("o_orderstatus", "num_files").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val batch = spark.sql(
        """SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
          |FROM orders WHERE o_orderstatus = 'O'
          |UNION ALL
          |SELECT o_orderkey + 10000000 AS o_orderkey, 1.0 AS o_totalprice,
          |  'X' AS o_orderstatus
          |FROM orders WHERE o_orderkey % 1000 = 0""".stripMargin)
      val (_, replaced) = t.overwritePartitions(batch)
      require(replaced == before("O"),
        s"exactly partition O's $replaced files must be replaced")
      val after = t.showPartitions(spark)
        .select("o_orderstatus", "num_files").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      require(after.contains("X"), "the batch's new partition must appear")
      require(before.view.filterKeys(_ != "O").forall { case (k, n) => after(k) == n },
        "untouched partitions must carry forward")
      t.read(spark).select("o_orderkey", "o_totalprice", "o_orderstatus")
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus <> 'O'
        |UNION ALL
        |SELECT o_orderkey, o_totalprice * 2 AS o_totalprice, o_orderstatus
        |FROM orders WHERE o_orderstatus = 'O'
        |UNION ALL
        |SELECT o_orderkey + 10000000 AS o_orderkey, 1.0 AS o_totalprice,
        |  'X' AS o_orderstatus
        |FROM orders WHERE o_orderkey % 1000 = 0""".stripMargin))

  /** q116: COPY INTO — idempotent scheduled ingestion (the reference's
    * whole operating model is retried DAG jobs, scd2-job-scheduler.yaml),
    * driven THROUGH the declarative SQLExecute stage (the reference's
    * maintenance-DDL-inside-a-SQL-stage idiom, scd2-job.ipynb:373-384): a
    * first copy ingests the landing directory, an identical RE-RUN ingests
    * zero files (asserted in-query via the per-commit ingest memory — the
    * memory commits atomically with the rows, so a crash-retry can never
    * double-load), and a newly landed file ingests alone. Final state
    * hash-matches the plain UNION oracle. */
  val q116CopyInto: Q = Q(
    "q116_copy_into",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ci-").toString
      spark.sql("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0")
        .coalesce(2).write.parquet(s"$tmp/src")
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql("SELECT o_orderkey, o_totalprice FROM orders LIMIT 0"))
      def runCopy(): Unit = graft.etl.SQLExecute("copy",
        s"COPY INTO '$tmp/t' FROM '$tmp/src'").execute(spark, Map.empty)
      runCopy()
      require(t.resolve() == 1L && t.ingestOf(1L).nonEmpty,
        "first copy must commit one ingesting version")
      runCopy()
      require(t.resolve() == 1L,
        s"identical re-run must ingest nothing, head moved to ${t.resolve()}")
      // a new batch lands; only it ingests
      spark.sql("SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 1")
        .coalesce(1).write.mode("append").parquet(s"$tmp/src")
      runCopy()
      require(t.resolve() == 2L &&
          (t.ingestOf(2L).toSet -- t.ingestOf(1L).toSet).size == 1,
        "only the newly landed file may ingest")
      t.read(spark).select("o_orderkey", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 <= 1"""))

  /** q117: GENERATED PARTITION COLUMN — the table is partitioned by
    * `day = CAST(ts AS DATE)`, declared once and computed by the engine
    * (the batch never supplies it); the manifest partition index prunes a
    * single-day read to a strict file subset (asserted in-query). The
    * time-partitioned ingest layout every event lake uses, with the
    * partition column provably consistent with its source. */
  val q117GeneratedPartition: Q = Q(
    "q117_generated_partition",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-gen-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql("SELECT event_id, ts, value FROM events"),
        partitionBy = Seq("day"),
        generatedColumns = Map("day" -> "CAST(ts AS DATE)"))
      val d = spark.sql("SELECT CAST(min(ts) AS DATE) FROM events").head.getDate(0)
      val (_, kept, total) = t.readPartitioned(spark, s"day = DATE'$d'")
      require(kept < total,
        s"a one-day read must prune the partition index ($kept/$total)")
      t.read(spark).select("event_id", "ts", "value", "day")
    },
    Some(
      """SELECT event_id, ts, value, CAST(ts AS DATE) AS day FROM events"""))

  /** q118: REORG ... APPLY (PURGE) through the gate — the targeted DV
    * materialization verb for MOR tables that delete continuously. The
    * table is range-clustered on o_orderkey into 8 files; a MOR delete of
    * one contiguous key range tombstones a 1–2 file subset; the purge
    * (spelled as SQL through the declarative stage dispatcher, the
    * reference's SQL-stage idiom) must materialize every tombstone while
    * rewriting ONLY the touched subset. Plan properties asserted
    * in-query: DVs present before / zero after; rows identical; the
    * VACUUM DRY RUN preview of now-unreferenced files — exactly the
    * purge's rewrite set plus its DV sidecar — stays at or below half of
    * the 8 data files, proving the clean files carried verbatim. */
  val q118ReorgPurge: Q = Q(
    "q118_reorg_purge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-reorg-").toString
      val t = graft.table.VersionedTable(s"$tmp/o")
      t.commit(
        spark.table("orders")
          .selectExpr("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice"),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      t.deleteMor(spark, "o_orderkey BETWEEN 1000 AND 1999")
      require(t.detail(spark).select("num_deletion_vectors").head.getLong(0) > 0,
        "the MOR delete must leave DV tombstones")
      JobSpec(Seq(SQLExecute("purge", s"REORG TABLE '$tmp/o' APPLY (PURGE)")))
        .run(spark, Map.empty)
      require(t.detail(spark).select("num_deletion_vectors").head.getLong(0) == 0L,
        "the purge must materialize every tombstone")
      val swept = t.vacuumDryRun(retainVersions = 1)
      val sweptData = swept.count(f => f.startsWith("data/"))
      require(sweptData >= 1 && sweptData <= 4,
        s"purge must rewrite only the tombstoned file subset (at most half " +
          s"of the 8 range-clustered files), but $sweptData became unreferenced")
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice FROM orders
        |WHERE o_orderkey NOT BETWEEN 1000 AND 1999""".stripMargin))

  /** q121: right-to-be-forgotten lifecycle — COPY-ON-WRITE delete of one
    * user, then VACUUM down to the live version, with PHYSICAL erasure
    * proven in-query: every parquet file left on disk is re-read
    * DIRECTLY (bypassing the manifest) and must contain zero rows of the
    * forgotten user. The verb choices are the compliance-critical part
    * and the scaladoc of record: the delete must be COW (a MOR tombstone
    * leaves the bytes in place), the vacuum must drop every pre-delete
    * version (time travel to them is the data-retention hole), and the
    * table must not carry stored change capture (a CDF `cdf/` tree would
    * retain the deleted rows as change rows — enableChangeDataFeed and
    * forget-me are incompatible retentions). */
  val q121ForgetUser: Q = Q(
    "q121_forget_user",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-forget-").toString
      val t = graft.table.VersionedTable(s"$tmp/ev")
      t.commit(spark.table("events")
          .select("event_id", "ts", "user_id", "event_type", "value"),
        numPartitions = Some(8))
      t.delete(spark, "user_id = 7") // COW: rewrites the touched files
      val swept = t.vacuum(retainVersions = 1, orphanRetentionMs = 0L)
      require(swept > 0, "vacuum must physically drop the pre-delete files")
      // physical proof: every byte left on disk, read WITHOUT the manifest
      val raw = spark.read.option("recursiveFileLookup", "true")
        .parquet(s"$tmp/ev/data")
      require(raw.filter(col("user_id") === 7).count() == 0L,
        "a file on disk still contains the forgotten user")
      // ...and time travel to the pre-delete version is gone, not readable
      val travel = scala.util.Try(t.read(spark, versionAsOf = Some(0L)).count())
      require(travel.isFailure,
        "the pre-delete version must not be readable after the forget vacuum")
      t.read(spark)
    },
    Some(
      """SELECT event_id, ts, user_id, event_type, value FROM events
        |WHERE user_id <> 7""".stripMargin))

  /** q122: partition evolution (Iceberg's layout verb, here via
    * `ALTER TABLE ... SET PARTITIONED BY`) — the table's partition spec
    * changes METADATA-ONLY (asserted: same version's data files carry
    * verbatim), a post-evolution batch lands in the new layout, a
    * partition-pruned read on the NEW spec column prunes new-epoch files
    * while keeping the legacy epoch conservatively and still returns
    * exactly the predicate's rows, and a plain OPTIMIZE migrates every
    * epoch into the current spec (asserted un-mixed). At 100 TB this is
    * the only affordable way to change partitioning — rewriting a
    * petabyte of history to re-bucket it is not a plan. */
  val q122PartitionEvolution: Q = Q(
    "q122_partition_evolution",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-pe-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority FROM orders"),
        numPartitions = Some(2), partitionBy = Seq("o_orderstatus"))
      val filesBefore = t.detail(spark).select("num_files").head.getLong(0)
      val v1 = t.resolve()
      graft.table.TableSql.run(spark,
        s"ALTER TABLE '$tmp/t' SET PARTITIONED BY (o_orderpriority)")
      require(t.resolve() == v1 + 1 &&
        t.detail(spark).select("num_files").head.getLong(0) == filesBefore,
        "evolution must burn one metadata-only version, rewriting nothing")
      require(t.mixedLayoutOf(t.resolve()), "pre-evolution files are a legacy epoch")
      // a post-evolution batch lands under the NEW spec
      t.append(spark.sql(
        """SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
          |  o_orderstatus, o_orderpriority
          |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin),
        numPartitions = Some(2))
      // pruned read on the new spec: new-epoch files of other priorities
      // prune by metadata, the legacy epoch is kept conservatively, and the
      // row filter makes the result exactly the predicate's rows
      val (pruned, kept, total) = t.readPartitioned(spark, "o_orderpriority = '1-URGENT'")
      require(kept < total,
        s"new-epoch files of other priorities must prune by metadata ($kept/$total)")
      val expect = spark.sql(
        """SELECT count(*) FROM orders WHERE o_orderpriority = '1-URGENT'""")
        .head.getLong(0) +
        spark.sql("""SELECT count(*) FROM orders
          |WHERE o_orderkey % 100 = 0 AND o_orderpriority = '1-URGENT'""".stripMargin)
        .head.getLong(0)
      require(pruned.count() == expect,
        "the conservative keep must still return exactly the predicate's rows")
      // OPTIMIZE migrates the legacy epoch into the current spec
      t.compact(spark, numFiles = 4)
      require(!t.mixedLayoutOf(t.resolve()), "OPTIMIZE must migrate all epochs")
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority FROM orders
        |UNION ALL
        |SELECT o_orderkey + 100000000 AS o_orderkey, o_totalprice,
        |  o_orderstatus, o_orderpriority
        |FROM orders WHERE o_orderkey % 100 = 0""".stripMargin))

  /** q123: column DEFAULT values (Delta's `allowColumnDefaults`, SQL
    * standard CURRENT-DEFAULT semantics): a batch that OMITS the column
    * gets the default in force AT WRITE TIME, a supplied value wins, and
    * changing the default (here through the SQL path-identifier DDL,
    * `ALTER TABLE graft.\`<path>\` ALTER COLUMN ... SET DEFAULT`) affects
    * only later writes — never a backfill. The oracle replays the three
    * batches with their literals. */
  val q123ColumnDefaults: Q = Q(
    "q123_column_defaults",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-cd-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql(
        """SELECT o_orderkey, o_totalprice,
          |  CAST(NULL AS STRING) AS priority_class
          |FROM orders LIMIT 0""".stripMargin))
      t.setColumnDefault(spark, "priority_class", Some("'unclassified'"))
      // batch 1 omits the column: the CURRENT default fills
      t.append(spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 0"))
      // batch 2 supplies it: the supplied value wins
      t.append(spark.sql(
        """SELECT o_orderkey, o_totalprice, o_orderpriority AS priority_class
          |FROM orders WHERE o_orderkey % 3 = 1""".stripMargin))
      // the default changes through the SQL DDL surface; only batch 3 sees it
      spark.sql("ALTER TABLE graft.`" + tmp + "/t` " +
        "ALTER COLUMN priority_class SET DEFAULT 'express'")
      t.append(spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 3 = 2"))
      require(t.history(spark).filter("operation = 'SET DEFAULT'").count() == 2,
        "both default changes must be metadata-only commits")
      require(t.read(spark).filter("priority_class = 'express'").count() ==
        t.read(spark).filter("o_orderkey % 3 = 2").count(),
        "a changed default must apply to LATER batches only, never backfill")
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_totalprice, 'unclassified' AS priority_class
        |FROM orders WHERE o_orderkey % 3 = 0
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, o_orderpriority AS priority_class
        |FROM orders WHERE o_orderkey % 3 = 1
        |UNION ALL
        |SELECT o_orderkey, o_totalprice, 'express' AS priority_class
        |FROM orders WHERE o_orderkey % 3 = 2""".stripMargin))

  /** q124: row tracking — stable per-row ids surviving every rewrite
    * (Delta's feature): one backfill rewrite stamps `_row_id` in snapshot
    * order, the column becomes the identity column (allocation above the
    * water, targeted writes refuse), a COW UPDATE and a full OPTIMIZE
    * carry every id verbatim (asserted in-query by joining the pre/post
    * id→key maps), and the CDF delete+insert pair of the update stitches
    * back into "this row changed" by joining on the id — the consumer
    * capability row ids exist for. Ids are deterministic here (single
    * sorted backfill file), so the DuckDB oracle replays them with
    * row_number(). */
  val q124RowTracking: Q = Q(
    "q124_row_tracking",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-rt-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice FROM orders WHERE o_orderkey % 5 = 0"),
        numPartitions = Some(1), sortBy = Seq("o_orderkey"))
      t.enableRowTracking(spark)
      val tracked = t.resolve()
      val before = t.read(spark).select("_row_id", "o_orderkey")
      t.update(spark, "o_orderkey % 25 = 0", Map("o_totalprice" -> "o_totalprice * 2"))
      t.compact(spark)
      // stability proof: every (id, key) pair survives the rewrites
      val after = t.read(spark).select("_row_id", "o_orderkey")
      require(before.except(after).isEmpty && after.except(before).isEmpty,
        "UPDATE/OPTIMIZE changed a row's id")
      // CDF stitch: the update's delete+insert pair joins back by id
      val cdf = t.changeFeed(spark, tracked, tracked + 1)
      val stitched = cdf.filter("_change_type = 'delete'")
        .select(col("_row_id"), col("o_totalprice").as("old_p"))
        .join(cdf.filter("_change_type = 'insert'")
          .select(col("_row_id"), col("o_totalprice").as("new_p")), "_row_id")
      require(stitched.filter("new_p = old_p * 2").count() ==
        spark.sql("SELECT count(*) FROM orders WHERE o_orderkey % 25 = 0").head.getLong(0),
        "every changed row must stitch into exactly one update by its id")
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey,
        |  CASE WHEN o_orderkey % 25 = 0 THEN o_totalprice * 2
        |       ELSE o_totalprice END AS o_totalprice,
        |  row_number() OVER (ORDER BY o_orderkey) AS _row_id
        |FROM orders WHERE o_orderkey % 5 = 0""".stripMargin))

  /** q126: metadata-only count(*) — the DSv2 scan accepts Spark's
    * aggregate pushdown for an unfiltered, ungrouped count and answers it
    * from the manifest's per-file row counts with deletion-vector
    * tombstones subtracted; the executed plan is asserted in-query to
    * contain the metadata scan and NO file scan. At 100 TB `SELECT
    * count(*)` is an operational liveness probe run constantly — a full
    * scan per probe is absurd, a manifest read is free. */
  val q126MetaCount: Q = Q(
    "q126_meta_count",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-mc-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.setProperties(Map("enableDeletionVectors" -> "true"))
      t.commit(spark.sql("SELECT o_orderkey, o_totalprice FROM orders"),
        numPartitions = Some(4))
      t.deleteMor(spark, "o_orderkey % 10 = 0") // DVs must subtract
      val df = spark.sql("SELECT count(*) AS n FROM graft.`" + tmp + "/t`")
      require(df.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "an unfiltered count(*) must be served from manifest metadata:\n" +
          df.queryExecution.executedPlan.toString)
      df
    },
    Some("SELECT count(*) AS n FROM orders WHERE o_orderkey % 10 <> 0"))

  /** q128: nullCount file statistics — the manifest records per-file null
    * counts alongside min/max (Delta/Iceberg parity), so `IS NULL` skips
    * every fully-populated file and `IS NOT NULL` skips all-null files at
    * the manifest, before any I/O (asserted in-query via readBounded's
    * kept/total, the q101 pattern). The write range-sorts on the nullable
    * column so nulls cluster into whole files — the layout a real pipeline
    * gets from clustering on the sparse column it later filters on. At
    * 100 TB `WHERE col IS NOT NULL` over a mostly-null enrichment column
    * is a constant shape (joins emit it implicitly for every key); skipping
    * the all-null mass at the manifest is the difference between reading
    * the populated slice and scanning the table. */
  val q128NullPruning: Q = Q(
    "q128_null_pruning",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-np-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql(
        """SELECT o_orderkey,
          |  CASE WHEN o_orderkey % 4 = 0 THEN NULL
          |       ELSE o_orderpriority END AS prio,
          |  o_totalprice FROM orders""".stripMargin),
        numPartitions = Some(8), sortBy = Seq("prio"))
      // both null-predicate shapes must skip files purely from the manifest
      val (_, keptNull, total) = t.readBounded(spark, Nil,
        nullness = Seq(("prio", true)))
      require(keptNull < total,
        s"IS NULL nullCount skipping did not engage ($keptNull/$total files)")
      val (_, keptNotNull, _) = t.readBounded(spark, Nil,
        nullness = Seq(("prio", false)))
      require(keptNotNull < total,
        s"IS NOT NULL nullCount skipping did not engage ($keptNotNull/$total files)")
      // count(col) — the non-null count — serves from the same pseudo-stats
      // (rows − nulls per file, DV-free): metadata plan, exact value;
      // count(DISTINCT col) can never take the path
      val cnt = spark.sql(s"SELECT count(prio) AS n FROM graft.`$tmp/t`")
      require(cnt.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "count(col) over a DV-free snapshot must serve from manifest metadata")
      val exactNonNull = spark.sql(
        "SELECT count(*) FROM orders WHERE o_orderkey % 4 <> 0").head.getLong(0)
      require(cnt.head.getLong(0) == exactNonNull,
        s"metadata count(prio) must equal the exact non-null count")
      val dist = spark.sql(s"SELECT count(DISTINCT prio) AS n FROM graft.`$tmp/t`")
      require(!dist.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "count(DISTINCT col) must scan")
      spark.sql(
        s"""SELECT 'is_null' AS side, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           |FROM graft.`$tmp/t` WHERE prio IS NULL
           |UNION ALL
           |SELECT 'not_null' AS side, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           |FROM graft.`$tmp/t` WHERE prio IS NOT NULL""".stripMargin)
        .localCheckpoint(true)
    },
    Some(
      """WITH t AS (
        |  SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |              ELSE o_orderpriority END AS prio,
        |         o_totalprice FROM orders)
        |SELECT 'is_null' AS side, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM t WHERE prio IS NULL
        |UNION ALL
        |SELECT 'not_null' AS side, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM t WHERE prio IS NOT NULL""".stripMargin))

  /** q143: NESTED-column file statistics (round 15) — the manifest records
    * per-file min/max/nullCount for STRUCT LEAVES under dotted keys
    * (Delta's nested-stats convention), so a predicate on `meta.fmt` — the
    * engine's own multimodal metadata shape (m1 reads `meta.format`) —
    * skips files at the manifest exactly like a top-level predicate. The
    * write range-sorts on the leaf so values and nulls cluster into whole
    * files; asserted in-query: nested equality bounds, a nested numeric
    * range bound, and both nested nullness shapes each skip files
    * (readBounded kept/total, q128's pattern), and the DSv2 SQL plan
    * carries the dot-joined pushed filter. At 100 TB metadata columns ride
    * as structs precisely so the scan stays narrow — without leaf stats,
    * every `WHERE meta.fmt = 'png'` reads the whole corpus. */
  val q143NestedPruning: Q = Q(
    "q143_nested_pruning",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-nsp-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql(
        """SELECT o_orderkey,
          |  named_struct(
          |    'fmt', CASE WHEN o_orderkey % 4 = 0 THEN NULL
          |                ELSE o_orderpriority END,
          |    'kb', o_orderkey % 1000) AS meta,
          |  o_totalprice FROM orders""".stripMargin),
        numPartitions = Some(8), sortBy = Seq("meta.fmt"))
      // struct-leaf bounds and nullness must skip files purely from the
      // manifest — all four prune shapes, before any I/O
      val (_, keptEq, total) = t.readBounded(spark,
        Seq(("meta.fmt", Some("URGENT"), Some("URGENT"))))
      require(keptEq < total,
        s"nested equality skipping did not engage ($keptEq/$total files)")
      val (_, keptNull, _) = t.readBounded(spark, Nil,
        nullness = Seq(("meta.fmt", true)))
      require(keptNull < total,
        s"nested IS NULL skipping did not engage ($keptNull/$total files)")
      val (_, keptNotNull, _) = t.readBounded(spark, Nil,
        nullness = Seq(("meta.fmt", false)))
      require(keptNotNull < total,
        s"nested IS NOT NULL skipping did not engage ($keptNotNull/$total)")
      // the SQL surface pushes the nested reference dot-joined — the name
      // IS the stats key, so the catalog scan prunes with no mapping
      val served = spark.sql(
        s"""SELECT meta.fmt AS fmt, count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
           |FROM graft.`$tmp/t`
           |WHERE meta.fmt IS NOT NULL AND meta.kb >= 500
           |GROUP BY meta.fmt""".stripMargin)
      require(served.queryExecution.executedPlan.toString.contains("meta.fmt"),
        "the nested predicate must reach the scan as a pushed filter")
      served.localCheckpoint(true)
    },
    Some(
      """WITH t AS (
        |  SELECT CASE WHEN o_orderkey % 4 = 0 THEN NULL
        |              ELSE o_orderpriority END AS fmt,
        |         o_orderkey % 1000 AS kb, o_totalprice FROM orders)
        |SELECT fmt, count(*) AS n,
        |  CAST(sum(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS revenue
        |FROM t WHERE fmt IS NOT NULL AND kb >= 500
        |GROUP BY fmt""".stripMargin))

  /** q129: MIN/MAX aggregate pushdown — an unfiltered, ungrouped MIN/MAX
    * (and count(*)) over a DV-free snapshot is answered from manifest
    * stats alone: the executed plan is asserted in-query to contain the
    * metadata scan and NO file scan. The negatives are asserted too — a
    * FILTERED aggregate, a snapshot carrying deletion vectors (whose
    * tombstone may hide the extreme row; the scan must return the
    * post-delete max, not the stats max), and a stats-off table all take
    * the real scan. At 100 TB `SELECT max(ingest_key)` is the freshness
    * probe every downstream scheduler polls; a manifest read per poll vs a
    * table scan is the whole game. */
  val q129MetaMinMax: Q = Q(
    "q129_meta_minmax",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-mm-").toString
      val t = graft.table.VersionedTable(s"$tmp/t")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"),
        numPartitions = Some(4))
      val df = spark.sql(
        s"""SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
           |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
           |  max(o_orderpriority) AS max_prio, count(*) AS n
           |FROM graft.`$tmp/t`""".stripMargin)
      val plan = df.queryExecution.executedPlan.toString
      require(plan.contains("GraftMetaAggScan"),
        s"unfiltered MIN/MAX must be served from manifest metadata:\n$plan")
      require(!plan.contains("GraftScan("),
        s"the metadata-served aggregate must not also scan files:\n$plan")
      // negative 1: a FILTERED aggregate takes the real scan
      val filtered = spark.sql(
        s"SELECT max(o_orderkey) AS m FROM graft.`$tmp/t` WHERE o_totalprice > 100")
      require(!filtered.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "a filtered aggregate must scan — stats cannot see the filter")
      // negative 2: a snapshot with DVs scans, and returns the POST-delete
      // extreme (the stats max row is tombstoned)
      val t2 = graft.table.VersionedTable(s"$tmp/t2")
      t2.setProperties(Map("enableDeletionVectors" -> "true"))
      t2.commit(spark.sql("SELECT o_orderkey FROM orders"), numPartitions = Some(4))
      val trueMax = spark.sql("SELECT max(o_orderkey) FROM orders").head.getLong(0)
      t2.deleteMor(spark, s"o_orderkey = $trueMax")
      val mm2 = spark.sql(s"SELECT max(o_orderkey) AS m FROM graft.`$tmp/t2`")
      require(!mm2.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "a DV-carrying snapshot must scan — the tombstone may hide the extreme")
      require(mm2.head.getLong(0) < trueMax,
        "the scanned max must reflect the deleted extreme row")
      // negative 3: a stats-off table scans
      val t3 = graft.table.VersionedTable(s"$tmp/t3")
      t3.commit(spark.sql("SELECT o_orderkey FROM orders"),
        numPartitions = Some(2), collectStats = false)
      val mm3 = spark.sql(s"SELECT max(o_orderkey) AS m FROM graft.`$tmp/t3`")
      require(!mm3.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
        "a stats-less table must scan")
      df.localCheckpoint(true)
    },
    Some(
      """SELECT min(o_orderkey) AS min_key, max(o_orderkey) AS max_key,
        |  min(o_totalprice) AS min_price, max(o_totalprice) AS max_price,
        |  max(o_orderpriority) AS max_prio, count(*) AS n
        |FROM orders""".stripMargin))

  /** q132: incremental clustering — two append batches, a cluster run after
    * each; the second run must cluster ONLY the second batch's files (every
    * file the first run produced carries verbatim into the new version —
    * the ZCube property that makes nightly OPTIMIZE O(new data) instead of
    * O(table) at 100 TB), and the layout must still skip files on BOTH
    * z-dimensions across cubes. Content equality vs the plain SQL select. */
  val q132IncrementalCluster: Q = Q(
    "q132_incremental_cluster",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-ic-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      val proj = spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      t.append(proj.filter("o_orderkey % 2 = 0"), numPartitions = Some(4))
      JobSpec(Seq(TableCluster("cluster new", "${lake}/orders_v",
        zOrderBy = Seq("o_custkey", "o_orderkey"), numFiles = Some(4))))
        .run(spark, Map("lake" -> tmp))
      val cube1 = t.filesOf(t.resolve()).toSet
      t.append(proj.filter("o_orderkey % 2 = 1"), numPartitions = Some(4))
      val beforeSecond = t.filesOf(t.resolve()).toSet
      t.clusterIncremental(spark, Seq("o_custkey", "o_orderkey"),
        numFiles = Some(4))
      val after = t.filesOf(t.resolve()).toSet
      require(cube1.subsetOf(after),
        s"the second run must leave the first cube's ${cube1.size} files " +
          s"untouched (${(cube1 -- after).size} were rewritten)")
      require((beforeSecond -- cube1).forall(f => !after.contains(f)),
        "the second run must rewrite every unclustered append file")
      // a third run with nothing new is a no-op: no version burned
      val head = t.resolve()
      t.clusterIncremental(spark, Seq("o_custkey", "o_orderkey"))
      require(t.resolve() == head, "a fully clustered table must no-op")
      // cross-cube skipping on the SECOND dimension a range sort can't serve
      val (pruned, sCust, total) = t.readPruned(spark, "o_custkey", "100", "499")
      require(sCust < total,
        s"incremental clustering must allow skipping on o_custkey ($sCust of $total)")
      pruned.filter(col("o_custkey").between(100, 499))
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_custkey BETWEEN 100 AND 499""".stripMargin))

  /** q133: incremental CLONE SYNC — the nightly-backup refresh verb
    * (Delta's `CREATE OR REPLACE ... CLONE src` re-run on a schedule). A
    * deep clone is taken at v0; the source then appends a second batch and
    * COW-deletes a key range; one `cloneSync` brings the backup to the
    * current snapshot transferring ONLY the files the target lacks
    * (asserted: 0 < transferred < referenced — the surviving first-batch
    * files are never re-copied, so at 100 TB a nightly refresh costs
    * O(day's churn), not O(table)). A second sync is a no-op that burns no
    * target version; the FIRST sync point stays time-travelable on the
    * target's own chain (restore-point semantics); a target this table did
    * not create is refused (cloneSource provenance). Content equality of
    * the refreshed backup vs the plain SQL oracle. */
  val q133CloneSync: Q = Q(
    "q133_clone_sync",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-csync-").toString
      val src = graft.table.VersionedTable(s"$tmp/src")
      val proj = spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders")
      src.commit(proj.filter("o_orderkey % 2 = 0"),
        numPartitions = Some(4), sortBy = Seq("o_orderkey"))
      src.cloneDeep(s"$tmp/bak")
      val bak = graft.table.VersionedTable(s"$tmp/bak")
      val firstSync = bak.resolve()
      val countAtFirst = bak.read(spark).count()
      // the source moves on: an append batch and a COW delete
      src.append(proj.filter("o_orderkey % 2 = 1"),
        numPartitions = Some(4), sortBy = Seq("o_orderkey"))
      src.delete(spark, "o_orderkey <= 200")
      val (copied, refs) = src.cloneSync(s"$tmp/bak")
      require(copied > 0 && copied < refs,
        s"sync must transfer only the delta, not the table ($copied of $refs)")
      // re-sync of an already-current target: nothing moves, no version burned
      val head = bak.latestVersion().get
      val (again, _) = src.cloneSync(s"$tmp/bak")
      require(again == 0 && bak.latestVersion().contains(head),
        "a second sync of a current backup must be a version-free no-op")
      // the pre-refresh sync point survives as a restore point on the TARGET
      require(bak.read(spark, versionAsOf = Some(firstSync)).count() == countAtFirst,
        "the first sync point must stay time-travelable on the backup's chain")
      // provenance guard: an unrelated table refuses the publish
      val other = graft.table.VersionedTable(s"$tmp/other")
      other.commit(proj.limit(10), numPartitions = Some(1))
      val refused =
        try { src.cloneSync(s"$tmp/other"); false }
        catch { case _: IllegalArgumentException => true }
      require(refused, "cloneSync must refuse a target it did not create")
      bak.read(spark).select("o_orderkey", "o_orderstatus", "o_totalprice")
    },
    Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice
        |FROM orders WHERE o_orderkey > 200""".stripMargin))

  /** q134: POINT-LOOKUP read — `readByKeys` serves `key IN (...)` from
    * file-skipping metadata alone, on BOTH layouts that matter: a sorted
    * table prunes by per-KEY min-max stats (2 scattered keys keep ~2 of 8
    * files — the range HULL would have kept all 8), and a round-robin
    * table — where every file's range spans the whole domain and stats
    * cannot skip anything — prunes by the Bloom sidecars instead (asserted
    * ≤ half the files). The two reads must agree row-for-row. This is the
    * serving half of q109's Bloom-pruned merge: the operational "fetch
    * these ids from a 100 TB table" probe that reads a handful of files,
    * never the table. */
  val q134PointLookup: Q = Q(
    "q134_point_lookup",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-pl-").toString
      val proj = spark.sql(
        "SELECT o_orderkey, o_custkey, o_totalprice FROM orders")
      val keys = spark.sql(
        "SELECT min(o_orderkey), max(o_orderkey) FROM orders").head()
      val ks = Seq(keys.getLong(0).toString, keys.getLong(1).toString)
      // layout 1: sorted — per-key stats skipping, no index needed
      val sorted = graft.table.VersionedTable(s"$tmp/sorted")
      sorted.commit(proj, numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val (dfS, keptS, totalS) = sorted.readByKeys(spark, "o_orderkey", ks)
      require(keptS <= 2 && keptS < totalS,
        s"sorted layout: 2 point keys must keep ~2 files ($keptS/$totalS)")
      // layout 2: round-robin — stats cannot skip, the Bloom sidecar does
      val rr = graft.table.VersionedTable(s"$tmp/rr")
      rr.setProperties(Map("bloomIndexColumns" -> "o_orderkey"))
      rr.commit(proj, numPartitions = Some(8))
      val (dfR, keptR, totalR) = rr.readByKeys(spark, "o_orderkey", ks)
      require(keptR <= 4 && keptR < totalR,
        s"round-robin layout: the Bloom sidecar must prune ($keptR/$totalR)")
      val inK = col("o_orderkey").isin(ks.map(_.toLong): _*)
      val a = dfS.filter(inK)
      val b = dfR.filter(inK)
      require(a.exceptAll(b).isEmpty && b.exceptAll(a).isEmpty,
        "the two pruned reads must serve identical rows")
      b
    },
    Some(
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
        |WHERE o_orderkey IN (SELECT min(o_orderkey) FROM orders
        |                     UNION ALL SELECT max(o_orderkey) FROM orders)"""
        .stripMargin))

  /** q135: declarative data-quality EXPECTATIONS (the DLT shape) — a
    * quarantine-mode ExpectTransform splits orders on two named
    * expectations; passing rows flow on as the output view, failing rows
    * land in a versioned quarantine table WITH the names of the
    * expectations they broke, and the metrics view carries per-expectation
    * violation counts. In-query cross-checks: kept + quarantined = input
    * (no row lost or duplicated), the metrics counts equal independent
    * recomputation, and a multi-violation row carries BOTH names. The
    * whole stage is one filtered scan + one failing-rows append + one
    * aggregate — no collect, 100 TB-shaped. Oracle: the passing rows. */
  val q135Expectations: Q = Q(
    "q135_expectations",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-dq-").toString
      JobSpec(Seq(
        SQLTransform("src",
          "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders",
          "q135_src"),
        ExpectTransform("dq", "q135_src", "q135_clean",
          Seq("priority_specified" -> "o_orderpriority <> '4-NOT SPECIFIED'",
            "price_cap" -> "o_totalprice < 300000"),
          onViolation = "quarantine",
          quarantineURI = Some("${lake}/quarantine"),
          metricsView = Some("q135_metrics"))
      )).run(spark, Map("lake" -> tmp))
      val clean = spark.table("q135_clean")
      val quar = graft.table.VersionedTable(s"$tmp/quarantine").read(spark)
      val total = spark.table("q135_src").count()
      require(clean.count() + quar.count() == total,
        "kept + quarantined must partition the input")
      // metrics agree with an independent recomputation
      val m = spark.table("q135_metrics").collect()
        .map(r => r.getString(0) -> r.getLong(1)).toMap
      val prioViol = spark.table("q135_src")
        .filter("o_orderpriority = '4-NOT SPECIFIED'").count()
      val priceViol = spark.table("q135_src")
        .filter("o_totalprice >= 300000").count()
      require(m("priority_specified") == prioViol && m("price_cap") == priceViol,
        s"metrics mismatch: $m vs ($prioViol, $priceViol)")
      // a row violating BOTH expectations carries both names
      val both = quar.filter(
        "o_orderpriority = '4-NOT SPECIFIED' AND o_totalprice >= 300000")
      require(both.count() == 0 ||
        both.filter("_violations = 'priority_specified,price_cap'").count()
          == both.count(),
        "multi-violation rows must name every broken expectation")
      clean
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderpriority <> '4-NOT SPECIFIED'
        |  AND o_totalprice < 300000""".stripMargin))

  /** q136: FSCK — the manifest reconciled with physical storage after an
    * ops incident deletes data files out from under the log. One
    * partition's files are removed ON DISK (the manifest still references
    * them: a plain read now crashes — asserted); `fsck(dryRun)` names
    * exactly the lost files without committing, then the repair publishes
    * one head version referencing only the survivors, so reads work again
    * and the loss is explicit and bounded. A clean table FSCKs to a no-op
    * (no version burned — asserted). Metadata-plane only: one existence
    * check per referenced file, no data I/O; at 100 TB the cost is the
    * file listing, not the table. Oracle: the surviving partitions. */
  val q136Fsck: Q = Q(
    "q136_fsck",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-fsck-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_pt")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders"),
        partitionBy = Seq("o_orderpriority"))
      // a clean table is a no-op: nothing missing, no version burned
      val head = t.resolve()
      require(t.fsck() == ((Nil, None)) && t.resolve() == head,
        "fsck of an intact table must be a version-free no-op")
      // the incident: one partition's files vanish from disk
      val v = t.resolve()
      val lost = t.partitionValuesOf(v).collect {
        case (f, pv) if pv.get("o_orderpriority").flatten.contains("5-LOW") => f
      }.toSeq
      require(lost.nonEmpty, "expected a 5-LOW partition file")
      lost.foreach { f =>
        java.nio.file.Files.delete(java.nio.file.Paths.get(s"$tmp/orders_pt").resolve(f))
      }
      // a plain read of the damaged head fails
      val broken =
        try { t.read(spark).count(); false } catch { case _: Exception => true }
      require(broken, "reading a manifest that references lost files must fail")
      // dry run names exactly the losses, commits nothing
      val (dryMissing, dryV) = t.fsck(dryRun = true)
      require(dryMissing.sorted == lost.sorted && dryV.isEmpty && t.resolve() == v,
        "dry run must name the lost files and burn no version")
      // the repair: one new version over the survivors
      val (missing, nv) = t.fsck()
      require(missing.sorted == lost.sorted && nv.contains(v + 1),
        s"fsck must drop exactly the lost files ($missing)")
      t.read(spark).select("o_orderkey", "o_totalprice", "o_orderpriority")
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderpriority FROM orders
        |WHERE o_orderpriority <> '5-LOW'""".stripMargin))

  /** q138: METADATA TABLES — Iceberg's dotted-suffix inspection surface
    * (`graft.<tbl>.files` / `.partitions` / `.history`) as plain SQL
    * relations through the catalog, planned as LOCAL scans over
    * manifest/DV-sidecar metadata (O(files)+O(versions) driver rows, zero
    * data I/O — at 100 TB inspecting the table costs the manifest, not a
    * scan). The table carries DVs on purpose: `.files` must report
    * write-time row_count AND dv_rows so live = row_count − dv_rows, and
    * `.partitions`' num_rows must be DV-exact (the q129 never-serve-a-guess
    * discipline: a stats-less file nulls its partition instead). In-query:
    * .files row/size sanity against the manifest, .history row-per-version.
    * Oracle: per-partition live counts recomputed relationally. */
  val q138MetadataTables: Q = Q(
    "q138_metadata_tables",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-meta-").toString
      val root = s"$tmp/orders_pt"
      val t = graft.table.VersionedTable(root)
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"),
        partitionBy = Seq("o_orderstatus"))
      val (_, deleted) = t.deleteMor(spark, "o_orderkey % 97 = 3")
      require(deleted > 0, "expected DV-deleted rows")
      val total = spark.table("orders").count()
      val files = spark.sql(s"SELECT * FROM graft.`$root`.files")
      require(files.count() == t.filesOf(t.resolve()).size,
        ".files must list exactly the head's live files")
      require(files.selectExpr("sum(row_count - dv_rows)").head.getLong(0)
        == total - deleted,
        ".files live counts (row_count - dv_rows) must sum to the table")
      require(files.filter("size_bytes <= 0 OR partition IS NULL").count() == 0,
        ".files must carry sizes and partition tuples")
      val hist = spark.sql(s"SELECT * FROM graft.`$root`.history")
      require(hist.count() == t.versions().size,
        ".history must carry one row per retained version")
      spark.sql(
        s"""SELECT o_orderstatus, num_rows AS n
           |FROM graft.`$root`.partitions""".stripMargin)
    },
    Some(
      """SELECT o_orderstatus, count(*) AS n FROM orders
        |WHERE NOT (o_orderkey % 97 = 3)
        |GROUP BY o_orderstatus""".stripMargin))

  /** q139: DML with IN-SUBQUERY conditions — the compliance shape
    * (`DELETE FROM facts WHERE id IN (SELECT id FROM requests)`) and its
    * UPDATE twin, both rewritten by [[graft.catalog.GraftExtensions]] to
    * the kernel's KEYED MERGE: the subquery executes once as the merge
    * source and the join is the file/Bloom-pruned equi-merge — never a
    * driver-materialized id list, never a per-id loop. Asserted in-query
    * via history metrics: the key-confined delete rewrites a strict subset
    * of the table's files (the sorted layout localizes the subquery's key
    * range). The UPDATE carries a plain residual conjunct next to its
    * subquery — rendered into the merge ON, so a matched-but-residual-false
    * row is untouched. NOT IN translates too, but ONLY under provable
    * non-nullability on both sides (non-nullable probe column + an
    * IS NOT NULL-guarded subquery): the unguarded spelling refuses loudly
    * (one NULL in the list makes NOT IN delete nothing — a
    * runtime-dependent outcome no static merge clause expresses). */
  val q139SubqueryDml: Q = Q(
    "q139_subquery_dml",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sqdml-").toString
      val root = s"$tmp/orders_v"
      val t = graft.table.VersionedTable(root)
      // coalesce makes o_orderkey NON-NULLABLE by schema (values unchanged —
      // TPC-H keys are never null): the probe-side proof the guarded NOT IN
      // below requires
      t.commit(spark.sql(
        """SELECT coalesce(o_orderkey, CAST(-1 AS BIGINT)) AS o_orderkey,
          |       o_custkey, o_totalprice, o_orderpriority
          |FROM orders""".stripMargin),
        numPartitions = Some(8), sortBy = Seq("o_orderkey"))
      val nFiles = t.filesOf(t.resolve()).size
      spark.sql(
        s"""DELETE FROM graft.`$root`
           |WHERE o_orderkey IN (SELECT o_orderkey FROM orders
           |                     WHERE o_orderpriority = '1-URGENT'
           |                       AND o_orderkey < 500)""".stripMargin)
      // file pruning proof: the key-confined delete rewrote a strict subset
      val removed = t.history(spark).filter(col("version") === t.resolve())
        .select("files_removed").head.getLong(0)
      require(removed > 0 && removed < nFiles,
        s"subquery DELETE must rewrite only the key range's files " +
          s"($removed of $nFiles)")
      spark.sql(
        s"""UPDATE graft.`$root`
           |SET o_totalprice = o_totalprice * 2
           |WHERE o_custkey IN (SELECT c_custkey FROM customer
           |                    WHERE c_mktsegment = 'BUILDING')
           |  AND o_totalprice < 10000""".stripMargin)
      // correlated EXISTS (the other compliance spelling): same keyed merge
      spark.sql(
        s"""DELETE FROM graft.`$root`
           |WHERE EXISTS (SELECT 1 FROM customer c
           |              WHERE c.c_custkey = o_custkey
           |                AND c.c_mktsegment = 'MACHINERY')
           |  AND o_totalprice > 400000""".stripMargin)
      // tuple IN (composite-key compliance delete): both columns land in
      // the merge ON, pruning still keys on the first pair
      spark.sql(
        s"""DELETE FROM graft.`$root`
           |WHERE (o_orderkey, o_custkey) IN
           |  (SELECT o_orderkey, o_custkey FROM orders
           |   WHERE o_orderpriority = '5-LOW' AND o_orderkey < 300)""".stripMargin)
      // UNGUARDED NOT IN refuses loudly (the null-row trap: one NULL in
      // the list makes NOT IN delete nothing — no merge clause expresses
      // a runtime-dependent outcome), never translates wrong
      val refused =
        try {
          spark.sql(s"""DELETE FROM graft.`$root`
            |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
            |                         WHERE o_orderkey < 10)""".stripMargin)
          false
        } catch { case _: UnsupportedOperationException => true }
      require(refused, "unguarded NOT IN must refuse (nullable list output)")
      // the GUARDED keep-list spelling translates: probe non-nullable by
      // schema, subquery output proven by its IS NOT NULL conjunct → the
      // same keyed merge's not-matched-by-source delete, residual-scoped
      spark.sql(
        s"""DELETE FROM graft.`$root`
           |WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
           |                         WHERE o_orderkey % 3 = 0
           |                           AND o_orderkey IS NOT NULL)
           |  AND o_orderkey >= 5000 AND o_orderkey < 5500""".stripMargin)
      t.read(spark)
        .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    },
    Some(
      """WITH upd AS (
        |  SELECT o_orderkey, o_custkey,
        |    CASE WHEN o_custkey IN (SELECT c_custkey FROM customer
        |                            WHERE c_mktsegment = 'BUILDING')
        |          AND o_totalprice < 10000
        |         THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
        |    o_orderpriority
        |  FROM orders
        |  WHERE o_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                           WHERE o_orderpriority = '1-URGENT'
        |                             AND o_orderkey < 500))
        |SELECT * FROM upd
        |WHERE NOT (o_totalprice > 400000 AND EXISTS (
        |  SELECT 1 FROM customer c
        |  WHERE c.c_custkey = upd.o_custkey
        |    AND c.c_mktsegment = 'MACHINERY'))
        |  AND NOT EXISTS (
        |    SELECT 1 FROM orders o2
        |    WHERE o2.o_orderpriority = '5-LOW' AND o2.o_orderkey < 300
        |      AND o2.o_orderkey = upd.o_orderkey
        |      AND o2.o_custkey = upd.o_custkey)
        |  AND NOT (o_orderkey >= 5000 AND o_orderkey < 5500
        |    AND o_orderkey NOT IN (SELECT o_orderkey FROM orders
        |                           WHERE o_orderkey % 3 = 0
        |                             AND o_orderkey IS NOT NULL))""".stripMargin))

  /** q140: METADATA-ONLY partition delete — the retention verb
    * (`DELETE WHERE day < cutoff` on a partitioned 100 TB table) must not
    * read OR write a single data row: a partition-column predicate decides
    * every file from its manifest partition tuple, fully-matching files
    * drop whole, nothing rewrites. Asserted in-query from history metrics
    * (files_added == 0, files_removed == the partition's file count) and
    * by file-identity (every surviving file object is the SAME path as
    * before). A general-predicate delete on the same table still rewrites
    * only the coexisting-rows files (tier 2). Oracle: the surviving rows. */
  val q140PartitionDelete: Q = Q(
    "q140_partition_delete",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-pdel-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_pt")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders"),
        partitionBy = Seq("o_orderstatus"))
      val before = t.filesOf(t.resolve()).toSet
      val dropped = t.partitionValuesOf(t.resolve()).count(
        _._2.get("o_orderstatus").flatten.contains("P"))
      require(dropped > 0, "expected a P partition")
      t.delete(spark, "o_orderstatus = 'P'")
      val h = t.history(spark).filter(col("version") === t.resolve()).head()
      val (added, removed) = (h.getAs[Long]("files_added"),
        h.getAs[Long]("files_removed"))
      require(added == 0 && removed == dropped,
        s"partition delete must be metadata-only (added=$added removed=$removed)")
      require(t.filesOf(t.resolve()).toSet.subsetOf(before),
        "surviving files must be the SAME objects — nothing rewritten")
      // tier 2 on the same table: a data-column predicate that fully
      // covers no remaining file rewrites only coexisting-rows files
      t.delete(spark, "o_orderkey % 5 = 1")
      t.read(spark).select("o_orderkey", "o_totalprice", "o_orderstatus")
    },
    Some(
      """SELECT o_orderkey, o_totalprice, o_orderstatus FROM orders
        |WHERE o_orderstatus <> 'P' AND NOT (o_orderkey % 5 = 1)""".stripMargin))

  /** q141: `table_changes` TABLE-VALUED FUNCTION — Delta's SQL spelling
    * for the change feed ([[graft.catalog.TableChanges]]): a CDC consumer
    * reads the commit-range changes with plain SQL, no Scala API. Bounds
    * are INCLUSIVE (Delta's convention; the Scala feed's `(from, to]` is
    * the engine-internal one), and `startVersion = 0` serves the initial
    * commit's rows as inserts — commit 0's change set IS what it wrote.
    * Same per-commit aggregation shape as q97 so the oracle is a pure
    * relational replay of the four-commit timeline; unlike q97 this
    * exercises the SQL front door AND the v0-inclusive bound. */
  val q141TableChanges: Q = Q(
    "q141_table_changes",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      graft.functions.GraftFunctions.registerAll(spark)
      val tmp = java.nio.file.Files.createTempDirectory("graft-tvf-").toString
      val root = s"$tmp/orders_tc"
      val t = graft.table.VersionedTable(root)
      t.setProperties(Map("enableChangeDataFeed" -> "true"))
      val orders = spark.table("orders")
        .select("o_orderkey", "o_orderstatus", "o_totalprice")
      t.commit(orders.filter("o_orderkey <= 1000"))                    // v0
      t.append(orders.filter("o_orderkey > 1000"))                     // v1
      t.delete(spark, "o_orderstatus = 'P'")                           // v2
      t.update(spark, "o_orderstatus = 'F'",
        Map("o_totalprice" -> "o_totalprice + 1"))                     // v3
      spark.sql(
        s"""SELECT _commit_version, _change_type,
           |  count(*) AS n,
           |  CAST(sum(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS sum_price
           |FROM table_changes('$root', 0, 3)
           |GROUP BY _commit_version, _change_type""".stripMargin)
    },
    Some(
      """WITH o AS (SELECT o_orderkey, o_orderstatus,
        |  CAST(o_totalprice AS DECIMAL(14,2)) AS p FROM orders)
        |SELECT CAST(0 AS BIGINT) AS _commit_version, 'insert' AS _change_type,
        |  count(*) AS n, CAST(sum(p) AS DOUBLE) AS sum_price
        |FROM o WHERE o_orderkey <= 1000
        |UNION ALL
        |SELECT 1, 'insert', count(*), CAST(sum(p) AS DOUBLE)
        |FROM o WHERE o_orderkey > 1000
        |UNION ALL
        |SELECT 2, 'delete', count(*), CAST(sum(p) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'P'
        |UNION ALL
        |SELECT 3, 'delete', count(*), CAST(sum(p) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'F'
        |UNION ALL
        |SELECT 3, 'insert', count(*), CAST(sum(p + 1) AS DOUBLE)
        |FROM o WHERE o_orderstatus = 'F'""".stripMargin))

  val all: Seq[Q] = Seq(q21CsvExtract, q40PrunedRead, q48JsonOrcRoundtrip,
    q49IncrementalTable, q50SchemaEvolution, q53CowMerge, q55ZOrder, q56CowUpdate,
    q70XmlRoundtrip, q76Restore, q77ChangeFeed, q78AppendsSince, q83Profile,
    q84MorDelete, q85IncrementalAgg, q95DynamicPartitionPruning,
    q96PartitionedTable, q97ChangeFeedStored, q99JdbcRoundtrip,
    q101TableRelationSql, q103MorMerge, q104ShallowClone, q106SqlMerge,
    q107ReplaceWhere, q108MergeEvolution, q109BloomMerge, q110ColumnRename,
    q111TemporalDelete, q112SymlinkManifest, q113ConvertInPlace,
    q114DynamicOverwrite, q116CopyInto, q117GeneratedPartition,
    q118ReorgPurge, q121ForgetUser, q122PartitionEvolution, q123ColumnDefaults,
    q124RowTracking, q126MetaCount, q128NullPruning, q129MetaMinMax,
    q132IncrementalCluster, q133CloneSync, q134PointLookup, q135Expectations,
    q143NestedPruning,
    q136Fsck, q138MetadataTables, q139SubqueryDml, q140PartitionDelete,
    q141TableChanges)
}
