package graft.queries

import graft.etl._
import graft.table.Merge
import org.apache.spark.sql.functions._

/** SCD Type 2 flow queries — the reference's core capability
  * (`example/notebook/scd2-job.ipynb`), replayed through the REAL engine
  * stages (SQLTransform with sqlParams/${env} substitution, TableLoad,
  * TableMergeLoad, TableExtract) over contacts derived deterministically from
  * the `customer` test table, with a DuckDB SQL oracle reproducing the exact
  * clause semantics.
  *
  * Derivation (deterministic, both engines):
  *  - initial contacts = every customer (id, name, email, state)
  *  - CDC batch = state-change for custkey%10=0 (expire+insert), unchanged
  *    re-send for custkey%13=0 (merge no-op), brand-new ids +1000000 for
  *    custkey%17=0 (insert-only) — the three branches the reference's fixture
  *    exercises (`FIXTURES.md` family A).
  */
object Scd2Queries {

  private val TS1 = "TIMESTAMP '2024-06-01 00:00:00'"
  private val TS2 = "TIMESTAMP '2024-06-02 00:00:00'"

  private val initialContactsSql =
    """SELECT c_custkey AS id, c_name AS name,
      |  concat(c_name, '@example.com') AS email,
      |  c_mktsegment AS state
      |FROM customer""".stripMargin

  private val cdcContactsSql =
    """SELECT c_custkey AS id, c_name AS name,
      |  concat(c_name, '@example.com') AS email,
      |  concat('NEW-', c_mktsegment) AS state
      |FROM customer WHERE c_custkey % 10 = 0
      |UNION ALL
      |SELECT c_custkey, c_name, concat(c_name, '@example.com'), c_mktsegment
      |FROM customer WHERE c_custkey % 13 = 0 AND c_custkey % 10 <> 0
      |UNION ALL
      |SELECT c_custkey + 1000000, concat('new-', c_name),
      |  concat('new-', c_name, '@example.com'), 'NEWSEG'
      |FROM customer WHERE c_custkey % 17 = 0""".stripMargin

  /** The reference's typed SCD2 projection (scd2-job.ipynb:143-144) with the
    * job-run timestamp injected as a substitution parameter — mirroring the
    * `%env` resolve-once semantics (scd2-job.ipynb:122,132). */
  private val projectionSql =
    """SELECT id, name, email, state,
      |  ${etl_ts} AS valid_from,
      |  CAST(NULL AS TIMESTAMP) AS valid_to,
      |  true AS iscurrent,
      |  md5(concat(name, email, state)) AS checksum
      |FROM ${table_name}""".stripMargin

  /** The reference's dual-row staged-update query (scd2-job.ipynb:307-319):
    * NULL mergeKey forces INSERT of the new version; id mergeKey expires the
    * old row. Bare UNION = UNION DISTINCT, as in the reference. */
  private val stagedSql =
    """SELECT CAST(NULL AS BIGINT) AS mergeKey, new.*
      |FROM ${initial_view} old INNER JOIN ${cdc_view} new
      |ON old.id = new.id
      |WHERE old.iscurrent = true AND old.checksum <> new.checksum
      |UNION
      |SELECT id AS mergeKey, * FROM ${cdc_view}""".stripMargin

  private def projection(src: String, ts: String): String =
    projectionSql.replace("${table_name}", src).replace("${etl_ts}", ts)

  /** Stages up to the staged-update view, run through the engine with env
    * gating (the `uat`-parked PrintSchema mirrors scd2-job.ipynb:409). */
  private def stagingJob: JobSpec = JobSpec(Seq(
    SQLTransform("derive initial contacts", initialContactsSql, "initial_contacts"),
    SQLTransform("type initial", projectionSql, "initial_load",
      sqlParams = Map("table_name" -> "initial_contacts", "etl_ts" -> TS1)),
    PrintSchema("inspect (uat only)", "initial_load", environments = Seq("uat")),
    SQLTransform("derive cdc contacts", cdcContactsSql, "cdc_contacts"),
    SQLTransform("type cdc", projectionSql, "cdc_load",
      sqlParams = Map("table_name" -> "cdc_contacts", "etl_ts" -> TS2)),
    SQLTransform("stage dual-row update", stagedSql, "staged_update",
      sqlParams = Map("initial_view" -> "initial_load", "cdc_view" -> "cdc_load"))))

  // ---- DuckDB oracle CTE prelude shared by q9/q10 ----
  private val oracleCtes =
    s"""WITH initial_contacts AS ($initialContactsSql),
       |initial_load AS (${projection("initial_contacts", TS1)}),
       |cdc_contacts AS ($cdcContactsSql),
       |cdc_load AS (${projection("cdc_contacts", TS2)}),
       |staged AS (
       |  SELECT CAST(NULL AS BIGINT) AS mergeKey, new.*
       |  FROM initial_load old INNER JOIN cdc_load new ON old.id = new.id
       |  WHERE old.iscurrent = true AND old.checksum <> new.checksum
       |  UNION
       |  SELECT id AS mergeKey, * FROM cdc_load)""".stripMargin

  /** q9: the staged-update view itself (P1-P9, F1-F4, J1/J2/J5, U1 in one
    * query, via real SQLTransform stages + substitution + env gating). */
  val q9Staged: Q = Q(
    "q9_scd2_staged",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      stagingJob.run(spark, Map.empty, environment = "production")
      spark.table("staged_update")
    },
    Some(s"$oracleCtes SELECT * FROM staged"))

  /** q10: the full SCD2 merge — initial TableLoad (v0), dual-row staging,
    * TableMergeLoad with the reference's exact clause structure
    * (scd2-job.ipynb:344-353), TableExtract of the committed version.
    *
    * Scale note: the merge is one full-outer equi-join on the merge key
    * (broadcast or sort-merge, AQE-chosen) + codegen'd column rewrite; the
    * versioned commit appends immutable files + one manifest — no rewrite of
    * unmatched data beyond the join's pass-through. */
  val q10Merge: Q = Q(
    "q10_scd2_merge",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tableDir = java.nio.file.Files.createTempDirectory("graft-scd2-").toString
      val job = JobSpec(stagingJob.stages ++ Seq(
        TableLoad("load initial snapshot", "initial_load", "${datalake}/contact",
          numPartitions = Some(2)),
        TableMergeLoad("scd2 merge", "staged_update", "${datalake}/contact",
          condition = "source.mergeKey = target.id",
          whenMatchedUpdate = Some(Merge.MatchedUpdate(
            condition = Some("target.iscurrent = true AND target.checksum <> source.checksum"),
            values = Map(
              "valid_to" -> "source.valid_from",
              "iscurrent" -> "false"))),
          whenNotMatchedByTargetInsert = Some(Merge.NotMatchedInsert(None, Map.empty)),
          numPartitions = Some(2)),
        TableExtract("read merged table", "${datalake}/contact", "contact")))
      job.run(spark, Map("datalake" -> tableDir), environment = "production")
      spark.table("contact")
        .select("id", "name", "email", "state", "valid_from", "valid_to", "iscurrent", "checksum")
    },
    Some(
      s"""$oracleCtes,
         |target AS (SELECT * FROM initial_load),
         |matched AS (
         |  SELECT t.id, t.name, t.email, t.state, t.valid_from,
         |    CASE WHEN t.iscurrent = true AND t.checksum <> s.checksum
         |         THEN s.valid_from ELSE t.valid_to END AS valid_to,
         |    CASE WHEN t.iscurrent = true AND t.checksum <> s.checksum
         |         THEN false ELSE t.iscurrent END AS iscurrent,
         |    t.checksum
         |  FROM target t JOIN staged s ON s.mergeKey = t.id),
         |unmatched_target AS (
         |  SELECT t.* FROM target t
         |  WHERE NOT EXISTS (SELECT 1 FROM staged s WHERE s.mergeKey = t.id)),
         |inserts AS (
         |  SELECT s.id, s.name, s.email, s.state, s.valid_from, s.valid_to,
         |         s.iscurrent, s.checksum
         |  FROM staged s
         |  WHERE s.mergeKey IS NULL
         |     OR NOT EXISTS (SELECT 1 FROM target t WHERE t.id = s.mergeKey))
         |SELECT * FROM matched
         |UNION ALL SELECT * FROM unmatched_target
         |UNION ALL SELECT * FROM inserts""".stripMargin))

  /** q8: typed ingestion through SchemaDoc/TypingTransform (Arc error
    * semantics — scd2-job.ipynb:88-96): stringified customer with induced bad
    * values; output typed columns + error accounting. */
  val q8Typing: Q = Q(
    "q8_typing",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      spark.sql(
        """SELECT CAST(c_custkey AS STRING) AS _c0, c_name AS _c1,
          |  CAST(c_nationkey AS STRING) AS _c2,
          |  CASE WHEN c_custkey % 50 = 0 THEN 'bad' ELSE CAST(c_acctbal AS STRING) END AS _c3,
          |  c_mktsegment AS _c4
          |FROM customer""".stripMargin).createOrReplaceTempView("customer_raw")
      val doc =
        """[{"name": "c_custkey", "type": "long", "nullable": false},
          | {"name": "c_name", "type": "string"},
          | {"name": "c_nationkey", "type": "integer"},
          | {"name": "c_acctbal", "type": "double"},
          | {"name": "c_mktsegment", "type": "string"}]""".stripMargin
      TypingTransform("type customer", "customer_raw", "customer_typed",
        schema = Some(doc), positional = true)
        .execute(spark, Map.empty)
      spark.table("customer_typed").select(
        col("c_custkey"), col("c_name"), col("c_nationkey"), col("c_acctbal"),
        col("c_mktsegment"),
        size(col("_errors")).cast("int").as("n_errors"),
        expr("try_element_at(_errors, 1).field").as("err_field"))
    },
    Some(
      """SELECT c_custkey, c_name, c_nationkey,
        |  CASE WHEN c_custkey % 50 = 0 THEN NULL ELSE c_acctbal END AS c_acctbal,
        |  c_mktsegment,
        |  CASE WHEN c_custkey % 50 = 0 THEN 1 ELSE 0 END AS n_errors,
        |  CASE WHEN c_custkey % 50 = 0 THEN 'c_acctbal' ELSE NULL END AS err_field
        |FROM customer""".stripMargin))

  /** q20: time travel — after the q10 merge commits v1, `relativeVersion: -1`
    * (reference `DeltaLakeExtract` options, scd2-job.ipynb:462-471) must read
    * back the pre-merge v0 snapshot bit-for-bit. Oracle = the initial load. */
  val q20TimeTravel: Q = Q(
    "q20_time_travel",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tableDir = java.nio.file.Files.createTempDirectory("graft-tt-").toString
      val job = JobSpec(stagingJob.stages ++ Seq(
        TableLoad("load initial snapshot", "initial_load", "${datalake}/contact",
          numPartitions = Some(2)),
        TableMergeLoad("scd2 merge", "staged_update", "${datalake}/contact",
          condition = "source.mergeKey = target.id",
          whenMatchedUpdate = Some(Merge.MatchedUpdate(
            condition = Some("target.iscurrent = true AND target.checksum <> source.checksum"),
            values = Map("valid_to" -> "source.valid_from", "iscurrent" -> "false"))),
          whenNotMatchedByTargetInsert = Some(Merge.NotMatchedInsert(None, Map.empty)),
          numPartitions = Some(2)),
        TableExtract("time travel to pre-merge", "${datalake}/contact", "contact_v0",
          relativeVersion = Some(-1))))
      job.run(spark, Map("datalake" -> tableDir), environment = "production")
      spark.table("contact_v0")
        .select("id", "name", "email", "state", "valid_from", "valid_to", "iscurrent", "checksum")
    },
    Some(s"$oracleCtes SELECT * FROM initial_load"))

  /** q89: full table sync via MERGE with every clause family — matched
    * UPDATE, not-matched-by-target INSERT, and NOT MATCHED BY SOURCE DELETE
    * (the Delta clause that turns MERGE into "make target equal source"):
    * even keys update in place, odd keys (absent from the source) are
    * deleted, and a band of brand-new keys inserts. After the sync the
    * versioned table must equal the source mirror exactly, which is the
    * oracle. */
  val q89MergeSync: Q = Q(
    "q89_merge_sync",
    (spark, dir) => {
      Tables.registerAll(spark, dir)
      val tmp = java.nio.file.Files.createTempDirectory("graft-sync-").toString
      val t = graft.table.VersionedTable(s"$tmp/orders_v")
      t.commit(spark.sql(
        "SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders"),
        numPartitions = Some(4))
      val mirror = spark.sql(
        """SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
          |FROM orders WHERE o_orderkey % 2 = 0
          |UNION ALL
          |SELECT o_orderkey + 10000000, 'N' AS o_orderstatus, 1.0e0 AS o_totalprice
          |FROM orders WHERE o_orderkey < 100""".stripMargin)
      val merged = graft.table.Merge.merge(
        t.read(spark), mirror, "source.o_orderkey = target.o_orderkey",
        whenMatchedUpdate = Some(graft.table.Merge.MatchedUpdate(None,
          Map("o_totalprice" -> "source.o_totalprice",
              "o_orderstatus" -> "source.o_orderstatus"))),
        whenNotMatchedInsert = Some(graft.table.Merge.NotMatchedInsert(None, Map.empty)),
        whenNotMatchedBySourceDelete =
          Some(graft.table.Merge.NotMatchedBySourceDelete(None)))
      t.commit(merged, numPartitions = Some(4))
      t.read(spark)
    },
    Some(
      """SELECT o_orderkey, o_orderstatus, o_totalprice * 2 AS o_totalprice
        |FROM orders WHERE o_orderkey % 2 = 0
        |UNION ALL
        |SELECT o_orderkey + 10000000, 'N' AS o_orderstatus, 1.0 AS o_totalprice
        |FROM orders WHERE o_orderkey < 100""".stripMargin))

  val all: Seq[Q] = Seq(q8Typing, q9Staged, q10Merge, q20TimeTravel, q89MergeSync)
}
