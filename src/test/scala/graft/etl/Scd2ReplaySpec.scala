package graft.etl

import graft.SparkSpec
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** End-to-end replay of the reference SCD2 notebook
  * (`example/notebook/scd2-job.ipynb`) on the reference-replica fixtures
  * (FIXTURES.md family A): headerless CSV extract → schema-doc typing via
  * schemaURI → typed projection with a job-run timestamp parameter → initial
  * versioned load → CDC extract/typing → dual-row staged update → MERGE →
  * time travel — asserting the notebook's own golden expectations:
  *  - post-merge id=12 has TWO rows, expired + current (scd2-job.ipynb:443-444)
  *  - time travel to version -1 shows ONE id=12 row (scd2-job.ipynb:462-483)
  *  - expired count == number of changed keys (the "challenge",
  *    scd2-job.ipynb:393; the fixture changes ids 5 and 12)
  * The whole flow runs from a JSON workflow document, exercising the job
  * parser, env substitution, gating and the DAG runner in one pass.
  */
class Scd2ReplaySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("the notebook flow end-to-end: extract, type, load, merge, time travel") {
    val res = getClass.getResource("/initial_contacts.csv").getPath
    val resDir = new java.io.File(res).getParent
    val lake = tmpDir("scd2-replay-")

    val projection =
      """SELECT id, name, email, state, ${ETL_TS} AS valid_from,
        |CAST(null AS timestamp) AS valid_to, 1 AS iscurrent,
        |md5(concat(name, email, state)) AS checksum FROM ${table_name}"""
        .stripMargin.replace("\n", " ")
    val staged =
      """SELECT CAST(NULL AS BIGINT) AS mergeKey, new.*
        |FROM initial_check old INNER JOIN cdc_load new ON old.id = new.id
        |WHERE old.iscurrent = 1 AND old.checksum <> new.checksum
        |UNION
        |SELECT id AS mergeKey, * FROM cdc_load""".stripMargin.replace("\n", " ")

    def q(s: String): String = "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""

    val workflow =
      s"""{"parameters": {"DATALAKE": "$lake", "META": "$resDir"},
         | "jobs": [
         |  {"name": "initial-load", "stages": [
         |    {"type": "DelimitedExtract", "name": "extract initial",
         |     "inputURI": "$resDir/initial_contacts.csv", "outputView": "initial_raw",
         |     "delimiter": "Comma", "header": false, "quote": "None"},
         |    {"type": "TypingTransform", "name": "type initial",
         |     "inputView": "initial_raw", "outputView": "initial_typed",
         |     "schemaURI": "$${META}/contact_meta_0.json"},
         |    {"type": "SQLTransform", "name": "project initial",
         |     "outputView": "initial_load", "sql": ${q(projection)},
         |     "sqlParams": {"table_name": "initial_typed",
         |                   "ETL_TS": "TIMESTAMP '2024-06-01 00:00:00'"}},
         |    {"type": "DeltaLakeLoad", "name": "load", "inputView": "initial_load",
         |     "outputURI": "$${DATALAKE}/contact", "numPartitions": 2}]},
         |  {"name": "delta-load", "stages": [
         |    {"type": "DelimitedExtract", "name": "extract cdc",
         |     "inputURI": "$resDir/update_contacts.csv", "outputView": "cdc_raw",
         |     "delimiter": "Comma", "header": false, "quote": "None"},
         |    {"type": "TypingTransform", "name": "type cdc",
         |     "inputView": "cdc_raw", "outputView": "cdc_typed",
         |     "schemaURI": "$${META}/contact_meta_0.json"},
         |    {"type": "SQLTransform", "name": "project cdc",
         |     "outputView": "cdc_load", "sql": ${q(projection)},
         |     "sqlParams": {"table_name": "cdc_typed",
         |                   "ETL_TS": "TIMESTAMP '2024-06-02 00:00:00'"}}]},
         |  {"name": "scd2-merge", "dependsOn": ["initial-load", "delta-load"],
         |   "stages": [
         |    {"type": "DeltaLakeExtract", "name": "read current",
         |     "inputURI": "$${DATALAKE}/contact", "outputView": "initial_check"},
         |    {"type": "SQLTransform", "name": "stage dual rows",
         |     "outputView": "staged_update", "sql": ${q(staged)}},
         |    {"type": "DeltaLakeMergeLoad", "name": "merge",
         |     "inputView": "staged_update", "outputURI": "$${DATALAKE}/contact",
         |     "condition": "source.mergeKey = target.id",
         |     "whenMatchedUpdate": {
         |       "condition": "target.iscurrent = 1 AND target.checksum <> source.checksum",
         |       "values": {"valid_to": "source.valid_from", "iscurrent": "0"}},
         |     "whenNotMatchedByTargetInsert": {}, "numPartitions": 2}]}
         |]}""".stripMargin

    val order = Runner.runWorkflow(spark, workflow)
    assert(order.last === "scd2-merge")

    val contact = VersionedTable(s"$lake/contact").read(spark)
    contact.createOrReplaceTempView("contact_replay")

    // golden: id=12 has two rows — expired (MT, iscurrent=0) + current (AK)
    val id12 = spark.sql(
      """SELECT state, iscurrent, valid_to IS NULL AS open_ended
        |FROM contact_replay WHERE id = 12 ORDER BY iscurrent""".stripMargin)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getBoolean(2))).toSeq
    assert(id12 === Seq(("MT", 0, false), ("AK", 1, true)))

    // golden: time travel to the pre-merge version shows ONE id=12 row (MT)
    val v0 = VersionedTable(s"$lake/contact").read(spark, relativeVersion = Some(-1))
    assert(v0.filter($"id" === 12).count() === 1)
    assert(v0.filter($"id" === 12).select("state").as[String].collect().head === "MT")

    // golden: expired count == changed keys (ids 5 and 12; 13 was a no-op resend)
    assert(contact.filter($"iscurrent" === 0).select("id").as[Long]
      .collect().sorted.toSeq === Seq(5L, 12L))

    // new id 15 inserted as current; no-op id 13 still has exactly one row
    assert(contact.filter($"id" === 15 && $"iscurrent" === 1).count() === 1)
    assert(contact.filter($"id" === 13).count() === 1)
    // total: 14 initial + 2 new versions (5, 12) + 1 brand-new (15)
    assert(contact.count() === 17)
  }
}
