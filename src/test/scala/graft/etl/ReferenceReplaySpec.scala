package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Reference-fidelity replay: the notebook's exact SQL idioms must run
  * unmodified through the engine's SQL stages (SURVEY.md §7 hard part #3 —
  * the reference writes `1 AS iscurrent` and reads it back with
  * `iscurrent = true`, scd2-job.ipynb:144,313, relying on Spark 3.0-era
  * int↔bool coercion; our sessions pin ansi=false for exactly this). */
class ReferenceReplaySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("int flag written as 1 satisfies an `= true` predicate (reference idiom)") {
    Seq((1L, "a"), (2L, "b")).toDF("id", "name").createOrReplaceTempView("rr_src")
    JobSpec(Seq(
      SQLTransform("project with int flag",
        "SELECT id, name, 1 AS iscurrent FROM rr_src", "rr_proj"),
      SQLTransform("filter with boolean literal",
        "SELECT * FROM rr_proj old WHERE old.iscurrent = true", "rr_filtered")))
      .run(spark, Map.empty)
    assert(spark.table("rr_filtered").count() === 2)
  }

  test("the notebook's staged-update SQL runs verbatim modulo view names") {
    Seq((12L, "Jane", "j@x.com", "CA"), (13L, "Ann", "a@x.com", "OR"))
      .toDF("id", "name", "email", "state").createOrReplaceTempView("rr_initial_typed")
    Seq((12L, "Jane", "j@x.com", "TX"), (99L, "New", "n@x.com", "WA"))
      .toDF("id", "name", "email", "state").createOrReplaceTempView("rr_cdc_typed")
    // the reference's projection (scd2-job.ipynb:143-144) with int flag +
    // md5 checksum + param-injected timestamp, then the dual-row staged
    // update (scd2-job.ipynb:307-319), both via sqlParams substitution
    val projection =
      """SELECT id, name, email, state, ${current_timestamp} AS valid_from,
        |CAST(null AS timestamp) AS valid_to, 1 AS iscurrent,
        |md5(concat(name, email, state)) AS checksum FROM ${table_name}""".stripMargin
    JobSpec(Seq(
      SQLTransform("initial load", projection, "rr_initial_load",
        sqlParams = Map("table_name" -> "rr_initial_typed",
          "current_timestamp" -> "TIMESTAMP '2024-06-01 00:00:00'")),
      SQLTransform("cdc load", projection, "rr_cdc_load",
        sqlParams = Map("table_name" -> "rr_cdc_typed",
          "current_timestamp" -> "TIMESTAMP '2024-06-02 00:00:00'")),
      SQLTransform("staged update",
        """SELECT NULL AS mergeKey, new.*
          |FROM rr_initial_load old INNER JOIN rr_cdc_load new
          |ON old.id = new.id
          |WHERE old.iscurrent = true AND old.checksum <> new.checksum
          |UNION
          |SELECT id AS mergeKey, * FROM rr_cdc_load""".stripMargin, "rr_staged")))
      .run(spark, Map.empty)
    val staged = spark.table("rr_staged")
    // id=12 changed → one NULL-mergeKey forced-insert row + one keyed row;
    // id=13 unchanged and not re-sent → absent; id=99 new → one keyed row
    assert(staged.count() === 3)
    assert(staged.filter($"mergeKey".isNull).select("id").as[Long].collect().toSeq === Seq(12L))
    assert(staged.filter($"mergeKey" === 12L).count() === 1)
    assert(staged.filter($"mergeKey" === 99L).count() === 1)
  }
}
