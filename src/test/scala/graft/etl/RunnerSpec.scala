package graft.etl

import graft.SparkSpec
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** DAG runner semantics + a replay of the reference scheduler's 3-job shape
  * (initial-load ∥ delta-load → merge, `example/scd2-job-scheduler.yaml`). */
class RunnerSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("topological ordering with fan-in; cycle and unknown deps rejected") {
    def job(name: String) = JobDef(name, JobSpec(Seq(
      SQLTransform(name, s"SELECT '$name' AS j", s"v_$name"))))
    val order = Runner.run(spark,
      Seq(job("merge").copy(dependsOn = Seq("a", "b")), job("a"), job("b")),
      Map.empty)
    assert(order.last === "merge")
    assert(order.toSet === Set("a", "b", "merge"))

    assertThrows[IllegalArgumentException](Runner.run(spark,
      Seq(job("x").copy(dependsOn = Seq("y")), job("y").copy(dependsOn = Seq("x"))),
      Map.empty))
    assertThrows[IllegalArgumentException](Runner.run(spark,
      Seq(job("x").copy(dependsOn = Seq("nope"))), Map.empty))
  }

  test("per-job retry policy re-runs a failing job with backoff (O5 parity)") {
    val dir = tmpDir("retry-")
    val attempts = scala.collection.mutable.ArrayBuffer.empty[(String, Int)]
    val job = JobDef("flaky", JobSpec(Seq(
      ParquetExtract("read landing", s"$dir/landing", "v_landing"))),
      retries = 2, retryIntervalMs = 0L)
    // the landing file appears only before the SECOND attempt — a transient
    // failure the retry policy must absorb
    val onAttempt = (name: String, n: Int) => {
      attempts += (name -> n)
      if (n == 2) Seq((1L, "x")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/landing")
      ()
    }
    Runner.run(spark, Seq(job), Map.empty, onAttempt = onAttempt)
    assert(attempts.toSeq === Seq("flaky" -> 1, "flaky" -> 2))
    assert(spark.table("v_landing").count() === 1)

    // retry budget exhausted → the job's own failure surfaces
    val bad = JobDef("hopeless", JobSpec(Seq(
      ParquetExtract("read missing", s"$dir/never", "v_never"))),
      retries = 1, retryIntervalMs = 0L)
    val seen = scala.collection.mutable.ArrayBuffer.empty[Int]
    assertThrows[Exception](Runner.run(spark, Seq(bad), Map.empty,
      onAttempt = (_, n) => { seen += n; () }))
    assert(seen.toSeq === Seq(1, 2))
  }

  test("idempotencyKey makes a retried append job exactly-once") {
    val dir = tmpDir("retry2-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("retry_batch")
    val job = JobDef("ingest-then-flaky", JobSpec(Seq(
      TableAppend("append batch", "retry_batch", s"$dir/t",
        idempotencyKey = Some("batch-2024-06-01")),
      ParquetExtract("flaky read", s"$dir/landing", "v_flaky"))),
      retries = 2, retryIntervalMs = 0L)
    val onAttempt = (_: String, n: Int) => {
      if (n == 2) Seq((9L, "x")).toDF("id", "v")
        .write.mode("overwrite").parquet(s"$dir/landing")
      ()
    }
    Runner.run(spark, Seq(job), Map.empty, onAttempt = onAttempt)
    // attempt 1 committed the append then failed on the extract; attempt 2
    // must SKIP the already-committed append — no duplicate rows
    val t = VersionedTable(s"$dir/t")
    assert(t.read(spark).count() === 2)
    assert(t.versions() === Seq(0L))
  }

  test("workflow JSON: parameters flow into jobs; lake handoff between jobs") {
    val loc = tmpDir("wf-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "v")
      .createOrReplaceTempView("wf_seed")
    val wf =
      s"""{"parameters": {"LAKE": "$loc"},
         | "jobs": [
         |  {"name": "load", "stages": [
         |    {"type": "SQLTransform", "name": "s", "outputView": "x",
         |     "sql": "SELECT * FROM wf_seed"},
         |    {"type": "TableLoad", "name": "l", "inputView": "x",
         |     "outputURI": "$${LAKE}/t"}]},
         |  {"name": "extend", "dependsOn": ["load"], "stages": [
         |    {"type": "TableExtract", "name": "e", "inputURI": "$${LAKE}/t",
         |     "outputView": "back"},
         |    {"type": "SQLTransform", "name": "s2", "outputView": "y",
         |     "sql": "SELECT id, upper(v) AS v FROM back"},
         |    {"type": "TableLoad", "name": "l2", "inputView": "y",
         |     "outputURI": "$${LAKE}/t"}]}
         |]}""".stripMargin
    val order = Runner.runWorkflow(spark, wf)
    assert(order === Seq("load", "extend"))
    val t = VersionedTable(s"$loc/t")
    assert(t.latestVersion().contains(1L))
    assert(t.read(spark).select("v").as[String].collect().toSet === Set("A", "B"))
    // the v0 snapshot from job 1 is still time-travelable
    assert(t.read(spark, relativeVersion = Some(-1))
      .select("v").as[String].collect().toSet === Set("a", "b"))
  }

  test("forked mode: the REAL scd2 scheduler DAG runs one JVM per task " +
      "with lake-only handoff, final state identical to in-process") {
    // the reference's actual execution model: each Argo task is a separate
    // spark-submit application (scd2-job-scheduler.yaml:17-31). The real
    // YAML drives both runs; its three per-task configUris (initial_load /
    // delta_load / scd2_merge .ipynb — unreachable s3a) rewrite by basename
    // to three runnable job documents over the reference-replica fixtures.
    // Unlike Scd2ReplaySpec's notebook replay, the CDC batch hands off
    // through the LAKE (a cdc_stage table), because a forked task's temp
    // views die with its JVM — the constraint the fork makes real.
    val res = getClass.getResource("/initial_contacts.csv").getPath
    val resDir = new java.io.File(res).getParent
    val dir = tmpDir("fork-scd2-")
    def q(s: String): String =
      "\"" + s.replace("\\", "\\\\").replace("\"", "\\\"") + "\""
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
    def loadDoc(csv: String, table: String, ts: String): String =
      s"""{"stages": [
         |  {"type": "DelimitedExtract", "name": "extract",
         |   "inputURI": "$resDir/$csv", "outputView": "raw",
         |   "delimiter": "Comma", "header": false, "quote": "None"},
         |  {"type": "TypingTransform", "name": "type", "inputView": "raw",
         |   "outputView": "typed", "schemaURI": "$resDir/contact_meta_0.json"},
         |  {"type": "SQLTransform", "name": "project", "outputView": "out",
         |   "sql": ${q(projection)},
         |   "sqlParams": {"table_name": "typed",
         |                 "ETL_TS": "TIMESTAMP '$ts'"}},
         |  {"type": "DeltaLakeLoad", "name": "load", "inputView": "out",
         |   "outputURI": "$${DATALAKE}/$table", "numPartitions": 2}]}""".stripMargin
    val mergeDoc =
      s"""{"stages": [
         |  {"type": "DeltaLakeExtract", "name": "read current",
         |   "inputURI": "$${DATALAKE}/contact", "outputView": "initial_check"},
         |  {"type": "DeltaLakeExtract", "name": "read cdc stage",
         |   "inputURI": "$${DATALAKE}/cdc_stage", "outputView": "cdc_load"},
         |  {"type": "SQLTransform", "name": "stage dual rows",
         |   "outputView": "staged_update", "sql": ${q(staged)}},
         |  {"type": "DeltaLakeMergeLoad", "name": "merge",
         |   "inputView": "staged_update", "outputURI": "$${DATALAKE}/contact",
         |   "condition": "source.mergeKey = target.id",
         |   "whenMatchedUpdate": {
         |     "condition": "target.iscurrent = 1 AND target.checksum <> source.checksum",
         |     "values": {"valid_to": "source.valid_from", "iscurrent": "0"}},
         |   "whenNotMatchedByTargetInsert": {}, "numPartitions": 2}]}""".stripMargin
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/initial_load.json"),
      loadDoc("initial_contacts.csv", "contact", "2024-06-01 00:00:00").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/delta_load.json"),
      loadDoc("update_contacts.csv", "cdc_stage", "2024-06-02 00:00:00").getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/scd2_merge.json"),
      mergeDoc.getBytes("UTF-8"))
    val refYaml = "/root/reference/example/scd2-job-scheduler.yaml"
    val rewrite: String => String = uri =>
      s"$dir/${uri.substring(uri.lastIndexOf('/') + 1).stripSuffix(".ipynb")}.json"

    // in-process reference run into lake A
    val lakeA = s"$dir/lakeA"
    val orderA = Runner.runArgo(spark, refYaml, env = Map("DATALAKE" -> lakeA),
      uriRewrite = rewrite)
    assert(orderA === Seq("initial-load", "delta-load", "SCD2-merge"))

    // forked run into lake B: three OS processes, three SparkSessions
    val lakeB = s"$dir/lakeB"
    val (jobs, _) = ArgoWorkflow.fromFile(refYaml,
      env = Map("DATALAKE" -> lakeB), uriRewrite = rewrite)
    assert(jobs.forall(_.configUri.isDefined))
    val orderB = Runner.runForked(jobs, env = Map("DATALAKE" -> lakeB))
    assert(orderB === Seq("initial-load", "delta-load", "SCD2-merge"))

    // identical final table state, row for row
    def rows(lake: String) = VersionedTable(s"$lake/contact").read(spark)
      .selectExpr("id", "name", "email", "state", "CAST(valid_from AS STRING)",
        "CAST(valid_to AS STRING)", "iscurrent", "checksum")
      .collect().map(_.toSeq).sortBy(_.toString).toSeq
    assert(rows(lakeB) === rows(lakeA))
    assert(rows(lakeB).nonEmpty)
    // the notebook's own golden: id=12 expired (MT) + current (AK)
    val contact = VersionedTable(s"$lakeB/contact").read(spark)
    val id12 = contact.filter($"id" === 12)
      .selectExpr("state", "iscurrent").collect()
      .map(r => (r.getString(0), r.getInt(1))).sortBy(_._2).toSeq
    assert(id12 === Seq(("MT", 0), ("AK", 1)))
    // inline-stage jobs refuse forked mode up front
    val inline = JobDef("x", JobSpec(Seq(SQLTransform("s", "SELECT 1", "v"))))
    assertThrows[IllegalArgumentException](Runner.runForked(Seq(inline), Map.empty))
  }

  test("symlink manifest lists exactly the latest version's files") {
    val loc = tmpDir("man-")
    val t = VersionedTable(s"$loc/t")
    t.commit(Seq(1, 2).toDF("x"), numPartitions = Some(2))
    val manifest = t.writeSymlinkManifest()
    val uris = new String(java.nio.file.Files.readAllBytes(manifest), "UTF-8").split("\n")
    assert(uris.length === 2)
    assert(uris.forall(u => u.startsWith("file:") && u.endsWith(".parquet")))
    // manifest-listed files are a readable external view of the table
    val viaManifest = spark.read.parquet(uris.toIndexedSeq: _*)
    assert(viaManifest.count() === 2)
  }
}
