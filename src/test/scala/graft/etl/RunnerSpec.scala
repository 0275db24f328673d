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
