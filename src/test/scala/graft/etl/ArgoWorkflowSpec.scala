package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Entry point B evidence: the REAL reference scheduler document
  * (`/root/reference/example/scd2-job-scheduler.yaml`) must parse into
  * Runner's model — tasks, fan-in dependencies, workflow-parameter
  * handlebars, CLI env splices, per-task sparkConf — and a synthetic
  * workflow must run end to end with O4 conf scoping. */
class ArgoWorkflowSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val refYaml = "/root/reference/example/scd2-job-scheduler.yaml"
  private val refNotebook = "/root/reference/example/notebook/scd2-job.ipynb"

  test("the reference scd2-job-scheduler.yaml parses: DAG, params, conf") {
    // the scheduler's s3a configUris are unreachable here; every task's job
    // document maps onto the reference notebook (the real job content)
    val (jobs, params) = ArgoWorkflow.fromFile(refYaml,
      uriRewrite = _ => refNotebook)
    assert(params === Map("codeBucket" -> "cfn_value"))
    assert(jobs.map(_.name) === Seq("initial-load", "delta-load", "SCD2-merge"))
    // fan-in: SCD2-merge after both loads (scd2-job-scheduler.yaml:47-48)
    assert(jobs(0).dependsOn === Nil && jobs(1).dependsOn === Nil)
    assert(jobs(2).dependsOn === Seq("initial-load", "delta-load"))
    // O3: the workflow parameter lands in every task's CLI splice — which
    // rides in envOverride, beating workflow-level env like Argo's rendered
    // container command line does
    jobs.foreach(j =>
      assert(j.envOverride("ETL_CONF_DATALAKE_LOC") === "cfn_value", j.name))
    // the notebook's %env declarations stay job-scoped DEFAULTS
    jobs.foreach(j =>
      assert(j.env("ETL_CONF_CURRENT_TIMESTAMP") === "current_timestamp()", j.name))
    // O4: only the merge task carries the sparkConf override
    // (scd2-job-scheduler.yaml:63-64)
    assert(jobs(2).sparkConf ===
      Map("spark.databricks.delta.merge.repartitionBeforeWrite.enabled" -> "true"))
    assert(jobs(0).sparkConf.isEmpty && jobs(1).sparkConf.isEmpty)
    // each task's configUri resolved to the notebook's 15 runnable stages
    jobs.foreach(j => assert(j.spec.stages.size === 15, j.name))
  }

  test("a synthetic Argo workflow runs end to end with scoped sparkConf") {
    val dir = tmpDir("argo-")
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/a.json"),
      """{"stages": [{"type": "SQLTransform", "name": "mk",
        |  "sql": "SELECT '${ETL_CONF_MARK}' AS mark, '${ETL_CONF_TS}' AS ts",
        |  "outputView": "argo_a"}]}""".stripMargin.getBytes("UTF-8"))
    java.nio.file.Files.write(java.nio.file.Paths.get(s"$dir/b.json"),
      """{"stages": [{"type": "SQLTransform", "name": "conf",
        |  "sql": "SET graft.test.flag",
        |  "outputView": "argo_b"}]}""".stripMargin.getBytes("UTF-8"))
    val yaml =
      s"""apiVersion: argoproj.io/v1alpha1
         |kind: Workflow
         |spec:
         |  entrypoint: p
         |  arguments:
         |    parameters:
         |    - name: lake
         |      value: "$dir"
         |    - name: ETL_CONF_MARK
         |      value: "workflow-default-must-lose"
         |  templates:
         |  - name: p
         |    dag:
         |      tasks:
         |        - name: first
         |          arguments:
         |            parameters:
         |            - name: configUri
         |              value: "{{workflow.parameters.lake}}/a.json"
         |            - name: parameters
         |              value: "--ETL_CONF_MARK=from-task --ETL_CONF_TS=2024-01-01 00:00:00"
         |        - name: second
         |          dependencies: [first]
         |          arguments:
         |            parameters:
         |            - name: configUri
         |              value: "{{workflow.parameters.lake}}/b.json"
         |            - name: sparkConf
         |              value: "--conf graft.test.flag=on --conf spark.sql.extensions=com.example.NotSettable"
         |""".stripMargin
    val yamlPath = s"$dir/wf.yaml"
    java.nio.file.Files.write(java.nio.file.Paths.get(yamlPath), yaml.getBytes("UTF-8"))
    val order = Runner.runArgo(spark, yamlPath)
    assert(order === Seq("first", "second"))
    // the task's CLI splice beats the workflow-level parameter (Argo
    // precedence: the rendered command line wins), and a value containing
    // a space survives CLI parsing intact
    val row = spark.table("argo_a").as[(String, String)].collect().head
    assert(row === ("from-task", "2024-01-01 00:00:00"))
    // the conf override was visible DURING the second job (SET reads it),
    // while the non-settable static conf was skipped rather than fatal...
    val flag = spark.table("argo_b").collect().head
    assert(flag.getString(0) === "graft.test.flag" && flag.getString(1) === "on")
    // ...and is restored (unset) after the workflow
    assert(spark.conf.getOption("graft.test.flag").isEmpty)
  }
}
