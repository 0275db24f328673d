package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Child-JVM entry point for [[Runner.runForked]]: one DAG task = one
  * process = one SparkSession, the reference's spark-submit-per-task shape
  * (scd2-job-scheduler.yaml:17-31). Re-parses its own job document from
  * `configUri` (exactly as a pod re-reads its config), applies the task's
  * sparkConf at SESSION BUILD time (so even static confs take effect —
  * stronger isolation than the in-process scoped-conf approximation), runs
  * the job, and exits 0/1. All inter-task state lives in the lake: temp
  * views die here, which is the semantics a real cluster gives.
  *
  * Args: `<configUri> <controlFile>` where the control file is JSON
  * `{environment, cpus, env: {...}, sparkConf: {...}}` written by the
  * parent. The shipped env is workflow/caller env ++ the task's CLI
  * splices; the notebook's own %env defaults re-derive from the parse here
  * and sit UNDER it — the same precedence the in-process runner applies. */
object JobChild {
  def main(args: Array[String]): Unit = {
    val Array(configUri, controlFile) = args.take(2)
    val ctl = new ObjectMapper().readTree(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(controlFile)))
    val environment = ctl.path("environment").asText("production")
    val cpus = ctl.path("cpus").asInt(4)
    def props(field: String): Map[String, String] =
      if (ctl.has(field))
        ctl.get(field).properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty
    val env = props("env")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.ansi.enabled", "false")
      .config("spark.sql.catalog.graft", classOf[graft.catalog.GraftCatalog].getName)
      .withExtensions(new graft.catalog.GraftExtensions()(_))
    // the task's sparkConf lands at build time — per-JVM isolation is the
    // whole point of the fork, so nothing needs scoping or restoring
    props("sparkConf").foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try {
      val (spec, jobEnv) =
        if (configUri.endsWith(".ipynb")) NotebookJob.fromFile(configUri)
        else (JobSpec.fromFile(configUri), Map.empty[String, String])
      spec.run(spark, jobEnv ++ env, environment)
      ()
    } catch {
      case e: Throwable =>
        System.err.println(s"[graft-job-child] FAILED: ${e.getMessage}")
        spark.stop()
        sys.exit(1)
    }
    spark.stop()
  }
}
