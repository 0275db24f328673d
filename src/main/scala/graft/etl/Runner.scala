package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** In-process DAG runner — the engine's equivalent of the reference's Argo
  * workflow (SURVEY.md §2.11): named jobs with fan-in dependencies
  * (`example/scd2-job-scheduler.yaml:15-48` — `initial-load` ∥ `delta-load` →
  * `SCD2-merge`), workflow parameters flowing into every job's env (O3,
  * `:10-12,31`). Jobs execute in topological order inside one SparkSession;
  * inter-job state passes through the versioned tables on disk, preserving
  * the reference's "state lives in the lake" property (SURVEY.md §3 entry
  * point B). Independent jobs are safe to run concurrently on a cluster;
  * locally they run sequentially in topo order.
  */
/** One DAG node. `retries`/`retryIntervalMs` mirror the reference's
  * restartPolicy (onFailure retries 3 / interval 10s,
  * `example/native-spark-job-scheduler.yaml:31-36`): a failed job re-runs up
  * to `retries` more times with a fixed backoff before the workflow fails.
  *
  * A retry re-runs the WHOLE JobSpec from the top (the reference's pod
  * restart has the same semantics) — stages that already committed will run
  * again. Point retries at idempotent jobs: full-snapshot loads are
  * naturally idempotent, and TableAppend/TableMergeLoad take an
  * `idempotencyKey` that makes their commit exactly-once across re-runs. */
final case class JobDef(name: String, spec: JobSpec, dependsOn: Seq[String] = Nil,
    retries: Int = 0, retryIntervalMs: Long = 10000L,
    /** Job-scoped variables (a notebook job's `%env` declarations); the
      * workflow/caller env wins on conflict. */
    env: Map[String, String] = Map.empty,
    /** Per-job session conf overrides (O4 — the reference's per-task
      * `sparkConf: --conf k=v`, scd2-job-scheduler.yaml:63-64), applied for
      * the job's duration and restored afterwards. */
    sparkConf: Map[String, String] = Map.empty,
    /** Variables that beat even the workflow/caller env — an Argo task's
      * spliced `--ETL_CONF_*` CLI args are the container's literal command
      * line and always win over workflow-level defaults, unlike `env`
      * (notebook `%env` defaults, which the workflow env overrides). */
    envOverride: Map[String, String] = Map.empty,
    /** The job document's source path, when it was loaded from one — what a
      * FORKED run hands the child JVM to re-parse (each reference pod
      * re-reads its own configUri; the parent never serializes the parsed
      * spec). None for inline-stage jobs, which forked mode rejects. */
    configUri: Option[String] = None)

object Runner {

  /** Topologically sort and run. Fails fast on unknown deps or cycles.
    * `onAttempt(job, attempt)` fires before each try (observability/tests). */
  def run(spark: SparkSession, jobs: Seq[JobDef], env: Map[String, String],
          environment: String = "production",
          onAttempt: (String, Int) => Unit = (_, _) => ()): Seq[String] = {
    val byName = jobs.map(j => j.name -> j).toMap
    val order = topoOrder(jobs)
    try order.foreach { n =>
      val job = byName(n)
      withScopedConf(spark, job.sparkConf) {
        var attempt = 0
        runWithRetries(job.retries, job.retryIntervalMs) {
          attempt += 1
          onAttempt(n, attempt)
          job.spec.run(spark, job.env ++ env ++ job.envOverride, environment)
        }
      }
    } finally
      // per-bucket credential bindings are JOB-scoped, and for a DAG the
      // run is the job: unwind them here so one workflow's auth methods
      // never become ambient config for the next (stage-scoped restore
      // would break cross-task lazy views, which scan under the declaring
      // stage's credentials until the DAG's sinks materialize them)
      Authenticated.restoreBucketAuth(spark)
    order.toSeq
  }

  /** Run the DAG with ONE OS PROCESS PER TASK — the reference's actual
    * execution model (each Argo task is a separate spark-submit
    * application, scd2-job-scheduler.yaml:17-31), which the in-process
    * [[run]] only approximates. Semantics that differ from in-process, all
    * in forked mode's favor:
    *  - handoff is LAKE-ONLY: a task's temp views die with its JVM, so a
    *    DAG that leans on session state fails here exactly as it would on
    *    the cluster;
    *  - per-task `sparkConf` applies at SESSION BUILD time in the child —
    *    even static SQL confs take effect, where in-process scoping must
    *    skip them;
    *  - a retry is a fresh JVM (the pod-restart shape), not a re-run in a
    *    warm session.
    * Each child re-parses its own `configUri` (as a pod re-reads its
    * config); inline-stage jobs have no document to hand over and refuse
    * up front. Locally the child is a bare JVM on this classpath running
    * [[JobChild]]; a cluster deployment would swap the ProcessBuilder for
    * spark-submit — everything else (topology, retries, env precedence) is
    * identical. */
  def runForked(jobs: Seq[JobDef], env: Map[String, String],
                environment: String = "production",
                cpusPerTask: Int = 4): Seq[String] = {
    jobs.foreach(j => require(j.configUri.isDefined,
      s"forked mode needs a configUri for job '${j.name}' — inline-stage " +
        "jobs have no document for the child JVM to re-parse"))
    val order = topoOrder(jobs)
    val byName = jobs.map(j => j.name -> j).toMap
    val javaBin = java.nio.file.Paths.get(
      System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    order.foreach { n =>
      val job = byName(n)
      // env precedence identical to in-process run: notebook %env defaults
      // < workflow/caller env < CLI splices; the child re-derives the
      // notebook defaults from its own parse, so only the upper layers ship
      val shipped = env ++ job.envOverride
      val doc = new ObjectMapper().createObjectNode()
      doc.put("environment", environment)
      doc.put("cpus", cpusPerTask)
      val envNode = doc.putObject("env")
      shipped.foreach { case (k, v) => envNode.put(k, v) }
      val confNode = doc.putObject("sparkConf")
      job.sparkConf.foreach { case (k, v) => confNode.put(k, v) }
      val ctl = java.nio.file.Files.createTempFile(s"graft-job-$n-", ".json")
      java.nio.file.Files.write(ctl,
        new ObjectMapper().writerWithDefaultPrettyPrinter().writeValueAsBytes(doc))
      runWithRetries(job.retries, job.retryIntervalMs) {
        val p = new ProcessBuilder(javaBin, "-cp", cp, "graft.etl.JobChild",
          job.configUri.get, ctl.toString).redirectErrorStream(true).start()
        val out = new String(p.getInputStream.readAllBytes(), "UTF-8")
        val code = p.waitFor()
        if (code != 0) throw new IllegalStateException(
          s"forked job '$n' exited $code:\n${out.takeRight(4000)}")
      }
    }
    order
  }

  /** Topological order shared by [[run]] and [[runForked]] — fails fast on
    * unknown deps or cycles. */
  private def topoOrder(jobs: Seq[JobDef]): Seq[String] = {
    val byName = jobs.map(j => j.name -> j).toMap
    require(byName.size == jobs.size, "duplicate job names")
    jobs.flatMap(_.dependsOn).foreach(d =>
      require(byName.contains(d), s"unknown dependency '$d'"))
    val order = scala.collection.mutable.ArrayBuffer.empty[String]
    val state = scala.collection.mutable.Map.empty[String, Int]
    def visit(n: String): Unit = state.getOrElse(n, 0) match {
      case 2 => ()
      case 1 => throw new IllegalArgumentException(s"dependency cycle through '$n'")
      case _ =>
        state(n) = 1
        byName(n).dependsOn.foreach(visit)
        state(n) = 2
        order += n
    }
    jobs.foreach(j => visit(j.name))
    order.toSeq
  }

  /** Parse a workflow document:
    * `{"parameters": {"k": "v"}, "jobs": [{"name": ..., "dependsOn": [...],
    * "stages"|"configUri": ...}]}` — `configUri` loads the job spec from a
    * file (the scheduler's `configUri`, scd2-job-scheduler.yaml:28-29), and
    * `parameters` merge under the caller's env (caller wins — including in
    * configUri resolution). */
  def fromJson(json: String, env: Map[String, String] = Map.empty)
      : (Seq[JobDef], Map[String, String]) = {
    val root = new ObjectMapper().readTree(json)
    val params =
      if (root.has("parameters"))
        root.get("parameters").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty[String, String]
    val resolved = params ++ env
    val jobs = root.get("jobs").elements().asScala.map { j =>
      val uriOpt =
        if (j.has("configUri"))
          Some(EnvResolver.substitute(j.get("configUri").asText(), resolved))
        else None
      val (spec, jobEnv) = uriOpt match {
        case Some(uri) =>
          // the reference's configUri points at the NOTEBOOK itself
          // (scd2-job-scheduler.yaml:28-29 → .ipynb): notebook %env vars are
          // job-scoped defaults under the workflow parameters
          if (uri.endsWith(".ipynb")) NotebookJob.fromFile(uri)
          else (JobSpec.fromFile(uri), Map.empty[String, String])
        case None => (JobSpec.fromJson(j.toString), Map.empty[String, String])
      }
      val deps =
        if (j.has("dependsOn")) j.get("dependsOn").elements().asScala.map(_.asText()).toSeq
        else Nil
      JobDef(j.get("name").asText(), spec, deps,
        retries = if (j.has("retries")) j.get("retries").asInt() else 0,
        retryIntervalMs =
          if (j.has("retryIntervalMs")) j.get("retryIntervalMs").asLong() else 10000L,
        env = jobEnv, configUri = uriOpt)
    }.toSeq
    (jobs, params)
  }

  def runWorkflow(spark: SparkSession, json: String,
                  env: Map[String, String] = Map.empty,
                  environment: String = "production"): Seq[String] = {
    val (jobs, params) = fromJson(json, env)
    run(spark, jobs, params ++ env, environment)
  }

  /** Apply session conf overrides for `body`'s duration, restoring the prior
    * values afterwards even on failure (O4 scoping — the isolation the pod
    * boundary provides on a cluster). Keys a running session cannot modify
    * (static SQL confs, cluster-manager settings — routine in scheduler
    * documents written for a real cluster) are skipped, not fatal. */
  private[etl] def withScopedConf[A](spark: SparkSession,
      conf: Map[String, String])(body: => A): A = {
    val prev = conf.keys.map(k => k -> spark.conf.getOption(k)).toMap
    try {
      conf.foreach { case (k, v) =>
        try spark.conf.set(k, v)
        catch { case _: org.apache.spark.sql.AnalysisException => () }
      }
      body
    } finally prev.foreach {
      case (k, Some(v)) => try spark.conf.set(k, v) catch { case _: Exception => () }
      case (k, None) => try spark.conf.unset(k) catch { case _: Exception => () }
    }
  }

  /** Re-run `body` up to `retries` extra times on failure with a fixed
    * backoff (the reference's OnFailure restartPolicy,
    * native-spark-job-scheduler.yaml:31-36). */
  private[etl] def runWithRetries(retries: Int, intervalMs: Long)(body: => Unit): Unit = {
    var attempt = 0
    var done = false
    while (!done) {
      attempt += 1
      try { body; done = true }
      catch { case e: Exception =>
        if (attempt > retries) throw e
        if (intervalMs > 0) Thread.sleep(intervalMs)
      }
    }
  }

  /** Run an Argo Workflow YAML (entry point B — the reference's scheduler
    * format, parsed by [[ArgoWorkflow]]) end to end. */
  def runArgo(spark: SparkSession, path: String,
              env: Map[String, String] = Map.empty,
              environment: String = "production",
              uriRewrite: String => String = identity): Seq[String] = {
    val (jobs, params) = ArgoWorkflow.fromFile(path, env, uriRewrite)
    run(spark, jobs, params ++ env, environment)
  }
}
