package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory

import scala.jdk.CollectionConverters._

/** Entry point B, parsed natively: the reference schedules jobs as an Argo
  * `Workflow` document (`example/scd2-job-scheduler.yaml`) — workflow
  * parameters (`:9-12`), a DAG of tasks with `dependencies` fan-in
  * (`:15-48`), and per-task `arguments.parameters` carrying `configUri`
  * (the job notebook, `:28-29`), `parameters` (`--ETL_CONF_*=...` CLI
  * splices, `:31`) and `sparkConf` (`--conf k=v` overrides, `:63-64`).
  * This parser maps that document 1:1 onto [[Runner]]'s model, so the
  * reference's scheduler file drives this engine unmodified — the Argo/K8s
  * machinery (templateRef, images, service accounts) is deployment
  * scaffolding with no query semantics and is deliberately ignored.
  *
  * `{{workflow.parameters.X}}` handlebars resolve from the workflow's
  * parameter list, caller env winning on conflict. `uriRewrite` lets a
  * caller map the scheduler's object-store URIs onto a local lake (the
  * reference's `s3a://bucket/...` is unreachable in an air-gapped test
  * environment; on a real cluster the identity mapping is fine).
  */
object ArgoWorkflow {
  private val Handlebar = raw"\{\{workflow\.parameters\.([A-Za-z0-9_.\-]+)\}\}".r

  def fromFile(path: String, env: Map[String, String] = Map.empty,
               uriRewrite: String => String = identity)
      : (Seq[JobDef], Map[String, String]) =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), env, uriRewrite)

  def fromYaml(yaml: String, env: Map[String, String] = Map.empty,
               uriRewrite: String => String = identity)
      : (Seq[JobDef], Map[String, String]) = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    require(root.path("kind").asText() == "Workflow",
      s"not an Argo Workflow document (kind=${root.path("kind").asText()})")
    val spec = root.get("spec")
    require(spec != null && spec.isObject, "Workflow document has no spec")
    require(spec.path("templates").isArray, "Workflow spec has no templates list")
    val params = paramMap(spec.path("arguments"))
    val resolved = params ++ env
    def hb(s: String): String = Handlebar.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(resolved.getOrElse(m.group(1),
        throw new IllegalArgumentException(
          s"unresolved workflow parameter '${m.group(1)}'"))))
    val entry = spec.path("entrypoint").asText()
    val template = spec.get("templates").elements().asScala
      .find(_.path("name").asText() == entry).getOrElse(
        throw new IllegalArgumentException(s"entrypoint template '$entry' not found"))
    val tasks = template.path("dag").path("tasks")
    require(tasks.isArray, s"entrypoint template '$entry' has no dag.tasks")
    val jobs = tasks.elements().asScala.map { t =>
      val taskName = t.path("name").asText()
      val args = paramMap(t.path("arguments"))
      val configUri = uriRewrite(hb(args.getOrElse("configUri",
        throw new IllegalArgumentException(s"task '$taskName' has no configUri"))))
      val (jobSpec, nbEnv) =
        if (configUri.endsWith(".ipynb")) NotebookJob.fromFile(configUri)
        else (JobSpec.fromFile(configUri), Map.empty[String, String])
      val cliEnv = args.get("parameters").map(p => parseCli(hb(p), taskName))
        .getOrElse(Map.empty)
      val sparkConf = args.get("sparkConf").map(p => parseConf(hb(p), taskName))
        .getOrElse(Map.empty)
      val deps =
        if (t.has("dependencies"))
          t.get("dependencies").elements().asScala.map(_.asText()).toSeq
        else Nil
      // precedence: notebook %env are job-scoped DEFAULTS (workflow/caller
      // env beats them via JobDef.env), but the spliced CLI args are the
      // container's literal command line and beat everything (envOverride)
      JobDef(taskName, jobSpec, deps, env = nbEnv, envOverride = cliEnv,
        sparkConf = sparkConf, configUri = Some(configUri))
    }.toSeq
    (jobs, params)
  }

  /** Argo's `parameters: [{name: ..., value: ...}, ...]` list → map. */
  private def paramMap(node: JsonNode): Map[String, String] =
    if (node.path("parameters").isArray)
      node.get("parameters").elements().asScala
        .map(p => p.get("name").asText() -> p.path("value").asText()).toMap
    else Map.empty

  /** `--ETL_CONF_A=x --ETL_CONF_B=y` → Map(ETL_CONF_A -> x, …). Splitting
    * only at whitespace that precedes the next `--` keeps values containing
    * spaces intact (reference values are SQL fragments/timestamps, e.g. the
    * notebook's `current_timestamp()` or `2024-01-01 00:00:00`). */
  private def parseCli(s: String, task: String): Map[String, String] =
    s.trim.split("\\s+(?=--)").iterator.filter(_.nonEmpty).map { tok =>
      require(tok.startsWith("--") && tok.indexOf('=') > 2,
        s"task '$task': bad CLI parameter '$tok' (expected --KEY=value)")
      val kv = tok.drop(2)
      val i = kv.indexOf('=')
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap

  /** `--conf k=v --conf k2=v2` → Map(k -> v, …); values may contain spaces
    * (split only ahead of the next `--`, as in [[parseCli]]). */
  private def parseConf(s: String, task: String): Map[String, String] =
    s.trim.split("\\s+(?=--)").iterator.filter(_.nonEmpty).map { frag =>
      val kv = frag.stripPrefix("--conf").trim
      val i = kv.indexOf('=')
      require(frag.startsWith("--conf") && i > 0,
        s"task '$task': bad sparkConf fragment '$frag' (expected --conf key=value)")
      kv.substring(0, i) -> kv.substring(i + 1)
    }.toMap
}
