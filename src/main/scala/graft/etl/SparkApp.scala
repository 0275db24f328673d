package graft.etl

import com.fasterxml.jackson.databind.ObjectMapper
import com.fasterxml.jackson.dataformat.yaml.YAMLFactory
import org.apache.spark.sql.SparkSession

import scala.jdk.CollectionConverters._

/** Entry point C, parsed natively: the reference's third execution surface is
  * a `SparkApplication` document (`example/native-spark-job-scheduler.yaml`)
  * running a native Spark job (`word-count` / `wordcount.py`, `:4,12`) with
  * `$(VAR)` argument substitution from configMap-fed driver env (`:13,50-55`),
  * job-level `sparkConf` (`:15-20`) and an OnFailure/OnSubmission restart
  * policy (`:31-36`). This parser maps the document onto the same in-process
  * execution model as [[ArgoWorkflow]]: deployment scaffolding (images,
  * volumes, affinity, executor shapes) has no query semantics and is ignored;
  * what executes is the main application, resolved from a caller-supplied
  * registry keyed by the file's basename — the in-process analog of "the
  * code baked into the image".
  */
object SparkApp {

  /** The semantically meaningful slice of a SparkApplication document. */
  final case class NativeApp(
      name: String,
      /** Basename of `mainApplicationFile` (e.g. `wordcount.py`). */
      mainFile: String,
      /** `spec.arguments` after `$(VAR)` env substitution. */
      arguments: Seq[String],
      /** `spec.sparkConf`, applied for the run's duration (O4 scoping). */
      sparkConf: Map[String, String],
      /** OnFailure retries/interval (`restartPolicy`, O5). */
      retries: Int,
      retryIntervalMs: Long)

  def fromFile(path: String, env: Map[String, String] = Map.empty): NativeApp =
    fromYaml(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), "UTF-8"), env)

  /** Parse; `env` resolves `valueFrom.configMapKeyRef` driver-env entries by
    * their configMap KEY (the in-process stand-in for the cluster configMap)
    * and thereby the `$(VAR)` tokens in `arguments`. */
  def fromYaml(yaml: String, env: Map[String, String] = Map.empty): NativeApp = {
    val root = new ObjectMapper(new YAMLFactory()).readTree(yaml)
    require(root.path("kind").asText() == "SparkApplication",
      s"not a SparkApplication document (kind=${root.path("kind").asText()})")
    val spec = root.get("spec")
    // driver env: direct values, or configMapKeyRef resolved from caller env
    val driverEnv = spec.path("driver").path("env") match {
      case n if n.isArray => n.elements().asScala.map { e =>
        val name = e.get("name").asText()
        val value =
          if (e.has("value")) e.get("value").asText()
          else {
            val key = e.path("valueFrom").path("configMapKeyRef").path("key").asText()
            env.getOrElse(key, throw new IllegalArgumentException(
              s"driver env '$name' needs configMap key '$key' (pass it in env)"))
          }
        name -> value
      }.toMap
      case _ => Map.empty[String, String]
    }
    val Token = raw"\$$\(([A-Za-z0-9_]+)\)".r
    def sub(s: String): String = Token.replaceAllIn(s, m =>
      java.util.regex.Matcher.quoteReplacement(
        (driverEnv ++ env).getOrElse(m.group(1),
          throw new IllegalArgumentException(s"unresolved \\$$(${m.group(1)})"))))
    val args =
      if (spec.path("arguments").isArray)
        spec.get("arguments").elements().asScala.map(a => sub(a.asText())).toSeq
      else Nil
    val conf =
      if (spec.has("sparkConf"))
        spec.get("sparkConf").properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toMap
      else Map.empty[String, String]
    val rp = spec.path("restartPolicy")
    val mainFile = spec.path("mainApplicationFile").asText()
    NativeApp(
      name = root.path("metadata").path("name").asText(),
      mainFile = mainFile.substring(mainFile.lastIndexOf('/') + 1),
      arguments = args,
      sparkConf = conf,
      retries = rp.path("onFailureRetries").asInt(0),
      retryIntervalMs = rp.path("onFailureRetryInterval").asLong(10L) * 1000L)
  }

  /** Execute: dispatch `mainFile` against `registry`, with the document's
    * sparkConf applied for the duration (restored after, even on failure;
    * cluster-only confs skipped) and the OnFailure restart policy honored —
    * both via [[Runner]]'s shared scoped-conf/retry mechanics. */
  def run(spark: SparkSession, app: NativeApp,
          registry: Map[String, (SparkSession, Seq[String]) => Unit]): Unit = {
    val main = registry.getOrElse(app.mainFile, throw new IllegalArgumentException(
      s"no native job registered for '${app.mainFile}' " +
        s"(registry has: ${registry.keys.mkString(", ")})"))
    Runner.withScopedConf(spark, app.sparkConf) {
      Runner.runWithRetries(app.retries, app.retryIntervalMs) {
        main(spark, app.arguments)
      }
    }
  }
}
