package graft.etl

/** Variable substitution for job configs and SQL text.
  *
  * Reproduces the reference's two substitution mechanisms
  * (`example/notebook/scd2-job.ipynb:42,91,141,145` — `${ETL_CONF_*}` splices and
  * per-stage `sqlParams` key=value maps) as a single pure text pass: `${name}`
  * tokens are replaced from an environment map, innermost-first, with
  * `sqlParams` taking precedence over job env over process env.
  *
  * Resolution happens BEFORE SQL parsing — the reference substitutes raw text
  * into SQL (e.g. `scd2-job.ipynb:132` injects the literal string
  * `current_timestamp()`), so values may be arbitrary SQL fragments.
  */
object EnvResolver {
  private val Token = raw"\$$\{([A-Za-z0-9_.\-]+)\}".r

  /** Substitute all `${name}` tokens; unknown names raise (fail fast, like a
    * missing `--ETL_CONF_*` CLI arg in the reference scheduler,
    * `example/scd2-job-scheduler.yaml:31`). */
  def substitute(text: String, env: Map[String, String]): String =
    Token.replaceAllIn(text, m => {
      val k = m.group(1)
      Regex.quoteReplacement(
        env.getOrElse(k, throw new IllegalArgumentException(s"unresolved variable $${$k}")))
    })

  /** Parse a `key=value,key2=value2` sqlParams header (reference notebook `%sql`
    * cell option, `scd2-job.ipynb:141`). Values may contain '=' after the first. */
  def parseSqlParams(s: String): Map[String, String] =
    s.split(",").iterator.map(_.trim).filter(_.nonEmpty).map { kv =>
      val i = kv.indexOf('=')
      require(i > 0, s"bad sqlParams entry '$kv'")
      kv.substring(0, i).trim -> kv.substring(i + 1).trim
    }.toMap

  private object Regex {
    def quoteReplacement(s: String): String =
      java.util.regex.Matcher.quoteReplacement(s)
  }
}
