package graft.etl

import com.fasterxml.jackson.databind.{JsonNode, ObjectMapper}
import graft.table.Merge
import org.apache.spark.sql.{DataFrame, SparkSession}

import scala.jdk.CollectionConverters._

/** A job = ordered stage list + environment gate (SURVEY.md §1.5, §3).
  *
  * JSON shape mirrors the reference's stage configs
  * (`example/notebook/scd2-job.ipynb` raw-JSON cells):
  * {{{
  * {"stages": [
  *   {"type": "DelimitedExtract", "name": "extract initial",
  *    "environments": ["production","test"],
  *    "inputURI": "${ETL_CONF_DATALAKE_LOC}/initial_contacts.csv",
  *    "outputView": "initial_raw", "delimiter": "Comma",
  *    "header": false, "quote": "None"},
  *   ...]}
  * }}}
  */
/** Job-level directives (the reference's `%conf numRows=12 showLog=true`,
  * scd2-job.ipynb:20-22): when `showLog`, every view-producing stage previews
  * `numRows` rows. */
final case class JobConf(numRows: Int = 12, showLog: Boolean = false)

final case class JobSpec(stages: Seq[Stage], conf: JobConf = JobConf()) {

  /** Run stages in order under `environment`, threading the view catalog
    * through the session (entry-point A trace, SURVEY.md §3). Returns the last
    * produced view, if any. */
  def run(spark: SparkSession, env: Map[String, String],
          environment: String = "production"): Option[DataFrame] = {
    val active = stages.filter(s => s.environments.isEmpty || s.environments.contains(environment))
    active.foldLeft(Option.empty[DataFrame]) { (last, stage) =>
      val out = stage.execute(spark, env)
      if (conf.showLog) out.foreach(_.show(conf.numRows, truncate = false))
      out.orElse(last)
    }
  }
}

object JobSpec {
  private val mapper = new ObjectMapper()

  def fromFile(path: String): JobSpec =
    fromJson(new String(java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)), "UTF-8"))

  def fromJson(json: String): JobSpec = {
    val root = mapper.readTree(json)
    val stagesNode = if (root.has("stages")) root.get("stages") else root
    require(stagesNode.isArray, "job spec must have a 'stages' array")
    val conf =
      if (root.isObject && root.has("conf")) {
        val c = root.get("conf")
        JobConf(
          numRows = if (c.has("numRows")) c.get("numRows").asInt() else 12,
          showLog = c.has("showLog") && c.get("showLog").asBoolean())
      } else JobConf()
    JobSpec(stagesNode.elements().asScala.map(parseStage).toSeq, conf)
  }

  private def str(n: JsonNode, k: String): String = {
    require(n.has(k), s"stage missing required key '$k': $n")
    n.get(k).asText()
  }
  private def optStr(n: JsonNode, k: String): Option[String] =
    if (n.has(k) && !n.get(k).isNull) Some(n.get(k).asText()) else None
  private def optInt(n: JsonNode, k: String): Option[Int] =
    if (n.has(k) && !n.get(k).isNull) Some(n.get(k).asInt()) else None
  private def longKey(n: JsonNode, k: String): Long = {
    require(n.has(k), s"stage missing required key '$k': $n")
    val v = n.get(k)
    // Jackson's asLong() turns non-numeric text into a silent 0 — for a
    // version number that would mean "restore v0", a maximal rollback from a
    // typo; insist on an actual number
    require(v.canConvertToLong, s"stage key '$k' must be an integer, got: $v")
    v.asLong()
  }
  private def envs(n: JsonNode): Seq[String] =
    if (n.has("environments")) n.get("environments").elements().asScala.map(_.asText()).toSeq
    else Nil
  private def strMap(n: JsonNode, k: String): Map[String, String] =
    if (n.has(k))
      n.get(k).properties().asScala.map(e => e.getKey -> e.getValue.asText()).toMap
    else Map.empty

  private[etl] def parseStage(n: JsonNode): Stage = {
    val stage = parseStageInner(n)
    // the reference's per-stage authentication block: validated and bound
    // to the stage, never silently dropped (an unknown method refuses HERE
    // — running a typo'd auth block with ambient credentials instead of
    // the declared ones is a security hole, not a fallback)
    if (n.has("authentication")) {
      val a = n.get("authentication")
      val m = str(a, "method")
      require(Authenticated.Methods.contains(m),
        s"stage ${stage.name}: unknown authentication method '$m' " +
          s"(supported: ${Authenticated.Methods.keys.toSeq.sorted.mkString(", ")})")
      // the stage's own URIs scope the credentials to ITS buckets (see
      // Authenticated.applyMethod) — per-stage intent, not job-global state
      val uris = Seq("inputURI", "outputURI").flatMap(f => optStr(n, f))
      Authenticated(stage, m, uris)
    } else stage
  }

  private def parseStageInner(n: JsonNode): Stage = {
    val name = optStr(n, "name").getOrElse("")
    str(n, "type") match {
      case "DelimitedExtract" => DelimitedExtract(
        name, str(n, "inputURI"), str(n, "outputView"),
        optStr(n, "delimiter").getOrElse("Comma"),
        n.has("header") && n.get("header").asBoolean(),
        optStr(n, "quote").getOrElse("DoubleQuote"), envs(n))
      case "ParquetExtract" =>
        ParquetExtract(name, str(n, "inputURI"), str(n, "outputView"), envs(n))
      case "JsonExtract" =>
        JsonExtract(name, str(n, "inputURI"), str(n, "outputView"), envs(n))
      case "OrcExtract" =>
        OrcExtract(name, str(n, "inputURI"), str(n, "outputView"), envs(n))
      case "XmlExtract" => XmlExtract(
        name, str(n, "inputURI"), str(n, "outputView"),
        optStr(n, "rowTag").getOrElse("row"), optStr(n, "schemaDDL"), envs(n))
      case "FileLoad" => FileLoad(
        name, str(n, "inputView"), str(n, "outputURI"),
        optStr(n, "format").getOrElse("parquet"),
        optStr(n, "saveMode").getOrElse("Overwrite"),
        if (n.has("partitionBy"))
          n.get("partitionBy").elements().asScala.map(_.asText()).toSeq
        else Nil,
        optInt(n, "numPartitions"), strMap(n, "options"), envs(n))
      case "TypingTransform" => TypingTransform(
        name, str(n, "inputView"), str(n, "outputView"),
        optStr(n, "schemaURI"),
        if (n.has("schema")) Some(n.get("schema").toString) else None,
        !n.has("positional") || n.get("positional").asBoolean(),
        optStr(n, "failMode").getOrElse("permissive"), envs(n))
      case "SQLTransform" => SQLTransform(
        name, str(n, "sql"), str(n, "outputView"), strMap(n, "sqlParams"), envs(n))
      case "SQLAssert" | "SQLValidate" => SQLAssert(
        name, str(n, "sql"), optStr(n, "expect").getOrElse("all_true"),
        strMap(n, "sqlParams"), envs(n))
      case "ExpectTransform" =>
        require(n.has("expectations"),
          s"ExpectTransform '$name' needs an expectations object")
        ExpectTransform(
          name, str(n, "inputView"), str(n, "outputView"),
          // JSON object order is not contractual (Jackson does not
          // preserve it here) — sort by name so the metrics-row order and
          // the _violations rendering are deterministic across runs
          n.get("expectations").properties().asScala
            .map(e => e.getKey -> e.getValue.asText()).toSeq.sortBy(_._1),
          optStr(n, "onViolation").getOrElse("drop"),
          optStr(n, "quarantineURI"), optStr(n, "metricsView"),
          if (n.has("failThreshold")) Some(n.get("failThreshold").asDouble())
          else None,
          envs(n))
      case "DeltaLakeLoad" | "TableLoad" => TableLoad(
        name, str(n, "inputView"), str(n, "outputURI"), optInt(n, "numPartitions"),
        if (n.has("partitionBy")) n.get("partitionBy").elements().asScala.map(_.asText()).toSeq
        else Nil, envs(n))
      case "TableCheckpoint" => TableCheckpoint(name, str(n, "tableURI"), envs(n))
      case "TableProperties" => TableProperties(
        name, str(n, "tableURI"), strMap(n, "properties"), envs(n))
      case "TableChangeFeed" => TableChangeFeed(
        name, str(n, "tableURI"), str(n, "outputView"), longKey(n, "fromVersion"),
        optInt(n, "toVersion").map(_.toLong), envs(n))
      case "DeltaLakeExtract" | "TableExtract" =>
        val opts = if (n.has("options")) n.get("options") else n
        TableExtract(name, str(n, "inputURI"), str(n, "outputView"),
          optInt(opts, "relativeVersion"),
          optInt(opts, "versionAsOf").map(_.toLong), envs(n))
      case "DeltaLakeMergeLoad" | "TableMergeLoad" => TableMergeLoad(
        name, str(n, "inputView"), str(n, "outputURI"), str(n, "condition"),
        whenMatchedUpdate =
          if (n.has("whenMatchedUpdate")) {
            val u = n.get("whenMatchedUpdate")
            Some(Merge.MatchedUpdate(optStr(u, "condition"), strMap(u, "values")))
          } else None,
        whenMatchedDelete =
          if (n.has("whenMatchedDelete"))
            Some(Merge.MatchedDelete(optStr(n.get("whenMatchedDelete"), "condition")))
          else None,
        whenNotMatchedByTargetInsert =
          if (n.has("whenNotMatchedByTargetInsert")) {
            val i = n.get("whenNotMatchedByTargetInsert")
            Some(Merge.NotMatchedInsert(optStr(i, "condition"), strMap(i, "values")))
          } else None,
        numPartitions = optInt(n, "numPartitions"),
        pruneKeys =
          if (n.has("pruneKeys")) {
            val p = n.get("pruneKeys")
            Some((str(p, "targetKey"), str(p, "sourceKey")))
          } else None,
        idempotencyKey = optStr(n, "idempotencyKey"),
        environments = envs(n))
      case "TableAppend" => TableAppend(
        name, str(n, "inputView"), str(n, "outputURI"), optInt(n, "numPartitions"),
        if (n.has("sortBy")) n.get("sortBy").elements().asScala.map(_.asText()).toSeq
        else Nil, optStr(n, "idempotencyKey"), envs(n))
      case "TableDelete" => TableDelete(
        name, str(n, "tableURI"), str(n, "condition"),
        mor = n.has("mor") && n.get("mor").asBoolean(false), environments = envs(n))
      case "TableUpdate" => TableUpdate(
        name, str(n, "tableURI"), str(n, "condition"), strMap(n, "set"), envs(n))
      case "TableCompact" => TableCompact(
        name, str(n, "tableURI"), optInt(n, "numFiles").getOrElse(1),
        if (n.has("sortBy")) n.get("sortBy").elements().asScala.map(_.asText()).toSeq
        else Nil,
        if (n.has("zOrderBy")) n.get("zOrderBy").elements().asScala.map(_.asText()).toSeq
        else Nil, optInt(n, "targetFileSizeMb"), envs(n))
      case "TableCluster" => TableCluster(
        name, str(n, "tableURI"),
        n.get("zOrderBy").elements().asScala.map(_.asText()).toSeq,
        optInt(n, "targetFileSizeMb").getOrElse(128),
        optInt(n, "numFiles"), envs(n))
      case "StreamIngest" => StreamIngest(
        name, str(n, "inputURI"), str(n, "outputURI"),
        optStr(n, "schemaDDL"), optStr(n, "checkpointURI"),
        optInt(n, "maxFilesPerTrigger"), envs(n))
      case "TableCloneSync" => TableCloneSync(
        name, str(n, "tableURI"), str(n, "targetURI"),
        !n.has("deep") || n.get("deep").asBoolean(true),
        optStr(n, "outputView"), envs(n))
      case "TableFsck" => TableFsck(
        name, str(n, "tableURI"),
        n.has("dryRun") && n.get("dryRun").asBoolean(false),
        optStr(n, "outputView"), envs(n))
      case "TableVacuum" => TableVacuum(
        name, str(n, "tableURI"), optInt(n, "retainVersions").getOrElse(2), envs(n))
      case "TableRestore" => TableRestore(
        name, str(n, "tableURI"), longKey(n, "versionAsOf"), envs(n))
      case "DedupIndexBuild" => DedupIndexBuild(
        name, str(n, "inputView"), str(n, "storeURI"), envs(n))
      case "DedupIndexAdmit" => DedupIndexAdmit(
        name, str(n, "inputView"), str(n, "storeURI"), str(n, "outputView"),
        envs(n))
      case "VectorIndexBuild" => VectorIndexBuild(
        name, str(n, "inputView"), str(n, "storeURI"), envs(n))
      case "VectorIndexAdmit" => VectorIndexAdmit(
        name, str(n, "inputView"), str(n, "storeURI"), str(n, "outputView"),
        optStr(n, "threshold").map(_.toDouble)
          .getOrElse(graft.dedup.VectorStore.DefaultThreshold),
        optStr(n, "probes").map(_.toInt)
          .getOrElse(graft.dedup.VectorStore.DefaultProbes), envs(n))
      case "DedupIndexEvict" => DedupIndexEvict(
        name, str(n, "inputView"), str(n, "storeURI"),
        optStr(n, "outputView"), envs(n))
      case "VectorIndexEvict" => VectorIndexEvict(
        name, str(n, "inputView"), str(n, "storeURI"),
        optStr(n, "outputView"), envs(n))
      case "VectorIndexRebalance" => VectorIndexRebalance(
        name, str(n, "storeURI"),
        optStr(n, "ifSkewAbove").map(_.toDouble), envs(n))
      case "TextIndexBuild" => TextIndexBuild(
        name, str(n, "inputView"), str(n, "storeURI"),
        str(n, "fingerprint"), envs(n))
      case "TextIndexAdmit" => TextIndexAdmit(
        name, str(n, "inputView"), str(n, "storeURI"),
        str(n, "fingerprint"), optStr(n, "outputView"), envs(n))
      case "TextIndexEvict" => TextIndexEvict(
        name, str(n, "inputView"), str(n, "storeURI"),
        str(n, "fingerprint"), optStr(n, "outputView"), envs(n))
      case "StreamIndexSync" => StreamIndexSync(
        name, str(n, "tableURI"), str(n, "storeURI"), str(n, "kind"),
        str(n, "checkpointURI"), optStr(n, "fingerprint").getOrElse(""),
        optStr(n, "outputView"), envs(n))
      case "StreamForgetDrain" => StreamForgetDrain(
        name, str(n, "requestsURI"), str(n, "idColumn"),
        str(n, "checkpointURI"),
        optStr(n, "textStoreURI"), optStr(n, "vectorStoreURI"),
        optStr(n, "dedupStoreURI"),
        optStr(n, "fingerprint").getOrElse("forget"), envs(n))
      case "ForgetBatch" => ForgetBatch(
        name, str(n, "requestsURI"), str(n, "idColumn"),
        optStr(n, "textStoreURI"), optStr(n, "vectorStoreURI"),
        optStr(n, "dedupStoreURI"),
        optStr(n, "fingerprint").getOrElse("forget"),
        optStr(n, "outputView"), envs(n))
      case "TextIndexSync" => TextIndexSync(
        name, str(n, "tableURI"), str(n, "storeURI"),
        str(n, "fingerprint"), optStr(n, "outputView"), envs(n))
      case "VectorIndexSync" => VectorIndexSync(
        name, str(n, "tableURI"), str(n, "storeURI"),
        optStr(n, "outputView"), envs(n))
      case "MatViewRefresh" =>
        val sumsNode = n.get("sums")
        require(sumsNode != null && sumsNode.isObject,
          s"stage $name: MatViewRefresh needs a 'sums' object (name -> expression)")
        require(n.has("keys") && n.get("keys").isArray && n.get("keys").size() > 0,
          s"stage $name: MatViewRefresh needs a non-empty 'keys' array")
        // Jackson preserves declaration order: it becomes the view's column order
        val sums = sumsNode.properties().asScala
          .map(e => e.getKey -> e.getValue.asText()).toSeq
        MatViewRefresh(name, str(n, "baseURI"), str(n, "viewURI"),
          n.get("keys").elements().asScala.map(_.asText()).toSeq, sums, envs(n))
      case "TableConstraint" =>
        val action = str(n, "action")
        require(action == "drop" || optStr(n, "expression").exists(_.trim.nonEmpty),
          s"stage $name: TableConstraint add needs a non-empty 'expression'")
        TableConstraint(name, str(n, "tableURI"), action,
          str(n, "constraintName"), optStr(n, "expression").getOrElse(""), envs(n))
      case "SQLExecute" | "JDBCExecute" =>
        // the reference's JDBCExecute carries the SQL in a file (`inputURI`,
        // scd2-job.ipynb:381) rather than inline. With a `jdbcURL` it runs
        // against that endpoint for real; without one it executes against
        // the session catalog (the self-contained mapping — see SQLExecute).
        // One of the two SQL carriers must be present — failing at parse
        // time beats an opaque empty-SQL error mid-job.
        val sqlText = optStr(n, "sql")
        val uri = optStr(n, "inputURI")
        require(sqlText.exists(_.trim.nonEmpty) || uri.isDefined,
          s"stage $name: SQLExecute needs a non-empty 'sql' or an 'inputURI'")
        optStr(n, "jdbcURL") match {
          case Some(url) => JDBCExecute(
            name, url, sqlText.getOrElse(""), strMap(n, "sqlParams"), uri, envs(n))
          case None =>
            SQLExecute(name, sqlText.getOrElse(""), strMap(n, "sqlParams"), uri, envs(n))
        }
      case "JDBCExtract" => JDBCExtract(
        name, str(n, "jdbcURL"), str(n, "tableName"), str(n, "outputView"),
        optStr(n, "partitionColumn"), optInt(n, "numPartitions"),
        optStr(n, "lowerBound").map(_.toLong), optStr(n, "upperBound").map(_.toLong),
        if (n.has("predicates"))
          n.get("predicates").elements().asScala.map(_.asText()).toSeq
        else Nil,
        optInt(n, "fetchsize").getOrElse(1000), envs(n))
      case "JDBCLoad" => JDBCLoad(
        name, str(n, "inputView"), str(n, "jdbcURL"), str(n, "tableName"),
        optStr(n, "saveMode").getOrElse("Append"), optInt(n, "numPartitions"),
        optInt(n, "batchsize").getOrElse(1000),
        n.has("truncate") && n.get("truncate").asBoolean(), envs(n))
      case "PrintSchema" => PrintSchema(name, str(n, "inputView"), envs(n))
      case "ProfileTransform" => ProfileTransform(
        name, str(n, "inputView"), str(n, "outputView"),
        if (n.has("columns"))
          n.get("columns").elements().asScala.map(_.asText()).toSeq
        else Nil,
        !n.has("exactNdv") || n.get("exactNdv").asBoolean(), envs(n))
      case other => throw new IllegalArgumentException(s"unknown stage type '$other'")
    }
  }
}
