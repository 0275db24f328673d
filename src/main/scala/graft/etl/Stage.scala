package graft.etl

import graft.table.{Merge, VersionedTable}
import graft.typing.SchemaDoc
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Typed stage ADT — the engine's equivalent of the reference's JSON/HOCON
  * stage configs (`"type"`, `"name"`, `"environments"`, `"inputView"`,
  * `"outputView"`, … — e.g. `example/notebook/scd2-job.ipynb:39-50`).
  *
  * A job is an ordered list of stages (SURVEY.md §1.5); each stage either
  * registers a named temp view (extract/transform) or performs a side effect
  * (load/merge/execute). Stages gate on `environments` the way the reference
  * parks `uat`-only validation stages (`scd2-job.ipynb:409,422-424`).
  */
sealed trait Stage {
  def name: String
  def environments: Seq[String]
  /** Run the stage; extract/transform stages register `outputView` and return
    * the DataFrame, side-effecting stages return None. */
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame]

  protected def sub(text: String, env: Map[String, String]): String =
    EnvResolver.substitute(text, env)
}

/** Per-stage `authentication` block (the reference stamps
  * `{"method": "AmazonIAM"}` on every S3 extract/load —
  * `example/notebook/scd2-job.ipynb:47-49,94-96,170-172`). Parsed,
  * VALIDATED, and mapped to the matching Hadoop credentials-provider conf
  * before the wrapped stage runs — never silently dropped: a job spec's
  * auth intent either takes effect (object stores) or is a recorded no-op
  * (local FS), and an unknown method refuses at PARSE time, because a
  * typo'd auth block silently running with ambient credentials is a
  * security hole, not a fallback. */
final case class Authenticated(inner: Stage, method: String,
    uris: Seq[String] = Nil) extends Stage {
  def name: String = inner.name
  def environments: Seq[String] = inner.environments
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val restore = Authenticated.applyMethod(spark, method, uris)
    try inner.execute(spark, env) finally restore()
  }
}

object Authenticated {
  /** method → the public Hadoop s3a connector settings it maps to.
    * `AmazonIAM` = the instance-profile/role credentials the reference's
    * EKS/IRSA deployment uses (`scd2-job.ipynb:47`); `AmazonAnonymous` =
    * public-bucket reads. Extend here as methods are needed — parseStage
    * refuses anything absent from this map. */
  val Methods: Map[String, Map[String, String]] = Map(
    "AmazonIAM" -> Map(
      "fs.s3a.aws.credentials.provider" ->
        "com.amazonaws.auth.InstanceProfileCredentialsProvider"),
    "AmazonAnonymous" -> Map(
      "fs.s3a.aws.credentials.provider" ->
        "org.apache.hadoop.fs.s3a.AnonymousAWSCredentialsProvider"))

  private val logged = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Per-bucket auth bindings live in this JVM: bucket → (method, the
    * per-bucket config values each binding replaced — captured at FIRST
    * binding, so a later restore returns the config to its pre-job state).
    * The registry is what keeps per-bucket scoping from becoming a
    * bucket-granular ambient-state leak: a stage declaring a DIFFERENT
    * method for an already-bound bucket REFUSES loudly (silently running
    * under whichever provider landed last is the security bug the scoping
    * exists to prevent), and [[restoreBucketAuth]] unwinds every binding
    * at the job boundary. */
  private val bucketBindings = new java.util.concurrent.ConcurrentHashMap[
    String, (String, Map[String, Option[String]])]()

  /** Restore every per-bucket credential key this process applied to its
    * pre-binding value and clear the bindings — call at the JOB boundary
    * (not per stage: a stage's lazily-extracted views scan during later
    * stages' actions and must still see their declared credentials).
    * [[Runner.run]] calls this after the DAG completes; a host embedding
    * [[JobSpec.run]] directly should call it once the job's outputs are
    * materialized. */
  def restoreBucketAuth(spark: SparkSession): Unit = {
    import scala.jdk.CollectionConverters._
    val conf = spark.sparkContext.hadoopConfiguration
    bucketBindings.asScala.values.foreach { case (_, prior) =>
      prior.foreach {
        case (k, Some(v)) => conf.set(k, v)
        case (k, None) => conf.unset(k)
      }
    }
    bucketBindings.clear()
  }

  private def bucketOf(uri: String): Option[String] =
    scala.util.Try(java.net.URI.create(uri)).toOption
      .filter(u => Set("s3a", "s3n", "s3").contains(u.getScheme))
      .flatMap(u => Option(u.getHost)).filter(_.nonEmpty)

  /** Apply the method SCOPED TO THE STAGE, not job-globally — per-stage
    * auth intent must not become ambient state for every later stage that
    * declared none (one extract's AmazonAnonymous silently downgrading a
    * later load's IAM credentials is a security bug, not a convenience).
    * Two scopes, by what the stage touches:
    *  - object-store URIs: the provider binds to the stage's own buckets
    *    via Hadoop's per-bucket `fs.s3a.bucket.<name>.*` keys, which stay
    *    set for the JOB — correct for the stage's LAZY frames (a view
    *    extracted here scans during a later stage's action, and must still
    *    see its declared credentials) while leaving the base `fs.s3a.*`
    *    config, and so every other bucket, untouched. The binding is
    *    registered ([[bucketBindings]]): a conflicting method for the same
    *    bucket refuses, and [[restoreBucketAuth]] unwinds everything at
    *    the job boundary;
    *  - no bucket to scope to (local paths, where the provider key is
    *    inert anyway): the base key is set for the duration of the stage
    *    and the prior value restored after it — the returned thunk.
    * Returns the restore action for the caller's `finally`. */
  private[etl] def applyMethod(spark: SparkSession, method: String,
      uris: Seq[String] = Nil): () => Unit = {
    val settings = Methods.getOrElse(method, throw new IllegalArgumentException(
      s"unknown authentication method '$method'"))
    val conf = spark.sparkContext.hadoopConfiguration
    val buckets = uris.flatMap(bucketOf).distinct
    // conflicting methods for the same bucket within one process refuse
    // LOUDLY: the second binding would silently win for both stages' lazy
    // frames — a bucket-granular version of the ambient-state leak this
    // scoping exists to eliminate. Same-method re-binding is a no-op.
    buckets.foreach { b =>
      Option(bucketBindings.get(b)).foreach { case (m0, _) =>
        require(m0 == method, s"bucket '$b' is already bound to " +
          s"authentication method '$m0' in this process; also binding " +
          s"'$method' would make both stages run under whichever landed " +
          "last — align the methods, or restore the scope between jobs " +
          "(Authenticated.restoreBucketAuth)")
      }
    }
    val applied: Map[String, String] =
      if (buckets.nonEmpty)
        (for (b <- buckets; (k, v) <- settings)
          yield s"fs.s3a.bucket.$b.${k.stripPrefix("fs.s3a.")}" -> v).toMap
      else settings
    val prior = if (buckets.nonEmpty) Map.empty[String, Option[String]]
                else applied.map { case (k, _) => k -> Option(conf.get(k)) }
    // first binding captures the keys' pre-binding values for the
    // job-boundary restore — per-bucket config is scoped, not permanent
    buckets.foreach { b =>
      bucketBindings.computeIfAbsent(b, _ => {
        val keys = settings.keys.toSeq
          .map(k => s"fs.s3a.bucket.$b.${k.stripPrefix("fs.s3a.")}")
        (method, keys.map(k => k -> Option(conf.get(k))).toMap)
      })
      ()
    }
    applied.foreach { case (k, v) => conf.set(k, v) }
    if (logged.add(method + buckets.mkString(",")))
      System.err.println(s"[graft] authentication method $method applied: " +
        applied.map { case (k, v) => s"$k=$v" }.mkString(", "))
    () => prior.foreach {
      case (k, Some(v)) => conf.set(k, v)
      case (k, None) => conf.unset(k)
    }
  }
}

/** CSV extract → view (reference `DelimitedExtract`, scd2-job.ipynb:39-50).
  * `delimiter` accepts the reference's names (`Comma`, `Pipe`, `Tab`) or a
  * literal; `quote "None"` disables quoting. Headerless reads produce Spark's
  * positional `_c0.._cN` names, matching the reference's untyped-first flow. */
final case class DelimitedExtract(
    name: String,
    inputURI: String,
    outputView: String,
    delimiter: String = "Comma",
    header: Boolean = false,
    quote: String = "DoubleQuote",
    environments: Seq[String] = Nil) extends Stage {

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val delim = delimiter match {
      case "Comma" => "," ; case "Pipe" => "|" ; case "Tab" => "\t"
      case "Semicolon" => ";" ; case other => other
    }
    val q = quote match {
      case "None" => "\u0000" ; case "DoubleQuote" => "\"" ; case "SingleQuote" => "'" ; case other => other
    }
    val df = spark.read
      .option("delimiter", delim).option("header", header).option("quote", q)
      .csv(sub(inputURI, env))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Parquet extract → view (the reference implies parquet transitively — its
  * Delta tables are "s3 in parquet format", scd2-job.ipynb:164,382). */
final case class ParquetExtract(
    name: String,
    inputURI: String,
    outputView: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = spark.read.parquet(sub(inputURI, env))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** JSON-lines extract → view (extension surface; free via Spark's reader). */
final case class JsonExtract(
    name: String,
    inputURI: String,
    outputView: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = spark.read.json(sub(inputURI, env))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** ORC extract → view (extension surface; free via Spark's reader). */
final case class OrcExtract(
    name: String,
    inputURI: String,
    outputView: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = spark.read.orc(sub(inputURI, env))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Plain (non-versioned) file sink with optional hive-style partitioning —
  * the reference's native job sink (`native-spark-job-scheduler.yaml:12-13`)
  * generalized. `partitionBy` is the scale lever: downstream reads with a
  * predicate on the partition column prune whole directories (partition
  * pruning shows as `PartitionFilters` in `.explain`). */
final case class FileLoad(
    name: String,
    inputView: String,
    outputURI: String,
    format: String = "parquet", // parquet | csv | json | orc | xml
    saveMode: String = "Overwrite",
    partitionBy: Seq[String] = Nil,
    numPartitions: Option[Int] = None,
    /** Writer options passed through verbatim (csv delimiter, xml rowTag,
      * compression codec, ...). */
    options: Map[String, String] = Map.empty,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df0 = spark.table(inputView)
    val df = numPartitions.map(df0.repartition(_)).getOrElse(df0)
    val w0 = df.write.mode(saveMode.toLowerCase).format(format.toLowerCase)
      .options(options.view.mapValues(sub(_, env)).toMap)
    val w = if (partitionBy.nonEmpty) w0.partitionBy(partitionBy: _*) else w0
    w.save(sub(outputURI, env))
    None
  }
}

/** XML extract → view (extension surface; Spark 4's built-in XML source —
  * `org.apache.spark.sql.execution.datasources.xml`). `rowTag` selects the
  * repeated element. Schema inference costs one extra pass over the files;
  * at scale, pass `schemaDDL` to skip it and pin the exact types. */
final case class XmlExtract(
    name: String,
    inputURI: String,
    outputView: String,
    rowTag: String = "row",
    schemaDDL: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val r = spark.read.option("rowTag", rowTag).format("xml")
    val df = schemaDDL.map(d => r.schema(d)).getOrElse(r).load(sub(inputURI, env))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Apply an external JSON schema doc to a raw string view (reference
  * `TypingTransform`, scd2-job.ipynb:88-96; Arc error semantics → `_errors`
  * column, SURVEY.md §2.7). `schemaURI` points at the doc; `schema` inlines it. */
final case class TypingTransform(
    name: String,
    inputView: String,
    outputView: String,
    schemaURI: Option[String] = None,
    schema: Option[String] = None,
    positional: Boolean = true,
    failMode: String = "permissive", // permissive = keep rows + _errors; failfast = throw
    environments: Seq[String] = Nil) extends Stage {

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val doc = (schema, schemaURI) match {
      case (Some(s), _) => SchemaDoc.fromJson(sub(s, env))
      case (_, Some(u)) => SchemaDoc.fromFile(sub(u, env))
      case _ => throw new IllegalArgumentException(s"stage $name: schema or schemaURI required")
    }
    val typed = doc(spark.table(inputView), positional)
    if (failMode == "failfast") {
      import org.apache.spark.sql.functions._
      val bad = typed.filter(size(col("_errors")) > 0).limit(1).collect()
      if (bad.nonEmpty) throw new IllegalStateException(
        s"stage $name: typing error: ${bad.head.toString}")
    }
    typed.createOrReplaceTempView(outputView)
    Some(typed)
  }
}

/** Parameterized Spark SQL over named views (reference `%sql` stages /
  * SQLTransform, scd2-job.ipynb:141-145). `sqlParams` and `${env}` tokens are
  * substituted into the text BEFORE parsing, exactly like the reference. */
final case class SQLTransform(
    name: String,
    sql: String,
    outputView: String,
    sqlParams: Map[String, String] = Map.empty,
    environments: Seq[String] = Nil) extends Stage {

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val resolved = sub(sql, env ++ sqlParams.view.mapValues(sub(_, env)).toMap)
    // maintenance verbs with a RESULT frame (DESCRIBE HISTORY/DETAIL, SHOW
    // PARTITIONS, VACUUM DRY RUN, …) work here too, registering the frame
    // as the output view like any query
    val df = graft.table.TableSql.runOpt(spark, resolved)
      .getOrElse(spark.sql(resolved))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Data-quality gate (the Arc-family `SQLValidate` stage shape — the
  * reference expresses its UAT checks as plain SQLTransforms a human reads,
  * scd2-job.ipynb:419-483; this makes the check enforcing): run `sql` and
  * FAIL THE JOB unless the result satisfies `expect`:
  *  - `"all_true"` (default): every row's first column is true — the
  *    assertion-per-row style (`SELECT iscurrent = expected AS ok, id ...`);
  *  - `"empty"`: no rows at all — the violations-query style (`SELECT * FROM
  *    t WHERE broken`).
  * A failure message carries up to three offending rows. Runs on the
  * executors only to the extent of one aggregate/limit — the violation scan
  * short-circuits via `limit(3)`, so a passing assert over a 100 TB view
  * costs one filtered scan, not a collect. */
final case class SQLAssert(
    name: String,
    sql: String,
    expect: String = "all_true", // all_true | empty
    sqlParams: Map[String, String] = Map.empty,
    environments: Seq[String] = Nil) extends Stage {
  require(expect == "all_true" || expect == "empty",
    s"SQLAssert '$name': expect must be all_true or empty, got '$expect'")

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{coalesce, col, lit, not}
    val resolved = sub(sql, env ++ sqlParams.view.mapValues(sub(_, env)).toMap)
    val df = spark.sql(resolved)
    val violations = expect match {
      case "empty" => df
      // 3VL: a NULL first column is NOT an assertion pass
      case _ => df.filter(not(coalesce(col(df.columns.head).cast("boolean"), lit(false))))
    }
    val sample = violations.limit(3).collect()
    if (sample.nonEmpty) throw new IllegalStateException(
      s"SQLAssert '$name' failed (${if (expect == "empty") "expected no rows"
        else "rows with first column not true"}); e.g. " +
        sample.map(_.toString).mkString("; "))
    None
  }
}

/** Declarative data-quality EXPECTATIONS — [[SQLAssert]]'s per-row checks
  * with a POLICY other than fail-the-job (the Delta-Live-Tables expectation
  * shape): each named boolean expectation evaluates over every row of
  * `inputView` (a NULL result is a violation — SQLAssert's 3VL rule);
  * passing rows register as `outputView` and the pipeline continues.
  *  - `onViolation = "drop"` (default): failing rows are filtered out;
  *  - `"quarantine"`: failing rows — plus a `_violations` column naming
  *    every expectation they broke — APPEND to the versioned table at
  *    `quarantineURI`. The triage workflow: bad rows are never lost, and
  *    re-processing them later is a table read, not a pipeline re-run;
  *  - `"fail"`: any violation aborts the job with a 3-row sample
  *    (SQLAssert parity, for the checks that must gate).
  * `metricsView` registers per-expectation violation counts plus the row
  * total — the DLT event-log shape a dashboard reads. `failThreshold`
  * composes with drop/quarantine: tolerate per-row violations up to the
  * given FRACTION per expectation, abort the job beyond it — the "some
  * noise is expected, a broken upstream is not" contract (a feed suddenly
  * 40 % malformed should stop the pipeline, not quietly quarantine itself
  * empty).
  * Scale: the output is ONE filtered scan of the input (the expectation
  * columns are codegen'd predicates riding that scan), the quarantine
  * write touches only failing rows, and metrics/threshold share one
  * map-side-combinable aggregate. No collect anywhere — the fail-mode
  * sample is a limit(3). */
final case class ExpectTransform(
    name: String,
    inputView: String,
    outputView: String,
    expectations: Seq[(String, String)],
    onViolation: String = "drop",
    quarantineURI: Option[String] = None,
    metricsView: Option[String] = None,
    failThreshold: Option[Double] = None,
    environments: Seq[String] = Nil) extends Stage {
  require(Seq("drop", "quarantine", "fail").contains(onViolation),
    s"ExpectTransform '$name': onViolation must be drop, quarantine, or " +
      s"fail — got '$onViolation'")
  require(onViolation != "quarantine" || quarantineURI.nonEmpty,
    s"ExpectTransform '$name': quarantine mode needs a quarantineURI")
  require(expectations.nonEmpty,
    s"ExpectTransform '$name': at least one expectation is required")
  require(expectations.forall(_._1.matches("[A-Za-z_][A-Za-z0-9_]*")),
    s"ExpectTransform '$name': expectation names must be identifiers")
  require(failThreshold.forall(t => t >= 0.0 && t < 1.0),
    s"ExpectTransform '$name': failThreshold must be in [0, 1)")

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    import org.apache.spark.sql.functions.{array, array_compact, array_contains,
      coalesce, col, concat_ws, count, expr, lit, not, size, sum, when}
    val df = spark.table(sub(inputView, env))
    val vio = array(expectations.map { case (en, cond) =>
      when(not(coalesce(expr(sub(cond, env)).cast("boolean"), lit(false))), lit(en))
    }: _*)
    val tagged = df.withColumn("_violations", array_compact(vio))
    val kept = tagged.filter(size(col("_violations")) === 0).drop("_violations")
    def countsFrame = {
      val sums = expectations.map { case (en, _) =>
        sum(when(array_contains(col("_violations"), en), 1L).otherwise(0L))
          .as(s"__v_$en") }
      val aggRow = tagged.agg(sums.head, (sums.tail :+ count(lit(1)).as("__n")): _*)
      val stackArgs = expectations
        .map { case (en, _) => s"'$en', `__v_$en`" }.mkString(", ")
      aggRow.select(
        expr(s"stack(${expectations.size}, $stackArgs)")
          .as(Seq("expectation", "n_violations")),
        col("__n").as("n_rows"))
    }
    metricsView.foreach(mv => countsFrame.createOrReplaceTempView(sub(mv, env)))
    // tolerance gate: per-expectation violation RATE above the threshold
    // aborts regardless of the row policy — an upstream break must stop
    // the pipeline, not quietly quarantine itself empty
    failThreshold.foreach { t =>
      val over = countsFrame
        .filter(col("n_rows") > 0 &&
          col("n_violations").cast("double") / col("n_rows") > t)
        .collect()
      if (over.nonEmpty) throw new IllegalStateException(
        s"ExpectTransform '$name': violation rate above $t for " +
          over.map(r => s"${r.getString(0)} (${r.getLong(1)}/${r.getLong(2)})")
            .mkString(", "))
    }
    onViolation match {
      case "fail" =>
        val sample = tagged.filter(size(col("_violations")) > 0).limit(3).collect()
        if (sample.nonEmpty) throw new IllegalStateException(
          s"ExpectTransform '$name' failed; e.g. " +
            sample.map(_.toString).mkString("; "))
      case "quarantine" =>
        val failed = tagged.filter(size(col("_violations")) > 0)
          .withColumn("_violations", concat_ws(",", col("_violations")))
        VersionedTable(sub(quarantineURI.get, env)).append(failed)
        ()
      case _ => ()
    }
    kept.createOrReplaceTempView(sub(outputView, env))
    Some(kept)
  }
}

/** Full-snapshot write of a view to a versioned table (reference
  * `DeltaLakeLoad`, scd2-job.ipynb:163-172; `numPartitions` knob `:168`).
  * `partitionBy` lays the table out hive-partitioned with partition values
  * recorded in the manifest — the layout the reference's S3 lake tables use
  * and the lever behind `VersionedTable.readPartitioned` pruning. */
final case class TableLoad(
    name: String,
    inputView: String,
    outputURI: String,
    numPartitions: Option[Int] = None,
    partitionBy: Seq[String] = Nil,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(outputURI, env)).commit(spark.table(inputView), numPartitions,
      partitionBy = partitionBy)
    None
  }
}

/** Write a manifest checkpoint of a versioned table's head (see
  * [[graft.table.VersionedTable.checkpoint]]): the live file references as
  * splittable parquet plus ratcheted txn marks — the maintenance stage a
  * scheduler runs alongside TableCompact/TableVacuum. */
final case class TableCheckpoint(
    name: String,
    tableURI: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).checkpoint(spark)
    None
  }
}

/** Merge key→value pairs into a versioned table's properties (Delta
  * `ALTER TABLE ... SET TBLPROPERTIES` analogue) — notably
  * `enableChangeDataFeed=true`, which opts the table's rewrites into
  * write-time change capture (see [[graft.table.VersionedTable.cdfEnabled]]).
  * An empty value removes the key. */
final case class TableProperties(
    name: String,
    tableURI: String,
    properties: Map[String, String],
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env))
      .setProperties(properties.view.mapValues(sub(_, env)).toMap)
    None
  }
}

/** Register a table's per-commit change feed as a view (see
  * [[graft.table.VersionedTable.changeFeed]]): rows with `_change_type` and
  * `_commit_version` over `(fromVersion, toVersion]` (toVersion defaults to
  * the head) — the declarative face of CDC consumption, served from
  * write-time capture. */
final case class TableChangeFeed(
    name: String,
    tableURI: String,
    outputView: String,
    fromVersion: Long,
    toVersion: Option[Long] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val t = VersionedTable(sub(tableURI, env))
    val df = t.changeFeed(spark, fromVersion,
      toVersion.getOrElse(t.resolve()))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Versioned read with optional time travel (reference `DeltaLakeExtract` +
  * `relativeVersion`, scd2-job.ipynb:419-426,462-471). */
final case class TableExtract(
    name: String,
    inputURI: String,
    outputView: String,
    relativeVersion: Option[Int] = None,
    versionAsOf: Option[Long] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = VersionedTable(sub(inputURI, env)).read(spark, relativeVersion, versionAsOf)
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** MERGE upsert into a versioned table (reference `DeltaLakeMergeLoad`,
  * scd2-job.ipynb:338-353). Reads the latest version as `target`, the input
  * view as `source`, applies the clause semantics (graft.table.Merge), commits
  * the result as the next version. */
final case class TableMergeLoad(
    name: String,
    inputView: String,
    outputURI: String,
    condition: String,
    whenMatchedUpdate: Option[Merge.MatchedUpdate] = None,
    whenMatchedDelete: Option[Merge.MatchedDelete] = None,
    whenNotMatchedByTargetInsert: Option[Merge.NotMatchedInsert] = None,
    numPartitions: Option[Int] = None,
    /** (targetKey, sourceKeyExpr): enables the copy-on-write file-pruned
      * merge (VersionedTable.mergeCow) — only target files whose key range
      * contains a source key are rewritten. The pair must be the equi-key
      * implied by `condition`. */
    pruneKeys: Option[(String, String)] = None,
    /** Exactly-once under Runner retries (see TableAppend): a re-run that
      * finds its key already in the manifest skips the merge. */
    idempotencyKey: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {

  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val table = VersionedTable(sub(outputURI, env))
    val key = idempotencyKey.map(sub(_, env))
    if (key.exists(k => table.lastTxn(k).isDefined)) return None
    val txn = key.map(_ -> 0L)
    val upd = whenMatchedUpdate.map(u => u.copy(
      condition = u.condition.map(sub(_, env)),
      values = u.values.view.mapValues(sub(_, env)).toMap))
    val del = whenMatchedDelete.map(d => d.copy(condition = d.condition.map(sub(_, env))))
    val ins = whenNotMatchedByTargetInsert.map(i => i.copy(
      condition = i.condition.map(sub(_, env)),
      values = i.values.view.mapValues(sub(_, env)).toMap))
    pruneKeys match {
      case Some((tk, sk)) =>
        table.mergeCow(spark, spark.table(inputView), sub(condition, env),
          tk, sk, upd, del, ins, numPartitions = numPartitions, txn = txn)
        ()
      case None =>
        val merged = Merge.merge(table.read(spark), spark.table(inputView),
          sub(condition, env), upd, del, ins)
        table.commit(merged, numPartitions, txn = txn)
        ()
    }
    None
  }
}

/** Append a view's rows to a versioned table without rewriting existing
  * data (the batch-ingest path at scale; additive schema evolution allowed —
  * see VersionedTable.append).
  *
  * `idempotencyKey` makes the append exactly-once under job retries
  * (Runner re-runs a failed job from the top): the key is stamped into the
  * manifest via the table's txn protocol, and a re-run that finds its key
  * already committed skips the append. Use a key unique per logical batch. */
final case class TableAppend(
    name: String,
    inputView: String,
    outputURI: String,
    numPartitions: Option[Int] = None,
    sortBy: Seq[String] = Nil,
    idempotencyKey: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val t = VersionedTable(sub(outputURI, env))
    val key = idempotencyKey.map(sub(_, env))
    if (!key.exists(k => t.lastTxn(k).isDefined)) {
      t.append(spark.table(inputView), numPartitions, sortBy,
        txn = key.map(_ -> 0L))
      ()
    }
    None
  }
}

/** Copy-on-write UPDATE on a versioned table: SET col = expr where
  * `condition` holds; only files containing a match are rewritten
  * (VersionedTable.update). */
final case class TableUpdate(
    name: String,
    tableURI: String,
    condition: String,
    set: Map[String, String],
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).update(spark, sub(condition, env),
      set.view.mapValues(sub(_, env)).toMap)
    None
  }
}

/** Copy-on-write DELETE from a versioned table: only files containing a
  * matching row are rewritten (VersionedTable.delete). */
final case class TableDelete(
    name: String,
    tableURI: String,
    condition: String,
    mor: Boolean = false,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val t = VersionedTable(sub(tableURI, env))
    // mor = merge-on-read: tombstone matching rows in a deletion vector
    // instead of rewriting their files (VersionedTable.deleteMor)
    if (mor) t.deleteMor(spark, sub(condition, env))
    else t.delete(spark, sub(condition, env))
    None
  }
}

/** OPTIMIZE a versioned table: rewrite the latest snapshot into `numFiles`
  * (optionally range-sorted by `sortBy`) as a new version — the declarative
  * face of VersionedTable.compact. */
final case class TableCompact(
    name: String,
    tableURI: String,
    numFiles: Int = 1,
    sortBy: Seq[String] = Nil,
    zOrderBy: Seq[String] = Nil,
    /** Size-targeted binpacking: overrides numFiles with ceil(snapshot
      * bytes / target) — the knob that keeps file sizes stable as the
      * table grows. */
    targetFileSizeMb: Option[Int] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).compact(spark, numFiles, sortBy, zOrderBy,
      targetFileSizeMb.map(_.toLong * 1024 * 1024))
    None
  }
}

/** Incremental OPTIMIZE ZORDER: cluster only the live files no previous
  * cluster run produced (VersionedTable.clusterIncremental) — the nightly
  * maintenance shape where re-sorting the whole table per run is a
  * petabyte job and the new data is the only thing worth laying out. */
final case class TableCluster(
    name: String,
    tableURI: String,
    zOrderBy: Seq[String],
    targetFileSizeMb: Int = 128,
    /** Explicit output-file count for the new cube (overrides the size
      * target) — test/bench shaping; production keeps the size knob. */
    numFiles: Option[Int] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).clusterIncremental(spark, zOrderBy,
      targetFileSizeMb.toLong * 1024 * 1024, numFiles)
    None
  }
}

/** VACUUM a versioned table: drop data files outside the newest
  * `retainVersions` manifests. */
final case class TableVacuum(
    name: String,
    tableURI: String,
    retainVersions: Int = 2,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).vacuum(retainVersions)
    None
  }
}

/** Scheduled micro-batch ingest as a DAG node: drain everything newly
  * landed under `inputURI` into the versioned table at `outputURI` via the
  * exactly-once streaming funnel ([[graft.streaming.StreamingEtl
  * .appendStream]]: AvailableNow + checkpoint + manifest txn marks), then
  * return. One declared stage is the whole scheduled-ingest job — each
  * scheduler tick picks up exactly the files the previous tick had not
  * committed, a crashed tick replays without duplicating a row, and an
  * idle tick commits nothing. The schema comes from `schemaDDL` when given
  * (landing dirs can be empty on the first tick) or is inferred from the
  * landed files. `checkpointURI` defaults to `<outputURI>_checkpoint`. */
final case class StreamIngest(
    name: String,
    inputURI: String,
    outputURI: String,
    schemaDDL: Option[String] = None,
    checkpointURI: Option[String] = None,
    maxFilesPerTrigger: Option[Int] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val in = sub(inputURI, env)
    val out = sub(outputURI, env)
    val ckpt = checkpointURI.map(sub(_, env)).getOrElse(s"${out}_checkpoint")
    val schema = schemaDDL.map(d =>
        org.apache.spark.sql.types.StructType.fromDDL(sub(d, env)))
      .getOrElse(spark.read.parquet(in).schema)
    val reader = spark.readStream.schema(schema)
    maxFilesPerTrigger.foreach(m => reader.option("maxFilesPerTrigger", m))
    val q = reader.parquet(in)
      .writeStream.format("graft-table")
      .option("path", out).option("txnAppId", ckpt)
      .option("checkpointLocation", ckpt)
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    None
  }
}

/** Scheduled-backup refresh: bring `targetURI` (an existing clone of
  * `tableURI`) to the source's current snapshot, transferring only the
  * files the target lacks ([[graft.table.VersionedTable.cloneSync]]); a
  * missing target is seeded with a first full clone, so ONE declared stage
  * is the whole nightly-backup job. `deep=false` hard-links instead of
  * copying where the store allows. The (transferred, referenced) audit
  * registers as `outputView` when given. */
final case class TableCloneSync(
    name: String,
    tableURI: String,
    targetURI: String,
    deep: Boolean = true,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val src = VersionedTable(sub(tableURI, env))
    val tgt = sub(targetURI, env)
    val (moved, refs) =
      if (VersionedTable(tgt).latestVersion().isEmpty) {
        if (deep) src.cloneDeep(tgt) else src.cloneShallow(tgt)
        val n = VersionedTable(tgt).filesOf(VersionedTable(tgt).resolve()).size
        (n, n)
      } else src.cloneSync(tgt, deep)
    outputView.map { ov =>
      import spark.implicits._
      val df = Seq((moved, refs)).toDF("n_transferred", "n_referenced")
      df.createOrReplaceTempView(sub(ov, env))
      df
    }
  }
}

/** Storage reconciliation ([[graft.table.VersionedTable.fsck]]) as a DAG
  * node: `dryRun=true` only reports; either way the lost-file list (and the
  * repaired version, if any) registers as `outputView` when given — the
  * audit a scheduled integrity check alerts on. */
final case class TableFsck(
    name: String,
    tableURI: String,
    dryRun: Boolean = false,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val (missing, nv) = VersionedTable(sub(tableURI, env)).fsck(dryRun)
    outputView.map { ov =>
      import spark.implicits._
      val df = missing.map(f => (f, nv)).toDF("missing_file", "repaired_version")
      df.createOrReplaceTempView(sub(ov, env))
      df
    }
  }
}

/** Refresh an incrementally maintained materialized aggregate (see
  * [[graft.table.MaterializedAgg]]): fold the base table's appends since
  * the last refresh into the pre-aggregated view — the declarative face of
  * the "maintain a serving view next to the fact table" pattern. `sums`
  * preserves declaration order (it becomes the view's column order). */
final case class MatViewRefresh(
    name: String,
    baseURI: String,
    viewURI: String,
    keys: Seq[String],
    sums: Seq[(String, String)],
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    new graft.table.MaterializedAgg(
      VersionedTable(sub(baseURI, env)), sub(viewURI, env),
      keys.map(sub(_, env)), sums.map { case (n, e) => n -> sub(e, env) })
      .refresh(spark)
    None
  }
}

/** RESTORE a versioned table to an earlier version as a new head (Delta
  * `RESTORE TABLE ... TO VERSION AS OF` parity) — manifest-only, no data
  * copied; see [[graft.table.VersionedTable.restore]]. */
final case class TableRestore(
    name: String,
    tableURI: String,
    versionAsOf: Long,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    VersionedTable(sub(tableURI, env)).restore(versionAsOf)
    None
  }
}

/** Execute DDL/side-effecting SQL against the session catalog (the reference's
  * `JDBCExecute` runs DDL on an external endpoint, scd2-job.ipynb:373-384; in
  * a self-contained engine the catalog IS the session catalog). */
final case class SQLExecute(
    name: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty,
    /** Load the SQL text from a file instead of `sql` (the reference's
      * JDBCExecute ships its DDL as a .sql object, scd2-job.ipynb:381). */
    inputURI: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val text = inputURI match {
      case Some(uri) => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sub(uri, env))), "UTF-8")
      case None => sql
    }
    val resolved = sub(text, env ++ sqlParams.view.mapValues(sub(_, env)).toMap)
    // maintenance verbs first (OPTIMIZE, VACUUM, COPY INTO, DESCRIBE
    // HISTORY, RESTORE, CONVERT, SHALLOW CLONE, GENERATE, SET NOT NULL) —
    // the reference runs its table maintenance through SQL stages
    // (scd2-job.ipynb:373-384), so they need a spelling HERE, not only the
    // Scala TableSql.run entry point; anything else is Spark's
    if (graft.table.TableSql.runOpt(spark, resolved).isEmpty)
      spark.sql(resolved)
    None
  }
}

/** Print a view's schema (reference `%printschema`, scd2-job.ipynb:66-67). */
final case class PrintSchema(
    name: String,
    inputView: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    // scalastyle:off println
    println(spark.table(inputView).schema.treeString)
    // scalastyle:on println
    None
  }
}

/** ALTER TABLE ADD/DROP CONSTRAINT as a declarative stage: registers (or
  * removes) a named CHECK expression on a versioned table. Adding proves the
  * existing snapshot first and every later write to the table gates its own
  * batch against the registered constraints (see
  * [[graft.table.VersionedTable.addConstraint]]). */
final case class TableConstraint(
    name: String,
    tableURI: String,
    action: String,
    constraintName: String,
    expression: String = "",
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val t = VersionedTable(sub(tableURI, env))
    action match {
      case "add" => t.addConstraint(spark, constraintName, sub(expression, env))
      case "drop" => t.dropConstraint(constraintName)
      case other => throw new IllegalArgumentException(
        s"stage $name: TableConstraint action must be add|drop, got '$other'")
    }
    None
  }
}

/** ANALYZE-style profiling stage: one-pass long-format column stats of
  * `inputView` registered as `outputView` (see [[Profiler]]); the systematic
  * version of the reference's `uat`-gated spot checks + `%printschema`
  * (scd2-job.ipynb:443-444, 66-67). Pairs with SQLAssert to gate a job on
  * the profile (e.g. assert n_nonnull = n_rows on a key column). */
final case class ProfileTransform(
    name: String,
    inputView: String,
    outputView: String,
    columns: Seq[String] = Nil,
    exactNdv: Boolean = true,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = Profiler.profile(spark.table(sub(inputView, env)), columns, exactNdv)
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Execute side-effecting SQL on an external JDBC endpoint (reference
  * `JDBCExecute`, scd2-job.ipynb:373-384: Athena
  * `CREATE EXTERNAL TABLE ... LOCATION ${datalake_loc}` from a `.sql`
  * object with `sqlParams` substitution). Multi-statement scripts run in
  * order on one connection. */
final case class JDBCExecute(
    name: String,
    jdbcURL: String,
    sql: String,
    sqlParams: Map[String, String] = Map.empty,
    inputURI: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val text = inputURI match {
      case Some(uri) => new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get(sub(uri, env))), "UTF-8")
      case None => sql
    }
    val resolved = sub(text, env ++ sqlParams.view.mapValues(sub(_, env)).toMap)
    Jdbc.withConnection(sub(jdbcURL, env)) { conn =>
      val st = conn.createStatement()
      try Jdbc.splitStatements(resolved).foreach(st.execute) finally st.close()
    }
    None
  }
}

/** Parallel JDBC table read → view. `tableName` may be a table or a
  * parenthesized subquery alias. With `partitionColumn`, Spark plans
  * `numPartitions` range-disjoint queries (bounds auto-probed when
  * absent); with `predicates`, one query per predicate — the two standard
  * shapes for draining an RDBMS without serializing through the driver. */
final case class JDBCExtract(
    name: String,
    jdbcURL: String,
    tableName: String,
    outputView: String,
    partitionColumn: Option[String] = None,
    numPartitions: Option[Int] = None,
    lowerBound: Option[Long] = None,
    upperBound: Option[Long] = None,
    predicates: Seq[String] = Nil,
    fetchsize: Int = 1000,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val url = sub(jdbcURL, env)
    val table = sub(tableName, env)
    val props = new java.util.Properties()
    props.setProperty("fetchsize", fetchsize.toString)
    val df =
      if (predicates.nonEmpty)
        spark.read.jdbc(url, table, predicates.map(sub(_, env)).toArray, props)
      else partitionColumn match {
        case Some(colName) =>
          val (lo, hi) = (lowerBound, upperBound) match {
            case (Some(l), Some(h)) => (l, h)
            case _ => Jdbc.probeBounds(url, table, colName)
          }
          spark.read.jdbc(url, table, colName, lo, hi,
            numPartitions.getOrElse(spark.sparkContext.defaultParallelism), props)
        case None => spark.read.jdbc(url, table, props)
      }
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Write a view to an external JDBC table in `batchsize`d inserts.
  * `saveMode` follows the reference's Load vocabulary
  * (Append/Overwrite/ErrorIfExists/Ignore); `truncate` keeps Overwrite
  * from dropping the table (preserves grants/indexes — Spark's
  * JDBC-writer semantics). */
final case class JDBCLoad(
    name: String,
    inputView: String,
    jdbcURL: String,
    tableName: String,
    saveMode: String = "Append",
    numPartitions: Option[Int] = None,
    batchsize: Int = 1000,
    truncate: Boolean = false,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val w = spark.table(inputView).write
      .mode(SaveMode.valueOf(saveMode))
      .option("batchsize", batchsize.toString)
      .option("truncate", truncate.toString)
    // the JDBC writer coalesces to `numPartitions` itself — the documented
    // way to cap concurrent connections against the endpoint
    numPartitions.foreach(n => w.option("numPartitions", n.toString))
    w.jdbc(sub(jdbcURL, env), sub(tableName, env), new java.util.Properties())
    None
  }
}

/** Bootstrap an incremental-dedup signature store from a corpus view
  * ([[graft.dedup.SignatureStore.build]]): the one full-corpus signature
  * pass — everything after is per-batch. */
final case class DedupIndexBuild(
    name: String,
    inputView: String,
    storeURI: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    graft.dedup.SignatureStore.build(spark, sub(storeURI, env),
      spark.table(inputView))
    None
  }
}

/** Admit a batch view against a signature store
  * ([[graft.dedup.SignatureStore.admit]]): per-document decisions
  * (doc_id, verdict, dup_of) register as `outputView`; admitted documents'
  * signatures append to the store in the same call — the scheduled-batch
  * shape of the reference's CDC merge jobs, applied to dedup. */
final case class DedupIndexAdmit(
    name: String,
    inputView: String,
    storeURI: String,
    outputView: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = graft.dedup.SignatureStore.admit(spark, sub(storeURI, env),
      spark.table(inputView))
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Bootstrap an incremental embedding-dedup vector store from a corpus view
  * ([[graft.dedup.VectorStore.build]]): centroids train once; the corpus
  * stores partitioned by centroid. */
final case class VectorIndexBuild(
    name: String,
    inputView: String,
    storeURI: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    graft.dedup.VectorStore.build(spark, sub(storeURI, env),
      spark.table(inputView))
    None
  }
}

/** Admit a batch view of embeddings against a vector store
  * ([[graft.dedup.VectorStore.admit]]): per-vector decisions
  * (vec_id, verdict, dup_of) register as `outputView`; admitted vectors
  * append to their centroid partitions. */
final case class VectorIndexAdmit(
    name: String,
    inputView: String,
    storeURI: String,
    outputView: String,
    threshold: Double = graft.dedup.VectorStore.DefaultThreshold,
    probes: Int = graft.dedup.VectorStore.DefaultProbes,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val df = graft.dedup.VectorStore.admit(spark, sub(storeURI, env),
      spark.table(inputView), threshold, probes)
    df.createOrReplaceTempView(outputView)
    Some(df)
  }
}

/** Shared shape of the erasure stages: run the store's evict verb over the
  * input view's id column and (optionally) register a one-row audit frame
  * `(n_evicted BIGINT)` — the number a right-to-be-forgotten DAG records
  * in its compliance log. */
private[etl] object EvictStage {
  def emit(spark: SparkSession, n: Long, outputView: Option[String]): Option[DataFrame] =
    outputView.map { v =>
      import spark.implicits._
      val df = Seq(n).toDF("n_evicted")
      df.createOrReplaceTempView(v)
      df
    }
}

/** Erase documents from a signature store by the input view's `doc_id`
  * column ([[graft.dedup.SignatureStore.evict]]) — the declarative face of
  * right-to-be-forgotten for the dedup index. */
final case class DedupIndexEvict(
    name: String,
    inputView: String,
    storeURI: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val n = graft.dedup.SignatureStore.evict(spark, sub(storeURI, env),
      spark.table(inputView))
    EvictStage.emit(spark, n, outputView)
  }
}

/** Erase vectors from a vector store by the input view's `vec_id` column
  * ([[graft.dedup.VectorStore.evict]]). */
final case class VectorIndexEvict(
    name: String,
    inputView: String,
    storeURI: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val n = graft.dedup.VectorStore.evict(spark, sub(storeURI, env),
      spark.table(inputView))
    EvictStage.emit(spark, n, outputView)
  }
}

/** REINDEX the vector store when (or unconditionally if no bound is set)
  * its tracked per-centroid load skew crosses `ifSkewAbove`
  * ([[graft.dedup.VectorStore.rebalance]]) — the maintenance stage a
  * scheduled DAG runs next to TableCompact/TableVacuum. */
final case class VectorIndexRebalance(
    name: String,
    storeURI: String,
    ifSkewAbove: Option[Double] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    graft.dedup.VectorStore.rebalance(spark, sub(storeURI, env), ifSkewAbove)
    None
  }
}

/** Sync the vector store to its base TABLE's head via the change feed
  * ([[graft.dedup.VectorStore.syncFromTable]]: mirror-mode evict+admit of
  * the changed ids, resumable cursor) — [[TextIndexSync]]'s ANN twin;
  * the optional audit view reports (n_admitted, n_evicted). */
final case class VectorIndexSync(
    name: String,
    tableURI: String,
    storeURI: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val (a, e) = graft.dedup.VectorStore.syncFromTable(spark,
      sub(storeURI, env), VersionedTable(sub(tableURI, env)))
    outputView.map { v =>
      import spark.implicits._
      val df = Seq((a, e)).toDF("n_admitted", "n_evicted")
      df.createOrReplaceTempView(v)
      df
    }
  }
}

/** Build the BM25 inverted-index store from the input view's
  * (doc_id, text) ([[graft.dedup.TextIndexStore.build]]); `fingerprint`
  * is the corpus stamp consumers validate against. */
final case class TextIndexBuild(
    name: String,
    inputView: String,
    storeURI: String,
    fingerprint: String,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    graft.dedup.TextIndexStore.build(spark, sub(storeURI, env),
      spark.table(inputView), sub(fingerprint, env))
    None
  }
}

/** Admit a document batch into the BM25 store
  * ([[graft.dedup.TextIndexStore.admit]]: bucket appends + df merge +
  * exact stat advance; already-indexed doc_ids drop). Optionally registers
  * a one-row `(n_admitted BIGINT)` audit view. */
final case class TextIndexAdmit(
    name: String,
    inputView: String,
    storeURI: String,
    fingerprint: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val n = graft.dedup.TextIndexStore.admit(spark, sub(storeURI, env),
      spark.table(inputView), sub(fingerprint, env))
    outputView.map { v =>
      import spark.implicits._
      val df = Seq(n).toDF("n_admitted")
      df.createOrReplaceTempView(v)
      df
    }
  }
}

/** Erase documents from the BM25 store by the input view's `doc_id`
  * column ([[graft.dedup.TextIndexStore.evict]]: bucket-pruned postings
  * delete, exact df decrements, stats shrink). */
final case class TextIndexEvict(
    name: String,
    inputView: String,
    storeURI: String,
    fingerprint: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val n = graft.dedup.TextIndexStore.evict(spark, sub(storeURI, env),
      spark.table(inputView), sub(fingerprint, env))
    EvictStage.emit(spark, n, outputView)
  }
}

/** Sync the BM25 store to its base TABLE's head via the change feed
  * ([[graft.dedup.TextIndexStore.syncFromTable]]: evict changed ids' stale
  * postings, admit their current rows, advance the resumable cursor) —
  * the one-stage maintenance DAG node that keeps a derived index fresh;
  * the optional audit view reports (n_admitted, n_evicted). */
final case class TextIndexSync(
    name: String,
    tableURI: String,
    storeURI: String,
    fingerprint: String,
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val (a, e) = graft.dedup.TextIndexStore.syncFromTable(spark,
      sub(storeURI, env), VersionedTable(sub(tableURI, env)), sub(fingerprint, env))
    outputView.map { v =>
      import spark.implicits._
      val df = Seq((a, e)).toDF("n_admitted", "n_evicted")
      df.createOrReplaceTempView(v)
      df
    }
  }
}

/** BATCHED right-to-be-forgotten — the operational RTBF queue (round-14
  * verdict #7, PLANS.md's structural answer for id-keyed erasure on the
  * word-keyed postings layout): forget requests ACCUMULATE in a versioned
  * request table (appends, one row per id), and each stage run drains
  * everything past the table's own `forgetCursor` property in ONE evict
  * call per configured store — so N requests pay one postings pin scan,
  * one bucket-pruned postings merge, one lexicon decrement (vs N of each
  * when erased one-by-one; [[graft.dedup.TextIndexStore.evict]]'s own
  * doc says batching amortizes the pin scan — this stage is where the
  * batching operationally happens).
  *
  * Exactly-once by CONVERGENCE, like the sync verbs: the cursor advances
  * in a property commit AFTER the evicts, so a crash between them replays
  * the same ids — and evicting an already-evicted id erases zero rows and
  * commits nothing. Batched ≡ serial bit-exactly (ForgetBatchSpec): evict
  * is additive over disjoint id sets, and replayed ids are no-ops, so ONE
  * call with the union leaves every store byte-identical to N serial
  * calls. The id column is `idColumn` in the request table; it feeds the
  * text/signature stores as `doc_id` and the vector store as `vec_id`.
  * Compliance note: erasure completes at evict + vacuum past the evict
  * commits, exactly as for single-id forget (q127). */
final case class ForgetBatch(
    name: String,
    requestsURI: String,
    idColumn: String,
    textStoreURI: Option[String] = None,
    vectorStoreURI: Option[String] = None,
    dedupStoreURI: Option[String] = None,
    fingerprint: String = "forget",
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val reqT = VersionedTable(sub(requestsURI, env))
    val head = reqT.resolve()
    val cursor = reqT.properties.get("forgetCursor").map(_.toLong).getOrElse(-1L)
    val (nText, nVec, nSig) =
      if (head <= cursor) (0L, 0L, 0L)
      else {
        val pending =
          if (cursor < 0) reqT.read(spark)
          else reqT.changeFeed(spark, cursor, head)
            .filter(org.apache.spark.sql.functions.col("_change_type") === "insert")
        // pin the drained id set once: every store's evict consumes the
        // same frame, and the feed is never re-read per store
        val ids = pending.select(sub(idColumn, env)).distinct().localCheckpoint(true)
        val t = textStoreURI.map(u => graft.dedup.TextIndexStore.evict(spark,
          sub(u, env), ids.withColumnRenamed(sub(idColumn, env), "doc_id"),
          sub(fingerprint, env))).getOrElse(0L)
        val v = vectorStoreURI.map(u => graft.dedup.VectorStore.evict(spark,
          sub(u, env), ids.withColumnRenamed(sub(idColumn, env), "vec_id")))
          .getOrElse(0L)
        val s = dedupStoreURI.map(u => graft.dedup.SignatureStore.evict(spark,
          sub(u, env), ids.withColumnRenamed(sub(idColumn, env), "doc_id")))
          .getOrElse(0L)
        reqT.setProperties(Map("forgetCursor" -> head.toString))
        (t, v, s)
      }
    outputView.map { v =>
      import spark.implicits._
      val df = Seq((nText, nVec, nSig)).toDF(
        "n_text_evicted", "n_vector_evicted", "n_signature_evicted")
      df.createOrReplaceTempView(v)
      df
    }
  }
}

/** One scheduled DRAIN of the continuous index-follows-table sync — the
  * declarative face of [[graft.streaming.StreamingEtl.textIndexSyncStream]]
  * / `vectorSyncStream`: each job run starts the CDF-triggered stream with
  * AvailableNow, drains every base-table commit the checkpoint has not
  * seen (each non-empty batch one cursor-guarded syncFromTable), and
  * stops — the scheduler-tick shape, like [[StreamIngest]]. Differs from
  * [[TextIndexSync]]/[[VectorIndexSync]] exactly as a stream differs from
  * a batch verb: restarts resume from the CHECKPOINT (no re-listing of the
  * feed), a crashed tick replays convergently, and the same checkpoint can
  * later back an always-on deployment of the identical stream. `kind` is
  * `text` (requires `fingerprint`) or `vector`. */
final case class StreamIndexSync(
    name: String,
    tableURI: String,
    storeURI: String,
    kind: String,
    checkpointURI: String,
    fingerprint: String = "",
    outputView: Option[String] = None,
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    val (table, store, ckpt) =
      (sub(tableURI, env), sub(storeURI, env), sub(checkpointURI, env))
    val q = kind match {
      case "text" =>
        require(sub(fingerprint, env).nonEmpty,
          s"stage $name: kind 'text' requires a fingerprint (the corpus " +
            "fingerprint the store records) — omitting it would silently " +
            "stamp an empty pass name")
        graft.streaming.StreamingEtl.textIndexSyncStream(
          spark, table, store, sub(fingerprint, env), ckpt)
      case "vector" => graft.streaming.StreamingEtl.vectorSyncStream(
        spark, table, store, ckpt)
      case other => throw new IllegalArgumentException(
        s"stage $name: kind must be 'text' or 'vector', got '$other'")
    }
    q.awaitTermination()
    outputView.map { v =>
      import spark.implicits._
      val anchor = if (kind == "text") s"$store/postings" else s"$store/cents"
      val df = Seq(VersionedTable(anchor).properties
        .get("syncedVersion").map(_.toLong).getOrElse(-1L))
        .toDF("synced_version")
      df.createOrReplaceTempView(v)
      df
    }
  }
}

/** One scheduled DRAIN of the continuous RTBF queue — the declarative face
  * of [[graft.streaming.StreamingEtl.forgetDrainStream]]: requests appended
  * to the versioned request table since the checkpoint's last tick fire
  * batches, each running the cursor-guarded batched erasure
  * ([[ForgetBatch]]'s one-evict-per-store drain). */
final case class StreamForgetDrain(
    name: String,
    requestsURI: String,
    idColumn: String,
    checkpointURI: String,
    textStoreURI: Option[String] = None,
    vectorStoreURI: Option[String] = None,
    dedupStoreURI: Option[String] = None,
    fingerprint: String = "forget",
    environments: Seq[String] = Nil) extends Stage {
  def execute(spark: SparkSession, env: Map[String, String]): Option[DataFrame] = {
    graft.streaming.StreamingEtl.forgetDrainStream(spark,
      sub(requestsURI, env), sub(idColumn, env),
      textStoreURI.map(sub(_, env)), vectorStoreURI.map(sub(_, env)),
      dedupStoreURI.map(sub(_, env)), sub(fingerprint, env),
      sub(checkpointURI, env)).awaitTermination()
    None
  }
}
