package graft.etl

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Entry-point-A parity: the reference's ACTUAL notebook file
  * (`/root/reference/example/notebook/scd2-job.ipynb`) must parse into the
  * engine's stage ADT with every magic and HOCON quirk intact. */
class NotebookJobSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val refNotebook = "/root/reference/example/notebook/scd2-job.ipynb"

  test("the reference scd2-job.ipynb parses: conf, env, and all 16 stages") {
    val (job, env) = NotebookJob.fromFile(refNotebook)

    // %conf numRows=12 showLog=true (scd2-job.ipynb:20-22)
    assert(job.conf === JobConf(numRows = 12, showLog = true))
    // %env declares the shared job timestamp (scd2-job.ipynb:131-132)
    assert(env === Map("ETL_CONF_CURRENT_TIMESTAMP" -> "current_timestamp()"))

    def unwrap(s: Stage): Stage = s match {
      case Authenticated(inner, _, _) => inner
      case other => other
    }
    val kinds = job.stages.map(s => unwrap(s).getClass.getSimpleName)
    // NOTE the CDC TypingTransform is the tutorial's fill-in-the-blank
    // placeholder cell in the reference file — skipped by design
    assert(kinds === Seq(
      "DelimitedExtract",   // initial_contacts.csv
      "PrintSchema",        // initial_raw
      "TypingTransform",    // schemaURI contact_meta_0.json
      "PrintSchema",        // initial_typed
      "SQLTransform",       // add calc field for SCD
      "TableLoad",          // DeltaLakeLoad v0
      "DelimitedExtract",   // update_contacts.csv (CDC)
      "SQLTransform",       // add calc field for CDC
      "SQLTransform",       // staged_update dual-row
      "TableMergeLoad",     // DeltaLakeMergeLoad
      "JDBCExecute",        // Athena DDL from .sql file against jdbcURL
      "TableExtract",       // uat validation read
      "SQLTransform",       // uat validate_type2
      "TableExtract",       // uat time travel
      "SQLTransform"))      // uat tt_validation

    // the notebook's authentication blocks parse INTO the stages (never
    // silently dropped): AmazonIAM on the S3 extracts, the typing
    // transform's schema read, and the Delta load (scd2-job.ipynb:47-49,
    // 94-96, 170-172, 215-217)
    val authed = job.stages.collect { case Authenticated(inner, m, _) =>
      inner.getClass.getSimpleName -> m }
    // the per-stage scoping (Authenticated.applyMethod) binds the method to
    // the stage's OWN bucket — the notebook's URIs name one
    val scopedUris = job.stages.collect {
      case Authenticated(_, _, uris) => uris }.flatten
    assert(scopedUris.nonEmpty && scopedUris.forall(_.startsWith("s3a://")))
    assert(authed.map(_._2).toSet === Set("AmazonIAM"))
    assert(authed.map(_._1).sorted === Seq(
      "DelimitedExtract", "DelimitedExtract", "TableLoad", "TypingTransform"))

    // HOCON string splices normalized: ${VAR} survives inside one string
    val extract = unwrap(job.stages.head).asInstanceOf[DelimitedExtract]
    assert(extract.inputURI ===
      "s3a://${ETL_CONF_DATALAKE_LOC}/app_code/data/initial_contacts.csv")
    assert(!extract.header && extract.delimiter === "Comma" && extract.quote === "None")

    // %sql header attrs: outputView, environments, sqlParams with ${} value
    val scd = job.stages(4).asInstanceOf[SQLTransform]
    assert(scd.outputView === "initial_load")
    assert(scd.environments === Seq("dev", "test"))
    assert(scd.sqlParams === Map(
      "table_name" -> "initial_typed",
      "ETL_CONF_CURRENT_TIMESTAMP" -> "${ETL_CONF_CURRENT_TIMESTAMP}"))
    assert(scd.sql.contains("md5(concat(name,email,state)) AS checksum"))

    // merge clauses parsed from the HOCON cell with its missing comma
    val merge = job.stages(9).asInstanceOf[TableMergeLoad]
    assert(merge.condition === "source.mergeKey = target.id")
    // the bare HOCON substitution value and the // comment line both live in
    // this cell — values arrive as raw text for EnvResolver to splice
    assert(merge.whenMatchedUpdate.exists(_.values === Map(
      "valid_to" -> "${ETL_CONF_CURRENT_TIMESTAMP}", "iscurrent" -> "false")))
    assert(merge.whenNotMatchedByTargetInsert.isDefined)

    // time travel option reaches the stage
    val tt = job.stages(13).asInstanceOf[TableExtract]
    assert(tt.relativeVersion === Some(-1))

    // env gating: uat-parked stages drop out of a production run
    val prod = job.stages.filter(s =>
      s.environments.isEmpty || s.environments.contains("production"))
    assert(prod.count(_.isInstanceOf[TableExtract]) === 0)
    val dev = job.stages.filter(s =>
      s.environments.isEmpty || s.environments.contains("dev"))
    assert(dev.size === 11) // 15 minus the four uat-only validation stages
  }

  test("parser edge cases: magic-line args, string sources, backticked SQL") {
    val nb =
      """{"cells": [
        | {"cell_type": "code", "source": "%conf numRows=5"},
        | {"cell_type": "code", "source": "%printschema some_view"},
        | {"cell_type": "code", "source": ["{\"type\": \"SQLTransform\",",
        |   "\"name\": \"bt\", \"outputView\": \"v\",",
        |   "\"sql\": \"SELECT `order key` FROM t\"}"]}
        |]}""".stripMargin
    val (job, _) = NotebookJob.fromIpynb(nb)
    // one-line magics keep their arguments; string 'source' cells parse
    assert(job.conf.numRows === 5)
    // quoted magic-line values may contain spaces (SQL fragments)
    val (_, env) = NotebookJob.fromIpynb(
      """{"cells": [{"cell_type": "code",
        | "source": "%env G=\"a b c\" H=plain\nBODY_VAL=x = y AND z"}]}""".stripMargin)
    assert(env === Map("G" -> "a b c", "H" -> "plain", "BODY_VAL" -> "x = y AND z"))
    assert(job.stages.collect { case p: PrintSchema => p.inputView } === Seq("some_view"))
    // a backtick inside real SQL is NOT the tutorial placeholder
    assert(job.stages.collect { case s: SQLTransform => s.sql }
      === Seq("SELECT `order key` FROM t"))
    // the actual placeholder shape IS still skipped
    val ph = """{"cells": [{"cell_type": "code",
               | "source": "{\n  `Fill in this block`\n  ?????????\n}"}]}""".stripMargin
    assert(NotebookJob.fromIpynb(ph)._1.stages.isEmpty)
  }

  test("a %sql cell without outputView becomes a side-effecting SQLExecute " +
      "(the maintenance-verb cell shape)") {
    val nb =
      """{"cells": [
        | {"cell_type": "code", "source": "%sql name=\"opt\"\nOPTIMIZE '/tmp/t'"},
        | {"cell_type": "code", "source": "%sql outputView=\"v\"\nSELECT 1"}
        |]}""".stripMargin
    val (job, _) = NotebookJob.fromIpynb(nb)
    assert(job.stages.map(_.getClass.getSimpleName) ===
      Seq("SQLExecute", "SQLTransform"))
    assert(job.stages.collect { case s: SQLExecute => s.sql }
      === Seq("OPTIMIZE '/tmp/t'"))
  }

  test("a flagged stage cell is only skipped when it is the real placeholder") {
    // a backtick-flagged cell that still parses as strict JSON (trailing
    // prose after the config) is a REAL stage — it must be kept, not vanish
    val kept = """{"cells": [{"cell_type": "code",
                 | "source": "{ \"type\": \"ParquetExtract\", \"name\": \"r\", \"inputURI\": \"/x\", \"outputView\": \"v\" }\n`note: backticked trailing prose`"}]}""".stripMargin
    val (job, _) = NotebookJob.fromIpynb(kept)
    assert(job.stages.collect { case p: ParquetExtract => p.outputView } === Seq("v"))
    // a backtick-flagged cell that is NOT parseable and NOT the ??? filler
    // raises naming the cell instead of silently dropping the stage
    val bad = """{"cells": [{"cell_type": "code",
                | "source": "{\n  \"type\": \"SQLTransform\", \"outputView\": \"v\", \"sql\":\n`SELECT 1`\n}"}]}""".stripMargin
    val e = intercept[IllegalArgumentException](NotebookJob.fromIpynb(bad))
    assert(e.getMessage.contains("not valid JSON"))
  }

  test("a notebook job runs end-to-end through the Runner") {
    val dir = tmpDir("nb-")
    Seq((1L, "a"), (2L, "b"), (3L, "a")).toDF("id", "grp")
      .write.mode("overwrite").parquet(s"$dir/input")
    val nb =
      s"""{"cells": [
         | {"cell_type": "markdown", "source": ["# docs"]},
         | {"cell_type": "code", "source": ["%conf \\n", "numRows=5\\n", "showLog=false"]},
         | {"cell_type": "code", "source": ["%env\\n", "NB_SUFFIX=_nb"]},
         | {"cell_type": "code", "source": ["{\\n",
         |   " \\"type\\": \\"ParquetExtract\\",\\n",
         |   " \\"name\\": \\"read\\",\\n",
         |   " \\"inputURI\\": \\"$${NB_LOC}/input\\",\\n",
         |   " \\"outputView\\": \\"nb_raw\\"\\n", "}"]},
         | {"cell_type": "code", "source": [
         |   "%sql outputView=\\"nb_agg\\" name=\\"agg\\" sqlParams=suffix=$${NB_SUFFIX}\\n",
         |   "\\n",
         |   "SELECT concat(grp, '$${suffix}') AS grp, count(*) AS n FROM nb_raw GROUP BY grp"]},
         | {"cell_type": "code", "source": ["%printschema \\n", "nb_agg"]}
         |]}""".stripMargin
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/job.ipynb"), nb)
    val workflow =
      s"""{"parameters": {"NB_LOC": "$dir"},
         | "jobs": [{"name": "nb-job", "configUri": "$dir/job.ipynb"}]}""".stripMargin
    Runner.runWorkflow(spark, workflow)
    val out = spark.table("nb_agg").as[(String, Long)].collect().toMap
    assert(out === Map("a_nb" -> 2L, "b_nb" -> 1L))
  }

  test("per-bucket auth bindings are job-scoped: conflicting methods refuse, " +
      "restoreBucketAuth returns the config to its pre-binding state") {
    val conf = spark.sparkContext.hadoopConfiguration
    val key = "fs.s3a.bucket.nbauth-test.aws.credentials.provider"
    conf.set(key, "prior.Provider") // the pre-job value the restore must recover
    try {
      val r1 = Authenticated.applyMethod(spark, "AmazonIAM",
        Seq("s3a://nbauth-test/app/data.csv"))
      assert(conf.get(key).contains("InstanceProfileCredentialsProvider"))
      // stage-scope restore is a no-op for bucket keys (lazy frames of this
      // stage still scan under the declared credentials in later stages)
      r1()
      assert(conf.get(key).contains("InstanceProfileCredentialsProvider"))
      // same method re-binds fine; a DIFFERENT method for the same bucket
      // refuses loudly instead of silently winning for both stages
      Authenticated.applyMethod(spark, "AmazonIAM", Seq("s3a://nbauth-test/other"))()
      val e = intercept[IllegalArgumentException] {
        Authenticated.applyMethod(spark, "AmazonAnonymous",
          Seq("s3a://nbauth-test/pub"))
      }
      assert(e.getMessage.contains("already bound"))
      // the job boundary unwinds the binding to the PRE-JOB value…
      Authenticated.restoreBucketAuth(spark)
      assert(conf.get(key) === "prior.Provider")
      // …after which a different method may bind cleanly
      Authenticated.applyMethod(spark, "AmazonAnonymous", Seq("s3a://nbauth-test/pub"))()
      assert(conf.get(key).contains("AnonymousAWSCredentialsProvider"))
    } finally {
      Authenticated.restoreBucketAuth(spark)
      conf.unset(key)
    }
  }
}
