package graft.etl

import graft.SparkSpec
import graft.table.VersionedTable
import org.scalatest.funsuite.AnyFunSuite

/** JSON job parsing + end-to-end stage execution with env gating —
  * entry-point A of SURVEY.md §3, through the public JobSpec surface. */
class JobSpecSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("parses every stage type from JSON (reference config shape)") {
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "DelimitedExtract", "name": "e", "environments": ["production"],
        |   "inputURI": "${LOC}/in.csv", "outputView": "raw",
        |   "delimiter": "Comma", "header": false, "quote": "None"},
        |  {"type": "TypingTransform", "name": "t", "inputView": "raw",
        |   "outputView": "typed",
        |   "schema": [{"name": "id", "type": "long"}, {"name": "v", "type": "string"}]},
        |  {"type": "SQLTransform", "name": "s", "outputView": "out",
        |   "sql": "SELECT * FROM ${tv}", "sqlParams": {"tv": "typed"}},
        |  {"type": "DeltaLakeLoad", "name": "l", "inputView": "out",
        |   "outputURI": "${LOC}/table", "numPartitions": 1},
        |  {"type": "DeltaLakeMergeLoad", "name": "m", "inputView": "out",
        |   "outputURI": "${LOC}/table", "condition": "source.id = target.id",
        |   "whenMatchedUpdate": {"condition": "target.v <> source.v",
        |                         "values": {"v": "source.v"}},
        |   "whenNotMatchedByTargetInsert": {}},
        |  {"type": "DeltaLakeExtract", "name": "x", "inputURI": "${LOC}/table",
        |   "outputView": "back", "options": {"relativeVersion": -1}},
        |  {"type": "SQLExecute", "name": "ddl", "sql": "SELECT 1"},
        |  {"type": "PrintSchema", "name": "p", "inputView": "back",
        |   "environments": ["uat"]}
        |]}""".stripMargin)
    assert(spec.stages.map(_.getClass.getSimpleName) === Seq(
      "DelimitedExtract", "TypingTransform", "SQLTransform", "TableLoad",
      "TableMergeLoad", "TableExtract", "SQLExecute", "PrintSchema"))
    val merge = spec.stages(4).asInstanceOf[TableMergeLoad]
    assert(merge.whenMatchedUpdate.get.values === Map("v" -> "source.v"))
    assert(merge.whenNotMatchedByTargetInsert.get.values === Map.empty)
    assert(spec.stages(5).asInstanceOf[TableExtract].relativeVersion === Some(-1))
  }

  test("ExpectTransform: drop mode filters, fail mode aborts, JSON parses") {
    Seq((1L, Option(5L)), (2L, Option(-1L)), (3L, Option.empty[Long]))
      .toDF("id", "v").createOrReplaceTempView("et_in")
    // drop: NULL evaluates as a violation (3VL), metrics count it
    JobSpec(Seq(ExpectTransform("dq", "et_in", "et_out",
      Seq("positive" -> "v > 0"), metricsView = Some("et_m"))))
      .run(spark, Map.empty)
    assert(spark.table("et_out").select("id").as[Long].collect().sorted === Seq(1L))
    assert(spark.table("et_m").collect().map(r =>
      (r.getString(0), r.getLong(1), r.getLong(2))) === Array(("positive", 2L, 3L)))
    // fail: any violation aborts with a sample
    val e = intercept[IllegalStateException] {
      JobSpec(Seq(ExpectTransform("dq2", "et_in", "et_out2",
        Seq("positive" -> "v > 0"), onViolation = "fail"))).run(spark, Map.empty)
    }
    assert(e.getMessage.contains("dq2"))
    // JSON round trip: expectations land name-sorted (deterministic order)
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "ExpectTransform", "name": "dq", "inputView": "a",
        |   "outputView": "b", "onViolation": "quarantine",
        |   "quarantineURI": "${lake}/q", "metricsView": "m",
        |   "expectations": {"zzz": "x > 0", "aaa": "y > 0"}}
        |]}""".stripMargin)
    val et = spec.stages.head.asInstanceOf[ExpectTransform]
    assert(et.expectations === Seq("aaa" -> "y > 0", "zzz" -> "x > 0"))
    assert(et.onViolation === "quarantine" && et.quarantineURI.contains("${lake}/q"))
    // failThreshold: tolerated below the rate, aborts above it
    JobSpec(Seq(ExpectTransform("dq3", "et_in", "et_out3",
      Seq("positive" -> "v > 0"), failThreshold = Some(0.7))))
      .run(spark, Map.empty) // 2/3 violating ≤ 0.7 → tolerated, rows dropped
    assert(spark.table("et_out3").count() === 1)
    val te = intercept[IllegalStateException] {
      JobSpec(Seq(ExpectTransform("dq4", "et_in", "et_out4",
        Seq("positive" -> "v > 0"), failThreshold = Some(0.5))))
        .run(spark, Map.empty) // 2/3 > 0.5 → abort
    }
    assert(te.getMessage.contains("violation rate") &&
      te.getMessage.contains("positive (2/3)"))
    // invalid policy refuses at construction
    intercept[IllegalArgumentException] {
      ExpectTransform("bad", "a", "b", Seq("e" -> "x"), onViolation = "ignore")
    }
    intercept[IllegalArgumentException] { // threshold domain
      ExpectTransform("bad", "a", "b", Seq("e" -> "x"), failThreshold = Some(1.5))
    }
    intercept[IllegalArgumentException] { // quarantine without a URI
      ExpectTransform("bad", "a", "b", Seq("e" -> "x"), onViolation = "quarantine")
    }
  }

  test("StreamIngest stage: each run drains only the new landings, exactly-once") {
    val base = tmpDir("js-si-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .coalesce(1).write.mode("overwrite").parquet(s"$base/land")
    val spec = JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "StreamIngest", "name": "ingest",
         |   "inputURI": "$${lake}/land", "outputURI": "$${lake}/t",
         |   "schemaDDL": "id BIGINT, k STRING"}
         |]}""".stripMargin)
    spec.run(spark, Map("lake" -> base))
    val t = VersionedTable(s"$base/t")
    assert(t.read(spark).count() === 2)
    val v1 = t.latestVersion()
    // an idle tick commits nothing
    spec.run(spark, Map("lake" -> base))
    assert(t.latestVersion() === v1)
    // the next tick picks up exactly the new landing
    Seq((3L, "c")).toDF("id", "k")
      .coalesce(1).write.mode("append").parquet(s"$base/land")
    spec.run(spark, Map("lake" -> base))
    assert(t.read(spark).as[(Long, String)].collect().sorted.toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
  }

  test("TableCloneSync seeds a missing backup, then refreshes incrementally; " +
      "TableFsck reports") {
    val base = tmpDir("js-csync-")
    val t = VersionedTable(s"$base/src")
    t.commit(spark.range(0, 200).selectExpr("id AS k"), numPartitions = Some(2))
    val spec = JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TableCloneSync", "name": "bak",
         |   "tableURI": "$${lake}/src", "targetURI": "$${lake}/bak",
         |   "outputView": "sync_audit"},
         |  {"type": "TableFsck", "name": "integrity", "dryRun": true,
         |   "tableURI": "$${lake}/bak", "outputView": "fsck_audit"}
         |]}""".stripMargin)
    // first run seeds the backup with a full clone
    spec.run(spark, Map("lake" -> base))
    val first = spark.table("sync_audit").head()
    assert(first.getInt(0) === first.getInt(1) && first.getInt(0) > 0)
    assert(spark.table("fsck_audit").count() === 0) // intact backup
    // source grows; the re-run moves only the delta
    t.append(spark.range(200, 300).selectExpr("id AS k"), numPartitions = Some(1))
    spec.run(spark, Map("lake" -> base))
    val second = spark.table("sync_audit").head()
    assert(second.getInt(0) === 1 && second.getInt(1) === 3)
    assert(VersionedTable(s"$base/bak").read(spark).count() === 300)
  }

  test("maintenance verbs run from a declarative JSON job spec (the " +
      "reference's SQL-stage idiom): COPY INTO + OPTIMIZE + DESCRIBE HISTORY") {
    val base = tmpDir("js-maint-")
    Seq((1L, "a"), (2L, "b")).toDF("id", "k").coalesce(2)
      .write.parquet(s"$base/land")
    val t = VersionedTable(s"$base/t")
    t.commit(Seq.empty[(Long, String)].toDF("id", "k"))
    val spec = JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "SQLExecute", "name": "ingest",
         |   "sql": "COPY INTO '$${T}' FROM '$${LAND}'",
         |   "sqlParams": {"T": "$base/t", "LAND": "$base/land"}},
         |  {"type": "SQLExecute", "name": "binpack",
         |   "sql": "OPTIMIZE '$${T}'", "sqlParams": {"T": "$base/t"}},
         |  {"type": "SQLTransform", "name": "audit", "outputView": "hist",
         |   "sql": "DESCRIBE HISTORY '$${T}'", "sqlParams": {"T": "$base/t"}}
         |]}""".stripMargin)
    spec.run(spark, Map.empty)
    assert(t.read(spark).count() === 2, "COPY INTO must have ingested")
    val ops = spark.table("hist").select("operation")
      .collect().map(_.getString(0)).toSeq
    assert(ops.contains("COPY INTO") && ops.contains("OPTIMIZE"),
      s"history must show the staged verbs, got $ops")
    // plain SQL still falls through to Spark unchanged
    JobSpec(Seq(SQLExecute("plain", "SELECT 1"))).run(spark, Map.empty)
  }

  test("incremental dedup from a declarative job: build the signature " +
      "store, admit a batch, decisions land in a view") {
    val base = tmpDir("js-dedup-")
    Seq((2L, "alpha beta gamma delta epsilon zeta"),
        (4L, "totally different corpus text here okay"))
      .toDF("doc_id", "text").createOrReplaceTempView("dd_corpus")
    Seq((11L, "alpha beta gamma delta epsilon zeta"),
        (13L, "fresh text admitted by the batch"))
      .toDF("doc_id", "text").createOrReplaceTempView("dd_batch")
    JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "DedupIndexBuild", "name": "b", "inputView": "dd_corpus",
         |   "storeURI": "$base/ix"},
         |  {"type": "DedupIndexAdmit", "name": "a", "inputView": "dd_batch",
         |   "storeURI": "$base/ix", "outputView": "decisions"}
         |]}""".stripMargin).run(spark, Map.empty)
    val d = spark.table("decisions").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(d === Map(11L -> "exact_dup", 13L -> "admitted"))
    assert(VersionedTable(s"$base/ix/sigs").read(spark).count() === 3)
  }

  test("SQLAssert gates data quality in both modes with 3VL semantics") {
    Seq((1L, true), (2L, true)).toDF("id", "ok")
      .createOrReplaceTempView("qa_src")
    // all_true over passing rows: job proceeds
    JobSpec(Seq(SQLAssert("ok", "SELECT ok, id FROM qa_src")))
      .run(spark, Map.empty)
    // a NULL assertion column is NOT a pass (3VL), and the failure message
    // carries sample rows
    Seq((1L, Some(true)), (2L, None)).toDF("id", "ok")
      .createOrReplaceTempView("qa_null")
    val e = intercept[IllegalStateException](
      JobSpec(Seq(SQLAssert("nulls", "SELECT ok, id FROM qa_null")))
        .run(spark, Map.empty))
    assert(e.getMessage.contains("nulls") && e.getMessage.contains("2"))
    // violations-query style: empty passes, rows fail
    JobSpec(Seq(SQLAssert("none", "SELECT * FROM qa_src WHERE id > 99",
      expect = "empty"))).run(spark, Map.empty)
    val v = intercept[IllegalStateException](
      JobSpec(Seq(SQLAssert("viol", "SELECT * FROM qa_src WHERE id = 2",
        expect = "empty"))).run(spark, Map.empty))
    assert(v.getMessage.contains("expected no rows"))
    // parses from JSON under both the graft and Arc stage names
    val spec = JobSpec.fromJson(
      """{"stages": [{"type": "SQLValidate", "name": "q",
        |  "sql": "SELECT true AS ok", "expect": "all_true"}]}""".stripMargin)
    assert(spec.stages === Seq(SQLAssert("q", "SELECT true AS ok")))
  }

  test("TableRestore parses from JSON") {
    val spec = JobSpec.fromJson(
      """{"stages": [{"type": "TableRestore", "name": "rb",
        |  "tableURI": "/tmp/t", "versionAsOf": 3}]}""".stripMargin)
    assert(spec.stages === Seq(TableRestore("rb", "/tmp/t", 3L)))
    // a forgotten or non-numeric versionAsOf must fail at parse time — the
    // silent Jackson default would be 0, i.e. a maximal rollback from a typo
    val missing = intercept[IllegalArgumentException](JobSpec.fromJson(
      """{"stages": [{"type": "TableRestore", "name": "rb", "tableURI": "/t"}]}"""))
    assert(missing.getMessage.contains("versionAsOf"))
    val bogus = intercept[IllegalArgumentException](JobSpec.fromJson(
      """{"stages": [{"type": "TableRestore", "name": "rb",
        |  "tableURI": "/t", "versionAsOf": "latest"}]}""".stripMargin))
    assert(bogus.getMessage.contains("must be an integer"))
  }

  test("XmlExtract and FileLoad writer options parse and roundtrip") {
    val loc = tmpDir("xml-")
    Seq((1L, "alpha"), (2L, "beta")).toDF("id", "v")
      .createOrReplaceTempView("xml_src")
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "FileLoad", "name": "w", "inputView": "xml_src",
        |   "outputURI": "${LOC}/out", "format": "xml",
        |   "options": {"rowTag": "rec", "rootTag": "recs"}},
        |  {"type": "XmlExtract", "name": "r", "inputURI": "${LOC}/out",
        |   "outputView": "xml_back", "rowTag": "rec",
        |   "schemaDDL": "id BIGINT, v STRING"}
        |]}""".stripMargin)
    assert(spec.stages.map(_.getClass.getSimpleName) === Seq("FileLoad", "XmlExtract"))
    assert(spec.stages.head.asInstanceOf[FileLoad].options ===
      Map("rowTag" -> "rec", "rootTag" -> "recs"))
    spec.run(spark, Map("LOC" -> loc))
    assert(spark.table("xml_back").as[(Long, String)].collect().toSet ===
      Set((1L, "alpha"), (2L, "beta")))
  }

  test("job-level conf (%conf numRows/showLog) parses with defaults") {
    val spec = JobSpec.fromJson(
      """{"conf": {"numRows": 5, "showLog": true},
        | "stages": [{"type": "SQLTransform", "name": "s",
        |             "outputView": "v", "sql": "SELECT 1 AS one"}]}""".stripMargin)
    assert(spec.conf === JobConf(numRows = 5, showLog = true))
    assert(JobSpec.fromJson("""{"stages": []}""").conf === JobConf(12, false))
  }

  test("TableCompact/TableDelete new knobs parse from JSON") {
    val job = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "TableCompact", "name": "opt", "tableURI": "/t",
        |   "targetFileSizeMb": 128},
        |  {"type": "TableDelete", "name": "expire", "tableURI": "/t",
        |   "condition": "x < 0", "mor": true}
        |]}""".stripMargin)
    val compact = job.stages.head.asInstanceOf[TableCompact]
    assert(compact.targetFileSizeMb === Some(128))
    val del = job.stages(1).asInstanceOf[TableDelete]
    assert(del.mor)
    // absent knobs keep their conservative defaults
    val plain = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "TableDelete", "name": "d", "tableURI": "/t", "condition": "x < 0"}
        |]}""".stripMargin).stages.head.asInstanceOf[TableDelete]
    assert(!plain.mor)
  }

  test("unknown stage type fails fast") {
    assertThrows[IllegalArgumentException](
      JobSpec.fromJson("""{"stages": [{"type": "Nope"}]}"""))
  }

  test("TableLoad partitionBy / TableCheckpoint / TableChangeFeed parse and run") {
    import spark.implicits._
    val lake = tmpDir("job-")
    Seq((1L, "F", 10.0), (2L, "O", 20.0), (3L, "F", 30.0))
      .toDF("id", "status", "amount").createOrReplaceTempView("pt_src")
    val job = JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TableLoad", "name": "load", "inputView": "pt_src",
         |   "outputURI": "$lake/t", "partitionBy": ["status"]},
         |  {"type": "TableDelete", "name": "del", "tableURI": "$lake/t",
         |   "condition": "status = 'O'"},
         |  {"type": "TableCheckpoint", "name": "ckpt", "tableURI": "$lake/t"},
         |  {"type": "TableChangeFeed", "name": "feed", "tableURI": "$lake/t",
         |   "outputView": "t_changes", "fromVersion": 0}
         |]}""".stripMargin)
    assert(job.stages.head.asInstanceOf[TableLoad].partitionBy === Seq("status"))
    job.run(spark, Map.empty)
    val t = graft.table.VersionedTable(s"$lake/t")
    assert(t.partitionByOf(0L) === Seq("status"))
    assert(t.checkpointVersions().nonEmpty)
    val feed = spark.table("t_changes")
      .select("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().toSeq
    assert(feed === Seq((2L, "delete", 1L)))
  }

  test("end-to-end: CSV extract → typing → SQL → versioned load, with env gating") {
    val loc = tmpDir("job-")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(s"$loc/in.csv"), "1,alpha\n2,beta\n3,gamma\n")
    val spec = JobSpec.fromJson(
      """{"stages": [
        |  {"type": "DelimitedExtract", "name": "e",
        |   "inputURI": "${LOC}/in.csv", "outputView": "raw",
        |   "delimiter": "Comma", "header": false, "quote": "None"},
        |  {"type": "TypingTransform", "name": "t", "inputView": "raw",
        |   "outputView": "typed",
        |   "schema": [{"name": "id", "type": "long"}, {"name": "v", "type": "string"}]},
        |  {"type": "SQLTransform", "name": "s", "outputView": "out",
        |   "sql": "SELECT id, upper(v) AS v FROM typed WHERE id <= ${max_id}",
        |   "sqlParams": {"max_id": "2"}},
        |  {"type": "SQLTransform", "name": "uat-only", "outputView": "out",
        |   "environments": ["uat"],
        |   "sql": "SELECT id, 'SHOULD NOT RUN' AS v FROM typed"},
        |  {"type": "DeltaLakeLoad", "name": "l", "inputView": "out",
        |   "outputURI": "${LOC}/t", "numPartitions": 1}
        |]}""".stripMargin)
    spec.run(spark, Map("LOC" -> loc), environment = "production")
    val got = VersionedTable(s"$loc/t").read(spark)
      .select("id", "v").as[(Long, String)].collect().toSet
    assert(got === Set((1L, "ALPHA"), (2L, "BETA")))
  }
}
