package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** The maintenance-DDL dispatcher ([[TableSql]]): each verb routes to the
  * table API and returns an observable result frame. */
class TableSqlSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("verbs address catalog tables by NAME (graft.default.t), paths stay quoted") {
    val tn = s"graft.default.tsql_ident_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tn (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $tn SELECT id, id % 5 FROM range(100)")
    spark.sql(s"INSERT INTO $tn SELECT id, id % 5 FROM range(100, 200)")
    // OPTIMIZE by identifier: same kernel, result visible via the identifier
    val opt = TableSql.run(spark, s"OPTIMIZE $tn")
    assert(opt.head.getString(0) === "OPTIMIZE")
    val hist = TableSql.run(spark, s"DESCRIBE HISTORY $tn")
    assert(hist.filter("operation = 'OPTIMIZE'").count() === 1)
    assert(spark.sql(s"SELECT count(*) FROM $tn").head.getLong(0) === 200)
    // SET NOT NULL by identifier routes to the kernel's validated tighten
    TableSql.run(spark, s"ALTER TABLE $tn ALTER COLUMN v SET NOT NULL")
    assert(!spark.table(tn).schema("v").nullable)
    // an identifier NOT owned by a graft catalog: graft-only verbs raise a
    // clear addressing error; the ALTER collision falls through (None)
    intercept[IllegalArgumentException](TableSql.run(spark, "OPTIMIZE nope.t"))
    assert(TableSql.runOpt(spark,
      "ALTER TABLE nope.t ALTER COLUMN v SET NOT NULL").isEmpty)
    spark.sql(s"DROP TABLE $tn")
  }

  test("OPTIMIZE, ZORDER, VACUUM, HISTORY, RESTORE, SHALLOW CLONE round-trip") {
    val base = tmpDir("tsql-")
    val root = base + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).selectExpr("id", "id % 5 AS v"),
      numPartitions = Some(4))
    t.append(spark.range(100, 200).selectExpr("id", "id % 5 AS v"))

    val opt = TableSql.run(spark, s"OPTIMIZE '$root'")
    assert(opt.head.getString(0) === "OPTIMIZE" && t.resolve() === 2L)

    TableSql.run(spark, s"OPTIMIZE '$root' ZORDER BY (id, v)")
    assert(t.resolve() === 3L)

    val hist = TableSql.run(spark, s"DESCRIBE HISTORY '$root'")
    assert(hist.count() === 4) // v0..v3

    TableSql.run(spark, s"RESTORE '$root' TO VERSION AS OF 1")
    assert(t.read(spark).count() === 200)

    TableSql.run(spark, s"CREATE TABLE '$base/c' SHALLOW CLONE '$root'")
    assert(VersionedTable(base + "/c").read(spark).count() === 200)

    TableSql.run(spark, s"VACUUM '$root' RETAIN 2 VERSIONS")
    assert(t.versions().size <= 2)

    intercept[IllegalArgumentException] {
      TableSql.run(spark, s"TRUNCATE '$root'")
    }
  }

  test("DEEP CLONE and REORG ... APPLY (PURGE) verbs round-trip") {
    val base = tmpDir("tsql-")
    val root = base + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 200).selectExpr("id", "id % 5 AS v"),
      numPartitions = Some(4))
    // MOR deletes leave DV tombstones across several files
    t.deleteMor(spark, "id % 10 = 3")
    assert(t.detail(spark).select("num_deletion_vectors").head.getLong(0) > 0)

    val d = TableSql.run(spark, s"CREATE TABLE '$base/d' DEEP CLONE '$root'")
    assert(d.head.getString(0) === "DEEP CLONE")
    assert(VersionedTable(s"$base/d").read(spark).count() === 180)

    val before = t.read(spark).select("id").orderBy("id").collect().toSeq
    val r = TableSql.run(spark, s"REORG TABLE '$root' APPLY (PURGE)")
    assert(r.head.getString(0) === "REORG PURGE")
    // tombstones are materialized: zero DVs, rows identical
    assert(t.detail(spark).select("num_deletion_vectors").head.getLong(0) === 0L)
    assert(t.read(spark).select("id").orderBy("id").collect().toSeq === before)
    // idempotent: a second purge has nothing to rewrite and burns no version
    val v = t.resolve()
    TableSql.run(spark, s"REORG TABLE '$root' APPLY (PURGE)")
    assert(t.resolve() === v)
  }

  test("CREATE OR REPLACE ... CLONE: first run seeds, re-runs refresh incrementally") {
    val base = tmpDir("tsql-csync-")
    val t = VersionedTable(base + "/src")
    t.commit(spark.range(0, 100).selectExpr("id AS k"), numPartitions = Some(2))
    val seed = TableSql.run(spark,
      s"CREATE OR REPLACE TABLE '$base/bak' CLONE '$base/src'")
    assert(seed.head.getString(0) === "CLONE SYNC (seed)")
    t.append(spark.range(100, 150).selectExpr("id AS k"), numPartitions = Some(1))
    val sync = TableSql.run(spark,
      s"CREATE OR REPLACE TABLE '$base/bak' CLONE '$base/src'")
    assert(sync.head.getString(0) === "CLONE SYNC")
    assert(VersionedTable(base + "/bak").read(spark).count() === 150)
    // an ordinary CREATE OR REPLACE TABLE (no CLONE) is NOT intercepted
    assert(TableSql.runOpt(spark,
      "CREATE OR REPLACE TABLE x AS SELECT 1 AS a").isEmpty)
  }

  test("FSCK REPAIR TABLE verb: DRY RUN reports, repair commits the survivors") {
    val base = tmpDir("tsql-fsck-")
    val t = VersionedTable(base + "/t")
    t.commit(spark.range(0, 100).selectExpr("id AS k"), numPartitions = Some(2),
      sortBy = Seq("k"))
    val v = t.resolve()
    val lost = java.nio.file.Files.walk(java.nio.file.Paths.get(base + "/t/data"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet")).minBy(_.toString)
    java.nio.file.Files.delete(lost)
    val dry = TableSql.run(spark, s"FSCK REPAIR TABLE '$base/t' DRY RUN")
    assert(dry.count() === 1 && t.resolve() === v) // reported, not committed
    assert(dry.select("repaired_version").head.get(0) === null)
    val rep = TableSql.run(spark, s"FSCK REPAIR TABLE '$base/t'")
    assert(rep.count() === 1 && t.resolve() === v + 1)
    assert(t.read(spark).count() === 50)
    // clean table: an empty report frame
    assert(TableSql.run(spark, s"FSCK REPAIR TABLE '$base/t'").count() === 0)
  }

  test("ANALYZE TABLE backfills skipped stats; pruning starts working") {
    val base = tmpDir("tsql-")
    val root = base + "/t"
    val t = VersionedTable(root)
    // stats opted out at write time: every file is a prune candidate
    t.commit(spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS v"),
      numPartitions = Some(4), sortBy = Seq("k"), collectStats = false)
    val (_, keptBefore, total) = t.readPruned(spark, "k", "990", "999")
    assert(total === 4 && keptBefore === 4,
      "without stats no file can be skipped — all must be read")
    val r = TableSql.run(spark, s"ANALYZE TABLE '$root' COMPUTE STATISTICS")
    assert(r.head.getString(0) === "ANALYZE")
    // metadata-only: same files, new version, stats present
    assert(t.detail(spark).select("num_files").head.getLong(0) === 4L)
    val (df, keptAfter, _) = t.readPruned(spark, "k", "990", "999")
    assert(keptAfter === 1,
      s"range-clustered files must prune to one after ANALYZE, kept $keptAfter")
    // file-granular pruning: the surviving file's rows include the range
    assert(df.count() === 250 && df.filter("k BETWEEN 990 AND 999").count() === 10)
    // rows unchanged through the metadata commit
    assert(t.read(spark).count() === 1000)
  }

  test("ANALYZE on a non-graft identifier falls through; directory operands refuse identifiers") {
    // ANALYZE TABLE db.tbl is also vanilla Spark grammar: a dotted
    // identifier that is NOT a graft catalog must return None (so the
    // SQLExecute dispatcher falls back to spark.sql) instead of raising
    assert(TableSql.runOpt(spark,
      "ANALYZE TABLE spark_catalog.default.x COMPUTE STATISTICS").isEmpty)
    assert(TableSql.runOpt(spark,
      "ANALYZE TABLE somedb.sometbl COMPUTE STATISTICS").isEmpty)
    // ...and the fallback genuinely works end to end on a session table
    val tn = s"tsql_an_${System.nanoTime()}"
    spark.sql(s"CREATE TABLE $tn (id BIGINT) USING parquet")
    spark.sql(s"INSERT INTO $tn VALUES (1), (2)")
    try spark.sql(s"ANALYZE TABLE default.$tn COMPUTE STATISTICS")
    finally spark.sql(s"DROP TABLE $tn")

    // COPY INTO ... FROM and CONVERT operands are raw directories: an
    // identifier would resolve to a table ROOT whose walk ingests the data
    // files of superseded versions — refused with a clear error instead
    val root = tmpDir("tsql-dirop-") + "/t"
    VersionedTable(root).commit(Seq((1L, "a")).toDF("id", "k"))
    val e1 = intercept[IllegalArgumentException](
      TableSql.run(spark, s"COPY INTO '$root' FROM graft.default.src"))
    assert(e1.getMessage.contains("raw source directory"))
    val e2 = intercept[IllegalArgumentException](
      TableSql.run(spark, "CONVERT TO GRAFT graft.default.src"))
    assert(e2.getMessage.contains("raw source directory"))
  }

  test("DESCRIBE HISTORY derives per-commit operation metrics from manifests") {
    val root = tmpDir("tsql-hm-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).selectExpr("id", "id % 3 AS v"),
      numPartitions = Some(2))                       // v0: +2 files, +100 rows
    t.append(spark.range(100, 150).selectExpr("id", "id % 3 AS v"),
      numPartitions = Some(1))                       // v1: +1 file, +50 rows
    t.delete(spark, "id < 10")                       // v2: rewrite
    val h = TableSql.run(spark, s"DESCRIBE HISTORY '$root'")
      .select("version", "files_added", "files_removed", "rows_added", "rows_removed")
      .collect().map(r => r.getLong(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(h(0L) === ((2L, 0L, 100L, 0L)), s"v0 metrics: ${h(0L)}")
    assert(h(1L) === ((1L, 0L, 50L, 0L)), s"v1 metrics: ${h(1L)}")
    // the COW delete rewrote the touched files: 10 rows net-removed
    val (fa2, fr2, ra2, rr2) = h(2L)
    assert(fr2 >= 1L && rr2 - ra2 === 10L, s"v2 metrics: ${h(2L)}")
    // after vacuuming the parent away, a version's metrics read null
    t.vacuum(retainVersions = 1, orphanRetentionMs = 0L)
    val h2 = TableSql.run(spark, s"DESCRIBE HISTORY '$root'")
    assert(h2.filter("version = 2 AND files_added IS NULL").count() === 1,
      "metrics need the direct parent; a vacuumed baseline must read null")
    ()
  }

  test("checkpointInterval auto-checkpoints the append funnels every n commits") {
    val root = tmpDir("tsql-ack-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("checkpointInterval" -> "3"))
    t.commit(spark.range(0, 10).toDF("id"))          // v0
    assert(t.checkpointVersions().isEmpty, "below the interval: no checkpoint")
    t.append(spark.range(10, 20).toDF("id"))         // v1
    t.append(spark.range(20, 30).toDF("id"))         // v2: 3 commits past -1
    assert(t.checkpointVersions() === Seq(2L),
      s"the interval-crossing append must checkpoint, got ${t.checkpointVersions()}")
    t.append(spark.range(30, 40).toDF("id"))         // v3: 1 past the last
    assert(t.checkpointVersions() === Seq(2L), "below the interval again")
    // a table without the property never auto-checkpoints
    val t2 = VersionedTable(tmpDir("tsql-ack2-") + "/t")
    t2.commit(spark.range(0, 5).toDF("id"))
    (1 to 4).foreach(i => t2.append(spark.range(i * 5, i * 5 + 5).toDF("id")))
    assert(t2.checkpointVersions().isEmpty)
  }

  test("CHECKPOINT verb writes the head checkpoint; idempotent re-run") {
    val root = tmpDir("tsql-ck-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 50).selectExpr("id", "id % 3 AS v"))
    t.append(spark.range(50, 100).selectExpr("id", "id % 3 AS v"))
    val r = TableSql.run(spark, s"CHECKPOINT '$root'")
    assert(r.head.getString(0) === "CHECKPOINT" && r.head.getLong(2) === t.resolve())
    // re-running against an unchanged head is a no-op at the same version
    assert(TableSql.run(spark, s"CHECKPOINT '$root'").head.getLong(2) === t.resolve())
  }

  test("DESCRIBE DETAIL reports head-snapshot metadata in one row") {
    val root = tmpDir("tsql-dd-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("enableDeletionVectors" -> "true"))
    t.commit(spark.range(0, 100).selectExpr("id", "CAST(id % 2 AS STRING) AS p"),
      partitionBy = Seq("p"))
    t.addConstraint(spark, "id_pos", "id >= 0")
    t.deleteMor(spark, "id = 5")
    val d = TableSql.run(spark, s"DESCRIBE DETAIL '$root'").head
    assert(d.getAs[String]("location") === root)
    assert(d.getAs[Long]("version") === t.resolve())
    assert(d.getAs[Long]("num_files") >= 2L && d.getAs[Long]("size_bytes") > 0L)
    // metadata-only live row count: 100 written, 1 DV-tombstoned — answered
    // from the manifest's per-file __rows stats + the tiny DV sidecar,
    // zero data-file reads
    assert(d.getAs[Long]("num_rows") === 99L)
    assert(d.getAs[Seq[String]]("partition_columns") === Seq("p"))
    assert(d.getAs[Long]("num_deletion_vectors") === 1L)
    assert(d.getAs[Long]("num_constraints") === 1L)
    assert(d.getAs[Seq[String]]("properties").exists(_.startsWith("enableDeletionVectors=")))
  }

  test("SHOW PARTITIONS lists manifest partition values with file counts") {
    val root = tmpDir("tsql-sp-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 90).selectExpr("id", "CAST(id % 3 AS STRING) AS p"),
      partitionBy = Seq("p"))
    val parts = TableSql.run(spark, s"SHOW PARTITIONS '$root'")
    assert(parts.columns.toSeq === Seq("p", "num_files", "size_bytes"))
    val rows = parts.collect()
    assert(rows.map(_.getString(0)).toSeq === Seq("0", "1", "2"))
    assert(rows.forall(r => r.getLong(1) >= 1L && r.getLong(2) > 0L))
    intercept[IllegalArgumentException] {
      val flat = tmpDir("tsql-sp2-") + "/t"
      VersionedTable(flat).commit(spark.range(3).toDF("id"))
      TableSql.run(spark, s"SHOW PARTITIONS '$flat'")
    }
  }

  test("OPTIMIZE ... WHERE compacts only the matching partitions") {
    val root = tmpDir("tsql-ow-") + "/t"
    val t = VersionedTable(root)
    // 3 partitions × several small files each
    t.commit(spark.range(0, 300).selectExpr(
      "id", "CAST(id % 3 AS STRING) AS p"),
      numPartitions = Some(4), partitionBy = Seq("p"))
    t.append(spark.range(300, 600).selectExpr(
      "id", "CAST(id % 3 AS STRING) AS p"), numPartitions = Some(4))
    def filesByPart(): Map[String, Int] =
      t.read(spark).inputFiles.toSeq
        .groupBy(f => "p=(\\d)".r.findFirstMatchIn(f).get.group(1))
        .view.mapValues(_.size).toMap
    val before = filesByPart()
    assert(before.values.forall(_ >= 2), s"need multiple files per partition: $before")
    val beforeOther = t.read(spark).inputFiles.filterNot(_.contains("p=1")).toSet
    TableSql.run(spark, s"OPTIMIZE '$root' WHERE p = '1'")
    val after = filesByPart()
    assert(after("1") === 1, s"partition 1 must binpack to one file: $after")
    assert(t.read(spark).inputFiles.filterNot(_.contains("p=1")).toSet === beforeOther,
      "untouched partitions' files must carry verbatim")
    assert(t.read(spark).count() === 600)
    assert(t.read(spark).filter("p = '1'").count() === 200)
    // ZORDER + WHERE is rejected, not silently partial
    intercept[IllegalArgumentException] {
      TableSql.run(spark, s"OPTIMIZE '$root' ZORDER BY (id) WHERE p = '1'")
    }
  }

  test("VACUUM RETAIN n HOURS sweeps by manifest age behind a safety floor") {
    val root = tmpDir("tsql-h-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).toDF("id"))
    // v1 OVERWRITES: v0's data files are referenced by no later version,
    // so an age-based sweep of v0 has real files to delete
    t.commit(spark.range(0, 20).toDF("id"))
    t.append(spark.range(20, 30).toDF("id"))
    // below the 168 h floor without FORCE → refused, nothing swept
    val ex = intercept[IllegalArgumentException] {
      TableSql.run(spark, s"VACUUM '$root' RETAIN 1 HOURS")
    }
    assert(ex.getMessage.contains("safety floor"))
    assert(t.versions().size === 3)
    // age v0 and v1 beyond a 1 h window; v2 (head) stays recent. Age is
    // the IN-COMMIT timestamp (commitTimeMs) — rewrite the stamp itself;
    // mtime churn alone must NOT age a stamped manifest
    import java.nio.file.{Files, Paths}
    val twoHoursAgo = System.currentTimeMillis() - 2 * 3600 * 1000
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    Seq(0L, 1L).foreach { v =>
      val p = Paths.get(root, "_graft_log", f"v$v%08d.json")
      val node = mapper.readTree(Files.readAllBytes(p))
        .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
      node.put("commitTimeMs", twoHoursAgo + v)
      Files.write(p, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    }
    val vac = TableSql.run(spark, s"VACUUM '$root' RETAIN 1 HOURS FORCE")
    assert(vac.head.getLong(2) > 0)
    assert(t.versions() === Seq(2L))
    assert(t.read(spark).count() === 30)
    // everything inside the window → sweep is a no-op, head never goes
    val vac2 = TableSql.run(spark, s"VACUUM '$root' RETAIN 1 HOURS FORCE")
    assert(vac2.head.getLong(2) === 0 && t.versions() === Seq(2L))
  }

  test("VACUUM DRY RUN previews exactly the sweep set without deleting") {
    val root = tmpDir("tsql-dry-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).toDF("id"), numPartitions = Some(2))
    t.commit(spark.range(0, 50).toDF("id"), numPartitions = Some(2)) // v1 overwrite
    t.append(spark.range(100, 110).toDF("id"))
    val preview = TableSql.run(spark, s"VACUUM '$root' RETAIN 2 VERSIONS DRY RUN")
      .collect().map(_.getString(0)).toSeq
    assert(preview.nonEmpty, "v0's files are unreferenced by the retained window")
    preview.foreach { f =>
      assert(java.nio.file.Files.exists(java.nio.file.Paths.get(root).resolve(f)),
        s"dry run must not delete ($f gone)")
    }
    assert(t.versions().size === 3, "dry run must not drop manifests")
    // the real sweep deletes exactly the previewed files
    val swept = TableSql.run(spark, s"VACUUM '$root' RETAIN 2 VERSIONS")
      .head.getAs[Long]("swept")
    assert(swept === preview.size.toLong)
    preview.foreach { f =>
      assert(!java.nio.file.Files.exists(java.nio.file.Paths.get(root).resolve(f)))
    }
    assert(t.read(spark).count() === 60)
  }

  test("RESTORE TO TIMESTAMP AS OF resolves by commit time (all literal forms)") {
    val root = tmpDir("tsql-rts-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq(1L).toDF("id"))
    Thread.sleep(20) // distinct manifest mtimes
    val cut = System.currentTimeMillis()
    Thread.sleep(20)
    t.append(Seq(2L).toDF("id"))
    // epoch-millis form restores to the version committed before the cut
    val out = TableSql.run(spark, s"RESTORE '$root' TO TIMESTAMP AS OF '$cut'").head
    assert(out.getString(0) === "RESTORE" && out.getLong(2) === 2L)
    assert(t.read(spark).as[Long].collect().toSeq === Seq(1L))
    // SQL-timestamp form: a future timestamp resolves to the current head
    val future = new java.sql.Timestamp(System.currentTimeMillis() + 60000).toString
    TableSql.run(spark, s"RESTORE '$root' TO TIMESTAMP AS OF '$future'")
    assert(t.read(spark).as[Long].collect().toSeq === Seq(1L))
  }

  test("GENERATE symlink_format_manifest writes the manifest tree") {
    val root = tmpDir("tsql-gen-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).selectExpr("id", "CAST(id % 2 AS STRING) AS p"),
      partitionBy = Seq("p"))
    val out = TableSql.run(spark, s"GENERATE symlink_format_manifest FOR TABLE '$root'").head
    assert(out.getString(0) === "GENERATE" && out.getLong(2) === 0L)
    Seq("p=0", "p=1").foreach { part =>
      val m = java.nio.file.Paths.get(root, "_symlink_format_manifest", part, "manifest")
      assert(java.nio.file.Files.exists(m), s"missing $m")
    }
  }

  test("paths containing a single quote address via SQL '' escaping") {
    val root = tmpDir("tsql-q-") + "/o'brien"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).toDF("id"))
    t.append(spark.range(10, 20).toDF("id"))
    val lit = root.replace("'", "''")
    val hist = TableSql.run(spark, s"DESCRIBE HISTORY '$lit'")
    assert(hist.count() === 2)
    val opt = TableSql.run(spark, s"OPTIMIZE '$lit'")
    assert(opt.head.getString(1) === root) // unescaped path in the status row
    assert(t.read(spark).count() === 20)
    // VACUUM reports its sweep count under `swept`, not `version`
    val vac = TableSql.run(spark, s"VACUUM '$lit' RETAIN 2 VERSIONS")
    assert(vac.columns.toSeq === Seq("operation", "path", "swept"))
  }
}
