package graft.catalog

import graft.SparkSpec
import graft.table.VersionedTable
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The SQL front door: [[GraftCatalog]] resolving `graft.<ns>.<t>`
  * identifiers to versioned tables, and [[GraftExtensions]] routing SQL
  * `MERGE INTO` / `UPDATE` / `DELETE` statements to the kernel — the
  * reference's whole idiom is SQL-declarative row-level ops against a
  * Delta-role table (scd2-job.ipynb:338-353), and this is that surface. */
class GraftCatalogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private var n = 0
  private def fresh(): String = { n += 1; s"t${System.nanoTime()}_$n" }

  /** The VersionedTable behind a `graft.default.<name>` identifier — file
    * -level proofs go through the table handle because `Dataset.inputFiles`
    * is empty for DSv2 scans (the analyzed plan has no file info). */
  private def handle(qualified: String): VersionedTable = {
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    VersionedTable(s"$wh/default/${qualified.split('.').last}")
  }

  /** Manifest data files of the CURRENT version (table-relative-ish proof:
    * the scan's parquet paths filtered to data/ — DV sidecars excluded). */
  private def dataFiles(vt: VersionedTable): Set[String] =
    vt.read(spark).inputFiles.filter(_.contains("/data/")).toSet

  test("metadata tables: .files/.partitions/.history resolve as SQL relations") {
    val name = fresh()
    val t = s"graft.default.$name"
    spark.sql(s"CREATE TABLE $t (id BIGINT, k STRING) PARTITIONED BY (k)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, 'a'), (3, 'b')")
    spark.sql(s"INSERT INTO $t VALUES (4, 'b')")
    // .files: one row per live file, joinable/filterable like any relation
    val files = spark.sql(s"SELECT * FROM $t.files")
    assert(files.count() > 0)
    assert(files.selectExpr("sum(row_count - dv_rows)").head.getLong(0) === 4L)
    assert(files.filter("partition LIKE 'k=%'").count() === files.count())
    // .partitions: typed partition column, DV-exact live rows
    spark.sql(s"DELETE FROM $t WHERE id = 2")
    val parts = spark.sql(
      s"SELECT k, num_rows FROM $t.partitions ORDER BY k")
      .as[(String, Long)].collect().toSeq
    assert(parts === Seq(("a", 1L), ("b", 2L)))
    // .history: one row per version, the same frame DESCRIBE HISTORY serves
    assert(spark.sql(s"SELECT * FROM $t.history").count() ===
      handle(t).versions().size.toLong)
    // a REAL table named `files` (namespace default/<name>) wins over the
    // metadata fallback — the fallback fires only on a miss
    spark.sql(s"CREATE TABLE `graft`.`default`.`$name`.`files` (x BIGINT)")
    try {
      spark.sql(s"INSERT INTO `graft`.`default`.`$name`.`files` VALUES (7)")
      assert(spark.sql(s"SELECT * FROM $t.files").columns.toSeq === Seq("x"))
    } finally spark.sql(s"DROP TABLE `graft`.`default`.`$name`.`files`")
    assert(spark.sql(s"SELECT * FROM $t.files").columns.contains("path"))
    // a metadata suffix on a MISSING table still misses
    intercept[Exception] { spark.sql(s"SELECT * FROM graft.default.nope_$name.files") }
    spark.sql(s"DROP TABLE $t")
  }

  test("IN-subquery DELETE/UPDATE: merge translation, MOR route, refusals") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id % 7 FROM range(100)")
    Seq(3L, 5L, 5L, 200L).toDF("id").createOrReplaceTempView("sq_ids")
    // DELETE: duplicate subquery rows collapse; an id absent from the
    // target is a no-op, not an error
    spark.sql(s"DELETE FROM $t WHERE id IN (SELECT id FROM sq_ids)")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 98L)
    assert(spark.sql(s"SELECT * FROM $t WHERE id IN (3, 5)").count() === 0L)
    // UPDATE with a residual conjunct: only matched AND residual-true rows
    spark.sql(s"UPDATE $t SET v = -1 WHERE id IN (SELECT id + 5 FROM sq_ids) AND v > 2")
    val hit = spark.sql(s"SELECT id FROM $t WHERE v = -1").as[Long].collect().sorted
    assert(hit.toSeq === Seq(10L)) // ids 8,10 matched; only v(10)=3 > 2
    // MOR route: deletion vectors instead of rewrites
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('enableDeletionVectors' = 'true')")
    spark.sql(s"DELETE FROM $t WHERE id IN (SELECT id * 2 FROM sq_ids)")
    assert(spark.sql(s"SELECT * FROM $t WHERE id IN (6, 10)").count() === 0L)
    assert(handle(t).detail(spark).select("num_deletion_vectors").head.getLong(0) > 0)
    // correlated subqueries and NOT IN refuse loudly
    intercept[UnsupportedOperationException] {
      spark.sql(s"DELETE FROM $t WHERE id NOT IN (SELECT id FROM sq_ids)")
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("EXISTS / NOT EXISTS DELETE and UPDATE translate to merge clauses") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id % 7 FROM range(20)")
    Seq((3L, "hot"), (5L, "hot"), (5L, "cold"), (8L, "cold"))
      .toDF("rid", "tag").createOrReplaceTempView("ex_refs")
    // EXISTS with an inner residual: only 'hot'-tagged ids delete
    spark.sql(s"""DELETE FROM $t WHERE EXISTS (
      |  SELECT 1 FROM ex_refs r WHERE r.rid = id AND r.tag = 'hot')""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t WHERE id IN (3, 5)").count() === 0)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 18)
    // NOT EXISTS + a plain residual: keep referenced rows, trim the rest
    spark.sql(s"""DELETE FROM $t WHERE NOT EXISTS (
      |  SELECT 1 FROM ex_refs r WHERE r.rid = id) AND id >= 10""".stripMargin)
    // survivors: 0..9 minus {3,5} (unreferenced but < 10), plus 8 twice? no —
    // ids 0-9 except 3,5 stay; of ids >= 10 none is referenced, all go
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").as[Long].collect().toSeq
      === Seq(0L, 1L, 2L, 4L, 6L, 7L, 8L, 9L))
    // NOT EXISTS UPDATE: unreferenced survivors get flagged
    spark.sql(s"""UPDATE $t SET v = -1 WHERE NOT EXISTS (
      |  SELECT 1 FROM ex_refs r WHERE r.rid = id)""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $t WHERE v <> -1 ORDER BY id")
      .as[Long].collect().toSeq === Seq(8L)) // the only referenced survivor
    // refusals: a second correlation and a non-equi correlation
    intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM $t WHERE EXISTS (
        |  SELECT 1 FROM ex_refs r WHERE r.rid = id AND r.rid > v)""".stripMargin)
    }
    intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM $t WHERE EXISTS (
        |  SELECT 1 FROM ex_refs r WHERE r.rid > id)""".stripMargin)
    }
    spark.sql(s"DROP TABLE $t")
  }

  test("composite-key EXISTS / NOT EXISTS DML translate to a multi-column merge ON") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (a BIGINT, b STRING, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id % 5, " +
      "CASE WHEN id % 2 = 0 THEN 'x' ELSE 'y' END, id FROM range(20)")
    Seq((1L, "x"), (2L, "y"), (3L, "x"))
      .toDF("ra", "rb").createOrReplaceTempView("ck_refs")
    // two equi-correlations → both land in the merge ON; rows matching the
    // composite key (a, b) delete: (1,x) = ids 6,16 and (2,y) = ids 7,17
    spark.sql(s"""DELETE FROM $t WHERE EXISTS (
      |  SELECT 1 FROM ck_refs r WHERE r.ra = a AND r.rb = b AND r.rb <> 'z')
      |  AND a < 3""".stripMargin)
    assert(spark.sql(s"SELECT v FROM $t ORDER BY v").as[Long].collect().toSeq
      === (0L to 19L).filterNot(Seq(6L, 7L, 16L, 17L).contains))
    // composite-key NOT EXISTS UPDATE: only the (3,x) survivors (ids 8, 18)
    // keep their v
    spark.sql(s"""UPDATE $t SET v = -1 WHERE NOT EXISTS (
      |  SELECT 1 FROM ck_refs r WHERE r.ra = a AND r.rb = b)""".stripMargin)
    assert(spark.sql(s"SELECT v FROM $t WHERE v <> -1 ORDER BY v")
      .as[Long].collect().toSeq === Seq(8L, 18L))
    // tuple IN — the other spelling of a composite-key delete: (3,'x')
    // matches ids 8 and 18
    spark.sql(s"DELETE FROM $t WHERE (a, b) IN (SELECT ra, rb FROM ck_refs)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE v <> -1").head.getLong(0)
      === 0L)
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 14L)
    spark.sql(s"DROP TABLE $t")
  }

  test("guarded NOT IN DML translates; nullable shapes refuse with the 3VL rationale") {
    val t = s"graft.default.${fresh()}"
    // CTAS from range: `id` is NON-NULLABLE by schema — the probe-side proof
    spark.sql(s"CREATE TABLE $t AS SELECT id, id % 7 AS v FROM range(20)")
    Seq(Some(3L), Some(5L), None: Option[Long])
      .toDF("rid").createOrReplaceTempView("ni_refs")
    // the null-row trap: unguarded nullable subquery output refuses — ONE
    // NULL in the list makes NOT IN delete nothing, which no merge expresses
    val trap = intercept[UnsupportedOperationException] {
      spark.sql(s"DELETE FROM $t WHERE id NOT IN (SELECT rid FROM ni_refs)")
    }
    assert(trap.getMessage.contains("non-nullable"))
    // the user-guarded spelling translates to the not-matched-by-source
    // merge, residual included: keep {3, 5}, trim everything else below 10
    spark.sql(s"""DELETE FROM $t WHERE id NOT IN (
      |  SELECT rid FROM ni_refs WHERE rid IS NOT NULL) AND id < 10""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").as[Long].collect().toSeq
      === Seq(3L, 5L) ++ (10L to 19L))
    // NOT IN UPDATE: every id outside the keep-list gets flagged
    spark.sql(s"""UPDATE $t SET v = -1 WHERE id NOT IN (
      |  SELECT rid FROM ni_refs WHERE rid IS NOT NULL)""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $t WHERE v <> -1 ORDER BY id")
      .as[Long].collect().toSeq === Seq(3L, 5L))
    // EMPTY guarded subquery: NOT IN is TRUE everywhere — the merge's
    // not-matched-by-source must delete every residual-matching row
    spark.sql(s"""DELETE FROM $t WHERE id NOT IN (
      |  SELECT rid FROM ni_refs WHERE rid IS NOT NULL AND rid > 100)
      |  AND id >= 15""".stripMargin)
    assert(spark.sql(s"SELECT id FROM $t ORDER BY id").as[Long].collect().toSeq
      === Seq(3L, 5L) ++ (10L to 14L))
    // nullable PROBE column refuses even with a guarded subquery (a NULL
    // probe row deletes under NOT IN exactly when the subquery is empty)
    val t2 = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t2 (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 1), (NULL, 2)")
    val probe = intercept[UnsupportedOperationException] {
      spark.sql(s"""DELETE FROM $t2 WHERE id NOT IN (
        |  SELECT id FROM $t WHERE id IS NOT NULL)""".stripMargin)
    }
    assert(probe.getMessage.contains("probe column"))
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE $t2")
  }

  test("table_changes TVF serves the change feed with Delta-inclusive bounds") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")            // v0: empty
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('enableChangeDataFeed' = 'true')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(10)")      // v1
    spark.sql(s"DELETE FROM $t WHERE id >= 8")                     // v2
    spark.sql(s"UPDATE $t SET v = -1 WHERE id = 0")                // v3
    // catalog-name addressing, inclusive [1, 3] — injected via the same
    // extensions hook as the scalar functions, so no registerAll needed
    val got = spark.sql(
      s"""SELECT _commit_version, _change_type, count(*) AS n
         |FROM table_changes('$t', 1, 3)
         |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin)
      .as[(Long, String, Long)].collect().toSeq
    assert(got === Seq((1L, "insert", 10L), (2L, "delete", 2L),
      (3L, "delete", 1L), (3L, "insert", 1L)))
    // endVersion defaults to the head; startVersion bounds are honored
    assert(spark.sql(s"SELECT * FROM table_changes('$t', 2)").count() === 4L)
    // startVersion 0 includes the initial commit's rows as inserts (empty
    // here — the CREATE wrote nothing, but the bound itself must not throw)
    assert(spark.sql(s"SELECT * FROM table_changes('$t', 0, 1)").count() === 10L)
    // unknown identifier refuses with the addressing rule
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('no_such.cat.t', 0)").collect()
    }
    assert(bad.getMessage.contains("graft-catalog"))
    // vacuumed diff anchor: computing [2, 3] needs version 1 retained;
    // drop it and the error speaks table_changes, naming the REQUESTED
    // range, not the internal start-1 anchor (round-14 ADVICE)
    handle(t).vacuum(retainVersions = 2)               // keeps v2, v3 only
    val gone = intercept[IllegalArgumentException] {
      spark.sql(s"SELECT * FROM table_changes('$t', 2, 3)").collect()
    }
    assert(gone.getMessage.contains("table_changes"))
    assert(gone.getMessage.contains("version 2") &&
      gone.getMessage.contains("diffing from version 1"))
    // the still-computable suffix keeps working after the vacuum
    assert(spark.sql(s"SELECT * FROM table_changes('$t', 3, 3)").count() === 2L)
    spark.sql(s"DROP TABLE $t")
  }

  test("table_changes accepts timestamp bounds (Delta's starting/endingTimestamp)") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")                   // v0
    Thread.sleep(25)
    spark.sql(s"INSERT INTO $t SELECT id FROM range(10)")       // v1
    Thread.sleep(25)
    spark.sql(s"DELETE FROM $t WHERE id >= 8")                  // v2
    Thread.sleep(25)
    spark.sql(s"INSERT INTO $t VALUES (100)")                   // v3
    val vt = handle(t)
    def fmt(ms: Long): String = java.time.LocalDateTime
      .ofInstant(java.time.Instant.ofEpochMilli(ms), java.time.ZoneId.of("UTC"))
      .toString.replace('T', ' ') // session zone is UTC in SparkSpec
    // a start TIMESTAMP = the first commit at or after it
    assert(spark.sql(
      s"SELECT * FROM table_changes('$t', '${fmt(vt.commitTimeOf(2L))}')")
      .count() === spark.sql(s"SELECT * FROM table_changes('$t', 2)").count())
    // version and timestamp bounds mix; an end TIMESTAMP = last commit <= it
    assert(spark.sql(
      s"SELECT * FROM table_changes('$t', 1, '${fmt(vt.commitTimeOf(2L))}')")
      .count() === spark.sql(s"SELECT * FROM table_changes('$t', 1, 2)").count())
    // a start timestamp past the head refuses in the TVF's vocabulary
    val late = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', '2999-01-01 00:00:00')")
        .collect()
    }
    assert(late.getMessage.contains("after the latest commit"))
    // garbage refuses as a parse error, not a silent version-0 scan
    val bad = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', 'not-a-time')").collect()
    }
    assert(bad.getMessage.contains("does not parse"))
    // a TYPED temporal literal is a timestamp bound too — epoch-micros must
    // never leak through as a nonsense version number
    assert(spark.sql(
      s"SELECT * FROM table_changes('$t', TIMESTAMP '${fmt(vt.commitTimeOf(2L))}')")
      .count() === spark.sql(s"SELECT * FROM table_changes('$t', 2)").count())
    // an unsupported bound type refuses loudly
    val dbl = intercept[Exception] {
      spark.sql(s"SELECT * FROM table_changes('$t', 1.5)").collect()
    }
    assert(dbl.getMessage.contains("integer version or a string"))
    spark.sql(s"DROP TABLE $t")
  }

  test("CREATE TABLE / INSERT INTO / SELECT / INSERT OVERWRITE round-trip") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, k STRING, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a', 10.0), (2, 'b', 20.0)")
    spark.sql(s"INSERT INTO $t VALUES (3, 'c', 30.0)")
    assert(spark.sql(s"SELECT sum(amt) FROM $t").head.getDouble(0) === 60.0)
    assert(spark.sql(s"SELECT * FROM $t WHERE id = 2").count() === 1)
    spark.sql(s"INSERT OVERWRITE $t VALUES (9, 'z', 90.0)")
    assert(spark.sql(s"SELECT * FROM $t").as[(Long, String, Double)].collect()
      .toSeq === Seq((9L, "z", 90.0)))
    // versions: create(0), insert(1), insert(2), overwrite(3)
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 2").count() === 3)
    spark.sql(s"DROP TABLE $t")
    assert(!spark.catalog.tableExists(t))
  }

  test("CTAS, partitioned CREATE, and partition-pruned reads") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (k) AS " +
      "SELECT id, CASE WHEN id % 2 = 0 THEN 'even' ELSE 'odd' END AS k " +
      "FROM range(10)")
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE k = 'even'").head.getLong(0) === 5)
    // hive layout landed and manifest partition pruning engages
    val vt = handle(t)
    val (pr, scanned, total) = vt.readPartitioned(spark, "k = 'even'")
    assert(scanned < total && pr.count() === 5)
    assert(dataFiles(vt).exists(_.contains("k=even")))
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL DELETE routes to the kernel (COW and MOR)") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, k STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, concat('k', id) FROM range(100)")
    spark.sql(s"DELETE FROM $t WHERE id >= 90")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 90)
    // arbitrary (non-filter-translatable) predicate still works via the rule
    spark.sql(s"DELETE FROM $t WHERE id % 7 = 0 AND length(k) > 1")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 90 - 13)
    // MOR: same statement, deletion vectors instead of rewrites
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('enableDeletionVectors' = 'true')")
    val before = dataFiles(handle(t))
    spark.sql(s"DELETE FROM $t WHERE id = 1")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 90 - 13 - 1)
    assert(dataFiles(handle(t)) === before, "MOR delete must not rewrite data files")
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL UPDATE rewrites only matching rows, expressions see preimages") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE, note STRING)")
    spark.sql(s"INSERT INTO $t SELECT id, CAST(id AS DOUBLE), 'x' FROM range(10)")
    spark.sql(s"UPDATE $t SET amt = amt * 10, note = concat(note, '!') WHERE id < 3")
    val rows = spark.sql(s"SELECT * FROM $t ORDER BY id")
      .as[(Long, Double, String)].collect().toSeq
    assert(rows.take(3) === Seq((0L, 0.0, "x!"), (1L, 10.0, "x!"), (2L, 20.0, "x!")))
    assert(rows.drop(3).forall { case (id, amt, note) => amt === id.toDouble && note === "x" })
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL MERGE INTO: update + delete + insert clauses, hash-exact result") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, status STRING, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t SELECT id, 'old', CAST(id AS DOUBLE) FROM range(10)")
    Seq((0L, "upd", 100.0), (5L, "del", 0.0), (20L, "new", 7.0))
      .toDF("id", "status", "amt").createOrReplaceTempView("merge_src")
    spark.sql(
      s"""MERGE INTO $t AS tgt USING merge_src AS src ON tgt.id = src.id
         |WHEN MATCHED AND src.status = 'del' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET amt = src.amt, status = src.status
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val got = spark.sql(s"SELECT * FROM $t ORDER BY id")
      .as[(Long, String, Double)].collect().toSeq
    assert(got === Seq((0L, "upd", 100.0)) ++
      (1L to 4L).map(i => (i, "old", i.toDouble)) ++
      (6L to 9L).map(i => (i, "old", i.toDouble)) :+ (20L, "new", 7.0))
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL MERGE clause ORDER is first-match-wins (delete before update)") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(6)")
    spark.range(0, 6).select(col("id"), (col("id") * 100).as("v"))
      .createOrReplaceTempView("merge_src2")
    // the delete clause FIRES FIRST for even ids even though the update's
    // condition also matches them
    spark.sql(
      s"""MERGE INTO $t USING merge_src2 src ON $t.id = src.id
         |WHEN MATCHED AND src.id % 2 = 0 THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t ORDER BY id").as[(Long, Long)].collect()
      .toSeq === Seq((1L, 100L), (3L, 300L), (5L, 500L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("SQL MERGE NOT MATCHED BY SOURCE makes target equal source") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(10)")
    spark.range(5, 15).select(col("id"), (col("id") + 1000).as("v"))
      .createOrReplaceTempView("merge_src3")
    spark.sql(
      s"""MERGE INTO $t USING merge_src3 src ON $t.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.v
         |WHEN NOT MATCHED THEN INSERT *
         |WHEN NOT MATCHED BY SOURCE THEN DELETE""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t ORDER BY id").as[(Long, Long)].collect()
      .toSeq === (5L to 14L).map(i => (i, i + 1000L)))
    spark.sql(s"DROP TABLE $t")
  }

  test("MOR merge via table property: files untouched, DVs + appends") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT) " +
      "TBLPROPERTIES ('enableDeletionVectors' = 'true')")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(100)")
    val before = dataFiles(handle(t))
    assert(before.nonEmpty)
    spark.range(0, 5).select(col("id"), (col("id") + 500).as("v"))
      .createOrReplaceTempView("merge_src4")
    spark.sql(
      s"""MERGE INTO $t USING merge_src4 src ON $t.id = src.id
         |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    val after = dataFiles(handle(t))
    assert(before.subsetOf(after) && after.size > before.size,
      "MOR merge must keep every existing file and append post-images")
    assert(spark.sql(s"SELECT sum(v) FROM $t").head.getLong(0) ===
      (0L until 100L).sum + 5 * 500L)
    spark.sql(s"DROP TABLE $t")
  }

  test("replaceWhere via DataFrameWriterV2 overwrite: scoped, file-proof") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t PARTITIONED BY (k) AS " +
      "SELECT id, CASE WHEN id < 5 THEN 'keep' ELSE 'swap' END AS k FROM range(10)")
    val keepFiles = dataFiles(handle(t)).filter(_.contains("k=keep"))
    assert(keepFiles.nonEmpty)
    spark.range(100, 103).select(col("id"), lit("swap").as("k"))
      .writeTo(t).overwrite(col("k") === "swap")
    val got = spark.sql(s"SELECT id FROM $t ORDER BY id").as[Long].collect().toSeq
    assert(got === (0L to 4L) ++ (100L to 102L))
    // the untouched partition's files carried over IDENTICALLY (no rewrite)
    val keepAfter = dataFiles(handle(t)).filter(_.contains("k=keep"))
    assert(keepAfter === keepFiles, "replaceWhere rewrote an untouched partition")
    // a batch leaking outside the predicate refuses
    val e = intercept[Exception] {
      spark.range(0, 2).select(col("id"), lit("keep").as("k"))
        .writeTo(t).overwrite(col("k") === "swap")
    }
    assert(e.getMessage.contains("leak") || e.getMessage.contains("match"),
      s"unexpected: ${e.getMessage}")
    spark.sql(s"DROP TABLE $t")
  }

  test("path identifier + TIMESTAMP AS OF + RENAME") {
    val dir = tmpDir("cat-path-") + "/t"
    VersionedTable(dir).commit(Seq((1L, "a")).toDF("id", "k"))
    assert(spark.sql(s"SELECT * FROM graft.`$dir`").count() === 1)
    VersionedTable(dir).append(Seq((2L, "b")).toDF("id", "k"))
    val hist = VersionedTable(dir)
    // the commit clock is the manifest's in-commit stamp, not the file's
    // (possibly truncated) mtime
    val t0 = hist.commitTimeOf(0L)
    val asOf = new java.sql.Timestamp(t0).toString
    assert(spark.sql(s"SELECT * FROM graft.`$dir` TIMESTAMP AS OF '$asOf'")
      .count() === 1)
    assert(hist.latestVersion().contains(1L))
    val aName = fresh(); val bName = fresh()
    val a = s"graft.default.$aName"
    val b = s"graft.default.$bName"
    spark.sql(s"CREATE TABLE $a AS SELECT 1 AS x")
    // the rename target is resolved INSIDE the table's catalog — repeating
    // the catalog name would read as a two-level namespace
    spark.sql(s"ALTER TABLE $a RENAME TO default.$bName")
    assert(spark.sql(s"SELECT * FROM $b").count() === 1)
    assert(!spark.catalog.tableExists(a))
    spark.sql(s"DROP TABLE $b")
  }

  test("ALTER TABLE ADD COLUMNS + MERGE WITH SCHEMA EVOLUTION widen additively") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(5)")
    // DDL widen: metadata-only, old rows read the new column as null
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (note STRING)")
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq === Seq("id", "v", "note"))
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE note IS NULL").head.getLong(0) === 5)
    // merge-time widen: a source with one MORE column evolves the schema
    spark.range(3, 8).selectExpr("id", "id * 10 AS v", "'n' AS note",
      "CAST(id AS DOUBLE) AS score").createOrReplaceTempView("merge_evo_src")
    spark.sql(
      s"""MERGE WITH SCHEMA EVOLUTION INTO $t USING merge_evo_src src
         |ON $t.id = src.id
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    val out = spark.sql(s"SELECT * FROM $t ORDER BY id")
    assert(out.columns.toSeq === Seq("id", "v", "note", "score"))
    val rows = out.collect()
    assert(rows.length === 8)
    assert(rows.take(3).forall(_.isNullAt(3)), "old rows must back-fill null")
    assert(rows.drop(3).forall(r => r.getDouble(3) === r.getLong(0).toDouble))
    spark.sql(s"DROP TABLE $t")
  }

  test("NULL delete-flag does not veto a later UPDATE (3VL clause weakening)") {
    // canonical CDC shape: WHEN MATCHED AND src.op='D' THEN DELETE /
    // WHEN MATCHED THEN UPDATE. When op IS NULL the delete condition is
    // NULL — SQL skips the clause, and the update MUST still fire (a naive
    // `NOT (op='D')` weakening would turn the update's condition NULL too).
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    spark.sql(s"INSERT INTO $t SELECT id, id FROM range(4)")
    Seq((0L, Some("D"), 100L), (1L, None, 111L), (2L, Some("U"), 222L))
      .toDF("id", "op", "v").createOrReplaceTempView("merge_null_src")
    spark.sql(
      s"""MERGE INTO $t USING merge_null_src src ON $t.id = src.id
         |WHEN MATCHED AND src.op = 'D' THEN DELETE
         |WHEN MATCHED THEN UPDATE SET v = src.v""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t ORDER BY id").as[(Long, Long)].collect()
      .toSeq === Seq((1L, 111L), (2L, 222L), (3L, 3L)))
    // same 3VL rule on the NOT MATCHED BY SOURCE side
    val t2 = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t2 (id BIGINT, v BIGINT, tag STRING)")
    spark.sql(s"INSERT INTO $t2 VALUES (1, 1, NULL), (2, 2, 'x'), (9, 9, NULL)")
    spark.range(9, 10).selectExpr("id").createOrReplaceTempView("merge_null_src2")
    spark.sql(
      s"""MERGE INTO $t2 USING merge_null_src2 src ON $t2.id = src.id
         |WHEN NOT MATCHED BY SOURCE AND tag = 'x' THEN DELETE
         |WHEN NOT MATCHED BY SOURCE THEN UPDATE SET v = -1""".stripMargin)
    assert(spark.sql(s"SELECT id, v FROM $t2 ORDER BY id").as[(Long, Long)]
      .collect().toSeq === Seq((1L, -1L), (9L, 9L)),
      "NULL tag row must take the UPDATE branch, 'x' row must delete")
    spark.sql(s"DROP TABLE $t"); spark.sql(s"DROP TABLE $t2")
  }

  test("UPDATE SET * / INSERT * match source columns case-insensitively") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.0), (2, 2.0)")
    // source spells the columns ID / Amt — default resolution is
    // case-insensitive, so star expansion must still assign them
    spark.sql("SELECT * FROM VALUES (2, 20.0), (3, 30.0) AS src(ID, Amt)")
      .createOrReplaceTempView("merge_case_src")
    spark.sql(
      s"""MERGE INTO $t USING merge_case_src src ON $t.id = src.ID
         |WHEN MATCHED THEN UPDATE SET *
         |WHEN NOT MATCHED THEN INSERT *""".stripMargin)
    assert(spark.sql(s"SELECT * FROM $t ORDER BY id").as[(Long, Double)]
      .collect().toSeq === Seq((1L, 1.0), (2L, 20.0), (3L, 30.0)))
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER TABLE ADD/DROP CONSTRAINT routes SQL CHECK constraints to the kernel") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0)")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    val vt = handle(t)
    assert(vt.constraintsOf(vt.resolve()).get("amt_pos").exists(_.contains("amt")))
    // the new constraint gates writes: a violating insert must fail
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (3, -1.0)") }
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 2)
    // a constraint EXISTING DATA violates is refused at ADD time
    intercept[Exception] {
      spark.sql(s"ALTER TABLE $t ADD CONSTRAINT amt_big CHECK (amt > 15)")
    }
    assert(!vt.constraintsOf(vt.resolve()).contains("amt_big"))
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT amt_pos")
    assert(vt.constraintsOf(vt.resolve()).isEmpty)
    spark.sql(s"INSERT INTO $t VALUES (3, -1.0)") // gate gone
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 3)
    // DROP ... IF EXISTS on an absent name is a no-op, bare DROP errors
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT IF EXISTS nope")
    intercept[Exception] { spark.sql(s"ALTER TABLE $t DROP CONSTRAINT nope") }
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER COLUMN SET/DROP NOT NULL: validated tighten, metadata-only loosen") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, k STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 'a'), (2, NULL)")
    val vt = handle(t)
    // SET NOT NULL goes through the maintenance verb (Spark's analyzer
    // categorically refuses nullable->non-nullable in plain ALTER TABLE;
    // the kernel proves null-freeness by scanning, Delta-extension shape).
    // k holds a NULL: tightening must be refused with the data intact
    intercept[Exception] { graft.table.TableSql.run(spark,
      s"ALTER TABLE '${vt.root}' ALTER COLUMN k SET NOT NULL") }
    assert(vt.schemaOf(vt.resolve()).exists(_("k").nullable))
    // id is null-free: tighten, then a null insert must hit the write gate
    graft.table.TableSql.run(spark,
      s"ALTER TABLE '${vt.root}' ALTER COLUMN id SET NOT NULL")
    assert(vt.schemaOf(vt.resolve()).exists(f => !f("id").nullable))
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (NULL, 'c')") }
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 2)
    // loosen: metadata-only, then the same insert lands
    spark.sql(s"ALTER TABLE $t ALTER COLUMN id DROP NOT NULL")
    spark.sql(s"INSERT INTO $t VALUES (NULL, 'c')")
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 3)
    spark.sql(s"DROP TABLE $t")
  }

  test("GENERATED ALWAYS AS IDENTITY through SQL DDL allocates at the commit point") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, k STRING)")
    val vt = handle(t)
    assert(vt.identityOf(vt.resolve()).contains(("id", 0L)))
    spark.sql(s"INSERT INTO $t (k) VALUES ('a'), ('b')")
    spark.sql(s"INSERT INTO $t (k) VALUES ('c')")
    assert(spark.sql(s"SELECT id, k FROM $t ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // explicit values refuse (ALWAYS, not BY DEFAULT)
    intercept[Exception] { spark.sql(s"INSERT INTO $t VALUES (99, 'x')") }
    assert(spark.sql(s"SELECT count(*) FROM $t").head.getLong(0) === 3)
    spark.sql(s"DROP TABLE $t")
  }

  test("GENERATED BY DEFAULT AS IDENTITY through SQL DDL: backfill + allocate") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT GENERATED BY DEFAULT AS IDENTITY, k STRING)")
    // migration backfill: explicit historical id accepted
    spark.sql(s"INSERT INTO $t VALUES (100, 'backfill')")
    // omitted column and explicit NULL both allocate — above the backfill
    spark.sql(s"INSERT INTO $t (k) VALUES ('new')")
    spark.sql(s"INSERT INTO $t VALUES (NULL, 'also-new')")
    assert(spark.sql(s"SELECT id, k FROM $t ORDER BY id")
      .as[(Long, String)].collect().toSeq ===
      Seq((100L, "backfill"), (101L, "new"), (102L, "also-new")))
    spark.sql(s"DROP TABLE $t")
  }

  test("GENERATED ALWAYS AS (expr) through SQL DDL: engine computes, writers never supply") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (ts TIMESTAMP, v DOUBLE, " +
      "day DATE GENERATED ALWAYS AS (CAST(ts AS DATE))) " +
      "PARTITIONED BY (day)")
    // the generation expression landed as the same schema metadata
    // commit(generatedColumns=...) records — later funnels recompute it
    spark.sql(s"INSERT INTO $t (ts, v) VALUES " +
      "(TIMESTAMP'2024-03-01 10:00:00', 1.0), " +
      "(TIMESTAMP'2024-03-02 23:59:59', 2.0)")
    assert(spark.sql(s"SELECT v, CAST(day AS STRING) FROM $t ORDER BY v")
      .as[(Double, String)].collect().toSeq ===
      Seq((1.0, "2024-03-01"), (2.0, "2024-03-02")))
    // a supplied value is overwritten by the expression (provable
    // partition-source consistency, Delta semantics)
    spark.sql(s"INSERT INTO $t VALUES " +
      "(TIMESTAMP'2024-03-03 01:00:00', 3.0, DATE'1999-01-01')")
    assert(spark.sql(s"SELECT CAST(day AS STRING) FROM $t WHERE v = 3.0")
      .head.getString(0) === "2024-03-03")
    spark.sql(s"DROP TABLE $t")
  }

  test("ALTER TABLE RENAME/DROP COLUMN are metadata-only via column ids") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE, tag STRING)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0, 'a'), (2, 20.0, 'b')")
    val vt = handle(t)
    val filesBefore = dataFiles(vt)
    // rename: data written under the OLD physical name keeps resolving by
    // field id — and NO file was rewritten
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amt TO amount")
    assert(dataFiles(vt) === filesBefore, "rename must be metadata-only")
    assert(spark.sql(s"SELECT id, amount FROM $t ORDER BY id")
      .as[(Long, Double)].collect().toSeq === Seq((1L, 10.0), (2L, 20.0)))
    // writes after the rename mix with pre-rename files transparently
    spark.sql(s"INSERT INTO $t VALUES (3, 30.0, 'c')")
    assert(spark.sql(s"SELECT sum(amount) FROM $t").head.getDouble(0) === 60.0)
    // time travel still shows the version-pinned OLD name
    assert(spark.sql(s"SELECT * FROM $t VERSION AS OF 1").columns.toSeq
      === Seq("id", "amt", "tag"))
    // drop is metadata-only too, and re-adding the name does NOT
    // resurrect dropped data (fresh column id ≠ the retired one)
    val filesAtDrop = dataFiles(vt)
    spark.sql(s"ALTER TABLE $t DROP COLUMN tag")
    assert(dataFiles(vt) === filesAtDrop, "drop must be metadata-only")
    assert(spark.sql(s"SELECT * FROM $t").columns.toSeq === Seq("id", "amount"))
    spark.sql(s"ALTER TABLE $t ADD COLUMNS (tag STRING)")
    assert(spark.sql(s"SELECT tag FROM $t WHERE id = 1").head.isNullAt(0),
      "re-added column must read null on old files, not the dropped values")
    spark.sql(s"DROP TABLE $t")
  }

  test("RENAME/DROP COLUMN refuse partition and constraint-referenced columns") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE, k STRING) PARTITIONED BY (k)")
    spark.sql(s"INSERT INTO $t VALUES (1, 1.0, 'x')")
    spark.sql(s"ALTER TABLE $t ADD CONSTRAINT amt_pos CHECK (amt > 0)")
    intercept[Exception] { spark.sql(s"ALTER TABLE $t RENAME COLUMN k TO kk") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t DROP COLUMN k") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t RENAME COLUMN amt TO amount") }
    intercept[Exception] { spark.sql(s"ALTER TABLE $t DROP COLUMN amt") }
    // dropping the constraint unblocks the rename
    spark.sql(s"ALTER TABLE $t DROP CONSTRAINT amt_pos")
    spark.sql(s"ALTER TABLE $t RENAME COLUMN amt TO amount")
    assert(spark.sql(s"SELECT amount FROM $t").head.getDouble(0) === 1.0)
    spark.sql(s"DROP TABLE $t")
  }

  test("CREATE TABLE ... LOCATION is rejected, not silently dropped") {
    val t = s"graft.default.${fresh()}"
    val ex = intercept[Exception] {
      spark.sql(s"CREATE TABLE $t (id BIGINT) LOCATION '/tmp/elsewhere-${fresh()}'")
    }
    def causes(e: Throwable): Seq[Throwable] =
      if (e == null) Nil else e +: causes(e.getCause)
    assert(causes(ex).exists(_.isInstanceOf[UnsupportedOperationException]))
    assert(spark.sql(s"SHOW TABLES IN graft.default").collect()
      .forall(!_.getString(1).equals(t.split('.').last)))
  }

  test("filter pushdown through the catalog scan prunes files via stats") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    // range-sorted insert → tight per-file id stats
    val tbl = handle(t)
    tbl.append(spark.range(0, 4000).selectExpr("id", "id % 7 AS v"),
      numPartitions = Some(8), sortBy = Seq("id"))
    // correctness through the catalog scan (numeric IN straddling files)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id IN (5, 3000)")
      .head.getLong(0) === 2)
    assert(spark.sql(s"SELECT count(*) FROM $t WHERE id >= 100 AND id <= 150")
      .head.getLong(0) === 51)
    // the pruning engine the scan feeds (same StatsBounds translation)
    val (_, kept, total) = tbl.readBounded(spark,
      Seq(("id", Some("100"), Some("150"))))
    // total may include the CREATE TABLE commit's empty seed file
    assert(total >= 8 && kept <= 2 && kept >= 1, s"kept $kept of $total")
    spark.sql(s"DROP TABLE $t")
  }

  test("count(*) pushes down to manifest metadata; filters and stats-less tables scan") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT, v BIGINT)")
    val tbl = handle(t)
    tbl.append(spark.range(0, 1000).selectExpr("id", "id % 7 AS v"),
      numPartitions = Some(4))
    // DV tombstones subtract from the metadata count
    tbl.setProperties(Map("enableDeletionVectors" -> "true"))
    tbl.deleteMor(spark, "id < 10")
    val df = spark.sql(s"SELECT count(*) FROM $t")
    assert(df.head.getLong(0) === 990L)
    assert(df.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"),
      "an unfiltered count(*) must be served from the manifest, not a scan:\n" +
        df.queryExecution.executedPlan.toString)
    // a FILTERED count must NOT take the metadata path (filters stay
    // residual here, so Spark never even attempts the agg pushdown)
    val filtered = spark.sql(s"SELECT count(*) FROM $t WHERE v = 3")
    assert(!filtered.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(filtered.head.getLong(0) ===
      tbl.read(spark).filter("v = 3").count())
    // time travel counts the pinned version
    val preDelete = spark.sql(
      s"SELECT count(*) FROM $t VERSION AS OF ${tbl.resolve() - 1}")
    assert(preDelete.head.getLong(0) === 1000L)
    // a stats-opted-out table rejects the pushdown and scans normally
    val t2 = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t2 (id BIGINT)")
    handle(t2).append(spark.range(0, 50).toDF("id"), collectStats = false)
    val noStats = spark.sql(s"SELECT count(*) FROM $t2")
    assert(!noStats.queryExecution.executedPlan.toString.contains("GraftMetaAggScan"))
    assert(noStats.head.getLong(0) === 50L)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE $t2")
  }

  test("CREATE OR REPLACE TABLE is atomic and history-retaining; TRUNCATE TABLE works") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t AS SELECT id, id % 3 AS v FROM range(100)")
    assert(spark.table(t).count() === 100)
    val tbl = handle(t)
    val v0 = tbl.resolve()
    // REPLACE swaps schema + data in ONE commit; the old snapshot stays
    spark.sql(s"CREATE OR REPLACE TABLE $t AS " +
      "SELECT id AS k, CAST(id AS STRING) AS s FROM range(10)")
    assert(spark.table(t).columns.toSeq === Seq("k", "s"))
    assert(spark.table(t).count() === 10)
    assert(tbl.resolve() === v0 + 1, "REPLACE must be exactly one commit")
    assert(tbl.read(spark, versionAsOf = Some(v0)).count() === 100,
      "the pre-replace snapshot must stay time-travelable")
    // a failing replace aborts without touching the table
    intercept[Exception](spark.sql(s"CREATE OR REPLACE TABLE $t AS " +
      "SELECT assert_true(id < 2) AS x, id FROM range(5)"))
    assert(spark.table(t).count() === 10, "a failed replace must change nothing")
    // plain REPLACE (no AS SELECT): the declared schema, zero rows
    spark.sql(s"REPLACE TABLE $t (a BIGINT, b BIGINT)")
    assert(spark.table(t).columns.toSeq === Seq("a", "b")
      && spark.table(t).count() === 0)
    // TRUNCATE routes through SupportsDeleteV2's truncateTable
    spark.sql(s"INSERT INTO $t VALUES (1, 2), (3, 4)")
    spark.sql(s"TRUNCATE TABLE $t")
    assert(spark.table(t).count() === 0)
    // REPLACE of a MISSING table refuses; CREATE OR REPLACE creates it
    val t2 = s"graft.default.${fresh()}"
    intercept[Exception](spark.sql(s"REPLACE TABLE $t2 (x BIGINT)"))
    spark.sql(s"CREATE OR REPLACE TABLE $t2 (x BIGINT)")
    assert(spark.table(t2).count() === 0)
    spark.sql(s"DROP TABLE $t")
    spark.sql(s"DROP TABLE $t2")
  }

  test("REPLACE TABLE does not leak the replaced table's properties or identity") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, k STRING) " +
      "TBLPROPERTIES ('enableChangeDataFeed' = 'true', 'checkpointInterval' = '3')")
    spark.sql(s"INSERT INTO $t (k) VALUES ('a'), ('b')")
    val vt = handle(t)
    assert(vt.identityOf(vt.resolve()).isDefined)
    // the new definition declares NO identity and different properties:
    // nothing of the old declaration may survive the replace
    spark.sql(s"CREATE OR REPLACE TABLE $t (a BIGINT, b STRING) " +
      "TBLPROPERTIES ('appendOnly' = 'false')")
    assert(vt.identityOf(vt.resolve()).isEmpty,
      "REPLACE must reset an identity declaration absent from the new definition")
    val props = vt.properties
    assert(!props.contains("enableChangeDataFeed") && !props.contains("checkpointInterval"),
      s"old TBLPROPERTIES leaked through REPLACE: $props")
    assert(props.get("appendOnly").contains("false"))
    // a replace that re-declares identity starts a fresh declaration
    spark.sql(s"CREATE OR REPLACE TABLE $t (id BIGINT GENERATED ALWAYS AS IDENTITY, s STRING)")
    spark.sql(s"INSERT INTO $t (s) VALUES ('x')")
    assert(spark.table(t).select("id").as[Long].collect().nonEmpty)
    assert(vt.properties.get("appendOnly").isEmpty,
      "the second REPLACE must drop the first definition's properties")
    spark.sql(s"DROP TABLE $t")
  }

  test("SHOW TBLPROPERTIES serves the manifest properties by name") {
    val t = s"graft.default.${fresh()}"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")
    spark.sql(s"ALTER TABLE $t SET TBLPROPERTIES ('quality' = 'gold', 'team' = 'etl')")
    val props = spark.sql(s"SHOW TBLPROPERTIES $t")
      .as[(String, String)].collect().toMap
    assert(props.get("quality").contains("gold") && props.get("team").contains("etl"))
    // single-key form
    assert(spark.sql(s"SHOW TBLPROPERTIES $t ('quality')")
      .as[(String, String)].collect().toSeq === Seq(("quality", "gold")))
    spark.sql(s"DROP TABLE $t")
  }

  test("persistent views: create, read, replace, list, alter, rename, drop") {
    val t = s"graft.default.${fresh()}"
    val v = s"graft.default.${fresh()}_v"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0), (3, 30.0)")
    spark.sql(s"CREATE VIEW $v AS SELECT id, amt * 2 AS amt2 FROM $t WHERE id <= 2")
    assert(spark.table(v).as[(Long, Double)].collect().sorted.toSeq
      === Seq((1L, 20.0), (2L, 40.0)))
    // persisted on disk, not session state: the definition file exists
    val wh = spark.conf.get("spark.sql.catalog.graft.warehouse")
    val vFile = java.nio.file.Paths.get(
      s"$wh/_views/default/${v.split('.').last}.view.json")
    assert(java.nio.file.Files.isRegularFile(vFile), s"no persisted view at $vFile")
    // the view tracks the TABLE's head (no snapshot pinning without
    // time travel in the body)
    spark.sql(s"INSERT INTO $t VALUES (0, 5.0)")
    assert(spark.table(v).count() === 3L)
    // CREATE OR REPLACE swaps the definition
    spark.sql(s"CREATE OR REPLACE VIEW $v AS SELECT id FROM $t WHERE id = 3")
    assert(spark.table(v).as[Long].collect().toSeq === Seq(3L))
    // SHOW VIEWS lists it
    assert(spark.sql("SHOW VIEWS IN graft.default").collect()
      .map(_.getString(1)).contains(v.split('.').last))
    // ALTER VIEW SET/UNSET TBLPROPERTIES round-trips
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('note' = 'pinned')")
    assert(spark.sql(s"SHOW TBLPROPERTIES $v").as[(String, String)]
      .collect().toMap.get("note").contains("pinned"))
    spark.sql(s"ALTER VIEW $v UNSET TBLPROPERTIES ('note')")
    assert(!spark.sql(s"SHOW TBLPROPERTIES $v").as[(String, String)]
      .collect().toMap.contains("note"))
    // rename, then drop
    val v2 = s"graft.default.${fresh()}_v2"
    spark.sql(s"ALTER VIEW $v RENAME TO $v2")
    assert(spark.table(v2).as[Long].collect().toSeq === Seq(3L))
    intercept[Exception] { spark.table(v).collect() }
    spark.sql(s"DROP VIEW $v2")
    assert(spark.sql("SHOW VIEWS IN graft.default").collect()
      .forall(_.getString(1) != v2.split('.').last))
    spark.sql(s"DROP TABLE $t")
  }

  test("view DDL under USE graft: relative names, temp-view fall-through, collisions") {
    val cmgr = spark.sessionState.catalogManager
    val prior = cmgr.currentCatalog.name()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.default")
    spark.sql("USE graft.default")
    try {
      val n = fresh()
      spark.sql(s"CREATE TABLE base_$n (id BIGINT)")
      spark.sql(s"INSERT INTO base_$n SELECT id FROM range(4)")
      // a MULTI-part relative name IS the namespace-qualified identifier
      // (Spark's own convention) — `default.v` must land at graft.default.v
      spark.sql(s"CREATE VIEW default.rel_$n AS SELECT * FROM base_$n")
      assert(spark.table(s"graft.default.rel_$n").count() === 4L)
      assert(spark.table(s"rel_$n").count() === 4L)
      // a single-part relative name takes the current namespace
      spark.sql(s"CREATE VIEW bare_$n AS SELECT * FROM base_$n WHERE id < 2")
      assert(spark.table(s"graft.default.bare_$n").count() === 2L)
      // temp views keep Spark's own machinery: DROP VIEW on a temp name
      // must drop the TEMP view, not error into the graft catalog
      spark.sql(s"CREATE TEMPORARY VIEW tv_$n AS SELECT 1 AS one")
      spark.sql(s"DROP VIEW tv_$n")
      assert(!spark.catalog.tableExists(s"tv_$n"))
      // name collisions refuse BOTH ways
      intercept[Exception] {
        spark.sql(s"CREATE TABLE rel_$n (x BIGINT)") // view occupies the name
      }
      intercept[Exception] {
        spark.sql(s"ALTER VIEW bare_$n RENAME TO base_$n") // table occupies it
      }
      spark.sql(s"DROP VIEW default.rel_$n")
      spark.sql(s"DROP VIEW bare_$n")
      // relative SHOW VIEWS forms work under the graft current catalog
      assert(spark.sql("SHOW VIEWS").collect() != null)
      assert(spark.sql("SHOW VIEWS IN default").collect() != null)
      spark.sql(s"DROP TABLE base_$n")
    } finally cmgr.setCurrentCatalog(prior)
  }

  test("view schema-drift policy: evolution default, binding refuses, compensation pins") {
    val t = s"graft.default.${fresh()}"
    val v = s"graft.default.${fresh()}_v"
    spark.sql(s"CREATE TABLE $t (id BIGINT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (1, 10.0), (2, 20.0)")
    spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t")
    assert(spark.table(v).schema.fieldNames.toSeq === Seq("id", "amt"))

    // DEFAULT = EVOLUTION: the view follows the base table's new shape
    spark.sql(s"CREATE OR REPLACE TABLE $t (id BIGINT, amt DOUBLE, tag STRING)")
    spark.sql(s"INSERT INTO $t VALUES (7, 70.0, 'x')")
    assert(spark.table(v).schema.fieldNames.toSeq === Seq("id", "amt", "tag"))

    // BINDING: any drift refuses loudly, naming the stored and live shapes
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'binding')")
    val drift = intercept[Exception] { spark.table(v).collect() }
    assert(drift.getMessage.contains("drifted") && drift.getMessage.contains("binding"),
      s"unexpected binding error: ${drift.getMessage}")

    // COMPENSATION: the view keeps serving its STORED schema — the gained
    // column is ignored, and a type drift is cast back
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'compensation')")
    assert(spark.table(v).schema.fieldNames.toSeq === Seq("id", "amt"))
    spark.sql(s"CREATE OR REPLACE TABLE $t (id INT, amt DOUBLE)")
    spark.sql(s"INSERT INTO $t VALUES (3, 30.0)")
    val comp = spark.table(v)
    assert(comp.schema("id").dataType === org.apache.spark.sql.types.LongType,
      "compensation must cast the drifted column back to its stored type")
    assert(comp.as[(Long, Double)].collect().toSeq === Seq((3L, 30.0)))

    // a stored column the base LOST refuses in both protected modes
    spark.sql(s"CREATE OR REPLACE TABLE $t (id BIGINT)")
    val lost = intercept[Exception] { spark.table(v).collect() }
    assert(lost.getMessage.contains("no longer exists"),
      s"unexpected compensation error: ${lost.getMessage}")
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'binding')")
    intercept[Exception] { spark.table(v).collect() }

    // unknown mode refuses with the expected vocabulary; evolution recovers
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'strict')")
    val bad = intercept[Exception] { spark.table(v).collect() }
    assert(bad.getMessage.contains("graft.schemaMode"))
    spark.sql(s"ALTER VIEW $v SET TBLPROPERTIES ('graft.schemaMode' = 'evolution')")
    assert(spark.table(v).schema.fieldNames.toSeq === Seq("id"))

    spark.sql(s"DROP VIEW $v")
    spark.sql(s"DROP TABLE $t")
  }

  test("a view body resolves under its STORED catalog and namespace") {
    // the context captured at creation governs the body's relative names —
    // a reader under a different current catalog must see the same rows
    val cmgr = spark.sessionState.catalogManager
    val prior = cmgr.currentCatalog.name()
    spark.sql("CREATE NAMESPACE IF NOT EXISTS graft.default")
    spark.sql("USE graft.default")
    val n = fresh()
    try {
      spark.sql(s"CREATE TABLE ctx_base_$n (id BIGINT)")
      spark.sql(s"INSERT INTO ctx_base_$n SELECT id FROM range(6)")
      // RELATIVE body reference, resolvable only under graft.default
      spark.sql(s"CREATE VIEW ctx_v_$n AS SELECT * FROM ctx_base_$n WHERE id < 4")
    } finally cmgr.setCurrentCatalog("spark_catalog")
    try {
      // read from the session catalog: the body's relative name must still
      // resolve against the STORED graft.default context
      assert(cmgr.currentCatalog.name() === "spark_catalog")
      assert(spark.table(s"graft.default.ctx_v_$n").count() === 4L)
      // and the reader's own context survives the resolution round trip
      assert(cmgr.currentCatalog.name() === "spark_catalog")
      spark.sql(s"DROP VIEW graft.default.ctx_v_$n")
      spark.sql(s"DROP TABLE graft.default.ctx_base_$n")
    } finally cmgr.setCurrentCatalog(prior)
  }

  test("a view over VERSION AS OF serves the pinned snapshot forever") {
    // DECIDED round 15: time travel in a view body is ALLOWED — the view
    // is a named audit snapshot and keeps serving the version its text
    // names, no matter how far the table advances. Pinned here so the
    // behavior cannot drift into head-tracking silently.
    val t = s"graft.default.${fresh()}"
    val v = s"graft.default.${fresh()}_pin"
    spark.sql(s"CREATE TABLE $t (id BIGINT)")                 // v0
    spark.sql(s"INSERT INTO $t SELECT id FROM range(5)")      // v1
    spark.sql(s"CREATE VIEW $v AS SELECT * FROM $t VERSION AS OF 1")
    assert(spark.table(v).count() === 5L)
    spark.sql(s"INSERT INTO $t SELECT id + 10 FROM range(5)") // v2
    spark.sql(s"DELETE FROM $t WHERE id < 3")                 // v3
    assert(spark.table(t).count() === 7L)
    assert(spark.table(v).count() === 5L,
      "the pinned view must keep serving version 1")
    assert(spark.table(v).agg(org.apache.spark.sql.functions.max("id"))
      .as[Long].collect().head === 4L)
    spark.sql(s"DROP VIEW $v")
    spark.sql(s"DROP TABLE $t")
  }
}
