package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Batch DataFrame/SQL surface of the graft-table format
  * ([[graft.streaming.TableStreamProvider]] as RelationProvider /
  * CreatableRelationProvider / InsertableRelation): standard reader/writer
  * calls and `CREATE TABLE USING` resolve to versioned reads and commits,
  * with pushed filters pruning the file list via manifest stats. */
class TableRelationSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("writer save modes map to commit/append and the reader reads back") {
    val root = tmpDir("rel-") + "/t"
    Seq((1L, "a"), (2L, "b")).toDF("id", "k")
      .write.format("graft-table").option("path", root).mode("errorifexists").save()
    Seq((3L, "c")).toDF("id", "k")
      .write.format("graft-table").option("path", root).mode("append").save()
    val t = VersionedTable(root)
    assert(t.latestVersion().contains(1L)) // commit then append
    val back = spark.read.format("graft-table").option("path", root).load()
    assert(back.as[(Long, String)].collect().sorted.toSeq
      === Seq((1L, "a"), (2L, "b"), (3L, "c")))
    // time travel through the reader
    val v0 = spark.read.format("graft-table").option("path", root)
      .option("versionAsOf", "0").load()
    assert(v0.count() === 2)
    intercept[IllegalStateException] {
      Seq((9L, "x")).toDF("id", "k")
        .write.format("graft-table").option("path", root).mode("errorifexists").save()
    }
    // overwrite snapshots; ignore is a no-op on an existing table
    Seq((7L, "z")).toDF("id", "k")
      .write.format("graft-table").option("path", root).mode("overwrite").save()
    Seq((8L, "y")).toDF("id", "k")
      .write.format("graft-table").option("path", root).mode("ignore").save()
    assert(spark.read.format("graft-table").option("path", root).load()
      .as[(Long, String)].collect().toSeq === Seq((7L, "z")))
  }

  test("batch readChangeFeed returns the stored change rows of a version range") {
    val root = tmpDir("rel-cdf-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("enableChangeDataFeed" -> "true"))
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    t.append(Seq((3L, "c")).toDF("id", "k"))          // v1: insert 3
    t.delete(spark, "id = 1")                          // v2: delete 1
    val feed = spark.read.format("graft-table").option("path", root)
      .option("readChangeFeed", "true").option("startingVersion", "0").load()
    val rows = feed.selectExpr("id", "_change_type", "_commit_version")
      .as[(Long, String, Long)].collect().sorted.toSeq
    assert(rows === Seq((1L, "delete", 2L), (3L, "insert", 1L)))
    // endingVersion bounds the range; default is the head
    val toV1 = spark.read.format("graft-table").option("path", root)
      .option("readChangeFeed", "true")
      .option("startingVersion", "0").option("endingVersion", "1").load()
    assert(toV1.selectExpr("id", "_change_type").as[(Long, String)]
      .collect().toSeq === Seq((3L, "insert")))
  }

  test("SQL CREATE TABLE USING graft-table, SELECT, INSERT INTO/OVERWRITE") {
    val root = tmpDir("rel-") + "/t"
    Seq((1L, "F", 10.0), (2L, "O", 20.0), (3L, "F", 30.0)).toDF("id", "st", "amt")
      .write.format("graft-table").option("path", root).mode("overwrite").save()
    spark.sql(s"CREATE TABLE rel_sql USING `graft-table` OPTIONS (path '$root')")
    try {
      assert(spark.sql("SELECT sum(amt) FROM rel_sql WHERE st = 'F'")
        .head.getDouble(0) === 40.0)
      spark.sql("INSERT INTO rel_sql VALUES (4, 'O', 40.0)")
      assert(VersionedTable(root).latestVersion().contains(1L)) // appended
      assert(spark.sql("SELECT count(*) FROM rel_sql").head.getLong(0) === 4)
      spark.sql("INSERT OVERWRITE TABLE rel_sql VALUES (9, 'X', 90.0)")
      assert(spark.sql("SELECT * FROM rel_sql").count() === 1)
    } finally spark.sql("DROP TABLE rel_sql")
  }

  test("pushed range filters prune the file list via manifest stats") {
    val root = tmpDir("rel-") + "/t"
    val t = VersionedTable(root)
    // range-sorted commit → tight per-file id stats → skippable files
    t.commit(spark.range(0, 4000).selectExpr("id", "id % 7 AS v"),
      numPartitions = Some(8), sortBy = Seq("id"))
    val (_, kept, total) = t.readBounded(spark,
      Seq(("id", Some("100"), Some("150"))))
    assert(total === 8 && kept === 1) // the bound machinery the scan uses
    // through the reader: correct rows AND the scan's file-skip engaged
    val df = spark.read.format("graft-table").option("path", root).load()
      .filter("id >= 100 AND id <= 150")
    assert(df.count() === 51)
    assert(df.agg(org.apache.spark.sql.functions.sum("v")).head.getLong(0)
      === (100L to 150L).map(_ % 7).sum)
    // equality and IN shapes prune too
    val (_, k2, _) = t.readBounded(spark, Seq(("id", Some("42"), Some("42"))))
    assert(k2 === 1)
  }

  test("numeric IN and timestamp-boundary pushed filters never prune live files") {
    val root = tmpDir("rel-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 4000).selectExpr("id",
      "timestampadd(SECOND, CAST(id AS INT), timestamp'2024-01-01 00:00:00') AS ts"),
      numPartitions = Some(8), sortBy = Seq("id"))
    val df = spark.read.format("graft-table").option("path", root).load()
    // IN with values straddling files: a lexicographic min/max of
    // ("5", "3000") would bound [3000, 5] and prune EVERY file
    assert(df.filter("id IN (5, 3000)").count() === 2)
    // whole-second timestamp equality at a file's max: Timestamp.toString
    // renders a trailing ".0" the stats rendering omits, so the boundary
    // file would fail mx >= lo lexicographically and lose the row
    assert(df.filter("ts = timestamp'2024-01-01 00:08:19'").count() === 1)
    assert(df.filter("ts <= timestamp'2024-01-01 00:00:59'").count() === 60)
    assert(df.filter("ts >= timestamp'2024-01-01 01:06:39'").count() === 1)
    // and pruning still ENGAGES for well-rendered shapes (not just disabled)
    val (_, kIn, total) = t.readBounded(spark, Seq(("id", Some("5"), Some("5"))))
    assert(total === 8 && kIn === 1)
  }

  test("timestamp pruning renders filter values in the manifest's stats zone") {
    val root = tmpDir("rel-") + "/t"
    val t = VersionedTable(root)
    // 48 hourly rows in 4 ts-sorted files, written under the UTC session:
    // the manifest's ts stats are UTC renderings and statsZone records it
    t.commit(spark.range(0, 48).selectExpr("id",
      "timestampadd(HOUR, CAST(id AS INT), timestamp'2024-03-01 00:00:00') AS ts"),
      numPartitions = Some(4), sortBy = Seq("ts"))
    assert(t.statsZoneOf(0L).contains("UTC"))
    val before = spark.conf.get("spark.sql.session.timeZone")
    try {
      // a reader in a +05:30 zone: rendering the pushed value in the READ
      // session's zone would shift it past its file's recorded [min, max]
      // and silently drop the row — the scan must render in the RECORDED
      // zone (hour 10 sits in file 0 [0h, 11h]; shifted +5:30 it would
      // probe file 1 and prune file 0)
      spark.conf.set("spark.sql.session.timeZone", "Asia/Kolkata")
      assert(t.statsRenderZone(spark) === "UTC")
      val target = java.time.Instant.parse("2024-03-01T10:00:00Z")
      val df = spark.read.format("graft-table").option("path", root).load()
        .filter(org.apache.spark.sql.functions.col("ts")
          === org.apache.spark.sql.functions.lit(target))
      assert(df.count() === 1)
      // appending under the DIFFERENT zone may not mix renderings in one
      // manifest: the new manifest drops ts stats (no pruning — safe)
      // rather than carrying UTC strings under a Kolkata statsZone
      t.append(spark.range(48, 49).selectExpr("id",
        "timestampadd(HOUR, 48, timestamp'2024-03-01 00:00:00') AS ts"))
      assert(t.statsZoneOf(1L).contains("Asia/Kolkata"))
      val (_, keptTs, totalTs) = t.readBounded(spark,
        Seq(("ts", Some("2024-03-01 05:00:00"), Some("2024-03-01 06:00:00"))))
      assert(keptTs === totalTs, "ts stats must be absent after a zone mix")
      // id stats are zone-free and must still prune
      val (_, keptId, totalId) = t.readBounded(spark,
        Seq(("id", Some("1"), Some("1"))))
      assert(keptId < totalId)
    } finally spark.conf.set("spark.sql.session.timeZone", before)
  }

  test("OPTIMIZE regenerates stats under a renamed column") {
    val root = tmpDir("rel-ren-") + "/t"
    val t = VersionedTable(root)
    t.commit(spark.range(0, 4000).selectExpr("id AS k", "id % 7 AS v"),
      numPartitions = Some(8), sortBy = Seq("k"))
    t.renameColumn("k", "kk")
    // old files' stats are keyed by the OLD name: pruning on the new name
    // finds none and conservatively keeps everything (sound, not fast)
    val (_, keptBefore, totalBefore) = t.readBounded(spark,
      Seq(("kk", Some("100"), Some("150"))))
    assert(keptBefore === totalBefore && totalBefore === 8)
    // ... and the data still reads correctly by field id
    assert(t.read(spark).filter("kk BETWEEN 100 AND 150").count() === 51)
    // a compaction rewrite re-collects stats under the CURRENT name,
    // restoring pruning on the renamed column
    t.compact(spark, numFiles = 8, sortBy = Seq("kk"))
    val (_, keptAfter, totalAfter) = t.readBounded(spark,
      Seq(("kk", Some("100"), Some("150"))))
    assert(totalAfter === 8 && keptAfter === 1,
      s"post-OPTIMIZE stats must prune on the renamed column, kept $keptAfter")
    assert(t.read(spark).filter("kk BETWEEN 100 AND 150").count() === 51)
  }

  test("by-id reads are relation-scoped, not a shared session conf flip") {
    val key = "spark.sql.parquet.fieldId.read.enabled"
    val prev = spark.conf.getOption(key)
    // pin the SESSION conf off: the table's own file format must still
    // resolve renamed columns by field id, and reading the table must not
    // flip the session flag for unrelated parquet reads
    spark.conf.set(key, "false")
    try {
      val root = tmpDir("rel-") + "/t"
      val t = VersionedTable(root)
      t.commit(Seq((1L, 10.0), (2L, 20.0)).toDF("id", "amt"))
      t.renameColumn("amt", "amount")
      assert(t.read(spark).selectExpr("sum(amount)").head.getDouble(0) === 30.0,
        "rename resolution by field id must work with the session conf off")
      assert(spark.conf.get(key) === "false",
        "reading an id-tracked table must not mutate the session conf")
    } finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }

  test("reads apply deletion vectors and rewrites like any versioned read") {
    val root = tmpDir("rel-") + "/t"
    Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("id", "k")
      .write.format("graft-table").option("path", root).mode("overwrite").save()
    val t = VersionedTable(root)
    t.deleteMor(spark, "k = 'b'")
    assert(spark.read.format("graft-table").option("path", root).load()
      .as[(Long, String)].collect().sorted.toSeq === Seq((1L, "a"), (3L, "c")))
  }
}
