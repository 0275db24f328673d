package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Shallow clone ([[VersionedTable.cloneShallow]]) and timestamp time
  * travel ([[VersionedTable.resolveAsOfTimestamp]] + the reader's
  * `timestampAsOf` option). */
class CloneSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("clone is zero-copy, reads identically, and diverges independently") {
    val base = tmpDir("clone-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 1000).selectExpr("id AS k", "id % 7 AS v"),
      numPartitions = Some(4), sortBy = Seq("k"))
    src.deleteMor(spark, "k = 5") // a DV must carry into the clone
    val clone = src.cloneShallow(base + "/dst")
    assert(clone.read(spark).as[(Long, Long)].collect().sorted.toSeq
      === src.read(spark).as[(Long, Long)].collect().sorted.toSeq)
    // zero-copy: every cloned data file shares its source inode (hard link)
    val linked = java.nio.file.Files.walk(java.nio.file.Paths.get(base + "/dst/data"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path]).filter(_.toString.endsWith(".parquet"))
    assert(linked.nonEmpty)
    linked.foreach { p =>
      assert(java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] >= 2,
        s"$p is not hard-linked")
    }
    // divergence: a delete on the clone leaves the source untouched
    clone.delete(spark, "v = 0")
    assert(src.read(spark).count() === 999)
    assert(clone.read(spark).filter("v = 0").count() === 0)
    // ...and an append to the source leaves the clone untouched
    src.append(Seq((5000L, 1L)).toDF("k", "v"))
    assert(clone.read(spark).filter("k = 5000").count() === 0)
  }

  test("deep clone copies bytes — no shared inodes — and reads identically") {
    val base = tmpDir("clone-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 500).selectExpr("id AS k", "id % 3 AS v"),
      numPartitions = Some(2))
    src.deleteMor(spark, "k = 7") // the DV sidecar must byte-copy too
    val clone = src.cloneDeep(base + "/dst")
    assert(clone.read(spark).as[(Long, Long)].collect().sorted.toSeq
      === src.read(spark).as[(Long, Long)].collect().sorted.toSeq)
    // independent storage: every cloned file is its own inode (nlink = 1)
    val copied = java.nio.file.Files.walk(java.nio.file.Paths.get(base + "/dst"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path]).filter(_.toString.endsWith(".parquet"))
    assert(copied.nonEmpty)
    copied.foreach { p =>
      assert(java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] === 1,
        s"$p shares its inode with the source — deep clone must copy")
    }
    // divergence both ways, as for shallow
    clone.delete(spark, "v = 0")
    assert(src.read(spark).count() === 499)
    src.append(Seq((9000L, 1L)).toDF("k", "v"))
    assert(clone.read(spark).filter("k = 9000").count() === 0)
  }

  test("clone carries stats (skipping works), constraints, and properties") {
    val base = tmpDir("clone-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 4000).selectExpr("id", "id % 7 AS v"),
      numPartitions = Some(8), sortBy = Seq("id"))
    src.setProperties(Map("enableChangeDataFeed" -> "true"))
    val clone = src.cloneShallow(base + "/dst")
    val (_, kept, total) = clone.readBounded(spark, Seq(("id", Some("1"), Some("400"))))
    assert(total === 8 && kept === 1)
    assert(clone.cdfEnabled)
    // fresh history: the clone starts at version 0 with no txn marks
    assert(clone.versions() === Seq(0L))
    assert(clone.lastTxn("any").isEmpty)
  }

  test("clone copies column ids verbatim — a renamed source reads right") {
    val base = tmpDir("clone-ids-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 100).selectExpr("id", "id * 2 AS a", "id * 3 AS b"))
    // drop then rename: ids are no longer ordinal (a's id retired, b kept)
    src.dropColumn("a")
    src.renameColumn("b", "bb")
    val clone = src.cloneShallow(base + "/dst")
    // freshly minted ordinal ids would resolve the linked files' id-3
    // column ('b') under the wrong name — the copied ids must keep bb=3
    assert(clone.columnIdsOf(clone.resolve()) ===
      src.columnIdsOf(src.resolve()))
    assert(clone.maxColumnIdOf(clone.resolve()) ===
      src.maxColumnIdOf(src.resolve()))
    assert(clone.read(spark).selectExpr("sum(bb)").head.getLong(0) ===
      (0L until 100L).map(_ * 3).sum)
    // re-adding the dropped name on the CLONE must not resurrect: the
    // inherited high-water mark prevents re-minting the retired id
    clone.evolveSchema(Seq(org.apache.spark.sql.types.StructField(
      "a", org.apache.spark.sql.types.LongType, nullable = true)))
    assert(clone.read(spark).filter("a IS NOT NULL").count() === 0)
  }

  test("cloneSync transfers only the delta, carries DVs, and is idempotent") {
    val base = tmpDir("csync-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 2000).selectExpr("id AS k", "id % 7 AS v"),
      numPartitions = Some(4), sortBy = Seq("k"))
    src.cloneDeep(base + "/bak")
    val bak = VersionedTable(base + "/bak")
    // source moves: an append and a MOR delete (the DV must sync across)
    src.append(spark.range(2000, 3000).selectExpr("id AS k", "id % 7 AS v"),
      numPartitions = Some(2), sortBy = Seq("k"))
    src.deleteMor(spark, "k = 42")
    val (copied, refs) = src.cloneSync(base + "/bak")
    assert(copied > 0 && copied < refs,
      s"only the new append files + the DV should move ($copied of $refs)")
    assert(bak.read(spark).as[(Long, Long)].collect().sorted.toSeq ===
      src.read(spark).as[(Long, Long)].collect().sorted.toSeq)
    assert(bak.read(spark).filter("k = 42").count() === 0)
    // idempotent: a current target burns no version and moves no bytes
    val head = bak.latestVersion().get
    assert(src.cloneSync(base + "/bak") === ((0, refs)))
    assert(bak.latestVersion().contains(head))
    // a property change alone still mirrors through the no-op sync path
    // (heals a crash between a prior sync's publish and its props commit)
    src.setProperties(Map("pii" -> "scrubbed"))
    src.cloneSync(base + "/bak")
    assert(bak.latestVersion().contains(head) &&
      bak.properties.get("pii").contains("scrubbed"))
  }

  test("cloneSync publishes on METADATA-ONLY drift and mirrors properties " +
      "authoritatively (removals included)") {
    val base = tmpDir("csync-md-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 100).selectExpr("id AS k", "id % 3 AS g"),
      numPartitions = Some(2))
    src.cloneDeep(base + "/bak")
    val bak = VersionedTable(base + "/bak")
    // a constraint added with ZERO data churn: files/DVs/schema all equal,
    // but a restore from a backup missing it would admit rows the source's
    // CHECK rejects — the sync must publish a target version
    src.addConstraint(spark, "k_pos", "k >= 0")
    val head0 = bak.latestVersion().get
    val (moved, _) = src.cloneSync(base + "/bak")
    assert(moved === 0, "a metadata-only sync moves no bytes")
    assert(bak.latestVersion().get > head0, "constraint drift must publish")
    assert(bak.constraintsOf(bak.resolve()) === Map("k_pos" -> "k >= 0"))
    // partition-spec evolution alone must publish too
    src.alterPartitioning(Seq("g"))
    src.cloneSync(base + "/bak")
    assert(bak.partitionByOf(bak.resolve()) === Seq("g"))
    // back-to-back: no drift, no version burned
    val head1 = bak.latestVersion().get
    src.cloneSync(base + "/bak")
    assert(bak.latestVersion().contains(head1))
    // property REMOVALS mirror: a flag dropped on the source must not
    // persist on the backup forever
    src.setProperties(Map("appendOnly" -> "true"))
    src.cloneSync(base + "/bak")
    assert(bak.properties.get("appendOnly").contains("true"))
    src.setProperties(Map("appendOnly" -> "")) // empty value removes the key
    src.cloneSync(base + "/bak")
    assert(!bak.properties.contains("appendOnly"),
      "a property removed on the source must leave the backup on sync")
    assert(bak.properties.get("cloneSource").isDefined,
      "the provenance property must survive authoritative mirroring")
  }

  test("clone VERSION AS OF pins a historical snapshot as a new table") {
    val base = tmpDir("clone-v-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 50).selectExpr("id AS k"))           // v0
    src.addConstraint(spark, "k_small", "k < 1000")                // v1
    src.append(spark.range(50, 100).selectExpr("id AS k"))         // v2
    src.delete(spark, "k < 10")                                    // v3
    // Scala API: the clone reproduces v2's rows AND v2's metadata
    val bak = src.cloneDeep(base + "/bak", versionAsOf = Some(2L))
    assert(bak.read(spark).count() === 100,
      "the v2 snapshot predates the delete")
    assert(bak.constraintsOf(bak.resolve()) === Map("k_small" -> "k < 1000"))
    // the clone is a NEW table: its own history starts at version 0
    assert(bak.latestVersion().contains(0L) ||
      bak.resolve() <= 1L) // one props commit may follow the publish
    // SQL spelling, shallow mode, pinned to the pre-constraint v0
    TableSql.run(spark,
      s"CREATE TABLE '${base + "/bak0"}' SHALLOW CLONE '${base + "/src"}' " +
        "VERSION AS OF 0")
    val bak0 = VersionedTable(base + "/bak0")
    assert(bak0.read(spark).count() === 50)
    assert(bak0.constraintsOf(bak0.resolve()).isEmpty)
    // unpinned SQL clone still takes the head
    TableSql.run(spark,
      s"CREATE TABLE '${base + "/bakh"}' DEEP CLONE '${base + "/src"}'")
    assert(VersionedTable(base + "/bakh").read(spark).count() === 90)
  }

  test("cloneSync shallow mode hard-links the delta instead of copying") {
    val base = tmpDir("csync-ln-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 500).selectExpr("id AS k"), numPartitions = Some(2))
    src.cloneShallow(base + "/bak")
    src.append(spark.range(500, 900).selectExpr("id AS k"), numPartitions = Some(2))
    val (copied, _) = src.cloneSync(base + "/bak", deep = false)
    assert(copied === 2)
    val files = java.nio.file.Files.walk(java.nio.file.Paths.get(base + "/bak/data"))
      .toArray.map(_.asInstanceOf[java.nio.file.Path])
      .filter(_.toString.endsWith(".parquet"))
    files.foreach { p =>
      assert(java.nio.file.Files.getAttribute(p, "unix:nlink").asInstanceOf[Int] >= 2,
        s"$p should be a hard link in shallow sync mode")
    }
    assert(VersionedTable(base + "/bak").read(spark).count() === 900)
  }

  test("cloneSync mirrors schema evolution — renamed source reads right on the backup") {
    val base = tmpDir("csync-ids-")
    val src = VersionedTable(base + "/src")
    src.commit(spark.range(0, 100).selectExpr("id", "id * 3 AS b"))
    src.cloneDeep(base + "/bak")
    src.renameColumn("b", "bb")
    src.append(spark.range(100, 200).selectExpr("id", "id * 3 AS bb"))
    src.cloneSync(base + "/bak")
    val bak = VersionedTable(base + "/bak")
    assert(bak.columnIdsOf(bak.resolve()) === src.columnIdsOf(src.resolve()))
    assert(bak.read(spark).selectExpr("sum(bb)").head.getLong(0) ===
      (0L until 200L).map(_ * 3).sum)
  }

  test("cloneSync refuses a target it did not create") {
    val base = tmpDir("csync-guard-")
    val src = VersionedTable(base + "/src")
    src.commit(Seq((1L, 1L)).toDF("k", "v"))
    // an unrelated table at the target path
    val other = VersionedTable(base + "/other")
    other.commit(Seq((9L, 9L)).toDF("k", "v"))
    intercept[IllegalArgumentException] { src.cloneSync(base + "/other") }
    // an empty path was never cloned either
    intercept[IllegalArgumentException] { src.cloneSync(base + "/nowhere") }
  }

  test("cloning onto an existing table is refused") {
    val base = tmpDir("clone-")
    val src = VersionedTable(base + "/src")
    src.commit(Seq((1L, 1L)).toDF("k", "v"))
    src.cloneShallow(base + "/dst")
    intercept[IllegalArgumentException] { src.cloneShallow(base + "/dst") }
  }

  test("timestampAsOf resolves to the newest commit at or before the instant") {
    val base = tmpDir("ts-")
    val t = VersionedTable(base + "/t")
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    Thread.sleep(15)
    val between = System.currentTimeMillis()
    Thread.sleep(15)
    t.append(Seq((2L, "b")).toDF("id", "k"))
    assert(t.resolveAsOfTimestamp(between) === 0L)
    assert(t.resolveAsOfTimestamp(System.currentTimeMillis()) === 1L)
    intercept[IllegalArgumentException] { t.resolveAsOfTimestamp(1000L) } // pre-history
    // through the reader option (epoch-millis form)
    val v0 = spark.read.format("graft-table").option("path", base + "/t")
      .option("timestampAsOf", between.toString).load()
    assert(v0.count() === 1)
  }
}
