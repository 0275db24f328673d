package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** Manifest checkpointing: head state as distributed-readable parquet plus
  * accumulated txn marks, bounding driver JSON cost as version and file
  * counts grow (the Delta-checkpoint analogue). */
class CheckpointSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("a 1k-version table serves head ops from the checkpoint after the " +
      "older JSON manifests are gone") {
    val root = tmpDir("ckpt-")
    val t = VersionedTable(root)
    t.commit(Seq((1, "a"), (2, "b")).toDF("id", "k"), txn = Some("app://x" -> 7L))
    // 1000 metadata-only versions (constraint add/drop pairs publish pure
    // JSON — no Spark jobs), the cheap way to a deep manifest chain
    (1 to 500).foreach { i =>
      t.addConstraint(spark, s"c$i", "id > 0")
      t.dropConstraint(s"c$i")
    }
    assert(t.latestVersion().contains(1000L))
    t.checkpoint(spark)
    assert(t.checkpointVersions() === Seq(1000L))
    // simulate the deep history becoming unreadable (vacuumed to cold
    // storage): physically move every manifest but the newest away — any
    // code path still touching them now fails loudly
    val graveyard = Files.createDirectories(Paths.get(root, "_gone"))
    (0L to 998L).foreach { v =>
      val m = Paths.get(root, "_graft_log", f"v$v%08d.json")
      Files.move(m, graveyard.resolve(m.getFileName))
    }
    // head resolution + read: the head manifest is self-contained
    assert(t.latestVersion().contains(1000L))
    assert(t.read(spark).as[(Int, String)].collect().sorted.toSeq ===
      Seq((1, "a"), (2, "b")))
    // the v0 txn mark is ONLY recoverable via the checkpoint now (its
    // manifest is gone and no vacuum ever fed the sidecar) — without the
    // checkpoint floor this lookup would have walked 999 dead JSONs
    assert(t.lastTxn("app://x") === Some(7L))
    assert(t.lastTxn("app://absent").isEmpty)
  }

  test("checkpointFiles exposes the live references as a queryable DataFrame") {
    val t = VersionedTable(tmpDir("ckpt-"))
    // CDF capture is opt-in; this test asserts cdf refs ride the checkpoint
    t.setProperties(Map("enableChangeDataFeed" -> "true"))
    // partition O holds two rows: the MOR delete stays PARTIAL (a sole-row
    // file would correctly drop whole, leaving no DV to checkpoint)
    t.commit(Seq((1L, "F", 1.0), (2L, "O", 2.0), (3L, "O", 3.0))
      .toDF("id", "s", "amt").coalesce(1), partitionBy = Seq("s"))
    t.deleteMor(spark, "id = 2")
    t.checkpoint(spark)
    val ck = t.checkpointFiles(spark)
    assert(ck.columns.toSet === Set("path", "kind", "partitions", "stats"))
    val byKind = ck.groupBy("kind").count().as[(String, Long)].collect().toMap
    assert(byKind("data") >= 2L) // one file per partition at least
    assert(byKind("dv") === 1L)
    assert(byKind("cdf") === 1L)
    // partition values ride the checkpoint rows
    val parts = ck.filter("kind = 'data'")
      .selectExpr("partitions['s']").as[String].collect().toSet
    assert(parts === Set("F", "O"))
  }

  test("checkpoint is idempotent at a head and retires old checkpoints") {
    val t = VersionedTable(tmpDir("ckpt-"))
    t.commit(Seq(1).toDF("x"))
    assert(t.checkpoint(spark) === 0L)
    assert(t.checkpoint(spark) === 0L) // same head: no-op
    assert(t.checkpointVersions() === Seq(0L))
    (1 to 3).foreach { i =>
      t.append(Seq(i).toDF("x"))
      t.checkpoint(spark)
    }
    // only a short tail survives
    assert(t.checkpointVersions() === Seq(2L, 3L))
  }

  test("merge planning at a checkpointed head prunes exactly like the " +
      "manifest path") {
    // two identical range-sorted tables (4 files, disjoint id ranges); one
    // gets a checkpoint at its head, so its merge plans from the checkpoint
    // parquet instead of the driver-parsed manifest stats — same touched
    // count, same result
    val data = spark.range(0, 400).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val src = Seq((7L, -7.0), (13L, -13.0), (777L, 1.0)).toDF("k", "v")
    def merge(t: VersionedTable): (Long, Int) =
      t.mergeCow(spark, src, "source.k = target.k", "k", "k",
        Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))), None,
        Some(Merge.NotMatchedInsert(None, Map.empty)))
    val plain = VersionedTable(tmpDir("ckpt-mrg-") + "/plain")
    val ckptd = VersionedTable(tmpDir("ckpt-mrg-") + "/ckptd")
    Seq(plain, ckptd).foreach(_.commit(data, numPartitions = Some(4), sortBy = Seq("k")))
    ckptd.checkpoint(spark)
    assert(ckptd.checkpointVersions().lastOption === ckptd.latestVersion())
    val (_, touchedPlain) = merge(plain)
    val (_, touchedCkpt) = merge(ckptd)
    // keys 7 and 13 both land in the first 100-key file: 1 of 4 touched
    assert(touchedPlain === 1)
    assert(touchedCkpt === touchedPlain)
    val expect = plain.read(spark).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(ckptd.read(spark).as[(Long, Double)].collect().sortBy(_._1).toSeq === expect)
    assert(expect.filter(r => Set(7L, 13L, 777L)(r._1)).map(_._2) ===
      Seq(-7.0, -13.0, 1.0))
  }

  test("delete/update/replaceWhere at a checkpointed head plan from the " +
      "checkpoint parquet and match the manifest path exactly") {
    val data = spark.range(0, 400).selectExpr("id AS k", "CAST(id AS DOUBLE) AS v")
    val plain = VersionedTable(tmpDir("ckpt-rw-") + "/plain")
    val ckptd = VersionedTable(tmpDir("ckpt-rw-") + "/ckptd")
    Seq(plain, ckptd).foreach(_.commit(data, numPartitions = Some(4), sortBy = Seq("k")))
    ckptd.checkpoint(spark)
    // the planner derives bounds from the predicate and evaluates them
    // against the checkpoint's stats rows: `k = 7` lands in exactly the
    // first 100-key file — the same single file the manifest stats name
    val headV = ckptd.resolve()
    val planned = ckptd.checkpointPlanCandidates(spark, headV, "k = 7")
    assert(planned.isDefined && planned.get.size === 1)
    val rangePlanned = ckptd.checkpointPlanCandidates(spark, headV,
      "k >= 150 AND k < 250 AND v >= 0.0")
    assert(rangePlanned.isDefined && rangePlanned.get.size === 2,
      "a [150, 250) range spans exactly the 2nd and 3rd of 4 range-sorted files")
    // no derivable bound → None (callers fall back to the full list)
    assert(ckptd.checkpointPlanCandidates(spark, headV, "k % 2 = 0").isEmpty)
    // an un-checkpointed head → None
    assert(plain.checkpointPlanCandidates(spark, plain.resolve(), "k = 7").isEmpty)

    // all three verbs: identical touched counts and results on both paths
    // (re-checkpointing before each verb so every one of them plans from
    // the checkpoint — a rewrite moves the head past the last checkpoint)
    def run(t: VersionedTable, ckpt: Boolean): Seq[Int] = {
      if (ckpt) t.checkpoint(spark)
      val (_, d) = t.delete(spark, "k >= 390")
      if (ckpt) t.checkpoint(spark)
      val (_, u) = t.update(spark, "k = 7", Map("v" -> "-7.0"))
      if (ckpt) t.checkpoint(spark)
      val (_, r) = t.replaceWhere(
        spark.range(100, 200).selectExpr("id AS k", "0.0 - id AS v"),
        "k >= 100 AND k < 200")
      Seq(d, u, r)
    }
    val touchedCkpt = run(ckptd, ckpt = true)
    val touchedPlain = run(plain, ckpt = false)
    assert(touchedCkpt === touchedPlain)
    assert(touchedCkpt === Seq(1, 1, 1),
      "each predicate confines to one of the 4 range-sorted files")
    val expect = plain.read(spark).as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(ckptd.read(spark).as[(Long, Double)].collect().sortBy(_._1).toSeq === expect)
    assert(expect.size === 390 && expect.count(_._2 < 0) === 100 + 1)
  }

  test("cross-category predicates derive no checkpoint bounds " +
      "(numeric literal vs string column)") {
    val t = VersionedTable(tmpDir("ckpt-cat-") + "/t")
    t.commit(Seq(("100", 1L), ("300", 2L)).toDF("s", "v"),
      numPartitions = Some(2), sortBy = Seq("s"))
    t.checkpoint(spark)
    val headV = t.resolve()
    // SQL coerces `s > 20` to a DOUBLE comparison, but the recorded min/max
    // are strings: '100' < '20' LEXICOGRAPHICALLY, so deriving a string
    // bound would wrongly prune the file holding '100'. No bound derives.
    assert(t.checkpointPlanCandidates(spark, headV, "s > 20").isEmpty)
    // the same-category bound still derives and prunes
    val samecat = t.checkpointPlanCandidates(spark, headV, "s > '20'")
    assert(samecat.isDefined && samecat.get.size === 1)
    // and the checkpoint-planned delete is row-exact: both rows match
    val (_, touched) = t.delete(spark, "s > 20")
    assert(touched === 2, "both string rows compare > 20 numerically")
    assert(t.read(spark).count() === 0)
  }

  test("temporal predicates derive ZONE-SAFE checkpoint bounds " +
      "(stats rendered in another session zone)") {
    val t = VersionedTable(tmpDir("ckpt-ts-") + "/t")
    val prior = spark.conf.get("spark.sql.session.timeZone")
    // write (and render stats) under Los Angeles; plan under the restored
    // session zone — the planner must render the filter value in the
    // RECORDED stats zone or the lexicographic comparison misprunes
    spark.conf.set("spark.sql.session.timeZone", "America/Los_Angeles")
    try {
      val data = spark.range(0, 400).selectExpr("id AS k",
        "timestamp_seconds(1600000000 + id * 3600) AS ts")
      t.commit(data, numPartitions = Some(4), sortBy = Seq("ts"))
      t.checkpoint(spark)
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
    assert(t.statsZoneOf(t.resolve()).contains("America/Los_Angeles"))
    val headV = t.resolve()
    // 4 range-sorted files of 100 hourly rows; the cut falls inside file 0
    val planned = t.checkpointPlanCandidates(spark, headV,
      "ts < TIMESTAMP '2020-09-17 16:00:00'")
    assert(planned.isDefined && planned.get.size === 1,
      s"expected exactly file 0, got $planned")
    // the string-literal form parses with Spark's cast semantics and plans
    // the same single file
    val asString = t.checkpointPlanCandidates(spark, headV,
      "ts < '2020-09-17 16:00:00'")
    assert(asString === planned)
    // and the checkpoint-planned delete is row-exact: 100 rows in 1 file
    val (_, touched) = t.delete(spark, "ts < TIMESTAMP '2020-09-17 16:00:00'")
    assert(touched === 1)
    assert(t.read(spark).count() === 300)
  }

  test("tier-1 whole-file proof plans distributed from the checkpoint and " +
      "matches the manifest path exactly, legacy-epoch files included") {
    val t = VersionedTable(tmpDir("ckpt-t1-"))
    val rows = spark.range(0, 40)
      .selectExpr("id AS k", "CAST(id % 4 AS STRING) AS day")
    // pre-evolution epoch first: that file has NO recorded day value, so
    // the proof must route it to the row-scan pool on BOTH paths
    t.commit(rows.filter("k < 10"), numPartitions = Some(1))
    t.alterPartitioning(Seq("day"))
    t.append(rows.filter("k >= 10"), numPartitions = Some(1))
    val v = t.resolve()
    // same table, same head: manifest path before the checkpoint exists,
    // checkpoint-planned path after — the classifications must be equal
    val manifest = t.partitionWholeFileDrops(spark, v, "day = '2'")
    t.checkpoint(spark)
    val planned = t.partitionWholeFileDrops(spark, v, "day = '2'")
    assert(manifest.isDefined && planned.isDefined)
    assert(planned.get._1.toSet === manifest.get._1.toSet,
      "proven whole-drops diverge between the planned and manifest paths")
    assert(planned.get._2.toSet === manifest.get._2.toSet,
      "scan-pool fallbacks diverge between the planned and manifest paths")
    assert(planned.get._1.nonEmpty, "the day=2 partition file must prove whole")
    assert(planned.get._2.nonEmpty, "the legacy-epoch file must fall to the scan")
    // guards hold on the planned path too: nondeterministic and
    // data-column predicates refuse the tier-1 proof outright
    assert(t.partitionWholeFileDrops(spark, v, "rand() < 0.5").isEmpty)
    assert(t.partitionWholeFileDrops(spark, v, "k = 7").isEmpty)
    // and the verb end-to-end: the planned proof feeds the same delete
    val (_, removed) = t.delete(spark, "day = '2'")
    assert(removed >= 1)
    assert(t.read(spark).filter("day = '2'").count() === 0)
    assert(t.read(spark).count() === 30)
  }

  test("txn marks ratchet across chained checkpoints") {
    val t = VersionedTable(tmpDir("ckpt-"))
    t.commit(Seq(1).toDF("x"), txn = Some("a" -> 1L))
    t.checkpoint(spark)
    t.append(Seq(2).toDF("x"), txn = Some("b" -> 5L))
    t.append(Seq(3).toDF("x"), txn = Some("a" -> 2L))
    t.checkpoint(spark)
    // second checkpoint folded the first's marks plus the tail's
    val graveyard = Files.createDirectories(Paths.get(t.root, "_gone"))
    (0L to 1L).foreach { v =>
      Files.move(Paths.get(t.root, "_graft_log", f"v$v%08d.json"),
        graveyard.resolve(f"v$v%08d.json"))
    }
    assert(t.lastTxn("a") === Some(2L))
    assert(t.lastTxn("b") === Some(5L))
  }
}
