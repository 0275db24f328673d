package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The per-file Bloom sidecar (`bloomIndexColumns` table property): built
  * at the write funnel, probed by merge file-pruning and equality-bounded
  * reads. The scenario min-max stats CANNOT serve: a high-cardinality key
  * whose values are uniform across files — every file's [min, max] spans
  * the whole domain, so range pruning keeps everything; the Bloom filter
  * knows which file actually holds a key. */
class BloomIndexSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** 8 files, each a round-robin (uniform) sample of the key domain:
    * every file's range covers every key, the worst case for min-max. */
  private def uniformTable(root: String, indexed: Boolean): VersionedTable = {
    val t = VersionedTable(root)
    if (indexed) t.setProperties(Map("bloomIndexColumns" -> "k",
      "bloomIndexExpectedItems" -> "2000", "bloomIndexFpp" -> "0.01"))
    t.commit(spark.range(0, 8000).selectExpr("id * 37 % 8000 AS k", "id AS v"),
      numPartitions = Some(8))
    t
  }

  test("point-lookup merge prunes files via the Bloom sidecar where ranges cannot") {
    val base = tmpDir("bloom-")
    val control = uniformTable(base + "/plain", indexed = false)
    val (_, touchedAll) = control.mergeCow(spark,
      spark.sql("SELECT 1234L AS k, -1L AS v"),
      condition = "source.k = target.k", targetKey = "k", sourceKey = "k",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    assert(touchedAll === 8, "uniform keys defeat min-max pruning entirely")

    val t = uniformTable(base + "/t", indexed = true)
    // the sidecar landed next to the commit
    assert(Files.isDirectory(Paths.get(base, "t", "bloom")))
    val (_, touched) = t.mergeCow(spark,
      spark.sql("SELECT 1234L AS k, -1L AS v"),
      condition = "source.k = target.k", targetKey = "k", sourceKey = "k",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    // the key lives in one file; 1% fpp may pass the odd extra file but
    // never most of them — and the merge result is still exact
    assert(touched >= 1 && touched <= 3,
      s"bloom should prune ~7 of 8 files, touched $touched")
    assert(t.read(spark).filter("k = 1234").select("v").as[Long].head() === -1L)
    assert(t.read(spark).count() === 8000)

    // equality-bounded read probes the sidecar too (file-skip observable)
    val (df, kept, total) = t.readBounded(spark,
      Seq(("k", Some("1234"), Some("1234"))))
    assert(total === 8 && kept <= 3 && kept >= 1)
    assert(df.filter("k = 1234").count() === 1)
    // a range bound (not a point) does not probe blooms and keeps all
    val (_, keptRange, _) = t.readBounded(spark,
      Seq(("k", Some("10"), Some("7990"))))
    assert(keptRange === 8)
  }

  test("a Bloom-indexed NESTED leaf builds and probes like a top-level key") {
    // the nested-stats convention extended to sidecars: `bloomIndexColumns`
    // may name a struct leaf by DOTTED path (leafType's collision rule —
    // exact top-level first, then the struct walk); build hashes the leaf,
    // probes resolve the leaf type, and the prune fires on the same
    // uniform-key shape min-max cannot serve
    val root = tmpDir("bloom-nested-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("bloomIndexColumns" -> "meta.media_id",
      "bloomIndexExpectedItems" -> "2000", "bloomIndexFpp" -> "0.01"))
    t.commit(spark.range(0, 8000).selectExpr(
      "named_struct('media_id', id * 37 % 8000, 'format', 'png') AS meta",
      "id AS v"),
      numPartitions = Some(8))
    assert(Files.isDirectory(Paths.get(root, "bloom")),
      "the nested-leaf sidecar must have been built")
    // equality-bounded read probes the sidecar under the dotted name
    val (df, kept, total) = t.readBounded(spark,
      Seq(("meta.media_id", Some("1234"), Some("1234"))))
    assert(total === 8 && kept >= 1 && kept <= 3,
      s"nested bloom should prune ~7 of 8 files, kept $kept")
    assert(df.filter("meta.media_id = 1234").count() === 1)
    // point-lookup read face on the dotted name
    val (dfK, keptK, totalK) = t.readByKeys(spark, "meta.media_id", Seq("1234"))
    assert(totalK === 8 && keptK >= 1 && keptK <= 3)
    assert(dfK.filter("meta.media_id = 1234").count() === 1)
    // an unresolvable indexed name (array path / missing leaf) is skipped
    // at build AND probe — never a crash, never a wrong prune
    val u = VersionedTable(tmpDir("bloom-nested-u-") + "/t")
    u.setProperties(Map("bloomIndexColumns" -> "meta.missing,tags.element"))
    u.commit(spark.range(0, 100).selectExpr(
      "named_struct('media_id', id) AS meta", "array('a') AS tags", "id AS v"))
    assert(u.read(spark).count() === 100)
    val (_, keptU, totalU) = u.readBounded(spark,
      Seq(("meta.missing", Some("5"), Some("5"))))
    assert(keptU === totalU, "an unindexed miss must keep every candidate")
  }

  test("readByKeys: per-key stats skip on sorted layouts, bloom on uniform ones") {
    val base = tmpDir("bloom-rbk-")
    // sorted: per-KEY stats keep ~1 file per key; the range HULL would keep all
    val s = VersionedTable(base + "/sorted")
    s.commit(spark.range(0, 8000).selectExpr("id AS k", "id % 5 AS v"),
      numPartitions = Some(8), sortBy = Seq("k"))
    val (dfS, keptS, totalS) = s.readByKeys(spark, "k", Seq("3", "7999"))
    assert(totalS === 8 && keptS === 2)
    assert(dfS.filter("k IN (3, 7999)").count() === 2)
    // uniform: stats cannot skip, the sidecar can
    val t = uniformTable(base + "/t", indexed = true)
    val (dfT, keptT, totalT) = t.readByKeys(spark, "k", Seq("1234"))
    assert(totalT === 8 && keptT >= 1 && keptT <= 3)
    assert(dfT.filter("k = 1234").count() === 1)
    // uniform + unindexed: both passes conservative — keeps all, still exact
    val plain = uniformTable(base + "/plain", indexed = false)
    val (dfP, keptP, _) = plain.readByKeys(spark, "k", Seq("1234"))
    assert(keptP === 8 && dfP.filter("k = 1234").count() === 1)
    // an absent key on the sorted table keeps only its range file; the
    // residual filter then serves zero rows (out-of-domain: zero files)
    val (dfNone, keptNone, _) = s.readByKeys(spark, "k", Seq("900000"))
    assert(keptNone === 0 && dfNone.count() === 0)
    // a DV-deleted row is not served even when its file is kept
    s.deleteMor(spark, "k = 3")
    val (dfDv, _, _) = s.readByKeys(spark, "k", Seq("3"))
    assert(dfDv.filter("k = 3").count() === 0)
  }

  test("IN-list point lookups probe the sidecar per member value") {
    val t = uniformTable(tmpDir("bloom-in-") + "/t", indexed = true)
    // the bounds channel would collapse IN (3, 7005) to the range
    // [3, 7005] — which covers every file's span and prunes nothing; the
    // exact-value channel probes each member's hash against the filters
    val (df, kept, total) = t.readBounded(spark,
      Seq(("k", Some("3"), Some("7005"))),
      exactValues = Seq(("k", Seq("3", "7005"))))
    assert(total === 8 && kept <= 4 && kept >= 1,
      s"two keys live in at most two files, kept $kept")
    assert(df.filter("k IN (3, 7005)").count() === 2)
    // the same lookup through the SQL front door (pushed In filter on the
    // graft-table relation) returns exact rows
    val reader = spark.read.format("graft-table")
      .option("path", t.root).load()
    assert(reader.filter("k IN (3, 7005)").count() === 2)
    assert(reader.count() === 8000)
  }

  test("bloom prune never drops a live key (every key of one file found)") {
    val t = uniformTable(tmpDir("bloom-all-") + "/t", indexed = true)
    // merge a batch touching MANY keys spread over all files: nothing lost
    val src = spark.range(0, 200).selectExpr("id * 41 % 8000 AS k", "0L - id AS v")
    val (_, touched) = t.mergeCow(spark, src,
      condition = "source.k = target.k", targetKey = "k", sourceKey = "k",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    assert(touched === 8, "200 uniform keys hit every file")
    val updated = t.read(spark).filter("v <= 0").count()
    assert(updated === 200)
  }

  test("COW delete/update point lookups prune their scan input via the sidecar") {
    val base = tmpDir("bloom-cow-")
    val t = uniformTable(base + "/t", indexed = true)
    // the touched-file COUNT is row-exact either way (the verbs row-scan);
    // what the sidecar narrows is the SCAN INPUT — assert the candidate
    // list the predicate pass plans (range stats alone keep all 8: every
    // file's [min, max] spans the key domain)
    val v = t.resolve()
    val files = t.read(spark).inputFiles
      .map(f => f.substring(f.indexOf("data/"))).toSeq
    assert(files.size === 8)
    val candEq = t.bloomPruneForPredicate(spark, v, files, "k = 1234")
    assert(candEq.size >= 1 && candEq.size <= 3,
      s"equality probe should confine the scan, planned ${candEq.size}")
    val (_, delTouched) = t.delete(spark, "k = 1234")
    assert(delTouched === 1 && t.read(spark).count() === 7999)
    val (_, updTouched) = t.update(spark, "k IN (7, 4321)", Map("v" -> "-1"))
    assert(updTouched >= 1 && updTouched <= 2)
    assert(t.read(spark).filter("v = -1").count() === 2)
    // MOR delete probes too (tombstones only matching files' rows)
    val (_, tombs) = t.deleteMor(spark, "k = 999")
    assert(tombs === 1L)
    assert(t.read(spark).count() === 7998)
  }

  test("a larger-than-cap key set skips the Bloom pass; the plan equals the range pass") {
    val root = tmpDir("bloom-cap-") + "/t"
    val t = VersionedTable(root)
    t.setProperties(Map("bloomIndexColumns" -> "k",
      "bloomIndexExpectedItems" -> "2000", "bloomIndexFpp" -> "0.01",
      "bloomProbeMaxKeys" -> "2")) // tiny cap to exercise the skip
    t.commit(spark.range(0, 8000).selectExpr("id * 37 % 8000 AS k", "id AS v"),
      numPartitions = Some(8))
    // under the cap the sidecar prunes (a single-key probe confines the scan)
    val files = t.read(spark).inputFiles
      .map(f => f.substring(f.indexOf("data/"))).toSeq
    assert(files.size === 8)
    val under = t.bloomPruneForPredicate(spark, t.resolve(), files, "k = 1234")
    assert(under.size < files.size, "a single-key probe is under the cap and prunes")
    // 3 point values > cap 2: the probe is skipped, the plan equals the
    // (range) candidate list unchanged
    assert(t.bloomPruneForPredicate(spark, t.resolve(), files,
      "k IN (1234, 777, 4321)") === files)
    // and a larger-than-cap merge still completes exactly, sidecar ignored:
    // range stats alone keep all 8 uniform files (the cap bounds DRIVER
    // memory, never correctness)
    val src = Seq(1234L, 777L, 4321L).toDF("k").selectExpr("k", "-1L AS v")
    val (_, touched) = t.mergeCow(spark, src,
      condition = "source.k = target.k", targetKey = "k", sourceKey = "k",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    assert(touched === 8,
      s"above the cap the Bloom prune must not run (range pass keeps all 8), touched $touched")
    assert(t.read(spark).filter("v = -1").count() === 3)
  }

  test("cross-category probes are skipped (string literal vs numeric column)") {
    val t = uniformTable(tmpDir("bloom-cat-") + "/t", indexed = true)
    val v = t.resolve()
    val files = t.read(spark).inputFiles
      .map(f => f.substring(f.indexOf("data/"))).toSeq
    // a STRING literal against the BIGINT column must not probe (hashing a
    // canonical re-rendering can miss numerically-equal values like '20.0')
    assert(t.bloomPruneForPredicate(spark, v, files, "k = '1234'") === files)
    // the same-category probe still prunes
    assert(t.bloomPruneForPredicate(spark, v, files, "k = 1234").size < files.size)
  }

  test("vacuum retires a sidecar with its commit") {
    val root = tmpDir("bloom-vac-") + "/t"
    val t = uniformTable(root, indexed = true)
    val before = Files.list(Paths.get(root, "bloom")).count()
    assert(before === 1)
    t.commit(spark.range(0, 100).selectExpr("id AS k", "id AS v")) // overwrite
    t.vacuum(retainVersions = 1)
    // old commit's files AND its sidecar are gone; the new commit's remains
    assert(Files.list(Paths.get(root, "bloom")).count() === 1)
    // reads still work and the new commit's own sidecar keeps serving
    val (df, kept, total) = t.readBounded(spark, Seq(("k", Some("5"), Some("5"))))
    assert(t.read(spark).count() === 100 && kept >= 1 && kept <= total)
    assert(df.filter("k = 5").count() === 1)
  }
}
