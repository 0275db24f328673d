package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class VersionedTableSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  test("commit assigns consecutive versions; reads resolve latest / relative / absolute") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    assert(t.latestVersion().isEmpty)
    assert(t.commit(Seq(1, 2, 3).toDF("x")) === 0L)
    assert(t.commit(Seq(4, 5).toDF("x")) === 1L)
    assert(t.commit(Seq(6).toDF("x")) === 2L)
    assert(t.versions() === Seq(0L, 1L, 2L))
    assert(t.read(spark).as[Int].collect().sorted.toSeq === Seq(6))
    assert(t.read(spark, relativeVersion = Some(-1)).as[Int].collect().sorted.toSeq === Seq(4, 5))
    assert(t.read(spark, relativeVersion = Some(-2)).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
    assert(t.read(spark, versionAsOf = Some(0L)).as[Int].collect().sorted.toSeq === Seq(1, 2, 3))
  }

  test("old versions are immutable across later commits (snapshot isolation)") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq("a").toDF("s"))
    val v0 = t.read(spark, versionAsOf = Some(0L)).as[String].collect().toSeq
    t.commit(Seq("b", "c").toDF("s"))
    assert(t.read(spark, versionAsOf = Some(0L)).as[String].collect().toSeq === v0)
  }

  test("relativeVersion past version 0 and positive values are rejected") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1).toDF("x"))
    assertThrows[IllegalArgumentException](t.resolve(relativeVersion = Some(-1)))
    assertThrows[IllegalArgumentException](t.resolve(relativeVersion = Some(1)))
    assertThrows[IllegalArgumentException](t.resolve(versionAsOf = Some(7L)))
  }

  test("a vacuumed version fails relativeVersion resolve with a clear error") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    (1 to 4).foreach(i => t.commit(Seq(i).toDF("x")))
    t.vacuum(retainVersions = 2)
    val e = intercept[IllegalArgumentException](t.resolve(relativeVersion = Some(-3)))
    assert(e.getMessage.contains("vacuumed"))
  }

  test("vacuum preserves txn marks so replay stays idempotent after cleanup") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    val app = "chk://stream-q"
    t.commit(Seq(1).toDF("x"), txn = Some(app -> 7L))
    // maintenance: compaction + aggressive vacuum drop the stamped manifest
    t.compact(spark)
    t.compact(spark)
    assert(t.vacuum(retainVersions = 1) > 0)
    assert(t.versions().size === 1)
    // the idempotence memory must survive — a replayed batch 7 is skipped
    assert(t.lastTxn(app) === Some(7L))
    // marks only ratchet upward across further vacuums
    t.commit(Seq(2).toDF("x"), txn = Some(app -> 8L))
    t.compact(spark)
    t.vacuum(retainVersions = 1)
    assert(t.lastTxn(app) === Some(8L))
  }

  test("txn-stamped commits make micro-batch replay idempotent") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    val app = "chk://query-1"
    assert(t.lastTxn(app).isEmpty)
    t.commit(Seq(1).toDF("x"), txn = Some(app -> 0L))
    t.commit(Seq(2).toDF("x"), txn = Some(app -> 1L))
    // a different writer's commit in between must not mask this app's txn
    t.commit(Seq(3).toDF("x"))
    assert(t.lastTxn(app) === Some(1L))
    assert(t.lastTxn("chk://other").isEmpty)
    // the foreachBatch replay guard: batch 1 re-delivered after a crash
    // between commit and checkpoint advance → caller sees it as committed
    assert(t.lastTxn(app).exists(_ >= 1L))
  }

  test("stats-based file skipping prunes range-sorted commits") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    val (hit, scanned, total) = t.readPruned(spark, "id", "0", "100")
    assert(total === 4)
    assert(scanned < total, "range-sorted files must allow skipping")
    // pruning is whole-file: the kept file(s) superset the range, and the
    // residual row filter recovers exactly the requested rows
    assert(hit.filter(col("id") <= 100).count() === 101)
    // out-of-range predicate prunes everything but keeps the schema
    val (none, s2, _) = t.readPruned(spark, "id", "5000", "6000")
    assert(s2 === 0 && none.count() === 0 && none.columns.toSeq === Seq("id", "v"))
  }

  test("compaction rewrites as a new version; vacuum drops old files") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).toDF("x"), numPartitions = Some(8))
    t.commit(spark.range(100, 200).toDF("x"), numPartitions = Some(8))
    val before = t.read(spark).as[Long].collect().sorted.toSeq
    val v = t.compact(spark, numFiles = 1)
    assert(v === 2L)
    assert(t.read(spark).as[Long].collect().sorted.toSeq === before)
    // old versions still time-travelable pre-vacuum
    assert(t.read(spark, versionAsOf = Some(0L)).count() === 100)
    val deleted = t.vacuum(retainVersions = 1)
    assert(deleted === 16) // both pre-compaction versions' 8-file sets, none shared
    assert(t.versions() === Seq(2L))
    assert(t.read(spark).as[Long].collect().sorted.toSeq === before)
  }

  test("OPTIMIZE carries the recorded schema verbatim: the producer's " +
      "appends still land after compaction of an array column") {
    import org.apache.spark.sql.functions.{col, array_repeat, when}
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    // array_repeat of a non-null expr types as array<bigint> with
    // containsNull=false; parquet round-trips widen that to true, so a
    // compact that re-derived the schema from its scan would drift
    val batch = spark.range(0, 50)
      .select(col("id"), array_repeat(col("id"), 3).as("sig"))
    t.commit(batch)
    t.append(spark.range(50, 80)
      .select(col("id"), array_repeat(col("id"), 3).as("sig")))
    val recorded = t.latestVersion().flatMap(t.schemaOf).map(_.json)
    t.compact(spark, numFiles = 1)
    assert(t.latestVersion().flatMap(t.schemaOf).map(_.json) === recorded,
      "compaction must not rewrite the recorded schema")
    // the original producer's next append still passes the compat gate
    t.append(spark.range(80, 90)
      .select(col("id"), array_repeat(col("id"), 3).as("sig")))
    assert(t.read(spark).count() === 90)
    // and a batch that is LAXER than the contract stays refused
    val lax = spark.range(90, 95).select(col("id"),
      org.apache.spark.sql.functions.array(
        when(col("id") % 2 === 0, col("id"))).as("sig"))
    assert(lax.schema("sig").dataType
      .asInstanceOf[org.apache.spark.sql.types.ArrayType].containsNull)
    val e = intercept[IllegalArgumentException](t.append(lax))
    assert(e.getMessage.contains("cannot relax element nullability of sig"))
  }

  test("OPTIMIZE honors the producer's stats opt-out; z-order still " +
      "forces stats (skipping is its point)") {
    import org.apache.spark.sql.functions.col
    val noStats = VersionedTable(tmpDir("vt-") + "/ns")
    noStats.commit(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"), collectStats = false)
    // no stats recorded: nothing prunes, before or after compaction
    assert(noStats.readPruned(spark, "id", "5000", "6000")._2 === 4)
    noStats.compact(spark, numFiles = 2)
    val (_, scanned, total) = noStats.readPruned(spark, "id", "5000", "6000")
    assert(total === 2 && scanned === 2,
      "compaction must not re-add stats the producer opted out of")
    // the same layout z-ordered DOES collect stats and prunes
    val z = VersionedTable(tmpDir("vt-") + "/z")
    z.commit(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"), collectStats = false)
    z.compact(spark, numFiles = 4, zOrderBy = Seq("id", "v"))
    assert(z.readPruned(spark, "id", "5000", "6000")._2 === 0)
    // and a stats-carrying table keeps pruning after plain OPTIMIZE
    val ws = VersionedTable(tmpDir("vt-") + "/ws")
    ws.commit(spark.range(0, 1000).select(col("id"), (col("id") * 2).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    ws.compact(spark, numFiles = 4, sortBy = Seq("id"))
    assert(ws.readPruned(spark, "id", "5000", "6000")._2 === 0)
  }

  test("a fully-deleted snapshot (empty version) stays readable with its schema") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.commit(Seq((1L, "a")).toDF("id", "v").limit(0)) // delete-everything merge
    val empty = t.read(spark)
    assert(empty.count() === 0)
    assert(empty.columns.toSeq === Seq("id", "v"))
    assert(t.read(spark, relativeVersion = Some(-1)).count() === 1)
  }

  test("a foreign manifest landing between commits never gets clobbered") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1).toDF("x"))
    // a racing writer claimed version 1 (empty snapshot) out-of-band
    val log = java.nio.file.Paths.get(root, "_graft_log")
    java.nio.file.Files.write(log.resolve("v00000001.json"),
      """{"version":1,"files":[]}""".getBytes("UTF-8"))
    // our next commit observes it and takes version 2; v1 is untouched
    assert(t.commit(Seq(2).toDF("x")) === 2L)
    assert(t.versions() === Seq(0L, 1L, 2L))
    assert(t.read(spark).as[Int].collect().toSeq === Seq(2))
  }

  test("numPartitions controls written file count") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(1000).toDF(), numPartitions = Some(3))
    val files = new java.io.File(s"$root/data").listFiles().head.listFiles()
      .count(_.getName.endsWith(".parquet"))
    assert(files === 3)
  }

  test("append carries prior files forward instead of rewriting the snapshot") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1, 2).toDF("x"), numPartitions = Some(1))
    val dataDirsAfterCommit = new java.io.File(s"$root/data").listFiles().length
    t.append(Seq(3, 4).toDF("x"), numPartitions = Some(1))
    assert(t.read(spark).as[Int].collect().sorted.toSeq === Seq(1, 2, 3, 4))
    // the appended version reuses v0's physical file (no rewrite): exactly
    // one new commit dir appears, and v0 stays time-travelable
    assert(new java.io.File(s"$root/data").listFiles().length === dataDirsAfterCommit + 1)
    assert(t.read(spark, relativeVersion = Some(-1)).as[Int].collect().sorted.toSeq === Seq(1, 2))
  }

  test("append with a new column evolves the schema; old files read as null") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b", 9.5)).toDF("id", "v", "score"))
    val out = t.read(spark)
    assert(out.columns.toSeq === Seq("id", "v", "score"))
    val rows = out.collect().map(r => (r.getLong(0), r.getString(1),
      if (r.isNullAt(2)) None else Some(r.getDouble(2)))).sortBy(_._1).toSeq
    assert(rows === Seq((1L, "a", None), (2L, "b", Some(9.5))))
    // incompatible evolution is refused
    assertThrows[IllegalArgumentException](
      t.append(Seq(("x", "y")).toDF("id", "v")))
  }

  test("append to an empty table behaves as the first commit") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    assert(t.append(Seq(1).toDF("x")) === 0L)
    assert(t.read(spark).as[Int].collect().toSeq === Seq(1))
  }

  test("copy-on-write delete rewrites only files containing matches") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    // 4 range-sorted files over id 0..999: a delete of id<250 touches 1 file
    t.commit(spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    val (v1, rewritten) = t.delete(spark, "id < 250")
    assert(v1 === 1L)
    // range boundaries are sample-based, so the touched set can straddle one
    // boundary — the point is that most files are NOT rewritten
    assert(rewritten >= 1 && rewritten <= 2, s"expected 1-2 touched files, got $rewritten")
    assert(t.read(spark).count() === 750)
    assert(t.read(spark).agg(org.apache.spark.sql.functions.min("id"))
      .head.getLong(0) === 250L)
    // untouched files' stats carry over: pruned reads still skip
    val (_, scanned, total) = t.readPruned(spark, "id", "900", "999")
    assert(scanned < total)
    // pre-delete snapshot intact
    assert(t.read(spark, relativeVersion = Some(-1)).count() === 1000)
    // a no-match delete commits nothing
    val (v2, r2) = t.delete(spark, "id < 0")
    assert(v2 === 1L && r2 === 0)
    assert(t.latestVersion() === Some(1L))
  }

  test("delete drops fully-matching files whole: no rewrite, no data write") {
    val root = tmpDir("vt-wfd-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    // partitioned: a partition-column delete is METADATA-ONLY
    t.commit(spark.range(0, 900).select(col("id"), (col("id") % 3).as("p")),
      partitionBy = Seq("p"))
    val before = t.filesOf(t.resolve()).toSet
    t.delete(spark, "p = 1")
    val h1 = t.history(spark).filter(col("version") === t.resolve()).head()
    assert(h1.getAs[Long]("files_added") === 0L)
    assert(t.filesOf(t.resolve()).toSet.subsetOf(before))
    assert(t.read(spark).count() === 600)
    assert(t.read(spark).filter("p = 1").count() === 0)
    // NULL partition value: 3VL keeps it (the predicate is not TRUE there)
    val t2 = VersionedTable(tmpDir("vt-wfd2-") + "/t")
    t2.commit(spark.range(0, 100)
      .selectExpr("id", "CASE WHEN id < 50 THEN 'a' END AS p"),
      partitionBy = Seq("p"))
    t2.delete(spark, "p = 'a'")
    assert(t2.read(spark).count() === 50)
    assert(t2.read(spark).filter("p IS NULL").count() === 50)
    // tier 2: a DATA-column predicate fully covering a sorted file drops it
    // whole too — files_added stays 0 when no file has coexisting rows
    val t3 = VersionedTable(tmpDir("vt-wfd3-") + "/t")
    t3.commit(spark.range(0, 1000).selectExpr("id", "id % 7 AS v"),
      numPartitions = Some(4), sortBy = Seq("id"))
    // delete EVERY row of whatever file holds id=0 by using the file's own
    // stats range — derive it from the manifest
    val stats = t3.filesOf(t3.resolve()).map { f =>
      val (mn, mx, _) = tStats(t3, f)
      (f, mn.toLong, mx.toLong)
    }
    val (f0, lo, hi) = stats.minBy(_._2)
    t3.delete(spark, s"id BETWEEN $lo AND $hi")
    val h3 = t3.history(spark).filter(col("version") === t3.resolve()).head()
    assert(h3.getAs[Long]("files_added") === 0L &&
      h3.getAs[Long]("files_removed") === 1L, s"file $f0 should drop whole")
    assert(t3.read(spark).count() === 1000L - (hi - lo + 1))
    // CDF still captures whole-dropped rows when enabled
    val t4 = VersionedTable(tmpDir("vt-wfd4-") + "/t")
    t4.setProperties(Map("enableChangeDataFeed" -> "true"))
    t4.commit(spark.range(0, 90).selectExpr("id", "id % 3 AS p"),
      partitionBy = Seq("p"))
    t4.delete(spark, "p = 2")
    val ch = t4.changeFeed(spark, 0L, t4.resolve())
    assert(ch.filter("_change_type = 'delete'").count() === 30)
  }

  /** Manifest (min, max, kind) of column "id" for file `f`. */
  private def tStats(t: VersionedTable, f: String): (String, String, String) =
    t.statsOf(t.resolve())(f)("id")

  test("MOR delete drops fully-matching files instead of tombstoning every row") {
    val root = tmpDir("vt-morwfd-") + "/t"
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 900).select(col("id"), (col("id") % 3).as("p")),
      partitionBy = Seq("p"))
    // a prior partial MOR delete leaves DVs on a SURVIVING partition
    val (_, n0) = t.deleteMor(spark, "id < 30 AND p = 0")
    assert(n0 === 10)
    // the partition delete: file drops, NO new tombstones for its rows
    val dvBefore = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "dv"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    val (_, n1) = t.deleteMor(spark, "p = 1")
    assert(n1 === 300, s"row count must include whole-dropped files' live rows")
    val dvAfter = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "dv"))
      .toArray.map(_.toString).count(_.endsWith(".parquet"))
    assert(dvAfter === dvBefore,
      "a whole-partition MOR delete must write zero tombstones")
    val h = t.history(spark).filter(col("version") === t.resolve()).head()
    assert(h.getAs[Long]("files_added") === 0L &&
      h.getAs[Long]("files_removed") > 0L)
    // the surviving partition's earlier DVs still apply
    assert(t.read(spark).count() === 900 - 10 - 300)
    assert(t.read(spark).filter("p = 1").count() === 0)
    assert(t.read(spark).filter("id < 30 AND p = 0").count() === 0)
    // mixed tier-2 case: a data predicate fully covering partition 2's live
    // rows AND partially matching partition 0 — drop + tombstone in one verb
    val (_, n2) = t.deleteMor(spark, "p = 2 OR id BETWEEN 30 AND 59")
    assert(n2 === 300 + 10)
    assert(t.read(spark).count() === 900 - 10 - 300 - 310)
  }

  test("copy-on-write merge rewrites only key-overlapping files") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 1000).select(col("id"), (col("id") * 10).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    // update a narrow slice + insert far-away keys: both must leave the
    // non-overlapping files physically untouched
    val src = spark.range(100, 120).select(col("id"), (col("id") + 1).as("v"))
      .union(spark.range(5000, 5003).select(col("id"), col("id").as("v")))
    val (v1, rewritten) = t.mergeCow(spark, src,
      condition = "source.id = target.id", targetKey = "id", sourceKey = "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty)))
    assert(v1 === 1L)
    assert(rewritten >= 1 && rewritten <= 2, s"got $rewritten rewritten files")
    val out = t.read(spark)
    assert(out.count() === 1003)
    assert(out.filter(col("id") === 110).head.getLong(1) === 111L)
    assert(out.filter(col("id") === 500).head.getLong(1) === 5000L)
    assert(out.filter(col("id") === 5001).head.getLong(1) === 5001L)
    // pre-merge snapshot intact; untouched files' stats still prune
    assert(t.read(spark, relativeVersion = Some(-1))
      .filter(col("id") === 110).head.getLong(1) === 1100L)
    val (_, scanned, total) = t.readPruned(spark, "id", "900", "950")
    assert(scanned < total)
  }

  test("copy-on-write merge with a matched delete clause") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 100).select(col("id"), col("id").as("v")),
      numPartitions = Some(2), sortBy = Seq("id"))
    val src = spark.range(10, 15).toDF("id")
    val (_, _) = t.mergeCow(spark, src,
      condition = "source.id = target.id", targetKey = "id", sourceKey = "id",
      whenMatchedDelete = Some(Merge.MatchedDelete(None)))
    assert(t.read(spark).count() === 95)
    assert(t.read(spark).filter(col("id").between(10, 14)).count() === 0)
  }

  test("racing appends rebase onto the new head instead of losing commits") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).toDF("id"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fs = (1 to 4).map { i =>
      Future {
        gate.await()
        VersionedTable(root).append(spark.range(i * 10L, i * 10L + 10).toDF("id"))
      }
    }
    gate.countDown()
    Await.result(Future.sequence(fs), 120.seconds)
    // every batch survives no matter the interleaving, and each append is
    // exactly one version on top of v0
    assert(t.read(spark).count() === 50)
    assert(t.versions() === (0L to 4L))
  }

  test("a snapshot-derived delete never silently drops a concurrent commit") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 1000).select(col("id"), (col("id") % 7).as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt(cond: String): Future[Boolean] = Future {
      gate.await()
      try { VersionedTable(root).delete(spark, cond); true }
      catch { case _: ConcurrentCommitException => false }
    }
    val fa = attempt("id < 100")
    val fb = attempt("id >= 900")
    gate.countDown()
    val (aOk, bOk) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    val out = t.read(spark)
    val aApplied = out.filter(col("id") < 100).count() === 0
    val bApplied = out.filter(col("id") >= 900).count() === 0
    // the invariant under any interleaving: a delete's effect is present IFF
    // it reported success, and no interleaving loses the other's commit
    assert(aOk === aApplied && bOk === bApplied)
    assert(aOk || bOk, "at least one racing delete must win")
    assert(out.filter(col("id").between(100, 899)).count() === 800)
  }

  test("compact is snapshot-pinned: a racing append is never silently dropped") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 1000).toDF("id"), numPartitions = Some(8))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fCompact = Future {
      gate.await()
      try { VersionedTable(root).compact(spark, numFiles = 2); true }
      catch { case _: ConcurrentCommitException => false }
    }
    val fAppend = Future {
      gate.await()
      VersionedTable(root).append(spark.range(1000, 1010).toDF("id"))
    }
    gate.countDown()
    val compacted = Await.result(fCompact, 120.seconds)
    Await.result(fAppend, 120.seconds)
    // the appended batch must survive EVERY interleaving: pre-fix, a compact
    // publishing at the post-append head would silently drop it
    val out = t.read(spark)
    assert(out.count() === 1010)
    assert(out.filter(col("id") >= 1000).count() === 10)
    // and a compact on the quiesced table still works
    if (!compacted) t.compact(spark, numFiles = 2)
    assert(t.read(spark).count() === 1010)
  }

  test("mergeCow rejects prune keys not implied by the merge condition") {
    import org.apache.spark.sql.functions.col
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).select(col("id"), (col("id") % 7).as("v")),
      numPartitions = Some(2), sortBy = Seq("id"))
    val src = spark.range(10, 15).select(col("id"), col("id").as("v"))
    def merge(cond: String): Unit = {
      t.mergeCow(spark, src, cond, "id", "id",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
      ()
    }
    // a condition on a DIFFERENT column than the declared prune key would
    // make the file pruning skip genuinely matching rows — fail fast
    val e = intercept[IllegalArgumentException](merge("source.v = target.v"))
    assert(e.getMessage.contains("prune keys"))
    // an OR around the equi-clause no longer guarantees it for every match
    intercept[IllegalArgumentException](merge("source.id = target.id OR source.v = 1"))
    intercept[IllegalArgumentException](merge("source.id = target.wrong"))
    // accepted shapes: plain, reversed, backticked, parenthesized + conjunct
    merge("source.id = target.id")
    merge("target.id = source.id")
    merge("(source.`id` = target.`id`) AND source.v >= 0")
    assert(t.read(spark).count() === 100)
  }

  test("racing vacuums never lose a txn high-water mark (CAS sidecar)") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 10).toDF("id"), txn = Some("chk://a" -> 5L))
    t.append(spark.range(10, 20).toDF("id"), txn = Some("chk://b" -> 9L))
    t.commit(spark.range(0, 5).toDF("id")) // head without txn marks
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fs = (1 to 2).map { _ =>
      Future { gate.await(); VersionedTable(root).vacuum(retainVersions = 1) }
    }
    gate.countDown()
    fs.foreach(Await.result(_, 120.seconds))
    // both dropped manifests' marks must survive the concurrent fold-in
    assert(t.lastTxn("chk://a") === Some(5L))
    assert(t.lastTxn("chk://b") === Some(9L))
    // and further vacuums keep ratcheting rather than forgetting
    t.commit(spark.range(0, 3).toDF("id"), txn = Some("chk://a" -> 6L))
    t.commit(spark.range(0, 2).toDF("id"))
    t.vacuum(retainVersions = 1)
    assert(t.lastTxn("chk://a") === Some(6L))
    assert(t.lastTxn("chk://b") === Some(9L))
  }

  test("delete keeps rows whose condition evaluates to NULL (3VL)") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, Option.empty[Int]), (2L, Some(3)), (3L, Some(5)))
      .toDF("id", "v"))
    val (_, rewritten) = t.delete(spark, "v = 3")
    assert(rewritten === 1)
    // id=1 (v null) never matched: it must survive, not be silently dropped
    val kept = t.read(spark).select("id").as[Long].collect().sorted.toSeq
    assert(kept === Seq(1L, 3L))
  }

  test("delete and deleteMor refuse nondeterministic predicates outright") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(spark.range(0, 100).selectExpr("id AS k"))
    // classification, CDF capture, and the keep-rewrite each re-evaluate
    // the predicate in a separate job — a rand() that disagrees between
    // them could whole-drop a file whose re-evaluation keeps rows
    val e1 = intercept[IllegalArgumentException] {
      t.delete(spark, "rand() < 0.5")
    }
    assert(e1.getMessage.contains("nondeterministic"))
    val e2 = intercept[IllegalArgumentException] {
      t.deleteMor(spark, "k > 10 AND rand() < 0.5")
    }
    assert(e2.getMessage.contains("nondeterministic"))
    val e3 = intercept[IllegalArgumentException] {
      t.update(spark, "rand() < 0.5", Map("k" -> "k + 1"))
    }
    assert(e3.getMessage.contains("nondeterministic"))
    assert(t.read(spark).count() === 100, "a refused delete must change nothing")
    // deterministic predicates are untouched by the guard
    val (_, touched) = t.delete(spark, "k < 10")
    assert(touched >= 1 && t.read(spark).count() === 90)
  }

  test("copy-on-write merge refuses to widen the table's column types") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 10)
      .select(col("id"), (col("id") * 10).cast("int").as("v")),
      numPartitions = Some(1), sortBy = Seq("id"))
    // source v is LongType; the when/otherwise in the kernel would widen the
    // output column — mergeCow must pin it back to the table's IntegerType
    val src = spark.range(3, 5).select(col("id"), (col("id") + 100).as("v"))
    t.mergeCow(spark, src, "source.id = target.id", "id", "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    val out = t.read(spark) // manifest-schema'd read: widened files would throw
    assert(out.schema("v").dataType.typeName === "integer")
    assert(out.filter(col("id") === 3).head.getInt(1) === 103)
    assert(out.count() === 10)
  }

  test("merge with no overlapping files and no insert clause is a no-op") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 100).select(col("id"), col("id").as("v")),
      numPartitions = Some(2), sortBy = Seq("id"))
    val src = spark.range(5000, 5010).select(col("id"), col("id").as("v"))
    val (v1, rewritten) = t.mergeCow(spark, src, "source.id = target.id",
      "id", "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("v" -> "source.v"))))
    assert(v1 === 0L && rewritten === 0)
    assert(t.versions() === Seq(0L))
  }

  test("append refuses a batch missing one of the table's columns") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a", 1.0)).toDF("id", "v", "score"))
    assertThrows[IllegalArgumentException](
      t.append(Seq((2L, "b")).toDF("id", "v")))
  }

  test("copy-on-write update rewrites only matching files, 3VL-safe") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    t.commit(spark.range(0, 1000)
      .select(col("id"), org.apache.spark.sql.functions.when(col("id") === 500, null)
        .otherwise(col("id") % 10).cast("long").as("v")),
      numPartitions = Some(4), sortBy = Seq("id"))
    val (v1, rewritten) = t.update(spark, "id >= 900", Map("v" -> "v + 100"))
    assert(v1 === 1L)
    assert(rewritten >= 1 && rewritten <= 2, s"got $rewritten")
    val out = t.read(spark)
    assert(out.filter(col("id") === 953).head.getLong(1) === 103L) // 3 + 100
    assert(out.filter(col("id") === 103).head.getLong(1) === 3L)   // untouched
    assert(out.count() === 1000)
    // NULL-condition rows (none here) and unknown SET columns are guarded
    assertThrows[IllegalArgumentException](
      t.update(spark, "id = 1", Map("nope" -> "1")))
    // no-match update commits nothing
    val (v2, r2) = t.update(spark, "id < 0", Map("v" -> "0"))
    assert(v2 === 1L && r2 === 0)
  }

  test("z-order compaction enables file skipping on BOTH dimensions") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    import org.apache.spark.sql.functions.col
    // b is a decorrelated permutation of a: a single-column sort could only
    // ever prune one of the two
    t.commit(spark.range(0, 10000)
      .select(col("id").as("a"), ((col("id") * 7919) % 10000).as("b")),
      numPartitions = Some(1))
    val v = t.compact(spark, numFiles = 8, zOrderBy = Seq("a", "b"))
    assert(v === 1L)
    val before = t.read(spark, relativeVersion = Some(-1))
    assert(t.read(spark).count() === before.count())
    val (_, sa, ta) = t.readPruned(spark, "a", "0", "600")
    val (_, sb, tb) = t.readPruned(spark, "b", "0", "600")
    assert(ta === 8 && tb === 8)
    assert(sa < ta, s"no skipping on a ($sa/$ta)")
    assert(sb < tb, s"no skipping on b ($sb/$tb)")
    // pruning loses no rows: residual filter recovers the exact range
    val (pa, _, _) = t.readPruned(spark, "a", "0", "600")
    assert(pa.filter(col("a") <= 600).count() === 601)
  }

  test("delete everything leaves a readable empty version") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "v"))
    val (v, _) = t.delete(spark, "id >= 0")
    assert(v === 1L)
    val out = t.read(spark)
    assert(out.count() === 0 && out.columns.toSeq === Seq("id", "v"))
  }

  test("changes() diffs versions with bag semantics across schema evolution") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    // v0 carries a duplicate row — multiplicity must survive the diff
    t.commit(Seq((1L, "a"), (1L, "a"), (2L, "b")).toDF("id", "v"))
    t.delete(spark, "id = 2") // v1
    val d01 = t.changes(spark, 0L, 1L)
      .select("id", "v", "_change_type").as[(Long, String, String)].collect().toSeq
    assert(d01 === Seq((2L, "b", "delete"))) // the (1,a) pair is unchanged
    // additive evolution: v2 appends a row with a NEW column
    t.append(Seq((3L, "c", true)).toDF("id", "v", "flag"))
    val d02 = t.changes(spark, 0L, 2L)
      .select("id", "v", "flag", "_change_type")
      .as[(Long, String, Option[Boolean], String)].collect().toSet
    assert(d02 === Set((2L, "b", None, "delete"), (3L, "c", Some(true), "insert")))
    // dropping ONE copy of the duplicate shows exactly one delete
    t.delete(spark, "id = 99") // no-op keeps version numbering obvious
    val d10 = t.changes(spark, 1L, 0L)
      .select("id", "v", "_change_type").as[(Long, String, String)].collect().toSeq
    assert(d10 === Seq((2L, "b", "insert"))) // reverse diff flips the sign
    // reverse diff ACROSS the evolution: the evolved-only column must type
    // from the side that has it (the to-side schema lacks `flag` here)
    val d20 = t.changes(spark, 2L, 0L)
      .select("id", "v", "flag", "_change_type")
      .as[(Long, String, Option[Boolean], String)].collect().toSet
    assert(d20 === Set((2L, "b", None, "insert"), (3L, "c", Some(true), "delete")))
  }

  test("appendsSince reads only post-version files and refuses rewrites") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "v"))
    t.append(Seq((2L, "b")).toDF("id", "v"))
    t.append(Seq((3L, "c")).toDF("id", "v"))
    assert(t.appendsSince(spark, 0L).as[(Long, String)].collect().toSet
      === Set((2L, "b"), (3L, "c")))
    assert(t.appendsSince(spark, 1L).as[(Long, String)].collect().toSet
      === Set((3L, "c")))
    val none = t.appendsSince(spark, 2L)
    assert(none.count() === 0 && none.columns.toSeq === Seq("id", "v"))
    // a rewrite breaks the append-only premise — the consumer must be told
    t.delete(spark, "id = 2")
    val e = intercept[IllegalArgumentException](t.appendsSince(spark, 0L))
    assert(e.getMessage.contains("not an append"))
  }

  test("restore republishes an old version and its files survive vacuum") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    val full = Set((1L, "a"), (2L, "b"), (3L, "c"))
    t.commit(full.toSeq.toDF("id", "v"))
    t.delete(spark, "id = 2")
    assert(t.read(spark).count() === 2)
    assert(t.restore(0L) === 2L)
    assert(t.read(spark).as[(Long, String)].collect().toSet === full)
    // the rolled-back-over delete stays time-travelable
    assert(t.read(spark, versionAsOf = Some(1L)).count() === 2)
    // restore is manifest-only: the head references v0's files, so vacuum
    // retaining just the head must keep them (no data was copied)
    t.vacuum(retainVersions = 1)
    assert(t.read(spark).as[(Long, String)].collect().toSet === full)
    assert(t.history(spark).collect().map(_.getLong(0)).toSeq === Seq(2L))
    // restoring a vacuumed version is refused with the real story
    val e = intercept[IllegalArgumentException](t.restore(0L))
    assert(e.getMessage.contains("not committed"))
  }

  test("addConstraint proves existing data and rejects an ALTER it fails") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 10.0), (2L, -3.0)).toDF("id", "amount"))
    val e = intercept[ConstraintViolationException](
      t.addConstraint(spark, "amount_pos", "amount > 0"))
    assert(e.getMessage.contains("amount_pos") && e.getMessage.contains("1 row"))
    assert(t.constraintsOf(t.resolve()).isEmpty) // the ALTER never published
  }

  test("constraints gate appends, overwrites, updates and merges; NULL violates") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 10.0), (2L, 3.0)).toDF("id", "amount"))
    t.addConstraint(spark, "amount_pos", "amount > 0")
    assert(t.constraintsOf(t.resolve()) === Map("amount_pos" -> "amount > 0"))

    // violating append: rejected, head unchanged
    val headBefore = t.resolve()
    intercept[ConstraintViolationException](
      t.append(Seq((3L, -1.0)).toDF("id", "amount")))
    assert(t.resolve() === headBefore)
    // NULL fails the gate too (Delta CHECK semantics)
    intercept[ConstraintViolationException](
      t.append(Seq((3L, Option.empty[Double])).toDF("id", "amount")))
    // a clean batch passes and the constraint survives the append
    t.append(Seq((3L, 7.0)).toDF("id", "amount"))
    assert(t.read(spark).count() === 3)
    assert(t.constraintsOf(t.resolve()).contains("amount_pos"))

    // overwrite commit is gated and keeps the table's constraints
    intercept[ConstraintViolationException](
      t.commit(Seq((9L, -9.0)).toDF("id", "amount")))
    // UPDATE that pushes a row out of bounds is rejected
    intercept[ConstraintViolationException](
      t.update(spark, "id = 1", Map("amount" -> "-amount")))
    // merge INSERT carrying a violation is rejected
    intercept[ConstraintViolationException](
      t.mergeCow(spark, Seq((4L, -2.0)).toDF("id", "amount"),
        "source.id = target.id", targetKey = "id", sourceKey = "id",
        whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty))))
    assert(t.read(spark).count() === 3) // nothing above published

    // drop lifts the gate
    t.dropConstraint("amount_pos")
    t.append(Seq((5L, -1.0)).toDF("id", "amount"))
    assert(t.read(spark).count() === 4)
  }

  test("constraints are version-pinned: compact carries, restore rolls back") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 5.0)).toDF("id", "amount")) // v0
    val preConstraint = t.resolve()
    t.addConstraint(spark, "amount_pos", "amount > 0") // v1
    t.compact(spark, numFiles = 1) // v2
    assert(t.constraintsOf(t.resolve()).contains("amount_pos"))
    t.restore(preConstraint) // back to constraint-free metadata
    assert(t.constraintsOf(t.resolve()).isEmpty)
    t.append(Seq((2L, -1.0)).toDF("id", "amount")) // passes: gate rolled back
    assert(t.read(spark).count() === 2)
  }

  test("TableConstraint stage parses and runs add/drop from JSON") {
    val root = tmpDir("vt-")
    VersionedTable(root).commit(Seq((1L, 2.0)).toDF("id", "amount"))
    graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TableConstraint", "name": "c", "tableURI": "$root",
         |   "action": "add", "constraintName": "amount_pos",
         |   "expression": "amount > 0"}
         |]}""".stripMargin).run(spark, Map.empty)
    val t = VersionedTable(root)
    assert(t.constraintsOf(t.resolve()) === Map("amount_pos" -> "amount > 0"))
    // add without expression is a parse-time error, not a mid-job surprise
    val e = intercept[IllegalArgumentException](graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "TableConstraint", "name": "c", "tableURI": "$root",
         |   "action": "add", "constraintName": "x"}
         |]}""".stripMargin))
    assert(e.getMessage.contains("expression"))
  }

  // ---- merge-on-read deletion vectors ----

  private def fileListOf(t: VersionedTable, v: Long): Seq[String] =
    t.stateOf(v).files

  test("deleteMor removes rows without rewriting any data file") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"), numPartitions = Some(4))
    val (v1, n) = t.deleteMor(spark, "id % 10 = 0")
    assert(v1 === 1L && n === 10L)
    assert(fileListOf(t, 0L) === fileListOf(t, 1L), "file list must be untouched")
    assert(t.read(spark).as[(Long, String)].collect().map(_._1).sorted.toSeq ===
      (1L to 100L).filterNot(_ % 10 == 0))
    // time travel still sees the pre-delete snapshot
    assert(t.read(spark, versionAsOf = Some(0L)).count() === 100)
    // 3VL: NULL condition keeps the row
    val t2 = VersionedTable(tmpDir("vt-"))
    t2.commit(Seq((1L, Some(1.0)), (2L, None: Option[Double])).toDF("id", "x"))
    val (_, n2) = t2.deleteMor(spark, "x > 0")
    assert(n2 === 1L)
    assert(t2.read(spark).select("id").as[Long].collect().toSeq === Seq(2L))
  }

  test("deleteMor accumulates across commits and never double-deletes") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 50L).toDF("id"), numPartitions = Some(2))
    val (_, n1) = t.deleteMor(spark, "id <= 10")
    val (_, n2) = t.deleteMor(spark, "id <= 20") // 10 already dead
    assert(n1 === 10L && n2 === 10L)
    assert(t.read(spark).as[Long].collect().sorted.toSeq === (21L to 50L))
    // a third delete matching only dead rows is a no-op, no new version
    val head = t.resolve()
    val (v, n3) = t.deleteMor(spark, "id <= 20")
    assert(n3 === 0L && v === head && t.resolve() === head)
  }

  private def headHasDvs(root: String, t: VersionedTable): Boolean =
    t.stateOf(t.resolve()).dvs.nonEmpty

  test("deleteMor composes with append, COW delete/update and compact") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 40L).map(i => (i, i * 1.0)).toDF("id", "amount"),
      numPartitions = Some(4), sortBy = Seq("id"))
    t.deleteMor(spark, "id BETWEEN 1 AND 5")           // tombstones, no rewrite
    t.append((41L to 45L).map(i => (i, i * 1.0)).toDF("id", "amount"))
    // COW update of a high slice: the tombstoned low file is untouched, so
    // its tombstones must carry into the new version
    t.update(spark, "id BETWEEN 36 AND 44", Map("amount" -> "amount + 100"))
    assert(headHasDvs(root, t), "untouched files' tombstones must carry through COW update")
    val afterUpdate = t.read(spark).as[(Long, Double)].collect().toMap
    assert(!afterUpdate.contains(3L), "MOR-deleted row must not resurrect through COW update")
    assert(afterUpdate(40L) === 140.0 && afterUpdate(20L) === 20.0)
    // compaction materializes live tombstones and clears them
    t.compact(spark, numFiles = 2)
    assert(!headHasDvs(root, t), "compact must clear deletion vectors")
    assert(t.read(spark).count() === 40)
    // fresh tombstone, then a COW delete whose rewrite must not resurrect it
    t.deleteMor(spark, "id = 9")
    t.delete(spark, "id BETWEEN 6 AND 8")
    val ids = t.read(spark).as[(Long, Double)].collect().map(_._1).toSet
    assert(!ids.contains(9L) && !ids.contains(7L) && !ids.contains(3L))
    assert(ids.size === 36) // 45 - 5 mor - 1 mor - 3 cow
  }

  test("mergeCow over a MOR-deleted table does not resurrect dead rows") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 30L).map(i => (i, s"old$i")).toDF("id", "s"),
      numPartitions = Some(3), sortBy = Seq("id"))
    t.deleteMor(spark, "id = 7")
    val source = Seq((7L, "new7"), (31L, "new31")).toDF("id", "s")
    t.mergeCow(spark, source, "source.id = target.id", "id", "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("s" -> "source.s"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None, Map.empty)))
    val rows = t.read(spark).as[(Long, String)].collect().toMap
    // id=7 was dead at merge time: NOT MATCHED applies, the insert wins
    assert(rows(7L) === "new7" && rows(31L) === "new31" && rows.size === 31)
  }

  test("appendsSince refuses a range containing a MOR delete") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 10L).toDF("id"))
    t.append((11L to 20L).toDF("id"))
    t.deleteMor(spark, "id = 1") // keeps every file — but removes rows
    val e = intercept[IllegalArgumentException](t.appendsSince(spark, 0L).collect())
    assert(e.getMessage.contains("deletion vectors"))
  }

  test("vacuum keeps referenced DV files and drops retired ones") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 20L).toDF("id"), numPartitions = Some(2))
    t.deleteMor(spark, "id <= 5")   // v1: dv A
    t.compact(spark, numFiles = 1)  // v2: clears DVs (A now only referenced by v1)
    t.deleteMor(spark, "id = 10")   // v3: dv B
    assert(t.vacuum(retainVersions = 2) > 0) // drops v0, v1 → dv A goes
    def dvParts: Long = {
      val dv = java.nio.file.Paths.get(root, "dv")
      if (!java.nio.file.Files.isDirectory(dv)) 0L
      else {
        val s = java.nio.file.Files.walk(dv)
        try s.filter(p => p.toString.endsWith(".parquet")).count()
        finally s.close()
      }
    }
    assert(dvParts === 1L, "only v3's DV file may remain")
    assert(t.read(spark).as[Long].collect().sorted.toSeq ===
      (6L to 20L).filterNot(_ == 10L))
  }

  test("vacuum sweeps aged orphans of rejected batches but never fresh files") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 5.0)).toDF("id", "amount"))
    t.addConstraint(spark, "amount_pos", "amount > 0")
    // rejected batch: its data files are written, then the publish refuses —
    // they are referenced by NO manifest (orphans)
    intercept[ConstraintViolationException](t.append(Seq((2L, -1.0)).toDF("id", "amount")))
    def dataParts: Long = {
      val s = java.nio.file.Files.walk(java.nio.file.Paths.get(root, "data"))
      try s.filter(p => p.toString.endsWith(".parquet")).count() finally s.close()
    }
    val withOrphan = dataParts
    // fresh orphans survive the age guard (a concurrent writer's unpublished
    // files must never be swept out from under its commit)
    t.vacuum(retainVersions = 1)
    assert(dataParts === withOrphan)
    // past the age guard they go; the table still reads
    assert(t.vacuum(retainVersions = 1, orphanRetentionMs = 0L) > 0)
    assert(dataParts < withOrphan)
    assert(t.read(spark).count() === 1)
  }

  test("compact with a target file size binpacks by on-disk bytes") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 20000L).map(i => (i, s"pad-$i-${"x" * 40}")).toDF("id", "s"),
      numPartitions = Some(16))
    def headFiles: Seq[String] = t.stateOf(t.resolve()).files
    val totalBytes = headFiles
      .map(f => java.nio.file.Files.size(java.nio.file.Paths.get(root).resolve(f))).sum
    val target = totalBytes / 3 // expect ceil(total/target) = 3-4 output files
    t.compact(spark, targetFileSizeBytes = Some(target))
    val n = headFiles.size
    assert(n >= 3 && n <= 4, s"expected ~3 binpacked files, got $n")
    assert(t.read(spark).count() === 20000L)
  }

  test("commitPinnedAt surfaces a concurrent commit instead of clobbering it") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq(1L).toDF("id"))
    val head = t.latestVersion() // Some(0)
    t.append(Seq(2L).toDF("id")) // a concurrent writer lands
    intercept[ConcurrentCommitException](t.commitPinnedAt(Seq(3L).toDF("id"), head))
    // nothing lost: the concurrent append's rows are still the head
    assert(t.read(spark).as[Long].collect().sorted.toSeq === Seq(1L, 2L))
  }

  test("symlink manifest refuses a DV-carrying version (external engines can't apply tombstones)") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit((1L to 10L).toDF("id"))
    t.deleteMor(spark, "id = 1")
    val e = intercept[IllegalArgumentException](t.writeSymlinkManifest())
    assert(e.getMessage.contains("deletion vectors"))
    t.compact(spark) // materializes the delete
    assert(java.nio.file.Files.exists(t.writeSymlinkManifest()))
  }

  test("a manifest from a NEWER table format fails resolve with a clear error") {
    val root = tmpDir("vt-fmt-")
    val t = VersionedTable(root)
    t.commit(Seq(1L).toDF("id"))
    // simulate a future engine's commit: bump the stamped format version
    val m = java.nio.file.Paths.get(root, "_graft_log", "v00000000.json")
    val bumped = new String(java.nio.file.Files.readAllBytes(m), "UTF-8")
      .replaceFirst("\"formatVersion\" : 1", "\"formatVersion\" : 99")
    java.nio.file.Files.write(m, bumped.getBytes("UTF-8"))
    val e = intercept[IllegalStateException](t.read(spark).count())
    assert(e.getMessage.contains("format 99"))
    assert(e.getMessage.contains("upgrade"))
  }

  test("history records the operation of every commit") {
    val root = tmpDir("vt-op-")
    val t = VersionedTable(root)
    t.commit(Seq(1L, 5L).toDF("id"))
    t.append(Seq(2L).toDF("id"))
    t.delete(spark, "id = 1")
    t.compact(spark)
    t.restore(1L)
    val ops = t.history(spark).orderBy("version")
      .collect().map(_.getAs[String]("operation")).toSeq
    assert(ops === Seq("OVERWRITE", "APPEND", "DELETE", "OPTIMIZE", "RESTORE"))
  }

  test("appendOnly=true refuses every row-deleting verb, allows append-shaped ones") {
    val root = tmpDir("vt-ao-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    t.setProperties(Map("appendOnly" -> "true"))
    // appends, compaction (row-preserving) and insert-only merges stay open
    t.append(Seq((3L, "c")).toDF("id", "k"))
    t.compact(spark)
    t.mergeCow(spark, Seq((4L, "d")).toDF("id", "k"), "source.id = target.id",
      targetKey = "id", sourceKey = "id",
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
        Map("id" -> "source.id", "k" -> "source.k"))))
    // everything that deletes or updates existing rows refuses up front
    def refused(f: => Any): Unit =
      assert(intercept[IllegalArgumentException](f).getMessage.contains("appendOnly"))
    refused(t.delete(spark, "id = 1"))
    refused(t.deleteMor(spark, "id = 1"))
    refused(t.update(spark, "id = 1", Map("k" -> "'x'")))
    refused(t.replaceWhere(Seq((1L, "z")).toDF("id", "k"), "id = 1"))
    refused(t.restore(0L))
    refused(t.commit(Seq((9L, "z")).toDF("id", "k"))) // overwrite
    refused(t.mergeCow(spark, Seq((1L, "u")).toDF("id", "k"), "source.id = target.id",
      targetKey = "id", sourceKey = "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("k" -> "source.k")))))
    refused(t.mergeMor(spark, Seq((1L, "u")).toDF("id", "k"), "source.id = target.id",
      targetKey = "id", sourceKey = "id",
      whenMatchedDelete = Some(Merge.MatchedDelete(None))))
    assert(t.read(spark).count() === 4)
    // unsetting the property re-enables rewrites
    t.setProperties(Map("appendOnly" -> "false"))
    val (_, n) = t.delete(spark, "id = 1")
    assert(n >= 1 && t.read(spark).count() === 3)
  }

  test("addConstraint validates live rows only; restore brings tombstones back") {
    val root = tmpDir("vt-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, 5.0), (2L, -1.0)).toDF("id", "amount"))
    t.deleteMor(spark, "amount < 0")
    // the violating row is dead: the ALTER must pass
    t.addConstraint(spark, "amount_pos", "amount > 0")
    intercept[ConstraintViolationException](t.append(Seq((3L, -2.0)).toDF("id", "amount")))
    // restore to the tombstoned version: live rows stay filtered
    val tombstoned = 1L
    t.restore(tombstoned)
    assert(t.read(spark).count() === 1)
  }

  test("carried timestamp stats drop when the base manifest predates statsZone") {
    import java.nio.file.{Files => JFiles, Paths => JPaths}
    val root = tmpDir("zone-") + "/t"
    val t = VersionedTable(root)
    t.commit(Seq((1L, java.sql.Timestamp.valueOf("2024-01-01 00:00:00")))
      .toDF("id", "ts"))
    // simulate a manifest written before statsZone recording existed: its
    // timestamp stats were rendered under an UNKNOWN zone
    val m0 = JPaths.get(root, "_graft_log", "v00000000.json")
    val mapper = new com.fasterxml.jackson.databind.ObjectMapper()
    val node = mapper.readTree(JFiles.readAllBytes(m0))
      .asInstanceOf[com.fasterxml.jackson.databind.node.ObjectNode]
    assert(node.has("statsZone"))
    node.remove("statsZone")
    JFiles.write(m0, mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(node))
    // the next commit must NOT stamp the session zone over those legacy ts
    // stats (a different original zone would make readers wrongly prune
    // live files) — they drop; non-temporal stats carry unharmed
    VersionedTable(root).append(
      Seq((2L, java.sql.Timestamp.valueOf("2024-02-01 00:00:00"))).toDF("id", "ts"))
    val n1 = mapper.readTree(JFiles.readAllBytes(
      JPaths.get(root, "_graft_log", "v00000001.json")))
    assert(n1.has("statsZone"))
    n1.get("stats").properties().forEach { e =>
      assert(!e.getValue.has("ts"),
        s"legacy-zone ts stats must drop for ${e.getKey}")
      assert(e.getValue.has("id"), s"id stats must survive for ${e.getKey}")
    }
  }

  test("NOT NULL schema fields gate every write funnel; evolution adds stay nullable") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    import org.apache.spark.sql.Row
    val strict = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("k", StringType, nullable = true)))
    def df(rows: (java.lang.Long, String)*) = spark.createDataFrame(
      spark.sparkContext.parallelize(rows.map(r => Row(r._1, r._2)), 1), strict)
    val root = tmpDir("vt-nn-")
    val t = VersionedTable(root)
    // v0 records id as NOT NULL; later batches arrive as ordinary nullable
    // frames (the realistic DDL-then-insert shape) and must hit OUR gate
    t.commit(df((1L, "a"), (2L, null)))
    // ... at APPEND (the table's recorded nullability gates, not the batch's)
    intercept[ConstraintViolationException](
      t.append(Seq((null: java.lang.Long, "y")).toDF("id", "k")))
    t.append(Seq((3L, "c")).toDF("id", "k"))
    // ... and at UPDATE (a SET writing null into a NOT NULL column)
    intercept[ConstraintViolationException](
      t.update(spark, "k = 'a'", Map("id" -> "CAST(NULL AS BIGINT)")))
    assert(t.read(spark).count() === 3)
    // the implicit gate is never persisted as a manifest constraint
    assert(t.constraintsOf(t.resolve()).isEmpty)
    // schema evolution: a column added by an append is recorded NULLABLE
    // even if the batch declared it non-null (older files read it as null)
    val withNew = StructType(strict.fields :+
      StructField("extra", LongType, nullable = false))
    val batch = spark.createDataFrame(
      spark.sparkContext.parallelize(Seq(Row(9L, "z", 7L)), 1), withNew)
    t.append(batch)
    assert(t.read(spark).schema("extra").nullable,
      "evolution-added columns must be recorded nullable")
  }

  test("in-commit timestamps are monotonic and survive manifest mtime churn") {
    val root = tmpDir("vt-ict-")
    val t = VersionedTable(root)
    t.commit(Seq(1).toDF("x"))
    t.append(Seq(2).toDF("x"))
    t.append(Seq(3).toDF("x"))
    val times = Seq(0L, 1L, 2L).map(t.commitTimeOf)
    assert(times === times.sorted && times.distinct === times,
      s"commit times must be strictly increasing: $times")
    assert(t.resolveAsOfTimestamp(times(1)) === 1L)
    assert(t.resolveAsOfTimestamp(times(2) - 1) === 1L)
    // a backup/restore or cross-store copy rewrites every file's mtime;
    // the in-commit stamp keeps timestamp travel, history, and RESTORE
    // pinned to the original commit clock
    val log = java.nio.file.Paths.get(root, "_graft_log")
    val churned = java.nio.file.attribute.FileTime.fromMillis(
      System.currentTimeMillis() + 86400000L)
    Seq(0L, 1L, 2L).foreach { v =>
      java.nio.file.Files.setLastModifiedTime(
        log.resolve(f"v$v%08d.json"), churned)
    }
    assert(t.resolveAsOfTimestamp(times(1)) === 1L)
    assert(Seq(0L, 1L, 2L).map(t.commitTimeOf) === times)
    val hist = t.history(spark).orderBy("version")
      .select("committed_at").collect().map(_.getTimestamp(0).getTime).toSeq
    assert(hist === times)
  }
}
