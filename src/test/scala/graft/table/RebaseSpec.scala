package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Path
import java.util.concurrent.atomic.AtomicBoolean

/** Optimistic-concurrency rebase for rewrites (Delta WriteSerializable
  * shape): a delete/update/merge computed against snapshot v that collides
  * with PURE APPEND commits whose fresh rows cannot interact with the
  * rewrite republishes at the new head with the appended files carried
  * forward — the exact serial append-then-rewrite result. Racing REWRITES
  * fold at FILE granularity: they commute when neither side removes or
  * tombstones a file of the other AND the interloper's fresh files pass
  * the same row-interaction scan appends do — same-partition and
  * unpartitioned rewrites included. Anything else raises
  * [[ConcurrentCommitException]].
  *
  * The race is made deterministic by interposing on the commit store: the
  * interloper commits through a SECOND table handle the instant the rewrite
  * first tries to publish its manifest — maximal badness, zero sleeps. */
class RebaseSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** Delegates to [[LinkCommitStore]], running `interlope` once immediately
    * BEFORE the first manifest put (sidecar/props/checkpoint writes pass
    * through untouched). */
  private final class InterposingStore(interlope: () => Unit) extends CommitStore {
    private val fired = new AtomicBoolean(false)
    override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
      if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
          fired.compareAndSet(false, true)) interlope()
      LinkCommitStore.putIfAbsent(target, bytes)
    }
  }

  private def seed(root: String): Unit =
    VersionedTable(root).commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)).toDF("id", "k", "amt"))

  test("delete rebases over a non-matching concurrent append") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "z", 90.0)).toDF("id", "k", "amt"))))
    val (ver, n) = t.delete(spark, "k = 'a'")
    assert(n === 2)
    assert(ver === 2L) // rebased past the interloper's v1
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    // serial result: append lands, then the delete drops the two 'a' rows
    assert(rows === Seq((2L, "b", 20.0), (9L, "z", 90.0)))
  }

  test("delete raises when the concurrent append DOES match the predicate") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "a", 90.0)).toDF("id", "k", "amt"))))
    val e = intercept[ConcurrentCommitException](t.delete(spark, "k = 'a'"))
    assert(e.getMessage.contains("concurrent commit"))
    // the standard recovery — re-run against the new head — then covers the
    // appended row too (full serializability, nothing lost)
    val (_, n2) = VersionedTable(root).delete(spark, "k = 'a'")
    assert(n2 === 3)
  }

  test("delete folds a concurrent rewrite of DISJOINT files (file-granular " +
      "commutation, even unpartitioned)") {
    val root = tmpDir("rb-") + "/t"
    // two single-file commits: the 'a' rows and the 'b' row live in
    // different files, so an update of 'b' and a delete of 'a' commute
    VersionedTable(root).commit(
      Seq((1L, "a", 10.0), (3L, "a", 30.0)).toDF("id", "k", "amt"),
      numPartitions = Some(1))
    VersionedTable(root).append(
      Seq((2L, "b", 20.0)).toDF("id", "k", "amt"), numPartitions = Some(1))
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).update(spark, "k = 'b'", Map("amt" -> "amt + 1"))))
    val (_, n) = t.delete(spark, "k = 'a'")
    assert(n === 1) // one touched file (the 'a' file)
    // serial result: the update landed AND the delete landed
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(rows === Seq((2L, "b", 21.0)))
  }

  test("delete raises when the concurrent rewrite touches the SAME file") {
    val root = tmpDir("rb-") + "/t"
    // one file holding both keys: the interloper's update rewrites the very
    // file the delete wants to rewrite — no serial fold exists
    VersionedTable(root).commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)).toDF("id", "k", "amt"),
      numPartitions = Some(1))
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).update(spark, "k = 'b'", Map("amt" -> "amt + 1"))))
    intercept[ConcurrentCommitException](t.delete(spark, "k = 'a'"))
    // recovery: re-run against the new head lands the serial result
    val (_, n2) = VersionedTable(root).delete(spark, "k = 'a'")
    assert(n2 === 1)
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(rows === Seq((2L, "b", 21.0)))
  }

  test("update rebases over a non-matching concurrent append") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "z", 90.0)).toDF("id", "k", "amt"))))
    val (_, n) = t.update(spark, "k = 'a'", Map("amt" -> "amt + 1"))
    assert(n === 2)
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(rows === Seq((1L, "a", 11.0), (2L, "b", 20.0), (3L, "a", 31.0),
      (9L, "z", 90.0)))
  }

  test("MOR delete rebases over a non-matching concurrent append") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "z", 90.0)).toDF("id", "k", "amt"))))
    val (_, n) = t.deleteMor(spark, "k = 'a'")
    assert(n === 2L)
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    assert(rows === Seq((2L, "b", 20.0), (9L, "z", 90.0)))
  }

  test("mergeCow rebases over an append outside the source key range") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val src = Seq((2L, 200.0), (4L, 40.0)).toDF("id", "amt")
      .selectExpr("id", "'s' AS k", "amt")
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "z", 90.0)).toDF("id", "k", "amt"))))
    t.mergeCow(spark, src, "source.id = target.id",
      targetKey = "id", sourceKey = "id",
      whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("amt" -> "source.amt"))),
      whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
        Map("id" -> "source.id", "k" -> "source.k", "amt" -> "source.amt"))))
    val rows = VersionedTable(root).read(spark)
      .as[(Long, String, Double)].collect().sorted.toSeq
    // serial: +9z, then merge updates id=2 and inserts id=4
    assert(rows === Seq((1L, "a", 10.0), (2L, "b", 200.0), (3L, "a", 30.0),
      (4L, "s", 40.0), (9L, "z", 90.0)))
  }

  test("mergeCow raises when the append lands inside the source key range") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    val src = Seq((2L, 200.0), (9L, 900.0)).toDF("id", "amt")
      .selectExpr("id", "'s' AS k", "amt")
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(Seq((9L, "z", 90.0)).toDF("id", "k", "amt"))))
    intercept[ConcurrentCommitException] {
      t.mergeCow(spark, src, "source.id = target.id",
        targetKey = "id", sourceKey = "id",
        whenMatchedUpdate = Some(Merge.MatchedUpdate(None, Map("amt" -> "source.amt"))),
        whenNotMatchedInsert = Some(Merge.NotMatchedInsert(None,
          Map("id" -> "source.id", "k" -> "source.k", "amt" -> "source.amt"))))
    }
  }

  test("overwrite racing a schema-evolving append fails hard on a stamped " +
      "field-id conflict instead of mis-recording ids") {
    val root = tmpDir("rb-ids-") + "/t"
    seed(root) // schema (id, k, amt) → column ids 1, 2, 3
    // the interloper claims field id 4 for colA the instant the overwrite —
    // whose files were already STAMPED colB = 4 — first tries to publish.
    // Re-deriving ids at the new head would record colB = 5 while the bytes
    // on disk say 4 (which now means colA): by-id reads would resolve the
    // wrong column. The commit must fail hard instead.
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(
        Seq((9L, "z", 90.0, "x")).toDF("id", "k", "amt", "colA"))))
    val e = intercept[IllegalStateException] {
      t.commit(Seq((1L, "a", 1.0, 5L)).toDF("id", "k", "amt", "colB"))
    }
    assert(e.getMessage.contains("stamped"))
    // recovery: re-running the write against the new head stamps a fresh,
    // conflict-free id (colA holds 4, colB takes 5) and everything reads
    val t2 = VersionedTable(root)
    t2.commit(Seq((1L, "a", 1.0, 5L)).toDF("id", "k", "amt", "colB"))
    assert(t2.read(spark).selectExpr("colB").as[Long].collect().toSeq === Seq(5L))
  }

  test("concurrent writers agreeing on the new column keep their stamped id") {
    val root = tmpDir("rb-ids2-") + "/t"
    seed(root)
    // both writers add the SAME column: both stamp id 4, the ids agree at
    // the retried head, and the race resolves without a failure
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).append(
        Seq((9L, "z", 90.0, "x")).toDF("id", "k", "amt", "extra"))))
    t.commit(Seq((1L, "a", 1.0, "y")).toDF("id", "k", "amt", "extra"))
    assert(VersionedTable(root).read(spark)
      .selectExpr("extra").as[String].collect().toSeq === Seq("y"))
  }

  private def seedPartitioned(root: String): Unit = {
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a", 10.0), (2L, "b", 20.0)).toDF("id", "k", "amt"),
      partitionBy = Seq("k"))
    // second file per partition so a partition-scoped compaction has work
    t.append(Seq((3L, "a", 30.0), (4L, "b", 40.0)).toDF("id", "k", "amt"))
  }

  test("partition-scoped compactions of DISJOINT partitions both commit") {
    val root = tmpDir("rb-part-") + "/t"
    seedPartitioned(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).compactWhere(spark, "k = 'b'")))
    val ver = t.compactWhere(spark, "k = 'a'")
    assert(ver === 3L) // rebased past the interloper's v2
    val rows = VersionedTable(root).read(spark)
      .selectExpr("id", "k", "amt").as[(Long, String, Double)]
      .collect().sorted.toSeq
    assert(rows === Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0),
      (4L, "b", 40.0)))
  }

  test("deletes scoped to DISJOINT partitions both commit") {
    val root = tmpDir("rb-part-") + "/t"
    seedPartitioned(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).delete(spark, "k = 'b' AND id = 2")))
    val (_, n) = t.delete(spark, "k = 'a' AND id = 1")
    assert(n === 1)
    val rows = VersionedTable(root).read(spark)
      .selectExpr("id", "k", "amt").as[(Long, String, Double)]
      .collect().sorted.toSeq
    // serial result: both partition-local deletes land
    assert(rows === Seq((3L, "a", 30.0), (4L, "b", 40.0)))
  }

  test("OVERLAPPING partition rewrites still raise") {
    val root = tmpDir("rb-part-") + "/t"
    seedPartitioned(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).compactWhere(spark, "k = 'a'")))
    intercept[ConcurrentCommitException](t.delete(spark, "k = 'a' AND id = 1"))
    // recovery: re-run against the new head
    val (_, n2) = VersionedTable(root).delete(spark, "k = 'a' AND id = 1")
    assert(n2 === 1)
  }

  test("concurrent MOR deletes tombstoning DISJOINT files both commit") {
    val root = tmpDir("rb-dv-") + "/t"
    seedPartitioned(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).deleteMor(spark, "id = 4")))
    val (_, n) = t.deleteMor(spark, "id = 1")
    assert(n === 1L)
    val rows = VersionedTable(root).read(spark)
      .selectExpr("id", "k", "amt").as[(Long, String, Double)]
      .collect().sorted.toSeq
    // serial result: both tombstone batches are in force
    assert(rows === Seq((2L, "b", 20.0), (3L, "a", 30.0)))
  }

  test("concurrent MOR deletes tombstoning the SAME file raise") {
    val root = tmpDir("rb-dv-") + "/t"
    VersionedTable(root).commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0))
        .toDF("id", "k", "amt"), numPartitions = Some(1))
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).deleteMor(spark, "id = 2")))
    intercept[ConcurrentCommitException](t.deleteMor(spark, "id = 1"))
    // recovery: re-run sees the interloper's tombstones and both deletes land
    val (_, n2) = VersionedTable(root).deleteMor(spark, "id = 1")
    assert(n2 === 1L)
    assert(VersionedTable(root).read(spark).count() === 1L)
  }

  test("MOR delete folds a racing compaction of a partition its tombstones " +
      "don't touch, raises on its own partition") {
    val root = tmpDir("rb-dv-") + "/t"
    seedPartitioned(root)
    val t = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).compactWhere(spark, "k = 'b'")))
    val (_, n) = t.deleteMor(spark, "id = 1") // tombstone lives in k='a'
    assert(n === 1L)
    assert(VersionedTable(root).read(spark)
      .selectExpr("id").as[Long].collect().sorted.toSeq === Seq(2L, 3L, 4L))
    // a compaction of the SAME partition would erase the tombstoned file —
    // that race must still raise
    val t2 = new VersionedTable(root, new InterposingStore(() =>
      VersionedTable(root).compactWhere(spark, "k = 'a'")))
    intercept[ConcurrentCommitException](t2.deleteMor(spark, "id = 3"))
  }

  test("rebase chains across repeated interloping appends") {
    val root = tmpDir("rb-") + "/t"
    seed(root)
    // fire a fresh append before EVERY manifest attempt (up to 3): the
    // rewrite must chase the head and still land the serial result
    val count = new java.util.concurrent.atomic.AtomicLong(0)
    val store = new CommitStore {
      override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
        if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
            count.incrementAndGet() <= 3)
          VersionedTable(root).append(
            Seq((100L + count.get(), "z", 1.0)).toDF("id", "k", "amt"))
        LinkCommitStore.putIfAbsent(target, bytes)
      }
    }
    val (_, n) = new VersionedTable(root, store).delete(spark, "k = 'a'")
    assert(n === 2)
    val rows = VersionedTable(root).read(spark).as[(Long, String, Double)]
      .collect().sorted.toSeq
    assert(rows.map(_._1) === Seq(2L, 101L, 102L, 103L))
  }
}
