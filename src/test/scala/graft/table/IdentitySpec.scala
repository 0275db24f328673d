package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Path
import java.util.concurrent.atomic.AtomicBoolean

/** GENERATED ALWAYS AS IDENTITY columns ([[VersionedTable.enableIdentity]] /
  * [[VersionedTable.appendIdentity]]): allocation high water recorded in the
  * SAME manifest as the rows it covers, so two racing allocators can never
  * hand out one id twice — the loser's pinned publish raises and the funnel
  * re-assigns above the new water. */
class IdentitySpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private final class FireOnce(interlope: () => Unit) extends CommitStore {
    private val fired = new AtomicBoolean(false)
    override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
      if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
          fired.compareAndSet(false, true)) interlope()
      LinkCommitStore.putIfAbsent(target, bytes)
    }
  }

  test("enableIdentity records the current max; appends allocate above it") {
    val root = tmpDir("id-")
    val t = VersionedTable(root)
    t.commit(Seq((10L, "a"), (42L, "b")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    assert(t.identityOf(t.resolve()).contains(("id", 42L)))
    val (_, first, last) = t.appendIdentity(spark, Seq("c", "d", "e").toDF("k"))
    assert(first === 43L && last === 45L)
    val ids = t.read(spark).select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(10L, 42L, 43L, 44L, 45L))
    assert(t.identityOf(t.resolve()).contains(("id", 45L)))
  }

  test("explicit writes of the identity column are refused; non-BIGINT refused") {
    val root = tmpDir("id-ref-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    intercept[IllegalArgumentException](
      t.appendIdentity(spark, Seq((9L, "x")).toDF("id", "k")))
    intercept[IllegalArgumentException](t.enableIdentity(spark, "k"))
    intercept[IllegalArgumentException](t.enableIdentity(spark, "nope"))
  }

  test("racing allocators never duplicate an id (loser re-assigns above the new water)") {
    val root = tmpDir("id-race-") + "/t"
    VersionedTable(root).commit(Seq((5L, "a")).toDF("id", "k"))
    VersionedTable(root).enableIdentity(spark, "id")
    val t = new VersionedTable(root, new FireOnce(() => {
      VersionedTable(root).appendIdentity(spark, Seq("i1", "i2").toDF("k")); ()
    }))
    t.appendIdentity(spark, Seq("m1", "m2").toDF("k"))
    val ids = VersionedTable(root).read(spark).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids === Seq(5L, 6L, 7L, 8L, 9L), s"got $ids")
    assert(VersionedTable(root).identityOf(VersionedTable(root).resolve())
      .contains(("id", 9L)))
  }

  test("a shallow clone carries the identity declaration and water") {
    val base = tmpDir("id-clone-")
    val t = VersionedTable(s"$base/src")
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    t.appendIdentity(spark, Seq("b", "c").toDF("k")) // ids 2, 3
    val c = t.cloneShallow(s"$base/dst")
    assert(c.identityOf(c.resolve()).contains(("id", 3L)))
    val (_, first, _) = c.appendIdentity(spark, Seq("d").toDF("k"))
    assert(first === 4L)
    // the ALWAYS/BY DEFAULT mode carries too: a BY DEFAULT source must not
    // clone into a table that refuses explicit inserts
    val bd = VersionedTable(s"$base/bd")
    bd.commit(Seq((1L, "a")).toDF("id", "k"))
    bd.enableIdentity(spark, "id", allowExplicit = true)
    val bdc = bd.cloneShallow(s"$base/bdc")
    assert(bdc.identityAllowsExplicit(bdc.resolve()),
      "clone dropped the BY DEFAULT mode")
    bdc.appendIdentity(spark, Seq((50L, "explicit")).toDF("id", "k"))
    assert(bdc.identityOf(bdc.resolve()).exists(_._2 >= 50L))
  }

  test("UPDATE SET and MERGE SET on the identity column are refused") {
    val root = tmpDir("id-set-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a"), (2L, "b")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    intercept[IllegalArgumentException](
      t.update(spark, "k = 'a'", Map("id" -> "99")))
    intercept[IllegalArgumentException](
      t.mergeCow(spark, Seq((1L, "z")).toDF("mk", "mv"),
        "source.mk = target.id", "id", "mk",
        Some(Merge.MatchedUpdate(None, Map("id" -> "source.mk + 100")))))
    // the table is untouched: no version burned, ids intact
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq
      === Seq(1L, 2L))
  }

  test("overwrite with explicit ids above the water raises it — no later duplicate mint") {
    val root = tmpDir("id-ow-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id") // water = 1
    // the connector's INSERT OVERWRITE funnel: a full frame with explicit
    // ids way above the watermark
    t.commit(Seq((50L, "x"), (60L, "y")).toDF("id", "k"))
    assert(t.identityOf(t.resolve()).exists { case (c, hw) => c == "id" && hw >= 60L },
      s"watermark must rise past written ids, got ${t.identityOf(t.resolve())}")
    val (_, first, _) = t.appendIdentity(spark, Seq("z").toDF("k"))
    assert(first >= 61L, s"minted $first inside the explicitly written range")
  }

  test("RENAME re-points the identity declaration; DROP of it is refused") {
    val root = tmpDir("id-ren-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    t.renameColumn("id", "row_id")
    assert(t.identityOf(t.resolve()).contains(("row_id", 1L)))
    val (_, first, _) = t.appendIdentity(spark, Seq("b").toDF("k"))
    assert(first === 2L, "insert after rename must allocate via the new name")
    intercept[IllegalArgumentException](t.dropColumn("row_id"))
  }

  test("a non-deterministic source evaluates once: ids, count, and water agree") {
    val root = tmpDir("id-nd-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "seed")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    // rand-filtered source: re-evaluation would change the row set between
    // the zip/count/write passes — the persist pin must hold them together
    val nd = spark.range(0, 1000).selectExpr("concat('r', id) AS k")
      .where(org.apache.spark.sql.functions.rand() < 0.5)
    val (_, first, last) = t.appendIdentity(spark, nd)
    val rows = t.read(spark).filter("k != 'seed'")
    val ids = rows.select("id").as[Long].collect().sorted.toSeq
    assert(ids === (first to last), s"ids not contiguous: $ids vs [$first,$last]")
    assert(t.identityOf(t.resolve()).contains(("id", last)))
  }

  test("GENERATED BY DEFAULT: explicit ids accepted per-row, water rises past them") {
    val root = tmpDir("id-bd-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id", allowExplicit = true)
    // migration backfill: historical ids inserted as-is
    t.appendIdentity(spark, Seq((100L, "h1"), (200L, "h2")).toDF("id", "k"))
    assert(t.identityOf(t.resolve()).exists(_._2 >= 200L),
      s"water must rise past backfilled ids, got ${t.identityOf(t.resolve())}")
    // mixed batch: null = allocate, non-null = keep; allocation clears the
    // batch's OWN explicit max too (an explicit id inside hw+1..hw+n would
    // otherwise duplicate within one call)
    val (_, first, last) = t.appendIdentity(spark,
      Seq((Some(500L), "e"), (Option.empty[Long], "n")).toDF("id", "k"))
    assert(first === 501L && last === 501L, s"allocated [$first,$last]")
    // an omitted-column batch allocates above everything so far
    val (_, f2, _) = t.appendIdentity(spark, Seq("z").toDF("k"))
    assert(f2 === 502L, s"allocation must clear the explicit 500, got $f2")
    val ids = t.read(spark).select("id").as[Long].collect().sorted.toSeq
    assert(ids === Seq(1L, 100L, 200L, 500L, 501L, 502L))
  }

  test("BY DEFAULT mixed batch: an explicit id inside the would-be range never duplicates") {
    val root = tmpDir("id-bd-mix-")
    val t = VersionedTable(root)
    t.commit(Seq((10L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id", allowExplicit = true) // water = 10
    // explicit 12 sits exactly where naive hw+1..hw+2 allocation would land
    t.appendIdentity(spark, Seq((Some(12L), "e"),
      (Option.empty[Long], "n1"), (Option.empty[Long], "n2")).toDF("id", "k"))
    val ids = t.read(spark).select("id").as[Long].collect().sorted.toSeq
    assert(ids.distinct.size === ids.size, s"within-batch duplicate id: $ids")
    assert(ids === Seq(10L, 12L, 13L, 14L), s"got $ids")
    assert(t.identityOf(t.resolve()).contains(("id", 14L)))
  }

  test("BY DEFAULT race: allocator vs explicit backfill never duplicate") {
    val root = tmpDir("id-bd-race-") + "/t"
    VersionedTable(root).commit(Seq((5L, "a")).toDF("id", "k"))
    VersionedTable(root).enableIdentity(spark, "id", allowExplicit = true)
    val t = new VersionedTable(root, new FireOnce(() => {
      VersionedTable(root).appendIdentity(spark,
        Seq((50L, "backfill")).toDF("id", "k")); ()
    }))
    t.appendIdentity(spark, Seq("m1", "m2").toDF("k"))
    val ids = VersionedTable(root).read(spark).select("id").as[Long]
      .collect().sorted.toSeq
    assert(ids === Seq(5L, 50L, 51L, 52L),
      s"loser must re-allocate above the backfill-raised water, got $ids")
  }

  test("stats-less commits refuse on identity tables (the watermark raise reads stats)") {
    val root = tmpDir("id-st-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id", allowExplicit = true)
    intercept[IllegalArgumentException](
      t.commit(Seq((100L, "x")).toDF("id", "k"), collectStats = false))
    intercept[IllegalArgumentException](
      t.append(Seq((100L, "x")).toDF("id", "k"), collectStats = false))
    // with stats the same writes are safe: the raise sees the ids
    t.append(Seq((100L, "x")).toDF("id", "k"))
    assert(t.identityOf(t.resolve()).exists(_._2 >= 100L))
  }

  test("rewrites and RESTORE carry the water forward — no range re-opens") {
    val root = tmpDir("id-carry-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "k"))
    t.enableIdentity(spark, "id")
    t.appendIdentity(spark, Seq("b", "c").toDF("k")) // ids 2, 3
    t.delete(spark, "id >= 2") // rewrite: water must survive
    assert(t.identityOf(t.resolve()).contains(("id", 3L)))
    t.restore(1L) // back to the pre-append snapshot
    assert(t.identityOf(t.resolve()).contains(("id", 3L)),
      "RESTORE must not re-open the allocated range")
    val (_, first, _) = t.appendIdentity(spark, Seq("d").toDF("k"))
    assert(first === 4L)
  }
}
