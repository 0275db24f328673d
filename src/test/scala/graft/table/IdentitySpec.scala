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
