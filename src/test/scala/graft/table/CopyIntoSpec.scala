package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths, Path}
import java.util.concurrent.atomic.AtomicBoolean

/** COPY INTO ([[VersionedTable.copyInto]]): idempotent file ingestion whose
  * memory (the ingested source identities) commits in the SAME manifest as
  * the rows — re-runs, crashes, and racing copies can never ingest a file
  * twice; checkpoints accumulate the memory so vacuumed manifests don't
  * forget it. */
class CopyIntoSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def writeSrc(dir: String, name: String, rows: Seq[(Long, String)]): Unit = {
    val tmp = Files.createTempDirectory("cis-stage-")
    rows.toDF("id", "k").coalesce(1).write.mode("overwrite").parquet(tmp.toString)
    val part = Files.list(tmp).iterator()
    var src: Path = null
    while (part.hasNext) { val p = part.next()
      if (p.getFileName.toString.endsWith(".parquet")) src = p }
    Files.createDirectories(Paths.get(dir))
    Files.copy(src, Paths.get(dir, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }

  private def emptyTable(root: String): VersionedTable = {
    val t = VersionedTable(root)
    t.commit(Seq.empty[(Long, String)].toDF("id", "k"))
    t
  }

  test("first copy ingests; re-run is a no-op; new and modified files re-ingest") {
    val base = tmpDir("ci-")
    val src = s"$base/src"
    writeSrc(src, "a.parquet", Seq((1L, "a"), (2L, "b")))
    writeSrc(src, "b.parquet", Seq((3L, "c")))
    val t = emptyTable(s"$base/t")
    val (_, n1) = t.copyInto(spark, src)
    assert(n1 === 2L)
    assert(t.read(spark).count() === 3)
    // idempotent re-run
    val (_, n2) = t.copyInto(spark, src)
    assert(n2 === 0L && t.read(spark).count() === 3)
    // a new file ingests alone
    writeSrc(src, "c.parquet", Seq((4L, "d")))
    val (_, n3) = t.copyInto(spark, src)
    assert(n3 === 1L && t.read(spark).count() === 4)
    // a MODIFIED file (same name, new bytes) is a new identity
    writeSrc(src, "b.parquet", Seq((30L, "cc"), (31L, "dd")))
    val (_, n4) = t.copyInto(spark, src)
    assert(n4 === 1L)
    assert(t.read(spark).select("id").as[Long].collect().sorted.toSeq ===
      Seq(1L, 2L, 3L, 4L, 30L, 31L))
  }

  test("racing COPY INTO of the same directory never duplicates rows") {
    val base = tmpDir("ci-race-")
    val src = s"$base/src"
    writeSrc(src, "a.parquet", Seq((1L, "a")))
    writeSrc(src, "b.parquet", Seq((2L, "b")))
    emptyTable(s"$base/t")
    final class FireOnce(interlope: () => Unit) extends CommitStore {
      private val fired = new AtomicBoolean(false)
      override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
        if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
            fired.compareAndSet(false, true)) interlope()
        LinkCommitStore.putIfAbsent(target, bytes)
      }
    }
    val t = new VersionedTable(s"$base/t", new FireOnce(() => {
      VersionedTable(s"$base/t").copyInto(spark, src); ()
    }))
    t.copyInto(spark, src) // loser re-filters and lands a no-op or remainder
    val rows = VersionedTable(s"$base/t").read(spark)
      .as[(Long, String)].collect().sorted.toSeq
    assert(rows === Seq((1L, "a"), (2L, "b")), s"got $rows")
  }

  test("checkpoints accumulate ingestion memory across vacuumed manifests") {
    val base = tmpDir("ci-ckpt-")
    val src = s"$base/src"
    writeSrc(src, "a.parquet", Seq((1L, "a")))
    val t = emptyTable(s"$base/t")
    t.copyInto(spark, src)
    // churn versions so the copy's manifest can be vacuumed away
    (1 to 3).foreach(i => t.append(Seq((100L + i, "x")).toDF("id", "k")))
    t.checkpoint(spark)
    t.vacuum(retainVersions = 1)
    val (_, n) = t.copyInto(spark, src)
    assert(n === 0L, "a vacuumed manifest must not forget its ingested files")
    assert(t.read(spark).filter("id = 1").count() === 1)
  }

  test("COPY INTO an identity table refuses (ids allocate at the commit point)") {
    val base = tmpDir("ci-id-")
    writeSrc(s"$base/src", "a.parquet", Seq((1L, "a")))
    val t = emptyTable(s"$base/t")
    t.enableIdentity(spark, "id")
    intercept[IllegalStateException](t.copyInto(spark, s"$base/src"))
  }

  test("SQL verb: COPY INTO ... FROM reports the ingested count") {
    val base = tmpDir("ci-sql-")
    val src = s"$base/src"
    writeSrc(src, "a.parquet", Seq((1L, "a"), (2L, "b")))
    val t = emptyTable(s"$base/t")
    val out = TableSql.run(spark, s"COPY INTO '${t.root}' FROM '$src'")
    assert(out.select("files_ingested").head.getLong(0) === 1L)
    assert(t.read(spark).count() === 2)
  }

  test("COPY INTO a BY DEFAULT identity table: files supply ids and the " +
      "water rises; files lacking the column refuse (nulls never allocate here)") {
    val base = tmpDir("ci-bd-")
    writeSrc(s"$base/src", "a.parquet", Seq((100L, "backfill")))
    val t = emptyTable(s"$base/t")
    t.enableIdentity(spark, "id", allowExplicit = true)
    val (_, n) = t.copyInto(spark, s"$base/src")
    assert(n === 1L)
    assert(t.identityOf(t.resolve()).exists(_._2 >= 100L),
      "the watermark must rise past the file-supplied ids")
    val (_, first, _) = t.appendIdentity(spark, Seq("new").toDF("k"))
    assert(first >= 101L)
    // a landing file WITHOUT the id column reads as all-null → refuse
    val noid = s"$base/noid"
    Seq(Tuple1("k-only")).toDF("k").coalesce(1).write.parquet(noid)
    val e = intercept[IllegalArgumentException](t.copyInto(spark, noid))
    assert(e.getMessage.contains("never allocated on this path"))
  }

  test("a wide landing tree lists in parallel tasks: same identities, " +
      "same idempotence") {
    val base = tmpDir("ci-wide-")
    val src = s"$base/land"
    // ≥ ParallelListMinDirs first-level subtrees + a root-level file:
    // exercises the distributed listing path end to end
    (0 until 10).foreach { d =>
      writeSrc(s"$src/part=$d", "a.parquet", Seq((d.toLong, s"d$d")))
      writeSrc(s"$src/part=$d/nested", "b.parquet", Seq((100L + d, s"n$d")))
    }
    writeSrc(src, "root.parquet", Seq((999L, "root")))
    val t = emptyTable(s"$base/t")
    val (_, n1) = t.copyInto(spark, src)
    assert(n1 === 21L, s"10 dirs × 2 files + 1 root file, got $n1")
    assert(t.read(spark).count() === 21)
    // idempotent re-run: the distributed identities must match the
    // recorded memory exactly (no path-rendering drift)
    val (_, n2) = t.copyInto(spark, src)
    assert(n2 === 0L && t.read(spark).count() === 21)
    // one newly landed file in one subtree ingests alone
    writeSrc(s"$src/part=3", "c.parquet", Seq((500L, "late")))
    val (_, n3) = t.copyInto(spark, src)
    assert(n3 === 1L && t.read(spark).count() === 22)
  }

  test("DEFAULT-column omission inference failing fails the copy loudly " +
      "instead of silently null-filling") {
    val base = tmpDir("ci-def-")
    val root = s"$base/t"
    val t = VersionedTable(root)
    t.commit(Seq.empty[(Long, String)].toDF("id", "k"))
    t.setColumnDefault(spark, "k", Some("'filled'"))
    val src = s"$base/src"
    // a source "parquet" file whose footer is garbage: schema inference
    // for the omission decision cannot succeed
    Files.createDirectories(Paths.get(src))
    Files.write(Paths.get(src, "broken.parquet"),
      "not a parquet file".getBytes("UTF-8"))
    val e = intercept[IllegalStateException](t.copyInto(spark, src))
    assert(e.getMessage.contains("DEFAULT"), e.getMessage)
    assert(t.read(spark).count() === 0, "the failed copy must ingest nothing")
  }
}
