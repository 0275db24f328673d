package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}

/** The incremental commit log: per-commit manifests record only the
  * add/remove DELTA (format 2) and state is replayed from the nearest
  * anchor — a checkpoint's full-state sidecar, a snapshot manifest, or a
  * warm cache entry. This is what keeps commit cost O(batch) instead of
  * O(live files): at 100 TB a million-file table must not re-serialize its
  * whole file list on every streaming micro-batch or COPY INTO funnel. */
class CommitLogSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  private def manifest(root: String, v: Long) =
    mapper.readTree(Files.readAllBytes(
      Paths.get(root, "_graft_log", f"v$v%08d.json")))

  private def manifestBytes(root: String, v: Long): Long =
    Files.size(Paths.get(root, "_graft_log", f"v$v%08d.json"))

  test("appends to a multi-thousand-file table write O(batch) delta manifests") {
    val root = tmpDir("clog-")
    val t = VersionedTable(root)
    // v0: a 2000-file snapshot (the full manifest carries every path+stats)
    t.commit((1L to 20000L).map(i => (i, s"v$i")).toDF("id", "s"),
      numPartitions = Some(2000))
    val full = manifestBytes(root, 0L)
    assert(manifest(root, 0L).has("files") &&
      manifest(root, 0L).get("formatVersion").asLong() === 1L)
    // five batch-sized appends: each manifest must encode ONLY the batch
    (1 to 5).foreach { i =>
      t.append(Seq((100000L + i, "x"), (200000L + i, "y")).toDF("id", "s"),
        numPartitions = Some(2))
    }
    (1L to 5L).foreach { v =>
      val node = manifest(root, v)
      assert(!node.has("files"), s"v$v must be a delta manifest")
      assert(node.get("formatVersion").asLong() === 2L)
      assert(node.get("add").size() === 2, s"v$v adds exactly the batch")
      assert(!node.has("remove"), "an append removes nothing")
      val bytes = manifestBytes(root, v)
      assert(bytes * 50 < full,
        s"delta manifest v$v is $bytes B — not O(batch) vs the $full B snapshot")
    }
    assert(t.read(spark).count() === 20010L)
    // time travel replays the delta tail to the requested version
    assert(t.read(spark, versionAsOf = Some(2L)).count() === 20004L)
    // cold JVM: no warm snapshots — reconstruction comes from disk anchors
    VersionedTable.clearStateCache()
    val t2 = VersionedTable(root)
    assert(t2.read(spark).count() === 20010L)
    assert(t2.read(spark, versionAsOf = Some(3L)).count() === 20006L)
    // stats survive the delta round-trip: pruning still sees per-file bounds
    assert(t2.rowCountOf(spark).contains(20010L))
  }

  test("checkpoints anchor replay; vacuum materializes the retention floor") {
    val root = tmpDir("clog-ck-")
    val t = VersionedTable(root)
    t.commit(Seq((1L, "a")).toDF("id", "s"))
    t.setProperties(Map("checkpointInterval" -> "4"))
    (1 to 9).foreach(i => t.append(Seq((10L + i, "b")).toDF("id", "s")))
    assert(t.latestVersion().contains(9L))
    // auto-checkpoints fired on the append funnel; the latest carries the
    // full-state sidecar replay anchors from
    val ckpts = t.checkpointVersions()
    assert(ckpts.nonEmpty)
    assert(Files.exists(Paths.get(root, "_graft_log",
      f"_ckpt-v${ckpts.last}%08d.state.json")))
    // deltas everywhere after v0: no commit re-serialized the file list
    (1L to 9L).foreach(v => assert(!manifest(root, v).has("files"),
      s"v$v should be a delta manifest"))
    VersionedTable.clearStateCache()
    assert(VersionedTable(root).read(spark).count() === 10L)
    // vacuum to the last 3 versions: the floor manifest (v7) must become
    // self-contained — its delta would otherwise replay through dropped ones
    t.vacuum(retainVersions = 3)
    assert(t.versions() === Seq(7L, 8L, 9L))
    assert(manifest(root, 7L).has("files"),
      "the retention floor must be materialized into a snapshot")
    VersionedTable.clearStateCache()
    val t2 = VersionedTable(root)
    assert(t2.read(spark).count() === 10L)
    assert(t2.read(spark, versionAsOf = Some(8L)).count() === 9L)
  }

  test("checkpoint-less chains still bound cold replay via the snapshot cadence") {
    val root = tmpDir("clog-sc-")
    val t = VersionedTable(root)
    t.commit(Seq((0L, "z")).toDF("id", "s"))
    (1 to 40).foreach(i => t.append(Seq((i.toLong, "z")).toDF("id", "s")))
    val fulls = (0L to 40L).filter(v => manifest(root, v).has("files"))
    assert(fulls.contains(0L))
    assert(fulls.size >= 2, "a >=32-commit checkpoint-less chain re-anchors")
    assert(fulls.size <= 4, s"snapshots must stay periodic, got $fulls")
    VersionedTable.clearStateCache()
    assert(VersionedTable(root).read(spark).count() === 41L)
  }

  test("racing delta appends against a concurrent checkpoint + vacuum: " +
      "cold-JVM replay equals the serial result") {
    val root = tmpDir("clog-race-")
    val t = VersionedTable(root)
    t.commit(Seq((0L, "seed")).toDF("id", "s"))
    import scala.concurrent.{Await, ExecutionContext, Future}
    import scala.concurrent.duration._
    implicit val ec: ExecutionContext = ExecutionContext.global
    // 4 writers × 6 delta appends each, all CAS-publishing and rebasing
    // against each other, while a maintenance loop checkpoints and vacuums
    // the retention floor (materializing it out from under the replayers)
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val maintenance = Future {
      val tm = VersionedTable(root)
      while (!stop.get) {
        try { tm.checkpoint(spark); () } catch { case _: Exception => () }
        try { tm.vacuum(retainVersions = 8); () } catch { case _: Exception => () }
        Thread.sleep(20)
      }
    }
    val writers = (1 to 4).map { w =>
      Future {
        val tw = VersionedTable(root)
        (0 until 6).foreach { i =>
          tw.append(Seq((w * 1000L + i, s"w$w")).toDF("id", "s"))
        }
      }
    }
    writers.foreach(Await.result(_, 300.seconds))
    stop.set(true)
    Await.result(maintenance, 300.seconds)
    // the serial result: every writer's every row, exactly once — no append
    // lost to a rebase, none double-published, none vacuumed away
    val expect = (for (w <- 1 to 4; i <- 0 until 6) yield w * 1000L + i).toSet
    def ids(tt: VersionedTable): Set[Long] =
      tt.read(spark).select("id").collect().map(_.getLong(0)).toSet
    val live = ids(t)
    assert(live.size === 24 + (if (live.contains(0L)) 1 else 0))
    assert(expect.subsetOf(live), s"missing: ${expect -- live}")
    // cold JVM: replay from disk anchors only (the vacuumed floor must have
    // been materialized; a delta replaying through dropped manifests fails)
    VersionedTable.clearStateCache()
    assert(ids(VersionedTable(root)) === live)
  }

  test("cross-JVM: a forked Spark writer appends deltas while this JVM " +
      "appends, checkpoints and vacuums — replay equals the serial sum") {
    val root = tmpDir("clog-xjvm-")
    val t = VersionedTable(root)
    t.commit(Seq((0L, "seed")).toDF("id", "s"))
    val dir = tmpDir("clog-xjvm-barrier-")
    val ready = Paths.get(dir, "ready"); val go = Paths.get(dir, "go")
    val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
    val cp = System.getProperty("java.class.path")
    // child output goes to a FILE: a Spark child logs more than a pipe
    // buffer holds, and an undrained pipe deadlocks the child mid-append
    val childLog = Paths.get(dir, "child.log")
    val proc = new ProcessBuilder(javaBin, "-cp", cp,
      "graft.table.DeltaRaceChild", root, "7", "6",
      ready.toString, go.toString)
      .redirectErrorStream(true).redirectOutput(childLog.toFile).start()
    val deadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
    while (!Files.exists(ready) && System.nanoTime() < deadline)
      Thread.sleep(50)
    assert(Files.exists(ready), "race child never came up")
    Files.write(go, Array.emptyByteArray)
    // parent leg: interleaved appends + a checkpoint + a floor-dropping
    // vacuum while the child JVM publishes its own delta manifests
    (0 until 6).foreach { i =>
      t.append(Seq((500L + i, "parent")).toDF("id", "s"))
      if (i == 2) { try { t.checkpoint(spark); () } catch { case _: Exception => () } }
      if (i == 4) { try { t.vacuum(retainVersions = 6); () } catch { case _: Exception => () } }
    }
    assert(proc.waitFor(300, java.util.concurrent.TimeUnit.SECONDS),
      "race child did not exit")
    val out = new String(Files.readAllBytes(childLog), "UTF-8")
    assert(out.contains("DONE 7"),
      s"child failed:\n${out.linesIterator.toSeq.takeRight(40).mkString("\n")}")
    // serial sum across both JVMs, from a cold state cache
    VersionedTable.clearStateCache()
    val live = VersionedTable(root).read(spark).select("id")
      .collect().map(_.getLong(0)).toSet
    val expect = (0 until 6).map(500L + _).toSet ++
      (0 until 6).map(700000L + _).toSet
    assert(expect.subsetOf(live), s"missing: ${expect -- live}")
    assert(live.size === expect.size + (if (live.contains(0L)) 1 else 0))
  }

  test("an overwrite writes a snapshot (its delta would be bigger), rewrites stay deltas") {
    val root = tmpDir("clog-ow-")
    val t = VersionedTable(root)
    t.commit((1L to 100L).map(i => (i, s"v$i")).toDF("id", "s"),
      numPartitions = Some(8), sortBy = Seq("id"))
    t.append((101L to 110L).map(i => (i, s"v$i")).toDF("id", "s"))
    // COW delete touches a file subset: remove+add delta
    t.delete(spark, "id <= 10")
    val del = manifest(root, 2L)
    assert(!del.has("files") && del.has("remove"))
    // full overwrite: every old file removed, every new file added — snapshot
    t.commit((1L to 50L).map(i => (i, "w")).toDF("id", "s"), numPartitions = Some(4))
    assert(manifest(root, 3L).has("files"))
    assert(t.read(spark).count() === 50L)
    // MOR delete: a pure dvAdd delta
    t.deleteMor(spark, "id <= 5")
    val mor = manifest(root, 4L)
    assert(!mor.has("files") && mor.has("dvAdd") && !mor.has("add"))
    VersionedTable.clearStateCache()
    assert(VersionedTable(root).read(spark).count() === 45L)
  }
}
