package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

/** Incremental clustering (VersionedTable.clusterIncremental): each run
  * Z-orders ONLY the files no previous run over the same spec produced —
  * the ZCube property that keeps nightly OPTIMIZE O(new data). The gate
  * query q132_incremental_cluster proves cross-cube stats skipping and
  * content equality at sf; this spec pins the bookkeeping edges: spec
  * change, stale sidecar, rewrites dropping files from the clustered set,
  * and DV materialization on the rewritten slice. */
class ClusterSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val Spec = Seq("a", "b")

  private def frame(keys: Range) =
    keys.map(k => (k.toLong, (k * 37 % 101).toLong, s"p$k")).toDF("a", "b", "s")

  test("second run clusters only the new files; fully clustered is a no-op") {
    val t = VersionedTable(tmpDir("cl-"))
    t.append(frame(0 until 400), numPartitions = Some(3))
    t.clusterIncremental(spark, Spec, numFiles = Some(3))
    val cube1 = t.filesOf(t.resolve()).toSet
    t.append(frame(400 until 800), numPartitions = Some(3))
    val appended = t.filesOf(t.resolve()).toSet -- cube1
    t.clusterIncremental(spark, Spec, numFiles = Some(3))
    val after = t.filesOf(t.resolve()).toSet
    assert(cube1.subsetOf(after), "first cube must carry verbatim")
    assert(appended.intersect(after).isEmpty, "append files must be rewritten")
    val head = t.resolve()
    assert(t.clusterIncremental(spark, Spec, numFiles = Some(3)) === head,
      "nothing new to cluster: no version burned")
    assert(t.read(spark).count() === 800)
  }

  test("a different spec reclusters the whole snapshot") {
    val t = VersionedTable(tmpDir("cl-"))
    t.append(frame(0 until 300), numPartitions = Some(2))
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    val cube1 = t.filesOf(t.resolve()).toSet
    t.clusterIncremental(spark, Seq("b", "a"), numFiles = Some(2))
    val after = t.filesOf(t.resolve()).toSet
    assert(cube1.intersect(after).isEmpty,
      "the old spec's layout does not serve the new spec — full recluster")
    assert(t.read(spark).count() === 300)
  }

  test("stale sidecar only costs idempotent re-clustering, never a wrong read") {
    val root = tmpDir("cl-")
    val t = VersionedTable(root)
    t.append(frame(0 until 300), numPartitions = Some(2))
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    val expect = t.read(spark).as[(Long, Long, String)].collect().sortBy(_._1).toSeq
    // simulate a crash between the data commit and the sidecar write by
    // deleting the sidecars: the bookkeeping is a cache, so the next run
    // re-clusters everything (wasted work) but content is untouched
    import java.nio.file.{Files, Paths}
    val log = Paths.get(root, "_graft_log")
    Files.list(log).filter(_.getFileName.toString.startsWith("_cluster-v"))
      .forEach(p => Files.delete(p))
    val before = t.filesOf(t.resolve()).toSet
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    assert(t.filesOf(t.resolve()).toSet.intersect(before).isEmpty,
      "with no sidecar every live file counts as unclustered")
    assert(t.read(spark).as[(Long, Long, String)].collect().sortBy(_._1).toSeq === expect)
  }

  test("a COW rewrite drops its victims from the clustered set; the next run re-clusters the rewrite's output") {
    val t = VersionedTable(tmpDir("cl-"))
    t.append(frame(0 until 400), numPartitions = Some(3))
    t.clusterIncremental(spark, Spec, numFiles = Some(3))
    val (_, rewritten) = t.delete(spark, "a BETWEEN 0 AND 20")
    assert(rewritten > 0)
    val afterDelete = t.filesOf(t.resolve()).toSet
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    val after = t.filesOf(t.resolve()).toSet
    // exactly the delete's fresh output was unclustered — the surviving
    // cube files carry, the rewrite output is replaced by the new cube
    assert(afterDelete.intersect(after) ===
      afterDelete.intersect(t.clusterState().get._2))
    assert(t.read(spark).count() === 379)
  }

  test("DV tombstones on the rewritten slice materialize; clustered files keep theirs") {
    val t = VersionedTable(tmpDir("cl-"))
    t.setProperties(Map("enableDeletionVectors" -> "true"))
    t.append(frame(0 until 200), numPartitions = Some(2))
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    // tombstone one row in the clustered cube (DV carries) and append a
    // batch, tombstone one of ITS rows too (DV materializes on cluster)
    t.deleteMor(spark, "a = 5")
    t.append(frame(200 until 400), numPartitions = Some(2))
    t.deleteMor(spark, "a = 205")
    t.clusterIncremental(spark, Spec, numFiles = Some(2))
    val got = t.read(spark).select("a").as[Long].collect().toSet
    assert(!got.contains(5L) && !got.contains(205L) && got.size === 398)
  }
}
