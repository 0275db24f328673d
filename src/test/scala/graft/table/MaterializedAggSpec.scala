package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

class MaterializedAggSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  /** The incremental rewrite-fold path consumes stored CDF — opt in at
    * creation (write-time capture is off by default, Delta parity). */
  private def cdfOn(t: VersionedTable): VersionedTable = {
    t.setProperties(Map("enableChangeDataFeed" -> "true")); t
  }

  test("refresh folds only appended deltas and matches a one-shot aggregate") {
    val base = cdfOn(VersionedTable(tmpDir("mv-")))
    val mv = new MaterializedAgg(base, tmpDir("mv-"), Seq("k"), Seq("s" -> "x"))
    base.commit(Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    mv.refresh(spark)
    base.append(Seq(("a", 10L), ("c", 5L)).toDF("k", "x"))
    mv.refresh(spark)
    val got = mv.read(spark).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 2L, 11L), ("b", 1L, 2L), ("c", 1L, 5L)))
    assert(mv.lastBaseVersion.contains(1L))
  }

  test("MatViewRefresh stage parses and maintains the view from JSON") {
    val baseRoot = tmpDir("mv-")
    val viewRoot = tmpDir("mv-")
    val base = cdfOn(VersionedTable(baseRoot))
    base.commit(Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    val job = graft.etl.JobSpec.fromJson(
      s"""{"stages": [
         |  {"type": "MatViewRefresh", "name": "refresh view",
         |   "baseURI": "$baseRoot", "viewURI": "$viewRoot",
         |   "keys": ["k"], "sums": {"s": "x"}}
         |]}""".stripMargin)
    job.run(spark, Map.empty)
    base.append(Seq(("a", 10L)).toDF("k", "x"))
    job.run(spark, Map.empty) // second refresh folds only the delta
    val got = VersionedTable(viewRoot).read(spark)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 2L, 11L), ("b", 1L, 2L)))
  }

  test("racing refreshes never double-fold a delta") {
    val baseRoot = tmpDir("mv-")
    val viewRoot = tmpDir("mv-")
    val base = cdfOn(VersionedTable(baseRoot))
    base.commit(Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    new MaterializedAgg(base, viewRoot, Seq("k"), Seq("s" -> "x")).refresh(spark)
    base.append(Seq(("a", 10L)).toDF("k", "x"))
    import scala.concurrent.{Await, Future}
    import scala.concurrent.duration._
    import scala.concurrent.ExecutionContext.Implicits.global
    val gate = new java.util.concurrent.CountDownLatch(1)
    def attempt(): Future[Boolean] = Future {
      gate.await()
      try { new MaterializedAgg(base, viewRoot, Seq("k"), Seq("s" -> "x")).refresh(spark); true }
      catch { case _: ConcurrentCommitException => false }
    }
    val fa = attempt(); val fb = attempt()
    gate.countDown()
    val (aOk, bOk) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
    assert(aOk || bOk, "at least one racing refresh must win")
    // the invariant under ANY interleaving: the view equals the one-shot
    // aggregate — a lost-update double fold would show a=12
    val got = VersionedTable(viewRoot).read(spark)
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 2L, 11L), ("b", 1L, 2L)))
  }

  test("rewrites in the refresh window fold through the change feed") {
    val base = cdfOn(VersionedTable(tmpDir("mv-")))
    val mv = new MaterializedAgg(base, tmpDir("mv-"), Seq("k"), Seq("s" -> "x"))
    base.commit(Seq(("a", 1L), ("a", 4L), ("b", 2L), ("c", 7L)).toDF("k", "x"))
    mv.refresh(spark)
    // a mixed window: delete, update, append — served from write-time CDF
    base.delete(spark, "x = 1")                               // -(a,1)
    base.update(spark, "k = 'b'", Map("x" -> "x + 10"))       // b: 2 -> 12
    base.append(Seq(("a", 3L)).toDF("k", "x"))                // +(a,3)
    mv.refresh(spark)
    val got = mv.read(spark).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 2L, 7L), ("b", 1L, 12L), ("c", 1L, 7L)))
    // the invariant: view == one-shot recompute over the current snapshot
    val recompute = base.read(spark).groupBy("k")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.sum("x").as("s"))
      .as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === recompute)
  }

  test("a fully-deleted group leaves the view instead of lingering at zero") {
    val base = cdfOn(VersionedTable(tmpDir("mv-")))
    val mv = new MaterializedAgg(base, tmpDir("mv-"), Seq("k"), Seq("s" -> "x"))
    base.commit(Seq(("a", 1L), ("b", 2L)).toDF("k", "x"))
    mv.refresh(spark)
    base.delete(spark, "k = 'b'")
    mv.refresh(spark)
    val got = mv.read(spark).as[(String, Long, Long)].collect().toSeq
    assert(got === Seq(("a", 1L, 1L)))
  }

  test("a MOR delete folds like a COW delete (positions in, rows out)") {
    val base = cdfOn(VersionedTable(tmpDir("mv-")))
    val mv = new MaterializedAgg(base, tmpDir("mv-"), Seq("k"), Seq("s" -> "x"))
    base.commit(Seq(("a", 1L), ("a", 4L), ("b", 2L)).toDF("k", "x"))
    mv.refresh(spark)
    base.deleteMor(spark, "x = 4")
    mv.refresh(spark)
    val got = mv.read(spark).as[(String, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got === Seq(("a", 1L, 1L), ("b", 1L, 2L)))
  }
}
