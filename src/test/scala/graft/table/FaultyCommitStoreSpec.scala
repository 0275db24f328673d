package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Path, Paths}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

/** Object-store fault conformance ([[FaultyCommitStore]]): the commit
  * protocol's invariants — one winner, no lost update, serial-equivalent
  * rebase — must hold when the store injects the failures a real S3
  * deployment hits first (503 storms, lost PUT responses, duplicate
  * delivery). The recovery discipline under test is read-back
  * self-identification: an ambiguous or losing verdict re-reads the object
  * and compares bytes, so a writer whose PUT landed but whose response was
  * lost still learns it WON — the naive client would instead re-commit its
  * batch as a duplicate or abandon a rebase it owned. */
class FaultyCommitStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private def target(prefix: String): Path =
    Paths.get(tmpDir(prefix)).resolve("v00000000.json")

  test("lost response resolves to WIN for the writer whose PUT landed — " +
      "and the later loser still reads LOSE") {
    val store = new FaultyCommitStore(ConditionalPutCommitStore, seed = 1L,
      throttleProb = 0.0, lostResponseProb = 1.0, duplicateProb = 0.0)
    val t = target("fcs-lr-")
    // every response is lost; the verdict must come from the read-back
    assert(store.putIfAbsent(t, "mine".getBytes),
      "the writer whose PUT landed must learn it won despite the lost response")
    assert(store.injected.get() > 0, "the fault path must actually fire")
    assert(!store.putIfAbsent(t, "other".getBytes),
      "a genuinely colliding writer must still learn it lost")
    assert(new String(Files.readAllBytes(t)) === "mine")
  }

  test("a 503 storm retries within budget; an exhausted budget fails LOUDLY") {
    val patient = new FaultyCommitStore(ConditionalPutCommitStore, seed = 2L,
      throttleProb = 0.8, lostResponseProb = 0.0, duplicateProb = 0.0,
      maxRetries = 200)
    assert(patient.putIfAbsent(target("fcs-th-"), "x".getBytes))
    assert(patient.injected.get() > 0)
    val hopeless = new FaultyCommitStore(ConditionalPutCommitStore, seed = 3L,
      throttleProb = 1.0, lostResponseProb = 0.0, duplicateProb = 0.0,
      maxRetries = 5)
    intercept[java.io.IOException] {
      hopeless.putIfAbsent(target("fcs-th2-"), "x".getBytes)
    }
  }

  test("duplicate delivery never flips a verdict or corrupts the bytes") {
    val store = new FaultyCommitStore(ConditionalPutCommitStore, seed = 4L,
      throttleProb = 0.0, lostResponseProb = 0.0, duplicateProb = 1.0)
    val t = target("fcs-dup-")
    assert(store.putIfAbsent(t, "first".getBytes))
    assert(!store.putIfAbsent(t, "second".getBytes))
    assert(new String(Files.readAllBytes(t)) === "first")
  }

  test("table protocol under faults: N concurrent appends all land, " +
      "none duplicated, none lost") {
    val root = tmpDir("fcs-tab-") + "/t"
    val mk = () => new FaultyCommitStore(ConditionalPutCommitStore,
      seed = System.identityHashCode(root).toLong,
      throttleProb = 0.2, lostResponseProb = 0.4, duplicateProb = 0.3)
    val seedStore = mk()
    new VersionedTable(root, seedStore).commit(Seq((0L, "seed")).toDF("id", "k"))
    val gate = new java.util.concurrent.CountDownLatch(1)
    val appends = (1 to 6).map { i =>
      Future {
        gate.await()
        // each writer gets its own faulty store handle (its own SDK stack)
        new VersionedTable(root, mk())
          .append(Seq((i.toLong, s"w$i")).toDF("id", "k"))
      }
    }
    gate.countDown()
    appends.foreach(Await.result(_, 300.seconds))
    val ids = VersionedTable(root).read(spark).select("id")
      .as[Long].collect().sorted.toSeq
    assert(ids === (0L to 6L),
      s"every append must land exactly once under injected faults, got $ids")
  }

  test("rebase chains across interloping appends with faults on BOTH writers") {
    val root = tmpDir("fcs-rb-") + "/t"
    VersionedTable(root).commit(
      Seq((1L, "a", 10.0), (2L, "b", 20.0), (3L, "a", 30.0)).toDF("id", "k", "amt"))
    // fire a fresh (faulty-store) append before each of the rewrite's first
    // 3 manifest attempts; the rewrite itself also runs over a faulty store
    val count = new java.util.concurrent.atomic.AtomicLong(0)
    val faulty = new FaultyCommitStore(ConditionalPutCommitStore, seed = 99L,
      throttleProb = 0.2, lostResponseProb = 0.4, duplicateProb = 0.3)
    val store = new CommitStore {
      override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
        if (target.getFileName.toString.matches("v\\d{8}\\.json") &&
            count.incrementAndGet() <= 3)
          new VersionedTable(root, new FaultyCommitStore(
            ConditionalPutCommitStore, seed = count.get(),
            throttleProb = 0.2, lostResponseProb = 0.4, duplicateProb = 0.3))
            .append(Seq((100L + count.get(), "z", 1.0)).toDF("id", "k", "amt"))
        faulty.putIfAbsent(target, bytes)
      }
    }
    val (_, n) = new VersionedTable(root, store).delete(spark, "k = 'a'")
    assert(n === 2)
    val rows = VersionedTable(root).read(spark).as[(Long, String, Double)]
      .collect().sorted.toSeq
    assert(rows.map(_._1) === Seq(2L, 101L, 102L, 103L),
      "the faulted rebase chain must land the exact serial result")
    assert(faulty.injected.get() > 0, "the fault paths must actually fire")
  }
}
