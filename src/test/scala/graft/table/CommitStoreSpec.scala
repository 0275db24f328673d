package graft.table

import graft.SparkSpec
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.{Files, Paths}
import scala.concurrent.ExecutionContext.Implicits.global
import scala.concurrent.duration._
import scala.concurrent.{Await, Future}

/** The commit protocol proven against BOTH [[CommitStore]] semantics: the
  * hard-link CAS (HDFS/POSIX) and the conditional-PUT shape (S3-class
  * object stores). The table format never changes — only the one atomic
  * create-if-absent primitive — so every concurrency guarantee must hold
  * identically under each. */
class CommitStoreSpec extends AnyFunSuite with SparkSpec {
  import spark.implicits._

  private val stores = Seq(
    "link" -> LinkCommitStore,
    "conditional-put" -> ConditionalPutCommitStore,
    // the S3 failure model over the conditional-PUT impl: 503 storms,
    // lost responses (read-back disambiguation), duplicate delivery —
    // every invariant below must hold under injected faults too
    "faulty-s3" -> new FaultyCommitStore(ConditionalPutCommitStore, seed = 13L))

  stores.foreach { case (name, store) =>
    test(s"[$name] exactly one of N concurrent putIfAbsent calls wins") {
      val dir = Paths.get(tmpDir("cs-"))
      val target = dir.resolve("v00000000.json")
      val gate = new java.util.concurrent.CountDownLatch(1)
      val attempts = (1 to 8).map { i =>
        Future { gate.await(); store.putIfAbsent(target, s"writer-$i".getBytes) }
      }
      gate.countDown()
      val results = attempts.map(Await.result(_, 60.seconds))
      assert(results.count(identity) === 1, s"wins: $results")
      // the document on disk is exactly one writer's complete payload
      val content = new String(Files.readAllBytes(target))
      assert(content.matches("writer-\\d"))
      // losers' temp residue (link impl) never leaks as a visible name
      val names = Option(dir.toFile.list()).map(_.toSeq).getOrElse(Seq.empty)
      assert(names.forall(!_.startsWith(".tmp-")), s"temp residue: $names")
    }

    test(s"[$name] a losing putIfAbsent never corrupts the winner's bytes") {
      val dir = Paths.get(tmpDir("cs-"))
      val target = dir.resolve("m.json")
      assert(store.putIfAbsent(target, "first".getBytes))
      assert(!store.putIfAbsent(target, "second".getBytes))
      assert(new String(Files.readAllBytes(target)) === "first")
    }

    test(s"[$name] pinned rewrites surface lost updates as ConcurrentCommitException") {
      val root = tmpDir("cs-")
      val t = VersionedTable(root, store)
      t.commit(Seq((1, "a"), (2, "b"), (3, "c")).toDF("id", "k"))
      // two writers read the SAME head, then both try to publish v1
      val gate = new java.util.concurrent.CountDownLatch(1)
      def attempt(cond: String): Future[Boolean] = Future {
        gate.await()
        try { VersionedTable(root, store).delete(spark, cond); true }
        catch { case _: ConcurrentCommitException => false }
      }
      val fa = attempt("id = 1"); val fb = attempt("id = 2")
      gate.countDown()
      val (aOk, bOk) = (Await.result(fa, 120.seconds), Await.result(fb, 120.seconds))
      assert(aOk || bOk, "one writer must win")
      if (aOk && bOk) {
        // both may win only by serializing (v1 then v2) — both deletes land
        assert(t.read(spark).count() === 1L)
      } else {
        // the loser observed the collision instead of silently dropping the
        // winner's commit — the lost-update hazard the CAS exists to close
        assert(t.read(spark).count() === 2L)
      }
    }

    test(s"[$name] concurrent appends all land via retry (no lost batches)") {
      val root = tmpDir("cs-")
      val t = VersionedTable(root, store)
      t.commit(Seq(0).toDF("x"))
      val gate = new java.util.concurrent.CountDownLatch(1)
      val appends = (1 to 4).map { i =>
        Future { gate.await(); VersionedTable(root, store).append(Seq(i).toDF("x")) }
      }
      gate.countDown()
      appends.foreach(Await.result(_, 120.seconds))
      assert(t.read(spark).as[Int].collect().sorted.toSeq === Seq(0, 1, 2, 3, 4))
    }
  }

  stores.foreach { case (name, store) =>
    test(s"[$name] a visible manifest is always COMPLETE (no partial reads)") {
      // the trait's contract the whole protocol leans on: latestVersion()
      // followed by a manifest read must never see a truncated document. A
      // polling reader races 64 puts; any observation of a visible target
      // with fewer bytes than the full payload is a violation (CREATE_NEW
      // without a temp stage exposes the name before the bytes land).
      val dir = Paths.get(tmpDir("cs-"))
      val payload = Array.fill(512 * 1024)('x'.toByte)
      @volatile var running = true
      @volatile var violation: Option[Long] = None
      val reader = new Thread(() => {
        while (running) {
          Option(dir.toFile.list()).toSeq.flatten.filterNot(_.startsWith(".")).foreach { n =>
            val sz = try Files.size(dir.resolve(n)) catch { case _: Exception => payload.length.toLong }
            if (sz != payload.length.toLong && violation.isEmpty) violation = Some(sz)
          }
        }
      })
      reader.start()
      (0 until 64).foreach(i => assert(store.putIfAbsent(dir.resolve(f"v$i%08d.json"), payload)))
      running = false
      reader.join(10000)
      assert(violation.isEmpty,
        s"reader observed a partial manifest of ${violation.getOrElse(-1L)} bytes")
    }
  }

  stores.foreach { case (name, _) =>
    test(s"[$name] exactly one of N concurrent OS PROCESSES wins, and the " +
        "visible document is the winner's complete bytes") {
      // the in-JVM races above share one filesystem view through one page
      // cache handle table; real deployments race across machines. Forked
      // JVMs are the strongest local proxy: separate processes, separate
      // file descriptors, no shared JVM state — only the filesystem's own
      // atomicity can arbitrate. A start-barrier file lines all children up
      // before any putIfAbsent fires.
      val dir = tmpDir("cs-proc-")
      val target = Paths.get(dir, "v00000001.json")
      val go = Paths.get(dir, "go")
      val javaBin = Paths.get(System.getProperty("java.home"), "bin", "java").toString
      val cp = System.getProperty("java.class.path")
      val storeArg = name match {
        case "link" => "link"
        case "faulty-s3" => "faulty"
        case _ => "put"
      }
      val procs = (1 to 6).map { i =>
        new ProcessBuilder(javaBin, "-cp", cp, "graft.table.CommitRaceChild",
          storeArg, target.toString, i.toString, go.toString)
          .redirectErrorStream(true).start()
      }
      Files.write(go, Array.emptyByteArray)
      val outs = procs.map { p =>
        assert(p.waitFor(60, java.util.concurrent.TimeUnit.SECONDS),
          "race child did not exit")
        new String(p.getInputStream.readAllBytes(), "UTF-8").trim
      }
      val winners = outs.filter(_.startsWith("WIN"))
      assert(winners.size === 1, s"outputs: $outs")
      assert(outs.count(_.startsWith("LOSE")) === 5)
      val id = winners.head.split(" ").last
      val content = new String(Files.readAllBytes(target), "UTF-8")
      // complete, untorn, unmixed: exactly the winner's payload
      assert(content === s"writer-$id:" + ("x" * 65536) + s":end-$id")
    }
  }

  test("cross-impl: a link writer and a conditional-put writer cannot both win") {
    // one table, two processes configured with DIFFERENT store impls (a
    // migration window): the primitive is create-if-absent either way, so
    // the race still has exactly one winner
    val dir = Paths.get(tmpDir("cs-"))
    val target = dir.resolve("v00000001.json")
    val gate = new java.util.concurrent.CountDownLatch(1)
    val fa = Future { gate.await(); LinkCommitStore.putIfAbsent(target, "link".getBytes) }
    val fb = Future { gate.await(); ConditionalPutCommitStore.putIfAbsent(target, "put".getBytes) }
    gate.countDown()
    val (a, b) = (Await.result(fa, 60.seconds), Await.result(fb, 60.seconds))
    assert(a ^ b, s"exactly one impl must win (link=$a, put=$b)")
    val content = new String(Files.readAllBytes(target))
    assert(if (a) content === "link" else content === "put")
  }
}
