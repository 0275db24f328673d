package graft.table

import java.nio.file.{Files, Path, StandardOpenOption}

/** The commit primitive behind [[VersionedTable]]'s publish protocol: an
  * ATOMIC create-if-absent of a small metadata document (a manifest or a
  * txn sidecar version). Everything else in the format — immutable data
  * files, self-contained manifests — is storage-agnostic; this one
  * operation is where object stores differ, so it is the one seam:
  *
  *  - HDFS / POSIX: hard-link CAS ([[LinkCommitStore]]) — `createLink`
  *    fails with FileAlreadyExistsException when the target exists, unlike
  *    rename(2), which silently REPLACES it.
  *  - S3-class object stores: conditional PUT (`If-None-Match: *`) —
  *    modeled by [[ConditionalPutCommitStore]] as a single atomic
  *    CREATE_NEW write, the same win-or-collide contract the real call
  *    gives (S3 has supported it natively since 2024; GCS/ADLS for
  *    longer). A deployment would subclass with the store's SDK call.
  *
  * The contract both the manifest CAS and the sidecar ratchet rely on:
  * exactly ONE of any number of concurrent `putIfAbsent` calls to the same
  * target returns true, and a reader never observes a partial document
  * (create is atomic; the losing writer's bytes never land). */
trait CommitStore {
  /** Atomically create `target` with `bytes` iff it does not exist.
    * @return true iff THIS call created it (won the race). */
  def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean
}

/** Hard-link CAS: write to a temp sibling, link into place, drop the temp.
  * The link is the commit point — atomic and create-only on POSIX/HDFS. */
object LinkCommitStore extends CommitStore {
  override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = target.getParent.resolve(s".tmp-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }
}

/** An S3-class deployment's FAILURE surface modeled over any inner store,
  * together with the recovery discipline a production client must
  * implement — the conformance harness for "would this survive a real
  * object store", runnable under every race spec the plain stores pass:
  *
  *  - THROTTLE (503 retry storm): the attempt fails BEFORE any bytes move;
  *    safe to retry blindly, bounded by `maxRetries` like the SDK budget.
  *  - LOST RESPONSE: the conditional PUT **landed** but the 200 never
  *    arrived — the ambiguous outcome, and the real-world trap: a naive
  *    client retries, gets "already exists" FOR ITS OWN COMMIT, concludes
  *    it lost the race, and re-commits its batch as a new version
  *    (duplicate data) or abandons a rebase it actually won. Recovery is
  *    read-back self-identification: create-if-absent guarantees the
  *    visible bytes are the winner's complete payload, so `bytes == mine ⟺
  *    I won`. This is why EVERY ambiguous or losing verdict here re-reads
  *    the object before reporting. (It relies on payloads being
  *    writer-unique — manifests carry a fresh commit UUID, so they are;
  *    two IDENTICAL racing payloads would both claim the win, which is
  *    exactly when the claim is semantically harmless.)
  *  - DUPLICATE DELIVERY: a network-level retry re-delivers an
  *    already-acknowledged PUT; create-if-absent absorbs it as a no-op and
  *    the original verdict stands.
  *
  * (List-after-write lag is deliberately NOT modeled: S3 has been strongly
  * consistent for list-after-write since 2020-12, and GCS/ADLS longer —
  * the lag class this store would have had to defend against no longer
  * exists on the stores the conditional-PUT path targets.)
  *
  * Faults draw from a seeded generator; the shared-state interleaving
  * under concurrency is scheduler-dependent (as real faults are), but a
  * single-threaded replay of a seed is reproducible. */
final class FaultyCommitStore(inner: CommitStore, seed: Long,
    throttleProb: Double = 0.3, lostResponseProb: Double = 0.3,
    duplicateProb: Double = 0.3, maxRetries: Int = 30) extends CommitStore {
  private val rnd = new java.util.Random(seed)
  private def roll(p: Double): Boolean = synchronized(rnd.nextDouble() < p)

  /** Count of injected faults, for specs to assert the run actually
    * exercised the failure paths rather than passing vacuously. */
  val injected = new java.util.concurrent.atomic.AtomicLong()

  override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    var attempt = 0
    while (true) {
      attempt += 1
      if (attempt > maxRetries)
        throw new java.io.IOException(s"retry budget exhausted for $target")
      if (roll(throttleProb)) {
        injected.incrementAndGet() // 503 before any bytes moved: retry
      } else {
        val won = inner.putIfAbsent(target, bytes)
        if (roll(duplicateProb)) { // redelivery of the acknowledged PUT
          injected.incrementAndGet()
          inner.putIfAbsent(target, bytes)
          ()
        }
        if (won && roll(lostResponseProb)) {
          injected.incrementAndGet()
          return readBackWon(target, bytes) // ambiguous: disambiguate
        }
        if (!won) return readBackWon(target, bytes) // collision — with us?
        return true
      }
    }
    false // unreachable
  }

  /** The winner's bytes are visible and complete (the trait's no-partial
    * contract), so equality with what we tried to write IS the verdict. */
  private def readBackWon(target: Path, bytes: Array[Byte]): Boolean =
    java.util.Arrays.equals(Files.readAllBytes(target), bytes)
}

/** Conditional-PUT shape: the local-filesystem model of
  * `PUT If-None-Match: *`. A real conditional PUT is atomic at OBJECT
  * granularity — the key either doesn't exist or holds the complete bytes,
  * never a prefix. `Files.write(CREATE_NEW)` does NOT model that: the name
  * becomes visible at create, before the bytes land, so a concurrent
  * manifest reader could observe a truncated document — violating the
  * trait's no-partial-reads contract. Model the visible-name semantics the
  * same way [[LinkCommitStore]] does (full temp write, then an atomic
  * create-only link); a deployment subclasses with the store SDK's own
  * conditional PUT, which is atomic natively. Kept a separate object so the
  * race specs keep proving the protocol against both entry points. */
object ConditionalPutCommitStore extends CommitStore {
  override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean = {
    val tmp = target.getParent.resolve(s".put-${java.util.UUID.randomUUID()}")
    Files.write(tmp, bytes, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
    try { Files.createLink(target, tmp); true }
    catch { case _: java.nio.file.FileAlreadyExistsException => false }
    finally { Files.deleteIfExists(tmp); () }
  }
}
