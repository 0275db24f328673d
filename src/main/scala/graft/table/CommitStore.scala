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
