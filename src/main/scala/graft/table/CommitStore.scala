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

/** Conditional-PUT shape: one atomic CREATE_NEW write, no temp file — the
  * local-filesystem model of `PUT If-None-Match: *`. Kept separate from
  * [[LinkCommitStore]] so the protocol is proven against BOTH semantics
  * (the race specs run against each). */
object ConditionalPutCommitStore extends CommitStore {
  override def putIfAbsent(target: Path, bytes: Array[Byte]): Boolean =
    try {
      Files.write(target, bytes, StandardOpenOption.CREATE_NEW, StandardOpenOption.WRITE)
      true
    } catch { case _: java.nio.file.FileAlreadyExistsException => false }
}
