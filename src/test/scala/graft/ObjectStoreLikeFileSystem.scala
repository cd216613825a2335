package graft

import java.net.URI
import org.apache.hadoop.fs.Path

/** Test-only Hadoop `FileSystem` exposing the OBJECT-STORE commit
  * semantics of `ManifestIo`'s third per-scheme family (s3a:/gs:/abfs:)
  * — so those claims run as pins instead of prose:
  *
  *  - '''rename of a FILE is COPY + DELETE, not atomic''': the copy
  *    materializes the destination atomically (a PUT/CopyObject is
  *    atomic — a reader never sees a partial object; modeled as
  *    temp + POSIX rename), and an injectable crash lands BETWEEN the
  *    copy and the source delete (`crashAfterCopyOf`) — the window
  *    where both objects exist.
  *  - '''rename onto an existing destination FILE refuses''' (the S3A
  *    contract), so `ManifestIo.replace` must walk its delete+rename
  *    fallback on every pointer swap after the first — and the
  *    injectable crash after the delete (`crashAfterDeleteOf`) is the
  *    pointer-ABSENT window that only the trail-head roll-forward
  *    closes.
  *  - '''create-exclusive through the generic branch''' — `putIfAbsent`
  *    rides `create(overwrite = false)`, standing in for the store's
  *    conditional PUT (if-none-match), the one atomic primitive the
  *    protocol actually needs.
  *
  * DIRECTORY renames delegate to the POSIX parent: they occur only
  * inside Spark's output committer (whose object-store story is its
  * own special committer, out of scope here) — the protocol under
  * test is the pointer/manifest commit, which renames FILES only.
  * Registered per test via `fs.objstore.impl`; must stay a public
  * no-arg-constructible top-level class (instantiated reflectively).
  */
class ObjectStoreLikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = ObjectStoreLikeFileSystem.Uri

  override def getScheme: String = "objstore"

  override def rename(src: Path, dst: Path): Boolean = {
    val srcIsFile = try getFileStatus(src).isFile
    catch { case _: java.io.FileNotFoundException => false }
    val dstFileExists = try getFileStatus(dst).isFile
    catch { case _: java.io.FileNotFoundException => false }
    if (!srcIsFile) super.rename(src, dst) // committer dir moves: see scaladoc
    else if (dstFileExists) {
      ObjectStoreLikeFileSystem.refusedRenames.incrementAndGet()
      false
    } else {
      // server-side COPY: atomic materialization of dst
      val part = new Path(dst.getParent, s".${dst.getName}.putpart")
      val in = super.open(src, 4096)
      val bytes = try in.readAllBytes() finally in.close()
      val out = super.create(part, true)
      try out.write(bytes) finally out.close()
      if (!super.rename(part, dst))
        throw new java.io.IOException(s"objstore copy: cannot put $dst")
      ObjectStoreLikeFileSystem.copyRenames.incrementAndGet()
      val fault = ObjectStoreLikeFileSystem.crashAfterCopyOf.get()
      if (fault != null && dst.getName == fault &&
          ObjectStoreLikeFileSystem.crashAfterCopyOf.compareAndSet(fault, null))
        throw new ObjectStoreLikeFileSystem.InjectedCrashException(
          s"injected crash after copy, before source delete: $src -> $dst")
      super.delete(src, false)
      true
    }
  }

  override def listStatus(f: Path): Array[org.apache.hadoop.fs.FileStatus] = {
    if (f.getName.startsWith(".gen-") || f.getName.startsWith(".del-"))
      ObjectStoreLikeFileSystem.generationLists.incrementAndGet()
    super.listStatus(f)
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    val r = super.delete(f, recursive)
    val fault = ObjectStoreLikeFileSystem.crashAfterDeleteOf.get()
    if (fault != null && f.getName == fault &&
        ObjectStoreLikeFileSystem.crashAfterDeleteOf.compareAndSet(fault, null))
      throw new ObjectStoreLikeFileSystem.InjectedCrashException(
        s"injected crash after delete: $f")
    r
  }
}

object ObjectStoreLikeFileSystem {
  val Uri: URI = URI.create("objstore:///")

  /** The process died between `delete(dst)` and the copy inside
    * `ManifestIo.replace`'s fallback — the pointer-ABSENT window. */
  class InjectedCrashException(msg: String) extends java.io.IOException(msg)

  /** Renames refused by the existing-destination contract — proves the
    * fallback ran rather than an atomic-overwrite fast path. */
  val refusedRenames = new java.util.concurrent.atomic.AtomicInteger()

  /** File renames that went through the copy+delete path. */
  val copyRenames = new java.util.concurrent.atomic.AtomicInteger()

  /** LIST calls against generation/tombstone directories — the
    * per-object-LIST metadata cost the `#file:` manifest inventory
    * exists to eliminate on the read path. */
  val generationLists = new java.util.concurrent.atomic.AtomicInteger()

  /** File NAME whose next rename-copy crashes after materializing the
    * destination, before deleting the source (one-shot). */
  val crashAfterCopyOf = new java.util.concurrent.atomic.AtomicReference[String]()

  /** File NAME whose next delete crashes immediately after removing it
    * (one-shot) — dst gone, replacement not yet copied. */
  val crashAfterDeleteOf = new java.util.concurrent.atomic.AtomicReference[String]()
}
