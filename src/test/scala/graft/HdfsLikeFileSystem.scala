package graft

import java.net.URI
import org.apache.hadoop.fs.{FSDataInputStream, Path}

/** Test-only Hadoop `FileSystem` that stores bytes on the local disk
  * but exposes the NON-POSIX commit semantics `ManifestIo`'s scaladoc
  * documents per scheme — so those claims run as pins instead of
  * prose:
  *
  *  - '''rename refuses an existing destination FILE''' (the HDFS
  *    contract; an existing destination DIRECTORY still receives the
  *    source as a child, also the HDFS contract — and what Spark's
  *    output committer relies on): `ManifestIo.replace`'s pointer
  *    swap cannot take the atomic-overwrite fast path and must walk
  *    its delete+rename fallback on every commit after the first.
  *  - '''create-exclusive via the generic (non-`O_EXCL`) branch''':
  *    `putIfAbsent` on a non-`file:` scheme goes through
  *    `create(overwrite = false)`, the path HDFS makes atomic at the
  *    NameNode — the CAS pin runs against that branch here.
  *  - '''one-shot open fault''' (`failNextOpenOf`): the next `open`
  *    of a file with that name throws FileNotFoundException — the
  *    deterministic stand-in for a reader hitting the fallback's
  *    pointer-absent instant, driving `readManifested`'s one-retry.
  *
  * Registered per test via `fs.hdfslike.impl`; instantiated
  * reflectively by `FileSystem.get`, so it must stay a public
  * no-arg-constructible top-level class.
  */
class HdfsLikeFileSystem extends org.apache.hadoop.fs.RawLocalFileSystem {
  override def getUri: URI = HdfsLikeFileSystem.Uri

  override def getScheme: String = "hdfslike"

  override def rename(src: Path, dst: Path): Boolean = {
    val refused = try getFileStatus(dst).isFile
    catch { case _: java.io.FileNotFoundException => false }
    if (refused) {
      HdfsLikeFileSystem.refusedRenames.incrementAndGet()
      false
    } else super.rename(src, dst)
  }

  override def open(f: Path, bufferSize: Int): FSDataInputStream = {
    val fault = HdfsLikeFileSystem.failNextOpenOf.get()
    if (fault != null && f.getName == fault &&
        HdfsLikeFileSystem.failNextOpenOf.compareAndSet(fault, null))
      throw new java.io.FileNotFoundException(s"injected pointer-absent instant: $f")
    super.open(f, bufferSize)
  }
}

object HdfsLikeFileSystem {
  val Uri: URI = URI.create("hdfslike:///")
  /** Count of renames refused by the existing-destination contract —
    * proves the fallback path RAN rather than the fast path silently
    * covering for it. */
  val refusedRenames = new java.util.concurrent.atomic.AtomicInteger()
  /** File NAME whose next open throws FileNotFoundException (one-shot). */
  val failNextOpenOf = new java.util.concurrent.atomic.AtomicReference[String]()
}
