package graft

import java.net.URI

import org.apache.hadoop.fs.{FileStatus, FilterFileSystem, FSDataOutputStream, Path}
import org.apache.hadoop.fs.permission.FsPermission
import org.apache.hadoop.util.Progressable

/** An object-store-semantics test double (`osfs:`). `clusterfs:` proves
  * the pure Hadoop branch but with POSIX atomicity underneath; this FS
  * emulates the S3-class behaviors that branch must survive:
  *
  *  - `create(overwrite = false)` is CHECK-THEN-ACT: an existence check,
  *    an injectable fail-point ([[ObjectStoreTestFs.betweenCheckAndCreate]],
  *    where a test deterministically interleaves a "concurrent process"),
  *    then an unconditional create that TRUNCATES OVER whatever landed in
  *    the window — the exact hazard of a no-conditional-create object
  *    store, driven deterministically instead of hoped-for with threads.
  *  - LIST-AFTER-WRITE LAG: while [[ObjectStoreTestFs.armListLag]] is on,
  *    newly created (and rename-destination) paths are invisible to
  *    `listStatus` until [[ObjectStoreTestFs.flushVisibility]] — HEAD/GET
  *    (`getFileStatus`/`open`) stay consistent, matching the classic
  *    object-store gap (pre-2020 S3 LIST; S3Guard's reason to exist).
  *
  * State is JVM-global (the FileSystem cache shares one instance);
  * suites call [[ObjectStoreTestFs.reset]] around each test.
  */
class ObjectStoreTestFs extends FilterFileSystem(new SchemedRawLocalFs("osfs")) {
  import ObjectStoreTestFs._
  override def getScheme: String = "osfs"
  override def getUri: URI = URI.create("osfs:///")

  override def create(
      f: Path,
      permission: FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: Progressable): FSDataOutputStream = {
    if (!overwrite) {
      if (exists(f))
        throw new org.apache.hadoop.fs.FileAlreadyExistsException(s"File already exists: $f")
      betweenCheckAndCreate(f)
    }
    val out = super.create(f, permission, /* overwrite = */ true,
      bufferSize, replication, blockSize, progress)
    recordWrite(f)
    out
  }

  override def rename(src: Path, dst: Path): Boolean = {
    val ok = super.rename(src, dst)
    // a rename destination is a new PUT from the namespace's view: under
    // lag it is as invisible to LIST as a direct create. A dir rename
    // hides the dir node; children list under it only once it is visible.
    if (ok) recordWrite(dst)
    ok
  }

  override def delete(f: Path, recursive: Boolean): Boolean = {
    hidden.remove(keyOf(f))
    super.delete(f, recursive)
  }

  override def listStatus(f: Path): Array[FileStatus] =
    super.listStatus(f).filter(st => !hidden.contains(keyOf(st.getPath)))

  private def recordWrite(f: Path): Unit =
    // committer-internal paths are exempt: a real job committer's
    // list-dependence on its own _temporary tree is the DATA plane's
    // documented boundary (S3A committers exist for it — OPERATIONS.md);
    // this FS models PUT-visibility lag at FINAL locations, which is
    // what the ENGINE's staging/commit listings must survive
    if (lagging.get() && !keyOf(f).contains("/_temporary"))
      { hidden.add(keyOf(f)); () }
}

object ObjectStoreTestFs {
  /** Fail-point invoked between the existence check and the create of a
    * no-overwrite create — a test simulates a concurrent process's write
    * landing in exactly that window. */
  @volatile var betweenCheckAndCreate: Path => Unit = _ => ()

  private val lagging = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val hidden = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  private def keyOf(f: Path): String = f.toUri.getPath

  /** New writes from now on are invisible to listStatus. */
  def armListLag(): Unit = lagging.set(true)

  /** The namespace catches up: everything becomes listable; new writes
    * list immediately again. */
  def flushVisibility(): Unit = { lagging.set(false); hidden.clear() }

  def reset(): Unit = { betweenCheckAndCreate = _ => (); flushVisibility() }
}
