package graft

import java.net.URI

import org.apache.hadoop.fs.{FilterFileSystem, RawLocalFileSystem}

/** A RawLocalFileSystem that claims `scheme` as its own. Used as the
  * INNER filesystem of the FilterFileSystem-based test schemes below:
  * FilterFileSystem delegates paths verbatim, and RawLocalFileSystem's
  * `pathToFile` checkPath-validates them against ITS uri — so the inner
  * FS must answer to the wrapper's scheme or every delegated op throws
  * "Wrong FS". Qualifying against this uri also makes listings come back
  * under the wrapper's scheme (like a real cluster FS), so path strings
  * derived from statuses (FileEntry paths, sweep targets) resolve back
  * through the wrapper.
  */
class SchemedRawLocalFs(scheme: String) extends RawLocalFileSystem {
  override def getScheme: String = scheme
  override def getUri: URI = URI.create(s"$scheme:///")
}

/** A local-disk-backed Hadoop FileSystem that is NOT a RawLocalFileSystem
  * (it wraps one), registered under its own `clusterfs:` scheme — a
  * stand-in for a real cluster filesystem (`hdfs://`, `s3a://`) that
  * forces [[graft.fs.ControlFs]]'s PURE Hadoop branch: the local nio
  * fast path keys on the FS *being* a RawLocalFileSystem, so `graftfs:`
  * ([[GraftTestFs]]) proves scheme RESOLUTION while this scheme proves
  * the cluster-FS code path itself — `fs.create(overwrite=false)`
  * claims, `fs.open` stream reads, `listStatus` listings, recursive
  * deletes — end-to-end through the table format and index family.
  */
class ClusterTestFs extends FilterFileSystem(new SchemedRawLocalFs("clusterfs")) {
  override def getScheme: String = "clusterfs"
  override def getUri: URI = URI.create("clusterfs:///")
}

/** Fails every delete of an index-family cleanup target (the legacy
  * `meta.parquet`, `ptr-vN`/`stg-vN` pointer files, `gen-*` generation
  * dirs) while leaving all other deletes — Spark job temporaries, data
  * writes — healthy: an injected post-publish retirement failure,
  * proving IndexLayout's cleanup guard.
  */
class IndexCleanupFailTestFs
    extends FilterFileSystem(new SchemedRawLocalFs("idxfailx")) {
  override def getScheme: String = "idxfailx"
  override def getUri: URI = URI.create("idxfailx:///")
  override def delete(f: org.apache.hadoop.fs.Path, recursive: Boolean): Boolean = {
    val n = f.getName
    if (n == "meta.parquet" || n.matches("(ptr|stg)-v\\d+") || n.startsWith("gen-"))
      throw new RuntimeException(s"injected cleanup delete failure: $n")
    super.delete(f, recursive)
  }
}

/** [[ClusterTestFs]]-shaped (pure Hadoop branch), but counts every
  * namespace/data operation — on a cluster filesystem each of these is
  * an RPC round trip (S3: a billed request), so a control-plane path's
  * OP COUNT is its real cost there, not local wall-clock. Counters are
  * global per JVM (the FileSystem CACHE hands every caller one shared
  * instance); reset between measurement windows.
  */
class OpCountingFs extends FilterFileSystem(new SchemedRawLocalFs("countfs")) {
  import OpCountingFs._
  override def getScheme: String = "countfs"
  override def getUri: URI = URI.create("countfs:///")

  override def listStatus(f: org.apache.hadoop.fs.Path): Array[org.apache.hadoop.fs.FileStatus] = {
    count("listStatus"); super.listStatus(f)
  }
  override def getFileStatus(f: org.apache.hadoop.fs.Path): org.apache.hadoop.fs.FileStatus = {
    count("getFileStatus"); super.getFileStatus(f)
  }
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    count("open"); super.open(f, bufferSize)
  }
  override def create(
      f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    count("create")
    super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
  override def delete(f: org.apache.hadoop.fs.Path, recursive: Boolean): Boolean = {
    count("delete"); super.delete(f, recursive)
  }
  override def mkdirs(
      f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission): Boolean = {
    count("mkdirs"); super.mkdirs(f, permission)
  }
  override def rename(src: org.apache.hadoop.fs.Path, dst: org.apache.hadoop.fs.Path): Boolean = {
    count("rename"); super.rename(src, dst)
  }
}

object OpCountingFs {
  /** Counters are JVM-global (the FileSystem cache hands every caller one
    * shared instance), so a reset()+measure window is only meaningful
    * while nothing else drives `countfs:` — budget tests hold THIS lock
    * around their measurement windows, making them safe even if suite
    * execution ever goes parallel. */
  val lock = new Object
  val ops = new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.AtomicLong]()
  private def count(op: String): Unit = {
    ops.computeIfAbsent(op, _ => new java.util.concurrent.atomic.AtomicLong()).incrementAndGet()
    ()
  }
  def reset(): Unit = ops.clear()
  def total: Long = {
    var t = 0L
    ops.forEach((_, v) => t += v.get())
    t
  }
  def snapshot: Map[String, Long] = {
    val b = Map.newBuilder[String, Long]
    ops.forEach((k, v) => b += (k -> v.get()))
    b.result()
  }
}

/** Toggleable fault injection for the lease heartbeat (r18): while
  * [[LeaseFlakyFs.failing]] is set, every open/create throws a plain
  * IOException — a transient store outage, NOT a missing file (ControlFs
  * maps FileNotFound to None, which a lease renewal reads as "displaced";
  * a transient error must instead be retried). Off, a plain local FS.
  */
class LeaseFlakyFs extends FilterFileSystem(new SchemedRawLocalFs("leaseflaky")) {
  override def getScheme: String = "leaseflaky"
  override def getUri: URI = URI.create("leaseflaky:///")
  private def check(): Unit =
    if (LeaseFlakyFs.failing.get())
      throw new java.io.IOException("injected transient FS outage (LeaseFlakyFs)")
  override def open(f: org.apache.hadoop.fs.Path, bufferSize: Int): org.apache.hadoop.fs.FSDataInputStream = {
    check(); super.open(f, bufferSize)
  }
  override def create(
      f: org.apache.hadoop.fs.Path,
      permission: org.apache.hadoop.fs.permission.FsPermission,
      overwrite: Boolean,
      bufferSize: Int,
      replication: Short,
      blockSize: Long,
      progress: org.apache.hadoop.util.Progressable): org.apache.hadoop.fs.FSDataOutputStream = {
    check(); super.create(f, permission, overwrite, bufferSize, replication, blockSize, progress)
  }
}

object LeaseFlakyFs {
  val failing = new java.util.concurrent.atomic.AtomicBoolean(false)
}
