package graft.llm

import java.nio.charset.StandardCharsets

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path => HPath}
import org.apache.spark.sql.SparkSession

/** Hadoop-filesystem control-plane primitives for the persisted-index
  * family ([[IvfIndex]]'s versioned-geometry protocol, [[IndexLayout]]'s
  * generation sweeps). The DATA tables already go through Spark's (i.e.
  * Hadoop's) filesystem layer; these helpers put the POINTER/stamp/sweep
  * ops on the same layer, so an index `dir` on a cluster default FS
  * (`hdfs://`, `s3a://`) resolves the same files the executors write —
  * java.nio would resolve against the driver's local disk and silently
  * see an empty index.
  *
  * Everything here is create/list/delete only — no renames. A rename is
  * not atomic on object stores, so the pointer protocol built on these
  * primitives ([[IvfIndex.swapPointer]]) publishes by CREATING a new
  * numbered pointer file (one PUT, atomic everywhere) and readers take
  * the highest number, the same grow-only convention CommitLog uses for
  * its commit files.
  */
private[graft] object IndexFs {

  /** The active session's Hadoop conf (it carries `fs.*.impl` bindings
    * and object-store credentials); a bare Configuration only as a last
    * resort for conf-less callers outside any session — call from a
    * thread with the session active (every engine entry point does), or
    * `spark.hadoop.*` credentials won't reach the control plane even
    * though the data plane would still see them.
    */
  def conf: Configuration =
    SparkSession.getActiveSession
      .orElse(SparkSession.getDefaultSession)
      .map(_.sparkContext.hadoopConfiguration)
      .getOrElse(new Configuration())

  def fsFor(path: String): (FileSystem, HPath) = {
    val p = new HPath(path)
    (p.getFileSystem(conf), p)
  }

  def mkdirs(dir: String): Unit = {
    val (fs, p) = fsFor(dir)
    fs.mkdirs(p)
    ()
  }

  def exists(path: String): Boolean = {
    val (fs, p) = fsFor(path)
    fs.exists(p)
  }

  /** Children of `dir` (empty when `dir` is absent). */
  def list(dir: String): Seq[FileStatus] = {
    val (fs, p) = fsFor(dir)
    if (!fs.exists(p)) Nil else fs.listStatus(p).toSeq
  }

  /** Full contents of a small control file as UTF-8, or None if absent. */
  def readSmall(path: String): Option[String] = {
    val (fs, p) = fsFor(path)
    if (!fs.exists(p)) None
    else {
      val in = fs.open(p)
      try {
        val out = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { out.write(buf, 0, n); n = in.read(buf) }
        Some(new String(out.toByteArray, StandardCharsets.UTF_8))
      } finally in.close()
    }
  }

  /** Create-exclusive write of a small control file — the publish
    * primitive. One create call: atomic on HDFS/posix; on S3A the
    * no-overwrite check is HEAD-then-PUT unless the Hadoop version
    * supports conditional creates, so CONCURRENT publishers remain the
    * documented single-maintenance-writer boundary (what this primitive
    * removes everywhere is the rename, which object stores implement as
    * a non-atomic copy+delete even for single writers). Throws if the
    * path already exists.
    */
  def createExclusive(path: String, content: String): Unit = {
    val (fs, p) = fsFor(path)
    val out = fs.create(p, /* overwrite = */ false)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Overwriting write of a small control file (stamps, where last-write
    * -wins is the intended semantics).
    */
  def writeSmall(path: String, content: String): Unit = {
    val (fs, p) = fsFor(path)
    val out = fs.create(p, /* overwrite = */ true)
    try out.write(content.getBytes(StandardCharsets.UTF_8))
    finally out.close()
  }

  def delete(path: String, recursive: Boolean): Unit = {
    val (fs, p) = fsFor(path)
    fs.delete(p, recursive)
    ()
  }
}
