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
