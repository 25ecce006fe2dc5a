package graft

import java.net.URI

import org.apache.hadoop.fs.RawLocalFileSystem

/** A local-disk Hadoop FileSystem registered under its OWN scheme
  * (`graftfs:`) — a stand-in for a cluster filesystem (`hdfs://`,
  * `s3a://`) that proves a code path goes through `Path.getFileSystem`
  * rather than java.nio: java.nio cannot resolve `graftfs:` paths at
  * all, so any control-plane op that bypassed the Hadoop layer fails
  * loudly instead of silently reading the wrong disk.
  */
class GraftTestFs extends RawLocalFileSystem {
  override def getScheme: String = "graftfs"
  override def getUri: URI = URI.create("graftfs:///")
}
