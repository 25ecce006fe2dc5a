package graft.fs

import java.net.URI

import org.apache.hadoop.fs.{FilterFileSystem, Path => HPath, RawLocalFileSystem}
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** An "HDFS-shaped" local FS: a scheme on the atomic-create list, so the
  * probe must report the claim atomic without consulting capabilities.
  */
class AtomicSchemeTestFs extends RawLocalFileSystem {
  override def getScheme: String = "hdfs"
  override def getUri: URI = URI.create("hdfs://fake-nn")
}

/** An "object-store-shaped" FS: NOT a RawLocalFileSystem (no O_EXCL fast
  * path), scheme off the atomic list, no conditional-create capability —
  * the conservative non-atomic answer.
  */
class CapabilityLessTestFs extends FilterFileSystem(new RawLocalFileSystem) {
  override def getScheme: String = "s3x"
  override def getUri: URI = URI.create("s3x://fake-bucket")
  override def hasPathCapability(p: HPath, c: String): Boolean = false
}

/** exists() answers true but listStatus throws FileNotFoundException —
  * the directory vanished between the shared primitive's existence check
  * and its listing (concurrent retention sweep / gc / generation sweep).
  */
class VanishOnListTestFs extends FilterFileSystem(new graft.SchemedRawLocalFs("vanishx")) {
  override def getScheme: String = "vanishx"
  override def getUri: URI = URI.create("vanishx:///")
  override def listStatus(p: HPath): Array[org.apache.hadoop.fs.FileStatus] =
    throw new java.io.FileNotFoundException(s"$p vanished mid-list")
}

class ControlFsSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("exclusivity probe: capability-less FS non-atomic; HDFS-schemed and local O_EXCL atomic") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[graft.GraftTestFs].getName)
    val local = TestSpark.freshDir("controlfs-probe")

    // not raw-local, no capability, scheme off the atomic list — the
    // conservative answer, and what drives the loud WARN at the first
    // publish on such an FS
    val sfs = new CapabilityLessTestFs
    sfs.initialize(URI.create("s3x://fake-bucket"), conf)
    assert(!ControlFs.createClaimIsAtomic(sfs, new HPath("/x")),
      "a capability-less non-local filesystem must report a non-atomic claim")

    // an FS whose scheme serializes namespace ops through a metadata
    // service is atomic by scheme, before any capability query
    val hfs = new AtomicSchemeTestFs
    hfs.initialize(URI.create("hdfs://fake-nn"), conf)
    assert(ControlFs.createClaimIsAtomic(hfs, new HPath("/x")))

    // local disks (incl. registered schemes backed by RawLocalFileSystem)
    // take the O_EXCL fast path — genuinely atomic
    val (gfs, gp) = ControlFs.fsFor(s"graftfs:$local/claim")
    assert(ControlFs.createClaimIsAtomic(gfs, gp),
      "the local O_EXCL fast path is an atomic claim")

    // the probe fires once per scheme per JVM and never throws —
    // exercised through a real publish on the capability-less scheme
    ControlFs.resetProbesForTest()
    ControlFs.createExclusive(s"graftfs:$local/claim", "x")
    assert(ControlFs.readSmall(s"graftfs:$local/claim").contains("x"))
    // second publish on the same scheme: probe already recorded, still fine
    ControlFs.createExclusive(s"graftfs:$local/claim2", "y")
  }

  test("createExclusive refuses an existing path; writeSmall overwrites") {
    val local = TestSpark.freshDir("controlfs-excl")
    val p = s"$local/f"
    ControlFs.createExclusive(p, "a")
    intercept[org.apache.hadoop.fs.FileAlreadyExistsException] {
      ControlFs.createExclusive(p, "b")
    }
    assert(ControlFs.readSmall(p).contains("a"))
    ControlFs.writeSmall(p, "c")
    assert(ControlFs.readSmall(p).contains("c"))
  }

  test("Hadoop branch: a dir vanished between exists and listStatus reads as absent") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.vanishx.impl", classOf[VanishOnListTestFs].getName)
    val local = TestSpark.freshDir("controlfs-vanish")
    ControlFs.createExclusive(s"$local/f", "x") // dir genuinely exists with a child
    // the FilterFileSystem wrapper defeats the local fast path, so these
    // run the pure Hadoop branch: exists=true, then the FNF mid-listing
    // must read as an empty dir (the local branch's null-listing rule),
    // not escape a shared primitive into a sweep or commit read
    assert(ControlFs.list(s"vanishx:$local").isEmpty)
    assert(ControlFs.listNames(s"vanishx:$local").isEmpty)
  }

  test("createExclusive race on the pure Hadoop branch: one winner, content intact") {
    // On a check-then-act FS (the clusterfs: branch — no O_EXCL, no
    // conditional create) two same-JVM racers could both pass the
    // existence check and truncate over each other mid-write; the stripe
    // lock must serialize them so exactly one wins and ITS full content
    // survives. 16 threads, one path, distinct payloads.
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.clusterfs.impl", classOf[graft.ClusterTestFs].getName)
    val path = s"clusterfs:${TestSpark.freshDir("controlfs-race")}/claim"
    val pool = java.util.concurrent.Executors.newFixedThreadPool(16)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (0 until 16).map { i =>
        new java.util.concurrent.Callable[Option[Int]] {
          def call(): Option[Int] =
            try { ControlFs.createExclusive(path, s"writer-$i-" + ("x" * 1000)); Some(i) }
            catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => None }
        }
      }
      val winners = pool.invokeAll(tasks.asJava).asScala.flatMap(_.get())
      assert(winners.size === 1, s"exactly one racer must win the claim: $winners")
      val content = ControlFs.readSmall(path).get
      assert(content === s"writer-${winners.head}-" + ("x" * 1000),
        "the winner's content must survive whole — no truncation by a loser")
    } finally pool.shutdown()
  }

  test("walkPostOrder lists children before parents (sweep order)") {
    val local = TestSpark.freshDir("controlfs-walk")
    ControlFs.createExclusive(s"$local/a/b/f1", "1")
    ControlFs.createExclusive(s"$local/a/f2", "2")
    val names = ControlFs.walkPostOrder(local).map(_.getPath.getName)
    assert(names.indexOf("f1") < names.indexOf("b"))
    assert(names.indexOf("b") < names.indexOf("a"))
    assert(names.indexOf("f2") < names.indexOf("a"))
  }
}
