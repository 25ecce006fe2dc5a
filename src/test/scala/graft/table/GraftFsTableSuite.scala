package graft.table

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark
import graft.config.{EngineConfig, TableConfig}
import graft.fs.ControlFs
import graft.sink.IceTableWriter
import graft.streaming.IngestStream

/** r15 deployment-boundary proof for the TABLE FORMAT's control plane,
  * run against BOTH registered test schemes:
  *
  *  - `graftfs:` ([[graft.GraftTestFs]], a RawLocalFileSystem under its
  *    own scheme): paths java.nio cannot resolve, so a green run proves
  *    every control-plane op resolves through `Path.getFileSystem` —
  *    and, because the FS is raw-local, it exercises ControlFs's local
  *    nio FAST PATH (O_EXCL claims, names-only listings).
  *  - `clusterfs:` ([[graft.ClusterTestFs]], a FilterFileSystem wrapper
  *    — NOT a RawLocalFileSystem): defeats the fast-path match, so the
  *    same scenario runs the PURE Hadoop branch a real `hdfs://`/`s3a://`
  *    deployment takes — `fs.create(overwrite=false)` claims, `fs.open`
  *    reads, `listStatus` listings, recursive deletes.
  *
  * A green suite on both schemes means the commit log's create-exclusive
  * claims, checkpoints and retention sweep, the schema/meta versioning,
  * the writer's staging markers, footer stats, zero-row unstaging, gc's
  * walk, and fsck all work through Hadoop's FileSystem layer on both the
  * local fast path and the cluster branch. This is the same proof the
  * r14 LlmSuite test gave the IVF index family, applied to the engine's
  * most load-bearing component.
  */
class GraftFsTableSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  import spark.implicits._

  private def schemeDir(scheme: String, prefix: String): String = {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.graftfs.impl", classOf[graft.GraftTestFs].getName)
    conf.set("fs.clusterfs.impl", classOf[graft.ClusterTestFs].getName)
    s"$scheme:${TestSpark.freshDir(prefix)}"
  }

  private val schema = StructType(Seq(
    StructField("id", LongType),
    StructField("name", StringType),
    StructField("v", DoubleType)))

  private def df(rows: (Long, String, Double)*) = rows.toDF("id", "name", "v")

  private def endToEnd(scheme: String): Unit = {
    val dir = s"${schemeDir(scheme, s"$scheme-table")}/tbl"
    val t = IceTable.create(dir, schema, TableMeta(idColumns = Seq("id")))

    // plain appends with the batchId replay fence through the scheme
    assert(IceTableWriter.append(spark, df((1L, "a", 1.0), (2L, "b", 2.0)), t, batchId = 0,
      offsets = Map("0" -> 2L)).isDefined)
    assert(IceTableWriter.append(spark, df((1L, "a", 1.0)), t, batchId = 0).isEmpty,
      "replayed batch must be fenced through the scheme")
    assert(t.read(spark).count() === 2)

    // CDC delta: upsert id=1, delete id=2, insert id=3
    assert(IceTableWriter.delta(spark,
      df((1L, "a2", 1.5), (3L, "c", 3.0)), Seq(1L, 2L).toDF("id"), t, batchId = 1).isDefined)
    assert(t.read(spark).orderBy("id").select("id", "name").as[(Long, String)].collect().toSeq
      === Seq((1L, "a2"), (3L, "c")))

    // schema evolution: add a column, old files null-fill on read
    val evolved = StructType(schema.fields :+ StructField("w", LongType))
    assert(t.evolveTo(evolved) === 2)
    assert(Seq((4L, "d", 4.0, 40L)).toDF("id", "name", "v", "w").transform { d =>
      IceTableWriter.append(spark, d, t, batchId = 2); t.read(spark)
    }.filter(col("w").isNotNull).count() === 1)

    // metadata tables + plan pruning still metadata-only through the scheme
    assert(t.snapshots(spark).count() === t.log.commits().size.toLong)
    assert(t.filesMeta(spark).count() > 0)

    // compaction folds the delete chain; time travel below it still works
    val preCompactCount = t.read(spark).count()
    val seqBefore = t.log.lastCommittedSeq()
    t.compact(spark)
    assert(t.read(spark).count() === preCompactCount)
    assert(t.readAt(spark, seqBefore).count() === preCompactCount)

    // gc reclaims superseded files (age opt-out: no concurrent writers here)
    val liveBefore = t.planFiles(None).map(_._1.path).toSet
    assert(t.gc(olderThanMs = 0L) > 0, "gc through the scheme must reclaim superseded files")
    assert(liveBefore.forall(ControlFs.exists), "gc must keep every live file")
    assert(t.read(spark).count() === preCompactCount)

    // fsck: healthy, then loudly unhealthy after out-of-band file surgery
    assert(t.fsck(spark).count() === 0L)
    val victim = t.planFiles(None).map(_._1.path).min
    ControlFs.delete(victim, recursive = false)
    assert(t.fsck(spark).select("problem").as[String].collect().toSet === Set("missing"))
  }

  private def streamingIngest(scheme: String): Unit = {
    implicit val sq = spark.sqlContext
    val wh = schemeDir(scheme, s"$scheme-stream-wh")
    val ckpt = TestSpark.freshDir(s"$scheme-stream-ckpt") // Spark's own checkpoint stays local
    val cfg = EngineConfig(warehouse = wh,
      tables = Seq(TableConfig("sink")), autoCreate = true)
    val ms = MemoryStream[graft.streaming.Ev]
    val q = IngestStream.start(ms.toDF(), cfg, ckpt, triggerMs = Some(50))
    try {
      ms.addData(graft.streaming.Ev(1, 10, "click", 1.0), graft.streaming.Ev(2, 11, "view", 2.0))
      q.processAllAvailable()
      ms.addData(graft.streaming.Ev(3, 12, "click", 3.0))
      q.processAllAvailable()
    } finally q.stop()
    val t = IceTable.load(s"$wh/sink")
    assert(t.read(spark).count() === 3)
    assert(t.log.commits().map(_.batchId) === Seq(0L, 1L))
    assert(t.dir.startsWith(s"$scheme:"), s"table left the scheme: ${t.dir}")
  }

  test("ingest → CDC upsert → evolution → compaction → gc → fsck on graftfs: (local fast path)") {
    endToEnd("graftfs")
  }

  test("ingest → CDC upsert → evolution → compaction → gc → fsck on clusterfs: (pure Hadoop branch)") {
    endToEnd("clusterfs")
  }

  test("streaming ingest (IngestStream) commits exactly-once per micro-batch on graftfs:") {
    streamingIngest("graftfs")
  }

  test("streaming ingest (IngestStream) commits exactly-once per micro-batch on clusterfs:") {
    streamingIngest("clusterfs")
  }

  test("optimistic commit race is safe on the pure Hadoop branch (read-back arbitration)") {
    // the local-path twin lives in IceTableSuite; here the claim create
    // is check-then-act (no O_EXCL), so seq arbitration rests on the
    // stripe lock + the post-claim read-back verify
    val dir = s"${schemeDir("clusterfs", "clusterfs-race")}/tbl"
    val t = IceTable.create(dir, schema, TableMeta())
    val pool = java.util.concurrent.Executors.newFixedThreadPool(4)
    try {
      import scala.jdk.CollectionConverters._
      val tasks = (0 until 8).map { i =>
        new java.util.concurrent.Callable[Option[Commit]] {
          def call() = t.log.commit(-1L, seq =>
            Commit(seq, -1L, s"c$i", 0L, 1), maxRetries = 50)
        }
      }
      val results = pool.invokeAll(tasks.asJava).asScala.map(_.get())
      assert(results.forall(_.isDefined))
      val commits = t.log.commits()
      assert(commits.map(_.seq) === (1L to 8L)) // dense, no gaps, no loss
      assert(commits.map(_.commitId).toSet.size === 8)
    } finally pool.shutdown()
  }

  test("FS ops per FULL append (stage + write + stats + publish) are flat in table age") {
    // The commit-log budget below isolates the claim protocol; this one
    // covers the whole write path a streaming batch pays — staging
    // marker, Spark's parquet write (its committer's ops included),
    // footer stats, zero-row unstage, publish. Nothing in it may scale
    // with TABLE AGE: the only age-coupled step is the commit fence,
    // already bounded by checkpoint retention. (Spark's committer DOES
    // rename here — that's the data plane; see OPERATIONS.md on the
    // magic committer. The control plane stays rename-free, asserted by
    // the commit-budget test.)
    //
    // The pin INCLUDES committer ops, so a speculative or retried write
    // task would inflate a window and flake the bound — this budget is
    // only meaningful with speculation off (Spark's default; pinned here
    // so a future TestSpark conf change fails loudly instead of as a
    // mystery flake). A task RETRY inside the window still inflates it,
    // but a failing task in a healthy local-mode test is itself the bug.
    assert(!spark.sparkContext.getConf.getBoolean("spark.speculation", false),
      "the full-append RPC pin counts committer ops — run it with speculation off")
    graft.OpCountingFs.lock.synchronized {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.countfs.impl", classOf[graft.OpCountingFs].getName)
    val dir = s"countfs:${TestSpark.freshDir("countfs-append")}/tbl"
    val t = IceTable.create(dir, schema, TableMeta())
    def appendBatch(b: Int): Unit = {
      assert(IceTableWriter.append(spark, df((b.toLong, s"n$b", b.toDouble)), t, batchId = b).nonEmpty)
    }
    (0 until 12).foreach(appendBatch) // warm: fences, caches, codegen
    graft.OpCountingFs.reset()
    (12 until 20).foreach(appendBatch) // window A: 8 appends, age ~12
    val opsA = graft.OpCountingFs.total
    (20 until 44).foreach(appendBatch)
    graft.OpCountingFs.reset()
    (44 until 52).foreach(appendBatch) // window B: 8 appends, age ~44
    val opsB = graft.OpCountingFs.total
    println(f"[rpc-budget] full append: ${opsA / 8.0}%.1f ops/batch at age 12, " +
      f"${opsB / 8.0}%.1f at age 44 (${graft.OpCountingFs.snapshot})")
    assert(opsB <= opsA * 1.15 + 16,
      s"write-path FS ops grew with table age: window A = $opsA, window B = $opsB " +
        s"(${graft.OpCountingFs.snapshot})")
    }
  }

  test("FS ops per commit are flat in history and rename-free (cluster RPC budget)") {
    // On a cluster FS every namespace op is an RPC (S3: a billed
    // request), so the commit path's real cost there is its OP COUNT —
    // wall-clock flatness (`loghist` probe, SCALE.md) is measured on the
    // local fast path and can't see an accidentally added per-commit op.
    // Amortized over a full checkpoint interval, ops/commit at history
    // ~130 and ~530 must match: checkpoint retention bounds the listing,
    // and nothing else in the path may scale with table age.
    graft.OpCountingFs.lock.synchronized {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.countfs.impl", classOf[graft.OpCountingFs].getName)
    val dir = TestSpark.freshDir("countfs-commits")
    val log = new CommitLog(s"countfs:$dir", checkpointInterval = 100)

    def drive(from: Int, n: Int): Unit = (from until from + n).foreach { i =>
      assert(log.commit(i.toLong, s => Commit(s, i.toLong, s"c$i", 0L, 1,
        dataFiles = Seq(FileEntry(s"f$i", 1L, 1)))).nonEmpty)
    }

    // warm PAST two checkpoint generations (sweeps start at seq 300:
    // pruneBelow = seq - 2*interval) so both windows see the steady-state
    // op profile: fence listing + head/monotone reads + claim create +
    // read-back, plus one checkpoint's consolidation reads and one
    // interval's sweep deletes amortized across the window
    drive(0, 330)
    graft.OpCountingFs.reset()
    drive(330, 100) // window A spans exactly one checkpoint (seq 400)
    val opsA = graft.OpCountingFs.total
    val snapA = graft.OpCountingFs.snapshot
    drive(430, 300)
    graft.OpCountingFs.reset()
    drive(730, 100) // window B, same shape, ~2.2x the history
    val opsB = graft.OpCountingFs.total
    val snapB = graft.OpCountingFs.snapshot

    assert(!snapA.contains("rename") && !snapB.contains("rename"),
      s"the publish path must stay rename-free (object stores copy+delete): $snapA $snapB")
    // flat: same window shape => same op count, independent of history
    assert(opsB <= opsA * 1.1 + 10,
      s"FS ops grew with history: window A (330-430) = $opsA ($snapA), " +
        s"window B (730-830) = $opsB ($snapB)")
    // absolute budget regression pin — loose enough for protocol jitter
    // (checkpoint sweeps), tight enough to catch an added per-commit op
    // class (a second listing per commit alone would add ~100)
    assert(opsB.toDouble / 100 <= 12.0,
      s"per-commit RPC budget blew past 12: ${opsB / 100.0} ($snapB)")
    }
  }

  test("deep-history READ budget: a cold commits() at 1000+ commits costs the same " +
    "FS ops as at 150 (checkpoint + bounded tail, flat in age — r17)") {
    // SCALE.md's pre-checkpoint read-latency curve bent at 64 commits;
    // checkpoints are the fix, and this pins WHAT a cold reader (a fresh
    // driver/maintenance tool attaching to an old table) actually pays:
    // one listing of a retention-bounded directory, one checkpoint read,
    // and at most `interval` tail entry reads — independent of how many
    // thousands of commits the table has ever taken.
    graft.OpCountingFs.lock.synchronized {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.countfs.impl", classOf[graft.OpCountingFs].getName)
    val dir = TestSpark.freshDir("countfs-deepread")
    val root = s"countfs:$dir"
    val log = new CommitLog(root, checkpointInterval = 100)
    def drive(from: Int, n: Int): Unit = (from until from + n).foreach { i =>
      assert(log.commit(i.toLong, s => Commit(s, i.toLong, s"c$i", 0L, 1,
        dataFiles = Seq(FileEntry(s"f$i", 1L, 1)))).nonEmpty)
    }
    def coldRead(): (Long, Long, Double) = {
      graft.OpCountingFs.reset()
      val t0 = System.nanoTime()
      val commits = new CommitLog(root, checkpointInterval = 100).commits()
      val dt = (System.nanoTime() - t0) / 1e9
      (commits.size.toLong, graft.OpCountingFs.total, dt)
    }
    drive(0, 150)
    val (n150, ops150, t150) = coldRead()
    assert(n150 === 150L)
    drive(150, 900) // 1050 total — ten checkpoint generations deep
    val (n1050, ops1050, t1050) = coldRead()
    assert(n1050 === 1050L)
    println(f"[read-budget] cold commits() ops: $ops150 at 150 commits, " +
      f"$ops1050 at 1050 (${t150}%.3f s vs ${t1050}%.3f s wall)")
    // flat-or-log: the deep read may not cost more ops than the shallow
    // one beyond jitter — retention sweeps bound the listing, the
    // checkpoint absorbs the body, only the tail is read entry-by-entry
    assert(ops1050 <= ops150 * 1.2 + 10,
      s"cold-read FS ops grew with history: $ops150 at 150 → $ops1050 at 1050 " +
        s"(${graft.OpCountingFs.snapshot})")
    // absolute pin: listing + checkpoint + ≤interval tail reads + slack.
    // A reader that ever re-reads swept entries or lists per-entry would
    // blow past this immediately.
    assert(ops1050 <= 150,
      s"cold deep-history read budget blew past 150 ops: $ops1050 " +
        s"(${graft.OpCountingFs.snapshot})")
    }
  }
}
