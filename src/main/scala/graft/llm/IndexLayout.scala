package graft.llm

import org.apache.spark.sql.SparkSession

import graft.fs.ControlFs

/** Shared layout helpers for the persisted-index family (crash-atomic
  * generation publishing: data tables stage under `gen-*`, the meta
  * table commits the generation LAST — see [[Search.buildIndex]] /
  * [[Decontaminate.buildIndex]]).
  *
  * Since r15 the meta commit itself is a VERSIONED POINTER publish
  * ([[publishMeta]]): the 1-row meta table stages under
  * `meta-vN.parquet` and one create-exclusive `ptr-vN` file commits it —
  * readers take the highest pointer NUMBER (the pointer's NAME is the
  * whole commit; its content is informational), so there is no torn
  * state a crash can leave: before the pointer lands the old version
  * answers, after it the new one does. This closed the family's last
  * non-atomic instant — the pre-r15 `meta.parquet` was a Spark
  * `overwrite` (delete-then-write), and a crash inside it left no
  * readable meta until a rebuild. The pre-r15 mutable `meta.parquet` is
  * still READ as a legacy fallback (one release) and retired at the
  * next publish.
  *
  * All filesystem work goes through HADOOP's filesystem layer, like the
  * parquet tables themselves — java.nio paths resolve against the
  * driver's local disk, so on a cluster default FS (hdfs://, s3a://) a
  * java.nio sweep silently never deletes anything and every rebuild's
  * full n-gram/postings table accumulates forever.
  */
private[llm] object IndexLayout {


  /** Post-publish cleanup guard: retirement sweeps run AFTER the commit
    * (the pointer create) has landed, and everything they reclaim is
    * re-attempted by the next publish — an FS hiccup there must WARN,
    * not unwind a build/append whose publish already succeeded (the
    * rule the table format's checkpoint and staging guards follow).
    * Repeated failures of the SAME site escalate to ERROR via
    * [[graft.fs.SweepAlarm]] — a permanently failing retirement (auth
    * regression) accumulates garbage and must become visible.
    */
  def cleanupQuietly(what: String)(body: => Unit): Unit =
    graft.fs.SweepAlarm.guarded(s"post-publish cleanup '$what'",
      "the publish stands; the next publish re-sweeps")(body)

  def newGeneration(): String = s"gen-${java.util.UUID.randomUUID().toString.take(8)}"

  private val PtrName = "ptr-v(\\d+)".r
  private val StgName = "stg-v(\\d+)".r

  private def metaTableName(v: Long): String = s"meta-v$v.parquet"

  /** Highest committed meta version under `dir`, from pointer NAMES
    * only — no file content is read, so a crash mid-pointer-create
    * (name present, content torn) still resolves correctly.
    */
  def currentMetaVersion(dir: String): Option[Long] = {
    val vs = ControlFs.listNames(dir)
      .collect { case PtrName(n) => n.toLong }
    if (vs.isEmpty) None else Some(vs.max)
  }

  /** The active 1-row meta table: highest `ptr-vN` → `meta-vN.parquet`,
    * falling back to the pre-r15 mutable `meta.parquet` (legacy read
    * path, kept one release). None = no index here.
    */
  def metaTablePath(dir: String): Option[String] =
    currentMetaVersion(dir).map(v => s"$dir/${metaTableName(v)}")
      .orElse(Some(s"$dir/meta.parquet").filter(ControlFs.exists))

  /** Publish the next meta version: claim the version NUMBER with a
    * create-exclusive `stg-vN` stamp, `write` stages the 1-row table
    * into the claimed versioned dir (a crash mid-stage is invisible —
    * no pointer), then ONE create-exclusive `ptr-vN` commits it.
    * Afterwards the legacy mutable `meta.parquet` (if any) is retired —
    * the pointer takes precedence, so a crash between the two steps is
    * benign — and superseded versions prune down to the newest two
    * (keep-one-spare for a reader that resolved the previous pointer
    * mid-probe, the [[IvfIndex]] rule).
    *
    * The stage claim exists because the staging write is an OVERWRITE:
    * two concurrent publishers targeting the same N without it would
    * race ptr-vN correctly, but the loser's overwrite of
    * `meta-vN.parquet` could clobber the winner's ALREADY-COMMITTED
    * table content before the loser's pointer attempt fails — the claim
    * moves the collision to a point where the loser has touched nothing
    * and just takes the next number. (Concurrent publishers are outside
    * the single-maintenance-writer contract anyway; this keeps the
    * off-contract failure mode "skipped version number" instead of
    * "committed pointer resolving to the wrong meta".) A crashed
    * publisher's stamp makes later publishers skip its number — stamps
    * and their orphaned stage dirs prune with the version window below.
    */
  def publishMeta(dir: String)(write: String => Unit): Unit = {
    var v = currentMetaVersion(dir).getOrElse(0L)
    var done = false
    val nonce = java.util.UUID.randomUUID().toString
    while (!done) {
      v += 1
      var claimed = false
      try { ControlFs.createExclusive(s"$dir/stg-v$v", nonce); claimed = true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          () // number taken (live racer or crashed publisher) — next
      }
      // read-back verify, the CommitLog claim discipline: on a
      // check-then-act FS two publishers can both "win" the create —
      // whoever's NONCE landed owns the number, the other one touched
      // nothing and moves on
      if (claimed && ControlFs.readSmall(s"$dir/stg-v$v").contains(nonce)) {
        write(s"$dir/${metaTableName(v)}")
        try { ControlFs.createExclusive(s"$dir/ptr-v$v", metaTableName(v)); done = true }
        catch { case _: org.apache.hadoop.fs.FileAlreadyExistsException => () }
      }
    }
    cleanupQuietly(s"meta-pointer retirement at $dir") {
      ControlFs.delete(s"$dir/meta.parquet", recursive = true)
      val keep = ControlFs.listNames(dir)
        .collect { case PtrName(n) => n.toLong }.sorted.takeRight(2).toSet
      val floor = if (keep.isEmpty) 0L else keep.min
      ControlFs.list(dir).foreach { st =>
        st.getPath.getName match {
          case PtrName(n) if !keep.contains(n.toLong) =>
            ControlFs.delete(st.getPath.toString, recursive = false)
          case StgName(n) if n.toLong < floor =>
            // stage stamps below the version window: their number can
            // never be targeted again (currentMetaVersion ≥ floor)
            ControlFs.delete(st.getPath.toString, recursive = false)
          case m if m.startsWith("meta-v") && m.endsWith(".parquet") &&
              m.stripPrefix("meta-v").stripSuffix(".parquet").matches("\\d+") =>
            // only versions BELOW the keep window: an unreferenced dir
            // ABOVE it could be a (out-of-contract) concurrent publisher
            // mid-stage, and the next publish overwrites such orphans
            // in place anyway
            val n = m.stripPrefix("meta-v").stripSuffix(".parquet").toLong
            if (n < floor) ControlFs.delete(st.getPath.toString, recursive = true)
          case _ => ()
        }
      }
    }
  }

  /** The generation the CURRENT meta points at, or None when no
    * readable meta exists — what a rebuild passes to [[sweepGenerations]]
    * as the spare to protect.
    */
  def publishedGen(spark: SparkSession, dir: String): Option[String] =
    metaTablePath(dir).flatMap { p =>
      try {
        val m = spark.read.parquet(p)
        if (m.columns.contains("gen")) Option(m.select("gen").head().getString(0)) else None
      } catch { case _: Exception => None }
    }

  /** Delete superseded `gen-*` dirs, keeping the just-published
    * generation and `prevPublished` — the generation an in-flight probe
    * that resolved the PREVIOUS meta row may still be scanning (the
    * [[IvfIndex]] keep-one-generation rule). The spare is named
    * EXPLICITLY by the caller (it read the old meta before rebuilding):
    * a newest-by-mtime heuristic let a crash ORPHAN (data written, meta
    * never committed) displace the genuinely published previous
    * generation, deleting it out from under exactly the reader the
    * spare slot exists to protect. Orphans are reclaimed here instead.
    */
  def sweepGenerations(
      spark: SparkSession,
      dir: String,
      keep: String,
      prevPublished: Option[String]): Unit = cleanupQuietly(s"generation sweep at $dir") {
    val d = new org.apache.hadoop.fs.Path(dir)
    val fs = d.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(d)) {
      val keepSet = Set(keep) ++ prevPublished
      fs.listStatus(d).foreach { st =>
        val name = st.getPath.getName
        if (name.startsWith("gen-") && !keepSet.contains(name)) {
          fs.delete(st.getPath, true)
          ()
        }
      }
    }
  }
}
