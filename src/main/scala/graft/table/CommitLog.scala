package graft.table

import java.nio.file.{Files, Path, Paths}
import scala.jdk.CollectionConverters._

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

/** One data or equality-delete file tracked by a commit.
  *
  * Mirrors the reference's per-commit `DataWritten(dataFiles, deleteFiles)`
  * payload (`channel/CommitterImpl.java:140-188`) and Iceberg's
  * file-with-partition-values manifest entry.
  */
final case class FileEntry(
    path: String,
    rows: Long,
    schemaVersion: Int,
    partition: Map[String, String] = Map.empty,
    /** on-disk size; -1 for entries committed before sizes were recorded */
    bytes: Long = -1L,
    /** per-top-level-column lower/upper bounds from the parquet footer
      * (string-encoded; Iceberg lower_bounds/upper_bounds analogue) —
      * empty for formats/entries without recorded stats */
    min: Map[String, String] = Map.empty,
    max: Map[String, String] = Map.empty,
    /** file format this entry was written with (Iceberg's per-data-file
      * file_format): a `write-props` format override must not re-type
      * files that already exist. "" = entry predates per-file formats —
      * read with the table's persisted format. */
    format: String = ""
)

/** A committed snapshot of an IceTable branch.
  *
  * Field-for-field analogue of the reference's Iceberg snapshot + summary
  * properties (`channel/Coordinator.commitToTable:220-257`):
  *  - `offsets`  = `kafka.connect.offsets` snapshot property (K4/K8)
  *  - `batchId`  = idempotence guard (replaces control-topic low-watermark
  *    fencing, `Coordinator.lastCommittedOffsetsForTable:286-303`)
  *  - `commitId` = `kafka.connect.commit-id` UUID
  *  - `vtts`     = `kafka.connect.vtts` valid-through-timestamp (K11),
  *    epoch micros
  */
final case class Commit(
    seq: Long,
    batchId: Long,
    commitId: String,
    timestampMs: Long,
    schemaVersion: Int,
    dataFiles: Seq[FileEntry] = Nil,
    deleteFiles: Seq[FileEntry] = Nil,
    // contentAs: jackson-module-scala cannot see erased generic value
    // types, so WITHOUT it a JSON number that fits in Int deserializes as
    // a boxed Integer INSIDE Map[String, Long]/Option[Long] — equality
    // still passes (cooperative ==) but the first unboxing access
    // (`c.offsets(k) + 1`, `c.vtts.get`) throws ClassCastException. Real
    // vtts values are epoch micros (> 2^31) which masked this; small
    // offsets hit it.
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    offsets: Map[String, Long] = Map.empty,
    @com.fasterxml.jackson.databind.annotation.JsonDeserialize(
      contentAs = classOf[java.lang.Long])
    vtts: Option[Long] = None,
    props: Map[String, String] = Map.empty,
    /** Paths of earlier commits' data files this commit supersedes
      * (Iceberg rewrite-files analogue): a bin-packing compaction adds
      * the packed files and lists the small ones here. Readers at
      * `maxSeq >= this.seq` skip them; time travel below still sees
      * them. */
    removedPaths: Seq[String] = Nil
)

/** Append-only JSON commit log with atomic-rename commits.
  *
  * Reproduces the commit semantics the reference gets from Iceberg's
  * optimistic snapshot commit: writers race to claim `v{seq}.json`; the
  * loser reloads and retries (`data/SchemaUtils.applySchemaUpdates:85-132`
  * uses the same retry-on-conflict pattern for schema commits).
  *
  * Scale notes: at 100 TB the log is metadata only (file paths + stats);
  * data files are never renamed (Iceberg-style "write once, reference by
  * path"), so commits are O(metadata), not O(data), and work on object
  * stores without atomic directory rename. The commit fast path reads
  * O(1) files — seq comes from directory names, the replay guard from the
  * last entry only — and every `checkpointInterval` commits the full log
  * is consolidated into a `ckpt-v{seq}.json` so `commits()` reads one
  * checkpoint plus the tail, never the whole history (Delta-checkpoint
  * pattern). Entry files more than two intervals below the newest
  * checkpoint are SWEPT (their data lives in the checkpoint, so time
  * travel and audit reads are unchanged) — without the sweep the
  * directory grew one file per commit forever and every hot-path
  * listing paid O(history).
  */
final class CommitLog(val root: Path, checkpointInterval: Int = 100) {
  import CommitLog.mapper

  Files.createDirectories(root)

  private def commitPath(seq: Long): Path = root.resolve(f"v$seq%09d.json")
  private def ckptPath(seq: Long): Path = root.resolve(f"ckpt-v$seq%09d.json")

  private def listNames(): Seq[String] = {
    val listing = Files.list(root) // close explicitly: an unclosed stream
    try listing.iterator().asScala.map(_.getFileName.toString).toSeq // leaks one fd per commit
    finally listing.close()
  }

  private def seqOf(name: String, prefix: String): Long =
    name.stripPrefix(prefix).stripPrefix("v").stripSuffix(".json").toLong

  /** Read a listed commit file, tolerating it vanishing in between: a
    * deleted entry is by definition a zombie that its writer rolled back
    * (see commit()'s post-link verify), which the batchId self-heal filter
    * would drop anyway — skipping it is equivalent and race-free.
    */
  private def readCommitOpt(p: Path): Option[Commit] =
    try Some(mapper.readValue(Files.readAllBytes(p), classOf[Commit]))
    catch { case _: java.nio.file.NoSuchFileException => None }

  def commits(): Seq[Commit] = commitsAttempt(retries = 3)

  private def commitsAttempt(retries: Int): Seq[Commit] = {
    if (!Files.isDirectory(root)) return Nil
    val names = listNames()
    val lastCkpt = names.filter(_.matches("ckpt-v\\d+\\.json")).sorted.lastOption
    val base: Seq[Commit] = lastCkpt match {
      case None => Nil
      case Some(n) =>
        // a checkpoint two generations old can be swept under a stale
        // listing (see checkpoint()'s retention sweep) — re-list like a
        // vanished tail file; the fresh listing's newer checkpoint
        // covers everything this one did
        try mapper
          .readValue(Files.readAllBytes(root.resolve(n)), classOf[Array[Commit]])
          .toSeq
        catch {
          case _: java.nio.file.NoSuchFileException if retries > 0 =>
            return commitsAttempt(retries - 1)
        }
    }
    val from = lastCkpt.map(seqOf(_, "ckpt-")).getOrElse(0L)
    val tailNames = names
      .filter(_.matches("v\\d+\\.json"))
      .filter(seqOf(_, "") > from)
      .sorted
    val tail = tailNames.flatMap(n => readCommitOpt(root.resolve(n)))
    // A vanished tail file is EITHER a zombie its writer rolled back
    // (skipping is correct — the batchId filter below would drop it) OR
    // an entry pruned by a checkpoint that linked after our listing (the
    // retention sweep only deletes entries a NEWER checkpoint covers).
    // The two are indistinguishable here, so when anything vanished,
    // re-list: a fresh listing's checkpoint covers every pruned seq, and
    // the zombie case merely pays one extra listing on a rare path.
    if (tail.size != tailNames.size) {
      if (retries > 0) return commitsAttempt(retries - 1)
      // Retries exhausted: each attempt re-lists from scratch, so a
      // once-rolled-back zombie cannot vanish twice — reaching here means
      // entries kept disappearing across FOUR independent listings
      // (sustained checkpoint churn, or something external deleting log
      // files). Returning the partial tail would be a silently GAPPED
      // commit view — readers would see committed batches missing with no
      // signal — so fail loudly instead.
      throw new IllegalStateException(
        s"CommitLog at $root: commit entries kept vanishing between listing and " +
          "read after 3 retries — sustained concurrent checkpoint churn or " +
          "external deletion of log files")
    }
    // Replay-artifact self-heal: batch ids commit in strictly increasing
    // order, so a LATER entry whose batchId does not exceed the running
    // max is a zombie's duplicate that crashed between link and rollback
    // (see commit()'s post-link verify) — readers drop it, and the next
    // checkpoint consolidation erases it for good.
    var maxBatch = Long.MinValue
    (base ++ tail).filter { c =>
      if (c.batchId < 0) true
      else if (c.batchId > maxBatch) { maxBatch = c.batchId; true }
      else false
    }
  }

  /** Highest claimed seq, from directory names only (no file reads). */
  def lastSeq(): Long = {
    if (!Files.isDirectory(root)) return 0L
    val seqs = listNames().filter(_.matches("v\\d+\\.json")).map(seqOf(_, ""))
    if (seqs.isEmpty) 0L else seqs.max
  }

  /** Highest COMMITTED (zombie-filtered) seq — the anchor for conflict-
    * validation windows. [[lastSeq]] counts raw directory claims,
    * including a duplicate-batch zombie that its writer will roll back,
    * FREEING that seq for reuse by a later real commit; a validation
    * window `seq > s0` anchored on the raw value would then miss the
    * real commit that reused the freed seq (a rewrite could silently
    * void a concurrent equality delete that way).
    */
  def lastCommittedSeq(): Long = commits().lastOption.map(_.seq).getOrElse(0L)

  /** Replay fence: batch ids are committed in order, so normally only
    * the LAST entry needs reading (one file, not the log). The fast path
    * is guarded against a zombie tail — a crashed duplicate of an OLDER
    * batch linked above the real head would understate the fence and let
    * the NEXT batch's replay double-commit — by checking one step of
    * batch-id monotonicity against the previous entry and falling back
    * to the filtered log when it is violated. (Residual assumption: two
    * or more DISTINCT-batch zombies stacked in increasing batch order
    * would still fool the fast path; that needs two different replayed
    * batches both crashing between link and rollback at the head, which
    * the single-coordinator deployment cannot produce.)
    */
  def lastBatchId(): Option[Long] = lastBatchIdFrom(
    listNames().filter(_.matches("v\\d+\\.json")).map(seqOf(_, "")).sorted)

  private def lastBatchIdFrom(seqs: Seq[Long]): Option[Long] = {
    if (seqs.isEmpty) None
    else
      readCommitOpt(commitPath(seqs.last)) match {
        case Some(c) if c.batchId >= 0 =>
          val monotone = seqs.size < 2 ||
            readCommitOpt(commitPath(seqs(seqs.size - 2)))
              .forall(p => p.batchId < 0 || p.batchId <= c.batchId)
          if (monotone) Some(c.batchId)
          else commits().filter(_.batchId >= 0).lastOption.map(_.batchId)
        // batchId < 0, or the last entry was a zombie rolled back between
        // the directory listing and the read — fall back to the full log
        case _ => commits().filter(_.batchId >= 0).lastOption.map(_.batchId)
      }
  }

  /** Atomically commit; returns None if the batchId was already committed
    * (exactly-once replay guard, K8). `build` receives the claimed seq and
    * runs once per attempt — it may throw [[CommitConflictException]] to
    * abort the commit (optimistic conflict validation, e.g. a rewrite
    * detecting a concurrent delete); nothing is linked in that case.
    */
  def commit(batchId: Long, build: Long => Commit, maxRetries: Int = 10): Option[Commit] = {
    var attempt = 0
    while (attempt < maxRetries) {
      attempt += 1
      // ONE directory listing per attempt, shared by the fence snapshot,
      // the replay guard, and the seq claim (three separate listings here
      // made the hot path O(3·entries) per commit). Any same-batch
      // duplicate linked after this snapshot has seq > fenceSeq, so the
      // post-link verify's (fenceSeq, seq) window provably contains it;
      // one linked at or before fenceSeq is visible to the lastBatchId
      // fence (batch ids commit in increasing order). A racer claiming
      // fenceSeq+1 first just fails our createLink below — retry.
      val seqs = listNames().filter(_.matches("v\\d+\\.json")).map(seqOf(_, "")).sorted
      val fenceSeq = if (seqs.isEmpty) 0L else seqs.last
      if (batchId >= 0 && lastBatchIdFrom(seqs).exists(batchId <= _)) return None
      val seq = fenceSeq + 1
      // K7 defensive file-level dedup (channel/Deduplicated.java:79-148):
      // a replayed envelope can list the same staged file twice; enforced
      // HERE in the commit builder so every public commit path gets it —
      // a path listed twice would double-read its rows forever
      val built = build(seq)
      val entry = built.copy(
        dataFiles = built.dataFiles.distinctBy(_.path),
        deleteFiles = built.deleteFiles.distinctBy(_.path))
      val tmp = root.resolve(s".tmp-${java.util.UUID.randomUUID()}")
      Files.write(tmp, mapper.writeValueAsBytes(entry))
      // publish via hard link: atomic full-content claim that FAILS if the
      // seq is taken (ATOMIC_MOVE silently replaces an existing target on
      // POSIX — it would lose concurrent commits)
      try {
        Files.createLink(commitPath(seq), tmp)
        Files.deleteIfExists(tmp)
        // Post-link zombie verify (K8): if another writer committed this
        // batchId first, its seq is LOWER than ours (lower seq wins, we
        // roll back) and lies in (fenceSeq, seq) — reading JUST that
        // window (O(concurrent writers) direct file reads) replaces the
        // previous full commits() scan, which paid a checkpoint + tail
        // deserialization on every hot-path commit.
        val dup = batchId >= 0 && ((fenceSeq + 1) until seq).exists(s =>
          readCommitOpt(commitPath(s)).exists(_.batchId == batchId))
        if (dup) {
          Files.deleteIfExists(commitPath(seq))
          return None
        }
        if (checkpointInterval > 0 && seq % checkpointInterval == 0) checkpoint(seq)
        return Some(entry)
      } catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          Files.deleteIfExists(tmp) // lost the race; reload and retry
      }
    }
    throw new IllegalStateException(s"commit conflict not resolved after $maxRetries attempts")
  }

  /** Consolidate commits 1..seq into one checkpoint file (idempotent —
    * losing a race to another writer's identical checkpoint is fine),
    * then run the retention sweep: crashed writers' `.tmp-*` leftovers
    * older than [[CommitLog.TmpSweepAgeMs]] (nothing else ever removes
    * them), and entry files at least TWO checkpoint intervals below this
    * checkpoint. Without the entry sweep the directory grows one file
    * per commit forever and every listing on the hot path pays O(N);
    * the data is fully covered by this checkpoint, so time travel and
    * audit reads are unaffected (`commits()` reads checkpoint + tail).
    * Two intervals of slack keep every tail file a reader with the
    * PREVIOUS checkpoint in hand can reference; a reader with an even
    * staler listing re-lists via commits()' vanished-tail retry.
    */
  private def checkpoint(seq: Long): Unit = {
    val upTo = commits().filter(_.seq <= seq)
    val tmp = root.resolve(s".tmp-ckpt-${java.util.UUID.randomUUID()}")
    Files.write(tmp, mapper.writeValueAsBytes(upTo))
    try {
      Files.createLink(ckptPath(seq), tmp)
    } catch {
      case _: java.nio.file.FileAlreadyExistsException => ()
    } finally {
      Files.deleteIfExists(tmp)
      ()
    }
    val cutoff = System.currentTimeMillis() - CommitLog.TmpSweepAgeMs
    val pruneBelow = seq - 2L * checkpointInterval
    listNames().foreach { n =>
      if (n.startsWith(".tmp-")) {
        val p = root.resolve(n)
        try {
          if (Files.getLastModifiedTime(p).toMillis <= cutoff) Files.deleteIfExists(p)
        } catch { case _: java.nio.file.NoSuchFileException => () }
      } else if (n.matches("v\\d+\\.json") && seqOf(n, "") <= pruneBelow) {
        Files.deleteIfExists(root.resolve(n))
      } else if (n.matches("ckpt-v\\d+\\.json") && seqOf(n, "ckpt-") <= pruneBelow) {
        // superseded checkpoints below the same horizon go too — only
        // the newest two generations are ever read
        Files.deleteIfExists(root.resolve(n))
      }
    }
    ()
  }
}

/** Thrown by a commit builder to abort an optimistic commit whose
  * plan-time assumptions a concurrent commit invalidated (Iceberg's
  * ValidationException-on-conflict analogue). The claimed seq is NOT
  * linked; the caller re-plans and retries.
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

object CommitLog {
  /** Age before a crashed writer's `.tmp-*` file is swept by the next
    * checkpoint — far above any live writer's write→link window
    * (milliseconds), so only genuine leftovers qualify. */
  private[table] val TmpSweepAgeMs: Long = 60L * 60 * 1000

  private[table] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def apply(dir: String): CommitLog = new CommitLog(Paths.get(dir))
}
