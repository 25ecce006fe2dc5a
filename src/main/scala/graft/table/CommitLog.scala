package graft.table

import com.fasterxml.jackson.databind.{DeserializationFeature, ObjectMapper}
import com.fasterxml.jackson.module.scala.DefaultScalaModule

import graft.fs.ControlFs

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

/** Append-only JSON commit log with create-exclusive commit claims on
  * Hadoop's FileSystem layer.
  *
  * Reproduces the commit semantics the reference gets from Iceberg's
  * optimistic snapshot commit: writers race to claim `v{seq}.json`; the
  * loser reloads and retries (`data/SchemaUtils.applySchemaUpdates:85-132`
  * uses the same retry-on-conflict pattern for schema commits).
  *
  * The claim primitive is [[ControlFs.createExclusive]] — one create
  * call, no rename, no hard link (the pre-r15 log published via
  * `Files.createLink`, a POSIX hard link that does not exist on HDFS or
  * object stores; the whole control plane now rides the same Hadoop
  * filesystem the data files are written through, so a table on
  * `hdfs://`/`s3a://` keeps its log next to its data instead of silently
  * on the driver's local disk). Where the FS cannot make the claim
  * atomic (local FS, S3A without conditional creates), a racing loser
  * could truncate-over the winner's entry — so every claim is VERIFIED
  * by reading it back: whoever reads back their own commitId owns the
  * seq; anyone else retries at the next seq. Read-back arbitration is
  * complete for SAME-JVM racers (a stripe lock additionally serializes
  * the check+create+write window — all committers of a single-driver
  * deployment share one JVM) and on atomic-create filesystems; two
  * committers in DIFFERENT processes on a check-then-act FS can each
  * pass their own read-back in turn (B's existence check can predate
  * A's object becoming visible, and B's truncate lands after A already
  * verified), so multi-driver writes to one table on such an FS are a
  * documented single-committer boundary — the exclusivity probe WARNs
  * at the first publish, and S3A with conditional creates (Hadoop
  * 3.4.1+) lifts it. A claim file that stays
  * unparseable (writer crashed mid-create) is an ABORTED claim: readers
  * skip it — its writer never got a success, so the batch replays —
  * and its seq is never reused (create-exclusive fails on it forever),
  * which keeps seq attribution stable.
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
final class CommitLog(val root: String, checkpointInterval: Int = 100) {
  import CommitLog.{mapper, log => slog}

  private def commitPath(seq: Long): String = f"$root/v$seq%09d.json"
  private def ckptPath(seq: Long): String = f"$root/ckpt-v$seq%09d.json"

  private def listNames(): Seq[String] = ControlFs.listNames(root)

  private def seqOf(name: String, prefix: String): Long =
    name.stripPrefix(prefix).stripPrefix("v").stripSuffix(".json").toLong

  /** Claim files judged permanently aborted (crashed writers): only an
    * entry BOTH unparseable and older than [[CommitLog.AbortedClaimAgeMs]]
    * is cached — a young unparseable entry may be a writer mid-create and
    * must be re-examined on the next read, or a racing reader could
    * permanently hide a commit that lands milliseconds later.
    */
  private val knownAborted =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()

  /** Opt-in writer lease (r17, `graft.commit.lease.ms`): resolved once
    * per log from the Hadoop conf; None (default) = protocol unchanged.
    */
  private lazy val lease: Option[graft.fs.LockLease] = graft.fs.LockLease.fromConf(root)

  /** How long an acquirer polls a LIVE foreign lease before failing the
    * commit: two lease windows covers one missed heartbeat plus the
    * takeover settle. */
  private def leaseWaitMs: Long =
    2L * ControlFs.conf.getLong(graft.fs.LockLease.ConfKey, 0L)

  /** Clean lease handoff for tools/tests that finish writing (a crashed
    * writer just lets it expire). No-op when the lease is off. */
  def releaseLease(): Unit = lease.foreach(_.release())

  import CommitLog.{Aborted, Missing, Parsed, ReadResult}

  /** Read one claim file, distinguishing the three states the
    * create-exclusive protocol can leave it in: parseable (committed),
    * missing (rolled back or swept — the caller's re-list logic owns
    * it), or present-but-unparseable. The last is EITHER a writer mid
    * create (the content lands within milliseconds) or a crashed
    * writer's permanent leavings — retried with a short backoff to
    * cover the in-flight window, then treated as an aborted claim and
    * skipped: its writer never observed success, so the batch replays
    * under a later seq. The aborted judgment is only CACHED once the
    * file is old enough that no live writer can still be filling it.
    */
  private def readCommitRes(p: String, retries: Int = 4): ReadResult = {
    if (knownAborted.contains(p)) {
      // Self-healing cache hit: ONE plain read, no backoff loop (the
      // loop is what the cache exists to skip). A writer that outlived
      // the liveness window and then completed anyway — or a freed seq
      // number re-claimed after the unparseable file was swept — must
      // become visible again rather than stay hidden until this handle's
      // process restarts.
      ControlFs.readSmallBytes(p) match {
        case None => knownAborted.remove(p); return Missing
        case Some(bytes) =>
          try {
            val c = mapper.readValue(bytes, classOf[Commit])
            knownAborted.remove(p)
            return Parsed(c)
          } catch {
            case _: java.io.IOException | _: RuntimeException => return Aborted
          }
      }
    }
    var i = 0
    while (true) {
      ControlFs.readSmallBytes(p) match {
        case None => return Missing
        case Some(bytes) =>
          try return Parsed(mapper.readValue(bytes, classOf[Commit]))
          catch {
            case _: java.io.IOException | _: RuntimeException =>
              if (i >= retries) {
                ControlFs.status(p) match {
                  // vanished DURING the retry loop: a dup-verify rollback
                  // deleted it (that head seq number is free for reuse, so
                  // judging — let alone CACHING — this path aborted would
                  // hide the next real commit at the same seq) or a sweep
                  // took it; either way Missing, and the caller's
                  // vanished-tail re-list logic owns it
                  case None => return Missing
                  case Some(st) =>
                    if (st.getModificationTime <
                        System.currentTimeMillis() - CommitLog.AbortedClaimAgeMs) {
                      knownAborted.add(p)
                      slog.warn(s"CommitLog at $root: claim $p is unparseable and " +
                        "past the writer-liveness window — treating as an aborted " +
                        "(crashed) commit claim; its batch will have replayed " +
                        "under a later seq")
                    }
                    return Aborted
                }
              }
              i += 1
              Thread.sleep(10L << i) // 20/40/80/160 ms — covers a create in flight
          }
      }
    }
    Missing // unreachable
  }

  private def readCommitOpt(p: String): Option[Commit] =
    readCommitRes(p) match {
      case Parsed(c) => Some(c)
      case _         => None
    }

  def commits(): Seq[Commit] = commitsAttempt(retries = 3)

  private def commitsAttempt(retries: Int): Seq[Commit] = {
    val names = listNames()
    if (names.isEmpty) return Nil
    // newest PARSEABLE checkpoint wins; an aborted (crashed-mid-create)
    // checkpoint never swept anything — the writer sweeps only after
    // verifying its own checkpoint parses — so falling back one
    // generation always finds every pruned entry covered
    val ckptNames = names.filter(_.matches("ckpt-v\\d+\\.json")).sorted.reverse
    var base: Seq[Commit] = Nil
    var from = 0L
    var picked = false
    var vanishedCkpt = false
    val it = ckptNames.iterator
    while (!picked && it.hasNext) {
      val n = it.next()
      ControlFs.readSmallBytes(s"$root/$n") match {
        case None =>
          // swept under a stale listing (see checkpoint()'s retention
          // sweep) — re-list; the fresh listing's newer checkpoint
          // covers everything this one did
          vanishedCkpt = true
          picked = true
        case Some(bytes) =>
          try {
            base = mapper.readValue(bytes, classOf[Array[Commit]]).toSeq
            from = seqOf(n, "ckpt-")
            picked = true
          } catch {
            case _: java.io.IOException | _: RuntimeException =>
              () // aborted checkpoint — fall back to the next older one
          }
      }
    }
    if (vanishedCkpt) {
      if (retries > 0) return commitsAttempt(retries - 1)
      throw new IllegalStateException(
        s"CommitLog at $root: checkpoints kept vanishing between listing and read")
    }
    val tailNames = names
      .filter(_.matches("v\\d+\\.json"))
      .filter(seqOf(_, "") > from)
      .sorted
    var vanished = 0
    val tail = tailNames.flatMap { n =>
      readCommitRes(s"$root/$n") match {
        case Parsed(c) => Some(c)
        case Aborted   => None // crashed claim — skip, seq stays burned
        case Missing   => vanished += 1; None
      }
    }
    // A VANISHED tail file is EITHER a zombie its writer rolled back
    // (skipping is correct — the batchId filter below would drop it) OR
    // an entry pruned by a checkpoint that landed after our listing (the
    // retention sweep only deletes entries a NEWER checkpoint covers).
    // The two are indistinguishable here, so when anything vanished,
    // re-list: a fresh listing's checkpoint covers every pruned seq, and
    // the zombie case merely pays one extra listing on a rare path.
    if (vanished > 0) {
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
    // max is a zombie's duplicate that crashed between claim and rollback
    // (see commit()'s post-claim verify) — readers drop it, and the next
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
    * batch claimed above the real head would understate the fence and let
    * the NEXT batch's replay double-commit — by checking one step of
    * batch-id monotonicity against the previous entry and falling back
    * to the filtered log when it is violated. (Residual assumption: two
    * or more DISTINCT-batch zombies stacked in increasing batch order
    * would still fool the fast path; that needs two different replayed
    * batches both crashing between claim and rollback at the head, which
    * the single-coordinator deployment cannot produce.)
    */
  def lastBatchId(): Option[Long] = lastBatchIdFrom(
    listNames().filter(_.matches("v\\d+\\.json")).map(seqOf(_, "")).sorted)

  private def lastBatchIdFrom(seqs: Seq[Long]): Option[Long] =
    lastBatchIdFromHead(seqs,
      if (seqs.isEmpty) Missing else readCommitRes(commitPath(seqs.last)))

  /** [[lastBatchIdFrom]] with the head claim already read — the commit
    * hot path shares one head read between this fence and its
    * confirmed-seq scan.
    */
  private def lastBatchIdFromHead(seqs: Seq[Long], headRes: ReadResult): Option[Long] = {
    if (seqs.isEmpty) None
    else
      (headRes match { case Parsed(c) => Some(c); case _ => None }) match {
        case Some(c) if c.batchId >= 0 =>
          val monotone = seqs.size < 2 ||
            readCommitOpt(commitPath(seqs(seqs.size - 2)))
              .forall(p => p.batchId < 0 || p.batchId <= c.batchId)
          if (monotone) Some(c.batchId)
          else commits().filter(_.batchId >= 0).lastOption.map(_.batchId)
        // batchId < 0, an aborted claim, or the last entry was a zombie
        // rolled back between the directory listing and the read — fall
        // back to the full (self-healing) log
        case _ => commits().filter(_.batchId >= 0).lastOption.map(_.batchId)
      }
  }

  /** Atomically commit; returns None if the batchId was already committed
    * (exactly-once replay guard, K8). `build` receives the claimed seq and
    * runs once per attempt — it may throw [[CommitConflictException]] to
    * abort the commit (optimistic conflict validation, e.g. a rewrite
    * detecting a concurrent delete); nothing is claimed in that case.
    */
  def commit(batchId: Long, build: Long => Commit, maxRetries: Int = 10): Option[Commit] = {
    // Opt-in lock-lease arm (r17) for stores with neither atomic nor
    // conditional creates: serialize WRITERS (not claims) behind a
    // heartbeat lease, held across commits once acquired — takeover only
    // at expiry (crash), always loud. The claim protocol below stays in
    // force underneath, so even the lease's documented best-effort
    // windows (settle race, clock skew) can never make a replacement
    // silent. See graft.fs.LockLease + OPERATIONS.md.
    lease.foreach { l =>
      if (!l.acquire(waitMs = leaseWaitMs))
        throw new IllegalStateException(
          s"commit of batch $batchId refused: another LIVE writer holds the " +
            s"lease at $root (waited $leaseWaitMs ms). One writer per log — " +
            s"if the holder crashed, its lease expires and the next attempt " +
            "takes over loudly.")
    }
    var attempt = 0
    // Highest seq PROVEN claimed by a refused/lost create, even when the
    // directory listing does not show it yet (LIST-after-write lag on
    // object stores — exists/HEAD is consistent where LIST lags). Without
    // it, a committer behind a lagging listing retries the same seq until
    // maxRetries and dies with zero progress; with it, the refusal itself
    // advances the fence. Safety is unchanged: the post-claim duplicate
    // window below re-reads every skipped seq DIRECTLY (consistent reads),
    // so a hidden same-batch duplicate is still caught.
    // (ObjectStoreSemanticsSuite drives this deterministically.)
    var seqFloor = 0L
    while (attempt < maxRetries) {
      attempt += 1
      // ONE directory listing per attempt, shared by the fence snapshot,
      // the replay guard, and the seq claim (three separate listings here
      // made the hot path O(3·entries) per commit). Any same-batch
      // duplicate claimed after this snapshot has seq > fenceSeq, so the
      // post-claim verify's (fenceSeq, seq) window provably contains it;
      // one claimed at or before fenceSeq is visible to the lastBatchId
      // fence (batch ids commit in increasing order). A racer claiming
      // fenceSeq+1 first just fails our create-exclusive below — retry.
      val seqs = listNames().filter(_.matches("v\\d+\\.json")).map(seqOf(_, "")).sorted
      val listedFence = if (seqs.isEmpty) 0L else seqs.last
      val fenceSeq = math.max(listedFence, seqFloor)
      // ONE head read shared by the replay fence and the confirmed-seq
      // scan below (they used to each read+parse the same head file —
      // one GET per commit saved on object stores). batchId < 0 commits
      // (compaction/rewrite/reconcile) consult neither — skip the read
      // entirely, as the pre-r15 short-circuit did.
      val headRes =
        if (seqs.isEmpty || batchId < 0) Missing
        else readCommitRes(commitPath(seqs.last))
      if (batchId >= 0 && lastBatchIdFromHead(seqs, headRes).exists(batchId <= _)) return None
      // Newest CONFIRMED (parseable) claim at snapshot time: claims above
      // it are in-flight or aborted and their batchIds were NOT visible
      // to the replay fence — the post-claim verify below must re-examine
      // exactly (confirmedSeq, seq), or a same-batch racer whose content
      // had not landed when we read the fence could double-commit. (With
      // the pre-r15 hard-link publish a listed entry was always complete,
      // so the raw fence sufficed; create-then-write visibility is what
      // widens the window.)
      // anchored on the LISTED head, never the seqFloor-raised fence: seqs
      // between the listed head and the floor are exactly the ones a
      // lagging listing hid, and the dup window below must re-read them
      val confirmedSeq =
        if (batchId < 0) fenceSeq
        else headRes match {
          case Parsed(_) => listedFence
          case _ => seqs.reverseIterator.drop(1).find(s =>
            readCommitRes(commitPath(s)) match {
              case Parsed(_) => true
              case _         => false
            }).getOrElse(0L)
        }
      val seq = fenceSeq + 1
      // K7 defensive file-level dedup (channel/Deduplicated.java:79-148):
      // a replayed envelope can list the same staged file twice; enforced
      // HERE in the commit builder so every public commit path gets it —
      // a path listed twice would double-read its rows forever
      val built = build(seq)
      val entry = built.copy(
        dataFiles = built.dataFiles.distinctBy(_.path),
        deleteFiles = built.deleteFiles.distinctBy(_.path))
      val bytes = mapper.writeValueAsBytes(entry)
      val path = commitPath(seq)
      // publish via create-exclusive claim — atomic where the FS can
      // (HDFS, conditional-create object stores); where it can't, the
      // read-back verify below arbitrates: whoever reads their own
      // commitId out of the file owns the seq
      val claimStarted = System.currentTimeMillis()
      val claimed =
        try { ControlFs.createExclusive(path, bytes); true }
        catch { // lost the race; reload and retry (any other IOException
          //       is a real FS failure and propagates)
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        }
      if (claimed) {
        val ownsSeq = readCommitRes(path) match {
          case Parsed(c) => c.commitId == entry.commitId
          case _         => false // truncated-over by a racer mid-write
        }
        if (ownsSeq) {
          // Post-claim zombie verify (K8): if another writer committed
          // this batchId first, its seq is LOWER than ours (lower seq
          // wins, we roll back) and lies in (confirmedSeq, seq) — reading
          // JUST that window (O(concurrent writers) direct file reads)
          // replaces a full commits() scan, which paid a checkpoint +
          // tail deserialization on every hot-path commit.
          val dup = batchId >= 0 && ((confirmedSeq + 1) until seq).exists(s =>
            readCommitOpt(commitPath(s)).exists(_.batchId == batchId))
          if (dup) {
            ControlFs.delete(path, recursive = false)
            return None
          }
          // Liveness contract, writer side: readers judge a claim whose
          // content hasn't landed within AbortedClaimAgeMs as a crashed
          // writer's leavings, and a checkpoint may consolidate past it.
          // A writer that stalled PAST the window (pathological GC/FS
          // pause) cannot just report success — its claim may already be
          // invisible. One full visibility check, paid only in the
          // pathological case; if consolidated away, fail so the batch
          // replays under a fresh seq (the claim's data files are
          // unreferenced and gc-reapable).
          if (System.currentTimeMillis() - claimStarted > CommitLog.AbortedClaimAgeMs &&
              !commits().exists(_.commitId == entry.commitId)) {
            ControlFs.delete(path, recursive = false)
            throw new IllegalStateException(
              s"commit of batch $batchId at seq $seq exceeded the claim-liveness " +
                s"window (${CommitLog.AbortedClaimAgeMs} ms) and was consolidated " +
                "past by a checkpoint — the claim was rolled back; replay the batch")
          }
          // The claim is durably published at this point — checkpointing
          // is an optimization and must NEVER turn a succeeded commit
          // into a caller-visible failure (the batch would replay, the
          // fence would return None, and the replay's staged files would
          // be dropped as orphans — correct but a full wasted batch).
          // checkpoint() already absorbs its create failure; this guard
          // covers the rest of its body (commits() churn aborts, sweep
          // delete IO errors).
          if (checkpointInterval > 0 && seq % checkpointInterval == 0) {
            // success/failure accounting lives INSIDE checkpoint(): its
            // create-IOException arm is absorbed there (a checkpoint
            // failure must never fail the commit), so only checkpoint()
            // knows whether pruning actually progressed — marking success
            // out here would reset the stuck-sweep alarm on exactly the
            // "log will never prune" pathology it exists to surface.
            try checkpoint(seq)
            catch {
              case scala.util.control.NonFatal(e) =>
                graft.fs.SweepAlarm.failed(s"commit-log checkpoint at $root", e,
                  s"the commit at seq $seq stands; the log will not prune " +
                    "until a checkpoint succeeds")
                ()
            }
          }
          return Some(entry)
        }
      }
      // the refused (or truncated-over) claim proves `seq` is occupied
      // even if the next listing does not show it — advance the floor so
      // the retry makes progress against a lagging namespace
      seqFloor = seq
    }
    throw new IllegalStateException(s"commit conflict not resolved after $maxRetries attempts")
  }

  /** Consolidate commits 1..seq into one checkpoint file (idempotent —
    * losing a race to another writer's identical checkpoint is fine),
    * then run the retention sweep: crashed writers' `.tmp-*` leftovers
    * from pre-r15 logs older than [[CommitLog.TmpSweepAgeMs]] (nothing
    * else ever removes them), and entry files at least TWO checkpoint
    * intervals below this checkpoint. Without the entry sweep the
    * directory grows one file per commit forever and every listing on
    * the hot path pays O(N); the data is fully covered by this
    * checkpoint, so time travel and audit reads are unaffected
    * (`commits()` reads checkpoint + tail). Two intervals of slack keep
    * every tail file a reader with the PREVIOUS checkpoint in hand can
    * reference; a reader with an even staler listing re-lists via
    * commits()' vanished-tail retry.
    *
    * The sweep runs ONLY after the checkpoint at `seq` reads back
    * parseable — a claim garbled by a crash or a local-FS race must
    * never prune the entries it failed to cover (readers fall back to
    * the previous checkpoint generation, whose tail must stay whole).
    */
  private def checkpoint(seq: Long): Unit = {
    val upTo = commits().filter(_.seq <= seq)
    // Refuse to consolidate past an IN-FLIGHT claim: a claim whose
    // content hasn't landed yet reads as aborted after the short backoff,
    // but its writer — still inside the liveness window — may complete
    // it and observe success. Baking that judgment into a checkpoint
    // (whose sweep later DELETES the entry) would hide a real commit.
    // Past the window it's a crashed writer's leavings by contract
    // (commit()'s writer-side guard enforces the other half), and the
    // checkpoint proceeds. Deferral is cheap: the next interval retries.
    val covered = upTo.map(_.seq).toSet
    val now = System.currentTimeMillis()
    val inFlight = listNames().exists { n =>
      n.matches("v\\d+\\.json") && seqOf(n, "") <= seq &&
      !covered.contains(seqOf(n, "")) &&
      ControlFs.status(s"$root/$n")
        .exists(_.getModificationTime >= now - CommitLog.AbortedClaimAgeMs)
    }
    if (inFlight) {
      slog.info(s"CommitLog at $root: checkpoint at seq $seq deferred — an " +
        "in-flight claim below it has not landed yet; the next interval retries")
      return
    }
    try ControlFs.createExclusive(ckptPath(seq), mapper.writeValueAsBytes(upTo))
    catch {
      case _: org.apache.hadoop.fs.FileAlreadyExistsException => () // racer won; theirs is as good
      case e: java.io.IOException =>
        // checkpointing is an OPTIMIZATION (commits stay correct without
        // it), so an FS failure here must not fail the commit — but a
        // PERSISTENT failure disables the retention sweep too and every
        // hot-path listing degrades to O(history), so it escalates
        // through the stuck-sweep alarm (WARN, then ERROR after 3
        // consecutive intervals) instead of staying an even WARN stream
        graft.fs.SweepAlarm.failed(s"commit-log checkpoint at $root", e,
          "the log keeps working but will not prune until a checkpoint succeeds")
        ()
    }
    val readable = ControlFs.readSmallBytes(ckptPath(seq)).exists { bytes =>
      try { mapper.readValue(bytes, classOf[Array[Commit]]); true }
      catch { case _: java.io.IOException | _: RuntimeException => false }
    }
    if (!readable) return
    val cutoff = System.currentTimeMillis() - CommitLog.TmpSweepAgeMs
    val pruneBelow = seq - 2L * checkpointInterval
    ControlFs.list(root).foreach { st =>
      val n = st.getPath.getName
      if (n.startsWith(".tmp-")) {
        if (st.getModificationTime <= cutoff)
          ControlFs.delete(st.getPath.toString, recursive = false)
      } else if (n.matches("v\\d+\\.json") && seqOf(n, "") <= pruneBelow) {
        ControlFs.delete(st.getPath.toString, recursive = false)
      } else if (n.matches("ckpt-v\\d+\\.json") && seqOf(n, "ckpt-") <= pruneBelow) {
        // superseded checkpoints below the same horizon go too — only
        // the newest two generations are ever read
        ControlFs.delete(st.getPath.toString, recursive = false)
      }
    }
    // full consolidation + sweep completed: pruning is progressing
    graft.fs.SweepAlarm.succeeded(s"commit-log checkpoint at $root")
  }
}

/** Thrown by a commit builder to abort an optimistic commit whose
  * plan-time assumptions a concurrent commit invalidated (Iceberg's
  * ValidationException-on-conflict analogue). The claimed seq is NOT
  * published; the caller re-plans and retries.
  */
final class CommitConflictException(msg: String) extends RuntimeException(msg)

object CommitLog {
  /** Age before a pre-r15 writer's `.tmp-*` file is swept by the next
    * checkpoint — far above any live writer's write→link window
    * (milliseconds), so only genuine leftovers qualify. The r15+ claim
    * protocol writes no tmp files; the sweep arm remains for logs
    * migrated from the hard-link era. */
  private[table] val TmpSweepAgeMs: Long = 60L * 60 * 1000

  /** Age past which an unparseable claim file is judged a crashed
    * writer's permanent leavings (and the judgment cached): a live
    * writer fills its claim within milliseconds of creating it, so a
    * minute of slack is orders of magnitude above any real
    * create→write window while keeping genuinely aborted claims from
    * costing the parse-retry backoff on every read forever.
    */
  private[table] val AbortedClaimAgeMs: Long = 60L * 1000

  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[CommitLog])

  /** Tri-state read of a claim file (see [[CommitLog]]'s protocol notes). */
  private[table] sealed trait ReadResult
  private[table] final case class Parsed(c: Commit) extends ReadResult
  private[table] case object Missing extends ReadResult
  private[table] case object Aborted extends ReadResult

  private[table] val mapper: ObjectMapper = {
    val m = new ObjectMapper()
    m.registerModule(DefaultScalaModule)
    m.configure(DeserializationFeature.FAIL_ON_UNKNOWN_PROPERTIES, false)
    m
  }

  def apply(dir: String): CommitLog = new CommitLog(dir)
}
