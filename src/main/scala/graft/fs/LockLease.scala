package graft.fs

/** Best-effort writer LEASE for commit logs on stores with NEITHER an
  * atomic no-overwrite create (HDFS-class) nor a conditional create
  * (S3A If-None-Match on Hadoop 3.4.1+, GCS preconditions) — the
  * check-then-act residue the exclusivity probe WARNs about. Opt-in via
  * the Hadoop conf key [[LockLease.ConfKey]] (`graft.commit.lease.ms`,
  * 0 = off, the default); [[graft.table.CommitLog]] wires it around its
  * claim loop when enabled.
  *
  * Protocol (one small `_lease` file per log directory):
  *  - RECORD: `epoch writerId renewedAtMs #` — epoch increments on every
  *    ownership change, so a holder can detect it was displaced even if
  *    its own id is later rewritten. The trailing `#` is a write
  *    TERMINATOR: a truncate-then-write prefix caught mid-flight can
  *    parse as three plausible tokens, so only a record that ends with
  *    the terminator counts as completely written (see [[readState]]).
  *  - ACQUIRE: read the record. A LIVE record (age < leaseMs) from
  *    another writer → wait and re-poll until `waitMs` expires, then
  *    fail LOUDLY. Absent or EXPIRED → write our own record with
  *    epoch+1 (a takeover of an expired lease logs one WARN naming the
  *    displaced writer), sleep `settleMs` so a concurrent taker's write
  *    can land, and read back: we own the lease iff our (epoch, id)
  *    survived. A GARBLED read (file present but unparseable — a
  *    concurrent truncate-then-write caught mid-flight) is never
  *    "absent": re-poll, and take over only bytes that stay identical
  *    for a full lease window (a writer that crashed mid-write).
  *  - HEARTBEAT: a daemon thread renews every leaseMs/3 while held.
  *    Renewal re-reads first: a record that is no longer ours (we were
  *    displaced after an expiry-length stall) marks the lease LOST with
  *    an ERROR — the holder must stop treating itself as the writer.
  *  - RELEASE: delete the file if still ours (clean handoff; a crash
  *    just lets the lease expire).
  *
  * Honesty boundary (documented in OPERATIONS.md): without a
  * compare-and-swap primitive this is BEST-EFFORT mutual exclusion —
  * two writers racing inside one `settleMs` window, or wall clocks
  * skewed by more than leaseMs across machines, can both believe they
  * hold the lease. The lease therefore narrows the multi-writer window
  * from EVERY commit to ownership-change events (crash takeover,
  * clock pathology); the commit log's claim verify + double-claim probe
  * stay in force underneath, so even a lease failure is never a SILENT
  * replacement. TwoJvmCommitRaceSuite races two real processes on the
  * widened check-then-act FS with the lease on and observes zero lost
  * or double-claimed commits.
  */
final class LockLease(
    dir: String,
    leaseMs: Long,
    val writerId: String = LockLease.defaultWriterId(),
    settleMs: Long = 120L) {
  require(leaseMs > 0, "leaseMs must be positive (0 disables the lease at the conf layer)")

  import LockLease.log

  private val path = s"$dir/_lease"
  @volatile private var heldEpoch: Long = -1L
  // garble-stability clock (guarded by `synchronized` in acquire): set
  // while consecutive reads return the same unparseable bytes, instance-
  // scoped so short-waitMs retry loops still accumulate stability
  private var garbleRaw: String = null
  private var garbleSince: Long = -1L
  // heartbeat GENERATION: bumped on every startHeartbeat so a re-acquired
  // lease always gets a fresh renewer even if the previous thread (which
  // marked the lease LOST) has not finished exiting — an isAlive guard
  // would see the dying thread and skip the start, leaving the new hold
  // with heldEpoch >= 0 and nobody renewing
  private val heartbeatGen = new java.util.concurrent.atomic.AtomicLong(0L)

  def held: Boolean = heldEpoch >= 0

  /** A lease-file read distinguishes ABSENT (no file) from GARBLED (file
    * present but unparseable). The distinction is load-bearing:
    * [[graft.fs.ControlFs.writeSmall]] overwrites by truncate-then-write,
    * so a reader polling during the holder's renewal can catch the file
    * EMPTY for a few microseconds — r18's full-suite run caught exactly
    * that: the poller read "absent", took the lease over at epoch 1, and
    * displaced a live holder. A garble is therefore never "absent": a
    * LIVE writer rewrites the record within leaseMs, so transient garble
    * resolves on re-poll, and only a garble that stays BYTE-IDENTICAL
    * for a full lease window is a writer that crashed mid-write.
    */
  private sealed trait LeaseRead
  private case object Absent extends LeaseRead
  private case class Garbled(raw: String) extends LeaseRead
  private case class Valid(epoch: Long, writer: String, renewedAt: Long) extends LeaseRead

  private def readState(): LeaseRead =
    ControlFs.readSmall(path) match {
      case None => Absent
      case Some(s) =>
        s.trim.split(' ') match {
          case Array(e, w, at, "#") => // terminator present = complete write
            try Valid(e.toLong, w, at.toLong)
            catch { case _: NumberFormatException => Garbled(s) }
          case _ => Garbled(s)
        }
    }

  private def readRecord(): Option[(Long, String, Long)] =
    readState() match {
      case Valid(e, w, at) => Some((e, w, at))
      case _               => None
    }

  private def write(epoch: Long): Unit =
    // the trailing "#" is a TERMINATOR: truncate-then-write means a
    // concurrent reader can catch any PREFIX of this line, and a prefix
    // that cuts the timestamp short ("5 wA 1755") still parses as three
    // tokens — a Valid-looking record with an ancient renewedAt that
    // would trigger an immediate expiry takeover of a LIVE holder. A
    // record without the terminator is provably incomplete → Garbled.
    ControlFs.writeSmall(path, s"$epoch $writerId ${System.currentTimeMillis()} #")

  /** Acquire (or re-confirm) the lease, polling up to `waitMs` against a
    * live holder. True = held; false = a LIVE writer kept it the whole
    * window, OR an unparseable record was still settling at the deadline
    * (mid-write by a live writer, or a crashed writer's garble younger
    * than the lease window) — either way the caller should fail its
    * commit loudly.
    */
  def acquire(waitMs: Long): Boolean = synchronized {
    val deadline = System.currentTimeMillis() + waitMs
    // write myEpoch, settle, and confirm — Some(result) ends the acquire,
    // None re-polls (lost the takeover race to a concurrent taker)
    def takeover(myEpoch: Long): Option[Boolean] = {
      write(myEpoch)
      Thread.sleep(settleMs) // let a racing taker's write land before we judge
      readState() match {
        case Valid(e, w, _) if e == myEpoch && w == writerId =>
          heldEpoch = myEpoch
          startHeartbeat()
          Some(true)
        case other =>
          heldEpoch = -1L // lost the takeover race — re-poll
          if (System.currentTimeMillis() >= deadline) {
            log.warn(s"lease at $path: lost the takeover race at the acquire " +
              s"deadline (read back $other after writing epoch $myEpoch) — " +
              "refusing to write")
            Some(false)
          } else None
      }
    }
    while (true) {
      val now = System.currentTimeMillis()
      val st = readState()
      // the garble-stability clock only survives CONSECUTIVE garble
      // reads — any parseable (or absent) state resets it in one place
      if (!st.isInstanceOf[Garbled]) { garbleRaw = null; garbleSince = -1L }
      st match {
        case Valid(e, w, _) if w == writerId && (heldEpoch == e || heldEpoch < 0) =>
          // ours (fresh acquire finding our own crash leavings re-enters)
          heldEpoch = e
          write(e)
          startHeartbeat()
          return true
        case Valid(e, w, at) if now - at < leaseMs =>
          // live foreign holder — poll until the window closes
          heldEpoch = -1L
          if (now >= deadline) {
            log.warn(s"lease at $path is held by live writer '$w' (epoch $e, " +
              s"renewed ${now - at} ms ago) — refusing to write")
            return false
          }
          Thread.sleep(math.min(math.max(leaseMs / 4, 10L), 250L))
        case Garbled(raw) =>
          // mid-write garble (see LeaseRead): re-poll — a live writer
          // resolves it within a renewal period. Only the SAME bytes
          // persisting a full lease window mean a crashed mid-write
          // holder; take over then (no readable epoch — start at 1; any
          // displaced holder detects the identity mismatch regardless).
          // The clock lives on the INSTANCE, so a retrying caller whose
          // per-call waitMs is shorter than the lease still accumulates
          // stability across calls instead of restarting it each time.
          if (garbleRaw != raw) { garbleRaw = raw; garbleSince = now }
          if (now - garbleSince >= leaseMs) {
            log.warn(s"lease file at $path has held the same unparseable content " +
              s"(${raw.length} bytes) for ${now - garbleSince} ms (>= lease $leaseMs ms) " +
              "— a writer crashed mid-write; taking the lease over")
            garbleRaw = null; garbleSince = -1L
            takeover(1L) match { case Some(r) => return r; case None => () }
          } else if (now >= deadline) {
            log.warn(s"lease file at $path is unparseable and still settling at the " +
              "acquire deadline — refusing to write (a concurrent writer is mid-update, " +
              "or a crashed one whose garble is younger than the lease window)")
            heldEpoch = -1L
            return false
          } else {
            // fresh garble resolves within one renewal period — poll fast;
            // past that, it is almost certainly a crashed writer and we
            // are just waiting out the lease window — back off to the
            // live-holder cadence (leaseMs = 60 s would otherwise mean
            // ~6000 control-plane reads in a tight 10 ms loop)
            if (now - garbleSince < math.max(leaseMs / 3, 10L)) Thread.sleep(10L)
            else Thread.sleep(math.min(math.max(leaseMs / 4, 10L), 250L))
          }
        case st2 =>
          // absent or expired: take it, loudly when displacing someone
          val prior = st2 match { case Valid(e, w, at) => Some((e, w, at)); case _ => None }
          prior.foreach { case (e, w, at) =>
            log.warn(s"TAKING OVER expired lease at $path from writer '$w' " +
              s"(epoch $e, last renewed ${now - at} ms ago > lease $leaseMs ms) — " +
              "if that writer is merely stalled, its next renewal will detect the " +
              "displacement and stop")
          }
          takeover(prior.map(_._1 + 1L).getOrElse(1L)) match {
            case Some(r) => return r
            case None    => ()
          }
      }
    }
    false
  }

  /** One renewal. False (with an ERROR log) when the record is no longer
    * ours — the holder was displaced and must stop writing.
    */
  def renew(): Boolean = synchronized {
    if (heldEpoch < 0) return false
    readRecord() match {
      case Some((e, w, _)) if e == heldEpoch && w == writerId =>
        write(heldEpoch); true
      case other =>
        log.error(s"lease at $path LOST: expected (epoch $heldEpoch, '$writerId') " +
          s"but found $other — this writer was displaced (expiry takeover after a " +
          "stall, or clock skew); stopping renewals")
        heldEpoch = -1L
        false
    }
  }

  def release(): Unit = synchronized {
    if (heldEpoch >= 0) {
      readRecord() match {
        case Some((e, w, _)) if e == heldEpoch && w == writerId =>
          ControlFs.delete(path, recursive = false)
        case _ => () // displaced — nothing of ours to remove
      }
      heldEpoch = -1L
    }
  }

  private def startHeartbeat(): Unit = {
    val gen = heartbeatGen.incrementAndGet()
    val t = new Thread(() => {
      // no early `return` in a lambda (it would throw NonLocalReturnControl)
      var live = true
      // anchored at the LAST SUCCESSFUL renewal, not the first failure's
      // catch: a renew() that blocks a long time in FS-client retries
      // before throwing must count its blocked time against the lease —
      // the record expired for other writers while we were stuck
      var lastOkMs = System.currentTimeMillis()
      while (live && held && heartbeatGen.get() == gen) {
        try Thread.sleep(math.max(leaseMs / 3, 10L))
        catch { case _: InterruptedException => live = false }
        if (live && held && heartbeatGen.get() == gen) {
          // A transient FS error from renew() must not kill the heartbeat
          // SILENTLY — the holder would keep believing it holds a lease
          // nobody is renewing until the next commit's acquire(). Log and
          // retry; once the time since the last successful renewal spans
          // a full lease window the record is expired for every other
          // writer (a takeover is legitimate), so mark the lease LOST
          // loudly instead of pretending.
          val epochAtAttempt = heldEpoch
          try {
            if (!renew()) live = false
            lastOkMs = System.currentTimeMillis()
          } catch {
            case scala.util.control.NonFatal(ex) =>
              val now = System.currentTimeMillis()
              if (now - lastOkMs >= leaseMs) {
                log.error(s"lease at $path: no successful renewal for " +
                  s"${now - lastOkMs} ms (>= lease $leaseMs ms) — the record is " +
                  s"expired for every other writer; marking the lease LOST " +
                  s"(last error: $ex)")
                synchronized { if (heldEpoch == epochAtAttempt) heldEpoch = -1L }
                live = false
              } else {
                log.warn(s"lease renewal at $path failed transiently ($ex); retrying")
              }
          }
        }
      }
    }, s"graft-lease-heartbeat-$writerId")
    t.setDaemon(true)
    t.start()
  }
}

object LockLease {
  /** Opt-in knob: lease duration in ms; 0 (default) disables the lease. */
  val ConfKey = "graft.commit.lease.ms"

  private lazy val log = org.slf4j.LoggerFactory.getLogger(classOf[LockLease])

  /** pid@host-uuid — unique per process, readable in takeover logs. */
  def defaultWriterId(): String = {
    val jvm = java.lang.management.ManagementFactory.getRuntimeMXBean.getName
    s"$jvm-${java.util.UUID.randomUUID().toString.take(8)}"
  }

  /** The configured lease for a log directory, if the knob is set. */
  def fromConf(dir: String): Option[LockLease] = {
    val ms = ControlFs.conf.getLong(ConfKey, 0L)
    if (ms <= 0) None else Some(new LockLease(dir, ms))
  }
}
