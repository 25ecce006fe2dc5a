package graft.fs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** Protocol pins for the opt-in writer lease (r17): acquire/refuse,
  * expiry takeover (loud), displaced-holder detection, clean release.
  * The cross-process demonstration (two real JVMs, widened
  * check-then-act FS, zero lost commits) lives in TwoJvmCommitRaceSuite.
  */
class LockLeaseSuite extends AnyFunSuite {
  // an active session pins ControlFs.conf to ONE Configuration — without
  // it every ControlFs.conf call builds a fresh one and the CommitLog
  // test's conf.setLong would mutate a throwaway object
  private lazy val spark = TestSpark.spark

  // the protocol is pure ControlFs reads/writes — a local dir exercises
  // every branch (timing, not FS atomicity, is what's under test here)
  private def dir(p: String) = TestSpark.freshDir(p)

  test("second writer refuses while the holder is live, acquires after release") {
    val d = dir("lease-live")
    val a = new LockLease(d, leaseMs = 5000, writerId = "wA", settleMs = 20)
    val b = new LockLease(d, leaseMs = 5000, writerId = "wB", settleMs = 20)
    assert(a.acquire(waitMs = 1000))
    assert(a.held)
    assert(!b.acquire(waitMs = 300), "a live lease must refuse a second writer")
    assert(!b.held)
    a.release()
    assert(!a.held)
    assert(b.acquire(waitMs = 1000), "release must hand off immediately")
    b.release()
  }

  test("expiry takeover: a crashed holder's lease is taken loudly, with an " +
    "epoch bump the displaced holder detects on renew") {
    val d = dir("lease-expire")
    // "crash" = a holder whose heartbeat never runs: tiny lease, renew
    // suppressed by acquiring then never committing (heartbeat runs at
    // leaseMs/3 — kill it by releasing the thread via displacement below)
    val a = new LockLease(d, leaseMs = 250, writerId = "wA", settleMs = 20)
    assert(a.acquire(waitMs = 500))
    // stop A's heartbeat the blunt way: interrupt by letting B displace
    // after expiry — so first, wait out the lease without renewals.
    // (The heartbeat renews every ~83ms; to simulate a stall, take the
    // monitor A's renew needs so renewals cannot land.)
    a.synchronized {
      Thread.sleep(600) // > leaseMs with renewals blocked
      val b = new LockLease(d, leaseMs = 250, writerId = "wB", settleMs = 20)
      assert(b.acquire(waitMs = 1000), "an expired lease must be takeable")
      assert(b.held)
    }
    // A's next renewal (or explicit renew) must detect the displacement
    assert(!a.renew(), "displaced holder must detect the epoch bump and stop")
    assert(!a.held)
  }

  test("takeover of an ABSENT record starts at epoch 1; takeover of an expired " +
    "one bumps the epoch") {
    val d = dir("lease-epoch")
    val a = new LockLease(d, leaseMs = 200, writerId = "wA", settleMs = 10)
    assert(a.acquire(waitMs = 500))
    a.synchronized {
      Thread.sleep(450)
      val b = new LockLease(d, leaseMs = 200, writerId = "wB", settleMs = 10)
      assert(b.acquire(waitMs = 800))
      b.release()
    }
    assert(!a.renew())
  }

  test("re-acquire by the same writer is idempotent and keeps the lease") {
    val d = dir("lease-reacq")
    val a = new LockLease(d, leaseMs = 5000, writerId = "wA", settleMs = 10)
    assert(a.acquire(waitMs = 500))
    assert(a.acquire(waitMs = 500), "holder re-acquire must succeed without takeover")
    assert(a.renew())
    a.release()
  }

  test("a garbled lease file is never treated as absent: acquire re-polls, refuses at " +
    "the deadline while the garble is fresh, and takes over only a STABLE garble older " +
    "than the lease window (r18)") {
    val d = dir("lease-garble")
    // two fields — unparseable, like a truncate-then-write caught mid-
    // flight (the full-suite flake: a poller read the mid-write file as
    // ABSENT and displaced a live holder at epoch 1)
    graft.fs.ControlFs.writeSmall(s"$d/_lease", "1 wA")
    val b = new LockLease(d, leaseMs = 600, writerId = "wB", settleMs = 20)
    assert(!b.acquire(waitMs = 150), "a fresh garble must be re-polled, not taken over")
    assert(!b.held)
    // the same bytes persisting a full lease window = a crashed mid-write
    // writer; the takeover is legitimate (and loud)
    assert(b.acquire(waitMs = 2500), "a stable garble past the lease window is takeable")
    assert(b.held)
    b.release()
  }

  test("heartbeat survives a TRANSIENT FS outage (retry, lease kept) but marks the " +
    "lease LOST once failures span a full lease window (r18)") {
    val conf = spark.sparkContext.hadoopConfiguration
    conf.set("fs.leaseflaky.impl", classOf[graft.LeaseFlakyFs].getName)
    val d = s"leaseflaky:${graft.TestSpark.freshDir("lease-flaky")}"
    val a = new LockLease(d, leaseMs = 1200, writerId = "wA", settleMs = 20)
    try {
      assert(a.acquire(waitMs = 1000))
      // transient: fail renewals for ~600 ms (≥1 heartbeat at the 400 ms
      // period), well under the 1200 ms lease — the pre-fix heartbeat
      // thread DIED on the first exception, leaving heldEpoch set with
      // nobody renewing; now it logs, retries, and keeps the lease
      graft.LeaseFlakyFs.failing.set(true)
      Thread.sleep(600)
      graft.LeaseFlakyFs.failing.set(false)
      Thread.sleep(600) // a healthy renewal lands
      assert(a.held, "a transient outage shorter than the lease must not lose it")
      assert(a.renew(), "the record must still be ours after the outage")
      // persistent: once the failure run spans >= leaseMs, the record is
      // expired for every other writer — the holder must stop pretending
      graft.LeaseFlakyFs.failing.set(true)
      val deadline = System.currentTimeMillis() + 8000
      while (a.held && System.currentTimeMillis() < deadline) Thread.sleep(100)
      assert(!a.held, "renewals failing for a full lease window must mark the lease LOST")
    } finally {
      graft.LeaseFlakyFs.failing.set(false)
      a.release()
    }
  }

  test("CommitLog wires the lease from conf: commits succeed with it on, and " +
    "a live foreign lease fails the commit loudly") {
    import graft.table.{Commit, CommitLog}
    val d = dir("lease-log")
    val conf = spark.sparkContext.hadoopConfiguration
    conf.setLong(LockLease.ConfKey, 5000L)
    try {
      val log = new CommitLog(s"$d/log")
      assert(log.commit(0L, s => Commit(s, 0L, "c0", 0L, 1)).isDefined)
      assert(log.commit(1L, s => Commit(s, 1L, "c1", 0L, 1)).isDefined)
      // a second, foreign writer holding the lease blocks a NEW log handle
      log.releaseLease()
      val foreign = new LockLease(s"$d/log", leaseMs = 5000, writerId = "other", settleMs = 10)
      assert(foreign.acquire(waitMs = 500))
      val log2 = new CommitLog(s"$d/log")
      val ex = intercept[IllegalStateException] {
        log2.commit(2L, s => Commit(s, 2L, "c2", 0L, 1))
      }
      assert(ex.getMessage.contains("lease"), ex.getMessage)
      foreign.release()
      assert(log2.commit(2L, s => Commit(s, 2L, "c2", 0L, 1)).isDefined)
      log2.releaseLease()
      assert(new CommitLog(s"$d/log").commits().map(_.batchId) === Seq(0L, 1L, 2L))
    } finally conf.unset(LockLease.ConfKey)
  }
}
