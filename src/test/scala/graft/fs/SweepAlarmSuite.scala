package graft.fs

import org.scalatest.funsuite.AnyFunSuite

import graft.TestSpark

/** r16: the escalating alarm on stuck sweeps. Post-success cleanup
  * guards swallow NonFatal by design; [[SweepAlarm]] makes a
  * PERSISTENTLY failing sweep loud — WARN below
  * [[SweepAlarm.EscalateAfter]] consecutive failures of one site, ERROR
  * with an operator hint at it, cleared by one success.
  */
class SweepAlarmSuite extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("consecutive failures escalate at the threshold; one success clears the site") {
    SweepAlarm.resetForTest()
    val e = new RuntimeException("injected")
    assert(SweepAlarm.failed("site-x", e, "outcome stands") === 1)
    assert(SweepAlarm.failed("site-x", e, "outcome stands") === 2)
    assert(SweepAlarm.consecutive("site-x") === 2)
    // independent sites do not cross-talk
    assert(SweepAlarm.failed("site-y", e, "outcome stands") === 1)
    assert(SweepAlarm.failed("site-x", e, "outcome stands") === SweepAlarm.EscalateAfter)
    SweepAlarm.succeeded("site-x")
    assert(SweepAlarm.consecutive("site-x") === 0)
    assert(SweepAlarm.failed("site-x", e, "outcome stands") === 1,
      "a success must reset the consecutive count")
    SweepAlarm.resetForTest()
  }

  test("a really stuck index retirement escalates through the wired guard (injection)") {
    import spark.implicits._
    SweepAlarm.resetForTest()
    spark.sparkContext.hadoopConfiguration
      .set("fs.idxfailx.impl", classOf[graft.IndexCleanupFailTestFs].getName)
    val dir = s"idxfailx:${TestSpark.freshDir("alarm-stuck")}"
    val docs = Seq((1L, "alpha beta gamma delta epsilon zeta")).toDF("doc_id", "text")
    val site = s"post-publish cleanup 'meta-pointer retirement at $dir'"
    // every publish's retirement sweep fails on this FS: the counter
    // climbs once per build and crosses the escalation threshold —
    // each build still SUCCEEDS (the guard's contract is unchanged)
    (1 to SweepAlarm.EscalateAfter).foreach { i =>
      graft.llm.LshIndex.build(docs, "doc_id", "text", dir, n = 3, numHashes = 32, bands = 16)
      assert(SweepAlarm.consecutive(site) === i.toLong,
        s"retirement failure $i must be tracked per site")
    }
    assert(SweepAlarm.consecutive(site) >= SweepAlarm.EscalateAfter,
      "the stuck sweep must have reached the ERROR escalation threshold")
    SweepAlarm.resetForTest()
  }
}
