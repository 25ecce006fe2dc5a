package graft.fs

/** Escalating alarm shared by every post-success cleanup/sweep guard
  * (index retirements, the writer's staging cleanup, the commit log's
  * post-claim checkpoint, in-stream maintenance).
  *
  * Those guards deliberately swallow NonFatal — a failed delete of
  * already-superseded garbage must not unwind a landed publish — but a
  * PERSISTENTLY failing sweep (auth regression, wrong ACL on the
  * warehouse) would otherwise degrade to an even WARN stream while
  * garbage accumulates forever. This tracks consecutive failures per
  * site (site strings carry the table/index dir, so distinct tables
  * alarm independently) and escalates WARN → ERROR with an operator
  * hint once the same sweep has failed [[EscalateAfter]] times in a
  * row; one success clears the site.
  */
private[graft] object SweepAlarm {

  /** Consecutive failures of one site before WARN escalates to ERROR.
    * 3 = transient FS hiccups (which clear on the next sweep) never
    * page anyone, while a stuck sweep is loud within three publishes.
    */
  val EscalateAfter = 3

  private val fails = new java.util.concurrent.ConcurrentHashMap[
    String, java.util.concurrent.atomic.AtomicLong]()

  private lazy val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Record a failure of `site`. `standsMsg` states what outcome stands
    * and who re-attempts the reclaim (the guard's existing WARN text).
    * Returns the consecutive-failure count for the site.
    */
  def failed(site: String, e: Throwable, standsMsg: String): Long = {
    val n = fails
      .computeIfAbsent(site, _ => new java.util.concurrent.atomic.AtomicLong)
      .incrementAndGet()
    if (n < EscalateAfter)
      log.warn(s"$site failed (${e.getMessage}) — $standsMsg")
    else
      log.error(s"$site has failed $n consecutive times (latest: " +
        s"${e.getMessage}) — $standsMsg, but repeated failure means NOTHING " +
        "is being reclaimed there: check filesystem permissions/ACLs for " +
        "the deleting principal and see OPERATIONS.md (stuck sweeps); " +
        "garbage accumulates until the sweep succeeds")
    n
  }

  /** One success clears the site (the entry is removed, so only
    * actively-failing sites occupy memory — site keys carry per-table
    * dirs and a long-lived driver touches many).
    */
  def succeeded(site: String): Unit = {
    fails.remove(site)
    ()
  }

  /** Run a post-success cleanup/sweep under the alarm: success clears
    * the site, a NonFatal failure records it (and is SWALLOWED — the
    * published outcome the guard protects always stands). The one shared
    * shape of every guard site, so a site's success and failure keys can
    * never drift apart (a one-character drift would accumulate failures
    * on one key while successes cleared another). Asymmetric sites — a
    * body that absorbs part of its own failure internally, like the
    * commit log's checkpoint — call [[failed]]/[[succeeded]] directly.
    */
  def guarded(site: String, standsMsg: => String)(body: => Unit): Unit =
    try { body; succeeded(site) }
    catch {
      case scala.util.control.NonFatal(e) =>
        failed(site, e, standsMsg)
        ()
    }

  private[graft] def consecutive(site: String): Long =
    Option(fails.get(site)).map(_.get()).getOrElse(0L)

  private[graft] def resetForTest(): Unit = fails.clear()
}
