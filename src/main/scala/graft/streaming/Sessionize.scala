package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Per-session state carried across micro-batches. */
final case class SessionState(sid: Long, start: Long, last: Long, n: Long)

/** A closed session (same shape as the batch operator's output rows). */
final case class Session(user_id: Long, session_id: Long, start_us: Long, end_us: Long, events: Long)

/** Streaming sessionization via `flatMapGroupsWithState` — the custom-
  * state surface of Structured Streaming. Each micro-batch folds its
  * (key, ts) events into per-key state using the same >gap split rule as
  * the batch operator ([[graft.operators.Sessionize]]); a session is
  * EMITTED when a later event closes it (the still-open session stays in
  * state for the next batch).
  *
  * Two streaming-only rules keep state sane at scale:
  *  - **Idle flush**: a key silent for `idleTimeoutMs` of processing time
  *    has its open session emitted and its state reduced to a counter-only
  *    tombstone (the session_id counter survives so (key, session_id)
  *    stays unique over the stream's lifetime) — without the flush,
  *    one-off keys (a long-tail of single-visit users) hold full session
  *    state forever and the final session of every key is never emitted.
  *  - **Late-event clamp**: each batch sorts its own events, but an event
  *    arriving in a LATER batch with an older timestamp than the open
  *    session's `last` merges into that session (count only, `last`
  *    never moves backwards). A backward-moving `last` would emit
  *    sessions with end < start and mis-split on the next gap check.
  *    (The batch operator sorts globally and has neither concern.)
  */
object Sessionize {

  def update(gapUs: Long, idleTimeoutMs: Long)(
      user: Long,
      it: Iterator[(Long, Long)],
      state: GroupState[SessionState]
  ): Iterator[Session] = {
    if (state.hasTimedOut) {
      // idle key: flush the open session. The state is REDUCED to a
      // counter-only tombstone (n = 0), never removed outright — removal
      // would restart session_id at 0 when the key returns, re-emitting
      // (user_id, session_id) pairs downstream consumers key on. The
      // tombstone is ~32 bytes per ever-seen key and registers no further
      // timeout; deployments that must bound state by key cardinality
      // key their sink on (user_id, session_id, start_us) instead.
      val open = state.getOption.filter(_.n > 0)
      val out = open.map(st => Session(user, st.sid, st.start, st.last, st.n)).iterator
      open match {
        case Some(st) => state.update(SessionState(st.sid + 1L, 0L, 0L, 0L))
        case None     => state.remove()
      }
      return out
    }
    val ts = it.map(_._2).toArray.sorted
    if (ts.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.Buffer[Session]()
    var st = state.getOption.getOrElse(SessionState(0L, ts.head, ts.head, 0L))
    ts.foreach { t =>
      if (st.n == 0L) st = SessionState(st.sid, t, t, 1L)
      else if (t <= st.last) st = st.copy(n = st.n + 1L) // late arrival: merge, never move back
      else if (t - st.last > gapUs) {
        out += Session(user, st.sid, st.start, st.last, st.n)
        st = SessionState(st.sid + 1L, t, t, 1L)
      } else st = st.copy(last = t, n = st.n + 1L)
    }
    state.update(st)
    if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
    out.iterator
  }

  /** `ds` = (key, event-time micros). Emits sessions as they close, plus
    * an idle flush per key after `idleTimeoutMs` without events
    * (processing time).
    *
    * The idle flush is OPT-IN (`idleTimeoutMs = 0` default = no timeout):
    * registering a processing-time timeout makes the engine run no-data
    * batches to fire expirations, and an UNTRIGGERED query busy-loops
    * those batches (silent CPU spin, and `processAllAvailable()` never
    * returns). A long-running production query should pass a non-zero
    * timeout (e.g. `gapUs / 1000`) AND pair it with a trigger interval
    * (`Trigger.ProcessingTime`) — without the flush, one-off keys
    * accumulate state forever and each key's final session is never
    * emitted.
    */
  def stream(
      ds: Dataset[(Long, Long)],
      gapUs: Long = graft.operators.Sessionize.DefaultGapUs,
      idleTimeoutMs: Long = 0L
  ): Dataset[Session] = {
    import ds.sparkSession.implicits._
    val timeoutConf =
      if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), timeoutConf)(update(gapUs, idleTimeoutMs))
  }
}
