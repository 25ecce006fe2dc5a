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
  */
object Sessionize {

  def update(gapUs: Long)(
      user: Long,
      it: Iterator[(Long, Long)],
      state: GroupState[SessionState]
  ): Iterator[Session] = {
    val ts = it.map(_._2).toArray.sorted
    if (ts.isEmpty) return Iterator.empty
    val out = scala.collection.mutable.Buffer[Session]()
    var st = state.getOption.getOrElse(SessionState(0L, ts.head, ts.head, 0L))
    ts.foreach { t =>
      if (st.n == 0L) st = SessionState(st.sid, t, t, 1L)
      else if (t - st.last > gapUs) {
        out += Session(user, st.sid, st.start, st.last, st.n)
        st = SessionState(st.sid + 1L, t, t, 1L)
      } else st = st.copy(last = t, n = st.n + 1L)
    }
    state.update(st)
    out.iterator
  }

  /** `ds` = (key, event-time micros). Emits sessions as they close. */
  def stream(
      ds: Dataset[(Long, Long)],
      gapUs: Long = graft.operators.Sessionize.DefaultGapUs
  ): Dataset[Session] = {
    import ds.sparkSession.implicits._
    ds.groupByKey(_._1)
      .flatMapGroupsWithState(OutputMode.Append(), GroupStateTimeout.NoTimeout)(update(gapUs))
  }
}
