package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming operator: gap-based sessionization via
  * `flatMapGroupsWithState` — the KeyValueGroupedDataset custom-state path
  * (SURVEY §2.5 "stateful op"); the Venice analog is the per-key merge state
  * a StoreIngestionTask keeps between records, generalized to user code.
  *
  * State per key = the open session; an event farther than `gapMs` from the
  * last one closes the session (emitted) and opens a new one. State size is
  * O(1) per key — safe at any key cardinality; Spark checkpoints it.
  */
object Sessionize {

  case class Evt(user_id: Long, ts_ms: Long, value: Double)
  case class OpenSession(start: Long, last: Long, n: Int, total: Double)
  case class Session(user_id: Long, session_start: Long, session_end: Long,
      n_events: Int, total_value: Double)

  /** `idleTimeoutMs > 0` arms a processing-time timeout per key: a session
    * whose user goes quiet is flushed once the wall clock passes the
    * timeout, instead of sitting in state forever (an idle key would
    * otherwise never emit — there is no later event to close it). 0 keeps
    * the data-driven-only behavior (useful for deterministic tests). */
  def sessionize(ds: Dataset[Evt], gapMs: Long,
      idleTimeoutMs: Long = 0L): Dataset[Session] = {
    implicit val stateEnc = Encoders.product[OpenSession]
    implicit val outEnc = Encoders.product[Session]
    val timeout = if (idleTimeoutMs > 0) GroupStateTimeout.ProcessingTimeTimeout
      else GroupStateTimeout.NoTimeout
    ds.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        timeout)(process(gapMs, idleTimeoutMs))
  }

  private def process(gapMs: Long, idleTimeoutMs: Long)(userId: Long,
      events: Iterator[Evt],
      state: GroupState[OpenSession]): Iterator[Session] = {
    if (state.hasTimedOut) {
      // idle flush: close and emit the open session, clear state
      val s = state.get
      state.remove()
      return Iterator(Session(userId, s.start, s.last, s.n, s.total))
    }
    val sorted = events.toSeq.sortBy(e => (e.ts_ms, e.value))
    var open = state.getOption
    val closed = Seq.newBuilder[Session]
    sorted.foreach { e =>
      open match {
        case Some(s) if e.ts_ms - s.last <= gapMs =>
          open = Some(s.copy(last = e.ts_ms, n = s.n + 1, total = s.total + e.value))
        case Some(s) =>
          closed += Session(userId, s.start, s.last, s.n, s.total)
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
        case None =>
          open = Some(OpenSession(e.ts_ms, e.ts_ms, 1, e.value))
      }
    }
    open.foreach { s =>
      state.update(s)
      if (idleTimeoutMs > 0) state.setTimeoutDuration(idleTimeoutMs)
    }
    closed.result().iterator
  }
}
