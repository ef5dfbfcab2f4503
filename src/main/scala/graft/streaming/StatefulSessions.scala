package graft.streaming

import org.apache.spark.sql.Dataset
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Custom stateful streaming (SURVEY §2.11 extension): arbitrary per-key
  * state via `flatMapGroupsWithState` — the hook Structured Streaming
  * provides for semantics the built-in windows can't express.
  *
  * The demonstrator is a gap-based sessionizer with a custom state record
  * and emission policy (emit only on close). `session_window` covers the
  * common case declaratively (q35); this operator is the escape hatch for
  * e.g. session payload accumulation, custom close predicates, or
  * value-dependent gaps. State is bounded: one open session per key, closed
  * by event-time timeout against the watermark — the pattern that holds at
  * 100 TB (state size = O(active keys), not O(events)).
  */
object StatefulSessions {

  case class Event(userId: Long, ts: java.sql.Timestamp, value: Double)

  /** Open-session state: timestamps in epoch millis (tungsten-friendly). */
  case class OpenSession(startMs: Long, endMs: Long, n: Long, sum: Double)

  case class ClosedSession(userId: Long, sessionStart: java.sql.Timestamp,
      sessionEnd: java.sql.Timestamp, nEvents: Long, sumValue: Double)

  private def close(userId: Long, s: OpenSession): ClosedSession =
    ClosedSession(userId, new java.sql.Timestamp(s.startMs),
      new java.sql.Timestamp(s.endMs), s.n, s.sum)

  /** Per-key session transition: merge the batch's events (sorted by event
    * time) into the open session, emitting every session that closes
    * because a gap exceeded `gapMs`; on event-time timeout, flush the open
    * session.
    */
  private[graft] def transition(gapMs: Long)(
      userId: Long, events: Iterator[Event],
      state: GroupState[OpenSession]): Iterator[ClosedSession] = {
    if (state.hasTimedOut) {
      val out = close(userId, state.get)
      state.remove()
      Iterator(out)
    } else {
      val sorted = events.toSeq.sortBy(_.ts.getTime)
      val closed = Seq.newBuilder[ClosedSession]
      var cur = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t < s.startMs - gapMs =>
            // stale straggler: more than a gap BEFORE the open session —
            // it can never merge (the gap invariant would break), and with
            // one-open-session-per-key state the only bounded-state choice
            // is to emit it as its own closed singleton session.
            closed += ClosedSession(userId, e.ts, e.ts, 1L, e.value)
          case Some(s) if t - s.endMs <= gapMs =>
            // min() on start: a late-but-in-watermark event may precede the
            // open session's start by up to gapMs and still merge; without
            // min() the emitted sessionStart would be wrong.
            cur = Some(OpenSession(math.min(s.startMs, t), math.max(s.endMs, t),
              s.n + 1, s.sum + e.value))
          case Some(s) =>
            closed += close(userId, s)
            cur = Some(OpenSession(t, t, 1L, e.value))
          case None =>
            cur = Some(OpenSession(t, t, 1L, e.value))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.result().iterator
    }
  }

  /** Sessionize an event stream: sessions close after `gapMinutes` of
    * per-user silence (measured in event time against the watermark).
    * Works on a streaming Dataset (append mode); the spec drives it through
    * MemoryStream.
    */
  def sessionize(events: Dataset[Event], gapMinutes: Int,
      latenessMinutes: Int = 0): Dataset[ClosedSession] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", s"$latenessMinutes minutes")
      .groupByKey(_.userId)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(
        transition(gapMinutes * 60000L))
  }
}
