package graft

import graft.streaming.StatefulSessions
import graft.streaming.StatefulSessions.{ClosedSession, Event}

/** flatMapGroupsWithState sessionizer: custom state transitions, gap-based
  * close within a batch, event-time-timeout close across batches, bounded
  * state (open session removed after timeout).
  */
class StatefulSessionSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String) = java.sql.Timestamp.valueOf(s)

  test("gap split within a batch + timeout flush across batches") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[Event]
    // batch 1: user 1 has two sessions (gap > 30m splits them in-batch);
    // the second stays open
    mem.addData(
      Event(1L, ts("2024-01-01 00:00:00"), 1.0),
      Event(1L, ts("2024-01-01 00:10:00"), 2.0),  // same session
      Event(1L, ts("2024-01-01 01:00:00"), 4.0))  // new session (gap 50m)
    // batch 2: far-future event advances the watermark past 01:00+30m,
    // timing out user 1's open session
    mem.addData(Event(2L, ts("2024-01-01 06:00:00"), 8.0))
    // batch 3: push watermark past 06:00+30m so user 2's session also closes
    mem.addData(Event(3L, ts("2024-01-02 00:00:00"), 0.0))

    val out = StatefulSessions.sessionize(mem.toDS(), gapMinutes = 30)
    val q = out.writeStream.outputMode("append")
      .format("memory").queryName("stateful_sessions")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()

    val rows = spark.table("stateful_sessions").as[ClosedSession]
      .collect().sortBy(r => (r.userId, r.sessionStart.getTime))
    val u1 = rows.filter(_.userId == 1L)
    assert(u1.length == 2)
    assert(u1(0).nEvents == 2 && u1(0).sumValue == 3.0 &&
      u1(0).sessionStart == ts("2024-01-01 00:00:00") &&
      u1(0).sessionEnd == ts("2024-01-01 00:10:00"))
    assert(u1(1).nEvents == 1 && u1(1).sumValue == 4.0)
    val u2 = rows.filter(_.userId == 2L)
    assert(u2.length == 1 && u2(0).nEvents == 1 && u2(0).sumValue == 8.0)
  }

  test("streaming dedup within watermark: re-delivered events drop, state stays bounded") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    import org.apache.spark.sql.streaming.Trigger
    implicit val sqlCtx = spark.sqlContext
    val mem = MemoryStream[(Long, java.sql.Timestamp)]
    mem.addData((1L, ts("2024-01-01 00:00:00")), (2L, ts("2024-01-01 00:01:00")))
    // batch 2 re-delivers event 1 (at-least-once overlap) + a new event
    mem.addData((1L, ts("2024-01-01 00:00:00")), (3L, ts("2024-01-01 00:02:00")))
    val stream = mem.toDF().toDF("event_id", "ts")
      .withWatermark("ts", "10 minutes")
      .dropDuplicatesWithinWatermark("event_id")
    val q = stream.writeStream.outputMode("append")
      .format("memory").queryName("dedup_stream")
      .trigger(Trigger.AvailableNow()).start()
    q.awaitTermination()
    val ids = spark.table("dedup_stream").select("event_id")
      .as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L)) // each event exactly once
  }

  test("transition function: late-but-in-watermark event extends session start backward") {
    // state restored from a previous batch holds an open session [01:00,01:00];
    // a late event at 00:50 (within gap) must LOWER sessionStart, not only
    // extend the end.
    val state = new TestGroupState[StatefulSessions.OpenSession]
    state.update(StatefulSessions.OpenSession(
      ts("2024-01-01 01:00:00").getTime, ts("2024-01-01 01:00:00").getTime, 1L, 4.0))
    val out = StatefulSessions.transition(30 * 60000L)(
      1L, Iterator(Event(1L, ts("2024-01-01 00:50:00"), 1.0)), state).toSeq
    assert(out.isEmpty) // merged, nothing closed
    val s = state.updated.get
    assert(s.startMs == ts("2024-01-01 00:50:00").getTime)
    assert(s.endMs == ts("2024-01-01 01:00:00").getTime)
    assert(s.n == 2 && s.sum == 5.0)
  }

  test("transition function: straggler older than start-gap becomes its own closed session") {
    // open session [01:00, 01:00], gap 30m; an event at 00:10 is 50m before
    // the start — merging it would violate the gap invariant
    val state = new TestGroupState[StatefulSessions.OpenSession]
    state.update(StatefulSessions.OpenSession(
      ts("2024-01-01 01:00:00").getTime, ts("2024-01-01 01:00:00").getTime, 1L, 4.0))
    val out = StatefulSessions.transition(30 * 60000L)(
      1L, Iterator(Event(1L, ts("2024-01-01 00:10:00"), 2.0)), state).toSeq
    assert(out.length == 1)
    assert(out.head.sessionStart == ts("2024-01-01 00:10:00") &&
      out.head.sessionEnd == ts("2024-01-01 00:10:00") &&
      out.head.nEvents == 1 && out.head.sumValue == 2.0)
    // the open session is untouched
    assert(state.updated.exists(s =>
      s.startMs == ts("2024-01-01 01:00:00").getTime && s.n == 1))
  }

  test("transition function: in-batch merge order is event-time, not arrival") {
    // feed events out of order within one invocation; the transition sorts
    val state = new TestGroupState[StatefulSessions.OpenSession]
    val out = StatefulSessions.transition(30 * 60000L)(
      1L,
      Iterator(
        Event(1L, ts("2024-01-01 01:00:00"), 4.0), // arrives first, later ts
        Event(1L, ts("2024-01-01 00:00:00"), 1.0),
        Event(1L, ts("2024-01-01 00:10:00"), 2.0)),
      state).toSeq
    assert(out.length == 1) // first session closed by the 50m gap
    assert(out.head.nEvents == 2 && out.head.sumValue == 3.0)
    assert(state.updated.exists(s => s.n == 1 && s.sum == 4.0))
    assert(state.timeoutMs.contains(ts("2024-01-01 01:30:00").getTime))
  }
}

/** Minimal GroupState stub for unit-testing transition functions without a
  * streaming query.
  */
class TestGroupState[S] extends org.apache.spark.sql.streaming.GroupState[S] {
  var updated: Option[S] = None
  var timeoutMs: Option[Long] = None
  private var removed = false
  override def exists: Boolean = updated.nonEmpty && !removed
  override def get: S = updated.get
  override def getOption: Option[S] = if (removed) None else updated
  override def update(newState: S): Unit = { updated = Some(newState); removed = false }
  override def remove(): Unit = { removed = true; updated = None }
  override def hasTimedOut: Boolean = false
  override def setTimeoutDuration(durationMs: Long): Unit = ()
  override def setTimeoutDuration(duration: String): Unit = ()
  override def setTimeoutTimestamp(timestampMs: Long): Unit = { timeoutMs = Some(timestampMs) }
  override def setTimeoutTimestamp(timestampMs: Long, additionalDuration: String): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date): Unit = ()
  override def setTimeoutTimestamp(timestamp: java.sql.Date, additionalDuration: String): Unit = ()
  override def getCurrentWatermarkMs(): Long = 0L
  override def getCurrentProcessingTimeMs(): Long = 0L
}
