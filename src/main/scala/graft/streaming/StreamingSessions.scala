package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming sessionization with CUSTOM state — the
  * `flatMapGroupsWithState` form of [[graft.analytics.Analytics.sessionize]]
  * (SURVEY.md §2.4 "streaming: stateful ops").
  *
  * Why not `session_window` here: the native operator emits only
  * windowed aggregates; custom state lets a session carry arbitrary
  * accumulators (event counts, first/last types, revenue so far) and emit
  * the finalized session exactly once, when the event-time watermark
  * passes its gap — the streaming analog of a gap-sessionizer with
  * bounded state (state per ACTIVE user only, dropped on timeout).
  *
  * Scale: state is partitioned by user_id (high cardinality, uniform);
  * per-key state is O(1) (a running aggregate, never the event list);
  * timeouts bound state size to users active within the watermark horizon.
  */
object StreamingSessions {

  /** One event in: (user, event time millis). */
  case class SessionEvent(user_id: Long, ts: Timestamp)

  /** Running per-user session accumulator (the custom state). */
  case class SessionState(startMs: Long, lastMs: Long, nEvents: Long)

  /** One finalized session out. */
  case class SessionOut(user_id: Long, session_start: Timestamp,
      session_end: Timestamp, n_events: Long)

  /** Sessionize an event stream: `events` needs user_id + a watermarked
    * `ts` column. Sessions close when no event arrives within `gapMs` of
    * the last one (by event time); closure is detected via event-time
    * timeout, so emission is exactly-once per session and state is dropped
    * eagerly. */
  def sessionize(events: DataFrame, gapMs: Long = 30L * 60 * 1000,
      watermarkDelay: String = "10 minutes"): Dataset[SessionOut] = {
    implicit val evEnc = Encoders.product[SessionEvent]
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stEnc = Encoders.product[SessionState]
    implicit val longEnc = Encoders.scalaLong
    val typed = events
      .select(col("user_id").cast("long").as("user_id"), col("ts").cast("timestamp").as("ts"))
      .withWatermark("ts", watermarkDelay)
      .as[SessionEvent]

    def update(userId: Long, rows: Iterator[SessionEvent],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      def out(s: SessionState): SessionOut =
        SessionOut(userId, new Timestamp(s.startMs), new Timestamp(s.lastMs), s.nEvents)
      if (state.hasTimedOut) {
        // watermark passed last+gap with no new event: the session is final
        val s = state.get
        state.remove()
        Iterator.single(out(s))
      } else {
        // fold this micro-batch's events (sorted — batches can be unordered)
        val sorted = rows.toArray.sortBy(_.ts.getTime)
        var closed = List.empty[SessionOut]
        var cur = state.getOption.orNull
        sorted.foreach { e =>
          val t = e.ts.getTime
          cur =
            if (cur == null) SessionState(t, t, 1)
            else if (t - cur.lastMs >= gapMs) { // strict-gap close, mirrors session_window
              closed ::= out(cur)
              SessionState(t, t, 1)
            } else SessionState(cur.startMs, math.max(cur.lastMs, t), cur.nEvents + 1)
        }
        state.update(cur)
        // wake up when the watermark passes the gap horizon of the last event
        state.setTimeoutTimestamp(cur.lastMs + gapMs)
        closed.reverseIterator
      }
    }

    typed
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update _)
  }
}
