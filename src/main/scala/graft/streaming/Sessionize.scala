package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Stateful streaming sessionization via `flatMapGroupsWithState` — the
  * custom-state operator a training-data event pipeline needs (the
  * reference has no session logic, SURVEY.md ST3; the batch twin with
  * identical gap semantics is `q_events_sessions`).
  *
  * State per user: last-seen event time and running session/event
  * counters. A new session opens when the gap to the previous event
  * exceeds `gapMinutes`. Events inside one micro-batch are sorted by
  * event time in the state function (Spark does not order the values
  * iterator); across batches ordering holds as long as upstream
  * delivers per-key batches in order (true for the reference's
  * single-partition-per-key Kafka topics).
  */
object Sessionize {

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(lastUs: Long, sessions: Long, events: Long)
  case class UserSessions(user_id: Long, session_cnt: Long, event_cnt: Long)

  def sessionize(events: DataFrame, gapMinutes: Int): Dataset[UserSessions] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    events
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Ev]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSessions](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        case (user, evs, state: GroupState[SessionState]) =>
          val sorted = evs.toSeq.sortBy(e => (e.ts_us, e.value))
          var st = state.getOption.getOrElse(SessionState(Long.MinValue, 0L, 0L))
          sorted.foreach { e =>
            val newSession = st.lastUs == Long.MinValue || e.ts_us - st.lastUs > gapUs
            st = SessionState(e.ts_us,
              st.sessions + (if (newSession) 1 else 0), st.events + 1)
          }
          state.update(st)
          Iterator.single(UserSessions(user, st.sessions, st.events))
      }
  }

  case class EvT(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class OpenSession(startUs: Long, lastUs: Long, events: Long)
  case class ClosedSession(user_id: Long, start_us: Long, end_us: Long, event_cnt: Long)

  /** CLOSED-session emission with an event-time timeout: a session is
    * emitted either when a later event of the same user arrives past the
    * gap, or — the part only a timeout can do — when the WATERMARK
    * passes lastEvent + gap with no successor, so tail sessions don't
    * hang open forever. Append-mode output: each session exactly once,
    * immutable once emitted — the shape downstream training-data
    * consumers (joins, feature builds) can consume incrementally.
    *
    * State per user is one OpenSession (two longs + a count) regardless
    * of event volume; timeout bookkeeping is Spark's, so state size and
    * emission latency are both O(active users) — the 100 TB shape.
    */
  def closedSessions(events: DataFrame, gapMinutes: Int): Dataset[ClosedSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapUs = gapMinutes.toLong * 60 * 1000 * 1000
    def micros(t: java.sql.Timestamp): Long =
      t.toInstant.getEpochSecond * 1000000L + t.toInstant.getNano / 1000L
    events
      .select(col("user_id"), col("ts"), col("value")).as[EvT]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSession, ClosedSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case (user, _, state: GroupState[OpenSession]) if state.hasTimedOut =>
          val st = state.get
          state.remove()
          Iterator.single(ClosedSession(user, st.startUs, st.lastUs, st.events))
        case (user, evs, state: GroupState[OpenSession]) =>
          val sorted = evs.map(e => micros(e.ts)).toSeq.sorted
          var closed = List.empty[ClosedSession]
          var st = state.getOption
          sorted.foreach { us =>
            st = st match {
              case Some(s) if us - s.lastUs > gapUs =>
                closed ::= ClosedSession(user, s.startUs, s.lastUs, s.events)
                Some(OpenSession(us, us, 1L))
              case Some(s) =>
                Some(s.copy(lastUs = math.max(s.lastUs, us), events = s.events + 1))
              case None => Some(OpenSession(us, us, 1L))
            }
          }
          state.update(st.get)
          // Close the open session when the watermark clears last + gap.
          state.setTimeoutTimestamp(st.get.lastUs / 1000L + gapMinutes.toLong * 60 * 1000)
          closed.reverseIterator
      }
  }

  /** Tumbling-window per-type counts with a watermark (ST3 extension:
    * the reference has no event-time windows; this is the canonical
    * Structured Streaming shape for its hourly dashboards).
    */
  def windowedCounts(events: DataFrame, watermark: String, window_ : String): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), window_), col("event_type"))
      .agg(count(lit(1)).as("event_cnt"),
        sum(col("value").cast("decimal(18,2)")).cast("double").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("event_cnt"), col("total_value"))
}
