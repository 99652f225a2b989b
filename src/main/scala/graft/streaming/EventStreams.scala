package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import java.sql.Timestamp

/** One event (mirrors the testdata `events` table). */
case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                 event_type: String, value: Double)

/** A closed user session produced by stateful processing. */
case class UserSession(user_id: Long, n_events: Long, total_value: Double,
                       first_ts: Timestamp, last_ts: Timestamp)

/** Event-time streaming operators beyond the reference's processing-time
  * loop: watermarked tumbling/sliding windows and custom session state via
  * `flatMapGroupsWithState` — the Structured Streaming capabilities the
  * comparator's aggregation layer would need at scale (late data, bounded
  * state).
  */
object EventStreams {

  /** Watermarked sliding-window aggregation over an event stream. */
  def windowedStats(events: DataFrame, window: String, slide: String,
                    watermark: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window, slide),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total_value"))
      .select(col("window.start").as("window_start"),
        col("window.end").as("window_end"), col("event_type"),
        col("n"), col("total_value"))

  /** Session close-out: a user's session ends after `gapMs` of EVENT-TIME
    * inactivity — the timeout fires when the watermark passes last_ts+gap,
    * so sessions close deterministically as data (not wall clock)
    * advances. Custom state via flatMapGroupsWithState (bounded per-user
    * state); the input must carry `withWatermark("ts", ...)`. */
  def sessionize(spark: SparkSession, events: Dataset[Event], gapMs: Long,
                 watermark: String = "10 seconds"): Dataset[UserSession] = {
    import spark.implicits._
    events.toDF().withWatermark("ts", watermark).as[Event]
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserSession, UserSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[UserSession]) =>
          if (state.hasTimedOut) {
            val done = state.get
            state.remove()
            Iterator.single(done)
          } else {
            // EventTimeTimeout never fires for a key that keeps receiving
            // data, so the inactivity contract must ALSO be enforced here:
            // sort the batch by event time and split — against the open
            // session's last_ts and between consecutive events — wherever
            // the gap exceeds gapMs (otherwise a backfill that delivers a
            // user's whole history in one micro-batch collapses every
            // burst into a single session).
            val evs = batch.toSeq.sortBy(_.ts.getTime)
            if (evs.isEmpty) Iterator.empty
            else {
              val closed = Seq.newBuilder[UserSession]
              var cur: Option[UserSession] = state.getOption
              evs.foreach { e =>
                cur match {
                  case Some(s) if e.ts.getTime - s.last_ts.getTime > gapMs =>
                    closed += s
                    cur = Some(UserSession(userId, 1L, e.value, e.ts, e.ts))
                  case Some(s) =>
                    // a LATE event (within the watermark) may sort before
                    // the open session's last activity — merge it without
                    // regressing last_ts, or a later event in the same
                    // batch would see a spurious gap and split a session
                    // that was never inactive
                    cur = Some(UserSession(userId, s.n_events + 1,
                      s.total_value + e.value,
                      new Timestamp(math.min(s.first_ts.getTime, e.ts.getTime)),
                      new Timestamp(math.max(s.last_ts.getTime, e.ts.getTime))))
                  case None =>
                    cur = Some(UserSession(userId, 1L, e.value, e.ts, e.ts))
                }
              }
              val open = cur.get
              state.update(open)
              state.setTimeoutTimestamp(open.last_ts.getTime + gapMs)
              closed.result().iterator
            }
          }
      }
  }
}
