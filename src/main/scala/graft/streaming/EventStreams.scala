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
            val evs = batch.toSeq
            if (evs.isEmpty) Iterator.empty
            else {
              val prev = state.getOption
              val byTime = Ordering.by((t: Timestamp) => t.getTime)
              val first = prev.map(_.first_ts).getOrElse(evs.map(_.ts).min(byTime))
              val last = evs.map(_.ts).max(byTime)
              val merged = UserSession(userId,
                prev.map(_.n_events).getOrElse(0L) + evs.size,
                prev.map(_.total_value).getOrElse(0.0) + evs.map(_.value).sum,
                first, last)
              state.update(merged)
              state.setTimeoutTimestamp(merged.last_ts.getTime + gapMs)
              Iterator.empty
            }
          }
      }
  }
}
