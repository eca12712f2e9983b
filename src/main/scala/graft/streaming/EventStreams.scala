package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming operators over the `events` stream table
  * (event_id, ts, user_id, event_type, value, props): event-time windowed
  * aggregation with a watermark, and custom sessionization state via
  * flatMapGroupsWithState — the streaming shapes a training-data ingest
  * pipeline needs (late-data bounding, per-key state with timeout).
  * Both operate on any DataFrame with the events schema, batch or stream. */
object EventStreams {

  /** Tumbling event-time counts per event_type with a watermark bounding
    * late data; append-mode windows finalize once the watermark passes. */
  def windowedCounts(events: DataFrame, windowLength: String = "1 hour",
                     watermarkDelay: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowLength), col("event_type"))
      .agg(count(lit(1)).as("n"), sum("value").as("total_value"))
      .select(col("window.start").as("window_start"), col("event_type"),
        col("n"), col("total_value"))

  final case class EventRow(event_id: Long, ts: Timestamp, user_id: Long,
                            event_type: String, value: Double)
  final case class SessionState(firstTs: Long, lastTs: Long, n: Int,
                                totalValue: Double)
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Int,
                               total_value: Double)

  /** Per-user sessionization with an inactivity gap: events more than
    * `gapMs` apart start a new session. Sessions close (a) inline when a
    * later event of the same user arrives past the gap, or (b) via
    * EVENT-TIME timeout once the watermark passes lastTs+gap — the
    * KeyValueGroupedDataset + flatMapGroupsWithState shape: per-key bounded
    * state surviving across micro-batches, late data fenced by the
    * watermark. Caller must set a watermark on `ts` upstream. */
  def sessionize(events: Dataset[EventRow], gapMs: Long = 30 * 60 * 1000L)
  : Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSession(userId, new Timestamp(s.firstTs),
              new Timestamp(s.lastTs), s.n, s.totalValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var closed = Vector.empty[UserSession]
            var cur = state.getOption
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  cur = Some(SessionState(s.firstTs, math.max(s.lastTs, t),
                    s.n + 1, s.totalValue + e.value))
                case Some(s) =>
                  closed :+= UserSession(userId, new Timestamp(s.firstTs),
                    new Timestamp(s.lastTs), s.n, s.totalValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.lastTs + gapMs)
            }
            closed.iterator
          }
      }
  }
}
