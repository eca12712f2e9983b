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
  * windowedCounts works batch or stream; sessionize is streaming-only
  * (its sessions emit on event-time timeouts). */
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
  final case class EventBuffer(events: Vector[(Long, Double)])
  final case class UserSession(user_id: Long, session_start: Timestamp,
                               session_end: Timestamp, n_events: Int,
                               total_value: Double)

  /** The sessionization kernel shared by the streaming and batch paths:
    * splits a user's (epochMs, value) events — sorted here — into
    * gap-separated sessions. One definition, so the batch gate
    * (`events_sessions`, DuckDB gaps-and-islands oracle) attests the same
    * splitting logic the streaming timeout handler runs. */
  private[streaming] def splitSessions(userId: Long,
                                       events: Seq[(Long, Double)],
                                       gapMs: Long): Vector[UserSession] = {
    val sorted = events.sortBy(_._1)
    val sessions = Vector.newBuilder[UserSession]
    var cur = Vector.empty[(Long, Double)]
    def close(): Unit = if (cur.nonEmpty)
      sessions += UserSession(userId, new Timestamp(cur.head._1),
        new Timestamp(cur.last._1), cur.size, cur.map(_._2).sum)
    sorted.foreach { e =>
      if (cur.nonEmpty && e._1 - cur.last._1 > gapMs) { close(); cur = Vector.empty }
      cur :+= e
    }
    close()
    sessions.result()
  }

  /** Batch sessionization: the same [[splitSessions]] kernel over complete
    * per-user groups (no state, no timeouts — in batch all events are
    * final, so a plain groupByKey suffices). Partitioning: one shuffle on
    * user_id; per-key memory is one user's history, the same bound a
    * gaps-and-islands window query would carry. Oracle-checked
    * (`events_sessions`); equality with the streaming path is spec-pinned. */
  def sessionizeBatch(events: Dataset[EventRow], gapMs: Long = 30 * 60 * 1000L)
  : Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroups { (userId: Long, rows: Iterator[EventRow]) =>
        splitSessions(userId, rows.map(e => (e.ts.getTime, e.value)).toVector,
          gapMs).iterator
      }
  }

  /** Per-user sessionization with an inactivity gap, STREAMING ONLY (batch
    * execution never fires timeouts, so trailing sessions would be lost —
    * callers must `writeStream`; batch callers use [[sessionizeBatch]]).
    * Events buffer in per-key state and are
    * sessionized ONLY when the event-time timeout fires at
    * maxBufferedTs+gap: by then the watermark guarantees no event can
    * arrive that is ≤ gap after any buffered event, so every emitted
    * session is final and out-of-order arrivals within the watermark can
    * never merge into the wrong session. State size is bounded by one
    * watermark window of events per key. Caller must set a watermark on
    * `ts` upstream. */
  def sessionize(events: Dataset[EventRow], gapMs: Long = 30 * 60 * 1000L)
  : Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[EventBuffer, UserSession](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[EventRow], state: GroupState[EventBuffer]) =>
          if (state.hasTimedOut) {
            val buffered = state.get.events
            state.remove()
            // split the (now-final) buffer into gap-separated sessions —
            // the same kernel the batch path runs
            splitSessions(userId, buffered, gapMs).iterator
          } else {
            val incoming = rows.map(e => (e.ts.getTime, e.value)).toVector
            val merged = state.getOption.map(_.events).getOrElse(Vector.empty) ++ incoming
            state.update(EventBuffer(merged))
            state.setTimeoutTimestamp(merged.map(_._1).max + gapMs)
            Iterator.empty
          }
      }
  }
}
