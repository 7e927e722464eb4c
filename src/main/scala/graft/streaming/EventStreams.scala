package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** §2.9 extension — event-stream operators the reference's batch-only
  * design cannot express: watermarked windowed aggregation and
  * stateful sessionization. Input shape = the `events` table
  * (event_id, ts, user_id, event_type, value) as a stream.
  */
object EventStreams {

  /** Tumbling-window counts per event type with a watermark: late
    * events beyond `lateness` are dropped, state is bounded — the
    * incremental form of A1's batch group-count. */
  def windowedCounts(events: DataFrame, windowLen: String = "1 hour",
                     lateness: String = "30 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(window(col("ts"), windowLen), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum("value").as("sum_value"))
      .select(col("window.start").as("window_start"),
              col("event_type"), col("cnt"), col("sum_value"))

  /** Streaming exact dedup on a content fingerprint with bounded state:
    * duplicates arriving within the watermark horizon are dropped,
    * state for old fingerprints is reclaimed as the watermark advances
    * — the incremental form of the batch exact-dedup (d1) and the shape
    * a continuously-harvesting 100 TB pipeline runs (the reference's
    * batch re-snapshot, §2.9, replays everything instead). */
  def dedupByFingerprint(docs: DataFrame, tsCol: String, fpCol: String,
                         lateness: String = "1 hour"): DataFrame =
    docs
      .withWatermark(tsCol, lateness)
      .dropDuplicatesWithinWatermark(fpCol)

  case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
                   event_type: String, value: Double)
  case class SessionState(start: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  case class Session(user_id: Long, start_ts: Long, end_ts: Long,
                     n_events: Long, sum_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState: a session
    * closes after `gapMs` of event-time inactivity — either when a
    * later event for the key arrives past the gap, or when the
    * watermark passes the gap deadline (event-time timeout; a
    * processing-time timeout would keep the engine triggering empty
    * batches forever). Emitted once, complete. Per-key state lives in
    * the state store, sized by active keys, not history. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 lateness: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator(Session(user, s.start, s.lastTs, s.nEvents, s.sumValue))
          } else {
            val sorted = rows.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = scala.collection.mutable.ArrayBuffer.empty[Session]
            sorted.foreach { e =>
              val t = e.ts.getTime
              cur match {
                case Some(s) if t - s.lastTs <= gapMs =>
                  // A late-but-within-watermark event from an earlier
                  // micro-batch must never move the session window
                  // backward: lastTs only advances (and start only
                  // retreats), else the next on-time event can split
                  // the session spuriously.
                  cur = Some(SessionState(math.min(s.start, t),
                    math.max(s.lastTs, t), s.nEvents + 1,
                    s.sumValue + e.value))
                case Some(s) =>
                  closed += Session(user, s.start, s.lastTs, s.nEvents, s.sumValue)
                  cur = Some(SessionState(t, t, 1, e.value))
                case None =>
                  cur = Some(SessionState(t, t, 1, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              // Close when the watermark passes the gap deadline; the
              // max() guards the must-be-after-watermark contract.
              state.setTimeoutTimestamp(
                math.max(s.lastTs + gapMs,
                  state.getCurrentWatermarkMs() + 1))
            }
            closed.iterator
          }
      }
  }
}
