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
  case class SessionAcc(start: Long, lastTs: Long, nEvents: Long, sumValue: Double)
  case class SessionBuffer(sessions: Seq[SessionAcc])
  case class Session(user_id: Long, start_ts: Long, end_ts: Long,
                     n_events: Long, sum_value: Double)

  /** Gap-based sessionization via flatMapGroupsWithState. A session is
    * emitted ONLY once the watermark passes its gap deadline
    * (lastTs + gap ≤ watermark): any event that could still legally
    * arrive (ts ≥ watermark) is then too far away to extend it, so the
    * emitted session is genuinely complete. Gap-exceeding events open a
    * NEW accumulator but never force-emit the old one — a
    * late-but-within-watermark straggler may still belong to it (and
    * may even bridge two open accumulators, which the interval merge
    * below handles). Per-key state is the open accumulators only —
    * sized by active sessions, not history. */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 lateness: String = "0 seconds"): Dataset[Session] = {
    import events.sparkSession.implicits._

    // Sort accumulators and merge any whose gap-windows touch.
    def normalize(accs: Seq[SessionAcc]): Seq[SessionAcc] =
      accs.sortBy(a => (a.start, a.lastTs)).foldLeft(List.empty[SessionAcc]) {
        case (h :: t, a) if a.start - h.lastTs <= gapMs =>
          SessionAcc(h.start, math.max(h.lastTs, a.lastTs),
            h.nEvents + a.nEvents, h.sumValue + a.sumValue) :: t
        case (out, a) => a :: out
      }.reverse

    events
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionBuffer, Session](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (user: Long, rows: Iterator[Event], state: GroupState[SessionBuffer]) =>
          val existing = state.getOption.map(_.sessions).getOrElse(Seq.empty)
          val incoming = rows.map(e =>
            SessionAcc(e.ts.getTime, e.ts.getTime, 1, e.value)).toSeq
          val merged = normalize(existing ++ incoming)
          val wm = state.getCurrentWatermarkMs()
          // Closeable: no admissible future event (ts ≥ wm) can be
          // within gap of lastTs once lastTs + gap ≤ wm.
          val (closed, open) = merged.partition(_.lastTs + gapMs <= wm)
          if (open.isEmpty) state.remove()
          else {
            state.update(SessionBuffer(open))
            state.setTimeoutTimestamp(
              math.max(open.map(_.lastTs + gapMs).min, wm + 1))
          }
          closed.iterator.map(s =>
            Session(user, s.start, s.lastTs, s.nEvents, s.sumValue))
      }
  }
}
