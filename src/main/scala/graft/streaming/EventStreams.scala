package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/**
 * Structured Streaming operators over the `events` shape
 * (event_id, ts timestamp, user_id, event_type, value).
 *
 * The reference engine is batch-only (SURVEY.md §2.10); this module is the
 * forward-looking streaming surface of the Spark engine. Every transform is
 * written against an unbounded Dataset and works identically on a bounded
 * one — the batch queries st01/st02 in [[graft.queries.Queries]] are the
 * bounded mirrors used by the DuckDB oracle.
 */
object EventStreams {

  /**
   * Tumbling 1-hour window counts with a watermark: state for a window is
   * dropped once the watermark passes its end — bounded state at any scale.
   */
  def tumblingCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value_r"))
      .select(col("w.start").as("win_start"), col("event_type"), col("cnt"),
        col("sum_value_r"))

  /**
   * Streaming exactly-once dedup: drop re-delivered events by id, keeping
   * state only within the watermark horizon (dropDuplicatesWithinWatermark)
   * — the unbounded-stream analog of the K2 batch dedup, with bounded state.
   */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  final case class SessionState(sessionStartMs: Long, lastEventMs: Long, nEvents: Long)

  final case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /**
   * Gap-based sessionization with explicit keyed state
   * (flatMapGroupsWithState + processing-time timeout): emits a session when
   * a gap larger than `gapMs` arrives, and closes idle sessions via the
   * state timeout — so per-user state is evicted once a user goes quiet and
   * total state stays bounded by *active* users, not all users ever seen.
   *
   * Batch mirror: st02_sessionize (lag + flag-sum).
   */
  def sessionize(events: Dataset[Event], gapMs: Long): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[SessionState]

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[SessionState]): Iterator[SessionOut] = {
      if (state.hasTimedOut) {
        // idle longer than the gap: emit the open session and evict state
        val s = state.get
        state.remove()
        return Iterator(SessionOut(userId, s.sessionStartMs, s.lastEventMs, s.nEvents))
      }
      val sorted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
      var cur = state.getOption
      val out = Seq.newBuilder[SessionOut]
      sorted.foreach { e =>
        val t = e.ts.getTime
        cur match {
          case Some(s) if t - s.lastEventMs <= gapMs =>
            cur = Some(s.copy(lastEventMs = t, nEvents = s.nEvents + 1))
          case Some(s) =>
            out += SessionOut(userId, s.sessionStartMs, s.lastEventMs, s.nEvents)
            cur = Some(SessionState(t, t, 1))
          case None =>
            cur = Some(SessionState(t, t, 1))
        }
      }
      cur.foreach { s =>
        state.update(s)
        state.setTimeoutDuration(gapMs) // no-op under batch execution
      }
      out.result().iterator
    }

    events.groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.ProcessingTimeTimeout)(update)
  }
}
