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

  /**
   * Streaming near-duplicate dedup: keep the first document per content
   * fingerprint (min shingle hash — [[graft.llm.TextOps.docFingerprint]])
   * within the watermark horizon. Fingerprint equality catches exact and
   * near-identical re-crawls cheaply with bounded state; it is the
   * streaming complement of the batch MinHash-LSH path (which needs the
   * full corpus for banding + exact verification). Input needs (ts, text).
   */
  def dedupNearStream(docs: DataFrame, watermark: String = "1 hour",
                      w: Int = 5): DataFrame =
    docs.withColumn("fingerprint", graft.llm.TextOps.docFingerprint(col("text"), w))
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Pending per-user events within the watermark horizon: (event_id, ts
    * millis) pairs. Keyed by event_id so re-delivered events are idempotent. */
  final case class PendingEvents(events: Seq[(Long, Long)])

  final case class SessionOut(user_id: Long, session_start_ms: Long,
      session_end_ms: Long, n_events: Long)

  /**
   * Gap-based event-time sessionization with explicit keyed state
   * (flatMapGroupsWithState + EVENT-time timeout).
   *
   * Semantics are a pure function of the event content: pending events are
   * buffered in state (deduplicated by event_id, so replays are idempotent),
   * and a session is emitted only once the event-time watermark passes its
   * `last event + gap` horizon — at that point no in-flight event can reopen
   * it, so late/out-of-order/re-delivered arrivals within the watermark
   * produce IDENTICAL sessions regardless of batch chunking. The r2 form
   * used ProcessingTimeTimeout, which keyed eviction on wall clock and made
   * replayed streams close sessions nondeterministically.
   *
   * State is bounded: per user, only events newer than the watermark-gap
   * horizon are retained (emitted sessions are dropped), and the state
   * timeout evicts idle users entirely.
   *
   * Batch execution (no watermark): all events of a user arrive in one
   * invocation; every gap-closed session is emitted and the final
   * still-open session is not — the bounded-run streaming contract.
   * Batch mirror: st02_sessionize (lag + flag-sum).
   */
  def sessionize(events: Dataset[Event], gapMs: Long,
                 watermark: String = "1 hour"): Dataset[SessionOut] = {
    implicit val outEnc = Encoders.product[SessionOut]
    implicit val stateEnc = Encoders.product[PendingEvents]

    // split ordered (id, ts) pairs into gap-delimited sessions
    def split(evs: Seq[(Long, Long)]): Seq[Seq[(Long, Long)]] = {
      val out = Seq.newBuilder[Seq[(Long, Long)]]
      var cur = Seq.newBuilder[(Long, Long)]
      var last = Long.MinValue
      evs.foreach { case e @ (_, t) =>
        if (last != Long.MinValue && t - last > gapMs) {
          out += cur.result()
          cur = Seq.newBuilder[(Long, Long)]
        }
        cur += e
        last = t
      }
      val tail = cur.result()
      if (tail.nonEmpty) out += tail
      out.result()
    }

    def toOut(userId: Long, s: Seq[(Long, Long)]): SessionOut =
      SessionOut(userId, s.head._2, s.last._2, s.length.toLong)

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[PendingEvents]): Iterator[SessionOut] = {
      val incoming = rows.map(e => (e.event_id, e.ts.getTime)).toSeq
      val known = state.getOption.map(_.events).getOrElse(Seq.empty)
      val all = (known ++ incoming).distinctBy(_._1)
        .sortBy { case (id, t) => (t, id) }
      // batch execution has no watermark: getCurrentWatermarkMs throws
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => -1L }
      val sessions = split(all)
      val (closed, open) =
        if (wm >= 0L) sessions.partition(s => s.last._2 + gapMs <= wm)
        else (sessions.dropRight(1), sessions.takeRight(1)) // bounded input
      if (wm >= 0L) {
        val pending = open.flatten
        if (pending.nonEmpty) {
          state.update(PendingEvents(pending))
          // earliest possible close of any retained session; clamped above
          // the watermark as setTimeoutTimestamp requires
          state.setTimeoutTimestamp(
            math.max(open.map(_.last._2).min + gapMs, wm + 1))
        } else state.remove()
      }
      closed.map(toOut(userId, _)).iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }
}
