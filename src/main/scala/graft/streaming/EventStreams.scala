package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Dataset, Encoders}
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
   * Tumbling-window EXACT distinct users through the mergeable
   * [[graft.functions.BitmapDistinct]] aggregate — the streaming shape
   * HLL is usually swapped in for, kept exact: window state is one
   * roaring-style bitmap per (window, event_type) instead of the
   * per-(window, user) row the `count(distinct)` rewrite would need
   * (distinct-expansion is unsupported in streaming aggregation anyway),
   * and watermark expiry drops each window's bitmaps with it — bounded
   * state at any scale. Same call runs batch and streaming (st11's
   * oracle is plain count(DISTINCT) over the batch mirror).
   */
  def windowedDistinctUsers(events: DataFrame,
                            watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(graft.functions.VectorAggregates.bitmapDistinct(col("user_id"))
          .as("n_users"),
        count(lit(1)).as("n_events"))
      .select(col("w.start").as("win_start"), col("event_type"),
        col("n_users"), col("n_events"))

  /**
   * Per-user session aggregation through Spark's NATIVE session_window —
   * the declarative complement to the custom flatMapGroupsWithState
   * sessionizer ([[sessionize]]): gap-merged event-time windows
   * [first_event, last_event + gap) maintained by the engine's built-in
   * session state (merging on watermark advance), no user state code. The
   * same call runs batch (watermark is a no-op) and streaming; a new
   * session starts exactly when the gap to the previous event is >= `gap`
   * (window ends are exclusive).
   */
  def sessionWindowCounts(events: DataFrame, gap: String = "30 minutes",
                          watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"), round(sum(col("value")), 2).as("sum_value_r"))
      .select(col("user_id"), col("sw.start").as("s_start"), col("sw.end").as("s_end"),
        col("n_events"), col("sum_value_r"))

  /**
   * Stream-static enrichment join: each micro-batch of the event stream
   * joins a STATIC dimension frame (user -> market segment). The static
   * side never enters streaming state — Spark re-plans it per batch as a
   * broadcast hash join, so the stream is never shuffled for the lookup
   * and dimension updates between batches are picked up for free. The
   * LEFT join keeps events with no dimension row (explicit '(none)'
   * segment): an enrichment gap must never silently drop stream rows.
   * Downstream, the usual watermark-bounded tumbling aggregation — the
   * join adds zero state to it.
   */
  def enrichedTumblingCounts(events: DataFrame, dim: DataFrame,
                             watermark: String = "2 hours"): DataFrame =
    events.withWatermark("ts", watermark)
      .join(broadcast(dim), events("user_id") === dim("c_custkey"), "left")
      .withColumn("segment", coalesce(col("c_mktsegment"), lit("(none)")))
      .groupBy(window(col("ts"), "1 hour").as("w"), col("segment"))
      .agg(count(lit(1)).as("cnt"), round(sum(col("value")), 2).as("sum_value_r"))
      .select(col("w.start").as("win_start"), col("segment"), col("cnt"),
        col("sum_value_r"))

  /**
   * Composed streaming corpus ingest — the streaming form of the batch
   * admission chain (quality gate -> canonical-fingerprint dedup -> admit):
   * documents arrive as a stream, a stateless word-count gate drops
   * low-quality rows map-side, and `dropDuplicatesWithinWatermark` admits
   * the FIRST doc per 5-word-prefix fingerprint, holding one 16-byte key
   * per admitted doc inside the watermark horizon — the only state in the
   * pipeline. At 100 TB/day this is the kafka->corpus front door: the
   * gate never shuffles, dedup shuffles fingerprints only.
   */
  def ingestStream(docs: DataFrame, minWords: Int = 30,
                   watermark: String = "1 hour"): DataFrame =
    docs.withWatermark("ts", watermark)
      .filter(size(split(col("text"), " ")) >= minWords)
      .withColumn("__fp", md5(array_join(slice(split(col("text"), " "), 1, 5), " ")))
      .dropDuplicatesWithinWatermark("__fp")
      .select(col("doc_id"), col("lang"), col("ts"))

  /**
   * Streaming windowed top-k: the k highest-value events per (1-hour
   * window, event_type) through the native bounded-heap
   * [[graft.functions.TopK]] aggregate. A TypedImperativeAggregate's
   * partial-merge contract is exactly what streaming state updates need:
   * per-(window, type) state is k (value, id) pairs — never the events
   * themselves — and the watermark drops a window's heap once it closes.
   */
  def windowedTopK(events: DataFrame, k: Int = 3,
                   watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(graft.functions.VectorAggregates
        .topK(col("value"), col("event_id"), k).as("top"))
      .select(col("w.start").as("win_start"), col("event_type"),
        posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("win_start"), col("event_type"),
        (col("rnk0") + 1).cast("long").as("rnk"),
        col("t.id").as("event_id"), round(col("t.ord"), 2).as("value_r"))

  /**
   * Session-window top-k — "trending events per user session": the
   * bounded-heap [[graft.functions.TopK]] aggregate as NATIVE
   * session-window state, composing [[sessionWindowCounts]] (engine-managed
   * gap-merged windows) with [[windowedTopK]] (k-pair heap state). The
   * TypedImperativeAggregate's partial-merge contract is what session
   * merging needs: when the engine merges two gap-adjacent session windows
   * it merges their heaps — k (value, id) pairs per open session, never
   * the events — and the watermark closes sessions and drops their state.
   * Same call runs batch and streaming (stream == batch with tie/eviction
   * fixtures proven in StreamingSpec).
   */
  def sessionTopK(events: DataFrame, k: Int = 3, gap: String = "30 minutes",
                  watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(graft.functions.VectorAggregates
        .topK(col("value"), col("event_id"), k).as("top"))
      .select(col("user_id"), col("sw.start").as("s_start"),
        col("sw.end").as("s_end"), posexplode(col("top")).as(Seq("rnk0", "t")))
      .select(col("user_id"), col("s_start"), col("s_end"),
        (col("rnk0") + 1).cast("long").as("rnk"),
        col("t.id").as("event_id"), round(col("t.ord"), 2).as("value_r"))

  /**
   * Streaming exactly-once dedup: drop re-delivered events by id, keeping
   * state only within the watermark horizon (dropDuplicatesWithinWatermark)
   * — the unbounded-stream analog of the K2 batch dedup, with bounded state.
   * Batch mirror: st18_dedup_redelivery (re-delivered copies are exact, so
   * any-survivor == first-survivor and the mirror is deterministic).
   */
  def dedupEvents(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events.withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** [[dedupNearStream]]'s fingerprint fallback chain (xxhash64 domain).
    * The chain keeps dropDuplicates' null-grouping from silently collapsing
    * unrelated docs: short docs (null min-shingle-hash) dedup by exact
    * content hash, and null-text rows (where xxhash64 degenerates to its
    * seed, NOT null) dedup by their id — each fallback domain is salted so
    * the classes cannot collide. */
  def nearDupFingerprint(text: Column, id: Column, w: Int = 5): Column =
    when(text.isNull, xxhash64(lit("graft:null-text"), id))
      .otherwise(coalesce(graft.llm.TextOps.docFingerprint(text, w),
        xxhash64(lit("graft:short-text"), text)))

  /** The SAME fallback chain in the md5/string domain — semantically the
    * chain of [[nearDupFingerprint]] (null-text class / short-text class /
    * min-shingle content class, salted prefixes in place of salted seeds)
    * with the engine-side 64-bit shingle hash swapped for md5 over the
    * identical string shingles ([[graft.llm.TextOps.shingles]]), because
    * md5 + lexicographic min are reproducible in DuckDB while xxhash64 is
    * not. This is what makes the st19 batch mirror of [[dedupNearStream]]
    * hash-ORACLE-able; StreamingSpec proves the streaming form over this
    * fingerprint admits exactly the mirror's winner set. Production keeps
    * the xxhash64 chain (one codegen kernel, no shingle strings built). */
  def nearDupFingerprintMd5(text: Column, id: Column, w: Int = 5): Column =
    when(text.isNull, concat(lit("null:"), id.cast("string")))
      .otherwise(coalesce(
        concat(lit("fp:"),
          array_min(transform(graft.llm.TextOps.shingles(text, w),
            sh => md5(sh)))),
        concat(lit("short:"), md5(text))))

  /** Keep the FIRST row per `fingerprint` within the watermark horizon —
    * the keyed-admission core of [[dedupNearStream]], pluggable so the
    * oracle-able md5 fingerprint runs the identical streaming path. */
  def dedupStreamBy(docs: DataFrame, fingerprint: Column,
                    watermark: String = "1 hour"): DataFrame =
    docs.withColumn("fingerprint", fingerprint)
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("fingerprint")

  /**
   * Streaming near-duplicate dedup: keep the first document per content
   * fingerprint (min shingle hash — [[graft.llm.TextOps.docFingerprint]])
   * within the watermark horizon. Fingerprint equality catches exact and
   * near-identical re-crawls cheaply with bounded state; it is the
   * streaming complement of the batch MinHash-LSH path (which needs the
   * full corpus for banding + exact verification). Input needs (ts, text).
   * Batch mirror: st19_neardedup_election (min-doc_id election over the
   * [[nearDupFingerprintMd5]] form of the chain).
   */
  def dedupNearStream(docs: DataFrame, watermark: String = "1 hour",
                      w: Int = 5, idCol: String = "doc_id"): DataFrame =
    dedupStreamBy(docs, nearDupFingerprint(col("text"), col(idCol), w),
      watermark)

  /**
   * Streaming near-dup ADMISSION against the existing corpus — closes the
   * loop [[ingestStream]] opened: its gate is quality + exact-fingerprint
   * WITHIN the stream, while the production front door must also reject
   * documents that near-duplicate the corpus already ingested. Two forms,
   * by corpus size:
   *
   * 1. THIS operator: a stateless stream-static LEFT ANTI against a
   *    broadcast signature frame ([[graft.llm.Dedup.withSignatures]]
   *    output or a [[graft.llm.Dedup.buildMinhashIndex]] read). The match
   *    predicate is row-local — band-hash ARRAYS overlap (the LSH
   *    pigeonhole as `arrays_overlap`, no explode, no state) AND exact
   *    Jaccard >= minJ — so the whole gate is map-side work per
   *    micro-batch: no shuffle, no streaming state, exactly-once for
   *    free. Right side must fit a broadcast: decontamination lists,
   *    benchmark sets, per-domain reference corpora (the d08 shape).
   * 2. Corpus-scale: `writeStream.foreachBatch` with [[nearDupAdmitBatch]]
   *    — each micro-batch runs the full BATCH admission
   *    ([[graft.llm.Dedup.nearDupAdmit]]) against the persisted bucketed
   *    index: banded candidate equi-joins, id-only shuffles, corpus
   *    payload never moves. foreachBatch hands a batch frame per trigger,
   *    so every batch-only operator (distinct, anti-join, persist) is
   *    legal there while this transform-level operator must stay
   *    stateless.
   *
   * Rows that cannot shingle (short/null text) have null signatures: the
   * predicate is null -> no match -> ADMITTED, preserving stream totality.
   */
  def admitNearDupStream(docs: DataFrame, index: DataFrame, w: Int = 5,
                         k: Int = 32, bands: Int = 16,
                         minJ: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    def bandArr(sig: Column): Column =
      transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(b, slice(sig, b * r + lit(1), lit(r))))
    val s = graft.llm.Dedup.withSignaturesTotal(docs, w, k)
      .withColumn("__bands", bandArr(col("sig")))
    val c = broadcast(index.select(col("sh").as("__sh_c"),
      col("n_sh").as("__n_c"), bandArr(col("sig")).as("__bands_c")))
    val inter = size(array_intersect(col("sh"), col("__sh_c"))).cast("double")
    val cond = arrays_overlap(col("__bands"), col("__bands_c")) &&
      inter / (col("n_sh") + col("__n_c") - inter) >= lit(minJ)
    s.join(c, cond, "left_anti").drop("sh", "n_sh", "sig", "__bands")
  }

  /**
   * Streaming benchmark DECONTAMINATION gate — d08/d09's guard moved to
   * the crawl front door: an incoming document is dropped iff it shares
   * >= `minShared` distinct w-gram shingles with ANY benchmark document,
   * so eval-set text never enters the corpus in the first place (GPT-3
   * appendix-C run as admission, not as a later scrub).
   *
   * Stateless two-tier gate, both tiers row-local so the transform works
   * identically batch and streaming with no state and exactly-once for
   * free:
   *  1. a serialized Bloom filter of ALL bench shingles rides the plan
   *     as a literal ([[graft.llm.Dedup.benchBloomBytes]]); a row whose
   *     bloom-hit count is < minShared can't reach minShared against any
   *     single bench doc (hits bound shared-with-union from above) —
   *     admitted map-only, the overwhelmingly common case;
   *  2. bloom suspects (planted contamination + fpp survivors) verify
   *     EXACTLY against the broadcast per-doc bench shingle sets via a
   *     row-local `array_intersect` LEFT ANTI — the [[admitNearDupStream]]
   *     discipline, no explode, no aggregation, no false drops.
   * Bench sets are bounded (eval suites), so the broadcast is small; the
   * stream side never shuffles. Unshingle-able rows (short/null text)
   * hit neither tier and are admitted — stream totality.
   */
  def decontaminateStream(docs: DataFrame, bench: DataFrame, w: Int = 3,
                          minShared: Int = 2, fpp: Double = 0.01): DataFrame = {
    val benchSh = graft.llm.Dedup.docShingleHashes(bench, w)
    val bf = graft.llm.Dedup.benchBloomBytes(benchSh, fpp)
    val s = docs.withColumn("__sh",
        graft.functions.TextExpressions.shingleHashes(col("text"), w))
      .withColumn("__hits", coalesce(
        size(filter(col("__sh"), graft.llm.Dedup.bloomMightContain(bf) _)), lit(0)))
    val cleanFast = s.filter(col("__hits") < minShared)
    val suspects = s.filter(col("__hits") >= minShared)
    val benchSets = broadcast(benchSh.select(col("sh").as("__sh_c")))
    val verified = suspects.join(benchSets,
      size(array_intersect(col("__sh"), col("__sh_c"))) >= minShared, "left_anti")
    cleanFast.unionByName(verified).drop("__sh", "__hits")
  }

  /** foreachBatch body for the INDEXED corpus-scale admission path:
    * `stream.writeStream.foreachBatch { (b, _) =>
    *   sink(EventStreams.nearDupAdmitBatch(index)(b)) }` — see
    * [[admitNearDupStream]] form 2.
    *
    * materializeBatch is forced OFF: nearDupAdmit's default persist is for
    * one-shot batch callers, but a streaming query invokes this body every
    * trigger and nothing here outlives the trigger to unpersist — the
    * default would leak one persisted batch frame per micro-batch for the
    * life of the stream. The batch signature subtree is micro-batch-sized,
    * so letting the planner recompute it for the verify branch is the
    * bounded choice. */
  def nearDupAdmitBatch(index: DataFrame, w: Int = 5, k: Int = 32,
                        bands: Int = 16, minJ: Double = 0.5)(
                        batch: DataFrame): DataFrame =
    graft.llm.Dedup.nearDupAdmit(batch, index, w, k, bands, minJ,
      materializeBatch = false)

  final case class Event(event_id: Long, ts: java.sql.Timestamp, user_id: Long,
      event_type: String, value: Double)

  /** Per-user sessionizer state. `events` holds (event_id, ts millis)
    * pairs at or above the watermark (replays are deduplicated by
    * event_id); events that have fallen BELOW the watermark can never be
    * re-delivered (Spark's stateful-op late filter drops them), so they
    * are compressed into the (headStart, headN, headLast) summary of the
    * oldest still-open session — at most one open session can span the
    * watermark, hence one summary. headN == 0 means no summary. State per
    * user is therefore bounded by the watermark horizon regardless of how
    * long a session runs.
    *
    * State schema v2 (r3): NOT checkpoint-compatible with the r2
    * single-field shape — a running query upgrading across that boundary
    * must restart from a fresh checkpoint (Spark's state-schema validation
    * rejects the old checkpoint rather than corrupting state). */
  final case class PendingEvents(headStart: Long, headN: Long, headLast: Long,
      events: Seq[(Long, Long)])

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
   * State is bounded: per user, only events at or above the watermark are
   * retained verbatim; older events of a still-open session compress into
   * a constant-size (start, count, last) summary (see [[PendingEvents]]),
   * emitted sessions are dropped, and the state timeout evicts idle users
   * entirely — so even a user who never goes idle holds O(watermark
   * horizon) state, not O(session length).
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

    // a session as (startMs, lastMs, nEvents, recent events kept verbatim)
    final case class Sess(startMs: Long, lastMs: Long, n: Long, recent: Seq[(Long, Long)])

    def update(userId: Long, rows: Iterator[Event],
        state: GroupState[PendingEvents]): Iterator[SessionOut] = {
      val incoming = rows.map(e => (e.event_id, e.ts.getTime)).toSeq
      val st = state.getOption.getOrElse(PendingEvents(0L, 0L, 0L, Seq.empty))
      val all = (st.events ++ incoming).distinctBy(_._1)
        .sortBy { case (id, t) => (t, id) }
      // batch execution has no watermark: getCurrentWatermarkMs throws
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => -1L }

      // gap-split the verbatim events, then chain the compressed head
      // summary onto the first segment when the gap allows
      val segs = split(all).map(s => Sess(s.head._2, s.last._2, s.length.toLong, s))
      val sessions: Seq[Sess] =
        if (st.headN == 0L) segs
        else segs match {
          case first +: rest if first.startMs - st.headLast <= gapMs =>
            Sess(st.headStart, first.lastMs, st.headN + first.n, first.recent) +: rest
          case _ =>
            Sess(st.headStart, st.headLast, st.headN, Seq.empty) +: segs
        }

      if (wm < 0L) {
        // bounded input: every gap-closed session emits, the final open one
        // does not (end-of-input streaming contract); no state to retain
        return sessions.dropRight(1)
          .map(s => SessionOut(userId, s.startMs, s.lastMs, s.n)).iterator
      }

      // a session is safe to close only when NO admissible future event
      // (ts >= wm) can still chain onto it: last + gap < wm, strictly —
      // an event at ts == last + gap == wm is not late and belongs to it
      val (closed, open) = sessions.partition(s => s.lastMs + gapMs < wm)
      if (open.nonEmpty) {
        // compress the oldest open session's sub-watermark events into the
        // head summary (they can never be re-delivered); only one open
        // session can span the watermark, later ones are entirely >= wm
        val oldest = open.head
        val (belowWm, atAbove) = oldest.recent.partition(_._2 < wm)
        // summary absorbs the pre-existing compressed prefix (counted in
        // oldest.n but absent from oldest.recent) plus belowWm; its last
        // timestamp is belowWm's last, or the prior summary's when only
        // the prefix remains
        val hN = oldest.n - atAbove.length
        val hLast = if (belowWm.nonEmpty) belowWm.last._2 else st.headLast
        state.update(
          if (hN > 0L)
            PendingEvents(oldest.startMs, hN, hLast,
              atAbove ++ open.tail.flatMap(_.recent))
          else
            PendingEvents(0L, 0L, 0L, atAbove ++ open.tail.flatMap(_.recent)))
        state.setTimeoutTimestamp(
          math.max(open.map(_.lastMs).min + gapMs, wm + 1))
      } else state.remove()
      closed.map(s => SessionOut(userId, s.startMs, s.lastMs, s.n)).iterator
    }

    events.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** One sensor/price reading: `cents` empty = the reading is missing
    * and must be forward-filled from the same series' past. */
  final case class Reading(event_id: Long, ts: java.sql.Timestamp,
      user_id: Long, cents: Option[Long])

  /** Per-series LOCF state: the last observed value at or below the
    * watermark (constant size) + only the rows still above it.
    * `pending` tuples are (event_id, ts_micros, cents-or-MinValue). */
  final case class FfillState(hasLast: Boolean, lastVal: Long,
      pending: Seq[(Long, Long, Long)])

  final case class FfillOut(user_id: Long, event_id: Long, ts_us: Long,
      masked: Boolean, cents_filled: Option[Long], was_filled: Boolean)

  /**
   * Streaming forward-fill (LOCF) — the unbounded twin of the u03 batch
   * repair: each reading is emitted with the series' most recent
   * OBSERVED value at or before it, exactly once, in event-time order,
   * even under late / out-of-order / re-delivered arrivals (pending
   * rows dedup by event_id, so replays are idempotent).
   *
   * Correct event-time LOCF cannot emit a row the moment it arrives: a
   * later-delivered earlier observation could change its fill. So rows
   * buffer in keyed state until the watermark passes them — at that
   * point nothing admissible can precede them — then emit in (ts, id)
   * order, threading the running last-observed value. A row at ts can
   * only be reordered by rows still >= the watermark, all of which are
   * strictly later, so the emitted prefix (and the carried last-value)
   * is final.
   *
   * State is bounded: per series, a constant (hasLast, lastVal) summary
   * absorbs everything below the watermark; only rows above it are held
   * verbatim — O(watermark horizon), not O(stream length). An
   * event-time timeout re-fires the group on watermark advances so held
   * rows drain without needing fresh input for that key.
   *
   * Batch execution (no watermark): all rows of a series arrive in one
   * invocation and everything emits — the bounded mirror st24 checks
   * against the DuckDB oracle; StreamingSpec proves stream == batch
   * across chunkings, late delivery and replays.
   */
  def ffillStream(readings: Dataset[Reading],
                  watermark: String = "1 hour"): Dataset[FfillOut] = {
    implicit val outEnc = Encoders.product[FfillOut]
    implicit val stateEnc = Encoders.product[FfillState]
    val Missing = Long.MinValue

    def micros(t: java.sql.Timestamp): Long = {
      val i = t.toInstant
      i.getEpochSecond * 1000000L + i.getNano / 1000L
    }

    def update(userId: Long, rows: Iterator[Reading],
        state: GroupState[FfillState]): Iterator[FfillOut] = {
      val inc = rows.map(r =>
        (r.event_id, micros(r.ts), r.cents.getOrElse(Missing))).toSeq
      val st = state.getOption.getOrElse(FfillState(false, 0L, Seq.empty))
      val all = (st.pending ++ inc).distinctBy(_._1)
        .sortBy { case (id, t, _) => (t, id) }
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => -1L }

      var has = st.hasLast
      var last = st.lastVal
      def emit(r: (Long, Long, Long)): FfillOut = {
        val missing = r._3 == Missing
        if (!missing) { has = true; last = r._3 }
        FfillOut(userId, r._1, r._2, missing,
          if (has) Some(last) else None, missing && has)
      }

      if (wm < 0L) return all.map(emit).iterator // bounded input

      // a pending row is final once even its millisecond floor is below
      // the watermark — every admissible future row is strictly later
      val (ripe, hold) = all.partition(_._2 / 1000L < wm)
      val out = ripe.map(emit) // threads has/last through the prefix
      if (hold.nonEmpty || has) {
        state.update(FfillState(has, last, hold))
        if (hold.nonEmpty) state.setTimeoutTimestamp(wm + 1L)
      } else state.remove()
      out.iterator
    }

    readings.withWatermark("ts", watermark)
      .groupByKey(_.user_id)(Encoders.scalaLong)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /**
   * Stream-stream interval join: each click is paired with the same user's
   * views in the preceding `lookbackMinutes`. Both sides carry a watermark
   * AND the join condition time-bounds view_ts relative to click_ts, which
   * is exactly what Spark requires to expire buffered rows on both sides —
   * the canonical bounded-state stream-stream join. On a bounded frame the
   * same plan is an equi-join on user_id with a range filter (never a
   * cartesian), which is the batch mirror the DuckDB oracle checks (st04).
   */
  def clickViewJoin(events: DataFrame, watermark: String = "2 hours",
                    lookbackMinutes: Int = 60): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("view_ts") <= col("click_ts"))
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("click_value"), col("view_id"), col("view_ts"), col("view_value"))
  }

  /**
   * Continuously-maintained keyed state table — the streaming UPSERT
   * sink (the CDC-consumer shape: a stream of events folds into "latest
   * row per key", queryable between batches): each micro-batch applies
   * last-wins upserts into a hash-partitioned parquet table, rewriting
   * ONLY the partitions the batch touches.
   *
   * Why partition-local: the naive upsert rewrites the whole table per
   * batch — O(|table|) writes for O(|batch|) changes, unusable once the
   * key space is large. Here rows hash-partition by `pmod(user_id, n)`;
   * the batch's touched partition set is collected (bounded by n — a
   * plan constant, not data), only those partitions are read back for
   * the merge, and the write is a DYNAMIC partition overwrite (the s15
   * discipline), so untouched partitions keep their physical files —
   * cost per batch ~ |batch| + |touched partitions|, not |table|.
   *
   * Last-wins is decided by max event_id through the native `arg_max`
   * aggregate (unique ids: deterministic, the k02 contract) — applied
   * within the batch AND across the merge, so replays and overlapping
   * batches converge to the same state (idempotent upserts).
   */
  def upsertBatch(batch: DataFrame, tableDir: String, nParts: Int = 16): Unit = {
    import graft.functions.VectorAggregates.argMax
    val spark = batch.sparkSession
    val payload = struct(col("event_id"), col("ts"), col("event_type"), col("value"))
    val incoming = batch
      .groupBy(col("user_id"))
      .agg(argMax(col("event_id"), payload).as("__w"))
      .select(col("user_id"), col("__w.event_id").as("event_id"),
        col("__w.ts").as("ts"), col("__w.event_type").as("event_type"),
        col("__w.value").as("value"))
      .withColumn("__p", pmod(col("user_id"), lit(nParts)))
      .localCheckpoint(true)
    val touched = incoming.select(col("__p").cast("long")).distinct()
      .collect().map(_.getLong(0)).toSeq // bounded by nParts
    val existing =
      if (!new java.io.File(tableDir).exists()) None
      else Some(spark.read.parquet(tableDir)
        .filter(col("__p").isin(touched: _*))
        .select(incoming.columns.map(col).toIndexedSeq: _*))
    val merged = existing.fold(incoming)(_.union(incoming))
      .groupBy(col("user_id"))
      .agg(argMax(col("event_id"),
        struct(col("event_id"), col("ts"), col("event_type"),
          col("value"), col("__p"))).as("__w"))
      .select(col("user_id"), col("__w.event_id").as("event_id"),
        col("__w.ts").as("ts"), col("__w.event_type").as("event_type"),
        col("__w.value").as("value"), col("__w.__p").as("__p"))
    merged.write.mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .partitionBy("__p").parquet(tableDir)
  }

  /** Maintain the per-stratum KMV sample table under micro-batch
    * ingest ([[graft.llm.Samples]] as a batch-apply / `foreachBatch`
    * sink): each batch's k-rows-per-stratum sample folds into the
    * stored sample — work is batch + sample-sized, the corpus is never
    * rescanned — and the merge's SET semantics make the sink IDEMPOTENT
    * under replays: a redelivered batch re-merges the same ids into the
    * same sample (the at-least-once delivery story the additive
    * maintained-agg sink explicitly cannot tell). The merged frame is
    * localCheckpoint'd before the overwrite so the write never reads
    * the files it is replacing. */
  def sampleBatch(batch: DataFrame, tableDir: String, strat: String,
                  id: String, k: Int): Unit = {
    val spark = batch.sparkSession
    val fresh = graft.llm.Samples.bottomK(batch, strat, id, k)
    val merged =
      if (new java.io.File(tableDir).exists())
        graft.llm.Samples.merge(spark.read.parquet(tableDir), fresh,
          strat, id, k)
      else fresh
    merged.localCheckpoint(true).write.mode("overwrite").parquet(tableDir)
  }

  /** [[sampleBatch]] as the streaming sink. */
  def sampleStream(docs: DataFrame, tableDir: String, strat: String,
                   id: String, k: Int): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    docs.writeStream.foreachBatch { (b: DataFrame, _: Long) =>
      sampleBatch(b, tableDir, strat, id, k)
    }

  /** [[graft.relational.IncrementalAgg.applyDelta]] as a `foreachBatch`
    * streaming sink — the always-fresh maintained aggregate fed directly
    * from the stream: each micro-batch folds its (key, value) rows into
    * the stored (key, cnt, sum) table, touching only the batch's hash
    * slots. UNLIKE the upsert sink the fold is additive, NOT idempotent
    * — a replayed batch double-counts — so this sink belongs behind the
    * exactly-once dedup gate ([[dedupEvents]]) or a checkpointed source;
    * the spec exercises the multi-batch convergence contract. */
  def maintainAggStream(kv: DataFrame, tableDir: String,
                        nParts: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    kv.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        graft.relational.IncrementalAgg.applyDelta(batch, tableDir, nParts)
      }

  /** [[upsertBatch]] as a `foreachBatch` streaming sink: the state table
    * is exactly-once per key because the merge is idempotent (a replayed
    * batch re-elects the same winners). */
  def upsertStream(events: DataFrame, tableDir: String,
                   nParts: Int = 16): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] =
    events.writeStream
      .foreachBatch { (batch: DataFrame, _: Long) =>
        upsertBatch(batch, tableDir, nParts)
      }

  /** LEFT SEMI [[clickViewJoin]] — the conversion-detection form: a
    * click emits ONCE iff at least one view preceded it in the lookback,
    * with no view payload and no per-view row multiplication (the inner
    * join emits one row per matching view — N:1 attribution noise when
    * the question is just "was there a preceding view?"). Same two-sided
    * watermark + time-range condition bounds the buffered state; the
    * engine guarantees single emission even with many matches. One code
    * path batch and stream. */
  def clickViewJoinSemi(events: DataFrame, watermark: String = "2 hours",
                        lookbackMinutes: Int = 60): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("view_ts") <= col("click_ts"),
        "left_semi")
      .select(col("click_id"), col("user_id"), col("click_ts"), col("click_value"))
  }

  /** LEFT OUTER [[clickViewJoin]] — the attribution-completeness form:
    * every click emits, null-padded when NO view preceded it in the
    * lookback. Same watermarks + time-range condition, so streaming
    * state stays bounded; the engine holds an unmatched click only
    * until the watermark proves no matching view can still arrive, then
    * emits it null-padded — exactly-once row semantics either way, just
    * deferred by the watermark horizon on the unmatched path (the
    * documented Structured Streaming outer-join contract). Batch and
    * stream share this one code path (the st-family discipline). */
  def clickViewJoinOuter(events: DataFrame, watermark: String = "2 hours",
                         lookbackMinutes: Int = 60): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("view_ts") <= col("click_ts"),
        "left_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("click_value"), col("view_id"), col("view_ts"), col("view_value"))
  }

  /** Per-(type, window) admission counters for [[rateLimit]]: window
    * start ms -> admitted count, pruned as the watermark passes. */
  final case class QuotaState(counts: Map[Long, Long])

  /**
   * RATE-LIMITED admission — ingest quota enforcement at the stream
   * front door (crawl politeness budgets, per-source daily caps, abuse
   * throttling): within each (event_type, `windowMs` event-time window)
   * only the FIRST `n` events in (ts, event_id) order are admitted, the
   * rest drop. The deterministic contract is event-time rank <= n — the
   * registered batch mirror states it as a window rank over
   * hour-bounded groups — and the streaming form enforces it with O(1)
   * state per OPEN window: a per-type map of window -> admitted-count,
   * rows sorted within each micro-batch (batch-sized), closed windows
   * pruned once the watermark passes them. Arrival in event-time order
   * across triggers makes stream == batch exactly (the st02 sessionizer
   * contract); out-of-order arrival within one trigger is absorbed by
   * the in-batch sort.
   */
  def rateLimit(events: Dataset[Event], n: Int, windowMs: Long = 3600000L,
                watermark: String = "2 hours"): Dataset[Event] = {
    implicit val outEnc = Encoders.product[Event]
    implicit val stateEnc = Encoders.product[QuotaState]
    import events.sparkSession.implicits._
    events.withWatermark("ts", watermark)
      .groupByKey(_.event_type)
      .flatMapGroupsWithState[QuotaState, Event](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (_, rows, state) =>
          val counts = scala.collection.mutable.Map.empty[Long, Long]
          state.getOption.foreach(s => counts ++= s.counts)
          val admitted = rows.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            .filter { e =>
              val w = e.ts.getTime / windowMs
              val c = counts.getOrElse(w, 0L)
              if (c < n) { counts(w) = c + 1; true } else false
            }
          // drop counters for windows fully below the watermark: state
          // is O(open windows), not O(stream lifetime)
          val wmk = state.getCurrentWatermarkMs()
          state.update(QuotaState(
            counts.filter { case (w, _) => (w + 1) * windowMs > wmk }.toMap))
          admitted.iterator
      }
  }

  /** One fetch record at the crawl front door: a URL observed at `ts`
    * with content fingerprint `fp` (`ts_us` = event-time micros, the
    * deterministic in-batch sort key — millisecond Timestamp math never
    * decides an ordering). */
  final case class Fetch(event_id: Long, ts: java.sql.Timestamp,
                         url: String, fp: String, ts_us: Long)

  /** Per-URL change state: last seen fingerprint + its event time. */
  final case class LastFp(fp: String, lastUs: Long)

  final case class ChangeOut(event_id: Long, url: String, status: String)

  /**
   * Streaming crawl-change classifier — the incremental face of the d25
   * snapshot diff: as fetches stream in, each record is classified
   * against the URL's LAST seen fingerprint (`new` = never seen,
   * `changed` = fingerprint flipped, `unchanged`) and the state advances
   * — the CDC-at-the-crawl-front-door shape that feeds recrawl
   * scheduling without ever materializing two snapshots.
   *
   * Deterministic contract (what the st21 batch mirror and its DuckDB
   * oracle state declaratively): status per fetch = comparison against
   * the previous fetch of the same URL in (ts_us, event_id) order — a
   * `lag()` over the URL partition. The streaming form holds O(1) state
   * per URL (one fingerprint, ~50 bytes — state is bounded by the live
   * URL set, not the fetch history), sorts within each micro-batch, and
   * expires URLs idle past `idleTtlMs` via event-time timeout (an
   * expired URL re-reads as `new` — the documented recrawl-horizon
   * trade every frontier makes; set the TTL above the horizon and the
   * stream equals the batch mirror exactly, the StreamingSpec proof).
   */
  def crawlChanges(fetches: Dataset[Fetch], watermark: String = "2 hours",
                   idleTtlMs: Long = 7L * 24 * 3600 * 1000): Dataset[ChangeOut] = {
    implicit val outEnc = Encoders.product[ChangeOut]
    implicit val stEnc = Encoders.product[LastFp]
    import fetches.sparkSession.implicits._

    def update(url: String, rows: Iterator[Fetch],
               state: GroupState[LastFp]): Iterator[ChangeOut] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      val sorted = rows.toSeq.sortBy(f => (f.ts_us, f.event_id))
      var last = state.getOption.map(_.fp)
      val out = sorted.map { f =>
        val status =
          if (last.isEmpty) "new"
          else if (last.get != f.fp) "changed"
          else "unchanged"
        last = Some(f.fp)
        ChangeOut(f.event_id, url, status)
      }
      // batch execution has no watermark: getCurrentWatermarkMs throws,
      // and a bounded run keeps no state (the st02 sessionizer contract)
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => -1L }
      if (wm >= 0L && sorted.nonEmpty) {
        state.update(LastFp(last.get, sorted.last.ts_us))
        state.setTimeoutTimestamp(
          math.max(sorted.last.ts_us / 1000L + idleTtlMs, wm + 1L))
      }
      out.iterator
    }

    fetches.withWatermark("ts", watermark)
      .groupByKey(_.url)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** FULL OUTER [[clickViewJoin]] — the audit-completeness form, closing
    * the interval-join family (inner st04 / left outer st12 / left semi
    * st13): every click AND every view emits exactly once — matched as a
    * pair, unmatched null-padded from its own side — so row-count
    * reconciliation against the source streams needs no second query.
    * The engine buffers each side only inside the two-sided watermark +
    * time-range bound; an unmatched row emits when the watermark proves
    * its partner can no longer arrive. One code path batch and stream.
    * A view's user/key columns come from ITS side when the click side is
    * null — the caller coalesces, the batch mirror st16 shows the
    * canonical totalized projection. */
  /** One conversation turn: `tsu` carries exact event-time MICROS (the
    * batch mirror orders on micros; ms would merge distinct turns), `ts`
    * exists only for the watermark. */
  final case class TurnRow(event_id: Long, ts: java.sql.Timestamp,
      tsu: Long, user_id: Long, event_type: String)

  /** Buffered turns of one open (user, day) conversation, deduplicated
    * by event_id so re-delivery is idempotent. */
  final case class SftState(turns: Seq[(Long, Long, String)])

  final case class SftGateOut(user_id: Long, day: Long, n_turns: Long,
      n_nonsys: Long, n_sys_late: Long, n_role_viol: Long, rendered: String,
      n_chars: Long, kept: Boolean)

  /** The md5 role plant of the batch gate (t48), computed in-kernel:
    * first 8 md5 hex chars of "role:<id>" mod 10 -> user/assistant/system. */
  private def roleOf(eventId: Long): String = {
    val h = java.lang.Long.parseLong(
      org.apache.commons.codec.digest.DigestUtils
        .md5Hex(s"role:$eventId").substring(0, 8), 16) % 10
    if (h < 4) "user" else if (h < 9) "assistant" else "system"
  }

  /**
   * Streaming SFT conversation gate — the incremental twin of the batch
   * assembler (t48_sft_assembly): conversations key on (user_id, day),
   * turns buffer in keyed state (deduplicated by event_id, so replays
   * are idempotent), and the gate fires EXACTLY ONCE per conversation,
   * when the event-time watermark passes the day boundary — at that
   * point no admissible turn can still arrive (any day-D event is below
   * the watermark and the engine drops it), so the emitted row is
   * final. Late/out-of-order/re-chunked delivery within the watermark
   * yields the identical row because the gate computes over the
   * (tsu, event_id)-SORTED buffer, exactly the batch ordering.
   *
   * State is bounded by the day bucket (the t48 scale contract carried
   * over): a conversation's turns live at most one day + watermark
   * horizon, then the timeout evicts the key entirely.
   *
   * Batch execution (no watermark): all turns of a conversation arrive
   * in one invocation and the complete gate row emits — the bounded-run
   * contract st24/ffill established. Batch mirror: t48_sft_assembly.
   */
  def sftGateStream(events: Dataset[TurnRow],
                    watermark: String = "1 hour"): Dataset[SftGateOut] = {
    implicit val outEnc = Encoders.product[SftGateOut]
    implicit val stateEnc = Encoders.product[SftState]
    val dayUs = 86400000000L

    def gate(userId: Long, day: Long,
             turns: Seq[(Long, Long, String)]): SftGateOut = {
      val sorted = turns.sortBy { case (id, t, _) => (t, id) }
      var pos2 = 0L
      var viol = 0L
      var sysLate = 0L
      var nonsys = 0L
      val sb = new StringBuilder
      sorted.zipWithIndex.foreach { case ((id, _, typ), idx) =>
        val role = roleOf(id)
        if (role != "system") {
          pos2 += 1
          nonsys += 1
          if ((pos2 % 2 == 1 && role != "user") ||
            (pos2 % 2 == 0 && role != "assistant")) viol += 1
        } else if (idx > 0) sysLate += 1
        sb.append("<|").append(role).append("|>").append(typ)
      }
      val rendered = sb.result()
      SftGateOut(userId, day, sorted.size.toLong, nonsys, sysLate, viol,
        rendered, rendered.length.toLong,
        viol == 0L && sysLate == 0L && nonsys >= 2L && rendered.length <= 60)
    }

    def update(key: (Long, Long), rows: Iterator[TurnRow],
        state: GroupState[SftState]): Iterator[SftGateOut] = {
      val (userId, day) = key
      val incoming = rows.map(r => (r.event_id, r.tsu, r.event_type)).toSeq
      val all = (state.getOption.map(_.turns).getOrElse(Seq.empty) ++ incoming)
        .distinctBy(_._1)
      val wm = try state.getCurrentWatermarkMs()
        catch { case _: UnsupportedOperationException => -1L }
      val dayEndMs = (day + 1) * dayUs / 1000L
      if (wm < 0L) {
        // bounded input: the conversation is complete, emit now
        Iterator.single(gate(userId, day, all))
      } else if (wm >= dayEndMs) {
        // every day-D event is < dayEndMs <= wm: nothing admissible left
        state.remove()
        Iterator.single(gate(userId, day, all))
      } else {
        state.update(SftState(all))
        state.setTimeoutTimestamp(math.max(dayEndMs, wm + 1))
        Iterator.empty
      }
    }

    events.withWatermark("ts", watermark)
      .groupByKey(r => (r.user_id, r.tsu / dayUs))(
        Encoders.tuple(Encoders.scalaLong, Encoders.scalaLong))
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  def clickViewJoinFull(events: DataFrame, watermark: String = "2 hours",
                        lookbackMinutes: Int = 60): DataFrame = {
    val clicks = events.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"),
        col("ts").as("click_ts"), col("value").as("click_value"))
      .withWatermark("click_ts", watermark)
    val views = events.filter(col("event_type") === "view")
      .select(col("event_id").as("view_id"), col("user_id").as("view_user_id"),
        col("ts").as("view_ts"), col("value").as("view_value"))
      .withWatermark("view_ts", watermark)
    clicks.join(views,
        col("user_id") === col("view_user_id") &&
          col("view_ts") >= col("click_ts") - expr(s"INTERVAL $lookbackMinutes MINUTES") &&
          col("view_ts") <= col("click_ts"),
        "full_outer")
      .select(col("click_id"), col("user_id"), col("click_ts"),
        col("click_value"), col("view_id"), col("view_user_id"),
        col("view_ts"), col("view_value"))
  }
}
