package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row/state shapes for gap sessionization (top level for Encoders). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class SessionState(start: Long, end: Long, n: Long, total: Double)
case class SessionBuf(sessions: Seq[SessionState])
case class UserSession(user_id: Long, session_start: java.sql.Timestamp,
                       session_end: java.sql.Timestamp,
                       n_events: Long, total_value: Double)

/** Data-plane Structured Streaming operators — the streaming spellings
  * of the batch pipeline's event aggregation (q14/q34) and exact dedup
  * (q16/q17). Each takes a streaming DataFrame (readStream source or
  * MemoryStream in tests) and returns the transformed streaming frame;
  * the caller picks sink/trigger/checkpoint.
  *
  * 100 TB / continuous-ingest stance:
  *  - Watermarks bound state: windowed aggregation drops state for
  *    windows older than the lateness budget, so state size tracks the
  *    (lateness × event-rate) product, not the stream's history.
  *  - Streaming dedup keys state by content hash; with the watermark it
  *    evicts hashes once their event-time horizon passes — the standard
  *    bounded-state exact-dedup for ingest pipelines (re-ingest of an
  *    old document past the horizon is a new record by design; combine
  *    with the batch tiers for full-history dedup).
  *  - Aggregations are partial+final exactly as in batch (same Catalyst
  *    physical operators under the micro-batch runner), so the
  *    partitioning story carries over unchanged.
  */
object StreamingPipeline {

  /** Windowed event aggregation (streaming q14-shape): per event_type
    * per tumbling window, count + sum(value), tolerating `lateness` of
    * out-of-order arrival. Output mode: append (finalized windows only)
    * or update, caller's choice. */
  def eventsWindowedAgg(events: DataFrame,
                        window: String = "1 hour",
                        lateness: String = "10 minutes"): DataFrame =
    events
      .withWatermark("ts", lateness)
      .groupBy(org.apache.spark.sql.functions.window(col("ts"), window),
        col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("value")).as("total"))
      .select(col("window.start").as("window_start"),
        col("event_type"), col("n"), col("total"))

  /** Gap-based sessionization — the custom-state surface
    * (flatMapGroupsWithState + event-time timeout) that windowed
    * aggregation can't express: a session ends `gapMinutes` after its
    * last event, not at a fixed boundary.
    *
    * Exactness contract: a session is emitted ONLY once the watermark
    * passes its end + gap — at that point any event that could still
    * merge into it (t ≤ end + gap ≤ watermark) is already outside the
    * lateness budget and would be dropped by the watermark filter, so
    * Append-mode output equals the batch sessionization of the same
    * data (pinned in StreamingPipelineSpec). Unfinalized sessions — the
    * open one AND any gap-closed-but-not-yet-ripe ones — are held in
    * state as a sorted interval list; each batch interval-merges the
    * incoming events into that list (a late-but-in-budget event lands
    * in, or bridges, held sessions instead of spawning an overlapping
    * one, which Append could never retract).
    *
    * State per user is the handful of sessions inside one lateness
    * horizon (bounded by lateness/gap + 1, NOT history length), so the
    * 100 TB story is unchanged: one shuffle on user_id plus O(active
    * users × sessions-in-horizon) state. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def toSession(user: Long, s: SessionState): UserSession =
      UserSession(user, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.total)

    // sorted interval merge with gap tolerance: any two sessions (or a
    // session and an event) within `gapMs` coalesce; n/total are sums,
    // so merging already-merged sessions stays exact
    def mergeAll(ss: Seq[SessionState]): Seq[SessionState] =
      ss.sortBy(s => (s.start, s.end))
        .foldLeft(List.empty[SessionState]) { (acc, s) =>
          acc match {
            case h :: t if s.start <= h.end + gapMs =>
              SessionState(math.min(h.start, s.start), math.max(h.end, s.end),
                h.n + s.n, h.total + s.total) :: t
            case _ => s :: acc
          }
        }.reverse

    // one code path for data batches AND timeouts (incoming is empty on
    // timeout): merge, emit ripe sessions, hold + re-arm the rest
    def update(user: Long, incoming: Iterator[SessionEvent],
               state: GroupState[SessionBuf]): Iterator[UserSession] = {
      val wm = state.getCurrentWatermarkMs()
      val held = state.getOption.map(_.sessions).getOrElse(Seq.empty)
      val merged = mergeAll(held ++ incoming.map(e =>
        SessionState(e.ts.getTime, e.ts.getTime, 1, e.value)))
      // strict <: an event with t == watermark may still be admitted,
      // and t == end + gap == watermark would belong to this session
      val (ripe, open) = merged.partition(_.end + gapMs < wm)
      if (open.isEmpty) state.remove()
      else {
        state.update(SessionBuf(open))
        // earliest possible finalization; must stay ahead of the watermark
        state.setTimeoutTimestamp(
          math.max(open.map(_.end).min + gapMs, wm + 1))
      }
      ripe.iterator.map(toSession(user, _))
    }

    events.selectExpr("user_id", "ts", "value").as[SessionEvent]
      .withWatermark("ts", lateness)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append,
        GroupStateTimeout.EventTimeTimeout)(update)
  }

  /** Streaming exact dedup by content hash within the watermark
    * horizon: first arrival of a hash wins; later copies are dropped.
    * dropDuplicatesWithinWatermark keys state on the hash alone and
    * evicts entries once the watermark passes their horizon, so state
    * is bounded by (lateness × ingest rate) instead of growing with
    * stream history. */
  def dedupStream(docs: DataFrame, lateness: String = "10 minutes"): DataFrame =
    docs
      .withColumn("h", sha2(col("text"), 256))
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("h")
      .drop("h") // internal dedup key — output schema mirrors the input

  /** Streaming ingest admission — the streaming spelling of the batch
    * incremental-dedup gate (Dedup.incrementalDedupSummary, q68): every
    * incoming document is admitted only if its content hash is neither
    * (a) already in the STANDING base corpus, nor (b) seen earlier in
    * the stream within the watermark horizon.
    *
    * Tier (a) is a stream-static LEFT ANTI join against the base's
    * distinct hash projection — the static side is planned per
    * micro-batch, so a base refresh (the nightly compaction that folds
    * admitted docs in) is picked up without restarting the query.
    * Tier (b) is the bounded-state within-stream dedup above. Order
    * matters: the anti join drops base dups BEFORE they enter dedup
    * state, so state is spent only on genuinely-new content. At 100 TB
    * the base hash projection is a 64-byte-row table the join shuffles
    * or broadcasts by its true size; no text crosses either boundary. */
  def admitStream(docs: DataFrame, base: DataFrame,
                  lateness: String = "10 minutes"): DataFrame = {
    val baseH = base.select(sha2(col("text"), 256).as("h")).distinct()
    docs
      .withColumn("h", sha2(col("text"), 256))
      .join(baseH, Seq("h"), "left_anti")
      .withWatermark("ts", lateness)
      .dropDuplicatesWithinWatermark("h")
      .drop("h")
  }
}
