package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Row/state shapes for gap sessionization (top level for Encoders). */
case class SessionEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
case class SessionState(start: Long, end: Long, n: Long, total: Double)
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
    * last event, not at a fixed boundary. Per user: in-batch events
    * merge into the open session (splitting on intra-batch gaps, those
    * sessions emit immediately); the open session closes when the
    * WATERMARK passes its end + gap (event-time timeout), so state per
    * user is one fixed-size record and total state is bounded by the
    * active-user count — the 100 TB story is the shuffle on user_id
    * plus O(active users) state, independent of history length. */
  def sessionize(events: DataFrame, gapMinutes: Int = 30,
                 lateness: String = "10 minutes"): Dataset[UserSession] = {
    val spark = events.sparkSession
    import spark.implicits._
    val gapMs = gapMinutes.toLong * 60000L

    def toSession(user: Long, s: SessionState): UserSession =
      UserSession(user, new java.sql.Timestamp(s.start),
        new java.sql.Timestamp(s.end), s.n, s.total)

    def update(user: Long, incoming: Iterator[SessionEvent],
               state: GroupState[SessionState]): Iterator[UserSession] = {
      if (state.hasTimedOut) {
        val closed = toSession(user, state.get)
        state.remove()
        Iterator.single(closed)
      } else {
        val evs = incoming.toArray.sortBy(_.ts.getTime)
        var open = state.getOption
        val closed = Seq.newBuilder[UserSession]
        evs.foreach { e =>
          val t = e.ts.getTime
          open match {
            case Some(s) if t <= s.end + gapMs =>
              open = Some(SessionState(math.min(s.start, t), math.max(s.end, t),
                s.n + 1, s.total + e.value))
            case Some(s) => // gap exceeded inside the batch: close + restart
              closed += toSession(user, s)
              open = Some(SessionState(t, t, 1, e.value))
            case None =>
              open = Some(SessionState(t, t, 1, e.value))
          }
        }
        open.foreach { s =>
          state.update(s)
          // timeout must stay ahead of the current watermark
          state.setTimeoutTimestamp(
            math.max(s.end + gapMs, state.getCurrentWatermarkMs + 1))
        }
        closed.result().iterator
      }
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
}
