package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

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
